package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.{Analytics, Corpus, Curation, Dedup, Fill, Guards, Layout, Multimodal, NearDup, Retrieval, Similarity, Skew, TextAnalysis, Transforms}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is exposed as a named query over the
  * driver's testdata, with an equivalent DuckDB oracle in [[oracleSql]].
  * Determinism rules (SURVEY.md §7.5): explicit total ORDER BY on both
  * sides, `row_number` tiebreaks for keep-first dedup, decimal-cast sums
  * (exact + associative, so Spark's partial/final aggregation order can't
  * perturb vs DuckDB's single-node sum), no uuid()/current_date() in
  * compared output.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Sources.table(spark, dir, name)

  /** Per-JVM scratch dir for queries that demo a write+read round-trip
    * (schema evolution, partition pruning). DETERMINISTIC per (name, pid):
    * repeated runs in one JVM overwrite instead of accumulating, while the
    * pid segment keeps concurrent JVMs (Bench and Verify at once) from
    * racing on one path — mirrors Streaming.scratchRoot. Cleaned by a
    * shutdown hook.
    */
  private lazy val scratchBase: java.nio.file.Path = {
    val p = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_demo_${ProcessHandle.current().pid()}")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (java.nio.file.Files.exists(p)) {
        val s = java.nio.file.Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
        finally s.close()
      }
    }))
    p
  }

  private def scratchDir(name: String): String =
    scratchBase.resolve(name).toString

  /** [[scratchDir]] wiped first — for per-run mutable state that must
    * start empty on EVERY invocation (a bench re-run against a stale
    * BucketedTable root would double-apply its commits). */
  private def freshScratchDir(name: String): String = {
    val p = scratchBase.resolve(name)
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally s.close()
    }
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** Wipe `scratch` and restore it from the immutable `pristine`
    * artifact by HARD LINK (byte-copy fallback): the mutable-index
    * fixtures (q_stream_neardup_cum, q_ann_ivf_append_audit) append
    * new files but never rewrite existing ones, so linking is safe and
    * the per-run restore is metadata-cheap.
    *
    * Append-only invariant (round-10 ADVICE): linking shares inodes, so
    * any IN-PLACE rewrite through a linked file would corrupt the
    * pristine artifact across runs. Data files (parquet parts) are
    * write-once by Spark's committer, so they link; metadata files a
    * maintainer may legitimately rewrite or truncate in place
    * (`_SUCCESS`, `_buckets` manifests, commit markers — anything
    * `_`/`.`-prefixed) are BYTE-COPIED instead, so even a future
    * non-staged rewrite path cannot reach the pristine inode. */
  private def restoreMutableCopy(pristine: String, scratch: String): Unit = {
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(wipe)
      f.delete(); ()
    }
    def linkRec(from: java.io.File, to: java.io.File): Unit = {
      if (from.isDirectory) {
        to.mkdirs()
        from.listFiles().foreach(f => linkRec(f, new java.io.File(to, f.getName)))
      } else if (from.getName.startsWith("_") || from.getName.startsWith(".")) {
        java.nio.file.Files.copy(from.toPath, to.toPath); ()
      } else {
        try { java.nio.file.Files.createLink(to.toPath, from.toPath); () }
        catch { case _: UnsupportedOperationException | _: java.io.IOException =>
          java.nio.file.Files.copy(from.toPath, to.toPath); ()
        }
      }
    }
    val dirF = new java.io.File(scratch)
    if (dirF.exists()) wipe(dirF)
    linkRec(new java.io.File(pristine), dirF)
  }

  /** documents ∪ truncated copies (ids +1,000,000; last 10 chars cut) —
    * the shared synthetic near-dup corpus of the near-dup queries. Any
    * change here must be mirrored in the `corpus` CTE of each of their
    * oracles (q_minhash_pairs/minhashCtes, q_dedup_clusters,
    * q_simhash_pairs, q_ngram_jaccard, q_corpus_clean, q_line_dedup).
    */
  private def dupCorpus(d: DataFrame): DataFrame =
    d.select(col("doc_id"), col("text")).unionByName(
      d.select((col("doc_id") + 1000000).as("doc_id"),
        col("text").substr(lit(1), length(col("text")) - 10).as("text")))

  /** q_boilerplate fixture — the testdata corpus has no newline or
    * template structure, so rebuild it with both: body re-lined into
    * 10-word rows, wrapped in a per-source 10-word header and footer
    * (the nav/footer every page of a site shares). The operator sees
    * only (doc_id, source, text2); detection is by per-source document
    * frequency. Mirrored by the `doc2` CTE of the q_boilerplate oracle.
    */
  private def boilerplateDocs(d: DataFrame): DataFrame = {
    val ws = filter(split(col("text"), "\\s+"), w => w =!= "")
    val nLines = greatest(
      ceil(size(ws).cast("double") / 10).cast("int") - 1, lit(0))
    val body = concat_ws("\n",
      transform(sequence(lit(0), nLines),
        li => array_join(slice(ws, li * 10 + 1, lit(10)), " ")))
    d.select(col("doc_id"), col("source"),
      concat(
        lit("read more about "), col("source"),
        lit(" market coverage subscribe for daily updates\n"),
        body,
        lit("\ncopyright "), col("source"),
        lit(" press all rights reserved terms apply contact us")).as("text2"))
  }

  /** Shared embedding near-dup pair pipeline (q_embed_neardup +
    * q_semantic_dedup): documents ∪ planted perturbed copies, candidates
    * from an OR-amplified sign-LSH family — occupancy-ADAPTIVE seeded
    * bits × 2 independent tables (a pair is a candidate if it collides
    * in ANY table) — then exact decimal cosine ≥ 0.999 verification.
    *
    * Adaptive width, not a fixed table (round-13 sf1 capture → round-14
    * ceiling lift): a FIXED bucket space makes occupancy grow linearly
    * with the corpus and in-bucket candidate pairs QUADRATICALLY —
    * measured 38.9k pairs at sf0.1 → 9.31M at sf1 (239× for 10× data)
    * on 8 fixed bits, the operator's whole wall clock — and an
    * occupancy-only ladder stayed quadratic on CLUSTERED corpora
    * (round-14 factor-100 capture: 42× wall at 10× data). The
    * production rule bounds the measured pair mass directly:
    * nBits = [[Similarity.pairBudgetSignBits]] (max of the occupancy
    * ladder and the smallest width with Σ|bucket|² ≤ 32·n over the
    * ∪-corpus; one stats pass of orchestration metadata, ceiling 32
    * via [[Similarity.signBucketWide]]'s multi-block strings), and the OR
    * of 2 tables buys the recall the extra bits cost (per-table
    * same-bucket rate ~0.95 for the +0.01 perturbation at 16 bits,
    * ~0.9 at 32 → ≥0.99 OR'd). The oracle replays the same
    * integer-exact width rule over the same corpus.
    * Joins are shuffled-hash (candidate side builds): every side here
    * scales with the corpus, so none may be planned into a broadcast
    * by a static size guess.
    */
  private def embedNearDupPairs(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
    val perturbed = emb.select(
      (col("vec_id") + 100000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, (x + lit(0.01f)).cast("float")).otherwise(x)).as("embedding"))
    val corpusRaw = emb.unionByName(perturbed)
    // pair-budget width (round-14 factor-100 capture: the occupancy
    // ladder left clustered corpora quadratic — see
    // Similarity.pairBudgetSignBits); one stats pass of orchestration
    // metadata decides, and the width is a plan input the static
    // fingerprint can't see — pin it
    // the guarded corpus size comes out of the SAME stats pass (no
    // separate count() action), and the two per-table self-joins fold
    // into ONE exploded (table, bucket) join — identical pair multiset,
    // identical shuffled bytes, half the join stages (round 14,
    // guide §2.4; same idiom as Similarity.orLshCandidates)
    val (nBits, nCorpus) = Similarity.pairBudgetSignBitsWithN(corpusRaw,
      col("embedding"), dim = 64, nTables = 2)
    Guards.record("similarity.embedNearDup.width", nCorpus, s"nb=$nBits")
    val corpus = Similarity.withNorm2(corpusRaw, col("embedding"))
    def sides(idAs: String) = corpus.select(col("vec_id").as(idAs),
      posexplode(array((0 until 2).map(tbl =>
        Similarity.signBucketWide(col("embedding"), tbl, 2, nBits, 64)): _*))
        .as(Seq("tbl", "bucket")))
    val cand = sides("id_a")
      .hint("shuffle_hash")
      .join(sides("id_b"), Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cand
      .hint("shuffle_hash")
      .join(corpus.select(col("vec_id").as("id_a"), col("embedding").as("va"),
        col("n2").as("n2a")), Seq("id_a"))
      .hint("shuffle_hash")
      .join(corpus.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
        col("n2").as("n2b")), Seq("id_b"))
      .withColumn("cos",
        Similarity.dotDecimal(col("va"), col("vb")).cast("double") /
          (sqrt(col("n2a").cast("double")) * sqrt(col("n2b").cast("double"))))
      .filter(col("cos") >= 0.999)
      .select("id_a", "id_b", "cos")
  }

  /** ANN recall + candidate-coverage audit over an arbitrary
    * (vec_id, embedding) corpus — the 5-method comparison shared by
    * q_ann_recall (near-uniform directions, the LSH-adversarial case)
    * and q_ann_recall_clustered (planted cluster structure, where LSH
    * prunes hard). Per method: recall@5 against the brute-force ground
    * truth AND the candidate coverage (examined pairs / all non-self
    * pairs) — the frontier that decides which method earns its keep on
    * a given corpus (round-9 verdict #6).
    */
  private def annRecallReport(emb: DataFrame): DataFrame = {
    val q = emb.filter(col("vec_id") < 10)
    val k = 5
    val ground = Similarity.cosineTopK(q, emb, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
    val lsh = Similarity.bucketedTopK(q, emb, "vec_id", "embedding",
        nBits = 4, dim = 64, k = k)
      .select(lit("lsh_bucket").as("method"), col("query_id"), col("neighbor_id"))
    val mp = Similarity.multiProbeTopK(q, emb, "vec_id", "embedding",
        nBits = 4, dim = 64, nProbe = 3, k = k)
      .select(lit("lsh_multiprobe").as("method"), col("query_id"), col("neighbor_id"))
    val ivf = Similarity.ivfTopK(q, emb, "vec_id", "embedding",
        nCentroids = 16, nProbe = 2, k = k)
      .select(lit("ivf").as("method"), col("query_id"), col("neighbor_id"))
    val orl = Similarity.orLshTopK(q, emb, "vec_id", "embedding",
        nBits = 4, dim = 64, nTables = 16, k = k)
      .select(lit("lsh_or").as("method"), col("query_id"), col("neighbor_id"))
    // the WIDE configuration (8 bits × 8 tables): 256 buckets per table
    // prune below cluster granularity — measured at sf0.01, recall@5
    // collapses to 0.12 at 3.9% coverage on the uniform corpus (nothing
    // near shares a wide bucket) but holds 0.86 at 8.9% coverage on the
    // clustered one. This row is what makes the two-fixture frontier
    // legible: same construction, opposite verdicts, decided by the
    // data's cluster structure.
    val orw = Similarity.orLshTopK(q, emb, "vec_id", "embedding",
        nBits = 8, dim = 64, nTables = 8, k = k)
      .select(lit("lsh_or_wide").as("method"), col("query_id"), col("neighbor_id"))
    // candidate sets each method actually examines (same frames the
    // top-k scores — factored in Similarity so they cannot drift)
    val cands = Similarity.bucketedCandidates(q, emb, "vec_id", "embedding", 4, 64)
      .select(lit("lsh_bucket").as("method"))
      .unionByName(Similarity
        .multiProbeCandidates(q, emb, "vec_id", "embedding", 4, 64, nProbe = 3)
        .select(lit("lsh_multiprobe").as("method")))
      .unionByName(Similarity
        .ivfCandidates(q, emb, "vec_id", "embedding", nCentroids = 16, nProbe = 2)
        .select(lit("ivf").as("method")))
      .unionByName(Similarity
        .orLshCandidates(q, emb, "vec_id", "embedding", 4, 64, nTables = 16)
        .select(lit("lsh_or").as("method")))
      .unionByName(Similarity
        .orLshCandidates(q, emb, "vec_id", "embedding", 8, 64, nTables = 8)
        .select(lit("lsh_or_wide").as("method")))
      .groupBy("method").agg(count(lit(1)).as("n_cand"))
    val nq = ground.agg(countDistinct(col("query_id")).as("n_queries"))
    val nc = emb.agg(count(lit(1)).as("n_corpus"))
    lsh.unionByName(mp).unionByName(ivf).unionByName(orl).unionByName(orw)
      .join(ground.withColumn("__hit", lit(1L)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy("method")
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("hits"))
      .join(cands, Seq("method"))
      .crossJoin(broadcast(nq))
      .crossJoin(broadcast(nc))
      .select(col("method"), col("hits"), col("n_queries"),
        round(col("hits").cast("double") /
          (col("n_queries") * k).cast("double"), 6).as("recall_at_k"),
        col("n_cand"),
        round(col("n_cand").cast("double") /
          (col("n_queries") * (col("n_corpus") - 1)).cast("double"), 6)
          .as("coverage"))
      .orderBy("method")
  }

  /** Clustered-embedding fixture (round-9 verdict #6): centroid c =
    * the ORIGINAL embedding of vec_id = c (c < 16); vector v becomes
    * centroid(v % 16) ± 0.05 per dimension, the sign a pure md5 parity
    * of (vec_id, dim) — deterministic, engine-portable, replayed
    * literally by the oracle. Double-precision add, one cast to float,
    * so Spark and DuckDB round identically.
    */
  private def clusteredEmbeddings(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    emb.select(col("vec_id"), (col("vec_id") % 16).as("cid"))
      .join(broadcast(cents), Seq("cid"))
      .select(col("vec_id"),
        transform(col("cvec"), (x, i) =>
          (x.cast("double") +
            when(substring(md5(concat(lit("j:"),
                col("vec_id").cast("string"), lit(":"), i.cast("string"))),
                1, 1).isin("1", "3", "5", "7", "9", "b", "d", "f"),
              lit(0.05)).otherwise(lit(-0.05))).cast("float"))
          .as("embedding"))
  }

  /** Session-stable path for the materialized near-dup band/set index
    * over [[dupCorpus]] at `dir`: keyed to the source file's identity
    * (path + mtime + size) so a regenerated testdata tree gets a fresh
    * index instead of stale pairs.
    */
  private def nearDupIndexPath(dir: String, variant: String = "dup",
      n: Int = 5, k: Int = 8, params: String = ""): String =
    indexPathFor(dir, "documents", "neardup", variant,
      s"n=$n,k=$k" + (if (params.isEmpty) "" else s",$params"))

  /** Session-stable path for the materialized IVF index over the
    * embeddings table at `dir` — same corpus-identity keying as the
    * near-dup index. */
  private def ivfIndexPath(dir: String, variant: String = "ivf16",
      nCentroids: Int = 16): String =
    indexPathFor(dir, "embeddings", "ivf", variant, s"nc=$nCentroids")

  private def indexPathFor(dir: String, table: String, family: String,
      variant: String, params: String): String = {
    val src = new java.io.File(s"$dir/$table.parquet")
    // identity from the actual DATA FILES: parquet sources arrive both
    // as a single file and as a directory of part files, and
    // File.length on a directory is meaningless — every part's
    // (name, mtime, size) goes into the tag so regenerating ANY file
    // retires the index
    val files =
      if (src.isDirectory) Option(src.listFiles()).map(_.toSeq)
        .getOrElse(Seq.empty).sortBy(_.getName)
      else Seq(src)
    // build PARAMETERS join the identity too (not just source files):
    // an index built with different n/k/nCentroids/gate params is a
    // different artifact, and silently reusing the old one would probe
    // with the wrong banding — constant changes must retire the cache
    val ident = files
      .map(f => s"${f.getName}:${f.lastModified}:${f.length}")
      .mkString(dir + "|", "|", "|" + params)
    val tag = java.lang.Integer.toHexString(ident.hashCode)
    s"${sys.props("java.io.tmpdir")}/graft_${family}_idx_${variant}_$tag"
  }

  /** Build the band/set index for `corpus` at `path` once — delegates
    * to the race-safe staged build ([[NearDup.ensureNearDupIndex]]:
    * pid-scoped staging dir + atomic rename, `_OK` written pre-rename),
    * so the concurrent Bench + Verify pair can never interleave writes
    * into the shared path.
    */
  private def ensureNearDupIndex(corpus: DataFrame, path: String,
      n: Int, k: Int): String = {
    NearDup.ensureNearDupIndex(corpus, col("doc_id"), col("text"), n, k, path)
    path
  }

  /** Shared CDC fixtures (q_cdc_apply + q_stream_cdc — batch and
    * streaming consume the IDENTICAL snapshot + out-of-order I/U/D log,
    * so they share one oracle): updates at three timestamps, deletes
    * that land between them, inserts of brand-new keys. Any change here
    * must be mirrored in both queries' oracle SQL.
    */
  private def cdcSnapshot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  private def cdcChangeLog(o: DataFrame): DataFrame = {
    def ts(x: String) = lit(x).cast("timestamp")
    val u1 = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), ts("2024-02-01 00:00:00").as("ts"),
        lit(1L).as("seq"), lit("U").as("op"), col("o_custkey"),
        (col("o_totalprice") + 1000).as("o_totalprice"))
    val d1 = o.filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey"), ts("2024-03-01 00:00:00").as("ts"),
        lit(1L).as("seq"), lit("D").as("op"), col("o_custkey"),
        col("o_totalprice"))
    val u2 = o.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), ts("2024-03-15 00:00:00").as("ts"),
        lit(2L).as("seq"), lit("U").as("op"), col("o_custkey"),
        (col("o_totalprice") * 2).as("o_totalprice"))
    val ins = o.filter(col("o_orderkey") % 11 === 0)
      .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
        ts("2024-01-15 00:00:00").as("ts"), lit(1L).as("seq"),
        lit("I").as("op"), col("o_custkey"), col("o_totalprice"))
    u1.unionByName(d1).unionByName(u2).unionByName(ins)
  }

  /** events with deterministically injected nulls (the testdata has none;
    * fill/default operators need them — SURVEY.md FIXTURES.md §B).
    */
  private def eventsWithNulls(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("value_n",
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
      .withColumn("type_n",
        when(col("event_id") % 11 === 0, lit(null)).otherwise(col("event_type")))

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    starJoin(spark, "/root/testdata/sf0.001")

  // -------------------------------------------------------------------
  // Query implementations (composed from graft.operators / graft.functions)
  // -------------------------------------------------------------------

  /** J1-J3 flagship star join + grouped rollup: lineitem⋈orders⋈customer⋈
    * nation⋈region. Dims are broadcast (no shuffle); the single exchange
    * is lineitem⋈orders on the order key + the final partial/final agg.
    */
  private def starJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o  = t(spark, dir, "orders")
    val c  = t(spark, dir, "customer")
    val n  = t(spark, dir, "nation")
    val r  = t(spark, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"), month(col("o_orderdate")).as("order_month"))
      .agg(
        // Exact decimal sum internally; the COMPARED column is cast to
        // double at the boundary (wide-decimal rendering is not portable
        // across engines' hashers — every green sum does this). The
        // intermediate DECIMAL(38,4) narrowing is exact (revenue has ≤4
        // fractional digits) and keeps the scaled integer under 2^53, so
        // the →double division rounds ONCE, identically on both engines;
        // casting DECIMAL(38,10) straight to double double-rounds in
        // DuckDB (int128→double, then ÷10^10) and diverges by 1 ULP.
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(30,10)")).cast("decimal(38,4)").cast("double")
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"), col("order_month"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1 — predicate-pushdown scan: filter + projection reach the parquet
    // reader (PushedFilters + pruned ReadSchema).
    "q_scan_pushdown" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // S-evolution — multi-generation parquet read under one target
    // schema (the reference's Alembic history incl. a column widening,
    // migrations/versions/e26643b1dbdd_.py:22-28): generation 1 writes
    // narrow types (int32 key, float price) and predates the added
    // column; generation 2 writes the widened/extended schema. One
    // readEvolved scan + a defensive default survives both.
    "q_schema_evolution" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val orders = t(s, dir, "orders")
      // pid-scoped demo dir — the first (old-generation) write
      // OVERWRITES, so repeated bench runs neither accumulate temp dirs
      // nor double the table by re-appending; the pid segment keeps a
      // concurrent Bench+Verify pair from overwrite/append racing
      val tmp = scratchDir("evo_demo")
      orders.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").cast("int").as("o_orderkey"),
          col("o_custkey"),
          col("o_totalprice").cast("float").as("o_totalprice"))
        .write.mode("overwrite").parquet(tmp)
      orders.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderpriority"))
        .write.mode("append").parquet(tmp)
      val target = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_custkey", LongType),
        StructField("o_totalprice", DoubleType),
        StructField("o_orderpriority", StringType)))
      graft.sources.Sources.readEvolved(s, tmp, target)
        .withColumn("o_orderpriority",
          coalesce(col("o_orderpriority"), lit("LEGACY")))
        .orderBy("o_orderkey")
    }),

    // K1+S1 — partition-pruned scan over the lake layout the sink
    // writes: orders land Hive-partitioned by month
    // (load_to_s3.py:16-27's ingestion_date= layout), and a reader
    // filtering on the partition column touches only the matching
    // directories — at 100 TB the filter prunes at the METADATA level,
    // before any file is opened (inputFiles ⊂ partition dirs; asserted
    // in SourcesSpec).
    "q_partition_pruned" -> ((s, dir) => {
      // pid-scoped demo dir, overwritten each run — repeated bench runs
      // must not accumulate copies in /tmp, and concurrent JVMs must not
      // race on one path
      val tmp = scratchDir("part_demo")
      t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1995) // one year's lake: 12 dirs
        .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
        .repartition(col("o_month"))
        .write.mode("overwrite").partitionBy("o_month").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("o_month").between("1995-01", "1995-06"))
        .groupBy("o_month")
        .agg(
          sum(col("o_totalprice").cast("decimal(30,10)"))
            .cast("decimal(38,4)").cast("double").as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy("o_month")
    }),

    // S2/S4 — trafilatura stand-in: regex main-text + metadata→fields
    // over raw HTML (extraction.py:341,361-374). The corpus is wrapped
    // in deterministic pseudo-HTML (titles/meta from table columns,
    // paragraphs split on sentence ends); every 13th doc is a
    // paywall-shaped page with no article → the all-null default row.
    "q_extract_article" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val html = when(col("doc_id") % 13 === 0,
          lit("<html><body><div>paywall</div></body></html>"))
        .otherwise(concat(
          lit("<html><head><title>Doc "), col("doc_id").cast("string"),
          lit(" ("), col("lang"), lit(")</title>"),
          lit("<meta name=\"author\" content=\"author-"),
          (col("doc_id") % 7).cast("string"), lit("\">"),
          lit("<meta property=\"og:site_name\" content=\""), col("source"), lit("\">"),
          lit("<meta property=\"article:published_time\" content=\"2024-03-"),
          (col("doc_id") % 28 + 1).cast("string"), lit("\">"),
          lit("</head><body><p>"),
          regexp_replace(col("text"), "\\. ", ".</p><p>"),
          lit("</p></body></html>")))
      graft.operators.Extraction.extractArticle(
          d.withColumn("html", html), col("doc_id"), col("html"))
        .orderBy("key")
    }),

    // P1/P2/P3 — rename + existence-tolerant drop.
    "q_rename_project" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumnRenamed("ts", "event_ts")
        .drop("props", "not_a_column")
        .orderBy("event_id")
    }),

    // P4 — compound boolean filter with null tests (transformation.py:149).
    "q_filter_compound" -> ((s, dir) => {
      val o = t(s, dir, "orders").withColumn("priority",
        when(col("o_orderkey") % 5 === 0, lit(null))
          .when(col("o_orderkey") % 7 === 0, lit(""))
          .otherwise(col("o_orderpriority")))
      o.filter(!(col("o_orderstatus") === "F" &&
          (col("priority").isNull || col("priority") === "")))
        .select("o_orderkey", "o_orderstatus", "priority")
        .orderBy("o_orderkey")
    }),

    // F2/F3 — na.fill defaults + coalesce chain over injected nulls.
    "q_null_defaults" -> ((s, dir) => {
      eventsWithNulls(s, dir)
        .na.fill(Map("value_n" -> 0.0, "type_n" -> "unknown"))
        .select(col("event_id"), col("value_n").as("filled_value"),
          col("type_n").as("filled_type"))
        .orderBy("event_id")
    }),

    // F1 — clean_text_for_nlp regex chain (no UDF; codegen'd built-ins).
    "q_clean_text" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), Text.cleanTextForNlp(col("text")).as("cleaned"))
        .orderBy("doc_id")
    }),

    // F6/F12 — timestamp truncation, epoch seconds, date arithmetic.
    "q_time_ops" -> ((s, dir) => {
      t(s, dir, "events").select(
        col("event_id"),
        date_trunc("second", col("ts")).as("ts_sec"),
        unix_timestamp(col("ts")).as("epoch_s"),
        date_trunc("day", col("ts")).as("day_ts"),
        date_add(col("ts").cast("date"), 2).as("d_plus2"))
        .orderBy("event_id")
    }),

    // F5/F8 — string casts + numeric coercion with invalid→null (try_cast).
    "q_cast_coerce" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("num_str",
          when(col("event_id") % 5 === 0, lit("junk"))
            .otherwise(concat(col("event_id").cast("string"), lit(".25"))))
        .withColumn("int_str",
          when(col("event_id") % 3 === 0, lit("x"))
            .otherwise(col("event_id").cast("string")))
        .select(col("event_id"), Text.coerceDouble(col("num_str")).as("parsed_d"),
          col("int_str").try_cast("int").as("parsed_i"))
        .orderBy("event_id")
    }),

    // D1 — order-deterministic keep-first dedup, single key.
    "q_dedup_first" -> ((s, dir) => {
      Dedup.keepFirst(t(s, dir, "orders"), Seq("o_custkey"), Seq(col("o_orderkey")))
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    }),

    // D2 — keep-first dedup, composite key.
    "q_dedup_composite" -> ((s, dir) => {
      // tiebreak must be a TOTAL order: the data contains fully duplicated
      // (orderkey, partkey, linenumber) rows that differ only in measures
      Dedup.keepFirst(t(s, dir, "lineitem"), Seq("l_orderkey", "l_partkey"),
          Seq(col("l_linenumber"), col("l_quantity"), col("l_extendedprice")))
        .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_partkey")
    }),

    // D3/D4 — cross-batch dedup vs existing state (left-anti join).
    "q_anti_join_new" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      Dedup.newRows(orders, orders.filter(col("o_orderkey") % 2 === 0), Seq("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // K2 — idempotent append: existing ∪ (incoming ⟕anti existing).
    "q_idempotent_append" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val existing = orders.filter(col("o_orderkey") % 2 === 0)
      Dedup.idempotentAppend(existing, orders, Seq("o_orderkey"))
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    }),

    // D5 — first-link-wins FK resolution with intra-batch memo.
    "q_fk_resolve" -> ((s, dir) => {
      val posts = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey").as("article_url"))
      val existing = t(s, dir, "part")
        .filter(col("p_partkey") % 3 === 0)
        .select(col("p_partkey").as("article_url"),
          concat(lit("E"), col("p_partkey").cast("string")).as("article_id"))
      val newId = concat(lit("N"), col("article_url").cast("string"), lit("@"),
        col("l_orderkey").cast("string"), lit(":"), col("l_linenumber").cast("string"))
      Dedup.resolveFk(posts, existing, "article_url", "article_id",
          Seq(col("l_orderkey"), col("l_linenumber")), newId)
        .select("l_orderkey", "l_linenumber", "article_url", "article_id")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // J1-J3 — flagship star join + rollup.
    "q_star_join" -> ((s, dir) => starJoin(s, dir)),

    // W1/W2 — grouped ffill + bfill over injected nulls (the reference's
    // signature window op, transformation.py:213-215).
    "q_ffill_bfill" -> ((s, dir) => {
      val e = eventsWithNulls(s, dir)
      e.withColumn("value_filled",
          Fill.ffillBfill(Seq(col("user_id")), Seq(col("ts"), col("event_id")))(col("value_n")))
        .select("event_id", "user_id", "ts", "value_filled")
        .orderBy("user_id", "ts", "event_id")
    }),

    // Near-dup verify metric #3 — exact edit distance on LSH candidates
    // (beside set-Jaccard and SimHash-Hamming): thresholded levenshtein
    // early-exits the DP above the bound, O(maxDist·n) per candidate.
    "q_edit_distance" -> ((s, dir) => {
      val corpus = dupCorpus(t(s, dir, "documents"))
      // persist the shingle digests: the banding self-join references the
      // signature subtree from BOTH sides, and without this the whole
      // explode+distinct shingle pipeline executes twice (measured 7.6 →
      // 2.3 s at sf0.1 — same discipline as minhashPairs)
      val sh = NearDup.wordShingleDigests(corpus, col("doc_id"), col("text"), 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val pairs = NearDup.candidatePairs(
          NearDup.lshBands(NearDup.minhashSig(sh, 8), 8))
        // eager + release (small verified-pair result): the shingle cache
        // must not outlive the query — see minhashPairs
        graft.operators.Eager.terminal(
          NearDup.editDistancePairs(corpus, col("doc_id"), col("text"),
              pairs, maxDist = 15)
            .orderBy("key_a", "key_b"))
      } finally { sh.unpersist(); () }
    }),

    // F+ crawl hygiene — URL canonicalization before URL-keyed dedup:
    // messy synthesized URLs (case, tracking params, fragments, default
    // ports) normalize to a canonical form; the count-per-canonical
    // shows the dedup merge the raw key would have missed.
    "q_url_canon" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val messy = d.select(col("doc_id"),
        concat(
          when(col("doc_id") % 2 === 0, lit("HTTPS://")).otherwise(lit("https://")),
          when(col("doc_id") % 4 === 0, upper(col("source"))).otherwise(col("source")),
          lit(".Example.COM"),
          when(col("doc_id") % 5 === 0, lit(":443")).otherwise(lit("")),
          lit("/"), col("lang"), lit("/"), (col("doc_id") % 100).cast("string"),
          when(col("doc_id") % 3 === 0, lit("?utm_source=feed&utm_medium=rss"))
            .when(col("doc_id") % 3 === 1, lit("?id=7&utm_campaign=x#frag"))
            .otherwise(lit("#section"))).as("url"))
      messy.withColumn("url_canon", graft.functions.Text.canonicalizeUrl(col("url")))
        .groupBy("url_canon")
        .agg(count(lit(1)).as("n_raw_urls"),
          countDistinct(col("url")).as("n_raw_forms"))
        .orderBy("url_canon")
    }),

    // K2+ audit — snapshot reconciliation between two loads: old = all
    // orders, new = orders with deterministic drops (%17), price
    // mutations (%13), and a shifted-key insert block. Full-outer join
    // on the key, null-safe value compare.
    "q_snapshot_diff" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val oldSnap = o.select("o_orderkey", "o_totalprice", "o_orderstatus")
      val newSnap = o
        .filter(col("o_orderkey") % 17 =!= 0) // removed
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")).as("o_totalprice"), // changed
          col("o_orderstatus"))
        .unionByName(o.filter(col("o_orderkey") % 19 === 0)
          .select((col("o_orderkey") + 10000000).as("o_orderkey"),
            col("o_totalprice"), col("o_orderstatus"))) // added
      Dedup.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"),
          Seq("o_totalprice", "o_orderstatus"))
        .select("o_orderkey", "diff_status", "old_o_totalprice", "new_o_totalprice")
        .orderBy("o_orderkey")
    }),

    // W3+ domain capstone — SMA crossover signals over the event series
    // (the feature family the reference's prediction model consumes).
    "q_sma_crossover" -> ((s, dir) => {
      Analytics.smaCrossover(t(s, dir, "events"),
          Seq(col("user_id")), Seq(col("ts"), col("event_id")),
          col("value"), shortN = 5, longN = 20)
        .select("event_id", "user_id", "ts", "sma_short", "sma_long",
          "signal", "crossed")
        .orderBy("user_id", "ts", "event_id")
    }),

    // LLM-pipeline — exact substring-span dedup (Lee et al. 2022 at word
    // granularity): doc pairs sharing ≥1 exact 20-word span over the
    // shared near-dup corpus; bucket-capped self-join, never n².
    "q_span_dedup" -> ((s, dir) => {
      Corpus.spanDedupPairs(dupCorpus(t(s, dir, "documents")),
          col("doc_id"), col("text"), n = 20, maxBucket = 50)
        .orderBy("key_a", "key_b")
    }),

    // LLM-pipeline — corpus-trained vocabulary tokenization: top-30
    // vocab (count desc, word asc), OOV → -1, per-doc id sequences.
    "q_tokenize" -> ((s, dir) => {
      TextAnalysis.tokenize(t(s, dir, "documents"), col("doc_id"), col("text"),
          vocabSize = 30)
        .select(col("key").as("doc_id"), col("n_tokens"), col("n_oov"), col("ids"))
        .orderBy("doc_id")
    }),

    // LLM-pipeline — BM25 keyword retrieval top-50 over documents:
    // term stream pruned to the query terms before the shuffle, df and
    // corpus stats broadcast, TakeOrderedAndProject cut.
    "q_bm25" -> ((s, dir) => {
      TextAnalysis.bm25TopK(t(s, dir, "documents"), col("doc_id"), col("text"),
          queryTerms = Seq("scan", "join", "window", "stream"), k = 50)
        .select(col("key").as("doc_id"), col("bm25"), col("n_terms"))
        .orderBy(col("bm25").desc, col("doc_id"))
    }),

    // Hybrid retrieval — Reciprocal Rank Fusion of the lexical (BM25)
    // and dense (cosine to vec 0) rankings over the SAME corpus
    // (doc_id ≡ vec_id in the synthetic tables). Rank-based, so no
    // score calibration between BM25-scale and cosine-scale; terms are
    // fixed-point ⌊10¹²/(60+rnk)⌋ for exact engine parity.
    "q_rank_fusion" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val lex = TextAnalysis.bm25TopK(t(s, dir, "documents"),
          col("doc_id"), col("text"),
          queryTerms = Seq("scan", "join", "window", "stream"), k = 50)
        .select(col("key"), row_number().over(
          w.orderBy(col("bm25").desc, col("key"))).as("rnk"))
      val emb = t(s, dir, "embeddings")
      val dense = Similarity.cosineTopK(emb.filter(col("vec_id") === 0),
          emb, "vec_id", "embedding", k = 50)
        .select(col("neighbor_id").as("key"), col("rank").as("rnk"))
      Retrieval.rrfFuse(Seq(lex, dense), k = 60)
        .select(col("key").as("doc_id"), col("n_lists"), col("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
    }),

    // Hybrid retrieval — MMR diversification of the dense top-20 for
    // vec 0: greedy argmax λ·rel − (1−λ)·max-sim-to-selected, 5 picks,
    // λ = 0.75 (so 1−λ is exactly representable and the oracle's
    // constant matches bit-for-bit). The de-redundancy pass between
    // retrieval and a context window.
    "q_mmr_rerank" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cand = Similarity.cosineTopK(emb.filter(col("vec_id") === 0),
          emb, "vec_id", "embedding", k = 20)
        .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding")),
          Seq("neighbor_id"))
        .select(col("neighbor_id").as("key"), col("cos").as("rel"),
          col("embedding").as("vec"))
      Retrieval.mmrRerank(cand, lambda = 0.75, k = 5)
        .orderBy("pick")
    }),

    // LLM-pipeline — DSIR importance weights: target = the src0-2
    // "curated" slice, raw = whole corpus; hashed-bigram log-ratio
    // scoring with the 256-bucket table as the only global state.
    "q_dsir" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Curation.dsirWeights(d,
          d.filter(col("source").isin("src0", "src1", "src2")),
          col("doc_id"), col("text"))
        .select(col("key").as("doc_id"), col("n_feats"), col("weight"))
        .orderBy("doc_id")
    }),

    // A6+ domain pack — VWAP per supplier-month over lineitem (price =
    // l_extendedprice, volume = l_quantity): one partial/final aggregate.
    "q_vwap" -> ((s, dir) => {
      Analytics.vwap(t(s, dir, "lineitem"),
          Seq(col("l_suppkey"), date_trunc("month", col("l_shipdate")).as("month")),
          col("l_extendedprice"), col("l_quantity"))
        .orderBy("l_suppkey", "month")
    }),

    // W3+ domain pack — running-max drawdown per key (peak-to-current
    // decline): one cumulative window over one exchange.
    "q_drawdown" -> ((s, dir) => {
      Analytics.drawdown(t(s, dir, "events"),
          Seq(col("user_id")), Seq(col("ts"), col("event_id")), col("value"))
        .select("event_id", "user_id", "ts", "value", "run_max", "drawdown_pct")
        .orderBy("user_id", "ts", "event_id")
    }),

    // W3+ domain pack — 14-period simple RSI from lag-deltas; lag layer +
    // frame-average layer share one window sort.
    "q_rsi" -> ((s, dir) => {
      Analytics.rsi(t(s, dir, "events"),
          Seq(col("user_id")), Seq(col("ts"), col("event_id")),
          col("value"), n = 14)
        .select("event_id", "user_id", "ts", "rsi")
        .orderBy("user_id", "ts", "event_id")
    }),

    // W3+ domain pack — 20-period Bollinger bands (mean ± 2σ) with
    // breakout classification; three frame aggregates over one sort.
    "q_bollinger" -> ((s, dir) => {
      Analytics.bollinger(t(s, dir, "events"),
          Seq(col("user_id")), Seq(col("ts"), col("event_id")),
          col("value"), n = 20, k = 2.0)
        .select("event_id", "user_id", "ts", "sma", "upper", "lower", "breakout")
        .orderBy("user_id", "ts", "event_id")
    }),

    // A6+ domain pack — pairwise correlation of daily mean values across
    // a watchlist (user_id % 7): daily aggregate, day-keyed self-join
    // (fan-out bounded by the watchlist size), then the momentStats
    // decimal-sum correlation per pair. At scale the watchlist filter is
    // the dial that bounds the quadratic pair growth — correlating ALL
    // symbols pairwise is quadratic by definition, so the operator keys
    // the join on (day) only after an explicit universe restriction.
    "q_corr_pairs" -> ((s, dir) => {
      val daily = t(s, dir, "events").filter(col("user_id") % 7 === 0)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum(col("value").cast("decimal(30,10)")).cast("double") /
          count(lit(1)).cast("double"), 9).as("v"))
        // both self-join sides reference this aggregate; persisting keeps
        // the events scan+agg single-pass (Spark does not reuse the
        // exchange across the differently-projected branches). Tiny frame
        // (watchlist × days); freed by the harness clearCache.
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val a = daily.select(col("user_id").as("user_a"), col("day"), col("v").as("va"))
      val b = daily.select(col("user_id").as("user_b"), col("day"), col("v").as("vb"))
      val joined = a.join(b, Seq("day")).filter(col("user_a") < col("user_b"))
      Analytics.momentStats(joined, Seq(col("user_a"), col("user_b")),
          col("va"), col("vb"))
        .select("user_a", "user_b", "n", "corr_xy")
        .orderBy("user_a", "user_b")
    }),

    // LLM-pipeline — token-level Shannon entropy per doc (information-
    // density quality signal; low = templated/repetitive text).
    "q_entropy" -> ((s, dir) => {
      TextAnalysis.tokenEntropy(t(s, dir, "documents"), col("doc_id"), col("text"))
        .select(col("key").as("doc_id"), col("n_tokens"), col("n_distinct"),
          col("entropy"))
        .orderBy("doc_id")
    }),

    // W3+ — lag-1 autocorrelation of the value series per user
    // (mean-reversion vs momentum diagnostic).
    "q_autocorr" -> ((s, dir) => {
      Analytics.autocorr(t(s, dir, "events"),
          Seq(col("user_id")), Seq(col("ts"), col("event_id")),
          col("value"), lagK = 1)
        .orderBy("user_id")
    }),

    // J+ iterative graph — 3-iteration PageRank over the symmetrized
    // part↔supplier co-occurrence graph from lineitem: join+agg rounds,
    // no driver-side graph, decimal-summed contributions (oracle parity).
    "q_pagerank" -> ((s, dir) => {
      val e0 = t(s, dir, "lineitem").select(
          concat(lit("p:"), col("l_partkey")).as("src"),
          concat(lit("s:"), col("l_suppkey")).as("dst")).distinct()
      // no persist here: pageRank localCheckpoints its degree-annotated
      // edge frame once internally (persist would disable AQE on it)
      val edges = e0.unionByName(
          e0.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.Graph.pageRank(edges, iters = 3, damping = 0.85)
        .select(col("node"), round(col("r"), 12).as("rank"))
        .orderBy(col("rank").desc, col("node")).limit(20)
    }),

    // J+ iterative graph — PERSONALIZED PageRank: teleport mass returns
    // to a part-key seed set, ranking the graph from that viewpoint
    // (related-entity expansion); same rounds, seed-restricted teleport.
    "q_ppr" -> ((s, dir) => {
      val e0 = t(s, dir, "lineitem").select(
          concat(lit("p:"), col("l_partkey")).as("src"),
          concat(lit("s:"), col("l_suppkey")).as("dst")).distinct()
      val edges = e0.unionByName(
          e0.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = t(s, dir, "part").filter(col("p_partkey") % 50 === 0)
        .select(concat(lit("p:"), col("p_partkey")).as("node"))
      // round to 9 (not q_pagerank's 12): the seed-concentrated teleport
      // values drive double→decimal casts onto exact .5-ULP ties where
      // Spark and DuckDB round differently — observed 1e-12 divergence
      graft.operators.Graph.personalizedPageRank(edges, seeds,
          iters = 3, damping = 0.85)
        .select(col("node"), round(col("r"), 9).as("rank"))
        .orderBy(col("rank").desc, col("node")).limit(20)
    }),

    // J+ iterative graph — PageRank over a genuinely DIRECTED bipartite
    // graph (customer→part from orders×lineitem, no symmetrization):
    // every part node is a pure sink, so this exercises the
    // dangling-mass completion (sink rank re-enters uniformly each
    // round; without it Σr decays and the ranking is wrong). Rounded to
    // 9 like q_ppr: the dangling-sum double→decimal casts land on
    // .5-ULP ties where Spark and DuckDB round differently.
    "q_pagerank_directed" -> ((s, dir) => {
      val edges = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c:"), col("o_custkey")).as("src"),
          concat(lit("p:"), col("l_partkey")).as("dst"))
        .distinct()
      graft.operators.Graph.pageRank(edges, iters = 3, damping = 0.85)
        .select(col("node"), round(col("r"), 9).as("rank"))
        .orderBy(col("rank").desc, col("node")).limit(20)
    }),

    // J+ iterative graph — PageRank with the PROVABLE convergence
    // early-exit (round-10 verdict #6): maxIters=18 is the safety
    // contract, but the ℓ1-contraction bound (δ·d/(1−d) per node, ×2
    // slop margin) plus the rounding-boundary check let the operator
    // stop as soon as round(r_i, 6) provably equals round(r_18, 6) —
    // on this hub graph at damping 0.25 that is ~10-11 rounds, with
    // the probe jobs themselves skipped predictively off the measured
    // δ. The oracle runs the FULL 18 unrolled rounds, so the hash
    // compare IS the proof's verification.
    "q_pagerank_converged" -> ((s, dir) => {
      val e0 = t(s, dir, "customer").select(
          concat(lit("c:"), col("c_custkey")).as("src"),
          concat(lit("n:"), col("c_nationkey")).as("dst")).distinct()
      val edges = e0.unionByName(
          e0.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.Graph.pageRankConverged(edges,
          maxIters = 18, damping = 0.25, roundDp = 6)
        .select(col("node"), round(col("r"), 6).as("rank"))
        .orderBy(col("rank").desc, col("node")).limit(20)
    }),

    // J+ iterative graph — the provable early-exit on a genuinely
    // DIRECTED graph (round-10 verdict #4): customer→nation with NO
    // symmetrization, so every nation is a pure sink and the per-round
    // dangling-mass completion runs INSIDE the proved recurrence (the
    // iteration matrix stays column-stochastic with the completion, so
    // the same ℓ1 contraction factor applies). The oracle unrolls all
    // 18 rounds including the per-round dangling sum — hash-green IS
    // the proof check for the dangling variant.
    "q_pagerank_directed_converged" -> ((s, dir) => {
      val edges = t(s, dir, "customer").select(
          concat(lit("c:"), col("c_custkey")).as("src"),
          concat(lit("n:"), col("c_nationkey")).as("dst")).distinct()
      graft.operators.Graph.pageRankConverged(edges,
          maxIters = 18, damping = 0.25, roundDp = 6)
        .select(col("node"), round(col("r"), 6).as("rank"))
        .orderBy(col("rank").desc, col("node")).limit(20)
    }),

    // J+ iterative graph — the provable early-exit on PERSONALIZED
    // PageRank (round-10 verdict #4): the teleport restriction changes
    // only the recurrence's affine constant, not its damping ×
    // column-stochastic linear part, so the identical contraction +
    // boundary-clearance proof stops the loop once round(r_i, 6)
    // provably equals round(r_18, 6) — verified against the full
    // 18-round unrolled oracle. Components unreachable from the seeds
    // hold rank exactly 0.0 (cleared boundary distance 0.5).
    "q_ppr_converged" -> ((s, dir) => {
      val e0 = t(s, dir, "customer").select(
          concat(lit("c:"), col("c_custkey")).as("src"),
          concat(lit("n:"), col("c_nationkey")).as("dst")).distinct()
      val edges = e0.unionByName(
          e0.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = t(s, dir, "nation").filter(col("n_nationkey") < 5)
        .select(concat(lit("n:"), col("n_nationkey")).as("node"))
      graft.operators.Graph.personalizedPageRankConverged(edges, seeds,
          maxIters = 18, damping = 0.25, roundDp = 6)
        .select(col("node"), round(col("r"), 6).as("rank"))
        .orderBy(col("rank").desc, col("node")).limit(20)
    }),

    // J+ iterative graph — INCREMENTAL PageRank maintenance (round 12):
    // the crawl-loop shape, where recomputing web-scale ranks from
    // scratch per ingest batch is the scale-killer. The previous
    // batch's converged ranks (2/3 of customers) warm-start the rank
    // pass over the GROWN graph (all customers); the operator exits
    // only when round(warm_i, 6) PROVABLY equals round(cold_18, 6) —
    // measured ℓ1-contraction bound + the a-priori 2·d^18 bound on the
    // cold trajectory + rounding-boundary clearance — so the oracle is
    // literally the cold 18-round full-graph unroll, and hash-green
    // verifies the warm-start equality theorem. The spec additionally
    // pins that warm converges in FEWER rounds than cold.
    "q_pagerank_incremental" -> ((s, dir) => {
      def sym(c: DataFrame) = {
        val e0 = c.select(concat(lit("c:"), col("c_custkey")).as("src"),
          concat(lit("n:"), col("c_nationkey")).as("dst")).distinct()
        e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      }
      val cust = t(s, dir, "customer")
      // the previous batch's ranks EXIST in production (they are the
      // previous run's output) — ensure-built once per corpus identity,
      // like every stored artifact here, so the timed query prices what
      // incremental maintenance costs: the warm rounds over the grown
      // graph. The proof makes the result independent of prev anyway.
      val art = indexPathFor(dir, "customer", "rank", "prev",
        "d=0.25,dp=6,m=18,mod3")
      graft.operators.IndexStore.ensure(art) { stage =>
        graft.operators.Graph.pageRankConverged(
            sym(cust.filter(col("c_custkey") % 3 =!= 0)),
            maxIters = 18, damping = 0.25, roundDp = 6)
          .write.mode("overwrite").parquet(s"$stage/ranks")
      }
      graft.operators.Graph.pageRankWarmStart(sym(cust),
          s.read.parquet(s"$art/ranks"),
          maxIters = 18, damping = 0.25, roundDp = 6)
        .select(col("node"), round(col("r"), 6).as("rank"))
        .orderBy(col("rank").desc, col("node")).limit(20)
    }),

    // J+ iterative graph — incremental PERSONALIZED PageRank: the same
    // warm-start equality theorem on the seed-teleport recurrence (the
    // teleport changes only the affine constant, not the contraction).
    // Oracle = q_ppr_converged's cold 18-round unroll on the full
    // graph; prev ranks are the prior batch's ensure-built output.
    "q_ppr_incremental" -> ((s, dir) => {
      def sym(c: DataFrame) = {
        val e0 = c.select(concat(lit("c:"), col("c_custkey")).as("src"),
          concat(lit("n:"), col("c_nationkey")).as("dst")).distinct()
        e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      }
      val cust = t(s, dir, "customer")
      val seeds = t(s, dir, "nation").filter(col("n_nationkey") < 5)
        .select(concat(lit("n:"), col("n_nationkey")).as("node"))
      val art = indexPathFor(dir, "customer", "rank", "pprprev",
        "d=0.25,dp=6,m=18,mod3,n5")
      graft.operators.IndexStore.ensure(art) { stage =>
        graft.operators.Graph.personalizedPageRankConverged(
            sym(cust.filter(col("c_custkey") % 3 =!= 0)), seeds,
            maxIters = 18, damping = 0.25, roundDp = 6)
          .write.mode("overwrite").parquet(s"$stage/ranks")
      }
      graft.operators.Graph.personalizedPageRankWarmStart(sym(cust), seeds,
          s.read.parquet(s"$art/ranks"),
          maxIters = 18, damping = 0.25, roundDp = 6)
        .select(col("node"), round(col("r"), 6).as("rank"))
        .orderBy(col("rank").desc, col("node")).limit(20)
    }),

    // A6+ domain pack — time-weighted average per user-day (the vwap
    // sibling weighted by holding seconds, not volume): one lead()
    // window + one aggregate sharing the user partitioning.
    "q_twap" -> ((s, dir) => {
      Analytics.twap(t(s, dir, "events"),
          Seq(col("user_id"), date_trunc("day", col("ts")).as("day")),
          col("ts"), Seq(col("event_id")), col("value"))
        .orderBy("user_id", "day")
    }),

    // W3+ — rolling 20-row z-score anomaly flag per user: three frame
    // aggregates in one WindowExec, null until the frame fills.
    "q_rolling_zscore" -> ((s, dir) => {
      Analytics.rollingZscore(t(s, dir, "events"),
          Seq(col("user_id")), Seq(col("ts"), col("event_id")),
          col("value"), n = 20, k = 2.5)
        .select("event_id", "user_id", "ts", "value", "zscore", "is_anomaly")
        .orderBy("user_id", "ts", "event_id")
    }),

    // W1+ — calendar-spine gap fill: per-user hourly spine generated
    // DISTRIBUTED (sequence+explode from the bounds aggregate), left
    // join of observed hourly means, forward fill over the holes.
    "q_gap_fill" -> ((s, dir) => {
      Fill.gapFillHourly(t(s, dir, "events"),
          col("user_id"), col("ts"), col("value"))
        .select(col("key").as("user_id"), col("h"), col("v_obs"),
          col("is_gap"), col("v_filled"))
        .orderBy("user_id", "h")
    }),

    // LLM-pipeline — deterministic weighted sampling without
    // replacement (Efraimidis-Spirakis A-ES via portable hash
    // uniforms): 5 docs per source, selection probability ∝ n_chars.
    "q_weighted_sample" -> ((s, dir) => {
      Corpus.weightedSample(t(s, dir, "documents"),
          col("doc_id"), col("source"), col("n_chars"), k = 5)
        .select(col("group").as("source"), col("key").as("doc_id"),
          col("weight").as("n_chars"), col("score"), col("rn"))
        .orderBy("source", "rn")
    }),

    // LLM-pipeline — sorted-neighborhood candidate mining (merge/purge
    // blocking): sort each lang block by doc length, pair each doc with
    // its next 3 neighbors, verify with levenshtein over a 60-char
    // prefix. One window sort per block, no self-join.
    "q_sorted_neighborhood" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      NearDup.sortedNeighborhood(d, col("doc_id"), col("lang"),
          Seq(col("n_chars"), col("doc_id")),
          substring(col("text"), 1, 60), w = 3, maxDist = 25)
        .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"),
          col("block").as("lang"), col("gap"), col("dist"))
        .orderBy("doc_a", "doc_b")
    }),

    // W3+ — last-touch attribution: every purchase credits the user's
    // most recent click within a 7-day lookback; one cumulative window
    // over the shared per-user sort, lookback as a post-filter on
    // integral epoch seconds.
    "q_attribution" -> ((s, dir) => {
      Analytics.lastTouchAttribution(t(s, dir, "events"),
          col("user_id"), col("ts"), Seq(col("event_id")),
          col("event_id"), col("event_type"),
          touchType = "click", convType = "purchase",
          lookbackSec = 604800L)
        .orderBy("conv_event_id")
    }),

    // J+ spatial — grid-bucketed radius join: 3×3 cell-neighborhood
    // candidates, integer squared-euclidean verify join-side — the 2-D
    // analogue of the LSH band join. Coordinates are md5-derived ints,
    // so the oracle replays them exactly.
    "q_spatial_join" -> ((s, dir) => {
      val pts = t(s, dir, "customer").select(col("c_custkey").as("id"),
        (conv(substring(md5(concat(lit("x:"), col("c_custkey"))), 1, 4),
          16, 10).cast("long") % 1000).as("x"),
        (conv(substring(md5(concat(lit("y:"), col("c_custkey"))), 1, 4),
          16, 10).cast("long") % 1000).as("y"))
      graft.operators.Spatial.gridRadiusJoin(
          pts, pts.filter(col("id") % 97 === 0),
          col("id"), col("x"), col("y"), radius = 50L, cellSize = 50L)
        .orderBy("q_id", "p_id")
    }),

    // F+ — Spark 4 VARIANT path: parse_json once into the binary
    // variant encoding, typed variant_get extraction (the columnar
    // semi-structured fast path vs per-access string re-parsing).
    "q_variant" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"),
          variant_get(parse_json(col("props")), "$.k", "int").as("k"))
        .filter(col("k").isNotNull && pmod(col("k"), lit(7)) === 0)
        .orderBy("event_id")
    }),

    // LLM+ — RAG chunking: overlapping fixed-char windows, pure per-row
    // explode (no shuffle; amplification bounded by doc length).
    "q_chunk" -> ((s, dir) => {
      Corpus.chunkDocuments(t(s, dir, "documents"),
          col("doc_id"), col("text"), window = 200, stride = 150)
        .orderBy("key", "chunk_id")
    }),

    // LLM+ — deterministic 80/10/10 train/val/test split: md5 bucket
    // vs exact integer thresholds, zero shuffle, rows never migrate.
    "q_split" -> ((s, dir) => {
      Curation.trainValTestSplit(t(s, dir, "documents"), col("doc_id"),
          valPct = 10, testPct = 10)
        .orderBy("key")
    }),

    // LLM+ — L2 norm stats per embedding (decimal-dot squared norm,
    // one double sqrt) + first normalized component as witness.
    "q_embed_norm" -> ((s, dir) => {
      Similarity.embedNormStats(t(s, dir, "embeddings"),
          col("vec_id"), col("embedding"))
        .orderBy("id")
    }),

    // LLM+ privacy — k-anonymity audit over (cohort, event_type)
    // quasi-identifiers; one map-side-combined aggregate.
    "q_k_anon" -> ((s, dir) => {
      Curation.kAnonymity(t(s, dir, "events"),
          Seq(pmod(col("user_id"), lit(500)).as("cohort"),
            col("event_type")), k = 3L)
        .orderBy("cohort", "event_type")
    }),

    // A+ experimentation — two-proportion z-test over hash-assigned
    // variants (unit = user, conversion = any purchase event).
    "q_ab_test" -> ((s, dir) => {
      Analytics.abTest(t(s, dir, "events"), col("user_id"),
          when(col("user_id") % 2 === 0, "a").otherwise("b"),
          col("event_type") === "purchase")
        .orderBy("va")
    }),

    // A+ diagnostics — pre-join fan-out audit on the part key: the 20
    // keys whose multiplicity product will dominate the join output.
    "q_join_audit" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Analytics.joinFanoutAudit(li, li.filter(col("l_quantity") > 25),
          col("l_partkey"), col("l_partkey"), k = 20)
    }),

    // A+ diagnostics — per-key group-size distribution (the salting /
    // AQE-skew decision input); two aggregates, one output row.
    "q_skew_profile" -> ((s, dir) => {
      Analytics.skewProfile(t(s, dir, "lineitem"), Seq(col("l_suppkey")))
        .orderBy("n_keys")
    }),

    // D+ lineage — exact-dup provenance over documents ∪ a mirrored
    // third: per digest the copy count, keeper and sorted source set.
    "q_provenance" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = d.select(col("doc_id"), col("text"), col("source"))
        .unionByName(d.filter(col("doc_id") % 3 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text"),
            lit("mirror").as("source")))
      Dedup.dedupProvenance(corpus, col("doc_id"), md5(col("text")),
          col("source"))
        .orderBy("digest")
    }),

    // LLM+ retrieval — inverted index: term → true df + posting list
    // truncated to the first 40 doc ids (the shard cap; rank-then-
    // collect so no buffer ever exceeds the cap).
    "q_inverted_index" -> ((s, dir) => {
      TextAnalysis.invertedIndex(t(s, dir, "documents"),
          col("doc_id"), col("text"), maxPostings = 40)
        .orderBy("term")
    }),

    // K+ scale — bucketed co-located join: both sides written bucketed
    // by the join key into the same bucket count, so the join reads
    // bucket i against bucket i with NO exchange on either side (the
    // pre-shuffled layout a 100 TB fact↔fact join amortizes across every
    // downstream query; AqeSpec asserts the exchange-free plan). Tables
    // are EXTERNAL at pid-scoped scratch paths — catalog metadata (the
    // bucket spec lives there) is per-session, files per-JVM.
    "q_bucket_join" -> ((s, dir) => {
      s.sql("DROP TABLE IF EXISTS bkt_orders")
      s.sql("DROP TABLE IF EXISTS bkt_customer")
      t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").format("parquet")
        .option("path", scratchDir("bkt_orders"))
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("bkt_orders")
      t(s, dir, "customer").select("c_custkey", "c_nationkey")
        .write.mode("overwrite").format("parquet")
        .option("path", scratchDir("bkt_customer"))
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("bkt_customer")
      s.table("bkt_orders")
        .join(s.table("bkt_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(30,10)"))
            .cast("decimal(38,4)").cast("double").as("sum_price"))
        .orderBy("c_nationkey")
    }),

    // G+ — per-node triangle counts under degree-ordered wedge
    // enumeration, over a deterministic ring+chord graph derived from
    // customer keys (c, c+1), (c, c+2), and (c, c+5) on every 7th node.
    "q_triangles" -> ((s, dir) => {
      val d = t(s, dir, "customer").select((col("c_custkey") - 1).as("a"))
      val base = d.crossJoin(broadcast(d.agg(count(lit(1)).as("n"))))
      val raw = base.select(col("a").as("src"),
          pmod(col("a") + 1, col("n")).as("dst"))
        .unionByName(base.select(col("a").as("src"),
          pmod(col("a") + 2, col("n")).as("dst")))
        .unionByName(base.filter(col("a") % 7 === 0)
          .select(col("a").as("src"), pmod(col("a") + 5, col("n")).as("dst")))
      graft.operators.Graph.triangleCounts(raw).orderBy("node")
    }),

    // G+ — k-hop BFS over the part↔supplier bipartite graph from seed
    // suppliers; frontier iteration, each edge traversed once total.
    "q_reachability" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      // no caller-side distinct: kHopReachability canonicalizes edges
      // internally — a distinct here would just pay the same wide
      // shuffle twice
      val e0 = li.select(concat(lit("p:"), col("l_partkey")).as("src"),
          concat(lit("s:"), col("l_suppkey")).as("dst"))
      val edges = e0.unionByName(
        e0.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = li.filter(col("l_suppkey") % 10 === 0)
        .select(concat(lit("s:"), col("l_suppkey")).as("node")).distinct()
      graft.operators.Graph.kHopReachability(edges, seeds, maxHops = 3)
        .orderBy("node")
    }),

    // LLM+ phrase mining — PMI collocations over adjacent token pairs;
    // minCount prunes the bigram table before any join.
    "q_pmi" -> ((s, dir) => {
      TextAnalysis.pmiCollocations(t(s, dir, "documents"),
          col("text"), minCount = 10L)
        .orderBy("w1", "w2")
    }),

    // W3+ — top navigation paths: each user's first-5 event-type path,
    // counted and top-k'd via TakeOrderedAndProject.
    "q_top_paths" -> ((s, dir) => {
      Analytics.topPaths(t(s, dir, "events"), col("user_id"), col("ts"),
          Seq(col("event_id")), col("event_type"), maxSteps = 5, k = 20)
    }),

    // A6+ — per-user-day EWMA in the adjusted (ratio) form: two plain
    // sums instead of a sequential recursion, so one window + one
    // aggregate and the oracle replays it exactly.
    "q_ewma" -> ((s, dir) => {
      Analytics.ewma(t(s, dir, "events"),
          Seq(col("user_id"), date_trunc("day", col("ts")).as("day")),
          col("ts"), Seq(col("event_id")), col("value"), alpha = 0.3)
        .orderBy("user_id", "day")
    }),

    // A6+ — market-basket pair mining over (user, event_type) baskets:
    // support / confidence / lift; pair fan-out bounded by basket size.
    "q_market_basket" -> ((s, dir) => {
      Analytics.marketBasket(t(s, dir, "events"),
          col("user_id"), col("event_type"))
        .orderBy("item_a", "item_b")
    }),

    // W3+ — first-order Markov transitions over each user's event
    // stream: one lead() window, one matrix aggregate, per-row
    // normalization over the |states|² matrix.
    "q_transitions" -> ((s, dir) => {
      Analytics.transitions(t(s, dir, "events"),
          col("user_id"), Seq(col("ts"), col("event_id")),
          col("event_type"))
        .orderBy("from_state", "to_state")
    }),

    // D+ — debounce: chained-gap burst suppression per (user, type);
    // keeps each burst's first event with an absorbed-count.
    "q_debounce" -> ((s, dir) => {
      Dedup.debounce(t(s, dir, "events"),
          Seq(col("user_id"), col("event_type")), col("ts"),
          Seq(col("event_id")), toleranceSec = 300L)
        .select("event_id", "user_id", "event_type", "ts", "burst",
          "n_in_burst")
        .orderBy("user_id", "event_type", "burst")
    }),

    // P+ — unpivot/melt: wide metric columns to long (metric, value)
    // form — the inverse of q_pivot, Spark's native unpivot operator.
    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"),
          col("p_size").cast("double").as("p_size"), col("p_retailprice"))
        .unpivot(Array(col("p_partkey"), col("p_brand")),
          Array(col("p_size"), col("p_retailprice")), "metric", "value")
        .orderBy("p_partkey", "metric")
    }),

    // J+ — bloom-pruned semi-join: dim keys aggregated into one bloom
    // sketch (Spark's own BloomFilterAggregate), broadcast, fact rows
    // pruned map-side before the exact verifying semi-join. Result
    // equals the plain semi join row-for-row (the oracle).
    "q_bloom_prune" -> ((s, dir) => {
      Skew.bloomSemiJoin(
          t(s, dir, "lineitem"), col("l_partkey"),
          t(s, dir, "part").filter(col("p_size") >= 40), col("p_partkey"),
          expectedItems = 100000L, numBits = 1L << 20)
        .groupBy("l_partkey").agg(count(lit(1)).as("n_lines"))
        .orderBy("l_partkey")
    }),

    // K+ layout — z-order clustering key: Morton-interleave
    // (p_partkey mod 1024, p_size), then per-tile min/max extents —
    // the zone-map tightness a z-layout buys parquet row-group stats.
    "q_zorder" -> ((s, dir) => {
      t(s, dir, "part")
        .select(pmod(col("p_partkey"), lit(1024L)).as("x"),
          col("p_size").cast("long").as("y"))
        .withColumn("z", Layout.zValue(col("x"), col("y"), bits = 10))
        .groupBy(shiftright(col("z"), 12).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"))
        .orderBy("bucket")
    }),

    // A2+ — cohort retention triangle: users bucketed by first-activity
    // day, distinct-user counts per (cohort, day offset).
    "q_cohort" -> ((s, dir) => {
      Analytics.cohortRetention(t(s, dir, "events"),
          col("user_id"), date_trunc("day", col("ts")))
        .orderBy("cohort", "day_offset")
    }),

    // W3+ — ordered funnel over event types: view → click → purchase,
    // stage k counting only at/after the chained stage k−1 time; all
    // stage layers share one window sort.
    "q_funnel" -> ((s, dir) => {
      Analytics.funnelStages(t(s, dir, "events"),
          col("user_id"), col("ts"), col("event_id"), col("event_type"),
          Seq("view", "click", "purchase"))
        .select(col("user").as("user_id"), col("reached"))
        .orderBy("user_id")
    }),

    // W1/W2+ — grouped linear time interpolation (pandas
    // interpolate(method="time") over the bar gaps ffill only steps).
    "q_interpolate" -> ((s, dir) => {
      val e = eventsWithNulls(s, dir)
      e.withColumn("value_interp",
          Fill.interpolateLinear(Seq(col("user_id")), Seq(col("ts"), col("event_id")))(
            col("value_n"), unix_micros(col("ts"))))
        .select("event_id", "user_id", "ts", "value_interp")
        .orderBy("user_id", "ts", "event_id")
    }),

    // A6 — candle resampling (per-key daily OHLC + exact volume sum).
    "q_candles" -> ((s, dir) => {
      Analytics.candles(t(s, dir, "events"), col("user_id"), col("ts"),
          col("event_id"), col("value"), date_trunc("day", col("ts")))
        .select(col("key").as("user_id"), col("bucket").as("day"),
          col("open"), col("high"), col("low"), col("close"), col("vsum"), col("n"))
        .orderBy("user_id", "day")
    }),

    // O3 — top-k (TakeOrderedAndProject; no global sort).
    "q_topk" -> ((s, dir) => {
      Analytics.topK(t(s, dir, "events"), 100, col("ts").desc, col("event_id").desc)
        .select("event_id", "ts", "event_type")
        .orderBy("event_id")
    }),

    // S3 — flair-predicate scan (extraction.py:114-119 builds
    // `flair:"A" OR flair:"B"` via prepare_reddit_query :325-327, then
    // sort="new" + fetch limit): an isin predicate over the flair column
    // plus newest-k — the predicate prunes at the scan (PushedFilters:
    // In(link_flair_text, …)); the limit is TakeOrderedAndProject, no
    // global sort. Posts-shaped frame derived from orders (offline
    // stand-in for the PRAW response, same derivation family as
    // q_pipeline_posts).
    "q_flair_filter" -> ((s, dir) => {
      val posts = t(s, dir, "orders").select(
        concat(lit("r"), col("o_orderkey").cast("string")).as("reddit_id"),
        when(col("o_orderkey") % 19 === 0, lit(null))
          .otherwise(concat(lit("flair"), (col("o_orderkey") % 7).cast("string")))
          .as("link_flair_text"),
        (lit(1700000000L) + col("o_orderkey")).as("published_at"),
        concat(lit("Post "), (col("o_custkey") % 20).cast("string")).as("title"))
      Analytics.topK(
          posts.filter(col("link_flair_text").isin("flair1", "flair3")),
          100, col("published_at").desc, col("reddit_id").desc)
        .orderBy("reddit_id")
    }),

    // A2 — per-flow record-count rollup (flows/main.py:20-29: news_count
    // + praw_count + alpaca_count, then the summed total). ONE pass:
    // each source contributes a 1-column (flow) stream and a single
    // rollup aggregate produces both grouping levels — per-flow and
    // grand total — from the same scan (a union + re-aggregate of the
    // per-flow frame would put the un-materialized source subtree into
    // the plan twice and re-scan every table for the total row).
    "q_flow_counts" -> ((s, dir) => {
      Seq("news" -> t(s, dir, "documents"),
          "praw" -> t(s, dir, "orders"),
          "alpaca" -> t(s, dir, "events"))
        .map { case (name, df) => df.select(lit(name).as("flow")) }
        .reduce(_.unionByName(_))
        .rollup("flow").agg(count(lit(1)).as("n_records"))
        .select(coalesce(col("flow"), lit("TOTAL")).as("flow"), col("n_records"))
        .orderBy("flow")
    }),

    // A1 — distinct (hash aggregate).
    "q_distinct" -> ((s, dir) =>
      t(s, dir, "events").select("user_id").distinct().orderBy("user_id")),

    // A3 — per-column null-fraction profile.
    "q_null_profile" -> ((s, dir) =>
      Analytics.nullProfile(eventsWithNulls(s, dir), Seq("value_n", "type_n"))),

    // A4 — duplicate-detection profile.
    "q_dup_profile" -> ((s, dir) => {
      Analytics.dupProfile(t(s, dir, "lineitem"), Seq("l_partkey", "l_suppkey"))
        .orderBy("l_partkey", "l_suppkey")
    }),

    // W3 — lag/delta per key.
    "q_lag_delta" -> ((s, dir) => {
      Analytics.lagDelta(t(s, dir, "events"), Seq(col("user_id")),
          Seq(col("ts"), col("event_id")), col("value"))
        .select("event_id", "user_id", "ts", "value", "prev_value", "delta")
        .orderBy("user_id", "ts", "event_id")
    }),

    // Sessionization — gap-based session ids (lag + running sum, one window).
    "q_sessions" -> ((s, dir) => {
      Analytics.sessionize(t(s, dir, "events"), Seq(col("user_id")), col("ts"),
          col("event_id"), gapSeconds = 1800)
        .select("event_id", "user_id", "ts", "session_id")
        .orderBy("user_id", "ts", "event_id")
    }),

    // J5 — as-of join (union + single window sort; no range-probe blowup).
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val probe = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val quote = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"), col("value").as("view_value"))
      Analytics.asOfJoin(probe, quote, "user_id", "ts", "event_id", Seq("view_value"))
        .orderBy("user_id", "ts", "event_id")
    }),

    // §3.1 — full news ETL pipeline (transformation.py:13-78) over a
    // news-shaped frame derived from `documents`.
    "q_pipeline_news" -> ((s, dir) => {
      val raw = t(s, dir, "documents")
        .withColumn("url", concat(lit("https://example.com/"),
          (col("doc_id") % 400).cast("string")))
        .withColumn("author",
          when(col("doc_id") % 5 === 0, lit(null))
            .otherwise(concat(lit("author_"), (col("doc_id") % 10).cast("string"))))
        .withColumn("title",
          when(col("doc_id") % 7 === 0, lit(null))
            .otherwise(concat(lit("Title "), col("doc_id").cast("string"))))
        .withColumn("description",
          when(col("doc_id") % 9 === 0, lit(null)).otherwise(substring(col("text"), 1, 50)))
        .withColumn("content",
          when(col("doc_id") % 3 === 0, lit(null)).otherwise(col("text")))
        .withColumn("urlToImage", concat(lit("http://img/"), col("doc_id").cast("string")))
        .withColumn("source", struct(col("lang").as("id"), col("source").as("name")))
        .withColumn("publishedAt", date_format(
          expr("TIMESTAMP'2024-01-01' + make_interval(0,0,0,0,0,CAST(doc_id AS INT),0)"),
          "yyyy-MM-dd HH:mm:ss"))
      Transforms.transformNews(raw, col("doc_id"))
        .select("doc_id", "id", "url", "source_name", "author", "title",
          "content", "title_cleaned", "content_cleaned", "published_at")
        .orderBy("doc_id")
    }),

    // §3.2 — full reddit-post ETL pipeline (transformation.py:81-181) over
    // a post-shaped frame derived from `orders`.
    "q_pipeline_posts" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val raw = o.select(
        when(col("o_orderkey") % 97 === 0, lit(null))
          .otherwise(concat(lit("r"), (col("o_orderkey") % 1400).cast("string")))
          .as("reddit_id"),
        when(col("o_orderkey") % 89 === 0, lit(null))
          .otherwise(concat(lit("sub"), (col("o_custkey") % 5).cast("string")))
          .as("subreddit"),
        concat(lit("Post about "), (col("o_custkey") % 20).cast("string")).as("title"),
        when(col("o_orderkey") % 3 === 0, lit(null))
          .otherwise(concat(lit("text "), col("o_orderkey").cast("string")))
          .as("selftext"),
        when(col("o_orderkey") % 11 === 0, lit(null))
          .otherwise((col("o_orderkey") % 1000).cast("long")).as("score"),
        when(col("o_orderkey") % 13 === 0, lit(null))
          .otherwise((col("o_custkey") % 100).cast("long")).as("num_comments"),
        (col("o_orderkey") % 2 === 0).as("is_text_post"),
        when(col("o_orderkey") % 2 === 0, lit(null))
          .otherwise(concat(lit("https://news/"), (col("o_custkey") % 50).cast("string")))
          .as("url"),
        when(col("o_orderkey") % 19 === 0, lit(null))
          .otherwise(concat(lit("flair"), (col("o_orderkey") % 3).cast("string")))
          .as("link_flair_text"),
        when(col("o_orderkey") % 23 === 0, lit(null))
          .otherwise(lit(0.5) + (col("o_orderkey") % 50).cast("double") / lit(100.0))
          .as("upvote_ratio"),
        concat(lit("p"), (col("o_orderkey") % 1400).cast("string")).as("permalink"),
        (lit(1700000000L) + col("o_orderkey")).cast("double").as("published_at"),
        when(col("o_orderkey") % 29 === 0, lit(""))
          .when(col("o_orderkey") % 31 === 0, lit(null))
          .otherwise(lit("2024-03-01 12:00:00")).as("article_published_at"),
        when(col("o_orderkey") % 37 === 0, array(lit("news"), lit("markets")))
          .otherwise(array(lit("finance"))).as("article_category"),
        when(col("o_orderkey") % 41 === 0, lit(null))
          .otherwise(lit("Headline")).as("article_headline"),
        col("o_orderkey"))
      Transforms.transformPosts(raw, col("o_orderkey"))
        .select("id", "reddit_id", "subreddit", "title", "title_cleaned",
          "body_text", "body_cleaned", "score", "number_of_comments",
          "is_text_post", "subreddit_category", "upvote_ratio", "published_at",
          "article_url", "article_published_at", "article_category",
          "article_headline", "reddit_post_url")
        .orderBy("reddit_id")
    }),

    // §3.3 — full OHLCV bar ETL pipeline (transformation.py:184-231) over a
    // bar-shaped frame derived from `events` (string prices w/ junk+nulls).
    "q_pipeline_bars" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val vs = col("value").cast("string")
      val raw = e.select(
        concat(lit("S"), col("user_id").cast("string")).as("symbol"),
        col("ts").as("timestamp"),
        col("event_id"),
        when(col("event_id") % 7 === 0, lit(null)).otherwise(vs).as("open"),
        when(col("event_id") % 11 === 0, lit("junk")).otherwise(vs).as("high"),
        when(col("event_id") % 13 === 0, lit(null)).otherwise(vs).as("low"),
        vs.as("close"),
        when(col("event_id") % 5 === 0, lit(null)).otherwise(vs).as("vwap"),
        when(col("event_id") % 3 === 0, lit(null))
          .otherwise((col("event_id") % 1000).cast("string")).as("volume"),
        when(col("event_id") % 17 === 0, lit("x"))
          .otherwise((col("event_id") % 50).cast("string")).as("trade_count"))
      Transforms.transformBars(raw)
        .select(col("ticker"), col("timestamp").as("bar_ts"), col("event_id"),
          col("open"), col("high"), col("low"), col("close"), col("vwap"),
          col("volume"), col("trade_count"))
        .orderBy("ticker", "bar_ts")
    }),

    // ---------------------------------------------------------------
    // Training-data pipeline operators (builder prompt: dedup /
    // similarity / text analysis / multimodal)
    // ---------------------------------------------------------------

    // Exact content dedup: hash-groupBy on md5 digest, keep-min-id.
    // Corpus = documents ∪ exact copies (ids offset) so real dups exist.
    "q_dedup_exact" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text", "n_chars")
      val corpus = d.unionByName(
        d.select((col("doc_id") + 1000000).as("doc_id"), col("text"), col("n_chars")))
      Dedup.exactDedup(corpus, md5(col("text")), Seq(col("doc_id")))
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    }),

    // MinHash + LSH near-dup pairs over documents ∪ truncated copies
    // (last 10 chars cut — true near-dups the bands must catch).
    "q_minhash_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = dupCorpus(d)
      NearDup.minhashPairs(corpus, col("doc_id"), col("text"),
          n = 5, k = 8, threshold = 0.5)
        .orderBy("key_a", "key_b")
    }),

    // Banding-quality audit for the near-dup family (the q_ann_recall
    // counterpart): recall/precision of the raw LSH band candidates vs
    // the EXACT inverted-shingle-index pair set at the verify
    // threshold, across three (k, rowsPerBand) dials — recall prices
    // missed dups, precision prices wasted verification work.
    // The audit runs on a ¼ STRATUM (doc_id % 4 == 0 — planted copies
    // stay coherent: +1,000,000 ≡ 0 mod 4), the production shape: the
    // exact ground-truth side costs Σ df(shingle)², so audits sample,
    // measure, extrapolate. Banding a stratum ≡ stratum-filtering the
    // full corpus' band pairs (a doc's band values don't depend on
    // other docs), so the oracle post-filters the shared CTEs.
    "q_neardup_recall" -> ((s, dir) => {
      NearDup.minhashRecallAudit(
          dupCorpus(t(s, dir, "documents")).filter(col("doc_id") % 4 === 0),
          col("doc_id"), col("text"), n = 5, threshold = 0.5)
        .orderBy("k", "rows_per_band")
    }),

    // Near-dup clusters: connected components over the MinHash pair
    // graph. The pair graph comes from the MATERIALIZED band/set index
    // (built once per corpus identity, mined thereafter) — the
    // production shape where the index is a corpus artifact shared by
    // every pair consumer, so this query prices band-join + verify +
    // contraction, not a full re-shingling of the corpus.
    "q_dedup_clusters" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = dupCorpus(d)
      val pairs = NearDup.minhashPairsIndexed(s, nearDupIndexPath(dir),
        corpus, col("doc_id"), col("text"), n = 5, k = 8, threshold = 0.5)
      NearDup.dedupClusters(pairs).orderBy("key")
    }),

    // D+/LLM+ — INCREMENTAL cluster maintenance (round 12): the dedup
    // clusters of a GROWN pair graph computed from the PREVIOUS batch's
    // labels instead of re-contracting the whole corpus — the crawl
    // loop's dedup-cluster analogue of q_pagerank_incremental, but with
    // an EXACT equality argument: a (key, cluster_id) label set encodes
    // precisely its pair batch's connectivity (cluster ids are member
    // keys, so label edges connect exactly the old components and
    // preserve every min), hence clusters(labels(batch1) ∪ batch2) =
    // clusters(batch1 ∪ batch2) node-for-node. The oracle is the full
    // closure over ALL pairs — identity with q_dedup_clusters' answer
    // IS the theorem. Previous labels are an ensure-built artifact (the
    // prior run's output in production); the timed query prices the
    // warm contraction, whose inputs are mostly stars already.
    "q_dedup_clusters_incr" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = dupCorpus(d)
      val pairs = NearDup.minhashPairsIndexed(s, nearDupIndexPath(dir),
        corpus, col("doc_id"), col("text"), n = 5, k = 8, threshold = 0.5)
      val batch1 = pairs.filter(col("key_a") % 2 === 0)
      val batch2 = pairs.filter(col("key_a") % 2 =!= 0)
      val art = indexPathFor(dir, "documents", "cc", "prev",
        "n=5,k=8,t=0.5,evens")
      graft.operators.IndexStore.ensure(art) { stage =>
        NearDup.dedupClusters(batch1)
          .write.mode("overwrite").parquet(s"$stage/labels")
      }
      val labelEdges = s.read.parquet(s"$art/labels")
        .select(col("key").as("key_a"), col("cluster_id").as("key_b"))
      NearDup.dedupClusters(
          labelEdges.unionByName(batch2.select("key_a", "key_b")))
        .orderBy("key")
    }),

    // Curation+ — LEAKAGE-SAFE train/val/test split (round 12): the
    // split hash is computed on the near-dup CLUSTER representative,
    // not the row key, so a document and its near-copies always land
    // in the same split — the contamination-through-near-duplicates
    // hole a row-keyed split leaves open (a test doc whose near-copy
    // sits in train leaks the answer). Singleton docs (no near-dup)
    // cluster to themselves and get the plain split. Same indexed pair
    // graph + contraction as q_dedup_clusters; the split itself is
    // pure column work. Spec additionally asserts NO near-dup pair
    // crosses splits.
    "q_leakage_split" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = dupCorpus(d)
      val pairs = NearDup.minhashPairsIndexed(s, nearDupIndexPath(dir),
        corpus, col("doc_id"), col("text"), n = 5, k = 8, threshold = 0.5)
      val labels = NearDup.dedupClusters(pairs)
        .withColumnRenamed("key", "doc_id")
      val assigned = corpus.select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster"))
      Curation.splitByGroup(assigned, col("doc_id"), col("cluster"),
          valPct = 10, testPct = 10)
        .orderBy("key")
    }),

    // Dedup provenance capstone: one row per REAL duplicate group
    // (≥ 2 members) — cluster id (= the kept representative, the min
    // key), member count, and the sorted member list a lineage audit
    // stores next to the deduped corpus. Same indexed pair graph and
    // contraction as q_dedup_clusters; one extra aggregate.
    "q_cluster_reps" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = dupCorpus(d)
      val pairs = NearDup.minhashPairsIndexed(s, nearDupIndexPath(dir),
        corpus, col("doc_id"), col("text"), n = 5, k = 8, threshold = 0.5)
      // `members` is a comma-joined string, not an array: top-level
      // array columns crash the driver's pandas-based oracle compare
      // (unhashable ndarray in sort_values), and Verify rejects them.
      // Sort NUMERICALLY before casting so "10" lands after "2".
      NearDup.dedupClusters(pairs)
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_members"),
          array_join(array_sort(collect_list(col("key")))
            .cast("array<string>"), ",").as("members"))
        .filter(col("n_members") >= 2)
        .orderBy("cluster_id")
    }),

    // 16-bit SimHash fingerprints over whitespace tokens.
    "q_simhash" -> ((s, dir) => {
      NearDup.simhash16(t(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy("key")
    }),

    // Incremental near-dup: new batch vs existing corpus (never
    // existing×existing). Even ids arrive truncated (near-dups →
    // dropped); odd ids arrive word-reversed (novel → survive).
    "q_dedup_incremental" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val ws = filter(split(col("text"), "\\s+"), w => w =!= "")
      val incoming = d.select((col("doc_id") + 1000000).as("doc_id"),
        when(col("doc_id") % 2 === 0,
          col("text").substr(lit(1), length(col("text")) - 10))
          .otherwise(array_join(reverse(ws), " ")).as("text"))
      NearDup.incrementalSurvivors(d.select(col("doc_id"), col("text")),
          incoming, col("doc_id"), col("text"), n = 5, k = 8, threshold = 0.5)
        .orderBy("key")
    }),

    // Asymmetric near-containment: truncated copies score 1.0 on the
    // contained side even where the symmetric Jaccard would fade with
    // the size gap — the subset-document detector (quotes, boilerplate
    // wraps). Same LSH candidates as q_minhash_pairs, both direction
    // scores verified — and the SAME materialized band/set index: the
    // stored tables are exactly this query's inputs, so it prices only
    // candidate-join + verify, never a re-shingling of the corpus.
    "q_containment" -> ((s, dir) => {
      val corpus = dupCorpus(t(s, dir, "documents"))
      NearDup.containmentPairsIndexed(s, nearDupIndexPath(dir), corpus,
          col("doc_id"), col("text"), n = 5, k = 8, threshold = 0.9)
        .orderBy("key_a", "key_b")
    }),

    // SimHash near-dup pair mining: 60-bit fingerprints, 4 Hamming bands
    // (guaranteed recall for hamming ≤ 3), exact per-candidate verify.
    // 60 bits (not 32) because band width IS the candidate-volume dial:
    // 15-bit bands split this corpus's fat fingerprint buckets ~10×
    // finer than 8-bit bands (10.9M → 1.06M candidate pairs at sf0.1).
    // maxBucket=200 (round-9): the posting-list cap — a >200-wide
    // 15-bit-band bucket is a fingerprint cluster whose Σ|bucket|² pair
    // volume dominated the whole join (sf0.1: candidates 2.14M → 0.80M,
    // pairs 12798 → 9519, planted-twin recall 96%); the drop is audited
    // by q_simhash_band_stats, not silent.
    "q_simhash_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = dupCorpus(d)
      NearDup.simhashPairs(
        NearDup.simhashBits(corpus, col("doc_id"), col("text"), nBits = 60),
        nBits = 60, nBands = 4, maxHam = 3, maxBucket = 200)
        .orderBy("key_a", "key_b")
    }),

    // The cap's audit counters (no silent truncation): bucket and
    // candidate counts kept/dropped by q_simhash_pairs' maxBucket=200.
    "q_simhash_band_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = dupCorpus(d)
      NearDup.simhashBandStats(
        NearDup.simhashBits(corpus, col("doc_id"), col("text"), nBits = 60),
        nBits = 60, nBands = 4, maxBucket = 200)
    }),

    // Brute-force n-gram Jaccard on known candidate pairs (LSH baseline).
    "q_ngram_jaccard" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = dupCorpus(d)
      val pairs = d.select(col("doc_id").as("key_a"),
        (col("doc_id") + 1000000).as("key_b"))
      NearDup.ngramJaccardSets(corpus, col("doc_id"), col("text"), pairs, n = 8)
        .select("key_a", "key_b", "n_inter", "jacc")
        .orderBy("key_a")
    }),

    // Brute-force cosine top-k ANN baseline (decimal-exact dot products).
    "q_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.cosineTopK(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    // Symmetric int8 quantization of the embedding column: per-vector
    // scale + quantized-value stats (the 4× bandwidth play for ANN).
    "q_embed_quantize" -> ((s, dir) => {
      Similarity.quantizeInt8(t(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("vec_id"), col("scale"),
          array_min(col("q")).as("qmin"), array_max(col("q")).as("qmax"),
          aggregate(col("q"), lit(0L), (a, x) => a + x).as("qsum"),
          aggregate(col("q"), lit(0L), (a, x) => a + x * x).as("qnorm2"))
        .orderBy("vec_id")
    }),

    // Approximate cosine top-k over int8-quantized vectors (scales cancel
    // in the ratio — integer sums + one double division).
    "q_quantize_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.quantizedTopK(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"), col("approx_cos"),
          col("rank").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    // Sign-LSH bucketed ANN — the scale path (join on bucket, not
    // cross); buckets are md5-seeded dense ±1 hyperplane signs.
    "q_ann_bucketed" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bucketedTopK(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", nBits = 4, dim = 64, k = 3)
        .select(col("query_id"), col("bucket"), col("neighbor_id"), col("cos"),
          col("rank").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    // Full k-NN graph: bucketed self-join — every vector a query, pair
    // count Σ|bucket|² not n²; the edge list downstream graph passes eat.
    // PAIR-BUDGET width × 4 OR-tables (round-13 sf1 + round-14
    // factor-100 captures): a fixed bucket space is quadratic in the
    // corpus, and an occupancy-only ladder stays quadratic on
    // CLUSTERED corpora — the width is the max of the occupancy ladder
    // and the measured-histogram budget width (Σc² ≤ 32·n,
    // Similarity.pairBudgetSignBits; one stats pass of orchestration
    // metadata), and the OR over 4 independent tables buys the recall
    // back. The oracle replays the same integer-exact width rule.
    "q_knn_graph" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val (nb, nCorpus) = Similarity.pairBudgetSignBitsWithN(emb,
        col("embedding"), dim = 64, nTables = 4)
      Guards.record("similarity.knnGraph.width", nCorpus, s"nb=$nb")
      Similarity.knnGraph(emb, "vec_id", "embedding",
          nBits = nb, dim = 64, k = 3, nTables = 4)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rank").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    // Multi-probe sign-LSH (Lv et al., VLDB'07): each query also probes
    // the buckets reached by flipping its two least-confident bits
    // (smallest |projection|) — recall recovered without touching the
    // corpus bucketing, candidates ≈ nProbe × |bucket| per query.
    "q_ann_multiprobe" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.multiProbeTopK(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", nBits = 4, dim = 64, nProbe = 3, k = 3)
        .select(col("query_id"), col("neighbor_id"), col("cos"),
          col("rank").as("rnk"))
        .orderBy("query_id", "rnk")
    }),

    // Weak supervision — label propagation over the k-NN graph: seed
    // labels (vec_id < 50) spread to unlabeled vectors by 3 rounds of
    // in-neighbor majority vote (ties → smallest label). The
    // training-data labeling primitive: label 10% by hand, propagate
    // over embedding similarity. Fixed-k BY CONTRACT (the oracle's l3
    // CTE is the 3-hop answer); pipelines that need the fixpoint pass
    // requireConverged = true and get a loud failure instead of
    // round-3 state (GraphSpec chain fixture).
    "q_label_prop" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val (nb, nCorpus) = Similarity.pairBudgetSignBitsWithN(emb,
        col("embedding"), dim = 64, nTables = 4)
      Guards.record("similarity.labelProp.width", nCorpus, s"nb=$nb")
      val kg = Similarity.knnGraph(emb, "vec_id", "embedding",
          nBits = nb, dim = 64, k = 3, nTables = 4)
        .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
      val edges = kg.unionByName(
        kg.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = emb.filter(col("vec_id") < 50)
        .select(col("vec_id").as("node"), col("label"))
      graft.operators.Graph.labelPropagation(edges, seeds, iters = 3)
        .orderBy("node")
    }),

    // ANN retrieval-quality audit: recall@5 of each approximate method
    // (sign-LSH buckets, multi-probe LSH, IVF posting lists) against
    // brute-force cosine ground truth — the number every ANN paper
    // reports and the one that justifies the bucketed scale path. Both
    // sides are deterministic, so the recall itself is oracle-checkable.
    "q_ann_recall" -> ((s, dir) =>
      annRecallReport(t(s, dir, "embeddings").select("vec_id", "embedding"))),

    // Round-9 verdict #6: the SAME audit on a corpus with planted
    // CLUSTER structure (16 centroids = the first 16 vectors; every
    // vector = its centroid ± 0.05 hash-jitter per dim). The uniform
    // corpus is the documented LSH-adversarial case (q_ann_recall:
    // OR-LSH needs ~63% coverage for 0.90 recall); here the same
    // constructions prune hard — the coverage column is the point.
    "q_ann_recall_clustered" -> ((s, dir) =>
      annRecallReport(clusteredEmbeddings(s, dir))),

    // Heuristic language id: marker-pattern scoring + per-doc argmax.
    "q_lang_id" -> ((s, dir) => {
      TextAnalysis.langId(t(s, dir, "documents"), col("doc_id"), col("text"))(s)
        .orderBy("key")
    }),

    // Quality scoring: length/punct/stopword features + combined score.
    "q_quality_score" -> ((s, dir) => {
      TextAnalysis.qualityScore(t(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy("key")
    }),

    // Repetition stats: top-word share + duplicate word-2-gram fraction
    // (the Gopher-style boilerplate/spam signals).
    "q_repetition" -> ((s, dir) => {
      TextAnalysis.repetitionStats(t(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy("key")
    }),

    // Deterministic shard shuffle — the global-permutation step before
    // q_seq_pack's packing (shard by seeded hash, order within shard by
    // hash; no global sort / single-partition window).
    "q_shard_shuffle" -> ((s, dir) => {
      Curation.shuffleIntoShards(t(s, dir, "documents"), col("doc_id"),
          seed = "r5", nShards = 8)
        .orderBy("key")
    }),

    // Corpus bigram-LM fluency score (CCNet/KenLM-style filter,
    // self-trained on the corpus): mean conditional bigram probability
    // per doc — the cross-document quality signal alongside the per-doc
    // q_quality_score/q_repetition family.
    "q_bigram_lm" -> ((s, dir) => {
      TextAnalysis.bigramLmScore(t(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy("key")
    }),

    // Corpus health rollup — the daily per-(lang, source) stats query a
    // curation pipeline runs: doc/token/char totals + mean quality. One
    // partial/final aggregate over the quality features; mean via exact
    // decimal sum then a single double division (oracle bit-parity).
    "q_corpus_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val feat = TextAnalysis.withQualityFeatures(
        d.select(col("doc_id"), col("lang"), col("source"), col("text")), col("text"))
      feat.groupBy("lang", "source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("long")).as("sum_tokens"),
          sum(col("n_chars").cast("long")).as("sum_chars"),
          // exact decimal sum, then ONE double cast + division, rounded
          // to 9 digits: the wide-decimal→double cast diverges by 1 ULP
          // across engines (≈1e-17), far below the rounding grain — the
          // same compare contract tfidf's score column uses. (Narrowing
          // the decimal first doesn't work here: the two engines round
          // the scale-15→10 narrowing differently.)
          round(sum(col("score").cast("decimal(25,15)")).cast("double") /
            count(lit(1)).cast("double"), 9).as("mean_score"))
        .orderBy("lang", "source")
    }),

    // CCNet-style boilerplate stripping — frequency-per-domain line
    // removal (vs q_line_dedup's C4 keep-first). The fixture rebuilds
    // each doc with real newline structure: a per-source 10-word header
    // and footer (the templated nav/footer every page of a site shares)
    // around the body re-lined into 10-word rows; the operator must
    // find them by per-source document frequency, not by construction.
    "q_boilerplate" -> ((s, dir) => {
      Corpus.boilerplateStrip(boilerplateDocs(t(s, dir, "documents")),
          col("doc_id"), col("source"), col("text2"), minPct = 30)
        .orderBy("key")
    }),

    // RefinedWeb drop signal — per-doc fraction of 10-word chunks that
    // recur in ≥ 2 distinct docs (the shared near-dup corpus plants
    // them); decided by min≠max key over ONE chunk partitioning, no
    // self-join. The DROP-whole-docs side of q_line_dedup's strip.
    "q_dup_ngram_frac" -> ((s, dir) => {
      Corpus.dupNgramCoverage(dupCorpus(t(s, dir, "documents")),
          col("doc_id"), col("text"), lineWords = 10)
        .orderBy("key")
    }),

    // Zipf power-law fit per language slice — OLS slope of ln(freq) on
    // ln(rank) over the top-100 tokens (corpus-health drift signal).
    "q_zipf" -> ((s, dir) => {
      TextAnalysis.zipfSlope(t(s, dir, "documents"), col("lang"), col("text"),
          topK = 100)
        .select(col("grp").as("lang"), col("n_top"), col("zipf_slope"))
        .orderBy("lang")
    }),

    // Incremental Zipf maintenance — the vocabulary count table (a
    // BucketedTable keyed on hash(grp, tok) — round-12 verdict #2)
    // absorbs three ingest batches (doc_id mod 3), each committing
    // ONLY its touched buckets, and the fit reads the MAINTAINED
    // table; the oracle is the cold full-corpus q_zipf SQL — equality
    // IS the additivity theorem (same contract as
    // q_dedup_clusters_incr / q_pagerank_incremental).
    "q_zipf_incremental" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val batches = (0 until 3).map(i => d.filter(col("doc_id") % 3 === i))
      TextAnalysis.zipfSlopeIncremental(batches, col("lang"), col("text"),
          topK = 100, root = freshScratchDir("zipf_incr"))
        .select(col("grp").as("lang"), col("n_top"), col("zipf_slope"))
        .orderBy("lang")
    }),

    // Corpus-drift time travel (round-13 verdict #6) — the Zipf fit AS
    // OF historical ingest points: the maintained vocab table (a
    // BucketedTable; with no seeded base, batch b commits version b)
    // is materialized once as an _OK-gated artifact, and "the
    // vocabulary after batch 0" is a plain currentAsOf read — the
    // q_ivm_time_travel primitive applied to corpus statistics. The
    // oracle recomputes EACH as-of fit from the batch-restricted
    // corpus, so hash-green proves point-in-time correctness of the
    // maintained statistics, not just the final state.
    "q_zipf_asof" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val art = indexPathFor(dir, "documents", "zipf", "asof", "m3")
      graft.operators.IndexStore.ensure(art) { stage =>
        TextAnalysis.zipfMaintainVocab(
          (0 until 3).map(i => d.filter(col("doc_id") % 3 === i)),
          col("lang"), col("text"), root = stage)
        ()
      }
      Seq(("batch0", 0L), ("latest", Long.MaxValue)).map { case (tag, v) =>
        TextAnalysis.zipfSlopeAsOf(d, col("lang"), col("text"), topK = 100,
            root = art, maxVersion = v)
          .withColumn("as_of", lit(tag))
      }.reduce(_ unionByName _)
        .select(col("as_of"), col("grp").as("lang"), col("n_top"),
          col("zipf_slope"))
        .orderBy("as_of", "lang")
    }),

    // CCNet head/middle/tail terciles — the corpus-LM fluency score cut
    // at per-language exact ⅓/⅔ quantiles (broadcast cutoffs, no
    // per-language ntile sort).
    "q_ccnet_buckets" -> ((s, dir) => {
      TextAnalysis.ccnetBuckets(t(s, dir, "documents"), col("doc_id"),
          col("lang"), col("text"))
        .select(col("key").as("doc_id"), col("grp").as("lang"),
          col("lm_score"), col("bucket"))
        .orderBy("doc_id")
    }),

    // Token counting: whitespace + BPE-ish subword pre-tokenizer.
    "q_token_count" -> ((s, dir) => {
      TextAnalysis.tokenCounts(t(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy("key")
    }),

    // BPE tokenizer-training inner loop: corpus-wide adjacent char-pair
    // counts inside words, top-50 merge candidates.
    "q_bpe_pairs" -> ((s, dir) => {
      TextAnalysis.bpePairCounts(t(s, dir, "documents"), col("text"), k = 50)
    }),

    // BPE TRAINING: 8 iterated merges over the word-frequency table —
    // each round counts adjacent symbol pairs, picks the winner
    // deterministically, and applies the merge (two-pass literal
    // replace); emits the ordered merge table a tokenizer would load.
    "q_bpe_train" -> ((s, dir) => {
      TextAnalysis.bpeTrain(t(s, dir, "documents"), col("text"), merges = 8)
        .orderBy("merge_no")
    }),

    // BPE ENCODE: the token vocabulary after applying the 8 learned
    // merges — the vocab file a tokenizer ships next to its merge table.
    "q_bpe_vocab" -> ((s, dir) => {
      TextAnalysis.bpeVocab(t(s, dir, "documents"), col("text"), merges = 8)
        .orderBy("token")
    }),

    // Winnowing-lite fingerprints (4 smallest shingle hashes).
    "q_fingerprint" -> ((s, dir) => {
      TextAnalysis.fingerprint(t(s, dir, "documents"), col("doc_id"), col("text"),
          n = 8, take = 4)
        .orderBy("key")
    }),

    // Multimodal: binary payload + metadata struct + per-partition decode
    // (stubbed deterministically; plumbing is real — see Multimodal).
    "q_multimodal" -> ((s, dir) => {
      Multimodal.decodeFeatures(
        Multimodal.withPayload(t(s, dir, "documents"),
          col("doc_id"), col("text"), col("n_chars")))
        .orderBy("doc_id")
    }),

    // Perceptual near-dup over the image payloads (round-7 verdict #6):
    // blockhash fingerprints (32 block-mean bits over the payload byte
    // stream) + the SAME pigeonhole Hamming banding as text SimHash.
    // Fixture: each doc's payload plus a locally-edited copy (5 bytes
    // overwritten) — the edit moves one block's mean slightly, so
    // ~88% of copies land within hamming ≤ 3 while original pairs
    // essentially never collide (measured: 1 of 124,750 at sf0.01).
    "q_image_neardup" -> ((s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val pert = base.select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text").substr(lit(1), lit(10)), lit("zzzzz"),
          col("text").substr(lit(16), length(col("text")))).as("text"))
      val payloads = Multimodal.withPayload(base.unionByName(pert),
        col("doc_id"), col("text"), length(col("text")))
      Multimodal.imageNearDupPairs(payloads, col("doc_id"),
          nBlocks = 32, nBands = 4, maxHam = 3)
        .orderBy("key_a", "key_b")
    }),

    // PII redaction — emails / phone runs / IPv4 literals replaced with
    // placeholder tokens (synthetic PII injected deterministically so
    // the redaction is observable and the oracle replays it).
    "q_redact_pii" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val withPii = d.withColumn("t",
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"),
            lit("@example.com or +1 555-00"),
            (col("doc_id") % 100).cast("string"),
            lit("99 from 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".1")))
          .otherwise(col("text")))
      withPii.select(col("doc_id"),
          graft.functions.Text.redactPii(col("t")).as("clean"),
          (col("doc_id") % 3 === 0).as("had_pii"))
        .orderBy("doc_id")
    }),

    // Capstone: C4-style corpus cleaning — lang-id → quality filter →
    // exact dedup → MinHash near-dup removal, one composed lazy plan.
    "q_corpus_clean" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = dupCorpus(d)
      graft.operators.Corpus.cleanCorpus(corpus, col("doc_id"), col("text"),
          targetLang = "de", minScore = 0.25, n = 5, k = 8,
          jaccThreshold = 0.5)
        .orderBy("key")
    }),

    // Capstone #2 (round-9): the FULL curation assembly line — quality
    // gate → exact dedup → index-backed near-dup → decontaminate →
    // temperature mix → seq-pack, one composed plan over documents ∪
    // exact copies (+1M, exact-dedup fodder) ∪ truncated twins (+2M,
    // near-dup fodder); eval split = doc_id % 97 (removed with
    // everything sharing a 3-gram with it). Output: the packed
    // training-batch layout of the surviving mix.
    "q_pipeline_curate" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val base = d.select(col("doc_id"), col("text"), col("lang"), col("source"))
      val corpus = base
        .unionByName(base.select((col("doc_id") + 1000000).as("doc_id"),
          col("text"), col("lang"), col("source")))
        .unionByName(base.select((col("doc_id") + 2000000).as("doc_id"),
          col("text").substr(lit(1), length(col("text")) - 10).as("text"),
          col("lang"), col("source")))
      graft.operators.Corpus.curatePipeline(s, corpus,
          d.filter(col("doc_id") % 97 === 0).select("doc_id", "text"),
          nearDupIndexPath(dir, "curate", n = 5, k = 8,
            params = "minw=20,maxw=100000"),
          minWords = 20, maxWords = 100000,
          nNear = 5, kNear = 8, jaccThreshold = 0.5,
          nContam = 3, budget = 500L, capacity = 512)
        .orderBy("key")
    }),

    // C4-style cross-document line dedup: 10-word chunks, keep-first per
    // duplicated chunk corpus-wide, rebuild surviving text in order.
    "q_line_dedup" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val corpus = dupCorpus(d)
      graft.operators.Corpus.lineDedup(corpus, col("doc_id"), col("text"),
          lineWords = 10)
        .orderBy("key")
    }),

    // Multimodal #2 — resize planning: aspect-preserving fit-to-224
    // geometry as codegen'd column arithmetic (the pixel work happens in
    // the partition decoder; the geometry lets small-image skips push
    // down before any payload decode).
    "q_media_resize" -> ((s, dir) => {
      Multimodal.resizePlan(
        Multimodal.withPayload(t(s, dir, "documents"),
          col("doc_id"), col("text"), col("n_chars")), target = 224)
        .select(col("doc_id"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("out_w"), col("out_h"),
          col("resized"))
        .orderBy("doc_id")
    }),

    // Multimodal #3 — video-ish frame sampling: narrow sequence+explode
    // fan-out of sampled frame indexes, per-partition stub decode.
    "q_frame_sample" -> ((s, dir) => {
      Multimodal.sampleFrames(
        Multimodal.withVideoMeta(t(s, dir, "documents"),
          col("text"), col("n_chars")), stride = 7)
        .orderBy("doc_id", "frame_idx")
    }),

    // ---------------------------------------------------------------
    // Structured Streaming (§2.10) — AvailableNow over the landing dir;
    // deterministic, so these carry full oracles too.
    // ---------------------------------------------------------------

    "q_stream_candles" -> ((s, dir) =>
      graft.streaming.Streaming.streamingCandles(s, dir)
        .orderBy("user_id", "day")),

    "q_stream_sliding" -> ((s, dir) =>
      graft.streaming.Streaming.streamingSlidingRate(s, dir)
        .orderBy("event_type", "w_start")),

    "q_stream_dedup" -> ((s, dir) =>
      graft.streaming.Streaming.streamingDedup(s, dir)
        .orderBy("user_id", "event_type")),

    "q_stream_ffill" -> ((s, dir) =>
      graft.streaming.Streaming.streamingFfill(s, dir, nullEvery = 7)
        .orderBy("user_id", "ts", "event_id")),

    // Same stateful ffill on Spark 4's transformWithState (RocksDB state
    // store, typed ValueState) — shares q_stream_ffill's oracle SQL.
    "q_stream_ffill_tws" -> ((s, dir) =>
      graft.streaming.Streaming.streamingFfillTws(s, dir, nullEvery = 7)
        .orderBy("user_id", "ts", "event_id")),

    // S5 — map-of-lists flatten via explode (the Alpaca bar flatten,
    // extraction.py:215-222): rebuild a nested shape then explode it.
    "q_explode_flatten" -> ((s, dir) => {
      val nested = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(struct(col("l_linenumber"), col("l_partkey"),
          col("l_quantity")))).as("bars"))
      nested.select(col("l_orderkey"), explode(col("bars")).as("b"))
        .select(col("l_orderkey"), col("b.l_linenumber").as("l_linenumber"),
          col("b.l_partkey").as("l_partkey"), col("b.l_quantity").as("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    }),

    // S6 — warehouse lookup scan: key-set membership as a semi-join
    // (services/*_service.py `WHERE url IN (...)`).
    "q_semi_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val hot = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
      o.join(broadcast(hot), o("o_custkey") === hot("c_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // O5 — set ops: intersect + except over projected key sets.
    "q_set_ops" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val clickers = ev.filter(col("event_type") === "click").select("user_id")
      val buyers = ev.filter(col("event_type") === "purchase").select("user_id")
      clickers.intersect(buyers).withColumn("rel", lit("both"))
        .unionByName(clickers.distinct().exceptAll(buyers.distinct())
          .withColumn("rel", lit("click_only")))
        .orderBy("rel", "user_id")
    }),

    // A6+ — multi-level rollup (daily/monthly candle hierarchy).
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "events")
        .rollup(col("event_type"), month(col("ts")).cast("int").as("m"))
        .agg(count(lit(1)).as("n"),
          // rounded: the grand-total row's unscaled decimal exceeds
          // 2^53, where DuckDB's two-step decimal→double cast can sit
          // one ulp off Spark's correctly-rounded one
          round(Analytics.exactSum(col("value")).cast("double"), 4).as("vsum"))
        .orderBy(col("event_type").asc_nulls_first, col("m").asc_nulls_first)
    }),

    // A6+ — full cube over two grouping dims (all 4 grouping sets).
    "q_cube" -> ((s, dir) => {
      t(s, dir, "events")
        .cube(col("event_type"), (col("user_id") % 5).as("u_mod"))
        .agg(count(lit(1)).as("n"),
          round(Analytics.exactSum(col("value")).cast("double"), 4).as("vsum"))
        .orderBy(col("event_type").asc_nulls_first, col("u_mod").asc_nulls_first)
    }),

    // A6+ — cardinality sketch (approx_count_distinct / HLL++) as a
    // BOUNDED GATE (round-12 verdict #3): sketch estimates are
    // implementation-defined, so instead of the weaker rows-only check
    // the query emits the exact count (audit side — computed once, next
    // to the sketch, in the same aggregate) plus a boolean asserting
    // the estimate lands within 3× the documented default relative
    // standard deviation (rsd = 0.05 → |approx − exact| ≤ 0.15·exact).
    // The oracle replays the exact side and literal TRUE — a sketch
    // outside its documented bound now FAILS the hash gate.
    "q_approx_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("exact_parts"), col("n"),
          (abs(col("approx_parts") - col("exact_parts")).cast("double") <=
            lit(0.15) * col("exact_parts").cast("double")).as("approx_ok"))
        .orderBy("l_returnflag")
    }),

    // Embedding-cosine near-dup: planted perturbed copies (+0.01 on the
    // first dimension) must pair with their originals at cos ≈ 1.
    "q_embed_neardup" -> ((s, dir) => {
      embedNearDupPairs(s, dir).orderBy("id_a", "id_b")
    }),

    // Semantic dedup end-to-end (SemDeDup shape, Abbas et al. 2023):
    // embedding near-dup pairs → connected components → keep the min-id
    // representative per cluster. The survivors list is the actual
    // deliverable of embedding dedup — each planted perturbed copy
    // collapses onto its original.
    "q_semantic_dedup" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select("vec_id")
      val corpusIds = emb.unionByName(
        emb.select((col("vec_id") + 100000).as("vec_id")))
      val labels = NearDup.dedupClusters(embedNearDupPairs(s, dir)
        .select(col("id_a").as("key_a"), col("id_b").as("key_b")))
      corpusIds
        .join(labels.filter(col("key") =!= col("cluster_id"))
          .select(col("key").as("vec_id")), Seq("vec_id"), "left_anti")
        .orderBy("vec_id")
    }),

    // MLlib prediction stage (BASELINE.json spark_approach): seeded
    // logistic regression over the embedding features, deterministic
    // id-based fold split. The optimizer's output is not
    // SQL-expressible, so the gate asserts the INVARIANTS any valid
    // classifier output satisfies — probability is a distribution,
    // prediction = its argmax, predicted class ∈ label domain — as
    // per-row booleans the oracle replays as literal TRUE (round-12
    // verdict #3; was rows-only).
    "q_ml_predict" -> ((s, dir) => {
      graft.ml.Predict.classifyVerdicts(
          t(s, dir, "embeddings"), "vec_id", "embedding", "label")
        .orderBy("vec_id")
    }),

    // J5+ — interval join in binned-equi-join form (purchases within 1h
    // after each view; see Analytics.intervalJoinBinned scale notes).
    "q_interval_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      Analytics.intervalJoinBinned(views, purchases, "user_id", "ts", 3600)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("q_event_id"), col("q_ts"))
        .orderBy("event_id", "q_event_id")
    }),

    // Pivot: per-user event-type count matrix (explicit value list →
    // deterministic columns; a single partial+final aggregate).
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    }),

    // W3+ — ranking family: rank/dense_rank/ntile over per-key spend.
    "q_rank_funcs" -> ((s, dir) => {
      val spend = t(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(Analytics.exactSum(col("value")).cast("double").as("spend"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("spend").desc, col("user_id"))
      spend
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("tile", ntile(4).over(w))
        .orderBy("event_type", "rnk", "user_id")
    }),

    // A6+ — exact interpolated percentiles (linear interpolation is
    // bit-identical between Spark `percentile` and DuckDB quantile_cont).
    "q_percentiles" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // A6+ — APPROXIMATE percentiles (GK sketch) as a BOUNDED GATE
    // (round-12 verdict #3): the 100 TB path next to q_percentiles —
    // exact interpolated percentiles need each group's values assembled,
    // while the sketch merges bounded-size summaries map-side. The
    // sketch's documented guarantee is RANK error ≤ n/accuracy, so the
    // query joins the per-type estimates back over the values once,
    // counts each estimate's rank interval [lt+1, le], and asserts it
    // intersects [q·n − n/1000 − 1, q·n + n/1000 + 1]. The oracle
    // replays n and literal TRUE — a sketch outside its rank bound now
    // FAILS the hash gate.
    "q_approx_percentiles" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val sk = e.groupBy(col("event_type"))
        .agg(expr("approx_percentile(value, 0.5, 1000)").as("p50"),
          expr("approx_percentile(value, 0.9, 1000)").as("p90"),
          count(col("value")).as("n"))
      def rankOk(q: Double, lt: String, le: String): Column = {
        val eps = col("n").cast("double") / 1000d + 1d
        val target = lit(q) * col("n").cast("double")
        col(le).cast("double") >= target - eps &&
          col(lt).cast("double") <= target + eps
      }
      e.join(broadcast(sk), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(first(col("n")).as("n"),
          sum(when(col("value") < col("p50"), 1L).otherwise(0L)).as("lt50"),
          sum(when(col("value") <= col("p50"), 1L).otherwise(0L)).as("le50"),
          sum(when(col("value") < col("p90"), 1L).otherwise(0L)).as("lt90"),
          sum(when(col("value") <= col("p90"), 1L).otherwise(0L)).as("le90"))
        .select(col("event_type"), col("n"),
          rankOk(0.5, "lt50", "le50").as("p50_ok"),
          rankOk(0.9, "lt90", "le90").as("p90_ok"))
        .orderBy("event_type")
    }),

    // Skew path — two-stage salted aggregation over genuinely hot keys
    // (3 return flags across all of lineitem); result must equal the
    // plain groupBy, which is exactly what the oracle checks.
    "q_salted_agg" -> ((s, dir) => {
      graft.operators.Skew.saltedAgg(
          t(s, dir, "lineitem"), Seq(col("l_returnflag")), col("l_orderkey"),
          nSalts = 32, sums = Map("sum_qty" -> col("l_quantity").cast("decimal(30,10)")))
        .withColumn("sum_qty",
          col("sum_qty").cast("decimal(38,4)").cast("double"))
        .orderBy("l_returnflag")
    }),

    // Skew path #2 — salted JOIN: hot fact keys spread over 8 reducers,
    // dim side replicated 8x (narrow fan-out of the small side only).
    // Inner-join semantics are salt-invariant, which the oracle checks
    // against the plain join.
    "q_salted_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount"))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.operators.Skew.saltedJoin(li, ord, "l_orderkey",
          col("l_linenumber"), nSalts = 8)
        .groupBy("o_orderpriority")
        .agg(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(30,10)")).cast("decimal(38,4)").cast("double")
            .as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // IVF ANN — coarse-quantizer posting lists, nProbe=2 (scale path #2
    // alongside the sign-LSH bucketed variant).
    "q_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb,
          "vec_id", "embedding", nCentroids = 16, nProbe = 2, k = 3)
        .orderBy("query_id", "rnk")
    }),

    // IVF against the MATERIALIZED index (round 9): the corpus's
    // centroid assignment is stored once per corpus identity
    // (centroids + cent_id-partitioned posting lists); this query pays
    // only probe selection + the posting-list join. Same oracle as
    // q_ann_ivf — indexed == recomputed is the contract.
    "q_ann_ivf_indexed" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ensureIvfIndex(emb, "vec_id", "embedding",
        nCentroids = 16, path = ivfIndexPath(dir))
      Similarity.ivfTopKIndexed(s, ivfIndexPath(dir),
          emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          nProbe = 2, k = 3)
        .orderBy("query_id", "rnk")
    }),

    // IVF POST-APPEND audit (round-10 verdict #4): appendToIvfIndex
    // assigns new vectors to FROZEN centroids, so over many appends
    // list skew grows and recall can decay invisibly. This query makes
    // both facts recorded: after TWO append batches land in a per-run
    // mutable copy of the stored index, it reports every posting
    // list's size plus recall@5 of the appended index against brute
    // force over base ∪ appends — the rebuild-vs-append decision as a
    // hash-checked table. Appends are exact copies under shifted ids,
    // so the oracle replays the frozen-quantizer assignment literally.
    "q_ann_ivf_append_audit" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
      val pristine = ivfIndexPath(dir, "ivfappend")
      Similarity.ensureIvfIndex(emb, "vec_id", "embedding",
        nCentroids = 16, path = pristine)
      val scratch = scratchDir("ivf_append_audit")
      restoreMutableCopy(pristine, scratch)
      def batch(b: Int) = emb
        .filter(col("vec_id") >= 16 && col("vec_id") % 7 === b)
        .select((col("vec_id") + lit(100000L) * b).as("vec_id"),
          col("embedding"))
      (1 to 2).foreach(b => Similarity.appendToIvfIndex(s, batch(b),
        "vec_id", "embedding", scratch, wantIncrements = false))
      val q = emb.filter(col("vec_id") < 10)
      val topk = Similarity.ivfTopKIndexed(s, scratch, q,
        "vec_id", "embedding", nProbe = 2, k = 5)
      val ground = Similarity.cosineTopK(q,
          emb.unionByName(batch(1)).unionByName(batch(2)),
          "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"))
      val recall = topk
        .join(ground.withColumn("__hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .agg(sum(coalesce(col("__hit"), lit(0L))).as("hits"),
          countDistinct(col("query_id")).as("n_queries"))
        .select(col("hits"), col("n_queries"),
          round(col("hits").cast("double") /
            (col("n_queries") * 5).cast("double"), 6).as("recall_at_5"))
      s.read.parquet(s"$scratch/postings")
        .groupBy(col("cent_id").cast("long").as("cent_id"))
        .agg(count(lit(1)).as("n_vectors"))
        .crossJoin(broadcast(recall))
        .orderBy("cent_id")
    }),

    // IVF posting-list REBALANCE (round-10 verdict #3 acted on): 150
    // exact copies of one vector are appended under frozen centroids —
    // exactly the skew the append audit measures — then every list
    // above 1.5× the mean is split by deterministic local 2-means
    // (Similarity.rebalanceIvfIndex) behind the IndexStore swap. The
    // oracle replays the ENTIRE chain in SQL — frozen assignment,
    // integer-exact oversize rule, seeds, both Lloyd rounds,
    // decimal-exact positionwise means, renumbered probes — so the
    // hash compare is the probe-equivalence-vs-recompute proof, and
    // the output carries the post-rebalance list sizes plus recall@5
    // vs brute force (the before/after audit readout).
    "q_ann_ivf_rebalance" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").select("vec_id", "embedding")
      val copies = emb.filter(col("vec_id") === 20)
        .crossJoin(s.range(1, 151))
        .select((lit(100000L) + col("id")).as("vec_id"), col("embedding"))
      // the POST-rebalance index is itself an _OK-gated artifact built
      // once per corpus identity (round-11 verdict #8): the append +
      // staged-rewrite chain is deterministic given the pristine index,
      // and in production the rebalanced index IS the stored artifact —
      // the query prices the probes + the recall audit against it.
      val rebal = indexPathFor(dir, "embeddings", "ivf", "ivfrebal", "nc=16")
      graft.operators.IndexStore.ensure(rebal) { stage =>
        val pristine = ivfIndexPath(dir, "ivfappend")
        Similarity.ensureIvfIndex(emb, "vec_id", "embedding",
          nCentroids = 16, path = pristine)
        restoreMutableCopy(pristine, stage)
        Similarity.appendToIvfIndex(s, copies, "vec_id", "embedding", stage,
          wantIncrements = false)
        // integer-exact oversize rule (n > 1.5× mean): n > 3·total DIV
        // (2·lists) — 1-row orchestration read, mirrored by the oracle
        val st = s.read.parquet(s"$stage/postings")
          .agg(count(lit(1)).as("t"),
            countDistinct(col("cent_id")).as("l")).head()
        val maxList = 3L * st.getLong(0) / (2L * st.getLong(1))
        Similarity.rebalanceIvfIndex(s, stage, maxList)
        ()
      }
      val q = emb.filter(col("vec_id") < 10)
      val topk = Similarity.ivfTopKIndexed(s, rebal, q,
        "vec_id", "embedding", nProbe = 2, k = 5)
      val ground = Similarity.cosineTopK(q, emb.unionByName(copies),
          "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"))
      val recall = topk
        .join(ground.withColumn("__hit", lit(1L)),
          Seq("query_id", "neighbor_id"), "left")
        .agg(sum(coalesce(col("__hit"), lit(0L))).as("hits"),
          countDistinct(col("query_id")).as("n_queries"))
        .select(col("hits"), col("n_queries"),
          round(col("hits").cast("double") /
            (col("n_queries") * 5).cast("double"), 6).as("recall_at_5"))
      s.read.parquet(s"$rebal/postings")
        .groupBy(col("cent_id").cast("long").as("cent_id"))
        .agg(count(lit(1)).as("n_vectors"))
        .crossJoin(broadcast(recall))
        .orderBy("cent_id")
    }),

    // K3+ — STREAMING ANN: query embeddings land as files and every
    // micro-batch probes the stored IVF index. Per-query top-k depends
    // only on the index and that query row, so the union of per-batch
    // results equals the batch probe — shared recompute oracle at
    // vec_id < 40.
    "q_stream_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ensureIvfIndex(emb, "vec_id", "embedding",
        nCentroids = 16, path = ivfIndexPath(dir))
      graft.streaming.Streaming.streamingAnnProbe(s, ivfIndexPath(dir),
          emb.filter(col("vec_id") < 40), "vec_id", "embedding",
          nProbe = 2, k = 3)
        .orderBy("query_id", "rnk")
    }),

    // Stream-static enrichment join: the streaming fact joins a
    // broadcast dim mid-stream, then aggregates by dim attribute.
    "q_stream_enrich" -> ((s, dir) =>
      graft.streaming.Streaming.streamingEnrich(s, dir)
        .orderBy("c_mktsegment")),

    // Streaming session windows (append mode). Oracled: under
    // AvailableNow the final-watermark emission cutoff is a static
    // expression (max ts − 1 day), so the oracle filters closed sessions.
    "q_stream_sessions" -> ((s, dir) =>
      graft.streaming.Streaming.streamingSessions(s, dir)
        .orderBy("user_id", "s_start")),

    // Rabin-Karp rolling-hash fingerprints (pure integer arithmetic —
    // the incremental-hash form a streaming tokenizer maintains).
    "q_rolling_fingerprint" -> ((s, dir) => {
      TextAnalysis.rollingFingerprint(t(s, dir, "documents"),
          col("doc_id"), col("text"), n = 8, take = 4)
        .orderBy("key")
    }),

    // W3+ — RANGE window frame: per-user running aggregate over the
    // trailing hour (event-time range, not row count). One window
    // exchange; the frame bound rides the sort order.
    "q_range_frame" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0L)
      t(s, dir, "events")
        .withColumn("trailing_1h_sum",
          sum(col("value").cast("decimal(30,10)")).over(w).cast("double"))
        .withColumn("trailing_1h_n", count(lit(1)).over(w))
        .select("event_id", "user_id", "ts", "trailing_1h_sum", "trailing_1h_n")
        .orderBy("user_id", "ts", "event_id")
    }),

    // K2+ — MERGE-style upsert: incoming updates matching keys, inserts
    // new ones, untouched rows survive with an action tag.
    "q_merge_upsert" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      val existing = o.filter(col("o_orderkey") % 2 === 0)
      val incoming = o.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
      Dedup.mergeUpsert(existing, incoming, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),

    // K2++ — SCD2 history apply: changed keys close their open row and
    // append a new version; history is append-only.
    "q_scd2" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      val existing = o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("valid_from", lit("2024-01-01").cast("timestamp"))
        .withColumn("valid_to", lit(null).cast("timestamp"))
        .withColumn("is_current", lit(true))
      val incoming = o.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
      Dedup.scd2Apply(existing, incoming, Seq("o_orderkey"),
          Seq("o_custkey", "o_totalprice"),
          lit("2024-06-01").cast("timestamp"))
        .orderBy("o_orderkey", "valid_from")
    }),

    // K2++ — POINT-IN-TIME read over the SCD2 history (time travel):
    // state as-of a timestamp is one predicate on the version interval;
    // read twice (before/after the 06-01 apply) to show the same key
    // resolving to different versions.
    "q_scd2_asof" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      val existing = o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("valid_from", lit("2024-01-01").cast("timestamp"))
        .withColumn("valid_to", lit(null).cast("timestamp"))
        .withColumn("is_current", lit(true))
      val incoming = o.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 1.1)
      val hist = Dedup.scd2Apply(existing, incoming, Seq("o_orderkey"),
        Seq("o_custkey", "o_totalprice"), lit("2024-06-01").cast("timestamp"))
      def asOf(ts: String) = {
        val t0 = lit(ts).cast("timestamp")
        hist.filter(col("valid_from") <= t0 &&
            (col("valid_to").isNull || col("valid_to") > t0))
          .select(t0.as("as_of"), col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"))
      }
      asOf("2024-03-01 00:00:00").unionByName(asOf("2024-09-01 00:00:00"))
        .orderBy("as_of", "o_orderkey")
    }),

    // §2.10+ — stream-stream interval join (same oracle as the batch
    // form: inner matches all emit within the AvailableNow batch).
    "q_stream_interval_join" -> ((s, dir) =>
      graft.streaming.Streaming.streamingIntervalJoin(s, dir)
        .orderBy("event_id", "q_event_id")),

    // Stream-stream LEFT OUTER interval join — null-extension driven by
    // watermark-proved absence (state eviction), not data arrival.
    "q_stream_interval_outer" -> ((s, dir) =>
      graft.streaming.Streaming.streamingIntervalJoinOuter(s, dir)
        .orderBy("event_id", "q_event_id")),

    // MLlib KMeans over embeddings (trained IVF quantizer): cluster
    // labels depend on float reduction order, so the gate asserts the
    // label-independent INVARIANTS — id ∈ [0, k), assignment is the
    // nearest model center (distances recomputed in-plan), exactly k
    // non-empty clusters — as booleans the oracle replays as literal
    // TRUE (round-12 verdict #3; was rows-only).
    "q_ml_kmeans" -> ((s, dir) =>
      graft.ml.Predict.clusterVerdicts(t(s, dir, "embeddings"),
          "vec_id", "embedding", k = 8)
        .orderBy("vec_id")),

    // F1+ — regexp extract (group capture + extract_all; the reference
    // only ever replaces — SURVEY.md §2.3 notes extract comes free).
    "q_regexp_extract" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          regexp_extract(col("text"), "\\b(\\w+)\\b", 1).as("first_word"),
          array_join(regexp_extract_all(col("text"), lit("\\b(sc\\w+)\\b"), lit(1)), ",")
            .as("sc_words"),
          regexp_count(col("text"), lit("\\bscan\\b")).as("n_scan"))
        .orderBy("doc_id")
    }),

    // Deterministic systematic sampling: keep rows whose md5(key) falls
    // under the rate threshold — replayable on any engine, unlike
    // engine-native RNG sampling; the standard way to cut a reproducible
    // slice of a training corpus.
    "q_sample_hash" -> ((s, dir) => {
      t(s, dir, "documents")
        .filter(substring(md5(col("doc_id").cast("string")), 1, 2) < "1a")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    // Stratified deterministic downsample — per-class keep rates for
    // training-data balancing (hash threshold, not rng, so the oracle
    // replays the exact draw).
    "q_sample_stratified" -> ((s, dir) => {
      graft.operators.Corpus.stratifiedSample(
          t(s, dir, "events"), col("event_id"), col("event_type"),
          Map("view" -> "10", "click" -> "20", "error" -> "80",
            "purchase" -> "g0", "signup" -> "g0"))
        .select("event_id", "event_type")
        .orderBy("event_id")
    }),

    // Top-k per group (row_number ≤ k): the per-key variant of O3.
    "q_topk_per_group" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      t(s, dir, "events")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select("event_type", "event_id", "value", "rnk")
        .orderBy("event_type", "rnk")
    }),

    // TF-IDF top terms per document (two aggregates + broadcast df join).
    "q_tfidf" -> ((s, dir) => {
      TextAnalysis.tfidfTopTerms(t(s, dir, "documents"),
          col("doc_id"), col("text"), k = 3)
        .orderBy("key", "rnk")
    }),

    // LLM+ similarity — sparse TF-IDF cosine via posting-list self-join
    // (term-at-a-time): the exact-lexical sibling of the LSH band join;
    // maxDf caps the per-term posting list so volume is Σ df², never n².
    "q_tfidf_pairs" -> ((s, dir) => {
      TextAnalysis.tfidfCosinePairs(t(s, dir, "documents"),
        col("doc_id"), col("text"), maxDf = 100, k = 50)
    }),

    // LLM+ curation — the published Gopher rule gate (Rae et al. 2021),
    // per-rule booleans + verdict; pure scan-stage column work.
    "q_gopher_rules" -> ((s, dir) => {
      TextAnalysis.gopherRules(t(s, dir, "documents"),
          col("doc_id"), col("text"), minWords = 20, maxWords = 100000)
        .orderBy("key")
    }),

    // K3+ curation — streaming quality gate: Gopher features + verdict
    // evaluated in each micro-batch's scan stage, survivors appended.
    // Stateless ⇒ identical to the batch gate; shared oracle + filter.
    "q_stream_quality" -> ((s, dir) => {
      // requireStopwords=false: the synthetic corpus has no English
      // function words, so the stopword rule alone rejects every doc
      // and the gate fixture would be vacuous
      graft.streaming.Streaming.streamingQualityGate(s, dir,
          minWords = 20, maxWords = 100000, requireStopwords = false)
        .orderBy("key")
    }),

    // J5+ — directional as-of join, FORWARD: each purchase matched to
    // the first view at-or-after it (same union + single-sort plan as
    // q_asof_join, opposite frame).
    "q_asof_forward" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val probe = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val quote = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      Analytics.asOfJoinDirectional(probe, quote, "user_id", "ts",
          "event_id", "value", direction = "forward")
        .orderBy("user_id", "ts", "event_id")
    }),

    // J5+ — directional as-of join, NEAREST with tolerance: smaller
    // |Δts| wins (ties backward), no view within 2 h → null-extended.
    "q_asof_nearest" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val probe = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val quote = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      Analytics.asOfJoinDirectional(probe, quote, "user_id", "ts",
          "event_id", "value", direction = "nearest",
          toleranceSeconds = Some(7200L))
        .orderBy("user_id", "ts", "event_id")
    }),

    // D+ entity resolution — prefix-blocked candidates scored by the
    // NATIVE graft_jaro_winkler expression (2nd custom Catalyst expr):
    // parts vs char-dropped corruptions of their names.
    "q_entity_match" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val left = p.select(col("p_partkey"), col("p_name"))
      val right = p.select((col("p_partkey") + 1000000L).as("p_partkey"),
        concat(substring(col("p_name"), 1, 5),
          col("p_name").substr(lit(7), length(col("p_name")))).as("p_name"))
      // block = (5-char prefix, 3-char suffix): the corruption drops
      // char 6, so BOTH attributes survive it; compounding them keeps
      // Σ|block|² small on this clustered color-word vocabulary
      NearDup.entityMatch(left, right,
          col("p_partkey"), col("p_name"), col("p_partkey"), col("p_name"),
          n => concat(substring(n, 1, 5), n.substr(length(n) - 2, lit(3))),
          threshold = 0.9)
        .orderBy("key_a", "key_b")
    }),

    // K2+ — CDC change-log apply: snapshot + out-of-order I/U/D log →
    // current state; the log collapses to its per-key frontier (window
    // top-1) BEFORE the one full-outer join against the snapshot.
    "q_cdc_apply" -> ((s, dir) => {
      val o = cdcSnapshot(s, dir)
      Dedup.applyChangeLog(o, cdcChangeLog(o), "o_orderkey", "ts", "seq", "op",
          Seq("o_custkey", "o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // Incremental aggregate maintenance (IVM): update the per-group
    // (count, sum) rollup from the CDC log touching ONLY changed keys —
    // base + new-state-of-affected − old-state-of-affected, exact
    // decimal sums so maintenance cycles can never drift from a
    // recompute. The oracle IS the full recompute, so the hash compare
    // checks incremental == recompute end-to-end.
    "q_incr_rollup" -> ((s, dir) => {
      val o = cdcSnapshot(s, dir)
      Dedup.incrementalRollup(o, cdcChangeLog(o), "o_orderkey", "ts",
          "seq", "op", Seq("o_custkey", "o_totalprice"),
          group = col("o_custkey") % 50, value = col("o_totalprice"))
        .orderBy("grp")
    }),

    // Distribution drift audit between a snapshot and its CDC-applied
    // successor: per-column n / distinct / null-frac / mean on both
    // sides + absolute mean shift — the load-health view row diffs
    // can't summarize.
    "q_drift_profile" -> ((s, dir) => {
      val o = cdcSnapshot(s, dir)
      val applied = Dedup.applyChangeLog(o, cdcChangeLog(o), "o_orderkey",
        "ts", "seq", "op", Seq("o_custkey", "o_totalprice"))
      Analytics.driftProfile(o, applied, Seq("o_custkey", "o_totalprice"))
        .orderBy("col_name")
    }),

    // K3++ — STREAMING incremental view maintenance: the same rollup as
    // q_incr_rollup, maintained batch-by-batch as the commit-ordered
    // CDC log lands (batch 0 = jan/feb changes, batch 1 = march).
    // Stored sums stay exact DECIMAL between batches, so the final
    // rollup equals the one-shot apply — the SAME full-recompute
    // oracle checks the whole loop.
    "q_stream_incr_rollup" -> ((s, dir) => {
      val o = cdcSnapshot(s, dir)
      graft.streaming.Streaming.streamingIncrementalRollup(s, o,
          cdcChangeLog(o),
          batchOf = when(
            col("ts") < lit("2024-02-15").cast("timestamp"), 0).otherwise(1),
          "o_orderkey", "ts", "seq", "op",
          Seq("o_custkey", "o_totalprice"),
          group = col("o_custkey") % 50, value = col("o_totalprice"))
        .orderBy("grp")
    }),

    // K3++ — TIME-TRAVEL over the maintained rollup's version tree
    // (round-11): the stream commits version b+1 per batch over the
    // seeded base v0, so "the rollup as of batch 0" is a plain
    // currentAsOf read — the reproduce-the-training-mix-as-of-batch-k
    // primitive. The oracle recomputes EACH as-of point from the
    // restricted change log (batch 0 = ts < 2024-02-15), so hash-green
    // proves point-in-time correctness, not just the final state.
    "q_ivm_time_travel" -> ((s, dir) => {
      // quarter snapshot: the point-in-time theorem is scale-free and
      // the full maintainer already prices at q_stream_incr_rollup.
      // The maintained version tree is an _OK-gated ARTIFACT built once
      // per corpus identity (round-11 verdict #8 — like every stored
      // index here: in production the tree EXISTS, written by the live
      // maintainer; re-folding it per timed run priced the maintainer
      // twice). The query pays for what time travel costs: the as-of
      // assembly reads. Compaction deferred in the artifact build, so
      // batch b = version b+1 exactly.
      val art = indexPathFor(dir, "orders", "ivm", "ttravel", "q4")
      graft.operators.IndexStore.ensure(art) { stage =>
        val o = cdcSnapshot(s, dir).filter(col("o_orderkey") % 4 === 0)
        graft.streaming.Streaming.materializeIvmTimeTravel(s, o,
          cdcChangeLog(o),
          batchOf = when(
            col("ts") < lit("2024-02-15").cast("timestamp"), 0).otherwise(1),
          "o_orderkey", "ts", "seq", "op",
          Seq("o_custkey", "o_totalprice"),
          group = col("o_custkey") % 50, value = col("o_totalprice"),
          targetDir = stage)
      }
      val base = s.read.parquet(s"$art/base")
      Seq(("batch0", 1L), ("latest", Long.MaxValue)).map { case (tag, v) =>
        Dedup.finishRollup(graft.streaming.BucketedTable.currentAsOf(
            s, s"$art/rollup", base, "grp", v))
          .withColumn("as_of", lit(tag))
      }.reduce(_.unionByName(_))
        .orderBy("as_of", "grp")
    }),

    // K3++ — OUT-OF-ORDER streaming IVM (round-9): the same CDC log
    // delivered with the LATER changes first (batch 0 = ts ≥ 2024-03-01,
    // batch 1 = the earlier u1/inserts) — so keys touched by both see an
    // earlier seq arrive after a later one was already applied. The
    // per-key sequence frontier makes the fold order-independent; the
    // 90-day lateness bound admits the whole fixture, so the result is
    // the full recompute and the oracle is shared with q_incr_rollup.
    "q_stream_incr_ooo" -> ((s, dir) => {
      val o = cdcSnapshot(s, dir)
      graft.streaming.Streaming.streamingIncrementalRollupOutOfOrder(s, o,
          cdcChangeLog(o),
          batchOf = when(
            col("ts") >= lit("2024-03-01").cast("timestamp"), 0).otherwise(1),
          "o_orderkey", "ts", "seq", "op",
          Seq("o_custkey", "o_totalprice"),
          group = col("o_custkey") % 50, value = col("o_totalprice"),
          maxLatenessSec = 90L * 24 * 3600)
        .orderBy("grp")
    }),

    // K3+ — STREAMING CDC materializer: the same change log consumed as
    // a file stream (one file per micro-batch), per-key frontier merged
    // batch-over-batch in foreachBatch, final state applied to the
    // snapshot. Same oracle as q_cdc_apply — frontier merge is
    // associative, so batch order cannot change the result.
    "q_stream_cdc" -> ((s, dir) => {
      val o = cdcSnapshot(s, dir)
      graft.streaming.Streaming.streamingCdc(s, o, cdcChangeLog(o),
          "o_orderkey", "ts", "seq", "op", Seq("o_custkey", "o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // K3+ — streaming near-dup probe: q_dedup_incremental's incoming
    // set landed as files and probed micro-batch-by-micro-batch against
    // the materialized band/set index (the crawl-ingest pipeline).
    // Per-doc verdicts depend only on the existing index, so the union
    // of per-batch survivors equals the batch probe — shared oracle.
    "q_stream_neardup" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      val idx = ensureNearDupIndex(d, nearDupIndexPath(dir, "docs"),
        n = 5, k = 8)
      val ws = filter(split(col("text"), "\\s+"), w => w =!= "")
      val incoming = d.select((col("doc_id") + 1000000).as("doc_id"),
        when(col("doc_id") % 2 === 0,
          col("text").substr(lit(1), length(col("text")) - 10))
          .otherwise(array_join(reverse(ws), " ")).as("text"))
      graft.streaming.Streaming.streamingNearDup(s, idx, incoming,
          n = 5, k = 8, threshold = 0.5)
        .orderBy("key")
    }),

    // K3+ — CUMULATIVE streaming near-dup: every batch's survivors are
    // appended to the index before the next batch probes, so the stream
    // dedups against itself across batches (the real crawl loop).
    // Fully ORACLED since round 8: the committed batch order (one file
    // per batch value, ascending) makes the fold deterministic, so the
    // oracle unrolls it as a 2-step chained probe CTE (batch 1 probes
    // evens ∪ batch-0 survivors) — the BPE-oracle unrolling idea.
    // Equality with the sequential fold of the incremental operator is
    // additionally spec-asserted (StreamingSinksSpec). The index copy
    // is rebuilt per run — the operator mutates it, so it must not
    // share the cached one.
    "q_stream_neardup_cum" -> ((s, dir) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      val existing = d.filter(col("doc_id") % 2 === 0)
      // pid-scoped scratch, WIPED each run (the operator mutates the
      // index, so reuse across runs would double-probe stale appends);
      // unlike createTempDirectory this cannot accumulate orphan dirs
      // across a 3-runs-per-query bench
      val scratch = scratchDir("neardup_cum_idx")
      // RESTORE the mutable run copy from a pristine immutable snapshot
      // (built once per corpus identity) instead of re-shingling the
      // evens every run — exactly how production restores a mutable
      // staging index from the corpus artifact
      val pristine = ensureNearDupIndex(existing,
        nearDupIndexPath(dir, "cumbase"), n = 5, k = 8)
      restoreMutableCopy(pristine, scratch)
      // batch 0: odd originals (novel); batch 1: their truncated copies
      val b0 = d.filter(col("doc_id") % 2 === 1)
      val incoming = b0.unionByName(
        b0.select((col("doc_id") + 1000000).as("doc_id"),
          col("text").substr(lit(1), length(col("text")) - 10).as("text")))
      graft.streaming.Streaming.streamingNearDupCumulative(s, scratch,
          incoming, when(col("doc_id") < 1000000, 0).otherwise(1),
          n = 5, k = 8, threshold = 0.5)
        .orderBy("key")
    }),

    // S+/K+ — ORC round-trip: the lake's second columnar format. Write
    // a projection as ORC into scratch, read it back, aggregate — the
    // ORC scan gets the same column pruning/pushdown as parquet.
    "q_orc_roundtrip" -> ((s, dir) => {
      val tmp = scratchDir("orc_demo")
      t(s, dir, "events").select("event_id", "user_id", "event_type", "value")
        .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(30,10)"))
            .cast("double"), 4).as("vsum"))
        .orderBy("event_type")
    }),

    // K3+ — streaming JSON file source (schema-declared; event time as
    // epoch-µs in the payload) rolled into per-day/type candles.
    "q_stream_json" -> ((s, dir) => {
      graft.streaming.Streaming.streamingJsonIngest(s, dir)
        .orderBy("event_type", "day")
    }),

    // A6+ sketch MERGEABILITY as a BOUNDED GATE (round-12 verdict #3) —
    // the distributed-sketch story in one query: per-type Datasketches
    // HLL sketches of user_id, then ONE union-merge to the global
    // estimate. DuckDB has no compatible HLL, so the query emits the
    // exact distinct counts (audit side) plus booleans asserting every
    // estimate — including the MERGED one — lands within 3× the lgK=12
    // relative standard deviation (1.04/√4096 ≈ 1.63% → bound 5%). The
    // oracle replays the exact side and literal TRUE; the MLSpec
    // merged == direct-global assertion stands.
    "q_hll_merge" -> ((s, dir) => {
      val e = t(s, dir, "events")
      def ok(approx: Column, exact: Column): Column =
        abs(approx - exact).cast("double") <=
          lit(0.05) * exact.cast("double")
      val perType = e.groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
          countDistinct(col("user_id")).as("exact_users"))
      val global = e.agg(countDistinct(col("user_id")).as("exact_users"))
      val merged = perType.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("approx_users"))
        .crossJoin(broadcast(global))
        .select(lit("__ALL__").as("event_type"), col("exact_users"),
          ok(col("approx_users"), col("exact_users")).as("approx_ok"))
      perType
        .select(col("event_type"), col("exact_users"),
          ok(hll_sketch_estimate(col("sk")), col("exact_users"))
            .as("approx_ok"))
        .unionByName(merged)
        .orderBy("event_type")
    }),

    // A+ multi-objective — 2-D skyline (Pareto frontier): the parts no
    // other part beats on BOTH price and size; two-phase local→global
    // windowed scan, exact under any partitioning.
    "q_skyline" -> ((s, dir) => {
      Analytics.skyline2D(t(s, dir, "part"),
          col("p_retailprice"), col("p_size").cast("long"))
        .orderBy("x", "y")
    }),

    // Fixed-width histogram of event values (deterministic bucketing).
    "q_histogram" -> ((s, dir) => {
      Analytics.histogram(t(s, dir, "events"), col("value"),
          lo = 0.0, width = 25.0, nBuckets = 24)
        .orderBy("bucket")
    }),

    // Moment statistics with exact decimal accumulators: mean/var/corr
    // per event type between value and the JSON `k` property.
    "q_moment_stats" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("double"))
      Analytics.momentStats(e, Seq(col("event_type")), col("value"), col("k"))
        .orderBy("event_type")
    }),

    // JSON column handling: schema-on-read via from_json + path
    // extraction via get_json_object (the reference's API payloads are
    // parsed upstream — SURVEY.md §2.3 notes the engine gets from_json
    // for free at the source; `props` exercises it).
    "q_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k_struct",
          from_json(col("props"), lit("k INT")).getField("k"))
        .withColumn("k_path", get_json_object(col("props"), "$.k").cast("int"))
        .select(col("event_id"), col("k_struct"), col("k_path"),
          (col("k_struct") % 10).as("k_bucket"))
        .orderBy("event_id")
    }),

    // Typed warehouse boundary (models/stock_bar.py:17-58): synthesize
    // raw double-priced bar rows from events, dedup to the
    // uq_symbol_timestamp constraint, conform to the declared
    // DecimalType(12,4) sink schema, round-trip through the typed
    // Dataset[StockBar] encoder, and emit double-cast prices for the
    // cross-engine compare. The conform/typed steps are pure projections
    // — the only exchange is the constraint dedup.
    "q_typed_warehouse" -> ((s, dir) => {
      val e = t(s, dir, "events")
      // exact integer cents → double dollars: parity-safe on both
      // engines (the double sits ~1e-13 from a 2-decimal value, so the
      // later DECIMAL(12,4) cast rounds identically)
      def dollars(cents: Column) = cents.cast("double") / lit(100.0)
      val cents = (col("event_id") * 7 + col("user_id")) % 9000000
      val raw = e.select(
        concat(lit("T"), (col("user_id") % 50).cast("string")).as("ticker"),
        col("ts").as("timestamp"),
        col("event_id"),
        dollars(cents).as("open_price"),
        dollars(cents + 50).as("high_price"),
        dollars(cents - 50).as("low_price"),
        dollars(cents + 7).as("close_price"),
        dollars(cents + 13).as("vwap"),
        (col("event_id") % 10000).cast("int").as("volume"),
        (col("event_id") % 997).cast("int").as("trade_count"))
      val withIds = raw
        .withColumn("company_id", graft.functions.Text.deterministicId(col("ticker")))
        .withColumn("id",
          graft.functions.Text.deterministicId(col("ticker"), col("timestamp").cast("string")))
      // uq_symbol_timestamp (stock_bar.py:20-22): keep-first by event id
      val deduped = operators.Dedup.keepFirst(
        withIds, Seq("company_id", "timestamp"), Seq(col("event_id")))
      val typed = graft.schemas.Warehouse.asStockBars(deduped)
      typed.toDF()
        .select(col("company_id"), col("timestamp"),
          col("open_price").cast("double").as("open_price"),
          col("high_price").cast("double").as("high_price"),
          col("low_price").cast("double").as("low_price"),
          col("close_price").cast("double").as("close_price"),
          col("vwap").cast("double").as("vwap"),
          col("volume"), col("trade_count"))
        .orderBy("company_id", "timestamp")
    }),

    // Benchmark decontamination: training docs sharing any word 3-gram
    // with the eval split (doc_id % 97 == 0). Eval shingles broadcast;
    // only matched (key, 1) rows reach the hit-count aggregate.
    "q_decontaminate" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      Curation.decontaminate(
          d.filter(col("doc_id") % 97 =!= 0),
          d.filter(col("doc_id") % 97 === 0),
          col("doc_id"), col("text"), n = 3)
        .orderBy("key")
    }),

    // Per-benchmark contamination audit (the GPT-3 "percent clean"
    // table): fraction of each eval doc's 5-grams present in the train
    // corpus, rolled up per benchmark. "seen" = verbatim train slices
    // (overlap 1.0); "unseen" = word-reversed copies (near 0) — the
    // contrast the audit exists to expose.
    "q_contamination" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val ws = filter(split(col("text"), "\\s+"), w => w =!= "")
      val seen = d.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("text"), lit("seen").as("bench"))
      val unseen = d.filter(col("doc_id") % 10 === 5)
        .select((col("doc_id") + 1000000).as("doc_id"),
          array_join(reverse(ws), " ").as("text"), lit("unseen").as("bench"))
      val ev = seen.unionByName(unseen)
      Curation.contaminationReport(d.select("doc_id", "text"), ev,
          col("doc_id"), col("text"), n = 5)
        .join(ev.select(col("doc_id").as("key"), col("bench")), Seq("key"))
        .groupBy("bench")
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("overlap_frac").cast("decimal(38,12)")).cast("double") /
            count(lit(1)).cast("double"), 6).as("mean_overlap"),
          sum(when(col("overlap_frac") >= 0.5, 1L).otherwise(0L)).as("n_dirty"))
        .orderBy("bench")
    }),

    // Deterministic mixture sampling: per-source hash-threshold rates
    // (1/8, 1/4, 1/2, keep-all across the 20 sources); output is the
    // realized mixture per source.
    "q_mix_sample" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val srcNum = regexp_extract(col("source"), "(\\d+)", 1).cast("int")
      val thr = when(srcNum < 5, "20").when(srcNum < 10, "40")
        .when(srcNum < 15, "80").otherwise("zz")
      Curation.mixtureSample(d, col("doc_id"), col("source"), thr)
        .orderBy("grp")
    }),

    // Temperature-scaled source mixing (α = ½, √n flattening — the
    // T5/multilingual mixing formula): per-source keep rates computed
    // from the corpus's own source counts against a fixed doc budget,
    // membership by the portable hash uniform. Head sources sample
    // far below tail sources — the rate column shows the flattening.
    "q_temperature_mix" -> ((s, dir) => {
      Curation.temperatureSample(t(s, dir, "documents"),
          col("doc_id"), col("source"), budget = 200L)
        .orderBy("grp")
    }),

    // Lexicon sentiment over the corpus vocabulary — the reference's
    // news-tone signal, Spark-native (broadcast lexicon join).
    "q_sentiment" -> ((s, dir) => {
      Curation.sentimentScore(t(s, dir, "documents"), col("doc_id"), col("text"),
          Seq("fast" -> 2, "slow" -> -2, "big" -> 1, "small" -> -1,
            "merge" -> 1, "dup" -> -3))
        .orderBy("key")
    }),

    // Label assembly: per-(user, day) mean value + next-day up/down label
    // — the "news today, price move tomorrow" training-set builder.
    "q_training_labels" -> ((s, dir) => {
      Curation.trainingLabels(t(s, dir, "events"), col("user_id"), col("ts"),
          col("value"))
        .orderBy("entity", "day")
    }),

    // Distribution-based cleaning: per-type z-score outliers (|z| > 2.5)
    // from exact-decimal moments, stats broadcast back over the data.
    "q_outliers" -> ((s, dir) => {
      Curation.zscoreOutliers(t(s, dir, "events"), col("event_id"),
          col("event_type"), col("value"), zThreshold = 2.5)
        .orderBy("id")
    }),

    // Winsorization to the per-type exact [p05, p95] band.
    "q_winsorize" -> ((s, dir) => {
      Curation.winsorize(t(s, dir, "events"), col("event_id"),
          col("event_type"), col("value"), pLo = 0.05, pHi = 0.95)
        .orderBy("id")
    }),

    // Equi-depth feature binning: deciles per event type (ntile over a
    // total order), per-bin count/min/max — the bin-boundary table.
    "q_feature_bins" -> ((s, dir) => {
      Curation.featureBins(t(s, dir, "events"), col("event_type"),
          col("value"), col("event_id"), nBins = 10)
        .withColumn("bin", col("bin").cast("int"))
        .orderBy("grp", "bin")
    }),

    // Declarative row validation: the reference's Pydantic field checks
    // as ONE aggregate pass — (rule, n_violations, n_rows) per rule.
    "q_validate" -> ((s, dir) => {
      graft.schemas.Warehouse.validationReport(t(s, dir, "events"), Seq(
          "value_nonneg" -> (col("value") >= 0),
          "ts_not_null" -> col("ts").isNotNull,
          "type_known" -> col("event_type")
            .isin("click", "view", "purchase", "signup", "error"),
          "user_positive" -> (col("user_id") > 0),
          "props_has_k" -> get_json_object(col("props"), "$.k").isNotNull))
        .orderBy("rule")
    }),

    // Concat-then-chunk sequence packing: per-lang token offsets and
    // 512-token block assignment — pre-training batch assembly as one
    // hash-partitioned window.
    "q_seq_pack" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .withColumn("n_tokens", size(split(col("text"), "\\s+")).cast("long"))
      Curation.packSequences(d, col("doc_id"), col("lang"), col("n_tokens"),
          capacity = 512)
        .orderBy("key")
    }),

    // Per-domain corpus rollup: URL parsing (parse_url host/path — the
    // C4/RefinedWeb domain-accounting pass, the unit blocklists and
    // per-domain caps operate on) + one partial/final aggregate. URLs
    // are synthesized deterministically from doc fields (the corpus
    // carries none), like q_typed_warehouse's tickers.
    "q_domain_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.select(col("doc_id"), col("lang"), col("n_chars"),
          concat(lit("https://"), col("source"), lit(".example.com/"),
            col("lang"), lit("/"), col("doc_id").cast("string")).as("url"))
        .withColumn("host", parse_url(col("url"), lit("HOST")))
        .withColumn("path", parse_url(col("url"), lit("PATH")))
        .groupBy("host")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("lang")).as("n_langs"),
          min(col("path")).as("first_path"))
        .orderBy("host")
    }),
  )

  def oracleSql: Map[String, String] = OracleSql.sql

  /** Per-streaming-query micro-batch FLOOR spec (round-12 verdict #5):
    * (micro-batches the query's stream runs, whether its sink pays a
    * BucketedTable commit per batch). [[graft.Bench]] measures
    * [[graft.streaming.Streaming.streamFloor]] once per distinct spec
    * — an empty-batch stream through the same trigger/checkpoint/sink
    * machinery — and emits a `floors` channel next to the medians, so
    * captures can separate plan-attributable time from the fixed
    * scheduling/commit floors that inflate differently per host epoch.
    * Batch counts are pinned by each query's source layout (single
    * events/documents file → 1; repartition(4)+mFPT=1 → 4; explicit
    * 2-value batchOf → 2).
    */
  val streamFloorSpec: Map[String, (Int, Boolean)] = Map(
    "q_stream_candles" -> ((1, false)),
    "q_stream_sliding" -> ((1, false)),
    "q_stream_dedup" -> ((1, false)),
    "q_stream_ffill" -> ((1, false)),
    "q_stream_ffill_tws" -> ((1, false)),
    "q_stream_enrich" -> ((1, false)),
    "q_stream_sessions" -> ((1, false)),
    "q_stream_interval_join" -> ((1, false)),
    "q_stream_interval_outer" -> ((1, false)),
    "q_stream_json" -> ((1, false)),
    "q_stream_quality" -> ((1, false)),
    "q_stream_cdc" -> ((4, false)),
    "q_stream_ann" -> ((4, false)),
    "q_stream_neardup" -> ((4, false)),
    "q_stream_neardup_cum" -> ((2, false)),
    "q_stream_incr_rollup" -> ((2, true)),
    "q_stream_incr_ooo" -> ((2, true)))
}
