package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection for document corpora — the operators a
  * large-scale training-data pipeline needs (builder prompt; extends
  * SURVEY.md §2.4 beyond the reference's exact dedup).
  *
  * All hashing is md5-hex over explicit seed-prefixed strings so the
  * DuckDB oracle computes bit-identical signatures. Everything is
  * built-in expressions (codegen'd) — no UDFs.
  *
  * Scale design (100 TB):
  *  - shingling is a narrow per-row explode (no shuffle);
  *  - minhash signatures are ONE hash-partition aggregate on doc key;
  *  - LSH banding turns all-pairs O(n²) into a self-join on
  *    (band, band-value) buckets — only docs sharing a band collide, so
  *    the shuffle carries (key, 2·k hex strings) per doc, never the text;
  *  - exact Jaccard verification runs only on surviving candidate pairs.
  */
object NearDup {

  /** Distinct character n-gram shingles per key: (key, shingle) rows.
    * Documents shorter than n contribute their whole text as one shingle
    * (`greatest(…,1)` — DuckDB's generate_series would yield none, Spark's
    * sequence would run descending; both sides use the same floor).
    */
  def shingles(df: DataFrame, key: Column, text: Column, n: Int): DataFrame =
    df.select(key.as("key"), text.as("t"))
      .withColumn("i",
        explode(sequence(lit(1), greatest(length(col("t")) - (n - 1), lit(1)))))
      .select(col("key"), col("t").substr(col("i"), lit(n)).as("shingle"))
      .distinct()

  /** Distinct word n-gram shingles per key. Preferred over char shingles
    * for minhash: ~n× fewer shingles per doc (cheaper signatures and
    * verification joins) and far more distinctive values, so LSH buckets
    * stay small even on vocabulary-limited corpora.
    */
  def wordShingles(df: DataFrame, key: Column, text: Column, n: Int): DataFrame =
    wordShinglesRaw(df, key, text, n).distinct()

  /** Word n-gram shingles per key WITHOUT the per-doc distinct — for
    * callers that filter the shingle stream before any aggregation (e.g.
    * a broadcast-set probe) and would otherwise pay a full shuffle just
    * to dedup rows that are about to be discarded map-side.
    */
  def wordShinglesRaw(df: DataFrame, key: Column, text: Column, n: Int): DataFrame =
    df.select(key.as("key"), split(text, "\\s+").as("w"))
      .withColumn("i",
        explode(sequence(lit(1), greatest(size(col("w")) - (n - 1), lit(1)))))
      .select(col("key"),
        array_join(slice(col("w"), col("i"), lit(n)), " ").as("shingle"))

  /** Distinct char-n-gram shingle DIGESTS per key: shingles are hashed to
    * a fixed-width md5 hex BEFORE the distinct, so the dedup shuffle
    * carries 32-byte keys instead of arbitrary-width text. Set semantics
    * are preserved (md5 is injective modulo 2⁻¹²⁸ collisions), so counts
    * and joins over digests equal counts and joins over raw shingles.
    */
  def shingleDigests(df: DataFrame, key: Column, text: Column, n: Int): DataFrame =
    df.select(key.as("key"), text.as("t"))
      .withColumn("i",
        explode(sequence(lit(1), greatest(length(col("t")) - (n - 1), lit(1)))))
      .select(col("key"), md5(col("t").substr(col("i"), lit(n))).as("shingle"))
      .distinct()

  /** Distinct word n-gram shingle digests per key (see [[shingleDigests]]). */
  def wordShingleDigests(df: DataFrame, key: Column, text: Column, n: Int): DataFrame =
    df.select(key.as("key"), split(text, "\\s+").as("w"))
      .withColumn("i",
        explode(sequence(lit(1), greatest(size(col("w")) - (n - 1), lit(1)))))
      .select(col("key"),
        md5(array_join(slice(col("w"), col("i"), lit(n)), " ")).as("shingle"))
      .distinct()

  /** MinHash signature over shingle DIGESTS: ONE md5 per shingle (already
    * paid in [[shingleDigests]]); the k per-seed hash values are rotated
    * 16-hex-char windows of that digest — h_i(s) = substr(d‖d, 1+4i, 16)
    * where d = md5(s). Each window's leading 4 nibbles are disjoint
    * md5-output bits, so the k shingle orderings are decided by
    * independent bits (ties beyond 4 nibbles at prob ≈ |set|/16⁴).
    * Signature element i is the min over the doc's shingles (hex-string
    * order == unsigned numeric order). This replaces k md5 calls per
    * shingle per seed with k substrings — ~8× less digest work, and the
    * pre-agg rows are fixed-width.
    *
    * One md5 yields 8 disjoint windows; seeds 8-15 come from a SECOND
    * digest md5('b:' ‖ shingle) — one extra md5 per shingle row only
    * when k > 8 buys a 16-permutation signature (finer banding dials:
    * 8 bands × 2 rows, or 4 × 4).
    *
    * Wide form: ONE aggregation computes all k minima as columns — no
    * seed-explode (which would multiply the shuffle k×) and no second
    * banding aggregation. The shuffle carries each digest row once.
    */
  def minhashSig(sh: DataFrame, k: Int): DataFrame = {
    require(k <= 16,
      s"k=$k: at most 16 disjoint 4-hex windows across the two digests")
    val d2 = concat(col("shingle"), col("shingle"))
    lazy val e = md5(concat(lit("b:"), col("shingle")))
    lazy val e2 = concat(e, e)
    val mins = (0 until k).map { i =>
      val src = if (i < 8) d2 else e2
      min(substring(src, 1 + 4 * (i % 8), 16)).as(s"mh$i")
    }
    sh.groupBy(col("key")).agg(mins.head, mins.tail: _*)
  }

  /** LSH banding over the wide signature, `rowsPerBand` signature
    * elements per band (default 2 — the dial every in-repo query uses):
    * band b concatenates mh(rb)…mh(rb+r−1), unpivoted to (key, band,
    * band_val) rows. More rows per band ⇒ fewer, more selective bands
    * (P(candidate) = 1 − (1 − sʳ)^(k/r)) — the candidate-volume dial
    * that pairs with [[minhashSig]]'s k=16 extension (8×2 or 4×4).
    */
  def lshBands(sig: DataFrame, k: Int, rowsPerBand: Int = 2): DataFrame = {
    require(rowsPerBand > 0 && k % rowsPerBand == 0,
      s"lshBands: rowsPerBand=$rowsPerBand must divide k=$k")
    val nBands = k / rowsPerBand
    val pairsExpr = (0 until nBands)
      .map { b =>
        val parts = (0 until rowsPerBand)
          .map(r => s"mh${rowsPerBand * b + r}").mkString(", '|', ")
        s"$b, concat($parts)"
      }
      .mkString(", ")
    sig.selectExpr("key", s"stack($nBands, $pairsExpr) as (band, band_val)")
  }

  /** Size-GUARDED join side (round-13, found by the sf1 scale capture):
    * below `limit` rows the frame broadcasts — the small-corpus fast
    * path the static planner used to take by luck; at or past it, an
    * explicit shuffled-hash build. The guard exists because Spark's
    * STATIC size estimate of an aggregate/union output reads tiny, so
    * unhinted plans broadcast corpus-scaled frames (the whole band
    * table, the full-text corpus side of verify joins) — invisible at
    * sf0.1, a 5–15× wall blowup at sf1, a driver OOM at real scale —
    * and AQE cannot demote a statically-planned broadcast (no exchange
    * under it to re-plan from). One `count()` of orchestration
    * metadata per call decides from the REAL size, the same guard
    * shape as [[Corpus.boilerplateStrip]]'s verdict set. Every
    * decision is recorded in [[Guards]] (pinned by PlanLintSpec,
    * drained into the bench storage log — round-13 verdict #5). */
  private def guarded(df: DataFrame, limit: Long, site: String): DataFrame =
    if (Guards.smallEnough(site, df.count(), limit)) broadcast(df)
    else df.hint("shuffle_hash")

  /** Candidate pairs: keys sharing at least one (band, band_val)
    * bucket. The self-join's build side is size-[[guarded]]: the band
    * table scales with the corpus, so past the limit it must build a
    * shuffled hash, never a static-guess broadcast. */
  def candidatePairs(bands: DataFrame): DataFrame = {
    val a = bands.select(col("key").as("key_a"), col("band"), col("band_val"))
    val b = bands.select(col("key").as("key_b"), col("band"), col("band_val"))
    guarded(a, 1000000L, "neardup.candidatePairs.bands")
      .join(b, Seq("band", "band_val"))
      .filter(col("key_a") < col("key_b"))
      .select("key_a", "key_b").distinct()
  }

  /** Exact Jaccard similarity over shingle sets for given candidate pairs.
    * intersection via double join on shingle; |A∪B| = |A| + |B| − |A∩B|.
    */
  def jaccard(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val counts = sh.groupBy("key").agg(count(lit(1)).as("cnt"))
    val a = sh.select(col("key").as("key_a"), col("shingle"))
    val b = sh.select(col("key").as("key_b"), col("shingle"))
    // size-guarded (round-13): a small shingle frame still broadcasts;
    // past the limit the pair side builds a shuffled hash and the
    // corpus-scaled shingle frames stream — static estimates otherwise
    // broadcast them at any scale
    val shSmall = Guards.smallEnough("neardup.jaccard.shingles",
      sh.count(), 1000000L)
    val left = if (shSmall) pairs else pairs.hint("shuffle_hash")
    val j1 = left.join(if (shSmall) broadcast(a) else a, Seq("key_a"))
    val inter = (if (shSmall) j1 else j1.hint("shuffle_hash"))
      .join(if (shSmall) broadcast(b) else b, Seq("key_b", "shingle"))
      .groupBy("key_a", "key_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(counts.select(col("key").as("key_a"), col("cnt").as("cnt_a")), Seq("key_a"))
      .join(counts.select(col("key").as("key_b"), col("cnt").as("cnt_b")), Seq("key_b"))
      .withColumn("jacc",
        col("n_inter").cast("double") /
          (col("cnt_a") + col("cnt_b") - col("n_inter")).cast("double"))
  }

  /** Exact Jaccard over per-doc shingle SETS (see [[ngramJaccardSets]]
    * for the plan rationale): `sets` is (key, sh: array) — one row per
    * doc — and each candidate pair costs two set lookups plus an
    * `array_intersect`.
    */
  def jaccardSets(pairs: DataFrame, sets: DataFrame): DataFrame =
    pairs
      .join(sets.select(col("key").as("key_a"), col("sh").as("sh_a")), Seq("key_a"))
      .join(sets.select(col("key").as("key_b"), col("sh").as("sh_b")), Seq("key_b"))
      .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jacc",
        col("n_inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("n_inter")).cast("double"))
      .select(col("key_a"), col("key_b"), col("n_inter"), col("jacc"))

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band → bucket
    * join → exact-Jaccard verify → pairs above threshold.
    *
    * The verify stage runs on per-doc digest SETS ([[jaccardSets]]):
    * the row-level double join re-shuffled the full (key, digest) frame
    * twice; collecting each doc's digests once (map-side partial
    * collect_set) and intersecting arrays per candidate pair keeps the
    * exchange at one row per doc.
    */
  def minhashPairs(
      df: DataFrame, key: Column, text: Column,
      n: Int, k: Int, threshold: Double): DataFrame =
    // no shingle-frame persist: since the sig/set fusion the digest
    // frame feeds exactly ONE aggregation, so a cache would only add a
    // corpus-sized write (the round-9/10 long-session interference
    // surface) for zero reuse
    minhashPairsFromDigests(wordShingleDigests(df, key, text, n), k, threshold)

  /** Sign → band → bucket-join → verify over an ALREADY-BUILT (and
    * ideally persisted) (key, shingle-digest) frame — the entry point
    * for pipelines that stage the digest frame themselves so only one
    * large cache is live at a time ([[Corpus.cleanCorpus]] releases its
    * text-bearing dedup cache once the digest frame is materialized,
    * the round-9 double-persist-window fix). `sh` is read by three
    * subtrees (signatures, verify sets, and — via the signature join —
    * candidate pairs), so an unpersisted input recomputes its lineage
    * three times.
    */
  def minhashPairsFromDigests(sh: DataFrame, k: Int, threshold: Double): DataFrame = {
    val bc0 = Eager.broadcastSnapshot(sh.sparkSession)
    // ONE fused aggregation ([[minhashSigWithSets]] — signatures AND
    // verify sets from a single groupBy, the shape the streaming probe
    // path validated in round 10) replaces the former sig/set split
    // that exchanged the shingle table twice. The doc-sized fused frame
    // is checkpointed so the banding self-join and the verify stage
    // read an RDD scan instead of re-running the collect_set aggregate
    // per consumer — also retiring the operator's dependence on the big
    // shingle-row cache staying resident across a long session (the
    // round-10 driver-CPU-multiplication suspect).
    val (perDoc, rel) = Eager.tracked(minhashSigWithSets(sh, k))
    val pairs = candidatePairs(lshBands(perDoc, k))
    val sets = perDoc.select(col("key"), col("sh"))
    // eager terminal materialization so the checkpointed per-doc frame
    // can be released before returning — the surviving pair set is tiny
    // (threshold-filtered); see [[Eager.terminalReleasing]]
    val out = Eager.terminalReleasing(
      jaccardSets(pairs, sets).filter(col("jacc") >= threshold)
        .select("key_a", "key_b", "jacc"), rel)
    Eager.releaseBroadcastsSince(sh.sparkSession, bc0)
    out
  }

  /** `nBits`-bit SimHash over whitespace tokens (nBits ≤ 128). Bit b of a
    * token's hash is bit-plane (3 − b/32) of md5 hex nibble (b mod 32):
    * the first 32 bits take each nibble's HIGH bit (equivalently "digit ≥
    * '8'" — byte-compatible with the historical ≤32-bit definition), the
    * next 32 the next plane down, and so on; the fingerprint bit is the
    * sign of the ±1 vote sum. Returned as an nBits-char '0'/'1' string
    * (oracle-friendly). Wider fingerprints are the candidate-volume dial
    * for [[simhashPairs]]: on a vocabulary-limited corpus the band
    * buckets cluster, and going 32 → 60 bits (band width 8 → 15) cut the
    * Σ|bucket|² candidate count ~10× at sf0.1 (measured).
    */
  def simhashBits(df: DataFrame, key: Column, text: Column, nBits: Int): DataFrame = {
    require(nBits <= 128, s"nBits=$nBits: md5 has only 128 bits")
    // parse the 128-bit digest into three longs ONCE per token
    // occurrence; each bit vote is then one shiftright+mask on a long.
    // The previous form paid a per-bit substring+conv STRING parse —
    // 60 parses per token row — which profiling showed was the whole
    // cost of the simhash family (q_simhash_band_stats, which never
    // joins pairs, priced within 1 s of q_simhash_pairs). Bit layout is
    // unchanged: bit b reads plane (3 − b/32) of hex nibble (b mod 32),
    // so fingerprints are identical to the oracle's replication.
    val tok = df.select(key.as("key"), explode(split(text, "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .withColumn("h", md5(col("token")))
      .withColumn("h1", conv(substring(col("h"), 1, 15), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(col("h"), 16, 15), 16, 10).cast("long"))
      .withColumn("h3", conv(substring(col("h"), 31, 2), 16, 10).cast("long"))
    val votes = (0 until nBits).map { b =>
      val plane = 3 - b / 32
      val nibble = b % 32
      val (src, nibShift) =
        if (nibble <= 14) (col("h1"), 4 * (14 - nibble))
        else if (nibble <= 29) (col("h2"), 4 * (29 - nibble))
        else (col("h3"), 4 * (31 - nibble))
      val isSet =
        shiftright(src, nibShift + plane).bitwiseAND(lit(1L)) === lit(1L)
      sum(when(isSet, 1).otherwise(-1)).as(s"s$b")
    }
    val bits = (0 until nBits).map(b => when(col(s"s$b") > 0, "1").otherwise("0"))
    tok.groupBy("key").agg(votes.head, votes.tail: _*)
      .select(col("key"), concat(bits: _*).as("simhash"))
  }

  /** 16-bit SimHash (see [[simhashBits]]). */
  def simhash16(df: DataFrame, key: Column, text: Column): DataFrame =
    simhashBits(df, key, text, 16)

  /** SimHash near-dup pairs via Hamming-distance banding (the pigeonhole
    * construction from Manku/Jain/Sarma's WWW'07 near-dup paper): split
    * the `nBits` fingerprint into `nBands` contiguous bands; two
    * fingerprints within Hamming distance d < nBands differ in at most d
    * bands, so they must agree EXACTLY on ≥ 1 band — a self-join on
    * (band, band_val) finds every such pair with zero false negatives.
    * Hamming distance is then computed exactly per candidate (nBits
    * codegen'd char compares) and pairs above `maxHam` are dropped.
    *
    * Scale: the banding join shuffles (key, nBits-char sig) rows — never
    * the text; bucket width is 2^(nBits/nBands), the recall/cost dial
    * (wider bands ⇒ smaller buckets ⇒ cheaper join).
    */
  def simhashPairs(sig: DataFrame, nBits: Int, nBands: Int, maxHam: Int,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    require(nBits % nBands == 0, s"nBands=$nBands must divide nBits=$nBits")
    require(maxHam < nBands, s"maxHam=$maxHam needs < nBands=$nBands for the recall guarantee")
    // the fingerprint is parsed into a signed long below; ≥ 64 bits would
    // overflow conv(...).cast("long") to NULL and silently emit ZERO pairs
    // (bit_count(NULL) fails every hamming filter) — fail loudly instead
    require(nBits <= 63, s"nBits=$nBits exceeds the 63-bit signed-long fingerprint limit")
    require(maxBucket >= 2, s"simhashPairs: maxBucket must be ≥ 2, got $maxBucket")
    val bands = simhashBandRows(sig, nBits, nBands)
    // posting-list cap (round-9, the q_tfidf_pairs/q_span_dedup
    // pattern): a (band, band_val) bucket wider than maxBucket signals
    // a fingerprint CLUSTER — its Σ|bucket|² pair volume is the whole
    // join's cost driver, while its members are better handled as a
    // cluster than as O(|bucket|²) pairs. Buckets in 2..maxBucket keep
    // exact semantics; singleton buckets yield no pairs anyway. The cap
    // is NOT silent: [[simhashBandStats]] reports kept/dropped bucket
    // and candidate counts as an oracled audit query. Measured at
    // sf0.1 (60 bits, 4 bands, cap 200): candidates 2.14M → 0.80M,
    // pairs 12798 → 9519, planted-twin recall 96%.
    val eligible =
      if (maxBucket == Int.MaxValue) bands
      else bands.join(
        bands.groupBy("band", "band_val").agg(count(lit(1)).as("c"))
          .filter(col("c") > 1 && col("c") <= maxBucket)
          .select("band", "band_val"),
        Seq("band", "band_val"))
    val a = eligible.select(col("key").as("key_a"), col("sigint").as("sig_a"),
      col("band"), col("band_val"))
    val b = eligible.select(col("key").as("key_b"), col("sigint").as("sig_b"),
      col("band"), col("band_val"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("key_a") < col("key_b"))
      // verify BEFORE the dedup exchange: only true near-dup pairs reach
      // the distinct's shuffle; the millions of far pairs die join-side.
      // hamming is a function of the pair, so distinct on (pair, hamming)
      // dedups band collisions without re-joining the signatures.
      .select(col("key_a"), col("key_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHam)
      .distinct()
  }

  /** (key, sigint, band, band_val) band rows shared by [[simhashPairs]]
    * and [[simhashBandStats]]. The fingerprint crosses the join as ONE
    * parsed integer, not the bitstring: hamming is then a single
    * bit_count(xor) per candidate instead of nBits substring compares —
    * on a vocabulary-limited corpus the band buckets are fat
    * (fingerprints cluster) and the candidate blowup is O(Σ|bucket|²),
    * so per-candidate cost and row width are what decide whether the
    * join stage is seconds or minutes. */
  private def simhashBandRows(sig: DataFrame, nBits: Int, nBands: Int): DataFrame = {
    val w = nBits / nBands
    val stackExpr = (0 until nBands)
      .map(b => s"$b, substring(simhash, ${1 + b * w}, $w)").mkString(", ")
    sig
      .withColumn("sigint", conv(col("simhash"), 2, 10).cast("long"))
      .selectExpr("key", "sigint",
        s"stack($nBands, $stackExpr) as (band, band_val)")
  }

  /** The no-silent-truncation companion of [[simhashPairs]]'s
    * `maxBucket` cap: one row of audit counters —
    * (n_buckets_ge2, n_buckets_dropped, cand_kept, cand_dropped) where
    * cand_* is Σ C(|bucket|, 2) over kept/dropped buckets — committed
    * as an oracled query so the cap's cost/recall position is a
    * recorded fact of every round, not a code comment. */
  def simhashBandStats(sig: DataFrame, nBits: Int, nBands: Int,
      maxBucket: Int): DataFrame = {
    require(nBits % nBands == 0, s"nBands=$nBands must divide nBits=$nBits")
    val sizes = simhashBandRows(sig, nBits, nBands)
      .groupBy("band", "band_val").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
    val pairsOf = (col("c") * (col("c") - 1) / 2).cast("long")
    sizes.agg(
      count(lit(1)).as("n_buckets_ge2"),
      sum(when(col("c") > maxBucket, 1L).otherwise(0L)).as("n_buckets_dropped"),
      sum(when(col("c") <= maxBucket, pairsOf).otherwise(0L)).as("cand_kept"),
      sum(when(col("c") > maxBucket, pairsOf).otherwise(0L)).as("cand_dropped"))
  }

  /** Exact n-gram Jaccard for explicitly supplied pairs (no LSH pruning) —
    * the brute-force baseline for [[minhashPairs]]'s candidate stage.
    *
    * Uses RAW char shingles, not digests: a char-n shingle with n ≤ 16 is
    * already at most half the width of md5 hex (32 chars), so digesting
    * would make every distinct/join key wider AND pay the digest CPU.
    * Digest only when shingles are wide (the word shingles in
    * [[minhashPairs]]).
    */
  def ngramJaccard(
      df: DataFrame, key: Column, text: Column,
      pairs: DataFrame, n: Int): DataFrame = {
    val bc0 = Eager.broadcastSnapshot(df.sparkSession)
    val sh = (if (n <= 16) shingles(df, key, text, n)
      else shingleDigests(df, key, text, n))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eager + release: same cache-lifetime discipline as [[minhashPairs]]
    try {
      val out = Eager.terminal(jaccard(pairs, sh))
      Eager.releaseBroadcastsSince(df.sparkSession, bc0)
      out
    } finally { sh.unpersist(); () }
  }

  /** MinHash-LSH banding quality audit — the near-dup counterpart of
    * the ANN family's recall audits (`q_ann_recall`): ground truth is
    * the EXACT inverted-shingle-index pair set (pairs sharing ≥ 1
    * shingle, scored by exact Jaccard — a pair sharing no shingle has
    * Jaccard 0 and cannot reach any positive threshold, so the
    * inverted index IS exhaustive, never all-pairs), and the audited
    * set is the raw banding candidates BEFORE verification. Recall
    * tells you whether k bands × r rows actually catch the planted
    * dups at the threshold (1 − (1 − tʳ)^(k/r) in expectation);
    * precision prices the verification stage's workload (false
    * candidates are wasted exact-Jaccard work, the LSH cost dial).
    *
    * Plan shape at 100 TB: ground truth costs Σ df(shingle)² over
    * shingle buckets — exhaustive-exact is affordable on a corpus
    * STRATUM, which is how production audits run (sample, audit,
    * extrapolate; same shape as q_ann_recall's brute-force side). The
    * candidate side is the production banding join itself. One
    * persisted digest frame feeds both sides; the output is one row.
    *
    * Audited across banding CONFIGS (the (k, rowsPerBand) dial): more
    * bands catch more true pairs (recall 1 − (1 − tʳ)^(k/r) rises with
    * k/r), wider bands are more selective (precision rises with r) —
    * the three defaults trace the frontier the production dedup picks
    * its operating point from. The shingle frame and the ground-truth
    * pair set are computed ONCE and persisted across configs.
    *
    * Returns one row per config: (k, rows_per_band, n_bands, n_true,
    * n_cand, n_hit, recall, precision), rounded 9 dp.
    */
  def minhashRecallAudit(df: DataFrame, key: Column, text: Column,
      n: Int, threshold: Double,
      configs: Seq[(Int, Int)] = Seq((8, 2), (16, 2), (16, 4))): DataFrame = {
    require(configs.nonEmpty, "minhashRecallAudit: configs must be non-empty")
    // the inverted-index ground truth is exhaustive only for positive
    // thresholds (a 0-overlap pair shares no shingle bucket) — enforce
    // the docstring's precondition instead of silently inflating recall
    require(threshold > 0 && threshold <= 1,
      s"minhashRecallAudit: threshold must be in (0, 1], got $threshold")
    val bc0 = Eager.broadcastSnapshot(df.sparkSession)
    val sh = wordShingleDigests(df, key, text, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val a = sh.select(col("shingle"), col("key").as("key_a"))
      val b = sh.select(col("shingle"), col("key").as("key_b"))
      val inter = a.join(b, Seq("shingle")).filter(col("key_a") < col("key_b"))
        .groupBy("key_a", "key_b").agg(count(lit(1)).as("n_inter"))
      val counts = sh.groupBy("key").agg(count(lit(1)).as("cnt"))
      val truth = inter
        .join(counts.select(col("key").as("key_a"), col("cnt").as("cnt_a")), Seq("key_a"))
        .join(counts.select(col("key").as("key_b"), col("cnt").as("cnt_b")), Seq("key_b"))
        .filter(col("n_inter").cast("double") /
          (col("cnt_a") + col("cnt_b") - col("n_inter")).cast("double") >= threshold)
        .select("key_a", "key_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // ONE signature aggregation at max k — a k-dial's signature is
        // a PREFIX of the wider one (same per-seed hash windows), so
        // every config's bands derive from the same wide sig frame.
        val kMax = configs.map(_._1).max
        // checkpointed: the config-stack union references the sig
        // subtree twice per config PER JOIN SIDE (6× for the default
        // dials) — without lineage truncation each reference re-runs
        // the aggregate and re-codegens its plan ([[minhashPairsFromDigests]]
        // discipline; the frame is doc-sized)
        val (sig, sigRel) = Eager.tracked(minhashSig(sh, kMax))
        // all configs' band rows in one frame → ONE bucket self-join
        // keyed on (k, r, band, band_val) instead of one join per dial
        val bands = configs.map { case (k, r) =>
          lshBands(sig, k, r)
            .select(lit(k).as("k"), lit(r).as("r"),
              col("key"), col("band"), col("band_val"))
        }.reduce(_ unionByName _)
        val ba = bands.select(col("k"), col("r"), col("band"),
          col("band_val"), col("key").as("key_a"))
        val bb = bands.select(col("k"), col("r"), col("band"),
          col("band_val"), col("key").as("key_b"))
        val cand = ba.join(bb, Seq("k", "r", "band", "band_val"))
          .filter(col("key_a") < col("key_b"))
          .select("k", "r", "key_a", "key_b").distinct()
        // truth is pair-count-sized (planted dups) → broadcast the hit
        // flag; one grouped count pass replaces 2·configs scalar aggs
        val agg = cand.join(
            broadcast(truth.withColumn("is_true", lit(1L))),
            Seq("key_a", "key_b"), "left")
          .groupBy("k", "r")
          .agg(count(lit(1)).as("n_cand"),
            sum(coalesce(col("is_true"), lit(0L))).as("n_hit"))
        // left-join from the config list so a dial with ZERO candidates
        // still reports its row (n_cand = n_hit = 0)
        val confDf = configs.map { case (k, r) =>
          df.sparkSession.range(1)
            .select(lit(k).as("k"), lit(r).as("r"))
        }.reduce(_ unionByName _)
        val out = Eager.terminalReleasing(
          confDf.join(agg, Seq("k", "r"), "left")
            .na.fill(0L, Seq("n_cand", "n_hit"))
            .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_true"))))
            .select(col("k"), col("r").as("rows_per_band"),
              (col("k").cast("int") / col("r").cast("int")).cast("int")
                .as("n_bands"),
              col("n_true"), col("n_cand"), col("n_hit"),
              round(col("n_hit").cast("double") / col("n_true").cast("double"), 9)
                .as("recall"),
              round(col("n_hit").cast("double") / col("n_cand").cast("double"), 9)
                .as("precision")), sigRel)
        Eager.releaseBroadcastsSince(df.sparkSession, bc0)
        out
      } finally { truth.unpersist(); () }
    } finally { sh.unpersist(); () }
  }

  /** Connected components over a near-dup pair graph — what production
    * dedup does with the pair list: union pairs into clusters, then keep
    * one representative per cluster. Alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14): each operation rewires a node's neighbors to the
    * minimum of its closed neighborhood, provably preserving components
    * while collapsing them toward stars in O(log² n) rounds WORST CASE —
    * versus O(diameter) sequential rounds for plain min-label
    * propagation, whose barrier count is unbounded on a long dup chain
    * (the round-4 audit's one weak spot). Each operation is ONE window
    * aggregate (per-node min, hash-partitioned on the node) + a
    * distinct; no driver-side graph, no join against a growing label
    * frame. Rounds are localCheckpoint-ed: each round's edge set
    * references the previous one's twice, so without lineage truncation
    * the plan doubles per round (the classic iterative-algorithm trap).
    *
    * Convergence is an edge-set fixpoint — (count, Σ xxhash64(src,dst))
    * unchanged across a round — at which point every component is a
    * star centered on its minimum key, matching the oracle's recursive
    * closure exactly. `maxRounds` is a runaway backstop, not a semantic
    * bound. Returns (key, cluster_id = min key of the component) for
    * every node appearing in `pairs`.
    */
  def dedupClusters(pairs: DataFrame, maxRounds: Int = 32): DataFrame = {
    val debug = sys.env.contains("SPARK_GRAFT_CC_DEBUG")
    var tPrev = System.nanoTime()
    def mark(what: String): Unit = if (debug) {
      System.err.println(f"[cc] $what: ${(System.nanoTime() - tPrev) / 1e9}%.2fs")
      tPrev = System.nanoTime()
    }
    // localCheckpoint, NOT persist: a cached plan compiles WITHOUT AQE
    // (spark.sql.optimizer.canChangeCachedPlanOutputPartitioning), so a
    // persist here would run the whole upstream pair-generation subtree —
    // whose jaccard-verify joins rely on AQE's runtime broadcast — as
    // static sort-merge joins (measured 3.5× slower at sf0.1).
    // localCheckpoint executes it as a normal AQE job, materializes the
    // small edge list, and truncates lineage for the loop below.
    // Self-pairs are kept HERE (the contraction below must not see them,
    // but the contract is a label for EVERY node appearing in `pairs` —
    // a self-paired isolated node still labels itself; see the anti-join
    // at the end).
    val bc0 = Eager.broadcastSnapshot(pairs.sparkSession)
    val (rawEdges, rawRel) = Eager.tracked(pairs
      .select(col("key_a").as("src"), col("key_b").as("dst"))
      .distinct())
    var edges = rawEdges.filter(col("src") =!= col("dst"))
    mark("edges materialized")

    // Per-node neighborhood min via groupBy + join-back, NOT a window:
    // min() over Window.partitionBy(src) has no map-side partial
    // aggregation and buffers each src partition in ONE task — and the
    // contraction manufactures the worst case (a star root's symmetric
    // neighborhood is its whole component), so at billion-node
    // components one task would serialize each round. The aggregate
    // form combines map-side and the join back is AQE-skew-splittable.
    def withMin(df: DataFrame): DataFrame =
      df.join(df.groupBy("src").agg(min(col("dst")).as("mn")), Seq("src"))

    // large-star: for each node u (over the SYMMETRIC neighborhood),
    // m = min(Γ(u) ∪ {u}); rewire every strictly LARGER neighbor to m.
    // The symmetric view comes from one explode per edge row, not
    // union(e, e.swap), so the (checkpointed) edge scan runs once.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      // no distinct here: duplicate (v, m) rows don't change smallStar's
      // per-node min and its final distinct dedups them — dropping the
      // exchange saves one shuffle per round
      withMin(sym)
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), least(col("src"), col("mn")).as("dst"))
    }

    // small-star: orient every edge so src > dst (all neighbors of u in
    // this view are SMALLER); m = min of them; rewire the non-min
    // neighbors and u itself to m.
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      val withM = withMin(oriented)
      withM.filter(col("dst") =!= col("mn"))
        .select(col("dst").as("src"), col("mn").as("dst"))
        .unionByName(withM.select(col("src"), col("mn").as("dst")))
        .distinct()
    }

    // edge-set signature for the fixpoint test: exact decimal sums (no
    // long overflow at any scale); empty graph sums are NULL → 0
    def signature(e: DataFrame): (Long, BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)"))).head()
      val s = r.getDecimal(1)
      (r.getLong(0), if (s == null) BigDecimal(0) else BigDecimal(s))
    }

    var prevSig = signature(edges)
    mark(s"initial signature $prevSig")
    var converged = prevSig._1 == 0L // empty pair graph: nothing to do
    var round = 0
    // release one round behind the loop: round i's checkpoint blocks are
    // dead the moment round i+1's checkpoint job has materialized (each
    // round references only its predecessor), so the loop retains at
    // most two rounds of edge blocks instead of all of them until a
    // driver GC (the round-6 in-suite bench-inflation root cause)
    var relPrev: () => Unit = () => ()
    while (!converged && round < maxRounds) {
      val (ck, rel) = Eager.tracked(smallStar(largeStar(edges)))
      relPrev(); relPrev = rel
      edges = ck
      val sig = signature(edges)
      converged = sig == prevSig
      prevSig = sig
      round += 1
      mark(s"round $round sig=$sig")
    }
    // hitting the backstop means the contraction has not reached its
    // star fixpoint and the labeling below would be WRONG (some node not
    // yet pointing at its component min) — fail loudly rather than hand
    // wrong clusters downstream
    if (!converged) throw new IllegalStateException(
      s"dedupClusters did not converge within $maxRounds rounds — " +
        "raise maxRounds (alternation needs O(log² n) rounds worst case)")
    // fixpoint edges are stars (v, root): non-roots appear exactly once
    // as src; each root appears only as dst, labeling itself
    val starLabels = edges
      .select(col("src").as("key"), col("dst").as("cluster_id"))
      .unionByName(edges.select(col("dst").as("key"), col("dst").as("cluster_id")))
      .distinct()
    // contract: every node APPEARING IN `pairs` gets a label — a node
    // whose only appearances are self-pairs never enters the contraction
    // (no non-self edge), so it labels itself via the anti-join
    val selfOnly = rawEdges
      .select(explode(array(col("src"), col("dst"))).as("key")).distinct()
      .join(starLabels, Seq("key"), "left_anti")
      .select(col("key"), col("key").as("cluster_id"))
    // terminal checkpoint frees the raw edge list and the converged
    // star edges; the (small) label frame is the only surviving block
    // set, owned by the caller/harness. Contraction rounds each left a
    // broadcast exchange (AQE broadcasts the shrinking edge frames) —
    // destroyed by handle now that the terminal is an RDD scan.
    val out =
      Eager.terminalReleasing(starLabels.unionByName(selfOnly), relPrev, rawRel)
    Eager.releaseBroadcastsSince(pairs.sparkSession, bc0)
    out
  }

  /** Incremental near-dup: filter an INCOMING batch against an EXISTING
    * corpus — the production crawl-dedup scenario, where re-pairing the
    * corpus with itself per batch would be absurd. Both sides get
    * MinHash band signatures; candidates are incoming→existing bucket
    * joins only (never existing×existing); exact Jaccard verifies each
    * candidate; incoming docs with a verified near-dup in the existing
    * corpus are dropped. Returns the surviving incoming keys.
    *
    * Scale: in production the existing side's (key, band, band_val)
    * rows and shingle-digest sets are PRECOMPUTED once and stored
    * alongside the corpus (both are outputs of plain aggregates here,
    * so persisting them is a `write.partitionBy(band)` away); then each
    * batch costs only its own shingling plus joins proportional to the
    * batch's bucket overlap.
    *
    * Cache lifetime: both shingle-digest frames are persisted for the
    * duration of the call and RELEASED before returning — the survivors
    * frame is materialized eagerly (localCheckpoint; it is batch-key
    * sized), so nothing cached outlives the call.
    */
  def incrementalSurvivors(
      existing: DataFrame, incoming: DataFrame, key: Column, text: Column,
      n: Int, k: Int, threshold: Double): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val shE = wordShingleDigests(existing, key, text, n).persist(lvl)
    try probeExistingIndex(
      lshBands(minhashSig(shE, k), k),
      shE.groupBy("key").agg(collect_set(col("shingle")).as("sh")),
      incoming, key, text, n, k, threshold)
    finally { shE.unpersist(); () }
  }

  /** Shared survivor path for the two incremental forms: probe the
    * existing side's band table for candidates, Jaccard-verify against
    * its digest sets, anti-join the incoming batch. The incoming shingle
    * frame is persisted (it feeds both the probe and the verify sets)
    * and released before return; the survivors are localCheckpoint-ed
    * (eager, batch-key sized) so callers never inherit cached state —
    * the discipline that fixed the bench interference flap in
    * [[minhashPairs]].
    */
  private def probeExistingIndex(
      bandsE: DataFrame, setsE: DataFrame,
      incoming: DataFrame, key: Column, text: Column,
      n: Int, k: Int, threshold: Double,
      broadcastIncoming: Boolean = false): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val bc0 = Eager.broadcastSnapshot(incoming.sparkSession)
    // ONE exchange of the shingle table, not two: the probe needs both
    // the minhash signature (for banding) and the digest SET (for
    // verification) per doc — aggregating them in a single groupBy
    // halves the heavy shuffle (the shingle table is ~100× the doc
    // table) and the persisted frame shrinks from per-shingle rows to
    // per-doc rows (round-10 verdict #5 profiling: the twin aggs were
    // the two largest stages of every micro-batch probe).
    val perDoc = minhashSigWithSets(
      wordShingleDigests(incoming, key, text, n), k).persist(lvl)
    // `broadcastIncoming` is the MICRO-BATCH shape (round-10 verdict
    // #5): when the incoming slice is small next to the index, hinting
    // the batch side into broadcast joins lets the (caller-persisted)
    // index frames STREAM with zero exchange — profiling showed ~1 s of
    // each micro-batch probe was re-shuffling the unchanged band/set
    // tables into a fresh per-batch plan. The one-shot batch form keeps
    // the shuffle plan: there `incoming` is corpus-sized and a
    // batch-side broadcast would ship hundreds of MB per executor.
    def maybeBc(df: DataFrame): DataFrame =
      if (broadcastIncoming) broadcast(df) else df
    // batch form only: persist the guarded frame BEFORE the strategy
    // count (round-13 ADVICE — unpersisted, the count recomputed the
    // existing side's signature aggregation once extra per call);
    // released in the finally after Eager.terminal materializes. The
    // micro-batch form never counts it (broadcastIncoming joins
    // against the caller-persisted index frames directly).
    val bandsESel0 = bandsE
      .select(col("key").as("key_e"), col("band"), col("band_val"))
    val bandsESel =
      if (broadcastIncoming) bandsESel0 else bandsESel0.persist(lvl)
    try {
      // batch form: SIZE-GUARDED existing-band side (round-13 sf1
      // capture: unhinted, the static planner broadcast the EXISTING
      // index's band table — corpus-scaled — off a tiny aggregate
      // estimate; 5× wall at sf1, driver OOM at real scale). A small
      // index still broadcasts (one count decides); past the limit the
      // incoming band side builds a shuffled hash.
      val candIn = lshBands(perDoc, k)
        .select(col("key").as("key_i"), col("band"), col("band_val"))
      val cand = (if (broadcastIncoming) broadcast(candIn).join(bandsESel,
          Seq("band", "band_val"))
        else if (Guards.smallEnough("neardup.probeExistingIndex.bands",
            bandsESel.count(), 250000L))
          candIn.join(broadcast(bandsESel), Seq("band", "band_val"))
        else candIn.hint("shuffle_hash").join(bandsESel,
          Seq("band", "band_val")))
        .select("key_i", "key_e").distinct()
      val setsI = perDoc.select(col("key"), col("sh"))
      // SHUFFLED HASH, not sort-merge, for the verify joins in the
      // batch form: the set rows are wide (one array of digests per
      // doc) and an SMJ would pay a sort of the existing-set side.
      // Hash build side = the candidate/batch side (hinted), stream
      // side = the big set table — shuffled, never sorted.
      val withA = (if (broadcastIncoming) cand else cand.hint("shuffle_hash"))
        .join(setsI.select(col("key").as("key_i"), col("sh").as("sh_a")), Seq("key_i"))
      val dup = maybeBc(if (broadcastIncoming) withA else withA.hint("shuffle_hash"))
        .join(setsE.select(col("key").as("key_e"), col("sh").as("sh_b")), Seq("key_e"))
        .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
        .withColumn("jacc",
          col("n_inter").cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) - col("n_inter")).cast("double"))
        .filter(col("jacc") >= threshold)
        .select(col("key_i").as("key")).distinct()
      val out = Eager.terminal(
        incoming.select(key.as("key")).join(dup, Seq("key"), "left_anti"))
      Eager.releaseBroadcastsSince(incoming.sparkSession, bc0)
      out
    } finally {
      if (!broadcastIncoming) { bandsESel.unpersist(); () }
      perDoc.unpersist(); ()
    }
  }

  /** One CUMULATIVE micro-batch step (round-10 verdict #5): probe
    * `incoming` against the prepared index frames AND return the
    * survivors' index delta — band rows and digest sets — derived from
    * the probe's OWN fused per-doc aggregate, so the cumulative loop
    * no longer re-shingles and re-aggregates the survivors a second
    * time for the append (previously a full extra shingle pass,
    * measured as the cumulative stream's largest per-batch cost after
    * the probe itself).
    *
    * Returns (survivors, deltaBands, deltaSets, release). The deltas
    * are LOCAL CHECKPOINTS ([[Eager.tracked]]): stable snapshots that
    * reference no broadcast, so the per-batch broadcast sweep stays
    * safe while the caller's running union keeps referencing them
    * across batches. The caller MUST invoke `release` only after every
    * plan referencing the deltas is done (stream completed, output
    * file-backed) — a released local checkpoint can never be
    * recomputed. */
  def probeAndDelta(bandsE: DataFrame, setsE: DataFrame,
      incoming: DataFrame, key: Column, text: Column,
      n: Int, k: Int, threshold: Double)
      : (DataFrame, DataFrame, DataFrame, () => Unit) = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val bc0 = Eager.broadcastSnapshot(incoming.sparkSession)
    val perDoc = minhashSigWithSets(
      wordShingleDigests(incoming, key, text, n), k).persist(lvl)
    try {
      val cand = broadcast(lshBands(perDoc, k)
          .select(col("key").as("key_i"), col("band"), col("band_val")))
        .join(bandsE.select(col("key").as("key_e"), col("band"), col("band_val")),
          Seq("band", "band_val"))
        .select("key_i", "key_e").distinct()
      val dup = broadcast(cand
          .join(perDoc.select(col("key").as("key_i"), col("sh").as("sh_a")),
            Seq("key_i")))
        .join(setsE.select(col("key").as("key_e"), col("sh").as("sh_b")), Seq("key_e"))
        .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
        .withColumn("jacc",
          col("n_inter").cast("double") /
            (size(col("sh_a")) + size(col("sh_b")) - col("n_inter")).cast("double"))
        .filter(col("jacc") >= threshold)
        .select(col("key_i").as("key")).distinct()
      val out = Eager.terminal(
        incoming.select(key.as("key")).join(dup, Seq("key"), "left_anti"))
      val survPerDoc = perDoc.join(out, Seq("key"), "left_semi")
      val (dB, relB) = Eager.tracked(lshBands(survPerDoc, k))
      val (dS, relS) = Eager.tracked(survPerDoc.select(col("key"), col("sh")))
      Eager.releaseBroadcastsSince(incoming.sparkSession, bc0)
      (out, dB, dS, () => { relB(); relS() })
    } finally { perDoc.unpersist(); () }
  }

  /** [[minhashSig]] and the per-doc digest set in ONE aggregation pass
    * — min per window and `collect_set` are both partial-aggregable,
    * so fusing them halves the shingle-table exchanges for every
    * consumer that needs signature + verify set (the probe path). */
  def minhashSigWithSets(sh: DataFrame, k: Int): DataFrame = {
    require(k <= 16,
      s"k=$k: at most 16 disjoint 4-hex windows across the two digests")
    val d2 = concat(col("shingle"), col("shingle"))
    lazy val e = md5(concat(lit("b:"), col("shingle")))
    lazy val e2 = concat(e, e)
    val mins = (0 until k).map { i =>
      val src = if (i < 8) d2 else e2
      min(substring(src, 1 + 4 * (i % 8), 16)).as(s"mh$i")
    }
    val aggs = mins :+ collect_set(col("shingle")).as("sh")
    sh.groupBy(col("key")).agg(aggs.head, aggs.tail: _*)
  }

  /** Blocked entity matching scored by native Jaro-Winkler — the
    * record-linkage classic (match "Jon Smith Inc" to "John Smith Inc."
    * across two source systems): candidates are generated by an
    * EQUI-join on a blocking key (shared name prefix — the standard
    * blocking scheme; swap in phonetic codes or sorted-neighborhood
    * windows without touching the scorer), then each candidate pair is
    * scored by the native [[graft.functions.JaroWinkler]] expression
    * and kept above `threshold`.
    *
    * Plan: one hash join on the block key (candidate volume Σ|block|²,
    * bounded by the blocking scheme — never |L|·|R|), scoring inline in
    * the join's projection under whole-stage codegen. The similarity
    * is rounded to 6 BEFORE thresholding so the SQL oracle (DuckDB's
    * `jaro_winkler_similarity`, same Winkler 1990 parameterization)
    * filters identically.
    *
    * `block` maps a name column to its blocking key and must be chosen
    * from the parts of the name the expected corruption CANNOT touch —
    * the recall/volume dial. A single coarse attribute (5-char prefix)
    * left Σ|block|² 20× too fat on clustered name vocabularies
    * (measured 13.1 s at sf0.1); compounding it with a second
    * independent attribute (suffix) multiplied the block count and cut
    * the same workload to ~1 s with identical matches.
    */
  def entityMatch(left: DataFrame, right: DataFrame,
      leftKey: Column, leftName: Column, rightKey: Column, rightName: Column,
      block: Column => Column, threshold: Double): DataFrame = {
    val spark = left.sparkSession
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler",
      exprs => graft.functions.JaroWinkler(exprs(0), exprs(1)), "built-in")
    val a = left.select(leftKey.as("key_a"), leftName.as("name_a"),
      block(leftName).as("block"))
    val b = right.select(rightKey.as("key_b"), rightName.as("name_b"),
      block(rightName).as("block"))
    a.join(b, Seq("block"))
      .withColumn("jw", round(
        call_function("graft_jaro_winkler", col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= threshold)
      .select("key_a", "key_b", "name_a", "name_b", "jw")
  }

  /** Edit-distance verification for candidate pairs — the third classic
    * near-dup verify metric beside set Jaccard ([[jaccardSets]]) and
    * SimHash Hamming ([[simhashPairs]]): exact Levenshtein distance
    * between the two documents' texts, keeping pairs within `maxDist`.
    *
    * Uses Spark's THRESHOLDED levenshtein (early-exits the DP once the
    * running minimum exceeds the bound — O(maxDist·n) instead of
    * O(n²) per pair), which is the difference between feasible and not
    * on long documents; the threshold form returns −1 above the bound,
    * which the filter drops, so results equal the unbounded form
    * filtered to ≤ maxDist (what the oracle computes). Candidates only —
    * never all-pairs; feed it [[candidatePairs]] / [[simhashPairs]]
    * output.
    */
  def editDistancePairs(df: DataFrame, key: Column, text: Column,
      pairs: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"editDistancePairs: maxDist must be >= 0, got $maxDist")
    val docs = df.select(key.as("key"), text.as("t"))
    // size-guarded text joins (round-13 sf1 capture): unhinted, the
    // static planner broadcast the full-TEXT corpus side of both joins
    // (union size estimates read tiny) — at 10× data that broadcast
    // was the whole query's wall clock. A small corpus still
    // broadcasts (one count decides from the real size); past the
    // limit the pair side builds a shuffled hash and the text-bearing
    // corpus streams. The limit is row-based and deliberately low —
    // these rows carry document text.
    val docsSmall = Guards.smallEnough("neardup.editDistancePairs.docs",
      docs.count(), 100000L)
    def side(d: DataFrame): DataFrame =
      if (docsSmall) broadcast(d) else d
    val left = if (docsSmall) pairs else pairs.hint("shuffle_hash")
    val j1 = left.join(
      side(docs.select(col("key").as("key_a"), col("t").as("t_a"))),
      Seq("key_a"))
    (if (docsSmall) j1 else j1.hint("shuffle_hash"))
      .join(side(docs.select(col("key").as("key_b"), col("t").as("t_b"))),
        Seq("key_b"))
      // length-difference lower bound: |len(a) − len(b)| > maxDist
      // already proves the distance exceeds the bound — kills most far
      // candidates for the cost of two lengths, before any DP runs
      // (measured 7.8 → 3.3 s at sf0.1)
      .filter(abs(length(col("t_a")) - length(col("t_b"))) <= maxDist)
      .withColumn("edit_dist", levenshtein(col("t_a"), col("t_b"), maxDist))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
      .select(col("key_a"), col("key_b"), col("edit_dist"))
  }

  /** Materialize the existing-corpus near-dup INDEX — the precompute the
    * [[incrementalSurvivors]] scale notes promise: the corpus's LSH band
    * rows and its per-doc digest sets, both plain aggregate outputs
    * written once and reused by every subsequent batch. The band table
    * is partitioned by band to keep each band's rows clustered — the
    * standard full probe reads every band (a batch's signatures cover
    * all of them), but a band-SCOPED operation (re-probing one band
    * after a banding-dial change, or auditing a bucket) prunes at the
    * directory level.
    */
  def writeNearDupIndex(existing: DataFrame, key: Column, text: Column,
      n: Int, k: Int, path: String): Unit = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sh = wordShingleDigests(existing, key, text, n).persist(lvl)
    try {
      lshBands(minhashSig(sh, k), k)
        .write.mode("overwrite").partitionBy("band").parquet(s"$path/bands")
      sh.groupBy("key").agg(collect_set(col("shingle")).as("sh"))
        .write.mode("overwrite").parquet(s"$path/sets")
    } finally { sh.unpersist(); () }
  }


  /** Build the shared on-disk index at `path` exactly once, RACE-SAFELY —
    * the [[IndexStore.ensure]] contract (pid-scoped staged build,
    * `_OK` written pre-install, one atomic directory move as the
    * serialization point) applied to [[writeNearDupIndex]]. */
  def ensureNearDupIndex(corpus: DataFrame, key: Column, text: Column,
      n: Int, k: Int, path: String): Unit =
    IndexStore.ensure(path)(stage =>
      writeNearDupIndex(corpus, key, text, n, k, stage))

  /** Asymmetric near-CONTAINMENT pairs (Broder 1997's containment
    * c(A→B) = |A∩B| / |A|): detects documents mostly INSIDE another —
    * truncations, quoted inclusions, boilerplate-wrapped copies — which
    * symmetric Jaccard under-scores exactly when the size gap is large
    * (J = |A∩B|/|A∪B| → small for a short doc inside a long one even
    * at containment 1.0). Candidates come from the same MinHash LSH
    * banding as [[minhashPairs]] (digest-set shuffle, Σ|bucket|² pair
    * volume); each candidate is verified with BOTH direction scores and
    * kept when either reaches `threshold`. Returns
    * (key_a, key_b, cont_a, cont_b, containment = max of the two),
    * scores rounded to 6 for oracle parity.
    */
  def containmentPairs(
      df: DataFrame, key: Column, text: Column,
      n: Int, k: Int, threshold: Double): DataFrame = {
    val bc0 = Eager.broadcastSnapshot(df.sparkSession)
    val sh = wordShingleDigests(df, key, text, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val pairs = candidatePairs(lshBands(minhashSig(sh, k), k))
      val sets = sh.groupBy("key").agg(collect_set(col("shingle")).as("sh"))
      val out = Eager.terminal(scoreContainment(pairs, sets, threshold))
      Eager.releaseBroadcastsSince(df.sparkSession, bc0)
      out
    } finally { sh.unpersist(); () }
  }

  /** Both-direction containment scores for candidate pairs over per-doc
    * digest sets, thresholded on the max — the verify stage shared by
    * [[containmentPairs]] and [[containmentPairsIndexed]]. */
  private def scoreContainment(pairs: DataFrame, sets: DataFrame,
      threshold: Double): DataFrame =
    pairs
      .join(sets.select(col("key").as("key_a"), col("sh").as("sh_a")), Seq("key_a"))
      .join(sets.select(col("key").as("key_b"), col("sh").as("sh_b")), Seq("key_b"))
      .withColumn("n_inter",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("cont_a", round(
        col("n_inter").cast("double") / size(col("sh_a")).cast("double"), 6))
      .withColumn("cont_b", round(
        col("n_inter").cast("double") / size(col("sh_b")).cast("double"), 6))
      .withColumn("containment", greatest(col("cont_a"), col("cont_b")))
      .filter(col("containment") >= threshold)
      .select("key_a", "key_b", "cont_a", "cont_b", "containment")

  /** [[containmentPairs]] backed by the MATERIALIZED index — the stored
    * bands + digest sets ([[writeNearDupIndex]]) are EXACTLY its two
    * inputs, so a containment scan prices only the candidate banding
    * join + the both-direction verify, never a re-shingling of the
    * corpus (round-7 verdict #5: the un-indexed form re-paid the
    * shingle/signature stage every run even when the Jaccard pair
    * consumers had already materialized identical tables). Results
    * equal [[containmentPairs]] on the same corpus — same aggregates,
    * same candidates — which NearDupSpec asserts.
    */
  def containmentPairsIndexed(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      corpus: DataFrame, key: Column, text: Column,
      n: Int, k: Int, threshold: Double): DataFrame = {
    val bc0 = Eager.broadcastSnapshot(spark)
    ensureNearDupIndex(corpus, key, text, n, k, indexPath)
    val bands = spark.read.parquet(s"$indexPath/bands")
      .select("key", "band", "band_val")
    val sets = spark.read.parquet(s"$indexPath/sets")
    val out = Eager.terminal(
      scoreContainment(candidatePairs(bands), sets, threshold))
    Eager.releaseBroadcastsSince(spark, bc0)
    out
  }

  /** Index MAINTENANCE — the write half of the crawl-ingest loop:
    * append a batch's band rows and digest sets to the stored index so
    * the NEXT batch's probe sees it. Call with the batch's SURVIVORS
    * (post-[[probeExistingIndex]]), which keeps the index
    * near-dup-free; appending is parquet `append` into the same
    * band-partitioned layout, so at 100 TB this is a metadata-cheap
    * add of batch-sized files per band directory (compaction is the
    * lake's standard small-file job, orthogonal to correctness).
    * Probe-after-append equivalence is spec-asserted: once a doc's
    * rows land in the index, a near-copy of it probes as a duplicate.
    */
  def appendToNearDupIndex(batch: DataFrame, key: Column, text: Column,
      n: Int, k: Int, path: String): Unit = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sh = wordShingleDigests(batch, key, text, n).persist(lvl)
    try {
      lshBands(minhashSig(sh, k), k)
        .write.mode("append").partitionBy("band").parquet(s"$path/bands")
      sh.groupBy("key").agg(collect_set(col("shingle")).as("sh"))
        .write.mode("append").parquet(s"$path/sets")
    } finally { sh.unpersist(); () }
  }

  /** Compact an accumulated near-dup index IN PLACE (round-9 verdict
    * #4) — [[appendToNearDupIndex]] grows one small parquet file per
    * band per accepted batch, and after enough crawl batches the
    * listing/open cost of those files dominates every probe; this is
    * the lake's standard small-file compaction job made real for the
    * index layout. Rewrites the band table to ONE file per band
    * partition (`repartition(band)` so each band's rows land in a
    * single task) and the set table to `setFiles` files, stages the
    * rewrite next to the index, and swaps it in with the same
    * ATOMIC_MOVE + `_OK` gating as [[ensureNearDupIndex]] — a reader
    * never observes a half-compacted index (crash between the two
    * moves leaves either the old gated index or no index, which the
    * ensure path rebuilds). Probe results are IDENTICAL before and
    * after — compaction moves rows between files, never changes them —
    * which NearDupSpec asserts along with the file-count reduction.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compactNearDupIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, setFiles: Int = 1): (Long, Long) = {
    require(setFiles > 0, s"compactNearDupIndex: setFiles must be > 0, got $setFiles")
    IndexStore.rewriteInPlace(path) { stage =>
      spark.read.parquet(s"$path/bands")
        .repartition(col("band"))
        .write.mode("overwrite").partitionBy("band")
        .parquet(s"$stage/bands")
      spark.read.parquet(s"$path/sets")
        .repartition(setFiles)
        .write.mode("overwrite").parquet(s"$stage/sets")
    }
  }

  /** [[minhashPairs]] backed by the MATERIALIZED index: builds the
    * band/set tables once per index path ([[writeNearDupIndex]], a
    * `_OK` marker gates completion) and mines pairs from the STORED
    * tables thereafter — the corpus is shingled once per index
    * lifetime, not once per query. This is how the pair graph and its
    * consumers (clustering, dedup audits) share work in production: the
    * index is a corpus artifact, the queries price only their own joins
    * (candidate banding join + Jaccard verify here; contraction on top
    * for [[dedupClusters]]). Results are identical to [[minhashPairs]]
    * on the same corpus — the stored tables are the same aggregates —
    * which the shared DuckDB oracle asserts.
    *
    * Callers key `indexPath` to the corpus identity (source path +
    * file mtime/size) so a testdata regeneration can never serve a
    * stale index.
    */
  def minhashPairsIndexed(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      corpus: DataFrame, key: Column, text: Column,
      n: Int, k: Int, threshold: Double): DataFrame = {
    val bc0 = Eager.broadcastSnapshot(spark)
    ensureNearDupIndex(corpus, key, text, n, k, indexPath)
    val bands = spark.read.parquet(s"$indexPath/bands")
      .select("key", "band", "band_val")
    val sets = spark.read.parquet(s"$indexPath/sets")
    val out = Eager.terminal(
      jaccardSets(candidatePairs(bands), sets)
        .filter(col("jacc") >= threshold)
        .select("key_a", "key_b", "jacc"))
    Eager.releaseBroadcastsSince(spark, bc0)
    out
  }

  /** [[incrementalSurvivors]] against a MATERIALIZED index (written by
    * [[writeNearDupIndex]]): each batch pays only its own shingling +
    * joins against the stored band/set tables — the existing corpus is
    * never re-shingled. Result equals [[incrementalSurvivors]] on the
    * same corpus (asserted in NearDupSpec).
    *
    * Cache lifetime: the incoming batch's shingle frame is persisted
    * inside the shared probe and released before return (survivors are
    * eagerly materialized) — same contract as [[incrementalSurvivors]].
    */
  def incrementalSurvivorsIndexed(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      incoming: DataFrame, key: Column, text: Column,
      n: Int, k: Int, threshold: Double): DataFrame =
    probeExistingIndex(
      spark.read.parquet(s"$indexPath/bands"),
      spark.read.parquet(s"$indexPath/sets"),
      incoming, key, text, n, k, threshold)

  /** [[incrementalSurvivorsIndexed]] against CALLER-PREPARED band/set
    * frames — the repeated-probe entry point (round-10 verdict #5): a
    * micro-batch loop probes the same stored index once per batch, and
    * re-reading its parquet every batch re-pays scan + codegen that a
    * caller-persisted frame pays once. The caller owns the frames'
    * storage level and release; semantics are identical to the
    * path-based form (same probe plan over the same rows). */
  def incrementalSurvivorsAgainst(bandsE: DataFrame, setsE: DataFrame,
      incoming: DataFrame, key: Column, text: Column,
      n: Int, k: Int, threshold: Double): DataFrame =
    probeExistingIndex(bandsE, setsE, incoming, key, text, n, k, threshold,
      broadcastIncoming = true)

  /** Exact n-gram Jaccard via per-doc shingle SETS: one `collect_set`
    * aggregation (map-side partials dedup before the shuffle, so the one
    * exchange carries each doc's set once) and the candidate pairs probe
    * the sets with `array_intersect` per row. Versus [[jaccard]]'s
    * row-level double join — which shuffles the full (key, shingle) set
    * twice more and pays per-row overhead on every shingle — this moves
    * the intersection to per-pair array CPU. Set size is bounded by doc
    * length, so executor memory per row stays bounded at 100 TB; prefer
    * [[jaccard]] only when single documents are pathologically large.
    */
  def ngramJaccardSets(
      df: DataFrame, key: Column, text: Column,
      pairs: DataFrame, n: Int): DataFrame = {
    val sets = df.select(key.as("key"), text.as("t"))
      .withColumn("i",
        explode(sequence(lit(1), greatest(length(col("t")) - (n - 1), lit(1)))))
      .select(col("key"), col("t").substr(col("i"), lit(n)).as("shingle"))
      .groupBy("key").agg(collect_set(col("shingle")).as("sh"))
    jaccardSets(pairs, sets)
  }

  /** Sorted-neighborhood candidate mining — the third classical blocking
    * family next to LSH banding ([[minhashPairs]]) and pigeonhole
    * banding ([[simhashPairs]]): sort each block by a cheap proxy key
    * (here typically record length — near-dups have near-equal lengths)
    * and pair every record ONLY with its next `w` neighbors in that
    * order (Hernández & Stolfo's merge/purge method, SIGMOD 1995 —
    * public). Finds look-alike records that share no exact shingle or
    * band, at cost O(n·w) instead of O(n²). Pairs are verified in-row
    * with a `levenshtein` distance over a fixed-length payload prefix
    * and kept when ≤ `maxDist`.
    *
    * Plan shape at 100 TB: ONE window sort per block (lead() stacked w
    * times in a single WindowExec — no self-join, no explode shuffle:
    * the neighbor payloads ride the window), then a narrow filter. The
    * block key bounds both skew and semantic reach: blocks partition the
    * sort, so a block is never compared across its boundary and the
    * exchange is a plain hash partition on block.
    */
  def sortedNeighborhood(df: DataFrame, id: Column, block: Column,
      sortKey: Seq[Column], payload: Column, w: Int,
      maxDist: Int): DataFrame = {
    require(w > 0, s"sortedNeighborhood: window must be > 0, got $w")
    val base = df.select(Seq(id.as("a_id"), block.as("block"),
      payload.as("a_p")) ++
      sortKey.zipWithIndex.map { case (c, i) => c.as(s"__s$i") }: _*)
    val win = Window.partitionBy("block")
      .orderBy(sortKey.indices.map(i => col(s"__s$i")): _*)
    val withNbrs = (1 to w).foldLeft(base) { (d, i) =>
      d.withColumn(s"__b$i", lead(col("a_id"), i).over(win))
        .withColumn(s"__p$i", lead(col("a_p"), i).over(win))
    }
    val arms = array((1 to w).map(i =>
      struct(lit(i).as("gap"), col(s"__b$i").as("b_id"),
        col(s"__p$i").as("b_p"))): _*)
    withNbrs.select(col("a_id"), col("block"), col("a_p"),
        explode(arms).as("nb"))
      .filter(col("nb.b_id").isNotNull)
      .withColumn("dist", levenshtein(col("a_p"), col("nb.b_p")))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("nb.b_id").as("b_id"), col("block"),
        col("nb.gap").as("gap"), col("dist"))
  }
}
