package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs between crawl
  * and tokenizer: benchmark decontamination, mixture sampling, lexicon
  * scoring, label assembly, and distribution-based cleaning. Extends the
  * reference's curation surface (SURVEY.md §2.4/§2.8 — its pipeline
  * cleans and dedups before load, data_pipeline/tasks/transformation.py)
  * with the ops the builder prompt names as first-class.
  *
  * Oracle parity contract (same as Analytics.momentStats): every mean /
  * variance-style statistic is an exact DECIMAL sum first, ONE double
  * cast + arithmetic after, rounded to a fixed grain — so aggregation
  * order can never change the compared value.
  */
object Curation {

  /** Benchmark decontamination: flag training documents sharing at least
    * one word n-gram with an evaluation set — the standard "remove eval
    * overlap from the training corpus" pass (the n-gram-overlap method
    * popularized by the GPT-3/PaLM appendices).
    *
    * Scale: the eval side is tiny (benchmarks are ~10³-10⁵ docs) so its
    * distinct shingle set is BROADCAST; the 100 TB training side streams
    * past it map-side — the only exchange is the per-doc hit-count
    * aggregate, carrying (key, 1) rows for matched shingles only. The
    * broadcast is size-guarded: the eval shingle set is counted first
    * (one cheap job over the SMALL side) and an eval split whose
    * distinct shingles exceed `maxBroadcastShingles` falls back to a
    * shuffle join instead of OOMing the driver.
    * Returns (key, n_hits) for contaminated training docs.
    */
  def decontaminate(train: DataFrame, eval_ : DataFrame,
      key: Column, text: Column, n: Int,
      maxBroadcastShingles: Long = 50000000L): DataFrame = {
    // raw shingles + ONE global distinct (the per-doc dedup inside
    // wordShingles would add a redundant (key, shingle) shuffle — only
    // the global set matters here)
    val evalShingles = NearDup.wordShinglesRaw(eval_, key, text, n)
      .select("shingle").distinct()
    // ~16 B per hashed shingle → the default cap is ~800 MB in the
    // broadcast relation, the sane driver ceiling. Counting executes the
    // eval-side plan once more than strictly needed, but eval is the
    // small side by definition and the count is what proves it.
    val evalIsSmall = evalShingles.count() <= maxBroadcastShingles
    val probe =
      if (evalIsSmall) broadcast(evalShingles) else evalShingles
    // RAW train shingles: the broadcast probe drops ~everything map-side,
    // so deduping per doc BEFORE the join would shuffle the full corpus
    // shingle stream just to discard it; countDistinct dedups the tiny
    // matched remainder inside the per-doc aggregate instead
    NearDup.wordShinglesRaw(train, key, text, n)
      .join(probe, Seq("shingle"))
      .groupBy("key").agg(countDistinct(col("shingle")).as("n_hits"))
  }

  /** Per-EVAL-doc contamination audit — the companion to
    * [[decontaminate]] (which flags TRAIN docs): for each evaluation
    * document, what fraction of its distinct word n-grams appears
    * anywhere in the training corpus. Rolled up per benchmark this is
    * the GPT-3-appendix "percent clean" table — the number that decides
    * whether an eval score is trustworthy against this corpus.
    *
    * Scale shape (the broadcast REVERSES [[decontaminate]]'s): the
    * eval shingle set is the small side, broadcast into the streaming
    * 100 TB train shingle scan; only MATCHED shingles survive map-side,
    * their global distinct is eval-bounded (≤ the eval set), and that
    * tiny matched set broadcasts back onto the per-doc eval shingles.
    * The train corpus is never shuffled.
    *
    * Returns (key, n_shingles, n_hit, overlap_frac) per eval doc.
    */
  def contaminationReport(train: DataFrame, eval_ : DataFrame,
      key: Column, text: Column, n: Int): DataFrame = {
    val evalSh = NearDup.wordShingles(eval_, key, text, n)
    val evalSet = evalSh.select("shingle").distinct()
    val matched = NearDup.wordShinglesRaw(train, key, text, n)
      .join(broadcast(evalSet), Seq("shingle"))
      .select("shingle").distinct()
    evalSh
      .join(broadcast(matched.withColumn("__hit", lit(1L))),
        Seq("shingle"), "left")
      .groupBy("key")
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .withColumn("overlap_frac",
        round(col("n_hit").cast("double") / col("n_shingles").cast("double"), 6))
  }

  /** Deterministic mixture sampling: per-group hash-threshold sampling to
    * hit target source proportions — how a training mix is downsampled
    * ("keep 12% of CommonCrawl, all of Wikipedia") reproducibly. A row
    * survives iff the first 2 hex chars of md5(key) are below the
    * group's threshold, so membership is a pure function of the key:
    * re-runs, retries, and different partitionings all agree, and no
    * shuffle is needed for the sampling itself (the small per-group
    * rollup here is for reporting).
    *
    * Returns (group, n_in, n_out, rate) — the realized mixture.
    */
  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling" — public): score
    * each raw document by how much more likely its hashed-bigram
    * features are under a TARGET corpus' distribution than under the
    * raw corpus' own:
    *
    *   weight(d) = Σ_f c_d(f) · (ln p_target(f) − ln p_raw(f))
    *
    * over 256 hashed buckets (md5 2-hex-char prefix — the same portable
    * hash family as the sampling operators), with add-α smoothing on
    * both distributions. Positive weight ⇒ the doc looks more like the
    * target domain; resampling by weight is the caller's move (e.g.
    * [[shuffleIntoShards]] after a weight-threshold filter).
    *
    * Scale shape: two corpus-level bucket-count aggregates (≤256 rows
    * each — broadcast), one per-doc bucket-count aggregate, one
    * broadcast join, one per-doc sum. The bucket log-ratio table is the
    * ONLY global state — constant-size however large the corpora, and
    * precomputable/reusable across scoring runs like the bigram-LM
    * count tables.
    *
    * Returns (key, n_feats, weight): n_feats = doc bigram count,
    * weight rounded to 6 (ln ulp margin).
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, key: Column,
      text: Column, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"dsirWeights: alpha must be positive, got $alpha")
    def bigramBuckets(df: DataFrame): DataFrame = {
      val toks = df.select(key.as("key"),
        filter(split(lower(text), "\\s+"), t => t =!= "").as("w"))
        .filter(size(col("w")) >= 2)
      toks.select(col("key"),
          explode(sequence(lit(1), size(col("w")) - 1)).as("i"), col("w"))
        .select(col("key"),
          substring(md5(concat_ws(" ",
            element_at(col("w"), col("i")),
            element_at(col("w"), col("i") + 1))), 1, 2).as("b"))
    }
    // per-doc bucket counts are the ONE aggregate over the raw bigram
    // explode; the corpus-level bucket counts derive from them (sum of a
    // (key,b)-grained frame — a 256-group rollup), so the ~100×-amplifying
    // explode is scanned once, not twice
    val dc = bigramBuckets(raw).groupBy("key", "b").agg(count(lit(1)).as("c"))
    val cr = dc.groupBy("b").agg(sum(col("c")).as("cr"))
    val ct = bigramBuckets(target).groupBy("b").agg(count(lit(1)).as("ct"))
    // totals derived from the 256-row count tables — no second corpus scan
    val nr = cr.agg(sum(col("cr")).as("nr"))
    val nt = ct.agg(sum(col("ct")).as("nt"))
    // log-ratio per bucket: buckets absent from one side get only the
    // smoothing mass (outer join + 0-fill before the ln)
    val ratio = cr.join(ct, Seq("b"), "full_outer")
      .na.fill(0L, Seq("cr", "ct"))
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
      .withColumn("lr",
        log((col("ct").cast("double") + lit(alpha)) /
          (col("nt").cast("double") + lit(256 * alpha))) -
        log((col("cr").cast("double") + lit(alpha)) /
          (col("nr").cast("double") + lit(256 * alpha))))
      .select("b", "lr")
    dc.join(broadcast(ratio), Seq("b"))
      .groupBy("key")
      .agg(sum("c").as("n_feats"),
        round(sum((col("c").cast("double") * col("lr")).cast("decimal(38,12)"))
          .cast("double"), 6).as("weight"))
  }

  /** Temperature-scaled source mixing at α = ½ — the √n "temperature
    * sampling" of multi-source/multilingual LM training (Arivazhagan
    * et al. 2019; T5's mixing, Raffel et al. 2020): source i samples
    * with probability p_i = √n_i / Σ_j √n_j, flattening the source
    * distribution so head sources stop drowning the tail. A doc
    * budget B gives per-doc keep rate r_i = min(1, B·p_i / n_i);
    * membership is the engine-portable hash uniform (first 8 md5 hex
    * chars → (h+0.5)/2³², a pure function of the key — identical rows
    * selected on re-runs, any partitioning, and the SQL oracle).
    * α = ½ specifically because n^α is then ONE exact IEEE sqrt —
    * general pow() hits libm ULP divergence across engines.
    *
    * Unlike [[mixtureSample]] (caller-supplied per-group thresholds),
    * the rates here are COMPUTED from the corpus itself: the Σ√n
    * normalizer is an exact decimal sum of per-group sqrt doubles
    * (order-independent), broadcast as one row. Two aggregates over
    * group-sized frames + one narrow tagging pass — no corpus
    * shuffle beyond the per-group count.
    *
    * Returns (grp, n_in, rate, n_out): input size, the computed keep
    * rate (rounded for display; the filter uses the raw double), and
    * how many docs the hash rule kept.
    */
  def temperatureSample(df: DataFrame, key: Column, group: Column,
      budget: Long): DataFrame = {
    val rates = temperatureRates(df, group, budget)
    df.select(group.as("grp"), hashUniform(key).as("u"))
      .join(broadcast(rates), Seq("grp"))
      .groupBy(col("grp"), col("n_in"), col("rate"))
      .agg(sum(when(col("u") < col("rate"), 1L).otherwise(0L)).as("n_out"))
      .select(col("grp"), col("n_in"), round(col("rate"), 6).as("rate"),
        col("n_out"))
  }

  /** Per-group √n-flattened keep rates against a fixed doc budget —
    * shared by the [[temperatureSample]] report and the
    * [[temperatureFilter]] pipeline stage so they cannot drift. */
  private def temperatureRates(df: DataFrame, group: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"temperature sampling: budget must be > 0, got $budget")
    val counts = df.groupBy(group.as("grp")).agg(count(lit(1)).as("n_in"))
    val z = counts.agg(
      sum(sqrt(col("n_in").cast("double")).cast("decimal(38,12)")).as("z"))
    counts.crossJoin(broadcast(z))
      .withColumn("rate", least(lit(1.0),
        lit(budget.toDouble) * sqrt(col("n_in").cast("double")) /
          col("z").cast("double") / col("n_in").cast("double")))
      .select("grp", "n_in", "rate")
  }

  /** The engine-portable hash uniform u ∈ (0,1) shared by the sampling
    * family: (first-8-hex(md5(key)) + 0.5) / 2³². */
  private def hashUniform(key: Column): Column = {
    val h = conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")
    (h.cast("double") + lit(0.5)) / lit(4294967296.0)
  }

  /** Row-level temperature sampling — [[temperatureSample]]'s keep rule
    * applied as a pipeline FILTER, all input columns preserved: a row
    * survives iff its hash uniform is below its group's √n-flattened
    * rate. The rate table is group-sized and broadcast; the data side
    * is one narrow tagging pass — no corpus shuffle beyond the
    * per-group count that prices the rates. */
  def temperatureFilter(df: DataFrame, key: Column, group: Column,
      budget: Long): DataFrame = {
    val rates = temperatureRates(df, group, budget)
    df.withColumn("__grp", group).withColumn("__u", hashUniform(key))
      .join(broadcast(rates.select(col("grp").as("__grp"), col("rate"))),
        Seq("__grp"))
      .filter(col("__u") < col("rate"))
      .drop("__grp", "__u", "rate")
  }

  def mixtureSample(df: DataFrame, key: Column, group: Column,
      thresholds: Column): DataFrame = {
    val sampled = substring(md5(key.cast("string")), 1, 2) < thresholds
    df.select(group.as("grp"), sampled.as("keep"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_in"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_out"))
      .withColumn("rate",
        round(col("n_out").cast("double") / col("n_in").cast("double"), 6))
  }

  /** Lexicon sentiment scoring — the Spark-native form of the reference's
    * news-sentiment purpose (stonkWhisperer predicts stocks FROM news
    * tone; the reference defers scoring to its Databricks ML stage).
    * Tokens join a BROADCAST lexicon (lexicons are 10³-10⁵ terms — far
    * under broadcast threshold even for real ones); per-doc score is one
    * partial/final aggregate. Docs with no lexicon hit score 0 via the
    * left join back to the doc spine.
    *
    * Returns (key, sentiment, n_matched) for every input doc.
    */
  def sentimentScore(df: DataFrame, key: Column, text: Column,
      lexicon: Seq[(String, Int)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lex = lexicon.toDF("token", "weight")
    val hits = df.select(key.as("key"), explode(split(text, "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .join(broadcast(lex), Seq("token"))
      .groupBy("key")
      .agg(sum(col("weight").cast("long")).as("sentiment"),
        count(lit(1)).as("n_matched"))
    df.select(key.as("key")).distinct()
      .join(hits, Seq("key"), "left")
      .select(col("key"),
        coalesce(col("sentiment"), lit(0L)).as("sentiment"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"))
  }

  /** Supervised label assembly: per (entity, day) value aggregate joined
    * to the NEXT observed day's aggregate via a lead window — the
    * "tomorrow up or down?" label generation at the heart of the
    * reference's prediction goal (news today → price move tomorrow).
    * One aggregate + one window, both hash-partitioned on the entity:
    * no self-join, no driver loop. The mean is an exact decimal sum
    * with one double division, rounded (oracle parity).
    *
    * Returns (entity, day, n_events, v_mean, v_next, label) where label
    * is 1/0 for up/not-up and NULL on each entity's last day.
    */
  def trainingLabels(df: DataFrame, entity: Column, ts: Column,
      value: Column): DataFrame = {
    val daily = df
      .select(entity.as("entity"), date_trunc("day", ts).as("day"),
        value.as("v"))
      .groupBy("entity", "day")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("v").cast("decimal(38,12)")).cast("double") /
          count(lit(1)).cast("double"), 9).as("v_mean"))
    val w = Window.partitionBy("entity").orderBy("day")
    daily
      .withColumn("v_next", lead(col("v_mean"), 1).over(w))
      .withColumn("label",
        when(col("v_next").isNull, lit(null).cast("int"))
          .otherwise((col("v_next") > col("v_mean")).cast("int")))
  }

  /** Sequence packing, concat-then-chunk style: documents are laid out
    * end-to-end within a shard and split into fixed `capacity`-token
    * blocks — GPT-style pre-training batch assembly, where documents
    * straddle block boundaries rather than being padded. Each doc gets
    * its token OFFSET within the shard (an exclusive running sum — one
    * window, hash-partitioned on the shard key, scale-safe: no global
    * ordering exists or is needed, packing is per-shard by design) and
    * from it the first/last block it lands in.
    *
    * Returns (key, shard, n_tokens, offset, block, n_blocks) where
    * block = floor(offset / capacity) and n_blocks is how many blocks
    * the doc spans. A zero-token document spans n_blocks = 0 (its
    * `block` is still the block its offset falls in); without the
    * guard the last-block formula would yield 0 or a spurious 1
    * depending on where the offset lands.
    */
  def packSequences(df: DataFrame, key: Column, shard: Column,
      nTokens: Column, capacity: Int): DataFrame = {
    require(capacity > 0, s"packSequences: capacity must be > 0, got $capacity")
    val w = Window.partitionBy("shard").orderBy("key")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(key.as("key"), shard.as("shard"), nTokens.as("n_tokens"))
      .withColumn("offset",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("block", floor(col("offset") / capacity))
      .withColumn("n_blocks",
        when(col("n_tokens") <= 0, lit(0L)).otherwise(
          floor((col("offset") + col("n_tokens") - 1) / capacity)
            - col("block") + 1))
  }

  /** Deterministic corpus shuffle into training shards — the "global
    * shuffle" step before sequence packing: each key hashes (seeded) to
    * a shard, and its position within the shard is the hash order. A
    * true global permutation would need a global sort + global
    * row_number (one partition — a driver-scale bottleneck); the
    * shard-then-order form is how production pipelines do it: the
    * cross-shard placement is uniform by the hash, in-shard order is
    * deterministic, and every window is hash-partitioned on the shard
    * key. Re-runs, retries, and different input partitionings all
    * produce the identical permutation; changing `seed` produces a
    * fresh one.
    *
    * Returns (key, shard, pos) with pos = 1-based rank within shard.
    */
  def shuffleIntoShards(df: DataFrame, key: Column, seed: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"shuffleIntoShards: nShards must be > 0, got $nShards")
    // 15 hex chars = 60 bits — fits a signed long with headroom, so the
    // conv→cast can't overflow-wrap before the modulo
    df.select(key.as("key"))
      .withColumn("h", md5(concat_ws(":", lit(seed), col("key").cast("string"))))
      .withColumn("shard",
        pmod(conv(substring(col("h"), 1, 15), 16, 10).cast("long"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("h"), col("key"))))
      .select("key", "shard", "pos")
  }

  /** Z-score outlier detection per group: rows whose value sits more than
    * `zThreshold` sample standard deviations from their group mean — the
    * distribution-based filter curation pipelines run on numeric columns
    * (and the reference's bar data would need for bad ticks). Group
    * moments come from ONE partial/final aggregate over exact decimal
    * sums; the tiny per-group stats frame is BROADCAST back, so the data
    * never re-shuffles. z is rounded to 6 digits BEFORE the threshold so
    * both engines cut at identical values.
    *
    * Returns (row id, group, value, z) for flagged rows.
    */
  def zscoreOutliers(df: DataFrame, id: Column, group: Column,
      value: Column, zThreshold: Double): DataFrame = {
    val rows = df.select(id.as("id"), group.as("grp"), value.as("v"))
    val stats = rows.groupBy("grp").agg(
      count(lit(1)).as("n"),
      sum(col("v").cast("decimal(38,12)")).as("sx"),
      sum((col("v") * col("v")).cast("decimal(38,12)")).as("sxx"))
    val withM = rows.join(broadcast(stats), Seq("grp"))
      .withColumn("mean", col("sx").cast("double") / col("n").cast("double"))
      .withColumn("variance",
        (col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double") /
            col("n").cast("double")) /
          (col("n").cast("double") - 1.0))
      .withColumn("z",
        round((col("v") - col("mean")) / sqrt(col("variance")), 6))
    // Degenerate-group guard: a single-row group has variance = 0/0 =
    // NaN and a zero-variance group has sd = 0, so z is NaN either way —
    // and NaN compares GREATER than any threshold in BOTH engines, so
    // without a guard every row of such a group is flagged as its own
    // outlier (and the oracle agrees, so the differential harness could
    // never catch it). The guard tests n and the variance, not sd or z:
    // NaN > 0 is TRUE under Spark SQL's NaN ordering, so a NaN-able
    // column is itself unusable as a guard; variance cannot be NaN once
    // n > 1 (finite numerator, positive denominator).
    withM.filter(col("n") > 1 && col("variance") > 0 &&
        abs(col("z")) > zThreshold)
      .select(col("id"), col("grp"), col("v"), col("z"))
  }

  /** Equi-depth feature binning: each group's values split into
    * `nBins` equal-count bins (ntile over a TOTAL order — the tiebreak
    * column makes bin assignment deterministic), reported as per-bin
    * (count, min, max) — the bin-boundary table a feature-engineering
    * pass ships to training. One window + one aggregate, both
    * hash-partitioned on the group key.
    */
  def featureBins(df: DataFrame, group: Column, value: Column,
      tiebreak: Column, nBins: Int): DataFrame = {
    val w = Window.partitionBy("grp").orderBy(col("v"), col("tb"))
    df.select(group.as("grp"), value.as("v"), tiebreak.as("tb"))
      .withColumn("bin", ntile(nBins).over(w))
      .groupBy("grp", "bin")
      .agg(count(lit(1)).as("n"), min(col("v")).as("v_min"),
        max(col("v")).as("v_max"))
  }

  /** Winsorization: clip values to their group's [pLo, pHi] exact
    * interpolated percentiles — the robust alternative to dropping
    * outliers when the rows must survive (feature columns, reward
    * signals). Percentiles come from one `percentile` aggregate (exact,
    * linear interpolation — the same definition as DuckDB's
    * quantile_cont); the per-group bounds frame is BROADCAST back.
    * Bounds and the clipped value are rounded to 6 digits (the raw
    * value passes through untouched).
    *
    * Returns (id, group, value, lo, hi, v_clipped).
    */
  def winsorize(df: DataFrame, id: Column, group: Column, value: Column,
      pLo: Double, pHi: Double): DataFrame = {
    val rows = df.select(id.as("id"), group.as("grp"), value.as("v"))
    val bounds = rows.groupBy("grp").agg(
      round(percentile(col("v"), lit(pLo)), 6).as("lo"),
      round(percentile(col("v"), lit(pHi)), 6).as("hi"))
    rows.join(broadcast(bounds), Seq("grp"))
      .select(col("id"), col("grp"), col("v"), col("lo"), col("hi"),
        round(least(greatest(col("v"), col("lo")), col("hi")), 6).as("v_clipped"))
  }

  /** Deterministic train/val/test assignment — the canonical
    * hash-bucket split: the first 4 hex chars of md5(key) index a
    * 0..65535 bucket, integer-threshold'd into splits (percent
    * thresholds are EXACT integers — 65536·p/100 — so no float
    * boundary exists to disagree over). Membership is a pure function
    * of the key: reproducible across runs/engines/partitionings, docs
    * never migrate between splits when the corpus grows (the property
    * random-assignment splits lose), and siblings of [[mixtureSample]]
    * / [[Corpus.stratifiedSample]] by construction. Embarrassingly
    * parallel — no shuffle at all.
    *
    * Returns the input row's key + its split label.
    */
  def trainValTestSplit(df: DataFrame, key: Column,
      valPct: Int, testPct: Int): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct < 100,
      s"trainValTestSplit: need valPct, testPct ≥ 0 and val+test < 100, " +
        s"got $valPct, $testPct")
    df.select(key.as("key"), splitExpr(key, valPct, testPct).as("split"))
  }

  /** The shared split-assignment expression: first 16 bits of
    * md5(hashed-column) bucketed 80/10/10 (or as configured). ONE
    * definition for [[trainValTestSplit]] and [[splitByGroup]], so the
    * spec-pinned group=key degeneracy can never drift. */
  private def splitExpr(hashed: Column, valPct: Int, testPct: Int): Column = {
    val trainUb = 65536L * (100 - valPct - testPct) / 100
    val valUb = trainUb + 65536L * valPct / 100
    val bucket = conv(substring(md5(hashed.cast("string")), 1, 4), 16, 10)
      .cast("long")
    when(bucket < trainUb, "train")
      .when(bucket < valUb, "val")
      .otherwise("test")
  }

  /** LEAKAGE-SAFE train/val/test split: the assignment hash is computed
    * on a GROUP id — the near-dup cluster representative, a document's
    * source page, a chunk's parent — so every member of a group lands
    * in the SAME split. This closes the classic contamination hole
    * [[trainValTestSplit]] leaves open for correlated rows: a test
    * document whose near-copy sits in train leaks the answer, and
    * row-keyed hashing splits such pairs ~2·p·(1−p) of the time.
    * Same md5-bucket determinism as [[trainValTestSplit]] (groups whose
    * id equals the row key get the identical assignment, so the plain
    * split is the degenerate group=key case — spec-pinned).
    *
    * Scale shape: pure column work on an already-grouped frame — the
    * expensive part (clustering) is the caller's pair graph, priced
    * where it is produced; no extra shuffle beyond what the caller
    * already has.
    *
    * Returns (key, grp, split).
    */
  def splitByGroup(df: DataFrame, key: Column, group: Column,
      valPct: Int, testPct: Int): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct < 100,
      s"splitByGroup: need valPct, testPct ≥ 0 and val+test < 100, " +
        s"got $valPct, $testPct")
    df.select(key.as("key"), group.as("grp"),
      splitExpr(group, valPct, testPct).as("split"))
  }

  /** k-anonymity audit — for each quasi-identifier combination, how many
    * rows share it and whether that group is below the anonymity
    * threshold `k` (an at-risk group: its members are re-identifiable by
    * the quasi-identifiers alone). The privacy gate a training corpus
    * runs before release. ONE partial/final aggregate on the quasi-id
    * tuple — map-side combine collapses the count before the shuffle, so
    * the exchange carries one row per distinct quasi-id combination, not
    * per input row.
    *
    * Returns (quasi..., n, at_risk) for every combination.
    */
  def kAnonymity(df: DataFrame, quasi: Seq[Column], k: Long): DataFrame = {
    require(quasi.nonEmpty, "kAnonymity: no quasi-identifier columns given")
    require(k >= 2, s"kAnonymity: k must be ≥ 2, got $k")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
  }
}
