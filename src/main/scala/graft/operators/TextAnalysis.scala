package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Corpus text analysis for training-data curation (builder prompt):
  * language id, quality scoring, token counting, fingerprinting. All
  * built-in expressions; every op is embarrassingly parallel (no shuffle
  * except the explicit per-doc aggregates), so they scale linearly with
  * executors.
  */
object TextAnalysis {

  /** Marker-token sets per language for the n-gram/stopword heuristic
    * language-id. On real corpora these are per-language stopwords; the
    * mechanism (pattern-hit scoring + argmax) is the operator under test.
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|and|of)\\b",
    "es" -> "\\b(scan|row|data)\\b",
    "de" -> "\\b(join|merge|hash)\\b",
    "fr" -> "\\b(table|filter|sort)\\b",
    "zh" -> "\\b(query|group|order)\\b")

  /** Language id: score each candidate language by marker-pattern hit
    * count, pick the argmax (ties broken by language code). One cross
    * join against a tiny literal dim (broadcast) + one window argmax.
    */
  def langId(df: DataFrame, key: Column, text: Column)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val markers = langMarkers.toDF("cand_lang", "pattern")
    val scored = df.select(key.as("key"), text.as("t"))
      .crossJoin(broadcast(markers))
      .withColumn("hits", regexp_count(lower(col("t")), col("pattern")))
    // argmax via partial/final min_by — the 5×-amplified frame collapses
    // map-side instead of shuffling whole for a window sort. min of
    // (-hits, cand_lang) = max hits, ties to smallest language code.
    scored.groupBy(col("key"))
      .agg(min_by(struct(col("cand_lang"), col("hits")),
        struct((-col("hits")).as("nh"), col("cand_lang"))).as("best"))
      .select(col("key"), col("best.cand_lang").as("pred_lang"),
        col("best.hits").as("hits"))
  }

  /** Column-wise language id: marker hits per candidate as expressions,
    * argmax picked by sorting an array of (−hits, lang) structs — struct
    * ordering compares fields left-to-right, so element 0 is max hits
    * with ties to the smallest language code, exactly [[langId]]'s rule.
    * Fully codegen'd: NO crossJoin, NO aggregation — for pipelines that
    * need the prediction inline without a shuffle.
    */
  def langIdCol(text: Column): Column = {
    val entries = langMarkers.map { case (lang, pat) =>
      struct((-regexp_count(lower(text), lit(pat))).as("nh"),
        lit(lang).as("lang"))
    }
    element_at(sort_array(array(entries: _*)), 1).getField("lang")
  }

  private val stopwords = Seq("the", "a", "and", "of", "to", "in")

  /** Append quality feature + score columns to `df` (text column kept —
    * for pipelines that filter and keep processing the text).
    */
  def withQualityFeatures(df: DataFrame, text: Column): DataFrame =
    df.withColumn("n_chars", length(text))
      .withColumn("n_tokens", Text.wsTokenCount(text))
      .withColumn("punct_ratio", Text.punctRatio(text))
      .withColumn("stop_ratio", Text.stopwordRatio(text, stopwords))
      .withColumn("avg_token_len",
        col("n_chars").cast("double") / col("n_tokens").cast("double"))
      .withColumn("score",
        least(col("n_tokens").cast("double") / lit(100.0), lit(1.0)) * lit(0.5) +
          col("stop_ratio") * lit(0.25) + col("punct_ratio") * lit(0.25))

  /** Quality features + a combined score. Every ratio is a fixed double
    * op sequence (oracle bit-parity); callers choose thresholds.
    */
  def qualityScore(df: DataFrame, key: Column, text: Column): DataFrame =
    withQualityFeatures(df.select(key.as("key"), text.as("t")), col("t"))
      .drop("t")

  /** Gopher-rule document filter — the published heuristic gate from
    * "Scaling Language Models: Methods, Analysis & Insights from
    * Training Gopher" (Rae et al. 2021, public; Appendix A1.1), each
    * rule as an explicit column so downstream can audit WHICH rule
    * rejected a doc (the production pattern: keep the per-rule booleans,
    * not just the verdict):
    *   - word count in [minWords, maxWords]
    *   - mean word length in [3, 10] chars
    *   - symbol-to-word ratio ('#' or '...' occurrences / words) < 0.1
    *   - < 90% of lines start with a bullet ('-', '*', '•')
    *   - ≥ 80% of words contain at least one alphabetic character
    *   - ≥ 2 of the 8 required English function words present
    *     (the/be/to/of/and/that/have/with)
    *
    * Pure per-row column work (split + higher-order array functions —
    * no UDF, fully codegen'd, NO shuffle): evaluated in the scan stage
    * at 100 TB, the same plan shape as the rest of the quality family.
    * Ratios are fixed double op sequences rounded to 6 (oracle parity).
    */
  def gopherRules(df: DataFrame, key: Column, text: Column,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val f = gopherFeatureCols(text)
    df.select((key.as("key") +: f.map { case (n, c) => c.as(n) }): _*)
      .withColumn("passes", gopherPasses(minWords, maxWords,
        requireStopwords = true))
  }

  /** The shared feature expressions behind [[gopherRules]] and
    * [[gopherGate]] — one definition so the audit query and the inline
    * pipeline gate can never drift. */
  private def gopherFeatureCols(text: Column): Seq[(String, Column)] = {
    val ws = filter(split(text, "\\s+"), w => w =!= "")
    val nWords = size(ws).cast("long")
    // clamped denominator, same as the line path below: a whitespace-only
    // doc has zero words, and Spark's non-ANSI x/0 yields NULL while
    // DuckDB's IEEE double division may yield NaN/Inf — the clamp keeps
    // engine and oracle identical on degenerate docs (ratios become 0,
    // `passes` stays a real boolean)
    val nWordsD = greatest(nWords, lit(1L)).cast("double")
    val meanLen = round(aggregate(ws, lit(0L),
      (acc, w) => acc + length(w).cast("long")).cast("double") / nWordsD, 6)
    // '#' count + non-overlapping '...' count via length deltas —
    // engine-portable (no regex dialect drift)
    val nHash = length(text) - length(replace(text, lit("#"), lit("")))
    val nEllipsis = (length(text) -
      length(replace(text, lit("..."), lit("")))) / lit(3)
    val symbolRatio = round((nHash + nEllipsis).cast("double") / nWordsD, 6)
    val lines = filter(split(text, "\n"), l => trim(l) =!= "")
    val nLines = greatest(size(lines), lit(1)).cast("long")
    val bulletRatio = round(size(filter(lines, l =>
      trim(l).startsWith("-") || trim(l).startsWith("*") ||
        trim(l).startsWith("•"))).cast("double") / nLines.cast("double"), 6)
    val alphaFrac = round(size(filter(ws, w => w.rlike("[A-Za-z]")))
      .cast("double") / nWordsD, 6)
    val reqStops = array(Seq("the", "be", "to", "of", "and", "that",
      "have", "with").map(lit): _*)
    val nReqStop = size(array_intersect(
      array_distinct(transform(ws, w => lower(w))), reqStops)).cast("long")
    Seq("n_words" -> nWords, "mean_word_len" -> meanLen,
      "symbol_ratio" -> symbolRatio, "bullet_ratio" -> bulletRatio,
      "alpha_word_frac" -> alphaFrac, "n_req_stop" -> nReqStop)
  }

  private def gopherPasses(minWords: Int, maxWords: Int,
      requireStopwords: Boolean): Column = {
    val base = col("n_words") >= minWords && col("n_words") <= maxWords &&
      col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
      col("symbol_ratio") < 0.1 && col("bullet_ratio") < 0.9 &&
      col("alpha_word_frac") >= 0.8
    if (requireStopwords) base && col("n_req_stop") >= 2L else base
  }

  /** Filter `df` to the documents that pass the Gopher gate, keeping
    * ALL input columns — the pipeline form of [[gopherRules]] (which
    * projects to the audit feature table). The gate evaluates in the
    * scan stage: no join back on key, no second pass over the corpus —
    * at 100 TB the rejected docs are never carried past the scan.
    * `requireStopwords=false` drops the English-function-word rule (the
    * right dial for non-English or synthetic corpora). */
  def gopherGate(df: DataFrame, text: Column, minWords: Int, maxWords: Int,
      requireStopwords: Boolean = true): DataFrame = {
    val feats = gopherFeatureCols(text).toMap
    def g(n: String) = feats(n)
    val base = g("n_words") >= minWords && g("n_words") <= maxWords &&
      g("mean_word_len") >= 3.0 && g("mean_word_len") <= 10.0 &&
      g("symbol_ratio") < 0.1 && g("bullet_ratio") < 0.9 &&
      g("alpha_word_frac") >= 0.8
    df.filter(
      if (requireStopwords) base && g("n_req_stop") >= 2L else base)
  }

  /** Repetition statistics — the Gopher/C4-style quality signals that
    * catch boilerplate and spam which length/punctuation ratios miss:
    * `top_word_frac` (most frequent word's share of all words) and
    * `dup_2gram_frac` (fraction of word-2-gram occurrences that repeat an
    * earlier gram in the doc). Two per-doc aggregates, each with map-side
    * partials; group size is bounded by doc length, so both scale
    * linearly with executors.
    */
  def repetitionStats(df: DataFrame, key: Column, text: Column): DataFrame = {
    val base = df.select(key.as("key"),
      filter(split(text, "\\s+"), w => w =!= "").as("ws"))
    val words = base.select(col("key"), explode(col("ws")).as("w"))
      .groupBy("key", "w").agg(count(lit(1)).as("c"))
      .groupBy("key").agg(sum("c").as("n_words"), max("c").as("max_word_cnt"))
    val grams = base
      .withColumn("i", explode(sequence(lit(1), greatest(size(col("ws")) - 1, lit(1)))))
      .select(col("key"), array_join(slice(col("ws"), col("i"), lit(2)), " ").as("g"))
      .groupBy("key").agg(count(lit(1)).as("n_grams"),
        countDistinct(col("g")).as("n_distinct_grams"))
    words.join(grams, Seq("key"))
      .select(col("key"),
        col("n_words"),
        (col("max_word_cnt").cast("double") / col("n_words").cast("double"))
          .as("top_word_frac"),
        (lit(1.0) - col("n_distinct_grams").cast("double") / col("n_grams").cast("double"))
          .as("dup_2gram_frac"))
  }

  /** Token counts: whitespace tokens + BPE-ish subword pre-tokens. */
  def tokenCounts(df: DataFrame, key: Column, text: Column): DataFrame =
    df.select(key.as("key"),
      Text.wsTokenCount(text).as("n_ws_tokens"),
      Text.bpeishTokenCount(text).as("n_bpe_tokens"))

  /** Document fingerprint (winnowing-lite): the `take` lexicographically
    * smallest md5 hashes of the doc's char n-gram shingles, concatenated
    * in order. Robust to small edits anywhere outside the selected
    * grams; only (key, fingerprint) leaves the doc's partition.
    */
  /** TF-IDF top terms per document: tf = in-doc term count, idf =
    * ln(N / df) with exact integer counts, score = tf·idf (one double
    * multiply per term — deterministic). Two aggregates + one broadcast
    * join on term; at corpus scale the df table is the only global
    * state and it's tiny (vocabulary-sized).
    */
  def tfidfTopTerms(df: DataFrame, key: Column, text: Column, k: Int): DataFrame = {
    val words = df.select(key.as("key"), explode(split(text, "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val tf = words.groupBy("key", "term").agg(count(lit(1)).as("tf"))
    // N as a broadcast one-row frame, not an eager .count(): no mid-plan
    // driver action, the whole operator stays one lazily-planned DAG.
    // countDistinct excludes NULL keys from N (as does the oracle's
    // COUNT(DISTINCT)) — null-keyed rows contribute terms but not a doc
    val nDocs = df.agg(countDistinct(key).as("n_docs"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // no broadcast hint on dfreq: it is VOCABULARY-sized (one row per
    // distinct term), and a forced broadcast would bypass the
    // autoBroadcast threshold and OOM the driver at corpus scale — let
    // AQE pick broadcast when the measured size permits, shuffle join
    // otherwise. The 1-row nDocs frame keeps its hint.
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("score").desc, col("term"))
    // output score rounded: ln() differs in the last ulp across engines;
    // ranking is unaffected (equal (tf, df) ⇒ equal score within an
    // engine, and distinct (tf, df) pairs are separated far above ulp)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("key"), col("term"), col("tf"), col("df"),
        round(col("score"), 9).as("score"), col("rnk").cast("int").as("rnk"))
  }

  /** Sparse TF-IDF cosine pairs via POSTING-LIST self-join — lexical
    * document similarity without embeddings, the term-at-a-time pattern
    * every search engine uses: per-(doc, term) TF-IDF weights joined to
    * themselves ON TERM, partial dot products summed per doc pair, then
    * top-k pairs by cosine.
    *
    * The scale dial is `maxDf`: terms appearing in more than `maxDf`
    * docs are dropped from BOTH the weights and the norms (a capped
    * posting list — ubiquitous terms carry near-zero idf weight but
    * would dominate the join volume quadratically). Candidate volume is
    * then Σ df² over surviving terms, bounded by maxDf · Σ df — never
    * n². Same Σ|bucket|² shape as the LSH band join in
    * [[NearDup.minhashPairs]]; this is its exact-lexical sibling.
    *
    * Dot products and norms accumulate in decimal (order-independent
    * sums — double summation order varies with partitioning); the final
    * cosine is a fixed double op sequence rounded to 6 (oracle parity).
    */
  def tfidfCosinePairs(df: DataFrame, key: Column, text: Column,
      maxDf: Int, k: Int): DataFrame = {
    require(maxDf >= 2 && k >= 1,
      s"tfidfCosinePairs: need maxDf >= 2 and k >= 1, got $maxDf, $k")
    val words = df.select(key.as("key"), explode(split(text, "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val tf = words.groupBy("key", "term").agg(count(lit(1)).as("tf"))
    val nDocs = df.agg(countDistinct(key).as("n_docs"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    // the weights frame feeds THREE consumers (norms + both self-join
    // sides); scoped persist keeps the explode+aggregate single-pass,
    // released via the eager top-k terminal. No broadcast hint on dfreq:
    // after the df<=maxDf filter it is still essentially the whole rare-
    // term vocabulary, not maxDf-sized — AQE decides join strategy.
    val wts = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("key"), col("term"),
        (col("tf").cast("double") *
          log(col("n_docs").cast("double") / col("df").cast("double")))
          .as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val norms = wts.groupBy("key")
        .agg(sum((col("w") * col("w")).cast("decimal(38,12)")).as("norm2"))
      val dots = wts.select(col("key").as("key_a"), col("term"), col("w").as("wa"))
        .join(wts.select(col("key").as("key_b"), col("term"), col("w").as("wb")),
          Seq("term"))
        .filter(col("key_a") < col("key_b"))
        .groupBy("key_a", "key_b")
        .agg(sum((col("wa") * col("wb")).cast("decimal(38,12)")).as("dot"))
      Eager.terminal(dots
        .join(norms.select(col("key").as("key_a"), col("norm2").as("na")), Seq("key_a"))
        .join(norms.select(col("key").as("key_b"), col("norm2").as("nb")), Seq("key_b"))
        .select(col("key_a"), col("key_b"),
          round(col("dot").cast("double") /
            sqrt(col("na").cast("double") * col("nb").cast("double")), 6)
            .as("cosine"))
        .orderBy(col("cosine").desc, col("key_a"), col("key_b"))
        .limit(k))
    } finally { wts.unpersist(); () }
  }

  /** BPE pair counting — the inner loop of byte-pair-encoding tokenizer
    * training at corpus scale: count adjacent character pairs inside
    * whitespace words, return the `k` most frequent (count desc, pair
    * asc — the deterministic merge-candidate ranking). One narrow
    * explode + ONE partial/final aggregate over 2-char keys; at 100 TB
    * the pair vocabulary is tiny (≤ alphabet²), so the map-side combine
    * collapses almost everything before the exchange. A full BPE
    * trainer is this op iterated with a merge applied between rounds.
    */
  def bpePairCounts(df: DataFrame, text: Column, k: Int): DataFrame = {
    val words = df.select(explode(split(text, "\\s+")).as("w"))
      .filter(length(col("w")) > 1)
    words
      .withColumn("i", explode(sequence(lit(1), length(col("w")) - 1)))
      .select(col("w").substr(col("i"), lit(2)).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(k)
  }

  /** BPE TRAINING — [[bpePairCounts]] iterated with the winning merge
    * applied between rounds: the loop that actually learns a tokenizer
    * merge table (Sennrich et al., ACL'16). Returns the ordered merge
    * list (merge_no, lhs, rhs, cnt, merged).
    *
    * Corpus representation: the word-frequency table (the standard BPE
    * trainer state — vocabulary-sized, NOT corpus-sized, so at 100 TB
    * the per-round work is over distinct words weighted by freq), each
    * word a space-delimited symbol string with sentinel spaces
    * (" l o w e r "). A round is (1) adjacent-pair count weighted by
    * word freq — one partial/final aggregate over a tiny pair
    * vocabulary; (2) argmax (cnt desc, lhs asc, rhs asc — fully
    * deterministic); (3) merge apply: TWO literal `replace` passes of
    * " lhs rhs " → " lhsrhs ". Each leftmost non-overlapping pass
    * consumes the shared delimiter space of the NEXT occurrence, so
    * one pass merges alternate occurrences of a run; the second pass
    * reaches the occurrences the first blocked whenever lhs ≠ rhs
    * (two adjacent blocked occurrences cannot survive pass 1 —
    * PropertySpec's symbol-level model proves the semantics). The
    * CONTRACT is that two-pass fixpoint, which for lhs = rhs runs of
    * ≥ 5 merges alternate occurrences and therefore DIFFERS from
    * greedy left-to-right (Sennrich-style) segmentation — six b's
    * yield [bb, b, bb, b], not [bb, bb, bb] — so the learned table
    * can diverge from canonical BPE on highly repetitive text.
    * Engine/oracle parity is unaffected: both sides run the identical
    * two passes. Literal replace, not regex: symbols come from
    * document text and may contain regex metacharacters; both
    * engines' literal replace scans leftmost non-overlapping, so the
    * oracle (chained CTEs, same two passes) is exact.
    *
    * Each round's symbol table is checkpointed (the plan would
    * otherwise double per round — the merge references the table the
    * pair count also reads) and released one round behind, per the
    * [[Eager.tracked]] discipline; the 1-row winning-pair frames are
    * checkpointed for the final union and freed by the terminal.
    */
  /** Shared BPE round loop: returns (per-round winner frames, final
    * symbol table, winner release handles, final-table release handle).
    * Winners and per-round tables are checkpointed ([[Eager.tracked]]);
    * intermediate tables release one round behind; the CALLER owns the
    * final table's and the winners' handles.
    */
  private def bpeLoop(df: DataFrame, text: Column, merges: Int)
      : (Seq[DataFrame], DataFrame, Seq[() => Unit], () => Unit) = {
    val words = df
      .select(explode(split(text, "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // per-codepoint split via substr (mirrors the oracle's substr loop
    // exactly; Java split("") walks UTF-16 units, which would diverge on
    // astral-plane text)
    var syms = words.select(col("freq"),
      concat(lit(" "),
        concat_ws(" ", transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1)))),
        lit(" ")).as("s"))
    var relPrev: () => Unit = () => ()
    val bestRels = Seq.newBuilder[() => Unit]
    val steps = (1 to merges).map { step =>
      val pairs = syms
        .select(col("freq"), split(trim(col("s")), " ").as("sy"))
        .filter(size(col("sy")) >= 2)
        .withColumn("i", explode(sequence(lit(1), size(col("sy")) - 1)))
        .select(element_at(col("sy"), col("i")).as("lhs"),
          element_at(col("sy"), col("i") + 1).as("rhs"), col("freq"))
        .groupBy("lhs", "rhs").agg(sum(col("freq")).as("cnt"))
      val (best, bestRel) = Eager.tracked(
        pairs.orderBy(col("cnt").desc, col("lhs"), col("rhs")).limit(1))
      bestRels += bestRel
      val pat = concat(lit(" "), col("lhs"), lit(" "), col("rhs"), lit(" "))
      val rep = concat(lit(" "), col("lhs"), col("rhs"), lit(" "))
      val (ck, rel) = Eager.tracked(
        syms.crossJoin(broadcast(best.select("lhs", "rhs")))
          .select(col("freq"),
            replace(replace(col("s"), pat, rep), pat, rep).as("s")))
      relPrev(); relPrev = rel
      syms = ck
      best.select(lit(step).as("merge_no"), col("lhs"), col("rhs"),
        col("cnt"), concat(col("lhs"), col("rhs")).as("merged"))
    }
    (steps, syms, bestRels.result(), relPrev)
  }

  def bpeTrain(df: DataFrame, text: Column, merges: Int): DataFrame = {
    require(merges >= 1, s"bpeTrain: merges must be ≥ 1, got $merges")
    val bc0 = Eager.broadcastSnapshot(df.sparkSession)
    val (steps, _, bestRels, lastSymsRel) = bpeLoop(df, text, merges)
    // the last symbol table feeds nothing downstream — the result is the
    // union of the (checkpointed) per-round winners
    lastSymsRel()
    val out = Eager.terminalReleasing(steps.reduce(_ unionByName _), bestRels: _*)
    // each round broadcast its 1-row winner into the merge-apply join
    Eager.releaseBroadcastsSince(df.sparkSession, bc0)
    out
  }

  /** The ENCODE side of the learned tokenizer: apply the `merges`
    * learned by [[bpeTrain]] (same loop, same corpus) and emit the
    * resulting token vocabulary — (token, cnt = corpus occurrences,
    * n_words = distinct words containing it). This is the vocabulary
    * file a tokenizer ships next to its merge table, and the
    * compression audit (Σ cnt shrinks as merges land). Costs the same
    * k rounds as training plus one explode + aggregate over the final
    * symbol table.
    */
  def bpeVocab(df: DataFrame, text: Column, merges: Int): DataFrame = {
    require(merges >= 1, s"bpeVocab: merges must be ≥ 1, got $merges")
    val bc0 = Eager.broadcastSnapshot(df.sparkSession)
    val (_, syms, bestRels, lastSymsRel) = bpeLoop(df, text, merges)
    val vocab = syms
      .select(col("freq"), explode(split(trim(col("s")), " ")).as("token"))
      .groupBy("token")
      .agg(sum(col("freq")).as("cnt"), count(lit(1)).as("n_words"))
    val out = Eager.terminalReleasing(vocab, bestRels :+ lastSymsRel: _*)
    Eager.releaseBroadcastsSince(df.sparkSession, bc0)
    out
  }

  /** Rabin-Karp rolling-hash fingerprint: polynomial hash
    * h = ((c₁·B + c₂)·B + …) mod M over each char n-gram, doc
    * fingerprint = the `take` smallest hashes. Unlike [[fingerprint]]
    * (md5-based), the hash is pure integer arithmetic — the form a
    * streaming tokenizer would maintain incrementally. B=257,
    * M=1e9+7; intermediate values stay ≤ M·B+255 < 2⁶³ with a mod per
    * step, so bigint math is exact on every engine.
    */
  def rollingFingerprint(df: DataFrame, key: Column, text: Column, n: Int, take: Int): DataFrame = {
    val B = 257L
    val M = 1000000007L
    val sh = NearDup.shingles(df, key, text, n)
    val h = (1 to n).foldLeft(lit(0L)) { (acc, j) =>
      (acc * B + ascii(substring(col("shingle"), j, 1))) % M
    }
    sh.withColumn("h", h)
      .groupBy("key")
      .agg(slice(array_sort(collect_list(col("h"))), 1, take).as("fp"))
      .select(col("key"),
        concat_ws(":", transform(col("fp"), _.cast("string"))).as("fingerprint"))
  }

  def fingerprint(df: DataFrame, key: Column, text: Column, n: Int, take: Int): DataFrame =
    // single aggregation (no window pass): collect the doc's shingle
    // hashes, sort, keep the `take` smallest. Group size is bounded by
    // doc length, so the per-group array is safe at any corpus scale.
    NearDup.shingles(df, key, text, n)
      .withColumn("h", md5(col("shingle")))
      .groupBy("key")
      .agg(concat_ws("",
        slice(array_sort(collect_list(col("h"))), 1, take)).as("fingerprint"))

  /** Token-level Shannon entropy per document — the information-density
    * quality signal (low entropy ⇒ repetitive/templated text; pairs with
    * [[repetitionStats]]). H = ln(n) − (Σ c·ln c)/n over word counts —
    * the algebraic form that needs ONE ln per distinct word instead of
    * a probability column (same value, fewer transcendental sites for
    * cross-engine ulp to creep in). One explode + two partial/final
    * aggregates; group sizes bounded by doc vocabulary.
    */
  def tokenEntropy(df: DataFrame, key: Column, text: Column): DataFrame =
    df.select(key.as("key"),
        explode(filter(split(lower(text), "\\s+"), t => t =!= "")).as("w"))
      .groupBy("key", "w").agg(count(lit(1)).as("c"))
      .groupBy("key")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        round(
          log(sum(col("c")).cast("double")) -
            sum((col("c").cast("double") * log(col("c").cast("double")))
              .cast("decimal(38,12)")).cast("double") /
              sum(col("c")).cast("double"), 9).as("entropy"))

  /** Vocabulary tokenization — the id-mapping step of a training-data
    * pipeline: build a top-`vocabSize` word vocabulary from the corpus
    * itself (rank by count desc, word asc — deterministic), then encode
    * every document as its id sequence; out-of-vocabulary words map to
    * -1 (the UNK id). Returns (key, n_tokens, n_oov, ids) with `ids`
    * space-joined (portable compare form).
    *
    * Scale shape: the vocabulary is ONE aggregate + one row_number
    * window over a vocabulary-sized frame (bounded by distinct words,
    * not corpus size — the single-partition rank is safe for any real
    * vocab) broadcast to a left join against the token stream; encoding
    * is a per-doc aggregate whose group size is the doc length. The
    * token order survives via posexplode → array_sort(struct(pos, id)).
    */
  def tokenize(df: DataFrame, key: Column, text: Column,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"tokenize: vocabSize must be positive, got $vocabSize")
    val words = df.select(key.as("key"),
        posexplode(filter(split(lower(text), "\\s+"), t => t =!= "")))
      .toDF("key", "pos", "w")
    val vocab = words.groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("id",
        row_number().over(Window.orderBy(col("cnt").desc, col("w"))) - 1)
      .filter(col("id") < vocabSize)
      .select("w", "id")
    words.join(broadcast(vocab), Seq("w"), "left")
      .withColumn("id", coalesce(col("id"), lit(-1)))
      .groupBy("key")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("id") === -1, 1L).otherwise(0L)).as("n_oov"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("id")))),
            s => s.getField("id").cast("string"))).as("ids"))
  }

  /** BM25 keyword retrieval — rank documents against a fixed query-term
    * set with the standard Okapi BM25 scoring (idf · tf·(k₁+1) /
    * (tf + k₁·(1−b+b·dl/avgdl))), idf in the "+1" form that keeps
    * scores positive.
    *
    * Scale shape: the term stream is filtered to the QUERY TERMS before
    * any shuffle (a scan-side `isin` prune — at 100 TB only matching
    * tokens leave the map side), document-frequency and corpus stats
    * (N, Σdl) are tiny aggregates carried as broadcast frames (no
    * mid-plan driver action), and the final cut is orderBy+limit —
    * TakeOrderedAndProject, no global sort. Ranking sorts the ROUNDED
    * score (round 9 absorbs cross-engine ln() ulp; ties break by key).
    */
  def bm25TopK(df: DataFrame, key: Column, text: Column,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: queryTerms must be non-empty")
    val toks = df.select(key.as("key"),
      filter(split(lower(text), "\\s+"), t => t =!= "").as("w"))
    // corpus stats are a single partial/final agg over the token arrays —
    // no per-doc shuffle; the doc length rides THROUGH the tf shuffle
    // (max(dl) below — constant per key) instead of a separate length
    // table joined on key, which at corpus scale would be a second
    // full-width exchange.
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(size(col("w")).cast("long")).as("sdl"))
    val tf = toks.select(col("key"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("key", "term").agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // dfreq here IS broadcast-safe, unlike the tf-idf operators above:
    // tf was already filtered to `queryTerms`, so dfreq has at most
    // |queryTerms| rows — bounded by the query, not the vocabulary
    val scored = tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("sdl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0)))
      .withColumn("s",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
    scored.groupBy("key")
      .agg(round(sum(col("s").cast("decimal(38,12)")).cast("double"), 9).as("bm25"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("bm25").desc, col("key"))
      .limit(k)
  }

  /** Corpus bigram-LM fluency score — the CCNet/KenLM-style filter pass
    * of a curation pipeline, self-trained on the corpus it scores: a
    * document's score is the mean conditional probability
    * p(w₂|w₁) = c(w₁,w₂)/c(w₁) of its word bigrams under the corpus
    * bigram counts. Gibberish (bigrams the corpus has never or rarely
    * seen in that context) scores low; formulaic text scores high.
    * Unlike [[repetitionStats]]/[[qualityScore]] (pure per-doc
    * signals), this is a CROSS-document statistic.
    *
    * Oracle parity: each p is one IEEE double division of two exact
    * counts (identical in any engine); the mean is the exact-decimal-
    * sum-then-one-division pattern, rounded to 9 digits. No
    * transcendentals (a log-likelihood variant would hit libm ULP
    * divergence across engines; the mean-probability form ranks
    * fluency the same way without it).
    *
    * Scale: token bigrams are a narrow explode; counts are two
    * partial/final aggregates (bigram key, then context key); scoring
    * re-joins the bigram stream to the count tables on those same keys
    * — hash joins, AQE-broadcastable when the vocabulary is small —
    * and one per-doc aggregate. No windows, no driver state; the count
    * tables are plain aggregates, precomputable and reusable across
    * scoring runs.
    *
    * Returns (key, n_bigrams, lm_score) for docs with ≥ 1 bigram.
    */
  def bigramLmScore(df: DataFrame, key: Column, text: Column): DataFrame = {
    val toks = df.select(key.as("key"), split(lower(text), "\\s+").as("w"))
      .filter(size(col("w")) >= 2)
    val bg = toks
      .select(col("key"),
        explode(sequence(lit(1), size(col("w")) - 1)).as("i"), col("w"))
      .select(col("key"),
        element_at(col("w"), col("i")).as("w1"),
        element_at(col("w"), col("i") + 1).as("w2"))
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
    bg.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .withColumn("p", col("c2").cast("double") / col("c1").cast("double"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("p").cast("decimal(38,12)")).cast("double") /
          count(lit(1)).cast("double"), 9).as("lm_score"))
  }

  /** Inverted index build — term → (document frequency, sorted posting
    * list), the retrieval-side artifact next to [[bm25TopK]]'s scoring.
    * One explode + (term, doc) distinct + one aggregate on the term; the
    * posting list is sorted INSIDE the row (sort_array of the collected
    * keys) so output is deterministic under any partitioning, and it is
    * serialized as a comma-joined string — the packed form an index
    * shard stores, and the form an exact-compare oracle can replay.
    * Posting lists are truncated to the first `maxPostings` doc ids (the
    * index-shard cap that keeps a stopword-range term from storing a
    * corpus-sized row); `df` stays the TRUE document frequency, counted
    * before the truncation. The truncation happens BEFORE any
    * collect_list — rank and df come from two window functions over the
    * same term partitioning (one sort, no extra exchange, and window
    * sorts SPILL — an over-cap term costs disk, not heap), so no
    * aggregation buffer ever holds more than `maxPostings` entries; a
    * collect-then-slice would OOM on exactly the stopword terms the cap
    * exists for.
    *
    * Returns (term, df, postings).
    */
  def invertedIndex(df: DataFrame, key: Column, text: Column,
      maxPostings: Int): DataFrame = {
    require(maxPostings > 0,
      s"invertedIndex: maxPostings must be > 0, got $maxPostings")
    val w = Window.partitionBy("term")
    df.select(key.as("doc"), explode(split(lower(text), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .distinct()
      .withColumn("rn", row_number().over(w.orderBy("doc")))
      .withColumn("df", count(lit(1)).over(w))
      .filter(col("rn") <= maxPostings)
      .groupBy("term", "df")
      .agg(array_join(transform(sort_array(collect_list(col("doc"))),
        _.cast("string")), ",").as("postings"))
      .select(col("term"), col("df"), col("postings"))
  }

  /** Collocation mining by pointwise mutual information over adjacent
    * token pairs: PMI(w1,w2) = ln(P(w1,w2)) − ln(P(w1)) − ln(P(w2)),
    * bigram probability over the bigram total, unigram probabilities
    * over the token total. High-PMI pairs are multiword expressions
    * ("new york") — what a tokenizer-training or phrase-vocab pass
    * mines. Three aggregates (bigram counts, unigram counts, two scalar
    * totals broadcast as literals-by-crossJoin) + two joins of the
    * bigram table against the unigram table; `minCount` prunes the
    * bigram table BEFORE the joins, so the join input is the filtered
    * vocabulary, not the token stream. The PMI is a fixed sequence of
    * double ops (three ln's of single divisions, two subtractions) —
    * the order an SQL engine replays bit-identically; rounded to 9.
    *
    * Returns (w1, w2, c2, pmi) for bigrams with count ≥ minCount.
    */
  def pmiCollocations(df: DataFrame, text: Column,
      minCount: Long): DataFrame = {
    val uni = df.select(explode(split(lower(text), "\\s+")).as("w1"))
      .filter(col("w1") =!= "")
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val nTok = uni.agg(sum(col("c1")).as("n_tok"))
    val bg = df.select(split(lower(text), "\\s+").as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(sequence(lit(1), size(col("w")) - 1)).as("i"), col("w"))
      .select(element_at(col("w"), col("i")).as("w1"),
        element_at(col("w"), col("i") + 1).as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= minCount)
    val nBg = bg.agg(count(lit(1)).as("n_bg"))
    c2.join(uni, Seq("w1"))
      .join(uni.select(col("w1").as("w2"), col("c1").as("c1b")), Seq("w2"))
      .crossJoin(broadcast(nBg)).crossJoin(broadcast(nTok))
      .select(col("w1"), col("w2"), col("c2"),
        round(
          log(col("c2").cast("double") / col("n_bg").cast("double")) -
          log(col("c1").cast("double") / col("n_tok").cast("double")) -
          log(col("c1b").cast("double") / col("n_tok").cast("double")),
          9).as("pmi"))
  }

  /** Zipf-slope corpus-health fit — the token-frequency power-law
    * diagnostic a curation pipeline tracks per language slice: OLS
    * slope of ln(freq) on ln(rank) over the top-`topK` tokens (natural
    * text sits near −1; templated/spam slices flatten, truncated
    * vocabularies steepen). Rank is total-ordered (count desc, token
    * asc) so every engine ranks identically.
    *
    * Determinism contract (the [[bigramLmScore]] family's): ln() may
    * differ by 1 ulp across engines, so x = ln(rank) and y = ln(count)
    * are rounded to 12 dp BEFORE the moment sums, the sums accumulate
    * as wide decimals (exact), and only the final slope expression runs
    * in double, rounded to 6 dp.
    *
    * Plan shape at 100 TB: token counts are one partial/final
    * aggregate; the rank window runs over the per-language VOCABULARY
    * (≪ corpus, spills if not) and is cut to `topK` immediately; the
    * moment sums are a second aggregate over langs × topK rows — the
    * corpus-sized token stream is touched exactly once.
    *
    * Returns (grp, n_top, zipf_slope).
    */
  def zipfSlope(df: DataFrame, group: Column, text: Column,
      topK: Int): DataFrame = {
    require(topK >= 2, s"zipfSlope: topK must be ≥ 2, got $topK")
    zipfFitFromCounts(zipfTokenCounts(df, group, text), topK)
  }

  /** Per-(group, token) frequency table — the maintained artifact of
    * [[zipfSlopeIncremental]] and the first stage of [[zipfSlope]]. */
  def zipfTokenCounts(df: DataFrame, group: Column, text: Column): DataFrame =
    df.select(group.as("grp"),
        explode(split(lower(text), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("grp", "tok").agg(count(lit(1)).as("c"))

  /** The OLS fit over a (grp, tok, c) count table — shared by the cold
    * and incremental paths, so their equality is structural. */
  private def zipfFitFromCounts(cnt: DataFrame, topK: Int): DataFrame = {
    val w = Window.partitionBy("grp").orderBy(col("c").desc, col("tok"))
    val top = cnt.withColumn("r", row_number().over(w)).filter(col("r") <= topK)
      .select(col("grp"),
        round(log(col("r").cast("double")), 12).as("x"),
        round(log(col("c").cast("double")), 12).as("y"))
    // a 1-token group has no spread to fit (0/0 slope) — drop it
    // rather than emit NaN; mirrored by the oracle's HAVING
    top.groupBy("grp")
      .agg(count(lit(1)).as("n_top"),
        sum(col("x").cast("decimal(38,12)")).as("sx"),
        sum(col("y").cast("decimal(38,12)")).as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,24)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,24)")).as("sxx"))
      .select(col("grp"), col("n_top"),
        round(
          (col("n_top").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
          (col("n_top").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")),
          6).as("zipf_slope"))
      .filter(col("n_top") >= 2)
  }

  /** Incremental Zipf maintenance — the crawl-loop shape for corpus
    * vocabulary statistics: token counts are ADDITIVE under append-only
    * ingest, so the maintained per-(group, token) count table absorbs
    * each batch and the top-K fit is recomputed from the MAINTAINED
    * table — vocabulary-sized, never corpus-sized. Equality with the
    * cold [[zipfSlope]] over the concatenated batches is exact (integer
    * additivity; both paths share [[zipfFitFromCounts]] down to the
    * rounding grain), which is why the DuckDB oracle is literally the
    * cold one — the same contract as the incremental clustering/
    * PageRank family.
    *
    * The maintained table lives in a [[graft.streaming.BucketedTable]]
    * at `root`, hash-bucketed on an injective (group, token) composite
    * key (round-12 verdict #2: the previous in-memory fold full-outer-
    * merged and checkpointed the ENTIRE vocab table per batch —
    * O(vocab) per ingest, not O(delta)). Per batch the cost is now
    * delta-scaled: the batch's own (map-side partially aggregated)
    * counts name their affected buckets (≤ nBuckets ints of
    * orchestration metadata), ONLY those buckets' stored rows are read
    * (file-level pruning — untouched buckets' files are never opened),
    * the merge exchanges affected-bucket-sized frames, and the commit
    * rewrites only the claimed buckets (merge-on-read versioning,
    * auto-compacted). A batch touching 1 of `nBuckets` buckets reads
    * and writes ~1/`nBuckets` of the vocab table — the sparse-batch
    * ratio BENCH_NOTES records, the `q_stream_incr_rollup` pattern.
    *
    * Plan shape at 100 TB: each batch's text is read ONCE (its own
    * batch, not the corpus); `nBuckets` grows with the vocabulary so a
    * bucket stays a bounded rewrite unit; the final fit reads the
    * bucket union (vocab-sized) once.
    */
  def zipfSlopeIncremental(batches: Seq[DataFrame], group: Column,
      text: Column, topK: Int, root: String,
      nBuckets: Int = graft.streaming.BucketedTable.defaultBuckets): DataFrame = {
    require(topK >= 2, s"zipfSlopeIncremental: topK must be ≥ 2, got $topK")
    val spark = batches.head.sparkSession
    val snap = zipfMaintainVocab(batches, group, text, root, nBuckets)
    Eager.terminal(zipfFitFromCounts(
      graft.streaming.BucketedTable.current(spark, root, snap, "__k", nBuckets)
        .select("grp", "tok", "c"), topK))
  }

  /** The fit over the maintained vocab table AS OF `maxVersion` —
    * with no seeded base, batch b's commit is version b, so
    * "the vocabulary after batch k" is a plain BucketedTable
    * `currentAsOf` read (the q_ivm_time_travel primitive applied to
    * corpus statistics: reproduce the Zipf drift signal exactly as it
    * stood at any historical ingest point). `sample` supplies only the
    * table schema (limit-0 projection — no data read). */
  def zipfSlopeAsOf(sample: DataFrame, group: Column, text: Column,
      topK: Int, root: String, maxVersion: Long,
      nBuckets: Int = graft.streaming.BucketedTable.defaultBuckets): DataFrame = {
    require(topK >= 2, s"zipfSlopeAsOf: topK must be ≥ 2, got $topK")
    val snap = zipfVocabKey(zipfTokenCounts(sample, group, text)).limit(0)
    Eager.terminal(zipfFitFromCounts(
      graft.streaming.BucketedTable.currentAsOf(sample.sparkSession, root,
          snap, "__k", maxVersion, nBuckets)
        .select("grp", "tok", "c"), topK))
  }

  /** The maintenance loop of [[zipfSlopeIncremental]], factored out so
    * the version tree can be materialized once as an `_OK`-gated
    * artifact and read at historical versions ([[zipfSlopeAsOf]]).
    * Returns the schema-only snapshot frame reads need. */
  def zipfMaintainVocab(batches: Seq[DataFrame], group: Column,
      text: Column, root: String,
      nBuckets: Int = graft.streaming.BucketedTable.defaultBuckets): DataFrame = {
    require(batches.nonEmpty, "zipfMaintainVocab: need ≥ 1 batch")
    import graft.streaming.BucketedTable
    val spark = batches.head.sparkSession
    // schema-only frame: unclaimed buckets fall through to an EMPTY
    // base (the table starts empty; every row arrives via commits)
    val snap = zipfVocabKey(zipfTokenCounts(batches.head, group, text)).limit(0)
    batches.foreach { b =>
      val (delta, relD) =
        Eager.tracked(zipfVocabKey(zipfTokenCounts(b, group, text)))
      try {
        val ids = BucketedTable.bucketIds(delta, "__k", nBuckets)
        // an empty batch claims nothing — no version, no read, no write
        if (ids.nonEmpty) {
          val cur = BucketedTable.currentBuckets(spark, root, snap, "__k",
            ids, nBuckets)
          val s = cur.select(col("__k").as("k_s"), col("grp").as("g_s"),
            col("tok").as("t_s"), col("c").as("c_s"))
          val d = delta.select(col("__k").as("k_d"), col("grp").as("g_d"),
            col("tok").as("t_d"), col("c").as("c_d"))
          // join on the injective key — (grp, tok) equality by
          // construction, null-group rows land on one output row
          val merged = s.join(d, col("k_s") === col("k_d"), "full_outer")
            .select(coalesce(col("g_s"), col("g_d")).as("grp"),
              coalesce(col("t_s"), col("t_d")).as("tok"),
              (coalesce(col("c_s"), lit(0L)) + coalesce(col("c_d"), lit(0L)))
                .as("c"),
              coalesce(col("k_s"), col("k_d")).as("__k"))
          BucketedTable.commitNext(root, merged, ids, "__k", nBuckets)
          ()
        }
      } finally { relD(); () }
    }
    snap
  }

  /** Injective composite bucket key over (grp, tok): a null group
    * encodes as "0", non-null as "1" + LENGTH-PREFIXED grp — the
    * length prefix makes the key injective for ALL string groups
    * (round-13 ADVICE: a bare separator collides when grp itself
    * contains it: ("ab", "c") vs ("a", "bc")); concat_ws's null-skip
    * would collide ("" + tok vs null + tok), this cannot. */
  private[graft] def zipfVocabKey(df: DataFrame): DataFrame = {
    val g = col("grp").cast("string")
    df.withColumn("__k",
      concat(when(col("grp").isNull, lit("0"))
          .otherwise(concat(lit("1"), length(g).cast("string"), lit(":"), g)),
        lit("\u0001"), col("tok")))
  }

  /** CCNet head/middle/tail bucketing — the published CCNet move that
    * turns the corpus-LM fluency score ([[bigramLmScore]], the KenLM
    * stand-in) into per-language quality terciles: per language, docs
    * above the ⅔ score quantile are `head`, above ⅓ `middle`, else
    * `tail`. Cutoffs are per-language exact ⅓/⅔ quantiles (linear
    * interpolation); ties on a cutoff fall to the LOWER bucket (strict
    * `>`), so boundary docs land identically on every engine — the
    * interpolated cutoff either equals a score (tie rule decides) or
    * lies strictly inside a gap no score occupies.
    *
    * Plan shape at 100 TB: scoring is [[bigramLmScore]]'s aggregates;
    * the cutoff frame is one per-language aggregate broadcast back over
    * the doc-sized score frame. No per-language global sort, no
    * single-partition window — the ntile() formulation would serialize
    * each language onto one task.
    *
    * Cutoffs are exact interpolated quantiles by default (oracle
    * parity). `approxAccuracy > 0` switches the cutoff aggregate to
    * `approx_percentile` (GK sketch, mergeable bounded-size summaries)
    * — the corpus-scale dial, where the exact `percentile` must
    * assemble each language's full score multiset and the tercile
    * boundary does not need 15 digits. The sketch's documented
    * guarantee is RANK error ≤ n/accuracy per cutoff, so bucket
    * assignment agrees with exact except for docs whose score rank
    * lies within that band of a boundary (spec-bounded in
    * CorpusHealthSpec; flag documented in docs/SCALE.md).
    *
    * Returns (key, grp, lm_score, bucket).
    */
  def ccnetBuckets(df: DataFrame, key: Column, group: Column,
      text: Column, approxAccuracy: Int = 0): DataFrame = {
    val scored = bigramLmScore(df, key, text)
      .join(df.select(key.as("key"), group.as("grp")), Seq("key"))
    val cuts =
      if (approxAccuracy > 0)
        scored.groupBy("grp").agg(
          expr(s"approx_percentile(lm_score, ${1.0 / 3}, $approxAccuracy)")
            .as("c1"),
          expr(s"approx_percentile(lm_score, ${2.0 / 3}, $approxAccuracy)")
            .as("c2"))
      else
        scored.groupBy("grp").agg(
          percentile(col("lm_score"), lit(1.0 / 3)).as("c1"),
          percentile(col("lm_score"), lit(2.0 / 3)).as("c2"))
    scored.join(broadcast(cuts), Seq("grp"))
      .select(col("key"), col("grp"), col("lm_score"),
        when(col("lm_score") > col("c2"), lit("head"))
          .when(col("lm_score") > col("c1"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}
