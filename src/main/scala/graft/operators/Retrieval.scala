package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval operators — the fusion layer a RAG / training-data
  * retrieval pipeline runs ON TOP of the lexical ([[TextAnalysis.bm25TopK]])
  * and dense ([[Similarity.cosineTopK]]) rankers this engine already has.
  *
  * Determinism policy matches the similarity family: per-list RRF terms
  * are exact decimals (1/(k+rank) rounded to a fixed scale before the
  * sum), so Spark's partial/final aggregation order cannot perturb the
  * fused score vs a single-node engine, and ties break on the key.
  */
object Retrieval {

  /** Reciprocal Rank Fusion (Cormack/Clarke/Buettcher, SIGIR'09):
    * fused(d) = Σ_lists 1/(k + rank_d). The standard hybrid-search
    * combiner — rank-based, so it needs NO score calibration between
    * BM25-scale and cosine-scale lists, which is exactly why it is the
    * default fuser in production hybrid retrieval.
    *
    * `rankings` are (key, rnk) frames (rnk 1-based within each list;
    * a key absent from a list contributes nothing). Each term is
    * FIXED-POINT: ⌊10¹² / (k + rnk)⌋ — exact integer arithmetic with
    * identical results on every engine (no decimal-division scale
    * rules, no double-sum ordering), summed exactly as longs; the
    * fused score surfaces as sum/10¹² (sum < 2⁵³, so the cast and one
    * division are exact-then-rounded IEEE ops) next to `n_lists` (how
    * many lists carried the key — the agreement signal a fusion audit
    * wants).
    *
    * Scale shape: one union (narrow — each list is already top-N
    * sized) + one hash aggregate on the key. Never touches the corpus.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: at least one ranking required")
    require(k >= 1, s"rrfFuse: k must be >= 1, got $k")
    val tagged = rankings.map(_.selectExpr("key",
      s"1000000000000 DIV ($k + rnk) AS term"))
    tagged.reduce(_ unionByName _)
      .groupBy("key")
      .agg(count(lit(1)).cast("int").as("n_lists"),
        round(sum(col("term")).cast("double") / lit(1e12), 8).as("rrf"))
  }

  /** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    * SIGIR'98): greedily pick argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d,s)
    * `k` times — the diversity pass between retrieval and a context
    * window, so near-duplicate passages don't crowd out coverage.
    *
    * `cands` carries (key, rel, vec); `rel` is the upstream retrieval
    * score (already deterministic), sim is exact decimal cosine
    * ([[Similarity]] policy). Greedy selection is INHERENTLY
    * sequential, so `k` is fixed and small (a context window's worth)
    * and each step is one candidates×selected join (selected ≤ k rows,
    * broadcast) + one argmax — the oracle unrolls the same k steps as
    * chained CTEs. Candidates should be a top-N slice (N ≪ corpus),
    * which is the only regime MMR is used in anyway.
    *
    * Ties break (score desc, key asc), matching the oracle exactly.
    * Returns (key, pick, mmr, rel) — `pick` the 1-based selection
    * order, `mmr` the marginal score at selection time (the first
    * pick's penalty is a max over the empty selected set, i.e. 0, so
    * its marginal value is λ·rel).
    */
  def mmrRerank(cands: DataFrame, lambda: Double, k: Int): DataFrame = {
    require(lambda >= 0 && lambda <= 1,
      s"mmrRerank: lambda must be in [0,1], got $lambda")
    require(k >= 1, s"mmrRerank: k must be >= 1, got $k")
    val spark = cands.sparkSession
    Similarity.registerNative(spark)
    val bc0 = Eager.broadcastSnapshot(spark)
    // normalize once: the squared norm is all cosine needs beside the
    // decimal dot, and it rides every step's broadcast
    val (base, baseRel) = Eager.tracked(
      Similarity.withNorm2(cands, col("vec"))
        .select(col("key"), col("rel").cast("double").as("rel"), col("vec"),
          col("n2").cast("double").as("n2")))
    // `selected` carries (key, pick, mmr, rel, vec, n2) for the picks so
    // far — at most k rows, re-checkpointed per step (prior checkpoint
    // released one behind, the iterative-operator discipline)
    var selected: DataFrame = null
    var selRel: () => Unit = () => ()
    (1 to k).foreach { i =>
      val scored =
        if (selected == null)
          // max over the empty selected set is 0: the first pick is
          // plain relevance, reported at its λ-scaled marginal value
          base.select(col("key"), col("rel"),
            (lit(lambda) * col("rel")).as("mmr"))
        else
          base.join(selected.select(col("key")), Seq("key"), "left_anti")
            .crossJoin(broadcast(selected
              .select(col("vec").as("__sv"), col("n2").as("__sn2"))))
            .withColumn("__cos",
              Similarity.dotDecimal(col("vec"), col("__sv")).cast("double") /
                (sqrt(col("n2")) * sqrt(col("__sn2"))))
            .groupBy(col("key"), col("rel"))
            .agg(max(col("__cos")).as("__maxsim"))
            .select(col("key"), col("rel"),
              (lit(lambda) * col("rel") -
                lit(1.0 - lambda) * col("__maxsim")).as("mmr"))
      val next = scored
        .orderBy(col("mmr").desc, col("key")).limit(1)
        .select(col("key"), lit(i).as("pick"), col("mmr"), col("rel"))
        .join(base.select(col("key"), col("vec"), col("n2")), Seq("key"))
      val grown = if (selected == null) next else selected.unionByName(next)
      val (sck, srel) = Eager.tracked(grown)
      selRel(); selRel = srel
      selected = sck
    }
    val out = Eager.terminalReleasing(
      selected.select(col("key"), col("pick"),
        round(col("mmr"), 8).as("mmr"), round(col("rel"), 8).as("rel")),
      selRel, baseRel)
    Eager.releaseBroadcastsSince(spark, bc0)
    out
  }
}
