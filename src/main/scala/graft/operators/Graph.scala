package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph ranking over edge frames — the iterative-join compute family
  * next to [[NearDup.dedupClusters]]'s connected components. No driver-
  * side graph state: every round is a join + aggregate, so the operator
  * scales exactly like the shuffles it is made of.
  */
object Graph {

  /** Fixed-iteration PageRank over a directed edge frame (src, dst).
    *
    * r₀ = 1/N; rᵢ₊₁(v) = (1−d)/N + d·Σ_{u→v} rᵢ(u)/deg(u).
    *
    * Dangling nodes (no out-edges) are the CALLER's contract to avoid —
    * pass a symmetrized edge set (`u↔v`) for similarity/co-occurrence
    * graphs, which is also the natural form for them; nodes then always
    * redistribute their full mass and no dangling-mass correction term
    * is needed.
    *
    * Determinism for the oracle: per-round contribution sums are cast to
    * decimal(38,12) (order-independent addition — Spark's partial/final
    * aggregation order cannot perturb the sum vs a single-node engine);
    * everything else is a fixed IEEE op sequence on identical doubles.
    * A fixed iteration count (rather than an epsilon test) keeps the
    * plan static and the oracle expressible as chained CTEs.
    *
    * Scale shape: the degree-annotated edge frame is materialized ONCE
    * with localCheckpoint (NOT persist — a cached plan compiles without
    * AQE, turning every round's rank join into a static sort-merge; see
    * [[NearDup.dedupClusters]] for the measured 3.5× cost of that trap),
    * and each round's rank frame is localCheckpoint-ed too: it is
    * node-sized, so AQE then broadcasts it into the edge join and the
    * only real shuffle per round is the contribution aggregate on dst.
    * Without the per-round truncation the lazy plan nests every prior
    * round's joins and the exchanges stop being reusable. Rounds are
    * sequential barriers by nature of the algorithm; iteration count is
    * the dial (3-5 captures the ranking for most graphs).
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be ≥ 1, got $iters")
    require(damping > 0 && damping < 1,
      s"pageRank: damping must be in (0,1), got $damping")
    val ed = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("deg")), Seq("src"))
      .select(col("src"), col("dst"), col("deg"))
      .localCheckpoint()
    val nodes = ed.select(col("src").as("node")).distinct().localCheckpoint()
    val nn = nodes.agg(count(lit(1)).as("n"))
    val init = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("n").cast("double")).as("r"))
    (1 to iters).foldLeft(init) { (r, i) =>
      val m = ed
        .join(r.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum((col("r") / col("deg").cast("double")).cast("decimal(38,12)"))
          .cast("double").as("m"))
      val next = nodes.join(m, Seq("node"), "left").crossJoin(broadcast(nn))
        .select(col("node"),
          ((lit(1.0) - lit(damping)) / col("n").cast("double") +
            lit(damping) * coalesce(col("m"), lit(0.0))).as("r"))
      // the LAST round stays lazy: the caller's top-k/round/sort fuses
      // onto it instead of paying one more materialization barrier
      if (i == iters) next else next.localCheckpoint()
    }
  }
}
