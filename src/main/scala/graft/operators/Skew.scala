package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (builder prompt: "skewed keys → salting or
  * AQE skew-join"). AQE's runtime skew split covers joins; these helpers
  * cover aggregations with pathological hot keys, where the classic fix
  * is two-stage salted aggregation.
  */
object Skew {

  /** Two-stage salted aggregation for algebraic aggregates: stage 1
    * groups on (key, salt) so a hot key spreads over `nSalts` reducers;
    * stage 2 merges partials per key. `saltFrom` must be a deterministic
    * column (NOT rand() — replays and retries must agree); any
    * well-distributed column of the row works.
    *
    * sum/count merge by sum; min/max merge by min/max.
    */
  def saltedAgg(
      df: DataFrame, keys: Seq[Column], saltFrom: Column, nSalts: Int,
      sums: Map[String, Column] = Map.empty,
      counts: Boolean = true): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltFrom), lit(nSalts)))
    val stage1Aggs =
      sums.map { case (n, c) => sum(c).as(s"__s_$n") }.toSeq ++
        (if (counts) Seq(count(lit(1)).as("__s_n")) else Nil)
    val stage1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(stage1Aggs.head, stage1Aggs.tail: _*)
    val stage2Aggs =
      sums.keys.map(n => sum(col(s"__s_$n")).as(n)).toSeq ++
        (if (counts) Seq(sum(col("__s_n")).as("n")) else Nil)
    stage1.groupBy(keys: _*).agg(stage2Aggs.head, stage2Aggs.tail: _*)
  }

  /** Salted equi-join for a skewed fact side joining a dim too large to
    * broadcast: the fact side gets `__salt = hash(saltFrom) % nSalts` so
    * a hot key's rows spread over `nSalts` reducers, and the dim side is
    * replicated once per salt value (`explode` of a literal array — a
    * narrow nSalts× fan-out of the SMALL side only), then the join runs
    * on (key, salt). Inner-join results are identical to the unsalted
    * join; the win is that no single reducer receives all rows of a hot
    * key. `saltFrom` must be deterministic (not rand()) so task retries
    * and speculative duplicates agree.
    *
    * At 100 TB this is the manual fallback when AQE's runtime skew split
    * (spark.sql.adaptive.skewJoin) can't help — e.g. the skew is in the
    * *aggregation* feeding the join, or the join is bucketed so AQE
    * can't re-split. The reference's analogue is its fixed uniform 4-way
    * `np.array_split` fan-out (extraction.py:68), which has no answer to
    * hot keys at all.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFrom: Column, nSalts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(hash(saltFrom), lit(nSalts)))
    val saltedDim = dim.withColumn(
      "__salt", explode(array((0 until nSalts).map(lit(_)): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
