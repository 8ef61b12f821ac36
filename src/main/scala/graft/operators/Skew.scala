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
}
