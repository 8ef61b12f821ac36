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

  /** Session-scoped registration of Spark's own bloom-filter expressions
    * under callable names (idempotent). `bloom_filter_agg` ships in the
    * FunctionRegistry but `might_contain` does not (both exist as
    * Catalyst expressions — they power AQE's injected runtime filters);
    * registering the pair makes the explicit bloom-prune pattern below
    * expressible without a UDF and keeps the probe inside whole-stage
    * codegen.
    */
  def registerBloom(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }

  /** Bloom-pruned semi-join — the MANUAL runtime-filter pattern for the
    * regime where the dim side is too large to broadcast as rows but its
    * bloom filter is a few hundred KB: aggregate the dim keys into one
    * bloom sketch (partial/final — each executor builds a local filter,
    * merge is bitwise-OR), broadcast the one-row sketch, drop fact rows
    * whose key cannot be in the dim map-side, then run the EXACT semi
    * join on the survivors. False positives cost nothing but a pass
    * through the verifying join; false negatives are impossible, so the
    * result equals the plain semi join row-for-row (the oracle).
    *
    * At 100 TB the win is shuffle volume: the semi join's exchange
    * carries only fact rows that probably match (a selective dim prunes
    * 90%+ map-side), while the sketch broadcast is constant-size however
    * wide the dim rows are. Spark's AQE injects this same filter
    * automatically ONLY when shuffle/scan heuristics line up; the
    * explicit operator is for when the planner's heuristics miss.
    */
  def bloomSemiJoin(fact: DataFrame, factKey: Column,
      dim: DataFrame, dimKey: Column,
      expectedItems: Long, numBits: Long): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
    registerBloom(fact.sparkSession)
    // might_contain requires its sketch side to be a constant or scalar
    // subquery (the shape AQE's InjectRuntimeFilter emits) — so the
    // one-row sketch aggregate rides as an uncorrelated scalar subquery,
    // planned once and broadcast to the probe side's filter.
    val sketch = dim.agg(
      call_function("graft_bloom_agg", xxhash64(dimKey),
        lit(expectedItems), lit(numBits)).as("__bf"))
    val cond = Bridge.column(
      BloomFilterMightContain(
        ScalarSubquery(sketch.queryExecution.analyzed),
        Bridge.expression(xxhash64(factKey))))
    fact.filter(cond)
      .join(dim.select(dimKey.as("__dk")).distinct(),
        factKey === col("__dk"), "left_semi")
  }
}
