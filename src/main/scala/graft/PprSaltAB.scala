package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 verdict #4 A/B: does SALTING the PPR hub combine beat the
  * map-side partial aggregation that absorbs it today? q_ppr's graph
  * keeps 10k suppliers at every scale, so supplier in-degree grows ∝
  * data — the classic salted-aggregate candidate — but the per-round
  * dst-aggregate is algebraic (decimal sum), so Spark already combines
  * map-side and each reducer receives ≤ shufflePartitions partials per
  * hub, not the raw degree. This main measures both variants on the
  * exact q_ppr fixture at the given SF dir (env `SPARK_GRAFT_SF_DIR`),
  * `SPARK_GRAFT_AB_RUNS` timed runs each (default 3, median), salts
  * from `SPARK_GRAFT_AB_SALTS` (default "8,32"), and prints one JSON
  * line. Results land in BENCH_NOTES round 14; the production path
  * stays unsalted unless this says otherwise.
  */
object PprSaltAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_AB_RUNS", "3").toInt
    val salts = sys.env.getOrElse("SPARK_GRAFT_AB_SALTS", "8,32")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def table(n: String) = graft.sources.Sources.table(spark, sfDir, n)
    val e0 = table("lineitem").select(
      concat(lit("p:"), col("l_partkey")).as("src"),
      concat(lit("s:"), col("l_suppkey")).as("dst")).distinct()
    val edges = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))
    val seeds = table("part").filter(col("p_partkey") % 50 === 0)
      .select(concat(lit("p:"), col("p_partkey")).as("node"))

    def time(nSalts: Int): (Double, Long) = {
      var cnt = 0L
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val df =
          if (nSalts <= 1)
            graft.operators.Graph.personalizedPageRank(edges, seeds, 3, 0.85)
          else
            graft.operators.Graph.personalizedPageRankSalted(edges, seeds,
              3, 0.85, nSalts)
        cnt = df.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (ts(ts.length / 2), cnt)
    }
    // warm-up on the unsalted path (codegen/JIT out of the medians)
    time(0)
    val results = (Seq(0) ++ salts).map { s0 =>
      val (med, cnt) = time(s0)
      System.err.println(s"[ppr-ab] salts=$s0 median=${"%.2f".format(med)}s rows=$cnt")
      s""""salts_$s0":${math.rint(med * 1000) / 1000}"""
    }
    println(s"""{"ab":"ppr_salted_hub_combine","sf":"$sfDir","runs":$runs,${results.mkString(",")}}""")
    spark.stop()
  }
}
