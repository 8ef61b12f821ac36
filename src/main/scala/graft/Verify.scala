package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("graft.stream.shufflePartitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // broadcasts resident at session start are infrastructure; everything
    // above this baseline belongs to a completed query (sequential loop)
    val bcBaseline = graft.operators.Eager.broadcastSnapshot(spark)
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // Tripwire: the driver's oracle compare sorts rows with pandas,
        // which cannot hash array/map cells — a top-level ArrayType or
        // MapType output column crashes its compare (r7: q_cluster_reps).
        // Fail HERE, locally, so shape bugs never reach the driver:
        // string-join arrays (array_join/concat_ws + string_agg oracle).
        // Recursive (round-9 ADVICE): a StructType column — or a nested
        // array INSIDE a struct — reaches the pandas compare as an
        // unsortable cell just like a top-level array; flag the whole
        // non-scalar family at any nesting depth.
        def nonScalar(dt: org.apache.spark.sql.types.DataType): Boolean =
          dt match {
            case _: org.apache.spark.sql.types.ArrayType |
                 _: org.apache.spark.sql.types.MapType |
                 _: org.apache.spark.sql.types.StructType => true
            case _ => false
          }
        val bad = df.schema.fields.filter(f => nonScalar(f.dataType))
        require(bad.isEmpty, s"query $name emits non-scalar output " +
          s"column(s) ${bad.map(_.name).mkString(", ")} — string-join " +
          "them; the driver compare cannot sort array/map/struct cells")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally {
        spark.catalog.clearCache()
        // localCheckpoint blocks (terminal results, CC edge lists) are
        // invisible to clearCache; between queries nothing is
        // legitimately persisted, so drop every survivor by handle —
        // deterministic, unlike waiting for a GC to let the
        // ContextCleaner run (the round-6 bench-inflation root cause)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        // ...and broadcast blocks, the round-7 residual: one per
        // broadcast join, otherwise reclaimed only via GC+ContextCleaner
        graft.operators.Eager.releaseBroadcastsSince(spark, bcBaseline, force = true)
        // ...and shuffle state (round 9): map-output files + driver
        // ShuffleStatus from completed queries, same GC-latency story
        val sc = spark.sparkContext
        org.apache.spark.graft.Storage.shuffleIds(sc)
          .foreach(id =>
            org.apache.spark.graft.Storage.removeShuffle(sc, id, blocking = false))
        System.gc()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
