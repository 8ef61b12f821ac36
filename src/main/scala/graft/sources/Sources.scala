package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Table readers over the parquet testdata (SURVEY.md §2.1).
  *
  * Reads are plain `spark.read.parquet` so Catalyst's filter pushdown /
  * column pruning / partition pruning all apply — callers chain
  * `.filter`/`.select` and the scan shrinks accordingly.
  *
  * Nanosecond normalization: the `events` table stores
  * TIMESTAMP(NANOS) which Spark's vectorized reader rejects
  * (PARQUET_TYPE_ILLEGAL). Sessions set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[configure]]) so the
  * column arrives as epoch-nanos LongType, and [[table]] converts it to a
  * µs TimestampType — exact for this corpus, and matching DuckDB's own
  * µs truncation on read.
  */
object Sources {

  /** Session configs every graft session needs. Idempotent. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  /** Columns that hold epoch-nanos when nanosAsLong is in effect. */
  private val nanoCols = Set("ts")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (nanoCols.contains(f.name) && f.dataType == LongType)
        // integer `div`, not `/`: float division of epoch-nanos (~1.7e18)
        // exceeds double's 53-bit mantissa and would corrupt low digits
        d.withColumn(f.name, timestamp_micros(expr(s"`${f.name}` div 1000")))
      else d
    }
  }
}
