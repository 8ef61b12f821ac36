package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table readers over the parquet testdata (SURVEY.md §2.1).
  *
  * Reads are plain `spark.read.parquet` so Catalyst's filter pushdown /
  * column pruning / partition pruning all apply — callers chain
  * `.filter`/`.select` and the scan shrinks accordingly.
  *
  * Timestamp normalization: the physical layout of `events.ts` has
  * varied across testdata generations, so [[table]] dispatches on the
  * ARRIVING dtype instead of assuming one layout:
  *
  *   - TIMESTAMP(NANOS) parquet + `spark.sql.legacy.parquet.nanosAsLong
  *     =true` (set by all graft sessions) → epoch-nanos LongType →
  *     `timestamp_micros(ts div 1000)` — exact for this corpus, and
  *     matching DuckDB's own µs truncation on read.
  *   - timestamp[us] without isAdjustedToUTC → TIMESTAMP_NTZ → cast to
  *     TimestampType. Sessions pin the session time zone to UTC (see
  *     [[configure]]), so the NTZ wall-clock values ARE the UTC instants
  *     and the cast is value-exact.
  *   - TIMESTAMP (µs, UTC-adjusted) → passthrough.
  *
  * The reference tolerates input-shape drift at the column level
  * (transformation.py:37-43 drops columns only if present); the same
  * tolerance belongs at the type level here.
  */
object Sources {

  /** Session configs every graft session needs. Idempotent. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  /** Columns that hold event time and need dtype normalization. */
  private val tsCols = Set("ts")

  /** JSON source with declared schema, PERMISSIVE mode, and a corrupt
    * record column — the shape of the reference's API-payload ingestion
    * (raw `data["articles"]` rows, extraction.py:67): bad rows become
    * nulls + captured raw text instead of failing the batch.
    */
  def readJson(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** CSV source, schema-declared, permissive. */
  def readCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** The reference's never-throw source contract (extraction.py:45-64
    * returns [] on any API error): a missing/unreadable path yields an
    * EMPTY frame with the declared schema, so downstream transforms
    * no-op instead of failing the flow.
    */
  def tableOrEmpty(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    try {
      val df = spark.read.schema(schema).parquet(path)
      df.queryExecution.analyzed // force resolution
      df
    } catch {
      case _: Exception =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** Schema-evolution read: one directory holding parquet written across
    * schema GENERATIONS (the reference's warehouse carries 8 Alembic
    * revisions, including a real column widening —
    * migrations/versions/e26643b1dbdd_.py:22-28), scanned under a single
    * declared target schema. Spark's parquet reader performs the safe
    * widening promotions footer-by-footer at scan time (int32→int64,
    * float→double, decimal precision growth), and a column absent from an
    * older generation's footer materializes as NULL — so a new reader
    * never breaks on old files, which is the Alembic upgrade contract.
    *
    * Scale note: this is a plain file scan — pushdown/pruning still apply
    * per file, and no repair/rewrite job touches the old generations.
    */
  def readEvolved(spark: SparkSession, path: String,
      target: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(target).parquet(path)

  /** Normalize event-time columns to TimestampType by ARRIVING dtype.
    * Works on batch and streaming frames alike (pure projection). See the
    * object Scaladoc for the layout-by-layout rationale.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (tsCols.contains(f.name)) f.dataType match {
        case LongType =>
          // integer `div`, not `/`: float division of epoch-nanos (~1.7e18)
          // exceeds double's 53-bit mantissa and would corrupt low digits
          d.withColumn(f.name, timestamp_micros(expr(s"`${f.name}` div 1000")))
        case TimestampNTZType =>
          // session TZ is pinned UTC, so NTZ wall-clock == UTC instant
          d.withColumn(f.name, col(f.name).cast(TimestampType))
        case _ => d // already TimestampType (or an unexpected type: leave it)
      } else d
    }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))

  /** The testdata table names (TESTDATA.md + the two corpus tables). */
  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** SQL surface: register every testdata table as a temp view (with the
    * same nanos normalization [[table]] applies), so `spark.sql` users
    * get the full catalog — `spark.sql("SELECT ... FROM lineitem")` —
    * without touching the Scala API. Temp views are lazy logical plans:
    * pushdown/pruning through them is identical to the DataFrame path.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    tableNames.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
