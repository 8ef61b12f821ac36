package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped forward/backward fill (SURVEY.md §2.7 W1/W2 — the reference's
  * only true window computation; /root/reference/data_pipeline/tasks/
  * transformation.py:206-218).
  *
  * The eager two-pass pandas `groupby().ffill()` / `.bfill()` becomes two
  * window projections over ONE window partitioning — Spark plans a single
  * sort+shuffle on (partition keys, order keys) and evaluates both frames
  * in the same WindowExec, so scale cost is one exchange regardless of how
  * many columns are filled.
  */
object Fill {

  /** W1 — per-group forward fill: last non-null value at or before the
    * current row (transformation.py:213).
    */
  def ffill(partitionBy: Seq[Column], orderBy: Seq[Column])(c: Column): Column =
    last(c, ignoreNulls = true).over(
      Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))

  /** W2 — per-group backward fill: first non-null value at or after the
    * current row (transformation.py:215).
    */
  def bfill(partitionBy: Seq[Column], orderBy: Seq[Column])(c: Column): Column =
    first(c, ignoreNulls = true).over(
      Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing))

  /** ffill-then-bfill (the reference's exact order: transformation.py:
    * 213-215): mid-series nulls take the previous value, leading nulls take
    * the first following value, all-null groups stay null (and are dropped
    * by the caller's na.drop — P5).
    */
  def ffillBfill(partitionBy: Seq[Column], orderBy: Seq[Column])(c: Column): Column =
    coalesce(ffill(partitionBy, orderBy)(c), bfill(partitionBy, orderBy)(c))

  /** Apply [[ffillBfill]] to several columns in place. */
  def fillColumns(
      df: DataFrame,
      partitionBy: Seq[Column],
      orderBy: Seq[Column],
      cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, name) =>
      d.withColumn(name, ffillBfill(partitionBy, orderBy)(col(name)))
    }
}
