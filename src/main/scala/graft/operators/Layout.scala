package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators — multi-dimensional clustering for scan
  * pruning. At 100 TB the scan is the dominant cost, and min/max file
  * statistics (parquet row-group stats, the format's zone maps) only
  * prune when the data is CLUSTERED on the filtered columns; a z-order
  * (Morton) layout makes ONE clustering serve range predicates on
  * SEVERAL columns at once (public technique: Morton 1966; used by
  * every lakehouse table format).
  */
object Layout {

  /** Morton/z-value of two non-negative integral columns: the low
    * `bits` bits of `x` and `y` interleaved (x in even positions, y in
    * odd). Pure bit arithmetic on longs — codegen'd, engine-portable,
    * and monotone in the locality sense that matters: close (x, y)
    * tiles share high z-bits. Callers bound both inputs into
    * [0, 2^bits) first (mod or width-bucketing — the z-curve needs a
    * bounded universe).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zValue: bits must be in 1..31, got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** Cluster a frame by the z-curve over two bounded dimensions:
    * range-partition on the z-value (contiguous z-ranges per partition,
    * so each output file covers a small tile of BOTH dimensions), then
    * sort within partitions so row-group min/max stats are tight.
    * The writer downstream inherits pruning on either column — the
    * whole point of paying one global range exchange at write time.
    */
  def clusterByZOrder(df: DataFrame, x: Column, y: Column, bits: Int,
      numPartitions: Int): DataFrame = {
    val z = zValue(x, y, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
