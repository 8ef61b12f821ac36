package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The native DecimalDot expression must be value-identical to the
  * built-in higher-order composition it replaces (same per-element
  * double multiply, same Cast rounding to DECIMAL(30,12), exact sum).
  */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("native dot product equals the higher-order-function form") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat),
        Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val df = rows.toDF("id", "a", "b")
    Similarity.registerNative(spark)
    val diff = df.select(
        Similarity.dotDecimal($"a", $"b").as("native"),
        Similarity.dotDecimalHof($"a", $"b").as("hof"))
      .filter($"native" =!= $"hof" ||
        ($"native".isNull =!= $"hof".isNull))
      .count()
    assert(diff === 0)
  }

  test("native dot product handles empty and mismatched-length arrays") {
    val df = Seq(
      (1L, Array.empty[Float], Array.empty[Float]),
      (2L, Array(1.0f, 2.0f), Array(3.0f))).toDF("id", "a", "b")
    Similarity.registerNative(spark)
    val got = df.select($"id", Similarity.dotDecimal($"a", $"b").as("d"))
      .orderBy("id").collect()
    assert(got(0).getDecimal(1).doubleValue() === 0.0)
    assert(got(1).getDecimal(1).doubleValue() === 3.0) // min-length prefix
  }
}
