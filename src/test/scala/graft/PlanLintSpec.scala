package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Automated no-scale-killer sweep: every batch query's PHYSICAL plan
  * is linted, not eyeballed. The one unconditional rule: no
  * `CartesianProductExec`, ever — every intentional `crossJoin` in the
  * repo broadcasts a 1-row aggregate or a ≤150-row frame and therefore
  * plans as `BroadcastNestedLoopJoin`; a `CartesianProduct` appearing
  * in any plan means a join key was dropped or a broadcast hint lost,
  * which is exactly the regression that is invisible at sf0.001 and
  * fatal at 100 TB.
  *
  * Streaming queries are excluded (their builders run real
  * micro-batch streams against checkpoint dirs; their plan shapes are
  * pinned by their own specs and stage-attributed in the bench).
  * Builders that execute eagerly (index ensure-built, iterative graph
  * probes) still yield a lintable terminal plan — the lint covers the
  * frame each query RETURNS, the one the driver materializes.
  */
class PlanLintSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def lintable: Seq[String] =
    SparkEntry.queries.keys.toSeq.sorted.filterNot(_.startsWith("q_stream_"))

  test("no batch query plans a CartesianProduct") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    val offenders = lintable.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name -> plan) else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in: ${offenders.map(_._1).mkString(", ")}\n" +
        offenders.headOption.map(_._2).getOrElse(""))
  }
}
