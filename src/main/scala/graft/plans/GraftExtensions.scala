package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DecimalDot, JaroWinkler}

/** Session-extension entry point: registers the engine's native
  * expressions so plain SQL users get them too —
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions …
  *   spark.sql("SELECT graft_decimal_dot(a.embedding, b.embedding) …")
  *   spark.sql("SELECT graft_jaro_winkler(a.name, b.name) …")
  * }}}
  *
  * This is the tier-(c) registration surface from the build guidance
  * (SparkSessionExtensions). No custom Rule/Strategy is injected:
  * SURVEY.md §2.11 establishes that every reference operator is
  * expressible with Catalyst built-ins, so there is nothing a custom
  * planner rule could add except risk — the extension point the engine
  * genuinely needs is function registration (the two native
  * expressions: [[DecimalDot]], [[JaroWinkler]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_decimal_dot"),
      new ExpressionInfo(classOf[DecimalDot].getName, "graft_decimal_dot"),
      (children: Seq[Expression]) => DecimalDot(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => JaroWinkler(children(0), children(1))))
  }
}
