package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression→Column bridge. Spark 4 made `new Column(expr)` private to
  * the sql package (Column is now a connect-compatible node wrapper);
  * `ExpressionUtils.column` is the classic-session constructor but is
  * `private[sql]`. This one-hop shim compiles inside the package
  * boundary — same technique as [[org.apache.spark.graft.Storage]] —
  * so native expressions ([[graft.functions.SignBucket]]) can build
  * Columns without a session-bound function-registry round-trip (the
  * registry route silently couples correctness to registration order;
  * see round 9's UNRESOLVED_ROUTINE incident).
  */
object Cols {
  def of(e: Expression): Column = ExpressionUtils.column(e)
  def exprOf(c: Column): Expression = ExpressionUtils.expression(c)
}
