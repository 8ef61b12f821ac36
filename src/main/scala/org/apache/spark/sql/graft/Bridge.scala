package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column bridge. Spark 4 made `Column(expr)` private to
  * the sql package (`classic.ExpressionUtils`), so engine code that
  * builds Catalyst expression trees directly — e.g. a
  * BloomFilterMightContain over a ScalarSubquery sketch, the shape
  * `might_contain` REQUIRES — needs this one-hop shim compiled inside
  * the package boundary. This is the standard extension-library
  * technique; nothing here forks Spark behavior, it only re-exposes the
  * two conversion calls.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
