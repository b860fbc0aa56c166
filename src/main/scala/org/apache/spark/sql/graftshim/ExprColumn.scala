package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Catalyst Expression bridge. Spark 4 made the classic
  * converters `private[sql]` (the Column API is transport-agnostic now), so
  * a library registering a native codegen'd Expression without a session
  * extension needs this one-file subpackage shim — the same pattern
  * frameless/spark-daria use. Nothing here but the two delegations.
  */
object ExprColumn {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
