package org.apache.spark.sql.graftglue

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 made these converters
  * private[sql] (`ExpressionUtils` in the classic module); a library
  * defining custom Catalyst expressions still needs them to expose the
  * expressions as user-facing Columns, hence this one-file subpackage
  * of org.apache.spark.sql.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
