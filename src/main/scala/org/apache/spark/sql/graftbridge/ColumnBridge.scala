package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's `private[sql]` Column<->Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) for registering
  * custom Catalyst expressions from library code. Lives under the
  * org.apache.spark.sql package namespace solely for access; contains
  * no Spark code.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
