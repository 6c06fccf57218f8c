package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's `private[sql]` Column<->Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) for registering
  * custom Catalyst expressions from library code. Lives under the
  * org.apache.spark.sql package namespace solely for access; contains
  * no Spark code.
  *
  * (A `scalar(df)` uncorrelated-subquery helper used to live here;
  * every global scalar in the engine is now a fit-time SNAPSHOT
  * literal instead — a scalar subquery re-plans its subtree at every
  * reference, which is why q55/q57 once planned 10 and 22 exchanges.
  * Build one from `ScalarSubquery(analyzed plan)` if a value ever
  * genuinely must stay engine-side.)
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
