package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.catalyst.expressions.{Expression, ScalarSubquery}
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

  /** An uncorrelated scalar subquery over a one-row, one-column frame —
    * the Column-API spelling of SQL's `(SELECT x FROM t)`. The subquery
    * plan executes once (as its own tiny job) and its result is inlined
    * as a literal into the enclosing plan, which is how a global scalar
    * (a vocabulary size, a corpus total) should reach a per-row
    * expression at 100 TB: no constant-key join for the optimizer to
    * collapse into a nested-loop join, no driver-side collect.
    */
  def scalar(df: Dataset[_]): Column = {
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
    column(ScalarSubquery(plan))
  }
}
