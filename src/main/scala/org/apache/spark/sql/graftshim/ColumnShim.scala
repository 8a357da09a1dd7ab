package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column <-> Expression constructors that
  * extension libraries use to expose custom Catalyst expressions as
  * Columns; the supported converters live in private[sql]
  * ExpressionUtils. This shim re-exports exactly those two conversions
  * from inside the sql package — the minimal, standard bridge for
  * injecting custom expressions without a fork.
  */
object ColumnShim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
