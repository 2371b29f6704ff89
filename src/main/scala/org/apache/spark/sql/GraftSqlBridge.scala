package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's package-private Column <-> Expression conversions
  * (the classic `new Column(expr)` constructor is gone in the split
  * Connect/Classic API). Lives in the sql package on purpose. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
