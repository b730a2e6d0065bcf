package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between the public Column API and Catalyst expressions.
  *
  * Spark 4 moved Column↔Expression conversion behind `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils); extensions that define
  * native expressions conventionally reach it via a same-package shim.
  */
object GraftSql {
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
