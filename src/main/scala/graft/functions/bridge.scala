package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge: `classic.ExpressionUtils` is package-private
  * to org.apache.spark.sql, so extension libraries expose it from a bridge
  * object compiled into the same package (the standard pattern for Spark 4
  * connector/extension code).
  */
object graftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
