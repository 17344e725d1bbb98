package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4.x hides the Column <-> catalyst Expression bridge behind
  * `private[sql]` (Column now wraps a ColumnNode). This shim lives in
  * the org.apache.spark.sql package purely to re-export the two
  * conversions that custom-expression libraries need; no Spark
  * internals are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
