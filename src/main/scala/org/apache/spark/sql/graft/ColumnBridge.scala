package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression converters —
  * Spark 4 moved Column onto ColumnNode and hid the direct expression
  * accessors; extension libraries reach them from inside the sql
  * package tree (the documented pattern for Catalyst extensions).
  */
object ColumnBridge {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
