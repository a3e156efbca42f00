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

  /** Drop the storage blocks behind a `localCheckpoint()`ed frame.
    * A local checkpoint persists its RDD and truncates lineage; once a
    * DOWNSTREAM checkpoint is materialized, the earlier blocks are
    * never read again but stay pinned until the session ends. Freeing
    * them keeps iterative algorithms (label propagation) at one live
    * copy. Only call when nothing will read the frame again — a local
    * checkpoint cannot recompute (that is already its documented
    * non-fault-tolerant contract).
    */
  def freeLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
}
