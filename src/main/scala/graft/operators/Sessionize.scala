package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: events of one user
  * belong to the same session while consecutive gaps stay under the
  * threshold — the classic lag + cumulative-flag construction
  * (`README.md:23-25`'s "window functions over the period" capability,
  * generalized).
  *
  * Scale shape: one shuffle on user_id (the window partition key);
  * everything after is per-partition sort + running sum. Inside an
  * IBTP loop body the period predicate bounds the shuffle to one
  * period of events.
  */
object Sessionize {

  /** Per-session summary: (user_id, session_idx, n_events,
    * session_start, session_end, duration_us).
    */
  def sessions(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      tieBreak: String = "event_id",
      gapMicros: Long = 30L * 60 * 1000000): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieBreak))
    val us: Column = unix_micros(col(tsCol))
    val newSession = when(
      lag(us, 1).over(w).isNull || us - lag(us, 1).over(w) > gapMicros, 1L)
      .otherwise(0L)
    events
      .withColumn("__new_s", newSession)
      .withColumn("session_idx",
        sum(col("__new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol))))
          .as("duration_us"))
  }
}
