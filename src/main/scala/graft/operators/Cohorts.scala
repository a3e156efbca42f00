package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis over an event stream: bucket users into
  * weekly cohorts by their first activity, then count how many of each
  * cohort are active k weeks later — the standard product-analytics
  * retention matrix (the reference's models are exactly this kind of
  * event-table aggregation; see `/root/reference/README.md:12-25` for
  * the incremental event-model context).
  *
  * Scale shape: the only pass over the raw event stream is the
  * `(user, week)` DISTINCT — one shuffle with map-side partial
  * deduplication, after which everything operates on the distinct
  * activity grid (≤ users × weeks rows, orders of magnitude smaller
  * than the stream). Cohort assignment is a user-key aggregation of
  * that grid; the retention count is a plain `count(*)` because grid
  * rows are already unique per (user, week) — no COUNT DISTINCT
  * expansion. Cohort sizes are a tiny per-week aggregate broadcast
  * back onto the matrix.
  */
object Cohorts {

  /** Output: (cohort_week, week_offset, active_users, cohort_size),
    * one row per cohort × offset with at least one active user.
    * Weeks are Monday-start (`date_trunc("week", ...)`); offsets are
    * exact multiples of 7 days, so integer division is lossless.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val weeks = events
      .select(col(userCol).as("__user"),
        date_trunc("week", col(tsCol)).cast("date").as("__week"))
      .distinct()
    val cohorts = weeks.groupBy(col("__user"))
      .agg(min(col("__week")).as("cohort_week"))
    val ret = weeks.join(cohorts, "__user")
      .withColumn("week_offset",
        (datediff(col("__week"), col("cohort_week")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("active_users"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    ret.join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"),
        col("active_users"), col("cohort_size"))
  }
}
