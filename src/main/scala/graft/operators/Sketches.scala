package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (DataSketches HLL, built into
  * Spark 4): build per-partition (per-day) sketches ONCE, persist them
  * next to the table, and answer any-range distinct questions by
  * merging sketches — never re-reading the events. This is the
  * incremental analogue of q34's one-shot `approx_count_distinct`: a
  * 100 TB stream is sketched day by day as it lands (the IBTP loop's
  * chunking), and a "distinct users last 90 days" card is a merge of
  * 90 kilobyte-sized sketches instead of a scan of 90 days of raw
  * data.
  *
  * HLL union is register-wise max — associative, commutative,
  * idempotent — so merging daily sketches yields EXACTLY the sketch
  * of the union (asserted in the spec, not just approximately), and
  * re-merging overlapping ranges never double-counts.
  */
object Sketches {

  /** One HLL sketch per day for `keyCol` (plus the day's row count):
    * the persistable per-period state. Map-side partial sketches ride
    * the single aggregation; the shuffle carries sketch bytes, not
    * keys.
    */
  def dailySketches(events: DataFrame, tsCol: String, keyCol: String): DataFrame =
    events.groupBy(col(tsCol).cast("date").as("day"))
      .agg(expr(s"hll_sketch_agg(`$keyCol`)").as("sketch"),
        count(lit(1)).as("n_events"))

  /** Merge a set of sketches into one distinct estimate (one row). */
  def mergedDistinct(sketches: DataFrame, sketchCol: String = "sketch"): DataFrame =
    sketches.agg(
      expr(s"hll_sketch_estimate(hll_union_agg(`$sketchCol`))").as("distinct_estimate"))

  /** Rolling distinct per trailing `windowDays` window, one row per
    * day present: merges only the window's sketches (bounded by
    * windowDays rows per output row, all kilobyte payloads).
    */
  def rollingDistinct(
      daily: DataFrame, windowDays: Int,
      dayCol: String = "day", sketchCol: String = "sketch"): DataFrame = {
    require(windowDays > 0, s"windowDays must be positive, got $windowDays")
    val days = daily.select(col(dayCol).as("__anchor"))
    daily.join(days,
        col(dayCol) <= col("__anchor") &&
          col(dayCol) > date_sub(col("__anchor"), windowDays))
      .groupBy(col("__anchor").as(dayCol))
      .agg(expr(s"hll_sketch_estimate(hll_union_agg(`$sketchCol`))")
        .as("distinct_estimate"))
  }
}
