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

  /** Fail-loudly cap on [[mergedFrequencies]]' driver collect (one
    * kilobyte-sized sketch blob per day is the contract).
    */
  @volatile var maxSketchRows: Int = 65536

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

  /** Per-day CountMin frequency sketches — the mergeable-frequency
    * twin of [[dailySketches]]'s HLL: kilobyte-bounded per-period
    * state answering "how often did key X appear in range R" without
    * re-scanning the stream. CountMin counters are sums, so merging
    * daily sketches reproduces the whole-range sketch EXACTLY (same
    * eps/confidence/seed required). Estimates only ever OVER-count
    * (by at most eps·N with the configured confidence) — the safe
    * direction for heavy-hitter screening.
    */
  def dailyFrequencySketches(
      events: DataFrame, tsCol: String, keyCol: String,
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    // interpolated into SQL below — out-of-range (or NaN/Inf) values
    // would otherwise surface as a confusing parse/runtime error
    require(eps > 0 && eps < 1, s"eps must be in (0, 1), got $eps")
    require(confidence > 0 && confidence < 1,
      s"confidence must be in (0, 1), got $confidence")
    events.groupBy(col(tsCol).cast("date").as("day"))
      .agg(expr(s"count_min_sketch(`$keyCol`, ${eps}d, ${confidence}d, $seed)")
        .as("cms"),
        count(lit(1)).as("n_events"))
  }

  /** Merge per-day CountMin blobs and probe the given items' estimated
    * frequencies. The collect is control-plane-bounded — one kilobyte
    * row per day, the same shape as KMeans' centroid collect — which
    * is the point of sketch state: range queries never touch the raw
    * stream.
    */
  def mergedFrequencies(
      daily: DataFrame, items: Seq[Long],
      cmsCol: String = "cms"): Map[Long, Long] = {
    import org.apache.spark.util.sketch.CountMinSketch
    // LIMIT cap+1 keeps the guard on the executors: a caller pointing
    // this at the raw stream (instead of per-day sketch rows) gets a
    // diagnosis, never a driver OOM — 65536 kilobyte-blobs ≈ 180 years
    // of daily sketches, far past the contract
    val rows = daily.select(col(cmsCol)).limit(maxSketchRows + 1).collect()
    if (rows.length > maxSketchRows)
      throw new IllegalStateException(
        s"mergedFrequencies: sketch collect exceeded its $maxSketchRows-row " +
          "control-plane cap — pass per-day sketch rows, not the raw stream " +
          "(raise Sketches.maxSketchRows only if you truly mean it)")
    val blobs = rows.map(_.getAs[Array[Byte]](0))
    require(blobs.nonEmpty, "no sketches to merge")
    val merged = blobs
      .map(b => CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b)))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    items.map(i => i -> merged.estimateCount(java.lang.Long.valueOf(i))).toMap
  }

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
