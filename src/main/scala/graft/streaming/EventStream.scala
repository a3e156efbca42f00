package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-user session accumulator for stateful streaming. Top-level (not
  * nested in the object): nested case classes trip the safe-projection
  * codegen's constructor access.
  */
case class SessionState(sessionStartUs: Long, lastUs: Long, nEvents: Long)

/** Emitted when a session closes (gap exceeded or state timeout). */
case class ClosedSession(
    user_id: Long, session_start_us: Long, session_end_us: Long, n_events: Long)

private[streaming] case class SessionEvent(user_id: Long, ts_us: Long)

/** Structured Streaming ingestion for the events table — the streaming
  * analogue of the batch period loop: where IBTP tiles history into
  * half-open [from, to) chunks, the stream tiles arriving data into
  * event-time windows with a watermark bounding state. Same grouping
  * keys, same aggregates, so a catch-up batch run and the stream
  * produce the same rows for closed windows.
  *
  * File-source streaming scales by listing new files per trigger; at
  * production scale the source would be a log/queue, but the transform
  * graph (watermark → window agg → append sink) is identical.
  */
object EventStream {

  /** Raw parquet schema of events. `ts` is parquet TIMESTAMP(MICROS,
    * isAdjustedToUTC=0); declaring it TimestampType reads it as a UTC
    * instant (the session runs with `inferTimestampNTZ` disabled and a
    * UTC time zone, under which the NTZ and LTZ readings are
    * value-identical — see [[graft.sources.GraftSession]]).
    */
  val RawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of the events fixture (micro-precision event-time
    * `ts`, same decoding as the batch reader).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(RawSchema)
      // glob, not a bare file path: the file stream source requires a
      // directory (or glob) to monitor for new files
      .parquet(s"$dir/events*.parquet")

  /** Tumbling daily aggregation with a watermark: the streaming twin
    * of the IBTP daily model (day, event_type, counts/sums). Append
    * mode emits each day exactly once, when the watermark passes it —
    * the streaming equivalent of the loop's per-period commit.
    */
  def dailyAgg(events: DataFrame, watermark: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))
      .select(col("w.start").cast("date").as("day"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Stateful gap-based sessionization — the custom-state path
    * (`flatMapGroupsWithState`): per-user state holds the open
    * session; an event past the gap closes and emits the previous
    * session. The streaming twin of `operators.Sessionize` with
    * bounded state (one open session per active user; event-time
    * timeout would close idle users in a production config).
    *
    * Note: without watermark-based cleanup the state grows with the
    * number of distinct users — fine for keyed entities in the
    * millions; pair with `GroupStateTimeout.EventTimeTimeout` and a
    * watermark at scale.
    */
  def sessionizeStateful(
      events: DataFrame,
      gapMicros: Long = 30L * 60 * 1000000): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[SessionEvent]
    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, events: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
          var cur = state.getOption
          events.toSeq.sortBy(_.ts_us).foreach { e =>
            cur match {
              case Some(s) if e.ts_us - s.lastUs <= gapMicros =>
                cur = Some(s.copy(lastUs = e.ts_us, nEvents = s.nEvents + 1))
              case Some(s) =>
                out += ClosedSession(userId, s.sessionStartUs, s.lastUs, s.nEvents)
                cur = Some(SessionState(e.ts_us, e.ts_us, 1))
              case None =>
                cur = Some(SessionState(e.ts_us, e.ts_us, 1))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
      .toDF()
  }

  /** Exactly-once event stream from an at-least-once source:
    * watermark-bounded streaming dedup on the event id. State holds
    * only ids within the watermark horizon (Spark drops older dedup
    * state), so re-delivered events — a replayed log segment, a
    * re-listed file — are suppressed as long as the re-delivery lag
    * stays under `horizon`. The batch twin is `dropDuplicates(id)`.
    */
  def dedupedEvents(events: DataFrame, horizon: String = "2 days"): DataFrame =
    events
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: join the event stream against a STATIC
    * dimension (user → segment, product catalog, geo lookup). Spark
    * re-evaluates the static side per micro-batch, so a dimension
    * refreshed in place is picked up at the next trigger without
    * restarting the stream. The join needs NO streaming state and no
    * watermark (unlike stream-stream joins); the planner broadcasts a
    * small dimension (no stream-side shuffle) and degrades to a
    * shuffle join for a large one — no forced hint, so an oversized
    * dimension cannot OOM the broadcast path. Left join keeps events
    * with no dimension row (nulls, downstream-filterable).
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(dim, Seq(key), "left")

  /** Stream-stream join: each click paired with the same user's
    * purchases within `attribution` after it — streaming conversion
    * attribution. Both sides carry watermarks and the join condition
    * time-bounds the match, which is what lets Spark EXPIRE buffered
    * rows: a click older than watermark + attribution can never match
    * a future purchase, so its state is dropped — without the bound,
    * stream-stream join state grows forever. Inner joins emit each
    * match as soon as both rows have arrived (no watermark wait), so
    * a drained stream equals the batch join exactly.
    */
  def clickAttribution(
      events: DataFrame, attribution: String = "1 day",
      lateness: String = "2 days"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", lateness)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("__p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", lateness)
    clicks.join(purchases,
        col("user_id") === col("__p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $attribution"))
      .drop("__p_user")
  }

  /** Sliding-window per-type rates (5-day window, 1-day slide). */
  def slidingTypeRates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "5 days", "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").cast("date").as("window_start"),
        col("w.end").cast("date").as("window_end"),
        col("event_type"), col("n_events"))
}
