package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, Cohorts, RangeJoin}
import graft.sources.Tables

/** Temporal join queries: as-of (latest-at-or-before) and
  * point-in-interval range joins over the events stream — the two
  * classic time-series joins Spark lacks natively, oracled against
  * DuckDB's ASOF JOIN and a plain inequality join.
  *
  * Timestamp precision: the engine reads events at microsecond
  * precision (nanos truncate — `Tables.events`), so the oracles
  * compare at epoch-microseconds too; raw-nanos comparisons could
  * disagree on events inside the same microsecond.
  */
object TemporalQueries {

  /** Each click joined to the user's latest at-or-before purchase. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    AsofJoin.asof(clicks, purchases,
      keyCols = Seq("user_id"),
      leftTsCol = "click_ts", rightTsCol = "purchase_ts",
      rightPayloadCols = Seq("purchase_ts", "purchase_value"),
      rightOrder = Some("event_id"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_ts"), col("purchase_value"))
      .orderBy(col("click_id"))
  }

  val asofJoinSql: String =
    """SELECT l.event_id AS click_id, l.user_id,
      |       CAST(l.ts AS TIMESTAMP) AS click_ts,
      |       CAST(r.ts AS TIMESTAMP) AS purchase_ts,
      |       r.value AS purchase_value
      |FROM (SELECT * FROM events WHERE event_type = 'click') l
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      |  ON l.user_id = r.user_id
      | AND epoch_us(CAST(l.ts AS TIMESTAMP)) >= epoch_us(CAST(r.ts AS TIMESTAMP))
      |ORDER BY click_id""".stripMargin

  /** Purchases landing inside daily error-burst windows
    * [first error, last error) — keyless point-in-interval join via
    * bin replication.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val windows = ev.filter(col("event_type") === "error")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(min(unix_micros(col("ts"))).as("lo_us"),
        max(unix_micros(col("ts"))).as("hi_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
    RangeJoin.pointInInterval(purchases, "ts_us", windows, "lo_us", "hi_us",
      binWidth = 3600L * 1000000) // 1-hour bins
      .select(col("event_id"), col("day"), col("value"))
      .orderBy(col("event_id"), col("day"))
  }

  val rangeJoinSql: String =
    """WITH w AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |         MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS lo_us,
      |         MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS hi_us
      |  FROM events WHERE event_type = 'error'
      |  GROUP BY 1
      |)
      |SELECT p.event_id, w.day, p.value
      |FROM (SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
      |      FROM events WHERE event_type = 'purchase') p
      |JOIN w ON p.ts_us >= w.lo_us AND p.ts_us < w.hi_us
      |ORDER BY p.event_id, w.day""".stripMargin

  /** Interval-OVERLAP join: daily error-burst windows (padded ±2 h so
    * they can cross midnight) against per-(user, day) activity spans —
    * "which users were active during which incident windows, and for
    * how long". Bin-replicated equi-join with the emit-once guard; no
    * BroadcastNestedLoopJoin, no dedup pass.
    */
  def intervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val pad = 2L * 3600 * 1000000
    val bursts = ev.filter(col("event_type") === "error")
      .groupBy(col("ts").cast("date").as("burst_day"))
      .agg((min(unix_micros(col("ts"))) - pad).as("b_lo"),
        (max(unix_micros(col("ts"))) + pad).as("b_hi"))
    val spans = ev
      .groupBy(col("user_id"), col("ts").cast("date").as("active_day"))
      .agg(min(unix_micros(col("ts"))).as("s_lo"),
        (max(unix_micros(col("ts"))) + 1).as("s_hi")) // half-open: +1 us keeps the last event inside
    RangeJoin.intervalOverlap(spans, "s_lo", "s_hi", bursts, "b_lo", "b_hi",
      binWidth = 3600L * 1000000) // 1-hour bins
      .select(col("user_id"), col("active_day"), col("burst_day"),
        (least(col("s_hi"), col("b_hi")) - greatest(col("s_lo"), col("b_lo")))
          .as("overlap_us"))
      .orderBy(col("user_id"), col("active_day"), col("burst_day"))
  }

  /** Event-time rolling 7-day window per user: daily partial
    * aggregation first (events collapse to one row per (user, day)
    * with map-side partials — the window never sees raw events), then
    * a RANGE frame over day numbers so gaps in activity are windowed
    * by TIME, not by row position (a ROWS frame would silently span
    * months for sparse users). Money sums in exact decimal until the
    * final cast (the q15 double-vs-DuckDB summation lesson).
    */
  def rollingWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_day"),
        sum(col("value").cast("decimal(18,2)")).as("v_day"))
    val dayNum = datediff(col("day"), lit("1970-01-01").cast("date"))
    val w = Window.partitionBy(col("user_id")).orderBy(dayNum).rangeBetween(-6, 0)
    daily.select(col("user_id"), col("day"),
        sum(col("n_day")).over(w).as("n_events_7d"),
        round(sum(col("v_day")).over(w).cast("double"), 4).as("value_7d"))
      .orderBy(col("user_id"), col("day"))
  }

  val rollingWindowSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_day,
      |         SUM(CAST(value AS DECIMAL(18,2))) AS v_day
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT user_id, day,
      |       CAST(SUM(n_day) OVER w AS BIGINT) AS n_events_7d,
      |       ROUND(CAST(SUM(v_day) OVER w AS DOUBLE), 4) AS value_7d
      |FROM daily
      |WINDOW w AS (PARTITION BY user_id ORDER BY day
      |             RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, day""".stripMargin

  val intervalOverlapSql: String =
    """WITH bursts AS (
      |  SELECT CAST(ts AS DATE) AS burst_day,
      |         MIN(epoch_us(CAST(ts AS TIMESTAMP))) - 7200000000 AS b_lo,
      |         MAX(epoch_us(CAST(ts AS TIMESTAMP))) + 7200000000 AS b_hi
      |  FROM events WHERE event_type = 'error'
      |  GROUP BY 1
      |),
      |spans AS (
      |  SELECT user_id, CAST(ts AS DATE) AS active_day,
      |         MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS s_lo,
      |         MAX(epoch_us(CAST(ts AS TIMESTAMP))) + 1 AS s_hi
      |  FROM events
      |  GROUP BY 1, 2
      |)
      |SELECT s.user_id, s.active_day, b.burst_day,
      |       LEAST(s.s_hi, b.b_hi) - GREATEST(s.s_lo, b.b_lo) AS overlap_us
      |FROM spans s
      |JOIN bursts b ON s.s_lo < b.b_hi AND b.b_lo < s.s_hi
      |ORDER BY s.user_id, s.active_day, b.burst_day""".stripMargin

  /** Weekly cohort retention matrix over the event stream. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame =
    Cohorts.retention(Tables.events(spark, dir), "user_id", "ts")
      .orderBy(col("cohort_week"), col("week_offset"))

  /** DuckDB oracle: identical grid construction — Monday-start
    * DATE_TRUNC weeks on both engines, offsets as exact-multiple-of-7
    * integer division, retention counts as plain COUNT(*) over the
    * already-distinct (user, week) grid.
    */
  val cohortRetentionSql: String =
    """WITH weeks AS (
      |  SELECT DISTINCT user_id,
      |         CAST(DATE_TRUNC('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
      |  FROM events
      |),
      |cohorts AS (
      |  SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY 1
      |),
      |sizes AS (
      |  SELECT cohort_week, COUNT(*) AS cohort_size FROM cohorts GROUP BY 1
      |),
      |ret AS (
      |  SELECT c.cohort_week,
      |         CAST(DATE_DIFF('day', c.cohort_week, w.week) / 7 AS INT) AS week_offset,
      |         COUNT(*) AS active_users
      |  FROM weeks w JOIN cohorts c USING (user_id)
      |  GROUP BY 1, 2
      |)
      |SELECT r.cohort_week, r.week_offset, r.active_users, s.cohort_size
      |FROM ret r JOIN sizes s USING (cohort_week)
      |ORDER BY cohort_week, week_offset""".stripMargin
}
