package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, RangeJoin}
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
}
