package graft.ibtp

import java.sql.{Date => SqlDate, Timestamp}
import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Period-boundary arithmetic + boundary probes.
  *
  * Encodes the reference's trickiest semantics exactly
  * (`insert_by_timeperiod_helpers.sql`):
  *  - `__PERIOD_FILTER_FROM__` inclusive, `__PERIOD_FILTER_TO__`
  *    exclusive (`README.md:91-92`);
  *  - upper bound clamped with LEAST to stop_date, default sentinel
  *    9999-12-31 (`helpers.sql:86-92`);
  *  - normal-run resume point = GREATEST(MAX(ts) + 1 *day* — day
  *    regardless of period — , start_date) (`helpers.sql:117-121`);
  *  - `num_periods = DATEDIFF(period, start, stop) + 1`
  *    (`helpers.sql:128-132`; the in-code comment at
  *    `insert_by_timeperiod_loop.sql:32-33` acknowledges the over-count —
  *    the final period is emptied by the LEAST clamp, not wrong).
  */
object Boundaries {

  /** The open-ended stop sentinel (`helpers.sql:88`). */
  val MaxDate: LocalDate = LocalDate.of(9999, 12, 31)

  /** Inclusive lower bound of period `offset` — reference A4
    * (`helpers.sql:74-84`): `DATEADD(period, offset, CAST(start AS DATE))`.
    */
  def periodFrom(period: PeriodUnit, offset: Int, start: LocalDate): LocalDate =
    period.add(start, offset)

  /** Exclusive upper bound of period `offset` — reference A5
    * (`helpers.sql:86-92`): `LEAST(DATEADD(period, offset+1, start), stop)`.
    */
  def periodTo(
      period: PeriodUnit,
      offset: Int,
      start: LocalDate,
      stop: Option[LocalDate]): LocalDate = {
    val next = period.add(start, offset + 1)
    val clamp = stop.getOrElse(MaxDate)
    if (next.isBefore(clamp)) next else clamp
  }

  /** `num_periods = DATEDIFF(period, start, stop) + 1` — reference A7
    * (`helpers.sql:128-132`). DATEDIFF is T-SQL boundary-crossing count.
    */
  def numPeriods(period: PeriodUnit, start: LocalDate, stop: LocalDate): Int =
    (period.boundaryDiff(start, stop) + 1).toInt

  /** Resolved load window for one run. */
  final case class Window(start: LocalDate, stop: LocalDate, numPeriods: Int)

  /** Half-open [from, to) slice for one loop iteration. */
  final case class PeriodSlice(offset: Int, from: LocalDate, to: LocalDate) {
    def isEmpty: Boolean = !from.isBefore(to)
  }

  /** All non-empty slices tiling [window.start, window.stop). The reference
    * loops `for i in 1..num_periods` with offset `i-1`
    * (`insert_by_timeperiod_loop.sql:31`); slices emptied by the LEAST
    * clamp are skipped as no-op inserts.
    */
  def slices(period: PeriodUnit, w: Window, stop: Option[LocalDate]): Seq[PeriodSlice] =
    (0 until w.numPeriods).map { off =>
      PeriodSlice(off, periodFrom(period, off, w.start), periodTo(period, off, w.start, stop))
    }.filterNot(_.isEmpty)

  // ---------------------------------------------------------------------
  // A2: 3-way start/stop date resolution (`helpers.sql:1-47`)
  // ---------------------------------------------------------------------

  /** Resolve configured or probed [start, stop] dates.
    *
    * Precedence (reference `materialization.sql:35-52` + `helpers.sql:5-45`):
    * CLI vars > config start/stop > MIN/MAX probe over dateSourceModels >
    * compile error. The probe is ONE Spark job: per-source min/max rows
    * unioned then re-aggregated (`helpers.sql:19-31`) — same single-query
    * shape as the reference's UNION ALL batching, so at scale it is N
    * parquet-footer-cheap scans feeding one tiny agg, not N round-trips.
    */
  def resolveStartStop(
      spark: SparkSession,
      config: IbtpConfig,
      sources: Map[String, DataFrame] = Map.empty): (LocalDate, Option[LocalDate]) =
    (config.startDate, config.stopDate) match {
      case (Some(s), e) => (s, e)
      case (None, _) if config.dateSourceModels.nonEmpty =>
        val perSource = config.dateSourceModels.map { name =>
          val df = sources.getOrElse(name, spark.table(name))
          df.agg(
            min(col(config.timestampField)).cast("date").as("min_date"),
            max(col(config.timestampField)).cast("date").as("max_date"))
        }
        val row = perSource
          .reduce(_ unionAll _)
          .agg(min(col("min_date")).as("s"), max(col("max_date")).as("e"))
          .head()
        require(!row.isNullAt(0), "date_source_models probe returned no dates")
        (row.getDate(0).toLocalDate, Some(row.getDate(1).toLocalDate))
      case _ =>
        throw new IllegalArgumentException(
          "must supply either start_date or date_source_models " +
            "(reference: helpers.sql:41-45)")
    }

  // ---------------------------------------------------------------------
  // A7: run-window boundaries (`helpers.sql:106-142`)
  // ---------------------------------------------------------------------

  /** Compute the effective load window for this run.
    *
    * Backfill: use the given CLI dates verbatim; stop defaults to today
    * when absent (reference COALESCE(NULLIF(stop,'none'), CURRENT_TIMESTAMP),
    * `helpers.sql:113-116`).
    *
    * Normal/catch-up: start = GREATEST(MAX(target.ts) + 1 day, start_date).
    * The +1 is one DAY regardless of period — reproduced faithfully from
    * `helpers.sql:119` (DATEADD(day, 1, MAX…)). stop likewise defaults to
    * CURRENT_TIMESTAMP's date when no stop configured (`helpers.sql:122-125`).
    */
  def runWindow(
      period: PeriodUnit,
      configStart: LocalDate,
      configStop: Option[LocalDate],
      targetMaxTs: Option[LocalDate],
      mode: RunMode,
      today: LocalDate): Window = mode match {
    case RunMode.Backfill(s, e) =>
      Window(s, e, numPeriods(period, s, e))
    case _ =>
      val resume = targetMaxTs.map(_.plusDays(1)) match {
        case Some(r) if r.isAfter(configStart) => r
        case _                                 => configStart
      }
      val stop = configStop.getOrElse(today)
      Window(resume, stop, numPeriods(period, resume, stop))
  }

  /** MAX(timestampField) over an arbitrary relation, as a date — the
    * literal form of the reference's resume probe (`helpers.sql:119`).
    * The runner uses `TargetTable.maxPartitionDate` (a metadata
    * listing) instead, which is equivalent on a day-partitioned target;
    * this form remains for probing targets not managed by TargetTable.
    */
  def targetMaxDate(target: DataFrame, timestampField: String): Option[LocalDate] = {
    val row = target.agg(max(col(timestampField)).cast("date")).head()
    if (row.isNullAt(0)) None else Some(row.getDate(0).toLocalDate)
  }

  // Column forms for injecting bounds into DataFrame filters -------------

  def fromColumn(d: LocalDate): Column = lit(SqlDate.valueOf(d))
  def toColumn(d: LocalDate): Column   = lit(SqlDate.valueOf(d))

  /** Half-open period predicate `ts >= from AND ts < to` (B2). Bounds are
    * DATE-typed like the reference ("Replacement values will have DATE
    * data type", `README.md:94`); Spark compares timestamp >= date via
    * implicit cast, and Catalyst pushes both sides into the parquet scan.
    */
  def periodPredicate(tsField: String, from: LocalDate, to: LocalDate): Column =
    col(tsField) >= fromColumn(from) && col(tsField) < toColumn(to)
}
