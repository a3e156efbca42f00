package graft.ibtp

import java.time.temporal.ChronoUnit

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Automated period sizing — the reference's one piece of operational
  * guidance not expressible in its config: "you should set your time
  * period such that you are broadly inserting 6-60 million rows with
  * each load" (`/root/reference/README.md:104`). The reference leaves
  * the choice to the operator; here the engine can measure the row
  * rate and choose.
  *
  * Policy: the FINEST period whose expected chunk reaches the band's
  * minimum. Finer chunks mean more resumability and a bounded working
  * set (the materialization's point); chunks below the band waste the
  * per-period overhead (the reference's ≥4 warehouse round-trips per
  * period, our per-job scheduling) on tiny inserts. When even a day
  * exceeds the band's maximum there is no finer unit — Day is chosen
  * and the overflow logged (the reference has the same floor).
  */
object PeriodSizing {

  /** `README.md:104`'s band. */
  val DefaultMinChunkRows: Long = 6000000L
  val DefaultMaxChunkRows: Long = 60000000L

  /** Mean days per period for rate arithmetic (calendar averages). */
  def daysPer(u: PeriodUnit): Double = u match {
    case PeriodUnit.Day   => 1.0
    case PeriodUnit.Week  => 7.0
    case PeriodUnit.Month => 365.2425 / 12
    case PeriodUnit.Year  => 365.2425
  }

  final case class Choice(
      period: PeriodUnit,
      rowsPerDay: Double,
      expectedChunkRows: Long,
      /** true when even the chosen period can't reach the band (Year
        * still under min) or can't stay under it (Day already over
        * max) — the operator floor/ceiling cases.
        */
      outsideBand: Boolean)

  /** Finest period whose expected chunk reaches `minChunkRows`. */
  def choosePeriod(
      rowsPerDay: Double,
      minChunkRows: Long = DefaultMinChunkRows,
      maxChunkRows: Long = DefaultMaxChunkRows): Choice = {
    require(minChunkRows > 0 && maxChunkRows >= minChunkRows,
      s"invalid chunk band [$minChunkRows, $maxChunkRows]")
    require(rowsPerDay >= 0, s"negative row rate $rowsPerDay")
    val period = PeriodUnit.all
      .find(u => rowsPerDay * daysPer(u) >= minChunkRows)
      .getOrElse(PeriodUnit.Year)
    val expected = (rowsPerDay * daysPer(period)).toLong
    Choice(period, rowsPerDay, expected,
      outsideBand = expected < minChunkRows || expected > maxChunkRows)
  }

  /** Measure rows/day over the date-source models: one Spark job (the
    * same union-then-aggregate shape as the boundary probe,
    * `insert_by_timeperiod_helpers.sql:19-31`) computing total rows and
    * the [min, max] day span per source. At 100 TB this is a
    * count+min+max scan with map-side partials — cheap relative to the
    * build it sizes, and a one-time cost (the choice can be persisted
    * in the caller's config after the first run).
    */
  def probeRowsPerDay(tsField: String, sources: Seq[DataFrame]): Option[Double] = {
    if (sources.isEmpty) return None
    val probes = sources.map(_.agg(
      count(lit(1)).as("n"),
      min(col(tsField).cast("date")).as("mn"),
      max(col(tsField).cast("date")).as("mx")))
    val row = probes.reduce(_ unionAll _)
      .agg(sum(col("n")).as("n"), min(col("mn")).as("mn"), max(col("mx")).as("mx"))
      .head()
    if (row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2)) return None
    val n = row.getLong(0)
    val span = ChronoUnit.DAYS.between(
      row.getDate(1).toLocalDate, row.getDate(2).toLocalDate) + 1
    if (n <= 0 || span <= 0) None else Some(n.toDouble / span)
  }

  /** Probe + choose in one call; None when the sources are empty or
    * hold no rows (caller falls back to the configured period).
    */
  def choose(
      tsField: String,
      sources: Seq[DataFrame],
      minChunkRows: Long = DefaultMinChunkRows,
      maxChunkRows: Long = DefaultMaxChunkRows): Option[Choice] =
    probeRowsPerDay(tsField, sources).map(choosePeriod(_, minChunkRows, maxChunkRows))
}
