package graft.ibtp

import java.time.LocalDate

/** Model configuration, mirroring the reference's config dict
  * (reference: `insert_by_timeperiod_materialization.sql:29-36,54,76`,
  * `README.md:76-84`).
  *
  * @param timestampField   column of the model output used for period
  *                         tiling (required)
  * @param startDate        first date to load (inclusive); if None,
  *                         probed from `dateSourceModels` MIN
  * @param stopDate         date to stop loading at (exclusive clamp via
  *                         LEAST); None → open-ended ('9999-12-31'
  *                         sentinel in the reference, `helpers.sql:88`)
  * @param period           chunk unit, default day
  * @param uniqueKey        optional upsert keys — per-period
  *                         delete-by-key before insert
  *                         (`insert_by_timeperiod_loop.sql:100-107`)
  * @param dateSourceModels tables to probe MIN/MAX(timestampField) from
  *                         when startDate/stopDate absent
  *                         (`helpers.sql:14-39`)
  * @param sampleSelectForSchema optional query used only to establish
  *                         the target schema on first build
  *                         (`insert_by_timeperiod_init.sql:9-19`)
  * @param onSchemaChange   dbt incremental semantics: ignore | fail |
  *                         append_new_columns | sync_all_columns
  */
final case class IbtpConfig(
    timestampField: String,
    startDate: Option[LocalDate] = None,
    stopDate: Option[LocalDate] = None,
    period: PeriodUnit = PeriodUnit.Day,
    uniqueKey: Seq[String] = Nil,
    dateSourceModels: Seq[String] = Nil,
    sampleSelectForSchema: Option[String] = None,
    onSchemaChange: OnSchemaChange = OnSchemaChange.Ignore)

sealed trait OnSchemaChange
object OnSchemaChange {
  case object Ignore           extends OnSchemaChange
  case object Fail             extends OnSchemaChange
  case object AppendNewColumns extends OnSchemaChange
  case object SyncAllColumns   extends OnSchemaChange

  def fromString(s: String): OnSchemaChange = s.trim.toLowerCase match {
    case "ignore"             => Ignore
    case "fail"               => Fail
    case "append_new_columns" => AppendNewColumns
    case "sync_all_columns"   => SyncAllColumns
    case other => throw new IllegalArgumentException(s"unknown on_schema_change '$other'")
  }
}

/** Run mode with the reference's precedence: backfill **overrides**
  * full-refresh (`insert_by_timeperiod_materialization.sql:8-14`), and
  * backfill requires explicit CLI start/stop (`:38-43`) which take
  * precedence over config (`:45-49`).
  */
sealed trait RunMode
object RunMode {
  case object Normal      extends RunMode
  case object FullRefresh extends RunMode
  final case class Backfill(start: LocalDate, stop: LocalDate) extends RunMode

  /** Resolve mode from CLI-style flags exactly as the reference does. */
  def resolve(
      fullRefresh: Boolean,
      backfill: Boolean,
      cliStart: Option[LocalDate],
      cliStop: Option[LocalDate]): RunMode =
    if (backfill) {
      val s = cliStart.getOrElse(throw new IllegalArgumentException(
        "backfill requires start_date (reference: materialization.sql:38-43)"))
      val e = cliStop.getOrElse(throw new IllegalArgumentException(
        "backfill requires stop_date (reference: materialization.sql:38-43)"))
      Backfill(s, e)
    } else if (fullRefresh) FullRefresh
    else Normal
}
