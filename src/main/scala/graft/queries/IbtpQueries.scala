package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ibtp._
import graft.sources.Tables

/** The materialization itself as a verifiable query: run the full
  * period loop into a scratch target, read the table back. The oracle
  * is the one-shot full-range SQL — proving the engine's defining
  * property loop(model) ≡ model over [start, stop).
  */
object IbtpQueries {

  /** Daily per-type aggregation model (the README's canonical example
    * shape, `/root/reference/README.md:62-70`).
    */
  private def dailyModel(dir: String): IbtpModel = new IbtpModel {
    def query(s: SparkSession, b: PeriodBounds): DataFrame =
      // range-aware reader: the period predicate reaches the parquet
      // scan via the raw nanos column (PlanSpec asserts PushedFilters)
      Tables.eventsRange(s, dir, b.from, b.to)
        .groupBy(col("ts").cast("date").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(CoreQueries.moneySum(col("value")), 4).as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
  }

  private def runLoop(spark: SparkSession, dir: String, period: PeriodUnit): DataFrame = {
    // probe the events range so the window covers the whole table at
    // any scale factor; stop = max date + 1 day (exclusive)
    val cfg0 = IbtpConfig(timestampField = "day", dateSourceModels = Seq("__events"))
    val (minD, maxD) = Boundaries.resolveStartStop(
      spark, cfg0.copy(timestampField = "ts"),
      Map("__events" -> Tables.events(spark, dir)))
    val cfg = IbtpConfig(
      timestampField = "day",
      startDate = Some(minD),
      stopDate = Some(maxD.get.plusDays(1)),
      period = period)
    val targetDir = QueryScratch.fresh(s"ibtp_q_${period.name}")
    val target = new TargetTable(spark, targetDir, "day", countRows = false)
    IbtpRunner.run(spark, dailyModel(dir), target,
      IbtpRunner.RunParams(cfg, maxConcurrentPeriods = 8))
    target.read().orderBy(col("day"), col("event_type"))
  }

  /** Day-period loop (~30 jobs at the fixtures' range). */
  def loopDaily(spark: SparkSession, dir: String): DataFrame =
    runLoop(spark, dir, PeriodUnit.Day)

  /** Week-period loop (~5 jobs) — same oracle, different tiling. */
  def loopWeekly(spark: SparkSession, dir: String): DataFrame =
    runLoop(spark, dir, PeriodUnit.Week)

  /** Month-period loop (1–2 jobs over the fixtures' range) — same
    * oracle, coarsest tiling.
    */
  def loopMonthly(spark: SparkSession, dir: String): DataFrame =
    runLoop(spark, dir, PeriodUnit.Month)

  /** Engine-chosen period (`--period auto`): no explicit start/stop/
    * period at all — the boundary probe resolves the window from the
    * source (reference `get_start_stop_dates`) and [[PeriodSizing]]
    * picks the finest period whose expected chunk reaches the band
    * minimum (`/root/reference/README.md:104`'s 6–60M guidance as
    * behavior; the band here is scaled to the fixtures). The band is
    * chosen so the DECISION varies with scale — ~33 rows/day/sf0.001
    * gives Month at sf0.001, Week at sf0.01, Day at sf0.1+ — yet the
    * loop ≡ one-shot oracle holds for whichever tiling the engine
    * picked, which is exactly what makes auto-sizing safe to trust.
    */
  def loopAutoSized(spark: SparkSession, dir: String): DataFrame = {
    // window like the other loop queries (probed max + 1 day — the
    // engine's stop is an exclusive clamp); the PERIOD is what stays
    // unset and engine-chosen here
    val cfg0 = IbtpConfig(timestampField = "day", dateSourceModels = Seq("__events"))
    val (minD, maxD) = Boundaries.resolveStartStop(
      spark, cfg0.copy(timestampField = "ts"),
      Map("__events" -> Tables.events(spark, dir)))
    val cfg = IbtpConfig(timestampField = "ts",
      startDate = Some(minD), stopDate = Some(maxD.get.plusDays(1)),
      dateSourceModels = Seq("__events"))
    val targetDir = QueryScratch.fresh("ibtp_q_autosize")
    val target = new TargetTable(spark, targetDir, "day", countRows = false)
    val res = IbtpRunner.run(spark, dailyModel(dir), target,
      IbtpRunner.RunParams(cfg, autoPeriod = true,
        minChunkRows = 1000, maxChunkRows = 100000, maxConcurrentPeriods = 8),
      sources = Map("__events" -> Tables.events(spark, dir)))
    require(res.sizing.nonEmpty, "auto sizing must have made a choice")
    target.read().orderBy(col("day"), col("event_type"))
  }

  /** Full build, then an idempotent backfill of a mid-history window
    * with the same model — the final table must STILL equal the
    * one-shot oracle. Puts the delete-then-insert replacement path
    * under the driver's hash gate, not just ScalaTest.
    */
  def loopBackfill(spark: SparkSession, dir: String): DataFrame = {
    val cfg0 = IbtpConfig(timestampField = "day", dateSourceModels = Seq("__events"))
    val (minD, maxD) = Boundaries.resolveStartStop(
      spark, cfg0.copy(timestampField = "ts"),
      Map("__events" -> Tables.events(spark, dir)))
    val stop = maxD.get.plusDays(1)
    val cfg = IbtpConfig(timestampField = "day",
      startDate = Some(minD), stopDate = Some(stop))
    val targetDir = QueryScratch.fresh("ibtp_q_backfill")
    val target = new TargetTable(spark, targetDir, "day", countRows = false)
    val model = dailyModel(dir)
    IbtpRunner.run(spark, model, target,
      IbtpRunner.RunParams(cfg, maxConcurrentPeriods = 8))
    // replace a 10-day window in the middle of the built history —
    // concurrently, through the lease-less optimistic replace path
    // (disjoint slices; identical contents, same oracle)
    val bStart = minD.plusDays(8)
    val bStop = minD.plusDays(18)
    IbtpRunner.run(spark, model, target,
      IbtpRunner.RunParams(cfg, RunMode.Backfill(bStart, bStop),
        maxConcurrentPeriods = 8))
    target.read().orderBy(col("day"), col("event_type"))
  }

  /** Full unique-key build, then a re-delivery of the last 10 days
    * upserted over it — the key-delete-then-insert path (reference
    * `loop.sql:100-107`) under the driver's hash gate: re-delivered
    * (day, event_type) keys must replace, not duplicate, so the final
    * table still equals the one-shot oracle.
    */
  def loopUpsert(spark: SparkSession, dir: String): DataFrame = {
    val cfg0 = IbtpConfig(timestampField = "day", dateSourceModels = Seq("__events"))
    val (minD, maxD) = Boundaries.resolveStartStop(
      spark, cfg0.copy(timestampField = "ts"),
      Map("__events" -> Tables.events(spark, dir)))
    val stop = maxD.get.plusDays(1)
    // build phase appends (no overlap → append ≡ upsert, at 1 job per
    // period instead of the upsert path's discovery+rewrite per period
    // — the reference's own "prefer no unique_key" guidance,
    // README.md:100-103); the operator under test is the re-delivery
    val cfg = IbtpConfig(timestampField = "day",
      startDate = Some(minD), stopDate = Some(stop))
    val targetDir = QueryScratch.fresh("ibtp_q_upsert")
    val target = new TargetTable(spark, targetDir, "day", countRows = false)
    val model = dailyModel(dir)
    IbtpRunner.run(spark, model, target,
      IbtpRunner.RunParams(cfg, maxConcurrentPeriods = 8))
    // re-deliver the last 10 days in one chunk: upsert must dedup
    val redo = model.query(spark, PeriodBounds(stop.minusDays(10), stop))
    target.upsert(redo, Seq("day", "event_type"))
    target.read().orderBy(col("day"), col("event_type"))
  }

  /** Full build, then poison rows appended (wrong values inside the
    * window AND rows past the true max date), then `RunMode.FullRefresh`
    * — the backup-swap rebuild (`/root/reference/macros/
    * insert_by_timeperiod_init.sql:21-44`: rename target→backup,
    * period-0 CTAS, loop resumes after the init chunk, drop backup).
    * The rebuilt table must equal the one-shot oracle, proving the swap
    * destroyed the poison rather than merging around it. This puts the
    * most destructive reference path under the driver's hash gate.
    */
  def loopFullRefresh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cfg0 = IbtpConfig(timestampField = "day", dateSourceModels = Seq("__events"))
    val (minD, maxD) = Boundaries.resolveStartStop(
      spark, cfg0.copy(timestampField = "ts"),
      Map("__events" -> Tables.events(spark, dir)))
    val stop = maxD.get.plusDays(1)
    // Week period: the rebuild's cost is the operator under test, not
    // the tiling — ~5 jobs instead of Day's ~30
    val cfg = IbtpConfig(timestampField = "day",
      startDate = Some(minD), stopDate = Some(stop), period = PeriodUnit.Week)
    val targetDir = QueryScratch.fresh("ibtp_q_fullrefresh")
    val target = new TargetTable(spark, targetDir, "day", countRows = false)
    val model = dailyModel(dir)
    IbtpRunner.run(spark, model, target,
      IbtpRunner.RunParams(cfg, maxConcurrentPeriods = 8))
    // poison: a wrong aggregate inside the window and a row beyond the
    // true max (would poison a naive resume — only a real swap removes it)
    val poison = Seq(
      (java.sql.Date.valueOf(minD.plusDays(3)), "poison_type", 999999L, 9.9e9, 999999L),
      (java.sql.Date.valueOf(stop.plusDays(30)), "poison_beyond_max", 1L, 1.0, 1L))
      .toDF("day", "event_type", "n_events", "total_value", "n_users")
    target.append(poison)
    IbtpRunner.run(spark, model, target,
      IbtpRunner.RunParams(cfg, RunMode.FullRefresh, maxConcurrentPeriods = 8))
    target.read().orderBy(col("day"), col("event_type"))
  }

  /** Build the first half of history with `n_events` as INT, then
    * resume over the rest with the model now emitting LONG, under the
    * default `on_schema_change=Ignore`. The reference widens target
    * column types UNCONDITIONALLY each iteration
    * (`insert_by_timeperiod_loop.sql:78-79`), independent of
    * on_schema_change — so the run must widen the target and complete,
    * and the final table must equal the one-shot oracle at the widened
    * BIGINT type (historic int32 parquet files read through the widened
    * schema via parquet type promotion).
    */
  def loopSchemaWiden(spark: SparkSession, dir: String): DataFrame = {
    val cfg0 = IbtpConfig(timestampField = "day", dateSourceModels = Seq("__events"))
    val (minD, maxD) = Boundaries.resolveStartStop(
      spark, cfg0.copy(timestampField = "ts"),
      Map("__events" -> Tables.events(spark, dir)))
    val stop = maxD.get.plusDays(1)
    val mid = minD.plusDays(15)
    def model(wide: Boolean): IbtpModel = new IbtpModel {
      def query(s: SparkSession, b: PeriodBounds): DataFrame =
        Tables.eventsRange(s, dir, b.from, b.to)
          .groupBy(col("ts").cast("date").as("day"), col("event_type"))
          .agg(
            (if (wide) count(lit(1)) else count(lit(1)).cast("int")).as("n_events"),
            round(CoreQueries.moneySum(col("value")), 4).as("total_value"),
            countDistinct(col("user_id")).as("n_users"))
    }
    val cfg = IbtpConfig(timestampField = "day",
      startDate = Some(minD), stopDate = Some(stop), period = PeriodUnit.Week)
    val targetDir = QueryScratch.fresh("ibtp_q_widen")
    val target = new TargetTable(spark, targetDir, "day", countRows = false)
    // first half lands as INT
    IbtpRunner.run(spark, model(wide = false), target,
      IbtpRunner.RunParams(cfg.copy(stopDate = Some(mid)), maxConcurrentPeriods = 8))
    // resume with the column now LONG: expandTargetColumnTypes widens
    IbtpRunner.run(spark, model(wide = true), target,
      IbtpRunner.RunParams(cfg, maxConcurrentPeriods = 8))
    target.read().orderBy(col("day"), col("event_type"))
  }

  /** Build the first half of history with `last_seen` as DATE, then
    * resume with the model emitting TIMESTAMP under
    * `on_schema_change=sync_all_columns` + the opt-in
    * [[IbtpRunner.RunParams.rewriteWidening]]. DATE→TIMESTAMP is
    * value-preserving but NOT a parquet read promotion, so the
    * metadata-only widening path must refuse it; the rewrite path
    * instead rewrites historic storage through the cast (the Spark
    * analogue of the warehouse-side ALTER behind the reference's
    * `expand_target_column_types`, `insert_by_timeperiod_loop.sql:78-79`,
    * which rewrites storage server-side). The oracle replays the
    * regime split: days built in phase one carry the midnight cast of
    * their old DATE value, later days the true MAX(ts).
    */
  def loopRewriteWiden(spark: SparkSession, dir: String): DataFrame = {
    val cfg0 = IbtpConfig(timestampField = "day", dateSourceModels = Seq("__events"))
    val (minD, maxD) = Boundaries.resolveStartStop(
      spark, cfg0.copy(timestampField = "ts"),
      Map("__events" -> Tables.events(spark, dir)))
    val stop = maxD.get.plusDays(1)
    val mid = minD.plusDays(15)
    def model(tsTyped: Boolean): IbtpModel = new IbtpModel {
      def query(s: SparkSession, b: PeriodBounds): DataFrame =
        Tables.eventsRange(s, dir, b.from, b.to)
          .groupBy(col("ts").cast("date").as("day"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            (if (tsTyped) max(col("ts")) else max(col("ts")).cast("date"))
              .as("last_seen"))
    }
    val cfg = IbtpConfig(timestampField = "day",
      startDate = Some(minD), stopDate = Some(stop), period = PeriodUnit.Week,
      onSchemaChange = OnSchemaChange.SyncAllColumns)
    val targetDir = QueryScratch.fresh("ibtp_q_rewiden")
    val target = new TargetTable(spark, targetDir, "day", countRows = false)
    // first half lands with last_seen as DATE
    IbtpRunner.run(spark, model(tsTyped = false), target,
      IbtpRunner.RunParams(cfg.copy(stopDate = Some(mid)), maxConcurrentPeriods = 8))
    require(target.read().schema("last_seen").dataType ==
      org.apache.spark.sql.types.DateType)
    // resume with TIMESTAMP: sync_all_columns + rewriteWidening rewrites
    // the historic storage through the cast, then the loop continues
    IbtpRunner.run(spark, model(tsTyped = true), target,
      IbtpRunner.RunParams(cfg, maxConcurrentPeriods = 8, rewriteWidening = true))
    require(target.read().schema("last_seen").dataType ==
      org.apache.spark.sql.types.TimestampType)
    target.read().orderBy(col("day"), col("event_type"))
  }

  /** Replays [[loopRewriteWiden]]'s regime split: phase-one days carry
    * the midnight cast of the old DATE value (`CAST(day AS TIMESTAMP)`
    * — the storage rewrite's cast of `CAST(MAX(ts) AS DATE)`), later
    * days the true MAX(ts).
    */
  val loopRewriteWidenSql: String =
    """WITH bounds AS (
      |  SELECT MIN(CAST(ts AS DATE)) + 15 AS mid FROM events
      |),
      |agg AS (
      |  SELECT CAST(ts AS DATE) AS day, event_type,
      |         COUNT(*) AS n_events, MAX(ts) AS max_ts
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT day, event_type, n_events,
      |       CASE WHEN day < b.mid THEN CAST(day AS TIMESTAMP)
      |            ELSE max_ts END AS last_seen
      |FROM agg, bounds b
      |ORDER BY day, event_type""".stripMargin

  /** The reference's recommended integrity workflow as a query: build
    * WITHOUT a unique key (`/root/reference/README.md:102` — key-driven
    * deletes are slow; "test for uniqueness only"), deliberately
    * re-deliver the last 10 days as a plain append, and emit the
    * uniqueness-check violations. The oracle reproduces the duplicate
    * construction in SQL — GROUP BY HAVING count > 1.
    */
  def loopUniqueCheck(spark: SparkSession, dir: String): DataFrame = {
    val cfg0 = IbtpConfig(timestampField = "day", dateSourceModels = Seq("__events"))
    val (minD, maxD) = Boundaries.resolveStartStop(
      spark, cfg0.copy(timestampField = "ts"),
      Map("__events" -> Tables.events(spark, dir)))
    val stop = maxD.get.plusDays(1)
    val cfg = IbtpConfig(timestampField = "day",
      startDate = Some(minD), stopDate = Some(stop), period = PeriodUnit.Week)
    val targetDir = QueryScratch.fresh("ibtp_q_uniq")
    val target = new TargetTable(spark, targetDir, "day", countRows = false)
    val model = dailyModel(dir)
    IbtpRunner.run(spark, model, target,
      IbtpRunner.RunParams(cfg, maxConcurrentPeriods = 8))
    // re-delivery WITHOUT upsert: duplicates by construction
    target.append(model.query(spark, PeriodBounds(stop.minusDays(10), stop)))
    TableChecks.uniqueViolations(target.read(), Seq("day", "event_type"))
      .select(col("day"), col("event_type"), col("dup_count"))
      .orderBy(col("day"), col("event_type"))
  }

  val loopUniqueCheckSql: String =
    """WITH bounds AS (
      |  SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) + 1 AS hi FROM events
      |),
      |agg AS (
      |  SELECT CAST(ts AS DATE) AS day, event_type FROM events
      |  GROUP BY 1, 2
      |),
      |redo AS (
      |  SELECT CAST(e.ts AS DATE) AS day, e.event_type
      |  FROM events e, bounds b
      |  WHERE e.ts >= b.hi - 10 AND e.ts < b.hi
      |  GROUP BY 1, 2
      |),
      |unioned AS (
      |  SELECT day, event_type FROM agg
      |  UNION ALL
      |  SELECT day, event_type FROM redo
      |)
      |SELECT day, event_type, COUNT(*) AS dup_count
      |FROM unioned GROUP BY 1, 2 HAVING COUNT(*) > 1
      |ORDER BY day, event_type""".stripMargin

  /** Clustered compaction under the hash gate: ingest raw events as
    * two appends per day-partition (each partition ends fragmented,
    * every file spanning the full user_id range — the worst case for
    * min/max pruning), then `compact(clusterBy = user_id)` merges and
    * RANGE-CLUSTERS each partition. The oracle is the one-shot SELECT:
    * compaction (clustered or not) must be invisible to contents; the
    * clustering itself — disjoint per-file key ranges — is pinned by
    * ReaderSnapshotSpec's clustered-compaction case. This is the
    * OPTIMIZE/Z-ORDER-lite maintenance a 100 TB table runs so selective
    * predicates touch one file per partition instead of all of them.
    */
  def compactCluster(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("ts"), col("event_id"), col("user_id"),
        col("event_type"), col("value"))
    val targetDir = QueryScratch.fresh("ibtp_q_cluster")
    val target = new TargetTable(spark, targetDir, "ts", countRows = false)
    // a TOTAL split: NULL user_ids go to the even slice, so the two
    // appends partition the rows exactly at every scale
    val even = coalesce(col("user_id") % 2, lit(0)) === 0
    target.init(ev.filter(even))
    target.append(ev.filter(!even))
    val stats = target.compact(clusterBy = Seq("user_id"))
    require(stats.nonEmpty, "fragmented partitions must compact")
    target.read()
      .orderBy(col("ts"), col("event_id"))
  }

  val compactClusterSql: String =
    """SELECT ts, event_id, user_id, event_type, value
      |FROM events
      |ORDER BY ts, event_id""".stripMargin

  /** Manifest data-skipping under the hash gate: fragmented ingest of
    * the low three user_id quartiles, `compact(clusterBy = user_id)`
    * (declares the stats column, records per-file min/max from the
    * staged footers), then the top quartile appended as a separate
    * commit — its files carry a narrow recorded range. The read plans
    * through [[TargetTable.readWhere]], which prunes the file list
    * DRIVER-SIDE from the manifest stats (zero footer opens for skipped
    * files) and the query REQUIRES that pruning actually dropped files,
    * so the hash gate adjudicates both the plan behavior and the
    * contents. At 100 TB this is the difference between a cluster-key
    * point query opening every live footer and opening only the files
    * whose recorded range can hold the key.
    */
  def skipRead(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("ts"), col("event_id"), col("user_id"),
        col("event_type"), col("value"))
    val mx = ev.agg(max(col("user_id"))).head.getLong(0)
    val q3 = 3L * mx / 4L
    val targetDir = QueryScratch.fresh("ibtp_q_skip")
    val target = new TargetTable(spark, targetDir, "ts", countRows = false)
    val even = coalesce(col("user_id") % 2, lit(0)) === 0
    val base = ev.filter(col("user_id") <= q3)
    target.init(base.filter(even))
    target.append(base.filter(!even))
    require(target.compact(clusterBy = Seq("user_id")).nonEmpty,
      "fragmented partitions must compact")
    target.append(ev.filter(col("user_id") > q3))
    val (kept, total) = target.planFilesForRange("user_id", q3 + 1L, mx)
    require(kept.size < total,
      s"data skipping must prune the planned file list (kept ${kept.size} of $total)")
    target.readWhere("user_id", q3 + 1L, mx)
      .orderBy(col("ts"), col("event_id"))
  }

  val skipReadSql: String =
    """WITH b AS (SELECT (3 * MAX(user_id)) // 4 AS q3 FROM events)
      |SELECT ts, event_id, user_id, event_type, value
      |FROM events, b
      |WHERE user_id > b.q3
      |ORDER BY ts, event_id""".stripMargin

  /** Multi-dimensional data skipping under the hash gate: fragmented
    * ingest of the low-quartile bulk, `compact(clusterBy = (user_id,
    * event_id), zorder = true)` — Morton layout, per-file stats on BOTH
    * dimensions — then two appends each narrow on a DIFFERENT dimension
    * (top user quartile; top event quartile). The conjunctive read
    * plans through [[TargetTable.readWhereAll]], and the query REQUIRES
    * that EACH dimension's pruning dropped files on its own — the
    * trailing dimension included, which is exactly what a
    * lexicographic layout cannot serve. At 100 TB this is OPTIMIZE
    * ZORDER BY: one clustered table answering selective predicates on
    * any clustered column without opening off-range footers.
    */
  def zorderRead(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("ts"), col("event_id"), col("user_id"),
        col("event_type"), col("value"))
    val mx = ev.agg(max(col("user_id")).as("u"), max(col("event_id")).as("e")).head
    val (q3u, q3e) = (3L * mx.getLong(0) / 4L, 3L * mx.getLong(1) / 4L)
    val targetDir = QueryScratch.fresh("ibtp_q_zorder")
    val target = new TargetTable(spark, targetDir, "ts", countRows = false)
    // a TOTAL split on coalesced keys: top-user slice, then top-event
    // slice of the rest, then the bulk — every row lands exactly once
    val u = coalesce(col("user_id"), lit(0L))
    val e = coalesce(col("event_id"), lit(0L))
    val topU = u > q3u
    val topE = !topU && (e > q3e)
    val base = ev.filter(!topU && !topE)
    val even = coalesce(col("user_id") % 2, lit(0)) === 0
    target.init(base.filter(even))
    target.append(base.filter(!even))
    require(target.compact(clusterBy = Seq("user_id", "event_id"),
      zorder = true).nonEmpty, "fragmented partitions must compact")
    target.append(ev.filter(topU))
    target.append(ev.filter(topE))
    // each dimension must prune on its own — user_id drops the top-user
    // files, event_id drops the top-event files (zorder statted both)
    val (ku, totU) = target.planFilesForRange("user_id", 0L, q3u)
    val (ke, totE) = target.planFilesForRange("event_id", 0L, q3e)
    require(ku.size < totU,
      s"user_id pruning must drop files (kept ${ku.size} of $totU)")
    require(ke.size < totE,
      s"event_id pruning must drop files (kept ${ke.size} of $totE)")
    target.readWhereAll(Seq(("user_id", 0L, q3u), ("event_id", 0L, q3e)))
      .orderBy(col("ts"), col("event_id"))
  }

  val zorderReadSql: String =
    """WITH b AS (SELECT (3 * MAX(user_id)) // 4 AS q3u,
      |                  (3 * MAX(event_id)) // 4 AS q3e FROM events)
      |SELECT ts, event_id, user_id, event_type, value
      |FROM events, b
      |WHERE user_id BETWEEN 0 AND b.q3u
      |  AND event_id BETWEEN 0 AND b.q3e
      |ORDER BY ts, event_id""".stripMargin

  /** Categorical value-set skipping under the hash gate: a bulk ingest
    * of most event types (pre-declaration — those files record no
    * sets), then [[TargetTable.declareSetColumns]] on `event_type`, and
    * one append per remaining type — each appended file's parquet
    * DICTIONARY records its exact (here singleton) value set in the
    * manifest. The read plans through [[TargetTable.readWhereIn]],
    * which prunes the file list DRIVER-SIDE to the files whose recorded
    * set contains the looked-up type (plus the conservative set-less
    * bulk), and the query REQUIRES that pruning dropped files. Min/max
    * stats cannot serve this lookup — every bulk file spans the whole
    * tiny value range — which is exactly the gap the dictionary-derived
    * sets close: at 100 TB, a `lang = 'de'` slice touches only the
    * files that ever stored a 'de' row.
    */
  def setRead(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("ts"), col("event_id"), col("user_id"),
        col("event_type"), col("value"))
    val types = ev.select(col("event_type")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    require(types.size >= 3, s"need >= 3 event types, got $types")
    val targetDir = QueryScratch.fresh("ibtp_q_set")
    val target = new TargetTable(spark, targetDir, "ts", countRows = false)
    target.init(ev.filter(col("event_type").isin(types.dropRight(2): _*)))
    target.declareSetColumns(Seq("event_type"))
    types.takeRight(2).foreach { et =>
      target.append(ev.filter(col("event_type") === et))
    }
    val lookup = types.last
    val (kept, total) = target.planFilesForIn("event_type", Seq(lookup))
    require(kept.size < total,
      s"value-set skipping must prune the planned file list " +
        s"(kept ${kept.size} of $total)")
    target.readWhereIn("event_type", Seq(lookup))
      .orderBy(col("ts"), col("event_id"))
  }

  val setReadSql: String =
    """SELECT ts, event_id, user_id, event_type, value
      |FROM events
      |WHERE event_type = (SELECT MAX(event_type) FROM events)
      |ORDER BY ts, event_id""".stripMargin

  /** Both loop queries share this one-shot full-range oracle. */
  val loopOracleSql: String =
    """SELECT CAST(ts AS DATE) AS day, event_type,
      |       COUNT(*) AS n_events,
      |       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_value,
      |       COUNT(DISTINCT user_id) AS n_users
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin

  /** Optimistic concurrent writers under the hash gate: after a
    * lease-held init of one third of the events, TWO separate
    * [[TargetTable]] instances — the multi-process shape — append the
    * other two thirds CONCURRENTLY via [[TargetTable.appendConcurrent]]
    * (Delta-style lease-less commits: per-sequence claim + per-attempt
    * conflict validation). The query REQUIRES that no writer lease was
    * ever created and that both threads succeeded, so the hash gate
    * adjudicates that two independent pipelines landing on one table
    * serialize only at the commit protocol, never behind a lease —
    * with contents exactly equal to the one-shot load.
    */
  def concurrentAppend(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("ts"), col("event_id"), col("user_id"),
        col("event_type"), col("value"))
    val targetDir = QueryScratch.fresh("ibtp_q_ccappend") + "/tbl"
    val t0 = new TargetTable(spark, targetDir, "ts", countRows = false)
    // a TOTAL three-way split on the coalesced key
    val slice = coalesce(col("user_id") % 3, lit(0))
    t0.init(ev.filter(slice === 0))
    val writers = Seq(1, 2).map(_ => new TargetTable(spark, targetDir, "ts",
      countRows = false))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = writers.zip(Seq(1, 2)).map { case (w, i) =>
      new Thread(() => {
        try w.appendConcurrent(ev.filter(slice === i))
        catch { case e: Throwable => errs.add(e) }
      }, s"q98-writer-$i")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(300000))
    require(errs.isEmpty, s"both concurrent appenders must commit: ${errs.peek()}")
    // assert via the table's OWN filesystem, not java.io.File — a
    // java.io check silently passes (vacuously) on any non-local store
    val lease = new org.apache.hadoop.fs.Path(targetDir + TargetTable.LeaseSuffix)
    val hfs = lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!hfs.exists(lease),
      "optimistic appends must not take the writer lease")
    t0.read().orderBy(col("ts"), col("event_id"))
  }

  val concurrentAppendSql: String =
    """SELECT ts, event_id, user_id, event_type, value
      |FROM events
      |ORDER BY ts, event_id""".stripMargin

  /** Optimistic concurrent BACKFILLS under the hash gate: the table
    * initializes with two disjoint mid-history windows POISONED, then
    * two separate [[TargetTable]] instances repair one window each via
    * [[TargetTable.replaceRangeConcurrent]] — lease-less, conflict-
    * checked per commit attempt, removal sets recomputed per attempt.
    * Poisoning makes the gate sharp: the final table equals the
    * one-shot load ONLY if both replaces actually landed (a silently
    * lost replace would leave its window poisoned and hash-mismatch).
    * The query also REQUIRES that no writer lease was ever created and
    * both threads succeeded — two independent backfill pipelines
    * landing on one table serialize only at the commit protocol, the
    * reference's own idempotent-replace workflow
    * (`insert_by_timeperiod_loop.sql:92-99`) run in parallel.
    */
  def concurrentBackfill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("ts"), col("event_id"), col("user_id"),
        col("event_type"), col("value"))
    val minD = ev.agg(min(col("ts").cast("date"))).head
      .getDate(0).toLocalDate
    val w1 = (minD.plusDays(5), minD.plusDays(10))
    val w2 = (minD.plusDays(15), minD.plusDays(20))
    def inWin(w: (java.time.LocalDate, java.time.LocalDate)) =
      col("ts").cast("date") >= lit(java.sql.Date.valueOf(w._1)) &&
        col("ts").cast("date") < lit(java.sql.Date.valueOf(w._2))
    val targetDir = QueryScratch.fresh("ibtp_q_ccbackfill") + "/tbl"
    val t0 = new TargetTable(spark, targetDir, "ts", countRows = false)
    t0.init(ev.withColumn("value",
      when(inWin(w1) || inWin(w2), lit(-999999.0)).otherwise(col("value"))))
    val writers = Seq(w1, w2).map(_ => new TargetTable(spark, targetDir, "ts",
      countRows = false))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = writers.zip(Seq(w1, w2)).zipWithIndex.map { case ((wr, w), i) =>
      new Thread(() => {
        try wr.replaceRangeConcurrent(ev.filter(inWin(w)), w._1, w._2)
        catch { case e: Throwable => errs.add(e) }
      }, s"q104-backfill-$i")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(300000))
    require(errs.isEmpty,
      s"both concurrent backfills must commit: ${errs.peek()}")
    val lease = new org.apache.hadoop.fs.Path(targetDir + TargetTable.LeaseSuffix)
    val hfs = lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!hfs.exists(lease),
      "optimistic backfills must not take the writer lease")
    // the marker check goes through the table's OWN filesystem too —
    // a java.io.File listing is vacuously empty on a non-local store
    require(!hfs.listStatus(new org.apache.hadoop.fs.Path(targetDir)).exists(
      _.getPath.getName.startsWith(TargetTable.ReplaceIntentPrefix)),
      "both replace markers must be cleared")
    t0.read().orderBy(col("ts"), col("event_id"))
  }

  val concurrentBackfillSql: String = concurrentAppendSql
}
