package graft.ibtp

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Result of one materialization run. */
final case class IbtpResult(
    mode: RunMode,
    window: Option[Boundaries.Window],
    periodsRun: Seq[Boundaries.PeriodSlice],
    rowsInserted: Long,
    /** The period the run actually tiled with — the configured one, or
      * the auto-sized choice when `RunParams.autoPeriod` is set.
      */
    period: PeriodUnit = PeriodUnit.Day,
    /** Auto-sizing measurement, when it ran. */
    sizing: Option[PeriodSizing.Choice] = None)

/** The materialization orchestrator — reference A1 + A11
  * (`insert_by_timeperiod_materialization.sql:2-86`,
  * `insert_by_timeperiod_loop.sql:3-146`).
  *
  * Control plane runs on the Spark driver; each period is one
  * independent Spark write job ("commit per period",
  * `loop.sql:134` ≙ per-job atomic partition write). The loop is
  * sequential like the reference — resumability depends on period i
  * being durable before period i+1 starts. On failure mid-loop, a
  * re-run without full refresh resumes from MAX(ts)+1 day
  * (`README.md:9-11`).
  *
  * Scale shape (100 TB target, 1000 executors): the driver loop issues
  * period-sized jobs; within each job all parallelism is Spark's.
  * Period sizing follows the reference's own guidance — pick `period`
  * so a chunk is 6–60 M rows (`README.md:104`); the per-job shuffle
  * then fits executor memory and AQE coalesces post-shuffle partitions.
  */
object IbtpRunner {

  final case class RunParams(
      config: IbtpConfig,
      mode: RunMode = RunMode.Normal,
      cliStart: Option[LocalDate] = None,
      cliStop: Option[LocalDate] = None,
      today: LocalDate = LocalDate.now(),
      log: String => Unit = _ => (),
      /** Pre/post hooks — the reference's `run_hooks(pre_hooks)` /
        * `run_hooks(post_hooks)` (`materialization.sql:65,82`): SQL
        * statements run before the init/loop and after the loop.
        *
        * Fidelity note: the reference also runs in-transaction post
        * hooks inside each init commit (`init.sql:70`,
        * `run_hooks(..., inside_transaction=True)`). Spark has no
        * cross-statement transactions — every write commits on its own
        * — so there is no "inside the commit" point to attach to;
        * post-hooks here run once, after the loop. Hooks that must see
        * each period's rows can instead be expressed as part of the
        * model query itself.
        */
      preHooks: Seq[String] = Nil,
      postHooks: Seq[String] = Nil,
      /** When true, statically verify (once per run) that every
        * time-bearing source scan in the model plan sits under a date
        * filter — the contract the reference can only document
        * (`README.md:96`). Off by default for fidelity.
        */
      guardPeriodFilter: Boolean = false,
      /** Periods submitted to Spark concurrently. 1 (default) is the
        * reference's strictly sequential loop: period i is durable
        * before i+1 starts, so resume-from-max never skips a gap.
        * Higher values run independent period jobs in parallel through
        * a bounded sliding window (a period starts as soon as a slot
        * frees; the frontier never runs more than 2× this value past
        * the oldest unfinished period) — append-mode periods write
        * disjoint day-partitions, so results are identical and
        * idempotent; the trade is that a mid-run failure can leave
        * holes behind the max partition (at most 2× this value of
        * committed periods beyond the failed one), which a backfill of
        * the run window or [[repairHoles]] repairs. Backfill mode runs
        * its disjoint window slices through the lease-less optimistic
        * replace ([[TargetTable.replaceRangeConcurrent]], the q104
        * shape) when > 1 and the table is manifest-era; a mid-run
        * failure leaves some windows replaced and some not, repaired
        * by idempotently re-running the same backfill. LIMITATION: the
        * optimistic replace owns exactly its date range, so a model
        * that emits NULL-timestamp rows (they land in the date-less
        * default partition) fails a concurrent backfill mid-run with a
        * clear remedy (re-run with 1, which uses the lease-held
        * replaceRange); already-replaced periods stay correct. Upsert
        * mode ignores this and stays sequential (periods may touch
        * shared partitions).
        */
      maxConcurrentPeriods: Int = 1,
      /** Auto-size the period from the date-source models' measured
        * row rate (README.md:104's 6–60 M-rows-per-chunk guidance as
        * behavior): pick the finest period whose expected chunk reaches
        * `minChunkRows`. Requires `dateSourceModels` (the tables that
        * define the time range); falls back to the configured period
        * otherwise. The probe is one count+min+max job over them.
        */
      autoPeriod: Boolean = false,
      minChunkRows: Long = PeriodSizing.DefaultMinChunkRows,
      maxChunkRows: Long = PeriodSizing.DefaultMaxChunkRows,
      /** Opt-in post-loop auto-compaction: after the loop and the
        * post-hooks, any day-partition in the run window whose file
        * count exceeds what this target file size calls for is
        * rewritten in place ([[TargetTable.compact]] — crash-safe,
        * metadata-only skip when already compact). Scoped to THIS
        * run's window, so the maintenance cost stays proportional to
        * the run, not the table: a year of daily runs compacts each
        * partition as it's written, never re-listing history — file
        * counts stay bounded without a separate maintenance job.
        * None (default) = off, preserving the reference's behavior.
        */
      autoCompactTargetFileBytes: Option[Long] = None,
      /** Opt-in storage-rewrite widening under sync_all_columns: a
        * type change that is value-preserving but unreadable through a
        * widened sidecar over historic parquet (date→timestamp,
        * x→string) rewrites the table's storage through the cast —
        * crash-safe via the init backup swap — instead of failing with
        * the full-refresh remedy. Off by default: the rewrite is a
        * full-table pass, which at scale should be a deliberate choice
        * (the reference's warehouse ALTER does the same rewrite
        * server-side, silently).
        */
      rewriteWidening: Boolean = false,
      /** Opt-in per-period post-step, invoked AFTER a period's write
        * commits with the period's bounds and its model frame — the
        * hook retrieval-index maintenance attaches to (e.g.
        * [[graft.operators.LexicalIndex.append]] per period keeps a
        * lexical index current with the materialization; see
        * q103_bm25_loop_index). Init's period-0 chunk fires it too —
        * it is a period materialization like any other. Contract is
        * AT-LEAST-ONCE per period (a re-run, full refresh, or backfill
        * re-invokes it for re-materialized periods), so the step must
        * be idempotent or its consumer must dedup — the streaming
        * foreachBatch contract. Failures propagate and fail the run
        * before later periods build on them. With
        * `maxConcurrentPeriods > 1` the step runs concurrently across
        * periods, on the period's worker thread.
        */
      periodPostStep: Option[(PeriodBounds, DataFrame) => Unit] = None)

  /** One materialization run, serialized per target by the writer
    * lease: the crash repairs below and the loop's intent-marker state
    * machines assume a single writer (the reference gets the same
    * guarantee from warehouse transactions, `loop.sql:134`), so a
    * second concurrent run of the same target fails fast instead of
    * destructively "repairing" this one's in-flight work. The lease
    * heartbeats once per period; a run that died without releasing goes
    * stale after [[TargetTable.LeaseStaleMs]] and the next run takes
    * over.
    */
  def run(
      spark: SparkSession,
      model: IbtpModel,
      target: TargetTable,
      params: RunParams,
      sources: Map[String, DataFrame] = Map.empty): IbtpResult =
    target.withWriterLease() { runLocked(spark, model, target, params, sources) }

  private def runLocked(
      spark: SparkSession,
      model: IbtpModel,
      target: TargetTable,
      params: RunParams,
      sources: Map[String, DataFrame]): IbtpResult = {
    val cfg  = params.config
    val mode = params.mode
    val log  = params.log

    // CLI start/stop take precedence over config (`materialization.sql:45-49`)
    val effectiveCfg = cfg.copy(
      startDate = params.cliStart.orElse(cfg.startDate),
      stopDate = params.cliStop.orElse(cfg.stopDate))

    val (startDate, stopDate) =
      Boundaries.resolveStartStop(spark, effectiveCfg, sources)

    // auto period sizing (README.md:104 as behavior): measure rows/day
    // over the date-source models, pick the finest period meeting the
    // chunk band; explicit config period is used as-is otherwise
    val sizing: Option[PeriodSizing.Choice] =
      if (!params.autoPeriod) None
      else {
        // same name resolution as the boundary probe: explicit sources
        // map first, then the session catalog (CLI-registered views).
        // No dateSourceModels -> no sizing (arbitrary bound sources may
        // lack the timestamp column or skew the rate; the boundary
        // probe likewise refuses to guess)
        val sized = effectiveCfg.dateSourceModels
          .map(n => sources.getOrElse(n, spark.table(n)))
        val c = PeriodSizing.choose(cfg.timestampField, sized,
          params.minChunkRows, params.maxChunkRows)
        c.foreach(ch => log(
          f"[ibtp] auto period: ${ch.rowsPerDay}%.1f rows/day -> " +
            f"${ch.period.name} (~${ch.expectedChunkRows}%d rows/chunk" +
            (if (ch.outsideBand) ", outside the configured band)" else ")")))
        if (c.isEmpty) log("[ibtp] auto period: no measurable sources; " +
          s"using configured period ${cfg.period.name}")
        c
      }
    val period = sizing.map(_.period).getOrElse(cfg.period)

    params.preHooks.foreach(spark.sql(_).collect()) // run_hooks(pre_hooks)

    // static period-filter guard BEFORE any model execution — init
    // itself runs the model, so checking later would let an unfiltered
    // model load the full range once before being caught
    if (params.guardPeriodFilter) {
      val b = PeriodBounds(
        Boundaries.periodFrom(period, 0, startDate),
        Boundaries.periodTo(period, 0, startDate, stopDate))
      graft.plans.PeriodFilterGuard.require(model.query(spark, b))
    }

    // Heal crashed-predecessor state BEFORE the init decision and the
    // resume probe. A full-refresh swap orphan restores/finishes the
    // swap (changing target.exists and the resumable max); a replace
    // orphan's cleanup-phase repair can change maxPartitionDate; a
    // mid-write replace orphan at least logs its re-backfill remedy on
    // EVERY run — not only on the next replaceRange — instead of
    // letting MAX(ts)+1 resumes keep building silently on an
    // untrustworthy range.
    target.repairOrphanedSwap()
    if (target.exists) {
      target.repairOrphanedReplace()
      // append orphans (files moved in, manifest commit lost) must roll
      // back HERE — start-of-run is the single-writer point — or the
      // re-materialized period's touched-dir relist absorbs them as
      // silent duplicate rows
      val healed = target.repairOrphanedAppends()
      if (healed > 0) log(s"[ibtp] repaired $healed orphaned append(s)")
      val healedR = target.repairOrphanedConcurrentReplaces()
      if (healedR > 0) log(s"[ibtp] repaired $healedR orphaned optimistic replace(s)")
    }
    // compact orphans were previously healed only by the next compact()
    // call — with auto-compaction opt-in and off, a crashed CLI
    // --compact-only run left that day's data dot-hidden indefinitely
    target.repairOrphanedCompact()
      .foreach(d => log(s"[ibtp] repaired orphaned compaction of $d"))
    target.sweepOrphanedStaging()
    // reap retention-expired compaction leftovers (start-of-run is the
    // single-writer point, like the staging sweep above)
    target.vacuum()

    // ---- init path (`materialization.sql:68-77` → init.sql) ----------
    val needInit = !target.exists || mode == RunMode.FullRefresh
    val isBackfill = mode.isInstanceOf[RunMode.Backfill]
    var rowsInserted = 0L
    // partition range init wrote, for the auto-compaction range
    // (init's period-0 CTAS lands BEFORE the loop's first slice, and
    // when the whole configured range fits in period 0 the loop below
    // is a no-op — compaction must still cover what init wrote)
    var initFrom: Option[LocalDate] = None
    var initTo: Option[LocalDate] = None // exclusive, like a slice's `to`
    if (needInit && !isBackfill) {
      // CTAS from period 0 of the model (init loads period 1 of data,
      // `init.sql:33-37`), or from the schema-sample override query
      // (`init.sql:9-19`) which establishes schema with zero data rows.
      val initDf = effectiveCfg.sampleSelectForSchema match {
        case Some(sampleSql) if !target.exists =>
          spark.sql(sampleSql).limit(0)
        case _ =>
          val b = PeriodBounds(
            Boundaries.periodFrom(period, 0, startDate),
            Boundaries.periodTo(period, 0, startDate, stopDate))
          initFrom = Some(b.from)
          initTo = Some(b.to)
          model.query(spark, b)
      }
      val n = target.init(initDf)
      rowsInserted += n
      log(s"[ibtp] init: created target with $n rows")
      // init's chunk is period 0's materialization — the per-period
      // post-step must see it or a loop-maintained index would
      // silently miss the first period (the schema-sample init writes
      // no rows and has no period bounds, so it fires nothing)
      (initFrom, initTo) match {
        case (Some(f), Some(t)) =>
          params.periodPostStep.foreach(_(PeriodBounds(f, t), initDf))
        case _ => ()
      }
    }

    // ---- loop (`loop.sql:3-146`) -------------------------------------
    // resume probe: partition-metadata listing, no data scan (the
    // reference must run MAX(ts) on the warehouse here, helpers.sql:119)
    val targetMax = if (target.exists) target.maxPartitionDate else None
    val window = Boundaries.runWindow(
      period, startDate, stopDate, targetMax, mode, params.today)

    // opt-in auto-compaction over exactly the partitions this run
    // could have touched — init's period-0 CTAS included (see the
    // RunParams scaladoc). `stopExclusive` is a slice-style exclusive
    // end bound; the inclusive last day is stop - 1.
    def autoCompact(first: Option[LocalDate], stopExclusive: Option[LocalDate]): Unit =
      params.autoCompactTargetFileBytes.foreach { bytes =>
        (first, stopExclusive) match {
          case (Some(f), Some(stop)) =>
            val last = stop.minusDays(1)
            val to = if (last.isBefore(f)) f else last
            target.compact(Some(f), Some(to), bytes)
              .foreach(st => log(s"[ibtp] compacted ${st.partitionLabel}: " +
                s"${st.filesBefore} -> ${st.filesAfter} files"))
          case _ => ()
        }
      }

    if (window.numPeriods <= 0 || !window.start.isBefore(window.stop)) {
      log(s"[ibtp] nothing to do: window ${window.start}..${window.stop}")
      params.postHooks.foreach(spark.sql(_).collect())
      // an init-only run reaches this return (the resume probe already
      // sees init's rows) — what init wrote still needs compacting
      autoCompact(initFrom, initTo)
      return IbtpResult(mode, Some(window), Nil, rowsInserted, period, sizing)
    }

    val loopStop = mode match {
      case RunMode.Backfill(_, e) => Some(e)
      case _                      => Some(window.stop)
    }
    val slices = Boundaries.slices(period, window, loopStop)

    // schema-change handling once per run (schemas are constant across
    // periods); full refresh forces 'ignore' (`materialization.sql:73`)
    val schemaMode =
      if (mode == RunMode.FullRefresh) OnSchemaChange.Ignore
      else effectiveCfg.onSchemaChange
    slices.headOption.foreach { s =>
      val probe = model.query(spark, PeriodBounds(s.from, s.to))
      // df.schema is free pre-execution
      target.evolveSchema(probe.schema, schemaMode, params.rewriteWidening)
      // the reference widens target column types UNCONDITIONALLY each
      // iteration (`loop.sql:78-79`), independent of on_schema_change —
      // an int column becoming long mid-history widens the target
      // rather than failing the insert
      target.expandTargetColumnTypes(probe.schema)
    }

    def runSlice(s: Boundaries.PeriodSlice, isolated: Boolean): Long = {
      target.heartbeatLease() // per-period: a live loop never goes stale
      val periodDf = model.query(spark, PeriodBounds(s.from, s.to))
      val n = mode match {
        case _: RunMode.Backfill if isolated =>
          // concurrent disjoint-period replacement: the slices tile the
          // backfill window without overlap, which is exactly the
          // lease-less optimistic replace's contract (per-call intent
          // marker, per-attempt removal recompute) — the lease-held
          // replaceRange's global marker and entry repairs assume one
          // replace in flight and must stay sequential
          target.replaceRangeConcurrent(periodDf, s.from, s.to)
        case _: RunMode.Backfill =>
          // idempotent period replacement (`loop.sql:92-99,108-114`)
          target.replaceRange(periodDf, s.from, s.to)
        case _ if effectiveCfg.uniqueKey.nonEmpty =>
          target.upsert(periodDf, effectiveCfg.uniqueKey)
        case _ if isolated =>
          target.appendIsolated(periodDf)
        case _ =>
          target.append(periodDf)
      }
      log(f"[ibtp] period ${s.offset + 1}%d of ${window.numPeriods}%d " +
        s"[${s.from}, ${s.to}): $n rows")
      params.periodPostStep.foreach(_(PeriodBounds(s.from, s.to), periodDf))
      n
    }

    // concurrency on the plain-append path, and on backfill when the
    // table is manifest-era (replaceRangeConcurrent's requirement —
    // disjoint period slices are precisely its q104-proven shape; a
    // mid-run failure leaves some windows replaced and some not, which
    // a re-run of the same backfill repairs idempotently, the same
    // exposure the concurrent append path documents). Upsert's
    // read-rewrite touches shared partitions and stays sequential.
    val concurrency =
      if (effectiveCfg.uniqueKey.nonEmpty) 1
      else if (isBackfill && target.latestManifest().isEmpty) 1
      else math.max(1, params.maxConcurrentPeriods)
    if (concurrency == 1) {
      slices.foreach(s => rowsInserted += math.max(runSlice(s, isolated = false), 0))
    } else {
      // BOUNDED SLIDING WINDOW, not fixed batches: the batched form
      // (grouped(cc) + barrier) made every batch wait for its slowest
      // member — with cc=8 over 30 periods that is 3 straggler tails
      // of pure idle. Here a period is submitted the moment a slot
      // frees, with a lookahead bound (2×cc) on how far past the
      // OLDEST unfinished period the frontier may run: a mid-run
      // failure can therefore leave at most `2×cc` committed periods
      // beyond the failed one (the batched form bounded this to the
      // batch end — same order, same repair: re-run the window or
      // repairHoles). On failure, nothing new is submitted and every
      // in-flight period is waited out so the failure state is
      // quiescent before the exception propagates.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(concurrency)
      val ecs = new java.util.concurrent.ExecutorCompletionService[(Int, Long)](pool)
      val lookahead = 2 * concurrency
      val done = Array.fill(slices.size)(false)
      var oldestUndone = 0
      var next = 0
      var inFlight = 0
      var failure: Option[Throwable] = None
      try {
        while ((next < slices.size && failure.isEmpty) || inFlight > 0) {
          while (failure.isEmpty && next < slices.size &&
              inFlight < concurrency && next < oldestUndone + lookahead) {
            val idx = next
            ecs.submit(() => (idx, runSlice(slices(idx), isolated = true)))
            inFlight += 1
            next += 1
          }
          val f = ecs.take()
          inFlight -= 1
          try {
            val (idx, n) = f.get()
            done(idx) = true
            while (oldestUndone < slices.size && done(oldestUndone)) oldestUndone += 1
            rowsInserted += math.max(n, 0L)
          } catch {
            case e: java.util.concurrent.ExecutionException =>
              // keep the FIRST failure; later siblings only drain
              if (failure.isEmpty) failure = Some(e.getCause)
          }
        }
      } finally {
        pool.shutdown()
        pool.awaitTermination(1, java.util.concurrent.TimeUnit.HOURS)
        ()
      }
      failure.foreach { e =>
        throw (e match {
          case iae: IllegalArgumentException
              if isBackfill && iae.getMessage != null &&
                iae.getMessage.contains("fresh rows land outside") =>
            // the concurrent replace owns exactly its range, so a model
            // emitting NULL-timestamp (or out-of-range) rows cannot run
            // concurrently — surface the remedy at the runner level
            new IllegalArgumentException(
              "concurrent backfill: the model emitted rows outside its " +
                "period slice (NULL-timestamp rows land in the date-less " +
                "partition no range can claim) — re-run this backfill " +
                "with maxConcurrentPeriods = 1, which routes through the " +
                "lease-held replaceRange and owns the NULL partition too. " +
                "Periods already replaced by this run are correct and the " +
                "re-run is idempotent. Cause: " + iae.getMessage, iae)
          case other => other
        })
      }
    }

    params.postHooks.foreach(spark.sql(_).collect()) // run_hooks(post_hooks)

    autoCompact(
      (initFrom.toSeq ++ slices.headOption.map(_.from)).sorted.headOption,
      slices.lastOption.map(_.to).orElse(initTo))

    log(s"[ibtp] INSERT $rowsInserted")
    IbtpResult(mode, Some(window), slices, rowsInserted, period, sizing)
  }

  /** Contiguity verifier + hole repair for the documented
    * `maxConcurrentPeriods > 1` failure exposure (see the RunParams
    * scaladoc): a batch that dies mid-run can commit periods AFTER a
    * failed one, so `MAX(ts)+1` resumes never revisit the hole and
    * ordinary runs keep building on an incomplete history.
    *
    * Detection is a pure metadata listing ([[TargetTable
    * .missingDayRanges]]) over [window start, maxPartitionDate);
    * repair replays the model over exactly each missing range through
    * [[TargetTable.replaceRange]] — idempotent (a replayed empty day
    * writes nothing and stays absent; a lost period refills to the
    * uninterrupted build), partition-pruned on the source side, and
    * crash-safe under the replace intent marker. Legitimately empty
    * days are re-probed on every invocation — the price of a
    * metadata-only detector, acceptable for an explicit maintenance
    * command (one pruned-scan-of-nothing per empty day).
    *
    * Returns the repaired (possibly empty-source) ranges.
    */
  def repairHoles(
      spark: SparkSession,
      model: IbtpModel,
      target: TargetTable,
      params: RunParams,
      sources: Map[String, DataFrame] = Map.empty): Seq[(LocalDate, LocalDate)] =
    // a writer like any run: repairs + range replays must not interleave
    // with a live materialization of the same target
    target.withWriterLease() {
      val cfg = params.config
      val effectiveCfg = cfg.copy(
        startDate = params.cliStart.orElse(cfg.startDate),
        stopDate = params.cliStop.orElse(cfg.stopDate))
      target.repairOrphanedSwap()
      if (!target.exists) Nil
      else {
        target.repairOrphanedReplace()
        val (startDate, _) = Boundaries.resolveStartStop(spark, effectiveCfg, sources)
        target.maxPartitionDate.toSeq.flatMap { frontier =>
          val holes = target.missingDayRanges(startDate, frontier)
          holes.foreach { case (f, t) =>
            params.log(s"[ibtp] repairing contiguity hole [$f, $t)")
            target.heartbeatLease()
            target.replaceRange(model.query(spark, PeriodBounds(f, t)), f, t)
          }
          holes
        }
      }
    }
}
