package graft.ibtp

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** End-to-end materialization scenarios over the `events` fixture
  * (SURVEY §5.4): fresh build, catch-up, full refresh, backfill window
  * replace, unique-key upsert, period tiling for week/month.
  *
  * The defining correctness property throughout:
  * loop(model) over [start, stop) ≡ one-shot model over [start, stop).
  */
class IbtpRunnerSpec extends SparkSpecBase {

  private val jan1  = LocalDate.of(2024, 1, 1)
  private val feb1  = LocalDate.of(2024, 2, 1)

  /** Daily aggregation model over events — the README's canonical
    * pattern (`/root/reference/README.md:62-70`): CTE + period filter +
    * aggregates.
    */
  private def dailyAggModel: IbtpModel = IbtpModel.DfModel { (s, from, to) =>
    table("events")
      .filter(col("ts") >= from && col("ts") < to)
      .groupBy(col("ts").cast("date").cast("timestamp").as("day"), col("event_type"))
      .agg(count("*").as("n_events"),
        round(sum(col("value")), 4).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
  }

  private def oneShot(from: LocalDate, to: LocalDate): DataFrame =
    dailyAggModel.query(spark, PeriodBounds(from, to))

  private def cfg = IbtpConfig(
    timestampField = "day",
    startDate = Some(jan1),
    stopDate = Some(feb1))

  private def runner(target: TargetTable, mode: RunMode = RunMode.Normal,
      c: IbtpConfig = cfg): IbtpResult =
    IbtpRunner.run(spark, dailyAggModel, target,
      IbtpRunner.RunParams(c, mode, today = feb1))

  test("fresh day-by-day build equals one-shot query") {
    val target = new TargetTable(spark, tmpDir("ibtp_fresh"), "day")
    val res = runner(target)
    assert(res.rowsInserted > 0)
    assertSameRows(target.read(), oneShot(jan1, feb1))
  }

  test("second run is a no-op (already caught up)") {
    val target = new TargetTable(spark, tmpDir("ibtp_noop"), "day")
    runner(target)
    val n1 = target.read().count()
    val res2 = runner(target)
    assert(res2.periodsRun.isEmpty || res2.rowsInserted == 0)
    assert(target.read().count() == n1)
  }

  test("catch-up run: build first half, then resume completes the rest") {
    val mid = LocalDate.of(2024, 1, 15)
    val target = new TargetTable(spark, tmpDir("ibtp_resume"), "day")
    runner(target, c = cfg.copy(stopDate = Some(mid)))
    val firstCount = target.read().count()
    assert(firstCount > 0)
    // resume with the full window — must continue from max(day)+1, not redo
    val res2 = runner(target)
    assert(res2.window.get.start == mid) // max ts = jan14 (stop exclusive) + 1 day
    assertSameRows(target.read(), oneShot(jan1, feb1))
  }

  test("full refresh rebuilds from scratch and equals one-shot") {
    val target = new TargetTable(spark, tmpDir("ibtp_fr"), "day")
    runner(target)
    runner(target, mode = RunMode.FullRefresh)
    assertSameRows(target.read(), oneShot(jan1, feb1))
  }

  test("backfill replaces a mid-range window idempotently") {
    val target = new TargetTable(spark, tmpDir("ibtp_bf"), "day")
    runner(target)
    val beforeCount = target.read().count()
    val bf = RunMode.Backfill(LocalDate.of(2024, 1, 10), LocalDate.of(2024, 1, 20))
    runner(target, mode = bf)
    assertSameRows(target.read(), oneShot(jan1, feb1)) // data unchanged: same source
    runner(target, mode = bf) // idempotent
    assertSameRows(target.read(), oneShot(jan1, feb1))
    assert(beforeCount == target.read().count())
  }

  test("unique-key upsert: re-running a window does not duplicate rows") {
    val target = new TargetTable(spark, tmpDir("ibtp_uk"), "day")
    val c = cfg.copy(uniqueKey = Seq("day", "event_type"))
    IbtpRunner.run(spark, dailyAggModel, target, IbtpRunner.RunParams(c, today = feb1))
    val n1 = target.read().count()
    // force re-processing of the last 5 days by lying about resume point:
    // run a backfill-free normal run with start pushed back — the upsert
    // path must delete matching (day, event_type) keys before insert.
    val reRun = IbtpRunner.RunParams(
      c.copy(startDate = Some(LocalDate.of(2024, 1, 27))), RunMode.FullRefresh,
      today = feb1)
    // FullRefresh rebuilds; to exercise upsert on an existing table run a
    // partial period window manually instead:
    val slice = Boundaries.PeriodSlice(0, LocalDate.of(2024, 1, 27), feb1)
    val df = dailyAggModel.query(spark, PeriodBounds(slice.from, slice.to))
    target.upsert(df, c.uniqueKey)
    assert(target.read().count() == n1)
    assertSameRows(target.read(), oneShot(jan1, feb1))
  }

  test("concurrent period submission produces the identical table") {
    val seq = new TargetTable(spark, tmpDir("ibtp_seq"), "day")
    runner(seq)
    val conc = new TargetTable(spark, tmpDir("ibtp_conc"), "day")
    IbtpRunner.run(spark, dailyAggModel, conc,
      IbtpRunner.RunParams(cfg, today = feb1, maxConcurrentPeriods = 4))
    assertSameRows(conc.read(), seq.read())
    // and resume still works after a concurrent build
    val res = IbtpRunner.run(spark, dailyAggModel, conc,
      IbtpRunner.RunParams(cfg, today = feb1))
    assert(res.rowsInserted == 0)
  }

  test("resume after interrupt at random cut points equals uninterrupted build") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val cut = jan1.plusDays(2 + rnd.nextInt(26).toLong)
      val target = new TargetTable(spark, tmpDir("ibtp_cut"), "day")
      // interrupted run: stops at a random day (simulates failure after
      // the periods before `cut` committed)
      runner(target, c = cfg.copy(stopDate = Some(cut)))
      // plain re-run with the full config completes the build
      runner(target)
      assertSameRows(target.read(), oneShot(jan1, feb1))
    }
  }

  test("pre/post hooks run as SQL around the loop") {
    val target = new TargetTable(spark, tmpDir("ibtp_hooks"), "day")
    IbtpRunner.run(spark, dailyAggModel, target,
      IbtpRunner.RunParams(cfg, today = feb1,
        preHooks = Seq("CREATE OR REPLACE TEMP VIEW ibtp_pre_marker AS SELECT 1 AS x"),
        postHooks = Seq("CREATE OR REPLACE TEMP VIEW ibtp_post_marker AS SELECT 2 AS x")))
    assert(spark.table("ibtp_pre_marker").head().getInt(0) == 1)
    assert(spark.table("ibtp_post_marker").head().getInt(0) == 2)
  }

  test("week and month periods tile the same window identically") {
    for (p <- Seq(PeriodUnit.Week, PeriodUnit.Month)) {
      val target = new TargetTable(spark, tmpDir(s"ibtp_${p.name}"), "day")
      runner(target, c = cfg.copy(period = p))
      assertSameRows(target.read(), oneShot(jan1, feb1))
    }
  }

  test("SqlModel fidelity mode: placeholder SQL runs through spark.sql") {
    table("events").createOrReplaceTempView("events")
    val m = IbtpModel.SqlModel(
      """WITH src AS (
        |  SELECT * FROM events
        |  WHERE ts >= __PERIOD_FILTER_FROM__ AND ts < __PERIOD_FILTER_TO__
        |)
        |SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, event_type,
        |       COUNT(*) AS n_events,
        |       ROUND(SUM(value), 4) AS total_value,
        |       COUNT(DISTINCT user_id) AS n_users
        |FROM src GROUP BY 1, 2""".stripMargin)
    val target = new TargetTable(spark, tmpDir("ibtp_sql"), "day")
    IbtpRunner.run(spark, m, target, IbtpRunner.RunParams(cfg, today = feb1))
    assertSameRows(target.read(), oneShot(jan1, feb1))
  }

  test("date_source_models probe resolves start/stop from min/max") {
    val (s, e) = Boundaries.resolveStartStop(spark,
      IbtpConfig(timestampField = "ts", dateSourceModels = Seq("ev")),
      sources = Map("ev" -> table("events")))
    assert(s == jan1)
    assert(e.exists(d => d.isAfter(LocalDate.of(2024, 1, 25))))
  }

  test("int→long incoming widens the target unconditionally (even under Ignore)") {
    // reference `loop.sql:78-79`: expand_target_column_types runs every
    // iteration regardless of on_schema_change — a column whose type
    // widens mid-history must widen the target, not throw
    val mid = LocalDate.of(2024, 1, 15)
    def model(wide: Boolean): IbtpModel = IbtpModel.DfModel { (_, from, to) =>
      table("events")
        .filter(col("ts") >= from && col("ts") < to)
        .groupBy(col("ts").cast("date").cast("timestamp").as("day"))
        .agg(count("*").cast(if (wide) "long" else "int").as("n"))
    }
    val target = new TargetTable(spark, tmpDir("ibtp_widen"), "day")
    // first half of history lands as INT
    IbtpRunner.run(spark, model(wide = false), target,
      IbtpRunner.RunParams(cfg.copy(stopDate = Some(mid)), today = feb1))
    assert(target.read().schema("n").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // resume with the column now LONG, default on_schema_change=Ignore:
    // must widen and complete, not throw
    IbtpRunner.run(spark, model(wide = true), target,
      IbtpRunner.RunParams(cfg, today = feb1))
    assert(target.read().schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    // historic int32 files read correctly through the widened schema
    val expected = model(wide = true).query(spark, PeriodBounds(jan1, feb1))
    assertSameRows(target.read(), expected)
  }

  test("append row count rides the write job itself — no extra count pass") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val target = new TargetTable(spark, tmpDir("ibtp_obsjob"), "day")
    def mk(day: Int) = {
      import spark.implicits._
      Seq((java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00"), 1L),
        (java.sql.Timestamp.valueOf(f"2024-01-$day%02d 01:00:00"), 2L))
        .toDF("day", "v")
    }
    target.init(mk(1))
    val group = "graft-obs-job-count"
    @volatile var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (j.properties != null &&
            group == j.properties.getProperty("spark.jobGroup.id")) jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "observed append")
      val n = target.append(mk(2))
      assert(n == 2) // the observed metric, not a separate count()
      // listener bus is async — wait for it to settle
      var waited = 0
      while (waited < 5000 && jobs < 1) { Thread.sleep(50); waited += 50 }
      Thread.sleep(250)
      assert(jobs == 1, s"expected exactly 1 Spark job for append, saw $jobs")
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  test("compaction merges small partition files without changing data") {
    val target = new TargetTable(spark, tmpDir("ibtp_compact"), "day")
    runner(target)
    // a second append doubles rows AND leaves ≥2 files per partition —
    // the accumulation pattern of a long-lived chunk-loaded target
    target.append(oneShot(jan1, feb1))
    val before = target.read().collect().map(_.toString).sorted
    def filesIn(d: String): Int =
      new java.io.File(target.path, s"p_date=$d").listFiles()
        .count(f => f.isFile && f.getName.startsWith("part-"))
    assert(filesIn("2024-01-05") >= 2)
    val stats = target.compact()
    assert(stats.nonEmpty)
    assert(stats.forall(s => s.filesAfter < s.filesBefore))
    // replaced originals stay trash-parked for pinned readers until
    // vacuumed; the LIVE set is already compact
    target.vacuum(0L)
    assert(filesIn("2024-01-05") == 1)
    val after = target.read().collect().map(_.toString).sorted
    assert(before.sameElements(after), "compaction must not change data")
    // second compaction is a no-op (already at target)
    assert(target.compact().isEmpty)
  }

  /** Strip the manifest to simulate a table written before the manifest
    * era — the population whose full refresh still takes the backup-swap
    * path (manifest tables get the snapshot-isolated replace instead).
    */
  private def demanifest(target: TargetTable): Unit = {
    val mdir = new java.io.File(target.path, TargetTable.ManifestDirName)
    if (mdir.exists()) { mdir.listFiles().foreach(_.delete()); mdir.delete() }
  }

  test("crashed full-refresh swap self-heals at every phase via the swap intent (pre-manifest tables)") {
    // Since the opportunistic upgrade (round 12), the RUNNER commits a
    // manifest at its first write-locked open, so a runner-driven
    // refresh of a legacy table takes the snapshot-replace path (the
    // spec below). The backup swap remains the contract for a DIRECT
    // init() on a pre-manifest table (no lease there — reference
    // fidelity, B16), so that is the driver under test here.
    // Phase 2 is THE window the round-4 audit flagged: old table renamed
    // out, new one not yet renamed in — a reader sees no target and a
    // plain re-run would silently rebuild from scratch
    for (phase <- Seq(1, 2, 3)) {
      val target = new TargetTable(spark, tmpDir(s"ibtp_swap$phase"), "day")
      runner(target)
      demanifest(target) // pre-manifest era: direct init takes the swap path
      target.failSwapAt = phase
      intercept[IllegalStateException] {
        target.init(oneShot(jan1, jan1.plusDays(1)))
      }
      target.failSwapAt = 0
      if (phase == 2) assert(!target.exists,
        "phase-2 crash leaves no visible target (the window under test)")
      // repair alone rolls FORWARD to the refreshed init chunk (the
      // staged data was committed before the intent was written)
      assert(target.repairOrphanedSwap(), s"phase $phase: expected a repair")
      assert(!target.repairOrphanedSwap(), "repair must clear the intent")
      assertSameRows(target.read(), oneShot(jan1, jan1.plusDays(1)))
      // the ordinary resume completes it to the uninterrupted build
      val res = runner(target)
      assert(res.rowsInserted > 0, s"phase $phase: resume must continue the loop")
      assertSameRows(target.read(), oneShot(jan1, feb1))
      // and the runner heals a crashed DIRECT init without an explicit
      // repair call too (start-of-run swap repair)
      demanifest(target)
      target.failSwapAt = phase
      intercept[IllegalStateException] {
        target.init(oneShot(jan1, jan1.plusDays(1)))
      }
      target.failSwapAt = 0
      runner(target)
      assertSameRows(target.read(), oneShot(jan1, feb1))
    }
  }

  test("full refresh on a manifest table is a snapshot replace; crashes heal at every phase") {
    for (phase <- Seq(1, 2, 3)) {
      val target = new TargetTable(spark, tmpDir(s"ibtp_fr_snap$phase"), "day")
      runner(target)
      target.failReplaceAt = phase
      intercept[IllegalStateException] { runner(target, mode = RunMode.FullRefresh) }
      target.failReplaceAt = 0
      if (phase == 1)
        // manifest never switched: readers keep the COMPLETE old table
        // (vs the swap path, whose phase-2 crash leaves no table at all)
        assertSameRows(target.read(), oneShot(jan1, feb1))
      // a plain resume heals (start-of-run repair) and completes:
      // phase 1 rolled back to the old complete build (nothing to do);
      // phases 2-3 rolled forward to the refreshed init chunk, and the
      // loop then rebuilds the rest of the window
      runner(target)
      assertSameRows(target.read(), oneShot(jan1, feb1))
      assert(target.repairOrphanedReplace().isEmpty, "intent must be cleared")
    }
  }

  test("crashed compaction self-heals forward; pre-delete crash rolls back") {
    def build(name: String): TargetTable = {
      val t = new TargetTable(spark, tmpDir(name), "day")
      runner(t)
      t.append(oneShot(jan1, feb1)) // ≥2 files per partition
      t
    }
    def filesIn(t: TargetTable, d: String): Seq[String] =
      new java.io.File(t.path, s"p_date=$d").listFiles().toSeq
        .map(_.getName).filter(_.startsWith("part-"))
    for (phase <- Seq(1, 2, 3)) {
      val target = build(s"ibtp_compcrash$phase")
      val before = target.read().collect().map(_.toString).sorted
      target.failCompactAt = phase
      intercept[IllegalStateException] { target.compact() }
      target.failCompactAt = 0
      // a crash at EVERY point must leave readers on a complete file
      // set: phase 1 died with staged copies in the dir but the
      // manifest un-switched (readers still see the originals); phase 2
      // died after the atomic manifest switch (readers see the
      // compacted set, originals still parked on disk); phase 3 died
      // with originals trash-parked but the marker not cleared. In all
      // cases read() is identical, and the NEXT compact repairs first
      // (back for 1, forward for 2-3) then finishes every partition.
      val mid = target.read().collect().map(_.toString).sorted
      assert(before.sameElements(mid),
        s"phase $phase: a crashed compaction must not change what readers see")
      val stats = target.compact()
      assert(stats.nonEmpty, s"phase $phase: compaction must complete after repair")
      val after = target.read().collect().map(_.toString).sorted
      assert(before.sameElements(after),
        s"phase $phase: repair + compaction must not change data")
      // replaced originals are retention-parked, not deleted in place;
      // vacuum(0) reaps them and exactly the compacted file remains
      target.vacuum(0L)
      assert(filesIn(target, "2024-01-05").size == 1)
      // no staged leftovers, no marker
      assert(!new java.io.File(target.path).listFiles().exists(
        _.getName == TargetTable.CompactIntentFile))
      assert(new java.io.File(target.path, "p_date=2024-01-05").listFiles()
        .forall(f => !f.getName.startsWith(".") || f.getName.endsWith(".crc")))
    }
  }

  test("the runner heals a crashed compaction before materializing") {
    // a --compact-only CLI run that dies post-delete leaves the day's
    // data dot-hidden; with auto-compaction off, nothing used to
    // repair it — ordinary runner materializations must now heal it
    // like swap and replace orphans
    val target = new TargetTable(spark, tmpDir("ibtp_runnerheal"), "day")
    runner(target)
    target.append(oneShot(jan1, feb1)) // ≥2 files per partition
    val before = target.read().collect().map(_.toString).sorted
    target.failCompactAt = 2 // manifest switched, originals not yet parked
    intercept[IllegalStateException] { target.compact() }
    target.failCompactAt = 0
    runner(target) // caught-up no-op run — repairs happen before the probe
    val after = target.read().collect().map(_.toString).sorted
    assert(before.sameElements(after),
      "runner must roll the orphaned compaction forward")
    assert(!new java.io.File(target.path).listFiles().exists(
      _.getName == TargetTable.CompactIntentFile))
  }

  test("rows with a NULL timestamp don't break the resume probe or compaction") {
    // NULL-ts rows are legitimate data (the reference inserts them like
    // any other); they land in __HIVE_DEFAULT_PARTITION__, which must
    // not crash the date parse behind maxPartitionDate/compact, and —
    // like SQL MAX(ts) — must not advance the resume frontier
    val target = new TargetTable(spark, tmpDir("ibtp_nullts"), "day")
    runner(target)
    val maxBefore = target.maxPartitionDate
    val rows = target.read().count()
    target.append(target.read().limit(1)
      .withColumn("day", lit(null).cast("timestamp")))
    assert(target.maxPartitionDate == maxBefore,
      "NULL-ts rows must not move the resume frontier")
    assert(target.read().count() == rows + 1, "the NULL-ts row is real data")
    target.compact() // default partition participates without throwing
    assert(target.read().filter(col("day").isNull).count() == 1)
  }

  test("the NULL-ts partition is compacted like any other") {
    // pre-fix, compact() only iterated date partitions, so the default
    // partition's small files accumulated unboundedly across runs
    val target = new TargetTable(spark, tmpDir("ibtp_nulltscompact"), "day")
    runner(target)
    val one = target.read().limit(1)
      .withColumn("day", lit(null).cast("timestamp")).cache()
    (1 to 3).foreach(_ => target.append(one))
    one.unpersist()
    val defDir = new java.io.File(target.path,
      s"p_date=${TargetTable.HiveDefaultPartition}")
    def defFiles: Int =
      defDir.listFiles().count(f => f.isFile && f.getName.startsWith("part-"))
    assert(defFiles >= 3)
    val before = target.read().collect().map(_.toString).sorted
    val stats = target.compact()
    assert(stats.exists(_.date.isEmpty),
      "the default partition must appear in the compaction stats")
    assert(stats.find(_.date.isEmpty).get.partitionLabel ==
      TargetTable.HiveDefaultPartition)
    target.vacuum(0L) // reap the trash-parked originals before counting
    assert(defFiles == 1)
    val after = target.read().collect().map(_.toString).sorted
    assert(before.sameElements(after), "NULL-ts compaction must not change data")
    assert(target.read().filter(col("day").isNull).count() == 3)
  }

  test("standalone compact age-gates the staging sweep; the runner's sweep doesn't") {
    // a live writer's fresh appendIsolated stage dir must survive a
    // concurrent --compact-only run (pre-fix it was deleted mid-write);
    // the runner sweeps at its single-writer start-of-run point with no
    // gate, so true orphans still die there
    val target = new TargetTable(spark, tmpDir("ibtp_sweepgate"), "day")
    runner(target)
    val stage = new java.io.File(target.path + "__stage_livewriter")
    assert(stage.mkdir())
    val f = new java.io.File(stage, "part-00000")
    java.nio.file.Files.writeString(f.toPath, "in-flight")
    target.compact()
    assert(stage.exists(), "fresh stage dir must survive a standalone compact")
    // once idle past the gate, the same compact path sweeps it
    val old = System.currentTimeMillis() - TargetTable.StagingSweepAgeMs - 60000
    f.setLastModified(old); stage.setLastModified(old)
    target.compact()
    assert(!stage.exists(), "idle stage dir is an orphan and must be swept")
    // and the runner's ungated sweep removes even a fresh one
    val stage2 = new java.io.File(target.path + "__stage_orphan")
    assert(stage2.mkdir())
    target.sweepOrphanedStaging()
    assert(!stage2.exists())
  }

  test("an unparseable partition name fails the frontier loudly (manifest + fallback eras)") {
    // a corrupted/renamed date partition silently excluded from the
    // frontier would let a rerun re-append that day's rows — it must
    // either be invisible-by-design (manifest pins the committed names)
    // or fail loud (it IS the source of truth), never silently skipped
    val target = new TargetTable(spark, tmpDir("ibtp_corruptpart"), "day")
    runner(target)
    val frontier = target.maxPartitionDate
    val good = new java.io.File(target.path, "p_date=2024-01-05")
    val bad  = new java.io.File(target.path, "p_date=2024-01-05x")
    // manifest era: the frontier plans from the committed manifest, so
    // a disk-level rename cannot silently shift it
    assert(good.renameTo(bad))
    assert(target.maxPartitionDate == frontier,
      "a disk rename must not move the manifest-pinned frontier")
    assert(bad.renameTo(good))
    // a corrupted MANIFEST entry is the manifest-era corruption — loud
    val mdir = new java.io.File(target.path, TargetTable.ManifestDirName)
    val latest = mdir.listFiles().filter(_.getName.endsWith(".list"))
      .maxBy(_.getName)
    // drop the LocalFileSystem checksum sidecar: this simulates outside
    // corruption, not a writer bug, and the probe must diagnose the
    // content rather than trip on a crc mismatch
    new java.io.File(mdir, s".${latest.getName}.crc").delete()
    val orig = java.nio.file.Files.readAllLines(latest.toPath)
    val plus = new java.util.ArrayList[String](orig)
    plus.add("p_date=2024-01-05x/part-bogus.parquet")
    java.nio.file.Files.write(latest.toPath, plus)
    val e = intercept[IllegalStateException] { target.maxPartitionDate }
    assert(e.getMessage.contains("p_date=2024-01-05x"))
    java.nio.file.Files.write(latest.toPath, orig) // repair → probe works
    assert(target.maxPartitionDate == frontier)
    // pre-manifest fallback (an older-version table): directory names
    // ARE the source of truth, so the rename must fail loud there
    assert(mdir.listFiles().forall(_.delete()) && mdir.delete())
    assert(good.renameTo(bad))
    val e2 = intercept[IllegalStateException] { target.maxPartitionDate }
    assert(e2.getMessage.contains("p_date=2024-01-05x"))
    assert(bad.renameTo(good)) // repair → probe works again
    assert(target.maxPartitionDate == frontier)
  }

  test("concurrent-append failure hole: contiguity probe detects it, repair matches the uninterrupted build") {
    val holeDay = LocalDate.of(2024, 1, 10)
    @volatile var failOnce = true
    // same body as dailyAggModel, but period [jan10, jan11) dies on its
    // first materialization — the documented maxConcurrentPeriods > 1
    // exposure: sibling periods in the batch commit, the resume
    // frontier moves PAST the hole, and MAX(ts)+1 never revisits it
    val flaky = new IbtpModel {
      def query(s: org.apache.spark.sql.SparkSession, b: PeriodBounds): DataFrame = {
        if (failOnce && b.from == holeDay) {
          failOnce = false
          throw new RuntimeException("simulated mid-batch death")
        }
        dailyAggModel.query(s, b)
      }
    }
    val target = new TargetTable(spark, tmpDir("ibtp_holes"), "day")
    val params = IbtpRunner.RunParams(cfg, RunMode.Normal, today = feb1,
      maxConcurrentPeriods = 4)
    intercept[Exception] { IbtpRunner.run(spark, flaky, target, params) }
    // sibling commits moved the frontier past the dead period
    val frontier = target.maxPartitionDate.get
    assert(frontier.isAfter(holeDay), s"frontier $frontier not past $holeDay")
    // metadata-only detection names exactly the hole
    val holes = target.missingDayRanges(jan1, frontier)
    assert(holes == Seq((holeDay, holeDay.plusDays(1))), s"holes: $holes")
    // an ordinary resume does NOT heal it (that is the bug class)
    IbtpRunner.run(spark, flaky, target, params)
    assert(target.missingDayRanges(jan1, target.maxPartitionDate.get) == holes)
    // repair backfills exactly the missing range...
    assert(IbtpRunner.repairHoles(spark, flaky, target, params) == holes)
    // ...to the uninterrupted build, and a re-verify finds nothing
    assertSameRows(target.read(), oneShot(jan1, feb1))
    assert(IbtpRunner.repairHoles(spark, flaky, target, params).isEmpty)
  }

  test("schema-sample init creates empty typed target, loop then fills it") {
    table("events").createOrReplaceTempView("events")
    val c = cfg.copy(sampleSelectForSchema = Some(
      "SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, event_type, " +
        "CAST(1 AS BIGINT) AS n_events, CAST(1.0 AS DOUBLE) AS total_value, " +
        "CAST(1 AS BIGINT) AS n_users FROM events"))
    val target = new TargetTable(spark, tmpDir("ibtp_sample"), "day")
    runner(target, c = c)
    assertSameRows(target.read(), oneShot(jan1, feb1))
  }

  /** Count live parquet data files per partition dir on disk (manifest
    * notwithstanding) — used to prove phase-1 rollback physically removes
    * staged orphans instead of leaving invisible-but-present files.
    */
  private def diskFileCounts(target: TargetTable): Map[String, Int] = {
    val root = new java.io.File(target.path)
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("p_date="))
      .map(d => d.getName -> d.listFiles()
        .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))).toMap
  }

  test("crashed snapshot replace rolls BACK at phase 1, FORWARD at phases 2-3") {
    val target = new TargetTable(spark, tmpDir("ibtp_intent"), "day")
    runner(target)
    val from = LocalDate.of(2024, 1, 10)
    val to   = LocalDate.of(2024, 1, 13)
    // the replacement drops jan 11 entirely — its stale partition must
    // vanish in the SAME atomic manifest commit as the fresh files land
    val repl = oneShot(from, to)
      .filter(col("day").cast("date") =!= lit(java.sql.Date.valueOf(from.plusDays(1))))
    val preReplace  = oneShot(jan1, feb1)
    val postReplace = preReplace
      .filter(col("day").cast("date") =!= lit(java.sql.Date.valueOf(from.plusDays(1))))
    val preCounts = diskFileCounts(target)

    // ---- phase 1: staged files moved into the live dirs, manifest NOT
    // committed. Readers never saw the staged files (not in any
    // manifest); repair rolls BACK, physically deleting them.
    target.failReplaceAt = 1
    intercept[IllegalStateException] { target.replaceRange(repl, from, to) }
    target.failReplaceAt = 0
    assertSameRows(target.read(), preReplace) // manifest untouched by the crash
    assert(target.repairOrphanedReplace().contains("back"))
    assertSameRows(target.read(), preReplace)
    assert(diskFileCounts(target) == preCounts,
      "phase-1 rollback must remove the staged orphans from disk")
    assert(target.repairOrphanedReplace().isEmpty) // marker cleared

    // ---- phase 2: manifest committed, originals still on disk unparked.
    // The switch already happened — readers see the new table; repair
    // rolls FORWARD by trash-parking the replaced originals.
    target.failReplaceAt = 2
    intercept[IllegalStateException] { target.replaceRange(repl, from, to) }
    target.failReplaceAt = 0
    assertSameRows(target.read(), postReplace) // commit beat the crash
    assert(target.repairOrphanedReplace().contains("forward"))
    assertSameRows(target.read(), postReplace)
    assert(target.repairOrphanedReplace().isEmpty)

    // ---- phase 3: originals parked, marker not yet cleared. Forward
    // repair must be idempotent (originals already gone from disk).
    target.failReplaceAt = 3
    intercept[IllegalStateException] { target.replaceRange(repl, from, to) }
    target.failReplaceAt = 0
    assertSameRows(target.read(), postReplace)
    assert(target.repairOrphanedReplace().contains("forward"))
    assertSameRows(target.read(), postReplace)
    assert(target.repairOrphanedReplace().isEmpty)

    // ---- and the healed table is row-identical to a clean replace
    val clean = new TargetTable(spark, tmpDir("ibtp_intent_clean"), "day")
    runner(clean)
    clean.replaceRange(repl, from, to)
    assertSameRows(target.read(), clean.read())
  }

  test("a new replace self-heals a crashed predecessor before staging") {
    val target = new TargetTable(spark, tmpDir("ibtp_intent_rerun"), "day")
    runner(target)
    val from = LocalDate.of(2024, 1, 10)
    val to   = LocalDate.of(2024, 1, 13)
    val repl = oneShot(from, to)
      .filter(col("day").cast("date") =!= lit(java.sql.Date.valueOf(from.plusDays(1))))
    val expected = oneShot(jan1, feb1)
      .filter(col("day").cast("date") =!= lit(java.sql.Date.valueOf(from.plusDays(1))))
    // crash pre-commit, then just re-run: writeSnapshotReplace repairs
    // (roll back) before staging, so the retry lands a clean result
    target.failReplaceAt = 1
    intercept[IllegalStateException] { target.replaceRange(repl, from, to) }
    target.failReplaceAt = 0
    target.replaceRange(repl, from, to)
    assertSameRows(target.read(), expected)
    assert(target.repairOrphanedReplace().isEmpty)
    // crash post-commit, re-run again — forward repair then idempotent
    // re-replace of the same partitions: same table, no duplicates
    target.failReplaceAt = 2
    intercept[IllegalStateException] { target.replaceRange(repl, from, to) }
    target.failReplaceAt = 0
    target.replaceRange(repl, from, to)
    assertSameRows(target.read(), expected)
    assert(target.repairOrphanedReplace().isEmpty)
  }

  test("crashed append rolls back — the resumed run does not duplicate rows") {
    val jan15 = LocalDate.of(2024, 1, 15)
    val jan16 = LocalDate.of(2024, 1, 16)
    // ---- phase-1 crash: files moved into the live dirs, manifest
    // commit lost. The orphans are invisible to the (manifest-based)
    // frontier, so the resumed run re-materializes jan15 — without the
    // intent rollback, the touched-dir relist would absorb the orphans
    // alongside the fresh files as silent duplicate rows.
    val target = new TargetTable(spark, tmpDir("ibtp_appcrash"), "day")
    runner(target, c = cfg.copy(stopDate = Some(jan15)))
    val frontier0 = target.maxPartitionDate
    target.failAppendAt = 1
    intercept[IllegalStateException] { target.append(oneShot(jan15, jan16)) }
    target.failAppendAt = 0
    assert(target.maxPartitionDate == frontier0,
      "an uncommitted append must not move the manifest frontier")
    runner(target) // start-of-run repair rolls the orphans back, then resumes
    assertSameRows(target.read(), oneShot(jan1, feb1))
    // ---- phase-2 crash: manifest committed, only the marker delete
    // was lost. Repair must clear the marker WITHOUT rolling back the
    // committed rows (the frontier already moved past them).
    val t2 = new TargetTable(spark, tmpDir("ibtp_appcrash2"), "day")
    runner(t2, c = cfg.copy(stopDate = Some(jan15)))
    t2.failAppendAt = 2
    intercept[IllegalStateException] { t2.append(oneShot(jan15, jan16)) }
    t2.failAppendAt = 0
    assert(t2.maxPartitionDate.contains(jan15))
    runner(t2)
    assertSameRows(t2.read(), oneShot(jan1, feb1))
    assert(t2.repairOrphanedAppends() == 0, "markers must be cleared")
  }

  test("a torn append (partially absorbed into the manifest) rolls back fully") {
    val target = new TargetTable(spark, tmpDir("ibtp_apptorn"), "day")
    runner(target)
    val jan5 = LocalDate.of(2024, 1, 5)
    val day = "p_date=2024-01-05"
    val dir = new java.io.File(target.path, day)
    val committed = dir.listFiles().map(_.getName)
      .filter(_.endsWith(".parquet")).toSeq
    assert(committed.nonEmpty)
    // simulate the torn state a sibling's pre-manifest-upgrade relist
    // can produce: a crashed append whose marker lists files that are
    // PARTIALLY in the manifest (here: the committed ones) plus one
    // moved-but-never-committed leftover on disk
    val fake = new java.io.File(dir, "part-torn-uncommitted.parquet")
    java.nio.file.Files.copy(
      new java.io.File(dir, committed.head).toPath, fake.toPath)
    val fsys = new org.apache.hadoop.fs.Path(target.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(
      target.path, TargetTable.AppendIntentPrefix + "torn1")
    val files = (committed.map(n => s"$day/$n") :+ s"$day/${fake.getName}")
    val out = fsys.create(marker, true)
    out.write(s"files=${files.mkString(",")}\n".getBytes("UTF-8")); out.close()
    // a reader planned against the absorbing manifest BEFORE the repair:
    // the rollback must honor the retention contract for the files that
    // manifest published — park, never delete in the reader's face
    val pinned = target.read()
    val pinnedBefore = pinned.count()
    // membership alone would call this 'committed' (exists) or orphan
    // the listed names (forall+delete-only); park-and-filter restores
    // exactly-pre-append for NEW readers while pinned ones keep scanning
    assert(target.repairOrphanedAppends() == 1)
    assert(!fake.exists(), "a never-published file is deleted outright")
    committed.foreach(n => assert(new java.io.File(dir, n).exists(),
      "published (torn) files must be trash-parked, not deleted — a " +
        "reader pinned to the absorbing manifest may still scan them"))
    assert(pinned.count() == pinnedBefore,
      "the pinned reader's scan must survive the rollback intact")
    val expected = oneShot(jan1, feb1)
      .filter(col("day").cast("date") =!= lit(java.sql.Date.valueOf(jan5)))
    assertSameRows(target.read(), expected)
    // re-running the repair with a RE-PLANTED marker (a crash after the
    // filtered commit but before the marker delete) must converge: the
    // persisted torn classification keeps the parked files parked
    // instead of reclassifying them as never-published and deleting them
    val out2 = fsys.create(marker, true)
    out2.write(s"files=${files.mkString(",")}\n".getBytes("UTF-8")); out2.close()
    val sidecar = new org.apache.hadoop.fs.Path(
      target.path, marker.getName + TargetTable.TornSidecarSuffix)
    val out3 = fsys.create(sidecar, true)
    out3.write(s"torn=${committed.map(n => s"$day/$n").mkString(",")}\n"
      .getBytes("UTF-8")); out3.close()
    target.repairOrphanedAppends()
    committed.foreach(n => assert(new java.io.File(dir, n).exists(),
      "a repair re-crash must not delete files parked for pinned readers"))
    assert(!fsys.exists(marker) && !fsys.exists(sidecar),
      "both marker and torn sidecar cleared once the repair converges")
    assertSameRows(target.read(), expected)
    // the hole is detectable and replayable back to the full build
    val params = IbtpRunner.RunParams(cfg, RunMode.Normal, today = feb1)
    assert(IbtpRunner.repairHoles(spark, dailyAggModel, target, params)
      == Seq((jan5, jan5.plusDays(1))))
    assertSameRows(target.read(), oneShot(jan1, feb1))
    // retention expiry reaps the parked torn files
    assert(target.vacuum(0L) > 0)
    committed.foreach(n => assert(!new java.io.File(dir, n).exists(),
      "vacuum must reap the parked torn files after the retention"))
    assertSameRows(target.read(), oneShot(jan1, feb1))
  }

  test("legacy replace markers fail loudly; a lone sidecar is swept") {
    val target = new TargetTable(spark, tmpDir("ibtp_intent2"), "day")
    runner(target)
    val fs = new org.apache.hadoop.fs.Path(target.path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(target.path, TargetTable.IntentFile)
    def writeMarker(content: String): Unit = {
      val out = fs.create(marker, true)
      out.write(content.getBytes("UTF-8")); out.close()
    }
    // a pre-snapshot version's range-only marker records a crash this
    // version cannot replay deterministically — fail loud with the
    // remedy, destroy nothing
    writeMarker("from=2024-01-10\nto=2024-01-13\n")
    val ex = intercept[IllegalStateException] { target.repairOrphanedReplace() }
    assert(ex.getMessage.contains("pre-snapshot-replace"), ex.getMessage)
    assert(fs.exists(marker), "fail-loud must not destroy the marker")
    // ...and a new replace refuses too (it repairs before staging)
    val repl = oneShot(LocalDate.of(2024, 1, 20), LocalDate.of(2024, 1, 22))
    intercept[IllegalStateException] {
      target.replaceRange(repl, LocalDate.of(2024, 1, 20), LocalDate.of(2024, 1, 22))
    }
    assert(fs.exists(marker))
    fs.delete(marker, false)
    // garbage content is the same legacy/corrupt bucket: loud, non-destructive
    writeMarker("garbage\n")
    val ex2 = intercept[IllegalStateException] { target.repairOrphanedReplace() }
    assert(ex2.getMessage.contains("orig/staged"), ex2.getMessage)
    fs.delete(marker, false)
    // a sidecar WITHOUT an intent marker is a completed pre-snapshot
    // replace's leftover — swept silently, no repair direction
    val sidecar = new org.apache.hadoop.fs.Path(target.path, TargetTable.WrittenSidecarFile)
    val out = fs.create(sidecar, true)
    out.write("from=2024-01-01\nto=2024-01-02\nwritten=2024-01-01\n".getBytes("UTF-8"))
    out.close()
    assert(target.repairOrphanedReplace().isEmpty)
    assert(!fs.exists(sidecar), "lone sidecar must be swept")
    // the table survived every refused repair untouched
    assertSameRows(target.read(), oneShot(jan1, feb1))
  }

  // a model whose per-day output spans several tasks — without
  // compaction every day-partition lands multiple small files, the
  // accumulation that kills listing/planning on a year of daily runs
  private def multiFileModel = IbtpModel.DfModel { (s, from, to) =>
    table("events")
      .filter(col("ts") >= from && col("ts") < to)
      .repartition(4)
      .select(col("ts").cast("date").cast("timestamp").as("day"),
        col("event_id"), col("value"))
  }

  private def fileCounts(target: TargetTable): Map[String, Int] = {
    val root = new java.io.File(target.path)
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("p_date="))
      .map(d => d.getName -> d.listFiles()
        .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))).toMap
  }

  test("auto-compaction keeps per-partition file counts bounded across runs") {
    // control: no auto-compaction -> multi-file partitions accumulate
    val plain = new TargetTable(spark, tmpDir("ibtp_nocompact"), "day")
    IbtpRunner.run(spark, multiFileModel, plain,
      IbtpRunner.RunParams(cfg, today = feb1))
    assert(fileCounts(plain).values.exists(_ > 1),
      "control run should produce multi-file partitions (fixture too small?)")

    // auto-compacted: same data, every touched partition ends compact
    val compacted = new TargetTable(spark, tmpDir("ibtp_autocompact"), "day")
    val mid = LocalDate.of(2024, 1, 15)
    val p = IbtpRunner.RunParams(cfg, today = feb1,
      autoCompactTargetFileBytes = Some(128L * 1024 * 1024))
    // two catch-up runs (first half, then the rest): each run compacts
    // its own window as it's written — no whole-table maintenance pass
    IbtpRunner.run(spark, multiFileModel, compacted,
      p.copy(cliStop = Some(mid)))
    compacted.vacuum(0L) // count the LIVE set, not trash-parked originals
    assert(fileCounts(compacted).values.forall(_ == 1),
      s"first window not compact: ${fileCounts(compacted)}")
    IbtpRunner.run(spark, multiFileModel, compacted, p)
    compacted.vacuum(0L)
    val counts = fileCounts(compacted)
    assert(counts.nonEmpty && counts.values.forall(_ == 1),
      s"partitions not compact after catch-up: $counts")
    // compaction must not change the data
    assertSameRows(compacted.read(), plain.read())
  }

  test("auto-compaction covers an init-only run (whole range fits in period 0)") {
    // month period with stop = Jan 31 (the fixture's events end Jan
    // 30): init's period-0 CTAS loads EVERYTHING, the resume probe
    // lands exactly on stop, and the loop takes the nothing-to-do
    // return — compaction must still cover init's writes (the pre-fix
    // code only compacted on the loop path)
    val jan31 = LocalDate.of(2024, 1, 31)
    val monthCfg = cfg.copy(period = PeriodUnit.Month, stopDate = Some(jan31))
    val target = new TargetTable(spark, tmpDir("ibtp_initcompact"), "day")
    val res = IbtpRunner.run(spark, multiFileModel, target,
      IbtpRunner.RunParams(monthCfg, today = feb1,
        autoCompactTargetFileBytes = Some(128L * 1024 * 1024)))
    assert(res.periodsRun.isEmpty, "expected an init-only run")
    target.vacuum(0L) // count the LIVE set, not trash-parked originals
    val counts = fileCounts(target)
    assert(counts.nonEmpty && counts.values.forall(_ == 1),
      s"init-written partitions not compact: $counts")
    // compaction must not change the data
    assertSameRows(target.read(),
      multiFileModel.query(spark, PeriodBounds(jan1, jan31)))
  }
}
