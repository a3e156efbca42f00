package graft.ibtp

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Optimistic concurrent writers: [[TargetTable.appendConcurrent]]
  * commits WITHOUT the single-writer lease, Delta-OCC style — the
  * conflict check runs inside every commit attempt and the manifest's
  * rename-fails-if-exists makes check→rename effectively
  * compare-and-swap. Independent pipelines blind-appending to one table
  * (the reference's per-period commits are independent,
  * `insert_by_timeperiod_loop.sql:134`) therefore never queue behind
  * each other; conflicting histories (a replace racing an in-flight
  * append) abort the optimistic side with a full rollback.
  *
  * Each test uses SEPARATE TargetTable instances on one path — separate
  * JVM monitors, so contention is the real file-level kind a
  * multi-process deployment sees.
  */
class ConcurrentWritersSpec extends SparkSpecBase {

  private def events = graft.sources.Tables.events(spark, sfDir)
    .select(col("ts"), col("event_id"), col("user_id"),
      col("event_type"), col("value"))

  /** events is one month (2024-01) at sf0.001; slice disjoint day
    * ranges for "disjoint partitions".
    */
  private def daySlice(fromDay: Int, toDay: Int) =
    events.filter(dayofmonth(col("ts")).between(fromDay, toDay))

  private def freshTable(dir: String): TargetTable = {
    val t = new TargetTable(spark, dir, "ts", countRows = false)
    t.init(daySlice(1, 5))
    t
  }

  private def inParallel(bodies: (() => Unit)*): Seq[Option[Throwable]] = {
    val go = new CountDownLatch(1)
    val results = new Array[Option[Throwable]](bodies.size)
    val threads = bodies.zipWithIndex.map { case (b, i) =>
      val th = new Thread(() => {
        go.await(30, TimeUnit.SECONDS)
        results(i) = try { b(); None } catch { case e: Throwable => Some(e) }
      }, s"concurrent-writer-$i")
      th.start(); th
    }
    go.countDown()
    threads.foreach(_.join(120000))
    results.toSeq
  }

  test("two optimistic appenders to disjoint partitions both commit, no lease involved") {
    val dir = tmpDir("cw_disjoint") + "/tbl"
    freshTable(dir)
    val a = new TargetTable(spark, dir, "ts", countRows = false)
    val b = new TargetTable(spark, dir, "ts", countRows = false)
    val errs = inParallel(
      () => a.appendConcurrent(daySlice(10, 14)),
      () => b.appendConcurrent(daySlice(20, 24)))
    assert(errs.forall(_.isEmpty), s"both must commit: $errs")
    assert(!new java.io.File(dir + TargetTable.LeaseSuffix).exists(),
      "optimistic appends must not create the writer lease")
    val t = new TargetTable(spark, dir, "ts", countRows = false)
    assertSameRows(t.read(),
      daySlice(1, 5).unionAll(daySlice(10, 14)).unionAll(daySlice(20, 24)))
    // no markers left behind
    assert(!new java.io.File(dir).listFiles.exists(
      _.getName.startsWith(TargetTable.AppendIntentPrefix)))
  }

  test("optimistic appends to the SAME partition both commit (blind adds never conflict)") {
    val dir = tmpDir("cw_samepart") + "/tbl"
    freshTable(dir)
    val a = new TargetTable(spark, dir, "ts", countRows = false)
    val b = new TargetTable(spark, dir, "ts", countRows = false)
    val slice = daySlice(10, 10)
    val errs = inParallel(
      () => a.appendConcurrent(slice),
      () => b.appendConcurrent(slice))
    assert(errs.forall(_.isEmpty), s"both must commit: $errs")
    val t = new TargetTable(spark, dir, "ts", countRows = false)
    assertSameRows(t.read(),
      daySlice(1, 5).unionAll(slice).unionAll(slice))
  }

  test("a commit storm of optimistic appenders all land (rename-race retries)") {
    val dir = tmpDir("cw_storm") + "/tbl"
    freshTable(dir)
    val writers = (0 until 6).map(_ =>
      new TargetTable(spark, dir, "ts", countRows = false))
    val slices = (0 until 6).map(i => daySlice(10 + 3 * i, 11 + 3 * i))
    val errs = inParallel(writers.zip(slices).map { case (w, s) =>
      () => { w.appendConcurrent(s); () }
    }: _*)
    assert(errs.forall(_.isEmpty), s"all six must commit: $errs")
    val t = new TargetTable(spark, dir, "ts", countRows = false)
    val want = slices.foldLeft(daySlice(1, 5))(_ unionAll _)
    assert(t.read().count() == want.count())
    assertSameRows(t.read(), want)
  }

  test("a replace landing mid-flight aborts the append with a full rollback") {
    val dir = tmpDir("cw_abort") + "/tbl"
    val t0 = freshTable(dir)
    val a = new TargetTable(spark, dir, "ts", countRows = false)
    val b = new TargetTable(spark, dir, "ts", countRows = false)
    val fresh = daySlice(2, 3).withColumn("value", lit(0.0))
    // the append targets days 1-5; between its file moves and its
    // commit, a replace rewrites [Jan 2, Jan 4) — removing live files
    // in the append's partitions. Serializing the append before the
    // replace would resurrect replaced rows, so the append must abort.
    a.onOptimisticCommit = () =>
      b.replaceRange(fresh,
        java.time.LocalDate.parse("2024-01-02"),
        java.time.LocalDate.parse("2024-01-04"))
    val e = intercept[ConcurrentWriteConflictException] {
      a.appendConcurrent(daySlice(1, 5))
    }
    assert(e.getMessage.contains("replaced"), e.getMessage)
    // full rollback: state is exactly the replace's outcome; no marker,
    // no stray files, manifest matches disk
    val t = new TargetTable(spark, dir, "ts", countRows = false)
    assertSameRows(t.read(),
      daySlice(1, 1).unionAll(fresh).unionAll(daySlice(4, 5)))
    assert(!new java.io.File(dir).listFiles.exists(
      _.getName.startsWith(TargetTable.AppendIntentPrefix)),
      "the aborted append must clear its marker")
    // and the retry against the new state succeeds
    assert(t0.read().count() == t.read().count())
    a.onOptimisticCommit = () => ()
    a.appendConcurrent(daySlice(1, 5))
    assertSameRows(
      new TargetTable(spark, dir, "ts", countRows = false).read(),
      daySlice(1, 1).unionAll(fresh).unionAll(daySlice(4, 5))
        .unionAll(daySlice(1, 5)))
  }

  test("an append racing a replace's commit window is absorbed: append-then-replace history") {
    val dir = tmpDir("cw_absorb") + "/tbl"
    freshTable(dir)
    val a = new TargetTable(spark, dir, "ts", countRows = false)
    val b = new TargetTable(spark, dir, "ts", countRows = false)
    val fresh = daySlice(2, 3).withColumn("value", lit(0.0))
    // the appended rows land INSIDE the replaced range, committing
    // between the replace's body read and its version rename: the
    // replace's per-attempt removal recompute must absorb them — the
    // serializable history is "append, then replace", so the final
    // state holds exactly the replace's fresh rows
    var appendErr: Option[Throwable] = None
    b.onReplaceCommit = () =>
      appendErr = try { a.appendConcurrent(daySlice(2, 2)); None }
        catch { case e: Throwable => Some(e) }
    b.replaceRange(fresh,
      java.time.LocalDate.parse("2024-01-02"),
      java.time.LocalDate.parse("2024-01-04"))
    b.onReplaceCommit = () => ()
    assert(appendErr.isEmpty,
      s"the raced append itself must succeed (it committed first): $appendErr")
    val t = new TargetTable(spark, dir, "ts", countRows = false)
    assertSameRows(t.read(),
      daySlice(1, 1).unionAll(fresh).unionAll(daySlice(4, 5)))
  }

  test("repair skips a live sibling's fresh marker and reaps a stale one") {
    val dir = tmpDir("cw_repair") + "/tbl"
    freshTable(dir)
    val a = new TargetTable(spark, dir, "ts", countRows = false)
    val b = new TargetTable(spark, dir, "ts", countRows = false)
    // mid-flight (files moved, marker fresh, commit pending), a sibling
    // repair must NOT roll the append back
    a.onOptimisticCommit = () => {
      val rolled = b.repairOrphanedAppends()
      assert(rolled == 0, "a fresh optimistic marker is a live sibling")
    }
    a.appendConcurrent(daySlice(10, 12))
    a.onOptimisticCommit = () => ()
    val afterLive = new TargetTable(spark, dir, "ts", countRows = false).read().count()
    assert(afterLive == daySlice(1, 5).count() + daySlice(10, 12).count(),
      "the append must have committed despite the concurrent repair")
    // a STALE optimistic marker (crashed appender) repairs like any
    // other: fabricate one over a moved-but-uncommitted file
    val part = new java.io.File(dir).listFiles
      .find(_.getName.startsWith("p_date=")).get
    val orphan = new java.io.File(part, "part-orphan-test.c000.snappy.parquet")
    java.nio.file.Files.copy(
      part.listFiles.find(_.getName.endsWith(".parquet")).get.toPath,
      orphan.toPath)
    val staleHb = System.currentTimeMillis() - TargetTable.OptAppendStaleMs - 1000
    java.nio.file.Files.writeString(
      new java.io.File(dir, TargetTable.AppendIntentPrefix + "deadbeef").toPath,
      s"files=${part.getName}/${orphan.getName}\nopt=1\nhb=$staleHb\n")
    assert(b.repairOrphanedAppends() == 1,
      "a stale optimistic marker must roll back")
    assert(!orphan.exists(), "the orphaned file must be deleted")
    assert(new TargetTable(spark, dir, "ts", countRows = false)
      .read().count() == afterLive, "live rows untouched by the repair")
  }

  test("two optimistic backfills to DISJOINT ranges both commit lease-less") {
    val dir = tmpDir("cw_replc_disjoint") + "/tbl"
    val t0 = new TargetTable(spark, dir, "ts", countRows = false)
    // poisoned windows: only a replace that actually LANDED can make
    // the final state equal the clean table
    val w1 = (java.time.LocalDate.parse("2024-01-06"),
      java.time.LocalDate.parse("2024-01-11"))
    val w2 = (java.time.LocalDate.parse("2024-01-16"),
      java.time.LocalDate.parse("2024-01-21"))
    def inWin(w: (java.time.LocalDate, java.time.LocalDate)) =
      col("ts").cast("date") >= lit(java.sql.Date.valueOf(w._1)) &&
        col("ts").cast("date") < lit(java.sql.Date.valueOf(w._2))
    t0.init(events.withColumn("value",
      when(inWin(w1) || inWin(w2), lit(-999.0)).otherwise(col("value"))))
    val a = new TargetTable(spark, dir, "ts", countRows = false)
    val b = new TargetTable(spark, dir, "ts", countRows = false)
    val errs = inParallel(
      () => a.replaceRangeConcurrent(events.filter(inWin(w1)), w1._1, w1._2),
      () => b.replaceRangeConcurrent(events.filter(inWin(w2)), w2._1, w2._2))
    assert(errs.forall(_.isEmpty), s"both disjoint backfills must commit: $errs")
    assert(!new java.io.File(dir + TargetTable.LeaseSuffix).exists(),
      "optimistic replaces must not create the writer lease")
    assert(!new java.io.File(dir).listFiles.exists(
      _.getName.startsWith(TargetTable.ReplaceIntentPrefix)),
      "both markers must be cleared")
    assertSameRows(
      new TargetTable(spark, dir, "ts", countRows = false).read(), events)
  }

  test("overlapping optimistic backfills: the loser aborts with a full rollback") {
    val dir = tmpDir("cw_replc_overlap") + "/tbl"
    val t0 = new TargetTable(spark, dir, "ts", countRows = false)
    t0.init(daySlice(1, 15))
    val a = new TargetTable(spark, dir, "ts", countRows = false)
    val b = new TargetTable(spark, dir, "ts", countRows = false)
    val bFresh = daySlice(3, 5).withColumn("value", lit(7.0))
    // b commits its overlapping replace between a's file moves and a's
    // commit: a must see b's in-range removals and abort
    a.onOptimisticCommit = () =>
      b.replaceRangeConcurrent(bFresh,
        java.time.LocalDate.parse("2024-01-03"),
        java.time.LocalDate.parse("2024-01-06"))
    val e = intercept[ConcurrentWriteConflictException] {
      a.replaceRangeConcurrent(
        daySlice(2, 4).withColumn("value", lit(9.0)),
        java.time.LocalDate.parse("2024-01-02"),
        java.time.LocalDate.parse("2024-01-05"))
    }
    assert(e.getMessage.contains("overlapping"), e.getMessage)
    // full rollback: exactly b's outcome, no markers, retry succeeds
    val t = new TargetTable(spark, dir, "ts", countRows = false)
    assertSameRows(t.read(),
      daySlice(1, 2).unionAll(bFresh).unionAll(daySlice(6, 15)))
    assert(!new java.io.File(dir).listFiles.exists(
      _.getName.startsWith(TargetTable.ReplaceIntentPrefix)),
      "the aborted replace must clear its marker")
    a.onOptimisticCommit = () => ()
    a.replaceRangeConcurrent(
      daySlice(2, 4).withColumn("value", lit(9.0)),
      java.time.LocalDate.parse("2024-01-02"),
      java.time.LocalDate.parse("2024-01-05"))
    assertSameRows(
      new TargetTable(spark, dir, "ts", countRows = false).read(),
      daySlice(1, 1).unionAll(daySlice(2, 4).withColumn("value", lit(9.0)))
        .unionAll(bFresh.filter(dayofmonth(col("ts")) === 5))
        .unionAll(daySlice(6, 15)))
  }

  test("an append racing an optimistic replace is absorbed (append-then-replace)") {
    val dir = tmpDir("cw_replc_absorb") + "/tbl"
    val t0 = freshTable(dir)
    val a = new TargetTable(spark, dir, "ts", countRows = false)
    val b = new TargetTable(spark, dir, "ts", countRows = false)
    val fresh = daySlice(2, 3).withColumn("value", lit(0.0))
    var appendErr: Option[Throwable] = None
    b.onOptimisticCommit = () =>
      appendErr = try { a.appendConcurrent(daySlice(2, 2)); None }
        catch { case e: Throwable => Some(e) }
    b.replaceRangeConcurrent(fresh,
      java.time.LocalDate.parse("2024-01-02"),
      java.time.LocalDate.parse("2024-01-04"))
    b.onOptimisticCommit = () => ()
    assert(appendErr.isEmpty,
      s"the raced append itself must succeed (it committed first): $appendErr")
    assertSameRows(
      new TargetTable(spark, dir, "ts", countRows = false).read(),
      daySlice(1, 1).unionAll(fresh).unionAll(daySlice(4, 5)))
    t0.read().count() // keep t0 used
  }

  test("optimistic replace rejects rows outside its range, NULL-ts included") {
    val dir = tmpDir("cw_replc_range") + "/tbl"
    freshTable(dir)
    val a = new TargetTable(spark, dir, "ts", countRows = false)
    val e = intercept[IllegalArgumentException] {
      a.replaceRangeConcurrent(daySlice(2, 6),
        java.time.LocalDate.parse("2024-01-02"),
        java.time.LocalDate.parse("2024-01-04"))
    }
    assert(e.getMessage.contains("outside"), e.getMessage)
    // nothing changed, nothing leaked
    assertSameRows(
      new TargetTable(spark, dir, "ts", countRows = false).read(),
      daySlice(1, 5))
    assert(!new java.io.File(dir).listFiles.exists(
      _.getName.startsWith(TargetTable.ReplaceIntentPrefix)))
  }

  test("stale optimistic-replace markers repair forward or back by the manifest") {
    val dir = tmpDir("cw_replc_repair") + "/tbl"
    val t0 = freshTable(dir)
    val live = new java.io.File(dir).listFiles
      .find(_.getName.startsWith("p_date=")).get
    val liveFile = live.listFiles.find(_.getName.endsWith(".parquet")).get
    val orphan = new java.io.File(live, "part-replc-orphan.c000.snappy.parquet")
    java.nio.file.Files.copy(liveFile.toPath, orphan.toPath)
    val staleHb = System.currentTimeMillis() - TargetTable.OptAppendStaleMs - 1000
    // BACK: staged file never committed -> deleted outright
    java.nio.file.Files.writeString(
      new java.io.File(dir, TargetTable.ReplaceIntentPrefix + "back0001").toPath,
      s"orig=${live.getName}/${liveFile.getName}\n" +
        s"staged=${live.getName}/${orphan.getName}\nopt=1\nhb=$staleHb\n")
    assert(t0.repairOrphanedConcurrentReplaces() == 1)
    assert(!orphan.exists(), "uncommitted staged file must be deleted")
    assertSameRows(
      new TargetTable(spark, dir, "ts", countRows = false).read(), daySlice(1, 5))
    // FORWARD: staged names all live in the manifest; the recorded
    // original (on disk, unpublished) must be trash-parked
    java.nio.file.Files.copy(liveFile.toPath, orphan.toPath)
    java.nio.file.Files.writeString(
      new java.io.File(dir, TargetTable.ReplaceIntentPrefix + "fwd00001").toPath,
      s"orig=${live.getName}/${orphan.getName}\n" +
        s"staged=${live.getName}/${liveFile.getName}\nopt=1\nhb=$staleHb\n")
    assert(t0.repairOrphanedConcurrentReplaces() == 1)
    assert(orphan.exists(), "a parked original stays on disk until vacuum")
    t0.vacuum(olderThanMillis = 0)
    assert(!orphan.exists(), "vacuum must reap the parked original")
    assertSameRows(
      new TargetTable(spark, dir, "ts", countRows = false).read(), daySlice(1, 5))
  }

  test("relistManifest refuses while a fresh optimistic marker exists") {
    val dir = tmpDir("cw_relist_guard") + "/tbl"
    freshTable(dir)
    val a = new TargetTable(spark, dir, "ts", countRows = false)
    val b = new TargetTable(spark, dir, "ts", countRows = false)
    var refusal: Option[Throwable] = None
    a.onOptimisticCommit = () =>
      refusal = try { b.relistManifest(); None }
        catch { case e: Throwable => Some(e) }
    a.appendConcurrent(daySlice(10, 12))
    a.onOptimisticCommit = () => ()
    assert(refusal.exists(_.isInstanceOf[IllegalStateException]),
      s"a relist during a live optimistic append must refuse: $refusal")
    assert(refusal.exists(_.getMessage.contains("optimistic")), refusal)
    // the append still committed, and a relist AFTER it succeeds
    b.relistManifest()
    assertSameRows(
      new TargetTable(spark, dir, "ts", countRows = false).read(),
      daySlice(1, 5).unionAll(daySlice(10, 12)))
  }

  test("a schema change mid-flight aborts the append") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("cw_schema") + "/tbl"
    freshTable(dir)
    val a = new TargetTable(spark, dir, "ts", countRows = false)
    val b = new TargetTable(spark, dir, "ts", countRows = false)
    a.onOptimisticCommit = () => {
      // a sibling evolves the schema and commits a new header: this
      // append's files were written under the OLD schema
      b.evolveSchema(
        StructType(events.schema.fields :+ StructField("extra", LongType)),
        OnSchemaChange.AppendNewColumns)
      b.append(daySlice(28, 28).withColumn("extra", lit(1L)))
    }
    val e = intercept[ConcurrentWriteConflictException] {
      a.appendConcurrent(daySlice(10, 12))
    }
    assert(e.getMessage.contains("schema"), e.getMessage)
    // rollback clean; the retry (new instance = new basis) succeeds
    val t = new TargetTable(spark, dir, "ts", countRows = false)
    val before = t.read().count()
    t.appendConcurrent(daySlice(10, 12))
    assert(new TargetTable(spark, dir, "ts", countRows = false)
      .read().count() == before + daySlice(10, 12).count())
  }
}
