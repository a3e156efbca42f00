package graft.ibtp

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Single-writer lease scenarios: the crash-repair state machines
  * (swap/replace/compact intent markers, orphan sweeps) assume one
  * writer per target — the serialization the reference inherits from
  * warehouse transactions (`insert_by_timeperiod_loop.sql:134`). Two
  * interleaved runners must not "repair" each other's in-flight work:
  * the second fails fast while the first's heartbeat is fresh, and a
  * dead holder's lease goes stale and is taken over.
  */
class WriterLeaseSpec extends SparkSpecBase {

  private val jan1 = LocalDate.of(2024, 1, 1)
  private val jan8 = LocalDate.of(2024, 1, 8)

  private def model: IbtpModel = IbtpModel.DfModel { (s, from, to) =>
    table("events")
      .filter(col("ts") >= from && col("ts") < to)
      .groupBy(col("ts").cast("date").cast("timestamp").as("day"))
      .agg(count("*").as("n_events"))
  }

  private def params = IbtpRunner.RunParams(
    IbtpConfig("day", Some(jan1), Some(jan8)), today = jan8)

  private def leaseFile(path: String) =
    new java.io.File(path + TargetTable.LeaseSuffix)

  test("a second concurrent runner is rejected while the first is mid-loop") {
    val path = tmpDir("lease_concurrent")
    @volatile var rejected: Option[IllegalStateException] = None
    @volatile var tried = false
    // interleave deterministically: runner B starts from INSIDE runner
    // A's first period materialization — exactly the window where B's
    // start-of-run repairs would destroy A's in-flight state
    val interleaving: IbtpModel = IbtpModel.DfModel { (s, from, to) =>
      if (!tried) {
        tried = true
        val t2 = new TargetTable(spark, path, "day")
        rejected = Some(intercept[IllegalStateException] {
          IbtpRunner.run(spark, model, t2, params)
        })
      }
      table("events")
        .filter(col("ts") >= from && col("ts") < to)
        .groupBy(col("ts").cast("date").cast("timestamp").as("day"))
        .agg(count("*").as("n_events"))
    }
    val t1 = new TargetTable(spark, path, "day")
    val res = IbtpRunner.run(spark, interleaving, t1, params)
    assert(res.rowsInserted > 0, "runner A completes normally")
    assert(rejected.exists(_.getMessage.contains("locked by writer")),
      s"runner B must fail fast with the lease diagnostics, got $rejected")
    assert(!leaseFile(path).exists(), "lease released after the run")
    // and with A done, a fresh B-run proceeds (caught-up no-op)
    val t3 = new TargetTable(spark, path, "day")
    IbtpRunner.run(spark, model, t3, params)
    assert(!leaseFile(path).exists())
  }

  test("a stale lease (dead holder) is taken over; a fresh one blocks") {
    val path = tmpDir("lease_stale")
    def plant(heartbeat: Long): Unit =
      java.nio.file.Files.writeString(leaseFile(path).toPath,
        s"holder=0@dead\nlease_id=deadbeef\nheartbeat=$heartbeat\n")
    // fresh foreign lease -> fail fast, target untouched
    plant(System.currentTimeMillis())
    val t = new TargetTable(spark, path, "day")
    val e = intercept[IllegalStateException] { IbtpRunner.run(spark, model, t, params) }
    assert(e.getMessage.contains("locked by writer 0@dead"))
    assert(!t.exists, "rejected run must not have created the target")
    // stale lease (holder died LeaseStaleMs+ ago) -> takeover, run lands
    plant(System.currentTimeMillis() - TargetTable.LeaseStaleMs - 60000)
    val res = IbtpRunner.run(spark, model, t, params)
    assert(res.rowsInserted > 0)
    assert(!leaseFile(path).exists(), "taken-over lease released after the run")
  }

  test("a failed run releases the lease; compact is reentrant under it") {
    val path = tmpDir("lease_release")
    val boom: IbtpModel = IbtpModel.DfModel { (_, _, _) =>
      throw new RuntimeException("model exploded")
    }
    val t = new TargetTable(spark, path, "day")
    intercept[RuntimeException] { IbtpRunner.run(spark, boom, t, params) }
    assert(!leaseFile(path).exists(), "failure path must release the lease")
    // a run WITH auto-compaction exercises compact() under the runner's
    // held lease — reentrancy, not self-deadlock
    val res = IbtpRunner.run(spark, model, t,
      params.copy(autoCompactTargetFileBytes = Some(128L * 1024 * 1024)))
    assert(res.rowsInserted > 0)
    assert(!leaseFile(path).exists())
    // standalone compact takes (and releases) its own lease
    t.compact()
    assert(!leaseFile(path).exists())
  }

  test("a direct init() on a manifest table is blocked by a live writer") {
    // init's start-of-mutation repairs (repairOrphanedAppends in
    // particular) are destructive to a live sibling append's
    // moved-but-uncommitted files — they must not run beside one
    val path = tmpDir("lease_init")
    val t = new TargetTable(spark, path, "day")
    IbtpRunner.run(spark, model, t, params) // manifest table now exists
    val holder = new TargetTable(spark, path, "day")
    val id = holder.acquireWriterLease()
    try {
      val other = new TargetTable(spark, path, "day")
      val df = model.query(spark, PeriodBounds(jan1, jan8))
      val e = intercept[IllegalStateException] { other.init(df) }
      assert(e.getMessage.contains("locked by writer"), e.getMessage)
    } finally holder.releaseWriterLease(id)
    // with the lease free, a direct init proceeds (reentrant under its own)
    val t3 = new TargetTable(spark, path, "day")
    assert(t3.init(model.query(spark, PeriodBounds(jan1, jan8))) > 0)
    assert(!leaseFile(path).exists(), "init must release its lease")
  }

  test("vacuum runs under the lease: blocked by a live writer, reentrant under one") {
    val path = tmpDir("lease_vacuum")
    val t = new TargetTable(spark, path, "day")
    IbtpRunner.run(spark, model, t, params)
    // replace a window so the trash has parked files to reap
    val repl = model.query(spark, PeriodBounds(jan1, jan1.plusDays(2)))
    t.replaceRange(repl, jan1, jan1.plusDays(2))
    // a LIVE writer on another instance blocks a standalone vacuum —
    // reaping must not interleave with that writer's park/commit
    val holder = new TargetTable(spark, path, "day")
    val id = holder.acquireWriterLease()
    try {
      val other = new TargetTable(spark, path, "day")
      val e = intercept[IllegalStateException] { other.vacuum(0L) }
      assert(e.getMessage.contains("locked by writer"), e.getMessage)
    } finally holder.releaseWriterLease(id)
    // with the lease free, vacuum takes and releases its own
    assert(t.vacuum(0L) > 0, "expired trash must be reaped once unblocked")
    assert(!leaseFile(path).exists(), "vacuum must release its lease")
  }

  // ---- heartbeat-window failure injection -------------------------------

  test("a contender can never acquire through a heartbeat (in-place rewrite)") {
    // regression for the delete-then-rename heartbeat: in the window
    // where the old code had DELETED the lease file, a contender's
    // create(overwrite=false) succeeded and two live writers ran. The
    // in-place rewrite never removes the file, so a contender hammering
    // acquire while the holder heartbeats in a tight loop must be
    // rejected on every single attempt.
    val path = tmpDir("lease_hb_hammer") + "/tbl"
    val t1 = new TargetTable(spark, path, "day")
    val id = t1.acquireWriterLease()
    @volatile var acquired = 0
    @volatile var stop = false
    val contender = new Thread(() => {
      val t2 = new TargetTable(spark, path, "day")
      while (!stop)
        try { t2.acquireWriterLease(); acquired += 1; stop = true }
        catch { case _: IllegalStateException => () }
    })
    contender.start()
    try (1 to 300).foreach(_ => t1.heartbeatLease())
    finally { stop = true; contender.join(10000) }
    assert(acquired == 0,
      "a contender acquired the lease mid-heartbeat — the file blinked out")
    t1.releaseWriterLease(id)
    assert(!leaseFile(path).exists())
  }

  test("two contenders racing a stale takeover: exactly one wins") {
    // regression for delete-then-create takeover: both contenders
    // observe the stale heartbeat, both delete — the slower delete
    // removes the winner's FRESH lease and both acquire. The
    // rename-aside claim is atomic: one rename succeeds, the loser
    // throws.
    val path = tmpDir("lease_takeover_race") + "/tbl"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path).getParent)
    java.nio.file.Files.writeString(leaseFile(path).toPath,
      s"holder=0@dead\nlease_id=deadbeef\nheartbeat=${
        System.currentTimeMillis() - TargetTable.LeaseStaleMs - 60000}\n")
    val ready = new java.util.concurrent.CountDownLatch(2)
    val go = new java.util.concurrent.CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val losses = new java.util.concurrent.atomic.AtomicInteger(0)
    val ts = (1 to 2).map { _ =>
      val t = new TargetTable(spark, path, "day")
      val th = new Thread(() => {
        ready.countDown(); go.await()
        try { val i = t.acquireWriterLease(); wins.incrementAndGet(); t.releaseWriterLease(i) }
        catch { case _: IllegalStateException => losses.incrementAndGet(); () }
      })
      th.start(); th
    }
    ready.await(); go.countDown()
    ts.foreach(_.join(30000))
    assert(wins.get() == 1 && losses.get() == 1,
      s"stale takeover must have exactly one winner, got ${wins.get()} wins")
  }

  test("a takeover while the holder looked stale aborts the holder's next beat") {
    val path = tmpDir("lease_lost") + "/tbl"
    val t1 = new TargetTable(spark, path, "day")
    val id = t1.acquireWriterLease()
    // simulate a completed takeover (we looked stale, someone replaced
    // us) — written through the Hadoop FS so its checksum sidecar stays
    // consistent, as a real second process's write would be
    val hfs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(
      new org.apache.hadoop.fs.Path(path + TargetTable.LeaseSuffix), true)
    try out.write(
      s"holder=1@other\nlease_id=cafebabe\nheartbeat=${System.currentTimeMillis()}\n"
        .getBytes("UTF-8"))
    finally out.close()
    val e = intercept[IllegalStateException] { t1.heartbeatLease() }
    assert(e.getMessage.contains("writer lease lost"))
    // the old holder must NOT delete or overwrite the new holder's lease
    t1.releaseWriterLease(id)
    val content = java.nio.file.Files.readString(leaseFile(path).toPath)
    assert(content.contains("lease_id=cafebabe"),
      "release after a lost lease must leave the new holder's file intact")
    leaseFile(path).delete()
  }

  test("a zombie writer's manifest commit is fenced after a takeover") {
    // The lease race is bounded, not closed (no file CAS): a holder
    // that lost a takeover can reach its commit before its next
    // heartbeat check. The COMMIT layer must therefore fence it — the
    // takeover bumps the writer epoch and seals the manifest under it,
    // so the zombie's commit is rejected (or born shadowed), never the
    // latest manifest.
    val path = tmpDir("lease_zombie")
    val zombie = new TargetTable(spark, path, "day")
    IbtpRunner.run(spark, model, zombie, params) // manifest table exists
    val before = zombie.read().collect().toSeq.map(_.toString).sorted
    val zid = zombie.acquireWriterLease()
    // simulate the zombie's GC pause: its heartbeat (background daemon
    // beats every 60s — far beyond this test) goes stale on disk.
    // Rewritten through the Hadoop FS so the checksum sidecar stays
    // consistent, as the holder's own heartbeat write would be.
    val content = java.nio.file.Files.readString(leaseFile(path).toPath)
    val hfs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hout = hfs.create(
      new org.apache.hadoop.fs.Path(path + TargetTable.LeaseSuffix), true)
    try hout.write(content.replaceAll("heartbeat=\\d+",
      s"heartbeat=${System.currentTimeMillis() - TargetTable.LeaseStaleMs - 60000}")
      .getBytes("UTF-8"))
    finally hout.close()
    // a new holder legally takes over the stale lease (epoch bump + seal)
    val t2 = new TargetTable(spark, path, "day")
    val id2 = t2.acquireWriterLease()
    try {
      // the zombie wakes and lands its append BEFORE any heartbeat
      // check would run — the commit itself must reject it
      val e = intercept[IllegalStateException] {
        zombie.append(model.query(spark, PeriodBounds(jan1, jan1.plusDays(1))))
      }
      assert(e.getMessage.contains("fenced"), e.getMessage)
      // nothing the zombie staged became visible
      assert(zombie.read().collect().toSeq.map(_.toString).sorted == before,
        "a fenced commit must not change the readable table")
      // the new holder's own repair rolls the zombie's moved files back
      // (the fence left the append marker in place), then writes cleanly
      assert(t2.repairOrphanedAppends() == 1,
        "the zombie's un-published files must roll back under the new holder")
      assert(t2.read().collect().toSeq.map(_.toString).sorted == before)
    } finally t2.releaseWriterLease(id2)
    zombie.releaseWriterLease(zid) // must not delete the new holder's state
    // with the fence resolved, a fresh run proceeds normally
    val t3 = new TargetTable(spark, path, "day")
    IbtpRunner.run(spark, model, t3, params)
    assert(t3.read().collect().toSeq.map(_.toString).sorted == before)
  }

  test("a lease-less commit racing the takeover seal is folded into the re-seal") {
    // The held-lease zombie self-detects post-rename via the lease read;
    // a LEASE-LESS writer has no such counterpart: its delta can rename
    // AND post-rename-relist entirely inside the seal's basis-read ->
    // rename window, so it passes every check (epochAfter == its epoch,
    // leaseOk vacuous), reports success and deletes its append marker —
    // and the seal's checkpoint would shadow it in epoch-major replay
    // (files on disk, in no manifest, no marker for repair: a later
    // relist absorbs them as duplicate live rows). The seal must detect
    // the raced version after its own rename and fold it in. The
    // onSealBasis hook lands the lease-less append exactly inside that
    // window — deterministically, where wall-clock jitter never could.
    val path = tmpDir("lease_seal_raced")
    val t0 = new TargetTable(spark, path, "day")
    IbtpRunner.run(spark, model, t0, params) // manifest table exists
    val before = t0.read().collect().toSeq.map(_.toString).sorted
    val racedRow = model.query(spark, PeriodBounds(jan1, jan1.plusDays(1)))
      .collect().toSeq.map(_.toString)
    // plant a stale foreign lease so the next acquire is a TAKEOVER
    java.nio.file.Files.writeString(leaseFile(path).toPath,
      s"holder=0@dead\nlease_id=deadbeef\nheartbeat=${
        System.currentTimeMillis() - TargetTable.LeaseStaleMs - 60000}\n")
    val t2 = new TargetTable(spark, path, "day")
    @volatile var racedDone = false
    t2.onSealBasis = () => {
      // the raced lease-less append: runs synchronously inside the
      // basis-read -> seal-rename window, start to finish — its own
      // post-rename listing happens BEFORE the seal lands, so it
      // legitimately reports success and clears its marker
      val t3 = new TargetTable(spark, path, "day")
      t3.append(model.query(spark, PeriodBounds(jan1, jan1.plusDays(1))))
      racedDone = true
    }
    val id2 = t2.acquireWriterLease()
    try {
      assert(racedDone, "the raced append must have completed inside the seal window")
      // no append marker survived — the raced writer declared success,
      // so ONLY the seal's fold can keep its rows visible
      val markers = new java.io.File(path).listFiles()
        .filter(_.getName.startsWith(TargetTable.AppendIntentPrefix))
      assert(markers.isEmpty, s"raced append left markers: ${markers.mkString(",")}")
      val after = t2.read().collect().toSeq.map(_.toString).sorted
      assert(after == (before ++ racedRow).sorted,
        "the raced lease-less append's rows must survive the seal (folded in)")
    } finally t2.releaseWriterLease(id2)
    // and the folded state is durable: a fresh reader sees it too
    val t4 = new TargetTable(spark, path, "day")
    assert(t4.read().collect().toSeq.map(_.toString).sorted ==
      (before ++ racedRow).sorted)
  }

  test("a commit whose lease was replaced mid-flight rolls back even at an equal epoch") {
    // the one interleaving the epoch listing alone cannot see: a zombie
    // whose version rename AND post-rename listing both land inside the
    // takeover seal's read->rename window. The commit layer must also
    // verify LEASE ownership post-rename — the lease file is replaced
    // at claim time, strictly before the seal reads its basis — so the
    // zombie rolls its version back and keeps its append marker for
    // repair, instead of reporting success on a commit the seal is
    // about to shadow.
    val path = tmpDir("lease_commit_guard")
    val zombie = new TargetTable(spark, path, "day")
    IbtpRunner.run(spark, model, zombie, params)
    val before = zombie.read().collect().toSeq.map(_.toString).sorted
    val mdir = new java.io.File(path, TargetTable.ManifestDirName)
    def versionCount() = mdir.listFiles().count(!_.getName.startsWith("."))
    val zid = zombie.acquireWriterLease()
    val nVersions = versionCount()
    // simulate the claim landing mid-commit: foreign lease, NO seal yet
    // (epoch listing alone would pass — that is the point)
    val hfs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(
      new org.apache.hadoop.fs.Path(path + TargetTable.LeaseSuffix), true)
    try out.write(
      s"holder=1@claimant\nlease_id=claim99\nepoch=999\nheartbeat=${
        System.currentTimeMillis()}\n".getBytes("UTF-8"))
    finally out.close()
    val e = intercept[IllegalStateException] {
      zombie.append(model.query(spark, PeriodBounds(jan1, jan1.plusDays(1))))
    }
    assert(e.getMessage.contains("fenced"), e.getMessage)
    assert(versionCount() == nVersions,
      "the rolled-back commit must not leave a version file behind")
    assert(zombie.read().collect().toSeq.map(_.toString).sorted == before)
    // the append marker survived, so the new holder's repair rolls the
    // moved-in files back
    val t2 = new TargetTable(spark, path, "day")
    assert(t2.repairOrphanedAppends() == 1)
    assert(t2.read().collect().toSeq.map(_.toString).sorted == before)
    zombie.releaseWriterLease(zid)
    hfs.delete(new org.apache.hadoop.fs.Path(path + TargetTable.LeaseSuffix), false)
  }

  test("takeover races never double-acquire across a tight injected-settle loop") {
    // tight loop over the takeover race with a SHORT FIXED settle (no
    // randomized jitter, no wall-clock luck). The honest contract of a
    // no-CAS claim is AT MOST one winner — the safety property two
    // concurrent crash-repairs would violate — plus clean mutual aborts
    // the caller can retry (and the manifest epoch fence shadows
    // whatever a missed interleaving would commit — see the zombie
    // test). Zero-winner rounds are legal rare outcomes of simultaneous
    // claims; systematically zero would be a liveness bug, so the loop
    // also demands a majority of rounds produce a winner.
    val path = tmpDir("lease_settle_race") + "/tbl"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path).getParent)
    var winnerRounds = 0
    val rounds = 10
    (1 to rounds).foreach { round =>
      // reset: the previous round may have ended in a mutual abort,
      // leaving a torn claim (and, on the local checksum FS, stale
      // .crc litter) that in production goes mtime-stale and is then
      // taken over like any corrupt lease
      new java.io.File(leaseFile(path).getParent).listFiles()
        .filter(_.getName.contains(TargetTable.LeaseSuffix.stripPrefix("__")))
        .foreach(_.delete())
      java.nio.file.Files.writeString(leaseFile(path).toPath,
        s"holder=0@dead\nlease_id=deadbeef\nheartbeat=${
          System.currentTimeMillis() - TargetTable.LeaseStaleMs - 60000}\n")
      val go = new java.util.concurrent.CountDownLatch(1)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val badAborts = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val ts = (1 to 2).map { _ =>
        val t = new TargetTable(spark, path, "day")
        t.settleMillis = () => 25L
        val th = new Thread(() => {
          go.await()
          try {
            val i = t.acquireWriterLease()
            wins.incrementAndGet(); t.releaseWriterLease(i)
          } catch {
            case _: IllegalStateException => () // clean abort: retryable
            case e: Throwable => badAborts.add(e.toString.take(300))
          }
        })
        th.start(); th
      }
      go.countDown(); ts.foreach(_.join(30000))
      assert(badAborts.isEmpty,
        s"round $round: non-clean abort: ${badAborts.peek()}")
      assert(wins.get() <= 1,
        s"round $round: DOUBLE ACQUIRE — ${wins.get()} winners")
      if (wins.get() == 1) {
        winnerRounds += 1
        assert(!leaseFile(path).exists(), s"round $round: lease must be released")
      }
    }
    assert(winnerRounds * 2 >= rounds,
      s"only $winnerRounds/$rounds rounds produced a winner — liveness regression")
  }

  test("the settle re-check catches a rival claim landing after the heartbeat rewrite") {
    // THE residual no-CAS interleaving, driven deterministically: this
    // holder is takeover-eligible (its beat gap blew the staleness
    // window), a rival's claim lands AFTER the holder's heartbeat
    // rewrite buried it — the settle re-check must still see the
    // foreign id and abort, instead of running on as a zombie. The
    // injected settle plants the rival exactly inside that window,
    // which wall-clock jitter could never pin down.
    val path = tmpDir("lease_settle_rival") + "/tbl"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path).getParent)
    val t = new TargetTable(spark, path, "day")
    val id = t.acquireWriterLease(staleAfterMillis = 50L)
    Thread.sleep(80) // beat gap 80ms > 50ms window: takeover-eligible
    val hfs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    t.settleMillis = () => {
      val out = hfs.create(
        new org.apache.hadoop.fs.Path(path + TargetTable.LeaseSuffix), true)
      try out.write(
        s"holder=1@rival\nlease_id=rival123\nepoch=99\nheartbeat=${
          System.currentTimeMillis()}\n".getBytes("UTF-8"))
      finally out.close()
      0L
    }
    val e = intercept[IllegalStateException] { t.heartbeatLease() }
    assert(e.getMessage.contains("writer lease lost"), e.getMessage)
    // the old holder must leave the rival's lease intact on release
    t.releaseWriterLease(id)
    val content = java.nio.file.Files.readString(leaseFile(path).toPath)
    assert(content.contains("lease_id=rival123"),
      "release after the lost settle re-check must not touch the rival's lease")
    leaseFile(path).delete()
  }

  test("a corrupt lease (holder died mid-heartbeat) goes stale by mtime") {
    val path = tmpDir("lease_corrupt") + "/tbl"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path).getParent)
    // torn write: no parseable heartbeat at all
    java.nio.file.Files.writeString(leaseFile(path).toPath, "holder=0@dead\nlea")
    val t = new TargetTable(spark, path, "day")
    // fresh mtime: could be a live holder's rewrite caught mid-flight -> fail fast
    val e = intercept[IllegalStateException] { t.acquireWriterLease() }
    assert(e.getMessage.contains("locked by writer"))
    // old mtime: the writer died mid-rewrite long ago -> takeover, not deadlock
    assert(leaseFile(path).setLastModified(
      System.currentTimeMillis() - TargetTable.LeaseStaleMs - 60000))
    val id = t.acquireWriterLease()
    t.releaseWriterLease(id)
    assert(!leaseFile(path).exists())
  }

  test("streaming catch-up holds the lease; a batch run is rejected mid-stream") {
    import graft.streaming.{EventStream, StreamingIngest}
    val src = tmpDir("lease_stream_src")
    val ckp = tmpDir("lease_stream_ckp")
    val path = tmpDir("lease_stream_tgt") + "/tbl"
    spark.read.parquet(s"$sfDir/events.parquet").coalesce(1)
      .write.mode("overwrite").parquet(s"$src/stage")
    val f = new java.io.File(s"$src/stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(f.toPath,
      java.nio.file.Paths.get(s"$src/events0.parquet"))
    val target = new TargetTable(spark, path, "ts")
    @volatile var streamDone = false
    @volatile var streamErr: Option[Throwable] = None
    val streamer = new Thread(() => {
      try StreamingIngest.catchUp(
        EventStream.readEvents(spark, src), target, ckp)
      catch { case e: Throwable => streamErr = Some(e) }
      finally streamDone = true
    })
    streamer.start()
    // the stream acquires the lease BEFORE starting the query, so the
    // file must appear; a batch contender at that moment is rejected
    val deadline = System.currentTimeMillis() + 60000
    while (!leaseFile(path).exists() && !streamDone &&
      System.currentTimeMillis() < deadline) Thread.sleep(10)
    assert(leaseFile(path).exists() || !streamDone,
      "stream finished without the lease file ever appearing")
    if (leaseFile(path).exists()) {
      val t2 = new TargetTable(spark, path, "ts")
      try {
        val i2 = t2.acquireWriterLease()
        // acquire succeeded: only legitimate if the stream had already
        // finished and released
        assert(streamDone, "batch writer acquired the lease mid-stream")
        t2.releaseWriterLease(i2)
      } catch {
        case e: IllegalStateException =>
          assert(e.getMessage.contains("locked by writer"))
      }
    }
    streamer.join(120000)
    assert(streamErr.isEmpty, s"stream failed: $streamErr")
    assert(!leaseFile(path).exists(), "stream must release the lease")
    assert(target.read().count() > 0)
  }
}
