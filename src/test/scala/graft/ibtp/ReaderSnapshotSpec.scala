package graft.ibtp

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Reader-snapshot manifest scenarios: `read()` plans against the
  * latest committed manifest (`_graft_manifest/v<N>.list`), so a
  * reader planning at ANY instant of a maintenance operation sees the
  * pre- or post-operation file set — never a partial one — and
  * replaced files stay on disk (trash-parked) until [[TargetTable
  * .vacuum]] reaps them, giving already-planned scans a grace window.
  * The reference gets all of this from warehouse transactions; the
  * manifest is its parquet-native analogue.
  */
class ReaderSnapshotSpec extends SparkSpecBase {
  import spark.implicits._

  private def day(d: String) = java.sql.Date.valueOf(d)

  /** Target with two files in each of two day-partitions. */
  private def build(prefix: String): TargetTable = {
    val t = new TargetTable(spark, tmpDir(prefix), "day")
    t.init(Seq((day("2024-01-01"), "a", 1), (day("2024-01-02"), "b", 2))
      .toDF("day", "k", "v"))
    t.append(Seq((day("2024-01-01"), "c", 3), (day("2024-01-02"), "d", 4))
      .toDF("day", "k", "v"))
    t
  }

  private def fileNames(files: Array[String]): Set[String] =
    files.map(f => f.substring(f.lastIndexOf('/') + 1)).toSet

  test("a reader at any instant of a compaction sees old or new files, never partial") {
    // the per-partition assertions below assume BOTH candidate
    // partitions ride one rewrite batch (one atomic manifest commit);
    // with GRAFT_COMPACT_CONCURRENCY=1 in the environment each would
    // commit separately and the phase>=2 arm would fail spuriously
    assume(TargetTable.CompactMaxConcurrentRewrites >= 2,
      "fixture needs a rewrite batch of >= 2 (GRAFT_COMPACT_CONCURRENCY)")
    for (phase <- Seq(1, 2, 3)) {
      val t = build(s"snap_phase$phase")
      val beforeRows = t.read().collect().map(_.toString).sorted
      // per-partition file names the scan reads (part names are job-unique)
      def scanned(dir: String): Set[String] =
        fileNames(t.read().inputFiles.filter(_.contains(dir)))
      val before01 = scanned("p_date=2024-01-01")
      val before02 = scanned("p_date=2024-01-02")
      t.failCompactAt = phase
      intercept[IllegalStateException] { t.compact() }
      t.failCompactAt = 0
      assert(beforeRows.sameElements(t.read().collect().map(_.toString).sorted),
        s"phase $phase: rows changed under a crashed compaction")
      // both candidate partitions ride ONE rewrite batch and ONE
      // atomic manifest commit (compactLocked batches up to
      // CompactMaxConcurrentRewrites partitions per commit): the scan's
      // files must be EXACTLY the originals for EVERY partition
      // (phase 1: the manifest never switched, so the staged copies
      // sitting in the directories are invisible) or EXACTLY the
      // compacted set for every partition (phases 2-3: the atomic
      // switch happened) — never a mix, per partition or across the
      // batch
      for ((dir, orig) <- Seq("p_date=2024-01-01" -> before01,
                              "p_date=2024-01-02" -> before02)) {
        val mid = scanned(dir)
        if (phase == 1)
          assert(mid == orig,
            s"phase $phase $dir: scan must still read the pre-compaction set")
        else
          assert(mid.nonEmpty && mid.intersect(orig).isEmpty,
            s"phase $phase $dir: must read ONLY compacted files after the switch")
      }
    }
  }

  test("a failed concurrent rewrite reaps its completed siblings' stage dirs in-process") {
    // round-16 fix: when one rewrite of a concurrent batch fails, the
    // batch never commits — siblings that staged successfully must have
    // their __compact_ stage dirs deleted before the failure propagates
    // (previously they lingered for the 15-minute-aged sweep), no
    // intent marker may exist, and readers must be untouched.
    assume(TargetTable.CompactMaxConcurrentRewrites >= 2,
      "fixture needs a rewrite batch of >= 2 (GRAFT_COMPACT_CONCURRENCY)")
    val t = build("snap_rewritefail")
    val before = t.read().collect().map(_.toString).sorted
    t.crashHook = nm =>
      if (nm == "compact:rewrite:2024-01-02")
        throw new RuntimeException("injected rewrite failure")
    val e = intercept[RuntimeException] { t.compact() }
    t.crashHook = _ => ()
    assert(e.getMessage.contains("injected rewrite failure"))
    val parent = new java.io.File(t.path).getParentFile
    val leftovers = parent.listFiles()
      .filter(_.getName.startsWith(new java.io.File(t.path).getName + "__compact_"))
    assert(leftovers.isEmpty,
      s"completed siblings' stage dirs must be reaped: ${leftovers.mkString(",")}")
    assert(!new java.io.File(t.path, TargetTable.CompactIntentFile).exists,
      "no intent marker may exist — the batch never reached its commit")
    assert(before.sameElements(t.read().collect().map(_.toString).sorted),
      "a failed rewrite batch must be invisible to readers")
    // the table compacts cleanly afterwards
    assert(t.compact().nonEmpty)
    assert(before.sameElements(t.read().collect().map(_.toString).sorted))
  }

  test("replaced originals are retention-parked; vacuum reaps them") {
    val t = build("snap_vacuum")
    val before = t.read().collect().map(_.toString).sorted
    val origFiles = fileNames(t.read().inputFiles)
    val stats = t.compact()
    assert(stats.nonEmpty)
    // rows identical through the switch; scan now reads the compacted set
    assert(t.read().collect().map(_.toString).sorted.sameElements(before))
    val newFiles = fileNames(t.read().inputFiles)
    assert(newFiles.intersect(origFiles).isEmpty,
      "post-compaction scan must not read any original file")
    // the originals are still on DISK for readers pinned to the old
    // manifest (the grace window)...
    val dir = new java.io.File(t.path, "p_date=2024-01-01")
    val onDisk = dir.listFiles().map(_.getName).filter(_.startsWith("part-")).toSet
    assert(origFiles.exists(onDisk.contains),
      "originals must stay on disk within the retention window")
    // ...a young vacuum keeps them; vacuum(0) reaps them
    assert(t.vacuum() == 0, "retention-young trash must survive vacuum")
    assert(t.vacuum(0L) > 0, "vacuum(0) must reap the parked originals")
    val afterVacuum = dir.listFiles().map(_.getName).filter(_.startsWith("part-")).toSet
    assert(afterVacuum.intersect(origFiles.filter(onDisk.contains)).isEmpty,
      "vacuumed originals must be gone from disk")
    assert(t.read().collect().map(_.toString).sorted.sameElements(before),
      "vacuum must not change what readers see")
  }

  test("a scan planned before a compaction still reads during the grace window") {
    val t = build("snap_grace")
    val pinned = t.read() // planned against the pre-compaction manifest
    val expect = pinned.count()
    t.compact()
    // the pinned plan's files are trash-parked but present: the old
    // reader completes (this is what the retention buys)
    assert(pinned.count() == expect)
    assert(t.read().count() == expect)
  }

  test("stray files in a partition dir are invisible to manifest readers") {
    val t = build("snap_stray")
    val before = t.read().count()
    // simulate debris: copy a live file to a fresh name in the same dir
    val dir = new java.io.File(t.path, "p_date=2024-01-01")
    val live = dir.listFiles().filter(_.getName.startsWith("part-")).head
    java.nio.file.Files.copy(live.toPath,
      new java.io.File(dir, "part-stray-copy.parquet").toPath)
    assert(t.read().count() == before,
      "a file never committed to the manifest must not be scanned")
    assert(!fileNames(t.read().inputFiles).contains("part-stray-copy.parquet"))
  }

  test("pre-manifest tables read via directory listing and upgrade on first mutation") {
    val t = build("snap_upgrade")
    val before = t.read().collect().map(_.toString).sorted
    // simulate a table written before the manifest era
    val mdir = new java.io.File(t.path, TargetTable.ManifestDirName)
    mdir.listFiles().foreach(_.delete()); mdir.delete()
    assert(t.read().collect().map(_.toString).sorted.sameElements(before),
      "directory-listing fallback must serve pre-manifest tables")
    // first mutation commits a manifest covering the WHOLE table
    t.append(Seq((day("2024-01-03"), "e", 5)).toDF("day", "k", "v"))
    assert(new java.io.File(t.path, TargetTable.ManifestDirName).exists())
    val rows = t.read().collect().map(_.toString).sorted
    assert(rows.length == before.length + 1)
    // and the manifest covers the old partitions too, not just the touched one
    assert(t.read().inputFiles.exists(_.contains("p_date=2024-01-01")))
  }

  test("manifest versions are pruned but the latest always wins") {
    val t = build("snap_prune")
    (1 to 8).foreach { i =>
      t.append(Seq((day("2024-01-04"), s"x$i", i)).toDF("day", "k", "v"))
    }
    val versions = new java.io.File(t.path, TargetTable.ManifestDirName)
      .listFiles().map(_.getName).filter(_.endsWith(".list")).sorted
    assert(versions.length <= TargetTable.ManifestKeep,
      s"old manifest versions must be pruned, found ${versions.length}")
    // the latest manifest sees every append
    assert(t.read().filter(col("k").startsWith("x")).count() == 8)
  }

  test("relistManifest absorbs a non-manifest writer's files; appends never do") {
    val t = build("snap_relist")
    val n0 = t.read().count()
    // an external tool drops a parquet file straight into a partition
    // dir (no manifest commit): invisible to reads and the frontier
    val dir = new java.io.File(t.path, "p_date=2024-01-02")
    val src = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
    val alien = new java.io.File(dir, "part-alien-external.parquet")
    java.nio.file.Files.copy(src.toPath, alien.toPath)
    assert(t.read().count() == n0, "alien file must stay invisible")
    // an ordinary append publishes exactly its own staged names — the
    // alien file must NOT ride along
    t.append(Seq((day("2024-01-03"), "e", 5)).toDF("day", "k", "v"))
    assert(t.read().count() == n0 + 1, "append must not absorb alien files")
    // the documented remedy is explicit: relistManifest absorbs it
    t.relistManifest()
    assert(t.read().count() > n0 + 1, "relist must absorb the external file")
  }

  test("delta-log commits replay to exactly what a full relist computes") {
    val t = build("snap_delta")
    // a mixed workload: per-period appends (delta commits), a partition
    // replace (delta), a compaction (delta), and enough appends to cross
    // a checkpoint fold
    (1 to 10).foreach { i =>
      t.append(Seq((day(f"2024-01-${i % 3 + 3}%02d"), s"x$i", i)).toDF("day", "k", "v"))
    }
    t.replaceRange(
      Seq((day("2024-01-02"), "r", 99)).toDF("day", "k", "v"),
      java.time.LocalDate.of(2024, 1, 2), java.time.LocalDate.of(2024, 1, 3))
    t.compact()
    val mdir = new java.io.File(t.path, TargetTable.ManifestDirName)
    assert(mdir.listFiles().exists(_.getName.endsWith(".delta")),
      "the hot paths must commit deltas, not full rewrites")
    val rows     = t.read().collect().map(_.toString).sorted
    val replayed = t.latestManifest().get.sorted
    // the relist recomputes the live set from the directories (minus
    // trash) — the ground truth the replayed log must match exactly
    t.relistManifest()
    assert(t.latestManifest().get.sorted == replayed,
      "checkpoint+delta replay must equal the relisted live set")
    assert(t.read().collect().map(_.toString).sorted.sameElements(rows))
  }

  test("legacy single-number manifests read as epoch 0 and upgrade in place") {
    val t = build("snap_legacy")
    val rows = t.read().collect().map(_.toString).sorted
    val mdir = new java.io.File(t.path, TargetTable.ManifestDirName)
    // rewrite the log as one pre-delta-era version: a full listing under
    // the legacy 20-digit name (no epoch, no kind suffix distinction)
    val content = t.latestManifest().get.sorted.mkString("", "\n", "\n")
    mdir.listFiles().foreach(_.delete())
    java.nio.file.Files.writeString(
      new java.io.File(mdir, f"v${7L}%020d.list").toPath, content)
    assert(t.read().collect().map(_.toString).sorted.sameElements(rows),
      "a legacy manifest must keep serving reads")
    // the next mutation lands a NEW-format delta on top of it
    t.append(Seq((day("2024-01-05"), "n", 7)).toDF("day", "k", "v"))
    assert(mdir.listFiles().exists(_.getName.contains("_")),
      "new commits must use the epoch_seq naming")
    assert(t.read().count() == rows.length + 1,
      "replay must chain the legacy checkpoint and the new delta")
  }

  test("pruning keeps every replay chain a recent reader could still need") {
    // the unit of protection is a STATE: a reader that listed the log
    // just before a checkpoint fold is replaying the OLD checkpoint +
    // its deltas — the fold commit must not delete them (that would be
    // a regression of the single-file era's ManifestKeep window); only
    // ManifestKeep further commits may.
    val t = build("snap_prune_chain")
    val mdir = new java.io.File(t.path, TargetTable.ManifestDirName)
    def versions() = mdir.listFiles().map(_.getName)
      .filter(n => !n.startsWith(".")).sorted.toSeq
    val firstCkpt = versions().head
    assert(firstCkpt.endsWith(".list"))
    // drive appends up to and past the checkpoint fold
    var i = 0
    while (versions().count(_.endsWith(".list")) < 2 && i < 20) {
      i += 1
      t.append(Seq((day("2024-01-06"), s"p$i", i)).toDF("day", "k", "v"))
    }
    assert(versions().count(_.endsWith(".list")) >= 2, "fold never happened")
    assert(versions().contains(firstCkpt),
      "the fold must NOT delete the old checkpoint — a reader that " +
        "listed just before it is replaying exactly that chain")
    val expect = t.read().count()
    // ManifestKeep more commits age the old chain out
    (1 to TargetTable.ManifestKeep).foreach { j =>
      t.append(Seq((day("2024-01-07"), s"q$j", j)).toDF("day", "k", "v"))
    }
    assert(!versions().contains(firstCkpt),
      "aged-out chains must be pruned eventually")
    assert(t.read().count() == expect + TargetTable.ManifestKeep)
  }

  test("vacuum never reaps a file the latest manifest lists as live") {
    // defensive invariant: whatever a trash list claims (an interrupted
    // repair, a hand-edited state), --vacuum-only --retention-ms 0 must
    // not delete data out from under current readers
    val t = build("snap_vacuum_guard")
    val liveRel = t.latestManifest().get.head
    val deadDir = new java.io.File(t.path, TargetTable.TrashDirName)
    deadDir.mkdirs()
    // expired-looking poisoned list: one LIVE file + one absent name
    java.nio.file.Files.writeString(
      new java.io.File(deadDir, "0_poison.list").toPath,
      s"$liveRel\np_date=2024-01-01/part-already-gone.parquet\n")
    val before = t.read().count()
    t.vacuum(0L)
    assert(new java.io.File(t.path, liveRel).exists(),
      "a manifest-live file must survive vacuum regardless of parking")
    assert(t.read().count() == before)
    // the live entry stays parked for a later (legitimate) vacuum
    val remaining = deadDir.listFiles().filter(_.getName.endsWith(".list"))
      .flatMap(f => java.nio.file.Files.readAllLines(f.toPath).toArray())
    assert(remaining.contains(liveRel),
      "the guarded entry must remain parked, not be silently dropped")
  }

  test("a schema-only change rides a header delta, not a full rewrite") {
    val t = build("snap_hdr")
    val filesBefore = t.latestManifest().get.sorted
    val mdir = new java.io.File(t.path, TargetTable.ManifestDirName)
    val nBefore = mdir.listFiles().count(!_.getName.startsWith("."))
    // metadata-only widening (int -> long is a parquet read promotion)
    t.expandTargetColumnTypes(
      Seq((day("2024-01-01"), "a", 1L)).toDF("day", "k", "v").schema)
    assert(t.read().schema("v").dataType == org.apache.spark.sql.types.LongType,
      "readers must see the widened schema immediately")
    assert(t.latestManifest().get.sorted == filesBefore,
      "a schema-only commit must not change the live file set")
    val hdrDelta = mdir.listFiles().filter(!_.getName.startsWith("."))
      .sortBy(_.getName).last
    assert(hdrDelta.getName.endsWith(".delta") &&
      mdir.listFiles().count(!_.getName.startsWith(".")) == nBefore + 1,
      "the schema switch must land as one tiny delta version")
  }

  test("clustered compaction yields disjoint key ranges per file, rows intact") {
    // OPTIMIZE/Z-ORDER-lite: compact(clusterBy) must merge a
    // fragmented partition into range-clustered files whose parquet
    // min/max stats can prune selective predicates on the key — the
    // scan-locality lever at 100 TB
    val t = new TargetTable(spark, tmpDir("snap_cluster"), "day")
    // 8 appends, each spraying the full key range into 2024-01-01:
    // every small file covers (k0..k9) — the worst case for pruning
    t.init(Seq((day("2024-01-01"), "k5", 0)).toDF("day", "k", "v"))
    (1 to 8).foreach { i =>
      t.append((0 to 9).map(j => (day("2024-01-01"), f"k$j", i * 100 + j))
        .toDF("day", "k", "v"))
    }
    val before = t.read().collect().map(_.toString).sorted
    // size the byte target for ~3 output files from the 9 small inputs
    val dirFiles = new java.io.File(t.path, "p_date=2024-01-01").listFiles()
      .filter(_.getName.startsWith("part-"))
    val targetBytes = math.max(1L, dirFiles.map(_.length).sum / 3)
    val stats = t.compact(targetFileBytes = targetBytes, clusterBy = Seq("k"))
    assert(stats.nonEmpty && stats.head.filesAfter > 1,
      s"expected a multi-file clustered rewrite, got $stats")
    assert(t.read().collect().map(_.toString).sorted.sameElements(before),
      "clustering must not change table contents")
    // per-file key ranges must be pairwise disjoint (range partitioning)
    val ranges = t.read().inputFiles.filter(_.contains("p_date=2024-01-01"))
      .map { f =>
        val ks = spark.read.parquet(f).select("k").collect().map(_.getString(0))
        (ks.min, ks.max)
      }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"file key ranges overlap: $ranges")
      case _ => ()
    }
  }

  test("concurrent appends sharing the NULL-ts partition lose no files") {
    // stagedAppend's per-FILE move design exists for exactly this:
    // two concurrent period appends can legally share ONE partition
    // (NULL-ts rows both land in __HIVE_DEFAULT_PARTITION__, outside
    // the disjoint-periods contract). A whole-directory rename racing
    // the sibling's mkdirs would nest the staged dir inside the live
    // one (publishing paths with no files behind them), and unsynced
    // manifest commits would drop the slower sibling's names.
    val t = new TargetTable(spark, tmpDir("snap_nullts"), "day")
    t.init(Seq((day("2024-01-01"), "seed", 0)).toDF("day", "k", "v"))
    val nThreads = 2
    val nRounds = 5
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to nThreads).map { w =>
      val th = new Thread(() => {
        start.await()
        try (1 to nRounds).foreach { r =>
          // each append: one NULL-ts row (shared partition) + one row in
          // the thread's own disjoint date (the normal period contract)
          val df = Seq((Some(day(f"2024-02-$w%02d")), s"d$w-$r", r),
            (Option.empty[java.sql.Date], s"n$w-$r", r))
            .toDF("day", "k", "v")
          t.appendIsolated(df)
        } catch { case e: Throwable => errs.add(e) }
      })
      th.start(); th
    }
    start.countDown()
    threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"concurrent appends failed: ${errs.peek()}")
    // nothing lost: every row of every append is readable
    assert(t.read().count() == 1 + nThreads * nRounds * 2)
    assert(t.read().filter(col("day").isNull).count() == nThreads * nRounds)
    // no nesting and no orphans: the manifest's NULL-partition names
    // are exactly the data files on disk, all directly in the dir
    val defDir = new java.io.File(t.path, s"p_date=${TargetTable.HiveDefaultPartition}")
    assert(defDir.listFiles().forall(_.isFile),
      "a nested directory inside the NULL-ts partition means a dir-rename raced mkdirs")
    val onDisk = defDir.listFiles().map(_.getName)
      .filter(_.endsWith(".parquet")).toSet
    val inManifest = t.latestManifest().get
      .filter(_.startsWith(s"p_date=${TargetTable.HiveDefaultPartition}/"))
      .map(_.split("/", 2).last).toSet
    assert(inManifest == onDisk,
      s"manifest and disk must agree on the shared partition: " +
        s"manifest-only=${inManifest -- onDisk}, disk-only=${onDisk -- inManifest}")
    assert(inManifest.size == nThreads * nRounds,
      "every concurrent append's NULL-ts file must be committed")
    // and both crash-repair sweeps find nothing to undo
    assert(t.repairOrphanedAppends() == 0)
  }

  test("full refresh is snapshot-isolated: a pinned reader keeps the complete old table") {
    val t = build("snap_refresh")
    val oldRows = t.read().collect().map(_.toString).sorted
    val pinned = t.read() // planned against the pre-refresh manifest
    // full refresh with DIFFERENT rows, fewer partitions, and a new
    // column — file set and schema must switch in one atomic commit
    t.init(Seq((day("2024-02-01"), "z", 9, "extra"))
      .toDF("day", "k", "v", "note"))
    // a fresh reader sees the complete NEW table with the NEW schema
    val after = t.read()
    assert(after.schema.fieldNames.contains("note"))
    assert(after.collect().map(r => (r.getAs[String]("k"), r.getAs[String]("note")))
      .toSeq == Seq(("z", "extra")))
    // no stale partition survives the switch (the refresh dropped
    // 2024-01-01/02 in the same commit that published 2024-02-01)
    assert(!after.inputFiles.exists(_.contains("p_date=2024-01-01")))
    // the PINNED reader still returns the complete old table: its old
    // schema, its old rows, off trash-parked-but-present files
    assert(pinned.collect().map(_.toString).sorted.sameElements(oldRows),
      "a reader planned before the refresh must see the complete old table")
    assert(!pinned.schema.fieldNames.contains("note"))
    // the old files are parked, not deleted, until vacuum
    assert(t.vacuum(0L) > 0, "the refreshed-away originals must be parked")
    // and the resume frontier follows the new manifest
    assert(t.maxPartitionDate.contains(java.time.LocalDate.of(2024, 2, 1)))
  }

  test("widening rewrite is snapshot-isolated: pinned readers keep old schema and rows") {
    val t = new TargetTable(spark, tmpDir("snap_widen"), "day")
    t.init(Seq((day("2024-01-01"), "a", 1), (day("2024-01-02"), "b", 2))
      .toDF("day", "k", "v")) // v: int
    val pinned = t.read()
    val oldRows = pinned.collect().map(_.toString).sorted
    // int -> string is reader-incompatible: needs the full-table rewrite
    val incoming = Seq((day("2024-01-03"), "c", "three")).toDF("day", "k", "v")
    t.evolveSchema(incoming.schema, OnSchemaChange.SyncAllColumns,
      rewriteWidening = true)
    t.append(incoming)
    // new readers: every v is a string, including the rewritten history
    val after = t.read()
    assert(after.schema("v").dataType == org.apache.spark.sql.types.StringType)
    assert(after.count() == 3)
    // pinned reader: old schema (v int), old rows, parked files
    assert(pinned.schema("v").dataType == org.apache.spark.sql.types.IntegerType)
    assert(pinned.collect().map(_.toString).sorted.sameElements(oldRows),
      "a reader planned before the widening rewrite must see the old table")
  }
}
