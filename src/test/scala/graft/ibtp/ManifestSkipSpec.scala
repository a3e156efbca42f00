package graft.ibtp

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Manifest data-skipping: per-file min/max stats recorded at write
  * time (footer reads of just-staged files) and consumed at PLAN time —
  * [[TargetTable.readWhere]] prunes the planned file list from the
  * manifest alone, zero footer opens for skipped files. This is what
  * makes `compact(clusterBy)`'s clustering pay at 1M live files: without
  * it a cluster-key point query still opens every live footer just to
  * discard its row groups.
  */
class ManifestSkipSpec extends SparkSpecBase {

  private def events = graft.sources.Tables.events(spark, sfDir)
    .select(col("ts"), col("event_id"), col("user_id"),
      col("event_type"), col("value"))

  /** Build a clustered table: fragmented ingest, clustered compaction
    * (declares user_id as the stats column), then four appends with
    * DISJOINT user_id ranges — each appended file carries a narrow
    * recorded range, the layout pruning pays on.
    */
  private def buildClustered(dir: String): TargetTable = {
    val t = new TargetTable(spark, dir, "ts", countRows = false)
    val even = coalesce(col("user_id") % 2, lit(0)) === 0
    t.init(events.filter(even && col("user_id") <= 7))
    t.append(events.filter(!even && col("user_id") <= 7))
    val stats = t.compact(clusterBy = Seq("user_id"))
    assert(stats.nonEmpty, "fragmented partitions must compact")
    // disjoint-range appends AFTER the declaration: their files get
    // per-file stats on the append path (user_id in [0,14] at sf0.001)
    t.append(events.filter(col("user_id").between(8, 9)))
    t.append(events.filter(col("user_id").between(10, 11)))
    t.append(events.filter(col("user_id").between(12, 14)))
    t
  }

  test("clustered compaction declares the stats column and records per-file stats") {
    val t = buildClustered(tmpDir("skip_declare") + "/tbl")
    assert(t.latestStatsCol().contains("user_id"),
      "compact(clusterBy) must declare its key as the table's stats column")
    val entries = t.latestManifestEntries()
    val statted = entries.filter(_._2.isDefined)
    assert(statted.nonEmpty, "compacted and appended files must carry stats")
    statted.foreach { case (p, Some(s)) =>
      assert(s.col == "user_id" && s.typ == "long", s"$p: $s")
      assert(s.min.toLong <= s.max.toLong && s.rows > 0, s"$p: $s")
    }
    // the appended slices really recorded their narrow ranges
    assert(statted.exists(e => e._2.get.min.toLong >= 12),
      "the [12,14] append's files must record min >= 12")
  }

  test("a cluster-key point query plans only the files whose range contains it") {
    val t = buildClustered(tmpDir("skip_point") + "/tbl")
    val entries = t.latestManifestEntries()
    val (kept, total) = t.planFilesForRange("user_id", 13L, 13L)
    assert(total == entries.size)
    assert(kept.size < total,
      s"point query must prune: kept ${kept.size} of $total")
    // exactness of the pruning decision: kept ⟺ stat-less OR range-hit
    val expected = entries.collect {
      case (p, None) => p
      case (p, Some(s)) if s.min.toLong <= 13L && s.max.toLong >= 13L => p
    }
    assert(kept.sorted == expected.sorted)
    // and the SCAN plans a subset of the kept files — nothing more
    val keptSet = kept.toSet
    val planned = t.readWhere("user_id", 13L, 13L).inputFiles.toSeq
    assert(planned.nonEmpty)
    planned.foreach { uri =>
      val rel = uri.split("/").takeRight(2).mkString("/")
      assert(keptSet.contains(rel), s"scan planned un-kept file $uri")
    }
  }

  test("readWhere's residual predicate reaches the parquet scan (PushedFilters)") {
    // the manifest prunes FILES; inside the kept files the same
    // predicate must still prune ROW GROUPS via parquet min/max —
    // i.e. reach the scan as a pushed filter, not a post-scan Filter
    val t = buildClustered(tmpDir("skip_pushdown") + "/tbl")
    val p = t.readWhere("user_id", 8L, 11L).queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(user_id,8)") &&
      p.contains("LessThanOrEqual(user_id,11)"), p)
  }

  test("readWhere answers exactly like the unpruned filtered read") {
    val t = buildClustered(tmpDir("skip_exact") + "/tbl")
    // point, range, range spanning slices, empty range
    for ((lo, hi) <- Seq((13L, 13L), (8L, 11L), (5L, 12L), (100L, 200L))) {
      assertSameRows(
        t.readWhere("user_id", lo, hi),
        t.read().filter(col("user_id") >= lo && col("user_id") <= hi))
    }
    // the residual filter keeps the answer exact even where stats are
    // coarse (the compacted files span wide ranges)
    assert(t.readWhere("user_id", 0L, 14L).count() == t.read().count())
  }

  test("pruning is conservative: wrong column, wrong-typed bound, no stats") {
    val t = buildClustered(tmpDir("skip_conservative") + "/tbl")
    val total = t.latestManifestEntries().size
    // different column: no entry may be pruned
    assert(t.planFilesForRange("value", 0.5, 0.6)._1.size == total)
    // incomparable bound against long stats: keep everything
    assert(t.planFilesForRange("user_id", "a", "z")._1.size == total)
    // and a stats-less table (no declaration) never prunes
    val t2 = new TargetTable(spark, tmpDir("skip_none") + "/tbl", "ts",
      countRows = false)
    t2.init(events)
    val n2 = t2.latestManifestEntries().size
    assert(t2.latestStatsCol().isEmpty)
    assert(t2.planFilesForRange("user_id", 3L, 3L)._1.size == n2)
    assertSameRows(
      t2.readWhere("user_id", 3L, 3L),
      t2.read().filter(col("user_id") === 3L))
  }

  test("fastRowCount serves COUNT(*) from stats only when every file has them") {
    // no stats declared: scans would be needed -> None
    val t0 = new TargetTable(spark, tmpDir("skip_count0") + "/tbl", "ts",
      countRows = false)
    t0.init(events.filter(col("user_id") <= 7))
    assert(t0.fastRowCount().isEmpty,
      "stat-less files must forfeit the metadata count")
    // the clustered layout stats EVERY live file (compaction rewrites
    // every fragmented partition; the later appends stat their own
    // files) -> the exact count comes from metadata alone
    val t = buildClustered(tmpDir("skip_count") + "/tbl")
    assert(t.fastRowCount().contains(t.read().count()),
      "all-statted table must serve the exact count from metadata")
    // appends keep it exact (their files carry stats too)
    t.append(events.filter(col("user_id") === 9L))
    assert(t.fastRowCount().contains(t.read().count()))
    // a relist (stats lost) degrades honestly back to None
    t.relistManifest()
    assert(t.fastRowCount().isEmpty,
      "a relisted (stat-less) manifest must not fake a count")
  }

  test("a lost background fold is harmless: long delta chains replay; a later commit re-folds") {
    // the async fold (round 12) is an OPTIMIZATION — bounding replay
    // cost — never a correctness dependency: simulate every fold being
    // lost (crash/kill of the background thread) by pinning foldPending,
    // grow the chain far past ManifestCheckpointEvery, and the table
    // must answer exactly; un-pinning lets the next commit fold.
    val dir = tmpDir("skip_nofold") + "/tbl"
    val t = new TargetTable(spark, dir, "ts", countRows = false)
    t.init(events.filter(col("user_id") <= 3))
    t.foldPending = true // every scheduleFold() is now a lost fold
    (1 to TargetTable.ManifestCheckpointEvery * 2).foreach { i =>
      t.append(events.filter(col("user_id") === (4 + i % 8).toLong).limit(2))
    }
    val mdir = new java.io.File(dir, TargetTable.ManifestDirName)
    def deltas() = mdir.listFiles().count(_.getName.endsWith(".delta"))
    assert(deltas() > TargetTable.ManifestCheckpointEvery,
      "setup: the chain must have outgrown the fold cadence")
    val want = t.read().count()
    assert(new TargetTable(spark, dir, "ts").read().count() == want,
      "a fresh reader must replay the long chain exactly")
    // un-pin: the next commit schedules a real fold. Old delta FILES
    // linger until pruning ages their states out, so the signal is a
    // NEW checkpoint landing (replay tail resets), not file deletion.
    def checkpoints() = mdir.listFiles().count(_.getName.endsWith(".list"))
    val ckptsBefore = checkpoints()
    t.foldPending = false
    t.append(events.filter(col("user_id") === 3L).limit(2))
    val deadline = System.currentTimeMillis() + 30000
    while (checkpoints() <= ckptsBefore &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(checkpoints() > ckptsBefore,
      "the re-scheduled fold must land a fresh checkpoint")
    assert(t.read().count() == want + 2)
  }

  test("stats survive checkpoint folds and snapshot replaces of other partitions") {
    val t = buildClustered(tmpDir("skip_survive") + "/tbl")
    def stattedCount() = t.latestManifestEntries().count(_._2.isDefined)
    val before = stattedCount()
    assert(before > 0)
    // enough no-op-ish commits to force a delta->checkpoint fold
    (1 to TargetTable.ManifestCheckpointEvery + 1).foreach { i =>
      t.append(events.filter(col("user_id") === (i % 15).toLong).limit(3))
    }
    assert(stattedCount() >= before,
      "stats must survive the delta->checkpoint fold (full body lines replayed)")
    // a snapshot replace of a narrow window keeps untouched files' stats
    val dates = t.partitionDates.toSeq.sorted
    val (from, to) = (dates.head, dates.head.plusDays(2))
    t.replaceRange(events.filter(
      col("ts") >= java.sql.Date.valueOf(from.toString) &&
        col("ts") < java.sql.Date.valueOf(to.toString)), from, to)
    assert(stattedCount() > 0,
      "untouched partitions must keep their stats through a replace")
    // the replaced window's fresh files got stats too (statscol declared)
    val replacedDirs = (0 until 2).map(i => s"p_date=${from.plusDays(i)}")
    val replacedEntries = t.latestManifestEntries()
      .filter(e => replacedDirs.contains(e._1.takeWhile(_ != '/')))
    assert(replacedEntries.nonEmpty && replacedEntries.forall(_._2.isDefined),
      "replace-staged files must carry stats when a stats column is declared")
    // and the table still answers exactly
    assertSameRows(
      t.readWhere("user_id", 13L, 13L),
      t.read().filter(col("user_id") === 13L))
  }
}
