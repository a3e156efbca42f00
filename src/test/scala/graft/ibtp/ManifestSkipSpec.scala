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
    val statted = entries.filter(_._2.nonEmpty)
    assert(statted.nonEmpty, "compacted and appended files must carry stats")
    statted.foreach { case (p, ss) =>
      val s = ss.head
      assert(s.col == "user_id" && s.typ == "long", s"$p: $s")
      assert(s.min.toLong <= s.max.toLong && s.rows > 0, s"$p: $s")
    }
    // the appended slices really recorded their narrow ranges
    assert(statted.exists(e => e._2.head.min.toLong >= 12),
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
      case (p, ss) if !ss.exists(_.col == "user_id") => p
      case (p, ss) if ss.exists(s =>
        s.col == "user_id" && s.min.toLong <= 13L && s.max.toLong >= 13L) => p
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
    def stattedCount() = t.latestManifestEntries().count(_._2.nonEmpty)
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
    assert(replacedEntries.nonEmpty && replacedEntries.forall(_._2.nonEmpty),
      "replace-staged files must carry stats when a stats column is declared")
    // and the table still answers exactly
    assertSameRows(
      t.readWhere("user_id", 13L, 13L),
      t.read().filter(col("user_id") === 13L))
  }

  /** One day-partition, a 64×128 (user_id, event_id) grid ingested as
    * 32 fragmented commits — enough files that compaction rewrites to
    * ~a dozen output files whose layout the test can interrogate.
    */
  private def buildGrid(dir: String): TargetTable = {
    import spark.implicits._
    val rows = (0 until 8192).map { i =>
      (java.sql.Timestamp.valueOf("2024-03-01 12:00:00"),
        (i % 64).toLong, (i / 64).toLong, i.toDouble)
    }.toDF("ts", "user_id", "event_id", "value")
    val t = new TargetTable(spark, dir, "ts", countRows = false)
    t.init(rows.filter($"event_id" < 4).coalesce(1))
    (1 until 32).foreach { s =>
      t.append(rows.filter($"event_id" >= s * 4 && $"event_id" < (s + 1) * 4)
        .coalesce(1))
    }
    t
  }

  test("zorder compaction: both dimensions' stats recorded, both prune, contents exact") {
    val t = buildGrid(tmpDir("skip_z") + "/tbl")
    val want = t.read().count()
    val stats = t.compact(clusterBy = Seq("user_id", "event_id"),
      zorder = true, targetFileBytes = 16 * 1024)
    assert(stats.nonEmpty, "fragmented grid must compact")
    assert(t.latestStatsCols() == Seq("user_id", "event_id"),
      "zorder must declare ALL cluster columns as stats columns")
    val entries = t.latestManifestEntries()
    val statted = entries.filter(_._2.nonEmpty)
    assert(statted.nonEmpty &&
      statted.forall(_._2.map(_.col) == Seq("user_id", "event_id")),
      "every statted line must carry one blob per declared column, declared order")
    assert(entries.size >= 4, s"need multiple files to demo pruning, got ${entries.size}")
    // the curve layout prunes on EVERY dimension — not just a prefix
    val (ku, total) = t.planFilesForRange("user_id", 8L, 15L)
    val (ke, _)     = t.planFilesForRange("event_id", 16L, 31L)
    assert(ku.size < total, s"user_id band must prune: ${ku.size} of $total")
    assert(ke.size < total, s"event_id band must prune: ${ke.size} of $total")
    // conjunction prunes at least as hard as either side
    val (kb, _) = t.planFilesForAll(Seq(
      ("user_id", 8L, 15L), ("event_id", 16L, 31L)))
    assert(kb.size <= math.min(ku.size, ke.size))
    // exact contents: conjunction read ≡ plain filtered read; rewrite
    // content-invariant
    assert(t.read().count() == want)
    assertSameRows(
      t.readWhereAll(Seq(("user_id", 8L, 15L), ("event_id", 16L, 31L))),
      t.read().filter(col("user_id").between(8, 15) &&
        col("event_id").between(16, 31)))
  }

  test("zorder beats lexicographic clustering on the trailing dimension") {
    val tz = buildGrid(tmpDir("skip_zvs") + "/tblz")
    val tl = buildGrid(tmpDir("skip_zvs") + "/tbll")
    tz.compact(clusterBy = Seq("user_id", "event_id"), zorder = true,
      targetFileBytes = 16 * 1024)
    tl.compact(clusterBy = Seq("user_id", "event_id"),
      targetFileBytes = 16 * 1024)
    // lexicographic: user_id dominates the sort, so every file spans
    // ~the full event_id range and a trailing-dimension band keeps
    // (almost) everything; the curve keeps every dimension narrow
    val (zKept, zTotal) = tz.planFilesForRange("event_id", 16L, 31L)
    val (lKept, lTotal) = tl.planFilesForRange("event_id", 16L, 31L)
    assert(zTotal >= 4 && lTotal >= 4, s"need files: z=$zTotal lex=$lTotal")
    assert(zKept.size < lKept.size,
      s"curve layout must out-prune lexicographic on the trailing dim: " +
        s"z ${zKept.size}/$zTotal vs lex ${lKept.size}/$lTotal")
    // both stay exact
    assertSameRows(
      tz.readWhere("event_id", 16L, 31L),
      tl.readWhere("event_id", 16L, 31L))
  }

  test("multi-column stats serve fastRowCount and survive appends") {
    val t = buildGrid(tmpDir("skip_zcount") + "/tbl")
    t.compact(clusterBy = Seq("user_id", "event_id"), zorder = true,
      targetFileBytes = 16 * 1024)
    val want = t.read().count()
    assert(t.fastRowCount().contains(want))
    // appends after the 2-column declaration stat BOTH columns
    import spark.implicits._
    t.append(Seq((java.sql.Timestamp.valueOf("2024-03-02 12:00:00"),
      999L, 999L, 0.0)).toDF("ts", "user_id", "event_id", "value"))
    assert(t.fastRowCount().contains(want + 1))
    val appended = t.latestManifestEntries()
      .filter(_._1.startsWith("p_date=2024-03-02"))
    assert(appended.nonEmpty &&
      appended.forall(_._2.map(_.col) == Seq("user_id", "event_id")))
    // the narrow appended file is prunable on the SECOND column alone
    val (kept, total) = t.planFilesForRange("event_id", 999L, 999L)
    assert(kept.size < total)
  }

  // ---- value-set skipping (declareSetColumns / readWhereIn) ------------

  /** Pre-declaration bulk (no sets), declaration, then one append per
    * event type — each appended file's dictionary records a singleton
    * value set.
    */
  private def buildSetTable(dir: String): (TargetTable, Seq[String]) = {
    val types = events.select(col("event_type")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val t = new TargetTable(spark, dir, "ts", countRows = false)
    t.init(events.filter(col("event_type").isin(types.take(2): _*)))
    t.declareSetColumns(Seq("event_type"))
    types.drop(2).foreach { et =>
      t.append(events.filter(col("event_type") === et))
    }
    (t, types)
  }

  test("declared set columns record per-file dictionary value sets; IN lookups prune exactly") {
    val (t, types) = buildSetTable(tmpDir("set_basic") + "/tbl")
    assert(t.latestSetCols() == Seq("event_type"))
    val sets = t.latestManifestSets()
    val withSets = sets.filter(_._2.nonEmpty)
    assert(withSets.nonEmpty, "post-declaration appends must record sets")
    assert(sets.exists(_._2.isEmpty),
      "pre-declaration files must carry no sets (and stay planned)")
    withSets.foreach { case (p, ss) =>
      assert(ss.map(_.col) == Seq("event_type"), s"$p: $ss")
      assert(ss.head.typ == "string" && ss.head.vals.nonEmpty, s"$p: $ss")
      assert(ss.head.vals.toSet.subsetOf(types.toSet), s"$p: $ss")
    }
    // exactness of the pruning decision: kept ⟺ set-less OR set-hit
    val target = types.last
    val (kept, total) = t.planFilesForIn("event_type", Seq(target))
    assert(total == sets.size)
    assert(kept.size < total,
      s"point lookup must prune: kept ${kept.size} of $total")
    val expected = sets.collect {
      case (p, ss) if !ss.exists(_.col == "event_type") => p
      case (p, ss) if ss.exists(s =>
        s.col == "event_type" && s.vals.contains(target)) => p
    }
    assert(kept.sorted == expected.sorted)
    // contents exact, single value and multi-value IN
    assertSameRows(
      t.readWhereIn("event_type", Seq(target)),
      t.read().filter(col("event_type") === target))
    assertSameRows(
      t.readWhereIn("event_type", types.drop(2).take(2)),
      t.read().filter(col("event_type").isin(types.drop(2).take(2): _*)))
    // a value that exists nowhere prunes everything EXCEPT set-less files
    val (keptNone, _) = t.planFilesForIn("event_type", Seq("no_such_type"))
    assert(keptNone.sorted ==
      sets.collect { case (p, ss) if !ss.exists(_.col == "event_type") => p }.sorted)
    assert(t.readWhereIn("event_type", Seq("no_such_type")).count() == 0)
  }

  test("set pruning is conservative: undeclared column, high-cardinality column, wrong-typed values") {
    val (t, types) = buildSetTable(tmpDir("set_conservative") + "/tbl")
    val total = t.latestManifestSets().size
    // undeclared column: nothing recorded, nothing pruned
    assert(t.planFilesForIn("user_id", Seq(3L))._1.size == total)
    // wrong-typed values against string sets: keep everything
    assert(t.planFilesForIn("event_type", Seq(42L))._1.size == total)
    // mixed good/bad values: keep everything (the bad one is unprovable)
    assert(t.planFilesForIn("event_type", Seq(types.last, 42L))._1.size == total)
    // high-cardinality declared column: blobs over MaxSetValues are not
    // recorded, so nothing prunes — but the read stays exact
    import spark.implicits._
    def wide(lo: Int, hi: Int) = (lo until hi).map { i =>
      (java.sql.Timestamp.valueOf("2024-03-01 12:00:00"), i.toLong, i.toDouble)
    }.toDF("ts", "event_id", "value").coalesce(1)
    val t2 = new TargetTable(spark, tmpDir("set_highcard") + "/tbl", "ts",
      countRows = false)
    t2.init(wide(0, 500))
    t2.declareSetColumns(Seq("event_id"))
    t2.append(wide(500, 1000)) // 500 distinct values in one file >> cap
    val sets2 = t2.latestManifestSets()
    assert(sets2.forall(_._2.isEmpty),
      s"sets past MaxSetValues must not be recorded, got " +
        s"${sets2.filter(_._2.nonEmpty).take(2)}")
    assert(t2.planFilesForIn("event_id", Seq(750L))._1.size == sets2.size)
    assertSameRows(
      t2.readWhereIn("event_id", Seq(750L)),
      t2.read().filter(col("event_id") === 750L))
  }

  test("long-typed value sets prune and canonicalize like the range stats") {
    // user_id at sf0.001 has 15 distinct values — well under the cap,
    // so a LONG column's dictionary also records exact sets
    val t = new TargetTable(spark, tmpDir("set_long") + "/tbl", "ts",
      countRows = false)
    t.init(events.filter(col("user_id") <= 7))
    t.declareSetColumns(Seq("user_id"))
    t.append(events.filter(col("user_id").between(8L, 10L)))
    t.append(events.filter(col("user_id") > 10L))
    val sets = t.latestManifestSets().filter(_._2.nonEmpty)
    assert(sets.nonEmpty && sets.forall(_._2.head.typ == "long"))
    val (kept, total) = t.planFilesForIn("user_id", Seq(9L))
    assert(kept.size < total)
    // int query values canonicalize into the long space
    assert(t.planFilesForIn("user_id", Seq(9))._1.sorted == kept.sorted)
    assertSameRows(
      t.readWhereIn("user_id", Seq(9L)),
      t.read().filter(col("user_id") === 9L))
  }

  test("restatManifest backfills pre-declaration files' sets without a rewrite") {
    val (t, types) = buildSetTable(tmpDir("set_restat") + "/tbl")
    val before = t.latestManifestSets()
    assert(before.exists(_._2.isEmpty), "setup: pre-declaration files lack sets")
    val want = t.read().collect().toSeq
    val filesBefore = t.latestManifest().get.sorted
    // backfill: footer + dictionary reads only, one delta commit
    val n = t.restatManifest()
    assert(n > 0, "restat must enrich the set-less lines")
    assert(t.latestManifest().get.sorted == filesBefore,
      "restat must not add/remove/rename any file")
    val after = t.latestManifestSets()
    assert(after.forall(_._2.nonEmpty),
      s"every line must now carry sets: ${after.filter(_._2.isEmpty).take(3)}")
    // the formerly-unprunable bulk now prunes: a lookup of the LAST
    // type keeps only files whose set contains it
    val (kept, total) = t.planFilesForIn("event_type", Seq(types.last))
    assert(kept.size < total)
    assertSameRows(
      t.readWhereIn("event_type", Seq(types.last)),
      t.read().filter(col("event_type") === types.last))
    assert(t.read().collect().toSeq.sortBy(_.toString) == want.sortBy(_.toString),
      "contents untouched")
    // idempotent: nothing left to enrich (dictionary-qualifying files
    // all have blobs; a second pass is a no-op)
    assert(t.restatManifest() == 0)
  }

  test("restatManifest restores min/max stats and fastRowCount after a relist") {
    val t = buildClustered(tmpDir("skip_restat") + "/tbl")
    val want = t.read().count()
    assert(t.fastRowCount().contains(want))
    // a relist keeps the #statscol header but loses every stats blob
    t.relistManifest()
    assert(t.latestStatsCol().contains("user_id"))
    assert(t.fastRowCount().isEmpty)
    assert(t.restatManifest() > 0)
    assert(t.fastRowCount().contains(want),
      "restat must restore the metadata-served count")
    // and range pruning works again
    val (kept, total) = t.planFilesForRange("user_id", 13L, 13L)
    assert(kept.size < total)
    assertSameRows(
      t.readWhere("user_id", 13L, 13L),
      t.read().filter(col("user_id") === 13L))
  }

  test("value sets survive checkpoint folds and compaction rewrites re-record them") {
    val (t, types) = buildSetTable(tmpDir("set_survive") + "/tbl")
    def withSets() = t.latestManifestSets().count(_._2.nonEmpty)
    val before = withSets()
    assert(before > 0)
    // force a delta->checkpoint fold: sets must ride the full body lines
    (1 to TargetTable.ManifestCheckpointEvery + 1).foreach { i =>
      t.append(events.filter(col("event_type") === types.last).limit(2))
    }
    assert(withSets() >= before,
      "value sets must survive the delta->checkpoint fold")
    // a compaction rewrite merges files; the merged files' dictionaries
    // re-record the (now wider) exact sets
    val stats = t.compact(targetFileBytes = 1L << 30)
    assert(stats.nonEmpty, "fragmented partitions must compact")
    assert(withSets() > 0,
      "compaction-rewritten files must re-record sets from their own dictionaries")
    assertSameRows(
      t.readWhereIn("event_type", Seq(types.last)),
      t.read().filter(col("event_type") === types.last))
    // and fastRowCount is orthogonal: sets alone don't serve it
    assert(t.latestStatsCol().isEmpty)
  }

  test("decimal columns never record skip blobs and never mis-prune") {
    // decimal-annotated parquet ints store UNSCALED values (1.50 → 150);
    // recording them in the 'long' space would compare against a
    // truncated query decimal and silently drop matching files — so
    // BOTH recorders opt out and a fractional-decimal bound is
    // incomparable (keeps every file)
    val dec = events.select(col("ts"), col("event_id"), col("user_id"),
      (col("value").cast("decimal(10,2)")).as("price"))
    val t = new TargetTable(spark, tmpDir("skip_decimal") + "/tbl", "ts",
      countRows = false)
    t.init(dec.filter(col("user_id") <= 7))
    t.declareSetColumns(Seq("price"))
    t.compact(clusterBy = Seq("price"))
    t.append(dec.filter(col("user_id") > 7))
    // nothing recorded for the decimal column, in either blob kind
    assert(t.latestManifestEntries().forall(!_._2.exists(_.col == "price")),
      "decimal stats must not be recorded")
    assert(t.latestManifestSets().forall(!_._2.exists(_.col == "price")),
      "decimal value sets must not be recorded")
    val total = t.latestManifestEntries().size
    val q = new java.math.BigDecimal("1.50")
    // fractional decimal bounds are incomparable: keep everything
    assert(t.planFilesForRange("price", q, q)._1.size == total)
    assert(t.planFilesForIn("price", Seq(q))._1.size == total)
    // and the reads stay exact
    assertSameRows(
      t.readWhere("price", q, q),
      t.read().filter(col("price") === lit(q)))
    assertSameRows(
      t.readWhereIn("price", Seq(q)),
      t.read().filter(col("price").isin(q)))
    // a WHOLE-number decimal against genuine long stats is comparable —
    // user_id stats exist on the clustered table below
    val t2 = buildClustered(tmpDir("skip_decimal2") + "/tbl")
    val whole = new java.math.BigDecimal("13.00")
    assert(t2.planFilesForRange("user_id", whole, whole)._1.sorted ==
      t2.planFilesForRange("user_id", 13L, 13L)._1.sorted,
      "13.00 must canonicalize exactly like 13L")
    val frac = new java.math.BigDecimal("13.50")
    assert(t2.planFilesForRange("user_id", frac, frac)._1.size ==
      t2.latestManifestEntries().size,
      "a fractional decimal must not truncate into the long space")
  }

  test("-0.0 and 0.0 are one value to the set pruner") {
    import spark.implicits._
    // multi-row files with repeated values, so parquet actually writes
    // dictionary pages (a 1-row chunk legitimately lands PLAIN)
    val df = ((1L to 10L).map(i =>
      (i, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), -0.0)) ++
      (11L to 20L).map(i =>
        (i, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
          if (i % 2 == 0) 5.0 else 6.0)))
      .toDF("id", "ts", "v")
    val t = new TargetTable(spark, tmpDir("set_negzero") + "/tbl", "ts",
      countRows = false)
    t.init(df.filter(col("id") <= 0)) // schema-sample init, empty
    t.declareSetColumns(Seq("v"))
    t.append(df.filter(col("id") <= 10).coalesce(1))  // the -0.0 file
    t.append(df.filter(col("id") >= 11).coalesce(1))  // the {5,6} file
    val sets = t.latestManifestSets().filter(_._2.nonEmpty)
    assert(sets.nonEmpty, "doubles must record value sets")
    assert(sets.forall(!_._2.head.vals.contains("-0.0")),
      "recorded sets must normalize -0.0 to 0.0")
    // a 0.0 lookup must KEEP the -0.0 file: the manifest pruner may
    // never be MORE aggressive than the engine (Spark's own pushed
    // parquet Eq(0.0) uses Double.compare stats, an upstream quirk —
    // the contract here is pruner ≤ engine, pinned by assertSameRows)
    val (kept, total) = t.planFilesForIn("v", Seq(0.0))
    assert(kept.size < total, "the {5,6} file must prune")
    val negZeroFile = t.latestManifestSets()
      .find(_._2.exists(_.vals.contains("0.0"))).map(_._1)
    assert(negZeroFile.exists(kept.contains),
      s"the -0.0 file must stay planned for a 0.0 lookup: kept=$kept")
    assertSameRows(
      t.readWhereIn("v", Seq(0.0)),
      t.read().filter(col("v").isin(0.0)))
    // querying -0.0 keeps the same file and returns its rows
    assert(t.planFilesForIn("v", Seq(-0.0))._1.sorted == kept.sorted)
    assert(t.readWhereIn("v", Seq(-0.0)).count() == 10)
  }

  test("restat records a negative sentinel for unqualifying files and stops re-probing them") {
    // event_id is high-cardinality: every file's distinct set exceeds
    // MaxSetValues, so no file can ever yield a set blob — pre-fix,
    // every restat call re-opened every footer forever
    val t = new TargetTable(spark, tmpDir("set_sentinel") + "/tbl", "ts",
      countRows = false)
    t.init(events.filter(col("user_id") <= 7))
    t.append(events.filter(col("user_id") > 7))
    t.declareSetColumns(Seq("event_id"))
    val n1 = t.restatManifest()
    assert(n1 > 0, "the first restat must commit the probed-negative sentinels")
    val probed = t.latestManifestNoskip()
    assert(probed.forall(_._2.contains("event_id")),
      s"every line must carry the sentinel: ${probed.filterNot(_._2.contains("event_id")).take(3)}")
    // second pass: nothing missing, nothing re-probed, nothing committed
    assert(t.restatManifest() == 0)
    // the sentinel only widens coverage — pruning stays conservative
    val someId = events.select(col("event_id")).head.getLong(0)
    val total = t.latestManifestEntries().size
    assert(t.planFilesForIn("event_id", Seq(someId))._1.size == total)
    assertSameRows(
      t.readWhereIn("event_id", Seq(someId)),
      t.read().filter(col("event_id") === someId))
    // a LATER declaration re-probes exactly the new column and extends
    // the sentinel/blob coverage without disturbing the old one
    t.declareSetColumns(Seq("event_id", "event_type"))
    val n2 = t.restatManifest()
    assert(n2 > 0, "the new column must be probed")
    assert(t.latestManifestSets().forall(_._2.exists(_.col == "event_type")),
      "event_type qualifies and must gain real sets")
    assert(t.restatManifest() == 0)
  }
}
