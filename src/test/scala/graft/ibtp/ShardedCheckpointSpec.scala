package graft.ibtp

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Sharded checkpoints ([[TargetTable.CheckpointShardLines]]): an
  * oversized checkpoint body splits into `.shard` siblings indexed from
  * the main `.list` file, each index line carrying per-column AGGREGATE
  * stat blobs in the file-line grammar — so a COLD range plan prunes
  * whole shards with the same compiled pruner before reading them.
  * The load-bearing contracts: results are IDENTICAL to the unsharded
  * replay at every call site (replay, plans, reads, concurrent-commit
  * conflict checks), and shard skipping actually avoids reading
  * non-matching shards.
  */
class ShardedCheckpointSpec extends SparkSpecBase {

  private def events = graft.sources.Tables.events(spark, sfDir)
    .select(col("ts"), col("event_id"), col("user_id"),
      col("event_type"), col("value"))

  /** Build a clustered table whose fold lands a SHARDED checkpoint:
    * shrink the shard threshold, build disjoint-range appends, force
    * the fold.
    */
  private def withShardLimit[T](limit: Int)(body: => T): T = {
    val prev = TargetTable.CheckpointShardLines
    TargetTable.CheckpointShardLines = limit
    try body finally TargetTable.CheckpointShardLines = prev
  }

  private def buildSharded(dir: String): TargetTable = {
    val t = new TargetTable(spark, dir, "ts", countRows = false)
    val even = coalesce(col("user_id") % 2, lit(0)) === 0
    t.init(events.filter(even && col("user_id") <= 7))
    t.append(events.filter(!even && col("user_id") <= 7))
    assert(t.compact(clusterBy = Seq("user_id")).nonEmpty)
    t.append(events.filter(col("user_id").between(8, 9)))
    t.append(events.filter(col("user_id").between(10, 11)))
    // pin the fold point EXPLICITLY before the top slice lands: the
    // checkpoint's shard aggregates then top out at user_id <= 11 and
    // the [12, 14] files ride the delta tail — which is what gives the
    // skip test a shard that provably cannot serve a [12, 14] probe.
    // (The fixture previously relied on an AUTO-fold landing here as a
    // side effect of the per-partition compaction's ~30 delta commits;
    // batched compaction commits far fewer deltas, so the cadence-
    // dependent layout is made explicit instead.)
    t.foldToCheckpoint(force = true)
    t.append(events.filter(col("user_id").between(12, 14)))
    t
  }

  private def shardFiles(dir: String): Seq[java.io.File] = {
    val md = new java.io.File(dir, TargetTable.ManifestDirName)
    md.listFiles.toSeq.filter(_.getName.contains(".shard"))
  }

  test("an oversized checkpoint folds into shards and replays identically") {
    withShardLimit(4) {
      val dir = tmpDir("shard_replay") + "/tbl"
      val t = buildSharded(dir)
      assert(shardFiles(dir).size >= 2, "the fold must have sharded")
      // the full replay (read(), schema, counts) must be unchanged
      assertSameRows(t.read(), events.filter(col("user_id").between(0, 14)
        .or(col("user_id").isNull)))
      // a FRESH instance (cold caches) replays the same state
      val cold = new TargetTable(spark, dir, "ts", countRows = false)
      assertSameRows(cold.read(), t.read())
      assert(cold.fastRowCount().isDefined == t.fastRowCount().isDefined)
    }
  }

  test("cold range plans read only matching shards, results identical") {
    withShardLimit(4) {
      val dir = tmpDir("shard_plan") + "/tbl"
      val t = buildSharded(dir)
      val expect = t.planFilesForRange("user_id", 12L, 14L)
      // fresh instance = cold cache: must produce the identical plan
      val cold = new TargetTable(spark, dir, "ts", countRows = false)
      val got = cold.planFilesForRange("user_id", 12L, 14L)
      assert(got._1.sorted == expect._1.sorted && got._2 == expect._2,
        s"cold sharded plan must equal warm plan: $got vs $expect")
      assert(got._1.size < got._2, "the plan must actually prune")
      // and the pruned read returns exactly the unpruned filter
      assertSameRows(
        cold.readWhere("user_id", 12L, 14L),
        t.read().filter(col("user_id").between(12L, 14L)))
      // conjunctive + membership paths give identical results too
      val all = cold.planFilesForAll(Seq(("user_id", 0L, 7L)))
      assert(all._1.sorted == t.planFilesForAll(Seq(("user_id", 0L, 7L)))._1.sorted)
      assertSameRows(
        cold.readWhereAll(Seq(("user_id", 0L, 7L))),
        t.read().filter(col("user_id").between(0L, 7L)))
    }
  }

  test("shard aggregates skip non-matching shards on the cold path") {
    withShardLimit(4) {
      val dir = tmpDir("shard_skip") + "/tbl"
      val t = buildSharded(dir)
      // the shard index lines must carry aggregate blobs for the
      // clustered column (body lines are sorted by path; appended
      // disjoint ranges land in distinct shards at limit 4)
      val md = new java.io.File(dir, TargetTable.ManifestDirName)
      val mains = md.listFiles.filter(f => f.getName.endsWith(".list"))
        .sortBy(_.getName)
      val idxLines = scala.io.Source.fromFile(mains.last)
        .getLines().filter(_.startsWith("#shard=")).toList
      assert(idxLines.size >= 2)
      assert(idxLines.exists(_.contains("col=")),
        s"index lines must carry aggregates: $idxLines")
      val expect = t.planFilesForRange("user_id", 12L, 14L)
      assert(expect._1.nonEmpty)
      // HARD proof of skipping: delete a shard whose aggregate range
      // cannot contain [12,14] — the cold plan must still succeed with
      // identical results (it never opens that shard), while a full
      // read (which needs every shard) must now fail
      val deletable = idxLines.filter { l =>
        val m = "min=(\\d+),max=(\\d+)".r.findFirstMatchIn(l)
        m.exists(g => g.group(2).toLong < 12L || g.group(1).toLong > 14L)
      }
      assert(deletable.nonEmpty, s"need a non-matching shard: $idxLines")
      val victim = deletable.head
      val victimName = victim.stripPrefix("#shard=").takeWhile(_ != '\t')
      assert(new java.io.File(md, victimName).delete())
      val cold = new TargetTable(spark, dir, "ts", countRows = false)
      val got = cold.planFilesForRange("user_id", 12L, 14L)
      assert(got._1.sorted == expect._1.sorted && got._2 == expect._2,
        "the plan must not need the non-matching shard")
      intercept[Exception] {
        new TargetTable(spark, dir, "ts", countRows = false).read().count()
      } // the deleted shard WAS load-bearing for a full replay
    }
  }

  test("deltas after a sharded checkpoint replay correctly (adds, removes, restat)") {
    withShardLimit(4) {
      val dir = tmpDir("shard_delta") + "/tbl"
      val t = buildSharded(dir)
      // an append (delta add) and a backfill (delta remove+add) after
      // the sharded fold; plans and reads from a cold instance must
      // track both
      val extra = events.filter(col("user_id").isNull)
      t.append(events.filter(col("user_id").between(8, 9))) // duplicate slice
      val day = t.read().select(col("ts").cast("date")).agg(min(col("ts").cast("date")))
        .head.getDate(0).toLocalDate
      t.replaceRange(
        events.filter(col("ts").cast("date") === lit(java.sql.Date.valueOf(day))),
        day, day.plusDays(1))
      val cold = new TargetTable(spark, dir, "ts", countRows = false)
      assertSameRows(cold.read(), t.read())
      val expect = t.planFilesForRange("user_id", 8L, 9L)
      val got = cold.planFilesForRange("user_id", 8L, 9L)
      assert(got._1.sorted == expect._1.sorted && got._2 == expect._2)
      assertSameRows(
        cold.readWhere("user_id", 8L, 9L),
        t.read().filter(col("user_id").between(8L, 9L)))
      extra.count() // keep the fixture referenced
    }
  }

  test("restat then remove in the delta tail never resurrects a dead shard line") {
    withShardLimit(4) {
      val dir = tmpDir("shard_restat") + "/tbl"
      val t = buildSharded(dir)
      // a restat delta re-lands live lines as (-p, +p) in ONE delta;
      // a later GENUINE remove of such a path must still suppress the
      // checkpoint shard's stale line on the cold plan path. The
      // removed files stay on disk (trash-parked for pinned readers),
      // so a resurrected line returns silent DUPLICATE rows, not an
      // error.
      t.declareSetColumns(Seq("event_type"))
      assert(t.restatManifest() > 0, "the restat must touch lines")
      val day = t.read().agg(min(col("ts").cast("date")))
        .head.getDate(0).toLocalDate
      t.replaceRange(
        events.filter(col("ts").cast("date") === lit(java.sql.Date.valueOf(day))),
        day, day.plusDays(1))
      val expect = t.planFilesForRange("user_id", 0L, 14L)
      val cold = new TargetTable(spark, dir, "ts", countRows = false)
      val got = cold.planFilesForRange("user_id", 0L, 14L)
      assert(got._1.sorted == expect._1.sorted,
        s"cold plan resurrected/lost files: ${got._1.diff(expect._1)} / " +
          s"${expect._1.diff(got._1)}")
      assert(got._2 == expect._2,
        s"cold total ${got._2} must equal warm total ${expect._2}")
      assertSameRows(
        cold.readWhere("user_id", 0L, 14L),
        t.read().filter(col("user_id").between(0L, 14L)))
    }
  }

  test("pruning reaps a dead checkpoint's shards, never a live one's") {
    withShardLimit(4) {
      val dir = tmpDir("shard_prune") + "/tbl"
      val t = buildSharded(dir)
      val firstShards = shardFiles(dir).map(_.getName).toSet
      assert(firstShards.nonEmpty)
      // push enough commits + folds past ManifestKeep to retire the
      // first sharded checkpoint entirely
      (0 until (TargetTable.ManifestKeep + TargetTable.ManifestCheckpointEvery + 2))
        .foreach { i =>
          t.append(events.filter(col("user_id") === (i % 15).toLong).limit(1))
          t.foldToCheckpoint()
        }
      // age the dead shards past the claim staleness so the sweep may
      // reap them (fresh ones are protected as possible in-flight work)
      val md = new java.io.File(dir, TargetTable.ManifestDirName)
      md.listFiles.filter(f => firstShards.contains(f.getName)).foreach(f =>
        f.setLastModified(System.currentTimeMillis() - TargetTable.CommitClaimStaleMs - 60000))
      // the sweep is amortized to the fold cadence: commit past at
      // least one cadence boundary
      (0 to TargetTable.ManifestCheckpointEvery)
        .foreach(_ => t.append(events.filter(col("user_id") === 1L).limit(1)))
      val remaining = shardFiles(dir).map(_.getName).toSet
      assert(remaining.intersect(firstShards).isEmpty,
        s"dead checkpoint's shards must be reaped: ${remaining.intersect(firstShards)}")
      // the live state is intact
      val cold = new TargetTable(spark, dir, "ts", countRows = false)
      assertSameRows(cold.read(), t.read())
    }
  }

  /** Newest checkpoint's body lines with shards resolved in index
    * order — what a replay reads, for asserting fold output directly.
    */
  private def newestCheckpointBody(dir: String): Seq[String] = {
    val md = new java.io.File(dir, TargetTable.ManifestDirName)
    val main = md.listFiles.filter(_.getName.endsWith(".list"))
      .maxBy(_.getName)
    val lines = scala.io.Source.fromFile(main).getLines().toList
    val shards = lines.filter(_.startsWith("#shard="))
      .map(_.stripPrefix("#shard=").takeWhile(_ != '\t'))
    if (shards.isEmpty) lines.filterNot(_.startsWith("#"))
    else shards.flatMap(n =>
      scala.io.Source.fromFile(new java.io.File(md, n)).getLines().toList)
  }

  test("the streamed fold writes exactly the sorted deduped replay state") {
    withShardLimit(4) {
      val dir = tmpDir("shard_streamfold") + "/tbl"
      val t = buildSharded(dir)
      // a delta tail with all three op kinds: restat (-p,+p), genuine
      // removes (backfill), and adds whose paths interleave the
      // checkpoint's sort order — the merge must weave them in place
      t.declareSetColumns(Seq("event_type"))
      assert(t.restatManifest() > 0)
      val day = t.read().agg(min(col("ts").cast("date")))
        .head.getDate(0).toLocalDate
      t.replaceRange(
        events.filter(col("ts").cast("date") === lit(java.sql.Date.valueOf(day))),
        day, day.plusDays(1))
      t.append(events.filter(col("user_id") === 5L))
      // what the replay says the live state is, BEFORE the fold
      val expect = t.latestManifestEntries().map(_._1).sorted
      t.foldToCheckpoint(force = true)
      val body = newestCheckpointBody(dir)
      val paths = body.map(_.takeWhile(_ != '\t'))
      assert(paths == paths.sorted && paths.distinct == paths,
        "fold output must be sorted and path-unique")
      assert(paths == expect,
        s"fold lost/invented files: ${paths.diff(expect)} / ${expect.diff(paths)}")
      // stats blobs survive the merge: restatted lines carry their sets
      assert(body.exists(_.contains("set=")),
        "restatted value-set blobs must survive the streamed fold")
      val cold = new TargetTable(spark, dir, "ts", countRows = false)
      assertSameRows(cold.read(), t.read())
    }
  }

  test("an unsorted checkpoint trips the merge guard and falls back materialized") {
    val dir = tmpDir("shard_unsorted") + "/tbl"
    val t = new TargetTable(spark, dir, "ts", countRows = false)
    t.init(events.filter(col("user_id") <= 3))
    t.append(events.filter(col("user_id").between(4, 5)))
    t.foldToCheckpoint(force = true)
    // corrupt the invariant: rewrite the newest checkpoint with its
    // body lines REVERSED (a foreign writer's artifact)
    val md = new java.io.File(dir, TargetTable.ManifestDirName)
    val main = md.listFiles.filter(_.getName.endsWith(".list")).maxBy(_.getName)
    val lines = scala.io.Source.fromFile(main).getLines().toList
    val (hdr, body) = lines.partition(_.startsWith("#"))
    assert(body.size >= 2)
    java.nio.file.Files.write(main.toPath,
      (hdr ++ body.reverse).mkString("", "\n", "\n").getBytes("UTF-8"))
    // the in-place rewrite invalidates the local-FS checksum sidecar
    new java.io.File(md, "." + main.getName + ".crc").delete()
    val t2 = new TargetTable(spark, dir, "ts", countRows = false)
    t2.append(events.filter(col("user_id") === 6L))
    t2.foldToCheckpoint(force = true) // must fall back, not corrupt
    val folded = newestCheckpointBody(dir).map(_.takeWhile(_ != '\t'))
    assert(folded == folded.sorted && folded.distinct == folded,
      "the fallback fold must restore the sorted invariant")
    assertSameRows(new TargetTable(spark, dir, "ts", countRows = false).read(),
      events.filter(col("user_id") <= 6 || col("user_id").isNull))
  }

  test("concurrent appends validate against sharded checkpoints") {
    withShardLimit(4) {
      val dir = tmpDir("shard_cc") + "/tbl"
      val t = buildSharded(dir)
      val w = new TargetTable(spark, dir, "ts", countRows = false)
      val before = t.read().count()
      w.appendConcurrent(events.filter(col("user_id") === 3L))
      assert(new TargetTable(spark, dir, "ts", countRows = false).read().count() ==
        before + events.filter(col("user_id") === 3L).count())
    }
  }
}
