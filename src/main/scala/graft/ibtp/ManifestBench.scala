package graft.ibtp

/** Commit-cost probe for the delta-log manifest: plants a checkpoint
  * listing N synthetic live files, then times per-append manifest
  * commits ([[TargetTable.commitManifestAppended]] — the hot per-period
  * path) and a full replay ([[TargetTable.latestManifest]]) at each N.
  *
  * What "scales" means here: the MEDIAN commit is a delta write —
  * O(staged names) — and must stay flat as N grows 100×; every
  * [[TargetTable.ManifestCheckpointEvery]]-th commit folds the chain
  * into a fresh checkpoint (an O(N) write amortized across the run),
  * and the replay a reader pays is one checkpoint read + the delta
  * tail, so it grows linearly in N but never in commit COUNT. The
  * pre-delta design rewrote the full listing on EVERY commit — its
  * median tracked N.
  *
  * Prints one JSON line per N: median/mean/max commit ms, replay ms,
  * and the READ-PLANNING row — how long a cluster-key point query takes
  * to prune N statted entries driver-side, and how many files survive
  * (the data-skipping payoff: pruned planning is manifest-only; without
  * it the scan opens all N footers).
  */
object ManifestBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.GraftSession.create("graft-manifest-bench")
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1000, 10000, 100000)
    val commitsPerSize = 24 // crosses multiple checkpoint folds
    sizes.foreach { n =>
      val dir = java.nio.file.Files.createTempDirectory(s"mbench_$n").toString + "/tbl"
      val t = new TargetTable(spark, dir, "ts")
      val mdir = new java.io.File(dir, TargetTable.ManifestDirName)
      mdir.mkdirs()
      // synthetic clustered layout: each file records a DISJOINT 1k-wide
      // user_id range, the shape compact(clusterBy) maintains
      def b64(s: String) =
        java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
      // two-column stats: user_id disjoint 1k ranges (lexicographic
      // leading key) PLUS a z-curve-shaped event_id range (bit-reversed
      // index scaled to 1k-wide windows) — the multi-column layout
      // compact(clusterBy, zorder) maintains
      // streamed, line by line: a 10M-entry fixture as one mkString is
      // a ~2 GB transient String that GC-thrashes the driver
      // beyond 20M entries the fixture slims to ONE stats column: at
      // ~230 B/line the full-blob layout needs up to three ~23 GB
      // checkpoints alive at once (planted + two folds inside the
      // retention window) — past this sandbox's disk. The slim row
      // still measures what the decade exists for (fold wall, flat
      // commit median, shard-index cold point-plan); 2-D and
      // value-set pruning carry their evidence at ≤ 20M.
      val slim = n > 20000000
      val w = java.nio.file.Files.newBufferedWriter(
        new java.io.File(mdir, "v0000000001_0000000001.list").toPath)
      try {
        w.write(if (slim) "#statscol=user_id\n"
                else "#statscol=user_id,event_id\n#setcol=lang\n")
        // 9-digit padding: at exactly 100M entries an 8-digit pad
        // overflows ("part-100000000" sorts BEFORE "part-99999999"),
        // planting a genuinely unsorted checkpoint — the streamed
        // fold's order guard caught this in the wild and fell back
        (1 to n).foreach { i =>
          val erev = (java.lang.Integer.reverse(i) >>> 12).toLong & 0xfffffL
          w.write(f"p_date=2024-01-01/part-$i%09d.parquet" +
            s"\tcol=${b64("user_id")},t=long,min=${i * 1000L}," +
            s"max=${i * 1000L + 999L},rows=1000" +
            (if (slim) "\n"
             else s"\tcol=${b64("event_id")},t=long,min=${erev * 1000L}," +
               s"max=${erev * 1000L + 999L},rows=1000" +
               // categorical value sets: each file stores 2 of 20
               // languages — the dictionary-derived shape
               // declareSetColumns maintains
               s"\tset=${b64("lang")},t=string," +
               s"v=${b64("l" + i % 20)};${b64("l" + (i + 7) % 20)}\n"))
        }
      } finally w.close()
      // MBENCH_IDLE_MS emulates the inter-commit work a real run does
      // (a period's Spark job, seconds long): checkpoint folds are
      // asynchronous since round 12, so with ANY idle between commits
      // the fold overlaps it and the caller-thread commit cost stays at
      // the delta median even on the every-Nth commit. The default
      // tight loop (idle 0) remains the worst case — the next commit
      // blocks on the instance monitor while the fold runs, so the MEAN
      // still absorbs fold cost there.
      val idleMs = sys.env.get("MBENCH_IDLE_MS").flatMap(_.toLongOption).getOrElse(0L)
      val perCommitMs = (1 to commitsPerSize).map { i =>
        if (idleMs > 0) Thread.sleep(idleMs)
        val t0 = System.nanoTime()
        t.commitManifestAppended(Seq(f"p_date=2024-01-02/part-new-$i%04d.parquet"))
        (System.nanoTime() - t0) / 1e6
      }.toIndexedSeq
      val sorted = perCommitMs.sorted
      // settle the async fold so the chain ends in a (possibly
      // SHARDED) checkpoint — the state a long-lived table sits in
      t.foldToCheckpoint()
      // the fold row: one FORCED full checkpoint fold of the settled
      // chain, timed — the streamed write whose driver-memory ceiling
      // this bench guards (O(delta tail) heap at any N since the
      // sorted-merge fold; the materialized fold needed a 24 GB driver
      // at 10M and overflowed String at ~14M)
      val tf = System.nanoTime()
      t.foldToCheckpoint(force = true)
      val foldMs = (System.nanoTime() - tf) / 1e6
      val t1 = System.nanoTime()
      val live = t.latestManifest().get.size
      val replayMs = (System.nanoTime() - t1) / 1e6
      // COLD planning: a fresh process (new instance = empty caches)
      // running one clustered-key point query. Against a sharded
      // checkpoint this reads the shard index + matching shards only;
      // pre-shard it replayed the full O(live) checkpoint first.
      val coldT = new TargetTable(spark, dir, "ts")
      val t1c = System.nanoTime()
      val (coldKept, _) = coldT.planFilesForRange(
        "user_id", (n / 2) * 1000L + 500L, (n / 2) * 1000L + 500L)
      val coldPruneMs = (System.nanoTime() - t1c) / 1e6
      // read planning: a point query against the clustered key — prune
      // cost (one replay + driver-side stat compare) and the file count
      // the scan would open, vs the N it would open with no stats
      val point = (n / 2) * 1000L + 500L
      val t2 = System.nanoTime()
      val (kept, total) = t.planFilesForRange("user_id", point, point)
      val pruneMs = (System.nanoTime() - t2) / 1e6
      // conjunctive prune on BOTH stats columns (readWhereAll's path):
      // each per-line check is two blob seeks instead of one — the cost
      // of multi-dimensional skipping at plan time
      val epoint = ((java.lang.Integer.reverse(n / 2) >>> 12).toLong & 0xfffffL) * 1000L + 500L
      val t3 = System.nanoTime()
      val (kept2, _) = t.planFilesForAll(Seq(
        ("user_id", point, point), ("event_id", epoint, epoint)))
      val prune2Ms = (System.nanoTime() - t3) / 1e6
      // categorical membership prune (readWhereIn's path): one language
      // of 20 keeps ~n/10 files (2 langs recorded per file)
      val t4 = System.nanoTime()
      val (keptIn, _) = t.planFilesForIn("lang", Seq("l3"))
      val pruneInMs = (System.nanoTime() - t4) / 1e6
      // CONCURRENT commit throughput: K lease-less optimistic writers
      // (separate TargetTable instances = separate monitors, the
      // multi-process shape) each land M conflict-checked commits
      // ([[TargetTable.commitConcurrentAppend]] — the appendConcurrent
      // protocol: per-attempt validation + CAS rename). Contention cost
      // shows as concurrent-vs-serial wall ratio; with a lease they
      // could not run at all without hand-off.
      // MBENCH_CC=0 skips the concurrency sections: at the 10M-entry
      // decade each fold writes a ~1.5 GB checkpoint under its claim,
      // so the storm section measures fold I/O, not commit arbitration
      // (the 1M row carries the concurrency evidence)
      val ccOn = sys.env.get("MBENCH_CC").forall(_ != "0")
      val k = 4; val mPer = 6
      val failed = new java.util.concurrent.atomic.AtomicInteger(0)
      val (ccWallMs, ccLive, serialWallMs) = if (!ccOn) (0.0, live, 0.0) else {
        val writers = (0 until k).map(_ => new TargetTable(spark, dir, "ts"))
        val basisLive = t.latestManifest().get.toSet
        val basisTip = t.latestManifestTip()
        val go = new java.util.concurrent.CountDownLatch(1)
        val done = new java.util.concurrent.CountDownLatch(k)
        val threads = writers.zipWithIndex.map { case (w, wi) =>
          new Thread(() => {
            go.await()
            try (1 to mPer).foreach { j =>
              w.commitConcurrentAppend(
                Seq(f"p_date=2024-02-0${wi + 1}/part-cc-$j%04d.parquet"),
                Set(f"p_date=2024-02-0${wi + 1}"), basisLive, None, basisTip)
            } catch { case _: Throwable => failed.incrementAndGet() }
            finally done.countDown()
          }, s"mbench-cc-$wi")
        }
        threads.foreach(_.start())
        val tc0 = System.nanoTime()
        go.countDown()
        done.await()
        val w = (System.nanoTime() - tc0) / 1e6
        val l = t.latestManifest().get.size
        // serial baseline: the same k*mPer conflict-checked commits, one
        // writer thread
        val ts0 = System.nanoTime()
        (1 to k * mPer).foreach { j =>
          t.commitConcurrentAppend(
            Seq(f"p_date=2024-02-09/part-sc-$j%04d.parquet"),
            Set("p_date=2024-02-09"), basisLive, None, basisTip)
        }
        (w, l, (System.nanoTime() - ts0) / 1e6)
      }
      println(
        s"""{"live_files":$n,"commits":$commitsPerSize,""" +
          f""""commit_ms_median":${sorted(sorted.size / 2)}%.3f,""" +
          f""""commit_ms_mean":${perCommitMs.sum / perCommitMs.size}%.3f,""" +
          f""""commit_ms_max":${sorted.last}%.3f,""" +
          f""""fold_ms":$foldMs%.3f,""" +
          f""""replay_ms":$replayMs%.3f,"replayed_live":$live,""" +
          f""""prune_ms":$pruneMs%.3f,"planned_files":${kept.size},""" +
          f""""cold_prune_ms":$coldPruneMs%.3f,"cold_planned_files":${coldKept.size},""" +
          f""""prune2_ms":$prune2Ms%.3f,"planned_files_2d":${kept2.size},""" +
          f""""prune_in_ms":$pruneInMs%.3f,"planned_files_in":${keptIn.size},""" +
          s""""planned_total":$total,""" +
          s""""cc_writers":$k,"cc_commits":${k * mPer},""" +
          f""""cc_wall_ms":$ccWallMs%.3f,""" +
          // ccWallMs is 0.0 when MBENCH_CC=0 skipped the section — a
          // bare division would print Infinity, which is invalid JSON
          f""""cc_commits_per_sec":${
            if (ccWallMs > 0) k * mPer * 1000.0 / ccWallMs else 0.0}%.1f,""" +
          f""""cc_serial_wall_ms":$serialWallMs%.3f,""" +
          s""""cc_failed":${failed.get},"cc_live":$ccLive,""" +
          s""""cc_all_committed":${!ccOn || ccLive == live + k * mPer}}""")
    }
    spark.stop()
  }
}
