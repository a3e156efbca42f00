package graft.ibtp

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** EXHAUSTIVE crash-point sweep over the mutation state machines.
  *
  * The hand-picked `failReplaceAt`/`failAppendAt`/`failCompactAt` specs
  * pin the three classic windows; this suite enumerates EVERY
  * marker/move/commit/park/clear boundary (`TargetTable.crashHook`) —
  * including the data-dependent per-file ones — and property-checks,
  * for each operation and each crash point N:
  *
  *  (a) a reader planning right after the crash (no repair) sees a
  *      COMMITTED state — the pre-op contents, the post-op contents, or
  *      (for the two-commit upsert) the documented intermediate — never
  *      a torn one;
  *  (b) the crash repairs land a committed state;
  *  (c) a re-run converges to the uninterrupted result.
  *
  * A second-level sweep then crashes the REPAIR itself at every
  * boundary (for a representative primary crash per direction) and
  * demands the same convergence — repairs must be re-crashable.
  */
class CrashSweepSpec extends SparkSpecBase {

  private final class InjectedCrash(at: String)
    extends RuntimeException(s"injected crash at $at")

  private def events = graft.sources.Tables.events(spark, sfDir)
    .select(col("ts"), col("event_id"), col("user_id"),
      col("event_type"), col("value"))

  private def copyDir(src: String, dst: String): Unit = {
    val s = java.nio.file.Paths.get(src)
    val d = java.nio.file.Paths.get(dst)
    java.nio.file.Files.walk(s).forEach { p =>
      val t = d.resolve(s.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else {
        java.nio.file.Files.createDirectories(t.getParent)
        java.nio.file.Files.copy(p, t)
      }
    }
  }

  private def tableAt(dir: String) =
    new TargetTable(spark, dir, "ts", countRows = false)

  private def contents(dir: String): Seq[String] =
    tableAt(dir).read().collect().map(_.toString).sorted.toSeq

  /** The start-of-run repair battery, same order as the runner. */
  private def repairAll(dir: String): Unit = {
    val t = tableAt(dir)
    t.repairOrphanedCompact()
    t.repairOrphanedReplace()
    t.repairOrphanedAppends()
  }

  /** Run `op` with a crash injected at its `n`th crash point on a fresh
    * copy of `base`. Returns (dir, Some(pointName)) if a crash fired,
    * (dir, None) if the op completed with fewer than n points.
    */
  private def runCrashed(
      base: String, op: TargetTable => Unit, n: Int): (String, Option[String]) = {
    val dir = tmpDir("sweep_it") + "/tbl"
    copyDir(base, dir)
    val t = tableAt(dir)
    var count = 0
    @volatile var firedAt: Option[String] = None
    t.crashHook = nm => {
      count += 1
      if (count == n) { firedAt = Some(nm); throw new InjectedCrash(nm) }
    }
    try { op(t) }
    catch {
      case _: InjectedCrash =>
      case e: Throwable if firedAt.isDefined =>
        fail(s"crash at ${firedAt.get} surfaced as a foreign error: $e")
    }
    (dir, firedAt)
  }

  /** Sweep all crash points of `op` from the table state in `base`.
    * Returns (points swept, dirs of crashed states by point name) for
    * the nested repair sweep.
    */
  private def sweep(
      name: String, base: String, op: TargetTable => Unit,
      extraMid: Seq[Seq[String]] = Nil): (Int, Map[String, String]) = {
    val before = contents(base)
    val refDir = tmpDir(s"sweep_${name}_ref") + "/tbl"
    copyDir(base, refDir)
    op(tableAt(refDir))
    val want = contents(refDir)
    val acceptable = (Seq(before, want) ++ extraMid).distinct
    var n = 1
    var crashedDirs = Map.empty[String, String]
    while (n < 200) {
      val (dir, firedAt) = runCrashed(base, op, n)
      firedAt match {
        case None =>
          // op completed: every boundary swept; the uninterrupted run
          // must agree with the reference
          assert(contents(dir) == want, s"$name: clean run diverged")
          assert(n > 3, s"$name: suspiciously few crash points (${n - 1})")
          info(s"$name: swept ${n - 1} crash points")
          return (n - 1, crashedDirs)
        case Some(point) =>
          // snapshot the crashed state BEFORE repairing it — the nested
          // repair sweep needs the un-repaired dir
          if (!crashedDirs.contains(point)) {
            val snap = tmpDir("sweep_snap") + "/tbl"
            copyDir(dir, snap)
            crashedDirs += point -> snap
          }
          // (a) a reader BEFORE any repair sees a committed state
          val mid = contents(dir)
          assert(acceptable.exists(_ == mid),
            s"$name: crash at $point (#$n) exposed a torn state " +
              s"(${mid.size} rows; before=${before.size} want=${want.size})")
          // (b) repairs land a committed state
          repairAll(dir)
          val repaired = contents(dir)
          assert(acceptable.exists(_ == repaired),
            s"$name: repair after $point landed a torn state")
          // (c) a re-run converges to the uninterrupted result
          if (repaired != want) op(tableAt(dir))
          assert(contents(dir) == want,
            s"$name: re-run after crash at $point did not converge")
      }
      n += 1
    }
    fail(s"$name: more than 200 crash points — runaway hook")
  }

  /** Crash the REPAIR at every boundary starting from `crashedDir`
    * (a primary-crashed state), then repair uninterrupted and re-run.
    */
  private def sweepRepair(
      name: String, crashedDir: String, op: TargetTable => Unit,
      want: Seq[String], acceptable: Seq[Seq[String]]): Int = {
    var m = 1
    while (m < 100) {
      val dir = tmpDir(s"sweep_${name}_rep") + "/tbl"
      copyDir(crashedDir, dir)
      var count = 0
      @volatile var fired = false
      val t = tableAt(dir)
      t.crashHook = _ => { count += 1; if (count == m) { fired = true; throw new InjectedCrash(name) } }
      try {
        t.repairOrphanedCompact(); t.repairOrphanedReplace(); t.repairOrphanedAppends()
      } catch { case _: InjectedCrash => }
      if (!fired) { info(s"$name: swept ${m - 1} repair crash points"); return m - 1 }
      // a crashed repair must still leave a committed state...
      val mid = contents(dir)
      assert(acceptable.exists(_ == mid),
        s"$name: repair crash #$m exposed a torn state")
      // ...and be re-runnable to convergence
      repairAll(dir)
      if (contents(dir) != want) op(tableAt(dir))
      assert(contents(dir) == want,
        s"$name: repair re-crash #$m did not converge")
      m += 1
    }
    fail(s"$name: runaway repair hook")
  }

  // ---- the swept operations ---------------------------------------------

  private lazy val day1 = {
    val d = events.agg(min(col("ts"))).head.getTimestamp(0)
    d.toLocalDateTime.toLocalDate
  }

  private def buildBase(dir: String): Unit = {
    val t = tableAt(dir)
    t.init(events.filter(col("user_id") <= 7))
  }

  private def dayDf(d: java.time.LocalDate, days: Int = 1) =
    events.filter(col("user_id") > 7)
      .filter(col("ts") >= java.sql.Date.valueOf(d.toString) &&
        col("ts") < java.sql.Date.valueOf(d.plusDays(days).toString))

  test("append: every crash point is reader-safe and converges") {
    val base = tmpDir("sweep_append") + "/tbl"
    buildBase(base)
    val op = (t: TargetTable) => { t.append(dayDf(day1)); () }
    val (points, crashed) = sweep("append", base, op)
    assert(points >= 4, s"append must expose marker/move/commit/clear, got $points")
    // nested: repair-of-crashed-append is itself re-crashable at every
    // boundary, for both directions (pre-commit rollback, post-commit
    // marker clear)
    val refDir = tmpDir("sweep_append_ref2") + "/tbl"
    copyDir(base, refDir); op(tableAt(refDir))
    val want = contents(refDir); val before = contents(base)
    for (point <- Seq("append:move", "append:commit") if crashed.contains(point))
      assert(sweepRepair(s"append-repair@$point", crashed(point), op,
        want, Seq(before, want)) >= 1)
  }

  test("replaceRange: every crash point is reader-safe and converges") {
    val base = tmpDir("sweep_replace") + "/tbl"
    buildBase(base)
    val op = (t: TargetTable) => {
      t.replaceRange(dayDf(day1, 2), day1, day1.plusDays(2)); ()
    }
    val (points, crashed) = sweep("replace", base, op)
    assert(points >= 6, s"replace must expose marker/moves/commit/trash/clear, got $points")
    val refDir = tmpDir("sweep_replace_ref2") + "/tbl"
    copyDir(base, refDir); op(tableAt(refDir))
    val want = contents(refDir); val before = contents(base)
    for (point <- Seq("replace:move", "replace:commit") if crashed.contains(point))
      assert(sweepRepair(s"replace-repair@$point", crashed(point), op,
        want, Seq(before, want)) >= 1)
  }

  test("upsert: every crash point lands on one of the three committed states") {
    val base = tmpDir("sweep_upsert") + "/tbl"
    val t0 = tableAt(base)
    t0.init(events) // all rows, so upsert keys genuinely match
    val upDf = events
      .filter(col("ts") >= java.sql.Date.valueOf(day1.toString) &&
        col("ts") < java.sql.Date.valueOf(day1.plusDays(1).toString))
      .withColumn("value", col("value") * 2)
    val op = (t: TargetTable) => { t.upsert(upDf, Seq("event_id")); () }
    // the documented two-commit intermediate: matching keys deleted,
    // fresh rows not yet appended (the reference's DELETE+INSERT window,
    // closed there by warehouse transactions — here two atomic commits)
    val keyRows = upDf.select("event_id").collect().map(_.getLong(0)).toSet
    val intermediate = tableAt(base).read().collect()
      .filterNot(r => keyRows.contains(r.getLong(r.fieldIndex("event_id"))))
      .map(_.toString).sorted.toSeq
    val (points, _) = sweep("upsert", base, op, extraMid = Seq(intermediate))
    assert(points >= 9, s"upsert must expose replace+append boundaries, got $points")
  }

  test("compact: contents are invariant at every crash point; repairs converge") {
    val base = tmpDir("sweep_compact") + "/tbl"
    val t0 = tableAt(base)
    // fragment two partitions so the ranged compact rewrites exactly them
    t0.init(events.filter(col("user_id") <= 7))
    t0.append(dayDf(day1, 2))
    val op = (t: TargetTable) => {
      t.compact(from = Some(day1), to = Some(day1.plusDays(1))); ()
    }
    val (points, crashed) = sweep("compact", base, op)
    assert(points >= 4, s"compact must expose marker/moves/commit/trash/clear, got $points")
    val want = contents(base) // compaction is content-invariant
    for (point <- Seq("compact:move", "compact:commit") if crashed.contains(point))
      assert(sweepRepair(s"compact-repair@$point", crashed(point), op,
        want, Seq(want)) >= 1)
  }
}
