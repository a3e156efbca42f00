package graft.ibtp

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Opportunistic pre-manifest upgrade: the FIRST write-locked open of a
  * table that predates the manifest era commits one (repair-first
  * relist under the already-held lease), so legacy tables stop planning
  * by directory listing — and stop being exposed to the documented
  * dir-listing blackout windows — without anyone running
  * `--upgrade-manifest`.
  */
class PreManifestUpgradeSpec extends SparkSpecBase {

  private def events = graft.sources.Tables.events(spark, sfDir)
    .select(col("ts"), col("event_id"), col("user_id"),
      col("event_type"), col("value"))

  /** A legacy table: real partition dirs + schema sidecar, NO manifest
    * (simulated by building normally and deleting the manifest log —
    * exactly the on-disk shape an older library version left).
    */
  private def legacyTable(dir: String): TargetTable = {
    val t = new TargetTable(spark, dir, "ts", countRows = false)
    t.init(events)
    val mdir = new java.io.File(dir, TargetTable.ManifestDirName)
    mdir.listFiles().foreach(_.delete())
    mdir.delete()
    assert(t.latestManifest().isEmpty, "setup: table must be pre-manifest")
    t
  }

  test("the first write-locked open commits a manifest; reads are unchanged") {
    val dir = tmpDir("upg_first") + "/tbl"
    val t = legacyTable(dir)
    val before = t.read().collect().map(_.toString).sorted.toSeq
    // any lease-taking entry point upgrades — a bare locked section will do
    t.withWriterLease() { () }
    assert(t.latestManifest().nonEmpty,
      "first lease-guarded open must commit a manifest")
    assert(t.read().collect().map(_.toString).sorted.toSeq == before)
    // files an external writer dropped in BEFORE the upgrade were
    // absorbed (the relist is the documented mixed-version remedy)
    val t2 = new TargetTable(spark, dir, "ts", countRows = false)
    assert(t2.read().collect().map(_.toString).sorted.toSeq == before)
  }

  test("concurrent first-opens: one upgrades under the lease, the loser fails fast") {
    val dir = tmpDir("upg_race") + "/tbl"
    legacyTable(dir)
    val go = new java.util.concurrent.CountDownLatch(1)
    val inLease = new java.util.concurrent.CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val lockedOut = new java.util.concurrent.atomic.AtomicInteger(0)
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 2).map { i =>
      val t = new TargetTable(spark, dir, "ts", countRows = false)
      val th = new Thread(() => {
        go.await()
        try t.withWriterLease() {
          inLease.countDown()
          // hold the lease long enough that the sibling's open overlaps
          Thread.sleep(300)
          wins.incrementAndGet(); ()
        } catch {
          // ALL the clean retryable aborts of a no-CAS claim: rejected
          // up front, or — when both creates raced the exists probe —
          // clobbered and caught by the commit layer's post-rename
          // ownership check (the honest at-most-one-winner contract;
          // see WriterLeaseSpec's tight-loop race)
          case e: IllegalStateException
              if e.getMessage.contains("locked by writer") ||
                e.getMessage.contains("fenced") ||
                e.getMessage.contains("takeover race") =>
            lockedOut.incrementAndGet()
          case e: Throwable => bad.add(e.toString.take(300))
        }
      })
      th.start(); th
    }
    go.countDown()
    threads.foreach(_.join(30000))
    assert(bad.isEmpty, s"non-clean failure: ${bad.peek()}")
    assert(wins.get() >= 1, "at least one open must win and upgrade")
    assert(wins.get() + lockedOut.get() == 2)
    // whoever won, the table is upgraded and consistent
    val t3 = new TargetTable(spark, dir, "ts", countRows = false)
    assert(t3.latestManifest().nonEmpty)
    assert(t3.read().count() == events.count())
    // and the loser's RETRY is a plain no-op open (no second relist
    // damage): contents stable, manifest version count grows by at most
    // a no-op
    t3.withWriterLease() { () }
    assert(t3.read().count() == events.count())
  }
}
