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
}
