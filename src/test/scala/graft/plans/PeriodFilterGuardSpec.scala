package graft.plans

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.ibtp._

class PeriodFilterGuardSpec extends SparkSpecBase {

  private val b = PeriodBounds(LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 2))

  test("filtered model passes the guard") {
    val df = table("events")
      .filter(col("ts") >= b.fromCol && col("ts") < b.toCol)
      .groupBy(col("event_type")).count()
    PeriodFilterGuard.require(df)
  }

  test("unfiltered time-bearing scan is flagged") {
    val df = table("events").groupBy(col("event_type")).count()
    assert(PeriodFilterGuard.unguardedScans(df).nonEmpty)
    assertThrows[IllegalStateException](PeriodFilterGuard.require(df))
  }

  test("joined dimension without timestamps does not need a filter") {
    val df = table("events")
      .filter(col("ts") >= b.fromCol && col("ts") < b.toCol)
      .join(table("region"), col("user_id") % 5 === col("r_regionkey"))
    PeriodFilterGuard.require(df)
  }

  test("one filtered and one unfiltered time scan: only the naked one flagged") {
    val filtered = table("events").filter(col("ts") >= b.fromCol && col("ts") < b.toCol)
    val naked = table("orders") // o_orderdate is a timestamp
    val df = filtered.join(naked, col("user_id") === col("o_custkey"))
    assert(PeriodFilterGuard.unguardedScans(df).size == 1)
  }

  test("raw-column range filter below the normalization passes the guard") {
    val df = graft.sources.Tables
      .eventsRange(spark, sfDir, b.from, b.to)
      .groupBy(col("event_type")).count()
    PeriodFilterGuard.require(df)
  }

  test("runner guard rejects an unfiltered model end-to-end") {
    val model = IbtpModel.DfModel { (s, _, _) =>
      table("events").groupBy(col("ts").cast("date").as("day")).count()
    }
    val target = new TargetTable(spark, tmpDir("guard"), "day")
    val cfg = IbtpConfig("day", Some(LocalDate.of(2024, 1, 1)),
      Some(LocalDate.of(2024, 1, 5)))
    assertThrows[IllegalStateException] {
      IbtpRunner.run(spark, model, target,
        IbtpRunner.RunParams(cfg, today = LocalDate.of(2024, 1, 5),
          guardPeriodFilter = true))
    }
  }
}
