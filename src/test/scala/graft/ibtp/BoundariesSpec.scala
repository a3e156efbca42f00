package graft.ibtp

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

class BoundariesSpec extends AnyFunSuite {
  import Boundaries._
  import PeriodUnit._

  private val d = LocalDate.of(2024, 1, 1)

  test("periodFrom is start + offset periods") {
    assert(periodFrom(Day, 0, d) == d)
    assert(periodFrom(Day, 5, d) == LocalDate.of(2024, 1, 6))
    assert(periodFrom(Week, 2, d) == LocalDate.of(2024, 1, 15))
    assert(periodFrom(Month, 1, LocalDate.of(2024, 1, 31)) == LocalDate.of(2024, 2, 29)) // leap clamp
    assert(periodFrom(Year, 1, LocalDate.of(2024, 2, 29)) == LocalDate.of(2025, 2, 28))
  }

  test("periodTo clamps with LEAST(stop) and defaults to 9999-12-31") {
    assert(periodTo(Day, 0, d, None) == LocalDate.of(2024, 1, 2))
    assert(periodTo(Day, 0, d, Some(LocalDate.of(2024, 1, 2))) == LocalDate.of(2024, 1, 2))
    // clamp engages
    assert(periodTo(Month, 0, d, Some(LocalDate.of(2024, 1, 15))) == LocalDate.of(2024, 1, 15))
    // open-ended sentinel (helpers.sql:88)
    assert(periodTo(Year, 0, LocalDate.of(9999, 6, 1), None) == MaxDate)
  }

  test("numPeriods = boundary-crossing DATEDIFF + 1 (reference fidelity)") {
    // daily: [jan1, jan31) — DATEDIFF(day)=30, +1 = 31 (over-count by design;
    // the last slice is emptied by the clamp, loop.sql:32-33)
    assert(numPeriods(Day, d, LocalDate.of(2024, 1, 31)) == 31)
    // T-SQL DATEDIFF(year) counts boundary crossings: dec31→jan1 = 1
    assert(Year.boundaryDiff(LocalDate.of(2023, 12, 31), LocalDate.of(2024, 1, 1)) == 1)
    assert(Month.boundaryDiff(LocalDate.of(2024, 1, 31), LocalDate.of(2024, 2, 1)) == 1)
    assert(Month.boundaryDiff(LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 31)) == 0)
    // week crossings are Sunday-based (SQL Server DATEFIRST=7):
    // 2024-01-06 is Saturday, 2024-01-07 Sunday → one crossing
    assert(Week.boundaryDiff(LocalDate.of(2024, 1, 6), LocalDate.of(2024, 1, 7)) == 1)
    assert(Week.boundaryDiff(LocalDate.of(2024, 1, 7), LocalDate.of(2024, 1, 13)) == 0)
  }

  test("slices tile [start, stop) half-open, non-overlapping, exhaustive") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val start = LocalDate.of(2020, 1, 1).plusDays(rnd.nextInt(3000).toLong)
      val unit  = PeriodUnit.all(rnd.nextInt(4))
      val stop  = start.plusDays(1L + rnd.nextInt(400))
      val w = Window(start, stop, numPeriods(unit, start, stop))
      val ss = slices(unit, w, Some(stop))
      assert(ss.nonEmpty)
      assert(ss.head.from == start)
      assert(ss.last.to == stop)
      // contiguous tiling
      ss.sliding(2).foreach {
        case Seq(a, b) => assert(a.to == b.from)
        case _         =>
      }
      // non-empty & half-open
      ss.foreach(s => assert(s.from.isBefore(s.to)))
    }
  }

  test("runWindow: normal resume = GREATEST(max_ts + 1 DAY, start) — day regardless of period") {
    val w = runWindow(Month, d, Some(LocalDate.of(2024, 6, 1)),
      targetMaxTs = Some(LocalDate.of(2024, 3, 15)), RunMode.Normal, LocalDate.of(2024, 7, 1))
    assert(w.start == LocalDate.of(2024, 3, 16)) // +1 day, NOT +1 month (helpers.sql:119)
    assert(w.stop == LocalDate.of(2024, 6, 1))
  }

  test("runWindow: empty/absent target starts at start_date; stop defaults to today") {
    val w = runWindow(Day, d, None, None, RunMode.Normal, LocalDate.of(2024, 2, 1))
    assert(w.start == d)
    assert(w.stop == LocalDate.of(2024, 2, 1)) // CURRENT_TIMESTAMP fallback (helpers.sql:122-125)
  }

  test("runWindow: backfill uses CLI dates verbatim, ignores target state") {
    val w = runWindow(Day, d, Some(LocalDate.of(2024, 6, 1)),
      Some(LocalDate.of(2024, 5, 1)),
      RunMode.Backfill(LocalDate.of(2024, 2, 1), LocalDate.of(2024, 2, 10)),
      LocalDate.of(2024, 7, 1))
    assert(w.start == LocalDate.of(2024, 2, 1) && w.stop == LocalDate.of(2024, 2, 10))
  }

  test("RunMode precedence: backfill overrides full-refresh (materialization.sql:8-14)") {
    val m = RunMode.resolve(fullRefresh = true, backfill = true,
      Some(d), Some(d.plusDays(5)))
    assert(m == RunMode.Backfill(d, d.plusDays(5)))
    assertThrows[IllegalArgumentException] {
      RunMode.resolve(fullRefresh = false, backfill = true, None, Some(d))
    }
  }

  test("placeholder validation passes with only one placeholder (reference OR-quirk)") {
    IbtpModel.checkPlaceholders("SELECT 1 WHERE ts >= __PERIOD_FILTER_FROM__")
    IbtpModel.checkPlaceholders("SELECT 1 WHERE ts < __PERIOD_FILTER_TO__")
    assertThrows[IllegalArgumentException](IbtpModel.checkPlaceholders("SELECT 1"))
  }

  test("bindSql substitutes DATE-typed expressions, any number of occurrences") {
    val sql = "SELECT * FROM t WHERE ts >= __PERIOD_FILTER_FROM__ AND ts < __PERIOD_FILTER_TO__ " +
      "AND d = __PERIOD_FILTER_FROM__"
    val bound = IbtpModel.bindSql(sql, PeriodBounds(d, d.plusDays(1)))
    assert(bound == "SELECT * FROM t WHERE ts >= CAST('2024-01-01' AS DATE) " +
      "AND ts < CAST('2024-01-02' AS DATE) AND d = CAST('2024-01-01' AS DATE)")
  }
}
