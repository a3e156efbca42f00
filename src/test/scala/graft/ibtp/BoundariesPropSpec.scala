package graft.ibtp

import java.time.LocalDate

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Property-style checks of the period-tiling semantics (SURVEY §5.2):
  * for arbitrary (start, stop, period), the generated slices tile
  * [start, clamp(stop)) exactly — half-open, non-overlapping,
  * exhaustive, in order — and the resume rule never skips or repeats
  * a day. Pure driver-side arithmetic, no Spark session; 500 seeded
  * random cases per property (deterministic across runs).
  */
class BoundariesPropSpec extends AnyFunSuite {

  private val Units =
    Seq(PeriodUnit.Day, PeriodUnit.Week, PeriodUnit.Month, PeriodUnit.Year)

  private def cases(seed: Long, n: Int): Seq[(LocalDate, Long, PeriodUnit)] = {
    val rnd = new Random(seed)
    Seq.fill(n)((
      LocalDate.of(2015, 1, 1).plusDays(rnd.nextLong(5000L)),
      1L + rnd.nextLong(800L),
      Units(rnd.nextInt(Units.length))))
  }

  test("slices tile [start, stop) exactly: contiguous, half-open, exhaustive") {
    for ((start, span, period) <- cases(seed = 42, n = 500)) {
      val stop = start.plusDays(span)
      val w = Boundaries.Window(start, stop,
        Boundaries.numPeriods(period, start, stop))
      val ss = Boundaries.slices(period, w, Some(stop))
      val label = s"($start, +$span, ${period.name})"
      assert(ss.nonEmpty, label)
      assert(ss.head.from == start, label)
      assert(ss.last.to == stop, label)
      // contiguous: each to == next from; non-empty half-open slices
      ss.sliding(2).foreach {
        case Seq(a, b) => assert(a.to == b.from, s"$label: $a !~ $b")
        case _         => ()
      }
      ss.foreach(s => assert(s.from.isBefore(s.to), label))
      // every day in [start, stop) covered exactly once
      val covered = ss.iterator.flatMap(s =>
        Iterator.iterate(s.from)(_.plusDays(1)).takeWhile(_.isBefore(s.to))).toSeq
      assert(covered.length == span, label)
      assert(covered.distinct.length == covered.length, label)
    }
  }

  test("resume from any cut day re-tiles the remainder without gap or overlap") {
    val rnd = new Random(7)
    for ((start, span, period) <- cases(seed = 7, n = 500)) {
      val stop = start.plusDays(span)
      val cutOff = 1L + rnd.nextLong(span) // run 1 loaded [start, cut]
      val cut = start.plusDays(cutOff - 1)
      val w = Boundaries.runWindow(period, start, Some(stop),
        targetMaxTs = Some(cut), mode = RunMode.Normal, today = stop)
      val label = s"($start, +$span, cut=$cutOff, ${period.name})"
      assert(w.start == cut.plusDays(1), label)
      if (w.start.isBefore(stop)) {
        val ss = Boundaries.slices(period, w, Some(stop))
        assert(ss.nonEmpty, label)
        assert(ss.head.from == cut.plusDays(1), label) // no gap, no re-load
        assert(ss.last.to == stop, label)
      }
    }
  }

  test("backfill window uses the CLI dates verbatim at any period") {
    for ((start, span, period) <- cases(seed = 99, n = 500)) {
      val stop = start.plusDays(span)
      val w = Boundaries.runWindow(period, start.minusDays(30), Some(stop.plusDays(30)),
        targetMaxTs = Some(start.plusDays(5)),
        mode = RunMode.Backfill(start, stop), today = stop)
      assert(w.start == start && w.stop == stop)
      val ss = Boundaries.slices(period, w, Some(stop))
      assert(ss.head.from == start && ss.last.to == stop)
    }
  }
}
