package graft.ibtp

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Auto period sizing (`/root/reference/README.md:104`: pick `period`
  * so chunks land at 6–60 M rows) — synthetic row-rate profiles for
  * the chooser, the events fixture for the probe, and a loop e2e where
  * auto picks Week over the Day default and still matches the one-shot.
  */
class PeriodSizingSpec extends SparkSpecBase {

  test("choosePeriod picks the finest period reaching the band minimum") {
    import PeriodSizing._
    // 10 M rows/day: a day chunk already reaches 6 M
    assert(choosePeriod(1e7).period == PeriodUnit.Day)
    // 1.5 M/day: day misses, week = 10.5 M
    assert(choosePeriod(1.5e6).period == PeriodUnit.Week)
    // 300 k/day: week = 2.1 M misses, month ≈ 9.1 M
    assert(choosePeriod(3e5).period == PeriodUnit.Month)
    // 30 k/day: month ≈ 0.9 M misses, year ≈ 11 M
    assert(choosePeriod(3e4).period == PeriodUnit.Year)
    // 1 k/day: even a year (~365 k) misses — coarsest wins, flagged
    val tiny = choosePeriod(1e3)
    assert(tiny.period == PeriodUnit.Year && tiny.outsideBand)
    // 100 M/day: over the max but nothing finer than a day exists
    val huge = choosePeriod(1e8)
    assert(huge.period == PeriodUnit.Day && huge.outsideBand)
    // in-band choices are not flagged
    assert(!choosePeriod(1e7).outsideBand)
    // custom band: 33 rows/day with [100, 1000] band -> week (231)
    assert(choosePeriod(33, 100, 1000).period == PeriodUnit.Week)
  }

  test("choosePeriod properties over random rate profiles (seeded sweep)") {
    import PeriodSizing._
    val rnd = new scala.util.Random(42)
    var prev: Option[(Double, PeriodUnit)] = None
    for (_ <- 1 to 500) {
      // rates spanning 10 rows/day to 1 B rows/day, log-uniform
      val rate = math.pow(10, 1 + rnd.nextDouble() * 8)
      val c = choosePeriod(rate)
      // chosen period reaches the band minimum whenever ANY period can
      if (rate * daysPer(PeriodUnit.Year) >= DefaultMinChunkRows)
        assert(c.expectedChunkRows >= DefaultMinChunkRows, s"rate $rate -> $c")
      // no finer period would also reach the minimum (finest-first)
      PeriodUnit.all.takeWhile(_ != c.period).foreach { finer =>
        assert(rate * daysPer(finer) < DefaultMinChunkRows,
          s"rate $rate: $finer also fits but ${c.period} chosen")
      }
      // monotone: a higher rate never picks a coarser period
      prev.foreach { case (r0, p0) =>
        if (rate >= r0)
          assert(daysPer(c.period) <= daysPer(p0),
            s"rate $rate picked coarser ${c.period} than $p0 at $r0")
      }
      prev = Some((rate, c.period))
      prev = if (rnd.nextBoolean()) prev else None // compare random adjacent pairs
    }
  }

  test("probeRowsPerDay measures count over day span from the sources") {
    val events = table("events")
    val expected = {
      val n = events.count().toDouble
      val r = events.agg(min(col("ts").cast("date")), max(col("ts").cast("date"))).head()
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        r.getDate(0).toLocalDate, r.getDate(1).toLocalDate) + 1
      n / span
    }
    val got = PeriodSizing.probeRowsPerDay("ts", Seq(events))
    assert(got.exists(g => math.abs(g - expected) < 1e-9), s"$got vs $expected")
    // empty source list and empty frames yield None, not a crash
    assert(PeriodSizing.probeRowsPerDay("ts", Nil).isEmpty)
    assert(PeriodSizing.probeRowsPerDay("ts", Seq(events.limit(0))).isEmpty)
  }

  test("auto period picks Week over Day in the loop and matches one-shot") {
    val model = IbtpModel.DfModel { (_, from, to) =>
      table("events")
        .filter(col("ts") >= from && col("ts") < to)
        .groupBy(col("ts").cast("date").cast("timestamp").as("day"))
        .agg(count("*").as("n"))
    }
    val cfg = IbtpConfig(timestampField = "day",
      dateSourceModels = Seq("__ev")) // probe boundaries AND row rate
    val target = new TargetTable(spark, tmpDir("ibtp_auto"), "day")
    // the probe reads timestampField from the sources (reference
    // fidelity: MIN/MAX(timestamp_field) FROM each source)
    val src = table("events").withColumnRenamed("ts", "day")
    // events sf0.001 ≈ 33 rows/day: with a [100, 1000] band a day chunk
    // (~33) misses and a week (~230) fits — auto must choose Week
    val res = IbtpRunner.run(spark, model, target,
      IbtpRunner.RunParams(cfg, autoPeriod = true,
        minChunkRows = 100, maxChunkRows = 1000),
      sources = Map("__ev" -> src))
    assert(res.period == PeriodUnit.Week, res)
    assert(res.sizing.exists(s => s.period == PeriodUnit.Week && !s.outsideBand), res)
    // weekly tiling still equals the one-shot over the loaded range —
    // the probed stop is MAX(day), which the loop treats as exclusive
    // (the reference's partial-last-day semantics)
    val r = table("events").agg(
      min(col("ts").cast("date")), max(col("ts").cast("date"))).head()
    val (lo, hi) = (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate)
    assertSameRows(target.read(), model.query(spark, PeriodBounds(lo, hi)))
    // explicit period config is untouched when autoPeriod is off
    val res2 = IbtpRunner.run(spark, model, target,
      IbtpRunner.RunParams(cfg), sources = Map("__ev" -> src))
    assert(res2.period == PeriodUnit.Day && res2.sizing.isEmpty)
  }
}
