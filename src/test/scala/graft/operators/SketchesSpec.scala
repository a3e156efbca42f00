package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Mergeable HLL sketches: exact merge identity (union of daily
  * sketches ≡ one global sketch), error bounds vs exact distincts,
  * and idempotent re-merge.
  */
class SketchesSpec extends SparkSpecBase {

  private lazy val events = table("events")

  test("merging daily sketches equals sketching the whole stream (register-max identity)") {
    val daily = Sketches.dailySketches(events, "ts", "user_id")
    val merged = Sketches.mergedDistinct(daily)
      .head().getLong(0)
    val global = events
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))"))
      .head().getLong(0)
    assert(merged == global,
      s"daily-union estimate $merged != global estimate $global")
  }

  test("estimates land within 5% of exact distinct counts") {
    val daily = Sketches.dailySketches(events, "ts", "user_id")
    val est = Sketches.mergedDistinct(daily).head().getLong(0)
    val exact = events.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(math.abs(est - exact).toDouble / exact <= 0.05, s"est $est exact $exact")
  }

  test("overlapping re-merge never double-counts (idempotent union)") {
    val daily = Sketches.dailySketches(events, "ts", "user_id")
    val doubled = daily.unionAll(daily) // every sketch contributed twice
    val once = Sketches.mergedDistinct(daily).head().getLong(0)
    val twice = Sketches.mergedDistinct(doubled).head().getLong(0)
    assert(once == twice)
  }

  test("CountMin merge-of-daily equals the whole-range sketch; estimates over-count only") {
    val daily = Sketches.dailyFrequencySketches(events, "ts", "user_id")
    val probe = events.select(col("user_id")).distinct()
      .orderBy(col("user_id")).limit(10)
      .collect().map(_.getLong(0)).toSeq
    val est = Sketches.mergedFrequencies(daily, probe)
    val global = Sketches.mergedFrequencies(
      events.agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("cms"),
        count(lit(1)).as("n_events")), probe)
    assert(est == global, "counter-sum merge must equal the one-shot sketch")
    val exact = events.filter(col("user_id").isin(probe: _*))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = events.count()
    probe.foreach { u =>
      val e = exact.getOrElse(u, 0L)
      assert(est(u) >= e, s"user $u: CMS must never under-count ($e vs ${est(u)})")
      assert(est(u) <= e + (0.001 * n).toLong + 1, s"user $u over eps bound")
    }
  }

  test("rolling window merges only the trailing window's sketches") {
    val daily = Sketches.dailySketches(events, "ts", "user_id")
    val rolling = Sketches.rollingDistinct(daily, windowDays = 7)
    assert(rolling.count() == daily.count())
    // a 1-day window equals each day's own estimate
    val one = Sketches.rollingDistinct(daily, windowDays = 1)
      .withColumnRenamed("distinct_estimate", "one_day")
    val own = daily.select(col("day"),
      expr("hll_sketch_estimate(sketch)").as("own"))
    val mismatch = one.join(own, "day")
      .filter(col("one_day") =!= col("own")).count()
    assert(mismatch == 0)
    // windows only grow estimates (more days ⊇ fewer days)
    val seven = rolling.withColumnRenamed("distinct_estimate", "seven_day")
    val shrank = seven.join(one, "day")
      .filter(col("seven_day") < col("one_day")).count()
    assert(shrank == 0)
  }
}
