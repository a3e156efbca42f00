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
