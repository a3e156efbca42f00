package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** As-of and range joins checked against their naive (quadratic)
  * formulations — the oracle queries (q45/q46) pin values against
  * DuckDB; these specs pin the operator semantics against the
  * definitionally-correct plan on arbitrary parameters.
  */
class TemporalOpsSpec extends SparkSpecBase {

  private def events = table("events")

  test("asof equals the naive join+argmax formulation, including no-match lefts") {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))

    val got = AsofJoin.asof(clicks, purchases, Seq("user_id"),
      "click_ts", "purchase_ts", Seq("purchase_ts", "purchase_value"),
      rightOrder = Some("event_id"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_ts"), col("purchase_value"))

    // naive: every (click, earlier purchase) pair, keep the latest
    val paired = clicks.join(purchases, Seq("user_id"))
      .filter(col("purchase_ts") <= col("click_ts"))
    val w = Window.partitionBy(col("click_id"))
      .orderBy(col("purchase_ts").desc, col("event_id").desc)
    val best = paired.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_ts"), col("purchase_value"))
    // lefts with no prior purchase carry nulls
    val naive = clicks.join(best.select(col("click_id")), Seq("click_id"), "left_anti")
      .withColumn("purchase_ts", lit(null).cast("timestamp"))
      .withColumn("purchase_value", lit(null).cast("double"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_ts"), col("purchase_value"))
      .unionAll(best)

    assertSameRows(got, naive)
    assert(got.filter(col("purchase_ts").isNull).count() > 0,
      "fixture should include clicks before any purchase")
  }

  test("asof tie-break orders a STRING column natively (no silent numeric cast)") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    val left = Seq(("k", ts)).toDF("k", "lts")
    // two right rows at the IDENTICAL (key, ts): the lexicographically
    // larger string id must win; a silent cast("long") would null both
    // and pick nondeterministically
    val right = Seq(("k", ts, "id_a", 1.0), ("k", ts, "id_b", 2.0))
      .toDF("k", "rts", "rid", "v")
    val got = AsofJoin.asof(left, right, Seq("k"), "lts", "rts",
      Seq("rid", "v"), rightOrder = Some("rid")).collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("rid") == "id_b")
    assert(got.head.getAs[Double]("v") == 2.0)
    // a non-orderable tiebreak type fails loudly, not silently
    val badRight = Seq(("k", ts, Map("a" -> 1), 1.0)).toDF("k", "rts", "m", "v")
    intercept[IllegalArgumentException] {
      AsofJoin.asof(left, badRight, Seq("k"), "lts", "rts", Seq("v"),
        rightOrder = Some("m"))
    }
  }

  test("range join equals the naive inequality join at any bin width") {
    val windows = events.filter(col("event_type") === "error")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(min(unix_micros(col("ts"))).as("lo_us"),
        max(unix_micros(col("ts"))).as("hi_us"))
    val points = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))

    val naive = points.crossJoin(windows)
      .filter(col("ts_us") >= col("lo_us") && col("ts_us") < col("hi_us"))
      .select(col("event_id"), col("day"))

    for (width <- Seq(60L * 1000000, 3600L * 1000000, 86400L * 1000000)) {
      val got = RangeJoin.pointInInterval(points, "ts_us", windows,
        "lo_us", "hi_us", binWidth = width)
        .select(col("event_id"), col("day"))
      assertSameRows(got, naive)
    }
  }

  test("range join handles fractional and negative bounds exactly") {
    import spark.implicits._
    // hi=10.5 with binWidth=10: old integral binning computed the end
    // bin from cast-to-long truncation and dropped the partial bin
    val intervals = Seq((0.0, 10.5, "a"), (-25.3, -4.9, "b"), (20.0, 30.0, "c"))
      .toDF("lo", "hi", "tag")
    val points = Seq(10.2, 10.6, -5.0, -25.3, -4.9, 20.0, 29.999, 30.0)
      .toDF("p")
    val naive = points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") < col("hi"))
      .select(col("p"), col("tag"))
    for (width <- Seq(1L, 3L, 10L, 100L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals,
        "lo", "hi", binWidth = width).select(col("p"), col("tag"))
      assertSameRows(got, naive)
    }
    // negative integral bounds: cast-truncation toward zero would misbin
    val iIntervals = Seq((-25L, -4L, "x"), (-3L, 7L, "y")).toDF("lo", "hi", "tag")
    val iPoints = Seq(-25L, -5L, -4L, -3L, 0L, 6L, 7L).toDF("p")
    val iNaive = iPoints.crossJoin(iIntervals)
      .filter(col("p") >= col("lo") && col("p") < col("hi"))
      .select(col("p"), col("tag"))
    for (width <- Seq(1L, 7L, 100L)) {
      val got = RangeJoin.pointInInterval(iPoints, "p", iIntervals,
        "lo", "hi", binWidth = width).select(col("p"), col("tag"))
      assertSameRows(got, iNaive)
    }
    // epoch-NANOSECOND scale: bin indices exceed 2^53, where double
    // division misbins (integral division must stay exact)
    val base = 1700000000000000000L
    val nIntervals = Seq((base + 3L, base + 17L, "n1"), (base - 20L, base + 2L, "n2"))
      .toDF("lo", "hi", "tag")
    val nPoints = Seq(base - 20L, base + 1L, base + 2L, base + 3L, base + 10L, base + 16L, base + 17L)
      .toDF("p")
    val nNaive = nPoints.crossJoin(nIntervals)
      .filter(col("p") >= col("lo") && col("p") < col("hi"))
      .select(col("p"), col("tag"))
    for (width <- Seq(3L, 7L, 1000L)) {
      val got = RangeJoin.pointInInterval(nPoints, "p", nIntervals,
        "lo", "hi", binWidth = width).select(col("p"), col("tag"))
      assertSameRows(got, nNaive)
    }
  }

  test("bloom pruning: no false negatives, real pruning, join unchanged") {
    val lineitem = table("lineitem").select(col("l_orderkey"), col("l_extendedprice"))
    val urgent = table("orders").filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))

    val filtered = BloomPrune.probeFilter(lineitem, urgent, "l_orderkey", 10000L)
    // no false negatives: every truly-matching probe row survives
    val trueMatches = lineitem.join(urgent.select("l_orderkey"), Seq("l_orderkey"), "left_semi")
    assert(filtered.join(trueMatches, Seq("l_orderkey"), "left_semi").count()
      == trueMatches.count())
    // the bloom actually prunes (urgent is ~1/5 of orders)
    assert(filtered.count() < lineitem.count() * 0.6,
      s"bloom pruned nothing: ${filtered.count()} of ${lineitem.count()}")
    // exact join after pruning is identical to the plain join
    assertSameRows(
      BloomPrune.prunedJoin(lineitem, urgent, "l_orderkey", 10000L),
      lineitem.join(urgent, Seq("l_orderkey")))
  }

  test("interval overlap equals the naive inequality join at any bin width") {
    import spark.implicits._
    // hand-picked edges: touching half-open intervals ([0,10) vs
    // [10,20)) must NOT match; negative bounds; containment; spans
    // crossing many bins; an empty interval
    val a = Seq((1L, -25L, -3L), (2L, 0L, 10L), (3L, 5L, 6L), (4L, 100L, 400L),
      (5L, 7L, 7L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, -10L, 1L), (20L, 10L, 20L), (30L, 4L, 90L),
      (40L, 399L, 1000L), (50L, -1000L, 500L)).toDF("b_id", "b_lo", "b_hi")
    val naive = a.crossJoin(b)
      .filter(col("a_lo") < col("a_hi") && col("b_lo") < col("b_hi") &&
        col("a_lo") < col("b_hi") && col("b_lo") < col("a_hi"))
      .select(col("a_id"), col("b_id"))
    for (width <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", width)
        .select(col("a_id"), col("b_id"))
      assertSameRows(got, naive) // same multiset ⇒ emit-once guard held
    }
  }

  test("interval overlap rejects fractional bounds and clashing names") {
    import spark.implicits._
    val ints = Seq((1L, 2L)).toDF("lo", "hi")
    val frac = Seq((0.5, 2.5)).toDF("flo", "fhi")
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(ints, "lo", "hi", frac, "flo", "fhi", 10L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(ints, "lo", "hi", ints, "lo", "hi", 10L)
    }
  }

  test("rolling window is a TIME range, not a row count (activity gaps excluded)") {
    import spark.implicits._
    // one user, bursts on days 1-2 then a gap to day 40: the 7-day
    // window at day 40 must NOT reach back across the gap (a ROWS
    // frame would)
    val ev = Seq(("2024-01-01", 3), ("2024-01-02", 2), ("2024-02-09", 4))
      .flatMap { case (d, n) => Seq.fill(n)((7L, d)) }
      .toDF("user_id", "d")
      .select(col("user_id"), col("d").cast("date").as("day"),
        col("d").cast("timestamp").as("ts"), lit(1.0).as("value"))
    import org.apache.spark.sql.expressions.Window
    val daily = ev.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_day"))
    val dayNum = datediff(col("day"), lit("1970-01-01").cast("date"))
    val w = Window.partitionBy(col("user_id")).orderBy(dayNum).rangeBetween(-6, 0)
    val got = daily.select(col("day"), sum(col("n_day")).over(w).as("n7"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    assert(got == Map("2024-01-01" -> 3L, "2024-01-02" -> 5L, "2024-02-09" -> 4L))
  }

  test("range join plans an equi-join on the bin key, not a nested loop") {
    val windows = events.filter(col("event_type") === "error")
      .groupBy(col("ts").cast("date").as("day"))
      .agg(min(unix_micros(col("ts"))).as("lo_us"),
        max(unix_micros(col("ts"))).as("hi_us"))
    val points = events.select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val p = RangeJoin.pointInInterval(points, "ts_us", windows,
      "lo_us", "hi_us", binWidth = 3600L * 1000000)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("interval overlap plans an equi-join on the bin key, not a nested loop") {
    import spark.implicits._
    val a = (0L until 50L).map(i => (i, i * 10, i * 10 + 25)).toDF("a_id", "a_lo", "a_hi")
    val b = (0L until 50L).map(i => (i, i * 7, i * 7 + 12)).toDF("b_id", "b_lo", "b_hi")
    val p = RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", 16L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
