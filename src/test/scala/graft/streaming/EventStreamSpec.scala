package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Streaming vs batch equivalence: drive the file-source stream to
  * completion synchronously (memory sink + processAllAvailable) and
  * compare closed windows against the batch daily aggregation.
  */
class EventStreamSpec extends SparkSpecBase {

  test("streaming daily agg matches batch for all watermark-closed days") {
    val stream = EventStream.dailyAgg(EventStream.readEvents(spark, sfDir))
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("daily_out")
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("daily_out")
    val batch = table("events")
      .groupBy(col("ts").cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))

    // append mode only emits windows the watermark closed; the final
    // (max-ts) day may be open — compare on the emitted days and check
    // coverage is everything but at most the last day
    val gotDays = got.select(col("day")).distinct().collect().map(_.getDate(0)).toSet
    val allDays = batch.select(col("day")).distinct().collect().map(_.getDate(0)).toSet
    assert(gotDays.nonEmpty)
    assert((allDays -- gotDays).size <= 2, s"missing ${allDays -- gotDays}")
    assertSameRows(got,
      batch.join(got.select(col("day")).distinct(), Seq("day"), "left_semi"))
  }

  test("stateful sessionization emits closed sessions matching the batch operator") {
    val stream = EventStream.sessionizeStateful(EventStream.readEvents(spark, sfDir))
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sessions_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sessions_out")
    assert(got.count() > 0)
    // closed streaming sessions are exactly the batch sessions minus
    // each user's final (still-open) session
    val batch = graft.operators.Sessionize.sessions(table("events"))
      .select(col("user_id"), unix_micros(col("session_start")).as("session_start_us"),
        col("n_events"))
    val open = batch.groupBy(col("user_id"))
      .agg(max(col("session_start_us")).as("session_start_us"))
    val expectedClosed = batch.join(open, Seq("user_id", "session_start_us"), "left_anti")
    assertSameRows(
      got.select(col("user_id"), col("session_start_us"), col("n_events")),
      expectedClosed)
  }

  test("sliding windows produce one row per (window, type) with correct totals") {
    val stream = EventStream.slidingTypeRates(EventStream.readEvents(spark, sfDir))
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sliding_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sliding_out")
    assert(got.count() > 0)
    // every closed 5-day window's count equals the batch count over it
    val sample = got.orderBy(col("window_start"), col("event_type")).limit(5).collect()
    sample.foreach { r =>
      val n = table("events")
        .filter(col("ts") >= r.getDate(0) && col("ts") < r.getDate(1) &&
          col("event_type") === r.getString(2))
        .count()
      assert(n == r.getLong(3), s"window $r")
    }
  }

  test("stream-stream click attribution equals the batch time-bounded join") {
    val stream = EventStream.clickAttribution(EventStream.readEvents(spark, sfDir))
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("attrib_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("attrib_out")
    val ev = table("events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    val batch = clicks.join(purchases,
        col("user_id") === col("pu") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 day"))
      .drop("pu")
    assert(got.count() > 0)
    assertSameRows(got, batch)
  }

  test("stream-static enrichment equals the batch join, including dim-less events") {
    import spark.implicits._
    // static dim covering only even user ids — odd ids must survive
    // with a null segment (left join), not drop
    val dim = table("events").select(col("user_id")).distinct()
      .filter(col("user_id") % 2 === 0)
      .withColumn("segment", concat(lit("seg"), col("user_id") % 3))
    val stream = EventStream.enrichWithDim(
      EventStream.readEvents(spark, sfDir), dim, "user_id")
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("enriched_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("enriched_out")
      .select(col("event_id"), col("user_id"), col("segment"))
    val batch = table("events").join(dim, Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("segment"))
    assertSameRows(got, batch)
    assert(got.filter(col("segment").isNull).count() > 0,
      "expected some dim-less events to survive the left join")
  }
}
