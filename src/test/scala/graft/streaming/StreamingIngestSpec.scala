package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.ibtp.TargetTable

/** Streaming catch-up ingestion into the IBTP target: files arriving
  * in two stages, two `catchUp` runs sharing one checkpoint — the
  * second processes only the new file and the final table matches the
  * batch aggregation for every watermark-closed day.
  */
class StreamingIngestSpec extends SparkSpecBase {

  test("catchUp ingests incrementally and matches the batch daily agg") {
    val src = Files.createTempDirectory("ingest_src").toString
    val tgt = Files.createTempDirectory("ingest_tgt").toString + "/tbl"
    val ckp = Files.createTempDirectory("ingest_ckp").toString

    // stage the fixture as two arriving files, split mid-history
    // (ts reads as TimestampType — the shape readEvents expects; the
    // rewrite stays micro-precision parquet)
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val cut = java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 16))
    raw.filter(col("ts") < cut).coalesce(1)
      .write.parquet(s"$src/batch0")
    raw.filter(col("ts") >= cut).coalesce(1)
      .write.parquet(s"$src/batch1")
    val f0 = new java.io.File(s"$src/batch0").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val f1 = new java.io.File(s"$src/batch1").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(f0.toPath, java.nio.file.Paths.get(s"$src/events0.parquet"))

    val target = new TargetTable(spark, tgt, "day")
    def run(): Unit = StreamingIngest.catchUp(
      EventStream.dailyAgg(EventStream.readEvents(spark, src)), target, ckp)

    // run 1: only the first half is visible
    run()
    val afterFirst = target.read().count()
    assert(afterFirst > 0, "first catch-up wrote nothing")

    // second file arrives; run 2 resumes from the checkpoint
    Files.move(f1.toPath, java.nio.file.Paths.get(s"$src/events1.parquet"))
    run()
    val got = target.read()
      .select(col("day"), col("event_type"), col("n_events"), col("total_value"))
    assert(got.count() > afterFirst, "second catch-up added nothing")

    val batch = table("events")
      .groupBy(col("ts").cast("date").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))

    // append mode: every day the watermark closed must match batch
    // exactly; at most the trailing open day(s) may be missing
    val gotDays = got.select(col("day")).distinct().collect().map(_.getDate(0)).toSet
    val allDays = batch.select(col("day")).distinct().collect().map(_.getDate(0)).toSet
    assert((allDays -- gotDays).size <= 2, s"missing ${allDays -- gotDays}")
    assertSameRows(got,
      batch.join(got.select(col("day")).distinct(), Seq("day"), "left_semi"))
  }

  test("streaming near-dup dedup finds cross-batch pairs via the signature index") {
    import org.apache.spark.sql.types._
    val src = Files.createTempDirectory("sidx_src").toString
    val idxP = Files.createTempDirectory("sidx_idx").toString + "/idx"
    val ckp = Files.createTempDirectory("sidx_ckp").toString
    val pairsP = Files.createTempDirectory("sidx_pairs").toString + "/pairs"

    val docs = table("documents").select(col("doc_id"), col("text"))
    val toks = split(trim(col("text")), "\\s+")
    val near = docs.select((col("doc_id") + 5000000L).as("doc_id"),
      concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 3, lit(1)))).as("text"))

    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      df.coalesce(1).write.parquet(s"$src/stage_$name")
      val f = new java.io.File(s"$src/stage_$name").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(f.toPath, java.nio.file.Paths.get(s"$src/docs_$name.parquet"))
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def stream = spark.readStream.schema(schema).parquet(s"$src/docs_*.parquet")
    val idx = new graft.operators.SignatureIndex(spark, idxP)

    // batch 1: originals only — no pairs expected
    stage(docs, "a")
    StreamingIngest.dedupCatchUp(stream, "doc_id", "text", idx, pairsP, ckp)
    // batch 2: near-copies — every pair must be cross-batch, against
    // batch 1's INDEX (its text is gone from the stream)
    stage(near, "b")
    StreamingIngest.dedupCatchUp(stream, "doc_id", "text", idx, pairsP, ckp)

    val pairs = spark.read.parquet(pairsP)
    val found = pairs.select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = docs.select(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(0) + 5000000L)).toSet
    val recall = planted.count(found.contains).toDouble / planted.size
    assert(recall >= 0.95, s"cross-batch recall $recall")
    // cross-batch pairs dominate: batch 2 matched against batch 1's
    // index (batch-internal near-dup pairs among the mutated copies
    // are legitimate too — the index dedups within batches as well)
    val crossBatch = found.count { case (a, b) => a < 5000000L && b >= 5000000L }
    assert(crossBatch >= planted.size, s"only $crossBatch cross-batch pairs")
  }

  test("streaming dedup suppresses re-delivered events within the watermark") {
    val src = Files.createTempDirectory("dedup_src").toString
    // the same rows delivered twice (two files) = an at-least-once source
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.coalesce(1).write.parquet(s"$src/stage")
    val staged = new java.io.File(s"$src/stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(staged.toPath, java.nio.file.Paths.get(s"$src/events0.parquet"))
    Files.copy(staged.toPath, java.nio.file.Paths.get(s"$src/events1.parquet"))

    val q = EventStream.dedupedEvents(EventStream.readEvents(spark, src))
      .writeStream.outputMode("append")
      .format("memory").queryName("deduped_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("deduped_out")
    assert(got.count() == raw.count(),
      s"expected ${raw.count()} unique events, got ${got.count()}")
    assert(got.select("event_id").distinct().count() == got.count())
  }
}
