package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Export sharding (global order across files, even sizes,
  * deterministic shuffle) and CSV/JSONL round-trips.
  */
class ExportFormatsSpec extends SparkSpecBase {

  test("sortedShards: total order across shard files, all rows present") {
    val out = Files.createTempDirectory("export_sorted").toString + "/shards"
    val docs = table("documents").select(col("doc_id"), col("source"), col("n_chars"))
    Export.sortedShards(docs, out, numShards = 4, orderCols = Seq("doc_id"))

    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    assert(files.length == 4)
    // per-file [min, max] ranges must not overlap across files in name order
    val ranges = files.map { f =>
      val ids = spark.read.parquet(f.getAbsolutePath)
        .select(col("doc_id")).collect().map(_.getLong(0))
      // rows inside a shard are sorted
      assert(ids.sameElements(ids.sorted), s"${f.getName} not internally sorted")
      (ids.min, ids.max)
    }
    ranges.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) => assert(aMax < bMin, "shard ranges overlap")
      case _ => ()
    }
    // no shard grossly over/under-sized (range partitioner samples)
    val counts = files.map(f => spark.read.parquet(f.getAbsolutePath).count())
    assert(counts.min > 0 && counts.max < docs.count(),
      s"degenerate shard sizes: ${counts.toSeq}")
    assert(counts.sum == docs.count())
  }

  test("shuffledShards: deterministic across runs, interleaves sources") {
    val base = Files.createTempDirectory("export_shuf").toString
    val docs = table("documents").select(col("doc_id"), col("source"))
    Export.shuffledShards(docs, s"$base/a", numShards = 4, idCol = "doc_id")
    Export.shuffledShards(docs, s"$base/b", numShards = 4, idCol = "doc_id")
    val a = spark.read.parquet(s"$base/a").collect().map(_.toString)
    val b = spark.read.parquet(s"$base/b").collect().map(_.toString)
    assert(a.sorted.sameElements(b.sorted))
    // every shard sees most sources (hash order interleaves them)
    val perShard = spark.read.parquet(s"$base/a")
      .withColumn("f", input_file_name())
      .groupBy("f").agg(countDistinct("source").as("nsrc"))
      .collect().map(_.getLong(1))
    assert(perShard.forall(_ >= 10), s"shard with few sources: ${perShard.toSeq}")
  }

  test("csv and jsonl round-trip events exactly, including timestamps") {
    val base = Files.createTempDirectory("formats").toString
    val events = table("events")
    Formats.writeCsv(events, s"$base/csv")
    Formats.writeJsonl(events, s"$base/jsonl")
    assertSameRows(Formats.readCsv(spark, s"$base/csv", events.schema), events)
    assertSameRows(Formats.readJsonl(spark, s"$base/jsonl", events.schema), events)
  }
}
