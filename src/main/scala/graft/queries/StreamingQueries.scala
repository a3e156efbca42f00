package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ibtp._
import graft.sources.Tables
import graft.streaming.{EventStream, StreamingIngest}

/** Streaming ingestion under the hard correctness gate: the
  * reference's defining incremental behavior — resume from MAX(ts) and
  * load only what's new (`/root/reference/README.md:9-11`) — expressed
  * as Structured Streaming catch-up runs into the SAME day-partitioned
  * target the batch loop writes, hashed against the same one-shot
  * DuckDB oracle as the loop queries.
  */
object StreamingQueries {

  /** q83: staged streaming catch-up + batch resume ≡ one-shot.
    *
    * The events fixture arrives as two files split mid-history; two
    * `StreamingIngest.catchUp` runs share one checkpoint, so the second
    * processes ONLY the newly arrived file (the streaming mirror of the
    * loop's `MAX(ts)+1` resume probe). Watermarked append-mode
    * aggregation emits each day exactly once when it closes — but the
    * trailing day(s) inside the final watermark horizon never close on
    * a finite stream, so the ordinary batch runner then RESUMES from
    * the streamed table's own partition frontier and loops over exactly
    * the open tail. That interplay is the operational contract: the
    * stream keeps the table fresh for closed days, the batch loop
    * completes or repairs it, and both write one table a reader can't
    * tell apart — which the one-shot oracle hash proves.
    */
  def streamCatchup(spark: SparkSession, dir: String): DataFrame = {
    val src = Files.createTempDirectory("q83_src").toString
    val ckp = Files.createTempDirectory("q83_ckp").toString
    val tgt = Files.createTempDirectory("q83_tgt").toString + "/tbl"

    // probe the fixture's range; split the staged arrival at mid-history
    // ON a day boundary (windows never straddle the two stages)
    val cfg0 = IbtpConfig(timestampField = "ts", dateSourceModels = Seq("__events"))
    val (minD, maxDOpt) = Boundaries.resolveStartStop(
      spark, cfg0, Map("__events" -> Tables.events(spark, dir)))
    val maxD = maxDOpt.get
    val cut = java.sql.Date.valueOf(
      minD.plusDays(java.time.temporal.ChronoUnit.DAYS.between(minD, maxD) / 2))

    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.filter(col("ts") < cut).write.parquet(s"$src/stage0")
    raw.filter(col("ts") >= cut).write.parquet(s"$src/stage1")
    def arrive(stage: String): Unit =
      new java.io.File(s"$src/$stage").listFiles()
        .filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach {
          case (f, i) => Files.move(f.toPath,
            java.nio.file.Paths.get(s"$src/events_${stage}_$i.parquet"))
        }

    // decimal money sum, same numeric path as the loop queries' oracle
    // (double summation drifts across ROUND() boundaries at sf0.1+)
    def agg(events: DataFrame): DataFrame = events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(CoreQueries.moneySum(col("value")), 4).as("total_value"))
      .select(col("w.start").cast("date").as("day"), col("event_type"),
        col("n_events"), col("total_value"))

    val target = new TargetTable(spark, tgt, "day", countRows = false)
    def run(): Unit = StreamingIngest.catchUp(
      agg(EventStream.readEvents(spark, src)), target, ckp)

    arrive("stage0"); run()   // catch-up 1: closed days of the first half
    arrive("stage1"); run()   // catch-up 2: resumes from the checkpoint,
                              // reads ONLY stage1's files
    require(target.exists && target.maxPartitionDate.nonEmpty,
      "streaming catch-up wrote no closed days")

    // batch resume over the open tail: the runner's own frontier probe
    // starts it at maxPartitionDate+1 — no explicit handoff date
    val model = new IbtpModel {
      def query(s: SparkSession, b: PeriodBounds): DataFrame =
        Tables.eventsRange(s, dir, b.from, b.to)
          .groupBy(col("ts").cast("date").as("day"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            round(CoreQueries.moneySum(col("value")), 4).as("total_value"))
    }
    val cfg = IbtpConfig(timestampField = "day",
      startDate = Some(minD), stopDate = Some(maxD.plusDays(1)))
    IbtpRunner.run(spark, model, target, IbtpRunner.RunParams(cfg))

    target.read().orderBy(col("day"), col("event_type"))
  }

  /** One-shot oracle — identical daily aggregation over the whole
    * fixture (no n_users: distinct aggregation is unsupported in
    * streaming append mode, so the streamed schema omits it).
    */
  val streamCatchupSql: String =
    """SELECT CAST(ts AS DATE) AS day, event_type,
      |       COUNT(*) AS n_events,
      |       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin
}
