package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.ibtp._

import graft.sources.{GraftSession, Tables}
import graft.streaming.{EventStream, StreamingIngest}

/** Stage-timing attribution for q83_stream_catchup — the one query
  * that reads systematically slower in the driver's fresh-VM context
  * than at seal time (r10/r11 carry-over). Runs the exact q83 flow
  * with a StreamingQueryListener capturing Structured Streaming's own
  * per-batch durationMs breakdown, and wall-clocks the non-stream
  * phases, so the driver-vs-seal delta can be pinned to stream START
  * (query planning + state-store provider init), per-batch addBatch
  * (the real work), WAL/state commits (fsync-bound, page-cache
  * sensitive), or the batch-runner resume tail.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.Q83Profile [reps]
  * Prints one JSON line per rep plus per-batch detail.
  */
object Q83Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    val spark = GraftSession.create("graft-q83-profile")

    (1 to reps).foreach { rep =>
      // fresh dirs per rep — same as each Bench exec
      val src = Files.createTempDirectory("q83p_src").toString
      val ckp = Files.createTempDirectory("q83p_ckp").toString
      val tgt = Files.createTempDirectory("q83p_tgt").toString + "/tbl"

      val batches = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      var starts = 0L
      val listener = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
          starts += 1
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          val d = p.durationMs
          def ms(k: String): Long = Option(d.get(k)).map(_.longValue).getOrElse(-1L)
          val state = p.stateOperators.toSeq.map(s =>
            s"""{"commitMs":${s.allUpdatesTimeMs + s.commitTimeMs},"rows":${s.numRowsTotal}}""")
            .mkString("[", ",", "]")
          batches.add(
            s"""{"batch":${p.batchId},"rows":${p.numInputRows},""" +
              s""""triggerMs":${ms("triggerExecution")},"addBatchMs":${ms("addBatch")},""" +
              s""""getBatchMs":${ms("getBatch")},"walCommitMs":${ms("walCommit")},""" +
              s""""commitOffsetsMs":${ms("commitOffsets")},"queryPlanningMs":${ms("queryPlanning")},""" +
              s""""stateOps":$state}""")
        }
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)

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
      def agg(events: DataFrame): DataFrame = events
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value").cast("decimal(18,2)")).cast("double"), 4).as("total_value"))
        .select(col("w.start").cast("date").as("day"), col("event_type"),
          col("n_events"), col("total_value"))
      val target = new TargetTable(spark, tgt, "day", countRows = false)

      def timed[T](f: => T): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val setupSec = 0.0
      arrive("stage0")
      val run1Sec = timed(StreamingIngest.catchUp(
        agg(EventStream.readEvents(spark, src)), target, ckp))
      arrive("stage1")
      val run2Sec = timed(StreamingIngest.catchUp(
        agg(EventStream.readEvents(spark, src)), target, ckp))
      val model = new IbtpModel {
        def query(s: org.apache.spark.sql.SparkSession, b: PeriodBounds): DataFrame =
          Tables.eventsRange(s, dir, b.from, b.to)
            .groupBy(col("ts").cast("date").as("day"), col("event_type"))
            .agg(count(lit(1)).as("n_events"),
              round(sum(col("value").cast("decimal(18,2)")).cast("double"), 4).as("total_value"))
      }
      val cfg = IbtpConfig(timestampField = "day",
        startDate = Some(minD), stopDate = Some(maxD.plusDays(1)))
      val resumeSec = timed(
        IbtpRunner.run(spark, model, target, IbtpRunner.RunParams(cfg)))
      val readSec = timed(
        target.read().orderBy(col("day"), col("event_type"))
          .write.format("noop").mode("overwrite").save())
      spark.streams.removeListener(listener)
      import scala.jdk.CollectionConverters._
      val batchSum = batches.asScala.mkString("[", ",", "]")
      println(
        f"""{"rep":$rep,"stream1_sec":$run1Sec%.3f,"stream2_sec":$run2Sec%.3f,""" +
          f""""batch_resume_sec":$resumeSec%.3f,"final_read_sec":$readSec%.3f,""" +
          f""""total_sec":${setupSec + run1Sec + run2Sec + resumeSec + readSec}%.3f,""" +
          s""""batches":$batchSum}""")
      batches.clear()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
