package graft.tools

import org.apache.spark.sql.functions._

import graft.queries.QueryScratch
import graft.sources.Tables

/** Phase-level timing for the round-15 optimization targets: the
  * storage trio (q86/q87/q92 — ingest/compact/read inside the timed
  * query), the PQ index family (q100/q102/q105 shapes), and the
  * backfill loop (q49). Each phase is timed with an eager action so
  * the bench total can be attributed to specific engine calls.
  *
  * Usage: runMain graft.tools.OptProfile [sfDir] [which-regex]
  */
object OptProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.lift(1).getOrElse(".").r
    val spark = graft.sources.GraftSession.create("graft-optprofile")
    def on(name: String): Boolean = which.findFirstIn(name).isDefined

    // same shapes as ExtensionQueries' private helpers
    def queryVecs = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def coarseCentroids = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding"))

    def time[A](label: String)(f: => A): A = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"[opt] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    if (on("zorder")) {
      val ev = Tables.events(spark, sfDir)
        .select(col("ts"), col("event_id"), col("user_id"),
          col("event_type"), col("value"))
      val mx = time("z: max probe")(
        ev.agg(max(col("user_id")).as("u"), max(col("event_id")).as("e")).head)
      val (q3u, q3e) = (3L * mx.getLong(0) / 4L, 3L * mx.getLong(1) / 4L)
      val targetDir = QueryScratch.fresh("opt_zorder")
      val target = new graft.ibtp.TargetTable(spark, targetDir, "ts", countRows = false)
      val u = coalesce(col("user_id"), lit(0L))
      val e = coalesce(col("event_id"), lit(0L))
      val topU = u > q3u
      val topE = !topU && (e > q3e)
      val base = ev.filter(!topU && !topE)
      val even = coalesce(col("user_id") % 2, lit(0)) === 0
      time("z: init (even half)")(target.init(base.filter(even)))
      time("z: append (odd half)")(target.append(base.filter(!even)))
      time("z: compact zorder")(
        target.compact(clusterBy = Seq("user_id", "event_id"), zorder = true))
      time("z: append topU")(target.append(ev.filter(topU)))
      time("z: append topE")(target.append(ev.filter(topE)))
      time("z: plan x2")(Seq(
        target.planFilesForRange("user_id", 0L, q3u),
        target.planFilesForRange("event_id", 0L, q3e)))
      time("z: read + orderBy (noop)")(
        target.readWhereAll(Seq(("user_id", 0L, q3u), ("event_id", 0L, q3e)))
          .orderBy(col("ts"), col("event_id"))
          .write.format("noop").mode("overwrite").save())
    }

    if (on("skip")) {
      val ev = Tables.events(spark, sfDir)
        .select(col("ts"), col("event_id"), col("user_id"),
          col("event_type"), col("value"))
      val mx = time("s: max probe")(ev.agg(max(col("user_id"))).head.getLong(0))
      val q3 = 3L * mx / 4L
      val targetDir = QueryScratch.fresh("opt_skip")
      val target = new graft.ibtp.TargetTable(spark, targetDir, "ts", countRows = false)
      val even = coalesce(col("user_id") % 2, lit(0)) === 0
      val base = ev.filter(col("user_id") <= q3)
      time("s: init")(target.init(base.filter(even)))
      time("s: append")(target.append(base.filter(!even)))
      time("s: compact cluster")(target.compact(clusterBy = Seq("user_id")))
      time("s: append top quartile")(target.append(ev.filter(col("user_id") > q3)))
      time("s: read (noop)")(
        target.readWhere("user_id", q3 + 1L, mx)
          .orderBy(col("ts"), col("event_id"))
          .write.format("noop").mode("overwrite").save())
    }

    if (on("pq")) {
      val emb = Tables.embeddings(spark, sfDir)
      val idx = new graft.operators.PqIndex(spark,
        QueryScratch.fresh("opt_pqidx") + "/idx", m = 4, k = 16)
      time("pq: create (train+encode even half)")(
        idx.create(emb.filter(col("vec_id") % 2 === 0)))
      time("pq: append (odd half)")(
        idx.append(emb.filter(col("vec_id") % 2 =!= 0)))
      time("pq: search (noop)")(
        idx.search(queryVecs, topK = 10)
          .orderBy(col("query_id"), col("rank"))
          .write.format("noop").mode("overwrite").save())
    }

    if (on("ivfpq")) {
      val emb = Tables.embeddings(spark, sfDir)
      val idx = new graft.operators.PqIndex(spark,
        QueryScratch.fresh("opt_ivfpqidx") + "/idx", m = 4, k = 16)
      time("ivfpq: create+coarse")(
        idx.create(emb.filter(col("vec_id") % 2 === 0),
          coarse = Some(coarseCentroids)))
      (1 to 5).foreach { i =>
        time(s"ivfpq: append $i/5 (fifth of odd half)")(
          idx.append(emb.filter(col("vec_id") % 2 =!= 0)
            .filter(col("vec_id") % 10 === (2 * i - 1) % 10)))
      }
      time("ivfpq: compact")(idx.compact())
      time("ivfpq: searchIvf (noop)")(
        idx.searchIvf(queryVecs,
          topK = 10, nProbe = 3)
          .orderBy(col("query_id"), col("rank"))
          .write.format("noop").mode("overwrite").save())
    }

    if (on("backfill")) {
      import graft.ibtp._
      val cfg0 = IbtpConfig(timestampField = "day", dateSourceModels = Seq("__events"))
      val (minD, maxD) = Boundaries.resolveStartStop(
        spark, cfg0.copy(timestampField = "ts"),
        Map("__events" -> Tables.events(spark, sfDir)))
      val stop = maxD.get.plusDays(1)
      val cfg = IbtpConfig(timestampField = "day",
        startDate = Some(minD), stopDate = Some(stop))
      val targetDir = QueryScratch.fresh("opt_backfill")
      val target = new graft.ibtp.TargetTable(spark, targetDir, "day", countRows = false)
      val model = new IbtpModel {
        def query(s: org.apache.spark.sql.SparkSession, b: PeriodBounds)
            : org.apache.spark.sql.DataFrame =
          Tables.eventsRange(s, sfDir, b.from, b.to)
            .groupBy(col("ts").cast("date").as("day"), col("event_type"))
            .agg(count(lit(1)).as("n_events"),
              round(sum(col("value").cast("decimal(18,2)")).cast("double"), 4)
                .as("total_value"),
              countDistinct(col("user_id")).as("n_users"))
      }
      time("bf: build loop (conc 8)")(
        IbtpRunner.run(spark, model, target,
          IbtpRunner.RunParams(cfg, maxConcurrentPeriods = 8)))
      val bStart = minD.plusDays(8)
      val bStop = minD.plusDays(18)
      time("bf: backfill 10 days")(
        IbtpRunner.run(spark, model, target,
          IbtpRunner.RunParams(cfg, RunMode.Backfill(bStart, bStop))))
      time("bf: read (noop)")(
        target.read().orderBy(col("day"), col("event_type"))
          .write.format("noop").mode("overwrite").save())
    }

    spark.stop()
  }
}
