package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.sources.GraftSession.create("graft-bench")
    // force FULL evaluation with the noop sink: count() lets Catalyst
    // prune projection-only work (a fingerprint query would "finish"
    // without ever computing a fingerprint)
    def exec(name: String): Unit = {
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      // queries are independent: drop the persist()ed intermediates the
      // dedup/ANN pipelines leave behind, so later queries aren't taxed
      // by earlier queries' cache (eviction + disk spill showed up as
      // multi-second per-query swings in back-to-back suite runs)
      spark.sharedState.cacheManager.clearCache()
    }
    // untimed warmup: JIT + parquet footer caches, so the first timed
    // query isn't charged for JVM warm-up
    try exec("q01_scan_filter_project") catch { case _: Throwable => () }
    // also warm the STREAMING stack (micro-batch execution, state-store
    // provider, checkpoint WAL classes): q83 is the suite's only
    // streaming query, so without this it alone pays the stack's
    // one-time class-loading/JIT inside its timed window — measured
    // ~3.2 s first-execution penalty on a fresh JVM, independent of the
    // page cache (drop_caches changed nothing), which is exactly the
    // driver-context q83 spike of rounds 9-11. Every batch query
    // shares the q01-warmed batch stack; this is the same parity for
    // the streaming one.
    try {
      import org.apache.spark.sql.functions.{count => cnt, lit => l, window => win, col => c}
      val wdir = java.nio.file.Files.createTempDirectory("graft_warm_stream").toString
      spark.range(0, 100).selectExpr(
        "timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,id) as ts", "id as v")
        .write.mode("overwrite").parquet(s"$wdir/in")
      val q = spark.readStream
        .schema("ts timestamp, v long").parquet(s"$wdir/in")
        .withWatermark("ts", "1 minute")
        .groupBy(win(c("ts"), "1 minute")).agg(cnt(l(1)))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", s"$wdir/ckp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          // consume every partition: Spark 4 validates state-store
          // commits and rejects a foreachBatch that drops the frame
          b.write.format("noop").mode("overwrite").save()
        }
        .start()
      q.awaitTermination()
    } catch { case _: Throwable => () }
    // fixed pure-CPU calibration microbench: data-independent, so it
    // measures the HOST's speed at bench time, not the engine's. The VM
    // runs in bimodal speed windows (70-75 s vs 87-102 s totals with
    // the guest idle, round 10), which previously forced inferring the
    // host factor after the fact from untouched queries; `calib_sec`
    // makes it a measurement: compare against the baseline's calib_sec
    // and normalize totals by the ratio before concluding a regression.
    def calibOnce(): Double = {
      import org.apache.spark.sql.functions.{col, shiftright, sum, xxhash64}
      val t0 = System.nanoTime()
      // shift to 32 bits before summing: 256M full-range 64-bit hashes
      // would overflow the ANSI Long SUM; shifted, 2^28 x 2^32 = 2^60 < 2^63
      spark.range(0, 256L * 1000 * 1000, 1, 8)
        .select(sum(shiftright(xxhash64(col("id")), 32)))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // I/O-shaped probe: write + read a fixed ~50 MB parquet through the
    // page cache. The round-11 anomaly showed the pure-CPU probe alone
    // can point the WRONG way (CPU 1.56x faster while the suite ran
    // 1.17x slower): a host can be CPU-fast and I/O-slow, and most of
    // the suite is scan-bound. Two probe axes make that distinguishable.
    def ioCalibOnce(): Double = {
      import org.apache.spark.sql.functions.{col, shiftright, sum, xxhash64}
      val dir = java.nio.file.Files.createTempDirectory("graft_iocalib").toString
      val t0 = System.nanoTime()
      spark.range(0, 4L * 1000 * 1000, 1, 8)
        .select(col("id"), xxhash64(col("id")).as("h"),
          col("id").cast("string").as("s"))
        .write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
        // shift before summing — raw 64-bit hashes overflow an ANSI SUM
        .select(sum(shiftright(col("h"), 32)))
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      def rmr(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rmr)); f.delete(); ()
      }
      try rmr(new java.io.File(dir)) catch { case _: Throwable => () }
      sec
    }
    def calib3(f: () => Double): Double = Seq(f(), f(), f()).sorted.apply(1)
    // BRACKET the suite: one calibration at start, one at end (round-11's
    // single start-of-run sample could not see load arriving mid-suite).
    // The MIN of the two is the host's demonstrated capability; a large
    // pre/post spread flags a drifting host (see BASELINE.md for the
    // interpretation rule).
    val calibPre   = { calibOnce(); calib3(calibOnce) }
    val ioCalibPre = calib3(ioCalibOnce)
    // Per-query BEST-OF-2 inside the one invocation: a single-query
    // warm-up warms the JVM but not a cold page cache, and the round-3
    // driver run (cold VM) showed the allocation-heavy text pipelines
    // at 5-34x their warmed medians for exactly that reason. The first
    // run of each query warms precisely the inputs/code paths that
    // query needs; the kept time is the better of the two — the
    // steady-state per-query cost, which is what the committed
    // median-of-3 baseline measures too.
    // A failed query must SURFACE (an "err" entry), never bench as
    // ~0 s and silently improve the total.
    def timed(name: String): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err: Option[String] =
        try { exec(name); None }
        catch { case t: Throwable => Some(t.toString.replaceAll("[\"\\\\\n\r]", " ").take(200)) }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    // optional arg: regex filtering query names — dev-side scale probes
    // over a subset (the driver passes no args and benches everything)
    val nameFilter = args.headOption.map(_.r)
    val selected = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => nameFilter.forall(_.findFirstIn(n).isDefined))
    val results = selected.map { name =>
      val (t1, e1) = timed(name)
      if (e1.isDefined) (name, t1, e1)
      else {
        val (t2, e2) = timed(name)
        // a second-run failure surfaces too, carrying ONLY the failing
        // run's time — min() across a success and a failure would record
        // a valid-looking duration on an entry marked as an error
        if (e2.isDefined) (name, t2, e2)
        else (name, math.min(t1, t2), None)
      }
    }
    val qs = results.map { case (k, v, err) =>
      "\"" + k + "\":" + err.fold(v.toString)(e => s"""{"sec":$v,"err":"$e"}""")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val nErr = results.count(_._3.isDefined)
    val errField = if (nErr > 0) s""","errors":$nErr""" else ""
    val calibPost   = calib3(calibOnce)
    val ioCalibPost = calib3(ioCalibOnce)
    // calib_sec keeps its r11 meaning (one CPU number to normalize by)
    // as the MIN of the bracket — the host's demonstrated capability
    val calibSec   = math.min(calibPre, calibPost)
    val ioCalibSec = math.min(ioCalibPre, ioCalibPost)
    val calibFields =
      f""""calib_sec":$calibSec%.4f,"calib_sec_pre":$calibPre%.4f,""" +
        f""""calib_sec_post":$calibPost%.4f,"io_calib_sec":$ioCalibSec%.4f,""" +
        f""""io_calib_sec_pre":$ioCalibPre%.4f,"io_calib_sec_post":$ioCalibPost%.4f"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec",$calibFields,"queries":$qs,"sf":"$sfDir"$errField}"""
    // sidecar copy for machine consumption (sbt decorates stdout with
    // an [info] prefix that a strict JSON parse of the output trips on)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LAST.json"), line)
    catch { case _: Throwable => () }
    spark.stop()
    // print after shutdown: Spark logs go to stderr, so the JSON lines
    // are the final stdout lines for last-line parsers
    println(line)
    // The driver parses the FINAL stdout line as the bench result, so it
    // must be complete: per-query seconds go INLINE here (rounded to 0.1 ms
    // to keep the line ~3 KB — BENCH_r07 showed a log tail window can
    // truncate a much longer line), not behind a queries_file pointer that
    // left PERF_r10-r15 with an empty per_query map. Full-precision values
    // stay on the long line above and in BENCH_LAST.json.
    val qsShort = results.map { case (k, v, err) =>
      "\"" + k + "\":" + err.fold(f"$v%.4f")(e => f"""{"sec":$v%.4f,"err":"$e"}""")
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","total_sec":$total,$calibFields,"n_queries":${results.size},"errors":$nErr,"queries":$qsShort}""")
  }
}
