package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reproducible skew-stress measurement (BASELINE.md's adversarial
  * distribution table): times the minhash near-dup pipeline on the
  * uniform corpus vs a 1000-page near-identical boilerplate flood
  * (hot-bucket cap on trial), and the revenue join on uniform vs
  * hot-key events with and without salting. One JSON line per case.
  *
  * Usage: runMain graft.tools.SkewBench [sfDir]
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.sources.GraftSession.create("graft-skewbench")
    import spark.implicits._

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
      println(f"""{"case":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.2f}""")
    }

    val uniform = graft.queries.ExtensionQueries.corpusWithNearDups(spark, sfDir)
    val flood = (0 until 1000).map(i => (3000000L + i,
      "terms of service apply to all users of this site please read " +
        s"carefully before proceeding with registration page revision $i"))
      .toDF("doc_id", "text")
    def minhash(c: DataFrame, cap: Int) =
      graft.operators.Dedup.minhashNearDupPairs(c, "doc_id", "text",
        shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.5, maxBucket = cap)

    // untimed warmup: JIT + parquet footer caches (same reason Bench
    // warms up — the first pipeline otherwise pays JVM warm-up)
    try minhash(uniform, 256).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    spark.sharedState.cacheManager.clearCache()

    time("minhash_uniform")(minhash(uniform, 256))
    time("minhash_flood_capped")(minhash(uniform.unionAll(flood), 256))
    time("minhash_flood_uncapped")(minhash(uniform.unionAll(flood), Int.MaxValue))

    val events = graft.sources.Tables.events(spark, sfDir)
    val skewed = events.withColumn("user_id",
      when(pmod(col("event_id"), lit(2)) === 0, lit(42L)).otherwise(col("user_id")))
    def dim(ev: DataFrame) = ev.select(col("user_id")).distinct()
      .withColumn("segment", pmod(col("user_id"), lit(10)))
    def revenue(joined: DataFrame) = joined
      .groupBy(col("segment")).agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total"))

    time("join_uniform_plain")(revenue(events.join(dim(events), Seq("user_id"))))
    time("join_hotkey_plain")(revenue(skewed.join(dim(skewed), Seq("user_id"))))
    time("join_hotkey_salted")(revenue(
      graft.operators.Skew.saltedJoin(skewed, dim(skewed), Seq("user_id"), factor = 8)))

    // semantic dedup under an identical-embedding flood: the exact
    // pre-collapse should keep the flooded corpus near the uniform cost
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val centroids = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding"))
    val embFlood = emb.limit(1)
      .crossJoin(spark.range(3000).select((col("id") + 1000000L).as("__new_id")))
      .select(col("__new_id").as("vec_id"), col("embedding"),
        lit(0L).as("label"))
    time("semdedup_uniform")(
      graft.operators.SemDedup.semDedup(emb, centroids, threshold = 0.95))
    time("semdedup_flood_3000_copies")(
      graft.operators.SemDedup.semDedup(
        emb.unionAll(embFlood.select(emb.columns.map(col): _*)),
        centroids, threshold = 0.95))

    spark.stop()
  }
}
