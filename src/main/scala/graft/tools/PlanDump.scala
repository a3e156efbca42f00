package graft.tools

/** Dump `.explain("formatted")` for declared queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the optimization round's plan
  * evidence (before/after pairs per touched query).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> [nameRegex]
  *
  * Building a query's DataFrame executes its control-plane side
  * effects (loop queries materialize their scratch tables at plan-build
  * time), so a full dump costs about one bench pass.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r15")
    val suffix = args.lift(1).getOrElse("before")
    val nameFilter = args.lift(2).map(_.r)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.sources.GraftSession.create("graft-plandump")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val selected = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => nameFilter.forall(_.findFirstIn(n).isDefined))
    selected.foreach { name =>
      spark.sparkContext.setJobDescription(s"plandump: $name")
      val res =
        try {
          val df = graft.SparkEntry.queries(name)(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        } catch { case t: Throwable => s"PLAN FAILED: $t" }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), res)
      spark.sharedState.cacheManager.clearCache()
      println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
