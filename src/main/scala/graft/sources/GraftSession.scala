package graft.sources

import org.apache.spark.sql.SparkSession

/** One place for the engine's session configuration, so the CLI, the
  * driver-contract mains, and tests agree on semantics-critical
  * settings (UTC session time zone, nanos-as-long parquet reads) and
  * scale settings (AQE incl. skew-join handling, right-sized shuffle
  * partitions — never the 200 default in local mode).
  */
object GraftSession {

  def builder(appName: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosAsLong, "true")
      .config("spark.ui.enabled", "false")

  /** Cores from the driver's env contract (SPARK_GRAFT_CPUS). */
  def envCores: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt

  def create(appName: String): SparkSession = {
    val s = builder(appName, envCores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
