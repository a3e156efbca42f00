package graft.sources

import org.apache.spark.sql.SparkSession

/** One place for the engine's session configuration, so the CLI, the
  * driver-contract mains, and tests agree on semantics-critical
  * settings (UTC session time zone, timestamp parquet decoding) and
  * scale settings (AQE incl. skew-join handling, right-sized shuffle
  * partitions — never the 200 default in local mode).
  *
  * Timestamp decoding: `events.ts` is parquet TIMESTAMP(MICROS,
  * isAdjustedToUTC=0). With `inferTimestampNTZ` left on, Spark 4.x
  * surfaces that as TIMESTAMP_NTZ, which rejects `unix_micros` and
  * serializes CSV/JSON at millis precision. Under this session's UTC
  * time-zone contract NTZ and LTZ are value-identical, so we disable
  * the inference and read it as plain TIMESTAMP everywhere. The
  * legacy `nanosAsLong` flag stays on for older TIMESTAMP(NANOS)
  * datasets (those arrive as LongType and are normalized in
  * [[Tables.read]]).
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
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")

  /** Cores from the driver's env contract (SPARK_GRAFT_CPUS). */
  def envCores: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt

  def create(appName: String): SparkSession = {
    val s = builder(appName, envCores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
