package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet readers for the test star schema + extension tables.
  *
  * `events.ts` is parquet TIMESTAMP(MICROS, isAdjustedToUTC=0).
  * [[GraftSession]] disables `inferTimestampNTZ`, so under the UTC
  * session contract it reads directly as a micro-precision
  * TimestampType (value-identical to the NTZ interpretation — same
  * wall-clock field values, and DuckDB's `CAST(ts AS TIMESTAMP)`
  * agrees bit-for-bit). Two legacy encodings are still normalized
  * here for sessions built elsewhere: TIMESTAMP(NANOS) read via
  * `spark.sql.legacy.parquet.nanosAsLong=true` (arrives as LongType
  * nanos → truncated to micros, matching DuckDB), and a residual
  * TIMESTAMP_NTZ column (cast to TimestampType — value-preserving
  * when the session time zone is UTC).
  */
object Tables {

  /** Session config required to read nanosecond-timestamp parquet. */
  val NanosAsLong = "spark.sql.legacy.parquet.nanosAsLong"

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // normalize any legacy-encoded timestamp columns back to TimestampType
    if (name == "events") normalizeTimestamp(df, "ts") else df
  }

  private def normalizeTimestamp(df: DataFrame, colName: String): DataFrame =
    df.schema.find(_.name == colName).map(_.dataType) match {
      case Some(LongType) =>
        // nanos-as-long: integer `div`, NOT floor(x/1000) — long/long is
        // double division in Spark and ns-since-epoch exceeds 2^53, so
        // the double path is off by up to 1 µs
        df.withColumn(colName, timestamp_micros(expr(s"`$colName` div 1000")))
      case Some(TimestampNTZType) =>
        // session TZ is UTC ⇒ NTZ → LTZ cast is value-preserving
        df.withColumn(colName, col(colName).cast(TimestampType))
      case _ => df
    }

  def events(spark: SparkSession, sfDir: String): DataFrame    = read(spark, sfDir, "events")

  /** Range-restricted events read with parquet pushdown — the
    * difference between scanning one period and scanning 100 TB per
    * period. With `ts` decoded straight to TimestampType (the current
    * MICROS encoding under [[GraftSession]]), a plain half-open
    * timestamp-literal filter on the raw scan reaches the parquet
    * reader and prunes row groups via column stats (pinned in
    * PlanSpec). The legacy nanos-as-long encoding needs the predicate
    * re-expressed in raw nanos BEFORE normalization (a filter above
    * `timestamp_micros(ts div 1000)` can never reach the scan); day
    * bounds are exact in both units so the rewrite is lossless.
    */
  def eventsRange(
      spark: SparkSession, sfDir: String,
      from: java.time.LocalDate, to: java.time.LocalDate): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        def nanos(d: java.time.LocalDate): Long =
          d.toEpochDay * 86400L * 1000000000L
        normalizeTimestamp(
          raw.filter(col("ts") >= nanos(from) && col("ts") < nanos(to)), "ts")
      case None =>
        import java.sql.Date
        normalizeTimestamp(
          raw.filter(col("ts") >= lit(Date.valueOf(from)) && col("ts") < lit(Date.valueOf(to))), "ts")
    }
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = read(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = read(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = read(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = read(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = read(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = read(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame    = read(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = read(spark, sfDir, "embeddings")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view (for SqlModel / spark.sql use). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => read(spark, sfDir, n).createOrReplaceTempView(n))
}
