package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet readers for the test star schema + extension tables.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS) which Spark's
  * vectorized reader rejects outright; sessions must set
  * `spark.sql.legacy.parquet.nanosAsLong=true`, under which the column
  * arrives as LongType nanos and is normalized here to a micro-precision
  * TimestampType. The floor-division truncation matches DuckDB's
  * `CAST(ts_ns AS TIMESTAMP)` semantics, so oracle comparisons agree.
  */
object Tables {

  /** Session config required to read nanosecond-timestamp parquet. */
  val NanosAsLong = "spark.sql.legacy.parquet.nanosAsLong"

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // normalize any nanos-as-long timestamp columns back to TimestampType
    if (name == "events") normalizeNanos(df, "ts") else df
  }

  private def normalizeNanos(df: DataFrame, colName: String): DataFrame =
    df.schema.find(f => f.name == colName && f.dataType == LongType) match {
      case Some(_) =>
        // integer `div`, NOT floor(x/1000): long/long is double division
        // in Spark and ns-since-epoch exceeds 2^53, so the double path
        // is off by up to 1 µs
        df.withColumn(colName, timestamp_micros(expr(s"`$colName` div 1000")))
      case None => df
    }

  def events(spark: SparkSession, sfDir: String): DataFrame    = read(spark, sfDir, "events")

  /** Range-restricted events read with parquet pushdown. A filter on
    * the NORMALIZED ts column sits above `timestamp_micros(ts div
    * 1000)` and can never reach the scan; this applies the equivalent
    * predicate to the raw nanos column first (the conversion is
    * monotonic, day bounds are exact in both units), so the row-group
    * stats prune at the source — the difference between scanning one
    * period and scanning 100 TB per period.
    */
  def eventsRange(
      spark: SparkSession, sfDir: String,
      from: java.time.LocalDate, to: java.time.LocalDate): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) =>
        def nanos(d: java.time.LocalDate): Long =
          d.toEpochDay * 86400L * 1000000000L
        normalizeNanos(
          raw.filter(col("ts") >= nanos(from) && col("ts") < nanos(to)), "ts")
      case None =>
        import java.sql.Date
        raw.filter(col("ts") >= lit(Date.valueOf(from)) && col("ts") < lit(Date.valueOf(to)))
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
