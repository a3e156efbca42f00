package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-explicit CSV / JSON-lines readers and writers — the
  * interchange formats around the parquet core. Always pass the
  * schema: inference reads the data twice and can silently flip a
  * column's type between files at scale (a 100 TB listing with one
  * odd file must fail loudly, not re-type the column).
  *
  * Timestamps round-trip as ISO-8601 with microsecond precision
  * (`tsFormat`), matching the engine's µs TimestampType.
  */
object Formats {

  private val tsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", tsFormat)
      // malformed rows fail the job (default PERMISSIVE nulls them out
      // silently — at scale that is data loss, not tolerance)
      .option("mode", "FAILFAST")
      .csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", tsFormat)
      .csv(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", tsFormat)
      .option("mode", "FAILFAST")
      .json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", tsFormat)
      .option("ignoreNullFields", "false")
      .json(path)
}
