package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for co-located joins.
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the
  * join key lets Spark plan the join with ZERO exchanges — each bucket
  * pair joins locally. At 100 TB this converts the nightly
  * fact-to-fact join from a full shuffle of both tables into a
  * bucket-wise merge; the shuffle is paid once at write time and
  * amortized over every subsequent join. Bucket counts should match on
  * both sides (or divide evenly).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (parquet). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int,
      mode: String = "overwrite"): Unit =
    df.write
      .mode(mode)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — planner emits no
    * Exchange when both are bucketed compatibly on `key`.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
