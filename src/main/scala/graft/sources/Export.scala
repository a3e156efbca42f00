package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data export: globally ordered, evenly sized shards.
  *
  * Trainers stream shards sequentially, so the export contract is
  * (a) a TOTAL order across shard files — shard i's every key sorts
  * before shard i+1's — and (b) shards of roughly equal size.
  * `repartitionByRange` gives both: it samples range boundaries and
  * range-partitions the data (one shuffle), and `sortWithinPartitions`
  * orders rows inside each shard — a full global sort's layout without
  * a single-partition merge anywhere.
  *
  * For deterministic interleaving of heterogeneous sources, order by
  * `Sampling.hashBucket(id)` first: hash order is reproducible and
  * spreads every source uniformly through every shard (a seeded
  * shuffle without an RNG).
  */
object Export {

  /** Write `df` as `numShards` globally ordered parquet files. */
  def sortedShards(df: DataFrame, path: String, numShards: Int,
      orderCols: Seq[String]): Unit = {
    require(numShards > 0, "numShards must be positive")
    val order: Seq[Column] = orderCols.map(col)
    df.repartitionByRange(numShards, order: _*)
      .sortWithinPartitions(order: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Deterministically shuffled export: global order by
    * (hashBucket(id), id) — reproducible, source-interleaved.
    */
  def shuffledShards(df: DataFrame, path: String, numShards: Int,
      idCol: String): Unit = {
    val keyed = df.withColumn("__shuffle_key",
      graft.operators.Sampling.hashBucket(col(idCol)))
    keyed.repartitionByRange(numShards, col("__shuffle_key"), col(idCol))
      .sortWithinPartitions(col("__shuffle_key"), col(idCol))
      .drop("__shuffle_key")
      .write.mode("overwrite").parquet(path)
  }
}
