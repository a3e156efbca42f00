package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{jaccard, lshBandKeys}
import graft.functions.expressions.TextHashFunctions._

/** Persisted MinHash signature index for INCREMENTAL near-duplicate
  * detection — the per-period dedup path a chunk-loaded corpus needs:
  * each new batch (an IBTP period of documents) is checked against
  * everything indexed so far WITHOUT touching the historical text.
  *
  * Scale shape: the index stores (id, shingles, sig) — signature-sized
  * rows (~1 KB/doc), not documents. A batch of n docs against a corpus
  * of N generates candidates via a band-key join whose left side is
  * only the batch's n×bands 16-byte keys; the N-sized index side is
  * read filtered to matching band hashes. Exact-Jaccard verification
  * pulls shingle sets for candidate ids only (semi-join on the index).
  * Batch work scales with n + matches, never with N² — the property
  * that makes per-period dedup sustainable at 100 TB.
  *
  * The same hot-bucket guard as [[Dedup.minhashNearDupPairs]] applies:
  * identical batch texts collapse to a representative, and band buckets
  * wider than `maxBucket` (measured over index ∪ batch) are skipped.
  */
final class SignatureIndex(
    val spark: SparkSession,
    val path: String,
    val shingleN: Int = 3,
    val bands: Int = 16,
    val rowsPerBand: Int = 4) {

  private def sigPath = s"$path/sigs"

  def exists: Boolean =
    new org.apache.hadoop.fs.Path(sigPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(sigPath))

  /** The stored signatures (id, shingles, sig). */
  def read(): DataFrame = spark.read.parquet(sigPath)

  private def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("id"),
      shingle_hashes(col(textCol), shingleN).as("shingles"),
      minhash_sig(col(textCol), shingleN, bands * rowsPerBand).as("sig"))
      .filter(size(col("shingles")) > 0)

  private def bandKeysOf(sigs: DataFrame): DataFrame =
    sigs.select(col("id"), explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))

  /** Index a batch without dedup (bootstrap). */
  def append(docs: DataFrame, idCol: String, textCol: String): Unit =
    signatures(docs, idCol, textCol)
      .write.mode("append").parquet(sigPath)

  /** Near-dup pairs of `newDocs` against the index AND within the
    * batch, then the batch joins the index. Returns (id_a, id_b,
    * jaccard) with id_a < id_b; exactly one side of every cross pair is
    * a batch id.
    */
  def dedupAndAppend(
      newDocs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, maxBucket: Int = 256): DataFrame = {
    // collapse identical batch texts to one representative (min id):
    // 16-byte digest aggregate + keep-id semi-join — the text payload
    // never shuffles (see Dedup.contentRepresentatives)
    val keep = newDocs
      .groupBy(struct(xxhash64(col(textCol)), length(col(textCol))).as("__ck"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__ck")
    val reps = newDocs.join(keep, Seq(idCol), "left_semi")
    val newSigs = reps
      .transform(signatures(_, idCol, textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newKeys = bandKeysOf(newSigs).withColumn("is_new", lit(true))
    val allKeys =
      if (!exists) newKeys
      else newKeys.unionAll(bandKeysOf(read()).withColumn("is_new", lit(false)))
    // hot-bucket cap over index ∪ batch (same partitioning as the join)
    val wB = Window.partitionBy(col("band"), col("band_hash"))
    val capped = allKeys.withColumn("__bsz", count(lit(1)).over(wB))
      .filter(col("__bsz") <= maxBucket).drop("__bsz")
    val newSide = capped.filter(col("is_new"))
      .select(col("id").as("id_n"), col("band"), col("band_hash"))
    val candidates = newSide
      .join(capped.select(col("id").as("id_x"), col("band"), col("band_hash"),
        col("is_new").as("x_new")), Seq("band", "band_hash"))
      // within-batch pairs once (id_n < id_x); cross pairs always
      .filter(!col("x_new") || col("id_n") < col("id_x"))
      .filter(col("id_n") =!= col("id_x"))
      .select(least(col("id_n"), col("id_x")).as("id_a"),
        greatest(col("id_n"), col("id_x")).as("id_b"))
      .distinct()
    val allSigs = if (!exists) newSigs else newSigs.unionAll(read())
    val pairs = candidates
      .join(allSigs.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(allSigs.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    // materialize pairs BEFORE the index grows (the pair frame must not
    // see the batch twice), as an eager local checkpoint rather than a
    // session-lifetime persist — the blocks free when the frame is
    // garbage-collected, leaving the cache manager clean per batch
    val out = pairs.localCheckpoint(true)
    newSigs.write.mode("append").parquet(sigPath)
    newSigs.unpersist(blocking = false)
    out
  }
}
