package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.expressions.CentroidMatrix

/** Persisted product-quantization index — the storage half q95's
  * per-query [[Pq.adcTopK]] lacks: codebooks train ONCE (at [[create]])
  * and freeze; every later batch encodes against them and appends only
  * its (vec_id, codes) rows, so indexing a new period of embeddings is
  * one codegen'd map pass over that period — the [[SignatureIndex]]
  * pattern applied to dense retrieval. Searches read codes + codebooks
  * only: at m=8 that is ~8 bytes per indexed vector, which is what
  * makes a 100 TB embedding store memory-searchable.
  *
  * Freezing the codebooks at creation is the standard PQ deployment
  * contract (FAISS trains on a sample, then `add()`s forever):
  * retraining would invalidate every stored code. Train [[create]] on a
  * representative first batch.
  *
  * Determinism: training/encoding/search reuse [[Pq]]'s
  * bit-reproducible arithmetic unchanged, so an incrementally-built
  * index answers BIT-IDENTICALLY to a one-shot build over the same
  * rows (spec-pinned) and stays DuckDB-oracle-able.
  */
final class PqIndex(
    val spark: SparkSession,
    val path: String,
    val m: Int,
    val k: Int,
    val maxIters: Int = 1) {

  private def booksPath = s"$path/codebooks"
  private def codesPath = s"$path/codes"

  def exists: Boolean =
    new org.apache.hadoop.fs.Path(booksPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(booksPath))

  /** Stored codebooks as one frame: (s, centroid_id, embedding). */
  def readCodebooks(): DataFrame = spark.read.parquet(booksPath)

  /** Stored codes: (vec_id, codes). */
  def readCodes(): DataFrame = spark.read.parquet(codesPath)

  private def booksSeq(): Seq[DataFrame] = {
    val all = readCodebooks()
    (0 until m).map(s => all.filter(col("s") === s)
      .select(col("centroid_id"), col("embedding")))
  }

  /** Vector dimensionality, from the stored codebooks (m · sub). */
  def dim(): Int =
    readCodebooks().select(size(col("embedding"))).head.getInt(0) * m

  /** Train the frozen codebooks on `corpus` and index it. */
  def create(
      corpus: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    require(!exists, s"PqIndex at $path already exists — use append")
    val d = corpus.select(size(col(vecCol))).head.getInt(0)
    val books = Pq.trainCodebooks(corpus, d, m, k, maxIters, idCol, vecCol)
    books.zipWithIndex.map { case (b, s) =>
      b.select(lit(s).as("s"), col("centroid_id"), col(vecCol).as("embedding"))
    }.reduce(_ unionAll _)
      .coalesce(1) // m·k control-plane rows — one tiny file
      .write.mode("error").parquet(booksPath)
    appendCodes(corpus, d, idCol, vecCol)
  }

  /** Encode a new batch against the frozen codebooks and append its
    * codes — one map pass over the batch, nothing rewrites. Ids must be
    * new (re-adding an id indexes it twice, like [[SignatureIndex]]).
    */
  def append(
      batch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    require(exists, s"PqIndex at $path does not exist — use create")
    appendCodes(batch, dim(), idCol, vecCol)
  }

  private def appendCodes(
      batch: DataFrame, d: Int, idCol: String, vecCol: String): Unit = {
    val mats = booksSeq().map(b => CentroidMatrix.fromDataFrame(b, "embedding"))
    Pq.encode(batch, mats, d, idCol, vecCol)
      .select(col(idCol).as("vec_id"), col("codes"))
      .write.mode("append").parquet(codesPath)
  }

  /** ADC top-k over everything indexed so far — codes + codebooks only,
    * the original vectors never load.
    */
  def search(
      queries: DataFrame, topK: Int,
      vecCol: String = "embedding", queryIdCol: String = "query_id"): DataFrame =
    Pq.adcSearch(readCodes(), booksSeq(),
      queries.select(col(queryIdCol), col(vecCol).as("embedding")),
      dim(), topK, "vec_id", "embedding", queryIdCol)
}
