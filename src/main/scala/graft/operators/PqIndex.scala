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
  *
  * Durability ([[IndexStore]], same contract as [[LexicalIndex]]):
  * writers serialize on an owner-token claim; [[create]] publishes
  * codebooks + coarse + codes crash-atomically (a crashed create never
  * leaves codebooks without their create-batch codes), [[append]]
  * publishes each batch's codes the same way, and [[compact]] folds
  * the per-batch code files — a year of daily loop periods otherwise
  * accumulates 365 small file sets under `codes/`.
  */
final class PqIndex(
    val spark: SparkSession,
    val path: String,
    val m: Int,
    val k: Int,
    val maxIters: Int = 1) {

  private val store = new IndexStore(spark, path)

  private def booksPath = s"$path/codebooks"
  private def codesPath = s"$path/codes"
  private def coarsePath = s"$path/coarse"

  private def fs = store.fs

  def exists: Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(booksPath))

  /** Stored codebooks as one frame: (s, centroid_id, embedding). */
  def readCodebooks(): DataFrame = spark.read.parquet(booksPath)

  /** Stored codes: (vec_id, codes) — plus `list_id` when the index was
    * created with a coarse quantizer (the IVF-PQ layout).
    */
  def readCodes(): DataFrame = spark.read.parquet(codesPath)

  /** Whether this index stores a coarse quantizer (IVF-PQ layout). */
  def hasCoarse: Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(coarsePath))

  /** Stored coarse centroids: (centroid_id, embedding). */
  def readCoarse(): DataFrame = spark.read.parquet(coarsePath)

  /** Collected frozen control plane, memoized per instance: the
    * codebooks (and coarse centroids) are IMMUTABLE once [[create]]
    * publishes them — the FAISS deployment contract this class
    * documents — so one collect serves every later append/search this
    * instance performs instead of m filter+collect jobs per call.
    */
  @volatile private var matsCache: Option[IndexedSeq[CentroidMatrix]] = None
  @volatile private var coarseCache: Option[CentroidMatrix] = None

  private def loadMats(): IndexedSeq[CentroidMatrix] = matsCache.getOrElse {
    // ONE job over the single tiny codebooks file, split driver-side
    val rows = readCodebooks()
      .select(col("s").cast("int"), col("centroid_id").cast("long"),
        col("embedding"))
      .collect()
    val bySub = rows.groupBy(_.getInt(0))
    val mats = (0 until m).map { s =>
      CentroidMatrix(bySub.getOrElse(s, throw new IllegalStateException(
        s"PqIndex at $path: stored codebooks miss subspace $s"))
        .toIndexedSeq
        .map(r => (r.getLong(1), r.getSeq[Any](2).map {
          case f: java.lang.Float  => f.toDouble
          case d: java.lang.Double => d.doubleValue
          case x => throw new IllegalStateException(
            s"PqIndex at $path: non-float codebook component $x")
        }.toArray)))
    }
    matsCache = Some(mats)
    mats
  }

  private def loadCoarse(): CentroidMatrix = coarseCache.getOrElse {
    val mat = CentroidMatrix.fromDataFrame(readCoarse(), "embedding")
    coarseCache = Some(mat)
    mat
  }

  /** Vector dimensionality, from the stored codebooks (m · sub). */
  def dim(): Int = loadMats().head.dim * m

  /** Train the frozen codebooks on `corpus` and index it. With
    * `coarse` — (centroid_id, embedding) coarse-quantizer centroids,
    * the q26/q32 shape — the index is IVF-PQ: the centroids freeze in
    * storage alongside the codebooks (re-deriving them would reassign
    * every stored code's list), every code row carries its `list_id`,
    * and [[searchIvf]] probes from storage. This is the only retrieval
    * layout that bounds BOTH bytes per vector (PQ codes) and scored
    * rows (nProbe lists) at 100 TB: flat codes still score the whole
    * corpus per query; uncompressed IVF lists still read full vectors.
    *
    * All components stage first and publish in ONE marker-guarded pass
    * — a crash mid-create leaves either no index or the whole one,
    * never codebooks without their create-batch codes.
    */
  def create(
      corpus: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      coarse: Option[DataFrame] = None): Unit = store.withClaim {
    store.repairAll()
    require(!exists, s"PqIndex at $path already exists — use append")
    val d = corpus.select(size(col(vecCol))).head.getInt(0)
    // fused training: one seed job + one Lloyd job per iteration for
    // all m subspaces, returning the matrices directly
    val mats = Pq.trainCodebookMats(corpus, d, m, k, maxIters, idCol, vecCol)
    val id = java.util.UUID.randomUUID().toString.take(8)
    val stage = store.stagePath(id)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // (s, centroid_id, embedding) rows straight from the matrices —
    // the exact trained doubles, one local write instead of m unions
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        mats.zipWithIndex.flatMap { case (mat, s) =>
          (0 until mat.k).map { c =>
            Row(s, mat.ids(c), java.util.Arrays.copyOfRange(
              mat.flat, c * mat.dim, (c + 1) * mat.dim).toIndexedSeq)
          }
        }, 1),
      StructType(Seq(
        StructField("s", IntegerType, nullable = false),
        StructField("centroid_id", LongType, nullable = false),
        StructField("embedding", ArrayType(DoubleType, containsNull = false),
          nullable = false))))
      .write.parquet(s"$stage/codebooks")
    coarse.foreach(_.select(col("centroid_id"), col("embedding"))
      .coalesce(1) // nlist control-plane rows — one tiny file
      .write.parquet(s"$stage/coarse"))
    // encode against the in-memory training output: CentroidMatrix
    // sorts by centroid_id and parquet round-trips doubles exactly, so
    // this is bit-identical to re-reading the stored books
    val coarseMats = coarse.map(c => CentroidMatrix.fromDataFrame(c, "embedding"))
    writeCodes(s"$stage/codes", corpus, d, idCol, vecCol, mats, coarseMats)
    store.publishStaged(id,
      Seq("codebooks") ++ coarse.map(_ => "coarse").toSeq ++ Seq("codes"))
    // prime the frozen-control-plane cache for this instance's appends
    // and searches (identical to re-reading the published parquet)
    matsCache = Some(mats)
    coarseMats.foreach(cm => coarseCache = Some(cm))
  }

  /** Encode a new batch against the frozen codebooks and append its
    * codes — one map pass over the batch, nothing rewrites, published
    * crash-atomically under the writer claim. Ids must be new
    * (re-adding an id indexes it twice, like [[SignatureIndex]]).
    */
  def append(
      batch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = store.withClaim {
    store.repairAll()
    require(exists, s"PqIndex at $path does not exist — use create")
    val id = java.util.UUID.randomUUID().toString.take(8)
    val stage = store.stagePath(id)
    val mats = loadMats()
    val coarseMats = if (hasCoarse) Some(loadCoarse()) else None
    writeCodes(s"$stage/codes", batch, mats.head.dim * m, idCol, vecCol,
      mats, coarseMats)
    store.publishStaged(id, Seq("codes"))
  }

  private def writeCodes(
      out: String, batch: DataFrame, d: Int, idCol: String, vecCol: String,
      mats: Seq[CentroidMatrix], coarseMats: Option[CentroidMatrix]): Unit = {
    val encoded = coarseMats match {
      case Some(cm) =>
        // ONE map pass assigns the coarse list AND the m codes — the
        // frozen centroids ride as a reference object, no join
        Pq.encodeWithList(batch, cm, mats, d, idCol, vecCol)
          .select(col(idCol).as("vec_id"), col("list_id"), col("codes"))
      case None =>
        Pq.encode(batch, mats, d, idCol, vecCol)
          .select(col(idCol).as("vec_id"), col("codes"))
    }
    encoded.write.parquet(out)
  }

  /** Fold the per-batch code files into `codesFiles` files — the
    * [[LexicalIndex.compact]] analogue: a daily maintenance loop
    * appends one small file set per period forever otherwise. Codes
    * are order-free rows, so search results are BIT-IDENTICAL before
    * and after (spec-pinned). Stage → marker → checked-rename swap,
    * healed by the same [[IndexStore.repairFold]] state machine.
    */
  def compact(codesFiles: Int = 0): Unit = store.withClaim {
    store.repairAll()
    val cf = if (codesFiles > 0) codesFiles
             else spark.sparkContext.defaultParallelism
    store.swapDir("codes", out => readCodes().coalesce(cf).write.parquet(out))
  }

  /** Heal a crashed [[compact]] swap (see [[IndexStore.repairFold]]). */
  private[operators] def repairFold(): Boolean = store.repairFold()

  /** ADC top-k over everything indexed so far — codes + codebooks only,
    * the original vectors never load. Scores EVERY stored code; on an
    * IVF-PQ index prefer [[searchIvf]], which bounds the scored set.
    */
  def search(
      queries: DataFrame, topK: Int,
      vecCol: String = "embedding", queryIdCol: String = "query_id"): DataFrame = {
    store.tryWithClaim(store.repairAll())
    val mats = loadMats()
    Pq.adcSearchMats(readCodes(), mats,
      queries.select(col(queryIdCol), col(vecCol).as("embedding")),
      mats.head.dim * m, topK, "vec_id", "embedding", queryIdCol)
  }

  /** IVF-PQ top-k FROM STORAGE: each query probes its `nProbe` nearest
    * stored coarse cells and ADC-scores only the code rows assigned
    * there (broadcast equi-join on `list_id`) — scored rows ∝
    * Σ probed-list sizes at ~(8 + m) bytes per row, never corpus size,
    * and nothing retrains. Requires the index was created with a
    * coarse quantizer.
    */
  def searchIvf(
      queries: DataFrame, topK: Int, nProbe: Int,
      vecCol: String = "embedding", queryIdCol: String = "query_id"): DataFrame = {
    require(hasCoarse,
      s"PqIndex at $path has no coarse quantizer — create(coarse = ...) " +
        "builds the IVF-PQ layout; search() serves the flat one")
    store.tryWithClaim(store.repairAll())
    val mats = loadMats()
    Pq.ivfAdcSearchMats(readCodes(), mats,
      Pq.coarseDfOfMat(spark, loadCoarse(), "embedding"),
      queries.select(col(queryIdCol), col(vecCol).as("embedding")),
      mats.head.dim * m, nProbe, topK, "vec_id", "embedding", queryIdCol)
  }
}
