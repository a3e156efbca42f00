package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{dot, normSq}
import graft.functions.expressions.{CentroidMatrix, VectorExprFunctions}

/** Product quantization for embedding search (Jégou, Douze, Schmid
  * 2011, "Product Quantization for Nearest Neighbor Search") — the
  * compression half of the FAISS-style IVF-PQ stack this engine's ANN
  * suite otherwise covers (brute force q24, hyperplane LSH q25, IVF
  * q26/q32, k-means training q36): each vector splits into `m`
  * contiguous subvectors, each subspace trains its own small codebook
  * (k centroids via the bit-reproducible [[KMeans]]), and a vector is
  * stored as `m` small codes — at m=8, k=256 a 1024-dim float vector
  * compresses 512× to 8 bytes, which is what makes a 100 TB embedding
  * store searchable from memory at all.
  *
  * Search is ADC (asymmetric distance computation): the query stays
  * exact; per subspace a k-entry table of query-to-centroid squared
  * distances is precomputed, and a vector's approximate distance is the
  * sum of `m` table lookups — no decompression, no per-vector float
  * math.
  *
  * Scale shape:
  *  - codebook training is [[KMeans]] per subspace — corpus-sized map
  *    passes, centroid-sized shuffles, k·dim control-plane collects;
  *  - encoding is ONE map pass: `m` [[VectorExprFunctions.nearest_centroid]]
  *    calls (codegen'd, codebooks as reference objects), no join, no
  *    shuffle;
  *  - the distance tables are queries × m × k rows (control-plane by
  *    the same contract as the codebooks) and BROADCAST; scoring is
  *    row-local table lookups, and only the bounded-heap top-k's
  *    ≤ k-rows-per-query-per-partition partials reach the exchange —
  *    the corpus never shuffles.
  *
  * Determinism: training inherits [[KMeans]]'s DECIMAL-quantized
  * bit-reproducibility; assignment and table entries use the same
  * `‖a‖² + ‖b‖² − 2a·b` left-fold arithmetic as the IVF operators; the
  * ADC sum folds subspaces in index order — so the whole pipeline is
  * bit-stable and hard-oracle-able (`ExtensionQueries.pqSearchSql`
  * replays it in DuckDB).
  */
object Pq {

  /** Per-subspace codebooks: slice the corpus into `m` contiguous
    * subvectors and [[KMeans.fit]] each — element `s` of the result is
    * subspace s's (centroid_id, vecCol) frame. `dim` is the full vector
    * dimensionality (must divide evenly by `m`).
    */
  def trainCodebooks(
      corpus: DataFrame, dim: Int, m: Int, k: Int, maxIters: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[DataFrame] = {
    val spark = corpus.sparkSession
    trainCodebookMats(corpus, dim, m, k, maxIters, idCol, vecCol)
      .map(mat => booksDfOfMat(spark, mat, vecCol))
  }

  /** [[trainCodebooks]] returning the collected matrices directly —
    * the form every consumer (encode, ADC tables) actually needs, with
    * no DataFrame round-trip and no per-subspace collect jobs. Trains
    * fused: one seed job + one Lloyd job per iteration for ALL m
    * subspaces ([[KMeans.fitSubspaces]]) instead of 2 jobs × m — at
    * 100 TB that is one corpus pass per iteration instead of m.
    */
  def trainCodebookMats(
      corpus: DataFrame, dim: Int, m: Int, k: Int, maxIters: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): IndexedSeq[CentroidMatrix] =
    KMeans.fitSubspaces(corpus, dim, m, k, maxIters, idCol, vecCol)

  /** One subspace's (centroid_id, vecCol) frame from its matrix — the
    * [[KMeans.fit]] output shape, identical values (the matrix holds
    * the exact trained doubles).
    */
  private def booksDfOfMat(
      spark: org.apache.spark.sql.SparkSession, mat: CentroidMatrix,
      vecCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until mat.k).toIndexedSeq.map { c =>
          Row(mat.ids(c),
            java.util.Arrays.copyOfRange(mat.flat, c * mat.dim, (c + 1) * mat.dim)
              .toIndexedSeq)
        }, 1),
      StructType(Seq(
        StructField("centroid_id", LongType, nullable = false),
        StructField(vecCol, ArrayType(DoubleType, containsNull = false)))))
  }

  /** All subspaces' centroids as one (s, cid, cv) frame from the
    * matrices — [[adcTables]]'s union shape without re-reading or
    * re-collecting anything.
    */
  private def booksUOfMats(
      spark: org.apache.spark.sql.SparkSession,
      mats: Seq[CentroidMatrix]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = mats.zipWithIndex.flatMap { case (mat, s) =>
      (0 until mat.k).map { c =>
        Row(s, mat.ids(c),
          java.util.Arrays.copyOfRange(mat.flat, c * mat.dim, (c + 1) * mat.dim)
            .toIndexedSeq)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
      StructType(Seq(
        StructField("s", IntegerType, nullable = false),
        StructField("cid", LongType, nullable = false),
        StructField("cv", ArrayType(DoubleType, containsNull = false),
          nullable = false))))
  }

  /** PQ-encode the corpus: (idCol, codes) where `codes(s)` is the id of
    * subspace s's nearest centroid. One codegen'd map pass — the
    * codebooks ride as reference objects ([[CentroidMatrix]]), exactly
    * like IVF assignment; nothing shuffles.
    */
  def encode(
      corpus: DataFrame, codebooks: Seq[CentroidMatrix], dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = codebooks.size
    val sub = dim / m
    corpus.select(col(idCol),
      array(codebooks.zipWithIndex.map { case (mat, s) =>
        VectorExprFunctions
          .nearest_centroid(slice(col(vecCol), s * sub + 1, sub), mat)
          .getField("centroid_id")
      }: _*).as("codes"))
  }

  /** The TRAINED codebook size — never the requested k: a corpus
    * smaller than k yields fewer centroids (KMeans seeds from the k
    * lowest ids), and flat-indexing the distance tables by the
    * requested k would read wrong entries. Every subspace trains on
    * the same rows, so sizes must agree.
    */
  private def trainedK(mats: Seq[CentroidMatrix]): Int = {
    val kAct = mats.head.k
    require(mats.forall(_.k == kAct),
      s"ragged PQ codebooks: ${mats.map(_.k).mkString(",")}")
    kAct
  }

  /** Per-query ADC distance tables, built with the SAME proven fold
    * arithmetic the assignment uses: queries × m × kAct rows — tiny,
    * broadcast. Flat index s*kAct + cid so the lookup is one
    * element_at; array_sort on the (unique) index makes the
    * collect_list order irrelevant.
    */
  private def adcTables(
      books: Seq[DataFrame], queries: DataFrame, sub: Int, kAct: Int,
      vecCol: String, queryIdCol: String): DataFrame = {
    val booksU = books.zipWithIndex.map { case (b, s) =>
      b.select(lit(s).as("s"), col("centroid_id").as("cid"), col(vecCol).as("cv"))
    }.reduce(_ unionAll _)
    adcTablesU(booksU, books.size, queries, sub, kAct, vecCol, queryIdCol)
  }

  /** [[adcTables]] over an already-assembled (s, cid, cv) centroid
    * frame — shared by the DataFrame path above and the matrix path
    * ([[booksUOfMats]]), identical arithmetic.
    */
  private def adcTablesU(
      booksU: DataFrame, m: Int, queries: DataFrame, sub: Int, kAct: Int,
      vecCol: String, queryIdCol: String): DataFrame = {
    val qsub = queries.select(col(queryIdCol), posexplode(expr(
      s"transform(sequence(0, ${m - 1}), s -> slice($vecCol, s * $sub + 1, $sub))"))
      .as(Seq("s", "qv")))
    qsub.join(broadcast(booksU), Seq("s"))
      .select(col(queryIdCol), (col("s") * kAct + col("cid")).as("i"),
        (normSq(col("qv")) + normSq(col("cv"))
          - lit(2.0) * dot(col("qv"), col("cv"))).as("d2"))
      .groupBy(col(queryIdCol))
      .agg(array_sort(collect_list(struct(col("i"), col("d2")))).as("ent"))
      .select(col(queryIdCol), expr("transform(ent, x -> x.d2)").as("tbl"))
  }

  /** Rank `withTables` — (queryIdCol, idCol, codes, tbl) rows — by the
    * summed table lookups: row-local, folded in subspace order (fixed
    * association, bit-stable); only the heap partials shuffle.
    */
  private def adcRank(
      withTables: DataFrame, m: Int, kAct: Int, topK: Int,
      idCol: String, queryIdCol: String): DataFrame = {
    val scored = withTables
      .filter(col(idCol) =!= col(queryIdCol))
      .select(col(queryIdCol), col(idCol),
        expr(s"aggregate(sequence(0, ${m - 1}), 0D, " +
          s"(acc, s) -> acc + tbl[s * $kAct + int(codes[s])])").as("adist2"))
    CorpusStats.topKPerGroup(
      scored.withColumn("__neg", -col("adist2")), queryIdCol, idCol, "__neg", topK)
      // +0.0 folds a possible -0.0 (tiny-negative float sums rounded
      // up) onto the oracle's zero
      .select(col(queryIdCol), col(idCol),
        (round(-col("score"), 6) + lit(0.0)).as("adist2"), col("rank"))
  }

  /** ADC search over an ALREADY-ENCODED corpus — the read half
    * [[PqIndex]] serves from storage: codes (idCol, codes) score
    * against each query\'s broadcast distance tables; the full vectors
    * never load. `books` are the (centroid_id, vecCol) frames the codes
    * were encoded with, per subspace.
    */
  def adcSearch(
      codes: DataFrame, books: Seq[DataFrame], queries: DataFrame,
      dim: Int, topK: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    val m = books.size
    val mats = books.map(b => CentroidMatrix.fromDataFrame(b, vecCol))
    val kAct = trainedK(mats)
    val qtables = adcTables(books, queries, dim / m, kAct, vecCol, queryIdCol)
    adcRank(codes.crossJoin(broadcast(qtables)), m, kAct, topK, idCol, queryIdCol)
  }

  /** [[adcSearch]] fed by the collected matrices — no per-subspace
    * collect jobs and no codebook re-read: the (s, cid, cv) table the
    * distance tables join against is rebuilt locally from the exact
    * trained doubles ([[booksUOfMats]]), so results are bit-identical.
    */
  def adcSearchMats(
      codes: DataFrame, mats: Seq[CentroidMatrix], queries: DataFrame,
      dim: Int, topK: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    val m = mats.size
    val kAct = trainedK(mats)
    val qtables = adcTablesU(booksUOfMats(queries.sparkSession, mats),
      m, queries, dim / m, kAct, vecCol, queryIdCol)
    adcRank(codes.crossJoin(broadcast(qtables)), m, kAct, topK, idCol, queryIdCol)
  }

  /** ADC top-k: train per-subspace codebooks, encode the corpus,
    * precompute each query\'s m×k distance tables, and rank by the
    * summed table lookups. Returns (queryIdCol, idCol, adist2, rank) —
    * approximate squared L2 distance, ascending, ties by id.
    * Self-matches (same id on both sides) are excluded, like the other
    * ANN operators.
    */
  def adcTopK(
      corpus: DataFrame, queries: DataFrame, m: Int, k: Int, topK: Int,
      maxIters: Int = 1, idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    // one control-plane probe for the dimensionality (like the
    // codebook collects, bounded by the vector contract)
    val dim = corpus.select(size(col(vecCol))).head.getInt(0)
    val mats = trainCodebookMats(corpus, dim, m, k, maxIters, idCol, vecCol)
    val codes = encode(corpus, mats, dim, idCol, vecCol)
    adcSearchMats(codes, mats, queries, dim, topK, idCol, vecCol, queryIdCol)
  }

  /** FAISS-style IVF-PQ (Jégou et al. 2011 §V): an IVF coarse quantizer
    * bounds the SCORED set — each query probes its `nProbe` nearest
    * coarse cells and ADC-scores only the vectors assigned there — and
    * PQ bounds the BYTES per scored vector. q26/q32\'s IVF and q95\'s
    * PQ, composed: at 100 TB neither alone suffices (full-corpus ADC
    * still touches every code; uncompressed IVF lists still read full
    * vectors).
    *
    * Scale shape: ONE codegen\'d map pass assigns each vector its
    * coarse list and its m codes together (coarse matrix and codebooks
    * ride as reference objects — no join); the probe set (queries ×
    * nProbe) and the distance tables broadcast; candidate selection is
    * a broadcast equi-join on list_id, so scored rows ∝ Σ probed-list
    * sizes — never corpus size; only bounded-heap partials shuffle.
    *
    * Variant note: codes quantize the RAW vectors (FAISS
    * `by_residual=false`), keeping every stage on the proven
    * bit-reproducible arithmetic — the residual variant would need a
    * subtraction between two quantizations threaded through every
    * oracle CTE.
    */
  def ivfAdcTopK(
      corpus: DataFrame, queries: DataFrame, coarse: DataFrame,
      nProbe: Int, m: Int, k: Int, topK: Int, maxIters: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    require(nProbe > 0, "nProbe must be positive")
    val dim = corpus.select(size(col(vecCol))).head.getInt(0)
    val mats = trainCodebookMats(corpus, dim, m, k, maxIters, idCol, vecCol)
    val encoded = encodeWithList(corpus,
      CentroidMatrix.fromDataFrame(
        coarse.select(col("centroid_id"), col(vecCol)), vecCol),
      mats, dim, idCol, vecCol)
    ivfAdcSearchMats(encoded, mats, coarse, queries, dim, nProbe, topK,
      idCol, vecCol, queryIdCol)
  }

  /** List assignment AND the m codes in ONE codegen'd map pass — no
    * corpus join: (idCol, list_id, codes). The encode half
    * [[PqIndex.append]] runs per batch against FROZEN coarse centroids
    * and codebooks.
    */
  def encodeWithList(
      corpus: DataFrame, coarseMat: CentroidMatrix, codebooks: Seq[CentroidMatrix],
      dim: Int, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val m = codebooks.size
    val sub = dim / m
    corpus.select(col(idCol),
      VectorExprFunctions.nearest_centroid(col(vecCol), coarseMat)
        .getField("centroid_id").as("list_id"),
      array(codebooks.zipWithIndex.map { case (mat, s) =>
        VectorExprFunctions
          .nearest_centroid(slice(col(vecCol), s * sub + 1, sub), mat)
          .getField("centroid_id")
      }: _*).as("codes"))
  }

  /** Each query's nProbe nearest coarse cells: (queryIdCol, list_id).
    * queries × centroids is broadcast-small by contract (the q32 probe
    * shape).
    */
  private def probesOf(
      queries: DataFrame, coarse: DataFrame, nProbe: Int,
      vecCol: String, queryIdCol: String): DataFrame = {
    val qScored = queries
      .select(col(queryIdCol), col(vecCol).as("q_vec"))
      .join(broadcast(coarse.select(col("centroid_id"), col(vecCol).as("c_vec"))))
      .withColumn("dist2",
        normSq(col("q_vec")) + normSq(col("c_vec"))
          - lit(2.0) * dot(col("q_vec"), col("c_vec")))
    val wq = org.apache.spark.sql.expressions.Window.partitionBy(col(queryIdCol))
      .orderBy(col("dist2").asc, col("centroid_id").asc)
    qScored.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col(queryIdCol), col("centroid_id").as("list_id"))
  }

  /** IVF-PQ search over an ALREADY-ENCODED corpus — the read half
    * [[PqIndex.searchIvf]] serves from storage: `encoded` is
    * (idCol, list_id, codes); candidates come from a broadcast
    * equi-join on the probed lists, so scored rows ∝ Σ probed-list
    * sizes — never corpus size; the full vectors never load.
    */
  def ivfAdcSearch(
      encoded: DataFrame, books: Seq[DataFrame], coarse: DataFrame,
      queries: DataFrame, dim: Int, nProbe: Int, topK: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    require(nProbe > 0, "nProbe must be positive")
    val m = books.size
    val mats = books.map(b => CentroidMatrix.fromDataFrame(b, vecCol))
    val kAct = trainedK(mats)
    val probes = probesOf(queries, coarse, nProbe, vecCol, queryIdCol)
    val qtables = adcTables(books, queries, dim / m, kAct, vecCol, queryIdCol)
    // candidates: codes in probed lists only — broadcast equi-join, so
    // the scored set is Σ probed-list sizes, not the corpus
    val candidates = encoded
      .join(broadcast(probes), Seq("list_id"))
      .join(broadcast(qtables), Seq(queryIdCol))
    adcRank(candidates, m, kAct, topK, idCol, queryIdCol)
  }

  /** [[ivfAdcSearch]] fed by the collected codebook matrices — no
    * per-subspace collect jobs and no codebook re-read (bit-identical,
    * see [[adcSearchMats]]); `coarse` stays a caller DataFrame (the
    * probe arithmetic runs on its exact stored values either way).
    */
  def ivfAdcSearchMats(
      encoded: DataFrame, mats: Seq[CentroidMatrix], coarse: DataFrame,
      queries: DataFrame, dim: Int, nProbe: Int, topK: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    require(nProbe > 0, "nProbe must be positive")
    val m = mats.size
    val kAct = trainedK(mats)
    val probes = probesOf(queries, coarse, nProbe, vecCol, queryIdCol)
    val qtables = adcTablesU(booksUOfMats(queries.sparkSession, mats),
      m, queries, dim / m, kAct, vecCol, queryIdCol)
    val candidates = encoded
      .join(broadcast(probes), Seq("list_id"))
      .join(broadcast(qtables), Seq(queryIdCol))
    adcRank(candidates, m, kAct, topK, idCol, queryIdCol)
  }

  /** A (centroid_id, vecCol) frame rebuilt locally from a collected
    * coarse matrix — [[PqIndex.searchIvf]]'s probe input without
    * re-reading the stored coarse parquet (identical doubles).
    */
  def coarseDfOfMat(
      spark: org.apache.spark.sql.SparkSession, mat: CentroidMatrix,
      vecCol: String): DataFrame = booksDfOfMat(spark, mat, vecCol)
}
