package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKAggregator
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - brute-force cosine top-k — the exact baseline: broadcast the
  *    (small) query set against the corpus, rank per query. One pass
  *    over the corpus, no shuffle of the corpus itself; at 100 TB this
  *    is the map-side of a broadcast join + a per-query top-k
  *    (TakeOrderedAndProject after window pruning).
  *  - random-hyperplane LSH buckets — the scale path: corpus and
  *    queries hash to `planes`-bit buckets; only same-bucket (or
  *    probing-distance) pairs are scored. Corpus bucketing is a pure
  *    map; the join shuffles 8-byte bucket keys, not vectors.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (query_id, vec_id, cosine, rank), rank 1..k.
    * Deterministic tiebreak on vec_id.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    val q = queries.select(col(queryIdCol), col(vecCol).as("q_vec"))
    val scored = corpus
      .select(col(idCol), col(vecCol))
      .join(broadcast(q), col(idCol) =!= col(queryIdCol)) // exclude self
      .withColumn("cosine", cosine(col(vecCol), col("q_vec")))
    groupedTopK(scored, k, idCol, queryIdCol)
  }

  /** Grouped top-k via a bounded-heap Aggregator: map-side partial
    * aggregation caps the shuffle at k rows per (group, map partition),
    * where a Window(row_number) plan would shuffle the full scored set
    * into one partition per group. Ordering: cosine DESC, id ASC.
    */
  private def groupedTopK(
      scored: DataFrame, k: Int, idCol: String, queryIdCol: String): DataFrame = {
    val topk = udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    scored
      .groupBy(col(queryIdCol))
      .agg(topk(col(idCol), col("cosine")).as("topk"))
      .select(col(queryIdCol), posexplode(col("topk")))
      .select(col(queryIdCol), col("col._1").as(idCol),
        round(col("col._2"), 6).as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** All buckets within Hamming distance `probeBits` (0 or 1) of the
    * base bucket — the multi-probe set. Probing rides the SMALL side of
    * the join, so the expansion factor (planes+1 for one flipped bit)
    * multiplies broadcast rows, never the corpus.
    */
  private def probeBuckets(bucket: Column, planes: Int, probeBits: Int): Column = {
    require(probeBits >= 0 && probeBits <= 1, "probeBits supports 0 or 1")
    if (probeBits == 0) array(bucket)
    else array(bucket +: (0 until planes).map(p => bucket.bitwiseXOR(lit(1L << p))): _*)
  }

  /** LSH-bucketed ANN: score only candidates sharing a hyperplane
    * bucket with the query. `probeBits=1` turns on multi-probe — each
    * query also probes the `planes` buckets one sign-flip away, the
    * standard recall/cost dial (a cosine-close vector that disagrees on
    * exactly one near-orthogonal hyperplane is recovered at the price
    * of scanning planes+1 of the 2^planes buckets instead of 1).
    * Returns the same shape as bruteForceTopK; recall < 1 by
    * construction, measured in tests.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 12,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id", probeBits: Int = 0): DataFrame = {
    val bucketed = corpus
      .select(col(idCol), col(vecCol))
      .withColumn("bucket", hyperplaneBits(col(vecCol), planes))
    val qb = queries
      .select(col(queryIdCol), col(vecCol).as("q_vec"))
      .withColumn("q_bucket",
        explode(probeBuckets(hyperplaneBits(col("q_vec"), planes), planes, probeBits)))
    val scored = bucketed
      .join(broadcast(qb),
        col("bucket") === col("q_bucket") && col(idCol) =!= col(queryIdCol))
      .withColumn("cosine", cosine(col(vecCol), col("q_vec")))
    groupedTopK(scored, k, idCol, queryIdCol)
  }

  /** IVF-style coarse quantization: assign every vector to its nearest
    * of `centroids` (a small table of (centroid_id, vec)), producing
    * an inverted-file layout — repartitioning by centroid puts each
    * cell's vectors together for cell-local search.
    *
    * A PURE MAP: the centroids collect to a [[graft.functions
    * .expressions.CentroidMatrix]] (driver-bounded by the coarse-
    * quantizer contract, the same control-plane collect KMeans does)
    * and a single codegen'd `nearest_centroid` expression evaluates
    * all k distances per row — no join, no k× row multiplication, no
    * argmin shuffle. (The previous broadcast-join + min(struct)
    * aggregate multiplied every corpus row k times before the
    * partial agg; SemDeDup's own regime is k ≈ O(√N), so that factor
    * grows with the corpus.) Arithmetic is bit-identical — see
    * `VectorUtil.nearestCentroid`.
    */
  def ivfAssign(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfAssignWithVec(corpus, centroids, idCol, vecCol)
      .select(col(idCol), col("centroid_id"), col("dist2"))

  /** [[ivfAssign]] keeping the vector column — assignment is a map, so
    * downstream cell-local work needs no join back to the corpus.
    * Output: (idCol, vecCol, centroid_id, dist2).
    */
  def ivfAssignWithVec(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.expressions.{CentroidMatrix, VectorExprFunctions}
    val m = CentroidMatrix.fromDataFrame(centroids, vecCol)
    corpus
      .select(col(idCol), col(vecCol),
        VectorExprFunctions.nearest_centroid(col(vecCol), m).as("__best"))
      .select(col(idCol), col(vecCol),
        col("__best.centroid_id").as("centroid_id"),
        round(col("__best.dist2"), 6).as("dist2"))
  }

  /** IVF-probed ANN top-k: search only the cells of each query's
    * `nProbe` nearest centroids. The corpus is scored against a query
    * only when both share a cell — the scan fraction is ~nProbe/nCells
    * of brute force, the standard IVF recall/speed trade. Scale shape:
    * corpus assignment is a broadcast-join map pass (or precomputed and
    * stored partitioned by cell); candidate scoring shuffles only the
    * probed cells' rows.
    */
  def ivfTopK(
      corpus: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nProbe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      queryIdCol: String = "query_id"): DataFrame = {
    // assignment keeps the vector (it's a map) — no corpus self-join
    val assigned = ivfAssignWithVec(corpus, centroids, idCol, vecCol)
      .select(col(idCol), col("centroid_id"), col(vecCol))
    // query → its nProbe nearest centroids. A Window is fine HERE: the
    // windowed set is queries × centroids, both broadcast-small by
    // contract — unlike the corpus-sized assignment above.
    val qScored = queries
      .select(col(queryIdCol), col(vecCol).as("q_vec"))
      .join(broadcast(centroids.select(col("centroid_id"), col(vecCol).as("c_vec"))))
      .withColumn("dist2",
        normSq(col("q_vec")) + normSq(col("c_vec")) - lit(2.0) * dot(col("q_vec"), col("c_vec")))
    val wq = Window.partitionBy(col(queryIdCol)).orderBy(col("dist2").asc, col("centroid_id").asc)
    val probes = qScored.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col(queryIdCol), col("centroid_id"), col("q_vec"))
    val scored = assigned
      .join(broadcast(probes),
        Seq("centroid_id")) // only same-cell pairs
      .filter(col(idCol) =!= col(queryIdCol))
      .withColumn("cosine", cosine(col(vecCol), col("q_vec")))
    groupedTopK(scored, k, idCol, queryIdCol)
  }
}
