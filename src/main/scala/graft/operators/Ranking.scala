package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009): combine
  * several per-query rankings of the same candidate space into one,
  * scoring each candidate Σ_r 1/(k + rank_r) over the rankers that
  * surfaced it — the standard score-free way to merge heterogeneous
  * retrieval signals (dense ANN + lexical, cosine + euclidean, ...)
  * without calibrating their score scales against each other.
  *
  * Scale shape: the inputs are already top-k-per-query lists (the
  * expensive part — ANN/LSH/inverted-index retrieval — happened
  * upstream), so everything here is bounded by queries × k × rankers
  * rows: a union, one (query, id) aggregation with map-side partials,
  * and a bounded-heap top-N — no corpus access at all.
  *
  * Determinism: with ≤ 2 rankers the fused double is bit-stable under
  * any aggregation order (IEEE addition of two terms is commutative),
  * so a DuckDB oracle reproduces it exactly; with 3+ rankers the sum
  * is order-sensitive in the last ulp and comparisons should use a
  * tolerance.
  */
object Ranking {

  /** Fuse `rankings` — each (queryCol, idCol, rankCol) with rank
    * starting at 1 — into the top `topN` per query by RRF score.
    * Output: (queryCol, idCol, rrf_score, rank, n_rankers), ranked by
    * score DESC with id ASC tiebreak.
    *
    * The top-N here is a per-query WINDOW, not the bounded-heap
    * aggregator the corpus-scale operators use: the fused set is
    * already bounded (≤ queries × k × rankers rows, post-retrieval),
    * so one window pass beats re-deriving the fused aggregate for a
    * separate heap + join-back (which would plan the union/aggregate
    * subtree twice).
    */
  def rrfFuse(
      rankings: Seq[DataFrame], kRrf: Int, topN: Int,
      queryCol: String = "query_id", idCol: String = "vec_id",
      rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "at least one ranking")
    require(kRrf >= 1, s"kRrf must be at least 1 (Cormack et al. use 60), got $kRrf")
    val fused = rankings
      .map(_.select(col(queryCol), col(idCol),
        (lit(1.0) / (lit(kRrf).cast("double") + col(rankCol).cast("double")))
          .as("__contrib")))
      .reduce(_ unionAll _)
      .groupBy(col(queryCol), col(idCol))
      .agg(sum(col("__contrib")).as("__rrf"), count(lit(1)).as("n_rankers"))
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col("__rrf").desc, col(idCol).asc)
    fused
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= topN)
      .select(col(queryCol), col(idCol),
        round(col("__rrf"), 6).as("rrf_score"), col("rank"), col("n_rankers"))
  }
}
