package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** BM25 lexical retrieval (Robertson & Zaragoza 2009, the Okapi/
    * Lucene formulation with the +1-inside-the-log IDF, so scores stay
    * non-negative): rank documents for each query by
    * Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·len/avgdl)) —
    * the lexical ranker [[rrfFuse]] pairs with the dense ANN rankers
    * for standard hybrid retrieval.
    *
    * Scale shape: one tokenize pass builds (doc, term, tf) and doc
    * lengths; document frequencies aggregate term-keyed with map-side
    * partials; the QUERY terms broadcast twice — once to semi-filter
    * the corpus postings to candidates, once to pick their IDF rows —
    * so the corpus-sized side never shuffles on terms; the per-(query,
    * doc) score aggregates matched postings only; the final top-k is
    * the bounded heap. Corpus totals ride a 1-row broadcast (the
    * boundary-probe pattern).
    *
    * Determinism: every arithmetic op except `ln` is IEEE-exact and
    * identically associated in any engine; the `ln` (libm-dependent)
    * is quantized to DECIMAL(18,9) — the [[Perplexity]] contract — and
    * per-term contributions re-quantize to DECIMAL(18,9) before the
    * order-free decimal sum, so scores are bit-reproducible and
    * hard-oracle-able. Distinct decimal scores (1e-9 apart) never
    * collapse in the heap's double, so the ranking is deterministic
    * with the id-ascending tiebreak.
    *
    * Returns (queryIdCol, idCol, score, rank) — score rounded to 6
    * decimals, rank 1..topK by score DESC, id ASC.
    */
  def bm25TopK(
      docs: DataFrame, queries: DataFrame, topK: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", queryTextCol: String = "qtext"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(topK > 0 && k1 >= 0 && b >= 0 && b <= 1, s"bad params k1=$k1 b=$b topK=$topK")
    def toks(c: Column) = when(length(trim(c)) === 0,
      array().cast("array<string>")).otherwise(split(trim(c), "\\s+"))
    val k1p1 = k1 + 1.0
    val oneMinusB = 1.0 - b
    val base = docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("w"))
    val lens = base.select(col("doc_id"), size(col("w")).cast("long").as("len"))
    // len rides the posting rows as a (functionally dependent) group
    // key — no corpus-sized doc-length join back later
    val tf = base
      .select(col("doc_id"), size(col("w")).cast("long").as("len"),
        explode(col("w")).as("token"))
      .groupBy(col("doc_id"), col("len"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // corpus totals: N includes token-less docs; avgdl is the one
    // double division both sides of the oracle perform identically
    val tot = lens.agg(count(lit(1)).as("n"), sum(col("len")).as("tl"))
    val qterms = queries
      .select(col(queryIdCol), explode(toks(col(queryTextCol))).as("token"))
      .distinct()
    // IDF only for the queried terms: semi-filter the (vocabulary-
    // sized) df table by the broadcast query terms, THEN quantize —
    // the result is queries × terms small and broadcasts onto postings
    val idfq = dfreq
      .join(broadcast(qterms.select(col("token")).distinct()), Seq("token"), "left_semi")
      .crossJoin(broadcast(tot))
      .select(col("token"),
        log((col("n").cast("double") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5)) + lit(1.0))
          .cast(DecimalType(18, 9)).as("idf"))
    val scored = tf
      .join(broadcast(qterms), Seq("token")) // postings ⋉ query terms
      .join(broadcast(idfq), Seq("token"))
      .crossJoin(broadcast(tot))
      .select(col(queryIdCol), col("doc_id"),
        (col("idf").cast("double") * (col("tf") * lit(k1p1)) /
          (col("tf") + lit(k1) *
            (lit(oneMinusB) + lit(b) * col("len") /
              (col("tl").cast("double") / col("n")))))
          .cast(DecimalType(18, 9)).as("contrib"))
      .groupBy(col(queryIdCol), col("doc_id"))
      .agg(sum(col("contrib")).as("score"))
    CorpusStats.topKPerGroup(
      scored.withColumn("__s", col("score").cast("double")),
      queryIdCol, "doc_id", "__s", topK)
      .select(col(queryIdCol), col("doc_id").as(idCol),
        round(col("score"), 6).as("score"), col("rank"))
  }
}
