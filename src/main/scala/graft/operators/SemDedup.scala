package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedded corpus into cells, then
  * compare pairs ONLY within a cell with exact cosine similarity and
  * mark near-semantic-copies above a threshold. The clustering bounds
  * the quadratic pair work — all-pairs cosine over N documents is
  * O(N²), but within cells of expected size N/k it is O(N²/k), and k
  * grows with the corpus (the paper uses k ≈ O(√N), making the pair
  * stage linear-ish). Cross-cell near-duplicates are invisible by
  * construction — that is SemDeDup's stated approximation, not a bug
  * here.
  *
  * Scale shape: assignment is one codegen'd `nearest_centroid` map
  * pass over the collected centroid matrix (centroids are
  * control-plane-sized by definition) — no join, no k× row
  * multiplication, no shuffle. The pair stage shuffles each vector
  * once on its cell key;
  * within-cell self-join does the bounded quadratic work. Hot cells
  * are observable via the assignment counts (q26's cell-size view) and
  * can be capped or re-split exactly like [[Dedup]]'s LSH hot-bucket
  * guard.
  *
  * Dedup policy: a row is a duplicate iff SOME earlier row (smaller
  * id) in the same cell has cosine ≥ threshold — the same
  * keep-first-in-id-order rule as the LSH near-dup pipelines, and the
  * rule a DuckDB oracle can replay exactly (the cosine arithmetic is
  * the bit-stable left-to-right DOUBLE fold of
  * [[graft.functions.expressions.VectorUtil]]).
  */
object SemDedup {

  /** Output: one row per corpus row — (`idCol`, centroid_id, is_dup). */
  def semDedup(
      corpus: DataFrame, centroids: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    // assignment is a PURE MAP: one codegen'd nearest_centroid pass
    // over a collected centroid matrix — no broadcast join, no k× row
    // multiplication, no argmin shuffle (see Similarity.ivfAssign).
    // cells feeds both pair-join sides plus the output flag join —
    // pinned for the scope so the scan+assignment runs once, not three
    // times, and released when the flag output materializes (see
    // CacheScope; the output is one small row per corpus row — at
    // cluster scale the same shape checkpoints to storage instead).
    val cells = graft.operators.Similarity
      .ivfAssignWithVec(corpus, centroids, idCol, vecCol)
      .select(col(idCol), col("centroid_id"), col(vecCol))
    CacheScope.pinned(cells)(semDedupFrom(cells, threshold, idCol, vecCol))
  }

  /** The LAZY within-cell pair pipeline over pre-built cell
    * assignments — exposed for plan-shape specs (the public operator
    * returns an eagerly checkpointed result whose plan is a leaf).
    */
  private[graft] def semDedupFrom(
      cells: DataFrame, threshold: Double,
      idCol: String, vecCol: String): DataFrame = {
    // exact-duplicate pre-collapse (the same flood guard as the LSH
    // pipelines): bit-identical vectors — empty docs, boilerplate —
    // collapse to their min-id representative BEFORE the pair stage,
    // so a 10k-copy flood contributes one row to the quadratic work
    // instead of 10k²/2 pairs. Semantics-preserving for any
    // threshold ≤ 1: a non-representative row has an earlier identical
    // row, and for any other row the representative (min id) is
    // earlier than every member, so pairing against representatives
    // alone decides the keep-first rule identically. (One ulp-level
    // caveat: the float cosine of identical vectors can round to just
    // under 1.0 — sqrt(d)·sqrt(d) ≠ d — so at thresholds within ~2 ulp
    // of 1.0 the collapse flags identical copies the float pair rule
    // would barely miss; that is the more faithful answer.)
    val reps = cells.groupBy(col("centroid_id"), col(vecCol))
      .agg(min(col(idCol)).as(idCol))
    val a = reps.select(col("centroid_id"), col(idCol).as("__a_id"),
      col(vecCol).as("__a_vec"))
    val b = reps.select(col("centroid_id"), col(idCol).as("__b_id"),
      col(vecCol).as("__b_vec"))
    val repDups = a.join(b, "centroid_id")
      .filter(col("__a_id") < col("__b_id"))
      .filter(VectorFunctions.cosine(col("__a_vec"), col("__b_vec")) >= threshold)
      .select(col("__b_id").as(idCol))
    // non-representatives are duplicates outright; a representative is
    // a duplicate iff the pair stage flagged it
    val repIds = reps.select(col(idCol)).withColumn("__rep", lit(true))
    val dupIds = repDups
      .unionAll(cells.select(col(idCol))
        .join(repIds, Seq(idCol), "left_anti"))
      .distinct()
    cells.select(col(idCol), col("centroid_id"))
      .join(dupIds.withColumn("__dup", lit(true)), Seq(idCol), "left")
      .withColumn("is_dup", coalesce(col("__dup"), lit(false)))
      .drop("__dup")
  }
}
