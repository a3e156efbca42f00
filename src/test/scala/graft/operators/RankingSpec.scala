package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Reciprocal-rank fusion: hand-computed scores, partial-membership
  * handling, and deterministic tiebreaks.
  */
class RankingSpec extends SparkSpecBase {
  import spark.implicits._

  private def ranking(rows: (Long, Long, Int)*) =
    rows.toDF("query_id", "vec_id", "rank")

  test("fused scores match hand computation; shared docs outrank single-ranker docs") {
    // ranker A: d1 > d2; ranker B: d2 > d1 > d3 — d3 appears only in B
    val a = ranking((1L, 101L, 1), (1L, 102L, 2))
    val b = ranking((1L, 102L, 1), (1L, 101L, 2), (1L, 103L, 3))
    val out = Ranking.rrfFuse(Seq(a, b), kRrf = 60, topN = 10)
      .orderBy("rank")
      .collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3), r.getLong(4)))
    val s101 = 1.0 / 61 + 1.0 / 62 // rank 1 in A, 2 in B
    val s102 = 1.0 / 62 + 1.0 / 61 // rank 2 in A, 1 in B — identical score
    val s103 = 1.0 / 63
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // equal scores tiebreak by id ASC: 101 before 102
    assert(out.toSeq == Seq(
      (101L, r6(s101), 1, 2L), (102L, r6(s102), 2, 2L), (103L, r6(s103), 3, 1L)))
  }

  test("topN truncates per query independently") {
    val a = ranking((1L, 11L, 1), (1L, 12L, 2), (1L, 13L, 3), (2L, 21L, 1))
    val out = Ranking.rrfFuse(Seq(a), kRrf = 1, topN = 2)
    assert(out.filter(col("query_id") === 1).count() == 2)
    assert(out.filter(col("query_id") === 2).count() == 1)
    // kRrf=1: score of rank 1 is 1/2
    val top = out.filter(col("query_id") === 2).select("rrf_score")
      .as[Double].head()
    assert(top == 0.5)
    // degenerate kRrf rejected
    intercept[IllegalArgumentException] {
      Ranking.rrfFuse(Seq(a), kRrf = 0, topN = 2)
    }
  }

  test("fusing a ranking with itself doubles scores and preserves order") {
    val a = ranking((1L, 11L, 1), (1L, 12L, 2))
    val once = Ranking.rrfFuse(Seq(a), kRrf = 60, topN = 10)
      .select("vec_id", "rrf_score").as[(Long, Double)].collect().toMap
    val twice = Ranking.rrfFuse(Seq(a, a), kRrf = 60, topN = 10)
      .select("vec_id", "rrf_score").as[(Long, Double)].collect().toMap
    assert(twice.keySet == once.keySet)
    // rrf_score is rounded to 6 decimals on output, so doubling the
    // rounded value can differ from the rounded double by up to 1e-6
    for ((k, v) <- once) assert(math.abs(twice(k) - 2 * v) <= 2e-6)
  }
}
