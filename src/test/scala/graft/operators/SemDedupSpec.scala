package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** SemDeDup: keep-first within-cell near-duplicate marking, and the
  * documented cross-cell blindness.
  */
class SemDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Array[Float])]) =
    rows.toDF("vec_id", "embedding")

  private lazy val centroids = Seq(
    (0L, Array(1f, 0f)), (1L, Array(0f, 1f))
  ).toDF("centroid_id", "embedding")

  test("within-cell near-copies are marked, earliest id kept") {
    val corpus = vecs(Seq(
      1L -> Array(1f, 0f),       // cell 0, kept
      2L -> Array(0.98f, 0.02f), // cell 0, cos(v1,v2) ≈ 0.9998 → dup
      3L -> Array(0f, 1f),       // cell 1, kept
      4L -> Array(0.5f, 0.86f),  // cell 1, cos(v3,v4) ≈ 0.86 → kept
      5L -> Array(0.01f, 1f)     // cell 1, cos(v3,v5) ≈ 0.99995 → dup
    ))
    val out = SemDedup.semDedup(corpus, centroids, threshold = 0.95)
    val dups = out.filter(col("is_dup")).select("vec_id")
      .as[Long].collect().toSet
    assert(dups == Set(2L, 5L))
    val cells = out.select("vec_id", "centroid_id").as[(Long, Long)]
      .collect().toMap
    assert(cells(1L) == 0L && cells(2L) == 0L)
    assert(cells(3L) == 1L && cells(4L) == 1L && cells(5L) == 1L)
  }

  test("near-identical pair split across cells is NOT compared (SemDeDup approximation)") {
    val corpus = vecs(Seq(
      1L -> Array(0.709f, 0.705f), // barely cell 0
      2L -> Array(0.705f, 0.709f)  // barely cell 1; cosine ≈ 0.99997
    ))
    val out = SemDedup.semDedup(corpus, centroids, threshold = 0.95)
    assert(out.filter(col("is_dup")).count() == 0)
    assert(out.select("centroid_id").distinct().count() == 2)
  }

  test("threshold 1-ish keeps everything distinct; output is one row per input") {
    val corpus = vecs(Seq(
      1L -> Array(1f, 0f), 2L -> Array(0.9f, 0.1f), 3L -> Array(0f, 1f)))
    val out = SemDedup.semDedup(corpus, centroids, threshold = 1.0)
    assert(out.count() == 3)
    assert(out.filter(col("is_dup")).count() == 0)
  }

  test("identical-vector flood collapses before the pair stage; flags stay correct") {
    // 500 bit-identical copies + 2 distinct rows: the pair stage sees
    // 3 representatives, not 500+2 rows — and every copy except the
    // earliest is flagged
    val flood = (10L until 510L).map(i => i -> Array(0.8f, 0.6f))
    val corpus = vecs(flood ++ Seq(1L -> Array(1f, 0f), 2L -> Array(0f, 1f)))
    val out = SemDedup.semDedup(corpus, centroids, threshold = 0.99)
    val dups = out.filter(col("is_dup")).select("vec_id").as[Long].collect().toSet
    assert(dups == (11L until 510L).toSet) // all copies but id 10; 1 and 2 kept
  }
}
