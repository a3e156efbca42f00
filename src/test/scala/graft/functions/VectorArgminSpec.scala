package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.{CentroidMatrix, VectorUtil}

/** min(struct(dist2, centroid_id)) semantics of the single-pass argmin,
  * including the NaN ordering corner (Spark sorts NaN greatest, so a
  * NaN-distance centroid must lose to any finite one).
  */
class VectorArgminSpec extends AnyFunSuite {

  private def nearest(v: Array[Double], cs: Seq[(Long, Array[Double])]): (Long, Double) = {
    val row = VectorUtil.nearestCentroid(
      ArrayData.toArrayData(v), vF = false, CentroidMatrix(cs))
    (row.getLong(0), row.getDouble(1))
  }

  test("picks the true nearest finite centroid; ties break to the smallest id") {
    val (id, d) = nearest(Array(1.0, 0.0),
      Seq(0L -> Array(0.0, 1.0), 1L -> Array(1.0, 0.0), 2L -> Array(1.0, 0.0)))
    assert(id == 1L && d == 0.0)
  }

  test("a NaN-distance centroid sorting first by id never captures the corpus") {
    val nanC = Array(Double.NaN, 0.0)
    val (id, d) = nearest(Array(1.0, 0.0), Seq(0L -> nanC, 1L -> Array(0.0, 1.0)))
    assert(id == 1L, s"NaN centroid must lose to a finite one, got $id (d=$d)")
    // all-NaN: smallest id wins, NaN distance reported
    val (id2, d2) = nearest(Array(1.0, 0.0), Seq(3L -> nanC, 7L -> nanC))
    assert(id2 == 3L && d2.isNaN)
  }
}
