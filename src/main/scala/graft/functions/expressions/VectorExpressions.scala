package graft.functions.expressions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the dense-vector hot paths.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * evaluates as interpreted lambdas outside whole-stage codegen — the
  * same anti-pattern that cost MinHash 551 s → 42 s when it moved to a
  * native expression. These replace it with tight JVM loops behind a
  * single static call, so the surrounding projection stays inside
  * whole-stage codegen.
  *
  * Numeric contract: every accumulation is DOUBLE in strict
  * left-to-right element order (float elements widened per element),
  * identical to both the old `aggregate()` fold and DuckDB's
  * `list_dot_product` over `DOUBLE[]` — oracle comparisons stay
  * bit-stable, not tolerance-close.
  */
object VectorUtil {

  @inline private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Left-to-right double dot product over min(|a|,|b|) elements. */
  def dot(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += elem(a, i, aF) * elem(b, i, bF); i += 1 }
    acc
  }

  /** Cosine similarity: dot/(||a||·||b||), each sum folded
    * left-to-right in double — bit-identical to
    * dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b))).
    */
  def cosine(a: ArrayData, aF: Boolean, b: ArrayData, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i, aF); val y = elem(b, i, bF)
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  @inline private def mix64(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 30); x *= 0xbf58476d1ce4e5b9L
    x ^= (x >>> 27); x *= 0x94d049bb133111ebL
    x ^= (x >>> 31)
    x
  }

  // plane-component matrices are deterministic in (planes, seed, dim);
  // cache per executor so the hash runs once, not once per row
  private val planeCache = new ConcurrentHashMap[String, Array[Double]]()

  private def planeMatrix(planes: Int, seed: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent(s"$planes/$seed/$dim", _ => {
      val m = new Array[Double](planes * dim)
      var p = 0
      while (p < planes) {
        val ph = mix64(seed.toLong ^ (p * 0x9e3779b97f4a7c15L))
        var j = 0
        while (j < dim) {
          val h = mix64(ph ^ (j * 0xc2b2ae3d27d4eb4fL))
          // scaled to [-1, 1) like the HOF formulation it replaces
          m(p * dim + j) = java.lang.Math.floorMod(h, 1000000L).toDouble / 500000.0 - 1.0
          j += 1
        }
        p += 1
      }
      m
    })

  /** Random-hyperplane LSH bucket: bit p of the result is the sign of
    * the dot product with pseudo-random plane p (components derived
    * from splitmix64 of (seed, p, j)). Cosine-close vectors collide
    * with high probability.
    */
  def hyperplaneBits(v: ArrayData, vF: Boolean, planes: Int, seed: Int): Long = {
    val dim = v.numElements()
    val m = planeMatrix(planes, seed, dim)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var d = 0.0
      var j = 0
      val off = p * dim
      while (j < dim) { d += elem(v, j, vF) * m(off + j); j += 1 }
      if (d >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Single-pass argmin over a broadcast centroid matrix: evaluates
    * all k squared distances in one tight loop and returns
    * (centroid_id, dist2) of the nearest — replacing the k× row
    * multiplication of a corpus×centroids broadcast join + argmin
    * aggregate with a pure map (no join, no shuffle).
    *
    * Arithmetic contract (bit-identical to the join formulation and
    * to the DuckDB oracles): dist2 = (dot(v,v) + dot(c,c)) −
    * 2·dot(v,c), every fold left-to-right in DOUBLE; dot(v,v) runs
    * over the full vector, dot(v,c) over min(|v|, dim) — exactly the
    * old `normSq(v) + normSq(c) - 2.0*dot(v,c)` expression tree.
    * Ties: centroids scan in ascending id with strict `<`, so the
    * smallest centroid_id wins — `min(struct(dist2, centroid_id))`
    * semantics.
    */
  def nearestCentroid(
      v: ArrayData, vF: Boolean, m: CentroidMatrix)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val vLen = v.numElements()
    var dv = 0.0
    var i = 0
    while (i < vLen) { val x = elem(v, i, vF); dv += x * x; i += 1 }
    val dim = math.min(vLen, m.dim)
    var bestId = 0L
    var best = 0.0
    var c = 0
    while (c < m.ids.length) {
      var dvc = 0.0
      var j = 0
      val off = c * m.dim
      while (j < dim) { dvc += elem(v, j, vF) * m.flat(off + j); j += 1 }
      val d = dv + m.norms(c) - 2.0 * dvc
      // min(struct) semantics incl. NaN: Spark orders NaN greatest, so
      // a NaN distance loses to any finite one (best!=best detects NaN
      // without boxing); among all-NaN the smallest id wins
      if (c == 0 || d < best || (best != best && d == d)) {
        best = d; bestId = m.ids(c)
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestId, best))
  }
}

/** Collected centroids for [[NearestCentroid]]: ids ascending,
  * components row-major (floats widened exactly — widening is lossless,
  * so precollecting changes no arithmetic), per-centroid ||c||² in the
  * same left-to-right DOUBLE fold the join formulation used. Driver-
  * side by contract: coarse quantizers are k ≈ O(√N) rows — the same
  * control-plane collect KMeans already does for its Lloyd loop.
  */
final class CentroidMatrix private (
    val ids: Array[Long], val flat: Array[Double], val dim: Int,
    val norms: Array[Double]) extends Serializable {
  def k: Int = ids.length
}

object CentroidMatrix {

  def apply(rows: Seq[(Long, Array[Double])]): CentroidMatrix = {
    require(rows.nonEmpty, "centroid set is empty")
    val sorted = rows.sortBy(_._1).toArray
    val dim = sorted.head._2.length
    require(sorted.forall(_._2.length == dim), "ragged centroid dimensions")
    val flat = new Array[Double](sorted.length * dim)
    val norms = new Array[Double](sorted.length)
    var c = 0
    while (c < sorted.length) {
      val v = sorted(c)._2
      System.arraycopy(v, 0, flat, c * dim, dim)
      var n = 0.0
      var j = 0
      while (j < dim) { n += v(j) * v(j); j += 1 }
      norms(c) = n
      c += 1
    }
    new CentroidMatrix(sorted.map(_._1), flat, dim, norms)
  }

  /** Fail-loudly cap on [[fromDataFrame]]'s driver collect. The
    * coarse-quantizer contract is k·dim doubles (kilobytes to a few
    * MB); a caller that points this at a data-plane table should get a
    * diagnosis, not a driver OOM. 65536 centroids × 1024 dims ≈ 0.5 GB
    * — already far past any sane IVF list count for one executor tier.
    */
  @volatile var maxCentroidRows: Int = 65536

  /** Collect a (centroid_id, vecCol) DataFrame — float or double
    * elements — into a matrix. A driver action at plan-build time,
    * bounded by the coarse-quantizer contract (k·dim doubles) and
    * guarded by [[maxCentroidRows]]: the collect itself is limited, so
    * the failure mode is an exception, never a driver OOM.
    */
  def fromDataFrame(
      centroids: org.apache.spark.sql.DataFrame, vecCol: String): CentroidMatrix =
    apply(boundedRows(centroids
      .select(org.apache.spark.sql.functions.col("centroid_id").cast("long"),
        org.apache.spark.sql.functions.col(vecCol)))
      .map { r =>
        val arr = r.getSeq[Any](1).map {
          case f: java.lang.Float  => f.toDouble
          case d: java.lang.Double => d.doubleValue()
          case other => throw new IllegalArgumentException(
            s"centroid element of type ${other.getClass}")
        }.toArray
        (r.getLong(0), arr)
      }.toIndexedSeq)

  /** The guarded collect: LIMIT cap+1 runs on the executors, so a
    * data-plane-sized input costs one row over the cap, not a driver
    * heap.
    */
  private def boundedRows(
      df: org.apache.spark.sql.DataFrame): Array[org.apache.spark.sql.Row] = {
    val rows = df.limit(maxCentroidRows + 1).collect()
    if (rows.length > maxCentroidRows)
      throw new IllegalStateException(
        s"CentroidMatrix.fromDataFrame: centroid collect exceeded its " +
          s"$maxCentroidRows-row control-plane cap — this input is " +
          "data-plane-sized; pass the coarse-quantizer centroids, not the corpus " +
          "(raise CentroidMatrix.maxCentroidRows only if you truly mean it)")
    rows
  }
}

private object VectorExprTypes {
  /** Whether an array column's elements are float (vs double). */
  def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float> or array<double>, got $other")
  }
}

/** `vec_dot(a, b)` — left-to-right double dot product. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  private lazy val lF = VectorExprTypes.isFloat(left)
  private lazy val rF = VectorExprTypes.isFloat(right)
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.dot(a.asInstanceOf[ArrayData], lF, b.asInstanceOf[ArrayData], rF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.VectorUtil.dot($a, $lF, $b, $rF)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

/** `vec_cosine(a, b)` — cosine similarity in one pass. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  private lazy val lF = VectorExprTypes.isFloat(left)
  private lazy val rF = VectorExprTypes.isFloat(right)
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.cosine(a.asInstanceOf[ArrayData], lF, b.asInstanceOf[ArrayData], rF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.VectorUtil.cosine($a, $lF, $b, $rF)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_cosine"
}

/** `hyperplane_bits(v, planes, seed)` — LSH sign-bucket key. */
case class HyperplaneBits(child: Expression, planes: Int, seed: Int)
    extends UnaryExpression {
  require(planes > 0 && planes <= 62, s"planes must be in [1, 62], got $planes")
  override def dataType: DataType = LongType
  private lazy val vF = VectorExprTypes.isFloat(child)
  override def nullSafeEval(input: Any): Any =
    VectorUtil.hyperplaneBits(input.asInstanceOf[ArrayData], vF, planes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.VectorUtil.hyperplaneBits($c, $vF, $planes, $seed)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBits =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_bits"
}

/** `nearest_centroid(v, matrix)` — single-pass argmin assignment
  * returning struct(centroid_id, dist2). The matrix rides codegen as
  * a reference object; the projection stays inside whole-stage
  * codegen (one static call per row, k·dim flops, zero joins).
  */
case class NearestCentroid(child: Expression, matrix: CentroidMatrix)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("centroid_id", LongType, nullable = false),
    StructField("dist2", DoubleType, nullable = false)))
  private lazy val vF = VectorExprTypes.isFloat(child)
  override def nullSafeEval(input: Any): Any =
    VectorUtil.nearestCentroid(input.asInstanceOf[ArrayData], vF, matrix)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidMatrix", matrix,
      classOf[CentroidMatrix].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.VectorUtil.nearestCentroid($c, $vF, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroid"
}

/** Column-API wrappers. */
object VectorExprFunctions {
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vec_cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def hyperplane_bits(v: Column, planes: Int, seed: Int = 0x5eed): Column =
    ColumnBridge.column(HyperplaneBits(ColumnBridge.expression(v), planes, seed))

  def nearest_centroid(v: Column, matrix: CentroidMatrix): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(v), matrix))
}
