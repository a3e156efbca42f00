package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** K-means (Lloyd's) training for IVF coarse quantizers, entirely in
  * DataFrame ops — the missing "train" half of
  * [[Similarity.ivfAssign]]/[[Similarity.ivfTopK]].
  *
  * Scale shape per iteration (the 100 TB loop):
  *  - assignment is a pure map: a codegen'd `nearest_centroid` pass
  *    over the collected k×dim matrix — no join, no shuffle;
  *  - mean recomputation posexplodes to (cell, pos, x) and aggregates —
  *    partial aggregation collapses each map partition to ≤ k·dim rows
  *    before the exchange, so the shuffle is centroid-sized, not
  *    corpus-sized;
  *  - only the k×dim centroid matrix ever reaches the driver
  *    (control plane, like the materialization's boundary probes).
  *
  * Determinism: floating-point `avg` depends on partial-combine order,
  * so plain Lloyd's is not reproducible across partitionings. Here each
  * component is quantized to DECIMAL(18,6) and summed EXACTLY
  * (decimal addition is order-free), then the mean is rounded back to
  * 6 decimals in EXACT integer arithmetic (half away from zero on the
  * rational sum/count — never a double divide before the round, whose
  * one-ulp error flips engines' ROUND rules at .5 boundaries) — every
  * iteration, and therefore the whole fit, is bit-reproducible on any
  * cluster layout, and the single step has a DuckDB oracle
  * (`ExtensionQueries.kmeansStepSql`). The 1e-6 quantization is far
  * below embedding noise.
  */
object KMeans {

  /** One deterministic Lloyd step: assign to nearest centroid, then
    * per-(cell, component) quantized-exact mean. Returns
    * (centroid_id, pos, m) rows — cells that captured no vectors keep
    * no rows (caller decides: keep old centroid).
    */
  def step(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // assignment is a map that keeps the vector — no join back
    val assigned = Similarity.ivfAssignWithVec(corpus, centroids, idCol, vecCol)
      .select(col("centroid_id"), col(vecCol))
    assigned
      .select(col("centroid_id"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("centroid_id"), col("pos"))
      .agg(
        // exact decimal sum, held as a scaled INTEGER (micro-units)
        sum((col("x").cast(DecimalType(18, 6)) * lit(1000000)).cast("long"))
          .as("s6"),
        count(lit(1)).as("n"))
      .select(col("centroid_id"), col("pos"),
        // round-half-away-from-zero of the exact rational s6/n, in pure
        // integer arithmetic: a double divide BEFORE rounding puts a
        // 4-member cell's mean (an exact multiple of 0.25e-6) one ulp
        // off the .5 boundary, where engines' ROUND rules disagree —
        // the exact form is replayable bit-for-bit anywhere
        (expr("cast(if(s6 < 0, -((abs(s6) * 2 + n) div (2 * n)), " +
          "(abs(s6) * 2 + n) div (2 * n)) as double)") / lit(1000000.0))
          .as("m"))
  }

  /** Full fit: deterministic init (the k lowest-id vectors), then up to
    * `maxIters` quantized Lloyd steps, stopping early when no centroid
    * component moves. Returns (centroid_id, vecCol) with
    * array<double> centroids, ready for [[Similarity.ivfTopK]].
    */
  def fit(
      corpus: DataFrame, k: Int, maxIters: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = corpus.sparkSession
    def toDf(cs: Array[Array[Double]]): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          cs.zipWithIndex.toIndexedSeq.map { case (v, i) => Row(i.toLong, v.toSeq) }, 1),
        StructType(Seq(
          StructField("centroid_id", LongType, nullable = false),
          StructField(vecCol, ArrayType(DoubleType, containsNull = false)))))

    // deterministic seed: the k lowest-id vectors, quantized like means
    var cs: Array[Array[Double]] = corpus
      .orderBy(col(idCol))
      .limit(k)
      .select(transform(col(vecCol),
        x => round(x.cast("double"), 6)).as(vecCol))
      .collect()
      .map(_.getSeq[Double](0).toArray)

    var iter = 0
    var moved = true
    while (iter < maxIters && moved) {
      val means = step(corpus, toDf(cs), idCol, vecCol)
        .collect() // k·dim rows — control plane
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          val dim = rows.length
          val v = new Array[Double](dim)
          rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
          cid.toInt -> v
        }
      val next = cs.zipWithIndex.map { case (old, i) => means.getOrElse(i, old) }
      moved = next.zip(cs).exists { case (a, b) => !java.util.Arrays.equals(a, b) }
      cs = next
      iter += 1
    }
    toDf(cs)
  }

  /** Fused per-subspace training — [[fit]] over every contiguous
    * subvector of a product quantizer in ONE seed job plus ONE Lloyd
    * job per iteration, instead of 2 jobs × m subspaces: every
    * subspace trains on the same rows, so the per-subspace
    * assignment+mean aggregations share a single map pass (m codegen'd
    * `nearest_centroid` calls per row) and a single centroid-sized
    * shuffle keyed by (s, centroid_id, pos).
    *
    * Bit-identical to `(0 until m).map(s => fit(slice_s(corpus), ...))`:
    * the seeds are the same k lowest-id vectors' rounded slices
    * (round is element-wise, so round-then-slice ≡ slice-then-round);
    * each (s, centroid, pos) group sums the same rows with the same
    * order-free DECIMAL quantization; the mean is the same exact
    * integer rounding. A subspace that converges early keeps
    * receiving no-op steps (unchanged centroids ⇒ unchanged
    * assignments ⇒ unchanged means) until every subspace converges.
    *
    * Returns one [[graft.functions.expressions.CentroidMatrix]] per
    * subspace, ready for codegen'd encoding — no DataFrame round-trip.
    */
  def fitSubspaces(
      corpus: DataFrame, dim: Int, m: Int, k: Int, maxIters: Int = 10,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : IndexedSeq[graft.functions.expressions.CentroidMatrix] = {
    import graft.functions.expressions.{CentroidMatrix, VectorExprFunctions}
    require(k > 0, "k must be positive")
    require(m > 0 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    // ONE seed job for all subspaces: the k lowest-id full vectors,
    // components rounded exactly like fit's per-subspace seed
    val seedVecs: Array[Array[Double]] = corpus
      .orderBy(col(idCol))
      .limit(k)
      .select(transform(col(vecCol), x => round(x.cast("double"), 6)).as(vecCol))
      .collect()
      .map(_.getSeq[Double](0).toArray)
    var cs: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
      seedVecs.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub))
    }
    def mats(): IndexedSeq[CentroidMatrix] = (0 until m).map { s =>
      CentroidMatrix(cs(s).zipWithIndex.toIndexedSeq.map {
        case (v, i) => (i.toLong, v) })
    }
    var iter = 0
    var moved = true
    while (iter < maxIters && moved) {
      val ms = mats()
      // ONE fused Lloyd job: per row, assign all m slices; explode to
      // (s, centroid, pos, x); aggregate with step's exact decimal sums
      val assigned = corpus.select(posexplode(array((0 until m).map { s =>
        struct(
          VectorExprFunctions
            .nearest_centroid(slice(col(vecCol), s * sub + 1, sub), ms(s))
            .getField("centroid_id").as("cid"),
          slice(col(vecCol), s * sub + 1, sub).as("sv"))
      }: _*)).as(Seq("s", "a")))
      val means = assigned
        .select(col("s"), col("a.cid").as("centroid_id"),
          posexplode(col("a.sv")).as(Seq("pos", "x")))
        .groupBy(col("s"), col("centroid_id"), col("pos"))
        .agg(
          sum((col("x").cast(DecimalType(18, 6)) * lit(1000000)).cast("long"))
            .as("s6"),
          count(lit(1)).as("n"))
        .select(col("s"), col("centroid_id"), col("pos"),
          (expr("cast(if(s6 < 0, -((abs(s6) * 2 + n) div (2 * n)), " +
            "(abs(s6) * 2 + n) div (2 * n)) as double)") / lit(1000000.0))
            .as("m"))
        .collect() // m·k·sub rows — control plane, like fit's collect
        .groupBy(_.getInt(0))
        .map { case (s, rows) =>
          s -> rows.groupBy(_.getLong(1)).map { case (cid, rs) =>
            val v = new Array[Double](sub)
            rs.foreach(r => v(r.getInt(2)) = r.getDouble(3))
            cid.toInt -> v
          }
        }
      moved = false
      cs = Array.tabulate(m) { s =>
        val bySub = means.getOrElse(s, Map.empty)
        cs(s).zipWithIndex.map { case (old, i) =>
          val next = bySub.getOrElse(i, old)
          if (!java.util.Arrays.equals(next, old)) moved = true
          next
        }
      }
      iter += 1
    }
    mats()
  }

  /** Within-cluster sum of squared distances — the objective; used by
    * specs to assert Lloyd's monotone improvement.
    */
  def sse(
      corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Double =
    Similarity.ivfAssign(corpus, centroids, idCol, vecCol)
      .agg(sum(col("dist2"))).head().getDouble(0)
}
