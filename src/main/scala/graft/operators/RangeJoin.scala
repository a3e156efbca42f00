package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join without an equi-key — "which events
  * fall inside which incident windows". Spark plans a pure inequality
  * join as BroadcastNestedLoopJoin (every point × every interval),
  * which is quadratic and only survives when one side broadcasts.
  *
  * The scale path is bin replication: quantize time into fixed-width
  * bins, explode each interval to the bins it touches, map each point
  * to its single bin, and equi-join on the bin key — Spark then plans
  * a plain shuffled hash/sort-merge join on an 8-byte key. The exact
  * containment predicate re-filters the per-bin candidates, and each
  * qualifying (point, interval) pair matches in EXACTLY one bin (the
  * point's), so no dedup pass is needed. Cost scales with
  * points + Σ interval-bins + per-bin pair counts instead of
  * |points| × |intervals|; binWidth trades replication (long
  * intervals → many bins) against bin fan-in (wide bins → more
  * non-matching candidates).
  */
object RangeJoin {

  import org.apache.spark.sql.types._

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  // exact floor division for integral inputs: pmod keeps negatives
  // flooring instead of truncating toward zero, and the quotient is
  // taken with Catalyst's INTEGRAL divide (Column./ is double
  // division, which would misbin epoch-nano-scale values whose bin
  // index exceeds 2^53); the numerator is an exact multiple of
  // binWidth, so truncating integral division is exact. Fractional
  // inputs floor in double space.
  private def bin(c: Column, dt: DataType, binWidth: Long): Column =
    if (isIntegral(dt)) {
      import org.apache.spark.sql.graft.ColumnBridge
      import org.apache.spark.sql.catalyst.expressions.IntegralDivide
      val adj = c.cast("long") - pmod(c.cast("long"), lit(binWidth))
      ColumnBridge.column(IntegralDivide(
        ColumnBridge.expression(adj),
        ColumnBridge.expression(lit(binWidth)),
        evalMode = org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY))
        .cast("long")
    } else floor(c.cast("double") / binWidth).cast("long")

  // last covered bin of half-open [lo, hi): for integral bounds the
  // last covered unit is hi-1; for fractional bounds the interval
  // reaches up to (but not including) hi, so hi exactly on a bin
  // boundary backs off one bin
  private def endBin(hiCol: String, hiT: DataType, binWidth: Long): Column =
    if (isIntegral(hiT)) bin(col(hiCol) - 1, hiT, binWidth)
    else {
      val hb = bin(col(hiCol), hiT, binWidth)
      when(col(hiCol).cast("double") === hb.cast("double") * binWidth, hb - 1).otherwise(hb)
    }

  /** `points` with `ptCol` (numeric, e.g. epoch micros) joined to
    * `intervals` with [`loCol`, `hiCol`) half-open bounds; inner join,
    * output = point columns ++ interval columns.
    */
  def pointInInterval(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val loT = intervals.schema(loCol).dataType
    val ptT = points.schema(ptCol).dataType
    val binnedIntervals = intervals
      .filter(col(loCol) < col(hiCol)) // empty interval matches nothing
      .withColumn("__bin", explode(sequence(bin(col(loCol), loT, binWidth),
        endBin(hiCol, intervals.schema(hiCol).dataType, binWidth))))
    val binnedPoints = points.withColumn("__bin", bin(col(ptCol), ptT, binWidth))
    binnedPoints.join(binnedIntervals, "__bin")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bin")
  }

  /** Interval × interval OVERLAP join: rows of `a` and `b` whose
    * half-open intervals [lo, hi) intersect. Same bin-replication idea
    * as [[pointInInterval]], applied to both sides: each interval
    * explodes to the bins it covers, the equi-join on the bin key is
    * the only shuffle, and the exact predicate
    * `a.lo < b.hi AND b.lo < a.hi` re-filters per-bin candidates.
    *
    * A qualifying pair shares every bin its overlap region touches, so
    * a naive formulation emits it once per shared bin. The emit-once
    * guard keeps the pair ONLY in the bin containing the overlap's
    * start, `greatest(a.lo, b.lo)` — a point both sides' explosions
    * are guaranteed to cover — so no distinct/dedup pass is needed and
    * output cardinality is exact.
    *
    * Integral bound columns only (epoch micros, not double) — fail
    * loudly rather than risk float-binning drift on the guard bin.
    */
  def intervalOverlap(
      a: DataFrame, loA: String, hiA: String,
      b: DataFrame, loB: String, hiB: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    Seq(a.schema(loA).dataType, a.schema(hiA).dataType,
      b.schema(loB).dataType, b.schema(hiB).dataType).foreach { dt =>
      require(isIntegral(dt), s"intervalOverlap requires integral bounds, got $dt")
    }
    val clash = a.columns.toSet.intersect(b.columns.toSet)
    require(clash.isEmpty, s"column names must be disjoint, both sides have: $clash")
    def explodeBins(df: DataFrame, lo: String, hi: String, binName: String) =
      df.filter(col(lo) < col(hi))
        .withColumn(binName, explode(sequence(
          bin(col(lo), df.schema(lo).dataType, binWidth),
          endBin(hi, df.schema(hi).dataType, binWidth))))
    val ba = explodeBins(a, loA, hiA, "__bin")
    val bb = explodeBins(b, loB, hiB, "__bin")
    ba.join(bb, "__bin")
      .filter(col(loA) < col(hiB) && col(loB) < col(hiA))
      .filter(col("__bin") === bin(greatest(col(loA), col(loB)), LongType, binWidth))
      .drop("__bin")
  }
}
