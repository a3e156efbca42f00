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

  /** `points` with `ptCol` (numeric, e.g. epoch micros) joined to
    * `intervals` with [`loCol`, `hiCol`) half-open bounds; inner join,
    * output = point columns ++ interval columns.
    */
  def pointInInterval(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    import org.apache.spark.sql.types._
    def isIntegral(dt: DataType): Boolean = dt match {
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
    def bin(c: Column, dt: DataType): Column =
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

    val loT = intervals.schema(loCol).dataType
    val hiT = intervals.schema(hiCol).dataType
    val ptT = points.schema(ptCol).dataType
    // last covered bin of half-open [lo, hi): for integral bounds the
    // last covered unit is hi-1; for fractional bounds the interval
    // reaches up to (but not including) hi, so hi exactly on a bin
    // boundary backs off one bin
    val endBin =
      if (isIntegral(hiT)) bin(col(hiCol) - 1, hiT)
      else {
        val hb = bin(col(hiCol), hiT)
        when(col(hiCol).cast("double") === hb.cast("double") * binWidth, hb - 1).otherwise(hb)
      }

    val binnedIntervals = intervals
      .filter(col(loCol) < col(hiCol)) // empty interval matches nothing
      .withColumn("__bin", explode(sequence(bin(col(loCol), loT), endBin)))
    val binnedPoints = points.withColumn("__bin", bin(col(ptCol), ptT))
    binnedPoints.join(binnedIntervals, "__bin")
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bin")
  }
}
