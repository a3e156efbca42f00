package graft.plans

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, BinaryComparison, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan}

/** Static guard over a model's logical plan: verify the period
  * predicate actually constrains every time-bearing source scan.
  *
  * The reference can only trust the user to filter inside the period
  * ("Make sure your sql only inserts rows within the filter period",
  * `/root/reference/README.md:96`) — an unfiltered model silently
  * duplicates rows on every incremental run. With a Catalyst logical
  * plan we can check: walk from each leaf scan upward and require a
  * Filter whose condition compares some timestamp/date attribute
  * against a date/timestamp literal (the bound period boundary).
  *
  * This is an analysis-time check on the driver (SURVEY §4's optional
  * custom-rule candidate); it costs nothing at execution and is
  * independent of scale.
  */
object PeriodFilterGuard {

  /** Leaves of `df`'s analyzed plan that produce a date/timestamp
    * column but are NOT covered by any ancestor date-comparison filter.
    */
  def unguardedScans(df: DataFrame): Seq[LogicalPlan] = {
    val plan = df.queryExecution.analyzed
    collectUnguarded(plan, guarded = false)
  }

  /** Throw unless every time-bearing scan sits under a date filter. */
  def require(df: DataFrame): Unit = {
    val bad = unguardedScans(df)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "model has time-bearing scans without a period filter " +
          s"(reference README.md:96 contract): ${bad.map(_.nodeName).mkString(", ")}")
  }

  /** timestamp, timestamp_ntz, or date. */
  private def isTimeType(typeName: String): Boolean =
    typeName.startsWith("timestamp") || typeName == "date"

  private def hasTimeOutput(p: LogicalPlan): Boolean =
    p.output.exists(a =>
      isTimeType(a.dataType.typeName))

  /** Flag the node where time-typed columns enter the plan unguarded:
    * either a leaf scan with timestamp/date output, or the projection
    * that derives a time column from raw storage types (e.g. the
    * nanos-as-long normalization project sits ABOVE the parquet leaf).
    * A Join never introduces time itself, so each side is attributed
    * independently — an unfiltered pure-dimension scan is never
    * flagged.
    */
  private def collectUnguarded(p: LogicalPlan, guarded: Boolean): Seq[LogicalPlan] =
    p match {
      case f: Filter =>
        val g = guarded || hasDateComparison(f.condition)
        f.children.flatMap(collectUnguarded(_, g))
      case leaf: LeafNode =>
        if (hasTimeOutput(leaf) && !guarded) Seq(leaf) else Nil
      case other =>
        val introducesTime = !guarded && hasTimeOutput(other) &&
          other.children.nonEmpty && !other.children.exists(c =>
            c.exists(n => hasTimeOutput(n)))
        if (introducesTime) {
          // a projection deriving time from raw storage types (e.g.
          // nanos-as-long) may be range-restricted BELOW, on the raw
          // column — the pushdown-friendly pattern. Accept any
          // descendant literal-comparison filter as the period bound.
          val rawFiltered = other.exists {
            case f: Filter => hasLiteralComparison(f.condition)
            case _         => false
          }
          if (rawFiltered) Nil else Seq(other)
        } else other.children.flatMap(collectUnguarded(_, guarded))
    }

  /** Any comparison against a foldable (literal) operand. */
  private def hasLiteralComparison(cond: Expression): Boolean =
    cond.exists {
      case c: BinaryComparison => c.left.foldable || c.right.foldable
      case _                   => false
    }

  /** A comparison between a time-typed attribute (possibly under casts)
    * and a date/timestamp literal — the shape every bound period
    * predicate takes after Catalyst folds the boundary expression.
    */
  private def hasDateComparison(cond: Expression): Boolean = {
    def isTimeAttr(e: Expression): Boolean = e.exists {
      case a: Attribute =>
        isTimeType(a.dataType.typeName)
      case _ => false
    }
    def isTimeLiteral(e: Expression): Boolean = e.exists {
      case l: Literal =>
        isTimeType(l.dataType.typeName)
      case _ => false
    }
    cond.exists {
      case c: BinaryComparison =>
        (isTimeAttr(c.left) && isTimeLiteral(c.right)) ||
          (isTimeAttr(c.right) && isTimeLiteral(c.left))
      case _ => false
    }
  }
}
