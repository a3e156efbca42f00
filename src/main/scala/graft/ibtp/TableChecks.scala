package graft.ibtp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality checks on the built target — the reference's
  * recommended workflow run WITHOUT a `unique_key` and "test for
  * uniqueness only" (`/root/reference/README.md:102`, delegating to
  * dbt schema tests, which this package encodes as behavior).
  *
  * Each check returns the VIOLATING rows (empty = pass) so callers
  * can gate, log, or quarantine. Scale shape: uniqueness is one
  * hash aggregation on the key columns with map-side partials
  * (16-byte-ish rows, never payloads); not-null and accepted-values
  * are scan-side filters.
  */
object TableChecks {

  /** Key groups that occur more than once: (keys..., dup_count). */
  def uniqueViolations(df: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "uniqueness check requires key columns")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)
  }

  /** Rows with a NULL in any of `cols`. */
  def nullViolations(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "not-null check requires columns")
    df.filter(cols.map(c => col(c).isNull).reduce(_ || _))
  }

  /** Rows whose `column` is outside `allowed` (dbt accepted_values). */
  def acceptedValuesViolations(
      df: DataFrame, column: String, allowed: Seq[Any]): DataFrame =
    df.filter(!col(column).isin(allowed: _*) || col(column).isNull)

  /** Run uniqueness on a target and throw with a sample when violated
    * — the CLI's gate form.
    */
  def requireUnique(df: DataFrame, keys: Seq[String], sample: Int = 5): Unit = {
    // one action: the aggregation is the expensive step, so the gate
    // reports a bounded sample rather than re-scanning for a total
    val bad = uniqueViolations(df, keys).limit(sample + 1).collect()
    if (bad.nonEmpty) {
      val shown = bad.take(sample)
      val more = if (bad.length > sample) " (and more)" else ""
      throw new IllegalStateException(
        s"uniqueness violated on (${keys.mkString(", ")}): " +
          s"sample: ${shown.mkString("; ")}$more " +
          "(reference README.md:102: run without unique_key, test uniqueness)")
    }
  }
}
