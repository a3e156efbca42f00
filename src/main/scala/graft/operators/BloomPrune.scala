package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge

/** Bloom-filter join pruning — the 100 TB probe-side pre-filter.
  *
  * When a selective join's build side is too big to broadcast EXACTLY
  * but its key set fits a few-MB bloom filter, shipping the bloom to
  * the probe side filters non-matching rows BEFORE the join shuffle:
  * the shuffle then carries only probable matches instead of the full
  * probe table. False positives only cost wasted shuffle rows — the
  * exact join still runs, so results are identical to the plain join
  * (which is what the q47 oracle checks, and Spark's own runtime
  * row-level filtering does the same rewrite when statistics allow;
  * this operator makes it explicit and deterministic).
  *
  * Uses Spark's native `BloomFilterAggregate` / `BloomFilterMightContain`
  * Catalyst expressions over xxhash64 keys (via the ColumnBridge
  * pattern — they are internal until the SQL function surface exposes
  * them), so build and probe stay codegen'd.
  */
object BloomPrune {

  /** One-row frame holding a bloom filter of `df`'s xxhash64'd keys. */
  def bloomOf(df: DataFrame, keyCol: String, expectedItems: Long): DataFrame = {
    val hashed = ColumnBridge.expression(xxhash64(col(keyCol)))
    val agg = new BloomFilterAggregate(hashed, expectedItems).toAggregateExpression()
    df.select(ColumnBridge.column(agg).as("graft_bloom"))
  }

  /** `probe` rows whose key MIGHT be in `build` (no false negatives):
    * the pre-shuffle reduction step, usable standalone for semi-join
    * style filtering when approximation is acceptable.
    *
    * The bloom rides a scalar subquery (`might_contain` requires a
    * constant or scalar-subquery bloom — the same shape Spark's own
    * InjectRuntimeFilter emits), so the probe side stays a plain
    * Filter over the scan with no join node at all.
    */
  def probeFilter(probe: DataFrame, build: DataFrame, keyCol: String,
      expectedItems: Long): DataFrame = {
    val bloomPlan = bloomOf(build, keyCol, expectedItems).queryExecution.analyzed
    probe.filter(ColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomPlan),
      ColumnBridge.expression(xxhash64(col(keyCol))))))
  }

  /** Exact inner join with bloom pre-pruning of the probe side —
    * result-identical to `probe.join(build, key)`, shuffle bounded by
    * probable matches.
    */
  def prunedJoin(probe: DataFrame, build: DataFrame, keyCol: String,
      expectedItems: Long): DataFrame =
    probeFilter(probe, build, keyCol, expectedItems)
      .join(build, Seq(keyCol))
}
