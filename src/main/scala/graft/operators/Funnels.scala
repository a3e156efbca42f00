package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence funnel analysis: for each user, the earliest
  * completion of a stage sequence (first `stages(0)`, then the first
  * `stages(1)` strictly after it, and so on) — the standard
  * conversion-funnel query (view → click → purchase) that needs
  * ORDER-DEPENDENT mins, which a single aggregation pass cannot
  * express.
  *
  * Shape: one aggregation per stage, each shuffling ONE (user, min ts)
  * row per user per partition after map-side partials — never the raw
  * event stream — all hash-partitioned on the same user key, so AQE
  * reuses the partitioning across the per-stage joins. Earliest-first
  * semantics ("first qualifying event after the previous stage") is
  * the standard greedy definition and maximizes completion counts for
  * strictly-ordered funnels.
  *
  * Output: (`userCol`, stage_1_ts..stage_k_ts, stages_completed) with
  * NULL from the first uncompleted stage onward; only users reaching
  * stage 1 appear.
  */
object Funnels {

  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    var acc = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("stage_1_ts"))
    for (i <- 2 to stages.length) {
      val prev = s"stage_${i - 1}_ts"
      val cur = s"stage_${i}_ts"
      val nxt = events.filter(col(typeCol) === stages(i - 1))
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
      val keep = acc.columns.toIndexedSeq
      acc = acc.join(nxt,
          acc(userCol) === col("__u") && col("__ts") > acc(prev), "left")
        .groupBy(keep.map(acc(_)): _*)
        .agg(min(col("__ts")).as(cur))
    }
    val completed = (1 to stages.length)
      .map(i => when(col(s"stage_${i}_ts").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumn("stages_completed", completed.cast("int"))
  }
}
