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
  * Shape: stage 1 is a (user, min ts) aggregation with map-side
  * partials; each later stage equi-joins the accumulator against ONLY
  * that stage's filtered events on the user key (the ts inequality
  * rides the join as a non-equi condition) and re-aggregates the
  * min — so each event is shuffled at most once, for the one stage
  * whose type filter selects it, and every exchange hashes the same
  * user key. Earliest-first semantics ("first qualifying event after
  * the previous stage") is the standard greedy definition for
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
