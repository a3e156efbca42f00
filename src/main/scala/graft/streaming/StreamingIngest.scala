package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.ibtp.TargetTable

/** Streaming ingestion into the materialization target — the bridge
  * between Structured Streaming and the IBTP table layout. Where the
  * batch loop tiles HISTORY into [from, to) periods and commits one
  * period per job, the stream tiles ARRIVING data into micro-batches
  * and commits one batch per trigger into the same day-partitioned
  * target; both leave a table `TargetTable.read()` serves identically.
  *
  * Exactly-once contract: `foreachBatch` is at-least-once (a batch can
  * replay after a failure), so each batch is written with dynamic
  * partition overwrite (`TargetTable.overwritePartitions`) — replaying
  * a batch rewrites the same day-partitions to the same state. That
  * makes the input contract explicit: the transformed stream must emit
  * each day's rows at most once across the query's lifetime, which is
  * exactly what a watermarked aggregation in append mode provides
  * (each window emits once, when the watermark closes it — e.g.
  * `EventStream.dailyAgg`). Raw un-aggregated streams should be
  * deduplicated upstream (`dropDuplicates` + watermark) and routed to
  * `TargetTable.append` instead, accepting at-least-once on replay.
  */
object StreamingIngest {

  /** Drain everything currently available in the source into the
    * target, then stop (`Trigger.AvailableNow`) — the streaming
    * catch-up run, resumable from `checkpoint` exactly like the batch
    * loop resumes from `maxPartitionDate`. Re-running after new data
    * arrives processes only the new files and writes only the newly
    * closed days.
    *
    * First non-empty batch on a fresh target runs init (CTAS + schema
    * sidecar); every batch after that overwrites its own partitions.
    */
  def catchUp(transformed: DataFrame, target: TargetTable, checkpoint: String): Unit = {
    val q = transformed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          if (!target.exists) target.init(batch)
          else target.overwritePartitions(batch)
        }
        ()
      }
      .start()
    q.awaitTermination()
  }
}
