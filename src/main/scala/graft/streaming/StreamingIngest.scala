package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.Trigger

import graft.ibtp.TargetTable
import graft.operators.SignatureIndex

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
  def catchUp(transformed: DataFrame, target: TargetTable, checkpoint: String): Unit =
    // The stream writes through the SAME crash-repair machinery as the
    // batch loop (init swap, dynamic partition overwrite), so it is a
    // writer like any other and must hold the single-writer lease for
    // the query's lifetime — a batch run interleaving with a live
    // catch-up would "repair" its in-flight state destructively, the
    // exact class the lease serializes (reference warehouse txn,
    // `insert_by_timeperiod_loop.sql:134`). `foreachBatch` runs on the
    // driver, so the explicit per-micro-batch heartbeat surfaces a
    // lost lease at the next batch boundary (the daemon keeps the
    // lease fresh between batches regardless of batch duration).
    target.withWriterLease() {
      val q = transformed.writeStream
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          target.heartbeatLease()
          // no emptiness probe: actions on a foreachBatch frame re-run
          // its incremental plan, so a `batch.isEmpty` guard executed
          // the whole stateful aggregation ONCE FOR THE PROBE and again
          // for the write — doubling per-batch compute. The write path
          // is already empty-safe: an empty first batch is a
          // schema-sample init (the reference's `init.sql:9-19` case)
          // and an empty later batch is a no-op replace
          // (writeSnapshotReplace commits nothing when it neither
          // staged nor dropped a file).
          if (!target.exists) target.init(batch)
          else target.overwritePartitions(batch)
          ()
        }
        .start()
      q.awaitTermination()
    }

  /** Streaming incremental near-dup dedup: each micro-batch of
    * documents is checked against everything indexed so far (a
    * [[SignatureIndex]] band-key join — batch-vs-corpus, never
    * corpus²), its near-dup pairs land in `pairsPath` tagged with the
    * batch id, and its signatures join the index. The streaming form
    * of per-period corpus dedup: historical TEXT is never re-read,
    * only signature rows.
    *
    * Delivery note: `foreachBatch` is at-least-once — a replayed
    * batch re-appends its signatures and re-emits its pairs (tagged
    * with the same batch_id, so downstream consumers can drop
    * duplicates by (batch_id, id_a, id_b)). Self-pairs within the
    * replayed batch are suppressed by the index's exact-content
    * collapse, but exactly-once index contents would need a
    * batch-id-keyed write — acceptable for an idempotent consumer,
    * called out for one that isn't.
    */
  def dedupCatchUp(docs: DataFrame, idCol: String, textCol: String,
      index: SignatureIndex, pairsPath: String, checkpoint: String,
      threshold: Double = 0.5): Unit = {
    val q = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val pairs = index.dedupAndAppend(batch, idCol, textCol, threshold)
          pairs.withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(pairsPath)
        }
        ()
      }
      .start()
    q.awaitTermination()
  }
}
