package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Loan-scoped caching for operators whose pipeline reads an
  * intermediate several times (LSH signatures, cell assignments,
  * fixture corpora): persist the pins, EAGERLY materialize the result
  * as a local checkpoint — consuming every pin exactly while it is
  * hot — then release the pins in a finally.
  *
  * Contract: the operator leaves NOTHING in the session's cache
  * manager (`spark.sharedState.cacheManager`), so long-lived sessions
  * composing many pipelines never accumulate pinned blocks — the
  * cross-query cache-leak regression Bench once worked around by
  * clearing the cache between queries. The checkpoint blocks behind
  * the returned frame free via the ContextCleaner when the frame is
  * garbage-collected, or immediately via
  * [[org.apache.spark.sql.graft.ColumnBridge.freeLocalCheckpoint]].
  *
  * The eager materialization is the price of self-cleaning: the scope
  * must know the pins' consumers have RUN before it can release them.
  * Use only where the result is far smaller than the pinned
  * intermediates (verified pair lists, per-row flags) — which is every
  * dedup/ANN pipeline here. At cluster scale the same shape holds with
  * a reliable checkpoint to storage instead of executor blocks.
  */
private[graft] object CacheScope {

  def pinned(pins: DataFrame*)(body: => DataFrame): DataFrame = {
    // idempotent pin: a frame the caller (or an enclosing scope)
    // already persisted is left at its level, but still released here —
    // the innermost completed scope wins, matching the loan shape
    pins.foreach { p =>
      if (p.storageLevel == StorageLevel.NONE)
        p.persist(StorageLevel.MEMORY_AND_DISK)
    }
    try body.localCheckpoint(true)
    finally pins.foreach(_.unpersist(blocking = false))
  }
}
