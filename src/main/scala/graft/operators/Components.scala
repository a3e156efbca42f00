package graft.operators

import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the cluster
  * step of near-duplicate deduplication: pairs from MinHash / SimHash /
  * embedding LSH become edges, and each document is assigned the
  * minimum id of its component so one representative per duplicate
  * CLUSTER can be kept (pairwise keep-min alone under-deletes: a~b and
  * b~c leaves both a and c when b is dropped).
  *
  * Algorithm: min-label propagation ("hash-min") with pointer jumping.
  * Every node starts labeled with its own id; each round a node takes
  * the min of its label, its neighbors' labels, AND its label's label
  * (path halving). Plain hash-min needs O(diameter) rounds; the
  * pointer-jumping term compresses discovered chains so convergence is
  * O(log diameter) — two-row-per-edge joins, no quadratic step
  * anywhere.
  *
  * Scale shape (100 TB): each round shuffles (id, label) pairs — 16
  * bytes per node plus 16 per directed edge, never document payloads —
  * partitioned by id, so rounds reuse the same hash partitioning.
  * Near-dup graphs are dense blobs with tiny diameter (duplicate
  * clusters), so 3–5 rounds is typical. Each round's label set is
  * local-checkpointed (lineage truncation is REQUIRED: every round
  * references the prior labels three times, so the un-truncated plan
  * grows 3^rounds) and the previous round's checkpoint blocks are
  * freed once the new one is materialized — one live copy of the node
  * set at any time (on a real cluster, swap for a reliable
  * `checkpoint` to storage). Convergence detection is an Observation
  * metric collected during the round's own aggregation — no separate
  * probe job and no extra pass over the label set.
  */
object Components extends Logging {

  /** Per-round lineage-truncation strategy. [[Checkpointing.Local]]
    * is `localCheckpoint` — executor-local blocks, fast, but a lost
    * executor loses blocks and fails the JOB on a real cluster
    * (acceptable local-mode / retry-the-job semantics).
    * [[Checkpointing.Reliable]] names a checkpoint directory
    * (HDFS/object-store path on a real cluster) and rounds checkpoint
    * through storage instead: lost executors recompute from the
    * checkpoint files, at the cost of one write+read of the (id,label)
    * set per round. The files accumulate for the run's duration (Spark
    * reclaims them with the RDD GC when
    * `spark.cleaner.referenceTracking.cleanCheckpoints` is set); label
    * sets are 16 bytes/node — at 1B nodes a round writes ~16 GB, noise
    * next to the corpus it deduplicates. [[Checkpointing.Global]] (the
    * parameter default) defers to [[checkpointDir]].
    */
  sealed trait Checkpointing
  object Checkpointing {
    /** Defer to the process-global [[checkpointDir]]. */
    case object Global extends Checkpointing
    /** Force `localCheckpoint`, whatever the global says. */
    case object Local extends Checkpointing
    /** Reliable `checkpoint` through `dir`. */
    final case class Reliable(dir: String) extends Checkpointing
  }

  /** Process-global FALLBACK strategy, used by calls that pass
    * [[Checkpointing.Global]] (the default) — kept for operational
    * one-knob setup; co-resident pipelines that need to differ pass
    * their strategy per call instead.
    */
  @volatile var checkpointDir: Option[String] = None

  /** The last dir this object passed to setCheckpointDir — Spark
    * appends a UUID subdir, so getCheckpointDir can't be compared back.
    */
  @volatile private var ckptDirSet: Option[String] = None

  private def resolvedDir(ckpt: Checkpointing): Option[String] = ckpt match {
    case Checkpointing.Global        => checkpointDir
    case Checkpointing.Local         => None
    case Checkpointing.Reliable(dir) => Some(dir)
  }

  /** Truncate lineage per the resolved strategy (eager either way —
    * convergence Observations fire on materialization).
    */
  private def truncated(df: DataFrame, dir: Option[String]): DataFrame = dir match {
    case None => df.localCheckpoint()
    case Some(d) =>
      val sc = df.sparkSession.sparkContext
      if (!ckptDirSet.contains(d) || sc.getCheckpointDir.isEmpty) {
        sc.setCheckpointDir(d)
        ckptDirSet = Some(d)
      }
      df.checkpoint()
  }

  /** Free a truncated round's storage where the strategy allows it
    * (executor-local blocks are explicitly dropped; reliable checkpoint
    * files are left for Spark's reference-tracking GC).
    */
  private def free(df: DataFrame, dir: Option[String]): Unit =
    if (dir.isEmpty)
      org.apache.spark.sql.graft.ColumnBridge.freeLocalCheckpoint(df)

  /** Assign each node of `nodes` the minimum node id reachable over
    * `edges` (undirected). Ids must be integral (castable to long) and
    * edge endpoints must come from `nodes`' id domain. Returns
    * (`idCol`, cluster_id) — singletons get their own id.
    *
    * Throws if not converged within `maxIter` rounds (with pointer
    * jumping, 2^maxIter path length — unreachable in practice; a
    * non-converged result would be silently wrong, so fail loudly).
    */
  def connectedComponents(
      nodes: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25,
      ckpt: Checkpointing = Checkpointing.Global): DataFrame = {
    val dir = resolvedDir(ckpt)
    val e = edges.select(col(srcCol).cast("long").as("s"), col(dstCol).cast("long").as("d"))
    // both directions, deduped: parallel edges would only re-send the
    // same min and pay shuffle volume for it
    val und = e.unionAll(e.select(col("d").as("s"), col("s").as("d")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // localCheckpoint (not persist): each round references the prior
    // labels THREE times, so without lineage truncation the logical
    // plan grows 3^rounds (measured: treeString alone OOMs by round
    // ~7). The prior round's checkpoint blocks are freed once the new
    // one is materialized and compared — one live copy at any time.
    //
    // Convergence detection rides the round's own aggregation instead
    // of a separate join-and-probe job: the prior label enters the
    // union tagged as `old` (exactly one labels row per id, so
    // max(old) recovers it), and an Observation metric counts
    // lbl != old rows while the eager localCheckpoint materializes —
    // zero extra passes over the label set per round.
    var labels = truncated(nodes
      .select(col(idCol).cast("long").as("id"), col(idCol).cast("long").as("lbl")),
      dir)
    var converged = false
    var round = 0
    while (!converged && round < maxIter) {
      // FUSED round: the neighbor-min and pointer-jump terms are the
      // SAME join applied to two edge sets — the undirected edges, and
      // the label assignment itself viewed as id→lbl edges (joining
      // those with labels on lbl = id IS label-of-label). One join and
      // one exchange-pair per round instead of two joins and three:
      // the unioned (id, lbl) multiset feeding min() is identical row
      // for row to the old nbr ∪ jump, so results are bit-identical;
      // per round this shuffles E+V edge rows once instead of E (nbr
      // build side) + V (jump probe side) + V (jump build side).
      val prop = und.unionAll(labels.select(col("id").as("s"), col("lbl").as("d")))
        .as("e")
        .join(labels.as("l"), col("e.d") === col("l.id"))
        .select(col("e.s").as("id"), col("l.lbl").as("lbl"))
      val nullLbl = lit(null).cast("long")
      val obs = new org.apache.spark.sql.Observation(
        s"cc_round_${round}_${java.util.UUID.randomUUID()}")
      val next = truncated( // eager: materializes and fires the observation
        labels.select(col("id"), col("lbl"), col("lbl").as("old"))
          .unionAll(prop.select(col("id"), col("lbl"), nullLbl.as("old")))
          .groupBy(col("id"))
          .agg(min(col("lbl")).as("lbl"), max(col("old")).as("old"))
          .observe(obs, sum(when(col("lbl") =!= col("old"), 1L).otherwise(0L)).as("changed"))
          .select(col("id"), col("lbl")), dir)
      converged = obs.get("changed").asInstanceOf[Long] == 0L
      free(labels, dir)
      labels = next
      round += 1
    }
    und.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    logInfo(s"connectedComponents converged in $round rounds")
    labels.select(col("id").as(idCol), col("lbl").as("cluster_id"))
  }

  /** Cross-batch incremental components: fold a NEW batch's nodes and
    * near-dup edges into an existing (id, cluster_id) assignment
    * without re-reading historical pairs or text. The previous
    * assignment is itself a spanning star of each old component
    * (id — cluster_id edges connect exactly what the original edge set
    * connected), so running [[connectedComponents]] over
    * star-edges ∪ new-edges is EXACTLY the full recompute — at the
    * cost of one edge per old non-root node plus the batch's edges.
    * New edges that bridge two old clusters relabel both to the global
    * min; this pairs with [[SignatureIndex]], which produces the
    * batch-vs-corpus candidate pairs the same way.
    */
  def incrementalComponents(
      prevLabels: DataFrame, // (idCol, cluster_id) from a prior run
      newNodes: DataFrame,
      idCol: String,
      newEdges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25,
      ckpt: Checkpointing = Checkpointing.Global): DataFrame = {
    val nodes = prevLabels.select(col(idCol))
      .unionAll(newNodes.select(col(idCol)))
      .distinct()
    val starEdges = prevLabels
      .filter(col(idCol) =!= col("cluster_id"))
      .select(col(idCol).as(srcCol), col("cluster_id").as(dstCol))
    connectedComponents(nodes, idCol,
      starEdges.unionAll(newEdges.select(col(srcCol), col(dstCol))),
      srcCol, dstCol, maxIter, ckpt)
  }

  /** [[connectedComponents]] plus the size of each cluster — the usual
    * curation output (keep cluster_id == id, or audit big clusters).
    */
  def clusterAssign(
      nodes: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 25,
      ckpt: Checkpointing = Checkpointing.Global): DataFrame = {
    val cc = connectedComponents(nodes, idCol, edges, srcCol, dstCol, maxIter, ckpt)
    val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "cluster_id")
      .select(col(idCol), col("cluster_id"), col("cluster_size"))
  }
}
