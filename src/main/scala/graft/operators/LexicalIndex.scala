package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Persisted BM25 inverted index — the storage half q96's per-query
  * [[Ranking.bm25TopK]] lacks: each batch of documents appends its
  * postings (token, doc_id, len, tf), its per-batch document
  * frequencies, and one corpus-stats row, so indexing a new period is
  * one tokenize pass over that period and a search never re-reads the
  * historical TEXT — the [[SignatureIndex]] pattern applied to lexical
  * retrieval.
  *
  * Incrementality is exact, not approximate: df(t) = Σ batch df(t) and
  * (N, total_len) = Σ batch stats are integer sums (each doc lives in
  * exactly one batch), so a search over an incrementally-built index is
  * BIT-IDENTICAL to [[Ranking.bm25TopK]] over the union of the batches
  * (spec-pinned) — the same DECIMAL-quantized arithmetic, the same
  * DuckDB oracle.
  *
  * Scale shape of [[search]]: the query terms broadcast-semi-filter
  * both the df table and the postings, so the corpus-sized side never
  * shuffles on terms; corpus totals aggregate the (batches-sized) stats
  * table; the final top-k is the bounded heap. Re-adding a doc_id
  * indexes it twice (same contract as [[SignatureIndex]]).
  *
  * Durability ([[IndexStore]]): writers serialize on an owner-token
  * claim (two pipelines loop-maintaining one index interleave appends
  * and folds safely — the multi-writer contract the table's commit
  * claim gives it), and an append publishes its three components
  * crash-ATOMICALLY: stage → intent marker → renames, repaired
  * deterministically — a crash can never leave postings counted while
  * the df/stats partials are missing (a silently WRONG index: idf
  * overstated, avgdl off). Searches never block on the claim; a search
  * concurrent with a fold's swap instant may transiently fail and can
  * simply be retried.
  */
final class LexicalIndex(val spark: SparkSession, val path: String) {

  import org.apache.hadoop.fs.Path

  private val store = new IndexStore(spark, path)

  private def postingsPath = s"$path/postings"
  private def dfPath = s"$path/df"
  private def statsPath = s"$path/stats"

  private def fs = store.fs

  def exists: Boolean = fs.exists(new Path(postingsPath))

  /** Stored postings: (token, doc_id, len, tf). */
  def readPostings(): DataFrame = spark.read.parquet(postingsPath)

  /** Per-batch document frequencies: (token, df). */
  def readDf(): DataFrame = spark.read.parquet(dfPath)

  /** Per-batch corpus stats: (n, tl). */
  def readStats(): DataFrame = spark.read.parquet(statsPath)

  /** The EXACT tokenization [[Ranking.bm25TopK]] uses — one shared
    * definition so index and oracle can never drift.
    */
  private def toks(c: Column) = when(length(trim(c)) === 0,
    array().cast("array<string>")).otherwise(split(trim(c), "\\s+"))

  /** Tokenize and index one batch of documents — ONE scan of the batch:
    * the doc-lengths frame persists across the three writes (postings,
    * df partials, stats), so the batch's text is read and tokenized
    * once, and the df write reuses the postings' shuffled `tf` rather
    * than re-exploding the corpus. At a daily loop cadence this is the
    * difference between reading each period once and three times.
    *
    * The three components land crash-atomically: they are written to a
    * per-batch stage directory and published in one marker-guarded
    * rename pass ([[IndexStore.publishStaged]]) under the writer
    * claim — a searcher can observe the index without this batch or
    * with all three of its components, never in between.
    */
  def append(
      docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): Unit = store.withClaim {
    store.repairAll()
    // posexplode_outer keeps token-less documents as one (null, null)
    // row, so the SAME pass that feeds the postings also carries every
    // document exactly once at pos 0/null — which is what lets the
    // corpus stats ride the postings write as observed metrics (the
    // TargetTable.writeCounted pattern: per-partition accumulators
    // merged on the driver, zero extra passes) instead of a second
    // tokenize scan
    // two-step select so the tokenization runs once per row (the
    // generator sits above a project holding `w`, not beside a second
    // split of the same text)
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      toks(col(textCol)).as("w"))
    val ex = base.select(col("doc_id"), size(col("w")).cast("long").as("len"),
      posexplode_outer(col("w")).as(Seq("pos", "token")))
    val isDocHead = col("pos").isNull || col("pos") === 0
    val obs = org.apache.spark.sql.Observation(
      s"lexidx_stats_${java.util.UUID.randomUUID().toString.take(8)}")
    val tf = ex.observe(obs,
        count(when(isDocHead, lit(1))).as("n"),
        coalesce(sum(when(isDocHead, col("len")).otherwise(lit(0L))), lit(0L))
          .as("tl"))
      .filter(col("token").isNotNull)
      .groupBy(col("doc_id"), col("len"), col("token"))
      .agg(count(lit(1)).as("tf"))
      // persisted across the two writes below: the df partials reuse
      // the postings' shuffled rows instead of re-exploding the text
      .persist()
    val batchId = java.util.UUID.randomUUID().toString.take(8)
    val stage = store.stagePath(batchId)
    try {
      tf.select(col("token"), col("doc_id"), col("len"), col("tf"))
        .write.parquet(s"$stage/postings")
      tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        .write.parquet(s"$stage/df")
      // N counts token-less docs too (they weight avgdl's denominator),
      // exactly like bm25TopK's totals — observed off the postings job
      import spark.implicits._
      // an EMPTY batch runs a zero-task write job whose observation
      // carries no metrics at all — that is genuinely (0, 0)
      val (n, tl) = scala.util.Try(
        (obs.get("n").asInstanceOf[Long], obs.get("tl").asInstanceOf[Long]))
        .getOrElse((0L, 0L))
      Seq((n, tl))
        .toDF("n", "tl")
        .coalesce(1)
        .write.parquet(s"$stage/stats")
    } finally { tf.unpersist(); () }
    store.publishStaged(batchId, Seq("postings", "df", "stats"))
  }

  /** Fold the accumulated per-batch partials — [[append]] grows one df
    * partial set, one stats row, and a few postings files PER BATCH, so
    * a daily loop accumulates 365 batches/year and the df table grows
    * ∝ batches × vocabulary. compact() folds df to one row per token
    * (Σ partials — the integer sum [[search]] computes anyway), stats
    * to ONE row, and coalesces the postings into `postingsFiles` files
    * — the manifest checkpoint-fold pattern applied to the index.
    * Search results are BIT-IDENTICAL before and after (spec-pinned):
    * the fold materializes exactly the aggregation the search's first
    * stage performs.
    *
    * Each component swaps via stage → intent marker → rename, and
    * [[repairFold]] (run at every append/search/compact entry) rolls a
    * crashed swap forward or back deterministically — the
    * TargetTable.initSwap state machine, one component at a time. Runs
    * under the writer claim, serialized against appends.
    */
  def compact(postingsFiles: Int = 0): Unit = store.withClaim {
    store.repairAll()
    val pf = if (postingsFiles > 0) postingsFiles
             else spark.sparkContext.defaultParallelism
    // the three staged fold builds are independent jobs over disjoint
    // component dirs — swapDirs overlaps them (each is small, so the
    // serialized form paid three full job tails), then swaps each in
    // sequentially under the unchanged one-marker crash contract
    store.swapDirs(Seq(
      "df" -> (out => readDf()
        .groupBy(col("token")).agg(sum(col("df")).as("df"))
        .write.parquet(out)),
      "stats" -> (out => readStats()
        .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
          coalesce(sum(col("tl")), lit(0L)).as("tl"))
        .coalesce(1).write.parquet(out)),
      "postings" -> (out => readPostings()
        .coalesce(pf).write.parquet(out))))
  }

  /** Heal a [[compact]] swap orphaned by a crash (see
    * [[IndexStore.repairFold]]). Returns whether anything was healed.
    */
  private[operators] def repairFold(): Boolean = store.repairFold()

  /** BM25 top-k over everything indexed so far — identical arithmetic
    * to [[Ranking.bm25TopK]] (IEEE-exact shape, LN quantized to
    * DECIMAL(18,9), order-free decimal contribution sum), so the
    * result matches a full-corpus run bit-for-bit. Returns
    * (queryIdCol, idCol, score, rank).
    */
  def search(
      queries: DataFrame, topK: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id",
      queryIdCol: String = "query_id", queryTextCol: String = "qtext"): DataFrame = {
    require(topK > 0 && k1 >= 0 && b >= 0 && b <= 1, s"bad params k1=$k1 b=$b topK=$topK")
    // heal crashed writers opportunistically, but never block a read
    // on a LIVE writer's claim (it runs the same repairs itself)
    store.tryWithClaim(store.repairAll())
    val k1p1 = k1 + 1.0
    val oneMinusB = 1.0 - b
    val tot = readStats().agg(sum(col("n")).as("n"), sum(col("tl")).as("tl"))
    val qterms = queries
      .select(col(queryIdCol), explode(toks(col(queryTextCol))).as("token"))
      .distinct()
    // per-batch df partials sum to the global df — semi-filtered by the
    // broadcast query terms BEFORE the aggregation, so the vocabulary-
    // sized table never aggregates in full
    val idfq = readDf()
      .join(broadcast(qterms.select(col("token")).distinct()), Seq("token"), "left_semi")
      .groupBy(col("token")).agg(sum(col("df")).as("df"))
      .crossJoin(broadcast(tot))
      .select(col("token"),
        log((col("n").cast("double") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5)) + lit(1.0))
          .cast(DecimalType(18, 9)).as("idf"))
    val scored = readPostings()
      .join(broadcast(qterms), Seq("token"))
      .join(broadcast(idfq), Seq("token"))
      .crossJoin(broadcast(tot))
      .select(col(queryIdCol), col("doc_id"),
        (col("idf").cast("double") * (col("tf") * lit(k1p1)) /
          (col("tf") + lit(k1) *
            (lit(oneMinusB) + lit(b) * col("len") /
              (col("tl").cast("double") / col("n")))))
          .cast(DecimalType(18, 9)).as("contrib"))
      .groupBy(col(queryIdCol), col("doc_id"))
      .agg(sum(col("contrib")).as("score"))
    CorpusStats.topKPerGroup(
      scored.withColumn("__s", col("score").cast("double")),
      queryIdCol, "doc_id", "__s", topK)
      .select(col(queryIdCol), col("doc_id").as(idCol),
        round(col("score"), 6).as("score"), col("rank"))
  }
}
