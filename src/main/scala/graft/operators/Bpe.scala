package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge discovery (Sennrich et al. 2016) — the
  * core loop of tokenizer training, Spark-shaped. The corpus collapses
  * ONCE to a (word, count) vocabulary (the classic BPE trick: training
  * runs on word frequencies, never the raw text again), and every
  * merge iteration runs on that vocabulary: adjacent symbol pairs
  * weighted by word count, one global argmax, one symbol-string
  * rewrite. At 100 TB the vocabulary is millions of rows where the
  * corpus is billions — the per-iteration cost is a small aggregate,
  * and the control plane collects exactly ONE row per merge (the
  * argmax), the same bounded-collect shape as [[KMeans.fit]].
  *
  * Representation: a word's current symbols are a bracketed string
  * (`the` → `<t><h><e>`), so applying a merge is a literal
  * left-to-right non-overlapping string replace (`<t><h>` → `<th>`) —
  * unambiguous because `<`/`>` delimit symbols, and words are
  * restricted to `[a-z]+` so the brackets cannot collide with
  * content. Both the pair explode and the rewrite stay on the
  * vocabulary table. SentencePiece-style simplification: merges are
  * learned within words, with no end-of-word marker symbol.
  *
  * Pair counting counts overlapping occurrences (`aaa` has (a,a)
  * twice); application merges left-to-right non-overlapping (`aaa` →
  * `(aa)a`) — the standard BPE pair of semantics. Argmax tiebreak:
  * count DESC, then (left, right) lexicographic ASC, fully
  * deterministic.
  */
object Bpe {

  /** Fail-loudly cap on the merge-table size both trainers hold on the
    * driver (one small tuple per merge; real tokenizers stop around
    * 32–256k). A runaway nMerges would otherwise grow driver state and
    * run a Spark job per merge step, so it is rejected up front.
    */
  @volatile var maxMerges: Int = 262144

  private def checkMerges(nMerges: Int): Unit = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    require(nMerges <= maxMerges,
      s"nMerges=$nMerges exceeds the $maxMerges control-plane cap " +
        "(driver-held merge table, one Spark job per step) — real BPE " +
        "vocabularies stop far below this; raise Bpe.maxMerges only if " +
        "you truly mean it")
  }

  /** Learn `nMerges` merges; output one row per merge:
    * (step, merge_left, merge_right, pair_count).
    */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    checkMerges(nMerges)
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    // bracket every character: "the" -> "<t><h><e>". (A split-based
    // construction would leave a trailing empty symbol — Spark's split
    // keeps trailing empties, Java's String.split drops them.)
    var vocab = words
      .select(regexp_replace(col("w"), "(.)", "<$1>").as("s"), col("cnt"))
      .persist()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      val syms = split(regexp_replace(col("s"), "^<|>$", ""), "><")
      val top = vocab
        .select(col("cnt"), syms.as("__syms"))
        .filter(size(col("__syms")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(0), size(col("__syms")) - 2),
          i => struct(col("__syms")(i).as("l"), col("__syms")(i + 1).as("r"))))
          .as("__p"))
        .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, l, r, n))
        val next = vocab
          .withColumn("s",
            expr(s"replace(s, '<$l><$r>', '<$l$r>')"))
          .persist()
        next.count() // materialize before dropping the parent's cache
        vocab.unpersist()
        vocab = next
        step += 1
      }
    }
    vocab.unpersist()
    import spark.implicits._
    merges.result().toDF("step", "merge_left", "merge_right", "pair_count")
  }

  /** Batched merge discovery — the scale path for real vocabularies:
    * [[trainMerges]] collects ONE argmax row per merge, so a 32k-merge
    * tokenizer is 32k driver round-trips of a full vocabulary
    * aggregate. Each batched round instead collects the top
    * ~2·`batchSize` pairs in one bounded collect and applies the
    * greedy PAIRWISE-SYMBOL-DISJOINT prefix (up to `batchSize` merges)
    * in a single vocabulary rewrite — ceil(n/batchSize) aggregation
    * jobs instead of n.
    *
    * Exactness contract: disjoint-symbol merges cannot change each
    * other's pair counts (removing occurrences of `<a><b>` only
    * touches pairs adjacent to `a`/`b`, and the pairs a merge creates
    * all involve its own new symbol, which is also reserved), so every
    * applied merge is recorded at its true pre-round count and
    * batched ≡ sequential whenever sequential BPE would have picked
    * the same disjoint set — in particular always for `batchSize = 1`,
    * and for any corpus whose per-round top pairs share no symbol
    * (spec-verified). When tops DO overlap, the conflicting candidate
    * is deferred to the next round at its refreshed count — the
    * standard batching approximation, which cannot apply a merge at a
    * stale count but may order discovery differently than sequential.
    */
  def trainMergesBatched(
      docs: DataFrame, textCol: String, nMerges: Int,
      batchSize: Int = 64): DataFrame = {
    checkMerges(nMerges)
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    var vocab = words
      .select(regexp_replace(col("w"), "(.)", "<$1>").as("s"), col("cnt"))
      .persist()
    // rounds chain rewrites: without lineage truncation the analyzed
    // plan nests every previous round's 64 replace() calls and the
    // analyzer recursion blows the stack around round ~50 — each round
    // therefore local-checkpoints its vocabulary (the Components
    // pattern) and frees the previous round's blocks
    var vocabIsCheckpoint = false
    def releaseVocab(df: DataFrame): Unit =
      if (vocabIsCheckpoint)
        org.apache.spark.sql.graft.ColumnBridge.freeLocalCheckpoint(df)
      else df.unpersist(blocking = false)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      val syms = split(regexp_replace(col("s"), "^<|>$", ""), "><")
      // 8× headroom: conflicting candidates are skipped, not applied,
      // and on small alphabets the top of the list shares letters
      // heavily — a deeper bounded collect (still KB-sized rows) finds
      // disjoint picks further down and cuts the round count
      val top = vocab
        .select(col("cnt"), syms.as("__syms"))
        .filter(size(col("__syms")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(0), size(col("__syms")) - 2),
          i => struct(col("__syms")(i).as("l"), col("__syms")(i + 1).as("r"))))
          .as("__p"))
        .groupBy(col("__p.l").as("l"), col("__p.r").as("r"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(batchSize * 8)
        .collect()
      if (top.isEmpty) done = true
      else {
        // greedy disjoint prefix in (count DESC, l, r) order; reserve
        // each merge's operands AND its produced symbol so no later
        // candidate this round touches a symbol whose counts moved
        val used = scala.collection.mutable.Set.empty[String]
        val selected = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val it = top.iterator
        while (it.hasNext && selected.size < batchSize && step + selected.size <= nMerges) {
          val row = it.next()
          val (l, r, n) = (row.getString(0), row.getString(1), row.getLong(2))
          if (!used(l) && !used(r) && !used(l + r)) {
            selected += ((l, r, n))
            used += l; used += r; used += (l + r)
          }
        }
        if (selected.isEmpty) done = true // every candidate conflicted (can't happen: the first never does)
        else {
          selected.foreach { case (l, r, n) =>
            merges += ((step, l, r, n)); step += 1
          }
          val rewrite = selected.foldLeft("s") { case (acc, (l, r, _)) =>
            s"replace($acc, '<$l><$r>', '<$l$r>')"
          }
          // eager checkpoint: materializes the rewrite while the parent
          // is still cached AND truncates lineage for the next round
          val next = vocab.withColumn("s", expr(rewrite)).localCheckpoint()
          releaseVocab(vocab)
          vocab = next
          vocabIsCheckpoint = true
        }
      }
    }
    releaseVocab(vocab)
    import spark.implicits._
    merges.result().toDF("step", "merge_left", "merge_right", "pair_count")
  }

  /** Collects a trainer output (step, merge_left, merge_right, ...)
    * into the ordered driver-side merge table [[encode]] takes — the
    * same bounded control-plane collect the trainers already make
    * (one small tuple per merge, capped by [[maxMerges]]).
    */
  def collectMerges(mergesDf: DataFrame): Seq[(String, String)] = {
    val rows = mergesDf
      .select(col("step"), col("merge_left"), col("merge_right"))
      .limit(maxMerges + 1)
      .collect()
    require(rows.length <= maxMerges,
      s"merge table exceeds the $maxMerges control-plane cap")
    rows.sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
  }

  /** Encodes documents under a trained merge table: (doc_id, n_tokens,
    * encoded) where `encoded` is the bracketed-symbol string (words
    * joined by spaces) and `n_tokens` its symbol count. Tokenization
    * matches the trainer: lowercased whitespace tokens, `[a-z]+` only.
    *
    * The merge table rides into the executors as ONE broadcast-sized
    * reference object inside a native expression
    * ([[graft.functions.expressions.BpeEncode]]) — per-word cost is
    * independent of merge count, the whole encode is a single
    * narrow map pass (no shuffle, no join), and the projection stays
    * inside whole-stage codegen. This is the corpus→token-ids half of
    * the tokenizer story; [[trainMerges]] is the training half.
    */
  def encode(
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.size <= maxMerges,
      s"merge table exceeds the $maxMerges control-plane cap")
    val enc = graft.functions.expressions.BpeFunctions
      .bpe_encode(lower(col(textCol)), merges)
    docs
      .select(col(idCol).as("doc_id"), enc.as("encoded"))
      .select(col("doc_id"),
        (length(col("encoded")) -
          length(replace(col("encoded"), lit("<"), lit("")))).cast("int")
          .as("n_tokens"),
        col("encoded"))
  }
}
