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

  /** Learn `nMerges` merges; output one row per merge:
    * (step, merge_left, merge_right, pair_count).
    */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
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
}
