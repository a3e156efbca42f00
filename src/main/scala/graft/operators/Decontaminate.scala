package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.expressions.TextHashFunctions

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark set — the standard guard
  * against test-set leakage into training corpora.
  *
  * Scale shape: the benchmark side is always small (eval suites are
  * thousands of documents, the training side is the 100 TB corpus) —
  * the benchmark's distinct n-gram hash set is broadcast, so the
  * training side is one scan + broadcast-semi-join + per-doc count
  * with map-side partial aggregation; only (id, count) rows shuffle.
  * N-grams compare by 64-bit FNV hash (native `ShingleHashes`
  * expression — already distinct per document, stays inside
  * whole-stage codegen): collision probability within any doc pair is
  * ~2^-64, the same argument that makes q23's string-side DuckDB
  * oracle a hard check of the hash-side set algebra.
  */
object Decontaminate {

  /** Per-training-doc contamination: (id, n_overlap) for every
    * training document sharing at least one distinct word `n`-gram
    * with any benchmark document.
    */
  def overlap(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    val trainGrams = train.select(col(idCol).as("id"),
      explode(TextHashFunctions.shingle_hashes(col(textCol), n)).as("g"))
    val benchGrams = bench
      .select(explode(TextHashFunctions.shingle_hashes(col(textCol), n)).as("g"))
      .distinct()
    trainGrams.join(broadcast(benchGrams), "g")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** Training rows surviving decontamination: fewer than `minOverlap`
    * shared n-grams. Anti-join on the (small) contaminated-id set.
    */
  def clean(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 8, minOverlap: Int = 1): DataFrame = {
    val bad = overlap(train, bench, idCol, textCol, n)
      .filter(col("n_overlap") >= minOverlap)
      .select(col("id").as(idCol))
    // no broadcast hint: the contaminated-id set is usually tiny and
    // AQE will broadcast it from runtime sizes, but heavy contamination
    // at corpus scale must be allowed to fall back to a shuffled join
    train.join(bad, Seq(idCol), "left_anti")
  }
}
