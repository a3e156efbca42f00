package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.expressions.TextHashFunctions.token_hashes

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely
  * its hashed-n-gram feature bag is under a TARGET corpus distribution
  * than under the RAW corpus distribution, and keep the target-like
  * tail. The published recipe for "make 100 TB of crawl look like
  * Wikipedia": fit two bag-of-hashed-ngrams unigram models, weight
  * each document by its log likelihood ratio, resample.
  *
  * Features: per-token 64-bit hashes (FNV-1a + splitmix64, the
  * engine's shared text-hash contract) folded into `buckets` bins by
  * the low bits, COUNTED WITH MULTIPLICITY — the paper's hashed
  * feature trick, which fixes the model size at `buckets` regardless
  * of corpus vocabulary.
  *
  * Scale shape: each corpus collapses to a `buckets`-row count table
  * (explode to 8-byte bucket ids, map-side partial counts); the
  * per-bucket log ratio table is tiny and BROADCASTS onto the scoring
  * pass, so raw text is read once and never shuffles — the only
  * exchange is the per-doc aggregation of (id, partial decimal sums).
  *
  * Determinism (the q82 recipe applied to a ratio): both smoothed
  * per-bucket log probabilities ln((c+1)/(T+B)) quantize to
  * DECIMAL(18,9) BEFORE subtraction, so the per-bucket ratio is exact
  * decimal, each doc's weight is an exact decimal dot product with its
  * integer bucket counts, and only the final per-token average sees
  * one double division + round — bit-reproducible under any
  * partitioning, which is what puts q90 under the DuckDB hash gate.
  */
object Dsir {

  /** Smoothed per-bucket log-probability table: (bucket, logp
    * DECIMAL(18,9)) over ALL `buckets` bins (zero-count bins get the
    * smoothing floor — they must score, not vanish).
    */
  private def bucketLogProbs(corpus: DataFrame, textCol: String, buckets: Int): DataFrame = {
    val spark = corpus.sparkSession
    val counts = corpus
      .select(explode(token_hashes(lower(col(textCol)))).as("h"))
      .select(pmod(col("h"), lit(buckets.toLong)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
    val all = spark.range(buckets).select(col("id").as("bucket"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("c"), lit(0L)).as("c"))
    val totals = all.agg(sum(col("c")).cast("long").as("t"))
    all.crossJoin(broadcast(totals))
      .select(col("bucket"),
        log((col("c") + 1).cast("double") /
            (col("t") + buckets).cast("double"))
          .cast(DecimalType(18, 9)).as("logp"))
  }

  /** Per-document importance weights of `raw` toward `target`:
    * (id, n_tokens, avg_logratio, selected) with
    * avg_logratio = round(Σ_tokens (logp_target − logp_raw) / n, 6)
    * and selected = avg_logratio > cutoff (cutoff 0 keeps documents
    * that look more target- than raw-like). Documents with no tokens
    * are excluded (no features to score).
    */
  def importanceWeights(
      raw: DataFrame, target: DataFrame, idCol: String, textCol: String,
      buckets: Int = 256, cutoff: Double = 0.0): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val ratios = bucketLogProbs(target, textCol, buckets)
      .withColumnRenamed("logp", "logp_t")
      .join(bucketLogProbs(raw, textCol, buckets), Seq("bucket"))
      // exact decimal subtraction of two DECIMAL(18,9) values
      .select(col("bucket"), (col("logp_t") - col("logp")).as("logratio"))
    val docBuckets = raw
      .select(col(idCol), explode(token_hashes(lower(col(textCol)))).as("h"))
      .select(col(idCol), pmod(col("h"), lit(buckets.toLong)).as("bucket"))
    docBuckets
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_tokens"),
        round(sum(col("logratio")).cast("double") / count(lit(1)), 6)
          .as("avg_logratio"))
      .withColumn("selected", col("avg_logratio") > cutoff)
  }
}
