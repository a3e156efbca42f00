package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFunctions.tokens

/** Unigram language-model perplexity quality scoring — the CCNet-style
  * corpus filter (Wenzek et al. 2019, arXiv:1911.00359): fit a unigram
  * LM on a reference corpus, score every document by the average
  * log-probability of its tokens under that model, and flag the low
  * tail (gibberish, boilerplate soup, OCR noise score far below
  * running text). Complements `TextAnalysis.qualityFlags` (rule-based)
  * with the model-based scorer the published pipelines actually rank by.
  *
  * Scale shape: the LM is a (token, logp) table built with one
  * explode + hash-agg over the reference corpus (map-side partials,
  * counts only — no text moves beyond individual tokens); scoring is
  * one explode + shuffle-join on the token key + per-doc hash-agg.
  * Vocabulary is Zipf-bounded (far below corpus size), so at 100 TB
  * the logp table is the small side and broadcasts; no stage ever
  * carries more than (token, 8-byte decimal) through an exchange.
  *
  * Determinism (the KMeans DECIMAL trick): per-token
  * logp = ln((c + k) / (T + k·V)) is quantized to DECIMAL(18,9)
  * at the model, so the per-document sum is EXACT decimal addition —
  * order-free under any partitioning — and only then divided and
  * rounded. The whole score is bit-reproducible on any cluster layout,
  * which is what lets q82 sit under the DuckDB hash gate.
  *
  * Tokens are lowercased whitespace tokens (the q29 convention);
  * documents with no non-empty tokens are excluded from the output
  * (they have no tokens to score — filter them with qualityFlags'
  * len_ok instead).
  */
object Perplexity {

  private def nonEmptyTokens(textCol: Column): Column = tokens(lower(textCol))

  /** Add-k-smoothed unigram log-probability table fit on `ref`:
    * (token, logp DECIMAL(18,9)) with logp = ln((c+k)/(T+k·V)),
    * T = total token count, V = vocabulary size.
    */
  def unigramLogProbs(ref: DataFrame, textCol: String, addK: Int = 1): DataFrame = {
    require(addK >= 1, s"addK must be >= 1, got $addK")
    val toks = ref
      .select(explode(nonEmptyTokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
    // corpus totals: a 1-row aggregate joined as a broadcast scalar
    // (the boundary-probe pattern), never a driver round-trip
    val totals = counts.agg(
      sum(col("c")).cast("long").as("t"), count(lit(1)).as("v"))
    counts.crossJoin(broadcast(totals))
      .select(
        col("token"),
        log((col("c") + addK).cast("double") /
            (col("t") + col("v") * addK).cast("double"))
          .cast(DecimalType(18, 9)).as("logp"))
  }

  /** Scores `docs` under a unigram LM fit on `ref` (pass the corpus
    * itself for self-scoring): (id, n_tokens, avg_logp, is_low_quality)
    * where avg_logp = round(Σ logp / n_tokens, 6) and the flag is
    * avg_logp < cutoff. Tokens unseen in `ref` are dropped from the
    * score (self-scoring has none; for a held-out reference, smooth
    * OOV upstream by unioning a floor corpus into `ref`).
    */
  def perplexityScore(
      docs: DataFrame, ref: DataFrame, idCol: String, textCol: String,
      addK: Int = 1, cutoff: Double = -8.0): DataFrame = {
    val lp = unigramLogProbs(ref, textCol, addK)
    val docToks = docs
      .select(col(idCol), explode(nonEmptyTokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    docToks
      .join(lp, "token")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_tokens"),
        // exact decimal sum, then ONE double division + round
        round(sum(col("logp")).cast("double") / count(lit(1)), 6)
          .as("avg_logp"))
      .withColumn("is_low_quality", col("avg_logp") < cutoff)
  }
}
