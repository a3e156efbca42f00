package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Per-document text-analysis operators: quality scoring, language ID,
  * token counting, fingerprinting. All pure per-row columnar work
  * (codegen'd built-ins + higher-order functions, no UDFs) — at 100 TB
  * these run as a single map pass over the corpus with zero shuffle.
  */
object TextAnalysis {

  val EnStop = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "that")
  val EsStop = Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "una")
  val DeStop = Seq("der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein")
  val FrStop = Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour")

  /** Quality metrics per document: char/token counts, mean token
    * length, punctuation ratio, stopword ratio, uppercase ratio — the
    * standard cheap quality-filter signals.
    */
  def qualityMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      length(t).as("n_chars"),
      tokenCount(t).as("n_tokens"),
      round(length(t).cast("double") / tokenCount(t), 4).as("mean_token_len"),
      round(punctCount(t).cast("double") / length(t), 6).as("punct_ratio"),
      round(stopwordCount(t, EnStop).cast("double") / tokenCount(t), 4)
        .as("stopword_ratio"),
      round(length(regexp_replace(t, "[^A-Z]", "")).cast("double") / length(t), 6)
        .as("upper_ratio"))
  }

  /** Heuristic language ID: score against per-language stopword lists
    * plus a CJK character-range check; highest score wins, earlier
    * language on ties (deterministic order). One native scoring pass
    * per document (`LangScores`). Returns (id, predicted_lang, score).
    */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val langs = Seq("en", "es", "de", "fr", "zh")
    val scored = docs.select(col(idCol),
      graft.functions.expressions.TextHashFunctions
        .lang_scores(col(textCol), Seq(EnStop, EsStop, DeStop, FrStop)).as("scores"))
    def s(i: Int): Column = element_at(col("scores"), i + 1)
    val best = (1 until langs.size).foldLeft(
      struct(lit(langs.head).as("lang"), s(0).as("s"))) { (acc, i) =>
      when(s(i) > acc.getField("s"),
        struct(lit(langs(i)).as("lang"), s(i).as("s"))).otherwise(acc)
    }
    scored.select(col(idCol), best.getField("lang").as("predicted_lang"),
      round(best.getField("s"), 4).as("lang_score"))
  }

  /** Token counts: whitespace tokens + BPE-ish subword-approximation. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      tokenCount(col(textCol)).as("ws_tokens"),
      bpeishTokenCount(col(textCol)).as("bpeish_tokens"))

  /** Winnowing fingerprints: (id, fingerprint array, fingerprint size).
    * Two documents sharing any substring of length >= w+k-1 share a
    * fingerprint element — usable for containment detection via
    * explode + self-join on the 8-byte element.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 16): DataFrame =
    docs.select(col(idCol),
      graft.functions.expressions.TextHashFunctions
        .winnow_fingerprint(col(textCol), k, w).as("fingerprint"))
      .withColumn("fp_size", size(col("fingerprint")))
}
