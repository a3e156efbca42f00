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
    * plus a CJK character-range check; highest hit-count wins, 'en' on
    * ties (deterministic order). Returns (id, predicted_lang, score).
    */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def score(words: Seq[String]): Column =
      stopwordCount(lower(t), words).cast("double") / tokenCount(t)
    val cjk = length(regexp_replace(t, "[^\\u4e00-\\u9fff]", "")).cast("double") / length(t)
    val scores = map(
      lit("en"), score(EnStop), lit("es"), score(EsStop),
      lit("de"), score(DeStop), lit("fr"), score(FrStop), lit("zh"), cjk * 10)
    // argmax over the map with fixed iteration order
    val langs = Seq("en", "es", "de", "fr", "zh")
    val best = langs.tail.foldLeft(struct(lit("en").as("lang"), scores(lit("en")).as("s"))) {
      (acc, l) =>
        when(scores(lit(l)) > acc.getField("s"),
          struct(lit(l).as("lang"), scores(lit(l)).as("s"))).otherwise(acc)
    }
    docs.select(col(idCol), best.getField("lang").as("predicted_lang"),
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
      winnowFingerprint(col(textCol), k, w).as("fingerprint"))
      .withColumn("fp_size", size(col("fingerprint")))
}
