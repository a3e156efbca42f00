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

  /** Repetition metrics — the "repetitive text" quality rules: a doc
    * whose n-grams repeat heavily (boilerplate, keyword stuffing,
    * generation loops) shows a high duplicate-n-gram fraction.
    * Ratios over lowercased whitespace tokens; zero-shingle docs
    * (< n tokens) report 0 duplication. Pure map pass, no shuffle.
    */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    docs.select(
      col(idCol),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("distinct_tokens"),
      round(size(array_distinct(toks)).cast("double") / size(toks), 4)
        .as("type_token_ratio"),
      // total gram count is pure arithmetic (max(tokens-(n-1), 0));
      // distinct grams come from the native ShingleHashes expression
      // (already distinct, one hash pass) — materializing gram STRINGS
      // via transform+concat_ws evaluated as interpreted lambdas and
      // cost ~5 ms/doc, the round-1 HOF anti-pattern all over again
      nGrams(toks, n).as("n_grams"),
      round(when(nGrams(toks, n) === 0, 0.0)
        .otherwise((nGrams(toks, n) - distinctGrams(col(textCol), n)).cast("double")
          / nGrams(toks, n)), 4)
        .as("dup_gram_ratio"))
  }

  private def nGrams(toks: Column, n: Int): Column =
    greatest(size(toks) - (n - 1), lit(0))

  /** Distinct n-gram count via 64-bit FNV hashes (collision odds
    * ~2^-64 per doc — the q23 oracle argument).
    */
  private def distinctGrams(text: Column, n: Int): Column =
    size(graft.functions.expressions.TextHashFunctions
      .shingle_hashes(lower(text), n))

  /** Composite quality-rule flags (the classic corpus-filter rulebook:
    * per-signal pass/fail plus the conjunction) — mean token length in
    * a sane band, document long enough, some stopword signal, symbols
    * not dominating, text not mostly repeated n-grams. Thresholds are
    * parameters so pipelines tune them per corpus; defaults follow the
    * published heuristic ranges. One map pass, no shuffle.
    */
  def qualityFlags(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 8, minMeanTokLen: Double = 3.0,
      maxMeanTokLen: Double = 12.0,
      // published corpus-filter heuristics use ~0.05–0.1; 0.0 would make
      // the stopword rule vacuously true for every non-empty doc
      minStopRatio: Double = 0.05,
      maxPunctRatio: Double = 0.3, maxDupGramRatio: Double = 0.3): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val meanLen = length(t).cast("double") / size(toks)
    val stopR = stopwordCount(t, EnStop).cast("double") / size(toks)
    val punctR = punctCount(t).cast("double") / length(t)
    val g = nGrams(tokens(lower(t)), 3)
    val dupR = when(g === 0, 0.0)
      .otherwise((g - distinctGrams(t, 3)).cast("double") / g)
    val flags = Seq(
      (size(toks) >= minTokens).as("len_ok"),
      (meanLen >= minMeanTokLen && meanLen <= maxMeanTokLen).as("tok_len_ok"),
      (stopR >= minStopRatio).as("stopword_ok"),
      (punctR <= maxPunctRatio).as("punct_ok"),
      (dupR <= maxDupGramRatio).as("repetition_ok"))
    docs.select(col(idCol) +: flags: _*)
      .withColumn("passes",
        col("len_ok") && col("tok_len_ok") && col("stopword_ok") &&
          col("punct_ok") && col("repetition_ok"))
  }

  /** PII patterns — the C4/RefinedWeb-style scrub stage. Restricted to
    * the regex subset where Java regex (Spark codegen) and RE2
    * (DuckDB/Go scrubbers) agree: no backreferences, no lookaround, so
    * the redaction is reproducible across engines (q61's oracle).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val Ipv4Re  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redact emails, phone numbers, and IPv4 addresses with typed
    * placeholder tokens, reporting per-category match counts (counted
    * BEFORE redaction). Order matters and is fixed — email, phone, IP —
    * so nested matches resolve deterministically. Pure map pass, no
    * shuffle, codegen'd regex.
    */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      regexp_count(t, lit(EmailRe)).cast("int").as("n_emails"),
      regexp_count(t, lit(PhoneRe)).cast("int").as("n_phones"),
      regexp_count(t, lit(Ipv4Re)).cast("int").as("n_ips"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "[EMAIL]"),
          PhoneRe, "[PHONE]"),
        Ipv4Re, "[IP]").as("redacted"))
  }

  /** Canonical text normalization for dedup keys and training text:
    * fold accents (native NFD expression), lowercase, collapse runs of
    * whitespace to one space, trim. Pure map pass — stays inside
    * whole-stage codegen, no shuffle — and deterministic, so it can
    * run BEFORE exact/near dedup to make "Café  X" and "cafe x" hash
    * identically.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      lower(graft.functions.expressions.NormalizeFunctions.fold_accents(text)),
      "\\s+", " "))

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
