package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Chunking, CorpusStats, Decontaminate, Dedup, Sampling}
import graft.sources.Tables

/** Corpus-curation queries (sampling, mixtures, decontamination,
  * keep-latest, global token stats, quantile filtering) — the
  * dataset-shaping half of the LLM-pipeline extensions, each with a
  * hard DuckDB oracle.
  *
  * Oracle portability notes baked into the designs:
  *  - sampling buckets come from md5 (identical in every engine);
  *    thresholds use floor over binary-exact rates, never ROUND;
  *  - n-gram overlap counts compare FNV-hash-side (Spark) against
  *    string-side (DuckDB) set algebra, the q23 argument;
  *  - quantiles use DuckDB's QUANTILE_DISC element-selection rule.
  */
object CurationQueries {

  /** Planted-contamination id offset (next after ExtensionQueries'
    * 1M/2M exact/near offsets).
    */
  private val ContamOffset = 3000000L

  // ---- deterministic sampling ---------------------------------------

  /** Per-source rates, binary-exact doubles (0.5/0.25) so
    * floor(rate*10000) is engine-independent.
    */
  val StratRates: Seq[(String, Double)] =
    (0 until 20).map(i => (s"src$i", if (i % 2 == 0) 0.5 else 0.25))

  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(
      Tables.documents(spark, dir).select(col("doc_id"), col("source")),
      "doc_id", "source", StratRates.toMap)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))

  val stratifiedSampleSql: String = {
    val values = StratRates.map { case (s, r) => s"('$s', $r)" }.mkString(", ")
    s"""WITH rates(source, rate) AS (VALUES $values)
       |SELECT d.doc_id, d.source
       |FROM documents d JOIN rates r USING (source)
       |WHERE ('0x' || SUBSTR(MD5(d.doc_id::VARCHAR), 1, 8))::UBIGINT % 10000
       |      < FLOOR(r.rate::DOUBLE * 10000)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Uniform language mixture: every lang downsampled to the rarest
    * lang's count, deterministically.
    */
  def uniformMixture(spark: SparkSession, dir: String): DataFrame =
    Sampling.uniformMixture(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
      "doc_id", "lang")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))

  /** Oracle recomputes rate = min(n)::DOUBLE / n — the same IEEE
    * double division as `Sampling.uniformMixture`, so floor(rate*1e4)
    * is bit-identical.
    */
  val uniformMixtureSql: String =
    """WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
      |rates AS (SELECT lang, (SELECT MIN(n) FROM counts)::DOUBLE / n AS rate FROM counts)
      |SELECT d.doc_id, d.lang
      |FROM documents d JOIN rates r USING (lang)
      |WHERE ('0x' || SUBSTR(MD5(d.doc_id::VARCHAR), 1, 8))::UBIGINT % 10000
      |      < FLOOR(r.rate * 10000)
      |ORDER BY d.doc_id""".stripMargin

  /** Exactly 10 deterministic docs per source (hash-ordered). */
  def exactKSample(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.exactKPerStratum(
      Tables.documents(spark, dir), "doc_id", "source", k = 10)
      .select(col("source"), col("doc_id"), col("rank"))
      .orderBy(col("source"), col("rank"))

  val exactKSampleSql: String =
    """SELECT source, doc_id,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY source
      |              ORDER BY ('0x' || SUBSTR(MD5(doc_id::VARCHAR), 1, 8))::UBIGINT % 10000 ASC,
      |                       doc_id ASC) AS INTEGER) AS rank
      |FROM documents
      |QUALIFY rank <= 10
      |ORDER BY source, rank""".stripMargin

  /** Per-source data card: corpus composition stats a curation run
    * reports — doc/token/char volumes, language spread, dominant
    * language (count DESC, lang ASC tiebreak via min_by on a
    * (-count, lang) struct).
    */
  def sourceDataCard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val base = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(TextFunctions.tokenCount(col("text")).cast("long")).as("total_ws_tokens"),
      round(avg(col("n_chars")), 4).as("mean_chars"),
      countDistinct(col("lang")).as("n_langs"))
    val topLang = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("lc"))
      .groupBy(col("source"))
      .agg(min_by(struct(col("lang").as("l"), col("lc").as("c")),
        struct((-col("lc")).as("nc"), col("lang").as("l"))).as("t"))
      .select(col("source"), col("t.l").as("top_lang"), col("t.c").as("top_lang_docs"))
    base.join(topLang, "source").orderBy(col("source"))
  }

  val sourceDataCardSql: String =
    """WITH base AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |         CAST(SUM(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+'))) AS BIGINT) AS total_ws_tokens,
      |         ROUND(AVG(n_chars), 4) AS mean_chars,
      |         COUNT(DISTINCT lang) AS n_langs
      |  FROM documents GROUP BY source
      |),
      |tl AS (
      |  SELECT source, lang AS top_lang, COUNT(*) AS top_lang_docs
      |  FROM documents
      |  GROUP BY source, lang
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY source
      |            ORDER BY COUNT(*) DESC, lang ASC) = 1
      |)
      |SELECT base.*, tl.top_lang, tl.top_lang_docs
      |FROM base JOIN tl USING (source)
      |ORDER BY source""".stripMargin

  /** Per-event-type value distribution in width-10 bins. */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.histogram(Tables.events(spark, dir), "value", binWidth = 10.0,
      groupCols = Seq("event_type"))
      .select(col("event_type"), col("bin"), col("bin_lo"), col("n"))
      .orderBy(col("event_type"), col("bin"))

  val valueHistogramSql: String =
    """SELECT event_type,
      |       CAST(FLOOR(value / 10.0) AS BIGINT) AS bin,
      |       ROUND(CAST(FLOOR(value / 10.0) AS BIGINT) * 10.0::DOUBLE, 6) AS bin_lo,
      |       COUNT(*) AS n
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY event_type, bin""".stripMargin

  // ---- decontamination ----------------------------------------------

  /** Train = non-src0 docs ∪ re-id'd copies of the src0 "benchmark"
    * (planted contamination: each copy shares all its 8-grams with
    * the benchmark); output = per-doc shared-8-gram counts.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("source") === "src0").select(col("doc_id"), col("text"))
    val train = docs.filter(col("source") =!= "src0").select(col("doc_id"), col("text"))
      .unionAll(bench.select((col("doc_id") + ContamOffset).as("doc_id"), col("text")))
    Decontaminate.overlap(train, bench, "doc_id", "text", n = 8)
      .orderBy(col("id"))
  }

  /** String-side 8-gram set overlap (vs the engine's FNV-hash side). */
  val decontaminateSql: String =
    """WITH bench AS (SELECT doc_id, text FROM documents WHERE source = 'src0'),
      |train AS (
      |  SELECT doc_id, text FROM documents WHERE source <> 'src0'
      |  UNION ALL
      |  SELECT doc_id + 3000000, text FROM bench
      |),
      |tg AS (
      |  SELECT doc_id,
      |         UNNEST(LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 6, 1)),
      |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
      |                || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6]
      |                || ' ' || toks[i+7]))) AS g
      |  FROM (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM train)
      |),
      |bg AS (
      |  SELECT DISTINCT UNNEST(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 6, 1)),
      |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
      |                || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' || toks[i+6]
      |                || ' ' || toks[i+7])) AS g
      |  FROM (SELECT STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks FROM bench)
      |)
      |SELECT t.doc_id AS id, COUNT(*) AS n_overlap
      |FROM tg t JOIN bg USING (g)
      |GROUP BY t.doc_id
      |ORDER BY id""".stripMargin

  // ---- keep-latest (CDC/recrawl dedup) ------------------------------

  def latestPerKey(spark: SparkSession, dir: String): DataFrame =
    Dedup.keepLatest(
      Tables.events(spark, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value")),
      keyCols = Seq("user_id"), orderCols = Seq("ts", "event_id"))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .orderBy(col("user_id"))

  val latestPerKeySql: String =
    """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
      |FROM events
      |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
      |                           ORDER BY ts DESC, event_id DESC) = 1
      |ORDER BY user_id""".stripMargin

  // ---- corpus statistics --------------------------------------------

  def tokenTopK(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.tokenTopK(Tables.documents(spark, dir), "text", k = 100)

  val tokenTopKSql: String =
    """SELECT token, COUNT(*) AS n
      |FROM (SELECT UNNEST(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\s+')) AS token
      |      FROM documents)
      |WHERE token <> ''
      |GROUP BY token
      |ORDER BY n DESC, token ASC
      |LIMIT 100""".stripMargin

  /** Quality floor: docs at/above the exact 25th percentile of
    * BPE-ish token count.
    */
  def quantileFilter(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir).select(col("doc_id"),
      TextFunctions.bpeishTokenCount(col("text")).as("bpeish_tokens"))
    CorpusStats.filterAboveQuantile(scored, "bpeish_tokens", 0.25)
      .orderBy(col("doc_id"))
  }

  /** Sequence packing: 64-token chunks with 8 tokens of overlap. */
  def chunkDocuments(spark: SparkSession, dir: String): DataFrame =
    Chunking.chunkByTokens(Tables.documents(spark, dir), "doc_id", "text",
      chunkTokens = 64, overlap = 8)
      .orderBy(col("doc_id"), col("chunk_idx"))

  /** Oracle mirrors the chunk arithmetic: stride 56, 1-based
    * inclusive LIST_SLICE ≡ Spark's slice(start, length) clamped at
    * the token-array end.
    */
  val chunkDocumentsSql: String =
    """WITH t AS (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\s+') AS toks
      |           FROM documents),
      |c AS (SELECT doc_id, toks,
      |             CASE WHEN LEN(toks) <= 64 THEN 1
      |                  ELSE 1 + CAST(CEIL((LEN(toks) - 64)::DOUBLE / 56) AS INTEGER)
      |             END AS nc
      |      FROM t),
      |idx AS (SELECT doc_id, toks, UNNEST(RANGE(0, nc)) AS i FROM c)
      |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
      |       CAST(LEN(LIST_SLICE(toks, i*56 + 1, i*56 + 64)) AS INTEGER) AS n_tokens,
      |       ARRAY_TO_STRING(LIST_SLICE(toks, i*56 + 1, i*56 + 64), ' ') AS chunk_text
      |FROM idx
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** Quality top-k per stratum: the 5 highest-BPE-ish-token-count
    * docs per source (score DESC, doc_id ASC).
    */
  def bestPerSource(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir).select(col("source"), col("doc_id"),
      TextFunctions.bpeishTokenCount(col("text")).as("score"))
    CorpusStats.topKPerGroup(scored, "source", "doc_id", "score", k = 5)
      .orderBy(col("source"), col("rank"))
  }

  val bestPerSourceSql: String =
    s"""WITH t AS (
       |  SELECT source, doc_id,
       |         LEN(REGEXP_EXTRACT_ALL(text, '${TextFunctions.BpeishPattern}'))::DOUBLE AS score
       |  FROM documents
       |)
       |SELECT source, doc_id, score,
       |       CAST(ROW_NUMBER() OVER (PARTITION BY source
       |                               ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
       |FROM t
       |QUALIFY rank <= 5
       |ORDER BY source, rank""".stripMargin

  /** Token-budget batch packing: per source in doc_id order, docs
    * pack into ~2048-BPE-ish-token batches.
    */
  def packBatches(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir).select(col("source"), col("doc_id"),
      TextFunctions.bpeishTokenCount(col("text")).as("n_tokens"))
    CorpusStats.packBatches(scored, "source", Seq("doc_id"), "n_tokens", capacity = 2048)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("batch_idx"))
      .orderBy(col("doc_id"))
  }

  val packBatchesSql: String =
    s"""WITH t AS (
       |  SELECT source, doc_id,
       |         CAST(LEN(REGEXP_EXTRACT_ALL(text, '${TextFunctions.BpeishPattern}')) AS INTEGER) AS n_tokens
       |  FROM documents
       |)
       |SELECT doc_id, source, n_tokens,
       |       CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |                   - n_tokens) / 2048) AS BIGINT) AS batch_idx
       |FROM t
       |ORDER BY doc_id""".stripMargin

  /** Per-document top-3 TF-IDF terms (rational smoothed idf — see
    * [[graft.operators.CorpusStats.tfidfTopTerms]] for why no ln).
    */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.tfidfTopTerms(Tables.documents(spark, dir), "doc_id", "text", k = 3)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"), col("rank"))

  val tfidfTopTermsSql: String =
    """WITH terms AS (
      |  SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\s+')) AS token
      |  FROM documents
      |),
      |tf AS (SELECT doc_id, token, COUNT(*) AS tf
      |       FROM terms WHERE token <> '' GROUP BY 1, 2),
      |dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents)
      |SELECT doc_id, token,
      |       ROUND(tf * (n.n + 1)::DOUBLE / (df + 1), 6) AS score,
      |       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
      |              ORDER BY tf * (n.n + 1)::DOUBLE / (df + 1) DESC, token ASC) AS INTEGER) AS rank
      |FROM tf JOIN dfreq USING (token), n
      |QUALIFY rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  val quantileFilterSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(LEN(REGEXP_EXTRACT_ALL(text, '${TextFunctions.BpeishPattern}')) AS INTEGER) AS bpeish_tokens
       |  FROM documents
       |)
       |SELECT doc_id, bpeish_tokens FROM t
       |WHERE bpeish_tokens >= (SELECT QUANTILE_DISC(bpeish_tokens, 0.25) FROM t)
       |ORDER BY doc_id""".stripMargin

  /** Per-source length percentiles (p25/p50/p90 of n_chars) — the
    * grouped exact-quantile data-card stat, computed histogram-side.
    */
  def groupedQuantiles(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.groupedQuantileDisc(Tables.documents(spark, dir),
      "source", "n_chars", Seq(0.25, 0.5, 0.9))
      .orderBy(col("source"), col("q"))

  val groupedQuantilesSql: String =
    """SELECT source, CAST(0.25 AS DOUBLE) AS q,
      |       CAST(QUANTILE_DISC(n_chars, 0.25) AS BIGINT) AS value
      |FROM documents GROUP BY source
      |UNION ALL
      |SELECT source, CAST(0.5 AS DOUBLE), CAST(QUANTILE_DISC(n_chars, 0.5) AS BIGINT)
      |FROM documents GROUP BY source
      |UNION ALL
      |SELECT source, CAST(0.9 AS DOUBLE), CAST(QUANTILE_DISC(n_chars, 0.9) AS BIGINT)
      |FROM documents GROUP BY source
      |ORDER BY source, q""".stripMargin

  /** Weight-proportional (importance) sample of documents by length at
    * expected fraction 0.3 — longer docs proportionally likelier,
    * deterministic md5 buckets, exact-integer thresholds.
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.weightedSample(
      Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")),
      "doc_id", "n_chars", fraction = 0.3)
      .orderBy(col("doc_id"))

  val weightedSampleSql: String =
    """WITH s AS (SELECT SUM(n_chars) AS w, COUNT(*) AS n FROM documents)
      |SELECT d.doc_id, d.n_chars
      |FROM documents d, s
      |WHERE ('0x' || SUBSTR(MD5(d.doc_id::VARCHAR), 1, 8))::UBIGINT % 10000
      |      < LEAST(10000, (3000 * d.n_chars * s.n) // s.w)
      |ORDER BY d.doc_id""".stripMargin

  /** Per-source winsorization of n_chars into the [p10, p90] band. */
  def winsorize(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.winsorize(
      Tables.documents(spark, dir).select(col("doc_id"), col("source"), col("n_chars")),
      "source", "n_chars", qLo = 0.1, qHi = 0.9)
      .select(col("doc_id"), col("source"), col("n_chars"), col("n_chars_winsorized"))
      .orderBy(col("doc_id"))

  val winsorizeSql: String =
    """WITH b AS (
      |  SELECT source, CAST(QUANTILE_DISC(n_chars, 0.1) AS BIGINT) AS lo,
      |         CAST(QUANTILE_DISC(n_chars, 0.9) AS BIGINT) AS hi
      |  FROM documents GROUP BY source
      |)
      |SELECT d.doc_id, d.source, d.n_chars,
      |       CASE WHEN d.n_chars IS NULL OR b.lo IS NULL OR b.hi IS NULL THEN NULL
      |            ELSE LEAST(GREATEST(d.n_chars, b.lo), b.hi) END AS n_chars_winsorized
      |FROM documents d LEFT JOIN b USING (source)
      |ORDER BY d.doc_id""".stripMargin

  /** Span-level (C4-style) dedup: 3-word spans deduped globally to
    * their first occurrence, documents rebuilt from surviving spans.
    * The small-vocabulary fixture makes cross-document span collisions
    * common, so the pass removes real content here (kept < total).
    */
  def spanDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.spanDedup(Tables.documents(spark, dir), "doc_id", "text", spanWords = 3)
      .orderBy(col("doc_id"))

  /** DuckDB oracle: same spans via list slicing, first occurrence via
    * a window, reassembly via ordered STRING_AGG.
    */
  val spanDedupSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         CASE WHEN TRIM(text) = '' THEN CAST([] AS VARCHAR[])
      |              ELSE STRING_SPLIT_REGEX(TRIM(text), '\s+') END AS w
      |  FROM documents
      |),
      |idx AS (
      |  SELECT doc_id, w,
      |         UNNEST(RANGE(0, CAST(CEIL(LEN(w) / 3.0) AS BIGINT))) AS span_idx
      |  FROM toks WHERE LEN(w) > 0
      |),
      |sp AS (
      |  SELECT doc_id, span_idx,
      |         ARRAY_TO_STRING(LIST_SLICE(w, span_idx * 3 + 1, span_idx * 3 + 3), ' ') AS span_text
      |  FROM idx
      |),
      |kept AS (
      |  SELECT doc_id, span_idx, span_text,
      |         ROW_NUMBER() OVER (PARTITION BY span_text ORDER BY doc_id, span_idx) AS rn
      |  FROM sp
      |),
      |rebuilt AS (
      |  SELECT doc_id,
      |         STRING_AGG(span_text, ' ' ORDER BY span_idx) AS clean_text,
      |         COUNT(*) AS kept_spans
      |  FROM kept WHERE rn = 1 GROUP BY doc_id
      |)
      |SELECT t.doc_id,
      |       COALESCE(r.clean_text, '') AS clean_text,
      |       COALESCE(r.kept_spans, 0) AS kept_spans,
      |       CAST(CEIL(LEN(t.w) / 3.0) AS BIGINT) AS total_spans
      |FROM toks t
      |LEFT JOIN rebuilt r ON r.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** Corpus-frequency boilerplate removal (RefinedWeb-style line
    * dedup over 8-token chunks): a chunk occurring in ≥ 2 distinct
    * documents drops EVERYWHERE (headers/footers/license boilerplate),
    * unlike q64's first-occurrence-wins. The fixture's shared phrasing
    * makes ~5% of chunks hot, so the pass removes real content at
    * every scale.
    */
  def chunkDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.boilerplateChunkDedup(Tables.documents(spark, dir),
      "doc_id", "text", chunkWords = 8, maxDocs = 2)
      .orderBy(col("doc_id"))

  /** DuckDB oracle: same chunks via list slicing, document frequency
    * per chunk string, anti-join via LEFT JOIN + IS NULL, ordered
    * STRING_AGG reassembly.
    */
  val chunkDedupSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         CASE WHEN TRIM(text) = '' THEN CAST([] AS VARCHAR[])
      |              ELSE STRING_SPLIT_REGEX(TRIM(text), '\s+') END AS w
      |  FROM documents
      |),
      |idx AS (
      |  SELECT doc_id, w,
      |         UNNEST(RANGE(0, CAST(CEIL(LEN(w) / 8.0) AS BIGINT))) AS chunk_idx
      |  FROM toks WHERE LEN(w) > 0
      |),
      |ch AS (
      |  SELECT doc_id, chunk_idx,
      |         ARRAY_TO_STRING(LIST_SLICE(w, chunk_idx * 8 + 1, chunk_idx * 8 + 8), ' ') AS chunk_text
      |  FROM idx
      |),
      |hot AS (
      |  SELECT chunk_text FROM ch GROUP BY chunk_text
      |  HAVING COUNT(DISTINCT doc_id) >= 2
      |),
      |kept AS (
      |  SELECT ch.doc_id, ch.chunk_idx, ch.chunk_text
      |  FROM ch LEFT JOIN hot USING (chunk_text)
      |  WHERE hot.chunk_text IS NULL
      |),
      |rebuilt AS (
      |  SELECT doc_id,
      |         STRING_AGG(chunk_text, ' ' ORDER BY chunk_idx) AS clean_text,
      |         COUNT(*) AS kept_chunks
      |  FROM kept GROUP BY doc_id
      |)
      |SELECT t.doc_id,
      |       COALESCE(r.clean_text, '') AS clean_text,
      |       COALESCE(r.kept_chunks, 0) AS kept_chunks,
      |       CAST(CEIL(LEN(t.w) / 8.0) AS BIGINT) AS total_chunks
      |FROM toks t
      |LEFT JOIN rebuilt r ON r.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** Exact duplicated-substring scrub (Lee et al. 2021 ExactSubstr,
    * arXiv:2107.06499): every token covered by an 8-token sliding
    * window that occurs ≥ 2 times corpus-wide (within-doc repeats
    * included) is removed from every occurrence — the sliding-grid
    * complement of q88's fixed chunks, catching duplicated passages at
    * any token offset.
    */
  def substringScrub(spark: SparkSession, dir: String): DataFrame =
    Dedup.duplicateWindowScrub(Tables.documents(spark, dir),
      "doc_id", "text", windowTokens = 8)
      .orderBy(col("doc_id"))

  /** DuckDB oracle: same sliding windows via list slicing, occurrence
    * count per window STRING (the engine's (hash, len) key is its
    * collision-safe stand-in), duplicated starts per doc, and a
    * NOT EXISTS coverage test per token index (hash-joinable on doc_id)
    * before ordered STRING_AGG reassembly.
    */
  val substringScrubSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |         CASE WHEN TRIM(text) = '' THEN CAST([] AS VARCHAR[])
      |              ELSE STRING_SPLIT_REGEX(TRIM(text), '\s+') END AS w
      |  FROM documents
      |),
      |idx AS (
      |  SELECT doc_id, w, UNNEST(RANGE(0, LEN(w) - 7)) AS s
      |  FROM toks WHERE LEN(w) >= 8
      |),
      |wins AS (
      |  SELECT doc_id, s,
      |         ARRAY_TO_STRING(LIST_SLICE(w, s + 1, s + 8), ' ') AS win_text
      |  FROM idx
      |),
      |dup AS (
      |  SELECT win_text FROM wins GROUP BY win_text HAVING COUNT(*) >= 2
      |),
      |ds AS (
      |  SELECT wins.doc_id, wins.s FROM wins JOIN dup USING (win_text)
      |),
      |tok_idx AS (
      |  SELECT doc_id, w, UNNEST(RANGE(0, LEN(w))) AS i
      |  FROM toks WHERE LEN(w) > 0
      |),
      |kept AS (
      |  SELECT t.doc_id, t.i, t.w[t.i + 1] AS tok
      |  FROM tok_idx t
      |  WHERE NOT EXISTS (SELECT 1 FROM ds
      |                    WHERE ds.doc_id = t.doc_id
      |                      AND ds.s <= t.i AND t.i < ds.s + 8)
      |),
      |rebuilt AS (
      |  SELECT doc_id, STRING_AGG(tok, ' ' ORDER BY i) AS clean_text,
      |         COUNT(*) AS kept_tokens
      |  FROM kept GROUP BY doc_id
      |)
      |SELECT t.doc_id,
      |       COALESCE(r.clean_text, '') AS clean_text,
      |       CAST(LEN(t.w) AS BIGINT) - COALESCE(r.kept_tokens, 0) AS removed_tokens,
      |       CAST(LEN(t.w) AS BIGINT) AS total_tokens
      |FROM toks t
      |LEFT JOIN rebuilt r ON r.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** Temperature-scaled mixture weights over languages (α = 0.5,
    * 1M-token budget): the multilingual-pretraining sampler — one
    * count row per language, sqrt weighting, per-language expected
    * epochs under the budget.
    */
  def temperatureMixture(spark: SparkSession, dir: String): DataFrame =
    Sampling.temperatureMixture(Tables.documents(spark, dir),
      "lang", TextFunctions.tokenCount(col("text")),
      alpha = 0.5, budgetTokens = 1000000L)
      .orderBy(col("lang"))

  /** DuckDB oracle: identical arithmetic — IEEE sqrt (correctly
    * rounded in both engines) quantized to DECIMAL(28,9), exact
    * decimal normalizer sum, the same double op order for both
    * outputs.
    */
  val temperatureMixtureSql: String =
    """WITH c AS (
      |  SELECT lang,
      |         CAST(SUM(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+'))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY lang
      |),
      |q AS (
      |  SELECT lang, n_tokens,
      |         CAST(SQRT(CAST(n_tokens AS DOUBLE)) AS DECIMAL(28,9)) AS na
      |  FROM c
      |),
      |z AS (SELECT SUM(na) AS z FROM q)
      |SELECT lang, n_tokens,
      |       ROUND(CAST(na AS DOUBLE) / CAST(z.z AS DOUBLE), 6) AS weight,
      |       ROUND(CAST(na AS DOUBLE) / CAST(z.z AS DOUBLE) * 1000000 / n_tokens, 6) AS expected_epochs
      |FROM q, z
      |ORDER BY lang""".stripMargin

  /** Schema-level profile of orders: one aggregation pass, one row per
    * column. Integer/string columns only — float min/max would compare
    * engine FORMATTING, not values.
    */
  def tableProfile(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.tableProfile(Tables.orders(spark, dir),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
      .orderBy(col("column"))

  val tableProfileSql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS "column", COUNT(*) AS n_rows,
         |       COUNT(*) - COUNT($c) AS n_nulls,
         |       COUNT(DISTINCT $c) AS n_distinct,
         |       CAST(MIN($c) AS VARCHAR) AS min_value,
         |       CAST(MAX($c) AS VARCHAR) AS max_value
         |FROM orders""".stripMargin
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
  }

  /** Robust per-source length outliers: |n_chars − median| > 3·MAD,
    * both quantiles exact (integral arithmetic end to end).
    */
  def madOutliers(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.madOutliers(Tables.documents(spark, dir), "source", "n_chars", k = 3)
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("med"), col("mad"), col("is_outlier"))
      .orderBy(col("doc_id"))

  /** DuckDB oracle: QUANTILE_DISC for both the median and the MAD —
    * the same ceil(n·q) element rule the histogram-side engine path
    * implements (verified for q70).
    */
  val madOutliersSql: String =
    """WITH med AS (
      |  SELECT source, QUANTILE_DISC(n_chars, 0.5) AS med
      |  FROM documents GROUP BY 1
      |),
      |mad AS (
      |  SELECT d.source, QUANTILE_DISC(ABS(d.n_chars - m.med), 0.5) AS mad
      |  FROM documents d JOIN med m USING (source) GROUP BY 1
      |)
      |SELECT d.doc_id, d.source, d.n_chars, m.med, a.mad,
      |       ABS(d.n_chars - m.med) > 3 * a.mad AS is_outlier
      |FROM documents d
      |JOIN med m USING (source)
      |JOIN mad a USING (source)
      |ORDER BY d.doc_id""".stripMargin
}
