package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators, built from
  * Spark's codegen'd built-ins and higher-order array functions — no
  * UDFs, per-row work with no shuffle. Heavy per-document signature
  * computation (MinHash/SimHash/shingle hashing) lives in
  * `graft.functions.expressions` as native Catalyst expressions
  * instead: HOF lambdas evaluate interpreted, which measured ~100×
  * slower for those (see TextHashExpressions).
  */
object TextFunctions {

  /** Whitespace tokenization (the portable definition shared with the
    * DuckDB oracles: split trimmed text on runs of whitespace).
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles: contiguous n-token windows re-joined with a
    * single space. Empty array when the document has < n tokens.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Distinct shingle set (for Jaccard). */
  def shingleSet(text: Column, n: Int): Column = array_distinct(shingles(text, n))

  /** LSH band keys: split the signature into `bands` bands of
    * `signature.size / bands` rows each and hash every band. Documents
    * sharing any band key are near-dup candidates — the classic
    * banding construction (probability of sharing a band ≈
    * 1-(1-J^r)^b for Jaccard J).
    */
  def lshBandKeys(signature: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        xxhash64(concat_ws(",", transform(slice(signature, b * rows + 1, rows),
          x => x.cast("string")))).as("band_hash"))
    }: _*)

  /** Exact Jaccard similarity of two pre-deduplicated shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0d, lit(1.0)).otherwise(inter / union)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Stopword-hit count against a small built-in list (quality signal). */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stopwords.map(lit): _*)))

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumeric marks — the portable approximation of a subword
    * tokenizer's pre-tokenization pass (same regex runs in RE2/DuckDB).
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.,!?;:]", ""))
}
