package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.functions.expressions.{NormalizeFunctions, NormalizeUtil}
import graft.operators.TextAnalysis

class NormalizeSpec extends SparkSpecBase {
  import spark.implicits._

  test("fold_accents strips combining marks, keeps base letters") {
    val got = Seq("café", "Mühlheim", "naïve ñ", "Ĉeĥoslovakio", "İstanbul")
      .toDF("s")
      .select(NormalizeFunctions.fold_accents(col("s")).as("f"))
      .as[String].collect().toSeq
    assert(got == Seq("cafe", "Muhlheim", "naive n", "Cehoslovakio", "Istanbul"))
  }

  test("fold_accents is the identity (no copy) on pure ASCII") {
    val s = org.apache.spark.unsafe.types.UTF8String.fromString("plain ascii text")
    assert(NormalizeUtil.foldAccents(s) eq s)
    // and non-Latin scripts without combining marks pass through
    val zh = org.apache.spark.unsafe.types.UTF8String.fromString("中文文本")
    assert(NormalizeUtil.foldAccents(zh).toString == "中文文本")
  }

  test("fold_accents strips spacing-combining and enclosing marks like utf8proc") {
    import org.apache.spark.unsafe.types.UTF8String
    // Devanagari vowel sign (Mc) and combining enclosing sign (Me) are
    // both removed by DuckDB's strip_accents; Mn-only stripping would
    // keep them and break the oracle on Indic text
    assert(NormalizeUtil.foldAccents(UTF8String.fromString("कि")).toString == "क")
    assert(NormalizeUtil.foldAccents(UTF8String.fromString("a҉b")).toString == "ab")
  }

  test("fold_accents propagates null and handles empty") {
    val got = Seq[Option[String]](None, Some(""))
      .toDF("s")
      .select(NormalizeFunctions.fold_accents(col("s")).as("f"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got.toSeq == Seq(null, ""))
  }

  test("normalizeText recovers the original fixture text from the messied form") {
    // same derivation as q65: accent-inject + upper + doubled spaces + padding
    val docs = table("documents").select(col("doc_id"), col("text"))
    val messy = concat(lit("  "),
      translate(upper(regexp_replace(col("text"), " ", "  ")), "AEIOU", "ÀÉÎÕÜ"),
      lit(" \t "))
    val bad = docs
      .select(col("doc_id"), col("text"),
        TextAnalysis.normalizeText(messy).as("norm"))
      .filter(col("norm") =!= trim(col("text")))
    assert(bad.isEmpty, "normalization did not invert the messying")
  }
}
