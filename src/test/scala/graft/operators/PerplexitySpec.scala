package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpecBase

class PerplexitySpec extends SparkSpecBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the rug"),
    (3L, "the cat and the dog sat"),
    (4L, "zqx vbn plm wkj qqq zzz"), // gibberish: every token unique to it
    (5L, "   ")                      // no tokens: excluded from output
  ).toDF("doc_id", "text")

  test("unigram logp matches the closed form ln((c+1)/(T+V))") {
    val lp = Perplexity.unigramLogProbs(corpus, "text").collect()
      .map(r => r.getString(0) -> r.getDecimal(1).doubleValue()).toMap
    val toks = corpus.select(explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .filter(col("t") =!= "").as[String].collect()
    val t = toks.length.toLong
    val v = toks.distinct.length.toLong
    assert(lp.size == v)
    val cThe = toks.count(_ == "the").toLong
    val expected = math.log((cThe + 1).toDouble / (t + v).toDouble)
    assert(math.abs(lp("the") - expected) < 1e-9)
  }

  test("gibberish scores below running text and is flagged; tokenless docs excluded") {
    val scored = Perplexity
      .perplexityScore(corpus, corpus, "doc_id", "text", cutoff = -2.7)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(scored.keySet == Set(1L, 2L, 3L, 4L), "doc 5 has no tokens to score")
    val common = Seq(1L, 2L, 3L).map(scored(_)._1)
    assert(common.forall(_ > scored(4L)._1),
      s"gibberish must score lowest: $scored")
    assert(scored(4L)._2 && !scored(1L)._2)
  }

  test("score is bit-identical under different partitionings (decimal sum)") {
    val a = Perplexity.perplexityScore(corpus, corpus, "doc_id", "text")
    val b = Perplexity.perplexityScore(
      corpus.repartition(7), corpus.repartition(3), "doc_id", "text")
    assertSameRows(a, b)
  }
}
