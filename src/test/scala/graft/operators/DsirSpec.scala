package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** DSIR importance weighting: sign separation on planted
  * target/off-target docs, per-token normalization, smoothing
  * coverage of target-unseen features, and partition invariance
  * (the oracle pins exact values; these pin the semantics).
  */
class DsirSpec extends SparkSpecBase {
  import spark.implicits._

  // target speaks 'alpha', the rest of raw speaks 'omega'
  private def planted = {
    val tgt = (0 until 10).map(i => (i.toLong, ("alpha " * 20).trim, "en"))
    val off = (10 until 20).map(i => (i.toLong, ("omega " * 20).trim, "xx"))
    (tgt ++ off).toDF("doc_id", "text", "lang")
  }

  test("target-like docs score positive and select; off-target negative and drop") {
    val raw = planted
    val got = Dsir.importanceWeights(raw, raw.filter($"lang" === "en"),
      "doc_id", "text", buckets = 64)
      .orderBy("doc_id").collect()
    val (tgt, off) = got.partition(_.getLong(0) < 10)
    assert(tgt.forall(r => r.getDouble(2) > 0 && r.getBoolean(3)),
      s"target docs must score positive: ${tgt.mkString(",")}")
    assert(off.forall(r => r.getDouble(2) < 0 && !r.getBoolean(3)),
      s"off-target docs must score negative: ${off.mkString(",")}")
    assert(got.forall(_.getInt(1) == 20))
  }

  test("weights are per-token: repeating a doc's tokens leaves avg_logratio unchanged") {
    val raw = Seq(
      (1L, "alpha", "en"),
      (2L, ("alpha " * 7).trim, "en"),
      (3L, "omega", "xx")
    ).toDF("doc_id", "text", "lang")
    val got = Dsir.importanceWeights(raw, raw.filter($"lang" === "en"),
      "doc_id", "text", buckets = 64)
      .orderBy("doc_id").collect()
    assert(got(0).getDouble(2) == got(1).getDouble(2),
      "same token bag density ⇒ same per-token score")
    assert(got(0).getInt(1) == 1 && got(1).getInt(1) == 7)
  }

  test("target-unseen features score through the smoothing floor, not dropped") {
    // 'omega' never occurs in target: its bucket must still score
    // (negatively), and the doc's n_tokens must count every token
    val raw = planted
    val off = Dsir.importanceWeights(raw, raw.filter($"lang" === "en"),
      "doc_id", "text", buckets = 64)
      .filter($"doc_id" >= 10).collect()
    assert(off.length == 10)
    assert(off.forall(r => r.getInt(1) == 20 && r.getDouble(2) < 0))
  }

  test("partition invariance on the fixture corpus") {
    val d = docsFixture
    val a = Dsir.importanceWeights(d, d.filter($"lang" === "en"),
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    val b = Dsir.importanceWeights(d.repartition(7), d.filter($"lang" === "en").repartition(3),
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(a == b)
    // non-vacuous on the fixture: both selected values present
    assert(a.exists(_.getBoolean(3)) && a.exists(!_.getBoolean(3)))
  }

  private def docsFixture = table("documents")
}
