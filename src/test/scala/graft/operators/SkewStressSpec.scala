package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.queries.ExtensionQueries

/** Adversarial-distribution stress: a near-identical boilerplate flood
  * (the LSH hot-bucket killer — distinct texts, so pre-exact-collapse
  * cannot remove them) and a hot-key events table (the join-skew
  * killer). Functional guarantees are asserted here; the wall-clock
  * comparison against the uniform fixture is recorded in BASELINE.md
  * (tools/SkewBench reproduces it).
  */
class SkewStressSpec extends SparkSpecBase {

  /** 1000 near-identical pages: shared boilerplate + a unique trailing
    * revision token. Distinct content (exact dedup keeps all 1000),
    * nearly-identical shingle sets (most minhash bands collide) — the
    * precise shape that emits c²/2 ≈ 500k candidate pairs without the
    * bucket cap.
    */
  private def flood = {
    import spark.implicits._
    (0 until 1000).map(i => (3000000L + i,
      "terms of service apply to all users of this site please read " +
        s"carefully before proceeding with registration page revision $i"))
      .toDF("doc_id", "text")
  }

  test("near-identical flood: cap keeps the pipeline alive, audit reports, recall holds") {
    val corpus = ExtensionQueries.corpusWithNearDups(spark, sfDir).unionAll(flood)
    val pairs = Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
      shingleN = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      .select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // the cap sacrifices flood-internal recall to survive: emitted
    // flood-flood pairs stay far below the quadratic 499,500 (pairs
    // can still surface through bands the trailing token split under
    // the cap width — that's by design, not a leak)
    val floodPairs = pairs.count(p => p._1 >= 3000000L && p._2 >= 3000000L)
    assert(floodPairs < 100000, s"flood emitted $floodPairs pairs — cap not engaging")
    // planted recall on the REST of the corpus is unharmed by the flood
    val found = pairs.toSet
    val planted = table("documents").select(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(0) + 2000000L))
    val recall = planted.count(found.contains).toDouble / planted.length
    assert(recall >= 0.98, s"planted recall with flood present: $recall")
  }

  test("flood buckets appear in the hot-bucket audit view") {
    import graft.functions.TextFunctions.lshBandKeys
    import graft.functions.expressions.TextHashFunctions.minhash_sig
    val corpus = ExtensionQueries.corpusWithNearDups(spark, sfDir).unionAll(flood)
    val bandKeys = corpus
      .select(col("doc_id").as("id"),
        explode(lshBandKeys(minhash_sig(col("text"), 3, 64), 16, 4)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))
    val hot = Dedup.hotBuckets(bandKeys, maxBucket = 256, Seq("band", "band_hash"))
      .collect()
    assert(hot.nonEmpty, "a 1000-wide near-identical flood must trip the audit")
    // the trailing revision token splits some bands, so widths land in
    // the ~800s rather than the full 1000 — still far over the cap
    assert(hot.exists(_.getLong(2) >= 500),
      s"expected flood-scale buckets, widths: ${hot.map(_.getLong(2)).sorted.reverse.take(5).mkString(",")}")
  }

  test("span dedup under boilerplate flood: exactly one survivor per distinct span") {
    // 1000 docs sharing the same leading boilerplate: the span-text
    // aggregation sees a mega-hot key, which map-side partials collapse
    // per partition; the invariant (one global survivor per distinct
    // span) must hold regardless
    val out = Dedup.spanDedup(flood, "doc_id", "text", spanWords = 3)
    assert(out.count() == 1000) // every doc present
    val keptTotal = out.agg(sum(col("kept_spans"))).head().getLong(0)
    // independent count of distinct span texts in the corpus
    val nDistinct = flood
      .select(posexplode(expr(
        "transform(sequence(0, int(ceil(size(split(trim(text), '\\\\s+')) / 3.0)) - 1), " +
          "i -> array_join(slice(split(trim(text), '\\\\s+'), i * 3 + 1, 3), ' '))")))
      .select(col("col")).distinct().count()
    assert(keptTotal == nDistinct, s"kept $keptTotal != distinct $nDistinct")
    // and the flood actually floods: removal is massive
    val total = out.agg(sum(col("total_spans"))).head().getLong(0)
    assert(keptTotal < total / 5, s"only removed ${total - keptTotal} of $total")
  }

  test("components converge within the round budget on a 1500-node chain") {
    import spark.implicits._
    // worst-case diameter relative to size; pointer jumping must close
    // it in O(log n) rounds, inside the default maxIter
    val n = 1500L
    val cc = Components.connectedComponents(
      (0L until n).toDF("id"), "id",
      (0L until n - 1).map(i => (i, i + 1)).toDF("s", "d"), "s", "d")
    assert(cc.select(col("cluster_id")).distinct().count() == 1)
  }

  test("hot-key join: salted equals plain, salt splits the hot key across reducers") {
    // one user receives half of all events — deterministic skew
    val skewed = table("events").withColumn("user_id",
      when(pmod(col("event_id"), lit(2)) === 0, lit(42L)).otherwise(col("user_id")))
    val dim = skewed.select(col("user_id")).distinct()
      .withColumn("segment", pmod(col("user_id"), lit(10)))
    val plain = skewed.join(dim, Seq("user_id"))
      .groupBy(col("segment")).agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total"))
    val salted = Skew.saltedJoin(skewed, dim, Seq("user_id"), factor = 8)
      .groupBy(col("segment")).agg(count(lit(1)).as("n"),
        round(sum(col("value")), 2).as("total"))
    assertSameRows(salted, plain)
    // the deterministic salt actually spreads the hot key: no single
    // (key, salt) reducer group carries more than ~1/3 of the hot rows
    // (expected 1/8 with factor 8)
    val hotRows = skewed.filter(col("user_id") === 42L)
    val maxGroup = hotRows
      .withColumn("__salt",
        pmod(xxhash64(skewed.columns.map(col).toIndexedSeq: _*), lit(8)).cast("int"))
      .groupBy(col("__salt")).count().agg(max(col("count"))).head().getLong(0)
    val total = hotRows.count()
    assert(maxGroup.toDouble / total < 0.34,
      s"salt skew: largest of 8 salt groups holds $maxGroup of $total hot rows")
  }
}
