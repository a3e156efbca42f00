package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** MAD outlier flagging: exact medians under the ceil(n·q) rule, the
  * derived deviation histogram, and degenerate (constant) groups.
  */
class RobustStatsSpec extends SparkSpecBase {
  import spark.implicits._

  test("outlier iff |v - med| > k*MAD, both exact discrete medians") {
    // group a: sorted [1..7, 100], n=8 → median = 4th element = 4;
    // deviations sorted [0,1,1,2,2,3,3,96] → MAD = 2; cutoff 6 → only 100
    val df = ((1L to 7L) :+ 100L).map(("a", _)).toDF("g", "v")
    val out = CorpusStats.madOutliers(df, "g", "v", k = 3)
    val med = out.select("med").distinct().as[Long].collect().toSeq
    val mad = out.select("mad").distinct().as[Long].collect().toSeq
    assert(med == Seq(4L) && mad == Seq(2L))
    val outliers = out.filter(col("is_outlier")).select("v").as[Long].collect().toSet
    assert(outliers == Set(100L))
  }

  test("NULL values are ignored for both medians (QUANTILE_DISC semantics)") {
    // non-null values [1,2,3]: median 2, deviations [1,0,1] → MAD 1;
    // a counted NULL would have shifted the ceil(n*q) index to med 1
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", Some(3L)), ("a", None))
      .toDF("g", "v")
    val out = CorpusStats.madOutliers(df, "g", "v", k = 3)
    val med = out.select("med").distinct().as[Long].collect().toSeq
    val mad = out.select("mad").distinct().as[Long].collect().toSeq
    assert(med == Seq(2L) && mad == Seq(1L))
    // the NULL row itself carries a NULL flag (SQL three-valued logic)
    assert(out.filter(col("v").isNull).select("is_outlier").collect()(0).isNullAt(0))
  }

  test("constant group has MAD 0 and no outliers; deviant value flagged") {
    val df = (Seq.fill(5)(("c", 10L)) ++ Seq(("d", 10L), ("d", 10L), ("d", 11L)))
      .toDF("g", "v")
    val out = CorpusStats.madOutliers(df, "g", "v", k = 3)
    assert(out.filter(col("g") === "c" && col("is_outlier")).count() == 0)
    // group d: median 10, MAD 0 → 11 deviates by 1 > 0 → outlier
    val dOut = out.filter(col("g") === "d" && col("is_outlier"))
      .select("v").as[Long].collect().toSeq
    assert(dOut == Seq(11L))
  }

  test("matches naive per-group computation on the documents table") {
    val docs = table("documents")
    val got = CorpusStats.madOutliers(docs, "source", "n_chars", k = 3)
      .select("doc_id", "med", "mad", "is_outlier")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq.sortBy(_._1)
    def discMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s(math.max(1, math.ceil(s.length * 0.5).toInt) - 1)
    }
    val bySource = docs.select("doc_id", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2)
    val want = bySource.toSeq.flatMap { case (_, rows) =>
      val med = discMedian(rows.map(_._3).toSeq)
      val mad = discMedian(rows.map(r => math.abs(r._3 - med)).toSeq)
      rows.toSeq.map(r => (r._1, med, mad, math.abs(r._3 - med) > 3 * mad))
    }.sortBy(_._1)
    assert(got == want)
  }
}
