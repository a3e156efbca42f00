package graft.operators

import java.sql.Timestamp
import java.time.{DayOfWeek, LocalDate, LocalDateTime}

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Randomized (seeded) equivalence of the newest operators against
  * independent naive Scala implementations — the same pattern the
  * quantile/top-k/as-of operators use, catching rule drift fixtures
  * can miss.
  */
class NaiveEquivalenceSpec extends SparkSpecBase {
  import spark.implicits._

  private val rng = new scala.util.Random(0xC0FFEE)

  test("cohort retention equals naive computation on random events") {
    val base = LocalDateTime.of(2024, 3, 1, 0, 0)
    val rows = Seq.fill(800) {
      (rng.nextInt(60).toLong, Timestamp.valueOf(
        base.plusHours(rng.nextInt(24 * 70).toLong)))
    }
    val got = Cohorts.retention(rows.toDF("user_id", "ts"), "user_id", "ts")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet

    def weekOf(t: Timestamp): LocalDate =
      t.toLocalDateTime.toLocalDate.`with`(DayOfWeek.MONDAY)
    val weeks = rows.map { case (u, t) => (u, weekOf(t)) }.distinct
    val cohortOf = weeks.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val sizes = cohortOf.values.groupBy(identity).map { case (w, us) => w -> us.size.toLong }
    val want = weeks
      .groupBy { case (u, w) =>
        (cohortOf(u), ((w.toEpochDay - cohortOf(u).toEpochDay) / 7).toInt)
      }
      .map { case ((cw, off), us) =>
        (cw.toString, off, us.size.toLong, sizes(cw))
      }
      .toSet
    assert(got == want)
  }

  test("semDedup equals naive within-cell computation on random vectors") {
    val dim = 8
    def vec() = Array.fill(dim)(rng.nextFloat() * 2 - 1)
    val centroids = (0L until 4L).map(i => (i, vec()))
    val corpus = (0L until 120L).map(i => (i, vec()))
    val got = SemDedup.semDedup(
      corpus.toDF("vec_id", "embedding"),
      centroids.toDF("centroid_id", "embedding"), threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

    // naive, with the engine's exact arithmetic (left-to-right double fold)
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    def cell(v: Array[Float]): Long =
      centroids.map { case (cid, c) =>
        (dot(v, v) + dot(c, c) - 2.0 * dot(v, c), cid)
      }.min._2
    val assigned = corpus.map { case (id, v) => (id, cell(v), v) }
    val want = assigned.map { case (id, cid, v) =>
      val dup = assigned.exists { case (id2, cid2, v2) =>
        id2 < id && cid2 == cid &&
          dot(v2, v) / (math.sqrt(dot(v2, v2)) * math.sqrt(dot(v, v))) >= 0.6
      }
      (id, cid, dup)
    }.toSet
    assert(got == want)
  }

  test("BPE merges equal a naive reference on random words") {
    val words = Seq.fill(200)(
      (1 to (1 + rng.nextInt(6))).map(_ => ('a' + rng.nextInt(4)).toChar).mkString)
    val text = words.mkString(" ")
    val got = Bpe.trainMerges(Seq((1L, text)).toDF("doc_id", "text"), "text", 5)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq

    var vocab: Map[Seq[String], Long] =
      words.groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toSeq, ws.size.toLong)
      }
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to 5) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + cnt
      if (counts.nonEmpty) {
        val ((l, r), n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((l, r, n))
        vocab = vocab.toSeq.map { case (syms, cnt) =>
          val res = Seq.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              res += (l + r); i += 2
            } else { res += syms(i); i += 1 }
          }
          (res.result(), cnt)
        }.groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).sum) }
      }
    }
    assert(got == out.result())
  }
}
