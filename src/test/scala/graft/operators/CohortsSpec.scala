package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Weekly cohort retention: offsets, dedup of multiple events within a
  * week, and cohort-size consistency.
  */
class CohortsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // 2024-01-01 is a Monday: weeks are [01-01, 01-08), [01-08, 01-15), ...
  private lazy val events = Seq(
    // u1: cohort week 0; active weeks 0 (twice — must dedup) and 2
    (1L, ts("2024-01-01 10:00:00")),
    (1L, ts("2024-01-03 09:00:00")),
    (1L, ts("2024-01-15 12:00:00")),
    // u2: cohort week 0 (mid-week first event); active week 1
    (2L, ts("2024-01-03 08:00:00")),
    (2L, ts("2024-01-10 08:00:00")),
    // u3: cohort week 1 only
    (3L, ts("2024-01-08 23:59:59"))
  ).toDF("user_id", "ts")

  test("retention matrix matches hand computation") {
    val got = Cohorts.retention(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      ("2024-01-01", 0, 2L, 2L), // u1 + u2, u1's two week-0 events counted once
      ("2024-01-01", 1, 1L, 2L), // u2
      ("2024-01-01", 2, 1L, 2L), // u1
      ("2024-01-08", 0, 1L, 1L)  // u3
    ))
  }

  test("active_users at offset 0 equals cohort_size for every cohort") {
    val ret = Cohorts.retention(table("events"), "user_id", "ts")
    val bad = ret.filter(col("week_offset") === 0 &&
      col("active_users") =!= col("cohort_size"))
    assert(bad.count() == 0)
    // offsets are never negative and counts never exceed the cohort
    assert(ret.filter(col("week_offset") < 0).count() == 0)
    assert(ret.filter(col("active_users") > col("cohort_size")).count() == 0)
  }
}
