package graft.operators

import java.sql.Timestamp

import graft.SparkSpecBase

class FunnelsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("funnel: ordered completion, strict ordering, partial stages") {
    val ev = Seq(
      // user 1: clean A(10) -> B(20) -> C(30), with a decoy earlier B(5)
      (1L, "A", 10L), (1L, "B", 5L), (1L, "B", 20L), (1L, "C", 30L),
      // user 2: B and C only BEFORE first A -> stops at stage 1
      (2L, "B", 5L), (2L, "C", 6L), (2L, "A", 10L),
      // user 3: same-timestamp B as A (strict > excludes), later B ok, no C
      (3L, "A", 10L), (3L, "B", 10L), (3L, "B", 15L),
      // user 4: never reaches stage 1 -> absent
      (4L, "B", 1L), (4L, "C", 2L)
    ).map { case (u, t, s) => (u, t, ts(s)) }.toDF("user_id", "event_type", "ts")

    val got = Funnels.funnel(ev, "user_id", "ts", "event_type", Seq("A", "B", "C"))
      .orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
        Option(r.getTimestamp(3)), r.getInt(4)))
      .toSeq

    assert(got == Seq(
      (1L, Some(ts(10)), Some(ts(20)), Some(ts(30)), 3),
      (2L, Some(ts(10)), None, None, 1),
      (3L, Some(ts(10)), Some(ts(15)), None, 2)))
  }

  test("funnel picks the EARLIEST qualifying event at every stage") {
    val ev = Seq(
      (1L, "A", 10L), (1L, "A", 50L), (1L, "B", 20L), (1L, "B", 60L),
      (1L, "C", 25L), (1L, "C", 70L)
    ).map { case (u, t, s) => (u, t, ts(s)) }.toDF("user_id", "event_type", "ts")
    val row = Funnels.funnel(ev, "user_id", "ts", "event_type", Seq("A", "B", "C")).head()
    assert((row.getTimestamp(1), row.getTimestamp(2), row.getTimestamp(3)) ==
      (ts(10), ts(20), ts(25)))
  }
}
