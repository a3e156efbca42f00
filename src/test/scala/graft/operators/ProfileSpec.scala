package graft.operators

import graft.SparkSpecBase

/** Table profiling: null counting, exact distincts, min/max, and the
  * one-row-per-column output contract.
  */
class ProfileSpec extends SparkSpecBase {
  import spark.implicits._

  test("profile matches hand computation including nulls") {
    val df = Seq(
      (Some(1L), Some("a")),
      (Some(2L), None),
      (Some(2L), Some("b")),
      (None, Some("a"))
    ).toDF("k", "s")
    val got = Profile.tableProfile(df, Seq("k", "s"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
      .sortBy(_._1)
      .toSeq
    assert(got == Seq(
      ("k", 4L, 1L, 2L, "1", "2"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }

  test("profile of the orders fixture: keys unique, no nulls") {
    val orders = table("orders")
    val p = Profile.tableProfile(orders, Seq("o_orderkey", "o_orderstatus"))
      .collect().map(r => r.getString(0) -> r).toMap
    val n = orders.count()
    assert(p("o_orderkey").getLong(1) == n)
    assert(p("o_orderkey").getLong(2) == 0)       // no nulls
    assert(p("o_orderkey").getLong(3) == n)       // primary key: all distinct
    assert(p("o_orderstatus").getLong(3) < n)     // low-cardinality enum
  }
}
