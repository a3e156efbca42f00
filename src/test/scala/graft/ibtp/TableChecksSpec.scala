package graft.ibtp

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The reference's recommended integrity workflow
  * (`/root/reference/README.md:102`): run without `unique_key`, test
  * uniqueness separately. Violations-shaped checks, throwing gate, and
  * the supporting not-null / accepted-values tests.
  */
class TableChecksSpec extends SparkSpecBase {

  test("uniqueViolations finds exactly the duplicated key groups") {
    import spark.implicits._
    val df = Seq((1, "a"), (1, "a"), (2, "b"), (3, "a"), (1, "b"))
      .toDF("k", "t")
    val v = TableChecks.uniqueViolations(df, Seq("k", "t"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(v.toSet == Set((1, "a", 2L)))
    // clean data: no violations
    assert(TableChecks.uniqueViolations(df.dropDuplicates(), Seq("k", "t")).count() == 0)
  }

  test("requireUnique passes clean keys and throws with a sample on duplicates") {
    import spark.implicits._
    val dup = Seq((1, "x"), (1, "x")).toDF("k", "t")
    TableChecks.requireUnique(dup.dropDuplicates(), Seq("k"))
    val e = intercept[IllegalStateException] {
      TableChecks.requireUnique(dup, Seq("k", "t"))
    }
    assert(e.getMessage.contains("uniqueness violated"))
    assert(e.getMessage.contains("README.md:102"))
  }

  test("nullViolations and acceptedValuesViolations flag the right rows") {
    import spark.implicits._
    val df = Seq((Some(1), "a"), (None, "b"), (Some(3), "zz")).toDF("k", "t")
    assert(TableChecks.nullViolations(df, Seq("k")).collect()
      .map(_.getString(1)).toSeq == Seq("b"))
    assert(TableChecks.acceptedValuesViolations(df, "t", Seq("a", "b"))
      .collect().map(_.getString(1)).toSeq == Seq("zz"))
  }

  test("loop-built target passes uniqueness; plain re-delivery fails it") {
    val q = graft.queries.IbtpQueries.loopUniqueCheck(spark, sfDir)
    // by construction the re-delivered last-10-days keys duplicate
    val v = q.collect()
    assert(v.nonEmpty)
    assert(v.forall(_.getLong(2) == 2L), "each re-delivered key appears exactly twice")
  }
}
