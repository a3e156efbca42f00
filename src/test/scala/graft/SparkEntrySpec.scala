package graft

/** Driver-contract smoke: entry() returns rows; every oracle key has a
  * matching query; query/oracle column names agree where checkable.
  */
class SparkEntrySpec extends SparkSpecBase {

  test("entry returns >0 rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query runs, returns rows, and leaves no pinned blocks at sf0.001") {
    // cache hygiene: operators/fixtures pin intermediates only inside
    // a CacheScope, so a COMPLETED query must leave the session's
    // cache manager empty — a long-lived session composing many
    // pipelines must not accumulate pinned blocks until eviction
    spark.sharedState.cacheManager.clearCache()
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left pinned blocks in the cache manager")
    }
  }
}
