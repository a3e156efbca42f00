package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Bucketed co-located join: the join over two tables bucketed on the
  * key must plan without any Exchange (shuffle paid once at write
  * time), and produce the same rows as the plain join.
  */
class BucketingSpec extends SparkSpecBase {

  test("join of compatibly bucketed tables has no exchange and matches plain join") {
    // AQE can inject a shuffle-read wrapper; disable locally for a
    // clean plan assertion (the no-Exchange property is what matters)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = table("lineitem").select(col("l_orderkey"), col("l_quantity"))
      val or = table("orders").select(col("o_orderkey").as("l_orderkey"),
        col("o_orderpriority"))
      Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
      Bucketing.writeBucketed(or, "or_bucketed", "l_orderkey", 8)

      val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "or_bucketed", "l_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)

      val plain = li.join(or, "l_orderkey")
      assert(joined.count() == plain.count())
      val a = joined.groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_quantity")), 4).as("q"))
      val b = plain.groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_quantity")), 4).as("q"))
      assertSameRows(a, b)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS or_bucketed")
    }
  }
}
