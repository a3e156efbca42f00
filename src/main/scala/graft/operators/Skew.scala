package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed.
  *
  * AQE's skew-join handling splits oversized sort-merge partitions at
  * runtime and covers most cases; explicit salting remains the tool
  * when a single key is so hot that even one split carries it (or when
  * the join is shuffled-hash). The construction: the skewed (large)
  * side gets a random salt in [0, factor); the small side is
  * replicated `factor` times with every salt value; joining on
  * (key, salt) spreads each hot key over `factor` reducers. Results
  * are identical to the unsalted join.
  */
object Skew {

  /** Inner equi-join with the left (large/skewed) side salted and the
    * right side replicated. `factor` multiplies the small side's size —
    * keep it ~number of hot-key splits wanted, not cores².
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      factor: Int = 8): DataFrame = {
    // deterministic pseudo-random salt from the row content keeps the
    // operator reproducible (rand() would vary run to run)
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(factor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt", "inner").drop("__salt")
  }

  /** Two-stage aggregation for skewed group keys: aggregate on
    * (key, salt) first, then merge the partials per key. Only needed
    * for aggregates whose partial state is large (collect-style,
    * exact distinct) — algebraic aggregates already combine map-side.
    * `partials` builds the salted stage, `merge` the final stage.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      factor: Int,
      partials: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(factor)).cast("int"))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
