package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-level table profiling: per-column null counts, exact
  * distinct cardinality, and min/max — the data-card a pipeline
  * publishes next to a delivered table (q54's per-source card is the
  * row-content analogue; this is the column/schema one).
  *
  * Scale shape: ONE aggregation pass over the table computes every
  * column's stats together; the multi-column COUNT DISTINCT plans as
  * one Expand (rows × profiled columns) with map-side partials — the
  * standard exact-multi-distinct shape. Profile a column subset when
  * rows × columns is the binding cost, or swap `countDistinct` for
  * `approx_count_distinct` at 100 TB when exactness isn't required
  * (the q34 trade). The long-form melt happens on the single
  * aggregated row, not on data.
  *
  * min/max are cast to string AFTER aggregating so heterogeneous
  * column types fit one output schema.
  */
object Profile {

  /** Output: (column, n_rows, n_nulls, n_distinct, min_value,
    * max_value), one row per profiled column.
    */
  def tableProfile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile at least one column")
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val structs = array(columns.map(c => struct(
      lit(c).as("column"),
      (col("__total") - col(s"__nn_$c")).as("n_nulls"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__min_$c").as("min_value"),
      col(s"__max_$c").as("max_value"))): _*)
    row.select(col("__total").as("n_rows"), explode(structs).as("__p"))
      .select(col("__p.column").as("column"), col("n_rows"),
        col("__p.n_nulls").as("n_nulls"),
        col("__p.n_distinct").as("n_distinct"),
        col("__p.min_value").as("min_value"),
        col("__p.max_value").as("max_value"))
  }
}
