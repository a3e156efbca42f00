package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single right row with the
  * greatest `rightTs <= leftTs` within the same key ("the latest
  * quote at or before each trade"). Spark has no native ASOF
  * operator; the naive formulation (equi-join on key + `r.ts <= l.ts`
  * filter + per-left-row argmax) materializes every (left, earlier
  * right) pairing — quadratic per key — before discarding all but one.
  *
  * This implementation is the union-marker window: tag each side,
  * union them, and carry the latest right row forward with
  * `last(_, ignoreNulls)` over (key) ordered by (ts, side). ONE
  * shuffle on the key and one sort, each row touched once — the
  * merge-scan an ASOF join compiles to in engines that have it
  * natively, expressed in Catalyst operators. At equal timestamps the
  * right row sorts first, giving inclusive (<=) semantics.
  *
  * The right payload travels as a single struct, so every output
  * column comes from the SAME right row even when individual payload
  * values are null (per-column fill would skip nulls independently).
  *
  * Left-join semantics: left rows before any right row get nulls.
  * Right rows with identical (key, ts) are tie-broken by `rightOrder`
  * (last wins, ordered by the column's NATIVE type — string ids order
  * lexicographically, no silent numeric cast) — pass a unique column
  * to make results deterministic.
  */
object AsofJoin {

  def asof(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String, rightTsCol: String,
      rightPayloadCols: Seq[String],
      rightOrder: Option[String] = None): DataFrame = {
    val leftPayload = left.columns.filterNot(keyCols.contains).toSeq
    val collisions = leftPayload.intersect(rightPayloadCols)
    require(collisions.isEmpty,
      s"rename right payload columns colliding with left: ${collisions.mkString(", ")}")

    def nullOf(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType).as(c)

    // tie-break in the column's own type; only right rows carry a
    // value (left rows' __ord never orders against a right row at the
    // same (ts, side) because __side differs)
    val ordType = rightOrder.map(c => right.schema(c).dataType)
    ordType.foreach(t => require(org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(t),
      s"rightOrder column must be an orderable type, got $t"))
    val rOrd = rightOrder.map(col).getOrElse(lit(0L))
    val lOrd = ordType.map(t => lit(null).cast(t)).getOrElse(lit(0L))

    val rStruct = struct(rightPayloadCols.map(col): _*)
    // shared shape: keys ++ __ts ++ __side ++ __ord ++ left payload
    // (null on right rows) ++ __r struct (null on left rows)
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTsCol).as("__ts"), lit(1).as("__side"), lOrd.as("__ord")) ++
        leftPayload.map(col) :+
        lit(null).cast(right.select(rStruct).schema.head.dataType).as("__r"): _*)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTsCol).as("__ts"), lit(0).as("__side"), rOrd.as("__ord")) ++
        leftPayload.map(c => nullOf(left, c)) :+
        rStruct.as("__r"): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__ord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionAll(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        (keyCols ++ leftPayload).map(col) ++
          rightPayloadCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
