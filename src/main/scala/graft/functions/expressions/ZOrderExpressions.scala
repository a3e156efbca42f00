package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave key for multi-dimensional clustering —
  * the layout side of OPTIMIZE ZORDER BY: each input column maps to an
  * equal-DEPTH bucket id via range boundaries sampled from the data
  * (the Delta/RangePartitioner recipe, robust to skew where equal-width
  * binning is not), and the bucket ids' bits interleave MSB-first into
  * one long. Sorting by that key lays rows on a space-filling curve, so
  * every output file's min/max are narrow on ALL clustered dimensions
  * at once — file-level stats then prune on any of them, not just a
  * lexicographic prefix.
  *
  * Scope: a LAYOUT key only. It never reaches query results — content
  * correctness is independent of the curve (the compaction rewrite is
  * content-invariant and readers re-filter exactly), so approximate
  * boundaries and lossy double casts are fine here by construction.
  * Runs once per compaction rewrite, not on any query hot path —
  * CodegenFallback keeps it simple (the surrounding projection still
  * codegens; this one virtual call per row is noise next to the
  * parquet write it feeds).
  */
object ZOrderUtil {

  /** Equal-depth bucket of `v`: #{boundaries strictly below v}, by
    * binary search. Empty boundaries (all-null/empty column sample)
    * put everything in bucket 0.
    */
  def bucketOf(v: Double, bnds: Array[Double]): Int = {
    var lo = 0
    var hi = bnds.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (v > bnds(m)) lo = m + 1 else hi = m
    }
    lo
  }

  /** MSB-first bit interleave of the bucket ids. */
  def interleave(buckets: Array[Int], bitsPerCol: Int): Long = {
    var out = 0L
    var bit = bitsPerCol - 1
    while (bit >= 0) {
      var c = 0
      while (c < buckets.length) {
        out = (out << 1) | ((buckets(c) >>> bit) & 1)
        c += 1
      }
      bit -= 1
    }
    out
  }
}

/** `zorder_key(c1, c2, ...)` — the interleaved curve position under
  * fixed per-column range boundaries (rides along as part of the
  * expression). Inputs must be DoubleType (cast upstream); NULLs sort
  * to bucket 0, the curve's origin corner.
  */
case class ZOrderKey(children: Seq[Expression], boundaries: Seq[Array[Double]])
    extends Expression with CodegenFallback {
  require(children.nonEmpty && children.size == boundaries.size,
    "one boundary array per input column")
  private val bitsPerCol: Int = {
    val maxBuckets = boundaries.map(_.length + 1).max
    math.max(1, 32 - Integer.numberOfLeadingZeros(math.max(1, maxBuckets - 1)))
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val buckets = new Array[Int](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      buckets(i) =
        if (v == null) 0
        else ZOrderUtil.bucketOf(v.asInstanceOf[Double], boundaries(i))
      i += 1
    }
    ZOrderUtil.interleave(buckets, bitsPerCol)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderKey =
    copy(children = newChildren)
  override def prettyName: String = "zorder_key"
}

object ZOrderFunctions {
  def zorder_key(cols: Seq[Column], boundaries: Seq[Array[Double]]): Column =
    ColumnBridge.column(ZOrderKey(cols.map(ColumnBridge.expression), boundaries))
}
