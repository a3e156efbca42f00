package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `ArrayType(FloatType)` embedding
  * columns, composed from Spark's codegen'd higher-order functions
  * (`zip_with`/`aggregate`) — preference (a) of the custom-operator
  * ladder: no UDF, no custom Expression needed, stays in whole-stage
  * codegen.
  *
  * All accumulation is in DOUBLE in strict left-to-right element
  * order, which matches DuckDB's list kernels exactly — oracle
  * comparisons are bit-stable, not just tolerance-close.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Sign bit of the dot product with a deterministic pseudo-random
    * hyperplane (derived from xxhash64 of the plane id and component
    * index, mapped to [-1, 1)). Used for LSH bucketing of embeddings:
    * `planes` sign bits pack into one integer bucket key; cosine-close
    * vectors collide with high probability (random hyperplane LSH).
    */
  def hyperplaneBits(v: Column, planes: Int, seed: Int = 0x5eed): Column = {
    // component j of plane p: hash(seed, p, j) scaled to [-1, 1)
    def comp(p: Column, j: Column): Column =
      (pmod(xxhash64(lit(seed), p, j), lit(1000000L)).cast("double") / 500000.0) - 1.0
    aggregate(
      sequence(lit(0), lit(planes - 1)),
      lit(0L),
      (acc, p) => {
        val d = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1),
            (x, j) => x.cast("double") * comp(p, j)),
          lit(0.0), (a, x) => a + x)
        // p < 16 so 2^p is exact in double; shiftleft needs an Int
        // literal, the plane index here is a Column
        acc.bitwiseOR(when(d >= 0d, pow(lit(2.0), p).cast("long")).otherwise(lit(0L)))
      })
  }
}
