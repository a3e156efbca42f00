package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.expressions.VectorExprFunctions

/** Dense-vector primitives over `ArrayType(FloatType)` embedding
  * columns.
  *
  * Originally composed from Spark's higher-order functions
  * (`aggregate(zip_with(...))`), but HOF lambdas evaluate interpreted,
  * outside whole-stage codegen — measured ~4.6 s of the 38 s round-1
  * bench across the LSH/IVF queries. Now these delegate to native
  * Catalyst expressions ([[graft.functions.expressions.VectorUtil]])
  * whose `doGenCode` emits one static call, keeping the projection
  * inside whole-stage codegen.
  *
  * All accumulation is in DOUBLE in strict left-to-right element
  * order, which matches both the old HOF fold and DuckDB's list
  * kernels over `DOUBLE[]` exactly — oracle comparisons are
  * bit-stable, not just tolerance-close.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column = VectorExprFunctions.vec_dot(a, b)

  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column = VectorExprFunctions.vec_cosine(a, b)

  /** Sign bits of dot products with `planes` deterministic
    * pseudo-random hyperplanes (components from splitmix64 of
    * (seed, plane, component), scaled to [-1, 1)), packed into one
    * integer bucket key. Cosine-close vectors collide with high
    * probability (random hyperplane LSH).
    */
  def hyperplaneBits(v: Column, planes: Int, seed: Int = 0x5eed): Column =
    VectorExprFunctions.hyperplane_bits(v, planes, seed)
}
