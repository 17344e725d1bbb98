package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import GraftExpressions.{toColumn, toExpr}

/** Vector math over array<float>/array<double> embedding columns.
  * Dot/cosine/hyperplane-signature are custom Catalyst expressions
  * (single fused pass per row, codegen'd — see [[ExprKernels]]); each
  * accumulator sums left-to-right, so double-precision results are
  * bit-identical to DuckDB's list_* functions over DOUBLE[], which the
  * correctness oracle relies on. Float inputs are widened elementwise,
  * equivalent to casting to array<double> without the copy.
  */
object VectorFunctions {

  /** Cast to array<double> (for callers that need a real double array). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Fused dot product; both sides must share the element type. */
  def dot(a: Column, b: Column): Column =
    toColumn(DotExpr(toExpr(a), toExpr(b)))

  /** L2 norm (HOF fold — only used outside hot paths). */
  def norm2(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Fused single-pass cosine similarity. */
  def cosine(a: Column, b: Column): Column =
    toColumn(CosineSimExpr(toExpr(a), toExpr(b)))

  /** Sign-bit signature under `planes` fixed hyperplanes (random
    * hyperplane LSH): bit i = (v · p_i >= 0). One pass, <= 64 planes. */
  def hyperplaneSignature(v: Column, planes: Array[Array[Double]]): Column =
    toColumn(HyperplaneSigExpr(toExpr(v), planes))

  /** Deterministic pseudo-random hyperplanes (seeded). */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}
