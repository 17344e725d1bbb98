package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over array<float>/array<double> embedding columns using
  * built-in higher-order functions (codegen'd; left-to-right fold order
  * matches DuckDB's sequential accumulation, so double-precision
  * results are bit-identical to the oracle).
  */
object VectorFunctions {

  /** Cast to array<double> — all math in double for oracle parity. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a); val bd = asDouble(b)
    dot(ad, bd) / (norm2(ad) * norm2(bd))
  }

  /** Sign-bit signature under `planes` fixed hyperplanes (random
    * hyperplane LSH): bit i = (v · p_i >= 0). Returns a long. */
  def hyperplaneSignature(v: Column, planes: Array[Array[Double]]): Column = {
    val vd = asDouble(v)
    planes.zipWithIndex.map { case (p, i) =>
      val pc = array(p.map(lit): _*)
      when(dot(vd, pc) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Deterministic pseudo-random hyperplanes (seeded). */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}
