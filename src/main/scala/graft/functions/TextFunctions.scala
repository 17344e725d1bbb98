package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text helpers. Everything here composes built-in
  * (codegen'd) higher-order functions — no UDFs — so plans stay inside
  * WholeStageCodegen and scale linearly with input bytes.
  */
object TextFunctions {

  /** Lowercased whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), w => w =!= "")

  /** Word n-grams as space-joined strings; empty array when the doc is
    * shorter than n (guards sequence() against negative bounds). */
  def wordNgrams(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n),
        i => array_join(slice(t, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word n-grams (set semantics, for Jaccard). */
  def wordNgramSet(text: Column, n: Int): Column = array_distinct(wordNgrams(text, n))

  /** xxhash64 of each distinct n-gram — the shingle feature set. */
  def shingleHashes(text: Column, n: Int): Column =
    transform(wordNgramSet(text, n), g => xxhash64(g))

  /** Character n-grams of a string. */
  def charNgrams(text: Column, n: Int): Column = {
    val t = lower(text)
    when(length(t) >= n,
      transform(sequence(lit(0), length(t) - n),
        i => t.substr(i + 1, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: k universal-hash "permutations" over the
    * shingle hash set; deterministic seeded coefficients. */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val rnd = new java.util.Random(42)
    val coef = Array.fill(k)((rnd.nextLong() | 1L, rnd.nextLong()))
    array(coef.map { case (a, b) =>
      array_min(transform(shingles, h => h * lit(a) + lit(b)))
    }: _*)
  }

  /** LSH band keys from a minhash signature: bands of `r` rows, each
    * hashed to one bucket key. Equi-joinable → shuffle-friendly. */
  def bandKeys(sig: Column, bands: Int, r: Int): Column =
    array((0 until bands).map { j =>
      struct(lit(j).as("band"), xxhash64(slice(sig, j * r + 1, r)).as("bkey"))
    }: _*)

  /** 64-bit SimHash over a feature-hash array (nested HOFs, codegen'd):
    * bit j set iff the majority of features have bit j set. */
  def simhash64(features: Column): Column = {
    val n = size(features).cast("long")
    (0 until 64).map { j =>
      val cnt = aggregate(features, lit(0L),
        (acc, h) => acc + shiftright(h, j).bitwiseAND(lit(1L)))
      when(cnt * 2 > n, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Exact Jaccard between two pre-distinct arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }
}
