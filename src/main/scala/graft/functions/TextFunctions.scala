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

  /** Distinct word-n-gram hashes — the shingle feature set. Computed by
    * a single-pass codegen'd kernel ([[WordNgramHashExpr]]); hashes the
    * same token n-gram set as `wordNgramSet` (lowercase, space-split,
    * empties dropped, distinct) under an internal 64-bit hash. */
  def shingleHashes(text: Column, n: Int): Column =
    GraftExpressions.toColumn(WordNgramHashExpr(GraftExpressions.toExpr(text), n))

  /** Character n-grams of a string. */
  def charNgrams(text: Column, n: Int): Column = {
    val t = lower(text)
    when(length(t) >= n,
      transform(sequence(lit(0), length(t) - n),
        i => t.substr(i + 1, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash signature: k seeded-mix "permutations" over the shingle
    * hash set, all minima in one codegen'd pass ([[MinHashSigExpr]]).
    * (The r1 affine mix `h * a + b` threw ARITHMETIC_OVERFLOW under
    * Spark 4's default ANSI mode; the JVM kernel wraps by design.) */
  def minhashSignature(shingles: Column, k: Int): Column =
    GraftExpressions.toColumn(MinHashSigExpr(GraftExpressions.toExpr(shingles), k))

  /** LSH band keys from a minhash signature: bands of `r` rows, each
    * hashed to one bucket key. Equi-joinable → shuffle-friendly. The
    * band hash is the FNV fold (r11, was xxhash64): same codegen'd
    * cost and collision behavior for 8-byte keys, but re-derivable in
    * DuckDB as a HUGEINT list_reduce — which is what lets the
    * dedup_minhash_lsh oracle verify LSH candidate generation itself
    * cross-engine. */
  def bandKeys(sig: Column, bands: Int, r: Int): Column =
    array((0 until bands).map { j =>
      struct(lit(j).as("band"), fnvFold64(slice(sig, j * r + 1, r)).as("bkey"))
    }: _*)

  /** 64-bit SimHash over a feature-hash array: bit j set iff the
    * majority of features have bit j set. Single-pass custom Catalyst
    * expression ([[SimHash64Expr]]) — replaces the r1 formulation of 64
    * independent `aggregate()` trees, which fell out of codegen and
    * accounted for 57% of the round-1 bench. */
  def simhash64(features: Column): Column =
    GraftExpressions.toColumn(SimHash64Expr(GraftExpressions.toExpr(features)))

  /** Wrapping FNV-1a-style 64-bit fold of a hash array (codegen'd
    * kernel; a column-level `aggregate` multiply would throw
    * ARITHMETIC_OVERFLOW under Spark 4's default ANSI mode). */
  def fnvFold64(hashes: Column): Column =
    GraftExpressions.toColumn(Fnv64FoldExpr(GraftExpressions.toExpr(hashes)))

  /** Exact Jaccard between two pre-distinct arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** Exact Jaccard between two SORTED distinct long arrays (one-pass
    * merge kernel — pairs-scoring hot path). */
  def jaccardSorted(a: Column, b: Column): Column =
    GraftExpressions.toColumn(
      JaccardSortedExpr(GraftExpressions.toExpr(a), GraftExpressions.toExpr(b)))

  /** Exact |A∩B| count between two SORTED distinct long arrays (one-pass
    * merge kernel, integer result — for exact-ppm pair scoring). */
  def intersectCountSorted(a: Column, b: Column): Column =
    GraftExpressions.toColumn(
      IntersectCountSortedExpr(GraftExpressions.toExpr(a), GraftExpressions.toExpr(b)))

  /** Exact containment |A∩B| / min(|A|,|B|) between two SORTED distinct
    * long arrays (one-pass merge kernel). */
  def containmentSorted(a: Column, b: Column): Column =
    GraftExpressions.toColumn(
      ContainmentSortedExpr(GraftExpressions.toExpr(a), GraftExpressions.toExpr(b)))

  /** ALL word n-grams as space-joined strings (duplicates kept, doc
    * order — the counting form used by corpus n-gram stats). Codegen'd
    * single pass; same tokenization as [[tokens]]. */
  def wordNgramsAll(text: Column, n: Int): Column =
    GraftExpressions.toColumn(WordNgramsExpr(GraftExpressions.toExpr(text), n))
}
