package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Spark session extension registering the graft kernels as SQL
  * functions, so the SQL-string surface reaches the same codegen'd
  * expressions as the DataFrame API (`SELECT graft_simhash64(
  * graft_word_ngram_hashes(text, 3)) FROM documents` plans the
  * identical single-static-call kernel as
  * `TextFunctions.simhash64(shingleHashes($"text", 3))`).
  *
  * Deployed the standard way: either
  * `spark.sql.extensions=graft.GraftExtensions` in the session conf
  * (how Bench/Verify/the test harness load it) or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  * Parity between the SQL functions and the Column API is asserted in
  * ExtensionsSpec.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(args: Seq[Expression], i: Int, fn: String): Int = args(i) match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn argument ${i + 1} must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Arity is validated BEFORE the builder indexes into args, so a
    // mis-called SQL function fails at analysis time with the function
    // name and expected count — not a raw IndexOutOfBoundsException
    // from inside the builder.
    def register(name: String, arity: Int,
        builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        args => {
          if (args.length != arity) throw new IllegalArgumentException(
            s"$name expects exactly $arity argument${if (arity == 1) "" else "s"}, " +
              s"got ${args.length}")
          builder(args)
        }))

    register("graft_simhash64", 1, args => SimHash64Expr(args.head))
    register("graft_minhash_sig", 2,
      args => MinHashSigExpr(args.head, intArg(args, 1, "graft_minhash_sig")))
    register("graft_word_ngram_hashes", 2,
      args => WordNgramHashExpr(args.head, intArg(args, 1, "graft_word_ngram_hashes")))
    register("graft_winnow_stats", 3,
      args => WinnowStatsExpr(args.head, intArg(args, 1, "graft_winnow_stats"),
        intArg(args, 2, "graft_winnow_stats")))
    register("graft_fnv64_fold", 1, args => Fnv64FoldExpr(args.head))
    register("graft_fnv64_string", 1, args => Fnv64StringExpr(args.head))
    register("graft_jaccard_sorted", 2, args => JaccardSortedExpr(args(0), args(1)))
    register("graft_intersect_count_sorted", 2,
      args => IntersectCountSortedExpr(args(0), args(1)))
    register("graft_containment_sorted", 2,
      args => ContainmentSortedExpr(args(0), args(1)))
    register("graft_word_ngrams", 2,
      args => WordNgramsExpr(args.head, intArg(args, 1, "graft_word_ngrams")))
    register("graft_dot", 2, args => DotExpr(args(0), args(1)))
    register("graft_cosine", 2, args => CosineSimExpr(args(0), args(1)))
  }
}
