package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the similarity/dedup hot paths
  * (SURVEY §4: "custom Catalyst `Expression` (with doGenCode) only
  * where built-ins can't express it"). Each one generates a single
  * static call into [[ExprKernels]], so the work stays inside
  * whole-stage codegen and runs as one tight JVM loop per row.
  *
  * All expressions implement `checkInputDataTypes`, so a mis-typed
  * column fails at ANALYSIS time with the expression name in the
  * message, not as an IllegalArgumentException thrown from generated
  * code mid-job.
  */
object GraftExpressions {
  /** Bridge between the public Column API and catalyst Expressions
    * (Spark 4.x moved Column internals behind ColumnNode). */
  def toColumn(e: Expression): Column = GraftColumnBridge.column(e)
  def toExpr(c: Column): Expression = GraftColumnBridge.expression(c)

  private[functions] def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float> or array<double>, got $other")
  }

  /** array<long> with containsNull=false — the shingle/signature shape
    * produced by the graft kernels. The long-array kernels index with
    * getLong (no per-element null slot check in the hot loop), so a
    * nullable-element array is rejected at analysis time rather than
    * silently read as 0. */
  private[functions] def checkLongArray(name: String, es: Expression*): TypeCheckResult = {
    es.zipWithIndex.foreach { case (e, i) =>
      e.dataType match {
        case ArrayType(LongType, false) => ()
        case ArrayType(LongType, true) => return TypeCheckResult.TypeCheckFailure(
          s"$name argument ${i + 1} must be array<bigint> with non-nullable " +
            "elements (containsNull=false); wrap with a null-free producer")
        case other => return TypeCheckResult.TypeCheckFailure(
          s"$name argument ${i + 1} must be array<bigint>, got ${other.catalogString}")
      }
    }
    TypeCheckResult.TypeCheckSuccess
  }

  /** Both sides array<float> or both array<double> (nullable elements
    * allowed — the vector kernels skip null slots). */
  private[functions] def checkVectorPair(name: String, l: Expression, r: Expression): TypeCheckResult =
    (l.dataType, r.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"$name requires both arguments to be array<float> or both array<double>, " +
          s"got ${a.catalogString} and ${b.catalogString}")
    }

  private[functions] def checkString(name: String, e: Expression): TypeCheckResult =
    e.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires a string argument, got ${other.catalogString}")
    }
}

/** simhash64(array<long>) -> long. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.checkLongArray(prettyName, child)
  override protected def nullSafeEval(input: Any): Any =
    ExprKernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash64"
}

/** minhash_sig(array<long>, k) -> array<long> (k permutation minima). */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= 256, s"minhash k must be in [1,256], got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.checkLongArray(prettyName, child)
  override protected def nullSafeEval(input: Any): Any =
    ExprKernels.minhashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.minhashSig($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_sig"
}

/** word_ngram_hashes(string, n) -> array<long>: distinct word-n-gram
  * hashes in one codegen'd pass (see [[ExprKernels.wordNgramHashes]]). */
case class WordNgramHashExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"ngram width must be positive, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.checkString(prettyName, child)
  override protected def nullSafeEval(input: Any): Any =
    ExprKernels.wordNgramHashes(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.wordNgramHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordNgramHashExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_word_ngram_hashes"
}

/** winnow_stats(string, n, w) -> array<long> [n_grams, n_selected,
  * fingerprint] (single-pass winnowing fingerprint). */
case class WinnowStatsExpr(child: Expression, n: Int, w: Int) extends UnaryExpression {
  require(n > 0 && w > 0, "ngram width and window must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.checkString(prettyName, child)
  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ExprKernels.winnowStats(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n, w))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.ExprKernels.winnowStats($c, $n, $w))")
  override protected def withNewChildInternal(newChild: Expression): WinnowStatsExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_winnow_stats"
}

/** cdc_chunks(string) -> array<long> of flattened (start, len, fnv64)
  * triples (content-defined chunking; see [[ExprKernels.cdcChunks]]). */
case class CdcChunksExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.checkString(prettyName, child)
  override protected def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ExprKernels.cdcChunks(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.ExprKernels.cdcChunks($c))")
  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_cdc_chunks"
}

/** frame_fp(doc_id, frame_idx) -> long: fmix64 golden-ratio mix (see
  * [[ExprKernels.frameFp]] — the oracle-re-derivable frame
  * fingerprint of the multimodal stub pipeline). */
case class FrameFpExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (bigint, bigint), got (${left.dataType.sql}, ${right.dataType.sql})")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.frameFp(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprKernels.frameFp($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): FrameFpExpr =
    copy(left = l, right = r)
  override def prettyName: String = "graft_frame_fp"
}

/** fnv64_string(string) -> long: FNV-1a over the UTF-8 bytes — the
  * oracle-re-derivable content fingerprint ([[ExprKernels.fnv64String]];
  * DuckDB mirror = list_reduce over ascii(ch) while text is ASCII). */
case class Fnv64StringExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.checkString(prettyName, child)
  override protected def nullSafeEval(input: Any): Any =
    ExprKernels.fnv64String(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.fnv64String($c)")
  override protected def withNewChildInternal(newChild: Expression): Fnv64StringExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_fnv64_string"
}

/** fnv64_fold(array<long>) -> long (wrapping FNV-1a-style fold). */
case class Fnv64FoldExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.checkLongArray(prettyName, child)
  override protected def nullSafeEval(input: Any): Any =
    ExprKernels.fnv64Fold(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.fnv64Fold($c)")
  override protected def withNewChildInternal(newChild: Expression): Fnv64FoldExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_fnv64_fold"
}

/** jaccard_sorted(array<long>, array<long>) -> double; inputs must be
  * sorted distinct (as produced by [[WordNgramHashExpr]]). */
case class JaccardSortedExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.checkLongArray(prettyName, left, right)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprKernels.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSortedExpr =
    copy(left = l, right = r)
  override def prettyName: String = "graft_jaccard_sorted"
}

/** intersect_count_sorted(array<long>, array<long>) -> bigint: exact
  * |A∩B| over sorted distinct arrays (linear merge). The integer form
  * of [[JaccardSortedExpr]] — lets pair scoring stay in exact integer
  * arithmetic (ppm) end to end. */
case class IntersectCountSortedExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.checkLongArray(prettyName, left, right)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.intersectSortedCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprKernels.intersectSortedCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectCountSortedExpr =
    copy(left = l, right = r)
  override def prettyName: String = "graft_intersect_count_sorted"
}

/** containment_sorted(array<long>, array<long>) -> double:
  * |A∩B| / min(|A|,|B|) over sorted distinct arrays — the embedded-
  * document score a Jaccard threshold misses. */
case class ContainmentSortedExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.checkLongArray(prettyName, left, right)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.containmentSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprKernels.containmentSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ContainmentSortedExpr =
    copy(left = l, right = r)
  override def prettyName: String = "graft_containment_sorted"
}

/** word_ngrams(string, n) -> array<string>: ALL word n-grams (order
  * kept, duplicates kept — the counting form; [[WordNgramHashExpr]] is
  * the set form). */
case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"ngram width must be positive, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.checkString(prettyName, child)
  override protected def nullSafeEval(input: Any): Any =
    ExprKernels.wordNgrams(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.wordNgrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_word_ngrams"
}

/** dot(arr, arr) -> double; both sides must share the element type
  * (checked at analysis time). Ragged inputs fold over the common
  * prefix min(len(a), len(b)); null elements are skipped — see the
  * [[ExprKernels]] vector-kernel contract. */
case class DotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.checkVectorPair(prettyName, left, right)
  private lazy val floatKernel = GraftExpressions.isFloatArray(left)
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (floatKernel) ExprKernels.dotFF(x, y) else ExprKernels.dotDD(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (floatKernel) "dotFF" else "dotDD"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprKernels.$m($a, $b)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExpr =
    copy(left = l, right = r)
  override def prettyName: String = "graft_dot"
}

/** cosine(arr, arr) -> double, fused single-pass dot + norms. Both
  * sides must share the element type (checked at analysis time);
  * ragged inputs fold over the common prefix; null elements skipped. */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    GraftExpressions.checkVectorPair(prettyName, left, right)
  private lazy val floatKernel = GraftExpressions.isFloatArray(left)
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (floatKernel) ExprKernels.cosineFF(x, y) else ExprKernels.cosineDD(x, y)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (floatKernel) "cosineFF" else "cosineDD"
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprKernels.$m($a, $b)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
  override def prettyName: String = "graft_cosine"
}

/** hyperplane_sig(arr) -> long under up to 64 fixed hyperplanes. The
  * plane matrix rides along as a codegen reference object. */
case class HyperplaneSigExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.length <= 64,
    s"hyperplane signature supports 1..64 planes, got ${planes.length}")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${other.catalogString}")
  }
  private lazy val floatKernel = GraftExpressions.isFloatArray(child)
  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (floatKernel) ExprKernels.hyperplaneSigF(v, planes)
    else ExprKernels.hyperplaneSigD(v, planes)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    val m = if (floatKernel) "hyperplaneSigF" else "hyperplaneSigD"
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.$m($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_hyperplane_sig"
}

/** r20 constant-size ANN assignment kernels (the r19 verdict's ann_pq /
  * ann_ivfpq planning-overhead item): the per-centroid literal argmin
  * formulations built k (or m·ks) dot-kernel expression trees per
  * assignment — plan size, analysis time and per-stage codegen compile
  * all grew with k. Each expression below is ONE plan node generating
  * one static kernel call with the matrix as a codegen reference
  * object (the HyperplaneSigExpr pattern); the kernels replicate the
  * literal formulations' float semantics bit-for-bit (left-to-right
  * accumulation, same subtraction order, ties to the smaller cid —
  * equivalence spec-gated in SimilaritySpec). */

/** best_centroid(vec) -> struct(dist double, cid int): the nearest
  * centroid by (1 − cosine), ≡ array_min(centroidDists(cents, v)). */
case class BestCentroidExpr(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {
  require(cents.nonEmpty, "best_centroid requires at least one centroid")
  override def dataType: DataType = StructType(Seq(
    StructField("dist", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    ExprKernels.bestCentroid(input.asInstanceOf[ArrayData], cents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprKernels.bestCentroid($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BestCentroidExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_best_centroid"
}

/** probe_cells(vec) -> array<struct(dist double, cid int)>: the nprobe
  * nearest centroids in (dist, cid) order, ≡
  * slice(array_sort(centroidDists(cents, v)), 1, nprobe). */
case class ProbeCellsExpr(child: Expression, cents: Array[Array[Double]],
    nprobe: Int) extends UnaryExpression {
  require(cents.nonEmpty && nprobe >= 1,
    "probe_cells requires centroids and nprobe >= 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist", DoubleType, nullable = false),
    StructField("cid", IntegerType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    ExprKernels.probeCells(input.asInstanceOf[ArrayData], cents, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExprKernels.probeCells($c, $ref, $nprobe)")
  }
  override protected def withNewChildInternal(newChild: Expression): ProbeCellsExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_probe_cells"
}

/** pq_codes(vec) -> array<int>: all m product-quantizer subspace code
  * assignments (argmin of |c|² − 2⟨sub, c⟩ per codebook) in one pass,
  * ≡ array(argmin-literal-per-subspace…) over slice()d subvectors. */
case class PqCodesExpr(child: Expression, books: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(books.nonEmpty && books.forall(_.nonEmpty),
    "pq_codes requires at least one non-empty codebook")
  // the same driver-side left-to-right |c|² fold the literal
  // formulation baked in as lit(c.map(x => x*x).sum)
  @transient private lazy val sumsq: Array[Array[Double]] =
    books.map(_.map(c => c.map(x => x * x).sum))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    ExprKernels.pqCodes(input.asInstanceOf[ArrayData], books, sumsq)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("books", books, "double[][][]")
    val sRef = ctx.addReferenceObj("sumsq", sumsq, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExprKernels.pqCodes($c, $bRef, $sRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqCodesExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_pq_codes"
}

/** bloom_might_contain_long(hash) — Bloom-filter membership probe over
  * a 64-bit hash, the mass-kill prefilter for set-membership joins
  * whose build side is too large to broadcast as rows (TextOps.
  * text_decontam_bloom). The filter (org.apache.spark.util.sketch.
  * BloomFilter, java-serializable) rides along as a codegen reference
  * object exactly like HyperplaneSigExpr's plane matrix — constant
  * size per executor no matter how many items it summarizes. */
case class BloomMightContainLongExpr(child: Expression,
    filter: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint hash input, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLongExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_bloom_might_contain_long"
}
