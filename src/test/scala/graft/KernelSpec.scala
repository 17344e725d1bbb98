package graft

import graft.functions.{ExprKernels, TextFunctions, VectorFunctions}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

/** The custom expression kernels against independent reference
  * implementations (seeded-random sampling where cheap). */
class KernelSpec extends SparkSpec {

  private def refSimhash(features: Seq[Long]): Long = {
    // independent re-derivation: majority vote per bit
    (0 until 64).map { j =>
      val ones = features.count(h => ((h >>> j) & 1L) == 1L)
      if (ones * 2 > features.size) 1L << j else 0L
    }.foldLeft(0L)(_ | _)
  }

  test("simhash64 kernel matches reference majority-vote implementation") {
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val hs = List.fill(rnd.nextInt(40))(rnd.nextLong())
      val got = ExprKernels.simhash64(new GenericArrayData(hs.toArray))
      assert(got == refSimhash(hs))
    }
  }

  test("fnv64String matches an independent FNV-1a-style byte loop and the SQL function resolves") {
    import org.apache.spark.unsafe.types.UTF8String
    // the graft FNV family's offset basis (1469598103934665603 — shared
    // by the CDC/gram kernels and every DuckDB gramSql re-derivation;
    // NOT the textbook 0xcbf29ce484222325, which overflows a signed
    // literal and predates the repo's cross-engine constant), with the
    // standard FNV prime
    def ref(bytes: Array[Byte]): Long = {
      var h = 1469598103934665603L
      bytes.foreach(b => h = (h ^ (b & 0xff)) * 1099511628211L)
      h
    }
    val rnd = new scala.util.Random(13)
    (0 until 200).foreach { _ =>
      val s = scala.util.Random.javaRandomToRandom(new java.util.Random(rnd.nextLong()))
        .alphanumeric.take(rnd.nextInt(60)).mkString
      assert(ExprKernels.fnv64String(UTF8String.fromString(s)) ===
        ref(s.getBytes("UTF-8")))
    }
    assert(ExprKernels.fnv64String(UTF8String.fromString("")) === 1469598103934665603L)
    // extension-registered SQL name resolves and agrees with the kernel
    val viaSql = spark.sql("SELECT graft_fnv64_string('abc')").collect()(0).getLong(0)
    assert(viaSql === ref("abc".getBytes("UTF-8")))
  }

  test("minhash signature: identical sets agree, disjoint sets do not") {
    val a = new GenericArrayData(Array.tabulate(50)(i => i * 0x9e3779b97f4a7c15L))
    val b = new GenericArrayData(Array.tabulate(50)(i => i * 0x9e3779b97f4a7c15L))
    val c = new GenericArrayData(Array.tabulate(50)(i => (i + 1000) * 0x61c8864680b583ebL))
    val sa = ExprKernels.minhashSig(a, 32).toLongArray()
    val sb = ExprKernels.minhashSig(b, 32).toLongArray()
    val sc = ExprKernels.minhashSig(c, 32).toLongArray()
    assert(sa.sameElements(sb))
    val agree = sa.zip(sc).count { case (x, y) => x == y }
    assert(agree < 8, s"disjoint sets should rarely agree, got $agree/32")
  }

  test("minhash agreement estimates Jaccard for overlapping sets") {
    // A = h(0..99), B = h(50..149): |A∩B| = 50, |A∪B| = 150, J = 1/3
    val a = new GenericArrayData(Array.tabulate(100)(i => ExprKernels.fnv64Fold(
      new GenericArrayData(Array(i.toLong)))))
    val b = new GenericArrayData(Array.tabulate(100)(i => ExprKernels.fnv64Fold(
      new GenericArrayData(Array((i + 50).toLong)))))
    val k = 256
    val sa = ExprKernels.minhashSig(a, k).toLongArray()
    val sb = ExprKernels.minhashSig(b, k).toLongArray()
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / k
    val trueJ = 50.0 / 150.0
    assert(math.abs(est - trueJ) < 0.12, s"est $est vs true $trueJ")
  }

  test("cosine expression matches HOF formulation on real embeddings") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf0001).limit(20)
    val a = e.select($"vec_id", $"embedding")
    val b = e.select($"vec_id".as("vec_id2"), $"embedding".as("embedding2"))
    // HOF reference: cast to double, fold dot and norms separately
    def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    def hofNorm(x: org.apache.spark.sql.Column) =
      sqrt(aggregate(x, lit(0.0), (acc, v) => acc + v * v))
    val both = a.crossJoin(b).filter($"vec_id" < $"vec_id2")
      .select(
        VectorFunctions.cosine($"embedding", $"embedding2").as("fused"),
        (hofDot($"embedding".cast("array<double>"), $"embedding2".cast("array<double>")) /
          (hofNorm($"embedding".cast("array<double>")) *
            hofNorm($"embedding2".cast("array<double>")))).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"fused ${r.getDouble(0)} != hof ${r.getDouble(1)}")
    }
  }

  test("wordNgramHashes agrees with the HOF ngram set on count") {
    import spark.implicits._
    val got = Tables.documents(spark, sf0001)
      .select(size(TextFunctions.shingleHashes($"text", 3)).as("kernel_n"),
        size(TextFunctions.wordNgramSet($"text", 3)).as("hof_n"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(0) == r.getInt(1),
        s"kernel ${r.getInt(0)} grams != HOF ${r.getInt(1)}")
    }
  }

  test("jaccardSorted kernel matches the array_intersect/union formulation") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", TextFunctions.shingleHashes($"text", 3).as("g"))
    val a = docs.limit(30)
    val b = docs.limit(30).select($"doc_id".as("doc_id2"), $"g".as("g2"))
    val rows = a.crossJoin(b).filter($"doc_id" < $"doc_id2")
      .select(TextFunctions.jaccardSorted($"g", $"g2").as("kernel"),
        TextFunctions.jaccard($"g", $"g2").as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("containmentSorted kernel matches the array_intersect/min formulation") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
      .select($"doc_id", TextFunctions.shingleHashes($"text", 3).as("g"))
    val a = docs.limit(30)
    val b = docs.limit(30).select($"doc_id".as("doc_id2"), $"g".as("g2"))
    val rows = a.crossJoin(b).filter($"doc_id" < $"doc_id2")
      .select(TextFunctions.containmentSorted($"g", $"g2").as("kernel"),
        (size(array_intersect($"g", $"g2")).cast("double") /
          least(size($"g"), size($"g2"))).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("containmentSorted is 1.0 for a subset and >= jaccard always") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val sub = new GenericArrayData(Array(2L, 5L, 9L))
    val sup = new GenericArrayData(Array(1L, 2L, 5L, 7L, 9L, 11L))
    assert(graft.functions.ExprKernels.containmentSorted(sub, sup) == 1.0)
    assert(graft.functions.ExprKernels.containmentSorted(sup, sub) == 1.0)
    val other = new GenericArrayData(Array(2L, 3L, 9L, 20L))
    val c = graft.functions.ExprKernels.containmentSorted(sub, other)
    val j = graft.functions.ExprKernels.jaccardSorted(sub, other)
    assert(c >= j && math.abs(c - 2.0 / 3) < 1e-12)
    val empty = new GenericArrayData(Array.emptyLongArray)
    assert(graft.functions.ExprKernels.containmentSorted(empty, sup) == 0.0)
  }

  test("wordNgrams kernel matches the HOF formulation exactly") {
    import spark.implicits._
    val rows = Tables.documents(spark, sf0001)
      .select(TextFunctions.wordNgramsAll($"text", 2).as("kernel"),
        TextFunctions.wordNgrams($"text", 2).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
    // degenerate inputs: fewer words than n, mixed whitespace runs, case
    val edge = Seq("", "one", "one two", "  A  b ", "x Y z").toDF("text")
      .select(TextFunctions.wordNgramsAll($"text", 2).as("kernel"),
        TextFunctions.wordNgrams($"text", 2).as("hof"))
      .collect()
    edge.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  // --- winnowing reference implementation (independent, brute-force):
  // hash every char n-gram, take each w-window's min by scanning the
  // whole window, dedupe minima in first-occurrence order, FNV-fold.
  private def refFmix(v: Long): Long = {
    var x = v
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }
  private def refWinnowStats(s: String, n: Int, w: Int): Seq[Long] = {
    val fnvInit = 1469598103934665603L; val fnvPrime = 1099511628211L
    val nGrams = math.max(0, s.length - n + 1)
    if (nGrams == 0) return Seq(0L, 0L, fnvInit)
    val hashes = (0 until nGrams).map { i =>
      refFmix(s.substring(i, i + n).map(Character.toLowerCase)
        .foldLeft(fnvInit)((h, c) => (h ^ c.toInt) * fnvPrime))
    }
    val effW = math.min(w, nGrams)
    val minima = (0 until math.max(1, nGrams - w + 1))
      .map(p => hashes.slice(p, p + effW).min)
    val selected = minima.distinct
    val fp = selected.foldLeft(fnvInit)((h, m) => (h ^ m) * fnvPrime)
    Seq(nGrams.toLong, selected.size.toLong, fp)
  }

  test("winnowStats kernel matches brute-force winnowing reference") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(13)
    // low-entropy alphabet forces duplicate grams / repeated minima
    def randText(len: Int) = (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val cases = Seq("", "ab", "abcd", "aaaaaaaaaa") ++
      (0 until 60).map(_ => randText(rnd.nextInt(200))) ++
      Tables.documents(spark, sf0001).select("text").limit(40)
        .collect().map(_.getString(0)).toSeq
    cases.foreach { s =>
      val got = ExprKernels.winnowStats(UTF8String.fromString(s), 5, 8).toSeq
      val want = refWinnowStats(s, 5, 8)
      assert(got == want, s"winnow mismatch on len=${s.length}: $got vs $want")
    }
    // a second (n, w) parameterization
    cases.take(30).foreach { s =>
      assert(ExprKernels.winnowStats(UTF8String.fromString(s), 3, 4).toSeq ==
        refWinnowStats(s, 3, 4))
    }
  }

  test("cdcChunks matches a naive positional re-derivation and partitions the text") {
    import org.apache.spark.unsafe.types.UTF8String
    // Independent reference: recompute every boundary POSITIONALLY
    // (S_i = Σ_{j≤min(i,9)} gear(b_{i-j})·2^j mod 1024) instead of the
    // kernel's incremental recurrence — proving the self-expiry claim
    // the DuckDB oracle's lag()-sum also rests on.
    def fmix(v: Long): Long = {
      var x = v
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^= x >>> 33; x
    }
    val gear = Array.tabulate(256)(b => fmix((b + 1).toLong) & 1023L)
    def refChunks(s: String): Seq[(Long, Long, Long)] = {
      val len = s.length
      if (len == 0) return Seq.empty
      val bounds = (0 until len).filter { i =>
        val sum = (0 to math.min(i, 9)).map(j => gear(s.charAt(i - j) & 0xff) << j).sum
        (sum & 1023L) < 16L
      }
      val starts = 0 +: bounds.map(_ + 1)
      val ends =
        if (bounds.nonEmpty && bounds.last == len - 1) bounds else bounds :+ (len - 1)
      starts.zip(ends).map { case (st, en) =>
        var h = 1469598103934665603L
        (st to en).foreach(j => h = (h ^ (s.charAt(j) & 0xff)) * 1099511628211L)
        (st.toLong, (en - st + 1).toLong, h)
      }
    }
    val rnd = new scala.util.Random(11)
    val cases = Seq("", "a", "hello world, the quick brown fox") ++
      (0 until 60).map(_ => rnd.alphanumeric.take(rnd.nextInt(500)).mkString(" ", " ", "."))
    cases.foreach { s =>
      val flat = ExprKernels.cdcChunks(UTF8String.fromString(s))
      val got = flat.grouped(3).map(a => (a(0), a(1), a(2))).toSeq
      assert(got == refChunks(s), s"kernel/reference mismatch for len=${s.length}")
      // chunks partition [0, len) exactly: contiguous starts, lens sum to len
      assert(got.map(_._2).sum == s.length.toLong)
      got.foldLeft(0L) { case (expected, (st, l, _)) =>
        assert(st == expected, s"non-contiguous chunk at $st (expected $expected)")
        st + l
      }
    }
    // duplicate detection property: a shared span between two texts
    // yields shared chunk hashes even when the span's OFFSET differs
    // (the fixed-block scheme this replaces would miss it)
    val span = rnd.alphanumeric.take(400).mkString
    val h1 = ExprKernels.cdcChunks(UTF8String.fromString("PREFIX-A " + span))
      .grouped(3).map(_(2)).toSet
    val h2 = ExprKernels.cdcChunks(UTF8String.fromString("a different, longer prefix: " + span))
      .grouped(3).map(_(2)).toSet
    assert((h1 & h2).nonEmpty, "offset-shifted shared span must share chunk hashes")
  }

  test("hyperplane signature is deterministic and discriminative") {
    import spark.implicits._
    val planes = VectorFunctions.randomPlanes(16, 64)
    val sigs = Tables.embeddings(spark, sf0001)
      .select(VectorFunctions.hyperplaneSignature($"embedding", planes).as("sig"))
      .collect().map(_.getLong(0))
    assert(sigs.distinct.length > 1, "signatures must vary across vectors")
    val again = Tables.embeddings(spark, sf0001)
      .select(VectorFunctions.hyperplaneSignature($"embedding", planes).as("sig"))
      .collect().map(_.getLong(0))
    assert(sigs.sameElements(again))
  }
}
