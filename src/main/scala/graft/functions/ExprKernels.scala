package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Single-pass JVM kernels backing the custom Catalyst expressions in
  * [[GraftExpressions]]. Each method is called from generated code
  * (whole-stage codegen emits a static call), so the hot loops run as
  * tight JIT'd JVM code — one pass over the input array instead of the
  * 64 independent higher-order-function passes the r1 implementation
  * paid. Plain JVM `Long` arithmetic wraps, so none of this is subject
  * to Spark's ANSI overflow checking (which made the affine minhash mix
  * `h * a + b` throw ARITHMETIC_OVERFLOW).
  */
object ExprKernels {

  /** splitmix64 / murmur3 finalizer: a full-avalanche 64-bit mix. */
  @inline private def fmix64(v: Long): Long = {
    var x = v
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  /** Deterministic per-permutation seeds for minhash (max 256 perms). */
  private val Seeds: Array[Long] =
    Array.tabulate(256)(i => fmix64(0x9e3779b97f4a7c15L * (i + 1)))

  /** Frame fingerprint for the multimodal stub pipeline (r11, replaces
    * xxhash64): fmix64 over a golden-ratio (doc, frame) mix. fmix64 is
    * the one mixing primitive the oracle suite already re-expresses in
    * DuckDB (32/32-split HUGEINT multiplies — text_fingerprint,
    * text_cdc_chunks, mm_meta), so frame fingerprints become
    * cross-engine re-derivable and mm_framesample gains a full hash
    * oracle. Avalanche quality is equivalent for the stub's purposes
    * (the fingerprint only needs to be deterministic and well-mixed). */
  def frameFp(docId: Long, frameIdx: Long): Long =
    fmix64(docId * 0x9e3779b97f4a7c15L + frameIdx + 1L)

  /** 64-bit SimHash over a feature-hash array, one pass: accumulate 64
    * bit-counters, set output bit j iff a majority of features have bit
    * j set. O(64·n) adds in a tight loop (vs r1's 64 interpreted
    * `aggregate()` expression trees — the 580 s bench pathology).
    */
  def simhash64(features: ArrayData): Long = {
    val n = features.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = features.getLong(i)
      var j = 0
      while (j < 64) { counters(j) += ((h >>> j) & 1L).toInt; j += 1 }
      i += 1
    }
    var res = 0L
    var j = 0
    while (j < 64) { if (counters(j) * 2 > n) res |= 1L << j; j += 1 }
    res
  }

  /** MinHash signature: k "permutations" h_i(x) = fmix64(x ^ seed_i),
    * all minima tracked in ONE pass over the shingle set. An empty
    * shingle set yields an all-Long.MaxValue signature (empty docs
    * hash together, which is the semantics we want).
    */
  def minhashSig(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = shingles.getLong(i)
      var p = 0
      while (p < k) {
        val v = fmix64(h ^ Seeds(p))
        if (v < mins(p)) mins(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Distinct word-n-gram hashes of a text in ONE pass: lowercase,
    * split on spaces (empties dropped), hash each n-gram window by
    * chaining the word hashes, dedupe via sort+unique. Replaces a
    * 6-deep higher-order-function tree (split/filter/sequence/slice/
    * array_join/array_distinct/transform) that Spark evaluates
    * interpreted (HOFs are CodegenFallback) and that dominated the
    * dedup signature stage. Returns fewer than one hash per word; an
    * input with < n words yields an empty array (matching the HOF
    * `wordNgrams` guard semantics).
    */
  def wordNgramHashes(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    // 1) word hashes (FNV-1a over lowercased chars), empties dropped
    var wordHashes = new Array[Long](math.max(8, len / 4))
    var nWords = 0
    var h = 1469598103934665603L
    var inWord = false
    var i = 0
    while (i <= len) {
      val c = if (i < len) s.charAt(i) else ' '
      if (c == ' ') {
        if (inWord) {
          if (nWords == wordHashes.length)
            wordHashes = java.util.Arrays.copyOf(wordHashes, nWords * 2)
          wordHashes(nWords) = fmix64(h); nWords += 1
          h = 1469598103934665603L; inWord = false
        }
      } else {
        h = (h ^ Character.toLowerCase(c).toInt) * 1099511628211L
        inWord = true
      }
      i += 1
    }
    if (nWords < n) return new GenericArrayData(Array.emptyLongArray)
    // 2) n-gram hashes: chained fold over each window of n word hashes
    val nGrams = nWords - n + 1
    val grams = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      var acc = 0xcbf29ce484222325L
      var j = g
      while (j < g + n) { acc = fmix64(acc ^ wordHashes(j)); acc *= 1099511628211L; j += 1 }
      grams(g) = fmix64(acc)
      g += 1
    }
    // 3) distinct via sort+unique (minhash/simhash are order-invariant)
    java.util.Arrays.sort(grams)
    var uniq = 1
    var k = 1
    while (k < nGrams) {
      if (grams(k) != grams(k - 1)) { grams(uniq) = grams(k); uniq += 1 }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(grams, uniq))
  }

  /** ALL word n-grams of a text as space-joined strings, in document
    * order, duplicates KEPT (the counting form — [[wordNgramHashes]]
    * is the set form for signatures). Tokenization matches the SQL
    * `string_split(lower(text), ' ')` + drop-empties convention used
    * by every text oracle. One codegen'd pass; the column-level HOF
    * formulation (`transform(sequence(...), slice/array_join)`) is
    * CodegenFallback and runs interpreted over every window. An input
    * with < n words yields an empty array. */
  def wordNgrams(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString // UTF8String lowercase = SQL lower()
    // word boundaries (empties dropped)
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0; var inWord = false
    val len = s.length
    while (i <= len) {
      val c = if (i < len) s.charAt(i) else ' '
      if (c == ' ') {
        if (inWord) { ends.add(i); inWord = false }
      } else if (!inWord) { starts.add(i); inWord = true }
      i += 1
    }
    val nWords = starts.size()
    if (nWords < n)
      return new GenericArrayData(Array.empty[org.apache.spark.unsafe.types.UTF8String])
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](nWords - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var g = 0
    while (g < out.length) {
      sb.setLength(0)
      var j = g
      while (j < g + n) {
        if (j > g) sb.append(' ')
        sb.append(s, starts.get(j), ends.get(j))
        j += 1
      }
      out(g) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprint stats over character n-grams, one pass:
    * hash every n-gram (FNV-1a over lowercased chars), take the min of
    * each w-wide window, dedupe the minima in first-occurrence order,
    * and fold them into one FNV fingerprint. Returns
    * [n_grams, n_selected, fingerprint]. The column-level formulation
    * (`transform(sequence, i -> array_min(slice(hashes, i, w)))`)
    * re-evaluates the whole `hashes` subexpression per window position
    * in interpreted mode — O(n_grams²) per row, which hung the sf0.1
    * bench once the sink actually materialized the column.
    */
  def winnowStats(text: org.apache.spark.unsafe.types.UTF8String, n: Int, w: Int): Array[Long] = {
    val s = text.toString
    val len = s.length
    val nGrams = math.max(0, len - n + 1)
    if (nGrams == 0) return Array(0L, 0L, 1469598103934665603L)
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = 1469598103934665603L
      var j = i
      while (j < i + n) {
        h = (h ^ Character.toLowerCase(s.charAt(j)).toInt) * 1099511628211L
        j += 1
      }
      hashes(i) = fmix64(h)
      i += 1
    }
    val nWins = math.max(1, nGrams - w + 1)
    val effW = math.min(w, nGrams)
    val seen = new java.util.HashSet[java.lang.Long]()
    var fp = 1469598103934665603L
    var selected = 0L
    var p = 0
    while (p < nWins) {
      var mn = Long.MaxValue
      var q = p
      while (q < p + effW) { if (hashes(q) < mn) mn = hashes(q); q += 1 }
      if (seen.add(mn)) {
        fp = (fp ^ mn) * 1099511628211L
        selected += 1
      }
      p += 1
    }
    Array(nGrams.toLong, selected, fp)
  }

  /** Gear table for content-defined chunking, kept mod 2^10: only the
    * low 10 bits ever reach the boundary test (see [[cdcChunks]]), and
    * publishing the table as `fmix64(byte + 1) & 1023` lets the DuckDB
    * oracle rebuild it independently from the same five-line mix. */
  private val GearMod: Array[Long] =
    Array.tabulate(256)(b => fmix64((b + 1).toLong) & 1023L)

  /** Content-defined chunking (the rolling-hash boundary scheme of
    * LBFS — Muthitacharoen et al., SOSP'01 — and the Gear hash of
    * FastCDC): a position ends a chunk when a rolling hash of the
    * trailing bytes lands in a 1/64 target band, so chunk boundaries
    * depend on CONTENT, not offsets — an insertion shifts every
    * fixed-size block but only perturbs the one CDC chunk it lands in,
    * which is what makes chunk-level dedup robust.
    *
    * Gear recurrence `S = ((S << 1) + gear(b)) & 1023` with modulus
    * 2^10: each shifted term self-expires after 10 steps, so S at
    * position i equals Σ_{j=0..9} gear(b_{i-j})·2^j mod 1024 — a pure
    * function of the trailing 10-byte window. That positional
    * independence is load-bearing twice over: the kernel is one
    * sequential pass per row (no cross-row state, embarrassingly
    * parallel at 100 TB), and a second engine can recompute every
    * boundary with lag() window sums (the DuckDB oracle does exactly
    * that). Boundary iff S < 16 (bits 4..9 zero → mean chunk 64 B on
    * this corpus's ~1–3 KB docs); no FastCDC min/max clamp — a clamp
    * would make each boundary depend on the previous one and destroy
    * the positional independence the oracle and the doc-parallel
    * argument both rest on.
    *
    * Returns flattened (start, len, fnv64) triples; FNV-1a over the
    * chunk's chars (& 0xff — byte-equal on the ASCII corpus, same
    * caveat as [[winnowStats]]'s hex-byte oracle). Empty text → empty
    * array; chunk spans partition [0, len) exactly (gated in
    * KernelSpec against a naive positional re-derivation). */
  def cdcChunks(text: org.apache.spark.unsafe.types.UTF8String): Array[Long] = {
    val s = text.toString
    val len = s.length
    if (len == 0) return Array.empty[Long]
    // r20 (dedup_cdc was the suite's gc_top leader, 21.8 GC-task-s for
    // a 1.8 s wall): the old ArrayBuffer[Long] boxed EVERY appended
    // long (generic collection) — ~90 java.lang.Long allocations per
    // 1–3 KB doc per pass. Primitive array + manual doubling is
    // allocation-free per element; identical output.
    var out = new Array[Long](72) // 24 chunks before first growth
    var n = 0
    def emit(start: Int, end: Int): Unit = {
      var h = 1469598103934665603L
      var j = start
      while (j <= end) { h = (h ^ (s.charAt(j) & 0xff)) * 1099511628211L; j += 1 }
      if (n + 3 > out.length) out = java.util.Arrays.copyOf(out, out.length * 2)
      out(n) = start.toLong; out(n + 1) = (end - start + 1).toLong; out(n + 2) = h
      n += 3
    }
    var start = 0
    var S = 0L
    var i = 0
    while (i < len) {
      S = ((S << 1) + GearMod(s.charAt(i) & 0xff)) & 1023L
      if (S < 16L) { emit(start, i); start = i + 1 }
      i += 1
    }
    if (start < len) emit(start, len - 1)
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** FNV-1a 64-bit over a string's UTF-8 bytes (wrapping multiply) —
    * the ENGINE-PORTABLE row/content fingerprint: DuckDB recomputes it
    * as a `list_reduce` over `ascii(ch)` HUGEINTs (the gramSql device)
    * while the fingerprinted text stays ASCII, where bytes ==
    * codepoints (the documented Verify precondition). Used by the
    * snapshot-apply fingerprints so the physical-round-trip
    * verification hash-matches a second engine — xxhash64 can't. */
  def fnv64String(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val n = s.numBytes()
    var h = 1469598103934665603L
    var i = 0
    while (i < n) { h = (h ^ (s.getByte(i) & 0xff)) * 1099511628211L; i += 1 }
    h
  }

  /** FNV-1a-style 64-bit fold over a long array (wrapping multiply —
    * the HOF `aggregate` form throws ARITHMETIC_OVERFLOW under ANSI). */
  def fnv64Fold(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    var acc = 1469598103934665603L
    var i = 0
    while (i < n) { acc = (acc ^ hashes.getLong(i)) * 1099511628211L; i += 1 }
    acc
  }

  /** Jaccard similarity of two SORTED distinct long arrays via linear
    * merge — the scoring kernel for hash-shingled documents (the
    * array_intersect/array_union built-ins hash-build per row and box
    * elements). */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na + nb - inter
    inter.toDouble / union
  }

  /** Intersection COUNT of two SORTED distinct long arrays via the same
    * linear merge as [[jaccardSorted]], returned as an exact integer.
    * |A∪B| follows as |A|+|B|−|A∩B|, so a caller can express Jaccard
    * thresholds and integer-ppm scores in pure integer arithmetic —
    * bit-identical across engines, with no double-rounding step for an
    * oracle to disagree on. */
  def intersectSortedCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  /** Containment of the SMALLER of two SORTED distinct long arrays in
    * the larger: |A∩B| / min(|A|,|B|) via the same linear merge as
    * [[jaccardSorted]]. This is Broder's containment coefficient — the
    * right score when one document may be embedded in another:
    * a prefix half has containment 1.0 but Jaccard only ~0.5, so a
    * resemblance threshold misses it. 0.0 when either side is empty. */
  def containmentSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 || nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / math.min(na, nb)
  }

  /** Vector-kernel null contract: parquet array columns default to
    * containsNull=true, so the embedding kernels below check isNullAt
    * and SKIP null slots (a null element contributes nothing to dot /
    * norm / signature) instead of reading garbage. Null-free inputs —
    * all real embedding data — take the same accumulation path in the
    * same order, so results stay bit-identical to the sequential HOF
    * folds (and DuckDB's list_cosine_similarity over DOUBLE[]). */

  /** Fused dot product over two float arrays (each element widened to
    * double before multiply — same result as casting to array<double>
    * first, without materializing the cast copy). */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) dot += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    dot
  }

  /** Fused cosine similarity: dot + both norms in a single pass. Each
    * accumulator sums left-to-right exactly like the sequential HOF
    * fold it replaces, so double-precision results are bit-identical
    * to DuckDB's list_cosine_similarity over DOUBLE[]. */
  def cosineFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Cosine against a DRIVER-CONSTANT centroid — bit-identical to
    * [[cosineDD]] with the centroid as a literal array (same
    * left-to-right accumulation, same skip-null-left rule; the
    * constant side is never null). Backbone of the r20 constant-size
    * ANN kernels below. */
  private def cosineVsConst(a: ArrayData, c: Array[Double]): Double = {
    val n = math.min(a.numElements(), c.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = a.getDouble(i); val y = c(i)
        dot += x * y; na += x * x; nb += y * y
      }
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** r20 constant-size argmin over a centroid matrix: (dist, cid) of
    * the nearest centroid by (1 − cosine), ties to the smaller cid —
    * exactly `array_min(array(struct(1.0 − cosine(v, c_i), i)…))` over
    * per-centroid literals (SimilaritySpec gates the equivalence), but
    * ONE plan node and one generated call instead of k dot-kernel
    * expression trees, so plan size and codegen compile time stop
    * growing with k (the ann_pq/ann_ivfpq planning overhead named in
    * the r19 verdict). Double comparison via java.lang.Double.compare:
    * NaN sorts largest, matching Spark's ordering (−0.0 is unreachable
    * here — 1.0 − x never yields it). */
  def bestCentroid(v: ArrayData, cents: Array[Array[Double]]): InternalRow = {
    var bestD = 0.0; var bestC = 0; var first = true
    var i = 0
    while (i < cents.length) {
      val d = 1.0 - cosineVsConst(v, cents(i))
      if (first || java.lang.Double.compare(d, bestD) < 0) {
        bestD = d; bestC = i; first = false
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestD, bestC))
  }

  /** r20: the nprobe nearest centroids as sorted (dist, cid) structs —
    * `slice(array_sort(array(struct(…)…)), 1, nprobe)` in one node
    * (same (dist asc, cid asc) order; cids are distinct so the sort is
    * total). */
  def probeCells(v: ArrayData, cents: Array[Array[Double]],
      nprobe: Int): ArrayData = {
    val k = cents.length
    val order = new Array[Integer](k)
    val dists = new Array[Double](k)
    var i = 0
    while (i < k) {
      dists(i) = 1.0 - cosineVsConst(v, cents(i)); order(i) = i; i += 1
    }
    java.util.Arrays.sort(order, (a: Integer, b: Integer) => {
      val c = java.lang.Double.compare(dists(a), dists(b))
      if (c != 0) c else Integer.compare(a, b)
    })
    val n = math.min(nprobe, k)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](dists(order(i)), order(i).intValue()))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** r20: all m PQ subspace code assignments in one pass — for each
    * subspace mi, argmin over its codebook of |c|² − 2·⟨sub, c⟩ (the
    * row-constant |sub|² cancels inside argmin), ties to the smaller
    * code. Bit-identical to the per-centroid literal formulation
    * (`lit(sumsq) − lit(2.0) * dot(slice(vec), lit(c))` — same
    * left-to-right dot, same driver-side sumsq fold, same subtraction
    * order), collapsed from m·ks dot-kernel trees into one node. */
  def pqCodes(v: ArrayData, books: Array[Array[Array[Double]]],
      sumsq: Array[Array[Double]]): ArrayData = {
    val m = books.length
    val ds = books(0)(0).length
    val total = v.numElements()
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val base = mi * ds
      val n = math.max(0, math.min(total - base, ds))
      val bk = books(mi)
      var bestD = 0.0; var bestC = 0; var first = true
      var ci = 0
      while (ci < bk.length) {
        val c = bk(ci)
        var dot = 0.0
        var j = 0
        while (j < n) {
          if (!v.isNullAt(base + j)) dot += v.getDouble(base + j) * c(j)
          j += 1
        }
        val dist = sumsq(mi)(ci) - 2.0 * dot
        if (first || java.lang.Double.compare(dist, bestD) < 0) {
          bestD = dist; bestC = ci; first = false
        }
        ci += 1
      }
      out(mi) = bestC
      mi += 1
    }
    new GenericArrayData(out)
  }

  def cosineDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = a.getDouble(i); val y = b.getDouble(i)
        dot += x * y; na += x * x; nb += y * y
      }
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Random-hyperplane LSH signature: bit i = (v · plane_i >= 0), all
    * planes in one pass over the vector per plane (<= 64 planes). */
  def hyperplaneSigF(v: ArrayData, planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      val n = math.min(v.numElements(), p.length)
      var d = 0.0
      var j = 0
      while (j < n) {
        if (!v.isNullAt(j)) d += v.getFloat(j).toDouble * p(j)
        j += 1
      }
      if (d >= 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  def hyperplaneSigD(v: ArrayData, planes: Array[Array[Double]]): Long = {
    var sig = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      val n = math.min(v.numElements(), p.length)
      var d = 0.0
      var j = 0
      while (j < n) {
        if (!v.isNullAt(j)) d += v.getDouble(j) * p(j)
        j += 1
      }
      if (d >= 0) sig |= 1L << i
      i += 1
    }
    sig
  }
}
