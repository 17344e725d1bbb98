package graft.functions

/** Reed-Solomon erasure coding over GF(2^8) — the parity workload of
  * the reference's erasure-coding project (hops-erasure-coding-project/
  * hops-erasure-coding/src/main/java/io/hops/erasure_coding/
  * ReedSolomonCode.java:27 encodes k data + m parity symbols over
  * GF(2^8); ReedSolomonEncoder.java / XORDecoder.java drive it over
  * striped blocks). This is an independent implementation of the
  * standard construction: data symbols d_0..d_{k-1} define the unique
  * degree-<k polynomial P interpolating (x_i = i, d_i); parity_j =
  * P(k + j). Any k surviving evaluations reconstruct any erased block
  * by Lagrange interpolation — the MDS property. Field arithmetic uses
  * the AES polynomial 0x11D with exp/log tables.
  *
  * Per-document encoding is a pure map (no shuffle): at 100 TB this
  * pipelines at scan speed, exactly like the reference's per-block
  * parity generation.
  */
object ReedSolomon {

  private val Exp = new Array[Int](512)
  private val Log = new Array[Int](256)
  locally {
    var x = 1
    var i = 0
    while (i < 255) {
      Exp(i) = x
      Log(x) = i
      x <<= 1
      if ((x & 0x100) != 0) x ^= 0x11d
      i += 1
    }
    while (i < 512) { Exp(i) = Exp(i - 255); i += 1 }
  }

  def gfMul(a: Int, b: Int): Int =
    if (a == 0 || b == 0) 0 else Exp(Log(a) + Log(b))

  def gfInv(a: Int): Int = {
    require(a != 0, "no inverse of 0 in GF(256)")
    Exp(255 - Log(a))
  }

  /** Lagrange basis coefficient L_s(e) over points `pts`:
    * Π_{t∈pts, t≠s} (e ⊕ t) / (s ⊕ t)  (GF add = xor). */
  private def lagrangeAt(pts: Array[Int], s: Int, e: Int): Int = {
    var num = 1; var den = 1
    var i = 0
    while (i < pts.length) {
      val t = pts(i)
      if (t != s) {
        num = gfMul(num, e ^ t)
        den = gfMul(den, s ^ t)
      }
      i += 1
    }
    gfMul(num, gfInv(den))
  }

  /** Split a payload into k equal stripes (zero-padded). */
  def stripe(payload: Array[Byte], k: Int): Array[Array[Byte]] = {
    val stripeLen = math.max(1, (payload.length + k - 1) / k)
    Array.tabulate(k) { i =>
      val block = new Array[Byte](stripeLen)
      val from = i * stripeLen
      val n = math.max(0, math.min(stripeLen, payload.length - from))
      if (n > 0) System.arraycopy(payload, from, block, 0, n)
      block
    }
  }

  /** Encode m parity blocks for k data blocks (all equal length).
    * parity_j[b] = Σ_i L_i(k+j) · data_i[b] over GF(256). */
  def encode(data: Array[Array[Byte]], m: Int): Array[Array[Byte]] = {
    val k = data.length
    require(k + m <= 256, "k + m must be <= 256 for GF(256) points")
    val stripeLen = data(0).length
    val dataPts = Array.tabulate(k)(identity)
    Array.tabulate(m) { j =>
      val coeffs = Array.tabulate(k)(i => lagrangeAt(dataPts, i, k + j))
      val parity = new Array[Byte](stripeLen)
      var b = 0
      while (b < stripeLen) {
        var acc = 0
        var i = 0
        while (i < k) { acc ^= gfMul(coeffs(i), data(i)(b) & 0xff); i += 1 }
        parity(b) = acc.toByte
        b += 1
      }
      parity
    }
  }

  /** Reconstruct the block at evaluation point `erased` (data point
    * i < k, or parity point k+j) from any k surviving blocks, given as
    * (point -> bytes). */
  def decode(survivors: Map[Int, Array[Byte]], erased: Int, k: Int): Array[Byte] = {
    require(survivors.size >= k, s"need at least k=$k survivors, got ${survivors.size}")
    val picked = survivors.toSeq.sortBy(_._1).take(k).toArray
    val pts = picked.map(_._1)
    val stripeLen = picked(0)._2.length
    val coeffs = pts.map(s => lagrangeAt(pts, s, erased))
    val out = new Array[Byte](stripeLen)
    var b = 0
    while (b < stripeLen) {
      var acc = 0
      var i = 0
      while (i < k) { acc ^= gfMul(coeffs(i), picked(i)._2(b) & 0xff); i += 1 }
      out(b) = acc.toByte
      b += 1
    }
    out
  }

  /** FNV-1a fingerprint of a block (for compact per-block reporting). */
  def fingerprint(block: Array[Byte]): Long =
    block.foldLeft(1469598103934665603L)((h, b) => (h ^ (b & 0xff)) * 1099511628211L)
}
