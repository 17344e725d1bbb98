package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded DISTINCT bottom-k buffer: sorted ascending, deduplicated,
  * never longer than k. Top-level case class so Spark's generated
  * serializer can resolve the accessor. */
final case class KmvBuf(hs: Array[Long])

/** Typed KMV (k-minimum-values) sketch aggregator — the bottom-k
  * distinct hash state of [[graft.operators.EventOps.ev_kmv_uniques]]
  * as a first-class mergeable aggregate.
  *
  * Why an Aggregator and not distinct + window: the window form
  * shuffles every distinct hash to its group's partition and sorts
  * there before discarding all but k; this runs as a two-phase
  * ObjectHashAggregate where the PARTIAL phase caps each group at k
  * DISTINCT values per map task — the shuffle carries ≤ k·tasks
  * values per group no matter how many events or users feed it, and
  * duplicate hashes die in the map task (no pre-distinct pass at
  * all). `merge` is exactly the textbook KMV sketch-union (merge two
  * bottom-k sets, dedup, re-take bottom-k) — the property that makes
  * KMV a DISTRIBUTED sketch, and the same code path Structured
  * Streaming uses to fold each micro-batch's partial into the keyed
  * state ([[graft.streaming.StreamingOps.kmvStream]]).
  *
  * Everything is exact integer comparison — no ordering ambiguity —
  * so the aggregator's result is bit-identical to the distinct +
  * row_number formulation the DuckDB oracle runs. */
class KmvAggregator(k: Int) extends Aggregator[Long, KmvBuf, KmvBuf] {

  override def zero: KmvBuf = KmvBuf(Array.empty)

  override def reduce(b: KmvBuf, h: Long): KmvBuf = {
    val n = b.hs.length
    // binary search for the insertion point; equal → already present
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b.hs(mid) < h) lo = mid + 1
      else if (b.hs(mid) > h) hi = mid
      else return b
    }
    if (lo >= k) return b // larger than the current k-th minimum
    val m = math.min(n + 1, k)
    val out = new Array[Long](m)
    System.arraycopy(b.hs, 0, out, 0, lo)
    out(lo) = h
    val tail = m - lo - 1
    if (tail > 0) System.arraycopy(b.hs, lo, out, lo + 1, tail)
    KmvBuf(out)
  }

  override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
    val m = math.min(x.hs.length + y.hs.length, k)
    val out = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m && (i < x.hs.length || j < y.hs.length)) {
      val takeX = j >= y.hs.length ||
        (i < x.hs.length && x.hs(i) <= y.hs(j))
      val v = if (takeX) x.hs(i) else y.hs(j)
      if (takeX) i += 1 else j += 1
      // dedup across the two buffers
      if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
    }
    KmvBuf(if (o == m) out else java.util.Arrays.copyOf(out, o))
  }

  override def finish(r: KmvBuf): KmvBuf = r
  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
}
