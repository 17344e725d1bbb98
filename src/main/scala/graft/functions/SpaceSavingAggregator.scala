package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded frequent-items summary: parallel arrays of (item, count
  * upper bound, max overcount), at most `capacity` live entries.
  * Top-level case class so Spark's generated serializer resolves the
  * accessors. `n` is the live-entry count; arrays are pre-sized. */
final case class SSBuf(n: Int, items: Array[Long], counts: Array[Long],
    errs: Array[Long])

/** SpaceSaving heavy-hitters sketch (Metwally et al.) as a typed,
  * MERGEABLE Aggregator — the frequent-items companion to the HLL
  * uniques path (ev_approx_uniques): fixed memory per partition, one
  * map-side summary per task, shuffle carries ≤ capacity rows per
  * partition instead of the full key cardinality. At 100 TB "top
  * users/domains by volume" over a billion-key column is exactly the
  * query an exact groupBy-count answers with a full-cardinality
  * shuffle and this answers with capacity·tasks rows.
  *
  * Guarantees (the standard SpaceSaving bounds, spec-gated in
  * EventOpsSpec): every item with true frequency > N/capacity is in
  * the summary; for each entry, true ≤ count ≤ true + err. Merging
  * folds one summary's entries into the other as weighted inserts
  * (count, err carried), which preserves both bounds (Agarwal et al.,
  * "Mergeable summaries"). When distinct keys ≤ capacity the summary
  * is EXACT (no eviction ever fires, err stays 0).
  *
  * reduce/merge mutate the buffer in place (object-hash-aggregate
  * buffers are task-local); eviction is a linear min-scan — fine for
  * the capacities this is meant for (tens to a few thousand); a
  * heap-indexed variant pays off only beyond that.
  */
class SpaceSavingAggregator(capacity: Int)
    extends Aggregator[Long, SSBuf, SSBuf] {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def zero: SSBuf =
    SSBuf(0, new Array[Long](capacity), new Array[Long](capacity),
      new Array[Long](capacity))

  /** Weighted insert: existing item adds (w, e); a new item takes a
    * free slot or evicts the current min m, entering with count m+w
    * and overcount bound m+e. */
  private def add(b: SSBuf, item: Long, w: Long, e: Long): SSBuf = {
    var i = 0
    while (i < b.n) {
      if (b.items(i) == item) {
        b.counts(i) += w; b.errs(i) += e
        return b
      }
      i += 1
    }
    if (b.n < capacity) {
      b.items(b.n) = item; b.counts(b.n) = w; b.errs(b.n) = e
      b.copy(n = b.n + 1)
    } else {
      var mi = 0; i = 1
      while (i < b.n) {
        if (b.counts(i) < b.counts(mi)) mi = i
        i += 1
      }
      val m = b.counts(mi)
      b.items(mi) = item; b.counts(mi) = m + w; b.errs(mi) = m + e
      b
    }
  }

  override def reduce(b: SSBuf, item: Long): SSBuf = add(b, item, 1L, 0L)

  override def merge(x: SSBuf, y: SSBuf): SSBuf = {
    var acc = x
    var i = 0
    while (i < y.n) {
      acc = add(acc, y.items(i), y.counts(i), y.errs(i))
      i += 1
    }
    acc
  }

  override def finish(b: SSBuf): SSBuf = b
  override def bufferEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
  override def outputEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
}
