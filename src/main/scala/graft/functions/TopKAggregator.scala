package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k buffer: parallel arrays sorted by (value DESC,
  * key ASC), never longer than k. Top-level case class so Spark's
  * generated serializer can resolve the accessors. */
final case class TopKBuf(values: Array[Double], keys: Array[Long])

/** Typed per-group TOP-K aggregator — the scalable grouped-top-k plan.
  *
  * Why not a window: `row_number().over(partitionBy(g).orderBy(v))`
  * shuffles EVERY row to its group's partition and sorts there before
  * discarding all but k (Spark's WindowGroupLimit prunes some of that,
  * but rank still needs the rows co-located). An Aggregator runs as a
  * two-phase ObjectHashAggregate: the PARTIAL phase caps each group at
  * k rows per map task, so the shuffle carries at most k·tasks rows
  * per group regardless of group size — at 100 TB the difference
  * between shuffling the fact table and shuffling kilobytes.
  *
  * Both reduce and merge are linear bounded-merges over the sorted
  * buffers. Ties break toward the smaller key, so results are
  * deterministic and comparable to a SQL row_number oracle. Output is
  * the final buffer; callers explode (values, keys) into rows.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), TopKBuf, TopKBuf] {

  override def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  /** (value, key) ranks before position i? */
  private def before(v: Double, key: Long, b: TopKBuf, i: Int): Boolean =
    v > b.values(i) || (v == b.values(i) && key < b.keys(i))

  override def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf = {
    val n = b.values.length
    if (n == k && !before(a._1, a._2, b, n - 1)) return b
    var i = 0
    while (i < n && !before(a._1, a._2, b, i)) i += 1
    val m = math.min(n + 1, k)
    val vs = new Array[Double](m); val ks = new Array[Long](m)
    System.arraycopy(b.values, 0, vs, 0, i)
    System.arraycopy(b.keys, 0, ks, 0, i)
    vs(i) = a._1; ks(i) = a._2
    val tail = m - i - 1
    if (tail > 0) {
      System.arraycopy(b.values, i, vs, i + 1, tail)
      System.arraycopy(b.keys, i, ks, i + 1, tail)
    }
    TopKBuf(vs, ks)
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    val m = math.min(x.values.length + y.values.length, k)
    val vs = new Array[Double](m); val ks = new Array[Long](m)
    var i = 0; var j = 0; var o = 0
    while (o < m) {
      val takeX = j >= y.values.length ||
        (i < x.values.length && !before(y.values(j), y.keys(j), x, i))
      if (takeX) { vs(o) = x.values(i); ks(o) = x.keys(i); i += 1 }
      else { vs(o) = y.values(j); ks(o) = y.keys(j); j += 1 }
      o += 1
    }
    TopKBuf(vs, ks)
  }

  override def finish(b: TopKBuf): TopKBuf = b
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
