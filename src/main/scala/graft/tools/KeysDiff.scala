package graft.tools

/** Dev-only: report queries without oracles and orphan oracle keys.
  * The literal-replay oracles (ann_ivf/ann_pq/ann_ivfpq/dedup_semantic)
  * register dynamically after their training stage runs, so they show
  * as no-oracle here but are present in a full Verify dump.
  * Usage: runMain graft.tools.KeysDiff */
object KeysDiff {
  def main(a: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println("queries=" + q.size + " oracles=" + o.size)
    println("no-oracle: " + (q -- o).toSeq.sorted.mkString(", "))
    println("orphan-oracle: " + (o -- q).toSeq.sorted.mkString(", "))
  }
}
