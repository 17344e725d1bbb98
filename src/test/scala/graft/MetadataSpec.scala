package graft

import graft.operators.MetadataOps
import org.apache.spark.sql.functions._

/** Metadata-analytics guarantees beyond the SQL oracle: the
  * approx-percentile sketch (the unbounded-group scale path that
  * fs_size_percentiles' scaladoc promises) must land on the true
  * order statistic. */
class MetadataSpec extends SparkSpec {

  test("percentile_approx lands within one order-stat position of the true quantile") {
    import spark.implicits._
    // percentile_approx returns an actual data value, so the honest
    // gate is RANK-based (within one position of the true order
    // statistic), not distance to the interpolated exact percentile —
    // on small groups adjacent order stats can differ by >5% and the
    // interpolated value falls between them.
    val sorted = Tables.documents(spark, sf001)
      .select($"source", $"n_chars").as[(String, Long)].collect()
      .groupBy(_._1).map { case (s, rows) => s -> rows.map(_._2).sorted }
    val approx = Tables.documents(spark, sf001)
      .groupBy($"source")
      .agg(percentile_approx($"n_chars", lit(0.5), lit(10000)).as("p50"),
        percentile_approx($"n_chars", lit(0.9), lit(10000)).as("p90"),
        percentile_approx($"n_chars", lit(0.99), lit(10000)).as("p99"))
      .collect().map(r => r.getString(0) ->
        Seq(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(approx.keySet == sorted.keySet)
    approx.foreach { case (src, got) =>
      val vals = sorted(src)
      got.zip(Seq(0.5, 0.9, 0.99)).foreach { case (a, q) =>
        val idx = math.ceil(q * vals.length).toInt - 1
        val allowed = (math.max(0, idx - 1) to math.min(vals.length - 1, idx + 1))
          .map(vals).toSet
        assert(allowed.contains(a),
          s"$src q=$q: sketch returned $a, true order stats around rank $idx: $allowed")
      }
    }
  }
}
