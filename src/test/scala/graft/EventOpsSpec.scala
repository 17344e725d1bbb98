package graft

import graft.operators.EventOps
import org.apache.spark.sql.functions._

/** Ground-truth gates for the event operators whose registered form
  * the SQL oracle cannot fully check: the bucketed interval join must
  * equal the naive inequality join it replaces, and the two sketch
  * estimates must sit within their error bounds of the exact distinct
  * count. */
class EventOpsSpec extends SparkSpec {

  test("ev_range_join equals the naive inequality join") {
    import spark.implicits._
    val ev = Tables.events(spark, sf0001)
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("purchase_ts"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("click_ts"))
    // the quadratic formulation the bucketed equi-join exists to avoid
    // — fine as a test reference at sf0.001
    val naive = p.join(c,
        $"c_user" === $"user_id" && $"click_ts" <= $"purchase_ts" &&
          $"click_ts" > $"purchase_ts" - expr("INTERVAL 1 HOUR"), "left")
      .groupBy($"user_id", $"purchase_id", $"purchase_ts")
      .agg(count($"c_user").as("n_clicks_1h"))
      .collect()
      .map(r => r.getLong(1) -> (r.getLong(0), r.getTimestamp(2), r.getLong(3)))
      .toMap
    val got = EventOps.ev_range_join(spark, sf0001).collect()
      .map(r => r.getLong(1) -> (r.getLong(0), r.getTimestamp(2), r.getLong(3)))
      .toMap
    assert(got.keySet == naive.keySet,
      s"purchase sets differ: ${(naive.keySet -- got.keySet).take(3)} missing")
    naive.foreach { case (k, v) =>
      assert(got(k) == v, s"purchase $k: ${got(k)} vs naive $v")
    }
    assert(naive.exists(_._2._3 > 0), "test premise: some purchase has clicks")
    assert(naive.exists(_._2._3 == 0) || naive.nonEmpty)
  }

  test("ev_approx_uniques estimates sit within 5% of the exact counts") {
    import spark.implicits._
    val exact = Tables.events(spark, sf001)
      .groupBy($"event_type")
      .agg(count_distinct($"user_id").as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = EventOps.ev_approx_uniques(spark, sf001).collect()
    assert(got.map(_.getString(0)).toSet == exact.keySet)
    got.foreach { r =>
      val (et, approx, merged) = (r.getString(0), r.getLong(1), r.getLong(2))
      val e = exact(et).toDouble
      assert(math.abs(approx - e) / e <= 0.05,
        s"$et: approx_count_distinct $approx vs exact $e")
      assert(math.abs(merged - e) / e <= 0.05,
        s"$et: merged daily sketches $merged vs exact $e")
    }
  }

  test("ev_approx_uniques is deterministic across runs") {
    val a = EventOps.ev_approx_uniques(spark, sf0001).collect().toSeq
    val b = EventOps.ev_approx_uniques(spark, sf0001).collect().toSeq
    assert(a == b, "sketch estimates must not depend on execution order")
  }
}
