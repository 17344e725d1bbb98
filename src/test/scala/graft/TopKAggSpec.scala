package graft

import graft.functions.{TopKAggregator, TopKBuf}
import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** TopKAggregator guarantees: algebraic correctness of the bounded
  * merge, window-formulation equivalence for the registered query, and
  * the two-phase (partial → final) aggregate plan that makes it the
  * scalable grouped-top-k. */
class TopKAggSpec extends SparkSpec {

  test("reduce/merge keep the bounded (value DESC, key ASC) order") {
    val agg = new TopKAggregator(3)
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(40).toDouble, rnd.nextLong().abs % 1000))
    // fold in two halves merged together, against a reference sort
    val (h1, h2) = rows.splitAt(97)
    val b = agg.merge(h1.foldLeft(agg.zero)(agg.reduce), h2.foldLeft(agg.zero)(agg.reduce))
    val expect = rows.sortBy { case (v, k) => (-v, k) }.distinct.take(3)
    val got = b.values.zip(b.keys).toSeq
    assert(got == rows.sortBy { case (v, k) => (-v, k) }.take(3), s"got $got expect $expect")
  }

  test("q22_grouptopk equals the window formulation") {
    import spark.implicits._
    val viaAgg = Relational.q22_grouptopk(spark, sf001).collect().toSeq
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = Tables.orders(spark, sf001)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"o_orderpriority", $"rank", $"o_orderkey",
        round($"o_totalprice", 2).as("price"))
      .orderBy($"o_orderpriority", $"rank")
      .collect().toSeq
    assert(viaAgg == viaWindow,
      s"diverged: ${viaAgg.diff(viaWindow).take(3)} vs ${viaWindow.diff(viaAgg).take(3)}")
  }

  test("q22_grouptopk plans as a two-phase (partial + final) aggregate") {
    val plan = Relational.q22_grouptopk(spark, sf001)
      .queryExecution.executedPlan.toString
    val aggNodes = "(?i)objecthashaggregate|sortaggregate".r
      .findAllIn(plan).length
    assert(aggNodes >= 2,
      s"expected partial+final aggregate phases, found $aggNodes in:\n${plan.take(2000)}")
    assert("(?i)partial_".r.findFirstIn(plan).isDefined,
      s"no partial aggregation phase in plan:\n${plan.take(2000)}")
  }

  test("KmvAggregator: randomized reduce/merge orders all equal the sorted-distinct bottom-k") {
    val agg = new graft.functions.KmvAggregator(8)
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 50) {
      val xs = Seq.fill(60)(rnd.nextInt(40).toLong) // heavy duplicates
      val expect = xs.distinct.sorted.take(8)
      // sequential reduce in arrival order
      val viaReduce = xs.foldLeft(agg.zero)(agg.reduce).hs.toSeq
      assert(viaReduce == expect, s"trial $trial reduce order")
      // random split points + merge (the sketch-union path)
      val chunks = xs.grouped(1 + rnd.nextInt(9)).toSeq
      val partials = chunks.map(c => c.foldLeft(agg.zero)(agg.reduce))
      val viaMerge = rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge).hs.toSeq
      assert(viaMerge == expect, s"trial $trial merge order")
    }
  }
}
