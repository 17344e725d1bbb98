package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Ground-truth gates for relational operators whose semantics go
  * beyond what the row-hash oracle demonstrates structurally — the
  * RANGE frame's value-distance (not neighbor-count) windowing. */
class RelationalSpec extends SparkSpec {

  test("q23_range_frame equals a naive per-customer trailing-30-day scan") {
    import spark.implicits._
    val got = Relational.q23_range_frame(spark, sf0001).collect()
      .map(r => r.getLong(2) -> (r.getLong(0), r.getDate(1).toLocalDate,
        r.getLong(3), r.getLong(4))).toMap
    val orders = Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_custkey", to_date($"o_orderdate").as("od"),
        expr("bigint(floor(o_totalprice * 100 + 0.5))").as("cents"))
      .as[(Long, Long, java.sql.Date, Long)].collect()
      .map { case (ok, ck, od, c) => (ok, ck, od.toLocalDate, c) }
    val byCust = orders.groupBy(_._2)
    val expected = orders.map { case (ok, ck, od, c) =>
      val trailing = byCust(ck).filter { case (_, _, d, _) =>
        !d.isAfter(od) && d.toEpochDay > od.toEpochDay - 30
      }.map(_._4).sum
      ok -> (ck, od, c, trailing)
    }.toMap
    assert(got == expected)
    // RANGE (value-distance) semantics, not ROWS: wherever a customer
    // has two same-day orders, each includes the other in its frame
    val sameDay = orders.groupBy(o => (o._2, o._3)).filter(_._2.length >= 2)
    assert(sameDay.nonEmpty, "corpus premise: same-day order pairs exist")
    sameDay.foreach { case (_, os) =>
      val daySum = os.map(_._4).sum
      os.foreach { case (ok, _, _, _) =>
        assert(got(ok)._4 >= daySum,
          s"order $ok excludes a same-day peer from its RANGE frame")
      }
    }
  }

  test("q26_grouping_sets equals the union of its four explicit groupings; one Expand, no union in the plan") {
    import spark.implicits._
    val got = Relational.q26_grouping_sets(spark, sf0001)
    val o = Tables.orders(spark, sf0001)
    def g(cols: Seq[String]) = {
      val grouped = if (cols.isEmpty) o.groupBy() else o.groupBy(cols.map(col): _*)
      grouped.agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice"), 2).as("total_price"))
        .select(
          (if (cols.contains("o_orderstatus")) $"o_orderstatus" else lit("ALL")).as("status"),
          (if (cols.contains("o_orderpriority")) $"o_orderpriority" else lit("ALL")).as("priority"),
          $"n_orders", $"total_price")
    }
    val expected = g(Seq("o_orderstatus", "o_orderpriority"))
      .unionByName(g(Seq("o_orderstatus")))
      .unionByName(g(Seq("o_orderpriority")))
      .unionByName(g(Seq.empty))
    assert(got.collect().toSet == expected.collect().toSet)
    // the whole point vs 4 unioned subqueries: ONE scan + Expand
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), "grouping sets should compile to Expand")
    assert(!plan.contains("Union"), "grouping sets must not plan a Union")
  }

  test("q27_ntile equals a naive equal-depth bucketing replay") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf0001)
      .selectExpr("l_returnflag", "l_extendedprice", "l_orderkey",
        "bigint(l_linenumber) as l_linenumber",
        "bigint(floor(l_extendedprice * 100 + 0.5)) as centi")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val expected = li.groupBy(_._1).flatMap { case (flag, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3, r._4))
      val n = ordered.length; val base = n / 4; val extra = n % 4
      // ANSI ntile: first (n mod k) tiles get one extra row
      val tiles = (1 to 4).flatMap(t =>
        Seq.fill(base + (if (t <= extra) 1 else 0))(t.toLong))
      ordered.zip(tiles).groupBy(_._2).map { case (t, rs) =>
        (flag, t, rs.length.toLong, rs.map(_._1._5).sum) }
    }.toSet
    val got = Relational.q27_ntile(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, "ntile bucketing diverged from the naive replay")
    assert(expected.exists(_._2 == 4L), "premise: 4 tiles materialized")
  }
}
