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
}
