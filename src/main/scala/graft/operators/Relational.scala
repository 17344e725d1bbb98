package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.1 Relational core — the query surface a Hive/Spark-on-Hops user
  * runs (reference: hops README.md:7, "Spark runs on it just like
  * standard Hadoop"). Declarative DataFrame plans only: Catalyst gets
  * predicate pushdown, column pruning and join planning; dims are
  * broadcast; top-k compiles to TakeOrderedAndProject (no full sort).
  *
  * Every query is deterministic (explicit orderBy incl. tiebreaks) and
  * rounds floating aggregates so the DuckDB oracle hash-matches.
  */
object Relational {

  private def dt(s: String) = lit(s).cast("timestamp")

  def q1_agg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" <= dt("2000-09-02"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax")), 2).as("sum_charge"),
        round(avg($"l_quantity"), 2).as("avg_qty"),
        round(avg($"l_extendedprice"), 2).as("avg_price"),
        round(avg($"l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  def q2_filter_project(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d)
      .filter($"p_size".between(10, 20) && $"p_type" === "STANDARD")
      .select($"p_partkey", $"p_name", $"p_brand", $"p_size",
        round($"p_retailprice", 2).as("p_retailprice"))
      .orderBy($"p_partkey")
  }

  def q3_join_agg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
    val o = Tables.orders(s, d).filter($"o_orderdate" < dt("1998-03-15"))
    val l = Tables.lineitem(s, d).filter($"l_shipdate" > dt("1998-03-15"))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  def q4_semijoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d).filter($"l_quantity" >= 48)
    o.join(l, $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  def q5_multijoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val r = Tables.region(s, d).filter($"r_name" === "ASIA")
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter($"o_orderdate" >= dt("1996-01-01") && $"o_orderdate" < dt("1997-01-01"))
    val l = Tables.lineitem(s, d)
    val su = Tables.supplier(s, d)
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(su, $"l_suppkey" === $"s_suppkey")
      .join(c, $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  def q6_scan_agg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= dt("1996-01-01") && $"l_shipdate" < dt("1997-01-01") &&
        $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
      .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  def q7_antijoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("no_order_customers"))
      .orderBy($"c_nationkey")
  }

  def q8_distinct(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n_lines"))
      .orderBy($"l_returnflag")
  }

  def q9_topk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .select($"o_orderkey", $"o_custkey", round($"o_totalprice", 2).as("o_totalprice"),
        $"o_orderdate")
      .limit(25)
  }

  def q10_window(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
    Tables.lineitem(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("running_qty",
        sum($"l_quantity").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter($"rn" <= 3)
      .select($"l_suppkey", $"rn", $"l_orderkey", $"l_linenumber",
        round($"l_extendedprice", 2).as("l_extendedprice"),
        round($"running_qty", 2).as("running_qty"))
      .orderBy($"l_suppkey", $"rn")
  }

  def q11_rollup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("total_price"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n_orders", $"total_price")
      .orderBy($"status", $"priority")
  }

  def q12_union(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val a = Tables.orders(s, d).filter($"o_orderstatus" === "F")
      .select($"o_custkey".as("custkey"))
    val b = Tables.customer(s, d).filter($"c_acctbal" < 0)
      .select($"c_custkey".as("custkey"))
    a.union(b).distinct().orderBy($"custkey")
  }

  def q13_outerjoin_agg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d).filter($"o_orderpriority" =!= "1-URGENT")
    Tables.customer(s, d)
      .join(o, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  def q14_conditional_agg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val l = Tables.lineitem(s, d)
      .filter($"l_shipdate" >= dt("1997-01-01") && $"l_shipdate" < dt("1997-03-01"))
    l.join(broadcast(Tables.part(s, d)), $"l_partkey" === $"p_partkey")
      .agg(round(
        sum(when($"p_type" === "PROMO", $"l_extendedprice" * (lit(1) - $"l_discount"))
          .otherwise(lit(0.0))) * 100.0 /
          sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("promo_revenue"),
        count(lit(1)).as("n_lines"))
  }

  def q15_groupby_topk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rev = Tables.lineitem(s, d)
      .filter($"l_shipdate" >= dt("1996-01-01") && $"l_shipdate" < dt("1996-04-01"))
      .groupBy($"l_suppkey")
      .agg(sum($"l_extendedprice" * (lit(1) - $"l_discount")).as("total_revenue"))
    // scalar max via agg + broadcast cross join — a global (unpartitioned)
    // window here would funnel the whole aggregate through one task.
    val top = rev
      .crossJoin(broadcast(rev.agg(max($"total_revenue").as("mx"))))
      .filter($"total_revenue" === $"mx")
    top.join(Tables.supplier(s, d), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", round($"total_revenue", 2).as("total_revenue"))
      .orderBy($"s_suppkey")
  }

  /** Q16 shape: grouped COUNT(DISTINCT) — supplier variety per part
    * brand/type over the lineitem⋈part join. Catalyst plans the
    * distinct aggregate in two phases (partial distinct on
    * (group, suppkey) map-side, then the count), so the shuffle
    * carries distinct combinations rather than raw lineitems; part is
    * broadcast at dim ratio. */
  def q16_distinct_agg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d).select($"l_partkey", $"l_suppkey")
      .join(broadcast(Tables.part(s, d).select($"p_partkey", $"p_brand", $"p_type")),
        $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type")
      .agg(count_distinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"p_brand", $"p_type")
  }

  def q17_subquery_avg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, d).filter($"p_brand" === "Brand#3" && $"p_type" === "MEDIUM")
    val l = Tables.lineitem(s, d)
    val avgQty = l.groupBy($"l_partkey".as("a_partkey"))
      .agg((avg($"l_quantity") * 0.2).as("qty_threshold"))
    l.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .join(avgQty, $"l_partkey" === $"a_partkey")
      .filter($"l_quantity" < $"qty_threshold")
      .agg(round(sum($"l_extendedprice") / 7.0, 2).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  def q18_having(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val big = Tables.lineitem(s, d)
      .groupBy($"l_orderkey")
      .agg(sum($"l_quantity").as("sum_qty"))
      .filter($"sum_qty" > 180)
    big.join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
        round($"o_totalprice", 2).as("o_totalprice"),
        round($"sum_qty", 2).as("sum_qty"))
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(100)
  }

  def q19_complex_pred(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val l = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    l.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) && $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#23" && $"p_size".between(1, 25) && $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#3" && $"p_size".between(1, 35) && $"l_quantity".between(20, 30)))
      .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  def q20_cube(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .cube($"o_orderstatus", year($"o_orderdate").cast("long").as("o_year"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("total_price"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_year", lit(-1L)).as("o_year"),
        $"n_orders", $"total_price")
      .orderBy($"status", $"o_year")
  }

  def q21_crossjoin_small(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.region(s, d).select($"r_name")
      .crossJoin(Tables.nation(s, d).select($"n_name"))
      .orderBy($"r_name", $"n_name")
  }

  /** Grouped TOP-K via a typed bounded [[graft.functions.TopKAggregator]]
    * instead of a window: the partial-aggregate phase caps every group
    * at k rows PER MAP TASK, so the shuffle carries ≤ k·tasks rows per
    * group no matter the group size — a row_number window must first
    * co-locate every row of the group (see the Aggregator scaladoc;
    * the two-phase plan + window equivalence are asserted in
    * TopKAggSpec). Top-3 orders by price per order priority. */
  def q22_grouptopk(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val topk = udaf(new graft.functions.TopKAggregator(3),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong))
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .agg(topk($"o_totalprice", $"o_orderkey").as("tk"))
      .select($"o_orderpriority",
        posexplode(arrays_zip($"tk.values", $"tk.keys")).as(Seq("pos", "e")))
      .select($"o_orderpriority", ($"pos" + 1).cast("long").as("rank"),
        $"e.keys".as("o_orderkey"), round($"e.values", 2).as("price"))
      .orderBy($"o_orderpriority", $"rank")
  }

  /** RANGE-frame interval window — the windowing mode §2.1's q10
    * (ROWS-frame rank/running-sum) doesn't cover: per customer, each
    * order's trailing-30-day spend (RANGE BETWEEN 29 days PRECEDING
    * AND CURRENT ROW over the order date). ROWS frames count
    * neighbors; RANGE frames bound by VALUE distance, which is what
    * rolling-period business metrics actually mean, and same-date
    * peers all share one frame. Money crosses the engine boundary as
    * exact integer cents (floor(x·100 + 0.5) on the identical IEEE
    * double — the fs_copy_verify rule); the frame rides one
    * customer-keyed exchange, partial-aggregated inside the window. */
  def q23_range_frame(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d).select($"o_orderkey", $"o_custkey",
      to_date($"o_orderdate").as("o_orderdate"),
      expr("bigint(floor(o_totalprice * 100 + 0.5))").as("total_cents"))
    val w = Window.partitionBy($"o_custkey")
      .orderBy(expr("datediff(o_orderdate, date'1970-01-01')"))
      .rangeBetween(-29, 0)
    o.withColumn("trailing30_cents", sum($"total_cents").over(w))
      .select($"o_custkey", $"o_orderdate", $"o_orderkey", $"total_cents",
        $"trailing30_cents")
      .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
  }

  /** SET OPERATIONS — INTERSECT and EXCEPT, the two ANSI set ops the
    * surface lacked (q12 covers UNION): customers holding BOTH
    * finished and open orders, minus overdrawn accounts. Declarative
    * on purpose: Catalyst rewrites INTERSECT to a distinct left-SEMI
    * join and EXCEPT to a distinct left-ANTI join (ReplaceIntersect/
    * ReplaceExcept rules), so the plan is three equi-joins on the
    * customer key — one shuffle family, partial aggregation for the
    * distincts, no comparison-based set machinery to hand-roll. */
  def q24_setops(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, d)
    val finished = o.filter($"o_orderstatus" === "F")
      .select($"o_custkey".as("custkey"))
    val open = o.filter($"o_orderstatus" === "O")
      .select($"o_custkey".as("custkey"))
    val overdrawn = Tables.customer(s, d).filter($"c_acctbal" < 0)
      .select($"c_custkey".as("custkey"))
    finished.intersect(open).except(overdrawn).orderBy($"custkey")
  }

  /** UNPIVOT (wide → long) — the melt every metrics warehouse needs
    * when a wide aggregate row must become (dimension, metric, value)
    * tuples for generic downstream consumers. Declarative via
    * `Dataset.unpivot` (Catalyst's Expand node — each input row fans
    * out to one output row per value column IN THE MAP TASK, no
    * shuffle beyond the aggregate that built the wide form). Measures
    * are exact integer centi/ppm so the long form hash-verifies; the
    * oracle is dialect-neutral UNION ALL, which also serves as the
    * verbatim SQL-text twin (sql_q25_unpivot). */
  def q25_unpivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wide = Tables.lineitem(s, d).groupBy($"l_returnflag")
      .agg(
        expr("sum(bigint(floor(l_quantity * 100 + 0.5)))").as("qty_centi"),
        expr("sum(bigint(floor(l_extendedprice * 100 + 0.5)))").as("price_centi"),
        expr("sum(bigint(floor(l_discount * 1000000 + 0.5)))").as("disc_ppm"))
    wide.unpivot(
        Array($"l_returnflag"),
        Array($"qty_centi", $"price_centi", $"disc_ppm"),
        "metric", "amount")
      .orderBy($"l_returnflag", $"metric")
  }

  /** GROUPING SETS — the general form q11 (ROLLUP) and q20 (CUBE) are
    * sugar for: one pass over orders producing exactly the four
    * requested aggregation granularities ((status, priority),
    * (status), (priority), ()) — the report-matrix shape warehouse
    * reporting layers emit, without the unwanted combinations CUBE
    * would add. Spark expands this to a single Expand + hash
    * aggregate (one scan, one shuffle — not four unioned subqueries);
    * absent grouping columns surface as NULL and coalesce to 'ALL'
    * so the sentinel is engine-independent. */
  def q26_grouping_sets(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupingSets(
        Seq(Seq($"o_orderstatus", $"o_orderpriority"),
          Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq.empty),
        $"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("total_price"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n_orders", $"total_price")
      .orderBy($"status", $"priority")
  }

  /** NTILE — equi-depth bucketing within each group (the quartile
    * assignment BI layers and feature-binning pipelines lean on):
    * lineitem rows split into 4 tiles per returnflag by the TOTAL
    * order (price, orderkey, linenumber — unique, so tile boundaries
    * are deterministic on every engine), then per-tile row counts and
    * exact centi-integer price sums. The window partitions by
    * returnflag — parallel across groups, no global sort — and the
    * downstream aggregate is map-side combined. */
  def q27_ntile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // r20 (guide §2.5 — the named skew case): ntile over 3 returnflag
    // groups serialized the whole table into 3 window tasks. TWO-PHASE
    // equal-depth bucketing instead: (1) bucket rows by a MONOTONE
    // function of the sort key prefix (floor(price/1024) — IEEE double
    // division by a positive constant preserves order, equal prices
    // share a bucket), count per (flag, bucket), and turn the tiny
    // (flags × ~100 buckets) count table into per-flag prefix OFFSETS
    // + group totals n; (2) global rank = offset + row_number within
    // (flag, bucket) — a window over ~300 groups instead of 3 — and
    // the tile comes from rank by exactly ntile's bucket arithmetic
    // (n div k per tile, first n mod k tiles one extra; replay-gated
    // in RelationalSpec, CASE short-circuit guards the div when
    // n < k). Same rows as ntile(4) — the oracle text is untouched.
    val k = 4
    val base = Tables.lineitem(s, d)
      .select($"l_returnflag", $"l_extendedprice", $"l_orderkey",
        $"l_linenumber")
      .withColumn("bkt", floor($"l_extendedprice" / 1024.0).cast("long"))
    val offs = base.groupBy($"l_returnflag", $"bkt")
      .agg(count(lit(1)).as("c"))
      .select($"l_returnflag", $"bkt",
        coalesce(sum($"c").over(Window.partitionBy($"l_returnflag")
            .orderBy($"bkt").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("off"),
        sum($"c").over(Window.partitionBy($"l_returnflag")).as("n"))
    base
      .join(broadcast(offs), Seq("l_returnflag", "bkt"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"l_returnflag", $"bkt")
          .orderBy($"l_extendedprice", $"l_orderkey", $"l_linenumber")))
      .withColumn("rank", $"off" + $"rn")
      .withColumn("tile", expr(
        s"""CASE WHEN rank <= (n % $k) * (n div $k + 1)
           |     THEN (rank - 1) div (n div $k + 1) + 1
           |     ELSE (n % $k) + (rank - (n % $k) * (n div $k + 1) - 1) div (n div $k) + 1
           |END""".stripMargin))
      .groupBy($"l_returnflag", $"tile")
      .agg(count(lit(1)).as("n_rows"),
        expr("sum(bigint(floor(l_extendedprice * 100 + 0.5)))").as("price_centi"))
      .orderBy($"l_returnflag", $"tile")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_ntile" -> q27_ntile _,
    "q26_grouping_sets" -> q26_grouping_sets _,
    "q25_unpivot" -> q25_unpivot _,
    "q24_setops" -> q24_setops _,
    "q23_range_frame" -> q23_range_frame _,
    "q22_grouptopk" -> q22_grouptopk _,
    "q1_agg" -> q1_agg _,
    "q2_filter_project" -> q2_filter_project _,
    "q3_join_agg" -> q3_join_agg _,
    "q4_semijoin" -> q4_semijoin _,
    "q5_multijoin" -> q5_multijoin _,
    "q6_scan_agg" -> q6_scan_agg _,
    "q7_antijoin" -> q7_antijoin _,
    "q8_distinct" -> q8_distinct _,
    "q9_topk" -> q9_topk _,
    "q10_window" -> q10_window _,
    "q11_rollup" -> q11_rollup _,
    "q12_union" -> q12_union _,
    "q13_outerjoin_agg" -> q13_outerjoin_agg _,
    "q14_conditional_agg" -> q14_conditional_agg _,
    "q15_groupby_topk" -> q15_groupby_topk _,
    "q16_distinct_agg" -> q16_distinct_agg _,
    "q17_subquery_avg" -> q17_subquery_avg _,
    "q18_having" -> q18_having _,
    "q19_complex_pred" -> q19_complex_pred _,
    "q20_cube" -> q20_cube _,
    "q21_crossjoin_small" -> q21_crossjoin_small _)

  val oracle: Map[String, String] = Map(
    "q25_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS qty_centi,
        |    sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS price_centi,
        |    sum(CAST(floor(l_discount * 1000000 + 0.5) AS BIGINT)) AS disc_ppm
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, metric, CAST(amount AS BIGINT) AS amount FROM (
        |  SELECT l_returnflag, 'qty_centi' AS metric, qty_centi AS amount FROM wide
        |  UNION ALL
        |  SELECT l_returnflag, 'price_centi', price_centi FROM wide
        |  UNION ALL
        |  SELECT l_returnflag, 'disc_ppm', disc_ppm FROM wide)
        |ORDER BY l_returnflag, metric""".stripMargin,
    "q24_setops" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal < 0
        |ORDER BY custkey""".stripMargin,
    "q23_range_frame" ->
      """SELECT o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderkey,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total_cents,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER (
        |    PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
        |    RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS trailing30_cents
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q22_grouptopk" ->
      """SELECT o_orderpriority, rank, o_orderkey, price FROM (
        | SELECT o_orderpriority,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rank,
        |  o_orderkey, round(o_totalprice, 2) AS price
        | FROM orders)
        |WHERE rank <= 3 ORDER BY o_orderpriority, rank""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),2) AS avg_qty,
        | round(avg(l_extendedprice),2) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q2_filter_project" ->
      """SELECT p_partkey, p_name, p_brand, p_size, round(p_retailprice,2) AS p_retailprice
        |FROM part WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
        |ORDER BY p_partkey""".stripMargin,
    "q3_join_agg" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        | AND l_orderkey = o_orderkey
        | AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        | AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY 1,2,3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_semijoin" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q5_multijoin" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        | AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        | AND r_name = 'ASIA'
        | AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "q6_scan_agg" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue, count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        | AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q7_antijoin" ->
      """SELECT c_nationkey, count(*) AS no_order_customers
        |FROM customer WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q8_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_lines
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice,2) AS o_totalprice, o_orderdate
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q10_window" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber,
        | round(l_extendedprice,2) AS l_extendedprice, round(running_qty,2) AS running_qty
        |FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |   row_number() OVER w AS rn,
        |   sum(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber))
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin,
    "q26_grouping_sets" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS status, coalesce(o_orderpriority,'ALL') AS priority,
        | count(*) AS n_orders, round(sum(o_totalprice),2) AS total_price
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |  (o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,
    "q27_ntile" ->
      """SELECT l_returnflag, tile, count(*) AS n_rows,
        | CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_centi
        |FROM (
        |  SELECT l_returnflag, l_extendedprice,
        |    ntile(4) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS tile
        |  FROM lineitem)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q11_rollup" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS status, coalesce(o_orderpriority,'ALL') AS priority,
        | count(*) AS n_orders, round(sum(o_totalprice),2) AS total_price
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q12_union" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal < 0
        |ORDER BY custkey""".stripMargin,
    "q13_outerjoin_agg" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |   ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14_conditional_agg" ->
      """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
        |   THEN l_extendedprice*(1-l_discount) ELSE 0.0 END) /
        |  sum(l_extendedprice*(1-l_discount)), 2) AS promo_revenue,
        | count(*) AS n_lines
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        | AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        | AND l_shipdate < TIMESTAMP '1997-03-01 00:00:00'""".stripMargin,
    "q15_groupby_topk" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |   sum(l_extendedprice*(1-l_discount)) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |   AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, round(total_revenue,2) AS total_revenue
        |FROM supplier, revenue
        |WHERE s_suppkey = supplier_no
        | AND total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_distinct_agg" ->
      """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q17_subquery_avg" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly, count(*) AS n_lines
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#3' AND p_type = 'MEDIUM'
        | AND l_quantity < (
        |   SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin,
    "q18_having" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        | round(o_totalprice,2) AS o_totalprice, round(sum_qty,2) AS sum_qty
        |FROM (
        |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 180) big, orders, customer
        |WHERE big.l_orderkey = o_orderkey AND o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q19_complex_pred" ->
      """SELECT round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, count(*) AS n_lines
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey AND (
        |  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11) OR
        |  (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20) OR
        |  (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))""".stripMargin,
    "q20_cube" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS status,
        | coalesce(CAST(year(o_orderdate) AS BIGINT), -1) AS o_year,
        | count(*) AS n_orders, round(sum(o_totalprice),2) AS total_price
        |FROM orders GROUP BY CUBE(o_orderstatus, CAST(year(o_orderdate) AS BIGINT))
        |ORDER BY status, o_year""".stripMargin,
    "q21_crossjoin_small" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin)
}
