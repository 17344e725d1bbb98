package graft

import graft.operators.EventOps
import org.apache.spark.sql.functions._

/** Ground-truth gates for the event operators whose registered form
  * the SQL oracle cannot fully check: the bucketed interval join must
  * equal the naive inequality join it replaces, and the two sketch
  * estimates must sit within their error bounds of the exact distinct
  * count. */
class EventOpsSpec extends SparkSpec {

  test("ev_attribution equals a sequential per-user replay of the 40/40/20 rule") {
    val ev = Tables.events(spark, sf0001)
      .selectExpr("user_id", "ts", "event_id", "event_type", "value",
        "cast(get_json_object(props, '$.k') as long) as page")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3), r.getDouble(4), r.getLong(5)))
    case class Touch(user: Long, grp: Long, ts: Long, id: Long,
                     tpe: String, page: Long, cv: Long)
    // walk each user's stream backwards carrying the next purchase
    val touches = ev.groupBy(_._1).values.flatMap { rows =>
      val asc = rows.sortBy(r => (r._2, r._3))
      var grp = 0L; var convTs = 0L; var cv = 0L
      asc.reverseIterator.flatMap { case (user, ts, id, tpe, value, page) =>
        if (tpe == "purchase") {
          grp += 1; convTs = ts; cv = math.round(value * 100); None
        } else if ((tpe == "click" || tpe == "view") && grp > 0 &&
          ts >= convTs - 7L * 86400000L)
          Some(Touch(user, grp, ts, id, tpe, page, cv))
        else None
      }.toList
    }.toSeq
    // weight within each conversion (ALL its touches, any channel),
    // then roll up by channel — the operator's grouping order
    val weighted = touches.groupBy(t => (t.user, t.grp)).values.flatMap { conv =>
      val ordered = conv.toSeq.sortBy(t => (t.ts, t.id))
      val n = ordered.size
      ordered.zipWithIndex.map { case (t, i) =>
        val w =
          if (n == 1) 1000000L
          else if (n == 2) 500000L
          else if (i == 0 || i == n - 1) 400000L
          else 200000L / (n - 2)
        (t.tpe, t.page) -> (t.cv * w / 1000000L)
      }
    }.toSeq
    val expected = weighted.groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toMap
    val got = EventOps.ev_attribution(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expected, "attribution diverged from the sequential replay")
    // the corpus must exercise all three weight branches
    val ns = touches.groupBy(t => (t.user, t.grp)).values.map(_.size).toSet
    assert(ns.contains(1) && ns.contains(2) && ns.exists(_ >= 3),
      s"test premise: conversions with 1, 2 and 3+ touches (got $ns)")
  }

  test("ev_burn_rate: window sums and burn multiples match a naive recomputation") {
    import spark.implicits._
    val got = EventOps.ev_burn_rate(spark, sf0001).collect()
      .map(r => r.getTimestamp(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    val hourly = got.map { case (h, (n, e, _, _, _)) => h.getTime -> (n, e) }.toMap
    got.foreach { case (h, (n, e, fast, slow, alert)) =>
      assert(fast == (e * 1000000L / n) * 1000000L / 250000L)
      val (sn, se) = (0 to 5).map(k => hourly.getOrElse(h.getTime - k * 3600000L, (0L, 0L)))
        .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
      assert(slow == (se * 1000000L / sn) * 1000000L / 250000L,
        s"$h slow window")
      assert(alert == (fast >= 1000000L && slow >= 1000000L))
    }
    // the 25% budget must split this corpus into both alert branches
    assert(got.exists(_._2._5) && got.exists(!_._2._5))
  }

  test("ev_time_to_convert partitions every signup user and keeps the unconverted") {
    import spark.implicits._
    val got = EventOps.ev_time_to_convert(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sf0001)
      .select($"user_id", $"ts", $"event_type")
      .as[(Long, java.sql.Timestamp, String)].collect()
    val signup = ev.filter(_._3 == "signup").groupBy(_._1)
      .view.mapValues(_.map(_._2.getTime).min).toMap
    val expected = signup.toSeq.map { case (u, st) =>
      val conv = ev.filter(e => e._1 == u && e._3 == "purchase" && e._2.getTime >= st)
        .map(_._2.getTime).sorted.headOption
      conv match {
        case None => -1L
        case Some(ct) =>
          val d = java.time.Instant.ofEpochMilli(ct).atZone(java.time.ZoneOffset.UTC).toLocalDate
          val s = java.time.Instant.ofEpochMilli(st).atZone(java.time.ZoneOffset.UTC).toLocalDate
          d.toEpochDay - s.toEpochDay
      }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expected)
    // the histogram partitions the signup population exactly
    assert(got.values.sum == signup.size.toLong)
  }

  test("ev_cohort_matrix: week-0 is full retention and cells match a naive recount") {
    import spark.implicits._
    // sf0.01: sf0.001's 15 users are active every week of the span, so
    // the decay branch under test never fires there
    val got = EventOps.ev_cohort_matrix(spark, sf001).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // naive driver recount
    val ev = Tables.events(spark, sf001)
      .select($"user_id", to_date($"ts").as("day"), $"event_type")
      .as[(Long, java.sql.Date, String)].collect()
      .map { case (u, d, t) => (u, d.toLocalDate, t) }
    val cohort = ev.filter(_._3 == "signup").groupBy(_._1)
      .view.mapValues(_.map(_._2).min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))).toMap
    val cells = ev.filter(e => cohort.contains(e._1))
      .map(e => (e._1, cohort(e._1), e._2))
      .filter { case (_, c, d) => !d.isBefore(c) }
      .map { case (u, c, d) =>
        (u, c, (d.toEpochDay - c.toEpochDay) / 7) }.distinct
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = cells.groupBy(x => (x._2, x._3)).map { case ((c, w), xs) =>
      (c, w) -> (xs.size.toLong, sizes(c), xs.size.toLong * 1000000L / sizes(c))
    }
    assert(got == expected)
    // every user is active on their signup day, so week 0 is 100%
    got.filter(_._1._2 == 0L).values.foreach { case (n, sz, ppm) =>
      assert(n == sz && ppm == 1000000L)
    }
    // retention decays somewhere (otherwise the matrix is vacuous)
    assert(got.exists { case ((_, w), (_, _, ppm)) => w > 0 && ppm < 1000000L })
  }

  test("ev_dau_wau equals a naive per-day rolling distinct") {
    import spark.implicits._
    val ud = Tables.events(spark, sf0001)
      .select($"user_id", to_date($"ts").as("day"))
      .as[(Long, java.sql.Date)].collect()
      .map { case (u, d) => (u, d.toLocalDate) }.distinct
    val days = ud.map(_._2).distinct
    val expected = days.map { day =>
      val dau = ud.count(_._2 == day)
      val wau = ud.filter { case (_, d) =>
        !d.isAfter(day) && !d.isBefore(day.minusDays(6))
      }.map(_._1).distinct.length
      day -> (dau.toLong, wau.toLong, dau.toLong * 1000000L / wau)
    }.toMap
    val got = EventOps.ev_dau_wau(spark, sf0001)
      .as[(java.sql.Date, Long, Long, Long)].collect()
      .map(r => r._1.toLocalDate -> (r._2, r._3, r._4)).toMap
    assert(got == expected)
    // a rolling window is wider than its last day
    assert(got.values.forall { case (dau, wau, _) => dau <= wau })
  }

  test("ev_markov: conditionals normalize per row and pairs equal a naive recount") {
    import spark.implicits._
    val got = EventOps.ev_markov(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // naive driver-side recount of consecutive pairs per user stream
    val streams = Tables.events(spark, sf0001)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
      .groupBy(_._1)
    val naive = collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    streams.values.foreach { evs =>
      evs.sortBy(e => (e._2.getTime, e._3)).map(_._4)
        .sliding(2).filter(_.length == 2)
        .foreach { p => naive((p(0), p(1))) = naive((p(0), p(1))) + 1 }
    }
    assert(got.view.mapValues(_._1).toMap == naive.toMap)
    // per-from normalization: sum of p_ppm within a row of the matrix
    // is 1e6 up to the truncation deficit (< |types| ppm)
    got.groupBy(_._1._1).foreach { case (from, cells) =>
      val s = cells.values.map(_._3).sum
      assert(s <= 1000000L && s > 1000000L - cells.size,
        s"$from row sums to $s")
      val tot = cells.values.map(_._1).sum
      assert(cells.values.forall(_._2 == tot))
    }
  }

  test("ev_gap_fill densifies to the exact grid and preserves the sparse series") {
    import spark.implicits._
    val dense = EventOps.ev_gap_fill(spark, sf0001).collect()
    val hours = dense.map(_.getTimestamp(0)).distinct.sorted(
      Ordering.by((t: java.sql.Timestamp) => t.getTime))
    // complete grid: every hour between bounds × the 5 declared types,
    // hour spine contiguous at exactly 1h steps
    assert(dense.length == hours.length * 5)
    hours.sliding(2).foreach { case Array(a, b) =>
      assert(b.getTime - a.getTime == 3600000L, s"hour gap $a -> $b")
    }
    // synthesized cells are zero and flagged; real cells reproduce
    // ev_window_agg exactly
    val sparse = EventOps.ev_window_agg(spark, sf0001).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    dense.foreach { r =>
      val key = (r.getTimestamp(0), r.getString(1))
      if (r.getBoolean(4)) {
        assert(!sparse.contains(key) && r.getLong(2) == 0L && r.getDouble(3) == 0.0)
      } else {
        assert(sparse(key) == ((r.getLong(2), r.getDouble(3))))
      }
    }
    assert(dense.exists(_.getBoolean(4)), "no gap was actually filled")
  }

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

  test("ev_heavy_hitters is exact when distinct keys fit the capacity") {
    // sf0.001 has far fewer distinct users than the query's capacity
    // (4096): no eviction ever fires, so the sketch must equal the
    // exact top-10 with zero overcount.
    val got = EventOps.ev_heavy_hitters(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exact = Tables.events(spark, sf0001)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id"))
      .limit(10).collect()
      .map(r => (r.getLong(0), r.getLong(1), 0L))
    assert(got.toSeq == exact.toSeq,
      s"sketch ${got.toSeq} != exact ${exact.toSeq}")
  }

  test("ev_heavy_hitters capacity assumption holds at every oracle scale") {
    // The DuckDB oracle hash-verifies the sketch only because every
    // test SF sits in the EXACT regime (distinct users <= capacity, so
    // no eviction, merge-order-independent output). If the driver's
    // testdata ever grows past the capacity, that precondition breaks
    // SILENTLY — estimates become merge-order-dependent and the hash
    // gate fails with no hint why. Assert the precondition by name at
    // both SFs the gates run on, so a regime shift fails loudly here.
    val cap = 4096
    for (d <- Seq(sf0001, sf001)) {
      val distinct = Tables.events(spark, d)
        .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
      assert(distinct <= cap,
        s"$d has $distinct distinct users > capacity $cap: " +
          "ev_heavy_hitters leaves the exact regime and its hash oracle " +
          "is no longer merge-order-safe — raise the capacity or drop " +
          "the oracle to rows-only")
    }
  }

  test("SpaceSaving keeps every item above N/capacity under heavy eviction") {
    import spark.implicits._
    // 60 distinct keys through a capacity-8 summary, skewed: keys 0-3
    // carry ~70% of N and MUST survive (freq > N/8); the long tail
    // forces constant eviction. Bounds: true <= est <= true + err.
    val rnd = new scala.util.Random(7)
    val items: Seq[Long] =
      (0 until 4).flatMap(k => Seq.fill(700)(k.toLong)) ++
        Seq.fill(1200)(4L + rnd.nextInt(56).toLong)
    val n = items.size.toLong
    val trueCounts = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val agg = new graft.functions.SpaceSavingAggregator(8).toColumn
    val buf = spark.createDataset(rnd.shuffle(items)).repartition(8)
      .select(agg).head()
    val entries = (0 until buf.n)
      .map(i => (buf.items(i), buf.counts(i), buf.errs(i)))
    val present = entries.map(_._1).toSet
    (0L until 4L).foreach { k =>
      assert(present.contains(k), s"guaranteed heavy hitter $k evicted")
    }
    entries.foreach { case (item, est, err) =>
      val t = trueCounts(item)
      assert(est >= t, s"item $item est $est < true $t")
      assert(est - err <= t, s"item $item lower bound ${est - err} > true $t")
    }
  }

  test("ev_quantile_sketch estimates sit within one bucket width above the exact order statistic") {
    import spark.implicits._
    val exact = Tables.events(spark, sf001)
      .select($"event_type", round($"value" * 100).cast("long").as("cv"))
      .as[(String, Long)].collect()
      .groupBy(_._1).map { case (t, rows) => t -> rows.map(_._2).sorted }
    val got = EventOps.ev_quantile_sketch(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet.map(_._1) == exact.keySet)
    got.foreach { case ((t, p), (n, est)) =>
      val vals = exact(t)
      assert(n == vals.length, s"$t n_events")
      // the sketch's contract: est = upper edge of the bucket holding
      // the ceil(p·n/100)-th order statistic, so exact < est ≤ exact+64
      val rank = ((vals.length * p + 99) / 100).toInt
      val os = vals(rank - 1)
      assert(est > os && est <= os + 64,
        s"$t p$p: est_centi=$est vs exact order stat $os")
    }
  }

  test("ev_anomaly's integer moments stay far inside the i64 sum-of-squares bound") {
    import spark.implicits._
    // The windowed sum(n²) fits i64 only while hourly per-type counts
    // stay under ~6.2e8 (24·n² ≤ 2⁶³). Turn the scaladoc bound into a
    // contract: the corpus must sit ≥4 orders of magnitude inside it,
    // so growth toward the design point is visible long before wrap.
    val maxHourly = Tables.events(spark, sf001)
      .groupBy(date_trunc("hour", $"ts"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .agg(max($"n")).as[Long].head()
    assert(maxHourly < 62000L,
      s"max hourly count $maxHourly is within 10^4 of the i64 z-score bound " +
        "(~6.2e8/hour/type) — bucket finer or widen ev_anomaly to decimal")
  }

  test("ev_stragglers matches a naive driver-side recomputation of the 1.5x-mean rule") {
    import spark.implicits._
    // Independent reference: collect the raw trace, recompute every
    // group's flags with plain Scala arithmetic on the same
    // centisecond basis.
    val raw = Tables.events(spark, sf0001)
      .select($"user_id", $"event_type", round($"value" * 100).cast("long"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
    val byGroup = raw.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = byGroup.collect {
      case ((job, phase), cs) if cs.length >= 5 =>
        val n = cs.length.toLong; val tot = cs.sum
        val strag = cs.filter(c => 2 * c * n > 3 * tot)
        (job, phase) -> (n, tot, cs.max, strag.length.toLong, strag.sum)
    }
    val got = EventOps.ev_stragglers(spark, sf0001).collect().map { r =>
      (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    }.toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(got(k) == v, s"group $k: ${got(k)} vs $v") }
    assert(expected.exists(_._2._4 > 0), "test premise: some group has a straggler")
    assert(expected.exists(_._2._4 == 0) ||
      expected.values.map(_._4).sum < raw.length / 3,
      "test premise: stragglers are a minority, not the whole trace")
  }

  test("ev_resource_skyline is the per-hour-of-day max across each job's daily runs") {
    import spark.implicits._
    val raw = Tables.events(spark, sf0001)
      .select($"user_id", to_date($"ts").cast("string"), hour($"ts").cast("long"),
        round($"value" * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val sky = raw.groupBy(t => (t._1, t._2, t._3)).view.mapValues(_.map(_._4).sum)
      .toSeq.groupBy { case ((job, _, hod), _) => (job, hod) }
      .view.mapValues(_.map(_._2).max).toMap
    val expected = sky.groupBy(_._1._1).map { case (job, hods) =>
      val peak = hods.values.max
      job -> (hods.size.toLong, hods.values.sum, peak,
        hods.collect { case ((_, hod), cs) if cs == peak => hod }.min)
    }
    val got = EventOps.ev_resource_skyline(spark, sf0001).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    }.toMap
    assert(got == expected)
    // premise: at least one job was observed on several distinct days,
    // so the max-across-runs actually maxes over something
    val multiRun = raw.groupBy(_._1).values.exists(_.map(_._2).distinct.length >= 2)
    assert(multiRun, "test premise: a job recurs across days")
  }

  test("ev_ivm_delta: merged view equals full recompute; base view is persisted group-key-sized") {
    import spark.implicits._
    val merged = EventOps.ev_ivm_delta(spark, sf0001)
    val recompute = Tables.events(spark, sf0001)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as bigint)")).as("sum_centi"),
        max(expr("cast(round(value * 100) as bigint)")).as("max_centi"))
      .orderBy($"event_type", $"day")
    assert(merged.collect().toSeq == recompute.collect().toSeq)
    // the base view must exist on disk and hold fewer rows than events
    // (group-key-sized, not event-sized — the whole point of IVM)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val name = sf0001.replaceAll("[^A-Za-z0-9._-]", "_")
    val view = spark.read.parquet(s"$wh/graft_ivm/$name")
    val nEvents = Tables.events(spark, sf0001).count()
    // group-key-sized means O(types × days): far below events at real
    // SF; at sf0.001 (1k events over a month) still well under a
    // quarter of the stream
    assert(view.count() < nEvents / 4, "view must be group-sized")
    // premise: the delta actually creates or touches groups
    val deltaGroups = Tables.events(spark, sf0001)
      .filter($"event_id" % 10 >= 8)
      .select($"event_type", to_date($"ts")).distinct().count()
    assert(deltaGroups > 0, "test premise: non-empty delta")
  }

  test("ev_funnel_paths equals a sequential per-user path replay") {
    val ev = Tables.events(spark, sf0001)
      .selectExpr("user_id", "cast(ts as string)", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val paths = ev.groupBy(_._1).values.flatMap { rows =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      val cut = ordered.indexWhere(_._4 == "purchase")
      if (cut < 0) None
      else Some(ordered.take(cut + 1).map(_._4).mkString("->"))
    }.toSeq
    val expected = paths.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(10).zipWithIndex
      .map { case ((p, n), i) => (i + 1L, p, n) }
    val got = EventOps.ev_funnel_paths(spark, sf0001).collect()
      .map(r => (r.getInt(0).toLong, r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
    // premise: multi-step paths exist (the sort inside the aggregate
    // is actually ordering something)
    assert(expected.exists(_._2.contains("->")), "premise: a multi-event path")
  }

  test("ev_ab_stats: arms partition the stream exactly and srm reflects the user split") {
    import spark.implicits._
    val got = EventOps.ev_ab_stats(spark, sf0001).collect()
    val perType = Tables.events(spark, sf0001)
      .groupBy($"event_type").agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100) as bigint)")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, sC) = perType(r.getString(0))
      assert(r.getLong(1) + r.getLong(2) == n, "arms must partition counts")
      assert(r.getLong(3) + r.getLong(4) == sC, "arms must partition sums")
      val srm = r.getLong(8)
      assert(srm == r.getLong(1) * 1000000L / (r.getLong(1) + r.getLong(2)))
    }
  }

  test("ev_late_audit: decomposed watermark equals the sequential merged-arrival replay") {
    import spark.implicits._
    val ev = Tables.events(spark, sf0001)
      .selectExpr("user_id", "event_id", "event_type",
        "bigint(unix_timestamp(ts)) as ets").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    def bucket(l: Long): String =
      if (l == 0L) "00_on_time" else if (l <= 60L) "01_le_60s"
      else if (l <= 300L) "02_le_300s" else if (l <= 3600L) "03_le_3600s"
      else "04_gt_3600s"
    // the naive form the distributed two-level decomposition must
    // equal: ONE running max over the merged (batch, shard, event_id)
    // arrival order
    val inArrival = ev.sortBy { case (uid, eid, _, _) => (eid / 100, uid % 4, eid) }
    var wm = Long.MinValue
    val lates = inArrival.map { case (_, _, typ, ets) =>
      val late = if (wm == Long.MinValue) 0L else math.max(0L, wm - ets)
      wm = math.max(wm, ets)
      (typ, late)
    }.toSeq
    val expected = lates.groupBy(l => (l._1, bucket(l._2)))
      .map { case ((typ, b), ls) =>
        (typ, b, ls.size.toLong, ls.map(_._2).sum) }.toSet
    val got = EventOps.ev_late_audit(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, "lateness histogram diverged from sequential replay")
    // premise: the shard-merge arrival model creates real disorder
    assert(expected.exists(e => e._2 != "00_on_time"),
      "premise: no late events at sf0.001")
  }

  test("ev_cms: estimates equal a sequential sketch replay, never undercount, and meet the ε bound") {
    import spark.implicits._
    // sf0.01, not sf0.001: the tiny corpus has only 15 users over 64
    // cells — zero collisions, so the lossy path would go untested
    val keys = Tables.events(spark, sf001)
      .select($"user_id").collect().map(_.getLong(0))
    val p = 2147483647L
    val as = Seq(92821L, 48271L, 16807L); val bs = Seq(30269L, 49297L, 69621L)
    def h(j: Int, k: Long): Long = ((as(j) * (k % p) + bs(j)) % p) % 64
    val sketch = Array.fill(3, 64)(0L)
    keys.foreach(k => (0 until 3).foreach(j => sketch(j)(h(j, k).toInt) += 1))
    val truth = keys.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = truth.map { case (k, t) =>
      (k, t, (0 until 3).map(j => sketch(j)(h(j, k).toInt)).min) }
      .map { case (k, t, e) => (k, t, e, e - t) }.toSet
    val got = EventOps.ev_cms(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, "CMS estimates diverged from the sequential sketch replay")
    // CMS is one-sided: estimate >= truth always
    assert(got.forall(_._4 >= 0L), "CMS undercounted a key")
    // expected-error sanity: mean overestimate <= 2 * N/w (the e/w
    // Markov bound with slack for the tiny width)
    val n = keys.length.toLong
    val meanOver = got.toSeq.map(_._4).sum.toDouble / got.size
    assert(meanOver <= 2.0 * n / 64,
      s"mean overestimate $meanOver exceeds twice the N/w bound ${2.0 * n / 64}")
    // premise: collisions actually happened (the sketch is lossy here)
    assert(got.exists(_._4 > 0L), "premise: no collisions — width too wide to test anything")
  }

  test("ev_kmv_uniques: sketch equals the sequential bottom-k replay and estimates within 2.7 sigma") {
    import spark.implicits._
    val rows = Tables.events(spark, sf001)
      .select($"event_type", $"user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val p = 2147483647L
    def h(k: Long): Long =
      (1103515245L * ((k % p) * (k % p) % p) + 1013904223L * (k % p) + 12345L) % p + 1L
    val expected = rows.groupBy(_._1).map { case (t, rs) =>
      val hs = rs.map(r => h(r._2)).distinct.sorted
      val exact = rs.map(_._2).distinct.length.toLong
      val kUsed = math.min(64, hs.length).toLong
      val est = if (kUsed < 64) kUsed else 63L * p / hs(63)
      (t, exact, kUsed, est)
    }.toSet
    val got = EventOps.ev_kmv_uniques(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, "KMV sketch diverged from the sequential bottom-k replay")
    // accuracy: KMV relative std is ~1/sqrt(k-2) ≈ 12.7%; gate at 2.7σ
    got.filter(_._3 == 64L).foreach { case (t, exact, _, est) =>
      val rel = math.abs(est - exact).toDouble / exact
      assert(rel <= 0.35, s"$t: KMV estimate $est vs exact $exact (rel $rel)")
    }
    // premise: the estimator path (not the small-set exact path) ran
    assert(got.exists(_._3 == 64L), "premise: no group reached k=64 distinct hashes")
  }

  test("ev_skew_join equals the unsalted join's aggregate") {
    import spark.implicits._
    val ev = Tables.events(spark, sf0001)
      .select($"event_id", $"event_type", $"value")
    val dim = ev.select($"event_type").distinct()
      .select($"event_type", substring($"event_type", 1, 1).as("tier"),
        length($"event_type").cast("long").as("weight"))
    val plain = ev.join(dim, "event_type")
      .groupBy($"tier")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as bigint) * weight"))
          .as("weighted_centi"))
      .orderBy($"tier")
    assert(EventOps.ev_skew_join(spark, sf0001).collect().toSeq ==
      plain.collect().toSeq)
  }
}
