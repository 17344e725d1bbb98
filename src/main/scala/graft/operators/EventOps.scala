package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.4 Event / streaming analytics, batch form. The Structured
  * Streaming forms (watermarked windowed agg, session_window, and
  * flatMapGroupsWithState sessionization) live in
  * [[graft.streaming.StreamingOps]] and are asserted equivalent to
  * these batch plans in StreamingSpec (memory-stream in, memory sink
  * out); these batch plans are what the DuckDB oracle can check.
  * Sessionization = gap-based session_window semantics (30-min gap),
  * expressed with lag + cumulative-sum so batch and oracle agree
  * microsecond-exactly.
  */
object EventOps {

  /** Tumbling 1-hour windowed aggregate per event type. */
  def ev_window_agg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("total_value"))
      .orderBy($"hour", $"event_type")
  }

  /** 30-minute-gap sessionization per user (session_window semantics). */
  def ev_sessionize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapUs = 30L * 60 * 1000000
    Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(byUser))
      .withColumn("new_sess",
        when($"prev_us".isNull || unix_micros($"ts") - $"prev_us" > gapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum($"new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min($"ts").as("session_start"), max($"ts").as("session_end"),
        round(sum($"value"), 2).as("session_value"))
      .orderBy($"user_id", $"session_id")
  }

  /** Ordered conversion funnel: signup → click → purchase per user. */
  def ev_funnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"user_id")
      .agg(
        min(when($"event_type" === "signup", $"ts")).as("t_signup"),
        min(when($"event_type" === "click", $"ts")).as("t_click"),
        min(when($"event_type" === "purchase", $"ts")).as("t_purchase"))
      .filter($"t_signup".isNotNull && $"t_click" > $"t_signup" && $"t_purchase" > $"t_click")
      .orderBy($"user_id")
  }

  /** JSON property extraction + aggregation over the props column. */
  def ev_json_props(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type", get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"), round(avg($"k"), 4).as("avg_k"),
        min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  /** Day-over-day retention: users active on day d who return on d+1.
    * Formulated as a per-user lead window over the distinct
    * (day, user) grid rather than a grid self-join: the join form
    * recomputes the distinct once per join side and pays a shuffle on
    * user PLUS the join, and its countDistinct aggregates expand —
    * here the rows are already distinct, so after the lead the final
    * aggregate is a plain map-side-combined count. One distinct
    * shuffle, one user-partitioned window, one small agg. */
  def ev_retention(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val du = Tables.events(s, d)
      .select(date_trunc("day", $"ts").as("day"), $"user_id").distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day")
    du.withColumn("next_day", lead($"day", 1).over(w))
      .groupBy($"day")
      .agg(count(lit(1)).as("n_active"),
        sum(when($"next_day" === $"day" + expr("INTERVAL 1 DAY"), 1L)
          .otherwise(0L)).as("n_retained"))
      .orderBy($"day")
  }

  /** AS-OF join — attribute each purchase to the user's most recent
    * preceding-or-simultaneous click. Spark has no native as-of join;
    * the scalable formulation is NOT a range join (which explodes into
    * an inequality join) but a single window pass over the two event
    * streams INTERLEAVED: union clicks+purchases, sort within each
    * user by (ts, clicks-first), and carry the last seen click forward
    * with last(..., ignoreNulls). One shuffle on user_id, no join, no
    * per-row range probe — at 100 TB this is exactly one sort-based
    * window over the merged stream. Clicks are pre-deduplicated to one
    * per (user, ts) (max event_id) so attribution at equal timestamps
    * is deterministic in both engines; the DuckDB oracle is its native
    * ASOF JOIN over the same deduplicated click stream. */
  def ev_asof(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("event_id"))
      .withColumn("is_purchase", lit(0))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")
      .withColumn("is_purchase", lit(1))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"is_purchase", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    clicks.unionByName(purchases)
      .withColumn("click_ts",
        last(when($"is_purchase" === 0, $"ts"), ignoreNulls = true).over(w))
      .withColumn("click_id",
        last(when($"is_purchase" === 0, $"event_id"), ignoreNulls = true).over(w))
      .filter($"is_purchase" === 1 && $"click_ts".isNotNull)
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("purchase_ts"),
        $"click_id", $"click_ts")
      .orderBy($"user_id", $"purchase_id")
  }

  /** Bounded-INTERVAL join (range join): for every purchase, the count
    * of the user's clicks in the preceding hour (click_ts ∈
    * (purchase_ts − 1h, purchase_ts]). The naive formulation is an
    * inequality theta join — at corpus scale that is a broadcast
    * nested loop over every (purchase, click) pair of a user. This
    * plan makes it an EQUI-join: time is bucketed at the window width,
    * each click is emitted to its own bucket and the next (a window of
    * exactly one bucket width can only straddle two), purchases join
    * on (user, bucket), and the exact bound is a residual filter.
    * Shuffle volume is 2× clicks + purchases, hash-partitioned —
    * linear, skew-handled by AQE like any equi-join. Purchases with no
    * preceding click are kept with count 0 via the left join back. */
  def ev_range_join(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val winUs = 3600L * 1000000L
    val ev = Tables.events(s, d)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("purchase_ts"),
        unix_micros($"ts").as("pus"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", unix_micros($"ts").as("cus"))
    val cexp = clicks.withColumn("bucket",
      explode(array(expr(s"cus div $winUs"), expr(s"cus div $winUs") + 1)))
    val counted = purchases.withColumn("bucket", expr(s"pus div $winUs"))
      .join(cexp, Seq("user_id", "bucket"))
      .filter($"cus" <= $"pus" && $"cus" > $"pus" - winUs)
      .groupBy($"purchase_id")
      .agg(count(lit(1)).as("n_clicks_1h"))
    purchases.select($"user_id", $"purchase_id", $"purchase_ts")
      .join(counted, Seq("purchase_id"), "left")
      .select($"user_id", $"purchase_id", $"purchase_ts",
        coalesce($"n_clicks_1h", lit(0L)).as("n_clicks_1h"))
      .orderBy($"user_id", $"purchase_id")
  }

  /** Approximate distinct users per event type, two ways that matter
    * at 100 TB: `approx_count_distinct` (HyperLogLog++, one pass, no
    * distinct shuffle) and MERGEABLE DataSketches HLL — per-day
    * sketches aggregated first, then unioned across days. The second
    * shape is the production pattern: a pipeline persists small daily
    * sketch blobs and answers any date-range uniques query by sketch
    * union, never rescanning raw events. Both estimates are
    * deterministic (register maxima are arrival-order independent);
    * EventOpsSpec gates both within 5% of the exact distinct count —
    * the oracle is rows-only because DuckDB's HLL internals differ. */
  def ev_approx_uniques(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val daily = ev
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(hll_sketch_agg($"user_id", lit(14)).as("sk"))
    val merged = daily.groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk", lit(false))).as("merged_users"))
    val direct = ev.groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", 0.02).as("approx_users"))
    direct.join(merged, Seq("event_type"))
      .orderBy($"event_type")
  }

  /** FULL OUTER join shape — the one join type §2.1 didn't cover:
    * per-user click activity against purchase activity, keeping users
    * who only ever did one of the two (both sides' non-matches
    * survive with zero-filled counts). Two map-side-combined
    * aggregates then one shuffled full-outer equi-join on user_id. */
  def ev_fullouter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id".as("c_user")).agg(count(lit(1)).as("n_clicks"))
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id".as("p_user")).agg(count(lit(1)).as("n_purchases"))
    clicks.join(purchases, $"c_user" === $"p_user", "full_outer")
      .select(coalesce($"c_user", $"p_user").as("user_id"),
        coalesce($"n_clicks", lit(0L)).as("n_clicks"),
        coalesce($"n_purchases", lit(0L)).as("n_purchases"))
      .orderBy($"user_id")
  }

  /** PIVOT (crosstab): events per day × event type as columns. The
    * pivot values are DECLARED (not discovered), so the plan is one
    * pass — Spark otherwise runs an extra distinct job to find the
    * columns, and an unbounded value domain at 100 TB would make the
    * row width data-dependent. Compiles to a single conditional
    * aggregate per column, map-side combined. */
  def ev_pivot(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .groupBy(date_trunc("day", $"ts").as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy($"day")
  }

  /** Heavy hitters — most-active users by event volume via a
    * SpaceSaving sketch ([[graft.functions.SpaceSavingAggregator]]),
    * the frequent-items companion to ev_approx_uniques' HLL. Unlike
    * the exact fs_hot_keys groupBy-count (which shuffles the full user
    * cardinality), the typed Aggregator runs as a two-phase
    * ObjectHashAggregate: each map task folds its partition into one
    * fixed-size summary and the shuffle carries capacity·tasks rows
    * total — at a billion distinct keys, kilobytes instead of the key
    * space. Guarantees (spec-gated): every user with > N/capacity
    * events is present; true ≤ est ≤ true + max_overcount; exact when
    * distinct keys ≤ capacity.
    *
    * Capacity 4096 keeps the summary trivially small (3 longs/slot)
    * while putting every test SF (≤1500 distinct users) in the EXACT
    * regime, so the DuckDB `GROUP BY count ORDER BY LIMIT` oracle
    * hash-verifies the sketch end to end — est = true count,
    * max_overcount = 0, independent of merge order (estimates under
    * eviction would be merge-order-dependent, which is why this was
    * rows-only at capacity 64). The eviction regime stays spec-gated
    * in EventOpsSpec with a capacity-8 aggregator under forced
    * eviction, and the exact-regime PRECONDITION itself is asserted by
    * name in EventOpsSpec at both oracle SFs, so testdata growth past
    * the capacity fails loudly instead of as an unexplained hash
    * mismatch. */
  def ev_heavy_hitters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val agg = new graft.functions.SpaceSavingAggregator(4096).toColumn
    Tables.events(s, d)
      .select($"user_id").as[Long]
      .select(agg)
      .flatMap(b => (0 until b.n).map(i => (b.items(i), b.counts(i), b.errs(i))))
      .toDF("user_id", "est_count", "max_overcount")
      .orderBy($"est_count".desc, $"user_id")
      .limit(10)
  }

  /** Time-series anomaly detection: z-score of each hour's event count
    * per type against its TRAILING 24-wall-clock-hour window (never the
    * current row — an anomaly must not dilute its own baseline). The
    * frame is a RANGE over integer epoch-hours, not 24 ROWS: an hour
    * with zero events for a type has no row, and a ROWS frame would
    * silently stretch the baseline over a longer wall-clock span for
    * sparse event types. The windowed
    * moments are exact INTEGER sums (count, sum, sum of squares) and
    * the z-score is derived from them in one closed-form double
    * expression, so both engines compute bit-identical doubles and the
    * output can be floored to basis points — no cross-engine rounding
    * hazard (round(double, k) differs between BigDecimal HALF_UP and
    * float round — the text_token_hist lesson). One shuffle on
    * event_type + an ordered window scan; at 100 TB the grid is
    * hours × types, tiny regardless of event volume. */
  def ev_anomaly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hourly = Tables.events(s, d)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
      // FLOOR division (pmod is non-negative, so subtracting it then
      // dividing is exact floor in pure i64): Spark's `div` truncates
      // toward zero while the DuckDB oracle's `//` floors, and the two
      // disagree on pre-1970 hours — truncated hours land on 3600 s
      // multiples in UTC so the hazard is latent here, but the epoch
      // grid must not depend on that.
      .withColumn("hour_epoch",
        expr("(unix_timestamp(hour) - pmod(unix_timestamp(hour), 3600)) div 3600"))
    val w = Window.partitionBy($"event_type").orderBy($"hour_epoch")
      .rangeBetween(-24, -1)
    // The windowed moments stay INTEGER (order-independent: DuckDB's
    // segment-tree windowed sum and Spark's frame scan would disagree
    // in ULPs on doubles); every double op below is a scalar closed
    // form on those exact integers, identical in both engines. Bound:
    // sum(n²) fits i64 while hourly counts stay under ~6×10⁸ per type
    // — past that, bucket finer or widen to decimal.
    hourly
      .withColumn("cnt", count($"n_events").over(w))
      .withColumn("s", sum($"n_events").over(w))
      .withColumn("sq", sum($"n_events" * $"n_events").over(w))
      .filter($"cnt" >= 12)
      .withColumn("cd", $"cnt".cast("double"))
      .withColumn("sd", $"s".cast("double"))
      .withColumn("variance",
        ($"sq".cast("double") - $"sd" * $"sd" / $"cd") / ($"cd" - 1))
      .select($"hour", $"event_type", $"n_events", $"s".as("trailing_total"),
        when($"variance" > 0,
          floor(($"n_events".cast("double") - $"sd" / $"cd")
            / sqrt($"variance") * 10000).cast("long"))
          .as("z_bp"))
      .orderBy($"hour", $"event_type")
  }

  /** MERGEABLE quantile sketch — fixed-width histogram percentiles
    * (p50/p90/p99 of `value` per event type), the single-pass
    * alternative to [[graft.operators.MetadataOps.fs_size_percentiles]]'s
    * exact per-group buffer. Exact `percentile` holds every group value
    * in memory, which an unbounded 100 TB group overflows; the sketch
    * is a groupBy((type, bucket)) COUNT — map-side combined, trivially
    * mergeable across partitions/days (sum the bucket counts), with
    * state bounded at buckets-per-type regardless of event volume.
    * The estimate for percentile p is the UPPER EDGE of the first
    * bucket whose cumulative count reaches ceil(p·n/100), so the true
    * order statistic is within one bucket width below it — a
    * deterministic ±width guarantee (gated against the exact order
    * statistic in EventOpsSpec), unlike rank-error sketches
    * (GK/KLL/t-digest) whose merge order perturbs estimates.
    *
    * Everything is integer: values become exact centi-units
    * (`round(value*100)` — the ev_stragglers rule), buckets are
    * `cv div 64`, the cumulative is a windowed i64 sum ordered by the
    * unique bucket id, and rank/threshold arithmetic is pure i64 —
    * bit-identical in DuckDB, so the sketch carries a full hash
    * oracle. Plan: one shuffle to (event_type, bucket), then a
    * per-type window over ≤ ~766 bucket rows — grid-sized, not
    * event-sized, at any scale. */
  def ev_quantile_sketch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val width = 64L
    val hist = Tables.events(s, d)
      .select($"event_type",
        (round($"value" * 100).cast("long").as("cv")))
      // cv ≥ 0 on this table, so truncating `div` is exact floor
      .groupBy($"event_type", expr(s"cv div $width").as("bucket"))
      .agg(count(lit(1)).as("n"))
    val wCum = Window.partitionBy($"event_type").orderBy($"bucket")
    val cum = hist
      .withColumn("cum", sum($"n").over(wCum))
      .withColumn("total", sum($"n").over(Window.partitionBy($"event_type")))
    cum.crossJoin(Seq(50L, 90L, 99L).toDF("p"))
      .withColumn("rank", expr("(total * p + 99) div 100"))
      .filter($"cum" >= $"rank")
      .groupBy($"event_type", $"p")
      .agg(first($"total").as("n_events"),
        (min($"bucket") * width + width).as("est_centi"))
      .orderBy($"event_type", $"p")
  }

  /** Straggler detection over a task trace — the question behind the
    * reference's job-history analytics (hadoop-tools/hadoop-rumen/src/
    * main/java/org/apache/hadoop/tools/rumen/JobBuilder.java folds
    * attempt records into per-job task runtimes) and its speculative-
    * execution trigger (hadoop-mapreduce-project/.../speculate/
    * LegacyTaskRuntimeEstimator.java:76 — a task speculates when its
    * runtime is far beyond the mean of its peers). Trace model on this
    * corpus: `user_id` = job, `event_type` = task phase, `value` =
    * task seconds; a task is a STRAGGLER when its duration exceeds
    * 1.5× its (job, phase) mean.
    *
    * Cross-engine exactness: durations become integer centiseconds
    * once (`round(value*100)` — the raw doubles are centi-precision by
    * construction, so both engines land on the same integer; summing
    * the doubles instead would be partition-order-dependent), and the
    * 1.5×-mean test is the pure-i64 cross-multiplication
    * `2·cs·n > 3·Σcs` — no division, no doubles, no rounding hazard.
    *
    * One shuffle: the window partitions by (user_id, event_type) and
    * the aggregate groups by the same keys, so the hash aggregate
    * reuses the window's exchange. At 100 TB: per-group state is five
    * i64s; `2·cs·n` overflows i64 only past ~10¹⁸ centisecond-tasks
    * per group. */
  def ev_stragglers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
    Tables.events(s, d)
      .select($"user_id", $"event_type",
        round($"value" * 100).cast("long").as("cs"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("tot", sum($"cs").over(w))
      .withColumn("straggler", $"cs" * $"n" * 2 > $"tot" * 3)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n_tasks"),
        sum($"cs").as("total_cs"),
        max($"cs").as("max_cs"),
        sum(when($"straggler", 1L).otherwise(0L)).as("n_stragglers"),
        sum(when($"straggler", $"cs").otherwise(0L)).as("straggler_cs"))
      .filter($"n_tasks" >= 5)
      .withColumn("straggler_ppm", expr("straggler_cs * 1000000 div total_cs"))
      .orderBy($"user_id", $"event_type")
  }

  /** Recurring-pipeline resource skyline — the reference's
    * ResourceEstimator service (hadoop-tools/hadoop-resourceestimator/
    * src/main/java/org/apache/hadoop/resourceestimator/solver/impl/
    * LpSolver.java estimates a recurring job's future skyline from its
    * historical runs' per-interval usage). Trace model: each calendar
    * DAY of a `user_id`'s events is one RUN of its recurring pipeline;
    * the run's skyline is its hourly usage (Σ centiseconds per
    * hour-of-day); the conservative prediction for the next run is the
    * per-hour-of-day MAX across observed runs (the reference's
    * upper-bound solver mode). Output per job: active skyline hours,
    * predicted total, peak, and earliest peak hour.
    *
    * Shuffles: (user, day, hod) partial-agg → (user, hod) max →
    * (user) final — each stage shrinks the data (events → runs×24 →
    * 24/job → 1/job), all map-side combined; the peak-hour argmax is a
    * window on the already-tiny per-job skyline partitioned by the
    * same key as the final group. All arithmetic integer (same
    * centisecond basis as [[ev_stragglers]]); `min(hod) when hod_cs =
    * peak` makes the argmax tie-break deterministic on both engines. */
  def ev_resource_skyline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sky = Tables.events(s, d)
      .select($"user_id", to_date($"ts").as("run_day"),
        hour($"ts").cast("long").as("hod"),
        round($"value" * 100).cast("long").as("cs"))
      .groupBy($"user_id", $"run_day", $"hod")
      .agg(sum($"cs").as("run_cs"))
      .groupBy($"user_id", $"hod")
      .agg(max($"run_cs").as("hod_cs"))
    sky
      .withColumn("pk", max($"hod_cs").over(Window.partitionBy($"user_id")))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_active_hours"),
        sum($"hod_cs").as("predicted_total_cs"),
        max($"hod_cs").as("peak_cs"),
        min(when($"hod_cs" === $"pk", $"hod")).as("peak_hour"))
      .orderBy($"user_id")
  }

  /** SLO ERROR-BUDGET BURN RATE — the multi-window burn alert (SRE
    * practice: page when BOTH a fast and a slow window burn above
    * budget, so spikes don't page and slow leaks still do): per hour,
    * error rate vs a 25% error budget as the exact-ppm burn multiple
    * over the hour itself (fast) and the trailing 6 hours (slow,
    * RANGE frame over the hour spine), alert = both ≥ 1×. One
    * map-side-combined hourly rollup; the slow window rides a single
    * unpartitioned-but-hour-keyed RANGE frame over |hours| rows —
    * metadata-scale regardless of corpus size. */
  def ev_burn_rate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hourly = Tables.events(s, d)
      .groupBy(date_trunc("hour", $"ts").as("hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(when($"event_type" === "error", 1L).otherwise(0L)).as("n_errors"))
    val w = Window
      .orderBy(expr("bigint(unix_timestamp(hour)) div 3600"))
      .rangeBetween(-5, 0)
    hourly
      .withColumn("slow_events", sum($"n_events").over(w))
      .withColumn("slow_errors", sum($"n_errors").over(w))
      .select($"hour", $"n_events", $"n_errors",
        expr("(n_errors * 1000000 div n_events) * 1000000 div 250000")
          .as("burn_fast_ppm"),
        expr("(slow_errors * 1000000 div slow_events) * 1000000 div 250000")
          .as("burn_slow_ppm"))
      .withColumn("alert",
        $"burn_fast_ppm" >= 1000000L && $"burn_slow_ppm" >= 1000000L)
      .orderBy($"hour")
  }

  /** TIME-TO-CONVERT distribution — days from a user's first signup
    * to their first subsequent purchase, histogrammed, with the
    * never-converted population as the `-1` bucket (dropping them
    * would silently survivor-bias every downstream conversion stat).
    * Two map-side-combined min-aggregates + one user-keyed equi-join
    * (co-locatable at scale) + a |days|-bucket rollup. */
  def ev_time_to_convert(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val signups = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("signup_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"))
    val firstConv = purchases.join(signups, Seq("user_id"))
      .filter($"p_ts" >= $"signup_ts")
      .groupBy($"user_id").agg(min($"p_ts").as("conv_ts"))
    signups.join(firstConv, Seq("user_id"), "left")
      .select($"user_id", $"signup_ts",
        when($"conv_ts".isNull, lit(-1L))
          .otherwise(datediff(to_date($"conv_ts"), to_date($"signup_ts"))
            .cast("long")).as("days_to_convert"))
      .groupBy($"days_to_convert")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"days_to_convert")
  }

  /** COHORT RETENTION MATRIX — the standard product-analytics
    * triangle (signup cohort × weeks since signup → share still
    * active), generalizing ev_retention's adjacent-day form: users
    * cohort on their FIRST signup day, each later active day lands in
    * week bucket (active − cohort) div 7, retention is exact integer
    * ppm of the cohort size. Three map-side-combined aggregates
    * (first-signup per user, distinct activity days, the matrix
    * rollup) and one user-keyed equi-join — at scale both sides
    * partition on user_id so the join co-locates; the cohort-size
    * join is |cohorts|-row broadcast. */
  def ev_cohort_matrix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val cohorts = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min(to_date($"ts")).as("cohort_day"))
    val activity = ev.select($"user_id", to_date($"ts").as("day")).distinct()
    val sizes = cohorts.groupBy($"cohort_day")
      .agg(count(lit(1)).as("cohort_size"))
    activity.join(cohorts, Seq("user_id"))
      .filter($"day" >= $"cohort_day")
      .select($"user_id", $"cohort_day",
        expr("bigint(datediff(day, cohort_day)) div 7").as("week_offset"))
      .distinct()
      .groupBy($"cohort_day", $"week_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_day"))
      .withColumn("retention_ppm",
        expr("n_active * 1000000 div cohort_size"))
      .orderBy($"cohort_day", $"week_offset")
  }

  /** DAU / WAU rolling-active-users report with the stickiness ratio
    * (DAU/WAU — the engagement metric every product-analytics stack
    * derives from its event log). Exact distinct counts, not sketches:
    * the corpus collapses once to distinct (user, day) pairs
    * (map-side combined), DAU is a count over that, and WAU uses the
    * EXPLODE-TO-WINDOW device — each (user, day) activity contributes
    * itself to the 7 window anchors [day .. day+6], so a 7-day
    * rolling distinct becomes one explode (×7, bounded) + one
    * count(DISTINCT) per anchor — no 7-way self-join, no per-day
    * range-window shuffle of raw events, and the heavy input is
    * touched exactly once. Anchors clipped to the observed day span;
    * stickiness is exact integer ppm. */
  def ev_dau_wau(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val userDays = Tables.events(s, d)
      .select($"user_id", to_date($"ts").as("day")).distinct()
    val dau = userDays.groupBy($"day")
      .agg(countDistinct($"user_id").as("dau"))
    val wau = userDays
      .select($"user_id",
        explode(expr("sequence(day, date_add(day, 6))")).as("day"))
      .groupBy($"day")
      .agg(countDistinct($"user_id").as("wau"))
    dau.join(wau, Seq("day"))
      .select($"day", $"dau", $"wau",
        expr("dau * 1000000 div wau").as("stickiness_ppm"))
      .orderBy($"day")
  }

  /** Per-user event-type TRANSITION MATRIX (first-order Markov view
    * of the clickstream — "what follows what", the sequence-mining
    * companion to ev_funnel's fixed pattern): consecutive event pairs
    * in each user's time-ordered stream, counted per (from, to) with
    * the row-conditional probability in exact ppm. One window lag
    * over the per-user partitions (the shuffle is user-keyed — the
    * same exchange ev_sessionize runs), then a map-side-combined
    * count over ≤ |types|² keys; the conditional divides by the
    * from-row mass through a broadcast-scale self-aggregation.
    * Deterministic within-timestamp order via (ts, event_id). */
  def ev_markov(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = Tables.events(s, d)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromMass = pairs.groupBy($"from_type")
      .agg(sum($"n").as("from_total"))
    pairs.join(broadcast(fromMass), Seq("from_type"))
      .select($"from_type", $"to_type", $"n", $"from_total",
        expr("n * 1000000 div from_total").as("p_ppm"))
      .orderBy($"from_type", $"to_type")
  }

  /** GAP-FILLED hourly time series — ev_window_agg densified: every
    * (hour, event_type) cell between the stream's first and last hour
    * exists, zero-filled where no event landed (`filled` marks the
    * synthesized cells). Dashboards, anomaly baselines and
    * rate-of-change windows all need the dense grid — a missing hour
    * silently reads as "no data" rather than "zero events" and a lag()
    * over the sparse series skips it.
    *
    * Spark-first shape: the hour dimension is ONE scalar aggregate
    * (min/max hour) exploded through sequence() — a broadcast-scalar
    * cross join, not a second scan-shaped shuffle; event types are the
    * DECLARED closed set (ev_pivot's rule: no distinct job, grid width
    * not data-dependent); the dense grid left-joins the aggregated
    * sparse series on (hour, type). Grid size = hours × 5 — metadata
    * scale even for years of data — while the corpus is touched by
    * exactly one map-side-combined aggregate. */
  def ev_gap_fill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
    val sparse = ev.groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum($"value"), 2).as("total_value"))
    val grid = ev.agg(date_trunc("hour", min($"ts")).as("h0"),
        date_trunc("hour", max($"ts")).as("h1"))
      .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
      .crossJoin(Seq("click", "error", "purchase", "signup", "view")
        .toDF("event_type"))
    grid.join(sparse, Seq("hour", "event_type"), "left")
      .select($"hour", $"event_type",
        coalesce($"n_events", lit(0L)).as("n_events"),
        coalesce($"total_value", lit(0.0)).as("total_value"),
        $"n_events".isNull.as("filled"))
      .orderBy($"hour", $"event_type")
  }

  /** MULTI-TOUCH ATTRIBUTION (position-based 40/40/20) — the
    * marketing-analytics assignment of each purchase's value to the
    * click/view touchpoints that preceded it (within a 7-day
    * lookback), by channel (touch type × page): first and last touch
    * take 400000 ppm each, the middle touches split 200000 ppm evenly
    * (floored), a lone touch takes all, a pair splits evenly.
    *
    * Spark-first shape — NO self-join of the event stream: one
    * user-keyed window pass over the DESCENDING (ts, event_id) order
    * computes, per row, both the id of the next purchase at-or-after
    * it (a running purchase count — the row's conversion GROUP) and
    * that purchase's (ts, value) (last(..., ignoreNulls) — the ev_asof
    * device), so touches never join back to conversions. The position
    * windows partition by (user_id, grp) — a SUBSET-satisfiable
    * distribution, so Catalyst reuses the user_id exchange and only
    * adds a local sort. Weights and attributed value are exact integer
    * ppm/centi (`round(value*100)` — the ev_stragglers rule), so the
    * whole composition hash-verifies. */
  def ev_attribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wDesc = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tagged = Tables.events(s, d)
      .select($"user_id", $"ts", $"event_id", $"event_type", $"value",
        get_json_object($"props", "$.k").cast("long").as("page"))
      .withColumn("grp",
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).over(wDesc))
      .withColumn("conv_ts",
        last(when($"event_type" === "purchase", $"ts"), ignoreNulls = true).over(wDesc))
      .withColumn("cv",
        last(when($"event_type" === "purchase",
          expr("cast(round(value * 100) as bigint)")), ignoreNulls = true).over(wDesc))
    val touches = tagged
      .filter($"event_type".isin("click", "view") && $"grp" > 0 &&
        $"ts" >= $"conv_ts" - expr("interval 7 days"))
      .select($"user_id", $"grp", $"ts", $"event_id",
        $"event_type".as("touch_type"), $"page", $"cv")
    val wPos = Window.partitionBy($"user_id", $"grp").orderBy($"ts", $"event_id")
    val wN = Window.partitionBy($"user_id", $"grp")
    touches
      .withColumn("pos", row_number().over(wPos))
      .withColumn("n", count(lit(1)).over(wN))
      .withColumn("w_ppm",
        when($"n" === 1, 1000000L)
          .when($"n" === 2, 500000L)
          .when($"pos" === 1 || $"pos" === $"n", 400000L)
          .otherwise(expr("200000L div (n - 2)")))
      .groupBy($"touch_type", $"page")
      .agg(count(lit(1)).as("n_touches"),
        sum(expr("cv * w_ppm div 1000000")).as("attributed_centi"))
      .orderBy($"touch_type", $"page")
  }

  /** One materialized base view per source dir, built once per JVM —
    * the lshIndexTable rule: the persist is view CONSTRUCTION (the
    * amortized write a warehouse pays at refresh time), the registered
    * query times the MAINTENANCE path. Base = event_id % 10 < 8 (a
    * deterministic 80% "already ingested" slice). */
  private val ivmViewBuilt = new java.util.HashSet[String]()
  private def ivmViewPath(s: SparkSession, d: String): String = {
    import s.implicits._
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val name = d.replaceAll("[^A-Za-z0-9._-]", "_")
    val path = s"$wh/graft_ivm/$name"
    ivmViewBuilt.synchronized { if (!ivmViewBuilt.contains(d)) {
      Tables.events(s, d).filter($"event_id" % 10 < 8)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("cnt"),
          sum(expr("cast(round(value * 100) as bigint)")).as("sum_centi"),
          max(expr("cast(round(value * 100) as bigint)")).as("max_centi"))
        .write.mode("overwrite").parquet(path)
      ivmViewBuilt.add(d)
    } }
    path
  }

  /** INCREMENTAL VIEW MAINTENANCE — the materialized-view refresh that
    * makes a 100 TB daily aggregate affordable: instead of rescanning
    * the full event history on every refresh, the maintained view
    * absorbs only the DELTA (here the 20% of events with
    * event_id % 10 >= 8) through a partial-aggregate MERGE. count and
    * sum merge additively, max merges by greatest — the classic
    * self-maintainable aggregates (avg derives as sum/cnt
    * downstream); the merge is a full-outer join on the group key so
    * groups born in the delta appear and untouched groups pass
    * through.
    *
    * Scale shape: the base side is the PERSISTED view — group-key-
    * sized, not event-sized — so refresh cost is O(delta) + a
    * view-sized join, never a history rescan. The DuckDB oracle
    * recomputes the view from ALL events from scratch; the hash match
    * IS the IVM correctness theorem (merge(base, delta) ==
    * recompute(full)) on real data. Values are exact integer centi
    * (the ev_stragglers rule) so the equality is bitwise. */
  def ev_ivm_delta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = s.read.parquet(ivmViewPath(s, d))
    val delta = Tables.events(s, d).filter($"event_id" % 10 >= 8)
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("d_cnt"),
        sum(expr("cast(round(value * 100) as bigint)")).as("d_sum_centi"),
        max(expr("cast(round(value * 100) as bigint)")).as("d_max_centi"))
    base.join(delta, Seq("event_type", "day"), "full_outer")
      .select($"event_type", $"day",
        (coalesce($"cnt", lit(0L)) + coalesce($"d_cnt", lit(0L))).as("n_events"),
        (coalesce($"sum_centi", lit(0L)) + coalesce($"d_sum_centi", lit(0L)))
          .as("sum_centi"),
        greatest($"max_centi", $"d_max_centi").as("max_centi"))
      .orderBy($"event_type", $"day")
  }

  /** SALTED SKEW JOIN as a registered query — [[Skew.saltedJoin]]'s
    * library guarantee (result ≡ plain join, SkewSpec) exercised on
    * real data with a DuckDB oracle that knows nothing about salt:
    * the oracle computes the PLAIN join + aggregate, so the hash match
    * proves salting is invisible to semantics. The skewed side is the
    * event stream keyed on event_type (5 hot keys — exactly the
    * too-few-distinct-keys regime where one key's rows otherwise pile
    * into one task and AQE's partition-splitting can't help the build
    * bucket); the replicated side is a per-type dim derived from the
    * distinct types. Aggregation uses dim attributes (tier, weight) so
    * the join is load-bearing, and the measure is exact integer centi
    * (value·weight) so the composition hash-verifies. */
  def ev_skew_join(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"event_id", $"event_type", $"value")
    val dim = ev.select($"event_type").distinct()
      .select($"event_type",
        substring($"event_type", 1, 1).as("tier"),
        length($"event_type").cast("long").as("weight"))
    Skew.saltedJoin(ev, dim, "event_type", salt = 16, rowId = Seq("event_id"))
      .groupBy($"tier")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("cast(round(value * 100) as bigint) * weight"))
          .as("weighted_centi"))
      .orderBy($"tier")
  }

  /** A/B EXPERIMENT ARM STATISTICS — the per-metric readout an
    * experimentation platform computes over the event stream: users
    * hash deterministically into arms (user_id % 2 — in production a
    * salted hash of the experiment id), and per event type the arms'
    * count / sum / floored mean / mean gap / sample-ratio land in ONE
    * map-side-combined conditional aggregate (the q14 device — no
    * pivot, no second pass, no per-arm scan). srm_ppm is the
    * sample-ratio-mismatch guardrail (expected 500000 ppm under a
    * 50/50 split; a skewed ratio invalidates the experiment before
    * any metric is read). All exact integer centi / micro-centi /
    * ppm, so the readout hash-verifies; the significance test proper
    * stays downstream (its sqrt leaves integer land — the
    * sums/sumsq-style moments here are what it consumes). */
  def ev_ab_stats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d).select($"event_type",
      ($"user_id" % 2 === 0).as("in_a"),
      expr("cast(round(value * 100) as bigint)").as("centi"))
    ev.groupBy($"event_type")
      .agg(
        sum(when($"in_a", 1L).otherwise(0L)).as("a_n"),
        sum(when(!$"in_a", 1L).otherwise(0L)).as("b_n"),
        sum(when($"in_a", $"centi").otherwise(0L)).as("a_sum_centi"),
        sum(when(!$"in_a", $"centi").otherwise(0L)).as("b_sum_centi"))
      .withColumn("a_mean_ucenti", expr("a_sum_centi * 1000000 div a_n"))
      .withColumn("b_mean_ucenti", expr("b_sum_centi * 1000000 div b_n"))
      .withColumn("mean_gap_ucenti", $"a_mean_ucenti" - $"b_mean_ucenti")
      .withColumn("srm_ppm", expr("a_n * 1000000 div (a_n + b_n)"))
      .orderBy($"event_type")
  }

  /** TOP CONVERTING PATHS — the sequence-mining readout next to
    * [[ev_markov]]'s one-step transition matrix: the full ordered
    * event-type path each converting user walked up to (and
    * including) their FIRST purchase, grouped and ranked by
    * frequency — "what journeys actually end in a purchase".
    *
    * Spark-first shape: the first purchase per user is one
    * row_number pass (no self-join); the path string builds with
    * array_sort(collect_list(struct(ts, event_id, type))) → transform
    * → array_join — sort_array on the struct gives the (ts, event_id)
    * total order INSIDE the aggregate, so the concatenation is
    * deterministic regardless of partitioning (the DuckDB twin is
    * string_agg ORDER BY — both engines order by the same key). The
    * (user, path) stage and the ranking both ride the one user_id
    * exchange family. At 100 TB the path column is the scale knob:
    * production caps at the last K touches (a slice before the join);
    * here paths are full — the corpus's sessions are short. */
  def ev_funnel_paths(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", $"ts", $"event_id", $"event_type")
    val fp = ev.filter($"event_type" === "purchase")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
      .filter($"rn" === 1)
      .select($"user_id", $"ts".as("fts"), $"event_id".as("fid"))
    val paths = ev.join(fp, "user_id")
      .filter($"ts" < $"fts" || ($"ts" === $"fts" && $"event_id" <= $"fid"))
      .groupBy($"user_id")
      .agg(expr(
        """array_join(transform(
          |  array_sort(collect_list(struct(ts, event_id, event_type))),
          |  x -> x.event_type), '->')""".stripMargin).as("path"))
    // top-k FIRST (TakeOrderedAndProject — distributed, no global
    // window over the full path-count table), then rank the 10
    // survivors; the global row_number window only ever sees 10 rows
    paths.groupBy($"path").agg(count(lit(1)).as("n_users"))
      .orderBy($"n_users".desc, $"path").limit(10)
      .withColumn("rank", row_number().over(
        Window.orderBy($"n_users".desc, $"path")))
      .select($"rank", $"path", $"n_users")
      .orderBy($"rank")
  }

  /** EVENT-TIME LATENESS AUDIT — the measurement that picks a
    * streaming watermark delay: for every event, how far behind the
    * merged stream's high-water mark (max event time over everything
    * that ARRIVED earlier) did it land? The corpus's `event_id` is
    * perfectly time-ordered (a single well-behaved producer), so the
    * ARRIVAL model is the one that actually creates disorder in
    * production: S=4 source shards (shard = user_id % 4, the
    * partition-by-key ingest) drained round-robin in micro-batches of
    * B=100 ids — within a batch the collector empties shard 0 before
    * shard 1, so a shard-0 event near the batch's end of time horizon
    * arrives BEFORE shard-1 events from earlier in event time. That
    * is exactly the Kafka-partition merge that makes real streams
    * out-of-order, and the audit quantifies it: arrival order =
    * (batch, shard, event_id), lateness_s = max(0, wm_before −
    * unix(ts)).
    *
    * Scale shape — the prefix max over the merged arrival order is
    * NOT computed as one global-order window (a single-partition
    * sort at 100 TB). It decomposes exactly (the ev_burn_rate spine
    * discipline): an intra-group running max (window partitioned by
    * (batch, shard) — parallel) combined with a prefix max over the
    * per-group maxima spine ordered by (batch, shard) — |batches|×4
    * rows, metadata-scale, broadcast back. greatest() of the two legs
    * (null-skipping; first arrival overall → both null → on time) is
    * bit-identical to the global window, which the DuckDB oracle runs
    * directly and EventOpsSpec replays sequentially. Histogrammed per
    * event type into the buckets an SRE would sweep for a watermark
    * choice (on_time / ≤60s / ≤300s / ≤3600s / beyond) — the
    * '04_gt_3600s' row is exactly what a `withWatermark("1 hour")`
    * twin would drop. Integer seconds throughout → full DuckDB hash
    * oracle. */
  def ev_late_audit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, d)
      .select($"event_id", $"event_type",
        expr("event_id div 100").as("batch"),
        expr("user_id % 4").as("shard"),
        expr("bigint(unix_timestamp(ts))").as("ets"))
    val wg = Window.partitionBy($"batch", $"shard").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val spineW = Window.orderBy($"batch", $"shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val spine = e.groupBy($"batch", $"shard").agg(max($"ets").as("g_max"))
      .withColumn("wm_in", max($"g_max").over(spineW))
      .select($"batch", $"shard", $"wm_in")
    e.withColumn("wm_intra", max($"ets").over(wg))
      .join(broadcast(spine), Seq("batch", "shard"))
      .withColumn("late_s",
        greatest(lit(0L),
          coalesce(greatest($"wm_intra", $"wm_in") - $"ets", lit(0L))))
      .withColumn("late_bucket",
        when($"late_s" === 0L, "00_on_time")
          .when($"late_s" <= 60L, "01_le_60s")
          .when($"late_s" <= 300L, "02_le_300s")
          .when($"late_s" <= 3600L, "03_le_3600s")
          .otherwise("04_gt_3600s"))
      .groupBy($"event_type", $"late_bucket")
      .agg(count(lit(1)).as("n_events"), sum($"late_s").as("total_late_s"))
      .orderBy($"event_type", $"late_bucket")
  }

  /** COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005) with exact
    * overestimate accounting — the bounded-memory frequency sketch
    * that complements [[ev_heavy_hitters]]'s SpaceSaving (which keeps
    * ONLY the top keys; CMS answers point queries for EVERY key from
    * 192 counters): depth 3 × width 64, hash_j(key) = ((a_j·(key mod
    * p) + b_j) mod p) mod 64 with p = 2^31−1 and fixed small a_j
    * (< 2^17, so the product stays < 2^48 — no ANSI overflow at any
    * key scale), estimate = min_j cell(j, h_j). The sketch build is
    * ONE map-side-combined aggregate over the 3×-exploded event
    * stream collapsing to 192 cells — the mergeable-partial shape
    * that makes CMS distributable (partial sketches sum cellwise;
    * Spark's partial agg IS that merge). The 192-cell table is then
    * broadcast back to score every key: true per-key count vs sketch
    * estimate vs the overestimate (always ≥ 0 — CMS never
    * undercounts; EventOpsSpec asserts both the one-sided error and
    * the ε = e/w expected-error bound). Pure integer arithmetic with
    * literal hash constants → the whole sketch replays verbatim in
    * DuckDB. */
  /** The CMS hash family, shared verbatim with the streaming twin
    * ([[graft.streaming.StreamingOps.cmsStream]]) so the two surfaces
    * cannot drift: (row, cell) struct per depth row for a key column. */
  private[graft] def cmsCells(keyCol: String): Seq[org.apache.spark.sql.Column] = {
    val p = 2147483647L // 2^31 - 1 (prime)
    val as = Seq(92821L, 48271L, 16807L)
    val bs = Seq(30269L, 49297L, 69621L)
    (0 until 3).map { j =>
      struct(lit(j.toLong).as("row"),
        expr(s"((${as(j)} * ($keyCol % $p) + ${bs(j)}) % $p) % 64").as("cell"))
    }
  }

  def ev_cms(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d).select($"user_id".as("key"))
    val sketch = ev.select(explode(array(cmsCells("key"): _*)).as("rc"))
      .groupBy($"rc.row".as("row"), $"rc.cell".as("cell"))
      .agg(count(lit(1)).as("n"))
    val truth = ev.groupBy($"key").agg(count(lit(1)).as("true_n"))
    val probes = truth.select($"key", $"true_n",
        explode(array(cmsCells("key"): _*)).as("rc"))
      .select($"key", $"true_n", $"rc.row".as("row"), $"rc.cell".as("cell"))
    probes.join(broadcast(sketch), Seq("row", "cell"))
      .groupBy($"key", $"true_n").agg(min($"n").as("cms_n"))
      .select($"key".as("user_id"), $"true_n", $"cms_n",
        ($"cms_n" - $"true_n").as("overestimate"))
      .orderBy($"user_id")
  }

  /** KMV (K-MINIMUM-VALUES / bottom-k theta) DISTINCT-COUNT SKETCH —
    * the approximate-distinct estimator that, unlike HLL
    * ([[ev_approx_uniques]] stays rows-only for exactly that reason),
    * REPLAYS EXACTLY on a second engine: hash every key, keep the k
    * smallest distinct hash values per group, and estimate
    * distinct ≈ (k−1) · SPACE / h_k (Bar-Yossef et al. 2002). Every
    * step is deterministic integer arithmetic, so the whole sketch —
    * including the estimate — hash-verifies against DuckDB, and the
    * output is a self-auditing report: exact distinct, k used, and
    * the estimate side by side (EventOpsSpec gates the ≈12%/√1
    * relative error at 2.7σ).
    *
    * Hash = a staged-mod QUADRATIC mix ((A·(x² mod p) + B·x + C) mod
    * p) + 1 over SPACE p = 2^31−1, A,B ≈ 2^30 (+1 keeps h ≥ 1 — no
    * zero divisor; every intermediate ≤ 2^62, ANSI-safe). A LINEAR
    * map cannot work here: small sequential keys never wrap the
    * modulus, their "hashes" stay ordered-and-tiny, and the k-th
    * minimum collapses (first attempt estimated 43k for 150 users —
    * kept as the cautionary number). Min-statistics need avalanche;
    * the large-multiplier quadratic wraps from x = 2 upward. The
    * 31-bit space is the i64-exact verifiability choice and a
    * documented knob: birthday collisions are negligible to ~10^5
    * distinct keys; production widens to the fmix64 64-bit kernel the
    * minhash family already replays via HUGEINT. Groups with fewer
    * than k distinct hashes report their exact count (the standard
    * KMV small-set rule). Shape: the bottom-k state is a typed
    * [[graft.functions.KmvAggregator]] — a two-phase
    * ObjectHashAggregate whose PARTIAL phase caps every group at k
    * DISTINCT values per map task, so the shuffle carries ≤ k·tasks
    * values per group no matter the event volume and duplicates die
    * map-side (no pre-distinct shuffle, no per-group sort window);
    * its `merge` is the textbook KMV sketch-union, which is exactly
    * what makes this a distributable sketch — the streaming twin
    * ([[graft.streaming.StreamingOps.kmvStream]]) folds micro-batch
    * partials through the same code path. */
  /** The KMV staged-mod quadratic hash, shared verbatim with the
    * streaming twin so the two surfaces cannot drift. */
  private[graft] def kmvHash(keyCol: String): org.apache.spark.sql.Column = {
    val p = 2147483647L
    expr(s"(1103515245 * (($keyCol % $p) * ($keyCol % $p) % $p)" +
      s" + 1013904223 * ($keyCol % $p) + 12345) % $p + 1")
  }

  def ev_kmv_uniques(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val p = 2147483647L
    val k = 64
    val kmv = udaf(new graft.functions.KmvAggregator(k))
    val ev = Tables.events(s, d)
      .select($"event_type", kmvHash("user_id").as("h"))
    val bottomK = ev
      .groupBy($"event_type")
      .agg(kmv($"h").as("buf"))
      .select($"event_type",
        size($"buf.hs").cast("long").as("k_used"),
        element_at($"buf.hs", -1).as("hk"))
    val exact = Tables.events(s, d)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_exact"))
    bottomK.join(exact, Seq("event_type"))
      .select($"event_type", $"n_exact", $"k_used",
        when($"k_used" < k, $"k_used")
          .otherwise(expr(s"${k - 1}L * $p div hk")).as("kmv_est"))
      .orderBy($"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_kmv_uniques" -> ev_kmv_uniques _,
    "ev_cms" -> ev_cms _,
    "ev_late_audit" -> ev_late_audit _,
    "ev_funnel_paths" -> ev_funnel_paths _,
    "ev_ab_stats" -> ev_ab_stats _,
    "ev_ivm_delta" -> ev_ivm_delta _,
    "ev_skew_join" -> ev_skew_join _,
    "ev_attribution" -> ev_attribution _,
    "ev_burn_rate" -> ev_burn_rate _,
    "ev_time_to_convert" -> ev_time_to_convert _,
    "ev_cohort_matrix" -> ev_cohort_matrix _,
    "ev_dau_wau" -> ev_dau_wau _,
    "ev_markov" -> ev_markov _,
    "ev_gap_fill" -> ev_gap_fill _,
    "ev_stragglers" -> ev_stragglers _,
    "ev_resource_skyline" -> ev_resource_skyline _,
    "ev_anomaly" -> ev_anomaly _,
    "ev_quantile_sketch" -> ev_quantile_sketch _,
    "ev_heavy_hitters" -> ev_heavy_hitters _,
    "ev_fullouter" -> ev_fullouter _,
    "ev_pivot" -> ev_pivot _,
    "ev_window_agg" -> ev_window_agg _,
    "ev_sessionize" -> ev_sessionize _,
    "ev_funnel" -> ev_funnel _,
    "ev_json_props" -> ev_json_props _,
    "ev_retention" -> ev_retention _,
    "ev_asof" -> ev_asof _,
    "ev_range_join" -> ev_range_join _,
    "ev_approx_uniques" -> ev_approx_uniques _)

  val oracle: Map[String, String] = Map(
    "ev_kmv_uniques" ->
      """WITH ev AS (
        |  SELECT DISTINCT event_type,
        |    (1103515245 * ((user_id % 2147483647) * (user_id % 2147483647)
        |        % 2147483647)
        |     + 1013904223 * (user_id % 2147483647) + 12345)
        |    % 2147483647 + 1 AS h
        |  FROM events),
        |bk AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS k_used,
        |    max(h) AS hk
        |  FROM (
        |    SELECT event_type, h,
        |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |    FROM ev)
        |  WHERE rn <= 64 GROUP BY 1),
        |ex AS (
        |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
        |  FROM events GROUP BY 1)
        |SELECT bk.event_type, ex.n_exact, bk.k_used,
        |  CASE WHEN bk.k_used < 64 THEN bk.k_used
        |       ELSE CAST(63 AS BIGINT) * 2147483647 // bk.hk END AS kmv_est
        |FROM bk JOIN ex USING (event_type) ORDER BY 1""".stripMargin,
    "ev_cms" ->
      """WITH ev AS (SELECT user_id AS key FROM events),
        |h AS (
        |  SELECT key, j.j AS row,
        |    ((CASE j.j WHEN 0 THEN 92821 WHEN 1 THEN 48271 ELSE 16807 END
        |      * (key % 2147483647)
        |      + CASE j.j WHEN 0 THEN 30269 WHEN 1 THEN 49297 ELSE 69621 END)
        |     % 2147483647) % 64 AS cell
        |  FROM ev, unnest(range(3)) AS j(j)),
        |sketch AS (
        |  SELECT row, cell, CAST(count(*) AS BIGINT) AS n
        |  FROM h GROUP BY 1, 2),
        |truth AS (
        |  SELECT key, CAST(count(*) AS BIGINT) AS true_n FROM ev GROUP BY 1),
        |probes AS (
        |  SELECT DISTINCT t.key, t.true_n, h.row, h.cell
        |  FROM truth t JOIN h ON h.key = t.key)
        |SELECT p.key AS user_id, p.true_n, min(s.n) AS cms_n,
        |  min(s.n) - p.true_n AS overestimate
        |FROM probes p JOIN sketch s ON p.row = s.row AND p.cell = s.cell
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    // epoch_us // 1000000 floors to whole seconds exactly like
    // Spark's unix_timestamp; CAST(epoch(ts) AS BIGINT) would ROUND
    // the fractional part and drift ±1 s on sub-second timestamps
    "ev_late_audit" ->
      """WITH lat AS (
        |  SELECT event_type,
        |    greatest(0, coalesce(
        |      max(epoch_us(ts) // 1000000) OVER (
        |        ORDER BY event_id // 100, user_id % 4, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      - epoch_us(ts) // 1000000, 0)) AS late_s
        |  FROM events)
        |SELECT event_type,
        |  CASE WHEN late_s = 0 THEN '00_on_time'
        |       WHEN late_s <= 60 THEN '01_le_60s'
        |       WHEN late_s <= 300 THEN '02_le_300s'
        |       WHEN late_s <= 3600 THEN '03_le_3600s'
        |       ELSE '04_gt_3600s' END AS late_bucket,
        |  count(*) AS n_events, CAST(sum(late_s) AS BIGINT) AS total_late_s
        |FROM lat GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // string_agg ORDER BY (ts, event_id) is the same total order the
    // Spark side gets from array_sort over the (ts, event_id, type)
    // struct, so the path strings match byte-for-byte
    "ev_funnel_paths" ->
      """WITH fp AS (
        |  SELECT user_id, ts AS fts, event_id AS fid FROM (
        |    SELECT user_id, ts, event_id,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS rn
        |    FROM events WHERE event_type = 'purchase')
        |  WHERE rn = 1),
        |paths AS (
        |  SELECT e.user_id,
        |    string_agg(e.event_type, '->' ORDER BY e.ts, e.event_id) AS path
        |  FROM events e JOIN fp USING (user_id)
        |  WHERE (e.ts, e.event_id) <= (fp.fts, fp.fid)
        |  GROUP BY 1),
        |pc AS (SELECT path, count(*) AS n_users FROM paths GROUP BY 1)
        |SELECT CAST(row_number() OVER (ORDER BY n_users DESC, path) AS BIGINT)
        |    AS rank,
        |  path, n_users
        |FROM pc ORDER BY n_users DESC, path LIMIT 10""".stripMargin,
    "ev_ab_stats" ->
      """WITH ev AS (
        |  SELECT event_type, user_id % 2 = 0 AS in_a,
        |    CAST(round(value * 100) AS BIGINT) AS centi
        |  FROM events),
        |agg AS (
        |  SELECT event_type,
        |    sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS a_n,
        |    sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS b_n,
        |    sum(CASE WHEN in_a THEN centi ELSE 0 END) AS a_sum_centi,
        |    sum(CASE WHEN in_a THEN 0 ELSE centi END) AS b_sum_centi
        |  FROM ev GROUP BY 1)
        |SELECT event_type,
        |  CAST(a_n AS BIGINT) AS a_n, CAST(b_n AS BIGINT) AS b_n,
        |  CAST(a_sum_centi AS BIGINT) AS a_sum_centi,
        |  CAST(b_sum_centi AS BIGINT) AS b_sum_centi,
        |  CAST(a_sum_centi * 1000000 // a_n AS BIGINT) AS a_mean_ucenti,
        |  CAST(b_sum_centi * 1000000 // b_n AS BIGINT) AS b_mean_ucenti,
        |  CAST(a_sum_centi * 1000000 // a_n - b_sum_centi * 1000000 // b_n
        |    AS BIGINT) AS mean_gap_ucenti,
        |  CAST(a_n * 1000000 // (a_n + b_n) AS BIGINT) AS srm_ppm
        |FROM agg ORDER BY event_type""".stripMargin,
    // full recompute from scratch — the hash match against the Spark
    // side's merge(persisted base, delta) IS the IVM theorem
    "ev_ivm_delta" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_centi,
        |  max(CAST(round(value * 100) AS BIGINT)) AS max_centi
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // plain (unsalted) join + aggregate — the hash match proves the
    // salt scatter/replicate is semantically invisible
    "ev_skew_join" ->
      """WITH dim AS (
        |  SELECT DISTINCT event_type, substr(event_type, 1, 1) AS tier,
        |    CAST(length(event_type) AS BIGINT) AS weight
        |  FROM events)
        |SELECT d.tier, count(*) AS n_events,
        |  CAST(sum(CAST(round(e.value * 100) AS BIGINT) * d.weight) AS BIGINT)
        |    AS weighted_centi
        |FROM events e JOIN dim d USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS page
        |  FROM events),
        |tagged AS (
        |  SELECT user_id, ts, event_id, event_type, page,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      OVER w AS grp,
        |    last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
        |      OVER w AS conv_ts,
        |    last_value(CASE WHEN event_type = 'purchase'
        |        THEN CAST(round(value * 100) AS BIGINT) END IGNORE NULLS)
        |      OVER w AS cv
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |touches AS (
        |  SELECT user_id, grp, ts, event_id, event_type AS touch_type, page, cv
        |  FROM tagged
        |  WHERE event_type IN ('click', 'view') AND grp > 0
        |    AND ts >= conv_ts - INTERVAL 7 DAY),
        |pos AS (
        |  SELECT touch_type, page, cv,
        |    row_number() OVER (PARTITION BY user_id, grp
        |                       ORDER BY ts, event_id) AS pos,
        |    count(*) OVER (PARTITION BY user_id, grp) AS n
        |  FROM touches),
        |wtd AS (
        |  SELECT touch_type, page, cv,
        |    CASE WHEN n = 1 THEN 1000000
        |         WHEN n = 2 THEN 500000
        |         WHEN pos = 1 OR pos = n THEN 400000
        |         ELSE 200000 // (n - 2) END AS w_ppm
        |  FROM pos)
        |SELECT touch_type, page,
        |  CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(SUM(cv * w_ppm // 1000000) AS BIGINT) AS attributed_centi
        |FROM wtd GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Same centi-unit basis as ev_stragglers; the bucket id, windowed
    // cumulative, ceil-rank and upper-edge arithmetic are all i64 so
    // the sketch replays bit-identically (`div` ≡ `//` on the
    // non-negative operands here).
    "ev_quantile_sketch" ->
      """WITH cv AS (
        |  SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cv FROM events),
        |hist AS (
        |  SELECT event_type, cv // 64 AS bucket,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM cv GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, bucket, n,
        |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bucket)
        |      AS BIGINT) AS cum,
        |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
        |  FROM hist)
        |SELECT event_type, p.p, any_value(total) AS n_events,
        |  CAST(min(bucket) * 64 + 64 AS BIGINT) AS est_centi
        |FROM cum, (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS p) p
        |WHERE cum >= (total * p.p + 99) // 100
        |GROUP BY event_type, p.p
        |ORDER BY event_type, p.p""".stripMargin,
    // Centisecond basis: round(value*100) is exact on both engines
    // (the raw doubles are centi-precision, never near a .5 midpoint);
    // the straggler test is the same i64 cross-multiplication; `div`
    // (Spark, truncating) ≡ `//` (DuckDB, flooring) on the
    // non-negative ppm quotient.
    "ev_stragglers" ->
      """WITH t AS (
        |  SELECT user_id, event_type,
        |         CAST(round(value * 100) AS BIGINT) AS cs FROM events),
        |g AS (
        |  SELECT user_id, event_type, cs,
        |         count(*) OVER w AS n, sum(cs) OVER w AS tot
        |  FROM t WINDOW w AS (PARTITION BY user_id, event_type))
        |SELECT user_id, event_type,
        |  CAST(count(*) AS BIGINT) AS n_tasks,
        |  CAST(sum(cs) AS BIGINT) AS total_cs,
        |  CAST(max(cs) AS BIGINT) AS max_cs,
        |  CAST(count(*) FILTER (WHERE 2 * cs * n > 3 * tot) AS BIGINT)
        |    AS n_stragglers,
        |  CAST(coalesce(sum(cs) FILTER (WHERE 2 * cs * n > 3 * tot), 0)
        |    AS BIGINT) AS straggler_cs,
        |  CAST(coalesce(sum(cs) FILTER (WHERE 2 * cs * n > 3 * tot), 0)
        |    AS BIGINT) * 1000000 // CAST(sum(cs) AS BIGINT) AS straggler_ppm
        |FROM g GROUP BY 1, 2 HAVING count(*) >= 5
        |ORDER BY 1, 2""".stripMargin,
    "ev_resource_skyline" ->
      """WITH h AS (
        |  SELECT user_id, date_trunc('day', ts) AS run_day,
        |         CAST(extract(hour FROM ts) AS BIGINT) AS hod,
        |         sum(CAST(round(value * 100) AS BIGINT)) AS run_cs
        |  FROM events GROUP BY 1, 2, 3),
        |sky AS (
        |  SELECT user_id, hod, max(run_cs) AS hod_cs FROM h GROUP BY 1, 2),
        |p AS (
        |  SELECT user_id, hod, hod_cs,
        |         max(hod_cs) OVER (PARTITION BY user_id) AS pk FROM sky)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_active_hours,
        |  CAST(sum(hod_cs) AS BIGINT) AS predicted_total_cs,
        |  CAST(max(hod_cs) AS BIGINT) AS peak_cs,
        |  CAST(min(hod) FILTER (WHERE hod_cs = pk) AS BIGINT) AS peak_hour
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    // Valid because every test SF sits in the sketch's EXACT regime
    // (distinct users <= capacity — the aggregator's spec'd guarantee):
    // est_count = true count, max_overcount = 0, merge-order-free.
    "ev_heavy_hitters" ->
      """SELECT user_id, count(*) AS est_count,
        | CAST(0 AS BIGINT) AS max_overcount
        |FROM events GROUP BY 1
        |ORDER BY est_count DESC, user_id LIMIT 10""".stripMargin,
    "ev_anomaly" ->
      """WITH hourly AS (
        | SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n_events,
        |  epoch_us(date_trunc('hour', ts)) // 3600000000 AS hour_epoch
        | FROM events GROUP BY 1, 2, 4),
        |m AS (
        | SELECT hour, event_type, n_events,
        |  count(n_events) OVER w AS cnt,
        |  sum(n_events) OVER w AS s,
        |  sum(n_events * n_events) OVER w AS sq
        | FROM hourly
        | WINDOW w AS (PARTITION BY event_type ORDER BY hour_epoch
        |   RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |v AS (
        | SELECT hour, event_type, n_events, cnt, s,
        |  (CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |     / CAST(cnt AS DOUBLE)) / (CAST(cnt AS DOUBLE) - 1) AS variance
        | FROM m WHERE cnt >= 12)
        |SELECT hour, event_type, n_events, CAST(s AS BIGINT) AS trailing_total,
        | CASE WHEN variance > 0 THEN
        |  CAST(floor((CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE))
        |    / sqrt(variance) * 10000) AS BIGINT)
        | END AS z_bp
        |FROM v ORDER BY hour, event_type""".stripMargin,
    "ev_window_agg" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        | count(*) AS n_events, round(sum(value),2) AS total_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "ev_burn_rate" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_errors
        |  FROM events GROUP BY 1),
        |win AS (
        |  SELECT hour, n_events, n_errors,
        |    CAST(sum(n_events) OVER (ORDER BY epoch(hour) // 3600
        |      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS slow_events,
        |    CAST(sum(n_errors) OVER (ORDER BY epoch(hour) // 3600
        |      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS slow_errors
        |  FROM hourly)
        |SELECT hour, n_events, n_errors,
        |  CAST((n_errors * 1000000 // n_events) * 1000000 // 250000 AS BIGINT)
        |    AS burn_fast_ppm,
        |  CAST((slow_errors * 1000000 // slow_events) * 1000000 // 250000 AS BIGINT)
        |    AS burn_slow_ppm,
        |  (n_errors * 1000000 // n_events) * 1000000 // 250000 >= 1000000
        |    AND (slow_errors * 1000000 // slow_events) * 1000000 // 250000 >= 1000000
        |    AS alert
        |FROM win ORDER BY hour""".stripMargin,
    "ev_time_to_convert" ->
      """WITH s AS (
        |  SELECT user_id, min(ts) AS signup_ts
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |fc AS (
        |  SELECT p.user_id, min(p.ts) AS conv_ts
        |  FROM events p JOIN s USING (user_id)
        |  WHERE p.event_type = 'purchase' AND p.ts >= s.signup_ts
        |  GROUP BY 1),
        |du AS (
        |  SELECT s.user_id,
        |    CASE WHEN fc.conv_ts IS NULL THEN -1
        |    ELSE date_diff('day', CAST(s.signup_ts AS DATE),
        |      CAST(fc.conv_ts AS DATE)) END AS days_to_convert
        |  FROM s LEFT JOIN fc ON s.user_id = fc.user_id)
        |SELECT CAST(days_to_convert AS BIGINT) AS days_to_convert,
        |  count(*) AS n_users
        |FROM du GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_cohort_matrix" ->
      """WITH cohorts AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |sizes AS (SELECT cohort_day, count(*) AS cohort_size
        |          FROM cohorts GROUP BY 1),
        |cells AS (
        |  SELECT DISTINCT a.user_id, c.cohort_day,
        |    date_diff('day', c.cohort_day, a.day) // 7 AS week_offset
        |  FROM activity a JOIN cohorts c USING (user_id)
        |  WHERE a.day >= c.cohort_day),
        |m AS (
        |  SELECT cohort_day, week_offset, count(*) AS n_active
        |  FROM cells GROUP BY 1, 2)
        |SELECT m.cohort_day, m.week_offset, m.n_active, s.cohort_size,
        |  CAST(m.n_active * 1000000 // s.cohort_size AS BIGINT) AS retention_ppm
        |FROM m JOIN sizes s USING (cohort_day)
        |ORDER BY m.cohort_day, m.week_offset""".stripMargin,
    "ev_dau_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
        |wau AS (
        |  SELECT day, count(DISTINCT user_id) AS wau FROM (
        |    SELECT user_id, day + CAST(t.i AS INTEGER) AS day
        |    FROM ud, LATERAL unnest(range(7)) AS t(i))
        |  GROUP BY 1)
        |SELECT d.day, d.dau, w.wau,
        |  CAST(d.dau * 1000000 // w.wau AS BIGINT) AS stickiness_ppm
        |FROM dau d JOIN wau w USING (day) ORDER BY d.day""".stripMargin,
    "ev_markov" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_type
        |  FROM events),
        |pairs AS (
        |  SELECT event_type AS from_type, next_type AS to_type,
        |    count(*) AS n
        |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |fm AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS from_total
        |       FROM pairs GROUP BY 1)
        |SELECT p.from_type, p.to_type, p.n, f.from_total,
        |  CAST(p.n * 1000000 // f.from_total AS BIGINT) AS p_ppm
        |FROM pairs p JOIN fm f USING (from_type)
        |ORDER BY p.from_type, p.to_type""".stripMargin,
    "ev_gap_fill" ->
      """WITH sparse AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |    count(*) AS n_events, round(sum(value),2) AS total_value
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT date_trunc('hour', min(ts)) AS h0,
        |         date_trunc('hour', max(ts)) AS h1 FROM events),
        |grid AS (
        |  SELECT g.hour, t.event_type
        |  FROM (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |        FROM bounds) g,
        |       (SELECT unnest(['click','error','purchase','signup','view'])
        |          AS event_type) t)
        |SELECT g.hour, g.event_type,
        |  COALESCE(s.n_events, 0) AS n_events,
        |  COALESCE(s.total_value, CAST(0 AS DOUBLE)) AS total_value,
        |  s.n_events IS NULL AS filled
        |FROM grid g LEFT JOIN sparse s
        |  ON g.hour = s.hour AND g.event_type = s.event_type
        |ORDER BY 1, 2""".stripMargin,
    "ev_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |     OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |   CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        | min(ts) AS session_start, max(ts) AS session_end,
        | round(sum(value),2) AS session_value
        |FROM sess GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "ev_funnel" ->
      """SELECT user_id,
        | min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
        | min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        | min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |FROM events GROUP BY 1
        |HAVING t_signup IS NOT NULL AND t_click > t_signup AND t_purchase > t_click
        |ORDER BY user_id""".stripMargin,
    "ev_json_props" ->
      """SELECT event_type, count(*) AS n_events,
        | round(avg(k),4) AS avg_k, min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_asof" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
        | c.click_id, c.ts AS click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.user_id, purchase_id""".stripMargin,
    "ev_fullouter" ->
      """SELECT coalesce(c.c_user, p.p_user) AS user_id,
        | coalesce(n_clicks, 0) AS n_clicks,
        | coalesce(n_purchases, 0) AS n_purchases
        |FROM (SELECT user_id AS c_user, count(*) AS n_clicks FROM events
        |      WHERE event_type = 'click' GROUP BY 1) c
        |FULL JOIN (SELECT user_id AS p_user, count(*) AS n_purchases FROM events
        |      WHERE event_type = 'purchase' GROUP BY 1) p
        | ON c.c_user = p.p_user
        |ORDER BY 1""".stripMargin,
    "ev_pivot" ->
      """SELECT date_trunc('day', ts) AS day,
        | count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        | count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        | count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        | count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        | count(CASE WHEN event_type = 'view' THEN 1 END) AS "view"
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_range_join" ->
      """SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
        | count(c.user_id) AS n_clicks_1h
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
        | ON c.user_id = p.user_id AND c.ts <= p.ts
        |  AND c.ts > p.ts - INTERVAL 1 HOUR
        |GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin,
    "ev_retention" ->
      """WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events)
        |SELECT a.day, count(DISTINCT a.user_id) AS n_active,
        | count(DISTINCT b.user_id) AS n_retained
        |FROM du a LEFT JOIN du b
        | ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
