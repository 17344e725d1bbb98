package graft

import org.apache.spark.sql.functions._

/** Mechanical plan-quality gates. The scale posture in SURVEY §5 was
  * originally verified by reading `.explain` output by hand; these
  * specs pin the load-bearing properties so a regression (a filter
  * that stops pushing down, a broadcast that silently becomes a
  * cartesian product) fails CI instead of surfacing at 100 TB.
  */
class PlanSpec extends SparkSpec {

  private def physical(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.sparkPlan.toString

  test("no cartesian products anywhere; nested-loop joins only where intended") {
    // BroadcastNestedLoopJoin is legitimate exactly where a broadcast
    // cross join is the design: tiny-dim cross (q21), broadcast scalar
    // (q15, fs_quota_check, fs_balancer_plan, text_token_hist),
    // broadcast query-set x
    // corpus (ann brute — both the DataFrame and the SQL-text form,
    // which plan the same broadcast of the 16-vector query side).
    val intendedNestedLoop =
      Set("q21_crossjoin_small", "q15_groupby_topk", "fs_quota_check",
        "fs_balancer_plan", "ann_topk_brute", "ann_cos_range",
        "sql_ann_cos_range", "ann_pq", "ann_topk_filtered",
        // ann_hybrid_rrf's vector leg and mm_caption_topk are the same
        // ann-brute posture: broadcast 16-query side × corpus scan
        "ann_hybrid_rrf", "mm_caption_topk", "text_token_hist",
        // TeraChecksum: two single-row fingerprint frames broadcast
        // onto the one-row validation summary
        "mr_sort_validate",
        // broadcast scalar (global cache demand / trash clock / hour
        // bounds) onto a metadata-scale frame; ev_gap_fill also
        // crosses the declared 5-type dim onto the hour spine
        "fs_cache_plan", "fs_trash_expunge", "ev_gap_fill",
        // broadcast scalar corpus totals onto the 1024-row weight table
        "text_dsir_select",
        // broadcast one-row capped count onto the one-row funnel counts
        "text_curation_funnel",
        // broadcast one-row bill total onto the per-source rollup
        "fs_chargeback",
        // broadcast 3-row percentile dim onto the bucket-grid frame
        "ev_quantile_sketch",
        // broadcast one-row class totals onto the 1024-row weight table
        "text_classify_centroid")
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val plan = physical(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
      if (!intendedNestedLoop(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unintended BroadcastNestedLoopJoin")
    }
  }

  test("q2_filter_project pushes its filter and prunes its columns at the scan") {
    val plan = physical("q2_filter_project")
    assert(plan.contains("PushedFilters: [IsNotNull"),
      s"no pushed filters in:\n${plan.take(1500)}")
    val readSchema = "ReadSchema: ([^\\n]+)".r.findFirstMatchIn(plan).map(_.group(1))
    assert(readSchema.exists(s => !s.contains("l_comment")),
      s"scan reads unprojected columns: $readSchema")
  }

  test("fs_find pushes every predicate to the scan and prunes to the projected columns") {
    val plan = physical("fs_find")
    assert(plan.contains("PushedFilters: ["), s"no pushed filters:\n${plan.take(1500)}")
    for (f <- Seq("GreaterThanOrEqual(n_chars,150", "In(lang"))
      assert(plan.contains(f), s"predicate $f not pushed:\n${plan.take(1500)}")
    val readSchema = "ReadSchema: ([^\\n]+)".r.findFirstMatchIn(plan).map(_.group(1))
    assert(readSchema.exists(s => !s.contains("text")),
      s"metadata search reads file CONTENT column: $readSchema")
  }

  test("global top-k compiles to TakeOrderedAndProject (q9_topk)") {
    assert(physical("q9_topk").contains("TakeOrderedAndProject"))
  }

  test("text_window_chunks stays shuffle-free below its presentation sort") {
    // the scaladoc's scale claim, held mechanically: the chunk
    // expansion is a pure per-row explode — the ONLY Exchange in the
    // plan is the final orderBy's range partitioning
    val exchanges = "Exchange".r.findAllIn(physical("text_window_chunks")).length
    assert(exchanges <= 1, s"chunk manifest plans $exchanges exchanges")
  }

  test("ev_attribution holds one corpus exchange: (user,grp) windows reuse the user exchange") {
    // the scaladoc's scale claim: the position windows' (user_id, grp)
    // distribution is satisfied by the existing user_id hash
    // partitioning (subset rule), so the corpus shuffles ONCE; the
    // only other exchanges are over the channel-sized aggregate
    // exchanges exist only post-preparation (EnsureRequirements), so
    // this gate reads executedPlan, not sparkPlan
    val plan = SparkEntry.queries("ev_attribution")(spark, sf0001)
      .queryExecution.executedPlan.toString
    val userExchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length
    assert(userExchanges == 1, s"expected 1 user_id exchange, got $userExchanges")
    assert(!"hashpartitioning\\(user_id#\\d+L?, grp".r.findFirstIn(plan).isDefined,
      "position windows re-shuffled on (user_id, grp)")
  }

  test("ann_topk_filtered keeps its WindowGroupLimit and broadcast query side") {
    val plan = physical("ann_topk_filtered")
    assert(plan.contains("WindowGroupLimit"), "filtered top-k lost partial pushdown")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "query side not broadcast")
  }

  test("text_dsir_select broadcasts the weight table (corpus never shuffles on buckets)") {
    assert(physical("text_dsir_select").contains("BroadcastHashJoin"),
      "weight join is not broadcast")
  }

  test("q5_multijoin broadcasts its dimension tables") {
    val plan = physical("q5_multijoin")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 3,
      s"expected >= 3 broadcast dim joins, found $broadcasts")
  }

  test("per-group rank queries get partial top-k pushdown (WindowGroupLimit)") {
    // Every rank<=k / row_number<=k consumer, not just the first one
    // written: a regression that knocks any of these out of the
    // partial group-limit (e.g. a non-deterministic expression slipped
    // under the window) turns a cap·tasks shuffle back into a
    // full-group shuffle — the difference between kilobytes and a hot
    // domain's full document count at 100 TB.
    for (q <- Seq("ann_topk_brute", "text_domain_cap", "text_tfidf", "ann_pq"))
      assert(physical(q).contains("WindowGroupLimit"),
        s"$q lost its WindowGroupLimit pushdown")
  }

  test("text_decontam broadcasts the eval gram set (train side never shuffles on grams)") {
    val plan = physical("text_decontam")
    assert(plan.contains("BroadcastHashJoin"),
      s"eval-gram join is not broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("SortMergeJoin"),
      "overlap join fell back to a sort-merge shuffle on the gram string")
  }

  test("ann_hybrid_rrf computes lexical denominators without a corpus rollup or gram re-explode") {
    // r16 shape: the per-doc denominators are ONE kernel-pass map
    // (size(shingleHashes(text)) — no Generate, no aggregate) with
    // the scored candidate pairs broadcast back onto it, so the lex
    // leg's only corpus-scale shuffle stays the candidate-pair
    // rollup. Pin: exactly TWO Generates in the whole plan (the two
    // gram explodes feeding the candidate join — the r13 denominator
    // path added a third), and no SortMergeJoin anywhere (every join
    // is broadcast except the windowed union's aggregates).
    val plan = physical("ann_hybrid_rrf")
    val generates = "(?m)^.*Generate ".r.findAllIn(plan).size
    assert(generates == 2,
      s"expected 2 gram explodes, found $generates in:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"denominator join regressed to a shuffled join:\n${plan.take(2000)}")
  }

  test("grouped aggregates keep map-side partial aggregation (q1_agg)") {
    val plan = physical("q1_agg")
    assert("partial".r.findFirstIn(plan.toLowerCase).isDefined,
      s"no partial aggregation phase in:\n${plan.take(1500)}")
  }
}
