package graft

import graft.operators.{Dedup, EventOps, MapReduceOps, MetadataOps,
  Relational, Similarity, SqlSurface}

/** The SQL-string surface must return exactly what the DataFrame API
  * returns: same columns, same rows, for every query that SqlSurface
  * shares with Relational. Proves `spark.sql` over the registered temp
  * views is a first-class interface, not a parallel implementation.
  */
class SqlParitySpec extends SparkSpec {

  private val pairs = Seq(
    "q1_agg" -> Relational.q1_agg _,
    "q4_semijoin" -> Relational.q4_semijoin _,
    "q5_multijoin" -> Relational.q5_multijoin _,
    "q11_rollup" -> Relational.q11_rollup _,
    "q18_having" -> Relational.q18_having _,
    "q24_setops" -> Relational.q24_setops _,
    "q25_unpivot" -> Relational.q25_unpivot _,
    "q26_grouping_sets" -> Relational.q26_grouping_sets _,
    "q27_ntile" -> Relational.q27_ntile _,
    // cross-family SQL-text surface: one per operator family
    "dedup_exact" -> Dedup.dedup_exact _,
    "fs_du" -> MetadataOps.fs_du _,
    "mr_join" -> MapReduceOps.mr_join _,
    "ev_window_agg" -> EventOps.ev_window_agg _,
    // substring-span dedup: the SQL text re-derives grams through the
    // extension-registered kernel + named-window islands, the
    // DataFrame form through posexplode + Column windows
    "text_dup_spans" -> graft.operators.TextOps.text_dup_spans _,
    // multi-route: the SQL text recomputes the routing accounting;
    // the DataFrame form reads it back from the materialized splits —
    // parity proves the written layout equals the declarative rule
    "text_multi_route" -> graft.operators.TextOps.text_multi_route _,
    // graph family from the SQL persona: the wedge algorithm as one
    // statement (struct comparisons for the degree-id orientation)
    "graph_triangles" -> graft.operators.Graph.graph_triangles _,
    // the production SQL path: same statement shape served from the
    // persisted oriented-edge views — parity against the DataFrame
    // index form proves SQL users get the identical counts through
    // the identical physical layout
    "graph_triangles_index" -> graft.operators.Graph.graph_triangles_index _,
    // SQL personas of the persisted text/dedup indexes (r17): the
    // statement is the production path — postings served bucketed,
    // the LSH probe through the extension-registered kernels
    "text_search_index" -> graft.operators.TextOps.text_search_index _,
    "dedup_minhash_index" -> graft.operators.Dedup.dedup_minhash_index _,
    // SQL persona of the persisted IVF index (r18 — completes SQL
    // coverage of every index tier): centroids baked as exact
    // round-trip literals, probe + rescore + top-5 as one statement
    // through the registered graft_cosine kernel over the
    // cell-bucketed view — both forms share the per-(JVM, dir) memo'd
    // index, so rows must match exactly
    "ann_ivf_index" -> graft.operators.Similarity.ann_ivf_index _,
    "ev_funnel" -> EventOps.ev_funnel _,
    "ev_retention" -> EventOps.ev_retention _,
    "ev_heavy_hitters" -> EventOps.ev_heavy_hitters _)

  pairs.foreach { case (key, dfForm) =>
    test(s"spark.sql($key) == DataFrame $key") {
      val sqlDf = SqlSurface.queries(s"sql_$key")(spark, sf001)
      val apiDf = dfForm(spark, sf001)
      assert(sqlDf.columns.toSeq == apiDf.columns.toSeq,
        s"column mismatch: ${sqlDf.columns.toSeq} vs ${apiDf.columns.toSeq}")
      val sqlRows = sqlDf.collect().toSeq
      val apiRows = apiDf.collect().toSeq
      assert(sqlRows == apiRows,
        s"row mismatch: sql ${sqlRows.size} rows vs api ${apiRows.size} rows")
    }
  }

  test("spark.sql(text_corpus_stats) == independent split-based DataFrame formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the SQL text counts tokens as spaces + 1 (length difference);
    // the DataFrame twin counts split-array elements — two genuinely
    // different token-count formulations that must agree on the
    // single-space-normalized corpus
    val sqlDf = SqlSurface.queries("sql_text_corpus_stats")(spark, sf001)
    val api = Tables.documents(spark, sf001)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split($"text", " ")).cast("long")).as("total_ws_tokens"),
        sum($"n_chars").as("total_chars"))
      .orderBy($"lang")
    assert(sqlDf.columns.toSeq == api.columns.toSeq,
      s"column mismatch: ${sqlDf.columns.toSeq} vs ${api.columns.toSeq}")
    val sqlRows = sqlDf.collect().toSeq
    assert(sqlRows.nonEmpty)
    assert(sqlRows == api.collect().toSeq)
  }

  test("sql_*_index views are dir-tagged: two dirs interleaved on one session") {
    // r18 advice: the index views used to be session-global names
    // rebound per call, which ASSUMED a strictly sequential single-dir
    // harness — two dirs interleaved on one session could cross-read.
    // Dir-tagged names remove the assumption: run the same sql_* index
    // query over two dirs interleaved, re-run the first, and require
    // (a) the re-run reproduces the first result exactly, (b) each
    // result equals its own dir's DataFrame form, and (c) BOTH dirs'
    // tagged views coexist in the catalog afterward (the old global
    // name could only ever point at one dir at a time).
    val q = SqlSurface.queries("sql_dedup_minhash_index")
    val a1 = q(spark, sf0001).collect().toSeq
    val b = q(spark, sf001).collect().toSeq
    val a2 = q(spark, sf0001).collect().toSeq
    assert(a1 == a2, "re-running dir1's SQL after dir2 changed its result")
    assert(a1 == Dedup.dedup_minhash_index(spark, sf0001).collect().toSeq)
    assert(b == Dedup.dedup_minhash_index(spark, sf001).collect().toSeq)
    val bandViews = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("mh_band_idx_")).toSet
    assert(bandViews.size >= 2,
      s"expected tagged band views for both dirs to coexist, got $bandViews")
  }

  test("spark.sql(ann_cos_range via graft_cosine) == DataFrame ann_cos_range") {
    // The graft-kernel SQL surface: the SQL text resolves the
    // extension-registered graft_cosine to the same codegen'd
    // CosineSimExpr the Column API plans, so rows must match exactly.
    val sqlDf = SqlSurface.queries("sql_ann_cos_range")(spark, sf001)
    val apiDf = Similarity.ann_cos_range(spark, sf001)
    assert(sqlDf.columns.toSeq == apiDf.columns.toSeq,
      s"column mismatch: ${sqlDf.columns.toSeq} vs ${apiDf.columns.toSeq}")
    val sqlRows = sqlDf.collect().toSeq
    val apiRows = apiDf.collect().toSeq
    assert(sqlRows.nonEmpty, "ann_cos_range SQL form returned no rows")
    assert(sqlRows == apiRows,
      s"row mismatch: sql ${sqlRows.size} rows vs api ${apiRows.size} rows")
  }
}
