package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** §2.1b SQL-string surface. The reference's users reach Hops through
  * Hive/Spark SQL ("Spark runs on it just like standard Hadoop" —
  * reference README.md:7), so the engine must accept SQL text, not just
  * the Scala DataFrame API. Each query here registers the testdata
  * tables as temp views and runs the SAME ANSI SQL string that the
  * driver's DuckDB oracle executes — one dialect-neutral statement,
  * two engines, hash-compared results. That makes the SQL surface a
  * verified interface rather than a claim: parsing, analysis (views →
  * parquet scans with pushdown/pruning), and execution all go through
  * `spark.sql`, and SqlParitySpec additionally asserts each SQL form
  * returns exactly the DataFrame form's rows.
  *
  * Scale: `createOrReplaceTempView` is metadata-only (no
  * materialization); the SQL plans optimize through the same Catalyst
  * pipeline as the DataFrame forms — same pushdown, same broadcast
  * choices, same AQE.
  */
object SqlSurface {

  private val parquetTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  /** Last directory registered per session — view registration reads
    * ten parquet footers for schemas, so repeated queries against the
    * same dir skip it; a dir switch re-registers (views are
    * session-global names). */
  private val lastDir =
    java.util.Collections.synchronizedMap(new java.util.WeakHashMap[SparkSession, String]())

  /** Register every testdata table as a temp view on this session
    * (idempotent; events goes through Tables.events for the
    * nanos-timestamp conversion). The memo is updated only AFTER all
    * views register — a failure mid-registration must not leave the
    * session marked done with half its views missing — and the block is
    * serialized so a concurrent caller can't read a partial catalog. */
  def registerViews(s: SparkSession, d: String): Unit = lastDir.synchronized {
    if (lastDir.get(s) != d) {
      parquetTables.foreach(t => Tables.load(s, d, t).createOrReplaceTempView(t))
      Tables.events(s, d).createOrReplaceTempView("events")
      lastDir.put(s, d)
    }
  }

  /** The §2.1 queries whose oracle SQL is dialect-neutral enough to run
    * verbatim on Spark: aggregate (q1), EXISTS semijoin (q4), 6-way
    * star join (q5), ROLLUP (q11), HAVING + derived table (q18). */
  private val shared = Seq("q1_agg", "q4_semijoin", "q5_multijoin",
    "q11_rollup", "q18_having", "q24_setops", "q25_unpivot",
    "q26_grouping_sets", "q27_ntile")

  private def viaSql(relationalKey: String)(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(Relational.oracle(relationalKey))
  }

  /** The GRAFT KERNELS as a SQL-text surface: §2.6's range similarity
    * search written as a SQL string calling the extension-registered
    * `graft_cosine` (GraftExtensions — the same codegen'd
    * CosineSimExpr the Column API plans), run through `spark.sql` over
    * temp views and hash-compared against the DuckDB oracle's
    * list_cosine_similarity formulation. This is what proves the
    * extension functions are a production surface for the reference's
    * Hive/SQL-text persona (README.md:7), not an ExtensionsSpec-only
    * artifact: parse → resolve `graft_cosine` through the injected
    * function registry → broadcast the 16-query side → one corpus
    * scan. Same integer cos_ppm contract as [[Similarity
    * .ann_cos_range]] (floor once, no cross-engine rounding hazard). */
  private val graftCosRangeSql =
    """SELECT qid, nid, cos_ppm FROM (
      | SELECT q.vec_id AS qid, c.vec_id AS nid,
      |  CAST(floor(graft_cosine(q.embedding, c.embedding) * 1e6) AS BIGINT) AS cos_ppm
      | FROM embeddings q, embeddings c
      | WHERE q.vec_id < 16 AND c.vec_id <> q.vec_id)
      |WHERE cos_ppm >= 300000
      |ORDER BY qid, nid""".stripMargin

  private def sqlAnnCosRange(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(graftCosRangeSql)
  }

  /** CROSS-FAMILY SQL-text coverage: one query per operator family
    * whose oracle SQL is dialect-neutral enough to run VERBATIM on
    * both engines — dedup (md5 hash-groupBy), HopsFS metadata (du
    * rollup), MapReduce equivalents (repartition join), events
    * (tumbling-window agg). Together with the §2.1 relational five and
    * the graft-kernel query above, every §2 family a SQL-text user
    * would reach for is proven reachable through `spark.sql`, not just
    * the Scala API. Each entry is the module's own oracle string, so
    * the two surfaces can never drift. */
  /** TEXT-family coverage needs its own statement: every §2.7 oracle
    * leans on DuckDB-only constructs (HUGEINT ppm divisions, UBIGINT
    * md5 slicing, regexp_extract_all), so none runs verbatim on Spark.
    * This one is text analysis in dialect-neutral SQL: per-language
    * corpus accounting with a LENGTH-DIFFERENCE whitespace token count
    * (tokens = spaces + 1 — exact on this corpus because the documents
    * are single-space normalized; SqlParitySpec asserts it equals the
    * independent split-based DataFrame formulation, so the two token
    * definitions cannot silently drift). */
  private val textCorpusStatsSql =
    """SELECT lang, count(*) AS n_docs,
      | CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT) AS total_ws_tokens,
      | CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** LATERAL correlated subquery — the per-row dependent-subquery SQL
    * surface (top-3 customers per nation by balance): one
    * dialect-neutral statement both engines run verbatim. Spark
    * decorrelates the ORDER BY … LIMIT subquery into a per-nation
    * rank window (DecorrelateInnerQuery) — the same physical shape as
    * the DataFrame groupTopK — so the SQL persona pays no
    * nested-loop; the (acctbal DESC, custkey) LIMIT order is total,
    * making the row set engine-independent. */
  private val lateralTopkSql =
    """SELECT n.n_name, t.c_name, t.c_acctbal
      |FROM nation n,
      |LATERAL (SELECT c_name, c_acctbal FROM customer c
      |         WHERE c.c_nationkey = n.n_nationkey
      |         ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t
      |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin

  private val crossFamily: Seq[(String, String)] = Seq(
    "dedup_exact" -> Dedup.oracle("dedup_exact"),
    "fs_du" -> MetadataOps.oracle("fs_du"),
    "mr_join" -> MapReduceOps.oracle("mr_join"),
    "ev_window_agg" -> EventOps.oracle("ev_window_agg"),
    "lateral_topk" -> lateralTopkSql,
    "text_corpus_stats" -> textCorpusStatsSql,
    // r15: the multi-route ACCOUNTING as one dialect-neutral statement
    // (CASE routing + UNION ALL audit copy) — the SQL-surface view of
    // text_multi_route's routing rule; the DataFrame form additionally
    // materializes the splits, which SQL text alone cannot
    "text_multi_route" -> TextOps.oracle("text_multi_route"),
    // r16: three more event analytics verbatim through spark.sql —
    // the conversion funnel (conditional-min + sequencing HAVING),
    // its day-over-day retention sibling (INTERVAL day arithmetic,
    // both engines parse it), and the exact heavy-hitter readout
    "ev_funnel" -> EventOps.oracle("ev_funnel"),
    "ev_retention" -> EventOps.oracle("ev_retention"),
    "ev_heavy_hitters" -> EventOps.oracle("ev_heavy_hitters"))

  private def viaText(sql: String)(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(sql)
  }

  /** Substring-span dedup as pure SQL TEXT — the [[TextOps
    * .text_dup_spans]] semantics written the way a Hive/SQL-text user
    * would have to: the codegen'd positional gram kernel reached
    * through the extension-registered `graft_word_ngrams` via LATERAL
    * VIEW posexplode, the duplicated-gram set as a HAVING over a
    * distinct count, and the gaps-and-islands merge as named-window
    * lag/running-sum — no Scala anywhere. Hash-compared against the
    * same DuckDB oracle as the DataFrame form (which derives literal
    * grams by list slicing — two engines, two formulations, one
    * result), and SqlParitySpec asserts SQL ≡ DataFrame rows. Token
    * counts come from the gram positions (max(pos) + 8), the same
    * no-extra-scan identity the DataFrame form uses.
    *
    * Known cost of the single-statement form: Catalyst INLINES
    * deterministic CTEs, so the three references to `g` re-run the
    * gram pass three times (verified in the physical plan — three
    * Generates over three scans). The DataFrame form persists the
    * gram pass once via CacheRegistry and is the production path; a
    * SQL-text user at scale gets the same effect with CACHE TABLE
    * around the statement. This query exists to prove REACHABILITY
    * from the SQL persona, verified against the same oracle. */
  private val textDupSpansSql =
    """WITH g AS (
      | SELECT doc_id, p.pos, p.gm
      | FROM documents
      | LATERAL VIEW posexplode(graft_word_ngrams(text, 8)) p AS pos, gm),
      |dup AS (
      | SELECT gm FROM g GROUP BY gm HAVING count(DISTINCT doc_id) >= 2),
      |h AS (
      | SELECT g.doc_id, CAST(g.pos AS BIGINT) AS pos
      | FROM g JOIN dup USING (gm)),
      |isl AS (
      | SELECT doc_id, pos,
      |  CASE WHEN lag(pos) OVER w IS NULL OR pos - lag(pos) OVER w > 8
      |       THEN 1 ELSE 0 END AS ns
      | FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |sp AS (
      | SELECT doc_id, span_id, min(pos) AS st, max(pos) + 8 AS en
      | FROM (SELECT doc_id, pos,
      |        sum(ns) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
      |       FROM isl)
      | GROUP BY doc_id, span_id),
      |agg AS (
      | SELECT doc_id, count(*) AS n_spans, sum(en - st) AS dup_tokens,
      |  max(en - st) AS longest_span
      | FROM sp GROUP BY doc_id),
      |nt AS (
      | SELECT doc_id, CAST(max(pos) + 8 AS BIGINT) AS n_tokens
      | FROM g GROUP BY doc_id)
      |SELECT a.doc_id, n_spans, dup_tokens, longest_span,
      | dup_tokens * 1000000 div n_tokens AS dup_ppm
      |FROM agg a JOIN nt USING (doc_id)
      |ORDER BY a.doc_id""".stripMargin

  /** Degree-ordered triangle counting as pure SQL TEXT — the graph
    * family reached from the Hive/SQL-text persona (r16): the same
    * Suri–Vassilvitskii wedge algorithm as [[Graph.graph_triangles]],
    * written with `struct(...)` lexicographic comparisons where the
    * DuckDB oracle uses row-value tuples (the one dialect split; no
    * MATERIALIZED hints either — Spark has no equivalent), verified
    * against the identical oracle and gated SQL ≡ DataFrame in
    * SqlParitySpec. Known cost of the single-statement form, same as
    * [[textDupSpansSql]]: Catalyst inlines deterministic CTEs, so the
    * three `ed` references re-derive the oriented edge list — the
    * DataFrame form persists it once and [[Graph
    * .graph_triangles_index]] reads it prebuilt; this query exists to
    * prove REACHABILITY from SQL text. The wedge and closure joins
    * carry `/*+ SHUFFLE_HASH(...) */` hint comments — legal SQL
    * comments any engine ignores, read by Spark as join-strategy
    * pins: without them Catalyst sort-merges the closure probe and
    * SORTS the O(E^{3/2}) wedge stream (measured 56.3 → 42.3 s
    * min-of-2 at sf0.1/4 threads with the hints; the same lesson as
    * Graph.trianglesIndexPlan, reachable from the SQL persona).
    *
    * r19: e0 derives via the per-order sorted-array pair enumeration
    * (collect_set + nested-transform explode — HiveQL LATERAL VIEW,
    * exactly the persona's dialect), the same rewrite as
    * [[Graph.coSupplierEdges]]: the os self-join form paid two
    * lineitem scans + three Exchanges per inlined copy, and Catalyst
    * inlines e0 several times here; the array form pays one scan + one
    * Exchange per copy with the fan bounded by the order's ≤7 lines.
    * Identical e0 rows — the DuckDB oracle text is untouched and still
    * derives e0 via its self-join. */
  private val graphTrianglesSql =
    """WITH os AS (
      |  SELECT sort_array(collect_set(l_suppkey)) AS ss
      |  FROM lineitem GROUP BY l_orderkey),
      |e0 AS (
      |  SELECT p.u, p.v
      |  FROM os LATERAL VIEW explode(flatten(transform(ss, (x, i) ->
      |    transform(slice(ss, i + 2, size(ss)),
      |      y -> struct(x AS u, y AS v))))) t AS p
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |deg AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
      |    SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
      |  GROUP BY 1),
      |ed AS (
      |  SELECT
      |    CASE WHEN fwd THEN u ELSE v END AS src,
      |    CASE WHEN fwd THEN v ELSE u END AS dst,
      |    CASE WHEN fwd THEN dv ELSE du END AS ddeg
      |  FROM (
      |    SELECT e0.u, e0.v, du.deg AS du, dv.deg AS dv,
      |      du.deg < dv.deg OR (du.deg = dv.deg AND e0.u < e0.v) AS fwd
      |    FROM e0
      |    JOIN deg du ON e0.u = du.node
      |    JOIN deg dv ON e0.v = dv.node)),
      |wedges AS (
      |  SELECT /*+ SHUFFLE_HASH(e1) */ e1.src AS a, e1.dst AS x, e2.dst AS y
      |  FROM ed e1 JOIN ed e2
      |    ON e1.src = e2.src
      |    AND (e1.ddeg < e2.ddeg
      |      OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst))),
      |tri AS (
      |  SELECT /*+ SHUFFLE_HASH(e) */ w.a, w.x, w.y
      |  FROM wedges w JOIN ed e ON w.x = e.src AND w.y = e.dst)
      |SELECT node AS s_suppkey, CAST(count(*) AS BIGINT) AS n_triangles
      |FROM tri LATERAL VIEW explode(array(a, x, y)) t AS node
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Triangle counting from the SQL persona SERVED FROM THE PERSISTED
    * INDEX (r17 — the production path [[graphTrianglesSql]] is the
    * reachability proof for): the oriented edge tables
    * [[Graph.graph_triangles_index]] builds are exposed as the
    * `tri_wedge_idx` / `tri_close_idx` views and the statement is just
    * the wedge self-join + closure probe — the expensive derivation
    * (co-occurrence self-join + degree orientation) that Catalyst
    * re-inlined 3× in the single-statement form is paid once at build
    * and never appears in the SQL plan. Same SHUFFLE_HASH comment-hint
    * pins as the DataFrame form (never sort the O(E^{3/2}) wedge
    * stream; both wedge legs and the closure probe read their
    * bucketed layouts Exchange-free). Carries graph_triangles' oracle
    * verbatim; SqlParitySpec gates SQL ≡ DataFrame-index parity.
    *
    * The per-node readout is a LATERAL VIEW explode (HiveQL — exactly
    * the dialect the persona speaks), NOT the oracle's three-way
    * UNION ALL over `tri`: Catalyst inlines deterministic CTEs, so
    * the UNION ALL form re-derives the wedge+closure joins three
    * times (measured 9.1 vs 5.6 s for the DataFrame form at
    * sf0.1/32t); the explode reads `tri` once, like the DataFrame
    * form's explode(array(a, x, y)). */
  private def graphTrianglesIndexSql(wedgeView: String, closeView: String) =
    s"""WITH wedges AS (
      |  SELECT /*+ SHUFFLE_HASH(e1) */ e1.src AS a, e1.dst AS x, e2.dst AS y
      |  FROM $wedgeView e1 JOIN $wedgeView e2
      |    ON e1.src = e2.src
      |    AND (e1.ddeg < e2.ddeg
      |      OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst))),
      |tri AS (
      |  SELECT /*+ SHUFFLE_HASH(e) */ w.a, w.x, w.y
      |  FROM wedges w JOIN $closeView e ON w.x = e.src AND w.y = e.dst)
      |SELECT node AS s_suppkey, CAST(count(*) AS BIGINT) AS n_triangles
      |FROM tri LATERAL VIEW explode(array(a, x, y)) t AS node
      |GROUP BY 1 ORDER BY 1""".stripMargin

  private def sqlGraphTrianglesIndex(s: SparkSession, d: String): DataFrame = {
    val (wedgeView, closeView) = Graph.triIndexViews(s, d)
    s.sql(graphTrianglesIndexSql(wedgeView, closeView))
  }

  /** Keyword search from the SQL persona SERVED FROM THE PERSISTED
    * POSTINGS INDEX (r17 — with [[graphTrianglesIndexSql]] this closes
    * the r16 "SQL access to the index families" gap on the text
    * tier): the statement is exactly the production search —
    * document frequencies aggregated on the term-BUCKETED view (no
    * Exchange), the tiny query×term weight table broadcast-pinned
    * into the candidate fetch, integer idf-ratio ppm weights with the
    * same 10^12 cap. Corpus N is baked in as a literal by the caller
    * (parquet-footer count — the same no-scan source the DataFrame
    * form uses). Carries text_search_index's oracle verbatim;
    * SqlParitySpec gates SQL ≡ DataFrame parity. */
  private def textSearchIndexSql(n: Long, idxView: String): String =
    s"""WITH q AS (
       |  SELECT CAST(query_id AS BIGINT) AS query_id, term
       |  FROM VALUES (0, 'spark'), (0, 'join'), (1, 'window'),
       |       (1, 'stream'), (1, 'sort'), (2, 'customer'), (2, 'merge')
       |       AS t(query_id, term)),
       |dfreq AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df
       |  FROM $idxView GROUP BY 1),
       |w AS (
       |  SELECT query_id, q.term,
       |    least(1000000000000L,
       |      (${n}L div df) * 1000000 + ((${n}L % df) * 1000000) div df) AS w_ppm
       |  FROM q JOIN dfreq ON q.term = dfreq.term),
       |scored AS (
       |  SELECT /*+ BROADCAST(w) */ query_id, doc_id,
       |    sum(tf * w_ppm) AS score_ppm, count(*) AS terms_hit
       |  FROM $idxView i JOIN w ON i.term = w.term
       |  GROUP BY 1, 2)
       |SELECT query_id, rank, doc_id, score_ppm, terms_hit FROM (
       |  SELECT query_id, doc_id, score_ppm, terms_hit,
       |    row_number() OVER (
       |      PARTITION BY query_id ORDER BY score_ppm DESC, doc_id) AS rank
       |  FROM scored)
       |WHERE rank <= 10
       |ORDER BY query_id, rank""".stripMargin

  private def sqlTextSearchIndex(s: SparkSession, d: String): DataFrame = {
    val idxView = TextOps.searchIndexView(s, d)
    s.sql(textSearchIndexSql(Tables.parquetRowCount(s, d, "documents"), idxView))
  }

  /** The LSH dedup probe from the SQL persona SERVED FROM THE
    * PERSISTED BAND + SIGNATURE INDEX (r17 — the dedup tier of the
    * same gap): one statement reproducing [[Dedup.dedup_minhash_index]]
    * end to end through the extension-registered kernels — delta
    * signatures via `graft_minhash_sig(graft_word_ngram_hashes(…))`,
    * band keys via `graft_fnv64_fold` over signature slices (the
    * exact band hash the index was built with), candidate buckets as
    * a MERGE-pinned semi-join on the bucketed (band, bkey) layout
    * (zero corpus-side Exchange — only delta-touched buckets leave
    * the scan), pair enumeration as a double LATERAL VIEW explode of
    * bucket members under the size-2..cap / has-delta gates, and
    * rescore against the doc_id-bucketed signature view with the
    * zip_with/aggregate agreement count. The bucket cap is spliced
    * from the same conf key the batch form reads
    * (`graft.dedup.maxBucket`, default 1000) so SQL/DataFrame parity
    * survives a conf override — the r17 literal silently diverged if
    * the conf moved (the DuckDB oracle still hardcodes the default;
    * an override is a perf knob for embedding pipelines, not an
    * oracle path). Known single-statement cost, accepted: the `delta`
    * CTE is referenced three times and Catalyst inlines it, so the
    * delta slice's signatures compute thrice — delta-sized work (the
    * corpus-side band scan still happens once); the DataFrame form
    * caches the slice instead. Carries dedup_minhash_index's oracle
    * verbatim; SqlParitySpec gates SQL ≡ DataFrame parity. */
  private def dedupMinhashIndexSql(cap: Int, bandView: String, sigView: String): String =
    s"""WITH delta AS (
      |  SELECT doc_id,
      |    graft_minhash_sig(graft_word_ngram_hashes(text, 3), 32) AS sig
      |  FROM documents WHERE doc_id % 10 = 0),
      |dk AS (
      |  SELECT doc_id, band,
      |    graft_fnv64_fold(slice(sig, band * 4 + 1, 4)) AS bkey
      |  FROM delta LATERAL VIEW explode(sequence(0, 7)) t AS band),
      |hits AS (
      |  SELECT /*+ MERGE(b) */ b.band, b.bkey, b.doc_id, 0 AS flag
      |  FROM $bandView b LEFT SEMI JOIN (
      |    SELECT DISTINCT band, bkey FROM dk) p
      |    ON b.band = p.band AND b.bkey = p.bkey),
      |members AS (
      |  SELECT band, bkey, doc_id, flag FROM hits
      |  UNION ALL
      |  SELECT band, bkey, doc_id, 2 AS flag FROM dk),
      |buckets AS (
      |  SELECT band, bkey, collect_list(struct(doc_id, flag)) AS ms
      |  FROM members GROUP BY 1, 2
      |  HAVING count(*) BETWEEN 2 AND $cap AND max(flag) = 2),
      |pairs AS (
      |  SELECT DISTINCT
      |    CASE WHEN a.flag >= 1 THEN a.doc_id ELSE b.doc_id END AS probe_id,
      |    CASE WHEN a.flag >= 1 THEN b.doc_id ELSE a.doc_id END AS match_id,
      |    CASE WHEN least(a.flag, b.flag) >= 1 THEN 'delta' ELSE 'base' END
      |      AS match_src
      |  FROM buckets
      |  LATERAL VIEW explode(ms) ta AS a
      |  LATERAL VIEW explode(ms) tb AS b
      |  WHERE a.doc_id < b.doc_id AND greatest(a.flag, b.flag) = 2),
      |scored AS (
      |  SELECT /*+ MERGE(sg) */ p.probe_id, p.match_id, p.match_src,
      |    CAST(aggregate(zip_with(d.sig, coalesce(sg.sig, d2.sig),
      |        (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END),
      |      0, (acc, v) -> acc + v) AS DOUBLE) / 32 AS ej
      |  FROM pairs p
      |  JOIN delta d ON p.probe_id = d.doc_id
      |  LEFT JOIN $sigView sg ON p.match_id = sg.doc_id
      |  LEFT JOIN delta d2 ON p.match_id = d2.doc_id)
      |SELECT probe_id, match_id, match_src, round(ej, 4) AS est_jaccard
      |FROM scored WHERE ej >= 0.5
      |ORDER BY probe_id, match_id""".stripMargin

  private def sqlDedupMinhashIndex(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    val (bandView, sigView) = Dedup.mhIndexViews(s, d)
    // Defensive parse (r18 advice): the value is string-interpolated
    // into SQL text, so reject anything that isn't a positive integer
    // rather than letting a malformed conf throw a bare
    // NumberFormatException (or worse, alter the statement), and say
    // loudly when an override diverges from the DuckDB oracle's
    // hardcoded 1000 — the hash gate WILL fail in that configuration
    // (a perf knob for embedding pipelines, not an oracle path).
    val raw = s.conf.get("graft.dedup.maxBucket", "1000")
    val cap = raw.toIntOption.filter(_ > 0).getOrElse(sys.error(
      s"graft.dedup.maxBucket must be a positive integer, got '$raw'"))
    if (cap != 1000) System.err.println(
      s"[graft] WARNING graft.dedup.maxBucket=$cap diverges from the " +
        "DuckDB oracle's hardcoded 1000 — sql_dedup_minhash_index hash " +
        "verification will not match under this override")
    s.sql(dedupMinhashIndexSql(cap, bandView, sigView))
  }

  /** VECTOR SEARCH from the SQL persona SERVED FROM THE PERSISTED IVF
    * INDEX (r18 — the last index tier without a SQL statement): one
    * query reproducing [[Similarity.ann_ivf_index]] end to end — the
    * trained coarse-quantizer centroids baked into the statement as
    * literals (each double rendered shortest-repr and string-cast, an
    * exact round-trip, so the SQL probe ranking computes the SAME
    * doubles as the DataFrame form's codegen'd literal argmin through
    * the SAME registered `graft_cosine` kernel), probe cells as a
    * sorted-slice over the centroid struct array (lexicographic
    * (dist, cid) — identical tie-breaking), the candidate join
    * MERGE-pinned on the index's cell-bucketed layout (zero
    * corpus-side Exchange — only the 16-query probe side exchanges),
    * exact-cosine rescore and per-query top-5 window. Built per call
    * from the memo'd centroids (the statement depends on the trained
    * model, so there is no static string); carries ann_ivf_index's
    * literal-replay DuckDB oracle verbatim; SqlParitySpec gates
    * SQL ≡ DataFrame parity. */
  private def annIvfIndexSql(cents: Array[Array[Double]], nprobe: Int,
      idxView: String): String = {
    val cl = cents
      .map(_.map(x => s"CAST('$x' AS DOUBLE)").mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")
    s"""WITH q AS (
       |  SELECT vec_id AS qid, CAST(embedding AS ARRAY<DOUBLE>) AS qvec
       |  FROM embeddings WHERE vec_id < 16),
       |pr AS (
       |  SELECT qid, qvec, p.cid AS cell
       |  FROM (
       |    SELECT qid, qvec,
       |      slice(array_sort(transform(sequence(0, ${cents.length - 1}),
       |        cid -> named_struct(
       |          'dist', CAST(1.0 AS DOUBLE) - graft_cosine(qvec, $cl[cid]),
       |          'cid', cid))), 1, $nprobe) AS probes
       |    FROM q)
       |  LATERAL VIEW explode(probes) t AS p),
       |scored AS (
       |  SELECT /*+ MERGE(i) */ pr.qid, i.nid,
       |    graft_cosine(pr.qvec, i.nvec) AS cos
       |  FROM $idxView i JOIN pr ON i.cell = pr.cell
       |  WHERE i.nid <> pr.qid)
       |SELECT qid, rank, nid, round(cos, 6) AS cos_sim FROM (
       |  SELECT qid, nid, cos,
       |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored)
       |WHERE rank <= 5
       |ORDER BY qid, rank""".stripMargin
  }

  private def sqlAnnIvfIndex(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    val (idxView, cents) = Similarity.ivfIndexViews(s, d)
    s.sql(annIvfIndexSql(cents, nprobe = 8, idxView))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    shared.map(k => s"sql_$k" -> viaSql(k) _).toMap ++
      crossFamily.map { case (k, sql) => s"sql_$k" -> viaText(sql) _ } +
      ("sql_ann_cos_range" -> (sqlAnnCosRange _)) +
      ("sql_text_dup_spans" -> (viaText(textDupSpansSql) _)) +
      ("sql_graph_triangles" -> (viaText(graphTrianglesSql) _)) +
      ("sql_graph_triangles_index" -> (sqlGraphTrianglesIndex _)) +
      ("sql_text_search_index" -> (sqlTextSearchIndex _)) +
      ("sql_dedup_minhash_index" -> (sqlDedupMinhashIndex _)) +
      ("sql_ann_ivf_index" -> (sqlAnnIvfIndex _))

  // def, not val: sql_ann_ivf_index carries ann_ivf_index's
  // literal-replay oracle, which renders over THIS run's trained
  // centroids and so exists only after the query has executed
  // (Verify/VerifySubset run every query before dumping oracle SQL;
  // absent a run the entry is omitted → rows-only, never stale).
  def oracle: Map[String, String] =
    shared.map(k => s"sql_$k" -> Relational.oracle(k)).toMap ++
      crossFamily.map { case (k, sql) => s"sql_$k" -> sql } +
      ("sql_ann_cos_range" -> Similarity.oracle("ann_cos_range")) +
      ("sql_text_dup_spans" -> TextOps.oracle("text_dup_spans")) +
      ("sql_graph_triangles" -> Graph.oracle("graph_triangles")) +
      ("sql_graph_triangles_index" -> Graph.oracle("graph_triangles")) +
      ("sql_text_search_index" -> TextOps.oracle("text_search_index")) +
      ("sql_dedup_minhash_index" -> Dedup.oracle("dedup_minhash_index")) ++
      Similarity.oracle.get("ann_ivf_index")
        .map("sql_ann_ivf_index" -> _)
}
