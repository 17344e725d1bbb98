package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev tool (not library surface): writes the `.explain("formatted")`
  * output for every query the r19 optimization round touched to
  * plans/r19/<query>_{before,after}.txt.
  *
  * "after" plans come from the LIVE code paths (the `*InflightPlan` /
  * `*InflightRoundPlan` / `*IndexPlan` handles in the operators — the
  * registered queries materialize per stage, so their final explain is
  * a LogicalRDD scan; the handles expose the pre-materialization
  * composition over the same cached layouts the queries build).
  * "before" plans are FROZEN COPIES of the pre-r19 compositions
  * (HEAD a3a1184), replicated inline here so both sides of each diff
  * are produced by one binary on one session.
  */
object PlanDumpR19 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = new java.io.File(
      if (args.length > 1) args(1) else "plans/r19")
    outDir.mkdirs()

    // the real loops rebind their node state through a LogicalRDD
    // (rebind in Graph.scala) which erases stats — replicate so the
    // before-plans join the same way the real rounds do
    def rebind(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema)

    def dump(name: String)(df: => DataFrame): Unit = {
      graft.CacheRegistry.releaseAll(); spark.catalog.clearCache()
      val frame = df
      val txt = frame.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val f = new java.io.File(outDir, s"$name.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.println(txt) finally w.close()
      println(s"[plandump] wrote ${f.getPath}")
      graft.CacheRegistry.releaseAll(); spark.catalog.clearCache()
    }

    // ── frozen pre-r19 building blocks ────────────────────────────────
    // co-supplier support-≥2 edges via the os self-join (pre-r19)
    def e0SuppOld: DataFrame = {
      val os = graft.Tables.lineitem(spark, d)
        .select($"l_orderkey".as("ok"), $"l_suppkey".as("sk")).distinct()
      os.as("a").join(os.as("b"),
          $"a.ok" === $"b.ok" && $"a.sk" < $"b.sk")
        .groupBy($"a.sk".as("u"), $"b.sk".as("v"))
        .agg(count(lit(1)).as("support"))
        .filter($"support" >= 2)
        .select($"u", $"v")
    }
    // part co-purchase distinct edges via the os self-join (pre-r19)
    def e0PartOld: DataFrame = {
      val os = graft.Tables.lineitem(spark, d)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk")).distinct()
      os.as("a").join(os.as("b"),
          $"a.ok" === $"b.ok" && $"a.pk" < $"b.pk")
        .select($"a.pk".as("u"), $"b.pk".as("v")).distinct()
    }
    def orientedOld: DataFrame = {
      val e0 = e0SuppOld
      val deg = e0.select(explode(array($"u", $"v")).as("node"))
        .groupBy($"node").agg(count(lit(1)).as("deg"))
      e0
        .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), Seq("u"))
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), Seq("v"))
        .select(
          when(struct($"du", $"u") < struct($"dv", $"v"), $"u").otherwise($"v").as("src"),
          when(struct($"du", $"u") < struct($"dv", $"v"), $"v").otherwise($"u").as("dst"),
          when(struct($"du", $"u") < struct($"dv", $"v"), $"dv").otherwise($"du").as("ddeg"))
    }

    // ── graph_triangles: unhinted joins over the (src,dst)-grouped
    // cache vs SHJ pins over the hash(src) cache ─────────────────────
    dump("graph_triangles_before") {
      val ed = graft.CacheRegistry.cache(orientedOld)
      val wedges = ed.as("e1").join(ed.as("e2"),
          $"e1.src" === $"e2.src" &&
            struct($"e1.ddeg", $"e1.dst") < struct($"e2.ddeg", $"e2.dst"))
        .select($"e1.src".as("a"), $"e1.dst".as("x"), $"e2.dst".as("y"))
      val closing = ed.select($"src".as("cs"), $"dst".as("cd"))
      val tri = wedges.join(closing, $"x" === $"cs" && $"y" === $"cd")
        .select($"a", $"x", $"y")
      tri.select(explode(array($"a", $"x", $"y")).as("s_suppkey"))
        .groupBy($"s_suppkey").agg(count(lit(1)).as("n_triangles"))
        .orderBy($"s_suppkey")
    }
    dump("graph_triangles_after") {
      graft.operators.Graph.trianglesInflightPlan(spark, d)
    }

    // ── one LPA vote round: unpartitioned adjacency cache vs the
    // nbr-keyed sorted cache (graph_label_prop + graph_modularity) ───
    dump("graph_label_prop_before") {
      val e0 = e0SuppOld
      val adj = graft.CacheRegistry.cache(
        e0.select($"u".as("node"), $"v".as("nbr"))
          .union(e0.select($"v".as("node"), $"u".as("nbr"))))
      val labels = rebind(graft.CacheRegistry.cache(
        adj.select($"node").distinct().withColumn("label", $"node")))
      adj.join(labels.select($"node".as("nbr"), $"label"), "nbr")
        .groupBy($"node", $"label").agg(count(lit(1)).as("cnt"))
    }
    dump("graph_label_prop_after") {
      graft.operators.Graph.lpaInflightRoundPlan(spark, d)
    }

    // ── one BFS relaxation round ─────────────────────────────────────
    dump("graph_bfs_layers_before") {
      val e0 = e0SuppOld
      val adj = graft.CacheRegistry.cache(
        e0.select($"u".as("node"), $"v".as("nbr"))
          .union(e0.select($"v".as("node"), $"u".as("nbr"))))
      val state = rebind(graft.CacheRegistry.cache(
        adj.select($"node").distinct()
          .filter($"node" % 10 === 0)
          .select($"node", lit(0L).as("dist"), $"node".as("seed"))))
      adj.join(state.select($"node".as("nbr"), ($"dist" + 1L).as("dist"),
          $"seed"), "nbr")
        .select($"node", $"dist", $"seed", lit(false).as("own"))
        .union(state.withColumn("own", lit(true)))
        .groupBy($"node")
        .agg(min(struct($"dist", $"seed")).as("m"),
          min(when($"own", struct($"dist", $"seed"))).as("old"))
    }
    dump("graph_bfs_layers_after") {
      graft.operators.Graph.bfsInflightRoundPlan(spark, d)
    }

    // ── one pagerank inflow round: edges cached with the groupBy's
    // (src,dst) partitioning vs hash(src)+sorted, outW co-partitioned ─
    dump("graph_pagerank_before") {
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val ev = graft.Tables.events(spark, d)
        .select($"user_id", $"ts", $"event_id",
          get_json_object($"props", "$.k").cast("long").as("page"))
      val edges = graft.CacheRegistry.cache(
        ev.withColumn("next_page", lead($"page", 1).over(w))
          .filter($"next_page".isNotNull && $"next_page" =!= $"page")
          .groupBy($"page".as("src"), $"next_page".as("dst"))
          .agg(count(lit(1)).as("w")))
      val outW = graft.CacheRegistry.cache(
        edges.groupBy($"src").agg(sum($"w").as("out_w")))
      val ranks = rebind(graft.CacheRegistry.cache(
        edges.select($"src".as("node")).distinct()
          .withColumn("rank", lit(1000000000L))))
      val inflow = edges.join(ranks, edges("src") === ranks("node"))
        .join(outW, Seq("src"))
        .select($"dst", expr("rank * w div out_w").as("contrib"))
        .groupBy($"dst").agg(sum($"contrib").as("inflow"))
      val dangling = ranks
        .join(outW, ranks("node") === outW("src"), "left_anti")
        .agg(coalesce(sum($"rank"), lit(0L)).as("dang"))
      val old = ranks.select($"node", $"rank".as("old"))
      old.join(inflow, old("node") === inflow("dst"), "left")
        .crossJoin(broadcast(dangling))
        .select(old("node"),
          (lit(150000000L) +
            expr("85 * (coalesce(inflow, 0L) + dang div 1000L) div 100")
          ).as("rank"))
    }
    dump("graph_pagerank_after") {
      graft.operators.Graph.pagerankInflightRoundPlan(spark, d)
    }

    // ── one k-core decrement round ───────────────────────────────────
    dump("graph_kcore_before") {
      val e0 = e0PartOld
      val adj = graft.CacheRegistry.cache(
        e0.select($"u".as("node"), $"v".as("nbr"))
          .union(e0.select($"v".as("node"), $"u".as("nbr"))))
      val deg0 = rebind(graft.CacheRegistry.cache(
        adj.groupBy($"node").agg(count(lit(1)).as("deg"))
          .withColumn("rm", $"deg" < 65)))
      val drops = adj
        .join(broadcast(deg0.filter($"rm").select($"node".as("nbr"))), Seq("nbr"))
        .groupBy($"node").agg(count(lit(1)).as("dropped"))
      deg0.filter(!$"rm")
        .join(drops, Seq("node"), "left")
        .select($"node", ($"deg" - coalesce($"dropped", lit(0L))).as("deg"))
    }
    dump("graph_kcore_after") {
      graft.operators.Graph.kcoreInflightRoundPlan(spark, d)
    }

    // ── jaccard links: full composition ──────────────────────────────
    dump("graph_jaccard_links_before") {
      val e0 = graft.CacheRegistry.cache(e0PartOld)
      val adj = e0.select($"u".as("node"), $"v".as("nbr"))
        .union(e0.select($"v".as("node"), $"u".as("nbr")))
      val deg = adj.groupBy($"node").agg(count(lit(1)).as("deg"))
      val fanCap = 32
      val centers = adj
        .withColumn("rn", row_number().over(
          Window.partitionBy($"node").orderBy($"nbr")))
        .filter($"rn" <= fanCap).drop("rn")
      val fans = centers.groupBy($"node")
        .agg(sort_array(collect_list($"nbr")).as("ns"))
      val common = fans.select(explode(expr(
          "flatten(transform(ns, (x, i) -> " +
            "transform(slice(ns, i + 2, size(ns)), y -> struct(x AS u, y AS v))))"
        )).as("p"))
        .groupBy($"p.u".as("u"), $"p.v".as("v"))
        .agg(count(lit(1)).as("common"))
        .join(e0, Seq("u", "v"), "left_anti")
      common
        .join(deg.select($"node".as("u"), $"deg".as("du")), Seq("u"))
        .join(deg.select($"node".as("v"), $"deg".as("dv")), Seq("v"))
        .select($"u", $"v", $"common",
          expr("1000000 * common div (du + dv - common)").as("jaccard_ppm"))
        .orderBy($"jaccard_ppm".desc, $"common".desc, $"u", $"v")
        .limit(100)
    }
    dump("graph_jaccard_links_after") {
      graft.operators.Graph.jaccardInflightPlan(spark, d)
    }

    // ── triangles index: struct-compare wedge join (pre-r19) vs the
    // live SHJ + expanded-boolean plan over the same bucketed tables ─
    dump("graph_triangles_index_before") {
      val (wedgeTbl, closeTbl) = {
        // same dir-tagged names the builder uses
        val tag = graft.operators.IndexUtil.dirTag(d)
        (s"tri_edges_$tag", s"tri_close_$tag")
      }
      // ensure built
      graft.operators.Graph.trianglesIndexPlan(spark, d)
      val ed = spark.table(wedgeTbl)
      val wedges = ed.as("e1").hint("shuffle_hash").join(ed.as("e2"),
          $"e1.src" === $"e2.src" &&
            struct($"e1.ddeg", $"e1.dst") < struct($"e2.ddeg", $"e2.dst"))
        .select($"e1.src".as("a"), $"e1.dst".as("x"), $"e2.dst".as("y"))
      val closing = spark.table(closeTbl)
        .select($"src".as("cs"), $"dst".as("cd"))
      val tri = closing.hint("shuffle_hash")
        .join(wedges, $"x" === $"cs" && $"y" === $"cd")
        .select($"a", $"x", $"y")
      tri.select(explode(array($"a", $"x", $"y")).as("s_suppkey"))
        .groupBy($"s_suppkey").agg(count(lit(1)).as("n_triangles"))
        .orderBy($"s_suppkey")
    }
    dump("graph_triangles_index_after") {
      graft.operators.Graph.trianglesIndexPlan(spark, d)
    }

    // ── SQL persona forms: registered queries return the un-
    // materialized spark.sql frame, so the AFTER plans are the live
    // code paths; BEFORE replicates the pre-r19 statement texts ──────
    val sqlTriBefore =
      """WITH os AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
        |e0 AS (
        |  SELECT a.sk AS u, b.sk AS v
        |  FROM os a JOIN os b ON a.ok = b.ok AND a.sk < b.sk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
        |  GROUP BY 1),
        |ed AS (
        |  SELECT
        |    CASE WHEN struct(du.deg, e0.u) < struct(dv.deg, e0.v)
        |         THEN e0.u ELSE e0.v END AS src,
        |    CASE WHEN struct(du.deg, e0.u) < struct(dv.deg, e0.v)
        |         THEN e0.v ELSE e0.u END AS dst,
        |    CASE WHEN struct(du.deg, e0.u) < struct(dv.deg, e0.v)
        |         THEN dv.deg ELSE du.deg END AS ddeg
        |  FROM e0
        |  JOIN deg du ON e0.u = du.node
        |  JOIN deg dv ON e0.v = dv.node),
        |wedges AS (
        |  SELECT /*+ SHUFFLE_HASH(e1) */ e1.src AS a, e1.dst AS x, e2.dst AS y
        |  FROM ed e1 JOIN ed e2
        |    ON e1.src = e2.src
        |    AND struct(e1.ddeg, e1.dst) < struct(e2.ddeg, e2.dst)),
        |tri AS (
        |  SELECT /*+ SHUFFLE_HASH(e) */ w.a, w.x, w.y
        |  FROM wedges w JOIN ed e ON w.x = e.src AND w.y = e.dst)
        |SELECT node AS s_suppkey, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM tri LATERAL VIEW explode(array(a, x, y)) t AS node
        |GROUP BY 1 ORDER BY 1""".stripMargin
    dump("sql_graph_triangles_before") {
      graft.operators.SqlSurface.registerViews(spark, d)
      spark.sql(sqlTriBefore)
    }
    dump("sql_graph_triangles_after") {
      graft.SparkEntry.queries("sql_graph_triangles")(spark, d)
    }
    dump("sql_graph_triangles_index_after") {
      graft.SparkEntry.queries("sql_graph_triangles_index")(spark, d)
    }

    // ── ann_knn_graph: both-directions candidate enumeration (pre-
    // r19) vs the live halved enumeration + post-score mirror. Both
    // sides replicate the composition pre-materialization (the
    // registered query materializes its result). ───────────────────
    def knnSetup(): (org.apache.spark.sql.DataFrame, Long) = {
      val planes = graft.functions.VectorFunctions.randomPlanes(64, 64)
      val e = graft.CacheRegistry.cache(graft.Tables.embeddings(spark, d)
        .select($"vec_id", $"embedding",
          graft.functions.VectorFunctions
            .hyperplaneSignature($"embedding", planes).as("sig")))
      (e, (1L << 4) - 1)
    }
    def knnBands(e: org.apache.spark.sql.DataFrame, mask: Long): DataFrame = {
      val keys = (0 until 16).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned($"sig", b * 4).bitwiseAND(lit(mask)).as("bkey"))
      }
      val bk = e.select($"vec_id", explode(array(keys: _*)).as("bk"))
        .select($"vec_id", $"bk.band".as("band"), $"bk.bkey".as("bkey"))
      val okBuckets = bk.groupBy($"band", $"bkey")
        .agg(count(lit(1)).as("n")).filter($"n" <= 500L)
        .select($"band", $"bkey")
      bk.join(okBuckets, Seq("band", "bkey"), "left_semi")
    }
    dump("ann_knn_graph_before") {
      val (e, mask) = knnSetup()
      val capped = knnBands(e, mask)
      val cand = capped.as("a").join(capped.as("b"),
          $"a.band" === $"b.band" && $"a.bkey" === $"b.bkey" &&
            $"a.vec_id" =!= $"b.vec_id")
        .select($"a.vec_id".as("nid"), $"b.vec_id".as("nbr")).distinct()
      val scored = cand
        .join(e.select($"vec_id".as("nid"), $"embedding".as("v1")), "nid")
        .join(e.select($"vec_id".as("nbr"), $"embedding".as("v2")), "nbr")
        .select($"nid", $"nbr",
          floor(graft.functions.VectorFunctions.cosine($"v1", $"v2") * 1e6)
            .cast("long").as("cos_ppm"))
      scored.withColumn("rank", row_number().over(
          Window.partitionBy($"nid").orderBy($"cos_ppm".desc, $"nbr")))
        .filter($"rank" <= 5)
        .select($"nid", $"rank", $"nbr", $"cos_ppm")
    }
    dump("ann_knn_graph_after") {
      val (e, mask) = knnSetup()
      val capped = knnBands(e, mask)
      val cand = capped.as("a").join(capped.as("b"),
          $"a.band" === $"b.band" && $"a.bkey" === $"b.bkey" &&
            $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id".as("nid"), $"b.vec_id".as("nbr")).distinct()
      val scoredHalf = graft.CacheRegistry.cache(cand
        .join(e.select($"vec_id".as("nid"), $"embedding".as("v1")), "nid")
        .join(e.select($"vec_id".as("nbr"), $"embedding".as("v2")), "nbr")
        .select($"nid", $"nbr",
          floor(graft.functions.VectorFunctions.cosine($"v1", $"v2") * 1e6)
            .cast("long").as("cos_ppm")))
      val scored = scoredHalf.unionByName(
        scoredHalf.select($"nbr".as("nid"), $"nid".as("nbr"), $"cos_ppm"))
      scored.withColumn("rank", row_number().over(
          Window.partitionBy($"nid").orderBy($"cos_ppm".desc, $"nbr")))
        .filter($"rank" <= 5)
        .select($"nid", $"rank", $"nbr", $"cos_ppm")
    }

    spark.stop()
  }
}
