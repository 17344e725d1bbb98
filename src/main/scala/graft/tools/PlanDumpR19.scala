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
      edges.join(ranks, edges("src") === ranks("node"))
        .join(outW, Seq("src"))
        .select($"dst", expr("rank * w div out_w").as("contrib"))
        .groupBy($"dst").agg(sum($"contrib").as("inflow"))
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

    spark.stop()
  }
}
