package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev tool (not library surface): writes the `.explain("formatted")`
  * output for every query path the r20 optimization round touched to
  * plans/r20/<query>_{before,after}.txt.
  *
  * "after" plans come from the LIVE code paths (the in-flight plan
  * handles / the registered queries' pre-materialization frames).
  * "before" plans are FROZEN COPIES of the r19-HEAD (ef54be9)
  * compositions, replicated inline so both sides of each diff are
  * produced by one binary on one session. Two deliberate deviations
  * from r19 HEAD in the before-forms, so each diff isolates exactly
  * the r20 change:
  *  - the superstep-round before-forms use a FAITHFUL node state (the
  *    real loops always did) with the OLD partitioning-erasing rebind
  *    (`createDataFrame(df.rdd, schema)`), isolating the r20
  *    Rebind.preserving change;
  *  - the triangles/jaccard before-forms materialize nothing (exactly
  *    r19 HEAD), so the diff shows what materialize-before-compose
  *    plus the packed closure key buy.
  */
object PlanDumpR20 {
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
      if (args.length > 1) args(1) else "plans/r20")
    outDir.mkdirs()

    // the PRE-r20 rebind: partitioning-erasing Row round-trip
    def rebindOld(df: DataFrame): DataFrame =
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

    // ── graph_triangles: r19 HEAD (unmaterialized cache, two-key
    // closure probe) vs materialized cache + packed single-key probe ─
    dump("graph_triangles_before") {
      val ed = graft.CacheRegistry.cache(
        graft.operators.Graph.orientedCoSupplierEdges(spark, d)
          .repartition($"src"))
      val wedges = ed.as("e1").hint("shuffle_hash").join(ed.as("e2"),
          $"e1.src" === $"e2.src" &&
            ($"e1.ddeg" < $"e2.ddeg" ||
              ($"e1.ddeg" === $"e2.ddeg" && $"e1.dst" < $"e2.dst")))
        .select($"e1.src".as("a"), $"e1.dst".as("x"), $"e2.dst".as("y"))
      val closing = ed.select($"src".as("cs"), $"dst".as("cd"))
      val tri = closing.hint("shuffle_hash")
        .join(wedges, $"x" === $"cs" && $"y" === $"cd")
        .select($"a", $"x", $"y")
      tri.select(explode(array($"a", $"x", $"y")).as("s_suppkey"))
        .groupBy($"s_suppkey").agg(count(lit(1)).as("n_triangles"))
        .orderBy($"s_suppkey")
    }
    dump("graph_triangles_after") {
      graft.operators.Graph.trianglesInflightPlan(spark, d)
    }

    // ── graph_jaccard_links: unmaterialized caches vs adj.count()
    // before composing ────────────────────────────────────────────────
    dump("graph_jaccard_links_before") {
      val e0 = graft.CacheRegistry.cache(
        graft.operators.Graph.partEdges(spark, d))
      val adj = graft.CacheRegistry.cache(
        e0.select($"u".as("node"), $"v".as("nbr"))
          .union(e0.select($"v".as("node"), $"u".as("nbr")))
          .repartition($"node").sortWithinPartitions($"node", $"nbr"))
      graft.operators.Graph.jaccardScore(adj, e0,
        adj.groupBy($"node").agg(count(lit(1)).as("deg")), 100, edgeHint = true)
    }
    dump("graph_jaccard_links_after") {
      graft.operators.Graph.jaccardInflightPlan(spark, d)
    }

    // ── superstep rounds: old partitioning-erasing rebind vs
    // Rebind.preserving (the state side of every loop) ────────────────
    dump("graph_label_prop_round_before") {
      val e0 = graft.operators.Graph.coSupplierEdges(spark, d)
      val adj = graft.CacheRegistry.cache(
        e0.select($"u".as("node"), $"v".as("nbr"))
          .union(e0.select($"v".as("node"), $"u".as("nbr")))
          .repartition($"nbr").sortWithinPartitions($"nbr"))
      adj.count()
      val labelCache = graft.CacheRegistry.cache(
        adj.select($"node").distinct().withColumn("label", $"node"))
      labelCache.count()
      val labels = rebindOld(labelCache)
      adj.join(labels.select($"node".as("nbr"), $"label"), "nbr")
        .groupBy($"node", $"label").agg(count(lit(1)).as("cnt"))
    }
    dump("graph_label_prop_round_after") {
      graft.operators.Graph.lpaInflightRoundPlan(spark, d)
    }

    dump("graph_pagerank_round_before") {
      val edges = graft.CacheRegistry.cache(
        graft.operators.Graph.pageEdges(spark, d)
          .repartition($"src").sortWithinPartitions($"src"))
      edges.count()
      val outW = graft.CacheRegistry.cache(
        edges.groupBy($"src").agg(sum($"w").as("out_w"))
          .sortWithinPartitions($"src"))
      outW.count()
      val nodes = edges.select($"src".as("node"))
        .union(edges.select($"dst".as("node"))).distinct()
      val n = nodes.count()
      val rankCache = graft.CacheRegistry.cache(
        nodes.withColumn("rank", lit(1000000000L))
          .join(outW.select($"src".as("node"), lit(true).as("has_out")),
            Seq("node"), "left")
          .select($"node", $"rank",
            coalesce($"has_out", lit(false)).as("has_out")))
      rankCache.count()
      val ranks = rebindOld(rankCache)
      val inflow = edges.join(ranks, edges("src") === ranks("node"))
        .join(outW, Seq("src"))
        .select($"dst", expr("rank * w div out_w").as("contrib"))
        .groupBy($"dst").agg(sum($"contrib").as("inflow"))
      val dangling = ranks.filter(!$"has_out")
        .agg(coalesce(sum($"rank"), lit(0L)).as("dang"))
      val old = ranks.select($"node", $"rank".as("old"), $"has_out")
      old.join(inflow, old("node") === inflow("dst"), "left")
        .crossJoin(broadcast(dangling))
        .select(old("node"),
          (lit(150000000L) +
            expr(s"85 * (coalesce(inflow, 0L) + dang div ${n}L) div 100")
          ).as("rank"))
    }
    dump("graph_pagerank_round_after") {
      graft.operators.Graph.pagerankInflightRoundPlan(spark, d)
    }

    dump("graph_kcore_round_before") {
      val e0 = graft.operators.Graph.partEdges(spark, d)
      val adj = graft.CacheRegistry.cache(
        e0.select($"u".as("node"), $"v".as("nbr"))
          .union(e0.select($"v".as("node"), $"u".as("nbr")))
          .repartition($"node"))
      adj.count()
      val degCache = graft.CacheRegistry.cache(
        adj.groupBy($"node").agg(count(lit(1)).as("deg"))
          .withColumn("rm", $"deg" < 65))
      degCache.count()
      val deg0 = rebindOld(degCache)
      val drops = adj
        .join(broadcast(deg0.filter($"rm").select($"node".as("nbr"))),
          Seq("nbr"))
        .groupBy($"node").agg(count(lit(1)).as("dropped"))
      deg0.filter(!$"rm")
        .join(drops, Seq("node"), "left")
        .select($"node", ($"deg" - coalesce($"dropped", lit(0L))).as("deg"))
    }
    dump("graph_kcore_round_after") {
      graft.operators.Graph.kcoreInflightRoundPlan(spark, d)
    }

    // ── dedup_cdc / text_cdc_chunks: struct-transform explode vs index
    // explode (the registered queries' frames are lazy — dump direct) ─
    dump("dedup_cdc_before") {
      val minChunk = 24
      val chunkCol = graft.functions.GraftExpressions.toColumn(
        graft.functions.CdcChunksExpr(
          graft.functions.GraftExpressions.toExpr($"text")))
      val chunks = graft.CacheRegistry.cache(
        graft.Tables.documents(spark, d)
          .select($"doc_id", chunkCol.as("c"))
          .filter(size($"c") > 0)
          .select($"doc_id", explode(expr(
            "transform(sequence(0, size(c) div 3 - 1), " +
              "i -> struct(c[3*i+1] AS len, c[3*i+2] AS h))")).as("ch"))
          .filter($"ch.len" >= minChunk)
          .select($"doc_id", $"ch.len".as("len"), $"ch.h".as("h"))
          .distinct())
      chunks.groupBy($"h", $"len")
        .agg(collect_list($"doc_id").as("ids"))
        .filter(size($"ids") >= 2)
    }
    dump("dedup_cdc_after") {
      graft.SparkEntry.queries("dedup_cdc")(spark, d)
    }
    dump("text_cdc_chunks_after") {
      graft.SparkEntry.queries("text_cdc_chunks")(spark, d)
    }

    // ── q27_ntile: 3-task ntile window vs two-phase bucketed ranks ───
    dump("q27_ntile_before") {
      val w = Window.partitionBy($"l_returnflag")
        .orderBy($"l_extendedprice", $"l_orderkey", $"l_linenumber")
      graft.Tables.lineitem(spark, d)
        .withColumn("tile", ntile(4).over(w).cast("long"))
        .groupBy($"l_returnflag", $"tile")
        .agg(count(lit(1)).as("n_rows"),
          expr("sum(bigint(floor(l_extendedprice * 100 + 0.5)))")
            .as("price_centi"))
        .orderBy($"l_returnflag", $"tile")
    }
    dump("q27_ntile_after") {
      graft.SparkEntry.queries("q27_ntile")(spark, d)
    }

    // ── ANN constant-size kernels: the encode projection before
    // (m·ks literal dot trees) vs after (one PqCodesExpr node), and
    // the full queries' live plans ───────────────────────────────────
    dump("ann_pq_encode_before") {
      val e = graft.Tables.embeddings(spark, d)
        .select($"vec_id",
          graft.functions.VectorFunctions.asDouble($"embedding").as("vec"))
      val m = 8; val ds = 8
      val books: Array[Array[Array[Double]]] = {
        val seeds = e.orderBy(xxhash64($"vec_id"), $"vec_id").limit(16)
          .select($"vec_id", $"vec").collect()
          .sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray)
        Array.tabulate(m)(mi => seeds.map(_.slice(mi * ds, (mi + 1) * ds)))
      }
      def cellCol(mi: Int, sub: Column): Column =
        array_min(array(books(mi).toIndexedSeq.zipWithIndex.map { case (c, i) =>
          struct((lit(c.map(x => x * x).sum) -
            lit(2.0) * graft.functions.VectorFunctions.dot(sub, typedLit(c.toSeq)))
            .as("dist"), lit(i).as("cid"))
        }: _*)).getField("cid")
      e.select($"vec_id", $"vec",
        array((0 until m).map(mi =>
          cellCol(mi, slice($"vec", mi * ds + 1, ds))): _*).as("cells"))
    }
    dump("ann_pq_encode_after") {
      val e = graft.Tables.embeddings(spark, d)
        .select($"vec_id",
          graft.functions.VectorFunctions.asDouble($"embedding").as("vec"))
      val m = 8; val ds = 8
      val books: Array[Array[Array[Double]]] = {
        val seeds = e.orderBy(xxhash64($"vec_id"), $"vec_id").limit(16)
          .select($"vec_id", $"vec").collect()
          .sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray)
        Array.tabulate(m)(mi => seeds.map(_.slice(mi * ds, (mi + 1) * ds)))
      }
      e.select($"vec_id", $"vec",
        graft.functions.GraftExpressions.toColumn(graft.functions.PqCodesExpr(
          graft.functions.GraftExpressions.toExpr($"vec"), books)).as("cells"))
    }
    dump("ann_pq_after") {
      graft.SparkEntry.queries("ann_pq")(spark, d)
    }
    dump("ann_ivf_after") {
      graft.SparkEntry.queries("ann_ivf")(spark, d)
    }

    spark.stop()
  }
}
