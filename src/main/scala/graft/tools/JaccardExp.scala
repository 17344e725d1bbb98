package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev experiment (not library surface): allocation-leaner
  * formulations of the jaccard wedge count over the persisted
  * part-graph index — measuring the r17 verdict's GC-lean ask before
  * touching the registered query. */
object JaccardExp {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    // materialize the index once (build cost out of the timings)
    graft.operators.Graph.graph_jaccard_index(spark, d).count()
    graft.CacheRegistry.releaseAll(); spark.catalog.clearCache()
    val tag = java.security.MessageDigest.getInstance("SHA-256")
      .digest(d.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
    val adj = spark.table(s"pa_adj_$tag")
    val edges = spark.table(s"pa_edges_$tag")
    val deg = spark.table(s"pa_deg_$tag").select($"node", $"deg")
    val fanCap = 32

    def finish(common: DataFrame): DataFrame =
      common.join(edges.hint("shuffle_hash"), Seq("u", "v"), "left_anti")
        .join(deg.select($"node".as("u"), $"deg".as("du")), Seq("u"))
        .join(deg.select($"node".as("v"), $"deg".as("dv")), Seq("v"))
        .select($"u", $"v", $"common",
          expr("1000000 * common div (du + dv - common)").as("jaccard_ppm"))
        .orderBy($"jaccard_ppm".desc, $"common".desc, $"u", $"v")
        .limit(100)

    // A: current — window cap, self-join (window computes twice)
    def variantA(): DataFrame = {
      val centers = adj
        .withColumn("rn", row_number().over(
          Window.partitionBy($"node").orderBy($"nbr")))
        .filter($"rn" <= fanCap).drop("rn")
      finish(centers.as("a").join(centers.as("b"),
          $"a.node" === $"b.node" && $"a.nbr" < $"b.nbr")
        .groupBy($"a.nbr".as("u"), $"b.nbr".as("v"))
        .agg(count(lit(1)).as("common")))
    }

    // B: window cap once, persist the capped centers, self-join
    def variantB(): DataFrame = {
      val centers = adj
        .withColumn("rn", row_number().over(
          Window.partitionBy($"node").orderBy($"nbr")))
        .filter($"rn" <= fanCap).drop("rn")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      centers.count()
      val out = finish(centers.as("a").join(centers.as("b"),
          $"a.node" === $"b.node" && $"a.nbr" < $"b.nbr")
        .groupBy($"a.nbr".as("u"), $"b.nbr".as("v"))
        .agg(count(lit(1)).as("common")))
      val rows = out.collect()
      centers.unpersist(blocking = false)
      spark.createDataset(rows.toSeq)(org.apache.spark.sql.Encoders.row(out.schema))
    }

    // C: per-node capped neighbor array, pairs via nested transform
    // (no self-join, no window — one grouped agg + one explode)
    def variantC(): DataFrame = {
      val fans = adj.groupBy($"node")
        .agg(slice(sort_array(collect_list($"nbr")), 1, fanCap).as("ns"))
      val pairs = fans.select(explode(expr(
        "flatten(transform(ns, (x, i) -> " +
          "transform(slice(ns, i + 2, size(ns)), y -> struct(x AS u, y AS v))))"
        )).as("p"))
      finish(pairs.groupBy($"p.u".as("u"), $"p.v".as("v"))
        .agg(count(lit(1)).as("common")))
    }

    // D: window cap once (bounded per-group state at scale), then
    // ≤fanCap collect per node, pairs via nested transform — kills
    // the self-join's second window sort while keeping every buffer
    // bounded by fanCap
    def variantD(): DataFrame = {
      val centers = adj
        .withColumn("rn", row_number().over(
          Window.partitionBy($"node").orderBy($"nbr")))
        .filter($"rn" <= fanCap).drop("rn")
      val fans = centers.groupBy($"node")
        .agg(sort_array(collect_list($"nbr")).as("ns"))
      val pairs = fans.select(explode(expr(
        "flatten(transform(ns, (x, i) -> " +
          "transform(slice(ns, i + 2, size(ns)), y -> struct(x AS u, y AS v))))"
        )).as("p"))
      finish(pairs.groupBy($"p.u".as("u"), $"p.v".as("v"))
        .agg(count(lit(1)).as("common")))
    }

    def time(label: String)(f: => Unit): Unit = {
      graft.CacheRegistry.releaseAll(); spark.catalog.clearCache()
      val t0 = System.nanoTime(); f
      println(f"[exp] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val a0 = variantA().collect().map(_.toSeq).toSeq
    val c0 = variantC().collect().map(_.toSeq).toSeq
    val d0 = variantD().collect().map(_.toSeq).toSeq
    println(s"[exp] C == A: ${c0 == a0}, D == A: ${d0 == a0}")
    for (i <- 1 to 3) {
      time(s"A$i") { variantA().write.format("noop").mode("overwrite").save() }
      time(s"B$i") { variantB() }
      time(s"C$i") { variantC().write.format("noop").mode("overwrite").save() }
      time(s"D$i") { variantD().write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
