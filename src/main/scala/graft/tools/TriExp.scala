package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev experiment (not library surface): wedge enumeration via
  * per-src sorted arrays instead of the edge self-join, for the
  * triangles index — the jaccard D-variant lesson applied to the
  * oriented wedge stream. */
object TriExp {
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

    graft.operators.Graph.graph_triangles_index(spark, d).count()
    graft.CacheRegistry.releaseAll(); spark.catalog.clearCache()
    val tag = java.security.MessageDigest.getInstance("SHA-256")
      .digest(d.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
    val ed = spark.table(s"tri_edges_$tag")
    val closing = spark.table(s"tri_close_$tag")
      .select($"src".as("cs"), $"dst".as("cd"))

    def finish(wedges: DataFrame): DataFrame = {
      val tri = closing.hint("shuffle_hash")
        .join(wedges, $"x" === $"cs" && $"y" === $"cd")
        .select($"a", $"x", $"y")
      tri.select(explode(array($"a", $"x", $"y")).as("s_suppkey"))
        .groupBy($"s_suppkey").agg(count(lit(1)).as("n_triangles"))
        .orderBy($"s_suppkey")
    }

    // A: current self-join wedge stream
    def variantA(): DataFrame = finish(
      ed.as("e1").hint("shuffle_hash").join(ed.as("e2"),
          $"e1.src" === $"e2.src" &&
            struct($"e1.ddeg", $"e1.dst") < struct($"e2.ddeg", $"e2.dst"))
        .select($"e1.src".as("a"), $"e1.dst".as("x"), $"e2.dst".as("y")))

    // B: per-src sorted (ddeg, dst) array + nested-transform pairs —
    // per-group state bounded by the oriented out-degree (~sqrt(2E))
    def variantB(): DataFrame = finish(
      ed.groupBy($"src")
        .agg(sort_array(collect_list(struct($"ddeg", $"dst"))).as("ns"))
        .select($"src".as("a"), explode(expr(
          "flatten(transform(ns, (x, i) -> " +
            "transform(slice(ns, i + 2, size(ns)), " +
            "y -> struct(x.dst AS x, y.dst AS y))))")).as("p"))
        .select($"a", $"p.x".as("x"), $"p.y".as("y")))

    def time(label: String)(f: => Unit): Unit = {
      graft.CacheRegistry.releaseAll(); spark.catalog.clearCache()
      val t0 = System.nanoTime(); f
      println(f"[exp] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val a0 = variantA().collect().map(_.toSeq).toSeq
    val b0 = variantB().collect().map(_.toSeq).toSeq
    println(s"[exp] B == A: ${b0 == a0}")
    for (i <- 1 to 3) {
      time(s"A$i") { variantA().write.format("noop").mode("overwrite").save() }
      time(s"B$i") { variantB().write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
