package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev experiment: graph_triangles_index closure-join strategy (not
  * part of the library surface; removed once the measured winner
  * lands). The merge hint on the closure probe sorts the O(E^1.5)
  * wedge stream; a shuffle-hash build on the (bucketed, edge-sized)
  * closing side should stream wedges unsorted. */
object TriIdxExp {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    import spark.implicits._

    // builds + memoizes the two index tables, and gives the baseline
    graft.operators.Graph.queries("graph_triangles_index")(spark, d)
      .write.format("noop").mode("overwrite").save()
    val tag = java.security.MessageDigest.getInstance("SHA-256")
      .digest(d.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
    val wedgeTbl = s"tri_edges_$tag"
    val closeTbl = s"tri_close_$tag"

    def plan(closeHint: String, wedgeHint: String): DataFrame = {
      val ed0 = spark.table(wedgeTbl)
      val ed = if (wedgeHint.nonEmpty) ed0.hint(wedgeHint) else ed0
      val wedges = ed.as("e1").join(ed.as("e2"),
          $"e1.src" === $"e2.src" &&
            struct($"e1.ddeg", $"e1.dst") < struct($"e2.ddeg", $"e2.dst"))
        .select($"e1.src".as("a"), $"e1.dst".as("x"), $"e2.dst".as("y"))
      val closing0 = spark.table(closeTbl)
        .select($"src".as("cs"), $"dst".as("cd"))
      val closing = if (closeHint.nonEmpty) closing0.hint(closeHint) else closing0
      val tri = closing.join(wedges, $"x" === $"cs" && $"y" === $"cd")
        .select($"a", $"x", $"y")
      tri.select(explode(array($"a", $"x", $"y")).as("s_suppkey"))
        .groupBy($"s_suppkey").agg(count(lit(1)).as("n_triangles"))
        .orderBy($"s_suppkey")
    }

    val variants = Seq(
      "merge/merge (current)" -> (() => plan("merge", "merge")),
      "shj-close/merge" -> (() => plan("shuffle_hash", "merge")),
      "shj-close/shj-wedge" -> (() => plan("shuffle_hash", "shuffle_hash")),
      "nohint/nohint" -> (() => plan("", "")))

    val ref = plan("merge", "merge").collect().map(_.toSeq).toSet
    variants.tail.foreach { case (n, f) =>
      val got = f().collect().map(_.toSeq).toSet
      println(s"[exp] $n equals current: ${got == ref}")
    }
    for (pass <- 1 to 2; (n, f) <- variants) {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      println(f"[exp] pass$pass $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println("=== plan shj-close/merge ===")
    plan("shuffle_hash", "merge").explain("formatted")
    spark.stop()
  }
}
