package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev experiment (not library surface): does persisting the pagerank
  * edge index for the loop's 8 rounds beat re-scanning the bucketed
  * table per round? kcore_index measured persist-wins for its
  * adjacency (r17, the recorded direction); pagerank's loop reads the
  * edge table 8x — and the delta table reads 2 file generations per
  * bucket, doubling open/decode cost per round. */
object PrExp {
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
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Unit): Unit = {
      graft.CacheRegistry.releaseAll(); spark.catalog.clearCache()
      val t0 = System.nanoTime(); f
      println(f"[exp] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // builds happen on the first calls (untimed loop-0 effect absorbed
    // by running each three times)
    for (i <- 1 to 3) {
      time(s"base$i") {
        graft.operators.Graph.graph_pagerank_index(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"delta$i") {
        graft.operators.Graph.graph_pagerank_index_delta(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
