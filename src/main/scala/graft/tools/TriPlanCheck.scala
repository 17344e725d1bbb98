package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the current in-flight triangles plan (Exchange
  * audit) + time the registered query min-of-2 in one JVM. */
object TriPlanCheck {
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
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val frame = graft.operators.Graph.trianglesInflightPlan(spark, d)
    val txt = frame.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    println(txt)
    println(s"EXCHANGES: ${"Exchange".r.findAllIn(txt).length}")
    graft.CacheRegistry.releaseAll(); spark.catalog.clearCache()
    for (i <- 1 to 3) {
      graft.CacheRegistry.releaseAll(); spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("graph_triangles")(spark, d)
        .write.format("noop").mode("overwrite").save()
      println(f"graph_triangles pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
