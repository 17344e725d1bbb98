package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev experiment (not library surface): where do ann_pq / ann_ivfpq /
  * ann_knn_graph spend their ~4.5 s at sf0.1 (2000 vectors)? Times each
  * registered query twice (JIT-warm second) with per-query wall, and
  * separately times just the TRAINING collects of ann_pq to split
  * driver-side model fitting from the scan/score pass. */
object AnnExp {
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

    // per-job wall clock — collect boundaries (training) vs the final
    // write pass show up as separate jobs
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      val start = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        start.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = start.remove(j.jobId)
        if (t0 != null)
          println(f"[exp]   job ${j.jobId} ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    })

    def time(label: String)(f: => Unit): Unit = {
      graft.CacheRegistry.releaseAll(); spark.catalog.clearCache()
      val t0 = System.nanoTime(); f
      println(f"[exp] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (n <- Seq("ann_pq", "ann_ivfpq", "ann_knn_graph"); i <- 1 to 2)
      time(s"$n#$i") {
        graft.SparkEntry.queries(n)(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    spark.stop()
  }
}
