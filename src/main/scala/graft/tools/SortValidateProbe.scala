package graft.tools

import org.apache.spark.sql.SparkSession

/** r20 dev probe (r19 verdict ask #4): decompose mr_sort_validate's
  * wall — which leg carries the 0.89 → ~2.0 s creep? Legs: the global
  * sort itself (noop), the full validate query, and lineitem scan
  * cost, min-of-3 each in one JVM with the Bench-style isolation. */
object SortValidateProbe {
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
    def time(label: String)(body: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        graft.CacheRegistry.releaseAll(); spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label min ${ts.min}%.2f s (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    import spark.implicits._
    time("lineitem scan (noop)") {
      graft.Tables.lineitem(spark, d).write.format("noop").mode("overwrite").save()
    }
    time("mr_sort (noop)") {
      graft.SparkEntry.queries("mr_sort")(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    time("validate pass only (typed rdd over sorted)") {
      val sorted = graft.SparkEntry.queries("mr_sort")(spark, d)
        .select($"l_extendedprice", $"l_orderkey", $"l_linenumber")
        .as[(Double, Long, Long)]
      sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        var cnt = 0L; it.foreach(_ => cnt += 1); Iterator((pid, cnt))
      }.collect()
    }
    time("full mr_sort_validate (noop)") {
      graft.SparkEntry.queries("mr_sort_validate")(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
