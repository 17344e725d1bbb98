package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev scratch runner (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    names.foreach { n =>
      graft.CacheRegistry.releaseAll()
      spark.catalog.clearCache()
      // time build + materialization together: iterative operators
      // (connected components) run actions during query CONSTRUCTION
      val rows = time(n) {
        val df = graft.SparkEntry.queries(n)(spark, d)
        if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) {
          println(s"===== $n =====")
          df.explain("formatted")
        }
        df.count()
      }
      println(s"[scratch] $n rows=$rows")
    }
    spark.stop()
  }
}
