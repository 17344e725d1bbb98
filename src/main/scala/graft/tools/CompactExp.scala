package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev probe (not part of the library surface): why does a
  * repartition(buckets, bucketCols) feeding a bucketBy write not
  * produce one file per bucket? Prints the write-side plan and the
  * resulting file layout. */
object CompactExp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 10000).map(i => (s"t$i", i.toLong, 1L))
      .toDF("term", "doc_id", "tf")
    spark.sql("DROP TABLE IF EXISTS cexp")
    val rep = df.repartition(8, $"term")
    rep.write.mode("overwrite").bucketBy(8, "term").sortBy("term")
      .format("parquet").saveAsTable("cexp")
    val loc = java.nio.file.Paths.get(
      s"${System.getProperty("java.io.tmpdir")}/graft_warehouse", "cexp")
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.list(loc).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("part-")).toSeq.sorted
    println(s"[cexp] ${files.size} files:")
    files.foreach(f => println(s"[cexp]   $f"))
    spark.stop()
  }
}
