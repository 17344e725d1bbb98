package graft.tools
import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch runner (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val d = "/root/testdata/sf0.01"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val k = 32
    val sigs0 = Tables.documents(spark, d)
      .select($"doc_id", minhashSignature(shingleHashes($"text", 3), k).as("sig"))
    // try: cache/checkpoint sigs so the self-join doesn't recompute lineage
    val sigs = sigs0.cache()
    time("sig compute+cache")(sigs.write.format("noop").mode("overwrite").save())
    val buckets = sigs
      .select($"doc_id", explode(bandKeys($"sig", 8, 4)).as("bk"))
      .select($"doc_id", $"bk.band".as("band"), $"bk.bkey".as("bkey"))
    val pairs = buckets.join(
        buckets.select($"band".as("band2"), $"bkey".as("bkey2"), $"doc_id".as("doc_id2")),
        $"band" === $"band2" && $"bkey" === $"bkey2" && $"doc_id" < $"doc_id2")
      .select($"doc_id", $"doc_id2").distinct()
    pairs.explain("formatted")
    time("pairs (cached sigs)")(pairs.write.format("noop").mode("overwrite").save())
    time("pairs again")(pairs.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
