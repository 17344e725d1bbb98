package graft.tools
import org.apache.spark.sql.SparkSession

/** A/B harness (not part of the library surface): what does postings
  * FRAGMENTATION cost at query time, and what does the compaction
  * fold buy back? Builds a G-generation postings index over the given
  * sf dir (one bucketed append per doc_id % G slice), times the
  * standing search over the fragmented table (min over passes), folds
  * it with IndexUtil.compactTable, re-times, and reports file counts.
  * Usage: runMain graft.tools.FragExp [sfDir] [generations] [passes] */
object FragExp {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val gens = args.lift(1).map(_.toInt).getOrElse(10)
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val frag = "fragexp_idx"
    val compacted = s"${frag}_c"
    graft.operators.IndexUtil.dropIndexTable(spark, frag)
    graft.operators.IndexUtil.dropIndexTable(spark, compacted)
    val docs = graft.Tables.documents(spark, d)
    val n = docs.count()
    (0 until gens).foreach { g =>
      // append into the (initially absent) table: each slice is one
      // bucketed write job = one file generation
      graft.operators.TextOps.appendPostings(
        docs.filter($"doc_id" % gens === g), frag)
    }
    def timeSearch(tbl: String, label: String): Double = {
      val walls = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val c = graft.operators.TextOps
          .searchIndexQueryOver(spark, tbl, n).count()
        assert(c > 0)
        (System.nanoTime() - t0) / 1e9
      }
      val w = walls.min
      println(f"[fragexp] $label search min-of-$passes: $w%.3f s (all ${walls.map(x => f"$x%.2f").mkString(",")})")
      w
    }
    val filesBefore = graft.operators.IndexUtil.dataFileCount(spark, frag)
    val wFrag = timeSearch(frag, s"fragmented($gens gens, $filesBefore files)")
    val t0 = System.nanoTime()
    graft.operators.IndexUtil.compactTable(spark, frag, compacted,
      buckets = 8, bucketCols = Seq("term"), sortCols = Seq("term"))
    val foldWall = (System.nanoTime() - t0) / 1e9
    val filesAfter = graft.operators.IndexUtil.dataFileCount(spark, compacted)
    val wComp = timeSearch(compacted, s"compacted($filesAfter files)")
    println(f"[fragexp] fold wall (rewrite+verify+swap): $foldWall%.2f s; " +
      f"search ratio frag/compacted = ${wFrag / wComp}%.2f")
    graft.operators.IndexUtil.dropIndexTable(spark, compacted)
    spark.stop()
  }
}
