package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r20 scaling-evidence harness (r19 verdict ask #6): sf0.1 is
  * floor-bound (the 8-core bench beat the 32-core one), so per-query
  * core-scaling claims need a larger corpus. This tool times the hot
  * graph queries + the slowest non-graph queries over the 10×-inflated
  * corpus the [[graft.Scale]] harness defines (disjoint co-occurrence
  * graph copies for lineitem — nodes/edges/triangles all ×10; Caesar
  * document copies; rotated embeddings; independent event user
  * populations), at the core count given by SPARK_GRAFT_CPUS. Run it
  * twice (8 and 32) and compare: a query that parallelizes shows a
  * wall-time ratio well below 1 at 32 cores.
  *
  * Dev tool, one JVM per core count (local[n] is fixed per session);
  * min over 2 measured passes, noop sink, per-query cache clears —
  * the Bench methodology without the warmup (at 10× volume the
  * multi-second walls dwarf JIT warmup).
  */
object ScaleCores {
  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse_scale")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.BucketCapMetrics.register(spark)

    // ── the graft.Scale inflation, reused verbatim (guarded: build
    // once, reuse across the 8- and 32-core invocations) ─────────────
    val outDir = s"${System.getProperty("java.io.tmpdir")}/graft_scale_x$factor"
    val marker = new java.io.File(s"$outDir/_scalecores_ready")
    if (!marker.isFile) {
      val lower = "abcdefghijklmnopqrstuvwxyz"
      val upper = lower.toUpperCase
      val docs = spark.read.parquet(s"$baseDir/documents.parquet")
      (0 until factor).map { i =>
        val rot = i % 26
        val rotL = lower.drop(rot) + lower.take(rot)
        val text = if (rot == 0) col("text")
          else translate(col("text"), lower + upper, rotL + rotL.toUpperCase)
        docs.select((col("doc_id") + lit(i.toLong * (1L << 40))).as("doc_id"),
          text.as("text"), col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
      (0 until factor).map { i =>
        val s = i % 64
        val vec = if (s == 0) col("embedding")
          else concat(slice(col("embedding"), s + 1, 64 - s),
            slice(col("embedding"), 1, s))
        emb.select((col("vec_id") + lit(i.toLong * (1L << 40))).as("vec_id"),
          vec.as("embedding"), col("label"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
      val ev = spark.read.parquet(s"$baseDir/events.parquet")
      (0 until factor).map { i =>
        ev.select((col("event_id") + lit(i.toLong * (1L << 40))).as("event_id"),
          col("ts"),
          (col("user_id") + lit(i.toLong * (1L << 40))).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
      val lit2 = spark.read.parquet(s"$baseDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_partkey"))
      (0 until factor).map { i =>
        lit2.select((col("l_orderkey") + lit(i.toLong * (1L << 40))).as("l_orderkey"),
          (col("l_suppkey") + lit(i.toLong * (1L << 40))).as("l_suppkey"),
          (col("l_partkey") + lit(i.toLong * (1L << 40))).as("l_partkey"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
      marker.createNewFile()
      System.err.println(s"[scalecores] inflated $factor x -> $outDir")
    }

    // the hot set: in-flight graph family (lineitem/events) + the
    // slowest non-graph queries whose inputs exist in the inflated dir
    // (documents/embeddings); fs_*/mr_*/q* read tables the inflation
    // doesn't carry.
    val names = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(",").map(_.trim).toSeq)
      .getOrElse(Seq(
        "graph_triangles", "graph_label_prop", "graph_bfs_layers",
        "graph_modularity", "graph_kcore", "graph_jaccard_links",
        "graph_pagerank",
        "text_pipeline_near", "text_bpe_encode", "text_bpe_train",
        "text_ccnet_buckets", "dedup_resolve_best", "dedup_clusters",
        "ann_pq", "ann_ivfpq", "ann_knn_graph"))
    def runOne(name: String): Double = {
      graft.CacheRegistry.releaseAll()
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, outDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val results = names.map { n =>
      val ts = (1 to 2).map(_ => runOne(n))
      System.err.println(f"[scalecores] $n ${ts.min}%.2f s (passes: ${ts.map(t => f"$t%.2f").mkString(", ")})")
      n -> ts.min
    }
    val qs = results.map { case (n, t) => s""""$n":${f"$t%.2f"}""" }.mkString("{", ",", "}")
    println(s"""{"cpus":$cpus,"factor":$factor,"queries":$qs}""")
    spark.stop()
  }
}
