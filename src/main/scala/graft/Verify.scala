package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    BucketCapMetrics.register(spark)
    new java.io.File(outDir).mkdirs()
    // Oracle PRECONDITION, checked loudly up front: the gram-hash /
    // CDC re-derivations (dedup_*, text_fingerprint, text_cdc_chunks)
    // fold per-CHARACTER codepoints in DuckDB but per-BYTE values in
    // the JVM kernels, and `toLowerCase(char)` equals SQL `lower()`
    // byte-wise — both identities hold only while documents.text is
    // pure ASCII (char length == UTF-8 byte length). If the driver's
    // corpus ever gains non-ASCII text, those oracles will mismatch
    // with no hint why; this warning is the hint. Deliberately NOT a
    // hard abort — one corpus change must not zero the other ~120
    // queries' correctness rows.
    locally {
      import org.apache.spark.sql.functions.{length, octet_length}
      val nonAscii = Tables.documents(spark, sfDir)
        .filter(length(org.apache.spark.sql.functions.col("text")) =!=
          octet_length(org.apache.spark.sql.functions.col("text")))
        .count()
      if (nonAscii > 0)
        System.err.println(
          s"[verify] WARNING: $nonAscii documents contain non-ASCII text — " +
            "the byte-vs-codepoint identity behind the dedup/text gram oracles " +
            "no longer holds; expect hash mismatches on dedup_minhash_lsh/" +
            "dedup_incremental/dedup_ngram_jaccard/dedup_simhash/dedup_cdc, " +
            "the winnowing/CDC text oracles, and the dup-span family " +
            "(text_dup_spans/text_dup_strip/sql_text_dup_spans — kernel " +
            "per-char lowercase vs SQL lower())")
    }
    val failed = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Some(name)
      } finally {
        // Dedup queries persist signature stages; without a release the
        // session accumulates one strong CacheManager entry per query.
        CacheRegistry.releaseAll()
      }
    }
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} queries FAILED: ${failed.mkString(", ")}")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
