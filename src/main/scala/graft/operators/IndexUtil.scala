package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Shared plumbing for the PERSISTED-INDEX lifecycle (build-once
  * bucketed tables searched by later queries — the ANN family's
  * vector-store posture, reused by the graph family's edge indexes):
  * per-source-dir table-name tags and a drop that clears both the
  * in-memory catalog and any files a previous JVM left behind in the
  * warehouse dir. */
private[graft] object IndexUtil {

  /** Per-dir SHA tag for persisted index table names. */
  def dirTag(d: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(d.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString

  private def warehousePath(s: SparkSession): String =
    s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")

  /** Sidecar commit-marker path for a streaming index append leg —
    * `<warehouse>/_graft_commits/<tbl>.<leg>`, a tiny file holding the
    * last batchId whose append COMMITTED on that table+leg. Lives next
    * to the table it describes so a restart that finds the warehouse
    * finds the marker (the FileOutputCommitter posture: the commit
    * record travels with the data, reference hadoop-mapreduce-client-
    * core/src/main/java/org/apache/hadoop/mapreduce/lib/output/
    * FileOutputCommitter.java:1). */
  def commitMarkerPath(s: SparkSession, tbl: String, leg: String): java.nio.file.Path =
    java.nio.file.Paths.get(warehousePath(s), "_graft_commits",
      s"$tbl.${if (leg.isEmpty) "_" else leg}")

  /** Remove every commit marker for `tbl` — MUST accompany a table
    * rebuild: a fresh stream over a rebuilt table legitimately
    * restarts its batchIds at 0, and a stale marker from the previous
    * incarnation would wrongly block its appends. Called from
    * [[dropIndexTable]], the single gate every index (re)builder goes
    * through. */
  def clearCommitMarkers(s: SparkSession, tbl: String): Unit = {
    val dir = java.nio.file.Paths.get(warehousePath(s), "_graft_commits")
    if (java.nio.file.Files.isDirectory(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(dir).iterator().asScala.toSeq
        .filter(_.getFileName.toString.startsWith(s"$tbl."))
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** COMPACT a multi-generation bucketed index into a single-
    * generation successor — the small-files maintenance op that
    * append growth eventually requires (the HDFS problem class the
    * reference dedicates whole subsystems to: concat folds small
    * blocks into one file, hadoop-hdfs/src/main/java/org/apache/
    * hadoop/hdfs/server/namenode/FSDirConcatOp.java:1; Hadoop
    * Archives pack cold small files wholesale, hadoop-tools/
    * hadoop-archives/src/main/java/org/apache/hadoop/tools/
    * HadoopArchives.java:1 — same pressure, metadata-scale instead of
    * open()-count). Every append generation adds one file set per
    * bucket, so a long-lived index accretes files linearly with
    * ingest batches: scan open()s grow, per-bucket sorted runs
    * multiply (each generation sorted independently — a bucketed
    * sort-merge consumer re-merges runs per read), and at 100 TB the
    * NameNode-shaped metadata cost arrives too.
    *
    * The rewrite is ONE job with ZERO shuffle: the source is read
    * through its BUCKETED scan — one partition per bucket, each
    * coalescing that bucket's files across ALL generations — so every
    * write task holds exactly one bucket's rows and writes exactly
    * one file: N generations × B files in, B files out, one sorted
    * run per bucket, no Exchange anywhere (data never changes
    * buckets; compaction only changes FILES). The scan must be
    * FORCED bucketed for the duration: AQE's auto-bucketed-scan
    * demotes a bucketed read to plain size-split files when no
    * operator exploits the partitioning — correct for queries, wrong
    * here, where the partitioning IS the point (and it also defeats a
    * `repartition(buckets, bucketCols)` workaround: the optimizer
    * elides the repartition as satisfied by the nominal scan
    * partitioning, then the demotion un-satisfies it — measured,
    * 13 mixed-bucket files from 4 size-split tasks).
    * The result is FINGERPRINT-VERIFIED against the source
    * table BEFORE the swap ([[MetadataOps.fnvFingerprints]], 64
    * buckets — compaction must be invisible to every query), then the
    * fragmented table drops: the generation-swap commit discipline.
    * At 100 TB compaction runs partition-scoped and incremental —
    * only partitions whose generation count crossed a threshold
    * rewrite (the Delta OPTIMIZE / LSM-compaction posture). */
  def compactTable(s: SparkSession, frag: String, compacted: String,
      buckets: Int, bucketCols: Seq[String], sortCols: Seq[String]): Unit = {
    // drop the TARGET first, catalog AND disk (the writeMergeGeneration
    // discipline): a previous JVM's run may have left the location
    // behind with no in-memory catalog entry, and saveAsTable fails on
    // an existing location it doesn't know about
    dropIndexTable(s, compacted)
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prevAuto = s.conf.getOption(autoKey)
    s.conf.set(autoKey, "false")
    try {
      s.table(frag)
        .write.mode("overwrite")
        .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
        .sortBy(sortCols.head, sortCols.tail: _*)
        .format("parquet").saveAsTable(compacted)
    } finally prevAuto match {
      case Some(v) => s.conf.set(autoKey, v)
      case None => s.conf.unset(autoKey)
    }
    val bad = MetadataOps.fnvFingerprints(s.table(frag), "src")
      .join(MetadataOps.fnvFingerprints(s.table(compacted), "dst"),
        Seq("bucket"), "full_outer")
      .filter(!(col("src_rows") <=> col("dst_rows") &&
        col("src_xor") <=> col("dst_xor") &&
        col("src_sum") <=> col("dst_sum")))
      .count()
    if (bad > 0) throw new IllegalStateException(
      s"compacted generation $compacted failed fingerprint " +
        s"verification in $bad/64 buckets — not swapped in")
    dropIndexTable(s, frag) // commit point: compacted is live
  }

  /** Number of parquet data files backing a saved table — the
    * quantity compaction exists to shrink; exposed for specs. */
  def dataFileCount(s: SparkSession, tbl: String): Long = {
    val loc = java.nio.file.Paths.get(warehousePath(s), tbl)
    if (!java.nio.file.Files.isDirectory(loc)) 0L
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala
        .count(p => p.getFileName.toString.endsWith(".parquet") ||
          p.getFileName.toString.startsWith("part-"))
    }
  }

  /** Drop a persisted index table from both the (in-memory) catalog
    * and the warehouse dir — a previous JVM may have left table files
    * the in-memory catalog doesn't know about (the bucketedTables
    * rule). Shared by every persisted-index builder. Also clears the
    * table's streaming commit markers: table gone ⇒ its append
    * history is gone. */
  def dropIndexTable(s: SparkSession, tbl: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $tbl")
    val wh = warehousePath(s)
    val loc = java.nio.file.Paths.get(wh, tbl)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    clearCommitMarkers(s, tbl)
  }
}
