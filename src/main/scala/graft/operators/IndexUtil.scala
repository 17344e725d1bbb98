package graft.operators

import org.apache.spark.sql.SparkSession

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
