package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared plumbing for the PERSISTED-INDEX lifecycle (build-once
  * bucketed tables searched by later queries — the ANN family's
  * vector-store posture, reused by the graph family's edge indexes):
  * per-source-dir table-name tags and a drop that clears both the
  * in-memory catalog and any files a previous JVM left behind in the
  * warehouse dir. */
private[operators] object IndexUtil {

  /** Per-dir SHA tag for persisted index table names. */
  def dirTag(d: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(d.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString

  /** Drop a persisted index table from both the (in-memory) catalog
    * and the warehouse dir — a previous JVM may have left table files
    * the in-memory catalog doesn't know about (the bucketedTables
    * rule). Shared by every persisted-index builder. */
  def dropIndexTable(s: SparkSession, tbl: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $tbl")
    val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val loc = java.nio.file.Paths.get(wh, tbl)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
