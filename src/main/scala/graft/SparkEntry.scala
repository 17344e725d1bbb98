package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory; every §2 line maps to one `queries` key, and every
  * SQL-expressible one has a DuckDB oracle in `oracleSql`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q5_multijoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ SqlSurface.queries ++ MapReduceOps.queries ++
      MetadataOps.queries ++ EventOps.queries ++ Dedup.queries ++
      Similarity.queries ++ TextOps.queries ++ Multimodal.queries ++
      PipeOps.queries ++ Graph.queries ++ graft.sources.Sources.queries

  /** DuckDB-equivalent SQL per query (omitted → rows-only check). */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ SqlSurface.oracle ++ MapReduceOps.oracle ++
      MetadataOps.oracle ++ EventOps.oracle ++ Dedup.oracle ++
      Similarity.oracle ++ TextOps.oracle ++ Multimodal.oracle ++
      PipeOps.oracle ++ Graph.oracle ++ graft.sources.Sources.oracle
}
