package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

/** External-source ingest: the JDBC (embedded Derby) and CSV paths
  * must round-trip values exactly against the parquet-side truth. */
class SourcesSpec extends SparkSpec {

  test("JDBC round-trip matches the direct aggregation") {
    import spark.implicits._
    val viaJdbc = Sources.src_jdbc_pageview(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val direct = Tables.events(spark, sf0001)
      .filter($"event_type" === "view")
      .groupBy($"user_id").agg(count(lit(1)).as("n_views"))
      .orderBy($"user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaJdbc.nonEmpty)
    assert(viaJdbc == direct)
  }

  test("CSV round-trip preserves types and aggregates") {
    import spark.implicits._
    val viaCsv = Sources.src_csv_agg(spark, sf0001).collect()
    val direct = Tables.part(spark, sf0001)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_parts"), round(avg($"p_retailprice"), 2).as("avg_price"))
      .orderBy($"p_brand")
      .collect()
    assert(viaCsv.nonEmpty)
    assert(viaCsv.toSeq == direct.toSeq)
  }
}
