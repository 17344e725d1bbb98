package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Regression suite for the schema-adaptive events loader — the one
  * interface that has actually broken under driver testdata drift
  * (`ts` shipped as TIMESTAMP(NANOS) through r11, then native
  * timestamp[us] from r12, killing 29 queries until the loader
  * adapted). Each on-disk encoding the loader claims to handle gets a
  * synthetic parquet here, so the NEXT drift fails in this suite with
  * a named branch instead of as 29 opaque query errors.
  */
class TablesSpec extends SparkSpec {

  /** Write a one-table dir containing events.parquet with the given
    * ts column expression and return the dir. */
  private def eventsDir(tag: String)(ts: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft_tables_$tag").toString
    Seq((1L, "view", 1723600000000000L), (2L, "click", 1723600123456000L))
      .toDF("user_id", "event_type", "us")
      .select($"user_id", $"event_type", ts.as("ts"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("events loader: native timestamp column passes through as TimestampType") {
    import spark.implicits._
    val d = eventsDir("tsus")(timestamp_micros($"us"))
    val got = Tables.events(spark, d)
    assert(got.schema("ts").dataType == TimestampType)
    val us = got.select(unix_micros($"ts")).as[Long].collect().sorted
    assert(us.toSeq == Seq(1723600000000000L, 1723600123456000L))
  }

  test("events loader: legacy BIGINT-nanos column converts losslessly to micros") {
    import spark.implicits._
    // the nanosAsLong session flag surfaces TIMESTAMP(NANOS) as LongType
    // nanos; the loader must divide to micros, not misread or throw
    val d = eventsDir("nanos")(($"us" * 1000L).cast(LongType))
    val got = Tables.events(spark, d)
    assert(got.schema("ts").dataType == TimestampType)
    val us = got.select(unix_micros($"ts")).as[Long].collect().sorted
    assert(us.toSeq == Seq(1723600000000000L, 1723600123456000L))
  }

  test("events loader: an unsupported ts encoding fails loudly, naming the type") {
    import spark.implicits._
    val d = eventsDir("str")($"us".cast("string"))
    val e = intercept[IllegalStateException](Tables.events(spark, d))
    assert(e.getMessage.contains("StringType"),
      s"error must name the offending type: ${e.getMessage}")
  }

  test("parquetRowCount matches df.count from footers only") {
    assert(Tables.parquetRowCount(spark, sf0001, "documents") ==
      Tables.documents(spark, sf0001).count())
    assert(Tables.parquetRowCount(spark, sf0001, "lineitem") ==
      Tables.lineitem(spark, sf0001).count())
  }
}
