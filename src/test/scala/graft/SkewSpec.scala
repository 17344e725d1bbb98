package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted-join guarantees: result equivalence with the plain join
  * (both salt derivations), salt determinism under re-execution — the
  * retry-safety property the content hash exists for — and the
  * partition-balance effect that justifies the replication cost. */
class SkewSpec extends SparkSpec {

  private def skewedFacts(n: Long) = {
    import spark.implicits._
    spark.range(n)
      .select($"id", when(pmod($"id", lit(10)) < 9, 0L).otherwise(pmod($"id", lit(7))).as("k"))
  }

  test("saltedJoin equals the plain inner join on a skewed key") {
    import spark.implicits._
    // 50k facts, 90% on one hot key
    val facts = skewedFacts(50000)
    val dim = (0L until 7L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = facts.join(dim, "k")
    // pmod before summing: ANSI mode makes a sum of full-range hashes
    // overflow-throw; 2^40-bounded summands keep 50k rows in range
    def checksum(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum($"id"),
        sum(pmod(xxhash64($"k", $"id", $"name"), lit(1L << 40)))).collect()(0)
    val p = checksum(plain)
    for (rowId <- Seq(Seq.empty[String], Seq("id"))) {
      val salted = Skew.saltedJoin(facts, dim, "k", salt = 8, rowId = rowId)
      assert(salted.columns.sorted.sameElements(plain.columns.sorted))
      val q = checksum(salted)
      assert(p == q, s"salted join (rowId=$rowId) diverged: $p vs $q")
    }
  }

  test("salt assignment is deterministic across re-executions") {
    import spark.implicits._
    val facts = skewedFacts(10000)
    // same derivation saltedJoin uses; two independent executions (and
    // any task retry, which is just a re-execution of the same plan)
    // must agree row-for-row — monotonically_increasing_id would not
    def salts() = facts
      .select($"id", pmod(xxhash64($"id", $"k"), lit(8L)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salts() == salts(), "content-derived salt must be stable")
  }

  test("salting levels the hot key's partition skew") {
    import spark.implicits._
    val n = 50000L
    val facts = skewedFacts(n)
    def maxPartRows(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(spark_partition_id()).count()
        .agg(max($"count")).collect()(0).getLong(0)
    val unsalted = maxPartRows(facts.repartition(8, $"k"))
    val salted = maxPartRows(facts
      .withColumn("s", pmod(xxhash64($"id"), lit(8L)))
      .repartition(8, $"k", $"s"))
    // hot partition holds ~90% of rows unsalted; salting must spread it
    // (threshold allows for sub-keys colliding into one partition —
    // 8 sub-keys over 8 partitions is not a perfect spread)
    assert(unsalted >= (n * 0.9).toLong, s"test premise broken: $unsalted")
    assert(salted <= (unsalted * 0.45).toLong,
      s"salting did not level skew: max $salted vs unsalted $unsalted")
  }
}
