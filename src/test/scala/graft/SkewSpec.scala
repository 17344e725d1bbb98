package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted-join guarantees: result equivalence with the plain join, and
  * the partition-balance effect that justifies the replication cost. */
class SkewSpec extends SparkSpec {

  test("saltedJoin equals the plain inner join on a skewed key") {
    import spark.implicits._
    // 50k facts, 90% on one hot key
    val facts = spark.range(50000)
      .select($"id", when(pmod($"id", lit(10)) < 9, 0L).otherwise(pmod($"id", lit(7))).as("k"))
    val dim = (0L until 7L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = facts.join(dim, "k")
    val salted = Skew.saltedJoin(facts, dim, "k", salt = 8)
    assert(salted.columns.sorted.sameElements(plain.columns.sorted))
    // pmod before summing: ANSI mode makes a sum of full-range hashes
    // overflow-throw; 2^40-bounded summands keep 50k rows in range
    def checksum(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum($"id"),
        sum(pmod(xxhash64($"k", $"id", $"name"), lit(1L << 40)))).collect()(0)
    val p = checksum(plain)
    val q = checksum(salted)
    assert(p == q, s"salted join diverged: $p vs $q")
  }

  test("salting levels the hot key's partition skew") {
    import spark.implicits._
    val n = 50000L
    val facts = spark.range(n)
      .select($"id", when(pmod($"id", lit(10)) < 9, 0L).otherwise(pmod($"id", lit(7))).as("k"))
    def maxPartRows(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(spark_partition_id()).count()
        .agg(max($"count")).collect()(0).getLong(0)
    val unsalted = maxPartRows(facts.repartition(8, $"k"))
    val salted = maxPartRows(facts
      .withColumn("s", pmod(monotonically_increasing_id(), lit(8L)))
      .repartition(8, $"k", $"s"))
    // hot partition holds ~90% of rows unsalted; salting must spread it
    // (threshold allows for sub-keys colliding into one partition —
    // 8 sub-keys over 8 partitions is not a perfect spread)
    assert(unsalted >= (n * 0.9).toLong, s"test premise broken: $unsalted")
    assert(salted <= (unsalted * 0.45).toLong,
      s"salting did not level skew: max $salted vs unsalted $unsalted")
  }
}
