package graft

import graft.operators.MapReduceOps

/** TeraValidate-style total-order validation of mr_sort. */
class SortValidateSpec extends SparkSpec {

  test("mr_sort output is globally ordered (0 inversions) and checksum-complete") {
    val row = MapReduceOps.mr_sort_validate(spark, sf0001).head()
    val totalRows = row.getLong(0)
    val inversions = row.getLong(1)
    assert(totalRows == Tables.lineitem(spark, sf0001).count())
    assert(inversions == 0L, s"found $inversions inversions")
    assert(row.getDouble(2) >= row.getDouble(3),
      "first (desc) price must be >= last price")
    // TeraChecksum leg: the sorted output is a PERMUTATION of the input
    assert(row.getLong(4) == row.getLong(5), "input/output xor diverged")
    assert(row.getLong(6) == 1L, "checksum_match must hold for mr_sort")
  }

  test("the checksum actually detects a lost record") {
    import spark.implicits._
    import graft.operators.MetadataOps
    val proj = Tables.lineitem(spark, sf0001)
      .select($"l_orderkey", $"l_linenumber",
        org.apache.spark.sql.functions.round($"l_extendedprice", 2)
          .as("l_extendedprice"))
    val full = MetadataOps.fnvFingerprints(proj, "a", buckets = 1)
      .select($"a_rows", $"a_xor", $"a_sum").head()
    val dropped = MetadataOps.fnvFingerprints(
        proj.orderBy($"l_orderkey", $"l_linenumber").limit(
          proj.count().toInt - 1), "b", buckets = 1)
      .select($"b_rows", $"b_xor", $"b_sum").head()
    assert(full.getLong(0) == dropped.getLong(0) + 1)
    assert(full.getLong(1) != dropped.getLong(1) ||
      full.getLong(2) != dropped.getLong(2),
      "dropping a record must move the multiset fingerprint")
  }

  test("the validator actually detects disorder") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // same counting logic over a deliberately unsorted frame: shuffle
    // lineitem by a hash and recount — inversions must appear.
    val jumbled = Tables.lineitem(spark, sf0001)
      .select($"l_extendedprice", $"l_orderkey", $"l_linenumber")
      .orderBy(xxhash64($"l_orderkey", $"l_linenumber"))
      .as[(Double, Long, Long)]
    val inv = jumbled.rdd.mapPartitions { it =>
      var prev: (Double, Long, Long) = null
      var inversions = 0L
      it.foreach { row =>
        if (prev != null && !(prev._1 > row._1 || (prev._1 == row._1 &&
          (prev._2 < row._2 || (prev._2 == row._2 && prev._3 <= row._3)))))
          inversions += 1
        prev = row
      }
      Iterator(inversions)
    }.sum()
    assert(inv > 0, "jumbled input should show inversions")
  }
}
