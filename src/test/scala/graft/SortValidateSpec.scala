package graft

import graft.operators.MapReduceOps

/** TeraValidate-style total-order validation of mr_sort. */
class SortValidateSpec extends SparkSpec {

  test("mr_sort output is globally ordered (0 inversions)") {
    val row = MapReduceOps.mr_sort_validate(spark, sf0001).head()
    val totalRows = row.getLong(0)
    val inversions = row.getLong(1)
    assert(totalRows == Tables.lineitem(spark, sf0001).count())
    assert(inversions == 0L, s"found $inversions inversions")
    assert(row.getDouble(2) >= row.getDouble(3),
      "first (desc) price must be >= last price")
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
