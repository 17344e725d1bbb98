package graft

import graft.operators.MapReduceOps

/** The π examples' outputs are mathematical constants, so the
  * strongest possible gate is a literal assertion — it holds even if
  * the DuckDB oracles (which recompute the same arithmetic) were ever
  * weakened, and it pins the EXACT fixed-point/integer formulations:
  * any change to the digit reversals, the cleared-denominator circle
  * test, or the 2^-48 truncation shows up as a wrong constant, not a
  * subtle drift. */
class NumericExamplesSpec extends SparkSpec {

  test("mr_pi estimates pi to the known 10k-point Halton value") {
    val row = MapReduceOps.mr_pi(spark, sf0001).head()
    assert(row.getLong(0) == 10000L)
    // 7,851 of 10,000 Halton points fall inside the inscribed circle —
    // a deterministic property of the sequence, not a tolerance check.
    assert(row.getLong(1) == 7851L, s"n_inside = ${row.getLong(1)}")
    assert(row.getLong(2) == 3140400L, s"pi_ppm = ${row.getLong(2)}")
  }

  test("mr_bbp produces pi's actual hex expansion") {
    val digits = MapReduceOps.mr_bbp(spark, sf0001).collect()
      .sortBy(_.getLong(0)).map(_.getString(1)).mkString
    // π = 3.243F6A8885A308D3…
    assert(digits == "243F6A8885A3", s"got $digits")
  }

  test("mr_randomtextwriter is a pure function of the row id") {
    import org.apache.spark.sql.functions._
    val df = MapReduceOps.mr_randomtextwriter(spark, sf0001)
    // deterministic across independent materializations
    val a = df.agg(org.apache.spark.sql.functions.expr("bit_xor(xxhash64(row_id, text))")).head().getLong(0)
    val b = MapReduceOps.mr_randomtextwriter(spark, sf0001)
      .agg(org.apache.spark.sql.functions.expr("bit_xor(xxhash64(row_id, text))")).head().getLong(0)
    assert(a == b)
    // row 0's text is the fixed arithmetic expansion of id=0
    val r0 = df.filter(col("row_id") === 0).head().getString(1)
    val expected = (0 until 10).map { k =>
      MapReduceOps.GenWords(((0L * 2654435761L + k.toLong * 40503L)
        % MapReduceOps.GenWords.length).toInt)
    }.mkString(" ")
    assert(r0 == expected, s"row 0 text drifted: $r0")
  }
}
