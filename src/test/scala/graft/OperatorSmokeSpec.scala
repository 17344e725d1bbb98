package graft

/** Every registered query runs end-to-end at sf0.001 and produces a
  * sane result. The DuckDB hash-compare is the driver's gate; this
  * catches runtime regressions (ANSI overflow, unreadable inputs,
  * analysis errors) locally in seconds.
  */
class OperatorSmokeSpec extends SparkSpec {

  // queries whose result is legitimately empty at tiny scale
  private val mayBeEmpty = Set(
    "q7_antijoin", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_embedding", "dedup_clusters",
    "dedup_containment", "ev_funnel", "mr_grep")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty, "result must have a schema")
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }
}
