package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.2 MapReduce-example equivalents. The reference ships these as the
  * canonical Hadoop workloads (hadoop-mapreduce-project/
  * hadoop-mapreduce-examples/src/main/java/org/apache/hadoop/examples/
  * {WordCount,Grep,Sort,SecondarySort,Join,WordMean,WordMedian,
  * WordStandardDeviation,AggregateWordHistogram}.java). Re-expressed as
  * declarative DataFrame plans: map-side combine replaces combiners,
  * range-partitioned sort replaces TotalOrderPartitioner, a shuffled
  * equi-join replaces the reduce-side join.
  */
object MapReduceOps {

  private def words(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(explode(split(lower($"text"), " ")).as("word"))
      .filter($"word" =!= "")
  }

  /** WordCount.java — tokenize + count; partial aggregation is the combiner. */
  def mr_wordcount(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    words(s, d).groupBy($"word").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"word").limit(50)
  }

  /** Inverted-index construction — the canonical MapReduce-on-text
    * workload beyond counting: token → posting-list statistics
    * (document frequency + total occurrences). The distinct-doc count
    * is a two-phase aggregate like q16; no posting ARRAYS in the
    * registered output (scalar columns only for the oracle harness) —
    * a real index materializes collect_list(doc_id) in the same
    * single-shuffle plan. */
  def mr_inverted_index(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", explode(split(lower($"text"), " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"token")
      .agg(count_distinct($"doc_id").as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .orderBy($"token")
  }

  /** Grep.java — regex match extraction + per-match counts. */
  def mr_grep(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(explode(expr("regexp_extract_all(text, '(spark|hash)[a-z]*', 0)")).as("m"))
      .groupBy($"m").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"m")
  }

  /** Sort.java / terasort — total-order sort (range partition + local sort). */
  def mr_sort(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_linenumber",
        round($"l_extendedprice", 2).as("l_extendedprice"))
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
  }

  /** SecondarySort.java — order by secondary key within primary-key groups. */
  def mr_secondarysort(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .select($"user_id", $"rn", $"event_id", $"event_type")
      .orderBy($"user_id", $"rn")
  }

  /** Join.java — reduce-side equi-join → shuffled hash/sort-merge join. */
  def mr_join(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .join(Tables.customer(s, d), $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"o_orderkey")
  }

  /** WordMean/WordMedian/WordStandardDeviation.java — word-length stats. */
  def mr_wordstats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    words(s, d).select(length($"word").cast("long").as("len"))
      .agg(round(avg($"len"), 4).as("wmean"),
        round(median($"len"), 1).as("wmedian"),
        round(stddev($"len"), 4).as("wstddev"),
        count(lit(1)).as("nwords"))
  }

  /** AggregateWordHistogram.java — bucketed histogram of word lengths. */
  def mr_histogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    words(s, d).select(length($"word").cast("long").as("len"))
      .groupBy($"len").agg(count(lit(1)).as("cnt"))
      .orderBy($"len")
  }

  /** TeraValidate (reference: hadoop-mapreduce-examples/.../terasort/
    * TeraValidate.java) — validate mr_sort's total order the way
    * terasort's validator does: each partition checks its own
    * local order and reports its boundary keys; partition boundaries
    * are then checked to be non-overlapping in partition order. Only
    * one tiny summary row per partition leaves the executors, so the
    * check costs one scan at any scale. Output: row count, observed
    * inversions (must be 0), and the first/last keys of the global
    * order (oracled against max/min in DuckDB).
    */
  def mr_sort_validate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sorted = mr_sort(s, d)
      .select($"l_extendedprice", $"l_orderkey", $"l_linenumber")
      .as[(Double, Long, Long)]
    // sort key: price DESC, then orderkey ASC, linenumber ASC
    def before(a: (Double, Long, Long), b: (Double, Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 &&
        (a._2 < b._2 || (a._2 == b._2 && a._3 <= b._3)))
    val summaries = sorted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          var first: (Double, Long, Long) = null
          var prev: (Double, Long, Long) = null
          var inversions = 0L
          var cnt = 0L
          it.foreach { row =>
            if (first == null) first = row
            else if (!before(prev, row)) inversions += 1
            prev = row; cnt += 1
          }
          Iterator((pid, first, prev, inversions, cnt))
        }
      }
      .collect()
      .sortBy(_._1)
    // cross-partition boundary check (summaries are tiny: one/partition)
    val boundaryInversions = summaries.sliding(2).count {
      case Array(a, b) => !before(a._3, b._2)
      case _ => false
    }
    val totalRows = summaries.map(_._5).sum
    val totalInv = summaries.map(_._4).sum + boundaryInversions
    val (firstPrice, lastPrice) =
      if (summaries.isEmpty) (0.0, 0.0)
      else (summaries.head._2._1, summaries.last._3._1)
    Seq((totalRows, totalInv, firstPrice, lastPrice))
      .toDF("total_rows", "n_inversions", "first_price", "last_price")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mr_sort_validate" -> mr_sort_validate _,
    "mr_wordcount" -> mr_wordcount _,
    "mr_inverted_index" -> mr_inverted_index _,
    "mr_grep" -> mr_grep _,
    "mr_sort" -> mr_sort _,
    "mr_secondarysort" -> mr_secondarysort _,
    "mr_join" -> mr_join _,
    "mr_wordstats" -> mr_wordstats _,
    "mr_histogram" -> mr_histogram _)

  val oracle: Map[String, String] = Map(
    "mr_sort_validate" ->
      """SELECT CAST(count(*) AS BIGINT) AS total_rows,
        | CAST(0 AS BIGINT) AS n_inversions,
        | round(max(l_extendedprice),2) AS first_price,
        | round(min(l_extendedprice),2) AS last_price
        |FROM lineitem""".stripMargin,
    "mr_wordcount" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY 1 ORDER BY cnt DESC, word LIMIT 50""".stripMargin,
    "mr_inverted_index" ->
      """SELECT token, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occurrences
        |FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
        |      FROM documents)
        |WHERE token <> '' GROUP BY 1 ORDER BY 1""".stripMargin,
    "mr_grep" ->
      """SELECT m, count(*) AS cnt FROM (
        |  SELECT unnest(regexp_extract_all(text, '(spark|hash)[a-z]*')) AS m FROM documents)
        |GROUP BY 1 ORDER BY cnt DESC, m""".stripMargin,
    "mr_sort" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice,2) AS l_extendedprice
        |FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin,
    "mr_secondarysort" ->
      """SELECT user_id, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        | event_id, event_type
        |FROM events ORDER BY user_id, rn""".stripMargin,
    "mr_join" ->
      """SELECT o_orderkey, c_custkey, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "mr_wordstats" ->
      """SELECT round(avg(len),4) AS wmean, round(median(len),1) AS wmedian,
        | round(stddev(len),4) AS wstddev, count(*) AS nwords
        |FROM (SELECT CAST(length(word) AS BIGINT) AS len FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        | WHERE word <> '')""".stripMargin,
    "mr_histogram" ->
      """SELECT CAST(length(word) AS BIGINT) AS len, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY 1 ORDER BY 1""".stripMargin)
}
