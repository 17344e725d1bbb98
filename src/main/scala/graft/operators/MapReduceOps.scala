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
    // r20: ONE sort, two consumers. The TeraChecksum leg (added r13)
    // re-ran the full mr_sort from scratch for its output fingerprint —
    // the bisected cause of this query's "creep" vs its pre-r13 self
    // (r19 verdict #4; SCALE.md r20 addendum): the 2×-sort shape was a
    // feature addition, not a regression. Persisting the sorted frame
    // lets the validation pass populate the cache and the fingerprint
    // leg read it — same rows, same boundaries (cache preserves the
    // range partitions and per-partition order), one sort paid.
    val sortedDf = graft.CacheRegistry.cache(mr_sort(s, d))
    val sorted = sortedDf
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
    // TeraChecksum leg (reference: hadoop-mapreduce-examples/.../
    // terasort/TeraChecksum.java — a separate job proving the sorted
    // output is a PERMUTATION of the input, because an ordered output
    // that lost or duplicated records still validates on order alone):
    // order-independent FNV multiset fingerprints (the fs_copy_verify
    // machinery, one global bucket) over the pre-sort projection and
    // the sort output. Both fingerprint jobs are distributed
    // aggregations to ONE row; the crossJoins below are the
    // broadcast-scalar pattern, not data joins.
    val proj = Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_linenumber",
        round($"l_extendedprice", 2).as("l_extendedprice"))
    val inFp = MetadataOps.fnvFingerprints(proj, "in", buckets = 1)
    val outFp = MetadataOps.fnvFingerprints(sortedDf, "out", buckets = 1)
    Seq((totalRows, totalInv, firstPrice, lastPrice))
      .toDF("total_rows", "n_inversions", "first_price", "last_price")
      .crossJoin(broadcast(inFp.select($"in_rows", $"in_xor", $"in_sum")))
      .crossJoin(broadcast(outFp.select($"out_rows", $"out_xor", $"out_sum")))
      .select($"total_rows", $"n_inversions", $"first_price", $"last_price",
        $"in_xor".as("input_xor"), $"out_xor".as("output_xor"),
        ($"in_rows" === $"out_rows" && $"in_xor" === $"out_xor" &&
          $"in_sum" === $"out_sum").cast("long").as("checksum_match"))
  }

  /** QuasiMonteCarlo.java — the reference's flagship first example
    * (`hadoop jar ... pi`): sample 2-D Halton-sequence points (bases
    * {2, 3}, QuasiMonteCarlo.java:90) in the unit square, count those
    * inside the inscribed circle, estimate π. Mappers count
    * inside/outside; one reducer sums — here `spark.range` +
    * map-side-combined aggregation, the same shape.
    *
    * Everything is EXACT i64 arithmetic so the DuckDB oracle is
    * bit-reproducible: the base-2 radical inverse is a 14-bit
    * reversal `a` (x = a/2^14), the base-3 one a 9-digit reversal `b`
    * (y = b/3^9) — both unrolled sums of shift/mod terms, pure
    * codegen — and the circle test (x-1/2)²+(y-1/2)² ≤ 1/4 is cleared
    * of denominators to ((2a-2^p)·3^q)² + ((2b-3^q)·2^p)² ≤ (2^p·3^q)²
    * (magnitudes ≤ 2.1e17 — i64-safe under ANSI). π itself is emitted
    * as exact integer ppm (4e6·inside div n — the house convention;
    * a double division would invite the cross-engine rounding hazard
    * this file's oracles avoid). 10,000 points < min(2^14, 3^9). */
  def mr_pi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val n = 10000L
    val p2 = 1L << 14      // 2^14 = 16384
    val p3 = 19683L        // 3^9
    // Column./ is DOUBLE division — digit extraction must use the
    // integral `div` or the reversals silently corrupt (caught by the
    // oracle on first run: 5,244 "inside" instead of 7,851).
    val a = (0 until 14).map(j =>
      expr(s"(id div ${1L << j}) % 2 * ${1L << (13 - j)}L"))
      .reduce(_ + _)
    val b = (0 until 9).map(j =>
      expr(s"(id div ${math.pow(3, j).toLong}) % 3 * ${math.pow(3, 8 - j).toLong}L"))
      .reduce(_ + _)
    val inside = {
      val dx = (a * 2 - p2) * p3
      val dy = (b * 2 - p3) * p2
      dx * dx + dy * dy <= (p2 * p3) * (p2 * p3)
    }
    s.range(0, n)
      .select(when(inside, 1L).otherwise(0L).as("in_circle"))
      .agg(count(lit(1)).as("n_points"), sum($"in_circle").as("n_inside"))
      .withColumn("pi_ppm", expr("n_inside * 4000000 div n_points"))
  }

  /** RandomTextWriter.java — the reference's synthetic-corpus
    * generator (`hadoop jar ... randomtextwriter`; RandomWriter.java
    * is the binary twin). A generator-as-query: `spark.range` rows
    * map to deterministic pseudo-text — word k of row i indexes the
    * wordlist by the multiplicative hash (i·2654435761 + k·40503)
    * mod |words| (i64-safe products; the reference seeds
    * java.util.Random instead, which no other engine reproduces — a
    * cross-engine-deterministic generator must use portable
    * arithmetic). Emits (row_id, text, n_words, n_chars); the DuckDB
    * oracle regenerates every byte identically, proving the corpus is
    * a pure function of the row id — re-runnable on any cluster, any
    * partitioning, any retry. Scan-speed map at any scale. */
  def mr_randomtextwriter(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val n = 10000L
    val wordsPerRow = 10
    val wordCols = (0 until wordsPerRow).map { k =>
      element_at(typedLit(GenWords),
        ((($"id".cast("long") * 2654435761L + lit(k.toLong) * 40503L)
          % GenWords.length) + 1).cast("int"))
    }
    s.range(0, n)
      .select($"id".as("row_id"), concat_ws(" ", wordCols: _*).as("text"))
      .withColumn("n_words", lit(wordsPerRow.toLong))
      .withColumn("n_chars", length($"text").cast("long"))
      .orderBy($"row_id")
  }

  /** Wordlist for [[mr_randomtextwriter]] — original (the reference
    * ships a 1000-word hardcoded list at RandomTextWriter.java; ours
    * is deliberately NOT that list, just the same mechanism). */
  val GenWords: Seq[String] = Seq(
    "ash", "birch", "cedar", "dawn", "ember", "fjord", "glade", "harbor",
    "iris", "juniper", "kiln", "larch", "meadow", "north", "orchard",
    "pine", "quarry", "ridge", "spruce", "thicket", "upland", "vale",
    "willow", "xylem", "yarrow", "zephyr", "anchor", "basalt", "cobble",
    "delta", "estuary", "flint", "granite", "heath", "inlet", "jetty",
    "knoll", "lagoon", "marsh", "nettle", "oxbow", "pebble", "quartz",
    "reed", "shale", "tundra", "umber", "verge", "wharf", "yew")

  /** BaileyBorweinPlouffe.java — the reference's OTHER π example: the
    * BBP spigot computes hex digit d of π WITHOUT the preceding
    * digits, so digit ranges distribute to mappers with no shared
    * state (the reference job partitions digit ranges exactly this
    * way). Per digit d: {16^(d-1)·π} from the four BBP sums
    * Σ_k 16^(d-1-k)/(8k+j), j ∈ {1,4,5,6}, head terms reduced mod
    * (8k+j), everything in 2^-48 FIXED-POINT i64 (never a double —
    * identical truncation on both engines makes the DuckDB oracle
    * bit-reproducible; a float formulation would hash-diverge in the
    * last ulp). 12 digits: max shift 44 bits, max numerator
    * m·2^48 < 2^55 — ANSI-safe. Emits (pos, hex_digit), which must
    * read 243F6A8885A3 — π's actual hex expansion, the strongest
    * self-check an example can have. Embarrassingly parallel map at
    * any digit count; only the fixed-point width caps the range. */
  def mr_bbp(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val S = 48
    val mask = (1L << S) - 1
    s.range(1, 13).as[Long].map { pos =>
      def sumJ(j: Long): Long = {
        var acc = 0L
        var k = 0L
        while (k <= pos - 1) {
          val m = 8 * k + j
          val e = pos - 1 - k
          acc = (acc + (((1L << (4 * e)) % m) << S) / m) & mask
          k += 1
        }
        var e = 1
        while (4 * e <= S) {
          val m = 8 * (pos - 1 + e) + j
          acc = (acc + (1L << (S - 4 * e)) / m) & mask
          e += 1
        }
        acc
      }
      val x = (((4 * sumJ(1) - 2 * sumJ(4) - sumJ(5) - sumJ(6)) % (1L << S))
        + (1L << S)) & mask
      (pos, "0123456789ABCDEF".charAt((x >>> (S - 4)).toInt).toString)
    }.toDF("pos", "hex_digit").orderBy($"pos")
  }

  /** GridMix-style trace-driven workload plan (reference:
    * hadoop-tools/hadoop-gridmix — GridMix reads a job trace and
    * synthesizes a replay workload bucketed by job size class and
    * submission time). The events log plays the trace: each
    * (user, day) group is one job run — task count = events, input
    * volume = Σ value (exact integer cents), submit hour = the run's
    * first event. Jobs classify into GridMix's size tiers (SMALL < 10
    * tasks ≤ MEDIUM < 50 ≤ LARGE — fixed thresholds, deterministic),
    * and the emitted plan is the per-(submit-hour, class) replay
    * schedule: how many jobs to synthesize, with how many tasks and
    * how much input. Two map-side-combined aggregations — trace
    * summarization is a rollup, scale-trivial; fully integer, so the
    * DuckDB oracle hash-matches. */
  def mr_gridmix_plan(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val jobs = Tables.events(s, d)
      .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n_tasks"),
        sum(round($"value" * 100).cast("long")).as("input_centi"),
        hour(min($"ts")).as("submit_hour"))
      .withColumn("job_class",
        when($"n_tasks" < 10, "SMALL")
          .when($"n_tasks" < 50, "MEDIUM")
          .otherwise("LARGE"))
    jobs.groupBy($"submit_hour", $"job_class")
      .agg(count(lit(1)).as("n_jobs"),
        sum($"n_tasks").as("total_tasks"),
        sum($"input_centi").as("total_input_centi"))
      .orderBy($"submit_hour", $"job_class")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mr_gridmix_plan" -> mr_gridmix_plan _,
    "mr_bbp" -> mr_bbp _,
    "mr_pi" -> mr_pi _,
    "mr_randomtextwriter" -> mr_randomtextwriter _,
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
    "mr_gridmix_plan" ->
      """WITH jobs AS (
        |  SELECT user_id, date_trunc('day', ts) AS day,
        |    count(*) AS n_tasks,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS input_centi,
        |    CAST(hour(min(ts)) AS INTEGER) AS submit_hour
        |  FROM events GROUP BY 1, 2),
        |cls AS (
        |  SELECT submit_hour,
        |    CASE WHEN n_tasks < 10 THEN 'SMALL'
        |         WHEN n_tasks < 50 THEN 'MEDIUM'
        |         ELSE 'LARGE' END AS job_class,
        |    n_tasks, input_centi
        |  FROM jobs)
        |SELECT submit_hour, job_class, count(*) AS n_jobs,
        |  CAST(sum(n_tasks) AS BIGINT) AS total_tasks,
        |  CAST(sum(input_centi) AS BIGINT) AS total_input_centi
        |FROM cls GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Identical 2^-48 fixed-point BBP arithmetic; the per-j sums are
    // generated from one template so Spark and DuckDB cannot drift.
    "mr_bbp" -> {
      val m48 = "281474976710656" // 2^48
      def sj(j: Int): String =
        s"((CAST(list_sum(list_transform(range(pos), k -> " +
          s"(((1::BIGINT << CAST(4*(pos-1-k) AS BIGINT)) % (8*k+$j)) << 48) // (8*k+$j))) AS BIGINT)" +
          s" + CAST(list_sum(list_transform(range(1, 13), e -> " +
          s"CASE WHEN 4*e <= 48 THEN (1::BIGINT << CAST(48-4*e AS BIGINT)) // (8*(pos-1+e)+$j) ELSE 0 END)) AS BIGINT)" +
          s") % $m48)"
      s"""WITH digits AS (SELECT CAST(pos AS BIGINT) AS pos FROM range(1, 13) AS t(pos)),
         |x AS (
         | SELECT pos,
         |  ((4*${sj(1)} - 2*${sj(4)} - ${sj(5)} - ${sj(6)}) % $m48 + $m48) % $m48 AS frac
         | FROM digits)
         |SELECT pos, substr('0123456789ABCDEF', CAST(frac >> 44 AS BIGINT) + 1, 1) AS hex_digit
         |FROM x ORDER BY pos""".stripMargin
    },
    // Same unrolled exact-integer Halton + cleared-denominator circle
    // test as the Spark side — built programmatically so the 14+9
    // digit terms can't drift between the two engines' texts.
    "mr_pi" -> {
      val a = (0 until 14).map(j =>
        s"((i // ${1L << j}) % 2) * ${1L << (13 - j)}").mkString(" + ")
      val b = (0 until 9).map(j =>
        s"((i // ${math.pow(3, j).toLong}) % 3) * ${math.pow(3, 8 - j).toLong}")
        .mkString(" + ")
      s"""WITH pts AS (
         | SELECT i, $a AS a, $b AS b
         | FROM range(10000) AS t(i)),
         |c AS (
         | SELECT count(*) AS n_points,
         |  CAST(sum(CASE WHEN
         |    ((a*2 - 16384) * 19683) * ((a*2 - 16384) * 19683)
         |     + ((b*2 - 19683) * 16384) * ((b*2 - 19683) * 16384)
         |     <= (16384::BIGINT * 19683) * (16384::BIGINT * 19683)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_inside
         | FROM pts)
         |SELECT n_points, n_inside,
         | n_inside * 4000000 // n_points AS pi_ppm FROM c""".stripMargin
    },
    // Regenerates every byte of the corpus from the row id alone —
    // the proof the generator is engine/partitioning/retry-portable.
    "mr_randomtextwriter" -> {
      val wl = GenWords.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""SELECT i AS row_id,
         | array_to_string(list_transform(range(10), k ->
         |   $wl[CAST((i * 2654435761 + k * 40503) % ${GenWords.length} AS BIGINT) + 1]), ' ') AS text,
         | CAST(10 AS BIGINT) AS n_words,
         | CAST(length(array_to_string(list_transform(range(10), k ->
         |   $wl[CAST((i * 2654435761 + k * 40503) % ${GenWords.length} AS BIGINT) + 1]), ' ')) AS BIGINT) AS n_chars
         |FROM range(10000) AS t(i) ORDER BY 1""".stripMargin
    },
    // The checksum columns re-derive the fs_copy_verify FNV multiset
    // fingerprint (cents-canonical doubles, chr(1) separators, columns
    // in sorted-name order: l_extendedprice, l_linenumber, l_orderkey)
    // over lineitem ONCE — input and output fingerprints are equal by
    // definition for a permutation, so the oracle emits the same value
    // twice; a Spark-side sort that loses or duplicates rows flips
    // checksum_match and the hash mismatches.
    "mr_sort_validate" ->
      """WITH canon AS (
        |  SELECT
        |    CAST(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS VARCHAR) || chr(1) ||
        |    CAST(l_linenumber AS VARCHAR) || chr(1) ||
        |    CAST(l_orderkey AS VARCHAR) AS cs
        |  FROM lineitem),
        |fp AS (
        |  SELECT list_reduce(
        |    list_prepend(1469598103934665603::HUGEINT,
        |      list_transform(string_split(cs, ''), ch -> ascii(ch)::HUGEINT)),
        |    (acc, c) -> (xor(acc, c) * 1099511628211::HUGEINT)
        |                % 18446744073709551616::HUGEINT) AS h
        |  FROM canon),
        |x AS (
        |  SELECT CAST(bit_xor(
        |    CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
        |         THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT))
        |    AS BIGINT) AS xr
        |  FROM fp)
        |SELECT CAST(count(*) AS BIGINT) AS total_rows,
        | CAST(0 AS BIGINT) AS n_inversions,
        | round(max(l_extendedprice),2) AS first_price,
        | round(min(l_extendedprice),2) AS last_price,
        | x.xr AS input_xor, x.xr AS output_xor,
        | CAST(1 AS BIGINT) AS checksum_match
        |FROM lineitem, x GROUP BY x.xr""".stripMargin,
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
