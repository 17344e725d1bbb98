package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.{GraftExpressions, WinnowStatsExpr}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.7 Text analysis for training-data curation: quality scoring,
  * token counting, language ID, fingerprinting. All per-row map work —
  * no shuffles — so these pipeline at scan speed over 100 TB.
  */
object TextOps {

  private val stopwords = Seq("the", "a", "an", "of", "and", "to", "in", "is", "it")

  /** Length / punctuation / stopword / repetition heuristics + a
    * composite quality score (C4/Gopher-style rule scoring). */
  def text_quality(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = tokens($"text")
    val nWords = size(t).cast("long")
    val nStop = size(filter(t, w => w.isInCollection(stopwords))).cast("long")
    val nUniq = size(array_distinct(t)).cast("long")
    val nPunct = (length($"text") -
      length(regexp_replace($"text", "[.!?,;:]", ""))).cast("long")
    Tables.documents(s, d)
      .select($"doc_id", length($"text").cast("long").as("n_chars_m"),
        nWords.as("n_words"),
        round(when(nWords === 0, 0.0).otherwise(nStop.cast("double") / nWords), 4)
          .as("stopword_ratio"),
        round(when(nWords === 0, 0.0).otherwise(nUniq.cast("double") / nWords), 4)
          .as("uniq_ratio"),
        nPunct.as("n_punct"),
        round(when(nWords === 0, 0.0)
          .otherwise(length(regexp_replace($"text", " ", "")).cast("double") / nWords), 4)
          .as("avg_word_len"))
      .withColumn("quality_score",
        round(when($"n_words" >= 20, 1.0).otherwise(0.5) * $"uniq_ratio" *
          when($"stopword_ratio" > 0.01, 1.0).otherwise(0.8), 4))
      .orderBy($"doc_id")
  }

  /** Whitespace + BPE-ish regex token counts per document. */
  def text_tokens(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        size(tokens($"text")).cast("long").as("n_ws_tokens"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("n_bpe_tokens"),
        length($"text").cast("long").as("n_chars_m"))
      .orderBy($"doc_id")
  }

  /** N-gram-heuristic language ID: score each language's stopword/
    * marker profile against the token set, argmax wins. (The synthetic
    * corpus is English-vocabulary throughout, so this reports what the
    * heuristic actually sees — prediction + labeled lang.) */
  def text_langid(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
      "fr" -> Seq("le", "la", "et", "les", "des", "un", "une"),
      "es" -> Seq("el", "la", "y", "los", "las", "un", "una"),
      "de" -> Seq("der", "die", "und", "das", "ein", "eine", "ist"),
      "zh" -> Seq("de", "shi", "le", "zai", "you", "wo", "ta"))
    val t = tokens($"text")
    val scored = profiles.map { case (lang, words) =>
      struct(size(filter(t, w => w.isInCollection(words))).as("score"),
        lit(lang).as("lang"))
    }
    Tables.documents(s, d)
      .select($"doc_id", $"lang".as("labeled_lang"),
        greatest(scored: _*).getField("lang").as("pred_lang"),
        greatest(scored: _*).getField("score").cast("long").as("pred_score"))
      .orderBy($"doc_id")
  }

  /** Winnowing-style rolling-hash fingerprint: char-5-gram hashes,
    * window-8 minima, fingerprint = FNV fold of the distinct minima —
    * all in one codegen'd pass ([[WinnowStatsExpr]]; the column-level
    * slice/array_min formulation was O(grams²) interpreted and hung the
    * sf0.1 bench once the sink materialized it). */
  def text_fingerprint(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val stats = GraftExpressions.toColumn(
      WinnowStatsExpr(GraftExpressions.toExpr($"text"), 5, 8))
    Tables.documents(s, d)
      .select($"doc_id", stats.as("st"))
      .select($"doc_id", $"st".getItem(0).as("n_grams"),
        $"st".getItem(1).as("n_selected"), $"st".getItem(2).as("fingerprint"))
      .orderBy($"doc_id")
  }

  /** END-TO-END curation pipeline — the composition a training-data
    * run actually executes: score quality → drop short/low-quality
    * docs → drop exact-duplicate non-keepers → emit the curated set.
    * The quality stage is the same per-row scoring as [[text_quality]]
    * (scan-speed map); the dedup stage keeps each content hash's min
    * doc_id via a window min — ONE scan and ONE shuffle on the content
    * hash (a groupBy-keepers + join-back self-join would recompute the
    * scoring lineage once per join side). Hash-oracled end to end —
    * this is the one dedup-involving query whose FULL composition the
    * DuckDB oracle can verify. */
  def text_pipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = tokens($"text")
    val nWords = size(t).cast("long")
    val nStop = size(filter(t, w => w.isInCollection(stopwords))).cast("long")
    val nUniq = size(array_distinct(t)).cast("long")
    val scored = Tables.documents(s, d)
      .select($"doc_id", md5($"text".cast("binary")).as("h"),
        nWords.as("n_words"),
        round(when(nWords === 0, 0.0).otherwise(nStop.cast("double") / nWords), 4)
          .as("stopword_ratio"),
        round(when(nWords === 0, 0.0).otherwise(nUniq.cast("double") / nWords), 4)
          .as("uniq_ratio"))
      .withColumn("quality_score",
        round(when($"n_words" >= 20, 1.0).otherwise(0.5) * $"uniq_ratio" *
          when($"stopword_ratio" > 0.01, 1.0).otherwise(0.8), 4))
      .filter($"n_words" >= 10 && $"quality_score" >= 0.5)
    scored
      .withColumn("keeper",
        min($"doc_id").over(org.apache.spark.sql.expressions.Window.partitionBy($"h")))
      .filter($"doc_id" === $"keeper")
      .select($"doc_id", $"n_words", $"quality_score")
      .orderBy($"doc_id")
  }

  /** Corpus token accounting — the first question any training run
    * asks of a dataset: how many tokens, and how are they distributed
    * over documents? Output is a 50-token-wide histogram of per-doc
    * BPE-ish token counts carrying doc counts, bucket token totals,
    * and each bucket's share of the corpus total (via a broadcast
    * scalar, not an unpartitioned window). One scan + one tiny agg at
    * 100 TB; the tokenizer is the same codegen'd regex as
    * [[text_tokens]], so the histogram is hash-oracled. The share is
    * EXACT integer parts-per-million (decimal widening + integral
    * division — truncation on both engines), not `round(double, 6)`:
    * Spark rounds through BigDecimal HALF_UP while DuckDB computes
    * `round(x*1e6)/1e6` in floating point, and the two can differ by
    * one ULP — the r5 hash mismatch on this query. */
  def text_token_hist(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perDoc = Tables.documents(s, d)
      .select(size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
        .cast("long").as("n_tokens"))
    val hist = perDoc
      .groupBy(($"n_tokens" - pmod($"n_tokens", lit(50L))).as("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("bucket_tokens"))
    hist
      .crossJoin(broadcast(hist.agg(sum($"bucket_tokens").as("corpus_tokens"))))
      .select($"bucket_lo", $"n_docs", $"bucket_tokens",
        expr("CAST((CAST(bucket_tokens AS DECIMAL(38,0)) * 1000000) DIV corpus_tokens AS BIGINT)")
          .as("share_ppm"))
      .orderBy($"bucket_lo")
  }

  /** Deterministic hash-based train/validation/test split — the
    * assignment step every training-data pipeline runs last. The
    * bucket is a pure function of doc_id (first 8 hex digits of
    * md5 → mod 100: train < 90, validation < 95, else test), so the
    * split is stable across runs, machines, and engines — no seeded
    * RNG whose draw order depends on partitioning. Per-row map work,
    * scan speed at 100 TB; the same expression is SQL-expressible in
    * DuckDB, so the assignment itself is hash-oracled. */
  def text_split(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", $"lang",
        (conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
          .cast("long") % 100).as("bucket"))
      .withColumn("split",
        when($"bucket" < 90, "train")
          .when($"bucket" < 95, "validation")
          .otherwise("test"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_quality" -> text_quality _,
    "text_tokens" -> text_tokens _,
    "text_langid" -> text_langid _,
    "text_fingerprint" -> text_fingerprint _,
    "text_pipeline" -> text_pipeline _,
    "text_split" -> text_split _,
    "text_token_hist" -> text_token_hist _)

  val oracle: Map[String, String] = Map(
    "text_quality" ->
      """SELECT doc_id, n_chars_m, n_words, stopword_ratio, uniq_ratio, n_punct, avg_word_len,
        | round((CASE WHEN n_words >= 20 THEN 1.0 ELSE 0.5 END) * uniq_ratio *
        |   (CASE WHEN stopword_ratio > 0.01 THEN 1.0 ELSE 0.8 END), 4) AS quality_score
        |FROM (
        | SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_m,
        |  CAST(len(words) AS BIGINT) AS n_words,
        |  round(CASE WHEN len(words) = 0 THEN 0.0 ELSE
        |    CAST(len(list_filter(words, w -> w IN ('the','a','an','of','and','to','in','is','it'))) AS DOUBLE)
        |    / len(words) END, 4) AS stopword_ratio,
        |  round(CASE WHEN len(words) = 0 THEN 0.0 ELSE
        |    CAST(len(list_distinct(words)) AS DOUBLE) / len(words) END, 4) AS uniq_ratio,
        |  CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS BIGINT) AS n_punct,
        |  round(CASE WHEN len(words) = 0 THEN 0.0 ELSE
        |    CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) / len(words) END, 4) AS avg_word_len
        | FROM (SELECT doc_id, text,
        |   list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
        |  FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "text_tokens" ->
      """SELECT doc_id,
        | CAST(len(list_filter(string_split(lower(text), ' '), w -> w <> '')) AS BIGINT) AS n_ws_tokens,
        | CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
        | CAST(length(text) AS BIGINT) AS n_chars_m
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_pipeline" ->
      """WITH scored AS (
        | SELECT doc_id, md5(text) AS h,
        |  CAST(len(words) AS BIGINT) AS n_words,
        |  round((CASE WHEN len(words) >= 20 THEN 1.0 ELSE 0.5 END)
        |   * round(CASE WHEN len(words) = 0 THEN 0.0 ELSE
        |      CAST(len(list_distinct(words)) AS DOUBLE) / len(words) END, 4)
        |   * (CASE WHEN round(CASE WHEN len(words) = 0 THEN 0.0 ELSE
        |      CAST(len(list_filter(words, w -> w IN ('the','a','an','of','and','to','in','is','it'))) AS DOUBLE)
        |      / len(words) END, 4) > 0.01 THEN 1.0 ELSE 0.8 END), 4) AS quality_score
        | FROM (SELECT doc_id, text,
        |   list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
        |  FROM documents)),
        |kept AS (SELECT * FROM scored WHERE n_words >= 10 AND quality_score >= 0.5)
        |SELECT k.doc_id, k.n_words, k.quality_score
        |FROM kept k JOIN (SELECT h, min(doc_id) AS doc_id FROM kept GROUP BY 1) m
        | ON k.h = m.h AND k.doc_id = m.doc_id
        |ORDER BY k.doc_id""".stripMargin,
    "text_token_hist" ->
      """WITH perdoc AS (
        | SELECT CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens
        | FROM documents),
        |hist AS (
        | SELECT n_tokens - (n_tokens % 50) AS bucket_lo,
        |  count(*) AS n_docs, sum(n_tokens) AS bucket_tokens
        | FROM perdoc GROUP BY 1)
        |SELECT bucket_lo, n_docs, bucket_tokens,
        | CAST((CAST(bucket_tokens AS HUGEINT) * 1000000)
        |   // (SELECT sum(bucket_tokens) FROM hist) AS BIGINT) AS share_ppm
        |FROM hist ORDER BY bucket_lo""".stripMargin,
    "text_split" ->
      """WITH b AS (
        | SELECT doc_id, lang,
        |  CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
        |    % 100 AS BIGINT) AS bucket
        | FROM documents)
        |SELECT doc_id, lang, bucket,
        | CASE WHEN bucket < 90 THEN 'train'
        |      WHEN bucket < 95 THEN 'validation'
        |      ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    // list_sort(structs,'DESC')[1] = max by (score, lang) lexicographic,
    // the same tie-break as Spark's greatest(struct(score, lang))
    "text_langid" ->
      """SELECT doc_id, labeled_lang, best.lang AS pred_lang,
        | CAST(best.score AS BIGINT) AS pred_score
        |FROM (
        | SELECT doc_id, lang AS labeled_lang, list_sort([
        |  {'score': len(list_filter(words, w -> w IN ('the','a','of','and','is','to','in'))), 'lang': 'en'},
        |  {'score': len(list_filter(words, w -> w IN ('le','la','et','les','des','un','une'))), 'lang': 'fr'},
        |  {'score': len(list_filter(words, w -> w IN ('el','la','y','los','las','un','una'))), 'lang': 'es'},
        |  {'score': len(list_filter(words, w -> w IN ('der','die','und','das','ein','eine','ist'))), 'lang': 'de'},
        |  {'score': len(list_filter(words, w -> w IN ('de','shi','le','zai','you','wo','ta'))), 'lang': 'zh'}
        |  ], 'DESC')[1] AS best
        | FROM (SELECT doc_id, lang,
        |   list_filter(string_split(lower(text), ' '), w -> w <> '') AS words
        |  FROM documents))
        |ORDER BY doc_id""".stripMargin)
}
