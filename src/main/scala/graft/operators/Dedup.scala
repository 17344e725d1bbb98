package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.5 Deduplication — the LLM-training-data pipeline operators.
  * Every candidate-generation step is an equi-join on a computed key
  * (hash bucket, LSH band, length block), never an inequality or cross
  * join, so each scales as a plain shuffled join at 100 TB. Pair
  * enumeration only ever happens inside a bucket.
  */
object Dedup {

  /** Exact dedup: md5 content hash → keep lowest doc_id per group.
    * Output is the full dedup map (hash, keeper, group size). */
  def dedup_exact(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .groupBy(md5($"text".cast("binary")).as("content_hash"))
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n_docs"))
      .orderBy($"content_hash")
  }

  /** MinHash + LSH near-dup detection: word-3-gram shingles → 32-perm
    * minhash → 8 bands × 4 rows → band-bucket equi-join → candidate
    * pairs, scored by signature agreement (Jaccard estimate ≥ 0.5).
    */
  def dedup_minhash_lsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val k = 32; val bands = 8; val r = 4
    val sigs = Tables.documents(s, d)
      .select($"doc_id", minhashSignature(shingleHashes($"text", 3), k).as("sig"))
    val buckets = sigs
      .select($"doc_id", $"sig", explode(bandKeys($"sig", bands, r)).as("bk"))
      .select($"doc_id", $"sig", $"bk.band", $"bk.bkey")
    val right = buckets
      .select($"band".as("band2"), $"bkey".as("bkey2"),
        $"doc_id".as("doc_id2"), $"sig".as("sig2"))
    buckets.join(right,
        $"band" === $"band2" && $"bkey" === $"bkey2" && $"doc_id" < $"doc_id2")
      .select($"doc_id", $"doc_id2",
        (aggregate(zip_with($"sig", $"sig2",
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / k).as("est_jaccard"))
      .distinct()
      .filter($"est_jaccard" >= 0.5)
      .select($"doc_id", $"doc_id2", round($"est_jaccard", 4).as("est_jaccard"))
      .orderBy($"doc_id", $"doc_id2")
  }

  /** SimHash near-dup: 64-bit simhash over shingle hashes; 4×16-bit
    * chunk blocking (pigeonhole-complete for hamming ≤ 3), then exact
    * hamming via bit_count(a ^ b) — single codegen'd instruction. */
  def dedup_simhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sh = Tables.documents(s, d)
      .select($"doc_id", simhash64(shingleHashes($"text", 3)).as("simhash"))
    val chunks = sh.select($"doc_id", $"simhash",
        explode(array((0 until 4).map { i =>
          struct(lit(i).as("chunk"),
            shiftrightunsigned($"simhash", 16 * i).bitwiseAND(lit(0xFFFFL)).as("ckey"))
        }: _*)).as("c"))
      .select($"doc_id", $"simhash", $"c.chunk", $"c.ckey")
    val right = chunks.select($"chunk".as("chunk2"), $"ckey".as("ckey2"),
      $"doc_id".as("doc_id2"), $"simhash".as("simhash2"))
    chunks.join(right,
        $"chunk" === $"chunk2" && $"ckey" === $"ckey2" && $"doc_id" < $"doc_id2")
      .select($"doc_id", $"doc_id2",
        bit_count($"simhash".bitwiseXOR($"simhash2")).as("hamming"))
      .distinct()
      .filter($"hamming" <= 3)
      .orderBy($"doc_id", $"doc_id2")
  }

  /** Exact n-gram Jaccard on length-blocked candidates: docs land in
    * size buckets (and their right neighbor), bucket equi-join, then
    * exact set Jaccard ≥ 0.5 via array_intersect/array_union. */
  def dedup_ngram_jaccard(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"doc_id", wordNgramSet($"text", 3).as("grams"),
        floor($"n_chars" / 64).as("bucket"))
    val probe = docs.select($"doc_id", $"grams",
      explode(array($"bucket", $"bucket" + 1)).as("bkey"))
    val build = docs.select($"bucket".as("bkey2"),
      $"doc_id".as("doc_id2"), $"grams".as("grams2"))
    probe.join(build, $"bkey" === $"bkey2" && $"doc_id" < $"doc_id2")
      .select($"doc_id", $"doc_id2", jaccard($"grams", $"grams2").as("j"))
      .distinct()
      .filter($"j" >= 0.5)
      .select($"doc_id", $"doc_id2", round($"j", 4).as("jaccard"))
      .orderBy($"doc_id", $"doc_id2")
  }

  /** Embedding-cosine near-dup, label-blocked; double-precision cosine
    * matches DuckDB's list_cosine_similarity over DOUBLE[] bit-for-bit.
    */
  def dedup_embedding(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, d)
    val a = e.select($"label", $"vec_id", $"embedding")
    val b = e.select($"label".as("label2"), $"vec_id".as("vec_id2"),
      $"embedding".as("embedding2"))
    a.join(b, $"label" === $"label2" && $"vec_id" < $"vec_id2")
      .select($"label", $"vec_id", $"vec_id2",
        VectorFunctions.cosine($"embedding", $"embedding2").as("cos"))
      .filter($"cos" >= 0.35)
      .select($"label", $"vec_id", $"vec_id2", round($"cos", 6).as("cos_sim"))
      .orderBy($"vec_id", $"vec_id2")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> dedup_exact _,
    "dedup_minhash_lsh" -> dedup_minhash_lsh _,
    "dedup_simhash" -> dedup_simhash _,
    "dedup_ngram_jaccard" -> dedup_ngram_jaccard _,
    "dedup_embedding" -> dedup_embedding _)

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper, count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_embedding" ->
      """SELECT a.label, a.vec_id, b.vec_id AS vec_id2,
        | round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |   CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
        |FROM embeddings a JOIN embeddings b
        | ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |   CAST(b.embedding AS DOUBLE[])) >= 0.35
        |ORDER BY a.vec_id, b.vec_id""".stripMargin)
}
