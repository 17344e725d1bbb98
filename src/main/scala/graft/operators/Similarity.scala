package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.6 Similarity search over the embeddings table.
  *
  * Brute force: the query set is small → broadcast it and stream the
  * corpus; ranking is a per-query window (top-k inside each partition
  * first via AQE). LSH: random-hyperplane signatures bucket the corpus,
  * candidates come from an equi-join on (bucket), so the 100 TB path
  * never materializes the full cross product.
  */
object Similarity {

  /** Brute-force cosine top-5 neighbors for query vectors vec_id < 16. */
  def ann_topk_brute(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, d)
    val q = e.filter($"vec_id" < 16)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val scored = e.select($"vec_id".as("nid"), $"embedding")
      .crossJoin(broadcast(q))
      .filter($"nid" =!= $"qid")
      .select($"qid", $"nid", cosine($"qvec", $"embedding").as("cos"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"nid")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"qid", $"rank", $"nid", round($"cos", 6).as("cos_sim"))
      .orderBy($"qid", $"rank")
  }

  /** LSH-bucketed approximate top-k: 12 hyperplane sign bits → bucket;
    * neighbors ranked within the query's bucket only. */
  def ann_lsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val planes = randomPlanes(12, 64)
    val e = Tables.embeddings(s, d)
      .select($"vec_id", $"embedding",
        hyperplaneSignature($"embedding", planes).as("bucket"))
    val q = e.filter($"vec_id" < 16)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"), $"bucket".as("qbucket"))
    val cand = e.join(q, $"bucket" === $"qbucket" && $"vec_id" =!= $"qid")
    cand.select($"qid", $"vec_id".as("nid"),
        cosine($"qvec", $"embedding").as("cos"), $"qbucket")
      .withColumn("rank", row_number().over(Window.partitionBy($"qid")
        .orderBy($"cos".desc, $"nid")))
      .filter($"rank" <= 5)
      .select($"qid", $"rank", $"nid", round($"cos", 6).as("cos_sim"))
      .orderBy($"qid", $"rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk_brute" -> ann_topk_brute _,
    "ann_lsh" -> ann_lsh _)

  val oracle: Map[String, String] = Map(
    "ann_topk_brute" ->
      """SELECT qid, rank, nid, round(cos, 6) AS cos_sim FROM (
        |  SELECT q.vec_id AS qid, c.vec_id AS nid,
        |   list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |     CAST(c.embedding AS DOUBLE[])) AS cos,
        |   row_number() OVER (PARTITION BY q.vec_id
        |     ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |       CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
        |  FROM embeddings q, embeddings c
        |  WHERE q.vec_id < 16 AND c.vec_id <> q.vec_id)
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin)
}
