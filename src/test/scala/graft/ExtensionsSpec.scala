package graft

import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.SqlSurface

/** The SQL functions injected by [[GraftExtensions]] must plan the
  * same expressions as the Column API — asserted by running both forms
  * over real testdata and comparing results exactly.
  */
class ExtensionsSpec extends SparkSpec {

  test("graft_simhash64/graft_word_ngram_hashes SQL == Column API") {
    import spark.implicits._
    SqlSurface.registerViews(spark, sf0001)
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash64(graft_word_ngram_hashes(text, 3)) AS sh
        |FROM documents ORDER BY doc_id""".stripMargin).collect()
    val viaApi = Tables.documents(spark, sf0001)
      .select($"doc_id",
        TextFunctions.simhash64(TextFunctions.shingleHashes($"text", 3)).as("sh"))
      .orderBy($"doc_id").collect()
    assert(viaSql.nonEmpty && viaSql.toSeq == viaApi.toSeq)
  }

  test("graft_cosine SQL == Column API on embeddings") {
    import spark.implicits._
    SqlSurface.registerViews(spark, sf0001)
    val viaSql = spark.sql(
      """SELECT a.vec_id, b.vec_id AS vec_id2,
        | graft_cosine(a.embedding, b.embedding) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id
        |ORDER BY a.vec_id""".stripMargin).collect()
    val e = Tables.embeddings(spark, sf0001)
    val viaApi = e.alias("a").join(e.alias("b"),
        $"a.vec_id" + 1 === $"b.vec_id")
      .select($"a.vec_id", $"b.vec_id".as("vec_id2"),
        VectorFunctions.cosine($"a.embedding", $"b.embedding").as("cos"))
      .orderBy($"a.vec_id").collect()
    assert(viaSql.nonEmpty && viaSql.toSeq == viaApi.toSeq)
  }

  test("graft_containment_sorted/graft_word_ngrams SQL == Column API") {
    import spark.implicits._
    SqlSurface.registerViews(spark, sf0001)
    val viaSql = spark.sql(
      """SELECT a.doc_id, b.doc_id AS doc_id2,
        | graft_containment_sorted(graft_word_ngram_hashes(a.text, 3),
        |   graft_word_ngram_hashes(b.text, 3)) AS c,
        | graft_word_ngrams(a.text, 2) AS bi
        |FROM documents a JOIN documents b ON a.doc_id + 1 = b.doc_id
        |ORDER BY a.doc_id""".stripMargin).collect()
    val t = Tables.documents(spark, sf0001)
    val viaApi = t.alias("a").join(t.alias("b"), $"a.doc_id" + 1 === $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id".as("doc_id2"),
        TextFunctions.containmentSorted(
          TextFunctions.shingleHashes($"a.text", 3),
          TextFunctions.shingleHashes($"b.text", 3)).as("c"),
        TextFunctions.wordNgramsAll($"a.text", 2).as("bi"))
      .orderBy($"a.doc_id").collect()
    assert(viaSql.nonEmpty && viaSql.toSeq == viaApi.toSeq)
  }

  test("graft_intersect_count_sorted SQL == Column API") {
    import spark.implicits._
    SqlSurface.registerViews(spark, sf0001)
    val viaSql = spark.sql(
      """SELECT a.doc_id, b.doc_id AS doc_id2,
        | graft_intersect_count_sorted(graft_word_ngram_hashes(a.text, 3),
        |   graft_word_ngram_hashes(b.text, 3)) AS inter
        |FROM documents a JOIN documents b ON a.doc_id + 1 = b.doc_id
        |ORDER BY a.doc_id""".stripMargin).collect()
    val t = Tables.documents(spark, sf0001)
    val viaApi = t.alias("a").join(t.alias("b"), $"a.doc_id" + 1 === $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id".as("doc_id2"),
        TextFunctions.intersectCountSorted(
          TextFunctions.shingleHashes($"a.text", 3),
          TextFunctions.shingleHashes($"b.text", 3)).as("inter"))
      .orderBy($"a.doc_id").collect()
    assert(viaSql.nonEmpty && viaSql.toSeq == viaApi.toSeq)
  }

  test("graft SQL functions reject bad argument types at analysis time") {
    SqlSurface.registerViews(spark, sf0001)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_simhash64(text) FROM documents").collect()
    }
    assert(e.getMessage.contains("graft_simhash64"), e.getMessage)
  }

  test("graft SQL functions reject wrong arity with a named analysis error") {
    SqlSurface.registerViews(spark, sf0001)
    val none = intercept[Exception] {
      spark.sql("SELECT graft_simhash64() FROM documents").collect()
    }
    assert(none.getMessage.contains("graft_simhash64") &&
      none.getMessage.contains("expects exactly 1"), none.getMessage)
    val extra = intercept[Exception] {
      spark.sql("SELECT graft_cosine(embedding, embedding, embedding) FROM embeddings").collect()
    }
    assert(extra.getMessage.contains("graft_cosine") &&
      extra.getMessage.contains("expects exactly 2"), extra.getMessage)
  }
}
