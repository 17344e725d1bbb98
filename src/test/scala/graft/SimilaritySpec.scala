package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** ANN and near-dup recall guarantees — the checks that keep ann_lsh
  * from ever regressing to the r1 empty-output state. */
class SimilaritySpec extends SparkSpec {

  test("ann_topk_filtered: predicate inside the search, not a post-filter") {
    import spark.implicits._
    val got = Similarity.ann_topk_filtered(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // every neighbor shares its query's label
    val labels = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    got.foreach { case (qid, qlabel, _, nid) =>
      assert(labels(qid) == qlabel && labels(nid) == qlabel,
        s"neighbor $nid of query $qid violates the label predicate")
    }
    // the filtered top-5 is the top-5 OF the qualifying subset —
    // driver-side recomputation over the label-restricted corpus
    val vecs = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (0 until a.length).foreach { i =>
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val want = vecs.keys.toSeq
        .filter(n => n != qid && labels(n) == labels(qid))
        .map(n => (n, cos(vecs(qid), vecs(n))))
        .sortBy { case (n, c) => (-c, n) }.take(5).map(_._1)
      val have = rows.sortBy(_._3).map(_._4).toSeq
      assert(have == want, s"query $qid: $have != $want")
    }
    // and it differs from post-filtering the unfiltered top-5 for at
    // least one query (the starvation case the operator exists for)
    val brutePost = Similarity.ann_topk_brute(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .filter { case (q, n) => labels(q) == labels(n) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val filteredSets = got.groupBy(_._1).view.mapValues(_.map(_._4).toSet).toMap
    assert(filteredSets.exists { case (q, s) => brutePost.getOrElse(q, Set.empty) != s },
      "post-filtered brute equals filtered search everywhere — test corpus degenerate")
  }

  test("ann_lsh recall@5 >= 0.8 vs brute force at sf0.01, and non-empty") {
    val brute = Similarity.ann_topk_brute(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.ann_lsh(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty, "ann_lsh returned no rows (the r1 regression)")
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall@5 $recall < 0.8")
  }

  test("ann_knn_graph covers every vector, holds recall vs per-node brute force; bucket cap is a no-op") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "cast(embedding as array<double>) as e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    // per-node brute-force top-5 (the recall target)
    val brute = vecs.keys.map { n =>
      n -> vecs.keys.filter(_ != n).toSeq
        .map(m => (m, math.floor(cos(vecs(n), vecs(m)) * 1e6).toLong))
        .sortBy { case (m, c) => (-c, m) }.take(5).map(_._1).toSet
    }.toMap
    val got = Similarity.ann_knn_graph(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    CacheRegistry.releaseAll()
    val byNode = got.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // graph property: every vector got SOME neighbors (no isolated
    // nodes at this SF), ranks are 1..k contiguous
    assert(byNode.keySet == vecs.keySet, "k-NN graph must cover every vector")
    got.groupBy(_._1).foreach { case (n, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.size),
        s"ranks not contiguous for node $n") }
    val recall = vecs.keys.toSeq
      .map(n => (brute(n) & byNode.getOrElse(n, Set.empty)).size.toDouble / 5).sum / vecs.size
    assert(recall >= 0.7, s"mean per-node recall@5 $recall < 0.7")
    // the hot-bucket cap must not fire at test SF (it exists for
    // production skew, not to change small-scale results): largest
    // band bucket stays under 500
    val planes = graft.functions.VectorFunctions.randomPlanes(64, 64)
    val maxBucket = vecs.toSeq.flatMap { case (id, v) =>
      (0 until 16).map { b =>
        val key = (0 until 4).map { j =>
          val p = planes(b * 4 + j)
          if (v.zip(p).map { case (x, y) => x * y }.sum >= 0) 1L << j else 0L
        }.sum
        (b, key)
      }
    }.groupBy(identity).values.map(_.size).max
    assert(maxBucket <= 500, s"premise: cap must be a no-op at sf0.001 (max bucket $maxBucket)")
  }

  test("ann_knn_graph_refine: one NN-descent round dominates the blocked graph's recall") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "cast(embedding as array<double>) as e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val brute = vecs.keys.map { n =>
      n -> vecs.keys.filter(_ != n).toSeq
        .map(m => (m, math.floor(cos(vecs(n), vecs(m)) * 1e6).toLong))
        .sortBy { case (m, c) => (-c, m) }.take(5).map(_._1).toSet
    }.toMap
    val blocked = Similarity.ann_knn_graph(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val refined = Similarity.ann_knn_graph_refine(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    CacheRegistry.releaseAll()
    def meanRecall(g: Map[Long, Set[Long]]): Double = vecs.keys.toSeq
      .map(n => (brute(n) & g.getOrElse(n, Set.empty)).size.toDouble / 5)
      .sum / vecs.size
    val r0 = meanRecall(blocked)
    val r1 = meanRecall(refined)
    // the refined candidate set contains every current top-5 edge, so
    // per-node selections only improve in score; mean recall must not
    // drop, and the expansion should actually find new true neighbors
    assert(r1 >= r0, s"NN-descent round LOST recall: $r1 < $r0")
    assert(r1 > r0, s"premise: expansion found no new true neighbors ($r1 == $r0)")
    // refined neighbors keep per-node score dominance: each node's
    // 5th-best refined score >= its 5th-best blocked score
    val blockedMin = Similarity.ann_knn_graph(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(3))).groupBy(_._1)
      .view.mapValues(_.map(_._2).min).toMap
    val refinedMin = Similarity.ann_knn_graph_refine(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(3))).groupBy(_._1)
      .view.mapValues(_.map(_._2).min).toMap
    CacheRegistry.releaseAll()
    blockedMin.foreach { case (n, m) =>
      assert(refinedMin.getOrElse(n, Long.MinValue) >= m,
        s"node $n: refined 5th-best ${refinedMin.get(n)} < blocked $m")
    }
  }

  test("ann_lsh_tuning equals a driver-side bucket census and orders the widths correctly") {
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sf0001)
      .selectExpr("vec_id", "cast(embedding as array<double>) as e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val planes = graft.functions.VectorFunctions.randomPlanes(64, 64)
    def bit(v: Array[Double], p: Array[Double]): Boolean =
      v.zip(p).map { case (x, y) => x * y }.sum >= 0
    val expected = Seq(4, 8, 16).map { r =>
      val bands = 64 / r
      val buckets = vecs.values.toSeq.flatMap { v =>
        (0 until bands).map { b =>
          val key = (0 until r).map(j => if (bit(v, planes(b * r + j))) 1L << j else 0L).sum
          (b, key)
        }
      }.groupBy(identity).values.map(_.size.toLong).toSeq
      (r.toLong, bands.toLong, buckets.size.toLong, buckets.max,
        buckets.map(n => n * (n - 1) / 2).sum)
    }
    val got = Similarity.ann_lsh_tuning(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    CacheRegistry.releaseAll()
    assert(got == expected, "tuning report diverged from the driver-side census")
    // the planner's reason to exist: candidate volume falls strictly
    // as the width grows (wider keys → exponentially sparser buckets)
    val byR = got.map(g => g._1 -> g._5).toMap
    assert(byR(4L) > byR(8L) && byR(8L) > byR(16L),
      s"pair volume should fall with width: $byR")
  }

  test("bestCell kernel (r20 BestCentroidExpr) equals the literal-argmin form and a naive reference") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", graft.functions.VectorFunctions.asDouble($"embedding").as("vec"))
    // 70 centroids (the old >64 HOF regime); the same 70 through
    // centroidDists is the literal-argmin form it must agree with
    val cents = Similarity.kmeansCentroids(
      Similarity.trainSlice(spark, sf0001, e), k = 70, iters = 1)
    assert(cents.length == 70)
    val both = e.select($"vec_id", $"vec",
        Similarity.bestCell(cents, $"vec").getField("cid").as("hof"),
        array_min(Similarity.centroidDists(cents, $"vec")).getField("cid").as("lit"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getInt(2) == r.getInt(3),
      s"vec ${r.getLong(0)}: HOF cell ${r.getInt(2)} != literal cell ${r.getInt(3)}"))
    // and against a naive driver-side argmin (same lexicographic
    // (dist, cid) tie-break)
    def cos(a: Seq[Double], b: Array[Double]): Double = {
      var ip = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { ip += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      if (na == 0 || nb == 0) 0.0 else ip / (math.sqrt(na) * math.sqrt(nb))
    }
    both.take(100).foreach { r =>
      val v = r.getSeq[Double](1)
      val naive = cents.zipWithIndex
        .map { case (c, i) => (1.0 - cos(v, c), i) }.min._2
      assert(r.getInt(2) == naive, s"vec ${r.getLong(0)}: ${r.getInt(2)} != naive $naive")
    }
  }

  test("r20 probeCells / pqCodes kernels equal their literal formulations bit-for-bit") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", graft.functions.VectorFunctions.asDouble($"embedding").as("vec"))
    val cents = Similarity.kmeansCentroids(
      Similarity.trainSlice(spark, sf0001, e), k = 16, iters = 1)
    // probeCells ≡ slice(array_sort(centroidDists), 1, nprobe) — full
    // struct equality (dist doubles bit-compare via ===)
    val probes = e.select($"vec_id",
        Similarity.probeCells(cents, $"vec", 4).as("knl"),
        slice(array_sort(Similarity.centroidDists(cents, $"vec")), 1, 4).as("lit"))
      .filter(!($"knl" === $"lit"))
      .count()
    assert(probes == 0L, s"$probes vectors diverge on probeCells")
    // pqCodes ≡ the per-subspace literal argmin over slice()d subvectors
    val m = 8; val ds = 8
    val books: Array[Array[Array[Double]]] = {
      val seeds = e.orderBy(xxhash64($"vec_id"), $"vec_id").limit(16)
        .select($"vec_id", $"vec").collect()
        .sortBy(_.getLong(0)).map(_.getSeq[Double](1).toArray)
      Array.tabulate(m)(mi => seeds.map(_.slice(mi * ds, (mi + 1) * ds)))
    }
    def cellLit(mi: Int, sub: org.apache.spark.sql.Column) =
      array_min(array(books(mi).toIndexedSeq.zipWithIndex.map { case (c, i) =>
        struct((lit(c.map(x => x * x).sum) -
          lit(2.0) * graft.functions.VectorFunctions.dot(sub, typedLit(c.toSeq)))
          .as("dist"), lit(i).as("cid"))
      }: _*)).getField("cid")
    val codes = e.select($"vec_id",
        graft.functions.GraftExpressions.toColumn(graft.functions.PqCodesExpr(
          graft.functions.GraftExpressions.toExpr($"vec"), books)).as("knl"),
        array((0 until m).map(mi =>
          cellLit(mi, slice($"vec", mi * ds + 1, ds))): _*).as("lit"))
      .filter(!($"knl" === $"lit"))
      .count()
    assert(codes == 0L, s"$codes vectors diverge on pqCodes")
  }

  test("ann_lsh_index equals ann_lsh and searches the index without a corpus-side Exchange") {
    // same planes/banding/rescore ⇒ identical answers through a
    // different physical path
    val viaIndex = Similarity.ann_lsh_index(spark, sf0001).collect().toSeq
    val inFlight = Similarity.ann_lsh(spark, sf0001).collect().toSeq
    assert(viaIndex.nonEmpty && viaIndex == inFlight)
    // the lifecycle claim, held mechanically: the search join is a
    // SortMergeJoin reading the PRE-BUCKETED index — no Exchange
    // between the index scan and the join (only the tiny query side
    // shuffles)
    val plan = Similarity.ann_lsh_index(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"no SMJ:\n${plan.take(1200)}")
    assert(plan.contains("Bucketed: true"),
      s"index scan not bucketed:\n${plan.take(1200)}")
    val lines = plan.linesIterator.toVector
    // candidate join: bucketed (band, bkey) scan feeds its SMJ with
    // no Exchange; rescore: the candidate vectors come from the
    // index's own nid-bucketed vector table (never a rejoin of the
    // raw embeddings), likewise Exchange-free on the index side
    for (tblPat <- Seq("default.lsh_idx", "default.lsh_vec")) {
      val idxLine = lines.indexWhere(_.contains(tblPat))
      val smjLine = lines.lastIndexWhere(_.contains("SortMergeJoin"), idxLine)
      assert(idxLine > smjLine && smjLine >= 0, s"plan shape unexpected at $tblPat")
      val between = lines.slice(smjLine + 1, idxLine)
      assert(!between.exists(_.contains("Exchange")),
        s"Exchange on the $tblPat branch:\n${between.mkString("\n")}")
    }
    assert(!plan.contains("embeddings.parquet") ||
      lines.count(_.contains("embeddings.parquet")) <= 2,
      "rescore rejoined the raw embeddings table")
  }

  test("multi-probe ann_lsh holds recall with half the corpus-side keys") {
    val brute = Similarity.ann_topk_brute(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 8 bands (half the corpus key volume of the registered 16-band
    // config) + 1-bit query-side probing
    val probed = Similarity.annLsh(spark, sf001, bands = 8, r = 4, probes = 1)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probed.nonEmpty)
    val recall = (brute & probed).size.toDouble / brute.size
    assert(recall >= 0.8, s"multi-probe recall@5 $recall < 0.8")
  }

  test("ann_ivf recall@5 vs brute force, and probes a strict cell subset") {
    val brute = Similarity.ann_topk_brute(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ann_ivf(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty, "ann_ivf returned no rows")
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.7, s"IVF recall@5 $recall < 0.7 (nprobe=8 of k=32 cells)")
    // widening the probe set must recover (near-)exact recall: probing
    // all cells IS brute force up to tie-breaks
    val full = Similarity.annIvf(spark, sf001, k = 16, nprobe = 16, iters = 1)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullRecall = (brute & full).size.toDouble / brute.size
    assert(fullRecall >= 0.99, s"nprobe=k recall $fullRecall should be exact")
  }

  test("ann_lsh_index_probed: query-time probing on the SAME index widens candidates, never loses them") {
    val brute = Similarity.ann_topk_brute(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.ann_lsh_index(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val probed = Similarity.ann_lsh_index_probed(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probed.nonEmpty)
    // the probed candidate set is a SUPERSET of the exact-key set on
    // the same persisted index, so recall can only rise
    val exactRecall = (brute & exact).size.toDouble / brute.size
    val probedRecall = (brute & probed).size.toDouble / brute.size
    assert(probedRecall >= exactRecall,
      s"probing lost recall: $probedRecall < $exactRecall")
    assert(probedRecall >= 0.9, s"probed recall@5 $probedRecall < 0.9")
    // and the probe join still reads the index Exchange-free — the
    // extra keys live on the query side only
    val plan = Similarity.ann_lsh_index_probed(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("Bucketed: true"))
    val lines = plan.linesIterator.toVector
    val idxLine = lines.indexWhere(_.contains("default.lsh_idx"))
    val smjLine = lines.lastIndexWhere(_.contains("SortMergeJoin"), idxLine)
    assert(idxLine > smjLine && smjLine >= 0, "plan shape unexpected")
    assert(!lines.slice(smjLine + 1, idxLine).exists(_.contains("Exchange")),
      s"Exchange on the index branch:\n${lines.slice(smjLine + 1, idxLine).mkString("\n")}")
  }

  test("ann_ivf_index holds IVF recall and searches the index without a corpus-side Exchange") {
    val brute = Similarity.ann_topk_brute(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaIndex = Similarity.ann_ivf_index(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex.nonEmpty, "ann_ivf_index returned no rows")
    val recall = (brute & viaIndex).size.toDouble / brute.size
    assert(recall >= 0.7, s"indexed IVF recall@5 $recall < 0.7 (nprobe=8 of k=32 cells)")
    // the lifecycle claim, held mechanically (the ann_lsh_index rule):
    // the probe join is a SortMergeJoin reading the PRE-BUCKETED
    // inverted lists — no Exchange between the index scan and the
    // join; only the 16-query probe side shuffles
    val plan = Similarity.ann_ivf_index(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"no SMJ:\n${plan.take(1200)}")
    assert(plan.contains("Bucketed: true"),
      s"index scan not bucketed:\n${plan.take(1200)}")
    val lines = plan.linesIterator.toVector
    val idxLine = lines.indexWhere(_.contains("default.ivf_idx"))
    val smjLine = lines.lastIndexWhere(_.contains("SortMergeJoin"), idxLine)
    assert(idxLine > smjLine && smjLine >= 0, "plan shape unexpected")
    val between = lines.slice(smjLine + 1, idxLine)
    assert(!between.exists(_.contains("Exchange")),
      s"Exchange on the index branch:\n${between.mkString("\n")}")
  }

  test("sql_ann_ivf_index reads the same persisted lists Exchange-free (the SQL persona keeps the plan)") {
    // result parity is SqlParitySpec's gate; this one holds the
    // LIFECYCLE claim for the SQL-text user mechanically — the
    // statement's MERGE-pinned join reads the cell-bucketed lists
    // with no Exchange on the index branch, same as the DataFrame form
    val plan = graft.operators.SqlSurface.queries("sql_ann_ivf_index")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"no SMJ:\n${plan.take(1200)}")
    assert(plan.contains("Bucketed: true"),
      s"index scan not bucketed:\n${plan.take(1200)}")
    val lines = plan.linesIterator.toVector
    val idxLine = lines.indexWhere(_.contains("default.ivf_idx"))
    val smjLine = lines.lastIndexWhere(_.contains("SortMergeJoin"), idxLine)
    assert(idxLine > smjLine && smjLine >= 0, "plan shape unexpected")
    val between = lines.slice(smjLine + 1, idxLine)
    assert(!between.exists(_.contains("Exchange")),
      s"Exchange on the index branch:\n${between.mkString("\n")}")
  }

  test("ann_hybrid_rrf_index fuses two persisted indexes; both corpus sides stay Exchange-free") {
    val got = Similarity.ann_hybrid_rrf_index(spark, sf001).collect()
    assert(got.nonEmpty, "hybrid index fusion returned no rows")
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.size == 16, s"expected 16 query groups, got ${byQ.size}")
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 10),
        s"qid $q fused ranks not 1..10")
    }
    got.foreach { r =>
      val vr = r.getLong(4); val lr = r.getLong(5)
      assert(vr == -1 || (vr >= 1 && vr <= 50), s"vec_rank $vr out of range")
      assert(lr == -1 || (lr >= 1 && lr <= 50), s"lex_rank $lr out of range")
      assert(vr != -1 || lr != -1, "row carried by neither leg")
    }
    // fusion actually fuses: some winner is carried by BOTH legs
    assert(got.exists(r => r.getLong(4) != -1 && r.getLong(5) != -1),
      "no fused row carries both leg ranks")
    val plan = Similarity.ann_hybrid_rrf_index(spark, sf001)
      .queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toVector
    // IVF branch: pre-bucketed SMJ probe, no Exchange on the index side
    val ivfLine = lines.indexWhere(_.contains("default.ivf_idx"))
    assert(ivfLine >= 0, "no ivf index scan in the plan")
    val smjLine = lines.lastIndexWhere(_.contains("SortMergeJoin"), ivfLine)
    assert(smjLine >= 0, "no SMJ above the ivf index scan")
    assert(!lines.slice(smjLine + 1, ivfLine).exists(_.contains("Exchange")),
      "Exchange on the ivf index branch")
    // lexical branch: postings never shuffle on term — document
    // frequencies aggregate on the bucketed term key and the candidate
    // fetch is a broadcast probe into the postings scan
    // exact prefix with the trailing underscore (r16 advice): the bare
    // "text_idx" substring also matches the delta table "text_idxd_…",
    // which would let the gate pass against the wrong postings table
    assert(lines.count(_.contains("default.text_idx_")) == 2,
      "expected two postings scans (dfreq + candidate fetch)")
    assert(!lines.exists(l => l.contains("Exchange hashpartitioning(term")),
      "postings shuffled on term")
  }

  test("ann_ivf_index_probed: widening nprobe on the SAME index raises recall, index stays Exchange-free") {
    val brute = Similarity.ann_topk_brute(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.ann_ivf_index(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val probed = Similarity.ann_ivf_index_probed(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probed.nonEmpty)
    // the probed candidate set is a SUPERSET per query (nprobe 16 ⊇
    // nprobe 8 of the same sorted cell list), so recall only rises
    val exactRecall = (brute & exact).size.toDouble / brute.size
    val probedRecall = (brute & probed).size.toDouble / brute.size
    assert(probedRecall >= exactRecall,
      s"wider probe lost recall: $probedRecall < $exactRecall")
    assert(probedRecall >= 0.8, s"nprobe=16 recall@5 $probedRecall < 0.8")
    // and the wider probe is a pure query-side change: the index scan
    // still feeds the join Exchange-free
    val plan = Similarity.ann_ivf_index_probed(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("Bucketed: true"))
    val lines = plan.linesIterator.toVector
    val idxLine = lines.indexWhere(_.contains("default.ivf_idx"))
    val smjLine = lines.lastIndexWhere(_.contains("SortMergeJoin"), idxLine)
    assert(idxLine > smjLine && smjLine >= 0, "plan shape unexpected")
    assert(!lines.slice(smjLine + 1, idxLine).exists(_.contains("Exchange")),
      s"Exchange on the index branch:\n${lines.slice(smjLine + 1, idxLine).mkString("\n")}")
  }

  test("ann_ivf_index_delta: appended lists stay bucketed and the grown index covers the full corpus") {
    import spark.implicits._
    val result = Similarity.ann_ivf_index_delta(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(result.nonEmpty)
    val tag = java.security.MessageDigest.getInstance("SHA-256")
      .digest(sf001.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
    val tbl = s"ivfd_idx_$tag"
    // base + delta together hold EVERY corpus vector exactly once
    val corpus = Tables.embeddings(spark, sf001).count()
    assert(spark.table(tbl).count() == corpus, "grown index must cover the full corpus")
    assert(spark.table(tbl).select("nid").distinct().count() == corpus, "duplicated vectors in lists")
    // the delta vectors really came through the APPEND generation
    val deltaInTable = spark.table(tbl).filter(pmod($"nid", lit(10)) === 0).count()
    assert(deltaInTable == Tables.embeddings(spark, sf001)
      .filter(pmod($"vec_id", lit(10)) === 0).count(), "delta batch missing from the lists")
    // two write generations, one bucketed scan: still no Exchange on
    // the index branch
    val plan = Similarity.ann_ivf_index_delta(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("Bucketed: true"))
    val lines = plan.linesIterator.toVector
    val idxLine = lines.indexWhere(_.contains("default.ivfd_idx"))
    val smjLine = lines.lastIndexWhere(_.contains("SortMergeJoin"), idxLine)
    assert(idxLine > smjLine && smjLine >= 0, "plan shape unexpected")
    assert(!lines.slice(smjLine + 1, idxLine).exists(_.contains("Exchange")),
      s"Exchange on the index branch:\n${lines.slice(smjLine + 1, idxLine).mkString("\n")}")
    // recall sanity floor: the quantizer here trains on the 90% base
    // only (the honest delta posture — it never sees the appended
    // vectors), so it sits slightly under the full-train configs'
    // ≥ 0.7 (measured 0.69 at sf0.01); the CORRECTNESS claim — merge
    // ≡ full recompute — is the driver's hash gate, not this floor
    val brute = Similarity.ann_topk_brute(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & result).size.toDouble / brute.size
    assert(recall >= 0.6, s"delta-grown IVF recall@5 $recall < 0.6")
  }

  test("ann_ivf_index_merge: re-embedded vectors move cells, merged lists equal assign(true corpus, frozen centroids)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_min, lit, pmod, reverse, when}
    import graft.functions.VectorFunctions.asDouble
    val result = Similarity.ann_ivf_index_merge(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(result.nonEmpty, "ann_ivf_index_merge returned no rows")
    val tag = java.security.MessageDigest.getInstance("SHA-256")
      .digest(sf001.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
    // the commit point dropped the stale first-embed generation
    assert(!spark.catalog.tableExists(s"ivfk_idx_$tag"),
      "pre-merge base generation survived the swap")
    val cents = Similarity.ivfMergeCents.get(sf001)
    assert(cents != null, "merge leg left no frozen-centroid memo")
    val e = Tables.embeddings(spark, sf001)
      .select($"vec_id", asDouble($"embedding").as("vec"))
    // premise: at least one re-embedded vector actually MOVED cells
    // under the frozen quantizer — otherwise a pure append would have
    // sufficed and the merge gates nothing
    val moved = e.filter(pmod($"vec_id", lit(9)) === 4)
      .select(
        array_min(Similarity.centroidDists(cents, $"vec")).getField("cid").as("cell_true"),
        array_min(Similarity.centroidDists(cents, reverse($"vec"))).getField("cid").as("cell_stale"))
      .filter($"cell_true" =!= $"cell_stale").count()
    assert(moved > 0, "no re-embedded vector changed cell — the split gates nothing")
    // the merged lists hold exactly assign(re-embedded corpus, frozen
    // centroids): stale entries deleted, moved cells rewritten,
    // carry-over intact — merge == rebuild at the table level
    val expected = e.select($"vec_id".as("nid"), $"vec".as("nvec"),
      array_min(Similarity.centroidDists(cents, $"vec")).getField("cid").as("cell"))
    val got = spark.table(s"ivfk_idx_${tag}_m")
    assert(got.count() == expected.count() &&
      got.except(expected).count() == 0 && expected.except(got).count() == 0,
      "merged IVF lists diverged from assign(true corpus, frozen centroids)")
    // the merged generation serves the probe join bucketed,
    // Exchange-free on the corpus side
    val plan = Similarity.ann_ivf_index_merge(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("Bucketed: true"))
    val lines = plan.linesIterator.toVector
    val idxLine = lines.indexWhere(_.contains("default.ivfk_idx"))
    val smjLine = lines.lastIndexWhere(_.contains("SortMergeJoin"), idxLine)
    assert(idxLine > smjLine && smjLine >= 0, "plan shape unexpected")
    assert(!lines.slice(smjLine + 1, idxLine).exists(_.contains("Exchange")),
      s"Exchange on the index branch:\n${lines.slice(smjLine + 1, idxLine).mkString("\n")}")
  }

  test("ann_ivfpq_index holds IVF-PQ recall and searches compressed lists without a corpus-side Exchange") {
    val brute = Similarity.ann_topk_brute(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaIndex = Similarity.ann_ivfpq_index(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex.nonEmpty, "ann_ivfpq_index returned no rows")
    val recall = (brute & viaIndex).size.toDouble / brute.size
    assert(recall >= 0.5, s"indexed IVF-PQ recall@5 $recall < 0.5 (k=16/nprobe=4/rerank=64)")
    // the compressed-lifecycle claim, held mechanically: SMJ reads the
    // PRE-BUCKETED code lists with no Exchange on the index branch
    val plan = Similarity.ann_ivfpq_index(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"no SMJ:\n${plan.take(1200)}")
    assert(plan.contains("Bucketed: true"),
      s"index scan not bucketed:\n${plan.take(1200)}")
    val lines = plan.linesIterator.toVector
    val idxLine = lines.indexWhere(_.contains("default.ivfpq_idx"))
    val smjLine = lines.lastIndexWhere(_.contains("SortMergeJoin"), idxLine)
    assert(idxLine > smjLine && smjLine >= 0, "plan shape unexpected")
    assert(!lines.slice(smjLine + 1, idxLine).exists(_.contains("Exchange")),
      s"Exchange on the index branch:\n${lines.slice(smjLine + 1, idxLine).mkString("\n")}")
  }

  test("ann_pq recall@5 vs brute force; full rerank reproduces brute exactly") {
    val brute = Similarity.ann_topk_brute(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Similarity.ann_pq(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq.nonEmpty, "ann_pq returned no rows")
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.6, s"PQ recall@5 $recall < 0.6 (rerank=64, measured 0.65)")
    // Exactness sanity: rerank >= corpus means the exact rescore sees
    // every vector, so the output must EQUAL brute force row-for-row
    // (ADC only orders the candidate stream, it never drops anyone).
    val bruteRows = Similarity.ann_topk_brute(spark, sf0001)
      .select("qid", "rank", "nid").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val pqRows = Similarity.annPq(spark, sf0001, m = 8, ks = 16, rerank = 1000)
      .select("qid", "rank", "nid").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(pqRows === bruteRows, "full-rerank PQ must reproduce brute force")
  }

  test("ann_ivfpq recall@5 vs brute force; unpruned config reproduces brute exactly") {
    val brute = Similarity.ann_topk_brute(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Similarity.ann_ivfpq(spark, sf001)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfpq.nonEmpty, "ann_ivfpq returned no rows")
    val recall = (brute & ivfpq).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF-PQ recall@5 $recall < 0.5 (nprobe=4/16, rerank=64)")
    // Exactness sanity: probing every cell + rerank >= corpus disables
    // both prunings — cell pruning admits everyone, the exact rescore
    // sees every admitted vector — so the output must EQUAL brute
    // force row-for-row regardless of ADC ordering quality.
    val bruteRows = Similarity.ann_topk_brute(spark, sf0001)
      .select("qid", "rank", "nid").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val fullRows = Similarity.annIvfPq(spark, sf0001,
        k = 16, nprobe = 16, m = 8, ks = 16, rerank = 1000)
      .select("qid", "rank", "nid").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(fullRows === bruteRows, "unpruned IVF-PQ must reproduce brute force")
  }

  test("embeddingLshPairs finds planted near-duplicates selectively") {
    import spark.implicits._
    // 400 random unit-ish vectors + 40 planted near-dups (tiny noise,
    // cos >= ~0.99) — the production near-dup regime this LSH targets.
    val rnd = new scala.util.Random(11)
    val dim = 64
    val base = (0 until 400).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian()))
    }
    val planted = (0 until 40).map { i =>
      val (srcId, src) = base(i * 7 % 400)
      (1000L + i, src.map(v => v + rnd.nextGaussian() * 0.02), srcId)
    }
    val all = (base ++ planted.map(p => (p._1, p._2)))
      .map { case (id, v) => (id, v) }.toDF("id", "vec")
    val got = Dedup.embeddingLshPairs(all, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = planted.map(p => (math.min(p._3, p._1), math.max(p._3, p._1))).toSet
    val recall = (expected & got).size.toDouble / expected.size
    assert(recall >= 0.9, s"planted near-dup recall $recall < 0.9")
    // selectivity: far fewer scored pairs than the all-pairs join
    val allPairs = 440L * 439 / 2
    assert(got.size < allPairs / 20,
      s"LSH candidate output ${got.size} not selective vs $allPairs")
  }

  test("ann_quantize reconstructs within the int8 bound and preserves top-k") {
    import spark.implicits._
    val floats = Tables.embeddings(spark, sf0001)
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val quant = Similarity.ann_quantize(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2).split(",").map(_.toLong)))
    assert(quant.length == floats.size)
    quant.foreach { case (id, mppm, q) =>
      val x = floats(id)
      val m = x.map(math.abs).max
      assert(mppm == math.floor(m * 1e6).toLong, s"vec $id scale mismatch")
      assert(q.forall(v => v >= -127 && v <= 127), s"vec $id out of int8 range")
      // dequantization error per dim is at most half a quantization
      // step (m/127 wide) plus rounding slack
      val step = (if (m == 0) 1.0 else m) / 127.0
      x.zip(q).zipWithIndex.foreach { case ((xi, qi), i) =>
        assert(math.abs(xi - qi * step) <= step / 2 + 1e-12,
          s"vec $id dim $i recon error ${math.abs(xi - qi * step)} > ${step / 2}")
      }
    }
    // top-k preservation: for the 16 query vectors, top-5 by quantized
    // dot product overlaps top-5 by float cosine at >= 0.8 average
    // (int8 keeps ~7.5 significant bits — ranking survives)
    val deq = quant.map { case (id, _, q) =>
      val m = floats(id).map(math.abs).max
      val step = (if (m == 0) 1.0 else m) / 127.0
      id -> q.map(_ * step)
    }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    def top5(q: Long, vecs: Map[Long, Array[Double]]): Set[Long] =
      vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (-cos(vecs(q), vecs(n)), n)).take(5).toSet
    val queries = floats.keys.filter(_ < 16).toSeq
    val overlaps = queries.map(q => (top5(q, floats) & top5(q, deq)).size / 5.0)
    val mean = overlaps.sum / overlaps.size
    assert(mean >= 0.8, s"quantized top-5 overlap $mean < 0.8")
  }
}
