package graft

import graft.operators.{Dedup, Similarity}

/** Ground-truth gates for the END-TO-END dedup queries (the kernels
  * have their own KernelSpec reference checks; these verify the query
  * COMPOSITIONS — blocking, pair-gen, scoring — recover planted
  * near-duplicates from a synthetic corpus, and that exact-duplicate
  * clusters far beyond the hot-bucket cap keep complete pairs).
  */
class DedupSpec extends SparkSpec {

  /** Write a documents.parquet with the testdata schema into a tmp dir
    * usable as a query sfDir. */
  private def writeDocs(rows: Seq[(Long, String)], tag: String): String = {
    import spark.implicits._
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"), s"graft_dedupspec_$tag")
    rows.map { case (id, text) => (id, text, "en", "test", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir.getPath + "/documents.parquet")
    dir.getPath
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_id", "doc_id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  // Corpus A: 300 random 100-word docs + 30 plants, each a copy of a
  // base doc with 2 words replaced (word-3-gram Jaccard ~ 0.88) — the
  // regime dedup_minhash_lsh / dedup_ngram_jaccard must catch at their
  // J >= 0.5 threshold.
  private lazy val (corpusA, plantedA) = {
    val rnd = new scala.util.Random(17)
    val vocab = Array.tabulate(800)(i => s"tok$i")
    def doc(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (0 until 300).map(i => (i.toLong, doc(100)))
    val plants = (0 until 30).map { j =>
      val (srcId, text) = base((j * 9) % 300)
      val words = text.split(" ")
      (0 until 2).foreach(_ => words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.length)))
      (1000L + j, words.mkString(" "), srcId)
    }
    val dir = writeDocs(base ++ plants.map(p => (p._1, p._2)), "a")
    (dir, plants.map(p => (p._3, p._1)).toSet) // srcId < 1000 <= plantId
  }

  test("dedup_minhash_lsh recovers planted near-duplicates (recall >= 0.9)") {
    val got = pairs(Dedup.dedup_minhash_lsh(spark, corpusA))
    val recall = (plantedA & got).size.toDouble / plantedA.size
    assert(recall >= 0.9, s"minhash_lsh planted recall $recall < 0.9 (got ${got.size} pairs)")
  }

  test("dedup_ngram_jaccard recovers planted near-duplicates (recall >= 0.9)") {
    val got = pairs(Dedup.dedup_ngram_jaccard(spark, corpusA))
    val recall = (plantedA & got).size.toDouble / plantedA.size
    assert(recall >= 0.9, s"ngram_jaccard planted recall $recall < 0.9 (got ${got.size} pairs)")
  }

  test("dedup_simhash recovers planted hamming-near duplicates (recall >= 0.8)") {
    // simhash hamming <= 3 is a very-near-dup detector: plants replace
    // 1 word in 400, so ~6 of ~1200 shingles differ and the expected
    // fingerprint distance stays within the threshold.
    val rnd = new scala.util.Random(23)
    val vocab = Array.tabulate(800)(i => s"tok$i")
    def doc(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (0 until 200).map(i => (i.toLong, doc(400)))
    val plants = (0 until 25).map { j =>
      val (srcId, text) = base((j * 11) % 200)
      val words = text.split(" ")
      words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.length))
      (1000L + j, words.mkString(" "), srcId)
    }
    val dir = writeDocs(base ++ plants.map(p => (p._1, p._2)), "b")
    val expected = plants.map(p => (p._3, p._1)).toSet
    val got = pairs(Dedup.dedup_simhash(spark, dir))
    val recall = (expected & got).size.toDouble / expected.size
    assert(recall >= 0.8, s"simhash planted recall $recall < 0.8 (got ${got.size} pairs)")
  }

  test("dedup_containment recovers planted embedded documents that Jaccard misses") {
    // Plants: prefix halves (size ratio 0.5, containment 1.0, Jaccard
    // ~0.5) and SHORT 15%-ratio excerpts (Jaccard ~0.15 — far below
    // every resemblance threshold; the bottom-16 sketch still collides
    // with p ≈ 1-(1-0.15)^16 ≈ 0.93, so demand recall >= 0.8).
    val rnd = new scala.util.Random(31)
    val vocab = Array.tabulate(3000)(i => s"tok$i")
    def doc(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (0 until 200).map(i => (i.toLong, doc(200)))
    val halves = (0 until 15).map { j =>
      val (srcId, text) = base((j * 13) % 200)
      (1000L + j, text.split(" ").take(100).mkString(" "), srcId)
    }
    val excerpts = (0 until 15).map { j =>
      val (srcId, text) = base((j * 7 + 3) % 200)
      (2000L + j, text.split(" ").slice(40, 72).mkString(" "), srcId)
    }
    val dir = writeDocs(base ++ (halves ++ excerpts).map(p => (p._1, p._2)), "c")
    val got = Dedup.dedup_containment(spark, dir)
    val gotPairs = pairs(got)
    val expHalves = halves.map(p => (p._3, p._1)).toSet
    val expExcerpts = excerpts.map(p => (p._3, p._1)).toSet
    assert((expHalves & gotPairs).size == expHalves.size,
      s"missed prefix-half plants: ${expHalves -- gotPairs}")
    val exRecall = (expExcerpts & gotPairs).size.toDouble / expExcerpts.size
    assert(exRecall >= 0.8, s"excerpt recall $exRecall < 0.8")
    // the planted pairs must be exactly the containment-not-resemblance
    // regime: containment ~1 while jaccard stays at the size ratio
    // (integer-ppm scores since r13)
    val scored = got.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    (expHalves ++ expExcerpts).intersect(gotPairs).foreach { p =>
      val (c, j) = scored(p)
      assert(c >= 950000, s"$p containment_ppm $c")
      assert(j <= 600000, s"$p jaccard_ppm $j should be ratio-bounded")
    }
  }

  test("dedup_cdc finds offset-shifted verbatim spans and ignores disjoint docs") {
    // CDC's whole point vs fixed-size blocks: a shared span is found
    // even when its byte OFFSET differs between the two docs. Plants:
    // doc pairs sharing a long middle span behind different-length
    // unique prefixes/suffixes. Controls: fully random docs, which
    // must produce no pair (random token soup shares no >= 24 B chunk).
    val rnd = new scala.util.Random(47)
    val vocab = Array.tabulate(3000)(i => s"tok$i")
    def doc(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (0 until 150).map(i => (i.toLong, doc(150)))
    val plants = (0 until 20).flatMap { j =>
      val span = doc(120)
      Seq((1000L + 2 * j, doc(5 + j) + " " + span),
        (1001L + 2 * j, doc(30 + j) + " " + span + " " + doc(7)))
    }
    val dir = writeDocs(base ++ plants, "g")
    val got = Dedup.dedup_cdc(spark, dir).collect()
    val gotPairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 20).map(j => (1000L + 2 * j, 1001L + 2 * j)).toSet
    assert((expected & gotPairs).size == expected.size,
      s"missed offset-shifted planted spans: ${expected -- gotPairs}")
    // no pair between two pure-random base docs
    val falsePairs = gotPairs.filter { case (a, b) => a < 1000 && b < 1000 }
    assert(falsePairs.isEmpty, s"random docs paired: $falsePairs")
    // shared bytes of a planted pair must approach the span's length
    // (boundary effects at the span edges lose at most a chunk or two)
    val spanBytes = got.collect {
      case r if expected((r.getLong(0), r.getLong(1))) => r.getLong(3)
    }
    assert(spanBytes.forall(_ >= 400),
      s"planted 120-token span shares too few bytes: ${spanBytes.min}")
  }

  test("dedup_semantic: planted exact duplicate is dropped, pairs are sound, run is deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    import graft.functions.VectorFunctions
    val e = Tables.embeddings(spark, sf0001)
      .select($"vec_id", VectorFunctions.asDouble($"embedding").as("vec"))
    // plant an exact copy of vector 7 under a fresh id: identical vec
    // => identical centroid distances => same cell, cosine == 1
    val planted = e.union(
      e.filter($"vec_id" === 7).select(lit(1000000007L).as("vec_id"), $"vec"))
    val out = Dedup.semanticDupsFrom(planted,
        Similarity.trainSlice(spark, sf0001, e), k = 16, iters = 1,
        threshPpm = 300000L)
      .collect()
    assert(out.nonEmpty, "dedup_semantic produced no rows at sf0.001")
    // (a) the planted copy must be dropped: it ties vector 7 on
    // centroid similarity and loses the id tie-break
    val copy = out.find(_.getLong(1) == 1000000007L)
    assert(copy.isDefined, "planted exact duplicate was not dropped")
    assert(copy.get.getLong(4) >= 999990L,
      s"planted pair cosine not ~1: ${copy.get.getLong(4)}")
    // (b) soundness: every emitted (vec_id, dup_of) pair really clears
    // the threshold — recompute the cosine driver-side from raw vecs
    val vecsById = planted.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var ip = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { ip += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else ip / (math.sqrt(na) * math.sqrt(nb))
    }
    out.foreach { r =>
      val c = cos(vecsById(r.getLong(1)), vecsById(r.getLong(3)))
      assert(c >= 0.3 - 1e-9,
        s"pair (${r.getLong(1)}, ${r.getLong(3)}) below threshold: $c")
      assert(r.getLong(1) != r.getLong(3), "self-pair emitted")
    }
    // (c) deterministic end to end (hash-seeded kmeans, no RNG)
    val again = Dedup.semanticDupsFrom(planted,
        Similarity.trainSlice(spark, sf0001, e), k = 16, iters = 1,
        threshPpm = 300000L)
      .collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("dedup_semantic never drops the least-typical member of a cell") {
    import spark.implicits._
    val out = Dedup.dedup_semantic(spark, sf0001).collect()
    assert(out.nonEmpty, "registered dedup_semantic empty at sf0.001")
    // the keep policy drops a doc only when a LOWER (centroid_sim, id)
    // partner exists, so per cell the minimal dropped row must still
    // out-rank its own justifying partner — and transitively the cell's
    // lex-min member survives. Verify the local invariant on every row:
    // dup_of out-ranks the dropped doc on (centroid_sim, id).
    val bySim = out.map(r => r.getLong(1) -> r.getLong(2)).toMap
    out.foreach { r =>
      bySim.get(r.getLong(3)).foreach { dupSim =>
        val ok = dupSim < r.getLong(2) ||
          (dupSim == r.getLong(2) && r.getLong(3) < r.getLong(1))
        assert(ok, s"dup_of ${r.getLong(3)} does not out-rank ${r.getLong(1)}")
      }
    }
  }

  test("dedup_clusters matches an independent union-find on the same pair graph") {
    // corpus A has no exact dups, so the cluster graph is exactly the
    // minhash pair set — union-find over the collected pairs is the
    // ground truth for the distributed min-label propagation.
    val pairSet = pairs(Dedup.dedup_minhash_lsh(spark, corpusA))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairSet.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    val want = parent.keys.map(n => n -> find(n)).toMap
    val got = Dedup.dedup_clusters(spark, corpusA).collect()
      .map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(got == want,
      s"component mismatch: ${(got.toSet diff want.toSet).take(5)} vs ${(want.toSet diff got.toSet).take(5)}")
    assert(got.nonEmpty)
  }

  test("dedup_resolve_best keeps exactly the highest-quality doc per cluster") {
    val rows = Dedup.dedup_resolve_best(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cid, members) =>
      val keepers = members.filter(_._4)
      assert(keepers.length == 1, s"cluster $cid has ${keepers.length} keepers")
      val (_, kid, kq, _) = keepers.head
      members.foreach { case (_, did, q, _) =>
        assert(q < kq || (q == kq && did >= kid),
          s"cluster $cid: member $did (q=$q) out-scores keeper $kid (q=$kq)")
      }
    }
    // membership must be exactly dedup_clusters'
    val want = Dedup.dedup_clusters(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows.map(r => (r._1, r._2)).toSet == want)
  }

  test("dedup_clusters merges transitive chains and folds exact dups") {
    // chain: base doc X0; X1 = X0 with 1 word changed; X2 = X1 with a
    // DIFFERENT word changed. X0~X1 and X1~X2 must pair; X0 and X2 may
    // or may not — either way all three belong to one cluster. Plus an
    // exact-dup pair that only the md5 star contributes.
    val rnd = new scala.util.Random(31)
    val vocab = Array.tabulate(800)(i => s"tok$i")
    def doc(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val filler = (0 until 100).map(i => (i.toLong, doc(100)))
    val x0 = doc(100).split(" ")
    val x1 = x0.clone(); x1(10) = "chained1"
    val x2 = x1.clone(); x2(80) = "chained2"
    val chain = Seq((500L, x0.mkString(" ")), (501L, x1.mkString(" ")), (502L, x2.mkString(" ")))
    val exactDup = Seq((600L, filler(3)._2), (601L, filler(3)._2))
    val dir = writeDocs(filler ++ chain ++ exactDup, "d")
    val rows = Dedup.dedup_clusters(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getBoolean(2)))
    val byDoc = rows.map(r => r._1 -> r._2).toMap
    assert(byDoc.get(500L).contains(500L) && byDoc.get(501L).contains(500L) &&
      byDoc.get(502L).contains(500L),
      s"chain not merged into one cluster: ${rows.filter(r => r._1 >= 500 && r._1 < 503).toSeq}")
    assert(byDoc(3L) == 3L && byDoc(600L) == 3L && byDoc(601L) == 3L,
      "exact-dup docs must fold into the original's cluster")
    assert(rows.filter(_._2 == 500L).count(_._3) == 1, "exactly one keeper per cluster")
  }

  test("graft.dedup.maxBucket session conf reaches the pair generator") {
    // cap = 1 drops every >= 2-id bucket, so the pair set must collapse
    // to empty; restoring the default brings the pairs back
    try {
      spark.conf.set("graft.dedup.maxBucket", "1")
      assert(Dedup.dedup_minhash_lsh(spark, corpusA).count() == 0L,
        "cap=1 must drop every candidate bucket")
    } finally spark.conf.unset("graft.dedup.maxBucket")
    assert(Dedup.dedup_minhash_lsh(spark, corpusA).count() > 0L)
  }

  test("connectedComponents converges on a 3000-node chain (pointer jumping)") {
    // Diameter-3000 path: hook-only min propagation needs 3000 rounds
    // and would blow the maxIter cap; hook+jump must converge in
    // O(log d) rounds and label every node with the chain's min.
    import spark.implicits._
    val chain = (0L until 2999L).map(i => (i, i + 1)).toDF("doc_id", "doc_id2")
    val labels = Dedup.connectedComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 3000)
    assert(labels.values.forall(_ == 0L),
      s"chain not fully labeled: ${labels.filter(_._2 != 0L).take(5)}")
    graft.CacheRegistry.releaseAll()
  }

  test("dedup_simhash routes near pairs through cluster keepers (no member products)") {
    // 20 plant groups: each is a base doc duplicated 3x plus a 1-word
    // variant duplicated 3x. Near (hamming 1-3) pairs must surface as
    // ONE keeper-to-keeper row per hash pair — never the 3x3 member
    // product — with members reachable via their hamming-0 star.
    val rnd = new scala.util.Random(41)
    val vocab = Array.tabulate(800)(i => s"tok$i")
    def doc(len: Int) = Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val rows = (0 until 20).flatMap { g =>
      val base = doc(400)
      val words = base.split(" ")
      words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.length))
      val variant = words.mkString(" ")
      val ids = (0 until 3).map(i => ((g * 10 + i).toLong, base)) ++
        (0 until 3).map(i => ((1000 + g * 10 + i).toLong, variant))
      ids
    }
    val dir = writeDocs(rows, "e")
    val out = Dedup.dedup_simhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    // keepers are the min ids of each identical-text group
    val keepers = rows.groupBy(_._2).values.map(_.map(_._1).min).toSet
    val near = out.filter(_._3 > 0)
    assert(near.nonEmpty, "expected some hamming 1-3 keeper pairs across 20 plant groups")
    assert(near.forall(p => keepers.contains(p._1) && keepers.contains(p._2)),
      s"near pairs must be keeper-to-keeper; offenders: ${near.filterNot(p => keepers.contains(p._1) && keepers.contains(p._2)).take(5).toSeq}")
    // one row per hash pair: no (base-group x variant-group) member product
    assert(near.map(p => (p._1, p._2)).distinct.length == near.length)
    val starMembers = out.filter(_._3 == 0).map(_._2).toSet
    assert(rows.map(_._1).toSet.diff(keepers).subsetOf(starMembers),
      "every non-keeper member must appear in a hamming-0 star")
  }

  test("hot-bucket cap drops are observable via BucketCapMetrics") {
    // 1100 identical docs put > maxBucket ids in every minhash band
    // bucket; the cap drops them and the observe metric must surface
    // the drop to a registered listener (the Bench/Verify wiring). A
    // planted near-dup pair keeps the pair set non-empty — with NO
    // surviving pairs AQE propagates the empty relation and the
    // CollectMetrics node never executes (the truly-all-capped case is
    // caught by the empty-output gate instead).
    BucketCapMetrics.register(spark)
    BucketCapMetrics.drained() // clear anything earlier tests left
    val rnd2 = new scala.util.Random(43)
    val vocab2 = Array.tabulate(800)(i => s"tok$i")
    val baseDoc = Seq.fill(120)(vocab2(rnd2.nextInt(vocab2.length))).mkString(" ")
    val w2 = baseDoc.split(" "); w2(5) = "variantword"
    val rows = (0 until 1100).map(i => (i.toLong, "same text for every doc in this corpus")) ++
      Seq((2000L, baseDoc), (2001L, w2.mkString(" ")))
    val dir = writeDocs(rows, "f")
    Dedup.dedup_minhash_lsh(spark, dir).collect()
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    var caps = BucketCapMetrics.drained()
    while (caps.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(200); caps = BucketCapMetrics.drained()
    }
    assert(caps.nonEmpty, "capped buckets must be reported to the listener")
    val c = caps.values.head
    assert(c.droppedBuckets > 0 && c.maxBucket >= 1100 && c.cappedIds >= 1100, s"$c")
  }

  test("dedup_simhash keeps complete pairs for exact-dup clusters beyond the bucket cap") {
    // 1200 identical docs (> maxBucket = 1000) + 100 distinct: the r2
    // capped all-pairs path silently lost these; the keeper->member
    // star must emit all 1199 pairs.
    val rnd = new scala.util.Random(29)
    val vocab = Array.tabulate(800)(i => s"tok$i")
    val boiler = Seq.fill(80)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val dupes = (0 until 1200).map(i => (i.toLong, boiler))
    val distinct = (0 until 100).map(i =>
      ((5000 + i).toLong, Seq.fill(80)(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
    val dir = writeDocs(dupes ++ distinct, "c")
    val zero = Dedup.dedup_simhash(spark, dir)
      .filter("hamming = 0").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val fromCluster = zero.filter(_._2 < 5000)
    assert(fromCluster.length == 1199,
      s"expected 1199 keeper->member pairs for the 1200-doc cluster, got ${fromCluster.length}")
    assert(fromCluster.forall(_._1 == 0L), "every cluster pair must anchor at the keeper (min doc_id)")
  }

  test("dedup_incremental probes delta docs against base and within-batch, never base-base") {
    // base = ids not divisible by 10; delta = multiples of 10. Plants:
    // a delta near-copy of base doc 7 (cross), two delta near-copies
    // of each other (within), and a base-base exact duplicate that the
    // incremental probe must NOT report (already-indexed corpus pairs
    // are the full-corpus run's business, not the batch's).
    val rnd = new scala.util.Random(41)
    val vocab = Array.tabulate(800)(i => s"tok$i")
    def doc() = Seq.fill(100)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    def mutate(text: String, n: Int): String = {
      val words = text.split(" ")
      (0 until n).foreach(_ => words(rnd.nextInt(words.length)) = vocab(rnd.nextInt(vocab.length)))
      words.mkString(" ")
    }
    val base = (1 to 121).filter(_ % 10 != 0).map(i => (i.toLong, doc()))
    val baseMap = base.toMap
    val within = doc()
    val plants = Seq(
      (1000L, mutate(baseMap(7L), 2)),  // delta ~ base 7
      (1010L, within),                  // delta ~ delta 1020
      (1020L, mutate(within, 2)),
      (122L, baseMap(11L)))             // base == base 11: must stay silent
    val dir = writeDocs(base ++ plants, "incr")
    val got = Dedup.dedup_incremental(spark, dir).collect()
    val trip = got.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got.forall(_.getLong(0) % 10 == 0), s"non-delta probe_id in $trip")
    assert(trip.contains((1000L, 7L, "base")), s"missing cross delta->base pair in $trip")
    assert(trip.contains((1010L, 1020L, "delta")), s"missing within-batch pair in $trip")
    assert(!got.exists(r => Set(r.getLong(0), r.getLong(1)) == Set[Long](11L, 122L)),
      "base-base duplicate pair leaked into incremental output")
  }

  test("dedup_incremental equals the delta-touching subset of the full minhash run") {
    // The probe shares every pipeline constant with dedup_minhash_lsh
    // (perms, bands, threshold, cap), so on the SAME corpus its output
    // must be EXACTLY the full run's pairs that touch a delta doc —
    // no pair invented by the probe path, none lost to the base-only
    // bucket skip (those buckets contain no delta pair by definition).
    val full = pairs(Dedup.dedup_minhash_lsh(spark, corpusA))
    val deltaSubset = full.filter(p => p._1 % 10 == 0 || p._2 % 10 == 0)
    val inc = Dedup.dedup_incremental(spark, corpusA).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
      .toSet
    assert(inc == deltaSubset,
      s"incremental != delta-touching subset: extra=${inc -- deltaSubset} missing=${deltaSubset -- inc}")
  }

  test("dedup_minhash_index equals dedup_incremental and probes the index without a corpus-side Exchange") {
    // same perms/bands/threshold/cap through the persisted-index
    // physical path ⇒ identical rows
    val viaIndex = Dedup.dedup_minhash_index(spark, corpusA).collect().toSeq
    val inFlight = Dedup.dedup_incremental(spark, corpusA).collect().toSeq
    assert(viaIndex.nonEmpty && viaIndex == inFlight)
    // the lifecycle claim, held mechanically (the SimilaritySpec
    // ann_lsh_index gate): both the band table's candidate semi-join
    // and the signature table's rescore join read PRE-BUCKETED scans —
    // no Exchange between the index scan and its SortMergeJoin; only
    // the delta-sized probe side ever shuffles
    val plan = Dedup.dedup_minhash_index(spark, corpusA)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"no SMJ:\n${plan.take(1200)}")
    assert(plan.contains("Bucketed: true"),
      s"index scan not bucketed:\n${plan.take(1200)}")
    val lines = plan.linesIterator.toVector
    for (tblPat <- Seq("default.mh_band", "default.mh_sig")) {
      val idxLine = lines.indexWhere(_.contains(tblPat))
      val smjLine = lines.lastIndexWhere(_.contains("SortMergeJoin"), idxLine)
      assert(idxLine > smjLine && smjLine >= 0, s"plan shape unexpected at $tblPat")
      val between = lines.slice(smjLine + 1, idxLine)
      assert(!between.exists(_.contains("Exchange")),
        s"Exchange on the $tblPat branch:\n${between.mkString("\n")}")
    }
  }

  test("dedup_minhash_index_delta: append-grown index probe equals the full-rebuild probe") {
    // base build (% 10 ∉ {0,5}) + appended batch (% 10 = 5) must hold
    // exactly the rebuild's rows — one band row lost or doubled in the
    // append shows up as a differing pair set or score
    val merged = Dedup.dedup_minhash_index_delta(spark, corpusA).collect().toSeq
    val rebuilt = Dedup.dedup_minhash_index(spark, corpusA).collect().toSeq
    assert(merged.nonEmpty && merged == rebuilt)
  }

  test("dedup_minhash_index_merge: keyed-merge replaces stale band keys and signatures, probe equals rebuild") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat, explode, lit, when}
    import graft.functions.TextFunctions.{bandKeys, minhashSignature, shingleHashes}
    val viaMerge = Dedup.dedup_minhash_index_merge(spark, corpusA).collect().toSeq
    val rebuilt = Dedup.dedup_minhash_index(spark, corpusA).collect().toSeq
    assert(viaMerge.nonEmpty && viaMerge == rebuilt,
      "keyed-merge-grown index probe diverged from the build-once probe (merge != rebuild)")
    // premise: the first-crawl boilerplate actually CHANGED at least
    // one touched doc's signature — otherwise the merge gates nothing
    val docs = Tables.documents(spark, corpusA).filter($"doc_id" % 10 =!= 0)
    val touched = docs.filter($"doc_id" % 10 === 7)
    val changed = touched
      .select($"doc_id",
        minhashSignature(shingleHashes($"text", 3), 32).as("sig_true"),
        minhashSignature(shingleHashes(
          concat($"text", lit(" accept all cookies to continue")), 3), 32).as("sig_stale"))
      .filter(!($"sig_true" <=> $"sig_stale")).count()
    assert(changed > 0, "boilerplate left every touched signature unchanged — the split gates nothing")
    val tag = java.security.MessageDigest.getInstance("SHA-256")
      .digest(corpusA.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
    // the commit point dropped both pre-merge generations
    assert(!spark.catalog.tableExists(s"mhk_band_$tag") &&
      !spark.catalog.tableExists(s"mhk_sig_$tag"),
      "pre-merge base generation survived the swap")
    // the merged tables hold exactly the true-corpus derivation: stale
    // band keys deleted, stale signatures rewritten, carry-over intact
    val expBand = docs
      .select($"doc_id", explode(bandKeys(
        minhashSignature(shingleHashes($"text", 3), 32), 8, 4)).as("bk"))
      .select($"doc_id", $"bk.band".as("band"), $"bk.bkey".as("bkey"))
    val gotBand = spark.table(s"mhk_band_${tag}_m")
    assert(gotBand.count() == expBand.count() &&
      gotBand.except(expBand).count() == 0 && expBand.except(gotBand).count() == 0,
      "merged band table diverged from the true-corpus band derivation")
    val expSig = docs.select($"doc_id",
      minhashSignature(shingleHashes($"text", 3), 32).as("sig"))
    val gotSig = spark.table(s"mhk_sig_${tag}_m")
    assert(gotSig.count() == expSig.count() &&
      gotSig.except(expSig).count() == 0 && expSig.except(gotSig).count() == 0,
      "merged signature table diverged from the true-corpus signatures")
  }
}
