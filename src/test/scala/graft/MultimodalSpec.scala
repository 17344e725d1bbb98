package graft

import graft.operators.Multimodal

/** Ground-truth checks for the multimodal plumbing (these queries are
  * rows-only in the oracle, so the spec carries their correctness):
  * metadata determinism, frame-sampling arithmetic against the decoded
  * frame counts, and mean-pooling against a driver-side reference. */
class MultimodalSpec extends SparkSpec {

  test("mm_meta is deterministic and consistent with payload size") {
    val a = Multimodal.mm_meta(spark, sf0001).collect()
    val b = Multimodal.mm_meta(spark, sf0001).collect()
    assert(a.sameElements(b), "decode metadata must be deterministic")
    // synthetic docs are ASCII, so UTF-8 payload bytes == n_chars
    val chars = Tables.documents(spark, sf0001)
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach { r =>
      assert(r.getLong(1) == chars(r.getLong(0)),
        s"doc ${r.getLong(0)}: n_bytes ${r.getLong(1)} != n_chars")
      assert(r.getInt(5) >= 1, "n_frames must be positive")
    }
  }

  test("mm_framesample emits every 10th frame index below n_frames") {
    val frames = Multimodal.mm_framesample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).intValue))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sorted.toSeq }
    val nFrames = Multimodal.mm_meta(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getInt(5)).toMap
    assert(frames.keySet == nFrames.keySet.filter(nFrames(_) > 0))
    frames.foreach { case (doc, idxs) =>
      val expect = 0 until nFrames(doc) by 10
      assert(idxs == expect.toSeq, s"doc $doc: $idxs vs $expect")
    }
  }

  test("mm_features pooling matches a driver-side reference") {
    // reference: recompute the stub per-frame integer-ppm features
    // from frame_fp and sum-pool — the query's groupBy(sum) must agree
    // EXACTLY (integer sums are order-independent, so no tolerance)
    val dim = 16
    def feat(fp: Long): Array[Long] = Array.tabulate(dim) { i =>
      val h = fp * 6364136223846793005L + (i + 1) * 1442695040888963407L
      (h >>> 11) % 2000001L - 1000000L
    }
    val byDoc = Multimodal.mm_framesample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(x => feat(x._2)) }
    val got = Multimodal.mm_features(spark, sf0001).collect()
    assert(got.map(_.getLong(0)).toSet == byDoc.keySet)
    got.take(50).foreach { r =>
      val doc = r.getLong(0)
      val feats = byDoc(doc)
      assert(r.getLong(1) == feats.length, s"doc $doc frame count")
      val expect = Array.tabulate(dim)(i => feats.map(_(i)).sum)
      val emb = r.getString(2).split(",").map(_.toLong).toSeq
      assert(emb == expect.toSeq, s"doc $doc pooled sums diverged")
    }
  }

  test("mm_audio_windows: closed-form window stats equal the direct loop recurrence") {
    import spark.implicits._
    // The production expression uses the closed form s_i = (s0·31^i +
    // 7·Σ31^j) mod 2^16; re-derive every window's energy/zcr from s0
    // with the direct recurrence and diff.
    val windows = Multimodal.audioWindowStats(spark, sf0001)
      .select($"doc_id", $"wnd", $"s0", $"energy", $"zcr")
      .as[(Long, Int, Long, Long, Long)].collect()
    assert(windows.nonEmpty)
    windows.foreach { case (doc, wnd, s0, energy, zcr) =>
      var s = s0; var e = 0L; var z = 0L; var prev = 0L
      (0 until 16).foreach { i =>
        val sv = s - 32768
        e += sv * sv
        if (i > 0 && ((sv >= 0) != (prev >= 0))) z += 1
        prev = sv
        s = (s * 31 + 7) % 65536
      }
      assert(e == energy && z == zcr, s"($doc, $wnd): got ($energy, $zcr), want ($e, $z)")
    }
    // the rollup covers exactly the wav subset at its decoded window counts
    val meta = Multimodal.mm_meta(spark, sf0001)
      .filter($"format" === "wav")
      .select($"doc_id", $"n_frames").as[(Long, Int)].collect().toMap
    val rolled = Multimodal.mm_audio_windows(spark, sf0001)
      .select($"doc_id", $"n_windows").as[(Long, Long)].collect().toMap
    assert(rolled == meta.map { case (k, v) => k -> v.toLong })
  }

  test("mm_scene_detect equals a driver-side segmentation of the frame features") {
    import spark.implicits._
    val feats = Multimodal.frameFeatures(spark, sf0001)
      .as[(Long, Int, Array[Long])].collect()
      .groupBy(_._1).map { case (d, fs) => d -> fs.sortBy(_._2) }
    // independent sequential re-segmentation (same threshold contract)
    val expect = feats.flatMap { case (doc, frames) =>
      var scene = 0L
      var prev: Array[Long] = null
      val segs = scala.collection.mutable.Map[Long, List[Int]]()
      frames.foreach { case (_, idx, f) =>
        val boundary = prev == null ||
          f.zip(prev).map { case (a, b) => math.abs(a - b) }.sum > 12000000L
        if (boundary) scene += 1
        segs(scene) = idx :: segs.getOrElse(scene, Nil)
        prev = f
      }
      segs.map { case (sid, idxs) =>
        (doc, sid) -> ((idxs.min.toLong, idxs.max.toLong, idxs.length.toLong))
      }
    }
    val got = Multimodal.mm_scene_detect(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect)
    // segmentation is non-degenerate on this corpus: multi-scene docs
    // and multi-frame scenes both occur, and scenes partition frames
    assert(got.keys.groupBy(_._1).exists(_._2.size > 1))
    assert(got.values.exists(_._3 > 1))
    assert(got.values.map(_._3).sum == feats.values.map(_.length).sum)
  }

  test("mm_near_dups finds every planted re-encoded variant through the LSH path") {
    import spark.implicits._
    val pairs = Multimodal.mm_near_dups(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Every 10th doc gets a jittered variant at id | 1<<62; the jitter
    // perturbs all 16 dims, so each planted pair must survive the
    // banded-LSH blocking AND the exact cosine rescore (recall 1.0
    // demanded — at cos≈0.9999 the 8×8 OR-construction misses with
    // p≈1e-16, so a miss means a broken pipeline, not bad luck).
    val planted = Multimodal.featureVectors(spark, sf0001)
      .select($"doc_id").as[Long].collect().filter(_ % 10 == 0)
      .map(d => (d, d | (1L << 62))).toSet
    assert(planted.nonEmpty)
    val found = pairs.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val missed = planted -- found
    assert(missed.isEmpty, s"planted near-dup pairs missed: $missed")
    // and the rescore is honest: every reported pair really is ≥ threshold
    // (integer ppm since r13 — floor(cos·1e6) ≥ 995000 ⟺ cos ≥ 0.995)
    pairs.foreach { case (a, b, ppm) =>
      assert(ppm >= 995000L, s"pair ($a,$b) below threshold: $ppm ppm")
    }
  }

  test("mm_caption_topk ranks each image's own caption first (aligned-space contract)") {
    val rows = Multimodal.mm_caption_topk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val qids = rows.map(_._1).distinct
    assert(qids.length == 16, s"expected 16 query images, got ${qids.length}")
    // the stub text tower is the vision embedding ± 1e-3/dim, so each
    // image's own caption sits at cos ~0.999998 — contrastive alignment
    // is the semantic contract, measured as recall@1
    val top1Own = rows.filter(_._2 == 1).count { case (q, _, cap, _) => cap == q }
    assert(top1Own >= 15, s"own caption ranked first for only $top1Own/16 queries")
    // ranking is honest: within a query, cos_ppm never increases with rank
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"query $q scores not monotone in rank")
    }
  }

  test("mm_features string form carries the same embeddings as featureVectors") {
    // featureVectors = the ppm sums divided back to means; the single
    // double division is the same FP op both sides, so equality is exact
    val typed = Multimodal.featureVectors(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    val flat = Multimodal.mm_features(spark, sf0001).collect()
    assert(flat.map(_.getLong(0)).toSet == typed.keySet)
    flat.take(50).foreach { r =>
      val n = r.getLong(1)
      val means = r.getString(2).split(",")
        .map(x => x.toLong.toDouble / (n * 1000000.0)).toSeq
      assert(means == typed(r.getLong(0)), s"doc ${r.getLong(0)} string form diverged")
    }
  }
}
