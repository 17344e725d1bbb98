package graft

import graft.functions.ReedSolomon

/** RS(k=4, m=2) must recover from ANY two erasures — the MDS property
  * the reference's erasure-coding project provides. */
class ReedSolomonSpec extends SparkSpec {

  test("GF(256) arithmetic: multiplicative inverses") {
    (1 until 256).foreach { a =>
      assert(ReedSolomon.gfMul(a, ReedSolomon.gfInv(a)) == 1, s"a=$a")
    }
  }

  test("round-trips every 2-erasure combination of k=4+m=2 blocks") {
    val rnd = new scala.util.Random(3)
    val payload = Array.fill(1003)(rnd.nextInt().toByte)
    val k = 4; val m = 2
    val data = ReedSolomon.stripe(payload, k)
    val parity = ReedSolomon.encode(data, m)
    val blocks: Map[Int, Array[Byte]] =
      (data.zipWithIndex.map { case (b, i) => i -> b } ++
        parity.zipWithIndex.map { case (p, j) => (k + j) -> p }).toMap
    for {
      e1 <- 0 until (k + m)
      e2 <- (e1 + 1) until (k + m)
    } {
      val survivors = blocks.removedAll(Seq(e1, e2))
      Seq(e1, e2).filter(_ < k).foreach { erased =>
        val rec = ReedSolomon.decode(survivors, erased, k)
        assert(rec.sameElements(blocks(erased)),
          s"erasures ($e1,$e2): data block $erased not recovered")
      }
      // erased parity blocks are re-derivable from recovered data too
      Seq(e1, e2).filter(_ >= k).foreach { erased =>
        val rec = ReedSolomon.decode(survivors, erased, k)
        assert(rec.sameElements(blocks(erased)),
          s"erasures ($e1,$e2): parity block $erased not recovered")
      }
    }
  }

  test("ec_reconstruct repairs every 2-erasure pattern across the corpus") {
    val rows = graft.operators.MetadataOps.ec_reconstruct(spark, sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(4)),
      s"${rows.count(!_.getBoolean(4))} documents failed block reconstruction")
    // the deterministic erasure choice must exercise data/data,
    // data/parity and parity/parity patterns
    val patterns = rows.map(r => (r.getInt(2) < 4, r.getInt(3) < 4)).toSet
    assert(patterns.size >= 3, s"erasure patterns not diverse: $patterns")
  }

  test("ec_parity_rs query emits one row per document with parity fingerprints") {
    val df = graft.operators.MetadataOps.ec_parity_rs(spark, sf0001)
    val n = Tables.documents(spark, sf0001).count()
    assert(df.count() == n)
    val row = df.head()
    assert(row.getInt(2) > 0) // stripe_size
  }
}
