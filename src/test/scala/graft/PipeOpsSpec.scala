package graft

import graft.operators.PipeOps
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

/** Gates for the subprocess pipe transform (hadoop-streaming
  * PipeMapper shape): the transform itself, and — the contract the
  * reference's PipeMapRed enforces — that every failure path is LOUD.
  * A pipe that truncates silently corrupts a training corpus in a way
  * no downstream check catches.
  */
class PipeOpsSpec extends SparkSpec {
  import spark.implicits._

  private def lines(n: Int) =
    spark.range(n).select(concat(lit("rec"), $"id").as("l")).as[String]
      .repartition(2)

  test("text_pipe_transform equals the in-engine transform") {
    val piped = PipeOps.text_pipe_transform(spark, sf0001)
    val native = Tables.documents(spark, sf0001)
      .select($"doc_id",
        upper(regexp_replace(lower($"text"), "[^a-z0-9 ]", "")).as("shout"),
        length(regexp_replace(lower($"text"), "[^a-z0-9 ]", ""))
          .cast("long").as("n_ascii"))
    assert(piped.count() === native.count())
    assert(piped.join(native, Seq("doc_id", "shout", "n_ascii"), "left_anti")
      .count() === 0)
  }

  test("pipePartitions runs one process per partition, not per record") {
    // cat is 1:1; with 2 partitions a per-record spawn would be 1000
    // processes — this just proves the partition path works end to end
    // and preserves every record byte-for-byte.
    val out = PipeOps.pipePartitions(lines(1000), Seq("cat")).collect().sorted
    assert(out.toSeq === (0 until 1000).map(i => s"rec$i").sorted)
  }

  test("non-zero exit fails the task loudly with the stderr tail") {
    val ex = intercept[SparkException] {
      PipeOps.pipePartitions(lines(100),
        Seq("sh", "-c", "head -n 2; echo boom >&2; exit 3")).count()
    }
    val msg = ex.getCause.getMessage
    assert(msg.contains("exited 3"))
    assert(msg.contains("boom"))
  }

  test("clean exit after consuming half the input is truncation, not success") {
    // `head -n 2` exits 0 — an exit-code check alone would bless a
    // half-processed partition. The 1:1 parity contract must fail it.
    val ex = intercept[SparkException] {
      PipeOps.pipePartitions(lines(100), Seq("head", "-n", "2")).count()
    }
    assert(ex.getCause.getMessage.contains("1:1 parity"))
  }

  test("a filtering command is allowed when the 1:1 contract is waived") {
    val kept = PipeOps.pipePartitions(lines(100),
      Seq("grep", "rec1"), oneToOne = false).collect()
    // rec1 and rec10..rec19 — 11 of rec0..rec99 start with "rec1"
    assert(kept.length === 11 && kept.forall(_.startsWith("rec1")))
  }

  test("an UPSTREAM read failure is never waived as a clean early EOF") {
    // The upstream iterator throws IOException mid-partition — the
    // child saw truncated input and exits 0. With oneToOne=false an
    // EPIPE-style waiver would silently bless the truncated output;
    // the classification must distinguish upstream failures from the
    // pipe's own EPIPE and fail the task loudly.
    val poisoned = lines(100).map { l =>
      if (l == "rec50") throw new java.io.IOException("upstream source died")
      l
    }(org.apache.spark.sql.Encoders.STRING)
    val ex = intercept[SparkException] {
      PipeOps.pipePartitions(poisoned, Seq("cat"), oneToOne = false).count()
    }
    val cause = ex.getCause
    assert(cause.getMessage.contains("child input truncated"))
    assert(cause.getCause.getMessage.contains("upstream source died"))
  }

  test("text_pipe_grep keeps exactly the records the in-engine filter keeps") {
    import org.apache.spark.sql.functions.{lower => lc}
    val piped = PipeOps.text_pipe_grep(spark, sf0001)
    val native = Tables.documents(spark, sf0001)
      .select($"doc_id",
        regexp_replace(lc($"text"), "[^a-z0-9 ]", "").as("clean"))
      .filter($"clean".contains("hash join"))
    assert(piped.count() > 0) // needle chosen to be present at sf0.001
    assert(piped.count() === native.count())
    assert(piped.join(native, Seq("doc_id", "clean"), "left_anti").count() === 0)
  }

  test("a chatty child's stderr stays bounded to the 4 KiB tail") {
    // 1M lines of stderr would be ~8 MB materialized; the ring buffer
    // keeps only the last 4096 bytes, and the failure message carries
    // the TAIL (the last thing the child said before dying).
    val ex = intercept[SparkException] {
      PipeOps.pipePartitions(lines(10),
        Seq("sh", "-c",
          "awk 'BEGIN { for (i=0;i<1000000;i++) print \"noise\" i > \"/dev/stderr\"; }'; " +
            "echo FINAL_WORDS >&2; exit 7")).count()
    }
    val msg = ex.getCause.getMessage
    assert(msg.contains("exited 7"))
    assert(msg.contains("FINAL_WORDS"))
    assert(!msg.contains("noise0\n")) // early noise evicted from the ring
  }

  test("a child that failed before a partial consumer stopped still fails the task") {
    // finish()'s checks only run when stdout fully drains; a downstream
    // limit/take abandons the iterator early. The completion-listener
    // backstop must still surface a child that EXITED NON-ZERO on its
    // own. The child consumes all stdin, emits one record, and exits 3;
    // the consumer takes that one record and stops — then waits long
    // enough that the child's exit precedes task completion.
    val piped = PipeOps.pipePartitions(lines(100).repartition(1),
      Seq("sh", "-c", "cat > /dev/null; echo survivor; exit 3"), oneToOne = false)
    val partial = piped.mapPartitions { it =>
      val first = if (it.hasNext) List(it.next()) else Nil
      Thread.sleep(1500) // let the child reach its exit before completion
      first.iterator
    }(org.apache.spark.sql.Encoders.STRING)
    val ex = intercept[SparkException] { partial.collect() }
    // the listener's throw arrives wrapped (TaskCompletionListenerException
    // carries the message, not necessarily the cause chain) — search the
    // whole chain's messages
    val msg = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => String.valueOf(t.getMessage)).mkString("; ")
    assert(msg.contains("exited 3") && msg.contains("consumer stopped early"), msg)
  }

  test("a partial consumer over a healthy child is a clean consumer-driven stop") {
    // The backstop must not turn legitimate early termination (limit/
    // take over a well-behaved child) into a failure: the child here
    // either exits 0 or is still alive at completion (destroyed quietly).
    val piped = PipeOps.pipePartitions(lines(100).repartition(1),
      Seq("cat"), oneToOne = false)
    val partial = piped.mapPartitions { it =>
      val first = if (it.hasNext) List(it.next()) else Nil
      Thread.sleep(300)
      first.iterator
    }(org.apache.spark.sql.Encoders.STRING)
    assert(partial.collect().length === 1)
  }
}
