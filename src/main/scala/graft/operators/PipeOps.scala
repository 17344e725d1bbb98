package graft.operators

import java.io.{BufferedWriter, IOException, OutputStreamWriter}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.TaskContext
import org.apache.spark.graft.TaskContextBridge
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Subprocess PIPE transform — the Hadoop Streaming capability
  * (reference: hadoop-tools/hadoop-streaming/src/main/java/org/apache/
  * hadoop/streaming/PipeMapper.java, PipeMapRed.java): stream each
  * partition's records through an external command's stdin and read
  * the transformed records back from its stdout.
  *
  * Spark-native shape: one subprocess per PARTITION (not per record —
  * process spawn is milliseconds, a partition is millions of rows at
  * 100 TB), a dedicated writer thread feeding stdin while the task
  * thread consumes stdout (single-threaded write-then-read deadlocks
  * on any pipe buffer once a partition outgrows 64 KiB), and the
  * process lifecycle tied to the task via a completion listener so a
  * failed/cancelled task cannot leak children.
  *
  * FAILURE IS LOUD, NEVER TRUNCATION — the PipeMapRed contract: after
  * stdout drains, the task (a) fails on non-zero exit with the stderr
  * tail, (b) fails on any stdin-side error other than the EPIPE that
  * follows a clean early exit — and an UPSTREAM iterator failure is
  * never classified as EPIPE (the child saw truncated input; blessing
  * its exit-0 output would be silent truncation), and (c) for 1:1
  * record transforms fails when out-count != in-count, which catches
  * the exits-0-after-consuming-half-the-input class (e.g. `head`)
  * that an exit-code check alone would bless. Gated in PipeOpsSpec.
  */
object PipeOps {

  /** Marks an IOException raised by the pipe's own write/flush/close —
    * the only failure class that may be waived as a clean early EOF
    * (child closed stdin and exited 0, e.g. `grep -m`). An exception
    * from the UPSTREAM partition iterator is deliberately NOT wrapped:
    * the child received truncated input, so its output is never
    * trustworthy regardless of exit code. */
  private final class PipeWriteFailure(cause: IOException)
    extends RuntimeException(cause)

  /** Pipe every line of `lines` through `cmd` (spawned once per
    * partition with LC_ALL=C for byte-deterministic text handling).
    * `oneToOne = true` enforces the record-transform parity contract. */
  def pipePartitions(lines: Dataset[String], cmd: Seq[String],
                     oneToOne: Boolean = true): Dataset[String] = {
    import lines.sparkSession.implicits._
    lines.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pb = new ProcessBuilder(cmd: _*)
        pb.environment().put("LC_ALL", "C")
        val proc = pb.start()
        val ctx = TaskContext.get()
        // Set by finish() so the completion listener doesn't re-verify
        // a fully-drained pipe; checked-and-set by the listener so the
        // partially-consumed path verifies exactly once.
        val checksDone = new java.util.concurrent.atomic.AtomicBoolean(false)
        val stderrTail = new AtomicReference[String]("")
        // The drain thread is created further down (after the writer);
        // the listener closes over this ref so it can best-effort join
        // the drain before reading stderrTail — without it the
        // "consumer stopped early" message raced the drain and could
        // carry an empty/truncated tail.
        val errDrainRef = new AtomicReference[Thread](null)
        Option(ctx).foreach(_.addTaskCompletionListener[Unit] { c =>
          if (proc.isAlive) {
            // Consumer abandoned the stream (limit/take/cancel) while
            // the child was still running: the stop is consumer-driven,
            // nothing to verify — just don't leak the process.
            proc.destroyForcibly()
          } else if (checksDone.compareAndSet(false, true) && !c.isFailed()) {
            // finish() never ran (downstream limit/take stopped pulling
            // before stdout drained) yet the child already exited on
            // its own. "Failure is loud, never truncation" must hold
            // here too: a non-zero exit still fails the task. Parity
            // is NOT checkable — the consumer chose to stop reading.
            // Skipped when the task itself failed: the real error is
            // already propagating and must not be masked.
            val exit = proc.exitValue()
            if (exit != 0) {
              // best-effort, bounded: the child has exited so the
              // drain is at EOF; 200 ms only guards a wedged stream
              Option(errDrainRef.get).foreach(t =>
                try t.join(200) catch { case _: InterruptedException => })
              throw new IllegalStateException(
                s"pipe command ${cmd.mkString(" ")} exited $exit " +
                  s"(consumer stopped early); stderr: ${stderrTail.get}")
            }
          }
        })

        val inCount = new AtomicLong(0L)
        val writerEx = new AtomicReference[Throwable](null)
        val writer = new Thread(() => {
          // Propagate the task context: it's a thread-local, and the
          // upstream iterator (shuffle reader, SQL metrics, unsafe
          // memory) calls TaskContext.get() — null here would NPE or
          // corrupt memory accounting. Mirrors Spark's PipedRDD.
          if (ctx != null) TaskContextBridge.set(ctx)
          try {
            val w = new BufferedWriter(
              new OutputStreamWriter(proc.getOutputStream, UTF_8), 1 << 16)
            while (it.hasNext) {
              // upstream read OUTSIDE the pipe-write try: a failure
              // here must surface as an upstream error, never EPIPE
              val rec = it.next()
              try { w.write(rec); w.write('\n') }
              catch { case io: IOException => throw new PipeWriteFailure(io) }
              inCount.incrementAndGet()
            }
            try w.close()
            catch { case io: IOException => throw new PipeWriteFailure(io) }
          } catch {
            case t: Throwable =>
              // A PipeWriteFailure may just mean the child stopped
              // reading; the exit-code/parity checks below decide
              // whether that was a clean early exit. Anything else
              // (upstream failure) is always fatal.
              writerEx.compareAndSet(null, t)
              try proc.getOutputStream.close() catch { case _: Throwable => }
          }
        }, "graft-pipe-stdin")
        writer.setDaemon(true)
        writer.start()

        val errDrain = new Thread(() => {
          // Bounded ring buffer: keep only the LAST 4 KiB as bytes
          // stream in — a chatty/looping child must not balloon task
          // memory by materializing its whole stderr.
          try {
            val in = proc.getErrorStream
            val cap = 4096
            val ring = new Array[Byte](cap)
            val buf = new Array[Byte](cap)
            var total = 0L
            var n = in.read(buf)
            while (n > 0) {
              var i = 0
              while (i < n) {
                ring(((total + i) % cap).toInt) = buf(i); i += 1
              }
              total += n
              n = in.read(buf)
            }
            val len = math.min(total, cap.toLong).toInt
            val bytes = new Array[Byte](len)
            var j = 0
            while (j < len) {
              bytes(j) = ring(((total - len + j) % cap).toInt); j += 1
            }
            // The ring slices at a byte offset, which can land inside a
            // multi-byte UTF-8 sequence; skip leading continuation
            // bytes (0b10xxxxxx) so the tail doesn't render replacement
            // characters at its head.
            var off = 0
            while (off < len && (bytes(off) & 0xC0) == 0x80) off += 1
            stderrTail.set(new String(bytes, off, len - off, UTF_8))
          } catch { case _: Throwable => }
        }, "graft-pipe-stderr")
        errDrain.setDaemon(true)
        errDrain.start()
        errDrainRef.set(errDrain)

        val out = scala.io.Source.fromInputStream(proc.getInputStream, "UTF-8")
          .getLines()
        new Iterator[String] {
          private var outCount = 0L
          private var finished = false
          def hasNext: Boolean =
            if (out.hasNext) true
            else { if (!finished) { finished = true; finish() }; false }
          def next(): String = { val l = out.next(); outCount += 1; l }
          private def finish(): Unit = {
            checksDone.set(true)
            val exit = proc.waitFor()
            writer.join(); errDrain.join()
            if (exit != 0)
              throw new IllegalStateException(
                s"pipe command ${cmd.mkString(" ")} exited $exit " +
                  s"after $outCount records; stderr: ${stderrTail.get}")
            val we = writerEx.get
            val cleanEarlyEof = we != null && we.isInstanceOf[PipeWriteFailure]
            if (we != null && !cleanEarlyEof)
              throw new IllegalStateException(
                s"pipe upstream/stdin failed for ${cmd.mkString(" ")} " +
                  s"after ${inCount.get} records — child input truncated, " +
                  "output discarded", we)
            if (oneToOne && (outCount != inCount.get || we != null))
              throw new IllegalStateException(
                s"pipe command ${cmd.mkString(" ")} broke 1:1 parity: " +
                  s"${inCount.get} records in, $outCount out" +
                  (if (we != null) s" (stdin closed early: ${we.getMessage})" else ""))
          }
        }
      }
    }
  }

  /** Registered query: the canonical streaming-wordcount-era transform
    * — doc_id TAB ascii-text piped through one awk process per
    * partition that uppercases and measures each record. The piped
    * field is restricted to [a-z0-9 ] BEFORE the pipe because the
    * subprocess is byte/C-locale (awk's toupper/length disagree with
    * any unicode-aware engine on accented text); on that alphabet the
    * awk transform is exactly DuckDB's upper()/length(), which is what
    * lets an external-process operator carry a full SQL hash oracle. */
  def text_pipe_transform(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lines = Tables.documents(s, d)
      .select(concat_ws("\t", $"doc_id",
        regexp_replace(lower($"text"), "[^a-z0-9 ]", "")).as("line"))
      .as[String]
    val awk = Seq("awk", "-F\t",
      "{ print $1 \"\\t\" toupper($2) \"\\t\" length($2) }")
    pipePartitions(lines, awk)
      .map { l =>
        val f = l.split("\t", -1)
        (f(0).toLong, f(1), f(2).toLong)
      }
      .toDF("doc_id", "shout", "n_ascii")
      // harness-side determinism only (the driver hashes rows in
      // order); the pipe stage is a pure per-partition map — a
      // pipeline consumer drops this global sort
      .orderBy($"doc_id")
  }

  /** Registered query: the FILTER-shaped pipe (hadoop-streaming's
    * grep-style mapper, `oneToOne = false` — the subprocess DROPS
    * non-matching records, exercising the waived-parity path end to
    * end). The filter is a fixed-substring match (`index()` in awk ==
    * `position()` in SQL — no regex-dialect hazard) over the same
    * [a-z0-9 ]-restricted field as [[text_pipe_transform]], so the
    * filtering subprocess still carries a full SQL hash oracle. awk
    * rather than grep: grep exits 1 on a match-free partition, which
    * the loud-failure contract would (correctly) refuse to bless. */
  def text_pipe_grep(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val needle = "hash join"
    val lines = Tables.documents(s, d)
      .select(concat_ws("\t", $"doc_id",
        regexp_replace(lower($"text"), "[^a-z0-9 ]", "")).as("line"))
      .as[String]
    val awk = Seq("awk", "-F\t", s"index($$2, \"$needle\") { print }")
    pipePartitions(lines, awk, oneToOne = false)
      .map { l =>
        val f = l.split("\t", -1)
        (f(0).toLong, f(1))
      }
      .toDF("doc_id", "clean")
      // harness-side determinism only — see text_pipe_transform
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_pipe_transform" -> text_pipe_transform _,
    "text_pipe_grep" -> text_pipe_grep _)

  val oracle: Map[String, String] = Map(
    "text_pipe_transform" ->
      """SELECT doc_id,
        | upper(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS shout,
        | length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS n_ascii
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_pipe_grep" ->
      """SELECT doc_id,
        | regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS clean
        |FROM documents
        |WHERE position('hash join' IN regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) > 0
        |ORDER BY doc_id""".stripMargin)
}
