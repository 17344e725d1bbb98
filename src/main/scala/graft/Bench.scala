package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: every registered query, full materialization.
  *
  * Methodology (fixes the r1 mismeasurement): results are written to
  * the `noop` format sink, which evaluates every output row — a bare
  * `.count()` let Catalyst prune unreferenced projections and
  * eliminate sorts (mr_sort never sorted; text_fingerprint never
  * hashed). One untimed warmup pass absorbs JIT/codegen warmup so
  * per-query numbers are comparable regardless of map-iteration order.
  * Failures are reported loudly in an "errors" field (value -1), never
  * silently recorded as a fast green time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    BucketCapMetrics.register(spark)

    // ── Memory-axis instrumentation (r16 verdict: the driver's run
    // inflated persist-heavy graph-index queries 2–9× while BOTH
    // existing canaries read flat — CPU and I/O don't measure heap
    // pressure). Three additions close the axis: (a) task-metric
    // totals (GC time, memory/disk spill) accumulated per query via a
    // listener, so an inflated query carries its own diagnosis in the
    // JSON tail; (b) -Xmx recorded so heap-config differences between
    // environments are visible at all; (c) a persist-shaped third
    // canary below, next to the CPU and I/O ones.
    val accGc = new java.util.concurrent.atomic.AtomicLong(0L)
    val accSpillMem = new java.util.concurrent.atomic.AtomicLong(0L)
    val accSpillDisk = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          accGc.addAndGet(m.jvmGCTime)
          accSpillMem.addAndGet(m.memoryBytesSpilled)
          accSpillDisk.addAndGet(m.diskBytesSpilled)
        }
      }
    })
    // per-query WORST observed (gc ms, spill-mem B, spill-disk B,
    // storage-used-after B) across every pass incl. warmup — the
    // diagnostic wants the bad behavior, not the min
    val qMem = scala.collection.mutable.HashMap.empty[String, (Long, Long, Long, Long)]
    var storagePeak = 0L

    def runOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Either[String, Double] = {
      // Queries that persist an intermediate stage (dedup signatures)
      // would otherwise serve the measured pass from the warmup pass's
      // cache — clear first so every timed run pays its real cost.
      // releaseAll additionally drops the registry's bookkeeping so
      // tracked entries don't accumulate across 130+ query runs.
      CacheRegistry.releaseAll()
      spark.catalog.clearCache()
      // Settle the heap between queries (r19, measured): the bisect of
      // r18's phantom graph_triangles "regression" pinned a 13–34%
      // per-query inflation to NEIGHBOR GC DEBT — the same query read
      // 9.6 s in a 2-query JVM and 12.8 s after the persist-heavy
      // graph family churned the heap, on two different trees
      // (SCALE.md r19 addendum). A forced full GC here makes each
      // timed query pay its own allocation cost instead of inheriting
      // the previous query's garbage, the exact isolation rationale of
      // the cache clear above; the measured floor matches the
      // subset-JVM number. Off-switch: SPARK_GRAFT_GC_BETWEEN=0.
      if (sys.env.getOrElse("SPARK_GRAFT_GC_BETWEEN", "1") == "1") System.gc()
      org.apache.spark.graft.ListenerFlush.flush(spark.sparkContext)
      val (gc0, sm0, sd0) = (accGc.get(), accSpillMem.get(), accSpillDisk.get())
      val t0 = System.nanoTime()
      val r = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).takeWhile(_ != '\n').take(200)}")
      }
      // storage-memory in use right after the run (caches the query
      // left tracked), BEFORE the next run's clear — the high-water
      // tells whether the suite ever approached the storage pool cap
      val storageUsed = spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, rem) => max - rem }.sum
      storagePeak = math.max(storagePeak, storageUsed)
      org.apache.spark.graft.ListenerFlush.flush(spark.sparkContext)
      val delta = (accGc.get() - gc0, accSpillMem.get() - sm0,
        accSpillDisk.get() - sd0, storageUsed)
      qMem.updateWith(name) {
        case Some((g, m, dk, st)) => Some((math.max(g, delta._1),
          math.max(m, delta._2), math.max(dk, delta._3), math.max(st, delta._4)))
        case None => Some(delta)
      }
      r
    }

    // Dev subset filter (regex on query name) — lets a perf
    // investigation bench ONE family cold-JVM without the other 220
    // queries' half hour; never set by the driver.
    val onlyRe = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => onlyRe.forall(_.findFirstIn(n).isDefined) }
    def pass(label: String): Seq[(String, Either[String, Double])] =
      ordered.map { case (name, fn) =>
        val r = runOne(name, fn)
        System.err.println(f"[bench:$label] $name ${r.fold(e => s"ERR $e", t => f"$t%.2f s")}")
        name -> r
      }
    if (sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") == "1") pass("warmup")
    // Min over N measured passes: a GC pause or host-load blip on a
    // single pass otherwise lands in the round's recorded numbers
    // (observed: one 1.3 s query measuring 8 s on a loaded host). Min,
    // not mean — the floor is the reproducible steady-state cost; noise
    // is strictly additive.
    val nPasses = sys.env.get("SPARK_GRAFT_PASSES")
      .map(v => v.toIntOption.getOrElse(
        sys.error(s"SPARK_GRAFT_PASSES must be a positive integer, got '$v'")))
      .getOrElse(2)
    require(nPasses >= 1, s"SPARK_GRAFT_PASSES must be >= 1, got $nPasses")
    val results = (1 to nPasses).map(i => pass(s"measured$i"))
      .reduce { (a, b) =>
        a.zip(b).map { case ((n, ra), (_, rb)) =>
          // min over successes; a query is FAILED only if every pass
          // failed — a transient blip on one pass shouldn't mask a
          // measured success any more than a GC pause should (the same
          // noise rationale as min-over-times)
          n -> ((ra, rb) match {
            case (Right(x), Right(y)) => Right(math.min(x, y))
            case (Right(x), Left(_)) => Right(x)
            case (Left(_), Right(y)) => Right(y)
            case (Left(e), _) => Left(e)
          })
        }
      }

    results.foreach {
      case (n, Left(err)) => System.err.println(s"[bench] FAILED $n: $err")
      case _ =>
    }

    // Host-drift canary: a FIXED, code-independent workload (bit_xor
    // hash-fold over spark.range — pure whole-stage-codegen CPU, no
    // I/O, untouched by any graft code change), measured min-over-3
    // after a warmup exactly like the queries. `drift` = canary_sec /
    // pin, where the pin is the idle-host floor measured at the
    // driver's config (local[32], r11). Round-over-round comparisons
    // divide per-query times by `drift` instead of hand-normalizing:
    // r10's uniform 1.15x host inflation nearly masked a real
    // per-query outlier. KNOWN LIMIT (measured r11): the canary is
    // CPU-only, so DISK contention inflates query times without
    // moving it (observed: drift 0.95 alongside a uniform ~1.3x
    // query inflation while another process churned the page cache).
    // drift ~1 with uniformly elevated times ⇒ suspect I/O — which the
    // SECOND canary below measures directly. Both pins are the
    // idle-host floors at the driver's config (local[32], sf0.1) and
    // are env-overridable (SPARK_GRAFT_CANARY_PIN /
    // SPARK_GRAFT_CANARY_IO_PIN) so a different host/SF can re-pin
    // without a code change.
    val canaryPin = sys.env.get("SPARK_GRAFT_CANARY_PIN")
      .flatMap(_.toDoubleOption).getOrElse(0.52)
    def canaryOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 2000000000L, 1L, 32).selectExpr("bit_xor(xxhash64(id))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    canaryOnce()
    val canarySec = (1 to 3).map(_ => canaryOnce()).min
    val drift = canarySec / canaryPin
    System.err.println(f"[bench] cpu canary $canarySec%.3f s, drift ${drift}%.2fx vs idle pin $canaryPin%.2f")
    // I/O canary (r12 verdict): full-width noop materialization of the
    // sf dir's largest table — parquet decode + file read, negligible
    // compute — so disk/page-cache contention that the CPU canary is
    // blind to (r11: drift_cpu 0.95 alongside a uniform 1.3x query
    // inflation from another process churning the page cache) shows up
    // as drift_io > 1 with drift_cpu ~ 1. Page-cache sensitivity is BY
    // DESIGN: the queries being normalized read through the same cache.
    // pin = idle min-over-3 at the driver config (local[32], sf0.1,
    // warm page cache — contention shows up as eviction), measured r13
    val ioPin = sys.env.get("SPARK_GRAFT_CANARY_IO_PIN")
      .flatMap(_.toDoubleOption).getOrElse(0.19)
    def ioCanaryOnce(): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    ioCanaryOnce()
    val ioSec = (1 to 3).map(_ => ioCanaryOnce()).min
    val driftIo = ioSec / ioPin
    System.err.println(f"[bench] io canary $ioSec%.3f s, drift ${driftIo}%.2fx vs idle pin $ioPin%.2f")
    // MEMORY canary (r16 verdict): shaped exactly like the inflation
    // victims — a persisted frame + three superstep join rounds, each
    // round persisted MEMORY_AND_DISK and materialized, previous round
    // dropped (the graph-loop cadence). Pure CPU work is trivial
    // (xxhash + a join on a pre-cached frame), so on an idle host this
    // tracks the CPU canary; under heap/GC/storage-pool pressure the
    // persist churn pays eviction + spill + GC that neither the CPU
    // canary (no allocation) nor the I/O canary (no persist) feels.
    // drift_mem >> drift_cpu ⇒ memory-squeezed host; read the
    // persist-heavy families (graph_*_index, dedup_minhash_index)
    // against drift_mem. Pin = idle min-over-3 at the driver config
    // (local[32], -Xmx8g, r17).
    // pin = idle min at local[32]/-Xmx8g (measured r17: 5.78 s twice,
    // reproducible to 1%). Sizing note (measured r17): 12M rows /
    // 1.5M keys discriminates a 3g heap squeeze at 1.9x where an
    // 8M-row variant read only 1.2x — the working set has to actually
    // lean on the heap for the canary to feel it; the ~20 s the three
    // iterations add to a bench run is the price of an adjudicable
    // memory axis.
    val memPin = sys.env.get("SPARK_GRAFT_CANARY_MEM_PIN")
      .flatMap(_.toDoubleOption).getOrElse(5.78)
    def memCanaryOnce(): Double = {
      import org.apache.spark.storage.StorageLevel
      val t0 = System.nanoTime()
      val base = spark.range(0L, 12000000L, 1L, 32)
        .selectExpr("id % 1500000 AS k", "xxhash64(id) AS p1",
          "xxhash64(id + 1) AS p2", "xxhash64(id + 2) AS p3")
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        base.count()
        var cached = base
        var cur: org.apache.spark.sql.DataFrame = base
        for (_ <- 1 to 3) {
          // XOR mixing, never +: the payloads are full-range hashes
          // and ANSI mode (Spark 4 default) faults long overflow
          val agg = cur.groupBy("k")
            .agg(org.apache.spark.sql.functions.expr("bit_xor(p1 ^ p2)").as("h"))
          val nxt = base.join(agg, "k")
            .selectExpr("k", "p1 ^ h AS p1", "p2", "p3")
            .persist(StorageLevel.MEMORY_AND_DISK)
          nxt.count()
          if (cached ne base) cached.unpersist(blocking = false)
          cached = nxt
          cur = nxt
        }
        if (cached ne base) cached.unpersist(blocking = false)
        (System.nanoTime() - t0) / 1e9
      } finally base.unpersist(blocking = false)
    }
    memCanaryOnce()
    val memSec = (1 to 3).map(_ => memCanaryOnce()).min
    val driftMem = memSec / memPin
    System.err.println(f"[bench] mem canary $memSec%.3f s, drift ${driftMem}%.2fx vs idle pin $memPin%.2f")
    // Drift-NORMALIZED round-over-round ratios (r13 verdict): with
    // drift_cpu emitted on both sides, per-query comparisons against
    // the last committed round stop eyeballing host speed —
    //   ratio_norm(q) = (t_now / t_prev) · (drift_cpu_prev / drift_cpu_now)
    // so a uniform host slowdown cancels and only real code movement
    // survives (r13's raw 0.72× median was ~3/4 host speed). The
    // previous round's file is the highest-numbered committed
    // BENCH_r*.json (override: SPARK_GRAFT_PREV_BENCH); parse errors
    // degrade to no normalization, never a bench failure. CPU drift is
    // the normalizer because it is the code-independent one; when
    // drift_io and drift_cpu disagree, the stderr tail says so and
    // I/O-bound outliers should be read against drift_io by hand.
    // Previous-round sources, most- to least-complete:
    //   1. SPARK_GRAFT_PREV_BENCH (explicit override)
    //   2. BENCH_PREV.json — the full bare JSON line of the last
    //      committed round's bench (refreshed each round after the
    //      final local bench run; the driver's BENCH_r{N}.json wrapper
    //      truncates its stdout tail, so this is the durable
    //      full-coverage baseline)
    //   3. the highest-numbered BENCH_r*.json — driver wrapper whose
    //      "tail" field holds an ESCAPED, possibly head-truncated
    //      fragment of the bench line; unescape and mine whatever
    //      name:number pairs survive (partial coverage beats none)
    case class PrevBench(name: String, queries: Map[String, Double], driftCpu: Double)
    val prevBench: Option[PrevBench] = try {
      val dir = new java.io.File(".")
      val cand = sys.env.get("SPARK_GRAFT_PREV_BENCH").map(new java.io.File(_))
        .orElse(Some(new java.io.File("BENCH_PREV.json")).filter(_.isFile))
        .orElse(Option(dir.listFiles()).toSeq.flatten
          .filter(_.getName.matches("BENCH_r\\d+\\.json"))
          .sortBy(f => f.getName.replaceAll("\\D", "").toInt).lastOption)
      val reserved = Set("n", "rc", "cpus", "sf", "metric", "value",
        "canary_sec", "drift", "drift_cpu", "canary_io_sec", "drift_io",
        "canary_mem_sec", "drift_mem", "xmx_mb", "gc_sec", "spill_mem_mb",
        "spill_disk_mb", "storage_peak_mb", "norm_median", "parsed")
      cand.flatMap { f =>
        val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
          .replace("\\\"", "\"")
        val drift = "\"drift_cpu\"\\s*:\\s*([0-9.]+)".r
          .findFirstMatchIn(txt).map(_.group(1).toDouble)
          .orElse("\"drift\"\\s*:\\s*([0-9.]+)".r
            .findFirstMatchIn(txt).map(_.group(1).toDouble))
        // prefer the well-formed queries block; fall back to mining
        // every name:number pair (truncated wrapper tails)
        val body = "\"queries\"\\s*:\\s*\\{([^}]*)\\}".r
          .findFirstMatchIn(txt).map(_.group(1))
          .getOrElse(txt.replaceAll(
            "\"(norm_ratios|gc_top|spill_top)\"\\s*:\\s*\\{[^}]*\\}", ""))
        val qs = "\"([^\"]+)\"\\s*:\\s*(-?[0-9.]+)".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble)
          .filter { case (k, v) => v > 0 && !reserved(k) && !k.startsWith("norm") }
          .toMap
        if (qs.isEmpty) None else Some(PrevBench(f.getName, qs, drift.getOrElse(1.0)))
      }
    } catch { case _: Throwable => None }
    val normRatios: Map[String, Double] = prevBench match {
      case Some(p) if p.driftCpu > 0 && drift > 0 =>
        val adj = p.driftCpu / drift
        results.collect {
          case (n, Right(t)) if p.queries.get(n).exists(_ > 0) =>
            n -> t / p.queries(n) * adj
        }.toMap
      case _ => Map.empty
    }
    val normMedian: Option[Double] = if (normRatios.isEmpty) None else {
      val sorted = normRatios.values.toSeq.sorted
      Some(sorted(sorted.size / 2))
    }
    if (normRatios.nonEmpty) {
      val median = normMedian.get
      val worst = normRatios.toSeq.sortBy(-_._2).take(5)
        .map { case (n, r) => f"$n ${r}%.2fx" }.mkString(", ")
      System.err.println(
        f"[bench] drift-normalized vs ${prevBench.get.name}: median ${median}%.2fx " +
          f"over ${normRatios.size} common queries (cpu-drift adj ${prevBench.get.driftCpu / drift}%.2f); " +
          s"worst: $worst")
      if (math.abs(driftIo - drift) > 0.25)
        System.err.println(
          f"[bench] NOTE drift_io ${driftIo}%.2f vs drift_cpu ${drift}%.2f disagree — " +
            "read I/O-bound outliers against drift_io")
    }
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "'") + "\""
    val qs = results.map { case (k, v) =>
      jstr(k) + ":" + v.fold(_ => "-1", t => f"$t%.3f")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(m)) => jstr(k) + ":" + jstr(m) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    val normTail = if (normRatios.isEmpty) "" else {
      val rs = normRatios.toSeq.sortBy(_._1)
        .map { case (k, v) => jstr(k) + ":" + f"$v%.3f" }.mkString("{", ",", "}")
      f""","norm_vs":${jstr(prevBench.get.name)},"norm_median":${normMedian.get}%.3f,""" +
        s""""norm_ratios":$rs"""
    }
    // Memory-axis tail: heap config + the suite's worst per-query GC
    // and disk-spill observations (worst across all passes — the
    // diagnostic wants the bad behavior, not the min). A driver-run
    // inflation on persist-heavy queries now arrives with its own
    // diagnosis: gc_top names the queries that burned heap, spill_top
    // the ones that hit disk, drift_mem whether the HOST was squeezed.
    // GC seconds are TASK-SUMMED jvmGCTime — one wall-clock pause
    // counts once per concurrently-running task, so divide by ~cpus
    // for wall intuition; the value's job is RELATIVE ranking across
    // queries and rounds (measured r17: squeezing 8g→3g doubled
    // gc_sec 95→204 while the victims inflated 1.3–1.6x and spill
    // stayed zero — GC, not spill, is the heap-pressure signature).
    val xmxMb = Runtime.getRuntime.maxMemory / (1024 * 1024)
    val gcSecTotal = qMem.values.map(_._1).sum / 1e3
    val spillMemMb = qMem.values.map(_._2).sum / (1024 * 1024)
    val spillDiskMb = qMem.values.map(_._3).sum / (1024 * 1024)
    val gcTop = qMem.toSeq.sortBy(-_._2._1).take(8)
      .filter(_._2._1 > 0)
      .map { case (n, (g, _, _, _)) => jstr(n) + ":" + f"${g / 1e3}%.2f" }
      .mkString("{", ",", "}")
    val spillTop = qMem.toSeq.sortBy(-_._2._3).take(8)
      .filter(_._2._3 > 0)
      .map { case (n, (_, _, dk, _)) => jstr(n) + ":" + (dk / (1024 * 1024)) }
      .mkString("{", ",", "}")
    qMem.toSeq.sortBy(-_._2._1).take(5).filter(_._2._1 > 500).foreach {
      case (n, (g, m, dk, _)) => System.err.println(
        f"[bench] mem-heavy $n: gc ${g / 1e3}%.2f s, spill mem ${m / 1048576}MB disk ${dk / 1048576}MB")
    }
    // Compact recap as the LAST fields (r18 verdict Wrong #3): the
    // driver's BENCH_r{N}.json wrapper keeps only the final ~2000 chars
    // of bench stdout, and the large alphabetical norm_ratios map was
    // pushing the adjudication fields (value, xmx_mb, gc_sec,
    // norm_median) out of that window — so every future BENCH_r*.json
    // tail is self-adjudicating regardless of where truncation lands.
    val gcTop5 = qMem.toSeq.sortBy(-_._2._1).take(5).filter(_._2._1 > 0)
      .map { case (n, (g, _, _, _)) => f"$n=${g / 1e3}%.1f" }.mkString(";")
    // r20 (r19 verdict ask #2): the driver keeps only the final ~2000
    // chars of stdout and its per-query parser has returned null two
    // rounds running (the full 248-query JSON line cannot fit the
    // tail). The slowest-20 walls are the only per-query numbers whose
    // round-over-round movement matters — put them in the recap so
    // they survive truncation. Output-only; timed regions unchanged.
    val timeTop = results.collect { case (n, Right(t)) => (n, t) }
      .sortBy(-_._2).take(20)
      .map { case (n, t) => f"$n=$t%.2f" }.mkString(";")
    val recap = f"total=$total%.1f xmx_mb=$xmxMb gc_sec=$gcSecTotal%.1f " +
      f"drift_cpu=$drift%.2f drift_io=$driftIo%.2f drift_mem=$driftMem%.2f" +
      normMedian.map(m => f" norm_median=$m%.3f").getOrElse("") +
      s" gc_top=[$gcTop5] time_top=[$timeTop]"
    System.err.println(s"[bench] recap $recap")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,""" +
        f""""canary_sec":$canarySec%.3f,"drift":$drift%.3f,"drift_cpu":$drift%.3f,""" +
        f""""canary_io_sec":$ioSec%.3f,"drift_io":$driftIo%.3f,""" +
        f""""canary_mem_sec":$memSec%.3f,"drift_mem":$driftMem%.3f,""" +
        f""""xmx_mb":$xmxMb,"gc_sec":$gcSecTotal%.1f,""" +
        f""""spill_mem_mb":$spillMemMb,"spill_disk_mb":$spillDiskMb,""" +
        s""""storage_peak_mb":${storagePeak / (1024 * 1024)},""" +
        s""""gc_top":$gcTop,"spill_top":$spillTop$normTail,""" +
        s""""recap":${jstr(recap)},"sf":"$sfDir"}"""
    println(json)
    // Also drop the line in a file: harness log capture tends to prefix
    // stdout (e.g. sbt's "[info] "), which breaks parse-the-last-line
    // consumers — the file is always the bare JSON.
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_result.json"), json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
