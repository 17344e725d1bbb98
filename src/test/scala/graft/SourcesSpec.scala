package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

/** External-source ingest: the JDBC (embedded Derby) and CSV paths
  * must round-trip values exactly against the parquet-side truth. */
class SourcesSpec extends SparkSpec {

  test("JDBC round-trip matches the direct aggregation") {
    import spark.implicits._
    val viaJdbc = Sources.src_jdbc_pageview(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val direct = Tables.events(spark, sf0001)
      .filter($"event_type" === "view")
      .groupBy($"user_id").agg(count(lit(1)).as("n_views"))
      .orderBy($"user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaJdbc.nonEmpty)
    assert(viaJdbc == direct)
  }

  test("bucketed join runs shuffle-free below the join") {
    import spark.implicits._
    // force the sort-merge path (at test scale Spark would broadcast
    // and hide the property under test)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Sources.src_bucketed_join(spark, sf0001)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      // the ONLY exchange allowed is the one above the join feeding the
      // groupBy; the bucketed scans must reach the join unshuffled
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange"),
        s"bucketed join sides must not shuffle:\n$joinPart")
      val got = df.collect()
      val direct = Tables.orders(spark, sf0001)
        .join(Tables.customer(spark, sf0001), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice"), 2).as("total_price"))
        .orderBy($"c_mktsegment")
        .collect()
      assert(got.toSeq == direct.toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("partitioned layout prunes to the filtered partition at the scan") {
    import spark.implicits._
    val df = Sources.src_partitioned_prune(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the event_type predicate must be resolved against the partition
    // LAYOUT (directory listing), not pushed as a data filter — other
    // partitions' bytes are never opened
    assert(plan.contains("PartitionFilters: ["),
      s"no partition filters in:\n${plan.take(2000)}")
    val pf = "PartitionFilters: \\[[^\\]]*event_type[^\\]]*\\]".r.findFirstIn(plan)
    assert(pf.isDefined, s"event_type not a partition filter:\n${plan.take(2000)}")
    val direct = Tables.events(spark, sf0001)
      .filter($"event_type" === "purchase")
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum($"value"), 2).as("total_value"))
      .orderBy($"day")
      .collect()
    assert(df.collect().toSeq == direct.toSeq)
  }

  test("CSV round-trip preserves types and aggregates") {
    import spark.implicits._
    val viaCsv = Sources.src_csv_agg(spark, sf0001).collect()
    val direct = Tables.part(spark, sf0001)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_parts"), round(avg($"p_retailprice"), 2).as("avg_price"))
      .orderBy($"p_brand")
      .collect()
    assert(viaCsv.nonEmpty)
    assert(viaCsv.toSeq == direct.toSeq)
  }

  test("SequenceFile round-trip preserves every key/value (Writable boundary)") {
    import spark.implicits._
    val viaSeq = Sources.src_sequencefile_agg(spark, sf0001).collect()
    val direct = Tables.customer(spark, sf0001)
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("n_customers"),
        sum(round($"c_acctbal" * 100).cast("long")).as("acctbal_cents"))
      .orderBy($"c_nationkey")
      .collect()
    assert(viaSeq.nonEmpty)
    assert(viaSeq.toSeq == direct.toSeq)
  }

  test("XML round-trip preserves keys, strings and money") {
    import spark.implicits._
    val viaXml = Sources.src_xml_agg(spark, sf0001).collect()
    val direct = Tables.customer(spark, sf0001)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        sum(round($"c_acctbal" * 100).cast("long")).as("acctbal_cents"))
      .orderBy($"c_mktsegment")
      .collect()
    assert(viaXml.nonEmpty)
    assert(viaXml.toSeq == direct.toSeq)
  }

  test("Avro container round-trip preserves every record (GenericRecord boundary)") {
    import spark.implicits._
    val viaAvro = Sources.src_avro_agg(spark, sf0001).collect()
    val direct = Tables.orders(spark, sf0001)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(round($"o_totalprice" * 100).cast("long")).as("totalprice_cents"))
      .orderBy($"o_orderpriority")
      .collect()
    assert(viaAvro.nonEmpty)
    assert(viaAvro.toSeq == direct.toSeq)
    // the export must really be Avro object-container files (magic
    // bytes "Obj\x01") — otherwise the serialization path under test
    // silently degraded to something else
    val dirs = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_avro_"))
    assert(dirs.nonEmpty)
    val parts = dirs.head.listFiles().filter(_.getName.endsWith(".avro"))
    assert(parts.nonEmpty, "expected .avro part files")
    val magic = new Array[Byte](4)
    val in = new java.io.FileInputStream(parts.head)
    try in.read(magic) finally in.close()
    assert(magic.toSeq == Seq[Byte]('O', 'b', 'j', 1),
      s"not an Avro container: ${magic.toSeq}")
  }

  test("gzip text export actually compresses and round-trips the aggregate") {
    import spark.implicits._
    val viaGz = Sources.src_text_gz_agg(spark, sf0001).collect()
    val direct = Tables.documents(spark, sf0001)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
      .orderBy($"source")
      .collect()
    assert(viaGz.nonEmpty)
    assert(viaGz.toSeq == direct.toSeq)
    // the export must really be gzip files — otherwise the codec path
    // under test silently degrades to plain text
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_textgz_"))
    assert(dir.nonEmpty)
    val parts = dir.head.listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".gz")),
      s"expected .gz parts, got: ${parts.map(_.getName).mkString(", ")}")
  }

  test("snappy BLOCK SequenceFile really block-compresses and round-trips") {
    import spark.implicits._
    val via = Sources.src_sequencefile_snappy_agg(spark, sf0001).collect()
    val direct = Tables.lineitem(spark, sf0001)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(round($"l_quantity" * 100).cast("long")).as("qty_cents"))
      .orderBy($"l_returnflag")
      .collect()
    assert(via.nonEmpty)
    assert(via.toSeq == direct.toSeq)
    // the container header must record BOTH the codec and block
    // compression — otherwise the setup silently degraded to RECORD
    // or none (SequenceFile v6 header: magic, key/value class names,
    // compress flag, blockCompress flag, codec class name)
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_seqsnappy_"))
    assert(dir.nonEmpty)
    val part = dir.head.listFiles().filter(_.getName.startsWith("part-")).head
    val head = new Array[Byte](512)
    val in = new java.io.FileInputStream(part)
    try in.read(head) finally in.close()
    val headStr = new String(head, "ISO-8859-1")
    assert(headStr.startsWith("SEQ"), "not a SequenceFile")
    assert(headStr.contains("org.apache.hadoop.io.compress.SnappyCodec"),
      "header does not record SnappyCodec")
    // compress and blockCompress boolean bytes sit between the
    // key/value class names and the codec name's VInt length prefix
    // (= 41, the codec class-name length); both must be 1
    val codecIdx = headStr.indexOf("org.apache.hadoop.io.compress.SnappyCodec")
    assert(head(codecIdx - 3) == 1 && head(codecIdx - 2) == 1,
      "compress/blockCompress flags not both set (not BLOCK compression)")
  }

  test("lz4 BLOCK SequenceFile really block-compresses and round-trips") {
    import spark.implicits._
    val via = Sources.src_sequencefile_lz4_agg(spark, sf0001).collect()
    val direct = Tables.orders(spark, sf0001)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(round($"o_totalprice" * 100).cast("long")).as("totalprice_cents"))
      .orderBy($"o_orderstatus")
      .collect()
    assert(via.nonEmpty)
    assert(via.toSeq == direct.toSeq)
    // same v6-header check as the snappy cell: codec recorded AND
    // both compress/blockCompress flags set
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_seqlz4_"))
    assert(dir.nonEmpty)
    val part = dir.head.listFiles().filter(_.getName.startsWith("part-")).head
    val head = new Array[Byte](512)
    val in = new java.io.FileInputStream(part)
    try in.read(head) finally in.close()
    val headStr = new String(head, "ISO-8859-1")
    assert(headStr.startsWith("SEQ"), "not a SequenceFile")
    assert(headStr.contains("org.apache.hadoop.io.compress.Lz4Codec"),
      "header does not record Lz4Codec")
    val codecIdx = headStr.indexOf("org.apache.hadoop.io.compress.Lz4Codec")
    assert(head(codecIdx - 3) == 1 && head(codecIdx - 2) == 1,
      "compress/blockCompress flags not both set (not BLOCK compression)")
  }

  test("zstd BLOCK SequenceFile block-compresses through GraftZstdCodec and round-trips") {
    import spark.implicits._
    val via = Sources.src_sequencefile_zstd_agg(spark, sf0001).collect()
    val direct = Tables.customer(spark, sf0001)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_custs"),
        sum(round($"c_acctbal" * 100).cast("long")).as("acctbal_cents"))
      .orderBy($"c_mktsegment")
      .collect()
    assert(via.nonEmpty)
    assert(via.toSeq == direct.toSeq)
    // same v6-header check as the snappy/lz4 cells: codec recorded AND
    // both compress/blockCompress flags set
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_seqzstd_"))
    assert(dir.nonEmpty)
    val part = dir.head.listFiles().filter(_.getName.startsWith("part-")).head
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)
    val headStr = new String(bytes.take(512), "ISO-8859-1")
    assert(headStr.startsWith("SEQ"), "not a SequenceFile")
    assert(headStr.contains("graft.sources.GraftZstdCodec"),
      "header does not record GraftZstdCodec")
    val codecIdx = headStr.indexOf("graft.sources.GraftZstdCodec")
    assert(bytes(codecIdx - 3) == 1 && bytes(codecIdx - 2) == 1,
      "compress/blockCompress flags not both set (not BLOCK compression)")
    // the compressed payload is REAL zstd, not a renamed passthrough:
    // every frame opens with the zstd magic 0x28 B5 2F FD (RFC 8878)
    val magic = Array[Byte](0x28, 0xB5.toByte, 0x2F, 0xFD.toByte)
    assert(bytes.sliding(4).exists(_.sameElements(magic)),
      "no zstd frame magic in the container body")
    // and the codec's stream pair round-trips a frame standalone (the
    // SPI contract SequenceFile relies on: finish-one-frame, reset,
    // read-until-EOF)
    val codec = new graft.sources.GraftZstdCodec
    val bo = new java.io.ByteArrayOutputStream()
    val cos = codec.createOutputStream(bo)
    val payload = ("graft zstd spi " * 100).getBytes("UTF-8")
    cos.write(payload); cos.finish()
    assert(bo.size() < payload.length, "frame did not compress repetitive input")
    val cin = codec.createInputStream(new java.io.ByteArrayInputStream(bo.toByteArray))
    assert(cin.readAllBytes().sameElements(payload), "frame did not round-trip")
  }

  test("MapFile export is key-sorted per file, range-ordered across files, and seekable") {
    import org.apache.hadoop.fs.Path
    import org.apache.hadoop.io.{LongWritable, MapFile, Text}
    import spark.implicits._
    val viaMapfile = Sources.src_mapfile_agg(spark, sf0001).collect()
    val direct = Tables.part(spark, sf0001)
      .groupBy($"p_type")
      .agg(count(lit(1)).as("n_parts"),
        sum(round($"p_retailprice" * 100).cast("long")).as("retail_cents"))
      .orderBy($"p_type")
      .collect()
    assert(viaMapfile.nonEmpty)
    assert(viaMapfile.toSeq == direct.toSeq)
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_mapfile_"))
    assert(dir.nonEmpty)
    val parts = dir.head.listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(parts.length > 1, "expected multiple MapFiles (one per range partition)")
    // each part is a MapFile DIRECTORY: data + index
    parts.foreach { p =>
      assert(p.isDirectory && new java.io.File(p, "data").exists() &&
        new java.io.File(p, "index").exists(),
        s"${p.getName} is not a MapFile directory")
    }
    val conf = spark.sparkContext.hadoopConfiguration
    // keys ascending within each file, ranges non-overlapping across
    // the sorted part list (the MapFileOutputFormat total-order shape)
    var prevMax = Long.MinValue
    val allKeys = parts.flatMap { p =>
      val keys = spark.sparkContext
        .sequenceFile[Long, String](new java.io.File(p, "data").getPath)
        .map(_._1).collect().toSeq
      assert(keys == keys.sorted, s"${p.getName} keys not ascending")
      assert(keys.head > prevMax,
        s"${p.getName} range overlaps the previous file")
      prevMax = keys.last
      keys
    }
    // the index half: a point lookup through MapFile.Reader must find
    // a key via the sparse index (the format's reason to exist); the
    // probe's owning part is unknown, so try each in turn
    val probe = allKeys(allKeys.length / 2)
    val hit = parts.exists { p =>
      val r = new MapFile.Reader(new Path(p.getPath), conf)
      try r.get(new LongWritable(probe), new Text()) != null finally r.close()
    }
    assert(hit, s"MapFile.Reader.get($probe) found nothing in any part")
  }

  test("BloomMapFile blooms have no false negatives and actually reject absent keys") {
    import org.apache.hadoop.fs.Path
    import org.apache.hadoop.io.{BloomMapFile, LongWritable, Text}
    import spark.implicits._
    val via = Sources.src_bloommapfile_agg(spark, sf0001).collect()
    val direct = Tables.orders(spark, sf0001)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        sum(round($"o_totalprice" * 100).cast("long")).as("totalprice_cents"))
      .orderBy($"o_orderstatus")
      .collect()
    assert(via.nonEmpty)
    assert(via.toSeq == direct.toSeq)
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_bloommapfile_"))
    assert(dir.nonEmpty)
    val parts = dir.head.listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(parts.nonEmpty)
    parts.foreach { p =>
      assert(new java.io.File(p, "bloom").exists(), s"${p.getName} has no bloom file")
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val keys = Tables.orders(spark, sf0001)
      .select($"o_orderkey").as[Long].collect().toSeq
    val readers = parts.map(p => new BloomMapFile.Reader(new Path(p.getPath), conf))
    try {
      // no false negatives: every present key must pass SOME part's bloom
      val sample = keys.sorted.take(200)
      sample.foreach { k =>
        assert(readers.exists(_.probablyHasKey(new LongWritable(k))),
          s"present key $k rejected by every bloom (false negative)")
      }
      // the filter filters: far-absent keys must be rejected by (nearly)
      // all blooms — with the default 0.5% error rate, expect overwhelming
      // rejection over 200 probes x |parts| blooms
      val absent = (1000000L to 1000199L)
      val falsePos = absent.count(k =>
        readers.exists(_.probablyHasKey(new LongWritable(k))))
      assert(falsePos < 20,
        s"$falsePos/200 absent keys passed a bloom — filter not filtering")
    } finally readers.foreach(_.close())
  }

  test("bzip2 text export round-trips AND one .bz2 file splits across tasks") {
    import spark.implicits._
    val viaBz2 = Sources.src_text_bz2_agg(spark, sf0001).collect()
    val direct = Tables.documents(spark, sf0001)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
      .orderBy($"lang")
      .collect()
    assert(viaBz2.nonEmpty)
    assert(viaBz2.toSeq == direct.toSeq)
    // the export coalesced to ONE .bz2 part — the exact layout that
    // serializes a gzip scan
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_textbz2_"))
    assert(dir.nonEmpty)
    val parts = dir.head.listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length == 1 && parts.head.getName.endsWith(".bz2"),
      s"expected exactly one .bz2 part, got: ${parts.map(_.getName).mkString(", ")}")
    // splittability: under a small maxPartitionBytes the SINGLE file
    // must still fan out into multiple scan tasks (BZip2Codec is a
    // SplittableCompressionCodec; gzip here would plan 1 partition)
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val nSplits = spark.read.text(dir.head.getPath).rdd.getNumPartitions
      assert(nSplits > 1,
        s"single .bz2 file planned $nSplits scan partition(s) — codec not splitting")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", before)
      spark.conf.unset("spark.sql.files.openCostInBytes")
    }
  }

  test("src_schema_evolution: mergeSchema surfaces NULL priority for pre-migration files only") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // run the query once so the generations exist
    val agg = Sources.src_schema_evolution(spark, sf0001).collect()
    assert(agg.nonEmpty && agg.exists(_.getString(0) == "LEGACY"))
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"))
      .listFiles().filter(_.getName.startsWith("graft_schemaevo_")).head
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"${dir.getPath}/gen1", s"${dir.getPath}/gen2")
    // union schema: the evolved column exists, and is null EXACTLY on
    // the pre-migration (even-key) generation
    assert(merged.columns.contains("o_orderpriority"))
    assert(merged.filter($"o_orderpriority".isNull &&
      $"o_orderkey" % 2 === 1).count() == 0)
    assert(merged.filter($"o_orderpriority".isNotNull &&
      $"o_orderkey" % 2 === 0).count() == 0)
    assert(merged.filter($"o_orderpriority".isNull).count() > 0)
    // value-invisibility: merged totals equal the direct parquet read
    val direct = Tables.orders(spark, sf0001)
      .agg(count(lit(1)), sum(expr("bigint(floor(o_totalprice * 100 + 0.5))")))
      .collect()(0)
    val viaMerge = merged.agg(count(lit(1)), sum($"total_centi")).collect()(0)
    assert(viaMerge == direct)
  }

  test("src_csv_permissive: corrupt rows are counted not dropped, and only the bad column nulls") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = Sources.src_csv_permissive(spark, sf0001).collect()
      .map(r => r.getInt(0).toLong -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val sup = Tables.supplier(spark, sf0001)
      .selectExpr("bigint(s_nationkey) as s_nationkey", "s_suppkey % 7 = 0 as bad",
        "bigint(round(s_acctbal * 100)) as cents").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    // premise: the corruption actually planted something
    assert(sup.exists(_._2), "premise: no suppkey % 7 == 0 rows at sf0.001")
    sup.groupBy(_._1).foreach { case (nk, rows) =>
      val (n, corrupt, cents) = got(nk)
      // nothing dropped: PERMISSIVE keeps every line as a row
      assert(n == rows.size.toLong, s"nation $nk lost rows")
      // corrupt count = planted count (the grouping key still parsed)
      assert(corrupt == rows.count(_._2).toLong, s"nation $nk corrupt count")
      // cents only over the rows whose amount survived
      assert(cents == rows.filterNot(_._2).map(_._3).sum, s"nation $nk cents")
    }
  }

  test("src_kvtext_agg: KeyValueText splits at the FIRST tab only; inner tab survives in the value") {
    import spark.implicits._
    import org.apache.hadoop.io.Text
    import org.apache.hadoop.mapreduce.lib.input.KeyValueTextInputFormat
    // materialize the export (memoized), then look at the raw (k, v)
    // boundary the input format actually produced
    Sources.src_kvtext_agg(spark, sf0001).collect()
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_kvtext_" + java.security.MessageDigest.getInstance("SHA-256")
        .digest(sf0001.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString)
    val kv = spark.sparkContext.newAPIHadoopFile(dir.getPath,
        classOf[KeyValueTextInputFormat], classOf[Text], classOf[Text],
        spark.sparkContext.hadoopConfiguration)
      .map { case (k, v) => (k.toString, v.toString) }.collect()
    assert(kv.nonEmpty)
    // every value kept its INNER tab (status<TAB>price) — the
    // first-separator contract, not a split-on-every-tab
    assert(kv.forall(_._2.count(_ == '\t') == 1),
      s"expected exactly one inner tab per value, sample: ${kv.take(3).mkString}")
    val expected = Tables.orders(spark, sf0001)
      .select($"o_orderkey".cast("string"), concat_ws("\t", $"o_orderstatus", $"o_totalprice"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kv.toSet == expected, "KeyValueText (k, v) boundary mismatch")
  }

  test("src_nline_agg: NLine splits carry exactly N lines — tasks = ceil(lines/N) from ONE file") {
    Sources.src_nline_agg(spark, sf0001).collect()
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_nline_" + java.security.MessageDigest.getInstance("SHA-256")
        .digest(sf0001.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString)
    val nFiles = dir.listFiles().count(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".txt"))
    assert(nFiles == 1, s"premise: the export must coalesce to ONE file, got $nFiles")
    val lines = Sources.nlineLines(spark, dir.getPath, 4)
    val n = lines.count()
    assert(n >= 8, s"premise: need several splits' worth of lines, got $n")
    // the record-granular posture: one tiny file fans out into
    // ceil(lines/N) tasks (the inverse of src_small_files_scan)
    assert(lines.rdd.getNumPartitions == ((n + 3) / 4).toInt,
      s"expected ceil($n/4) partitions, got ${lines.rdd.getNumPartitions}")
    assert(Sources.nlineLines(spark, dir.getPath, 2).rdd.getNumPartitions
      == ((n + 1) / 2).toInt, "linespermap=2 arithmetic")
    // and no line lost or duplicated across split boundaries
    assert(lines.distinct().count() == n)
  }

  test("src_small_files_scan: tuned scan packs many files per task; defaults don't; rows identical") {
    // Materialize the 256-small-file layout (setup is memoized).
    val viaTuned = Sources.src_small_files_scan(spark, sf0001).collect()
    val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
      "graft_smallfiles_" + java.security.MessageDigest.getInstance("SHA-256")
        .digest(sf0001.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString)
    val nFiles = dir.listFiles().count(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(nFiles >= 128, s"premise: expected a many-small-files layout, got $nFiles")

    val tuned = Sources.coalescedScanSession(spark)
    val tunedTasks = tuned.read.parquet(dir.getPath).rdd.getNumPartitions
    val defaultTasks = spark.read.parquet(dir.getPath).rdd.getNumPartitions
    // the posture: task count tracks bytes, not file count
    assert(tunedTasks <= nFiles / 8,
      s"coalesced scan should pack >=8 files/task: $tunedTasks tasks for $nFiles files")
    // and the tuning is what did it — at KB scale the default openCost
    // (4 MB >= every file's packing cost) degrades to ~1 file per task
    assert(defaultTasks >= tunedTasks * 4,
      s"expected defaults to under-pack at KB scale: default=$defaultTasks tuned=$tunedTasks")
    // coalescing must not change results
    val viaDefault = Sources.smallFilesAgg(spark, dir.getPath).collect()
    assert(viaTuned.map(_.toString).toSeq == viaDefault.map(_.toString).toSeq)
    assert(viaTuned.nonEmpty)
  }
}
