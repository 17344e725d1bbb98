package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed loaders for the driver-generated testdata tables
  * (TESTDATA.md). One place for read options so every operator reads
  * identically; parquet scans get Catalyst pushdown/pruning for free.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet has shipped with two on-disk `ts` encodings across
    * driver testdata generations, so the loader adapts to the schema it
    * actually reads rather than assuming either:
    *
    *  - TIMESTAMP(NANOS): Spark's vectorized parquet reader rejects it
    *    outright ([PARQUET_TYPE_ILLEGAL] — this silently killed every
    *    ev_*, fs_hot_keys and mr_secondarysort query in round 1). With
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set at session
    *    BUILD time by every graft entry point) the column surfaces as
    *    LongType nanos; we convert to a microsecond timestamp — the
    *    generator emits micro-precision values so the truncation is
    *    lossless (verified: all ns % 1000 == 0). A session without the
    *    flag fails loudly with the conf named in the error below.
    *
    *  - timestamp[us] (current generation): surfaces as TIMESTAMP_NTZ.
    *    Cast to the session-timezone TimestampType so downstream
    *    `window()` / date functions and the correctness schema check
    *    behave identically to the nanos path (session tz is UTC, so
    *    the cast shifts no values).
    *
    * Every downstream consumer sees the same `ts: timestamp` column
    * either way. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
          "reading events.parquet (TIMESTAMP(NANOS)) requires " +
            "spark.sql.legacy.parquet.nanosAsLong=true set when the SparkSession is built")
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType | TimestampType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.parquet ts column has unsupported type $other; expected " +
            "LongType (legacy nanosAsLong), TIMESTAMP_NTZ or TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Exact row count of a testdata table from parquet FOOTER metadata
    * only — zero Spark jobs, zero data pages read. `df.count()` runs a
    * distributed aggregate that opens every row group; the ANN
    * training paths only need the corpus size to pick a sampling
    * modulus, and at 100 TB a full count scan per query for that is
    * wasted work. Footers carry the per-block row counts, so the
    * driver reads O(files) footers instead. Handles both a single
    * .parquet file (the testdata layout) and a directory of part
    * files (skipping _SUCCESS/. markers). */
  def parquetRowCount(s: SparkSession, d: String, name: String): Long = {
    import org.apache.hadoop.fs.{FileStatus, Path}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = s.sparkContext.hadoopConfiguration
    val root = new Path(s"$d/$name.parquet")
    val fs = root.getFileSystem(conf)
    def dataFiles(st: FileStatus): Seq[FileStatus] =
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filterNot(c => c.getPath.getName.startsWith("_") ||
            c.getPath.getName.startsWith("."))
          .flatMap(dataFiles)
      else Seq(st)
    dataFiles(fs.getFileStatus(root)).map { f =>
      val r = ParquetFileReader.open(HadoopInputFile.fromStatus(f, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }
}
