package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev experiment (not library surface): A/B the sql_graph_triangles
  * e0 derivation — os self-join (pre-r19) vs per-order array pairs —
  * inside one JVM, plus ReusedExchange counts for each executed plan. */
object SqlTriExp {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    graft.Tables.lineitem(spark, d).createOrReplaceTempView("lineitem")

    val tail =
      """deg AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
        |  GROUP BY 1),
        |ed AS (
        |  SELECT
        |    CASE WHEN struct(du.deg, e0.u) < struct(dv.deg, e0.v)
        |         THEN e0.u ELSE e0.v END AS src,
        |    CASE WHEN struct(du.deg, e0.u) < struct(dv.deg, e0.v)
        |         THEN e0.v ELSE e0.u END AS dst,
        |    CASE WHEN struct(du.deg, e0.u) < struct(dv.deg, e0.v)
        |         THEN dv.deg ELSE du.deg END AS ddeg
        |  FROM e0
        |  JOIN deg du ON e0.u = du.node
        |  JOIN deg dv ON e0.v = dv.node),
        |wedges AS (
        |  SELECT /*+ SHUFFLE_HASH(e1) */ e1.src AS a, e1.dst AS x, e2.dst AS y
        |  FROM ed e1 JOIN ed e2
        |    ON e1.src = e2.src
        |    AND struct(e1.ddeg, e1.dst) < struct(e2.ddeg, e2.dst)),
        |tri AS (
        |  SELECT /*+ SHUFFLE_HASH(e) */ w.a, w.x, w.y
        |  FROM wedges w JOIN ed e ON w.x = e.src AND w.y = e.dst)
        |SELECT node AS s_suppkey, CAST(count(*) AS BIGINT) AS n_triangles
        |FROM tri LATERAL VIEW explode(array(a, x, y)) t AS node
        |GROUP BY 1 ORDER BY 1""".stripMargin

    val qOld =
      """WITH os AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
        |e0 AS (
        |  SELECT a.sk AS u, b.sk AS v
        |  FROM os a JOIN os b ON a.ok = b.ok AND a.sk < b.sk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |""".stripMargin + tail

    val qNew =
      """WITH os AS (
        |  SELECT sort_array(collect_set(l_suppkey)) AS ss
        |  FROM lineitem GROUP BY l_orderkey),
        |e0 AS (
        |  SELECT p.u, p.v
        |  FROM os LATERAL VIEW explode(flatten(transform(ss, (x, i) ->
        |    transform(slice(ss, i + 2, size(ss)),
        |      y -> struct(x AS u, y AS v))))) t AS p
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |""".stripMargin + tail

    def time(label: String, q: String): Unit = {
      val t0 = System.nanoTime()
      spark.sql(q).write.format("noop").mode("overwrite").save()
      println(f"[exp] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val a = spark.sql(qOld).collect().map(_.toSeq).toSeq
    val b = spark.sql(qNew).collect().map(_.toSeq).toSeq
    println(s"[exp] new == old: ${a == b}")
    for (i <- 1 to 3) { time(s"old$i", qOld); time(s"new$i", qNew) }
    spark.stop()
  }
}
