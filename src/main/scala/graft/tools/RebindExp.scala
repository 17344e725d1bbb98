package graft.tools

import org.apache.spark.sql.SparkSession

/** r20 scratch: why does Rebind.preserving see UnknownPartitioning on a
  * materialized cache? Prints the executedPlan class + partitioning at
  * each layer. Dev-only. */
object RebindExp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = spark.range(0L, 1000L).selectExpr("id % 37 AS k", "id AS v")
      .repartition($"k")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count()
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val ep = ds.queryExecution.executedPlan
    println(s"executedPlan class: ${ep.getClass.getName}")
    println(s"executedPlan partitioning: ${ep.outputPartitioning}")
    println(s"executedPlan:\n${ep.treeString}")
    ep.collectLeaves().foreach { l =>
      println(s"leaf ${l.getClass.getSimpleName}: ${l.outputPartitioning}")
    }
    ep.foreach {
      case imts: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        println(s"IMTS cachedPlan class: ${imts.relation.cachedPlan.getClass.getName}")
        println(s"IMTS cachedPlan partitioning: ${imts.relation.cachedPlan.outputPartitioning}")
      case _ =>
    }
    val rb = org.apache.spark.sql.graft.Rebind.preserving(df)
    println(rb.groupBy($"k").count().queryExecution.executedPlan.treeString)
    // the LPA state shape: distinct + withColumn, cached, rebound, aliased join
    val adj = spark.range(0L, 5000L).selectExpr("id % 97 AS node", "(id * 7) % 97 AS nbr")
      .repartition($"nbr").sortWithinPartitions($"nbr")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    adj.count()
    val lc = adj.select($"node").distinct().withColumn("label", $"node")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lc.count()
    val lds = lc.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val ep2 = lds.queryExecution.executedPlan
    println(s"label executedPlan class: ${ep2.getClass.getName}")
    val inner = ep2 match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    println(s"label inner class: ${inner.getClass.getName}")
    println(s"label inner partitioning: ${inner.outputPartitioning}")
    println(s"label inner output: ${inner.output}")
    println(s"label analyzed output: ${lds.queryExecution.analyzed.output}")
    val labels = org.apache.spark.sql.graft.Rebind.preserving(lc)
    val votes = adj.join(labels.select($"node".as("nbr"), $"label"), "nbr")
      .groupBy($"node", $"label").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
    println(votes.queryExecution.executedPlan.treeString)
    spark.stop()
  }
}
