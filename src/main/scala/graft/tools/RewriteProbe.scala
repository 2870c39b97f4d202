package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: inspect the logical plans the TopKRewrite rule sees. */
object RewriteProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.TopKRewrite
    val df = graft.queries.RelationalQueries.topkPerGroup(
      spark, "/root/testdata/sf0.001")
    println("=== analyzed ===")
    println(df.queryExecution.analyzed.treeString)
    println("=== optimized ===")
    println(df.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
