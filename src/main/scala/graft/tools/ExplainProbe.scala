package graft.tools

import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted plans for the round-11 additions. */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    println("=== paragraph_dedup ===")
    graft.queries.TextQueries.paragraphDedup(spark, dir).explain("formatted")
    println("=== token_budget_select ===")
    graft.queries.TextQueries.tokenBudgetSelect(spark, dir).explain("formatted")
    println("=== corpus_diff ===")
    graft.queries.ExtendedQueries.corpusDiff(spark, dir).explain("formatted")
    println("=== fellegi_sunter_linkage ===")
    graft.queries.WarehouseQueries.fellegiSunterLinkage(spark, dir)
      .explain("formatted")
    println("=== assoc_cramers_v ===")
    graft.queries.TextQueries.langSourceCramersV(spark, dir)
      .explain("formatted")
    println("=== ab_anderson_darling ===")
    graft.queries.WarehouseQueries.andersonDarling(spark, dir)
      .explain("formatted")
    spark.stop()
  }
}
