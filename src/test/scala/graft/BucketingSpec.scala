package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Bucketed-table co-location (SURVEY §4): persisting both sides
  * bucketed on the join key lets Spark plan the join with ZERO
  * exchanges — the pre-shuffle that makes repeated fact-fact joins
  * affordable at 100 TB.
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("join of co-bucketed tables plans without any Exchange") {
    // warehouse dir is a static conf — tables land in ./spark-warehouse
    // (gitignored); managed-table DROP removes the data in finally
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bkt")
    spark.sql("USE graft_bkt")
    try {
      Tables.orders(spark, sfDir)
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_bkt")
      Tables.lineitem(spark, sfDir)
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("lineitem_bkt")

      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"), Seq("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges == 0,
        s"co-bucketed join should shuffle nothing, found $exchanges exchanges:\n$p")

      // same join on raw parquet DOES shuffle — the bucketing is what
      // removed it, not plan size
      val raw = Tables.lineitem(spark, sfDir)
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(Tables.orders(spark, sfDir), Seq("o_orderkey"))
        .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")))
      raw.collect()
      val rawPlan = raw.queryExecution.executedPlan.toString
      assert(rawPlan.contains("Exchange hashpartitioning")
        || rawPlan.contains("BroadcastExchange"),
        s"control join unexpectedly shuffle-free:\n$rawPlan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("USE default")
    }
  }
}
