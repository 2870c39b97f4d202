package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Num._
import graft.operators.{Funnel, Profile, Scd2, TextRank}
import graft.sources.{BucketedLake, Tables}

/** Round-5 warehouse + retrieval surface (SURVEY §2: C20-C22, A11, D31).
  *
  * Each query is the oracled face of one operator; scale notes live on
  * the operators themselves.
  */
object WarehouseQueries {

  /** C20: SCD Type-2 history over the order change-log — each
    * customer's priority timeline as half-open validity intervals.
    * One shuffle on the business key (see [[graft.operators.Scd2]]).
    */
  def scd2History(spark: SparkSession, dir: String): DataFrame =
    Scd2.history(Tables.orders(spark, dir),
        keys = Seq("o_custkey"), attrs = Seq("o_orderpriority"),
        orderCol = "o_orderdate", tiebreak = "o_orderkey")
      .orderBy(col("o_custkey"), col("valid_from"), col("o_orderpriority"))

  /** C21: ordered funnel — view → click → purchase per user, each step
    * within 4h of the previous step's first completion. ONE shuffle for
    * the whole funnel (see [[graft.operators.Funnel]]).
    */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame =
    Funnel.steps(Tables.events(spark, dir),
      user = "user_id", typeCol = "event_type", ts = "ts",
      tiebreak = "event_id", stages = Seq("view", "click", "purchase"),
      maxGap = Some(expr("INTERVAL 4 HOURS")))

  /** A11: exchange-free fact⋈fact join via bucketed lake tables. Both
    * tables are written bucketed+sorted on the join key, then joined
    * and aggregated on it — no shuffle in the whole read plan
    * (PlanSpec pins it; see [[graft.sources.BucketedLake]]).
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val sfName = new java.io.File(dir).getName
    val base = s"/tmp/graft_bucketed/$sfName"
    BucketedLake.writeBucketed(Tables.orders(spark, dir),
      "graft_orders_b", s"$base/orders", "o_orderkey", 8)
    BucketedLake.writeBucketed(Tables.lineitem(spark, dir),
      "graft_lineitem_b", s"$base/lineitem", "l_orderkey", 8)
    val one = lit(1).cast("decimal(18,2)")
    spark.table("graft_lineitem_b")
      .join(spark.table("graft_orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderkey"))
  }

  /** C22: one-pass table profile (rows/nulls/distincts/bounds per
    * column) over the customer dim (see [[graft.operators.Profile]]).
    */
  def tableProfile(spark: SparkSession, dir: String): DataFrame =
    Profile.profile(Tables.customer(spark, dir), ProfileCols)

  val ProfileCols: Seq[String] =
    Seq("c_acctbal", "c_custkey", "c_mktsegment", "c_name", "c_nationkey")

  /** D31: BM25 keyword retrieval over the corpus — top-50 for a fixed
    * conjunction of index-shaped terms; zero corpus shuffle (see
    * [[graft.operators.TextRank]]).
    */
  def bm25Search(spark: SparkSession, dir: String): DataFrame =
    TextRank.bm25TopK(Tables.documents(spark, dir),
      idCol = "doc_id", textCol = "text",
      terms = Bm25Terms, k = 50)

  val Bm25Terms: Seq[String] = Seq("hash", "join", "vector", "stream")
}
