package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the lake tables (one parquet per table under a
  * scale-factor directory).
  *
  * Mirrors the reference's star schema surface (fpl-data-pipeline
  * sql_queries.py:3-26 creates `team_dm`/`player_dm`/`player_week_ft`;
  * here the dims/facts are the TPC-H-ish testdata tables). Schema is
  * carried by parquet footers — no schema inference pass, and column
  * pruning / predicate pushdown reach the scan because loads stay
  * declarative.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  /** The events table carries a nanosecond parquet timestamp, which
    * Spark's vectorized reader rejects (PARQUET_TYPE_ILLEGAL). Read it
    * as a long (legacy conf) and rebuild the µs timestamp — lossless
    * here, and the same ns→µs truncation DuckDB applies on read.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
