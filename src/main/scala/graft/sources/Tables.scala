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
  /** The events table has shipped with two timestamp encodings: a
    * nanosecond parquet timestamp (which Spark's vectorized reader
    * rejects — PARQUET_TYPE_ILLEGAL — so it is read as a long via the
    * legacy conf and rebuilt as a µs timestamp, the same ns→µs
    * truncation DuckDB applies on read) and a plain µs timestamp that
    * needs no rewrite. Detect which one this directory carries from
    * the loaded schema and adapt, so both generations of testdata read
    * identically.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case _ =>
        // µs parquet timestamps surface as TIMESTAMP_NTZ; cast to the
        // session-UTC TIMESTAMP so downstream plans (watermarks need
        // LTZ) and outputs match the ns-era loader bit-for-bit.
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
