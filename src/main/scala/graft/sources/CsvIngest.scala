package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CSV ingest (SURVEY §2.A4).
  *
  * The reference reads scraped match-stats CSVs from S3 row-at-a-time
  * through csv.reader and inserts per row (fpl-data-pipeline
  * includes.py:355-394). Spark-first: a schema'd `spark.read.csv` —
  * explicit schema (no inference pass over 100 TB), malformed rows
  * quarantined to a corrupt-record column instead of failing the job.
  */
object CsvIngest {

  /** Schema of the reference's scraped stats rows
    * (player_stats_dm analog: sql_queries.py:200-205).
    */
  val statsSchema: StructType = StructType(Seq(
    StructField("row_idx", LongType),
    StructField("id", LongType),
    StructField("full_name", StringType),
    StructField("min_played", IntegerType),
    StructField("key_passes", IntegerType),
    StructField("assists", IntegerType),
    StructField("shots", IntegerType),
    StructField("xg", DoubleType),
    StructField("xa", DoubleType),
    StructField("match_id", LongType),
    StructField("_corrupt", StringType)))

  def readStats(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(statsSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  /** Derive a deterministic scraped-stats CSV from the lake's customer
    * table — the sandbox stand-in for the reference's S3 match-stats
    * files (includes.py:355-394). Every 50th key gets a non-numeric
    * `min_played` so the quarantine path is exercised end-to-end.
    * Single file (`coalesce(1)`) so the dump is byte-deterministic for
    * the DuckDB oracle reading the same path.
    */
  def writeSampleCsv(spark: SparkSession, lakeDir: String, outPath: String): Unit = {
    import org.apache.spark.sql.functions._
    val k = col("c_custkey")
    spark.read.parquet(s"$lakeDir/customer.parquet")
      .select(
        k.as("row_idx"),
        k.as("id"),
        col("c_name").as("full_name"),
        when(k % 50 === 0, lit("not_a_number"))
          .otherwise((k % 97).cast("string")).as("min_played"),
        (k % 7).cast("string").as("key_passes"),
        (k % 5).cast("string").as("assists"),
        (k % 11).cast("string").as("shots"),
        ((k % 400).cast("double") / 100.0).cast("decimal(4,2)")
          .cast("string").as("xg"),
        ((k % 250).cast("double") / 100.0).cast("decimal(4,2)")
          .cast("string").as("xa"),
        (k % 20).as("match_id"))
      .orderBy(col("row_idx"))
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(outPath)
  }

  /** Valid rows only. NOTE: the corrupt-record column is projection-
    * dependent (a row is "corrupt" only w.r.t. the columns actually
    * parsed after pruning), so the stable validity predicate is
    * non-null required fields — those force themselves into the scan.
    */
  def validStats(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    readStats(spark, path)
      .filter(col("id").isNotNull && col("match_id").isNotNull
        && col("min_played").isNotNull && col("xg").isNotNull
        && col("xa").isNotNull)
      .drop("_corrupt")
  }
}
