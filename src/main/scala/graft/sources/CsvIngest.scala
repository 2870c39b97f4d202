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
