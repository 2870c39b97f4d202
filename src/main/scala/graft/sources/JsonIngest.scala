package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON ingest + normalization (SURVEY §2.A2).
  *
  * The reference pulls a nested API payload and normalizes it row-at-a-
  * time with pandas json_normalize before inserting into Postgres
  * (fpl-data-pipeline includes.py:112-145: `elements` → player_dm,
  * includes.py:228-259: `teams` → team_dm, includes.py:397-423:
  * `events` → week_info_dm). Spark-first: one schema-on-read pass,
  * `explode` of the nested arrays, column projection + the categorical
  * mapping — all declarative, so at 100 TB of JSON the scan
  * parallelizes per file split and nothing touches the driver.
  */
object JsonIngest {

  /** Payload shape of the reference's bootstrap-static JSON: three
    * nested entity arrays in one document.
    */
  val payloadSchema: StructType = StructType(Seq(
    StructField("elements", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("first_name", StringType),
      StructField("second_name", StringType),
      StructField("form", DoubleType),
      StructField("total_points", LongType),
      StructField("now_cost", DoubleType),
      StructField("team", LongType),
      StructField("element_type", IntegerType))))),
    StructField("teams", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("short_name", StringType),
      StructField("strength_attack_home", IntegerType),
      StructField("strength_defence_home", IntegerType),
      StructField("strength_attack_away", IntegerType),
      StructField("strength_defence_away", IntegerType),
      StructField("code", LongType))))),
    StructField("events", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("average_entry_score", IntegerType),
      StructField("finished", BooleanType),
      StructField("data_checked", BooleanType)))))))

  /** The reference's element_type → position dictionary
    * (includes.py:36) as a codegen'd when-chain.
    */
  def positionLabel(elementType: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(elementType === 1, "gk")
      .when(elementType === 2, "def")
      .when(elementType === 3, "mid")
      .when(elementType === 4, "fwd")

  def readPayload(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(payloadSchema).json(path)

  /** `elements` → entity dim (player_dm analog): explode + project +
    * categorical mapping. One narrow pass.
    */
  def entityDim(payload: DataFrame): DataFrame =
    payload.select(explode(col("elements")).as("e"))
      .select(
        col("e.id").as("id"),
        col("e.first_name").as("name"),
        col("e.second_name").as("surname"),
        col("e.form").as("form"),
        col("e.total_points").as("total_points"),
        col("e.now_cost").as("now_costs"),
        col("e.team").as("team_id"),
        positionLabel(col("e.element_type")).as("position"))

  /** `teams` → parent dim (team_dm analog). */
  def parentDim(payload: DataFrame): DataFrame =
    payload.select(explode(col("teams")).as("t"))
      .select(
        col("t.id").as("id"),
        col("t.name").as("name"),
        col("t.short_name").as("short_name"),
        col("t.strength_attack_home").as("strength_att_home"),
        col("t.strength_defence_home").as("strength_def_home"),
        col("t.strength_attack_away").as("strength_att_away"),
        col("t.strength_defence_away").as("strength_def_away"),
        col("t.code").as("code"))

  /** `events` → period dim (week_info_dm analog). */
  def periodDim(payload: DataFrame): DataFrame =
    payload.select(explode(col("events")).as("w"))
      .select(
        col("w.id").as("id"),
        col("w.name").as("name"),
        col("w.average_entry_score").as("avg_score"),
        col("w.finished").as("finished"),
        col("w.data_checked").as("data_checked"))
}
