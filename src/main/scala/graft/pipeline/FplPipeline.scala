package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Upsert
import graft.sources.JsonIngest

/** The reference's whole DAG as one composable batch pipeline
  * (fpl-data-pipeline pull_fpl_data_s3_postgre.py: create_db →
  * get_id → pull_to_s3 → team/player/week/stats/week_info inserts).
  *
  * Airflow tasks become lake stages; task ordering becomes data
  * dependencies; per-row Postgres upserts become [[Upsert.merge]]
  * rewrites; the conditional skip flags (`data_flow`) become plain
  * parameters. Each stage is idempotent — re-running the pipeline
  * converges, like the reference's ON CONFLICT inserts.
  */
object FplPipeline {

  case class LakePaths(root: String) {
    val entityDim = s"$root/entity_dim"
    val parentDim = s"$root/parent_dim"
    val periodDim = s"$root/period_dim"
  }

  /** Lake layout: each dim is hash-partitioned on its merge key into
    * this many directories (`__p=<n>/`). A merge then only reads and
    * rewrites the partitions containing batch keys — at 100 TB a batch
    * touching a handful of keys rewrites a handful of partitions, not
    * the table. (With Delta/Iceberg jars this would be a MERGE INTO
    * with file-level pruning; hash-partition overwrite is the plain-
    * parquet equivalent.)
    */
  val NumPartitions = 16

  /** One pipeline run: ingest a payload, merge each dim into the lake,
    * return the refreshed dims. `insertEntities`/`insertParents`/
    * `insertPeriods` mirror the reference's skip flags.
    */
  def run(spark: SparkSession, payloadPath: String, lake: LakePaths,
          insertEntities: Boolean = true, insertParents: Boolean = true,
          insertPeriods: Boolean = true): Map[String, DataFrame] = {
    val payload = JsonIngest.readPayload(spark, payloadPath)

    def mergeInto(path: String, batch: DataFrame, keys: Seq[String]): DataFrame = {
      val batchP = batch.withColumn("__p",
        pmod(hash(keys.map(col): _*), lit(NumPartitions)))
      val merged = scala.util.Try(spark.read.parquet(path)).toOption match {
        case Some(base) =>
          // only the partitions containing batch keys participate: the
          // filter prunes at the directory level, and dynamic overwrite
          // below replaces exactly those partitions' files.
          val affected = batchP.select(col("__p")).distinct()
            .collect().map(_.getInt(0)).toSeq
          Upsert.merge(base.filter(col("__p").isin(affected: _*)), batchP, keys)
        case None => batchP
      }
      // localCheckpoint severs the file lineage so overwriting the path
      // we just read is legal without a staging copy.
      merged.localCheckpoint()
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__p")
        .parquet(path)
      spark.read.parquet(path).drop("__p")
    }

    val out = scala.collection.mutable.Map[String, DataFrame]()
    if (insertParents)
      out("parent_dim") = mergeInto(lake.parentDim, JsonIngest.parentDim(payload), Seq("id"))
    if (insertEntities)
      out("entity_dim") = mergeInto(lake.entityDim, JsonIngest.entityDim(payload), Seq("id"))
    if (insertPeriods)
      out("period_dim") = mergeInto(lake.periodDim, JsonIngest.periodDim(payload), Seq("id"))
    out.toMap
  }

  /** The reference's data tests (test_includes.py): point lookup must
    * hit, and every fact row must join to its dim.
    */
  def qualityChecks(entityDim: DataFrame, parentDim: DataFrame): Map[String, Long] = {
    val orphans = entityDim.join(parentDim,
        entityDim("team_id") === parentDim("id"), "left_anti").count()
    Map(
      "entity_rows" -> entityDim.count(),
      "entities_without_parent" -> orphans)
  }
}
