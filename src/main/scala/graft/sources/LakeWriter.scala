package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partitioned lake writes (SURVEY §2.A8).
  *
  * The reference writes one S3 object per entity per week
  * (includes.py:79-89 `ply_data_gw/{id}.json`) — a million tiny
  * objects at scale. Lake-first layout instead: parquet partitioned by
  * a low-cardinality derived key (period), each partition holding few,
  * large, splittable files. Readers prune partitions from the path
  * alone; writers control file count via a pre-write repartition on
  * the partition key (avoiding the many-small-files failure mode of
  * one file per task per partition).
  */
object LakeWriter {

  /** Write `df` partitioned by a derived period column.
    *
    * @param filesPerPartition target file count per partition dir —
    *        repartition(partitionCols) before write makes each task own
    *        whole partitions, so task count per dir is bounded.
    */
  def writeByPeriod(df: DataFrame, tsCol: String, path: String,
                    filesPerPartition: Int = 1): DataFrame = {
    val withPeriod = df.withColumn("period",
      date_format(col(tsCol), "yyyy-MM"))
    withPeriod
      .repartition(col("period"),
        pmod(spark_partition_id(), lit(filesPerPartition)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("period")
      .parquet(path)
    withPeriod
  }

  /** Idempotent merge-write: union the incoming batch into an existing
    * lake table keyed by `keys`, batch winning on collision — the
    * reference's ON CONFLICT upsert as a lake rewrite. (A table format
    * with MERGE — Delta/Iceberg — replaces the rewrite at production
    * scale; the dedup semantics are [[graft.operators.Upsert.merge]]
    * either way.)
    */
  def upsertWrite(existingPath: String, batch: DataFrame,
                  keys: Seq[String], outPath: String): Unit = {
    val spark = batch.sparkSession
    val merged = scala.util.Try(spark.read.parquet(existingPath)).toOption match {
      case Some(base) => graft.operators.Upsert.merge(base, batch, keys)
      case None => batch
    }
    merged.write.mode(SaveMode.Overwrite).parquet(outPath)
  }
}
