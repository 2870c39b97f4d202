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

  /** Compact a parquet directory's small files: rewrite with a file
    * count sized from the actual bytes on disk (targetFileBytes per
    * output file) — the lake-maintenance pass that undoes the
    * many-small-files accumulation of incremental writes. Contents are
    * unchanged; readers see the same rows from fewer, larger,
    * splittable files. (Table formats run this as OPTIMIZE; this is
    * the plain-parquet equivalent, staged through a temp dir so the
    * read never streams into an overwrite of its own input.)
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(path)
    val bytes = fs.getContentSummary(dir).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact")
    spark.read.parquet(path)
      .repartition(nFiles.toInt)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(dir, true)
    fs.rename(tmp, dir)
    nFiles
  }

  /** Schema-evolution read: parquet files written at different schema
    * versions (columns added over time) read as one table, old files'
    * missing columns null-filled — `mergeSchema` does the reconcile at
    * footer-read time, no rewrite of historical data.
    */
  def readEvolved(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
