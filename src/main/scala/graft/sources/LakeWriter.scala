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
    * many-small-files accumulation of incremental writes. Contents and
    * layout are unchanged: a `partitionBy` table (children named
    * `col=value`) is compacted per partition directory, recursively,
    * so path-based pruning survives. Readers see the same rows from
    * fewer, larger, splittable files. (Table formats run this as
    * OPTIMIZE; this is the plain-parquet equivalent.)
    *
    * Swap discipline: write to a sibling temp dir, move the original
    * aside, move the temp into place, then drop the aside copy —
    * every step checked, and at no point is the only copy deleted
    * (a crash mid-swap leaves either the original or the aside
    * recoverable on disk).
    *
    * @return number of compacted files written
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path) // normalizes trailing slashes
    val fs = dir.getFileSystem(conf) // the PATH's fs, not the default one
    val partitionChildren = fs.listStatus(dir).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
    if (partitionChildren.nonEmpty)
      return partitionChildren
        .map(st => compact(spark, st.getPath.toString, targetFileBytes)).sum

    val bytes = fs.getContentSummary(dir).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    val tmp = new Path(dir.getParent, dir.getName + "__compact")
    val aside = new Path(dir.getParent, dir.getName + "__precompact")
    spark.read.parquet(dir.toString)
      .repartition(nFiles.toInt)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    require(fs.rename(dir, aside), s"compact: could not move $dir aside")
    require(fs.rename(tmp, dir), s"compact: could not move $tmp into place; " +
      s"original preserved at $aside")
    require(fs.delete(aside, true), s"compact: could not drop aside copy $aside")
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
