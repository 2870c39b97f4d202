package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Upsert

/** Streaming upsert sink (SURVEY §2.E + §2.A5 composed): the
  * reference's incremental weekly loads (includes.py:148-210 — fetch
  * latest week, ON CONFLICT upsert) as a continuous pipeline.
  *
  * Each micro-batch merges into the lake table via foreachBatch —
  * batch rows win on key collision, exactly the reference's upsert
  * semantics, with the merge running as a distributed anti-join
  * rewrite. (On a table format with MERGE — Delta/Iceberg — the
  * rewrite becomes a metadata-level MERGE INTO; semantics unchanged.)
  */
object StreamingUpsert {

  /** @param versionCol within-batch winner per key = max version
    *        (e.g. the event timestamp); `tiebreak` completes the order
    */
  def start(stream: DataFrame, keys: Seq[String], versionCol: String,
            tiebreak: Seq[String], tablePath: String,
            checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val deduped = Upsert.keepLatest(batch, keys,
          org.apache.spark.sql.functions.col(versionCol),
          tiebreak.map(org.apache.spark.sql.functions.col))
        val merged = scala.util.Try(spark.read.parquet(tablePath)).toOption match {
          case Some(base) => Upsert.merge(base, deduped, keys)
          case None => deduped
        }
        val tmp = tablePath + "__staging"
        merged.write.mode(SaveMode.Overwrite).parquet(tmp)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val dst = new org.apache.hadoop.fs.Path(tablePath)
        fs.delete(dst, true)
        fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
