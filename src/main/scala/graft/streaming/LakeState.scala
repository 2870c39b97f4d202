package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Idempotent per-batch lake-as-state writes.
  *
  * `foreachBatch` is AT-LEAST-ONCE: a crash between the lake write
  * and the checkpoint commit replays the batch, and a plain
  * `mode("append")` would land the same rows twice. For the monitor
  * family whose read faces SUM the accumulated rows (bootstrap cells,
  * correlation sums, forecast period sums, drift bucket counts,
  * quality violation counts, trending sketches) a double-append
  * silently double-counts that batch and breaks the pinned
  * stream ≡ batch bit-exact contract after recovery.
  *
  * The fix is structural, not read-side: each batch writes its rows
  * into the `batch_id=<id>` partition with DYNAMIC partition
  * overwrite, so a replay REPLACES its own partition instead of
  * appending next to it — effectively-once regardless of where the
  * previous attempt died (foreachBatch replays the same batchId with
  * the same source data, so the rewrite is byte-identical). Read
  * faces stay plain sums over the whole directory; `batch_id` comes
  * back as a partition column they are free to ignore.
  *
  * Scale: one directory per micro-batch of aggregate-sized rows —
  * the same file count a plain append would produce, plus partition
  * pruning on batch_id for free.
  */
object LakeState {

  /** Write `df` as the `batch_id=batchId` partition of `path`,
    * replacing any previous attempt for the same batch.
    */
  def putBatch(df: DataFrame, path: String, batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)
}
