package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.MediaDedup
import graft.sources.{MediaCodecs, Multimodal}

/** Streaming media ingestion gate (SURVEY §2.E20 ∘ D70/D23): the
  * multimodal twin of [[StreamingAdmission]]'s text loop. Each
  * micro-batch of (id, media bytes) is decoded ONCE, fingerprinted
  * (dHash), and screened against the persisted fingerprint index —
  * within `maxHamming`, the asset is a near-dup and is dropped;
  * within-batch near-dup components admit only their min-id
  * representative ([[MediaDedup.admitBatch]]). Admitted assets
  * append to the asset lake, their fingerprints to the index, so the
  * screen stays O(batch · bands) forever: indexed media is NEVER
  * re-decoded.
  *
  * foreachBatch (not a stateful operator) because admission state is
  * the LAKE — fingerprint + asset artifacts shared with the batch
  * path, surviving restarts, queryable mid-stream.
  *
  * Crash semantics under foreachBatch's at-least-once replay: asset
  * write FIRST, index second. A crash between them replays the batch
  * against the pre-batch index, admits the same rows again, and
  * appends them to the asset lake a second time — duplicate ASSET
  * rows for that one batch (readers dedup by id; fingerprints append
  * once). The reverse order would replay against an index already
  * containing the batch, reject everything, and lose the assets
  * PERMANENTLY — an unrecoverable hole instead of a benign
  * duplicate, because this screen has no corpus-side verify join to
  * drop dangling index rows (the text loop's escape hatch).
  */
object StreamingMediaGate {

  /** Decode + fingerprint a static micro-batch of (idCol, media) —
    * the shared [[Multimodal.dhashImageFrame]]. */
  def fingerprint(batch: DataFrame, idCol: String = "doc_id"): DataFrame =
    Multimodal.dhashImageFrame(batch, idCol)

  /** @param assetPath parquet lake of admitted (id, width, height,
    *        phash) rows — join back to payload storage by id
    * @param indexPath fingerprint artifact the screen reads
    */
  def start(stream: DataFrame, idCol: String,
            assetPath: String, indexPath: String, checkpoint: String,
            maxHamming: Int = 2,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val hashes = fingerprint(batch, idCol)
        // cold start ONLY when the index path genuinely doesn't exist —
        // a Try around the read would also swallow transient store/
        // corruption errors and silently screen against an empty index
        // (admitting duplicates permanently); those must fail the batch
        // so the checkpoint retries
        val p = new org.apache.hadoop.fs.Path(indexPath)
        val exists = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(p)
        val idx = if (exists) Some(spark.read.parquet(indexPath)) else None
        val admittedPlan = MediaDedup.admitBatch(idx, hashes, idCol,
          "phash", maxHamming = maxHamming)
        // eager cut BEFORE the appends: the plan reads indexPath, and
        // the index append below would otherwise re-execute it
        // against the just-grown index (batch would self-match away)
        val admitted = admittedPlan.localCheckpoint()
        admitted.write.mode("append").parquet(assetPath)
        admitted.select(col("width"), col("height"), col("phash"))
          .write.mode("append").parquet(indexPath)
        ()
      }
      .trigger(trigger)
      .start()
}
