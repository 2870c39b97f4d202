package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.ParagraphDedup

/** E15: continuous boilerplate stripping — the streaming face of
  * D53's paragraph dedup, in the frozen-artifact posture of
  * E12/E13: the cross-doc duplicate-paragraph digest set is detected
  * ONCE on a reference corpus (a corpus-relative decision that needs
  * the closed set) and frozen as a lake artifact; each arriving
  * document is then stripped against that frozen set — a per-doc
  * decision, so stream ≡ batch EXACTLY and batch boundaries are
  * invisible (StreamingSpec pins it). Re-detect offline when the
  * boilerplate mix drifts, exactly like the perplexity gate's
  * thresholds.
  *
  * Scale shape per micro-batch: explode + digest the batch (a
  * per-row projection), anti-join against the digest artifact, one
  * partial-agg'd reassembly keyed by the batch's own doc ids — no
  * state store, no watermark; state is the lake artifact.
  */
object StreamingBoilerplate {

  /** Detect and freeze the boilerplate digest set from a reference
    * corpus (one row per duplicated paragraph digest).
    */
  def saveBoilerplate(refDocs: DataFrame, text: Column, id: Column,
                      path: String, words: Int = 12,
                      minDocs: Int = 2): Unit =
    ParagraphDedup.duplicateDigests(
        ParagraphDedup.paragraphs(refDocs, text, id, words), minDocs)
      .write.mode("overwrite").parquet(path)

  /** Strip each micro-batch against the frozen digest set and append
    * the cleaned docs (id, n_paras, n_kept, clean_text) to `outPath`.
    */
  def start(stream: DataFrame, textCol: String, idCol: String,
            dupPath: String, outPath: String, checkpoint: String,
            words: Int = 12,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dup = batch.sparkSession.read.parquet(dupPath)
        // replay-safe: a re-run batch REPLACES its own partition, so
        // cleaned docs are never duplicated in the output corpus
        LakeState.putBatch(
          ParagraphDedup.strip(batch, col(textCol), col(idCol), dup, words),
          outPath, batchId)
        ()
      }
      .trigger(trigger)
      .start()
}
