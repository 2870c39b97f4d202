package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.SignalStats

/** E21: continuous quality-signal agreement monitoring — the streaming
  * face of D79. A training-data intake keeps the Pearson matrix
  * between its curation signals current as documents arrive: a
  * correlation SHIFT (quality suddenly tracking length, repetition
  * decoupling from quality) is a crawl-mix change that per-signal
  * threshold monitors (E11) can't see, because each signal's own
  * distribution may look stable while their joint behavior moves.
  *
  * Posture is the lake-as-state recipe (E11/E14): each micro-batch
  * appends ONE row of sufficient statistics — n and the nine integer
  * micro-unit sums of [[SignalStats]] — and the read face merges and
  * finishes. The statistics are ADDITIVE integers, so partial rows
  * over any batching merge to exactly the union's statistics and
  * stream ≡ batch BIT-exactly (StreamingSpec pins it); the per-batch
  * rows double as a correlation time series for free.
  *
  * Scale shape: one partial-aggregated scan per micro-batch collapsing
  * to a single row; no state store, no watermark, no shuffle beyond
  * the batch's own aggregate.
  */
object StreamingCorrelation {

  /** Start the monitor: append each micro-batch's statistics row to
    * `path`. Pass-through monitor, not a filter.
    */
  def start(stream: DataFrame, textCol: String, path: String,
            checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // replay-safe: dynamic overwrite of the batch_id partition
        LakeState.putBatch(
          SignalStats.sums(SignalStats.microSignals(batch, textCol)),
          path, batchId)
        ()
      }
      .trigger(trigger)
      .start()

  /** Stream-to-date Pearson matrix — bit-identical to running the
    * batch D79 audit over everything the stream has seen.
    */
  def matrixToDate(spark: SparkSession, path: String): DataFrame =
    SignalStats.pearsonMatrix(
      SignalStats.mergeSums(spark.read.parquet(path).drop("batch_id")))
}
