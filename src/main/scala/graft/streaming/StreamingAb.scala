package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.AbStats

/** E24: continuous A/B experiment monitoring — the streaming face of
  * C66. An experiment platform doesn't wait for the run to end: the
  * metric readout stays current as events arrive, and the decision
  * layer reads the same Welch row the batch query would produce over
  * everything seen so far.
  *
  * Posture is the lake-as-state recipe (E11/E14/E21): each
  * micro-batch appends ONE row of [[AbStats.welchSufficient]]
  * statistics — counts and DECIMAL sums, ADDITIVE and exact — via the
  * replay-safe `LakeState.putBatch` (dynamic overwrite of the
  * batch_id partition, so at-least-once foreachBatch replays REPLACE
  * rather than double-count). The read face merges and runs the
  * LITERALLY-same [[AbStats.welchFinish]] scalar finisher as the
  * batch key, so stream ≡ batch BIT-exactly and the gated key shares
  * `ab_welch_ttest`'s oracle SQL verbatim. The per-batch rows double
  * as a sequential-readout time series for free.
  *
  * Scale shape: one partial-aggregated scan per micro-batch collapsing
  * to a single row; no state store, no watermark, no shuffle beyond
  * the batch's own scalar aggregate.
  */
object StreamingAb {

  /** Start the monitor: append each micro-batch's sufficient row. */
  def start(stream: DataFrame, arm: Column, value: Column, path: String,
            checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        LakeState.putBatch(
          AbStats.welchSufficient(batch, arm, value), path, batchId)
        ()
      }
      .trigger(trigger)
      .start()

  /** Stream-to-date Welch readout — bit-identical to the batch C66
    * query over everything the stream has seen.
    */
  def ttestToDate(spark: SparkSession, path: String): DataFrame =
    AbStats.welchFinish(
      AbStats.welchMerge(spark.read.parquet(path).drop("batch_id")))
}
