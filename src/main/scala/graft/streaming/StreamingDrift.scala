package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Drift

/** E14: continuous distribution-drift monitoring — the streaming face
  * of D52's PSI gate. A training-data intake watches the incoming
  * stream's bucket mix against a FROZEN reference histogram (the
  * corpus the current model was tuned on) and alarms when PSI crosses
  * the industry thresholds, BEFORE the drifted data is admitted.
  *
  * Posture is the lake-as-state recipe (E9/E10/E11): each micro-batch
  * appends its per-bucket counts (batch_id, bucket, cur_n) — an
  * aggregate-sized row set, never rows — and the read face sums them.
  * Counts are ADDITIVE across any batching, so the merged histogram
  * is identical to one histogram over the union and stream ≡ batch
  * EXACTLY; the PSI arithmetic itself runs through
  * [[graft.operators.Drift.psiFromCounts]], the same expression tree
  * as the batch operator, so even the rounded doubles are
  * bit-identical (StreamingSpec pins both properties). The per-batch
  * rows double as a drift time series — PSI between any two points in
  * time is one filtered aggregation away.
  *
  * Scale shape: the only shuffle per micro-batch is the partial-agg'd
  * groupBy(bucket) of that batch; the reference artifact is one
  * broadcast-sized file; no state store, no watermark.
  */
object StreamingDrift {

  /** Freeze the reference histogram (bucket, ref_n) as a lake
    * artifact — aggregate-sized: one row per bucket.
    */
  def saveReference(ref: DataFrame, key: Column, path: String): Unit =
    ref.groupBy(key.cast("string").as("bucket"))
      .agg(count(lit(1)).as("ref_n"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Start the monitor: append each micro-batch's bucket counts to
    * `path`. The stream itself passes through untouched — this is a
    * monitor, not a filter; pair with [[StreamingScoreFilter]] /
    * [[StreamingMixture]] for gating.
    */
  def start(stream: DataFrame, key: Column, path: String,
            checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // replay-safe: dynamic overwrite of the batch_id partition
        LakeState.putBatch(
          batch.groupBy(key.cast("string").as("bucket"))
            .agg(count(lit(1)).as("cur_n")),
          path, batchId)
        ()
      }
      .trigger(trigger)
      .start()

  /** Stream-to-date PSI report vs the frozen reference — identical
    * (bit-for-bit) to running [[Drift.psi]] over the reference and
    * everything the stream has seen.
    */
  def psiToDate(spark: SparkSession, refPath: String,
                path: String): DataFrame = {
    val ref = spark.read.parquet(refPath).select(col("bucket"), col("ref_n"))
    val cur = spark.read.parquet(path)
      .groupBy(col("bucket")).agg(sum(col("cur_n")).as("cur_n"))
    Drift.psiFromCounts(ref, cur).orderBy(col("bucket"))
  }

  /** The headline index (Σ psi_term) with the standard reading. */
  def headline(report: DataFrame): DataFrame =
    report.agg(round(sum(col("psi_term")), 6).as("psi"))
      .select(col("psi"),
        when(col("psi") < 0.1, lit("stable"))
          .when(col("psi") < 0.25, lit("drifting"))
          .otherwise(lit("broken")).as("verdict"))
}
