package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** E22: continuous per-entity trend forecasting — the streaming face
  * of C61's Holt smoothing. A live dashboard keeps each user's
  * (level, trend) forecast current as events arrive.
  *
  * The Holt fold itself is ORDER-dependent, so it cannot ride a
  * per-batch state merge the way the additive monitors (E11/E14/E21)
  * do. The lake-as-state recipe still applies one level down: each
  * micro-batch appends its per-(key, period) PARTIAL decimal sums —
  * which ARE additive under any batching, including a period's rows
  * arriving across many batches — and the read face merges the
  * periods and runs the SAME batch fold over the merged frame. The
  * fold's input is then identical to the batch operator's, so
  * stream ≡ batch BIT-exactly with zero ordering assumptions on the
  * stream (late rows for an old period simply land in that period's
  * sum). No state store, no watermark; per-batch shuffle is the
  * batch's own partial-aggregated groupBy.
  *
  * Cost note: the read face re-folds per read over the aggregate-sized
  * (key, period) frame — the monitors' pattern (state is the lake,
  * reports are queries), chosen over a stateful running fold because
  * it keeps late data exact instead of approximately merged.
  */
object StreamingForecast {

  /** Append each micro-batch's per-(key, period) partial sums. */
  def start(stream: DataFrame, key: Column, period: Column, value: Column,
            path: String, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // replay-safe: dynamic overwrite of the batch_id partition
        LakeState.putBatch(
          batch.groupBy(key.as("k"), period.as("p"))
            .agg(sum(value).as("v")),
          path, batchId)
        ()
      }
      .trigger(trigger)
      .start()

  /** Stream-to-date Holt forecast — bit-identical to running
    * [[graft.operators.Ewma.holt]] over everything the stream has
    * seen, because the merged (key, period) sums equal the batch
    * aggregation exactly (decimal addition is order-free).
    */
  def forecastToDate(spark: SparkSession, path: String,
                     alpha: Double, beta: Double): DataFrame = {
    val merged = spark.read.parquet(path)
      .groupBy(col("k"), col("p")).agg(sum(col("v")).as("v"))
    graft.operators.Ewma.holt(merged, "k", "p", col("v"), alpha, beta)
  }
}
