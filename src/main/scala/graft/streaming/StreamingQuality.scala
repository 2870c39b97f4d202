package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Expectations

/** E11: continuous data-quality monitoring — the streaming face of
  * C27. Each micro-batch runs the ROW-LEVEL expectation scan (one
  * wide aggregate — the C27 plan) and appends (batch_id, rule,
  * violations) to the lake; the read face sums per rule. Row-level
  * violation counts are additive across any batching, so stream ≡
  * batch EXACTLY (StreamingSpec pins it). Uniqueness and referential
  * rules are deliberately NOT offered here: they are not per-batch
  * decomposable (a duplicate can straddle batches) — run those on the
  * lake table with the batch operator, where they see the whole
  * corpus.
  *
  * State is the lake ([[StreamingAdmission]] posture): the violation
  * history is itself a queryable table — per-batch rows double as the
  * monitoring time series a dashboard plots.
  */
object StreamingQuality {

  def start(stream: DataFrame, rowRules: Seq[Expectations.RowRule],
            path: String, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(rowRules.nonEmpty, "StreamingQuality: no row rules given")
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // replay-safe: dynamic overwrite of the batch_id partition
        LakeState.putBatch(
          Expectations.check(batch, rowRules = rowRules)
            .select(col("rule"), col("violations")),
          path, batchId)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** Corpus-to-date totals per rule — identical to running the batch
    * operator over everything the stream has seen.
    */
  def totals(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("rule")).agg(sum(col("violations")).as("violations"))
      .select(col("rule"), col("violations"),
        (col("violations") === 0).as("pass"))
      .orderBy(col("rule"))
}
