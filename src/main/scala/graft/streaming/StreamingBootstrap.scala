package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Bootstrap

/** E23: continuously-maintained bootstrap CI — the streaming face of
  * D82. A live intake keeps the corpus quality mean AND its
  * uncertainty current: the CI narrowing as docs arrive is the
  * dashboard's evidence the release number is converging, and a CI
  * that stops covering yesterday's mean is a drift alarm with
  * built-in significance.
  *
  * The per-(doc, replica) Poisson weights depend only on the doc id,
  * so each replica's weighted sums are ADDITIVE integers across any
  * batching — the lake-as-state recipe (E21's statistics rows, one
  * level richer): each micro-batch appends its B=replicas partial
  * cells (b, wv, ws, n, vsum) from [[Bootstrap.cells]] — every cell
  * carries the batch's plain count/sum too, so ONE scan covers both
  * the CI and the mean — and the read face merges cells through the
  * SAME [[Bootstrap.finishCi]] finisher. Stream ≡ batch BIT-exactly
  * (StreamingSpec pins a mid-stream split). No state store, no
  * watermark; per-batch cost is one partial-agg'd scan → B rows.
  */
object StreamingBootstrap {

  /** Append each micro-batch's replica cells — ONE partial-aggregated
    * scan producing B rows (each cell carries the batch's (n, vsum)
    * pair too, see [[Bootstrap.cells]]).
    */
  def start(stream: DataFrame, idCol: Column, valueCol: Column,
            path: String, checkpoint: String, replicas: Int = 200,
            seed: Long = 42L,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // idempotent under foreachBatch's at-least-once replay: the
        // batch's cells land in (and on replay REPLACE) their own
        // batch_id partition — see [[LakeState.putBatch]]
        LakeState.putBatch(
          Bootstrap.cells(batch, idCol, valueCol, replicas, seed),
          path, batchId)
        ()
      }
      .trigger(trigger)
      .start()

  /** Stream-to-date CI — bit-identical to [[Bootstrap.meanCi]] over
    * everything the stream has seen: merged cells through the SAME
    * finisher. `replicas`/`alpha` must match the writer's (the
    * finisher's rank convention is shared, so a mismatch shows up as
    * an element_at error, not silently-wrong ranks).
    */
  def ciToDate(spark: SparkSession, path: String, replicas: Int = 200,
               alpha: Double = 0.025): DataFrame = {
    val merged = spark.read.parquet(path)
      .groupBy(col("b"))
      .agg(sum(col("wv")).as("wv"), sum(col("ws")).as("ws"),
        sum(col("n")).as("n"), sum(col("vsum")).as("vsum"))
    Bootstrap.finishCi(merged, replicas, alpha)
  }
}
