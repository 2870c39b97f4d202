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
  * cells (b, wv, ws) plus the plain (n, sum) pair, and the read face
  * merges cells and finishes with the same order statistics. Stream ≡
  * batch BIT-exactly (StreamingSpec pins a mid-stream split). No
  * state store, no watermark; per-batch cost is one partial-agg'd
  * scan collapsing to B+1 rows.
  */
object StreamingBootstrap {

  /** Append each micro-batch's replica cells and mean partials. */
  def start(stream: DataFrame, idCol: Column, valueCol: Column,
            path: String, checkpoint: String, replicas: Int = 200,
            seed: Long = 42L,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val base = batch.select(idCol.as("__id"), valueCol.as("__v"))
        val u = Bootstrap.uniform(col("__id"), col("__b"), replicas, seed)
        val cells = base
          .select(col("__id"), col("__v"),
            explode(sequence(lit(0L), lit(replicas - 1L))).as("__b"))
          .withColumn("__w", Bootstrap.weight(u))
          .groupBy(col("__b"))
          .agg(sum((col("__w") * col("__v")).cast("decimal(38,0)")).as("wv"),
            sum(col("__w").cast("decimal(38,0)")).as("ws"))
          .select(lit(batchId).as("batch_id"), col("__b").as("b"),
            col("wv"), col("ws"),
            lit(null).cast("long").as("n"),
            lit(null).cast("decimal(38,0)").as("vsum"))
        val mean = base.agg(count(lit(1)).as("n"),
            sum(col("__v").cast("decimal(38,0)")).as("vsum"))
          .select(lit(batchId).as("batch_id"), lit(null).cast("long").as("b"),
            lit(null).cast("decimal(38,0)").as("wv"),
            lit(null).cast("decimal(38,0)").as("ws"),
            col("n"), col("vsum"))
        cells.unionAll(mean).write.mode("append").parquet(path)
        ()
      }
      .trigger(trigger)
      .start()

  /** Stream-to-date CI — bit-identical to [[Bootstrap.meanCi]] over
    * everything the stream has seen.
    */
  def ciToDate(spark: SparkSession, path: String, replicas: Int = 200,
               alpha: Double = 0.025): DataFrame = {
    val lo = math.ceil(alpha * replicas).toInt
    val hi = replicas - lo + 1
    val rows = spark.read.parquet(path)
    val mean = rows.filter(col("b").isNull)
      .agg(round(sum(col("vsum")).cast("double")
        / sum(col("n")).cast("double"), 6).as("mean"))
    val ci = rows.filter(col("b").isNotNull)
      .groupBy(col("b"))
      .agg(sum(col("wv")).as("wv"), sum(col("ws")).as("ws"))
      .select((col("wv").cast("double") / col("ws").cast("double")).as("__m"))
      .agg(sort_array(collect_list(col("__m"))).as("a"),
        count(lit(1)).as("n_replicas"))
      .select(col("n_replicas"),
        element_at(col("a"), lo).as("ci_lo"),
        element_at(col("a"), hi).as("ci_hi"))
    mean.crossJoin(broadcast(ci))
      .select(col("n_replicas"), col("mean"), col("ci_lo"), col("ci_hi"))
  }
}
