package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming face of the DP count release (SURVEY §2.E19 ∘ D68):
  * continuously-published windowed count histograms with Laplace
  * noise.
  *
  * The batch mechanism (operators.DpRelease) indexes its noise draw
  * over the CLOSED released histogram; a stream's group set is open,
  * so the continuous face keys the draw on the GROUP IDENTITY
  * instead — `xxhash64(seed, window_start, key)` → top 53 bits →
  * inverse Laplace CDF, the same arithmetic chain. That makes the
  * noise a pure function of the (window, key) cell: the plan stays
  * STATELESS after the windowed aggregation (a codegen projection —
  * no state store beyond the agg's own, no driver sync), and the
  * batch twin over the same data is bit-identical, which is what
  * the spec pins.
  *
  * RELEASE DISCIPLINE — identical noise across re-emissions is NOT
  * free in the DP sense: publishing the same open cell at two true
  * counts with the SAME Laplace deviate reveals the count increment
  * exactly (the noise cancels in the difference), so intermediate
  * emissions of a still-open window are unprotected. The mechanism's
  * ε guarantee holds only for each cell's FINAL value, released
  * once. [[release]] enforces that posture: APPEND output mode, so
  * a cell is emitted exactly once, after the watermark closes its
  * window (StreamingSpec pins once-only and finalized-only).
  * `complete`/`update` sinks of [[windowedNoisyCounts]] are for
  * trusted-boundary dashboards and the batch-twin spec — not for
  * publishing outside the data boundary.
  *
  * Per-cell sensitivity of a disjoint count histogram is 1, so each
  * cell's noise is Lap(1/ε); a record appears in exactly one
  * (window, key) cell (tumbling windows), keeping the parallel-
  * composition argument of the batch mechanism.
  */
object StreamingDp {

  /** The shared noise chain — delegates to
    * [[graft.operators.DpRelease.noisyColumn]], the ONE definition
    * both the batch mechanism and this face build from (so the
    * pinned batch ≡ stream bit-equality cannot un-sync).
    */
  def noisyColumn(countCol: Column, hash: Column, epsilon: Double): Column =
    graft.operators.DpRelease.noisyColumn(countCol, hash, epsilon)

  /** Tumbling-window noisy counts per event type. Works on a
    * streaming OR static events frame — the spec runs both and
    * asserts equality.
    */
  def windowedNoisyCounts(events: DataFrame, epsilon: Double = 1.0,
                          windowLen: String = "1 day",
                          seed: Long = 42L): DataFrame = {
    val wm = if (events.isStreaming) events.withWatermark("ts", "1 hour")
             else events
    val counted = wm
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_true"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_true"))
    counted.withColumn("noisy_count",
      noisyColumn(col("n_true"),
        xxhash64(lit(seed), unix_micros(col("window_start")),
          col("event_type")),
        epsilon))
  }

  /** The externally-publishable face: APPEND output mode, so each
    * (window, key) cell is released exactly once, after the
    * watermark closes its window — the only emission discipline
    * under which the per-cell ε guarantee actually holds (see the
    * class doc). Cells land in `path` as parquet via the file sink's
    * exactly-once commit log.
    */
  def release(events: DataFrame, path: String, checkpoint: String,
              epsilon: Double = 1.0, windowLen: String = "1 day",
              seed: Long = 42L,
              trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(events.isStreaming, "release: needs a streaming frame")
    windowedNoisyCounts(events, epsilon, windowLen, seed)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", path)
      .trigger(trigger)
      .start()
  }
}
