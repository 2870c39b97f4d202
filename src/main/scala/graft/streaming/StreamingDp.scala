package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * no state store beyond the agg's own, no driver sync), every
  * re-emission of a cell under `complete`/`update` output carries
  * the identical noise (the continual-observation posture: one draw
  * per cell, not one per refresh — refreshing never spends extra ε
  * on old cells), and the batch twin over the same data is
  * bit-identical, which is what the spec pins.
  *
  * Per-cell sensitivity of a disjoint count histogram is 1, so each
  * cell's noise is Lap(1/ε); a record appears in exactly one
  * (window, key) cell (tumbling windows), keeping the parallel-
  * composition argument of the batch mechanism.
  */
object StreamingDp {

  /** The shared noise chain: count + Lap(1/ε) with the deviate drawn
    * from the keyed hash — literally the same expression tree on the
    * stream and the batch twin.
    */
  def noisyColumn(countCol: Column, hash: Column, epsilon: Double): Column = {
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    val b = 1.0 / epsilon
    val bits = shiftrightunsigned(hash, 11)
    val u = (bits.cast("double") + lit(0.5)) / lit(9007199254740992.0)
    val lap =
      when(u < 0.5, lit(b) * log(lit(2.0) * u))
        .otherwise(-lit(b) * log(lit(2.0) * (lit(1.0) - u)))
    round(countCol.cast("double") + lap, 6)
  }

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
}
