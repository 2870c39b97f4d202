package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.RobustStats

/** Streaming face of the median/MAD robust-outlier monitor (SURVEY §2
  * E17 ∘ C54): continuous per-group anomaly flagging of an incoming
  * event stream against location/scale frozen from a reference corpus.
  *
  * The batch medians are corpus-relative (they only mean something
  * over a closed set), so the production semantics freeze
  * [[RobustStats.medMadBuckets]] into a lake artifact (one row per
  * group: med_bk, mad_bk cent buckets) and flag each arriving row
  * under the SAME all-integer decision the batch report uses —
  * re-fit offline when the reference drifts, exactly the
  * E12/E13/E16 deployment pattern.
  *
  * Scale shape: a STATELESS incremental plan — the flag is a codegen
  * projection plus one broadcast join of ≤ |groups| rows; no state
  * store, no watermark, no foreachBatch. Because the decision is a
  * pure per-row function of (value, frozen stats), the stream IS the
  * batch flag replayed: stream ≡ static twin row for row. Rows in
  * groups absent from the artifact are dropped (no calibrated scale
  * → no verdict → quarantine path), via the inner join.
  */
object StreamingRobust {

  /** Persist the frozen stats artifact (tiny: one row per group). */
  def saveStats(stats: DataFrame, path: String): Unit =
    stats.coalesce(1).write.mode("overwrite").parquet(path)

  def loadStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The continuous monitor: attach (median, mad, is_outlier) to each
    * streamed row from the frozen stats. Works identically on a
    * static frame — that equivalence is the spec's pin.
    */
  def monitored(stream: DataFrame, stats: DataFrame,
                group: String = "event_type",
                value: String = "value"): DataFrame =
    RobustStats.flag(stream, group, value, stats)
}
