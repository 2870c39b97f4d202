package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental load windows (SURVEY §2.A6).
  *
  * The reference decides which gameweeks to (re)process from a
  * persisted watermark (fpl-data-pipeline includes.py:168-186,
  * sql_queries.py:275 `sql_select_last_data_checked_week`) with a
  * driver-side round trip per run. Here the watermark is a one-row
  * aggregate broadcast into the filter — the whole decision stays
  * inside one distributed plan, and the filter lands on the scan
  * (partition pruning when the lake is partitioned on the period).
  */
object Incremental {

  /** Rows belonging to the latest period of `df` itself (recompute-
    * last-window semantics, the reference's default flow).
    */
  def latestPeriod(df: DataFrame, period: Column): DataFrame = {
    val wm = df.agg(max(period).as("__wm"))
    df.join(broadcast(wm), period === col("__wm")).drop("__wm")
  }

  /** Rows strictly after an externally recorded watermark (e.g. the
    * max period already merged into the target table).
    */
  def afterWatermark(df: DataFrame, period: Column,
                     watermarkTable: DataFrame, watermarkCol: Column): DataFrame = {
    val wm = watermarkTable.agg(max(watermarkCol).as("__wm"))
    df.join(broadcast(wm), period > col("__wm"), "inner").drop("__wm")
  }
}
