package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (SURVEY §2.C8): a new session starts when
  * the gap to the previous event of the same key exceeds `gap`.
  *
  * Classic lag + running-sum-of-flags: two window passes over the SAME
  * (key, order) partitioning — Spark plans one shuffle + one sort, the
  * second window reuses the first's ordering. No state store, no
  * per-key buffering beyond the sort.
  */
object Sessionize {

  /** @param order must give a total order within a key (ties break the
    *              lag nondeterministically otherwise)
    */
  def byGap(df: DataFrame, key: Column, ts: Column, gapSeconds: Long,
            order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    val prev = lag(ts, 1).over(w)
    val isNew = when(prev.isNull
      || unix_micros(ts) - unix_micros(prev) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    df.withColumn("session_id", sum(isNew).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup for the events table: bounds + volume. */
  def sessions(df: DataFrame, key: Column, ts: Column, gapSeconds: Long,
               order: Seq[Column]): DataFrame =
    byGap(df, key, ts, gapSeconds, order)
      .groupBy(key, col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(ts).as("t_start"), max(ts).as("t_end"))
}
