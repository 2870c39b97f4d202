package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** CUSUM changepoint detection (Page 1954) over a per-key series —
  * the "did the metric shift, and when" primitive ops dashboards run
  * after C23/C54 flag that SOMETHING is off: the cumulative sum of
  * deviations from the series mean peaks (in absolute value) at the
  * most likely level-shift point.
  *
  * EXACT integer core: with D points and total mass N per key, the
  * deviation cumsum at step i is cum_i − i·(N/D) — a rational whose
  * D-scaled form S_i = D·cum_i − i·N is an INTEGER (decimal(38,0)
  * at scale). The argmax over |S_i| (tie → earliest point) is
  * therefore an all-integer decision, bit-reproducible in any
  * engine; the published statistic |S|/D and the mean N/D are one
  * IEEE divide each.
  *
  * Scale shape: the input is expected to be an already-aggregated
  * series (key × step — e.g. daily counts), so every window here is
  * partitioned BY KEY over series-length frames, never corpus-sized;
  * the corpus-scale aggregation that produces the series is the
  * caller's one partial-agg'd shuffle.
  */
object Changepoint {

  private def dec0(c: Column): Column = c.cast(DecimalType(38, 0))

  /** Per-key CUSUM scan: one row per key —
    * (key…, cp_step, cusum_stat, mean_level, n_steps). `step` must be
    * orderable and unique per key (a date, an index); `mass` the
    * series value (integer counts). Keys with a single step publish
    * statistic 0 at that step (no interior shift is expressible).
    */
  def cusumMaxShift(series: DataFrame, keyCols: Seq[String], step: Column,
                    mass: Column): DataFrame = {
    val keys = keyCols.map(col)
    val base = series.select(keys :+ step.as("__s") :+ mass.as("__x"): _*)
    val w = Window.partitionBy(keys: _*).orderBy(col("__s"))
    val cum = base
      .withColumn("__i", row_number().over(w))
      .withColumn("__cum",
        sum(dec0(col("__x"))).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val totals = base.groupBy(keys: _*)
      .agg(count(lit(1)).as("__d"), sum(dec0(col("__x"))).as("__n"))
    val scored = cum.join(broadcast(totals), keyCols)
      .withColumn("__sdev",
        dec0(col("__d")) * col("__cum") - dec0(col("__i")) * col("__n"))
    // argmax |S|, tie → earliest step: an all-integer sort
    val pick = Window.partitionBy(keys: _*)
      .orderBy(abs(col("__sdev")).desc, col("__s").asc)
    scored
      .withColumn("__rk", row_number().over(pick))
      .filter(col("__rk") === 1)
      .select(keys ++ Seq(
        col("__s").as("cp_step"),
        round(abs(col("__sdev")).cast("double") / col("__d").cast("double"), 6)
          .as("cusum_stat"),
        round(col("__n").cast("double") / col("__d").cast("double"), 6)
          .as("mean_level"),
        col("__d").as("n_steps")): _*)
  }
}
