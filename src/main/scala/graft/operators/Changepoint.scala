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

  /** C84: Mann–Kendall trend test (Mann 1945 / Kendall 1975 — the
    * standard nonparametric monotone-trend monitor, WMO-recommended
    * for environmental series and the right alarm for "is this metric
    * drifting" when CUSUM's single-shift model doesn't fit): S =
    * Σ_{i<j} sgn(x_j − x_i) over the step-ordered series, the
    * tie-corrected variance 18·Var(S) = m(m−1)(2m+5) − Σ_t t(t−1)(2t+5)
    * kept as an exact INTEGER, and the continuity-corrected
    * z = (S ∓ 1)/√Var read against the 1.96 two-sided line.
    *
    * Scale shape: the corpus collapses to the step-domain series
    * (aggregate-sized, calendar-bounded) in one scan; the pairwise S
    * self-join is m² over THAT frame, never corpus rows. S, m, and
    * the tie term are exact integers — the only doubles are the final
    * sqrt/divide, one IEEE evaluation each.
    */
  def mannKendall(series: DataFrame, step: Column,
                  value: Column): DataFrame = {
    // cut the aggregate-sized series once — the pairwise join, the
    // count, and the tie census would otherwise each re-run the
    // corpus collapse. The sign statistic and the tie census both
    // read the value as an exact integer; a fractional series would
    // silently truncate, so non-integral inputs fail the job instead.
    val checked = when(
      value.cast("long").cast("double") === value.cast("double"),
      value.cast("long"))
      .otherwise(raise_error(concat(
        lit("mannKendall: non-integral value "), value.cast("string"),
        lit(" — scale the series to integers (e.g. micro-units) first"))))
    val v = Materialize.cut(series.select(step.as("__s"), checked.as("__x")))
    val s = v.as("a").join(v.as("b"), col("a.__s") < col("b.__s"))
      .agg(coalesce(sum(signum(
          col("b.__x").cast("double") - col("a.__x").cast("double"))
        .cast("long")), lit(0L)).as("s_stat"))
    val m = v.agg(count(lit(1)).as("m"))
    val ties = v.groupBy(col("__x")).agg(count(lit(1)).as("t"))
      .filter(col("t") > 1L)
      .agg(coalesce(sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L)),
        lit(0L)).as("tie_term"))
    val joined = s.crossJoin(m).crossJoin(ties)
      .withColumn("var18",
        col("m") * (col("m") - 1L) * (lit(2L) * col("m") + 5L)
          - col("tie_term"))
    val z = when(col("var18") <= 0L, lit(null).cast("double"))
      .otherwise(
        when(col("s_stat") > 0L, (col("s_stat") - 1L).cast("double"))
          .when(col("s_stat") < 0L, (col("s_stat") + 1L).cast("double"))
          .otherwise(lit(0.0))
        / sqrt(col("var18").cast("double") / lit(18.0)))
    joined.select(col("m").as("n_steps"), col("s_stat"), col("var18"),
      round(z, 6).as("z_stat"),
      when(z.isNull, "undefined")
        .when(round(z, 6) > 1.96, "increasing")
        .when(round(z, 6) < -1.96, "decreasing")
        .otherwise("no_trend").as("trend"))
  }
}
