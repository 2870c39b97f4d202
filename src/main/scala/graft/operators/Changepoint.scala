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

  /** C98: Kendall's tau-b rank correlation (Kendall 1938; tau-b per
    * Kendall 1945 for the tie correction) between two step-indexed
    * integer series — the concordance-based association measure next
    * to D105's Spearman: tau counts pair ORDER agreements directly, so
    * it is the natural effect size for C84's Mann–Kendall S (which IS
    * Kendall tau of value vs time) and the robust "do these two daily
    * metrics move together" readout.
    *
    * EXACT integer core: the corpus collapses to the step-domain
    * series upstream (calendar-bounded); the pairwise census is m²
    * over THAT frame — concordant / discordant / tie cells are exact
    * integer counts, and tau-b = (C − D)/√((n₀−T_x)(n₀−T_y)) is one
    * IEEE evaluation (products in decimal so a 10⁵-step series can't
    * overflow). Non-integral inputs fail the job rather than silently
    * truncating (the C84 contract). Degenerate series (either margin
    * all-tied) publish null tau.
    */
  def kendallTau(series: DataFrame, step: Column, x: Column,
                 y: Column): DataFrame = {
    def checked(c: Column, name: String): Column =
      when(c.cast("long").cast("double") === c.cast("double"),
        c.cast("long"))
        .otherwise(raise_error(concat(
          lit(s"kendallTau: non-integral $name "), c.cast("string"),
          lit(" — scale the series to integers (e.g. micro-units) first"))))
    val v = Materialize.cut(series.select(step.as("__s"),
      checked(x, "x").as("__x"), checked(y, "y").as("__y")))
    val dx = col("b.__x") - col("a.__x")
    val dy = col("b.__y") - col("a.__y")
    val cells = v.as("a").join(v.as("b"), col("a.__s") < col("b.__s"))
      .agg(
        coalesce(sum(when(dx > 0 && dy > 0 || dx < 0 && dy < 0, 1L)
          .otherwise(0L)), lit(0L)).cast("long").as("concordant"),
        coalesce(sum(when(dx > 0 && dy < 0 || dx < 0 && dy > 0, 1L)
          .otherwise(0L)), lit(0L)).cast("long").as("discordant"),
        coalesce(sum(when(dx === 0 && dy =!= 0, 1L).otherwise(0L)),
          lit(0L)).cast("long").as("ties_x"),
        coalesce(sum(when(dy === 0 && dx =!= 0, 1L).otherwise(0L)),
          lit(0L)).cast("long").as("ties_y"),
        coalesce(sum(when(dx === 0 && dy === 0, 1L).otherwise(0L)),
          lit(0L)).cast("long").as("ties_xy"))
    val d0 = (c: Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val joined = cells.crossJoin(
      v.agg(count(lit(1)).cast("long").as("n_steps")))
      .withColumn("__n0",
        expr("CAST(n_steps * (n_steps - 1) DIV 2 AS BIGINT)"))
      .withColumn("__denx", col("__n0") - (col("ties_x") + col("ties_xy")))
      .withColumn("__deny", col("__n0") - (col("ties_y") + col("ties_xy")))
    joined.select(col("n_steps"), col("concordant"), col("discordant"),
      col("ties_x"), col("ties_y"), col("ties_xy"),
      when(col("__denx") > 0L && col("__deny") > 0L,
        round((col("concordant") - col("discordant")).cast("double")
          / sqrt((d0(col("__denx")) * d0(col("__deny"))).cast("double")), 6))
        .as("tau_b"))
  }

  /** C88: sample autocorrelation function (Box & Jenkins 1970) of a
    * step-indexed integer series at lags 1..maxLag — the seasonality /
    * serial-dependence diagnostic that tells a forecaster whether
    * C61/C65's weekly-seasonal model is even the right family, and an
    * experimenter whether "days" are independent units.
    *
    * EXACT rational core: with m steps, total S and values x_t, the
    * centered product Σ(x_t−S/m)(x_{t+l}−S/m) scaled by m² is
    * Σ(m·x_t−S)(m·x_{t+l}−S) — an exact INTEGER (decimal(38,0)), as
    * is the lag-0 denominator, so r_l is ONE IEEE divide of two exact
    * integers (the m² scale cancels). Standard ACF convention: the
    * global mean centers every term and the lag-0 sum over ALL m
    * points is the denominator, so r_l is bounded and positive
    * semi-definite across lags.
    *
    * Scale shape: the caller's one partial-agg'd scan produces the
    * step-domain series (calendar-bounded); everything here touches
    * only that frame — a broadcast of the 1-row total, one lag-join
    * (m·maxLag rows), one aggregate-sized groupBy(lag). Lags with no
    * pairs (l ≥ m) publish null rather than vanishing. `step` must be
    * a DATE column; pairs match on step+l exactly (calendar gaps
    * simply contribute no pair at that offset — document gaps
    * upstream or gap-fill with C34 first).
    */
  /** C88b: partial autocorrelation function via the Durbin–Levinson
    * recursion (Durbin 1960; Box & Jenkins 1970 §3.2 — the OTHER half
    * of the model-identification pair: ACF tails off for AR series
    * where PACF cuts off at the true order p, so the two plots
    * together pick the ARIMA family C61/C65 approximate).
    *
    * The recursion runs as ONE in-plan fold over the lag sequence
    * with a flat double-array accumulator [k, pacf_1..k, phi_1..k]
    * (the C61 list-accumulator shape) — inputs are the 6-dp-ROUNDED
    * acf values both engines already agree on bit-for-bit, every Σ
    * inside is a 0.0-seeded left fold, so the whole recursion
    * evaluates the identical IEEE tree in both engines and only the
    * published pacf rounds. Zero extra shuffles beyond [[acf]]'s.
    *
    * `maxLag` must stay below the series length (null acf values
    * poison the recursion from their lag on — use a lag budget the
    * calendar supports, as the face does).
    */
  def pacf(series: DataFrame, step: Column, value: Column,
           maxLag: Int): DataFrame = {
    require(maxLag >= 2, s"need maxLag >= 2, got $maxLag")
    val r0 = acf(series, step, value, maxLag)
    val arr = r0
      .agg(sort_array(collect_list(struct(col("lag"), col("acf"))))
        .as("la"))
      .select(transform(col("la"), e => e.getField("acf")).as("r"))
    def sumTo(acc: Column, k: Column, term: Column => Column): Column =
      aggregate(sequence(lit(1), k - 1), lit(0.0), (s, j) => s + term(j))
    def pkkOf(acc: Column, k: Column): Column = {
      val num = element_at(col("r"), k) - sumTo(acc, k,
        j => element_at(acc, k + j) * element_at(col("r"), k - j))
      val den = lit(1.0) - sumTo(acc, k,
        j => element_at(acc, k + j) * element_at(col("r"), j))
      num / den
    }
    val folded = aggregate(
      sequence(lit(2), lit(maxLag)),
      array(lit(1.0), element_at(col("r"), 1), element_at(col("r"), 1)),
      (acc, k) => {
        val pkk = pkkOf(acc, k)
        concat(
          array(k.cast("double")),
          slice(acc, lit(2), k - 1),
          array(pkk),
          transform(sequence(lit(1), k - 1), j =>
            element_at(acc, k + j) - pkk * element_at(acc, k + (k - j))),
          array(pkk))
      },
      acc => slice(acc, lit(2), lit(maxLag)))
    arr.select(posexplode(folded).as(Seq("pos", "__p")))
      .select((col("pos") + 1).cast("int").as("lag"),
        round(col("__p"), 6).as("pacf"))
      .orderBy(col("lag"))
  }

  /** C91: Sen's slope estimator (Sen 1968; Theil 1950) over a daily
    * series — the MAGNITUDE companion to C84's Mann–Kendall direction
    * test (the pair is the standard nonparametric trend readout:
    * Mann–Kendall says "drifting", Sen says "by this much per day"),
    * with the 29%-breakdown robustness the OLS slope lacks. Slope =
    * median of all pairwise slopes; intercept = median of
    * y_i − slope·x_i at the published slope.
    *
    * Scale shape: the corpus collapses to the calendar-bounded day
    * series in one scan; the O(m²) pairwise slopes run as an in-plan
    * nested HOF over the aggregate-sized point array (the D62b
    * machinery — bounded by the calendar, corpus-independent).
    * Slopes round to 6 dp BEFORE the lower-middle order statistic so
    * the selection cannot diverge on a ulp (the D62b discipline);
    * the intercept medians round the same way at the published slope.
    */
  def senSlope(series: DataFrame, step: Column, value: Column): DataFrame = {
    val v = Materialize.cut(series.select(
      datediff(step, to_date(lit("1970-01-01"))).cast("double").as("x"),
      value.cast("double").as("y")))
    val arr = v.agg(
      sort_array(collect_list(struct(col("x"), col("y")))).as("a"))
    val n = size(col("a"))
    // i runs 1..n-1 — Spark's sequence(a, b) REVERSES when a > b (the
    // D62b lesson), so the outer bound is cut, never degenerate
    val slopes = when(n >= 2,
      flatten(transform(sequence(lit(1), n - 1), i =>
        transform(sequence(i + 1, n), j =>
          round((element_at(col("a"), j).getField("y")
              - element_at(col("a"), i).getField("y"))
            / (element_at(col("a"), j).getField("x")
              - element_at(col("a"), i).getField("x")), 6)))))
      .otherwise(array().cast("array<double>"))
    // empty series: NULL n_steps/n_pairs like the oracle's list()
    // over zero rows (0-vs-NULL would be a spurious hash mismatch)
    arr.select(when(n > 0, n.cast("long")).as("n_steps"),
        col("a"), slopes.as("ss"), n.as("__n"))
      .withColumn("sen_slope", when(size(col("ss")) > 0,
        element_at(sort_array(col("ss")),
          ((size(col("ss")) + 1) / 2).cast("int"))))
      .select(col("n_steps"),
        when(col("__n") > 0, size(col("ss")).cast("long")).as("n_pairs"),
        col("sen_slope"),
        when(col("sen_slope").isNotNull,
          element_at(sort_array(transform(col("a"), e =>
            round(e.getField("y") - col("sen_slope") * e.getField("x"), 6))),
            ((col("n_steps") + 1) / 2).cast("int"))).as("sen_intercept"))
  }

  /** C90: classical additive seasonal decomposition (Macaulay 1931
    * lineage; the statsmodels `seasonal_decompose` convention) of a
    * daily integer series at period p: trend = centered p-point
    * moving average (defined only where the full window exists),
    * seasonal = per-weekday mean of the detrended series CENTERED to
    * sum ~0, residual = value − trend − seasonal. The decomposition
    * C61/C65 fit implicitly, made inspectable — the release-dashboard
    * view that separates "we grew" from "it's Saturday".
    *
    * EXACT rational core (odd p): the p-scaled detrended value
    * d_t = p·x_t − S_p(t) is an exact INTEGER (S_p the centered
    * window sum), and each weekday's index numerator Σd is exact, so
    * seasonal_w = Σd/(p·c_w) is ONE IEEE divide. The cross-weekday
    * centering mean folds ≤ p doubles in SORTED weekday order (the
    * chi-square pinned-fold discipline). Weekday = days-since-epoch
    * mod p — NO engine dayofweek() convention (Spark counts from
    * Sunday=1, DuckDB from Sunday=0; epoch arithmetic is identical
    * everywhere).
    *
    * Scale shape: the caller's one scan produces the calendar-bounded
    * series; all windows here are bounded-domain (p-row frames or the
    * day frame); one aggregate-sized weekday groupBy.
    */
  def seasonalDecompose(series: DataFrame, step: Column, value: Column,
                        period: Int = 7): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"need an odd period >= 3 for the centered MA, got $period")
    val half = period / 2
    val v = Materialize.cut(
      series.select(step.as("day"), dec0(value).as("x"),
        pmod(datediff(step, to_date(lit("1970-01-01"))), lit(period))
          .cast("int").as("wd")))
    // centered window sum over the calendar-bounded day frame; only
    // full windows define a trend (the classical edge-NaN convention)
    val w = Window.orderBy(col("day")).rowsBetween(-half, half)
    val ma = v
      .withColumn("__sp", sum(col("x")).over(w))
      .withColumn("__cw", count(lit(1)).over(w))
      .withColumn("__d",
        when(col("__cw") === period,
          dec0(lit(period)) * col("x") - col("__sp")))
    val cut = Materialize.cut(ma)
    // per-weekday exact index numerators over detrended rows
    val idxs = cut.filter(col("__d").isNotNull)
      .groupBy(col("wd"))
      .agg(sum(col("__d")).as("sd"), count(lit(1)).as("cw"))
      .select(col("wd"),
        (col("sd").cast("double") /
          (col("cw").cast("double") * lit(period.toDouble))).as("s_raw"))
    // centering mean: a pinned fold over the ≤ p weekday indices
    val center = idxs
      .agg(sort_array(collect_list(struct(col("wd"), col("s_raw"))))
        .as("__l"))
      .select((aggregate(col("__l"), lit(0.0),
        (acc, e) => acc + e.getField("s_raw")) /
        size(col("__l")).cast("double")).as("__mu"))
    val seasoned = cut
      .join(broadcast(idxs), Seq("wd"), "left")
      .crossJoin(broadcast(center))
    seasoned.select(col("day"), col("x").cast("long").as("value"),
        when(col("__cw") === period,
          round(col("__sp").cast("double") / lit(period.toDouble), 6))
          .as("trend"),
        round(col("s_raw") - col("__mu"), 6).as("seasonal"),
        when(col("__cw") === period && col("s_raw").isNotNull,
          round(col("x").cast("double")
            - col("__sp").cast("double") / lit(period.toDouble)
            - (col("s_raw") - col("__mu")), 6)).as("residual"))
      .orderBy(col("day"))
  }

  def acf(series: DataFrame, step: Column, value: Column,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"need maxLag >= 1, got $maxLag")
    val v = Materialize.cut(
      series.select(step.as("__s"), dec0(value).as("__x")))
    val tot = v.agg(count(lit(1)).as("__m"), sum(col("__x")).as("__sum"))
    // centered-scaled value c_t = m·x_t − S: exact decimal
    val c = v.crossJoin(broadcast(tot))
      .select(col("__s"), col("__m"),
        (dec0(col("__m")) * col("__x") - col("__sum")).as("__c"))
    val den = c.agg(sum(col("__c") * col("__c")).as("__den"))
    val lags = c.sparkSession.range(1, maxLag + 1)
      .select(col("id").cast("int").as("lag"))
    val pairs = c.select(col("__s"), col("__c"))
      .crossJoin(broadcast(lags))
      .as("a")
      .join(c.select(col("__s").as("__s2"), col("__c").as("__c2")).as("b"),
        col("__s2") === date_add(col("a.__s"), col("lag")))
      .groupBy(col("lag"))
      .agg(sum(col("a.__c") * col("__c2")).as("__num"),
        count(lit(1)).as("n_pairs"))
    lags.join(pairs, Seq("lag"), "left")
      .crossJoin(broadcast(den))
      .select(col("lag"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        when(col("__num").isNotNull && col("__den").cast("double") > 0.0,
          round(col("__num").cast("double") / col("__den").cast("double"), 6))
          .as("acf"))
      .orderBy(col("lag"))
  }

  /** C104: Ljung–Box portmanteau test (Ljung & Box 1978) — "is the
    * series white noise" as ONE number over the first m
    * autocorrelations: Q = n(n+2)·Σ_{k=1..m} ρ̂_k²/(n−k), read against
    * chi-square with m dof. The standard residual diagnostic behind
    * C61/C65's forecasts and the formal companion to C88's visual
    * ACF: a single large ρ̂ or many small ones both push Q up.
    *
    * Rides [[acf]] unchanged (same one-scan day-series collapse, same
    * PrefixSum-free value-domain machinery); the m per-lag terms fold
    * over a SORTED collected list (lag order — one IEEE tree both
    * engines replay over the 6-dp-rounded acf values they already
    * agree on bit-for-bit). Lags with no pairs (null acf) are skipped
    * and m counts only the entering lags; n ≤ maxLag or a zero-
    * variance series publishes null.
    */
  def ljungBox(series: DataFrame, step: Column, value: Column,
               maxLag: Int): DataFrame = {
    val a = acf(series, step, value, maxLag)
    val n = series.agg(count(lit(1)).cast("long").as("n"))
    val nD = col("n").cast("double")
    // n rides the OUTER cross join so a degenerate series (every acf
    // null → zero term rows) still publishes the real series length,
    // matching the oracle's always-populated count CTE
    a.filter(col("acf").isNotNull).crossJoin(broadcast(n))
      .filter(col("n") > col("lag").cast("long"))
      .withColumn("__t",
        col("acf") * col("acf") / (nD - col("lag").cast("double")))
      .agg(count(lit(1)).cast("long").as("m"),
        sort_array(collect_list(struct(col("lag"), col("__t"))))
          .as("__l"))
      .crossJoin(broadcast(n))
      .select(col("n"), col("m"),
        when(col("m") > 0L, round(
          col("n").cast("double") * (col("n").cast("double") + 2.0)
            * aggregate(col("__l"), lit(0.0),
                (acc, e) => acc + e.getField("__t")), 6)).as("q_stat"),
        col("m").as("dof"))
  }

  /** C113: seasonal Mann–Kendall trend test (Hirsch, Slack & Smith
    * 1982) — C84 with the seasonal confound removed: S compares pairs
    * only WITHIN a season (same weekday here), so a strong weekly
    * cycle can't masquerade as (or mask) a monotone trend. S' = Σ_g
    * S_g and Var' = Σ_g Var_g because seasons are disjoint; the
    * continuity-corrected z reads as in C84.
    *
    * Same exactness/scale posture as C84: the caller collapses the
    * corpus to the calendar series; the pairwise census is per-season
    * m_g² over that tiny frame (smaller than C84's m² — the join key
    * includes the season); S, the tie census and Var all exact
    * integers, z one IEEE evaluation. Non-integral values fail the
    * job (the C84 contract).
    */
  def seasonalMannKendall(series: DataFrame, step: Column, value: Column,
                          season: Column): DataFrame = {
    val checked = when(
      value.cast("long").cast("double") === value.cast("double"),
      value.cast("long"))
      .otherwise(raise_error(concat(
        lit("seasonalMannKendall: non-integral value "),
        value.cast("string"),
        lit(" — scale the series to integers first"))))
    val v = Materialize.cut(series.select(season.cast("long").as("__g"),
      step.as("__s"), checked.as("__x")))
    val s = v.as("a")
      .join(v.as("b"),
        col("a.__g") === col("b.__g") && col("a.__s") < col("b.__s"))
      .agg(coalesce(sum(signum(
          col("b.__x").cast("double") - col("a.__x").cast("double"))
        .cast("long")), lit(0L)).as("s_stat"))
    val perG = v.groupBy(col("__g")).agg(count(lit(1)).as("m"))
    val tiesG = v.groupBy(col("__g"), col("__x"))
      .agg(count(lit(1)).as("t"))
      .filter(col("t") > 1L)
      .groupBy(col("__g"))
      .agg(sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L))
        .as("tie_term"))
    val vars = perG.join(tiesG, Seq("__g"), "left")
      .select((col("m") * (col("m") - 1L) * (lit(2L) * col("m") + 5L)
        - coalesce(col("tie_term"), lit(0L))).as("v18"), col("m"))
      .agg(count(lit(1)).cast("long").as("n_seasons"),
        coalesce(sum(col("m")), lit(0L)).cast("long").as("n_steps"),
        coalesce(sum(col("v18")), lit(0L)).cast("long").as("var18"))
    val joined = s.crossJoin(vars)
    val z = when(col("var18") <= 0L, lit(null).cast("double"))
      .otherwise(
        when(col("s_stat") > 0L, (col("s_stat") - 1L).cast("double"))
          .when(col("s_stat") < 0L, (col("s_stat") + 1L).cast("double"))
          .otherwise(lit(0.0))
        / sqrt(col("var18").cast("double") / lit(18.0)))
    joined.select(col("n_seasons"), col("n_steps"), col("s_stat"),
      col("var18"), round(z, 6).as("z_stat"),
      when(z.isNull, "undefined")
        .when(round(z, 6) > 1.96, "increasing")
        .when(round(z, 6) < -1.96, "decreasing")
        .otherwise("no_trend").as("trend"))
  }

  /** C118: turning-point test (Kendall 1973's randomness check) — a
    * point is a turning point when it is a STRICT local extremum of
    * its two neighbors; under randomness E[T] = 2(n−2)/3 and
    * Var[T] = (16n−29)/90. Too few turns = trend/momentum, too many =
    * oscillation — the local-shape companion to C95's runs test
    * (which sees signs, not shapes). Equal neighbors break strictness
    * and are simply not turns (the documented tie convention).
    *
    * CONTIGUITY CONTRACT: the step column must form a gapless daily
    * calendar (the neighbor attachment is day±1). On a gappy series
    * the interior census shrinks (n_interior < n−2) while E[T]/Var[T]
    * still use the full n, silently biasing z low — so z publishes
    * null unless n_interior = n−2, making gappy input fail loudly
    * instead of quietly (the C84 integrality-contract discipline).
    *
    * One scan collapses to the calendar day frame; the neighbor
    * attachment is a day±1 self-join (never a window); T exact
    * integer, z one IEEE evaluation. n < 3 publishes null.
    */
  def turningPointTest(series: DataFrame, step: Column,
                       value: Column): DataFrame = {
    val v = Materialize.cut(
      series.select(step.as("__s"), dec0(value).as("__x")))
    val mid = v.as("c")
      .join(v.select(col("__s").as("__sp"), col("__x").as("__xp")).as("p"),
        col("__s") === date_add(col("__sp"), 1))
      .join(v.select(col("__s").as("__sn"), col("__x").as("__xn")).as("nx"),
        col("__sn") === date_add(col("__s"), 1))
    val isTurn = (col("__x") > col("__xp") && col("__x") > col("__xn")) ||
      (col("__x") < col("__xp") && col("__x") < col("__xn"))
    val t = mid.agg(
      sum(when(isTurn, 1L).otherwise(0L)).cast("long").as("n_turns"),
      count(lit(1)).cast("long").as("n_interior"))
    val n = v.agg(count(lit(1)).cast("long").as("n"))
    val nD = col("n").cast("double")
    val e = lit(2.0) * (nD - 2.0) / 3.0
    val vr = (lit(16.0) * nD - 29.0) / 90.0
    t.crossJoin(broadcast(n))
      .select(col("n"), col("n_interior"), col("n_turns"),
        when(col("n") >= 3L && vr > 0.0 &&
            col("n_interior") === col("n") - 2L,
          round((col("n_turns").cast("double") - e) / sqrt(vr), 6))
          .as("z_stat"))
  }

  /** C119: Theil's U forecast-accuracy ratio (Theil 1966, U₂) for the
    * C61 Holt model — √(Σ(x_t − f_t)² / Σ(x_t − x_{t−1})²) over
    * one-step-ahead forecasts: U < 1 means the model BEATS the naive
    * "tomorrow = today" carry-forward, U ≥ 1 means the smoothing
    * adds nothing — the honesty check every published forecast needs
    * next to C61's point estimates.
    *
    * The Holt recursion and both error accumulators ride ONE in-plan
    * flat-list fold (the C88b accumulator discipline:
    * [l, b, prev_x, Σe², Σn²] — every step the identical IEEE tree in
    * both engines, α/(1−α) interpolated as Scala round-trip literals);
    * the corpus collapses to the calendar series upstream. Series
    * shorter than 3 (no naive error mass) publish null.
    */
  def theilU(series: DataFrame, step: Column, value: Column,
             alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta in [0,1], got $beta")
    val arr = series.agg(
      sort_array(collect_list(struct(step.as("__s"),
        value.cast("double").as("__v")))).as("__a"))
      .withColumn("__vals", transform(col("__a"), e => e.getField("__v")))
    val vals = col("__vals")
    // empty-series guard: under ANSI (on in Spark 4) a bare
    // element_at(vals, 1) on a zero-length series throws
    // INVALID_ARRAY_INDEX in the fold's init before the n>=3 output
    // guard can publish null — so every init slot that touches the
    // array is size-gated (the fold body only ever sees slots, never
    // the raw array, and the slice is already empty-safe)
    val first = when(size(vals) >= 1, element_at(vals, 1)).otherwise(lit(0.0))
    val init = array(
      first,
      when(size(vals) >= 2,
        element_at(vals, 2) - element_at(vals, 1)).otherwise(lit(0.0)),
      first, lit(0.0), lit(0.0))
    val state = aggregate(
      slice(vals, lit(2), greatest(size(vals) - lit(1), lit(0))),
      init,
      (acc, x) => {
        val f = element_at(acc, 1) + element_at(acc, 2)
        val se = element_at(acc, 4) + (x - f) * (x - f)
        val sn = element_at(acc, 5) +
          (x - element_at(acc, 3)) * (x - element_at(acc, 3))
        val newl = lit(alpha) * x + lit(1.0 - alpha) * f
        val newb = lit(beta) * (newl - element_at(acc, 1)) +
          lit(1.0 - beta) * element_at(acc, 2)
        array(newl, newb, x, se, sn)
      })
    arr.select(size(vals).cast("long").as("n"), {
        val se = element_at(state, 4); val sn = element_at(state, 5)
        when(size(vals) >= 3 && sn > 0.0,
          round(sqrt(se / sn), 6)).as("theil_u")
      },
      round(element_at(state, 4), 6).as("sse_model"),
      round(element_at(state, 5), 6).as("sse_naive"))
  }

  /** C106: Granger-causality F test at lag 1 (Granger 1969) — "does
    * yesterday's y help predict today's x beyond yesterday's x",
    * the directional companion to C78's symmetric lead-lag
    * correlation: F = (RSS_r − RSS_u)/(RSS_u/(n−3)) compares the
    * restricted AR(1) against the model with y_{t−1} added, read
    * against F(1, n−3).
    *
    * Both OLS fits collapse to CLOSED FORMS over nine exact sufficient
    * sums (n, Σx, Σx², Σx_l, Σx_l², Σy_l, Σy_l², Σx·x_l, Σx·y_l,
    * Σx_l·y_l — decimal-exact), Cramer's rule on the 2×2 normal
    * equations: RSS_r = Cxx − Cxl²/Cll and RSS_u = Cxx − (β₁Cxl +
    * β₂Cxy) with β from (Cll, Cly, Cyy) — ONE IEEE tree end to end,
    * engine-replayable. Degenerate inputs (n ≤ 3, constant x_lag or
    * singular normal matrix, zero residual) publish null F.
    *
    * Scale shape: the caller's corpus scan collapses to the calendar
    * day series; the lag attachment is one self-join on day+1 over
    * that tiny frame; the sums are one scalar partial-agg merge.
    */
  def grangerLag1(series: DataFrame, step: Column, x: Column,
                  y: Column): DataFrame = {
    val s = Materialize.cut(series.select(step.as("__s"),
      dec0(x).as("__x"), dec0(y).as("__y")))
    val lagged = s.as("t")
      .join(s.select(col("__s").as("__sp"), col("__x").as("__xl"),
          col("__y").as("__yl")).as("p"),
        col("__s") === date_add(col("__sp"), 1))
    val a = lagged.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("__x")).as("sx"), sum(col("__x") * col("__x")).as("sxx"),
      sum(col("__xl")).as("sl"), sum(col("__xl") * col("__xl")).as("sll"),
      sum(col("__yl")).as("sy"), sum(col("__yl") * col("__yl")).as("syy"),
      sum(col("__x") * col("__xl")).as("sxl"),
      sum(col("__x") * col("__yl")).as("sxy"),
      sum(col("__xl") * col("__yl")).as("sly"))
    val nD = col("n").cast("double")
    def d(c: String): Column = col(c).cast("double")
    val cxx = d("sxx") - d("sx") * d("sx") / nD
    val cll = d("sll") - d("sl") * d("sl") / nD
    val cyy = d("syy") - d("sy") * d("sy") / nD
    val cxl = d("sxl") - d("sx") * d("sl") / nD
    val cxy = d("sxy") - d("sx") * d("sy") / nD
    val cly = d("sly") - d("sl") * d("sy") / nD
    val det = cll * cyy - cly * cly
    val rssR = cxx - cxl * cxl / cll
    val b1 = (cxl * cyy - cxy * cly) / det
    val b2 = (cxy * cll - cxl * cly) / det
    val rssU = cxx - (b1 * cxl + b2 * cxy)
    val ok = col("n") > 3L && cll > 0.0 && det > 0.0 && rssU > 0.0
    a.select(col("n"),
      when(ok, round(b2, 6)).as("beta_ylag"),
      when(ok, round((rssR - rssU) / (rssU / (nD - 3.0)), 6)).as("f_stat"),
      lit(1L).as("df1"), (col("n") - 3L).as("df2"))
  }

  /** C105: Hurst exponent by rescaled-range analysis (Hurst 1951;
    * Mandelbrot & Wallis 1969) over the dyadic window ladder
    * {8,16,32,64} — the long-range-dependence readout: H ≈ 0.5 is
    * memoryless, H > 0.5 persistent (trends compound), H < 0.5
    * anti-persistent (mean-reverting). The capacity-planning number
    * behind E10's peak concurrency: persistent load aggregates far
    * worse than Poisson.
    *
    * Exactness: the series indexes by rank (gaps close up — the
    * standard practical convention); within each window, the
    * deviation cumsum in w-SCALED form Z'_t = w·P_t − t'·S1 is an
    * exact decimal (P the within-block prefix sum), so R_scaled =
    * max(Z')−min(Z') is exact, and w²·S² = w·S2 − S1² is exact ⇒
    * R/S = R_scaled/√(w·S2−S1²) is ONE sqrt + ONE divide per block.
    * Per size, block R/S values quantize to 1e-9 (nonnegative ⇒
    * HALF_UP ≡ half-away-from-zero) and sum as exact integers; the
    * 4-point log-log regression collapses to the closed form
    * H = (−1.5·y₈ − 0.5·y₁₆ + 0.5·y₃₂ + 1.5·y₆₄)/(5·ln2) because the
    * ladder is dyadic (x_k = k·ln2, Σ(k−x̄)² = 5).
    *
    * Scale shape: the input is an already-collapsed series (the
    * caller's one corpus scan); every window here partitions by
    * (size, block) over ≤64-row frames except the rank index, whose
    * single-partition window is CALENDAR-BOUNDED (the series is
    * per-hour/per-day by construction). Constant blocks (zero
    * variance) drop; a size with zero surviving blocks nulls H.
    */
  def hurst(series: DataFrame, step: Column, value: Column): DataFrame = {
    val sizes = Seq(8, 16, 32, 64)
    val idx = series
      .select(step.as("__s"), dec0(value).as("__x"))
      .withColumn("__t",
        row_number().over(Window.orderBy(col("__s"))).cast("long"))
    val sz = idx.sparkSession.range(0, sizes.length)
      .select(col("id").cast("int").as("__i"))
      .withColumn("__w", element_at(
        array(sizes.map(s => lit(s)): _*), col("__i") + 1))
    val blocks = idx.crossJoin(broadcast(sz))
      .withColumn("__b", ((col("__t") - 1L) / col("__w").cast("long"))
        .cast("long"))
      .withColumn("__p", (col("__t") - 1L) % col("__w").cast("long") + 1L)
    val win = Window.partitionBy(col("__w"), col("__b"))
      .orderBy(col("__t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = blocks
      .withColumn("__pre", sum(col("__x")).over(win))
      .withColumn("__z",
        dec0(col("__w")) * col("__pre") - dec0(col("__p")) *
          sum(col("__x")).over(Window.partitionBy(col("__w"), col("__b"))))
    val per = cum.groupBy(col("__w"), col("__b"))
      .agg(count(lit(1)).as("__cnt"),
        sum(col("__x")).as("__s1"),
        sum(col("__x") * col("__x")).as("__s2"),
        max(col("__z")).as("__zmax"), min(col("__z")).as("__zmin"))
      .filter(col("__cnt") === col("__w").cast("long"))
      .withColumn("__nex",
        dec0(col("__w")) * col("__s2") - col("__s1") * col("__s1"))
      .filter(col("__nex").cast("double") > 0.0)
      .withColumn("__nano", round(
        (col("__zmax") - col("__zmin")).cast("double")
          / sqrt(col("__nex").cast("double")) * lit(1e9), 0).cast("long"))
    val bySize = per.groupBy(col("__w"))
      .agg(count(lit(1)).cast("long").as("nb"),
        sum(col("__nano")).cast("long").as("ns"))
    val oneCols = sizes.map(w => sum(when(col("__w") === w, col("nb")))
        .cast("long").as(s"nb_$w")) ++
      sizes.map(w => sum(when(col("__w") === w, col("ns")))
        .cast("long").as(s"ns_$w"))
    val one = bySize.agg(oneCols.head, oneCols.tail: _*)
    def avgRs(w: Int): Column =
      col(s"ns_$w").cast("double") / col(s"nb_$w").cast("double") / lit(1e9)
    val ok = sizes.map(w => col(s"nb_$w") > 0L).reduce(_ && _)
    val LN2 = 0.6931471805599453
    val h = (lit(-1.5) * log(avgRs(8)) - lit(0.5) * log(avgRs(16))
      + lit(0.5) * log(avgRs(32))
      + lit(1.5) * log(avgRs(64))) / (lit(5.0) * lit(LN2))
    val nTot = idx.agg(count(lit(1)).cast("long").as("n_obs"))
    one.crossJoin(broadcast(nTot)).select(
      Seq(col("n_obs")) ++
      sizes.map(w => coalesce(col(s"nb_$w"), lit(0L)).as(s"n_blocks_$w")) ++
      sizes.map(w => when(col(s"nb_$w") > 0L,
        round(avgRs(w), 6)).as(s"rs_$w")) ++
      Seq(when(ok, round(h, 6)).as("hurst")): _*)
  }
}
