package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Shared DuckDB-oracle SQL builders (split from SparkEntry): decimal
  * conventions, the XXH64 replay, LSH hyperplanes, per-operator
  * parameterized oracle generators. `private[graft]` so the four
  * OracleSql* parts and [[SparkEntry.dynamicOracleSql]] import them.
  */
private[graft] object OracleFns {

  /** C82 oracle — mirrors [[graft.operators.AbStats.sprtMonitor]]'s
    * plan-literal discipline: the ln step constants and Wald bounds
    * are interpolated as Scala's round-trip double repr, so both
    * engines multiply the SAME bits.
    */
  private[graft] def sprtOracle(p0: Double, p1: Double,
                                alpha: Double, beta: Double): String = {
    def d(x: Double) = s"CAST('$x' AS DOUBLE)"
    val lrConv = d(math.log(p1 / p0))
    val lrMiss = d(math.log((1 - p1) / (1 - p0)))
    val upper = d(math.log((1 - beta) / alpha))
    val lower = d(math.log(beta / (1 - alpha)))
    val llr = s"round(CAST(cum_k AS DOUBLE) * $lrConv" +
      s" + CAST(cum_n - cum_k AS DOUBLE) * $lrMiss, 6)"
    s"""WITH dly AS (
       |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       |    CAST(COUNT(*) AS BIGINT) AS trials,
       |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS conversions
       |  FROM events GROUP BY 1),
       |c AS (
       |  SELECT day, trials, conversions,
       |    CAST(SUM(trials) OVER (ORDER BY day) AS BIGINT) AS cum_n,
       |    CAST(SUM(conversions) OVER (ORDER BY day) AS BIGINT) AS cum_k
       |  FROM dly)
       |SELECT day, trials, conversions, cum_n, cum_k,
       |  $llr AS llr,
       |  CASE WHEN $llr >= $upper THEN 'accept_h1'
       |       WHEN $llr <= $lower THEN 'accept_h0'
       |       ELSE 'continue' END AS decision
       |FROM c ORDER BY day""".stripMargin
  }

  /** C85 oracle — mirrors [[graft.operators.AbStats.msprtMonitor]]:
    * the per-grid-point ln step constants, the uniform mixture weight,
    * and the rejection line are interpolated as Scala's round-trip
    * double repr; the logsumexp is spelled with the SAME association
    * (greatest → per-term exp(t−mx) summed left-to-right) so both
    * engines evaluate the identical expression tree.
    */
  private[graft] def msprtOracle(p0: Double, grid: Seq[Double],
                                 alpha: Double): String = {
    def d(x: Double) = s"CAST('$x' AS DOUBLE)"
    val terms = grid.map { p =>
      val a = d(math.log(p / p0))
      val b = d(math.log((1 - p) / (1 - p0)))
      s"CAST(cum_k AS DOUBLE) * $a + CAST(cum_n - cum_k AS DOUBLE) * $b"
    }
    val lnW = d(math.log(1.0 / grid.size))
    val rejectLine = d(math.log(1.0 / alpha))
    val ts = terms.zipWithIndex
      .map { case (t, j) => s"$t AS t$j" }.mkString(",\n    ")
    val mx = s"greatest(${terms.indices.map(j => s"t$j").mkString(", ")})"
    val sumExp = terms.indices.map(j => s"exp(t$j - mx)").mkString(" + ")
    s"""WITH dly AS (
       |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       |    CAST(COUNT(*) AS BIGINT) AS trials,
       |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS conversions
       |  FROM events GROUP BY 1),
       |c AS (
       |  SELECT day, trials, conversions,
       |    CAST(SUM(trials) OVER (ORDER BY day) AS BIGINT) AS cum_n,
       |    CAST(SUM(conversions) OVER (ORDER BY day) AS BIGINT) AS cum_k
       |  FROM dly),
       |t AS (SELECT *,
       |    $ts
       |  FROM c),
       |m AS (SELECT *, $mx AS mx FROM t),
       |l AS (SELECT day, trials, conversions, cum_n, cum_k,
       |    round($lnW + mx + ln($sumExp), 6) AS log_mlr
       |  FROM m),
       |r AS (SELECT *, MAX(log_mlr) OVER (ORDER BY day) AS peak FROM l)
       |SELECT day, trials, conversions, cum_n, cum_k, log_mlr,
       |  round(CASE WHEN exp(-peak) > 1.0 THEN 1.0 ELSE exp(-peak) END, 6)
       |    AS p_value,
       |  CASE WHEN peak >= $rejectLine THEN 'reject_h0'
       |       ELSE 'continue' END AS decision
       |FROM r ORDER BY day""".stripMargin
  }

  /** C86 oracle — mirrors [[graft.operators.AbStats.obfMonitor]]: the
    * look schedule is multiplication-only integer arithmetic (r·K ≥
    * D·k and (r−1)·K < D·k — no division in either engine), the
    * critical constant and K enter as round-trip double literals, and
    * the decision compares the 6-dp ROUNDED z/bound like the plan.
    */
  private[graft] def obfOracle(looks: Int, critical: Double): String = {
    def d(x: Double) = s"CAST('$x' AS DOUBLE)"
    // CASE checks k ascending — the smallest matching look wins when
    // D < K makes schedules coincide, same as the plan's fold order
    val lookCase = (1 to looks).map(k =>
      s"WHEN r * $looks >= d * $k AND (r - 1) * $looks < d * $k THEN $k")
      .mkString("CASE ", " ", " END")
    val pp = "(CAST(cum_k0 + cum_k1 AS DOUBLE) / CAST(cum_n0 + cum_n1 AS DOUBLE))"
    val se2 = s"($pp * (1.0 - $pp) * (1.0 / CAST(cum_n0 AS DOUBLE)" +
      " + 1.0 / CAST(cum_n1 AS DOUBLE)))"
    val zExpr = s"round((CAST(cum_k1 AS DOUBLE) / CAST(cum_n1 AS DOUBLE)" +
      s" - CAST(cum_k0 AS DOUBLE) / CAST(cum_n0 AS DOUBLE)) / sqrt($se2), 6)"
    s"""WITH dly AS (
       |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS t0,
       |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS k0,
       |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS t1,
       |    CAST(SUM(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS k1
       |  FROM events GROUP BY 1),
       |c AS (
       |  SELECT day,
       |    CAST(SUM(t0) OVER w AS BIGINT) AS cum_n0,
       |    CAST(SUM(k0) OVER w AS BIGINT) AS cum_k0,
       |    CAST(SUM(t1) OVER w AS BIGINT) AS cum_n1,
       |    CAST(SUM(k1) OVER w AS BIGINT) AS cum_k1,
       |    ROW_NUMBER() OVER (ORDER BY day) AS r,
       |    COUNT(*) OVER () AS d
       |  FROM dly
       |  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
       |    AND CURRENT ROW)),
       |l AS (SELECT *, $lookCase AS look FROM c),
       |f AS (SELECT CAST(look AS INTEGER) AS look, day,
       |    cum_n0, cum_k0, cum_n1, cum_k1,
       |    CASE WHEN cum_n0 > 0 AND cum_n1 > 0 AND $se2 > 0.0
       |      THEN $zExpr END AS z_stat,
       |    round(${d(critical)}
       |      * sqrt(${d(looks.toDouble)} / CAST(look AS DOUBLE)), 6) AS bound
       |  FROM l WHERE look IS NOT NULL),
       |x AS (SELECT *,
       |    CASE WHEN abs(COALESCE(z_stat, 0.0)) >= bound THEN 1 ELSE 0 END
       |      AS xed
       |  FROM f),
       |p AS (SELECT *, COALESCE(SUM(xed) OVER (ORDER BY look
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
       |  FROM x)
       |SELECT look, day, cum_n0, cum_k0, cum_n1, cum_k1, z_stat, bound,
       |  CASE WHEN prior > 0 THEN 'stopped'
       |       WHEN xed = 1 THEN 'reject_h0'
       |       ELSE 'continue' END AS decision
       |FROM p ORDER BY look""".stripMargin
  }

  /** C121 oracle — mirrors
    * [[graft.operators.AbStats.alphaSpendingMonitor]]: the boundaries
    * and per-look cumulative spend come from the SAME
    * [[graft.operators.AlphaSpending]] recursion the plan embeds (a
    * pure function of the design constants), interpolated as
    * round-trip double literals; the percent-fraction look schedule
    * is multiplication-only integer arithmetic like C86's.
    */
  private[graft] def alphaSpendingOracle(fracPct: Seq[Int],
                                         bounds: Seq[Double],
                                         spends: Seq[Double],
                                         infoFracs: Seq[Double] = null)
      : String = {
    def d(x: Double) = s"CAST('$x' AS DOUBLE)"
    val looks = fracPct.size
    // CASE checks k ascending — smallest matching look wins on
    // coincident schedules, same as the plan's fold order
    val lookCase = (1 to looks).map { k =>
      val p = fracPct(k - 1)
      s"WHEN r * 100 >= d * $p AND (r - 1) * 100 < d * $p THEN $k"
    }.mkString("CASE ", " ", " END")
    val boundCase = (1 to looks)
      .map(k => s"WHEN $k THEN ${d(bounds(k - 1))}")
      .mkString("CASE look ", " ", " END")
    val spentCase = (1 to looks)
      .map(k => s"WHEN $k THEN ${d(spends(k - 1))}")
      .mkString("CASE look ", " ", " END")
    // C123: the observed-information literal column (same 6-dp
    // round-trip values the plan embeds); absent for calendar designs
    val infoSel =
      if (infoFracs == null) ""
      else (1 to looks)
        .map(k => s"WHEN $k THEN ${d(infoFracs(k - 1))}")
        .mkString(",\n    CASE look ", " ", " END AS info_frac")
    val pp = "(CAST(cum_k0 + cum_k1 AS DOUBLE) / CAST(cum_n0 + cum_n1 AS DOUBLE))"
    val se2 = s"($pp * (1.0 - $pp) * (1.0 / CAST(cum_n0 AS DOUBLE)" +
      " + 1.0 / CAST(cum_n1 AS DOUBLE)))"
    val zExpr = s"round((CAST(cum_k1 AS DOUBLE) / CAST(cum_n1 AS DOUBLE)" +
      s" - CAST(cum_k0 AS DOUBLE) / CAST(cum_n0 AS DOUBLE)) / sqrt($se2), 6)"
    s"""WITH dly AS (
       |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS t0,
       |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS k0,
       |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS t1,
       |    CAST(SUM(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS k1
       |  FROM events GROUP BY 1),
       |c AS (
       |  SELECT day,
       |    CAST(SUM(t0) OVER w AS BIGINT) AS cum_n0,
       |    CAST(SUM(k0) OVER w AS BIGINT) AS cum_k0,
       |    CAST(SUM(t1) OVER w AS BIGINT) AS cum_n1,
       |    CAST(SUM(k1) OVER w AS BIGINT) AS cum_k1,
       |    ROW_NUMBER() OVER (ORDER BY day) AS r,
       |    COUNT(*) OVER () AS d
       |  FROM dly
       |  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
       |    AND CURRENT ROW)),
       |l AS (SELECT *, $lookCase AS look FROM c),
       |f AS (SELECT CAST(look AS INTEGER) AS look, day,
       |    cum_n0, cum_k0, cum_n1, cum_k1,
       |    CASE WHEN cum_n0 > 0 AND cum_n1 > 0 AND $se2 > 0.0
       |      THEN $zExpr END AS z_stat,
       |    $boundCase AS bound,
       |    $spentCase AS alpha_spent$infoSel
       |  FROM l WHERE look IS NOT NULL),
       |x AS (SELECT *,
       |    CASE WHEN abs(COALESCE(z_stat, 0.0)) >= bound THEN 1 ELSE 0 END
       |      AS xed
       |  FROM f),
       |p AS (SELECT *, COALESCE(SUM(xed) OVER (ORDER BY look
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
       |  FROM x)
       |SELECT look, day, cum_n0, cum_k0, cum_n1, cum_k1, z_stat, bound,
       |  alpha_spent,${if (infoFracs == null) "" else " info_frac,"}
       |  CASE WHEN prior > 0 THEN 'stopped'
       |       WHEN xed = 1 THEN 'reject_h0'
       |       ELSE 'continue' END AS decision
       |FROM p ORDER BY look""".stripMargin
  }

  /** C122 oracle — mirrors
    * [[graft.operators.AbStats.betaSpendingMonitor]]: every design
    * constant (one-sided efficacy bounds, futility bounds, cumulative
    * α/β spend, the powered drift) comes from the SAME memoized
    * [[graft.operators.AlphaSpending.futilityBounds]] recursion the
    * plan embeds, as round-trip literals. The decision is one-sided
    * with a NULL-inert z: z ≥ u rejects, else z ≤ l stops for
    * futility (`z < bound AND z <= futility_bound` — the plan's
    * `__xu === 0` guard), a NULL z decides nothing.
    */
  private[graft] def betaSpendingOracle(
      fracPct: Seq[Int],
      design: graft.operators.AlphaSpending.FutilityDesign): String = {
    def d(x: Double) = s"CAST('$x' AS DOUBLE)"
    val looks = fracPct.size
    val lookCase = (1 to looks).map { k =>
      val p = fracPct(k - 1)
      s"WHEN r * 100 >= d * $p AND (r - 1) * 100 < d * $p THEN $k"
    }.mkString("CASE ", " ", " END")
    def perLook(vals: Seq[Double]) = (1 to looks)
      .map(k => s"WHEN $k THEN ${d(vals(k - 1))}")
      .mkString("CASE look ", " ", " END")
    val pp = "(CAST(cum_k0 + cum_k1 AS DOUBLE) / CAST(cum_n0 + cum_n1 AS DOUBLE))"
    val se2 = s"($pp * (1.0 - $pp) * (1.0 / CAST(cum_n0 AS DOUBLE)" +
      " + 1.0 / CAST(cum_n1 AS DOUBLE)))"
    val zExpr = s"round((CAST(cum_k1 AS DOUBLE) / CAST(cum_n1 AS DOUBLE)" +
      s" - CAST(cum_k0 AS DOUBLE) / CAST(cum_n0 AS DOUBLE)) / sqrt($se2), 6)"
    s"""WITH dly AS (
       |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS t0,
       |    CAST(SUM(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS k0,
       |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS t1,
       |    CAST(SUM(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
       |      THEN 1 ELSE 0 END) AS BIGINT) AS k1
       |  FROM events GROUP BY 1),
       |c AS (
       |  SELECT day,
       |    CAST(SUM(t0) OVER w AS BIGINT) AS cum_n0,
       |    CAST(SUM(k0) OVER w AS BIGINT) AS cum_k0,
       |    CAST(SUM(t1) OVER w AS BIGINT) AS cum_n1,
       |    CAST(SUM(k1) OVER w AS BIGINT) AS cum_k1,
       |    ROW_NUMBER() OVER (ORDER BY day) AS r,
       |    COUNT(*) OVER () AS d
       |  FROM dly
       |  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
       |    AND CURRENT ROW)),
       |l AS (SELECT *, $lookCase AS look FROM c),
       |f AS (SELECT CAST(look AS INTEGER) AS look, day,
       |    cum_n0, cum_k0, cum_n1, cum_k1,
       |    CASE WHEN cum_n0 > 0 AND cum_n1 > 0 AND $se2 > 0.0
       |      THEN $zExpr END AS z_stat,
       |    ${perLook(design.upper)} AS bound,
       |    ${perLook(design.lower)} AS futility_bound,
       |    ${perLook(design.alphaSpent)} AS alpha_spent,
       |    ${perLook(design.betaSpent)} AS beta_spent,
       |    ${d(design.drift)} AS powered_drift
       |  FROM l WHERE look IS NOT NULL),
       |x AS (SELECT *,
       |    CASE WHEN z_stat IS NOT NULL AND z_stat >= bound
       |      THEN 1 ELSE 0 END AS xu,
       |    CASE WHEN z_stat IS NOT NULL AND z_stat < bound
       |      AND z_stat <= futility_bound THEN 1 ELSE 0 END AS xl
       |  FROM f),
       |p AS (SELECT *, COALESCE(SUM(xu + xl) OVER (ORDER BY look
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
       |  FROM x)
       |SELECT look, day, cum_n0, cum_k0, cum_n1, cum_k1, z_stat, bound,
       |  futility_bound, alpha_spent, beta_spent, powered_drift,
       |  CASE WHEN prior > 0 THEN 'stopped'
       |       WHEN xu = 1 THEN 'reject_h0'
       |       WHEN xl = 1 THEN 'stop_futility'
       |       ELSE 'continue' END AS decision
       |FROM p ORDER BY look""".stripMargin
  }

  /** C92 oracle — mirrors [[graft.operators.AbStats.yuenTrimmed]]:
    * per-arm value-domain cumulatives, conditional-MIN order
    * statistics, the exact inner-portion rank slice, HUGEINT trimmed
    * and winsorized sums, and the Yuen finisher mirrored
    * parenthesis-for-parenthesis.
    */
  private[graft] def yuenOracle(trimDen: Int): String = {
    def armCtes(arm: Int, t: String) = {
      val inner = "GREATEST(0, LEAST(cum, n - k) - GREATEST(cum - c, k))"
      s"""g$t AS (SELECT v, COUNT(*) AS c FROM p WHERE arm = $arm
         |  GROUP BY v),
         |c$t AS (SELECT v, c, CAST(SUM(c) OVER (ORDER BY v) AS BIGINT)
         |    AS cum FROM g$t),
         |t$t AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n
         |  FROM g$t),
         |w$t AS (SELECT c$t.v, c$t.c, c$t.cum, t$t.n,
         |    CAST(t$t.n // $trimDen AS BIGINT) AS k
         |  FROM c$t CROSS JOIN t$t),
         |s$t AS (SELECT MAX(n) AS n_$t, MAX(k) AS k_$t,
         |    MIN(CASE WHEN cum >= k + 1 THEN v END) AS lo_$t,
         |    MIN(CASE WHEN cum >= n - k THEN v END) AS hi_$t,
         |    SUM(CAST(v AS HUGEINT) * CAST($inner AS HUGEINT)) AS ts_$t,
         |    SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)
         |      * CAST($inner AS HUGEINT)) AS tq_$t,
         |    CAST(COALESCE(SUM($inner), 0) AS BIGINT) AS h_$t
         |  FROM w$t)""".stripMargin
    }
    def legExprs(t: String) = {
      val sw = s"CAST(CAST(k_$t AS HUGEINT) * lo_$t + ts_$t" +
        s" + CAST(k_$t AS HUGEINT) * hi_$t AS DOUBLE)"
      val sw2 = s"CAST(CAST(k_$t AS HUGEINT) * lo_$t * lo_$t + tq_$t" +
        s" + CAST(k_$t AS HUGEINT) * hi_$t * hi_$t AS DOUBLE)"
      val n = s"CAST(n_$t AS DOUBLE)"; val h = s"CAST(h_$t AS DOUBLE)"
      val tm = s"CASE WHEN h_$t > 0 THEN CAST(ts_$t AS DOUBLE) / $h END"
      val d = s"CASE WHEN h_$t >= 2 THEN ($sw2 - $sw * $sw / $n)" +
        s" / ($h * ($h - 1.0)) END"
      (tm, d, h)
    }
    val (tma, da, ha) = legExprs("a")
    val (tmb, db, hb) = legExprs("b")
    s"""WITH p AS (SELECT user_id % 2 AS arm,
       |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
       |  FROM events WHERE event_type = 'purchase'),
       |${armCtes(0, "a")},
       |${armCtes(1, "b")},
       |f AS (SELECT * FROM sa CROSS JOIN sb),
       |l AS (SELECT n_a, n_b, h_a, h_b,
       |    $tma AS tma, $tmb AS tmb, $da AS da, $db AS db
       |  FROM f)
       |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       |  h_a, h_b,
       |  round(tma, 6) AS tmean_a, round(tmb, 6) AS tmean_b,
       |  CASE WHEN h_a >= 2 AND h_b >= 2 AND da + db > 0.0 THEN
       |    round((tmb - tma) / sqrt(da + db), 6) END AS t_stat,
       |  CASE WHEN h_a >= 2 AND h_b >= 2 AND da + db > 0.0 THEN
       |    round(1.0 / ((da / (da + db)) * (da / (da + db))
       |        / (CAST(h_a AS DOUBLE) - 1.0)
       |      + (1.0 - da / (da + db)) * (1.0 - da / (da + db))
       |        / (CAST(h_b AS DOUBLE) - 1.0)), 6) END AS df
       |FROM l""".stripMargin
  }

  /** Shared by `benford_audit` and its E28 stream face
    * `stream_benford` — digit counts are additive, one SQL proves
    * both.
    */
  private[graft] val benfordSql: String = {
    val e = (1 to 9).map(d =>
      s"WHEN digit = $d THEN CAST(${math.log10(1.0 + 1.0 / d)} AS DOUBLE)")
      .mkString(" ")
    s"""WITH c AS (SELECT CAST(substr(CAST(
       |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
       |    AS VARCHAR), 1, 1) AS INTEGER) AS digit
       |  FROM lineitem),
       |g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM c
       |  WHERE digit >= 1 GROUP BY 1),
       |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM g),
       |x AS (SELECT digit, n, tot, CASE $e END AS pe
       |  FROM g CROSS JOIN t)
       |SELECT digit, n, round(pe, 6) AS p_expected,
       |  round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS p_observed,
       |  round(pow(CAST(n AS DOUBLE) - CAST(tot AS DOUBLE) * pe, 2)
       |    / (CAST(tot AS DOUBLE) * pe), 6) AS chi2_term
       |FROM x ORDER BY digit""".stripMargin
  }

  /** Shared by `value_acf` and its E27 stream face
    * `stream_value_acf` — the per-day decimal sums are additive, so
    * the merged stream cells equal the batch day series exactly and
    * one SQL proves both.
    */
  private[graft] def valueAcfSqlFor(maxLag: Int): String =
    s"""WITH dly AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100
      |      AS HUGEINT) AS cents
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |t AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m, SUM(cents) AS s
      |  FROM dly),
      |c AS (SELECT day, m * cents - s AS cv FROM dly CROSS JOIN t),
      |den AS (SELECT SUM(cv * cv) AS dn FROM c),
      |lags AS (SELECT CAST(unnest(range(1, ${maxLag + 1})) AS INTEGER)
      |  AS lag),
      |pairs AS (
      |  SELECT l.lag, SUM(a.cv * b.cv) AS num,
      |    CAST(COUNT(*) AS BIGINT) AS n_pairs
      |  FROM c a CROSS JOIN lags l JOIN c b ON b.day = a.day + l.lag
      |  GROUP BY l.lag)
      |SELECT lag, CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs,
      |  CASE WHEN num IS NOT NULL AND CAST(dn AS DOUBLE) > 0.0
      |    THEN round(CAST(num AS DOUBLE) / CAST(dn AS DOUBLE), 6)
      |  END AS acf
      |FROM lags LEFT JOIN pairs USING (lag) CROSS JOIN den
      |ORDER BY lag""".stripMargin

  private[graft] val valueAcfSql: String = valueAcfSqlFor(10)

  /** C109 oracle pieces — mirror
    * [[graft.operators.AbStats.moodMedian]]'s fixed-arm-order 2×k χ²
    * fold: per arm (aᵢ−eₐ)²/eₐ + ((nᵢ−aᵢ)−e_b)²/e_b with
    * eₐ = nᵢ·A/N, e_b = nᵢ·(N−A)/N — the Scala `reduce(_ + _)` tree
    * rendered textually, every operand an exact integer until the
    * divides.
    */
  private def moodTot(k: Int, pre: String): String =
    (0 until k).map(i => s"${pre}_$i")
      .reduce((a, b) => s"($a + $b)")
  private[graft] def moodOk(k: Int): String =
    ((0 until k).map(i => s"n_$i > 0") :+
      s"${moodTot(k, "a")} > 0 AND ${moodTot(k, "a")} < ${moodTot(k, "n")}")
      .mkString(" AND ")
  private[graft] def moodChi2(k: Int): String = {
    val nT = s"CAST(${moodTot(k, "n")} AS DOUBLE)"
    val aT = s"CAST(${moodTot(k, "a")} AS DOUBLE)"
    (0 until k).map { i =>
      val ni = s"CAST(n_$i AS DOUBLE)"
      val ai = s"CAST(a_$i AS DOUBLE)"
      val ea = s"$ni * $aT / $nT"
      val eb = s"$ni * ($nT - $aT) / $nT"
      s"""(($ai - $ea) * ($ai - $ea) / ($ea)
         |    + (($ni - $ai) - $eb) * (($ni - $ai) - $eb) / ($eb))"""
        .stripMargin
    }.reduce((a, b) => s"($a\n  + $b)")
  }

  /** D126 oracle — shared verbatim by `pii_density_by_source` and the
    * E32 stream face (stream ≡ batch on the merged additive
    * counters): embedded-marker censuses exact integers, each rate
    * one IEEE divide.
    */
  private[graft] val piiDensitySql: String =
    """WITH e AS (SELECT source,
      |    text || (CASE WHEN doc_id % 3 = 0
      |      THEN ' contact user' || CAST(doc_id AS VARCHAR)
      |        || '@example.com' ELSE '' END)
      |      || (CASE WHEN doc_id % 5 = 0
      |      THEN ' tel ' || lpad(CAST((doc_id * 7919 + 13) % 10000000
      |        AS VARCHAR), 7, '0') ELSE '' END) AS emb
      |  FROM documents),
      |p AS (SELECT source,
      |    CAST(CASE WHEN len(trim(emb)) > 0
      |      THEN len(string_split_regex(trim(emb), '\s+'))
      |      ELSE 0 END AS BIGINT) AS tok,
      |    CAST(len(regexp_extract_all(emb, '[a-z0-9.]+@[a-z0-9.]+'))
      |      AS BIGINT) AS em,
      |    CAST(len(regexp_extract_all(emb, '[0-9]{7,}')) AS BIGINT)
      |      AS dg
      |  FROM e),
      |a AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(tok) AS BIGINT) AS n_tokens,
      |    CAST(SUM(em) AS BIGINT) AS email_hits,
      |    CAST(SUM(dg) AS BIGINT) AS digit_run_hits
      |  FROM p GROUP BY 1)
      |SELECT source, n_docs, n_tokens, email_hits, digit_run_hits,
      |  CASE WHEN n_tokens > 0 THEN round(
      |    CAST(email_hits AS DOUBLE) * 1000.0
      |      / CAST(n_tokens AS DOUBLE), 6) END AS emails_per_1k,
      |  CASE WHEN n_tokens > 0 THEN round(
      |    CAST(digit_run_hits AS DOUBLE) * 1000.0
      |      / CAST(n_tokens AS DOUBLE), 6) END AS digit_runs_per_1k
      |FROM a ORDER BY source""".stripMargin

  /** C114 oracle — shared verbatim by `ab_anderson_darling` and the
    * E34 stream face (stream ≡ batch on the merged additive
    * per-(value, arm) counts).
    */
  private[graft] val adKSql: String = {
      val b2 = "(cum * 2 - c)"
      val den = s"(n * ($b2 * n * 2 - $b2 * $b2 - n * c))"
      def nano(i: Int): String = {
        val m2 = s"(cum$i * 2 - c$i)"
        val num = s"(c * (n * $m2 - n_$i * $b2) * (n * $m2 - n_$i * $b2))"
        s"""CAST(SUM(CASE WHEN CAST($den AS DOUBLE) > 0.0
           |  THEN CAST(round(CAST($num AS DOUBLE) / CAST($den AS DOUBLE)
           |    * 1e9, 0) AS BIGINT) ELSE 0 END) AS BIGINT) AS ns_$i"""
          .stripMargin
      }
      def innerTerm(i: Int): String =
        s"CAST(ns_$i AS DOUBLE) / 1e9 / CAST(n_$i AS DOUBLE)"
      s"""WITH p AS (SELECT CAST(user_id % 3 AS INTEGER) AS arm,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         |  FROM events WHERE event_type = 'purchase'),
         |g AS (SELECT v, CAST(COUNT(*) AS HUGEINT) AS c,
         |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS HUGEINT)
         |      AS c0,
         |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT)
         |      AS c1,
         |    CAST(SUM(CASE WHEN arm = 2 THEN 1 ELSE 0 END) AS HUGEINT)
         |      AS c2
         |  FROM p GROUP BY 1),
         |cc AS (SELECT v, c, c0, c1, c2,
         |    SUM(c) OVER (ORDER BY v) AS cum,
         |    SUM(c0) OVER (ORDER BY v) AS cum0,
         |    SUM(c1) OVER (ORDER BY v) AS cum1,
         |    SUM(c2) OVER (ORDER BY v) AS cum2
         |  FROM g),
         |tt AS (SELECT
         |    CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n,
         |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
         |    CAST(COALESCE(SUM(c0), 0) AS BIGINT) AS n_0,
         |    CAST(COALESCE(SUM(c1), 0) AS BIGINT) AS n_1,
         |    CAST(COALESCE(SUM(c2), 0) AS BIGINT) AS n_2
         |  FROM g),
         |s AS (SELECT ${nano(0)},
         |    ${nano(1)},
         |    ${nano(2)}
         |  FROM cc CROSS JOIN tt)
         |SELECT n_0, n_1, n_2, n, n_distinct,
         |  CASE WHEN n_0 > 0 AND n_1 > 0 AND n_2 > 0 AND n_distinct > 1
         |  THEN round((CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE)
         |    * ((${innerTerm(0)} + ${innerTerm(1)}) + ${innerTerm(2)}),
         |    6) END AS a2_stat,
         |  CAST(2 AS BIGINT) AS dof
         |FROM s CROSS JOIN tt""".stripMargin
    }

  /** C96 oracle — shared verbatim by `ab_kruskal_wallis` and the
    * E35 stream face (stream ≡ batch on the merged additive census).
    */
  private[graft] val kruskalSql: String = {
      val nD = "CAST(n AS DOUBLE)"
      def term(i: Int) =
        s"(CAST(r2_$i AS DOUBLE) * CAST(r2_$i AS DOUBLE)" +
          s" / (4.0 * CAST(n_$i AS DOUBLE)))"
      val sumTerm = s"((${term(0)} + ${term(1)}) + ${term(2)})"
      val h = s"((12.0 / ($nD * ($nD + 1.0))) * $sumTerm" +
        s" - 3.0 * ($nD + 1.0))"
      val corr = s"(1.0 - CAST(tie AS DOUBLE) / ($nD * $nD * $nD - $nD))"
      val ok = "n_0 > 0 AND n_1 > 0 AND n_2 > 0 AND n >= 2"
      s"""WITH p AS (SELECT CAST(user_id % 3 AS INTEGER) AS arm,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         |  FROM events WHERE event_type = 'purchase'),
         |g AS (SELECT v, COUNT(*) AS c,
         |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS c0,
         |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS c1,
         |    SUM(CASE WHEN arm = 2 THEN 1 ELSE 0 END) AS c2
         |  FROM p GROUP BY v),
         |cc AS (SELECT *, SUM(c) OVER (ORDER BY v) AS cum FROM g),
         |a AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
         |    SUM(CAST(c AS HUGEINT) * c * c - c) AS tie,
         |    CAST(SUM(c0) AS BIGINT) AS n_0,
         |    SUM(CAST(c0 AS HUGEINT) * (CAST(cum AS HUGEINT) * 2 - c + 1))
         |      AS r2_0,
         |    CAST(SUM(c1) AS BIGINT) AS n_1,
         |    SUM(CAST(c1 AS HUGEINT) * (CAST(cum AS HUGEINT) * 2 - c + 1))
         |      AS r2_1,
         |    CAST(SUM(c2) AS BIGINT) AS n_2,
         |    SUM(CAST(c2 AS HUGEINT) * (CAST(cum AS HUGEINT) * 2 - c + 1))
         |      AS r2_2
         |  FROM cc)
         |SELECT n_0, n_1, n_2, n,
         |  CASE WHEN $ok THEN round($h, 6) END AS h_stat,
         |  CASE WHEN ($ok) AND (CASE WHEN n >= 2 THEN $corr END) > 0.0
         |    THEN round($h / $corr, 6) END AS h_adj,
         |  CAST(2 AS BIGINT) AS dof
         |FROM a""".stripMargin
    }

  /** C109 oracle — shared verbatim by `mood_median` and the E36
    * stream face (same additive-census identity).
    */
  private[graft] val moodMedianSql: String =
    """WITH p AS (SELECT CAST(user_id % 3 AS INTEGER) AS arm,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT v, COUNT(*) AS c,
        |    SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS c0,
        |    SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS c1,
        |    SUM(CASE WHEN arm = 2 THEN 1 ELSE 0 END) AS c2
        |  FROM p GROUP BY 1),
        |cc AS (SELECT *, SUM(c) OVER (ORDER BY v) AS cum FROM g),
        |t AS (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n FROM g),
        |m AS (SELECT MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END)
        |    AS med
        |  FROM cc CROSS JOIN t),
        |suff AS (SELECT
        |    CAST(SUM(c0) AS BIGINT) AS n_0,
        |    CAST(SUM(CASE WHEN v > med THEN c0 ELSE 0 END) AS BIGINT)
        |      AS a_0,
        |    CAST(SUM(c1) AS BIGINT) AS n_1,
        |    CAST(SUM(CASE WHEN v > med THEN c1 ELSE 0 END) AS BIGINT)
        |      AS a_1,
        |    CAST(SUM(c2) AS BIGINT) AS n_2,
        |    CAST(SUM(CASE WHEN v > med THEN c2 ELSE 0 END) AS BIGINT)
        |      AS a_2,
        |    CAST(MIN(med) AS BIGINT) AS median
        |  FROM g CROSS JOIN m)
        |SELECT n_0, n_1, n_2, a_0, a_1, a_2, median,
        |  CASE WHEN MOOD_OK THEN round(MOOD_CHI2, 6) END AS chi2,
        |  CAST(2 AS BIGINT) AS dof
        |FROM suff""".stripMargin
        .replace("MOOD_OK", moodOk(3))
        .replace("MOOD_CHI2", moodChi2(3))

  /** C119 oracle — shared verbatim by `theil_u_forecast` and the
    * E37 stream face (stream ≡ batch on the merged additive day
    * cells).
    */
  private[graft] val theilUSql: String = {
      val a = 0.3; val b = 0.3
      val (al, oa, be, ob) = (s"$a", s"${1.0 - a}", s"$b", s"${1.0 - b}")
      val f = "(acc[1] + acc[2])"
      val newl = s"($al * e[1] + $oa * $f)"
      s"""WITH dly AS (
         |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100
         |      AS HUGEINT) AS DOUBLE) AS v
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
         |ar AS (SELECT list(v ORDER BY day) AS vals FROM dly),
         |st AS (SELECT CAST(len(vals) AS BIGINT) AS n,
         |    list_reduce(list_prepend(
         |      [vals[1],
         |       CASE WHEN len(vals) >= 2 THEN vals[2] - vals[1]
         |         ELSE 0.0 END,
         |       vals[1], 0.0, 0.0],
         |      list_transform(vals[2:len(vals)], x -> [x])),
         |      (acc, e) -> [
         |        $newl,
         |        $be * ($newl - acc[1]) + $ob * acc[2],
         |        e[1],
         |        acc[4] + (e[1] - $f) * (e[1] - $f),
         |        acc[5] + (e[1] - acc[3]) * (e[1] - acc[3])
         |      ]) AS s
         |  FROM ar)
         |SELECT n,
         |  CASE WHEN n >= 3 AND s[5] > 0.0
         |  THEN round(sqrt(s[4] / s[5]), 6) END AS theil_u,
         |  round(s[4], 6) AS sse_model,
         |  round(s[5], 6) AS sse_naive
         |FROM st""".stripMargin
    }

  /** C118 oracle — shared verbatim by `turning_point_test` and the
    * E38 stream face (stream ≡ batch on the merged additive day
    * cells).
    */
  private[graft] val turningPointSql: String =
    """WITH dly AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS HUGEINT)
        |      AS x
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |mid AS (SELECT c.x, p.x AS xp, nx.x AS xn
        |  FROM dly c JOIN dly p ON c.day = p.day + 1
        |  JOIN dly nx ON nx.day = c.day + 1),
        |t AS (SELECT
        |    CAST(SUM(CASE WHEN (x > xp AND x > xn)
        |      OR (x < xp AND x < xn) THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_turns,
        |    CAST(COUNT(*) AS BIGINT) AS n_interior
        |  FROM mid),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dly)
        |SELECT n, n_interior, n_turns,
        |  CASE WHEN n >= 3
        |    AND (16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0 > 0.0
        |    AND n_interior = n - 2
        |  THEN round((CAST(n_turns AS DOUBLE)
        |      - 2.0 * (CAST(n AS DOUBLE) - 2.0) / 3.0)
        |    / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0), 6)
        |  END AS z_stat
        |FROM t CROSS JOIN nn""".stripMargin

  /** C105 oracle — shared verbatim by `hurst_exponent` and the E33
    * stream face (stream ≡ batch on the merged additive hour cells).
    */
  private[graft] val hurstSql: String =
    """WITH hr AS (
        |  SELECT date_trunc('hour', ts) AS h,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS HUGEINT)
        |      AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |idx AS (SELECT cents, row_number() OVER (ORDER BY h) AS t
        |  FROM hr),
        |b AS (SELECT cents, t, w,
        |    (t - 1) // w AS blk, (t - 1) % w + 1 AS p
        |  FROM idx CROSS JOIN (SELECT unnest([8, 16, 32, 64]) AS w)),
        |cum AS (SELECT w, blk, cents,
        |    w * SUM(cents) OVER (PARTITION BY w, blk ORDER BY t)
        |      - p * SUM(cents) OVER (PARTITION BY w, blk) AS z
        |  FROM b),
        |per AS (SELECT w, blk, COUNT(*) AS cnt,
        |    SUM(cents) AS s1, SUM(cents * cents) AS s2,
        |    MAX(z) AS zmax, MIN(z) AS zmin
        |  FROM cum GROUP BY 1, 2),
        |rs AS (SELECT w,
        |    CAST(round(CAST(zmax - zmin AS DOUBLE)
        |      / sqrt(CAST(w * s2 - s1 * s1 AS DOUBLE)) * 1e9, 0)
        |      AS BIGINT) AS nano
        |  FROM per
        |  WHERE cnt = w AND CAST(w * s2 - s1 * s1 AS DOUBLE) > 0.0),
        |bys AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS nb,
        |    CAST(SUM(nano) AS BIGINT) AS ns
        |  FROM rs GROUP BY 1),
        |one AS (SELECT
        |    CAST(SUM(CASE WHEN w = 8 THEN nb END) AS BIGINT) AS nb_8,
        |    CAST(SUM(CASE WHEN w = 16 THEN nb END) AS BIGINT) AS nb_16,
        |    CAST(SUM(CASE WHEN w = 32 THEN nb END) AS BIGINT) AS nb_32,
        |    CAST(SUM(CASE WHEN w = 64 THEN nb END) AS BIGINT) AS nb_64,
        |    CAST(SUM(CASE WHEN w = 8 THEN ns END) AS BIGINT) AS ns_8,
        |    CAST(SUM(CASE WHEN w = 16 THEN ns END) AS BIGINT) AS ns_16,
        |    CAST(SUM(CASE WHEN w = 32 THEN ns END) AS BIGINT) AS ns_32,
        |    CAST(SUM(CASE WHEN w = 64 THEN ns END) AS BIGINT) AS ns_64
        |  FROM bys),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_obs FROM idx)
        |SELECT n_obs,
        |  COALESCE(nb_8, 0) AS n_blocks_8,
        |  COALESCE(nb_16, 0) AS n_blocks_16,
        |  COALESCE(nb_32, 0) AS n_blocks_32,
        |  COALESCE(nb_64, 0) AS n_blocks_64,
        |  CASE WHEN nb_8 > 0 THEN round(
        |    CAST(ns_8 AS DOUBLE) / CAST(nb_8 AS DOUBLE) / 1e9, 6)
        |  END AS rs_8,
        |  CASE WHEN nb_16 > 0 THEN round(
        |    CAST(ns_16 AS DOUBLE) / CAST(nb_16 AS DOUBLE) / 1e9, 6)
        |  END AS rs_16,
        |  CASE WHEN nb_32 > 0 THEN round(
        |    CAST(ns_32 AS DOUBLE) / CAST(nb_32 AS DOUBLE) / 1e9, 6)
        |  END AS rs_32,
        |  CASE WHEN nb_64 > 0 THEN round(
        |    CAST(ns_64 AS DOUBLE) / CAST(nb_64 AS DOUBLE) / 1e9, 6)
        |  END AS rs_64,
        |  CASE WHEN nb_8 > 0 AND nb_16 > 0 AND nb_32 > 0 AND nb_64 > 0
        |  THEN round(
        |    (-1.5 * ln(CAST(ns_8 AS DOUBLE) / CAST(nb_8 AS DOUBLE) / 1e9)
        |     - 0.5 * ln(CAST(ns_16 AS DOUBLE) / CAST(nb_16 AS DOUBLE) / 1e9)
        |     + 0.5 * ln(CAST(ns_32 AS DOUBLE) / CAST(nb_32 AS DOUBLE) / 1e9)
        |     + 1.5 * ln(CAST(ns_64 AS DOUBLE) / CAST(nb_64 AS DOUBLE) / 1e9))
        |    / (5.0 * 0.6931471805599453), 6)
        |  END AS hurst
        |FROM one CROSS JOIN nt""".stripMargin

  /** C103 oracle — shared verbatim by `assoc_cramers_v` and the E30
    * stream face (stream ≡ batch on the merged additive cells): cell
    * terms nano-quantized and summed as exact integers, absent cells
    * via the closed tail χ² = Σ(o−e)²/e − Σe + N, sqrt clamped at 0.
    */
  private[graft] val cramersVSql: String =
    """WITH cells AS (SELECT lang AS x, source AS y, COUNT(*) AS c
      |  FROM documents GROUP BY 1, 2),
      |rx AS (SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM cells
      |  GROUP BY 1),
      |cy AS (SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM cells
      |  GROUP BY 1),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS n_cells FROM cells),
      |dims AS (SELECT
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM rx) AS r,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM cy) AS cc),
      |t AS (SELECT CAST(round(
      |    (CAST(c AS DOUBLE) - e) * (CAST(c AS DOUBLE) - e) / e * 1e9,
      |    0) AS BIGINT) AS nano,
      |    CAST(round(e * 1e9, 0) AS BIGINT) AS nano_e
      |  FROM (SELECT c, CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)
      |      / CAST(n AS DOUBLE) AS e
      |    FROM cells JOIN rx USING (x) JOIN cy USING (y)
      |    CROSS JOIN tot)),
      |a AS (SELECT CAST(SUM(nano) AS BIGINT) AS ns,
      |    CAST(SUM(nano_e) AS BIGINT) AS nse FROM t)
      |SELECT n, r, cc AS c, n_cells,
      |  round(CAST(ns - nse AS DOUBLE) / 1e9 + CAST(n AS DOUBLE), 6)
      |    AS chi2,
      |  (r - 1) * (cc - 1) AS dof,
      |  CASE WHEN least(r, cc) >= 2 AND n > 0 THEN round(sqrt(
      |    greatest(CAST(ns - nse AS DOUBLE) / 1e9 + CAST(n AS DOUBLE),
      |      0.0)
      |    / (CAST(n AS DOUBLE) * (CAST(least(r, cc) AS DOUBLE) - 1.0))),
      |    6) END AS cramers_v
      |FROM a CROSS JOIN tot CROSS JOIN dims""".stripMargin

  /** C106 oracle — mirrors [[graft.operators.Changepoint.grangerLag1]]:
    * nine exact sufficient sums off the lag-1 day join, then the
    * closed-form Cramer's-rule OLS algebra as ONE textually-repeated
    * IEEE tree per published statistic.
    */
  private[graft] val grangerSql: String = {
    val nD = "CAST(n AS DOUBLE)"
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val cxx = s"(${d("sxx")} - ${d("sx")} * ${d("sx")} / $nD)"
    val cll = s"(${d("sll")} - ${d("sl")} * ${d("sl")} / $nD)"
    val cyy = s"(${d("syy")} - ${d("sy")} * ${d("sy")} / $nD)"
    val cxl = s"(${d("sxl")} - ${d("sx")} * ${d("sl")} / $nD)"
    val cxy = s"(${d("sxy")} - ${d("sx")} * ${d("sy")} / $nD)"
    val cly = s"(${d("sly")} - ${d("sl")} * ${d("sy")} / $nD)"
    val det = s"($cll * $cyy - $cly * $cly)"
    val rssR = s"($cxx - $cxl * $cxl / $cll)"
    val b1 = s"(($cxl * $cyy - $cxy * $cly) / $det)"
    val b2 = s"(($cxy * $cll - $cxl * $cly) / $det)"
    val rssU = s"($cxx - ($b1 * $cxl + $b2 * $cxy))"
    val ok = s"n > 3 AND $cll > 0.0 AND $det > 0.0 AND $rssU > 0.0"
    s"""WITH dly AS (
       |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
       |      THEN CAST(value AS DECIMAL(18,2)) * 100 END), 0) AS BIGINT)
       |      AS cents,
       |    CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS signups
       |  FROM events GROUP BY 1),
       |l AS (SELECT t.cents AS x, p.cents AS xl, p.signups AS yl
       |  FROM dly t JOIN dly p ON t.day = p.day + 1),
       |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(CAST(x AS HUGEINT)) AS sx,
       |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
       |    SUM(CAST(xl AS HUGEINT)) AS sl,
       |    SUM(CAST(xl AS HUGEINT) * xl) AS sll,
       |    SUM(CAST(yl AS HUGEINT)) AS sy,
       |    SUM(CAST(yl AS HUGEINT) * yl) AS syy,
       |    SUM(CAST(x AS HUGEINT) * xl) AS sxl,
       |    SUM(CAST(x AS HUGEINT) * yl) AS sxy,
       |    SUM(CAST(xl AS HUGEINT) * yl) AS sly
       |  FROM l)
       |SELECT n,
       |  CASE WHEN $ok THEN round($b2, 6) END AS beta_ylag,
       |  CASE WHEN $ok THEN round(
       |    ($rssR - $rssU) / ($rssU / ($nD - 3.0)), 6) END AS f_stat,
       |  CAST(1 AS BIGINT) AS df1, n - 3 AS df2
       |FROM a""".stripMargin
  }

  /** C104 oracle — shared verbatim by `ljung_box` and the E29 stream
    * face (stream ≡ batch on the merged day cells): the m per-lag
    * terms fold in lag order over the 6-dp-rounded acf values.
    */
  private[graft] val ljungBoxSql: String =
    s"""WITH ac AS (${valueAcfSqlFor(10)}),
       |nn AS (SELECT CAST(COUNT(DISTINCT date_trunc('day', ts))
       |    AS BIGINT) AS n
       |  FROM events WHERE event_type = 'purchase'),
       |terms AS (SELECT lag,
       |    acf * acf / (CAST(n AS DOUBLE) - CAST(lag AS DOUBLE)) AS t
       |  FROM ac CROSS JOIN nn
       |  WHERE acf IS NOT NULL AND n > lag),
       |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
       |    list_reduce(list_prepend(0.0, list_transform(
       |      list_sort(list({'l': lag, 't': t})), e -> e['t'])),
       |      (a, b) -> a + b) AS s
       |  FROM terms)
       |SELECT n, m,
       |  CASE WHEN m > 0 THEN round(
       |    CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * s, 6)
       |  END AS q_stat,
       |  m AS dof
       |FROM f CROSS JOIN nn""".stripMargin

  /** C88b oracle — mirrors [[graft.operators.Changepoint.pacf]]: the
    * Durbin–Levinson recursion as a flat double-list fold (the C61
    * accumulator trick) over the 6-dp-ROUNDED acf values both engines
    * already agree on bit-for-bit; every Σ is a 0.0-seeded left fold,
    * so the whole recursion evaluates the identical IEEE tree.
    * Accumulator layout: [k, pacf_1..k, phi_1..k].
    */
  private[graft] def pacfOracle(maxLag: Int): String = {
    val k = "CAST(e[1] AS INTEGER)"
    def sum(term: String) =
      s"""list_reduce(list_prepend(0.0, list_transform(range(1, $k),
         |      jj -> $term)), (a, b) -> a + b)""".stripMargin
    val pkk =
      s"""((r[$k] - ${sum(s"acc[$k + jj] * r[$k - jj]")})
         |     / (1.0 - ${sum(s"acc[$k + jj] * r[jj]")}))""".stripMargin
    s"""WITH ac AS (${valueAcfSqlFor(maxLag)}),
       |rr AS (SELECT list_transform(
       |    list_sort(list({'l': lag, 'a': acf})), e -> e['a']) AS r
       |  FROM ac),
       |f AS (SELECT list_reduce(
       |    list_prepend([1.0, r[1], r[1]],
       |      list_transform(range(2, ${maxLag + 1}),
       |        kk -> [CAST(kk AS DOUBLE)])),
       |    (acc, e) -> (
       |      [e[1]]
       |      || acc[2:$k]
       |      || [$pkk]
       |      || list_transform(range(1, $k),
       |           j -> acc[$k + j] - ($pkk) * acc[$k + ($k - j)])
       |      || [$pkk]
       |    )) AS st
       |  FROM rr)
       |SELECT CAST(j AS INTEGER) AS lag, round(st[j + 1], 6) AS pacf
       |FROM f, range(1, ${maxLag + 1}) t(j)
       |ORDER BY lag""".stripMargin
  }

  /** Shared by `events_session_window` and its E2 stream face — the
    * sentinel-flushed bounded stream drops nothing, so the emitted
    * sessions equal the batch gap decomposition exactly.
    */
  private[graft] val sessionWindowSql: String =
    """WITH e AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |              OR ts - lag(ts) OVER w > INTERVAL 4 HOUR
      |         THEN 1 ELSE 0 END AS flag
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, SUM(flag) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM e)
      |SELECT user_id, MIN(ts) AS session_start,
      |  MAX(ts) + INTERVAL 4 HOUR AS session_end,
      |  COUNT(*) AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Shared by `quality_classifier` and the E16 stream gate's
    * threshold derivation: the log-odds token model replay.
    */
  private[graft] val qualityClassifierSql: String =
    """WITH tok AS (
      |  SELECT doc_id, (source = 'src0') AS pos,
      |    unnest(string_split_regex(trim(text), '\s+')) AS w
      |  FROM documents WHERE len(trim(text)) > 0),
      |cnt AS (SELECT w, COUNT(*) AS c,
      |    COUNT(*) FILTER (pos) AS cp FROM tok GROUP BY w),
      |top AS (SELECT w, cp, c - cp AS cn FROM cnt ORDER BY c DESC, w LIMIT 128),
      |tot AS (SELECT
      |    CAST(COALESCE((SELECT SUM(cp) FROM cnt), 0)
      |      + (SELECT COUNT(*) FROM top) + 1 AS DOUBLE) AS denp,
      |    CAST(COALESCE((SELECT SUM(c - cp) FROM cnt), 0)
      |      + (SELECT COUNT(*) FROM top) + 1 AS DOUBLE) AS denn),
      |bias AS (SELECT
      |    ln(CAST((SELECT COUNT(*) FILTER (source = 'src0')
      |             FROM documents) + 1 AS DOUBLE))
      |  - ln(CAST((SELECT COUNT(*) FILTER (source <> 'src0')
      |             FROM documents) + 1 AS DOUBLE)) AS b),
      |lp AS (
      |  SELECT t.doc_id,
      |    COALESCE(ln(CAST(tp.cp + 1 AS DOUBLE) / denp)
      |           - ln(CAST(tp.cn + 1 AS DOUBLE) / denn),
      |      ln(1.0 / denp) - ln(1.0 / denn)) AS wt
      |  FROM tok t LEFT JOIN top tp USING (w), tot),
      |s AS (SELECT doc_id, COUNT(*) AS nt, SUM(wt) AS sw
      |      FROM lp GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(COALESCE(nt, 0) AS INTEGER) AS n_tokens,
      |  round(b + COALESCE(sw, 0.0), 6) AS margin,
      |  round(b + COALESCE(sw, 0.0), 6) > 0 AS predicted
      |FROM documents d LEFT JOIN s USING (doc_id), bias
      |ORDER BY d.doc_id""".stripMargin

  /** Shared by `scd2_history` and the C20b incremental apply — the
    * strictly-later date split makes incremental ≡ full rebuild, so
    * one SQL proves both.
    */
  private[graft] val scd2HistorySql: String =
    """WITH v AS (
      |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
      |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS prev
      |  FROM orders),
      |c AS (SELECT * FROM v WHERE prev IS DISTINCT FROM o_orderpriority)
      |SELECT o_custkey, o_orderpriority, o_orderdate AS valid_from,
      |  lead(o_orderdate) OVER w AS valid_to,
      |  (lead(o_orderdate) OVER w) IS NULL AS is_current
      |FROM c
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, valid_from, o_orderpriority""".stripMargin

  /** Shared by `funnel_steps` and its E18 stream face — the fMGWS
    * tracker's single-batch in-order fold emits exactly the batch
    * first-touch completions, so one SQL proves both.
    */
  private[graft] val funnelStepsSql: String =
    """WITH e AS (SELECT user_id, event_type, ts, event_id FROM events),
      |q0 AS (SELECT *, CASE WHEN event_type = 'view' THEN ts END AS c0 FROM e),
      |w0 AS (SELECT *, MIN(c0) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS saw0 FROM q0),
      |q1 AS (SELECT *, CASE WHEN event_type = 'click' AND saw0 IS NOT NULL
      |         AND ts <= saw0 + INTERVAL 4 HOUR THEN ts END AS c1 FROM w0),
      |w1 AS (SELECT *, MIN(c1) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS saw1 FROM q1),
      |q2 AS (SELECT *, CASE WHEN event_type = 'purchase' AND saw1 IS NOT NULL
      |         AND ts <= saw1 + INTERVAL 4 HOUR THEN ts END AS c2 FROM w1)
      |SELECT step, stage, users FROM (
      |  SELECT 1 AS step, 'view' AS stage,
      |    COUNT(DISTINCT CASE WHEN c0 IS NOT NULL THEN user_id END) AS users FROM q2
      |  UNION ALL SELECT 2, 'click',
      |    COUNT(DISTINCT CASE WHEN c1 IS NOT NULL THEN user_id END) FROM q2
      |  UNION ALL SELECT 3, 'purchase',
      |    COUNT(DISTINCT CASE WHEN c2 IS NOT NULL THEN user_id END) FROM q2
      |) ORDER BY step""".stripMargin

  /** Shared by `dedup_incremental` and the E9 stream face — the
    * single-batch admission over the seeded corpus is
    * `admitIncremental(even, odd)` verbatim.
    */
  private[graft] val dedupIncrementalSql: String =
    """WITH RECURSIVE
      |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents),
      |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
      |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
      |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s),
      |pairs AS (
      |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c,
      |    any_value(a.n) AS na, any_value(b.n) AS nb
      |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
      |  GROUP BY 1, 2),
      |edges AS (SELECT ida, idb FROM pairs
      |  WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.8),
      |inedges AS (SELECT ida, idb FROM edges WHERE ida % 2 = 1 AND idb % 2 = 1),
      |und AS (SELECT ida AS src, idb AS dst FROM inedges
      |  UNION ALL SELECT idb, ida FROM inedges),
      |reach AS (
      |  SELECT src, dst FROM und
      |  UNION
      |  SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst),
      |comp AS (
      |  SELECT d.doc_id, LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS label
      |  FROM documents d LEFT JOIN reach r ON r.src = d.doc_id
      |  WHERE d.doc_id % 2 = 1 GROUP BY d.doc_id),
      |tainted AS (
      |  SELECT DISTINCT CASE WHEN ida % 2 = 1 THEN ida ELSE idb END AS doc_id
      |  FROM edges WHERE (ida % 2) + (idb % 2) = 1),
      |bad AS (SELECT DISTINCT c.label FROM comp c JOIN tainted x ON x.doc_id = c.doc_id)
      |SELECT c.doc_id, d.n_chars FROM comp c
      |JOIN documents d ON d.doc_id = c.doc_id
      |WHERE c.doc_id = c.label AND c.label NOT IN (SELECT label FROM bad)
      |ORDER BY c.doc_id""".stripMargin

  /** E9-multibatch oracle — SEQUENTIAL admission replayed round by
    * round: corpus C0 = even docs; round r admits batch B_r = odd docs
    * with doc_id % 6 = 2r−1 against C_{r−1}, then C_r = C_{r−1} ∪
    * admitted_r. Within a round the semantics are dedupIncrementalSql's
    * (transitive in-batch components, taint-whole-component vs the
    * corpus, min-id representative); ACROSS rounds the corpus GROWS, so
    * a batch-2 doc near-dupping a batch-1 admit is rejected — the
    * order-dependent contract a single-batch oracle cannot pin (the
    * testdata has cross-slice pairs in both id directions, so the
    * sequential outcome provably differs from the one-batch union).
    * Each round's transitive closure is its own recursive CTE.
    */
  private[graft] val dedupMultibatchAdmissionSql: String = {
    val mods = Seq(1, 3, 5)
    val rounds = mods.zipWithIndex.map { case (m, i) =>
      val r = i + 1
      s"""in$r AS (SELECT ida, idb FROM edges
         |  WHERE ida % 6 = $m AND idb % 6 = $m),
         |und$r AS (SELECT ida AS src, idb AS dst FROM in$r
         |  UNION ALL SELECT idb, ida FROM in$r),
         |reach$r AS (
         |  SELECT src, dst FROM und$r
         |  UNION
         |  SELECT q.src, u.dst FROM reach$r q JOIN und$r u ON u.src = q.dst),
         |comp$r AS (
         |  SELECT d.doc_id, LEAST(d.doc_id, COALESCE(MIN(q.dst), d.doc_id)) AS label
         |  FROM documents d LEFT JOIN reach$r q ON q.src = d.doc_id
         |  WHERE d.doc_id % 6 = $m GROUP BY d.doc_id),
         |tainted$r AS (
         |  SELECT DISTINCT x.bid AS doc_id FROM (
         |    SELECT ida AS bid, idb AS oid FROM edges
         |    UNION ALL SELECT idb, ida FROM edges) x
         |  JOIN c${r - 1} cc ON cc.doc_id = x.oid
         |  WHERE x.bid % 6 = $m),
         |bad$r AS (SELECT DISTINCT c.label FROM comp$r c
         |  JOIN tainted$r t ON t.doc_id = c.doc_id),
         |adm$r AS (SELECT c.doc_id FROM comp$r c
         |  WHERE c.doc_id = c.label
         |    AND c.label NOT IN (SELECT label FROM bad$r)),
         |c$r AS (SELECT doc_id FROM c${r - 1}
         |  UNION ALL SELECT doc_id FROM adm$r)""".stripMargin
    }.mkString(",\n")
    val admitted = mods.indices.map(i => s"SELECT doc_id FROM adm${i + 1}")
      .mkString(" UNION ALL ")
    s"""WITH RECURSIVE
      |t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents),
      |s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
      |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh FROM t),
      |ex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS shingle FROM s),
      |pairs AS (
      |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c,
      |    any_value(a.n) AS na, any_value(b.n) AS nb
      |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
      |  GROUP BY 1, 2),
      |edges AS (SELECT ida, idb FROM pairs
      |  WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.8),
      |c0 AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0),
      |$rounds
      |SELECT a.doc_id, d.n_chars FROM ($admitted) a
      |JOIN documents d USING (doc_id)
      |ORDER BY a.doc_id""".stripMargin
  }

  /** E3-multibatch oracle — keep-latest upsert where the LOAD ORDER is
    * part of the contract: three micro-batches by event_id % 3 (in
    * that order), batch rows win over table rows on key collision, so
    * each user's final row is the within-batch (ts, event_id)-latest
    * row of the LAST batch containing that user — batch index
    * dominates event time, which is exactly the reference's
    * later-load-wins weekly upsert and provably differs from the
    * single-batch global keep-latest.
    */
  private[graft] val streamUpsertMultibatchSql: String =
    """SELECT user_id, event_id, event_type, ts, value FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY (event_id % 3) DESC, ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** E20-multibatch oracle — the media twin of
    * [[dedupMultibatchAdmissionSql]]: fingerprints replayed from the
    * generator arithmetic (the D12/D70 pattern), then THREE admission
    * rounds unrolled, each tainting batch r's within-batch components
    * against the fingerprint set GROWN by rounds < r (index C0 = the
    * even assets) and admitting min-id representatives of clean
    * components.
    */
  private[graft] val mediaMultibatchGateSql: String = {
    val rounds = Seq(1, 3, 5).zipWithIndex.map { case (m, i) =>
      val r = i + 1
      s"""b$r AS (SELECT * FROM hs WHERE doc_id % 6 = $m),
         |taint$r AS (
         |  SELECT DISTINCT o.doc_id FROM b$r o JOIN c${r - 1} e
         |  ON o.w = e.w AND o.h = e.h
         |    AND bit_count(xor(o.phash, e.phash)) <= 2),
         |edges$r AS (
         |  SELECT a.doc_id AS ia, b.doc_id AS ib FROM b$r a JOIN b$r b
         |  ON a.w = b.w AND a.h = b.h AND a.doc_id <> b.doc_id
         |    AND bit_count(xor(a.phash, b.phash)) <= 2),
         |reach$r(id, r) AS (
         |  SELECT doc_id, doc_id FROM b$r
         |  UNION
         |  SELECT reach$r.id, edges$r.ib FROM reach$r JOIN edges$r
         |    ON edges$r.ia = reach$r.r),
         |comp$r AS (SELECT id, min(r) AS canon FROM reach$r GROUP BY id),
         |bad$r AS (SELECT DISTINCT c.canon FROM comp$r c
         |          JOIN taint$r t ON t.doc_id = c.id),
         |adm$r AS (SELECT id FROM comp$r WHERE id = canon
         |          AND canon NOT IN (SELECT canon FROM bad$r)),
         |c$r AS (SELECT w, h, phash FROM c${r - 1}
         |  UNION ALL
         |  SELECT h2.w, h2.h, h2.phash FROM hs h2
         |  JOIN adm$r ON adm$r.id = h2.doc_id)""".stripMargin
    }.mkString(",\n")
    val admitted = (1 to 3).map(r => s"SELECT id FROM adm$r")
      .mkString(" UNION ALL ")
    s"""WITH RECURSIVE hs AS (
      |  SELECT d.doc_id, CAST(d.doc_id % 6 + 2 AS INTEGER) AS w,
      |    CAST(d.doc_id % 4 + 2 AS INTEGER) AS h,
      |    CAST(COALESCE(SUM(CASE WHEN
      |      ((d.doc_id*7 + (i.i+1)*3) % 256 + (d.doc_id*11 + (i.i+1)*5) % 256
      |        + (d.doc_id*13 + (i.i+1)*7) % 256) // 3
      |      > ((d.doc_id*7 + i.i*3) % 256 + (d.doc_id*11 + i.i*5) % 256
      |        + (d.doc_id*13 + i.i*7) % 256) // 3
      |      THEN (CAST(1 AS BIGINT) << i.i)
      |      ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS phash
      |  FROM documents d JOIN range(0, 34) AS i(i)
      |    ON i.i < (d.doc_id % 6 + 2)*(d.doc_id % 4 + 2) - 1
      |  GROUP BY d.doc_id),
      |c0 AS (SELECT w, h, phash FROM hs WHERE doc_id % 2 = 0),
      |$rounds
      |SELECT o.doc_id, o.w AS width, o.h AS height, o.phash
      |FROM hs o JOIN ($admitted) a ON a.id = o.doc_id
      |ORDER BY o.doc_id""".stripMargin
  }

  /** Shared by the LOSSLESS media-decode keys (`media_decode_png`,
    * `media_decode_gif`): the oracle recomputes the per-image stats
    * from the synthetic-pixel generator arithmetic, so a hash match
    * proves the codec recovered every pixel byte-exactly.
    */
  private[graft] val losslessMediaStatsSql: String =
    """SELECT d.doc_id,
      |  CAST(d.doc_id % 6 + 2 AS INTEGER) AS width,
      |  CAST(d.doc_id % 4 + 2 AS INTEGER) AS height,
      |  CAST(SUM((d.doc_id*7 + i.i*3) % 256) AS BIGINT) AS sum_r,
      |  CAST(SUM((d.doc_id*11 + i.i*5) % 256) AS BIGINT) AS sum_g,
      |  CAST(SUM((d.doc_id*13 + i.i*7) % 256) AS BIGINT) AS sum_b
      |FROM documents d JOIN range(0, 35) AS i(i)
      |  ON i.i < (d.doc_id % 6 + 2)*(d.doc_id % 4 + 2)
      |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  // ---- DuckDB oracle SQL ------------------------------------------------
  // Shared snippets: exact-decimal aggregation mirroring Num.scala.
  private[graft] val DP = "CAST(%s AS DECIMAL(12,2))"          // prices/qty/values
  private[graft] val DR = "CAST(%s AS DECIMAL(4,2))"           // rates in [0,1]
  private[graft] val ONE = "CAST(1 AS DECIMAL(3,2))"
  private[graft] def dsum(c: String) = s"CAST(SUM(CAST($c AS DECIMAL(12,2))) AS DOUBLE)"
  private[graft] def davg(c: String) =
    s"CAST(SUM(CAST($c AS DECIMAL(12,2))) AS DOUBLE) / CAST(COUNT($c) AS DOUBLE)"
  private[graft] val revenueSum =
    s"CAST(SUM(${DP.format("l_extendedprice")} * ($ONE - ${DR.format("l_discount")})) AS DOUBLE)"

  private[graft] val monthlyCte =
    """monthly AS (
      |  SELECT o_custkey, date_trunc('month', o_orderdate) AS month,
      |         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS mspend
      |  FROM orders GROUP BY 1, 2),
      |ranked AS (
      |  SELECT month, row_number() OVER (ORDER BY month DESC) AS rk
      |  FROM (SELECT DISTINCT month FROM monthly))""".stripMargin

  private[graft] val statsTotalsCte =
    s"""t AS (
       |  SELECT l_partkey, COUNT(*) AS n_lines,
       |    ${dsum("l_quantity")} AS total_qty,
       |    ${dsum("l_extendedprice")} AS total_price,
       |    CAST(SUM(${DP.format("l_extendedprice")} * ${DR.format("l_discount")}) AS DOUBLE) AS disc_amount,
       |    CAST(SUM(${DP.format("l_extendedprice")} * ${DR.format("l_tax")}) AS DOUBLE) AS tax_amount
       |  FROM lineitem GROUP BY 1)""".stripMargin


  // ---- portable-XXH64 + hyperplane constants (oracle generators) -------
  // Spark's xxhash64(lit(42L), x) = XXH64.hashLong(x, C) with
  // C = hashLong(42, 42) — a constant. One 8-byte XXH64 block is ~10
  // multiply/rotate/xor steps, emitted as nested subqueries (one level
  // per step: lateral aliases substitute textually and would blow up
  // exponentially) over HUGEINT with 32-bit-limb multiplication mod
  // 2^64. Bit-for-bit equal to the engine hash.
  private[graft] val M64 = "18446744073709551616"
  private[graft] val M32 = "4294967296"
  private[graft] def mul64(a: String, b: String): String =
    s"(($a) % $M32) * (($b) % $M32)" +
      s" + (((($a) // $M32) * (($b) % $M32)" +
      s" + (($a) % $M32) * (($b) // $M32)) % $M32) * $M32"
  private[graft] def rotl(x: String, r: Int): String =
    s"((($x) % ${BigInt(1) << (64 - r)}) * ${BigInt(1) << r}) + (($x) // ${BigInt(1) << (64 - r)})"
  private[graft] def xorShift(x: String, n: Int): String =
    s"xor(CAST($x AS HUGEINT), CAST(($x) // ${BigInt(1) << n} AS HUGEINT))"
  private[graft] val XP1 = "11400714785074694791" // XXH64 primes, decimal
  private[graft] val XP2 = "14029467366897019727"
  private[graft] val XP3 = "1609587929392839161"
  private[graft] val XP4 = "9650029242287828579"
  private[graft] val XSEEDHEAD = "14440755233413290667" // (hashLong(42,42) + P5 + 8) mod 2^64

  /** Nested-subquery XXH64 hashLong of `idExpr` rows from `inner`,
    * exposing the unsigned 64-bit result as column `hout`.
    */
  private[graft] def xxh64Nested(inner: String, idExpr: String): String =
    Seq(
      s"(${mul64("xv", XP2)}) % $M64 AS k1",
      s"${rotl("k1", 31)} AS k2",
      s"(${mul64("k2", XP1)}) % $M64 AS k3",
      s"xor(CAST($XSEEDHEAD AS HUGEINT), CAST(k3 AS HUGEINT)) AS h1",
      s"${rotl("h1", 27)} AS h1r",
      s"((${mul64("h1r", XP1)}) + $XP4) % $M64 AS h2",
      s"${xorShift("h2", 33)} AS f1",
      s"(${mul64("f1", XP2)}) % $M64 AS f2",
      s"${xorShift("f2", 29)} AS f3",
      s"(${mul64("f3", XP3)}) % $M64 AS f4",
      s"${xorShift("f4", 32)} AS hout")
      .foldLeft(s"SELECT *, CAST($idExpr AS HUGEINT) AS xv FROM ($inner)") {
        (q, step) => s"SELECT *, $step FROM ($q)"
      }


  /** CTE chain `cd..hf`: variable-length string XXH64 (seed 42) of
    * each row of a preceding CTE `dsh(sh)` -> `hf(sh, hv)` with hv the
    * unsigned 64-bit result as HUGEINT. Valid for ASCII inputs < 32
    * bytes (the stripe loop is never entered and is not emitted) --
    * true of the gate word-shingles. Shared by the dedup_simhash and
    * dedup_bbit_minhash oracles. Trailing comma included.
    */
  private[graft] val strXxh64Ctes: String =
    """cd AS (
        |  SELECT sh, length(sh) AS L,
        |    list_transform(range(1, length(sh) + 1),
        |      i -> CAST(ascii(substr(sh, i, 1)) AS HUGEINT)) AS cs
        |  FROM dsh),
        |w8 AS (
        |  SELECT sh, L, cs,
        |    list_transform(range(0, L // 8), w ->
        |      cs[w*8+1] + cs[w*8+2]*256 + cs[w*8+3]*65536 + cs[w*8+4]*16777216
        |      + cs[w*8+5]*4294967296 + cs[w*8+6]*1099511627776
        |      + cs[w*8+7]*281474976710656 + cs[w*8+8]*72057594037927936) AS words
        |  FROM cd),
        |hw AS (
        |  SELECT sh, L, cs,
        |    list_reduce(list_prepend(CAST((42 + 2870177450012600261 + L) % 18446744073709551616 AS HUGEINT), words),
        |      (acc, w) -> ((((((((xor(CAST(acc AS HUGEINT), CAST(((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) // 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 137438953472) * 134217728) + ((xor(CAST(acc AS HUGEINT), CAST(((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) // 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 137438953472))) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((((((xor(CAST(acc AS HUGEINT), CAST(((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) // 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 137438953472) * 134217728) + ((xor(CAST(acc AS HUGEINT), CAST(((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) // 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 137438953472))) // 4294967296) * ((11400714785074694791) % 4294967296) + ((((((xor(CAST(acc AS HUGEINT), CAST(((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) // 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 137438953472) * 134217728) + ((xor(CAST(acc AS HUGEINT), CAST(((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) // 4294967296) * ((11400714785074694791) % 4294967296) + (((((((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) % 8589934592) * 2147483648) + (((((w) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((w) // 4294967296) * ((14029467366897019727) % 4294967296) + ((w) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 137438953472))) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 + 9650029242287828579) % 18446744073709551616) AS h1
        |  FROM w8),
        |h4 AS (
        |  SELECT sh, L, cs,
        |    CASE WHEN L % 8 >= 4 THEN
        |      ((((((((xor(CAST(h1 AS HUGEINT), CAST((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) // 4294967296) * ((11400714785074694791) % 4294967296) + ((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 2199023255552) * 8388608) + ((xor(CAST(h1 AS HUGEINT), CAST((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) // 4294967296) * ((11400714785074694791) % 4294967296) + ((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 2199023255552))) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((((((xor(CAST(h1 AS HUGEINT), CAST((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) // 4294967296) * ((11400714785074694791) % 4294967296) + ((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 2199023255552) * 8388608) + ((xor(CAST(h1 AS HUGEINT), CAST((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) // 4294967296) * ((11400714785074694791) % 4294967296) + ((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 2199023255552))) // 4294967296) * ((14029467366897019727) % 4294967296) + ((((((xor(CAST(h1 AS HUGEINT), CAST((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) // 4294967296) * ((11400714785074694791) % 4294967296) + ((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 2199023255552) * 8388608) + ((xor(CAST(h1 AS HUGEINT), CAST((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) // 4294967296) * ((11400714785074694791) % 4294967296) + ((cs[(L//8)*8+1] + cs[(L//8)*8+2]*256 + cs[(L//8)*8+3]*65536 + cs[(L//8)*8+4]*16777216) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 2199023255552))) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 + 1609587929392839161) % 18446744073709551616
        |    ELSE h1 END AS h2,
        |    (L // 8) * 8 + CASE WHEN L % 8 >= 4 THEN 4 ELSE 0 END AS tstart
        |  FROM hw),
        |hb AS (
        |  SELECT sh,
        |    list_reduce(list_prepend(CAST(h2 AS HUGEINT),
        |      list_transform(range(tstart + 1, L + 1), i -> cs[i])),
        |      (acc, b) -> (((((((xor(CAST(acc AS HUGEINT), CAST((((b) % 4294967296) * ((2870177450012600261) % 4294967296) + ((((b) // 4294967296) * ((2870177450012600261) % 4294967296) + ((b) % 4294967296) * ((2870177450012600261) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 9007199254740992) * 2048) + ((xor(CAST(acc AS HUGEINT), CAST((((b) % 4294967296) * ((2870177450012600261) % 4294967296) + ((((b) // 4294967296) * ((2870177450012600261) % 4294967296) + ((b) % 4294967296) * ((2870177450012600261) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 9007199254740992))) % 4294967296) * ((11400714785074694791) % 4294967296) + ((((((((xor(CAST(acc AS HUGEINT), CAST((((b) % 4294967296) * ((2870177450012600261) % 4294967296) + ((((b) // 4294967296) * ((2870177450012600261) % 4294967296) + ((b) % 4294967296) * ((2870177450012600261) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 9007199254740992) * 2048) + ((xor(CAST(acc AS HUGEINT), CAST((((b) % 4294967296) * ((2870177450012600261) % 4294967296) + ((((b) // 4294967296) * ((2870177450012600261) % 4294967296) + ((b) % 4294967296) * ((2870177450012600261) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 9007199254740992))) // 4294967296) * ((11400714785074694791) % 4294967296) + ((((((xor(CAST(acc AS HUGEINT), CAST((((b) % 4294967296) * ((2870177450012600261) % 4294967296) + ((((b) // 4294967296) * ((2870177450012600261) % 4294967296) + ((b) % 4294967296) * ((2870177450012600261) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) % 9007199254740992) * 2048) + ((xor(CAST(acc AS HUGEINT), CAST((((b) % 4294967296) * ((2870177450012600261) % 4294967296) + ((((b) // 4294967296) * ((2870177450012600261) % 4294967296) + ((b) % 4294967296) * ((2870177450012600261) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS HUGEINT))) // 9007199254740992))) % 4294967296) * ((11400714785074694791) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616) AS h3
        |  FROM h4),
        |hf AS (
        |  SELECT sh, xor(CAST(f4 AS HUGEINT), CAST((f4) // 4294967296 AS HUGEINT)) AS hv FROM (
        |    SELECT sh, (((xor(CAST(f2 AS HUGEINT), CAST((f2) // 536870912 AS HUGEINT))) % 4294967296) * ((1609587929392839161) % 4294967296) + ((((xor(CAST(f2 AS HUGEINT), CAST((f2) // 536870912 AS HUGEINT))) // 4294967296) * ((1609587929392839161) % 4294967296) + ((xor(CAST(f2 AS HUGEINT), CAST((f2) // 536870912 AS HUGEINT))) % 4294967296) * ((1609587929392839161) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS f4 FROM (
        |      SELECT sh, (((xor(CAST(h3 AS HUGEINT), CAST((h3) // 8589934592 AS HUGEINT))) % 4294967296) * ((14029467366897019727) % 4294967296) + ((((xor(CAST(h3 AS HUGEINT), CAST((h3) // 8589934592 AS HUGEINT))) // 4294967296) * ((14029467366897019727) % 4294967296) + ((xor(CAST(h3 AS HUGEINT), CAST((h3) // 8589934592 AS HUGEINT))) % 4294967296) * ((14029467366897019727) // 4294967296)) % 4294967296) * 4294967296) % 18446744073709551616 AS f2 FROM hb)) ),"""

  private[graft] val xxhSigned =
    s"CAST(CASE WHEN hout >= 9223372036854775808 THEN hout - $M64 ELSE hout END AS BIGINT)"
  private[graft] val xxhBucket = s"((($xxhSigned) % 1000000) + 1000000) % 1000000"

  // Hyperplane signs: bit0 of xxhash64(p, i), dumped once from the
  // engine hash. Row p = plane p; a lower plane count uses the prefix.
  private[graft] val hyperSigns: Seq[Seq[Int]] = Seq(
    Seq(-1, -1, -1, -1, 1, 1, -1, -1, 1, 1, 1, 1, 1, 1, 1, -1, 1, 1, -1, 1, -1, -1, -1, 1, 1, 1, 1, -1, -1, 1, -1, -1, 1, 1, 1, 1, 1, -1, 1, -1, -1, 1, -1, -1, -1, -1, -1, -1, 1, -1, 1, -1, -1, 1, 1, 1, -1, -1, -1, 1, -1, -1, -1, -1),
    Seq(1, -1, -1, 1, 1, -1, -1, 1, 1, -1, -1, 1, -1, -1, 1, 1, 1, 1, 1, -1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, 1, 1, -1, -1, -1, 1, -1, -1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, 1, 1, -1, -1, -1, -1, -1, 1, -1, 1, 1, -1, 1, -1, 1),
    Seq(1, 1, 1, -1, 1, 1, -1, 1, -1, -1, 1, 1, -1, -1, -1, -1, 1, -1, -1, -1, -1, -1, 1, -1, -1, -1, -1, -1, -1, 1, 1, 1, -1, 1, -1, 1, -1, 1, -1, -1, 1, -1, -1, 1, -1, -1, -1, -1, -1, -1, -1, -1, 1, 1, -1, -1, -1, -1, -1, 1, 1, -1, 1, -1),
    Seq(-1, 1, 1, 1, -1, -1, -1, -1, -1, -1, 1, 1, 1, -1, 1, 1, 1, -1, -1, -1, -1, 1, -1, -1, 1, 1, 1, 1, -1, 1, -1, -1, 1, -1, -1, -1, -1, 1, -1, 1, 1, -1, 1, -1, -1, -1, 1, 1, 1, 1, -1, 1, -1, -1, -1, 1, -1, -1, -1, 1, -1, 1, -1, -1),
    Seq(1, -1, -1, -1, -1, -1, 1, -1, -1, -1, -1, -1, 1, -1, -1, 1, -1, -1, 1, -1, 1, 1, 1, 1, -1, 1, -1, 1, -1, 1, -1, -1, 1, 1, 1, -1, -1, -1, -1, 1, 1, 1, -1, 1, 1, 1, -1, -1, -1, 1, -1, 1, 1, 1, 1, -1, -1, 1, 1, -1, -1, 1, -1, -1),
    Seq(-1, -1, 1, -1, -1, -1, -1, 1, 1, 1, -1, 1, -1, -1, 1, -1, -1, -1, 1, -1, -1, -1, 1, 1, 1, -1, -1, -1, 1, 1, 1, -1, 1, -1, -1, 1, 1, 1, -1, 1, -1, -1, -1, 1, -1, -1, 1, -1, 1, -1, -1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1, 1, 1),
    Seq(-1, 1, 1, 1, 1, -1, 1, -1, 1, 1, 1, 1, -1, 1, -1, 1, -1, 1, 1, -1, -1, 1, 1, 1, -1, 1, 1, 1, 1, 1, 1, -1, -1, -1, 1, 1, 1, -1, -1, -1, 1, -1, 1, 1, -1, 1, -1, 1, 1, 1, 1, -1, -1, -1, -1, -1, 1, -1, 1, -1, 1, -1, -1, -1),
    Seq(1, 1, 1, 1, -1, -1, -1, 1, 1, -1, -1, 1, -1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, 1, -1, 1, -1, -1, 1, 1, -1, -1, -1, 1, -1, -1, -1, 1, 1, 1, -1, -1, -1, -1, 1, -1, -1, -1, -1, 1, -1, 1, -1, 1, -1, 1, 1, -1, 1, 1, 1, 1, 1, 1))
  private[graft] def hyperMatrix(planes: Int): String =
    hyperSigns.take(planes)
      .map(_.map(s => s"$s.0").mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
  /** The kernel's bucket: sign bits of per-plane projection folds. */
  private[graft] def hyperBucketExpr(vec: String, planes: Int): String =
    (0 until planes).map { p =>
      val proj = s"list_reduce(list_transform(range(1, 65), " +
        s"i -> CAST($vec[i] AS DOUBLE) * m[${p + 1}][i]), (a, b) -> a + b)"
      s"(CASE WHEN $proj > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")

  private[graft] val langCase =
    """CASE WHEN greatest(he, hf, hd, hs) = 0 THEN 'und'
      |         WHEN he = greatest(he, hf, hd, hs) THEN 'en'
      |         WHEN hf = greatest(he, hf, hd, hs) THEN 'fr'
      |         WHEN hd = greatest(he, hf, hd, hs) THEN 'de'
      |         ELSE 'es' END""".stripMargin

  /** BM25 oracle: mirrors [[graft.operators.TextRank.bm25TopK]]'s
    * expression tree node for node — same token filter, same
    * left-assoc per-term fold, same left-to-right term sum in
    * sorted-term order, and fp constants emitted from the very same
    * Scala doubles (shortest-roundtrip repr → DuckDB parses the
    * identical bits). Only `ln` can drift (1 ulp between libms), which
    * the 6-dp rounding on BOTH sides absorbs; the ORDER BY and the
    * `> 0` filter run on the rounded value so the cut cannot diverge.
    */
  private[graft] def bm25Oracle(terms: Seq[String], k: Int,
                         k1: Double, b: Double): String = {
    val sorted = terms.distinct.sorted
    val tfCols = sorted.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(",\n    ")
    val dfCols = sorted.indices.map { i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i"
    }.mkString(",\n    ")
    val termScores = sorted.indices.map { i =>
      s"ln(((n - df$i) + 0.5) / (df$i + 0.5) + 1.0) * " +
        s"((tf$i * ${k1 + 1.0}) / (tf$i + $k1 * (${1.0 - b} + (($b * dl) / (sumdl / n)))))"
    }.mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents),
       |t AS (
       |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
       |    $tfCols
       |  FROM d),
       |s AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(dl) AS sumdl,
       |    $dfCols
       |  FROM t)
       |SELECT doc_id, score FROM (
       |  SELECT doc_id, round($termScores, 6) AS score FROM t, s)
       |WHERE score > 0
       |ORDER BY score DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  /** D101 Rocchio PRF oracle: pass 1 is [[bm25Oracle]] verbatim (top
    * kDocs docs), the expansion is the fully-ordered (count desc,
    * term asc) top-kExp non-seed non-stopword term pick, and pass 2
    * is the SAME BM25 arithmetic with the terms as a RELATION — the
    * per-doc sum folds in term order with a 0.0 seed, matching
    * Spark's sorted reduceLeft exactly (0.0 + t₁ ≡ t₁).
    */
  private[graft] def rocchioPrfOracle(seeds: Seq[String], kDocs: Int, kExp: Int,
                               k: Int, k1: Double, b: Double): String = {
    val excluded = (seeds ++ graft.functions.TextFunctions.LangMarkers.en)
      .distinct.map(t => s"'$t'").mkString(", ")
    val seedList = seeds.map(s => s"'$s'").mkString(", ")
    s"""WITH p1 AS (${bm25Oracle(seeds, kDocs, k1, b)}),
       |tk AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
       |      x -> x <> '') AS toks
       |  FROM documents),
       |exp_t AS (
       |  SELECT unnest(tk.toks) AS term FROM tk JOIN p1 USING (doc_id)),
       |expn AS (
       |  SELECT term FROM (
       |    SELECT term, COUNT(*) AS c FROM exp_t
       |    WHERE term NOT IN ($excluded) GROUP BY 1
       |    ORDER BY c DESC, term LIMIT $kExp)),
       |qterms AS (SELECT DISTINCT term FROM (
       |  SELECT term FROM expn
       |  UNION ALL SELECT unnest([$seedList]) AS term)),
       |tfr AS (SELECT tk.doc_id, q.term,
       |    CAST(len(list_filter(tk.toks, x -> x = q.term)) AS DOUBLE) AS tf,
       |    CAST(len(tk.toks) AS DOUBLE) AS dl
       |  FROM tk CROSS JOIN qterms q),
       |dfr AS (SELECT term,
       |    CAST(SUM(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df
       |  FROM tfr GROUP BY 1),
       |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    SUM(CAST(len(toks) AS DOUBLE)) AS sumdl FROM tk),
       |sc AS (SELECT tfr.doc_id, tfr.term,
       |    ln(((n - df) + 0.5) / (df + 0.5) + 1.0) *
       |      ((tf * ${k1 + 1.0}) / (tf + $k1 * (${1.0 - b}
       |        + (($b * dl) / (sumdl / n))))) AS ts
       |  FROM tfr JOIN dfr USING (term) CROSS JOIN st),
       |agg AS (SELECT doc_id,
       |    round(list_reduce(list_prepend(0.0, list(ts ORDER BY term)),
       |      (a, bb) -> a + bb), 6) AS score
       |  FROM sc GROUP BY doc_id)
       |SELECT doc_id, score FROM agg WHERE score > 0
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }

  /** ICWS weighted-minhash oracle (D83): replays
    * [[graft.operators.Dedup.weightedJaccardAudit]] bit-for-bit —
    * per-token XXH64 via the shared cd..hf chain, all five uniforms
    * per (token, sample) derived by splitmix64 from embedded
    * constants, Ioffe's r/c/β/t/ln a arithmetic in the engine's exact
    * association with ln a rounded to 6 dp BEFORE the argmin
    * (token-ordered tiebreak — the rank-on-rounded discipline), and
    * the sample value as the double-splitmix of (token hash, t).
    * Draw derivation runs per DISTINCT (token, tf) — token-level
    * volume — and each chain CTE is referenced once (the holdout
    * OOM lesson).
    */
  private[graft] def icwsOracle(k: Int): String = {
    def u64(x: Long) = java.lang.Long.toUnsignedString(x)
    val C0 = u64(0x9e3779b97f4a7c15L)
    val C1 = u64(0xbf58476d1ce4e5b9L)
    val C2 = u64(0x94d049bb133111ebL)
    def mixChain(baseQ: String, z0: String, out: String, p: String): String =
      Seq(
        s"(($z0) + $C0) % $M64 AS ${p}z1",
        s"${xorShift(s"${p}z1", 30)} AS ${p}x1",
        s"(${mul64(s"${p}x1", C1)}) % $M64 AS ${p}z2",
        s"${xorShift(s"${p}z2", 27)} AS ${p}x2",
        s"(${mul64(s"${p}x2", C2)}) % $M64 AS ${p}z3",
        s"${xorShift(s"${p}z3", 31)} AS $out")
        .foldLeft(baseQ) { (q, step) => s"SELECT *, $step FROM ($q)" }
    val draws = (0 until k).flatMap(s => (0 until 5).map(j =>
      s"($s, $j, CAST('${u64(graft.functions.GraftKernels.mix64((s * 5 + j).toLong))}' AS HUGEINT))"))
      .mkString(", ")
    val um = mixChain(
      "SELECT hf.sh, hf.hv, dr.s, dr.j, dr.mc FROM hf CROSS JOIN dr",
      "xor(CAST(hv AS HUGEINT), mc)", "m1", "a")
    val mt = mixChain("SELECT * FROM lt", "tu", "m2", "b")
    val vvq = mixChain("SELECT * FROM vv0", "xz", "vval", "c")
    s"""WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents),
      |cntw AS (
      |  SELECT doc_id, tok AS sh, COUNT(*) AS w
      |  FROM (SELECT doc_id, unnest(tk) AS tok FROM t) GROUP BY 1, 2),
      |dsh AS (SELECT DISTINCT sh FROM cntw),
      |$strXxh64Ctes
      |dr AS (SELECT * FROM (VALUES $draws) d(s, j, mc)),
      |uu AS (
      |  SELECT sh, hv, s, j,
      |    (CAST(m1 // 2048 AS DOUBLE) + 0.5) / 9007199254740992.0 AS uv
      |  FROM ($um)),
      |pv AS (
      |  SELECT sh, s, MAX(hv) AS hv,
      |    MAX(CASE WHEN j = 0 THEN uv END) AS u0,
      |    MAX(CASE WHEN j = 1 THEN uv END) AS u1,
      |    MAX(CASE WHEN j = 2 THEN uv END) AS u2,
      |    MAX(CASE WHEN j = 3 THEN uv END) AS u3,
      |    MAX(CASE WHEN j = 4 THEN uv END) AS u4
      |  FROM uu GROUP BY sh, s),
      |dw AS (SELECT DISTINCT sh, w FROM cntw),
      |tv AS (
      |  SELECT sh, hv, s, w, r, lnc, beta,
      |    floor(ln(CAST(w AS DOUBLE)) / r + beta) AS tt
      |  FROM (
      |    SELECT p.sh, p.hv, p.s, d.w,
      |      -ln(u0 * u1) AS r, ln(-ln(u2 * u3)) AS lnc, u4 AS beta
      |    FROM pv p JOIN dw d ON d.sh = p.sh)),
      |lt AS (
      |  SELECT sh, hv, s, w,
      |    round(lnc - r * (tt - beta) - r, 6) AS lna6,
      |    ((CAST(CAST(tt AS BIGINT) AS HUGEINT) % $M64) + $M64) % $M64 AS tu
      |  FROM tv),
      |vv0 AS (
      |  SELECT sh, s, w, lna6,
      |    xor(CAST(hv AS HUGEINT), CAST(m2 AS HUGEINT)) AS xz
      |  FROM ($mt)),
      |vv AS (SELECT sh, s, w, lna6, vval FROM ($vvq)),
      |sv AS (
      |  SELECT doc_id, s, vval FROM (
      |    SELECT c.doc_id, v.s, v.vval,
      |      row_number() OVER (PARTITION BY c.doc_id, v.s
      |        ORDER BY v.lna6, v.sh) AS rn
      |    FROM cntw c JOIN vv v ON v.sh = c.sh AND v.w = c.w)
      |  WHERE rn = 1),
      |ag AS (
      |  SELECT a.doc_id AS id_a,
      |    SUM(CASE WHEN a.vval = b.vval THEN 1 ELSE 0 END) AS cnt
      |  FROM sv a JOIN sv b ON b.doc_id = a.doc_id + 1 AND b.s = a.s
      |  GROUP BY 1),
      |exw AS (
      |  SELECT COALESCE(ca.id_a, cb.id_a) AS id_a,
      |    SUM(least(COALESCE(ca.w, 0), COALESCE(cb.w, 0))) AS mins,
      |    SUM(greatest(COALESCE(ca.w, 0), COALESCE(cb.w, 0))) AS maxs
      |  FROM (SELECT doc_id AS id_a, sh, w FROM cntw) ca
      |  FULL OUTER JOIN (SELECT doc_id - 1 AS id_a, sh, w FROM cntw) cb
      |    ON ca.id_a = cb.id_a AND ca.sh = cb.sh
      |  GROUP BY 1)
      |SELECT ag.id_a, ag.id_a + 1 AS id_b,
      |  CAST(exw.mins AS DOUBLE) / CAST(exw.maxs AS DOUBLE) AS jw_exact,
      |  CAST(ag.cnt AS DOUBLE) / $k.0 AS jw_icws
      |FROM ag JOIN exw ON exw.id_a = ag.id_a
      |ORDER BY ag.id_a""".stripMargin
  }

  /** Bootstrap CI oracle (D82): the proven quality-micro chain + the
    * D68 uniform replay per (doc, replica) — ONE linear pass through
    * the hash chain (the holdout lesson: never join the inlined chain
    * against a big frame) — the SAME Poisson(1) CDF constants emitted
    * from [[graft.operators.Bootstrap.cum]], exact-integer replica
    * sums, and the explicit lo/hi rank convention.
    */
  /** Shared by `corpus_drift` and its E14 streaming face
    * `stream_drift_psi` — the stream merges additive per-batch bucket
    * counts and finishes through the literally-same `psiFromCounts`
    * expression tree, so one SQL proves both bit-identical.
    */
  private[graft] val corpusDriftSql: String =
    """WITH d AS (
      |  SELECT lang, CAST(substr(source, 4) AS INT) AS sn FROM documents),
      |r AS (SELECT lang AS bucket, COUNT(*) AS ref_n FROM d
      |  WHERE sn < 10 GROUP BY lang),
      |c AS (SELECT lang AS bucket, COUNT(*) AS cur_n FROM d
      |  WHERE sn >= 10 GROUP BY lang),
      |j AS (SELECT COALESCE(r.bucket, c.bucket) AS bucket,
      |    CAST(COALESCE(ref_n, 0) AS BIGINT) AS ref_n,
      |    CAST(COALESCE(cur_n, 0) AS BIGINT) AS cur_n
      |  FROM r FULL OUTER JOIN c ON r.bucket = c.bucket),
      |t AS (SELECT SUM(ref_n) AS rt, SUM(cur_n) AS ct,
      |    COUNT(*) AS k FROM j),
      |s AS (SELECT bucket, ref_n, cur_n,
      |    CAST(ref_n + 1 AS DOUBLE) / CAST(rt + k AS DOUBLE) AS p,
      |    CAST(cur_n + 1 AS DOUBLE) / CAST(ct + k AS DOUBLE) AS q
      |  FROM j CROSS JOIN t)
      |SELECT bucket, ref_n, cur_n, round(p, 6) AS p, round(q, 6) AS q,
      |  round((p - q) * ln(p / q), 6) AS psi_term
      |FROM s ORDER BY bucket""".stripMargin

  /** Shared by `mad_outliers` and its E17 streaming face
    * `stream_robust_flags` — the stream flags under stats frozen from
    * the same corpus, a pure per-row decision, so one SQL proves
    * both. Median + MAD off the same cent-bucket histograms; the flag
    * is an all-integer compare (dev > 3·mad in buckets) so no double
    * boundary can diverge; MAD-0 groups flag nothing (mirrored guard).
    */
  /** Shared by `ab_welch_ttest` and its E24 streaming face
    * `stream_ab_ttest` — the stream merges additive sufficient
    * rows and runs the literally-same finisher, so one SQL
    * proves both. */
  private[graft] val welchTTestSql: String =
    """WITH p AS (SELECT user_id % 2 AS arm,
        |    CAST(value AS DECIMAL(18,2)) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |a AS (SELECT
        |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(SUM(CASE WHEN arm = 0 THEN v END) AS DOUBLE) AS sa,
        |    CAST(SUM(CASE WHEN arm = 1 THEN v END) AS DOUBLE) AS sb,
        |    CAST(SUM(CASE WHEN arm = 0 THEN v * v END) AS DOUBLE) AS ssa,
        |    CAST(SUM(CASE WHEN arm = 1 THEN v * v END) AS DOUBLE) AS ssb
        |  FROM p),
        |s AS (SELECT n_a, n_b, sa, sb,
        |    (ssa - sa * sa / n_a) / (n_a - 1.0) AS va,
        |    (ssb - sb * sb / n_b) / (n_b - 1.0) AS vb
        |  FROM a),
        |e AS (SELECT *, va / n_a + vb / n_b AS se2 FROM s)
        |SELECT n_a, n_b,
        |  round(sa / n_a, 6) AS mean_a, round(sb / n_b, 6) AS mean_b,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0.0 THEN
        |    round((sa / n_a - sb / n_b) / sqrt(se2), 6) END AS t_stat,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0.0 THEN
        |    round(se2 * se2 / (pow(va / n_a, 2) / (n_a - 1.0)
        |      + pow(vb / n_b, 2) / (n_b - 1.0)), 6) END AS df
        |FROM e""".stripMargin

  /** Shared by `signal_correlation` and its E21 gated stream
    * face `stream_signal_matrix` — additive integer sufficient
    * statistics + the same finisher, one SQL proves both. */
  private[graft] val signalCorrelationSql: String = {
      def p(a: String, b: String, sx: String, sy: String,
            sxx: String, syy: String, sxy: String) = {
        val dx = s"(CAST(n AS DOUBLE) * CAST($sxx AS DOUBLE)" +
          s" - CAST($sx AS DOUBLE) * CAST($sx AS DOUBLE))"
        val dy = s"(CAST(n AS DOUBLE) * CAST($syy AS DOUBLE)" +
          s" - CAST($sy AS DOUBLE) * CAST($sy AS DOUBLE))"
        s"""SELECT '$a' AS signal_a, '$b' AS signal_b, n,
           |    CASE WHEN $dx = 0.0 OR $dy = 0.0 THEN NULL
           |    ELSE (CAST(n AS DOUBLE) * CAST($sxy AS DOUBLE)
           |       - CAST($sx AS DOUBLE) * CAST($sy AS DOUBLE))
           |    / (sqrt($dx) * sqrt($dy)) END
           |      AS pearson_r
           |  FROM s"""
      }
      s"""WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk,
        |    string_split_regex(
        |      regexp_replace(text, '^\\s+|\\s+$$', '', 'g'), '\\s+') AS tk2
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS DOUBLE) AS n,
        |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |    CAST(len(list_filter(tk, x -> list_contains(
        |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h,
        |    CAST(len(tk) AS BIGINT) AS ntok,
        |    list_transform(range(1, greatest(len(tk2) - 1, 1)),
        |      i -> tk2[i] || ' ' || tk2[i+1] || ' ' || tk2[i+2]) AS g
        |  FROM t),
        |m AS (
        |  SELECT
        |    CAST(round((0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((h / n) * 8.0, 1.0)) * 1000000.0) AS BIGINT) AS q,
        |    CAST(round((CASE WHEN len(g) = 0 THEN 0.0
        |      ELSE CAST(len(g) - len(list_distinct(g)) AS DOUBLE)
        |           / CAST(len(g) AS DOUBLE) END) * 1000000.0) AS BIGINT) AS r,
        |    ntok AS tokl
        |  FROM c),
        |s AS (
        |  SELECT COUNT(*) AS n,
        |    SUM(q) AS sq, SUM(r) AS sr, SUM(tokl) AS st,
        |    SUM(q*q) AS sqq, SUM(r*r) AS srr, SUM(tokl*tokl) AS stt,
        |    SUM(q*r) AS sqr, SUM(q*tokl) AS sqt, SUM(r*tokl) AS srt
        |  FROM m)
        |SELECT signal_a, signal_b, n, pearson_r FROM (
        |  ${p("quality", "repetition", "sq", "sr", "sqq", "srr", "sqr")}
        |  UNION ALL ${p("quality", "tokens", "sq", "st", "sqq", "stt", "sqt")}
        |  UNION ALL ${p("repetition", "tokens", "sr", "st", "srr", "stt", "srt")})
        |ORDER BY signal_a, signal_b""".stripMargin
    }

  /** D103 Heaps-law oracle: first-occurrence vocabulary counts at the
    * 10 integer thresholds, then the OLS chain in the SAME textual
    * order as the Spark reduceLeft (left-assoc ln sums).
    */
  private[graft] def heapsOracle: String = {
    def thr(i: Int) = s"(lo + ((hi - lo) * $i) // 10)"
    val vLegs = (1 to 10).map(i =>
      s"CAST(SUM(CASE WHEN fd <= ${thr(i)} THEN 1 ELSE 0 END) AS BIGINT) AS v$i")
      .mkString(",\n      ")
    val dLegs = (1 to 10).map(i =>
      s"CAST(SUM(CASE WHEN doc_id <= ${thr(i)} THEN 1 ELSE 0 END) AS BIGINT) AS d$i")
      .mkString(",\n      ")
    val sx = (1 to 10).map(i => s"ln(CAST(d$i AS DOUBLE))").mkString(" + ")
    val sy = (1 to 10).map(i => s"ln(CAST(v$i AS DOUBLE))").mkString(" + ")
    val sxy = (1 to 10).map(i =>
      s"ln(CAST(d$i AS DOUBLE)) * ln(CAST(v$i AS DOUBLE))").mkString(" + ")
    val sxx = (1 to 10).map(i =>
      s"ln(CAST(d$i AS DOUBLE)) * ln(CAST(d$i AS DOUBLE))").mkString(" + ")
    s"""WITH tk AS (
       |  SELECT doc_id, unnest(list_filter(
       |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))
       |    AS term
       |  FROM documents),
       |ft AS (SELECT term, MIN(doc_id) AS fd FROM tk GROUP BY 1),
       |b AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents),
       |v AS (SELECT
       |      $vLegs
       |  FROM ft CROSS JOIN b),
       |d AS (SELECT
       |      $dLegs
       |  FROM documents CROSS JOIN b),
       |j AS (SELECT * FROM v CROSS JOIN d),
       |o AS (SELECT d10, v10,
       |    ($sx) AS sx, ($sy) AS sy, ($sxy) AS sxy, ($sxx) AS sxx
       |  FROM j)
       |SELECT d10 AS n_docs, v10 AS vocab,
       |  CASE WHEN 10.0 * sxx - sx * sx > 0.0 THEN
       |    round((10.0 * sxy - sx * sy) / (10.0 * sxx - sx * sx), 6)
       |  END AS beta,
       |  CASE WHEN 10.0 * sxx - sx * sx > 0.0 THEN
       |    round((sy - (10.0 * sxy - sx * sy) / (10.0 * sxx - sx * sx)
       |      * sx) / 10.0, 6)
       |  END AS ln_k
       |FROM o""".stripMargin
  }

  /** Shared by `mixture_resample` and its E13 stream face — admission
    * is a pure function of (doc_id, frozen fraction), so the admitted
    * stream equals the batch resample row-for-row. */
  private[graft] val mixtureResampleSql: String =
    s"""WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents),
      |hh AS (
      |  SELECT doc_id,
      |    len(list_filter(tk, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS he,
      |    len(list_filter(tk, x -> list_contains(['le','la','et','les','des','un','une'], x))) AS hf,
      |    len(list_filter(tk, x -> list_contains(['der','die','und','das','ein','nicht'], x))) AS hd,
      |    len(list_filter(tk, x -> list_contains(['el','los','y','que','un','una','en'], x))) AS hs
      |  FROM t),
      |lang AS (
      |  SELECT doc_id, $langCase AS pred_lang
      |  FROM hh),
      |h AS (
      |  SELECT doc_id, $xxhBucket AS bucket
      |  FROM (${xxh64Nested("SELECT doc_id FROM documents", "doc_id")}))
      |SELECT doc_id, pred_lang
      |FROM lang JOIN h USING (doc_id)
      |WHERE CAST(bucket AS DOUBLE) <
      |  CASE pred_lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 1.0 WHEN 'de' THEN 0.25
      |                 WHEN 'es' THEN 0.75 ELSE 0.1 END * 1000000
      |ORDER BY doc_id""".stripMargin

  /** Shared by `paragraph_dedup` and its E15 stream face — stripping
    * against the frozen digest set is a per-doc pure function, so
    * stream ≡ batch exactly.
    *
    * D53: fixed 12-word paragraphs; a paragraph is boilerplate iff
    * its text occurs in >= 2 distinct docs; survivors reassemble in
    * order. (range() can't take lateral column args — join-filter
    * against the max paragraph count, 16 covers the 99-token max.)
    */
  private[graft] val paragraphDedupSql: String =
    """WITH toks AS (SELECT doc_id,
      |    string_split_regex(trim(text), '\s+') AS tk FROM documents),
      |paras AS (
      |  SELECT t.doc_id, i.i AS para_idx,
      |    array_to_string(tk[(i.i*12+1):(i.i*12+12)], ' ') AS para
      |  FROM toks t JOIN range(0, 16) AS i(i)
      |    ON i.i < CAST(ceil(len(tk)/12.0) AS BIGINT)),
      |dup AS (SELECT para FROM paras
      |  GROUP BY para HAVING COUNT(DISTINCT doc_id) >= 2),
      |kept AS (SELECT * FROM paras WHERE para NOT IN (SELECT para FROM dup)),
      |agg AS (SELECT doc_id, COUNT(*) AS n_kept,
      |  string_agg(para, ' ' ORDER BY para_idx) AS clean_text
      |  FROM kept GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(ceil(len(string_split_regex(trim(d.text), '\s+'))/12.0) AS BIGINT)
      |    AS n_paras,
      |  CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
      |  COALESCE(a.clean_text, '') AS clean_text
      |FROM documents d LEFT JOIN agg a USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** Shared by `source_concentration` and its E25 stream face —
    * additive group counts + the same finisher, one SQL proves
    * both. */
  private[graft] val sourceConcentrationSql: String =
    """WITH c AS (SELECT source AS k, COUNT(*) AS c
        |  FROM documents GROUP BY 1),
        |r AS (SELECT k, c,
        |    CAST(ROW_NUMBER() OVER (ORDER BY c ASC, k ASC) AS HUGEINT) AS i
        |  FROM c),
        |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
        |    CAST(SUM(c) AS BIGINT) AS total,
        |    SUM(i * c) AS ric, SUM(CAST(c AS HUGEINT) * c) AS c2,
        |    CAST(MAX(c) AS BIGINT) AS cmax
        |  FROM r)
        |SELECT n_groups, total,
        |  CASE WHEN n_groups > 0 AND total > 0 THEN
        |    round((2.0 * CAST(ric AS DOUBLE)
        |      - (CAST(n_groups AS DOUBLE) + 1.0) * CAST(total AS DOUBLE))
        |      / (CAST(n_groups AS DOUBLE) * CAST(total AS DOUBLE)), 6)
        |  END AS gini,
        |  CASE WHEN total > 0 THEN
        |    round(CAST(c2 AS DOUBLE)
        |      / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)), 6)
        |  END AS hhi,
        |  CASE WHEN total > 0 THEN
        |    round(CAST(cmax AS DOUBLE) / CAST(total AS DOUBLE), 6)
        |  END AS top_share
        |FROM a""".stripMargin

  private[graft] val madOutliersSql: String =
    """WITH b AS (SELECT event_id, event_type, value,
      |    CAST(floor(value * 100.0) AS BIGINT) AS bk FROM events),
      |h AS (SELECT event_type, bk, COUNT(*) AS c FROM b GROUP BY 1, 2),
      |cumt AS (SELECT event_type, bk,
      |    SUM(c) OVER (PARTITION BY event_type ORDER BY bk
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(c) OVER (PARTITION BY event_type) AS total
      |  FROM h),
      |med AS (SELECT event_type,
      |    MIN(CASE WHEN cum >= 0.5 * total THEN bk END) AS med_bk
      |  FROM cumt GROUP BY 1),
      |dh AS (SELECT h.event_type, abs(bk - med_bk) AS dev, SUM(c) AS c
      |  FROM h JOIN med USING (event_type) GROUP BY 1, 2),
      |dcum AS (SELECT event_type, dev,
      |    SUM(c) OVER (PARTITION BY event_type ORDER BY dev
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(c) OVER (PARTITION BY event_type) AS total
      |  FROM dh),
      |mad AS (SELECT event_type,
      |    MIN(CASE WHEN cum >= 0.5 * total THEN dev END) AS mad_bk
      |  FROM dcum GROUP BY 1)
      |SELECT event_id, b.event_type, value,
      |  med_bk / 100.0 AS median, mad_bk / 100.0 AS mad,
      |  (mad_bk > 0 AND abs(bk - med_bk) > 3 * mad_bk) AS is_outlier
      |FROM b JOIN med USING (event_type) JOIN mad USING (event_type)
      |ORDER BY event_id""".stripMargin

  private[graft] def bootstrapOracle(replicas: Int, alpha: Double): String = {
    val lo = math.ceil(alpha * replicas).toInt
    val hi = replicas - lo + 1
    def d(x: Double) = s"CAST('$x' AS DOUBLE)"
    val whens = graft.operators.Bootstrap.cum.zipWithIndex
      .map { case (c, k) => s"WHEN uu < ${d(c)} THEN $k" }.mkString(" ")
    val inner = xxh64Nested(
      s"SELECT doc_id, qm, b, doc_id * $replicas + b AS idx FROM r", "idx")
    s"""WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    CAST(len(tk) AS DOUBLE) AS n,
      |    CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
      |    CAST(len(list_filter(tk, x -> list_contains(
      |      ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS h
      |  FROM t),
      |q AS (
      |  SELECT doc_id,
      |    CAST(round((0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
      |      + 0.2 * least((h / n) * 8.0, 1.0)) * 1000000.0) AS BIGINT) AS qm
      |  FROM c),
      |r AS (SELECT doc_id, qm, unnest(range(0, $replicas)) AS b FROM q),
      |hh AS ($inner),
      |w AS (
      |  SELECT b, qm, CASE $whens ELSE 8 END AS w
      |  FROM (SELECT b, qm,
      |      (CAST(hout // 2048 AS DOUBLE) + 0.5) / 9007199254740992.0 AS uu
      |    FROM hh)),
      |m AS (
      |  SELECT b, CAST(SUM(w * qm) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS mb
      |  FROM w GROUP BY b),
      |arr AS (SELECT list_sort(list(mb)) AS a, COUNT(*) AS n_replicas FROM m),
      |mn AS (SELECT round(CAST(SUM(qm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
      |  AS mean FROM q)
      |SELECT n_replicas, mean, a[$lo] AS ci_lo, a[$hi] AS ci_hi
      |FROM arr CROSS JOIN mn""".stripMargin
  }

  /** Query-likelihood oracle: mirrors
    * [[graft.operators.TextRank.queryLikelihoodTopK]] node for node —
    * same token filter, same sorted-term left-to-right sum, same
    * (μ·cf/|C|) association; only `ln` can drift (1 ulp between
    * libms), absorbed by the 6-dp rounding that runs before ORDER BY
    * on both sides.
    */
  private[graft] def qlOracle(terms: Seq[String], k: Int, mu: Double): String = {
    val sorted = terms.distinct.sorted
    val tfCols = sorted.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(",\n    ")
    val cfCols = sorted.indices.map(i => s"SUM(tf$i) AS cf$i")
      .mkString(",\n    ")
    val termScores = sorted.indices.map { i =>
      s"ln((tf$i + $mu * cf$i / sumdl) / (dl + $mu))"
    }.mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents),
       |t AS (
       |  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
       |    $tfCols
       |  FROM d),
       |s AS (
       |  SELECT SUM(dl) AS sumdl,
       |    $cfCols
       |  FROM t)
       |SELECT doc_id, round($termScores, 6) AS score FROM t, s
       |ORDER BY score DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  /** Profile oracle: one UNION ALL branch per column, numerics
    * canonicalized through DECIMAL(38,6) exactly like
    * [[graft.operators.Profile.profile]].
    */
  private[graft] def profileOracle(table: String, cols: Seq[String],
                            numeric: Set[String]): String = {
    val branches = cols.map { c =>
      val canon = (e: String) =>
        if (numeric(c)) s"CAST(CAST($e AS DECIMAL(38,6)) AS VARCHAR)"
        else s"CAST($e AS VARCHAR)"
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  ${canon(s"MIN($c)")} AS min_val,
         |  ${canon(s"MAX($c)")} AS max_val FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"SELECT * FROM (\n$branches\n) ORDER BY col_name"
  }

  /** EWMA oracle: DuckDB's `list_reduce` seeds from the first element
    * and folds left — exactly [[graft.operators.Ewma.smooth]]'s
    * `aggregate(slice(…, 2, n−1), first, …)`. The α constants are
    * emitted from the same Scala doubles (shortest-roundtrip repr), and
    * every fold step is IEEE +,· — bit-identical across engines.
    */
  private[graft] def ewmaOracle(alpha: Double): String = {
    val a = alpha.toString
    val b = (1.0 - alpha).toString
    s"""WITH daily AS (
       |  SELECT user_id, date_trunc('day', ts) AS day,
       |    SUM(CAST(value AS DECIMAL(12,2))) AS dval
       |  FROM events GROUP BY 1, 2),
       |arr AS (
       |  SELECT user_id, list(CAST(dval AS DOUBLE) ORDER BY day) AS vals
       |  FROM daily GROUP BY 1)
       |SELECT user_id, CAST(len(vals) AS INTEGER) AS n_periods,
       |  list_reduce(vals, (acc, x) -> ($a * x) + ($b * acc)) AS ewma
       |FROM arr ORDER BY user_id""".stripMargin
  }

  /** Holt oracle: the two-component (level, trend) fold as a
    * list_reduce over list-typed elements (the vocabTokenize
    * accumulator trick — init state prepended, inputs lifted to
    * [x, 0.0]); `newl` appears textually twice where the engine
    * computes it once — identical bits either way. Same α/β literal
    * treatment as [[ewmaOracle]].
    */
  private[graft] def holtOracle(alpha: Double, beta: Double): String = {
    val a = alpha.toString; val oa = (1.0 - alpha).toString
    val b = beta.toString; val ob = (1.0 - beta).toString
    val newl = s"($a * e[1]) + ($oa * (acc[1] + acc[2]))"
    s"""WITH daily AS (
       |  SELECT user_id, date_trunc('day', ts) AS day,
       |    SUM(CAST(value AS DECIMAL(12,2))) AS dval
       |  FROM events GROUP BY 1, 2),
       |arr AS (
       |  SELECT user_id, list(CAST(dval AS DOUBLE) ORDER BY day) AS vals
       |  FROM daily GROUP BY 1),
       |f AS (
       |  SELECT user_id, CAST(len(vals) AS INTEGER) AS n_periods,
       |    list_reduce(
       |      list_prepend(
       |        [vals[1], CASE WHEN len(vals) >= 2
       |                       THEN vals[2] - vals[1] ELSE 0.0 END],
       |        list_transform(vals[2:], x -> [x, 0.0])),
       |      (acc, e) -> [$newl,
       |        ($b * (($newl) - acc[1])) + ($ob * acc[2])]) AS st
       |  FROM arr)
       |SELECT user_id, n_periods, st[1] AS level, st[2] AS trend,
       |  st[1] + st[2] AS forecast
       |FROM f ORDER BY user_id""".stripMargin
  }

  /** Holt–Winters oracle: the [l, b, t, s_1..s_m] accumulator rides a
    * DOUBLE list; fold items lift to [x]; the seasonal slot updates
    * through DuckDB's 1-based indexed list lambda (Spark's transform
    * is 0-based — the +1 offset is the only difference); `newl` is
    * textually duplicated where the engine computes it once —
    * identical bits (the C61 argument).
    */
  private[graft] def holtWintersOracle(alpha: Double, beta: Double,
                                gamma: Double, m: Int): String = {
    val a = alpha.toString; val oa = (1.0 - alpha).toString
    val b = beta.toString; val ob = (1.0 - beta).toString
    val g = gamma.toString; val og = (1.0 - gamma).toString
    val slot = s"(((CAST(acc[3] + 1.0 AS INTEGER) - 1) % $m) + 1)"
    val sOld = s"acc[$slot + 3]"
    val newl = s"($a * (e[1] - $sOld)) + ($oa * (acc[1] + acc[2]))"
    val newb = s"($b * (($newl) - acc[1])) + ($ob * acc[2])"
    val news = s"($g * (e[1] - ($newl))) + ($og * $sOld)"
    val nextIdx = s"((CAST(len(vals) AS INTEGER) % $m) + 1 + 3)"
    s"""WITH daily AS (
       |  SELECT event_type, date_trunc('day', ts) AS day,
       |    SUM(CAST(value AS DECIMAL(12,2))) AS dval
       |  FROM events GROUP BY 1, 2),
       |arr AS (
       |  SELECT event_type, list(CAST(dval AS DOUBLE) ORDER BY day) AS vals
       |  FROM daily GROUP BY 1),
       |ok AS (SELECT * FROM arr WHERE len(vals) >= ${2 * m}),
       |ini AS (
       |  SELECT event_type, vals,
       |    list_reduce(list_prepend(0.0, vals[1:$m]),
       |      (x, y) -> x + y) / $m AS l0,
       |    list_reduce(list_prepend(0.0,
       |      list_transform(range(1, ${m + 1}), i -> vals[i + $m] - vals[i])),
       |      (x, y) -> x + y) / ${m * m} AS b0
       |  FROM ok),
       |f AS (
       |  SELECT event_type, CAST(len(vals) AS INTEGER) AS n_periods, vals,
       |    list_reduce(
       |      list_prepend(
       |        list_concat([l0, b0, CAST($m AS DOUBLE)],
       |          list_transform(vals[1:$m], x -> x - l0)),
       |        list_transform(vals[${m + 1}:], x -> [x])),
       |      (acc, e) -> list_transform(acc, (v, i) -> CASE
       |        WHEN i = 1 THEN $newl
       |        WHEN i = 2 THEN $newb
       |        WHEN i = 3 THEN acc[3] + 1.0
       |        WHEN i = $slot + 3 THEN $news
       |        ELSE v END)) AS st
       |  FROM ini)
       |SELECT event_type, n_periods, st[1] AS level, st[2] AS trend,
       |  st[$nextIdx] AS season_next,
       |  st[1] + st[2] + st[$nextIdx] AS forecast
       |FROM f ORDER BY event_type""".stripMargin
  }

  /** Greedy-tokenizer oracle: the kernel's recurrence as a list_reduce
    * fold — acc = [count, skip] rides the element type (the init row
    * [[0,0]] is prepended because DuckDB's list_reduce seeds from the
    * first element). Longest-match checks mirror the HOF twin's
    * coalesce chain: substr truncation near the string end makes the
    * longer branches find shorter candidates exactly like the kernel's
    * m = min(maxLen, n-i) bound. Pure string/integer ops — bit-exact.
    */
  private[graft] def vocabTokenizeOracle(vocab: Seq[String], maxLen: Int): String = {
    // SQL-escape entries — an apostrophe vocab entry ("'s") is
    // plausible for English subwords and must not break the generator
    val vlit = vocab.filter(_.length >= 2)
      .map(v => s"'${v.replace("'", "''")}'").mkString("[", ", ", "]")
    val whens = (maxLen to 2 by -1).map { l =>
      s"WHEN list_contains($vlit, substr(w, CAST(x[1] AS INTEGER), $l)) " +
        s"THEN substr(w, CAST(x[1] AS INTEGER), $l)"
    }.mkString(" ")
    val tok = s"CASE $whens ELSE substr(w, CAST(x[1] AS INTEGER), 1) END"
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
       |c AS (
       |  SELECT doc_id, CAST(len(ws) AS INTEGER) AS n_words,
       |    list_transform(ws, w ->
       |      list_reduce(
       |        [[CAST(0 AS BIGINT), CAST(0 AS BIGINT)]]
       |          || list_transform(range(1, len(w) + 1), i -> [i, CAST(0 AS BIGINT)]),
       |        (acc, x) -> CASE WHEN acc[2] > 0 THEN [acc[1], acc[2] - 1]
       |          ELSE [acc[1] + 1, CAST(len($tok) AS BIGINT) - 1] END
       |      )[1]) AS counts
       |  FROM t)
       |SELECT doc_id, n_words,
       |  CAST(list_sum(counts) AS INTEGER) AS n_subtokens
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** OOV-rate oracle: the [[vocabTokenizeOracle]] fold with a
    * 3-element accumulator [pieces, fallbacks, skip] — the fallback
    * counter increments exactly when the greedy CASE emitted a
    * 1-char piece (every vocab entry is ≥2 chars, so length 1 ⇔
    * fallback). Per-word triples sum per doc, then per language;
    * the one divide rounds 6 dp on both engines.
    */
  private[graft] def vocabOovOracle(vocab: Seq[String], maxLen: Int): String = {
    val vlit = vocab.filter(_.length >= 2)
      .map(v => s"'${v.replace("'", "''")}'").mkString("[", ", ", "]")
    val whens = (maxLen to 2 by -1).map { l =>
      s"WHEN list_contains($vlit, substr(w, CAST(x[1] AS INTEGER), $l)) " +
        s"THEN substr(w, CAST(x[1] AS INTEGER), $l)"
    }.mkString(" ")
    val tok = s"CASE $whens ELSE substr(w, CAST(x[1] AS INTEGER), 1) END"
    s"""WITH t AS (
       |  SELECT lang, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
       |c AS (
       |  SELECT lang,
       |    list_transform(ws, w ->
       |      list_reduce(
       |        [[CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)]]
       |          || list_transform(range(1, len(w) + 1),
       |               i -> [i, CAST(0 AS BIGINT), CAST(0 AS BIGINT)]),
       |        (acc, x) -> CASE WHEN acc[3] > 0 THEN [acc[1], acc[2], acc[3] - 1]
       |          ELSE [acc[1] + 1,
       |                acc[2] + (CASE WHEN len($tok) = 1 THEN 1 ELSE 0 END),
       |                CAST(len($tok) AS BIGINT) - 1] END
       |      )) AS cs
       |  FROM t),
       |a AS (
       |  SELECT lang,
       |    list_sum(list_transform(cs, c -> c[1])) AS np,
       |    list_sum(list_transform(cs, c -> c[2])) AS nf
       |  FROM c)
       |SELECT lang, CAST(SUM(np) AS BIGINT) AS n_pieces,
       |  CAST(SUM(nf) AS BIGINT) AS n_fallback,
       |  round(CAST(SUM(nf) AS DOUBLE) / CAST(SUM(np) AS DOUBLE), 6) AS oov_rate
       |FROM a GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Token-ID oracle: the [[vocabTokenizeOracle]] fold with a LIST
    * accumulator — acc = [skip] ‖ ids-so-far (uniform BIGINT[], so it
    * rides list_reduce's element type like the count fold's [count,
    * skip] pair). In-vocab ids mirror `list_position − 1` against the
    * SAME ordered effective vocab the Spark map literal indexes;
    * fallback ids are `V + ascii(tok)` — `ascii` is the Unicode
    * codepoint of a 1-char string in both engines on this corpus's
    * BMP text. Pure string/integer ops — exact.
    */
  private[graft] def vocabTokenizeIdsOracle(vocab: Seq[String], maxLen: Int): String = {
    val effective = vocab.filter(v => v.codePointCount(0, v.length) >= 2)
    val vlit = effective
      .map(v => s"'${v.replace("'", "''")}'").mkString("[", ", ", "]")
    val vSize = effective.length
    val whens = (maxLen to 2 by -1).map { l =>
      s"WHEN list_contains($vlit, substr(w, CAST(x[1] AS INTEGER), $l)) " +
        s"THEN substr(w, CAST(x[1] AS INTEGER), $l)"
    }.mkString(" ")
    val tok = s"CASE $whens ELSE substr(w, CAST(x[1] AS INTEGER), 1) END"
    // NULLIF guard: list_position signals "not found" as 0 here (not
    // NULL) — without it the fallback branch would read -1
    val idExpr = s"COALESCE(CAST(NULLIF(list_position($vlit, $tok), 0) - 1 AS BIGINT), " +
      s"CAST($vSize AS BIGINT) + ascii($tok))"
    s"""WITH t AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
       |c AS (
       |  SELECT doc_id,
       |    flatten(list_transform(ws, w ->
       |      list_slice(
       |        list_reduce(
       |          [[CAST(0 AS BIGINT)]]
       |            || list_transform(range(1, len(w) + 1), i -> [CAST(i AS BIGINT)]),
       |          (acc, x) -> CASE WHEN acc[1] > 0
       |            THEN [acc[1] - 1] || list_slice(acc, 2, len(acc))
       |            ELSE [CAST(len($tok) AS BIGINT) - 1]
       |              || list_slice(acc, 2, len(acc)) || [$idExpr] END
       |        ), 2, 1000000000))) AS ids
       |  FROM t)
       |SELECT doc_id, CAST(len(ids) AS INTEGER) AS n_tokens,
       |  array_to_string(list_transform(ids, x -> CAST(x AS VARCHAR)), '-') AS token_ids
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** Integer PageRank oracle: fixed iterations unroll into chained
    * CTEs (no recursion needed — the generator emits r1..rI), each one
    * aggregate over the outdegree-joined edges plus the base term.
    * Every operation is BIGINT arithmetic (integer sums are
    * order-independent, `//` matches Spark's DIV on non-negatives) —
    * hash-exact.
    */
  private[graft] def pageRankOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT n.id,
         |    (SELECT base FROM params) + (85 * COALESCE(s.c, 0)) // 100 AS "rank"
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, SUM(r."rank" // e.outdeg) AS c
         |    FROM eo e JOIN r${k - 1} r ON r.id = e.src
         |    GROUP BY e.dst) s ON s.dst = n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH cs AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS src, s AS dst FROM cs
       |  UNION SELECT s, c FROM cs),
       |nodes AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       |  UNION ALL SELECT s_suppkey + 1000000 FROM supplier),
       |params AS (SELECT CAST(1000000000 // COUNT(*) AS BIGINT) AS r0,
       |  CAST((15 * (1000000000 // COUNT(*))) // 100 AS BIGINT) AS base
       |  FROM nodes),
       |outd AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
       |eo AS (SELECT e.src, e.dst, o.outdeg FROM edges e JOIN outd o USING (src)),
       |r0 AS (SELECT id, (SELECT r0 FROM params) AS "rank" FROM nodes),
       |$iterCtes
       |SELECT id, CAST("rank" AS BIGINT) AS "rank" FROM r$iters
       |ORDER BY id""".stripMargin
  }

  /** D116 oracle — [[weightedPageRankOracle]]'s unrolled integer
    * iteration over the WORD co-occurrence graph (the D111 adjacency
    * census, both orientations, self-loops dropped); word ids are
    * VARCHAR join keys, every rank an exact BIGINT, the top-k cut a
    * total (rank DESC, word) order.
    */
  private[graft] def keywordTextRankOracle(iters: Int, k: Int): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT n.id,
         |    (SELECT base FROM params) + (85 * COALESCE(s.c, 0)) // 100 AS "rank"
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, SUM((r."rank" * e.w) // e.wout) AS c
         |    FROM eo e JOIN r${i - 1} r ON r.id = e.src
         |    GROUP BY e.dst) s ON s.dst = n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (
       |  SELECT CASE WHEN len(trim(text)) > 0
       |    THEN string_split_regex(trim(text), '\\s+')
       |    ELSE [] END AS tk
       |  FROM documents),
       |pr AS (
       |  SELECT unnest(list_transform(range(1, len(tk)),
       |    i -> [tk[i], tk[i+1]])) AS p
       |  FROM t),
       |ad AS (SELECT p[1] AS a, p[2] AS b FROM pr WHERE p[1] <> p[2]),
       |edges AS MATERIALIZED (SELECT src, dst, COUNT(*) AS w FROM (
       |    SELECT a AS src, b AS dst FROM ad
       |    UNION ALL SELECT b AS src, a AS dst FROM ad)
       |  GROUP BY 1, 2),
       |nodes AS MATERIALIZED (
       |  SELECT DISTINCT unnest(tk) AS id FROM t),
       |params AS (SELECT CAST(1000000000 // COUNT(*) AS BIGINT) AS r0,
       |  CAST((15 * (1000000000 // COUNT(*))) // 100 AS BIGINT) AS base
       |  FROM nodes),
       |outd AS (SELECT src, SUM(w) AS wout FROM edges GROUP BY src),
       |eo AS MATERIALIZED (SELECT e.src, e.dst, e.w, o.wout
       |  FROM edges e JOIN outd o USING (src)),
       |r0 AS (SELECT id, (SELECT r0 FROM params) AS "rank" FROM nodes),
       |$iterCtes
       |SELECT id AS word, CAST("rank" AS BIGINT) AS "rank" FROM r$iters
       |ORDER BY "rank" DESC, word LIMIT $k""".stripMargin
  }

  /** Weighted PageRank oracle: the [[pageRankOracle]] unrolled-CTE
    * shape with per-edge BIGINT weights — contribution
    * `(rank·w) // wout` mirrors Centrality.weightedPageRank's integer
    * fixed point term-for-term, so the hash is exact.
    */
  private[graft] def weightedPageRankOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT n.id,
         |    (SELECT base FROM params) + (85 * COALESCE(s.c, 0)) // 100 AS "rank"
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, SUM((r."rank" * e.w) // e.wout) AS c
         |    FROM eo e JOIN r${k - 1} r ON r.id = e.src
         |    GROUP BY e.dst) s ON s.dst = n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH cs AS (
       |  SELECT o_custkey AS c, l_suppkey + 1000000 AS s,
       |    COUNT(*) AS w
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  GROUP BY 1, 2),
       |edges AS (SELECT c AS src, s AS dst, w FROM cs
       |  UNION ALL SELECT s, c, w FROM cs),
       |nodes AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       |  UNION ALL SELECT s_suppkey + 1000000 FROM supplier),
       |params AS (SELECT CAST(1000000000 // COUNT(*) AS BIGINT) AS r0,
       |  CAST((15 * (1000000000 // COUNT(*))) // 100 AS BIGINT) AS base
       |  FROM nodes),
       |outw AS (SELECT src, SUM(w) AS wout FROM edges GROUP BY src),
       |eo AS (SELECT e.src, e.dst, e.w, o.wout FROM edges e JOIN outw o USING (src)),
       |r0 AS (SELECT id, (SELECT r0 FROM params) AS "rank" FROM nodes),
       |$iterCtes
       |SELECT id, CAST("rank" AS BIGINT) AS "rank" FROM r$iters
       |ORDER BY id""".stripMargin
  }

  /** Personalized PageRank oracle: same unrolled-CTE shape as
    * [[pageRankOracle]] with a per-node teleport share t(v) (BUILDING
    * customers weight 1, all else 0) replacing the scalar base — the
    * per-node `(15·t) // 100` term rides the nodes CTE through every
    * iteration. All-BIGINT, hash-exact.
    */
  private[graft] def personalizedPageRankOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT n.id,
         |    (15 * n.t) // 100 + (85 * COALESCE(s.c, 0)) // 100 AS "rank"
         |  FROM tv n LEFT JOIN (
         |    SELECT e.dst, SUM(r."rank" // e.outdeg) AS c
         |    FROM eo e JOIN r${k - 1} r ON r.id = e.src
         |    GROUP BY e.dst) s ON s.dst = n.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH cs AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS src, s AS dst FROM cs
       |  UNION SELECT s, c FROM cs),
       |nodes AS (SELECT CAST(c_custkey AS BIGINT) AS id,
       |    CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(1 AS BIGINT)
       |         ELSE CAST(0 AS BIGINT) END AS w
       |  FROM customer
       |  UNION ALL SELECT s_suppkey + 1000000, 0 FROM supplier),
       |tv AS (SELECT id,
       |    CAST((1000000000 * w) // (SELECT SUM(w) FROM nodes) AS BIGINT) AS t
       |  FROM nodes),
       |outd AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
       |eo AS (SELECT e.src, e.dst, o.outdeg FROM edges e JOIN outd o USING (src)),
       |r0 AS (SELECT id, t AS "rank" FROM tv),
       |$iterCtes
       |SELECT id, CAST("rank" AS BIGINT) AS "rank" FROM r$iters
       |ORDER BY id""".stripMargin
  }

  /** HITS oracle: the authority/hub half-steps unroll into chained
    * CTEs; the integer normalizer `GREATEST(1, SUM(s) OVER () // SCALE)`
    * mirrors the operator exactly (no s·SCALE product — overflow-safe
    * on both engines). The normalizer is a WINDOW total, not a scalar
    * subquery, so each CTE is referenced exactly ONCE downstream — a
    * scalar `(SELECT SUM(s) FROM a_k_raw)` would reference the chain
    * twice per half-step and, under CTE inlining, double the plan each
    * of the 16 half-steps (2^16 parquet scans → fd exhaustion). DuckDB
    * SUMs widen to HUGEINT; every emitted column is cast back to
    * BIGINT.
    */
  private[graft] def hitsOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""a$k AS (
         |  SELECT id, s // GREATEST(1, SUM(s) OVER () // 1000000000)
         |    AS authority FROM (
         |    SELECT n.id, COALESCE(s.c, 0) AS s FROM nodes n LEFT JOIN (
         |      SELECT e.dst, SUM(h.hub) AS c FROM edges e
         |      JOIN h${k - 1} h ON h.id = e.src GROUP BY e.dst) s ON s.dst = n.id)),
         |h$k AS (
         |  SELECT id, s // GREATEST(1, SUM(s) OVER () // 1000000000)
         |    AS hub FROM (
         |    SELECT n.id, COALESCE(s.c, 0) AS s FROM nodes n LEFT JOIN (
         |      SELECT e.src, SUM(a.authority) AS c FROM edges e
         |      JOIN a$k a ON a.id = e.dst GROUP BY e.src) s ON s.src = n.id))""".stripMargin
    }.mkString(",\n")
    s"""WITH cs AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS src, s AS dst FROM cs),
       |nodes AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       |  UNION ALL SELECT s_suppkey + 1000000 FROM supplier),
       |h0 AS (SELECT id, 1000000000 // (SELECT COUNT(*) FROM nodes) AS hub
       |  FROM nodes),
       |$iterCtes
       |SELECT n.id, CAST(a.authority AS BIGINT) AS authority,
       |  CAST(h.hub AS BIGINT) AS hub
       |FROM nodes n JOIN a$iters a ON a.id = n.id JOIN h$iters h ON h.id = n.id
       |ORDER BY n.id""".stripMargin
  }

  /** Label-propagation oracle: the synchronous rounds of
    * [[graft.operators.Community.labelPropagation]] unroll into
    * chained CTEs — plurality histogram per (node, neighbor label),
    * argmax with min-label tiebreak as a ROW_NUMBER pick, isolated
    * nodes carry the previous label via LEFT JOIN + COALESCE. All
    * exact integers; each CTE is referenced a bounded number of times
    * so CTE inlining cannot compound the plan.
    */
  private[graft] def lpaOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""h$k AS (SELECT e.src, l.community, COUNT(*) AS c
         |  FROM e JOIN l${k - 1} l ON l.id = e.dst GROUP BY e.src, l.community),
         |b$k AS (SELECT src AS id, community AS next FROM (
         |    SELECT src, community,
         |      ROW_NUMBER() OVER (PARTITION BY src
         |        ORDER BY c DESC, community ASC) AS rn
         |    FROM h$k) WHERE rn = 1),
         |l$k AS (SELECT l.id, COALESCE(b.next, l.community) AS community
         |  FROM l${k - 1} l LEFT JOIN b$k b USING (id))""".stripMargin
    }.mkString(",\n")
    s"""WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |  FROM lineitem),
       |pr AS (SELECT DISTINCT a.pk AS u, b.pk AS v
       |  FROM lp a JOIN lp b ON a.ok = b.ok AND a.pk < b.pk),
       |e AS (SELECT u AS src, v AS dst FROM pr
       |  UNION ALL SELECT v, u FROM pr),
       |nd AS (SELECT CAST(p_partkey AS BIGINT) AS id FROM part),
       |l0 AS (SELECT id, id AS community FROM nd),
       |$iterCtes,
       |cs AS (SELECT community, COUNT(*) AS csize
       |  FROM l$iters GROUP BY community)
       |SELECT l.id, l.community, cs.csize
       |FROM l$iters l JOIN cs USING (community)
       |ORDER BY l.id""".stripMargin
  }

  /** BFS seed-distance oracle: the frontier rounds of
    * [[graft.operators.Centrality.seedDistance]] unroll into chained
    * CTEs — frontier = nodes stamped last round, reached = distinct
    * out-neighbors, unreached nodes stamp the round number. Exact
    * integers; −1 marks nodes beyond the horizon.
    */
  /** Unrolled min-plus CTE chain mirroring
    * [[graft.operators.Centrality.weightedDistance]] — full relaxation
    * per round, which equals the operator's frontier relaxation round
    * for round (an unimproved node re-offers candidates already
    * applied). All-integer costs, so MIN and the keep CASE cannot
    * diverge. Each round references its predecessor twice →
    * MATERIALIZED keeps the inlining linear.
    */
  private[graft] def ssspOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""d$k AS MATERIALIZED (SELECT d.id,
         |    CASE WHEN d.dist IS NULL THEN c.best
         |         WHEN c.best IS NULL THEN d.dist
         |         WHEN c.best < d.dist THEN c.best ELSE d.dist END AS dist
         |  FROM d${k - 1} d LEFT JOIN (
         |    SELECT e.dst, MIN(d.dist + e.w) AS best
         |    FROM e JOIN d${k - 1} d ON d.id = e.src AND d.dist IS NOT NULL
         |    GROUP BY e.dst) c ON c.dst = d.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH wt AS (
       |  SELECT o_custkey AS c, l_suppkey + 1000000 AS s,
       |    CAST(MIN(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS w
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  GROUP BY 1, 2),
       |e AS MATERIALIZED (SELECT c AS src, s AS dst, w FROM wt
       |  UNION ALL SELECT s, c, w FROM wt),
       |nd AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       |  UNION ALL SELECT s_suppkey + 1000000 FROM supplier),
       |sd AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       |  WHERE c_mktsegment = 'BUILDING'),
       |d0 AS MATERIALIZED (SELECT nd.id,
       |    CASE WHEN sd.id IS NOT NULL THEN CAST(0 AS BIGINT) END AS dist
       |  FROM nd LEFT JOIN sd ON sd.id = nd.id),
       |$iterCtes
       |SELECT id, dist FROM d$iters ORDER BY id""".stripMargin
  }

  private[graft] def bfsOracle(iters: Int): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""f$k AS (SELECT DISTINCT e.dst FROM e JOIN d${k - 1} d
         |  ON d.id = e.src AND d.dist = ${k - 1}),
         |d$k AS (SELECT d.id,
         |    CASE WHEN d.dist >= 0 THEN d.dist
         |         WHEN f.dst IS NOT NULL THEN CAST($k AS BIGINT)
         |         ELSE CAST(-1 AS BIGINT) END AS dist
         |  FROM d${k - 1} d LEFT JOIN f$k f ON f.dst = d.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH cs AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey + 1000000 AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS (SELECT c AS src, s AS dst FROM cs
       |  UNION ALL SELECT s, c FROM cs),
       |nd AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       |  UNION ALL SELECT s_suppkey + 1000000 FROM supplier),
       |sd AS (SELECT CAST(c_custkey AS BIGINT) AS id FROM customer
       |  WHERE c_mktsegment = 'BUILDING'),
       |d0 AS (SELECT nd.id,
       |    CASE WHEN sd.id IS NOT NULL THEN CAST(0 AS BIGINT)
       |         ELSE CAST(-1 AS BIGINT) END AS dist
       |  FROM nd LEFT JOIN sd ON sd.id = nd.id),
       |$iterCtes
       |SELECT id, dist FROM d$iters ORDER BY id""".stripMargin
  }

  /** Unrolled peel-round CTE chain mirroring
    * [[graft.operators.KCore.peelLayers]] round for round: each round
    * recomputes degrees over the surviving edge set, removes nodes of
    * degree < k (recording the 1-based round as the onion layer), and
    * restricts the edge list to survivors. Peeling is confluent and
    * monotone — all-integer degrees, synchronous schedule — so the
    * unrolled chain is bit-identical to the distributed loop.
    * MATERIALIZED on the per-round node/edge CTEs keeps the inlining
    * linear (each is referenced twice downstream).
    */
  private[graft] def kcoreOracle(k: Int, rounds: Int): String = {
    val iterCtes = (1 to rounds).map { r =>
      s"""g$r AS MATERIALIZED (SELECT n.id,
         |    COALESCE(d.deg, 0) AS deg
         |  FROM n${r - 1} n LEFT JOIN (
         |    SELECT src, COUNT(*) AS deg FROM e${r - 1} GROUP BY src) d
         |    ON d.src = n.id),
         |rm$r AS (SELECT id FROM g$r WHERE deg < $k),
         |n$r AS MATERIALIZED (SELECT id FROM g$r WHERE deg >= $k),
         |e$r AS MATERIALIZED (
         |  SELECT e.src, e.dst FROM e${r - 1} e
         |  JOIN n$r a ON e.src = a.id JOIN n$r b ON e.dst = b.id)"""
        .stripMargin
    }.mkString(",\n")
    val layerArms = (1 to rounds).map { r =>
      s"SELECT id, CAST($r AS INTEGER) AS peel_round, FALSE AS in_core FROM rm$r"
    }.mkString("\n  UNION ALL ")
    s"""WITH cs AS (
       |  SELECT o_custkey AS c, l_suppkey + 1000000 AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  WHERE l_quantity >= 40
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
       |e0 AS MATERIALIZED (SELECT c AS src, s AS dst FROM cs
       |  UNION SELECT s, c FROM cs),
       |n0 AS MATERIALIZED (SELECT DISTINCT src AS id FROM e0),
       |$iterCtes
       |$layerArms
       |  UNION ALL SELECT id, CAST(NULL AS INTEGER), TRUE FROM n$rounds
       |ORDER BY id""".stripMargin
  }

  /** Markov removal-effect attribution oracle: journey extraction
    * (rank + first-conversion cut + lead under the same (ts,
    * event_id) total order), the transition matrix pivoted into ONE
    * row, and the integer absorption fixed point unrolled per
    * variant — `full` plus one knockout per channel, where knocking
    * out c is just computing with `p(c) ≡ 0` (mirrors
    * [[graft.operators.Attribution]] term for term; all-integer, so
    * hash-exact).
    */
  private[graft] def markovOracle(iterations: Int): String = {
    val chans = Seq("click", "error", "signup", "view")
    val srcs = "start" +: chans
    def variant(name: String, dead: Option[String]): String = {
      val live = srcs.filterNot(dead.contains)
      val zeros = live.map(v => s"CAST(0 AS BIGINT) AS p_$v").mkString(", ")
      val iters = (1 to iterations).map { k =>
        val exprs = live.map { v =>
          val terms = chans.filterNot(dead.contains)
            .map(u => s"c_${v}_$u * p_$u") :+ s"c_${v}_conv * 1000000000"
          s"CASE WHEN tot_$v = 0 THEN CAST(0 AS BIGINT) " +
            s"ELSE (${terms.mkString(" + ")}) // tot_$v END AS p_$v"
        }.mkString(",\n    ")
        s"p${k}_$name AS (SELECT $exprs FROM m, p${k - 1}_$name)"
      }
      (s"p0_$name AS (SELECT $zeros)" +: iters).mkString(",\n")
    }
    val variants = variant("full", None) +: chans.map(c => variant(c, Some(c)))
    val mCols = (
      (for { s <- srcs; d <- chans :+ "conv" } yield {
        val sLit = if (s == "start") "__START__" else s
        val dLit = if (d == "conv") "__CONV__" else d
        s"CAST(COALESCE(SUM(CASE WHEN src = '$sLit' AND dst = '$dLit' " +
          s"THEN n END), 0) AS BIGINT) AS c_${s}_$d"
      }) ++ srcs.map { s =>
        val sLit = if (s == "start") "__START__" else s
        s"CAST(COALESCE(SUM(CASE WHEN src = '$sLit' THEN n END), 0) " +
          s"AS BIGINT) AS tot_$s"
      }).mkString(",\n    ")
    val remCols = chans.map(c =>
      s"GREATEST(CAST(0 AS BIGINT), (SELECT p_start FROM p${iterations}_full)" +
        s" - (SELECT p_start FROM p${iterations}_$c)) AS r_$c")
      .mkString(",\n    ")
    val arms = chans.map(c =>
      s"""SELECT '$c' AS channel, r_$c AS removal_micro,
         |  CASE WHEN rt = 0 THEN 0.0
         |       ELSE ROUND(CAST(r_$c AS DOUBLE) / CAST(rt AS DOUBLE), 6)
         |  END AS share FROM rem""".stripMargin)
      .mkString("\n  UNION ALL ")
    s"""WITH ev AS (
       |  SELECT user_id, event_type AS t,
       |    row_number() OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS rn
       |  FROM events),
       |fc AS (SELECT user_id, MIN(rn) AS cut FROM ev
       |  WHERE t = 'purchase' GROUP BY user_id),
       |kept AS (SELECT ev.user_id, ev.t, ev.rn
       |  FROM ev LEFT JOIN fc USING (user_id)
       |  WHERE cut IS NULL OR rn <= cut),
       |nx AS (SELECT user_id, t, rn,
       |  lead(t) OVER (PARTITION BY user_id ORDER BY rn) AS nxt FROM kept),
       |steps AS (
       |  SELECT t AS src,
       |    CASE WHEN nxt IS NULL THEN
       |           CASE WHEN t = 'purchase' THEN NULL ELSE '__NULL__' END
       |         WHEN nxt = 'purchase' THEN '__CONV__'
       |         ELSE nxt END AS dst
       |  FROM nx WHERE t != 'purchase'),
       |starts AS (
       |  SELECT '__START__' AS src,
       |    CASE WHEN t = 'purchase' THEN '__CONV__' ELSE t END AS dst
       |  FROM kept WHERE rn = 1),
       |tr AS (SELECT src, dst, COUNT(*) AS n FROM (
       |  SELECT * FROM starts UNION ALL SELECT * FROM steps)
       |  WHERE dst IS NOT NULL GROUP BY 1, 2),
       |m AS (SELECT
       |    $mCols
       |  FROM tr),
       |${variants.mkString(",\n")},
       |rem AS (SELECT *, r_click + r_error + r_signup + r_view AS rt
       |  FROM (SELECT
       |    $remCols)),
       |res AS (
       |  $arms)
       |SELECT channel, removal_micro, share FROM res
       |ORDER BY channel""".stripMargin
  }

  /** Stupid-backoff bigram cross-entropy CTE chain (mirrors
    * [[graft.operators.LanguageModel.crossEntropyBigram]] branch for
    * branch), shared by the `lm_bigram_cross_entropy` oracle and the
    * `perplexity_filter` cut built on top of it. Ends at `s` =
    * (doc_id, nt, sl).
    */
  private[graft] val lmPairCtes: String =
    """d0 AS (
      |  SELECT doc_id, CASE WHEN len(trim(text)) > 0
      |    THEN string_split_regex(trim(text), '\s+')
      |    ELSE CAST([] AS VARCHAR[]) END AS tk
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id,
      |    unnest(list_transform(tk, (w, i) -> struct_pack(i := i, w := w))) AS s
      |  FROM d0),
      |tw AS (SELECT doc_id, s.i AS i, s.w AS w FROM tok),
      |cnt AS (SELECT w, COUNT(*) AS c FROM tw GROUP BY w),
      |top AS (SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 64),
      |lagged AS (
      |  SELECT doc_id, i, w,
      |    lag(w) OVER (PARTITION BY doc_id ORDER BY i) AS prev
      |  FROM tw),
      |pc AS (
      |  SELECT l.prev AS v, l.w AS w, COUNT(*) AS c
      |  FROM lagged l
      |  JOIN top tv ON tv.w = l.prev JOIN top tc ON tc.w = l.w
      |  WHERE l.prev IS NOT NULL GROUP BY l.prev, l.w)""".stripMargin

  private[graft] val bigramCeCtes: String =
    s"""$lmPairCtes,
      |dn AS (SELECT CAST((SELECT SUM(c) FROM cnt)
      |  + (SELECT COUNT(*) FROM top) + 1 AS DOUBLE) AS d),
      |lp AS (
      |  SELECT l.doc_id,
      |    CASE WHEN l.prev IS NULL THEN
      |      COALESCE(ln(CAST(tc.c + 1 AS DOUBLE) / d), ln(1.0 / d))
      |    ELSE
      |      COALESCE(ln(CAST(pc.c AS DOUBLE) / CAST(tv.c AS DOUBLE)),
      |        ln(0.4) + COALESCE(ln(CAST(tc.c + 1 AS DOUBLE) / d), ln(1.0 / d)))
      |    END AS lnS
      |  FROM lagged l
      |  LEFT JOIN top tc ON tc.w = l.w
      |  LEFT JOIN top tv ON tv.w = l.prev
      |  LEFT JOIN pc ON pc.v = l.prev AND pc.w = l.w
      |  CROSS JOIN dn),
      |s AS (SELECT doc_id, COUNT(*) AS nt, SUM(lnS) AS sl
      |      FROM lp GROUP BY doc_id)""".stripMargin

  /** Shared by `perplexity_filter` and the E12 stream gate's
    * threshold derivation: the bigram CE pipeline + the per-language
    * exact-integer 70% rank cut (rounded score, id tiebreak).
    */
  private[graft] val perplexityFilterSql: String =
    s"""WITH $bigramCeCtes,
      |ce AS (
      |  SELECT d.doc_id, d.lang,
      |    COALESCE(round(-sl / nt, 6), CAST(0 AS DOUBLE)) AS cross_entropy
      |  FROM documents d LEFT JOIN s USING (doc_id)),
      |rk AS (
      |  SELECT doc_id, lang, cross_entropy,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY cross_entropy, doc_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM ce)
      |SELECT doc_id, lang, cross_entropy,
      |  (rn <= CAST(ceil(n * 0.7) AS BIGINT)) AS kept
      |FROM rk ORDER BY doc_id""".stripMargin

  /** KN oracle CTEs (D37c): continuation/context tables off the shared
    * `pc` pair counts, and the three-branch interpolated score
    * mirroring [[graft.operators.LanguageModel.trainKneserNey]]'s
    * arithmetic association exactly (unseen-pair branch = two lns
    * ADDED, as the kernel adds the precomputed logs).
    */
  private[graft] val knCeCtes: String =
    s"""$lmPairCtes,
      |ctxk AS (SELECT v, SUM(c) AS cv, COUNT(*) AS n1 FROM pc GROUP BY v),
      |bwd AS (SELECT w, COUNT(*) AS n1b FROM pc GROUP BY w),
      |kdn AS (SELECT CAST((SELECT COUNT(*) FROM pc)
      |  + (SELECT COUNT(*) FROM top) + 1 AS DOUBLE) AS kd),
      |lp AS (
      |  SELECT l.doc_id,
      |    CASE
      |      WHEN l.prev IS NULL OR cx.v IS NULL THEN
      |        ln(CASE WHEN tc.w IS NOT NULL
      |           THEN CAST(COALESCE(bw.n1b, 0) + 1 AS DOUBLE) / kd
      |           ELSE 1.0 / kd END)
      |      WHEN pc.c IS NOT NULL THEN
      |        ln(((CAST(pc.c AS DOUBLE) - 0.75) / CAST(cx.cv AS DOUBLE))
      |          + ((0.75 * CAST(cx.n1 AS DOUBLE)) / CAST(cx.cv AS DOUBLE))
      |            * (CAST(COALESCE(bw.n1b, 0) + 1 AS DOUBLE) / kd))
      |      ELSE
      |        ln((0.75 * CAST(cx.n1 AS DOUBLE)) / CAST(cx.cv AS DOUBLE))
      |        + ln(CASE WHEN tc.w IS NOT NULL
      |             THEN CAST(COALESCE(bw.n1b, 0) + 1 AS DOUBLE) / kd
      |             ELSE 1.0 / kd END)
      |    END AS lnS
      |  FROM lagged l
      |  LEFT JOIN top tc ON tc.w = l.w
      |  LEFT JOIN bwd bw ON bw.w = l.w
      |  LEFT JOIN ctxk cx ON cx.v = l.prev
      |  LEFT JOIN pc ON pc.v = l.prev AND pc.w = l.w
      |  CROSS JOIN kdn),
      |s AS (SELECT doc_id, COUNT(*) AS nt, SUM(lnS) AS sl
      |      FROM lp GROUP BY doc_id)""".stripMargin

  /** TF-IDF oracle: mirrors [[graft.operators.TextRank.tfidfTopK]]
    * node for node — same tokens, same smooth idf, the full-vocabulary
    * L2 norm as Σ(tf·idf)² regrouped freely (absorbed by the 6-dp
    * round), numerator/query-norm in the identical left-assoc order,
    * and the match filter on the exact-integer tf sum.
    */
  private[graft] def tfidfOracle(terms: Seq[String], k: Int): String = {
    val sorted = terms.distinct.sorted
    val tfCols = sorted.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(",\n    ")
    val dfCols = sorted.indices.map { i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df$i"
    }.mkString(",\n    ")
    def idf(i: Int) = s"(ln((1.0 + n) / (1.0 + df$i)) + 1.0)"
    val num = sorted.indices.map(i => s"((tf$i * ${idf(i)}) * ${idf(i)})")
      .mkString(" + ")
    val qnorm = "sqrt(" +
      sorted.indices.map(i => s"(${idf(i)} * ${idf(i)})").mkString(" + ") + ")"
    val anyTf = sorted.indices.map(i => s"tf$i").mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
       |  FROM documents),
       |t AS (
       |  SELECT doc_id,
       |    $tfCols
       |  FROM d),
       |s AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    $dfCols
       |  FROM t),
       |tok AS (SELECT doc_id, unnest(toks) AS w FROM d),
       |ptf AS (SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS tf
       |        FROM tok GROUP BY doc_id, w),
       |dfw AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS df FROM ptf GROUP BY w),
       |nrm AS (
       |  SELECT doc_id,
       |    sqrt(SUM((tf * (ln((1.0 + n) / (1.0 + df)) + 1.0))
       |      * (tf * (ln((1.0 + n) / (1.0 + df)) + 1.0)))) AS nd
       |  FROM ptf JOIN dfw USING (w) CROSS JOIN s GROUP BY doc_id)
       |SELECT doc_id, score FROM (
       |  SELECT t.doc_id, round(($num) / (nd * $qnorm), 6) AS score,
       |    ($anyTf) AS tfsum
       |  FROM t CROSS JOIN s JOIN nrm ON nrm.doc_id = t.doc_id)
       |WHERE tfsum > 0
       |ORDER BY score DESC, doc_id
       |LIMIT $k""".stripMargin
  }

  // Hoisted so hybrid_search_rrf (and dynamicOracleSql's recall
  // report) can compose it as a subquery. Bit-exact across engines:
  // the kernel (GraftKernels.cosine) is a left-to-right double fold
  // over float inputs — float→double widening is exact and IEEE
  // +,*,/,sqrt are correctly rounded, so mirroring the fold order in
  // list_reduce reproduces the same 64 bits, and the rank tiebreak
  // (cos DESC, id) cannot diverge.
  private[graft] val bruteForceOracle: String =
    """WITH q AS (
      |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
      |s AS (
      |  SELECT qid, e.vec_id AS id,
      |    list_reduce(list_transform(range(1, len(qv) + 1),
      |      i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
      |      (a, b) -> a + b) AS dot,
      |    list_reduce(list_transform(range(1, len(qv) + 1),
      |      i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)),
      |      (a, b) -> a + b) AS na,
      |    list_reduce(list_transform(range(1, len(qv) + 1),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
      |      (a, b) -> a + b) AS nb
      |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
      |c AS (
      |  SELECT qid, id,
      |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
      |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
      |  FROM s),
      |r AS (
      |  SELECT qid, id, cos,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
      |  FROM c)
      |SELECT qid, id, cos, CAST(rk AS INTEGER) AS rk
      |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin

  /** Matryoshka truncation audit (D76): full-dim and prefix-dim cosine
    * legs are the same index-order IEEE double folds as the kernel
    * (see [[bruteForceOracle]]'s bit-exactness argument) with the
    * range bound at d+1; rank windows tiebreak on the lower id, the
    * shortlist re-rank joins the full-dim scores back over the pool,
    * and hits are exact set intersections — the only non-integer
    * arithmetic is one hits/50 division in both engines.
    */
  private[graft] def matryoshkaOracle(d: Int, pool: Int, k: Int): String = {
    def scoreCtes(sName: String, cName: String, hi: String): String =
      s"""$sName AS (
        |  SELECT qid, e.vec_id AS id,
        |    list_reduce(list_transform(range(1, $hi),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS dot,
        |    list_reduce(list_transform(range(1, $hi),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS na,
        |    list_reduce(list_transform(range(1, $hi),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
        |      (a, b) -> a + b) AS nb
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
        |$cName AS (
        |  SELECT qid, id,
        |    CASE WHEN na = 0 OR nb = 0 THEN 0.0
        |         ELSE dot / (sqrt(na) * sqrt(nb)) END AS cos
        |  FROM $sName),"""
    s"""WITH q AS (
      |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
      |${scoreCtes("sf", "cf", "len(qv) + 1")}
      |bf AS (
      |  SELECT qid, id FROM (
      |    SELECT qid, id,
      |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
      |    FROM cf) WHERE rk <= $k),
      |${scoreCtes("st", "ct", s"${d + 1}")}
      |tr AS (
      |  SELECT qid, id,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, id) AS rk
      |  FROM ct),
      |ref AS (
      |  SELECT qid, id FROM (
      |    SELECT p.qid, p.id,
      |      row_number() OVER (PARTITION BY p.qid
      |        ORDER BY c.cos DESC, p.id) AS rk
      |    FROM (SELECT qid, id FROM tr WHERE rk <= $pool) p
      |    JOIN cf c ON c.qid = p.qid AND c.id = p.id) WHERE rk <= $k)
      |SELECT method, hits, CAST(hits AS DOUBLE) / 50.0 AS recall_at_10
      |FROM (
      |  SELECT 'trunc$d' AS method, COUNT(*) AS hits
      |  FROM (SELECT qid, id FROM tr WHERE rk <= $k) t
      |  JOIN bf USING (qid, id)
      |  UNION ALL SELECT 'trunc${d}_refine', COUNT(*)
      |  FROM ref JOIN bf USING (qid, id))
      |ORDER BY method""".stripMargin
  }

  /** Unrolled-CTE replay of the MMR greedy loop (query vector 0,
    * pool = exact-cosine top-`c`, λ = 0.5). Every cosine is the same
    * index-order IEEE double fold as the kernel (see
    * [[bruteForceOracle]]'s bit-exactness argument), the λ-arithmetic
    * `0.5·rel − 0.5·ms` is a fixed two-op double chain, and each
    * step's argmax breaks ties on the lower id — so the k-step chain
    * reproduces [[graft.operators.MmrRetrieval]] decision for
    * decision.
    */
  private[graft] def mmrOracle(k: Int, c: Int): String = {
    def fold(u: String, v: String): String =
      s"""list_reduce(list_transform(range(1, len($u) + 1),
         |      i -> CAST($u[i] AS DOUBLE) * CAST($v[i] AS DOUBLE)),
         |      (a, b) -> a + b)""".stripMargin
    // each selN references selN-1 three times — MATERIALIZED stops
    // DuckDB's CTE inlining from exponentiating the chain (3^k scans)
    val steps = (2 to k).map { i =>
      s"""sel$i AS MATERIALIZED (
         |  SELECT * FROM sel${i - 1}
         |  UNION ALL
         |  (SELECT id, rel, 0.5 * rel - 0.5 * ms AS mmr,
         |     CAST($i AS INTEGER) AS rk
         |   FROM (
         |     SELECT cd.id, cd.rel, MAX(p.cs) AS ms
         |     FROM cand cd
         |     JOIN pair p ON p.ai = cd.id
         |     JOIN sel${i - 1} s ON p.bi = s.id
         |     WHERE cd.id NOT IN (SELECT id FROM sel${i - 1})
         |     GROUP BY cd.id, cd.rel)
         |   ORDER BY mmr DESC, id LIMIT 1))""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (
       |  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |r0 AS (
       |  SELECT e.vec_id AS id, e.embedding AS v,
       |    ${fold("qv", "e.embedding")} AS dot,
       |    ${fold("qv", "qv")} AS na,
       |    ${fold("e.embedding", "e.embedding")} AS nb
       |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
       |cand AS MATERIALIZED (
       |  SELECT id, CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |    ELSE dot / (sqrt(na) * sqrt(nb)) END AS rel, v
       |  FROM r0
       |  ORDER BY rel DESC, id LIMIT $c),
       |p0 AS (
       |  SELECT a.id AS ai, b.id AS bi,
       |    ${fold("a.v", "b.v")} AS dot,
       |    ${fold("a.v", "a.v")} AS na,
       |    ${fold("b.v", "b.v")} AS nb
       |  FROM cand a JOIN cand b ON a.id <> b.id),
       |pair AS MATERIALIZED (
       |  SELECT ai, bi, CASE WHEN na = 0 OR nb = 0 THEN 0.0
       |    ELSE dot / (sqrt(na) * sqrt(nb)) END AS cs
       |  FROM p0),
       |sel1 AS MATERIALIZED (
       |  SELECT id, rel, 0.5 * rel - 0.5 * 0.0 AS mmr,
       |    CAST(1 AS INTEGER) AS rk
       |  FROM cand ORDER BY mmr DESC, id LIMIT 1),
       |$steps
       |SELECT CAST(0 AS BIGINT) AS qid, id, rel, mmr, rk
       |FROM sel$k ORDER BY rk""".stripMargin
  }

  /** The corpus-pipeline CTE chain through `clean` — shared by the
    * `corpus_pipeline` oracle and the `pipeline_audit` stage counts.
    */
  private[graft] val corpusPipelineChain: String =
    // RAW margins (no stripMargin here): this text interpolates into
    // templates that strip ONCE — stripping twice would eat the first
    // bar of SQL `||` concat lines
    // corp0 -> corp is the round-17 URL-dedup crawl stage (D128 ∘ D30):
    // the face derives each doc's messy URL with TextQueries.crawlUrl,
    // whose three variants are g = doc_id // 3-keyed BY CONSTRUCTION,
    // and keeps the longest text (ties to smallest id) per canonical
    // URL. The oracle expresses the stage as that g-grouping; the full
    // RFC 3986 canonicalizer equivalence (all three variants -> ONE
    // canonical string) is proven independently by url_dedup's own
    // token-level SQL canonicalizer oracle, so a kernel regression
    // that split or merged groups would break BOTH keys.
    s"""corp0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
        |corp AS (SELECT doc_id, text FROM (
        |    SELECT doc_id, text, row_number() OVER (
        |        PARTITION BY doc_id // 3
        |        ORDER BY length(text) DESC, doc_id) AS urn
        |      FROM corp0)
        |  WHERE urn = 1),
        |tq AS (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS tk FROM corp),
        |qual AS (
        |  SELECT doc_id, text, tk FROM (
        |    SELECT doc_id, text, tk,
        |      CAST(len(tk) AS DOUBLE) AS n,
        |      CAST(len(list_distinct(tk)) AS DOUBLE) AS u,
        |      CAST(len(list_filter(tk, x -> list_contains(
        |        ['the','a','of','and','to','in','is'], x))) AS DOUBLE) AS hcnt
        |    FROM tq)
        |  WHERE 0.4 * least(n / 64.0, 1.0) + 0.4 * (u / n)
        |      + 0.2 * least((hcnt / n) * 8.0, 1.0) >= 0.2),
        |exact AS (
        |  SELECT doc_id, text, tk FROM (
        |    SELECT doc_id, text, tk, MIN(doc_id) OVER (PARTITION BY text) AS cmin
        |    FROM qual)
        |  WHERE doc_id = cmin),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(tk) - 1),
        |  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s3 FROM exact),
        |ex AS (SELECT doc_id, len(s3) AS n3, unnest(s3) AS shingle FROM sh WHERE len(s3) > 0),
        |pairs AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS c,
        |    any_value(a.n3) AS na, any_value(b.n3) AS nb
        |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND b.doc_id > a.doc_id
        |  GROUP BY 1, 2),
        |edges AS (SELECT ida, idb FROM pairs
        |  WHERE CAST(c AS DOUBLE) / (na + nb - c) >= 0.8),
        |und AS (SELECT ida AS src, idb AS dst FROM edges
        |  UNION ALL SELECT idb, ida FROM edges),
        |reach AS (
        |  SELECT src, dst FROM und
        |  UNION
        |  SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst),
        |reps AS (
        |  SELECT e.doc_id, e.text, e.tk FROM exact e
        |  LEFT JOIN (SELECT src, MIN(dst) AS mind FROM reach GROUP BY src) m
        |    ON m.src = e.doc_id
        |  WHERE e.doc_id <= COALESCE(m.mind, e.doc_id)),
        |bg AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(tk) - 6),
        |    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
        |      || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7]))) AS gram
        |  FROM (SELECT string_split_regex(trim(text), '\\s+') AS tk
        |        FROM documents WHERE doc_id % 10 = 0)),
        |dirty AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk) - 6),
        |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]
        |        || ' ' || tk[i+4] || ' ' || tk[i+5] || ' ' || tk[i+6] || ' ' || tk[i+7]))) AS gram
        |    FROM reps) g
        |  JOIN bg USING (gram)),
        |clean AS (
        |  SELECT r.doc_id, r.tk FROM reps r
        |  WHERE r.doc_id NOT IN (SELECT doc_id FROM dirty))"""

  /** The D43 next-fit-decreasing fold chain ending at per-doc CTE
    * `pk` — shared by the `sequence_pack_nextfit` oracle and the
    * `packing_efficiency` waste ledger. RAW margins (no stripMargin
    * here): interpolates into templates that strip once.
    */
  private[graft] val nextFitChain: String = {
    val fits = "acc[2] >= 0 AND acc[1] + (-x[1]) <= 512"
    s"""t AS (
         |  SELECT doc_id, doc_id % 8 AS bucket,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n
         |  FROM documents),
         |b AS (
         |  SELECT bucket, list_sort(list([-n, doc_id])) AS docs
         |  FROM t GROUP BY bucket),
         |f AS (
         |  SELECT bucket,
         |    list_reduce(
         |      [[CAST(0 AS BIGINT), CAST(-1 AS BIGINT)]] || docs,
         |      (acc, x) ->
         |        [CASE WHEN $fits THEN acc[1] + (-x[1]) ELSE (-x[1]) END,
         |         CASE WHEN $fits THEN acc[2] ELSE acc[2] + 1 END]
         |        || list_slice(acc, 3, len(acc))
         |        || [x[2], -x[1],
         |            CASE WHEN $fits THEN acc[2] ELSE acc[2] + 1 END,
         |            CASE WHEN $fits THEN acc[1] ELSE CAST(0 AS BIGINT) END]
         |    ) AS packed
         |  FROM b),
         |e AS (
         |  SELECT bucket, packed,
         |    unnest(range(0, (len(packed) - 2) // 4)) AS k
         |  FROM f),
         |pk AS (
         |  SELECT packed[3 + k * 4] AS doc_id, bucket,
         |    packed[4 + k * 4] AS n_tokens, packed[5 + k * 4] AS shard,
         |    packed[6 + k * 4] AS "offset"
         |  FROM e)"""
  }

  /** C97/C99 oracle — mirrors [[graft.operators.AbStats.anovaF]] /
    * [[graft.operators.AbStats.brownForsythe]]'s shared F finisher:
    * exact conditional sums per arm (with multiplicity c), then
    * SSB/SSW folded in the plan's fixed arm order with per-term n > 0
    * guards, one IEEE evaluation per statistic.
    *
    * @param src SQL producing (arm, v, c[, med]) rows — v the exact
    *            integer metric, c the multiplicity (1 for raw rows)
    * @param withMedians true emits med_0..2 (C99) instead of
    *                    mean_0..2 (C97)
    */
  private[graft] def anovaOracle(src: String, fName: String,
                                 withMedians: Boolean): String = {
    val arms = 0 until 3
    val sums = arms.map { i =>
      val medLeg = if (withMedians)
        s",\n    MIN(CASE WHEN arm = $i THEN med END) AS med_$i" else ""
      s"""CAST(COALESCE(SUM(CASE WHEN arm = $i THEN c END), 0) AS BIGINT)
         |      AS n_$i,
         |    SUM(CASE WHEN arm = $i THEN CAST(v AS HUGEINT) * c END)
         |      AS s_$i,
         |    SUM(CASE WHEN arm = $i THEN CAST(v AS HUGEINT) * v * c END)
         |      AS ss_$i$medLeg""".stripMargin
    }.mkString(",\n    ")
    val nTot = "((n_0 + n_1) + n_2)"
    val sTot = "((COALESCE(s_0, 0) + COALESCE(s_1, 0)) + COALESCE(s_2, 0))"
    val ssTot =
      "((COALESCE(ss_0, 0) + COALESCE(ss_1, 0)) + COALESCE(ss_2, 0))"
    def bTerm(i: Int) =
      s"(CASE WHEN n_$i > 0 THEN CAST(s_$i AS DOUBLE)" +
        s" * CAST(s_$i AS DOUBLE) / CAST(n_$i AS DOUBLE) ELSE 0.0 END)"
    val between = s"((${bTerm(0)} + ${bTerm(1)}) + ${bTerm(2)})"
    val grand = s"(CASE WHEN $nTot > 0 THEN CAST($sTot AS DOUBLE)" +
      s" * CAST($sTot AS DOUBLE) / CAST($nTot AS DOUBLE) END)"
    val ssb = s"($between - $grand)"
    val ssw = s"(CAST($ssTot AS DOUBLE) - $between)"
    val df2 = s"($nTot - 3)"
    val ok = s"n_0 > 0 AND n_1 > 0 AND n_2 > 0 AND $df2 > 0 AND $ssw > 0.0"
    val perArm =
      if (withMedians) arms.map(i => s"med_$i").mkString(", ")
      else arms.map(i =>
        s"CASE WHEN n_$i > 0 THEN round(CAST(s_$i AS DOUBLE)" +
          s" / CAST(n_$i AS DOUBLE), 6) END AS mean_$i").mkString(",\n  ")
    s"""WITH p0 AS ($src),
       |a AS (SELECT
       |    $sums
       |  FROM p0)
       |SELECT n_0, n_1, n_2,
       |  $perArm,
       |  CASE WHEN $ok THEN
       |    round(($ssb / 2.0) / ($ssw / CAST($df2 AS DOUBLE)), 6)
       |  END AS $fName,
       |  CAST(2 AS BIGINT) AS df1, CAST($df2 AS BIGINT) AS df2
       |FROM a""".stripMargin
  }
}
