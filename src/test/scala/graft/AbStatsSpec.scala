package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AbStats

/** Contract pins for the A/B statistics family (SURVEY §2 C66-C69) on
  * hand-built data where every statistic is derivable by eye (or by
  * the textbook formula evaluated independently in plain Scala).
  * sf-scale value correctness is the DuckDB oracle's job.
  */
class AbStatsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def d6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- Welch t ----------------------------------------------------------

  test("welchTTest: textbook two-sample case") {
    // arm0 = [1,2,3] (mean 2, s² 1), arm1 = [2,4,6] (mean 4, s² 4)
    val df = Seq((0, 1.0), (0, 2.0), (0, 3.0), (1, 2.0), (1, 4.0), (1, 6.0))
      .toDF("arm", "v")
    val r = AbStats.welchTTest(df, col("arm"), col("v")).head
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Double]("mean_a") === 2.0)
    assert(r.getAs[Double]("mean_b") === 4.0)
    // t = (2-4)/sqrt(1/3 + 4/3), df via Welch–Satterthwaite = 50/17
    assert(r.getAs[Double]("t_stat") === d6(-2.0 / math.sqrt(5.0 / 3.0)))
    assert(r.getAs[Double]("df") === d6(50.0 / 17.0))
  }

  test("welchTTest: zero-variance and tiny arms yield null, not Inf") {
    val flat = Seq((0, 5.0), (0, 5.0), (1, 5.0), (1, 5.0)).toDF("arm", "v")
    val r = AbStats.welchTTest(flat, col("arm"), col("v")).head
    assert(r.isNullAt(r.fieldIndex("t_stat")))
    val tiny = Seq((0, 1.0), (1, 2.0), (1, 3.0)).toDF("arm", "v")
    val r2 = AbStats.welchTTest(tiny, col("arm"), col("v")).head
    assert(r2.isNullAt(r2.fieldIndex("t_stat")))
    assert(r2.isNullAt(r2.fieldIndex("df")))
  }

  // ---- chi-square -------------------------------------------------------

  test("chiSquareIndependence: 2x2 with expected 15s") {
    // o = [[10,20],[20,10]]: every e = 15, chi2 = 4·(5²/15) = 20/3
    val rows =
      Seq.fill(10)(("A", 0)) ++ Seq.fill(20)(("A", 1)) ++
      Seq.fill(20)(("B", 0)) ++ Seq.fill(10)(("B", 1))
    val r = AbStats.chiSquareIndependence(
      rows.toDF("k", "arm"), col("k"), col("arm")).head
    assert(r.getAs[Long]("n") === 60L)
    assert(r.getAs[Long]("dof") === 1L)
    assert(r.getAs[Double]("chi2") === d6(20.0 / 3.0))
  }

  test("chiSquareIndependence: independent margins give chi2 = 0") {
    // perfectly proportional cells → every o = e
    val rows =
      Seq.fill(10)(("A", 0)) ++ Seq.fill(20)(("A", 1)) ++
      Seq.fill(20)(("B", 0)) ++ Seq.fill(40)(("B", 1))
    val r = AbStats.chiSquareIndependence(
      rows.toDF("k", "arm"), col("k"), col("arm")).head
    assert(r.getAs[Double]("chi2") === 0.0)
  }

  // ---- Mann–Whitney -----------------------------------------------------

  test("mannWhitneyU: hand-ranked case with ties") {
    // arm0 = [1,2,2,5], arm1 = [2,3,4,4]
    // avg ranks: 1→1; 2,2,2→3; 3→5; 4,4→6.5; 5→8
    // R1 = 3+5+6.5+6.5 = 21, U1 = 21 − 4·5/2 = 11
    val df = Seq((0, 1.0), (0, 2.0), (0, 2.0), (0, 5.0),
                 (1, 2.0), (1, 3.0), (1, 4.0), (1, 4.0)).toDF("arm", "v")
    val r = AbStats.mannWhitneyU(df, col("arm"), col("v")).head
    assert(r.getAs[Long]("n_a_ranked") === 4L)
    assert(r.getAs[Long]("n_b_ranked") === 4L)
    assert(r.getAs[Double]("u_stat") === 11.0)
    // z from the textbook tie-corrected formula, evaluated independently
    val tie = (27.0 - 3.0) + (8.0 - 2.0)
    val s2 = 4.0 * 4.0 / 12.0 * (9.0 - tie / (8.0 * 7.0))
    assert(r.getAs[Double]("z_stat") === d6((11.0 - 8.0) / math.sqrt(s2)))
  }

  test("mannWhitneyU: all-tied corpus yields null z") {
    val df = Seq((0, 2.0), (0, 2.0), (1, 2.0), (1, 2.0)).toDF("arm", "v")
    val r = AbStats.mannWhitneyU(df, col("arm"), col("v")).head
    // single tie group: U1 = c1·avgrank − n1(n1+1)/2 = 2·2.5 − 3 = 2
    assert(r.getAs[Double]("u_stat") === 2.0)
    assert(r.isNullAt(r.fieldIndex("z_stat")))
  }

  // ---- Cohen's kappa ----------------------------------------------------

  test("cohenKappa: textbook contingency gives kappa 0.4") {
    // n11=20 n10=5 n01=10 n00=15: po=0.7, pe=(25·30+25·20)/50²=0.5
    val rows = Seq.fill(20)((true, true)) ++ Seq.fill(5)((true, false)) ++
      Seq.fill(10)((false, true)) ++ Seq.fill(15)((false, false))
    val r = AbStats.cohenKappa(rows.toDF("a", "b"), col("a"), col("b")).head
    assert(r.getAs[Long]("n") === 50L)
    assert(r.getAs[Double]("po") === 0.7)
    assert(r.getAs[Double]("pe") === 0.5)
    assert(r.getAs[Double]("kappa") === 0.4)
  }

  test("cohenKappa: perfect agreement is 1, constant raters are null") {
    val perfect = Seq((true, true), (false, false), (true, true))
      .toDF("a", "b")
    assert(AbStats.cohenKappa(perfect, col("a"), col("b"))
      .head.getAs[Double]("kappa") === 1.0)
    // both raters always true → pe = 1 → undefined
    val const = Seq((true, true), (true, true)).toDF("a", "b")
    val r = AbStats.cohenKappa(const, col("a"), col("b")).head
    assert(r.isNullAt(r.fieldIndex("kappa")))
    // null verdicts count as false in the cells
    val withNull = Seq((Some(true), Some(true)), (None, Some(false)),
      (Some(false), None)).toDF("a", "b")
    val r2 = AbStats.cohenKappa(withNull, col("a"), col("b")).head
    assert(r2.getAs[Long]("n11") === 1L && r2.getAs[Long]("n00") === 2L)
  }

  // ---- CUPED ------------------------------------------------------------

  test("cupedEffect: perfectly predictive covariate removes the effect") {
    // users 0..3 (arm = u%2), x = [1,2,3,4], y = 2x exactly:
    // θ = 2, raw = 2, adjusted = raw − θ·(x̄₁−x̄₀) = 2 − 2·1 = 0, ρ² = 1
    val rows = (0 until 4).flatMap { u =>
      Seq((u.toLong, (u + 1).toDouble, true),
          (u.toLong, 2.0 * (u + 1), false))
    }
    val df = rows.toDF("u", "v", "pre")
    val r = AbStats.cupedEffect(df, col("u"), col("v"), col("pre")).head
    assert(r.getAs[Long]("n_users") === 4L)
    assert(r.getAs[Double]("theta") === 2.0)
    assert(r.getAs[Double]("raw_diff") === 2.0)
    assert(r.getAs[Double]("adjusted_diff") === 0.0)
    assert(r.getAs[Double]("var_reduction") === 1.0)
  }

  test("cupedEffect: a user absent from a period contributes exact 0") {
    // u0 (arm0) has only a post event; u1 (arm1) only a pre event —
    // x(u0) = 0 and y(u1) = 0 rather than dropped rows
    val df = Seq((0L, 10.0, false), (1L, 4.0, true),
                 (2L, 1.0, true), (2L, 2.0, false),
                 (3L, 2.0, true), (3L, 3.0, false)).toDF("u", "v", "pre")
    val r = AbStats.cupedEffect(df, col("u"), col("v"), col("pre")).head
    assert(r.getAs[Long]("n_users") === 4L)
    // raw = ȳ₁ − ȳ₀ = (0+3)/2 − (10+2)/2 = −4.5
    assert(r.getAs[Double]("raw_diff") === -4.5)
  }

  test("cupedEffect: zero covariate variance publishes null theta") {
    val df = Seq((0L, 1.0, true), (0L, 5.0, false),
                 (1L, 1.0, true), (1L, 7.0, false)).toDF("u", "v", "pre")
    val r = AbStats.cupedEffect(df, col("u"), col("v"), col("pre")).head
    assert(r.isNullAt(r.fieldIndex("theta")))
    assert(r.getAs[Double]("raw_diff") === 2.0)
  }

  test("msprtMonitor: hand logsumexp replay, monotone p, reject line") {
    import graft.operators.AbStats
    val p0 = 0.2
    val grid = Seq(0.3, 0.5)
    val alpha = 0.05
    // day 1 sits at the null rate (Λ < 1 ⇒ p = 1); days 2–3 convert at
    // 90% — the mixture crosses ln(1/α) by day 3
    val rows = Seq(("2024-01-01", 5, 1), ("2024-01-02", 10, 9),
      ("2024-01-03", 10, 9))
    val df = rows.flatMap { case (d, n, k) =>
      (0 until n).map(i => (java.sql.Date.valueOf(d), i < k))
    }.toDF("day", "conv")
    val got = AbStats.msprtMonitor(df, col("day"), col("conv"),
      p0, grid, alpha).collect()
    assert(got.length == 3)

    // driver-side replay with the operator's exact association
    val steps = grid.map(p =>
      (math.log(p / p0), math.log((1 - p) / (1 - p0))))
    val lnW = math.log(1.0 / grid.size)
    def logMlr(n: Long, k: Long): Double = {
      val ts = steps.map { case (a, b) => k * a + (n - k) * b }
      val mx = ts.max
      val raw = lnW + mx + math.log(ts.map(t => math.exp(t - mx)).reduceLeft(_ + _))
      round6(raw)
    }
    // Spark's round() is HALF_UP over BigDecimal — replay that exactly
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var (cn, ck, peak) = (0L, 0L, Double.NegativeInfinity)
    rows.zip(got).foreach { case ((_, n, k), r) =>
      cn += n; ck += k
      val lm = logMlr(cn, ck)
      peak = math.max(peak, lm)
      assert(r.getAs[Long]("cum_n") == cn && r.getAs[Long]("cum_k") == ck)
      assert(r.getAs[Double]("log_mlr") == lm, s"day ${r.get(0)}")
      val p = round6(math.min(1.0, math.exp(-peak)))
      assert(r.getAs[Double]("p_value") == p)
      assert(r.getAs[String]("decision") ==
        (if (peak >= math.log(1.0 / alpha)) "reject_h0" else "continue"))
    }
    // the always-valid guarantees: p starts at 1 under the null, never
    // increases, and the run ends rejected
    assert(got.head.getAs[Double]("p_value") == 1.0)
    assert(got.sliding(2).forall(w =>
      w(1).getAs[Double]("p_value") <= w(0).getAs[Double]("p_value")))
    assert(got.last.getAs[String]("decision") == "reject_h0")
  }

  // ---- Gini split ---------------------------------------------------------

  test("bestGiniSplit: perfect split found, impurities exact") {
    import graft.operators.AbStats
    // labels flip exactly after f = 2: threshold 2, split impurity 0,
    // root impurity 2·(2/4)·(2/4) = 0.5
    val df = Seq((1L, false), (2L, false), (3L, true), (4L, true))
      .toDF("f", "l")
    val r = AbStats.bestGiniSplit(df, col("f"), col("l")).head
    assert(r.getAs[Long]("threshold") === 2L)
    assert(r.getAs[Double]("gini_split") === 0.0)
    assert(r.getAs[Double]("gini_root") === 0.5)
    // tie on impurity → smallest threshold wins
    val flat = Seq((1L, true), (2L, false), (3L, true), (4L, false))
      .toDF("f", "l")
    val rf = AbStats.bestGiniSplit(flat, col("f"), col("l")).head
    assert(rf.getAs[Long]("threshold") === 1L,
      "equal-impurity candidates must break ties to the smallest f")
    // constant feature: no valid split → null threshold row
    val const = Seq((5L, true), (5L, false)).toDF("f", "l")
    val rc = AbStats.bestGiniSplit(const, col("f"), col("l")).head
    assert(rc.isNullAt(rc.fieldIndex("threshold")))
  }

  // ---- Spearman --------------------------------------------------------------

  test("spearmanCorrelation: monotone 1, anti-monotone -1, ties, rank math") {
    import graft.operators.AbStats
    // nonlinear but monotone: Pearson < 1, Spearman EXACTLY 1
    val mono = Seq((1L, 1L), (2L, 8L), (3L, 27L), (4L, 64L)).toDF("x", "y")
    assert(AbStats.spearmanCorrelation(mono, col("x"), col("y"))
      .head.getAs[Double]("rho") === 1.0)
    val anti = Seq((1L, 64L), (2L, 27L), (3L, 8L), (4L, 1L)).toDF("x", "y")
    assert(AbStats.spearmanCorrelation(anti, col("x"), col("y"))
      .head.getAs[Double]("rho") === -1.0)
    // ties on both sides, still perfectly concordant
    val ties = Seq((1L, 10L), (2L, 20L), (2L, 20L), (3L, 40L)).toDF("x", "y")
    assert(AbStats.spearmanCorrelation(ties, col("x"), col("y"))
      .head.getAs[Double]("rho") === 1.0)
    // textbook tie case: y ranks (1, 2, 3.5, 5, 3.5) vs x ranks 1..5 —
    // expected rho from an independent plain-Scala Pearson over ranks
    val mixed = Seq((1L, 5L), (2L, 6L), (3L, 7L), (4L, 8L), (5L, 7L))
      .toDF("x", "y")
    val rx = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
    val ry = Seq(1.0, 2.0, 3.5, 5.0, 3.5)
    val n = 5.0
    val num = n * rx.zip(ry).map(p => p._1 * p._2).sum - rx.sum * ry.sum
    val den = math.sqrt(n * rx.map(r => r * r).sum - rx.sum * rx.sum) *
      math.sqrt(n * ry.map(r => r * r).sum - ry.sum * ry.sum)
    assert(AbStats.spearmanCorrelation(mixed, col("x"), col("y"))
      .head.getAs[Double]("rho") === d6(num / den))
    // constant y: zero variance → null
    val const = Seq((1L, 7L), (2L, 7L)).toDF("x", "y")
    val rc = AbStats.spearmanCorrelation(const, col("x"), col("y")).head
    assert(rc.isNullAt(rc.fieldIndex("rho")))
  }

  // ---- Kolmogorov–Smirnov --------------------------------------------------

  test("ksTwoSample: hand CDFs, peak location, identical-samples zero") {
    import graft.operators.AbStats
    // arm0 = [1,2,3,4], arm1 = [3,4,5,6]: F0-F1 gaps at v=1..6 are
    // 1/4, 2/4, 2/4, 2/4, 1/4, 0 → D = 0.5 first reached at v=2
    val df = Seq((0, 1.0), (0, 2.0), (0, 3.0), (0, 4.0),
      (1, 3.0), (1, 4.0), (1, 5.0), (1, 6.0)).toDF("arm", "v")
    val r = AbStats.ksTwoSample(df, col("arm"), col("v")).head
    assert(r.getAs[Long]("n_a") === 4L && r.getAs[Long]("n_b") === 4L)
    assert(r.getAs[Double]("ks_stat") === 0.5)
    assert(r.getAs[Double]("ks_at_value") === 2.0,
      "tie on the max gap must report the EARLIEST value")
    // D = 0.5 at n=4,4: threshold 1.358·sqrt(8/16) = 0.960 → keep
    assert(!r.getAs[Boolean]("reject_05"))
    // identical samples: D = 0 exactly
    val same = Seq((0, 1.0), (0, 2.0), (1, 1.0), (1, 2.0)).toDF("arm", "v")
    val rs = AbStats.ksTwoSample(same, col("arm"), col("v")).head
    assert(rs.getAs[Double]("ks_stat") === 0.0)
    // disjoint supports: D = 1 exactly
    val disj = Seq((0, 1.0), (0, 2.0), (1, 9.0), (1, 10.0)).toDF("arm", "v")
    assert(AbStats.ksTwoSample(disj, col("arm"), col("v"))
      .head.getAs[Double]("ks_stat") === 1.0)
  }

  // ---- Heaps-law machinery -------------------------------------------------

  test("heapsLaw-style first-occurrence growth recovers a sqrt exponent") {
    // doc i carries token w_isqrt(i): V(d) = isqrt(d), so the log-log
    // OLS over the thresholds must land near beta = 0.5; recompute
    // through the SAME first-occurrence + threshold-leg machinery the
    // query face uses, on a frame where the answer is known
    import org.apache.spark.sql.DataFrame
    val docs: DataFrame = (1 to 400)
      .map(i => (i.toLong, s"w${math.sqrt(i.toDouble).toInt}"))
      .toDF("doc_id", "text")
    val terms = docs.groupBy(col("text").as("term"))
      .agg(min(col("doc_id")).as("fd"))
    val lo = 1.0; val hi = 400.0
    val pts = (1 to 10).map { i =>
      val t = (lo + (hi - lo) * i / 10).toLong
      val v = terms.filter(col("fd") <= t).count().toDouble
      (math.log(t.toDouble), math.log(v))
    }
    val k = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val beta = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert(beta > 0.4 && beta < 0.6, s"sqrt-growth corpus fit beta=$beta")
  }

  // ---- Rocchio PRF ---------------------------------------------------------

  test("rocchioPrfSearch: expansion terms are corpus-driven and ordered") {
    import graft.queries.WarehouseQueries
    val sfDir = "/root/testdata/sf0.001"
    val prf = WarehouseQueries.rocchioPrfSearch(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val plain = WarehouseQueries.bm25Search(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(prf.nonEmpty)
    // the expanded query scores strictly more mass (extra positive
    // BM25 legs) — PRF must actually change the readout
    assert(prf.toMap != plain.toMap,
      "expansion must alter scores vs the plain seed query")
    // deterministic across invocations (collect-driven expansion is
    // a pure data function)
    val again = WarehouseQueries.rocchioPrfSearch(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(prf.toSeq === again.toSeq)
  }

  // ---- Jaro-Winkler -------------------------------------------------------

  test("jaroWinkler: textbook values, boost threshold, edge cases") {
    import graft.functions.JaroWinkler.similarity
    assert(d6(similarity("MARTHA", "MARHTA")) === 0.961111)
    assert(d6(similarity("DIXON", "DICKSONX")) === 0.813333)
    assert(d6(similarity("DWAYNE", "DUANE")) === 0.84)
    assert(similarity("abc", "abc") === 1.0)
    assert(similarity("", "abc") === 0.0)
    assert(similarity("abc", "") === 0.0)
    assert(similarity("abc", "xyz") === 0.0)
    // boost threshold: jaro ≤ 0.7 gets NO prefix bonus (the DuckDB /
    // Winkler convention the oracle cross-validates)
    val lowJaro = similarity("abcdefgh", "abzzzzzz")
    assert(lowJaro === 0.5, "prefix bonus must not apply below 0.7")
    // column path (codegen) agrees with the kernel
    import graft.functions.JaroWinkler
    val df = Seq(("MARTHA", "MARHTA")).toDF("a", "b")
      .select(JaroWinkler.jaro_winkler(col("a"), col("b")).as("jw"))
    assert(d6(df.head.getDouble(0)) === 0.961111)
  }

  // ---- Quantile normalization -------------------------------------------

  test("quantileNorm mapping: cross-source alignment and identity") {
    import graft.operators.QuantileNorm
    // A = buckets [1,1,2,2], B = [3,3,4,4]: both sources' medians map
    // to the same global quantile buckets — that's the operator's job
    val df = Seq(("A", 1L), ("A", 1L), ("A", 2L), ("A", 2L),
      ("B", 3L), ("B", 3L), ("B", 4L), ("B", 4L)).toDF("s", "b")
    val m = QuantileNorm.mappingTable(df, col("s"), col("b"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        r.getAs[Long]("norm_bucket")).toMap
    assert(m(("A", 1L)) === 2L && m(("B", 3L)) === 2L,
      "both sources' lower halves must map to the global p50 bucket")
    assert(m(("A", 2L)) === 4L && m(("B", 4L)) === 4L,
      "both sources' upper halves must map to the global max bucket")
    // single source: the map is the identity
    val one = Seq(("A", 1L), ("A", 2L), ("A", 5L)).toDF("s", "b")
    QuantileNorm.mappingTable(one, col("s"), col("b")).collect()
      .foreach(r => assert(r.getLong(1) === r.getAs[Long]("norm_bucket")))
  }

  // ---- Kaplan–Meier ------------------------------------------------------

  test("kaplanMeier: textbook curve with censoring") {
    import graft.operators.Survival
    // deaths at t=1 (1 of 5 at risk) and t=3 (2 of 3 at risk);
    // censor at t=2 and t=4: S(1)=4/5, S(3)=4/5·1/3
    val subj = Seq((1L, false), (2L, true), (3L, false), (3L, false),
      (4L, true)).toDF("t", "cens")
    val out = Survival.kaplanMeier(subj, col("t"), col("cens"))
      .orderBy(col("t")).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    assert(out(0).getAs[Long]("n_risk") === 5L)
    assert(out(0).getAs[Long]("d_events") === 1L)
    assert(out(0).getAs[Double]("survival") === 0.8)
    assert(out(1).getAs[Long]("n_risk") === 3L)
    assert(out(1).getAs[Double]("survival") === d6(0.8 * (1.0 / 3.0)))
    // no censoring: survival reaches exactly 0 at the last death
    val all = Seq((1L, false), (2L, false)).toDF("t", "cens")
    val o2 = Survival.kaplanMeier(all, col("t"), col("cens"))
      .orderBy(col("t")).collect()
    assert(o2.last.getAs[Double]("survival") === 0.0)
    // all censored: no death steps at all
    val none = Seq((1L, true), (2L, true)).toDF("t", "cens")
    assert(Survival.kaplanMeier(none, col("t"), col("cens")).count() === 0L)
  }

  // ---- SRM -------------------------------------------------------------

  test("sampleRatioCheck: skew flags, balance doesn't") {
    import graft.operators.AbStats
    val skew = (1 to 60).map(_ => 0) ++ (1 to 40).map(_ => 1)
    val r = AbStats.sampleRatioCheck(skew.toDF("arm"), col("arm")).head
    assert(r.getAs[Long]("n_a") === 60L && r.getAs[Long]("n_b") === 40L)
    assert(r.getAs[Double]("chi2") === 4.0) // (60−40)²/100
    assert(r.getAs[Boolean]("srm_flag"))
    val fair = (1 to 50).map(_ => 0) ++ (1 to 50).map(_ => 1)
    val rf = AbStats.sampleRatioCheck(fair.toDF("arm"), col("arm")).head
    assert(rf.getAs[Double]("chi2") === 0.0)
    assert(!rf.getAs[Boolean]("srm_flag"))
  }

  // ---- Concentration -----------------------------------------------------

  test("giniHhi: equality is 0, hand-skew matches the rank formula") {
    import graft.operators.Concentration
    val equal = Seq("a", "a", "b", "b", "c", "c").toDF("k")
    val re = Concentration.giniHhi(equal, col("k")).head
    assert(re.getAs[Double]("gini") === 0.0)
    assert(re.getAs[Double]("hhi") === BigDecimal(1.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // counts {1,1,8}: G = (2·27 − 4·10)/(3·10) = 14/30
    val skew = (Seq.fill(1)("a") ++ Seq.fill(1)("b") ++ Seq.fill(8)("c"))
      .toDF("k")
    val rs = Concentration.giniHhi(skew, col("k")).head
    assert(rs.getAs[Double]("gini") === BigDecimal(14.0 / 30.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(rs.getAs[Double]("hhi") === 0.66)
    assert(rs.getAs[Double]("top_share") === 0.8)
    // single group: maximal HHI, Gini 0 (equality among one)
    val one = Seq("a", "a").toDF("k")
    val ro = Concentration.giniHhi(one, col("k")).head
    assert(ro.getAs[Double]("hhi") === 1.0)
    assert(ro.getAs[Double]("gini") === 0.0)
  }

  // ---- Mutual information ---------------------------------------------------

  test("mutualInformation: independence is exact 0, identity is H(X)") {
    import graft.operators.AbStats
    // proportional cells: every c = rx·cy/N exactly → each term ln(1)=0
    val indep = Seq(("a", "p"), ("a", "q"), ("b", "p"), ("b", "q"),
      ("a", "p"), ("a", "q"), ("b", "p"), ("b", "q")).toDF("x", "y")
    val ri = AbStats.mutualInformation(indep, col("x"), col("y")).head
    assert(ri.getAs[Double]("mi_bits") === 0.0)
    assert(ri.getAs[Double]("h_x") === 1.0)
    assert(ri.getAs[Double]("nmi") === 0.0)
    // y ≡ x: MI = H(X) = 1 bit (two equiprobable symbols), NMI = 1
    val ident = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("x", "y")
    val rd = AbStats.mutualInformation(ident, col("x"), col("y")).head
    assert(rd.getAs[Double]("mi_bits") === 1.0)
    assert(rd.getAs[Double]("nmi") === 1.0)
    // constant x: H(X) = 0 → nmi null, mi 0
    val const = Seq(("a", "p"), ("a", "q")).toDF("x", "y")
    val rc = AbStats.mutualInformation(const, col("x"), col("y")).head
    assert(rc.getAs[Double]("mi_bits") === 0.0)
    assert(rc.isNullAt(rc.fieldIndex("nmi")))
  }

  // ---- Association rules ------------------------------------------------

  test("associationRules-style metrics: hand baskets") {
    // verified through the registered query shape on a tiny frame:
    // baskets (1:AB)(2:AB)(3:AC)(4:B) → rule A→B support 2,
    // conf 2/3, lift 2·4/(3·3); AC below min support drops
    val lp = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"), (4L, "B")).toDF("ok", "pk")
    val nOrders = lp.select(col("ok")).distinct().count()
    val itemN = lp.groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
    val co = lp.as("a").join(lp.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
      .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
      .agg(count(lit(1)).as("support"))
      .where(col("support") >= 2)
    val rules = co
      .join(itemN.withColumnRenamed("pk", "u").withColumnRenamed("cnt", "n_u"),
        Seq("u"))
      .join(itemN.withColumnRenamed("pk", "v").withColumnRenamed("cnt", "n_v"),
        Seq("v"))
      .select(col("u"), col("v"), col("support"),
        round(col("support").cast("double") / col("n_u"), 6).as("confidence"),
        round(col("support").cast("double") * nOrders
          / (col("n_u").cast("double") * col("n_v")), 6).as("lift"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("support"), r.getAs[Double]("confidence"),
          r.getAs[Double]("lift"))).toMap
    assert(rules.keySet === Set(("A", "B"), ("B", "A")))
    assert(rules(("A", "B"))._1 === 2L)
    assert(rules(("A", "B"))._2 === BigDecimal(2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(rules(("A", "B"))._3 === BigDecimal(8.0 / 9.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // ---- Adamic–Adar ---------------------------------------------------------

  test("adamicAdarTopK: hand wedges, degree-1 prune, hub cut") {
    import graft.operators.LinkPrediction
    // l1,l2 → {A,B}; l3 → {A,C}; l4 → {C} (degree 1: no wedge)
    val m = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
                (3L, "A"), (3L, "C"), (4L, "C")).toDF("l", "r")
    val out = LinkPrediction.adamicAdarTopK(m, col("l"), col("r"), k = 10)
      .collect()
    val w2 = math.round(1000000.0 / math.log(2.0)) // deg-2 weight
    assert(out.length === 2)
    assert(out(0).getString(0) === "A" && out(0).getString(1) === "B")
    assert(out(0).getAs[Long]("common_neighbors") === 2L)
    assert(out(0).getAs[Double]("aa_score") === 2 * w2 / 1e6)
    assert(out(1).getString(1) === "C")
    assert(out(1).getAs[Double]("aa_score") === w2 / 1e6)
    // hub cut: a left of degree 3 is dropped at maxDegree = 2
    val hub = m.union(Seq((5L, "A"), (5L, "B"), (5L, "C")).toDF("l", "r"))
    val cut = LinkPrediction.adamicAdarTopK(hub, col("l"), col("r"),
      k = 10, maxDegree = 2)
    assert(cut.collect().map(r => (r.getString(0), r.getString(1),
      r.getAs[Long]("common_neighbors"))).toSeq ===
      out.map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("common_neighbors"))).toSeq,
      "hub left must not contribute wedges under the cut")
    // duplicate memberships collapse before degree counting
    val dup = m.union(Seq((1L, "A")).toDF("l", "r"))
    assert(LinkPrediction.adamicAdarTopK(dup, col("l"), col("r"), k = 10)
      .head.getAs[Double]("aa_score") === 2 * w2 / 1e6)
  }

  // ---- CUSUM changepoint --------------------------------------------------

  test("cusumMaxShift: hand series, level shift found at the step") {
    import graft.operators.Changepoint
    // [5,5,5,9,9]: D=5, N=33; S = 5·cum − i·33 = −8,−16,−24,−12,0 →
    // max |S| = 24 at step 3, stat 24/5 = 4.8, mean 6.6
    val s = Seq(("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L),
                ("a", 4L, 9L), ("a", 5L, 9L)).toDF("k", "step", "x")
    val r = Changepoint.cusumMaxShift(s, Seq("k"), col("step"), col("x")).head
    assert(r.getAs[Long]("cp_step") === 3L)
    assert(r.getAs[Double]("cusum_stat") === 4.8)
    assert(r.getAs[Double]("mean_level") === 6.6)
    assert(r.getAs[Long]("n_steps") === 5L)
    // constant series: every S = 0, tie breaks to the EARLIEST step
    val const = Seq(("a", 1L, 2L), ("a", 2L, 2L), ("a", 3L, 2L))
      .toDF("k", "step", "x")
    val rc = Changepoint.cusumMaxShift(const, Seq("k"), col("step"),
      col("x")).head
    assert(rc.getAs[Long]("cp_step") === 1L)
    assert(rc.getAs[Double]("cusum_stat") === 0.0)
    // single-step series publishes 0 at that step (no interior shift)
    val one = Seq(("b", 7L, 4L)).toDF("k", "step", "x")
    val ro = Changepoint.cusumMaxShift(one, Seq("k"), col("step"),
      col("x")).head
    assert(ro.getAs[Long]("cp_step") === 7L)
    assert(ro.getAs[Double]("cusum_stat") === 0.0)
  }

  test("SPRT: cumulative LLR matches a driver recompute; Wald bounds trip the decision") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    // day 1: 10 trials 1 conv; day 2: 20/10; day 3: 30/12
    val rows =
      (1 to 10).map(i => (ts(1), i <= 1)) ++
      (1 to 20).map(i => (ts(2), i <= 10)) ++
      (1 to 30).map(i => (ts(3), i <= 12))
    val df = rows.toDF("t", "conv")
    val out = graft.operators.AbStats.sprtMonitor(df,
        org.apache.spark.sql.functions.date_trunc("day",
          org.apache.spark.sql.functions.col("t")).cast("date"),
        org.apache.spark.sql.functions.col("conv"),
        p0 = 0.2, p1 = 0.4, alpha = 0.05, beta = 0.05)
      .collect()
    assert(out.length == 3)
    val c1 = math.log(0.4 / 0.2); val c2 = math.log(0.6 / 0.8)
    val up = math.log(0.95 / 0.05); val lo = math.log(0.05 / 0.95)
    val cum = Seq((10L, 1L), (30L, 11L), (60L, 23L))
    out.zip(cum).foreach { case (r, (n, k)) =>
      assert(r.getAs[Long]("cum_n") == n && r.getAs[Long]("cum_k") == k)
      val want = BigDecimal(k * c1 + (n - k) * c2)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("llr") == want, s"llr day ${r.get(0)}")
      val dec = if (want >= up) "accept_h1"
        else if (want <= lo) "accept_h0" else "continue"
      assert(r.getAs[String]("decision") == dec)
    }
    // a one-sided stream must cross the H1 bound
    val hot = (1 to 40).map(i => (ts(1 + i % 3), i % 2 == 0)).toDF("t", "conv")
    val dec = graft.operators.AbStats.sprtMonitor(hot,
        org.apache.spark.sql.functions.date_trunc("day",
          org.apache.spark.sql.functions.col("t")).cast("date"),
        org.apache.spark.sql.functions.col("conv"),
        p0 = 0.1, p1 = 0.5, alpha = 0.05, beta = 0.05)
      .collect().last.getAs[String]("decision")
    assert(dec == "accept_h1", "50% conversions vs H0=10% must accept H1")
  }

  test("Mann-Kendall: monotone, tied, and constant hand series") {
    import spark.implicits._
    import graft.operators.Changepoint
    def run(xs: Seq[Long]) = Changepoint.mannKendall(
      xs.zipWithIndex.map { case (x, i) => (i, x) }.toDF("step", "x"),
      col("step"), col("x")).head
    // strictly increasing, m=5: S=10, var18=5*4*15=300,
    // z=(10-1)/sqrt(300/18)
    val inc = run(Seq(1L, 2L, 3L, 4L, 5L))
    assert(inc.getAs[Long]("s_stat") == 10L && inc.getAs[Long]("var18") == 300L)
    assert(inc.getAs[Double]("z_stat") == d6(9.0 / math.sqrt(300.0 / 18.0)))
    assert(inc.getAs[String]("trend") == "increasing")
    // one tie group t=2: S=5, var18 = 4*3*13 - 2*1*9 = 138
    val tied = run(Seq(1L, 2L, 2L, 3L))
    assert(tied.getAs[Long]("s_stat") == 5L && tied.getAs[Long]("var18") == 138L)
    assert(tied.getAs[String]("trend") == "no_trend")
    // constant series: the tie term consumes the whole variance
    val const = run(Seq(7L, 7L, 7L))
    assert(const.getAs[Long]("var18") == 0L)
    assert(const.isNullAt(const.fieldIndex("z_stat")))
    assert(const.getAs[String]("trend") == "undefined")
  }

  test("Shapley attribution: 2-channel hand game, efficiency axiom, strict-before cut") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // u1: a→conv; u2: b→conv; u3: a,b→conv; u4: conv untouched;
    // u5: a, never converts; u6: a AT the conversion instant with a
    // LATER event_id — must NOT count (strictly-before cut)
    val ev = Seq(
      (1L, "a", t(1), 1L), (1L, "conv", t(2), 2L),
      (2L, "b", t(1), 3L), (2L, "conv", t(2), 4L),
      (3L, "a", t(1), 5L), (3L, "b", t(2), 6L), (3L, "conv", t(3), 7L),
      (4L, "conv", t(1), 8L),
      (5L, "a", t(1), 9L),
      (6L, "conv", t(5), 10L), (6L, "a", t(5), 11L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = graft.operators.Attribution.shapley(ev, "user_id", "ts",
        "event_id", "event_type", "conv", channels = Seq("a", "b"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    // v(∅)=2 (u4,u6), v({a})=3, v({b})=3, v(N)=5; n=2 weights ×2 {1,1}:
    // φ_a = ((3−2)+(5−3))/2 = 1.5 = φ_b; shares 0.5/0.5
    assert(out.toSeq == Seq(("a", 1.5, 0.5), ("b", 1.5, 0.5)), out.toSeq)
  }

  // ---- O'Brien–Fleming group-sequential -----------------------------------

  test("obfMonitor: look schedule, z replay, first-crossing stop") {
    import java.sql.Date
    def d(day: Int) = Date.valueOf(f"2024-01-$day%02d")
    // 5 days, K=5 → one look per day. Arm 1 converts heavily from
    // day 3 on, so a crossing happens before the final look and the
    // later looks must read "stopped".
    val rows =
      (1 to 5).flatMap { day =>
        val hot = day >= 3
        (1 to 40).map { i =>
          val arm = i % 2
          val conv = if (arm == 1 && hot) i <= 38 else i <= 8
          (d(day), arm, conv)
        }
      }
    val df = rows.toDF("day", "arm", "conv")
    val out = AbStats.obfMonitor(df, col("day"), col("arm"), col("conv"),
      looks = 5, critical = 2.04).collect()
    assert(out.map(_.getAs[Int]("look")).toSeq === (1 to 5))
    assert(out.map(_.getAs[Date]("day")).toSeq === (1 to 5).map(d))
    // driver replay with the operator's exact expression shapes
    var (n0, k0, n1, k1) = (0L, 0L, 0L, 0L)
    var crossedBefore = false
    out.zipWithIndex.foreach { case (r, i) =>
      val day = i + 1
      val hot = day >= 3
      n0 += 20; n1 += 20
      k0 += 4 // arm 0: i ∈ {2,4,6,8} convert
      k1 += (if (hot) 19L else 4L)
      assert(r.getAs[Long]("cum_n0") == n0 && r.getAs[Long]("cum_k0") == k0)
      assert(r.getAs[Long]("cum_n1") == n1 && r.getAs[Long]("cum_k1") == k1)
      val pp = (k0 + k1).toDouble / (n0 + n1).toDouble
      val se2 = pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1)
      val z = d6((k1.toDouble / n1 - k0.toDouble / n0) / math.sqrt(se2))
      assert(r.getAs[Double]("z_stat") === z, s"z at look $day")
      val bound = d6(2.04 * math.sqrt(5.0 / day))
      assert(r.getAs[Double]("bound") === bound)
      val crosses = math.abs(z) >= bound
      val want = if (crossedBefore) "stopped"
        else if (crosses) "reject_h0" else "continue"
      assert(r.getAs[String]("decision") === want, s"decision at look $day")
      crossedBefore = crossedBefore || crosses
    }
    assert(crossedBefore, "the hot arm must cross before the last look")
    assert(out.exists(_.getAs[String]("decision") == "stopped"),
      "looks after the first crossing must read stopped")
  }

  test("obfMonitor: D < K coincident looks take the smallest k") {
    import java.sql.Date
    // 2 days, K=5: ceil(2k/5) = 1 for k∈{1,2}, 2 for k∈{3,4,5} —
    // the emitted looks are exactly {1, 3}
    val rows = (1 to 2).flatMap(day => (1 to 10).map(i =>
      (Date.valueOf(f"2024-01-$day%02d"), i % 2, i <= 5)))
    val out = AbStats.obfMonitor(rows.toDF("day", "arm", "conv"),
      col("day"), col("arm"), col("conv"), looks = 5, critical = 2.04)
      .collect()
    assert(out.map(_.getAs[Int]("look")).toSeq === Seq(1, 3))
  }

  // ---- Lan–DeMets alpha spending ------------------------------------------

  test("AlphaSpending: equal-fraction OBF-spending bounds match the " +
      "published Lan–DeMets K=5 table") {
    import graft.operators.AlphaSpending
    // the classical table (two-sided α = 0.05, t = k/5): 4.877,
    // 3.357, 2.680, 2.290, 2.031 — e.g. Lan & DeMets 1983 / the
    // gsDesign sfLDOF reference values
    val got = AlphaSpending.obfBoundsRounded(Seq(20, 40, 60, 80, 100), 0.05)
    val pub = Seq(4.877, 3.357, 2.680, 2.290, 2.031)
    got.zip(pub).zipWithIndex.foreach { case ((g, p), i) =>
      assert(math.abs(g - p) < 0.02, s"look ${i + 1}: got $g want ~$p")
    }
    assert(got.zip(got.tail).forall { case (a, b) => a > b },
      s"OBF-spending bounds must decrease: $got")
  }

  test("AlphaSpending: single look reduces to the fixed-sample z; " +
      "spending accounts to alpha") {
    import graft.operators.AlphaSpending
    val one = AlphaSpending.obfBoundsRounded(Seq(100), 0.05)
    assert(math.abs(one.head - 1.959964) < 1e-4, one)
    val spends = AlphaSpending.obfSpendRounded(Seq(15, 40, 65, 85, 100), 0.05)
    assert(spends.zip(spends.tail).forall { case (a, b) => a <= b },
      s"cumulative spend must be nondecreasing: $spends")
    assert(math.abs(spends.last - 0.05) < 1e-9,
      s"alpha*(1) must equal alpha exactly: $spends")
  }

  test("AlphaSpending: Pocock-type spending — closed-form first look, " +
      "flat-ish later bound") {
    import graft.operators.AlphaSpending
    val b = AlphaSpending.bounds(Seq(0.5, 1.0), 0.05,
      AlphaSpending.pocockSpend(0.05))
    // π₁ = 0.05·ln(1 + (e−1)/2) → u₁ = Φ⁻¹(1 − π₁/2) ≈ 2.157 exactly
    val pi1 = 0.05 * math.log(1.0 + (math.E - 1.0) * 0.5)
    assert(math.abs(b.head - AlphaSpending.PhiInv(1.0 - pi1 / 2)) < 1e-6, b)
    // the second Pocock-spending bound sits just above the first
    // (published K=2 pair ≈ 2.157, 2.201)
    assert(b(1) > b.head && b(1) < 2.26, b)
  }

  test("AlphaSpending: power and HSD families — closed-form first " +
      "look, boundary accounting") {
    import graft.operators.AlphaSpending
    // Kim–DeMets ρ=1 (linear spend), K=2: π₁ = α/2 = 0.025 →
    // u₁ = Φ⁻¹(1 − 0.0125) = 2.2414 exactly (look 1 is closed-form
    // for ANY family)
    val pw = AlphaSpending.bounds(Seq(0.5, 1.0), 0.05,
      AlphaSpending.powerSpend(0.05, 1.0))
    assert(math.abs(pw.head - AlphaSpending.PhiInv(1.0 - 0.0125)) < 1e-9, pw)
    // HSD γ=−4 at quarterly looks: spend(1) = α exactly, cumulative
    // spend monotone, boundaries decrease OBF-like (γ=−4 is the
    // published OBF approximation), final bound near the fixed-sample
    // z (the OBF signature: almost no final-look penalty)
    val sp = AlphaSpending.hsdSpend(0.05, -4.0) _
    assert(math.abs(sp(1.0) - 0.05) < 1e-12)
    val fr = Seq(25, 50, 75, 100)
    val hb = AlphaSpending.boundsRounded(fr, 0.05, sp)
    val hs = AlphaSpending.spendRounded(fr, 0.05, sp)
    assert(hb.zip(hb.tail).forall { case (a, b) => a > b },
      s"HSD(-4) bounds must decrease: $hb")
    assert(hs.zip(hs.tail).forall { case (a, b) => a <= b } &&
      math.abs(hs.last - 0.05) < 1e-9, s"spend accounting: $hs")
    val pi1 = sp(0.25)
    assert(math.abs(hb.head - AlphaSpending.PhiInv(1.0 - pi1 / 2)) < 2e-6, hb)
    assert(hb.last > 1.95 && hb.last < 2.15,
      s"OBF-like final bound expected, got ${hb.last}")
    // γ → 0 degenerates to the linear spend
    assert(math.abs(AlphaSpending.hsdSpend(0.05, 0.0)(0.4) - 0.02) < 1e-12)
  }

  test("alphaSpendingMonitor: unequal-fraction schedule, coincident " +
      "tail looks, z replay") {
    import java.sql.Date
    import graft.operators.AlphaSpending
    def d(day: Int) = Date.valueOf(f"2024-01-$day%02d")
    // 5 days at (15,40,65,85,100)% → look days ceil(5p/100) =
    // 1,2,4,5,5: looks 4 and 5 coincide on day 5 and the row takes
    // the SMALLEST k — emitted looks are exactly {1,2,3,4}
    val rows =
      (1 to 5).flatMap { day =>
        val hot = day >= 3
        (1 to 40).map { i =>
          val arm = i % 2
          val conv = if (arm == 1 && hot) i <= 38 else i <= 8
          (d(day), arm, conv)
        }
      }
    val fr = Seq(15, 40, 65, 85, 100)
    val out = AbStats.alphaSpendingMonitor(rows.toDF("day", "arm", "conv"),
      col("day"), col("arm"), col("conv"), fracPct = fr, alpha = 0.05)
      .collect()
    assert(out.map(_.getAs[Int]("look")).toSeq === Seq(1, 2, 3, 4))
    assert(out.map(_.getAs[Date]("day")).toSeq === Seq(1, 2, 4, 5).map(d))
    val bounds = AlphaSpending.obfBoundsRounded(fr, 0.05)
    val spends = AlphaSpending.obfSpendRounded(fr, 0.05)
    var (n0, k0, n1, k1) = (0L, 0L, 0L, 0L)
    var lastDay = 0
    var crossedBefore = false
    out.foreach { r =>
      val look = r.getAs[Int]("look")
      val day = Seq(1, 2, 4, 5)(look - 1)
      // accumulate the days since the previous emitted look
      ((lastDay + 1) to day).foreach { dd =>
        val hot = dd >= 3
        n0 += 20; n1 += 20; k0 += 4
        k1 += (if (hot) 19L else 4L)
      }
      lastDay = day
      assert(r.getAs[Long]("cum_n0") == n0 && r.getAs[Long]("cum_k0") == k0)
      assert(r.getAs[Long]("cum_n1") == n1 && r.getAs[Long]("cum_k1") == k1)
      val pp = (k0 + k1).toDouble / (n0 + n1).toDouble
      val se2 = pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1)
      val z = d6((k1.toDouble / n1 - k0.toDouble / n0) / math.sqrt(se2))
      assert(r.getAs[Double]("z_stat") === z, s"z at look $look")
      assert(r.getAs[Double]("bound") === bounds(look - 1))
      assert(r.getAs[Double]("alpha_spent") === spends(look - 1))
      val crosses = math.abs(z) >= bounds(look - 1)
      val want = if (crossedBefore) "stopped"
        else if (crosses) "reject_h0" else "continue"
      assert(r.getAs[String]("decision") === want, s"decision at look $look")
      crossedBefore = crossedBefore || crosses
    }
    assert(crossedBefore, "the hot arm must cross at some look")
  }

  // ---- beta-spending futility (C122) + info fractions (C123) -------------

  test("AlphaSpending: one-sided OBF-spending bounds match the published " +
      "K=4 table and the two-sided twin") {
    import graft.operators.AlphaSpending
    // one-sided α = 0.025, t = k/4: the published OBF-spending values
    // (ldbounds/gsDesign sfLDOF) — numerically the two-sided α = 0.05
    // bounds, since the opposite tail's mass is negligible under OBF
    val got = AlphaSpending.boundsOneSided(Seq(0.25, 0.5, 0.75, 1.0),
      0.025, AlphaSpending.obfSpendOneSided(0.025))
    val pub = Seq(4.333, 2.963, 2.359, 2.014)
    got.zip(pub).zipWithIndex.foreach { case ((g, p), i) =>
      assert(math.abs(g - p) < 0.02, s"look ${i + 1}: got $g want ~$p")
    }
    val twoSided = AlphaSpending.bounds(Seq(0.25, 0.5, 0.75, 1.0), 0.05,
      AlphaSpending.obfSpend(0.05))
    got.zip(twoSided).foreach { case (o, t) =>
      assert(math.abs(o - t) < 2e-3, s"one-sided $o vs two-sided $t")
    }
  }

  test("AlphaSpending.futilityBounds: design closes, and Monte-Carlo " +
      "paths reproduce alpha, beta, and power") {
    import graft.operators.AlphaSpending
    val fracs = Seq(0.25, 0.5, 0.75, 1.0)
    val (alpha, beta) = (0.025, 0.1)
    val design = AlphaSpending.futilityBounds(fracs, alpha, beta,
      AlphaSpending.obfSpendOneSided(alpha),
      AlphaSpending.hsdSpend(beta, -2.0))
    // structure: the final look decides (l_K = u_K), interior l < u,
    // the powered drift sits near the fixed-sample z_α + z_β = 3.24
    assert(design.lower.last === design.upper.last)
    design.lower.init.zip(design.upper.init).foreach { case (l, u) =>
      assert(l < u, s"interior futility bound must sit below efficacy")
    }
    assert(design.drift > 2.8 && design.drift < 3.8,
      s"powered drift implausible: ${design.drift}")
    assert(math.abs(design.alphaSpent.last - alpha) < 1e-9)
    assert(math.abs(design.betaSpent.last - beta) < 1e-9)
    // Monte Carlo over the canonical Brownian law (the independent
    // implementation of the same joint distribution the grid
    // recursion integrates): fixed seed, 400k paths
    val rng = new java.util.Random(20260816L)
    val n = 400000
    var rejH0 = 0 // under H0, upper crossings IGNORING futility (non-binding)
    var rejH1 = 0; var futH1 = 0 // under H1, following both bounds
    (1 to n).foreach { _ =>
      val g = Array.fill(fracs.size)(rng.nextGaussian())
      def walk(theta: Double): (Boolean, Boolean) = {
        // returns (crossed upper ignoring lower, crossed upper following both)
        var b = 0.0; var tPrev = 0.0
        var upIgnore = false; var decided = false; var upFollow = false
        fracs.zipWithIndex.foreach { case (t, k) =>
          val dt = t - tPrev
          b += theta * dt + math.sqrt(dt) * g(k)
          val z = b / math.sqrt(t)
          if (!upIgnore && z >= design.upper(k)) upIgnore = true
          if (!decided) {
            if (z >= design.upper(k)) { decided = true; upFollow = true }
            else if (z <= design.lower(k)) decided = true
          }
          tPrev = t
        }
        (upIgnore, upFollow)
      }
      if (walk(0.0)._1) rejH0 += 1
      // reuse the same gaussians for the H1 leg (variance reduction)
      val (_, up1) = walk(design.drift)
      if (up1) rejH1 += 1 else futH1 += 1
    }
    val alphaHat = rejH0.toDouble / n
    val powerHat = rejH1.toDouble / n
    assert(math.abs(alphaHat - alpha) < 2e-3,
      s"MC type-I error $alphaHat vs design $alpha")
    assert(math.abs(powerHat - (1.0 - beta)) < 4e-3,
      s"MC power $powerHat vs design ${1.0 - beta}")
  }

  test("betaSpendingMonitor: hot arm rejects one-sided; cold arm stops " +
      "for futility; replay of bounds and spends") {
    import java.sql.Date
    def d(day: Int) = Date.valueOf(f"2024-01-$day%02d")
    val design = graft.queries.WarehouseQueries.betaSpendingDesign
    def frame(hotArm1: Boolean) =
      (1 to 4).flatMap { day =>
        (1 to 40).map { i =>
          val arm = i % 2
          val conv =
            if (arm == 1) (if (hotArm1) i <= 38 else i <= 4)
            else i <= 16
          (d(day), arm, conv)
        }
      }.toDF("day", "arm", "conv")
    def run(hot: Boolean) = AbStats.betaSpendingMonitor(frame(hot),
      col("day"), col("arm"), col("conv"), fracPct = Seq(25, 50, 75, 100),
      alpha = 0.025, beta = 0.1,
      designKey = graft.queries.WarehouseQueries.BetaSpendingDesignKey)
      .collect()
    val hot = run(true)
    assert(hot.map(_.getAs[Int]("look")).toSeq === (1 to 4))
    hot.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("bound") === design.upper(i))
      assert(r.getAs[Double]("futility_bound") === design.lower(i))
      assert(r.getAs[Double]("alpha_spent") === design.alphaSpent(i))
      assert(r.getAs[Double]("beta_spent") === design.betaSpent(i))
      assert(r.getAs[Double]("powered_drift") === design.drift)
    }
    // arm1 19/20 vs arm0 8/20 per day: z ≈ 3.71 at look 1 (under the
    // steep OBF u₁ ≈ 4.33 → continue), ≈ 5.25 at look 2 (≥ u₂ ≈ 2.96
    // → reject); later looks read stopped
    assert(hot.map(_.getAs[String]("decision")).toSeq ===
      Seq("continue", "reject_h0", "stopped", "stopped"))
    val cold = run(false)
    // arm1 2/20 vs arm0 8/20: z strongly negative — the early futility
    // bound (≈ −0.7) is crossed at look 1
    assert(cold.head.getAs[String]("decision") === "stop_futility",
      cold.map(_.getAs[String]("decision")).mkString(","))
    assert(cold.tail.forall(_.getAs[String]("decision") == "stopped"))
  }

  test("infoLookFractions + alphaSpendingInfoMonitor: skewed accrual " +
      "drives the spending clock, literals replay") {
    import java.sql.Date
    import graft.operators.AlphaSpending
    def d(day: Int) = Date.valueOf(f"2024-01-$day%02d")
    // day sizes 10,10,10,50: calendar looks (25,50,75,100)% land on
    // days 1..4 but the OBSERVED fractions are 1/8, 2/8, 3/8, 1
    val perDay = Seq(10, 10, 10, 50)
    val rows = (1 to 4).flatMap { day =>
      (1 to perDay(day - 1)).map { i =>
        (d(day), i % 2, i % 4 == 0)
      }
    }.toDF("day", "arm", "conv")
    val fr = Seq(25, 50, 75, 100)
    val fracs = AbStats.infoLookFractions(rows, col("day"), fr)
    assert(fracs === Seq(0.125, 0.25, 0.375, 1.0))
    val bounds = AlphaSpending.boundsRoundedAt(fracs, 0.05,
      AlphaSpending.obfSpend(0.05))
    val spends = AlphaSpending.spendRoundedAt(fracs, 0.05,
      AlphaSpending.obfSpend(0.05))
    val out = AbStats.alphaSpendingInfoMonitor(rows, col("day"), col("arm"),
      col("conv"), fracPct = fr, alpha = 0.05).collect()
    assert(out.map(_.getAs[Int]("look")).toSeq === (1 to 4))
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("info_frac") === fracs(i))
      assert(r.getAs[Double]("bound") === bounds(i))
      assert(r.getAs[Double]("alpha_spent") === spends(i))
    }
    // info-clock bounds differ from the calendar-clock bounds at the
    // interior looks (the point of C123)
    val calBounds = AlphaSpending.obfBoundsRounded(fr, 0.05)
    assert(bounds.init != calBounds.init,
      s"info bounds $bounds vs calendar $calBounds should differ")
    assert(bounds.head > calBounds.head,
      "less observed information at look 1 must spend less alpha " +
        "(higher bound)")
  }

  // ---- delta-method ratio metric ----------------------------------------

  test("ratioDelta: hand per-unit frame matches the textbook formula") {
    // arm0 units: (x,y) = (2,4),(4,4); arm1: (2,6),(4,10)
    val df = Seq((0, 2.0, 4.0), (0, 4.0, 4.0), (1, 2.0, 6.0), (1, 4.0, 10.0))
      .toDF("arm", "x", "y")
    val r = AbStats.ratioDelta(df, col("arm"), col("x"), col("y")).head
    assert(r.getAs[Long]("n_a") === 2L && r.getAs[Long]("n_b") === 2L)
    // R_a = 8/6, R_b = 16/6
    assert(r.getAs[Double]("ratio_a") === d6(8.0 / 6.0))
    assert(r.getAs[Double]("ratio_b") === d6(16.0 / 6.0))
    assert(r.getAs[Double]("diff") === d6(16.0 / 6.0 - 8.0 / 6.0))
    // driver replay of the delta-method variance per arm
    def vr(xs: Seq[Double], ys: Seq[Double]): Double = {
      val n = xs.length.toDouble
      val sx = xs.sum; val sy = ys.sum
      val r = sy / sx; val xbar = sx / n
      val vx = (xs.map(v => v * v).sum - sx * sx / n) / (n - 1.0)
      val vy = (ys.map(v => v * v).sum - sy * sy / n) / (n - 1.0)
      val cxy = (xs.zip(ys).map(p => p._1 * p._2).sum - sx * sy / n) / (n - 1.0)
      (vy - 2.0 * r * cxy + r * r * vx) / (n * xbar * xbar)
    }
    val se2 = vr(Seq(2.0, 4.0), Seq(4.0, 4.0)) +
      vr(Seq(2.0, 4.0), Seq(6.0, 10.0))
    assert(r.getAs[Double]("z_stat") ===
      d6((16.0 / 6.0 - 8.0 / 6.0) / math.sqrt(se2)))
  }

  test("ratioDelta: degenerate arms publish null, not Inf") {
    // arm1 has a single unit → its variance leg is null → z null
    val df = Seq((0, 2.0, 4.0), (0, 4.0, 4.0), (1, 2.0, 6.0))
      .toDF("arm", "x", "y")
    val r = AbStats.ratioDelta(df, col("arm"), col("x"), col("y")).head
    assert(r.isNullAt(r.fieldIndex("z_stat")))
    assert(r.getAs[Double]("ratio_b") === 3.0)
    // zero denominator mass: ratio itself is null
    val zx = Seq((0, 0.0, 4.0), (0, 0.0, 4.0), (1, 2.0, 6.0), (1, 4.0, 10.0))
      .toDF("arm", "x", "y")
    val rz = AbStats.ratioDelta(zx, col("arm"), col("x"), col("y")).head
    assert(rz.isNullAt(rz.fieldIndex("ratio_a")))
    assert(rz.isNullAt(rz.fieldIndex("z_stat")))
  }

  // ---- autocorrelation ------------------------------------------------------

  test("acf: alternating series has exact hand values; constant is null") {
    import java.sql.Date
    import graft.operators.Changepoint
    def d(day: Int) = Date.valueOf(f"2024-01-$day%02d")
    // [1,3,1,3,1,3]: c_t = 6x−12 = ±6; den = 216; lag1 = −180/216,
    // lag2 = 144/216, lag5 = −36/216
    val s = (1 to 6).map(i => (d(i), if (i % 2 == 1) 1L else 3L))
      .toDF("day", "v")
    val out = Changepoint.acf(s, col("day"), col("v"), maxLag = 5).collect()
    assert(out.map(_.getAs[Int]("lag")).toSeq === (1 to 5))
    assert(out.map(_.getAs[Long]("n_pairs")).toSeq === Seq(5L, 4L, 3L, 2L, 1L))
    assert(out(0).getAs[Double]("acf") === d6(-180.0 / 216.0))
    assert(out(1).getAs[Double]("acf") === d6(144.0 / 216.0))
    assert(out(4).getAs[Double]("acf") === d6(-36.0 / 216.0))
    // lags past the span publish null with zero pairs, not vanish
    val out8 = Changepoint.acf(s, col("day"), col("v"), maxLag = 8).collect()
    assert(out8.length === 8)
    assert(out8(6).getAs[Long]("n_pairs") === 0L)
    assert(out8(6).isNullAt(out8(6).fieldIndex("acf")))
    // constant series: zero variance → all lags null
    val const = (1 to 4).map(i => (d(i), 7L)).toDF("day", "v")
    Changepoint.acf(const, col("day"), col("v"), maxLag = 2).collect()
      .foreach(r => assert(r.isNullAt(r.fieldIndex("acf"))))
    // a calendar gap contributes no pair at the crossing offset
    val gap = Seq((d(1), 1L), (d(2), 3L), (d(4), 1L)).toDF("day", "v")
    val og = Changepoint.acf(gap, col("day"), col("v"), maxLag = 2).collect()
    assert(og(0).getAs[Long]("n_pairs") === 1L, "only day1→day2 pairs at lag 1")
    assert(og(1).getAs[Long]("n_pairs") === 1L, "only day2→day4 pairs at lag 2")
  }

  // ---- PACF -------------------------------------------------------------

  test("pacf: Durbin-Levinson replay off the operator's own acf; lag1 identity") {
    import java.sql.Date
    import graft.operators.Changepoint
    def d(i: Int) = Date.valueOf(java.time.LocalDate.of(2024, 5, 1)
      .plusDays(i))
    // a deterministic wavy series long enough for 4 lags
    val s = (0 until 20).map(i =>
      (d(i), (100 + 30 * (i % 3) + 7 * (i % 5)).toLong)).toDF("day", "v")
    val L = 4
    val rArr = Changepoint.acf(s, col("day"), col("v"), L)
      .orderBy(col("lag")).collect().map(_.getAs[Double]("acf"))
    val got = Changepoint.pacf(s, col("day"), col("v"), L)
      .orderBy(col("lag")).collect().map(_.getAs[Double]("pacf"))
    // independent plain-Scala Durbin-Levinson over the SAME rounded
    // acf inputs
    var phi = Vector(rArr(0)); var pacf = Vector(rArr(0))
    (2 to L).foreach { k =>
      val num = rArr(k - 1) -
        (1 until k).map(j => phi(j - 1) * rArr(k - j - 1)).foldLeft(0.0)(_ + _)
      val den = 1.0 -
        (1 until k).map(j => phi(j - 1) * rArr(j - 1)).foldLeft(0.0)(_ + _)
      val pkk = num / den
      phi = (1 until k).map(j => phi(j - 1) - pkk * phi(k - 1 - j))
        .toVector :+ pkk
      pacf = pacf :+ pkk
    }
    assert(got.toSeq === pacf.map(d6).toSeq)
    // lag-1 identity: PACF(1) = ACF(1) exactly
    assert(got(0) === rArr(0))
  }

  // ---- degree assortativity ---------------------------------------------

  test("degreeAssortativity: star is −1, regular graph is null") {
    import graft.operators.Centrality
    // K_{1,3}: every edge joins degree 3 to degree 1 → r = −1 exactly
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("u", "v")
    val rs = Centrality.degreeAssortativity(star).head
    assert(rs.getAs[Long]("n_edges") === 3L)
    assert(rs.getAs[Double]("assortativity") === -1.0)
    // triangle: all degrees equal → zero degree variance → null
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    val rt = Centrality.degreeAssortativity(tri).head
    assert(rt.getAs[Long]("n_edges") === 3L)
    assert(rt.isNullAt(rt.fieldIndex("assortativity")))
    // two stars joined at the leaves: hand Pearson over 10 ordered pairs
    val g = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 1L), (3L, 2L))
      .toDF("u", "v")
    val degs = Map(0L -> 2.0, 1L -> 3.0, 2L -> 3.0, 3L -> 2.0)
    val pairs = Seq((0L, 1L), (0L, 2L), (1L, 2L), (3L, 1L), (3L, 2L))
      .flatMap { case (a, b) => Seq((degs(a), degs(b)), (degs(b), degs(a))) }
    val m = pairs.length.toDouble
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val want = d6((m * sxy - sx * sy) /
      (math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)))
    assert(Centrality.degreeAssortativity(g).head
      .getAs[Double]("assortativity") === want)
  }

  // ---- TextRank keywords -------------------------------------------------------

  test("keywordTextRank: hub word outranks leaves; self-loops drop") {
    import graft.operators.Collocations
    // "hub" co-occurs with a, b, c; leaves co-occur only with hub
    // (plus one a-b edge) → hub must take rank 1
    val docs = Seq("hub a", "hub b", "hub c", "a b").toDF("text")
    val out = Collocations.keywordTextRank(docs, "text", iterations = 5,
      k = 10).collect()
    assert(out.head.getAs[String]("word") === "hub")
    assert(out.map(_.getAs[String]("word")).toSet ===
      Set("hub", "a", "b", "c"))
    // ranks are exact integers and deterministic across invocations
    val again = Collocations.keywordTextRank(docs, "text", iterations = 5,
      k = 10).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      again.map(r => (r.getString(0), r.getLong(1))).toSeq)
    // a doc that only repeats one word contributes a node, no edge
    val solo = Seq("x x x").toDF("text")
    val so = Collocations.keywordTextRank(solo, "text", iterations = 3,
      k = 5).collect()
    assert(so.length === 1 && so.head.getAs[String]("word") === "x")
  }

  // ---- PMI collocations ------------------------------------------------------

  test("topPmi: hand corpus, min-count floor, tie-broken ordering") {
    import graft.operators.Collocations
    // "x y" ×5 plus "p q" ×4: (x,y) passes the floor with
    // PMI = ln(5·19²/(14·5·5)); (p,q) is one short and must drop
    val docs = (Seq.fill(5)("x y") ++ Seq.fill(4)("p q") :+ "z")
      .toDF("text")
    val out = Collocations.topPmi(docs, "text", minCount = 5L, k = 10)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("v") === "x" && r.getAs[String]("w") === "y")
    assert(r.getAs[Long]("c_vw") === 5L)
    assert(r.getAs[Long]("c_v") === 5L && r.getAs[Long]("c_w") === 5L)
    // N_tok = 19 (5·2 + 4·2 + 1), N_pair = 9
    assert(r.getAs[Double]("pmi") ===
      d6(math.log(5.0 * 19.0 * 19.0 / (9.0 * 5.0) / 5.0)))
    // whitespace-only docs contribute nothing (the toks guard)
    val out2 = Collocations.topPmi(docs.union(Seq("   ").toDF("text")),
      "text", minCount = 5L, k = 10).collect()
    assert(out2.map(_.getAs[Double]("pmi")).toSeq ===
      out.map(_.getAs[Double]("pmi")).toSeq)
  }

  // ---- median CI ---------------------------------------------------------

  test("medianCi: ranks on 1..100, tie collapse, empty input") {
    import graft.operators.AbStats
    // n=100: median rank 50; L = floor((100 - 1.96*10)/2) = 40,
    // U = 100 - 40 + 1 = 61 — values ARE their ranks here
    val df = (1 to 100).map(_.toLong).toDF("v")
    val r = AbStats.medianCi(df, col("v")).head
    assert(r.getAs[Long]("n") === 100L)
    assert(r.getAs[Long]("median") === 50L)
    val l = math.floor((100.0 - 1.959963984540054 * 10.0) / 2.0).toLong
    assert(r.getAs[Long]("ci_lo") === l)
    assert(r.getAs[Long]("ci_hi") === 100L - l + 1L)
    // all-tied input: every order statistic is the one value
    val tied = Seq.fill(9)(7L).toDF("v")
    val rt = AbStats.medianCi(tied, col("v")).head
    assert(rt.getAs[Long]("median") === 7L)
    assert(rt.getAs[Long]("ci_lo") === 7L && rt.getAs[Long]("ci_hi") === 7L)
    // empty input: nulls, matching the oracle's empty aggregates
    val re = AbStats.medianCi(df.filter(col("v") < 0L), col("v")).head
    assert(re.isNullAt(re.fieldIndex("n")))
    assert(re.isNullAt(re.fieldIndex("median")))
  }

  // ---- runs test ----------------------------------------------------------

  test("runsTest: alternating series, monotone null, zero moves dropped") {
    import java.sql.Date
    import graft.operators.AbStats
    def d(i: Int) = Date.valueOf(java.time.LocalDate.of(2024, 7, 1)
      .plusDays(i))
    // [1,2,1,2,1]: signs +,-,+,- → 4 runs, n_up=n_down=2;
    // mu = 3, s2 = 2/3
    val alt = Seq(1L, 2L, 1L, 2L, 1L).zipWithIndex
      .map { case (v, i) => (d(i), v) }.toDF("day", "v")
    val r = AbStats.runsTest(alt, col("day"), col("v")).head
    assert(r.getAs[Long]("n_runs") === 4L)
    assert(r.getAs[Long]("n_up") === 2L && r.getAs[Long]("n_down") === 2L)
    assert(r.getAs[Double]("expected_runs") === 3.0)
    assert(r.getAs[Double]("z_stat") === d6(1.0 / math.sqrt(2.0 / 3.0)))
    // strictly increasing: one run, no down moves → null z
    val mono = (0 until 4).map(i => (d(i), (i + 1).toLong)).toDF("day", "v")
    val rm = AbStats.runsTest(mono, col("day"), col("v")).head
    assert(rm.getAs[Long]("n_runs") === 1L)
    assert(rm.isNullAt(rm.fieldIndex("z_stat")))
    // a zero move contributes no sign (the standard convention)
    val flat = Seq((d(0), 1L), (d(1), 1L), (d(2), 2L)).toDF("day", "v")
    val rf = AbStats.runsTest(flat, col("day"), col("v")).head
    assert(rf.getAs[Long]("n_up") === 1L && rf.getAs[Long]("n_down") === 0L)
  }

  // ---- Wilson rate CI --------------------------------------------------------

  test("rateWilsonCi: hand replay, boundary-rate behavior, empty arm") {
    import graft.operators.AbStats
    val z = 1.959963984540054
    def wilson(n: Long, k: Long): (Double, Double) = {
      val nD = n.toDouble; val p = k.toDouble / nD; val z2 = z * z
      val denom = 1.0 + z2 / nD
      val center = (p + z2 / (2.0 * nD)) / denom
      val half = z * math.sqrt(p * (1.0 - p) / nD
        + z2 / (4.0 * nD * nD)) / denom
      (d6(center - half), d6(center + half))
    }
    val rows = (1 to 100).map(i => (0, i <= 10)) ++
      (1 to 100).map(i => (1, i <= 20))
    val r = AbStats.rateWilsonCi(rows.toDF("arm", "conv"),
      col("arm"), col("conv")).head
    assert(r.getAs[Long]("n_a") === 100L && r.getAs[Long]("k_a") === 10L)
    assert(r.getAs[Double]("rate_a") === 0.1)
    val (loA, hiA) = wilson(100, 10)
    assert(r.getAs[Double]("lo_a") === loA && r.getAs[Double]("hi_a") === hiA)
    assert(r.getAs[Double]("diff") === 0.1)
    // interval is inside (0,1) and contains the point estimate
    assert(loA > 0.0 && hiA < 1.0 && loA < 0.1 && hiA > 0.1)
    // k = 0: the Wilson lower bound is EXACTLY 0 (Wald would go
    // negative); k = n mirrors at 1
    val zero = (1 to 50).map(_ => (0, false)) ++ (1 to 50).map(_ => (1, true))
    val rz = AbStats.rateWilsonCi(zero.toDF("arm", "conv"),
      col("arm"), col("conv")).head
    assert(rz.getAs[Double]("lo_a") === 0.0)
    assert(rz.getAs[Double]("hi_b") === 1.0)
    assert(rz.getAs[Double]("hi_a") > 0.0 && rz.getAs[Double]("lo_b") < 1.0)
    // an empty arm publishes nulls, not a division error
    val one = Seq((0, true), (0, false)).toDF("arm", "conv")
    val ro = AbStats.rateWilsonCi(one, col("arm"), col("conv")).head
    assert(ro.isNullAt(ro.fieldIndex("rate_b")))
    assert(ro.isNullAt(ro.fieldIndex("diff")))
  }

  // ---- duplicated-paragraph mass ----------------------------------------------

  test("dupMassByGroup: shared paragraph counted per source, clean source zero") {
    import graft.operators.ParagraphDedup
    val para = (1 to 12).map(i => s"w$i").mkString(" ")
    val distinctText = (1 to 12).map(i => s"u$i").mkString(" ")
    val docs = Seq(
      (1L, "A", para), (2L, "A", para),           // cross-doc dup
      (3L, "B", distinctText),                     // clean
      (4L, "B", para + " tail words here")         // 2 paras: 1 dup, 1 not
    ).toDF("id", "src", "text")
    val out = ParagraphDedup.dupMassByGroup(docs, col("text"), col("id"),
      col("src")).collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Long]("n_paras") === 2L)
    assert(out("A").getAs[Long]("n_dup_paras") === 2L)
    assert(out("A").getAs[Double]("dup_frac") === 1.0)
    assert(out("B").getAs[Long]("n_paras") === 3L)
    assert(out("B").getAs[Long]("n_dup_paras") === 1L)
    assert(out("B").getAs[Double]("dup_frac") === d6(1.0 / 3.0))
  }

  // ---- Good-Turing / Chao1 --------------------------------------------------

  test("goodTuringVocab: hand corpus, saturated corpus, empty corpus") {
    import graft.operators.LanguageModel
    // "a a b" + "c": V=3, N=4, n1=2 (b,c), n2=1 (a) →
    // p0 = 0.5, chao1 = 3 + 2·1/(2·2) = 3.5
    val docs = Seq("a a b", "c").toDF("text")
    val r = LanguageModel.goodTuringVocab(docs, "text").head
    assert(r.getAs[Long]("vocab_size") === 3L)
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("n_hapax") === 2L)
    assert(r.getAs[Long]("n_dis") === 1L)
    assert(r.getAs[Double]("p_unseen") === 0.5)
    assert(r.getAs[Double]("chao1_vocab") === 3.5)
    // no hapaxes: unseen mass 0, chao1 = V exactly
    val sat = Seq("x x", "y y").toDF("text")
    val rs = LanguageModel.goodTuringVocab(sat, "text").head
    assert(rs.getAs[Double]("p_unseen") === 0.0)
    assert(rs.getAs[Double]("chao1_vocab") === 2.0)
    // whitespace-only corpus: zero everything, null p_unseen
    val empty = Seq("   ").toDF("text")
    val re = LanguageModel.goodTuringVocab(empty, "text").head
    assert(re.getAs[Long]("vocab_size") === 0L)
    assert(re.isNullAt(re.fieldIndex("p_unseen")))
  }

  // ---- Yuen trimmed-mean t --------------------------------------------------

  test("yuenTrimmed: hand replay, whale robustness, all-tied null") {
    import graft.operators.AbStats
    // arm0 = 1..10, arm1 = 11..20 (cents): k=1, h=8, trimmed means
    // 5.5 / 15.5; winsorized sums 55/369 per the hand ledger →
    // d = 66.5/56 each, t = 10/sqrt(2·1.1875), df = 14 (symmetric)
    val df0 = ((1 to 10).map(v => (0, v.toLong)) ++
      (11 to 20).map(v => (1, v.toLong))).toDF("arm", "cents")
    val r = AbStats.yuenTrimmed(df0, col("arm"), col("cents")).head
    assert(r.getAs[Long]("n_a") === 10L && r.getAs[Long]("h_a") === 8L)
    assert(r.getAs[Double]("tmean_a") === 5.5)
    assert(r.getAs[Double]("tmean_b") === 15.5)
    val d = (369.0 - 55.0 * 55.0 / 10.0) / (8.0 * 7.0)
    assert(r.getAs[Double]("t_stat") === d6(10.0 / math.sqrt(2.0 * d)))
    assert(r.getAs[Double]("df") === 14.0)
    // a whale in the top trim slot cannot move the trimmed mean
    val whale = ((1 to 10).map(v => (0, v.toLong)) ++
      ((11 to 19).map(_.toLong) :+ 100000L).map(v => (1, v))).toDF("arm", "cents")
    val rw = AbStats.yuenTrimmed(whale, col("arm"), col("cents")).head
    assert(rw.getAs[Double]("tmean_b") === 15.5,
      "trimmed mean must ignore the whale")
    // all-tied arms: zero winsorized variance → null t, not Inf
    val flat = Seq.fill(10)((0, 5L)).toDF("arm", "cents")
      .union(Seq.fill(10)((1, 5L)).toDF("arm", "cents"))
    val rf = AbStats.yuenTrimmed(flat, col("arm"), col("cents")).head
    assert(rf.isNullAt(rf.fieldIndex("t_stat")))
  }

  // ---- Sen's slope ----------------------------------------------------------

  test("senSlope: exact line recovered; median robust to one outlier") {
    import java.sql.Date
    import graft.operators.Changepoint
    val epoch0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay.toDouble
    def d(i: Int) = Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
      .plusDays(i))
    // y = 3x + 5 in day units: slope 3, intercept vs EPOCH days
    val line = (0 until 5).map(i => (d(i), 3L * i + 5L)).toDF("day", "v")
    val rl = Changepoint.senSlope(line, col("day"), col("v")).head
    assert(rl.getAs[Long]("n_steps") === 5L)
    assert(rl.getAs[Long]("n_pairs") === 10L)
    assert(rl.getAs[Double]("sen_slope") === 3.0)
    assert(rl.getAs[Double]("sen_intercept") === d6(5.0 - 3.0 * epoch0))
    // [0, 10, 5]: pairwise slopes {10, 2.5, −5} → median 2.5; the
    // OLS slope would chase the spike
    val noisy = Seq((d(0), 0L), (d(1), 10L), (d(2), 5L)).toDF("day", "v")
    val rn = Changepoint.senSlope(noisy, col("day"), col("v")).head
    assert(rn.getAs[Double]("sen_slope") === 2.5)
    // intercept = median of y − 2.5·x over epoch-day x
    assert(rn.getAs[Double]("sen_intercept") === d6(-2.5 * epoch0))
    // single point: no pairs, null slope/intercept
    val one = Seq((d(0), 7L)).toDF("day", "v")
    val ro = Changepoint.senSlope(one, col("day"), col("v")).head
    assert(ro.getAs[Long]("n_pairs") === 0L)
    assert(ro.isNullAt(ro.fieldIndex("sen_slope")))
    assert(ro.isNullAt(ro.fieldIndex("sen_intercept")))
    // EMPTY series: NULL n_steps/n_pairs, matching the oracle's
    // list() over zero rows (0-vs-NULL was a review finding)
    val none = one.filter(col("v") < 0L)
    val re = Changepoint.senSlope(none, col("day"), col("v")).head
    assert(re.isNullAt(re.fieldIndex("n_steps")))
    assert(re.isNullAt(re.fieldIndex("n_pairs")))
  }

  // ---- isotonic calibration -----------------------------------------------

  test("isotonic fit: monotone input unchanged, violators pooled by weight") {
    import graft.operators.Isotonic
    // already monotone: the fit IS the raw curve
    val mono = Seq((0L, 10L, 1L), (1L, 10L, 2L), (2L, 10L, 3L))
      .toDF("bin", "n", "pos")
    val rm = Isotonic.fit(mono, col("bin"), col("n"), col("pos")).collect()
    assert(rm.map(_.getAs[Double]("fit_isotonic")).toSeq ===
      Seq(0.1, 0.2, 0.3))
    assert(rm.map(_.getAs[Double]("frac_pos")).toSeq === Seq(0.1, 0.2, 0.3))
    // violator: rates [0.1, 0.5, 0.3] → PAV pools bins 2+3 to 8/20
    val vio = Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 3L))
      .toDF("bin", "n", "pos")
    val rv = Isotonic.fit(vio, col("bin"), col("n"), col("pos")).collect()
    assert(rv.map(_.getAs[Double]("fit_isotonic")).toSeq ===
      Seq(0.1, 0.4, 0.4))
    // weighted pooling: (n=1, rate 1) then (n=9, rate 0) → 1/10 both
    val wt = Seq((0L, 1L, 1L), (1L, 9L, 0L)).toDF("bin", "n", "pos")
    val rw = Isotonic.fit(wt, col("bin"), col("n"), col("pos")).collect()
    assert(rw.map(_.getAs[Double]("fit_isotonic")).toSeq === Seq(0.1, 0.1))
    // the fit is ALWAYS non-decreasing (the operator's contract)
    val noisy = Seq((0L, 5L, 4L), (1L, 5L, 1L), (2L, 5L, 5L), (3L, 5L, 0L),
      (4L, 5L, 3L)).toDF("bin", "n", "pos")
    val fits = Isotonic.fit(noisy, col("bin"), col("n"), col("pos"))
      .collect().map(_.getAs[Double]("fit_isotonic"))
    assert(fits.sliding(2).forall(p => p(0) <= p(1)), fits.toSeq)
    // total mass is conserved (least-squares projection property)
    assert(math.abs(fits.sum * 5.0 - 13.0) < 1e-6)
  }

  // ---- seasonal decomposition ----------------------------------------------

  test("seasonalDecompose: pure weekly signal decomposes exactly") {
    import java.sql.Date
    import graft.operators.Changepoint
    // values cycle [7,14,...,49] (sum 196, mean 28) over 14 days: the
    // centered MA over any full window is exactly 28, the seasonal
    // index is p − 28 (already centered), the residual is exactly 0
    def d(i: Int) = Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
      .plusDays(i))
    val pattern = (1 to 7).map(_ * 7L)
    val s = (0 until 14).map(i => (d(i), pattern(i % 7)))
      .toDF("day", "v")
    val out = Changepoint.seasonalDecompose(s, col("day"), col("v"),
      period = 7).collect()
    assert(out.length === 14)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("value") === pattern(i % 7))
      if (i >= 3 && i <= 10) {
        assert(r.getAs[Double]("trend") === 28.0, s"trend at $i")
        assert(r.getAs[Double]("residual") === 0.0, s"residual at $i")
      } else {
        assert(r.isNullAt(r.fieldIndex("trend")), s"edge trend at $i")
        assert(r.isNullAt(r.fieldIndex("residual")), s"edge residual at $i")
      }
      assert(r.getAs[Double]("seasonal") === pattern(i % 7) - 28.0,
        s"seasonal at $i")
    }
    // seasonal indices sum to ~0 (the centering contract)
    val idx = out.take(7).map(_.getAs[Double]("seasonal"))
    assert(math.abs(idx.sum) < 1e-6)
  }

  test("seasonalDecompose: constant series has zero seasonal and residual") {
    import java.sql.Date
    import graft.operators.Changepoint
    def d(i: Int) = Date.valueOf(java.time.LocalDate.of(2024, 3, 1)
      .plusDays(i))
    val s = (0 until 14).map(i => (d(i), 70L)).toDF("day", "v")
    val out = Changepoint.seasonalDecompose(s, col("day"), col("v"))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Double]("seasonal") === 0.0)
      if (!r.isNullAt(r.fieldIndex("trend"))) {
        assert(r.getAs[Double]("trend") === 70.0)
        assert(r.getAs[Double]("residual") === 0.0)
      }
    }
    // a short series (< 2p−1 days) leaves some weekdays with no
    // detrended row — those rows publish null seasonal, not a crash
    val short = (0 until 10).map(i => (d(i), 70L)).toDF("day", "v")
    val so = Changepoint.seasonalDecompose(short, col("day"), col("v"))
      .collect()
    assert(so.exists(_.isNullAt(so.head.fieldIndex("seasonal"))))
  }

  // ---- effective sample size ----------------------------------------------

  test("effectiveSampleSize: equal weights give ESS = n, skew shrinks it") {
    import graft.operators.Concentration
    val df = Seq(("a", 0.5), ("a", 0.5), ("a", 0.5),
      ("b", 1.0), ("b", 0.0), ("b", 0.0),
      ("c", 0.0)).toDF("g", "w")
    val out = Concentration.effectiveSampleSize(df, col("g"), col("w"))
      .collect().map(r => r.getString(0) -> r).toMap
    // equal weights: ESS = n exactly, deff = 1
    assert(out("a").getAs[Double]("ess") === 3.0)
    assert(out("a").getAs[Double]("design_effect") === 1.0)
    // all mass on one of three docs: ESS = 1, deff = 3
    assert(out("b").getAs[Double]("ess") === 1.0)
    assert(out("b").getAs[Double]("design_effect") === 3.0)
    // zero-weight group publishes null, not a division error
    assert(out("c").isNullAt(out("c").fieldIndex("ess")))
    assert(out("c").isNullAt(out("c").fieldIndex("design_effect")))
  }

  // ---- Kruskal–Wallis -----------------------------------------------------

  test("kruskalWallis: untied textbook case, correction = 1") {
    // arms [1,2] [3,4] [5,6]: ranks 1..6, R = 3, 7, 11
    // H = 12/(6·7)·(9/2 + 49/2 + 121/2) − 3·7 = 32/7
    val df = Seq((0, 1L), (0, 2L), (1, 3L), (1, 4L), (2, 5L), (2, 6L))
      .toDF("arm", "v")
    val r = AbStats.kruskalWallis(df, col("arm"), col("v")).head
    assert(r.getAs[Long]("n") === 6L)
    assert((0 to 2).forall(i => r.getAs[Long](s"n_$i") === 2L))
    assert(r.getAs[Double]("h_stat") === d6(32.0 / 7.0))
    assert(r.getAs[Double]("h_adj") === d6(32.0 / 7.0))
    assert(r.getAs[Long]("dof") === 2L)
  }

  test("kruskalWallis: all-tied corpus gives H = 0 and null adjusted H") {
    val df = Seq((0, 5L), (0, 5L), (1, 5L), (1, 5L), (2, 5L), (2, 5L))
      .toDF("arm", "v")
    val r = AbStats.kruskalWallis(df, col("arm"), col("v")).head
    // every rank is the same average, so raw H is exactly 0; the tie
    // correction denominator is 0 ⇒ adjusted H must be null, not NaN
    assert(r.getAs[Double]("h_stat") === 0.0)
    assert(r.isNullAt(r.fieldIndex("h_adj")))
  }

  test("kruskalWallis: empty arm publishes null H") {
    val df = Seq((0, 1L), (0, 2L), (1, 3L), (1, 4L)).toDF("arm", "v")
    val r = AbStats.kruskalWallis(df, col("arm"), col("v")).head
    assert(r.getAs[Long]("n_2") === 0L)
    assert(r.isNullAt(r.fieldIndex("h_stat")))
  }

  // ---- one-way ANOVA ------------------------------------------------------

  test("anovaF: textbook three-arm case") {
    // arms [1,2,3] [2,3,4] [3,4,5]: SSB = 6, SSW = 6, F = 3/1 = 3
    val df = Seq((0, 1L), (0, 2L), (0, 3L), (1, 2L), (1, 3L), (1, 4L),
      (2, 3L), (2, 4L), (2, 5L)).toDF("arm", "v")
    val r = AbStats.anovaF(df, col("arm"), col("v")).head
    assert(r.getAs[Double]("mean_0") === 2.0)
    assert(r.getAs[Double]("mean_1") === 3.0)
    assert(r.getAs[Double]("mean_2") === 4.0)
    assert(r.getAs[Double]("f_stat") === 3.0)
    assert(r.getAs[Long]("df1") === 2L && r.getAs[Long]("df2") === 6L)
  }

  test("anovaF: zero within-variance publishes null F") {
    val df = Seq((0, 1L), (0, 1L), (1, 2L), (1, 2L), (2, 3L), (2, 3L))
      .toDF("arm", "v")
    val r = AbStats.anovaF(df, col("arm"), col("v")).head
    assert(r.isNullAt(r.fieldIndex("f_stat")))
  }

  // ---- Brown–Forsythe -----------------------------------------------------

  test("brownForsythe: hand-computed spread case") {
    // arm0 [1,2,3] med 2 devs [1,0,1]; arm1 [1,5,9] med 5 devs [4,0,4];
    // arm2 [2,4,6] med 4 devs [2,0,2] → SSB = 56/9, SSW = 14, W = 4/3
    val df = Seq((0, 1L), (0, 2L), (0, 3L), (1, 1L), (1, 5L), (1, 9L),
      (2, 2L), (2, 4L), (2, 6L)).toDF("arm", "v")
    val r = AbStats.brownForsythe(df, col("arm"), col("v")).head
    assert(r.getAs[Long]("med_0") === 2L)
    assert(r.getAs[Long]("med_1") === 5L)
    assert(r.getAs[Long]("med_2") === 4L)
    assert(r.getAs[Double]("w_stat") === d6(4.0 / 3.0))
    assert(r.getAs[Long]("df1") === 2L && r.getAs[Long]("df2") === 6L)
  }

  test("brownForsythe: even arm uses the LOWER median (C94 convention)") {
    // arm0 [1,3]: lower median 1 (rank (2+1) DIV 2 = 1), devs [0,2]
    val df = Seq((0, 1L), (0, 3L), (1, 1L), (1, 2L), (2, 1L), (2, 2L))
      .toDF("arm", "v")
    val r = AbStats.brownForsythe(df, col("arm"), col("v")).head
    assert(r.getAs[Long]("med_0") === 1L)
  }

  // ---- Kendall tau-b ------------------------------------------------------

  test("kendallTau: untied case counts concordances exactly") {
    import graft.operators.Changepoint
    // y = [1,3,2,4] against x = [1,2,3,4]: C = 5, D = 1, tau = 2/3
    val df = Seq((1, 1L, 1L), (2, 2L, 3L), (3, 3L, 2L), (4, 4L, 4L))
      .toDF("s", "x", "y")
    val r = Changepoint.kendallTau(df, col("s"), col("x"), col("y")).head
    assert(r.getAs[Long]("concordant") === 5L)
    assert(r.getAs[Long]("discordant") === 1L)
    assert(r.getAs[Double]("tau_b") === d6(2.0 / 3.0))
  }

  test("kendallTau: tie-corrected denominator") {
    import graft.operators.Changepoint
    // x = [1,1,2], y = [1,2,2]: 1 tie on x, 1 tie on y, 1 concordant
    // n0 = 3, denx = deny = 2 → tau-b = 1/√4 = 0.5
    val df = Seq((1, 1L, 1L), (2, 1L, 2L), (3, 2L, 2L)).toDF("s", "x", "y")
    val r = Changepoint.kendallTau(df, col("s"), col("x"), col("y")).head
    assert(r.getAs[Long]("ties_x") === 1L)
    assert(r.getAs[Long]("ties_y") === 1L)
    assert(r.getAs[Double]("tau_b") === 0.5)
  }

  test("kendallTau: constant margin publishes null tau, not NaN") {
    import graft.operators.Changepoint
    val df = Seq((1, 1L, 1L), (2, 1L, 2L), (3, 1L, 3L)).toDF("s", "x", "y")
    val r = Changepoint.kendallTau(df, col("s"), col("x"), col("y")).head
    assert(r.isNullAt(r.fieldIndex("tau_b")))
  }

  // ---- TF-IDF keywords -------------------------------------------------------

  test("keywordTfidf: hand scores, whitespace doc counts toward N, tie by word") {
    import graft.operators.Collocations
    // N = 3 docs (the whitespace doc COUNTS toward N but emits no
    // keywords); df: apple 1, banana 2, cherry 1
    val docs = Seq((1L, "apple banana apple"), (2L, "banana cherry"),
      (3L, "   ")).toDF("doc_id", "text")
    val out = Collocations.keywordTfidf(docs, "doc_id", "text", k = 3)
      .collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 2L))
    def score(tf: Long, df0: Long): Double =
      d6(tf * (math.log(4.0 / (df0 + 1.0)) + 1.0))
    val d1 = out.filter(_.getAs[Long]("doc_id") == 1L)
    assert(d1.map(r => (r.getAs[Int]("rk"), r.getAs[String]("word"),
      r.getAs[Double]("score"))).toSeq ===
      Seq((1, "apple", score(2, 1)), (2, "banana", score(1, 2))))
    val d2 = out.filter(_.getAs[Long]("doc_id") == 2L)
    assert(d2.map(r => (r.getAs[Int]("rk"), r.getAs[String]("word")))
      .toSeq === Seq((1, "cherry"), (2, "banana")))
    // equal scores cut by word ascending in both engines
    val tie = Seq((1L, "y x")).toDF("doc_id", "text")
    val t = Collocations.keywordTfidf(tie, "doc_id", "text", k = 1)
      .collect()
    assert(t.length === 1 && t.head.getAs[String]("word") === "x")
  }

  // ---- Lexical diversity -----------------------------------------------------

  test("lexicalDiversity: hand ratios, Yule K, token-less doc survives") {
    import graft.operators.LanguageModel
    // "a a b": N=3, V=2, hapax=1, Σc²=5 → K = 10⁴·(5−3)/9
    val docs = Seq((1L, "a a b"), (2L, "   ")).toDF("doc_id", "text")
    val out = LanguageModel.lexicalDiversity(docs, "doc_id", "text")
      .collect()
    assert(out.length === 2)
    val r1 = out.find(_.getAs[Long]("doc_id") == 1L).get
    assert(r1.getAs[Long]("n_tokens") === 3L)
    assert(r1.getAs[Long]("n_types") === 2L)
    assert(r1.getAs[Long]("hapax") === 1L)
    assert(r1.getAs[Double]("ttr") === d6(2.0 / 3.0))
    assert(r1.getAs[Double]("hapax_ratio") === d6(1.0 / 3.0))
    assert(r1.getAs[Double]("yule_k") === d6(10000.0 * 2.0 / 9.0))
    // the token-less doc is PRESENT with zero counts and null ratios
    val r2 = out.find(_.getAs[Long]("doc_id") == 2L).get
    assert(r2.getAs[Long]("n_tokens") === 0L)
    assert(r2.isNullAt(r2.fieldIndex("ttr")))
    assert(r2.isNullAt(r2.fieldIndex("yule_k")))
  }

  // ---- Source JSD ------------------------------------------------------------

  test("jsSourceDivergence: single source is 0; two-source hand replay") {
    import graft.operators.Drift
    // one source ⇒ p = q everywhere, absent mass 0 ⇒ JSD = 0 exactly
    val one = Seq(("s1", "a a b"), ("s1", "c")).toDF("source", "text")
    val r0 = Drift.jsSourceDivergence(one, col("source"), col("text"))
      .head
    assert(r0.getAs[Double]("jsd_bits") === 0.0)
    assert(r0.getAs[Long]("n_types") === 3L &&
      r0.getAs[Long]("n_tokens") === 4L)
    // disjoint vocab: s1 = {a}, s2 = {b} ⇒ per-source replay of the
    // quantized present-term + closed-form absent-tail convention
    val two = Seq(("s1", "a"), ("s2", "b")).toDF("source", "text")
    val out = Drift.jsSourceDivergence(two, col("source"), col("text"))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val LN2 = 0.6931471805599453
    def nano(p: Double, q: Double): Long = {
      val m = (p + q) / 2.0
      BigDecimal((p * math.log(p / m) + q * math.log(q / m)) * 0.5
        / LN2 * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    // each source: present word p=1, q=1/2; absent tail 0.5·(2−1)/2
    val want = d6(nano(1.0, 0.5) / 1e9 + 0.5 * 1.0 / 2.0)
    assert(out("s1").getAs[Double]("jsd_bits") === want)
    assert(out("s2").getAs[Double]("jsd_bits") === want)
  }

  // ---- McNemar --------------------------------------------------------------

  test("mcnemar: discordant cells drive the statistic; b+c=0 nulls") {
    val df = Seq((true, true), (true, false), (true, false),
      (false, true), (false, false)).toDF("a", "b")
    val r = AbStats.mcnemar(df, col("a"), col("b")).head
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Long]("n_both") === 1L)
    assert(r.getAs[Long]("n_before_only") === 2L)
    assert(r.getAs[Long]("n_after_only") === 1L)
    assert(r.getAs[Long]("n_neither") === 1L)
    assert(r.getAs[Double]("chi2") === d6(1.0 / 3.0))
    assert(r.getAs[Double]("chi2_cc") === 0.0)
    // concordant-only input: no information, null chi-squares
    val conc = Seq((true, true), (false, false)).toDF("a", "b")
    val rc = AbStats.mcnemar(conc, col("a"), col("b")).head
    assert(rc.isNullAt(rc.fieldIndex("chi2")))
  }

  // ---- Cochran's Q ----------------------------------------------------------

  test("cochranQ: textbook 4-block replay; constant blocks null out") {
    val df = Seq((true, true, false), (true, false, false),
      (true, true, true), (false, true, false)).toDF("f0", "f1", "f2")
    val r = AbStats.cochranQ(df,
      Seq(col("f0"), col("f1"), col("f2"))).head
    // C = (3,3,1), T = 7, ΣR² = 15 → Q = 2·(3·19 − 49)/(21 − 15) = 8/3
    assert(r.getAs[Long]("n_blocks") === 4L)
    assert(r.getAs[Long]("c_0") === 3L && r.getAs[Long]("c_1") === 3L &&
      r.getAs[Long]("c_2") === 1L)
    assert(r.getAs[Double]("q_stat") === d6(8.0 / 3.0))
    assert(r.getAs[Long]("dof") === 2L)
    // all-k and all-0 blocks only: zero denominator → null
    val const = Seq((true, true, true), (false, false, false))
      .toDF("f0", "f1", "f2")
    val rc = AbStats.cochranQ(const,
      Seq(col("f0"), col("f1"), col("f2"))).head
    assert(rc.isNullAt(rc.fieldIndex("q_stat")))
  }

  // ---- Friedman -------------------------------------------------------------

  test("friedman: monotone blocks give Q=6; all-tied block kills C") {
    // three blocks all ranked (1,2,3): R2 = (6,12,18) summed = (6·3? no:
    // per block r2 = (2,4,6)) → column sums (6,12,18), Q = 6, no ties
    val df = Seq((1L, 2L, 3L), (10L, 20L, 30L), (5L, 6L, 7L))
      .toDF("v0", "v1", "v2")
    val r = AbStats.friedman(df, Seq(col("v0"), col("v1"), col("v2"))).head
    assert(r.getAs[Long]("n_blocks") === 3L)
    assert(r.getAs[Double]("rank_sum_0") === 3.0)
    assert(r.getAs[Double]("rank_sum_1") === 6.0)
    assert(r.getAs[Double]("rank_sum_2") === 9.0)
    assert(r.getAs[Double]("q_stat") === 6.0)
    assert(r.getAs[Double]("q_adj") === 6.0)
    // single all-tied block: ranks average to 2 each, tie census 24,
    // correction hits exactly 0 → null Q'
    val tied = Seq((5L, 5L, 5L)).toDF("v0", "v1", "v2")
    val rt = AbStats.friedman(tied,
      Seq(col("v0"), col("v1"), col("v2"))).head
    assert(rt.getAs[Double]("rank_sum_0") === 2.0)
    assert(rt.getAs[Double]("q_stat") === 0.0)
    assert(rt.isNullAt(rt.fieldIndex("q_adj")))
    // pair tie: (1,1,2) → ranks (1.5, 1.5, 3), census 6
    val pair = Seq((1L, 1L, 2L)).toDF("v0", "v1", "v2")
    val rp = AbStats.friedman(pair,
      Seq(col("v0"), col("v1"), col("v2"))).head
    assert(rp.getAs[Double]("rank_sum_0") === 1.5)
    assert(rp.getAs[Double]("rank_sum_2") === 3.0)
    // C = 1 − 6/24 = 3/4; Q = 3·(9+9+36)/12 − 12 = 1.5 → Q' = 2
    assert(rp.getAs[Double]("q_adj") === 2.0)
  }

  // ---- Cramér's V ------------------------------------------------------------

  test("cramersV: perfect association = 1, independence = 0, absent cells count") {
    // 2×2 perfect: chi2 = N = 4, V = 1 — the off-diagonal cells are
    // ABSENT from the census and must still contribute (0−e)²/e = e
    val perfect = Seq(("a", "1"), ("a", "1"), ("b", "2"), ("b", "2"))
      .toDF("x", "y")
    val rp = AbStats.cramersV(perfect, col("x"), col("y")).head
    assert(rp.getAs[Long]("n") === 4L && rp.getAs[Long]("r") === 2L &&
      rp.getAs[Long]("c") === 2L && rp.getAs[Long]("n_cells") === 2L)
    assert(rp.getAs[Double]("chi2") === 4.0)
    assert(rp.getAs[Long]("dof") === 1L)
    assert(rp.getAs[Double]("cramers_v") === 1.0)
    // exact independence: all four cells present at equal counts
    val ind = Seq(("a", "1"), ("a", "2"), ("b", "1"), ("b", "2"))
      .toDF("x", "y")
    val ri = AbStats.cramersV(ind, col("x"), col("y")).head
    assert(ri.getAs[Double]("chi2") === 0.0)
    assert(ri.getAs[Double]("cramers_v") === 0.0)
    // one-level margin: V undefined
    val flat = Seq(("a", "1"), ("a", "2")).toDF("x", "y")
    val rf = AbStats.cramersV(flat, col("x"), col("y")).head
    assert(rf.isNullAt(rf.fieldIndex("cramers_v")))
  }

  // ---- Ljung-Box -------------------------------------------------------------

  test("ljungBox: replay off the published acf; alternating series") {
    import graft.operators.Changepoint
    import java.sql.Date
    // alternating ±1 around mean on 8 consecutive days
    val days = (0 until 8).map(i =>
      (Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        if (i % 2 == 0) 10L else 20L))
    val df = days.toDF("day", "v")
    val a = Changepoint.acf(df, col("day"), col("v"), maxLag = 3)
      .collect().map(r => r.getAs[Int]("lag") ->
        (if (r.isNullAt(r.fieldIndex("acf"))) None
         else Some(r.getAs[Double]("acf")))).toMap
    val r = Changepoint.ljungBox(df, col("day"), col("v"), maxLag = 3)
      .head
    assert(r.getAs[Long]("n") === 8L && r.getAs[Long]("m") === 3L)
    val want = d6(8.0 * 10.0 * (0 until 3).map { i =>
      val rho = a(i + 1).get; rho * rho / (8.0 - (i + 1)) }.sum)
    assert(r.getAs[Double]("q_stat") === want)
    assert(r.getAs[Long]("dof") === 3L)
  }

  // ---- Hurst -----------------------------------------------------------------

  test("hurst: block ledger on a hand series; short series nulls H") {
    import graft.operators.Changepoint
    // 64 points: enough for 8 blocks of 8, 4 of 16, 2 of 32, 1 of 64
    val vals = (0 until 64).map(i => (i.toLong,
      ((i * 37 + 11) % 100 + 1).toLong))
    val df = vals.toDF("t", "v")
    val r = Changepoint.hurst(df, col("t"), col("v")).head
    assert(r.getAs[Long]("n_obs") === 64L)
    assert(r.getAs[Long]("n_blocks_8") === 8L)
    assert(r.getAs[Long]("n_blocks_16") === 4L)
    assert(r.getAs[Long]("n_blocks_32") === 2L)
    assert(r.getAs[Long]("n_blocks_64") === 1L)
    // replay the first 8-block's R/S by hand
    val b0 = vals.take(8).map(_._2.toDouble)
    val s1 = b0.sum; val s2 = b0.map(x => x * x).sum
    val cums = b0.scanLeft(0.0)(_ + _).tail.zipWithIndex
      .map { case (p, i) => 8.0 * p - (i + 1) * s1 }
    val rScaled = cums.max - cums.min
    val rs0 = rScaled / math.sqrt(8.0 * s2 - s1 * s1)
    // the per-size mean is over nano-quantized block values
    def nano(x: Double): Long = BigDecimal(x * 1e9)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def blockRs(off: Int, w: Int): Double = {
      val b = vals.slice(off, off + w).map(_._2.toDouble)
      val t1 = b.sum; val t2 = b.map(x => x * x).sum
      val cu = b.scanLeft(0.0)(_ + _).tail.zipWithIndex
        .map { case (p, i) => w * p - (i + 1) * t1 }
      (cu.max - cu.min) / math.sqrt(w * t2 - t1 * t1)
    }
    val rs8 = (0 until 8).map(b => nano(blockRs(b * 8, 8))).sum
      .toDouble / 8.0 / 1e9
    assert(r.getAs[Double]("rs_8") === d6(rs8))
    assert(math.abs(rs0 - blockRs(0, 8)) < 1e-12)
    // H must exist and land in (0, 1) for a bounded arithmetic series
    val h = r.getAs[Double]("hurst")
    assert(h > 0.0 && h < 1.0)
    // 31 points: no 32/64 blocks → H null, 8-ladder legs still report
    val short = vals.take(31).toDF("t", "v")
    val rs = Changepoint.hurst(short, col("t"), col("v")).head
    assert(rs.getAs[Long]("n_blocks_32") === 0L)
    assert(rs.isNullAt(rs.fieldIndex("hurst")))
  }

  // ---- Fellegi-Sunter ---------------------------------------------------------

  test("fellegiSunter: frequency-based u weights, rare agreement outranks common") {
    import graft.operators.FellegiSunter
    // f: (x,x,y,z) → u_f = 6/16; g: (a,a,a,b) → u_g = 10/16
    val ents = Seq((1L, "x", "a"), (2L, "x", "a"), (3L, "y", "a"),
      (4L, "z", "b")).toDF("id", "f", "g")
    val out = FellegiSunter.score(ents, "id", lit(0),
      Seq(("f", col("f"), 0.95), ("g", col("g"), 0.9)), k = 10)
      .collect()
    assert(out.length === 6) // all pairs in the single block
    val uF = 6.0 / 16.0; val uG = 10.0 / 16.0
    def w(agree: Boolean, m: Double, u: Double): Double =
      if (agree) math.log(m / u) else math.log((1.0 - m) / (1.0 - u))
    // top pair must be (1,2): both fields agree
    val top = out.head
    assert(top.getAs[Long]("id_a") === 1L && top.getAs[Long]("id_b") === 2L)
    assert(top.getAs[Boolean]("agree_f") && top.getAs[Boolean]("agree_g"))
    assert(top.getAs[Double]("score") ===
      d6(w(agree = true, 0.95, uF) + w(agree = true, 0.9, uG)))
    // a disagreeing-everywhere pair carries both penalty weights
    val worst = out.last
    assert(!worst.getAs[Boolean]("agree_f") &&
      !worst.getAs[Boolean]("agree_g"))
    assert(worst.getAs[Double]("score") ===
      d6(w(agree = false, 0.95, uF) + w(agree = false, 0.9, uG)))
    // nulls agree null-safely
    val withNull = Seq((1L, Some("x")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("id", "f")
    val on = FellegiSunter.score(withNull, "id", lit(0),
      Seq(("f", col("f"), 0.95)), k = 10).collect()
    val p23 = on.find(r => r.getAs[Long]("id_a") == 2L &&
      r.getAs[Long]("id_b") == 3L).get
    assert(p23.getAs[Boolean]("agree_f"), "null must agree with null")
  }

  // ---- self-BLEU --------------------------------------------------------------

  test("selfBleu: hand pair ledger, identical docs = 1, cross-lang pairs drop") {
    import graft.operators.Bleu
    val docs = Seq(
      (0L, "en", "a b c d"), (1L, "en", "a b x y"), // bleu = √(1/6)
      (2L, "en", "q"), (3L, "en", "q"),             // lh < 2 → 0
      (4L, "en", "m n"), (5L, "fr", "m n"),         // lang mismatch
      (6L, "fr", "u v w"), (7L, "fr", "u v w"))     // identical → 1
      .toDF("doc_id", "lang", "text")
    val out = Bleu.selfBleu(docs, "doc_id", "lang", "text")
      .collect().map(r => r.getAs[String]("lang") -> r).toMap
    def nano(x: Double): Long = BigDecimal(x * 1e9)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    // en: pair(0,1) c1=2 c2=1 → 1·√((2/4)·(1/3)); pair(2,3) scores 0
    val b01 = math.sqrt((2.0 / 4.0) * (1.0 / 3.0))
    assert(out("en").getAs[Long]("n_pairs") === 2L)
    assert(out("en").getAs[Double]("self_bleu2") ===
      d6(nano(b01).toDouble / 2.0 / 1e9))
    // fr: only the identical pair (6,7) — doc 5 has no even partner
    assert(out("fr").getAs[Long]("n_pairs") === 1L)
    assert(out("fr").getAs[Double]("self_bleu2") === 1.0)
  }

  // ---- Granger lag-1 ----------------------------------------------------------

  test("grangerLag1: closed-form OLS replay; constant lag nulls") {
    import graft.operators.Changepoint
    import java.sql.Date
    val xs = Seq(10L, 20L, 15L, 30L, 25L, 40L)
    val ys = Seq(1L, 4L, 2L, 6L, 3L, 5L)
    val df = xs.indices.map(i =>
      (Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        xs(i), ys(i))).toDF("day", "x", "y")
    val r = Changepoint.grangerLag1(df, col("day"), col("x"), col("y"))
      .head
    // Scala replay of the identical IEEE tree over the 5 lag rows
    val rows = (1 until 6).map(t => (xs(t).toDouble,
      xs(t - 1).toDouble, ys(t - 1).toDouble))
    val n = rows.length.toDouble
    val sx = rows.map(_._1).sum; val sxx = rows.map(r => r._1 * r._1).sum
    val sl = rows.map(_._2).sum; val sll = rows.map(r => r._2 * r._2).sum
    val sy = rows.map(_._3).sum; val syy = rows.map(r => r._3 * r._3).sum
    val sxl = rows.map(r => r._1 * r._2).sum
    val sxy = rows.map(r => r._1 * r._3).sum
    val sly = rows.map(r => r._2 * r._3).sum
    val cxx = sxx - sx * sx / n; val cll = sll - sl * sl / n
    val cyy = syy - sy * sy / n; val cxl = sxl - sx * sl / n
    val cxy = sxy - sx * sy / n; val cly = sly - sl * sy / n
    val det = cll * cyy - cly * cly
    val rssR = cxx - cxl * cxl / cll
    val b1 = (cxl * cyy - cxy * cly) / det
    val b2 = (cxy * cll - cxl * cly) / det
    val rssU = cxx - (b1 * cxl + b2 * cxy)
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Double]("beta_ylag") === d6(b2))
    assert(r.getAs[Double]("f_stat") ===
      d6((rssR - rssU) / (rssU / (n - 3.0))))
    assert(r.getAs[Long]("df2") === 2L)
    // constant lagged x: singular restricted fit → null F
    val const = (0 until 5).map(i =>
      (Date.valueOf(java.time.LocalDate.of(2024, 2, 1).plusDays(i)),
        7L, i.toLong)).toDF("day", "x", "y")
    val rc = Changepoint.grangerLag1(const, col("day"), col("x"),
      col("y")).head
    assert(rc.isNullAt(rc.fieldIndex("f_stat")))
  }

  // ---- JL projection ----------------------------------------------------------

  test("jl distortion audit: hand sign-matrix replay, zero-distance pair drops") {
    import graft.operators.RandomProjection
    def unit(at: Int): Seq[Float] =
      Seq.tabulate(64)(i => if (i == at) 1.0f else 0.0f)
    // pair 0: e0 vs e1 (orig dist² = 2); pair 1: identical vectors
    val vecs = Seq((0L, unit(0)), (1L, unit(1)),
      (2L, unit(5)), (3L, unit(5))).toDF("vec_id", "embedding")
    val r = RandomProjection.distortionAudit(vecs, "vec_id", "embedding",
      d = 64, k = 16).head
    assert(r.getAs[Long]("n_pairs") === 2L)
    assert(r.getAs[Long]("n_zero") === 1L)
    // replay: proj of a unit vector e_i is s_ij/4 per component
    def sgn(i: Int, j: Int): Double =
      if ((i + 1).toLong * (j + 3) * 2654435761L % 1000003L % 2L == 0L)
        1.0 else -1.0
    val dp = (0 until 16).map { j =>
      val d0 = sgn(0, j) / 4.0 - sgn(1, j) / 4.0; d0 * d0
    }.foldLeft(0.0)(_ + _)
    val ratio = dp / 2.0
    def nano(x: Double): Long = BigDecimal(x * 1e9)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(r.getAs[Double]("mean_ratio") ===
      d6(nano(ratio).toDouble / 1.0 / 1e9))
    assert(r.getAs[Double]("min_ratio") === r.getAs[Double]("max_ratio"))
  }

  // ---- Nelson-Aalen ----------------------------------------------------------

  test("nelsonAalen: additive hazard ledger, censoring leaves risk set only") {
    import graft.operators.Survival
    // deaths at t=1 (×2) and t=3, censor at t=2: H(1)=2/4, H(3)=0.5+1
    val subj = Seq((1L, false), (1L, false), (2L, true), (3L, false))
      .toDF("t", "cens")
    val out = Survival.nelsonAalen(subj, col("t"), col("cens"))
      .collect().map(r => r.getAs[Long]("t") -> r).toMap
    assert(out.keySet === Set(1L, 3L))
    assert(out(1L).getAs[Long]("n_risk") === 4L)
    assert(out(1L).getAs[Double]("cum_hazard") === 0.5)
    assert(out(3L).getAs[Long]("n_risk") === 1L)
    assert(out(3L).getAs[Double]("cum_hazard") === 1.5)
  }

  // ---- log-rank --------------------------------------------------------------

  test("logRank: identical arms give chi2 = 0; separated arms replay to 3") {
    import graft.operators.Survival
    val same = Seq((1L, false, 0), (2L, false, 0), (1L, false, 1),
      (2L, false, 1)).toDF("t", "cens", "arm")
    val r0 = Survival.logRank(same, col("t"), col("cens"), col("arm"))
      .head
    assert(r0.getAs[Double]("o_minus_e") === 0.0)
    assert(r0.getAs[Double]("chi2") === 0.0)
    // arm1 both die at t=1, arm0 both at t=3:
    // t1: O−E = 2 − 2·(2/4) = 1, V = 2·½·½·(2/3) = 1/3
    // t3: arm1 extinct → O−E = 0, V = 0  ⇒ chi2 = 1²/(1/3) = 3
    val split = Seq((1L, false, 1), (1L, false, 1), (3L, false, 0),
      (3L, false, 0)).toDF("t", "cens", "arm")
    val r1 = Survival.logRank(split, col("t"), col("cens"), col("arm"))
      .head
    assert(r1.getAs[Long]("n_total") === 4L &&
      r1.getAs[Long]("n_arm1") === 2L)
    assert(r1.getAs[Long]("events_arm1") === 2L)
    assert(r1.getAs[Double]("o_minus_e") === 1.0)
    assert(r1.getAs[Double]("chi2") === 3.0)
  }

  // ---- Mood's median ---------------------------------------------------------

  test("moodMedian: lower-median convention, hand 2x3 table, one-sided null") {
    // arms (1,2) (3,4) (5,6): pooled lower median = 3; above = (0,1,2)
    // ⇒ e_above = 1 per arm ⇒ chi2 = 2 + 0 + 2 = 4
    val df = Seq((0, 1L), (0, 2L), (1, 3L), (1, 4L), (2, 5L), (2, 6L))
      .toDF("arm", "cents")
    val r = AbStats.moodMedian(df, col("arm"), col("cents")).head
    assert(r.getAs[Long]("median") === 3L)
    assert(r.getAs[Long]("a_0") === 0L && r.getAs[Long]("a_1") === 1L &&
      r.getAs[Long]("a_2") === 2L)
    assert(r.getAs[Double]("chi2") === 4.0)
    assert(r.getAs[Long]("dof") === 2L)
    // everything tied: nothing above the median → null chi2
    val flat = Seq((0, 5L), (1, 5L), (2, 5L)).toDF("arm", "cents")
    val rf = AbStats.moodMedian(flat, col("arm"), col("cents")).head
    assert(rf.isNullAt(rf.fieldIndex("chi2")))
  }

  // ---- Word burstiness -------------------------------------------------------

  test("wordBurstiness: Fano ledger with zeros included, empty doc counts") {
    import graft.operators.LanguageModel
    // N = 4 docs (one token-less): x once at count 3 → VMR = 3;
    // y spread 1+1+1 → VMR = 1/3 — bursty x must rank first
    val docs = Seq((1L, "x x x"), (2L, "y"), (3L, "y"), (4L, "y   "),
      (5L, "   ")).toDF("doc_id", "text")
    val out = LanguageModel.wordBurstiness(docs, "doc_id", "text",
      minFreq = 1L, k = 10).collect()
    assert(out.map(_.getAs[String]("word")).toSeq === Seq("x", "y"))
    val n = 5.0
    def vmr(tt: Double, s: Double): Double =
      (s - tt * tt / n) / (n - 1.0) / (tt / n)
    assert(out(0).getAs[Double]("burstiness") === d6(vmr(3.0, 9.0)))
    assert(out(0).getAs[Long]("doc_freq") === 1L)
    assert(out(1).getAs[Double]("burstiness") === d6(vmr(3.0, 3.0)))
  }

  // ---- Page trend -------------------------------------------------------------

  test("pageTrend: two monotone blocks give z = 2 exactly; reverse negates") {
    // blocks (1,2,3): ranks (1,2,3) → L = 14N, E = 12N, Var = 2N
    // ⇒ z = 2N/√(2N) = √(2N) = 2 at N = 2
    val up = Seq((1L, 2L, 3L), (10L, 20L, 30L)).toDF("v0", "v1", "v2")
    val r = AbStats.pageTrend(up, Seq(col("v0"), col("v1"), col("v2")))
      .head
    assert(r.getAs[Long]("n_blocks") === 2L)
    assert(r.getAs[Double]("l_stat") === 28.0)
    assert(r.getAs[Double]("z_stat") === 2.0)
    val down = Seq((3L, 2L, 1L), (30L, 20L, 10L)).toDF("v0", "v1", "v2")
    val rd = AbStats.pageTrend(down,
      Seq(col("v0"), col("v1"), col("v2"))).head
    assert(rd.getAs[Double]("z_stat") === -2.0)
  }

  // ---- Power / MDE -------------------------------------------------------------

  test("powerMde: pooled-variance hand replay; flat arms null out") {
    // arm0 = (1,2,3), arm1 = (4,5,7): pooled s² = (2 + 14/3)/4
    val df = Seq((0, 1L), (0, 2L), (0, 3L), (1, 4L), (1, 5L), (1, 7L))
      .toDF("arm", "cents")
    val r = AbStats.powerMde(df, col("arm"), col("cents")).head
    val pooled = ((14.0 - 6.0 * 6.0 / 3.0)
      + (90.0 - 16.0 * 16.0 / 3.0)) / 4.0
    val se = math.sqrt(pooled * (1.0 / 3.0 + 1.0 / 3.0))
    val zA = 1.959963984540054
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Double]("mean_a") === 2.0)
    assert(r.getAs[Double]("pooled_sd") === d6(math.sqrt(pooled)))
    assert(r.getAs[Double]("mde_abs_80") ===
      d6((zA + 0.8416212335729143) * se))
    assert(r.getAs[Double]("mde_rel_80") ===
      d6((zA + 0.8416212335729143) * se / 2.0))
    val flat = Seq((0, 5L), (0, 5L), (1, 5L), (1, 5L)).toDF("arm", "cents")
    val rf = AbStats.powerMde(flat, col("arm"), col("cents")).head
    assert(rf.isNullAt(rf.fieldIndex("mde_abs_80")))
  }

  // ---- RAKE ---------------------------------------------------------------------

  test("rakeKeywords: deg/freq ledger, shared word dilutes, stopword runs split") {
    import graft.operators.Collocations
    // "the big dog and red dog" → phrases {big dog, red dog};
    // + "dog" alone: ws(dog) = 5/3, ws(big) = ws(red) = 2
    val docs = Seq((1L, "the big dog and red dog"), (2L, "dog"))
      .toDF("doc_id", "text")
    val out = Collocations.rakeKeywords(docs, "doc_id", "text", k = 10)
      .collect()
    assert(out.map(_.getAs[String]("phrase")).toSeq ===
      Seq("big dog", "red dog", "dog"))
    assert(out(0).getAs[Double]("score") === d6(2.0 + 5.0 / 3.0))
    assert(out(2).getAs[Double]("score") === d6(5.0 / 3.0))
    assert(out(0).getAs[Long]("n_words") === 2L)
    assert(out(2).getAs[Long]("n_occurrences") === 1L)
    // duplicate phrase types merge with occurrence count and the
    // TYPE score — NOT occurrence-inflated (deg(red)=deg(dog)=4,
    // freq=2 → ws=2 each → score 4, not 8)
    val dup = Seq((1L, "red dog"), (2L, "red dog")).toDF("doc_id", "text")
    val o2 = Collocations.rakeKeywords(dup, "doc_id", "text", k = 5)
      .collect()
    assert(o2.length === 1)
    assert(o2.head.getAs[Long]("n_occurrences") === 2L)
    assert(o2.head.getAs[Double]("score") === 4.0,
      "phrase-type score must not scale with occurrences")
  }

  // ---- Cochran-Armitage --------------------------------------------------------

  test("cochranArmitage: linear-in-rate hand replay; flat rates near zero") {
    // groups of 10 trials with 1/2/3 successes: T = 14 − 6·20/30 = 2
    // Var = (6/30)(24/30)·(140 − 400/3) = 16/15... replay exactly
    val rows = (0 until 10).flatMap(i => Seq(
      (0, i < 1), (1, i < 2), (2, i < 3)))
    val df = rows.toDF("g", "s")
    val r = AbStats.cochranArmitage(df, col("g"), col("s"), k = 3).head
    assert(r.getAs[Long]("n_0") === 10L && r.getAs[Long]("r_2") === 3L)
    val t = 14.0 - 6.0 * 60.0 / 30.0
    val p = 6.0 / 30.0
    val vr = p * (1.0 - p) * (140.0 - 60.0 * 60.0 / 30.0)
    assert(r.getAs[Double]("z_stat") === d6(t / math.sqrt(vr)))
    assert(r.getAs[Double]("chi2") === d6(t * t / vr))
    // all-success input: no information → null
    val flat = Seq((0, true), (1, true), (2, true)).toDF("g", "s")
    val rf = AbStats.cochranArmitage(flat, col("g"), col("s"), k = 3).head
    assert(rf.isNullAt(rf.fieldIndex("z_stat")))
  }

  // ---- Code-switch audit ---------------------------------------------------------

  test("codeSwitchAudit: spliced doc flags, monolingual and und halves don't") {
    import graft.operators.LanguageModel
    val docs = Seq(
      (1L, "the cat is of the mat le chat et la table des"), // en|fr
      (2L, "the dog is the best of all the dogs in town"),   // en|en
      (3L, "zz qq ww le la et")).toDF("doc_id", "text")      // und|fr
    val out = LanguageModel.codeSwitchAudit(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("lang_head") === "en")
    assert(out(1L).getAs[String]("lang_tail") === "fr")
    assert(out(1L).getAs[Boolean]("switched"))
    assert(!out(2L).getAs[Boolean]("switched"))
    assert(out(3L).getAs[String]("lang_head") === "und")
    assert(!out(3L).getAs[Boolean]("switched"),
      "an undetermined half must not flag")
  }

  // ---- Seasonal Mann-Kendall -----------------------------------------------------

  test("seasonalMannKendall: within-season pairs only; cycle can't fake a trend") {
    import graft.operators.Changepoint
    import java.sql.Date
    def day(i: Int) = Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i))
    // pure 2-cycle (10,99,10,99,...) over 8 days, seasons = i % 2:
    // within each season the series is CONSTANT → S = 0, all tied
    val cyc = (0 until 8).map(i =>
      (day(i), if (i % 2 == 0) 10L else 99L, i % 2)).toDF("d", "v", "g")
    val rc = Changepoint.seasonalMannKendall(cyc, col("d"), col("v"),
      col("g")).head
    assert(rc.getAs[Long]("s_stat") === 0L)
    assert(rc.getAs[Long]("n_seasons") === 2L)
    assert(rc.getAs[String]("trend") === "undefined",
      "all-tied seasons have zero variance")
    // monotone WITHIN each season: s_g = C(4,2) = 6 each → S = 12
    val up = (0 until 8).map(i =>
      (day(i), (10 * (i / 2) + i % 2).toLong, i % 2)).toDF("d", "v", "g")
    val ru = Changepoint.seasonalMannKendall(up, col("d"), col("v"),
      col("g")).head
    assert(ru.getAs[Long]("s_stat") === 12L)
    // var18 = 2 · m(m−1)(2m+5) = 2·4·3·13 = 312
    assert(ru.getAs[Long]("var18") === 312L)
    assert(ru.getAs[Double]("z_stat") ===
      d6(11.0 / math.sqrt(312.0 / 18.0)))
  }

  // ---- PII density -----------------------------------------------------------------

  test("piiDensity: pattern censuses and per-1k rates") {
    import graft.operators.PiiAudit
    val docs = Seq(
      ("s1", "mail me at bob.smith@corp.example thanks"),
      ("s1", "account 12345678 and card 4000001234567899"),
      ("s2", "nothing here")).toDF("source", "text")
    val out = PiiAudit.densityByGroup(docs, col("source"), col("text"))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("s1").getAs[Long]("email_hits") === 1L)
    assert(out("s1").getAs[Long]("digit_run_hits") === 2L)
    assert(out("s2").getAs[Long]("email_hits") === 0L)
    val tok = out("s1").getAs[Long]("n_tokens")
    assert(out("s1").getAs[Double]("emails_per_1k") ===
      d6(1000.0 / tok.toDouble))
  }

  // ---- Post-stratified mean ---------------------------------------------------------

  test("postStratifiedMean: reweights responder means to population shares") {
    // stratum 0: 4 units, responders (10, 20); stratum 1: 2 units,
    // responders (30, 50): raw = 27.5; ps = (4/6)·15 + (2/6)·40
    val df = Seq(
      (0, true, 10L), (0, true, 20L), (0, false, 0L), (0, false, 0L),
      (1, true, 30L), (1, true, 50L)).toDF("st", "resp", "v")
    val r = AbStats.postStratifiedMean(df, col("st"), col("resp"),
      col("v"), strata = 2).head
    assert(r.getAs[Long]("n_population") === 6L)
    assert(r.getAs[Long]("n_responders") === 4L)
    assert(r.getAs[Double]("raw_mean") === 27.5)
    assert(r.getAs[Double]("ps_mean") ===
      d6((4.0 / 6.0) * 15.0 + (2.0 / 6.0) * 40.0))
    // replay the variance-ratio tree
    def s2(ss: Double, s: Double, n: Double) = (ss - s * s / n) / (n - 1.0)
    val psVar = (4.0 / 6.0) * (4.0 / 6.0) * s2(500.0, 30.0, 2.0) / 2.0 +
      (2.0 / 6.0) * (2.0 / 6.0) * s2(3400.0, 80.0, 2.0) / 2.0
    val rawVar = s2(3900.0, 110.0, 4.0) / 4.0
    assert(r.getAs[Double]("var_ratio") === d6(psVar / rawVar))
    // a stratum with one responder nulls the variance report
    val thin = Seq((0, true, 10L), (0, false, 0L), (1, true, 5L))
      .toDF("st", "resp", "v")
    val rt = AbStats.postStratifiedMean(thin, col("st"), col("resp"),
      col("v"), strata = 2).head
    assert(rt.isNullAt(rt.fieldIndex("var_ratio")))
  }

  // ---- Turning points ---------------------------------------------------------------

  test("turningPointTest: zigzag counts all interiors; monotone counts none") {
    import graft.operators.Changepoint
    import java.sql.Date
    def day(i: Int) = Date.valueOf(
      java.time.LocalDate.of(2024, 3, 1).plusDays(i))
    // 1,5,2,6,3: every interior point is a strict turn (T = 3)
    val zig = Seq(1L, 5L, 2L, 6L, 3L).zipWithIndex
      .map { case (v, i) => (day(i), v) }.toDF("d", "v")
    val rz = Changepoint.turningPointTest(zig, col("d"), col("v")).head
    assert(rz.getAs[Long]("n_turns") === 3L &&
      rz.getAs[Long]("n_interior") === 3L)
    val e = 2.0 * (5.0 - 2.0) / 3.0
    val vr = (16.0 * 5.0 - 29.0) / 90.0
    assert(rz.getAs[Double]("z_stat") === d6((3.0 - e) / math.sqrt(vr)))
    // monotone: zero turns; a flat pair is NOT a turn (strictness)
    val mono = Seq(1L, 2L, 2L, 3L).zipWithIndex
      .map { case (v, i) => (day(i), v) }.toDF("d", "v")
    val rm = Changepoint.turningPointTest(mono, col("d"), col("v")).head
    assert(rm.getAs[Long]("n_turns") === 0L)
  }

  test("turningPointTest: a calendar gap fails loudly (null z)") {
    import graft.operators.Changepoint
    import java.sql.Date
    def day(i: Int) = Date.valueOf(
      java.time.LocalDate.of(2024, 3, 1).plusDays(i))
    // days 0,1,2,4,5 — the day-3 gap strips days 2 and 4 of a
    // neighbor, shrinking the interior census (n_interior = 1 <
    // n−2 = 3), so z must publish null instead of the
    // silently-biased value the full-n E/Var would produce
    val gappy = Seq(0, 1, 2, 4, 5).zip(Seq(1L, 5L, 2L, 6L, 3L))
      .map { case (i, v) => (day(i), v) }.toDF("d", "v")
    val rg = Changepoint.turningPointTest(gappy, col("d"), col("v")).head
    assert(rg.getAs[Long]("n") === 5L &&
      rg.getAs[Long]("n_interior") === 1L)
    assert(rg.isNullAt(rg.fieldIndex("z_stat")),
      "gappy series must null z, not bias it")
  }

  // ---- Theil's U --------------------------------------------------------------------

  test("theilU: hand Holt-fold replay; constant series nulls") {
    import graft.operators.Changepoint
    import java.sql.Date
    def day(i: Int) = Date.valueOf(
      java.time.LocalDate.of(2024, 4, 1).plusDays(i))
    val xs = Seq(10.0, 12.0, 11.0, 15.0, 14.0)
    val df = xs.zipWithIndex.map { case (v, i) => (day(i), v.toLong) }
      .toDF("d", "v")
    val r = Changepoint.theilU(df, col("d"), col("v"), 0.3, 0.3).head
    // replay the exact fold
    var l = xs(0); var b = xs(1) - xs(0); var px = xs(0)
    var se = 0.0; var sn = 0.0
    for (x <- xs.drop(1)) {
      val f = l + b
      se += (x - f) * (x - f); sn += (x - px) * (x - px)
      val nl = 0.3 * x + (1.0 - 0.3) * f
      b = 0.3 * (nl - l) + (1.0 - 0.3) * b; l = nl; px = x
    }
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Double]("theil_u") === d6(math.sqrt(se / sn)))
    assert(r.getAs[Double]("sse_naive") === d6(sn))
    // constant series: zero naive mass → null U
    val flat = (0 until 4).map(i => (day(i), 7L)).toDF("d", "v")
    val rf = Changepoint.theilU(flat, col("d"), col("v"), 0.3, 0.3).head
    assert(rf.isNullAt(rf.fieldIndex("theil_u")))
    // EMPTY series: the ANSI element_at guard must let the fold init
    // evaluate and the contract publish null (not INVALID_ARRAY_INDEX)
    val empty = (0 until 4).map(i => (day(i), 7L)).toDF("d", "v")
      .filter(col("v") > 100L)
    val re = Changepoint.theilU(empty, col("d"), col("v"), 0.3, 0.3).head
    assert(re.getAs[Long]("n") === 0L)
    assert(re.isNullAt(re.fieldIndex("theil_u")))
  }

  // ---- Wilcoxon signed-rank + sign test ----------------------------------------------

  test("wilcoxonSignedRank: untied ledger, tie correction, zero drop") {
    // d = [1, -2, 3, 4, 0]: ranks of |d| are 1..4, W+ = 1+3+4 = 8,
    // E = 5, Var = 4·5·9/24 = 7.5 (the zero is DROPPED)
    val df = Seq(1L, -2L, 3L, 4L, 0L).toDF("d")
    val r = AbStats.wilcoxonSignedRank(df, col("d")).head
    assert(r.getAs[Long]("n_nonzero") === 4L)
    assert(r.getAs[Long]("n_pos") === 3L)
    assert(r.getAs[Double]("w_plus") === 8.0)
    assert(r.getAs[Double]("z_stat") === d6(3.0 / math.sqrt(7.5)))
    // tied |d|: [2, -2] → average rank 1.5 each, W+ = 1.5 = E → z = 0
    val tied = Seq(2L, -2L).toDF("d")
    val rt = AbStats.wilcoxonSignedRank(tied, col("d")).head
    assert(rt.getAs[Double]("w_plus") === 1.5)
    assert(rt.getAs[Double]("z_stat") === 0.0)
    // all zeros: nothing moved → null
    val zeros = Seq(0L, 0L).toDF("d")
    val rz = AbStats.wilcoxonSignedRank(zeros, col("d")).head
    assert(rz.isNullAt(rz.fieldIndex("z_stat")))
  }

  test("signTest: direction census; zeros drop; m = 0 nulls") {
    val df = Seq(1L, -2L, 3L, 4L, 0L).toDF("d")
    val r = AbStats.signTest(df, col("d")).head
    assert(r.getAs[Long]("n_nonzero") === 4L)
    assert(r.getAs[Long]("n_pos") === 3L)
    assert(r.getAs[Double]("z_stat") === 1.0) // (6−4)/√4
    val rz = AbStats.signTest(Seq(0L).toDF("d"), col("d")).head
    assert(rz.isNullAt(rz.fieldIndex("z_stat")))
  }

  // ---- CMH -------------------------------------------------------------------------

  test("cmhTest: textbook stratified replay; Simpson-style mix controlled") {
    // stratum 0: arm1 4/8 vs arm0 2/8; stratum 1: arm1 3/4 vs arm0 1/4
    def rows(st: Int, arm: Int, succ: Int, fail: Int) =
      Seq.fill(succ)((st, arm, true)) ++ Seq.fill(fail)((st, arm, false))
    val df = (rows(0, 1, 4, 4) ++ rows(0, 0, 2, 6) ++
      rows(1, 1, 3, 1) ++ rows(1, 0, 1, 3)).toDF("st", "arm", "s")
    val r = AbStats.cmhTest(df, col("st"), col("arm"), col("s"),
      strata = 2).head
    // per stratum: E0 = 8·6/16 = 3, V0 = 8·8·6·10/(16²·15) = 1
    // E1 = 4·4/8 = 2, V1 = 4·4·4·4/(8²·7) = 4/7
    val e = 3.0 + 2.0
    val v = 8.0 * 8.0 * 6.0 * 10.0 / (16.0 * 16.0 * 15.0) +
      4.0 * 4.0 * 4.0 * 4.0 / (8.0 * 8.0 * 7.0)
    val dev = 7.0 - e
    assert(r.getAs[Long]("sum_a") === 7L)
    assert(r.getAs[Double]("cmh_chi2") === d6(dev * dev / v))
    // OR_MH = (4·6/16 + 3·3/8)/(4·2/16 + 1·1/8)
    assert(r.getAs[Double]("or_mh") ===
      d6((4.0 * 6.0 / 16.0 + 3.0 * 3.0 / 8.0)
        / (4.0 * 2.0 / 16.0 + 1.0 * 1.0 / 8.0)))
    // single-subject strata contribute no variance; all-degenerate null
    val tiny = Seq((0, 1, true), (1, 0, false)).toDF("st", "arm", "s")
    val rt = AbStats.cmhTest(tiny, col("st"), col("arm"), col("s"),
      strata = 2).head
    assert(rt.isNullAt(rt.fieldIndex("cmh_chi2")))
  }

  // ---- k-sample Anderson-Darling ----------------------------------------------------

  test("andersonDarlingK: midrank hand ledger gives 1.25; single value nulls") {
    // arm0 = [1,2], arm1 = [2,3]: per-value terms (1/3, 1, 1/3) per
    // arm → S_a = 5/3, A² = (3/4)·(5/6 + 5/6) = 1.25
    val df = Seq((0, 1L), (0, 2L), (1, 2L), (1, 3L)).toDF("arm", "cents")
    val r = AbStats.andersonDarlingK(df, col("arm"), col("cents"),
      arms = 2).head
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("n_distinct") === 3L)
    assert(r.getAs[Double]("a2_stat") === 1.25)
    assert(r.getAs[Long]("dof") === 1L)
    // identical arms over a shared support: small but nonzero A²
    // (the statistic is a discrepancy, zero only in degenerate cases)
    val one = Seq((0, 5L), (1, 5L)).toDF("arm", "cents")
    val ro = AbStats.andersonDarlingK(one, col("arm"), col("cents"),
      arms = 2).head
    assert(ro.isNullAt(ro.fieldIndex("a2_stat")),
      "a single distinct value must null, not divide by zero")
  }

  // ---- Hill tail index -------------------------------------------------------------

  test("hillTailIndex: Pareto ladder replay; short corpus nulls") {
    import graft.operators.Concentration
    // sizes x_r = floor(1000/r) for r = 1..200: a discrete Pareto
    // with alpha near 1; replay the exact k=10 ladder by hand
    val sizes = (1 to 200).map(r => (r.toLong, (1000 / r).toLong))
    val df = sizes.toDF("id", "n")
    val r = Concentration.hillTailIndex(df, col("n"), k = 10).head
    val sorted = sizes.map(_._2).sorted(Ordering[Long].reverse)
    val xk1 = sorted(10).toDouble
    val s = sorted.take(10)
      .foldLeft(0.0)((acc, x) => acc + math.log(x.toDouble / xk1))
    assert(r.getAs[Long]("n_pos") === 200L)
    assert(r.getAs[Long]("x_kplus1") === sorted(10))
    assert(r.getAs[Double]("alpha") === d6(10.0 / s))
    assert(r.getAs[Boolean]("infinite_variance") === (d6(10.0 / s) < 2.0))
    // not enough positive sizes: null alpha
    val tiny = (1 to 5).map(i => (i.toLong, i.toLong)).toDF("id", "n")
    val rt = Concentration.hillTailIndex(tiny, col("n"), k = 10).head
    assert(rt.isNullAt(rt.fieldIndex("alpha")))
  }
}
