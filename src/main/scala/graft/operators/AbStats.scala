package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Num

/** A/B experiment statistics over an event stream (SURVEY §2 C66-C69)
  * — the decision layer a metrics warehouse exists to feed. Every
  * statistic here is computed from a CONSTANT number of exact
  * sufficient aggregates (counts and decimal sums), so the whole
  * family is one or two partial-aggregated scans with aggregate-sized
  * shuffles, and the published numbers are deterministic under any
  * partitioning: doubles appear only in the final scalar arithmetic
  * over already-exact aggregates (one IEEE evaluation per statistic,
  * bit-identical in any engine), mirroring the reference's
  * dashboard-stats discipline (fpl-data-pipeline sql_queries.py's
  * aggregate-then-ratio shapes) at testable precision.
  *
  * Determinism rules (graft.functions.Num): sums in DECIMAL
  * (associative ⇒ partition-order-free), division/sqrt in double
  * AFTER the exact aggregate; the only multi-term double sum in the
  * family (the chi-square cell fold) runs over a sorted collected
  * list, ≤ |rows|·|cols| cells by construction.
  */
object AbStats {

  private def dec0(c: Column): Column = c.cast(DecimalType(38, 0))

  /** Welch's unequal-variance t-test (Welch 1947) comparing `value`
    * between `arm` = 0 and `arm` = 1. ONE scan, ONE output row:
    * (n_a, n_b, mean_a, mean_b, t_stat, df) — conditional aggregation
    * legs instead of a groupBy, so there is no data shuffle at all,
    * only the scalar partial-agg merge.
    *
    * Sample variance comes off exact decimals: n, Σv (decimal(18,2)
    * sums), Σv² (decimal(37,4) sums of dec2·dec2 products), then
    * s² = (Σv² − (Σv)²/n)/(n−1) in double — each Σ is exact, so the
    * statistic is one deterministic scalar evaluation.
    * Welch–Satterthwaite df published alongside t (the test is
    * meaningless without it). Degenerate guard: arms with n < 2 or
    * zero pooled variance yield null t/df rather than ±Inf.
    */
  def welchTTest(df: DataFrame, arm: Column, value: Column): DataFrame =
    welchFinish(welchSufficient(df, arm, value))

  /** The one-row ADDITIVE sufficient-statistics frame behind
    * [[welchTTest]]: counts and DECIMAL sums (exact, associative), so
    * rows over any partition of the data — micro-batches included —
    * merge via [[welchMerge]] to exactly the union's statistics. The
    * E24 streaming monitor appends one such row per batch.
    */
  def welchSufficient(df: DataFrame, arm: Column, value: Column): DataFrame = {
    val a = arm === 0
    val b = arm === 1
    val v2 = Num.dec2(value)
    df.agg(
      sum(when(a, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when(b, 1L).otherwise(0L)).cast("long").as("n_b"),
      sum(when(a, v2)).as("sa"),
      sum(when(b, v2)).as("sb"),
      sum(when(a, v2 * v2)).as("ssa"),
      sum(when(b, v2 * v2)).as("ssb"))
  }

  /** Merge sufficient-statistic rows (decimal sums — exact). */
  def welchMerge(rows: DataFrame): DataFrame =
    rows.agg(
      sum(col("n_a")).cast("long").as("n_a"),
      sum(col("n_b")).cast("long").as("n_b"),
      sum(col("sa")).as("sa"), sum(col("sb")).as("sb"),
      sum(col("ssa")).as("ssa"), sum(col("ssb")).as("ssb"))

  /** The scalar finisher — shared verbatim by the batch key and the
    * E24 stream read face, so the two cannot drift: every statistic
    * is one IEEE evaluation over the exact merged aggregates.
    */
  def welchFinish(sufficient: DataFrame): DataFrame = {
    val agg = sufficient.select(
      col("n_a"), col("n_b"),
      col("sa").cast("double").as("sa"), col("sb").cast("double").as("sb"),
      col("ssa").cast("double").as("ssa"),
      col("ssb").cast("double").as("ssb"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    // ANSI throws on double/0 even in a projection the guards would
    // mask, so the variance legs (denominator n−1) carry their own
    // n ≥ 2 guard and degenerate arms flow through as null
    val va = when(col("n_a") >= 2,
      (col("ssa") - col("sa") * col("sa") / na) / (na - 1.0))
    val vb = when(col("n_b") >= 2,
      (col("ssb") - col("sb") * col("sb") / nb) / (nb - 1.0))
    agg
      .withColumn("mean_a", when(col("n_a") > 0, round(col("sa") / na, 6)))
      .withColumn("mean_b", when(col("n_b") > 0, round(col("sb") / nb, 6)))
      .withColumn("__se2", va / na + vb / nb)
      .withColumn("t_stat",
        when(col("n_a") >= 2 && col("n_b") >= 2 && col("__se2") > 0.0,
          round((col("sa") / na - col("sb") / nb) / sqrt(col("__se2")), 6)))
      .withColumn("df",
        when(col("n_a") >= 2 && col("n_b") >= 2 && col("__se2") > 0.0,
          round(col("__se2") * col("__se2") /
            (pow(va / na, 2) / (na - 1.0) + pow(vb / nb, 2) / (nb - 1.0)), 6)))
      .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        col("t_stat"), col("df"))
  }

  /** Pearson chi-square test of independence between two categorical
    * keys. Phase 1 is ONE partial-agg'd count shuffle of the
    * CONTINGENCY cardinality (|rows|·|cols| cells — aggregate-sized);
    * margins re-aggregate that tiny frame and broadcast back. Each
    * cell's term (o·N − r·c)²/(N·r·c) is one IEEE evaluation over
    * exact integer margins; the cross-cell sum folds a SORTED
    * collected list ((rk, ck) order) so the double addition order is
    * pinned — deterministic and engine-replayable, never a
    * partition-order sum.
    *
    * Output: one row (n, dof, chi2). Structural-zero margins cannot
    * occur (a row/col with zero total has no cells).
    */
  def chiSquareIndependence(df: DataFrame, rowKey: Column,
                            colKey: Column): DataFrame = {
    // the cells frame is reused by margins/total/terms — cut lineage
    // so the corpus scan runs ONCE, not once per consumer
    val cells = Materialize.cut(
      df.groupBy(rowKey.as("rk"), colKey.as("ck"))
        .agg(count(lit(1)).as("o")))
    val rt = cells.groupBy(col("rk")).agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy(col("ck")).agg(sum(col("o")).as("ct"))
    val n = cells.agg(sum(col("o")).cast("long").as("n"),
      countDistinct(col("rk")).as("nr"), countDistinct(col("ck")).as("nc"))
    val termed = cells
      .join(broadcast(rt), Seq("rk")).join(broadcast(ct), Seq("ck"))
      .crossJoin(broadcast(n))
      .withColumn("__t", {
        val oD = col("o").cast("double"); val nD = col("n").cast("double")
        val rD = col("rt").cast("double"); val cD = col("ct").cast("double")
        pow(oD * nD - rD * cD, 2) / (nD * rD * cD)
      })
    termed
      .agg(max(col("n")).as("n"),
        ((max(col("nr")) - 1) * (max(col("nc")) - 1)).cast("long").as("dof"),
        sort_array(collect_list(struct(col("rk"), col("ck"), col("__t"))))
          .as("__cells"))
      .select(col("n"), col("dof"),
        round(aggregate(col("__cells"), lit(0.0),
          (acc, x) => acc + x.getField("__t")), 6).as("chi2"))
  }

  /** Mann–Whitney U (Mann & Whitney 1947) with normal approximation
    * and tie correction — the rank-sum test for arbitrary (non-normal)
    * metric distributions. The classic single-node formulation sorts
    * the corpus; here ranks come off the DISTRIBUTED prefix sum:
    * tie-group counts (one groupBy on the value — the only data
    * shuffle, |distinct values| rows), then [[PrefixSum.runningSum]]
    * range-partitions that frame so no task ever holds more than
    * ~frame/numParts rows — corpus-scale-safe ranking with zero
    * unpartitioned windows.
    *
    * All-integer core: a tie group's average rank in HALF units is
    * 2·cum − c + 1 (cum = inclusive running count, c = group size), so
    * 2·R₁ = Σ c₁·(2·cum − c + 1) accumulates exactly in decimal; U₁,
    * the tie term Σ(t³−t), and both arm sizes are exact integers, and
    * z is one scalar IEEE evaluation. Output: one row
    * (n_a, n_b, u_stat, z_stat); degenerate corpora (an empty arm or
    * all values tied ⇒ zero variance) publish null z.
    */
  def mannWhitneyU(df: DataFrame, arm: Column, value: Column): DataFrame = {
    val groups = df
      .select(arm.as("__arm"), value.as("__v"))
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("c"),
        sum(when(col("__arm") === 1, 1L).otherwise(0L)).as("c1"))
    val ranked = PrefixSum.runningSum(groups, col("__v"), col("c"), "cum")
    val agg = ranked.agg(
      sum(dec0(col("c1")) * (dec0(col("cum")) * 2 - dec0(col("c")) + 1))
        .as("r1x2"),
      sum(col("c1")).cast("long").as("n1"),
      sum(col("c")).cast("long").as("n"),
      sum(dec0(col("c")) * dec0(col("c")) * dec0(col("c")) - dec0(col("c")))
        .cast("double").as("tie"))
    val n1 = col("n1").cast("double")
    val n2 = (col("n") - col("n1")).cast("double")
    val nD = col("n").cast("double")
    val u1 = (col("r1x2") - dec0(col("n1")) * (dec0(col("n1")) + 1))
      .cast("double") / 2.0
    // n ≥ 2 guard: ANSI throws on the tie term's double/0 at n = 1
    val sigma2 = when(col("n") >= 2,
      n1 * n2 / 12.0 * ((nD + 1.0) - col("tie") / (nD * (nD - 1.0))))
    agg
      .withColumn("u_stat", u1)
      .withColumn("__s2", sigma2)
      .select(col("n1").as("n_a_ranked"),
        (col("n") - col("n1")).cast("long").as("n_b_ranked"),
        col("u_stat"),
        when(col("n1") > 0 && col("n") > col("n1") && col("__s2") > 0.0,
          round((col("u_stat") - n1 * n2 / 2.0) / sqrt(col("__s2")), 6))
          .as("z_stat"))
  }

  /** Sample-ratio-mismatch check (the first guardrail every
    * experiment platform runs: if the 50/50 assignment itself is
    * skewed, every downstream metric is suspect) — chi-square
    * goodness-of-fit of the two arm counts against equal expectation,
    * 1 dof. ONE scan, zero data shuffle; the statistic over counts
    * (n_a − n_b)²/N is one IEEE evaluation over exact integers.
    */
  def sampleRatioCheck(df: DataFrame, arm: Column,
                       threshold: Double = 3.841): DataFrame = {
    val agg = df.agg(
      sum(when(arm === 0, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when(arm === 1, 1L).otherwise(0L)).cast("long").as("n_b"))
    // chi2 vs equal split: (na−e)²/e + (nb−e)²/e with e = N/2
    // = (na − nb)² / N exactly
    val nD = (col("n_a") + col("n_b")).cast("double")
    val d = (col("n_a") - col("n_b")).cast("double")
    agg.select(col("n_a"), col("n_b"),
      when(nD > 0.0, round(d * d / nD, 6)).as("chi2"),
      when(nD > 0.0, d * d / nD > threshold).as("srm_flag"))
  }

  /** Mutual information between two categorical columns (plus both
    * marginal entropies and the min-normalized NMI) — the dependence
    * audit that catches what correlation can't (non-monotone
    * association) over e.g. (lang, source) corpus metadata, and the
    * feature-redundancy check a curation pipeline runs across its
    * quality signals.
    *
    * ONE partial-agg'd count shuffle of CONTINGENCY cardinality, then
    * margins off that tiny frame. Every term's probabilities are
    * exact-integer ratios; the ln sits inside each term and the three
    * double folds (cells, x margin, y margin) run over SORTED
    * collected lists — pinned order, engine-replayable, absorbed by
    * the final 6-dp rounding (the BM25/LM convention).
    */
  def mutualInformation(df: DataFrame, xCol: Column,
                        yCol: Column): DataFrame = {
    val ln2 = math.log(2.0)
    // reused by both margins, the total and the terms — one scan
    val cells = Materialize.cut(
      df.groupBy(xCol.as("x"), yCol.as("y"))
        .agg(count(lit(1)).as("c")))
    val rx = cells.groupBy(col("x")).agg(sum(col("c")).as("cx"))
    val cy = cells.groupBy(col("y")).agg(sum(col("c")).as("cy"))
    val n = cells.agg(sum(col("c")).cast("long").as("n"))
    val termed = cells
      .join(broadcast(rx), Seq("x")).join(broadcast(cy), Seq("y"))
      .crossJoin(broadcast(n))
      .withColumn("__t", {
        val cD = col("c").cast("double"); val nD = col("n").cast("double")
        val a = col("cx").cast("double"); val b = col("cy").cast("double")
        (cD / nD) * (log(cD * nD / (a * b)) / ln2)
      })
    val hx = rx.crossJoin(broadcast(n))
      .withColumn("__h", {
        val a = col("cx").cast("double"); val nD = col("n").cast("double")
        -(a / nD) * (log(a / nD) / ln2)
      })
      .agg(sort_array(collect_list(struct(col("x"), col("__h")))).as("l"))
      .select(aggregate(col("l"), lit(0.0),
        (acc, e) => acc + e.getField("__h")).as("h_x"))
    val hy = cy.crossJoin(broadcast(n))
      .withColumn("__h", {
        val b = col("cy").cast("double"); val nD = col("n").cast("double")
        -(b / nD) * (log(b / nD) / ln2)
      })
      .agg(sort_array(collect_list(struct(col("y"), col("__h")))).as("l"))
      .select(aggregate(col("l"), lit(0.0),
        (acc, e) => acc + e.getField("__h")).as("h_y"))
    termed
      .agg(max(col("n")).as("n"),
        sort_array(collect_list(struct(col("x"), col("y"), col("__t"))))
          .as("__cells"))
      .select(col("n"),
        aggregate(col("__cells"), lit(0.0),
          (acc, e) => acc + e.getField("__t")).as("__mi"))
      .crossJoin(hx).crossJoin(hy)
      .select(col("n"), round(col("__mi"), 6).as("mi_bits"),
        round(col("h_x"), 6).as("h_x"), round(col("h_y"), 6).as("h_y"),
        when(least(col("h_x"), col("h_y")) > 0.0,
          round(col("__mi") / least(col("h_x"), col("h_y")), 6))
          .as("nmi"))
  }

  /** Cohen's kappa inter-rater agreement (Cohen 1960) between two
    * boolean verdict columns — the labeling-QA statistic a
    * training-data pipeline runs over its automated quality raters:
    * raw agreement po overstates consistency when both raters lean
    * the same way, so kappa discounts the chance-agreement floor
    * pe = (a₁b₁ + a₀b₀)/N².
    *
    * ONE scan, ZERO data shuffle (conditional-aggregation legs → one
    * scalar partial-agg merge); the four contingency cells and both
    * margins are exact integers, po/pe/κ one IEEE evaluation each.
    * Null verdicts fall into the "false" legs of neither-cell counts
    * consistently in both engines (CASE/when semantics). Degenerate
    * pe = 1 (both raters constant) publishes null κ.
    */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val a = coalesce(raterA, lit(false))
    val b = coalesce(raterB, lit(false))
    val agg = df.agg(
      count(lit(1)).cast("long").as("n"),
      sum(when(a && b, 1L).otherwise(0L)).cast("long").as("n11"),
      sum(when(a && !b, 1L).otherwise(0L)).cast("long").as("n10"),
      sum(when(!a && b, 1L).otherwise(0L)).cast("long").as("n01"),
      sum(when(!a && !b, 1L).otherwise(0L)).cast("long").as("n00"))
    val nD = col("n").cast("double")
    val a1 = (col("n11") + col("n10")).cast("double")
    val b1 = (col("n11") + col("n01")).cast("double")
    val a0 = (col("n01") + col("n00")).cast("double")
    val b0 = (col("n10") + col("n00")).cast("double")
    val po = (col("n11") + col("n00")).cast("double") / nD
    val pe = (a1 * b1 + a0 * b0) / (nD * nD)
    agg.select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
      when(col("n") > 0, round(po, 6)).as("po"),
      when(col("n") > 0, round(pe, 6)).as("pe"),
      when(col("n") > 0 && pe < 1.0, round((po - pe) / (lit(1.0) - pe), 6))
        .as("kappa"))
  }

  /** Optimal binary split by Gini impurity (the CART/GBDT first-node
    * computation, Breiman et al. 1984) — "at what feature threshold
    * does the label split best": the rule-induction primitive behind
    * turning a continuous curation signal into a hard filter. For
    * every candidate threshold t (each distinct feature value), the
    * weighted impurity of the ≤t / >t partition is
    * 2·pos_l·neg_l/(N·n_l) + 2·pos_r·neg_r/(N·n_r), computed from
    * EXACT cumulative integers (one IEEE evaluation per candidate);
    * the argmin ranks the 6-dp-ROUNDED impurity with the smallest
    * threshold breaking ties — both engines cut identically.
    *
    * Scale shape: one partial-agg'd (value → count, positives)
    * shuffle of feature-domain cardinality; the cumulative window is
    * partitioned-safe only if the domain is bounded (the 2-dp/bucket
    * convention — callers bucket continuous features), so it rides
    * [[PrefixSum.runningSum]] and holds at ANY domain size.
    */
  def bestGiniSplit(df: DataFrame, feature: Column,
                    label: Column): DataFrame = {
    // cut: feeds the cumulative chain AND the totals aggregate
    val groups = Materialize.cut(df
      .select(feature.as("__f"), label.as("__l"))
      .groupBy(col("__f"))
      .agg(count(lit(1)).as("c"),
        sum(when(col("__l"), 1L).otherwise(0L)).as("p")))
    val cums = PrefixSum.runningSums(groups, col("__f"),
      Seq(col("c") -> "cn", col("p") -> "cp"))
    val totals = groups.agg(sum(col("c")).cast("long").as("n"),
      sum(col("p")).cast("long").as("np"))
    val scored = cums.crossJoin(broadcast(totals))
      .filter(col("cn") < col("n")) // a split must leave a right side
      .withColumn("__gini", {
        val nl = col("cn").cast("double")
        val pl = col("cp").cast("double")
        val nr = (col("n") - col("cn")).cast("double")
        val pr = (col("np") - col("cp")).cast("double")
        val nD = col("n").cast("double")
        // the cn < n guard ALSO lives inside the expression: fused
        // codegen can evaluate the projection before the filter
        // branch, and ANSI turns the last row's nr = 0 into a throw —
        // CaseWhen branches are lazy, the filter alone is not enough
        when(col("cn") < col("n"),
          round(lit(2.0) * pl * (nl - pl) / (nD * nl)
            + lit(2.0) * pr * (nr - pr) / (nD * nr), 6))
      })
    val best = scored.agg(min(col("__gini")).as("__mn"))
    scored.crossJoin(broadcast(best))
      .filter(col("__gini") === col("__mn"))
      .agg(min(col("__f")).as("threshold"),
        max(col("__gini")).as("gini_split"),
        max(col("n")).as("n"), max(col("np")).as("n_pos"))
      .select(col("threshold"), col("gini_split"), col("n"), col("n_pos"),
        // the unsplit baseline impurity, for the gain readout
        round(lit(2.0) * col("n_pos").cast("double")
          * (col("n") - col("n_pos")).cast("double")
          / (col("n").cast("double") * col("n").cast("double")), 6)
          .as("gini_root"))
  }

  /** Spearman rank correlation (Spearman 1904) between two numeric
    * columns — the monotone-association audit Pearson (D79) gets
    * wrong under nonlinearity/outliers; the cross-signal
    * sanity check a curation pipeline runs between e.g. length and
    * quality. Tie-group AVERAGE ranks in exact HALF units (the C68
    * identity 2·cum − c + 1), each variable ranked through
    * [[PrefixSum.runningSum]] — no unpartitioned window at any
    * cardinality — and joined back; all sufficient sums are exact
    * decimals and ρ is one IEEE evaluation (the half-unit factor
    * cancels in the correlation).
    */
  def spearmanCorrelation(df: DataFrame, x: Column, y: Column): DataFrame = {
    val base = Materialize.cut(df.select(x.as("__x"), y.as("__y")))
    def rankMap(c: String): DataFrame = {
      val groups = base.groupBy(col(c)).agg(count(lit(1)).as("__cnt"))
      PrefixSum.runningSum(groups, col(c), col("__cnt"), "__cum")
        .select(col(c),
          (dec0(col("__cum")) * 2 - dec0(col("__cnt")) + 1).as(s"${c}_r2"))
    }
    val joined = base
      .join(rankMap("__x"), Seq("__x"))
      .join(rankMap("__y"), Seq("__y"))
    val agg = joined.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("__x_r2")).cast("double").as("sx"),
      sum(col("__y_r2")).cast("double").as("sy"),
      sum(col("__x_r2") * col("__y_r2")).cast("double").as("sxy"),
      sum(col("__x_r2") * col("__x_r2")).cast("double").as("sxx"),
      sum(col("__y_r2") * col("__y_r2")).cast("double").as("syy"))
    val nD = col("n").cast("double")
    val num = nD * col("sxy") - col("sx") * col("sy")
    val dx = nD * col("sxx") - col("sx") * col("sx")
    val dy = nD * col("syy") - col("sy") * col("sy")
    agg.select(col("n"),
      when(dx > 0.0 && dy > 0.0, round(num / (sqrt(dx) * sqrt(dy)), 6))
        .as("rho"))
  }

  /** Kolmogorov–Smirnov two-sample test (Smirnov 1939) — the
    * DISTRIBUTION-level A/B comparison the rank test (C68) can't
    * localize: D = max_v |F̂₀(v) − F̂₁(v)|, reported with the value
    * where the gap peaks (where the two arms' distributions actually
    * diverge). EXACT core: on the tie-group frame, the gap at v is
    * the integer |cum₀·n₁ − cum₁·n₀| (cross-multiplied — no double
    * enters the argmax), accumulated in decimal; both per-arm
    * cumulatives ride [[PrefixSum.runningSum]] (two range-partition
    * passes), so no unpartitioned window exists at any cardinality.
    * The published D is ONE divide; the asymptotic significance
    * threshold c(α)·√((n₀+n₁)/(n₀·n₁)) at α = 0.05 (c = 1.358) is
    * evaluated once.
    */
  def ksTwoSample(df: DataFrame, arm: Column, value: Column): DataFrame = {
    // cut: the tie-group frame feeds the cumulative chain AND totals
    val groups = Materialize.cut(df
      .select(arm.as("__arm"), value.as("__v"))
      .groupBy(col("__v"))
      .agg(sum(when(col("__arm") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("__arm") === 1, 1L).otherwise(0L)).as("c1")))
    val cums = PrefixSum.runningSums(groups, col("__v"),
      Seq(col("c0") -> "cum0", col("c1") -> "cum1"))
    val totals = groups.agg(sum(col("c0")).cast("long").as("n0"),
      sum(col("c1")).cast("long").as("n1"))
    val gapped = cums.crossJoin(broadcast(totals))
      .withColumn("__gap",
        abs(dec0(col("cum0")) * dec0(col("n1"))
          - dec0(col("cum1")) * dec0(col("n0"))))
    val peak = gapped.agg(max(col("__gap")).as("__mx"))
    gapped.crossJoin(broadcast(peak))
      .filter(col("__gap") === col("__mx"))
      .agg(max(col("n0")).as("n_a"), max(col("n1")).as("n_b"),
        min(col("__v")).as("ks_at_value"),
        max(col("__gap")).as("__g"))
      .select(col("n_a"), col("n_b"), col("ks_at_value"),
        when(col("n_a") > 0 && col("n_b") > 0,
          round(col("__g").cast("double")
            / (col("n_a").cast("double") * col("n_b").cast("double")), 6))
          .as("ks_stat"),
        when(col("n_a") > 0 && col("n_b") > 0,
          col("__g").cast("double")
            / (col("n_a").cast("double") * col("n_b").cast("double"))
            > lit(1.358) * sqrt((col("n_a") + col("n_b")).cast("double")
              / (col("n_a").cast("double") * col("n_b").cast("double"))))
          .as("reject_05"))
  }

  /** CUPED variance reduction (Deng et al. 2013 — "Improving the
    * sensitivity of online controlled experiments"): regress the
    * experiment-period metric on the PRE-period covariate and test the
    * residual. Two conditional-sum scans composed as one lazy plan:
    * phase 1 groups events to one (x = pre, y = post) row per user
    * (the only data shuffle, user-count-sized); phase 2 is a scalar
    * conditional aggregate over that frame — per-arm and pooled
    * n/Σx/Σy plus pooled Σx²/Σxy in exact decimals (x, y are exact
    * 2-dp decimals; their products decimal(38,4)).
    *
    * θ = cov(x,y)/var(x) pooled across arms (the standard single-θ
    * CUPED), adjusted effect = (ȳ₁−ȳ₀) − θ·(x̄₁−x̄₀), and the
    * variance-reduction factor is ρ²(x,y) — all one-evaluation
    * scalars. Users absent from a period contribute an exact 0.
    */
  def cupedEffect(df: DataFrame, user: Column, value: Column,
                  isPre: Column): DataFrame = {
    val perUser = df
      .groupBy(user.as("u"))
      // per-user period totals re-narrow to decimal(18,2): keeps the
      // x·x / x·y products at decimal(37,4) — legal and EXACT in both
      // engines (a user's period total is far below 1e16 at any sane
      // per-user scale; the cast would overflow-null before silently
      // rounding)
      .agg(coalesce(sum(when(isPre, Num.dec2(value))), lit(0))
             .cast(DecimalType(18, 2)).as("x"),
           coalesce(sum(when(!isPre, Num.dec2(value))), lit(0))
             .cast(DecimalType(18, 2)).as("y"))
      .withColumn("__arm", (col("u") % 2).cast("int"))
    val a0 = col("__arm") === 0
    val a1 = col("__arm") === 1
    val agg = perUser.agg(
      count(lit(1)).cast("long").as("n_users"),
      sum(when(a0, 1L).otherwise(0L)).cast("double").as("n0"),
      sum(when(a1, 1L).otherwise(0L)).cast("double").as("n1"),
      sum(when(a0, col("x"))).cast("double").as("sx0"),
      sum(when(a1, col("x"))).cast("double").as("sx1"),
      sum(when(a0, col("y"))).cast("double").as("sy0"),
      sum(when(a1, col("y"))).cast("double").as("sy1"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("x") * col("y")).cast("double").as("sxy"),
      sum(col("y") * col("y")).cast("double").as("syy"))
    val n = col("n0") + col("n1")
    val sx = col("sx0") + col("sx1")
    val sy = col("sy0") + col("sy1")
    val covXY = col("sxy") - sx * sy / n
    val varX = col("sxx") - sx * sx / n
    val varY = col("syy") - sy * sy / n
    val theta = covXY / varX
    val raw = col("sy1") / col("n1") - col("sy0") / col("n0")
    agg
      .withColumn("__ok",
        col("n0") > 0 && col("n1") > 0 && varX > 0.0 && varY > 0.0)
      .select(col("n_users"),
        when(col("__ok"), round(theta, 6)).as("theta"),
        when(col("n0") > 0 && col("n1") > 0, round(raw, 6)).as("raw_diff"),
        when(col("__ok"), round(
          raw - theta * (col("sx1") / col("n1") - col("sx0") / col("n0")), 6))
          .as("adjusted_diff"),
        when(col("__ok"), round(covXY * covXY / (varX * varY), 6))
          .as("var_reduction"))
  }

  /** C82: Wald's sequential probability ratio test over a daily
    * conversion stream (Wald 1945 — the sequential monitor behind
    * "peeking-safe" experiment dashboards): H0 p=p0 vs H1 p=p1 on the
    * per-event conversion indicator, the log-likelihood ratio
    * accumulated in EVENT-TIME day order, with the decision read
    * against the exact Wald bounds A = ln((1−β)/α), B = ln(β/(1−α)).
    * Unlike the fixed-horizon C66 readout, the curve is valid at
    * every interim look — crossing A ends the run early.
    *
    * Scale shape: ONE corpus scan collapses to per-day (trials,
    * conversions) — aggregate-sized, bounded by the calendar — then
    * both cumulatives ride the distributed [[PrefixSum]] and the LLR
    * is one codegen expression per day. The ln constants are computed
    * ONCE driver-side and enter the plan as literals (the oracle
    * embeds the same literals, so K·ln(...) is bit-identical in both
    * engines at any K — no last-ulp drift scaled by a million-count).
    */
  def sprtMonitor(df: DataFrame, day: Column, converted: Column,
                  p0: Double, p1: Double,
                  alpha: Double = 0.05, beta: Double = 0.05): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"need distinct rates in (0,1), got p0=$p0 p1=$p1")
    val lrConv = math.log(p1 / p0)           // per-conversion LLR step
    val lrMiss = math.log((1 - p1) / (1 - p0)) // per-non-conversion step
    val upper = math.log((1 - beta) / alpha)
    val lower = math.log(beta / (1 - alpha))
    // cut the day frame once: repartitionByRange SAMPLES its input in
    // a separate job, so an un-cut frame would re-run the corpus
    // groupBy twice (sample + shuffle) — measured 1.5× on this key
    val daily = Materialize.cut(df.groupBy(day.as("day"))
      .agg(count(lit(1)).as("trials"),
        sum(when(converted, 1L).otherwise(0L)).as("conversions")))
    val cum = PrefixSum.runningSums(daily, col("day"),
      Seq(col("trials") -> "cum_n", col("conversions") -> "cum_k"))
    val llr = col("cum_k").cast("double") * lit(lrConv) +
      (col("cum_n") - col("cum_k")).cast("double") * lit(lrMiss)
    cum.select(col("day"), col("trials"), col("conversions"),
        col("cum_n"), col("cum_k"),
        round(llr, 6).as("llr"),
        when(round(llr, 6) >= lit(upper), "accept_h1")
          .when(round(llr, 6) <= lit(lower), "accept_h0")
          .otherwise("continue").as("decision"))
      .orderBy(col("day"))
  }

  /** C85: mixture SPRT with always-valid p-values (Robbins 1970;
    * Johari, Koomen, Pekelis & Walsh 2017 — the "peeking-safe
    * p-value" behind modern A/B dashboards). C82's Wald test needs a
    * POINT alternative p1; the mSPRT mixes the likelihood ratio over
    * a GRID of alternatives, so it detects any of them, and
    * 1/max_{m≤n} Λ_m is a p-value valid at every interim look.
    *
    * The mixture integral is a fixed quadrature: Λ_n = (1/J)·Σ_j
    * exp(k_n·ln(p_j/p0) + (n_n−k_n)·ln((1−p_j)/(1−p0))) — evaluated
    * in log space (logsumexp against the running max term) so a
    * million-trial day can never overflow exp. The per-point ln step
    * constants are computed ONCE driver-side and enter the plan as
    * literals (the oracle embeds the same literals, so k·ln(...) is
    * bit-identical in both engines at any k — the C82 discipline);
    * the quadrature GRID is part of the test's published convention,
    * exactly like a histogram's bin edges.
    *
    * Scale shape: one corpus scan collapses to per-day (trials,
    * conversions); the cumulatives ride the distributed [[PrefixSum]];
    * the J-term logsumexp is one codegen expression per day; the
    * running max rides a window over the calendar-bounded day frame.
    *
    * @param grid alternative rates p_j (all in (0,1), ≠ p0)
    * @return per day: cumulative counts, log mixture LR, always-valid
    *         p-value, reject/continue decision at level `alpha`
    */
  def msprtMonitor(df: DataFrame, day: Column, converted: Column,
                   p0: Double, grid: Seq[Double],
                   alpha: Double = 0.05): DataFrame = {
    require(p0 > 0 && p0 < 1, s"p0 must be in (0,1), got $p0")
    require(grid.nonEmpty && grid.forall(p => p > 0 && p < 1 && p != p0),
      s"grid rates must be in (0,1) and distinct from p0: $grid")
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val steps = grid.map(p =>
      (math.log(p / p0), math.log((1 - p) / (1 - p0))))
    val lnW = math.log(1.0 / grid.size) // uniform mixture weight
    val rejectLine = math.log(1.0 / alpha)
    // cut: the range pass's sampling job would otherwise re-run the
    // corpus groupBy (see sprtMonitor's note)
    val daily = Materialize.cut(df.groupBy(day.as("day"))
      .agg(count(lit(1)).as("trials"),
        sum(when(converted, 1L).otherwise(0L)).as("conversions")))
    val cum = PrefixSum.runningSums(daily, col("day"),
      Seq(col("trials") -> "cum_n", col("conversions") -> "cum_k"))
    // t_j = k·a_j + (n−k)·b_j, association fixed to match the oracle
    val ts = steps.map { case (a, b) =>
      col("cum_k").cast("double") * lit(a) +
        (col("cum_n") - col("cum_k")).cast("double") * lit(b)
    }
    val mx = greatest(ts: _*)
    val logMlr = round(
      lit(lnW) + mx + log(ts.map(t => exp(t - mx)).reduce(_ + _)), 6)
    // running max of the ROUNDED statistic: the published p-value and
    // the decision read the same 6-decimal edge in both engines
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    cum.withColumn("log_mlr", logMlr)
      .withColumn("__peak", max(col("log_mlr")).over(w))
      .select(col("day"), col("trials"), col("conversions"),
        col("cum_n"), col("cum_k"), col("log_mlr"),
        round(least(lit(1.0), exp(-col("__peak"))), 6).as("p_value"),
        when(col("__peak") >= lit(rejectLine), "reject_h0")
          .otherwise("continue").as("decision"))
      .orderBy(col("day"))
  }

  /** C86: group-sequential O'Brien–Fleming monitor (O'Brien & Fleming
    * 1979; Pocock 1977 for the design family) — the SCHEDULED-looks
    * twin of C85's always-valid monitor: K interim analyses at equally
    * spaced calendar fractions, each comparing the pooled two-sample
    * conversion z statistic against the OBF boundary
    * z_k = c·sqrt(K/k), where c is the PUBLISHED critical constant for
    * (K, α) (e.g. c ≈ 2.04 for K = 5, two-sided α = 0.05 — the table
    * value embeds as a plan/oracle literal exactly like C85's
    * quadrature grid). Early looks face a nearly-unreachable bound,
    * the final look pays almost no alpha penalty — the property that
    * made OBF the regulatory default.
    *
    * Look schedule: the day frame's rank r qualifies as look k when
    * r = ceil(D·k/K), tested multiplication-only (r·K ≥ D·k and
    * (r−1)·K < D·k — exact integers, no division in either engine);
    * D = total days.
    *
    * Scale shape: ONE corpus scan collapses to the calendar-bounded
    * per-day per-arm counts; the four cumulatives ride the distributed
    * [[PrefixSum]]; z, bound, and the decision are one IEEE evaluation
    * per look over exact integers. Decisions compare the 6-dp ROUNDED
    * z and bound so the edge is defined identically cross-engine, and
    * a look after the first crossing reads "stopped" (the trial would
    * already have ended).
    */
  def obfMonitor(df: DataFrame, day: Column, arm: Column,
                 converted: Column, looks: Int = 5,
                 critical: Double = 2.04): DataFrame = {
    require(looks >= 1, s"need at least one look, got $looks")
    require(critical > 0, s"critical must be positive, got $critical")
    val ranked = convLookFrame(df, day, arm, converted)
    // look k's day = rank ceil(D·k/K); when D < K looks coincide and
    // the row takes the SMALLEST matching k (the when-chain order,
    // mirrored by the oracle's CASE order)
    val lookDay = (k: Int) =>
      col("__r") * looks >= col("__d") * k &&
        (col("__r") - 1) * looks < col("__d") * k
    val lookCol = (1 to looks).foldLeft(lit(null).cast("int")) {
      (acc, k) => when(lookDay(looks + 1 - k), looks + 1 - k).otherwise(acc)
    } // fold from K down so earlier looks override — smallest k wins
    val bound = round(
      lit(critical) * sqrt(lit(looks.toDouble) / col("look").cast("double")), 6)
    sequentialDecision(
      ranked.withColumn("look", lookCol).filter(col("look").isNotNull),
      bound, Nil)
  }

  /** C121: Lan–DeMets alpha-spending group-sequential monitor (Lan &
    * DeMets 1983) — C86's OBF bound generalized to ARBITRARY
    * information fractions via a spending function: at look k
    * (fraction t_k of the trial's days), the boundary u_k is the one
    * whose incremental crossing probability under the canonical
    * Brownian joint law equals α*(t_k) − α*(t_{k−1}). The fractions
    * are DESIGN constants (integer percents, last = 100), so the
    * boundaries and per-look cumulative spend come out of
    * [[AlphaSpending]]'s driver-side recursion at PLAN-BUILD time and
    * embed into both the plan and the DuckDB oracle as identical
    * round-trip double literals (the C85 quadrature-grid discipline —
    * no data ever enters the boundary computation).
    *
    * Look schedule: day rank r qualifies as look k when
    * r = ceil(D·p_k/100), tested multiplication-only (r·100 ≥ D·p_k
    * and (r−1)·100 < D·p_k — exact integers, no division in either
    * engine); coincident looks (small D) resolve to the SMALLEST k,
    * C86's convention.
    *
    * Scale shape identical to C86: ONE corpus scan collapses to
    * calendar-bounded per-day per-arm counts, cumulatives ride the
    * distributed [[PrefixSum]], z/bound/decision are one IEEE
    * evaluation per look; decisions compare 6-dp ROUNDED values.
    */
  def alphaSpendingMonitor(df: DataFrame, day: Column, arm: Column,
                           converted: Column, fracPct: Seq[Int],
                           alpha: Double = 0.05,
                           spend: Double => Double = null): DataFrame = {
    require(fracPct.nonEmpty && fracPct.last == 100 &&
      fracPct.forall(p => p > 0 && p <= 100) &&
      fracPct.zip(fracPct.tail).forall { case (a, b) => a < b },
      s"fractions must be strictly increasing percents ending at 100: $fracPct")
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    // default family = OBF-type; Pocock/power/HSD plug in via `spend`
    val sp = Option(spend).getOrElse(AlphaSpending.obfSpend(alpha) _)
    val bounds = AlphaSpending.boundsRounded(fracPct, alpha, sp)
    val spends = AlphaSpending.spendRounded(fracPct, alpha, sp)
    val ranked = convLookFrame(df, day, arm, converted)
    sequentialDecision(
      ranked.withColumn("look", lookColFor(fracPct))
        .filter(col("look").isNotNull),
      perLookLit(bounds), Seq(perLookLit(spends).as("alpha_spent")))
  }

  /** C123: the C121 monitor with the spending CLOCK on OBSERVED
    * information — analyses stay scheduled by calendar (the same
    * percent-of-days look ranks as C121), but the fraction fed to the
    * spending function is t_k = N_k / N_K: cumulative events through
    * look k over the final total, from the day census. This is the
    * production case (Lan & DeMets 1983 §4; gsDesign's `usTime`):
    * accrual is never uniform across the calendar, and spending by
    * calendar time over- or under-spends exactly when traffic ramps.
    *
    * The census is an aggregate-sized driver fold at PLAN-BUILD time
    * (one row per day — the dpCells/trained-codebook publication
    * pattern, not data movement), after which the boundaries embed as
    * 6-dp round-trip literals exactly like C121: the oracle calls the
    * SAME [[infoLookFractions]] on the same table at render time, so
    * both engines carry bit-identical constants.
    */
  def alphaSpendingInfoMonitor(df: DataFrame, day: Column, arm: Column,
                               converted: Column, fracPct: Seq[Int],
                               alpha: Double = 0.05,
                               spend: Double => Double = null): DataFrame = {
    requireLookSchedule(fracPct, alpha)
    val sp = Option(spend).getOrElse(AlphaSpending.obfSpend(alpha) _)
    // ONE corpus scan: the day cells carry a total-rows rider so the
    // census (driver-side literals) and the look frame share the scan
    // — infoLookFractions(df, ...) would re-scan the corpus for a
    // per-day count the cells aggregate already produces. The census
    // values (and therefore every embedded literal) are identical.
    val a0 = arm === 0; val a1 = arm === 1
    val cells = Materialize.cut(df.groupBy(day.as("day"))
      .agg(sum(when(a0, 1L).otherwise(0L)).as("t0"),
        sum(when(a0 && converted, 1L).otherwise(0L)).as("k0"),
        sum(when(a1, 1L).otherwise(0L)).as("t1"),
        sum(when(a1 && converted, 1L).otherwise(0L)).as("k1"),
        count(lit(1)).as("__tot")))
    val census = cells.orderBy(col("day")).select(col("__tot"))
      .collect().map(_.getLong(0)).toSeq
    val fracs = infoLookFractionsFromCensus(census, fracPct)
    val bounds = AlphaSpending.boundsRoundedAt(fracs, alpha, sp)
    val spends = AlphaSpending.spendRoundedAt(fracs, alpha, sp)
    val infos = fracs.map(AlphaSpending.round6)
    val ranked = lookFrameFromDaily(cells.drop("__tot"))
    sequentialDecision(
      ranked.withColumn("look", lookColFor(fracPct))
        .filter(col("look").isNotNull),
      perLookLit(bounds),
      Seq(perLookLit(infos).as("info_frac"),
        perLookLit(spends).as("alpha_spent")))
  }

  /** Observed information fraction at each calendar look: cumulative
    * event count through look k's day (rank ceil(D·p_k/100), the same
    * rank convention the monitors' in-plan schedule tests) over the
    * final total. Strictly-increasing by require — a flat look would
    * break the spending recursion's schedule contract loudly, not
    * silently.
    */
  def infoLookFractions(df: DataFrame, day: Column,
                        fracPct: Seq[Int]): Seq[Double] =
    infoLookFractionsFromCensus(
      df.groupBy(day.as("__day")).agg(count(lit(1)).as("__n"))
        .orderBy(col("__day")).select(col("__n")).collect()
        .map(_.getLong(0)).toSeq,
      fracPct)

  /** The census fold behind [[infoLookFractions]], exposed so a caller
    * that already aggregated per-day totals (the monitor's day cells)
    * can reuse them instead of paying a second corpus scan.
    */
  private[graft] def infoLookFractionsFromCensus(
      census: Seq[Long], fracPct: Seq[Int]): Seq[Double] = {
    require(census.nonEmpty, "infoLookFractions: empty frame")
    val d = census.length
    val cum = census.scanLeft(0L)(_ + _).tail
    val atLooks = fracPct.map { p =>
      val r = (d.toLong * p + 99) / 100 // ceil(D·p/100): the look-day rank
      cum(r.toInt - 1)
    }
    val out = atLooks.map(_.toDouble / atLooks.last.toDouble)
    require(out.zip(out.tail).forall { case (a, b) => a < b },
      s"observed information must strictly increase across looks: $out")
    out
  }

  /** C122: non-binding futility monitor — ONE-SIDED efficacy bounds
    * u_k from `spendA` alpha-spending plus futility bounds l_k from
    * `spendB` beta-spending under the power-calibrated drift (the
    * gsDesign test.type=4 shape; see
    * [[AlphaSpending.futilityBounds]]). Reading: z ≥ u_k rejects H0
    * (arm 1 better), z ≤ l_k stops for futility (at the final look
    * l_K = u_K, so "stop_futility" there means accept H0); futility
    * is ADVISORY (non-binding) — ignoring it cannot inflate α. The
    * whole design (bounds, spends, drift) is a pure function of the
    * design constants, embedded as 6-dp literals in plan and oracle.
    *
    * Same scale shape as C86/C121: one corpus scan → day cells →
    * distributed prefix sums; the design recursion runs driver-side
    * at plan-build time (memoized — it costs a few seconds of
    * quadrature once per design).
    */
  def betaSpendingMonitor(df: DataFrame, day: Column, arm: Column,
                          converted: Column, fracPct: Seq[Int],
                          alpha: Double = 0.025, beta: Double = 0.1,
                          designKey: String = null,
                          spendA: Double => Double = null,
                          spendB: Double => Double = null): DataFrame = {
    requireLookSchedule(fracPct, alpha)
    require(beta > 0 && beta < 1, s"beta in (0,1), got $beta")
    require(designKey != null || (spendA == null && spendB == null),
      "custom spendA/spendB require an explicit designKey: the default " +
        "memo key encodes only (fracs, alpha, beta), so two designs " +
        "differing only in spending family would alias in the cache")
    val sa = Option(spendA).getOrElse(AlphaSpending.obfSpendOneSided(alpha) _)
    val sb = Option(spendB).getOrElse(AlphaSpending.hsdSpend(beta, -2.0) _)
    val design = AlphaSpending.futilityBoundsCached(
      Option(designKey).getOrElse(
        s"default:${fracPct.mkString(",")}:$alpha:$beta"),
      fracPct, alpha, beta, sa, sb)
    val ranked = convLookFrame(df, day, arm, converted)
    futilityDecision(
      ranked.withColumn("look", lookColFor(fracPct))
        .filter(col("look").isNotNull),
      perLookLit(design.upper), perLookLit(design.lower),
      Seq(perLookLit(design.alphaSpent).as("alpha_spent"),
        perLookLit(design.betaSpent).as("beta_spent"),
        lit(design.drift).as("powered_drift")))
  }

  private def requireLookSchedule(fracPct: Seq[Int], alpha: Double): Unit = {
    require(fracPct.nonEmpty && fracPct.last == 100 &&
      fracPct.forall(p => p > 0 && p <= 100) &&
      fracPct.zip(fracPct.tail).forall { case (a, b) => a < b },
      s"fractions must be strictly increasing percents ending at 100: $fracPct")
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
  }

  /** Day rank r qualifies as look k when r = ceil(D·p_k/100) —
    * multiplication-only integer tests; the fold runs K down to 1 so
    * coincident looks (small D) resolve to the SMALLEST k (C86's
    * convention).
    */
  private def lookColFor(fracPct: Seq[Int]): Column = {
    val looks = fracPct.size
    val lookDay = (k: Int) =>
      col("__r") * 100 >= col("__d") * fracPct(k - 1) &&
        (col("__r") - 1) * 100 < col("__d") * fracPct(k - 1)
    (1 to looks).foldLeft(lit(null).cast("int")) {
      (acc, k) => when(lookDay(looks + 1 - k), looks + 1 - k).otherwise(acc)
    }
  }

  /** Per-look design literal as a CASE over the look column. */
  private def perLookLit(values: Seq[Double]): Column =
    (1 to values.size).foldLeft(lit(null).cast("double")) {
      (acc, k) => when(col("look") === k, lit(values(k - 1))).otherwise(acc)
    }

  /** The per-day per-arm conversion cells the whole sequential-monitor
    * family (C86/C121/C122/C123) collapses to. ADDITIVE — plain
    * integer sums — so a streaming lake can accumulate them per
    * micro-batch (E40) and the merged cells feed the exact same
    * finisher as the batch scan.
    */
  def dailyConvCells(df: DataFrame, day: Column, arm: Column,
                     converted: Column): DataFrame = {
    val a0 = arm === 0; val a1 = arm === 1
    df.groupBy(day.as("day"))
      .agg(sum(when(a0, 1L).otherwise(0L)).as("t0"),
        sum(when(a0 && converted, 1L).otherwise(0L)).as("k0"),
        sum(when(a1, 1L).otherwise(0L)).as("t1"),
        sum(when(a1 && converted, 1L).otherwise(0L)).as("k1"))
  }

  /** C121 from pre-aggregated day cells (day, t0, k0, t1, k1) — the
    * E40 stream face's read path; the batch monitor routes through
    * the same code so stream ≡ batch is structural.
    */
  def alphaSpendingFromDaily(daily: DataFrame, fracPct: Seq[Int],
                             alpha: Double = 0.05,
                             spend: Double => Double = null): DataFrame = {
    requireLookSchedule(fracPct, alpha)
    val sp = Option(spend).getOrElse(AlphaSpending.obfSpend(alpha) _)
    val bounds = AlphaSpending.boundsRounded(fracPct, alpha, sp)
    val spends = AlphaSpending.spendRounded(fracPct, alpha, sp)
    sequentialDecision(
      lookFrameFromDaily(daily).withColumn("look", lookColFor(fracPct))
        .filter(col("look").isNotNull),
      perLookLit(bounds), Seq(perLookLit(spends).as("alpha_spent")))
  }

  /** Shared by C86/C121: ONE corpus scan to calendar-bounded per-day
    * per-arm conversion counts, the four cumulatives + the day rank
    * on the distributed [[PrefixSum]], and the day total as a
    * broadcast rider.
    */
  private def convLookFrame(df: DataFrame, day: Column, arm: Column,
                            converted: Column): DataFrame =
    lookFrameFromDaily(dailyConvCells(df, day, arm, converted))

  private def lookFrameFromDaily(dailyCells: DataFrame): DataFrame = {
    // all five cumulatives ride ONE range pass (one shuffle, one
    // lineage cut, one partitioned window) — chaining runningSum per
    // mass re-range-shuffled the day frame five times. The cut keeps
    // the range pass's SAMPLING job off the corpus scan (it re-runs
    // the input subtree otherwise).
    val daily = Materialize.cut(dailyCells.withColumn("__one", lit(1L)))
    val cum = PrefixSum.runningSums(daily, col("day"),
      Seq(col("t0") -> "cum_n0", col("k0") -> "cum_k0",
        col("t1") -> "cum_n1", col("k1") -> "cum_k1",
        col("__one") -> "__r"))
    val total = cum.agg(max(col("__r")).cast("long").as("__d"))
    cum.crossJoin(broadcast(total))
  }

  /** Shared by C86/C121: the pooled two-sample conversion z at each
    * look, the boundary compare on 6-dp ROUNDED values, and the
    * stopped/reject/continue readout (a look after the first crossing
    * reads "stopped" — the trial would already have ended).
    * `extraCols` insert between `bound` and `decision`.
    */
  private def sequentialDecision(atLooks: DataFrame, bound: Column,
                                 extraCols: Seq[Column]): DataFrame = {
    val n0 = col("cum_n0").cast("double"); val n1 = col("cum_n1").cast("double")
    val pp = (col("cum_k0") + col("cum_k1")).cast("double") /
      (col("cum_n0") + col("cum_n1")).cast("double")
    val se2 = pp * (lit(1.0) - pp) * (lit(1.0) / n0 + lit(1.0) / n1)
    val z = when(col("cum_n0") > 0 && col("cum_n1") > 0 && se2 > 0.0,
      round((col("cum_k1").cast("double") / n1 -
        col("cum_k0").cast("double") / n0) / sqrt(se2), 6))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("look"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    atLooks
      .withColumn("z_stat", z)
      .withColumn("bound", bound)
      .withColumn("__x",
        when(abs(coalesce(col("z_stat"), lit(0.0))) >= col("bound"), 1L)
          .otherwise(0L))
      .withColumn("__prior", coalesce(sum(col("__x")).over(w), lit(0L)))
      .select(Seq(col("look"), col("day"),
        col("cum_n0").cast("long").as("cum_n0"),
        col("cum_k0").cast("long").as("cum_k0"),
        col("cum_n1").cast("long").as("cum_n1"),
        col("cum_k1").cast("long").as("cum_k1"),
        col("z_stat"), col("bound")) ++ extraCols :+
        when(col("__prior") > 0, "stopped")
          .when(col("__x") === 1L, "reject_h0")
          .otherwise("continue").as("decision"): _*)
      .orderBy(col("look"))
  }

  /** C122's finisher: the same pooled two-sample z as
    * [[sequentialDecision]], compared ONE-SIDED against the efficacy
    * bound above and the futility bound below (6-dp rounded values on
    * both sides). A null z (an empty arm at a look) makes no decision
    * — unlike the two-sided coalesce-0 convention, 0 could legally
    * cross an early (negative) futility bound, so null is kept
    * decision-inert explicitly in BOTH engines.
    */
  private def futilityDecision(atLooks: DataFrame, upper: Column,
                               lower: Column,
                               extraCols: Seq[Column]): DataFrame = {
    val n0 = col("cum_n0").cast("double"); val n1 = col("cum_n1").cast("double")
    val pp = (col("cum_k0") + col("cum_k1")).cast("double") /
      (col("cum_n0") + col("cum_n1")).cast("double")
    val se2 = pp * (lit(1.0) - pp) * (lit(1.0) / n0 + lit(1.0) / n1)
    val z = when(col("cum_n0") > 0 && col("cum_n1") > 0 && se2 > 0.0,
      round((col("cum_k1").cast("double") / n1 -
        col("cum_k0").cast("double") / n0) / sqrt(se2), 6))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("look"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    atLooks
      .withColumn("z_stat", z)
      .withColumn("bound", upper)
      .withColumn("futility_bound", lower)
      .withColumn("__xu",
        when(col("z_stat").isNotNull && col("z_stat") >= col("bound"), 1L)
          .otherwise(0L))
      .withColumn("__xl",
        when(col("z_stat").isNotNull && col("__xu") === 0L &&
          col("z_stat") <= col("futility_bound"), 1L).otherwise(0L))
      .withColumn("__prior",
        coalesce(sum(col("__xu") + col("__xl")).over(w), lit(0L)))
      .select(Seq(col("look"), col("day"),
        col("cum_n0").cast("long").as("cum_n0"),
        col("cum_k0").cast("long").as("cum_k0"),
        col("cum_n1").cast("long").as("cum_n1"),
        col("cum_k1").cast("long").as("cum_k1"),
        col("z_stat"), col("bound"), col("futility_bound")) ++ extraCols :+
        when(col("__prior") > 0, "stopped")
          .when(col("__xu") === 1L, "reject_h0")
          .when(col("__xl") === 1L, "stop_futility")
          .otherwise("continue").as("decision"): _*)
      .orderBy(col("look"))
  }

  /** C94: distribution-free confidence interval for the MEDIAN via
    * order statistics (Conover 1999 §3.2 / the binomial method with
    * the large-sample rank approximation L = ⌊(n − z√n)/2⌋,
    * U = n − L + 1) — the error bar for the robust location metric
    * C54/C92 report: a mean's CI (C66's machinery) says nothing about
    * the median, and bootstrap (D82) costs B replicas where this
    * costs two rank lookups.
    *
    * EXACT integer end to end on an integer-unit metric: one
    * value-domain count shuffle, cumulative on the distributed
    * [[PrefixSum]], the three order statistics (lower median, L, U)
    * as conditional MINs against integer rank thresholds; the only
    * double is the rank formula itself (one IEEE evaluation, floored
    * — deterministic in both engines). Output row: n, the three
    * order-statistic values in input units.
    */
  def medianCi(df: DataFrame, value: Column,
               z: Double = 1.959963984540054): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val groups = df.select(value.cast("long").as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("c"))
    val cum = PrefixSum.runningSum(groups, col("__v"), col("c"), "cum")
    val tot = groups.agg(coalesce(sum(col("c")), lit(0L)).cast("long")
      .as("n"))
    val withN = cum.crossJoin(broadcast(tot))
      .withColumn("__l", greatest(lit(1L),
        floor((col("n").cast("double") - lit(z) *
          sqrt(col("n").cast("double"))) / lit(2.0)).cast("long")))
      .withColumn("__u", least(col("n"), col("n") - col("__l") + 1))
      .withColumn("__m", expr("CAST((n + 1) DIV 2 AS BIGINT)"))
    withN.agg(
      max(col("n")).as("n"),
      min(when(col("cum") >= col("__m"), col("__v"))).as("median"),
      min(when(col("cum") >= col("__l"), col("__v"))).as("ci_lo"),
      min(when(col("cum") >= col("__u"), col("__v"))).as("ci_hi"))
  }

  /** C95: Wald–Wolfowitz runs test (Wald & Wolfowitz 1940) on the
    * up/down moves of a daily series — the randomness check that
    * complements C84: Mann–Kendall asks "is there a monotone trend",
    * the runs test asks "is the sequence of moves random at all"
    * (too FEW runs = clustering/momentum, too MANY = oscillation).
    * Zero moves drop by the standard convention.
    *
    * The corpus collapses to the calendar-bounded day series in one
    * scan; signs, the run count (1 + sign changes over consecutive
    * retained moves), n₊/n₋ are exact integers off bounded windows;
    * z = (R − μ)/σ is one IEEE evaluation, continuity-uncorrected
    * (the two-sided large-sample form). Degenerate series (n₊ = 0 or
    * n₋ = 0) publish null z.
    */
  def runsTest(series: DataFrame, step: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("__s"))
    val signs = series.select(step.as("__s"), value.cast("long").as("__x"))
      .withColumn("__d", col("__x") - lag(col("__x"), 1).over(w))
      .filter(col("__d").isNotNull && col("__d") =!= 0L)
      .withColumn("__sgn", when(col("__d") > 0, 1).otherwise(-1))
    val runs = signs
      .withColumn("__chg",
        when(lag(col("__sgn"), 1).over(w).isNull, 1L)
          .when(lag(col("__sgn"), 1).over(w) =!= col("__sgn"), 1L)
          .otherwise(0L))
      .agg(coalesce(sum(col("__chg")), lit(0L)).cast("long").as("n_runs"),
        coalesce(sum(when(col("__sgn") === 1, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("n_up"),
        coalesce(sum(when(col("__sgn") === -1, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("n_down"))
    val n1 = col("n_up").cast("double"); val n2 = col("n_down").cast("double")
    val nn = n1 + n2
    val mu = lit(2.0) * n1 * n2 / nn + lit(1.0)
    val s2 = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - n1 - n2) /
      (nn * nn * (nn - lit(1.0)))
    runs.select(col("n_runs"), col("n_up"), col("n_down"),
      when(col("n_up") > 0 && col("n_down") > 0, round(mu, 6))
        .as("expected_runs"),
      when(col("n_up") > 0 && col("n_down") > 0 && s2 > 0.0,
        round((col("n_runs").cast("double") - mu) / sqrt(s2), 6))
        .as("z_stat"))
  }

  /** C93: two-arm conversion rates with Wilson score intervals
    * (Wilson 1927; Agresti & Coull 1998 recommend it over the Wald
    * interval every dashboard naively draws — Wald collapses at
    * p̂ near 0/1 and small n, Wilson never leaves (0,1)). The
    * per-arm interval is the honest error bar under C74's SRM
    * guardrail; non-overlap is the eyeball test, C66/C82 the formal
    * ones.
    *
    * ONE scan, ONE row: exact integer (n, k) per arm via conditional
    * aggregation; center/half-width are one IEEE evaluation each over
    * those integers with the z literal shared plan/oracle.
    */
  def rateWilsonCi(df: DataFrame, arm: Column, converted: Column,
                   z: Double = 1.959963984540054): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val a0 = arm === 0; val a1 = arm === 1
    val agg = df.agg(
      sum(when(a0, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when(a0 && converted, 1L).otherwise(0L)).cast("long").as("k_a"),
      sum(when(a1, 1L).otherwise(0L)).cast("long").as("n_b"),
      sum(when(a1 && converted, 1L).otherwise(0L)).cast("long").as("k_b"))
    def leg(t: String): (Column, Column, Column) = {
      val n = col(s"n_$t").cast("double"); val k = col(s"k_$t").cast("double")
      val p = k / n
      val z2 = lit(z * z) // one driver-side multiply, shared literal
      val denom = lit(1.0) + z2 / n
      val center = (p + z2 / (lit(2.0) * n)) / denom
      val half = lit(z) * sqrt(p * (lit(1.0) - p) / n
        + z2 / (lit(4.0) * n * n)) / denom
      val ok = col(s"n_$t") > 0
      (when(ok, round(p, 6)), when(ok, round(center - half, 6)),
        when(ok, round(center + half, 6)))
    }
    val (ra, loa, hia) = leg("a")
    val (rb, lob, hib) = leg("b")
    agg.select(col("n_a"), col("k_a"),
      ra.as("rate_a"), loa.as("lo_a"), hia.as("hi_a"),
      col("n_b"), col("k_b"),
      rb.as("rate_b"), lob.as("lo_b"), hib.as("hi_b"),
      when(col("n_a") > 0 && col("n_b") > 0,
        round(col("k_b").cast("double") / col("n_b").cast("double")
          - col("k_a").cast("double") / col("n_a").cast("double"), 6))
        .as("diff"))
  }

  /** C92: Yuen's trimmed-mean t-test (Yuen 1974; Tukey & McLaughlin
    * 1963 for the trimmed-t) — the robust twin of C66's Welch test:
    * heavy-tailed metrics (revenue!) hand the Welch readout to a few
    * whales; trimming k = ⌊n/trimDen⌋ per tail compares the metric's
    * BODY, with the winsorized variance and Yuen's df doing the
    * bookkeeping honestly (vs C38's winsorize-then-t, which
    * understates the variance).
    *
    * EXACT integer core on an integer-unit metric (cents): per arm,
    * one value-domain count shuffle, cumulatives on the distributed
    * [[PrefixSum]] (never a per-arm global sort); the k-th order
    * statistics are conditional MINs, the trimmed mass enters via the
    * per-value INNER PORTION min(cum, n−k) − max(cum−c, k) clamped ≥0
    * (exact rank slicing under ties), and the trimmed/winsorized
    * sums accumulate in decimal. The finisher is one IEEE evaluation
    * per statistic. Degenerate arms (h < 2 or zero variance) publish
    * null.
    *
    * @param value integer-unit metric (e.g. cents) — exactness needs
    *              an integer domain
    * @param trimDen trim denominator: k = n DIV trimDen (10 → 10%)
    */
  def yuenTrimmed(df: DataFrame, arm: Column, value: Column,
                  trimDen: Int = 10): DataFrame = {
    require(trimDen >= 3, s"trimDen must be >= 3 (trim < half), got $trimDen")
    val groups = Materialize.cut(
      df.select(arm.as("__arm"), value.cast("long").as("__v"))
        .groupBy(col("__arm"), col("__v")).agg(count(lit(1)).as("c")))
    def armStats(a: Int, tag: String): DataFrame = {
      val g = groups.filter(col("__arm") === a)
      val cum = PrefixSum.runningSum(g, col("__v"), col("c"), "cum")
      val tot = g.agg(coalesce(sum(col("c")), lit(0L)).cast("long").as("n"))
      val withN = cum.crossJoin(broadcast(tot))
        .withColumn("k", expr(s"CAST(n DIV $trimDen AS BIGINT)"))
      val inner = greatest(lit(0L),
        least(col("cum"), col("n") - col("k")) -
          greatest(col("cum") - col("c"), col("k")))
      withN.agg(
        max(col("n")).as(s"n_$tag"), max(col("k")).as(s"k_$tag"),
        min(when(col("cum") >= col("k") + 1, col("__v"))).as(s"lo_$tag"),
        min(when(col("cum") >= col("n") - col("k"), col("__v")))
          .as(s"hi_$tag"),
        sum(dec0(col("__v")) * dec0(inner)).as(s"ts_$tag"),
        sum(dec0(col("__v")) * dec0(col("__v")) * dec0(inner))
          .as(s"tq_$tag"),
        coalesce(sum(inner), lit(0L)).cast("long").as(s"h_$tag"))
    }
    val joined = armStats(0, "a").crossJoin(armStats(1, "b"))
    def leg(tag: String): (Column, Column, Column, Column) = {
      val n = col(s"n_$tag").cast("double")
      val h = col(s"h_$tag").cast("double")
      val k = dec0(col(s"k_$tag"))
      val sw = (k * dec0(col(s"lo_$tag")) + col(s"ts_$tag")
        + k * dec0(col(s"hi_$tag"))).cast("double")
      val sw2 = (k * dec0(col(s"lo_$tag")) * dec0(col(s"lo_$tag"))
        + col(s"tq_$tag")
        + k * dec0(col(s"hi_$tag")) * dec0(col(s"hi_$tag"))).cast("double")
      val ok = col(s"h_$tag") >= 2
      val tmean = when(col(s"h_$tag") > 0,
        col(s"ts_$tag").cast("double") / h)
      val d = when(ok, (sw2 - sw * sw / n) / (h * (h - 1.0)))
      (tmean, d, h, ok)
    }
    val (tma, da, ha, okA) = leg("a")
    val (tmb, db, hb, okB) = leg("b")
    val dsum = da + db
    val cc = da / dsum
    val df_ = lit(1.0) / (cc * cc / (ha - 1.0)
      + (lit(1.0) - cc) * (lit(1.0) - cc) / (hb - 1.0))
    joined.select(
      col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
      col("h_a"), col("h_b"),
      round(tma, 6).as("tmean_a"), round(tmb, 6).as("tmean_b"),
      when(okA && okB && dsum > 0.0,
        round((tmb - tma) / sqrt(dsum), 6)).as("t_stat"),
      when(okA && okB && dsum > 0.0, round(df_, 6)).as("df"))
  }

  /** C96: Kruskal–Wallis H test (Kruskal & Wallis 1952) — the k-arm
    * generalization of C68's rank-sum test: "do ANY of the k variants
    * differ in distribution", the omnibus check an experiment platform
    * runs before pairwise drill-downs (running k² Mann–Whitney tests
    * without it is the classic multiple-comparison trap). H is read
    * against chi-square with k−1 dof; the tie-corrected H' = H / (1 −
    * Σ(t³−t)/(N³−N)) is the published statistic.
    *
    * Same distributed-rank machinery as C68: ONE value-domain count
    * shuffle (per-arm conditional counts ride along), the cumulative on
    * [[PrefixSum.runningSum]] — no unpartitioned window at any
    * cardinality. All-integer core: a tie group's average rank in HALF
    * units is 2·cum − c + 1, so 2·R_i = Σ c_i·(2·cum − c + 1)
    * accumulates exactly in decimal per arm, and the tie census
    * Σ(t³−t) is an exact integer. H folds the k per-arm terms in fixed
    * arm order (one IEEE evaluation, engine-replayable). Degenerate
    * inputs (an empty arm, N < 2, all values tied ⇒ correction 0)
    * publish null.
    */
  def kruskalWallis(df: DataFrame, arm: Column, value: Column,
                    arms: Int = 3): DataFrame = {
    require(arms >= 2 && arms <= 8, s"arms must be in [2,8], got $arms")
    val armLegs = (0 until arms).map(i =>
      sum(when(col("__arm") === i, 1L).otherwise(0L)).as(s"c$i"))
    kruskalWallisFromCounts(df
      .select(arm.cast("int").as("__arm"), value.as("__v"))
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("c"), armLegs: _*), arms)
  }

  /** C96's finisher over an already-counted value-domain frame
    * (__v, c, c0..c_{k−1}) — the single definition the batch face and
    * E35's stream face (additive lake census) both ride.
    */
  def kruskalWallisFromCounts(groups: DataFrame, arms: Int): DataFrame = {
    val cum = PrefixSum.runningSum(groups, col("__v"), col("c"), "cum")
    val half = dec0(col("cum")) * 2 - dec0(col("c")) + 1
    val aggCols = Seq(
      sum(col("c")).cast("long").as("n"),
      sum(dec0(col("c")) * dec0(col("c")) * dec0(col("c")) - dec0(col("c")))
        .as("tie")) ++
      (0 until arms).flatMap(i => Seq(
        sum(col(s"c$i")).cast("long").as(s"n_$i"),
        sum(dec0(col(s"c$i")) * half).as(s"r2_$i")))
    val a = cum.agg(aggCols.head, aggCols.tail: _*)
    val nD = col("n").cast("double")
    // Σ R_i²/n_i with R_i in half units: (2R_i)²/(4·n_i), arm order 0..k−1
    val sumTerm = (0 until arms).map { i =>
      val r = col(s"r2_$i").cast("double")
      r * r / (lit(4.0) * col(s"n_$i").cast("double"))
    }.reduce(_ + _)
    val h = lit(12.0) / (nD * (nD + 1.0)) * sumTerm - lit(3.0) * (nD + 1.0)
    // the correction's denominator divides by zero at n < 2, so it is
    // itself guarded (CaseWhen branches are lazy; And operands aren't)
    val corr = when(col("n") >= 2,
      lit(1.0) - col("tie").cast("double") / (nD * nD * nD - nD))
    val ok = (0 until arms).map(i => col(s"n_$i") > 0L).reduce(_ && _) &&
      col("n") >= 2
    a.select((0 until arms).map(i => col(s"n_$i")) ++ Seq(
      col("n"),
      when(ok, round(h, 6)).as("h_stat"),
      when(ok && corr > 0.0, round(h / corr, 6)).as("h_adj"),
      lit(arms - 1).cast("long").as("dof")): _*)
  }

  /** The shared one-way F finisher behind C97/C99: given per-arm exact
    * sufficient statistics (n_i, Σv_i, Σv_i²) as columns n_i / s_i /
    * ss_i on a one-row frame, appends mean_i, f_stat, df1, df2.
    * SSB = Σ s_i²/n_i − S²/N and SSW = ΣΣv² − Σ s_i²/n_i off exact
    * decimal sums, each Σ over arms folded in fixed arm order — one
    * IEEE evaluation end to end. Degenerate inputs (an empty arm,
    * N ≤ k, zero within variance) publish null F.
    */
  private def fFinish(suff: DataFrame, arms: Int,
                      fName: String): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val nTot = (0 until arms).map(i => col(s"n_$i")).reduce(_ + _)
    val sTot = (0 until arms)
      .map(i => coalesce(col(s"s_$i"), lit(0)).cast(dec38)).reduce(_ + _)
    val ssTot = (0 until arms)
      .map(i => coalesce(col(s"ss_$i"), lit(0)).cast(dec38)).reduce(_ + _)
    // Σ s_i²/n_i: the n_i > 0 guard lives INSIDE each term (ANSI
    // double/0 throws; empty arms null out F below anyway)
    val between = (0 until arms).map { i =>
      val s = col(s"s_$i").cast("double")
      when(col(s"n_$i") > 0, s * s / col(s"n_$i").cast("double"))
        .otherwise(0.0)
    }.reduce(_ + _)
    val nD = nTot.cast("double")
    val grand = when(nTot > 0, sTot.cast("double") * sTot.cast("double") / nD)
    val ssb = between - grand
    val ssw = ssTot.cast("double") - between
    val df1 = arms - 1
    val df2 = (nTot - arms).cast("long")
    val ok = (0 until arms).map(i => col(s"n_$i") > 0L).reduce(_ && _) &&
      df2 > 0L && ssw > 0.0
    val means = (0 until arms).map(i =>
      when(col(s"n_$i") > 0, round(
        col(s"s_$i").cast("double") / col(s"n_$i").cast("double"), 6))
        .as(s"mean_$i"))
    suff.select((0 until arms).map(i => col(s"n_$i")) ++ means ++ Seq(
      when(ok, round((ssb / lit(df1.toDouble))
        / (ssw / df2.cast("double")), 6)).as(fName),
      lit(df1).cast("long").as("df1"), df2.as("df2")): _*)
  }

  /** C97: one-way ANOVA F test (Fisher 1925) across k arms — the
    * mean-level omnibus companion to C96's distribution-level test:
    * "is ANY arm's mean different", read against F(k−1, N−k). The
    * standard first readout of a k-variant experiment on a
    * near-normal metric; C96 is the robust fallback.
    *
    * ONE scan, ZERO data shuffle: 3k conditional-aggregation legs
    * build per-arm (n, Σv, Σv²) as exact integers / decimal sums on an
    * integer-unit metric (cents), then [[fFinish]]'s one-evaluation
    * scalar algebra publishes F.
    */
  def anovaF(df: DataFrame, arm: Column, value: Column,
             arms: Int = 3): DataFrame = {
    require(arms >= 2 && arms <= 8, s"arms must be in [2,8], got $arms")
    val v = dec0(value.cast("long"))
    val aggCols = (0 until arms).flatMap(i => Seq(
      sum(when(arm === i, 1L).otherwise(0L)).cast("long").as(s"n_$i"),
      sum(when(arm === i, v)).as(s"s_$i"),
      sum(when(arm === i, v * v)).as(s"ss_$i")))
    fFinish(df.agg(aggCols.head, aggCols.tail: _*), arms, "f_stat")
  }

  /** C99: Brown–Forsythe variance-homogeneity test (Brown & Forsythe
    * 1974 — Levene's test with the MEDIAN center, the robust variant
    * every stats package defaults to): do the k arms differ in SPREAD?
    * A treatment that leaves the mean alone but widens the tails is
    * invisible to C97 and real to users; this is also the
    * equal-variance precondition audit for pooled-variance readouts.
    * W = one-way F on the absolute deviations z_ij = |v_ij − med_i|.
    *
    * EXACT core on an integer-unit metric: ONE (arm, value)-domain
    * count shuffle; per-arm lower medians (the C94 rank convention
    * (n+1) DIV 2) via conditional MIN off per-arm [[PrefixSum]]
    * cumulatives; z is an exact integer |v − med| with multiplicity c,
    * so the F sufficient statistics are exact decimal sums and
    * [[fFinish]] publishes W in one IEEE evaluation.
    */
  def brownForsythe(df: DataFrame, arm: Column, value: Column,
                    arms: Int = 3): DataFrame = {
    require(arms >= 2 && arms <= 8, s"arms must be in [2,8], got $arms")
    val groups = Materialize.cut(
      df.select(arm.cast("int").as("__arm"), value.cast("long").as("__v"))
        .groupBy(col("__arm"), col("__v")).agg(count(lit(1)).as("c")))
    val medians = (0 until arms).map { a =>
      val g = groups.filter(col("__arm") === a)
      val cum = PrefixSum.runningSum(g, col("__v"), col("c"), "cum")
      val tot = g.agg(coalesce(sum(col("c")), lit(0L)).cast("long").as("n"))
      cum.crossJoin(broadcast(tot))
        .withColumn("__m", expr("CAST((n + 1) DIV 2 AS BIGINT)"))
        .agg(min(when(col("cum") >= col("__m"), col("__v"))).as("med"))
        .select(lit(a).as("__arm"), col("med"))
    }.reduce(_ unionAll _)
    val dev = groups.join(broadcast(medians), Seq("__arm"))
      .withColumn("__z", abs(col("__v") - col("med")))
    val z = dec0(col("__z")); val c = dec0(col("c"))
    val aggCols = (0 until arms).flatMap(i => Seq(
      coalesce(sum(when(col("__arm") === i, col("c"))), lit(0L))
        .cast("long").as(s"n_$i"),
      sum(when(col("__arm") === i, z * c)).as(s"s_$i"),
      sum(when(col("__arm") === i, z * z * c)).as(s"ss_$i"))) ++
      (0 until arms).map(i =>
        min(when(col("__arm") === i, col("med"))).as(s"med_$i"))
    val suff = dev.agg(aggCols.head, aggCols.tail: _*)
    fFinish(suff, arms, "w_stat")
      .crossJoin(broadcast(
        suff.select((0 until arms).map(i => col(s"med_$i")): _*)))
      .select(((0 until arms).map(i => col(s"n_$i")) ++
        (0 until arms).map(i => col(s"med_$i")) ++
        Seq(col("w_stat"), col("df1"), col("df2"))): _*)
  }

  /** C87: delta-method z-test on a RATIO metric (Fieller 1940 lineage;
    * Deng, Knoblich & Lu 2018 for the A/B formulation) — the readout
    * for "revenue per session"-shaped metrics where the analysis unit
    * (user) differs from the metric's denominator (events): the naive
    * per-event t-test is wrong because events within a user correlate.
    * R̂ = ΣY/ΣX per arm over per-UNIT aggregates (x_i, y_i), with
    * Var(R̂) ≈ (s_y² − 2R̂·s_xy + R̂²·s_x²) / (n·x̄²) by the delta
    * method, and z = (R̂₁−R̂₀)/√(V₁+V₀).
    *
    * Input is the per-unit frame (one row per randomization unit).
    * ONE scan, ONE output row: conditional-aggregation legs build the
    * 12 sufficient statistics as exact decimal sums (associative ⇒
    * partition-order-free); every published number is one IEEE
    * evaluation over those exact aggregates. Degenerate arms (n < 2,
    * zero denominator mass, zero variance) publish null z rather than
    * ±Inf.
    */
  def ratioDelta(units: DataFrame, arm: Column, x: Column,
                 y: Column): DataFrame = {
    val a0 = arm === 0; val a1 = arm === 1
    val xd = Num.dec2(x); val yd = Num.dec2(y)
    val agg = units.agg(
      sum(when(a0, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when(a1, 1L).otherwise(0L)).cast("long").as("n_b"),
      sum(when(a0, xd)).as("sxa"), sum(when(a1, xd)).as("sxb"),
      sum(when(a0, yd)).as("sya"), sum(when(a1, yd)).as("syb"),
      sum(when(a0, xd * xd)).as("sxxa"), sum(when(a1, xd * xd)).as("sxxb"),
      sum(when(a0, xd * yd)).as("sxya"), sum(when(a1, xd * yd)).as("sxyb"),
      sum(when(a0, yd * yd)).as("syya"), sum(when(a1, yd * yd)).as("syyb"))
    def leg(n: Column, sx: Column, sy: Column, sxx: Column, sxy: Column,
            syy: Column): (Column, Column, Column) = {
      val nD = n.cast("double")
      val sxD = sx.cast("double"); val syD = sy.cast("double")
      val r = when(sxD =!= 0.0, syD / sxD)
      val ok = n >= 2 && sxD =!= 0.0
      val vx = (sxx.cast("double") - sxD * sxD / nD) / (nD - 1.0)
      val vy = (syy.cast("double") - syD * syD / nD) / (nD - 1.0)
      val cxy = (sxy.cast("double") - sxD * syD / nD) / (nD - 1.0)
      val xbar = sxD / nD
      val vr = when(ok,
        (vy - lit(2.0) * r * cxy + r * r * vx) / (nD * xbar * xbar))
      (r, vr, n.cast("long"))
    }
    val (ra, va, _) = leg(col("n_a"), col("sxa"), col("sya"),
      col("sxxa"), col("sxya"), col("syya"))
    val (rb, vb, _) = leg(col("n_b"), col("sxb"), col("syb"),
      col("sxxb"), col("sxyb"), col("syyb"))
    val se2 = va + vb
    agg.select(col("n_a"), col("n_b"),
      round(ra, 6).as("ratio_a"), round(rb, 6).as("ratio_b"),
      when(ra.isNotNull && rb.isNotNull, round(rb - ra, 6)).as("diff"),
      when(se2 > 0.0, round((rb - ra) / sqrt(se2), 6)).as("z_stat"))
  }

  /** C100: McNemar's test for paired binary outcomes (McNemar 1947) —
    * "did the same population's conversion CHANGE between two
    * conditions", the within-subject design where a two-proportion z
    * test is simply wrong (the samples aren't independent). Only the
    * DISCORDANT pairs carry information: χ² = (b−c)²/(b+c), plus the
    * Edwards continuity-corrected (|b−c|−1)²/(b+c), both read against
    * chi-square with 1 dof.
    *
    * ONE scan, ZERO data shuffle: four conditional-count legs → one
    * scalar partial-agg merge; every cell an exact integer, each χ²
    * one IEEE divide. b+c = 0 (no discordant pairs) publishes null.
    */
  def mcnemar(df: DataFrame, before: Column, after: Column): DataFrame = {
    val a = coalesce(before, lit(false))
    val b = coalesce(after, lit(false))
    val agg = df.agg(
      count(lit(1)).cast("long").as("n"),
      sum(when(a && b, 1L).otherwise(0L)).cast("long").as("n_both"),
      sum(when(a && !b, 1L).otherwise(0L)).cast("long").as("n_before_only"),
      sum(when(!a && b, 1L).otherwise(0L)).cast("long").as("n_after_only"),
      sum(when(!a && !b, 1L).otherwise(0L)).cast("long").as("n_neither"))
    val bD = col("n_before_only").cast("double")
    val cD = col("n_after_only").cast("double")
    val disc = col("n_before_only") + col("n_after_only")
    agg.select(col("n"), col("n_both"), col("n_before_only"),
      col("n_after_only"), col("n_neither"),
      when(disc > 0L,
        round((bD - cD) * (bD - cD) / (bD + cD), 6)).as("chi2"),
      when(disc > 0L,
        round((abs(bD - cD) - 1.0) * (abs(bD - cD) - 1.0) / (bD + cD), 6))
        .as("chi2_cc"),
      lit(1L).as("dof"))
  }

  /** C101: Cochran's Q test (Cochran 1950) — the k-treatment
    * generalization of C100: "does success rate differ across k
    * related conditions measured on the SAME blocks" (k periods ×
    * same users here). Q = (k−1)·(k·ΣC_j² − T²)/(k·T − ΣR_i²), read
    * against chi-square with k−1 dof; blocks with all-0 or all-k
    * rows contribute zero to both numerator and denominator, so the
    * census needs no filtering.
    *
    * ONE scan, ZERO data shuffle: per-block row sums R_i are
    * row-local expressions, the k column sums and ΣR_i² fold into one
    * scalar partial-agg merge; EVERYTHING except the final divide is
    * an exact integer. Zero denominator (every block constant)
    * publishes null.
    */
  def cochranQ(df: DataFrame, flags: Seq[Column]): DataFrame = {
    val k = flags.length
    require(k >= 2 && k <= 8, s"need 2..8 flag columns, got $k")
    val fs = flags.map(f => when(coalesce(f, lit(false)), 1L).otherwise(0L))
    val rowSum = fs.reduce(_ + _)
    val aggCols = Seq(
      count(lit(1)).cast("long").as("n_blocks"),
      sum(rowSum).cast("long").as("t"),
      sum(rowSum * rowSum).cast("long").as("r2")) ++
      fs.zipWithIndex.map { case (f, i) => sum(f).cast("long").as(s"c_$i") }
    val agg = df.agg(aggCols.head, aggCols.tail: _*)
    val sumC2 = (0 until k)
      .map(i => col(s"c_$i").cast("double") * col(s"c_$i").cast("double"))
      .reduce(_ + _)
    val tD = col("t").cast("double")
    val den = lit(k.toDouble) * tD - col("r2").cast("double")
    agg.select(Seq(col("n_blocks")) ++
      (0 until k).map(i => col(s"c_$i")) ++ Seq(
      when(den > 0.0, round(lit((k - 1).toDouble)
        * (lit(k.toDouble) * sumC2 - tD * tD) / den, 6)).as("q_stat"),
      lit((k - 1).toLong).as("dof")): _*)
  }

  /** C102: Friedman's test (Friedman 1937) — the rank-based k-period
    * within-block omnibus: "does the metric LEVEL differ across k
    * related conditions", robust to the heavy-tailed per-user spend
    * C96 handles across independent arms. Values rank WITHIN each
    * block (average ranks on ties, half-unit integers); Q =
    * 3·ΣR2_j²/(N·k·(k+1)) − 3·N·(k+1) with R2_j = 2·R_j, read against
    * chi-square with k−1 dof; the tie-corrected Q' = Q / (1 −
    * Σ(t³−t)/(N·k·(k²−1))) is the published statistic.
    *
    * Scale shape: the k values per block are ROW-LOCAL columns, so
    * ranks are pure per-row expressions (2·r_j = 2 + 2·#{less} +
    * #{tied others} — no window, no shuffle); the column rank sums,
    * the tie census Σ(t³−t) (row-local too, via the pair identity
    * documented at [[friedman]]'s tieCensus), and N fold into ONE
    * scalar partial-agg merge; every term an exact integer until the
    * final divides. All-constant input (C ≤ 0) publishes null Q'.
    */
  def friedman(df: DataFrame, values: Seq[Column]): DataFrame = {
    val k = values.length
    require(k >= 2 && k <= 6, s"need 2..6 value columns, got $k")
    val vs = values.map(v => coalesce(v.cast("long"), lit(0L)))
    // half-unit rank of column j within its block:
    // 2·r_j = 2 + 2·#{l: v_l < v_j} + #{l≠j: v_l = v_j}
    def r2(j: Int): Column = {
      val less = (0 until k).filter(_ != j)
        .map(l => when(vs(l) < vs(j), 1L).otherwise(0L))
        .foldLeft(lit(0L))(_ + _)
      val tied = (0 until k).filter(_ != j)
        .map(l => when(vs(l) === vs(j), 1L).otherwise(0L))
        .foldLeft(lit(0L))(_ + _)
      lit(2L) + lit(2L) * less + tied
    }
    // per-block tie census Σ(t³−t): each UNORDERED tied pair (a,b)
    // sits in exactly one tie group of size t, and a group of size t
    // holds t(t−1)/2 pairs, so Σ_groups (t³−t) = Σ_groups t(t−1)(t+1)
    // = Σ_pairs 2·(t+1) where t is the pair's group size; the pair's
    // group size is 2 + #{others equal to both} — row-local.
    val tieCensus = {
      val pairs = for { a <- 0 until k; b <- a + 1 until k } yield {
        val grpSize = lit(2L) + (0 until k)
          .filter(l => l != a && l != b)
          .map(l => when(vs(l) === vs(a), 1L).otherwise(0L))
          .foldLeft(lit(0L))(_ + _)
        when(vs(a) === vs(b), lit(2L) * (grpSize + 1L)).otherwise(0L)
      }
      pairs.reduce(_ + _)
    }
    val aggCols = Seq(
      count(lit(1)).cast("long").as("n_blocks"),
      sum(tieCensus).cast("long").as("tie")) ++
      (0 until k).map(j => sum(r2(j)).cast("long").as(s"r2_$j"))
    val agg = df.agg(aggCols.head, aggCols.tail: _*)
    val nD = col("n_blocks").cast("double")
    val sumR2sq = (0 until k)
      .map(j => col(s"r2_$j").cast("double") * col(s"r2_$j").cast("double"))
      .reduce(_ + _)
    val q = lit(3.0) * sumR2sq / (nD * lit(k.toDouble) * lit((k + 1).toDouble)) -
      lit(3.0) * nD * lit((k + 1).toDouble)
    val corr = when(col("n_blocks") > 0L,
      lit(1.0) - col("tie").cast("double")
        / (nD * lit(k.toDouble) * lit((k * k - 1).toDouble)))
    agg.select(Seq(col("n_blocks")) ++
      (0 until k).map(j =>
        (col(s"r2_$j").cast("double") / 2.0).as(s"rank_sum_$j")) ++ Seq(
      when(col("n_blocks") > 0L, round(q, 6)).as("q_stat"),
      when(corr > 0.0, round(q / corr, 6)).as("q_adj"),
      lit((k - 1).toLong).as("dof")): _*)
  }

  /** C120: post-stratified mean estimate + variance-reduction report
    * (Holt & Smith 1979; the survey-sampling classic the A/B world
    * rediscovered next to CUPED) — estimate the POPULATION mean of a
    * metric observed only on responders by reweighting per-stratum
    * responder means to the KNOWN population stratum shares:
    * ŷ_ps = Σ(N_k/N)·ȳ_k with Var_ps = Σ(N_k/N)²·s_k²/n_k, against
    * the raw responder mean whose nonresponse bias this removes.
    * The sensitivity row: var_ratio < 1 quantifies what the
    * stratification bought.
    *
    * Input is one row per POPULATION unit with a response indicator.
    * ONE scan, ZERO data shuffle past the caller's unit collapse:
    * 3k+k conditional exact sums → one scalar merge; every mean and
    * variance one IEEE tree, strata folded in fixed order. Strata
    * with n_k < 2 responders null the variance report.
    */
  def postStratifiedMean(df: DataFrame, stratum: Column,
                         responded: Column, value: Column,
                         strata: Int = 3): DataFrame = {
    require(strata >= 2 && strata <= 8, s"strata in [2,8], got $strata")
    val st = stratum.cast("int")
    val resp = coalesce(responded, lit(false))
    val v = dec0(value.cast("long"))
    val aggCols = (0 until strata).flatMap(k => Seq(
      sum(when(st === k, 1L).otherwise(0L)).cast("long").as(s"bn_$k"),
      sum(when(st === k && resp, 1L).otherwise(0L)).cast("long")
        .as(s"n_$k"),
      sum(when(st === k && resp, v)).as(s"s_$k"),
      sum(when(st === k && resp, v * v)).as(s"ss_$k")))
    val a = df.agg(aggCols.head, aggCols.tail: _*)
    val bigN = (0 until strata).map(k => col(s"bn_$k")).reduce(_ + _)
    val nResp = (0 until strata).map(k => col(s"n_$k")).reduce(_ + _)
    val sTot = (0 until strata)
      .map(k => coalesce(col(s"s_$k"), lit(0).cast(DecimalType(38, 0))))
      .reduce(_ + _)
    val ssTot = (0 until strata)
      .map(k => coalesce(col(s"ss_$k"), lit(0).cast(DecimalType(38, 0))))
      .reduce(_ + _)
    val bigND = bigN.cast("double"); val nD = nResp.cast("double")
    val psMean = (0 until strata).map { k =>
      val w = col(s"bn_$k").cast("double") / bigND
      w * (col(s"s_$k").cast("double") / col(s"n_$k").cast("double"))
    }.reduce(_ + _)
    val psVar = (0 until strata).map { k =>
      val w = col(s"bn_$k").cast("double") / bigND
      val sk = col(s"s_$k").cast("double")
      val s2 = (col(s"ss_$k").cast("double") - sk * sk
        / col(s"n_$k").cast("double")) / (col(s"n_$k").cast("double") - 1.0)
      w * w * s2 / col(s"n_$k").cast("double")
    }.reduce(_ + _)
    val rawMean = sTot.cast("double") / nD
    val rawVar = ((ssTot.cast("double")
      - sTot.cast("double") * sTot.cast("double") / nD) / (nD - 1.0)) / nD
    val ok = (0 until strata).map(k => col(s"n_$k") >= 2L).reduce(_ && _)
    a.select((0 until strata).map(k => col(s"n_$k")) ++ Seq(
      bigN.as("n_population"), nResp.as("n_responders"),
      when(nResp > 0L, round(rawMean, 6)).as("raw_mean"),
      when((0 until strata).map(k => col(s"n_$k") > 0L).reduce(_ && _),
        round(psMean, 6)).as("ps_mean"),
      when(ok && rawVar > 0.0, round(psVar / rawVar, 6))
        .as("var_ratio")): _*)
  }

  /** C116: Wilcoxon signed-rank test (Wilcoxon 1945; the standard
    * zero-drop convention — zero differences are discarded before
    * ranking, Wilcoxon's original treatment (Pratt 1959 is the
    * zero-INCLUDED variant, NOT what this implements); average ranks
    * on |d| ties) — the paired
    * MAGNITUDE test between C100's paired-binary McNemar and C68's
    * independent-samples rank sum: "did the SAME users' spend level
    * shift", robust to whales, using how FAR each user moved where
    * the sign test (C117) only counts directions. W⁺ = Σ ranks of
    * |d| over d > 0; E = n(n+1)/4; Var = n(n+1)(2n+1)/24 − Σ(t³−t)/48.
    *
    * Distributed-rank machinery (the C68/C96 ledger) on the |d|
    * value domain: ONE count shuffle with the positive-count rider,
    * cumulative on [[PrefixSum]]; 2W⁺ = Σ cp·(2·cum − c + 1)
    * accumulates exactly, the tie census is an exact integer, z is
    * one IEEE evaluation. All-zero or all-tied inputs publish null.
    */
  def wilcoxonSignedRank(df: DataFrame, diff: Column): DataFrame = {
    val nz = df.select(diff.cast("long").as("__d"))
      .filter(col("__d") =!= 0L)
      .select(abs(col("__d")).as("__a"),
        when(col("__d") > 0L, 1L).otherwise(0L).as("__p"))
    val groups = nz.groupBy(col("__a"))
      .agg(count(lit(1)).as("c"), sum(col("__p")).as("cp"))
    val cum = PrefixSum.runningSum(groups, col("__a"), col("c"), "cum")
    val half = dec0(col("cum")) * 2 - dec0(col("c")) + 1
    val a = cum.agg(
      coalesce(sum(col("c")), lit(0L)).cast("long").as("n"),
      coalesce(sum(col("cp")), lit(0L)).cast("long").as("n_pos"),
      coalesce(sum(dec0(col("cp")) * half), lit(0).cast("decimal(38,0)"))
        .as("__w2"),
      coalesce(sum(dec0(col("c")) * dec0(col("c")) * dec0(col("c"))
        - dec0(col("c"))), lit(0).cast("decimal(38,0)")).as("__tie"))
    val nD = col("n").cast("double")
    val vr = nD * (nD + 1.0) * (lit(2.0) * nD + 1.0) / 24.0 -
      col("__tie").cast("double") / 48.0
    // __w2 = 2W⁺ and n(n+1) = 4E, so W⁺ − E = (2·__w2 − n(n+1))/4
    // — exact integers until the single final divide
    val e4 = dec0(col("n")) * (dec0(col("n")) + 1)
    val num = (col("__w2") * 2 - e4).cast("double") / 4.0
    a.select(col("n").as("n_nonzero"), col("n_pos"),
      (col("__w2").cast("double") / 2.0).as("w_plus"),
      when(col("n") > 0L && vr > 0.0, round(num / sqrt(vr), 6))
        .as("z_stat"))
  }

  /** C117: the sign test (Arbuthnott 1710 lineage; the modern paired
    * form) — direction-only paired comparison: of the m users whose
    * spend CHANGED, how unbalanced are the directions?
    * z = (2P − m)/√m against the fair-coin null. The assumption-free
    * floor under C116: it ignores magnitudes entirely, so not even a
    * rank can be distorted.
    *
    * ONE scan, ZERO data shuffle: two conditional counts → one IEEE
    * evaluation. m = 0 publishes null.
    */
  def signTest(df: DataFrame, diff: Column): DataFrame = {
    val d = diff.cast("long")
    val a = df.agg(
      sum(when(d =!= 0L, 1L).otherwise(0L)).cast("long").as("m"),
      sum(when(d > 0L, 1L).otherwise(0L)).cast("long").as("n_pos"))
    val mD = col("m").cast("double"); val pD = col("n_pos").cast("double")
    a.select(col("m").as("n_nonzero"), col("n_pos"),
      when(col("m") > 0L,
        round((lit(2.0) * pD - mD) / sqrt(mD), 6)).as("z_stat"))
  }

  /** C115: Cochran–Mantel–Haenszel test + Mantel–Haenszel common odds
    * ratio (Cochran 1954; Mantel & Haenszel 1959) — "is treatment
    * associated with success CONTROLLING for a stratifying confound":
    * the stratified 2×2 readout that defuses Simpson's paradox, the
    * trap a pooled C66-style comparison walks straight into when arm
    * mix shifts across strata. Per stratum k: E = n₁ₖm₁ₖ/nₖ,
    * V = n₁ₖn₀ₖm₁ₖm₀ₖ/(nₖ²(nₖ−1)); CMH = (Σa − ΣE)²/ΣV (χ², 1 dof,
    * no continuity — the documented convention), and
    * OR_MH = Σ(aₖdₖ/nₖ)/Σ(bₖcₖ/nₖ).
    *
    * ONE scan, ZERO data shuffle: 4k conditional-count legs → one
    * scalar merge; every cell an exact integer; the k per-stratum
    * terms fold in FIXED stratum order (one IEEE tree each for ΣE,
    * ΣV, and both OR legs). Degenerate strata (nₖ ≤ 1) contribute
    * zero variance; ΣV = 0 or an empty OR denominator publish null.
    */
  def cmhTest(df: DataFrame, stratum: Column, arm: Column,
              success: Column, strata: Int = 3): DataFrame = {
    require(strata >= 2 && strata <= 8, s"strata in [2,8], got $strata")
    val st = stratum.cast("int")
    val isB = arm.cast("int") === 1
    val s = coalesce(success, lit(false))
    val aggCols = (0 until strata).flatMap(k => Seq(
      sum(when(st === k && isB && s, 1L).otherwise(0L)).cast("long")
        .as(s"a_$k"),
      sum(when(st === k && isB && !s, 1L).otherwise(0L)).cast("long")
        .as(s"b_$k"),
      sum(when(st === k && !isB && s, 1L).otherwise(0L)).cast("long")
        .as(s"c_$k"),
      sum(when(st === k && !isB && !s, 1L).otherwise(0L)).cast("long")
        .as(s"d_$k")))
    val agg = df.agg(aggCols.head, aggCols.tail: _*)
    def nk(k: Int): Column =
      ((col(s"a_$k") + col(s"b_$k")) + (col(s"c_$k") + col(s"d_$k")))
    val sumA = (0 until strata).map(k => col(s"a_$k")).reduce(_ + _)
    val sumE = (0 until strata).map { k =>
      val n1 = (col(s"a_$k") + col(s"b_$k")).cast("double")
      val m1 = (col(s"a_$k") + col(s"c_$k")).cast("double")
      val nD = nk(k).cast("double")
      when(nk(k) > 0L, n1 * m1 / nD).otherwise(0.0)
    }.reduce(_ + _)
    val sumV = (0 until strata).map { k =>
      val n1 = (col(s"a_$k") + col(s"b_$k")).cast("double")
      val n0 = (col(s"c_$k") + col(s"d_$k")).cast("double")
      val m1 = (col(s"a_$k") + col(s"c_$k")).cast("double")
      val m0 = (col(s"b_$k") + col(s"d_$k")).cast("double")
      val nD = nk(k).cast("double")
      when(nk(k) > 1L,
        n1 * n0 * m1 * m0 / (nD * nD * (nD - 1.0))).otherwise(0.0)
    }.reduce(_ + _)
    val orNum = (0 until strata).map { k =>
      when(nk(k) > 0L, (col(s"a_$k") * col(s"d_$k")).cast("double")
        / nk(k).cast("double")).otherwise(0.0)
    }.reduce(_ + _)
    val orDen = (0 until strata).map { k =>
      when(nk(k) > 0L, (col(s"b_$k") * col(s"c_$k")).cast("double")
        / nk(k).cast("double")).otherwise(0.0)
    }.reduce(_ + _)
    val dev = sumA.cast("double") - sumE
    agg.select((0 until strata).map(k => col(s"a_$k")) ++ Seq(
      sumA.as("sum_a"),
      when(sumV > 0.0, round(dev * dev / sumV, 6)).as("cmh_chi2"),
      when(orDen > 0.0, round(orNum / orDen, 6)).as("or_mh"),
      lit(1L).as("dof")): _*)
  }

  /** C114: k-sample Anderson–Darling test (Scholz & Stephens 1987,
    * the tie-adjusted midrank statistic A²akN) — the distribution
    * omnibus that weighs the TAILS where C70's KS weighs the middle:
    * the test that catches "same median, same spread, different
    * extremes", which is exactly how whale-driven revenue arms
    * differ. With distinct pooled values z_j (multiplicity l_j),
    * midrank cumulatives B̄_j (pooled) and M̄_aj (arm a):
    * A² = (N−1)/N · Σ_a (1/n_a) Σ_j (l_j/N)·(N·M̄_aj − n_a·B̄_j)² /
    * (B̄_j(N−B̄_j) − N·l_j/4).
    *
    * EXACT integer core via the half-unit trick (C96's ledger):
    * 2B̄_j = 2·cum_j − l_j and 2M̄_aj = 2·cum_aj − l_aj are integers,
    * and the per-(arm, value) term collapses to the integer ratio
    * l_j·(N·m2 − n_a·b2)² / (N·(2·b2·N − b2² − N·l_j)) — ONE IEEE
    * divide over decimal-exact operands. Terms are NONNEGATIVE, so
    * they nano-quantize (HALF_UP ≡ half-away-from-zero) and sum as
    * EXACT INTEGERS per arm — associative, partition-order-free, NO
    * value-ordered collect at any cardinality (the D119 convention);
    * the k per-arm sums fold in fixed arm order.
    *
    * Scale shape: ONE value-domain count shuffle with per-arm legs
    * riding along (the C96 frame); ALL k+1 cumulatives ride ONE
    * [[PrefixSum.runningSums]] pass (one range shuffle, however many
    * riders); one scalar merge. Decimal headroom
    * bounds the observation count at N ≲ 3·10⁷ (l·(N·m2)² ≤ 4N⁵ must
    * stay under 10³⁸) — beyond that, pre-bucket the value domain (the
    * C17/C19 sketch path, a documented dial). Degenerate inputs (an
    * empty arm, a single distinct value) publish null.
    */
  def andersonDarlingK(df: DataFrame, arm: Column, value: Column,
                       arms: Int = 3): DataFrame = {
    require(arms >= 2 && arms <= 8, s"arms must be in [2,8], got $arms")
    val armLegs = (0 until arms).map(i =>
      sum(when(col("__arm") === i, 1L).otherwise(0L)).as(s"c$i"))
    andersonDarlingFromCounts(Materialize.cut(df
      .select(arm.cast("int").as("__arm"), value.as("__v"))
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("c"), armLegs: _*)), arms)
  }

  /** C114's finisher over an already-counted value-domain frame
    * (__v, c, c0..c_{k−1}) — the single definition the batch face and
    * E34's stream face (which maintains the per-(value, arm) counts
    * additively in the lake) both ride, the `benfordFromCounts`
    * pattern.
    */
  def andersonDarlingFromCounts(groups: DataFrame,
                                arms: Int): DataFrame = {
    val withCum = PrefixSum.runningSums(groups, col("__v"),
      (col("c") -> "cum") +:
        (0 until arms).map(i => col(s"c$i") -> s"cum$i"))
    val totCols = Seq(
      coalesce(sum(col("c")), lit(0L)).cast("long").as("n"),
      count(lit(1)).cast("long").as("n_distinct")) ++
      (0 until arms).map(i =>
        coalesce(sum(col(s"c$i")), lit(0L)).cast("long").as(s"n_$i"))
    val tot = groups.agg(totCols.head, totCols.tail: _*)
    val termed = withCum.crossJoin(broadcast(tot))
    val b2 = dec0(col("cum")) * 2 - dec0(col("c"))
    val nDec = dec0(col("n"))
    // 4·denominator of the j-th value's shared factor:
    // N·(2·b2·N − b2² − N·l) — zero only when l_j = N (single value)
    val den = nDec * (b2 * nDec * 2 - b2 * b2 - nDec * dec0(col("c")))
    val nanoCols = (0 until arms).map { i =>
      val m2 = dec0(col(s"cum$i")) * 2 - dec0(col(s"c$i"))
      val num = dec0(col("c")) *
        (nDec * m2 - dec0(col(s"n_$i")) * b2) *
        (nDec * m2 - dec0(col(s"n_$i")) * b2)
      sum(when(den.cast("double") > 0.0,
        round(num.cast("double") / den.cast("double") * lit(1e9), 0)
          .cast("long")).otherwise(0L)).cast("long").as(s"ns_$i")
    }
    val sums = termed.agg(nanoCols.head, nanoCols.tail: _*)
      .crossJoin(broadcast(tot))
    val inner = (0 until arms).map { i =>
      col(s"ns_$i").cast("double") / lit(1e9) /
        col(s"n_$i").cast("double")
    }.reduce(_ + _)
    val nD = col("n").cast("double")
    val ok = (0 until arms).map(i => col(s"n_$i") > 0L).reduce(_ && _) &&
      col("n_distinct") > 1L
    sums.select((0 until arms).map(i => col(s"n_$i")) ++ Seq(
      col("n"), col("n_distinct"),
      when(ok, round((nD - 1.0) / nD * inner, 6)).as("a2_stat"),
      lit((arms - 1).toLong).as("dof")): _*)
  }

  /** C112: Cochran–Armitage trend test (Cochran 1954; Armitage 1955)
    * — "does the SUCCESS RATE trend across k ORDERED groups": the
    * proportions companion to C110's within-block rank trend, read as
    * z (or z² against χ²(1)). With integer scores s_i = i+1:
    * T = Σs_i·r_i − R·(Σs_i·n_i)/N and
    * Var = (R/N)(1−R/N)·[Σs_i²·n_i − (Σs_i·n_i)²/N]. The 2×k χ²
    * (C109's shape) ignores the ORDER; this is the test that knows
    * tertile 3 > tertile 1 means something.
    *
    * ONE scan, ZERO data shuffle: 2k conditional-count legs → one
    * scalar merge; every moment an exact integer, z one IEEE tree.
    * Degenerate inputs (all success / all failure / single group
    * carrying everything) publish null.
    */
  def cochranArmitage(df: DataFrame, group: Column, success: Column,
                      k: Int = 3): DataFrame = {
    require(k >= 2 && k <= 8, s"k must be in [2,8], got $k")
    val g = group.cast("int")
    val s = when(coalesce(success, lit(false)), 1L).otherwise(0L)
    val aggCols = (0 until k).flatMap(i => Seq(
      sum(when(g === i, 1L).otherwise(0L)).cast("long").as(s"n_$i"),
      sum(when(g === i, s).otherwise(0L)).cast("long").as(s"r_$i")))
    val a = df.agg(aggCols.head, aggCols.tail: _*)
    val nTot = (0 until k).map(i => col(s"n_$i")).reduce(_ + _)
    val rTot = (0 until k).map(i => col(s"r_$i")).reduce(_ + _)
    val sr = (0 until k).map(i => col(s"r_$i") * (i + 1).toLong)
      .reduce(_ + _)
    val sn = (0 until k).map(i => col(s"n_$i") * (i + 1).toLong)
      .reduce(_ + _)
    val ssn = (0 until k)
      .map(i => col(s"n_$i") * ((i + 1) * (i + 1)).toLong)
      .reduce(_ + _)
    val nD = nTot.cast("double"); val rD = rTot.cast("double")
    val p = rD / nD
    val t = sr.cast("double") - rD * sn.cast("double") / nD
    val vr = p * (lit(1.0) - p) *
      (ssn.cast("double") - sn.cast("double") * sn.cast("double") / nD)
    val ok = nTot > 0L && rTot > 0L && rTot < nTot && vr > 0.0
    a.select((0 until k).map(i => col(s"n_$i")) ++
      (0 until k).map(i => col(s"r_$i")) ++ Seq(
      when(ok, round(t / sqrt(vr), 6)).as("z_stat"),
      when(ok, round(t * t / vr, 6)).as("chi2"),
      lit(1L).as("dof")): _*)
  }

  /** C110: Page's trend test (Page 1963) — the ORDERED-alternative
    * companion to C102: Friedman asks "do the k periods differ at
    * all", Page asks "do they INCREASE in the given order" (spend
    * drifting up across the month's tertiles), which has far more
    * power when the order is the hypothesis. L = Σ_j j·R_j over the
    * within-block average ranks; z = (L − Nk(k+1)²/4) /
    * √(Nk²(k+1)(k²−1)/144) under the classical no-trend null
    * (average-rank ties by the standard convention).
    *
    * Same zero-shuffle shape as C102: half-unit ranks are row-local,
    * L2 = Σ_j j·R2_j accumulates as an EXACT INTEGER, and z is one
    * IEEE evaluation. Blocks must be complete rows (k value columns).
    */
  def pageTrend(df: DataFrame, values: Seq[Column]): DataFrame = {
    val k = values.length
    require(k >= 3 && k <= 6, s"need 3..6 value columns, got $k")
    val vs = values.map(v => coalesce(v.cast("long"), lit(0L)))
    def r2(j: Int): Column = {
      val less = (0 until k).filter(_ != j)
        .map(l => when(vs(l) < vs(j), 1L).otherwise(0L))
        .foldLeft(lit(0L))(_ + _)
      val tied = (0 until k).filter(_ != j)
        .map(l => when(vs(l) === vs(j), 1L).otherwise(0L))
        .foldLeft(lit(0L))(_ + _)
      lit(2L) + lit(2L) * less + tied
    }
    val aggCols = Seq(count(lit(1)).cast("long").as("n_blocks")) ++
      (0 until k).map(j => sum(r2(j)).cast("long").as(s"r2_$j"))
    val a = df.agg(aggCols.head, aggCols.tail: _*)
    // L2 = 2L: Σ (j+1)·R2_j exact
    val l2 = (0 until k).map(j => col(s"r2_$j") * (j + 1).toLong)
      .reduce(_ + _)
    val nD = col("n_blocks").cast("double")
    val lD = l2.cast("double") / 2.0
    val eL = nD * lit((k * (k + 1) * (k + 1)).toDouble) / 4.0
    val vL = nD * lit((k * k * (k + 1) * (k * k - 1)).toDouble) / 144.0
    a.select(Seq(col("n_blocks")) ++
      (0 until k).map(j =>
        (col(s"r2_$j").cast("double") / 2.0).as(s"rank_sum_$j")) ++ Seq(
      (l2.cast("double") / 2.0).as("l_stat"),
      when(col("n_blocks") > 0L && vL > 0.0,
        round((lD - eL) / sqrt(vL), 6)).as("z_stat")): _*)
  }

  /** C111: power / minimum-detectable-effect report (Cohen 1988's
    * power algebra; the experiment-platform "how big must the lift be
    * before this test can see it" number): MDE at power 1−β =
    * (z_{α/2} + z_β)·√(s²·(1/n₀+1/n₁)) with the POOLED variance —
    * published at 80% and 90% power, α = 5%, absolute and relative
    * to the control mean. Running an A/B readout without this row is
    * how underpowered "no significant difference" gets mistaken for
    * "no difference".
    *
    * ONE scan, ZERO data shuffle: six conditional exact sums → one
    * scalar merge; the z-constants are shared plan/oracle literals
    * (the C94 convention); every published number one IEEE tree.
    * Degenerate inputs (an arm below 2, zero variance) publish null.
    */
  def powerMde(df: DataFrame, arm: Column, value: Column): DataFrame = {
    val v = dec0(value.cast("long"))
    val isB = arm.cast("int") === 1
    val agg = df.agg(
      sum(when(!isB, 1L).otherwise(0L)).cast("long").as("n_a"),
      sum(when(isB, 1L).otherwise(0L)).cast("long").as("n_b"),
      sum(when(!isB, v)).as("sa"), sum(when(isB, v)).as("sb"),
      sum(when(!isB, v * v)).as("ssa"), sum(when(isB, v * v)).as("ssb"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val saD = col("sa").cast("double"); val sbD = col("sb").cast("double")
    val pooled = (col("ssa").cast("double") - saD * saD / na
      + (col("ssb").cast("double") - sbD * sbD / nb)) / (na + nb - 2.0)
    val se = sqrt(pooled * (lit(1.0) / na + lit(1.0) / nb))
    val zA = lit(1.959963984540054)  // z_{0.025}
    val z80 = lit(0.8416212335729143) // z_{0.20}
    val z90 = lit(1.2815515655446004) // z_{0.10}
    val meanA = saD / na
    val ok = col("n_a") >= 2L && col("n_b") >= 2L && pooled > 0.0
    agg.select(col("n_a"), col("n_b"),
      when(col("n_a") > 0L, round(meanA, 6)).as("mean_a"),
      when(ok, round(sqrt(pooled), 6)).as("pooled_sd"),
      when(ok, round((zA + z80) * se, 6)).as("mde_abs_80"),
      when(ok, round((zA + z90) * se, 6)).as("mde_abs_90"),
      when(ok && meanA > 0.0,
        round((zA + z80) * se / meanA, 6)).as("mde_rel_80"))
  }

  /** C109: Mood's median test (Mood 1950; Brown & Mood 1951) — the
    * k-arm "are the MEDIANS equal" omnibus: counts above vs not-above
    * the POOLED median per arm, χ²(k−1) on the resulting 2×k table.
    * The maximally-robust (if low-power) companion to C96/C97: only
    * the side of the pooled median matters, so no whale can move it.
    *
    * ONE value-domain count shuffle with per-arm conditional counts
    * riding along (the C96 recipe); the pooled LOWER median (the
    * C94/C99 convention) via the distributed [[PrefixSum]] cumulative
    * and one conditional MIN; cells and margins exact integers; the
    * 2×k χ² unrolls in fixed arm order — one IEEE tree, no
    * quantization needed at literal k. Degenerate splits (everything
    * on one side) publish null.
    */
  def moodMedian(df: DataFrame, arm: Column, value: Column,
                 arms: Int = 3): DataFrame = {
    require(arms >= 2 && arms <= 8, s"arms must be in [2,8], got $arms")
    val armLegs = (0 until arms).map(i =>
      sum(when(col("__arm") === i, 1L).otherwise(0L)).as(s"c$i"))
    moodMedianFromCounts(Materialize.cut(df
      .select(arm.cast("int").as("__arm"), value.cast("long").as("__v"))
      .groupBy(col("__v"))
      .agg(count(lit(1)).as("c"), armLegs: _*)), arms)
  }

  /** C109's finisher over an already-counted value-domain frame
    * (__v, c, c0..c_{k−1}) — the single definition the batch face and
    * E36's stream face (additive lake census) both ride.
    */
  def moodMedianFromCounts(groups: DataFrame, arms: Int): DataFrame = {
    val cum = PrefixSum.runningSum(groups, col("__v"), col("c"), "cum")
    val tot = groups.agg(coalesce(sum(col("c")), lit(0L)).cast("long")
      .as("n"))
    val med = cum.crossJoin(broadcast(tot))
      .withColumn("__m", expr("CAST((n + 1) DIV 2 AS BIGINT)"))
      .agg(min(when(col("cum") >= col("__m"), col("__v"))).as("med"))
    val aggCols = (0 until arms).flatMap(i => Seq(
      sum(col(s"c$i")).cast("long").as(s"n_$i"),
      sum(when(col("__v") > col("med"), col(s"c$i")).otherwise(0L))
        .cast("long").as(s"a_$i"))) :+
      min(col("med")).cast("long").as("median")
    val suff = groups.crossJoin(broadcast(med))
      .agg(aggCols.head, aggCols.tail: _*)
    val nTot = (0 until arms).map(i => col(s"n_$i")).reduce(_ + _)
    val aTot = (0 until arms).map(i => col(s"a_$i")).reduce(_ + _)
    val nD = nTot.cast("double"); val aD = aTot.cast("double")
    val chi2 = (0 until arms).map { i =>
      val ni = col(s"n_$i").cast("double")
      val ai = col(s"a_$i").cast("double")
      val ea = ni * aD / nD
      val eb = ni * (nD - aD) / nD
      (ai - ea) * (ai - ea) / ea + ((ni - ai) - eb) * ((ni - ai) - eb) / eb
    }.reduce(_ + _)
    val ok = (0 until arms).map(i => col(s"n_$i") > 0L).reduce(_ && _) &&
      aTot > 0L && aTot < nTot
    suff.select((0 until arms).map(i => col(s"n_$i")) ++
      (0 until arms).map(i => col(s"a_$i")) ++ Seq(
      col("median"),
      when(ok, round(chi2, 6)).as("chi2"),
      lit((arms - 1).toLong).as("dof")): _*)
  }

  /** C103: Cramér's V association strength (Cramér 1946) with the χ²
    * it derives from — the effect-size companion to C97's MI on the
    * same contingency: MI says how many BITS the margins share, V
    * says how far from independence on a 0..1 scale comparable
    * across table shapes. V = √(χ²/(N·(min(r,c)−1))).
    *
    * Scale shape: ONE groupBy builds the cell census (cells ≤ r·c by
    * construction — aggregate-sized); margins re-aggregate the cell
    * frame and broadcast back. ABSENT cells ((0−e)²/e = e) never
    * materialize: ΣΣ e over the full r×c grid is exactly N, so
    * χ² = Σ_present[(o−e)²/e] − Σ_present e + N — two closed-tail
    * terms over the present census only. Determinism: both
    * nonnegative per-cell terms quantize to 1e-9 (HALF_UP ≡
    * half-away-from-zero on nonnegatives) and sum as EXACT INTEGERS —
    * associative, partition-order-free — the D119 JSD convention.
    * One-level margins (min(r,c) < 2) publish null V.
    */
  def cramersV(df: DataFrame, xCol: Column, yCol: Column): DataFrame =
    cramersVFromCells(Materialize.cut(
      df.groupBy(xCol.as("x"), yCol.as("y"))
        .agg(count(lit(1)).as("c"))))

  /** C103's finisher over an already-counted (x, y, c) cell frame —
    * the single definition the batch face and E30's stream face (which
    * maintains the cells additively in the lake) both ride, the
    * `benfordFromCounts` pattern.
    */
  def cramersVFromCells(cells: DataFrame): DataFrame = {
    val rx = cells.groupBy(col("x")).agg(sum(col("c")).cast("long").as("cx"))
    val cy = cells.groupBy(col("y")).agg(sum(col("c")).cast("long").as("cy"))
    val tot = cells.agg(sum(col("c")).cast("long").as("n"),
      count(lit(1)).cast("long").as("n_cells"))
    val dims = rx.agg(count(lit(1)).cast("long").as("r"))
      .crossJoin(cy.agg(count(lit(1)).cast("long").as("cc")))
    val termed = cells
      .join(broadcast(rx), Seq("x")).join(broadcast(cy), Seq("y"))
      .crossJoin(broadcast(tot))
      .withColumn("__e", col("cx").cast("double") * col("cy").cast("double")
        / col("n").cast("double"))
      .withColumn("__nano", {
        val o = col("c").cast("double")
        round((o - col("__e")) * (o - col("__e")) / col("__e") * lit(1e9), 0)
          .cast("long")
      })
      .withColumn("__nano_e", round(col("__e") * lit(1e9), 0).cast("long"))
    termed.agg(max(col("n")).as("n"), max(col("n_cells")).as("n_cells"),
      sum(col("__nano")).cast("long").as("__ns"),
      sum(col("__nano_e")).cast("long").as("__nse"))
      .crossJoin(broadcast(dims))
      .select(col("n"), col("r"), col("cc").as("c"), col("n_cells"), {
        val chi2 = (col("__ns") - col("__nse")).cast("double") / lit(1e9) +
          col("n").cast("double")
        round(chi2, 6).as("chi2")
      },
      ((col("r") - 1L) * (col("cc") - 1L)).as("dof"), {
        // quantization can push an exactly-independent table's χ² a
        // few 1e-9 below zero — clamp before the sqrt in BOTH engines
        val chi2 = greatest((col("__ns") - col("__nse")).cast("double")
          / lit(1e9) + col("n").cast("double"), lit(0.0))
        val minDim = least(col("r"), col("cc")).cast("double") - 1.0
        when(least(col("r"), col("cc")) >= 2L && col("n") > 0L,
          round(sqrt(chi2 / (col("n").cast("double") * minDim)), 6))
          .as("cramers_v")
      })
  }
}
