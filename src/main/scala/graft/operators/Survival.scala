package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimator (Kaplan & Meier 1958) — the
  * censoring-correct retention curve: "what fraction of users is
  * still active after t days" when the observation window cuts off
  * mid-life. Naive retention (C25's cohort grid) treats a user last
  * seen yesterday as churned; KM removes them from the risk set
  * instead (right censoring), which is the difference between a
  * curve that droops artificially at the window edge and one that
  * doesn't.
  *
  * Statistics: at each death time tᵢ (lifetime of an uncensored
  * user), S(tᵢ) = Π_{j≤i} (1 − dⱼ/nⱼ) with nⱼ the at-risk count
  * (everyone with lifetime ≥ tⱼ). The lifetimes table collapses to a
  * per-time (deaths, censored) frame — AGGREGATE-sized (≤ the day
  * domain) — so the at-risk cumulative window and the product fold
  * both run over tiny frames; the product folds a SORTED collected
  * list (time order, seed 1.0), each factor one IEEE divide of exact
  * integers — pinned, engine-replayable.
  *
  * Scale shape: ONE user-count-sized groupBy (the corpus scan), one
  * time-domain groupBy, then list algebra on one row.
  */
object Survival {

  /** Per-death-time curve: (t, n_risk, d_events, survival). `timeCol`
    * is the subject's lifetime (integer units), `censored` whether
    * the subject was still alive at the window edge (leaves the risk
    * set, contributes no death step). Input = ONE ROW PER SUBJECT.
    */
  def kaplanMeier(subjects: DataFrame, timeCol: Column,
                  censored: Column): DataFrame = {
    val subj = Materialize.cut(
      subjects.select(timeCol.as("t"), censored.as("__c")))
    val byTime = subj
      .groupBy(col("t"))
      .agg(sum(when(!col("__c"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("leave"))
    // at-risk(t) = N − Σ_{t' < t} leave(t'): cumulative over the
    // aggregate-sized time frame (the day domain), exclusive window
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byTime
      .withColumn("__gone", coalesce(sum(col("leave")).over(w), lit(0L)))
      .crossJoin(broadcast(
        subj.agg(count(lit(1)).cast("long").as("__n"))))
      .withColumn("n_risk", col("__n") - col("__gone"))
      .filter(col("d") >= 1)
      .select(col("t"), col("n_risk"), col("d"))
    // running product in pinned time order: collect the tiny death
    // frame to one row, slice-fold per step — O(k²) over k ≤ day
    // domain, exact association ((1·f₁)·f₂)…
    risk
      .agg(sort_array(collect_list(struct(col("t"), col("n_risk"),
        col("d")))).as("l"))
      .select(posexplode(col("l")).as(Seq("__i", "__e")), col("l"))
      .select(col("__e.t").as("t"),
        col("__e.n_risk").as("n_risk"),
        col("__e.d").as("d_events"),
        round(aggregate(
          transform(slice(col("l"), lit(1), col("__i") + 1),
            x => (x.getField("n_risk") - x.getField("d")).cast("double")
              / x.getField("n_risk").cast("double")),
          lit(1.0), (acc, f) => acc * f), 6).as("survival"))
  }

  /** C107: Nelson–Aalen cumulative hazard (Nelson 1972; Aalen 1978) —
    * H(t) = Σ_{s≤t} d_s/n_s, the ADDITIVE companion to [[kaplanMeier]]:
    * where KM's product estimates survival, NA estimates accumulated
    * risk — near-linear H means constant hazard, bends mean the
    * failure rate itself is changing, and −ln(KM) ≈ NA is the
    * standard cross-check between the two estimators.
    *
    * Identical frame machinery to KM (same per-time collapse, same
    * exclusive at-risk cumulative); the running SUM folds the sorted
    * death list with seed 0.0 — each step one IEEE divide of exact
    * integers, engine-replayable. Same one-scan scale shape.
    */
  def nelsonAalen(subjects: DataFrame, timeCol: Column,
                  censored: Column): DataFrame = {
    val subj = Materialize.cut(
      subjects.select(timeCol.as("t"), censored.as("__c")))
    val byTime = subj
      .groupBy(col("t"))
      .agg(sum(when(!col("__c"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("leave"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byTime
      .withColumn("__gone", coalesce(sum(col("leave")).over(w), lit(0L)))
      .crossJoin(broadcast(
        subj.agg(count(lit(1)).cast("long").as("__n"))))
      .withColumn("n_risk", col("__n") - col("__gone"))
      .filter(col("d") >= 1)
      .select(col("t"), col("n_risk"), col("d"))
    risk
      .agg(sort_array(collect_list(struct(col("t"), col("n_risk"),
        col("d")))).as("l"))
      .select(posexplode(col("l")).as(Seq("__i", "__e")), col("l"))
      .select(col("__e.t").as("t"),
        col("__e.n_risk").as("n_risk"),
        col("__e.d").as("d_events"),
        round(aggregate(
          transform(slice(col("l"), lit(1), col("__i") + 1),
            x => x.getField("d").cast("double")
              / x.getField("n_risk").cast("double")),
          lit(0.0), (acc, f) => acc + f), 6).as("cum_hazard"))
  }

  /** C108: two-sample log-rank test (Mantel 1966; Peto & Peto 1972) —
    * "do the two arms have the same survival curve", THE standard
    * censoring-correct comparison (a t-test on observed lifetimes is
    * biased the moment censoring differs by arm). At each death time:
    * E₁ = d·n₁/n and the hypergeometric variance
    * V = d·(n₁/n)·(1−n₁/n)·(n−d)/(n−1); χ² = (Σ(d₁−E₁))²/ΣV against
    * 1 dof.
    *
    * Same per-time collapse with per-arm legs riding along; both
    * at-risk cumulatives share ONE exclusive window over the
    * aggregate-sized time frame; the two folds (O−E and V) run over
    * the same sorted list, each term one IEEE tree over exact
    * integers. Single-subject times (n = 1) contribute zero variance
    * by the standard convention; ΣV = 0 publishes null.
    */
  def logRank(subjects: DataFrame, timeCol: Column, censored: Column,
              arm: Column): DataFrame = {
    val subj = Materialize.cut(
      subjects.select(timeCol.as("t"), censored.as("__c"),
        arm.cast("int").as("__a")))
    val byTime = subj
      .groupBy(col("t"))
      .agg(
        sum(when(!col("__c") && col("__a") === 1, 1L).otherwise(0L))
          .as("d1"),
        sum(when(!col("__c"), 1L).otherwise(0L)).as("d"),
        sum(when(col("__a") === 1, 1L).otherwise(0L)).as("leave1"),
        count(lit(1)).as("leave"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = subj.agg(count(lit(1)).cast("long").as("__n"),
      sum(when(col("__a") === 1, 1L).otherwise(0L)).cast("long")
        .as("__n1"),
      sum(when(!col("__c"), 1L).otherwise(0L)).cast("long").as("__ev"),
      sum(when(!col("__c") && col("__a") === 1, 1L).otherwise(0L))
        .cast("long").as("__ev1"))
    val risk = byTime
      .withColumn("__gone", coalesce(sum(col("leave")).over(w), lit(0L)))
      .withColumn("__gone1",
        coalesce(sum(col("leave1")).over(w), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("n_r", col("__n") - col("__gone"))
      .withColumn("n_r1", col("__n1") - col("__gone1"))
      .filter(col("d") >= 1)
    val terms = risk.select(col("t"), {
        val dD = col("d").cast("double"); val d1D = col("d1").cast("double")
        val nD = col("n_r").cast("double")
        val n1D = col("n_r1").cast("double")
        (d1D - dD * n1D / nD).as("__ome")
      }, {
        val dD = col("d").cast("double")
        val nD = col("n_r").cast("double")
        val n1D = col("n_r1").cast("double")
        when(col("n_r") > 1L,
          dD * (n1D / nD) * (lit(1.0) - n1D / nD)
            * ((nD - dD) / (nD - 1.0))).otherwise(lit(0.0)).as("__v")
      })
    // totals ride the OUTER cross join (not max() over the terms
    // frame) so an all-censored input still publishes the real
    // counts, and o_minus_e nulls with the oracle's empty-list fold
    val folded = terms
      .agg(count(lit(1)).cast("long").as("__m"),
        sort_array(collect_list(struct(col("t"), col("__ome"),
          col("__v")))).as("l"))
      .crossJoin(broadcast(tot))
      .select(col("__n").as("n_total"), col("__n1").as("n_arm1"),
        col("__ev").as("events_total"), col("__ev1").as("events_arm1"),
        col("__m"),
        aggregate(col("l"), lit(0.0),
          (acc, e) => acc + e.getField("__ome")).as("__ome_sum"),
        aggregate(col("l"), lit(0.0),
          (acc, e) => acc + e.getField("__v")).as("__v_sum"))
    folded.select(col("n_total"), col("n_arm1"), col("events_total"),
      col("events_arm1"),
      when(col("__m") > 0L, round(col("__ome_sum"), 6)).as("o_minus_e"),
      when(col("__v_sum") > 0.0,
        round(col("__ome_sum") * col("__ome_sum") / col("__v_sum"), 6))
        .as("chi2"),
      lit(1L).as("dof"))
  }
}
