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
}
