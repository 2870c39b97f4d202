package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The tiny-domain cumulative-histogram core shared by the exact
  * quantile witness (D18b), histogram pre-aggregation (C18) and the
  * quality-percentile filter (D33): given an already-collapsed
  * `(domain, count)` aggregate, attach the running count and the
  * grand total so thresholds/quantiles read off with a comparison.
  *
  * The unpartitioned window is safe BY CONSTRUCTION — the input is a
  * domain aggregate (distinct lengths, 2-dp score buckets, value
  * buckets: ≤ thousands of rows), never raw data. Callers own that
  * invariant; this helper is what keeps "exact quantile" queries
  * exchange-light at any corpus size.
  */
object CumHistogram {

  /** Enforce the caller-owned invariant at plan-build time (zero run
    * cost): the input must be a collapsed frame — an Aggregate (or an
    * explicit limit) somewhere in its plan — because the unpartitioned
    * window moves ALL input rows to one task. Passing raw data here
    * would silently serialize the corpus through a single partition;
    * failing fast at plan time is the cheap defense.
    */
  private def requireCollapsed(counts: DataFrame, fn: String): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalRelation}
    val plan = counts.queryExecution.analyzed
    val collapsed = plan.collectFirst {
      case _: Aggregate => ()
      case _: GlobalLimit => ()
      case _: LocalRelation => ()
    }.isDefined
    require(collapsed,
      s"CumHistogram.$fn: input must be a domain AGGREGATE (groupBy.agg / " +
        "limit) — the unpartitioned cumulative window is only safe over a " +
        "collapsed histogram, never raw rows")
  }

  /** counts(domain, cnt) → + `cum` (cumulative count in domain order)
    * and `total` (broadcast grand total).
    */
  def cumulative(counts: DataFrame, domain: String, cnt: String): DataFrame = {
    requireCollapsed(counts, "cumulative")
    val w = Window.orderBy(col(domain))
      .rowsBetween(Window.unboundedPreceding, 0)
    counts
      .withColumn("cum", sum(col(cnt)).over(w))
      .crossJoin(broadcast(counts.agg(sum(col(cnt)).as("total"))))
  }

  /** Per-group variant: cumulative counts within each `group`'s
    * domain histogram plus that group's `total`. The window runs over
    * the (group × domain) AGGREGATE — state per task is one group's
    * domain values, never its rows — so grouped exact quantiles cost
    * the same class of work as the global ones.
    */
  def cumulativeByGroup(counts: DataFrame, group: String, domain: String,
                        cnt: String): DataFrame = {
    requireCollapsed(counts, "cumulativeByGroup")
    val w = Window.partitionBy(col(group)).orderBy(col(domain))
      .rowsBetween(Window.unboundedPreceding, 0)
    counts
      .withColumn("cum", sum(col(cnt)).over(w))
      .join(broadcast(counts.groupBy(col(group))
        .agg(sum(col(cnt)).as("total"))), group)
  }
}
