package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Last-N-distinct-period pivot.
  *
  * The reference's dashboard pivots each player's points for the last 3
  * gameweeks into columns `gw-1`,`gw-2`,`gw-3` via three correlated
  * subqueries over a `limit 3` CTE (fpl-data-pipeline
  * sql_queries.py:138-159) — a per-row re-scan that cannot distribute.
  *
  * Spark-first shape: rank the distinct periods once (tiny aggregate,
  * broadcast back), then a single filtered pass with conditional
  * aggregates (`max(when(rank === i, value))`). One shuffle on the
  * entity key, periods never leave the executors.
  */
object PeriodPivot {

  /** @param df       fact rows
    * @param entity   grouping key column name
    * @param period   period column name (orderable; e.g. a date_trunc)
    * @param value    measure column
    * @param n        how many trailing periods to pivot
    * @param colName  i (1-based, 1 = latest) → output column name
    */
  def lastPeriods(df: DataFrame, entity: String, period: String,
                  value: Column, n: Int,
                  colName: Int => String): DataFrame = {
    val ranked = rankPeriods(df, period, n)
    val joined = df.join(broadcast(ranked), Seq(period))
    val pivots = (1 to n).map { i =>
      max(when(col("__prank") === i, value)).as(colName(i))
    }
    joined.groupBy(col(entity)).agg(pivots.head, pivots.tail: _*)
  }

  /** Distinct trailing periods ranked 1..n (1 = most recent). Kept as a
    * DataFrame so callers can reuse it (e.g. rolling averages over the
    * same trailing window).
    *
    * Contract: null period values are dropped (`collect_list` skips
    * nulls) — a null month can never rank among the trailing n. Callers
    * that equi-join on the period column never matched nulls anyway.
    *
    * Deliberately NOT a `row_number().over(Window.orderBy(...))`: an
    * unpartitioned window funnels its input through one partition (and
    * warns about it). The period domain is tiny by construction
    * (distinct months/gameweeks), so fold it to a single sorted array
    * with a regular two-phase aggregate and posexplode the trailing
    * slice — no window, no single-partition exchange of row data.
    */
  def rankPeriods(df: DataFrame, period: String, n: Int): DataFrame = {
    require(n >= 0, s"rankPeriods: n must be >= 0, got $n")
    df.select(col(period)).distinct()
      .agg(reverse(array_sort(collect_list(col(period)))).as("__ps"))
      .select(posexplode(slice(col("__ps"), 1, n)).as(Seq("__pos", period)))
      .select(col(period), (col("__pos") + 1).cast("int").as("__prank"))
  }
}
