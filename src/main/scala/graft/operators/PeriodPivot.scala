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
    */
  def rankPeriods(df: DataFrame, period: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(col(period)).distinct()
      .withColumn("__prank",
        row_number().over(Window.orderBy(col(period).desc)))
      .filter(col("__prank") <= n)
  }
}
