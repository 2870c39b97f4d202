package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-stable numerics.
  *
  * Double summation is order-dependent, and Spark's partial (map-side)
  * aggregation visits rows in partition order — so `sum(double)` is not
  * reproducible across partitionings, let alone across engines. The
  * testdata's monetary columns are 2-decimal values, so we aggregate in
  * exact decimals (associative ⇒ identical under any partitioning and in
  * DuckDB) and only convert to double at the very end. Decimal→double is
  * a single IEEE-754 nearest rounding, identical in both engines.
  *
  * Rule: sums in decimal, division/ratios in double AFTER the exact
  * aggregate, no `round()` (HALF_UP vs half-even differs across engines).
  */
object Num {
  /** Cast a 2-decimal-valued double column to exact decimal for summing. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact sum of a 2-decimal column, exported as double. */
  def dsum(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact sum of products of two 2-decimal columns, as double. */
  def dsumProd(a: Column, b: Column): Column =
    sum(dec2(a) * dec2(b)).cast("double")

  /** Exact average: decimal sum / count, divided in double. */
  def davg(c: Column): Column =
    sum(dec2(c)).cast("double") / count(c).cast("double")
}
