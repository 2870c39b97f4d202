package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-concentration audit (SURVEY §2.D98): how dominated is a
  * training mix by its biggest sources — the question behind every
  * mixture decision (D20/D69's reweighting only matters if the mix is
  * skewed, and a release card should say HOW skewed). Three standard
  * measures off one group-count frame:
  *
  *  - Gini coefficient via the rank formula over ascending counts:
  *    G = (2·Σ i·cᵢ − (n+1)·ΣC) / (n·ΣC) — the numerator and
  *    denominator are EXACT integers (rank·count products in
  *    decimal), so G is one IEEE divide; Σ i·cᵢ is invariant to how
  *    ties order among equal counts, so any total order works — we
  *    pin (count, key) anyway.
  *  - Herfindahl–Hirschman index Σ(cᵢ/N)² = Σcᵢ²/N² — exact integer
  *    numerator, one divide.
  *  - top_share = max(cᵢ)/N.
  *
  * Scale shape: ONE partial-agg'd count shuffle of group cardinality;
  * the rank window runs over the AGGREGATE-sized group frame (a
  * corpus-sized rank would ride [[PrefixSum]] instead — documented
  * dial if the key domain ever approaches corpus size).
  */
object Concentration {

  private def dec0(c: Column): Column = c.cast(DecimalType(38, 0))

  /** One row: (n_groups, total, gini, hhi, top_share). Empty input
    * yields zero groups and null measures; a single group is maximal
    * concentration (HHI 1, Gini 0 by the rank formula — equality
    * among one).
    */
  def giniHhi(df: DataFrame, key: Column): DataFrame =
    giniHhiFromCounts(
      df.groupBy(key.as("__k")).agg(count(lit(1)).as("__c")))

  /** The finisher over an already-aggregated (__k, __c) count frame —
    * shared by the batch face and the E25 streaming read face (group
    * counts are ADDITIVE, so merged per-batch counts feed the SAME
    * computation and stream ≡ batch exactly).
    */
  def giniHhiFromCounts(counts: DataFrame): DataFrame = {
    val ranked = counts.withColumn("__i",
      row_number().over(Window.orderBy(col("__c").asc, col("__k").asc)))
    val agg = ranked.agg(
      count(lit(1)).cast("long").as("n_groups"),
      sum(col("__c")).cast("long").as("total"),
      sum(dec0(col("__i")) * dec0(col("__c"))).as("__ric"),
      sum(dec0(col("__c")) * dec0(col("__c"))).as("__c2"),
      max(col("__c")).cast("long").as("__cmax"))
    val nD = col("n_groups").cast("double")
    val tD = col("total").cast("double")
    agg.select(col("n_groups"), col("total"),
      when(col("n_groups") > 0 && col("total") > 0,
        round((lit(2.0) * col("__ric").cast("double")
          - (nD + 1.0) * tD) / (nD * tD), 6)).as("gini"),
      when(col("total") > 0,
        round(col("__c2").cast("double") / (tD * tD), 6)).as("hhi"),
      when(col("total") > 0,
        round(col("__cmax").cast("double") / tD, 6)).as("top_share"))
  }
}
