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

  /** D112: effective sample size / design effect (Kish 1965) of a
    * weighted sample, per group — the "how many docs is this weighted
    * corpus really worth" audit for D35/D45/D48-style importance
    * weights: ESS = (Σw)²/Σw², deff = n·Σw²/(Σw)². A source whose
    * quality weights are concentrated on a few docs has ESS ≪ n —
    * the mixture sees far less diversity than its row count claims,
    * and a release card that publishes n without ESS overstates the
    * corpus.
    *
    * Exactness: weights enter as MICRO-UNIT integers (round(w·1e6) —
    * the deterministic bridge from an already-bit-exact double score),
    * so Σw and Σw² accumulate exactly in decimal; the µ-scale cancels
    * in ESS, and deff is the same two exact aggregates recombined.
    * ONE partial-agg'd scan, group-cardinality exchange, one IEEE
    * evaluation per group. Zero-weight groups publish null.
    */
  def effectiveSampleSize(df: DataFrame, group: Column,
                          weight: Column): DataFrame = {
    val wu = round(weight * lit(1000000.0), 0).cast("long")
    val agg = df
      .select(group.as("grp"), wu.as("__w"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"),
        sum(dec0(col("__w"))).as("__sw"),
        sum(dec0(col("__w")) * dec0(col("__w"))).as("__sww"))
    val sw = col("__sw").cast("double")
    val sww = col("__sww").cast("double")
    agg.select(col("grp"), col("n_rows"),
      when(col("__sww") > 0, round(sw * sw / sww, 6)).as("ess"),
      when(col("__sw") > 0,
        round(col("n_rows").cast("double") * sww / (sw * sw), 6))
        .as("design_effect"))
  }

  /** D127: Hill tail-index estimator (Hill 1975) over the top-k order
    * statistics of a positive integer size column (document lengths
    * here): α̂ = k / Σ_{i≤k} ln(x_(i)/x_(k+1)). THE heavy-tail
    * diagnostic a partitioner lives or dies by: α < 2 means infinite
    * variance — size-based salting/packing decisions (D28/E4) MUST
    * assume whales; α > 2 means the mean and variance exist and
    * uniform partitioning is honest. D103/D62 see vocabulary
    * power laws; this sees the SIZE power law.
    *
    * Scale shape: one scan → TakeOrdered(k+1) on the size (k is a
    * small literal — never a global sort); ties straddling the cut
    * are harmless because only the VALUE MULTISET enters the
    * estimator (uniquely determined by the order statistics). The ln
    * terms fold over the sorted list (descending, seed 0.0) — one
    * IEEE tree; the 6-dp round absorbs libm-ulp ln drift (the BM25
    * argument). Corpora with ≤ k+1 positive sizes publish null.
    */
  def hillTailIndex(df: DataFrame, size: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val top = df.select(size.cast("long").as("__x"))
      .filter(col("__x") > 0L)
      .orderBy(col("__x").desc)
      .limit(k + 1)
    val nPos = df.select(size.cast("long").as("__x"))
      .filter(col("__x") > 0L)
      .agg(count(lit(1)).cast("long").as("n_pos"))
    top.agg(sort_array(collect_list(col("__x")), asc = false).as("__l"),
        count(lit(1)).cast("long").as("__cnt"))
      .crossJoin(broadcast(nPos))
      .select(col("n_pos"), lit(k.toLong).as("k"),
        try_element_at(col("__l"), lit(k + 1)).as("x_kplus1"), {
          val xk1 = try_element_at(col("__l"), lit(k + 1)).cast("double")
          val s = aggregate(slice(col("__l"), lit(1), lit(k)), lit(0.0),
            (acc, x) => acc + log(x.cast("double") / xk1))
          when(col("__cnt") === (k + 1).toLong && col("n_pos") > (k + 1).toLong
              && s > 0.0,
            round(lit(k.toDouble) / s, 6)).as("alpha")
        })
      .withColumn("infinite_variance",
        when(col("alpha").isNotNull, col("alpha") < 2.0))
  }
}
