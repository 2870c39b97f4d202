package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D91: data-constrained epoch allocation (Muennighoff et al. 2023,
  * "Scaling Data-Constrained Language Models") — when the token
  * budget exceeds the unique data, sources must be REPEATED, and
  * repeated epochs are worth less than fresh ones. Modeling epoch
  * k+1 of source s as worth `U_s · r^k` effective tokens (geometric
  * decay, the paper's diminishing-returns shape with r = 0.7 ≈ its
  * ~4-epoch half-value), the budget-constrained optimum is the
  * GREEDY marginal schedule: grant epochs in decreasing `U_s · r^k`
  * order until the budget runs out, the final epoch partial.
  *
  * That greedy is not a driver loop here — it is a PLAN: per-source
  * unique masses (one partial-agg'd count shuffle, aggregate-sized
  * output), an epochs×sources candidate frame (≤ maxEpochs·|sources|
  * rows), and a prefix sum over that AGGREGATE in marginal order
  * decides every allocation — the [[Resample]] quota-walk state
  * bound, never a corpus-sized sort. All arithmetic is exact
  * integers: the marginal rides as `U_s · 7^k · 10^(maxEpochs−1−k)`
  * (= U_s·0.7^k scaled by 10^(maxEpochs−1) — same denominator for
  * every candidate, so BIGINT compares replace float pow), and
  * effective mass publishes in the same fixed-point units. Overflow
  * bound `U < 2^63/10^(maxEpochs-1)` (~9e11 tokens/source at the
  * default 8) — lift the lanes to DECIMAL(38,0) past that.
  *
  * Marginals strictly decrease within a source (U > 0), so the
  * (marginal desc, source, k) order always grants epoch k before
  * k+1; ties across sources break on source name — deterministic,
  * mirrored in the oracle.
  */
object EpochAlloc {

  /** Fixed-point marginal multipliers: 7^k · 10^(maxEpochs−1−k). */
  private[graft] def multipliers(maxEpochs: Int): Seq[Long] =
    (0 until maxEpochs).map { k =>
      (0 until k).foldLeft(1L)((a, _) => a * 7) *
        (0 until maxEpochs - 1 - k).foldLeft(1L)((a, _) => a * 10)
    }

  /** Allocate `budgetNum/budgetDen × Σ unique` tokens across sources.
    *
    * @param masses (source, u) — unique token mass per source,
    *               aggregate-sized
    * @return (source, unique_tokens, n_epochs, full_epochs,
    *         tokens_alloc, eff_fp) — eff_fp in 10^-(maxEpochs-1)
    *         token units
    */
  def allocate(masses: DataFrame, maxEpochs: Int = 8,
               budgetNum: Int = 3, budgetDen: Int = 2): DataFrame = {
    require(maxEpochs >= 1 && maxEpochs <= 12, "maxEpochs in [1,12]")
    val mults = multipliers(maxEpochs)
    val tot = masses.agg(sum(col("u")).as("__tu"))
    val cand = masses.crossJoin(broadcast(tot))
      .withColumn("__k", explode(sequence(lit(0), lit(maxEpochs - 1))))
      .withColumn("__mult", element_at(typedLit(mults), col("__k") + 1))
      .withColumn("__mv", col("u") * col("__mult"))
      .withColumn("__b", expr(s"(__tu * $budgetNum) DIV $budgetDen"))
    // prefix mass over the aggregate-sized candidate frame — bounded
    // by maxEpochs·|sources| rows by construction, never corpus rows
    val w = Window.orderBy(col("__mv").desc, col("source"), col("__k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val alloc = cand
      .withColumn("__prev", coalesce(sum(col("u")).over(w), lit(0L)))
      .withColumn("__alloc",
        when(col("__prev") >= col("__b"), lit(0L))
          .otherwise(least(col("u"), col("__b") - col("__prev"))))
    alloc.groupBy(col("source"), col("u").as("unique_tokens"))
      .agg(
        sum(when(col("__alloc") > 0, 1).otherwise(0)).cast("int")
          .as("n_epochs"),
        sum(when(col("__alloc") === col("u") && col("u") > 0, 1)
          .otherwise(0)).cast("int").as("full_epochs"),
        sum(col("__alloc")).as("tokens_alloc"),
        sum(col("__alloc") * col("__mult")).as("eff_fp"))
      .orderBy(col("source"))
  }
}
