package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget-constrained selection (SURVEY §2.D54): keep the
  * highest-quality documents until their cumulative TOKEN MASS
  * reaches a budget — "fill 50B tokens with the best data", the
  * budget question curation actually answers (a doc-count quota D33
  * answers a different one: long docs make doc-count and token-count
  * cuts diverge badly).
  *
  * Selection order is (quality bucket at 2 dp DESC, id ASC) — the
  * same bucket-granularity contract as D33: the product decision is
  * "best ~half of the mass", not a doc-exact boundary inside a
  * 0.01-wide quality band, and bucketing is what makes the exact
  * kept set computable without a global sort.
  *
  * Scale shape (the [[StratifiedTopQuota]] move, mass-weighted,
  * single stratum): collapse rows to a per-bucket MASS histogram
  * (aggregate-sized shuffle), walk the cumulative histogram to find
  * the boundary bucket where the running mass crosses the budget,
  * bulk-admit all better buckets and bulk-reject all worse ones, and
  * run the only row-level scan over the boundary bucket's rows —
  * expected 1/B of the data for B occupied buckets, and even that
  * scan is a [[PrefixSum]] distributed prefix-sum (range-partitioned
  * on id), so a degenerate corpus where every row shares one 2-dp
  * score still fans out over all shuffle partitions. Equal to the
  * naive global running-sum window bit-for-bit (the decomposition is
  * just that window evaluated bucket-wise, and the prefix-sum is
  * boundary-invariant).
  *
  * @param score  quality in [0, 1] (bucketed at 2 dp)
  * @param mass   non-negative integer token mass per row
  * @param id     unique tiebreak key within a bucket
  * @param budget token budget; a row is kept iff the running mass
  *               INCLUDING it stays <= budget
  */
object TokenBudget {

  def markKept(df: DataFrame, score: Column, mass: Column, id: Column,
               budget: Long, keptCol: String = "kept"): DataFrame = {
    require(budget > 0, s"TokenBudget: budget must be positive, got $budget")
    // cut once: histogram, bulk verdicts, and boundary rank all read it.
    // Null/NaN scores land in a worst-than-everything sentinel bucket
    // (kept only if budget remains after every scored row) — without
    // the coalesce, a null bucket fails BOTH branch equality filters
    // below and the row would vanish from the output entirely.
    val bucket = floor(score * lit(100.0)).cast("long")
    val withB = Materialize.cut(df
      .withColumn("__tb_b",
        coalesce(when(isnan(score.cast("double")), lit(Long.MinValue + 1))
          .otherwise(bucket), lit(Long.MinValue + 1)))
      .withColumn("__tb_m", coalesce(mass.cast("long"), lit(0L))))

    // per-bucket mass histogram — aggregate-sized
    val hist = withB.groupBy(col("__tb_b"))
      .agg(sum(col("__tb_m")).as("__tb_bm"))
    // cumulative mass in DESC bucket (best-first) order; window runs
    // over the AGGREGATE only (<= 101 buckets for a [0,1] score)
    val wCum = Window.orderBy(col("__tb_b").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.withColumn("__tb_cum", sum(col("__tb_bm")).over(wCum))
    // boundary = best bucket whose cumulative mass exceeds the budget;
    // mass admitted before it = cum - its own bucket mass
    val bounds = cum.filter(col("__tb_cum") > budget)
      .agg(max(struct(col("__tb_b"),
        (col("__tb_cum") - col("__tb_bm")).as("__tb_before"))).as("s"))
      .select(col("s.__tb_b").as("__tb_bb"),
        col("s.__tb_before").as("__tb_before"))

    // bounds is empty iff total mass <= budget: sentinel admits all
    val withThr = withB.crossJoin(broadcast(bounds))
      .withColumn("__tb_bb", coalesce(col("__tb_bb"), lit(Long.MinValue)))
      .withColumn("__tb_before", coalesce(col("__tb_before"), lit(0L)))
    val nonBoundary = withThr.filter(col("__tb_b") =!= col("__tb_bb"))
      .withColumn(keptCol, col("__tb_b") > col("__tb_bb"))
    // the only row-level scan: the boundary bucket in id order —
    // expected 1/B of the data, but NOT funneled through one task:
    // the distributed prefix-sum range-partitions on id, so even the
    // degenerate single-score corpus (every row in one bucket) fans
    // out over all shuffle partitions (WarehouseSpec pins it).
    val boundary = PrefixSum.runningSum(
        withThr.filter(col("__tb_b") === col("__tb_bb")),
        id, col("__tb_m"), "__tb_run")
      .withColumn(keptCol, col("__tb_before") + col("__tb_run") <= budget)
      .drop("__tb_run")
    nonBoundary.unionByName(boundary)
      .drop("__tb_b", "__tb_m", "__tb_bb", "__tb_before")
  }

  /** Filter form: only the rows that fit the budget. */
  def select(df: DataFrame, score: Column, mass: Column, id: Column,
             budget: Long): DataFrame = {
    val marked = markKept(df, score, mass, id, budget)
    marked.filter(col("kept")).drop("kept")
  }
}
