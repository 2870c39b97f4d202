package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D82: deterministic Poisson bootstrap (Chamandy et al. 2012 — the
  * resampling scheme that works on a distributed corpus: instead of
  * drawing n docs with replacement, each doc contributes an
  * independent Poisson(1) weight per replica, so a replica never
  * needs a global sample — one scan computes every replica's
  * weighted sum as B partial-aggregated cells).
  *
  * Determinism: the per-(doc, replica) weight is the Poisson(1)
  * inverse CDF of the D68 uniform (engine XXH64 of id·B+b → top 53
  * bits), so the CI is retry-stable and DuckDB-replayable; weights
  * cap at 8 (P(X>8) ≈ 1e-6 — identical truncation in both engines,
  * far below the CI's resolution).
  *
  * Scale shape: explode ×B feeds straight into a partial-aggregated
  * groupBy(replica), so the shuffle carries B×partitions cells, never
  * the exploded rows; the B replica means are aggregate-sized and the
  * order statistics run over one collected array.
  */
object Bootstrap {

  /** Cumulative Poisson(1) CDF c_k = P(X ≤ k), k = 0..7 — shared with
    * the DuckDB oracle builder so both engines cut on identical
    * doubles.
    */
  val cum: Array[Double] = {
    val out = new Array[Double](8)
    var p = math.exp(-1.0)
    var c = 0.0
    var k = 0
    while (k < 8) {
      c += p; out(k) = c; p = p / (k + 1.0); k += 1
    }
    out
  }

  /** The weight CASE chain over a uniform column. */
  def weight(u: Column): Column =
    cum.zipWithIndex.reverse.foldLeft(lit(8L)) { case (acc, (c, k)) =>
      when(u < lit(c), lit(k.toLong)).otherwise(acc)
    }

  /** The per-(id, replica) uniform — the D68 XXH64 draw. Shared with
    * the streaming twin so the two faces cannot drift.
    */
  def uniform(id: Column, b: Column, replicas: Int, seed: Long): Column =
    (shiftrightunsigned(xxhash64(lit(seed), id * replicas + b), 11)
      .cast("double") + lit(0.5)) / lit(9007199254740992.0)

  /** The B replica cells off ONE scan: (b, wv, ws, n, vsum). Every
    * doc appears exactly once per replica group, so each cell also
    * carries the batch's plain count and value sum — the mean needs
    * no second pass over the input.
    */
  def cells(df: DataFrame, idCol: Column, valueCol: Column,
            replicas: Int, seed: Long): DataFrame = {
    require(replicas > 1, s"need at least 2 replicas, got $replicas")
    df.select(idCol.as("__id"), valueCol.as("__v"),
        explode(sequence(lit(0L), lit(replicas - 1L))).as("__b"))
      .withColumn("__w",
        weight(uniform(col("__id"), col("__b"), replicas, seed)))
      .groupBy(col("__b").as("b"))
      .agg(sum((col("__w") * col("__v")).cast("decimal(38,0)")).as("wv"),
        sum(col("__w").cast("decimal(38,0)")).as("ws"),
        count(lit(1)).as("n"),
        sum(col("__v").cast("decimal(38,0)")).as("vsum"))
  }

  /** Finish a (merged) cell frame into the one-row report — shared by
    * the batch operator and the streaming read face so the percentile
    * convention cannot drift: lo rank = ceil(α·B), hi = B − lo + 1,
    * 1-based on the sorted replica means. The mean reads any cell's
    * (n, vsum) pair (all equal by construction — max() selects it
    * deterministically).
    */
  def finishCi(cellFrame: DataFrame, replicas: Int,
               alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 0.5, s"alpha must be in (0, 0.5), got $alpha")
    val lo = math.ceil(alpha * replicas).toInt
    val hi = replicas - lo + 1
    cellFrame
      .select((col("wv").cast("double") / col("ws").cast("double")).as("__m"),
        col("n"), col("vsum"))
      .agg(sort_array(collect_list(col("__m"))).as("a"),
        count(lit(1)).as("n_replicas"),
        max(col("n")).as("__n"), max(col("vsum")).as("__vs"))
      .select(col("n_replicas"),
        round(col("__vs").cast("double") / col("__n").cast("double"), 6)
          .as("mean"),
        element_at(col("a"), lo).as("ci_lo"),
        element_at(col("a"), hi).as("ci_hi"))
  }

  /** One-row (n_replicas, mean, ci_lo, ci_hi) for the mean of an
    * exact-integer `valueCol` (micro-units — integer sums keep every
    * replica mean partition-order-free). ONE scan: cells + finisher.
    */
  def meanCi(df: DataFrame, idCol: Column, valueCol: Column,
             replicas: Int = 200, alpha: Double = 0.025,
             seed: Long = 42L): DataFrame =
    finishCi(cells(df, idCol, valueCol, replicas, seed), replicas, alpha)
}
