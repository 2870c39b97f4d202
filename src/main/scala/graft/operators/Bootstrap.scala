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

  /** One-row (n_replicas, mean, ci_lo, ci_hi) for the mean of an
    * exact-integer `valueCol` (micro-units — integer sums keep every
    * replica mean partition-order-free). Percentile convention:
    * lo rank = ceil(α·B), hi rank = B − lo + 1, 1-based on the sorted
    * replica means.
    */
  def meanCi(df: DataFrame, idCol: Column, valueCol: Column,
             replicas: Int = 200, alpha: Double = 0.025,
             seed: Long = 42L): DataFrame = {
    require(replicas > 1, s"need at least 2 replicas, got $replicas")
    require(alpha > 0 && alpha < 0.5, s"alpha must be in (0, 0.5), got $alpha")
    val lo = math.ceil(alpha * replicas).toInt
    val hi = replicas - lo + 1
    val base = df.select(idCol.as("__id"), valueCol.as("__v"))
    val mean = base.agg(
      round(sum(col("__v").cast("decimal(38,0)")).cast("double")
        / count(lit(1)).cast("double"), 6).as("mean"))
    val u = uniform(col("__id"), col("__b"), replicas, seed)
    val ci = base
      .select(col("__id"), col("__v"),
        explode(sequence(lit(0L), lit(replicas - 1L))).as("__b"))
      .withColumn("__w", weight(u))
      .groupBy(col("__b"))
      .agg(sum((col("__w") * col("__v")).cast("decimal(38,0)")).as("__wv"),
        sum(col("__w").cast("decimal(38,0)")).as("__ws"))
      .select((col("__wv").cast("double") / col("__ws").cast("double"))
        .as("__m"))
      .agg(sort_array(collect_list(col("__m"))).as("a"),
        count(lit(1)).as("n_replicas"))
      .select(col("n_replicas"),
        element_at(col("a"), lo).as("ci_lo"),
        element_at(col("a"), hi).as("ci_hi"))
    mean.crossJoin(broadcast(ci))
      .select(col("n_replicas"), col("mean"), col("ci_lo"), col("ci_hi"))
  }
}
