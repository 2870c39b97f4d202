package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private count release (SURVEY §2.D68).
  *
  * The classical Laplace mechanism (Dwork–McSherry–Nissim–Smith
  * 2006): release `count + Lap(Δ/ε)` per group, where the
  * sensitivity Δ of a partition-disjoint count histogram is 1 (one
  * record moves one cell by one). Corpus pipelines publish exactly
  * this shape — per-language/per-source document tallies shared
  * outside the data boundary (dataset cards, public dashboards) —
  * and pair it with the §2.D58 k-anonymity audit: the audit decides
  * what may be released at all, this mechanism noises what is.
  *
  * Determinism — a reproducible pipeline cannot call an RNG, so the
  * Laplace draw derives from a keyed hash: each group gets a dense
  * release index (row_number over the sorted group keys), the index
  * is hashed with the engine's XXH64, the top 53 bits make a uniform
  * `u ∈ (0,1)` (the `+0.5` centering keeps it off both endpoints),
  * and the inverse CDF maps it to a Laplace deviate. Every draw is a
  * pure function of (group rank, ε) — identical across engines, so
  * the DuckDB oracle replays it bit for bit (the one `ln` is
  * absorbed by the 6-dp rounding both sides apply). The index is
  * release-scoped: a group's noise changes if the released group SET
  * changes, which is the correct privacy posture (each release is a
  * fresh mechanism invocation with its own budget), but callers
  * comparing releases should join on keys, not noise.
  *
  * Scale shape — one partial-agg'd `groupBy` (map-side combine
  * collapses to one row per group before the shuffle) and a
  * [[PrefixSum]] distributed rank over the released histogram: the
  * release is usually aggregate-sized, but nothing here ASSUMES it —
  * a billion-cell release range-partitions across the cluster
  * instead of serializing through one ranking task. Everything
  * downstream of the count is per-row arithmetic in whole-stage
  * codegen. No `.collect()`.
  */
object DpRelease {

  /** Laplace-noised count histogram over `keys`.
    *
    * @param df      input rows (one record each — the unit the ε
    *                budget protects).
    * @param keys    grouping columns of the released histogram.
    * @param epsilon privacy parameter (> 0); noise scale b = 1/ε.
    * @return one row per group: (keys..., n_true, noisy_count) —
    *         `n_true` is the exact count (kept for gate/audit use;
    *         drop it before an actual external release),
    *         `noisy_count` is count + Lap(1/ε) rounded to 6 dp.
    */
  /** The deterministic noise chain shared by this mechanism and the
    * E19 streaming face: `hash` → top 53 bits (>>> 11 reads the
    * unsigned two's-complement bits) → `u = (bits + 0.5)/2^53 ∈
    * (0,1)` exclusive on both ends → inverse Laplace CDF → count +
    * deviate, 6-dp rounded. ONE definition so the pinned batch ≡
    * stream bit-equality can never un-sync by copy-paste drift.
    */
  def noisyColumn(countCol: Column, hash: Column, epsilon: Double): Column = {
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    val b = 1.0 / epsilon
    val bits = shiftrightunsigned(hash, 11)
    val u = (bits.cast("double") + lit(0.5)) / lit(9007199254740992.0)
    val lap: Column =
      when(u < 0.5, lit(b) * log(lit(2.0) * u))
        .otherwise(-lit(b) * log(lit(2.0) * (lit(1.0) - u)))
    round(countCol.cast("double") + lap, 6)
  }

  def noisyCounts(df: DataFrame, keys: Seq[String],
                  epsilon: Double): DataFrame = {
    require(keys.nonEmpty, "noisyCounts: need at least one key")
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    val kcols = keys.map(col)
    val counts = df.groupBy(kcols: _*).agg(count(lit(1)).as("n_true"))
    // dense release index over the histogram: row_number in key order
    // = a distributed prefix-count ([[PrefixSum]] — range-partitioned
    // on the key struct, within-partition ranks + broadcast offsets),
    // so even a release with billions of cells never serializes
    // through one task; the bits are identical to the unpartitioned
    // ROW_NUMBER the DuckDB oracle replays
    val ranked = PrefixSum.runningSum(
      counts, struct(kcols: _*), lit(1L), "gid")
    ranked
      .withColumn("noisy_count",
        noisyColumn(col("n_true"), xxhash64(lit(42L), col("gid")), epsilon))
      .drop("gid")
  }
}
