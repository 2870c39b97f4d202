package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic mixture resampling (SURVEY §2.D21).
  *
  * Training mixtures up/down-weight data sources: "keep 30% of web,
  * all of books, 10% of boilerplate". `sample()`'s RNG draws depend on
  * partitioning and re-execution, so the kept subset is not stable; a
  * seeded hash of the row id is: a row is kept iff
  * `xxhash64(seed, id) mod M  <  fraction·M`. Pure filter — pushes
  * into the scan, no shuffle, no state — and exactly reproducible:
  * the same (seed, fractions) always select the same rows, and
  * fractions can be revised later with maximal overlap between runs
  * (raising a stratum from 30% to 40% keeps the original 30% and adds
  * 10 points more, because the kept set is a hash-range prefix).
  */
object Resample {

  private val M = 1000000L

  /** Keep each row with its stratum's fraction (default for strata not
    * listed). Fractions are clamped to [0, 1].
    */
  def byStratum(df: DataFrame, stratum: Column, id: Column,
                fractions: Map[String, Double],
                defaultFraction: Double = 1.0,
                seed: Long = 42L): DataFrame = {
    val bucket = pmod(xxhash64(lit(seed), id), lit(M))
    val frac = fractions.foldLeft(
      lit(math.max(0.0, math.min(1.0, defaultFraction)))) {
      case (acc, (value, f)) =>
        when(stratum === value, lit(math.max(0.0, math.min(1.0, f)))).otherwise(acc)
    }
    df.filter(bucket < frac * M)
  }
}
