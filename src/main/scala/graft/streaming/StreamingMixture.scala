package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of the mixture samplers (SURVEY §2.E13 ∘ D21/D48):
  * continuous per-source admission at keep-fractions FROZEN from a
  * batch mixture decision.
  *
  * The batch mixers (temperature/UniMax/quotas) decide a closed-corpus
  * allocation; the deployment face freezes that decision into
  * per-stratum keep RATES — `quota_s / mass_s` — persisted as a lake
  * artifact, and admits each arriving row by the same seeded-hash
  * range test the batch samplers use (`xxhash64(seed, id) mod M <
  * fraction·M`). Because admission is a PURE function of (id,
  * fraction), the stream is exactly the batch filter replayed row by
  * row: no state store, no watermark, no micro-batch coupling — and
  * re-running the batch mixer over the grown corpus later reproduces
  * a superset decision consistent with what the stream admitted
  * (hash-range selections are prefix-stable).
  *
  * Strata absent from the artifact take `defaultFraction` (0.0 = the
  * quarantine default for unknown sources, mirroring E12's unknown-
  * language rejection).
  */
object StreamingMixture {

  /** Freeze per-stratum keep fractions (one row per stratum:
    * `__stratum` string, `__fraction` double in [0,1]). */
  def fractions(pairs: Seq[(String, Double)],
                spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    pairs.map { case (s, f) => (s, math.max(0.0, math.min(1.0, f))) }
      .toDF("__stratum", "__fraction")
  }

  def saveFractions(f: DataFrame, path: String): Unit =
    f.coalesce(1).write.mode("overwrite").parquet(path)

  /** The continuous gate: admit each streamed row iff its seeded hash
    * bucket falls inside its stratum's frozen fraction. Stateless
    * incremental plan — the broadcast fraction join and the hash
    * filter both push into the micro-batch scan.
    */
  def admitted(stream: DataFrame, stratumCol: String, idCol: String,
               fracs: DataFrame, defaultFraction: Double = 0.0,
               seed: Long = 42L): DataFrame = {
    val m = 1000000L
    val bucket = pmod(xxhash64(lit(seed), col(idCol)), lit(m))
    stream
      .join(broadcast(fracs),
        col(stratumCol).cast("string") === col("__stratum"), "left")
      .withColumn("__f", coalesce(col("__fraction"),
        lit(math.max(0.0, math.min(1.0, defaultFraction)))))
      .filter(bucket < col("__f") * m)
      .drop("__stratum", "__fraction", "__f")
  }
}
