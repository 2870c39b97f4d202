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

  /** D35: score-proportional (quality-weighted) sampling — keep each
    * row with probability equal to its OWN score in [0, 1], the
    * "quality temperature" move real corpus recipes make (better
    * documents survive more often, bad ones still contribute a
    * trickle). Deterministic exactly like [[byStratum]]: kept iff
    * `xxhash64(seed, id) mod M < score·M` — a pure filter (no RNG, no
    * shuffle, pushes to the scan), reproducible, and hash-range
    * prefix-stable: raising a document's score can only ADD it to the
    * kept set, never evict others. Scores are clamped to [0, 1].
    */
  def byScore(df: DataFrame, score: Column, id: Column,
              seed: Long = 42L): DataFrame = {
    val bucket = pmod(xxhash64(lit(seed), id), lit(M))
    val clamped = greatest(lit(0.0), least(lit(1.0), score))
    df.filter(bucket < clamped * M)
  }

  /** D25: deterministic disjoint split (train/val/test). Each row's
    * seeded hash bucket lands in exactly one of the `weights` ranges,
    * so the splits are DISJOINT and COMPLETE by construction — the
    * property `randomSplit` only approximates (its per-partition RNG
    * resamples on retry/re-execution; a lost executor can silently
    * move rows between splits mid-job). A pure projection: no
    * shuffle, no state, stable under repartitioning, and adding data
    * later never moves an old row to a different split.
    *
    * @param weights relative split weights (normalized internally)
    * @return df with an int `split` column in [0, weights.size)
    */
  def splitByHash(df: DataFrame, id: Column, weights: Seq[Double],
                  seed: Long = 42L,
                  splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_ >= 0) && weights.sum > 0,
      s"weights must be non-negative with a positive sum, got $weights")
    val total = weights.sum
    // cumulative upper bounds in hash-bucket space; last pinned to M
    // so float rounding can never leave a bucket unassigned
    val bounds = weights.scanLeft(0.0)(_ + _).tail
      .map(c => (c / total * M).toLong).dropRight(1) :+ M
    val bucket = pmod(xxhash64(lit(seed), id), lit(M))
    val splitExpr = bounds.zipWithIndex.reverse.foldLeft(lit(bounds.size - 1)) {
      case (acc, (hi, i)) => when(bucket < hi, lit(i)).otherwise(acc)
    }
    df.withColumn(splitCol, splitExpr)
  }

  /** D27: per-stratum quota cap — keep at most `quota` rows per
    * stratum (source domain, site, license bucket, …), chosen by the
    * `priority` ordering with ties broken deterministically. Corpus
    * curation caps over-represented domains this way: without a cap,
    * one boilerplate-heavy site dominates the token budget of its
    * whole stratum.
    *
    * Deliberately phrased as the `row_number() <= k` window idiom: the
    * injected [[graft.plans.TopKRewrite]] rule turns it into the
    * bounded-heap [[graft.plans.TopKPerGroup]] physical operator, so
    * the cap runs with O(strata × quota) task state instead of a
    * per-partition sort buffer — one expression of the op, two plans,
    * the optimizer picks.
    *
    * @param priority ordering columns, highest-priority first; the
    *                 caller appends a unique key (e.g. the row id) to
    *                 make the kept set deterministic.
    */
  def quotaCap(df: DataFrame, stratum: Column, priority: Seq[Column],
               quota: Int): DataFrame = {
    require(quota > 0, s"quotaCap: quota must be positive, got $quota")
    require(priority.nonEmpty, "quotaCap: priority ordering must be non-empty")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(priority: _*)
    df.withColumn("__qrank", row_number().over(w))
      .filter(col("__qrank") <= quota)
      .drop("__qrank")
  }

  /** D48: temperature-flattened source mixing at τ = ½ — the
    * multilingual/multi-source rebalancing move (mBERT, XLM-R, Llama
    * data recipes): sample source s with probability ∝ mass_s^τ, so
    * head sources are down-weighted and tail sources up-weighted
    * without ever vanishing. τ is PINNED to ½ because n^½ = √n is the
    * one non-trivial power IEEE 754 rounds correctly — pow(n, 0.7)
    * may differ between libms, sqrt cannot — which keeps the per-source
    * quotas (and therefore the kept set) bit-reproducible across
    * engines.
    *
    * Quotas: quota_s = ⌊N·√mass_s / Σ_s √mass_s⌋ with the total folded
    * in sorted-stratum order (fixed association = identical double
    * anywhere). The per-source masses collapse to ONE ROW PER STRATUM
    * before the driver sees them — bounded by the source-domain count,
    * the same class of driver-side state as the LM vocabularies.
    * Selection within a source is the seeded-hash ranking (smallest
    * `xxhash64(seed, id) mod M` first, id tiebreak): deterministic,
    * retry-stable, and growing a source only shifts its tail.
    *
    * Shape: one partial-agg'd mass pass, then the
    * [[StratifiedTopQuota]] boundary-bucket selection — bulk
    * admit/reject off a per-(source, hash-bucket÷1000) cumulative
    * histogram, rank only the one ~0.1%-wide hash slice that
    * straddles each quota. No window ever sorts a whole stratum (the
    * variable per-group quota is why the constant-k heap rewrite
    * can't apply, but the histogram walk doesn't need it). The kept
    * set is bit-identical to the naive full-rank window.
    *
    * @param mass per-row mass column (token count, byte size);
    *             integer-typed, summed exactly.
    * @return the selected rows of `df`, original columns.
    */
  def temperatureBySource(df: DataFrame, stratum: Column, id: Column,
                          mass: Column, sampleN: Long,
                          seed: Long = 42L): DataFrame = {
    require(sampleN > 0, s"temperatureBySource: sampleN must be positive, got $sampleN")
    val spark = df.sparkSession
    import spark.implicits._
    val masses = df.groupBy(stratum.cast("string").as("__stratum"))
      .agg(sum(mass.cast("long")).as("__mass"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    val ws = masses.map { case (s, n) => s -> math.sqrt(n.toDouble) }
    val total = ws.foldLeft(0.0)(_ + _._2)
    require(total > 0, "temperatureBySource: zero total mass")
    val quotas = ws.toSeq.map { case (s, w) =>
      (s, math.floor(sampleN * w / total).toLong)
    }
    val bucket = pmod(xxhash64(lit(seed), id), lit(M))
    StratifiedTopQuota.take(df, stratum,
      ord = Seq(bucket, id),
      coarse = floor(bucket / lit(1000L)),
      quotas = broadcast(quotas.toDF("__stratum", "__quota")))
  }

  /** D49: UniMax-style max-uniform allocation (Chung et al. 2023) —
    * draw a `budget`-row sample spread as UNIFORMLY across strata as
    * the data allows: small strata are included WHOLE (capped at
    * their available rows), and the budget they can't absorb cascades
    * to the larger ones. Where D48's temperature mix flattens
    * proportionally (head sources still dominate, just less), UniMax
    * is the end of that dial: perfect uniformity up to availability —
    * the multilingual recipe that stops a 70%-English corpus from
    * producing a 70%-English mixture.
    *
    * Allocation is the exact integer water-fill: strata sorted by
    * (available rows asc, name asc), each takes
    * `min(available, remaining div strataLeft)` — every step BIGINT,
    * so the quotas (and the kept set) are bit-reproducible in any
    * engine; the DuckDB oracle replays the same fold as a recursive
    * CTE. The per-stratum counts collapse to one row per stratum
    * before the driver loop sees them (the same aggregate-sized
    * driver state as [[temperatureBySource]]). Selection within a
    * stratum is the seeded-hash ranking through the
    * [[StratifiedTopQuota]] boundary-bucket walk — no full-stratum
    * sorts, deterministic, retry-stable.
    *
    * Up to `strata − 1` rows of the budget can go unspent (integer
    * floors, no fractional redistribution) — the deterministic
    * trade documented over a ±1-row reshuffle no engine would
    * reproduce identically.
    */
  def waterFillByStratum(df: DataFrame, stratum: Column, id: Column,
                         budget: Long, seed: Long = 42L): DataFrame = {
    require(budget > 0, s"waterFillByStratum: budget must be positive, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    // Total over null strata: coalesce to a sentinel so (a) the driver
    // sortBy never compares a null String (NPE on a count tie) and
    // (b) null-stratum rows form their own stratum instead of being
    // silently dropped by the quota join below.
    val stratumKey = coalesce(stratum.cast("string"), lit("\u0000<null>"))
    val counts = df.groupBy(stratumKey.as("__stratum"))
      .agg(count(lit(1)).as("__m"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (s, m) => (m, s) }
    require(counts.nonEmpty, "waterFillByStratum: empty input")
    val n = counts.length
    var rem = budget
    val quotas = counts.zipWithIndex.map { case ((s, cap), i) =>
      val a = math.min(cap, rem / (n - i))
      rem -= a
      (s, a)
    }
    val bucket = pmod(xxhash64(lit(seed), id), lit(M))
    StratifiedTopQuota.take(df, stratumKey,
      ord = Seq(bucket, id),
      coarse = floor(bucket / lit(1000L)),
      quotas = broadcast(quotas.toSeq.toDF("__stratum", "__quota")))
  }
}
