package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DoReMi-style domain reweighting (SURVEY §2.D69).
  *
  * DoReMi (Xie et al. 2023) tunes the mixture weights of a training
  * corpus's domains by Group-DRO multiplicative updates: domains
  * whose proxy-model loss exceeds the reference baseline get
  * up-weighted, so the final mixture spends its token budget where
  * the model is worst. This operator is the static-loss snapshot of
  * that recipe — the per-domain loss is measured ONCE (the corpus
  * unigram-LM cross-entropy of §2.D37, the same frozen-scorer
  * pattern the D47 perplexity gate uses) and the exponentiated-
  * gradient iteration runs on that snapshot:
  * {{{ excess_d = max(0, L_d − L̄)
  *     α_d ← w_d · exp(η · excess_d)
  *     w_d ← (1−c) · α_d / Σα + c / D }}}
  * with the uniform-smoothing mix `c` exactly as published. The
  * output weights drive §2.D48's temperature/quota mixers.
  *
  * Determinism — every input to the iteration is an exact integer:
  * per-doc cross-entropy is the ALREADY 6-dp-rounded D37 score
  * lifted to micro-units (an integer-valued double → BIGINT, exact
  * in any engine), per-domain mean is an integer `DIV`, and the
  * iteration itself is a driver-side left fold over the domains in
  * sorted order — the DuckDB oracle replays the identical fold with
  * `list_reduce` over a sorted `list()`, so the only cross-engine
  * drift is `exp`/division ulps, absorbed by the 6-dp rounding of
  * the released weights.
  *
  * Scale shape — the corpus-sized work is exactly the D37 scoring
  * pass (broadcast model literals, zero shuffle) plus ONE
  * partial-agg'd `groupBy(domain)`; the fold then runs on the
  * aggregate-sized domain table (|domains| rows — the same
  * driver-state bound as [[Resample]]'s quota walks). At 100 TB the
  * iteration cost is independent of corpus size by construction.
  */
object Doremi {

  /** Multiplicative-weights domain mixture from a frozen loss
    * snapshot.
    *
    * @param scored    per-document frame carrying `domainCol` and
    *                  `lossCol` (a 6-dp-rounded DOUBLE — D37/D37b
    *                  output; coarser inputs work, finer ones lose
    *                  the exactness argument).
    * @param domainCol mixture domain column (e.g. source).
    * @param lossCol   per-doc loss column.
    * @param eta       learning rate of the exponentiated update.
    * @param smoothing uniform-mix coefficient c ∈ [0, 1).
    * @param rounds    fixed iteration count (oracle unrolls exactly
    *                  this many).
    * @return one row per domain: (domain, n_docs, mean_loss_micro,
    *         weight) — `mean_loss_micro` the exact integer
    *         micro-unit mean, `weight` the 6-dp-rounded final
    *         mixture weight (weights sum to ~1).
    */
  def domainWeights(scored: DataFrame, domainCol: String, lossCol: String,
                    eta: Double = 0.1, smoothing: Double = 0.01,
                    rounds: Int = 10): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(smoothing >= 0 && smoothing < 1,
      s"smoothing must be in [0,1), got $smoothing")
    val spark = scored.sparkSession
    // lift the 6-dp score to exact integer micro-units: round() makes
    // the double integer-valued, so the cast is exact in any engine.
    // Null/NaN scores count as 0 loss (they must not silently vanish
    // from the domain mass), and a null domain folds to a sentinel so
    // the driver-side sorted fold stays total.
    val micro = round(coalesce(nanvl(col(lossCol), lit(0.0)), lit(0.0))
      * 1000000.0).cast("long")
    val dom = scored
      .groupBy(coalesce(col(domainCol).cast("string"), lit("__null__"))
        .as("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(micro).as("sm"))
      .select(col("domain"), col("n_docs"),
        expr("sm DIV n_docs").as("mean_loss_micro"), col("sm"))
    // aggregate-sized collect: one row per mixture domain
    val rows = dom.select(col("domain"), col("n_docs"),
        col("mean_loss_micro"), col("sm"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    require(rows.nonEmpty, "domainWeights: empty input")
    val d = rows.length
    // corpus-wide baseline: exact integer mean over ALL docs
    val totN = rows.foldLeft(0L)(_ + _._2)
    val totS = rows.foldLeft(0L)(_ + _._4)
    val lbar = Math.floorDiv(totS, totN) / 1000000.0
    val losses = rows.map(_._3 / 1000000.0)
    var w = Array.fill(d)(1.0 / d)
    var it = 0
    while (it < rounds) {
      val a = Array.tabulate(d) { i =>
        w(i) * math.exp(eta * math.max(0.0, losses(i) - lbar))
      }
      val s = a.foldLeft(0.0)(_ + _) // left fold in sorted-domain order
      w = a.map(ai => (1.0 - smoothing) * (ai / s) + smoothing / d)
      it += 1
    }
    // the result is |domains| rows already sitting on the driver — no
    // second read of the scoring plan, no join
    import spark.implicits._
    rows.zip(w).map { case ((d, n, mm, _), wi) =>
      (d, n, mm, BigDecimal(wi)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.toDF("domain", "n_docs", "mean_loss_micro", "weight")
  }
}
