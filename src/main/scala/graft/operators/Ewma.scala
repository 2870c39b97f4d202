package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average per entity.
  *
  * The reference's "form" metric is FPL's pre-computed rolling average
  * (fpl-data-pipeline sql_queries.py:111 just reads it); the engine
  * should be able to DERIVE such smoothed signals. EWMA is the
  * recursive one — s_i = α·x_i + (1−α)·s_{i−1} — which no window
  * frame expresses (every output depends on the full prefix).
  *
  * Spark-first shape: the recursion runs as a fold (`aggregate` HOF)
  * over each entity's period-ordered value array, built by ONE groupBy
  * — the shuffle carries per-period aggregates, never raw rows, and
  * the array length is the entity's period count (bounded and small:
  * dashboards smooth per-week/per-day series), not its event count.
  * The codegen'd fold beats the alternative — a window + N self-joins
  * or an unpartitioned sort — at any scale, and the left-to-right fold
  * order makes the float result deterministic under any partitioning
  * (same associativity every run, unlike a float `sum`).
  */
object Ewma {

  /** One row per key: period count and the EWMA of `value` over the
    * key's periods in `orderCol` order (seed = earliest value).
    *
    * `value` should be an exact per-period aggregate (e.g. a decimal
    * sum) — it is cast to double only at the fold input.
    */
  def smooth(df: DataFrame, key: String, orderCol: String,
             value: Column, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    // a null period value would poison the fold from that step onward
    // (alpha·x + (1−alpha)·null = null); null periods are dropped and
    // do not count toward n_periods — stated contract, not an accident
    val grouped = df.filter(value.isNotNull).groupBy(col(key))
      // struct sorts by its first field — orderCol — and periods are
      // unique per key, so this is ORDER BY orderCol
      .agg(sort_array(collect_list(struct(col(orderCol), value.as("__v"))))
        .as("__arr"))
      .withColumn("__vals",
        transform(col("__arr"), s => s.getField("__v").cast("double")))
    grouped.select(
      col(key),
      size(col("__vals")).as("n_periods"),
      aggregate(
        slice(col("__vals"), lit(2),
          greatest(size(col("__vals")) - lit(1), lit(0))),
        element_at(col("__vals"), 1),
        (acc, x) => lit(alpha) * x + lit(1.0 - alpha) * acc).as("ewma"))
  }

  /** C61: Holt linear-trend smoothing (double exponential smoothing,
    * Holt 1957) — the forecast face the dashboard's rolling average
    * can't express: EWMA lags a trending series by construction; Holt
    * carries an explicit trend state and extrapolates one period out.
    *
    * l₁ = x₁, b₁ = x₂ − x₁; for t ≥ 2:
    * lₜ = α·xₜ + (1−α)(lₜ₋₁+bₜ₋₁), bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁;
    * forecast = lₙ + bₙ. Single-period keys have zero trend by
    * contract. Same plan shape as [[smooth]] — ONE groupBy whose
    * shuffle carries per-period aggregates, a bounded per-key fold,
    * deterministic under any partitioning; the two-component state
    * rides an array<double> accumulator (the oracle mirrors it with
    * the list-element-typed accumulator trick).
    */
  def holt(df: DataFrame, key: String, orderCol: String,
           value: Column, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta must be in [0,1], got $beta")
    val grouped = df.filter(value.isNotNull).groupBy(col(key))
      .agg(sort_array(collect_list(struct(col(orderCol), value.as("__v"))))
        .as("__arr"))
      .withColumn("__vals",
        transform(col("__arr"), s => s.getField("__v").cast("double")))
    val vals = col("__vals")
    val init = array(
      element_at(vals, 1),
      when(size(vals) >= 2,
        element_at(vals, 2) - element_at(vals, 1)).otherwise(lit(0.0)))
    val state = aggregate(
      slice(vals, lit(2), greatest(size(vals) - lit(1), lit(0))),
      init,
      (acc, x) => {
        // newl computed once, used twice — same bits as the oracle's
        // textually-duplicated expression
        val newl = lit(alpha) * x +
          lit(1.0 - alpha) * (element_at(acc, 1) + element_at(acc, 2))
        array(newl,
          lit(beta) * (newl - element_at(acc, 1)) +
            lit(1.0 - beta) * element_at(acc, 2))
      })
    grouped.select(
      col(key),
      size(vals).as("n_periods"),
      element_at(state, 1).as("level"),
      element_at(state, 2).as("trend"),
      (element_at(state, 1) + element_at(state, 2)).as("forecast"))
  }

  /** C65: Holt–Winters additive seasonal smoothing (triple
    * exponential smoothing, Winters 1960) — the face [[holt]] can't
    * express: a series with a repeating within-period pattern (weekly
    * shape on daily grain) needs explicit seasonal state or the trend
    * chases the season. Classic init over the first two seasons
    * (l = mean of season 1, b = the season-over-season mean slope,
    * s_j = x_j − l), then for t > m:
    * lₜ = α(xₜ−sₜ₋ₘ) + (1−α)(lₜ₋₁+bₜ₋₁), bₜ = β(lₜ−lₜ₋₁)+(1−β)bₜ₋₁,
    * sₜ = γ(xₜ−lₜ) + (1−γ)sₜ₋ₘ; forecast = l + b + s_{T+1−m}.
    *
    * Same plan shape as [[holt]]: ONE groupBy carrying per-period
    * aggregates, a bounded per-key fold, deterministic under any
    * partitioning. The (level, trend, step counter, m seasonals)
    * state rides an array<double> accumulator whose seasonal slot
    * updates through an indexed `transform` — the oracle mirrors it
    * with DuckDB's indexed list lambda (1-based there, 0-based here).
    * Keys with fewer than 2m periods are dropped (the init needs two
    * full seasons — stated contract).
    */
  def holtWinters(df: DataFrame, key: String, orderCol: String,
                  value: Column, alpha: Double, beta: Double,
                  gamma: Double, m: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta in [0,1], got $beta")
    require(gamma >= 0 && gamma <= 1, s"gamma in [0,1], got $gamma")
    require(m >= 2, s"season length must be >= 2, got $m")
    val grouped = df.filter(value.isNotNull).groupBy(col(key))
      .agg(sort_array(collect_list(struct(col(orderCol), value.as("__v"))))
        .as("__arr"))
      .withColumn("__vals",
        transform(col("__arr"), s => s.getField("__v").cast("double")))
      .filter(size(col("__vals")) >= 2 * m)
      // level/trend init bound once as columns so the fold tree stays
      // readable; the oracle computes them in their own CTE the same way
      .withColumn("__l0",
        aggregate(slice(col("__vals"), 1, m), lit(0.0), (a, x) => a + x)
          / m)
      .withColumn("__b0",
        aggregate(sequence(lit(1), lit(m)), lit(0.0),
          (a, i) => a + (element_at(col("__vals"), i + m) -
            element_at(col("__vals"), i))) / (m * m))
    val vals = col("__vals")
    // acc = [l, b, t, s_1..s_m] (1-based positions 1,2,3,4..m+3)
    val init = concat(
      array(col("__l0"), col("__b0"), lit(m).cast("double")),
      transform(slice(vals, 1, m), x => x - col("__l0")))
    val state = aggregate(
      slice(vals, lit(m + 1), greatest(size(vals) - m, lit(0))),
      init,
      (acc, x) => {
        val t = element_at(acc, 3) + lit(1.0)
        val slot = ((t.cast("int") - 1) % m) + 1
        val sOld = element_at(acc, slot + 3)
        val l = element_at(acc, 1)
        val b = element_at(acc, 2)
        val newl = lit(alpha) * (x - sOld) + lit(1.0 - alpha) * (l + b)
        val newb = lit(beta) * (newl - l) + lit(1.0 - beta) * b
        val news = lit(gamma) * (x - newl) + lit(1.0 - gamma) * sOld
        transform(acc, (v, i) =>
          when(i === 0, newl).when(i === 1, newb).when(i === 2, t)
            .when(i === slot + 2, news)
            .otherwise(v))
      })
    val nextSlot = (size(vals) % m) + 1
    grouped.select(
      col(key),
      size(vals).as("n_periods"),
      element_at(state, 1).as("level"),
      element_at(state, 2).as("trend"),
      element_at(state, nextSlot + 3).as("season_next"),
      (element_at(state, 1) + element_at(state, 2) +
        element_at(state, nextSlot + 3)).as("forecast"))
  }
}
