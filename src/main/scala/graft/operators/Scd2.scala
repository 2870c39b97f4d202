package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history from a change log.
  *
  * The reference keeps dims current-state-only via ON CONFLICT DO
  * UPDATE (fpl-data-pipeline sql_queries.py:28-109) — history is lost
  * on every upsert. The warehouse-native completion of that surface is
  * SCD Type 2: keep every attribute version as a row with a validity
  * interval, so any past state is queryable (and the as-of join, C13,
  * has something to join against).
  *
  * Spark-first shape: one shuffle on the business key. A `lag` over
  * (key, order) marks rows where the tracked attributes differ from the
  * predecessor (null-safe struct compare — a NULL attribute is a value,
  * not a wildcard); change rows survive a filter that PRESERVES the
  * sort, so the follow-up `lead` for `valid_to` reuses the same
  * exchange and ordering — Catalyst plans exactly one Exchange + one
  * Sort for the whole history build.
  *
  * Version boundaries: `valid_from` = the change row's own order value,
  * `valid_to` = the next change's order value (null = current, i.e.
  * half-open intervals [from, to) that tile each key's timeline with no
  * gaps or overlaps). Ties on the order column are broken by `tiebreak`
  * so re-runs are deterministic under any partitioning.
  */
object Scd2 {

  def history(df: DataFrame, keys: Seq[String], attrs: Seq[String],
              orderCol: String, tiebreak: String): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "scd2 needs keys and attrs")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol), col(tiebreak))
    val tracked = struct(attrs.map(col): _*)
    // first row per key: lag is NULL, <=> yields false → opens a version
    val changed = !(tracked <=> lag(tracked, 1).over(w))
    df.withColumn("__chg", changed)
      .filter(col("__chg"))
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keys.map(col) ++ attrs.map(col)
        ++ Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Point-in-time state: the version row valid at `asOf` per key. */
  def stateAt(history: DataFrame, asOf: Column): DataFrame =
    history.filter(col("valid_from") <= asOf &&
      (col("valid_to").isNull || asOf < col("valid_to")))

  /** Incremental SCD2 apply — the daily dimension job: extend an
    * existing [[history]] with a change-log batch WITHOUT rebuilding
    * from the full log. Closed versions and untouched keys pass
    * through verbatim; per touched key, only the CURRENT version row
    * seeds a re-run of the change detection over (seed ∪ batch), so
    * the work is O(batch + touched keys' current rows) — never a
    * re-sort of the full history, the shape that matters when the
    * dimension's history is years deep.
    *
    * CONTRACT (the standard append-only assumption): every batch row
    * is STRICTLY LATER in `orderCol` than every already-applied log
    * row of its key. Under it, applyIncremental(history(log₁), log₂)
    * ≡ history(log₁ ∪ log₂) exactly: the last log₁ row's tracked
    * attrs are the current version's attrs, so seeding with the
    * current row reproduces the same change decisions (the seed's
    * tiebreak is irrelevant — strictly-later batch rows can never tie
    * with it). A batch row landing BETWEEN historical rows violates
    * the contract and must go through a full [[history]] rebuild.
    */
  def applyIncremental(history: DataFrame, batch: DataFrame,
                       keys: Seq[String], attrs: Seq[String],
                       orderCol: String, tiebreak: String): DataFrame = {
    val keyCols = keys.map(col)
    val logCols = keyCols ++ attrs.map(col) ++ Seq(col(orderCol), col(tiebreak))
    val touched = batch.select(keyCols: _*).distinct()
    val untouched = history.join(touched, keys, "left_anti")
    val touchedHist = history.join(touched, keys, "left_semi")
    val closed = touchedHist.filter(col("valid_to").isNotNull)
    // the current row as a pseudo-log seed: its attrs ARE the last
    // applied row's attrs, at its own valid_from
    val seed = touchedHist.filter(col("valid_to").isNull)
      .select(keyCols ++ attrs.map(col) :+
        col("valid_from").as(orderCol): _*)
      .withColumn(tiebreak,
        lit(null).cast(batch.schema(tiebreak).dataType))
      .select(logCols: _*)
    val rebuilt = this.history(
      seed.unionByName(batch.select(logCols: _*)),
      keys, attrs, orderCol, tiebreak)
    untouched.unionByName(closed).unionByName(rebuilt)
  }
}
