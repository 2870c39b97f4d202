package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus snapshots
  * (SURVEY §2.D52) — the Population Stability Index, the standard
  * "did the incoming crawl shift the mix?" gate a training-data
  * pipeline runs before admitting a new batch: bucket a categorical
  * (or bucketed-numeric) key on both sides, compare the two
  * distributions per bucket, alarm on the sum. PSI reads on the usual
  * industry scale (<0.1 stable, 0.1–0.25 drifting, >0.25 broken);
  * per-bucket terms localize WHICH stratum moved — the actionable
  * half of the report.
  *
  * Determinism — the only non-rational op is one `ln` per bucket:
  * counts are exact integers, the add-one smoothing (which also
  * guards empty cells) keeps both numerators positive, p and q are
  * single int/int→double divides, and the emitted term rounds to
  * 6 dp — the D37/BM25 argument, so the DuckDB oracle hash-matches.
  *
  * Scale shape: two partial-agg'd count passes (shuffle carries
  * bucket cardinality, never rows), a full outer join of the two
  * aggregate frames on the bucket key, and one broadcast row of
  * totals. Nothing touches row-level data after the first agg.
  */
object Drift {

  /** Per-bucket PSI report between `ref` and `cur` on `key`.
    *
    * @return (bucket, ref_n, cur_n, p, q, psi_term) one row per
    *         bucket present on either side, plus exact counts;
    *         Σ psi_term is the headline index. p/q carry add-one
    *         smoothing over the union bucket count, so terms are
    *         finite even for one-sided buckets.
    */
  def psi(ref: DataFrame, cur: DataFrame, key: Column): DataFrame = {
    val r = ref.groupBy(key.cast("string").as("bucket"))
      .agg(count(lit(1)).as("ref_n"))
    val c = cur.groupBy(key.cast("string").as("bucket"))
      .agg(count(lit(1)).as("cur_n"))
    psiFromCounts(r, c)
  }

  /** The PSI arithmetic over PRE-AGGREGATED per-bucket counts —
    * `(bucket, ref_n)` × `(bucket, cur_n)`. Split out so callers that
    * already hold count aggregates (the streaming monitor's additive
    * per-batch histograms, a persisted reference artifact) run the
    * IDENTICAL expression tree as [[psi]] — same smoothing, same
    * divides, same rounding — and therefore produce bit-identical
    * doubles.
    */
  def psiFromCounts(refCounts: DataFrame, curCounts: DataFrame): DataFrame = {
    val joined = refCounts.join(curCounts, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    val totals = joined.agg(
      sum(col("ref_n")).as("__rt"), sum(col("cur_n")).as("__ct"),
      count(lit(1)).as("__k"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("ref_n"), col("cur_n"),
        ((col("ref_n") + lit(1L)).cast("double") /
          (col("__rt") + col("__k")).cast("double")).as("p"),
        ((col("cur_n") + lit(1L)).cast("double") /
          (col("__ct") + col("__k")).cast("double")).as("q"))
      .select(col("bucket"), col("ref_n"), col("cur_n"),
        round(col("p"), 6).as("p"), round(col("q"), 6).as("q"),
        round((col("p") - col("q")) * log(col("p") / col("q")), 6)
          .as("psi_term"))
  }
}
