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

  /** D119: per-source Jensen–Shannon divergence (Lin 1991) between the
    * source's unigram distribution and the CORPUS-wide distribution —
    * "which provenance is most idiosyncratic", the lexical-level
    * source audit next to D98's volume concentration and D52's
    * categorical PSI: a source whose vocabulary diverges from the
    * corpus is either a domain treasure or contamination, and either
    * way the mixture weights (D48/D49/D69) should know. JSD is
    * symmetric, bounded in [0,1] bit, and finite even on disjoint
    * support — the properties PSI's add-one smoothing only
    * approximates.
    *
    * Determinism convention (published with the statistic, like a
    * histogram's bin edges): each PRESENT word's pointwise term
    * 0.5·(p·ln(p/m) + q·ln(q/m))/ln2 (m the midpoint) is quantized to
    * 1e-9 bits and summed as an exact integer — associative, so any
    * partition order yields the same sum — while the ABSENT-word tail
    * Σ_{w∉source} 0.5·q_w collapses to the closed form
    * 0.5·(N − S)/N over exact integer masses (S = corpus mass on the
    * source's support): no per-absent-word rows ever materialize.
    * Pointwise JS terms are nonnegative (log-sum inequality), so
    * half-up and half-away-from-zero quantization agree.
    *
    * Scale shape: ONE tokenize pass → (source, word) counts (the only
    * corpus-sized shuffle); the global census re-aggregates that frame;
    * the per-word join is word-keyed (never a driver vocab); per-source
    * totals and the grand total broadcast as aggregate-sized rows.
    * Cost is linear in |counts| — no source-pair × vocab blowup.
    */
  def jsSourceDivergence(docs: DataFrame, group: Column,
                         textCol: Column): DataFrame = {
    val LN2 = 0.6931471805599453
    val counts = Materialize.cut(docs
      .select(group.as("__g"),
        explode(LanguageModel.toks(textCol)).as("__w"))
      .groupBy(col("__g"), col("__w")).agg(count(lit(1)).as("c")))
    val gtot = counts.groupBy(col("__g"))
      .agg(sum(col("c")).cast("long").as("n_tokens"))
    val global = Materialize.cut(
      counts.groupBy(col("__w")).agg(sum(col("c")).cast("long").as("cg")))
    val nTot = global.agg(sum(col("cg")).cast("long").as("n_all"))
    val termed = counts.join(global, Seq("__w"))
      .join(broadcast(gtot), Seq("__g"))
      .crossJoin(broadcast(nTot))
      .withColumn("__nano", {
        val p = col("c").cast("double") / col("n_tokens").cast("double")
        val q = col("cg").cast("double") / col("n_all").cast("double")
        val m = (p + q) / lit(2.0)
        round((p * log(p / m) + q * log(q / m)) * lit(0.5) / lit(LN2)
          * lit(1e9), 0).cast("long")
      })
    termed.groupBy(col("__g"))
      .agg(count(lit(1)).cast("long").as("n_types"),
        max(col("n_tokens")).as("n_tokens"),
        sum(col("cg")).cast("long").as("__s"),
        sum(col("__nano")).cast("long").as("__nano_sum"))
      .crossJoin(broadcast(nTot))
      .select(col("__g").as("source"), col("n_types"), col("n_tokens"),
        round(col("__nano_sum").cast("double") / lit(1e9)
          + lit(0.5) * (col("n_all") - col("__s")).cast("double")
            / col("n_all").cast("double"), 6).as("jsd_bits"))
      .orderBy(col("source"))
  }
}
