package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Resample}

/** End-to-end training-corpus preparation (the capstone composition of
  * SURVEY §2.D): [optional span-granular boilerplate removal] →
  * quality gate → exact dedup → near-dup resolution → benchmark
  * decontamination → [optional per-stratum quota cap] → mixture
  * resampling → train/val/test split → deterministic order key. One
  * lazy DataFrame composition — Catalyst sees the whole flow, so the
  * quality filter pushes into the scan and stages share the corpus
  * scan where possible. The three frames that feed MULTIPLE
  * downstream legs (URL survivors, exact-dedup survivors, near-dup
  * survivors) are materialized via [[graft.operators.Materialize.cut]]
  * — as pure lazy plans the legs multiply, and the stage-0 prefix
  * re-ran ~12× in the final plan (round-17 measurement); real
  * pipelines stage exactly these survivor sets to the lake.
  *
  * Stage shapes at 100 TB (each pinned individually by its operator's
  * spec; PipelineSpec pins the composed invariants):
  *  - quality gate: pure projection+filter, no shuffle
  *  - exact dedup: digest groupBy, 32-byte shuffle rows
  *  - near-dup: LSH candidates (band-bucketed, id-only exchanges) +
  *    exact-Jaccard verify + pointer-jump CC — the [[Dedup.resolveCandidates]]
  *    scale path, never the Σ freq² all-pairs index
  *  - decontamination: bench grams broadcast (or bloom-prefiltered join)
  *  - resample/split/order: seeded-hash projections, shuffle-free
  */
object CorpusPipeline {

  /** @param minQuality      drop docs scoring below ([[TextFunctions.qualityScore]])
    * @param nearDupThreshold exact-Jaccard bar for near-dup rejection
    * @param fractionsByLang  per-language keep fractions (mixture)
    * @param splitWeights     train/val/test relative weights
    * @param stripSpans      Some((n, minCount)): rewrite texts through
    *                        [[Dedup.stripRepeatedSpans]] FIRST, so all
    *                        later stages (quality, digests, shingles)
    *                        see the de-boilerplated text. The strip
    *                        subtree then feeds EVERY downstream leg of
    *                        this one-lazy-plan composition — on wide
    *                        corpora, persist `docs` before calling so
    *                        its scans are shared (caller owns the
    *                        handle; see the operator's scaladoc)
    * @param quotaPerStratum Some((column, k)): cap survivors per
    *                        stratum (e.g. source domain) after
    *                        decontamination, lowest id kept
    * @param urlDedupCol     Some(col): the crawl-URL column. Runs
    *                        URL-level dedup BEFORE any content stage
    *                        (the crawl-frontier rule, D128 ∘ D30):
    *                        canonicalize via [[graft.functions
    *                        .UrlKernels.canonicalize]] and keep ONE
    *                        doc per canonical URL — longest text,
    *                        ties to the smallest id. Syntactic URL
    *                        aliases never reach the quality/digest/
    *                        shingle machinery, which both removes
    *                        trivially-duplicated work and prevents
    *                        alias fetches from voting in near-dup
    *                        clusters. One shuffle (window keyed on
    *                        the canonical URL; in-group sort is
    *                        alias-count-sized, single digits).
    */
  case class Config(
      minQuality: Double = 0.2,
      shingleSize: Int = 3,
      nearDupThreshold: Double = 0.8,
      contaminationNgram: Int = 8,
      fractionsByLang: Map[String, Double] = Map.empty,
      defaultFraction: Double = 1.0,
      splitWeights: Seq[Double] = Seq(0.9, 0.05, 0.05),
      seed: Long = 42L,
      stripSpans: Option[(Int, Long)] = None,
      quotaPerStratum: Option[(String, Int)] = None,
      urlDedupCol: Option[String] = None)

  /** @param docs  corpus with (idCol: long, textCol: string)
    * @param bench eval/benchmark docs with the same two columns
    * @return surviving docs: original columns + quality, lang, split,
    *         sort_key (order by sort_key for the training sequence)
    */
  /** Named stage frames of one pipeline build — the audit face reads
    * these; `run` returns only the final frame.
    */
  final case class Stages(stages: Seq[(String, DataFrame)]) {
    def result: DataFrame = stages.last._2
  }

  def run(docs: DataFrame, bench: DataFrame,
          textCol: String, idCol: String,
          cfg: Config = Config()): DataFrame =
    build(docs, bench, textCol, idCol, cfg).result

  /** Per-stage survivorship audit — the data-ablation bookkeeping a
    * corpus card publishes (rows in/out/dropped per stage). Each
    * stage frame is persisted before its count so the O(stages)
    * count actions re-read cached rows instead of re-running the
    * lineage prefix per stage (audit is an explicitly materializing
    * mode — `run` stays one lazy plan).
    */
  def audit(docs: DataFrame, bench: DataFrame,
            textCol: String, idCol: String,
            cfg: Config = Config()): DataFrame = {
    val spark = docs.sparkSession
    val built = build(docs, bench, textCol, idCol, cfg)
    val persisted = built.stages.map { case (n, df) => (n, df.persist()) }
    try {
      val counts = persisted.zipWithIndex.map { case ((n, df), i) =>
        (n, i, df.count())
      }
      val rows = counts.map { case (n, i, c) =>
        val prev = if (i == 0) c else counts(i - 1)._3
        (n, i, c, prev - c)
      }
      import spark.implicits._
      rows.toDF("stage", "stage_order", "rows_out", "rows_dropped")
    } finally persisted.foreach { case (_, df) => df.unpersist(); () }
  }

  private def build(docs: DataFrame, bench: DataFrame,
                    textCol: String, idCol: String,
                    cfg: Config): Stages = {
    // 0. (optional) span-granular boilerplate removal — BEFORE any
    // content-derived stage, so quality scores, digests, and shingles
    // all see the rewritten text
    val input = cfg.stripSpans match {
      case None => docs
      case Some((n, minCount)) =>
        val cleaned = Dedup.stripRepeatedSpans(docs, textCol, idCol, n, minCount)
          .select(col("id").as("__sid"), col("clean_text"))
        docs.drop(textCol)
          .join(cleaned, docs(idCol) === col("__sid"))
          .withColumnRenamed("clean_text", textCol)
          .drop("__sid")
    }

    // 0b. (optional) URL-level dedup — BEFORE any content-derived
    // stage (see Config.urlDedupCol). The survivor frame is
    // materialized: it feeds every downstream leg of the composition,
    // and as a lazy plan the window shuffle (and the whole stage-0
    // prefix) would re-run once per leg — ~12× by the final plan (the
    // dedup legs below multiply: clean 2× nearDeduped, nearDeduped 3×
    // exactDeduped, exactDeduped 2× scored). One cut makes the prefix
    // run once (guide §1.2: remove repeated passes first).
    val urled = cfg.urlDedupCol match {
      case None => input
      case Some(u) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(graft.functions.UrlFunctions.canonical_url(col(u)))
          .orderBy(length(col(textCol)).desc, col(idCol))
        graft.operators.Materialize.cut(
          input.withColumn("__urn", row_number().over(w))
            .filter(col("__urn") === 1).drop("__urn", u))
    }

    // 1. quality gate
    val scored = urled
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .filter(col("quality") >= cfg.minQuality)

    // 2. exact dedup — keep the canonical (min-id) copy per digest.
    // Materialized: three near-dup legs (LSH candidates, the verify/
    // resolve pass, the survivor semi-join) each consume this frame —
    // as a lazy plan each would re-run the digest groupBy + everything
    // above it.
    val exactKeep = Dedup.exact(scored, col(textCol), col(idCol))
      .select(col("canonical_id").as("__keep"))
    val exactDeduped = graft.operators.Materialize.cut(scored
      .join(exactKeep, scored(idCol) === col("__keep"), "left_semi"))

    // 3. near-dup resolution (LSH candidates → verified edges → CC);
    //    keep each component's representative
    val cand = Dedup.minhashLsh(exactDeduped, textCol, idCol,
      cfg.shingleSize, threshold = cfg.nearDupThreshold)
    val resolved = Dedup.resolveCandidates(exactDeduped, textCol, idCol,
      cand.select(col("id_a"), col("id_b")), cfg.shingleSize,
      cfg.nearDupThreshold, verified = true)
    val repIds = resolved.filter(col("id") === col("canonical_id"))
      .select(col("id").as("__rep"))
    // materialized for the same reason: the decontamination probe AND
    // the anti-join read it
    val nearDeduped = graft.operators.Materialize.cut(exactDeduped
      .join(repIds, exactDeduped(idCol) === col("__rep"), "left_semi"))

    // 4. benchmark decontamination
    val dirty = Dedup.contamination(nearDeduped, bench, textCol, idCol,
        cfg.contaminationNgram, benchIsSmall = Some(true))
      .select(col("doc_id").as("__dirty")).distinct()
    val clean = nearDeduped
      .join(dirty, nearDeduped(idCol) === col("__dirty"), "left_anti")

    // 4b. (optional) per-stratum quota cap on the decontaminated set
    val capped = cfg.quotaPerStratum match {
      case None => clean
      case Some((stratumCol, k)) =>
        Resample.quotaCap(clean, col(stratumCol), Seq(col(idCol)), k)
    }

    // 5. language mixture, 6. split, 7. deterministic order key
    val withLang = capped.withColumn("lang", TextFunctions.langId(col(textCol)))
    val sampled = Resample.byStratum(withLang, col("lang"), col(idCol),
      cfg.fractionsByLang, cfg.defaultFraction, cfg.seed)
    val fin = Resample.splitByHash(sampled, col(idCol), cfg.splitWeights, cfg.seed)
      .withColumn("sort_key", xxhash64(lit(cfg.seed), col(idCol)))
    Stages(Seq("0_input" -> input) ++
      cfg.urlDedupCol.map(_ => "0b_url_dedup" -> urled).toSeq ++ Seq(
      "1_quality_gate" -> scored,
      "2_exact_dedup" -> exactDeduped,
      "3_near_dedup" -> nearDeduped,
      "4_decontaminated" -> clean,
      "5_quota_capped" -> capped,
      "6_mixture_sampled" -> sampled,
      "7_final" -> fin))
  }
}
