package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Materialize, QualityClassifier, StratifiedTopQuota}

/** Streaming face of the curated-vs-crawl classifier gate (SURVEY
  * §2.E16 ∘ D56): continuous admission of an incoming document stream
  * by the frozen fastText-style margin.
  *
  * Deployment shape mirrors E12's perplexity gate: the batch side
  * calibrates ONCE on a closed reference corpus — train the log-odds
  * model, keep the top `keepRate` of docs by margin via the exact
  * boundary-bucket quota walk — and production freezes that decision
  * into (model literal, scalar margin threshold). Each arriving doc
  * is admitted iff its margin under the SAME frozen model clears the
  * threshold.
  *
  * Scale: STATELESS incremental plan — the model rides the plan as a
  * map literal (zero-shuffle codegen fold per doc), the threshold is
  * a literal, no state store, no watermark. Each micro-batch costs
  * one scan of itself.
  */
object StreamingClassifierGate {

  /** Calibration cut: mark the top `keepRate` of docs by margin
    * (highest first, doc_id tiebreak), exact via the quota walk —
    * no unbounded sort window. Returns (doc_id, margin, kept).
    */
  def batchCut(docs: DataFrame, m: QualityClassifier.Model,
               keepRate: Double, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val scored = Materialize.cut(docs.select(col(idCol).as("doc_id"),
      QualityClassifier.margin(col(textCol), m).as("margin"))
      // quota ranks ascending: negate so the HIGHEST margin ranks first
      .withColumn("__neg", -col("margin")))
    val quotas = scored.agg(
      ceil(count(lit(1)) * lit(keepRate)).cast("long").as("__quota"))
      .select(lit("all").as("__stratum"), col("__quota"))
    StratifiedTopQuota.markKept(scored,
        stratum = lit("all"),
        ord = Seq(col("__neg"), col("doc_id")),
        coarse = when(isnan(col("__neg")), lit(Long.MaxValue))
          .otherwise(floor(col("__neg") * lit(100.0))),
        quotas = broadcast(quotas),
        keptCol = "kept")
      .select(col("doc_id"), col("margin"), col("kept"))
  }

  /** Freeze the admission threshold: the worst (minimum) kept margin
    * — the exact boundary the quota walk admitted. One scalar.
    */
  def threshold(cut: DataFrame, marginCol: String = "margin",
                keptCol: String = "kept"): Double =
    cut.filter(col(keptCol)).agg(min(col(marginCol))).head().getDouble(0)

  /** The continuous gate: margin under the frozen model, admit iff
    * `margin >= thr`. Works identically on a streaming or static
    * frame — the plan is stateless, so stream ≡ batch by
    * construction (pinned in StreamingSpec).
    */
  def filtered(stream: DataFrame, m: QualityClassifier.Model,
               thr: Double, textCol: String = "text"): DataFrame =
    stream
      .withColumn("margin", QualityClassifier.margin(col(textCol), m))
      .filter(col("margin") >= thr)
}
