package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.LanguageModel

/** Streaming face of the perplexity quality gate (SURVEY §2.E12 ∘
  * D47): continuous per-language fluency filtering of an incoming
  * document stream against thresholds frozen from a reference corpus.
  *
  * The batch cut (TextQueries.perplexityFilter) keeps the most-fluent
  * 70% per language by exact quota — a corpus-relative decision that
  * only makes sense over a closed set. The streaming production
  * semantics freeze that decision into per-language SCORE thresholds
  * (the worst kept score of the reference cut, persisted as a lake
  * artifact) and admit each arriving doc iff its cross-entropy under
  * the SAME frozen LM is within its language's threshold. This is how
  * CCNet-style gates actually deploy: train once, threshold forever,
  * re-fit offline when the corpus drifts.
  *
  * Scale shape — the whole gate is a STATELESS incremental plan: the
  * LM is a plan literal (zero-shuffle codegen'd fold, same as the
  * batch face), the thresholds join is a broadcast of ≤ |languages|
  * rows, and there is no state store, no watermark, no foreachBatch.
  * Every micro-batch costs exactly one scan of itself; a 1000-executor
  * cluster runs it embarrassingly parallel.
  *
  * Docs in languages absent from the threshold artifact are REJECTED
  * (no reference mass → no calibrated threshold → quarantine, the
  * conservative curation default), which the inner join implements
  * for free.
  */
object StreamingScoreFilter {

  /** Freeze per-language keep thresholds from a batch cut: the max
    * kept cross-entropy per language — i.e. the exact score boundary
    * the quota walk admitted. Aggregate-sized output (one row per
    * language).
    */
  def thresholds(batchCut: DataFrame, langCol: String = "lang",
                 scoreCol: String = "cross_entropy",
                 keptCol: String = "kept"): DataFrame =
    batchCut.filter(col(keptCol))
      .groupBy(col(langCol))
      .agg(max(col(scoreCol)).as("max_ce"))

  /** Persist the threshold artifact (tiny: one file, one row per
    * language). */
  def saveThresholds(t: DataFrame, path: String): Unit =
    t.coalesce(1).write.mode("overwrite").parquet(path)

  /** The continuous gate: score each streamed doc under the frozen
    * `lm` and keep it iff `cross_entropy <= max_ce(lang)`. Returns
    * the admitted stream with the score attached; plug into any sink.
    */
  def filtered(stream: DataFrame, lm: LanguageModel.Bigram,
               thresholds: DataFrame, textCol: String = "text",
               langCol: String = "lang"): DataFrame =
    stream
      .withColumn("cross_entropy",
        LanguageModel.crossEntropyBigram(col(textCol), lm))
      .join(broadcast(thresholds), Seq(langCol))
      .filter(col("cross_entropy") <= col("max_ce"))
      .drop("max_ce")
}
