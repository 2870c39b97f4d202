package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Unigram language-model scoring — the CCNet-style (Wenzek et al.
  * 2020) quality signal: score each document by its per-token
  * cross-entropy under a reference LM; natural prose scores low,
  * gibberish and boilerplate score high, and a percentile threshold
  * (D33's machinery) turns the score into a keep/drop curation rule.
  *
  * Model: top-K vocabulary by corpus frequency with add-one smoothing
  * folded over an explicit OOV mass — P(w) = (c_w + 1) / (N + K + 1)
  * for vocab words, P(oov) = 1 / (N + K + 1), where N counts ALL
  * corpus tokens and K = |vocab|. (CCNet trains a 5-gram KenLM on
  * clean text; the unigram variant keeps the same pipeline role with
  * a broadcastable model.)
  *
  * Scale shape, mirroring BM25's discipline (TextRank.scala):
  *  - TRAINING is one explode → partial-aggregated count shuffle
  *    (exchange carries ~distinct words) + a TakeOrdered top-K — the
  *    same cost as D16's vocabulary pass.
  *  - SCORING is ZERO shuffle: the model rides the plan as a map
  *    literal (K entries, KBs), each doc folds its own tokens through
  *    `aggregate` — whole-stage codegen, corpus never moves.
  *  - The ln of each probability is computed ONCE, driver-side, at
  *    train time; the scoring fold is pure IEEE +,/ over those
  *    constants. Cross-engine, only `ln` can drift (libm ulp), which
  *    the 6-dp rounding on the published score absorbs on both sides
  *    — the BM25 oracle argument, reused.
  */
object LanguageModel {

  /** Trained unigram model: word → ln P(w), plus the OOV ln-prob.
    * An empty `lnP` is legal (corpus with no tokens — e.g. everything
    * span-stripped upstream): every token scores as OOV, token-less
    * docs score the 0.0 sentinel, matching the oracle's contract.
    */
  final case class Unigram(lnP: Map[String, Double], lnOov: Double)

  /** Tokens with the empty-document guard (`split(trim(''))` is [''],
    * not [] — the shared pitfall).
    */
  private def toks(c: Column): Column =
    when(length(trim(c)) > 0, TextFunctions.tokens(c))
      .otherwise(array().cast("array<string>"))

  /** One counting pass over the reference corpus; ties in the top-K
    * cut break by word so the vocabulary is deterministic.
    */
  def train(corpus: DataFrame, textCol: String, topK: Int = 256): Unigram = {
    val cnt = corpus
      .select(explode(toks(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      // two actions read this (total + top-K cut); without the persist
      // each would re-run the full tokenize/explode/shuffle — "one
      // counting pass" only holds if the aggregate is shared
      .persist()
    try {
      val agg = cnt.agg(sum(col("c"))).head()
      val n = if (agg.isNullAt(0)) 0L else agg.getLong(0)
      val top = cnt.orderBy(col("c").desc, col("w")).limit(topK).collect()
      val d = (n + top.length + 1).toDouble
      Unigram(
        top.map(r => r.getString(0) -> math.log((r.getLong(1) + 1) / d)).toMap,
        math.log(1 / d))
    } finally { cnt.unpersist(); () }
  }

  /** Per-doc cross-entropy column: -(Σ ln P(w_i)) / n, rounded to 6 dp
    * (0.0 for token-less docs). Pure fold over plan literals — no
    * shuffle, no join.
    */
  def crossEntropy(textCol: Column, lm: Unigram): Column = {
    val t = toks(textCol)
    // a degenerate (empty-vocab) model scores every token as OOV — an
    // empty `map()` literal is not constructible, so branch
    val perToken: Column => Column =
      if (lm.lnP.isEmpty) _ => lit(lm.lnOov)
      else {
        val mapLit = map(
          lm.lnP.toSeq.sortBy(_._1)
            .flatMap { case (w, p) => Seq(lit(w), lit(p)) }: _*)
        w => coalesce(element_at(mapLit, w), lit(lm.lnOov))
      }
    val total = aggregate(t, lit(0.0), (acc, w) => acc + perToken(w))
    when(size(t) > 0, round(-total / size(t), 6)).otherwise(lit(0.0))
  }

  /** The full query face: train on `corpus`, score every row of it.
    * (Scoring a different frame against a reference corpus is the
    * same call with two frames — train(reference) + withColumn here.)
    */
  def scoreCorpus(corpus: DataFrame, textCol: String, idCol: String,
                  topK: Int = 256): DataFrame = {
    val lm = train(corpus, textCol, topK)
    corpus.select(col(idCol).as("id"),
      size(toks(col(textCol))).as("n_tokens"),
      crossEntropy(col(textCol), lm).as("cross_entropy"))
  }
}
