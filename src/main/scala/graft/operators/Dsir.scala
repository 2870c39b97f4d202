package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * SURVEY §2.D45): pick training documents whose distribution matches
  * a small high-quality TARGET set (Wikipedia-like text, a trusted
  * domain slice) by importance weighting the raw corpus.
  *
  * Per document, the importance log-weight under bag-of-words feature
  * LMs is  log w(d) = Σ_i [ln p_target(w_i) − ln p_raw(w_i)] — the
  * paper uses hashed n-gram features; the engine's unigram LM
  * ([[LanguageModel.train]]: top-K vocab, add-one smoothing, explicit
  * OOV mass) plays the feature model role with the same add-one
  * estimator on both numerator and denominator. Sampling without
  * replacement ∝ w is the Gumbel-top-k trick: key(d) = log w(d) + g(d)
  * with g = −ln(−ln u), u uniform — the k largest keys ARE a weighted
  * sample without replacement (Efraimidis–Spirakis / Vieira 2014).
  *
  * Determinism at scale: u is a seeded-hash uniform
  * (`(xxhash64(seed, id) mod M + ½) / M` — never 0 or 1, so the double
  * ln never overflows), NOT an RNG draw, so the selected set is
  * reproducible under repartitioning, retry, and incremental growth.
  * Both LMs broadcast as plan literals (the [[LanguageModel]]
  * discipline), scoring is a zero-shuffle codegen fold over each doc's
  * own tokens, and the cut is one TakeOrdered(k). The only shuffles
  * are the two vocabulary counting passes. Cross-engine, only `ln` and
  * sum regrouping can drift (ulps); the published weight and key are
  * rounded to 6 dp and the cut orders on the rounded key (id
  * tiebreak) — the BM25 oracle argument.
  */
object Dsir {

  private val M = 1000000L

  /** Empty-document-safe whitespace tokens (`split(trim(''))` is [''],
    * not []).
    */
  private def toks(c: Column): Column =
    when(length(trim(c)) > 0, TextFunctions.tokens(c))
      .otherwise(array().cast("array<string>"))

  /** ln p(w) lookup under a trained unigram, as a plan-literal map. */
  private def lnP(lm: LanguageModel.Unigram): Column => Column =
    if (lm.lnP.isEmpty) _ => lit(lm.lnOov)
    else {
      val m = map(lm.lnP.toSeq.sortBy(_._1)
        .flatMap { case (w, p) => Seq(lit(w), lit(p)) }: _*)
      w => coalesce(element_at(m, w), lit(lm.lnOov))
    }

  /** Un-rounded Σ_i [ln p_target(w_i) − ln p_raw(w_i)] fold; 0.0 for
    * token-less docs.
    */
  def importanceLogWeight(textCol: Column, target: LanguageModel.Unigram,
                          raw: LanguageModel.Unigram): Column = {
    val (pt, pr) = (lnP(target), lnP(raw))
    aggregate(toks(textCol), lit(0.0), (acc, w) => acc + (pt(w) - pr(w)))
  }

  /** Train target + raw LMs, Gumbel-top-k select `k` docs from
    * `corpus`.
    *
    * @param target the distribution to match (typically a small,
    *               trusted slice; may overlap `corpus`)
    * @return (idCol, log_weight, gumbel_key) — the k selected docs,
    *         both scores rounded to 6 dp.
    */
  def resample(corpus: DataFrame, target: DataFrame, textCol: String,
               idCol: String, k: Int, vocabTopK: Int = 64,
               seed: Long = 42L): DataFrame = {
    require(k > 0, s"dsir: k must be positive, got $k")
    val lmT = LanguageModel.train(target, textCol, vocabTopK)
    val lmR = LanguageModel.train(corpus, textCol, vocabTopK)
    val logw = importanceLogWeight(col(textCol), lmT, lmR)
    val u = (pmod(xxhash64(lit(seed), col(idCol)), lit(M)).cast("double") +
      lit(0.5)) / lit(M.toDouble)
    val gumbel = -log(-log(u))
    corpus
      .withColumn("log_weight", round(logw, 6))
      .withColumn("gumbel_key", round(logw + gumbel, 6))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("log_weight"), col("gumbel_key"))
  }
}
