package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Linear bag-of-words quality classifier — the fastText-style gate
  * the GPT-3 / CCNet data pipelines use: score every document by how
  * much it looks like a small CURATED reference class versus the rest
  * of the crawl, then keep/reweight by the margin. (GPT-3 trained
  * logistic regression on hashed n-grams against WebText-as-positive;
  * the naive-Bayes log-odds below is the same linear form with
  * weights that have a closed form — no SGD loop — so training is
  * ONE counting pass and the model is exactly reproducible on any
  * engine.)
  *
  * Model: for the top-V corpus words (ties broken by word), weight
  *   w(t) = ln((c⁺_t + 1)/(N⁺ + V + 1)) − ln((c⁻_t + 1)/(N⁻ + V + 1))
  * with the OOV weight the same expression at c = 0, and the class
  * prior as bias = ln(D⁺ + 1) − ln(D⁻ + 1). A document's margin is
  * bias + Σ_tokens w(t); margin > 0 reads "more likely curated".
  *
  * Scale shape (the LanguageModel discipline):
  *  - TRAIN: one explode → partial-agg shuffle (exchange carries
  *    ~distinct words), a TakeOrdered top-V cut, and two scalar
  *    aggregates — all driver state is the ≤V-entry weight table.
  *  - SCORE: ZERO shuffle — weights ride the plan as a map literal,
  *    each doc folds its own tokens in whole-stage codegen; the
  *    corpus never moves.
  * Cross-engine exactness: every count and the top-V cut are integer
  * decisions, so both engines derive the SAME model; only ln can
  * drift (libm ulp) plus double-sum reorder, both absorbed by the
  * 6-dp rounding on the published margin (the LM oracle argument).
  */
object QualityClassifier {

  final case class Model(weights: Map[String, Double], oov: Double,
                         bias: Double)

  private def toks(c: Column): Column =
    when(length(trim(c)) > 0, TextFunctions.tokens(c))
      .otherwise(array().cast("array<string>"))

  /** One counting pass: per-word (total, positive) counts, the top-V
    * cut, token totals per class, and doc counts per class.
    */
  def train(corpus: DataFrame, textCol: String, positive: Column,
            topV: Int = 128): Model = {
    val cnt = corpus
      .select(positive.as("pos"), explode(toks(col(textCol))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("cp"))
      .persist()
    try {
      val tot = cnt.agg(sum(col("c")), sum(col("cp"))).head()
      val (n, np) =
        (if (tot.isNullAt(0)) 0L else tot.getLong(0),
         if (tot.isNullAt(1)) 0L else tot.getLong(1))
      val nn = n - np
      val top = cnt.orderBy(col("c").desc, col("w")).limit(topV).collect()
      val docs = corpus.agg(
        sum(when(positive, 1L).otherwise(0L)),
        count(lit(1))).head()
      val dp = if (docs.isNullAt(0)) 0L else docs.getLong(0)
      val dn = docs.getLong(1) - dp
      val v = top.length
      val denP = (np + v + 1).toDouble
      val denN = (nn + v + 1).toDouble
      Model(
        top.map { r =>
          val (cp, c) = (r.getLong(2), r.getLong(1))
          r.getString(0) ->
            (math.log((cp + 1) / denP) - math.log((c - cp + 1) / denN))
        }.toMap,
        math.log(1 / denP) - math.log(1 / denN),
        math.log((dp + 1).toDouble) - math.log((dn + 1).toDouble))
    } finally { cnt.unpersist(); () }
  }

  /** Per-doc margin column: bias + Σ w(token), rounded to 6 dp.
    * Token-less docs score the bare (rounded) bias. Pure fold over
    * plan literals — no shuffle, no join.
    */
  def margin(textCol: Column, m: Model): Column = {
    val t = toks(textCol)
    val perToken: Column => Column =
      if (m.weights.isEmpty) _ => lit(m.oov)
      else {
        val mapLit = map(
          m.weights.toSeq.sortBy(_._1)
            .flatMap { case (w, x) => Seq(lit(w), lit(x)) }: _*)
        w => coalesce(element_at(mapLit, w), lit(m.oov))
      }
    round(aggregate(t, lit(m.bias), (acc, w) => acc + perToken(w)), 6)
  }

  /** The full query face: train on the corpus with `positive` as the
    * curated-class indicator, score every row.
    */
  def scoreCorpus(corpus: DataFrame, textCol: String, idCol: String,
                  positive: Column, topV: Int = 128): DataFrame = {
    val m = train(corpus, textCol, positive, topV)
    corpus.select(col(idCol).as("doc_id"),
      size(toks(col(textCol))).as("n_tokens"),
      margin(col(textCol), m).as("margin"))
      .withColumn("predicted", col("margin") > 0)
  }
}
