package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 full-text ranking (Robertson/Okapi) over a document corpus.
  *
  * A training-data engine needs keyword retrieval over its corpus —
  * for eval-set mining, targeted subset extraction, and debugging what
  * the dedup/quality stages kept. BM25 is the standard lexical scorer:
  * score(d, Q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
  * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).
  *
  * Spark-first shape for a plan-time query (the search use case): the
  * corpus NEVER shuffles. Per-term tf is `size(filter(tokens, = t))` —
  * pure codegen'd array algebra, no explode, no (doc, term) exchange.
  * Corpus stats (N, Σdl, per-term df) are one partial-aggregated scan
  * collapsing to a single row, broadcast back; scoring + top-k is a
  * narrow second scan ending in TakeOrdered(k). Two scans, zero wide
  * shuffles — versus the textbook explode → join-on-term → re-group
  * plan, which shuffles every token occurrence twice. (For query sets
  * too large to inline in the plan, D16/D22's explode machinery is the
  * right fallback; this operator targets interactive search.)
  *
  * Determinism: every arithmetic step is IEEE +,·,/ (identical in any
  * engine) except `ln`, where libm implementations differ by 1 ulp —
  * so scores are rounded to 6 dp and the top-k ORDER is taken on the
  * rounded value (doc id tiebreak). A 1-ulp disagreement flips a 6-dp
  * rounding only within ~1e-16 of a boundary; the gate corpora sit
  * nowhere near one (validated at sf0.001/0.01/0.1).
  */
object TextRank {

  /** Tokens: lowercased runs of [a-z0-9] — ASCII classes behave
    * identically across regex engines, unlike \\W.
    */
  def tokens(textCol: Column): Column =
    filter(split(lower(textCol), "[^a-z0-9]+"), t => t =!= lit(""))

  /** Top-k BM25 over plan-time query terms.
    *
    * @return (idCol, score) — score rounded to 6 dp, descending,
    *         ties broken by id.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKTokens(
      docs.select(col(idCol), tokens(col(textCol)).as("__toks")),
      idCol, terms, k, k1, b)

  /** [[bm25TopK]] over an ALREADY-TOKENIZED frame `(idCol, __toks)` —
    * the amortization hook for multi-pass retrieval loops (D101's PRF
    * makes three passes over the same corpus: seed retrieval,
    * expansion pick, expanded retrieval — tokenizing once and cutting
    * lineage on the token projection halves the loop's cost; at lake
    * scale the same frame is the persisted token index).
    */
  def bm25TopKTokens(pretok: DataFrame, idCol: String,
                     terms: Seq[String], k: Int,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val sorted = terms.distinct.sorted
    require(sorted.nonEmpty, "bm25 needs at least one term")
    // a term outside the token alphabet can never match — refuse it
    // loudly instead of silently scoring it 0 everywhere
    require(sorted.forall(_.matches("[a-z0-9]+")),
      s"terms must be lowercase [a-z0-9]+ (the token alphabet); got " +
        sorted.filterNot(_.matches("[a-z0-9]+")).mkString(", "))
    val base = pretok.select(col(idCol), col("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("double"))
    val withTf = sorted.zipWithIndex.foldLeft(base) { case (d, (t, i)) =>
      d.withColumn(s"__tf$i",
        size(filter(col("__toks"), x => x === lit(t))).cast("double"))
    }
    // one-row corpus stats, broadcast back into the scoring pass
    val statAggs = count(lit(1)).cast("double").as("__n") +:
      sum(col("__dl")).as("__sumdl") +:
      sorted.indices.map(i =>
        sum(when(col(s"__tf$i") > 0d, 1L).otherwise(0L))
          .cast("double").as(s"__df$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val avgdl = col("__sumdl") / col("__n")
    // per-term scores summed left-to-right in sorted-term order — the
    // oracle mirrors the same association, so the fp result is identical
    val score = sorted.indices.map { i =>
      val idf = log(
        (col("__n") - col(s"__df$i") + lit(0.5)) /
          (col(s"__df$i") + lit(0.5)) + lit(1.0))
      val tfNorm = (col(s"__tf$i") * lit(k1 + 1.0)) /
        (col(s"__tf$i") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / avgdl))
      idf * tfNorm
    }.reduceLeft(_ + _)
    scored
      .withColumn("score", round(score, 6))
      .filter(col("score") > 0d)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** D77: Dirichlet-smoothed query-likelihood retrieval (Zhai &
    * Lafferty 2001) — the language-model face of the retrieval triad
    * (D31 BM25, D46 TF-IDF): score(D,Q) = Σ_t ln((tf_t + μ·cf_t/|C|)
    * / (dl + μ)) with cf_t the collection term frequency. Smoothing
    * gives every document a finite score (a zero-tf doc backs off to
    * the collection LM) and the μ-normalization calibrates length
    * without BM25's tuned saturation curve.
    *
    * Plan shape = BM25's: ONE tokenize pass, plan-literal term
    * columns, a one-row broadcast stats aggregate (cf_t, |C|), and a
    * TakeOrdered(k) cut — no data shuffle at any corpus size.
    * Per-term scores sum left-to-right in sorted-term order; the
    * oracle mirrors the association, so the fp result is identical.
    *
    * Terms must occur in the corpus: cf_t = 0 would make every score
    * ln(0) = −∞ for zero-tf docs (the gate terms are corpus vocab).
    */
  def queryLikelihoodTopK(docs: DataFrame, idCol: String, textCol: String,
                          terms: Seq[String], k: Int,
                          mu: Double = 100.0): DataFrame = {
    val sorted = terms.distinct.sorted
    require(sorted.nonEmpty, "query likelihood needs at least one term")
    require(sorted.forall(_.matches("[a-z0-9]+")),
      s"terms must be lowercase [a-z0-9]+ (the token alphabet); got " +
        sorted.filterNot(_.matches("[a-z0-9]+")).mkString(", "))
    val base = docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("double"))
    val withTf = sorted.zipWithIndex.foldLeft(base) { case (d, (t, i)) =>
      d.withColumn(s"__tf$i",
        size(filter(col("__toks"), x => x === lit(t))).cast("double"))
    }
    val statAggs = sum(col("__dl")).as("__sumdl") +:
      sorted.indices.map(i => sum(col(s"__tf$i")).as(s"__cf$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val score = sorted.indices.map { i =>
      log((col(s"__tf$i") + lit(mu) * col(s"__cf$i") / col("__sumdl")) /
        (col("__dl") + lit(mu)))
    }.reduceLeft(_ + _)
    scored
      .withColumn("score", round(score, 6))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** TF-IDF cosine retrieval (SURVEY §2.D46) — the smooth-idf,
    * L2-normalized scheme (sklearn's TfidfVectorizer defaults):
    * idf(t) = ln((1+N)/(1+df)) + 1, w_dt = tf·idf, documents L2-
    * normalized over their FULL vocabulary, query = the term set at
    * tf 1. Complements BM25: cosine punishes long documents by their
    * whole weight mass (a term-spam page scores low even when every
    * query term matches), where BM25 only saturates per-term.
    *
    * Shape: the full-vocabulary norm genuinely needs global df per
    * token, so unlike BM25's zero-shuffle plan this one earns its
    * shuffles — ONE tokenize feeding (a) per-(doc, term) tf
    * [shuffle on (doc, term)], (b) the df table derived from it
    * [shuffle on term, partial-agg'd], (c) per-doc Σ(tf·idf)² norms
    * [shuffle on doc]. Query-side numerator stays zero-shuffle:
    * plan-literal term columns + the one-row broadcast stats, cut by
    * TakeOrdered(k). At 100 TB the exchanges carry (doc, distinct
    * token) pairs — the same cost class as the D16 vocabulary pass.
    *
    * Determinism: mirror-association arithmetic, 6-dp rounded score,
    * match-filter on an exact-integer tf sum (never on the float) —
    * the BM25 oracle argument.
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                terms: Seq[String], k: Int): DataFrame = {
    val sorted = terms.distinct.sorted
    require(sorted.nonEmpty, "tfidf needs at least one term")
    require(sorted.forall(_.matches("[a-z0-9]+")),
      s"terms must be lowercase [a-z0-9]+ (the token alphabet); got " +
        sorted.filterNot(_.matches("[a-z0-9]+")).mkString(", "))
    val base = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
    val withTf = sorted.zipWithIndex.foldLeft(base) { case (d, (t, i)) =>
      d.withColumn(s"__tf$i",
        size(filter(col("__toks"), x => x === lit(t))).cast("double"))
    }
    val statAggs = count(lit(1)).cast("double").as("__n") +:
      sorted.indices.map(i =>
        sum(when(col(s"__tf$i") > 0d, 1L).otherwise(0L))
          .cast("double").as(s"__df$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    // full-vocabulary document norms: per-(doc, token) tf, token df
    // derived by collapsing the doc dimension (partial-agg), Σ(tf·idf)²
    val perDocTf = base
      .select(col(idCol), explode(col("__toks")).as("__w"))
      .groupBy(col(idCol), col("__w"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dfTab = perDocTf.groupBy(col("__w"))
      .agg(count(lit(1)).cast("double").as("__df"))
    val wIdf = log((lit(1.0) + col("__n")) / (lit(1.0) + col("__df"))) + lit(1.0)
    val norms = perDocTf.join(dfTab, "__w")
      .crossJoin(broadcast(stats.select(col("__n"))))
      .select(col(idCol),
        ((col("__tf") * wIdf) * (col("__tf") * wIdf)).as("__w2"))
      .groupBy(col(idCol)).agg(sqrt(sum(col("__w2"))).as("__norm"))
    val scored = withTf.crossJoin(broadcast(stats))
      .join(norms, Seq(idCol), "left")
    val idfs = sorted.indices.map(i =>
      log((lit(1.0) + col("__n")) / (lit(1.0) + col(s"__df$i"))) + lit(1.0))
    val num = sorted.indices.map(i => (col(s"__tf$i") * idfs(i)) * idfs(i))
      .reduceLeft(_ + _)
    val qnorm = sqrt(idfs.map(f => f * f).reduceLeft(_ + _))
    val anyTf = sorted.indices.map(i => col(s"__tf$i")).reduceLeft(_ + _)
    scored
      .withColumn("score", round(num / (col("__norm") * qnorm), 6))
      .filter(anyTf > 0d)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("score"))
  }
}
