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
    * not [] — the shared pitfall). Public so query faces that score
    * with a pre-trained model count tokens the same way.
    */
  def toks(c: Column): Column =
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
    // native kernel (hash probes inside whole-stage codegen); the HOF
    // twin below is the spec-pinned witness — identical token walk
    // and left fold, so the two are bit-equal on any input
    val sorted = lm.lnP.toSeq.sortBy(_._1)
    // coalesce: the twin scores NULL text 0.0 (its token guard), the
    // null-propagating kernel must match
    round(coalesce(graft.functions.LmFunctions.unigram_ce(
      textCol, sorted.map(_._1), sorted.map(_._2), lm.lnOov), lit(0.0)), 6)
  }

  /** The composable-HOF formulation of [[crossEntropy]] (map-literal
    * `element_at` + `aggregate` fold) — kept as the documented twin
    * and property-test witness; interpreted lambda eval makes it the
    * slow path, same story as the shingle/tokenizer kernels.
    */
  def crossEntropyHof(textCol: Column, lm: Unigram): Column = {
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

  // ---- bigram / stupid-backoff extension ---------------------------

  /** Bigram model with stupid backoff (Brants et al. 2007 — the
    * standard web-scale recipe precisely because the model stays a
    * lookup table): S(w|v) = c(v,w)/c(v) when the vocab-pair was
    * seen, else α·P_uni(w). Scores every pair of consecutive tokens;
    * the first token scores P_uni. `lnPair` keys are "v w" — tokens
    * are whitespace-split, so the space join is unambiguous.
    */
  final case class Bigram(uni: Unigram, lnPair: Map[String, Double],
                          lnAlpha: Double)

  /** Adds one pure-column pair-counting pass over the corpus (zip of
    * adjacent tokens) to [[train]]'s counting pass; only vocab-vocab
    * pairs enter the table, so its size is ≤ min(distinct bigrams,
    * topK²) — broadcastable by construction.
    */
  def trainBigram(corpus: DataFrame, textCol: String, topK: Int = 64,
                  alpha: Double = 0.4): Bigram = {
    val uni = train(corpus, textCol, topK)
    // raw (unsmoothed) vocab counts condition the bigram: recover
    // c(v) from the smoothed lnP (exactly: c = round(exp(lnP)·d − 1))
    // is fragile — recount the tops instead, cheap and exact
    val vocab = uni.lnP.keySet.toSeq
    if (vocab.isEmpty) Bigram(uni, Map.empty, math.log(alpha))
    else {
      val vocabLit = array(vocab.sorted.map(lit): _*)
      val t = toks(col(textCol))
      val pairs = vocabPairCounts(corpus, textCol, vocabLit)
      val prevTotals = corpus
        .select(explode(t).as("w")).filter(array_contains(vocabLit, col("w")))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      Bigram(uni,
        pairs.map { case (v, w, c) =>
          s"$v $w" -> math.log(c.toDouble / prevTotals(v).toDouble)
        }.toMap,
        math.log(alpha))
    }
  }

  /** The ONE distributed pass both bigram trainers share: adjacent
    * vocab-vocab pair counts, collected (≤ topK² rows by the vocab
    * filter). The D37b/D37c oracles both replay exactly this pass, so
    * it must stay single-definition.
    */
  private def vocabPairCounts(corpus: DataFrame, textCol: String,
                              vocabLit: Column): Array[(String, String, Long)] = {
    val t = toks(col(textCol))
    corpus
      .select(explode(arrays_zip(
        slice(t, lit(1), greatest(size(t) - 1, lit(0))).as("v"),
        slice(t, lit(2), greatest(size(t) - 1, lit(0))).as("w"))).as("p"))
      .select(col("p.v").as("v"), col("p.w").as("w"))
      .filter(array_contains(vocabLit, col("v")) &&
        array_contains(vocabLit, col("w")))
      .groupBy(col("v"), col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
  }

  /** Cross-entropy under the backoff model: a struct-accumulator fold
    * carries (prev token, running sum) — same zero-shuffle plan shape
    * as the unigram scorer, still all plan literals.
    */
  def crossEntropyBigram(textCol: Column, lm: Bigram): Column = {
    // native kernel; [[crossEntropyBigramHof]] is the pinned twin
    val uniSorted = lm.uni.lnP.toSeq.sortBy(_._1)
    val pairSorted = lm.lnPair.toSeq.sortBy(_._1)
    round(coalesce(graft.functions.LmFunctions.bigram_ce(
      textCol, uniSorted.map(_._1), uniSorted.map(_._2), lm.uni.lnOov,
      pairSorted.map(_._1), pairSorted.map(_._2), lm.lnAlpha),
      lit(0.0)), 6)
  }

  /** HOF twin of [[crossEntropyBigram]] — witness only. */
  def crossEntropyBigramHof(textCol: Column, lm: Bigram): Column = {
    val t = toks(textCol)
    val uniLn: Column => Column =
      if (lm.uni.lnP.isEmpty) _ => lit(lm.uni.lnOov)
      else {
        val m = map(lm.uni.lnP.toSeq.sortBy(_._1)
          .flatMap { case (w, p) => Seq(lit(w), lit(p)) }: _*)
        w => coalesce(element_at(m, w), lit(lm.uni.lnOov))
      }
    val pairLn: (Column, Column) => Column =
      if (lm.lnPair.isEmpty) (_, w) => lit(lm.lnAlpha) + uniLn(w)
      else {
        val m = map(lm.lnPair.toSeq.sortBy(_._1)
          .flatMap { case (k, p) => Seq(lit(k), lit(p)) }: _*)
        (prev, w) => coalesce(element_at(m, concat(prev, lit(" "), w)),
          lit(lm.lnAlpha) + uniLn(w))
      }
    val folded = aggregate(t,
      struct(lit("").as("prev"), lit(0.0).as("sum")),
      (acc, w) => {
        // "" is never a token, so it marks the first position
        val lnS = when(acc.getField("prev") === "", uniLn(w))
          .otherwise(pairLn(acc.getField("prev"), w))
        struct(w.as("prev"), (acc.getField("sum") + lnS).as("sum"))
      },
      acc => acc.getField("sum"))
    when(size(t) > 0, round(-folded / size(t), 6)).otherwise(lit(0.0))
  }

  /** Query face for the bigram scorer. */
  def scoreCorpusBigram(corpus: DataFrame, textCol: String, idCol: String,
                        topK: Int = 64, alpha: Double = 0.4): DataFrame = {
    val lm = trainBigram(corpus, textCol, topK, alpha)
    corpus.select(col(idCol).as("id"),
      size(toks(col(textCol))).as("n_tokens"),
      crossEntropyBigram(col(textCol), lm).as("cross_entropy"))
  }

  // ---- interpolated Kneser–Ney extension ---------------------------

  /** D37c: interpolated Kneser–Ney bigram model (Kneser & Ney 1995;
    * Chen & Goodman 1999's benchmark winner) — the principled upgrade
    * over stupid backoff: absolute discounting redistributes mass
    * d·N1+(v·)/c(v) per context, and the backoff distribution is the
    * CONTINUATION probability (how many contexts a word follows), not
    * raw frequency — "francisco" is frequent but follows only "san",
    * so KN stops over-scoring it in fresh contexts.
    *
    * Quantities (vocab-restricted, like the stupid-backoff table):
    * c(v,w), c(v)=Σ_w c(v,w), N1+(v·), N1+(·w), with the continuation
    * base add-one smoothed over vocab+OOV:
    * base(w) = (N1+(·w)+1)/(N1+(··)+V+1), baseOov = 1/(N1+(··)+V+1).
    * P(w|v) = (c(v,w)−d)/c(v) + λ(v)·base(w), λ(v) = d·N1+(v·)/c(v)
    * (d = 0.75 < 1 makes the textbook max(c−d,0) vacuous). First
    * token or unseen context scores base(w) alone.
    *
    * Distributed cost is exactly [[trainBigram]]'s: the one
    * vocab-restricted pair-count pass; everything else is a driver
    * fold over the ≤topK² pair table.
    */
  final case class KneserNey(baseWords: Seq[String], lnBases: Seq[Double],
                             lnBaseOov: Double,
                             pairKeys: Seq[String], pairLnPs: Seq[Double],
                             lambdaKeys: Seq[String], lnLambdas: Seq[Double])

  def trainKneserNey(corpus: DataFrame, textCol: String, topK: Int = 64,
                     discount: Double = 0.75): KneserNey = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    val uni = train(corpus, textCol, topK)
    val vocab = uni.lnP.keySet.toSeq.sorted
    if (vocab.isEmpty)
      KneserNey(Nil, Nil, 0.0, Nil, Nil, Nil, Nil)
    else {
      val vocabLit = array(vocab.map(lit): _*)
      val pairs = vocabPairCounts(corpus, textCol, vocabLit)
      val ctx = pairs.groupBy(_._1).map { case (v, ps) =>
        v -> (ps.map(_._3).sum, ps.length)
      } // v -> (c(v), N1+(v·))
      val n1bwd = pairs.groupBy(_._2).view.mapValues(_.length).toMap
      val denom = (pairs.length + vocab.size + 1).toDouble
      def base(w: String) = (n1bwd.getOrElse(w, 0) + 1).toDouble / denom
      val lnBases = vocab.map(w => math.log(base(w)))
      val lambdas = ctx.toSeq.sortBy(_._1).map { case (v, (cv, n1)) =>
        v -> (discount * n1.toDouble / cv.toDouble)
      }
      val pairLnPs = pairs.sortBy(p => (p._1, p._2)).map { case (v, w, c) =>
        val (cv, n1) = ctx(v)
        val lam = discount * n1.toDouble / cv.toDouble
        s"$v $w" -> math.log((c.toDouble - discount) / cv.toDouble +
          lam * base(w))
      }
      KneserNey(vocab, lnBases, math.log(1.0 / denom),
        pairLnPs.map(_._1), pairLnPs.map(_._2),
        lambdas.map(_._1), lambdas.map(p => math.log(p._2)))
    }
  }

  /** Cross-entropy under the KN model — the [[crossEntropyBigram]]
    * plan shape: all plan literals, zero shuffle, native kernel.
    */
  def crossEntropyKn(textCol: Column, lm: KneserNey): Column =
    round(coalesce(graft.functions.LmFunctions.kn_ce(
      textCol, lm.baseWords, lm.lnBases, lm.lnBaseOov,
      lm.pairKeys, lm.pairLnPs, lm.lambdaKeys, lm.lnLambdas),
      lit(0.0)), 6)

  /** Query face for the KN scorer. */
  def scoreCorpusKn(corpus: DataFrame, textCol: String, idCol: String,
                    topK: Int = 64, discount: Double = 0.75): DataFrame = {
    val lm = trainKneserNey(corpus, textCol, topK, discount)
    corpus.select(col(idCol).as("id"),
      size(toks(col(textCol))).as("n_tokens"),
      crossEntropyKn(col(textCol), lm).as("cross_entropy"))
  }

  /** D114: Good–Turing unseen mass + Chao1 vocabulary richness (Good
    * 1953; Chao 1984, bias-corrected form) — the two numbers a corpus
    * card needs about the vocabulary it HASN'T seen: p₀ = n₁/N is the
    * probability the next token is a new type (the Good–Turing
    * missing-mass estimate — high p₀ means the crawl is nowhere near
    * vocabulary saturation and D103's Heaps fit is still in its
    * growth regime), and Chao1 = V + n₁(n₁−1)/(2(n₂+1)) estimates the
    * total vocabulary the corpus is sampling from.
    *
    * Scale shape: ONE tokenize → word-count shuffle (the D16 cost),
    * then a frequency-of-frequencies re-aggregation of the
    * vocab-sized frame; every statistic is exact integers + one IEEE
    * divide. Output one row.
    */
  def goodTuringVocab(corpus: DataFrame, textCol: String): DataFrame =
    goodTuringFromCounts(corpus
      .select(explode(toks(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c")))

  /** D114's finisher over an already-counted (w, c) frame — the
    * single definition the batch face and E31's stream face (which
    * maintains the word counts additively in the lake) both ride,
    * the `benfordFromCounts` pattern.
    */
  def goodTuringFromCounts(counts: DataFrame): DataFrame = {
    val fof = counts.groupBy(col("c").as("freq"))
      .agg(count(lit(1)).as("n_types"))
    val agg = fof.agg(
      coalesce(sum(col("n_types")), lit(0L)).cast("long").as("vocab_size"),
      coalesce(sum(col("freq").cast(org.apache.spark.sql.types
          .DecimalType(38, 0)) * col("n_types").cast(org.apache.spark.sql
          .types.DecimalType(38, 0))), lit(0L).cast("decimal(38,0)"))
        .cast("long").as("n_tokens"),
      coalesce(sum(when(col("freq") === 1, col("n_types"))), lit(0L))
        .cast("long").as("n_hapax"),
      coalesce(sum(when(col("freq") === 2, col("n_types"))), lit(0L))
        .cast("long").as("n_dis"))
    agg.select(col("vocab_size"), col("n_tokens"), col("n_hapax"),
      col("n_dis"),
      when(col("n_tokens") > 0,
        round(col("n_hapax").cast("double") / col("n_tokens").cast("double"),
          6)).as("p_unseen"),
      round(col("vocab_size").cast("double")
        + col("n_hapax").cast("double") * (col("n_hapax").cast("double")
          - 1.0) / (lit(2.0) * (col("n_dis").cast("double") + 1.0)), 6)
        .as("chao1_vocab"))
  }

  /** D118: per-document lexical diversity — type-token ratio, hapax
    * fraction, and Yule's characteristic K (Yule 1944):
    * K = 10⁴·(Σ_w c_w² − N)/N², the repeat-rate statistic that (unlike
    * raw TTR) is approximately length-invariant, so it ranks a
    * 100-word and a 10,000-word document on the same scale. Low-K docs
    * are vocabulary-rich prose; high-K docs are template/boilerplate —
    * the per-doc complement to D29's positional repetition score and a
    * standard curation signal.
    *
    * ONE tokenize pass → (doc, word) counts → one per-doc partial-agg'd
    * rollup; every sufficient statistic (N, V, V₁, Σc²) is an exact
    * integer and each published ratio is one IEEE divide. Docs with no
    * tokens emit zero counts and null ratios (left join back to the
    * corpus, so no doc vanishes).
    */
  /** D125: code-switching audit — language-ID the FIRST and SECOND
    * half of each document independently (same stopword-marker
    * heuristic and argmax priority as D38's whole-doc ID) and flag
    * documents whose halves disagree with both halves determined.
    * Spliced documents — two articles glued by a bad extractor, a
    * template in one language wrapping content in another — pass
    * whole-doc language ID with a plurality vote while being exactly
    * the mixed-language noise a monolingual training mix must not
    * ingest.
    *
    * Pure row-local map (split index, two marker-hit counts per
    * language, two argmaxes) — one scan, zero shuffle beyond the
    * presentation sort; every count an exact integer and the argmax
    * priority fixed, so the verdict is engine-invariant.
    */
  def codeSwitchAudit(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    import graft.functions.TextFunctions.{LangMarkers, wordHits}
    val tk = toks(col(textCol))
    def langOf(part: Column): Column = {
      val en = wordHits(part, LangMarkers.en)
      val fr = wordHits(part, LangMarkers.fr)
      val de = wordHits(part, LangMarkers.de)
      val es = wordHits(part, LangMarkers.es)
      val best = greatest(en, fr, de, es)
      when(best === 0, lit("und"))
        .when(en === best, lit("en"))
        .when(fr === best, lit("fr"))
        .when(de === best, lit("de"))
        .otherwise(lit("es"))
    }
    docs.select(col(idCol).as("doc_id"),
        tk.as("__tk"), size(tk).as("__n"))
      .withColumn("__h", (col("__n") / 2).cast("int"))
      .select(col("doc_id"), col("__n").cast("long").as("n_tokens"),
        langOf(slice(col("__tk"), lit(1), col("__h"))).as("lang_head"),
        langOf(slice(col("__tk"), col("__h") + 1, col("__n") - col("__h")))
          .as("lang_tail"))
      .withColumn("switched",
        col("lang_head") =!= col("lang_tail") &&
          col("lang_head") =!= "und" && col("lang_tail") =!= "und")
      .orderBy(col("doc_id"))
  }

  /** D123: word burstiness — the variance-to-mean ratio (Fano factor)
    * of each word's per-document counts, zeros included (Church &
    * Gale 1995: content words are BURSTY — absent from most docs,
    * dense where they appear — while function words spread evenly;
    * VMR ≈ 1 is Poisson, ≫ 1 is bursty). The signal that separates
    * topical vocabulary from glue independent of raw frequency, and a
    * boilerplate tell (template phrases are anomalously NON-bursty
    * for their rank).
    *
    * The all-docs-including-zeros moments need NO zero rows: with N
    * docs, T = Σc and S = Σc² over PRESENT (doc, word) counts give
    * mean = T/N and var = (S − T²/N)/(N−1) exactly. ONE tokenize →
    * (doc, word) count shuffle (the D16 cost), one word-keyed
    * re-aggregation; every sufficient statistic an exact integer, VMR
    * one IEEE tree, 6-dp rounded BEFORE the (vmr desc, word asc)
    * top-k cut so both engines cut identically.
    */
  def wordBurstiness(docs: DataFrame, idCol: String, textCol: String,
                     minFreq: Long = 50L, k: Int = 30): DataFrame = {
    require(minFreq >= 1L && k >= 1, s"bad dials ($minFreq, $k)")
    val nDocs = docs.agg(count(lit(1)).cast("long").as("n_docs"))
    val perWord = docs
      .select(col(idCol).as("__id"), explode(toks(col(textCol))).as("__w"))
      .groupBy(col("__id"), col("__w")).agg(count(lit(1)).as("c"))
      .groupBy(col("__w"))
      .agg(count(lit(1)).cast("long").as("doc_freq"),
        sum(col("c")).cast("long").as("total_count"),
        sum(col("c") * col("c")).cast("long").as("__s2"))
      .filter(col("total_count") >= minFreq)
    val scored = perWord.crossJoin(broadcast(nDocs))
      .withColumn("burstiness", {
        val tD = col("total_count").cast("double")
        val sD = col("__s2").cast("double")
        val nD = col("n_docs").cast("double")
        round((sD - tD * tD / nD) / (nD - 1.0) / (tD / nD), 6)
      })
    scored
      .select(col("__w").as("word"), col("doc_freq"),
        col("total_count"), col("burstiness"))
      .orderBy(col("burstiness").desc, col("word"))
      .limit(k)
  }

  def lexicalDiversity(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val pairs = docs
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("__w"))
      .groupBy(col("doc_id"), col("__w")).agg(count(lit(1)).as("c"))
    val per = pairs.groupBy(col("doc_id")).agg(
      sum(col("c")).cast("long").as("n_tokens"),
      count(lit(1)).cast("long").as("n_types"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).cast("long").as("hapax"),
      // Σc² ≤ N² — long-safe for any doc a tokenizer can hold
      sum(col("c") * col("c")).cast("long").as("__ssq"))
    val nD = col("n_tokens").cast("double")
    docs.select(col(idCol).as("doc_id")).join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("hapax"), lit(0L)).as("hapax"),
        when(col("n_tokens") > 0,
          round(col("n_types").cast("double") / nD, 6)).as("ttr"),
        when(col("n_tokens") > 0,
          round(col("hapax").cast("double") / nD, 6)).as("hapax_ratio"),
        when(col("n_tokens") > 0,
          round(lit(10000.0) * (col("__ssq") - col("n_tokens")).cast("double")
            / (nD * nD), 6)).as("yule_k"))
      .orderBy(col("doc_id"))
  }
}
