package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pointwise-mutual-information collocation mining (Church & Hanks
  * 1990) — the classic "which word pairs are glued together" signal:
  * PMI(v,w) = ln( p(v,w) / (p(v)·p(w)) ) over adjacent token pairs,
  * with p(v,w) = c(v,w)/N_pairs and p(x) = c(x)/N_tok. High-PMI pairs
  * are multi-word expressions ("los angeles"); a corpus whose top
  * collocations are boilerplate fragments ("click here", "all rights")
  * is telling its curator something D9's per-doc scores can't.
  *
  * The min-count floor (Church & Hanks' own caveat) kills the
  * hapax-pair explosion: PMI is maximal for pairs seen once, so
  * unfloored rankings are noise.
  *
  * Scale shape — unlike D37b's broadcastable top-K LM table, this is
  * the FULL-vocabulary pair census, so it must stay distributed:
  * one tokenize pass feeds both the pair census and the unigram
  * census (two partial-agg'd count shuffles, exchanges ∝ distinct
  * bigrams / distinct words); the two unigram attachments are shuffle
  * joins keyed on the word (never broadcast — a 100 TB corpus's vocab
  * isn't driver-sized); the two grand totals broadcast as one scalar
  * row; the final top-k is a TakeOrdered, never a global sort.
  *
  * Exactness: every count is an exact integer; PMI is ONE ln over one
  * double ratio whose numerator/denominator are built with a pinned
  * association (c_vw·N_tok·N_tok, then ÷ (N_pair·c_v), then ÷ c_w),
  * mirrored by the oracle, with the 6-dp round absorbing libm-ulp ln
  * drift (the BM25/LM argument).
  */
object Collocations {

  /** Top-k adjacent-pair collocations by PMI.
    *
    * @param docs     corpus
    * @param textCol  whitespace-tokenizable text column
    * @param minCount pair-frequency floor (Church & Hanks: ≥ 5)
    * @param k        result rows, ordered (pmi DESC, v, w)
    */
  def topPmi(docs: DataFrame, textCol: String, minCount: Long = 5L,
             k: Int = 50): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val t = LanguageModel.toks(col(textCol))
    // one tokenized projection feeds both censuses — cut so the
    // corpus tokenize runs once, not once per census
    val toks = Materialize.cut(docs.select(t.as("__t")))
    val pairCnt = toks
      .select(explode(arrays_zip(
        slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))).as("v"),
        slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))).as("w")))
        .as("p"))
      .groupBy(col("p.v").as("v"), col("p.w").as("w"))
      .agg(count(lit(1)).as("c_vw"))
    val uniCnt = Materialize.cut(
      toks.select(explode(col("__t")).as("x"))
        .groupBy(col("x")).agg(count(lit(1)).as("c_x")))
    val totals = uniCnt.agg(sum(col("c_x")).cast("long").as("n_tok"))
      .crossJoin(
        pairCnt.agg(sum(col("c_vw")).cast("long").as("n_pair")))
    val scored = pairCnt
      .filter(col("c_vw") >= minCount)
      .join(uniCnt.select(col("x").as("v"), col("c_x").as("c_v")), Seq("v"))
      .join(uniCnt.select(col("x").as("w"), col("c_x").as("c_w")), Seq("w"))
      .crossJoin(broadcast(totals))
    val nTok = col("n_tok").cast("double")
    val pmi = round(log(
      col("c_vw").cast("double") * nTok * nTok
        / (col("n_pair").cast("double") * col("c_v").cast("double"))
        / col("c_w").cast("double")), 6)
    scored
      .select(col("v"), col("w"), col("c_vw"), col("c_v"), col("c_w"),
        pmi.as("pmi"))
      .orderBy(col("pmi").desc, col("v"), col("w"))
      .limit(k)
  }

  /** D116: TextRank keyword extraction (Mihalcea & Tarau 2004 — the
    * ORIGINAL TextRank: PageRank over the word co-occurrence graph;
    * high-rank words are the corpus's load-bearing vocabulary, a
    * structural signal frequency alone can't give — a word can be
    * mid-frequency but central because it co-occurs with everything).
    *
    * Composes two proven pieces: the D111 adjacency census builds the
    * co-occurrence graph (both orientations, count weights, self-loops
    * dropped), and [[Centrality.weightedPageRank]]'s INTEGER fixed
    * point ranks it — word ids ride the same join-key machinery as
    * numeric node ids, and every rank is an exact BIGINT, so the
    * top-k cut is engine-invariant by construction.
    *
    * Scale shape: one tokenize pass; the edge exchange is distinct
    * adjacent bigrams; each PageRank round is one join + one
    * partial-agg'd sum keyed on words. Top-k is a TakeOrdered.
    */
  def keywordTextRank(docs: DataFrame, textCol: String,
                      iterations: Int = 10, k: Int = 30): DataFrame = {
    val t = LanguageModel.toks(col(textCol))
    val toks = Materialize.cut(docs.select(t.as("__t")))
    val adj = toks
      .select(explode(arrays_zip(
        slice(col("__t"), lit(1), greatest(size(col("__t")) - 1, lit(0))).as("v"),
        slice(col("__t"), lit(2), greatest(size(col("__t")) - 1, lit(0))).as("w")))
        .as("p"))
      .select(col("p.v").as("a"), col("p.w").as("b"))
      .filter(col("a") =!= col("b"))
    val edges = adj.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(adj.select(col("b").as("src"), col("a").as("dst")))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("weight"))
    val nodes = toks.select(explode(col("__t")).as("id")).distinct()
    Centrality.weightedPageRank(edges, nodes, iterations)
      .orderBy(col("rank").desc, col("id"))
      .limit(k)
      .select(col("id").as("word"), col("rank"))
  }

  /** D117: per-document keyword extraction by smoothed TF-IDF — the
    * frequency-based twin of D116's structural TextRank (Salton &
    * Buckley 1988; the sklearn smooth-idf convention
    * idf = ln((N+1)/(df+1)) + 1, which never divides by zero and keeps
    * corpus-universal words at a positive floor). Per-doc keywords
    * label shards for mixture analysis and give retrieval (D31/D46)
    * an index-time summary; corpus-frequency alone can't do either.
    *
    * Scale shape: one tokenize pass → (doc, word, tf) counts (the
    * corpus-sized shuffle); df re-aggregates that frame word-keyed;
    * the idf attachment is a word-keyed shuffle join (never a driver
    * vocab); the top-k window partitions BY DOCUMENT, so no partition
    * ever exceeds a single doc's vocabulary — bounded at any corpus
    * size. Exactness: tf/df/N integers; score = tf·(ln((N+1)/(df+1))+1)
    * is one IEEE evaluation, 6-dp rounded BEFORE ranking so both
    * engines cut ties identically (word ascending breaks the rest).
    */
  def keywordTfidf(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pairs = Materialize.cut(docs
      .select(col(idCol).as("doc_id"),
        explode(LanguageModel.toks(col(textCol))).as("__w"))
      .groupBy(col("doc_id"), col("__w")).agg(count(lit(1)).as("tf")))
    val dfreq = pairs.groupBy(col("__w"))
      .agg(count(lit(1)).cast("long").as("doc_freq"))
    val nDocs = docs.agg(count(lit(1)).cast("long").as("n_docs"))
    val scored = pairs.join(dfreq, Seq("__w")).crossJoin(broadcast(nDocs))
      .withColumn("score", round(col("tf").cast("double")
        * (log((col("n_docs").cast("double") + 1.0)
          / (col("doc_freq").cast("double") + 1.0)) + 1.0), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("__w"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("__w").as("word"),
        col("tf"), col("doc_freq"), col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** The declared RAKE stopword delimiter set — a convention published
    * with the statistic (like a histogram's bin edges).
    */
  val RakeStops: Seq[String] = Seq("the", "a", "an", "of", "and", "to",
    "in", "is", "on", "for", "with", "as")

  /** D124: RAKE keyword extraction (Rose, Engel, Cramer & Cowley
    * 2010) — PHRASE-level keywords where D116/D117 rank single words:
    * candidate phrases are the maximal stopword-free token runs, a
    * word's score is deg/freq over the candidate census (deg = Σ
    * phrase length over its phrases — words living in long phrases
    * score high), and a phrase scores the sum of its words. The
    * standard unsupervised keyphrase baseline, and the only one of
    * the three extractors that can surface "minimum detectable
    * effect" as ONE keyword.
    *
    * Scale shape: one tokenize+posexplode pass; the run-id
    * gaps-and-islands window partitions BY DOCUMENT (pos − rank over
    * non-stop rows — never corpus-wide); phrase assembly sorts ≤
    * doc-length lists; the word census is a word-keyed shuffle (never
    * a driver vocab); the top-k is a TakeOrdered on the 6-dp-rounded
    * score with phrase tiebreak. Exactness: freq/deg/len exact
    * integers; each word score ONE divide; the phrase score folds its
    * words in PHRASE ORDER seeded 0.0 — one IEEE tree, identical for
    * every occurrence of the same phrase type.
    */
  def rakeKeywords(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val stopArr = array(RakeStops.map(lit): _*)
    val toksPos = docs
      .select(col(idCol).as("__id"),
        posexplode(LanguageModel.toks(col(textCol))).as(Seq("__pos", "__w")))
    val ns = toksPos.filter(!array_contains(stopArr, col("__w")))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__id")).orderBy(col("__pos"))))
      .withColumn("__run", col("__pos") - col("__rn"))
    val phrases = Materialize.cut(ns
      .groupBy(col("__id"), col("__run"))
      .agg(sort_array(collect_list(struct(col("__pos"), col("__w"))))
          .as("__pw"),
        count(lit(1)).cast("long").as("n_words"))
      .withColumn("__words", transform(col("__pw"),
        e => e.getField("__w")))
      .select(col("__id"), col("__words"), col("n_words"),
        array_join(col("__words"), " ").as("phrase")))
    val wordStats = phrases
      .select(explode(col("__words")).as("__w"), col("n_words"))
      .groupBy(col("__w"))
      .agg(count(lit(1)).cast("long").as("__freq"),
        sum(col("n_words")).cast("long").as("__deg"))
      .withColumn("__ws",
        col("__deg").cast("double") / col("__freq").cast("double"))
    // score each phrase TYPE once: the phrase string determines its
    // word list (whitespace-split is bijective here), so dedupe to
    // types BEFORE the score join — folding over all occurrences
    // would multiply the score by the occurrence count and hand
    // boilerplate phrases an inflated rank
    val types = phrases.groupBy(col("phrase"), col("n_words"))
      .agg(count(lit(1)).cast("long").as("n_occurrences"))
    val scored = types
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        posexplode(split(col("phrase"), " ")).as(Seq("__wi", "__w")))
      .join(wordStats.select(col("__w"), col("__ws")), Seq("__w"))
      .groupBy(col("phrase"), col("n_words"), col("n_occurrences"))
      .agg(sort_array(collect_list(struct(col("__wi"), col("__ws"))))
        .as("__l"))
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        round(aggregate(col("__l"), lit(0.0),
          (acc, e) => acc + e.getField("__ws")), 6).as("score"))
    scored.orderBy(col("score").desc, col("phrase")).limit(k)
  }
}
