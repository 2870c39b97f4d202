package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Sessionize}
import graft.sources.Tables

/** Text-analysis + dedup queries over the documents table, and event
  * sessionization (SURVEY §2.D, §2.C8).
  */
object TextQueries {

  /** D1: exact dedup via SHA-256 content digest. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.documents(spark, dir), col("text"), col("doc_id"))
      .orderBy(col("canonical_id"))

  /** D108: dedup-quality self-audit — the banding recall/precision of
    * MinHash-LSH measured against the exact Jaccard ≥ 0.5 truth set
    * (the D-family analog of `ann_recall_report`): recall below 1.0
    * means the band/row geometry is dropping true near-dups (retune
    * before shipping a corpus through it), precision is the verify
    * join's workload multiplier. Truth = the posting-index exact
    * pairs; candidates = the PRE-verify band collisions.
    */
  def dedupRecallReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val truth = Dedup.similarityJoinEdges(docs, "text", "doc_id")
    val cand = Dedup.lshCandidates(docs, "text", "doc_id")
    val hit = cand.join(truth, Seq("id_a", "id_b"), "left_semi")
    truth.agg(count(lit(1)).as("n_true"))
      .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(col("n_true"), col("n_candidates"), col("n_hit"),
        when(col("n_true") > 0,
          round(col("n_hit").cast("double") / col("n_true").cast("double"), 6))
          .as("recall"),
        when(col("n_candidates") > 0,
          round(col("n_hit").cast("double")
            / col("n_candidates").cast("double"), 6))
          .as("precision"))
  }

  /** D109: the SAMPLED-truth variant of the D108 recall audit — the
    * version of the audit that itself runs at corpus scale. D108's
    * exact truth set costs Σfreq² (clique-heavy corpora make that
    * quadratic-ish: its own probe legs grew 54.6→142.3 s at ×10→×20);
    * here the truth is restricted to pairs INCIDENT to a deterministic
    * 1-in-k doc-id sample ([[Dedup.similarityJoinEdgesSampled]] — only
    * sampled docs probe the posting index, cost Σfreq²/k), and the
    * candidate side is filtered by the same incidence rule, so
    * recall/precision are estimated over an unbiased 2/k-ish slice of
    * the pair population with EXACT integer arithmetic (hash-green,
    * unlike a random sample).
    */
  def dedupRecallReportSampled(spark: SparkSession, dir: String): DataFrame = {
    val k = 4
    val docs = Tables.documents(spark, dir)
    val truth = Dedup.similarityJoinEdgesSampled(docs, "text", "doc_id",
      sampleK = k)
    val incident = pmod(col("id_a"), lit(k.toLong)) === 0L ||
      pmod(col("id_b"), lit(k.toLong)) === 0L
    val cand = Dedup.lshCandidates(docs, "text", "doc_id").filter(incident)
    val hit = cand.join(truth, Seq("id_a", "id_b"), "left_semi")
    truth.agg(count(lit(1)).as("n_true"))
      .crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
      .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
      .select(lit(k).cast("int").as("sample_k"),
        col("n_true"), col("n_candidates"), col("n_hit"),
        when(col("n_true") > 0,
          round(col("n_hit").cast("double") / col("n_true").cast("double"), 6))
          .as("recall"),
        when(col("n_candidates") > 0,
          round(col("n_hit").cast("double")
            / col("n_candidates").cast("double"), 6))
          .as("precision"))
  }

  /** D2: MinHash-LSH near-dup pairs, verified at jaccard ≥ 0.5.
    * The testdata plants ~0.99-jaccard pairs; LSH with 8 bands × 4
    * rows fires at ~0.5+ with near-certainty.
    */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(Tables.documents(spark, dir), "text", "doc_id")
      .orderBy(col("id_a"), col("id_b"))

  /** D75: b-bit minhash estimate vs exact Jaccard on the same LSH
    * candidates — the measured recall/precision trade of replacing the
    * shingle-shipping verify join with 16-byte compressed signatures.
    */
  def dedupBbitMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.bbitMinhashAudit(Tables.documents(spark, dir), "text", "doc_id")
      .orderBy(col("id_a"), col("id_b"))

  /** D63: cross-source duplication matrix — the provenance audit on
    * top of the near-dup pairs: WHICH sources duplicate WHICH (a hot
    * (src_a, src_b) cell = mirrored/scraped content between two
    * domains; a hot diagonal = within-source boilerplate). Rides the
    * same LSH pair machinery as D2 (so the corpus is shingled once,
    * never all-pairs); the matrix step joins the pair frame — bounded
    * by dup density, ≪ corpus — to the (id, source) projection and
    * partial-aggregates per canonical (least, greatest) source cell.
    * Counts are integers and max-jaccard is exact selection, so the
    * matrix is hash-stable wherever the pair set is.
    */
  def dedupSourceMatrix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val src = docs.select(col("doc_id"), col("source"))
    Dedup.minhashLsh(docs, "text", "doc_id")
      .join(src.select(col("doc_id").as("id_a"), col("source").as("__sa")),
        Seq("id_a"))
      .join(src.select(col("doc_id").as("id_b"), col("source").as("__sb")),
        Seq("id_b"))
      .groupBy(least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"), max(col("jaccard")).as("max_jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** D83: ICWS weighted-Jaccard estimate vs exact, on the D4
    * consecutive-id pairs — multiset similarity the set-based family
    * can't see (see [[Dedup.weightedJaccardAudit]]).
    */
  def dedupWeightedJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.weightedJaccardAudit(Tables.documents(spark, dir), "text", "doc_id")
      .orderBy(col("id_a"))

  /** D3: SimHash near-dup pairs at Hamming ≤ 3. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(spark, dir), "text", "doc_id")
      .orderBy(col("id_a"), col("id_b"))

  /** D4: exact trigram Jaccard for deterministic (consecutive-id)
    * pairs — the oracle-checkable face of the shingle machinery.
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.consecutivePairJaccard(Tables.documents(spark, dir), "text", "doc_id")
      .orderBy(col("id_a"))

  /** D17: dedup resolution — exact similarity-join edges (inverted
    * shingle index) → connected components → canonical id per doc.
    * The full dedup pipeline's final step, DuckDB-oracled via a
    * recursive-CTE transitive closure.
    */
  def dedupResolve(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val edges = Dedup.similarityJoinEdges(docs, "text", "doc_id")
    Dedup.connectedComponents(edges, docs.select(col("doc_id").as("id")))
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** D67: leakage-safe train/val/test split — the split real eval
    * hygiene requires: hash the DEDUP CLUSTER's canonical id, not the
    * doc id, so near-duplicates can never straddle train and test (a
    * doc-id split leaks every paraphrase pair across the boundary and
    * inflates eval scores — the memorization hole D19's
    * decontamination can't see because the "test set" is in-corpus).
    * Composes D17's resolution (the expensive plan, shared shape)
    * with D25's seeded-hash projection on `canonical_id`; singleton
    * docs are their own cluster, so the split marginals stay ≈
    * 90/5/5.
    */
  def leakageSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val edges = Dedup.similarityJoinEdges(docs, "text", "doc_id")
    val canon = Dedup.connectedComponents(
      edges, docs.select(col("doc_id").as("id")))
    graft.operators.Resample
      .splitByHash(canon, col("canonical_id"), Seq(0.9, 0.05, 0.05))
      .select(col("id").as("doc_id"), col("canonical_id"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** D17b: dedup-audit cluster-size distribution — how many duplicate
    * groups exist at each size (the first chart any dedup report
    * shows; a fat tail means boilerplate cliques). Composes the D17
    * resolution with two tiny aggregates — the expensive edges/CC work
    * is the same plan as `dedup_resolve`.
    */
  def dedupClusterSizes(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val edges = Dedup.similarityJoinEdges(docs, "text", "doc_id")
    Dedup.connectedComponents(edges, docs.select(col("doc_id").as("id")))
      .groupBy(col("canonical_id")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("cluster_size"))
  }

  /** D17c: quality-aware canonical selection — the keep-rule real
    * dedup pipelines actually run: within each duplicate cluster
    * (D17's connected components), keep the HIGHEST-QUALITY document
    * (D9's score; ties → lowest id), not an arbitrary min-id. The
    * per-cluster rank window is bounded by cluster size — dup-density
    * bounded, never corpus-bounded — so the keep-rule adds no
    * scale risk over the resolution itself.
    */
  def dedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val edges = Dedup.similarityJoinEdges(docs, "text", "doc_id")
    val cc = Dedup.connectedComponents(edges, docs.select(col("doc_id").as("id")))
    val scored = docs.select(col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("quality"))
    val w = Window.partitionBy(col("canonical_id"))
      .orderBy(col("quality").desc, col("doc_id"))
    cc.join(scored, col("id") === col("doc_id"))
      .withColumn("__rn", row_number().over(w))
      .select(col("doc_id"), col("canonical_id"),
        (col("__rn") === 1).as("kept"))
      .orderBy(col("doc_id"))
  }

  /** D26: duplicated-span removal — strips every token position
    * covered by a 4-gram that occurs ≥2 times corpus-wide. The word
    * domain in the synthetic corpus is small, so cross-doc repeated
    * 4-grams genuinely exist and the rewrite is non-degenerate (a few
    * percent of positions drop); real boilerplate repeats far harder.
    */
  def dedupRepeatedSpans(spark: SparkSession, dir: String): DataFrame =
    Dedup.stripRepeatedSpans(Tables.documents(spark, dir), "text", "doc_id",
        n = 4, minCount = 2)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** D36: exact character-level span dedup (suffix-array semantics at
    * threshold L=30 via the exact-L reduction — see
    * [[graft.operators.SuffixDedup]]).
    */
  def dedupCharSpans(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SuffixDedup.stripRepeatedCharSpans(
        Tables.documents(spark, dir), "text", "doc_id", minLen = 30)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** D37: unigram LM cross-entropy per document (CCNet-style quality
    * signal — see [[graft.operators.LanguageModel]]).
    */
  def lmCrossEntropy(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LanguageModel.scoreCorpus(
        Tables.documents(spark, dir), "text", "doc_id", topK = 64)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** D37b: stupid-backoff bigram cross-entropy (sharper perplexity
    * signal, same broadcastable-model shape).
    */
  def lmBigramCrossEntropy(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LanguageModel.scoreCorpusBigram(
        Tables.documents(spark, dir), "text", "doc_id", topK = 64)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** D37c: interpolated Kneser–Ney cross-entropy — the principled
    * smoothing upgrade over D37b's stupid backoff (continuation-
    * probability base, absolute discounting); same vocab, same
    * zero-shuffle scoring plan.
    */
  def lmKnCrossEntropy(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LanguageModel.scoreCorpusKn(
        Tables.documents(spark, dir), "text", "doc_id", topK = 64)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** D80: holdout perplexity — the eval-hygiene face of the LM family:
    * the bigram model trains ONLY on the D25 hash-split train fold and
    * scores ONLY the val fold, so the reported cross-entropy is an
    * out-of-sample number a perplexity-gated curation pipeline can
    * trust (in-sample CE, which every lm_* key reports by design,
    * flatters memorized boilerplate — exactly the documents dedup
    * should have caught). Same retry-stable split as `train_split`,
    * same zero-shuffle scoring plan; only the training pass's inputs
    * shrink to the train fold.
    */
  def holdoutPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sp = graft.operators.Resample.splitByHash(
      docs, col("doc_id"), Seq(0.9, 0.05, 0.05))
    val lm = graft.operators.LanguageModel.trainBigram(
      sp.filter(col("split") === 0), "text", topK = 64)
    sp.filter(col("split") === 1)
      .select(col("doc_id"),
        // the guarded tokenizer: an empty val-fold doc must count 0
        // tokens like the oracle's d0 CASE, not split(trim(''))'s ['']
        size(graft.operators.LanguageModel.toks(col("text"))).as("n_tokens"),
        graft.operators.LanguageModel.crossEntropyBigram(col("text"), lm)
          .as("cross_entropy"))
      .orderBy(col("doc_id"))
  }

  /** D81: corpus dataset card — the one-query summary a corpus release
    * ships (HuggingFace dataset-card numbers): volume, language mix,
    * duplication, quality, the Zipf health slope, and eval
    * contamination, as one (metric, value) frame. Every leg is an
    * already-oracled expression tree composed at aggregate
    * granularity, so the card inherits each leg's determinism and
    * scale story (the expensive legs — LSH pairs, contamination — are
    * the same plans the standalone keys run; the card adds only their
    * final counts).
    */
  def corpusCard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    def one(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("metric"), col("value").cast("double").as("value"))
    val nDocs = one("n_docs", docs.agg(count(lit(1)).as("value")))
    val nTokens = one("n_tokens", docs.agg(
      sum(size(graft.operators.LanguageModel.toks(col("text")))).as("value")))
    val langs = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .select(concat(lit("docs_lang:"), col("lang")).as("metric"),
        col("n").cast("double").as("value"))
    val dupGroups = one("exact_dup_groups",
      Dedup.exact(docs, col("text"), col("doc_id"))
        .filter(col("n_copies") > 1).agg(count(lit(1)).as("value")))
    val nearDup = one("neardup_pairs",
      Dedup.minhashLsh(docs, "text", "doc_id").agg(count(lit(1)).as("value")))
    val quality = one("mean_quality_micro", docs.select(
        round(TextFunctions.qualityScore(col("text")) * 1000000.0)
          .cast("long").as("q"))
      .agg(round(sum(col("q")).cast("double") / count(lit(1)).cast("double"), 6)
        .as("value")))
    val zipf = one("zipf_slope",
      ExtendedQueries.zipfFit(spark, dir).select(col("slope").as("value")))
    val contam = one("contamination_pairs",
      decontaminate(spark, dir).agg(count(lit(1)).as("value")))
    nDocs.unionAll(nTokens).unionAll(langs).unionAll(dupGroups)
      .unionAll(nearDup).unionAll(quality).unionAll(zipf).unionAll(contam)
      .orderBy(col("metric"))
  }

  /** D82: bootstrap CI on the card's mean-quality number — release
    * summaries should ship with uncertainty (a mean over a skewed
    * quality distribution moves with a handful of outlier docs). The
    * deterministic Poisson bootstrap of [[graft.operators.Bootstrap]]
    * over the D14 micro-unit quality: 200 replicas, 95% interval.
    */
  def bootstrapQualityCi(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Bootstrap.meanCi(
      Tables.documents(spark, dir),
      col("doc_id"),
      round(TextFunctions.qualityScore(col("text")) * 1000000.0).cast("long"))

  /** D27: per-source quota cap — at most 12 docs per source, kept by
    * lowest doc_id (deterministic priority). Goes through the
    * `row_number <= k` idiom, so TopKRewrite runs it on the
    * bounded-heap operator.
    */
  def sourceQuota(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Resample.quotaCap(
        Tables.documents(spark, dir).select(col("doc_id"), col("source")),
        col("source"), Seq(col("doc_id")), quota = 12)
      .orderBy(col("source"), col("doc_id"))

  /** D28: deterministic sequence packing — documents land at
    * reproducible offsets in 8 parallel token streams, chunked into
    * 512-token context windows. The bucket here is `doc_id % 8` so
    * the oracle can express it; production callers pass a seeded
    * hash bucket.
    */
  def sequencePack(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.operators.Pack.concatChunk(docs,
        col("doc_id"), TextFunctions.tokenCount(col("text")),
        pmod(col("doc_id"), lit(8)), budget = 512L)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** D43: truncation-free packing — next-fit-decreasing whole-document
    * shards (see [[graft.operators.Pack.nextFitDecreasing]]); same
    * bucket/budget dials as [[sequencePack]] so the two recipes
    * compare directly.
    */
  def sequencePackNextFit(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Pack.nextFitDecreasing(Tables.documents(spark, dir),
        col("doc_id"), TextFunctions.tokenCount(col("text")),
        pmod(col("doc_id"), lit(8)), budget = 512L)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** D73: the packer's waste ledger — shard counts, token mass,
    * capacity and utilization per bucket over the SAME D43 packing
    * (the number a training-efficiency dashboard actually tracks:
    * every wasted slot is paid-for compute attending to padding).
    */
  def packingEfficiency(spark: SparkSession, dir: String): DataFrame = {
    val packed = graft.operators.Pack.nextFitDecreasing(
      Tables.documents(spark, dir),
      col("doc_id"), TextFunctions.tokenCount(col("text")),
      pmod(col("doc_id"), lit(8)), budget = 512L)
    packed.groupBy(col("bucket"))
      .agg((max(col("shard")) + 1).as("n_shards"),
        sum(col("n_tokens")).as("total_tokens"))
      .select(col("bucket"), col("n_shards"), col("total_tokens"),
        (col("n_shards") * 512).as("capacity_tokens"),
        (col("n_shards") * 512 - col("total_tokens")).as("waste_tokens"),
        round(col("total_tokens").cast("double") /
          (col("n_shards") * 512).cast("double"), 6).as("utilization"))
      .orderBy(col("bucket"))
  }

  /** D53: CCNet-style duplicated-paragraph removal — see
    * [[graft.operators.ParagraphDedup]] (digest-keyed detection,
    * anti-join strip, ordered reassembly; the granularity between
    * whole-doc D1 and char-span D26/D36). This face runs the one-shot
    * batch form over the documents table; the frozen-digest streaming
    * gate is [[graft.streaming.StreamingBoilerplate]] (E15).
    */
  def paragraphDedup(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ParagraphDedup.dedup(
        Tables.documents(spark, dir), col("text"), col("doc_id"))
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))

  /** D54: token-budget selection — fill half the corpus's TOKEN mass
    * with the highest-quality docs (see
    * [[graft.operators.TokenBudget]]): the budget question curation
    * actually answers, distinct from D33's doc-count percentile
    * because long docs make the two cuts diverge. Returns every doc
    * with its kept verdict.
    */
  def tokenBudgetSelect(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir).select(col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("quality"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val budget = scored.agg(sum(col("n_tokens"))).head().getLong(0) / 2
    graft.operators.TokenBudget.markKept(scored,
        col("quality"), col("n_tokens"), col("doc_id"), budget)
      .select(col("doc_id"), col("n_tokens"), col("quality"), col("kept"))
      .orderBy(col("doc_id"))
  }

  /** D29: intra-document repetition scoring (Gopher/MassiveText-style
    * quality signals): the fraction of trigram occurrences that are
    * duplicates (positional shingles vs their distinct set — pure
    * codegen array algebra, no shuffle), and the fraction of tokens
    * taken by the single most frequent token (explode → two partial
    * aggregates — the shuffle carries (doc, token) counts, not text).
    * High values mark the looping/boilerplate docs corpus filters
    * drop.
    */
  def textRepetitionScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // codegen shingle kernel, ~10× throughput on the materialization
    // path (the D71 fusion measurement). Trigrams come from the
    // FULLY-whitespace-trimmed text (no phantom empty tokens at
    // tab/newline edges — the kernel's boundary semantics, mirrored
    // by the oracle); n_tokens keeps the house split(trim) count
    val base = docs.select(col("doc_id"),
      TextFunctions.tokens(col("text")).as("toks"),
      graft.functions.ShingleFunctions.word_shingles(col("text"), 3)
        .as("tg"))
    val dup = base.select(col("doc_id"),
      size(col("toks")).as("n_tokens"),
      when(size(col("tg")) === 0, 0.0)
        .otherwise((size(col("tg")) - size(array_distinct(col("tg"))))
          .cast("double") / size(col("tg")).cast("double"))
        .as("dup_trigram_frac"))
    val top = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_c"))
    dup.join(top, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("dup_trigram_frac"),
        (col("top_c").cast("double") / col("n_tokens").cast("double"))
          .as("top_token_frac"))
      .orderBy(col("doc_id"))
  }

  /** D8: token counting — whitespace tokens and BPE-ish subtokens. */
  def textTokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.subtokenCount(col("text")).as("n_subtokens"),
        col("n_chars"))
      .orderBy(col("doc_id"))

  /** D9: quality scoring — length prior, lexical diversity, stopword
    * ratio, composed in a fixed-order double formula.
    */
  def textQualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    Tables.documents(spark, dir).select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.uniqueTokenRatio(toks).as("uniq_ratio"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** D33: percentile-threshold quality filter — keep the top quartile
    * of the corpus by quality score, WITHOUT a global sort or per-doc
    * window. Scores live in [0,1]: the corpus collapses to a ≤101-row
    * 2-dp bucket histogram, the p75 threshold bucket reads off the
    * cumulative histogram (same tiny-domain pattern as
    * [[textLengthQuantilesExact]]/C18), and the keep-filter runs as a
    * narrow broadcast-compare pass. Threshold granularity is a bucket
    * (0.01) — the curation contract is "top ~quartile", not an exact
    * doc count, which is what makes it exchange-free at any scale.
    */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir).select(
        col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      .withColumn("__b", floor(col("quality") * lit(100.0)).cast("long"))
    val counts = scored.groupBy(col("__b")).agg(count(lit(1)).as("cnt"))
    val thr = graft.operators.CumHistogram.cumulative(counts, "__b", "cnt")
      .filter(col("cum") >= col("total") * lit(0.75))
      .agg(min(col("__b")).as("__thr"))
    scored.crossJoin(broadcast(thr))
      .filter(col("__b") >= col("__thr"))
      .select(col("doc_id"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** D35: quality-weighted sampling — each doc survives with
    * probability equal to its quality score (deterministic seeded
    * hash, see [[graft.operators.Resample.byScore]]). Composes two
    * already-bit-exact pieces: the D9 quality doubles and the
    * portable-XXH64 bucket, so the kept SET is oracle-checkable
    * exactly.
    */
  def qualityWeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir).select(
      col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("quality"))
    graft.operators.Resample.byScore(scored, col("quality"), col("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** D34: vocabulary-driven greedy subword tokenization — the
    * BPE-vocab upgrade of D8's regex counts. Per-word subword counts
    * via the [[graft.functions.GreedyTokenize]] kernel (one pass, hash
    * probes, whole-stage codegen); zero shuffle — token arrays never
    * leave their rows. The HOF twin mirrors the recurrence for the
    * DuckDB oracle (pure string/integer ops — bit-exact).
    */
  def vocabTokenize(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_words"),
        size(graft.functions.TokenizeKernel.greedySubwordsText(
          col("text"), SubwordVocab, maxLen = 3)).as("n_subtokens"))
      .orderBy(col("doc_id"))

  /** Plan-time subword vocabulary for [[vocabTokenize]] — common
    * English 2-3-grams; single codepoints are the implicit fallback
    * alphabet (see [[graft.functions.VocabTable]]).
    */
  val SubwordVocab: Seq[String] = Seq(
    "the", "and", "ing", "ion", "ent", "er", "in", "on", "at", "or",
    "re", "st", "an", "te", "ed", "ti", "es", "le")

  /** D39: [[vocabTokenize]] with a vocab TRAINED on this corpus — BPE
    * merges learned from the word-frequency table
    * ([[graft.operators.Bpe]], 64 merges), then the same zero-shuffle
    * greedy kernel. Oracled via the Verify-time trained-vocab
    * embedding (the `vocab_tokenize` oracle generator, dynamic vocab).
    */
  def vocabBpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val trained = graft.operators.Bpe.trainCached(
      s"documents:$dir", docs, "text", numMerges = 64)
    docs.select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_words"),
        size(graft.functions.TokenizeKernel.greedySubwordsText(
          col("text"), trained.vocab,
          graft.operators.Bpe.maxTokenLen(trained))).as("n_subtokens"))
      .orderBy(col("doc_id"))
  }

  /** D106: optimal Gini split of the Gopher verdict on token count —
    * "at what length cutoff does the quality rule split best", the
    * rule-induction readout that turns a continuous curation signal
    * into a defensible hard filter. See
    * [[graft.operators.AbStats.bestGiniSplit]].
    */
  def bestLengthSplit(spark: SparkSession, dir: String): DataFrame = {
    val stops = array(Seq("the", "a", "of", "to", "and").map(lit): _*)
    val ws = split(trim(col("text")), "\\s+")
    val nWords = size(ws)
    val meanLen = length(regexp_replace(trim(col("text")), "\\s+", ""))
      .cast("double") / nWords.cast("double")
    val alphaFrac = size(filter(ws, w => w.rlike("[a-z]")))
      .cast("double") / nWords.cast("double")
    val stopHits = size(filter(ws, w => array_contains(stops, w)))
    val gopherKeep = nWords.between(40, 100000) &&
      meanLen.between(3.0, 5.0) && alphaFrac >= 0.8 && stopHits >= 1
    graft.operators.AbStats.bestGiniSplit(
      Tables.documents(spark, dir), nWords.cast("long"), gopherKeep)
  }

  /** D105: Spearman rank correlation between token count and the D14
    * quality micro-score — the monotone-association audit behind the
    * D79 Pearson matrix (quality SHOULD rise with length up to the
    * 64-token saturation; a Pearson blind spot). See
    * [[graft.operators.AbStats.spearmanCorrelation]].
    */
  def spearmanSignals(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.spearmanCorrelation(
      Tables.documents(spark, dir),
      TextFunctions.tokenCount(col("text")).cast("long"),
      round(TextFunctions.qualityScore(col("text")) * 1000000.0)
        .cast("long"))

  /** D104: tokenizer fertility per language (subtokens per whitespace
    * word — THE multilingual tokenizer-quality number next to D34c's
    * OOV rate: a language whose fertility balloons pays more compute
    * per unit of text and silently shrinks in token-budgeted
    * mixtures). Same codegen kernel scan as D39; per-lang exact
    * integer sums, fertility ONE divide.
    */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val trained = graft.operators.Bpe.trainCached(
      s"documents:$dir", docs, "text", numMerges = 64)
    docs.select(col("lang"),
        TextFunctions.tokenCount(col("text")).cast("long").as("__w"),
        size(graft.functions.TokenizeKernel.greedySubwordsText(
          col("text"), trained.vocab,
          graft.operators.Bpe.maxTokenLen(trained))).cast("long").as("__s"))
      .groupBy(col("lang"))
      .agg(sum(col("__w")).as("n_words"), sum(col("__s")).as("n_subtokens"))
      .select(col("lang"), col("n_words"), col("n_subtokens"),
        round(col("n_subtokens").cast("double")
          / col("n_words").cast("double"), 6).as("fertility"))
      .orderBy(col("lang"))
  }

  /** D34c: tokenizer vocabulary coverage / OOV-rate report — per
    * language, the fraction of emitted pieces that fell back to the
    * single-codepoint alphabet (every vocab entry is ≥2 codepoints,
    * so piece length 1 ⇔ fallback). THE acceptance metric for a
    * tokenizer/corpus pairing: a language whose OOV rate spikes is
    * one the vocab under-serves, and its token counts (and therefore
    * its mixture quotas, D47/D48) are inflated by char-level
    * fragmentation. Zero extra shuffle beyond the per-lang aggregate:
    * the kernel scan is the same codegen pass D34 runs.
    */
  def vocabOovRate(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        graft.functions.TokenizeKernel.greedySubwordsText(
          col("text"), SubwordVocab, maxLen = 3).as("pieces"))
      .select(col("lang"),
        size(col("pieces")).cast("long").as("np"),
        size(filter(col("pieces"), p => length(p) === 1)).cast("long").as("nf"))
      .groupBy(col("lang"))
      .agg(sum(col("np")).as("n_pieces"), sum(col("nf")).as("n_fallback"))
      .select(col("lang"), col("n_pieces"), col("n_fallback"),
        round(col("n_fallback").cast("double") / col("n_pieces").cast("double"), 6)
          .as("oov_rate"))
      .orderBy(col("lang"))

  /** D34b: token-ID emission — the subword stream as trainer-ready
    * vocab ids. Id space: index into the effective (≥2-codepoint)
    * vocab for real entries, `V + codepoint` for the single-codepoint
    * fallback alphabet — total and collision-free by construction
    * (codepoints start above any vocab index). The kernel does the
    * heavy scan in codegen; the id projection is a per-token map probe
    * over the result array (an interpreted HOF, but O(tokens) map
    * lookups — the scan itself stays in the codegen span).
    */
  def vocabTokenizeIds(spark: SparkSession, dir: String): DataFrame = {
    val effective = SubwordVocab.filter(v => v.codePointCount(0, v.length) >= 2)
    val idMap = map(effective.zipWithIndex
      .flatMap { case (v, i) => Seq(lit(v), lit(i)) }: _*)
    val v = effective.length
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        transform(
          graft.functions.TokenizeKernel.greedySubwordsText(
            col("text"), SubwordVocab, maxLen = 3),
          s => coalesce(element_at(idMap, s), lit(v) + ascii(s)))
          .as("token_ids"))
      .select(col("doc_id"), size(col("token_ids")).as("n_tokens"),
        // scalar serialization, not a bare array<int>: downstream
        // row-hash harnesses can't sort/hash list cells, and the
        // '-'-joined form is byte-identical across engines for
        // non-negative ids
        concat_ws("-", transform(col("token_ids"), i => i.cast("string")))
          .as("token_ids"))
      .orderBy(col("doc_id"))
  }

  /** D42: fill-in-middle transformation (Bavarian et al. 2022) — the
    * FIM data augmentation code/infilling models train on: for a
    * seeded-hash-chosen half of the corpus, the character sequence
    * splits at two hash-derived cut points and re-emits in
    * prefix-suffix-middle order with sentinel markers; the rest pass
    * through. Everything derives from ONE xxhash64 of the doc id
    * (coin, cut start, cut length — integer mod/div chains), so the
    * transform is a zero-shuffle projection, reproducible under any
    * partitioning, and prefix-stable as the corpus grows — the D20/D25
    * seeded-hash discipline applied to sequence surgery.
    */
  def fimTransform(spark: SparkSession, dir: String): DataFrame = {
    val h = pmod(xxhash64(lit(42L), col("doc_id")), lit(1000000L))
    val n = length(col("text")).cast("long")
    val nSafe = greatest(n, lit(2L)) // keep the mod chain total on tiny docs
    val a = lit(1L) + (h % nSafe)
    val lenMid = pmod(floor(h / nSafe).cast("long"), nSafe - a + lit(2L))
    val prefix = col("text").substr(lit(1), (a - 1).cast("int"))
    val middle = col("text").substr(a.cast("int"), lenMid.cast("int"))
    val suffix = col("text").substr((a + lenMid).cast("int"),
      (n - a - lenMid + 1).cast("int"))
    val applied = (h % 2 === 0) && (n >= 2)
    Tables.documents(spark, dir)
      .select(col("doc_id"), applied.as("fim_applied"),
        when(applied,
          concat(lit("<PRE>"), prefix, lit("<SUF>"), suffix,
            lit("<MID>"), middle))
          .otherwise(col("text")).as("fim_text"))
      .orderBy(col("doc_id"))
  }

  /** D41: the Gopher/MassiveText document-quality rule set (Rae et
    * al. 2021 §A1.1): word-count bounds, mean-word-length band,
    * alphabetic-word fraction, stopword floor — the published recipe
    * web-corpus curation actually runs, as ONE zero-shuffle projection
    * (all rules are per-doc column algebra; thresholds sit in the
    * observed corpus range so both outcomes occur). `keep` is the
    * conjunction; the component signals surface for auditability.
    * Exact integer counts + single double divisions → hash-exact.
    */
  def gopherQualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val stops = array(Seq("the", "a", "of", "to", "and").map(lit): _*)
    val ws = split(trim(col("text")), "\\s+")
    val nWords = size(ws)
    val meanLen = length(regexp_replace(trim(col("text")), "\\s+", ""))
      .cast("double") / nWords.cast("double")
    val alphaFrac = size(filter(ws, w => w.rlike("[a-z]")))
      .cast("double") / nWords.cast("double")
    val stopHits = size(filter(ws, w => array_contains(stops, w)))
    Tables.documents(spark, dir)
      .select(col("doc_id"), nWords.as("n_words"),
        meanLen.as("mean_word_len"), alphaFrac.as("alpha_frac"),
        stopHits.as("stop_hits"))
      .withColumn("keep",
        col("n_words").between(40, 100000) &&
        col("mean_word_len").between(3.0, 5.0) &&
        col("alpha_frac") >= 0.8 &&
        col("stop_hits") >= 1)
      .orderBy(col("doc_id"))
  }

  /** D40: blocklist screening (the C4-recipe banned-word stage): exact
    * whitespace-token hits against a plan-time banned list. Pure
    * codegen array algebra — the list rides the plan as a literal,
    * zero shuffle, and the filter composes with any downstream stage.
    * Word-boundary semantics (token equality, not substring) so
    * "bigram" never trips a ban on "big" — the standard word-filter
    * contract. Exact integer counts → DuckDB-oracled.
    */
  def textBlocklist(spark: SparkSession, dir: String): DataFrame = {
    val banned = array(Blocklist.map(lit): _*)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(filter(split(trim(col("text")), "\\s+"),
          t => array_contains(banned, t))).as("n_hits"))
      .select(col("doc_id"), col("n_hits"),
        (col("n_hits") === 0).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Plan-time banned tokens for [[textBlocklist]] — stand-ins for a
    * real word-filter list; mid-frequency in the synthetic corpus so
    * both outcomes are exercised.
    */
  val Blocklist: Seq[String] = Seq("slow", "dup", "big")

  /** D10: language ID by stopword scoring with deterministic argmax. */
  def textLangId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
        col("doc_id"),
        TextFunctions.langId(col("text")).as("pred_lang"))
      .orderBy(col("doc_id"))

  /** D103: Heaps'-law vocabulary-growth fit (Heaps 1978: V(n) ≈
    * K·n^β — the law behind tokenizer/vocab sizing: how fast does
    * vocabulary grow as the corpus grows). V is sampled at 10
    * evenly-spaced doc_id thresholds: V(t) = #distinct terms whose
    * FIRST document ≤ t (one corpus-gram-bounded min-aggregation —
    * "distinct so far" without any sequential scan), D(t) = #docs ≤
    * t; β and ln K come from OLS over the 10 (ln D, ln V) points,
    * summed in FIXED textual order (a 10-term scalar chain — no
    * collect, no fold list) so the doubles are engine-identical.
    */
  def heapsLawFit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val terms = docs
      .select(col("doc_id"), explode(TextFunctions.tokens(col("text")))
        .as("term"))
      .groupBy(col("term")).agg(min(col("doc_id")).as("fd"))
    val bounds = docs.agg(min(col("doc_id")).as("lo"),
      max(col("doc_id")).as("hi"))
    def thr(i: Int): Column =
      col("lo") + ((col("hi") - col("lo")) * i - ((col("hi") - col("lo")) * i) % 10) / 10
    // V legs over the term frame, D legs over the doc frame — one
    // conditional aggregate each, thresholds broadcast as scalars
    val vLegs = (1 to 10).map(i =>
      sum(when(col("fd") <= thr(i), 1L).otherwise(0L)).as(s"v$i"))
    val dLegs = (1 to 10).map(i =>
      sum(when(col("doc_id") <= thr(i), 1L).otherwise(0L)).as(s"d$i"))
    val vRow = terms.crossJoin(broadcast(bounds))
      .agg(vLegs.head, vLegs.tail: _*)
    val dRow = docs.crossJoin(broadcast(bounds))
      .agg(dLegs.head, dLegs.tail: _*)
    val joined = vRow.crossJoin(dRow)
    def x(i: Int): Column = log(col(s"d$i").cast("double"))
    def y(i: Int): Column = log(col(s"v$i").cast("double"))
    val k = lit(10.0)
    val sx = (1 to 10).map(x).reduceLeft(_ + _)
    val sy = (1 to 10).map(y).reduceLeft(_ + _)
    val sxy = (1 to 10).map(i => x(i) * y(i)).reduceLeft(_ + _)
    val sxx = (1 to 10).map(i => x(i) * x(i)).reduceLeft(_ + _)
    val den = k * sxx - sx * sx
    joined.select(
      col("d10").as("n_docs"), col("v10").as("vocab"),
      when(den > 0.0, round((k * sxy - sx * sy) / den, 6)).as("beta"),
      when(den > 0.0,
        round((sy - (k * sxy - sx * sy) / den * sx) / k, 6)).as("ln_k"))
  }

  /** D102: language-ID confusion matrix — the classifier eval behind
    * D13: per (true label, prediction) cell count plus the true
    * class's recall share. One scan, a \|langs\|²-cell shuffle; counts
    * exact, recall ONE divide.
    */
  def langIdConfusion(spark: SparkSession, dir: String): DataFrame = {
    // cells reused by totals + join — cut so the scoring scan runs once
    val cells = graft.operators.Materialize.cut(Tables.documents(spark, dir)
      .select(col("lang").as("true_lang"),
        TextFunctions.langId(col("text")).as("pred_lang"))
      .groupBy(col("true_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n")))
    val totals = cells.groupBy(col("true_lang")).agg(sum(col("n")).as("tot"))
    cells.join(broadcast(totals), Seq("true_lang"))
      .select(col("true_lang"), col("pred_lang"), col("n"),
        round(col("n").cast("double") / col("tot").cast("double"), 6)
          .as("share"))
      .orderBy(col("true_lang"), col("pred_lang"))
  }

  /** D11: rolling-hash document fingerprint via the custom Catalyst
    * expression [[graft.functions.RollingFingerprint]] (codegen'd
    * byte loop inlined into the scan stage).
    */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
        col("doc_id"),
        graft.functions.Fingerprint.rolling_fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** D19: benchmark decontamination — every 10th doc plays the eval
    * set; corpus docs sharing any 8-gram with it are flagged. The
    * planted near-dup structure guarantees non-degenerate output at
    * every test SF.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    Dedup.contamination(docs, bench, "text", "doc_id", n = 8,
      benchIsSmall = Some(true))
      .orderBy(col("doc_id"), col("bench_id"))
  }

  /** D19b: per-document contamination score — the graded overlap
    * fraction against the same every-10th-doc eval slice as
    * [[decontaminate]] (see [[graft.operators.Dedup.contaminationScore]]);
    * scored docs are the non-bench remainder (training candidates vs
    * the eval set, the realistic framing).
    */
  def decontaminationScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.operators.Dedup.contaminationScore(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "text", "doc_id", n = 8)
      .orderBy(col("doc_id"))
  }

  /** D74: char-level decontamination — corpus docs sharing any exact
    * 30-char substring with the same every-10th-doc eval slice; the
    * strictest overlap screen, catching reflowed/re-punctuated
    * copies the D19 token-8-gram screen tokenizes differently. See
    * [[graft.operators.SuffixDedup.charContamination]].
    */
  def decontaminationChar(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.operators.SuffixDedup.charContamination(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), col("text")),
        "text", "doc_id", len = 30)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** D52: corpus drift report — PSI of the language mix between the
    * first source group (src0–src9, the "reference" corpus) and the
    * second (src10–src19, the "incoming" batch); see
    * [[graft.operators.Drift.psi]]. The admission gate a pipeline
    * runs before folding a new crawl into the training mix.
    */
  def corpusDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("__sn", expr("CAST(substr(source, 4) AS INT)"))
    graft.operators.Drift.psi(
        docs.filter(col("__sn") < 10),
        docs.filter(col("__sn") >= 10),
        col("lang"))
      .orderBy(col("bucket"))
  }

  /** D50: within-corpus n-gram novelty audit — per-doc fraction of
    * distinct 8-grams shared with at least one other document (see
    * [[graft.operators.Dedup.noveltyScore]]). The memorization /
    * boilerplate exposure signal D26's span REMOVAL decides with;
    * this emits the graded score for reporting and thresholding.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.noveltyScore(
        Tables.documents(spark, dir), "text", "doc_id", n = 8)
      .orderBy(col("doc_id"))

  /** D45: DSIR importance resampling — target distribution = the
    * English slice, raw = the whole corpus; Gumbel-top-100 weighted
    * sample without replacement (see [[graft.operators.Dsir]]). The
    * realistic curation move: "make the training mix look like the
    * trusted slice".
    */
  def dsirResample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.operators.Dsir.resample(docs,
        docs.filter(col("lang") === "en"), "text", "doc_id",
        k = 100, vocabTopK = 64)
      .orderBy(col("doc_id"))
  }

  /** D47: perplexity filtering — CCNet's actual gate: score every doc
    * under the D37b stupid-backoff bigram LM, keep the most-fluent 70%
    * PER LANGUAGE (a global cut would just drop whole low-resource
    * languages, the known failure mode the per-lang split avoids).
    * Emits the keep flag rather than dropping rows, so downstream
    * stages (and the oracle) see both sides of the cut. Exact-integer
    * rank cut on the 6-dp-rounded score with id tiebreaks — both
    * engines walk the same boundary.
    *
    * Scale shape: the naive `row_number() OVER (PARTITION BY lang)`
    * puts EVERY document of a language into one task — at 100 TB the
    * dominant language is most of the corpus in one sort partition.
    * Instead the cut runs through [[graft.operators.StratifiedTopQuota]]:
    * per-(lang, 2-dp score bucket) histogram → per-lang p70 boundary
    * bucket off the cumulative histogram (a window over the
    * AGGREGATE) → narrow broadcast-compare verdict for every doc
    * outside the boundary bucket → rank only the one 0.01-nat-wide
    * score band that straddles each language's quota. The kept set is
    * bit-identical to the window twin (the oracle keeps that
    * formulation).
    */
  def perplexityFilter(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val lm = graft.operators.LanguageModel.trainBigram(docs, "text", topK = 64)
    // cut once: the LM fold is the dominant cost and BOTH the quota
    // count and the quota walk read this frame (3 narrow columns —
    // storing it is ~nothing, re-scoring the corpus is everything)
    val scored = graft.operators.Materialize.cut(
      docs.select(col("doc_id"), col("lang"),
        graft.operators.LanguageModel.crossEntropyBigram(col("text"), lm)
          .as("cross_entropy")))
    val quotas = scored.groupBy(col("lang").as("__stratum"))
      .agg(ceil(count(lit(1)) * lit(0.7)).cast("long").as("__quota"))
    graft.operators.StratifiedTopQuota.markKept(scored,
        stratum = col("lang"),
        ord = Seq(col("cross_entropy"), col("doc_id")),
        // NaN guard: a degenerate doc scoring NaN would floor/cast to 0
        // under non-ANSI casts and bucket AHEAD of every real score,
        // while the row_number twin (and DuckDB) sort NaN LAST — pin
        // NaN into the last bucket so both paths agree.
        coarse = when(isnan(col("cross_entropy")), lit(Long.MaxValue))
          .otherwise(floor(col("cross_entropy") * lit(100.0))),
        quotas = broadcast(quotas),
        keptCol = "kept")
      .select(col("doc_id"), col("lang"), col("cross_entropy"), col("kept"))
      .orderBy(col("doc_id"))
  }

  /** D48: temperature-flattened source mixture — 400 docs sampled
    * across the 20 source domains ∝ √(token mass) (τ = ½; see
    * [[graft.operators.Resample.temperatureBySource]] for why ½ is
    * the bit-reproducible temperature). Returns the kept (doc_id,
    * source, n_tokens) rows — the mixture a fill-the-context training
    * run would read.
    */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(
      col("doc_id"), col("source"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    graft.operators.Resample.temperatureBySource(
        docs, col("source"), col("doc_id"), col("n_tokens"), sampleN = 400L)
      .orderBy(col("doc_id"))
  }

  /** D49: UniMax max-uniform language mixture — 380 docs allocated as
    * uniformly across the 5 languages as availability allows (see
    * [[graft.operators.Resample.waterFillByStratum]]). On this corpus
    * every tail language (fr/de/es/zh) is included WHOLE and English
    * absorbs the cascaded remainder — the exact opposite failure mode
    * of a proportional draw.
    */
  def unimaxMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
    graft.operators.Resample.waterFillByStratum(
        docs, col("lang"), col("doc_id"), budget = 380L)
      .orderBy(col("doc_id"))
  }

  /** D20: deterministic training-order shuffle — a seeded hash of the
    * id as the sort key. At 100 TB this is a range-partitioned sort
    * (Spark samples split points), the standard way to randomize
    * example order without a driver-side permutation; re-running with
    * the same seed reproduces the exact order.
    */
  def trainingOrder(spark: SparkSession, dir: String, seed: Long = 42L): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), xxhash64(lit(seed), col("doc_id")).as("sort_key"))
      .orderBy(col("sort_key"), col("doc_id"))

  /** D60: dense contiguous example ids in training order —
    * D20's seeded-hash shuffle order, with ids 0..n-1 assigned by the
    * bucket-offset scheme instead of a global sort or an unpartitioned
    * `row_number` (see [[graft.operators.GlobalIds]] — the shard/
    * example-index assignment a 100 TB training run needs).
    */
  def denseIds(spark: SparkSession, dir: String, seed: Long = 42L): DataFrame =
    graft.operators.GlobalIds.assign(
        Tables.documents(spark, dir)
          .select(col("doc_id"),
            xxhash64(lit(seed), col("doc_id")).as("sort_key")),
        orderCol = col("sort_key"), tieCol = col("doc_id"),
        bucketBits = 6)
      .select(col("doc_id"), col("gid"))
      .orderBy(col("doc_id"))

  /** D22: count-min-sketch heavy hitters — the scale path for "most
    * frequent tokens" (vocab_top_words' exact twin shuffles the whole
    * token domain; this never does). The sketch nominates a top-20
    * candidate slate, then a join-back pass counts ONLY those ≤20
    * words exactly (broadcast semi-filter + partial agg — the wide
    * token-domain shuffle still never happens) and re-ranks by exact
    * frequency. CMS never undercounts and the exact top-10 always
    * survives nomination (OperatorsSpec pins both), so the output is
    * the exact top-10 — oracle-able even though a sketch drove it.
    */
  def vocabHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val occ = Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(TextFunctions.tokens(col("text"))).as(Seq("pos", "word")))
    // (doc_id, pos) is unique PER OCCURRENCE — required for the
    // nomination coin independence (see HeavyHitters.topK scaladoc)
    val candidates = graft.operators.HeavyHitters.topK(occ,
      struct(col("doc_id"), col("pos")), col("word"), 20)
    occ.join(broadcast(candidates.select(col("word"))), "word")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(10)
  }

  /** D21: deterministic mixture resampling — documents stratified by
    * predicted language, each stratum kept at its mixture weight via
    * the seeded-hash filter (reproducible, shuffle-free; see
    * [[graft.operators.Resample]]).
    */
  def mixtureResample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFunctions.langId(col("text")).as("pred_lang"))
    graft.operators.Resample.byStratum(docs, col("pred_lang"), col("doc_id"),
        Map("en" -> 0.5, "fr" -> 1.0, "de" -> 0.25, "es" -> 0.75),
        defaultFraction = 0.1)
      .orderBy(col("doc_id"))
  }

  /** D18: approximate length quantiles via the sketch aggregate
    * (`approx_percentile`) — the scale path for distribution stats: a
    * fixed-size sketch merges map-side, no global sort. Rows-only
    * (sketch internals are engine-specific); OperatorsSpec pins rank
    * error against a driver-side exact sort.
    */
  def textLengthQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)
    Tables.documents(spark, dir)
      .agg(percentile_approx(col("n_chars"),
        array(qs.map(lit): _*), lit(10000)).as("qv"))
      .select(posexplode(col("qv")).as(Seq("pos", "n_chars_q")))
      .select(element_at(array(qs.map(lit): _*), col("pos") + 1).as("q"),
        col("n_chars_q"))
      .orderBy(col("q"))
  }

  /** D23: incremental corpus admission — even doc ids play the
    * existing lake, odd ids the incoming batch (planted near-dup
    * pairs are id-adjacent, so cross-batch rejections are exercised
    * at every SF). Rows-only (LSH banding is engine-specific);
    * DedupSpec pins the admitted set against a driver-side exact
    * Jaccard + union-find reference.
    */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.admitIncremental(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "text", "doc_id", threshold = 0.8)
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Capstone: the full §2.D corpus-prep pipeline — quality gate,
    * exact + near dedup, decontamination vs an external eval set
    * (every 10th doc), mixture resample (all strata kept here so the
    * oracle-style invariants are deterministic), split, order key.
    * Rows-only; PipelineSpec pins the composed invariants (no
    * surviving near-dups, no eval leakage, disjoint splits,
    * run-to-run determinism).
    */
  def corpusPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
    // round 17: the D128 crawl stage runs FIRST — each doc carries its
    // messy crawl URL and the pipeline keeps one doc per canonical URL
    // before any content stage (see CorpusPipeline.Config.urlDedupCol)
    graft.pipeline.CorpusPipeline.run(
        docs.filter(col("doc_id") % 10 =!= 0)
          .select(col("doc_id"), col("text"), crawlUrl.as("url")),
        bench, "text", "doc_id",
        graft.pipeline.CorpusPipeline.Config(urlDedupCol = Some("url")))
      .select(col("doc_id"), col("lang"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** D72: pipeline survivorship audit — the data-ablation bookkeeping
    * a corpus card publishes: rows in/out/dropped at every stage of
    * the D30 capstone pipeline, same corpus/bench split and default
    * config as `corpus_pipeline` so the two keys cross-check.
    */
  def pipelineAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
    graft.pipeline.CorpusPipeline.audit(
        docs.filter(col("doc_id") % 10 =!= 0)
          .select(col("doc_id"), col("text"), crawlUrl.as("url")),
        bench, "text", "doc_id",
        graft.pipeline.CorpusPipeline.Config(urlDedupCol = Some("url")))
      .orderBy(col("stage_order"))
  }

  /** D25: deterministic train/val/test split — 90/5/5 by seeded id
    * hash; disjoint and complete by construction. Rows-only (hash
    * buckets are engine-specific); OperatorsSpec pins disjointness,
    * determinism, and fraction accuracy.
    */
  def trainSplit(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Resample.splitByHash(
        Tables.documents(spark, dir), col("doc_id"), Seq(0.9, 0.05, 0.05))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"))
      .orderBy(col("split"))

  /** D18 (exact face): discrete length quantiles, DuckDB-oracled. The
    * corpus first collapses to its length DOMAIN (`groupBy(n_chars)` —
    * thousands of rows at any corpus size), and only that tiny
    * aggregate flows through the cumulative window — scale-safe where
    * an unpartitioned window over raw rows is not. Quantile q is the
    * smallest length whose cumulative count reaches q·N: a
    * well-defined discrete quantile with an identical ANSI-SQL
    * formulation (both engines compare the integer cumulative count
    * against the same IEEE double q·N, so the boundary cannot
    * disagree). The sketch path ([[textLengthQuantiles]]) stays the
    * scale default; this is its exactness witness.
    */
  def textLengthQuantilesExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qs = Seq(0.25, 0.5, 0.75, 0.95, 0.99)
    val counts = Tables.documents(spark, dir)
      .groupBy(col("n_chars")).agg(count(lit(1)).as("cnt"))
    graft.operators.CumHistogram.cumulative(counts, "n_chars", "cnt")
      .crossJoin(broadcast(qs.toDF("q")))
      .filter(col("cum") >= col("q") * col("total"))
      .groupBy(col("q")).agg(min(col("n_chars")).as("len_q"))
      .orderBy(col("q"))
  }

  /** D18c: exact per-language length quantiles — the grouped face of
    * [[textLengthQuantilesExact]] via
    * [[graft.operators.CumHistogram.cumulativeByGroup]]: the chunking
    * / packing dials (D14/D28) are tuned per language, and a global
    * quantile hides that zh's character lengths live on a different
    * scale than en's.
    */
  def lengthQuantilesByLang(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qs = Seq(0.5, 0.9)
    val counts = Tables.documents(spark, dir)
      .groupBy(col("lang"), col("n_chars")).agg(count(lit(1)).as("cnt"))
    graft.operators.CumHistogram.cumulativeByGroup(
        counts, "lang", "n_chars", "cnt")
      .crossJoin(broadcast(qs.toDF("q")))
      .filter(col("cum") >= col("q") * col("total"))
      .groupBy(col("lang"), col("q")).agg(min(col("n_chars")).as("len_q"))
      .orderBy(col("lang"), col("q"))
  }

  /** E5 (batch face): click→purchase attribution — the same plan
    * [[graft.streaming.EventsStream.clickPurchaseJoin]] runs as a
    * stream-stream join; batch execution gives the DuckDB-oracled
    * twin (StreamingSpec asserts stream == batch).
    */
  def clickAttribution(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventsStream.clickPurchaseJoin(Tables.events(spark, dir))
      .orderBy(col("click_id"), col("purchase_id"))

  /** E5b batch face: left-outer attribution — every click, matched or
    * not (null purchase columns = abandonment).
    */
  def clickAttributionOuter(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventsStream
      .clickPurchaseJoinOuter(Tables.events(spark, dir))
      .orderBy(col("click_id"), col("purchase_id"))

  /** C8: gap sessionization of events (4h inactivity closes a
    * session), rolled up per session.
    */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame =
    Sessionize.sessions(Tables.events(spark, dir),
        col("user_id"), col("ts"), 4 * 3600L,
        Seq(col("ts"), col("event_id")))
      .orderBy(col("user_id"), col("session_id"))

  /** C8b: gap sessionization through Spark's native `session_window`
    * aggregate — the same 4-hour-gap semantics as [[eventsSessionize]]
    * expressed as a windowed GROUP BY instead of lag+cumsum, and the
    * formulation that runs unchanged as a Structured Streaming query
    * (session windows merge incrementally under a watermark). Window
    * end is exclusive: last event + gap. Boundary (spec-pinned): an
    * event at exactly prev + gap still merges — sessions split only
    * at diff > gap, matching the lag formulation.
    */
  def eventsSessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "4 hours").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))

  /** D59: k-anonymity release audit over quasi-identifiers — before a
    * corpus ships, count each document's equivalence class under the
    * attributes an adversary could link on (language, source, coarse
    * length bucket) and flag classes smaller than k=5: those rows are
    * re-identifiable by their metadata alone, independent of any
    * in-text PII (which D15's redaction handles). Two-phase shape
    * that matters at 100 TB: the class table is AGGREGATE-sized
    * (≤ |langs|·|sources|·|buckets| rows), so phase 1 is a
    * partial-combined count shuffle of that cardinality and phase 2
    * broadcasts it back as a map-only join — the naive window
    * formulation (COUNT(*) OVER (PARTITION BY qid)) would shuffle
    * the whole corpus instead. All integers — exact in any engine.
    */
  def kAnonymityAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        expr("n_chars DIV 100").as("len_bucket"))
    val classes = docs.groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("class_size"))
    docs.join(broadcast(classes), Seq("lang", "source", "len_bucket"))
      .withColumn("at_risk", col("class_size") < 5)
      .select(col("doc_id"), col("lang"), col("source"),
        col("len_bucket"), col("class_size"), col("at_risk"))
      .orderBy(col("doc_id"))
  }

  /** D88: HTML → text extraction — each doc rides a deterministic
    * page template (escaped body, a script with `<`/`>`/`&&` inside,
    * a style block, a comment, an entity-bearing footer — the traps
    * a naive tag stripper fails), then
    * [[graft.functions.TextFunctions.htmlToText]] recovers the text.
    * The media-decode pattern in text: generator-built container,
    * REAL extraction, oracle replays both sides.
    *
    * Shape at 100 TB: a pure codegen projection — zero exchanges
    * beyond the gate's determinism orderBy.
    */
  def htmlExtract(spark: SparkSession, dir: String): DataFrame = {
    val esc = org.apache.spark.sql.functions.replace(
      org.apache.spark.sql.functions.replace(
        org.apache.spark.sql.functions.replace(
          col("text"), lit("&"), lit("&amp;")),
        lit("<"), lit("&lt;")),
      lit(">"), lit("&gt;"))
    val page = concat(
      lit("<html><head><title></title>" +
        "<script type=\"text/javascript\">var x = 1 < 2 && 3 > 2;</script>" +
        "<style>p { color: red; }</style></head>" +
        "<body><!-- boilerplate --><p>"),
      esc,
      lit("</p><br/><div class=\"footer\">visit &amp; read</div></body></html>"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), page.as("html"))
      .select(col("doc_id"),
        length(col("html")).cast("long").as("n_chars_html"),
        graft.functions.TextFunctions.htmlToText(col("html")).as("extracted"))
      .orderBy(col("doc_id"))
  }

  /** D92: ROUGE-1/ROUGE-2 overlap on consecutive-id doc pairs (the
    * D4 pairing device: doc i as reference, doc i+1 as candidate) —
    * see [[graft.operators.Rouge]]. Both orders share the pair frame;
    * the two aggregate-grain results join back on the pair key.
    */
  def rougeOverlap(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val pairs = d.select(col("doc_id").as("id_a"), col("text").as("text_a"))
      .join(d.select(col("doc_id").as("id_b"), col("text").as("text_b")),
        col("id_b") === col("id_a") + 1)
    val r1 = graft.operators.Rouge.overlap(pairs, n = 1, prefix = "r1")
    val r2 = graft.operators.Rouge.overlap(pairs, n = 2, prefix = "r2")
    r1.join(r2, Seq("id_a", "id_b")).orderBy(col("id_a"))
  }

  /** D91: data-constrained epoch allocation — 1.5× the corpus's
    * unique token mass allocated across sources under the geometric
    * repeated-epoch decay (see [[graft.operators.EpochAlloc]]). The
    * budget question the other mixers don't answer: WHEN the budget
    * exceeds the unique data, which sources earn a second (third, …)
    * epoch and which stay at one.
    */
  def epochAllocation(spark: SparkSession, dir: String): DataFrame = {
    val masses = Tables.documents(spark, dir)
      .filter(col("source").isNotNull)
      .groupBy(col("source"))
      .agg(sum(graft.functions.TextFunctions.tokenCount(col("text"))
        .cast("long")).as("u"))
    graft.operators.EpochAlloc.allocate(masses)
  }

  /** D90: checksum-validated PII redaction — the upgrade over D15's
    * pattern-only pass: a bare `[0-9]{13,16}` redaction destroys
    * every clean order/reference id of card length, so real PII
    * pipelines VALIDATE candidates (Luhn mod-10) and redact only the
    * ones that could actually be card numbers. Each doc rides a
    * deterministic generator-built sentence carrying one card-shaped
    * candidate — Luhn-VALID for even doc ids (check digit solved from
    * the fold), broken by +5 for odd ids — plus a short digit run the
    * length window must ignore; the operator then extracts, validates
    * with [[graft.functions.TextFunctions.luhnValid]], and
    * replace-folds only the valid ones to `<CC>`.
    *
    * Shape at 100 TB: pure per-row codegen work — the extract +
    * validate + replace-fold runs as the single-pass
    * [[graft.functions.GraftKernels.luhnRedact]] kernel (the HOF
    * formulation was CodegenFallback and re-evaluated the candidate
    * array three times: size, filter, fold; the kernel is pinned
    * equivalent by OperatorsSpec's known-vector test and the DuckDB
    * oracle), zero exchanges — the D15 cost class with a
    * constant-factor checksum.
    */
  def textRedactLuhn(spark: SparkSession, dir: String): DataFrame = {
    val p15 = concat(lit("400000"),
      lpad(((col("doc_id") * 37 + 11) % 1000000000L).cast("string"), 9, "0"))
    // check digit d solves luhnSum(p15 || d) ≡ 0 (appending shifts
    // nothing: the new digit sits at odd position 1, undoubled)
    val t = graft.functions.GraftFunctions.luhn_sum(concat(p15, lit("0")))
    val dv = (lit(10) - (t % 10)) % 10
    val digit = when(col("doc_id") % 2 === 0, dv).otherwise((dv + 5) % 10)
    val emb = concat(substring(col("text"), 1, 30), lit(" card "),
      p15, digit.cast("string"), lit(" ref 12345 end"))
    val k = graft.functions.GraftFunctions.luhn_redact(emb)
    Tables.documents(spark, dir)
      .select(col("doc_id"), k.getField("n_candidates").as("n_candidates"),
        k.getField("n_valid").as("n_valid"),
        k.getField("redacted").as("redacted"))
      .orderBy(col("doc_id"))
  }

  /** D86: overlapping context-window chunking — the chunker every
    * RAG index and long-document training pipeline runs: fixed
    * `window`-token chunks at `stride`-token steps (stride < window
    * ⇒ overlap, so no boundary-straddling span is lost to retrieval
    * or attention). Deterministic chunk ids (start DIV stride), tail
    * chunks shorter; empty docs emit no chunks.
    *
    * Shape at 100 TB: pure per-row work — split, one generator
    * (sequence+explode over ceil(n/stride) starts), slice,
    * array_join, all built-ins inside whole-stage codegen around the
    * generator; ZERO exchanges (the orderBy is the gate's
    * determinism requirement, not part of the operator). Output
    * volume is the window/stride amplification (×4/3 at 128/96) —
    * the caller's dial, visible in the plan, not hidden in a UDF.
    */
  def chunkOverlap(spark: SparkSession, dir: String,
                   window: Int = 128, stride: Int = 96): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("tk"))
      .withColumn("n", size(col("tk")))
      .filter(col("n") > 0)
    docs
      .select(col("doc_id"), col("tk"), col("n"),
        explode(sequence(lit(0), col("n") - 1, lit(stride))).as("start"))
      .select(col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_id"),
        col("start").cast("long").as("start"),
        slice(col("tk"), col("start") + 1, lit(window)).as("ctk"))
      .select(col("doc_id"), col("chunk_id"), col("start"),
        size(col("ctk")).cast("long").as("n_tokens"),
        array_join(col("ctk"), " ").as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** D85: normalization-aware dedup map — exact byte hashing misses
    * documents that differ only by Unicode form (composed U+00E9 vs
    * decomposed e+U+0301), letter case, or whitespace runs; crawl
    * pipelines canonicalize BEFORE hashing (the CCNet/fineweb
    * normalize-then-dedup discipline). Emits the full doc →
    * canonical mapping: canonical = lowest doc_id sharing the
    * canonical form, `changed` marks docs the normalization
    * actually rewrote.
    *
    * Shape at 100 TB: the A7 pk-dedup shape — one groupBy on the
    * canonical string (map-side partial to one row per group) and
    * one join back; both exchanges key on the same column so AQE
    * reuses the partitioning. The normalization itself is the
    * codegen NFC kernel (ASCII fast path: zero allocation on the
    * overwhelmingly-ASCII crawl case). A corpus with adversarially
    * long normalized groups routes through xxhash64(norm) grouping
    * with exact verify, like D1.
    */
  def dedupUnicode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        graft.functions.TextFunctions.canonicalText(col("text")).as("norm"))
    val canon = docs.groupBy(col("norm"))
      .agg(min(col("doc_id")).as("canonical_id"))
    docs.join(canon, Seq("norm"))
      .select(col("doc_id"), col("canonical_id"),
        (col("doc_id") =!= col("canonical_id")).as("is_dup"),
        (col("text") =!= col("norm")).as("changed"))
      .orderBy(col("doc_id"))
  }

  /** D79: quality-signal agreement audit — the Pearson correlation
    * matrix between three independent curation signals (D14 composite
    * quality, D29 trigram dup-fraction, token count). The number a
    * curation dashboard needs before fusing signals (D71): highly
    * correlated signals add no evidence, anti-correlated ones fight.
    *
    * Shape at 100 TB: ONE partial-aggregated scan, no windows, no
    * joins. Signals lift to exact integer micro-units (the Doremi
    * idiom) so every sum is a decimal-exact integer independent of
    * partition order; the final Pearson arithmetic runs on doubles
    * whose integer inputs are exactly representable at gate scale and
    * correctly-rounded beyond it.
    */
  def signalCorrelation(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.SignalStats
    SignalStats.pearsonMatrix(SignalStats.sums(
      SignalStats.microSignals(Tables.documents(spark, dir), "text")))
  }

  /** D78: l-diversity release audit (Machanavajjhala et al. 2007) —
    * the homogeneity-attack check D59's k-anonymity misses: a class
    * can be large yet uniform in a sensitive attribute, and then
    * linking a person to the class reveals the attribute anyway. Per
    * quasi-identifier class (source, length bucket) count the DISTINCT
    * sensitive values (language here) and flag classes below l=2.
    *
    * Shape at 100 TB: two partial-aggregated shuffles — corpus →
    * (QI, sensitive) cells, cells → classes — so the exchanges carry
    * cell/class cardinalities, never documents; the second stage's
    * COUNT(rows) over cells IS the distinct-sensitive count without a
    * distinct shuffle. All integers, exact in any engine.
    */
  def lDiversityAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("source"), expr("n_chars DIV 100").as("len_bucket"),
        col("lang"))
    docs.groupBy(col("source"), col("len_bucket"), col("lang"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("source"), col("len_bucket"))
      .agg(sum(col("__n")).as("class_size"),
        count(lit(1)).as("n_sensitive"))
      .withColumn("l_diverse", col("n_sensitive") >= 2)
      .orderBy(col("source"), col("len_bucket"))
  }

  /** D93: t-closeness audit — the skewness-attack check k-anonymity
    * (D84) and l-diversity (D78) cannot see: classes = (lang, source)
    * quasi-identifiers, ordered sensitive attribute = length bucket
    * (n_chars DIV 200), distance = ordered EMD vs the corpus-wide
    * distribution, exact integer core. See
    * [[graft.operators.TCloseness]].
    */
  def tClosenessAudit(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TCloseness.orderedEmdAudit(
        Tables.documents(spark, dir), Seq("lang", "source"),
        expr("n_chars DIV 200"), threshold = 0.2)
      .orderBy(col("lang"), col("source"))

  /** D100: cross-source quantile normalization of the D14 quality
    * score — after the map, a fixed quality threshold means the same
    * thing in every source (per-source raters sit on different
    * scales). 2-dp score buckets, all-integer cross-multiplied
    * mapping. See [[graft.operators.QuantileNorm]].
    */
  def qualityQuantileNorm(spark: SparkSession, dir: String): DataFrame = {
    val bucket = floor(TextFunctions.qualityScore(col("text")) * 100.0)
      .cast("long")
    graft.operators.QuantileNorm.mappingTable(
        Tables.documents(spark, dir), col("source"), bucket)
      .select(col("source"), col("bucket"), col("n"), col("src_cum"),
        col("norm_bucket"))
      .orderBy(col("source"), col("bucket"))
  }

  /** D99: Flesch readability scoring (Flesch 1948 / Kincaid 1975 —
    * the curation heuristic between "too simple to train on" and
    * "unreadable junk"): words via the established whitespace split,
    * sentences = terminal-punctuation count (floored at 1), syllables
    * = vowel-group count (the standard dictionary-free heuristic).
    * All three are exact integers off codegen regex counters — no
    * explode, no shuffle; the two scores are one IEEE evaluation
    * each.
    */
  def readabilityScores(spark: SparkSession, dir: String): DataFrame = {
    val words = size(split(trim(col("text")), "\\s+")).cast("long")
    val sents = greatest(regexp_count(col("text"), lit("[.!?]")), lit(1))
      .cast("long")
    val syls = regexp_count(lower(col("text")), lit("[aeiouy]+"))
      .cast("long")
    val wps = words.cast("double") / sents.cast("double")
    val spw = syls.cast("double") / words.cast("double")
    Tables.documents(spark, dir)
      .select(col("doc_id"), words.as("n_words"), sents.as("n_sentences"),
        syls.as("n_syllables"),
        round(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw, 6)
          .as("flesch"),
        round(lit(0.39) * wps + lit(11.8) * spw - lit(15.59), 6)
          .as("fk_grade"))
      .orderBy(col("doc_id"))
  }

  /** D98: source-concentration audit — Gini, HHI and top-share of
    * the per-source document distribution: the release-card number
    * that says HOW skewed the training mix is (the premise behind
    * every D20/D69 reweighting decision). See
    * [[graft.operators.Concentration]].
    */
  def sourceConcentration(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Concentration.giniHhi(
      Tables.documents(spark, dir), col("source"))

  /** D96: calibration curve of the D14 quality score against the D41
    * Gopher verdict — per decile bin of the score, mean predicted vs
    * empirical keep rate (the reliability diagram behind every ECE
    * number). All-integer core: the score travels as the micro-unit
    * qm, bins are qm DIV 100000 clamped to 9, per-bin sums exact;
    * mean/frac/gap are one divide each. One scan, one bin-sized
    * shuffle.
    */
  /** The shared decile-binned (quality, Gopher-keep) frame behind D96
    * and D113 — one partial-agg'd scan to ≤ 10 rows.
    */
  private def calibrationBins(spark: SparkSession, dir: String): DataFrame = {
    val qm = round(TextFunctions.qualityScore(col("text")) * 1000000.0)
      .cast("long")
    val stops = array(Seq("the", "a", "of", "to", "and").map(lit): _*)
    val ws = split(trim(col("text")), "\\s+")
    val nWords = size(ws)
    val meanLen = length(regexp_replace(trim(col("text")), "\\s+", ""))
      .cast("double") / nWords.cast("double")
    val alphaFrac = size(filter(ws, w => w.rlike("[a-z]")))
      .cast("double") / nWords.cast("double")
    val stopHits = size(filter(ws, w => array_contains(stops, w)))
    val gopherKeep = nWords.between(40, 100000) &&
      meanLen.between(3.0, 5.0) && alphaFrac >= 0.8 && stopHits >= 1
    Tables.documents(spark, dir)
      .select(least(floor(qm / lit(100000.0)), lit(9.0)).cast("long")
          .as("bin"),
        qm.as("__qm"),
        when(gopherKeep, 1L).otherwise(0L).as("__pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__qm")).as("__sq"), sum(col("__pos")).as("__np"))
  }

  def qualityCalibration(spark: SparkSession, dir: String): DataFrame = {
    calibrationBins(spark, dir)
      .select(col("bin"), col("n"),
        round(col("__sq").cast("double") / col("n").cast("double")
          / 1000000.0, 6).as("mean_pred"),
        round(col("__np").cast("double") / col("n").cast("double"), 6)
          .as("frac_pos"),
        round(col("__sq").cast("double") / col("n").cast("double")
          / 1000000.0
          - col("__np").cast("double") / col("n").cast("double"), 6)
          .as("gap"))
      .orderBy(col("bin"))
  }

  /** D113: isotonic calibration of the D96 curve — the least-squares
    * MONOTONE P(keep | quality-decile) via the minimax closed form
    * (≡ pool-adjacent-violators), over the same shared bin frame.
    * See [[graft.operators.Isotonic]].
    */
  def qualityIsotonic(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Isotonic.fit(calibrationBins(spark, dir),
      col("bin"), col("n"), col("__np"))

  /** D97: mutual information between the corpus's lang and source
    * metadata — the dependence audit behind stratified-split design
    * (a high-MI pair means "per-source splits leak language
    * balance"). See [[graft.operators.AbStats.mutualInformation]].
    */
  def langSourceMi(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.mutualInformation(
      Tables.documents(spark, dir), col("lang"), col("source"))

  /** D127: Hill tail index over document token lengths (k = 100) —
    * the size-distribution heavy-tail diagnostic (see
    * [[graft.operators.Concentration.hillTailIndex]]).
    */
  def hillTailIndex(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Concentration.hillTailIndex(
      Tables.documents(spark, dir),
      size(graft.operators.LanguageModel.toks(col("text"))), k = 100)

  /** D126: PII density per source — the corpus-card compliance row.
    * The synthetic corpus carries no PII, so the face EMBEDS
    * deterministic markers (the D84b luhn-face precedent: the
    * MACHINERY is what's audited): every doc_id ≡ 0 (mod 3) gains an
    * email, every doc_id ≡ 0 (mod 5) a 7-digit run (see
    * [[graft.operators.PiiAudit.densityByGroup]]).
    */
  def piiDensityBySource(spark: SparkSession, dir: String): DataFrame =
    graft.operators.PiiAudit.densityByGroup(
      Tables.documents(spark, dir), col("source"),
      graft.operators.PiiAudit.syntheticMarkers(col("doc_id"),
        col("text")))

  /** D125: code-switching audit — half-doc language IDs and the
    * spliced-document flag (see
    * [[graft.operators.LanguageModel.codeSwitchAudit]]).
    */
  def codeSwitchAudit(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LanguageModel.codeSwitchAudit(
      Tables.documents(spark, dir), "doc_id", "text")

  /** D124: RAKE keyphrase extraction — top-30 stopword-delimited
    * phrases by deg/freq word scores (see
    * [[graft.operators.Collocations.rakeKeywords]]).
    */
  def rakeKeywords(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Collocations.rakeKeywords(
      Tables.documents(spark, dir), "doc_id", "text", k = 30)

  /** D123: word burstiness — top-30 Fano factors among words with
    * corpus frequency ≥ 50 (see
    * [[graft.operators.LanguageModel.wordBurstiness]]).
    */
  def wordBurstiness(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LanguageModel.wordBurstiness(
      Tables.documents(spark, dir), "doc_id", "text",
      minFreq = 50L, k = 30)

  /** D121: self-BLEU-2 corpus-diversity audit per language — pairwise
    * BLEU between doc_id-DIV-2 paired documents (see
    * [[graft.operators.Bleu.selfBleu]]).
    */
  def selfBleu(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Bleu.selfBleu(
      Tables.documents(spark, dir), "doc_id", "lang", "text")

  /** C103: Cramér's V on the SAME lang × source contingency D97's MI
    * reads — the 0..1 effect size next to the bit count (see
    * [[graft.operators.AbStats.cramersV]]).
    */
  def langSourceCramersV(spark: SparkSession, dir: String): DataFrame =
    graft.operators.AbStats.cramersV(
      Tables.documents(spark, dir), col("lang"), col("source"))

  /** D95: byte-entropy filter — the compressibility proxy cut:
    * boilerplate sits low, random junk sits high, prose lands in a
    * mid band. Per-row codegen kernel
    * ([[graft.functions.ByteEntropy]]) — one scan, zero shuffle
    * besides the presentation sort; the flag compares the
    * 6-dp-rounded entropy so both engines cut identically.
    */
  def charEntropyFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        round(graft.functions.ByteEntropy.byte_entropy(col("text")), 6)
          .as("entropy"))
      .withColumn("keep", col("entropy").between(2.0, 6.0))
      .orderBy(col("doc_id"))

  /** D94: Cohen's kappa between the pipeline's two automated quality
    * raters — the D14 composite score at the 0.5 cut (thresholded on
    * the MICRO-unit integer, the bootstrap-oracle convention, so no
    * double boundary can diverge) vs the D41 Gopher rule verdict.
    * Raw agreement po overstates consistency when both raters
    * mostly-keep; κ discounts the chance floor. One scan, zero data
    * shuffle. See [[graft.operators.AbStats.cohenKappa]].
    */
  def raterAgreementKappa(spark: SparkSession, dir: String): DataFrame = {
    val qm = round(TextFunctions.qualityScore(col("text")) * 1000000.0)
      .cast("long")
    val stops = array(Seq("the", "a", "of", "to", "and").map(lit): _*)
    val ws = split(trim(col("text")), "\\s+")
    val nWords = size(ws)
    val meanLen = length(regexp_replace(trim(col("text")), "\\s+", ""))
      .cast("double") / nWords.cast("double")
    val alphaFrac = size(filter(ws, w => w.rlike("[a-z]")))
      .cast("double") / nWords.cast("double")
    val stopHits = size(filter(ws, w => array_contains(stops, w)))
    val gopherKeep = nWords.between(40, 100000) &&
      meanLen.between(3.0, 5.0) && alphaFrac >= 0.8 && stopHits >= 1
    graft.operators.AbStats.cohenKappa(
      Tables.documents(spark, dir), qm >= 500000L, gopherKeep)
  }

  /** D68: differentially-private release of the per-(lang, source)
    * document histogram — the Laplace mechanism with ε = 1 and the
    * deterministic keyed-hash draw of
    * [[graft.operators.DpRelease.noisyCounts]]. Complements the D59
    * k-anonymity audit: that decides what may ship, this noises what
    * does.
    */
  def dpNoisyCounts(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DpRelease.noisyCounts(
      Tables.documents(spark, dir), Seq("lang", "source"), epsilon = 1.0)
      .orderBy(col("lang"), col("source"))

  /** D69: DoReMi-style domain reweighting — the D37 unigram
    * cross-entropy as the frozen loss snapshot, sources as mixture
    * domains, 10 exponentiated-gradient rounds with uniform
    * smoothing. See [[graft.operators.Doremi]].
    */
  def doremiMix(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Doremi, LanguageModel}
    val docs = Tables.documents(spark, dir)
    val lm = LanguageModel.train(docs, "text", topK = 64)
    val scored = docs.select(col("source"),
      LanguageModel.crossEntropy(col("text"), lm).as("ce"))
    Doremi.domainWeights(scored, "source", "ce",
        eta = 0.1, smoothing = 0.01, rounds = 10)
      .orderBy(col("domain"))
  }

  /** D71: multi-signal quality fusion — the per-language curation
    * shortlist fused from three independent quality signals (D14
    * composite score, D37 LM cross-entropy, D29 trigram repetition)
    * by reciprocal-rank fusion, the D59 retrieval recipe turned on
    * quality legs. A doc must rank well on SEVERAL signals to
    * surface; one noisy signal can't admit garbage (FineWeb-style
    * signal ensembling).
    *
    * Scale shape: each leg is the `row_number ≤ k` idiom, which the
    * injected TopKRewrite rule executes as a bounded heap — the
    * corpus is scanned, never per-language SORTED; everything after
    * the legs operates on ≤ 3·k·|langs| rows.
    */
  def qualityFusion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.LanguageModel
    val docs = Tables.documents(spark, dir)
    val lm = LanguageModel.train(docs, "text", topK = 64)
    // one LEAN scan per signal, each its own codegen pipeline feeding
    // its own heap leg — a single wide scored projection (quality +
    // LM fold + shingle dup-frac together) falls out of whole-stage
    // codegen on materialization and runs ~80× slower (measured 24 s
    // vs 0.3 s/leg at sf0.1); three independent scans of a
    // columnar source are also the shape that parallelizes at 100 TB
    def leg(signal: org.apache.spark.sql.Column, asc: Boolean,
            name: String): DataFrame = {
      val s = docs.select(col("lang"), col("doc_id"), signal.as("__s"))
      val ord = if (asc) Seq(col("__s").asc, col("doc_id"))
                else Seq(col("__s").desc, col("doc_id"))
      val w = Window.partitionBy(col("lang")).orderBy(ord: _*)
      s.select(col("lang"), col("doc_id"), row_number().over(w).as(name))
        .filter(col(name) <= 100)
    }
    val tgc = col("__tg")
    // the codegen shingle kernel, not the HOF formulation — ~10× the
    // throughput on the materialization path. Boundary semantics:
    // trigrams of the FULLY-whitespace-trimmed text (no phantom empty
    // tokens at tab/newline edges); the oracle tokenizes the same way
    val repDoc = docs
      .select(col("lang"), col("doc_id"),
        graft.functions.ShingleFunctions.word_shingles(col("text"), 3)
          .as("__tg"))
      .select(col("lang"), col("doc_id"),
        when(size(tgc) === 0, 0.0)
          .otherwise((size(tgc) - size(array_distinct(tgc)))
            .cast("double") / size(tgc).cast("double")).as("__s"))
    val lq = leg(TextFunctions.qualityScore(col("text")), asc = false, "rq")
    val lc = leg(LanguageModel.crossEntropy(col("text"), lm), asc = true, "rc")
    val wr = Window.partitionBy(col("lang"))
      .orderBy(col("__s").asc, col("doc_id"))
    val lr = repDoc
      .select(col("lang"), col("doc_id"), row_number().over(wr).as("rr"))
      .filter(col("rr") <= 100)
    val fusedCol =
      coalesce(lit(1.0) / (lit(60.0) + col("rq")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(60.0) + col("rc")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(60.0) + col("rr")), lit(0.0))
    val fused = lq
      .join(lc, Seq("lang", "doc_id"), "full_outer")
      .join(lr, Seq("lang", "doc_id"), "full_outer")
      .withColumn("fused", round(fusedCol, 9))
    val wf = Window.partitionBy(col("lang"))
      .orderBy(col("fused").desc, col("doc_id"))
    fused.withColumn("rk", row_number().over(wf))
      .filter(col("rk") <= 20)
      .select(col("lang"), col("doc_id"), col("rq"), col("rc"),
        col("rr"), col("fused"), col("rk"))
      .orderBy(col("lang"), col("rk"))
  }

  /** D57: containment near-dup pairs — the asymmetric partial-copy
    * detector (short doc pasted into a long one) Jaccard misses. See
    * [[graft.operators.Dedup.containmentJoinEdges]].
    */
  def dedupContainment(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentJoinEdges(Tables.documents(spark, dir), "text", "doc_id")
      .orderBy(col("id_a"), col("id_b"))

  /** D56: fastText-style curated-vs-crawl quality classifier — train
    * the closed-form naive-Bayes log-odds model with source `src0` as
    * the curated reference class, score every doc's margin. See
    * [[graft.operators.QualityClassifier]] for the model and the
    * zero-shuffle scoring shape.
    */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame =
    graft.operators.QualityClassifier.scoreCorpus(
      Tables.documents(spark, dir), "text", "doc_id",
      col("source") === "src0")
      .orderBy(col("doc_id"))

  /** D55: retrieval chunking — tile each document into fixed-width
    * 64-char windows with 16-char overlap (stride 48), the unit every
    * embedding/RAG pipeline feeds its encoder. The LangChain-style
    * tiling rule: starts at k·stride for k = 0..⌈(n−W)/S⌉, so a doc
    * no longer than one window yields exactly one chunk and the LAST
    * chunk is the first that covers the tail (no dribble of tiny tail
    * chunks). ZERO shuffle — `sequence`+`explode` and `substring` are
    * pure codegen projections, so at 100 TB this is a map-only pass
    * whose output partitioning inherits the scan's; the downstream
    * encoder join key (doc_id, chunk_id) is emitted here.
    * Token-aware chunking composes by running D34's tokenizer on
    * `chunk_text`. The chunk count is computed in integer arithmetic
    * ((max(0, n−W) + S−1) DIV S) — exact in any engine.
    */
  def docChunking(spark: SparkSession, dir: String): DataFrame = {
    val W = 64; val S = 48
    Tables.documents(spark, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          expr(s"CAST((greatest(length(text) - $W, 0) + ${S - 1}) DIV $S AS INT)")))
          .as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * S).as("chunk_start"),
        expr(s"substring(text, chunk_id * $S + 1, $W)").as("chunk_text"))
      .withColumn("chunk_len", length(col("chunk_text")))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** E1 (batch face): tumbling 1-hour windowed aggregation — the same
    * plan Structured Streaming runs incrementally (see
    * graft.streaming.EventsStream).
    */
  def eventsWindowedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Num.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** D111: top PMI collocations over the corpus — min pair count 5,
    * top 50 by (pmi DESC, v, w). See
    * [[graft.operators.Collocations.topPmi]] for the distributed
    * full-vocabulary shape (this is NOT the broadcastable D37b table).
    */
  def pmiCollocations(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Collocations.topPmi(
      Tables.documents(spark, dir), "text", minCount = 5L, k = 50)

  /** D116: TextRank keywords — integer PageRank over the word
    * co-occurrence graph, top 30 (see
    * [[graft.operators.Collocations.keywordTextRank]]).
    */
  def keywordTextrank(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Collocations.keywordTextRank(
      Tables.documents(spark, dir), "text", iterations = 10, k = 30)

  /** D117: per-doc top-3 keywords by smoothed TF-IDF — the frequency
    * twin of D116's TextRank (see
    * [[graft.operators.Collocations.keywordTfidf]]).
    */
  def keywordTfidf(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Collocations.keywordTfidf(
      Tables.documents(spark, dir), "doc_id", "text", k = 3)

  /** D118: per-doc lexical diversity — TTR, hapax fraction, Yule's K
    * (see [[graft.operators.LanguageModel.lexicalDiversity]]).
    */
  def lexicalDiversity(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LanguageModel.lexicalDiversity(
      Tables.documents(spark, dir), "doc_id", "text")

  /** D119: per-source Jensen–Shannon divergence from the corpus
    * unigram distribution (see
    * [[graft.operators.Drift.jsSourceDivergence]]).
    */
  def sourceJsDivergence(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Drift.jsSourceDivergence(
      Tables.documents(spark, dir), col("source"), col("text"))

  /** D115: per-source duplicated-paragraph mass — what fraction of
    * each source's paragraphs is corpus-wide boilerplate, BEFORE any
    * removal runs (see
    * [[graft.operators.ParagraphDedup.dupMassByGroup]]).
    */
  def dupMassBySource(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ParagraphDedup.dupMassByGroup(
        Tables.documents(spark, dir), col("text"), col("doc_id"),
        col("source"))
      .withColumnRenamed("grp", "source")

  /** D114: Good–Turing unseen mass + Chao1 vocabulary richness over
    * the corpus — how much of the type distribution is still unseen
    * (see [[graft.operators.LanguageModel.goodTuringVocab]]).
    */
  def goodTuringVocab(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LanguageModel.goodTuringVocab(
      Tables.documents(spark, dir), "text")

  /** D112: effective sample size / design effect of the D9
    * quality-score weighting, per source — how many docs each
    * source's weighted mass is really worth (see
    * [[graft.operators.Concentration.effectiveSampleSize]]).
    * Weights bridge to micro-unit integers off the already-bit-exact
    * quality double, so the sums are exact.
    */
  def weightedEss(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Concentration.effectiveSampleSize(
        Tables.documents(spark, dir).select(col("source"),
          graft.functions.TextFunctions.qualityScore(col("text"))
            .as("quality")),
        col("source"), col("quality"))
      .withColumnRenamed("grp", "source")
      .orderBy(col("source"))

  /** D128: URL canonicalization + URL-level dedup — the crawl stage
    * that runs BEFORE content dedup (D1): two spellings of one
    * resource (host case, default port, fragment, `utm_*` trackers,
    * percent-encoding variants) must collapse to one canonical key,
    * then ONE representative survives per key — keep-best = highest
    * `n_chars`, ties to the smallest `doc_id` (the D17c keep-best
    * rule). Kernel: [[graft.functions.UrlKernels.canonicalize]]
    * (RFC 3986 §6.2.2 syntax normalization, codegen).
    *
    * The documents table carries no URL column, so the face derives a
    * deterministic messy URL per doc: every 3 consecutive doc_ids
    * spell the SAME resource three different ways (upper-case
    * host + `:443` + fragment / unreserved escape `%77`→`w` +
    * `utm_source` / bare port colon + `%5f`→`_` + `utm_medium`), and
    * every variant carries `q=a%2fb` whose reserved escape must
    * normalize to `%2F` without decoding. The oracle re-derives the
    * same URLs and canonicalizes them with an INDEPENDENT SQL
    * implementation (regexp split + per-token list transform).
    *
    * Scale shape: canonicalize is a narrow projection fused into the
    * scan; keep-best is ONE partial-aggregable groupBy (max of a
    * (n_chars, −doc_id) struct — no window, no second shuffle).
    */
  /** The deterministic messy crawl URL shared by D128's face and the
    * D30 pipeline wiring (see [[urlDedup]] for the variant scheme:
    * every 3 consecutive doc_ids spell ONE resource three ways).
    */
  private[graft] def crawlUrl: Column = {
    val g = floor(col("doc_id") / 3).cast("long")
    val gs = (g % 20).cast("string")
    val gstr = g.cast("string")
    val host = concat(lit("src"), gs, lit(".example.com"))
    val v = (col("doc_id") % 3).cast("int")
    when(v === 0, concat(
        lit("HTTPS://SRC"), gs, lit(".Example.COM:443/wiki/Page_"), gstr,
        lit("?id="), gstr, lit("&q=a%2fb#top")))
      .when(v === 1, concat(
        lit("https://"), host, lit("/%77iki/Page_"), gstr,
        lit("?id="), gstr, lit("&utm_source=feed&q=a%2fb")))
      .otherwise(concat(
        lit("https://"), host, lit(":/wiki/Page%5f"), gstr,
        lit("?id="), gstr, lit("&q=a%2fb&utm_medium=email")))
  }

  def urlDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        graft.functions.UrlFunctions.canonical_url(crawlUrl).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(max(struct(col("n_chars"), (lit(0L) - col("doc_id")).as("neg"),
          col("doc_id"))).as("best"),
        count(lit(1)).cast("long").as("n_dups"))
      .select(col("canonical_url"), col("best.doc_id").as("doc_id"),
        col("best.n_chars").as("n_chars"), col("n_dups"))
      .orderBy(col("canonical_url"))

  /** D129: mojibake repair — [[graft.functions.EncodingRepair]]'s
    * explicit-table fix for UTF-8-decoded-as-windows-1252 damage
    * ("Ã©"→"é", "â€™"→"’"), the ftfy-class pass D13's normalize
    * cannot perform. The corpus text is clean ASCII, so the face
    * makes the damage itself: each doc gets one of
    * [[EncodingRepair.phrases]] appended in TRUE mojibake form (the
    * phrase's UTF-8 bytes re-decoded through WHATWG windows-1252 at
    * plan-build time — a constant, not a runtime corruption chain),
    * runs the repair kernel, and checks the repair restored the
    * clean phrase byte-exactly. The oracle replays the identical
    * replace chain rendered from the same table
    * ([[EncodingRepair.repairSql]]) — the table is the spec, and
    * UrlEncodingSpec pins the classic ladder cases by hand.
    *
    * Scale shape: a pure per-row string projection (builtin
    * `replace` chain, whole-stage codegen) — no shuffle, no state.
    */
  def textFixEncoding(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.EncodingRepair
    val nPhrases = EncodingRepair.phrases.size
    val idx = (col("doc_id") % nPhrases + 1).cast("int")
    val cleanPhrase = element_at(
      array(EncodingRepair.phrases.map(lit): _*), idx)
    val dirtyPhrase = element_at(
      array(EncodingRepair.phrases.map(p =>
        lit(EncodingRepair.mojibake(p))): _*), idx)
    val dirty = concat(substring(col("text"), 1, 40), lit(" "), dirtyPhrase)
    val clean = concat(substring(col("text"), 1, 40), lit(" "), cleanPhrase)
    Tables.documents(spark, dir)
      .select(col("doc_id"), dirty.as("dirty"), clean.as("clean"))
      .select(col("doc_id"), col("clean"),
        EncodingRepair.repair(col("dirty")).as("repaired"),
        length(col("dirty")).as("len_dirty"))
      .select(col("doc_id"), col("repaired"),
        (col("repaired") <=> col("clean")).as("repaired_ok"),
        (col("len_dirty") - length(col("repaired"))).cast("long")
          .as("n_shrunk"))
      .orderBy(col("doc_id"))
  }
}
