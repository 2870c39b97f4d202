package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Similarity search over the embeddings table (SURVEY §2.D5-D7).
  *
  * Scores are left-to-right double folds over float inputs — fully
  * deterministic, and because float→double widening is exact and IEEE
  * +,*,/,sqrt are correctly rounded, any engine that mirrors the fold
  * order reproduces the same 64 bits. The exact paths
  * ([[annBruteForce]], [[annQuantized]]) are DuckDB-oracled
  * bit-for-bit (`list_reduce` mirrors the fold), and so is
  * [[annLsh]]: the hyperplane signs are bit0 of the public xxhash64
  * chain — deterministic constants, embedded in the oracle SQL — so
  * bucketing, candidates, and scores all reproduce. [[annIvf]] is
  * oracled too, via `SparkEntry.dynamicOracleSql`: the session's
  * trained centroids are embedded as float literals at Verify time,
  * and assignment/probe/score are all index-order IEEE folds DuckDB
  * mirrors bit-for-bit (SimilaritySpec additionally pins a scala
  * reference).
  */
object VectorQueries {

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  private def queries(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  /** D6: exact cosine top-10 per query vector. */
  def annBruteForce(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceKnn(queries(spark, dir), corpus(spark, dir), 10)
      .orderBy(col("qid"), col("rk"))

  /** D7: LSH-bucketed approximate top-10 (4 hyperplanes → 16 buckets,
    * sized so buckets stay populated at the smallest test SF).
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshKnn(queries(spark, dir), corpus(spark, dir), 10, planes = 4)
      .orderBy(col("qid"), col("rk"))

  /** D7b: IVF approximate top-10 — coarse k-means quantizer (16
    * lists, trained deterministically on a capped sample of the
    * corpus, cached per lake dir), queries probe their 2 nearest
    * lists.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val centroids = graft.operators.IvfIndex.trainCached(
      s"embeddings:$dir", c, "vec", "id", k = 16, dim = 64)
    graft.operators.IvfIndex.search(queries(spark, dir), c, 10, centroids, nprobe = 2)
      .orderBy(col("qid"), col("rk"))
  }

  /** D7c: product-quantized ANN — 8 subspace codebooks (16 codes
    * each: 8 code bytes per vector, 32× smaller than float32 at
    * rest), ADC candidate pool from codes alone, exact cosine
    * re-rank of the pool (see [[graft.operators.PqIndex]]).
    */
  def annPq(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val cb = graft.operators.PqIndex.trainCached(
      s"embeddings-pq:$dir", c, "vec", "id", dim = 64)
    val codes = graft.operators.PqIndex.encode(c, "vec", cb)
      .select(col("id"), col("codes"))
    graft.operators.PqIndex.searchAdc(queries(spark, dir), codes, 10, cb,
        refineWith = Some(c))
      .orderBy(col("qid"), col("rk"))
  }

  /** D7d: the full composed IVF-PQ index — 16 coarse lists for probe
    * pruning, 8×16 residual codebooks for 32×-lighter list scans, ADC
    * pool from codes alone, exact-cosine re-rank
    * (see [[graft.operators.IvfPq]]). Oracled via the Verify-time
    * trained-state embedding like `ann_ivf_topk`/`ann_pq_topk`.
    */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val idx = graft.operators.IvfPq.trainCached(
      s"embeddings-ivfpq:$dir", c, "vec", "id", k = 16, dim = 64)
    val codes = graft.operators.IvfPq.encode(c, "vec", "id", idx)
    graft.operators.IvfPq.search(queries(spark, dir), codes, 10, idx,
        refineWith = c, nprobe = 2)
      .orderBy(col("qid"), col("rk"))
  }

  /** D24: the int8-quantized storage path end-to-end — corpus vectors
    * quantized ([[graft.functions.VectorFunctions.quantize8]], 4×
    * smaller at rest), dequantized on read, searched exactly.
    * DuckDB-oracled bit-for-bit (the whole round-trip is IEEE
    * correctly-rounded ops in both engines); SimilaritySpec pins
    * reconstruction error and top-k agreement with the float path.
    */
  def annQuantized(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.{dequantize8, maxAbs, quantize8}
    val qCorpus = corpus(spark, dir)
      .withColumn("__scale", maxAbs(col("vec")) / 127.0) // shared, once per row
      .select(col("id"),
        dequantize8(quantize8(col("vec"), col("__scale"))).as("vec"))
    Similarity.bruteForceKnn(queries(spark, dir), qCorpus, 10)
      .orderBy(col("qid"), col("rk"))
  }

  /** D7e: ANN self-audit — recall@10 of every approximate path against
    * the exact brute force, AS a gate query: the quality/IO trade
    * every index family makes is itself measured, oracled, and
    * hash-checked each round (50 = 5 queries × k=10 ground-truth
    * pairs; hits are exact set intersections, so the only arithmetic
    * is one int/const division).
    */
  def annRecallReport(spark: SparkSession, dir: String): DataFrame = {
    val bf = annBruteForce(spark, dir).select(col("qid"), col("id"))
    def leg(name: String, df: DataFrame): DataFrame =
      df.select(col("qid"), col("id"))
        .join(bf, Seq("qid", "id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(lit(name).as("method"), col("hits"),
          (col("hits").cast("double") / 50.0).as("recall_at_10"))
    leg("ivf", annIvf(spark, dir))
      .unionAll(leg("ivfpq", annIvfPq(spark, dir)))
      .unionAll(leg("lsh", annLsh(spark, dir)))
      .unionAll(leg("pq", annPq(spark, dir)))
      .orderBy(col("method"))
  }

  /** D76: Matryoshka truncation audit (Kusupati et al. 2022 — MRL
    * embeddings concentrate signal in the prefix dims, so serving can
    * scan d'=16 of 64 dims: 4× less vector IO/memory). Two legs,
    * measured against the exact full-dim top-10: `trunc16` = top-10 by
    * prefix-dim cosine alone; `trunc16_refine` = the real serving
    * pattern, a 4×k prefix-dim shortlist re-ranked with full vectors
    * (full dims are read for only `pool` candidates per query, not the
    * corpus). Like D7e, the quality/IO trade is itself a gate query —
    * oracled and hash-checked — not an assertion. Note the synthetic
    * embeddings are NOT MRL-trained, so `trunc16` recall here is the
    * pessimistic floor; the refine leg shows the pattern recovers
    * exactness when the shortlist covers the true top-k.
    */
  def annMatryoshka(spark: SparkSession, dir: String): DataFrame = {
    val d = 16; val pool = 40; val k = 10
    val full = corpus(spark, dir)
    val q = queries(spark, dir)
    val tCorpus = full.select(col("id"), slice(col("vec"), 1, d).as("vec"))
    val tQueries = q.select(col("qid"), slice(col("qvec"), 1, d).as("qvec"))
    // ONE prefix-dim scan: the trunc leg is the shortlist's rk <= k
    // prefix (bruteForceKnn already carries rk)
    val shortlistRk = Similarity.bruteForceKnn(tQueries, tCorpus, pool)
      .select(col("qid"), col("id"), col("rk"))
    val trunc = shortlistRk.filter(col("rk") <= k)
      .select(col("qid"), col("id"))
    val shortlist = shortlistRk.select(col("qid"), col("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    val refined = shortlist
      .join(full, Seq("id"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("id"),
        graft.functions.GraftFunctions.vec_cosine(col("qvec"), col("vec")).as("cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"))
    val bf = annBruteForce(spark, dir).select(col("qid"), col("id"))
    def leg(name: String, df: DataFrame): DataFrame =
      df.join(bf, Seq("qid", "id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .select(lit(name).as("method"), col("hits"),
          (col("hits").cast("double") / 50.0).as("recall_at_10"))
    leg("trunc16", trunc)
      .unionAll(leg("trunc16_refine", refined))
      .orderBy(col("method"))
  }

  /** D38: SemDeDup semantic deduplication — cluster with the SAME
    * coarse codebook as `ann_ivf_topk` (cache key shared, so Verify
    * trains once), connect within-cluster pairs at cosine ≥ 0.35 (the
    * observed tail of this synthetic corpus — real re-phrasings sit
    * at 0.9+), keep the least-typical member per group
    * (see [[graft.operators.SemDedup]]). Oracled via the Verify-time
    * centroid embedding + recursive-CTE closure.
    */
  def dedupSemantic(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val centroids = graft.operators.IvfIndex.trainCached(
      s"embeddings:$dir", c, "vec", "id", k = 16, dim = 64)
    graft.operators.SemDedup.semDedup(c, "vec", "id", centroids, threshold = 0.35)
      .orderBy(col("id"))
  }

  /** D5: embedding-cosine near-dup pairs at 8 hyperplanes with 1-bit
    * multi-probe (candidate volume ~N²/28, shrinking 2× per extra
    * plane — the planes=2 all-pairs posture was the round-1/2 defect).
    * The testdata has no planted embedding dups (max pairwise cosine
    * ≈ 0.51), so the threshold sits in the observed tail to keep the
    * output non-degenerate; at a real 0.9+ near-dup threshold the
    * probe recall is far higher (bucket-collision probability rises
    * steeply with cosine).
    */
  def dedupEmbeddingCosine(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDup(corpus(spark, dir), threshold = 0.35, planes = 8)
      .orderBy(col("id_a"), col("id_b"))

  /** D51: whitened PCA projection of the embedding corpus onto its
    * top 4 principal axes (see [[graft.operators.Pca]]) — scalar
    * component faces for the gate; the library face returns the full
    * array. Basis trained once per lake dir on the deterministic
    * sample, shared with the Verify-time oracle embedding.
    */
  def pcaProject(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val model = graft.operators.Pca.trainCached(
      s"embeddings-pca:$dir", c, "vec", "id", dim = 64, components = 4)
    c.select(col("id") +:
        model.basis.indices.map(j => graft.operators.Pca
          .component(col("vec"), model, j, whiten = true)
          .as(s"pc${j + 1}")): _*)
      .orderBy(col("id"))
  }

  /** D58: embedding-corpus QA audit — the sanity pass every
    * embedding pipeline runs before indexing: per-vector dimension
    * (ragged rows break every downstream kernel), exact-zero
    * component count (dead dimensions / failed encoder batches),
    * L2 norm, component range, and a degenerate flag (norm ≈ 0
    * vectors poison cosine — they score 0 against everything and
    * silently vanish from top-k). ZERO shuffle: every column is a
    * per-row fold in whole-stage codegen, so at 100 TB this is a
    * map-only scan; feed the flag to a filter before index build.
    * All values are bit-exact cross-engine: integer counts, an
    * index-ordered IEEE fold for the norm, and exact float min/max
    * selection — no rounding needed.
    */
  /** D64: cluster-balanced subsample — the diversity-balanced data
    * selection real curation pipelines run between dedup and mixing:
    * assign every embedding to its coarse k-means cluster (the SAME
    * cached codebook as `ann_ivf_topk`, so Verify trains once) and
    * water-fill a fixed budget as uniformly across clusters as
    * availability allows ([[graft.operators.Resample
    * .waterFillByStratum]], D49's exact integer fold). Topic-sized
    * clusters stop a corpus dominated by one content mode from
    * producing a sample dominated by it — the embedding-space
    * analogue of D49's per-source uniformity. Assignment is a
    * zero-shuffle codegen kernel; the quota walk never sorts a full
    * cluster.
    */
  def clusterBalancedSample(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val cents = graft.operators.IvfIndex.trainCached(
      s"embeddings:$dir", c, "vec", "id", k = 16, dim = 64)
    val assigned = graft.operators.IvfIndex.assign(c, "vec", cents)
      .select(col("id"), col("cid"))
    graft.operators.Resample.waterFillByStratum(
        assigned, col("cid"), col("id"), budget = 200)
      .orderBy(col("id"))
  }

  /** D66: retrieval ranking-quality report — MRR@10 and nDCG@10 of
    * every approximate ANN path against the exact brute-force top-10,
    * as a gate query (the ranking-quality sibling of D7e's recall
    * audit: recall says WHETHER the true neighbors surface, nDCG says
    * WHERE — an index that returns them in positions 6-10 scores the
    * same recall and half the nDCG). All inputs are the bounded leg
    * frames (5 queries × ≤10 ranks); every metric is an EXPLICIT
    * left fold over rank- and qid-sorted arrays (`sort_array` +
    * `aggregate`), so the double-add order — and the one `ln` per
    * term, per the BM25 parity precedent — replays identically in
    * the oracle; 6-dp round on the means.
    */
  def retrievalQualityReport(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    val bf = annBruteForce(spark, dir).select(col("qid"), col("id"))
    val qids = bf.select(col("qid")).distinct()
    def log2(x: Column): Column = log(x) / log(lit(2.0))
    val idcg: Column = aggregate(sequence(lit(1), lit(10)), lit(0.0),
      (acc, i) => acc + lit(1.0) / log2(i.cast("double") + lit(1.0)))
    def leg(name: String, df: DataFrame): DataFrame = {
      val hits = df.select(col("qid"), col("id"), col("rk"))
        .join(bf.withColumn("__h", lit(1)), Seq("qid", "id"), "left")
        .select(col("qid"), col("rk"),
          coalesce(col("__h"), lit(0)).cast("double").as("h"))
      val perQ = hits.groupBy(col("qid"))
        .agg(sort_array(collect_list(struct(col("rk"), col("h")))).as("a"))
        .select(col("qid"),
          aggregate(col("a"), lit(0.0), (acc, e) =>
            acc + e.getField("h") /
              log2(e.getField("rk").cast("double") + lit(1.0))).as("dcg"),
          { val f = filter(col("a"), e => e.getField("h") === 1.0)
            when(size(f) > 0,
                lit(1.0) / element_at(f, 1).getField("rk").cast("double"))
              .otherwise(lit(0.0)).as("rr") })
      qids.join(perQ, Seq("qid"), "left")
        .select(col("qid"),
          coalesce(col("dcg"), lit(0.0)).as("dcg"),
          coalesce(col("rr"), lit(0.0)).as("rr"))
        .agg(sort_array(collect_list(struct(col("qid"), col("dcg"),
          col("rr")))).as("a"))
        .select(lit(name).as("method"),
          round(aggregate(col("a"), lit(0.0),
            (acc, e) => acc + e.getField("rr")) / lit(5.0), 6)
            .as("mrr_at_10"),
          round(aggregate(col("a"), lit(0.0),
            (acc, e) => acc + e.getField("dcg") / idcg) / lit(5.0), 6)
            .as("ndcg_at_10"))
    }
    leg("ivf", annIvf(spark, dir))
      .unionAll(leg("ivfpq", annIvfPq(spark, dir)))
      .unionAll(leg("lsh", annLsh(spark, dir)))
      .unionAll(leg("pq", annPq(spark, dir)))
      .orderBy(col("method"))
  }

  /** D65: semantic drift between corpus snapshots — D52's PSI gate in
    * EMBEDDING space: assign both snapshots to the shared coarse
    * codebook and compare the per-cluster occupancy distributions.
    * Where `corpus_drift` answers "did the source/language mix
    * move?", this answers "did the CONTENT move?" — a new crawl can
    * keep its source mix while its topics shift entirely, and the
    * cluster histogram is the cheapest detector (assignment is a
    * zero-shuffle codegen kernel; PSI touches only the ≤k-row count
    * aggregates, `Drift.psiFromCounts`' bit-stable tree). Snapshots
    * derive by id parity here, mirrored in the oracle.
    */
  def semanticDrift(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val cents = graft.operators.IvfIndex.trainCached(
      s"embeddings:$dir", c, "vec", "id", k = 16, dim = 64)
    val asg = graft.operators.IvfIndex.assign(c, "vec", cents)
      .select(col("id"), col("cid"))
    graft.operators.Drift.psi(
        asg.filter(col("id") % 2 === 0),
        asg.filter(col("id") % 2 === 1), col("cid"))
      .orderBy(col("bucket"))
  }

  /** D61: MMR diversified retrieval — the redundancy-aware re-rank
    * after a relevance leg (see [[graft.operators.MmrRetrieval]]).
    * Query vector 0, pool = exact-cosine top-50, k = 10, λ = 0.5; at
    * corpus scale the pool leg swaps for IVF/PQ unchanged. The
    * unrolled-CTE oracle replays the greedy argmax chain step for
    * step on the same IEEE folds.
    */
  def mmrDiversified(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    graft.operators.MmrRetrieval
      .diversifyBruteForce(spark, q, corpus(spark, dir), k = 10,
        lambda = 0.5, poolSize = 50)
      .orderBy(col("rk"))
  }

  /** D87: hard negatives for the standard 5-query sample — top-10
    * below the 0.35 near-dup line (the same τ the D5 near-dup family
    * treats as "same content"; anything above it is a positive, not
    * a negative).
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame =
    Similarity.hardNegatives(queries(spark, dir), corpus(spark, dir),
        k = 10, maxCos = 0.35)
      .orderBy(col("qid"), col("rk"))

  /** D89: semantic decontamination — the corpus screened against the
    * 1%-slice eval bench (vec_id ≡ 0 mod 100) at the near-dup line
    * τ = 0.35 (the same threshold [[dedupEmbeddingCosine]] treats as
    * duplicate — anything that close to an eval item is contamination
    * whether or not a single n-gram survives the paraphrase). See
    * [[graft.operators.Similarity.semanticContamination]].
    */
  def decontaminationSemantic(spark: SparkSession, dir: String): DataFrame = {
    val all = Tables.embeddings(spark, dir)
    val bench = all.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corp = all.filter(col("vec_id") % 100 =!= 0)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.semanticContamination(corp, bench, tau = 0.35)
      .orderBy(col("id"))
  }

  /** D107: clustering-quality audit — per-cluster simplified
    * silhouette over the SAME session-trained IVF codebook the ANN
    * keys probe (medoid variant: a = distance to own centroid, b =
    * distance to the nearest OTHER centroid, s = (b−a)/max(a,b) —
    * the linear-time silhouette every large-scale clustering report
    * uses, since the exact pairwise form is O(n²) by definition).
    * A cluster whose mean s collapses toward 0 is overlapping its
    * neighbor — the signal that the codebook needs retraining before
    * IVF recall degrades.
    *
    * Scale shape: the 16 per-centroid distance folds are pure
    * per-row column algebra (no explode, no shuffle — the centroid
    * matrix is a plan literal), argmin/second-min read off one
    * 16-element `array_sort`, and the only exchange is the
    * aggregate-sized groupBy(cid). Determinism: index-order fold +
    * IEEE sqrt/divide per row, micro-unit integer sums across rows
    * (see [[graft.functions.Num]] — a double sum across a cluster
    * would be shuffle-order dependent).
    */
  def clusterSilhouette(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val cents = graft.operators.IvfIndex.trainCached(
      s"embeddings:$dir", c, "vec", "id", k = 16, dim = 64)
    val distStructs = cents.zipWithIndex.map { case (cv, j) =>
      val cl = array(cv.map(v => lit(v.toDouble)): _*)
      struct(
        sqrt(aggregate(
          zip_with(col("vec"), cl,
            (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (acc, v) => acc + v)).as("dst"),
        lit(j).as("cid"))
    }
    val sorted = array_sort(array(distStructs: _*))
    val a = element_at(sorted, 1).getField("dst")
    val own = element_at(sorted, 1).getField("cid")
    val b = element_at(sorted, 2).getField("dst")
    val sRaw = when(b === 0.0, lit(0.0)).otherwise((b - a) / b)
    c.select(own.as("cid"),
        round(sRaw * 1000000.0).cast("long").as("__micro"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_points"), sum(col("__micro")).as("__sm"))
      .select(col("cid"), col("n_points"),
        round(col("__sm").cast("double") / col("n_points").cast("double")
          / 1000000.0, 6).as("mean_silhouette"))
      .orderBy(col("cid"))
  }

  /** D122: JL random-projection distortion audit — 64 → 16 dims with
    * the deterministic Rademacher sign matrix; how well do pairwise
    * distances survive? (see
    * [[graft.operators.RandomProjection.distortionAudit]]).
    */
  def jlProjectionAudit(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RandomProjection.distortionAudit(
      Tables.embeddings(spark, dir), "vec_id", "embedding", d = 64, k = 16)

  def embeddingAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(col("vec_id"),
        size(col("embedding")).as("dim"),
        size(filter(col("embedding"), x => x === lit(0f))).as("n_zeros"),
        graft.functions.VectorFunctions.norm(col("embedding")).as("l2_norm"),
        array_min(col("embedding")).as("min_c"),
        array_max(col("embedding")).as("max_c"))
      .withColumn("is_degenerate", col("l2_norm") < 1e-6)
      .orderBy(col("vec_id"))
}
