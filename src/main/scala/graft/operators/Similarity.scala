package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, VectorFunctions}

/** Similarity search over embedding columns (SURVEY §2.D6-D7).
  *
  * Brute force is the correctness baseline: broadcast the (small) query
  * set against the corpus — a map-side join, the corpus is streamed
  * once, top-k kept per query via ranked window on (query, score).
  *
  * The scale path buckets both sides with random-hyperplane LSH
  * ([[VectorFunctions.hyperplaneBucket]]): candidates only within a
  * bucket (equality shuffle join), probing neighbor buckets is a
  * recall/cost dial. At 100 TB: corpus bucketed once at write time
  * (bucketed table), queries hashed at read — no corpus shuffle at all.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * @param queries (qid, qvec) — must be broadcast-small
    * @param corpus  (id, vec)
    */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries), col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        GraftFunctions.vec_cosine(col("qvec"), col("vec")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
  }

  /** D87: hard-negative mining for contrastive retrieval training —
    * per query, the top-`k` most-similar corpus vectors whose cosine
    * stays BELOW `maxCos`: near-misses, the negatives that actually
    * teach a bi-encoder (random negatives are trivially separable;
    * anything ≥ `maxCos` is treated as a positive/near-dup and must
    * not be trained against). Same scan/broadcast shape as
    * [[bruteForceKnn]]: the corpus is scanned once, queries ride a
    * broadcast, the rank window is per-query (bounded by the heap
    * rewrite); at scale the scored leg swaps for an IVF/PQ candidate
    * stream with the identical filter+rank tail.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, k: Int,
                    maxCos: Double): DataFrame = {
    val scored = corpus.join(broadcast(queries), col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        GraftFunctions.vec_cosine(col("qvec"), col("vec")).as("cos"))
      .filter(col("cos") < maxCos)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
  }

  /** D89: semantic decontamination — per corpus vector, the max
    * cosine against ANY benchmark/eval vector plus the responsible
    * bench id, flagged at `tau`. The embedding-space companion of the
    * token-8-gram screen (D19) and the char-window screen (D74):
    * paraphrased eval items share no lexical n-gram but sit right on
    * top of the original in embedding space — exactly what SemDeDup
    * (D38) exploits for dedup, pointed at the eval boundary instead.
    *
    * Plan shape is the BM25/one-row-broadcast discipline, NOT the
    * knn window: eval suites are small by construction (the D19
    * broadcast argument), so the whole bench collapses to ONE row
    * holding a bid-sorted array of (bid, vec) structs, cross-joined
    * (broadcast) onto the corpus scan; per corpus row a left fold over
    * that array keeps the best (cos, bid). ZERO shuffle — a map-only
    * scan at any corpus size (the groupBy(id)-over-exploded-matches
    * alternative would shuffle one row per corpus vector for nothing).
    * Fold order is bid-ascending with strict-> keep, so ties resolve
    * to the LOWEST bench id — the same pick as `row_number() OVER
    * (ORDER BY cos DESC, bid)`, which is how the oracle states it.
    * Cosines are the [[graft.functions.GraftFunctions.vec_cosine]]
    * index-order IEEE fold — bit-exact cross-engine (the D6 proof),
    * so the `tau` cut cannot diverge on a ulp. At a truly large bench
    * swap the literal array for the IVF candidate stream (D7) with
    * the identical filter+argmax tail.
    */
  def semanticContamination(corpus: DataFrame, bench: DataFrame,
                            tau: Double): DataFrame = {
    val benchRow = bench
      .agg(sort_array(collect_list(struct(col("qid").as("bid"),
        col("qvec").as("bvec")))).as("__bench"))
    val scored = transform(col("__bench"), b =>
      struct(GraftFunctions.vec_cosine(col("vec"), b.getField("bvec")).as("c"),
        b.getField("bid").as("i")))
    val best = aggregate(scored,
      struct(lit(-2.0).as("c"), lit(-1L).as("i")),
      (acc, s) => when(s.getField("c") > acc.getField("c"), s).otherwise(acc))
    corpus.crossJoin(broadcast(benchRow))
      .select(col("id"), best.as("__best"))
      .select(col("id"),
        col("__best").getField("i").as("bench_id"),
        col("__best").getField("c").as("max_cos"))
      .withColumn("contaminated", col("max_cos") >= lit(tau))
  }

  /** All ≤`probeBits`-bit flip masks over `planes` sign bits — the
    * multi-probe neighborhood (Σ C(planes,b) buckets). Enumerated by
    * combinations so it stays cheap even for wide signatures.
    */
  private[graft] def probeMasks(planes: Int, probeBits: Int): Seq[Long] =
    (0 to probeBits).flatMap(b =>
      (0 until planes).combinations(b)
        .map(_.foldLeft(0L)((acc, i) => acc | (1L << i))).toSeq)

  /** Expand each row to its home bucket plus every ≤`probeBits`-bit
    * flip neighbor.
    */
  private def probeExpand(df: DataFrame, planes: Int, probeBits: Int): DataFrame = {
    val flips = array(probeMasks(planes, probeBits).map(lit): _*)
    df.withColumn("__flip", explode(flips))
      .withColumn("bucket", col("bucket").bitwiseXOR(col("__flip")))
      .drop("__flip")
  }

  /** Approximate top-k: candidates restricted to the query's LSH
    * bucket. Lower `planes` → bigger buckets → higher recall & cost;
    * `probeBits` > 0 additionally probes every bucket within that
    * Hamming distance of the query's signature — the classic
    * multi-probe recall dial that costs probe volume, never a second
    * corpus pass or shuffle (only the broadcast-small query side
    * expands).
    */
  def lshKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             planes: Int = 8, probeBits: Int = 0): DataFrame = {
    val qb0 = queries.withColumn("bucket",
      GraftFunctions.hyperplane_bucket(col("qvec"), planes))
    // a corpus row lives in exactly one home bucket and query probes are
    // distinct buckets, so each (qid, id) candidate appears at most once
    val qb = if (probeBits > 0) probeExpand(qb0, planes, probeBits) else qb0
    val cb = corpus.withColumn("bucket",
      GraftFunctions.hyperplane_bucket(col("vec"), planes))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        GraftFunctions.vec_cosine(col("qvec"), col("vec")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
  }

  /** Candidate pairs for [[cosineNearDup]]: ids only. Both sides carry
    * (bucket, id) — 16-byte rows, never the vectors — and the left side
    * probes its home bucket plus every 1-bit-flip neighbor, so a pair
    * becomes a candidate iff their sign signatures differ in ≤ 1 of
    * `planes` bits. Each qualifying pair meets exactly once (ham=0 via
    * the shared home bucket; ham=1 via the unique differing bit on the
    * lower id's side), so no dedup pass is needed.
    *
    * Expected candidate volume under uniform buckets is
    * (planes+1)·N²/2^planes — N²/28 at planes=8, and every extra plane
    * halves it again. planes=2 (the round-1/2 defect) was N²/4·3:
    * effectively all-pairs.
    */
  def cosineNearDupCandidates(corpus: DataFrame, planes: Int): DataFrame = {
    val b = corpus.select(col("id"),
      GraftFunctions.hyperplane_bucket(col("vec"), planes).as("bucket"))
    val l = probeExpand(b, planes, 1).select(col("bucket"), col("id").as("id_a"))
    val r = b.select(col("bucket"), col("id").as("id_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
  }

  /** D5: embedding-cosine near-duplicate pairs above `threshold`.
    * Candidates from [[cosineNearDupCandidates]] (light bucket join),
    * vectors joined back by id only for the surviving pairs — the same
    * light-shuffle shape as MinHash-LSH band verification.
    */
  def cosineNearDup(corpus: DataFrame, threshold: Double,
                    planes: Int = 8): DataFrame =
    cosineNearDupCandidates(corpus, planes)
      .join(corpus.select(col("id").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(corpus.select(col("id").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        GraftFunctions.vec_cosine(col("vec_a"), col("vec_b")).as("cos"))
      .filter(col("cos") >= threshold)
}
