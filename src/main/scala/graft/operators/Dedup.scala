package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication family (SURVEY §2.D1-D5): exact, MinHash+LSH, SimHash,
  * n-gram Jaccard.
  *
  * Scale posture: every variant is a constant number of shuffles,
  * independent of corpus size. Candidate generation always happens
  * through equality buckets (hash groups, LSH band buckets, SimHash
  * bands) so the expensive pairwise verification only runs inside
  * buckets — never a cross join. Skewed buckets (boilerplate shingles)
  * are handled by AQE skew-join splitting.
  */
object Dedup {

  /** D1: exact dedup via content digest. Group on SHA-256 of the
    * content (not the raw text) — at 100 TB the shuffle carries 32-byte
    * digests + ids, not documents. Keeps the lowest id as canonical.
    */
  def exact(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(sha2(text, 256).as("digest"))
      .agg(min(id).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: k minima over the shingle set, computed by the
    * native kernel expression [[graft.functions.MinHashSig]] — one
    * string hash per shingle, k derived permutations in a tight loop
    * (the composable HOF formulation cost 33s at sf0.1; this is <1s).
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    graft.functions.GraftFunctions.minhash_sig(shingles, k)

  /** D2: MinHash LSH candidate pairs. Signature of k = bands×rows
    * minima; documents sharing any band hash become candidates; pairs
    * are then verified with exact shingle Jaccard ≥ `threshold`.
    *
    * Plan shape, sized for 100 TB: the band self-join shuffles ONLY
    * (id, band, bandhash) — 24 bytes/row — never the shingle arrays;
    * surviving candidate pairs (tiny by construction) join back to the
    * id→shingles map twice to verify. Equality joins throughout, no
    * cross join; AQE splits skewed buckets (boilerplate shingles).
    *
    * @param df    input with (idCol, textCol)
    * @return (id_a, id_b, jaccard) with id_a < id_b
    */
  /** (id, band, bandhash) light rows from an (id, sh) shingle frame —
    * the 24-byte unit every LSH exchange here carries.
    */
  private def mhBandRows(withSh: DataFrame, bands: Int, rows: Int): DataFrame =
    bandRowsFromSig(
      withSh.withColumn("sig", minhashSignature(col("sh"), bands * rows)),
      bands, rows)

  /** Band rows from a frame that already carries the k=bands·rows
    * signature, so callers needing the signature for something else
    * too (b-bit compression) never hash twice.
    */
  private def bandRowsFromSig(sigged: DataFrame, bands: Int, rows: Int): DataFrame =
    sigged
      .select(col("id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(slice(col("sig"), b * lit(rows) + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandhash")

  /** The PRE-verify banded candidate pairs — exposed for the D108
    * self-audit (`dedup_recall_report`): banding recall/precision can
    * only be measured on the candidates themselves, not the verified
    * output (which is exact by construction).
    */
  def lshCandidates(df: DataFrame, textCol: String, idCol: String,
                    shingleSize: Int = 3, bands: Int = 8,
                    rows: Int = 4): DataFrame =
    candidatePairs(mhBandRows(shingleFrame(df, textCol, idCol, shingleSize),
      bands, rows))

  def minhashLsh(df: DataFrame, textCol: String, idCol: String,
                 shingleSize: Int = 3, bands: Int = 8, rows: Int = 4,
                 threshold: Double = 0.5): DataFrame = {
    // NOTE (r18, measured): the lazy composition re-evaluates the
    // shingle explode and the k-permutation minhash per consumer
    // (~5 evaluations across the band self-join and the verify
    // attaches). Staging withSh/banded behind eager cuts was tried
    // and REJECTED — the extra materialization jobs cost more than
    // the recompute at sf0.1 (0.87–0.95× across the LSH keys), and a
    // lazy .cache() is barred because CacheManager would match the
    // identical plan across bench passes (cross-run reuse). Recompute
    // wins locally; revisit only with a cluster-scale harness.
    val withSh = shingleFrame(df, textCol, idCol, shingleSize)
    minhashLshFromShingles(withSh, mhBandRows(withSh, bands, rows), threshold)
  }

  /** (id, sh) frame: each doc's distinct word shingles (empty-shingle
    * docs dropped — they can never near-dup).
    */
  private def shingleFrame(df: DataFrame, textCol: String, idCol: String,
                           shingleSize: Int): DataFrame =
    df.select(
        col(idCol).as("id"),
        graft.functions.ShingleFunctions.word_shingles(col(textCol), shingleSize)
          .as("sh"))
      .filter(size(col("sh")) > 0)

  /** LSH core over pre-computed shingles + band rows, so callers that
    * already hold both (incremental admission) never shingle twice.
    */
  private def minhashLshFromShingles(withSh: DataFrame, banded: DataFrame,
                                     threshold: Double): DataFrame =
    verifyPairs(candidatePairs(banded), withSh, threshold)

  /** Distinct (id_a < id_b) candidate pairs from band rows — the one
    * LSH self-join, shared by the exact-verify and b-bit paths so the
    * completeness argument covers both by construction.
    */
  private def candidatePairs(banded: DataFrame): DataFrame =
    banded.select(col("band"), col("bandhash"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bandhash"), col("id").as("id_b")),
        Seq("band", "bandhash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()

  /** Exact-verify join: shingle sets back in (id-partitioned, once per
    * side), emit pairs at jaccard ≥ threshold.
    */
  private def verifyPairs(cand: DataFrame, withSh: DataFrame,
                          threshold: Double): DataFrame =
    cand
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        TextFunctions.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  /** D75: b-bit minhash side-by-side audit (Li & König 2010). The SAME
    * k=bands·rows signature that feeds the LSH bands compresses to its
    * low b bits per lane, packed to k·b bits per document (16 bytes at
    * k=32,b=4 — 16× smaller than the raw 64-bit signature); Jaccard is
    * then ESTIMATED from the fraction P of agreeing lanes with the
    * Li–König collision correction Ĵ = (P − C)/(1 − C), C = 2^-b.
    *
    * At 100 TB the estimator replaces the exact-verify join — the one
    * step of D2 that ships shingle sets across the cluster; the
    * candidate join carries two 8-byte words per side instead. This
    * audit query runs BOTH paths over the same LSH candidates and
    * emits exact vs estimate per true pair plus the estimator's keep
    * decision, so the recall/precision trade of switching is measured
    * on the corpus, not asserted from the paper's variance formula.
    *
    * @return (id_a, id_b, jaccard, jaccard_bbit, kept_bbit) for pairs
    *         with exact jaccard ≥ threshold
    */
  def bbitMinhashAudit(df: DataFrame, textCol: String, idCol: String,
                       shingleSize: Int = 3, bands: Int = 8, rows: Int = 4,
                       b: Int = 4, threshold: Double = 0.5): DataFrame = {
    val (withSh, cand, est) =
      bbitCore(df, textCol, idCol, shingleSize, bands, rows, b)
    verifyPairs(cand, withSh, threshold)
      .join(est, Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"), col("jaccard"), col("jaccard_bbit"),
        (col("jaccard_bbit") >= lit(threshold)).as("kept_bbit"))
  }

  /** The PRODUCTION b-bit path: LSH candidates kept by the estimator
    * alone — after banding, the only per-pair payload is the packed
    * k·b-bit signature (two 8-byte words at k=32/b=4); shingle sets
    * never leave their partitions. This is what replaces
    * [[minhashLsh]] at 100 TB; [[bbitMinhashAudit]] measures what the
    * swap trades.
    *
    * @return (id_a, id_b, jaccard_bbit) with estimate ≥ threshold
    */
  def bbitMinhashPairs(df: DataFrame, textCol: String, idCol: String,
                       shingleSize: Int = 3, bands: Int = 8, rows: Int = 4,
                       b: Int = 4, threshold: Double = 0.5): DataFrame = {
    val (_, _, est) = bbitCore(df, textCol, idCol, shingleSize, bands, rows, b)
    est.filter(col("jaccard_bbit") >= lit(threshold))
  }

  /** Shared b-bit machinery: shingle frame, LSH candidate pairs off
    * the k=bands·rows signature, and the per-candidate Li–König
    * estimate frame (id_a, id_b, jaccard_bbit).
    */
  private def bbitCore(df: DataFrame, textCol: String, idCol: String,
                       shingleSize: Int, bands: Int, rows: Int,
                       b: Int): (DataFrame, DataFrame, DataFrame) = {
    val k = bands * rows
    // b < 64: compressing to the full word is no compression, and
    // 1L << 64 silently wraps to 1 making C = 1 (division by zero in
    // the correction)
    require(b < 64 && 64 % b == 0 && k % (64 / b) == 0,
      s"b=$b must divide 64 (and be < 64) and k=$k must fill whole packed words")
    val withSh = shingleFrame(df, textCol, idCol, shingleSize)
    val sigged = withSh.withColumn("sig", minhashSignature(col("sh"), k))
    val packed = sigged.select(col("id"),
      graft.functions.GraftFunctions.bbit_pack(col("sig"), b).as("pk"))
    val cand = candidatePairs(bandRowsFromSig(sigged, bands, rows))
    val c = 1.0 / (1L << b)
    val est = cand
      .join(packed.select(col("id").as("id_a"), col("pk").as("pk_a")), Seq("id_a"))
      .join(packed.select(col("id").as("id_b"), col("pk").as("pk_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        ((graft.functions.GraftFunctions.bbit_matches(col("pk_a"), col("pk_b"), b)
          .cast("double") / lit(k.toDouble) - lit(c)) / lit(1.0 - c))
          .as("jaccard_bbit"))
    (withSh, cand, est)
  }

  /** D83: ICWS weighted-Jaccard audit (Ioffe 2010) — the tf-weighted
    * upgrade over D2/D4's SET semantics: a doc repeating "the the the"
    * and one saying it once are identical sets but different
    * multisets; weighted Jaccard Σmin(tf)/Σmax(tf) sees the
    * difference, and ICWS samples estimate it with
    * P(agree) = J_w exactly. Like D4, pairs are the deterministic
    * consecutive-id pairing, so the audit reads estimate vs exact
    * side by side per pair with no LSH plumbing in the way.
    *
    * Scale shape: signatures are k longs computed in one kernel scan
    * (one string hash per distinct token; all draws derive by
    * splitmix); the exact leg's exchange carries (id, token, tf)
    * rows. Agreement is a bounded 32-lane fold.
    */
  def weightedJaccardAudit(df: DataFrame, textCol: String, idCol: String,
                           k: Int = 32): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      split(trim(col(textCol)), "\\s+").as("tk"))
    val sigs = base.select(col("id"),
      graft.functions.GraftFunctions.weighted_minhash_sig(col("tk"), k)
        .as("sig"))
    val est = sigs.as("a")
      .join(sigs.as("b"), col("a.id") + 1 === col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (aggregate(
          zip_with(col("a.sig"), col("b.sig"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(k.toDouble))
          .as("jw_icws"))
    val cnt = base
      .select(col("id"), explode(col("tk")).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("w"))
    val ca = cnt.select(col("id").as("id_a"), col("tok"), col("w").as("wa"))
    val cb = cnt.select((col("id") - 1).as("id_a"), col("tok"),
      col("w").as("wb"))
    val exact = ca.join(cb, Seq("id_a", "tok"), "full_outer")
      .groupBy(col("id_a"))
      .agg(
        sum(least(coalesce(col("wa"), lit(0L)), coalesce(col("wb"), lit(0L))))
          .as("mins"),
        sum(greatest(coalesce(col("wa"), lit(0L)), coalesce(col("wb"), lit(0L))))
          .as("maxs"))
      .select(col("id_a"),
        (col("mins").cast("double") / col("maxs").cast("double"))
          .as("jw_exact"))
    est.join(exact, Seq("id_a"))
      .select(col("id_a"), col("id_b"), col("jw_exact"), col("jw_icws"))
  }

  /** SimHash (64-bit): per element hash, each bit votes ±1; the sign of
    * the vote sum forms the fingerprint bit. Native kernel expression
    * ([[graft.functions.SimHash64]], bit-identical to the HOF
    * formulation it replaced — same xxhash64 seed — but a tight loop:
    * 41s → <1s at sf0.1).
    */
  def simhash(elems: Column): Column =
    graft.functions.GraftFunctions.simhash64(elems)

  /** D3: SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    * Precondition: `idCol` is unique per row (run [[exact]] dedup
    * first if the ingest may repeat ids) — exactly-once pair emission
    * is per distinct id pair, duplicate id rows would emit duplicate
    * pair rows.
    * Votes are cast by DISTINCT trigram shingles (not token
    * occurrences): multiset voting lets a length difference between
    * near-identical docs flip many near-tied bits, while the shingle
    * set mirrors the Jaccard ground truth.
    *
    * Candidates via `bands` buckets of 64/bands bits; pigeonhole: any
    * pair with distance < bands shares at least one band. Defaults
    * (8 bands × 8 bits, h ≤ 7) suit medium corpora — at billions of
    * docs, 8-bit buckets collide quadratically, so widen to 16-bit
    * bands (4×16, h ≤ 3) and/or multi-probe instead.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 7, bands: Int = 8): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    require(maxHamming < bands, s"pigeonhole needs maxHamming < bands")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val withSig = df.select(col(idCol).as("id"),
      simhash(array_distinct(
        graft.functions.ShingleFunctions.word_shingles(col(textCol), 3))).as("sig"))
    val banded = withSig.select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
          call_function("shiftright", col("sig"), b * width).bitwiseAND(mask))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandkey")
    val l = banded.select(col("band"), col("bandkey"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bandkey"), col("id").as("id_b"), col("sig").as("sig_b"))
    val joined = l.join(r, Seq("band", "bandkey"))
      .filter(col("id_a") < col("id_b"))
    // a pair colliding in several bands would come out once per band;
    // both signatures are in hand, so emit it only from the EARLIEST
    // colliding band — exactly-once by construction, no distinct
    // (which was a full extra shuffle of the candidate set)
    val xorSig = col("sig_a").bitwiseXOR(col("sig_b"))
    val collides = array((0 until bands).map(b =>
      when(call_function("shiftright", xorSig, lit(b * width))
        .bitwiseAND(mask) === 0, 1).otherwise(0)): _*)
    joined
      .filter(col("band") === array_position(collides, 1) - 1)
      .select(col("id_a"), col("id_b"),
        bit_count(xorSig).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact all-pairs similarity join via inverted shingle index (the
    * prefix-filtering family): group the exploded shingles into
    * posting lists, emit the within-list pairs, count shared per pair,
    * Jaccard from the known set sizes.
    *
    * One shuffle builds the index (vs the naive two-sided self-join's
    * two), and postings of length 1 — the overwhelming majority on
    * natural text — are dropped before any pair is formed. Posting
    * lists are keyed by xxhash64 of the shingle, so the exchange
    * carries 8-byte keys, never the strings (a 64-bit collision would
    * off-by-one a shared-shingle count; at ~2⁻⁶⁴ per shingle pair
    * that is far below any realistic threshold sensitivity).
    * Candidate volume is Σ freq(shingle)² — bounded when no shingle is
    * hot. Postings longer than `maxPostingLen` are dropped entirely
    * (the classic stopword-prefix optimization): a shingle shared by
    * thousands of documents carries no near-dup signal, and without
    * the cap one boilerplate shingle would buffer its whole posting
    * list in a single aggregation row. Testdata's hottest shingle has
    * frequency 25 at sf0.1, so the default cap never fires there and
    * the DuckDB oracle (which computes the uncapped exact join)
    * still matches.
    */
  def similarityJoinEdges(df: DataFrame, textCol: String, idCol: String,
                          shingleSize: Int = 3,
                          threshold: Double = 0.5,
                          maxPostingLen: Int = 1000): DataFrame =
    pairIntersections(df, textCol, idCol, shingleSize, maxPostingLen)
      .filter(col("c").cast("double") / (col("na") + col("nb") - col("c")) >= threshold)
      .select(col("id_a"), col("id_b"))

  /** SAMPLED exact similarity-join edges: the truth pairs INCIDENT to
    * a deterministic 1-in-k doc-id sample (id % sampleK = 0), for the
    * D108-sampled recall audit. The posting index is still built over
    * the full corpus (linear, one shuffle — the affordable part), but
    * only SAMPLED docs probe their postings to form pairs, so the
    * quadratic pair-formation cost drops from Σfreq² to
    * Σfreq·freq_sampled ≈ Σfreq²/k — the estimator that keeps the
    * audit runnable at 100 TB where the exact Σfreq² side can't.
    * A pair with BOTH endpoints sampled forms from both probe
    * directions with identical (c, na, nb); the normalized projection
    * dedups it after the threshold filter.
    *
    * The id-modulus sample is what the DuckDB gate can replay exactly;
    * production would sample on a seeded hash of the id (same cost
    * shape) when ids are not uniformly assigned.
    */
  def similarityJoinEdgesSampled(df: DataFrame, textCol: String,
                                 idCol: String, sampleK: Int,
                                 shingleSize: Int = 3,
                                 threshold: Double = 0.5,
                                 maxPostingLen: Int = 1000): DataFrame = {
    require(sampleK >= 1, s"sampleK must be >= 1, got $sampleK")
    val sh = df.select(col(idCol).as("id"),
      array_distinct(graft.functions.ShingleFunctions
        .word_shingles(col(textCol), shingleSize)).as("sh"))
      .select(col("id"), size(col("sh")).as("n"),
        explode(col("sh")).as("shingle"))
      .select(xxhash64(col("shingle")).as("shash"), col("id"), col("n"))
    val postings = sh.groupBy(col("shash"))
      .agg(collect_list(struct(col("id"), col("n"))).as("ds"))
      .filter(size(col("ds")) >= 2 && size(col("ds")) <= maxPostingLen)
    postings
      .select(explode(col("ds")).as("a"), col("ds"))
      .filter(pmod(col("a.id"), lit(sampleK.toLong)) === 0L) // sampled probes only
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("pid"), col("b.id").as("oid"))
      .agg(count(lit(1)).as("c"),
        first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
      .filter(col("c").cast("double") / (col("na") + col("nb") - col("c"))
        >= threshold)
      .select(least(col("pid"), col("oid")).as("id_a"),
        greatest(col("pid"), col("oid")).as("id_b"))
      .distinct()
  }

  /** Shared inverted-index core: exact per-pair shared-shingle counts
    * (id_a < id_b) with both set sizes — the frame Jaccard and
    * containment both filter from.
    */
  private def pairIntersections(df: DataFrame, textCol: String,
                                idCol: String, shingleSize: Int,
                                maxPostingLen: Int): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(graft.functions.ShingleFunctions
        .word_shingles(col(textCol), shingleSize)).as("sh"))
      .select(col("id"), size(col("sh")).as("n"),
        explode(col("sh")).as("shingle"))
      .select(xxhash64(col("shingle")).as("shash"), col("id"), col("n"))
    val postings = sh.groupBy(col("shash"))
      .agg(collect_list(struct(col("id"), col("n"))).as("ds"))
      .filter(size(col("ds")) >= 2 && size(col("ds")) <= maxPostingLen)
    postings
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("c"),
        first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
  }

  /** D57: asymmetric CONTAINMENT near-dup — C(A,B) = |S_A ∩ S_B| /
    * min(|S_A|, |S_B|). Jaccard under-scores a short doc pasted
    * inside a long one (the union term is dominated by the long
    * side); containment fires at 1.0 there, which is exactly the
    * partial-copy / quote-extraction case web corpora are full of.
    * Same inverted-index candidate machinery as
    * [[similarityJoinEdges]] (one posting-list shuffle, 8-byte keys,
    * hot-shingle cap), different final ratio. The published ratio is
    * ONE divide of two exact integers — bit-identical in any engine.
    */
  def containmentJoinEdges(df: DataFrame, textCol: String, idCol: String,
                           shingleSize: Int = 3,
                           threshold: Double = 0.8,
                           maxPostingLen: Int = 1000): DataFrame =
    pairIntersections(df, textCol, idCol, shingleSize, maxPostingLen)
      .select(col("id_a"), col("id_b"),
        (col("c").cast("double") /
          least(col("na"), col("nb")).cast("double")).as("containment"))
      .filter(col("containment") >= threshold)

  /** Connected components over near-dup pairs — the resolution step
    * that turns pairwise edges into dedup clusters (canonical id =
    * component minimum). Min-label propagation PLUS a pointer-jumping
    * step (label := label-of-label) each round, so chains collapse in
    * O(log diameter) rounds instead of O(diameter) — a 50-hop path
    * converges in ~6 rounds. Lineage is truncated per round with
    * [[Materialize.cut]] (reliable checkpoint under a session
    * checkpoint dir, localCheckpoint otherwise); the convergence
    * probe is a filter over the
    * just-materialized round output (the old label travels with the
    * row), NOT an extra join job.
    *
    * @throws IllegalStateException if labels have not stabilized after
    *         `maxIters` rounds — partial labels are never returned
    *         silently (a long-chain graph would otherwise yield wrong
    *         canonical ids that no small-data oracle can catch).
    */
  def connectedComponents(edges: DataFrame, nodes: DataFrame,
                          maxIters: Int = 20): DataFrame = {
    // Co-partitioned, measured-width loop layout (see
    // [[Centrality.pageRank]]): the union is probed on dst every
    // round, so cut it hash(dst); labels start hash(id) (the
    // distinct's layout). The per-round pointer jump re-keys on mid,
    // so the label frame re-exchanges once per round — but the EDGE
    // frame never does. Dup-incident frames are tiny relative to the
    // corpus, so the measured width usually lands near 1 locally and
    // scales with true dup volume in production.
    val (und0, uBytes) = Materialize.cutAlignedMeasured(
      edges.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionAll(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
        .repartition(col("dst")))
    val spark = edges.sparkSession
    val w = Materialize.loopWidth(spark, uBytes, 16L << 20)
    val fullW = Materialize.sessionWidth(spark)
    val labelsOut = Materialize.withWidth(spark, w) {
      val und =
        if (w == fullW) und0
        else Materialize.cutAligned(und0.repartition(w, col("dst")))
      // Iterate only over edge-incident nodes — dup clusters are a
      // small fraction of any real corpus, so the loop's frames stay
      // tiny; isolated nodes join back (label = own id) at the end.
      var labels = Materialize.cutAligned(
        und.select(col("src").as("id")).distinct()
          .withColumn("label", col("id")))
      var iter = 0
      var converged = false
      while (iter < maxIters && !converged) {
        // 1-hop: min over neighbours' labels (map-side combine on src)
        val nbrMin = und.join(labels, col("dst") === col("id"))
          .groupBy(col("src")).agg(min(col("label")).as("nbr"))
        val prop = labels.join(nbrMin, col("id") === col("src"), "left")
          .select(col("id"), col("label").as("old"),
            least(col("label"), coalesce(col("nbr"), col("label"))).as("mid"))
        // pointer jump: label := current label OF the label node. Labels
        // are always node ids of the same component, so this only ever
        // shortcuts toward the component minimum.
        val lookup = prop.select(col("id").as("pid"), col("mid").as("plabel"))
        val next = Materialize.cutAligned(
          prop.join(lookup, col("mid") === col("pid"), "left")
            .select(col("id"), col("old"),
              least(col("mid"), coalesce(col("plabel"), col("mid"))).as("label")))
        converged = next.filter(col("label") =!= col("old")).isEmpty
        labels = next.select(col("id"), col("label"))
        iter += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"connectedComponents: labels not stable after $maxIters rounds — " +
            "refusing to return partial (wrong) canonical ids; raise maxIters")
      labels
    }
    nodes.select(col("id"))
      .join(labelsOut.withColumnRenamed("id", "lid"), col("id") === col("lid"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("canonical_id"))
  }

  /** D17 scale path: dedup resolution through LSH candidates instead
    * of the exact all-pairs index. [[similarityJoinEdges]]' candidate
    * volume is Σ freq(shingle)² — inherent to EXACT all-pairs, and on
    * a clique-heavy corpus (boilerplate, mirrored sites) that is the
    * square of the clique sizes. A bucketed candidate generator
    * ([[minhashLsh]], [[simhashPairs]], cosine LSH) finds the same
    * cliques output-bound; this entrypoint exact-verifies those
    * candidates with true shingle Jaccard and resolves components, so
    * vs the exact path the only delta is LSH recall (dialed by
    * bands×rows), never precision.
    *
    * @param candidates (id_a, id_b) pairs from any generator. Pass
    *        `verified = true` when they already carry an exact-Jaccard
    *        verification (e.g. [[minhashLsh]] output) to skip the
    *        second shingle join.
    */
  def resolveCandidates(df: DataFrame, textCol: String, idCol: String,
                        candidates: DataFrame,
                        shingleSize: Int = 3,
                        threshold: Double = 0.5,
                        verified: Boolean = false): DataFrame = {
    val pairs = candidates.select(col("id_a"), col("id_b"))
    val edges =
      if (verified) pairs
      else {
        val sh = df.select(col(idCol).as("id"),
          graft.functions.ShingleFunctions
            .word_shingles(col(textCol), shingleSize).as("sh"))
        pairs
          .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
          .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
          .filter(TextFunctions.jaccard(col("sh_a"), col("sh_b")) >= threshold)
          .select(col("id_a"), col("id_b"))
      }
    connectedComponents(edges, df.select(col(idCol).as("id")))
  }

  /** The persistable LSH band index of a corpus: (id, band, bandhash)
    * — 24 bytes per doc·band. Write it to the lake alongside the
    * corpus and APPEND each admitted batch's rows; then
    * [[admitIncremental]] with `existingIndex` never recomputes
    * shingles or signatures over the existing corpus.
    */
  def bandIndex(df: DataFrame, textCol: String, idCol: String,
                shingleSize: Int = 3, bands: Int = 8, rows: Int = 4): DataFrame =
    mhBandRows(shingleFrame(df, textCol, idCol, shingleSize), bands, rows)

  /** Persist a [[bandIndex]] as a lake artifact, partitioned by band:
    * an admission probe joins on (band, bandhash), so per-band
    * directories keep each probe's shuffle to 1/bands of the index and
    * let a band-restricted read prune at file listing. `append = true`
    * is the growth path: after [[admitIncremental]], append ONLY the
    * admitted batch's band rows — the existing corpus is never
    * re-signed (DedupSpec pins append ≡ recompute).
    */
  def saveBandIndex(index: DataFrame, path: String,
                    append: Boolean = false): Unit =
    index.select(col("id"), col("band"), col("bandhash"))
      .write.mode(if (append) "append" else "overwrite")
      .partitionBy("band").parquet(path)

  /** Read a [[saveBandIndex]] artifact back in [[bandIndex]] column
    * order (hash values are integral — exact through parquet).
    */
  def loadBandIndex(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame =
    spark.read.parquet(path).select(col("id"), col("band"), col("bandhash"))

  /** D23: incremental corpus admission — the growth loop of a training
    * corpus. Each incoming batch is screened for near-dups against the
    * EXISTING corpus and against itself, WITHOUT ever re-pairing the
    * corpus with itself.
    *
    * Cost shape: the batch is shingled/signed ONCE; the existing
    * corpus contributes only its [[bandIndex]] rows (pass the
    * persisted index via `existingIndex` — the convenience overload
    * without it recomputes the index, costing a full corpus pass).
    * Existing TEXT is touched only for band-collision candidates:
    * the exact-Jaccard verify joins candidate ex_ids back to
    * `existing` first and shingles the matched rows only, so with an
    * id-partitioned corpus lake the admission reads O(batch +
    * candidates), not O(corpus).
    *
    * Semantics (transitive clustering, matching the resolution
    * operators): verified near-dup pairs (exact Jaccard ≥ threshold —
    * LSH false positives never reject a doc) form a graph over the
    * incoming batch; a component any member of which verifies against
    * the existing corpus is rejected wholesale, otherwise its
    * minimum-id member is admitted as the representative.
    *
    * @param existingIndex [[bandIndex]] of `existing`, if persisted
    * @return admitted incoming rows, original columns intact
    */
  def admitIncremental(existing: DataFrame, incoming: DataFrame,
                       textCol: String, idCol: String,
                       shingleSize: Int = 3, bands: Int = 8, rows: Int = 4,
                       threshold: Double = 0.5,
                       existingIndex: Option[DataFrame] = None): DataFrame = {
    val inSh = shingleFrame(incoming, textCol, idCol, shingleSize)
    val inBands = mhBandRows(inSh, bands, rows)
    val exIndex = existingIndex.getOrElse(
      bandIndex(existing, textCol, idCol, shingleSize, bands, rows))

    // incoming ↔ existing: band collision nominates; exact Jaccard
    // decides, shingling only the candidate existing docs
    val candPairs = inBands
      .select(col("band"), col("bandhash"), col("id").as("in_id"))
      .join(exIndex.select(col("band"), col("bandhash"), col("id").as("ex_id")),
        Seq("band", "bandhash"))
      .select(col("in_id"), col("ex_id")).distinct()
    val exCandSh = candPairs.select(col("ex_id")).distinct()
      .join(existing.select(col(idCol).as("ex_id"), col(textCol).as("__text")),
        Seq("ex_id"))
      .select(col("ex_id"), graft.functions.ShingleFunctions
        .word_shingles(col("__text"), shingleSize).as("sh_ex"))
    val tainted = candPairs
      .join(inSh.select(col("id").as("in_id"), col("sh").as("sh_in")), Seq("in_id"))
      .join(exCandSh, Seq("ex_id"))
      .filter(TextFunctions.jaccard(col("sh_in"), col("sh_ex")) >= threshold)
      .select(col("in_id")).distinct()

    // incoming ↔ incoming: verified near-dup graph → components
    // (reuses the batch's shingles + band rows — nothing recomputed)
    val inEdges = minhashLshFromShingles(inSh, inBands, threshold)
      .select(col("id_a"), col("id_b"))
    val comp = connectedComponents(inEdges,
      incoming.select(col(idCol).as("id")))

    val taintedComponents = comp
      .join(tainted, col("id") === col("in_id"))
      .select(col("canonical_id")).distinct()
    // the component label IS the minimum member id, so the
    // representative needs no extra aggregation
    val admittedIds = comp
      .join(taintedComponents.withColumnRenamed("canonical_id", "bad"),
        col("canonical_id") === col("bad"), "left_anti")
      .filter(col("id") === col("canonical_id"))
      .select(col("id"))
    incoming.join(admittedIds, incoming(idCol) === admittedIds("id"), "left_semi")
  }

  /** D19: benchmark decontamination — find corpus documents sharing
    * any word n-gram with an eval/benchmark set (the standard
    * training-data hygiene check: eval examples leaking into training
    * data inflate scores). Returns (doc_id, bench_id, n_shared)
    * per contaminated pair.
    *
    * Scale shape: benchmark sets are small by nature, so up to
    * `broadcastDocLimit` bench docs the exploded benchmark n-grams
    * broadcast — the corpus is scanned once, never shuffled on the
    * gram. A larger bench side degrades to the gram equality join,
    * with the corpus side first bloom-pruned ([[BloomPrune]]) against
    * the bench grams: almost every corpus gram is clean, so the ~MiB
    * filter strips the corpus exchange down to probable hits before
    * the shuffle — the join then removes the false positives. Both
    * sides stay linear, never a nested loop.
    *
    * The broadcast decision costs no job: `benchIsSmall` when the
    * caller knows (it usually does — the bench set is its own input),
    * otherwise the optimizer's plan statistics (row count when
    * available, else size-in-bytes ≤ 1/10 byte-per-doc-equivalent of
    * `broadcastDocLimit` × 1 KiB) decide without touching the data.
    */
  def contamination(corpus: DataFrame, bench: DataFrame,
                    textCol: String, idCol: String,
                    n: Int = 8,
                    broadcastDocLimit: Long = 50000L,
                    benchIsSmall: Option[Boolean] = None,
                    maxBloomGrams: Long = 1L << 22): DataFrame = {
    def grams(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).as(as),
        explode(array_distinct(graft.functions.ShingleFunctions
          .word_shingles(col(textCol), n))).as("gram"))
    val benchGrams = grams(bench, "bench_id")
    val small = benchIsSmall.getOrElse {
      val stats = bench.queryExecution.optimizedPlan.stats
      stats.rowCount match {
        case Some(rc) => rc <= BigInt(broadcastDocLimit)
        // no exact row count pre-execution: fall back to scan size,
        // budgeting ~1 KiB per bench doc
        case None => stats.sizeInBytes <= BigInt(broadcastDocLimit) * 1024L
      }
    }
    val corpusGrams = grams(corpus, "doc_id")
    val (benchSide, corpusSide) =
      if (small) (broadcast(benchGrams), corpusGrams)
      else {
        // two narrow bench-side jobs (count, then a correctly-SIZED
        // bloom build) buy a corpus-side exchange that carries only
        // probable hits — trivial next to the corpus shuffle they
        // save. Beyond maxBloomGrams the filter itself stops being
        // broadcast-sized (and would saturate), so fall back to the
        // plain gram join rather than ship a useless filter.
        val nGrams = benchGrams.count()
        if (nGrams > 0 && nGrams <= maxBloomGrams) {
          val bloom = BloomPrune.buildBloom(benchGrams, col("gram"),
            expectedItems = nGrams)
          (benchGrams,
            corpusGrams.filter(BloomPrune.mightContain(bloom, col("gram"))))
        } else (benchGrams, corpusGrams)
      }
    corpusSide
      .join(benchSide, Seq("gram"))
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** D19b: per-document contamination SCORE — the graded companion to
    * [[contamination]]'s binary pair flags: for each corpus doc, the
    * fraction of its distinct word n-grams that appear ANYWHERE in
    * the benchmark set. The operator behind threshold policies like
    * "drop if >X% eval overlap" (exact-pair flags over-trigger on a
    * single boilerplate gram; the fraction grades severity).
    *
    * Scale shape: the bench gram SET (distinct values only, no
    * bench_id fan-out) broadcasts; the corpus is scanned once, each
    * doc's distinct grams counted against the broadcast set with a
    * map-side partial agg on doc_id — no corpus shuffle on the gram,
    * no pair blow-up on grams shared by many bench docs (the very
    * case where [[contamination]]'s output is largest, this stays one
    * row per doc).
    *
    * @return (doc_id, n_grams, n_shared, overlap_frac); docs shorter
    *         than `n` words score 0 over 0 grams.
    */
  def contaminationScore(corpus: DataFrame, bench: DataFrame,
                         textCol: String, idCol: String,
                         n: Int = 8): DataFrame = {
    val benchSet = bench.select(explode(array_distinct(
        graft.functions.ShingleFunctions.word_shingles(col(textCol), n)))
        .as("gram"))
      .distinct()
      .withColumn("hit", lit(1))
    corpus
      .select(col(idCol).as("doc_id"), array_distinct(
        graft.functions.ShingleFunctions.word_shingles(col(textCol), n)).as("gs"))
      .select(col("doc_id"), size(col("gs")).cast("long").as("n_grams"),
        explode_outer(col("gs")).as("gram"))
      .join(broadcast(benchSet), Seq("gram"), "left")
      .groupBy(col("doc_id"), col("n_grams"))
      .agg(count(col("hit")).as("n_shared"))
      .select(col("doc_id"), col("n_grams"), col("n_shared"),
        (col("n_shared").cast("double") /
          greatest(col("n_grams"), lit(1L)).cast("double")).as("overlap_frac"))
  }

  /** D50: within-corpus n-gram novelty audit — for every document,
    * the fraction of its distinct word n-grams that also occur in at
    * least one OTHER document. This is the memorization/boilerplate
    * exposure dial (Lee et al. 2022's analysis face): dup_frac ≈ 1
    * marks template spam and licenses, dup_frac ≈ 0 marks genuinely
    * novel text; the corpus-level histogram of this score is the
    * first chart of any duplication report, and the per-doc score
    * composes with D33's percentile threshold for "drop the least
    * novel X%" curation.
    *
    * Scale shape: one explode of per-doc DISTINCT grams → a
    * partial-agg'd `groupBy(gram)` doc-frequency count (map-side
    * combine collapses within-partition repeats) → the shared-gram
    * set (df ≥ 2) semi-joins back against the same exploded frame →
    * per-doc partial-agg'd hit counts. Two gram-keyed shuffles, no
    * pair blow-up (gram doc-frequency, never gram × gram). At 100 TB
    * the gram key would ride as `xxhash64(gram)` 8-byte tokens with
    * an exact-verify pass on survivors (the D36 discipline); at
    * oracle scale the string key keeps both engines trivially
    * aligned.
    *
    * @return (doc_id, n_grams, n_dup, dup_frac); docs shorter than
    *         `n` words score 0 over 0 grams.
    */
  def noveltyScore(corpus: DataFrame, textCol: String, idCol: String,
                   n: Int = 8): DataFrame = {
    // null text behaves as empty (0 grams, 0 dup) instead of
    // poisoning n_grams with a null size
    val safeText = coalesce(col(textCol), lit(""))
    val grams = corpus.select(col(idCol).as("doc_id"),
      explode(array_distinct(
        graft.functions.ShingleFunctions.word_shingles(safeText, n)))
        .as("gram"))
    // grams are distinct WITHIN a doc, so plain count == doc frequency
    val shared = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .select(col("gram"))
    val perDoc = grams.join(shared, Seq("gram"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    corpus
      .select(col(idCol).as("doc_id"), size(array_distinct(
        graft.functions.ShingleFunctions.word_shingles(safeText, n)))
        .cast("long").as("n_grams"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        (coalesce(col("n_dup"), lit(0L)).cast("double") /
          greatest(col("n_grams"), lit(1L)).cast("double")).as("dup_frac"))
  }

  /** D4: n-gram Jaccard similarity for given candidate pairs (here:
    * consecutive doc ids — a deterministic, oracle-checkable pairing;
    * LSH supplies candidates at scale).
    */
  def consecutivePairJaccard(df: DataFrame, textCol: String, idCol: String,
                             shingleSize: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      graft.functions.ShingleFunctions.word_shingles(col(textCol), shingleSize).as("sh"))
    val l = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val r = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    l.join(r, col("id_b") === col("id_a") + 1)
      .select(col("id_a"), col("id_b"),
        TextFunctions.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
  }

  /** D26: corpus-level duplicated-span removal — every token position
    * covered by an exact n-token span that occurs at least `minCount`
    * times ACROSS THE CORPUS (all occurrences, within- and cross-doc)
    * is dropped from its document. This is span-granular dedup in the
    * style of "Deduplicating Training Data Makes Language Models
    * Better" (Lee et al., 2022) / C4's repeated-line filter: document-
    * level dedup keeps one copy of a boilerplate paragraph PER
    * DISTINCT DOCUMENT — this removes the repeated span itself
    * everywhere, which is what stops an LLM from memorizing it.
    *
    * Plan shape (no driver state, no all-pairs work):
    *  1. positional n-grams per doc (codegen `shingles` transform —
    *     an array op, tokens never explode for counting);
    *  2. corpus gram frequencies via partial-aggregated groupBy —
    *     repeated grams collapse map-side, so the exchange carries
    *     ~distinct grams, not corpus positions;
    *  3. hot grams (`count >= minCount`) are rare by construction —
    *     AQE sees the tiny post-agg side and broadcasts the join back
    *     onto occurrences (worst case: equality shuffle on the gram,
    *     still never quadratic);
    *  4. covered positions fold to one small int-set per doc, and the
    *     rewrite is a positional array `filter` — documents are
    *     reassembled in place, never re-grouped from exploded tokens.
    *
    * Cost caveat the exchange story above does NOT cover: the input
    * is an independent subtree under the gram count, the
    * covered-position join, and the final rewrite — as a pure lazy
    * plan the scan + tokenization runs up to THREE times (there is no
    * common exchange for ReuseExchange to dedupe when AQE broadcasts
    * the hot side). On wide corpora, `df.persist(...)` BEFORE calling
    * so the three passes share one scan — the caller holds the handle
    * and can unpersist once the result is written (an internal
    * persist would be unreleasable: the cached subtree is not the
    * returned plan, so `result.unpersist()` could never match it).
    *
    * Returns (id, clean_text, n_removed) — `n_removed` counts dropped
    * token positions. Deterministic, and exactly reproducible in ANSI
    * SQL (DuckDB-oracled as `dedup_repeated_spans`).
    */
  def stripRepeatedSpans(df: DataFrame, textCol: String, idCol: String,
                         n: Int = 4, minCount: Long = 2): DataFrame = {
    require(n > 0, s"stripRepeatedSpans: span length must be positive, got $n")
    require(minCount >= 2,
      s"stripRepeatedSpans: minCount < 2 would remove every token, got $minCount")
    val toked = df.select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val occ = toked.select(col("id"),
      posexplode(TextFunctions.shingles(col("toks"), n)).as(Seq("pos", "gram")))
    val hot = occ.groupBy(col("gram"))
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount)
      .select(col("gram"))
    // fold hot START positions only (n× fewer rows into the per-doc
    // aggregation than exploding every covered index) and expand
    // ∪[pos, pos+n−1] inside the one-pass mask kernel — identical
    // kept-token sequence to the old explode/collect_set/HOF-filter
    // formulation, which paid O(|toks|·|cov|) array_contains probes
    val covered = occ.join(hot, "gram")
      .groupBy(col("id")).agg(collect_set(col("pos")).as("cov"))
    toked.join(covered, Seq("id"), "left")
      .withColumn("cov", coalesce(col("cov"), array().cast("array<int>")))
      .withColumn("clean_toks", graft.functions.GraftFunctions
        .strip_covered_positions(col("toks"), col("cov"), n))
      .select(col("id"),
        array_join(col("clean_toks"), " ").as("clean_text"),
        (size(col("toks")) - size(col("clean_toks"))).as("n_removed"))
  }
}
