package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual near-duplicate detection for media (SURVEY §2.D70).
  *
  * Image dedup at corpus scale runs on perceptual fingerprints —
  * dHash/pHash bit vectors where visually-identical assets land
  * within a few Hamming bits of each other — because byte-level
  * digests (D1) miss re-encodes and the embedding route (D38) costs
  * a model forward pass per image. This operator is the candidate
  * join for those fingerprints: the SimHash banding trick (§2.D3)
  * transplanted to media hashes.
  *
  * Banding guarantee — split the b-bit hash into `bands` contiguous
  * slices: two hashes within Hamming distance d differ in at most d
  * slices, so with `bands ≥ d + 1` at least one slice is EQUAL
  * (pigeonhole) — provided the slices cover every bit the distance
  * is measured over, which `require(bands · bandBits ≥ hashBits)`
  * enforces. Candidates join on (dims, slice id, slice value);
  * the exact `bit_count(xor)` then keeps true near-dups only — the
  * bucketing is complete, never lossy.
  *
  * Scale shape — the shuffle carries (id, dims, 8-byte hash) ×
  * `bands` rows: fingerprint-sized, never pixels. Per-bucket work is
  * quadratic ONLY in bucket occupancy, exactly like the LSH
  * self-join (Dedup.scala) — hash bits are high-entropy outside
  * true near-dup clusters, so buckets stay small and cost tracks
  * true-pair density. The verify step is one codegen'd
  * xor+popcount per candidate. No `.collect()`, no driver state.
  */
object MediaDedup {

  /** The band-slice explosion shared by [[phashPairs]] and the E20
    * streaming gate: one row per (id, dims..., hash, band, slice
    * value). Codegen projection + explode — no shuffle.
    */
  def bandedRows(hashes: DataFrame, idCol: String, hashCol: String,
                 dimCols: Seq[String] = Seq("width", "height"),
                 bandBits: Int = 12, bands: Int = 4): DataFrame = {
    val mask = (1L << bandBits) - 1
    val slices = array((0 until bands).map { bn =>
      struct(lit(bn).as("band"),
        shiftrightunsigned(col("ph"), bn * bandBits)
          .bitwiseAND(lit(mask)).as("bv"))
    }: _*)
    hashes.select(
      (col(idCol).as("id") +: dimCols.map(col)) :+ col(hashCol).as("ph"): _*)
      .withColumn("bb", explode(slices))
      .withColumn("band", col("bb.band"))
      .withColumn("bv", col("bb.bv"))
      .drop("bb")
  }

  /** Exact-fingerprint pre-collapse: one canonical (min id) per
    * (dims, hash) group. At mass-duplication density (re-hosted
    * images, mirrored assets) most near-dup mass is Hamming-0 —
    * collapsing it first is LINEAR (one partial-agg'd groupBy), and
    * [[phashPairs]] over the canonicals then pays quadratic cost
    * only across genuinely-distinct fingerprints. Same staging as
    * the char-span dedup's gram pre-hash.
    *
    * @return (dimCols..., hash, canonical_id, n_members)
    */
  def collapseExact(hashes: DataFrame, idCol: String, hashCol: String,
                    dimCols: Seq[String] = Seq("width", "height")): DataFrame =
    hashes.groupBy((dimCols.map(col) :+ col(hashCol)): _*)
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_members"))

  /** Incremental fingerprint screening (the D23 admission recipe on
    * perceptual hashes): admit each incoming asset unless it is
    * within `maxHamming` of an already-indexed fingerprint, or a
    * non-representative member of a within-batch near-dup component
    * (component = connected near-dup graph, representative = min
    * id — mirroring [[Dedup.admitIncremental]]'s taint/representative
    * rule exactly: a component touching the index is rejected whole).
    *
    * Cost is O(batch · bands) join rows against the banded index —
    * the existing corpus is never re-decoded. The batch first rides
    * [[collapseExact]]: the near-dup relation depends only on (dims,
    * hash), so assets with EQUAL fingerprints are mutual near-dups
    * (Hamming 0) and collapse to their min-id canonical in ONE linear
    * groupBy — taint, components, and the min-id representative are
    * then computed over fingerprint CLASSES and give bit-identical
    * results (class canonical = min member id ⇒ component label = min
    * asset id of the whole expanded component; a class is tainted iff
    * any member is). Without the collapse, a hot fingerprint — blank
    * thumbnails, re-hosted bitwise-identical images, the multimodal
    * twin of the stopword shingle — makes within-batch pair formation
    * QUADRATIC in its frequency; with it, quadratic cost exists only
    * across genuinely-distinct fingerprints (probe: the ×20
    * all-planted-dup amplification went 421.9 s → O(linear) since
    * 100k assets collapse to a few dozen classes).
    *
    * @param existingFp indexed fingerprints (dimCols..., hashCol),
    *        or None for a cold start.
    * @return the admitted subset of `hashes` rows (same schema).
    */
  def admitBatch(existingFp: Option[DataFrame], hashes: DataFrame,
                 idCol: String, hashCol: String,
                 dimCols: Seq[String] = Seq("width", "height"),
                 hashBits: Int = 48, bandBits: Int = 12, bands: Int = 4,
                 maxHamming: Int = 2): DataFrame = {
    require(bands > maxHamming && bands * bandBits >= hashBits,
      "banding must be complete for the screen to be exact")
    val h = hashes
    val classes = collapseExact(h, idCol, hashCol, dimCols)
      .select((dimCols.map(col) :+ col(hashCol) :+
        col("canonical_id").as("cls_id")): _*)
    val inB = bandedRows(classes, "cls_id", hashCol, dimCols, bandBits, bands)
    val tainted = existingFp match {
      case Some(fp) =>
        val exB = bandedRows(
            fp.select((dimCols.map(col) :+ col(hashCol)): _*).distinct(),
            hashCol, hashCol, dimCols, bandBits, bands)
          .select((dimCols.map(c => col(c).as(s"x_$c")) ++
            Seq(col("ph").as("xph"), col("band").as("xband"),
              col("bv").as("xbv"))): _*)
        inB.join(exB,
            dimCols.map(c => col(c) === col(s"x_$c"))
              .reduce(_ && _) && col("band") === col("xband") &&
              col("bv") === col("xbv"))
          .where(bit_count(col("ph").bitwiseXOR(col("xph"))) <= maxHamming)
          .select(col("id").as("in_id")).distinct()
      case None =>
        hashes.sparkSession.emptyDataFrame
          .withColumn("in_id", lit(0L)).limit(0)
    }
    val inEdges = phashPairs(classes, "cls_id", hashCol, dimCols,
      hashBits, bandBits, bands, maxHamming)
    val comp = Dedup.connectedComponents(
      inEdges.select(col("id_a"), col("id_b")),
      classes.select(col("cls_id").as("id")))
    val taintedComponents = comp
      .join(tainted, col("id") === col("in_id"))
      .select(col("canonical_id")).distinct()
    val admittedIds = comp
      .join(taintedComponents.withColumnRenamed("canonical_id", "bad"),
        col("canonical_id") === col("bad"), "left_anti")
      .filter(col("id") === col("canonical_id"))
      .select(col("id"))
    h.join(admittedIds, h(idCol) === admittedIds("id"),
      "left_semi")
  }

  /** Banded Hamming self-join over perceptual hashes.
    *
    * @param hashes     (idCol, dimension columns..., hashCol) one
    *                   fingerprint per asset; `dimCols` (e.g. width,
    *                   height) must match exactly for a pair to be
    *                   comparable.
    * @param idCol      asset id (BIGINT).
    * @param hashCol    fingerprint (BIGINT, ≤ `hashBits` significant
    *                   bits).
    * @param dimCols    exact-match blocking columns.
    * @param hashBits   significant bits of the fingerprint.
    * @param bandBits   bits per band slice.
    * @param bands      number of band slices; `bands > maxHamming`
    *                   and `bands·bandBits ≥ hashBits` make the
    *                   candidate set complete.
    * @param maxHamming pair acceptance threshold.
    * @return (id_a, id_b, hamming) with id_a < id_b, one row per
    *         near-dup pair.
    */
  def phashPairs(hashes: DataFrame, idCol: String, hashCol: String,
                 dimCols: Seq[String] = Seq("width", "height"),
                 hashBits: Int = 48, bandBits: Int = 12, bands: Int = 4,
                 maxHamming: Int = 2): DataFrame = {
    require(bands > maxHamming,
      s"need bands ($bands) > maxHamming ($maxHamming) for the pigeonhole")
    require(bands * bandBits >= hashBits,
      s"bands*bandBits (${bands * bandBits}) must cover hashBits ($hashBits)")
    val banded = bandedRows(hashes, idCol, hashCol, dimCols, bandBits, bands)
    val joinKeys = dimCols ++ Seq("band", "bv")
    val a = banded.as("a")
    val b = banded.as("b")
    val cond = joinKeys.map(k => col(s"a.$k") === col(s"b.$k"))
      .reduce(_ && _) && col("a.id") < col("b.id")
    a.join(b, cond)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.ph").as("ha"), col("b.ph").as("hb"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("int"))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
