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
    val mask = (1L << bandBits) - 1
    val slices = array((0 until bands).map { bn =>
      struct(lit(bn).as("band"),
        shiftrightunsigned(col("ph"), bn * bandBits)
          .bitwiseAND(lit(mask)).as("bv"))
    }: _*)
    val banded = hashes.select(
      (col(idCol).as("id") +: dimCols.map(col)) :+ col(hashCol).as("ph"): _*)
      .withColumn("bb", explode(slices))
      .withColumn("band", col("bb.band"))
      .withColumn("bv", col("bb.bv"))
      .drop("bb")
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
