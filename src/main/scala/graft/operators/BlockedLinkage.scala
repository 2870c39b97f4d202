package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Capped blocking for entity-resolution similarity joins (C76).
  *
  * The standard ER recipe — block on a cheap key, run the expensive
  * string metric only within blocks — silently degrades when the
  * blocking key's cardinality is FIXED by the data's vocabulary (an
  * 8-char name prefix over a finite name dictionary): blocks then grow
  * linearly with the corpus, so within-block pairs grow QUADRATICALLY.
  * At 100× the data that is ~10⁴× the pair volume — the classic
  * blocking-key scale failure.
  *
  * This operator adds the block-size dial (the same posture as
  * [[LinkPrediction]]'s `maxDegree` hub cut):
  *
  *  - blocks with ≤ `maxBlock` rows compare ALL within-block pairs —
  *    exact, today's semantics, total pair volume ≤ n·maxBlock;
  *  - blocks over `maxBlock` switch to SORTED-NEIGHBORHOOD: rows sort
  *    by (value, id) inside the block and only pairs within `window`
  *    rank positions compare — O(block·window) pairs, so the total is
  *    O(n·max(maxBlock, window)) — LINEAR in corpus size. Lexicographic
  *    neighbors are where near-identical strings live (they share the
  *    block's prefix by construction, and sorting clusters the rest of
  *    the string), the standard SNM recall argument.
  *
  * The windowed path forms pairs via CHUNK equi-keys, never a per-block
  * cross product: rank r maps to chunk g = ⌊(r−1)/window⌋, and any pair
  * with rank gap ≤ window lies in the same or adjacent chunks (gap ≤
  * window ⇒ g_b ≤ g_a+1), so the probe side emits keys {g, g−1} and the
  * equi-join on (block, chunk) forms O(window) candidates per row. Each
  * qualifying pair is formed exactly once: b is the higher rank, and
  * exactly one of its two probe keys equals g_a.
  *
  * Only the rank assignment runs one-task-per-block (a partitioned
  * window sort, spilling, parallel ACROSS blocks); pair formation
  * redistributes on (block, chunk).
  */
object BlockedLinkage {

  /** Candidate pairs `(id_a < id_b, val_a, val_b)` under capped
    * blocking. The caller applies its similarity kernel + threshold to
    * the returned frame.
    *
    * @param maxBlock largest block compared exhaustively (pair volume
    *                 bound n·maxBlock); blocks above it use SNM
    * @param window   sorted-neighborhood rank window inside oversized
    *                 blocks
    * @param attrs    extra per-record columns carried THROUGH pair
    *                 formation as `<attr>_a` / `<attr>_b` (oriented
    *                 with the id order). Carrying an attribute here
    *                 costs O(n) extra bytes in the block join; the
    *                 alternative — joining it back onto the PAIR frame
    *                 by id — shuffles O(n·maxBlock) pair rows per
    *                 attribute join (guide §2.3: project before the
    *                 exchange, attach on the small side)
    */
  def candidatePairs(df: DataFrame, id: String, value: String,
                     block: Column, maxBlock: Int = 1000,
                     window: Int = 64,
                     attrs: Seq[String] = Nil): DataFrame = {
    require(maxBlock >= 1, s"maxBlock must be >= 1, got $maxBlock")
    require(window >= 1, s"window must be >= 1, got $window")
    val p = df.select(col(id).as("__id") +: col(value).as("__val") +:
      block.as("__blk") +: attrs.map(col): _*)
    // cut the AGGREGATE-sized block-size frame only (one row per
    // block) — materializing the tagged corpus itself would be the
    // 100-TB hazard; the legs below re-run the cheap scan + size join
    val sizes = Materialize.cut(
      p.groupBy(col("__blk")).agg(count(lit(1)).as("__n")))
    val tagged = p.join(sizes, Seq("__blk"))
    val carried = Seq("__val") ++ attrs
    def outName(c: String, s: String) =
      if (c == "__val") s"val_$s" else s"${c}_$s"

    val small = tagged.filter(col("__n") <= maxBlock)
      .select(col("__blk") +: col("__id") +: carried.map(col): _*)
    val smallPairs = small.as("a").join(small.as("b"),
        col("a.__blk") === col("b.__blk") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a") +: col("b.__id").as("id_b") +:
        (carried.map(c => col(s"a.$c").as(outName(c, "a"))) ++
         carried.map(c => col(s"b.$c").as(outName(c, "b")))): _*)

    val w = Window.partitionBy(col("__blk")).orderBy(col("__val"), col("__id"))
    val big = tagged.filter(col("__n") > maxBlock)
      .select(col("__blk") +: col("__id") +: carried.map(col): _*)
      .withColumn("__rnk", row_number().over(w))
      .withColumn("__g", floor((col("__rnk") - 1) / window))
    val probes = big.select(col("__blk") +: col("__id") +: col("__rnk") +:
        explode(array(col("__g"), col("__g") - 1)).as("__gp") +:
        carried.map(col): _*)
      .filter(col("__gp") >= 0)
    val gap = col("b.__rnk") - col("a.__rnk")
    val bigPairs = big.as("a").join(probes.as("b"),
        col("a.__blk") === col("b.__blk") && col("a.__g") === col("b.__gp") &&
          gap >= 1 && gap <= window)
      .select(
        least(col("a.__id"), col("b.__id")).as("id_a") +:
        greatest(col("a.__id"), col("b.__id")).as("id_b") +:
        (carried.map(c => when(col("a.__id") <= col("b.__id"), col(s"a.$c"))
            .otherwise(col(s"b.$c")).as(outName(c, "a"))) ++
         carried.map(c => when(col("a.__id") <= col("b.__id"), col(s"b.$c"))
            .otherwise(col(s"a.$c")).as(outName(c, "b")))): _*)

    smallPairs.unionByName(bigPairs)
  }
}
