package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Adamic–Adar link prediction (Adamic & Adar 2003) over a bipartite
  * membership frame — "which two right-side nodes are most likely
  * connected" scored through their shared left-side neighbors, each
  * neighbor discounted by 1/ln(degree): a customer who buys from
  * everyone says nothing, one with two suppliers says a lot. The
  * link-prediction face of the same wedge machinery C29's triangle
  * count uses.
  *
  * Determinism: the per-neighbor weight is the MICRO-UNIT integer
  * round(10⁶/ln d) — pair scores then accumulate as exact integer
  * sums (associative, partition-free) and the published score is ONE
  * double divide; the single libm `ln` is inside a per-term rounding
  * both engines apply identically (the BM25/LM oracle convention).
  *
  * Scale shape: wedge enumeration is a self-join of the (left, right)
  * membership on the LEFT key — cost Σ_l deg(l)², the O(m·d̄) wedge
  * bound, with two dials: degree-1 lefts prune BEFORE the join (they
  * form no pair), and `maxDegree` drops super-hub lefts whose wedge
  * fan-out is quadratic while their information content (1/ln d) is
  * asymptotically nil — the standard hub cut every production AA
  * makes. The pair aggregate is right-domain² bounded, and the top-k
  * is a TakeOrdered, never a global sort.
  */
object LinkPrediction {

  /** Top-k right-side pairs by Adamic–Adar score:
    * (a, b, common_neighbors, aa_score), a < b, ranked by exact
    * integer score desc then (a, b) asc.
    */
  def adamicAdarTopK(membership: DataFrame, left: Column, right: Column,
                     k: Int = 20, maxDegree: Long = 10000L): DataFrame = {
    require(k > 0 && maxDegree >= 2, s"bad k=$k / maxDegree=$maxDegree")
    // cut lineage once: mw feeds BOTH sides of the wedge self-join —
    // without the cut the upstream membership pipeline (joins +
    // distinct) executes twice
    val m = Materialize.cut(
      membership.select(left.as("__l"), right.as("__r")).distinct())
    val deg = m.groupBy(col("__l")).agg(count(lit(1)).as("__d"))
      .filter(col("__d") >= 2 && col("__d") <= maxDegree)
      .withColumn("__w",
        round(lit(1000000.0) / log(col("__d").cast("double"))).cast("long"))
    // aligned cut: the join leaves mw hash(__l)-partitioned and the
    // cut keeps that layout visible, so the wedge self-join below
    // reads both sides in place — no exchange, no sort (plain cut
    // reported UnknownPartitioning and re-shuffled BOTH sides)
    val mw = Materialize.cutAligned(m.join(deg, Seq("__l")))
    val wedges = mw.as("x").join(mw.as("y").hint("shuffle_hash"),
        col("x.__l") === col("y.__l") && col("x.__r") < col("y.__r"))
      .select(col("x.__r").as("a"), col("y.__r").as("b"),
        col("x.__w").as("__w"))
    wedges.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common_neighbors"), sum(col("__w")).as("__aa"))
      .orderBy(col("__aa").desc, col("a").asc, col("b").asc)
      .limit(k)
      .select(col("a"), col("b"), col("common_neighbors"),
        (col("__aa").cast("double") / 1000000.0).as("aa_score"))
  }
}
