package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion of pre-ranked retrieval legs (SURVEY §2
  * D59) — the standard way to combine lexical (BM25) and dense
  * (embedding-cosine) retrieval without score calibration:
  *
  *   rrf(d) = Σ_legs 1 / (k + rank_leg(d)),   absent leg → 0
  *
  * Each leg arrives as `(idCol, rankCol)` with 1-based ranks and is
  * BOUNDED by its own top-N contract (BM25's `LIMIT k`, the ANN
  * kernels' `rk <= k`) — so fusion is a fold of full-outer joins over
  * frames of ≤ N rows each: driver-scale by construction, zero
  * corpus-sized work regardless of corpus size. At 100 TB the cost
  * lives entirely in the legs (which keep their own scale stories —
  * BM25's zero-shuffle plan-literal scoring, IVF/PQ's pruned lists);
  * fusion adds nothing but a ≤ N-row join per leg.
  *
  * Determinism: ranks are exact integers, the fused score is a fixed
  * left-to-right sum of exact-dyadic-free doubles rounded to 9 dp,
  * and the final order ties break on id — the DuckDB oracle mirrors
  * the same CASE/sum/round tree.
  */
object HybridRetrieval {

  /** @param legs   (legName, frame) pairs; each frame has `idCol` and
    *               an integer 1-based `rankCol`; the leg's rank column
    *               surfaces in the output as `<legName>_rank`
    * @param kConst the RRF smoothing constant (60 in the literature)
    * @param topK   rows to keep after fusion
    */
  def rrf(legs: Seq[(String, DataFrame)], idCol: String, rankCol: String,
          kConst: Int = 60, topK: Int = 20): DataFrame = {
    require(legs.size >= 2, "rrf fusion needs at least two legs")
    val parts = legs.map { case (name, d) =>
      d.select(col(idCol), col(rankCol).as(s"${name}_rank"))
    }
    val joined = parts.reduceLeft((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = legs.map { case (name, _) =>
      val r = col(s"${name}_rank")
      when(r.isNotNull, lit(1.0) / (lit(kConst.toDouble) + r.cast("double")))
        .otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    joined
      .withColumn("rrf", round(score, 9))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }
}
