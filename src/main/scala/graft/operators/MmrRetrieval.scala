package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Maximal-marginal-relevance diversified retrieval (SURVEY §2 D61) —
  * the classic redundancy-aware re-ranker (Carbonell & Goldstein 1998)
  * RAG stacks run after a relevance leg: greedily pick the document
  * maximizing
  *
  *   mmr(d) = λ·rel(d) − (1−λ)·max_{s∈S} cos(d, s)
  *
  * (max over the already-selected set S; 0 for the first pick), so the
  * result trades relevance against novelty instead of returning k
  * paraphrases of the same passage.
  *
  * Scale story: the RELEVANCE leg is the distributed part — any ANN
  * path (brute force here; IVF/PQ at corpus scale) cuts a top-C
  * candidate pool per query with its own 100 TB posture. The greedy
  * re-rank is inherently sequential in k but touches only the ≤ C
  * pool rows, so it runs INSIDE the executors via
  * `groupByKey(qid).mapGroups` — per-query state is C·(dim+2) floats,
  * millions of queries re-rank in parallel, and nothing
  * corpus-sized ever reaches a single task. (`mapGroups` is the
  * documented escape hatch for genuinely imperative per-group logic —
  * a greedy argmax chain has no relational form that isn't k
  * self-joins.)
  *
  * Determinism / oracle: candidate cosines use the same index-order
  * double fold as [[graft.functions.GraftKernels.cosine]] (IEEE ops
  * are correctly rounded, so DuckDB's `list_reduce` mirror reproduces
  * the same 64 bits), λ-arithmetic is `λ·rel − (1−λ)·ms` left to
  * right with λ = 0.5 (exact dyadic), and every argmax breaks ties on
  * the lower id — the unrolled-CTE oracle replays the greedy loop
  * step for step.
  */
object MmrRetrieval {

  /** Exact cosine of two float vectors — the kernel's fold on plain
    * arrays (index order, double accumulate), for the in-executor
    * greedy.
    */
  private[graft] def cosF(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Greedy MMR selection over a candidate pool.
    *
    * @param pool   (qid, id, rel, vec) — at most `poolCap` rows per
    *               qid (enforced; the re-rank is quadratic in the
    *               pool, so an unbounded pool is a contract bug, not
    *               a slow path)
    * @param k      results per query
    * @param lambda relevance weight in [0,1]
    * @return (qid, id, rel, mmr, rk) — rk 1..k in selection order
    */
  def diversify(spark: SparkSession, pool: DataFrame, k: Int,
                lambda: Double, poolCap: Int = 1024): DataFrame = {
    import spark.implicits._
    val comp = 1.0 - lambda
    pool.select(col("qid").cast("long"), col("id").cast("long"),
        col("rel").cast("double"), col("vec"))
      .as[(Long, Long, Double, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cands = it.toArray
        require(cands.length <= poolCap,
          s"MMR pool for query $qid has ${cands.length} rows (cap $poolCap)")
        val picked = new Array[Boolean](cands.length)
        // true max over the selected set — cosines can be NEGATIVE, so
        // seeding with 0 would silently clamp anti-similar picks; the
        // empty-set case (first pick) contributes 0 explicitly
        val maxSim = Array.fill(cands.length)(Double.NegativeInfinity)
        val out = Vector.newBuilder[(Long, Long, Double, Double, Int)]
        var rk = 1
        val n = math.min(k, cands.length)
        while (rk <= n) {
          var best = -1; var bestScore = 0.0
          var i = 0
          while (i < cands.length) {
            if (!picked(i)) {
              val ms = if (rk == 1) 0.0 else maxSim(i)
              val score = lambda * cands(i)._3 - comp * ms
              if (best < 0 || score > bestScore ||
                  (score == bestScore && cands(i)._2 < cands(best)._2)) {
                best = i; bestScore = score
              }
            }
            i += 1
          }
          picked(best) = true
          out += ((qid, cands(best)._2, cands(best)._3, bestScore, rk))
          // fold the new pick into every survivor's max-similarity
          var j = 0
          while (j < cands.length) {
            if (!picked(j)) {
              val c = cosF(cands(j)._4, cands(best)._4)
              if (c > maxSim(j)) maxSim(j) = c
            }
            j += 1
          }
          rk += 1
        }
        out.result()
      }
      .toDF("qid", "id", "rel", "mmr", "rk")
  }

  /** Brute-force relevance leg + MMR re-rank: top-`poolSize` by exact
    * cosine per query (distributed ranked window), then the greedy
    * diversification. The pool carries its vectors forward so the
    * re-rank never re-reads the corpus.
    */
  def diversifyBruteForce(spark: SparkSession, queries: DataFrame,
                          corpus: DataFrame, k: Int, lambda: Double,
                          poolSize: Int = 50): DataFrame = {
    val scored = corpus.join(broadcast(queries), col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        GraftFunctions.vec_cosine(col("qvec"), col("vec")).as("rel"),
        col("vec"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rel").desc, col("id"))
    val pool = scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= poolSize)
      .drop("__rk")
    diversify(spark, pool, k, lambda, poolCap = poolSize)
  }
}
