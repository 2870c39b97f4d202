package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage scoring (Fellegi &
  * Sunter 1969; Winkler 1988's frequency-based u-probabilities) —
  * SURVEY §2 D120.
  *
  * The classical linkage ledger: for each comparison field, the
  * agreement weight is ln(m/u) and the disagreement weight
  * ln((1−m)/(1−u)), where m = P(field agrees | true match) is a
  * declared prior (the published no-training-data convention) and
  * u = P(field agrees | random non-match) is ESTIMATED FROM THE DATA
  * as the collision probability of the field's empirical distribution
  * u = Σ_v (n_v/N)² — rare values earn large agreement weights, common
  * values small ones, which is exactly why FS beats naive
  * count-the-agreements scoring. A candidate pair's score is the sum
  * of its per-field weights; high scores link, low scores reject.
  *
  * Scale shape: u-statistics are one tiny groupBy per field
  * (value-domain-sized, broadcast back as ONE row); candidate pairs
  * come from equality blocking on the caller's key — the standard FS
  * deployment shape (never all-pairs; the within-block self-join is
  * the same C76/C29 cost class, and the block key choice is the dial).
  * Determinism: Σn_v² and N are exact integers; each weight is one
  * IEEE evaluation over them, shared across every pair via a
  * broadcast; the pair score folds the k fields in FIXED declaration
  * order (one IEEE tree); ordering cuts on the 6-dp-rounded score
  * with (id_a, id_b) tiebreaks, so both engines cut identically.
  * Null field values compare null-safely (null agrees with null).
  */
object FellegiSunter {

  /** Score blocked candidate pairs with the FS weight ledger.
    *
    * @param entities one row per record
    * @param idCol    unique BIGINT record id
    * @param blockKey equality-blocking expression (candidate pairs
    *                 share it; choose so blocks stay bounded)
    * @param fields   (name, valueExpr, mPrior) per comparison field;
    *                 mPrior in (0,1) exclusive
    * @param k        published top-k pairs (score desc, id asc ties)
    */
  def score(entities: DataFrame, idCol: String, blockKey: Column,
            fields: Seq[(String, Column, Double)], k: Int): DataFrame = {
    require(fields.nonEmpty && fields.size <= 8,
      s"need 1..8 fields, got ${fields.size}")
    require(fields.forall(f => f._3 > 0.0 && f._3 < 1.0),
      "m priors must be in (0,1)")
    require(k >= 1, s"k must be >= 1, got $k")
    val ent = Materialize.cut(entities.select(
      Seq(col(idCol).cast("long").as("__id"), blockKey.as("__blk")) ++
        fields.map { case (n, c, _) => c.as(s"__f_$n") }: _*))
    // one-row u-statistics frame: N once, Σn_v² per field
    val n = ent.agg(count(lit(1)).cast("long").as("__n"))
    val stats = fields.map { case (fname, _, _) =>
      ent.groupBy(col(s"__f_$fname")).agg(count(lit(1)).as("__c"))
        .agg(sum(col("__c") * col("__c")).cast("long").as(s"__ss_$fname"))
    }.foldLeft(n)((acc, s) => acc.crossJoin(s))
    val a = ent.select(
      Seq(col("__id").as("id_a"), col("__blk").as("__ba")) ++
        fields.map { case (fn, _, _) => col(s"__f_$fn").as(s"__a_$fn") }: _*)
    val b = ent.select(
      Seq(col("__id").as("id_b"), col("__blk").as("__bb")) ++
        fields.map { case (fn, _, _) => col(s"__f_$fn").as(s"__b_$fn") }: _*)
    val pairs = a.join(b,
        col("__ba") === col("__bb") && col("id_a") < col("id_b"))
      .crossJoin(broadcast(stats))
    val nD = col("__n").cast("double")
    def u(fname: String): Column =
      col(s"__ss_$fname").cast("double") / (nD * nD)
    val terms = fields.map { case (fname, _, m) =>
      val agree = col(s"__a_$fname") <=> col(s"__b_$fname")
      val wa = log(lit(m) / u(fname))
      // 1−m as an IN-PLAN subtraction (not a Scala-folded literal) so
      // the oracle's `1.0 - 0.95` evaluates the identical IEEE tree
      val wd = log((lit(1.0) - lit(m)) / (lit(1.0) - u(fname)))
      (agree.as(s"agree_$fname"), when(agree, wa).otherwise(wd))
    }
    val scoreCol = terms.map(_._2).reduce(_ + _)
    pairs.select(Seq(col("id_a"), col("id_b")) ++ terms.map(_._1) ++
        Seq(round(scoreCol, 6).as("score")): _*)
      .orderBy(col("score").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** EM-estimated FS parameters (SURVEY §2 D131). */
  final case class EmParams(p: Double, m: Seq[Double], u: Seq[Double])

  /** Jaro (1989) / Winkler (1988): estimate (p, m_j, u_j) by EM over
    * the agreement-PATTERN census of the candidate pairs, under the
    * standard conditional-independence (naive-Bayes) latent-class
    * model — the no-training-data route to FS weights: instead of
    * DECLARING m priors (as [[score]] does) the two-class mixture is
    * fit to the observed pattern frequencies.
    *
    *   E-step: w_γ = p·Π_j m_j^{γ_j}(1−m_j)^{1−γ_j} /
    *                 (that + (1−p)·Π_j u_j^{γ_j}(1−u_j)^{1−γ_j})
    *   M-step: p  = Σ n_γ w_γ / N
    *           m_j = Σ_{γ_j=1} n_γ w_γ / Σ n_γ w_γ
    *           u_j = Σ_{γ_j=1} n_γ (1−w_γ) / Σ n_γ (1−w_γ)
    *
    * Scale shape: the E/M recursion runs DRIVER-SIDE over the ≤ 2^k
    * pattern rows (k ≤ 8 fields ⇒ ≤ 256 rows — the corpus never
    * leaves the cluster; only its exact-integer pattern census does,
    * the same discipline as [[AlphaSpending]]'s design recursion).
    * Determinism: callers pass the census in a CANONICAL order (sort
    * by the boolean pattern), the iteration count is fixed, and every
    * accumulation is a fixed-order fold — bit-stable across runs, so
    * the estimates embed as plan/oracle literals. Estimates are
    * clamped to [1e-6, 1−1e-6] (the published practice) so the log
    * weights stay finite even when EM drives a parameter to the
    * boundary.
    */
  def emEstimate(patterns: Seq[(Seq[Boolean], Long)],
                 iters: Int = 30): EmParams = {
    require(patterns.nonEmpty, "pattern census must be non-empty")
    val k = patterns.head._1.size
    require(patterns.forall(_._1.size == k), "ragged pattern census")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    def clamp(x: Double): Double = math.min(1.0 - 1e-6, math.max(1e-6, x))
    var p = 0.1
    val m = Array.fill(k)(0.9)
    val u = Array.fill(k)(0.1)
    var it = 0
    while (it < iters) {
      var sw = 0.0
      var sn = 0.0
      var suTot = 0.0
      val swg = new Array[Double](k)
      val sug = new Array[Double](k)
      patterns.foreach { case (g, n) =>
        var pm = p
        var pu = 1.0 - p
        var j = 0
        while (j < k) {
          pm *= (if (g(j)) m(j) else 1.0 - m(j))
          pu *= (if (g(j)) u(j) else 1.0 - u(j))
          j += 1
        }
        val w = pm / (pm + pu)
        val nd = n.toDouble
        sw += w * nd
        sn += nd
        suTot += (1.0 - w) * nd
        j = 0
        while (j < k) {
          if (g(j)) { swg(j) += w * nd; sug(j) += (1.0 - w) * nd }
          j += 1
        }
      }
      p = clamp(sw / sn)
      var j = 0
      while (j < k) {
        m(j) = clamp(swg(j) / sw)
        u(j) = clamp(sug(j) / suTot)
        j += 1
      }
      it += 1
    }
    EmParams(p, m.toSeq, u.toSeq)
  }

  private val emCache =
    new java.util.concurrent.ConcurrentHashMap[String, EmParams]()

  /** Session-memoized EM fit — the same (key → params) discipline as
    * IvfIndex.trainCached, so the query dump and the dynamic oracle
    * render see IDENTICAL literals without re-collecting the census.
    */
  def emCached(key: String)(compute: => EmParams): EmParams =
    emCache.computeIfAbsent(key, _ => compute)
}
