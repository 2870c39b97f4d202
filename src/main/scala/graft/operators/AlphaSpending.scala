package graft.operators

/** Lan–DeMets alpha-spending boundary computation (Lan & DeMets 1983,
  * "Discrete sequential boundaries for clinical trials") — the
  * design-time half of C121's group-sequential monitor: given
  * arbitrary information fractions 0 < t₁ < … < t_K = 1 and a
  * spending function α*(t), the per-look two-sided boundaries u_k
  * solve
  *
  *   P(|Z_1| < u_1, …, |Z_{k−1}| < u_{k−1}, |Z_k| ≥ u_k) =
  *     α*(t_k) − α*(t_{k−1})
  *
  * under the canonical Brownian joint distribution
  * Cov(Z_i, Z_j) = √(t_i/t_j). This is a PURE function of the design
  * constants (fractions, α, spending family) — no data enters — so
  * the boundaries embed into the query plan AND the DuckDB oracle as
  * identical round-trip double literals, exactly like C85's
  * quadrature grid and C86's published OBF constant.
  *
  * Numerics: the Armitage–McPherson–Rowe grid recursion (the method
  * behind every published group-sequential package): the sub-density
  * of Z_k given no earlier crossing propagates across looks by the
  * one-step normal transition Z_k = √(t_{k−1}/t_k)·Z_{k−1} +
  * √((t_k−t_{k−1})/t_k)·ξ, integrated by trapezoid on a fixed
  * [−8, 8] grid (step 0.01 → boundary error ≪ 10⁻⁴, far inside the
  * 6-dp rounding both engines share); u_k by bisection on the
  * monotone exit probability. Look 1 needs no grid (the density is
  * exactly standard normal): u_1 = Φ⁻¹(1 − π_1/2) directly. Φ/Φ⁻¹
  * from commons-math3 (on Spark's runtime classpath) — driver-side
  * only, at plan-build time.
  *
  * Spending families: `obfSpend` is the O'Brien–Fleming-LIKE function
  * α*(t) = min(α, 2(1 − Φ(z_{α/2}/√t))) — α*(1) = α exactly — which
  * reproduces the classical OBF bounds at equal fractions (the
  * AbStatsSpec pin against the published K=5 table) while accepting
  * ANY schedule; `pocockSpend` α·ln(1 + (e−1)t) is the other
  * textbook member, exposed for completeness and spec-pinned.
  */
object AlphaSpending {

  private lazy val stdNormal =
    new org.apache.commons.math3.distribution.NormalDistribution(null, 0.0, 1.0)

  /** Standard normal CDF. */
  def Phi(x: Double): Double = stdNormal.cumulativeProbability(x)

  /** Standard normal quantile. */
  def PhiInv(p: Double): Double = stdNormal.inverseCumulativeProbability(p)

  private def pdf(x: Double): Double =
    math.exp(-0.5 * x * x) / math.sqrt(2.0 * math.Pi)

  /** Two-sided O'Brien–Fleming-like spending function (Lan & DeMets
    * 1983): each SIDE spends the one-sided OBF function at α/2 —
    * 2(1 − Φ(z_{(α/2)/2}/√t)) per side — so the two-sided total is
    * α*(t) = min(α, 4(1 − Φ(Φ⁻¹(1 − α/4)/√t))); α*(1) = 4·(α/4) = α
    * exactly. This is the convention behind the published boundary
    * tables (R `ldbounds` iuse=1 / gsDesign `sfLDOF` applied per
    * side), which the AbStatsSpec K=5 pin verifies.
    */
  def obfSpend(alpha: Double)(t: Double): Double = {
    require(t > 0 && t <= 1, s"t in (0,1], got $t")
    val za = PhiInv(1.0 - alpha / 4.0)
    math.min(alpha, 4.0 * (1.0 - Phi(za / math.sqrt(t))))
  }

  /** Pocock-like spending function: α*(t) = α·ln(1 + (e−1)·t). */
  def pocockSpend(alpha: Double)(t: Double): Double = {
    require(t > 0 && t <= 1, s"t in (0,1], got $t")
    alpha * math.log(1.0 + (math.E - 1.0) * t)
  }

  /** Kim–DeMets power-family spending (Kim & DeMets 1987):
    * α*(t) = α·t^ρ. ρ = 1 spends linearly; ρ ≈ 3 approximates OBF.
    */
  def powerSpend(alpha: Double, rho: Double)(t: Double): Double = {
    require(t > 0 && t <= 1, s"t in (0,1], got $t")
    require(rho > 0, s"rho must be positive, got $rho")
    alpha * math.pow(t, rho)
  }

  /** Hwang–Shih–DeCani gamma-family spending (HSD 1990):
    * α*(t) = α·(1 − e^(−γt))/(1 − e^(−γ)) for γ ≠ 0 (γ → 0 is the
    * linear spend α·t). γ ≈ −4 approximates OBF; γ ≈ 1 approximates
    * Pocock — one dial sweeps the whole conservative↔aggressive
    * spectrum.
    */
  def hsdSpend(alpha: Double, gamma: Double)(t: Double): Double = {
    require(t > 0 && t <= 1, s"t in (0,1], got $t")
    if (math.abs(gamma) < 1e-12) alpha * t
    else alpha * (1.0 - math.exp(-gamma * t)) / (1.0 - math.exp(-gamma))
  }

  private val ZMAX = 8.0
  private val GRID = 1601 // step 0.01

  /** Two-sided boundaries u_1..u_K for the given information
    * fractions (strictly increasing, last = 1.0) under `spend`.
    * A look whose spending increment is numerically zero gets the
    * grid-edge bound 8.0 (unreachable — no alpha to spend there).
    */
  def bounds(fracs: Seq[Double], alpha: Double,
             spend: Double => Double): Seq[Double] = {
    require(fracs.nonEmpty, "need at least one look")
    require(fracs.forall(t => t > 0 && t <= 1.0),
      s"fractions in (0,1]: $fracs")
    require(fracs.zip(fracs.tail).forall { case (a, b) => a < b },
      s"fractions strictly increasing: $fracs")
    require(math.abs(fracs.last - 1.0) < 1e-12,
      s"final fraction must be 1.0, got ${fracs.last}")
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    val dz = 2.0 * ZMAX / (GRID - 1)
    val grid = Array.tabulate(GRID)(i => -ZMAX + i * dz)
    var h: Array[Double] = null // sub-density at the current look
    var tPrev = 0.0
    var spent = 0.0
    val out = Seq.newBuilder[Double]
    fracs.foreach { t =>
      val target =
        math.max(0.0, math.min(alpha, spend(t)) - spent)
      h =
        if (h == null) grid.map(pdf) // look 1: exactly N(0,1)
        else {
          val a = math.sqrt(tPrev / t)
          val s = math.sqrt((t - tPrev) / t)
          val prev = h
          Array.tabulate(GRID) { i =>
            val z = grid(i)
            var acc = 0.0
            var j = 0
            while (j < GRID) {
              val w = if (j == 0 || j == GRID - 1) 0.5 else 1.0
              val pj = prev(j)
              if (pj != 0.0) acc += w * pj * pdf((z - a * grid(j)) / s)
              j += 1
            }
            acc * dz / s
          }
        }
      // prefix trapezoid integral of h over the grid
      val cum = new Array[Double](GRID)
      var i = 1
      while (i < GRID) {
        cum(i) = cum(i - 1) + 0.5 * (h(i - 1) + h(i)) * dz
        i += 1
      }
      def cumAt(x: Double): Double = { // linear interpolation
        val pos = (x + ZMAX) / dz
        val lo = math.max(0, math.min(GRID - 2, pos.toInt))
        val frac = pos - lo
        cum(lo) + frac * (cum(lo + 1) - cum(lo))
      }
      val total = cum(GRID - 1)
      def exitP(u: Double): Double = total - (cumAt(u) - cumAt(-u))
      val u =
        if (tPrev == 0.0 && target > 1e-12)
          PhiInv(1.0 - target / 2.0) // look 1: closed form, no grid
        else if (target <= 1e-12) ZMAX
        else {
          var lo = 0.0; var hi = ZMAX
          var it = 0
          while (it < 200) { // exitP is monotone decreasing in u
            val mid = 0.5 * (lo + hi)
            if (exitP(mid) > target) lo = mid else hi = mid
            it += 1
          }
          0.5 * (lo + hi)
        }
      out += u
      i = 0
      while (i < GRID) { // absorb the crossed region for the next look
        if (math.abs(grid(i)) >= u) h(i) = 0.0
        i += 1
      }
      spent += target
      tPrev = t
    }
    out.result()
  }

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

  /** Boundaries for integer-percent fractions under any spending
    * function, rounded to the 6-dp literals both the plan and the
    * oracle embed.
    */
  def boundsRounded(fracPct: Seq[Int], alpha: Double,
                    spend: Double => Double): Seq[Double] =
    bounds(fracPct.map(_ / 100.0), alpha, spend).map(r6)

  /** Cumulative alpha spent at each look (the report column), same
    * 6-dp literal treatment.
    */
  def spendRounded(fracPct: Seq[Int], alpha: Double,
                   spend: Double => Double): Seq[Double] =
    fracPct.map(p => r6(math.min(alpha, spend(p / 100.0))))

  /** OBF-spending boundaries (the default family). */
  def obfBoundsRounded(fracPct: Seq[Int], alpha: Double): Seq[Double] =
    boundsRounded(fracPct, alpha, obfSpend(alpha))

  /** OBF cumulative spend at each look. */
  def obfSpendRounded(fracPct: Seq[Int], alpha: Double): Seq[Double] =
    spendRounded(fracPct, alpha, obfSpend(alpha))
}
