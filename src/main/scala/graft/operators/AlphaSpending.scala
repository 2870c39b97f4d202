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
  * [−8, 8] grid (step 0.01; crossing-region absorption zeroes h at
  * grid NODES, so up to ~h(u)·dz/2 of mass per look lands on the
  * wrong side of u — accuracy vs published tables is pinned at 0.02
  * in AbStatsSpec, and plan/oracle parity is unaffected because both
  * embed the same literals); u_k by bisection on the monotone exit
  * probability. Look 1 needs no grid (the density is
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
    * 6-dp literal treatment. Derived from the SAME clamped running
    * total `bounds()` accounts (increments floored at 0), so a
    * non-monotone user-supplied spend function cannot make the
    * reported alpha_spent disagree with the spending the boundaries
    * actually used; for every monotone family (all built-ins) this
    * equals min(α, α*(t)) exactly.
    */
  def spendRounded(fracPct: Seq[Int], alpha: Double,
                   spend: Double => Double): Seq[Double] = {
    var spent = 0.0
    fracPct.map { p =>
      spent += math.max(0.0, math.min(alpha, spend(p / 100.0)) - spent)
      r6(spent)
    }
  }

  /** Boundaries at ARBITRARY (data-derived) information fractions,
    * rounded to the 6-dp literal form — the C123 information-based
    * monitor's face (the schedule is still calendar ranks; only the
    * spending clock is the observed fraction).
    */
  def boundsRoundedAt(fracs: Seq[Double], alpha: Double,
                      spend: Double => Double): Seq[Double] =
    bounds(fracs, alpha, spend).map(r6)

  /** Cumulative spend at arbitrary fractions, clamped running total,
    * 6-dp literals.
    */
  def spendRoundedAt(fracs: Seq[Double], alpha: Double,
                     spend: Double => Double): Seq[Double] = {
    var spent = 0.0
    fracs.map { t =>
      spent += math.max(0.0, math.min(alpha, spend(t)) - spent)
      r6(spent)
    }
  }

  /** Round to the 6-dp literal form (the plan/oracle embedding). */
  def round6(x: Double): Double = r6(x)

  /** OBF-spending boundaries (the default family). */
  def obfBoundsRounded(fracPct: Seq[Int], alpha: Double): Seq[Double] =
    boundsRounded(fracPct, alpha, obfSpend(alpha))

  /** OBF cumulative spend at each look. */
  def obfSpendRounded(fracPct: Seq[Int], alpha: Double): Seq[Double] =
    spendRounded(fracPct, alpha, obfSpend(alpha))

  // ---- one-sided + futility (beta-spending) designs (C122) ----------------

  /** One-sided O'Brien–Fleming-like spending: α*(t) = min(α,
    * 2(1 − Φ(Φ⁻¹(1 − α/2)/√t))) — the `ldbounds` iuse=1 / gsDesign
    * `sfLDOF` function itself; α*(1) = α exactly.
    */
  def obfSpendOneSided(alpha: Double)(t: Double): Double = {
    require(t > 0 && t <= 1, s"t in (0,1], got $t")
    val za = PhiInv(1.0 - alpha / 2.0)
    math.min(alpha, 2.0 * (1.0 - Phi(za / math.sqrt(t))))
  }

  /** ONE-SIDED upper boundaries u_1..u_K: P(no earlier UPPER crossing,
    * Z_k ≥ u_k) = α*(t_k) − α*(t_{k−1}) under the canonical Brownian
    * law. Same grid recursion as [[bounds]] with upper-only absorption
    * (the lower tail keeps propagating — one-sided designs never stop
    * for a low Z unless a futility bound says so).
    */
  def boundsOneSided(fracs: Seq[Double], alpha: Double,
                     spend: Double => Double): Seq[Double] = {
    val (ub, _, _) = oneSidedRecursion(fracs, alpha, spend, drift = 0.0,
      lowerTargets = null)
    ub
  }

  /** Non-binding futility design (the gsDesign test.type=4 shape —
    * Pampallona & Tsiatis 1994 lineage): ONE-SIDED efficacy bounds
    * u_k from `spendA` alpha-spending computed IGNORING futility
    * (non-binding: overrunning an ignored futility bound can never
    * inflate type-I error), futility bounds l_k from `spendB`
    * beta-spending under the alternative drift θ —
    * P_θ(continue through k−1, Z_k ≤ l_k) = β*(t_k) − β*(t_{k−1}) —
    * with θ solved so the design closes: l_K = u_K (all β is spent
    * exactly when the final look decides), hence power = 1 − β at θ
    * by construction. θ is the standardized effect the trial is
    * powered for (E[Z_K] = θ since t_K = 1).
    *
    * All outputs are pure functions of the design constants
    * (fractions, α, β, spending families) — they embed into plan and
    * oracle as identical round-trip literals, the C121 discipline.
    */
  case class FutilityDesign(upper: Seq[Double], lower: Seq[Double],
                            drift: Double, alphaSpent: Seq[Double],
                            betaSpent: Seq[Double])

  def futilityBounds(fracs: Seq[Double], alpha: Double, beta: Double,
                     spendA: Double => Double,
                     spendB: Double => Double): FutilityDesign = {
    require(beta > 0 && beta < 1, s"beta in (0,1), got $beta")
    val upper = boundsOneSided(fracs, alpha, spendA)
    val betaTargets = clampedIncrements(fracs, beta, spendB)
    // Closure condition: at the FINAL look, the no-earlier-decision
    // sub-density mass sitting BELOW u_K (= the probability of
    // accepting H0 there) must equal the remaining β increment. That
    // mass is monotone DECREASING in θ (a larger drift pushes paths
    // across the efficacy bounds), so gap(θ) = βTarget_K − mass(θ) is
    // monotone increasing; bisect θ until the design closes.
    def lastGap(theta: Double): Double = {
      val (_, _, belowU) = oneSidedRecursion(fracs, alpha, spendA, theta,
        lowerTargets = betaTargets, fixedUpper = upper)
      betaTargets.last - belowU
    }
    var lo = 0.0; var hi = 8.0
    require(lastGap(hi) > 0.0,
      s"futility design infeasible: even drift=8 cannot close it")
    require(lastGap(0.0) < 0.0,
      s"futility design degenerate: closes at drift 0")
    var it = 0
    while (it < 60) { // 8·2⁻⁶⁰ — far inside the 6-dp literal rounding
      val mid = 0.5 * (lo + hi)
      if (lastGap(mid) < 0.0) lo = mid else hi = mid
      it += 1
    }
    val theta = 0.5 * (lo + hi)
    val (_, lower, _) = oneSidedRecursion(fracs, alpha, spendA, theta,
      lowerTargets = betaTargets, fixedUpper = upper)
    lower.init.lazyZip(upper.init).lazyZip(fracs.init).foreach { (l, u, t) =>
      require(l < u, s"futility bound crosses efficacy before the final " +
        s"look (l=$l, u=$u at t=$t) — infeasible schedule/spending pair")
    }
    FutilityDesign(
      upper,
      lower.init :+ upper.last, // close exactly: the final look decides
      theta,
      { var s = 0.0
        fracs.map { t => s += math.max(0.0, math.min(alpha, spendA(t)) - s); s } },
      { var s = 0.0; betaTargets.map { d => s += d; s } })
  }

  /** 6-dp-literal face of [[futilityBounds]] for integer-percent
    * schedules (the plan/oracle embedding form).
    */
  def futilityBoundsRounded(fracPct: Seq[Int], alpha: Double, beta: Double,
                            spendA: Double => Double,
                            spendB: Double => Double): FutilityDesign = {
    val d = futilityBounds(fracPct.map(_ / 100.0), alpha, beta, spendA, spendB)
    FutilityDesign(d.upper.map(r6), d.lower.map(r6), r6(d.drift),
      d.alphaSpent.map(r6), d.betaSpent.map(r6))
  }

  /** Memoized [[futilityBoundsRounded]] — the design recursion costs a
    * few seconds of driver-side quadrature (60 drift bisections × the
    * K-look grid), paid once per design key per JVM; the bench's
    * repeated invocations and the Verify dump then hit the cache. The
    * key must encode every design constant the caller varies
    * (functions are not hashable).
    */
  private val futilityCache =
    new java.util.concurrent.ConcurrentHashMap[String, FutilityDesign]()

  def futilityBoundsCached(key: String, fracPct: Seq[Int], alpha: Double,
                           beta: Double, spendA: Double => Double,
                           spendB: Double => Double): FutilityDesign =
    futilityCache.computeIfAbsent(key,
      _ => futilityBoundsRounded(fracPct, alpha, beta, spendA, spendB))

  private def clampedIncrements(fracs: Seq[Double], total: Double,
                                spend: Double => Double): Seq[Double] = {
    var spent = 0.0
    fracs.map { t =>
      val inc = math.max(0.0, math.min(total, spend(t)) - spent)
      spent += inc; inc
    }
  }

  /** The shared one-sided grid recursion. Propagates the sub-density
    * of Z_k given no earlier decision under drift θ (H0 when θ = 0);
    * at each look solves the upper bound u_k for the alpha increment
    * (or takes `fixedUpper` — the non-binding case re-running under
    * H1), then, when `lowerTargets` is given, the lower bound l_k for
    * the beta increment at INTERIOR looks (the final look's lower
    * bound IS u_K by the closure definition); absorbs the decided
    * regions and moves on. Returns (upper, lower, finalBelowU) where
    * finalBelowU is the final look's no-earlier-decision mass below
    * u_K — the accept-H0 probability the drift bisection targets.
    */
  private def oneSidedRecursion(fracs: Seq[Double], alpha: Double,
                                spend: Double => Double, drift: Double,
                                lowerTargets: Seq[Double],
                                fixedUpper: Seq[Double] = null)
      : (Seq[Double], Seq[Double], Double) = {
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
    val alphaTargets = clampedIncrements(fracs, alpha, spend)
    var h: Array[Double] = null
    var tPrev = 0.0
    var finalBelowU = 0.0
    val ub = Seq.newBuilder[Double]
    val lb = Seq.newBuilder[Double]
    fracs.zipWithIndex.foreach { case (t, kIdx) =>
      val mShift = // conditional mean shift of the Brownian increment
        if (tPrev == 0.0) drift * math.sqrt(t)
        else drift * (t - tPrev) / math.sqrt(t)
      h =
        if (h == null) grid.map(z => pdf(z - mShift)) // look 1: N(θ√t₁, 1)
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
              if (pj != 0.0) acc += w * pj * pdf((z - a * grid(j) - mShift) / s)
              j += 1
            }
            acc * dz / s
          }
        }
      val cum = new Array[Double](GRID)
      var i = 1
      while (i < GRID) {
        cum(i) = cum(i - 1) + 0.5 * (h(i - 1) + h(i)) * dz
        i += 1
      }
      def cumAt(x: Double): Double = {
        val pos = (x + ZMAX) / dz
        val lo = math.max(0, math.min(GRID - 2, pos.toInt))
        val frac = pos - lo
        cum(lo) + frac * (cum(lo + 1) - cum(lo))
      }
      val total = cum(GRID - 1)
      // ---- upper (efficacy) bound
      val aTarget = alphaTargets(kIdx)
      val u =
        if (fixedUpper != null) fixedUpper(kIdx)
        else if (aTarget <= 1e-12) ZMAX
        else if (tPrev == 0.0) PhiInv(1.0 - aTarget) // closed form (θ=0 here)
        else {
          var lo = 0.0; var hi = ZMAX
          var it = 0
          while (it < 200) { // upper-exit mass is monotone decreasing in u
            val mid = 0.5 * (lo + hi)
            if (total - cumAt(mid) > aTarget) lo = mid else hi = mid
            it += 1
          }
          0.5 * (lo + hi)
        }
      ub += u
      val isLast = kIdx == fracs.size - 1
      if (isLast) finalBelowU = cumAt(u)
      // ---- lower (futility) bound (interior looks only — at the
      // final look the design's lower bound IS u_K)
      if (lowerTargets != null) {
        val l =
          if (isLast) u
          else {
            val bTarget = lowerTargets(kIdx)
            if (bTarget <= 1e-12) -ZMAX
            else if (tPrev == 0.0) mShift + PhiInv(bTarget) // N(θ√t₁,1) quantile
            else {
              var lo = -ZMAX; var hi = u
              var it = 0
              while (it < 200) { // lower mass is monotone increasing in l
                val mid = 0.5 * (lo + hi)
                if (cumAt(mid) < bTarget) lo = mid else hi = mid
                it += 1
              }
              0.5 * (lo + hi)
            }
          }
        lb += l
        i = 0
        while (i < GRID) { // absorb BOTH decided regions
          if (grid(i) >= u || grid(i) <= l) h(i) = 0.0
          i += 1
        }
      } else {
        i = 0
        while (i < GRID) { // absorb the efficacy region only
          if (grid(i) >= u) h(i) = 0.0
          i += 1
        }
      }
      tPrev = t
    }
    (ub.result(), if (lowerTargets != null) lb.result() else null,
      finalBelowU)
  }
}
