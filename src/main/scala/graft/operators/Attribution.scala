package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov-chain removal-effect attribution (SURVEY §2.C57).
  *
  * The data-driven alternative to first/last-touch rules (C21/E18's
  * funnels): model user journeys as a first-order Markov chain over
  * channels with absorbing CONVERSION/DROP states, then credit each
  * channel by its REMOVAL EFFECT (Anderl et al. 2014) — how much the
  * chain's conversion probability falls when that channel is knocked
  * out. A channel that merely appears in many converting paths but
  * is always bypassable earns little; a channel every converting
  * path must traverse earns most.
  *
  * Removal is evaluated WITHOUT rebuilding the chain: knocking out
  * channel c is exactly the full-chain absorption iteration with
  * `p(c) ≡ 0` (transitions into c then contribute nothing, which is
  * the "entering c fails the journey" semantics), so one transition
  * matrix serves every variant.
  *
  * Determinism — journeys cut at the FIRST conversion under a total
  * per-user order (ts, then a caller tiebreak), so path extraction
  * is order-unambiguous; the absorption fixed point runs in integer
  * micro-units (`(Σ c(v,u)·p(u) + c(v,CONV)·SCALE) DIV total(v)`,
  * monotone non-decreasing from p₀ = 0, every step exact), so a
  * fixed iteration count is engine-independent and the DuckDB
  * oracle unrolls it with the identical integer arithmetic.
  *
  * Scale shape — the corpus-sized work is ONE per-user window pass
  * (rank + lead over (user, ts); per-user partitions, never global)
  * and one partial-agg'd `groupBy(src, dst)` whose output is the
  * transition matrix: ≤ (|channels|+1)·(|channels|+2) rows,
  * aggregate-sized by construction. The fixed point then runs on
  * that matrix driver-side (the Resample/Doremi state bound:
  * |channels| rows, not data). No corpus-sized collect.
  */
object Attribution {

  val Scale = 1000000000L
  val StartState = "__START__"
  val ConvState = "__CONV__"
  val NullState = "__NULL__"

  /** Per-journey transition extraction: one row per (src, dst) pair
    * with counts. Exposed for tests.
    */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
                  tieCol: String, typeCol: String,
                  convType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    // a null event type must stay a (sentinel) channel — the bare
    // column would null out the =!=/=== comparisons below and
    // silently unlink the journey around it
    val ranked = events.select(col(userCol).as("u"),
        coalesce(col(typeCol).cast("string"), lit("__missing__")).as("t"),
        row_number().over(w).as("rn"))
    // journey = events up to and including the FIRST conversion
    val firstConv = ranked.where(col("t") === convType)
      .groupBy(col("u")).agg(min(col("rn")).as("cut"))
    val kept = ranked.join(firstConv, Seq("u"), "left")
      .where(col("cut").isNull || col("rn") <= col("cut"))
    val w2 = Window.partitionBy(col("u")).orderBy(col("rn"))
    val withNext = kept.withColumn("nxt", lead(col("t"), 1).over(w2))
    // src = the transient state; dst folds the absorbers in
    val stepDst = when(col("nxt").isNull,
        when(col("t") === convType, lit(null)).otherwise(lit(NullState)))
      .otherwise(when(col("nxt") === convType, lit(ConvState))
        .otherwise(col("nxt")))
    val steps = withNext
      .where(col("t") =!= convType) // the conversion row emits nothing
      .select(col("t").as("src"), stepDst.as("dst"))
      .where(col("dst").isNotNull)
    val starts = kept.where(col("rn") === 1)
      .select(lit(StartState).as("src"),
        when(col("t") === convType, lit(ConvState)).otherwise(col("t"))
          .as("dst"))
    starts.unionAll(steps)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
  }

  /** The integer absorption fixed point over a collected matrix.
    * `dead` states are treated as knocked out (p ≡ 0).
    */
  private def absorb(counts: Map[(String, String), Long],
                     transients: Seq[String], iterations: Int,
                     dead: Set[String]): Map[String, Long] = {
    val live = transients.filterNot(dead)
    val tot = transients.map { v =>
      v -> counts.collect { case ((s, _), n) if s == v => n }.sum
    }.toMap
    // the inflow sum is bounded by tot(v)·SCALE in Long arithmetic —
    // fail loudly instead of wrapping silently past ~9.2e9 transitions
    // out of one state (shard journeys by epoch before that point)
    tot.valuesIterator.foreach(t => require(t <= Long.MaxValue / Scale,
      s"transition total $t would overflow the integer fixed point; " +
        "shard the journey window"))
    var p = live.map(_ -> 0L).toMap
    var it = 0
    while (it < iterations) {
      p = live.map { v =>
        val inflow = live.foldLeft(0L) { (acc, u) =>
          acc + counts.getOrElse((v, u), 0L) * p(u)
        } + counts.getOrElse((v, ConvState), 0L) * Scale
        v -> (if (tot(v) == 0L) 0L else inflow / tot(v))
      }.toMap
      it += 1
    }
    p
  }

  /** Removal-effect attribution over user journeys.
    *
    * @return one row per channel (non-conversion event type):
    *         (channel, removal_micro, share) — `removal_micro` the
    *         integer micro-unit conversion-probability drop when the
    *         channel is knocked out, `share` the 6-dp normalized
    *         attribution (0.0 everywhere if no removal bites).
    */
  def markovRemoval(events: DataFrame, userCol: String, tsCol: String,
                    tieCol: String, typeCol: String, convType: String,
                    iterations: Int = 12,
                    channelsHint: Option[Seq[String]] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val spark = events.sparkSession
    val tm = transitions(events, userCol, tsCol, tieCol, typeCol, convType)
    // aggregate-sized collect: the transition matrix
    val counts = tm.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // channels: from the hint (a fixed vocabulary keeps the output —
    // and the oracle — stable even when a channel is absent at a
    // given sf) or observed from the matrix
    val channels = channelsHint.map(_.distinct.sorted).getOrElse(
      counts.keysIterator
        .flatMap { case (s, d) => Seq(s, d) }
        .filter(s => s != StartState && s != ConvState && s != NullState)
        .toSeq.distinct.sorted)
    val transients = StartState +: channels
    val full = absorb(counts, transients, iterations, Set.empty)
    val base = full(StartState)
    val removals = channels.map { c =>
      val pc = absorb(counts, transients, iterations, Set(c))(StartState)
      c -> math.max(0L, base - pc)
    }
    val totR = removals.foldLeft(0L)(_ + _._2)
    import spark.implicits._
    removals.map { case (c, r) =>
      val share =
        if (totR == 0L) 0.0
        else BigDecimal(r.toDouble / totR.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (c, r, share)
    }.toDF("channel", "removal_micro", "share")
  }

  /** C83: exact Shapley-value attribution (Shapley 1953, the
    * coalition-game credit behind "data-driven attribution" in every
    * major ads platform) — the game-theoretic counterpart to C57's
    * removal effect: v(S) = conversions among users who touched ONLY
    * channels in S before converting, and channel i earns
    * φ_i = Σ_{S ⊆ N∖{i}} |S|!·(n−|S|−1)!/n! · [v(S∪{i}) − v(S)].
    * Exact (not sampled) because n = |channels| is small — the 2ⁿ
    * coalition table is aggregate-sized by construction.
    *
    * Scale shape: ONE per-user aggregation collapses the corpus to a
    * 2ⁿ-row (mask, conversions) frame; v(S), the marginals, and the
    * weighted sum are joins over ≤ 2ⁿ·2ⁿ literal-range rows — never
    * corpus-sized. Exactness: weights scale by n! so every term is
    * INTEGER; the published shapley/share are one IEEE divide each.
    *
    * Efficiency axiom as a built-in audit: Σφ_i = v(N) − v(∅)
    * (conversions with no prior touch earn nobody credit).
    */
  def shapley(events: DataFrame, userCol: String, tsCol: String,
              tieCol: String, typeCol: String, convType: String,
              channels: Seq[String]): DataFrame = {
    val n = channels.distinct.length
    require(n == channels.length && n >= 1 && n <= 8,
      s"need 1..8 distinct channels, got $channels")
    val sorted = channels.sorted
    val spark = events.sparkSession
    // factorial weights ×n! — exact integers
    def fact(k: Int): Long = (1 to k).foldLeft(1L)(_ * _)
    val wBySize = (0 until n).map(s => fact(s) * fact(n - s - 1))
    // ONE corpus scan: the first-conversion instant rides a per-user
    // window (same partitioning the mask groupBy reuses — no second
    // exchange), and "strictly before it" gates each channel bit
    // inside the aggregate. Converters with no prior touch aggregate
    // to mask 0 (they fund v(∅), earning nobody credit, which keeps
    // Σφ = v(N) − v(∅) honest); non-converters filter out on the
    // null window minimum.
    val u = col(userCol)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(u)
    val convAt = min(when(col(typeCol) === convType,
      struct(col(tsCol), col(tieCol)))).over(w)
    val bits = sorted.zipWithIndex.map { case (c, i) =>
      max(when(col(typeCol) === c &&
          struct(col(tsCol), col(tieCol)) < col("__conv_at"),
        1L).otherwise(0L)) * (1L << i)
    }
    val cnt = events.withColumn("__conv_at", convAt)
      .filter(col("__conv_at").isNotNull)
      .groupBy(u.as("__u")).agg(bits.reduce(_ + _).as("m"))
      .groupBy(col("m")).agg(count(lit(1)).as("cnt"))
    val full = (1L << n) - 1
    val coal = spark.range(1L << n).select(col("id").as("s"))
    // v(S) = conversions whose touched set ⊆ S
    val v = coal.join(cnt,
      (col("m").bitwiseAND(lit(full) - col("s"))) === 0L, "left")
      .groupBy(col("s")).agg(coalesce(sum(col("cnt")), lit(0L)).as("v"))
    val vCut = Materialize.cut(v) // 2ⁿ rows, read n+2 times below
    val chan = sorted.zipWithIndex
      .map { case (c, i) => (c, 1L << i) }
      .foldLeft(Option.empty[DataFrame]) { case (acc, (c, b)) =>
        val df = spark.range(1).select(lit(c).as("channel"), lit(b).as("bit"))
        Some(acc.map(_.unionByName(df)).getOrElse(df))
      }.get
    val wExpr = wBySize.zipWithIndex.foldLeft(lit(0L)) { case (acc, (w, s)) =>
      when(bit_count(col("s")) === s, lit(w)).otherwise(acc)
    }
    val terms = chan
      .join(coal, col("s").bitwiseAND(col("bit")) === 0L)
      .join(vCut.as("vs"), Seq("s"))
      .join(vCut.select(col("s").as("__si"), col("v").as("vi")),
        (col("s") + col("bit")) === col("__si"))
      .groupBy(col("channel"))
      .agg(sum(wExpr * (col("vi") - col("v"))).as("phi_nfact"))
    val total = vCut.filter(col("s") === full)
      .select(col("v").as("__vn"))
      .crossJoin(vCut.filter(col("s") === 0L).select(col("v").as("__v0")))
      .select((col("__vn") - col("__v0")).as("__tot"))
    terms.crossJoin(broadcast(total))
      .select(col("channel"),
        round(col("phi_nfact").cast("double") / lit(fact(n).toDouble), 6)
          .as("shapley"),
        when(col("__tot") > 0L,
          round(col("phi_nfact").cast("double")
            / lit(fact(n).toDouble) / col("__tot").cast("double"), 6))
          .as("share"))
      .orderBy(col("channel"))
  }
}
