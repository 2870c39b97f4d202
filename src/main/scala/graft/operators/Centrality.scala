package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-analysis centrality (PageRank, Brin & Page 1998) — the graph
  * quality signal web-corpus curation uses (Common Crawl publishes
  * exactly this family over its host graph).
  *
  * FIXED-POINT formulation: ranks are integer micro-units
  * (SCALE = 10⁹ ≈ total mass SCALE·1), every step is integer
  * arithmetic —
  * {{{ r₀(v) = SCALE div N
  *     r_{k+1}(v) = base + (85 · Σ_{(u,v)∈E} (r_k(u) div outdeg(u))) div 100
  *     base = (15 · (SCALE div N)) div 100 }}}
  * Integer sums are order-independent and integer division is
  * engine-independent, so the WHOLE iteration is bit-reproducible
  * under any partitioning — which is what makes a distributed
  * PageRank hash-oracle-able (the float formulation's per-dst sums
  * reorder across engines). The deterministic floor-rounding loss is
  * bounded by outdeg per edge per step — immaterial for a ranking
  * signal, and identical everywhere.
  *
  * Scale shape: the classic iterative plan — edges pre-joined with
  * outdegree once (one shuffle, reused every step via checkpoint);
  * each iteration is one join (ranks ⋈ edges on src) + one
  * partial-aggregated groupBy(dst) + a left join back to the node
  * set; [[Materialize.cut]] severs the growing lineage each step
  * (reliable `checkpoint` when the session set a checkpoint dir,
  * `localCheckpoint` locally — the standard Pregel-style recipe).
  * Iterations are fixed (default 10), not convergence-gated
  * — deterministic cost AND deterministic output.
  */
object Centrality {

  val Scale = 1000000000L

  /** @param edges (src, dst) BIGINT pairs — direction respected; pass
    *        both directions for an undirected graph. Duplicates are
    *        collapsed.
    * @param nodes (id) — the full node universe (isolated nodes keep
    *        the base rank).
    * @return (id, rank) — integer micro-ranks.
    */
  def pageRank(edges: DataFrame, nodes: DataFrame,
               iterations: Int = 10): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val n = nodes.count()
    require(n > 0, "pageRank: empty node set")
    val r0 = Scale / n
    val base = (15L * r0) / 100L
    val e = edges.select(col("src"), col("dst")).distinct()
    val out = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // Materialize BOTH loop-invariant inputs once, CO-PARTITIONED for
    // the whole loop (cutAligned keeps the hash layout visible to the
    // planner): eo ends hash(src) from its join, ns/ranks hash(id).
    // Each iteration then plans with ZERO exchanges on the join sides
    // — contrib's groupBy(dst) exchange (ending hash(dst), which the
    // ns join consumes in place) is the only shuffle per step, the
    // Pregel minimum. The loop's shared width derives from the
    // MEASURED edge-frame size (loopWidth) — setup still runs at
    // session width, so scans and the distinct stay fully parallel.
    val (eo0, eoBytes) = Materialize.cutAlignedMeasured(e.join(out, "src"))
    val spark = edges.sparkSession
    val w = Materialize.loopWidth(spark, eoBytes, 256L << 10)
    val fullW = Materialize.sessionWidth(spark)
    Materialize.withWidth(spark, w) {
      val eo =
        if (w == fullW) eo0
        else Materialize.cutAligned(eo0.repartition(w, col("src")))
      val ns = Materialize.cutAligned(
        nodes.select(col("id")).repartition(col("id")))
      // initial ranks: a LAZY projection over the cut ns — it keeps
      // ns's hash(id) layout and needs no third setup materialization
      var ranks = ns.select(col("id"), lit(r0).as("rank"))
      var it = 0
      while (it < iterations) {
        val contrib = eo.join(ranks.hint("shuffle_hash"),
            col("src") === col("id"))
          .select(col("dst"), expr("`rank` DIV outdeg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("s"))
        val next = ns
          .join(contrib.hint("shuffle_hash"), col("id") === col("dst"), "left")
          .select(col("id"),
            (lit(base) +
              expr("(85 * coalesce(s, CAST(0 AS BIGINT))) DIV 100")).as("rank"))
        it += 1
        // cut lineage every other step (and at the end): one
        // materialization buys two iterations of plan growth — halves
        // the per-step job overhead that dominates small-graph runs
        // without letting the DAG compound
        ranks = if (it % 2 == 0 || it == iterations) Materialize.cutAligned(next)
                else next
      }
      ranks
    }
  }

  /** WEIGHTED-edge PageRank — real host graphs are weighted (link
    * counts between hosts, co-purchase multiplicities), and rank
    * should flow proportionally to edge weight, not per-edge:
    * {{{ r_{k+1}(v) = base + (85 · Σ_{(u,v,w)∈E} (r_k(u)·w) div wout(u)) div 100
    *     wout(u)   = Σ_{(u,·,w)∈E} w }}}
    * The same all-BIGINT fixed point as [[pageRank]] (products before
    * integer division keep precision; sums are order-independent), so
    * the distributed run stays hash-exact against an unrolled-CTE
    * oracle. Overflow bound: rank ≤ SCALE (total mass), so
    * `rank·w` needs `w < 2^63/SCALE ≈ 9.2e9` — any realistic link
    * count.
    *
    * Parallel edges are collapsed by SUMMING weight first (a link
    * count is additive); zero/negative weights are rejected upstream
    * by the groupBy producing them being counts.
    *
    * @param edges (src, dst, weight) — BIGINT triples, direction
    *        respected; duplicates collapse by weight sum.
    * @param nodes (id) — full node universe.
    * @return (id, rank) integer micro-ranks.
    */
  def weightedPageRank(edges: DataFrame, nodes: DataFrame,
                       iterations: Int = 10): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val n = nodes.count()
    require(n > 0, "weightedPageRank: empty node set")
    val r0 = Scale / n
    val base = (15L * r0) / 100L
    val e = edges.groupBy(col("src"), col("dst"))
      .agg(sum(col("weight")).as("w"))
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    // same co-partitioned, measured-width loop layout as [[pageRank]]:
    // eo hash(src), ns/ranks hash(id) — one exchange per iteration
    val (eo0, eoBytes) = Materialize.cutAlignedMeasured(e.join(outw, "src"))
    val spark = edges.sparkSession
    val lw = Materialize.loopWidth(spark, eoBytes, 256L << 10)
    val fullW = Materialize.sessionWidth(spark)
    Materialize.withWidth(spark, lw) {
      val eo =
        if (lw == fullW) eo0
        else Materialize.cutAligned(eo0.repartition(lw, col("src")))
      val ns = Materialize.cutAligned(
        nodes.select(col("id")).repartition(col("id")))
      // initial ranks: a LAZY projection over the cut ns — it keeps
      // ns's hash(id) layout and needs no third setup materialization
      var ranks = ns.select(col("id"), lit(r0).as("rank"))
      var it = 0
      while (it < iterations) {
        val contrib = eo.join(ranks.hint("shuffle_hash"),
            col("src") === col("id"))
          .select(col("dst"), expr("(`rank` * w) DIV wout").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("s"))
        val next = ns
          .join(contrib.hint("shuffle_hash"), col("id") === col("dst"), "left")
          .select(col("id"),
            (lit(base) +
              expr("(85 * coalesce(s, CAST(0 AS BIGINT))) DIV 100")).as("rank"))
        it += 1
        ranks = if (it % 2 == 0 || it == iterations) Materialize.cutAligned(next)
                else next
      }
      ranks
    }
  }

  /** Personalized (seed-biased) PageRank — teleport mass concentrates
    * on a weighted seed set instead of spreading uniformly, so rank
    * becomes "trust flowing out of the seeds": the TrustRank /
    * domain-trust signal web-corpus curation layers on top of plain
    * centrality (seed = vetted hosts; rank = crawl-quality prior).
    *
    * Same integer fixed point as [[pageRank]], with a per-node base
    * vector instead of a scalar:
    * {{{ t(v)     = (SCALE · w(v)) div Σw          // teleport share
    *     r₀(v)    = t(v)
    *     r_{k+1}(v) = (15·t(v)) div 100
    *                + (85 · Σ_{(u,v)∈E} (r_k(u) div outdeg(u))) div 100 }}}
    * All arithmetic is BIGINT, so the distributed run hash-matches an
    * unrolled-CTE oracle bit-exactly. Nodes with zero teleport weight
    * receive rank only through links — the defining property.
    *
    * @param edges    (src, dst) BIGINT pairs; duplicates collapsed.
    * @param teleport (id, weight) — the FULL node universe with a
    *        non-negative BIGINT weight per node (0 for non-seeds).
    *        Weights need not be normalized.
    * @return (id, rank) integer micro-ranks.
    */
  def personalizedPageRank(edges: DataFrame, teleport: DataFrame,
                           iterations: Int = 10): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val wsum = teleport.agg(sum(col("weight"))).head().getLong(0)
    require(wsum > 0, "personalizedPageRank: teleport weights sum to 0")
    val e = edges.select(col("src"), col("dst")).distinct()
    val out = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // same co-partitioned, measured-width loop layout as [[pageRank]]:
    // eo hash(src), ns/ranks hash(id) — one exchange per iteration
    val (eo0, eoBytes) = Materialize.cutAlignedMeasured(e.join(out, "src"))
    val spark = edges.sparkSession
    val w = Materialize.loopWidth(spark, eoBytes, 256L << 10)
    val fullW = Materialize.sessionWidth(spark)
    Materialize.withWidth(spark, w) {
      val eo =
        if (w == fullW) eo0
        else Materialize.cutAligned(eo0.repartition(w, col("src")))
      // loop-invariant per-node teleport share (the base VECTOR)
      val ns = Materialize.cutAligned(teleport.select(col("id"),
        expr(s"($Scale * weight) DIV $wsum").as("t"))
        .repartition(col("id")))
      var ranks = ns.select(col("id"), col("t").as("rank"))
      var it = 0
      while (it < iterations) {
        val contrib = eo.join(ranks.hint("shuffle_hash"),
            col("src") === col("id"))
          .select(col("dst"), expr("`rank` DIV outdeg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("s"))
        val next = ns
          .join(contrib.hint("shuffle_hash"), col("id") === col("dst"), "left")
          .select(col("id"),
            (expr("(15 * t) DIV 100") +
              expr("(85 * coalesce(s, CAST(0 AS BIGINT))) DIV 100")).as("rank"))
        it += 1
        ranks = if (it % 2 == 0 || it == iterations) Materialize.cutAligned(next)
                else next
      }
      ranks
    }
  }

  /** HITS hubs & authorities (Kleinberg 1999) — the OTHER classic
    * link-analysis signal: on a directed graph, a good HUB points at
    * good authorities and a good AUTHORITY is pointed at by good hubs
    * (on a buyer→seller trade graph: hub = well-connected buyer,
    * authority = supplier serving well-connected buyers).
    *
    * INTEGER fixed point, like [[pageRank]]: scores are micro-units;
    * each iteration is
    * {{{ a'(v) = Σ_{(u,v)∈E} h(u);   a(v) = a'(v) div d_a
    *     h'(v) = Σ_{(v,u)∈E} a(u);   h(v) = h'(v) div d_h }}}
    * where the normalizer `d = max(1, Σ x' div SCALE)` keeps total
    * mass ≈ SCALE WITHOUT the `x'·SCALE` product (which would
    * overflow BIGINT at in-degree ≥ 10) — division by a global
    * integer is order-independent, so the whole iteration stays
    * bit-reproducible and hash-oracle-able. Totals are computed on
    * the just-materialized frame each half-step (a KB-scale agg job).
    *
    * @param edges (src, dst) BIGINT pairs, DIRECTION MATTERS;
    *        duplicates collapsed.
    * @param nodes (id) — full node universe (nodes with no in-edges
    *        hold authority 0; no out-edges, hub 0).
    * @return (id, authority, hub) integer micro-scores.
    */
  def hits(edges: DataFrame, nodes: DataFrame,
           iterations: Int = 8): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // HITS probes the edge list on BOTH endpoints (src for the
    // authority pass, dst for the hub pass); one frame cannot be
    // hash-partitioned both ways, so keep TWO co-partitioned cut
    // copies — two setup exchanges buy zero edge exchanges across all
    // 2×iterations joins. ns/scores ride hash(id) like [[pageRank]].
    val (eSrc0, eBytes) = Materialize.cutAlignedMeasured(
      edges.select(col("src"), col("dst")).distinct()
        .repartition(col("src")))
    val spark = edges.sparkSession
    val w = Materialize.loopWidth(spark, eBytes, 16L << 20)
    val fullW = Materialize.sessionWidth(spark)
    Materialize.withWidth(spark, w) {
    val eSrc =
      if (w == fullW) eSrc0
      else Materialize.cutAligned(eSrc0.repartition(w, col("src")))
    val eDst = Materialize.cutAligned(eSrc.repartition(w, col("dst")))
    val ns = Materialize.cutAligned(
      nodes.select(col("id")).repartition(col("id")))
    val n = ns.count()
    require(n > 0, "hits: empty node set")
    val h0 = Scale / n
    def normalized(raw: DataFrame, scoreCol: String): DataFrame = {
      // raw: (id, s) un-normalized; divide by the global integer
      // normalizer so Σ score ≈ SCALE — materialize first so the
      // total and the normalized frame share one computation. The
      // normalizer folds in-plan as a broadcast scalar (no driver
      // .head() sync per half-iteration): the agg subtree reads the
      // just-cut blocks, so the cross join costs one broadcast of a
      // single row. The aligned cut keeps raw's hash(id) layout, so
      // the next half-step's edge join consumes it in place.
      val m = Materialize.cutAligned(raw)
      val total = m.agg(sum(col("s")).as("__t"))
      m.crossJoin(broadcast(total))
        .select(col("id"),
          expr(s"s DIV greatest(1L, __t DIV $Scale)").as(scoreCol))
    }
    var hub = ns.select(col("id"), lit(h0).as("hub"))
    var auth: DataFrame = null
    var it = 0
    while (it < iterations) {
      val aRaw = eSrc
        .join(hub.hint("shuffle_hash"), col("src") === col("id"))
        .groupBy(col("dst")).agg(sum(col("hub")).as("c"))
      auth = normalized(
        ns.join(aRaw.hint("shuffle_hash"), col("id") === col("dst"), "left")
          .select(col("id"), coalesce(col("c"), lit(0L)).as("s")), "authority")
      val hRaw = eDst
        .join(auth.hint("shuffle_hash"), col("dst") === col("id"))
        .groupBy(col("src")).agg(sum(col("authority")).as("c"))
      hub = normalized(
        ns.join(hRaw.hint("shuffle_hash"), col("id") === col("src"), "left")
          .select(col("id"), coalesce(col("c"), lit(0L)).as("s")), "hub")
      it += 1
    }
    ns.join(auth, Seq("id"), "left")
      .join(hub, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("authority"), lit(0L)).as("authority"),
        coalesce(col("hub"), lit(0L)).as("hub"))
    }
  }

  /** C33: multi-source BFS hop distance — "crawl depth from the seed
    * set", the trust-propagation counterpart to
    * [[personalizedPageRank]]: where PPR grades trust continuously,
    * hop distance is the discrete audit (seed-linked ≤ 2 hops is the
    * classic link-spam / trusted-frontier cut).
    *
    * Frontier-only expansion: round t joins ONLY the nodes that
    * acquired distance t−1 against the edge list, emits their
    * out-neighbors distinct, and stamps still-unreached ones with t —
    * per-round shuffled state is the frontier and its neighbor set,
    * never the whole graph's rows re-propagated. Exact integers
    * throughout; fixed `maxIter` (no convergence probe) so the oracle
    * unrolls per round. Unreached nodes report −1.
    */
  def seedDistance(edges: DataFrame, seeds: DataFrame, nodes: DataFrame,
                   maxIter: Int): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    // co-partitioned, measured-width loop layout (see [[pageRank]]):
    // e hash(src), dist hash(id) — the frontier join and the
    // dist⋈reached join run exchange-free; the neighbor distinct
    // (frontier-sized) is the only per-round shuffle
    val (e0, eBytes) = Materialize.cutAlignedMeasured(
      edges.select(col("src"), col("dst")).distinct()
        .repartition(col("src")))
    val spark = edges.sparkSession
    val w = Materialize.loopWidth(spark, eBytes, 256L << 10)
    val fullW = Materialize.sessionWidth(spark)
    Materialize.withWidth(spark, w) {
      val e =
        if (w == fullW) e0
        else Materialize.cutAligned(e0.repartition(w, col("src")))
      val ns = Materialize.cutAligned(
        nodes.select(col("id")).repartition(col("id")))
      var dist = Materialize.cutAligned(
        ns.join(seeds.select(col("id"), lit(0L).as("__d0")), Seq("id"), "left")
          .select(col("id"), coalesce(col("__d0"), lit(-1L)).as("dist")))
      var it = 0
      while (it < maxIter) {
        val frontier = dist.filter(col("dist") === lit(it.toLong))
        val reached = e.join(frontier.hint("shuffle_hash"),
            col("src") === col("id"))
          .select(col("dst")).distinct()
          .withColumn("__hit", lit(1L))
        val step = dist.join(reached.hint("shuffle_hash"),
            col("id") === col("dst"), "left")
          .select(col("id"),
            when(col("dist") >= 0, col("dist"))
              .otherwise(when(col("__hit").isNotNull, lit(it + 1L))
                .otherwise(lit(-1L))).as("dist"))
        it += 1
        dist = if (it % 2 == 0 || it == maxIter) Materialize.cutAligned(step)
               else step
      }
      dist
    }
  }

  /** C55: bounded-hop weighted single-source shortest paths —
    * `maxIter` rounds of Bellman-Ford min-plus relaxation from a seed
    * SET, i.e. the exact "cheapest ≤k-hop cost" (well-defined output
    * regardless of global convergence, like [[seedDistance]]'s hop
    * semantics). Costs are BIGINT, so every candidate `dist + w`, the
    * per-dst MIN, and the keep decision are integer — order
    * independent, bit-reproducible, oracle-able by an unrolled
    * min-plus CTE chain.
    *
    * Scale shape: FRONTIER relaxation — round i only expands nodes
    * whose distance IMPROVED in round i−1 (provably identical to
    * full relaxation round for round: an unimproved node re-offers
    * candidates already applied), so per-round work is
    * O(edges-out-of-improved), the weighted analogue of the BFS
    * frontier. Shuffles carry (node, long) pairs; the per-dst MIN
    * partial-aggregates map-side; lineage cut every other round.
    *
    * @param edges (src, dst, w) — BIGINT non-negative weights;
    *              pass both directions for an undirected graph
    * @param seeds (id) — distance-0 sources
    * @param nodes (id) — full node universe
    * @return (id, dist) — NULL dist = unreachable within maxIter hops
    */
  def weightedDistance(edges: DataFrame, seeds: DataFrame,
                       nodes: DataFrame, maxIter: Int): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    // co-partitioned, measured-width loop layout (see [[pageRank]]):
    // e hash(src), dist/frontier hash(id) — the relaxation join and
    // the min-merge join run exchange-free; cand's groupBy(dst) is the
    // one per-round shuffle. The cadence cut lands on STEP (not the
    // dist projection) so the frontier filter reads the same cut
    // blocks instead of re-running the round's joins.
    val (e0, eBytes) = Materialize.cutAlignedMeasured(
      edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
        .repartition(col("src")))
    val spark = edges.sparkSession
    val lw = Materialize.loopWidth(spark, eBytes, 256L << 10)
    val fullW = Materialize.sessionWidth(spark)
    Materialize.withWidth(spark, lw) {
      val e =
        if (lw == fullW) e0
        else Materialize.cutAligned(e0.repartition(lw, col("src")))
      val ns = Materialize.cutAligned(
        nodes.select(col("id")).repartition(col("id")))
      var dist = Materialize.cutAligned(
        ns.join(seeds.select(col("id"), lit(0L).as("__d0")), Seq("id"), "left")
          .select(col("id"), col("__d0").as("dist")))
      // round 0's improved set IS the seed set
      var frontier = dist.filter(col("dist").isNotNull)
      var it = 0
      while (it < maxIter) {
        val cand = e.join(frontier.hint("shuffle_hash"),
            col("src") === col("id"))
          .select(col("dst"), (col("dist") + col("w")).as("__c"))
          .groupBy(col("dst")).agg(min(col("__c")).as("__best"))
        val step0 = dist.join(cand.hint("shuffle_hash"),
            col("id") === col("dst"), "left")
          .select(col("id"), col("dist"), col("__best"),
            when(col("dist").isNull, col("__best"))
              .when(col("__best").isNull, col("dist"))
              .otherwise(least(col("dist"), col("__best"))).as("__nd"))
        it += 1
        val step = if (it % 2 == 0 || it == maxIter) Materialize.cutAligned(step0)
                   else step0
        dist = step.select(col("id"), col("__nd").as("dist"))
        frontier = step
          .filter(col("__nd").isNotNull &&
            (col("dist").isNull || col("__nd") < col("dist")))
          .select(col("id"), col("__nd").as("dist"))
      }
      dist
    }
  }

  /** C89: degree assortativity (Newman 2002) — the Pearson correlation
    * of endpoint degrees over the edge set: positive means hubs link
    * to hubs (social-network shape), negative means hubs link to
    * leaves (technological/star shape). The one-number structural
    * summary that tells a graph-pipeline owner whether hub-cut
    * heuristics (C72's) and skew salting will pay off.
    *
    * Undirected convention: each edge contributes BOTH ordered
    * orientations, so the correlation is symmetric by construction.
    *
    * EXACT integer core: degrees are integers, so all five Pearson
    * sufficient sums (Σx, Σy, Σx², Σy², Σxy over 2|E| ordered pairs)
    * accumulate exactly in decimal(38,0); r is one IEEE evaluation
    * over them. Scale shape: one groupBy on the edge list for degrees
    * (exchange ∝ |E|), two shuffle joins keyed on the endpoints to
    * attach them, one scalar partial-agg merge — no corpus-sized
    * window, no driver loop.
    *
    * @param edges (u, v) one row per undirected edge, u ≠ v; parallel
    *              edges count with multiplicity (dedupe upstream if
    *              simple-graph semantics are wanted)
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val both = Materialize.cut(
      edges.select(col("u").as("a"), col("v").as("b"))
        .unionAll(edges.select(col("v").as("a"), col("u").as("b"))))
    val deg = Materialize.cut(
      both.groupBy(col("a").as("id")).agg(count(lit(1)).as("d")))
    // the probe side is the 2|E| ordered-pair frame — one to two
    // orders bigger than the |V|-row degree table it attaches; when
    // the degree table is small enough to ship, broadcast BOTH
    // attachments and the pairing is map-side (the Triangles
    // closing-join recipe: budget 8× the session threshold at 64 B
    // per two-long row; threshold = -1 disables the fast path).
    // Measured 26.2 s → 16.1 s at the ×10 probe's graph — the
    // remainder is the caller's basket self-join edge BUILD, the
    // C29/C58 cost class, not the attachments.
    val thresholdBytes = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(edges.sparkSession.conf
        .get("spark.sql.autoBroadcastJoinThreshold", "10485760"))
    val ship = thresholdBytes > 0 && deg.count() * 64L <= 8L * thresholdBytes
    def attach(d: DataFrame): DataFrame = if (ship) broadcast(d) else d
    val paired = both
      .join(attach(deg.select(col("id").as("a"), col("d").as("da"))), Seq("a"))
      .join(attach(deg.select(col("id").as("b"), col("d").as("db"))), Seq("b"))
    val s = paired.agg(
      count(lit(1)).cast("long").as("m2"),
      sum(dec0(col("da"))).as("sx"), sum(dec0(col("db"))).as("sy"),
      sum(dec0(col("da")) * dec0(col("da"))).as("sxx"),
      sum(dec0(col("db")) * dec0(col("db"))).as("syy"),
      sum(dec0(col("da")) * dec0(col("db"))).as("sxy"))
    val mD = col("m2").cast("double")
    val num = col("sxy").cast("double") * mD -
      col("sx").cast("double") * col("sy").cast("double")
    val dx = col("sxx").cast("double") * mD -
      col("sx").cast("double") * col("sx").cast("double")
    val dy = col("syy").cast("double") * mD -
      col("sy").cast("double") * col("sy").cast("double")
    s.select((col("m2") / 2L).cast("long").as("n_edges"),
      when(col("m2") > 0L && dx > 0.0 && dy > 0.0,
        round(num / (sqrt(dx) * sqrt(dy)), 6)).as("assortativity"))
  }

  private def dec0(c: Column): Column =
    c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
}
