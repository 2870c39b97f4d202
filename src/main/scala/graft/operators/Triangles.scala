package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting + local clustering coefficients (SURVEY §2.C29).
  *
  * Triangles are the basic cohesion signal of a graph: per-node
  * triangle counts feed clustering coefficients, spam/bot detection
  * (genuine communities are triangle-dense, crawler link farms are
  * triangle-sparse), and the global transitivity statistic. On the
  * warehouse's co-occurrence graphs (parts bought together, users
  * sharing sessions) the local clustering coefficient ranks how
  * "bundle-like" an item's neighborhood is.
  *
  * Scale shape — degree-ordered orientation (the MapReduce-classic
  * Suri/Vassilvitskii 2011 / Cohen 2009 trick): orient every
  * undirected edge from its lower-(degree, id) endpoint to the higher
  * one. The orientation is acyclic and every out-neighborhood has
  * O(√m) size on any graph (bounded by arboricity), so the wedge
  * self-join — the only quadratic step — generates
  * Σ_v outdeg(v)² = O(m^1.5) candidates worst-case instead of the
  * Σ_v deg(v)² blowup a naive neighbor join suffers on hub nodes
  * (a hub of degree d contributes d² wedges unoriented but ~0
  * oriented, because almost all its edges point INTO it). Each
  * triangle is emitted exactly once, at its minimum-(degree, id)
  * vertex. Three hash-shuffles on node keys (degree agg, wedge join,
  * closing-edge join) — no all-pairs step anywhere.
  *
  * Determinism: counts are exact integers; the coefficient
  * 2·T / (d·(d−1)) is one IEEE multiply+divide over exact integers —
  * identical in any engine — rounded to 6 dp for house style.
  */
object Triangles {

  /** Per-node triangle counts over an undirected simple graph.
    *
    * @param edges (u, v) BIGINT endpoint pairs; normalized internally
    *              (self-loops dropped, duplicates and orientation
    *              collapsed), so callers may pass raw pair lists.
    * @param nodes (id) — node universe; isolated nodes report
    *              degree 0, triangles 0, lcc 0.
    * @return (id, degree, triangles, lcc) one row per node.
    */
  def nodeTriangles(edges: DataFrame, nodes: DataFrame): DataFrame = {
    // canonical undirected edge set: u < v, distinct, loop-free —
    // materialized once, read by the degree agg and both joins
    val e = Materialize.cut(
      edges.select(
          least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct())
    // The degree table feeds THREE consumers (both orientation
    // attachments and the final per-node join) and the oriented edge
    // list THREE more (two wedge legs and the closing edge) — as lazy
    // plans each consumer re-ran the whole upstream subtree (the
    // before-plan holds 8 SortMergeJoins and 38 Exchanges for what is
    // structurally 3 shuffles). Cut both once; the wedge self-join
    // then reads ONE hash(src)-aligned frame from both sides with no
    // exchange and no sort.
    val deg = Materialize.cut(
      e.select(col("u").as("id"))
        .unionAll(e.select(col("v").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("degree")))
    // orient by (degree, id): the total order that bounds every
    // out-neighborhood by O(√m). The degree table is node-sized —
    // ship it to both attachments when it fits (same budget rule as
    // the closing join below) so orientation is map-side over e.
    val thresholdBytes = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(e.sparkSession.conf
        .get("spark.sql.autoBroadcastJoinThreshold", "10485760"))
    val shipDeg = thresholdBytes > 0 &&
      deg.count() * 64L <= 8L * thresholdBytes
    def attach(d: DataFrame): DataFrame = if (shipDeg) broadcast(d) else d
    val du = attach(deg.select(col("id").as("u"), col("degree").as("du")))
    val dv = attach(deg.select(col("id").as("v"), col("degree").as("dv")))
    val uKey = struct(col("du").as("d"), col("u").as("n"))
    val vKey = struct(col("dv").as("d"), col("v").as("n"))
    val oriented = Materialize.cutAligned(
      e.join(du, "u").join(dv, "v")
        .select(
          when(uKey < vKey, col("u")).otherwise(col("v")).as("src"),
          when(uKey < vKey, vKey).otherwise(uKey).as("dk"))
        .select(col("src"), col("dk.n").as("dst"), col("dk").as("dstKey"))
        .repartition(col("src")))
    // wedges at the minimum vertex: two out-edges of the same src,
    // canonically ordered so the closing edge's orientation matches
    val o1 = oriented.select(col("src"), col("dst").as("b"),
      col("dstKey").as("bk"))
    val o2 = oriented.select(col("src"), col("dst").as("c"),
      col("dstKey").as("ck"))
    val wedges = o1.join(o2.hint("shuffle_hash"), Seq("src"))
      .filter(col("bk") < col("ck"))
      .select(col("src").as("a"), col("b"), col("c"))
    // The wedge side is Σ outdeg² rows — one to two orders of
    // magnitude bigger than the edge list it probes. A sort-merge
    // join would SORT the wedges (the dominant cost: measured 21 s →
    // 7.3 s at sf0.1's 42M wedges); when the edge list is small enough
    // to ship, broadcast it and the probe is map-side. The decision
    // is stats-driven off the already-materialized edge frame (the
    // count reads the checkpoint), falling back to the shuffle join
    // on graphs whose edge list is genuinely large.
    val closing0 = oriented.select(col("dst").as("c2"), col("src").as("b2"))
    // Broadcast budget derives from the session's own ceiling, not a
    // hard-coded row count (a fixed 5M-row cutoff was ~300 MB of
    // hashed relation on default-sized drivers). This join warrants
    // MORE than the generic auto threshold — the probe side is
    // Σ outdeg² rows, so shipping the edge list saves a sort of a
    // frame 10-100× larger (measured 2× end-to-end even at 1.2M
    // edges) — so allow 8× it, at a conservative 64 B/row in-memory
    // estimate for the two-long hashed relation. threshold = -1
    // (broadcast disabled) disables this fast path too.
    val closing =
      if (thresholdBytes > 0 && e.count() * 64L <= 8L * thresholdBytes)
        broadcast(closing0)
      else closing0
    val triangles = wedges.join(closing,
      col("b") === col("b2") && col("c") === col("c2"))
      .select(col("a"), col("b"), col("c"))
    val perNode = triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    nodes.select(col("id"))
      .join(deg, Seq("id"), "left")
      .join(perNode, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("lcc",
        when(col("degree") >= 2,
          round(lit(2.0) * col("triangles") /
            (col("degree") * (col("degree") - 1)).cast("double"), 6))
          .otherwise(lit(0.0)))
  }
}
