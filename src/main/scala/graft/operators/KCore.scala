package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling, with onion layers
  * (SURVEY §2.C56).
  *
  * The k-core of a graph is the maximal subgraph in which every node
  * has degree ≥ k (Seidman 1983); the round at which peeling removes
  * a node is its "onion layer" (Batagelj–Zaveršnik's peeling order,
  * bucketed by round). Corpus-curation graphs use exactly this
  * signal: on a host/link graph the deep core is the
  * densely-interlinked spam/SEO cluster and the low layers are the
  * long-tail leaf hosts, so layer index feeds mixture and trust
  * decisions the same way PageRank does — but from cohesion, not
  * flow (pairs with §2.C28's centrality family).
  *
  * Determinism — peeling is CONFLUENT: the k-core is unique and the
  * synchronous schedule (each round removes ALL nodes of current
  * degree < k simultaneously) assigns every node a deterministic
  * layer index, no tiebreaks anywhere. Convergence is monotone —
  * once the removed set is empty every further round is the
  * identity — so a fixed round count R ≥ the cascade depth yields
  * the exact k-core AND lets the DuckDB oracle unroll exactly R
  * rounds and hash-match (same contract as
  * [[Centrality.pageRank]] / [[Community.labelPropagation]]).
  *
  * Scale shape — each round is: one partial-agg'd `groupBy(src)`
  * degree count (map-side combine; shuffled state is (node, long)
  * pairs), one left join of the node set against the degrees, and
  * two left-semi joins restricting the edge list to survivors. All
  * joins key on the node id, so a co-partitioned layout reuses one
  * exchange per round. Lineage is cut every other round. The removed
  * accumulator unions lazily — it never materializes per-round
  * frames to the driver. No `.collect()` anywhere.
  */
object KCore {

  /** Synchronous k-core peeling with layer assignment.
    *
    * @param edges  (src, dst) BIGINT pairs; treated as DIRECTED
    *               adjacency — callers wanting undirected semantics
    *               insert both directions (house rule, matching
    *               [[Centrality.pageRank]]). Duplicates collapsed.
    * @param k      minimum degree of the core (≥ 1).
    * @param rounds fixed peel-round count — must be ≥ the cascade
    *               depth at the target data for the survivors to be
    *               the true k-core (extra rounds are the identity;
    *               the oracle unrolls exactly this many).
    * @return one row per node of the input edge set:
    *         (id, peel_round, in_core) — `peel_round` = the 1-based
    *         round that removed the node, NULL for core members;
    *         `in_core` = survived all rounds.
    */
  def peelLayers(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // co-partitioned, measured-width loop layout (see
    // [[Centrality.pageRank]]): the edge frame rides hash(src) — the
    // degree agg and the src-side semi-join consume it in place — and
    // survivors ride hash(id).
    val (e00, eBytes) = Materialize.cutAlignedMeasured(
      edges.select(col("src"), col("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
        .distinct()
        .repartition(col("src")))
    val spark = edges.sparkSession
    val w = Materialize.loopWidth(spark, eBytes, 4L << 20)
    val fullW = Materialize.sessionWidth(spark)
    Materialize.withWidth(spark, w) {
      val e0 =
        if (w == fullW) e00
        else Materialize.cutAligned(e00.repartition(w, col("src")))
      // both directions are present, so src alone covers the universe
      var nodes = Materialize.cutAligned(
        e0.select(col("src").as("id")).distinct())
      var rem = e0
      var layers: DataFrame = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new org.apache.spark.sql.types.StructType()
          .add("id", "long", nullable = false)
          .add("peel_round", "int", nullable = true))
      var it = 0
      while (it < rounds) {
        it += 1
        val deg = rem.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        val annotated = nodes.join(deg, col("id") === col("src"), "left")
          .select(col("id"),
            coalesce(col("deg"), lit(0L)).as("deg"))
        val removed = annotated.where(col("deg") < k).select(col("id"))
        layers = layers.unionAll(
          removed.select(col("id"), lit(it).cast("int").as("peel_round")))
        val kept = annotated.where(col("deg") >= k).select(col("id"))
        val keptM = if (it % 2 == 0 || it == rounds) Materialize.cutAligned(kept)
                    else kept
        // dst-side semi FIRST so the src-side semi runs LAST: rem ends
        // every round hash(src), which the next round's degree agg and
        // src-semi consume without an exchange — one edge-sized shuffle
        // per round (the dst-semi) instead of three
        rem = rem
          .join(keptM.select(col("id").as("did")),
            col("dst") === col("did"), "left_semi")
          .join(keptM.select(col("id").as("sid")),
            col("src") === col("sid"), "left_semi")
        rem = if (it % 2 == 0 || it == rounds) Materialize.cutAligned(rem)
              else rem
        nodes = keptM
      }
      layers.select(col("id"), col("peel_round"),
          lit(false).as("in_core"))
        .unionAll(nodes.select(col("id"),
          lit(null).cast("int").as("peel_round"),
          lit(true).as("in_core")))
    }
  }
}
