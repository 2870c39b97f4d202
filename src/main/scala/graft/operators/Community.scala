package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation
  * (SURVEY §2.C30).
  *
  * LPA (Raghavan/Albert/Kumara 2007) is the linear-time community
  * algorithm of the sparse-graph world: every node starts in its own
  * community and each round adopts the label carried by the plurality
  * of its neighbors. On corpus-curation graphs (hosts linked by
  * hyperlinks, documents linked by near-dup edges, parts linked by
  * co-purchase) the converged labels cluster the graph into the
  * communities that drive mixture decisions — cap a community, not
  * just a host, and boilerplate farms collapse into one label no
  * matter how many mirrors they span (pairs with §2.D48's
  * temperature mix, which can then stratify on community).
  *
  * Determinism — the published algorithm breaks plurality ties
  * randomly and updates asynchronously; both are non-starters for a
  * reproducible pipeline. This variant is fully synchronous (round t
  * reads only round t−1 labels) with exact-integer plurality counts
  * and a min-label tiebreak, so every engine that implements the same
  * three lines (count, argmax-with-min-tiebreak, carry isolated
  * labels) produces the identical labeling — the DuckDB oracle unrolls
  * the rounds as CTEs and hash-matches.
  *
  * Scale shape — each round is: one hash join of the materialized
  * edge list against the (node, label) frame on the neighbor key, a
  * partial-agg'd `groupBy(node, label)` count (map-side combine eats
  * the plurality histogram before the shuffle), a partial-agg'd
  * min-struct per node, and a broadcast-free left join back to the
  * node universe. Shuffled state is always O(nodes + distinct
  * (node,label) pairs) longs — never rows, never neighborhoods.
  * Lineage is cut every other round exactly like
  * [[Centrality.pageRank]], so the DAG never compounds. No
  * `.collect()`, no driver sync beyond the eager cuts.
  */
object Community {

  /** Synchronous min-tiebreak label propagation.
    *
    * @param edges      (src, dst) BIGINT pairs; treated as DIRECTED
    *                   adjacency — callers wanting the undirected
    *                   semantics insert both directions (house rule,
    *                   same as [[Centrality.pageRank]]).
    * @param nodes      (id) node universe; isolated nodes keep their
    *                   own id as label forever.
    * @param iterations fixed round count (no convergence probe — the
    *                   oracle unrolls exactly this many rounds).
    * @return (id, community) one row per node; `community` is the
    *         min node id of the label the node converged to.
    */
  def labelPropagation(edges: DataFrame, nodes: DataFrame,
                       iterations: Int = 5): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // co-partitioned, measured-width loop layout (see
    // [[Centrality.pageRank]]): the edge list is probed on dst every
    // round, so cut it hash(dst); labels ride hash(id). Per round only
    // the two plurality aggregations exchange (hash(src, community)
    // then hash(src) — the LPA minimum); neither join re-shuffles a
    // side.
    val (e0, eBytes) = Materialize.cutAlignedMeasured(
      edges.select(col("src"), col("dst")).distinct()
        .repartition(col("dst")))
    val spark = edges.sparkSession
    val w = Materialize.loopWidth(spark, eBytes, 16L << 20)
    val fullW = Materialize.sessionWidth(spark)
    Materialize.withWidth(spark, w) {
      val e =
        if (w == fullW) e0
        else Materialize.cutAligned(e0.repartition(w, col("dst")))
      val ns = Materialize.cutAligned(
        nodes.select(col("id")).repartition(col("id")))
      var labels = ns.select(col("id"), col("id").as("community"))
      var it = 0
      while (it < iterations) {
        // plurality histogram: for each node, how many in-neighbors
        // carry each label — map-side combine collapses duplicates
        // before the (src, community) shuffle
        val hist = e.join(labels.hint("shuffle_hash"),
            col("dst") === col("id"))
          .groupBy(col("src"), col("community"))
          .agg(count(lit(1)).as("c"))
        // argmax with min-label tiebreak as ONE partial-aggregable
        // min-struct: (−count, label) orders by plurality desc, label asc
        val best = hist
          .groupBy(col("src"))
          .agg(min(struct((-col("c")).as("nc"), col("community").as("l")))
            .as("b"))
          .select(col("src").as("id"), col("b.l").as("next"))
        val step = labels.join(best.hint("shuffle_hash"), Seq("id"), "left")
          .select(col("id"),
            coalesce(col("next"), col("community")).as("community"))
        it += 1
        labels = if (it % 2 == 0 || it == iterations)
                   Materialize.cutAligned(step)
                 else step
      }
      labels
    }
  }
}
