package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Semantic deduplication (SemDeDup, Abbas et al. 2023): k-means
  * cluster the embedding space, compare pairs only WITHIN a cluster,
  * connect pairs above a cosine threshold into duplicate groups, and
  * keep exactly one representative per group — the member with the
  * LOWEST cosine to its cluster centroid (the paper's keep rule: the
  * least-typical member preserves the most diversity).
  *
  * This is the embedding-space sibling of the lexical dedup family
  * (D1-D5): MinHash finds copy-paste, SemDeDup finds re-phrasings —
  * same meaning, different tokens — that no shingle method can link.
  *
  * Scale shape: the whole point of clustering first is that the
  * quadratic step is per-cluster. k grows with the corpus (the paper
  * runs k ≈ 100k on LAION) so cluster sizes stay bounded; the
  * pair join co-locates rows by `cid` (one shuffle of (id, vec) rows),
  * pair volume is Σ|cluster|² — dialed by k, never corpus². Edges
  * carry ids only; components resolve via [[Dedup.connectedComponents]]
  * (pointer-jumped min-label, O(log diameter) rounds).
  *
  * Determinism: assignment and both cosines are the bit-exact
  * index-order folds of the ANN family, the threshold compares the
  * exact double, and the keep rule ranks on (cos_to_centroid, id) —
  * every stage mirrors into the Verify-time dynamic oracle
  * (`dedup_semantic`), centroids embedded as float literals.
  */
object SemDedup {

  /** Per-row verdict: (id, cid, canonical_id, cos_centroid, keep).
    * `keep` marks the group representative; singletons keep
    * themselves. Callers drop `keep = false` rows for the curated
    * corpus, or audit groups via `canonical_id`.
    */
  def semDedup(corpus: DataFrame, vecCol: String, idCol: String,
               centroids: Array[Array[Float]],
               threshold: Double): DataFrame = {
    val asg = IvfIndex.assign(
      corpus.select(col(idCol).as("id"), col(vecCol).as("vec")),
      "vec", centroids)
    // within-cluster pairs: the cid equality join co-locates each
    // cluster; vectors ride the pair rows because EVERY within-cluster
    // pair is scored (unlike LSH candidates there is no later verify
    // step to defer the vectors to)
    val a = asg.select(col("cid"), col("id").as("id_a"), col("vec").as("__va"))
    val b = asg.select(col("cid"), col("id").as("id_b"), col("vec").as("__vb"))
    val edges = a.join(b, "cid")
      .filter(col("id_a") < col("id_b"))
      .filter(GraftFunctions.vec_cosine(col("__va"), col("__vb")) >= threshold)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint()
    // rank ONLY edge-incident rows (bounded by duplicate density —
    // ≪ corpus): the keep-rule window never shuffles the full corpus,
    // and the verdicts join back broadcast-small; everything outside a
    // duplicate group keeps itself by construction
    val incident = edges.select(col("id_a").as("id"))
      .union(edges.select(col("id_b").as("id"))).distinct()
    val comp = Dedup.connectedComponents(edges, incident)
    val centsLit = IvfIndex.centroidsLiteral(centroids)
    val withCent = asg.withColumn("cos_centroid",
      GraftFunctions.vec_cosine(col("vec"),
        element_at(centsLit, col("cid") + lit(1))))
    val verdicts = withCent.select(col("id"), col("cos_centroid"))
      .join(comp, "id")
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("canonical_id"))
          .orderBy(col("cos_centroid").asc, col("id"))))
      .select(col("id"), col("canonical_id"), (col("__rk") === 1).as("__keep"))
    withCent.join(verdicts, Seq("id"), "left")
      .select(col("id"), col("cid"),
        coalesce(col("canonical_id"), col("id")).as("canonical_id"),
        col("cos_centroid"),
        coalesce(col("__keep"), lit(true)).as("keep"))
  }
}
