package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with a distortion audit
  * (Johnson & Lindenstrauss 1984; Achlioptas 2003's ±1 Rademacher
  * matrix — database-friendly: no Gaussians, just signs) — SURVEY §2
  * D122. The cheap-ANN-prefilter primitive: project d-dim embeddings
  * to k ≪ d dims with a DETERMINISTIC sign matrix and measure how
  * well pairwise distances survive, the number that decides whether
  * the D43/D44 index can run on k dims (4× less memory, 4× faster
  * scans) without recall collapse.
  *
  * The sign matrix is a pure hash of (i, j) — s_ij = ±1 from
  * ((i+1)·(j+3)·2654435761) mod 1000003 mod 2 — so both engines
  * MATERIALIZE NOTHING and agree bit-for-bit; the multiplicative
  * (i+1)(j+3) mixing breaks the linearity a mod-2 of a linear form
  * would have (which would make entire sign columns equal).
  *
  * Determinism: every projection component and squared distance is a
  * 0.0-seeded index-order double fold (the ANN-oracle convention);
  * per-pair distortion ratios ‖pa−pb‖²/‖a−b‖² quantize to 1e-9
  * (nonnegative) and aggregate as EXACT INTEGERS — mean/min/max and
  * the within-20% census are integer decisions.
  *
  * Scale shape: projection is a row-local map (d·k multiply-adds per
  * row — the scan cost); the audit pairs by vec_id DIV 2 (the D121
  * pairing convention: deterministic, window-free); the rollup is one
  * scalar partial-agg merge. Zero-distance pairs drop (ratio
  * undefined) and are counted.
  */
object RandomProjection {

  /** Rademacher sign as a double column, engine-replayable. */
  private def sgn(i: Column, j: Column): Column =
    when(((i + 1) * (j + 3) * lit(2654435761L)) % 1000003L % 2L === 0L,
      lit(1.0)).otherwise(lit(-1.0))

  /** Project `vec` (array<float/double>, d dims) to k dims:
    * p_j = (Σ_i v_i·s_ij)/√k, j = 0..k−1. k must be a perfect square
    * of an integer… no: √k must be exact in double for the published
    * convention — restricted to k ∈ {4, 16, 64} so the divisor is the
    * EXACT integer √k (2, 4, 8): one representable literal, no sqrt.
    */
  def project(vec: Column, d: Int, k: Int): Column = {
    val root = math.sqrt(k.toDouble)
    require(root == math.floor(root) && k >= 1,
      s"k must be a perfect square, got $k")
    transform(sequence(lit(0), lit(k - 1)), j =>
      aggregate(sequence(lit(0), lit(d - 1)), lit(0.0),
        (acc, i) => acc + element_at(vec, i + 1).cast("double") * sgn(i, j))
        / lit(root))
  }

  /** The distortion audit: one row —
    * (n_pairs, n_zero, mean/min/max ratio, frac within ±20%).
    */
  def distortionAudit(vectors: DataFrame, idCol: String, vecCol: String,
                      d: Int, k: Int): DataFrame = {
    val base = vectors.select(col(idCol).cast("long").as("__id"),
        col(vecCol).as("__v"))
      .withColumn("__p", expr("__id div 2"))
    val proj = base.withColumn("__pv", project(col("__v"), d, k))
    val a = proj.filter(col("__id") % 2 === 0)
      .select(col("__p"), col("__v").as("__va"), col("__pv").as("__pa"))
    val b = proj.filter(col("__id") % 2 === 1)
      .select(col("__p").as("__pb2"), col("__v").as("__vb"),
        col("__pv").as("__pb"))
    def sqDist(x: Column, y: Column): Column =
      aggregate(zip_with(x, y,
          (p, q) => (p.cast("double") - q.cast("double"))
            * (p.cast("double") - q.cast("double"))),
        lit(0.0), (acc, t) => acc + t)
    val pairs = a.join(b, col("__p") === col("__pb2"))
      .withColumn("__do", sqDist(col("__va"), col("__vb")))
      .withColumn("__dp", sqDist(col("__pa"), col("__pb")))
    val rated = pairs
      .withColumn("__nano", when(col("__do") > 0.0,
        round(col("__dp") / col("__do") * lit(1e9), 0).cast("long")))
    rated.agg(
      count(lit(1)).cast("long").as("n_pairs"),
      sum(when(col("__nano").isNull, 1L).otherwise(0L)).cast("long")
        .as("n_zero"),
      sum(col("__nano")).cast("long").as("__ns"),
      min(col("__nano")).as("__mn"), max(col("__nano")).as("__mx"),
      sum(when(col("__nano").between(800000000L, 1200000000L), 1L)
        .otherwise(0L)).cast("long").as("__w20"))
      .select(col("n_pairs"), col("n_zero"),
        lit(k.toLong).as("k_dims"),
        when(col("n_pairs") > col("n_zero"), round(
          col("__ns").cast("double")
            / (col("n_pairs") - col("n_zero")).cast("double") / lit(1e9),
          6)).as("mean_ratio"),
        round(col("__mn").cast("double") / lit(1e9), 6).as("min_ratio"),
        round(col("__mx").cast("double") / lit(1e9), 6).as("max_ratio"),
        when(col("n_pairs") > col("n_zero"), round(
          col("__w20").cast("double")
            / (col("n_pairs") - col("n_zero")).cast("double"), 6))
          .as("frac_within_20pct"))
  }
}
