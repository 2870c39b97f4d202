package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA basis + whitening for embedding columns (SURVEY §2.D51) — the
  * standard preprocessing in front of semantic dedup and ANN: center,
  * rotate onto the principal axes, and optionally scale each axis to
  * unit variance so cosine/L2 thresholds mean the same thing in every
  * direction (SemDeDup's clustering and D5's near-dup cut both sharpen
  * on whitened vectors; 64→k truncation is the cheap dimensionality
  * cut before PQ's aggressive one).
  *
  * Training follows the house codebook discipline (IvfIndex:48): the
  * moments come from a DETERMINISTIC hash-modulo sample, collected
  * driver-side (bounded by `sampleCap`, the same driver-state class as
  * LM vocabularies), accumulated in id-sorted order so every run folds
  * the same doubles in the same order — a distributed covariance would
  * merge partial double sums in partition order and lose
  * bit-reproducibility. The 64×64 eigenproblem is solved by cyclic
  * Jacobi with a FIXED sweep count and rotation order (no
  * convergence-dependent branching), eigenvectors sign-fixed
  * (largest-|component| positive), so the basis is a pure function of
  * the sample. At 100 TB the sample IS how this is done: a basis from
  * 4k vectors is statistically indistinguishable from the full-corpus
  * one, and retraining on corpus growth is a cheap bounded scan.
  *
  * Projection is a zero-shuffle plan-literal fold per component —
  * `Σ_i (v_i − mean_i)·basis_ji` in index order, one extra divide by
  * `√eigenvalue` when whitening — the BM25/LM plan discipline, so the
  * full-corpus pass is embarrassingly parallel and the DuckDB oracle
  * mirrors the fold bit-for-bit (float→double widening is exact,
  * every op correctly rounded, literals round-trip).
  */
object Pca {

  /** Trained model: `mean` (dim), `basis` (components × dim, row j =
    * j-th principal axis, descending eigenvalue), `eigenvalues`
    * (components, the per-axis sample variances).
    */
  final case class Model(mean: Array[Double], basis: Array[Array[Double]],
                         eigenvalues: Array[Double])

  /** Deterministic PCA train on a hash-modulo sample of the corpus. */
  def train(corpus: DataFrame, vecCol: String, idCol: String,
            dim: Int, components: Int, sampleCap: Int = 4096): Model = {
    require(components >= 1 && components <= dim,
      s"components must be in [1, $dim], got $components")
    val n = corpus.count()
    require(n > 1, "pca: need at least 2 vectors")
    val step = math.max(1L, n / sampleCap)
    val sample0 = corpus
      .filter(pmod(xxhash64(col(idCol)), lit(step)) === 0)
      .select(col(idCol), col(vecCol))
    val sample =
      // Unlucky-hash fallback stays BOUNDED: limit to sampleCap rows
      // (id-ordered, still deterministic) — collecting the whole corpus
      // here would be a driver OOM at scale, the very case the hash
      // sample exists to avoid.
      (if (step > 1 && sample0.count() < 2)
         corpus.select(col(idCol), col(vecCol))
           .orderBy(col(idCol)).limit(math.max(2, sampleCap))
       else sample0)
        .orderBy(col(idCol))
        .collect()
        .map(_.getSeq[Float](1).toArray)
    val m = sample.length
    val mean = new Array[Double](dim)
    sample.foreach { v =>
      var i = 0
      while (i < dim) { mean(i) += v(i).toDouble; i += 1 }
    }
    locally { var i = 0; while (i < dim) { mean(i) /= m; i += 1 } }
    // covariance, id-sorted accumulation order (deterministic)
    val cov = Array.ofDim[Double](dim, dim)
    sample.foreach { v =>
      var i = 0
      while (i < dim) {
        val di = v(i).toDouble - mean(i)
        var j = i
        while (j < dim) {
          cov(i)(j) += di * (v(j).toDouble - mean(j)); j += 1
        }
        i += 1
      }
    }
    locally { // symmetrize + 1/(m-1)
      var i = 0
      while (i < dim) {
        var j = i
        while (j < dim) {
          cov(i)(j) /= (m - 1); cov(j)(i) = cov(i)(j); j += 1
        }
        i += 1
      }
    }
    val (eigs, vecs) = jacobiEigen(cov, sweeps = 16)
    // order axes by descending eigenvalue (index tiebreak), fix signs
    val order = eigs.indices.sortBy(i => (-eigs(i), i)).take(components)
    val basis = order.map { k =>
      val axis = Array.tabulate(dim)(i => vecs(i)(k))
      var best = 0
      var i = 1
      while (i < dim) {
        if (math.abs(axis(i)) > math.abs(axis(best))) best = i
        i += 1
      }
      if (axis(best) < 0) axis.map(x => -x) else axis
    }.toArray
    Model(mean, basis, order.map(eigs).toArray)
  }

  /** Cyclic Jacobi for a symmetric matrix: fixed sweep count, fixed
    * (p,q) rotation order — deterministic for any input. Returns
    * (diagonal eigenvalues, eigenvector columns).
    */
  private def jacobiEigen(a0: Array[Array[Double]],
                          sweeps: Int): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var s = 0
    while (s < sweeps) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - sn * aiq
              a(i)(q) = sn * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - sn * aqi
              a(q)(i) = sn * api + c * aqi
              i += 1
            }
            i = 0
            while (i < n) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - sn * viq
              v(i)(q) = sn * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      s += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** One projected component: `Σ_i (v_i − mean_i)·basis_ji` folded in
    * index order, `/ √eig_j` when whitening — the codegen
    * [[graft.functions.VecProject]] kernel (HOF lambdas are
    * CodegenFallback; the model ships with the plan via
    * `addReferenceObj`). Zero shuffle. [[componentHof]] is the
    * built-in-function twin the spec pins bit-equal.
    */
  def component(vec: Column, model: Model, j: Int,
                whiten: Boolean = false): Column =
    graft.functions.GraftFunctions.vec_project(vec, model.mean,
      model.basis(j),
      if (whiten) math.sqrt(model.eigenvalues(j)) else 1.0)

  /** HOF twin of [[component]] (transform/zip_with/aggregate fold) —
    * the property witness: same center/multiply/left-fold/divide ops
    * in the same order, so it must match the kernel bit for bit.
    */
  def componentHof(vec: Column, model: Model, j: Int,
                   whiten: Boolean = false): Column = {
    val meanLit = array(model.mean.map(lit): _*)
    val axisLit = array(model.basis(j).map(lit): _*)
    val centered = zip_with(transform(vec, x => x.cast("double")), meanLit,
      (x, mu) => x - mu)
    val prods = zip_with(centered, axisLit, (x, b) => x * b)
    val folded = aggregate(prods, lit(0.0), (acc, x) => acc + x)
    if (whiten) folded / sqrt(lit(model.eigenvalues(j))) else folded
  }

  /** Full projection as an array<double> column (library face; the
    * driver gate's scalar faces pick individual [[component]]s). */
  def project(vec: Column, model: Model, whiten: Boolean = false): Column =
    array(model.basis.indices.map(j => component(vec, model, j, whiten)): _*)

  /** Persist the model as a lake artifact (rows: j = −1 carries the
    * mean, j ≥ 0 the axes with their eigenvalues); doubles round-trip
    * parquet exactly, so projections against a loaded model reproduce
    * the training session bit-for-bit.
    */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
           path: String): Unit = {
    import spark.implicits._
    val rows = (-1, model.mean.toSeq, 0.0) +:
      model.basis.indices.map(j =>
        (j, model.basis(j).toSeq, model.eigenvalues(j)))
    rows.toDF("j", "axis", "eig")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path).orderBy(col("j")).collect()
    val mean = rows.head.getSeq[Double](1).toArray
    val rest = rows.tail
    Model(mean, rest.map(_.getSeq[Double](1).toArray),
      rest.map(_.getDouble(2)))
  }

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, Model]

  /** Session-cached train (the IvfIndex.trainCached pattern) — the
    * query face and the Verify-time oracle embedding must see the
    * SAME model without retraining per call.
    */
  def trainCached(key: String, corpus: DataFrame, vecCol: String,
                  idCol: String, dim: Int, components: Int): Model = {
    // Fold the hyper-parameters into the cache key: a second call site
    // sharing the caller's key string but asking for a different
    // dim/components must not silently reuse the wrong model.
    val fullKey = s"$key#d$dim#c$components"
    cache.getOrElseUpdate(fullKey,
      train(corpus, vecCol, idCol, dim, components))
  }
}
