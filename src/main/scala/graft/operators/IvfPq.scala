package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** IVF-PQ: the full composed ANN index (Jégou et al. 2011) — coarse
  * k-means lists for I/O pruning ([[IvfIndex]]) with product-quantized
  * RESIDUALS inside each list ([[PqIndex]]). The residual
  * `r = v − centroid(cid)` is what gets coded: residual norms are far
  * smaller than vector norms, so the same ksub codes quantize much
  * finer than raw-vector PQ — the standard reason every large-scale
  * ANN system (FAISS IVFPQ and its descendants) composes the two
  * rather than shipping either alone.
  *
  * At-rest layout: `cid=<n>/` partition dirs whose rows carry only
  * (id, codes) — m bytes of payload per vector. A search reads just
  * the probed lists' files ([[searchPartitioned]] prunes at file
  * listing like [[IvfIndex.searchPartitioned]]) and scans CODES, not
  * floats: I/O ∝ (nprobe/k) · (m / 4·D) of the float corpus —
  * both composition factors multiply, which is the entire point at
  * 100 TB.
  *
  * Determinism: residual subtraction is per-element float arithmetic
  * (correctly rounded in any IEEE engine), encode is the per-subspace
  * argmin fold, ADC ranks on `round(adc, 6)` with the id tiebreak
  * (the [[PqIndex]] discipline), and the final output is an exact
  * cosine re-rank — every stage mirrors into the DuckDB oracle, so
  * `ann_ivfpq_topk` is hash-gated end to end via the Verify-time
  * trained-state embedding (`SparkEntry.dynamicOracleSql`).
  */
object IvfPq {

  /** Coarse centroids + residual PQ codebooks. Both halves persist via
    * [[saveIndex]]/[[loadIndex]]; a retrained coarse book invalidates
    * every `cid=` layout AND the residual books (residuals are defined
    * against the centroids), so the two are saved as one artifact.
    */
  final case class Index(centroids: Array[Array[Float]],
                         books: PqIndex.Codebooks)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Index]()

  def trainCached(key: String, corpus: DataFrame, vecCol: String,
                  idCol: String, k: Int, dim: Int, m: Int = 8,
                  ksub: Int = 16, iters: Int = 3,
                  sampleCap: Int = 4096): Index =
    cache.computeIfAbsent(
      s"$key|k=$k|d=$dim|m=$m|ks=$ksub|it=$iters|cap=$sampleCap",
      _ => train(corpus, vecCol, idCol, k, dim, m, ksub, iters, sampleCap))

  /** `vec − centroids(cid)` element-wise — float-exact (both engines'
    * single-precision subtract is correctly rounded, so the residual
    * BITS reproduce), and a pure projection: no shuffle, the centroid
    * table rides the plan as a literal.
    */
  def residual(vec: Column, cid: Column,
               centroids: Array[Array[Float]]): Column =
    zip_with(vec,
      element_at(IvfIndex.centroidsLiteral(centroids), cid + lit(1)),
      (a, b) => a - b)

  /** Coarse training first, then the m residual codebooks on the
    * assigned sample — residuals are a projected column, so the PQ
    * half reuses [[IvfIndex.train]]'s capped-sample Lloyd unchanged.
    */
  def train(corpus: DataFrame, vecCol: String, idCol: String,
            k: Int, dim: Int, m: Int = 8, ksub: Int = 16,
            iters: Int = 3, sampleCap: Int = 4096): Index = {
    val cents = IvfIndex.train(corpus, vecCol, idCol, k, dim, iters, sampleCap)
    val resid = IvfIndex.assign(corpus, vecCol, cents)
      .select(col(idCol),
        residual(col(vecCol), col("cid"), cents).as("__res"))
    Index(cents,
      PqIndex.train(resid, "__res", idCol, dim, m, ksub, iters, sampleCap))
  }

  /** Write-time encode: (id, cid, codes) — the list id plus m residual
    * code bytes. A projection (no shuffle); this is the row shape the
    * partitioned layout stores.
    */
  def encode(corpus: DataFrame, vecCol: String, idCol: String,
             idx: Index): DataFrame =
    PqIndex.encode(
        IvfIndex.assign(corpus, vecCol, idx.centroids)
          .withColumn("__res", residual(col(vecCol), col("cid"), idx.centroids)),
        "__res", idx.books)
      .select(col(idCol), col("cid"), col("codes"))

  /** Top-k per query over encoded rows. Queries probe their `nprobe`
    * nearest coarse lists (same ranking as [[IvfIndex]]), the QUERY
    * residual against each probed list's centroid feeds the ADC kernel
    * against that list's codes, the pool cut keeps `k·poolMult`
    * candidates per query on `round(adc, 6)` (id tiebreak), and only
    * the pool's true vectors are fetched for the exact-cosine re-rank.
    * Each corpus row lives in exactly one list, so a candidate pair
    * (qid, id) appears at most once per probe — no dedup needed.
    */
  def search(queries: DataFrame, codes: DataFrame, k: Int, idx: Index,
             refineWith: DataFrame, nprobe: Int = 2,
             poolMult: Int = 4): DataFrame =
    refine(adcPool(queries, codes, k, idx, nprobe, poolMult),
      queries, refineWith, k)

  /** The ADC candidate stage alone: (qid, id) pairs, `k·poolMult` per
    * query, cut on `round(adc, 6)` with the id tiebreak. Exposed so
    * refine strategies can differ — [[refine]] joins a float corpus
    * DF; [[searchLakeRefine]] fetches only the pool's vectors from an
    * id-clustered lake.
    */
  def adcPool(queries: DataFrame, codes: DataFrame, k: Int, idx: Index,
              nprobe: Int = 2, poolMult: Int = 4): DataFrame = {
    val qp = IvfIndex.queryProbes(queries, idx.centroids, nprobe)
      .withColumn("__qres", residual(col("qvec"), col("cid"), idx.centroids))
      .select(col("qid"), col("cid"), col("__qres"))
    val scored = codes.join(broadcast(qp), Seq("cid"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        GraftFunctions.pq_adc(col("__qres"), col("codes"),
          idx.books.flat, idx.books.ksub, idx.books.ds).as("adc"))
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(round(col("adc"), 6).asc, col("id"))
    scored.withColumn("prk", row_number().over(wAdc))
      .filter(col("prk") <= k * poolMult)
      .select(col("qid"), col("id"))
  }

  /** Exact-cosine re-rank of a candidate pool against (id, vec) rows. */
  def refine(pool: DataFrame, queries: DataFrame, vectors: DataFrame,
             k: Int): DataFrame = {
    val re = pool
      .join(vectors, "id")
      .join(broadcast(queries), "qid")
      .select(col("qid"), col("id"),
        GraftFunctions.vec_cosine(col("qvec"), col("vec")).as("cos"))
    val wCos = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id"))
    re.withColumn("rk", row_number().over(wCos))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
  }

  /** Lay the encoded corpus out as `cid=<n>/` partition dirs — the
    * at-rest form: probed lists prune at file listing, and each row is
    * m code bytes, not 4·D floats.
    */
  def writePartitioned(corpus: DataFrame, vecCol: String, idCol: String,
                       idx: Index, path: String): Unit =
    encode(corpus, vecCol, idCol, idx)
      .write.mode("overwrite").partitionBy("cid").parquet(path)

  /** Search the partitioned layout: probed cids become a literal
    * partition filter (file-listing prune), then the [[search]] body
    * runs over just those lists' code rows. `refineWith` is the float
    * corpus (or any (id, vec) source — e.g. a row-group-pruned read of
    * the original table by pool ids).
    */
  def searchPartitioned(spark: SparkSession, path: String,
                        queries: DataFrame, k: Int, idx: Index,
                        refineWith: DataFrame, nprobe: Int = 2,
                        poolMult: Int = 4): DataFrame = {
    val qp = IvfIndex.queryProbes(queries, idx.centroids, nprobe)
      .localCheckpoint()
    val cids = qp.select(col("cid")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val listed = spark.read.parquet(path).filter(col("cid").isin(cids: _*))
    // the probe set is checkpointed, so the search body's broadcast
    // reads the same materialized probes the cid collect did
    search(queries, listed, k, idx, refineWith, nprobe, poolMult)
  }

  /** Search with the re-rank vectors fetched from an ID-CLUSTERED
    * float lake instead of a full corpus DF: the pool's ids (bounded
    * by |queries|·k·poolMult — driver-tiny by the same contract as
    * [[searchPartitioned]]'s cid collect) become a literal IN filter
    * the parquet reader pushes to row-group stats, so an id-sorted
    * layout reads only the row groups holding pool members. The
    * composed at-rest story: codes live `cid=`-partitioned (probe
    * pruning), floats live id-clustered (refine pruning) — neither
    * side ever scans fully.
    */
  def searchLakeRefine(spark: SparkSession, codes: DataFrame,
                       floatPath: String, queries: DataFrame, k: Int,
                       idx: Index, nprobe: Int = 2,
                       poolMult: Int = 4): DataFrame = {
    val pool = adcPool(queries, codes, k, idx, nprobe, poolMult)
      .localCheckpoint()
    val ids = pool.select(col("id")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val vecs = spark.read.parquet(floatPath)
      .filter(col("id").isin(ids: _*))
    refine(pool, queries, vecs, k)
  }

  /** Both halves as one lake artifact (coarse/ + pq/ under `path`) —
    * they are only valid together (residuals are relative to THESE
    * centroids).
    */
  def saveIndex(spark: SparkSession, idx: Index, path: String): Unit = {
    IvfIndex.saveCodebook(spark, idx.centroids, s"$path/coarse")
    PqIndex.saveCodebooks(spark, idx.books, s"$path/pq")
  }

  def loadIndex(spark: SparkSession, path: String): Index =
    Index(IvfIndex.loadCodebook(spark, s"$path/coarse"),
      PqIndex.loadCodebooks(spark, s"$path/pq"))

  /** Restart-safe face mirroring [[IvfIndex.trainOrLoad]]. */
  def trainOrLoad(spark: SparkSession, path: String, corpus: DataFrame,
                  vecCol: String, idCol: String, k: Int, dim: Int,
                  m: Int = 8, ksub: Int = 16, iters: Int = 3,
                  sampleCap: Int = 4096): Index = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/coarse")))
      loadIndex(spark, path)
    else {
      val idx = train(corpus, vecCol, idCol, k, dim, m, ksub, iters, sampleCap)
      saveIndex(spark, idx, path)
      idx
    }
  }
}
