package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorAggregates

/** IVF (inverted-file) approximate nearest neighbor (SURVEY §2.D7
  * scale path beside the LSH variant).
  *
  * Coarse quantizer: deterministic distributed k-means — init from the
  * k lowest-id vectors, Lloyd iterations where assignment is a pure
  * projection (centroids travel as a literal in the plan, the corpus
  * is NEVER shuffled) and the update is one groupBy with the
  * [[graft.functions.VecSumAgg]] custom aggregate (k rows out).
  *
  * At 100 TB: train on a sample, store `cid` as a partition/bucket
  * column at write time; a query then reads only `nprobe` lists —
  * I/O proportional to nprobe/k of the corpus.
  */
object IvfIndex {

  /** Codebook cache: training is deterministic, so one codebook per
    * corpus key serves every subsequent search in the session — a
    * query must never re-run Lloyd (the round-1/2 defect was 1+3×iters
    * full-corpus scans per `ann_ivf_topk` call).
    */
  private val codebooks =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Array[Float]]]()

  def trainCached(key: String, corpus: DataFrame, vecCol: String, idCol: String,
                  k: Int, dim: Int, iters: Int = 3,
                  sampleCap: Int = 4096): Array[Array[Float]] =
    // hyperparameters are part of the cache identity — the same corpus
    // trained at a different k must not return the old codebook
    codebooks.computeIfAbsent(s"$key|k=$k|dim=$dim|it=$iters|cap=$sampleCap",
      _ => train(corpus, vecCol, idCol, k, dim, iters, sampleCap))

  /** Train the coarse quantizer; returns the centroids as a local
    * array (k × dim — small by construction, like any ANN codebook).
    *
    * Trains on a deterministic modulo-sample of ≤ ~`sampleCap` rows
    * (one cheap count to size the step, then every iteration scans the
    * materialized sample only — never the full corpus). A capped sample
    * is the standard IVF recipe: codebook quality needs thousands of
    * training points per centroid, not the whole 100 TB corpus.
    */
  def train(corpus: DataFrame, vecCol: String, idCol: String,
            k: Int, dim: Int, iters: Int = 3,
            sampleCap: Int = 4096): Array[Array[Float]] = {
    val n = corpus.count()
    val step = math.max(1L, n / math.max(k, sampleCap))
    // modulo-sample on a HASH of the id: uniform regardless of id
    // structure (dense, sparse, or constant-low-bit id schemes alike)
    val sample0 = corpus
      .filter(pmod(xxhash64(col(idCol)), lit(step)) === 0)
      .select(col(idCol), col(vecCol))
      .localCheckpoint()
    // guard: a pathologically thin sample falls back to the corpus
    val sample =
      if (step > 1 && sample0.count() < k)
        corpus.select(col(idCol), col(vecCol)).localCheckpoint()
      else sample0
    var centroids = sample.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    var it = 0
    while (it < iters) {
      val centLit = centroidsLiteral(centroids)
      val updated = sample
        .select(VectorAggregates.nearest_centroid(col(vecCol), centLit).as("cid"),
          col(vecCol).as("v"))
        .groupBy(col("cid"))
        .agg(VectorAggregates.vec_sum(col("v"), dim).as("sum"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0),
          r.getSeq[Double](1).toArray, r.getLong(2)))
      // empty clusters keep their previous centroid
      val next = centroids.clone()
      updated.foreach { case (cid, sum, n) =>
        next(cid) = sum.map(s => (s / n).toFloat)
      }
      centroids = next
      it += 1
    }
    centroids
  }

  /** Persist the codebook as a lake artifact: one tiny parquet of
    * (cid INT, cvec ARRAY<FLOAT>) rows. The in-session [[trainCached]]
    * map dies with the JVM; at 100 TB the codebook must outlive it —
    * retraining is a corpus-sample scan, and worse, a retrained
    * codebook INVALIDATES every `cid=`-partitioned layout written with
    * the old one. Write the codebook next to [[writePartitioned]]'s
    * output and load it for every later search/assign/append.
    */
  def saveCodebook(spark: org.apache.spark.sql.SparkSession,
                   centroids: Array[Array[Float]], path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cid", "cvec")
      .select(col("cid"), col("cvec").cast("array<float>"))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Read a [[saveCodebook]] artifact back; float bits round-trip
    * exactly through parquet, so searches against a loaded codebook
    * reproduce the training session's results bit-for-bit
    * (BucketingSpec pins the round-trip + search equality).
    */
  def loadCodebook(spark: org.apache.spark.sql.SparkSession,
                   path: String): Array[Array[Float]] =
    spark.read.parquet(path)
      .orderBy(col("cid"))
      .collect()
      .map(_.getSeq[Float](1).toArray)

  /** Restart-safe training face: load the codebook if the artifact
    * exists, else train and save it. The happy path after a restart is
    * one tiny parquet read — no corpus scan at all.
    */
  def trainOrLoad(spark: org.apache.spark.sql.SparkSession, path: String,
                  corpus: DataFrame, vecCol: String, idCol: String,
                  k: Int, dim: Int, iters: Int = 3,
                  sampleCap: Int = 4096): Array[Array[Float]] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(path)))
      loadCodebook(spark, path)
    else {
      val c = train(corpus, vecCol, idCol, k, dim, iters, sampleCap)
      saveCodebook(spark, c, path)
      c
    }
  }

  def centroidsLiteral(centroids: Array[Array[Float]]): Column =
    array(centroids.map(c => array(c.map(x => lit(x)): _*).cast("array<float>")): _*)

  /** Assign each row its inverted-list id — a projection, no shuffle.
    * This is the column a lake write would bucket/partition by.
    */
  def assign(df: DataFrame, vecCol: String,
             centroids: Array[Array[Float]]): DataFrame =
    df.withColumn("cid",
      VectorAggregates.nearest_centroid(col(vecCol), centroidsLiteral(centroids)))

  /** The `nprobe` nearest lists per query: (qid, qvec, cid).
    * Shared with [[IvfPq]] — the composed index probes coarse lists
    * with exactly the same ranking.
    */
  private[operators] def queryProbes(queries: DataFrame,
                                     centroids: Array[Array[Float]],
                                     nprobe: Int): DataFrame =
    if (nprobe <= 1) assign(queries, "qvec", centroids)
      .select(col("qid"), col("qvec"), col("cid"))
    else {
      // rank all centroids per query by distance, keep nprobe
      val centLit = centroidsLiteral(centroids)
      queries
        .select(col("qid"), col("qvec"),
          posexplode(centLit).as(Seq("cid", "cvec")))
        .withColumn("dist",
          graft.functions.GraftFunctions.vec_cosine(col("qvec"), col("cvec")))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("dist").desc, col("cid"))))
        .filter(col("rk") <= nprobe)
        .select(col("qid"), col("qvec"), col("cid"))
    }

  /** Score candidates meeting through the cid equality join, keep
    * top-k per query.
    */
  private def topkWithinLists(listed: DataFrame, qProbes: DataFrame,
                              k: Int): DataFrame = {
    val scored = listed.join(broadcast(qProbes), Seq("cid"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        graft.functions.GraftFunctions.vec_cosine(col("qvec"), col("vec")).as("cos"))
    scored.withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))))
      .filter(col("rk") <= k)
      .select(col("qid"), col("id"), col("cos"), col("rk"))
  }

  /** Approximate top-k: queries probe their own list only (nprobe=1)
    * or the `nprobe` nearest lists; candidates meet through an
    * equality join on cid.
    */
  def search(queries: DataFrame, corpus: DataFrame, k: Int,
             centroids: Array[Array[Float]], nprobe: Int = 1): DataFrame =
    topkWithinLists(assign(corpus, "vec", centroids),
      queryProbes(queries, centroids, nprobe), k)

  /** Write the corpus as an IVF-partitioned lake table — one
    * directory per inverted list (`cid=<n>/`). This is the at-rest
    * layout the scaladoc promises: a search then reads only the
    * probed lists' files.
    */
  def writePartitioned(corpus: DataFrame, centroids: Array[Array[Float]],
                       path: String): Unit =
    assign(corpus, "vec", centroids)
      .write.mode("overwrite").partitionBy("cid").parquet(path)

  /** Incremental insertion into the IVF lake: assign a NEW batch to
    * the FROZEN codebook and append into the same `cid=` layout — no
    * retrain, no rewrite of existing lists, no read of the resident
    * corpus. This is the ingestion loop of a production vector index
    * (new crawl lands daily; the codebook retrains on a cadence, not
    * per batch): recall degrades only as far as the data drifts from
    * the frozen centroids, which the D65 semantic-drift gate watches.
    * [[searchPartitioned]] over the grown table is identical to a
    * search over the union corpus with the same centroids, because
    * assignment is a pure per-row function of (vec, codebook) —
    * SimilaritySpec pins that equality.
    */
  def appendPartitioned(batch: DataFrame, centroids: Array[Array[Float]],
                        path: String): Unit =
    assign(batch, "vec", centroids)
      .write.mode("append").partitionBy("cid").parquet(path)

  /** Search an IVF-partitioned table: the probed cids (≤ queries ×
    * nprobe values — the query set is broadcast-small by contract, so
    * the collect is a handful of ints) become a literal partition
    * filter, pruning unprobed lists' files at planning time.
    * I/O ∝ nprobe/k of the corpus; BucketingSpec pins the file-count
    * reduction and result equality with [[search]].
    */
  def searchPartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
                        queries: DataFrame, k: Int,
                        centroids: Array[Array[Float]],
                        nprobe: Int = 1): DataFrame = {
    // materialize the (tiny) probe set once: the cid collect and the
    // broadcast join both read the checkpoint, not a recomputed plan
    val qProbes = queryProbes(queries, centroids, nprobe).localCheckpoint()
    val cids = qProbes.select(col("cid")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val listed = spark.read.parquet(path).filter(col("cid").isin(cids: _*))
    topkWithinLists(listed, qProbes, k)
  }
}
