package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, VectorAggregates}

/** Product quantization (Jégou et al. 2011) — the compression half of
  * IVF-PQ, beside [[IvfIndex]]'s list pruning. The D-dim vector splits
  * into `m` subspaces of `ds = D/m` dims; each subspace gets its own
  * small k-means codebook (trained with [[IvfIndex.train]]'s
  * deterministic Lloyd on sliced vectors) and each vector stores one
  * code byte per subspace: m bytes at rest vs 4·D for float32 —
  * 32× at (D=64, m=8) — with distances computable from the codes.
  *
  * Search is ADC (asymmetric distance computation): the raw query
  * against coded corpus rows, squared-L2 read off the codebooks by the
  * codegen [[graft.functions.PqAdc]] kernel. The codebooks ride the
  * serialized plan (`addReferenceObj`), the corpus side reads only
  * (id, codes) — the scan is 32× lighter than the float path, which
  * is the entire point at 100 TB: ADC nominates a candidate pool from
  * codes alone, and only the pool's true vectors are fetched for the
  * exact re-rank (`refineWith`).
  *
  * ADC ranking uses `round(adc, 6)` with the id tiebreak so the
  * candidate cut is reproducible across engines (the BM25 rounding
  * discipline); the refined output is exact cosine — bit-mirrorable.
  *
  * Codebooks persist like [[IvfIndex]]'s: one tiny parquet
  * (j, c, cvec) via [[saveCodebooks]]/[[loadCodebooks]].
  */
object PqIndex {

  /** books(j)(c) = centroid of code c in subspace j. */
  final case class Codebooks(ds: Int, books: Array[Array[Array[Float]]]) {
    def m: Int = books.length
    def ksub: Int = books.head.length
    /** [[graft.functions.GraftKernels.pqAdc]]'s layout. */
    lazy val flat: Array[Float] = {
      val out = new Array[Float](m * ksub * ds)
      for (j <- 0 until m; c <- 0 until ksub; i <- 0 until ds)
        out((j * ksub + c) * ds + i) = books(j)(c)(i)
      out
    }
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Codebooks]()

  def trainCached(key: String, corpus: DataFrame, vecCol: String,
                  idCol: String, dim: Int, m: Int = 8, ksub: Int = 16,
                  iters: Int = 3, sampleCap: Int = 4096): Codebooks =
    cache.computeIfAbsent(s"$key|d=$dim|m=$m|k=$ksub|it=$iters|cap=$sampleCap",
      _ => train(corpus, vecCol, idCol, dim, m, ksub, iters, sampleCap))

  /** One [[IvfIndex.train]] per subspace over the sliced vectors —
    * m small trainings on the same capped sample recipe.
    */
  def train(corpus: DataFrame, vecCol: String, idCol: String, dim: Int,
            m: Int = 8, ksub: Int = 16, iters: Int = 3,
            sampleCap: Int = 4096): Codebooks = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    // codes live in a SIGNED tinyint column: 128..255 would wrap
    // negative through the cast and decode()'s element_at would then
    // index the codebook from the END — cap at 128 so every code
    // round-trips as itself (the ADC kernel's & 0xFF is then a no-op)
    require(ksub >= 2 && ksub <= 128,
      s"ksub must fit a signed code byte (2..128), got $ksub")
    val ds = dim / m
    Codebooks(ds, (0 until m).map { j =>
      IvfIndex.train(
        corpus.select(col(idCol), slice(col(vecCol), j * ds + 1, ds).as("__sub")),
        "__sub", idCol, ksub, ds, iters, sampleCap)
    }.toArray)
  }

  /** Per-subspace nearest-centroid code bytes — a pure projection
    * (the write-time encode pass; no shuffle).
    */
  def encode(df: DataFrame, vecCol: String, cb: Codebooks): DataFrame =
    df.withColumn("codes",
      array((0 until cb.m).map { j =>
        VectorAggregates.nearest_centroid(
          slice(col(vecCol), j * cb.ds + 1, cb.ds),
          IvfIndex.centroidsLiteral(cb.books(j)))
      }: _*).cast("array<tinyint>"))

  /** Reconstruction (spec/debug path): codes → concatenated centroids. */
  def decode(codes: Column, cb: Codebooks): Column = {
    val booksLit = array(cb.books.map(IvfIndex.centroidsLiteral): _*)
    flatten(transform(sequence(lit(0), lit(cb.m - 1)), j =>
      element_at(element_at(booksLit, j + 1),
        element_at(codes, (j + 1).cast("int")).cast("int") + 1)))
  }

  /** Top-k per query. Without `refineWith`: ranked by ADC distance.
    * With it: ADC nominates `k · poolMult` candidates from codes
    * alone, the pool's true vectors join back by id, exact cosine
    * re-ranks — output (qid, id, cos, rk) like the other ANN paths.
    */
  def searchAdc(queries: DataFrame, codes: DataFrame, k: Int,
                cb: Codebooks, refineWith: Option[DataFrame] = None,
                poolMult: Int = 4): DataFrame = {
    val pool = if (refineWith.isDefined) k * poolMult else k
    val scored = codes.join(broadcast(queries), col("qid") =!= col("id"))
      .select(col("qid"), col("id"),
        GraftFunctions.pq_adc(col("qvec"), col("codes"),
          cb.flat, cb.ksub, cb.ds).as("adc"))
    val wAdc = Window.partitionBy(col("qid"))
      .orderBy(round(col("adc"), 6).asc, col("id"))
    val cand = scored.withColumn("rk", row_number().over(wAdc))
      .filter(col("rk") <= pool)
    refineWith match {
      case None => cand.select(col("qid"), col("id"), col("adc"), col("rk"))
      case Some(corpus) =>
        val re = cand.select(col("qid"), col("id"))
          .join(corpus, "id")
          .join(broadcast(queries), "qid")
          .select(col("qid"), col("id"),
            GraftFunctions.vec_cosine(col("qvec"), col("vec")).as("cos"))
        val wCos = Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("id"))
        re.withColumn("rk", row_number().over(wCos))
          .filter(col("rk") <= k)
          .select(col("qid"), col("id"), col("cos"), col("rk"))
    }
  }

  /** Persist the m codebooks as one tiny parquet of (j, c, cvec). */
  def saveCodebooks(spark: org.apache.spark.sql.SparkSession,
                    cb: Codebooks, path: String): Unit = {
    import spark.implicits._
    (for (j <- 0 until cb.m; c <- 0 until cb.ksub)
      yield (j, c, cb.books(j)(c).toSeq)).toDF("j", "c", "cvec")
      .select(col("j"), col("c"), col("cvec").cast("array<float>"))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadCodebooks(spark: org.apache.spark.sql.SparkSession,
                    path: String): Codebooks = {
    val rows = spark.read.parquet(path)
      .orderBy(col("j"), col("c")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    val books = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3)).toArray
    Codebooks(books.head.head.length, books)
  }
}
