package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2.D12).
  *
  * Media (image/audio/video) live in the lake as opaque `binary`
  * columns plus a typed metadata struct; decode / feature-extraction
  * runs per-partition in fixed-size batches so a real decoder (JNI,
  * subprocess, Python worker) amortizes init cost per batch — the exact
  * shape `mapInPandas` gives PySpark. The container has no media
  * libraries, so THE DECODER HERE IS A DETERMINISTIC STUB — the Spark
  * plumbing (schema, batching, partition flow) is the real, tested
  * part; bind a real codec by passing a [[BatchDecoder]] to
  * [[extractFeatures]] at deploy time.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Attach a synthetic media payload to each document: a
    * deterministic binary blob (derived from the text) + metadata, the
    * layout a real ingest (S3 blob fetch) would produce.
    */
  def withFakeMedia(docs: DataFrame): DataFrame = {
    val payload = sha2(col("text"), 512).cast("binary")
    docs
      .withColumn("media", payload)
      .withColumn("media_meta", struct(
        lit("fake/raw").as("format"),
        (abs(xxhash64(col("doc_id"))) % 1920 + 1).cast("int").as("width"),
        (abs(xxhash64(col("doc_id"), lit(1))) % 1080 + 1).cast("int").as("height"),
        length(payload).cast("long").as("n_bytes")))
  }

  /** Columnar-batch decoder interface — the Arrow RecordBatch shape
    * (parallel arrays, one entry per row) rather than row tuples, so a
    * real codec (JNI, Arrow C data interface, subprocess feeding
    * `mapInArrow` on the PySpark side) binds here without touching the
    * Spark plan: implement `decode` over the arrays, pass the instance
    * to [[extractFeatures]]. Implementations must be Serializable
    * (shipped to executors once, reused across batches — init
    * heavyweight state lazily in a transient field).
    */
  trait BatchDecoder extends Serializable {
    /** @param ids      row ids, parallel to `payloads`
      * @param payloads raw media bytes, one per row
      * @return one feature vector per row, parallel to `ids`
      */
    def decode(ids: Array[Long], payloads: Array[Array[Byte]]): Array[Array[Float]]
  }

  /** STUB decoder: a real implementation would hand the batch to a
    * codec and return pixel/sample features. This one emits
    * deterministic pseudo-features (first-8-bytes checksum + size) so
    * the pipeline is testable end-to-end without media libraries.
    */
  object StubDecoder extends BatchDecoder {
    def decode(ids: Array[Long], payloads: Array[Array[Byte]]): Array[Array[Float]] =
      payloads.map { bytes =>
        val checksum = bytes.take(8).foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
        Array(checksum.toFloat, bytes.length.toFloat)
      }
  }

  /** Frame sampling: one media row → one row per sampled "frame"
    * (every `stride`-th block of `frameBytes` bytes). The frame
    * extraction itself is a STUB — real video decoding needs a codec —
    * but unlike [[extractFeatures]] this shape needs no imperative
    * batch loop at all: frame indices come from `sequence` + explode
    * and the slice from `substring`, so the whole fan-out stays in
    * whole-stage codegen and distributes like any other projection.
    * At 100 TB this matters: frame sampling multiplies row count, and
    * a columnar explode lets AQE re-split the inflated partitions.
    */
  def sampleFrames(media: DataFrame, idCol: String = "doc_id",
                   frameBytes: Int = 8, stride: Int = 2): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val nFrames = (length(col("media")) / frameBytes).cast("long")
    media.select(col(idCol), col("media"),
        explode(sequence(lit(0L), greatest(nFrames - 1, lit(0L)), lit(stride.toLong)))
          .as("frame_idx"))
      .filter(nFrames > 0)
      .select(col(idCol), col("frame_idx"),
        substring(col("media"), (col("frame_idx") * frameBytes + 1).cast("int"),
          lit(frameBytes)).as("frame"))
  }

  /** Feature extraction over the media column: per-partition columnar
    * batches fed to a [[BatchDecoder]] (batchSize tunes decoder
    * amortization vs memory). A typed `mapPartitions` keeps this
    * inside one Dataset plan — no `.rdd` drop, no re-analysis, so
    * pushed filters/pruning below and AQE above survive — while the
    * decoder sees exactly the parallel-array batch a `mapInArrow`
    * worker would. The output keeps the join key so features
    * re-attach with a co-partitioned join.
    */
  /** Reassemble a 48-bit fingerprint carried as two ≤24-bit Float
    * feature lanes (floats hold only 24 exact integer bits) — the ONE
    * definition of the 2²⁴ packing every dHash consumer shares.
    */
  def packHash(hi: org.apache.spark.sql.Column,
               lo: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    hi.cast("long") * lit(16777216L) + lo.cast("long")

  /** Decode + fingerprint a frame of (idCol, media) image bytes:
    * (idCol, width, height, phash) via [[MediaCodecs.BmpDHashDecoder]]
    * — shared by the D70 batch query, the E20 streaming gate, and the
    * scale probes.
    */
  def dhashImageFrame(media: DataFrame, idCol: String = "doc_id"): DataFrame =
    extractFeatures(media, idCol, decoder = MediaCodecs.BmpDHashDecoder)
      .select(col(idCol),
        element_at(col("features"), 1).cast("int").as("width"),
        element_at(col("features"), 2).cast("int").as("height"),
        packHash(element_at(col("features"), 3),
          element_at(col("features"), 4)).as("phash"))

  def extractFeatures(media: DataFrame, idCol: String = "doc_id",
                      batchSize: Int = 64,
                      decoder: BatchDecoder = StubDecoder): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { chunk =>
          val ids = new Array[Long](chunk.size)
          val payloads = new Array[Array[Byte]](chunk.size)
          var i = 0
          chunk.foreach { case (id, bytes) =>
            ids(i) = id; payloads(i) = bytes; i += 1
          }
          val feats = decoder.decode(ids, payloads)
          // a decoder that drops rows would silently truncate the zip
          // and mis-align ids with features — fail at the decoder
          require(feats.length == ids.length,
            s"BatchDecoder returned ${feats.length} rows for ${ids.length} inputs; " +
              "emit one (possibly empty) feature array per input row")
          ids.iterator.zip(feats.iterator)
        }
      }
      .toDF(idCol, "features")
  }
}
