package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{MediaCodecs, Multimodal, Tables}

/** D12 query faces: REAL media decode through the batched
  * `mapPartitions` plumbing ([[graft.sources.Multimodal.extractFeatures]]).
  *
  * Each document carries a synthetic-but-REAL media file — a 24-bit
  * BMP / PCM16 WAV whose pixel/sample values are a pure function of
  * `doc_id` — encoded to the true on-disk byte layout (row padding,
  * bottom-up rows, RIFF chunk framing) by [[graft.sources.MediaCodecs]],
  * then decoded back by the real parsers. The DuckDB oracle recomputes
  * the same stats from the generator arithmetic, so a hash match
  * proves the decoder recovered every pixel/sample byte-exactly
  * through the real container format. All stats are small integers
  * (exact in Float and in the BIGINT oracle).
  *
  * At scale: encode+decode is a per-row map inside one typed
  * `mapPartitions` — no shuffle, no driver state; the only exchange
  * is the final presentation sort.
  */
object MultimodalQueries {

  /** Deterministic image for a doc: w∈[2,7], h∈[2,5], channel values
    * walk `(a·id + 3i) mod 256` lanes. Kept in sync with the oracle
    * SQL in [[graft.SparkEntry]].
    */
  private[graft] def synthImage(id: Long): (Int, Int, Array[Int]) = {
    val w = (id % 6 + 2).toInt
    val h = (id % 4 + 2).toInt
    val px = Array.tabulate(w * h) { i =>
      val r = ((id * 7 + i.toLong * 3) % 256).toInt
      val g = ((id * 11 + i.toLong * 5) % 256).toInt
      val b = ((id * 13 + i.toLong * 7) % 256).toInt
      (r << 16) | (g << 8) | b
    }
    (w, h, px)
  }

  /** Deterministic audio for a doc: n∈[4,27] mono PCM16 samples in
    * [-2000, 2000], rate ∈ {8000..15000}.
    */
  private[graft] def synthAudio(id: Long): (Int, Array[Short]) = {
    val rate = (8000 + (id % 8) * 1000).toInt
    val n = (id % 24 + 4).toInt
    val samples = Array.tabulate(n) { i =>
      ((id * 131 + i.toLong * 17) % 4001 - 2000).toShort
    }
    (rate, samples)
  }

  /** D12a: image decode — encode each doc's synthetic image as a real
    * 24-bit BMP, decode it back through the batched decoder plumbing,
    * emit per-image channel stats.
    */
  def mediaDecodeImage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, px) = synthImage(id)
        (id, MediaCodecs.encodeBmp(w, h, px))
      })
      .toDF("doc_id", "media")
    Multimodal.extractFeatures(media, decoder = MediaCodecs.BmpStatsDecoder)
      .select(col("doc_id"),
        element_at(col("features"), 1).cast("int").as("width"),
        element_at(col("features"), 2).cast("int").as("height"),
        element_at(col("features"), 3).cast("long").as("sum_r"),
        element_at(col("features"), 4).cast("long").as("sum_g"),
        element_at(col("features"), 5).cast("long").as("sum_b"))
      .orderBy(col("doc_id"))
  }

  /** D12c: JPEG decode — each doc's synthetic image round-trips
    * through the pure-JVM baseline JPEG codec ([[graft.sources.JpegCodec]]:
    * REAL entropy coding — Huffman, quantized DCT, byte stuffing),
    * stats emitted via the same batched decoder plumbing as D12a.
    * Rows-only by nature: a lossy codec's decoded pixels are
    * implementation-defined at the last bit (T.81 fixes the
    * bitstream, not the IDCT rounding), so correctness is pinned in
    * MultimodalSpec — byte-exact hand-assembled DC-only streams,
    * restart-marker resets, and cross-validation against
    * `javax.imageio` in BOTH directions — not by a SQL oracle.
    */
  def mediaDecodeJpeg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, px) = synthImage(id)
        (id, graft.sources.JpegCodec.encodeJpeg(w, h, px))
      })
      .toDF("doc_id", "media")
    Multimodal.extractFeatures(media,
        decoder = graft.sources.JpegCodec.JpegStatsDecoder)
      .select(col("doc_id"),
        element_at(col("features"), 1).cast("int").as("width"),
        element_at(col("features"), 2).cast("int").as("height"),
        element_at(col("features"), 3).cast("long").as("sum_r"),
        element_at(col("features"), 4).cast("long").as("sum_g"),
        element_at(col("features"), 5).cast("long").as("sum_b"))
      .orderBy(col("doc_id"))
  }

  /** D12d: PNG decode — each doc's synthetic image round-trips
    * through the pure-JVM PNG codec ([[graft.sources.PngCodec]]: real
    * zlib via `java.util.zip`, CRC-verified chunk walk, and a filter
    * rotation that exercises ALL FIVE scanline predictors). PNG is
    * lossless, so unlike D12c this face is hash-green DuckDB-oracled:
    * the oracle recomputes the stats from the generator arithmetic
    * and a hash match proves every pixel survived deflate + filter
    * round-trip byte-exactly.
    */
  def mediaDecodePng(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, px) = synthImage(id)
        (id, graft.sources.PngCodec.encodePng(w, h, px))
      })
      .toDF("doc_id", "media")
    Multimodal.extractFeatures(media,
        decoder = graft.sources.PngCodec.PngStatsDecoder)
      .select(col("doc_id"),
        element_at(col("features"), 1).cast("int").as("width"),
        element_at(col("features"), 2).cast("int").as("height"),
        element_at(col("features"), 3).cast("long").as("sum_r"),
        element_at(col("features"), 4).cast("long").as("sum_g"),
        element_at(col("features"), 5).cast("long").as("sum_b"))
      .orderBy(col("doc_id"))
  }

  /** D12e: GIF decode — each doc's synthetic image round-trips
    * through the pure-JVM GIF codec ([[graft.sources.GifCodec]]:
    * palette build, real LZW with variable code widths, sub-block
    * framing). GIF is lossless (palette-indexed, and these images
    * have ≤30 distinct colors), so like D12d the face is hash-green
    * DuckDB-oracled: the oracle recomputes the stats from the
    * generator arithmetic and a hash match proves every pixel
    * survived the LZW round-trip byte-exactly.
    */
  def mediaDecodeGif(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, px) = synthImage(id)
        (id, graft.sources.GifCodec.encodeGif(w, h, px))
      })
      .toDF("doc_id", "media")
    Multimodal.extractFeatures(media,
        decoder = graft.sources.GifCodec.GifStatsDecoder)
      .select(col("doc_id"),
        element_at(col("features"), 1).cast("int").as("width"),
        element_at(col("features"), 2).cast("int").as("height"),
        element_at(col("features"), 3).cast("long").as("sum_r"),
        element_at(col("features"), 4).cast("long").as("sum_g"),
        element_at(col("features"), 5).cast("long").as("sum_b"))
      .orderBy(col("doc_id"))
  }

  /** D70: perceptual image near-dup pairs — each doc's synthetic
    * image round-trips through the REAL BMP codec, the decoder emits
    * the 48-bit dHash of the decoded pixels, and
    * [[graft.operators.MediaDedup.phashPairs]] finds all pairs
    * within Hamming distance 2 via the complete banded self-join
    * (4 × 12-bit slices). The oracle recomputes the fingerprints
    * from the pixel-generator arithmetic, so a hash match proves
    * decode + fingerprint + banding end to end.
    */
  def mediaDedupPhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, px) = synthImage(id)
        (id, MediaCodecs.encodeBmp(w, h, px))
      })
      .toDF("doc_id", "media")
    val hashes = Multimodal.dhashImageFrame(media)
    graft.operators.MediaDedup.phashPairs(hashes, "doc_id", "phash",
        dimCols = Seq("width", "height"),
        hashBits = 48, bandBits = 12, bands = 4, maxHamming = 2)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** D70b: perceptual audio near-dup pairs — the [[mediaDedupPhash]]
    * recipe on the PCM amplitude contour: real WAV round-trip, sign-
    * of-slope dHash of the decoded samples, complete banded Hamming
    * join blocked on (sample_rate, n_samples).
    */
  def mediaDedupAudio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (rate, samples) = synthAudio(id)
        (id, MediaCodecs.encodeWavPcm16(rate, 1, samples))
      })
      .toDF("doc_id", "media")
    val hashes = Multimodal.extractFeatures(media,
        decoder = MediaCodecs.WavDHashDecoder)
      .select(col("doc_id"),
        element_at(col("features"), 1).cast("int").as("sample_rate"),
        element_at(col("features"), 2).cast("int").as("n_samples"),
        Multimodal.packHash(element_at(col("features"), 3),
          element_at(col("features"), 4)).as("phash"))
    graft.operators.MediaDedup.phashPairs(hashes, "doc_id", "phash",
        dimCols = Seq("sample_rate", "n_samples"),
        hashBits = 48, bandBits = 12, bands = 4, maxHamming = 2)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** D12b: audio decode — real RIFF/PCM16 WAV round-trip through the
    * same plumbing, emitting per-clip sample stats.
    */
  def mediaDecodeAudio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (rate, samples) = synthAudio(id)
        (id, MediaCodecs.encodeWavPcm16(rate, 1, samples))
      })
      .toDF("doc_id", "media")
    Multimodal.extractFeatures(media, decoder = MediaCodecs.WavStatsDecoder)
      .select(col("doc_id"),
        element_at(col("features"), 1).cast("int").as("sample_rate"),
        element_at(col("features"), 3).cast("long").as("n_samples"),
        element_at(col("features"), 4).cast("long").as("sum_amp"),
        element_at(col("features"), 5).cast("long").as("peak_amp"))
      .orderBy(col("doc_id"))
  }

  /** D12c's driver-visible witness: `media_decode_jpeg` is rows-only
    * by nature (lossy IDCT rounding is implementation-defined), and
    * until round 17 its cross-decoder validation lived only in
    * MultimodalSpec. This face registers THE COMPARISON ITSELF as a
    * query: for every doc, encode with [[graft.sources.JpegCodec]],
    * decode the SAME bitstream with BOTH our decoder and the JDK's
    * independent `javax.imageio` decoder, and count documents where
    * any channel of any pixel differs by more than the pinned
    * cross-decoder tolerance (4/255 — MultimodalSpec's bound; two
    * conforming T.81 IDCTs may disagree by a few ulps of rounding,
    * never more) or where either decoder disagrees on dimensions.
    * Expected mismatches: ZERO — which makes the result an exact
    * constant the DuckDB oracle states independently (n_docs from
    * the documents table, 0 mismatches), i.e. a hash-green witness
    * that the JPEG path agrees with an independent codec on EVERY
    * row of gate data, not just the spec's hand-built cases.
    *
    * Scale shape: embarrassingly parallel per-row map + one global
    * 2-long aggregate.
    */
  def mediaDecodeJpegWitness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val (w, h, px) = synthImage(id)
        val bytes = graft.sources.JpegCodec.encodeJpeg(w, h, px)
        val (dw, dh, dp) = graft.sources.JpegCodec.decodeJpeg(bytes)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        val bad =
          if (img == null || img.getWidth != w || img.getHeight != h ||
              dw != w || dh != h) 1L
          else {
            var worst = 0
            var i = 0
            while (i < w * h) {
              val a = img.getRGB(i % w, i / w)
              val b = dp(i)
              var ch = 0
              while (ch < 3) {
                val d = math.abs(((a >> (8 * ch)) & 0xff) -
                  ((b >> (8 * ch)) & 0xff))
                if (d > worst) worst = d
                ch += 1
              }
              i += 1
            }
            if (worst > 4) 1L else 0L
          }
        bad
      })
      .toDF("bad")
    perDoc.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(col("bad")).cast("long").as("n_mismatched"))
  }
}
