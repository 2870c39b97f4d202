package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Multimodal, Tables}

/** Multimodal plumbing: schema, batching, determinism (decode itself
  * is a documented stub — SURVEY §2.D12).
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("withFakeMedia produces binary payload + typed metadata") {
    val df = Multimodal.withFakeMedia(Tables.documents(spark, sfDir))
    val schema = df.schema
    assert(schema("media").dataType.typeName == "binary")
    // compare names+types (nullability differs for literal-backed fields)
    val metaFields = schema("media_meta").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq
    assert(metaFields == Multimodal.mediaMetaType.fields
      .map(f => (f.name, f.dataType)).toSeq)
    val row = df.select(col("media"), col("media_meta.n_bytes"),
      col("media_meta.width"), col("media_meta.height")).head()
    assert(row.getAs[Array[Byte]](0).length == row.getLong(1))
    assert(row.getInt(2) >= 1 && row.getInt(2) <= 1920)
    assert(row.getInt(3) >= 1 && row.getInt(3) <= 1080)
  }

  test("sampleFrames: columnar fan-out with exact frame count, width, and content") {
    val media = Multimodal.withFakeMedia(Tables.documents(spark, sfDir))
    val frames = Multimodal.sampleFrames(media, frameBytes = 8, stride = 2)
    // expected rows per doc: ceil((len / frameBytes) / stride)
    val one = media.select(col("doc_id"), col("media")).head()
    val payloadLen = one.getAs[Array[Byte]](1).length
    val expectRows = ((payloadLen / 8) + 1) / 2
    val perDoc = frames.groupBy(col("doc_id")).count().collect()
    assert(perDoc.nonEmpty)
    assert(perDoc.forall(_.getLong(1) == expectRows),
      s"expected $expectRows sampled frames per doc, got ${perDoc.take(3).toSeq}")
    // every frame is exactly frameBytes wide and matches a driver slice
    val expect = one.getAs[Array[Byte]](1).grouped(8).toSeq
    val got = frames.filter(col("doc_id") === one.getLong(0))
      .orderBy(col("frame_idx")).collect()
      .map(r => (r.getLong(1), r.getAs[Array[Byte]](2)))
    assert(got.map(_._1).toSeq == (0L until (payloadLen / 8).toLong by 2L).toSeq)
    got.foreach { case (idx, bytes) =>
      assert(bytes.toSeq == expect(idx.toInt).toSeq, s"frame $idx content diverges")
    }
    // stays columnar: no ScalaUDF / RDD scan in the plan
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("ExistingRDD"),
      s"frame sampling should be pure column ops:\n$plan")
  }

  test("sampleFrames: partial trailing blocks dropped, short/empty media yield no rows") {
    import spark.implicits._
    val media = Seq(
      (1L, Array.tabulate(13)(_.toByte)),  // 1 full frame, 5-byte tail
      (2L, Array.tabulate(5)(_.toByte)),   // shorter than a frame
      (3L, Array.empty[Byte]),             // empty payload
      (4L, Array.tabulate(16)(_.toByte)))  // exactly 2 frames
      .toDF("doc_id", "media")
    val frames = Multimodal.sampleFrames(media, frameBytes = 8, stride = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Array[Byte]](2)))
    val byDoc = frames.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byDoc(1L).map(_._2).toSeq == Seq(0L), "13 bytes → one full frame only")
    assert(byDoc(1L).head._3.toSeq == (0 until 8).map(_.toByte).toSeq,
      "trailing partial block must not leak into the frame")
    assert(!byDoc.contains(2L), "media shorter than a frame yields no rows")
    assert(!byDoc.contains(3L), "empty media yields no rows")
    assert(byDoc(4L).map(_._2).toSeq == Seq(0L, 1L))
    assert(byDoc(4L)(1)._3.toSeq == (8 until 16).map(_.toByte).toSeq)
  }

  test("extractFeatures is deterministic, total, and batch-size independent") {
    val media = Multimodal.withFakeMedia(Tables.documents(spark, sfDir))
    val f1 = Multimodal.extractFeatures(media, batchSize = 64)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7), batchSize = 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(f1.size == media.count())
    assert(f1 == f2, "features must not depend on partitioning or batch size")
  }

  test("a custom BatchDecoder binds without plan surgery") {
    val media = Multimodal.withFakeMedia(Tables.documents(spark, sfDir))
    val custom = new Multimodal.BatchDecoder {
      def decode(ids: Array[Long], payloads: Array[Array[Byte]]): Array[Array[Float]] =
        ids.zip(payloads).map { case (id, p) => Array(id.toFloat, p.length.toFloat) }
    }
    val out = Multimodal.extractFeatures(media, batchSize = 16, decoder = custom)
    val got = out.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(got.nonEmpty && got.forall { case (id, f) => f.head == id.toFloat })
    // the swap is plan-free: still ONE Dataset plan — a typed
    // MapPartitions above the scan, not an RDD round-trip that would
    // sever pushdown below and AQE above
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan ExistingRDD"),
      "extractFeatures must not drop to .rdd + createDataFrame")
  }

  // ------------------------------------------------------- D12 codecs

  test("decodeBmp: hand-built 2x2 24-bit BMP fixture, byte-for-byte") {
    import graft.sources.MediaCodecs
    // 2x2, stride 8 (2-byte pad), bottom-up BGR rows. Logical pixels
    // (top-down): (0,0)=red (0,1)=green / (1,0)=blue (1,1)=white.
    val fixture: Array[Byte] = Array[Int](
      'B', 'M',             // magic
      70, 0, 0, 0,          // file size = 54 + 16
      0, 0, 0, 0,           // reserved
      54, 0, 0, 0,          // pixel data offset
      40, 0, 0, 0,          // BITMAPINFOHEADER size
      2, 0, 0, 0,           // width = 2
      2, 0, 0, 0,           // height = 2 (bottom-up)
      1, 0,                 // planes
      24, 0,                // bpp
      0, 0, 0, 0,           // BI_RGB
      16, 0, 0, 0,          // pixel data size
      0x13, 0x0b, 0, 0,     // 2835 ppm x
      0x13, 0x0b, 0, 0,     // 2835 ppm y
      0, 0, 0, 0, 0, 0, 0, 0, // palette fields
      // bottom row first (logical y=1): blue, white, pad
      0xff, 0x00, 0x00, 0xff, 0xff, 0xff, 0, 0,
      // top row (logical y=0): red, green, pad
      0x00, 0x00, 0xff, 0x00, 0xff, 0x00, 0, 0
    ).map(_.toByte)
    val (w, h, px) = MediaCodecs.decodeBmp(fixture)
    assert((w, h) == (2, 2))
    assert(px.toSeq == Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff))
    // the encoder reproduces the fixture byte-for-byte
    assert(MediaCodecs.encodeBmp(2, 2, px).toSeq == fixture.toSeq)
  }

  test("decodeBmp: top-down (negative height) images and odd-width padding") {
    import graft.sources.MediaCodecs
    // flip the fixture to top-down: height = -2, rows in logical order
    val px = Array(0x102030, 0x405060, 0x708090, 0xa0b0c0, 0xd0e0f0, 0x112233)
    val enc = MediaCodecs.encodeBmp(3, 2, px) // width 3 → stride 12, pad 3
    val buf = java.nio.ByteBuffer.wrap(enc).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -2) // declare top-down
    // swap the two rows in place so content still matches logical order
    val row0 = enc.slice(54, 54 + 9)
    val row1 = enc.slice(66, 66 + 9)
    System.arraycopy(row1, 0, enc, 54, 9)
    System.arraycopy(row0, 0, enc, 66, 9)
    val (w, h, got) = MediaCodecs.decodeBmp(enc)
    assert((w, h) == (3, 2) && got.toSeq == px.toSeq)
  }

  test("BMP and PPM round-trip across widths that exercise every pad amount") {
    import graft.sources.MediaCodecs
    for (w <- 1 to 5; h <- Seq(1, 3)) {
      val px = Array.tabulate(w * h)(i => (i * 2654435761L % 0x1000000).toInt)
      val (bw, bh, bpx) = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(w, h, px))
      assert((bw, bh) == (w, h) && bpx.toSeq == px.toSeq, s"bmp ${w}x$h")
      val (pw, ph, ppx) = MediaCodecs.decodePpm(MediaCodecs.encodePpm(w, h, px))
      assert((pw, ph) == (w, h) && ppx.toSeq == px.toSeq, s"ppm ${w}x$h")
    }
  }

  test("decodePpm: header comments and whitespace variants") {
    import graft.sources.MediaCodecs
    val body = Array[Byte](1, 2, 3, 4, 5, 6)
    val header = "P6\n# a comment\n2\t1\n# another\n255\n".getBytes("US-ASCII")
    val (w, h, px) = MediaCodecs.decodePpm(header ++ body)
    assert((w, h) == (2, 1))
    assert(px.toSeq == Seq(0x010203, 0x040506))
  }

  test("decodeWavPcm16: hand-built fixture with a LIST chunk before data") {
    import graft.sources.MediaCodecs
    val buf = java.nio.ByteBuffer.allocate(44 + 12 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + 12 + 6)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(22050).putInt(44100)
      .putShort(2).putShort(16)
    buf.put("LIST".getBytes("US-ASCII")).putInt(4)
      .put("INFO".getBytes("US-ASCII"))       // skippable metadata chunk
    buf.put("data".getBytes("US-ASCII")).putInt(6)
      .putShort(1000).putShort(-2000).putShort(32767)
    val wav = MediaCodecs.decodeWavPcm16(buf.array())
    assert(wav.sampleRate == 22050 && wav.channels == 1)
    assert(wav.samples.toSeq == Seq[Short](1000, -2000, 32767))
  }

  test("WAV round-trip incl. stereo; malformed inputs rejected") {
    import graft.sources.MediaCodecs
    val samples = Array.tabulate(10)(i => ((i * 7919) % 65536 - 32768).toShort)
    val wav = MediaCodecs.decodeWavPcm16(
      MediaCodecs.encodeWavPcm16(16000, 2, samples))
    assert(wav.sampleRate == 16000 && wav.channels == 2)
    assert(wav.samples.toSeq == samples.toSeq)
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeWavPcm16("RIFFxxxxNOPE".getBytes ++ new Array[Byte](40))
    }
    intercept[IllegalArgumentException] {
      MediaCodecs.decodeBmp(Array.fill[Byte](60)(0))
    }
  }

  test("media decode query faces match a driver-side recomputation") {
    import graft.queries.MultimodalQueries
    val img = MultimodalQueries.mediaDecodeImage(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(img.nonEmpty)
    img.foreach { case (id, (w, h, sr, sg, sb)) =>
      val (ew, eh, px) = MultimodalQueries.synthImage(id)
      assert((w, h) == (ew, eh), s"doc $id dims")
      assert(sr == px.map(p => ((p >> 16) & 0xff).toLong).sum, s"doc $id sum_r")
      assert(sg == px.map(p => ((p >> 8) & 0xff).toLong).sum, s"doc $id sum_g")
      assert(sb == px.map(p => (p & 0xff).toLong).sum, s"doc $id sum_b")
    }
    val aud = MultimodalQueries.mediaDecodeAudio(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    aud.foreach { case (id, (rate, n, sum, peak)) =>
      val (eRate, samples) = MultimodalQueries.synthAudio(id)
      assert(rate == eRate && n == samples.length, s"doc $id header")
      assert(sum == samples.map(_.toLong).sum, s"doc $id sum_amp")
      assert(peak == samples.map(s => math.abs(s.toLong)).max, s"doc $id peak")
    }
  }

  test("fingerprint custom expression matches a scala reference and survives codegen") {
    val ref = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        var h = 0L
        r.getString(1).getBytes("UTF-8").foreach(b => h = (h * 31 + (b & 0xff)) % 1000000007L)
        (r.getLong(0), h)
      }.toMap
    val got = graft.queries.TextQueries.textFingerprint(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == ref)
    // SQL registration path
    graft.functions.Fingerprint.register(spark)
    Tables.documents(spark, sfDir).createOrReplaceTempView("docs_fp")
    val viaSql = spark.sql(
      "SELECT doc_id, rolling_fingerprint(text) AS fp FROM docs_fp")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaSql == ref)
  }

  test("dHash + banded Hamming join: hand fixtures, completeness vs brute force, dims block") {
    import spark.implicits._
    import graft.sources.MediaCodecs
    import graft.operators.MediaDedup
    // base image 3x3 with a clear gradient; variants flip few pixels
    def img(bright: Int, tweak: Map[Int, Int] = Map.empty): Array[Int] =
      Array.tabulate(9) { i =>
        val v = math.min(255, math.max(0,
          tweak.getOrElse(i, i * 20 + bright)))
        (v << 16) | (v << 8) | v
      }
    def dhash(px: Array[Int]): Long = {
      def gray(p: Int) = (((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)) / 3
      (0 until math.min(px.length - 1, 48)).foldLeft(0L) { (h, i) =>
        if (gray(px(i + 1)) > gray(px(i))) h | (1L << i) else h
      }
    }
    // brightness shift leaves every gradient sign intact -> hamming 0
    assert(dhash(img(0)) == dhash(img(30)), "dHash is brightness-invariant")
    val imgs = Seq(
      1L -> img(0),               // base
      2L -> img(40),              // brightness shift: hamming 0 vs 1
      3L -> img(0, Map(4 -> 0)),  // one pixel crushed: small hamming
      4L -> img(0).reverse)       // reversed gradient: far
    val decoded = imgs.map { case (id, px) =>
      val feats = MediaCodecs.BmpDHashDecoder.decode(Array(id),
        Array(MediaCodecs.encodeBmp(3, 3, px)))(0)
      (id, feats(0).toInt, feats(1).toInt,
        feats(2).toLong * 16777216L + feats(3).toLong)
    }
    // decoder path == direct-pixel dHash (proves the BMP round-trip)
    decoded.foreach { case (id, w, h, ph) =>
      assert((w, h) == (3, 3))
      assert(ph == dhash(imgs.find(_._1 == id).get._2), s"id $id")
    }
    val hashes = decoded.toDF("doc_id", "width", "height", "phash")
    val got = MediaDedup.phashPairs(hashes, "doc_id", "phash",
        maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over all pairs
    val want = (for {
      Seq((ia, _, _, ha), (ib, _, _, hb)) <- decoded.combinations(2)
      hd = java.lang.Long.bitCount(ha ^ hb) if hd <= 2
    } yield (math.min(ia, ib), math.max(ia, ib), hd)).toSet
    assert(got == want, s"got $got want $want")
    assert(got.contains((1L, 2L, 0)), "brightness twin found at hamming 0")
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L),
      "reversed gradient stays unpaired")
    // different dimensions never pair even at hamming 0
    val other = (decoded :+ ((5L, 2, 2, decoded.head._4)))
      .toDF("doc_id", "width", "height", "phash")
    val got2 = MediaDedup.phashPairs(other, "doc_id", "phash",
        maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got2.exists(p => p._1 == 5L || p._2 == 5L))
    // exact-hash pre-collapse: the brightness twins (hamming 0, same
    // fingerprint) fold to ONE canonical (min id); distinct prints
    // stay separate
    val collapsed = MediaDedup.collapseExact(hashes, "doc_id", "phash")
      .collect().map(r => (r.getLong(3), r.getLong(4))).toSet
    assert(collapsed.contains((1L, 2L)), "ids 1+2 share a fingerprint")
    assert(collapsed.count(_._2 == 1L) == 2, "3 and 4 stay singletons")
    // guards
    assertThrows[IllegalArgumentException] {
      MediaDedup.phashPairs(hashes, "doc_id", "phash",
        bands = 2, maxHamming = 2)
    }
    assertThrows[IllegalArgumentException] {
      MediaDedup.phashPairs(hashes, "doc_id", "phash",
        hashBits = 64, bandBits = 12, bands = 4)
    }
  }

  // ------------------------------------------------------ JPEG (D12c)

  /** Hand-assemble a minimal baseline grayscale JPEG: flat quant q,
    * DC cats at 5 bits (vals 0..11), AC table = EOB only (1-bit
    * code), one component, DC-only blocks with the given per-MCU
    * diffs, optional DRI=1 restarts between MCUs. DC-only blocks
    * make the expected pixels EXACT: every sample = dc·q/8 + 128.
    */
  private def handJpeg(w: Int, h: Int, q: Int, dcDiffs: Seq[Int],
                       restarts: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    w8(0xff); w8(0xd8)                                   // SOI
    w8(0xff); w8(0xdb); w16(2 + 65); w8(0)               // DQT id 0
    (0 until 64).foreach(_ => w8(q))
    w8(0xff); w8(0xc0); w16(2 + 9)                       // SOF0, 1 comp
    w8(8); w16(h); w16(w); w8(1); w8(1); w8(0x11); w8(0)
    w8(0xff); w8(0xc4); w16(2 + 17 + 12); w8(0x00)       // DHT DC 0
    val dcBits = Array(0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcBits.foreach(w8); (0 until 12).foreach(w8)
    w8(0xff); w8(0xc4); w16(2 + 17 + 1); w8(0x10)        // DHT AC 0: EOB@1
    val acBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    acBits.foreach(w8); w8(0x00)
    if (restarts) { w8(0xff); w8(0xdd); w16(4); w16(1) } // DRI = 1
    w8(0xff); w8(0xda); w16(2 + 6)                       // SOS
    w8(1); w8(1); w8(0x00); w8(0); w8(63); w8(0)
    // entropy data per MCU: huff(cat) + cat bits of diff + EOB('0')
    def cat(v: Int): Int = { var a = math.abs(v); var t = 0
      while (a != 0) { a >>= 1; t += 1 }; t }
    var rst = 0
    dcDiffs.zipWithIndex.foreach { case (d, i) =>
      var bits = 0L; var n = 0
      def put(code: Int, len: Int): Unit = {
        bits = (bits << len) | (code & ((1L << len) - 1)); n += len }
      val t = cat(d)
      put(t, 5)                                          // DC symbol t
      if (t > 0) put(if (d < 0) d + (1 << t) - 1 else d, t)
      put(0, 1)                                          // EOB
      while (n % 8 != 0) { put(1, 1) }                   // byte-align (pad 1s)
      (1 to n / 8).foreach { k =>
        val b = ((bits >> (n - 8 * k)) & 0xff).toInt
        w8(b); if (b == 0xff) w8(0x00)
      }
      if (restarts && i < dcDiffs.length - 1) {
        w8(0xff); w8(0xd0 + rst); rst = (rst + 1) % 8
      }
    }
    w8(0xff); w8(0xd9)                                   // EOI
    out.toByteArray
  }

  test("JPEG decode: hand-assembled DC-only stream is byte-exact") {
    import graft.sources.JpegCodec
    // one 8x8 MCU, q=16, DC diff 8 → every pixel = 8·16/8 + 128 = 144
    val (w, h, px) = JpegCodec.decodeJpeg(
      handJpeg(8, 8, q = 16, dcDiffs = Seq(8), restarts = false))
    assert((w, h) == ((8, 8)))
    assert(px.forall(_ == 0x909090), s"got ${px.take(4).map(_.toHexString).toSeq}")
    // negative diff: DC −8 → 128 − 16 = 112 = 0x70
    val (_, _, px2) = JpegCodec.decodeJpeg(
      handJpeg(8, 8, q = 16, dcDiffs = Seq(-8), restarts = false))
    assert(px2.forall(_ == 0x707070))
  }

  test("JPEG decode: restart markers reset DC prediction, byte-exact") {
    import graft.sources.JpegCodec
    // 16x8 = two MCUs with DRI=1: the second block's diff 8 lands on
    // a RESET predictor, so both halves decode to 144 — without the
    // reset the second would be 272-clamped
    val (w, h, px) = JpegCodec.decodeJpeg(
      handJpeg(16, 8, q = 16, dcDiffs = Seq(8, 8), restarts = true))
    assert((w, h) == ((16, 8)))
    assert(px.forall(_ == 0x909090), s"got ${px.take(4).map(_.toHexString).toSeq}")
  }

  test("JPEG round-trip: own encoder → own decoder within quantization error") {
    import graft.sources.JpegCodec
    // smooth gradient (JPEG's friendly case): tight bound
    val w = 19; val h = 13
    val smooth = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val r = 40 + x * 8; val g = 60 + y * 9; val b = 200 - x * 4
      (r << 16) | (g << 8) | b
    }
    val (dw, dh, dec) = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(w, h, smooth))
    assert((dw, dh) == ((w, h)))
    val errs = smooth.zip(dec).flatMap { case (a, b) =>
      Seq(math.abs(((a >> 16) & 0xff) - ((b >> 16) & 0xff)),
        math.abs(((a >> 8) & 0xff) - ((b >> 8) & 0xff)),
        math.abs((a & 0xff) - (b & 0xff)))
    }
    assert(errs.max <= 12, s"max channel error ${errs.max}")
    assert(errs.sum.toDouble / errs.length <= 3.0,
      s"mean channel error ${errs.sum.toDouble / errs.length}")
    // the engine's own synthetic images (high-frequency mod-256
    // lanes — JPEG's WORST case) still round-trip boundedly
    val (sw, sh, spx) = graft.queries.MultimodalQueries.synthImage(4242L)
    val (_, _, sdec) = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(sw, sh, spx))
    val serrs = spx.zip(sdec).flatMap { case (a, b) =>
      Seq(math.abs(((a >> 16) & 0xff) - ((b >> 16) & 0xff)),
        math.abs(((a >> 8) & 0xff) - ((b >> 8) & 0xff)),
        math.abs((a & 0xff) - (b & 0xff)))
    }
    assert(serrs.sum.toDouble / serrs.length <= 40.0)
  }

  test("JPEG cross-decoder: javax.imageio reads our bytes, we read its (incl. 4:2:0)") {
    import graft.sources.JpegCodec
    val w = 24; val h = 17
    val smooth = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((30 + x * 6) << 16) | ((50 + y * 7) << 8) | (220 - x * 5)
    }
    // direction 1: the JDK's independent decoder reads OUR bitstream
    val ours = JpegCodec.encodeJpeg(w, h, smooth)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ours))
    assert(img != null, "ImageIO could not parse our JPEG — bitstream invalid")
    assert(img.getWidth == w && img.getHeight == h)
    val mine = JpegCodec.decodeJpeg(ours)._3
    val d1 = (0 until w * h).flatMap { i =>
      val a = img.getRGB(i % w, i / w); val b = mine(i)
      Seq(math.abs(((a >> 16) & 0xff) - ((b >> 16) & 0xff)),
        math.abs(((a >> 8) & 0xff) - ((b >> 8) & 0xff)),
        math.abs((a & 0xff) - (b & 0xff)))
    }
    assert(d1.max <= 4,
      s"our decode differs from ImageIO on the same stream by ${d1.max}")
    // direction 2: WE read the JDK writer's stream (its default path
    // exercises third-party Huffman tables and chroma subsampling)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w * h).foreach(i => bi.setRGB(i % w, i / w, smooth(i)))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "jpg", baos)
    val theirs = baos.toByteArray
    val (tw, th2, tdec) = JpegCodec.decodeJpeg(theirs)
    assert((tw, th2) == ((w, h)))
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(theirs))
    val d2 = (0 until w * h).flatMap { i =>
      val a = ref.getRGB(i % w, i / w); val b = tdec(i)
      Seq(math.abs(((a >> 16) & 0xff) - ((b >> 16) & 0xff)),
        math.abs(((a >> 8) & 0xff) - ((b >> 8) & 0xff)),
        math.abs((a & 0xff) - (b & 0xff)))
    }
    assert(d2.sum.toDouble / d2.length <= 3.0,
      s"mean diff vs ImageIO ${d2.sum.toDouble / d2.length}")
    assert(d2.max <= 24, s"max diff vs ImageIO ${d2.max} (upsampling edges)")
  }

  test("JPEG batched decoder: stats features over real entropy-coded payloads") {
    import spark.implicits._
    import graft.sources.JpegCodec
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id")).as[Long].limit(64)
      .mapPartitions(_.map { id =>
        val (w, h, px) = graft.queries.MultimodalQueries.synthImage(id)
        (id, JpegCodec.encodeJpeg(w, h, px))
      }).toDF("doc_id", "media")
    val feats = Multimodal.extractFeatures(media,
        decoder = JpegCodec.JpegStatsDecoder)
      .select(col("doc_id"),
        element_at(col("features"), 1).cast("int").as("width"),
        element_at(col("features"), 2).cast("int").as("height"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(feats.size == 64)
    feats.foreach { case (id, (w, h)) =>
      val (ew, eh, _) = graft.queries.MultimodalQueries.synthImage(id)
      assert((w, h) == ((ew, eh)), s"doc $id dims")
    }
  }

  // ---- PNG (D12d) -------------------------------------------------------

  test("PNG round-trip is LOSSLESS and exercises all five filters") {
    import graft.sources.PngCodec
    // h = 7 > 5 rows ⇒ the y%5 rotation hits None/Sub/Up/Average/Paeth
    val w = 11; val h = 7
    val px = Array.tabulate(w * h) { i =>
      val r = (i * 37 + 11) % 256; val g = (i * 53 + 200) % 256
      val b = (i * 91 + 3) % 256
      (r << 16) | (g << 8) | b
    }
    val bytes = PngCodec.encodePng(w, h, px)
    val (dw, dh, dec) = PngCodec.decodePng(bytes)
    assert((dw, dh) == ((w, h)))
    assert(dec.sameElements(px), "lossless round-trip must be bit-exact")
    // 1-row and 1-col edge shapes (no left/up neighbors on most lanes)
    for ((ww, hh) <- Seq((1, 9), (9, 1), (1, 1))) {
      val p2 = Array.tabulate(ww * hh)(i => (i * 123457) & 0xffffff)
      val (ow, oh, o) = PngCodec.decodePng(PngCodec.encodePng(ww, hh, p2))
      assert((ow, oh) == ((ww, hh)) && o.sameElements(p2), s"${ww}x$hh")
    }
  }

  test("PNG cross-decoder: javax.imageio reads our bytes, we read its") {
    import graft.sources.PngCodec
    val w = 13; val h = 9
    val px = Array.tabulate(w * h)(i => (i * 654321 + 987) & 0xffffff)
    // our encoder → ImageIO
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(PngCodec.encodePng(w, h, px)))
    assert(img != null, "ImageIO could not parse our PNG")
    assert(img.getWidth == w && img.getHeight == h)
    val fromImageIo = Array.tabulate(w * h)(i =>
      img.getRGB(i % w, i / w) & 0xffffff)
    assert(fromImageIo.sameElements(px), "ImageIO must see identical pixels")
    // ImageIO (truecolor) → our decoder
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    px.zipWithIndex.foreach { case (p, i) => bi.setRGB(i % w, i / w, p) }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", baos)
    val (rw, rh, rpx) = PngCodec.decodePng(baos.toByteArray)
    assert((rw, rh) == ((w, h)) && rpx.sameElements(px))
    // ImageIO ARGB (color type 6) → our decoder drops alpha
    val bia = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    px.zipWithIndex.foreach { case (p, i) =>
      bia.setRGB(i % w, i / w, 0xff000000 | p)
    }
    val baosA = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bia, "png", baosA)
    val (aw, ah, apx) = PngCodec.decodePng(baosA.toByteArray)
    assert((aw, ah) == ((w, h)) && apx.sameElements(px))
    // grayscale (color type 0) → replicated channels
    val big = new java.awt.image.BufferedImage(
      4, 3, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 12).foreach { i =>
      val g = (i * 21) % 256
      big.setRGB(i % 4, i / 4, (g << 16) | (g << 8) | g)
    }
    val baosG = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(big, "png", baosG)
    val (gw, gh, gpx) = PngCodec.decodePng(baosG.toByteArray)
    assert((gw, gh) == ((4, 3)))
    gpx.foreach { p =>
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      assert(r == g && g == b, "grayscale must replicate to all channels")
    }
  }

  test("PNG decoder rejects corruption: CRC flip, truncated IDAT, bad magic") {
    import graft.sources.PngCodec
    val good = PngCodec.encodePng(5, 4,
      Array.tabulate(20)(i => (i * 999331) & 0xffffff))
    // flip one IDAT payload byte → CRC must catch it
    val corrupt = good.clone()
    corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x41).toByte
    intercept[IllegalArgumentException](PngCodec.decodePng(corrupt))
    // bad signature
    val badMagic = good.clone(); badMagic(0) = 0x42
    intercept[IllegalArgumentException](PngCodec.decodePng(badMagic))
    // truncated file
    intercept[IllegalArgumentException](
      PngCodec.decodePng(good.take(good.length - 13)))
  }

  test("PNG batched decoder face matches the generator arithmetic") {
    import graft.queries.MultimodalQueries
    val rows = MultimodalQueries.mediaDecodePng(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val id = r.getLong(0)
      val (w, h, px) = MultimodalQueries.synthImage(id)
      assert(r.getInt(1) == w && r.getInt(2) == h, s"doc $id dims")
      assert(r.getLong(3) == px.map(p => (p >> 16) & 0xff).map(_.toLong).sum,
        s"doc $id sum_r")
    }
  }

  // ---- GIF (D12e) -------------------------------------------------------

  test("GIF round-trip is LOSSLESS incl. LZW width growth, table reset, and w+K") {
    import graft.sources.GifCodec
    // single color: the LZW stream is pure w+K special cases
    val flat = Array.fill(10 * 10)(0x123456)
    val (fw, fh, fp) = GifCodec.decodeGif(GifCodec.encodeGif(10, 10, flat))
    assert((fw, fh) == ((10, 10)) && fp.sameElements(flat), "flat image")
    // 200 distinct colors + repetition: grows code width past 9 bits
    val w = 64; val h = 64
    val px = Array.tabulate(w * h)(i => ((i % 200) * 41 + 7) * 65793 & 0xffffff)
    val (dw, dh, dec) = GifCodec.decodeGif(GifCodec.encodeGif(w, h, px))
    assert((dw, dh) == ((w, h)) && dec.sameElements(px), "wide-table image")
    // high-entropy indices keep LZW matches short, so the 14.4k-pixel
    // stream emits >4096 codes and overflows the table => CLEAR
    // mid-stream and a rebuilt table
    val big = Array.tabulate(120 * 120)(i =>
      (((i * 2654435761L) >>> 24) & 0xff).toInt * 65793 & 0xffffff)
    val (bw, bh, bp) = GifCodec.decodeGif(GifCodec.encodeGif(120, 120, big))
    assert((bw, bh) == ((120, 120)) && bp.sameElements(big), "table-reset image")
    // edge shapes
    for ((ww, hh) <- Seq((1, 9), (9, 1), (1, 1))) {
      val p2 = Array.tabulate(ww * hh)(i => (i * 123457) & 0xffffff)
      val (ow, oh, o) = GifCodec.decodeGif(GifCodec.encodeGif(ww, hh, p2))
      assert((ow, oh) == ((ww, hh)) && o.sameElements(p2), s"${ww}x$hh")
    }
    // exactly 256 colors still fits; 257 must refuse, not quantize
    val full = Array.tabulate(256)(i => i * 65793 & 0xffffff)
    val (_, _, f) = GifCodec.decodeGif(GifCodec.encodeGif(16, 16, full))
    assert(f.sameElements(full))
    intercept[IllegalArgumentException] {
      GifCodec.encodeGif(257, 1, Array.tabulate(257)(i => i))
    }
  }

  test("GIF cross-decoder: javax.imageio reads our bytes, we read its (incl. interlace)") {
    import graft.sources.GifCodec
    val w = 13; val h = 11
    val px = Array.tabulate(w * h)(i => ((i % 64) * 987 + 13) * 1337 & 0xffffff)
    // our encoder → ImageIO
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(GifCodec.encodeGif(w, h, px)))
    assert(img != null, "ImageIO could not parse our GIF")
    assert(img.getWidth == w && img.getHeight == h)
    val fromImageIo = Array.tabulate(w * h)(i =>
      img.getRGB(i % w, i / w) & 0xffffff)
    assert(fromImageIo.sameElements(px), "ImageIO must see identical pixels")
    // ImageIO's own GIF writer → our decoder. An explicitly INDEXED
    // image makes its write lossless (an RGB input could be quantized
    // to a web palette, which would test its quantizer, not our LZW)
    val palette = Array.tabulate(64)(k => (k * 987 + 13) * 1337 & 0xffffff)
    val icm = new java.awt.image.IndexColorModel(8, 64,
      palette.map(c => ((c >> 16) & 0xff).toByte),
      palette.map(c => ((c >> 8) & 0xff).toByte),
      palette.map(c => (c & 0xff).toByte))
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    px.zipWithIndex.foreach { case (p, i) => bi.setRGB(i % w, i / w, p) }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "gif", baos))
    val (rw, rh, rpx) = GifCodec.decodeGif(baos.toByteArray)
    assert((rw, rh) == ((w, h)) && rpx.sameElements(px),
      "our decoder must read ImageIO's GIF89a output")
    // ImageIO INTERLACED output → our 4-pass reorder
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baosI = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baosI)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    ios.close(); writer.dispose()
    val interBytes = baosI.toByteArray
    val (iw, ih, ipx) = GifCodec.decodeGif(interBytes)
    assert((iw, ih) == ((w, h)) && ipx.sameElements(px),
      "interlaced decode must reorder rows correctly")
  }

  test("GIF decoder rejects corruption: bad magic, truncation, missing image") {
    import graft.sources.GifCodec
    val good = GifCodec.encodeGif(4, 3, Array.tabulate(12)(i => i * 999 & 0xffffff))
    val badMagic = good.clone(); badMagic(0) = 'P'.toByte
    intercept[GifCodec.GifFormatException] { GifCodec.decodeGif(badMagic) }
    intercept[GifCodec.GifFormatException] {
      GifCodec.decodeGif(good.take(good.length / 2))
    }
    // header + immediate trailer: structurally valid, no image
    val noImage = good.take(13 + 3 * (good(10) & 7 match {
      case n => 2 << n
    })) :+ 0x3b.toByte
    intercept[GifCodec.GifFormatException] { GifCodec.decodeGif(noImage) }
  }

  test("GIF batched decoder face matches the generator arithmetic") {
    val out = graft.queries.MultimodalQueries
      .mediaDecodeGif(spark, sfDir).limit(25).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      val (w, h, px) = graft.queries.MultimodalQueries.synthImage(id)
      assert(r.getInt(1) == w && r.getInt(2) == h, s"doc $id dims")
      assert(r.getLong(3) == px.map(p => (p >> 16) & 0xff).map(_.toLong).sum,
        s"doc $id sum_r")
      assert(r.getLong(4) == px.map(p => (p >> 8) & 0xff).map(_.toLong).sum,
        s"doc $id sum_g")
      assert(r.getLong(5) == px.map(p => p & 0xff).map(_.toLong).sum,
        s"doc $id sum_b")
    }
  }
}
