package graft.sources

import java.io.ByteArrayOutputStream

/** Pure-JVM baseline JPEG codec (ITU-T T.81, baseline sequential DCT,
  * 8-bit) — moves D12's "compressed formats bind externally" caveat
  * for the most common image format on any real crawl.
  *
  * DECODER ([[decodeJpeg]]) is the deliverable: a real entropy-coded
  * decode — marker walk (APPn/COM skip, DQT, DHT, SOF0/1, DRI, SOS),
  * canonical Huffman tables built from the stream's own DHT segments
  * (T.81 Annex C MINCODE/MAXCODE/VALPTR), byte-stuffing (FF 00) and
  * restart-marker handling, DC prediction + EXTEND, zigzag
  * dequantization, separable float IDCT, per-component sampling
  * factors up to 2×2 (4:4:4 / 4:2:2 / 4:2:0) with nearest
  * upsampling, JFIF YCbCr→RGB. It decodes third-party baseline
  * streams (MultimodalSpec cross-checks it against `javax.imageio`,
  * the JDK's independent decoder, in both directions).
  *
  * ENCODER ([[encodeJpeg]]) exists so the engine can synthesize REAL
  * compressed fixtures without any external library: 4:4:4, flat
  * quantization tables, and SELF-DERIVED canonical Huffman tables
  * (all 12 DC categories at 5 bits, all 162 AC symbols at 8 bits —
  * valid prefix codes with no all-ones codeword, deliberately chosen
  * over the Annex K examples so no table needs transcription). The
  * bitstream is standard: any baseline decoder reads it.
  *
  * Scale shape: decode is a pure per-row kernel behind the
  * [[Multimodal.BatchDecoder]] interface — zero exchanges, scales
  * with cores exactly like the BMP/WAV paths.
  */
object JpegCodec {

  /** Zigzag scan order: ZIGZAG(i) = natural (row-major) index of the
    * i-th coefficient in scan order. Generated, not transcribed.
    */
  val ZigZag: Array[Int] = {
    val out = new Array[Int](64)
    var k = 0
    var s = 0
    while (s <= 14) {
      val lo = math.max(0, s - 7)
      val hi = math.min(7, s)
      val rs = if (s % 2 == 1) lo to hi else hi to lo by -1
      rs.foreach { r => out(k) = r * 8 + (s - r); k += 1 }
      s += 1
    }
    out
  }

  // 1D IDCT/FDCT basis: COS(u)(x) = C(u)/2 · cos((2x+1)uπ/16)
  private val COS: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ------------------------------------------------------------- decoder

  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    // T.81 Annex C canonical code generation
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1)
        k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + (code - minCode(len))) & 0xff
  }

  /** Entropy-segment bit reader: un-stuffs FF 00, stops (and pads
    * with 1-bits, per T.81) at any real marker; restart markers are
    * consumed explicitly via [[restart]].
    */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    private var atMarker = false

    def nextBit(): Int = {
      if (bitCnt == 0) {
        if (atMarker || pos >= bytes.length) return 1 // T.81 1-padding
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          val nxt = if (pos < bytes.length) bytes(pos) & 0xff else -1
          if (nxt == 0x00) pos += 1 // stuffed data byte
          else { // a real marker terminates the entropy segment
            pos -= 1
            atMarker = true
            return 1
          }
        }
        bitBuf = b
        bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    def decodeHuff(t: HuffTable): Int = {
      var code = nextBit()
      var l = 1
      while (code > t.maxCode(l)) {
        code = (code << 1) | nextBit()
        l += 1
        require(l <= 16, "corrupt JPEG: Huffman code longer than 16 bits")
      }
      t.value(l, code)
    }

    /** Byte-align and consume an RSTn marker; resets bit state. */
    def restart(): Unit = {
      bitCnt = 0
      atMarker = false
      require(pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff &&
        ((bytes(pos + 1) & 0xff) & 0xf8) == 0xd0,
        s"expected restart marker at $pos")
      pos += 2
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTab: HuffTable = null
    var acTab: HuffTable = null
    var plane: Array[Int] = null // MCU-aligned component samples
    var planeW: Int = 0
    var pred: Int = 0
  }

  /** Decode a baseline (SOF0/SOF1) JPEG → (width, height, row-major
    * 0xRRGGBB). Supports 1 (grayscale) or 3 (JFIF YCbCr) components,
    * sampling factors 1–2, DRI restart intervals.
    */
  def decodeJpeg(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length > 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG (missing SOI)")
    def u8(p: Int) = bytes(p) & 0xff
    def u16(p: Int) = (u8(p) << 8) | u8(p + 1)

    val quant = new Array[Array[Int]](4) // zigzag order, as stored
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var pos = 2

    var scanning = true
    while (scanning) {
      require(pos + 4 <= bytes.length, "truncated JPEG (no SOS)")
      require(u8(pos) == 0xff, s"expected marker at $pos")
      val marker = u8(pos + 1)
      if (marker == 0xff) { pos += 1 } // fill byte
      else {
        val len = u16(pos + 2)
        val seg = pos + 4
        marker match {
          case 0xdb => // DQT: one or more tables
            var p = seg
            while (p < pos + 2 + len) {
              val pq = u8(p) >> 4
              val tq = u8(p) & 0x0f
              require(pq == 0, "only 8-bit quant tables (baseline)")
              quant(tq) = Array.tabulate(64)(i => u8(p + 1 + i))
              p += 65
            }
          case 0xc4 => // DHT: one or more tables
            var p = seg
            while (p < pos + 2 + len) {
              val tc = u8(p) >> 4
              val th = u8(p) & 0x0f
              val bits = Array.tabulate(16)(i => u8(p + 1 + i))
              val n = bits.sum
              val vals = new Array[Byte](n)
              System.arraycopy(bytes, p + 17, vals, 0, n)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              p += 17 + n
            }
          case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
            require(u8(seg) == 8, "only 8-bit precision")
            height = u16(seg + 1)
            width = u16(seg + 3)
            val nc = u8(seg + 5)
            require(nc == 1 || nc == 3, s"unsupported component count $nc")
            comps = Array.tabulate(nc) { i =>
              val p = seg + 6 + i * 3
              val c = Component(u8(p), u8(p + 1) >> 4, u8(p + 1) & 0x0f,
                u8(p + 2))
              require(c.h >= 1 && c.h <= 2 && c.v >= 1 && c.v <= 2,
                s"unsupported sampling ${c.h}x${c.v}")
              c
            }
          case 0xc2 => throw new IllegalArgumentException(
            "progressive JPEG not supported (baseline decoder)")
          case 0xdd => restartInterval = u16(seg)
          case 0xda => // SOS — header then entropy-coded data
            require(comps != null, "SOS before SOF")
            val ns = u8(seg)
            require(ns == comps.length, "partial scans not supported")
            var p = seg + 1
            var i = 0
            while (i < ns) {
              val cid = u8(p)
              val c = comps.find(_.id == cid).getOrElse(
                throw new IllegalArgumentException(s"unknown component $cid"))
              c.dcTab = dcTabs(u8(p + 1) >> 4)
              c.acTab = acTabs(u8(p + 1) & 0x0f)
              require(c.dcTab != null && c.acTab != null, "missing DHT")
              p += 2
              i += 1
            }
            pos = p + 3 // skip Ss/Se/AhAl
            scanning = false
          case 0xd9 => throw new IllegalArgumentException("EOI before SOS")
          case _ => // APPn / COM / others: skip by declared length
        }
        if (scanning) pos += 2 + len
      }
    }

    // MCU geometry
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.plane = new Array[Int](c.planeW * mcusY * c.v * 8)
    }

    val br = new BitReader(bytes, pos)
    val coefZ = new Array[Int](64)
    val block = new Array[Double](64)
    val tmp = new Array[Double](64)

    def decodeBlock(c: Component, bx: Int, by: Int): Unit = {
      java.util.Arrays.fill(coefZ, 0)
      val t = br.decodeHuff(c.dcTab)
      c.pred += extend(br.receive(t), t)
      coefZ(0) = c.pred
      var k = 1
      var going = true
      while (going && k < 64) {
        val rs = br.decodeHuff(c.acTab)
        val r = rs >> 4
        val s = rs & 0x0f
        if (s == 0) {
          if (r == 15) k += 16 else going = false // ZRL / EOB
        } else {
          k += r
          require(k < 64, "corrupt JPEG: AC run past block end")
          coefZ(k) = extend(br.receive(s), s)
          k += 1
        }
      }
      // dequantize (tables stored in zigzag order) into natural order
      val q = quant(c.tq)
      require(q != null, s"missing quant table ${c.tq}")
      java.util.Arrays.fill(block, 0.0)
      var i = 0
      while (i < 64) {
        if (coefZ(i) != 0) block(ZigZag(i)) = (coefZ(i) * q(i)).toDouble
        i += 1
      }
      // separable IDCT: rows then columns
      var y0 = 0
      while (y0 < 8) {
        var x = 0
        while (x < 8) {
          var acc = 0.0
          var u = 0
          while (u < 8) { acc += COS(u)(x) * block(y0 * 8 + u); u += 1 }
          tmp(y0 * 8 + x) = acc
          x += 1
        }
        y0 += 1
      }
      var x0 = 0
      while (x0 < 8) {
        var y = 0
        while (y < 8) {
          var acc = 0.0
          var v = 0
          while (v < 8) { acc += COS(v)(y) * tmp(v * 8 + x0); v += 1 }
          val s0 = math.round(acc + 128.0).toInt
          val px = if (s0 < 0) 0 else if (s0 > 255) 255 else s0
          c.plane((by * 8 + y) * c.planeW + bx * 8 + x0) = px
          y += 1
        }
        x0 += 1
      }
    }

    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart()
          comps.foreach(_.pred = 0)
        }
        comps.foreach { c =>
          var v = 0
          while (v < c.v) {
            var h = 0
            while (h < c.h) {
              decodeBlock(c, mx * c.h + h, my * c.v + v)
              h += 1
            }
            v += 1
          }
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }

    // color reconstruction with nearest upsampling
    val out = new Array[Int](width * height)
    if (comps.length == 1) {
      val c = comps(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = c.plane(y * c.planeW + x)
          out(y * width + x) = (g << 16) | (g << 8) | g
          x += 1
        }
        y += 1
      }
    } else {
      val Array(cy, cb, cr) = comps
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = cy.plane((y * cy.v / vMax) * cy.planeW + x * cy.h / hMax)
          val pb = cb.plane((y * cb.v / vMax) * cb.planeW + x * cb.h / hMax) - 128
          val pr = cr.plane((y * cr.v / vMax) * cr.planeW + x * cr.h / hMax) - 128
          def clamp(d: Double): Int = {
            val v = math.round(d).toInt
            if (v < 0) 0 else if (v > 255) 255 else v
          }
          val r = clamp(yy + 1.402 * pr)
          val g = clamp(yy - 0.344136 * pb - 0.714136 * pr)
          val b = clamp(yy + 1.772 * pb)
          out(y * width + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
    }
    (width, height, out)
  }

  // ------------------------------------------------------------- encoder

  /** Self-derived canonical Huffman spec: (bits, vals). DC: all 12
    * categories at 5 bits (codes 0..11 of 32 — no all-ones). AC: EOB,
    * ZRL and every (run 0-15, size 1-10) at 8 bits (162 of 256).
    */
  private val DcBits = Array(0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Byte] = Array.tabulate(12)(_.toByte)
  private val AcBits = Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals: Array[Byte] = {
    val b = Array.newBuilder[Byte]
    b += 0x00.toByte // EOB
    b += 0xf0.toByte // ZRL
    for (r <- 0 to 15; s <- 1 to 10) b += ((r << 4) | s).toByte
    b.result()
  }

  /** (code, length) per symbol from a canonical (bits, vals) spec. */
  private def encTable(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        out(vals(k) & 0xff) = (code, l)
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      l += 1
    }
    out
  }
  private val DcEnc = encTable(DcBits, DcVals)
  private val AcEnc = encTable(AcBits, AcVals)

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf & 0xff)
          if ((buf & 0xff) == 0xff) out.write(0x00) // byte stuffing
          buf = 0
          cnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) put(0xff, 8 - cnt) // 1-padding
  }

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var t = 0
    while (a != 0) { a >>= 1; t += 1 }
    t
  }

  /** Encode row-major 0xRRGGBB pixels as a baseline JFIF JPEG:
    * 4:4:4, flat quantization (`qLuma` for Y, `qChroma` for Cb/Cr),
    * the self-derived Huffman tables above. Deterministic.
    */
  def encodeJpeg(width: Int, height: Int, rgb: Array[Int],
                 qLuma: Int = 8, qChroma: Int = 12): Array[Byte] = {
    require(width > 0 && height > 0 && rgb.length == width * height)
    // q >= 4 bounds every quantized AC magnitude at 2048/4 = 512 →
    // category <= 10, the largest symbol the AC table carries
    require(qLuma >= 4 && qLuma <= 255 && qChroma >= 4 && qChroma <= 255)
    val out = new ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def marker(m: Int, payload: Int => Unit, len: Int): Unit = {
      w8(0xff); w8(m); w16(len + 2); payload(0)
    }

    w8(0xff); w8(0xd8) // SOI
    marker(0xe0, _ => { // APP0 JFIF
      "JFIF".getBytes("US-ASCII").foreach(b => w8(b))
      w8(0); w8(1); w8(1) // version 1.1
      w8(0); w16(1); w16(1) // no density
      w8(0); w8(0) // no thumbnail
    }, 14)
    marker(0xdb, _ => { w8(0); (0 until 64).foreach(_ => w8(qLuma)) }, 65)
    marker(0xdb, _ => { w8(1); (0 until 64).foreach(_ => w8(qChroma)) }, 65)
    marker(0xc0, _ => { // SOF0: 3 components, 1x1 sampling
      w8(8); w16(height); w16(width); w8(3)
      w8(1); w8(0x11); w8(0) // Y  -> quant 0
      w8(2); w8(0x11); w8(1) // Cb -> quant 1
      w8(3); w8(0x11); w8(1) // Cr -> quant 1
    }, 15)
    def dht(tcTh: Int, bits: Array[Int], vals: Array[Byte]): Unit =
      marker(0xc4, _ => {
        w8(tcTh); bits.foreach(w8); vals.foreach(b => w8(b & 0xff))
      }, 17 + vals.length)
    dht(0x00, DcBits, DcVals) // DC table 0 (shared by all components)
    dht(0x10, AcBits, AcVals) // AC table 0
    marker(0xda, _ => { // SOS
      w8(3)
      w8(1); w8(0x00)
      w8(2); w8(0x00)
      w8(3); w8(0x00)
      w8(0); w8(63); w8(0)
    }, 10)

    // planes: RGB -> YCbCr (JFIF)
    val n = width * height
    val py = new Array[Double](n)
    val pb = new Array[Double](n)
    val pr = new Array[Double](n)
    var i = 0
    while (i < n) {
      val p = rgb(i)
      val r = (p >> 16) & 0xff
      val g = (p >> 8) & 0xff
      val b = p & 0xff
      py(i) = 0.299 * r + 0.587 * g + 0.114 * b
      pb(i) = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
      pr(i) = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
      i += 1
    }

    val bw = new BitWriter(out)
    val blocksX = (width + 7) / 8
    val blocksY = (height + 7) / 8
    val preds = new Array[Int](3)
    val f = new Array[Double](64)
    val coef = new Array[Int](64)

    def encodeBlock(plane: Array[Double], q: Int, ci: Int,
                    bx: Int, by: Int): Unit = {
      // edge-replicated 8x8 block, level-shifted
      var y = 0
      while (y < 8) {
        val sy = math.min(by * 8 + y, height - 1)
        var x = 0
        while (x < 8) {
          val sx = math.min(bx * 8 + x, width - 1)
          f(y * 8 + x) = plane(sy * width + sx) - 128.0
          x += 1
        }
        y += 1
      }
      // separable FDCT (transpose of the IDCT basis)
      val t1 = new Array[Double](64)
      var v0 = 0
      while (v0 < 8) {
        var u = 0
        while (u < 8) {
          var acc = 0.0
          var x = 0
          while (x < 8) { acc += COS(u)(x) * f(v0 * 8 + x); x += 1 }
          t1(v0 * 8 + u) = 2.0 * acc
          u += 1
        }
        v0 += 1
      }
      var u0 = 0
      while (u0 < 8) {
        var v = 0
        while (v < 8) {
          var acc = 0.0
          var y1 = 0
          while (y1 < 8) { acc += COS(v)(y1) * t1(y1 * 8 + u0); y1 += 1 }
          // acc = (C(u)C(v)/2)·ΣΣ f·cos·cos, so F(u,v) = acc/2 (T.81)
          f(v * 8 + u0) = acc / 2.0 / q
          v += 1
        }
        u0 += 1
      }
      var k = 0
      while (k < 64) { coef(k) = math.round(f(ZigZag(k))).toInt; k += 1 }

      // DC
      val diff = coef(0) - preds(ci)
      preds(ci) = coef(0)
      val t = category(diff)
      val (dc, dl) = DcEnc(t)
      bw.put(dc, dl)
      if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      // AC with RLE
      var run = 0
      k = 1
      while (k < 64) {
        if (coef(k) == 0) run += 1
        else {
          while (run >= 16) { val (zc, zl) = AcEnc(0xf0); bw.put(zc, zl); run -= 16 }
          val s = category(coef(k))
          val (ac, al) = AcEnc((run << 4) | s)
          bw.put(ac, al)
          bw.put(if (coef(k) < 0) coef(k) + (1 << s) - 1 else coef(k), s)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (ec, el) = AcEnc(0x00); bw.put(ec, el) }
    }

    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        encodeBlock(py, qLuma, 0, bx, by)
        encodeBlock(pb, qChroma, 1, bx, by)
        encodeBlock(pr, qChroma, 2, bx, by)
        bx += 1
      }
      by += 1
    }
    bw.flush()
    w8(0xff); w8(0xd9) // EOI
    out.toByteArray
  }

  // -------------------------------------------------- batch decoder (D12)

  /** JPEG decode → stats features `[width, height, sum_r, sum_g,
    * sum_b]` behind the batched [[Multimodal.BatchDecoder]] plumbing —
    * the same contract as [[MediaCodecs.BmpStatsDecoder]], over real
    * entropy-coded input.
    */
  object JpegStatsDecoder extends Multimodal.BatchDecoder {
    def decode(ids: Array[Long], payloads: Array[Array[Byte]]): Array[Array[Float]] =
      payloads.map { bytes =>
        val (w, h, px) = decodeJpeg(bytes)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < px.length) {
          val p = px(i)
          sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
          i += 1
        }
        Array(w.toFloat, h.toFloat, sr.toFloat, sg.toFloat, sb.toFloat)
      }
  }
}
