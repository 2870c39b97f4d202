package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec (RFC 2083 / ISO 15948) for the D12 decode path
  * (SURVEY §2.D12d) — the most common LOSSLESS image container on any
  * real crawl, implementable to the last bit with only `java.util.zip`
  * (zlib is in the JDK; PNG adds chunk framing, CRC-32 integrity and
  * the five scanline predictors on top).
  *
  * Decoder: 8-byte signature, CRC-verified chunk walk (ancillary
  * chunks skipped by length, multiple IDATs concatenated as one zlib
  * stream, as the spec requires), IHDR validation, full inflate, and
  * per-scanline UNFILTERING — None/Sub/Up/Average/Paeth exactly per
  * spec §6 (Paeth tie-break order a, b, c; Average floors the 9-bit
  * sum). Supports bit depth 8 in grayscale (0), truecolor (2) and
  * truecolor+alpha (6) — the types `javax.imageio` emits — alpha
  * dropped on read.
  *
  * Encoder: truecolor 8-bit, non-interlaced, one IDAT; the filter
  * type is `y mod 5`, so a round-trip exercises EVERY unfilter branch
  * (an all-None encoder would leave Sub/Up/Average/Paeth untested).
  * Because PNG is lossless, decode(encode(px)) == px bit-for-bit —
  * which is what lets the D12d query be hash-green DuckDB-oracled
  * against the pixel-generator arithmetic (unlike lossy JPEG, which
  * is spec-pinned instead).
  *
  * Scale shape: encode/decode run per row inside the batched
  * `mapPartitions` decoder plumbing ([[Multimodal.BatchDecoder]]) —
  * zero shuffles, throughput ∝ cores.
  */
object PngCodec {

  private val Signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  // ------------------------------------------------------------- encode

  /** Encode `rgb` (row-major top-down 0xRRGGBB) as an 8-bit truecolor
    * non-interlaced PNG. Scanline y uses filter `y % 5` — deliberate
    * rotation through all five predictors.
    */
  def encodePng(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == width * height,
      s"pixel buffer ${rgb.length} != $width*$height")
    val bpp = 3
    val stride = width * bpp
    // raw scanlines
    val raw = new Array[Byte](height * stride)
    var i = 0
    while (i < rgb.length) {
      val p = rgb(i)
      raw(i * 3) = ((p >> 16) & 0xff).toByte
      raw(i * 3 + 1) = ((p >> 8) & 0xff).toByte
      raw(i * 3 + 2) = (p & 0xff).toByte
      i += 1
    }
    // filtered buffer: 1 filter-type byte + stride per row
    val filt = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val f = y % 5
      filt(y * (1 + stride)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = raw(y * stride + x) & 0xff
        val left = if (x >= bpp) raw(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) raw((y - 1) * stride + x - bpp) & 0xff
                 else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case 4 => paeth(left, up, ul)
        }
        filt(y * (1 + stride) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val idat = deflate(filt)
    val out = new ByteArrayOutputStream(64 + idat.length)
    out.write(Signature, 0, Signature.length)
    val ihdr = new Array[Byte](13)
    putIntBE(ihdr, 0, width)
    putIntBE(ihdr, 4, height)
    ihdr(8) = 8   // bit depth
    ihdr(9) = 2   // truecolor
    ihdr(10) = 0  // deflate
    ihdr(11) = 0  // adaptive filtering
    ihdr(12) = 0  // no interlace
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", idat)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ------------------------------------------------------------- decode

  /** Decode a PNG → (width, height, row-major top-down 0xRRGGBB).
    * Verifies every chunk CRC; supports bit depth 8, color types
    * 0/2/6, non-interlaced.
    */
  def decodePng(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    require(bytes.length >= 8 + 25 + 12, "PNG too short")
    var k = 0
    while (k < 8) {
      require(bytes(k) == Signature(k), "not a PNG (bad signature)")
      k += 1
    }
    var pos = 8
    var width = -1; var height = -1; var colorType = -1
    val idat = new ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && pos + 12 <= bytes.length) {
      val len = getIntBE(bytes, pos)
      require(len >= 0 && pos + 12 + len <= bytes.length,
        s"chunk overruns file (len=$len at $pos)")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == getIntBE(bytes, pos + 8 + len),
        s"CRC mismatch in chunk '$typ'")
      typ match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len")
          width = getIntBE(bytes, pos + 8)
          height = getIntBE(bytes, pos + 12)
          val depth = bytes(pos + 16) & 0xff
          colorType = bytes(pos + 17) & 0xff
          val compression = bytes(pos + 18) & 0xff
          val filterMethod = bytes(pos + 19) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          require(width > 0 && height > 0, s"bad dims ${width}x$height")
          require(depth == 8, s"only bit depth 8 supported, got $depth")
          require(colorType == 0 || colorType == 2 || colorType == 6,
            s"unsupported color type $colorType")
          require(compression == 0 && filterMethod == 0,
            "nonstandard compression/filter method")
          require(interlace == 0, "Adam7 interlace not supported")
        case "IDAT" =>
          require(width > 0, "IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => // ancillary (tEXt, gAMA, pHYs, …): skip by length
      }
      pos += 12 + len
    }
    require(sawEnd, "missing IEND")
    require(idat.size() > 0, "missing IDAT")
    val bpp = colorType match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
    }
    val stride = width * bpp
    val filt = inflate(idat.toByteArray, height * (1 + stride))
    // unfilter in place into the reconstructed scanline buffer
    val recon = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val f = filt(y * (1 + stride)) & 0xff
      require(f <= 4, s"bad filter type $f on scanline $y")
      var x = 0
      while (x < stride) {
        val v = filt(y * (1 + stride) + 1 + x) & 0xff
        val left = if (x >= bpp) recon(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) recon((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) recon((y - 1) * stride + x - bpp) & 0xff
                 else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case 4 => paeth(left, up, ul)
        }
        recon(y * stride + x) = ((v + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val out = new Array[Int](width * height)
    var p = 0
    while (p < out.length) {
      val off = p * bpp
      out(p) = colorType match {
        case 0 =>
          val g = recon(off) & 0xff
          (g << 16) | (g << 8) | g
        case _ => // 2 and 6 share the RGB prefix; 6's alpha is dropped
          ((recon(off) & 0xff) << 16) | ((recon(off + 1) & 0xff) << 8) |
            (recon(off + 2) & 0xff)
      }
      p += 1
    }
    (width, height, out)
  }

  // -------------------------------------------------------------- hooks

  /** PNG image decode → stats features `[width, height, sum_r, sum_g,
    * sum_b]` through the batched D12 plumbing (same feature contract
    * as [[MediaCodecs.BmpStatsDecoder]]).
    */
  object PngStatsDecoder extends Multimodal.BatchDecoder {
    def decode(ids: Array[Long], payloads: Array[Array[Byte]]): Array[Array[Float]] =
      payloads.map { bytes =>
        val (w, h, px) = decodePng(bytes)
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

  // ------------------------------------------------------------ helpers

  /** Paeth predictor, spec §6.6 — tie-break order a (left), b (above),
    * c (upper-left) is NORMATIVE: a different order decodes garbage.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var off = 0
    while (!inf.finished() && off < expected) {
      val n = inf.inflate(out, off, expected - off)
      require(n > 0 || inf.finished(),
        "truncated or corrupt zlib stream in IDAT")
      off += n
    }
    require(off == expected && inf.finished(),
      s"IDAT decoded to $off bytes, expected $expected")
    inf.end()
    out
  }

  private def putIntBE(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
  }

  private def getIntBE(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 24) | ((a(off + 1) & 0xff) << 16) |
      ((a(off + 2) & 0xff) << 8) | (a(off + 3) & 0xff)

  private def writeChunk(out: ByteArrayOutputStream, typ: String,
                         data: Array[Byte]): Unit = {
    val lenB = new Array[Byte](4)
    putIntBE(lenB, 0, data.length)
    out.write(lenB, 0, 4)
    val typB = typ.getBytes("US-ASCII")
    out.write(typB, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32
    crc.update(typB, 0, 4)
    crc.update(data, 0, data.length)
    val crcB = new Array[Byte](4)
    putIntBE(crcB, 0, crc.getValue.toInt)
    out.write(crcB, 0, 4)
  }
}
