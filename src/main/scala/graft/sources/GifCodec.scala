package graft.sources

/** Pure-JVM GIF87a/89a codec (decode + encode) — the third lossless
  * crawl format after BMP ([[MediaCodecs]]) and PNG ([[PngCodec]]),
  * built from the public GIF87a/89a specifications (CompuServe 1987/
  * 1989; also RFC-referenced via the W3C GIF89a text). Palette-indexed
  * and LZW-compressed, so a decode is byte-exact recoverable — like
  * PNG (and unlike JPEG) the decode key can be hash-green under the
  * DuckDB oracle.
  *
  * Decoder: header + logical screen descriptor, global/local color
  * tables, extension-block skipping (0x21: label + length-prefixed
  * sub-blocks), the first image descriptor (left/top/size/flags), and
  * GIF-variant LZW over the sub-block byte stream — variable code
  * width starting at minCodeSize+1, LSB-first bit packing, CLEAR
  * resets the table, widths grow when the table hits 2^width (cap 12
  * bits per the spec), including the w+firstByte(w) case for a code
  * one past the table. Interlaced images reorder rows through the
  * normative 4-pass (8/0, 8/4, 4/2, 2/1) schedule.
  *
  * Encoder: GIF87a with a global color table built from the image's
  * distinct colors (≤256 — callers with richer images must quantize
  * first; this engine's synthetic fixtures are tiny), non-interlaced,
  * real LZW (greedy longest-match over a chained-trie table, CLEAR
  * emitted up front and again on table overflow). Self-contained so
  * fixtures and cross-validation need no imaging library; MultimodalSpec
  * cross-validates BOTH directions against `javax.imageio`'s
  * independent GIF codec.
  *
  * Reference behavior note: the reference pipeline (fpl-data-pipeline
  * includes.py) never decodes media; this family implements the
  * mandated multimodal additions with the Spark-side plumbing real
  * (BatchDecoder → codegen'd stats columns) and the codecs pure-JVM.
  */
object GifCodec {

  final case class GifFormatException(msg: String)
    extends RuntimeException(msg)

  // ------------------------------------------------------------ decode

  /** Decode the FIRST image of a GIF87a/89a stream to packed 0xRRGGBB
    * pixels. Throws [[GifFormatException]] on structural corruption.
    */
  def decodeGif(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    if (bytes.length < 13) throw GifFormatException("truncated header")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a")
      throw GifFormatException(s"bad signature '$sig'")
    var p = 6
    def u8(): Int = {
      if (p >= bytes.length) throw GifFormatException("truncated stream")
      val v = bytes(p) & 0xff; p += 1; v
    }
    def u16(): Int = { val lo = u8(); val hi = u8(); (hi << 8) | lo }
    def readTable(size: Int): Array[Int] = {
      val t = new Array[Int](size)
      var i = 0
      while (i < size) {
        t(i) = (u8() << 16) | (u8() << 8) | u8(); i += 1
      }
      t
    }
    val screenW = u16(); val screenH = u16()
    if (screenW <= 0 || screenH <= 0)
      throw GifFormatException(s"bad screen size ${screenW}x$screenH")
    val packed = u8()
    u8() // background color index
    u8() // aspect ratio
    val globalTable: Array[Int] =
      if ((packed & 0x80) != 0) readTable(2 << (packed & 7)) else null
    var loop = true
    while (loop) {
      val block = u8()
      block match {
        case 0x21 => // extension: label + sub-blocks, all skipped
          u8()
          var len = u8()
          while (len != 0) {
            if (p + len > bytes.length)
              throw GifFormatException("truncated extension")
            p += len; len = u8()
          }
        case 0x2c => // image descriptor — decode and return
          u16(); u16() // left, top (single-image streams: 0,0)
          val w = u16(); val h = u16()
          if (w <= 0 || h <= 0)
            throw GifFormatException(s"bad image size ${w}x$h")
          val ip = u8()
          val interlaced = (ip & 0x40) != 0
          val table =
            if ((ip & 0x80) != 0) readTable(2 << (ip & 7))
            else if (globalTable != null) globalTable
            else throw GifFormatException("no color table")
          val minCode = u8()
          if (minCode < 2 || minCode > 11)
            throw GifFormatException(s"bad LZW min code size $minCode")
          // concatenate the image sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var len = u8()
          while (len != 0) {
            if (p + len > bytes.length)
              throw GifFormatException("truncated image data")
            data.write(bytes, p, len); p += len
            len = u8()
          }
          val idx = lzwDecode(data.toByteArray, minCode, w * h)
          if (idx.length < w * h)
            throw GifFormatException(
              s"LZW stream ended early: ${idx.length} of ${w * h} pixels")
          val out = new Array[Int](w * h)
          var row = 0
          val order = if (interlaced) interlaceOrder(h) else null
          while (row < h) {
            val destRow = if (order == null) row else order(row)
            var x = 0
            while (x < w) {
              val k = idx(row * w + x)
              if (k >= table.length)
                throw GifFormatException(s"palette index $k out of range")
              out(destRow * w + x) = table(k)
              x += 1
            }
            row += 1
          }
          return (w, h, out)
        case 0x3b => loop = false // trailer before any image
        case b => throw GifFormatException(f"unknown block 0x$b%02x")
      }
    }
    throw GifFormatException("no image block before trailer")
  }

  /** Rows arrive in 4 interlace passes (start/step 0/8, 4/8, 2/4,
    * 1/2); entry i is the DESTINATION row of the i-th decoded row. */
  private def interlaceOrder(h: Int): Array[Int] = {
    val order = new Array[Int](h)
    var i = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var r = start
      while (r < h) { order(i) = r; i += 1; r += step }
    }
    order
  }

  /** GIF-variant LZW: LSB-first bit stream, CLEAR/EOI codes, widths
    * grow when the NEXT code wouldn't fit, 12-bit cap. Table entries
    * store (prefix code, appended byte) — output materializes by
    * walking the chain, so memory is O(4096) regardless of pixel
    * count.
    */
  private def lzwDecode(data: Array[Byte], minCode: Int,
                        maxPixels: Int): Array[Int] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val append = new Array[Int](4096)
    var tableSize = eoi + 1
    var width = minCode + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitPos = 0
    val totalBits = data.length * 8
    def next(): Int = {
      if (bitPos + width > totalBits) -1
      else {
        var v = 0; var i = 0
        while (i < width) {
          val b = bitPos + i
          if ((data(b >> 3) & (1 << (b & 7))) != 0) v |= 1 << i
          i += 1
        }
        bitPos += width
        v
      }
    }
    // emit a code's byte chain (reversed walk)
    val stack = new Array[Int](4096)
    def emit(code: Int): Int = {
      var top = 0; var c = code
      while (c >= clear + 2) { stack(top) = append(c); top += 1; c = prefix(c) }
      stack(top) = c; top += 1
      val first = stack(top - 1)
      while (top > 0) { top -= 1; out.write(stack(top)) }
      first
    }
    var prev = -1
    var done = false
    while (!done && out.size() < maxPixels) {
      val code = next()
      if (code < 0 || code == eoi) done = true
      else if (code == clear) {
        tableSize = eoi + 1; width = minCode + 1; prev = -1
      } else if (prev < 0) {
        if (code >= clear) throw GifFormatException(s"bad first code $code")
        out.write(code); prev = code
      } else {
        if (code > tableSize)
          throw GifFormatException(s"code $code beyond table $tableSize")
        val first =
          if (code == tableSize) { // the w+firstByte(w) special case:
            // output = chain(prev) followed by prev's own first byte
            val f = emit(prev); out.write(f); f
          } else emit(code)
        if (tableSize < 4096) {
          prefix(tableSize) = prev; append(tableSize) = first
          tableSize += 1
          if (tableSize == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    out.toByteArray.map(_ & 0xff)
  }

  // ------------------------------------------------------------ encode

  /** Encode packed 0xRRGGBB pixels as a non-interlaced GIF87a with a
    * global color table built from the image's distinct colors (≤256).
    */
  def encodeGif(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"bad dimensions ${width}x$height for ${pixels.length} pixels")
    // palette: distinct colors in first-appearance order
    val index = new java.util.LinkedHashMap[Integer, Integer]()
    pixels.foreach { px =>
      val c = Integer.valueOf(px & 0xffffff)
      if (!index.containsKey(c)) index.put(c, Integer.valueOf(index.size()))
    }
    require(index.size() <= 256,
      s"${index.size()} distinct colors — GIF needs quantization above 256")
    // color table size: smallest 2^(n+1) >= palette, n in [0,7];
    // LZW min code size must be >= 2
    var n = 0
    while ((2 << n) < index.size()) n += 1
    val minCode = math.max(2, n + 1)
    val tableLen = 2 << n
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v); u8(v >> 8) }
    out.write("GIF87a".getBytes("US-ASCII"))
    u16(width); u16(height)
    u8(0x80 | (7 << 4) | n) // GCT present, 8-bit color resolution
    u8(0); u8(0)            // background index, aspect
    val colors = new Array[Int](tableLen)
    index.forEach((c, i) => colors(i.intValue()) = c.intValue())
    colors.foreach { c => u8(c >> 16); u8(c >> 8); u8(c) }
    u8(0x2c); u16(0); u16(0); u16(width); u16(height); u8(0)
    u8(minCode)
    val idx = pixels.map(px => index.get(Integer.valueOf(px & 0xffffff)).intValue())
    val lzw = lzwEncode(idx, minCode)
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      u8(len); out.write(lzw, off, len); off += len
    }
    u8(0)    // image data terminator
    u8(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-variant LZW encoder: greedy longest match over a hash-chained
    * string table, CLEAR first, table reset at 4096, widths grow with
    * the table. LSB-first bit packing mirrors the decoder.
    */
  private def lzwEncode(indices: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0L; var curBits = 0
    var width = minCode + 1
    def put(code: Int): Unit = {
      cur |= code.toLong << curBits; curBits += width
      while (curBits >= 8) { out.write((cur & 0xff).toInt); cur >>= 8; curBits -= 8 }
    }
    // (prefixCode << 8 | byte) -> code
    var table = new java.util.HashMap[Integer, Integer]()
    var tableSize = eoi + 1
    def resetTable(): Unit = {
      table = new java.util.HashMap[Integer, Integer]()
      tableSize = eoi + 1; width = minCode + 1
    }
    put(clear)
    var prev = -1
    var i = 0
    while (i < indices.length) {
      val k = indices(i)
      if (prev < 0) prev = k
      else {
        val key = Integer.valueOf((prev << 8) | k)
        val hit = table.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          put(prev)
          if (tableSize < 4096) {
            table.put(key, Integer.valueOf(tableSize))
            tableSize += 1
            // the decoder's table trails the encoder's by one entry at
            // read time, so it widens at ts == 2^w while the encoder
            // widens at ts == 2^w + 1 — the codes stay in lockstep
            if (tableSize == (1 << width) + 1 && width < 12) width += 1
          } else { put(clear); resetTable() }
          prev = k
        }
      }
      i += 1
    }
    if (prev >= 0) put(prev)
    put(eoi)
    if (curBits > 0) out.write((cur & 0xff).toInt)
    out.toByteArray
  }

  // -------------------------------------------------------------- hooks

  /** GIF image decode → stats features `[width, height, sum_r, sum_g,
    * sum_b]` through the batched D12 plumbing (same feature contract
    * as [[PngCodec.PngStatsDecoder]]).
    */
  object GifStatsDecoder extends Multimodal.BatchDecoder {
    def decode(ids: Array[Long], payloads: Array[Array[Byte]]): Array[Array[Float]] =
      payloads.map { bytes =>
        val (w, h, px) = decodeGif(bytes)
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
