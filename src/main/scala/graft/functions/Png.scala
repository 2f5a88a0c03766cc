package graft.functions

import java.util.zip.{CRC32, Deflater, Inflater}

/** Library-free PNG codec — the image leg of the multimodal decode story
  * (reference analog: the binary→content pathway of src/pdf-extractor.ts;
  * the PDF leg is [[PdfText]], this is the same pattern for pixels).
  *
  * Scope: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  * 6 (RGBA), interlace 0 — the shape every deterministic synthetic frame
  * and the overwhelming majority of real-world PNGs take. Palette (type 3),
  * 16-bit, and Adam7 return None (degrade, never throw) like every decoder
  * in this repo.
  *
  * The two hard pieces — zlib inflate and the five PNG row filters
  * (None/Sub/Up/Average/Paeth) — are the same algorithms [[PdfText]]
  * already runs for xref-stream /Predictor rows, generalized here from
  * bpp=1 to arbitrary bytes-per-pixel.
  */
object Png {

  /** Decoded raster: `pixels` is row-major, `channels` interleaved,
    * one byte per sample (length = width * height * channels).
    */
  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte])

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  /** PNG color type for a channel count (8-bit, non-palette). */
  def colorType(channels: Int): Int = channels match {
    case 1 => 0
    case 2 => 4
    case 3 => 2
    case 4 => 6
    case n => throw new IllegalArgumentException(s"channels=$n")
  }

  private def channelsOf(colorType: Int): Option[Int] = colorType match {
    case 0 => Some(1)
    case 2 => Some(3)
    case 4 => Some(2)
    case 6 => Some(4)
    case _ => None // 3 (palette) out of scope
  }

  // ---------------------------------------------------------------- encode

  /** Real PNG bytes for `img`. `filterFor(row)` picks the row filter
    * (0–4) — rotating it per row is how the round-trip oracle exercises
    * every un-filter branch of [[decode]] in one image.
    */
  def encode(img: Image, filterFor: Int => Int = _ => 0): Array[Byte] = {
    val Image(w, h, ch, px) = img
    require(w > 0 && h > 0 && px.length == w * h * ch,
      s"encode: ${px.length} bytes for ${w}x${h}x$ch")
    val rowLen = w * ch
    val raw = new Array[Byte](h * (rowLen + 1))
    var y = 0
    while (y < h) {
      val f = filterFor(y) & 0xff
      require(f <= 4, s"encode: filter $f")
      raw(y * (rowLen + 1)) = f.toByte
      var i = 0
      while (i < rowLen) {
        val x = px(y * rowLen + i) & 0xff
        val a = if (i >= ch) px(y * rowLen + i - ch) & 0xff else 0
        val b = if (y > 0) px((y - 1) * rowLen + i) & 0xff else 0
        val c = if (y > 0 && i >= ch) px((y - 1) * rowLen + i - ch) & 0xff else 0
        val v = f match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case _ => x - paeth(a, b, c)
        }
        raw(y * (rowLen + 1) + 1 + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, w); putBe32(ihdr, 4, h)
    ihdr(8) = 8; ihdr(9) = colorType(ch).toByte // depth 8; compress/filter/interlace 0
    val out = new java.io.ByteArrayOutputStream(64 + raw.length)
    out.write(Signature, 0, Signature.length)
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", deflate(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  /** Parse real PNG bytes: signature, chunk walk with CRC32 verification,
    * IDAT concatenation, zlib inflate, row un-filter. None on anything
    * malformed (bad magic, CRC mismatch, truncated stream, unknown filter,
    * out-of-scope IHDR) — the corrupt-stream degrade path.
    */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < Signature.length + 25) return None
    var i = 0
    while (i < Signature.length) {
      if (bytes(i) != Signature(i)) return None
      i += 1
    }
    var w = 0; var h = 0; var ch = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream(bytes.length)
    var p = Signature.length
    while (!seenIend) {
      if (p + 12 > bytes.length) return None // ragged chunk header/crc
      val len = be32(bytes, p)
      // bounds in Long: a hostile length near Int.MaxValue must read as
      // out-of-bounds, not wrap negative and reach the CRC read
      if (len < 0 || p + 12L + len > bytes.length) return None
      val ctype = new String(bytes, p + 4, 4, "ISO-8859-1")
      val crc = new CRC32()
      crc.update(bytes, p + 4, 4 + len)
      if (crc.getValue.toInt != be32(bytes, p + 8 + len)) return None
      ctype match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return None
          w = be32(bytes, p + 8); h = be32(bytes, p + 12)
          val depth = bytes(p + 16) & 0xff
          val ct = bytes(p + 17) & 0xff
          val interlace = bytes(p + 20) & 0xff
          // compression (p+18) and filter method (p+19) must be 0 per spec
          if (w <= 0 || h <= 0 || depth != 8 || interlace != 0 ||
            bytes(p + 18) != 0 || bytes(p + 19) != 0) return None
          ch = channelsOf(ct).getOrElse(return None)
          // decompression-bomb guard, same rationale as PdfText.MaxInflated
          if (w.toLong * h * ch > MaxPixels) return None
          seenIhdr = true
        case "IDAT" =>
          if (!seenIhdr) return None
          idat.write(bytes, p + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunk (tEXt, pHYs, …): CRC-checked, skipped
      }
      p += 12 + len
    }
    if (!seenIhdr) return None
    val rowLen = w * ch
    // the filtered stream's size is EXACTLY h*(rowLen+1) — cap inflate
    // there (a fixed slack under-caps tall/narrow images whose filter
    // bytes exceed it, and over-caps everything else)
    val expected = h.toLong * (rowLen + 1)
    val raw = inflate(idat.toByteArray, expected).getOrElse(return None)
    if (raw.length != expected) return None
    unfilter(raw, rowLen, ch).map(Image(w, h, ch, _))
  }

  /** Reverse the five PNG row filters at pixel width `bpp` —
    * [[PdfText]]'s unpredictPng generalized from bpp=1.
    */
  private def unfilter(raw: Array[Byte], rowLen: Int, bpp: Int): Option[Array[Byte]] = {
    val nRows = raw.length / (rowLen + 1)
    val out = new Array[Byte](nRows * rowLen)
    var r = 0
    while (r < nRows) {
      val f = raw(r * (rowLen + 1)) & 0xff
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val x = raw(src + i) & 0xff
        val a = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val b = if (r > 0) out(dst - rowLen + i) & 0xff else 0
        val c = if (r > 0 && i >= bpp) out(dst - rowLen + i - bpp) & 0xff else 0
        val v = f match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => x + paeth(a, b, c)
          case _ => return None
        }
        out(dst + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    Some(out)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  // ---------------------------------------------------------------- resize

  /** Bilinear resample to (tw, th) — the real interpolation kernel behind
    * [[graft.operators.Multimodal]]'s resize plumbing. Half-pixel-center
    * coordinate mapping (the OpenCV/Pillow convention): source coordinate
    * of target x is (x + 0.5) * sw / tw - 0.5, clamped to the edge.
    */
  def resizeBilinear(img: Image, tw: Int, th: Int): Image = {
    require(tw > 0 && th > 0, s"resize to ${tw}x$th")
    val Image(sw, sh, ch, px) = img
    val out = new Array[Byte](tw * th * ch)
    var y = 0
    while (y < th) {
      val gy = math.max(0.0, math.min(sh - 1.0, (y + 0.5) * sh / th - 0.5))
      val y0 = gy.toInt; val y1 = math.min(sh - 1, y0 + 1); val fy = gy - y0
      var x = 0
      while (x < tw) {
        val gx = math.max(0.0, math.min(sw - 1.0, (x + 0.5) * sw / tw - 0.5))
        val x0 = gx.toInt; val x1 = math.min(sw - 1, x0 + 1); val fx = gx - x0
        var c = 0
        while (c < ch) {
          val p00 = px((y0 * sw + x0) * ch + c) & 0xff
          val p01 = px((y0 * sw + x1) * ch + c) & 0xff
          val p10 = px((y1 * sw + x0) * ch + c) & 0xff
          val p11 = px((y1 * sw + x1) * ch + c) & 0xff
          val v = (p00 * (1 - fx) + p01 * fx) * (1 - fy) +
            (p10 * (1 - fx) + p11 * fx) * fy
          out((y * tw + x) * ch + c) = math.round(v).toInt.min(255).max(0).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Image(tw, th, ch, out)
  }

  // ----------------------------------------------------------------- utils

  /** 256 MPix ceiling — an IHDR declaring more is treated as corrupt
    * rather than allocated (decompression/allocation-bomb guard).
    */
  private val MaxPixels = 256L << 20

  private def putBe32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def writeChunk(out: java.io.ByteArrayOutputStream, ctype: String,
                         data: Array[Byte]): Unit = {
    val hdr = new Array[Byte](8)
    putBe32(hdr, 0, data.length)
    val t = ctype.getBytes("ISO-8859-1")
    System.arraycopy(t, 0, hdr, 4, 4)
    out.write(hdr, 0, 8)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(t); crc.update(data)
    val tail = new Array[Byte](4)
    putBe32(tail, 0, crc.getValue.toInt)
    out.write(tail, 0, 4)
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length / 2))
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val n = d.deflate(buf)
        if (n > 0) out.write(buf, 0, n)
      }
      out.toByteArray
    } finally d.end()
  }

  private def inflate(data: Array[Byte], maxOut: Long): Option[Array[Byte]] = {
    val inf = new Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (out.size().toLong + n > maxOut) return None // bomb / oversized
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return None // stalled: truncated
      }
      if (!inf.finished()) None else Some(out.toByteArray)
    } catch { case _: Exception => None }
    finally inf.end()
  }
}
