package graft

import graft.functions.{Jpeg, Png}
import org.scalatest.funsuite.AnyFunSuite

/** The baseline JPEG codec's contract: encode→decode fidelity on smooth
  * rasters, CROSS-validation against an independent decoder AND encoder
  * (javax.imageio — the JDK's libjpeg-derived implementation: different
  * IDCT, fancy chroma upsampling, its own filter/quantization choices),
  * restart intervals, Adobe-RGB passthrough, and the degrade envelope for
  * every out-of-scope form (progressive, arithmetic, 12-bit, truncation,
  * allocation bomb).
  */
class JpegSpec extends AnyFunSuite {

  /** Smooth gradient — quantization error stays small on low-frequency
    * content, which is what fidelity tolerances can be pinned on.
    */
  private def gradient(w: Int, h: Int, ch: Int): Png.Image = {
    val px = new Array[Byte](w * h * ch)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
      px((y * w + x) * ch + c) =
        (((x * 255) / math.max(1, w - 1) + (y * 200) / math.max(1, h - 1) + c * 9) / 2).toByte
    Png.Image(w, h, ch, px)
  }

  private def maxDiff(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length, s"${a.length} vs ${b.length}")
    a.indices.map(i => math.abs((a(i) & 0xff) - (b(i) & 0xff))).max
  }

  private def meanDiff(a: Array[Byte], b: Array[Byte]): Double =
    a.indices.map(i => math.abs((a(i) & 0xff) - (b(i) & 0xff))).sum.toDouble / a.length

  private def imageIoDecode(bytes: Array[Byte]): Png.Image = {
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(bi != null, "imageio failed to decode")
    val w = bi.getWidth; val h = bi.getHeight
    val gray = bi.getColorModel.getNumComponents == 1
    val ch = if (gray) 1 else 3
    val px = new Array[Byte](w * h * ch)
    for (y <- 0 until h; x <- 0 until w) {
      if (gray) px(y * w + x) = bi.getRaster.getSample(x, y, 0).toByte
      else {
        val rgb = bi.getRGB(x, y)
        val o = (y * w + x) * 3
        px(o) = ((rgb >> 16) & 0xff).toByte
        px(o + 1) = ((rgb >> 8) & 0xff).toByte
        px(o + 2) = (rgb & 0xff).toByte
      }
    }
    Png.Image(w, h, ch, px)
  }

  test("4:4:4 encode -> decode: dimensions exact, smooth content within quantization error") {
    val img = gradient(37, 23, 3) // non-multiple-of-8 dims: partial MCUs
    val dec = Jpeg.decode(Jpeg.encode(img, quality = 90)).get
    assert(dec.width == 37 && dec.height == 23 && dec.channels == 3)
    assert(maxDiff(dec.pixels, img.pixels) <= 12,
      s"q90 smooth-gradient error: ${maxDiff(dec.pixels, img.pixels)}")
    assert(meanDiff(dec.pixels, img.pixels) <= 3.0)
  }

  test("grayscale encode -> decode") {
    val img = gradient(16, 16, 1)
    val dec = Jpeg.decode(Jpeg.encode(img, quality = 85)).get
    assert(dec.width == 16 && dec.height == 16 && dec.channels == 1)
    assert(maxDiff(dec.pixels, img.pixels) <= 10)
  }

  test("4:2:0 encode -> decode: odd dimensions, chroma subsampled") {
    val img = gradient(33, 17, 3)
    val bytes = Jpeg.encode(img, quality = 85, subsample420 = true)
    val dec = Jpeg.decode(bytes).get
    assert(dec.width == 33 && dec.height == 17 && dec.channels == 3)
    // chroma is 2x-decimated: replication upsample bounds the error by the
    // local chroma slope on a smooth gradient
    assert(meanDiff(dec.pixels, img.pixels) <= 4.0)
    assert(maxDiff(dec.pixels, img.pixels) <= 24)
  }

  test("cross-decoder: javax.imageio reads OUR files within IDCT/rounding slack") {
    // 4:4:4 — both decoders see identical coefficients and full-res chroma,
    // so differences are IDCT implementation + YCbCr rounding only
    val img = gradient(24, 24, 3)
    val bytes = Jpeg.encode(img, quality = 90)
    val ours = Jpeg.decode(bytes).get
    val theirs = imageIoDecode(bytes)
    assert(theirs.width == 24 && theirs.height == 24)
    assert(maxDiff(ours.pixels, theirs.pixels) <= 2,
      s"decoder disagreement: ${maxDiff(ours.pixels, theirs.pixels)}")
    // grayscale: no color convert at all — tighter still
    val g = gradient(19, 11, 1)
    val gb = Jpeg.encode(g, quality = 90)
    assert(maxDiff(Jpeg.decode(gb).get.pixels, imageIoDecode(gb).pixels) <= 1)
  }

  test("cross-encoder: our decoder reads javax.imageio's files (default writer settings)") {
    val img = gradient(40, 28, 3)
    val bi = new java.awt.image.BufferedImage(40, 28,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 28; x <- 0 until 40) {
      val o = (y * 40 + x) * 3
      bi.setRGB(x, y, ((img.pixels(o) & 0xff) << 16) |
        ((img.pixels(o + 1) & 0xff) << 8) | (img.pixels(o + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", bos))
    val bytes = bos.toByteArray
    val ours = Jpeg.decode(bytes)
    assert(ours.isDefined, "must decode a stock imageio baseline JPEG")
    assert(ours.get.width == 40 && ours.get.height == 28 && ours.get.channels == 3)
    val theirs = imageIoDecode(bytes)
    // the JDK writer subsamples chroma by default and its reader upsamples
    // with triangular interpolation where we replicate — smooth content
    // bounds the disagreement to the local chroma slope
    assert(meanDiff(ours.get.pixels, theirs.pixels) <= 2.5,
      s"mean disagreement: ${meanDiff(ours.get.pixels, theirs.pixels)}")
    assert(maxDiff(ours.get.pixels, theirs.pixels) <= 32)
  }

  test("restart intervals: decode equals the no-restart decode exactly") {
    val img = gradient(48, 32, 3)
    val plain = Jpeg.decode(Jpeg.encode(img, quality = 80)).get
    val rst = Jpeg.decode(Jpeg.encode(img, quality = 80, restartInterval = 2)).get
    assert(java.util.Arrays.equals(plain.pixels, rst.pixels))
    val rst420 = Jpeg.decode(
      Jpeg.encode(img, quality = 80, subsample420 = true, restartInterval = 1)).get
    val plain420 = Jpeg.decode(Jpeg.encode(img, quality = 80, subsample420 = true)).get
    assert(java.util.Arrays.equals(plain420.pixels, rst420.pixels))
  }

  test("determinism: identical bytes and identical decode across calls") {
    val img = gradient(21, 13, 3)
    val b1 = Jpeg.encode(img, quality = 75, subsample420 = true)
    val b2 = Jpeg.encode(img, quality = 75, subsample420 = true)
    assert(java.util.Arrays.equals(b1, b2))
    assert(java.util.Arrays.equals(Jpeg.decode(b1).get.pixels, Jpeg.decode(b2).get.pixels))
  }

  test("degrade envelope: out-of-scope and corrupt streams return None, never throw") {
    val good = Jpeg.encode(gradient(16, 16, 3), quality = 80)
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    // find SOF0 marker offset
    val sof = (0 until good.length - 1)
      .find(i => (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0).get
    // SOF2 is IN scope since r18 — this stream still degrades because its
    // baseline SOS (Ss=0, Se=63) is not a legal progressive scan header
    assert(Jpeg.decode(patched(b => b(sof + 1) = 0xc2.toByte)).isEmpty,
      "relabeled-progressive with baseline scan params")
    assert(Jpeg.decode(patched(b => b(sof + 1) = 0xc9.toByte)).isEmpty, "arithmetic")
    assert(Jpeg.decode(patched(b => b(sof + 1) = 0xc3.toByte)).isEmpty, "lossless")
    assert(Jpeg.decode(patched(b => b(sof + 4) = 12.toByte)).isEmpty, "12-bit")
    // declared-giant dims: allocation bomb guard, not an allocation
    assert(Jpeg.decode(patched { b =>
      b(sof + 5) = 0xff.toByte; b(sof + 6) = 0xff.toByte
      b(sof + 7) = 0xff.toByte; b(sof + 8) = 0xff.toByte
    }).isEmpty, "allocation bomb")
    // every truncation prefix degrades (scan starve, ragged header, ...)
    for (n <- Seq(1, 2, 3, 4, 20, good.length / 4, good.length / 2, good.length - 3))
      assert(Jpeg.decode(good.take(n)).isEmpty, s"truncated at $n")
    // not a JPEG at all
    assert(Jpeg.decode("plainly not a jpeg".getBytes).isEmpty)
    assert(Jpeg.decode(Array.emptyByteArray).isEmpty)
    assert(Jpeg.decode(null).isEmpty)
    // the original still decodes (the clones never mutated it)
    assert(Jpeg.decode(good).isDefined)
  }

  test("progressive: decode equals the baseline decode of the same raster " +
    "bit-for-bit (same quantized coefficients, split across scans)") {
    // the progressive script (DC Al=1 + band-split AC + DC refinement)
    // carries EXACTLY the quantized coefficients the baseline scan does,
    // so reconstruction must agree byte-for-byte — a much stronger receipt
    // than a slack comparison
    for ((w, h, ch, q, sub) <- Seq((24, 24, 3, 90, false), (17, 9, 3, 75, true),
      (12, 12, 1, 85, false), (23, 5, 1, 60, false), (16, 10, 3, 50, true))) {
      val img = gradient(w, h, ch)
      val base = Jpeg.decode(Jpeg.encode(img, q, sub)).get
      val prog = Jpeg.decode(Jpeg.encodeProgressive(img, q, sub))
      assert(prog.isDefined, s"progressive decode failed for ${w}x${h}x$ch q$q")
      assert(prog.get.width == w && prog.get.height == h)
      assert(java.util.Arrays.equals(prog.get.pixels, base.pixels),
        s"progressive != baseline for ${w}x${h}x$ch q$q sub=$sub " +
          s"(maxDiff ${maxDiff(prog.get.pixels, base.pixels)})")
    }
  }

  test("progressive cross-encoder: our decoder reads javax.imageio's " +
    "PROGRESSIVE files (standard script incl. AC successive approximation)") {
    val img = gradient(40, 28, 3)
    val bi = new java.awt.image.BufferedImage(40, 28,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 28; x <- 0 until 40) {
      val o = (y * 40 + x) * 3
      bi.setRGB(x, y, ((img.pixels(o) & 0xff) << 16) |
        ((img.pixels(o + 1) & 0xff) << 8) | (img.pixels(o + 2) & 0xff))
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    ios.close(); writer.dispose()
    val bytes = bos.toByteArray
    // really progressive: the stream must carry an SOF2 marker
    assert((0 until bytes.length - 1).exists(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc2),
      "imageio did not emit SOF2 — fixture invalid")
    val ours = Jpeg.decode(bytes)
    assert(ours.isDefined, "must decode a stock imageio PROGRESSIVE JPEG")
    assert(ours.get.width == 40 && ours.get.height == 28 && ours.get.channels == 3)
    val theirs = imageIoDecode(bytes)
    // same slack argument as the baseline cross-encoder test (their fancy
    // upsample vs our replication), now through the multi-scan + AC
    // successive-approximation path
    assert(meanDiff(ours.get.pixels, theirs.pixels) <= 2.5,
      s"mean disagreement: ${meanDiff(ours.get.pixels, theirs.pixels)}")
    assert(maxDiff(ours.get.pixels, theirs.pixels) <= 32)
  }

  test("progressive degrade envelope: truncations and malformed scans " +
    "return None, never throw") {
    val good = Jpeg.encodeProgressive(gradient(16, 16, 3), quality = 80)
    assert(Jpeg.decode(good).isDefined)
    for (n <- Seq(1, 2, 4, 20, good.length / 4, good.length / 2,
      good.length * 3 / 4, good.length - 3))
      assert(Jpeg.decode(good.take(n)).isEmpty, s"truncated at $n")
    // a progressive stream missing its EOI (no reconstruction point)
    assert(Jpeg.decode(good.take(good.length - 2)).isEmpty, "missing EOI")
    // DC-refinement-only stream (no DC first pass) must not render
    val gray = Jpeg.encodeProgressive(gradient(8, 8, 1), quality = 80)
    // find the first SOS and flip its Ah/Al byte from first-pass to refine
    val sos = (0 until gray.length - 1).find(i =>
      (gray(i) & 0xff) == 0xff && (gray(i + 1) & 0xff) == 0xda).get
    val ns = gray(sos + 4) & 0xff
    val mutated = gray.clone()
    mutated(sos + 7 + 2 * ns) = 0x10.toByte // AhAl byte → Ah=1: refine-only
    assert(Jpeg.decode(mutated).isEmpty, "refinement before any DC first pass")
  }

  test("magic dispatch: ImageCorpus.decodeImage routes JPEG bytes to the JPEG codec") {
    val img = gradient(12, 10, 3)
    val viaJpeg = graft.sources.ImageCorpus.decodeImage(Jpeg.encode(img, quality = 90))
    assert(viaJpeg.isDefined && viaJpeg.get.width == 12 && viaJpeg.get.channels == 3)
    val viaPng = graft.sources.ImageCorpus.decodeImage(Png.encode(img))
    assert(viaPng.isDefined && java.util.Arrays.equals(viaPng.get.pixels, img.pixels))
  }
}
