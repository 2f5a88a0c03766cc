package graft

import graft.functions.Png
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The library-free PNG codec (SURVEY §2 A9/E6 — the image leg of the
  * multimodal mandate): round-trip per filter type and channel count,
  * corrupt-stream degrade, bilinear-resize fixtures, and the driver
  * queries' decoded-pixel invariants.
  */
class PngSpec extends SparkSpecBase {

  private def mkImage(w: Int, h: Int, ch: Int, seed: Int): Png.Image = {
    val px = new Array[Byte](w * h * ch)
    var i = 0
    while (i < px.length) {
      px(i) = (((i * 2654435761L) >>> 7) + seed * 31).toByte
      i += 1
    }
    Png.Image(w, h, ch, px)
  }

  // ---------------------------------------------------------------- codec

  test("png: round-trip is byte-exact for every filter type x channel count") {
    for (f <- 0 to 4; ch <- Seq(1, 2, 3, 4)) {
      val img = mkImage(13, 7, ch, f * 10 + ch)
      val back = Png.decode(Png.encode(img, _ => f))
        .getOrElse(fail(s"decode failed: filter $f, ch $ch"))
      assert(back.width == 13 && back.height == 7 && back.channels == ch)
      assert(back.pixels.sameElements(img.pixels), s"filter $f, ch $ch")
    }
  }

  test("png: per-row filter rotation round-trips (the driver queries' form)") {
    val img = mkImage(16, 11, 3, 42)
    val back = Png.decode(Png.encode(img, y => y % 5)).get
    assert(back.pixels.sameElements(img.pixels))
  }

  test("png: 1x1 and single-row/column edge shapes round-trip") {
    for ((w, h) <- Seq((1, 1), (1, 9), (9, 1)); f <- 0 to 4) {
      val img = mkImage(w, h, 3, f)
      assert(Png.decode(Png.encode(img, _ => f)).get.pixels
        .sameElements(img.pixels), s"${w}x$h filter $f")
    }
  }

  test("png: corrupt streams degrade to None, never throw") {
    val good = Png.encode(mkImage(12, 9, 3, 7), y => y % 5)
    assert(Png.decode(good).isDefined)
    // bad magic
    val magic = good.clone(); magic(1) = 'Q'.toByte
    assert(Png.decode(magic).isEmpty)
    // CRC mismatch: flip one IDAT payload byte (past the IHDR chunk)
    val flipped = good.clone(); flipped(60) = (flipped(60) ^ 0x55).toByte
    assert(Png.decode(flipped).isEmpty)
    // truncation at every prefix length must not throw
    for (n <- 0 until good.length by 7)
      assert(Png.decode(java.util.Arrays.copyOf(good, n)).isEmpty)
    // declared-giant IHDR (allocation bomb) is rejected, not allocated —
    // rebuild a valid-CRC header claiming 2^30 x 2^30
    assert(Png.decode(resizeIhdr(good, 1 << 30, 1 << 30)).isEmpty)
    // hostile chunk length near Int.MaxValue: the bounds math must not
    // wrap negative and reach the CRC read (decode returns None, never
    // throws — the r15 review catch)
    val hostile = good.clone()
    hostile(8) = 0x7f.toByte; hostile(9) = 0xff.toByte
    hostile(10) = 0xff.toByte; hostile(11) = 0xf0.toByte
    assert(Png.decode(hostile).isEmpty)
    // not PNG at all
    assert(Png.decode("just some text, definitely no raster".getBytes).isEmpty)
    assert(Png.decode(null).isEmpty)
    assert(Png.decode(Array.emptyByteArray).isEmpty)
  }

  /** A copy of `png` with IHDR width/height overwritten and the CRC
    * recomputed — a well-formed header making an absurd claim.
    */
  private def resizeIhdr(png: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = png.clone()
    def putBe32(i: Int, v: Int): Unit = {
      out(i) = (v >>> 24).toByte; out(i + 1) = (v >>> 16).toByte
      out(i + 2) = (v >>> 8).toByte; out(i + 3) = v.toByte
    }
    putBe32(16, w); putBe32(20, h) // IHDR data starts at offset 16
    val crc = new java.util.zip.CRC32()
    crc.update(out, 12, 4 + 13) // type + data
    putBe32(16 + 13, crc.getValue.toInt)
    out
  }

  test("png: out-of-scope forms (16-bit, palette, interlace) degrade") {
    val good = Png.encode(mkImage(8, 8, 1, 1))
    def mut(off: Int, v: Byte): Array[Byte] = {
      val out = good.clone(); out(off) = v
      val crc = new java.util.zip.CRC32()
      crc.update(out, 12, 17)
      out(29) = (crc.getValue >>> 24).toByte; out(30) = (crc.getValue >>> 16).toByte
      out(31) = (crc.getValue >>> 8).toByte; out(32) = crc.getValue.toByte
      out
    }
    assert(Png.decode(mut(24, 16)).isEmpty) // bit depth 16
    assert(Png.decode(mut(25, 3)).isEmpty) // palette
    assert(Png.decode(mut(28, 1)).isEmpty) // Adam7
  }

  // --------------------------------------------------------------- resize

  test("resize: identity dimensions return the exact pixels") {
    val img = mkImage(10, 6, 4, 3)
    assert(Png.resizeBilinear(img, 10, 6).pixels.sameElements(img.pixels))
  }

  test("resize: constant image stays constant at any scale") {
    val img = Png.Image(9, 7, 3, Array.fill(9 * 7 * 3)(113.toByte))
    for ((tw, th) <- Seq((4, 4), (18, 14), (1, 1), (5, 11)))
      assert(Png.resizeBilinear(img, tw, th).pixels.forall(_ == 113.toByte),
        s"${tw}x$th")
  }

  test("resize: exact 2x downscale is the 2x2 block average") {
    val img = mkImage(12, 8, 1, 5)
    val half = Png.resizeBilinear(img, 6, 4)
    for (y <- 0 until 4; x <- 0 until 6) {
      val s = Seq((2 * y, 2 * x), (2 * y, 2 * x + 1), (2 * y + 1, 2 * x),
        (2 * y + 1, 2 * x + 1)).map { case (yy, xx) => img.pixels(yy * 12 + xx) & 0xff }
      val expect = math.round(s.sum / 4.0).toInt
      assert((half.pixels(y * 6 + x) & 0xff) == expect, s"($y,$x)")
    }
  }

  test("resize: hand-computed bilinear fixture (2x2 -> 3x3, gray)") {
    // pixels: 0 100 / 200 40; centers map gx,gy in {0, 0.5, 1}
    val img = Png.Image(2, 2, 1, Array[Byte](0, 100.toByte, 200.toByte, 40))
    val out = Png.resizeBilinear(img, 3, 3).pixels.map(_ & 0xff)
    assert(out.toSeq == Seq(0, 50, 100, 100, 85, 70, 200, 120, 40))
  }

  // ---------------------------------------------------- driver-query side

  test("img queries: decoded stats match direct formula generation") {
    // the operator recomputes stats from DECODED pixels; assert against the
    // generation formula directly for a sample of ids (the in-JVM half of
    // what the DuckDB oracle pins end-to-end)
    for (id <- Seq(0L, 1L, 2L, 17L, 499L)) {
      val img = Multimodal.imgPixels(id)
      val back = Png.decode(Png.encode(img,
        y => Math.floorMod(id + y, 5L).toInt)).get
      assert(back.pixels.sameElements(img.pixels), s"doc $id")
      assert(back.channels == (Math.floorMod(id, 3L).toInt match {
        case 0 => 1; case 1 => 3; case _ => 4
      }))
    }
  }

  test("img_decode_real / img_frames / img_resize_real: shapes and bounds") {
    val d = Multimodal.imgRoundTrip(spark, sf).cache()
    assert(d.count() == Tables.documents(spark, sf).count())
    assert(d.filter(col("mean_luma") < 0 || col("mean_luma") > 255).count() == 0)
    val wh = col("width").cast("long") * col("height")
    assert(d.filter(col("n_pixels") =!= wh && col("n_pixels") =!= wh * 3 &&
      col("n_pixels") =!= wh * 4).count() == 0)
    d.unpersist()

    val f = Multimodal.imgFrameSample(spark, sf).cache()
    // every doc contributes ceil(h/3) frames, h in 8..14 -> 3..5
    val perDoc = f.groupBy("doc_id").count()
    assert(perDoc.filter(col("count") < 3 || col("count") > 5).count() == 0)
    assert(f.filter(col("frame_idx") % 3 =!= 0).count() == 0)
    f.unpersist()

    val r = Multimodal.imgResize(spark, sf).cache()
    assert(r.filter(col("out_w") =!= 5 || col("out_h") =!= 9).count() == 0)
    assert(r.filter(col("mean_val") < 0 || col("mean_val") > 255).count() == 0)
    r.unpersist()
  }
}
