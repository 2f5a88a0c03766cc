package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY §2 A9/E6). The pattern for 100 TB
  * media pipelines: content rides as an opaque `binary` column with typed
  * metadata alongside; decode / feature-extraction runs partition-local.
  * The decode itself is STUBBED deterministically (no media libs in this
  * container) — the Spark-side plumbing (schema, batching, partitioning) is
  * real and tested.
  */
object Multimodal {

  /** A9: pdf-extraction-cache analog (reference: src/pdf-extractor.ts —
    * decode once, key by (path, size), serve text from cache). Binary
    * payload → size, content hash (the cache key), stub page count.
    */
  def pdfDecode(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        col("text").cast("binary").as("content"),
        col("n_chars"))
      .select(col("doc_id"),
        octet_length(col("content")).cast("long").as("byte_size"),
        md5(col("content")).as("content_hash"),
        (octet_length(col("content")) > 0).as("decoded_ok"),
        (lit(1L) + col("n_chars") / lit(1000)).cast("long").as("page_count_stub"))
      .orderBy("doc_id")
  }

  /** E6: opaque-binary metadata extraction — mime sniff stub, byte length,
    * strong hash, first-8-bytes hex (magic-number field).
    */
  def multimodalMeta(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("content"))
      .select(col("doc_id"),
        lit("text/plain").as("mime"),
        octet_length(col("content")).cast("long").as("byte_len"),
        sha2(col("content"), 256).as("sha256"),
        lower(hex(substring(col("content"), 1, 8))).as("head_hex"))
      .orderBy("doc_id")
  }

  /** Frame sampling plumbing — the video-pipeline shape: split an opaque
    * binary payload into fixed-size "frames", keep every `stride`-th one,
    * emit (doc_id, frame_idx, frame_offset, frame_hash). The frame decode
    * itself is the stubbed step (a real pipeline parses container
    * structure); the row-explosion schema, per-partition batching, and
    * offset bookkeeping are the real part — identical for real codecs.
    */
  def frameSample(docs: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val nFrames = ceil(octet_length(col("content")).cast("double") / frameBytes).cast("int")
    docs
      .select(col("doc_id"), col("content"), nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("content"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % stride === 0)
      .select(col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        (col("frame_idx").cast("long") * frameBytes).as("frame_offset"),
        md5(col("content").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)))
          .as("frame_hash"))
  }

  /** Resize plumbing — downsample the byte-histogram "image" to a fixed
    * target dimension (deterministic stand-in for pixel resampling; the
    * interpolation kernel is the stubbed part). Pure per-row transform.
    */
  def resizeFeatures(feats: DataFrame, targetDim: Int = 4): DataFrame = {
    // one strided pass per output element (j = i, i+k, i+2k, …): each input
    // element is visited exactly once across outputs, no struct staging.
    // Guard short inputs: sequence(start, stop, step) rejects start > stop
    // with a positive step, so output slots beyond the array are plain 0.
    feats.select(col("doc_id"),
      transform(sequence(lit(0), lit(targetDim - 1)), i =>
        when(i <= size(col("feat")) - 1,
          round(aggregate(
            sequence(i, size(col("feat")) - 1, lit(targetDim)),
            lit(0.0), (acc, j) => acc + element_at(col("feat"), j + 1)) + lit(1e-9), 4))
          .otherwise(lit(0.0)))
        .as("feat_resized"))
  }

  /** Encode side of the PDF round trip: each document's text becomes a real
    * one-page FlateDecode PDF (correct /Length, escaped literal strings) as
    * a binary column — partition-local, no shuffle, the same mapPartitions
    * shape as the decode. Text must already be within extract's fidelity
    * envelope (latin-1; the driver query sanitizes to printable ASCII
    * first so the DuckDB oracle can express the same projection).
    */
  def pdfEncode(docs: DataFrame, lean: Boolean = false): DataFrame = {
    import graft.functions.PdfText
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = false)))
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    implicit val enc = RowEncoder.encoderFor(outSchema)
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val text = if (r.isNullAt(1)) "" else r.getString(1) // nullable column
          // rotate the encode form by doc_id: literal Tj / kerned TJ array /
          // hex string / CID composite font (2-byte ToUnicode-mapped codes)
          // / ENCRYPTED (standard security handler — RC4 or AES by parity)
          // / LZW- or RunLength-filtered chains (r12, by parity) / a
          // simple font whose text is only recoverable via the /Encoding
          // glyph map (r12 — /Differences-remapped bytes behind an
          // indirect encoding dict, or bare /WinAnsiEncoding) — all
          // decode to the same text, so the gate exercises every parser
          // path — CMap machinery, decryption, the non-Flate filter
          // legs, and the glyph-name path included — against one oracle.
          // floorMod: Scala % is signed — a negative doc_id must still
          // rotate through all forms, not collapse to the literal one
          // the INNER rotations must key on floorDiv(id, 7), not on id:
          // an id-keyed inner rotation correlates with the outer mod-7
          // pick and can collapse to one branch, silently dropping
          // AES/R6/LZW/Differences from the oracle gate
          Row(id, if (lean) Math.floorMod(id, 11L).toInt match {
            // LEAN (bench-only) rotation: every NON-CRYPTO parser leg —
            // literal/TJ/hex show strings, CID CMap, LZW/RLE filter
            // chains, /Differences glyph maps, both embedded-TrueType
            // legs, and both embedded-Type1 legs (CFF + cleartext) —
            // so a pure-parsing throughput regression stays
            // visible to the bench and the cross-round drift detector.
            // Only the encrypted forms are excluded: AES-256 R5/R6 key
            // derivation is DELIBERATELY slow hashing (ISO 32000-2
            // Algorithm 2.B) and was growing the bench linearly per form
            // (2.40 s in r12) while timing the oracle fixture, not the
            // parser. Verify keeps the full rotation under the oracle.
            case 3 => PdfText.buildCidPdf(text)
            case 4 => PdfText.buildPdf(Seq(PdfText.textPage(text)),
              // inner parity keys on the OUTER divisor's quotient (11,
              // not a stale 9) per the decorrelation rule above
              if (Math.floorMod(Math.floorDiv(id, 11L), 2L) == 0L) Seq("LZWDecode")
              else Seq("RunLengthDecode", "FlateDecode"))
            case 5 => PdfText.buildSimpleFontPdf(text, differences = true,
              indirectEncoding = true)
            case 6 => PdfText.buildSimpleFontPdf(text, differences = false)
            case 7 => PdfText.buildTrueTypePdf(text)
            case 8 => PdfText.buildTrueTypePdf(text, viaPost = true)
            case 9 => PdfText.buildType1Pdf(text)
            case 10 => PdfText.buildType1Pdf(text, viaCff = false)
            case v => PdfText.buildPdf(Seq(PdfText.textPage(text, v)), flate = true)
          }
          else Math.floorMod(id, 7L).toInt match {
            case 3 => PdfText.buildCidPdf(text)
            case 4 => Math.floorMod(Math.floorDiv(id, 7L), 6L).toInt match {
              case 0 => PdfText.buildEncryptedPdf(Seq(PdfText.textPage(text)), aes = true)
              case 1 => PdfText.buildEncryptedPdf(Seq(PdfText.textPage(text)), aes = false)
              case 2 => PdfText.buildEncryptedPdfR6(Seq(PdfText.textPage(text)))
              // PASSWORD-protected forms (r12): decode side supplies the
              // corpus-wide password — RC4-128 with a real Algorithm-5 /U
              // (validation must pass), AES-256 R6 keyed on the password,
              // and an OWNER-password open (the batch password is the
              // owner credential; the user password is different, so only
              // the Algorithm-7 inversion can derive the file key)
              case 3 => PdfText.buildEncryptedPdf(Seq(PdfText.textPage(text)),
                aes = false, password = PdfPassword)
              case 4 => PdfText.buildEncryptedPdfR6(Seq(PdfText.textPage(text)),
                password = PdfPassword)
              case _ => PdfText.buildEncryptedPdf(Seq(PdfText.textPage(text)),
                aes = false, password = "not-the-batch-password",
                ownerPassword = PdfPassword)
            }
            case 5 => PdfText.buildPdf(Seq(PdfText.textPage(text)),
              if (Math.floorMod(Math.floorDiv(id, 7L), 2L) == 0L) Seq("LZWDecode")
              else Seq("RunLengthDecode", "FlateDecode"))
            case 6 => Math.floorMod(Math.floorDiv(id, 7L), 6L).toInt match {
              // glyph-mapped simple fonts (r12) and EMBEDDED font
              // programs (r13 — mapping only inside the FontFile2
              // cmap/post tables or the FontFile/FontFile3 Type1-family
              // encoding; the subset-font classes that closed the
              // envelope)
              case 0 => PdfText.buildSimpleFontPdf(text, differences = true,
                indirectEncoding = true)
              case 1 => PdfText.buildSimpleFontPdf(text, differences = false)
              case 2 => PdfText.buildTrueTypePdf(text)
              case 3 => PdfText.buildTrueTypePdf(text, viaPost = true)
              case 4 => PdfText.buildType1Pdf(text)
              case _ => PdfText.buildType1Pdf(text, viaCff = false)
            }
            case v => PdfText.buildPdf(Seq(PdfText.textPage(text, v)), flate = true)
          })
        }
      }
  }

  /** A9b driver query `pdf_decode_real`: the REAL decode path under the
    * oracle gate. Sanitize text to the printable-ASCII envelope (a
    * projection DuckDB can replicate), build a genuine FlateDecode PDF per
    * document ([[pdfEncode]]), then recover the text with the real parser
    * ([[pdfExtract]]) — the oracle asserts round-trip identity plus the
    * parser-derived is_pdf/n_pages. Encode and decode pipeline in one
    * narrow stage (no shuffle; the PDF bytes never leave the task).
    */
  /** One space per CODEPOINT outside printable ASCII: Java regex matches
    * per UTF-16 code unit but the DuckDB oracle's per codepoint, so the
    * surrogate-pair alternative must come first or an astral char becomes
    * two spaces Spark-side and one oracle-side. Coalesce aligns the
    * nullable column on both sides.
    */
  private[graft] def asciiSanitize(c: Column): Column =
    regexp_replace(coalesce(c, lit("")),
      "(?:[\\uD800-\\uDBFF][\\uDC00-\\uDFFF]|[^\\x20-\\x7E])", " ")

  /** The corpus-wide user password the rotation's protected forms use —
    * one password for the whole batch, the shape a real ingest of a
    * protected document set has (unprotected documents ignore it).
    */
  private[graft] val PdfPassword = "gr4ft-batch"

  def pdfRoundTrip(spark: SparkSession, sfDir: String,
                   lean: Boolean = false): DataFrame = {
    val sanitized = Tables.documents(spark, sfDir)
      .select(col("doc_id"), asciiSanitize(col("text")).as("text"))
    pdfExtract(pdfEncode(sanitized, lean), PdfPassword).orderBy("doc_id")
  }

  /** REAL PDF text extraction over a binary column (doc_id, content) —
    * partition-local decode via mapPartitions (the declared decoder shape),
    * parsing actual PDF bytes with [[graft.functions.PdfText]]: FlateDecode
    * streams, literal/hex show strings, Tj/TJ/quote operators, page count.
    * Non-PDF bytes yield (is_pdf=false, 0 pages, empty text) — the driver
    * fixture's synthetic documents all take that branch, which is why the
    * `pdf_decode` oracle query keeps its deterministic stub columns; REAL
    * PDFs (spec-fed, handcrafted) take this one. Closes the decode half of
    * the reference's pdf-extractor contract (src/pdf-extractor.ts) as far
    * as a library-free container allows.
    */
  def pdfExtract(docs: DataFrame, password: String = ""): DataFrame = {
    import graft.functions.PdfText
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("is_pdf", BooleanType, nullable = false),
      StructField("n_pages", IntegerType, nullable = false),
      StructField("text", StringType, nullable = false)))
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    implicit val enc = RowEncoder.encoderFor(outSchema)
    docs.select(col("doc_id"), col("content").cast("binary").as("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          PdfText.extract(r.getAs[Array[Byte]](1), password) match {
            case Some(d) => Row(id, true, d.nPages, d.text)
            case None => Row(id, false, 0, "")
          }
        }
      }
  }

  /** REAL media-header decoding over a binary column (r11) — the
    * library-free slice of the multimodal decode story: container headers
    * need no codec, so format sniffing and dimension/signal metadata are
    * genuinely parsed, not stubbed (the pixel/sample decode behind them
    * remains the declared stub). PNG (IHDR width/height/bit depth), JPEG
    * (marker walk to the first SOF frame: height/width/precision — EXIF
    * and progressive files included, since APPn segments are skipped by
    * their lengths), GIF87a/89a (logical screen LE dims), and WAV (RIFF
    * chunk walk to `fmt `: channels, sample rate, bits per sample).
    * Unknown bytes → format "unknown", null metadata — degrade, never
    * throw. Partition-local mapPartitions like every decode here.
    */
  def mediaMeta(docs: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("bit_depth", IntegerType, nullable = true)))
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    implicit val enc = RowEncoder.encoderFor(outSchema)
    docs.select(col("doc_id"), col("content").cast("binary").as("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          val (f, w, h, ch, sr, bd) = Multimodal.parseMediaHeader(b)
          Row(id, f, w.map(Int.box).orNull, h.map(Int.box).orNull,
            ch.map(Int.box).orNull, sr.map(Int.box).orNull, bd.map(Int.box).orNull)
        }
      }
  }

  /** Header parse shared by the batch operator and any streaming twin. */
  private[graft] def parseMediaHeader(b: Array[Byte])
      : (String, Option[Int], Option[Int], Option[Int], Option[Int], Option[Int]) = {
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int = (be16(i) << 16) | be16(i + 2)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = le16(i) | (le16(i + 2) << 16)
    def ascii(i: Int, n: Int): String =
      if (b == null || b.length < i + n) "" else new String(b, i, n, "ISO-8859-1")
    try {
      if (b == null || b.length < 12) ("unknown", None, None, None, None, None)
      else if (u8(0) == 0x89 && ascii(1, 3) == "PNG" && ascii(12, 4) == "IHDR" &&
        b.length >= 26)
        ("png", Some(be32(16)), Some(be32(20)), None, None, Some(u8(24)))
      else if (u8(0) == 0xff && u8(1) == 0xd8) {
        // marker walk: skip segments by length until a start-of-frame.
        // ITU T.81 allows any number of 0xFF fill bytes before a marker,
        // and entropy data follows SOS — both must not desync the walk.
        var i = 2
        var res: Option[(Int, Int, Int)] = None
        while (res.isEmpty && i + 3 < b.length && u8(i) == 0xff) {
          if (u8(i + 1) == 0xff) i += 1 // fill byte before the marker
          else {
            val m = u8(i + 1)
            if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2 // bare markers
            else if (m == 0xd9 || m == 0xda) i = b.length // EOI / SOS: no SOF found
            else {
              val len = be16(i + 2)
              if (len < 2) i = b.length // malformed — stop
              else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
                if (i + 9 < b.length)
                  res = Some((be16(i + 7), be16(i + 5), u8(i + 4))) // (w, h, precision)
                i = b.length
              } else i += 2 + len
            }
          }
        }
        res match {
          case Some((w, h, prec)) => ("jpeg", Some(w), Some(h), None, None, Some(prec))
          case None => ("jpeg", None, None, None, None, None)
        }
      }
      else if (ascii(0, 3) == "GIF" && (ascii(3, 3) == "87a" || ascii(3, 3) == "89a"))
        ("gif", Some(le16(6)), Some(le16(8)), None, None, None)
      else if (ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") {
        // chunk walk to "fmt " (word-aligned sizes)
        var i = 12
        var res: Option[(Int, Int, Int)] = None
        while (res.isEmpty && i + 8 <= b.length) {
          val cid = ascii(i, 4)
          val sz = le32(i + 4)
          if (cid == "fmt " && i + 24 <= b.length && sz >= 16)
            res = Some((le16(i + 10), le32(i + 12), le16(i + 22)))
          i += 8 + sz + (sz & 1)
          if (sz < 0) i = b.length // malformed
        }
        res match {
          case Some((ch, sr, bits)) => ("wav", None, None, Some(ch), Some(sr), Some(bits))
          case None => ("wav", None, None, None, None, None)
        }
      }
      else ("unknown", None, None, None, None, None)
    } catch { case _: Exception => ("unknown", None, None, None, None, None) }
  }

  // ------------------------------------------------------------ real images

  /** Deterministic synthetic raster for a document — the pixel analog of
    * the sanitized-text envelope [[pdfRoundTrip]] encodes: dimensions and
    * every sample value are closed-form in (doc_id, y, x, c), so the DuckDB
    * oracle can regenerate the exact bytes WITHOUT a PNG codec and the
    * round trip proves the real decode byte-for-byte. Channel count rotates
    * gray/RGB/RGBA so one corpus exercises every bpp the un-filter loop
    * supports.
    */
  private[graft] def imgPixels(id: Long): graft.functions.Png.Image = {
    val w = 8 + Math.floorMod(id, 9L).toInt
    val h = 8 + Math.floorMod(id, 7L).toInt
    val ch = Math.floorMod(id, 3L).toInt match { case 0 => 1; case 1 => 3; case _ => 4 }
    val px = new Array[Byte](w * h * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          px((y * w + x) * ch + c) =
            Math.floorMod(id * 31 + y * 17 + x * 5 + c * 7, 256L).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    graft.functions.Png.Image(w, h, ch, px)
  }

  /** Canonical pixel string (3-digit zero-padded decimal per sample, row
    * major) — the form both engines hash: Spark from DECODED pixels, the
    * oracle from the generation formula via string_agg.
    */
  private[graft] def pixelCanonical(px: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(px.length * 3)
    var i = 0
    while (i < px.length) {
      val v = px(i) & 0xff
      sb.append(('0' + v / 100).toChar)
      sb.append(('0' + v / 10 % 10).toChar)
      sb.append(('0' + v % 10).toChar)
      i += 1
    }
    sb.toString
  }

  private[graft] def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("ISO-8859-1"))
    val sb = new java.lang.StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /** 4dp half-up with the repo's 1e-9 nudge — [[RagSearch.round4]], the
    * JVM twin of the oracle's `round(x + 1e-9, 4)`.
    */
  private def round4(v: Double): Double = RagSearch.round4(v)

  /** Encode the document's synthetic raster as a real PNG (row filter
    * rotating through all five types) and decode it back — THE round-trip
    * every image driver query starts from, shared so the filter rotation
    * (which the oracle hashes depend on) lives in exactly one place.
    * decode() is total on well-formed input; a None means the codec
    * broke — a hard error, never a silent row drop.
    */
  private def decodedImage(id: Long, tag: String): graft.functions.Png.Image = {
    import graft.functions.Png
    val png = Png.encode(imgPixels(id),
      filterFor = y => Math.floorMod(id + y, 5L).toInt)
    Png.decode(png).getOrElse(
      throw new IllegalStateException(s"$tag: doc $id"))
  }

  /** Driver query `img_decode_real` — the REAL image decode under the
    * oracle gate, closing the stubbed half of the multimodal mandate the
    * same way A9b closed PDF: per document, build the deterministic raster
    * ([[imgPixels]]), encode it as a genuine PNG with the row filter
    * rotating through all five types ((doc_id + y) mod 5 — every image
    * exercises None/Sub/Up/Average/Paeth), then parse the PNG back with the
    * library-free codec ([[graft.functions.Png.decode]]: chunk walk, CRC32
    * verification, zlib inflate, row un-filter) and report stats computed
    * from the DECODED pixels. The oracle regenerates the same stats from
    * the closed-form pixel formula — a hash match proves the codec
    * round-trips byte-exactly. Encode and decode pipeline in one narrow
    * stage; the PNG bytes never leave the task.
    */
  def imgRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Png
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_pixels", LongType, nullable = false),
      StructField("pixel_hash", StringType, nullable = false),
      StructField("mean_luma", DoubleType, nullable = false)))
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    implicit val enc = RowEncoder.encoderFor(outSchema)
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val img = decodedImage(id, "img_decode_real")
          var sum = 0L
          img.pixels.foreach(b => sum += (b & 0xff))
          Row(id, img.width, img.height,
            img.width.toLong * img.height * img.channels,
            md5Hex(pixelCanonical(img.pixels)),
            round4(sum.toDouble / (img.width.toLong * img.height * img.channels)))
        }
      }.orderBy("doc_id")
  }

  /** Driver query `img_frames` — [[frameSample]]'s plumbing fed REAL
    * pixels: each decoded image's rows are the frames (the row strip is
    * the video-frame analog), every `stride`-th one kept, hashed and
    * averaged from actual decoded bytes. Same closed-form oracle story as
    * [[imgRoundTrip]].
    */
  def imgFrameSample(spark: SparkSession, sfDir: String, stride: Int = 3): DataFrame = {
    import graft.functions.Png
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("frame_hash", StringType, nullable = false),
      StructField("frame_mean", DoubleType, nullable = false)))
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    implicit val enc = RowEncoder.encoderFor(outSchema)
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val img = decodedImage(id, "img_frames")
          val rowLen = img.width * img.channels
          (0 until img.height by stride).map { y =>
            val strip = java.util.Arrays.copyOfRange(img.pixels,
              y * rowLen, (y + 1) * rowLen)
            var sum = 0L
            strip.foreach(b => sum += (b & 0xff))
            Row(id, y.toLong, md5Hex(pixelCanonical(strip)),
              round4(sum.toDouble / rowLen))
          }
        }
      }.orderBy("doc_id", "frame_idx")
  }

  /** Driver query `img_resize_real` — [[resizeFeatures]]'s plumbing fed
    * REAL pixels through the real interpolation kernel: decode the PNG,
    * bilinear-resample to (tw, th) ([[graft.functions.Png.resizeBilinear]]),
    * report stats from the RESAMPLED bytes. The oracle replays the bilinear
    * arithmetic closed-form (source pixels from the generation formula, the
    * identical IEEE double expression order, floor(v+0.5) rounding) — a
    * hash match pins the kernel, not just the plumbing. Non-integer scale
    * both ways (width 8–16 → 5: downscale; height 8–14 → 9: up at h=8,
    * down otherwise) so both edge-clamp paths run.
    */
  def imgResize(spark: SparkSession, sfDir: String,
                tw: Int = 5, th: Int = 9): DataFrame = {
    import graft.functions.Png
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("out_w", IntegerType, nullable = false),
      StructField("out_h", IntegerType, nullable = false),
      StructField("pixel_hash", StringType, nullable = false),
      StructField("mean_val", DoubleType, nullable = false)))
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    implicit val enc = RowEncoder.encoderFor(outSchema)
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val rs = Png.resizeBilinear(decodedImage(id, "img_resize_real"), tw, th)
          var sum = 0L
          rs.pixels.foreach(b => sum += (b & 0xff))
          Row(id, rs.width, rs.height,
            md5Hex(pixelCanonical(rs.pixels)),
            round4(sum.toDouble / rs.pixels.length))
        }
      }.orderBy("doc_id")
  }

  /** The real decode plumbing: partition-local batch "decode" over the binary
    * column via mapPartitions on a typed Dataset — the shape a Pandas-UDF /
    * native decoder would plug into. Deterministic fake features (byte
    * histogram moments) stand in for the media decoder. Not a driver query
    * (spec-tested): the point is the batching + schema contract.
    */
  def decodeFeatures(spark: SparkSession, sfDir: String, featDim: Int = 8): DataFrame = {
    val in = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("content"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("feat", ArrayType(DoubleType, containsNull = false), nullable = false)))
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    implicit val enc = RowEncoder.encoderFor(outSchema)
    in.mapPartitions { rows =>
      // partition-local "decoder": one setup per partition (where a real
      // decoder would load its model/codec), then batch over rows
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val feat = new Array[Double](featDim)
        var i = 0
        while (i < bytes.length) { feat(i % featDim) += (bytes(i) & 0xff) / 255.0; i += 1 }
        Row(id, feat.toSeq)
      }
    }
  }

  // ------------------------------------------------------------------ JPEG

  /** The `jpg_decode_real` fixture forms, rotated by doc_id — together
    * they cover 4:4:4 / 4:2:0 / grayscale, three quality tiers, restart
    * intervals, odd (partial-MCU) dimensions, and (r18) PROGRESSIVE
    * streams in color-subsampled and grayscale flavors:
    * (width, height, channels, quality, subsample420, restartInterval);
    * restartInterval == -1 selects the SOF2 progressive encoder (its
    * multi-scan script has no restart markers).
    */
  private[graft] val JpgForms: IndexedSeq[(Int, Int, Int, Int, Boolean, Int)] =
    IndexedSeq(
      (16, 10, 3, 90, false, 0),
      (17, 9, 3, 75, true, 0),
      (12, 12, 1, 85, false, 0),
      (16, 16, 3, 50, false, 2),
      (9, 7, 3, 90, true, 1),
      (23, 5, 1, 60, false, 0),
      (20, 14, 3, 80, true, -1), // progressive, 4:2:0 color
      (11, 17, 1, 70, false, -1)) // progressive, grayscale

  /** The form's source raster — a smooth closed-form gradient (JPEG is
    * lossy: low-frequency content keeps quantization error small and the
    * decoded stats meaningful). Pure function of the FORM, so the whole
    * corpus decodes to six distinct stat rows — the shape a VALUES-CTE
    * oracle can pin.
    */
  private[graft] def jpgFormRaster(form: Int): graft.functions.Png.Image = {
    val (w, h, ch, _, _, _) = JpgForms(form)
    val px = new Array[Byte](w * h * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          val v = ((x * 255) / math.max(1, w - 1) +
            (y * 200) / math.max(1, h - 1) + form * 13 + c * 9) / 2
          px((y * w + x) * ch + c) = (v & 0xff).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    graft.functions.Png.Image(w, h, ch, px)
  }

  /** The decoded stats for one form — encode the fixture raster as a real
    * baseline JPEG ([[graft.functions.Jpeg.encode]]) and decode it back
    * with the real parser, stats from the DECODED pixels. Deterministic
    * end-to-end (StrictMath tables, integer entropy coding), so these six
    * rows are frozen as LITERALS in the driver oracle: unlike PNG there is
    * no lossless round-trip to replay in SQL, so the gate pins the codec's
    * verified output (cross-validated against javax.imageio in JpegSpec) —
    * a codec regression moves the Spark side and fails the hash.
    */
  private[graft] def jpgFormStats(form: Int): (Int, Int, Int, String, Double) = {
    import graft.functions.Jpeg
    val (_, _, _, q, sub, rst) = JpgForms(form)
    val bytes =
      if (rst < 0) Jpeg.encodeProgressive(jpgFormRaster(form), q, sub)
      else Jpeg.encode(jpgFormRaster(form), q, sub, rst)
    val dec = Jpeg.decode(bytes)
      .getOrElse(throw new IllegalStateException(s"jpg form $form"))
    var sum = 0L
    dec.pixels.foreach(b => sum += (b & 0xff))
    (dec.width, dec.height, dec.channels,
      md5Hex(pixelCanonical(dec.pixels)),
      round4(sum.toDouble / dec.pixels.length))
  }

  /** Driver query `jpg_decode_real` — the REAL baseline-JPEG decode under
    * the oracle gate, the A9c pattern for the lossy format: per document,
    * pick the (doc_id mod 8) fixture form, encode it as a genuine baseline
    * JPEG and decode it back with the library-free parser (huffman → dequant
    * → IDCT → upsample → YCbCr), stats from the DECODED pixels. One narrow
    * mapPartitions stage; the JPEG bytes never leave the task. The oracle
    * joins documents against the eight frozen stat literals on doc_id % 8.
    */
  /** Driver query `img_files_real` — A12 (real image-FILE ingest) under the
    * DuckDB gate, the one §2 row the r17 verdict flagged as spec-only: the
    * query materializes a REAL temp tree of PNG + JPEG files (one of each
    * per gated doc_id: the PNG from the closed-form [[imgPixels]] raster,
    * the JPEG from the (doc_id mod 8) [[jpgFormRaster]] fixture), ingests
    * it TWICE through [[graft.sources.ImageCorpus.readImageStats]] over a
    * real [[graft.sources.ExtractCache]], and — between the passes —
    * POISONS every file on disk with same-length garbage. Pass 2 therefore
    * proves the decode-once cache live inside the gate: byte sizes are
    * unchanged so every row must serve from the cache (decoded_ok=true,
    * original stats); a broken cache re-decodes garbage and flips
    * decoded_ok/hash, failing the oracle. The oracle regenerates the PNG
    * stats closed-form (the img_decode_real CTEs, gated to the fixture
    * ids) and joins the JPEG stats as the jpg_decode_real frozen literals
    * (ONE pixel-hash canonical repo-wide since r18). Reference:
    * pdf-extractor.ts:33-221 — the cache contract being gated.
    *
    * Fixture writes/poisons are distributed (foreachPartition through the
    * Hadoop FS API — DFS-portable); ids are gated to doc_id % 25 = 0 so
    * the tree stays a fixture (2 files/gated doc) while all eight JPEG forms
    * and every PNG dims/channel variant still cycle (gcd(25, 8)=gcd(25, 7·9·3)=1).
    */
  /** The img_files_real scratch root for one (sfDir, stride) arm — ONE
    * definition shared with ImgFilesRealSpec's poison receipt, which reads
    * the tree the query left behind (the spec drifted once when the stride
    * suffix landed only here).
    */
  private[graft] def imgFilesBase(sfDir: String, stride: Int): String =
    "/tmp/graft_imgfiles/" + md5Hex(sfDir + s"_$stride")

  def imgFilesReal(spark: SparkSession, sfDir: String,
                   stride: Int = 25): DataFrame = {
    import graft.functions.{Jpeg, Png}
    val base = imgFilesBase(sfDir, stride)
    val treeRoot = base + "/tree"
    val cachePath = base + "/cache"
    val hconf = spark.sparkContext.hadoopConfiguration
    val basePath = new org.apache.hadoop.fs.Path(base)
    basePath.getFileSystem(hconf).delete(basePath, true)
    val confBc = spark.sparkContext.broadcast(
      new graft.sources.SerializableHadoopConf(hconf))
    val ids = Tables.documents(spark, sfDir).select(col("doc_id"))
      .where(col("doc_id") % stride === 0)
    // the task closures reference only captured serializable locals plus
    // ImgFixtures' static module — a nested def here would lift onto
    // Multimodal$ (not serializable) and capture `this`
    def writeTree(): Unit =
      ids.foreachPartition { rows: Iterator[Row] =>
        val conf = confBc.value.value
        rows.foreach { r =>
          ImgFixtures.fileBytes(r.getLong(0)).foreach { case (name, bytes) =>
            val p = new org.apache.hadoop.fs.Path(treeRoot, name)
            val out = p.getFileSystem(conf).create(p, true)
            try out.write(bytes)
            finally out.close()
          }
        }
      }
    // poison: same LENGTH (the cache key is (relPath, byte_size)),
    // unreadable content — a re-decode cannot reproduce the stats. Length
    // comes from the file on disk, so the poison pass re-encodes nothing
    // (r18: it used to rebuild every PNG+JPEG a second time just to size
    // the garbage).
    def poisonTree(): Unit =
      ids.foreachPartition { rows: Iterator[Row] =>
        val conf = confBc.value.value
        rows.foreach { r =>
          ImgFixtures.fileNames(r.getLong(0)).foreach { name =>
            val p = new org.apache.hadoop.fs.Path(treeRoot, name)
            val fs = p.getFileSystem(conf)
            val len = fs.getFileStatus(p).getLen.toInt
            val out = fs.create(p, true)
            try out.write(Array.fill[Byte](len)('X'))
            finally out.close()
          }
        }
      }
    writeTree()
    // pass 1: misses decode through the real cache. ExtractCache.through
    // WRITES the cache eagerly inside the call (merged.write is an
    // action), so constructing the frame materializes it — no extra
    // count() job needed (r18).
    graft.sources.ImageCorpus.readImageStats(spark, treeRoot, exts = Seq("png", "jpg"),
      cachePath = Some(cachePath))
    // eagerness receipt (r18 ADVICE): the poison pass below rewrites the
    // tree, so pass 1's cache MUST be fully on disk here — through()'s
    // documented contract, asserted cheaply so a future lazy refactor of
    // ExtractCache fails loudly instead of silently caching garbage stats
    require(basePath.getFileSystem(hconf)
      .exists(new org.apache.hadoop.fs.Path(cachePath)),
      s"imgFilesReal: pass 1 did not materialize the cache at $cachePath")
    poisonTree()
    // pass 2: unchanged byte sizes — every row MUST come from the cache
    val pass2 = graft.sources.ImageCorpus.readImageStats(spark, treeRoot,
      exts = Seq("png", "jpg"), cachePath = Some(cachePath))
    pass2
      .withColumn("doc_id",
        regexp_extract(col("path"), "img_(\\d+)\\.", 1).cast("long"))
      .withColumn("kind", regexp_extract(col("path"), "\\.([a-z]+)$", 1))
      .select(col("doc_id"), col("kind"), col("decoded_ok"), col("width"),
        col("height"), col("channels"), col("n_pixels"), col("pixel_hash"),
        col("mean_luma"))
      .orderBy("doc_id", "kind")
  }

  def jpgRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("form", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("pixel_hash", StringType, nullable = false),
      StructField("mean_luma", DoubleType, nullable = false)))
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    implicit val enc = RowEncoder.encoderFor(outSchema)
    val nForms = JpgForms.length
    // r18 optimization (guide §1.2 "per-task work"): the decoded stats are
    // a pure function of the FORM index — the old per-row call re-ran an
    // identical encode+decode round trip n_docs/nForms times. One round
    // trip per form here (still inside the timed query, re-done on every
    // invocation), tasks look the tuple up by form.
    val formStats: Array[(Int, Int, Int, String, Double)] =
      Array.tabulate(nForms)(jpgFormStats)
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val form = Math.floorMod(id, nForms.toLong).toInt
          val (w, h, ch, hash, luma) = formStats(form)
          Row(id, form, w, h, ch, hash, luma)
        }
      }.orderBy("doc_id")
  }
}

/** The img_files_real fixture encodes, on their own top-level object so the
  * distributed write closure reaches them through a STATIC module access
  * (no `Multimodal$` capture — the object is not serializable by design).
  */
private[operators] object ImgFixtures {
  /** Per-form JPEG fixture bytes — a pure function of the 8 form CONSTANTS
    * (no testdata input), so one encode per form per JVM instead of one per
    * gated doc per pass (r18, guide §1.2: the fixture encode was the
    * query's hottest per-task work and every byte beyond the first 8
    * encodes was identical).
    */
  private lazy val jpgByForm: Array[Array[Byte]] =
    Array.tabulate(Multimodal.JpgForms.length) { form =>
      val (_, _, _, q, sub, rst) = Multimodal.JpgForms(form)
      if (rst < 0) graft.functions.Jpeg.encodeProgressive(
        Multimodal.jpgFormRaster(form), q, sub)
      else graft.functions.Jpeg.encode(
        Multimodal.jpgFormRaster(form), q, sub, rst)
    }

  /** The two fixture file names of one gated doc — the poison pass needs
    * names only (lengths come from the files already on disk).
    */
  def fileNames(id: Long): Seq[String] =
    Seq(s"img_$id.png", s"img_$id.jpg")

  def fileBytes(id: Long): Seq[(String, Array[Byte])] = {
    val form = Math.floorMod(id, Multimodal.JpgForms.length.toLong).toInt
    Seq(
      s"img_$id.png" -> graft.functions.Png.encode(Multimodal.imgPixels(id),
        filterFor = y => Math.floorMod(id + y, 5L).toInt),
      s"img_$id.jpg" -> jpgByForm(form))
  }
}
