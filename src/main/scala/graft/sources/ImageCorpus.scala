package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Image-file corpus source — the [[TextCorpus.readPdfAsText]] analog for
  * pixels (reference: src/pdf-extractor.ts's binary→content pathway): walk
  * a root for real image files, decode each ONCE with the library-free
  * codecs ([[graft.functions.Png]]; JPEG via [[graft.functions.Jpeg]]),
  * cache the decoded STATS keyed (relPath, byte_size), and serve
  * `(path, byte_size, decoded_ok, width, height, channels, n_pixels,
  * pixel_hash, mean_luma)` rows — the frame that answers "what are the
  * dimensions of the images in this tree" without re-opening a single file
  * on a no-change round.
  *
  * Stats, not pixels, are what is cached: downstream consumers (catalog,
  * dedup by pixel_hash, the documents-table diff) need the metadata row;
  * caching rasters would multiply storage by the decode ratio for bytes
  * nothing re-reads. A consumer that needs pixels decodes its own bounded
  * set through the same codec.
  *
  * Scale shape: listing distributes and is metadata-only (no file opened
  * at discovery), the glob prunes before any open, decode is
  * partition-local on cache misses only, and the per-file degrade envelope
  * (corrupt/oversized → decoded_ok=false, cached) matches the PDF leg's
  * never-throws contract.
  */
object ImageCorpus {

  /** Extensions the image leg claims (lowercase). */
  val ImageExts: Set[String] = Set("png", "jpg", "jpeg")

  /** Open-size cap: a file larger than this is never read — it degrades to
    * a decoded_ok=false row (and is cached as such), same rationale as
    * [[TextCorpus.DefaultMaxPdfBytes]].
    */
  val DefaultMaxImageBytes: Long = 64L << 20

  private val StatsSchema = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("byte_size", LongType, nullable = false),
    StructField("decoded_ok", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("pixel_hash", StringType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** Stats columns in cache-schema order (shared with the streaming twin
    * so batch and stream emit the same shape).
    */
  private[graft] val StatsCols: Seq[String] = Seq(
    "decoded_ok", "width", "height", "channels", "n_pixels",
    "pixel_hash", "mean_luma")

  /** Decode `bytes` by magic-byte sniff (PNG signature → [[graft.functions.Png]],
    * JPEG SOI → [[graft.functions.Jpeg]]) — the one dispatch point both the
    * batch and streaming legs call. None = not an image this engine decodes
    * (corrupt, truncated, out-of-scope form), the degrade row's source.
    */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[graft.functions.Png.Image] =
    if (bytes == null || bytes.length < 3) None
    else if (bytes(0) == 0x89.toByte && bytes(1) == 'P') graft.functions.Png.decode(bytes)
    else if (bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte)
      graft.functions.Jpeg.decode(bytes)
    else None

  /** The stats row for one file's bytes — decode through [[decodeImage]],
    * degrade (never throw) to a decoded_ok=false row on anything the codec
    * rejects.
    */
  private[graft] def statsOf(img: Option[graft.functions.Png.Image])
      : (Boolean, Int, Int, Int, Long, String, Double) = img match {
    case Some(im) =>
      val n = im.width.toLong * im.height * im.channels
      var sum = 0L
      im.pixels.foreach(b => sum += (b & 0xff))
      // ONE pixel-hash canonical repo-wide (3-digit decimal per sample,
      // Multimodal.pixelCanonical): the same hash a closed-form SQL oracle
      // can regenerate via string_agg(lpad(...)), which is what lets
      // img_files_real gate THIS leg's output against DuckDB (r18)
      (true, im.width, im.height, im.channels, n,
        graft.operators.Multimodal.md5Hex(
          graft.operators.Multimodal.pixelCanonical(im.pixels)),
        graft.operators.RagSearch.round4(sum.toDouble / n))
    case None => (false, 0, 0, 0, 0L, "", 0.0)
  }

  /** Discover image files under `root` and return their decoded stats,
    * decode-once cached at `cachePath` (the PDF leg's exact protocol via
    * [[ExtractCache.through]]).
    */
  def readImageStats(spark: SparkSession, root: String,
                     excludedFolders: Seq[String] = Seq("node_modules", "dist", ".git"),
                     exts: Seq[String] = Seq("png"),
                     cachePath: Option[String] = None,
                     maxFileBytes: Long = DefaultMaxImageBytes): DataFrame = {
    TextCorpus.requireCleanExts(exts)
    val rootNorm = if (root.endsWith("/")) root else root + "/"
    // metadata-ONLY listing: decode paths open files task-side through the
    // byte_size gate (the binaryFile content column would hard-error the
    // job on any file >2 GB, where the gated open degrades it)
    def scan(): DataFrame = {
      val dirs = PrunedListing.includedDirs(spark, root, excludedFolders)
      spark.read.format("binaryFile")
        .option("pathGlobFilter", TextCorpus.extGlob(exts))
        .load(dirs: _*)
        .select(col("path").as("abs_path"), col("length").as("byte_size"))
        .withColumn("path", TextCorpus.relPathRaw(col("abs_path"), rootNorm))
    }
    cachePath match {
      case None => decodeFromPaths(
        scan().select(col("abs_path"), col("path"), col("byte_size")), maxFileBytes)
      case Some(cp) => ExtractCache.through(spark, cp,
        scan().select(col("abs_path"), col("path"), col("byte_size")),
        misses => decodeFromPaths(misses, maxFileBytes),
        StatsCols)
    }
  }

  /** (abs_path, path, byte_size) → stats rows, opening each file inside the
    * task — only cache MISSES pay an open+decode. Same bounded-read +
    * per-file degrade envelope as the PDF leg's extractFromPaths.
    */
  private def decodeFromPaths(paths: DataFrame, maxBytes: Long): DataFrame = {
    implicit val enc =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(StatsSchema)
    val confBc = paths.sparkSession.sparkContext.broadcast(
      new SerializableHadoopConf(paths.sparkSession.sparkContext.hadoopConfiguration))
    paths.mapPartitions { rows =>
      val conf = confBc.value.value
      rows.map { r =>
        val size = r.getLong(2)
        val img: Option[graft.functions.Png.Image] =
          if (size > maxBytes || size > Int.MaxValue.toLong - 8) None
          else try {
            val p = new org.apache.hadoop.fs.Path(r.getString(0))
            val fs = p.getFileSystem(conf)
            val in = fs.open(p)
            // cap+1: a file that GREW past the cap since the listing
            // truncates, fails the decode envelope, and lands as a degrade
            // row under its stale (path, byte_size) key — re-decoded next
            // round
            val bytes =
              try org.apache.commons.io.IOUtils.toByteArray(
                org.apache.commons.io.input.BoundedInputStream.builder()
                  .setInputStream(in).setMaxCount(maxBytes + 1).get())
              finally in.close()
            if (bytes.length > maxBytes) None else decodeImage(bytes)
          } catch { case _: java.io.IOException => None }
        val (ok, w, h, ch, n, hash, luma) = statsOf(img)
        Row(r.getString(1), size, ok, w, h, ch, n, hash, luma)
      }
    }
  }

  /** Stats over an in-memory (path, byte_size, content) frame — the
    * STREAMING leg's decode body (the file stream materializes content;
    * the batch leg keeps its own gated task-side open). Same degrade
    * envelope and stats arithmetic as [[readImageStats]], shared through
    * [[decodeImage]]/[[statsOf]] so batch ≡ stream by construction.
    */
  private[graft] def statsFromBytes(frame: DataFrame,
                                    maxFileBytes: Long = DefaultMaxImageBytes): DataFrame = {
    implicit val enc =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(StatsSchema)
    frame.select(col("path"), col("byte_size"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val size = r.getLong(1)
          val img =
            if (size > maxFileBytes) None
            else decodeImage(r.getAs[Array[Byte]](2))
          val (ok, w, h, ch, n, hash, luma) = statsOf(img)
          Row(r.getString(0), size, ok, w, h, ch, n, hash, luma)
        }
      }
  }

  /** The image leg in [[TextCorpus.read]]'s corpus shape — (path, content,
    * size, line_count) — so [[TextCorpus.asDocuments]] lands image files in
    * the documents table beside text and PDF docs. `content` is the
    * deterministic metadata line (the "extracted content" of an image
    * absent OCR): dimensions, channels, pixel hash, mean luma — so a
    * same-byte-size pixel edit still changes the content hash and the
    * incremental diff's hash arm sees it. Files the codec rejects are
    * dropped from the corpus (still CACHED as degrade rows), like empty
    * PDF extractions.
    */
  def readImagesAsText(spark: SparkSession, root: String,
                       excludedFolders: Seq[String] = Seq("node_modules", "dist", ".git"),
                       exts: Seq[String] = Seq("png"),
                       cachePath: Option[String] = None,
                       maxFileBytes: Long = DefaultMaxImageBytes): DataFrame =
    readImageStats(spark, root, excludedFolders, exts, cachePath, maxFileBytes)
      .filter(col("decoded_ok"))
      .select(col("path"),
        concat(lit("[image "), col("width"), lit("x"), col("height"),
          lit(" ch="), col("channels"),
          lit(" hash="), col("pixel_hash"),
          lit(" luma="), col("mean_luma"), lit("]")).as("content"),
        col("byte_size").as("size"),
        lit(1L).as("line_count"))
}
