package graft.streaming

import graft.operators.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming multimodal decode — the A9b round-trip pipeline (sanitize →
  * build a real FlateDecode PDF per document → recover the text with the
  * real parser) run as a Structured Streaming job over arriving corpus
  * files. The reference decodes PDFs one file at a time as the watcher
  * sees them (src/pdf-extractor.ts + src/index.ts watch mode); this is
  * that loop as a restartable exactly-once stream.
  *
  * Stateless narrow transforms only (both encode and decode are
  * mapPartitions; no watermark or state store): the SAME Multimodal
  * operators the batch query uses run unchanged on the streaming frame, so
  * batch ≡ stream by construction — the spec asserts it by diff. At scale
  * the source is the ingest bus carrying opaque binary columns and the
  * sink the decoded-text table; throughput is decode-bound and scales with
  * executors, never with driver state.
  */
object MediaStream {

  /** Arrival-time media-header metadata (r11): [[Multimodal.mediaMeta]]'s
    * REAL header parse (PNG/JPEG/GIF/WAV) over a binaryFile file stream —
    * new media files landing in `root` emit their (format, dims, signal)
    * row exactly once. Identity matches [[graft.sources.BinaryCorpus]]'s
    * (abs xxhash64 of the path), so the stream is row-comparable to the
    * batch ingest; stateless narrow transform like every decode here.
    */
  def mediaMetaStream(spark: SparkSession, root: String,
                      glob: String = "*"): DataFrame = {
    import org.apache.spark.sql.types._
    val binarySchema = StructType(Seq(
      StructField("path", StringType), StructField("modificationTime", TimestampType),
      StructField("length", LongType), StructField("content", BinaryType)))
    val src = spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(abs(xxhash64(col("path"))).as("doc_id"), col("content"))
    Multimodal.mediaMeta(src)
  }

  /** Drain [[mediaMetaStream]] over a finite directory into a memory sink;
    * exactly-once per file via the checkpoint. Returns the completed frame.
    */
  def runMediaMetaToCompletion(spark: SparkSession, root: String,
                               queryName: String = "media_meta_stream",
                               checkpointDir: String): DataFrame = {
    val q = mediaMetaStream(spark, root)
      .writeStream.outputMode("append").format("memory").queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  /** documents files → (doc_id, is_pdf, n_pages, text) streaming frame. */
  def pdfRoundTripStream(spark: SparkSession, sfDir: String,
                         glob: String = "documents.parquet"): DataFrame = {
    val docs = spark.readStream
      .schema(IndexStream.docsSchema)
      .option("pathGlobFilter", glob)
      .parquet(sfDir)
    val sanitized = docs.select(col("doc_id"),
      Multimodal.asciiSanitize(col("text")).as("text"))
    // same batch password as the batch twin — the rotation's protected
    // forms (r12) must decode identically or streaming≡batch breaks
    Multimodal.pdfExtract(Multimodal.pdfEncode(sanitized), Multimodal.PdfPassword)
  }

  /** Drain the finite input into a parquet sink; exactly-once per file via
    * the checkpoint (re-running against the same outDir reprocesses
    * nothing). Returns the decoded frame.
    */
  def runToParquet(spark: SparkSession, sfDir: String, outDir: String,
                   glob: String = "documents.parquet"): DataFrame =
    IndexStream.drainToParquet(pdfRoundTripStream(spark, sfDir, glob), outDir)

  /** The IMAGE leg of watch mode (r16 — completing multimodal symmetry:
    * the PDF leg has pdfRoundTripStream, this is the arriving-.png/.jpg
    * twin of [[graft.sources.ImageCorpus.readImageStats]]): new image
    * files landing under `root` decode ONCE through the same codec
    * dispatch and stats arithmetic as the batch leg
    * ([[graft.sources.ImageCorpus.statsFromBytes]] — shared body, so
    * batch ≡ stream by construction) and emit their stats row exactly
    * once (file-stream checkpoint). Paths are root-relative, the batch
    * frame's join key. Stateless narrow transform: no watermark, no
    * state store; throughput is decode-bound.
    */
  def imageStatsStream(spark: SparkSession, root: String,
                       glob: String = "*.{png,jpg,jpeg}"): DataFrame = {
    import org.apache.spark.sql.types._
    val binarySchema = StructType(Seq(
      StructField("path", StringType), StructField("modificationTime", TimestampType),
      StructField("length", LongType), StructField("content", BinaryType)))
    val rootNorm = if (root.endsWith("/")) root else root + "/"
    val src = spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(graft.sources.TextCorpus.relPathRaw(col("path"), rootNorm).as("path"),
        col("length").as("byte_size"), col("content"))
    graft.sources.ImageCorpus.statsFromBytes(src)
  }

  /** Drain [[imageStatsStream]] over a finite directory into a parquet
    * sink (memory sinks cannot recover a checkpoint, and recovery is the
    * point: re-draining with the same `outDir` reprocesses NOTHING —
    * exactly-once per arrival across watch-mode ticks). Returns the
    * accumulated frame.
    */
  def runImageStatsToCompletion(spark: SparkSession, root: String,
                                outDir: String): DataFrame =
    IndexStream.drainToParquet(imageStatsStream(spark, root), outDir)
}
