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

  /** documents files → (doc_id, is_pdf, n_pages, text) streaming frame. */
  def pdfRoundTripStream(spark: SparkSession, sfDir: String,
                         glob: String = "documents.parquet"): DataFrame = {
    val docs = spark.readStream
      .schema(IndexStream.docsSchema)
      .option("pathGlobFilter", glob)
      .parquet(sfDir)
    val sanitized = docs.select(col("doc_id"),
      Multimodal.asciiSanitize(col("text")).as("text"))
    Multimodal.pdfExtract(Multimodal.pdfEncode(sanitized))
  }

  /** Drain the finite input into a parquet sink; exactly-once per file via
    * the checkpoint (re-running against the same outDir reprocesses
    * nothing). Returns the decoded frame.
    */
  def runToParquet(spark: SparkSession, sfDir: String, outDir: String,
                   glob: String = "documents.parquet"): DataFrame =
    IndexStream.drainToParquet(pdfRoundTripStream(spark, sfDir, glob), outDir)
}
