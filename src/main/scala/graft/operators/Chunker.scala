package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Chunking pipeline — the Spark re-expression of the reference's
  * `Indexer.splitChunks` + cold `build` (reference: src/indexer.ts:201-317).
  *
  * Scale notes: narrow transform (no shuffle) — each input split chunks
  * independently, the `posexplode` multiplies rows within the partition, and
  * parquet scan prunes to `(doc_id, text)` only. At 100 TB this runs at scan
  * speed on however many executors hold the input splits.
  */
object Chunker {

  /** A1: explode each document into overlapping chunks. */
  def chunkDocs(spark: SparkSession, sfDir: String,
                size: Int = 100, overlap: Int = 20): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        posexplode(Text.chunks(col("text"), size, overlap)).as(Seq("chunk_idx", "chunk_text")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"), col("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** A7: the cold-build index rows — chunks plus the per-file metadata the
    * reference carries on every `Doc` (fileSize, lineCount analog =
    * token_count since the synthetic docs are single-line).
    */
  def indexBuild(spark: SparkSession, sfDir: String,
                 size: Int = 100, overlap: Int = 20): DataFrame =
    indexBuildFrom(Tables.documents(spark, sfDir), size, overlap)
      .orderBy("doc_id", "chunk_idx")

  /** Same pipeline over an arbitrary docs frame — the incremental path
    * re-chunks only the changed/new subset.
    */
  def indexBuildFrom(docs: DataFrame, size: Int = 100, overlap: Int = 20): DataFrame = {
    docs
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size_of_tokens(col("text")).as("token_count"),
        posexplode(Text.chunks(col("text"), size, overlap)).as(Seq("chunk_idx", "chunk_text")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"), col("chunk_text"),
        col("n_chars").as("file_size"), col("token_count"), col("lang"))
  }

  private def size_of_tokens(text: org.apache.spark.sql.Column) =
    size(Text.tokens(text)).cast("long")

  /** A8: status/metadata aggregates over the built index (reference:
    * src/status.ts setIndexTotals — filesDiscovered / chunksTotal — here
    * per-lang for a useful analytic shape). Single hash aggregate with
    * map-side partials; low-cardinality group key.
    */
  def indexStatus(spark: SparkSession, sfDir: String,
                  size: Int = 100, overlap: Int = 20): DataFrame = {
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("files_discovered"),
        sum(Text.chunkCount(col("text"), size, overlap).cast("long")).as("chunks_total"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("lang")
  }
}
