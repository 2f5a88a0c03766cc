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

  /** A1b: boundary-aware chunking — the reference's planned "semantic
    * chunking" extension (reference: README.md:32; its current splitChunks
    * cuts mid-word at fixed character offsets, reference: src/indexer.ts:
    * 201-215). Text splits into atomic units on a delimiter (words here —
    * the synthetic corpus has no sentence punctuation; pass a sentence
    * delimiter like ". " for prose and every invariant below holds at the
    * sentence level), and no chunk ever splits a unit.
    *
    * Assignment rule: unit u belongs to chunk `floor(cum_chars_before_u /
    * target)` — a greedy left-to-right pack where a chunk closes once its
    * units have consumed its `target`-char budget (the unit crossing the
    * boundary overflows into its chunk, so a chunk's length is < target +
    * its last unit's length). Window-cumsum over (doc, position): fully
    * distributed — partitioned by doc_id, no global pass, SQL-replicable
    * (= oracle-checkable, unlike an iterative repacking loop).
    */
  def chunkDocsSemantic(spark: SparkSession, sfDir: String,
                        target: Int = 200, delim: String = " "): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val units = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        posexplode(split(col("text"), java.util.regex.Pattern.quote(delim))))
      .toDF("doc_id", "pos", "unit")
      .filter(length(col("unit")) > 0)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val assigned = units
      .withColumn("cum_before",
        coalesce(sum(length(col("unit")) + lit(delim.length)).over(w), lit(0L)))
      .withColumn("chunk_idx",
        floor(col("cum_before") / lit(target.toDouble)).cast("long"))
    assigned
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("unit")))),
          s => s.getField("unit")), delim).as("chunk_text"),
        count(lit(1)).as("n_units"))
      .withColumn("chunk_chars", length(col("chunk_text")).cast("long"))
      // renumber densely: a unit longer than ~2×target makes the raw
      // floor(cum/target) bucket skip values, and chunk indices must stay
      // contiguous per doc (one row per bucket, so row_number = dense rank)
      .withColumn("chunk_idx",
        (row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("chunk_idx"))) - 1)
          .cast("long"))
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
    *
    * `file_size` = the doc's change-detection size ([[Tables.changeKey]] —
    * the shared definition with `Graft.incrementalUpdate`'s diff): real
    * file bytes on directory corpora, `n_chars` on the synthetic tables.
    */
  def indexBuildFrom(docs: DataFrame, size: Int = 100, overlap: Int = 20): DataFrame = {
    docs
      .select(col("doc_id"), col("lang"), Tables.changeKey(docs).as("file_size"),
        size_of_tokens(col("text")).as("token_count"),
        posexplode(Text.chunks(col("text"), size, overlap)).as(Seq("chunk_idx", "chunk_text")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"), col("chunk_text"),
        col("file_size"), col("token_count"), col("lang"))
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
