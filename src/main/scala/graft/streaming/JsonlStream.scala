package graft.streaming

import graft.sources.{JsonlCorpus, TextCorpus}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming JSONL ingest — the arrival-time twin of
  * [[graft.sources.JsonlCorpus.read]]: records stream out of newly-arrived
  * `.jsonl` files (file source, exactly-once per file via the checkpoint)
  * through the SAME extraction stage the batch leg runs — JsonPath field
  * pulls, folder exclusion, synthetic `path#id` identity,
  * malformed/empty-line drops — then land in the documents schema.
  *
  * Narrow transforms plus ONE bounded stateful stage: the batch leg's
  * id-collision collapse is a global aggregate a stream can't run, so the
  * stream guards collisions with `dropDuplicatesWithinWatermark` on the
  * synthetic identity over an arrival-time watermark instead. Semantics,
  * declared precisely:
  *   - a collided id within one file (one micro-batch — the file source
  *     never splits a file across batches) emits exactly ONE row, like
  *     batch — but the survivor is the FIRST-arrived record, where batch
  *     keeps the largest (content, size). A divergent survivor reads as a
  *     content/size diff at the next batch reindex and reconciles there.
  *   - state is bounded by arrival rate × `dedupWatermark` (the watermark
  *     evicts seen ids), never corpus-proportional — the 100 TB constraint
  *     that rules out an unwatermarked dropDuplicates.
  *   - cross-file id reuse is two distinct documents on BOTH legs
  *     (identity is per-(file, id)), so eviction across files loses nothing.
  */
object JsonlStream {

  def documentsStream(spark: SparkSession, root: String,
                      textField: String = "text",
                      idField: Option[String] = None,
                      langField: Option[String] = None,
                      excludedFolders: Seq[String] = Seq("node_modules", "dist", ".git"),
                      exts: Seq[String] = Seq("jsonl"),
                      dedupWatermark: String = "10 minutes"): DataFrame = {
    TextCorpus.requireCleanExts(exts)
    val lines = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", TextCorpus.extGlob(exts))
      .text(root)
      .select(input_file_name().as("abs_path"), col("value"))
    val records = JsonlCorpus.extract(
      lines, root, textField, idField, langField, excludedFolders)
      // the collision guard (see object scaladoc): processing-time
      // watermark, because JSONL records carry no event time — arrival IS
      // the stream's time axis here
      .withColumn("arrival_ts", current_timestamp())
      .withWatermark("arrival_ts", dedupWatermark)
      .dropDuplicatesWithinWatermark("path")
      .drop("arrival_ts")
    TextCorpus.asDocuments(records)
  }

  /** Drain a finite JSONL tree into a parquet documents table; restartable
    * and pickup-incremental via the shared checkpointed drain.
    */
  def runToParquet(spark: SparkSession, root: String, outDir: String,
                   textField: String = "text",
                   idField: Option[String] = None,
                   langField: Option[String] = None): DataFrame =
    IndexStream.drainToParquet(
      documentsStream(spark, root, textField, idField, langField), outDir)
}
