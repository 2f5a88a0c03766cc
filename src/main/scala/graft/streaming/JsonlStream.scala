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
  * Stateless narrow transforms only, so no watermark or state store:
  * throughput is scan-bound, and every transform is the batch plan
  * fragment (equality with batch is by construction, and spec-asserted).
  * Declared difference: the batch leg's id-collision collapse is an
  * aggregate the stateless stream does not run — records sharing an id
  * WITHIN one file land as duplicate doc_id rows here (identity is
  * per-(file, id) on both legs, so cross-file id reuse is two distinct
  * documents either way); supply collision-free ids or dedup downstream
  * (B1).
  */
object JsonlStream {

  def documentsStream(spark: SparkSession, root: String,
                      textField: String = "text",
                      idField: Option[String] = None,
                      langField: Option[String] = None,
                      excludedFolders: Seq[String] = Seq("node_modules", "dist", ".git"),
                      exts: Seq[String] = Seq("jsonl")): DataFrame = {
    TextCorpus.requireCleanExts(exts)
    val lines = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", TextCorpus.extGlob(exts))
      .text(root)
      .select(input_file_name().as("abs_path"), col("value"))
    TextCorpus.asDocuments(JsonlCorpus.extract(
      lines, root, textField, idField, langField, excludedFolders))
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
