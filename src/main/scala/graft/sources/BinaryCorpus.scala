package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binary-file corpus source — the media-ingest twin of TextCorpus: read a
  * directory of opaque files (images/audio/PDF stand-ins) via Spark's
  * `binaryFile` format into the engine's multimodal shape
  * (doc_id, content: binary, mime stub, byte_size, mtime).
  *
  * Scale shape: `binaryFile` is a plain FileScan — listing parallelizes,
  * `pathGlobFilter` prunes before any file opens, and
  * `spark.sql.files.maxPartitionBytes` packs small files per task. The
  * decode stays downstream (Multimodal.decodeFeatures / frameSample), so
  * this source never inflates bytes it doesn't need to.
  */
object BinaryCorpus {

  /** Extension → mime stub (sniffing is the decoder's job; the source only
    * records the claim).
    */
  val MimeByExt: Map[String, String] = Map(
    "png" -> "image/png", "jpg" -> "image/jpeg", "wav" -> "audio/wav",
    "mp4" -> "video/mp4", "pdf" -> "application/pdf")

  def read(spark: SparkSession, root: String, glob: String = "*"): DataFrame = {
    val raw = spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(root)
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    val mime = MimeByExt.foldLeft(lit("application/octet-stream")) {
      case (acc, (e, m)) => when(ext === e, lit(m)).otherwise(acc)
    }
    raw.select(
      abs(xxhash64(col("path"))).as("doc_id"),
      col("path"),
      col("content"),
      mime.as("mime"),
      col("length").as("byte_size"),
      col("modificationTime").as("mtime"))
  }
}
