package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-corpus source — the reference's actual input modality
  * (reference: src/indexer.ts:350-387 `discoverFiles`): walk a root
  * directory, keep files by extension whitelist, drop excluded folder
  * patterns and empty files, return (path, content, size, line_count).
  *
  * Spark-first: `spark.read.option("wholetext", true).text` with a
  * recursive lookup does the distributed read; the glob/exclusion logic is
  * plan-side filters on `input_file_name`, so discovery scales with the
  * file listing, not the driver. Extension whitelist is pushed into
  * `pathGlobFilter` (one read per extension, unioned) so excluded files are
  * never opened.
  */
object TextCorpus {

  def read(spark: SparkSession, root: String,
           allowedExt: Seq[String] = Seq("txt", "md"),
           excludedFolders: Seq[String] = Seq("node_modules", "dist", ".git")): DataFrame = {
    val perExt = allowedExt.map { ext =>
      spark.read
        .option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", s"*.$ext")
        .text(root)
        .select(input_file_name().as("abs_path"), col("value").as("content"))
    }
    val rootNorm = if (root.endsWith("/")) root else root + "/"
    val raw = perExt.reduce(_ unionAll _)
      // input_file_name yields a URI (file:///...); normalize the scheme's
      // slash count before stripping the root prefix
      .withColumn("path", regexp_replace(
        regexp_replace(col("abs_path"), "^file:/+", "/"),
        "^" + java.util.regex.Pattern.quote(rootNorm), ""))
    val excluded = excludedFolders.foldLeft(raw) { (df, folder) =>
      df.filter(!col("path").contains(s"$folder/"))
    }
    excluded
      .filter(length(col("content")) > 0)
      .select(col("path"), col("content"),
        length(col("content")).cast("long").as("size"),
        size(split(col("content"), "\r?\n")).cast("long").as("line_count"))
      .orderBy("path")
  }

  /** Adapt a file corpus to the `documents` schema so every graft operator
    * (chunking, dedup, embedding, search) runs on real directories unchanged.
    */
  def asDocuments(corpus: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    corpus.select(
      row_number().over(Window.orderBy(col("path"))).cast("long").minus(1).as("doc_id"),
      col("content").as("text"),
      lit("und").as("lang"),
      regexp_extract(col("path"), "^([^/]*)", 1).as("source"),
      col("size").as("n_chars"))
  }
}
