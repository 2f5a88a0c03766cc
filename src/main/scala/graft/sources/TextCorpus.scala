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
      // input_file_name yields a percent-encoded URI (file:///a%20b/...).
      // url_decode has form-encoding semantics ('+' → space), but in a URI
      // path a literal '+' is unencoded — protect it as %2B first so a file
      // named "a+b.md" keeps its name (and its path-derived doc_id).
      .withColumn("path", regexp_replace(
        regexp_replace(
          url_decode(regexp_replace(col("abs_path"), "\\+", "%2B")),
          "^file:/+", "/"),
        "^" + java.util.regex.Pattern.quote(rootNorm), ""))
    // exclusion by exact path segment (like the reference's folder patterns),
    // not substring — "redist/x" must survive excludedFolders = ["dist"]
    val segs = split(col("path"), "/")
    val excluded = excludedFolders.foldLeft(raw) { (df, folder) =>
      df.filter(!array_contains(segs, folder))
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
    * doc_id is a 64-bit hash of the path — deterministic and fully
    * distributed (a global row_number window would funnel every file's
    * content through one task); collision odds are ~n²/2⁶⁵.
    */
  def asDocuments(corpus: DataFrame): DataFrame = {
    corpus.select(
      abs(xxhash64(col("path"))).as("doc_id"),
      col("content").as("text"),
      lit("und").as("lang"),
      regexp_extract(col("path"), "^([^/]*)", 1).as("source"),
      col("size").as("n_chars"))
  }
}
