package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSONL (one JSON document per line) corpus source — the interchange
  * format large-scale training pipelines actually exchange, alongside the
  * reference's directory-of-files modality (reference: src/indexer.ts:
  * 350-387 discovers files; this leg discovers records WITHIN files).
  * Output is [[TextCorpus.read]]'s corpus shape (path, content, size,
  * line_count [, lang]), so [[TextCorpus.asDocuments]] and every operator
  * downstream are source-agnostic.
  *
  * Spark-first scale shape:
  *   - ONE tree listing (brace glob), ONE distributed line read
  *     (`spark.read.text`) — never `spark.read.json`, whose schema
  *     inference is a second full pass over the corpus;
  *   - field extraction is `get_json_object` (codegen'd JsonPath on the
  *     raw line) — only the requested fields are parsed, a malformed line
  *     yields null and drops like an empty file, never an error;
  *   - the only shuffle is the id-collision guard (see below), paid once
  *     at ingest (every downstream operator then reads the landed table).
  *
  * Identity: each record's synthetic `path` is `<file path>#<key>` with
  * '%'/'#' percent-escaped in both components (so the mapping is injective
  * even for '#'-bearing filenames or ids), making `asDocuments`'s
  * `doc_id = xxhash64(path)` stable per (FILE, key) —
  * file-scoped, not corpus-global. With `idField`, the key is the
  * record's own id: stable across rescans and line reorderings WITHIN its
  * file, so an edited record surfaces as CHANGED in the incremental diff
  * — but a record moved between shard files changes doc_id (remove+add),
  * and the same id in two different files is two distinct documents on
  * both legs (use corpus-unique ids, or dedup downstream on content —
  * B1 — if shards can overlap). Without `idField`, the key is a hash of
  * the raw line (content-addressed): an edit looks like remove+add, and
  * byte-identical duplicate lines in one file collapse to one document —
  * all declared, and the reason to supply `idField` when the corpus has
  * one. Records sharing an id within a file collapse deterministically
  * (max by (content, size)) rather than emitting duplicate doc_ids that
  * would corrupt every downstream join.
  *
  * The change-detection `size` is the raw line's char length — the same
  * size-heuristic family as the other legs (a same-length edit is
  * invisible to the diff; the reference's watch loop shares exactly this
  * blindness, src/indexer.ts).
  */
object JsonlCorpus {

  private val FieldRe = "[A-Za-z0-9_]+"

  def read(spark: SparkSession, root: String,
           textField: String = "text",
           idField: Option[String] = None,
           langField: Option[String] = None,
           excludedFolders: Seq[String] = Seq("node_modules", "dist", ".git"),
           exts: Seq[String] = Seq("jsonl")): DataFrame = {
    TextCorpus.requireCleanExts(exts)
    // batch discovery prunes excluded folders at LISTING time (the subtree
    // is never descended); extract()'s segment filter stays as the shared
    // guard the streaming twin — which cannot enumerate load paths — relies
    // on, and is a no-op here
    val dirs = PrunedListing.includedDirs(spark, root, excludedFolders)
    val raw = spark.read
      .option("pathGlobFilter", TextCorpus.extGlob(exts))
      .text(dirs: _*)
      .select(input_file_name().as("abs_path"), col("value"))
    collapse(extract(raw, root, textField, idField, langField, excludedFolders))
  }

  /** The stateless record-extraction stage — shared verbatim by the batch
    * [[read]] and the streaming twin ([[graft.streaming.JsonlStream]]),
    * which is what makes them equal by construction: JsonPath field pulls,
    * folder exclusion, the synthetic `path#id` identity, and the
    * malformed/empty-line drops are all narrow codegen'd transforms.
    * Input: (abs_path, value) lines. Output: one corpus-shaped record per
    * surviving line (pre-collapse — duplicate paths possible).
    */
  private[graft] def extract(lines: DataFrame, root: String, textField: String,
                             idField: Option[String], langField: Option[String],
                             excludedFolders: Seq[String]): DataFrame = {
    // field names are interpolated into JsonPath expressions; restrict to
    // identifier chars so a quote/bracket/dot cannot corrupt the path
    require((textField +: (idField.toSeq ++ langField.toSeq)).forall(_.matches(FieldRe)),
      s"JSON field names must match $FieldRe")
    def jf(field: String) = get_json_object(col("value"), s"$$.$field")
    val rootNorm = if (root.endsWith("/")) root else root + "/"
    val withPath = lines
      .withColumn("file_path", TextCorpus.relPathEncoded(col("abs_path"), rootNorm))
    val segs = split(col("file_path"), "/")
    val included = excludedFolders.foldLeft(withPath) { (df, folder) =>
      df.filter(!array_contains(segs, folder))
    }
    val key = idField.map(jf)
      .getOrElse(xxhash64(col("value")).cast("string"))
    val lang = langField
      .map(f => coalesce(jf(f), lit("und"))).getOrElse(lit("und"))
    // '#' is legal in BOTH filenames and id values, so a raw concat is not
    // injective — file "a.jsonl#b.jsonl" + id "x" and file "a.jsonl" + id
    // "b.jsonl#x" would share one path (and one doc_id: silent merge).
    // Percent-escape '%' then '#' in each component; the separator is then
    // unambiguous and (file, id) → path is injective.
    def esc(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(c, "%", "%25"), "#", "%23")
    included
      .select(
        concat(esc(col("file_path")), lit("#"), esc(key)).as("path"),
        jf(textField).as("content"),
        length(col("value")).cast("long").as("size"),
        lang.as("lang"),
        // source = the FILE path's first segment, computed here because the
        // synthetic record path would leak "#<id>" into it for a root-level
        // file (one bogus source per record; asDocuments passes this through)
        regexp_extract(col("file_path"), "^([^/]*)", 1).as("source"))
      // malformed line / missing text / empty text / null id all drop —
      // the JSONL analog of TextCorpus dropping empty files
      .filter(col("content").isNotNull && length(col("content")) > 0 &&
        col("path").isNotNull)
      .withColumn("line_count", size(split(col("content"), "\r?\n")).cast("long"))
  }

  /** The batch-side id-collision guard: deterministic per-path collapse
    * (max by (content, size)). One hash aggregate (map-side combined); for
    * the common collision-free corpus every group is a single row. The
    * streaming twin guards the same collisions with a watermark-scoped
    * `dropDuplicatesWithinWatermark` instead (a stream can't run a global
    * aggregate) — one row per (file, id) on both legs, with a declared
    * survivor difference: first-arrival there, largest payload here (see
    * streaming.JsonlStream's scaladoc for the reconciliation contract).
    */
  private def collapse(records: DataFrame): DataFrame =
    collapseLargest(records, "path",
      Seq("content", "size", "line_count", "lang", "source"))

  /** ONE definition of the deterministic duplicate-key collapse (max by the
    * payload columns IN ORDER — the first column is the primary tie-break):
    * shared by the JSONL leg (key = synthetic path) and the frame leg
    * (`Graft.frameAsDocuments`, key = doc_id), so the two collision guards
    * cannot drift. One map-side-combined hash aggregate; collision-free
    * corpora see single-row groups.
    */
  private[graft] def collapseLargest(df: DataFrame, key: String,
                                     payload: Seq[String]): DataFrame =
    df.groupBy(col(key))
      .agg(max(struct(payload.map(col): _*)).as("r"))
      .select(col(key) +: payload.map(c => col(s"r.$c").as(c)): _*)
}
