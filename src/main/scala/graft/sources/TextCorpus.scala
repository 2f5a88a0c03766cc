package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-corpus source — the reference's actual input modality
  * (reference: src/indexer.ts:350-387 `discoverFiles`): walk a root
  * directory, keep files by extension whitelist, drop excluded folder
  * patterns and empty files, return (path, content, size, line_count).
  *
  * Spark-first: `spark.read.option("wholetext", true).text` over the
  * exclusion-PRUNED directory list ([[PrunedListing]] — excluded subtrees
  * are never listed, matching the reference's walk which skips them at
  * descent) does the distributed read. Extension whitelist is pushed into a
  * single brace-glob `pathGlobFilter` (`*.{txt,md}`) so excluded files are
  * never opened and each included directory is listed exactly once.
  */
object TextCorpus {

  /** Extension-list policy shared by EVERY file leg (text, PDF, JSONL batch
    * AND streaming) — validation and brace-glob rendering must be ONE
    * definition or the legs drift. Extensions are interpolated into a
    * Hadoop brace glob; a ',' '{' '*' or whitespace inside one would
    * silently corrupt the filter for every extension in the list, so
    * anything non-alphanumeric is rejected up front.
    */
  private[graft] def requireCleanExts(exts: Seq[String]): Unit =
    require(exts.nonEmpty && exts.forall(_.matches("[A-Za-z0-9_]+")),
      s"extensions must be alphanumeric ([A-Za-z0-9_]+), got: ${exts.mkString(", ")}")

  /** ONE tree listing for all extensions via brace alternation — a
    * per-extension read unioned N ways repeats the (driver-side, at 100 TB
    * object-store-RPC) file listing N times for the same tree.
    */
  private[graft] def extGlob(exts: Seq[String]): String =
    s"*.{${exts.mkString(",")}}"

  /** Root-relative path from a PERCENT-ENCODED file URI — what
    * `input_file_name()` yields (file:///a%20b/...). url_decode has
    * form-encoding semantics ('+' → space), but in a URI path a literal '+'
    * is unencoded — protect it as %2B first so a file named "a+b.md" keeps
    * its name (and its path-derived doc_id). ONLY for `input_file_name()`
    * sources: binaryFile's `path` column is Hadoop's unescaped
    * FileStatus.getPath.toString, which [[relPathRaw]] handles — decoding
    * it would throw on a literal '%' in a filename and silently rename
    * names that happen to look like valid escapes.
    */
  private[sources] def relPathEncoded(uri: org.apache.spark.sql.Column, rootNorm: String)
      : org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        url_decode(regexp_replace(uri, "\\+", "%2B")),
        "^file:/+", "/"),
      "^" + java.util.regex.Pattern.quote(rootNorm), "")

  /** Root-relative path from an UNESCAPED path string (binaryFile's `path`
    * column): strip the scheme and the root prefix, decode nothing.
    */
  private[graft] def relPathRaw(p: org.apache.spark.sql.Column, rootNorm: String)
      : org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(p, "^file:/+", "/"),
      "^" + java.util.regex.Pattern.quote(rootNorm), "")

  def read(spark: SparkSession, root: String,
           allowedExt: Seq[String] = Seq("txt", "md"),
           excludedFolders: Seq[String] = Seq("node_modules", "dist", ".git")): DataFrame = {
    requireCleanExts(allowedExt)
    // folder exclusion is enforced at LISTING time (PrunedListing: excluded
    // subtrees are never descended, by exact segment name — "redist/x"
    // survives excludedFolders = ["dist"]), so no plan-side segment filter
    // is needed and the listing cost is proportional to the included tree
    val dirs = PrunedListing.includedDirs(spark, root, excludedFolders)
    val raw0 = spark.read
      .option("wholetext", "true")
      .option("pathGlobFilter", extGlob(allowedExt))
      .text(dirs: _*)
      .select(input_file_name().as("abs_path"), col("value").as("content"))
    val rootNorm = if (root.endsWith("/")) root else root + "/"
    val raw = raw0
      .withColumn("path", relPathEncoded(col("abs_path"), rootNorm))
    raw
      .filter(length(col("content")) > 0)
      .select(col("path"), col("content"),
        length(col("content")).cast("long").as("size"),
        size(split(col("content"), "\r?\n")).cast("long").as("line_count"))
      .orderBy("path")
  }

  /** The corpus's PDF leg (reference: src/indexer.ts:172 — whitelisted
    * `.pdf` files get their text extracted by the pdf-extractor during
    * indexing, then flow through the same chunk pipeline as text files;
    * README.md:257 puts `pdf` in the default extension list). Output shape
    * is IDENTICAL to [[read]] — (path, content, size, line_count) with
    * `content` the EXTRACTED text but `size` the FILE's byte size (the
    * reference's change-detection key: a PDF edit that keeps extracted-text
    * length still flips the byte size, so the incremental diff sees it;
    * [[asDocuments]] routes it to the diff-only `byte_size` column and
    * derives char-semantic `n_chars` from the content itself) — so
    * downstream operators are source-agnostic, and `doc_id = xxhash64(rel
    * path)` stays consistent across both legs.
    *
    * `cachePath` is the reference's pdf-text-cache.json analog (reference:
    * src/pdf-extractor.ts — extract once, key by (path, size)): a parquet
    * table (path, byte_size, text). With a cache, discovery does a
    * METADATA-ONLY `binaryFile` scan (content column pruned — no PDF is
    * opened), joins it against the cache on (path, byte_size), opens and
    * extracts ONLY the misses partition-locally, then rewrites the cache
    * (current files only, staged swap) and serves the returned frame FROM
    * the cache — so repeated downstream actions re-read cheap parquet
    * instead of re-inflating PDFs, and a no-change reindex never opens a
    * single PDF. Empty extractions are cached too (a broken PDF is not
    * re-parsed every round) but filtered from the returned corpus like
    * empty text files.
    *
    * Scale shape: listing distributes, glob prunes before any open, the
    * extractor never sees the driver; the cache join is path-keyed.
    */
  def readPdfAsText(spark: SparkSession, root: String,
                    excludedFolders: Seq[String] = Seq("node_modules", "dist", ".git"),
                    exts: Seq[String] = Seq("pdf"),
                    cachePath: Option[String] = None,
                    maxFileBytes: Long = DefaultMaxPdfBytes): DataFrame = {
    requireCleanExts(exts)
    val rootNorm = if (root.endsWith("/")) root else root + "/"
    // metadata-ONLY listing (content pruned at the scan): every extraction
    // path opens files task-side through the byte_size gate — the
    // binaryFile content column would hard-error the job on any file >2 GB
    def scan(): DataFrame = {
      // exclusion pruned at listing (PrunedListing) — excluded subtrees are
      // never even listed, let alone opened
      val dirs = PrunedListing.includedDirs(spark, root, excludedFolders)
      spark.read.format("binaryFile")
        .option("pathGlobFilter", extGlob(exts))
        .load(dirs: _*)
        .select(col("path").as("abs_path"), col("length").as("byte_size"))
        .withColumn("path", relPathRaw(col("abs_path"), rootNorm))
    }
    val extracted: DataFrame = cachePath match {
      case None =>
        // same metadata-only listing + gated task-side open as the cache-miss
        // path (ONE extraction code path): the `binaryFile` content column
        // would hard-error the whole job on any file >2 GB, where the gated
        // open degrades an oversized file to empty text like a broken PDF
        extractFromPaths(scan()
          .select(col("abs_path"), col("path"), col("byte_size")), maxFileBytes)
      // the shared decode-once protocol ([[ExtractCache.through]]): the
      // metadata-only listing joins the cache on (path, byte_size), only
      // misses open files, the merged cache swaps in staged, a no-change
      // round rewrites nothing, and the frame serves FROM the cache
      case Some(cp) => ExtractCache.through(spark, cp,
        scan().select(col("abs_path"), col("path"), col("byte_size")),
        misses => extractFromPaths(misses, maxFileBytes),
        Seq("text"))
    }
    extracted
      .filter(length(col("text")) > 0)
      .select(col("path"), col("text").as("content"),
        col("byte_size").as("size"),
        size(split(col("text"), "\r?\n")).cast("long").as("line_count"))
  }

  /** Extraction size cap: a PDF whose file size exceeds this is never opened
    * — it degrades to empty text (and is CACHED as empty, like a broken PDF)
    * instead of being slurped into executor memory. The raw-byte read is the
    * one place PdfText's degrade-never-throw envelope didn't cover: a single
    * multi-GB (or hostile) file would OOM the task (or overflow the
    * byte-array int limit) and fail the whole discovery job.
    */
  val DefaultMaxPdfBytes: Long = 256L << 20

  /** (abs_path, path, byte_size) → (path, byte_size, text), opening each
    * file inside the task — only cache MISSES pay an open+inflate+parse.
    * The SESSION's Hadoop conf rides a broadcast into the tasks: a fresh
    * executor-side `new Configuration()` would see only classpath defaults,
    * silently dropping spark.hadoop.* credentials/endpoints (object-store
    * corpora would list fine driver-side, then fail every open).
    *
    * Per-file degrade envelope: oversized files (listing byte_size >
    * `maxBytes`) are skipped unopened; an open/read failure on ONE file
    * (vanished since listing, permission, truncation) yields empty text for
    * that file instead of failing the job — the same never-throws contract
    * PdfText gives the parse side.
    */
  private def extractFromPaths(paths: DataFrame, maxBytes: Long): DataFrame = {
    import graft.functions.PdfText
    implicit val enc = pdfTextEncoder
    val confBc = paths.sparkSession.sparkContext.broadcast(
      new SerializableHadoopConf(paths.sparkSession.sparkContext.hadoopConfiguration))
    paths.mapPartitions { rows =>
      val conf = confBc.value.value
      rows.map { r =>
        val size = r.getLong(2)
        val text =
          if (size > maxBytes || size > Int.MaxValue.toLong - 8) ""
          else try {
            val p = new org.apache.hadoop.fs.Path(r.getString(0))
            val fs = p.getFileSystem(conf)
            val in = fs.open(p)
            // bounded read: cap+1 so a file that GREW past the cap since the
            // listing still can't blow the task — it truncates, fails the
            // parse envelope, and lands as empty text under its stale
            // (path, byte_size) key, re-extracted on the next round
            val bytes =
              try org.apache.commons.io.IOUtils.toByteArray(
                org.apache.commons.io.input.BoundedInputStream.builder()
                  .setInputStream(in).setMaxCount(maxBytes + 1).get())
              finally in.close()
            if (bytes.length > maxBytes) ""
            else PdfText.extract(bytes).map(_.text).getOrElse("")
          } catch { case _: java.io.IOException => "" }
        org.apache.spark.sql.Row(r.getString(1), size, text)
      }
    }
  }

  private def pdfTextEncoder
      : org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.types._
    org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("byte_size", LongType, nullable = false),
      StructField("text", StringType, nullable = false))))
  }

  /** Normalize the reference's `dir` argument (reference: src/index.ts:
    * 331-341): a solitary "." or "./" means the root; a leading "./" is
    * dropped; leading slashes are trimmed; dot-prefixed REAL names (".git")
    * are kept verbatim so hidden folders stay listable.
    */
  def normalizeDir(dir: String): String =
    if (dir == "." || dir == "./") ""
    else if (dir.startsWith("./")) dir.substring(2)
    else dir.replaceFirst("^[/\\\\]+", "")

  /** Strip a `file:` scheme so java.nio path math accepts the roots that
    * `read()`'s Hadoop listing accepts — the two entry points must agree on
    * what a valid root is. Non-file schemes (hdfs:, s3a:) have no local Path
    * form and are rejected by the exists() check downstream as before.
    */
  private def localAbs(p: String): java.nio.file.Path =
    java.nio.file.Paths.get(p.replaceFirst("^file:/+", "/")).toAbsolutePath.normalize()

  /** The reference's traversal guard (reference: src/indexer.ts:329-338
    * `ensureWithinRoot`): resolve `rel` against `root` and reject any result
    * that escapes it (`../`, absolute tricks). Component-wise prefix check —
    * "/a/bad" does not pass for root "/a/b". Returns the resolved absolute
    * path; throws IllegalArgumentException on escape, like the reference's
    * InvalidRequest error. Accepts `file:`-scheme roots like `read()` does.
    */
  def ensureWithinRoot(root: String, rel: String): String =
    ensureWithinRootRel(root, rel)._1

  /** [[ensureWithinRoot]] plus the normalized ROOT-RELATIVE spelling of the
    * resolved path — the form the PDF extraction cache keys on, so lookups
    * agree with discovery for any caller spelling ("./a/../a/x.pdf").
    * Lexical containment only, matching the reference exactly (its
    * path.resolve guard does not resolve symlinks either — a symlink
    * INSIDE the tree pointing outside it is followed by both engines;
    * declared shared blindness, not a divergence).
    */
  def ensureWithinRootRel(root: String, rel: String): (String, String) = {
    val rootAbs = localAbs(root)
    val abs = rootAbs.resolve(rel).normalize()
    require(abs.startsWith(rootAbs), s"Path outside ROOT: $rel")
    (abs.toString, rootAbs.relativize(abs).toString)
  }

  /** Real-directory `list_files` (reference: src/index.ts:316-413): walk a
    * directory under a root, return `(path, entry_type, size_bytes,
    * n_entries)` with the reference's contract — dirs-first alphabetical
    * ordering, entry limit (clamped to [1, 5000], reference src/index.ts:66,
    * :326), `dir` relative to root (guarded by [[ensureWithinRoot]]; paths
    * in the output stay ROOT-relative and depth counts from `dir`, like the
    * reference's walk), `recursive`/`maxDepth` traversal bounds,
    * `includeExtensions` whitelist (which suppresses directory entries,
    * reference src/index.ts:376-378).
    *
    * Spark-first: the listing is a `binaryFile`-format scan pruned to
    * `(path, length)` — file metadata only, no content bytes are read —
    * so it distributes with the file listing instead of walking driver-side.
    * Directory entries are derived as the distinct proper prefixes of file
    * paths; a directory with no files anywhere beneath it is therefore
    * invisible (metadata-derived listing — a declared difference from the
    * reference's readdir walk). Second declared difference: Spark's file
    * index skips names starting with '_' or '.' (its own metadata-file
    * convention), so hidden/underscore entries the reference would list do
    * not appear — acceptable for a corpus listing, where those are
    * build/VCS artifacts; use a driver-side walk if they ever matter.
    * An entry with `s` path separators is visible iff `s == 0`, or
    * recursion is on and `s <= maxDepth` — the reference's depth rule
    * (src/index.ts:380-385).
    */
  def listFiles(spark: SparkSession, root: String, dir: String = ".",
                recursive: Boolean = false, maxDepth: Int = Int.MaxValue,
                includeExtensions: Seq[String] = Nil,
                limit: Int = 500): DataFrame = {
    val nd = normalizeDir(dir)
    val baseAbs = ensureWithinRoot(root, nd)
    // existence + is-a-directory validation, like the reference's stat
    // (src/index.ts:343-350) — a driver-side metadata call, no data read
    val basePath = new org.apache.hadoop.fs.Path(baseAbs)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(basePath), s"Directory does not exist: $dir")
    require(fs.getFileStatus(basePath).isDirectory, s"Path is not a directory: $dir")
    val cap = math.min(5000, math.max(1, limit))
    val baseNorm = if (baseAbs.endsWith("/")) baseAbs else baseAbs + "/"
    val exts = includeExtensions.map(_.toLowerCase.stripPrefix("."))
    // root-relative prefix re-attached to every output path (the reference
    // lists relative to ROOT even when walking a subdir, src/index.ts:373).
    // Derived from the RESOLVED path, not the raw dir string: "docs/" must
    // not emit "docs//x" and "a/../a" must emit "a/x" — the reference's
    // path.relative(ROOT, ...) normalization, and what joins against
    // TextCorpus.read paths require.
    val relNorm = localAbs(root).relativize(java.nio.file.Paths.get(baseAbs)).toString
    val prefix = if (relNorm.isEmpty) "" else relNorm + "/"
    val files = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(baseAbs)
      .select(relPathRaw(col("path"), baseNorm).as("path"),
        col("length").as("size_bytes"))
    val segs = split(col("path"), "/")
    val depth = (size(segs) - 1).as("depth") // separators in the rel path
    val fileEntries = files
      .select(col("path"), lit("file").as("entry_type"), col("size_bytes"),
        lit(null).cast("long").as("n_entries"), depth,
        lower(regexp_extract(col("path"), "\\.([^./]+)$", 1)).as("ext"))
    val extFiltered =
      if (exts.isEmpty) fileEntries else fileEntries.filter(col("ext").isin(exts: _*))
    // every proper prefix of a (pre-extension-filter) file path is a dir the
    // reference's walk would have listed; n_entries counts direct children
    // guard: sequence(1, 0) counts DOWN in Spark, so a depth-0 file would
    // fabricate "" and itself as dirs — only files under a subdir have
    // prefix dirs at all
    val dirEntries = files
      .filter(size(segs) > 1)
      .select(explode(transform(sequence(lit(1), size(segs) - 1),
        i => array_join(slice(segs, lit(1), i), "/"))).as("path"))
      .distinct()
      .select(col("path"), lit("dir").as("entry_type"),
        lit(null).cast("long").as("size_bytes"),
        (size(split(col("path"), "/")) - 1).as("depth"))
    // n_entries = direct children (subdirs + files) of each dir
    val children = files.select(col("path")).unionAll(dirEntries.select(col("path")))
      .filter(col("path").contains("/"))
      .select(regexp_replace(col("path"), "/[^/]*$", "").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_entries"))
    val dirsWithCounts = dirEntries
      .join(children, Seq("path"), "left_outer")
      .select(col("path"), col("entry_type"), col("size_bytes"),
        coalesce(col("n_entries"), lit(0L)).as("n_entries"), col("depth"))
    val visible = (df: DataFrame) =>
      df.filter(if (recursive) col("depth") <= maxDepth else col("depth") === 0)
    val parts =
      (if (exts.isEmpty) Seq(visible(dirsWithCounts)) else Seq.empty) ++
        Seq(visible(extFiltered.drop("ext")))
    parts.reduce(_ unionAll _)
      .drop("depth")
      .withColumn("path", concat(lit(prefix), col("path")))
      .orderBy(col("entry_type"), col("path"))
      .limit(cap)
  }

  /** Adapt a file corpus to the `documents` schema so every graft operator
    * (chunking, dedup, embedding, search) runs on real directories unchanged.
    * doc_id is a 64-bit hash of the path — deterministic and fully
    * distributed (a global row_number window would funnel every file's
    * content through one task); collision odds are ~n²/2⁶⁵.
    *
    * Two size columns with DIFFERENT jobs: `n_chars` is always the char
    * count of `text` — the semantic every consumer of the documents schema
    * assumes (dedup's len_bucket blocking key, indexStatus char totals) and
    * must never be polluted by a leg's on-disk representation; `byte_size`
    * is the leg's CHANGE-DETECTION key (the PDF leg's file byte size — a
    * PDF edit that keeps extracted-text length still flips it; the text
    * leg's char length, the best heuristic wholetext offers), consumed only
    * by the incremental diff and the chunk store's file_size surface.
    */
  def asDocuments(corpus: DataFrame): DataFrame = {
    // a leg that knows its docs' language (JSONL's langField) or its own
    // source notion (JSONL's per-FILE source — the default path prefix
    // would leak the record id for root-level files) passes them through
    val lang = if (corpus.columns.contains("lang")) col("lang") else lit("und")
    val source =
      if (corpus.columns.contains("source")) col("source")
      else regexp_extract(col("path"), "^([^/]*)", 1)
    corpus.select(
      abs(xxhash64(col("path"))).as("doc_id"),
      col("content").as("text"),
      lang.as("lang"),
      source.as("source"),
      length(col("content")).cast("long").as("n_chars"),
      col("size").as("byte_size"))
  }
}

/** Java-serializable Hadoop Configuration (Spark's own
  * SerializableConfiguration is private[spark]): Configuration is a
  * Writable, so ship it via its own write/readFields. Shared by the PDF
  * extraction tasks and [[PrunedListing]]'s distributed frontier tasks —
  * both must see the SESSION's conf (credentials/endpoints), not a fresh
  * executor-side `new Configuration()`.
  */
private[graft] class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
