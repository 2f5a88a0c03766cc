package graft.operators

import graft.IndexStore
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared persistence plumbing for the served ANN indexes (C3 IVF, C5 PQ,
  * C6 graph) — the same contract the chunk store's `IndexStore` enforces
  * (reference: src/persistence.ts — load refuses unless the stored metadata
  * matches, which triggers a cold rebuild):
  *
  *   - every persisted index carries a MANIFEST (version, build parameters,
  *     and a cheap fingerprint of the corpus it was built from), so a corpus
  *     mutated or regenerated under the same path can never be silently
  *     served from a stale index;
  *   - every index write goes through the staged-swap protocol
  *     ([[IndexStore.swapDir]]): write to `<path>.staging`, then
  *     backup-rename into place — a crash mid-build can never destroy the
  *     live index, and a crash between the two renames is self-healed on the
  *     next read (backup renamed back).
  *
  * The fingerprint digests the source table's per-file (path, length, mtime)
  * tuples — no Spark job, O(listing) — which catches regeneration and
  * in-place mutation without scanning data, and cannot collide on aggregates
  * the way a (count, total bytes, max mtime) summary could (same file count
  * and byte total, non-increasing timestamps). At cluster scale the same
  * role is played by a table snapshot/transaction id.
  */
private[graft] object AnnStore {
  val ManifestFile = "_graft_ann_meta.json"
  val Version = 1

  def fileSystem(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Cheap data fingerprint of an arbitrary parquet directory: MD5 over the
    * sorted per-file (path, length, mtime) tuples. Listing-only — never a
    * Spark job.
    */
  def pathFingerprint(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return "absent"
    val it = fs.listFiles(p, true)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      entries += s"${f.getPath.toString}|${f.getLen}|${f.getModificationTime}"
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    entries.sorted.foreach(e => md.update((e + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Fingerprint of the ANN operators' source table, `<sfDir>/embeddings.parquet`. */
  def corpusFingerprint(spark: SparkSession, sfDir: String): String =
    pathFingerprint(spark, new Path(sfDir, "embeddings.parquet").toString)

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Canonical manifest rendering — equality is string-exact, so parameter
    * order is fixed by the caller's Seq (callers pass a stable literal).
    * String values render as escaped JSON strings, numbers raw.
    */
  def manifest(kind: String, params: Seq[(String, Any)], fingerprint: String): String = {
    val ps = params.map {
      case (k, v: String) => s"${jsonStr(k)}:${jsonStr(v)}"
      case (k, v) => s"${jsonStr(k)}:$v"
    }.mkString(",")
    s"""{"version":$Version,"kind":${jsonStr(kind)},$ps,"fingerprint":${jsonStr(fingerprint)}}"""
  }

  /** Pull an integer build parameter back out of a stored manifest (for the
    * incremental-refresh path, which must honor the index's own parameters
    * rather than the caller's defaults).
    */
  def manifestInt(manifest: String, key: String): Option[Int] =
    s""""$key":(-?\\d+)""".r.findFirstMatchIn(manifest).map(_.group(1).toInt)

  def writeManifestFile(fs: FileSystem, dir: Path, manifest: String): Unit = {
    val out = fs.create(new Path(dir, ManifestFile), true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
  }

  /** Read the live manifest; if the live dir is missing but a `.backup` holds
    * one (a crash hit the swap between its two renames), rename the backup
    * back first — the same self-heal [[IndexStore.load]] performs for the
    * chunk store. None → caller must cold-rebuild. Any read failure
    * (including the manifest vanishing between the exists probe and the
    * open, under a concurrent swap) maps to None — never an exception.
    */
  def readManifest(spark: SparkSession, path: String): Option[String] = {
    val live = new Path(path)
    val metaPath = new Path(live, ManifestFile)
    val fs = fileSystem(spark, path)
    if (!fs.exists(metaPath)) {
      val backup = new Path(path + ".backup")
      val healed = !fs.exists(live) &&
        fs.exists(new Path(backup, ManifestFile)) &&
        fs.rename(backup, live)
      if (!healed) return None
    }
    try {
      val in = fs.open(metaPath)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    } catch { case _: Exception => None }
  }

  /** Build the index contents under a staging root (callback writes its
    * subdirectories there), stamp the manifest, swap into place. The live
    * index keeps serving until the rename; a crash mid-callback leaves only
    * a dead `.staging` that the next write clears.
    */
  def writeStaged(spark: SparkSession, path: String, manifestStr: String)
                 (write: String => Unit): Unit = {
    val fs = fileSystem(spark, path)
    val staging = new Path(path + ".staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    write(staging.toString)
    writeManifestFile(fs, staging, manifestStr)
    IndexStore.swapDir(fs, staging, new Path(path))
  }

  /** Build-once gate with freshness: rebuild iff no live manifest matches
    * `manifestStr` exactly (covering version, build params, AND the corpus
    * fingerprint — the reference's metadata-match-or-cold-rebuild contract).
    */
  def ensureIndex(spark: SparkSession, path: String, manifestStr: String)
                 (build: => Unit): Unit =
    if (!readManifest(spark, path).contains(manifestStr)) build

  /** A manifest with its fingerprint value blanked — equality of `paramsOf`
    * means "same version, kind, and build parameters" regardless of which
    * corpus state the index was built from.
    */
  def paramsOf(manifest: String): String =
    manifest.replaceAll(""""fingerprint":"[^"]*"""", """"fingerprint":""")

  /** Incremental index maintenance — the shared diff/dispatch skeleton for
    * the coarse-quantized stores (IVF vectors, graph vectors+edges). The
    * reference's watch loop re-embeds only the changed set and keeps its
    * index live (reference: src/indexer.ts:413-511); the cluster analog is:
    * keep the STORED centroids, diff the new corpus against the stored
    * vectors table on vec_id, and hand the operator only the affected cell
    * ids to rewrite — a trickle of changed files touches a handful of cid
    * partitions instead of retraining and rewriting the whole index.
    *
    *   - `assignNew(centroids)` → the new corpus with a `cid` column,
    *     assigned against the STORED codebook (plus whatever payload columns
    *     the operator persists — every non-cid column participates in change
    *     detection, so a metadata-only edit still refreshes its cell);
    *   - `rewrite(affectedCids, rows)` → surgical delete+append of exactly
    *     those cid partitions; `rows` is the affected cells' full new
    *     contents (payload columns + cid), served from the cached diff join
    *     rather than a second corpus scan;
    *   - `fullBuild()` → the cold path (no usable store, parameter change,
    *     or drift past `driftBound` — stale centroids degrade recall, so
    *     bulk change forces a retrain).
    *
    * The new manifest is stamped LAST, after the rewrite: a crash anywhere
    * mid-refresh leaves the old manifest in place, whose fingerprint no
    * longer matches the mutated corpus — the next ensure/refresh sees the
    * mismatch and cold-rebuilds. Crash safety costs a rebuild, never a
    * wrong answer (single-writer, like every store here).
    *
    * Returns a 1-row stats frame: mode ∈ {fresh, restamp, incremental,
    * full_cold, full_params, full_drift}, n_added/n_changed/n_removed
    * (−1 when the diff was skipped), n_cells_rewritten.
    */
  private[graft] def refreshIndex(spark: SparkSession, path: String,
                                  newManifest: String,
                                  assignNew: Array[Array[Double]] => DataFrame,
                                  rewrite: (Seq[Int], DataFrame) => Unit,
                                  fullBuild: () => Unit,
                                  driftBound: Double = 0.3): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def stats(mode: String, a: Long, c: Long, r: Long, cells: Long) =
      Seq((mode, a, c, r, cells))
        .toDF("mode", "n_added", "n_changed", "n_removed", "n_cells_rewritten")
    readManifest(spark, path) match {
      case None =>
        fullBuild(); stats("full_cold", -1, -1, -1, -1)
      case Some(m) if m == newManifest =>
        stats("fresh", 0, 0, 0, 0)
      case Some(m) if paramsOf(m) != paramsOf(newManifest) =>
        fullBuild(); stats("full_params", -1, -1, -1, -1)
      case Some(_) =>
        val centroids = readCentroids(spark, path)
        val neu = assignNew(centroids)
        // every persisted column except the derived cell id participates in
        // change detection (embedding AND payload metadata). Row presence is
        // judged by the payload struct, NOT the cid — a null embedding gets
        // a null cid yet is still a real row on either side.
        val payload = neu.columns.filterNot(_ == "cid").map(col)
        val oldSide = spark.read.parquet(path + "/vectors")
          .select(col("vec_id"), struct(payload.toSeq: _*).as("old_payload"),
            col("cid").cast("int").as("old_cid"))
        val newSide = neu
          .select(col("vec_id"), struct(payload.toSeq: _*).as("new_payload"),
            col("cid").cast("int").as("new_cid"))
        val j = oldSide.join(newSide, Seq("vec_id"), "full_outer").cache()
        try {
          val added = j.filter(col("old_payload").isNull)
          val removed = j.filter(col("new_payload").isNull)
          val changed = j.filter(col("old_payload").isNotNull && col("new_payload").isNotNull &&
            !(col("old_payload") <=> col("new_payload")))
          val nA = added.count(); val nC = changed.count(); val nR = removed.count()
          val nOld = j.filter(col("old_payload").isNotNull).count()
          // a dirty row without a cell (null embedding → null cid) has no
          // partition to rewrite surgically — degenerate, cold-rebuild
          val nNullCell = added.filter(col("new_cid").isNull).count() +
            removed.filter(col("old_cid").isNull).count() +
            changed.filter(col("old_cid").isNull || col("new_cid").isNull).count()
          if (nA + nC + nR == 0) {
            // data identical; only the corpus files moved (e.g. a rewrite of
            // the same rows) — stamp the new fingerprint, touch no data
            writeManifestFile(fileSystem(spark, path), new Path(path), newManifest)
            stats("restamp", 0, 0, 0, 0)
          } else if (nNullCell > 0) {
            fullBuild(); stats("full_nullcell", nA, nC, nR, -1)
          } else if (nA + nC + nR > driftBound * math.max(nOld, 1L)) {
            fullBuild(); stats("full_drift", nA, nC, nR, -1)
          } else {
            // bounded collect: distinct cell ids, ≤ k rows
            val affected = added.select(col("new_cid").as("c"))
              .unionAll(changed.select(col("new_cid").as("c")))
              .unionAll(changed.select(col("old_cid").as("c")))
              .unionAll(removed.select(col("old_cid").as("c")))
              .distinct().collect().map(_.getInt(0)).toSeq.sorted
            // rewrite rows come out of the CACHED diff join, not a second
            // scan+assignment pass over the corpus
            val payloadNames = neu.columns.filterNot(_ == "cid")
            val rows = j.filter(col("new_cid").isin(affected: _*))
              .select(payloadNames.map(n => col(s"new_payload.$n").as(n)) :+
                col("new_cid").as("cid"): _*)
            rewrite(affected, rows)
            writeManifestFile(fileSystem(spark, path), new Path(path), newManifest)
            stats("incremental", nA, nC, nR, affected.length.toLong)
          }
        } finally { j.unpersist(); () }
    }
  }

  /** The k-row centroid matrix as a tiny one-file frame — the shared layout
    * for every coarse-quantized index's query-side probe selection.
    */
  def writeCentroids(spark: SparkSession, dir: String,
                     centroids: Array[Array[Double]]): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cid", "centroid").coalesce(1)
      .write.parquet(dir + "/centroids")
  }

  def readCentroids(spark: SparkSession, path: String): Array[Array[Double]] =
    spark.read.parquet(path + "/centroids").orderBy("cid").collect()
      .map(_.getSeq[Double](1).toArray)

  /** Dir-keyed default location for a persisted index — the bench/driver
    * entries serve from here; freshness rides the manifest, not the path.
    */
  def defaultPath(prefix: String, sfDir: String): String =
    s"/tmp/graft_${prefix}_index_v1_" +
      java.security.MessageDigest.getInstance("MD5")
        .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
