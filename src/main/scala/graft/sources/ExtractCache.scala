package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The decode-once extraction cache (reference: src/pdf-extractor.ts —
  * extract once, key by (relPath, fileSize)), factored out of the PDF leg
  * so the image leg (and any future binary modality) rides the IDENTICAL
  * protocol instead of a re-implementation that could drift:
  *
  *  - discovery is a METADATA-ONLY listing (no file opened);
  *  - the listing full-outer-joins the cache on (path, byte_size):
  *    new/changed files surface as misses, removed/changed cache rows as
  *    stale;
  *  - ONLY the misses are opened and extracted, partition-locally;
  *  - the merged cache (current files only) is rewritten via staged write +
  *    backup-rename swap — and a NO-CHANGE round rewrites nothing at all;
  *  - the returned frame reads FROM the cache, so downstream actions
  *    re-read cheap parquet instead of re-decoding binaries.
  */
private[graft] object ExtractCache {

  /** Listing-fingerprint sidecar (r19): `_graft_listing_fp` inside the live
    * cache dir holds (row count, bit_xor of two salted xxhash64(path,
    * byte_size) hashes) over the exact listing the cache contents were
    * merged from. A warm round whose CURRENT listing fingerprints equal the
    * sidecar has, by multiset equality on the cache key (path, byte_size),
    * zero misses and zero stale rows — so it returns the cache read
    * directly, skipping the listing checkpoint, the cache full-outer join
    * and the pricing aggregate (guide §2.4/§6: at corpus scale that join is
    * a corpus-proportional shuffle paid on every reindex of a stable tree).
    * The fingerprint sees exactly what the join's key sees — no new blind
    * spot (a same-size content edit was already invisible to the protocol,
    * by the reference's (relPath, fileSize) contract).
    *
    * Crash safety: the sidecar rides INSIDE the swapped dir (underscore
    * prefix — invisible to parquet readers), written into staging from the
    * write job's own observed metrics, so sidecar and data flip atomically;
    * a stale sidecar cannot survive a cache rewrite because the swap
    * replaces the whole directory. A cache replaced by other means (the
    * poison receipts' raw dir swap) simply lacks a sidecar — the next full
    * round serves correctly and heals it.
    */
  private val FpFile = "_graft_listing_fp"

  /** (n, xor1, xor2) over (path, byte_size).
    * bit_xor (not sum): order-independent and overflow-free under ANSI.
    */
  private def fpExprs = Seq(
    count(lit(1)).as("fp_n"),
    coalesce(expr("bit_xor(xxhash64(path, byte_size))"), lit(0L)).as("fp_x1"),
    coalesce(expr("bit_xor(xxhash64(byte_size, path, 'graft_fp2'))"), lit(0L))
      .as("fp_x2"))

  /** Fingerprint via ONE dedicated (metadata-only) job — the comparison
    * side, where there is no write action to ride.
    */
  private def listingFp(listing: DataFrame): String = {
    val r = listing.agg(fpExprs.head, fpExprs.tail: _*).head()
    s"v1:${r.getLong(0)}:${r.getLong(1)}:${r.getLong(2)}"
  }

  /** Fingerprint riding a cache WRITE as observed metrics — zero extra
    * jobs, and computed over exactly the rows the write landed.
    */
  private def observedFp(merged: DataFrame): (DataFrame, () => String) = {
    val obs = org.apache.spark.sql.Observation()
    (merged.observe(obs, fpExprs.head, fpExprs.tail: _*),
      () => {
        val m = obs.get
        s"v1:${m("fp_n")}:${m("fp_x1")}:${m("fp_x2")}"
      })
  }

  private def readFp(fs: org.apache.hadoop.fs.FileSystem,
                     cpPath: org.apache.hadoop.fs.Path): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(cpPath, FpFile)
    try {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
        finally in.close()
      }
    } catch { case _: Exception => None }
  }

  private def writeFp(fs: org.apache.hadoop.fs.FileSystem,
                      dir: org.apache.hadoop.fs.Path, fp: String): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, FpFile), true)
    try out.write(fp.getBytes("UTF-8")) finally out.close()
  }

  /** Run `extract` through the cache at `cachePath`.
    *
    * `meta`: the metadata-only listing, (abs_path, path, byte_size) — one
    * narrow row per file. Checkpointed HERE (bounded) so the hits and
    * misses subtrees share one evaluation: an unpinned plan would re-list
    * the tree per subtree, and a file whose byte size changed between the
    * two evaluations would land as BOTH a hit (old size) and a miss (new
    * size) — duplicate path rows in the cache and duplicate doc_ids
    * downstream. The checkpoint's pin is released once the cache write has
    * consumed it (the returned frame reads parquet only).
    *
    * `extract`: (abs_path, path, byte_size) → (path, byte_size,
    * valueCols...), opening each input row's file inside the task. Must
    * degrade per-file (never throw): a broken/oversized file lands as its
    * leg's empty/failed value and is CACHED so it is not re-parsed every
    * round.
    *
    * `valueCols`: the cached value columns, in cache-schema order.
    *
    * EAGERNESS CONTRACT: when this returns, the cache at `cachePath` exists
    * and holds one row per currently listed file — the cold path and the
    * changed warm path run their cache write as an action inside the call,
    * and the no-change paths prove the existing cache current (fingerprint
    * or join) before returning. Callers rely on this ordering (the
    * img_files_real poison receipt mutates the tree between two `through`
    * rounds and requires round 1's cache to be fully on disk).
    */
  def through(spark: SparkSession, cachePath: String, meta: DataFrame,
              extract: DataFrame => DataFrame,
              valueCols: Seq[String]): DataFrame =
    graft.operators.AnnStore.releasingPinned(spark) {
      val hconf = spark.sparkContext.hadoopConfiguration
      val cpPath = new org.apache.hadoop.fs.Path(cachePath)
      val fs = cpPath.getFileSystem(hconf)
      // COLD START (no cache yet): every listed file is a miss by
      // definition — extract straight off the listing and write the cache,
      // skipping the checkpoint (one consumer, no double-evaluation risk),
      // the full-outer join, and the miss/stale pricing aggregate (r18:
      // three jobs per cold round that computed a foregone conclusion).
      // The warm path below is untouched.
      if (!fs.exists(cpPath)) {
        val outCols = Seq("path", "byte_size") ++ valueCols
        val merged = extract(
          meta.select(col("abs_path"), col("path"), col("byte_size")))
          .select(outCols.map(col): _*)
        val staging = new org.apache.hadoop.fs.Path(cachePath + ".staging")
        if (fs.exists(staging)) fs.delete(staging, true)
        // sidecar fingerprint rides the write job as observed metrics (zero
        // extra jobs) — computed from the CACHE rows themselves, not a
        // re-evaluated listing (the cold path is deliberately
        // un-checkpointed, and a file appearing between two listing
        // evaluations must not leave a sidecar that vouches for rows the
        // cache doesn't hold) — and lands in staging BEFORE the swap, so
        // sidecar and data flip atomically
        val (obsMerged, fp) = observedFp(merged)
        obsMerged.write.parquet(staging.toString)
        writeFp(fs, staging, fp())
        graft.IndexStore.swapDir(fs, staging, cpPath)
        spark.read.parquet(cachePath).select(outCols.map(col): _*)
      } else warmRound(spark, cachePath, meta, extract, valueCols, fs, cpPath)
    }

  /** The warm round: full-outer join against the existing cache, misses
    * and stale rows priced in one aggregate, no-change rounds rewrite
    * nothing. (Split out of [[through]] when the cold round got its
    * fast path.)
    */
  private def warmRound(spark: SparkSession, cachePath: String, meta: DataFrame,
                        extract: DataFrame => DataFrame, valueCols: Seq[String],
                        fs: org.apache.hadoop.fs.FileSystem,
                        cpPath: org.apache.hadoop.fs.Path): DataFrame = {
      // short-circuit (r19): listing fingerprint equal to the sidecar the
      // cache was written under ⟹ zero misses, zero stale ⟹ the merged
      // result would be byte-for-byte the existing cache — return it after
      // ONE metadata-only aggregate, skipping checkpoint + full-outer join
      // + pricing. Absent/mismatched sidecar falls through to the full
      // round, which rewrites the sidecar (self-healing after a crash
      // between cache swap and sidecar write).
      val storedFp = readFp(fs, cpPath)
      if (storedFp.isDefined &&
          storedFp.contains(listingFp(
            meta.select(col("path"), col("byte_size")))))
        return spark.read.parquet(cachePath)
          .select((Seq("path", "byte_size") ++ valueCols).map(col): _*)
      val metaCk = graft.operators.AnnStore.trackedCheckpoint(
        meta.select(col("abs_path"), col("path"), col("byte_size")))
      // FULL outer: a cache row with no current file (removed, or its byte
      // size changed) surfaces as abs_path IS NULL — so one aggregation
      // prices the whole round (misses AND stale rows) and the cache is
      // read exactly once. Presence is marked with an explicit flag column
      // (not a value column's null-ness — a leg's value may be legitimately
      // null).
      val cache = spark.read.parquet(cachePath)
        .select(col("path") +: col("byte_size") +: valueCols.map(col): _*)
        .withColumn("__cached", lit(true))
      val joined = metaCk.join(cache, Seq("path", "byte_size"), "full_outer")
      val c = joined.agg(
        sum(when(col("__cached").isNull && col("abs_path").isNotNull, 1L))
          .as("n_miss"),
        sum(when(col("abs_path").isNull, 1L)).as("n_stale")).head()
      val nMiss = Option(c.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
      val nStale = Option(c.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)
      // no misses and no stale rows means the merged result would be
      // byte-for-byte the existing cache, so a NO-CHANGE round rewrites
      // nothing (at corpus scale the rewrite is a corpus-proportional
      // write + object-store rename churn, paid every reindex of a
      // stable tree)
      val unchanged = nMiss == 0 && nStale == 0
      if (!unchanged) {
        val outCols = Seq("path", "byte_size") ++ valueCols
        val hits = joined
          .filter(col("__cached").isNotNull && col("abs_path").isNotNull)
          .select(outCols.map(col): _*)
        // misses open THEIR files only, partition-local; stale cache-only
        // rows (abs_path null) drop here — current files only
        val misses = extract(
          joined.filter(col("__cached").isNull && col("abs_path").isNotNull)
            .select(col("abs_path"), col("path"), col("byte_size")))
          .select(outCols.map(col): _*)
        val merged = hits.unionByName(misses)
        // staged write + backup-rename swap (the store contract's protocol —
        // the hits frame lazily READS the old cache, so never overwrite the
        // input in place; delete-then-rename would strand everything in
        // .staging on a crash between the two, and swapDir also surfaces a
        // failed rename as a diagnostic instead of a downstream read error)
        val staging = new org.apache.hadoop.fs.Path(cachePath + ".staging")
        if (fs.exists(staging)) fs.delete(staging, true)
        // next round's short-circuit sidecar: fingerprint of the merged
        // rows (current files only), observed on the write job itself and
        // landed in staging — atomic with the data under the swap
        val (obsMerged, fp) = observedFp(merged)
        obsMerged.write.parquet(staging.toString)
        writeFp(fs, staging, fp())
        graft.IndexStore.swapDir(fs, staging, cpPath)
      } else
        // unchanged round reached only when the sidecar was absent or
        // mismatched (else the short-circuit returned above): the join just
        // proved cache ≡ metaCk, so heal the live dir's sidecar from the
        // checkpointed listing (one tiny agg over a materialized frame)
        writeFp(fs, cpPath,
          listingFp(metaCk.select(col("path"), col("byte_size"))))
      // serve FROM the cache: downstream actions re-read parquet, not files
      spark.read.parquet(cachePath)
        .select((Seq("path", "byte_size") ++ valueCols).map(col): _*)
    }
}
