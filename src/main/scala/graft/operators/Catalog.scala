package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus catalog + incremental snapshot diff — the reference's `list_files`
  * and `incrementalUpdate` surfaces re-expressed over the documents table.
  */
object Catalog {

  /** A5: list_files analog (reference: src/index.ts:316-413). `source` plays
    * the directory; docs are files named `doc_<id>.<lang>` (the lang is the
    * extension analog) sized by n_chars. Mirrors the reference's full
    * option contract:
    *   - dirs-first deterministic sort with an entry limit (applied AFTER
    *     the sort — the reference caps in filesystem walk order, which is
    *     nondeterministic; deterministic-first is the declared difference);
    *   - `recursive`/`maxDepth`: sources sit at walk depth 0, their files
    *     at depth 1 — files are visible only when recursion is on and
    *     maxDepth ≥ 1 (reference src/index.ts:380-385);
    *   - `includeExtensions`: whitelist (lowercased, leading dot stripped,
    *     reference src/index.ts:353-355); when active, directory entries
    *     are suppressed from results (reference src/index.ts:376-378).
    * One small aggregate + a union — at scale this is a metadata query.
    */
  def corpusCatalog(spark: SparkSession, sfDir: String, limit: Int = 500,
                    recursive: Boolean = true, maxDepth: Int = Int.MaxValue,
                    includeExtensions: Seq[String] = Nil): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val exts = includeExtensions.map(_.toLowerCase.stripPrefix("."))
    val dirs = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_entries"))
      .select(col("source").as("path"), lit("dir").as("entry_type"),
        lit(null).cast("long").as("size_bytes"), col("n_entries"))
    val files = d.select(
      concat(col("source"), lit("/doc_"), col("doc_id"), lit("."), col("lang")).as("path"),
      lit("file").as("entry_type"), col("n_chars").as("size_bytes"),
      lit(null).cast("long").as("n_entries"),
      lower(col("lang")).as("ext"))
    val filesVisible = recursive && maxDepth >= 1
    val extFiltered =
      (if (exts.isEmpty) files else files.filter(col("ext").isin(exts: _*))).drop("ext")
    val parts =
      (if (exts.isEmpty) Seq(dirs) else Seq.empty) ++
        (if (filesVisible) Seq(extFiltered) else Seq.empty)
    parts.reduceOption(_ unionAll _).getOrElse(dirs.limit(0))
      .orderBy(col("entry_type"), col("path"))
      .limit(limit)
  }

  /** A6: incremental reindex diff (reference: src/indexer.ts:413-511).
    * Old snapshot = docs with doc_id < 450 whose stored size differs for
    * doc_id % 13 == 0 (the "content changed, size changed" case); new scan =
    * docs with doc_id >= 20. Full-outer join on doc_id classifies
    * added / removed / changed / unchanged — both sides hash-partition on
    * the same key, one co-partitioned shuffle; a bucketed snapshot makes it
    * shuffle-free at scale.
    */
  def incrementalDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val old = d.filter(col("doc_id") < 450)
      .select(col("doc_id"),
        (col("n_chars") + when(col("doc_id") % 13 === 0, 3L).otherwise(0L)).as("old_size"))
    val cur = d.filter(col("doc_id") >= 20)
      .select(col("doc_id"), col("n_chars").as("new_size"))
    old.join(cur, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_size").isNull, "added")
          .when(col("new_size").isNull, "removed")
          .when(col("old_size") =!= col("new_size"), "changed")
          .otherwise("unchanged"))
      .select(col("doc_id"), col("status"), col("old_size"), col("new_size"))
      .orderBy("doc_id")
  }

  /** A6b: content-hash diff — fixes the size heuristic's documented false
    * negative (SURVEY §5: a same-size edit goes undetected). The old
    * snapshot stores md5(text); the edit simulated for doc_id % 13 == 0
    * replaces the last character, so sizes MATCH and only the hash sees it.
    * Same single co-partitioned full-outer join shape as A6; the hash
    * column costs one scan-side md5 per row — the price of correctness a
    * real 100 TB pipeline pays (or amortizes into the ingest write).
    */
  def incrementalDiffHash(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    val editedText = when(col("doc_id") % 13 === 0,
      concat(col("text").substr(lit(1), length(col("text")) - 1), lit("?")))
      .otherwise(col("text"))
    val old = d.filter(col("doc_id") < 450)
      .select(col("doc_id"), md5(editedText).as("old_hash"))
    val cur = d.filter(col("doc_id") >= 20)
      .select(col("doc_id"), md5(col("text")).as("new_hash"))
    old.join(cur, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged"))
      .select(col("doc_id"), col("status"), col("old_hash"), col("new_hash"))
      .orderBy("doc_id")
  }
}
