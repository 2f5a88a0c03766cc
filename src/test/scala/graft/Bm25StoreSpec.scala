package graft

import graft.operators.{AnnStore, Bm25, Bm25Store, Chunker}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted lexical (BM25) postings index — the round-14 headline:
  * store-served scoring must be value-identical to the in-plan scorer
  * (through the hybrid fusion too), serves must be partition-pruned to
  * the query terms' buckets, and the store must refresh incrementally
  * under the shared AnnStore dispatch semantics.
  */
class Bm25StoreSpec extends SparkSpecBase {

  private val query = Bm25.DefaultQuery
  private def chunks: DataFrame =
    Chunker.indexBuild(spark, sf).select("doc_id", "chunk_idx", "chunk_text")

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_lex_$tag").toString + "/idx"

  private def round4(df: DataFrame, keys: Seq[String]): Seq[Seq[Any]] =
    df.select(keys.map(col) :+ round(col("bm25") + lit(1e-9), 4).as("bm25"): _*)
      .orderBy(keys.map(col): _*)
      .collect().map(_.toSeq).toSeq

  test("store-served BM25 equals the in-plan scorer row for row") {
    val path = freshPath("eq")
    val m = Bm25Store.manifestFor(16, Seq(), "fp-eq")
    Bm25Store.writeLexicalIndexOver(spark, chunks, path, 16, m)
    val keys = Seq("doc_id", "chunk_idx")
    val served = round4(Bm25Store.scoresFromStore(spark, path, query), keys)
    val inline = round4(
      Bm25.bm25ScoresOver(chunks, keys, "chunk_text", query), keys)
    assert(served.nonEmpty, "query terms must hit the corpus")
    assert(served == inline,
      "store-served scores must equal the in-plan scorer (same rows, same 4dp values)")
    // a query with no corpus hits: schema-correct empty, not an error
    assert(Bm25Store.scoresFromStore(spark, path, "zzznosuchterm").count() == 0)
  }

  test("serve is partition-pruned to the query terms' buckets") {
    val path = freshPath("prune")
    val buckets = 16
    val m = Bm25Store.manifestFor(buckets, Seq(), "fp-prune")
    Bm25Store.writeLexicalIndexOver(spark, chunks, path, buckets, m)
    val served = Bm25Store.scoresFromStore(spark, path, query)
    // the bucket filter must reach the scan as a PARTITION filter — the
    // structural property that makes serve cost scale with the query's
    // posting lists, not the corpus
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cid"),
      s"postings read must be partition-pruned:\n$plan")
    // the pruned read touches no bucket outside the query terms' set
    val qBuckets = query.split(" ").filter(_.nonEmpty).distinct
      .map(Bm25Store.termBucket(_, buckets)).distinct.toSet
    val touched = spark.read.parquet(path + "/postings")
      .filter(col("cid").isin(qBuckets.toSeq: _*))
      .filter(col("term").isin(query.split(" ").toSeq.map(lit): _*))
      .select("cid").distinct().collect().map(_.getInt(0)).toSet
    assert(touched.subsetOf(qBuckets))
    // driver-side bucket twin agrees with the in-plan assignment
    val inPlan = spark.range(1)
      .select(query.split(" ").toSeq.map(t =>
        pmod(xxhash64(lit(t)), lit(buckets.toLong)).cast("int").as(t)): _*)
      .head()
    query.split(" ").zipWithIndex.foreach { case (t, i) =>
      assert(inPlan.getInt(i) == Bm25Store.termBucket(t, buckets),
        s"driver/in-plan bucket mismatch for '$t'")
    }
  }

  test("store-served hybrid is row-identical to the in-plan hybrid (single + batch)") {
    val path = freshPath("hybrid")
    val m = Bm25Store.manifestFor(16, Seq(), "fp-hybrid")
    Bm25Store.writeLexicalIndexOver(spark, chunks, path, 16, m)
    // the fusion needs the emb column — reuse the facade's cached index
    val g = new Graft(spark, sf)
    val idx = g.servingIndex
    val inline = Bm25.ragHybridOver(idx, query, topK = 10)
      .collect().map(_.toSeq).toSeq
    val served = Bm25.ragHybridOver(idx, query, topK = 10,
        bm25From = Some(Bm25Store.scoresFromStore(spark, path, query)))
      .collect().map(_.toSeq).toSeq
    assert(served == inline, "store-served hybrid must equal in-plan hybrid")
    val queries = Seq(query, "columnar parquet dictionary compression")
    val inlineB = Bm25.ragHybridBatchOver(idx, queries, topK = 5)
      .collect().map(_.toSeq).toSeq
    val servedB = Bm25.ragHybridBatchOver(idx, queries, topK = 5,
        bm25From = Some(Bm25Store.scoresFromStoreBatch(spark, path, queries)))
      .collect().map(_.toSeq).toSeq
    assert(servedB == inlineB, "store-served batch hybrid must equal in-plan")
  }

  test("refresh dispatch: fresh / restamp / incremental / full_params / full_drift") {
    val path = freshPath("refresh")
    val buckets = 16
    def manifest(fp: String, b: Int = buckets) =
      Bm25Store.manifestFor(b, Seq(), fp)
    val v1 = chunks.localCheckpoint()
    Bm25Store.writeLexicalIndexOver(spark, v1, path, buckets, manifest("fp1"))

    // fresh: same manifest → no work
    assert(Bm25Store.refreshLexicalIndexOver(spark, path, v1, manifest("fp1"))
      .head().getString(0) == "fresh")
    // restamp: same data, moved corpus files → stamp only
    assert(Bm25Store.refreshLexicalIndexOver(spark, path, v1, manifest("fp2"))
      .head().getString(0) == "restamp")

    // incremental: one changed, one removed, one added chunk
    val keys = v1.select("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (cDoc, cIdx) = keys.head
    val (rDoc, rIdx) = keys.last
    import spark.implicits._
    val edited = v1
      .filter(!(col("doc_id") === rDoc && col("chunk_idx") === rIdx))
      .withColumn("chunk_text",
        when(col("doc_id") === cDoc && col("chunk_idx") === cIdx,
          lit("freshly edited chunk about hash join probes"))
          .otherwise(col("chunk_text")))
      .unionByName(Seq((999999L, 0L, "a brand new appended chunk about scan"))
        .toDF("doc_id", "chunk_idx", "chunk_text"))
      .localCheckpoint()
    // snapshot untouched postings partitions to prove they are not rewritten
    val fs = AnnStore.fileSystem(spark, path)
    def partFiles(sub: String): Map[String, Seq[(String, Long, Long)]] = {
      val root = new org.apache.hadoop.fs.Path(s"$path/$sub")
      fs.listStatus(root).filter(_.getPath.getName.startsWith("cid="))
        .map { d =>
          d.getPath.getName -> fs.listStatus(d.getPath)
            .filter(_.isFile)
            .map(f => (f.getPath.getName, f.getLen, f.getModificationTime))
            .sortBy(_._1).toSeq
        }.toMap
    }
    val before = partFiles("postings")
    val r = Bm25Store.refreshLexicalIndexOver(spark, path, edited,
      manifest("fp3")).head()
    assert(r.getString(0) == "incremental", s"mode was ${r.getString(0)}")
    assert(r.getAs[Long]("n_added") == 1 && r.getAs[Long]("n_changed") == 1 &&
      r.getAs[Long]("n_removed") == 1)
    val after = partFiles("postings")
    val untouched = before.keySet.intersect(after.keySet)
      .filter(k => before(k) == after(k))
    assert(untouched.nonEmpty,
      "a 3-chunk trickle must leave most term buckets byte-identical")
    // refreshed store serves exactly what a cold rebuild over v2 serves
    val rebuilt = freshPath("rebuilt")
    Bm25Store.writeLexicalIndexOver(spark, edited, rebuilt, buckets, manifest("fp3"))
    val sKeys = Seq("doc_id", "chunk_idx")
    for (q <- Seq(query, "freshly edited probes", "appended scan")) {
      assert(round4(Bm25Store.scoresFromStore(spark, path, q), sKeys) ==
        round4(Bm25Store.scoresFromStore(spark, rebuilt, q), sKeys),
        s"refreshed store must equal cold rebuild for '$q'")
    }
    // full_params: a different bucket count rebuilds
    assert(Bm25Store.refreshLexicalIndexOver(spark, path, edited,
      manifest("fp3", b = 8)).head().getString(0) == "full_params")
    // full_drift: rewriting most of the corpus rebuilds (stale layout
    // would cost more to patch than to rebuild)
    val bulk = edited.withColumn("chunk_text",
      concat(col("chunk_text"), lit(" bulkedit"))).localCheckpoint()
    assert(Bm25Store.refreshLexicalIndexOver(spark, rebuilt, bulk,
      manifest("fp4")).head().getString(0) == "full_drift")
  }

  test("refresh equivalence property: random edit sets — refreshed store content equals cold rebuild") {
    // the strongest receipt the incremental path can have: not one
    // blessed mutation pattern but random add/remove/edit mixes, and not
    // score samples but the ENTIRE stored content (postings, chunks,
    // stats) byte-value-equal to a cold rebuild over the same corpus
    import spark.implicits._
    val buckets = 16
    val v1 = chunks.localCheckpoint()
    val keys = v1.select("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def tableOf(path: String, sub: String): Seq[Seq[Any]] =
      spark.read.parquet(s"$path/$sub").collect()
        .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed * 7919)
      val shuffled = rnd.shuffle(keys.toSeq)
      val toRemove = shuffled.take(2).toSet
      val toEdit = shuffled.slice(2, 5).toSet
      val added = (1 to 2).map(i =>
        (900000L + seed * 100 + i, 0L,
          s"seed $seed addition $i about ${if (i % 2 == 0) "hash join" else "column scan"}"))
      val v2 = v1
        .filter(!struct(col("doc_id"), col("chunk_idx"))
          .isInCollection(toRemove.toSeq.map { case (d, c) => struct(lit(d), lit(c)) }))
        .withColumn("chunk_text",
          when(struct(col("doc_id"), col("chunk_idx")).isInCollection(
            toEdit.toSeq.map { case (d, c) => struct(lit(d), lit(c)) }),
            concat(col("chunk_text"), lit(s" edited$seed")))
            .otherwise(col("chunk_text")))
        .unionByName(added.toDF("doc_id", "chunk_idx", "chunk_text"))
        .localCheckpoint()
      val refreshed = freshPath(s"prop_r$seed")
      Bm25Store.writeLexicalIndexOver(spark, v1, refreshed, buckets,
        Bm25Store.manifestFor(buckets, Seq(), s"fp-p$seed-1"))
      val r = Bm25Store.refreshLexicalIndexOver(spark, refreshed, v2,
        Bm25Store.manifestFor(buckets, Seq(), s"fp-p$seed-2")).head()
      assert(r.getString(0) == "incremental",
        s"seed $seed: mode=${r.getString(0)} (edits must stay under drift)")
      val rebuilt = freshPath(s"prop_b$seed")
      Bm25Store.writeLexicalIndexOver(spark, v2, rebuilt, buckets,
        Bm25Store.manifestFor(buckets, Seq(), s"fp-p$seed-2"))
      for (sub <- Seq("postings", "chunks", "stats"))
        assert(tableOf(refreshed, sub) == tableOf(rebuilt, sub),
          s"seed $seed: refreshed $sub differs from cold rebuild")
    }
  }

  test("stats crash states: mid-swap heals at serve; restamp re-derives stale stats") {
    val path = freshPath("stats")
    val m = Bm25Store.manifestFor(16, Seq(), "fp-s1")
    val v1 = chunks.localCheckpoint()
    Bm25Store.writeLexicalIndexOver(spark, v1, path, 16, m)
    val good = round4(Bm25Store.scoresFromStore(spark, path, query),
      Seq("doc_id", "chunk_idx"))
    val fs = AnnStore.fileSystem(spark, path)
    // crash state A: swapStats died between its two renames — live stats
    // gone, backup present. The next serve must heal and answer correctly.
    assert(fs.rename(new org.apache.hadoop.fs.Path(path + "/stats"),
      new org.apache.hadoop.fs.Path(path + "/stats.backup")))
    assert(round4(Bm25Store.scoresFromStore(spark, path, query),
      Seq("doc_id", "chunk_idx")) == good, "serve must heal a mid-swap stats crash")
    assert(fs.exists(new org.apache.hadoop.fs.Path(path + "/stats")))
    // crash state B: a refresh rewrote data but died BEFORE its stats
    // swap — new data, old manifest, stale stats. The next refresh lands
    // in restamp (diff empty) and must RE-DERIVE stats, not just stamp.
    import spark.implicits._
    val staleDir = new org.apache.hadoop.fs.Path(path + "/stats")
    fs.delete(staleDir, true)
    Seq((1.0, 1.0)).toDF("n_docs", "avgdl")
      .coalesce(1).write.parquet(staleDir.toString)
    val r = Bm25Store.refreshLexicalIndexOver(spark, path, v1,
      Bm25Store.manifestFor(16, Seq(), "fp-s2")).head()
    assert(r.getString(0) == "restamp")
    assert(round4(Bm25Store.scoresFromStore(spark, path, query),
      Seq("doc_id", "chunk_idx")) == good,
      "restamp must re-derive corpus stats, never serve the stale table")
  }

  test("a crashed incremental refresh is detected and costs a rebuild, never a patched store") {
    val path = freshPath("crash")
    val m1 = Bm25Store.manifestFor(16, Seq(), "fp-c1")
    val v1 = chunks.localCheckpoint()
    Bm25Store.writeLexicalIndexOver(spark, v1, path, 16, m1)
    val good = round4(Bm25Store.scoresFromStore(spark, path, query),
      Seq("doc_id", "chunk_idx"))
    // simulate the non-self-healing crash: a refresh died between its
    // postings deletes and the append — intent marker present, one term
    // bucket's survivors gone. The chunks/ diff table still says those
    // chunks are fine, so WITHOUT the marker the next refresh would stamp
    // a fresh manifest over the silently-corrupted postings.
    val fs = AnnStore.fileSystem(spark, path)
    fs.create(new org.apache.hadoop.fs.Path(path + "/.refresh.intent"), true).close()
    val someBucket = fs.listStatus(new org.apache.hadoop.fs.Path(path + "/postings"))
      .filter(_.getPath.getName.startsWith("cid=")).head.getPath
    fs.delete(someBucket, true)
    val r = Bm25Store.refreshLexicalIndexOver(spark, path, v1,
      Bm25Store.manifestFor(16, Seq(), "fp-c2")).head()
    assert(r.getString(0) == "full_crash", s"mode=${r.getString(0)}")
    // the rebuild restored every posting list and cleared the marker
    assert(round4(Bm25Store.scoresFromStore(spark, path, query),
      Seq("doc_id", "chunk_idx")) == good)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "/.refresh.intent")))
  }

  test("fully-served hybrid: both legs pruned; all-cells probing equals ragQueryHybrid") {
    val g = new Graft(spark, sf)
    val q = Bm25.DefaultQuery
    // at nprobe = k the dense candidates are the whole corpus, so the
    // fully-served fusion is row-identical to the store-lexical hybrid
    val exact = g.ragQueryHybrid(q, topK = 10).collect().map(_.toSeq).toSeq
    val allCells = g.ragQueryHybridAnn(q, topK = 10, nprobe = 16)
      .collect().map(_.toSeq).toSeq
    assert(allCells == exact,
      "all-cells served hybrid must equal ragQueryHybrid row for row")
    // pruned probing: the dense read is partition-pruned and the serve
    // still fills; the lexical leg is identical (exact over its postings)
    val pruned = g.ragQueryHybridAnn(q, topK = 10, nprobe = 2)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"dense leg must stay partition-pruned:\n$plan")
    val rows = pruned.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val bmRanks = rows.flatMap(r => Option(r.getAs[java.lang.Long]("bm25_rank")))
    val exactBm = exact.flatMap(r => Option(r(3).asInstanceOf[java.lang.Long]))
    assert(bmRanks.toSet.subsetOf(exactBm.toSet ++ bmRanks.toSet))
    // the BATCH twin: one pruned postings read + one pruned cell read for
    // the whole batch, per-query rows identical to the single-query serve
    val queries = Seq(q, "columnar parquet dictionary compression")
    val batch = g.ragQueryHybridAnnBatch(queries, topK = 5, nprobe = 4).collect()
    for ((qq, i) <- queries.zipWithIndex) {
      val single = g.ragQueryHybridAnn(qq, topK = 5, nprobe = 4)
        .collect().map(_.toSeq).toSeq
      val slice = batch.filter(_.getAs[Long]("query_id") == i.toLong)
        .map(_.toSeq.drop(1)).toSeq
      assert(slice == single, s"batch rows for query $i differ from per-query serve")
    }
  }

  test("compaction: fragmented term buckets rewrite to sized files, serving identical") {
    val path = freshPath("compact")
    val v1 = chunks.localCheckpoint()
    Bm25Store.writeLexicalIndexOver(spark, v1, path, 8,
      Bm25Store.manifestFor(8, Seq(), "fp-k1"))
    // fragment: an incremental refresh rewrites affected buckets from a
    // multi-partition frame, leaving small part files per bucket
    val keys = v1.select("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (cDoc, cIdx) = keys.head
    val edited = v1.withColumn("chunk_text",
      when(col("doc_id") === cDoc && col("chunk_idx") === cIdx,
        lit("compaction fragmenting edit about hash scan"))
        .otherwise(col("chunk_text"))).repartition(4).localCheckpoint()
    assert(Bm25Store.refreshLexicalIndexOver(spark, path, edited,
      Bm25Store.manifestFor(8, Seq(), "fp-k2")).head().getString(0) == "incremental")
    val before = round4(Bm25Store.scoresFromStore(spark, path, query),
      Seq("doc_id", "chunk_idx"))
    val stats = Bm25Store.compactLexIndex(spark, path, targetBytes = 1L << 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats.keySet == Set("postings", "chunks"))
    // data and serving unchanged; a second pass is a no-op
    assert(round4(Bm25Store.scoresFromStore(spark, path, query),
      Seq("doc_id", "chunk_idx")) == before,
      "compaction must not change served scores")
    val again = Bm25Store.compactLexIndex(spark, path, targetBytes = 1L << 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again.values.forall(_ == 0L), s"second pass must be a no-op: $again")
  }

  test("snapshot scorer + streaming ingest twin: frozen stats, stream equals batch") {
    val path = freshPath("snap")
    val docs = Tables.documents(spark, sf)
    val m = Bm25Store.manifestFor(16, Seq("unit" -> "doc"), "fp-snap")
    Bm25Store.writeLexicalIndexOver(spark,
      docs.select(col("doc_id"), lit(0).as("chunk_idx"), col("text")),
      path, 16, m, textCol = "text")
    val snap = Bm25Store.snapshotFor(spark, path, query)
    assert(snap.nDocs > 0 && snap.avgdl > 0 && snap.terms.nonEmpty)
    // consistency with the store: over the SAME corpus the snapshot
    // scorer's hit rows equal the store-served scores at 4 dp (identical
    // stats, identical tf/dl — only float summation order differs)
    val snapScores = Bm25Store.scoreWithSnapshot(docs, "text", snap)
      .filter(col("bm25") > 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val stored = Bm25Store.scoresFromStore(spark, path, query)
      .select(col("doc_id"), round(col("bm25") + lit(1e-9), 4).as("bm25"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(snapScores == stored,
      "snapshot scorer must reproduce the store-served scores on the store's own corpus")
    // the ingest twin: streamed arrivals score row-for-row like batch
    val streamed = graft.streaming.CurationStream
      .runLexToCompletion(spark, sf, snap, queryName = "lex_stream_spec")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batch = Bm25Store.scoreWithSnapshot(docs, "text", snap)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed == batch, "streamed lexical scoring must equal the batch scorer")
  }

  test("served driver twins equal their in-plan queries row for row") {
    val bm = Bm25.ragBm25(spark, sf).collect().map(_.toSeq).toSeq
    val bmS = Bm25.ragBm25Served(spark, sf).collect().map(_.toSeq).toSeq
    assert(bmS == bm, "rag_bm25_served must equal rag_bm25")
    val hy = Bm25.ragHybrid(spark, sf).collect().map(_.toSeq).toSeq
    val hyS = Bm25.ragHybridServed(spark, sf).collect().map(_.toSeq).toSeq
    assert(hyS == hy, "rag_hybrid_served must equal rag_hybrid")
  }
}
