package graft

import graft.sources.{JsonlCorpus, TextCorpus}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** JSONL corpus leg: record extraction, identity semantics (explicit ids vs
  * content-addressed), collision collapse, folder exclusion, and the facade
  * end-to-end (index, query, incremental reindex of record edits).
  */
class JsonlCorpusSpec extends SparkSpecBase {

  private def mkTree(files: (String, Seq[String])*): java.nio.file.Path = {
    val root = Files.createTempDirectory("graft_jsonl")
    files.foreach { case (rel, lines) =>
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    }
    root
  }

  test("record extraction: fields, malformed and empty lines drop, langField rides") {
    val root = mkTree(
      "data/train.jsonl" -> Seq(
        """{"id":"a1","text":"alpha document about joins","lang":"en"}""",
        """{"id":"a2","text":"beta document about scans"}""",
        """{"id":"a3","text":""}""",
        """{"id":"a4"}""",
        """not json at all""",
        """{"id":"a5","text":"gamma\nhas two lines","lang":"de"}"""))
    val corpus = JsonlCorpus.read(spark, root.toString,
      idField = Some("id"), langField = Some("lang"))
    val rows = corpus.orderBy("path").collect()
    // a3 (empty), a4 (missing text), malformed line all dropped
    assert(rows.map(_.getAs[String]("path")).toSeq ==
      Seq("data/train.jsonl#a1", "data/train.jsonl#a2", "data/train.jsonl#a5"))
    assert(rows.map(_.getAs[String]("lang")).toSeq == Seq("en", "und", "de"))
    // JSON \n unescapes to a real newline; line_count counts it
    val a5 = rows(2)
    assert(a5.getAs[String]("content") == "gamma\nhas two lines")
    assert(a5.getAs[Long]("line_count") == 2L)
    // size is the RAW line's length (the change-detection key), not the text's
    assert(rows(0).getAs[Long]("size") ==
      """{"id":"a1","text":"alpha document about joins","lang":"en"}""".length.toLong)
  }

  test("identity is injective for '#'-bearing filenames and ids") {
    // pre-escape, both records collapse onto ONE synthetic path
    // "a.jsonl#b.jsonl#x" — a silent merge; the percent-escape keeps the
    // separator unambiguous so they stay two documents
    val root = mkTree(
      "a.jsonl" -> Seq("""{"id":"b.jsonl#x","text":"first document body"}"""),
      "a.jsonl#b.jsonl" -> Seq("""{"id":"x","text":"second document body"}"""))
    val corpus = JsonlCorpus.read(spark, root.toString, idField = Some("id"))
    val paths = corpus.select("path").orderBy("path").collect().map(_.getString(0))
    assert(paths.toSeq == Seq("a.jsonl#b.jsonl%23x", "a.jsonl%23b.jsonl#x"),
      s"got ${paths.toSeq}")
    // and the derived doc_ids are distinct (no silent merge downstream)
    assert(TextCorpus.asDocuments(corpus).select("doc_id").distinct().count() == 2)
  }

  test("identity: explicit ids are rescan-stable; content-addressing collapses exact dups") {
    val root = mkTree(
      "a.jsonl" -> Seq(
        """{"text":"identical line"}""",
        """{"text":"identical line"}""",
        """{"text":"another record"}"""))
    val noId = JsonlCorpus.read(spark, root.toString)
    // byte-identical duplicate lines collapse to ONE document (declared)
    assert(noId.count() == 2)
    // doc_ids are distinct and stable across rescans
    val docs1 = TextCorpus.asDocuments(noId).orderBy("doc_id").collect()
    val docs2 = TextCorpus.asDocuments(JsonlCorpus.read(spark, root.toString))
      .orderBy("doc_id").collect()
    assert(docs1.map(_.getLong(0)).distinct.length == 2)
    assert(docs1.map(_.getLong(0)).toSeq == docs2.map(_.getLong(0)).toSeq)
    // colliding explicit ids collapse deterministically (max by content)
    val rootDup = mkTree(
      "b.jsonl" -> Seq(
        """{"id":"x","text":"bbb earlier"}""",
        """{"id":"x","text":"zzz later wins"}"""))
    val dup = JsonlCorpus.read(spark, rootDup.toString, idField = Some("id")).collect()
    assert(dup.length == 1 && dup(0).getAs[String]("content") == "zzz later wins")
    // identity is per-(file, id): the same id in two files is two documents
    val rootSplit = mkTree(
      "s1.jsonl" -> Seq("""{"id":"x","text":"record in shard one"}"""),
      "s2.jsonl" -> Seq("""{"id":"x","text":"record in shard two"}"""))
    assert(JsonlCorpus.read(spark, rootSplit.toString, idField = Some("id")).count() == 2)
  }

  test("source column is the file, not the record — root-level files included") {
    val root = mkTree(
      "train.jsonl" -> Seq(
        """{"id":"r1","text":"root level record one"}""",
        """{"id":"r2","text":"root level record two"}"""),
      "corpus/dev.jsonl" -> Seq("""{"id":"r3","text":"nested record"}"""))
    val docs = TextCorpus.asDocuments(
      JsonlCorpus.read(spark, root.toString, idField = Some("id")))
    // one source per FILE tree location: the root file's records must not
    // leak their '#id' suffix into source (one bogus source per record)
    assert(docs.select("source").distinct().collect().map(_.getString(0)).sorted.toSeq ==
      Seq("corpus", "train.jsonl"))
  }

  test("plan receipt: one text FileScan, no schema-inferring json source") {
    val root = mkTree("a.jsonl" -> Seq("""{"text":"plan check"}"""))
    val plan = JsonlCorpus.read(spark, root.toString)
      .queryExecution.executedPlan.toString
    assert("FileScan text".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("FileScan json"), plan)
  }

  test("discovery: brace glob keeps only jsonl, excluded folders skipped") {
    val root = mkTree(
      "keep/a.jsonl" -> Seq("""{"text":"kept record"}"""),
      "keep/readme.md" -> Seq("""{"text":"not a jsonl file"}"""),
      "node_modules/skip.jsonl" -> Seq("""{"text":"excluded folder"}"""))
    val got = JsonlCorpus.read(spark, root.toString).collect()
    assert(got.length == 1 && got(0).getAs[String]("content") == "kept record")
  }

  test("streaming JSONL collision guard: a duplicate id within one file emits one row") {
    import graft.streaming.JsonlStream
    // r9 ADVICE closure: before the watermark-scoped dedup, a collided id in
    // a stream batch produced duplicate doc_ids downstream until the next
    // batch reindex. The guard emits exactly one row per (file, id).
    val root = mkTree(
      "dup.jsonl" -> Seq(
        """{"id":"d1","text":"first arrival short"}""",
        """{"id":"d1","text":"second arrival, strictly longer content"}""",
        """{"id":"d2","text":"unique record"}"""),
      // cross-file id reuse stays two distinct documents (per-(file,id)
      // identity — the guard must not merge across files)
      "other.jsonl" -> Seq("""{"id":"d1","text":"same id, different file"}"""))
    val out = Files.createTempDirectory("graft_jsonldup").toString + "/docs"
    val streamed = JsonlStream.runToParquet(spark, root.toString, out,
      idField = Some("id"))
    assert(streamed.count() == 3, "one row per (file, id): d1@dup, d2@dup, d1@other")
    assert(streamed.groupBy("doc_id").count().filter(col("count") > 1).count() == 0,
      "no duplicate doc_ids downstream of a collided stream batch")
    // DECLARED divergence, pinned: the stream keeps the FIRST arrival where
    // batch collapse keeps the largest — the survivor difference is visible
    // as a content diff and reconciles at the next batch reindex
    val streamedD1 = streamed.filter(col("text").startsWith("first arrival")).count() +
      streamed.filter(col("text").startsWith("second arrival")).count()
    assert(streamedD1 == 1)
    val batch = TextCorpus.asDocuments(JsonlCorpus.read(spark, root.toString,
      idField = Some("id")))
    assert(batch.count() == 3)
    assert(batch.filter(col("text").startsWith("second arrival")).count() == 1,
      "batch collapse keeps the largest content for the collided id")
    // identity agreement: both legs produce the SAME doc_id set, so the
    // reindex diff reconciles survivors without any remove+add churn
    assert(streamed.select("doc_id").exceptAll(batch.select("doc_id")).count() == 0 &&
      batch.select("doc_id").exceptAll(streamed.select("doc_id")).count() == 0)
  }

  test("streaming JSONL ingest equals the batch leg; restart picks up only new files") {
    import graft.streaming.JsonlStream
    val root = mkTree(
      "a.jsonl" -> Seq(
        """{"id":"s1","text":"streamed record one","lang":"en"}""",
        """{"id":"s2","text":"streamed record two"}""",
        """not json"""),
      "sub/b.jsonl" -> Seq("""{"id":"s3","text":"nested streamed record"}"""))
    val out = Files.createTempDirectory("graft_jsonlstream").toString + "/docs"
    val streamed = JsonlStream.runToParquet(spark, root.toString, out,
      idField = Some("id"), langField = Some("lang"))
    val batch = TextCorpus.asDocuments(JsonlCorpus.read(spark, root.toString,
      idField = Some("id"), langField = Some("lang")))
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0)
    // a file arriving later streams in alone (checkpointed pickup)
    Files.write(root.resolve("c.jsonl"),
      """{"id":"s4","text":"late arrival"}""".getBytes("UTF-8"))
    val after = JsonlStream.runToParquet(spark, root.toString, out,
      idField = Some("id"), langField = Some("lang"))
    assert(after.count() == 4)
    assert(after.filter(col("text") === "late arrival").count() == 1)
    // no reprocessing: the first three docs appear exactly once
    assert(after.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
  }

  test("forJsonl facade: index, query, and incremental reindex of record edits") {
    val root = mkTree(
      "corpus/train.jsonl" -> Seq(
        """{"id":"d1","text":"hash joins build a table on the small side"}""",
        """{"id":"d2","text":"sort merge join shuffles both sides by key"}"""))
    val work = Files.createTempDirectory("graft_jsonlwork").toString
    val g = Graft.forJsonl(spark, root.toString, work, idField = Some("id"))
    val docs = Tables.documents(spark, work)
    assert(docs.count() == 2)
    // char-semantic n_chars, line-length byte_size — the two-column contract
    val d1 = docs.filter(col("text").startsWith("hash joins")).head()
    assert(d1.getAs[Long]("n_chars") ==
      "hash joins build a table on the small side".length.toLong)
    assert(d1.getAs[Long]("byte_size") > d1.getAs[Long]("n_chars")) // raw JSON line
    val hit = g.ragQuery("sort merge join shuffles", topK = 1).head()
    val d2id = docs.filter(col("text").startsWith("sort merge")).head().getAs[Long]("doc_id")
    assert(hit.getAs[Long]("doc_id") == d2id)
    // live mutations: append one record, edit one (id kept, length changed),
    // drop one — the reindex classifies each correctly
    val store = Files.createTempDirectory("graft_jsonlstore").toString + "/store"
    assert(g.reindexDirectory(store).head().getAs[Long]("n_added") == 2)
    Files.write(root.resolve("corpus/train.jsonl"), Seq(
      """{"id":"d1","text":"hash joins build a hash table on the smaller side"}""",
      """{"id":"d3","text":"broadcast joins replicate the small side"}""")
      .mkString("\n").getBytes("UTF-8"))
    val stats = g.reindexDirectory(store).head()
    assert(stats.getAs[Long]("n_added") == 1, stats.toString)    // d3
    assert(stats.getAs[Long]("n_changed") == 1, stats.toString)  // d1
    assert(stats.getAs[Long]("n_removed") == 1, stats.toString)  // d2
    // the edited text is what serves after the reindex
    val idx = IndexStore.load(spark, store, g.meta).get
    assert(g.ragQueryOver(idx, "hash table smaller side", topK = 1)
      .head().getAs[String]("snippet").contains("smaller side"))
  }

  test("watchDirectory over a JSONL facade: an arriving file triggers the reindex") {
    val root = mkTree(
      "corpus/seed.jsonl" -> Seq(
        """{"id":"s1","text":"seed record about columnar storage formats"}"""))
    val work = Files.createTempDirectory("graft_jsonlwatch").toString
    val store = Files.createTempDirectory("graft_jsonlwatchstore").toString + "/store"
    val ckpt = Files.createTempDirectory("graft_jsonlwatchckpt").toString
    val g = Graft.forJsonl(spark, root.toString, work, idField = Some("id"))
    g.reindexDirectory(store)
    val q = g.watchDirectory(store, ckpt)
    try {
      q.processAllAvailable() // drain the seed arrival (no-op diff)
      assert(Tables.documents(spark, work).count() == 1)
      Files.write(root.resolve("corpus/late.jsonl"),
        """{"id":"l1","text":"late arriving record about predicate pushdown"}"""
          .getBytes("UTF-8"))
      q.processAllAvailable()
      val docs = Tables.documents(spark, work)
      assert(docs.count() == 2, "the JSONL arrival must ride the watch loop")
      assert(docs.filter(col("text").contains("predicate pushdown")).count() == 1)
    } finally q.stop()
  }

  test("streamed index over a byte_size corpus equals the batch build (file_size included)") {
    // regression: a streaming docsSchema that pruned byte_size made the
    // streamed chunks carry file_size = n_chars while the batch index
    // carried byte_size — every doc then reindexed as 'changed'
    import graft.streaming.IndexStream
    val root = mkTree("corpus/train.jsonl" -> Seq(
      """{"id":"d1","text":"streamed chunks must match the batch index"}"""))
    val work = Files.createTempDirectory("graft_jsonlidx").toString
    val g = Graft.forJsonl(spark, root.toString, work, idField = Some("id"))
    val out = Files.createTempDirectory("graft_jsonlidxout").toString + "/idx"
    // facade-landed documents.parquet is a DIRECTORY of part files (testdata
    // ships it as a single file) — stream the table dir itself
    val streamed = IndexStream.runToParquet(spark, work + "/documents.parquet", out,
      glob = "*")
      .select("doc_id", "chunk_idx", "chunk_text", "file_size")
    val batch = g.buildIndex().select("doc_id", "chunk_idx", "chunk_text", "file_size")
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0)
    // and the streamed file_size really is the byte-size diff key
    val docs = Tables.documents(spark, work).head()
    assert(streamed.head().getAs[Long]("file_size") == docs.getAs[Long]("byte_size"))
    assert(docs.getAs[Long]("byte_size") != docs.getAs[Long]("n_chars"))
  }
}
