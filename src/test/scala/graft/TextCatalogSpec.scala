package graft

import graft.operators.{Catalog, Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

class TextCatalogSpec extends SparkSpecBase {

  test("lang_id covers all docs with a valid prediction") {
    val df = TextAnalysis.langId(spark, sf).cache()
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.filter(!col("pred_lang").isin("en", "es", "de", "fr", "und")).count() == 0)
    df.unpersist()
  }

  test("quality_score is bounded in [0, 1.0001]") {
    val mm = TextAnalysis.qualityScore(spark, sf)
      .agg(min("score").as("mn"), max("score").as("mx")).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0001)
  }

  test("token_count: subtokens >= ws tokens for alphanumeric corpora") {
    val bad = TextAnalysis.tokenCount(spark, sf)
      .filter(col("n_subtokens") < col("n_ws_tokens")).count()
    assert(bad == 0)
  }

  test("token_count: CJK chars count as tokens in the estimate, ASCII unchanged") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_tok").toString
    Seq((1L, "hello 世界の window", "en", "s", 0L),
      (2L, "plain ascii text", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val r = TextAnalysis.tokenCount(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // "hello 世界の window": 3 CJK chars + 2 non-CJK tokens → estimate 5
    // (the naive whitespace count sees only 3 tokens)
    assert(r(1L).getAs[Long]("n_cjk_chars") == 3)
    assert(r(1L).getAs[Long]("n_tokens_est") == 5)
    // subtokens: alpha runs (hello, window) + CJK bigrams (世界, 界の)
    assert(r(1L).getAs[Long]("n_subtokens") == 4)
    // pure ASCII: estimate degenerates to the whitespace count
    assert(r(2L).getAs[Long]("n_cjk_chars") == 0)
    assert(r(2L).getAs[Long]("n_tokens_est") == r(2L).getAs[Long]("n_ws_tokens"))
  }

  test("quality_score: CJK chars count as 1-char tokens, not punctuation") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_qcjk").toString
    Seq((1L, "今天天气很好", "zh", "s", 0L),
      (2L, "the quick fox", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val r = TextAnalysis.qualityScore(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // 6 CJK chars → 6 one-char tokens; no punctuation; mean token length 1
    assert(r(1L).getAs[Long]("n_tokens") == 6)
    assert(r(1L).getAs[Long]("n_punct") == 0)
    assert(r(1L).getAs[Double]("mean_tok_len") == 1.0)
    // score = 0.3·(6/50) + 0.3·(1 − 0/6) + 0.2·0 + 0.2·(1/8) = 0.361
    assert(r(1L).getAs[Double]("score") == 0.361)
    // ASCII row unaffected by the CJK-aware tokenization
    assert(r(2L).getAs[Long]("n_tokens") == 3)
    assert(r(2L).getAs[Long]("n_stop") == 1)
  }

  test("fingerprint is deterministic and within the modulus") {
    val a = TextAnalysis.fingerprint(spark, sf).collect()
    val b = TextAnalysis.fingerprint(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 1000000007L))
  }

  test("doc_slice returns at most 20 tokens") {
    val bad = TextAnalysis.docSlice(spark, sf)
      .filter(size(split(col("slice_text"), " ")) > 20).count()
    assert(bad == 0)
  }

  test("corpus_catalog lists dirs before files, respects limit") {
    val rows = Catalog.corpusCatalog(spark, sf, limit = 50).collect()
    assert(rows.length == 50)
    val types = rows.map(_.getAs[String]("entry_type"))
    val firstFile = types.indexOf("file")
    if (firstFile >= 0) assert(!types.drop(firstFile).contains("dir"))
  }

  test("corpus_catalog options: ext whitelist suppresses dirs; recursion gates files") {
    // whitelist: only files, only matching langs, case/dot-insensitive spec
    val wl = Catalog.corpusCatalog(spark, sf, limit = 10000,
      includeExtensions = Seq(".EN", "de")).cache()
    assert(wl.filter(col("entry_type") === "dir").count() == 0)
    assert(wl.filter(!col("path").rlike("\\.(en|de)$")).count() == 0)
    assert(wl.count() ==
      Tables.documents(spark, sf).filter(lower(col("lang")).isin("en", "de")).count())
    wl.unpersist()
    // recursion off (or maxDepth 0): only the depth-0 source dirs remain
    for (noFiles <- Seq(
      Catalog.corpusCatalog(spark, sf, limit = 10000, recursive = false),
      Catalog.corpusCatalog(spark, sf, limit = 10000, maxDepth = 0))) {
      assert(noFiles.filter(col("entry_type") === "file").count() == 0)
      assert(noFiles.filter(col("entry_type") === "dir").count() > 0)
    }
    // whitelist + no recursion: nothing is visible at all
    assert(Catalog.corpusCatalog(spark, sf, limit = 10000, recursive = false,
      includeExtensions = Seq("en")).count() == 0)
  }

  test("TextCorpus.listFiles: reference list_files contract on a real nested tree") {
    import graft.sources.TextCorpus
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("graft_ls")
    def put(rel: String, content: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes("UTF-8"))
    }
    put("a.txt", "aa"); put("b.md", "bbb")
    put("docs/c.txt", "cccc"); put("docs/deep/d.md", "ddddd")
    put("src/e.scala", "eeeeee")
    // DECLARED difference from the reference: Spark's file index skips
    // '_'/'.'-prefixed names (its metadata-file convention) — these two
    // must NOT appear anywhere below
    put("_underscore.txt", "skipped"); put(".hidden.md", "skipped")
    // full recursion: 3 derived dirs first, then 5 files, both alphabetical
    val all = TextCorpus.listFiles(spark, root.toString, recursive = true).collect()
    assert(all.map(r => (r.getString(1), r.getString(0))).toSeq == Seq(
      ("dir", "docs"), ("dir", "docs/deep"), ("dir", "src"),
      ("file", "a.txt"), ("file", "b.md"), ("file", "docs/c.txt"),
      ("file", "docs/deep/d.md"), ("file", "src/e.scala")))
    // byte sizes come from file metadata
    assert(all.filter(_.getString(1) == "file").map(_.getLong(2)).toSeq == Seq(2L, 3L, 4L, 5L, 6L))
    // dir n_entries counts direct children only
    val entries = all.filter(_.getString(1) == "dir")
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(entries == Map("docs" -> 2L, "docs/deep" -> 1L, "src" -> 1L))
    // non-recursive: depth-0 entries only (reference default)
    val top = TextCorpus.listFiles(spark, root.toString).collect()
    assert(top.map(_.getString(0)).toSeq == Seq("docs", "src", "a.txt", "b.md"))
    // maxDepth 1: depth-1 files/dirs appear, depth-2 files do not
    val d1 = TextCorpus.listFiles(spark, root.toString, recursive = true, maxDepth = 1)
      .collect().map(_.getString(0)).toSeq
    assert(d1.contains("docs/c.txt") && d1.contains("docs/deep") &&
      !d1.contains("docs/deep/d.md"))
    // extension whitelist: dirs suppressed, only matching files (any depth)
    val md = TextCorpus.listFiles(spark, root.toString, recursive = true,
      includeExtensions = Seq(".MD")).collect()
    assert(md.map(_.getString(0)).toSeq == Seq("b.md", "docs/deep/d.md"))
    // entry limit after the deterministic sort
    assert(TextCorpus.listFiles(spark, root.toString, recursive = true, limit = 3)
      .collect().map(_.getString(0)).toSeq == Seq("docs", "docs/deep", "src"))
  }

  test("TextCorpus.listFiles dir param: normalized ROOT-relative paths, scheme roots, traversal guard") {
    import graft.sources.TextCorpus
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_dir")
    def put(rel: String, content: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes("UTF-8"))
    }
    put("a.txt", "aa"); put("docs/c.txt", "cccc"); put("docs/deep/d.md", "ddddd")
    // every spelling of the same subdir yields the same NORMALIZED
    // root-relative paths — "docs/" must not emit "docs//...", and
    // "docs/../docs" must not leak the ".." into output paths
    val want = Seq("docs/deep", "docs/c.txt", "docs/deep/d.md")
    for (d <- Seq("docs", "docs/", "./docs", "docs/../docs", "/docs")) {
      val got = TextCorpus.listFiles(spark, root.toString, dir = d, recursive = true)
        .collect().map(_.getString(0)).toSeq
      assert(got == want, s"dir=$d")
    }
    // a file:-scheme root must behave like the bare path (read() accepts both)
    val viaScheme = TextCorpus.listFiles(spark, "file://" + root.toString,
      dir = "docs", recursive = true).collect().map(_.getString(0)).toSeq
    assert(viaScheme == want)
    // "." and "./" mean the root itself
    assert(TextCorpus.listFiles(spark, root.toString, dir = "./").collect()
      .map(_.getString(0)).toSeq == Seq("docs", "a.txt"))
    // the reference's ensureWithinRoot contract: escapes throw
    for (bad <- Seq("..", "../", "docs/../..", "../outside"))
      intercept[IllegalArgumentException] {
        TextCorpus.listFiles(spark, root.toString, dir = bad)
      }
  }

  test("TextCorpus.read rejects glob-corrupting extensions") {
    import graft.sources.TextCorpus
    for (bad <- Seq(Seq("txt,md"), Seq("t*t"), Seq("a b"), Seq("md", "{x")))
      intercept[IllegalArgumentException] {
        TextCorpus.read(spark, "/tmp", allowedExt = bad)
      }
  }

  test("TextCorpus.read lists once and agrees with listFiles on %/+/space filenames") {
    import graft.sources.TextCorpus
    import java.nio.file.Files
    val root = Files.createTempDirectory("graft_pct")
    def put(name: String, content: String): Unit =
      Files.write(root.resolve(name), content.getBytes("UTF-8"))
    put("100%.txt", "pct")   // literal % — url_decode on a RAW path would throw here
    put("a%20b.txt", "esc")  // a valid-escape lookalike — must not become "a b.txt"
    put("a+b.txt", "plus")   // literal + — form-decoding would turn it into a space
    put("a b.txt", "space")  // real space — input_file_name() percent-encodes this one
    put("plain.md", "md")
    // ONE brace-glob listing for both extensions: exactly one scan in the plan
    val corpus = TextCorpus.read(spark, root.toString)
    val scans = corpus.queryExecution.sparkPlan.toString.split("FileScan").length - 1
    assert(scans == 1, s"expected one FileScan, got $scans")
    val byPath = corpus.collect()
      .map(r => r.getAs[String]("path") -> r.getAs[String]("content")).toMap
    assert(byPath == Map("100%.txt" -> "pct", "a%20b.txt" -> "esc",
      "a+b.txt" -> "plus", "a b.txt" -> "space", "plain.md" -> "md"))
    // the metadata listing must name the same files verbatim (no decode on
    // binaryFile's unescaped paths — a '%' name aborts, an escape renames)
    val listed = TextCorpus.listFiles(spark, root.toString, recursive = true).collect()
      .filter(_.getString(1) == "file").map(_.getString(0)).toSet
    assert(listed == byPath.keySet)
  }

  test("langId codepoint features classify CJK text the markers cannot see") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog is a test of the system"),
      (2L, "今天天气很好我们去公园"), // zh: han only
      (3L, "今日はいい天気ですね"), // ja: han + kana
      (4L, "오늘 날씨가 좋습니다"), // ko: hangul
      (5L, "mostly ascii with one 中 char in a long english sentence the of and is"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.langIdOver(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "zh")
    assert(got(3L) == "ja")
    assert(got(4L) == "ko")
    assert(got(5L) == "en", "a stray CJK char below the 5% ratio must not flip the language")
  }

  test("qualityScore counts stopwords in every supported language, not just English") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "the quick fox is one of the best"), // en markers
      (2L, "el la de los es bueno"), //            es markers
      (3L, "这是关于数据的文档"), //                 zh: 是 + 的 function chars
      (4L, "これはデータの文書です"), //             ja: は + の
      (5L, "이것이 데이터의 문서입니다"), //          ko: 이 + 의
      (6L, "zzz qqq xxx")) //                      no markers anywhere
      .toDF("doc_id", "text")
    val got = TextAnalysis.qualityScoreOver(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_stop")).toMap
    assert(got(1L) >= 3, s"en n_stop=${got(1L)}")
    assert(got(2L) >= 4, s"es n_stop=${got(2L)}")
    assert(got(3L) >= 2, s"zh n_stop=${got(3L)} — CJK docs must not score n_stop=0")
    assert(got(4L) >= 2, s"ja n_stop=${got(4L)}")
    assert(got(5L) >= 2, s"ko n_stop=${got(5L)}")
    assert(got(6L) == 0)
  }

  test("incremental_diff classifies every doc id exactly once with expected statuses") {
    val df = Catalog.incrementalDiff(spark, sf).cache()
    assert(df.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
    // docs below 20 exist only in the old snapshot -> removed
    assert(df.filter(col("doc_id") < 20 && col("status") =!= "removed").count() == 0)
    // docs >= 450 exist only in the new scan -> added
    assert(df.filter(col("doc_id") >= 450 && col("status") =!= "added").count() == 0)
    // middle docs divisible by 13 carry a size delta -> changed
    assert(df.filter(col("doc_id").between(20, 449) && col("doc_id") % 13 === 0 &&
      col("status") =!= "changed").count() == 0)
    df.unpersist()
  }

  test("pdf_decode hash matches direct md5 and pages >= 1") {
    val df = Multimodal.pdfDecode(spark, sf).cache()
    assert(df.filter(col("page_count_stub") < 1).count() == 0)
    val direct = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
    assert(df.join(direct, "doc_id").filter(col("content_hash") =!= col("h")).count() == 0)
    df.unpersist()
  }

  test("multimodal decodeFeatures plumbing: one feature row per doc, finite values") {
    val feats = Multimodal.decodeFeatures(spark, sf).cache()
    assert(feats.count() == Tables.documents(spark, sf).count())
    assert(feats.filter(size(col("feat")) =!= 8).count() == 0)
    val s = feats.select(aggregate(col("feat"), lit(0.0), (a, x) => a + x).as("s"))
    assert(s.filter(col("s") <= 0.0 || isnan(col("s"))).count() == 0)
    feats.unpersist()
  }
}
