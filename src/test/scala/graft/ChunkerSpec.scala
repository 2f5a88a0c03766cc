package graft

import graft.functions.Text
import graft.operators.Chunker
import org.apache.spark.sql.functions._

/** Chunking semantics vs the reference's splitChunks loop
  * (reference: src/indexer.ts:201-215).
  */
class ChunkerSpec extends SparkSpecBase {
  import spark.implicits._

  /** Reference loop re-implemented literally for comparison. */
  private def refSplit(text: String, size: Int, overlap: Int): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < text.length) {
      out += text.slice(i, i + size)
      i += math.max(1, size - overlap)
    }
    out.toSeq
  }

  test("chunks matches the reference splitChunks for assorted lengths") {
    val cases = Seq(
      ("", 100, 20), ("a", 100, 20), ("a" * 99, 100, 20), ("a" * 100, 100, 20),
      ("a" * 101, 100, 20), ("abcdefghij" * 25, 100, 20), ("xy" * 500, 800, 120),
      ("hello world, this is a chunking test string with some length", 16, 4))
    for ((text, size, overlap) <- cases) {
      val got = Seq(text).toDF("text")
        .select(Text.chunks(col("text"), size, overlap).as("c"))
        .head().getSeq[String](0)
      assert(got == refSplit(text, size, overlap), s"len=${text.length} size=$size ov=$overlap")
    }
  }

  test("chunk_docs_semantic: boundary invariants — no unit split, sizes bounded, lossless") {
    val target = 200
    val df = Chunker.chunkDocsSemantic(spark, sf, target).cache()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        array_join(filter(split(col("text"), " "), t => length(t) > 0), " ").as("norm_text"))
    // lossless + order-preserving: chunks rejoined in chunk_idx order give
    // back the normalized token stream — hence no token was ever split
    val rebuilt = df.orderBy("doc_id", "chunk_idx")
      .groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
        s => s.getField("chunk_text")), " ").as("rebuilt"))
    assert(docs.join(rebuilt, "doc_id").filter(col("norm_text") =!= col("rebuilt")).count() == 0)
    // chunk indices contiguous from 0 per doc
    val idx = df.groupBy("doc_id").agg(min("chunk_idx").as("mn"), max("chunk_idx").as("mx"),
      count(lit(1)).as("n"))
    assert(idx.filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1).count() == 0)
    // size bound: every chunk closes within target + its last unit's length
    // (the boundary-crossing unit overflows, nothing else does)
    val maxUnit = df.select(max(length(element_at(split(col("chunk_text"), " "), -1)))).head().getInt(0)
    assert(df.filter(col("chunk_chars") >= target + maxUnit + 1).count() == 0)
    df.unpersist()
  }

  test("chunk_docs_semantic: sentence delimiter keeps sentences atomic") {
    import spark.implicits._
    // a prose corpus with real sentence boundaries, via the delim parameter
    val prose = Seq(
      (1L, "One red fox. Two lazy dogs sleep in the warm sun. Short. " * 3 +
        "A final sentence closes the document."),
      (2L, "Single sentence only."),
      // a sentence far beyond 2×target: the raw cum/target bucket skips
      // values there — indices must still come out contiguous per doc
      (3L, "tiny. " + ("x" * 150) + ". closing words here. done.")).toDF("doc_id", "text")
    prose.createOrReplaceTempView("semantic_prose_docs")
    val sentences = prose.select(col("doc_id"),
      explode(filter(split(col("text"), java.util.regex.Pattern.quote(". ")), s => length(s) > 0)).as("s"))
    val chunks = {
      // same pipeline as the operator, against the prose frame: reuse via a
      // temp sfDir is impossible (operator reads the documents table), so
      // assert through the public operator on a parquet round-trip
      val dir = java.nio.file.Files.createTempDirectory("graft_sem").toString
      prose.withColumn("lang", lit("en")).withColumn("source", lit("prose"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(dir + "/documents.parquet")
      Chunker.chunkDocsSemantic(spark, dir, target = 60, delim = ". ").cache()
    }
    // every chunk, re-split on the sentence delimiter, yields only whole
    // sentences from the source doc — no sentence was cut mid-way
    val chunkSents = chunks.select(col("doc_id"),
      explode(split(col("chunk_text"), java.util.regex.Pattern.quote(". "))).as("s"))
    val foreign = chunkSents.join(sentences, Seq("doc_id", "s"), "left_anti")
    assert(foreign.count() == 0,
      s"chunk fragments not matching any source sentence: ${foreign.collect().mkString}")
    // contiguity survives oversized units (doc 3's 150-char sentence)
    val idx = chunks.groupBy("doc_id").agg(min("chunk_idx").as("mn"),
      max("chunk_idx").as("mx"), count(lit(1)).as("n"))
    assert(idx.filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1).count() == 0)
    chunks.unpersist()
  }

  test("chunk_docs covers every doc with contiguous indices") {
    val df = Chunker.chunkDocs(spark, sf).cache()
    val docs = Tables.documents(spark, sf).count()
    assert(df.select("doc_id").distinct().count() == docs)
    // indices are 0..n-1 per doc
    val bad = df.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max(col("chunk_idx")).as("mx"), min(col("chunk_idx")).as("mn"))
      .filter(col("mx") =!= col("n") - 1 || col("mn") =!= 0)
      .count()
    assert(bad == 0)
    df.unpersist()
  }

  test("index_status totals are consistent with index_build") {
    val status = Chunker.indexStatus(spark, sf)
    val build = Chunker.indexBuild(spark, sf)
    val totalChunks = status.agg(sum("chunks_total")).head().getLong(0)
    assert(totalChunks == build.count())
  }
}
