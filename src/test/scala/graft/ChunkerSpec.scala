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
