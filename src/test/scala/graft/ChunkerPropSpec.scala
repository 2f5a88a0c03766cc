package graft

import graft.functions.Text
import org.apache.spark.sql.functions._

/** Randomized-property check (fixed seed → deterministic): the Column-level
  * chunker equals the reference's splitChunks loop
  * (reference: src/indexer.ts:201-215) for arbitrary ASCII text and any
  * (size, overlap) with overlap < size.
  */
class ChunkerPropSpec extends SparkSpecBase {
  import spark.implicits._

  private def refSplit(text: String, size: Int, overlap: Int): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < text.length) {
      out += text.slice(i, i + size)
      i += math.max(1, size - overlap)
    }
    out.toSeq
  }

  test("Text.chunks == reference splitChunks over 100 randomized cases") {
    val rnd = new scala.util.Random(42)
    val cases = (0 until 100).map { _ =>
      val n = rnd.nextInt(401)
      val text = (0 until n).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
      val size = 1 + rnd.nextInt(120)
      val overlap = rnd.nextInt(size)
      (text, size, overlap)
    }
    // one Spark job for all cases: each row carries its own text; per-case
    // chunk params differ, so group cases by (size, overlap)
    cases.groupBy { case (_, s, o) => (s, o) }.foreach { case ((size, overlap), grp) =>
      val got = grp.map(_._1).toDF("text")
        .select(col("text"), Text.chunks(col("text"), size, overlap).as("c"))
        .collect()
        .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      for ((text, _, _) <- grp) {
        assert(got(text) == refSplit(text, size, overlap),
          s"len=${text.length} size=$size overlap=$overlap")
      }
    }
  }
}
