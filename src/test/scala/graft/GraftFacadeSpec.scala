package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end facade behavior — the "switch from mcp-rag-server" contract. */
class GraftFacadeSpec extends SparkSpecBase {

  lazy val g = new Graft(spark, sf)

  test("buildIndex embeds every chunk with a unit-norm or zero vector") {
    val idx = g.buildIndex().cache()
    assert(idx.count() > 0)
    val norms = idx.select(
      sqrt(aggregate(col("emb"), lit(0.0), (a, x) => a + x * x)).as("n"))
    val off = norms.filter(col("n") > 0.0001 && abs(col("n") - 1.0) > 1e-9).count()
    assert(off == 0)
    idx.unpersist()
  }

  test("ragQuery returns descending scored snippets; exact text of a doc ranks it first") {
    // use the opening tokens of doc 7 as the query — that doc's first chunk must win
    val probe = g.readFile(7, 1, 12)
    val hits = g.ragQuery(probe, topK = 5).collect()
    assert(hits.length == 5)
    assert(hits.head.getAs[Long]("doc_id") == 7L)
    val scores = hits.map(_.getAs[Double]("score"))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("readFile honors 1-based inclusive token ranges") {
    val whole = g.readFile(3)
    val first5 = g.readFile(3, 1, 5)
    assert(whole.startsWith(first5))
    assert(first5.split(" ").length == 5)
  }

  test("IndexStore round-trips and rejects mismatched metadata") {
    val dir = Files.createTempDirectory("graft_store").toString
    val meta = IndexStore.Meta(IndexStore.Version, 100, 20, g.modelName)
    val idx = g.buildIndex()
    IndexStore.save(idx, dir, meta)
    val back = IndexStore.load(spark, dir, meta)
    assert(back.isDefined)
    assert(back.get.count() == idx.count())
    assert(back.get.columns.sorted.sameElements(idx.columns.sorted))
    // changed chunking params -> incompatible -> None (cold rebuild path)
    val stale = IndexStore.load(spark, dir, meta.copy(chunkSize = 800))
    assert(stale.isEmpty)
    // missing store -> None
    assert(IndexStore.load(spark, dir + "_nope", meta).isEmpty)
  }
}
