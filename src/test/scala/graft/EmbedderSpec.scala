package graft

import java.nio.file.Files

import graft.plans.VecExprs.HashEmbedAlg
import org.apache.spark.sql.functions._

/** Stub "model": the hash embed of the REVERSED text — deterministic and
  * cheap like the default, but a genuinely different vector space, so any
  * path that accidentally falls back to the default embedder produces
  * visibly wrong vectors. Session-backed shape: embedBatch is the only
  * override, exactly what an ONNX-session subclass would implement.
  * Top-level (not nested in the suite) because an embedder ships to
  * executors — capturing a non-serializable enclosing instance is exactly
  * the bug a real model-session subclass must also avoid.
  */
class ReversedEmbedder(val dim: Int) extends BatchEmbedder {
  override def batchSize: Int = 3 // tiny, so multi-batch grouping is exercised
  def name: String = s"stub-reversed-v1-d$dim"
  def embedBatch(texts: Array[String]): Array[Array[Double]] =
    texts.map(t => HashEmbedAlg.embed(t.reverse, dim))
}

/** The pluggable-embedder seam: a stub SESSION-BACKED embedder (the
  * BatchEmbedder mapPartitions shape a real ONNX model would use) drives
  * the whole facade lifecycle — build, query, store round-trip, incremental
  * reindex — through the SAME seam the default hash embedder uses, with no
  * operator changes. The driver entries stay byte-unchanged because the
  * default is untouched (the verify gate is the receipt for that half).
  */
/** Misbehaving stubs for the boundary-contract spec — top-level for the
  * same serializability reason as [[ReversedEmbedder]].
  */
class DropperEmbedder extends BatchEmbedder {
  val dim = 8
  def name = "stub-dropper"
  def embedBatch(texts: Array[String]): Array[Array[Double]] =
    texts.filter(_.nonEmpty).map(_ => Array.fill(8)(0.5))
}

class WrongDimEmbedder extends BatchEmbedder {
  val dim = 8
  def name = "stub-wrongdim"
  def embedBatch(texts: Array[String]): Array[Array[Double]] =
    texts.map(_ => Array.fill(384)(0.1))
}

class EmbedderSpec extends SparkSpecBase {
  import spark.implicits._

  test("BatchEmbedder.embedFrame: batched mapPartitions, nulls, column preservation") {
    val e = new ReversedEmbedder(16)
    // 7 rows at batchSize=3 → 3 batches per partition boundary arrangement;
    // one null text interleaved mid-batch
    val df = Seq(("a", "alpha beta", 1), ("b", "gamma", 2), ("c", null, 3),
      ("d", "delta", 4), ("e", "epsilon zeta", 5), ("f", "eta", 6),
      ("g", "theta", 7)).toDF("id", "txt", "extra")
    val out = e.embedFrame(df, "txt", "emb").collect().sortBy(_.getAs[String]("id"))
    assert(out.length == 7)
    // null text → null embedding (the expression path's null semantics)
    assert(out.find(_.getAs[String]("id") == "c").get.isNullAt(3))
    // non-null rows: exactly the per-text function, order preserved across
    // batch boundaries and around the null
    for (r <- out if !r.isNullAt(1)) {
      val expect = HashEmbedAlg.embed(r.getAs[String]("txt").reverse, 16).toSeq
      assert(r.getSeq[Double](r.fieldIndex("emb")).toSeq == expect, s"row ${r.getAs[String]("id")}")
    }
    // other columns ride through unchanged
    assert(out.map(_.getAs[Int]("extra")).toSeq == (1 to 7))
  }

  test("stub embedder end-to-end: build → ragQuery → incremental reindex through one seam") {
    val work = Files.createTempDirectory("graft_embseam_work").toString
    val store = Files.createTempDirectory("graft_embseam_store").toString + "/store"
    val emb = new ReversedEmbedder(64)
    def corpus(version: Int) = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, if (version == 1) "pack my box with five dozen liquor jugs"
           else "a completely rewritten second document body"),
      (3L, "sphinx of black quartz judge my vow")).toDF("doc_id", "text")

    val g = Graft.forFrame(spark, corpus(1), work, embedder = Some(emb))
    assert(g.modelName == "stub-reversed-v1-d64")

    // cold build lands stub vectors: every stored emb is the stub function
    // of its chunk text, NOT the default hash embed
    val stats1 = g.incrementalUpdate(store).head()
    assert(stats1.getAs[Long]("n_added") == 3)
    val stored = IndexStore.load(spark, store, g.meta)
      .getOrElse(fail("store not readable back under stub-model metadata"))
    for (r <- stored.select("chunk_text", "emb").collect()) {
      val txt = r.getString(0)
      assert(r.getSeq[Double](r.fieldIndex("emb")).toSeq == emb.embedText(txt).toSeq)
      assert(r.getSeq[Double](r.fieldIndex("emb")).toSeq != HashEmbedAlg.embed(txt, 64).toSeq)
    }

    // query-side: the SAME seam embeds the query string, so searching a
    // chunk's exact text ranks that chunk first (both sides stub space)
    val top = g.ragQuery("sphinx of black quartz judge my vow", topK = 1).head()
    assert(top.getAs[Long]("doc_id") == 3L)

    // incremental reindex re-embeds ONLY the dirty doc, through the seam:
    // doc 2's new content carries stub vectors; docs 1/3 stay kept rows
    val g2 = new Graft(spark, work, frameShape = Some(Graft.frameShapeOf(corpus(2))),
      embedderOpt = Some(emb))
    val stats2 = g2.reindexFrame(corpus(2), store).head()
    assert(stats2.getAs[Long]("n_changed") == 1 && stats2.getAs[Long]("n_added") == 0)
    val after = IndexStore.load(spark, store, g2.meta).get
    val doc2 = after.filter(col("doc_id") === 2L).select("chunk_text", "emb").collect()
    assert(doc2.nonEmpty)
    for (r <- doc2)
      assert(r.getSeq[Double](r.fieldIndex("emb")).toSeq == emb.embedText(r.getString(0)).toSeq,
        "dirty doc must re-embed through the facade's embedder seam")

    // model identity is store compatibility: a DEFAULT-embedder facade over
    // the same corpus refuses the stub-built store (metadata mismatch → cold
    // rebuild, everything added) instead of silently mixing vector spaces
    val gDefault = new Graft(spark, work, frameShape = Some(Graft.frameShapeOf(corpus(2))))
    assert(IndexStore.load(spark, store, gDefault.meta).isEmpty)
    val store2 = Files.createTempDirectory("graft_embseam_store2").toString + "/store"
    assert(gDefault.incrementalUpdate(store2).head().getAs[Long]("n_added") == 3)
  }

  test("a misbehaving model fails AT the boundary: dropped inputs and wrong dims are errors") {
    // a wrapper that silently drops empty strings (common embedding-API
    // behavior) must error with the contract named, not throw an opaque
    // index error mid-task or land short batches
    val e1 = intercept[Exception](new DropperEmbedder()
      .embedFrame(Seq(("", 1), ("x", 2)).toDF("txt", "k"), "txt", "emb").collect())
    assert(e1.getMessage.contains("one vector per input"))
    // a model serving a different dimensionality than declared must fail
    // before mismatched vectors can land in a store
    val e2 = intercept[Exception](new WrongDimEmbedder()
      .embedFrame(Seq(("x", 1)).toDF("txt", "k"), "txt", "emb").collect())
    assert(e2.getMessage.contains("expected 8"))
  }

  test("embedder/facade dim mismatch is an error, not a silent re-space") {
    intercept[IllegalArgumentException] {
      new Graft(spark, sf, dim = 64, embedderOpt = Some(new ReversedEmbedder(32)))
    }
  }
}
