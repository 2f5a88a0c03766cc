package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Receipts for the transformer-encoder embedder — the reference's actual
  * inference shape (encode → mean-pool → normalize) as a from-scratch
  * forward pass behind the [[Embedder]] seam, with deterministic seeded
  * weights standing in for a checkpoint this sandbox cannot download:
  *
  *   (a) bit-exact determinism across instances, batch shapes, and the
  *       driver/executor boundary (StrictMath + fixed loop order);
  *   (b) POSITION-awareness — the property no bag-of-words pooling
  *       (hash, Word2Vec mean-pool) can have;
  *   (c) the weight bundle persists/reloads with its content identity,
  *       and identity gates warm stores exactly like every other model;
  *   (d) end-to-end facade serving (build → ragQueryAnn) on the space.
  */
class TransformerEmbedderSpec extends SparkSpecBase {
  import spark.implicits._

  test("(a) deterministic: same arch+seed → same identity and bit-identical vectors; contract corners") {
    val e1 = TransformerEmbedder.seeded(spark, dim = 16, layers = 2, heads = 4, seed = 7L)
    val e2 = TransformerEmbedder.seeded(spark, dim = 16, layers = 2, heads = 4, seed = 7L)
    assert(e1.name == e2.name, "same config must fingerprint identically")
    assert(e1.embedText("spark shuffle partition").toSeq ==
      e2.embedText("spark shuffle partition").toSeq)
    // a different seed is a DIFFERENT model: different identity, different space
    val e3 = TransformerEmbedder.seeded(spark, dim = 16, layers = 2, heads = 4, seed = 8L)
    assert(e3.name != e1.name)
    assert(e3.embedText("spark shuffle partition").toSeq !=
      e1.embedText("spark shuffle partition").toSeq)
    // contract corners: empty / whitespace-only → zero vector; otherwise unit norm
    assert(e1.embedText("").forall(_ == 0.0))
    assert(e1.embedText("   ").forall(_ == 0.0))
    val n = math.sqrt(e1.embedText("hello world").map(x => x * x).sum)
    assert(math.abs(n - 1.0) < 1e-9, s"norm=$n")
    // truncation: texts identical through maxLen tokens embed identically
    val words = (0 until 60).map(i => s"w$i").mkString(" ")
    val eTrunc = TransformerEmbedder.seeded(spark, dim = 16, maxLen = 48, seed = 7L)
    assert(eTrunc.embedText(words).toSeq ==
      eTrunc.embedText(words + " tail beyond the window").toSeq,
      "tokens past maxLen must not change the encoding")
  }

  test("(b) the encoding is position-aware: token order changes the vector (bag-of-words cannot)") {
    val tx = TransformerEmbedder.seeded(spark, dim = 16, seed = 7L)
    val ab = tx.embedText("alpha beta").toSeq
    val ba = tx.embedText("beta alpha").toSeq
    assert(ab != ba, "a transformer encode must distinguish token order")
    // the CONTROL: Word2Vec-style mean pooling is order-invariant by
    // construction — position-awareness is what the forward pass adds
    val w2v = Word2VecEmbedder.train(spark,
      Seq((0L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      dim = 16, numPartitions = 1)
    assert(w2v.embedText("alpha beta").toSeq == w2v.embedText("beta alpha").toSeq)
    // and context MIXES: the same word in different company encodes
    // differently (self-attention, not a per-token lookup)
    def headDiff(a: Seq[Double], b: Seq[Double]) = a != b
    assert(headDiff(tx.embedText("alpha beta").toSeq, tx.embedText("alpha gamma").toSeq))
  }

  test("(a2) batch-shape invariance: embedFrame equals embedText row-by-row under any partitioning/batch size") {
    val docs = (0L until 40L)
      .map(i => (i, if (i % 7 == 0) null else s"doc $i body token${i % 5} token${i % 3}"))
      .toDF("doc_id", "text")
    val tx = TransformerEmbedder.seeded(spark, dim = 16, seed = 7L)
    val small = new TransformerEmbedderBatch2(tx) // batchSize = 2
    for (e <- Seq(tx, small); parts <- Seq(1, 7)) {
      val got = e.embedFrame(docs.repartition(parts), "text", "emb")
        .select("doc_id", "emb").collect()
        .map(r => r.getLong(0) -> Option(r.getSeq[Double](1)).map(_.toSeq)).toMap
      for ((id, t) <- docs.collect().map(r => r.getLong(0) -> Option(r.getString(1)))) {
        val want = t.map(s => e.embedText(s).toSeq)
        assert(got(id) == want, s"doc $id under parts=$parts batch=${e.batchSize}")
      }
    }
  }

  test("(c) save/load: the reloaded bundle carries the same identity and function; drift gates stores") {
    val tx = TransformerEmbedder.seeded(spark, dim = 16, seed = 7L)
    val path = Files.createTempDirectory("graft_tx_model").toString + "/model"
    TransformerEmbedder.save(spark, tx, path)
    val re = TransformerEmbedder.load(spark, path)
    assert(re.name == tx.name, "a reloaded bundle must carry the saved fingerprint")
    assert(re.dim == tx.dim && re.layers == tx.layers && re.heads == tx.heads &&
      re.vocab == tx.vocab && re.maxLen == tx.maxLen)
    assert(re.embedText("spark shuffle").toSeq == tx.embedText("spark shuffle").toSeq)
    // identity gating end-to-end: a store built under one seed refuses a
    // facade holding another (rebuild, never a mixed space)
    val docs = (0L until 30L).map(i => (i, s"text body $i token${i % 4}")).toDF("doc_id", "text")
    val work = Files.createTempDirectory("graft_tx_work").toString
    val store = Files.createTempDirectory("graft_tx_store").toString + "/store"
    val g = Graft.forFrame(spark, docs, work, dim = 16, embedder = Some(tx))
    assert(g.modelName.startsWith("graft-tx-v1-d16-"))
    g.incrementalUpdate(store)
    assert(IndexStore.load(spark, store, g.meta).isDefined)
    val gRe = Graft.forFrame(spark, docs,
      Files.createTempDirectory("graft_tx_work2").toString, dim = 16, embedder = Some(re))
    assert(IndexStore.load(spark, store, gRe.meta).isDefined,
      "the reloaded artifact must warm-reuse the store")
    val gDrift = Graft.forFrame(spark, docs,
      Files.createTempDirectory("graft_tx_work3").toString, dim = 16,
      embedder = Some(TransformerEmbedder.seeded(spark, dim = 16, seed = 8L)))
    assert(IndexStore.load(spark, store, gDrift.meta).isEmpty,
      "a different weight fingerprint must refuse the warm store")
  }

  test("(c2) checkpoint converter: hand-built non-seeded tensors convert, persist, reload, and serve") {
    val (dim, layers, heads, vocab) = (16, 2, 4, 512)
    // a "converted checkpoint": values from an EXTERNAL generator (plain
    // java.util.Random — nothing the seeded path could produce), standing
    // in for a real export's renamed+flattened float32 tensors
    val rnd = new java.util.Random(20260814L)
    val tensors = TransformerEmbedder.expectedTensors(dim, layers, heads, vocab)
      .map { case (k, n) =>
        k -> Array.fill(n)((rnd.nextFloat() - 0.5f) * 0.2f)
      }
    // schema validation fails BY NAME at convert time
    val noEmb = intercept[IllegalArgumentException] {
      TransformerEmbedder.fromTensors(spark, tensors - "emb", dim, layers, heads, vocab)
    }
    assert(noEmb.getMessage.contains("missing=[emb]"))
    val badLen = intercept[IllegalArgumentException] {
      TransformerEmbedder.fromTensors(spark,
        tensors + ("l0.wq" -> new Array[Float](3)), dim, layers, heads, vocab)
    }
    assert(badLen.getMessage.contains("l0.wq") && badLen.getMessage.contains("3"))
    val extra = intercept[IllegalArgumentException] {
      TransformerEmbedder.fromTensors(spark,
        tensors + ("pos" -> new Array[Float](4)), dim, layers, heads, vocab)
    }
    assert(extra.getMessage.contains("unexpected=[pos]"))
    // the conversion itself: bundle → save → load carries ONE identity
    val tx = TransformerEmbedder.fromTensors(spark, tensors, dim, layers, heads, vocab)
    val path = Files.createTempDirectory("graft_tx_conv").toString + "/model"
    TransformerEmbedder.save(spark, tx, path)
    val re = TransformerEmbedder.load(spark, path)
    assert(re.name == tx.name,
      "the reloaded converted bundle must carry the converted fingerprint")
    assert(re.embedText("spark shuffle").toSeq == tx.embedText("spark shuffle").toSeq)
    // a converted model is a DIFFERENT space than any seeded one — the
    // identity gate separates them (artifact swap rebuilds, never mixes)
    val seeded = TransformerEmbedder.seeded(spark, dim = dim, seed = 7L)
    assert(tx.name != seeded.name)
    assert(tx.embedText("spark shuffle").toSeq != seeded.embedText("spark shuffle").toSeq)
    // load → SERVE: the facade runs end-to-end on the converted weights
    val docs = (0L until 30L).map(i => (i, s"text body $i token${i % 4}")).toDF("doc_id", "text")
    val g = Graft.forFrame(spark, docs,
      Files.createTempDirectory("graft_tx_conv_work").toString,
      dim = dim, embedder = Some(re))
    val hits = g.ragQuery("text body 3 token3", topK = 3).collect()
    assert(hits.length == 3)
    assert(hits.head.getAs[Long]("doc_id") == 3L,
      "exact text must self-match under the converted weights")
  }

  test("(c3) word2vec-initialized bundle: convert -> save -> load -> facade-serve, identity gates on the w2v content") {
    val docs = (0L until 40L).map(i =>
      (i, s"alpha$i beta${i % 5} gamma${i % 3} shared corpus tokens")).toDF("doc_id", "text")
    // bit-stable training (numPartitions=1) so identity claims are exact
    val w2v = Word2VecEmbedder.train(spark, docs, dim = 16,
      minCount = 1, maxIter = 1, numPartitions = 1)
    val tx = TransformerEmbedder.word2vecInitialized(spark, w2v, vocab = 512)
    val tx2 = TransformerEmbedder.word2vecInitialized(spark, w2v, vocab = 512)
    // deterministic conversion: same w2v content -> same fingerprint
    assert(tx.name == tx2.name)
    // a DIFFERENT space than the bare seeded stack (the emb table moved)
    val seeded = TransformerEmbedder.seeded(spark, dim = 16, vocab = 512)
    assert(tx.name != seeded.name)
    assert(tx.embedText("shared corpus tokens").toSeq !=
      seeded.embedText("shared corpus tokens").toSeq)
    // a RETRAINED w2v (different corpus) is a different identity — stores
    // gate on the w2v content through the converted fingerprint
    val w2vB = Word2VecEmbedder.train(spark,
      docs.withColumn("text", concat(col("text"), lit(" extra"))),
      dim = 16, minCount = 1, maxIter = 1, numPartitions = 1)
    assert(TransformerEmbedder.word2vecInitialized(spark, w2vB, vocab = 512).name != tx.name)
    // persist/reload carries the identity; the facade serves end-to-end
    val path = Files.createTempDirectory("graft_tx_w2v").toString + "/model"
    TransformerEmbedder.save(spark, tx, path)
    val re = TransformerEmbedder.load(spark, path)
    assert(re.name == tx.name)
    assert(re.embedText("alpha7 beta2").toSeq == tx.embedText("alpha7 beta2").toSeq)
    val g = Graft.forFrame(spark, docs,
      Files.createTempDirectory("graft_tx_w2v_work").toString,
      dim = 16, embedder = Some(re))
    val hits = g.ragQuery("alpha3 beta3 gamma0 shared corpus tokens", topK = 3).collect()
    assert(hits.length == 3)
    assert(hits.head.getAs[Long]("doc_id") == 3L,
      "exact text must self-match under the w2v-initialized weights")
  }

  test("(d) end-to-end: ragQueryAnn serves on the transformer space; driver query shape + determinism") {
    val docs = (0L until 30L).map(i => (i, s"text body $i token${i % 4}")).toDF("doc_id", "text")
    val tx = TransformerEmbedder.seeded(spark, dim = 16, seed = 7L)
    val work = Files.createTempDirectory("graft_tx_e2e").toString
    val store = Files.createTempDirectory("graft_tx_e2estore").toString + "/store"
    val g = Graft.forFrame(spark, docs, work, dim = 16, embedder = Some(tx))
    g.incrementalUpdate(store)
    val hits = g.ragQueryAnn("text body 3 token3", topK = 5, nprobe = 4).collect()
    assert(hits.length == 5)
    // the query's own text must be its best match (exact encode match)
    assert(hits.head.getAs[Long]("doc_id") == 3L,
      s"self text must rank first: ${hits.map(_.getAs[Long]("doc_id")).mkString(",")}")
    // driver query: C1's shape on the transformer space, run-stable
    val out = operators.RagSearch.ragTopKTx(spark, sf).collect()
    assert(out.map(_.getLong(0)).distinct.sorted.toSeq == (0L until 5L).toSeq)
    for ((q, rows) <- out.groupBy(_.getLong(0))) {
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 5L).toSeq, s"query $q ranks")
      assert(rows.forall(r => r.getDouble(3) >= -1.0001 && r.getDouble(3) <= 1.0001))
      assert(rows.forall(_.getLong(2) != q), "self-match must be excluded")
    }
    val again = operators.RagSearch.ragTopKTx(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "seeded weights + strict math ⇒ the whole query is run-stable")
  }

  test("(e) session-backed inference runs in STRUCTURED STREAMING: streamed index equals batch") {
    // the BatchEmbedder doc claims mapPartitions inference is legal under
    // append mode — this is the claim exercised with a real forward pass:
    // the streamed chunk index carries bit-identical vectors to the batch
    // build through the same seam (per-JVM weight materialization and all)
    val tx = TransformerEmbedder.seeded(spark, dim = 16, seed = 7L)
    val out = Files.createTempDirectory("graft_tx_stream").toString + "/idx"
    val streamed = graft.streaming.IndexStream.runToParquet(spark, sf, out,
      embedder = Some(tx))
    val batch = tx.embedFrame(
      operators.Chunker.indexBuild(spark, sf, 100, 20), "chunk_text", "emb")
    val je = streamed.select(col("doc_id"), col("chunk_idx"), col("emb").as("s_emb"))
      .join(batch.select(col("doc_id"), col("chunk_idx"), col("emb").as("b_emb")),
        Seq("doc_id", "chunk_idx"))
    assert(je.count() == batch.count(), "streamed index must cover every batch chunk")
    assert(je.filter(col("s_emb") =!= col("b_emb")).count() == 0,
      "streaming and batch inference must produce bit-identical vectors")
  }
}

/** batchSize-override wrapper for the batch-shape invariance receipt. */
class TransformerEmbedderBatch2(inner: TransformerEmbedder) extends BatchEmbedder {
  override def batchSize: Int = 2
  def name: String = inner.name
  def dim: Int = inner.dim
  def embedBatch(texts: Array[String]): Array[Array[Double]] = inner.embedBatch(texts)
}
