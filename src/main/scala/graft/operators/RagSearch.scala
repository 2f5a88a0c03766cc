package graft.operators

import graft.Tables
import graft.functions.Vec
import graft.plans.VecExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantic search — the Spark re-expression of the reference's `rag_query`
  * (reference: src/index.ts:260-284): score every chunk vector against the
  * query embedding by cosine, sort desc, take k, join back the snippet
  * metadata.
  *
  * Scale design: the query side is always tiny (1..q vectors) and broadcast;
  * the corpus scan is embarrassingly parallel; top-k is per-partition partial
  * top-k merged once (`orderBy.limit` plans as TakeOrderedAndProject — no
  * global sort). C2 (`annLsh`) adds the 100 TB path: bucket by deterministic
  * hyperplane signs so each probe touches one bucket, and the bucket id is
  * the shuffle/cluster key.
  */
object RagSearch {

  /** A3: top-10 chunks for a single query vector (vec_id 0 plays the role of
    * the embedded query string), with snippet metadata joined from
    * `documents` — mirrors the reference result shape
    * (path→source, score, snippet, fileSize→n_chars).
    */
  def ragTopK(spark: SparkSession, sfDir: String, queryId: Long = 0L, k: Int = 10): DataFrame = {
    VecExprs.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") === queryId).select(col("embedding").as("qv"))
    val d = Tables.documents(spark, sfDir)
    val scored = e.crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(VecExprs.cosineSim(col("embedding"), col("qv")), 4).as("score"))
    scored.join(d, scored("vec_id") === d("doc_id"))
      .select(col("vec_id"), col("score"), col("source"),
        substring(col("text"), 1, 80).as("snippet"), col("n_chars").as("file_size"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** C1: brute-force batch ANN — top-5 neighbors for each of the first 10
    * vectors. Rank over rounded scores so ordering is reproducible in the
    * oracle; self-matches excluded.
    */
  def annTopKBatch(spark: SparkSession, sfDir: String,
                   nQueries: Int = 10, k: Int = 5): DataFrame = {
    VecExprs.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(VecExprs.cosineSim(col("embedding"), col("qv")), 4).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("score"))
      .orderBy("query_id", "rank")
  }

  /** C1w (r12): the C1 brute-force batch ANN re-run in a LEARNED vector
    * space — MLlib Word2Vec trained on the documents corpus itself through
    * the [[graft.Embedder]] seam (the reference's whole point is a trained
    * space, reference: src/embeddings.ts:7,62-67; this is the public,
    * no-download equivalent). Training is corpus-parallel by default
    * (`trainPartitions=0` → `spark.defaultParallelism` skip-gram shards —
    * the 100 TB shape); the learned weights are not SQL-expressible, so
    * this is a declared rows-only query; the recall/identity/serving
    * receipts live in Word2VecEmbedderSpec. Parallel float merges make the
    * exact weights run-dependent — safe here (shape-only contract) and
    * safe for stores (the fingerprint gates reuse); pass
    * `trainPartitions=1` where a bit-stable result is itself under test.
    * Scale shape: training is one MLlib fit (vocabulary-bounded driver
    * state), embedding is the batched mapPartitions seam, scoring is the
    * same broadcast-queries pattern as C1.
    */
  def ragTopKW2v(spark: SparkSession, sfDir: String,
                 nQueries: Int = 5, k: Int = 5,
                 trainPartitions: Int = 0): DataFrame = {
    VecExprs.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val w2v = graft.Word2VecEmbedder.train(spark, docs,
      dim = 32, minCount = 2, maxIter = 1, numPartitions = trainPartitions)
    val e = w2v.embedFrame(docs.select("doc_id", "text"), "text", "embedding")
      .select(col("doc_id").as("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(VecExprs.cosineSim(col("embedding"), col("qv")), 4).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("score"))
      .orderBy("query_id", "rank")
  }

  /** C1t: C1's top-k on a TRANSFORMER-encoded space ([[graft.TransformerEmbedder]]
    * — the from-scratch encoder forward pass: multi-head self-attention +
    * FFN + mean-pool, the reference's actual inference shape, reference:
    * src/embeddings.ts:26-67). Weights are the deterministic seeded
    * stand-in (no checkpoint downloads here), so the QUERY is run-stable
    * end-to-end — but a forward pass is not SQL-expressible, so declared
    * rows-only; the determinism/position-awareness/identity-gating/serving
    * receipts live in TransformerEmbedderSpec. Scale shape: zero training,
    * per-executor weight materialization (nothing ships), batched
    * mapPartitions inference with the O(L²·d + L·d²) per-text cost a
    * 100 TB embed stage budgets for, then the C1 broadcast-queries scoring.
    */
  def ragTopKTx(spark: SparkSession, sfDir: String,
                nQueries: Int = 5, k: Int = 5): DataFrame = {
    VecExprs.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val tx = graft.TransformerEmbedder.seeded(spark)
    val e = tx.embedFrame(docs.select("doc_id", "text"), "text", "embedding")
      .select(col("doc_id").as("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(VecExprs.cosineSim(col("embedding"), col("qv")), 4).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("score"))
      .orderBy("query_id", "rank")
  }

  /** C2: LSH-bucketed ANN — 6 deterministic hyperplanes → 64 buckets;
    * candidates = same bucket as the query; exact cosine rerank within the
    * bucket. The bucket id is the join key, so at scale this is a
    * co-partitioned join over bounded candidate sets instead of a full scan
    * per query (the n² → n·(n/buckets) reduction the reference's README
    * defers to "ANN acceleration").
    */
  def annLsh(spark: SparkSession, sfDir: String,
             nQueries: Int = 10, k: Int = 5, planes: Int = 6, dim: Int = 64): DataFrame = {
    VecExprs.register(spark)
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("bucket", VecExprs.lshBucket(col("embedding"), planes))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("bucket").as("qbucket"))
    val scored = e.join(broadcast(q), col("bucket") === col("qbucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("bucket"),
        round(VecExprs.cosineSim(col("embedding"), col("qv")), 4).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("bucket"), col("score"))
      .orderBy("query_id", "rank")
  }

  /** C1f: FILTERED batch ANN — the brute-force correctness anchor for
    * metadata-predicate vector search (the "only docs in source X / label
    * Y" shape every real RAG deployment needs): top-k cosine per query
    * restricted to corpus vectors satisfying the predicate. The filter is
    * applied scan-side (translatable predicates push to the parquet
    * source), queries stay broadcast, and
    * the ranking is the same bounded per-query window as C1 — so the whole
    * plan is "pruned scan + broadcast join + partial top-k" at any scale.
    * Fully oracle-checked (the predicate is plain SQL); the SERVED scale
    * path is [[AnnIvf.annIvfServedOver]]'s `filter` arm, spec-proven
    * row-identical to serving a pre-filtered index.
    */
  def annTopKFiltered(spark: SparkSession, sfDir: String,
                      nQueries: Int = 10, k: Int = 5): DataFrame = {
    VecExprs.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = e.filter(col("label") % 4 === 1) // the metadata predicate
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        round(VecExprs.cosineSim(col("embedding"), col("qv")), 4).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("label"), col("score"))
      .orderBy("query_id", "rank")
  }

  /** C4: int8 vector quantization — per-vector symmetric scale
    * `q = round(127·x/maxabs)` — the 4× memory/IO reduction that makes a
    * 100 TB embedding corpus servable; dequantization error is bounded by
    * scale/254 per component. Exploded to scalar rows for oracle parity.
    */
  def embedQuantize(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("maxabs", array_max(transform(col("emb"), x => abs(x))))
    e.select(col("vec_id"), round(col("maxabs") + lit(1e-9), 6).as("scale"),
        posexplode(transform(col("emb"),
          x => when(col("maxabs") > 0, round(x * 127.0 / col("maxabs") + lit(1e-9)))
            .otherwise(lit(0.0)).cast("long"))).as(Seq("dim_idx", "qval")))
      .select(col("vec_id"), col("dim_idx").cast("long").as("dim_idx"),
        col("qval"), col("scale"))
      .orderBy("vec_id", "dim_idx")
  }

  /** A2: chunk → embed pipeline, exploded to scalar rows
    * `(doc_id, chunk_idx, dim_idx, value)` so the oracle compare stays on
    * scalar columns. Embeddings via the [[graft.Embedder]] seam — the
    * default is the codegen'd deterministic HashEmbed, which is what keeps
    * this entry under the DuckDB oracle gate.
    */
  def embedChunks(spark: SparkSession, sfDir: String,
                  size: Int = 100, overlap: Int = 20, dim: Int = 64,
                  embedder: Option[graft.Embedder] = None): DataFrame = {
    VecExprs.register(spark)
    embedder.getOrElse(graft.HashEmbedder(dim))
      .embedFrame(Chunker.chunkDocs(spark, sfDir, size, overlap), "chunk_text", "emb")
      .select(col("doc_id"), col("chunk_idx"),
        posexplode(col("emb")).as(Seq("dim_idx", "value")))
      .select(col("doc_id"), col("chunk_idx"), col("dim_idx").cast("long").as("dim_idx"),
        (round(col("value"), 4) + lit(0.0)).as("value"))
      .orderBy("doc_id", "chunk_idx", "dim_idx")
  }
}
