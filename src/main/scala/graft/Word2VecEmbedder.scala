package graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.ml.feature.Word2Vec
import org.apache.spark.ml.linalg.{Vector => MlVector}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A REAL learned embedding model behind the [[Embedder]] seam: Spark
  * MLlib Word2Vec trained on the corpus itself (public algorithm, no
  * downloads), mean-pooled + L2-normalized per document — the same
  * pooling the reference applies to its transformer token embeddings
  * (reference: src/embeddings.ts:62-67, mean-pool then normalize).
  *
  * This is the seam's proof piece: every prior vector in the project was
  * hash-derived, while ANN recall/cluster behavior only means something
  * on a TRAINED space where co-occurring words land near each other. The
  * model rides the standard session-backed [[BatchEmbedder]] shape:
  *
  *   - the trained word table is held in a `Broadcast[Map[word,vec]]` —
  *     one copy per executor, not one per task closure; at 100 TB the
  *     table stays vocabulary-bounded (`minCount` prunes the tail), which
  *     is the classical word2vec serving shape;
  *   - `embedBatch` is pure lookup+mean — executor-side, no session;
  *   - `name` carries a CONTENT fingerprint of the trained table, so two
  *     facades only share stores when they share the exact model: a
  *     retrain on changed data reads as a metadata mismatch and rebuilds
  *     (the identity contract every index manifest enforces).
  *
  * Training parallelism vs determinism: training is one MLlib fit over
  * the tokenized corpus, corpus-parallel by default (`numPartitions`
  * defaults to `spark.defaultParallelism` — each partition trains a
  * skip-gram shard, shards are merged per word). Parallel merges sum
  * floats in task-completion order, so a parallel retrain may land on a
  * DIFFERENT fingerprint for the same inputs — which is SAFE by design:
  * the fingerprint gates store reuse, so a drifted identity reads as a
  * metadata mismatch and costs one index rebuild, never a mixed vector
  * space (Word2VecEmbedderSpec pins that contract). Deployments avoid
  * even that rebuild by persisting the trained artifact ([[Word2VecEmbedder.save]])
  * and reLOADing it at startup — a loaded table is bit-identical, so the
  * fingerprint and every warm store survive restarts; retrain-at-startup
  * is the anti-pattern, not the protocol. Pass `numPartitions=1` only
  * where a stable fingerprint is itself the thing under test (the
  * determinism specs do). `getVectors` is a
  * vocabulary-bounded driver materialization (the same bound the
  * broadcast needs anyway).
  *
  * Tokenization matches [[functions.Text.tokens]] (single-space split,
  * empties dropped) on BOTH sides — corpus rows executor-side and query
  * strings driver-side embed identically, the seam's core contract.
  */
final class Word2VecEmbedder private (
    val dim: Int,
    fingerprint: String,
    table: Broadcast[Map[String, Array[Float]]]) extends BatchEmbedder {

  def name: String = s"graft-word2vec-v1-d$dim-$fingerprint"

  /** Vocabulary actually learned (minCount survivors). */
  def vocabSize: Int = table.value.size

  /** The learned table, for persistence ([[Word2VecEmbedder.save]]). */
  private[graft] def tableSnapshot: Map[String, Array[Float]] = table.value

  def embedBatch(texts: Array[String]): Array[Array[Double]] = {
    val t = table.value
    texts.map { s =>
      val acc = new Array[Double](dim)
      var n = 0
      for (w <- s.split(' ') if w.nonEmpty; v <- t.get(w)) {
        var i = 0
        while (i < dim) { acc(i) += v(i); i += 1 }
        n += 1
      }
      if (n > 0) {
        var i = 0
        while (i < dim) { acc(i) /= n; i += 1 }
        var ss = 0.0
        i = 0
        while (i < dim) { ss += acc(i) * acc(i); i += 1 }
        val inv = if (ss > 0) 1.0 / math.sqrt(ss) else 0.0
        i = 0
        while (i < dim) { acc(i) *= inv; i += 1 }
      }
      // empty / all-OOV text → zero vector (cosine 0 against everything:
      // ranked last, never NaN)
      acc
    }
  }
}

object Word2VecEmbedder {

  /** Train on a documents frame's `textCol`. One MLlib fit; the learned
    * word table is collected (vocabulary-bounded), fingerprinted, and
    * broadcast. `minCount` is the vocab/scale knob: at corpus scale raise
    * it so the broadcast table stays executor-memory-bounded.
    * `numPartitions <= 0` (the default) trains corpus-parallel on
    * `spark.defaultParallelism` partitions — the 100 TB shape; pass 1
    * only when a run-stable fingerprint is required (see class doc).
    */
  def train(spark: SparkSession, docs: DataFrame, textCol: String = "text",
            dim: Int = 64, minCount: Int = 1, maxIter: Int = 1,
            seed: Long = 42L, numPartitions: Int = 0): Word2VecEmbedder = {
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val toks = docs
      .select(functions.Text.tokens(coalesce(col(textCol), lit(""))).as("toks"))
      .filter(size(col("toks")) > 0)
    val model = new Word2Vec()
      .setInputCol("toks").setOutputCol("v")
      .setVectorSize(dim).setMinCount(minCount)
      .setMaxIter(maxIter).setSeed(seed)
      .setNumPartitions(parts)
      .fit(toks)
    // vocabulary-bounded driver materialization — the broadcast needs the
    // full table driver-side once regardless
    val rows = model.getVectors.collect()
    val table = rows.map { r =>
      r.getString(0) -> r.getAs[MlVector](1).toArray.map(_.toFloat)
    }.toMap
    fromTable(spark, dim, table)
  }

  private def fromTable(spark: SparkSession, dim: Int,
                        table: Map[String, Array[Float]]): Word2VecEmbedder =
    new Word2VecEmbedder(dim, fingerprintOf(table),
      spark.sparkContext.broadcast(table))

  /** Content fingerprint: order-independent (sorted words), float-bit
    * exact — the model identity that gates store compatibility. Shared by
    * [[train]] and [[load]] so a reloaded table carries the SAME identity
    * it trained with.
    */
  private def fingerprintOf(table: Map[String, Array[Float]]): String = {
    var h = 1125899906842597L
    for (w <- table.keys.toArray.sorted) {
      h = h * 31 + w.hashCode
      val v = table(w)
      var i = 0
      while (i < v.length) { h = h * 31 + java.lang.Float.floatToIntBits(v(i)); i += 1 }
    }
    java.lang.Long.toHexString(h)
  }

  /** Persist the trained word table as a tiny (word, vec) parquet — the
    * model artifact a deployment trains once and SHIPS. This is what
    * makes parallel training's fingerprint nondeterminism operationally
    * free: a restart [[load]]s the artifact (bit-identical table → the
    * SAME fingerprint → every warm store stays valid) instead of
    * retraining, so the rebuild cost of a drifted identity is paid only
    * when someone deliberately retrains on new data.
    */
  def save(spark: SparkSession, e: Word2VecEmbedder, path: String): Unit = {
    import spark.implicits._
    e.tableSnapshot.toSeq.map { case (w, v) => (w, v.toSeq) }
      .toDF("word", "vec")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[save]]d table; the fingerprint is recomputed from content,
    * so it equals the saved model's (spec-pinned).
    */
  def load(spark: SparkSession, path: String): Word2VecEmbedder = {
    val rows = spark.read.parquet(path).select("word", "vec").collect()
    val table = rows.map { r =>
      r.getString(0) -> r.getSeq[Float](1).toArray
    }.toMap
    require(table.nonEmpty, s"Word2VecEmbedder.load: empty table at $path")
    fromTable(spark, table.head._2.length, table)
  }
}
