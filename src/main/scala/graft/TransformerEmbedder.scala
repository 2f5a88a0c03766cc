package graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession

/** A transformer-ENCODER forward pass behind the [[Embedder]] seam — the
  * inference shape of the reference's embedding model (reference:
  * src/embeddings.ts:26-67 — transformer encode, mean-pool over tokens,
  * L2-normalize), implemented from scratch on the public architecture
  * (Vaswani et al. 2017, arXiv:1706.03762): token + sinusoidal-position
  * embeddings → N × (multi-head self-attention → add&norm → GELU FFN →
  * add&norm) → mean-pool → L2-normalize.
  *
  * This sandbox cannot download a trained checkpoint, so the default
  * weights are a DETERMINISTIC seeded initialization ([[TransformerEmbedder.seeded]])
  * — but everything that makes transformer inference a distinct Spark
  * problem is real and exercised:
  *
  *   - weights live OUTSIDE the task closure, materialized once per JVM
  *     (`@transient lazy val` — the session-per-executor shape a real ONNX/
  *     JNI model needs; for the seeded path they are re-derived from the
  *     tiny config, so nothing ships at all);
  *   - inference is batched `mapPartitions` via [[BatchEmbedder]] — the
  *     unit a real model amortizes over;
  *   - the forward pass is O(L²·d) attention + O(L·d²) projections per
  *     text — the true cost model a 100 TB embed stage budgets for;
  *   - `name` carries a CONTENT fingerprint of the weight tensors, so the
  *     index manifests gate store reuse exactly as with any other model:
  *     different weights → different identity → rebuild, never a mixed
  *     vector space;
  *   - [[TransformerEmbedder.save]]/[[TransformerEmbedder.load]] persist /
  *     reload the full weight bundle as parquet with the identity
  *     preserved — loading a REAL converted checkpoint is a pure artifact
  *     swap, no operator changes (the same restart protocol the Word2Vec
  *     embedder pins).
  *
  * Determinism is bit-exact across JVMs and platforms: all transcendental
  * math goes through `StrictMath`, and every loop runs in a fixed
  * sequential order — so `embedText` (driver) and `embedFrame` (executors)
  * compute the same function, the seam's core contract.
  *
  * Unlike the mean-pooled Word2Vec space, this space is POSITION-AWARE
  * ("a b" and "b a" embed differently) — the property that distinguishes a
  * transformer encode from any bag-of-words pooling, spec-pinned.
  *
  * Tokenization is the hashing-vocabulary shape (word → id via FNV-1a mod
  * V): training-free and deterministic. A real checkpoint swap would pair
  * [[load]] with the matching subword tokenizer (functions.Bpe /
  * functions.Unigram supply both trained shapes in-repo).
  */
final class TransformerEmbedder private (
    val dim: Int, val layers: Int, val heads: Int,
    val vocab: Int, val maxLen: Int,
    fingerprint: String,
    seedOpt: Option[Long],
    explicitW: Option[Broadcast[Map[String, Array[Float]]]]) extends BatchEmbedder {
  import TransformerEmbedder._

  require(dim % heads == 0, s"dim $dim must be divisible by heads $heads")

  def name: String = s"graft-tx-v1-d$dim-L$layers-h$heads-V$vocab-m$maxLen-$fingerprint"

  /** Weight tensors, one materialization per JVM: broadcast-backed when
    * loaded from an artifact, re-derived from the config when seeded (the
    * cheapest possible "session open" — nothing ships in the closure).
    */
  @transient private lazy val W: Map[String, Array[Float]] =
    explicitW.map(_.value).getOrElse(
      seededWeights(dim, layers, heads, vocab, seedOpt.get))

  /** The weight bundle, for persistence ([[TransformerEmbedder.save]]). */
  private[graft] def weightSnapshot: Map[String, Array[Float]] = W

  def embedBatch(texts: Array[String]): Array[Array[Double]] =
    texts.map { s =>
      val toks = tokenIds(s)
      if (toks.isEmpty) new Array[Double](dim) // empty/whitespace → zero
      else forwardPooled(toks)
    }

  private[graft] def tokenIds(s: String): Array[Int] = {
    val words = s.split(' ')
    val out = new scala.collection.mutable.ArrayBuffer[Int](math.min(words.length, maxLen))
    var i = 0
    while (i < words.length && out.length < maxLen) {
      if (words(i).nonEmpty)
        out += java.lang.Math.floorMod(fnv1a(words(i)), vocab)
      i += 1
    }
    out.toArray
  }

  /** The encoder forward pass over one token sequence; returns the
    * mean-pooled, L2-normalized sentence vector. Package-private so the
    * [[CrossEncoder]] can run the SAME encoder over a joint
    * query‖SEP‖doc sequence — the cross-attention between the two
    * segments is what distinguishes a cross-encoder from two independent
    * encodes.
    */
  private[graft] def forwardPooled(toks: Array[Int]): Array[Double] = {
    val d = dim; val L = toks.length
    val x = encodeAll(toks)
    // mean-pool over positions, L2-normalize (reference pooling)
    val out = new Array[Double](d)
    var i = 0
    while (i < L * d) { out(i % d) += x(i); i += 1 }
    var ss = 0.0
    i = 0
    while (i < d) { out(i) /= L; ss += out(i) * out(i); i += 1 }
    val inv = if (ss > 0) 1.0 / StrictMath.sqrt(ss) else 0.0
    i = 0
    while (i < d) { out(i) *= inv; i += 1 }
    out
  }

  /** Per-TOKEN output vectors, each L2-normalized — the late-interaction
    * representation (ColBERT's MaxSim operates on these instead of one
    * pooled vector). Same encoder, no pooling; zero rows stay zero.
    */
  private[graft] def forwardTokenVecs(toks: Array[Int]): Array[Array[Double]] = {
    val d = dim; val L = toks.length
    val x = encodeAll(toks)
    Array.tabulate(L) { p =>
      val v = new Array[Double](d)
      var ss = 0.0
      var i = 0
      while (i < d) { v(i) = x(p * d + i); ss += v(i) * v(i); i += 1 }
      val inv = if (ss > 0) 1.0 / StrictMath.sqrt(ss) else 0.0
      i = 0
      while (i < d) { v(i) *= inv; i += 1 }
      v
    }
  }

  /** The encoder stack over one token sequence — the shared core of the
    * pooled, per-token, and cross-encoder paths. Returns the final-layer
    * L×d activations (row-major).
    */
  private def encodeAll(toks: Array[Int]): Array[Float] = {
    val d = dim; val L = toks.length; val dh = d / heads; val ffn = 4 * d
    // x = tokenEmbedding + sinusoidal position encoding
    var x = new Array[Float](L * d)
    val emb = W("emb")
    var p = 0
    while (p < L) {
      val off = toks(p) * d
      var i = 0
      while (i < d) {
        val angle = p / StrictMath.pow(10000.0, (2 * (i / 2)).toDouble / d)
        val pe = if (i % 2 == 0) StrictMath.sin(angle) else StrictMath.cos(angle)
        x(p * d + i) = emb(off + i) + pe.toFloat
        i += 1
      }
      p += 1
    }
    var l = 0
    while (l < layers) {
      // multi-head self-attention
      val q = matmul(x, W(s"l$l.wq"), L, d, d)
      val k = matmul(x, W(s"l$l.wk"), L, d, d)
      val v = matmul(x, W(s"l$l.wv"), L, d, d)
      val att = new Array[Float](L * d)
      val invSqrtDh = 1.0 / StrictMath.sqrt(dh.toDouble)
      var h = 0
      while (h < heads) {
        val hoff = h * dh
        var i = 0
        while (i < L) {
          // scores_i· = softmax(q_i · k_j / √dh) — max-subtracted for
          // numerical stability, StrictMath.exp for bit determinism
          val scores = new Array[Double](L)
          var mx = Double.NegativeInfinity
          var j = 0
          while (j < L) {
            var s = 0.0; var t = 0
            while (t < dh) { s += q(i * d + hoff + t).toDouble * k(j * d + hoff + t); t += 1 }
            s *= invSqrtDh
            scores(j) = s; if (s > mx) mx = s
            j += 1
          }
          var sum = 0.0
          j = 0
          while (j < L) { scores(j) = StrictMath.exp(scores(j) - mx); sum += scores(j); j += 1 }
          var t = 0
          while (t < dh) {
            var acc = 0.0
            j = 0
            while (j < L) { acc += scores(j) * v(j * d + hoff + t); j += 1 }
            att(i * d + hoff + t) = (acc / sum).toFloat
            t += 1
          }
          i += 1
        }
        h += 1
      }
      val o = matmul(att, W(s"l$l.wo"), L, d, d)
      addInPlace(o, x)
      layerNorm(o, L, d, W(s"l$l.ln1g"), W(s"l$l.ln1b"))
      // position-wise FFN with GELU
      val f1 = matmulBias(o, W(s"l$l.w1"), W(s"l$l.b1"), L, d, ffn)
      geluInPlace(f1)
      val f2 = matmulBias(f1, W(s"l$l.w2"), W(s"l$l.b2"), L, ffn, d)
      addInPlace(f2, o)
      layerNorm(f2, L, d, W(s"l$l.ln2g"), W(s"l$l.ln2b"))
      x = f2
      l += 1
    }
    x
  }
}

object TransformerEmbedder {

  /** Seeded deterministic weights — the sandbox stand-in for a trained
    * checkpoint. Same (arch, seed) → bit-identical weights on every JVM,
    * so nothing needs to ship; a different seed is a different model
    * identity end-to-end.
    */
  def seeded(spark: SparkSession, dim: Int = 32, layers: Int = 2,
             heads: Int = 4, vocab: Int = 2048, maxLen: Int = 48,
             seed: Long = 42L): TransformerEmbedder = {
    val w = seededWeights(dim, layers, heads, vocab, seed)
    new TransformerEmbedder(dim, layers, heads, vocab, maxLen,
      fingerprintOf(w), Some(seed), None)
  }

  /** Persist the weight bundle as (tensor, vec) parquet — the artifact a
    * deployment converts a real checkpoint into. Tiny: the default arch is
    * ~90k floats.
    */
  /** The CONVERTER CONTRACT — the exact tensor names and float counts a
    * weight bundle must carry for a `(dim, layers, heads, vocab)`
    * architecture. This is the schema a real checkpoint export
    * (safetensors / NumPy dump, float32) must be renamed and flattened
    * to, making the "pretrained model is a pure artifact swap" claim
    * executable the day weights are available:
    *
    *   - `emb` — token embedding table, `vocab × dim` row-major
    *     (row t = token id t's vector);
    *   - `l<i>.wq|wk|wv|wo` — the layer-i attention projections,
    *     `dim × dim` row-major as consumed by x·W (input index major);
    *   - `l<i>.w1`/`l<i>.b1` — FFN up-projection `dim × 4dim` + bias;
    *   - `l<i>.w2`/`l<i>.b2` — FFN down-projection `4dim × dim` + bias;
    *   - `l<i>.ln1g|ln1b|ln2g|ln2b` — the two layer-norms' scale/shift.
    *
    * Sinusoidal position encodings are computed, never stored; a
    * checkpoint with LEARNED positions folds them in upstream or extends
    * this schema. The matching trained subword tokenizer pairs via
    * [[graft.functions.Bpe]]/[[graft.functions.Unigram]] artifacts.
    */
  def expectedTensors(dim: Int, layers: Int, heads: Int, vocab: Int): Map[String, Int] = {
    val ffn = 4 * dim
    (Seq("emb" -> vocab * dim) ++ (0 until layers).flatMap { l => Seq(
      s"l$l.wq" -> dim * dim, s"l$l.wk" -> dim * dim,
      s"l$l.wv" -> dim * dim, s"l$l.wo" -> dim * dim,
      s"l$l.w1" -> dim * ffn, s"l$l.b1" -> ffn,
      s"l$l.w2" -> ffn * dim, s"l$l.b2" -> dim,
      s"l$l.ln1g" -> dim, s"l$l.ln1b" -> dim,
      s"l$l.ln2g" -> dim, s"l$l.ln2b" -> dim)
    }).toMap
  }

  /** The converter entry point: build an embedder from externally-sourced
    * tensors. Validates the COMPLETE [[expectedTensors]] schema — a
    * missing, extra, or mis-sized tensor is a named error at convert
    * time, never silent garbage embeddings at serve time. The returned
    * embedder carries a content fingerprint, so every store it builds is
    * identity-gated exactly like the seeded/loaded paths; pair with
    * [[save]] to persist the converted bundle.
    */
  def fromTensors(spark: SparkSession, tensors: Map[String, Array[Float]],
                  dim: Int, layers: Int, heads: Int, vocab: Int,
                  maxLen: Int = 64): TransformerEmbedder = {
    val want = expectedTensors(dim, layers, heads, vocab)
    val missing = (want.keySet -- tensors.keySet).toSeq.sorted
    val extra = (tensors.keySet -- want.keySet).toSeq.sorted
    require(missing.isEmpty && extra.isEmpty,
      s"fromTensors: bundle schema mismatch for d$dim/L$layers/V$vocab — " +
        s"missing=[${missing.mkString(",")}] unexpected=[${extra.mkString(",")}]")
    for ((k, n) <- want.toSeq.sorted)
      require(tensors(k).length == n,
        s"fromTensors: tensor '$k' has ${tensors(k).length} floats, expected $n")
    new TransformerEmbedder(dim, layers, heads, vocab, maxLen,
      fingerprintOf(tensors), None, Some(spark.sparkContext.broadcast(tensors)))
  }

  /** The one environment-unblocked move against the trained-weights gap
    * (checkpoint downloads are unavailable here): a weight bundle whose
    * TOKEN-EMBEDDING table comes from a corpus-trained Word2Vec model,
    * built through the exact [[fromTensors]] converter seam a real
    * checkpoint export would use — the attention/FFN stack stays the
    * seeded init. Each learned word's vector (L2-normalized, the scale
    * its own space pools at) lands at its FNV-1a-mod-V token id — the
    * SAME tokenization the encoder applies at inference, so a vocabulary
    * word reads its learned vector; words colliding on a token id
    * average (deterministically, sorted-word order); untouched rows keep
    * the seeded init as the OOV backoff. Identity is the content
    * fingerprint, so every store gates on both the w2v content and the
    * seed, like any other converted bundle.
    */
  def word2vecInitialized(spark: SparkSession, w2v: Word2VecEmbedder,
                          layers: Int = 2, heads: Int = 4, vocab: Int = 2048,
                          maxLen: Int = 48, seed: Long = 42L): TransformerEmbedder = {
    val dim = w2v.dim
    val tensors = seededWeights(dim, layers, heads, vocab, seed)
    val emb = tensors("emb").clone()
    val counts = new Array[Int](vocab)
    val sums = new Array[Float](vocab * dim)
    for ((word, vec) <- w2v.tableSnapshot.toSeq.sortBy(_._1)) {
      val id = java.lang.Math.floorMod(fnv1a(word), vocab)
      var ss = 0.0
      var i = 0
      while (i < dim) { ss += vec(i).toDouble * vec(i); i += 1 }
      val inv = if (ss > 0) 1.0 / StrictMath.sqrt(ss) else 0.0
      i = 0
      while (i < dim) { sums(id * dim + i) += (vec(i) * inv).toFloat; i += 1 }
      counts(id) += 1
    }
    var t = 0
    while (t < vocab) {
      if (counts(t) > 0) {
        var i = 0
        while (i < dim) { emb(t * dim + i) = sums(t * dim + i) / counts(t); i += 1 }
      }
      t += 1
    }
    fromTensors(spark, tensors.updated("emb", emb), dim, layers, heads, vocab, maxLen)
  }

  def save(spark: SparkSession, e: TransformerEmbedder, path: String): Unit = {
    import spark.implicits._
    (e.weightSnapshot.toSeq.map { case (k, v) => (k, v.toSeq) } :+
      ("__arch__" -> Seq(e.dim.toFloat, e.layers.toFloat, e.heads.toFloat,
        e.vocab.toFloat, e.maxLen.toFloat)))
      .toDF("tensor", "vec")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[save]]d bundle; the fingerprint is recomputed from content,
    * so a reloaded model carries the SAME identity it saved with and every
    * warm store built by it stays valid (spec-pinned).
    */
  def load(spark: SparkSession, path: String): TransformerEmbedder = {
    val rows = spark.read.parquet(path).select("tensor", "vec").collect()
    val all = rows.map(r => r.getString(0) -> r.getSeq[Float](1).toArray).toMap
    val arch = all.getOrElse("__arch__",
      throw new IllegalArgumentException(s"TransformerEmbedder.load: no __arch__ row at $path"))
    val w = all - "__arch__"
    new TransformerEmbedder(arch(0).toInt, arch(1).toInt, arch(2).toInt,
      arch(3).toInt, arch(4).toInt, fingerprintOf(w), None,
      Some(spark.sparkContext.broadcast(w)))
  }

  /** Content fingerprint over sorted tensor names + float bits — the same
    * identity scheme as Word2VecEmbedder's, shared by seeded and loaded
    * paths.
    */
  private def fingerprintOf(w: Map[String, Array[Float]]): String = {
    var h = 1125899906842597L
    for (k <- w.keys.toArray.sorted) {
      h = h * 31 + k.hashCode
      val v = w(k)
      var i = 0
      while (i < v.length) { h = h * 31 + java.lang.Float.floatToIntBits(v(i)); i += 1 }
    }
    java.lang.Long.toHexString(h)
  }

  private[graft] def seededWeights(dim: Int, layers: Int, heads: Int,
                                   vocab: Int, seed: Long): Map[String, Array[Float]] = {
    val ffn = 4 * dim
    val b = Map.newBuilder[String, Array[Float]]
    // token embeddings: small-uniform (the usual trained-embedding scale)
    b += "emb" -> tensor(seed, "emb", vocab * dim, 0.1)
    for (l <- 0 until layers) {
      val xavierDD = StrictMath.sqrt(6.0 / (dim + dim))
      for (m <- Seq("wq", "wk", "wv", "wo"))
        b += s"l$l.$m" -> tensor(seed, s"l$l.$m", dim * dim, xavierDD)
      b += s"l$l.w1" -> tensor(seed, s"l$l.w1", dim * ffn, StrictMath.sqrt(6.0 / (dim + ffn)))
      b += s"l$l.b1" -> new Array[Float](ffn)
      b += s"l$l.w2" -> tensor(seed, s"l$l.w2", ffn * dim, StrictMath.sqrt(6.0 / (ffn + dim)))
      b += s"l$l.b2" -> new Array[Float](dim)
      b += s"l$l.ln1g" -> Array.fill(dim)(1.0f)
      b += s"l$l.ln1b" -> new Array[Float](dim)
      b += s"l$l.ln2g" -> Array.fill(dim)(1.0f)
      b += s"l$l.ln2b" -> new Array[Float](dim)
    }
    b.result()
  }

  /** Xavier-style uniform [-a, a] from a SplitMix64 stream keyed on
    * (seed, tensor name) — order-fixed, platform-independent.
    */
  private def tensor(seed: Long, key: String, n: Int, a: Double): Array[Float] = {
    var state = seed ^ fnv1a64(key)
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      state += 0x9E3779B97F4A7C15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      val u = (z >>> 11) * (1.0 / (1L << 53)) // [0, 1)
      out(i) = ((2.0 * u - 1.0) * a).toFloat
      i += 1
    }
    out
  }

  private[graft] def fnv1a(s: String): Int = {
    var h = 0x811C9DC5
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * 0x01000193; i += 1 }
    h
  }

  private def fnv1a64(s: String): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * 0x100000001B3L; i += 1 }
    h
  }

  // --- dense helpers: row-major Float, fixed loop order ---

  /** (L×m) · (m×n) → (L×n) */
  private def matmul(a: Array[Float], w: Array[Float], L: Int, m: Int, n: Int): Array[Float] = {
    val out = new Array[Float](L * n)
    var i = 0
    while (i < L) {
      var j = 0
      while (j < n) {
        var acc = 0.0
        var t = 0
        while (t < m) { acc += a(i * m + t).toDouble * w(t * n + j); t += 1 }
        out(i * n + j) = acc.toFloat
        j += 1
      }
      i += 1
    }
    out
  }

  private def matmulBias(a: Array[Float], w: Array[Float], bias: Array[Float],
                         L: Int, m: Int, n: Int): Array[Float] = {
    val out = matmul(a, w, L, m, n)
    var i = 0
    while (i < L * n) { out(i) += bias(i % n); i += 1 }
    out
  }

  /** out += x (residual add) */
  private def addInPlace(out: Array[Float], x: Array[Float]): Unit = {
    var i = 0
    while (i < out.length) { out(i) += x(i); i += 1 }
  }

  /** Row-wise LayerNorm with learned scale/shift. */
  private def layerNorm(x: Array[Float], L: Int, d: Int,
                        g: Array[Float], beta: Array[Float]): Unit = {
    var i = 0
    while (i < L) {
      var mean = 0.0
      var j = 0
      while (j < d) { mean += x(i * d + j); j += 1 }
      mean /= d
      var varr = 0.0
      j = 0
      while (j < d) { val dv = x(i * d + j) - mean; varr += dv * dv; j += 1 }
      val inv = 1.0 / StrictMath.sqrt(varr / d + 1e-5)
      j = 0
      while (j < d) {
        x(i * d + j) = (((x(i * d + j) - mean) * inv) * g(j) + beta(j)).toFloat
        j += 1
      }
      i += 1
    }
  }

  /** GELU, tanh approximation (Hendrycks & Gimpel 2016). */
  private def geluInPlace(x: Array[Float]): Unit = {
    val c = StrictMath.sqrt(2.0 / StrictMath.PI)
    var i = 0
    while (i < x.length) {
      val v = x(i).toDouble
      x(i) = (0.5 * v * (1.0 + StrictMath.tanh(c * (v + 0.044715 * v * v * v)))).toFloat
      i += 1
    }
  }
}
