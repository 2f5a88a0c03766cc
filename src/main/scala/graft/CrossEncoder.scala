package graft

/** A cross-encoder reranker over the [[TransformerEmbedder]]'s encoder —
  * the SECOND inference pattern a retrieval stack needs (Nogueira & Cho
  * 2019, arXiv:1901.04085, the BERT passage-reranking recipe): where the
  * bi-encoder scores `enc(q)·enc(d)` from two INDEPENDENT encodes (and so
  * can be indexed), the cross-encoder encodes the JOINT `q ‖ SEP ‖ d`
  * sequence, letting self-attention read the query against the document
  * token-by-token, and projects the pooled vector through a scalar head.
  * That per-pair O(L²) cost is exactly why serving is two-stage: a cheap
  * retriever bounds the candidate pool, the cross-encoder pays its price
  * only on `nQueries × candDepth` pairs.
  *
  * Weights are the embedder's (same seeded stand-in / loadable bundle)
  * plus a seeded head vector; `name` composes both identities, so
  * anything cached under a cross-encoder score is gated like every other
  * model artifact. Deterministic bit-for-bit (StrictMath, fixed order)
  * like the embedder itself.
  *
  * Truncation is query-first (the standard recipe): the query keeps up to
  * half the window, the document fills the rest — so a long document
  * never evicts the query, and tail tokens beyond the window cannot
  * change the score (spec-pinned).
  */
final class CrossEncoder(tx: TransformerEmbedder,
                         headSeed: Long = 101L) extends Serializable {

  // below 4 the query-first split leaves no query slot at all (qKeep would
  // floor to 0 and every score would be query-independent)
  require(tx.maxLen >= 4,
    s"cross-encoder window must fit query + SEP + doc: maxLen=${tx.maxLen} < 4")

  def name: String = s"graft-crossenc-v1-h$headSeed-${tx.name}"

  /** SEP between the segments: a fixed pseudo-reserved id derived from a
    * NUL-framed string no whitespace-split token can ever be. A hash
    * collision with a corpus word would merely alias one vocabulary row —
    * the same degrade every hashing-vocabulary id shares.
    */
  private val sepId: Int =
    java.lang.Math.floorMod(TransformerEmbedder.fnv1a("\u0000SEP\u0000"), tx.vocab)

  @transient private lazy val head: Array[Double] = {
    // seeded scalar head, derived like any other tensor (per-JVM, ships
    // nothing); scaled to the pooled vector's unit norm
    val h = new Array[Double](tx.dim)
    var state = headSeed ^ 0x5DEECE66DL
    var i = 0
    while (i < tx.dim) {
      state += 0x9E3779B97F4A7C15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      h(i) = ((z >>> 11) * (1.0 / (1L << 53))) * 2.0 - 1.0
      i += 1
    }
    h
  }

  /** Joint-sequence token ids under query-first truncation. */
  private[graft] def pairTokens(query: String, doc: String): Array[Int] = {
    val q = tx.tokenIds(query)
    val d = tx.tokenIds(doc)
    val qKeep = math.min(q.length, math.max(1, tx.maxLen / 2) - 1)
    val dKeep = math.min(d.length, tx.maxLen - qKeep - 1)
    q.take(qKeep) ++ Array(sepId) ++ d.take(math.max(dKeep, 0))
  }

  /** Score one (query, document) pair: head · encode(q ‖ SEP ‖ d). */
  def score(query: String, doc: String): Double = {
    val toks = pairTokens(query, doc)
    val v = tx.forwardPooled(toks)
    var s = 0.0
    var i = 0
    while (i < v.length) { s += head(i) * v(i); i += 1 }
    s
  }

  /** Batched scoring, one score per pair in order — the mapPartitions
    * unit, mirroring [[BatchEmbedder.embedBatch]]'s shape.
    */
  def scoreBatch(pairs: Array[(String, String)]): Array[Double] =
    pairs.map { case (q, d) => score(q, d) }
}

object CrossEncoder {
  /** Pairs per scoring call — half [[BatchEmbedder]]'s 64: joint
    * sequences run up to the full window and attention is O(L²), so a
    * pair batch carries roughly 4× a single-encode batch's work.
    */
  val ScoreBatchSize: Int = 32
}
