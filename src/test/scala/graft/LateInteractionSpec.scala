package graft

import graft.operators.RagSearch
import org.apache.spark.sql.functions._

/** Receipts for C1l — late-interaction retrieval (ColBERT MaxSim):
  * word-level evidence the pooled bi-encoder blurs, exact token
  * self-matching, and the fused encode+score pass's shape guarantees.
  */
class LateInteractionSpec extends SparkSpecBase {
  import spark.implicits._

  private def tx = TransformerEmbedder.seeded(spark, dim = 16, seed = 7L)

  test("exact self-match: a verbatim duplicate scores exactly one per query token") {
    // doc 10 duplicates query doc 0's text: every query token's best
    // match is its identical contextual twin (cosine exactly 1 at 4 dp),
    // so MaxSim = token count — an EXACTNESS receipt no pooled score has
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (10L, "alpha beta gamma delta"),
      (11L, "epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val out = RagSearch.ragTopKLateOver(docs, tx, nQueries = 1, k = 2).collect()
    assert(out.head.getLong(2) == 10L, "the verbatim duplicate must rank first")
    assert(out.head.getDouble(3) == 4.0,
      s"MaxSim of a verbatim dup = its 4 tokens exactly: ${out.head.getDouble(3)}")
  }

  test("word-level evidence: a doc CONTAINING the query beats unrelated text") {
    // doc A starts with the query's exact tokens and appends filler; doc
    // B is all-unrelated. Mean-pooling dilutes A's evidence into one
    // averaged vector; MaxSim matches the query tokens against their
    // near-twins directly. (With UNTRAINED weights the encoder's context
    // mixing shifts even same-position vectors — bidirectional attention
    // sees the appended filler, and at depth 2 / dim 16 that mixing
    // drowns token identity entirely — so this receipt runs a WIDER,
    // SHALLOWER untrained encoder (dim 32, one layer: the residual
    // stream still carries each token's input embedding prominently); a
    // trained checkpoint sharpens the margin at any depth. The
    // verbatim-dup test above pins the exact-match end of the spectrum.)
    val txWide = TransformerEmbedder.seeded(spark, dim = 32, layers = 1, seed = 7L)
    val docs = Seq(
      (0L, "alpha beta"),
      (10L, "alpha beta w1 w2 w3 w4 w5 w6"),
      (11L, "v1 v2 v3 v4 v5 v6 v7 v8")
    ).toDF("doc_id", "text")
    val out = RagSearch.ragTopKLateOver(docs, txWide, nQueries = 1, k = 2).collect()
    assert(out.head.getLong(2) == 10L, "the query-containing doc must win")
    val sA = out.head.getDouble(3)
    val sB = out(1).getDouble(3)
    assert(sA > sB + 0.02,
      s"query-containing doc must beat unrelated text: $sA vs $sB")
  }

  test("deterministic and partition-invariant; corpus shape holds") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val once = RagSearch.ragTopKLateOver(docs, tx, nQueries = 3, k = 5).collect()
    assert(once.map(_.getLong(0)).distinct.sorted.toSeq == (0L until 3L).toSeq)
    for ((qid, rows) <- once.groupBy(_.getLong(0))) {
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 5L).toSeq, s"query $qid ranks")
      assert(rows.forall(_.getLong(2) != qid), "self-match must be excluded")
    }
    val again = RagSearch.ragTopKLateOver(docs.repartition(7), tx, nQueries = 3, k = 5).collect()
    assert(once.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "StrictMath + per-row scoring ⇒ identical under any partitioning")
  }
}
