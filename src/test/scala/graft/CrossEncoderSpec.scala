package graft

import graft.operators.RagSearch
import org.apache.spark.sql.functions._

/** Receipts for C1x — cross-encoder reranking (Nogueira & Cho 2019): the
  * joint q‖SEP‖d encode carries INTERACTION signal two independent
  * encodes cannot, serving stays two-stage (pool-bounded), and the whole
  * path is deterministic under the seeded weights.
  */
class CrossEncoderSpec extends SparkSpecBase {

  private def ce = new CrossEncoder(TransformerEmbedder.seeded(spark, dim = 16, seed = 7L))

  test("deterministic; identity composes the embedder's and the head's") {
    val a = new CrossEncoder(TransformerEmbedder.seeded(spark, dim = 16, seed = 7L))
    val b = new CrossEncoder(TransformerEmbedder.seeded(spark, dim = 16, seed = 7L))
    assert(a.name == b.name)
    assert(a.score("spark shuffle", "partition exchange") ==
      b.score("spark shuffle", "partition exchange"))
    // a different HEAD is a different model even on the same encoder
    val c = new CrossEncoder(TransformerEmbedder.seeded(spark, dim = 16, seed = 7L),
      headSeed = 202L)
    assert(c.name != a.name)
    assert(c.score("spark shuffle", "partition exchange") !=
      a.score("spark shuffle", "partition exchange"))
    // a different ENCODER seed changes the identity too
    val d = new CrossEncoder(TransformerEmbedder.seeded(spark, dim = 16, seed = 8L))
    assert(d.name != a.name)
  }

  test("interaction, not independent encodes: score is pair-asymmetric and context-sensitive") {
    val e = ce
    // asymmetry: the joint sequence q‖SEP‖d differs from d‖SEP‖q — a
    // similarity of independent encodes would be symmetric by definition
    val qd = e.score("alpha beta", "gamma delta")
    val dq = e.score("gamma delta", "alpha beta")
    assert(qd != dq, "cross-encoding must be order-sensitive (bi-encoder cosine cannot be)")
    // the same document scores differently against different queries
    assert(e.score("alpha beta", "gamma delta") != e.score("alpha zeta", "gamma delta"))
    // and changing ONE document token moves the score
    assert(e.score("alpha beta", "gamma delta") != e.score("alpha beta", "gamma omega"))
  }

  test("query-first truncation: document tail beyond the window never changes the score") {
    val e = ce
    val q = "query tokens here"
    val base = (0 until 60).map(i => s"d$i").mkString(" ") // fills the window
    assert(e.score(q, base) == e.score(q, base + " tail beyond the budget"),
      "tokens past the truncation window must not affect the score")
    // and the query survives truncation even against a long document:
    // two different queries still score the long document differently
    assert(e.score("first query", base) != e.score("second query", base))
  }

  test("driver query: pool-bounded rerank, shape + determinism + genuine reorder") {
    val out = RagSearch.ragRerankCross(spark, sf).collect()
    assert(out.map(_.getLong(0)).distinct.sorted.toSeq == (0L until 5L).toSeq)
    for ((qid, rows) <- out.groupBy(_.getLong(0))) {
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to 5L).toSeq, s"query $qid ranks")
      assert(rows.forall(_.getLong(2) != qid), "self-match must be excluded")
    }
    val again = RagSearch.ragRerankCross(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "seeded weights + strict math ⇒ run-stable")
    // the rerank is not a no-op: at least one query's top-5 ORDER differs
    // from the bi-encoder ordering that built the pool
    val bi = RagSearch.ragTopKTx(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    val cross = out.groupBy(_.getLong(0)).map { case (q, rs) =>
      q -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    assert(cross.keys.exists(q => cross(q) != bi(q)),
      "cross-encoder scores must actually reorder some pool")
  }
}
