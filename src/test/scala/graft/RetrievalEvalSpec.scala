package graft

import graft.operators.RagSearch
import org.apache.spark.sql.functions._

/** Receipts for C1e — retrieval evaluation (recall@k / MRR / nDCG@k
  * against the label ground truth): metrics hand-verified on a fixture
  * whose ranking is known by construction, then corpus invariants. The
  * cross-engine value check is the DuckDB oracle's job; these specs pin
  * the METRIC DEFINITIONS.
  */
class RetrievalEvalSpec extends SparkSpecBase {
  import spark.implicits._

  // query 0 (label 1). Candidates ranked by cosine to [1,0,...]:
  //   rank 1: vec 10 (label 1, RELEVANT)
  //   rank 2: vec 11 (label 2, not)
  //   rank 3: vec 12 (label 1, RELEVANT)
  //   rank 4: vec 13 (label 2, not)
  // plus vec 14 (label 1, relevant but OUTSIDE k=3).
  private def fixture = {
    def v(x: Double, y: Double): Seq[Float] = Seq(x.toFloat, y.toFloat, 0f, 0f)
    Seq(
      (0L, v(1.0, 0.0), 1L),
      (10L, v(0.99, 0.1), 1L),
      (11L, v(0.95, 0.2), 2L),
      (12L, v(0.90, 0.3), 1L),
      (13L, v(0.80, 0.4), 2L),
      (14L, v(0.70, 0.5), 1L)
    ).toDF("vec_id", "embedding", "label")
  }

  test("hand-computed metrics: recall@k, MRR, nDCG match their definitions") {
    val out = RagSearch.retrievalEvalOver(fixture, nQueries = 1, k = 3).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 3L, "n_relevant: vecs 10, 12, 14 share label 1")
    // recall@3 = hits(2) / min(3, 3)
    assert(math.abs(r.getDouble(2) - 2.0 / 3.0) < 1e-12, s"recall ${r.getDouble(2)}")
    // first relevant at rank 1
    assert(r.getDouble(3) == 1.0, s"mrr ${r.getDouble(3)}")
    // nDCG@3: DCG = 1/log2(2) + 1/log2(4); IDCG = 1/log2(2) + 1/log2(3) + 1/log2(4)
    val dcg = 1.0 / (math.log(2) / math.log(2)) + 1.0 / (math.log(4) / math.log(2))
    val idcg = dcg + 1.0 / (math.log(3) / math.log(2))
    assert(math.abs(r.getDouble(4) - dcg / idcg) < 1e-12, s"ndcg ${r.getDouble(4)}")
  }

  test("edge definitions: no relevant docs → all-zero metrics; all hits → perfect scores") {
    // query label unseen anywhere else → n_relevant 0, metrics 0 (not NaN)
    val lonely = Seq(
      (0L, Seq(1f, 0f), 9L),
      (10L, Seq(0.9f, 0.1f), 1L),
      (11L, Seq(0.8f, 0.2f), 2L)
    ).toDF("vec_id", "embedding", "label")
    val z = RagSearch.retrievalEvalOver(lonely, nQueries = 1, k = 2).collect().head
    assert(z.getLong(1) == 0L && z.getDouble(2) == 0.0 &&
      z.getDouble(3) == 0.0 && z.getDouble(4) == 0.0)
    // every candidate relevant → recall 1, mrr 1, ndcg 1
    val all = Seq(
      (0L, Seq(1f, 0f), 1L),
      (10L, Seq(0.9f, 0.1f), 1L),
      (11L, Seq(0.8f, 0.2f), 1L)
    ).toDF("vec_id", "embedding", "label")
    val p = RagSearch.retrievalEvalOver(all, nQueries = 1, k = 2).collect().head
    assert(p.getLong(1) == 2L && p.getDouble(2) == 1.0 && p.getDouble(3) == 1.0)
    assert(math.abs(p.getDouble(4) - 1.0) < 1e-12)
  }

  test("corpus invariants: one row per query, metrics in [0,1], deterministic") {
    val out = RagSearch.retrievalEval(spark, sf).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == (0L until 10L).toSeq)
    for (r <- out; c <- 2 to 4)
      assert(r.getDouble(c) >= 0.0 && r.getDouble(c) <= 1.0 + 1e-12,
        s"query ${r.getLong(0)} metric col $c out of range: ${r.getDouble(c)}")
    val again = RagSearch.retrievalEval(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
