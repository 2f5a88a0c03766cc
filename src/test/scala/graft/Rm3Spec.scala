package graft

import graft.operators.{Bm25, Bm25Store, Rm3}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RM3 pseudo-relevance feedback — the expansion loop's invariants plus
  * the two value-identity contracts its oracle sharing rests on: the
  * λ=1 degeneration to plain BM25 and the store-served twin's row
  * identity.
  */
class Rm3Spec extends SparkSpecBase {

  private val query = Bm25.DefaultQuery
  private val orig = query.split(" ").filter(_.nonEmpty).distinct.toSeq
  private def docs: DataFrame = Tables.documents(spark, sf)
  private def stage1: DataFrame = Bm25.bm25Scores(spark, sf, query)

  test("expansion terms: bounded, positive, disjoint from the original query") {
    val exp = Rm3.expansionTermsOver(docs, "text", stage1, orig)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(exp.nonEmpty, "feedback docs must contribute expansion mass")
    assert(exp.length <= Rm3.FbTerms)
    assert(exp.forall(_._2 > 0), "every kept expansion term carries positive mass")
    assert(exp.forall(t => !orig.contains(t._1)),
      "original query terms are never expansion terms")
    // selection order is (w desc, term asc) — the oracle's replay order
    val sorted = exp.sortBy { case (t, w) => (-w, t) }
    assert(exp == sorted, "expansion frame must come back in selection order")
  }

  test("rm3 weights: interpolation masses sum to 1 when expansion exists") {
    val w = Rm3.rm3Weights(docs, "text", stage1, orig)
    val (o, e) = w.partition(t => orig.contains(t._1))
    assert(o.length == orig.length)
    assert(math.abs(o.map(_._2).sum - Rm3.Lambda) < 1e-12)
    if (e.nonEmpty)
      assert(math.abs(e.map(_._2).sum - (1.0 - Rm3.Lambda)) < 1e-12,
        "expansion mass must normalize to 1-lambda")
    assert(w.map(_._1).distinct.length == w.length, "no duplicate terms")
  }

  test("lambda=1 degenerates to plain BM25 scaled by 1/|q|") {
    val w = orig.map(t => t -> 1.0 / orig.length)
    val weighted = Bm25.bm25ScoresWeightedOver(docs, Seq("doc_id"), "text", w)
      .withColumnRenamed("bm25", "wscore")
    val plain = Bm25.bm25ScoresOver(docs, Seq("doc_id"), "text", query)
    val joined = weighted.join(plain, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("wscore"), col("bm25")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(!r.isNullAt(1) && !r.isNullAt(2),
        s"weighted and plain scorers must hit the same docs: $r")
      assert(math.abs(r.getDouble(1) - r.getDouble(2) / orig.length) < 1e-9,
        s"uniform 1/|q| weights must reproduce bm25/|q|: $r")
    }
  }

  test("expansion changes the ranking vs plain BM25 (recall-boost receipt)") {
    val rm3Ids = Rm3.ragBm25Rm3(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val bmIds = Bm25.ragBm25(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(rm3Ids.nonEmpty && bmIds.nonEmpty)
    // expanded scoring can reach docs the original query cannot: at
    // minimum the score SET must differ (the expansion terms carry
    // 1-lambda of the mass); identical top-k order+set would mean the
    // expansion contributed nothing
    assert(rm3Ids != bmIds,
      "RM3 expansion must alter the lexical top-k on a real corpus")
  }

  test("store-served RM3 equals the in-plan query row for row") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_rm3_served").toString + "/idx"
    Bm25Store.writeLexicalIndexOver(spark,
      docs.select(col("doc_id"), lit(0).as("chunk_idx"),
        col("text").as("chunk_text")),
      path, 16, Bm25Store.manifestFor(16, Seq(), "fp-rm3"))
    val stage1Served = Bm25Store.scoresFromStore(spark, path, query).drop("chunk_idx")
    val w = Rm3.rm3Weights(docs, "text", stage1Served, orig)
    val wInPlan = Rm3.rm3Weights(docs, "text", stage1, orig)
    assert(w == wInPlan,
      "served stage-1 must select the same feedback docs and expansion terms")
    val served = Bm25Store.weightedScoresFromStore(spark, path, w)
      .drop("chunk_idx")
      .select(col("doc_id"), round(col("bm25") + lit(1e-9), 4).as("s"))
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    val inPlan = Bm25.bm25ScoresWeightedOver(docs, Seq("doc_id"), "text", wInPlan)
      .select(col("doc_id"), round(col("bm25") + lit(1e-9), 4).as("s"))
      .orderBy(col("doc_id")).collect().map(_.toSeq).toSeq
    assert(served.nonEmpty && served == inPlan,
      "weighted store serve must be value-identical to the in-plan scorer")
  }

  test("batch RM3: per-query rows identical to the single-query arm") {
    val batch = Rm3.ragBm25Rm3Batch(spark, sf).collect()
    assert(batch.nonEmpty)
    val perQ = batch.groupBy(_.getLong(0))
    assert(perQ.keySet == Rm3.BatchQueries.indices.map(_.toLong).toSet,
      "every batch query must produce rows")
    perQ.values.foreach(rows => assert(rows.length <= 10))
    // the windowed batch loop must replay the orderBy/limit single loop
    // exactly — feedback sets, expansion models, interpolation, scores
    Rm3.BatchQueries.zipWithIndex.foreach { case (q, i) =>
      val single = Rm3.ragBm25Rm3(spark, sf, q)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
      val fromBatch = perQ(i.toLong)
        .map(r => (r.getLong(1), r.getDouble(2), r.getString(3))).toSeq
      assert(fromBatch == single,
        s"batch query $i ('$q') diverged from the single-query arm")
    }
  }

  test("rm3 determinism: two runs produce identical output") {
    val a = Rm3.ragBm25Rm3(spark, sf).collect().map(_.toSeq).toSeq
    val b = Rm3.ragBm25Rm3(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
