package graft

import graft.operators.Bm25
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpecBase {

  test("bm25 scores are positive and only for docs containing query terms") {
    val scored = Bm25.bm25Scores(spark, sf).cache()
    assert(scored.filter(col("bm25") <= 0).count() == 0)
    // every scored doc really contains at least one query term
    val terms = Bm25.DefaultQuery.split(" ").toSeq
    val withTerm = Tables.documents(spark, sf)
      .filter(terms.map(t => col("text").contains(t)).reduce(_ || _))
      .select("doc_id")
    assert(scored.join(withTerm, Seq("doc_id"), "left_anti").count() == 0)
    scored.unpersist()
  }

  test("a doc stuffed with query terms outranks the corpus") {
    // relative sanity: the top bm25 doc must contain more query-term hits
    // than the median doc
    val top = Bm25.ragBm25(spark, sf, topK = 1).head()
    val topText = Tables.documents(spark, sf)
      .filter(col("doc_id") === top.getAs[Long]("doc_id"))
      .head().getAs[String]("text")
    val hits = Bm25.DefaultQuery.split(" ").map(t => topText.split(" ").count(_ == t)).sum
    assert(hits >= 3, s"top doc only has $hits query-term hits")
  }

  test("hybrid batch: one-scan batch equals per-query hybrid; pools stay WindowGroupLimit-bounded") {
    val g = new Graft(spark, sf)
    val queries = Seq(
      g.readFile(3, 1, 10),
      "columnar parquet dictionary compression",
      "zzznolexicalhitterm qqqalsonothing") // cosine-only query: no term hits
    val batchDf = g.ragQueryHybridBatch(queries, topK = 5)
    val batch = batchDf.collect()
    assert(batch.map(_.getAs[Long]("query_id")).distinct.length == 3,
      "every query must produce rows (the no-hit query rides its cosine leg)")
    for ((q, i) <- queries.zipWithIndex) {
      val single = g.ragQueryHybrid(q, topK = 5).collect().map(_.toSeq).toSeq
      val slice = batch.filter(_.getAs[Long]("query_id") == i.toLong)
        .map(_.toSeq.drop(1)).toSeq
      assert(slice == single, s"batch rows for query $i differ from per-query serving")
    }
    // the per-query pools are rank-pushdown bounded, not a corpus sort
    val plan = batchDf.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"candidate pools must be WindowGroupLimit-bounded:\n$plan")
  }

  test("hybrid RRF fuses both rankings: top result appears in a head of either ranking") {
    val hybrid = Bm25.ragHybrid(spark, sf, topK = 10).collect()
    assert(hybrid.length == 10)
    // rrf values descending, within theoretical bounds (2/61 max)
    val rrfs = hybrid.map(_.getAs[Double]("rrf"))
    assert(rrfs.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    assert(rrfs.head <= 2.0 / 61 + 1e-6)
    // a doc ranked #1 by either signal must appear in the hybrid top-10
    val ids = hybrid.map(_.getAs[Long]("doc_id")).toSet
    val bmTop = hybrid.find(_.getAs[Any]("bm25_rank") == 1L)
    val cosTop = hybrid.find(_.getAs[Any]("cos_rank") == 1L)
    assert(bmTop.isDefined || cosTop.isDefined)
    assert(ids.size == 10)
  }
}
