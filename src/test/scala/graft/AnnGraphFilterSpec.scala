package graft

import graft.operators.{AnnGraph, AnnStore, RagSearch}
import org.apache.spark.sql.functions._

/** r12: the graph index's filtered + adaptive serving arm (the C3f
  * contract extended to C6 — before this, `ragQueryAnnGraph` with a
  * selective predicate could only under-fill silently). Contract mirrors
  * the IVF arm: predicate gates result eligibility (never navigation),
  * under-filled queries widen probes, and the terminal round is an exact
  * scan over passing rows — provably exact, because beam descent alone is
  * not exhaustive even at full probing.
  */
class AnnGraphFilterSpec extends SparkSpecBase {

  private lazy val path = {
    val p = java.nio.file.Files.createTempDirectory("graft_gfilt").toString + "/idx"
    // payload (label) must ride into the vectors table for metadata
    // predicates — the Over builder persists every column
    AnnGraph.writeGraphIndexOver(spark, Tables.embeddings(spark, sf), p,
      k = 8, degree = 8, AnnStore.manifest("graph", Seq("k" -> 8, "degree" -> 8), "gfilt-spec"))
    p
  }

  private def queries = Tables.embeddings(spark, sf).filter(col("vec_id") < 3)
    .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  test("filtered graph serve: every hit passes the predicate; scores stay brute-exact") {
    val pred = col("label") % 4 === 1
    val served = AnnGraph.annGraphServedOverFiltered(spark, path, queries,
      topK = 5, nprobe = 4, filter = Some(pred))
    val labels = Tables.embeddings(spark, sf).select("vec_id", "label")
    assert(served.join(labels, "vec_id").filter(!(col("label") % 4 === 1)).count() == 0,
      "a filtered hit violated the predicate")
    assert(served.count() > 0)
    // emitted scores match brute-force scoring for the same pairs (self
    // rows excluded: the external-query serve has no self-suppression,
    // while the brute anchor drops them)
    val bruteAll = RagSearch.annTopKBatch(spark, sf, nQueries = 3, k = 2000)
      .select("query_id", "vec_id", "score")
    assert(served.filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id", "score").except(bruteAll).count() == 0)
  }

  test("adaptive graph serve returns the COMPLETE filtered population when topK exceeds it") {
    val e = Tables.embeddings(spark, sf)
    val label = e.groupBy("label").count().orderBy(col("count").asc, col("label").asc)
      .head().getInt(0)
    val m = e.filter(col("label") === label).count().toInt
    assert(m >= 2, s"fixture needs a non-trivial label population, got $m")
    val pred = col("label") === label
    val topK = m + 2 // unfillable: forces widening to the terminal exact round
    val qRows = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val adaptive = AnnGraph.annGraphServedOverCellsAdaptive(spark, path, qRows,
      topK = topK, nprobe = 1, beam = 32, hops = 2, entriesPerCell = 3,
      filter = Some(pred)).collect()
    val perQuery = adaptive.groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.length }
    assert(perQuery.size == 3 && perQuery.values.forall(_ == m),
      s"terminal exact round must return all $m matches per query: $perQuery")
    // the returned sets ARE the matching population, ranked by exact cosine
    val matchIds = e.filter(pred).select("vec_id").collect().map(_.getLong(0)).toSet
    adaptive.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(2)).toSet == matchIds, s"query $q id set")
      val ranked = rows.sortBy(_.getLong(1)).map(r => (r.getDouble(3), r.getLong(2)))
      assert(ranked.sameElements(ranked.sortBy { case (s, v) => (-s, v) }),
        s"query $q must rank by score desc, vec_id asc")
    }
  }

  test("a query that fills at the first probe never widens: adaptive equals the plain serve") {
    val always = Some(col("label") >= 0)
    val qRows = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val plain = AnnGraph.annGraphServedOverCells(spark, path, qRows,
      topK = 5, nprobe = 2, beam = 32, hops = 2, entriesPerCell = 3, filter = always)
    val adaptive = AnnGraph.annGraphServedOverCellsAdaptive(spark, path, qRows,
      topK = 5, nprobe = 2, beam = 32, hops = 2, entriesPerCell = 3, filter = always)
    assert(adaptive.collect().map(_.toSeq).toSeq == plain.collect().map(_.toSeq).toSeq)
  }

  test("unfiltered serving is byte-unchanged by the filter arm (regression guard)") {
    // the no-filter path must still rank from the FINAL BEAM exactly as
    // r11 did — the visited-pool semantics apply only under a predicate
    val served = AnnGraph.annGraphServed(spark, path, nQueries = 5, topK = 5)
    val again = AnnGraph.annGraphServed(spark, path, nQueries = 5, topK = 5)
    assert(served.collect().map(_.toSeq).toSeq == again.collect().map(_.toSeq).toSeq)
    assert(served.count() > 0)
  }

  test("facade ragQueryAnnGraph(filter): selective predicate serves the exact matching chunks") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft_gfacade").toString
    val store = java.nio.file.Files.createTempDirectory("graft_gfstore").toString + "/store"
    val docs = (0L until 40L).map(i => (i, s"document number $i about subject ${i % 7} " +
      s"with filler content shared across the corpus")).toDF("doc_id", "text")
    val g = Graft.forFrame(spark, docs, work)
    g.incrementalUpdate(store)
    val hits = g.ragQueryAnnGraph("document about subject", topK = 10,
      nprobe = 1, filter = Some(col("doc_id").between(30, 33))).collect()
    assert(hits.map(_.getAs[Long]("doc_id")).sorted.toSeq == (30L to 33L).toSeq,
      s"adaptive graph serve must return exactly the matching population: " +
        hits.map(_.getAs[Long]("doc_id")).mkString(","))
  }
}
