package graft

import graft.operators.{AnnGraph, AnnStore}
import org.apache.spark.sql.functions._

/** r19 (r18 ADVICE): a NON-saturated golden test for the graph descent —
  * the saturated receipt (AnnIvfSpec) pins descent ≡ brute force only when
  * every cell is probed and the beam exceeds the corpus, and the serve/
  * in-query arms now share one kernel, so beam eviction, hop expansion,
  * entry seeding and tie-breaking had no DATA oracle in the pruning
  * regime. Fixture: 4 near-orthogonal clusters (12 members each, 48
  * vectors, dim 8) where each query's true top-k lies provably inside its
  * probed cells — so brute force over the WHOLE corpus is a valid
  * expectation even though the descent runs with nprobe < k,
  * beam < corpus, hops > 0. Query B sits exactly between two clusters and
  * its alternating per-pair 4dp score TIES pin the (score desc, vec_id
  * asc) tie-break by data.
  */
class AnnGraphGoldenSpec extends SparkSpecBase {

  private val Dim = 8
  private val PerCluster = 12

  /** Member j of cluster c: e_c + 0.01(j+1)·e_{c+4} — cosine to the
    * cluster axis strictly decreases in j, clusters are exactly
    * orthogonal, and ids interleave (id = j·4 + c) so the k-means seeds
    * (first k ids) are one representative per cluster.
    */
  private def member(c: Int, j: Int): Array[Float] = {
    val v = new Array[Float](Dim)
    v(c) = 1.0f
    v(c + 4) = (0.01f * (j + 1))
    v
  }

  private lazy val fixture: Seq[(Long, Array[Float], Int)] =
    for (j <- 0 until PerCluster; c <- 0 until 4)
      yield ((j * 4 + c).toLong, member(c, j), c)

  private lazy val path = {
    import spark.implicits._
    val p = java.nio.file.Files.createTempDirectory("graft_ggold").toString + "/idx"
    val e = fixture.toDF("vec_id", "embedding", "label")
    AnnGraph.writeGraphIndexOver(spark, e, p, k = 4, degree = 8,
      AnnStore.manifest("graph", Seq("k" -> 4, "degree" -> 8), "ggold-spec"))
    p
  }

  /** Brute-force expectation with the serve's arithmetic (float elements
    * widened per element, one accumulation pass) — computed in the TEST,
    * not through any engine kernel.
    */
  private def bruteTopK(q: Array[Float], k: Int): Seq[Long] = {
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < math.min(x.length, y.length)) {
        dot += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble
        ny += y(i).toDouble * y(i).toDouble
        i += 1
      }
      if (nx < 1e-10 || ny < 1e-10) 0.0 else dot / math.sqrt(nx * ny)
    }
    fixture.map { case (id, v, _) =>
      // the serve contract rounds to 4dp before ranking; ties break id asc
      (BigDecimal(cos(q, v)).setScale(4, BigDecimal.RoundingMode.HALF_UP), id)
    }.sortBy { case (s, id) => (-s, id) }.take(k).map(_._2)
  }

  test("non-saturated descent (nprobe<k, beam<corpus, hops>0) returns the data-pinned top-k, ties broken by vec_id") {
    // query A: on cluster 0's axis — its true top-3 are cluster 0's three
    // tightest members (ids 0, 4, 8), every other cluster is orthogonal
    val qA = { val v = new Array[Float](Dim); v(0) = 1.0f; v }
    // query B: exactly between clusters 2 and 3 — per-j pairs (4j+2, 4j+3)
    // tie bit-for-bit by symmetry, so ranks pin the vec_id-asc tie-break
    val qB = { val v = new Array[Float](Dim); v(2) = 0.7071f; v(3) = 0.7071f; v }
    val expA = bruteTopK(qA, 3)
    val expB = bruteTopK(qB, 4)
    assert(expA == Seq(0L, 4L, 8L), s"fixture self-check: $expA")
    assert(expB == Seq(2L, 3L, 6L, 7L), s"fixture self-check: $expB")

    val served = AnnGraph.annGraphServedOverCells(spark, path,
      Array(100L -> qA, 200L -> qB), topK = 4, nprobe = 2, beam = 8,
      hops = 2, entriesPerCell = 3, filter = None)
      .orderBy("query_id", "rank").collect()
    val got = served.groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq).toMap
    assert(got(100L).take(3) == expA,
      s"query A top-3 must be the data-pinned ids: ${got(100L)}")
    assert(got(200L) == expB,
      s"query B top-4 must pin the cross-cluster 4dp ties: ${got(200L)}")
    // scores are non-increasing within each query (rank order is real)
    served.groupBy(_.getLong(0)).values.foreach { rows =>
      val scores = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }
}
