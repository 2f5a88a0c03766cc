package graft.operators

import graft.Tables
import graft.plans.VecExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C6: graph-based ANN — the HNSW-style structure the reference names as a
  * planned extension (reference: README.md:32, src/index.ts:265 mention
  * HNSW). Re-expressed for a cluster rather than transliterated: a single
  * navigable graph with greedy descent is a pointer-chasing, shared-memory
  * design; the Spark-native shape is a PARTITION-LOCAL graph per IVF cell
  * plus an iterative frontier expansion that is just joins.
  *
  *   - Index build: assign vectors to IVF cells (coarse quantizer reused
  *     from C3), then build a k-NN graph WITHIN each cell — the in-cell
  *     pair join is keyed by `cid`, so the work is embarrassingly parallel
  *     across cells and bounded per cell by the cell capacity (capacity is
  *     held ~constant at scale by growing k with the corpus, the same
  *     argument that sizes IVF itself; an NN-Descent refinement would
  *     replace the in-cell pair join if cells were ever allowed to grow).
  *   - Search: probe the query's nearest cells (same probe rule as C3),
  *     seed the frontier with deterministic entry points per probed cell,
  *     then `hops` rounds of: expand frontier along graph edges → score
  *     neighbors against the query → keep the best `beam` per query.
  *     Each round is a join + window, localCheckpoint keeps plans flat.
  *
  * Rows-only like C3/C5 (k-means + iterative search are not
  * SQL-replicable); recall is spec-bounded against the C1 brute-force
  * baseline in AnnIvfSpec.
  */
object AnnGraph {

  /** Cell assignment shared by the graph build and the search. */
  private def assign(spark: SparkSession, sfDir: String,
                     centroids: Array[Array[Double]]): DataFrame = {
    VecExprs.register(spark)
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        VecExprs.centroidAssign(col("embedding").cast("array<double>"), centroids,
          useCosine = true).as("cid"))
  }

  /** Per-cell k-NN edges: for every vector, its `degree` nearest in-cell
    * neighbors by cosine. Returns (cid, src, dst, sim). Scores are rounded
    * the same way as C1's (plain 4dp — every ANN operator must emit the
    * identical score for the same pair, and the recall spec compares via
    * exact except()).
    */
  def buildGraph(spark: SparkSession, sfDir: String,
                 centroids: Array[Array[Double]], degree: Int = 8): DataFrame =
    buildGraphOver(assign(spark, sfDir, centroids), degree)

  private def buildGraphOver(assigned: DataFrame, degree: Int): DataFrame = {
    val a = assigned.select(col("vec_id").as("src"), col("embedding").as("a_emb"), col("cid"))
    val b = assigned.select(col("vec_id").as("dst"), col("embedding").as("b_emb"), col("cid"))
    val w = Window.partitionBy(col("src")).orderBy(col("sim").desc, col("dst").asc)
    a.join(b, Seq("cid"))
      .filter(col("src") =!= col("dst"))
      .select(col("cid"), col("src"), col("dst"),
        round(VecExprs.cosineSim(col("a_emb"), col("b_emb")), 4).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= degree)
      .drop("rn")
  }

  /** C6 search: beam descent over the per-cell graphs. */
  def annGraph(spark: SparkSession, sfDir: String, nQueries: Int = 10, topK: Int = 5,
               k: Int = 16, nprobe: Int = 2, degree: Int = 8, beam: Int = 32,
               hops: Int = 2, entriesPerCell: Int = 3): DataFrame = {
    val centroids = AnnIvf.train(spark, sfDir, k)
    // one assignment pass serves the graph build, the entry points, and
    // every hop's scoring join (the beam loop materializes eagerly, so an
    // un-checkpointed plan would re-scan and re-assign per round)
    val e = assign(spark, sfDir, centroids).localCheckpoint()
    val edges = buildGraphOver(e, degree)
      .select(col("src"), col("dst")).localCheckpoint()
    // probe list per query: nprobe nearest centroids (C3's rule, shared).
    // No checkpoint: q derives from the already-checkpointed `e` via a
    // bounded nQueries-row filter — recomputing it per hop is cheaper than
    // another eager materialization job.
    val q = AnnIvf.probeList(e, centroids, nQueries, nprobe)
    // deterministic entry points: the lowest vec_ids of each probed cell
    val wCell = Window.partitionBy(col("cid")).orderBy(col("vec_id").asc)
    val entries = e.withColumn("rn", row_number().over(wCell))
      .filter(col("rn") <= entriesPerCell)
      .select(col("cid"), col("vec_id"))
    val scoreOf = round(VecExprs.cosineSim(col("embedding"), col("qv")), 4)
    // queries are corpus vectors: drop the query itself HERE, not only in the
    // final ranking — a self-candidate scores cosine 1.0, tops the beam every
    // hop, and permanently wastes one beam/entry slot per query. But the
    // query node's own out-edges are its exact in-cell kNN — the strongest
    // candidate source — so they are unioned into the FIRST expansion below
    // (self stays expandable without ever occupying a beam slot, the
    // HNSW-search invariant).
    def scored(cands: DataFrame): DataFrame = cands
      .filter(col("vec_id") =!= col("query_id"))
      .join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .join(q.select(col("query_id"), col("qv")).distinct(), "query_id")
      .select(col("query_id"), col("vec_id"), scoreOf.as("score"))
    val wBeam = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("vec_id").asc)
    val selfEdges = q.select(col("query_id")).distinct()
      .join(edges, col("query_id") === col("src"))
      .select(col("query_id"), col("dst").as("vec_id"))
    var frontier = scored(
      q.join(entries, col("probe_cid") === col("cid"))
        .select(col("query_id"), col("vec_id"))
        .unionAll(selfEdges)
        .distinct())
      .localCheckpoint()
    for (_ <- 0 until hops) {
      val expanded = frontier.select(col("query_id"), col("vec_id"))
        .join(edges, col("vec_id") === col("src"))
        .select(col("query_id"), col("dst").as("vec_id")).distinct()
        // only score neighbors not already in the frontier
        .join(frontier.select(col("query_id"), col("vec_id")), Seq("query_id", "vec_id"),
          "left_anti")
      frontier = frontier.unionByName(scored(expanded))
        .withColumn("rn", row_number().over(wBeam))
        .filter(col("rn") <= beam)
        .drop("rn")
        .localCheckpoint()
    }
    // no self-filter needed: scored() already excluded the query vector
    frontier
      .withColumn("rank", row_number().over(wBeam).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("vec_id"), col("score"))
      .orderBy("query_id", "rank")
  }
}
