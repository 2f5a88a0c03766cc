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

  test("served store: full probing equals the fused scan; probes prune; refresh keeps it live") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .localCheckpoint()
    val t = tx
    val kCells = 8
    val path = java.nio.file.Files.createTempDirectory("graft_late").toString + "/idx"
    RagSearch.ensureLateIndex(spark, docs, t, path, kCells, "fp-late-1")
    def queriesOf(d: org.apache.spark.sql.DataFrame, n: Int) =
      d.filter(col("doc_id") < n).collect().map { r =>
        val toks = t.tokenIds(if (r.isNullAt(1)) "" else r.getString(1))
        val qm = if (toks.isEmpty) Array.empty[Array[Double]]
          else t.forwardTokenVecs(toks)
        (r.getLong(0), qm, RagSearch.poolTokenVecs(qm, t.dim))
      }
    val qs = queriesOf(docs, 3)
    // EXACT at full probing: every cell probed → every candidate scored
    // with the same MaxSim math over the same deterministic token vectors
    // — row-identical to the fused corpus scan (the strongest equality a
    // served ANN arm can state; the pruned case then only changes WHICH
    // candidates are scored, never their scores)
    val fused = RagSearch.ragTopKLateOver(docs, t, nQueries = 3, k = 5)
      .collect().map(_.toSeq).toSeq
    val servedAll = RagSearch.ragTopKLateServedOver(spark, path, qs,
        k = 5, nprobe = kCells, excludeSelf = true)
      .collect().map(_.toSeq).toSeq
    assert(servedAll == fused,
      "full-probing served MaxSim must equal the fused scan row for row")
    // pruned serving: the candidate read must be partition-pruned and
    // recall vs the fused top-5 stays above the IVF probe bound
    val servedDf = RagSearch.ragTopKLateServedOver(spark, path, qs,
      k = 5, nprobe = 3, excludeSelf = true)
    val served = servedDf.collect()
    val recall = {
      val f = fused.groupBy(_.head.asInstanceOf[Long])
        .map { case (q, rs) => q -> rs.map(_(2).asInstanceOf[Long]).toSet }
      val s = served.groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
      val per = f.keys.toSeq.map(q =>
        (f(q) intersect s.getOrElse(q, Set.empty[Long])).size.toDouble / f(q).size)
      per.sum / per.length
    }
    assert(recall >= 0.4, s"served late-interaction recall=$recall vs fused scan")
    // served scores are EXACT MaxSim: every served (query, vec) pair that
    // the fused scan also ranked carries the identical score
    val fusedScores = fused.map(r => (r(0), r(2)) -> r(3)).toMap
    served.foreach { r =>
      fusedScores.get((r.getLong(0), r.getLong(2))).foreach { exp =>
        assert(r.getDouble(3) == exp, s"served score drifted for $r")
      }
    }
    // incremental refresh under the shared IVF dispatch: a 3-doc trickle
    // rewrites affected cells only, and full-probing serving over the
    // refreshed store equals the fused scan over the NEW corpus
    import spark.implicits._
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val docs2 = docs
      .filter(col("doc_id") =!= ids.last)
      .withColumn("text", when(col("doc_id") === ids(ids.length / 2),
        lit("an edited document about late interaction maxsim serving"))
        .otherwise(col("text")))
      .unionByName(Seq((ids.max + 1000L, "a brand new late interaction document"))
        .toDF("doc_id", "text"))
      .localCheckpoint()
    val r = graft.operators.AnnIvf.refreshIndexOver(spark, path,
      RagSearch.lateCorpusEncode(docs2, t),
      RagSearch.lateManifest(kCells, t.name, "fp-late-2")).head()
    assert(r.getString(0) == "incremental", s"mode=${r.getString(0)}")
    assert(r.getAs[Long]("n_cells_rewritten") >= 1 &&
      r.getAs[Long]("n_cells_rewritten") < kCells)
    val fused2 = RagSearch.ragTopKLateOver(docs2, t, nQueries = 3, k = 5)
      .collect().map(_.toSeq).toSeq
    val served2 = RagSearch.ragTopKLateServedOver(spark, path, queriesOf(docs2, 3),
        k = 5, nprobe = kCells, excludeSelf = true)
      .collect().map(_.toSeq).toSeq
    assert(served2 == fused2,
      "refreshed store must serve the new corpus exactly (full probing)")
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
