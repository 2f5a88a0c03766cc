package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RM3 pseudo-relevance feedback — automatic query expansion for the
  * lexical retrieval leg (reference: README.md:32 plans hybrid search;
  * RM3 is the standard recall-booster layered on a BM25 first stage).
  *
  * Two-stage relevance-model retrieval (Lavrenko & Croft 2001; the RM3
  * interpolated form of Abdul-Jaleel et al. 2004, TREC Robust):
  *
  *   1. score the ORIGINAL query with BM25; take the top-N feedback docs;
  *   2. estimate the relevance model over their vocabulary —
  *      p(t|R) ∝ Σ_d p(t|d)·s(d) with p(t|d) = tf/dl and s(d) the
  *      stage-1 score — keep the top-M expansion terms;
  *   3. interpolate: final term weights are λ·1/|q| for original terms and
  *      (1−λ)·p(t|R)/Σp for expansion terms, then run ONE weighted BM25
  *      pass ([[Bm25.bm25ScoresWeightedOver]]).
  *
  * Every driver-side collect is bounded by construction: N=5 feedback
  * rows, M=8 expansion rows — query-plan parameters, the k-means-centroid
  * discipline. Determinism: stage-1 scores and relevance-model masses are
  * 4 dp-quantized (house +1e-9 nudge) before every selection, ties break
  * on doc_id / term asc, so the oracle replays the exact feedback set and
  * expansion set.
  *
  * Scale: stage 1 serves from the persisted postings store (pruned to the
  * query terms' buckets); the feedback read is a ≤N-key pushed-down
  * filter on the documents table; stage 2 is a second pruned postings
  * read over |q|+M terms ([[Bm25Store.weightedScoresFromStore]]). Serve
  * cost grows with the expanded query's posting lists, never the corpus.
  */
object Rm3 {
  val FbDocs = 5
  val FbTerms = 8
  val Lambda = 0.6

  private def origTermsOf(query: String): Seq[String] =
    query.split(" ").filter(_.nonEmpty).distinct.toSeq

  /** The relevance-model expansion terms from a stage-1 score frame:
    * `(term, w)` with w = round(Σ_d tf/dl·s(d), 4) over the top-`fbDocs`
    * feedback docs, original query terms excluded, zero-mass terms
    * dropped, top-`fbTerms` by (w desc, term asc).
    *
    * The feedback doc_ids are collected (≤ `fbDocs` rows) so the corpus
    * re-read is a pushed-down `doc_id IN (...)` point filter, not a scan.
    */
  def expansionTermsOver(docs: DataFrame, textCol: String, stage1: DataFrame,
                         origTerms: Seq[String], fbDocs: Int = FbDocs,
                         fbTerms: Int = FbTerms): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fb = stage1
      .select(col("doc_id"), round(col("bm25") + lit(1e-9), 4).as("s"))
      .orderBy(col("s").desc, col("doc_id").asc)
      .limit(fbDocs)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    if (fb.isEmpty)
      return spark.emptyDataset[(String, Double)].toDF("term", "w")
    val sF = fb.toDF("doc_id", "s")
    docs
      .filter(col("doc_id").isin(fb.map(_._1): _*))
      .select(col("doc_id"), Text.tokens(col(textCol)).as("toks"))
      .join(broadcast(sF), "doc_id")
      .select(col("doc_id"), col("s"),
        size(col("toks")).cast("double").as("dl"),
        explode(col("toks")).as("term"))
      .filter(!col("term").isin(origTerms.map(lit): _*))
      .groupBy(col("doc_id"), col("s"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .groupBy(col("term"))
      .agg(round(sum(col("tf") / col("dl") * col("s")) + lit(1e-9), 4).as("w"))
      .filter(col("w") > 0)
      .orderBy(col("w").desc, col("term").asc)
      .limit(fbTerms)
  }

  /** The interpolated RM3 term-weight set: λ·1/|q| per original term plus
    * (1−λ)·w/Σw per expansion term. Degenerates to the λ-scaled original
    * query when no expansion term has positive mass.
    */
  def rm3Weights(docs: DataFrame, textCol: String, stage1: DataFrame,
                 origTerms: Seq[String], lambda: Double = Lambda,
                 fbDocs: Int = FbDocs,
                 fbTerms: Int = FbTerms): Seq[(String, Double)] = {
    require(origTerms.nonEmpty, "rm3Weights: empty original query")
    val exp = expansionTermsOver(docs, textCol, stage1, origTerms, fbDocs, fbTerms)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val orig = origTerms.map(t => t -> lambda / origTerms.length)
    val tot = exp.map(_._2).sum
    if (exp.isEmpty || tot <= 0) orig
    else orig ++ exp.map { case (t, w) => t -> (1.0 - lambda) * w / tot }
  }

  /** A10r: RM3-expanded BM25 top-k — both stages in-plan. */
  def ragBm25Rm3(spark: SparkSession, sfDir: String,
                 query: String = Bm25.DefaultQuery, topK: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val orig = origTermsOf(query)
    val stage1 = Bm25.bm25Scores(spark, sfDir, query)
    val w = rm3Weights(docs, "text", stage1, orig)
    finish(docs, Bm25.bm25ScoresWeightedOver(docs, Seq("doc_id"), "text", w), topK)
  }

  /** A10rs: the SERVED twin — stage 1 and stage 2 both read the persisted
    * postings store (pruned to their term buckets); the only corpus-table
    * touch is the ≤N-key feedback read. Value-identical to [[ragBm25Rm3]]
    * (the store's value-identity contract applied twice), so it rides the
    * same DuckDB oracle.
    */
  def ragBm25Rm3Served(spark: SparkSession, sfDir: String,
                       query: String = Bm25.DefaultQuery,
                       topK: Int = 10): DataFrame = {
    val path = Bm25Store.defaultIndexPath(sfDir)
    Bm25Store.ensureDocLexIndex(spark, sfDir, path)
    val docs = Tables.documents(spark, sfDir)
    val orig = origTermsOf(query)
    val stage1 = Bm25Store.scoresFromStore(spark, path, query).drop("chunk_idx")
    val w = rm3Weights(docs, "text", stage1, orig)
    finish(docs,
      Bm25Store.weightedScoresFromStore(spark, path, w).drop("chunk_idx"), topK)
  }

  private def finish(docs: DataFrame, scores: DataFrame, topK: Int): DataFrame =
    scores
      .join(docs, "doc_id")
      .select(col("doc_id"), round(col("bm25") + lit(1e-9), 4).as("rm3"),
        substring(col("text"), 1, 80).as("snippet"))
      .orderBy(col("rm3").desc, col("doc_id").asc)
      .limit(topK)
}
