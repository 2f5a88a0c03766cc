package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** The batch driver entry's fixed query set (corpus-vocabulary terms so
    * every stage has hits) — DefaultQuery first, so per-query row
    * identity with [[ragBm25Rm3]] is directly comparable.
    */
  val BatchQueries: Seq[String] = Seq(
    Bm25.DefaultQuery,
    "sort merge window stream",
    "filter column vector query")

  /** A10rb: BATCH RM3 — the full feedback → expansion → interpolation
    * loop for a whole query batch in ONE scan pipeline. Where the
    * single-query arm selects with `orderBy.limit` and two bounded
    * collects, the batch arm replaces every selection with a PER-QUERY
    * window (`row_number ≤ N` — WindowGroupLimit rank pushdown, the
    * ragQueryBatchOver shape), so feedback sets and expansion models for
    * all queries materialize in the same jobs:
    *
    *   stage-1 batch BM25 (one tokenize pass, union term filter at the
    *   scan edge) → per-query top-N feedback window → ONE bounded collect
    *   of the (query, doc, s) feedback pairs (≤ |batch|·N rows — needed
    *   to push the doc_id point filter into the corpus re-read) → per-
    *   query relevance models via a (query_id, term) anti-join against
    *   the batch's own terms + top-M window → ONE bounded collect of the
    *   expansion terms (≤ |batch|·M — needed for stage-2's scan-edge term
    *   filter) → stage-2 weighted batch scoring off a broadcast
    *   (query_id, term, qw) frame.
    *
    * Per query row-identical to [[ragBm25Rm3]] (spec-pinned) — every
    * selection compares the same 4 dp-quantized values with the same
    * ties, and tf/df/N/avgdl are query-independent.
    */
  def rm3ScoresBatchOver(docs: DataFrame, textCol: String,
                         queries: Seq[String], fbDocs: Int = FbDocs,
                         fbTerms: Int = FbTerms,
                         lambda: Double = Lambda): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(queries.nonEmpty, "rm3ScoresBatchOver: empty query batch")
    val qTermPairs = queries.zipWithIndex.flatMap { case (q, i) =>
      q.split(" ").filter(_.nonEmpty).distinct.map(t => (i.toLong, t))
    }
    require(qTermPairs.nonEmpty, "rm3ScoresBatchOver: no query terms")
    val qTermsF = qTermPairs.toDF("query_id", "term")
    val origSet = qTermPairs.map(_._2).distinct

    def tfOver(termSet: Seq[String]) = {
      val prepped = docs
        .select(col("doc_id"), Text.tokens(col(textCol)).as("toks"))
        .select(col("doc_id"), size(col("toks")).cast("double").as("dl"),
          filter(col("toks"), t => t.isin(termSet.map(lit): _*)).as("hits"))
        .localCheckpoint(false)
      val stats = prepped.agg(
        count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl"))
      val tf = prepped
        .select(col("doc_id"), col("dl"), explode(col("hits")).as("term"))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).cast("double").as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
      (tf, df, stats)
    }

    // stage 1: batch BM25 over the union of the original terms
    val (tf1, df1, stats1) = tfOver(origSet)
    val s1 = tf1.join(broadcast(qTermsF), "term")
      .join(broadcast(df1), "term")
      .crossJoin(broadcast(stats1))
      .withColumn("w", Bm25.bm25Weight)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("w")) + lit(1e-9), 4).as("s"))
    val wq = Window.partitionBy(col("query_id"))
    val fb = s1.withColumn("rn",
        row_number().over(wq.orderBy(col("s").desc, col("doc_id").asc)))
      .filter(col("rn") <= fbDocs)
      .select(col("query_id"), col("doc_id"), col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    if (fb.isEmpty)
      return spark.emptyDataset[(Long, Long, Double)]
        .toDF("query_id", "doc_id", "bm25").filter(lit(false))
    val fbF = fb.toDF("query_id", "doc_id", "s")

    // relevance models: feedback docs re-read under a point filter, full
    // tokens exploded (≤ |batch|·N docs), per-query mass via anti-join
    // against the query's OWN terms
    val exp = docs.filter(col("doc_id").isin(fb.map(_._2).distinct: _*))
      .select(col("doc_id"), Text.tokens(col(textCol)).as("toks"))
      .join(broadcast(fbF), "doc_id")
      .select(col("query_id"), col("doc_id"), col("s"),
        size(col("toks")).cast("double").as("dl"),
        explode(col("toks")).as("term"))
      .join(broadcast(qTermsF), Seq("query_id", "term"), "left_anti")
      .groupBy(col("query_id"), col("doc_id"), col("s"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .groupBy(col("query_id"), col("term"))
      .agg(round(sum(col("tf") / col("dl") * col("s")) + lit(1e-9), 4).as("w"))
      .filter(col("w") > 0)
      .withColumn("rn",
        row_number().over(wq.orderBy(col("w").desc, col("term").asc)))
      .filter(col("rn") <= fbTerms)
      .select(col("query_id"), col("term"), col("w"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      // selection order (w desc, term asc) per query: the per-query mass
      // sums below must fold in the SAME order as the single-query arm's
      // collected top-M, or tot drifts by ulps and row identity breaks
      .sortBy { case (q, t, w) => (q, -w, t) }.toSeq

    // interpolated per-query weights (λ/|q| originals; (1-λ)·w/tot
    // expansions — tot summed in selection order, the single-query rule)
    val nTerms = qTermPairs.groupBy(_._1).map { case (q, ts) => q -> ts.length }
    val tots = exp.groupBy(_._1).map { case (q, ws) => q -> ws.map(_._3).sum }
    val weights =
      qTermPairs.map { case (q, t) => (q, t, lambda / nTerms(q)) } ++
        exp.flatMap { case (q, t, w) =>
          val tot = tots(q)
          if (tot <= 0) None
          else Some((q, t, (1.0 - lambda) * w / tot))
        }
    val wF = weights.toDF("query_id", "term", "qw")

    // stage 2: ONE weighted batch pass over the expanded union term set.
    // Corpus scalars are REUSED from stage 1 — n_docs and avgdl derive
    // from the full token counts, not the term filter, so stage 2's own
    // aggregate would recompute the identical values (r18, guide §1.2).
    val termSet2 = weights.map(_._2).distinct
    val (tf2, df2, _) = tfOver(termSet2)
    tf2.join(broadcast(wF), "term")
      .join(broadcast(df2), "term")
      .crossJoin(broadcast(stats1))
      .withColumn("w", Bm25.bm25Weight * col("qw"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w")).as("bm25"))
  }

  /** A10rb driver entry: batch RM3 top-10 per query with snippets. */
  def ragBm25Rm3Batch(spark: SparkSession, sfDir: String,
                      queries: Seq[String] = BatchQueries,
                      topK: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val scores = rm3ScoresBatchOver(docs, "text", queries)
    val wq = Window.partitionBy(col("query_id"))
    scores.join(docs, "doc_id")
      .select(col("query_id"), col("doc_id"),
        round(col("bm25") + lit(1e-9), 4).as("rm3"),
        substring(col("text"), 1, 80).as("snippet"))
      .withColumn("rn",
        row_number().over(wq.orderBy(col("rm3").desc, col("doc_id").asc)))
      .filter(col("rn") <= topK).drop("rn")
      .orderBy(col("query_id").asc, col("rm3").desc, col("doc_id").asc)
  }
}
