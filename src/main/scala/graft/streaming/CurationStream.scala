package graft.streaming

import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming curation ingest — the continuous twin of the §2 F batch passes
  * (the "watch mode" shape for a training-data pipeline: new corpus files
  * land, each document is normalized / scrubbed / scored on arrival).
  *
  * Every transform here is stateless (pure projection), so the stream needs
  * no watermark or state store: Structured Streaming runs the same narrow
  * plan per micro-batch that the batch twin runs per partition — the spec
  * asserts literal equality of the two results.
  */
object CurationStream {

  val rawSchema: StructType = graft.Tables.documentsStreamSchema

  /** The shared per-document curation projection (normalize + PII counts on
    * the raw text + token stats) — applied identically to the stream and to
    * the batch twin so equality is by construction testable.
    */
  def curate(docs: DataFrame): DataFrame = {
    import graft.operators.Pipeline.{normExpr, EmailRe, Ipv4Re, PhoneRe}
    docs.select(
      col("doc_id"), col("lang"),
      normExpr(col("text")).as("norm_text"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
  }

  def curated(spark: SparkSession, sfDir: String): DataFrame =
    curate(spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir))

  def runToCompletion(spark: SparkSession, sfDir: String,
                      queryName: String = "curation_stream"): DataFrame = {
    val q = curated(spark, sfDir)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  /** Streaming tempered-mixture sampling — F6's ingest twin. The per-source
    * rate table comes from a BATCH census snapshot (rates move with corpus
    * demography, not per-arrival) and broadcast-joins into the arrival
    * stream (stream-static join, stateless filter); selection is the same
    * deterministic doc_id hash, so the streamed sample equals the batch
    * sample row-for-row (spec-asserted).
    */
  def sampledMixture(spark: SparkSession, sfDir: String, rates: DataFrame): DataFrame =
    graft.operators.Pipeline.applyMixture(
      spark.readStream
        .schema(rawSchema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sfDir),
      rates)

  def runMixtureToCompletion(spark: SparkSession, sfDir: String, rates: DataFrame,
                             queryName: String = "mixture_stream"): DataFrame = {
    val q = sampledMixture(spark, sfDir, rates)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  /** Streaming DSIR scoring — F8's ingest twin (r12). The LLR snapshot
    * comes from a BATCH census ([[graft.operators.Pipeline.dsirSnapshot]] —
    * like F6's rate table, distributions move with corpus demography,
    * not per-arrival) and is collected to a ≤buckets+1-entry literal
    * lookup map (the bounded-broadcast discipline). Each arriving
    * candidate scores PER ROW — a fold over its own tokens, bucket →
    * LLR with the sentinel default for vocabulary the snapshot never
    * saw — so the stream stays stateless: no explode, no groupBy, no
    * watermark. The Gumbel key reuses the batch expression, so a
    * streamed row's (log_w, dsir_key) equals the batch scorer's within
    * float-summation-order tolerance (spec-asserted; top-k is a global
    * rank and stays a batch/downstream concern).
    */
  def dsirScored(docs: DataFrame, snap: graft.operators.Pipeline.DsirSnapshot,
                 targetPred: org.apache.spark.sql.Column): DataFrame = {
    import graft.operators.Pipeline
    val lut = typedlit(snap.llr)
    val logW = aggregate(
      Text.tokens(coalesce(col("text"), lit(""))),
      lit(0.0),
      (acc, t) => acc + coalesce(
        element_at(lut, pmod(Text.stringCode(t), lit(snap.buckets.toLong))),
        lit(snap.default)))
    docs.filter(!targetPred)
      .select(col("doc_id"), logW.as("log_w"))
      .withColumn("dsir_key", col("log_w") + Pipeline.dsirGumbel(col("doc_id")))
      .select(col("doc_id"),
        round(col("log_w") + lit(1e-9), 4).as("log_w"),
        round(col("dsir_key") + lit(1e-9), 4).as("dsir_key"))
  }

  /** Streaming decontamination — F5b's ingest twin (r12): the benchmark
    * Bloom filter is a BATCH artifact (it changes when the benchmark
    * does, not per arrival) broadcast into a stateless per-row check on
    * the arrival stream, the same snapshot-then-stream discipline as the
    * mixture and DSIR twins. Uses the identical shingle codes and filter
    * object as the batch pass, so streamed counts equal batch counts
    * row-for-row (spec-asserted).
    */
  def contaminationScored(spark: SparkSession, docs: DataFrame,
                          bf: org.apache.spark.util.sketch.BloomFilter,
                          k: Int = 5): DataFrame =
    graft.operators.Pipeline.bloomScore(docs, bf, k) // ONE probe core

  def runContaminationToCompletion(spark: SparkSession, sfDir: String,
                                   bf: org.apache.spark.util.sketch.BloomFilter,
                                   queryName: String = "contamination_stream"): DataFrame = {
    val q = contaminationScored(spark,
      spark.readStream
        .schema(rawSchema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sfDir),
      bf)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  /** Streaming LEXICAL scoring — the postings store's ingest twin (r14):
    * arrivals score by BM25 against a FROZEN [[graft.operators.Bm25Store.LexSnapshot]]
    * (each query term's df from the store + the corpus scalars, riding the
    * plan as literals), the same snapshot-then-stream discipline as the
    * DSIR and Bloom twins — the alerting/routing shape: "score everything
    * that arrives against this standing query". Stateless per-row fold,
    * append mode, no state store; spec-equal row-for-row to the batch
    * snapshot scorer (ONE shared scoring core).
    */
  def lexScored(docs: DataFrame,
                snap: graft.operators.Bm25Store.LexSnapshot): DataFrame =
    graft.operators.Bm25Store.scoreWithSnapshot(docs, "text", snap)

  def runLexToCompletion(spark: SparkSession, sfDir: String,
                         snap: graft.operators.Bm25Store.LexSnapshot,
                         queryName: String = "lex_stream"): DataFrame = {
    val q = lexScored(
      spark.readStream
        .schema(rawSchema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sfDir),
      snap)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  def runDsirToCompletion(spark: SparkSession, sfDir: String,
                          snap: graft.operators.Pipeline.DsirSnapshot,
                          targetPred: org.apache.spark.sql.Column,
                          queryName: String = "dsir_stream"): DataFrame = {
    val q = dsirScored(
      spark.readStream
        .schema(rawSchema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sfDir),
      snap, targetPred)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
