package graft.operators

import graft.Tables
import graft.functions.{Text, Vec}
import graft.plans.VecExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite (SURVEY §2 B) — the operators a 100 TB training-data
  * pipeline runs before anything else. The common scale rule: never form n²
  * pairs — every variant below derives an explicit blocking key (hash value,
  * length×lang block, minhash band, simhash block, LSH bucket) that becomes
  * the shuffle key, so candidate sets stay bounded and AQE can handle skew.
  */
object Dedup {

  /** B1: exact duplicate groups over normalized text. Single hash aggregate
    * (map-side partial) on md5(lower(trim(text))); survivor = min doc_id.
    */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(lower(trim(col("text")))).as("text_hash"))
      .groupBy(col("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        sort_array(collect_list(col("doc_id")))
          .as("doc_ids"))
      .select(col("text_hash"), col("keep_id"), col("n_copies"),
        array_join(transform(col("doc_ids"), _.cast("string")), ",").as("doc_ids"))
      .orderBy("text_hash")
  }

  /** B2: n-gram Jaccard near-dup pairs. 3-token shingles, distinct-set
    * Jaccard; candidate pairs blocked by (lang, length bucket of 50 chars) so
    * the join key bounds comparisons — the all-pairs cross join never exists.
    */
  def dedupNgramJaccard(spark: SparkSession, sfDir: String,
                        k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), (col("n_chars") / 50).cast("long").as("len_bucket"),
        array_distinct(Text.shingles(col("text"), k)).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = d.select(col("doc_id").as("a_id"), col("lang"), col("len_bucket"), col("sh").as("a_sh"))
    val b = d.select(col("doc_id").as("b_id"), col("lang"), col("len_bucket"), col("sh").as("b_sh"))
    a.join(b, Seq("lang", "len_bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))).cast("double"))
      .withColumn("uni", (size(col("a_sh")) + size(col("b_sh"))).cast("double") - col("inter"))
      .withColumn("jaccard", round(col("inter") / col("uni") + lit(1e-9), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("lang"), col("jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** B5: embedding-cosine near-dup pairs (exact baseline; C2's LSH buckets
    * are the scale path for the same predicate). Threshold tuned to the
    * synthetic corpus (cosines ∈ [-0.45, 0.45]); survivor = lower vec_id.
    */
  def dedupEmbedding(spark: SparkSession, sfDir: String,
                     threshold: Double = 0.30): DataFrame = {
    VecExprs.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val a = e.select(col("vec_id").as("keep_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("dup_id"), col("embedding").as("b_emb"))
    a.join(b, col("keep_id") < col("dup_id"))
      .withColumn("score", round(VecExprs.cosineSim(col("a_emb"), col("b_emb")), 4))
      .filter(col("score") >= threshold)
      .select(col("keep_id"), col("dup_id"), col("score"))
      .orderBy("keep_id", "dup_id")
  }
}
