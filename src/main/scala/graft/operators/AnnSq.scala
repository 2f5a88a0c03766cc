package graft.operators

import graft.Tables
import graft.plans.VecExprs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C4q: SQ8 scalar-quantized ANN — brute-force serving over the int8
  * max-abs quantized corpus (the C4 `embed_quantize` artifacts), queries
  * kept full-precision (ASYMMETRIC distance, the SQ convention every
  * vector store ships as its cheapest compression tier).
  *
  * Unlike the trained compression arms (PQ/OPQ/IVFADC — k-means
  * codebooks, rows-only by design), SQ8's encode is closed-form
  * (`round(x·127/maxabs)`), so quantize → dequantize → score is fully
  * deterministic arithmetic and this is the one compressed-serving arm
  * that runs under the DuckDB hash gate end-to-end. The dequantized
  * value rides the STORED artifacts exactly: `qval · scale / 127` with
  * `scale` the 6 dp-rounded per-vector max-abs the C4 driver query
  * persists — serving reads nothing the quantized store doesn't hold.
  *
  * Scale: the quantized corpus is a 4× smaller scan than float32 (the
  * point of SQ8 at 100 TB); scoring stays one broadcast-queries pass
  * with per-partition top-k, the C1 batch shape. AnnSqSpec bounds the
  * quantization error and the recall vs the exact C1 ranking.
  */
object AnnSq {

  /** Dequantized corpus vectors: `(vec_id, demb)` with
    * demb[i] = round(x_i·127/maxabs + 1e-9) · round(maxabs+1e-9, 6) / 127
    * — [[RagSearch.embedQuantize]]'s encode followed by its exact decode.
    */
  private[graft] def dequantized(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("maxabs", array_max(transform(col("emb"), x => abs(x))))
      .select(col("vec_id"),
        transform(col("emb"), x =>
          when(col("maxabs") > 0, round(x * 127.0 / col("maxabs") + lit(1e-9)))
            .otherwise(lit(0.0))
            * round(col("maxabs") + lit(1e-9), 6) / 127.0).as("embedding"))

  /** C4q: the C1 batch ANN over the SQ8-dequantized corpus — same query
    * set, same rank/tie/round conventions, so recall against C1 is an
    * apples-to-apples compression receipt.
    */
  def annSq8(spark: SparkSession, sfDir: String,
             nQueries: Int = 10, k: Int = 5): DataFrame = {
    VecExprs.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
    val scored = RagSearch.withCosineScore(dequantized(e), q, "score", nudged = false)
      .select(col("query_id"), col("vec_id"), col("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("score"))
      .orderBy("query_id", "rank")
  }
}
