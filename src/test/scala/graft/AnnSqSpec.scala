package graft

import graft.operators.{AnnSq, RagSearch}
import org.apache.spark.sql.functions._

/** SQ8 scalar-quantized ANN — quantization error bounds and recall
  * against the exact C1 ranking (the compression receipt), plus the
  * determinism its hash-matched oracle rests on.
  */
class AnnSqSpec extends SparkSpecBase {

  test("dequantization error is bounded by half a quantization step") {
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("maxabs", array_max(transform(col("emb"), x => abs(x))))
    val deq = AnnSq.dequantized(graft.Tables.embeddings(spark, sf))
      .withColumnRenamed("embedding", "demb")
    val err = e.join(deq, "vec_id")
      .select(col("maxabs"),
        aggregate(zip_with(col("emb"), col("demb"), (a, b) => abs(a - b)),
          lit(0.0), (acc, x) => greatest(acc, x)).as("maxerr"))
      .collect()
    assert(err.nonEmpty)
    err.foreach { r =>
      val (maxabs, maxerr) = (r.getDouble(0), r.getDouble(1))
      // one int8 step is maxabs/127; round-to-nearest error ≤ half a step,
      // plus the 6dp scale rounding slack
      assert(maxerr <= 0.5 * maxabs / 127.0 + 1e-4,
        s"SQ8 error $maxerr exceeds half-step bound for maxabs=$maxabs")
    }
  }

  test("recall@5 vs the exact C1 ranking is near-lossless") {
    val exact = RagSearch.annTopKBatch(spark, sf)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = AnnSq.annSq8(spark, sf)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sq.nonEmpty && exact.nonEmpty)
    val recall = (sq & exact).size.toDouble / exact.size
    assert(recall >= 0.8,
      s"SQ8 int8 recall@5 vs exact must be near-lossless, got $recall")
  }

  test("store-served SQ8 equals the in-plan arm row for row") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_sq8").toString + "/idx"
    AnnSq.ensureSqIndex(spark, sf, path)
    // the stored representation is genuinely int8 + one scale per vector
    val sch = spark.read.parquet(path + "/vectors").schema
    assert(sch("qvals").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = true),
      s"store must hold int8 codes, got ${sch("qvals").dataType}")
    val served = AnnSq.annSq8Served(spark, sf, path)
      .collect().map(_.toSeq).toSeq
    val inPlan = AnnSq.annSq8(spark, sf).collect().map(_.toSeq).toSeq
    assert(served.nonEmpty && served == inPlan,
      "served SQ8 must be value-identical to the in-plan arm")
    // the gate doesn't rebuild a fresh store
    val fs = new org.apache.hadoop.fs.Path("/tmp")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mPath = new org.apache.hadoop.fs.Path(path, graft.operators.AnnStore.ManifestFile)
    val stamp = fs.getFileStatus(mPath).getModificationTime
    AnnSq.ensureSqIndex(spark, sf, path)
    assert(fs.getFileStatus(mPath).getModificationTime == stamp)
  }

  test("output shape and determinism") {
    val a = AnnSq.annSq8(spark, sf).collect().map(_.toSeq).toSeq
    val b = AnnSq.annSq8(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.nonEmpty)
    // per-query exactly k=5 rows ranked 1..5
    a.groupBy(_.head).foreach { case (_, rows) =>
      assert(rows.map(_(1)) == Seq(1L, 2L, 3L, 4L, 5L))
    }
  }
}
