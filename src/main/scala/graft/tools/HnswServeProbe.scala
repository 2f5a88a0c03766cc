package graft.tools

import graft.operators.AnnHnsw
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serve-only timing against an EXISTING hnsw store — the receipt for
  * serve-path changes (r17: the top-run layer-skip) without paying a
  * rebuild: min-of-3 timed batches after one warmup, plus the
  * scored-candidates count, on the store a prior ScaleReceipt run built.
  *
  * Usage: runMain graft.tools.HnswServeProbe <hnswStorePath> [nQueries] [stride]
  * `stride` replicates ScaleReceipt's query rule (vec_id % stride == 0,
  * vec_id < nQueries·stride — one DISTINCT source vector per query on the
  * replicated corpus) so probe timings compare against receipt lines;
  * stride 1 degenerates to the first nQueries ids.
  */
object HnswServeProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft_scale/hnsw")
    val nQ = if (args.length > 1) args(1).toInt else 16
    val stride = if (args.length > 2) args(2).toLong else 1L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = spark.read.parquet(path + "/vectors")
      .filter(col("vec_id") % stride === 0 && col("vec_id") < nQ * stride)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      .cache()
    queries.count()
    def timeOnce(): Double = {
      val t0 = System.nanoTime()
      AnnHnsw.annHnswServedOver(spark, path, queries, topK = 10).count()
      (System.nanoTime() - t0) / 1e9
    }
    timeOnce() // warm
    val best = (1 to 3).map(_ => timeOnce()).min
    val acc = spark.sparkContext.longAccumulator("scored")
    AnnHnsw.annHnswServedOver(spark, path, queries, topK = 10,
      counter = Some(acc)).count()
    println(s"""{"metric":"hnsw_serve_probe","path":"$path","n_queries":$nQ,""" +
      s""""serve_sec":${math.round(best * 1000) / 1000.0},"scored":${acc.value}}""")
    spark.stop()
  }
}
