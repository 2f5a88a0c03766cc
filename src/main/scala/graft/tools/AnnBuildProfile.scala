package graft.tools

import graft.Tables
import graft.operators.{AnnGraph, AnnHnsw, AnnIvf}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build-cost decomposition for the graph/HNSW store family at receipt
  * scale — the measurement behind any build-path optimization claim
  * (SURVEY §4: "hnsw build 435 s, dominated by the quantizer" was an
  * attribution from wall-clock ordering, not a split; this tool makes the
  * split data). Same corpus synthesis as ScaleReceipt so numbers compare.
  *
  * Decomposition by containment (the three builds share a prefix):
  *   t_train                    = quantizer k-means alone
  *   t_graph  − t_train         ≈ assignment + layer-0 per-cell kNN write
  *   t_hnsw   − t_graph         ≈ upper layers (per-layer k-means +
  *                                diversified adjacency + staged writes)
  *
  * Usage: runMain graft.tools.AnnBuildProfile [srcSfDir] [workDir] [scale]
  */
object AnnBuildProfile {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1) else "/tmp/graft_annprof"
    val scale = if (args.length > 2) args(2).toInt else 120
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // corpus dir keyed on scale: a rerun with a different `scale` against
    // the same workDir must rebuild, not silently profile the old corpus
    // (r17 advisor finding)
    val dir = work + s"/corpus_x$scale"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val embPath = new org.apache.hadoop.fs.Path(dir, "embeddings.parquet")
    if (!fs.exists(embPath)) {
      Tables.embeddings(spark, src)
        .withColumn("rep", explode(sequence(lit(0), lit(scale - 1))))
        .select(
          (col("vec_id") * scale + col("rep")).as("vec_id"),
          // cast back to array<float>: transform() promotes to double, but
          // the receipt corpus (and every real store) is float-typed — a
          // double-width profiled corpus would skew read-cost attribution
          transform(col("embedding"),
            x => (x * (lit(1.0) + (col("rep") % 97) / lit(1000.0)))
              .cast("float")).as("embedding"),
          col("label"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(embPath.toString)
    }
    val n = spark.read.parquet(embPath.toString).count()
    val kGraph = math.max(64, (n / 1024L).toInt)

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    graft.plans.VecExprs.register(spark)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val (_, tTrain) = time(AnnIvf.trainOver(e, kGraph))
    fs.delete(new org.apache.hadoop.fs.Path(work + "/graph"), true)
    fs.delete(new org.apache.hadoop.fs.Path(work + "/hnsw"), true)
    val (_, tGraph) = time(
      AnnGraph.ensureGraphIndex(spark, dir, work + "/graph", k = kGraph))
    val (_, tHnsw) = time(
      AnnHnsw.ensureHnswIndex(spark, dir, work + "/hnsw", k = kGraph))
    def r(x: Double) = math.round(x * 1000) / 1000.0
    println(
      s"""{"metric":"ann_build_profile","n_vectors":$n,"k":$kGraph,""" +
        s""""train_sec":${r(tTrain)},"graph_build_sec":${r(tGraph)},""" +
        s""""hnsw_build_sec":${r(tHnsw)},""" +
        s""""layer0_est_sec":${r(tGraph - tTrain)},""" +
        s""""upper_layers_est_sec":${r(tHnsw - tGraph)}}""")
    spark.stop()
  }
}
