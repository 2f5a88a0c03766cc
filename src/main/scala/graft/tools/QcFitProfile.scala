package graft.tools

import graft.operators.TextAnalysis
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Receipt tool for the quality_classifier featurize-once question (r19
  * VERDICT item 7): during `qualityClassifierFit`, does each of the maxIter
  * L-BFGS iterations re-evaluate the tokenize+HashingTF feature plan from
  * parquet, or does MLlib's internal instance persist cover them?
  *
  * Evidence printed: scheduled job count, total executor input bytes read
  * (file-source reads only — cached-block reads don't count as input), and
  * the same two numbers for ONE plain featurize pass as the unit. If fit's
  * input bytes ≈ 1-2 featurize units, the iterations run off MLlib's
  * internal persist and a caller-side pin would only add memory pressure;
  * ≈ maxIter units would mean featurization re-runs per iteration.
  *
  * Usage: runMain graft.tools.QcFitProfile [sfDir] [maxIter]
  */
object QcFitProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxIter = if (args.length > 1) args(1).toInt else 15
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    class Meter extends SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val inputBytes = new java.util.concurrent.atomic.AtomicLong(0L)
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          inputBytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    }
    def measured[T](body: => T): (T, Int, Long, Double) = {
      val m = new Meter
      spark.sparkContext.addSparkListener(m)
      try {
        val t0 = System.nanoTime()
        val r = body
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // async listener bus settle
        (r, m.jobs.get(), m.inputBytes.get(), sec)
      } finally spark.sparkContext.removeSparkListener(m)
    }

    val input = TextAnalysis.qualityClassifierInput(spark, sfDir)
    // warmup: touch the table + codegen once
    input.count()
    // the unit: one full featurize pass materialized via noop-equivalent
    // count over the feature frame the fit consumes
    val (_, uJobs, uBytes, uSec) = measured {
      TextAnalysis.qualityClassifierScoreWith(
        TextAnalysis.qualityClassifierFit(input, col("is_target"), maxIter = 1),
        input, col("is_target")).count()
    }
    val (_, fJobs, fBytes, fSec) = measured {
      TextAnalysis.qualityClassifierFit(input, col("is_target"), maxIter = maxIter)
    }
    println(s"""{"metric":"qc_fit_profile","max_iter":$maxIter,""" +
      s""""fit_jobs":$fJobs,"fit_input_mb":${fBytes / 1048576.0},""" +
      s""""fit_sec":$fSec,""" +
      s""""oneiter_fit_plus_score_jobs":$uJobs,""" +
      s""""oneiter_input_mb":${uBytes / 1048576.0},"oneiter_sec":$uSec}""")
    spark.stop()
  }
}
