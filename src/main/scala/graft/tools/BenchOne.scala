package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Bench-methodology timing of a few queries in one session: same conf as
  * graft.Bench, one untimed warmup + N timed count() samples per query —
  * for optimization-round A/B without a full 101-query run (cross-JVM
  * bench noise at sf0.1 is ±0.3 s per query; same-session samples are
  * comparable). Usage: runMain graft.tools.BenchOne <sfDir> <query...>
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.names.foreach { t =>
      try graft.Tables.load(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    args.tail.foreach { n =>
      val fn = SparkEntry.benchQueries(n)
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        println(s"[benchone] $n warmup failed: ${e.getMessage}") }
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchone] $n min=${samples.min}%.3f samples=${samples.map(s => f"$s%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
