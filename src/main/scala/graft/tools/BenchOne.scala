package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Bench-methodology timing of a few queries in one session: same conf as
  * graft.Bench, one untimed warmup + N timed count() samples per query —
  * for optimization-round A/B without a full 101-query run (cross-JVM
  * bench noise at sf0.1 is ±0.3 s per query; same-session samples are
  * comparable). r19: each sample also reports its SCHEDULED JOB count —
  * the deterministic receipt for driver-round optimizations that sf0.1
  * seconds cannot evidence (8c ≈ 32c totals; every query is
  * fixed-overhead-bound at this SF) — and component names
  * (`ann_graph.build` etc.) resolve too.
  * Usage: runMain graft.tools.BenchOne <sfDir> <query-or-component...>
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
    val verbose = sys.env.get("GRAFT_JOBS_VERBOSE").contains("1")
    class JobCounter extends SparkListener {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val descs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        n.incrementAndGet()
        if (verbose) descs.add(
          j.stageInfos.map(si => si.name.takeWhile(_ != '\n')).mkString(" | "))
      }
    }
    graft.Tables.names.foreach { t =>
      try graft.Tables.load(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    args.tail.foreach { n =>
      val fn = (SparkEntry.benchQueries ++ SparkEntry.benchComponents)(n)
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        println(s"[benchone] $n warmup failed: ${e.getMessage}") }
      val samples = (1 to reps).map { _ =>
        val c = new JobCounter
        spark.sparkContext.addSparkListener(c)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // async listener bus settle before reading the count
        spark.sparkContext.removeSparkListener(c)
        (sec, c.n.get(), c.descs.toArray(Array.empty[String]))
      }
      println(f"[benchone] $n min=${samples.map(_._1).min}%.3f " +
        f"samples=${samples.map(s => f"${s._1}%.3f").mkString(",")} " +
        s"jobs=${samples.map(_._2).mkString(",")}")
      samples.last._3.foreach(d => println(s"[benchone]   job: $d"))
    }
    spark.stop()
  }
}
