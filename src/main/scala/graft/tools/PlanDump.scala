package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for declared queries to files, for the
  * optimization-round plan receipts (plans/r18/<query>_<tag>.txt).
  *
  *   runMain graft.tools.PlanDump <sfDir> <outDir> <tag> [query...]
  *
  * With no query names, dumps every entry in [[SparkEntry.benchQueries]].
  * Construction alone triggers the `ensure*Index` builds embedded in the
  * served arms' lambdas — acceptable here: the dump is a tooling pass,
  * not a timed path.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.benchQueries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      try {
        val df = SparkEntry.benchQueries(n)(spark, sfDir)
        // GRAFT_PLAN_EXECUTED=1: run the query first so the dump shows the
        // FINAL adaptive plan (AQE stage reuse / coalesced reads are
        // invisible in the initial explain)
        // collect(), not count(): count() wraps the frame in a NEW query
        // execution, leaving df's own plan unexecuted (isFinalPlan=false)
        if (sys.env.get("GRAFT_PLAN_EXECUTED").contains("1")) df.collect()
        val s = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        val w = new java.io.PrintWriter(s"$outDir/${n}_$tag.txt")
        try w.write(s) finally w.close()
        println(s"[plandump] $n ok (${s.length} chars)")
      } catch {
        case e: Throwable => println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
