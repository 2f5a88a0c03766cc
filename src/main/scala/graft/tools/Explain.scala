package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Ad-hoc plan + timing inspector: runMain graft.tools.Explain <sfDir> <query...> */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (sys.env.get("GRAFT_EXPLAIN").contains("1")) df.explain("formatted")
      val t0 = System.nanoTime()
      val c = df.count()
      val t1 = System.nanoTime()
      val c2 = df.count()
      val t2 = System.nanoTime()
      println(f"[explain] $n rows=$c first=${(t1 - t0) / 1e9}%.2fs second=${(t2 - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
