package graft

import graft.operators.{Bm25Store, Rm3}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** The receipt batch RM3 exists for (VERDICT r14 #6): the windowed
  * one-pipeline batch arm must beat |batch| sequential store-served RM3
  * calls on the same query set — in SCHEDULED JOBS (deterministic: the
  * batch arm replaces per-query orderBy/limit job cascades with shared
  * per-query windows) and in wall-clock (min-of-reps, the drift gate's
  * contention discipline). A future change that quietly makes the batch
  * pipeline slower than the loop it replaces fails here.
  */
class Rm3BatchEconomicsSpec extends SparkSpecBase {

  private class JobCounter extends SparkListener {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    override def onJobStart(jobStart: SparkListenerJobStart): Unit = n.incrementAndGet()
  }

  private def measured[T](body: => T): (T, Int, Double) = {
    val c = new JobCounter
    spark.sparkContext.addSparkListener(c)
    try {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      // the listener bus is async (and private) — a short settle beats
      // losing trailing onJobStart events; counts only need to be stable,
      // not instant
      Thread.sleep(300)
      (r, c.n.get(), sec)
    } finally spark.sparkContext.removeSparkListener(c)
  }

  test("batch RM3 beats |batch| sequential served calls: fewer jobs, less wall-clock") {
    val queries = Rm3.BatchQueries
    // the served singles need the postings store — built once, outside
    // any timed window (the gate pays it on the first ensure; the receipt
    // compares steady-state serving, not index builds)
    Bm25Store.ensureDocLexIndex(spark, sf, Bm25Store.defaultIndexPath(sf))
    def runSingles(): Unit =
      queries.foreach(q => Rm3.ragBm25Rm3Served(spark, sf, q).count())
    def runBatch(): Unit = Rm3.ragBm25Rm3Batch(spark, sf, queries).count()
    // one untimed warmup each (codegen + FS cache), then min-of-3
    runSingles(); runBatch()
    val singles = (1 to 3).map(_ => measured(runSingles()))
    val batch = (1 to 3).map(_ => measured(runBatch()))
    val singleJobs = singles.map(_._2).min
    val batchJobs = batch.map(_._2).min
    val singleSec = singles.map(_._3).min
    val batchSec = batch.map(_._3).min
    info(f"singles: $singleJobs jobs, $singleSec%.2f s (min of 3); " +
      f"batch: $batchJobs jobs, $batchSec%.2f s (min of 3)")
    // deterministic half: the one-pipeline arm schedules fewer jobs than
    // the |batch|-loop (each single serve runs its own feedback/expansion
    // collects and final action)
    assert(batchJobs < singleJobs,
      s"batch arm scheduled $batchJobs jobs vs $singleJobs for the loop")
    // wall-clock half, min-of-reps: the batch arm must not be slower than
    // the loop it replaces (measured ~2x faster; asserting parity leaves
    // contention headroom without hiding a real inversion)
    assert(batchSec < singleSec,
      f"batch arm slower than the sequential loop: $batchSec%.2f s vs $singleSec%.2f s")
  }

  test("batch RM3 rows stay identical to the single served arm (the economics change nothing)") {
    val queries = Rm3.BatchQueries
    Bm25Store.ensureDocLexIndex(spark, sf, Bm25Store.defaultIndexPath(sf))
    val batch = Rm3.ragBm25Rm3Batch(spark, sf, queries).collect()
      .groupBy(_.getLong(0))
    queries.zipWithIndex.foreach { case (q, i) =>
      val single = Rm3.ragBm25Rm3Served(spark, sf, q).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
      val b = batch(i.toLong).map(r =>
        (r.getLong(1), r.getDouble(2), r.getString(3))).toSeq
      assert(b == single.toSeq, s"query $i diverged between batch and single arm")
    }
  }
}
