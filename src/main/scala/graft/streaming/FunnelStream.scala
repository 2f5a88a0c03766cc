package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of E16's funnel (`Analytics.funnel`) via
  * `flatMapGroupsWithState`: per user, buffer the funnel-step event
  * timestamps as they arrive (ANY order, within or across micro-batches)
  * and re-derive the greedy chain — t1 = min step-1 ts; t_k = min step-k
  * ts strictly after t_{k-1} and within t1 + window — emitting the user's
  * CURRENT reach each batch. Update-mode re-emissions supersede by epoch
  * (a late-arriving earlier step-1 event can move the anchor and LOWER a
  * user's reach, so earlier emissions must not survive — same collapse
  * discipline as SessionStream's buffered fold).
  *
  * State: per user, the sorted timestamp lists of ONLY the funnel's step
  * types (non-funnel events never reach the fold — filtered scan-side).
  * A watermark-sealed variant would evict timestamps once the watermark
  * passes anchor + window (SessionStream.foldGroupBuffered demonstrates
  * that machinery); kept unsealed here because the CHAIN semantics, not
  * the eviction, is this operator — the batch-equality spec is the
  * contract.
  */
object FunnelStream {

  case class FEv(user_id: Long, step: Int, tsUs: Long)
  case class FunnelBuf(byStep: Seq[Seq[Long]], epoch: Long)
  case class ReachRow(user_id: Long, reach: Int, t1_us: Long, epoch: Long)

  /** The greedy chain shared with the batch semantics: (reach, anchor µs).
    * reach = number of steps completed in order within the anchored
    * window; 0 with no step-1 event.
    */
  private[graft] def chain(byStep: Seq[Seq[Long]], windowUs: Long): (Int, Long) = {
    if (byStep.isEmpty || byStep.head.isEmpty) return (0, 0L)
    val t1 = byStep.head.min
    var prev = t1
    var reach = 1
    var k = 1
    while (k < byStep.length) {
      val next = byStep(k).iterator
        .filter(ts => ts > prev && ts <= t1 + windowUs)
        .foldLeft(Long.MaxValue)(math.min)
      if (next == Long.MaxValue) return (reach, t1)
      prev = next
      reach += 1
      k += 1
    }
    (reach, t1)
  }

  def foldGroup(nSteps: Int, windowUs: Long)(
      userId: Long, rows: Iterator[FEv],
      state: GroupState[FunnelBuf]): Iterator[ReachRow] = {
    val prev = state.getOption
      .getOrElse(FunnelBuf(Vector.fill(nSteps)(Vector.empty), 0L))
    val add = rows.toSeq.groupBy(_.step)
    val merged = (0 until nSteps).map(k =>
      (prev.byStep(k) ++ add.getOrElse(k, Seq.empty).map(_.tsUs)).sorted)
    val epoch = prev.epoch + 1
    state.update(FunnelBuf(merged, epoch))
    val (reach, t1) = chain(merged, windowUs)
    Iterator.single(ReachRow(userId, reach, t1, epoch))
  }

  def funnelReach(spark: SparkSession, dir: String,
                  steps: Seq[String] = Seq("view", "click", "purchase"),
                  windowSec: Long = 86400L,
                  maxFilesPerTrigger: Option[Int] = None,
                  glob: Option[String] = Some("events.parquet")): Dataset[ReachRow] = {
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val idxExpr = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (s, i)) =>
        when(col("event_type") === s, lit(i)).otherwise(acc)
      }
    graft.Tables.eventsStream(spark, dir, glob = glob,
        maxFilesPerTrigger = maxFilesPerTrigger)
      .filter(col("event_type").isin(stepIdx.keys.toSeq: _*))
      .select(col("user_id"), idxExpr.as("step"),
        expr("unix_micros(ts)").as("tsUs"))
      .as[FEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(foldGroup(steps.length, windowSec * 1000000L))
  }

  /** Drive a finite directory to completion; per user, only the
    * latest-epoch emission is current (earlier ones may over- OR
    * under-state reach while events are still arriving).
    */
  def runToCompletion(spark: SparkSession, dir: String,
                      steps: Seq[String] = Seq("view", "click", "purchase"),
                      windowSec: Long = 86400L,
                      maxFilesPerTrigger: Option[Int] = None,
                      glob: Option[String] = Some("events.parquet"),
                      queryName: String = "funnel_stream"): DataFrame = {
    val q = funnelReach(spark, dir, steps, windowSec, maxFilesPerTrigger, glob)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val emissions = spark.table(queryName)
    val latest = emissions.groupBy(col("user_id").as("u"))
      .agg(max(col("epoch")).as("max_epoch"))
    emissions.join(latest,
        col("user_id") === col("u") && col("epoch") === col("max_epoch"))
      .select(col("user_id"), col("reach"), col("t1_us"))
  }

  /** The batch rollup derived from streamed reach rows: row k's n_users =
    * users with reach ≥ k — comparable 1:1 with `Analytics.funnel`.
    */
  def rollup(reach: DataFrame, steps: Seq[String]): DataFrame = {
    val spark = reach.sparkSession
    import spark.implicits._
    val counts = steps.indices.map { i =>
      reach.filter(col("reach") >= i + 1).count()
    }
    val c1 = counts.head
    steps.indices.map { i =>
      ((i + 1).toLong, steps(i), counts(i),
        if (c1 > 0) BigDecimal(counts(i).toDouble / c1 + 1e-9)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        else 0.0)
    }.toDF("step", "step_name", "n_users", "conversion")
  }
}
