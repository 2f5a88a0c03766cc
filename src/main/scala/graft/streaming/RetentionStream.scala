package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of E17's cohort retention (`Analytics.retention`) via
  * `flatMapGroupsWithState`: per user, the state is the set of DISTINCT
  * epoch-weeks seen so far — cohort = its minimum, offsets = every week
  * minus it. Arrivals in ANY order, within or across micro-batches: a
  * late event from an EARLIER week moves the user's cohort back and
  * re-bases every offset (the retroactive case the batch job gets for
  * free and a stream must re-derive — spec-pinned), so emissions
  * supersede by epoch exactly like [[FunnelStream]]'s reach rows.
  *
  * State per user: one Long per distinct active week — bounded by the
  * user's active lifetime in weeks, not by event volume (a 10⁶-event
  * week is one entry). The rollup of the latest emissions equals the
  * batch operator's (cohort_week, week_offset, n_users) rows
  * (spec-asserted).
  */
object RetentionStream {

  case class REv(user_id: Long, week: Long)
  case class WeekSet(weeks: Seq[Long], epoch: Long)
  case class CohortRow(user_id: Long, cohort_week: Long,
                       weeks: Seq[Long], epoch: Long)

  val WeekUs: Long = 7L * 86400L * 1000000L

  def foldGroup(userId: Long, rows: Iterator[REv],
                state: GroupState[WeekSet]): Iterator[CohortRow] = {
    val prev = state.getOption.getOrElse(WeekSet(Vector.empty, 0L))
    val merged = (prev.weeks ++ rows.map(_.week)).distinct.sorted
    val epoch = prev.epoch + 1
    state.update(WeekSet(merged, epoch))
    Iterator.single(CohortRow(userId, merged.head, merged, epoch))
  }

  def cohorts(spark: SparkSession, dir: String,
              maxFilesPerTrigger: Option[Int] = None,
              glob: Option[String] = Some("events.parquet")): Dataset[CohortRow] = {
    import spark.implicits._
    graft.Tables.eventsStream(spark, dir, glob = glob,
        maxFilesPerTrigger = maxFilesPerTrigger)
      .select(col("user_id"),
        floor(expr("unix_micros(ts)") / WeekUs).as("week"))
      .as[REv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(foldGroup)
  }

  /** Drive a finite directory to completion; per user only the
    * latest-epoch emission is current.
    */
  def runToCompletion(spark: SparkSession, dir: String,
                      maxFilesPerTrigger: Option[Int] = None,
                      glob: Option[String] = Some("events.parquet"),
                      queryName: String = "retention_stream"): DataFrame = {
    val q = cohorts(spark, dir, maxFilesPerTrigger, glob)
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
      .select(col("user_id"), col("cohort_week"), col("weeks"))
  }

  /** The batch-comparable rollup of streamed cohort rows — 1:1 with
    * `Analytics.retention`'s output.
    */
  def rollup(cohortRows: DataFrame): DataFrame =
    cohortRows
      .select(col("user_id"), col("cohort_week"), explode(col("weeks")).as("week"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
}
