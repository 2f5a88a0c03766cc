package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization (SURVEY §2 E5's streaming twin) via
  * `flatMapGroupsWithState` — the KeyValueGroupedDataset custom-state path.
  *
  * Per user: events are folded into an open-session state; a gap > 30 min
  * closes the session (emitted) and opens the next. Emitted rows carry the
  * per-user session ordinal so results line up with the batch
  * `Analytics.eventsSessionize` twin.
  *
  * Scale/ordering notes: state size is O(users); closed sessions leave state
  * immediately. Within a micro-batch events are sorted per group before the
  * fold; across micro-batches the fold assumes per-key in-order arrival
  * (kafka-per-key style). An out-of-order-tolerant variant would buffer
  * until the watermark — kept simple here because the semantics, not the
  * buffering, are the operator.
  */
object SessionStream {

  case class Ev(user_id: Long, event_id: Long, tsUs: Long, value: Double)
  case class OpenSession(ordinal: Long, startUs: Long, lastUs: Long, n: Long, sum: Double)
  case class SessionRow(user_id: Long, session_id: Long, n_events: Long, sum_value: Double)

  val GapUs: Long = 1800L * 1000000L

  /** The per-group fold. Emits sessions closed by this batch's events and the
    * (still open) trailing session; keeps only the open session in state.
    */
  def foldGroup(userId: Long, rows: Iterator[Ev],
                state: GroupState[OpenSession]): Iterator[SessionRow] = {
    val sorted = rows.toSeq.sortBy(e => (e.tsUs, e.event_id))
    var open: Option[OpenSession] = state.getOption
    val closed = scala.collection.mutable.ArrayBuffer[SessionRow]()
    for (e <- sorted) {
      open = open match {
        case Some(s) if e.tsUs - s.lastUs <= GapUs =>
          Some(s.copy(lastUs = e.tsUs, n = s.n + 1, sum = s.sum + e.value))
        case Some(s) =>
          closed += SessionRow(userId, s.ordinal, s.n, s.sum)
          Some(OpenSession(s.ordinal + 1, e.tsUs, e.tsUs, 1, e.value))
        case None =>
          Some(OpenSession(1, e.tsUs, e.tsUs, 1, e.value))
      }
    }
    open.foreach(state.update)
    // emit closed sessions plus the current open one (update semantics: the
    // open session's row is re-emitted, refined, as later batches extend it)
    (closed ++ open.map(s => SessionRow(userId, s.ordinal, s.n, s.sum))).iterator
  }

  def sessionized(spark: SparkSession, sfDir: String): Dataset[SessionRow] = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(EventStream.rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("tsUs"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(foldGroup)
  }

  /** Drive the finite input to completion; in update mode with one source
    * the last emitted row per (user, ordinal) is the final session.
    */
  def runToCompletion(spark: SparkSession, sfDir: String,
                      queryName: String = "session_stream"): DataFrame = {
    val q = sessionized(spark, sfDir)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()
    try {
      q.processAllAvailable()
      // The fold assumes per-key in-order arrival ACROSS batches; that holds
      // trivially when all input arrived in one micro-batch (the sort inside
      // foldGroup then covers total order). Assert it so the spec's
      // batch-equality guarantee stays honest if the source ever splits.
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      require(dataBatches <= 1,
        s"SessionStream.runToCompletion saw $dataBatches data micro-batches; " +
          "cross-batch ordering is not guaranteed — results may diverge from the batch twin")
    } finally q.stop()
    // collapse re-emissions: keep the final (largest n_events) row per key
    spark.table(queryName)
      .groupBy(col("user_id"), col("session_id"))
      .agg(max(struct(col("n_events"), col("sum_value"))).as("fin"))
      .select(col("user_id"), col("session_id"),
        col("fin.n_events").as("n_events"), col("fin.sum_value").as("sum_value"))
  }
}
