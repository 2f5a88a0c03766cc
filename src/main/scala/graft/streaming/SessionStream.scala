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

  // ---- Out-of-order-tolerant variant (watermark-buffered) ----

  /** Per-user state for the buffered fold: sessions already emitted as
    * final (`nClosed`), and the events not yet safely closeable. The
    * watermark bounds the buffer: once `session end + gap < watermark`, no
    * admissible future event (ts ≥ watermark) can extend that session, so
    * its events are evicted and only the counter survives — bounded state
    * under arbitrary within-watermark disorder.
    */
  case class UserBuf(nClosed: Long, buf: Seq[(Long, Long, Double)], epoch: Long)

  /** Ev plus the watermarked event-time column — the `ts` attribute must
    * survive into the stateful operator's input or Spark loses the
    * watermark (getCurrentWatermarkMs then throws).
    */
  case class EvW(user_id: Long, event_id: Long, tsUs: Long, value: Double,
                 ts: java.sql.Timestamp)

  /** Output of the buffered fold. `sealed` rows are immutable (emitted
    * exactly once, when the watermark seals the session); unsealed rows are
    * the user's CURRENT view and are superseded by any later `epoch` — a
    * late bridge event can merge two previously-open sessions, so earlier
    * unsealed emissions must not survive the collapse (they'd be phantoms).
    */
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                        sum_value: Double, is_sealed: Boolean, epoch: Long)

  /** Buffered fold: merge new events into the per-user buffer (any order
    * within the watermark), emit sealed sessions once plus the refreshed
    * open view, and evict sealed events so only a counter survives.
    *
    * Runs under EventTimeTimeout, which (a) makes Spark drop sub-watermark
    * input rows before they reach this fold — the premise the seal
    * invariant needs (FlatMapGroupsWithStateExec filters late rows only
    * under EventTimeTimeout) — and (b) fires a timeout once the watermark
    * passes the last buffered event + gap, sealing an idle user's trailing
    * sessions so retired keys hold only the O(1) counter, not events.
    */
  def foldGroupBuffered(userId: Long, rows: Iterator[EvW],
                        state: GroupState[UserBuf]): Iterator[SessionOut] = {
    val prev = state.getOption.getOrElse(UserBuf(0L, Vector.empty, 0L))
    val epoch = prev.epoch + 1
    val merged =
      (prev.buf ++ (if (state.hasTimedOut) Iterator.empty else rows)
        .map(e => (e.tsUs, e.event_id, e.value)))
        .sortBy(t => (t._1, t._2))
    // sessionize the full buffer, numbering after the already-sealed count
    case class Seg(row: SessionOut, endUs: Long, startIdx: Int)
    val segs = scala.collection.mutable.ArrayBuffer[Seg]()
    var ord = prev.nClosed
    var n = 0L; var sum = 0.0; var lastUs = Long.MinValue; var segStart = 0
    var i = 0
    def close(): Unit = if (n > 0) {
      ord += 1
      segs += Seg(SessionOut(userId, ord, n, sum, is_sealed = false, epoch), lastUs, segStart)
    }
    while (i < merged.size) {
      val (ts, _, v) = merged(i)
      if (n > 0 && ts - lastUs > GapUs) { close(); n = 0; sum = 0.0; segStart = i }
      n += 1; sum += v; lastUs = ts
      i += 1
    }
    close()
    // seal the prefix of sessions the watermark has passed (end + gap < wm):
    // Spark drops later input below the watermark, so nothing can extend them
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val sealedN = segs.indexWhere(s => s.endUs + GapUs >= wmUs) match {
      case -1 => segs.size
      case k => k
    }
    val keepFrom = if (sealedN < segs.size) segs(sealedN).startIdx else merged.size
    state.update(UserBuf(prev.nClosed + sealedN, merged.drop(keepFrom), epoch))
    if (merged.size > keepFrom) {
      // open sessions remain: wake up when the watermark could seal them
      state.setTimeoutTimestamp(merged.last._1 / 1000L + GapUs / 1000L + 1L)
    }
    segs.zipWithIndex.map { case (s, idx) =>
      if (idx < sealedN) s.row.copy(is_sealed = true) else s.row
    }.iterator
  }

  /** Buffered sessionization over a directory of event parquet files —
    * tolerant of cross-batch disorder (the multi-file case the plain fold
    * documents as out of scope).
    */
  def sessionizedBuffered(spark: SparkSession, dir: String,
                          maxFilesPerTrigger: Int = 1): Dataset[SessionOut] = {
    import spark.implicits._
    graft.Tables.eventsStream(spark, dir, glob = None,
      maxFilesPerTrigger = Some(maxFilesPerTrigger))
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("tsUs"), col("value"), col("ts"))
      .as[EvW]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout)(foldGroupBuffered)
  }

  /** Collapse the memory-sink emission log to the final sessions: sealed
    * rows are immutable singletons; of the unsealed rows, only each user's
    * latest-epoch view is current (earlier epochs may contain sessions that
    * later merged — phantoms).
    */
  def collapseBuffered(emissions: DataFrame): DataFrame = {
    val latest = emissions.groupBy(col("user_id").as("u"))
      .agg(max(col("epoch")).as("max_epoch"))
    val sealedRows = emissions.filter(col("is_sealed"))
    val openRows = emissions.filter(!col("is_sealed"))
      .join(latest, col("user_id") === col("u") && col("epoch") === col("max_epoch"))
    sealedRows.unionByName(openRows.select(sealedRows.columns.map(col): _*))
      .select(col("user_id"), col("session_id"), col("n_events"), col("sum_value"))
  }

  def runBufferedToCompletion(spark: SparkSession, dir: String,
                              queryName: String = "session_stream_buf"): DataFrame = {
    val q = sessionizedBuffered(spark, dir)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    collapseBuffered(spark.table(queryName))
  }

  def sessionized(spark: SparkSession, sfDir: String): Dataset[SessionRow] = {
    import spark.implicits._
    graft.Tables.eventsStream(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("tsUs"), col("value"))
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
