package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming twin of `Analytics.eventsWindow` (SURVEY §2 E4).
  *
  * `readStream` over the events parquet → event-time tumbling windows with a
  * watermark → windowed count/sum per event_type. The batch query is the
  * oracle (same window semantics by construction); the spec drives this to
  * completion over the finite input and asserts equality.
  *
  * Scale notes: watermark bounds state (late data beyond 10 minutes is
  * dropped); the (window, event_type) grouping key is low-cardinality so
  * partial aggregation collapses rows map-side before the state-store
  * shuffle. On a real cluster the same plan runs with a durable checkpoint
  * and kafka/file sources — nothing here is local-mode specific.
  */
object EventStream {

  /** The streaming aggregation plan (unbound — caller picks the sink).
    * Source schema + ts vintage handling live in [[graft.Tables.eventsStream]].
    */
  def windowedAgg(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Tables.eventsStream(spark, sfDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")) + lit(1e-9), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Run the stream over the (finite) input into an in-memory table and block
    * until every file is processed. Returns the completed result.
    */
  def runToCompletion(spark: SparkSession, sfDir: String,
                      queryName: String = "events_stream"): DataFrame = {
    val q: StreamingQuery = windowedAgg(spark, sfDir)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
