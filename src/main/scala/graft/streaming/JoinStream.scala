package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the streaming twin of the E7/E11 time-
  * window joins: purchases join clicks by the same user where the click
  * happened in the 30 minutes before the purchase.
  *
  * Both sides carry watermarks and the join condition bounds event time on
  * both streams, so Structured Streaming can expire join state: a click
  * older than (watermark − 30 min) can never match a future purchase and
  * is dropped from the state store — the bounded-state shape that lets this
  * run forever at cluster scale.
  */
object JoinStream {

  private def events(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.eventsStream(spark, sfDir)

  /** One join body for both modes: the streaming variant watermarks each
    * side before the shared predicate/projection, so the interval and
    * output can never drift between the stream and its batch twin.
    */
  private def joinBody(purchases: DataFrame, clicks: DataFrame): DataFrame =
    purchases.join(clicks,
      col("c_user") === col("user_id") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES") &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("gap_us"))

  private def clicksOf(ev: DataFrame): DataFrame =
    ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))

  private def purchasesOf(ev: DataFrame): DataFrame =
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))

  /** Batch twin — the spec's oracle for the streaming result. */
  def joinClicksToPurchases(ev: DataFrame): DataFrame =
    joinBody(purchasesOf(ev), clicksOf(ev))

  /** Streaming variant: watermark both sides (required for state cleanup on
    * stream-stream joins).
    */
  def joined(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = events(spark, sfDir)
    joinBody(
      purchasesOf(ev).withWatermark("purchase_ts", "1 hour"),
      clicksOf(ev).withWatermark("click_ts", "1 hour"))
  }

  def runToCompletion(spark: SparkSession, sfDir: String,
                      queryName: String = "join_stream"): DataFrame = {
    val q = joined(spark, sfDir)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }
}
