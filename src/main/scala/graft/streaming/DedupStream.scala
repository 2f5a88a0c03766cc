package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming exact-dedup — the streaming twin of Dedup.dedupExact (SURVEY
  * §2 B1): `dropDuplicatesWithinWatermark` over the content hash keeps one
  * row per duplicate group as events arrive, with the watermark bounding
  * dedup state (a key seen longer ago than the delay is dropped from the
  * state store — the standard bounded-memory ingest-dedup shape at scale).
  */
object DedupStream {

  def dedupped(spark: SparkSession, sfDir: String): DataFrame = {
    graft.Tables.eventsStream(spark, sfDir)
      // duplicate key: the payload identity (same user+type+value+props).
      // Hash a struct, not a delimiter-joined string: concat_ws skips NULL
      // fields, so (1,NULL,'x') and (1,'x',NULL) would collide.
      .withColumn("content_hash",
        md5(to_json(struct(col("user_id"), col("event_type"), col("value"), col("props")))))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("content_hash")
  }

  def runToCompletion(spark: SparkSession, sfDir: String,
                      queryName: String = "dedup_stream"): DataFrame = {
    val q = dedupped(spark, sfDir)
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
