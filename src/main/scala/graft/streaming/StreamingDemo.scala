package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming demo over the `events` stream shape
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference has no streaming at all (SURVEY §2.12) — this is the
  * explicitly-separate extension: tumbling-window counts with a
  * watermark, expressed once and runnable over either a batch frame or
  * a stream (same logical plan, which is the point of Structured
  * Streaming).
  */
object StreamingDemo {

  /** Tumbling 1-hour window aggregation with a 10-minute watermark.
    * Works on a streaming OR batch frame with columns (ts, event_type,
    * value). */
  def windowedCounts(events: DataFrame): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", "10 minutes") else events
    withWm
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,3)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Drive the streaming query synchronously from a bounded source and
    * return the materialized result (memory sink). Used by tests and
    * the demo entry point: batch parquet → streaming plan → complete
    * output mode → collectable table. */
  def runOnce(spark: SparkSession, source: DataFrame, queryName: String): DataFrame = {
    val q = windowedCounts(source)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(queryName)
  }
}
