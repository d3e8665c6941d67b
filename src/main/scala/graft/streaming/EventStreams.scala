package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming shapes over the events table. Every transform here
  * works identically on a batch DataFrame and a readStream DataFrame — the
  * engine's streaming story is "same declarative plan, streaming source"
  * (SURVEY.md §7.6). */
object EventStreams {

  /** Tumbling-window counts with a watermark for late data. */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
      win: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /** Sliding-window load metric. */
  def slidingLoad(events: DataFrame, win: String = "10 minutes",
      slide: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), win, slide))
      .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))

  /** Session windows per user (gap-based). */
  def userSessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
}
