package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Per-key accumulator for [[EventStreams.runningTotals]]. */
case class TypeState(n: Long, sum: Double)

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

  /** Custom streaming state: running (count, sum) per event_type via
    * mapGroupsWithState — the KeyValueGroupedDataset form of arbitrary
    * stateful processing. Emits the updated totals each micro-batch. */
  def runningTotals(events: DataFrame): DataFrame = {
    val sp = events.sparkSession
    import sp.implicits._
    events.selectExpr("event_type", "value").as[(String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[TypeState, (String, Long, Double)](GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          var n = 0L; var s = 0.0
          rows.foreach { r => n += 1; s += r._2 }
          val prev = state.getOption.getOrElse(TypeState(0L, 0.0))
          val next = TypeState(prev.n + n, prev.sum + s)
          state.update(next)
          (key, next.n, next.sum)
      }
      .toDF("event_type", "n", "sum_value")
  }

  /** Streaming exact dedup: replayed/duplicate ids within the watermark
    * horizon are dropped with bounded state (the streaming face of
    * Dedup.exactGroups). */
  def dedupStream(events: DataFrame, idCols: Seq[String] = Seq("event_id"),
      watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** SURVEY.md §7.6 made real: the reference's classify-then-aggregate
    * dataflow streamed. Each micro-batch runs the SAME cache-join classify
    * and emits long-form (product, sentiment, count) — pivot is not
    * streamable, the long form is (pivot at read time). Output parquet is
    * append-only per batch; `checkpoint` gives exactly-once batch ids. */
  def classifiedSummary(stream: DataFrame, industry: String,
      clf: graft.operators.AnswerClassifier, outDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.operators.Classify
          .applyTo(batch, col("answer"), lit("Q"), lit(industry), clf)
          .groupBy(col("product"), col("sentiment"))
          .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"))
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outDir)
      }
      .start()
}
