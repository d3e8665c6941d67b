package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a (user, timestamp, type) event log:
  * ordered funnels and cohort retention — the product-analytics queries a
  * clickstream warehouse runs daily at any scale.
  *
  * Scale shape: every stage is a `groupBy(user)` aggregate — the natural
  * hash-partitioned reduction — followed by an equi-join back on the same
  * key, so each funnel stage is one shuffle on `user` and AQE coalesces
  * the (monotonically shrinking) survivor sets. No windows over the full
  * log, no driver-side state.
  */
object Funnel {

  /** Ordered funnel: stage k counts users who performed `stages(0)`, then
    * `stages(1)` STRICTLY AFTER their first stage-0 event, then
    * `stages(2)` strictly after that first qualifying stage-1 event, etc.
    * (first-touch semantics — the standard product-funnel definition).
    * `withinSeconds` bounds each conversion: stage k+1 must land within
    * that many seconds of the first qualifying stage-k event.
    *
    * Returns (stage, n_users): stage = "stageK_<type>" in funnel order.
    */
  def funnel(events: DataFrame, user: Column, ts: Column, evType: Column,
      stages: Seq[String], withinSeconds: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty)
    val base = events.select(user.as("u"), ts.as("t"), evType.as("et"))
    // survivors(k): (u, t_k) = first time user completed stage k in order
    val first = base.where(col("et") === stages.head)
      .groupBy("u").agg(min("t").as("t"))
    val survivors = stages.tail.scanLeft(first) { (prev, st) =>
      val window = withinSeconds
        .map(sec => col("e.t") <= col("_pt") + expr(s"INTERVAL $sec SECOND"))
        .getOrElse(lit(true))
      base.where(col("et") === st).as("e")
        .join(prev.select(col("u"), col("t").as("_pt")).as("p"), Seq("u"))
        .where(col("e.t") > col("_pt") && window)
        .groupBy("u").agg(min(col("e.t")).as("t"))
    }
    val counts = survivors.zip(stages.zipWithIndex).map { case (df, (st, i)) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(s"stage${i + 1}_$st").as("stage"), col("n_users"))
    }
    counts.reduce(_ unionAll _)
  }

  /** Cohort retention: cohort = week (date_trunc) of the user's first
    * event; for every (cohort_week, week_offset) count the distinct users
    * from that cohort active in that week. Offsets are exact multiples of
    * seven days, so the integer division is lossless. */
  def retention(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val base = events.select(user.as("u"), ts.as("t"))
    val cohort = base.groupBy("u").agg(date_trunc("week", min("t")).as("cohort_week"))
    val active = base.select(col("u"), date_trunc("week", col("t")).as("w")).distinct()
    active.join(cohort, "u")
      .groupBy(col("cohort_week"),
        (datediff(col("w").cast("date"), col("cohort_week").cast("date")) / 7)
          .cast("long").as("week_offset"))
      .agg(count_distinct(col("u")).as("n_users"))
  }
}
