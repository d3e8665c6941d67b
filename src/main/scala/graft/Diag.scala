package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch diagnostic: isolate slow stages. */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String, reps: Int = 2)(df: => DataFrame): Unit = (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[diag] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    def agg(df: DataFrame): DataFrame =
      df.select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"), col("value"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"),
          sum("k").as("sum_k"), round(avg("k"), 4).as("avg_k"))
    val ev = graft.sources.Tables.events(spark, sfDir)
    // replicate diag run 1 sequence that triggered the 85s agg
    time("range_sum") { spark.range(100000000L).agg(sum("id")) }
    time("events_raw_scan") { raw.select("event_id", "props", "value") }
    time("events_tables_scan") { ev.select("event_id", "props", "value") }
    time("events_json") { raw.select(get_json_object(col("props"), "$.k").cast("long").as("k")) }
    time("events_json_agg_raw") { agg(raw) }
    time("q13_full_ev") { agg(ev) }
    spark.stop()
  }
}
