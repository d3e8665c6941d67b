package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Lexicons, TextExprs}

/** Dev micro-profiler for the text expression path. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String, df: => DataFrame): Unit = (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[prof] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val low = lower(col("text"))
    time("read_only", docs.select(col("doc_id"), col("text")))
    time("lower", docs.select(low))
    time("trim_isin", docs.select(lower(trim(coalesce(col("text"), lit("")))).isin(Lexicons.FillerValues: _*)))
    time("clean_astral", docs.select(regexp_replace(col("text"), TextExprs.AstralRegex, "")))
    time("clean_ws", docs.select(regexp_replace(col("text"), "\\s+", " ")))
    time("clean_full", docs.select(TextExprs.cleanText(col("text"))))
    time("rlike_pos", docs.select(low.rlike(Lexicons.positiveAlt)))
    time("rlike_both", docs.select(low.rlike(Lexicons.positiveAlt), low.rlike(Lexicons.negativeAlt)))
    time("sentiment", docs.select(TextExprs.demoSentiment(col("text"))))
    time("category", docs.select(TextExprs.demoCategory(col("text"))))
    time("classify_flat", docs.select(TextExprs.classifyDemo(col("text"))))
    time("classify_staged", TextExprs.withClassification(docs, col("text"), "_cls").select("_cls"))
    time("extract_all", docs.select(size(regexp_extract_all(low, lit(Lexicons.wordAlternation(Lexicons.StopwordsEn)), lit(0)))))
    spark.stop()
  }
}
