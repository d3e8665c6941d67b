package graft

import org.apache.spark.sql.functions._

/** End-to-end CLI flow: CSV in → wide/summary parquet out, memo-cache
  * persisted and effective on the second run. */
class SurveyMainSpec extends SparkSpec {
  import spark.implicits._

  test("run: outputs written, cache persisted, second run served from cache") {
    val base = "target/tmp/survey_main"
    val csvDir = s"$base/in"
    Seq(
      ("a@x.com", "Ana", "Alpha,Beta", "I love it", "too expensive"),
      ("b@x.com", "Bo", "Alpha", "n/a", "great support team"),
    ).toDF("Email", "Name", "Products", "Q1 Opinion", "Q2 Service")
      .write.mode("overwrite").option("header", "true").csv(csvDir)

    val out = s"$base/out"; val cache = s"$base/cache.parquet"
    val (wide, summary) = SurveyMain.run(spark, csvDir, "retail", out, cache)
    assert(wide.count() == 3) // 2 + 1 product fan-out
    assert(summary.columns.toSeq ==
      Seq("Product", "Question", "Positive", "Neutral", "Negative", "Mixed"))

    // --xlsx flag renders the O18 report alongside the parquet sink
    val report = s"$base/report.xlsx"
    SurveyMain.run(spark, csvDir, "retail", out, cache, xlsxPath = Some(report))
    val sheets = XlsxRead.sheetNames(report)
    assert(sheets.contains("Summary") && sheets.exists(_.startsWith("Charts - ")))
    assert(XlsxRead.cells(report, sheets.indexOf("Summary") + 1)("A1") == "Product")

    val cached = spark.read.parquet(cache)
    // distinct (question, answer) pairs across 2 questions x 2 rows
    assert(cached.count() == 4)
    assert(cached.where(col("answer") === "I love it" && col("sentiment") === "Positive").count() == 1)

    // poison the cache for one key: a second run must serve the poisoned
    // value (proof the join, not the classifier, supplies hits)
    cached.withColumn("sentiment",
        when(col("answer") === "I love it", lit("Negative")).otherwise(col("sentiment")))
      .write.mode("overwrite").parquet(s"$base/cache2.parquet")
    val (wide2, _) = SurveyMain.run(spark, csvDir, "retail", out, s"$base/cache2.parquet")
    val r = wide2.where(col("Q1_Opinion_Answer") === "I love it").collect()
    assert(r.nonEmpty && r.forall(_.getAs[String]("Q1_Opinion_Sentiment") == "Negative"))
  }

  test("parseArgs handles the reference's flag shapes") {
    val m = SurveyMain.parseArgs(Array("--input", "a.csv", "--industry", "retail", "--max-chars", "600"))
    assert(m == Map("input" -> "a.csv", "industry" -> "retail", "max-chars" -> "600"))
  }
}
