package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Source/sink format coverage beyond parquet: ORC (columnar, built into
  * spark-sql) and quoted CSV round-trips. JSON-lines round-trip lives in
  * SurveyPipelineSpec; bucketed managed tables in JoinOpsSpec. */
class SourcesSpec extends SparkSpec {

  test("binaryFile source: opaque payload + metadata columns, glob-filtered") {
    // the multimodal ingest path: raw media files -> (path, length, content)
    val dir = java.nio.file.Files.createTempDirectory("graft_bin").toFile
    try {
      val payloads = Seq("a.img" -> Array[Byte](1, 2, 3, 4), "b.img" -> Array[Byte](9, 8),
        "skip.txt" -> Array[Byte](0))
      payloads.foreach { case (name, bytes) =>
        java.nio.file.Files.write(new java.io.File(dir, name).toPath, bytes)
      }
      val df = spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.img")
        .load(dir.getAbsolutePath)
      val got = df.select(
          element_at(split(col("path"), "/"), -1).as("name"),
          col("length"), col("content"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getAs[Array[Byte]](2).toSeq))
        .toMap
      assert(got.keySet == Set("a.img", "b.img")) // glob excludes skip.txt
      assert(got("a.img") == (4L, Seq[Byte](1, 2, 3, 4)))
      assert(got("b.img") == (2L, Seq[Byte](9, 8)))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("CSV malformed rows: PERMISSIVE captures them, DROPMALFORMED drops them") {
    // ingestion reality at 100 TB: some rows are garbage; the mode decides
    // whether they surface (with the raw line preserved) or vanish
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "rows.csv")
    java.nio.file.Files.write(f.toPath,
      "id,qty\n1,10\nnot_a_number,20\n3,thirty\n4,40\n".getBytes)
    try {
      val schema = "id INT, qty INT, _corrupt STRING"
      val permissive = spark.read
        .option("header", "true").option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema(schema).csv(f.getAbsolutePath).cache()
      permissive.count() // materialize before filtering on _corrupt
      assert(permissive.where(col("_corrupt").isNotNull).count() == 2)
      assert(permissive.where(col("_corrupt").isNull).count() == 2)
      val dropped = spark.read
        .option("header", "true").option("mode", "DROPMALFORMED")
        .schema("id INT, qty INT").csv(f.getAbsolutePath)
      assert(dropped.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 4))
    } finally { f.delete(); dir.delete() }
  }

  test("parquet schema evolution: mergeSchema unions column sets across file versions") {
    // the 100 TB reality: a corpus written over months gains columns; the
    // reader must union schemas and null-fill the old files
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evo").toFile.getAbsolutePath
    Seq((1L, "a")).toDF("id", "text").write.parquet(dir + "/v=1")
    Seq((2L, "b", "en")).toDF("id", "text", "lang").write.parquet(dir + "/v=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "lang", "text", "v"))
    val byId = merged.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(merged.columns.indexOf("lang")), "old files null-fill new columns")
    assert(byId(2L).getString(merged.columns.indexOf("lang")) == "en")
  }

  test("ORC round-trip preserves schema and rows (documents)") {
    val docs = Tables.table(spark, sf(), "documents")
    val dir = "target/tmp/docs_orc"
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      docs.schema.map(f => (f.name, f.dataType)))
    assert(back.except(docs).count() == 0 && docs.except(back).count() == 0)
  }

  test("ORC scan pushes filters and prunes columns like parquet") {
    val docs = Tables.table(spark, sf(), "documents")
    val dir = "target/tmp/docs_orc_plan"
    docs.write.mode("overwrite").orc(dir)
    val plan = spark.read.orc(dir)
      .where(col("doc_id") > 100).select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"columns not pruned:\n$plan")
  }

  test("hive-style partitioned layout: predicate becomes a PartitionFilter, not a scan filter") {
    val ev = Tables.table(spark, sf(), "events")
    val dir = "target/tmp/events_parted"
    ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val q = spark.read.parquet(dir).where(col("event_type") === "purchase")
      .select("event_id", "value")
    val plan = q.queryExecution.executedPlan.toString
    // directory-level pruning: the predicate appears as a PartitionFilter
    // (evaluated against the file listing — zero data files of other types
    // are opened), not a post-scan Filter
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition filter:\n$plan")
    val expected = ev.where(col("event_type") === "purchase").count()
    assert(q.count() == expected)
  }

  test("CSV round-trip with quoted commas/newlines in values") {
    import spark.implicits._
    val df = Seq(
      (1L, "plain"),
      (2L, "has, commas, three"),
      (3L, "has \"quotes\" inside"),
      (4L, "multi\nline value")).toDF("id", "v")
    val dir = "target/tmp/csv_rt"
    df.write.mode("overwrite").option("header", "true").option("escape", "\"").csv(dir)
    val back = spark.read
      .option("header", "true").option("multiLine", "true").option("escape", "\"")
      .schema(df.schema).csv(dir)
    assert(back.except(df).count() == 0 && df.except(back).count() == 0)
  }
}
