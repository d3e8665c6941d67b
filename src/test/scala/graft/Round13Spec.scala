package graft

import org.apache.spark.sql.functions._

/** Round-13 additions: the streaming-under-oracle query, the exact-integer
  * EB prior, and the k-core convergence witness. */
class Round13Spec extends SparkSpec {

  test("q302: foreachBatch-materialized stream equals the batch windowed agg") {
    val r = SparkEntry.queries("q302_stream_window")(spark, sf()).cache()
    val batch = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("ts"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum("cents").cast("double") / 100.0, 2).as("sum_value"))
    assert(r.count() === batch.count())
    assert(r.join(batch, Seq("win_start", "event_type", "n", "sum_value"))
      .count() === r.count())
    r.unpersist()
  }

  test("q302: the file stream replays MULTIPLE micro-batches (incremental state)") {
    // the query reshards the source into 4 files and triggers one file per
    // micro-batch; at least 2 non-empty shards must exist for the run to
    // have exercised cross-batch state merge
    SparkEntry.queries("q302_stream_window")(spark, sf()).count()
    val base = new java.io.File("target/stream/q302")
    val runs = base.listFiles().filter(_.isDirectory).sortBy(_.lastModified)
    val src = new java.io.File(runs.last, "src")
    val shards = src.listFiles().count(f =>
      f.getName.startsWith("part-") && f.length() > 0)
    assert(shards >= 2, s"expected >= 2 source shards, got $shards")
  }

  test("q284: prior moments are partition-order invariant (exact-integer path)") {
    val a = SparkEntry.queries("q284_eb_shrinkage")(spark, sf())
      .orderBy("p_brand").collect().map(_.toSeq)
    // same computation with a different shuffle-partition count: the scaled
    // LONG rate sums must make the prior (and so the posterior) bit-equal
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val b = SparkEntry.queries("q284_eb_shrinkage")(spark, sf())
        .orderBy("p_brand").collect().map(_.toSeq)
      assert(a.toSeq === b.toSeq)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("q267: the oracle-twinned convergence witness is true on the fixture") {
    val r = SparkEntry.queries("q267_kcore")(spark, sf())
    assert(r.where(!col("converged")).count() === 0)
    assert(r.columns.contains("converged"))
  }
}
