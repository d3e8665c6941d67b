package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Round-5 operators: winnowing fingerprints, connected-components
  * distributed path, gap-fill scaffold invariants, token entropy. */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- winnowing fingerprints ----

  test("winnow: overlapping documents share a fingerprint, disjoint ones don't") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"intro words here $shared trailing tail"),
      (2L, s"$shared completely different ending part"),
      (3L, "nothing in common with the others at all whatsoever today")
    ).toDF("doc_id", "text")
    val fp = Dedup.winnowFingerprints(docs, col("doc_id"), col("text"))
    val byDoc = fp.collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    // guarantee: a shared run of >= window+gramLen-1 = 6 tokens yields a
    // common fingerprint (the 8-token overlap is comfortably above it)
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty)
    assert((byDoc(2L) intersect byDoc(3L)).isEmpty)
  }

  test("winnow: short documents degrade to a single global-min fingerprint") {
    // 4 tokens -> 2 grams -> fewer than one window of 4
    val docs = Seq((1L, "just four little words"), (2L, "")).toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(docs, col("doc_id"), col("text")).collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L)
  }

  test("winnow: fingerprints are a subset of the doc's gram hashes (min picks)") {
    val docs = Tables.table(spark, sf(), "documents").limit(50)
    val fp = Dedup.winnowFingerprints(docs, col("doc_id"), col("text"))
    // every fingerprint is the md5-prefix of SOME 3-gram of the same doc
    val grams = docs
      .select(col("doc_id"), split(lower(graft.functions.TextExprs.cleanText(col("text"))), " ").as("toks"))
      .select(col("doc_id"), explode(Dedup.shinglesOfToks(col("toks"), 3)).as("g"))
      .select(col("doc_id"), substring(md5(col("g")), 1, 16).as("fingerprint"))
    assert(fp.join(grams, Seq("doc_id", "fingerprint"), "left_anti").count() == 0)
  }

  // ---- connected components: both execution paths agree ----

  test("connectedComponents: distributed path == driver union-find path") {
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (4L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    val viaDriver = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDistributed = Dedup.connectedComponents(pairs, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaDistributed)
    assert(viaDriver == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  // ---- custom physical range join ----

  test("rangeJoin == crossJoin+filter, including overlapping and empty intervals") {
    val pts = Seq((1L, 5.0), (2L, 10.0), (3L, 25.0), (4L, 99.0)).toDF("id", "p")
    val ivs = Seq((100L, 0.0, 10.0), (101L, 5.0, 15.0), (102L, 20.0, 30.0),
      (103L, 50.0, 40.0) /* inverted: joins nothing */).toDF("iv_id", "lo", "hi")
    val viaOp = graft.plans.RangeJoinOps.rangeJoin(pts, ivs,
        col("p"), col("lo"), col("hi"))
      .select("id", "iv_id")
    val viaCross = pts.crossJoin(ivs)
      .where(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("id", "iv_id")
    assert(viaOp.except(viaCross).count() == 0 && viaCross.except(viaOp).count() == 0)
    // boundary inclusivity + multi-hit: p=5 and p=10 each land in 2 bands
    assert(viaOp.count() == 5)
  }

  test("rangeJoin plans the custom exec, not a nested-loop join") {
    val pts = Tables.table(spark, sf(), "orders").select("o_orderkey", "o_totalprice")
    val ivs = spark.range(0, 10).select(col("id"),
      (col("id") * 100.0).as("lo"), (col("id") * 100.0 + 200.0).as("hi"))
    val plan = graft.plans.RangeJoinOps.rangeJoin(pts, ivs,
        col("o_totalprice"), col("lo"), col("hi"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"fell back to BNLJ:\n$plan")
  }

  test("rangeJoin: null points and null bounds join nothing") {
    val pts = Seq((1L, Some(5.0)), (2L, None)).toDF("id", "p")
    val ivs = Seq((100L, Some(0.0), Some(10.0)), (101L, None, Some(10.0)))
      .toDF("iv_id", "lo", "hi")
    val got = graft.plans.RangeJoinOps.rangeJoin(pts, ivs, col("p"), col("lo"), col("hi"))
      .select("id", "iv_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 100L)))
  }

  // ---- gap fill ----

  test("q64 scaffold has one row per hour per type, gap-free and zero-filled") {
    val out = SparkEntry.queries("q64_gap_fill")(spark, sf())
    val spans = out.groupBy("event_type").agg(
      count(lit(1)).as("rows"),
      ((unix_micros(max("hr")) - unix_micros(min("hr"))) / 3600000000L + 1)
        .cast("long").as("hours"),
      sum(when(col("n") === 0, 1).otherwise(0)).as("zeros"))
    spans.collect().foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"gap in scaffold: $r")
    }
    // zero-filled rows exist at sf0.001 (sparse hours) and carry 0.0 sums
    assert(out.where(col("n") === 0 && col("sum_value") =!= 0.0).count() == 0)
  }

  // ---- mergeable sketch columns ----

  test("HLL sketch columns: per-group sketches union to the global estimate") {
    // the 100 TB rollup pattern: persist a SKETCH per partition/day, union
    // sketches later instead of re-scanning raw data. Estimates must agree
    // whether built in one pass or merged from per-source sketches.
    val ev = Tables.table(spark, sf(), "events")
    val perType = ev.groupBy("event_type")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val merged = perType.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head().getLong(0)
    val direct = ev.agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))"))
      .head().getLong(0)
    val exact = ev.select("user_id").distinct().count()
    assert(merged == direct, "sketch union must equal the single-pass sketch")
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"estimate $merged vs exact $exact")
  }

  // ---- token entropy ----

  test("entropy: uniform distribution gives ln(vocab), constant gives 0") {
    val uniform = Seq(("s1", "aa bb cc dd")).toDF("source", "text")
      .withColumn("doc_id", lit(1L))
    val constant = Seq(("s2", "aa aa aa aa")).toDF("source", "text")
      .withColumn("doc_id", lit(2L))
    def entropyOf(df: org.apache.spark.sql.DataFrame): Double = {
      val tok = df.select(col("source"),
          explode(split(lower(graft.functions.TextExprs.cleanText(col("text"))), " ")).as("token"))
        .where(col("token") =!= "")
      tok.groupBy("source", "token").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg((log(sum("c")) - sum(col("c") * log(col("c"))) / sum("c")).as("h"))
        .head().getDouble(1)
    }
    assert(math.abs(entropyOf(uniform) - math.log(4)) < 1e-9)
    assert(math.abs(entropyOf(constant)) < 1e-9)
  }
}
