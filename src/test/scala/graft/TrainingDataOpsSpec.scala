package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Decontaminate, Funnel, KMeansOp, Privacy}

/** Round-5 training-data / clickstream operators: PII redaction, benchmark
  * decontamination, funnels, cohort retention, fixed-iteration k-means. */
class TrainingDataOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- PII redaction ----

  test("privacy: email, phone, and IPv4 are each masked and counted") {
    val docs = Seq(
      (1L, "reach me at jo.do+spam@sub.example.co.uk or +1-555-0147 thanks"),
      (2L, "server 192.168.001.7 and 10.0.0.1 answered"),
      (3L, "no pii here at all")
    ).toDF("id", "text")
    val got = Privacy.redactAudit(docs, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getString(1) == "reach me at <EMAIL> or <PHONE> thanks")
    assert(got(1L).getLong(2) == 1 && got(1L).getLong(3) == 1 && got(1L).getLong(4) == 0)
    assert(got(2L).getString(1) == "server <IP> and <IP> answered")
    assert(got(2L).getLong(4) == 2)
    assert(got(3L).getString(1) == "no pii here at all")
    assert(got(3L).getLong(2) == 0 && got(3L).getLong(3) == 0 && got(3L).getLong(4) == 0)
  }

  test("privacy: phone rule cannot eat IPv4 octets (IP masked first)") {
    val docs = Seq((1L, "dial 555-123-9876 from 10.11.12.13")).toDF("id", "text")
    val got = Privacy.redactAudit(docs, col("id"), col("text")).head()
    assert(got.getString(1) == "dial <PHONE> from <IP>")
  }

  // ---- decontamination ----

  test("decontaminate: only docs sharing a full n-gram run are flagged") {
    val run = "one two three four five six seven eight" // 8 tokens = 1 8-gram
    val bench = Seq((100L, s"$run and more benchmark text here")).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"prefix words $run suffix"),            // contains the run
      (2L, "one two three four five six seven"),    // 7-token prefix only
      (3L, "totally unrelated training document")
    ).toDF("doc_id", "text")
    val got = Decontaminate.report(train, bench, col("doc_id"), col("text"), n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L))
  }

  // ---- funnel / retention ----

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel: strict order and conversion window are both enforced") {
    val ev = Seq(
      // u1 completes all three stages in order, within windows
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // u2 clicks BEFORE the first view -> stops at stage 1
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // u3 clicks only after the 12h window -> stops at stage 1
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-02 00:00:01"), "click"),
      // u4 never views -> not even stage 1
      (4L, ts("2024-01-01 10:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.funnel(ev, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"), withinSeconds = Some(12L * 3600))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("stage1_view" -> 3L, "stage2_click" -> 1L, "stage3_purchase" -> 1L))
  }

  test("funnel: first-touch semantics — a later qualifying pair doesn't resurrect") {
    // u1's FIRST view is at 00:00; the only click in its window is at 01:00;
    // no purchase follows that click within its window even though a
    // (view, click, purchase) chain exists starting from the SECOND view.
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 01:00:00"), "click"),
      (1L, ts("2024-01-03 00:00:00"), "view"),
      (1L, ts("2024-01-03 01:00:00"), "click"),
      (1L, ts("2024-01-03 02:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.funnel(ev, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"), withinSeconds = Some(12L * 3600))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // stage2 fires at 01:00 (first touch); purchase at day-3 02:00 is
    // outside that first-touch window -> stage3 is empty
    assert(got == Map("stage1_view" -> 1L, "stage2_click" -> 1L, "stage3_purchase" -> 0L))
  }

  test("retention: cohorts anchor at the week of first activity") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), // Monday, cohort week 2024-01-01
      (1L, ts("2024-01-10 10:00:00")), // week offset 1
      (1L, ts("2024-01-21 10:00:00")), // Sunday of week offset 2
      (2L, ts("2024-01-10 10:00:00"))  // cohort week 2024-01-08, offset 0
    ).toDF("user_id", "ts")
    val got = Funnel.retention(ev, col("user_id"), col("ts"))
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> 1L, ("2024-01-01", 1L) -> 1L, ("2024-01-01", 2L) -> 1L,
      ("2024-01-08", 0L) -> 1L))
  }

  // ---- k-means ----

  test("kmeans: separable clusters converge and sq_dist is the squared L2") {
    // two tight groups in 3-d; seeds are ids 0 and 1 (one in each group)
    val vecs = Seq(
      (0L, Seq(0.0f, 0.0f, 0.0f)), (2L, Seq(0.1f, 0.0f, 0.0f)), (4L, Seq(0.0f, 0.1f, 0.0f)),
      (1L, Seq(5.0f, 5.0f, 5.0f)), (3L, Seq(5.1f, 5.0f, 5.0f)), (5L, Seq(5.0f, 5.1f, 5.0f))
    ).toDF("id", "v")
    val got = KMeansOp.kmeans(vecs, col("id"), col("v"), k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(Seq(0L, 2L, 4L).forall(got(_)._1 == 0L))
    assert(Seq(1L, 3L, 5L).forall(got(_)._1 == 1L))
    // centroid of cluster 0 after an update is the group mean; check one
    // distance: id 0 at (0,0,0) vs centroid (0.033333, 0.033333, 0) ->
    // sq_dist = 2 * 0.033333^2
    val expect = 2 * 0.033333 * 0.033333
    assert(math.abs(got(0L)._2 - expect) < 1e-3, s"got ${got(0L)._2}")
  }

  test("kmeans: assignment ties break toward the lowest centroid index") {
    // a point equidistant from both seed centroids, iters = 0 keeps seeds
    val vecs = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(2.0f, 0.0f)), (7L, Seq(1.0f, 0.0f))
    ).toDF("id", "v")
    val got = KMeansOp.kmeans(vecs, col("id"), col("v"), k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(7L) == 0L)
  }

  // ---- quality rules / repetition ----

  test("gopherRules: each rule fails on its own pathological document") {
    val tenStops = "the a of to and is in it the a" // 10 tokens, all stopwords
    val docs = Seq(
      (1L, s"$tenStops good words here"),                    // passes all
      (2L, "too short"),                                     // n_tokens < 10
      (3L, Seq.fill(12)("pneumonoultramicroscopics").mkString(" ")), // mean len > 12
      (4L, s"$tenStops " + Seq.fill(41)("99").mkString(" ")), // alpha_frac <= 0.8
      (5L, Seq.fill(12)("word").mkString(" "))               // no stopwords
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .gopherRules(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false, 5L -> false))
  }

  test("repetitionProfile: constant text maxes out, diverse text stays low") {
    val docs = Seq(
      (1L, Seq.fill(20)("spam").mkString(" ")),  // top uni AND bi frac = 1.0
      (2L, (1 to 20).map(i => s"w$i").mkString(" ")) // all distinct
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .repetitionProfile(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getDouble(1) == 1.0 && got(1L).getDouble(2) == 1.0
      && got(1L).getBoolean(3))
    assert(got(2L).getDouble(1) == 0.05 && !got(2L).getBoolean(3))
  }

  test("privacy: redaction is idempotent (placeholders never re-match)") {
    val docs = Seq(
      (1L, "mail a@b.co phone +1-555-0147890 ip 10.0.0.1"),
      (2L, "clean text")).toDF("id", "text")
    val once = Privacy.redactAudit(docs, col("id"), col("text"))
      .select(col("id"), col("redacted").as("text"))
    val twice = Privacy.redactAudit(once, col("id"), col("text"))
    val both = once.join(twice.select(col("id"), col("redacted")), "id").collect()
    both.foreach(r => assert(r.getString(1) == r.getString(2), r.toString))
  }

  test("kmeans: an emptied cluster keeps its previous centroid") {
    // duplicate seed vectors: every point ties between c0 and c1 and the
    // tie-break sends ALL of them to cluster 0 — cluster 1 empties on the
    // first update and must keep its old centroid (no NPE, no collapse)
    val vecs = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(0.0f, 0.0f)),
      (2L, Seq(1.0f, 1.0f)), (3L, Seq(1.0f, 2.0f))
    ).toDF("id", "v")
    val got = KMeansOp.kmeans(vecs, col("id"), col("v"), k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 4) // all points assigned, no crash
    assert(got.values.toSet.contains(0L)) // cluster 0 carries the data
  }

  // ---- heavy hitters ----

  test("heavy hitters: exact result under a long tail that overflows the summary") {
    // 2 genuinely heavy items + 400-item tail; summary capacity (2k=10) is
    // 40x smaller than the distinct domain, so eviction/merge-cut both fire
    val rows = Seq.fill(500)("hot1") ++ Seq.fill(300)("hot2") ++
      (1 to 400).map(i => f"tail$i%03d")
    val df = rows.toDF("item").repartition(7) // force multi-partition merges
    val got = graft.operators.HeavyHitters.topFrequent(df, col("item"), k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // N = 1200, threshold N/5 = 240: exactly hot1 (500) and hot2 (300)
    assert(got == Map("hot1" -> 500L, "hot2" -> 300L))
  }

  test("heavy hitters by group: per-key summaries stay independent") {
    val rows = (Seq.fill(90)("g1" -> "hot") ++ (1 to 30).map(i => "g1" -> s"t$i") ++
      Seq.fill(5)("g2" -> "other") ++ Seq.fill(3)("g2" -> "rare"))
    val df = rows.toDF("grp", "item").repartition(5)
    val got = graft.operators.HeavyHitters
      .topFrequentByGroup(df, col("grp"), col("item"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // g1: n=120, threshold 40 → only "hot" (90). g2: n=8, threshold 8/3≈2.67
    // → "other" (5) and "rare" (3)
    assert(got == Map(("g1", "hot") -> 90L, ("g2", "other") -> 5L, ("g2", "rare") -> 3L))
  }

  test("heavy hitters: candidate summary is a superset of true heavy items") {
    val rows = Seq.fill(100)("a") ++ Seq.fill(60)("b") ++ (1 to 50).map("t" + _)
    val df = rows.toDF("item").repartition(5)
    val cand = graft.operators.HeavyHitters.candidates(df, col("item"), capacity = 8)
    assert(cand.size <= 8)
    assert(cand.contains("a") && cand.contains("b"))
  }

  // ---- q97 exact substring-span dedup ----

  test("q97 span dedup: md5 grouping agrees with grouping by the raw span text") {
    // recompute with the span TEXT itself as the group key — if md5
    // collided (or the slice/concat drifted), the two disagree
    val out = SparkEntry.queries("q97_span_dedup")(spark, sf()).cache()
    val L = 30
    val wins = spark.read.parquet(sf() + "/documents.parquet")
      .select(col("doc_id"), split(graft.functions.TextExprs.cleanText(col("text")), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .where(col("n") >= L)
      .select(col("doc_id"), col("n"),
        explode(sequence(lit(0), col("n") - L)).as("pos"), col("toks"))
      .select(col("doc_id"), col("n"),
        concat_ws(" ", slice(col("toks"), col("pos") + 1, lit(L))).as("span"))
    val dupTxt = wins.groupBy("span")
      .agg(countDistinct("doc_id").as("nd")).where(col("nd") >= 2)
    val expect = wins.join(dupTxt.select("span"), Seq("span"), "left_semi")
      .groupBy("doc_id", "n").agg(count(lit(1)).as("dup_windows"))
      .select(col("doc_id"), (col("n") - (L - 1)).cast("long").as("n_windows"),
        col("dup_windows"))
    val got = out.select("doc_id", "n_windows", "dup_windows")
    assert(got.except(expect).count() == 0 && expect.except(got).count() == 0)
    // bounds: every reported doc has 1 <= dup_windows <= n_windows, ratio in (0, 1]
    assert(out.where(col("dup_windows") < 1 || col("dup_windows") > col("n_windows")
      || col("dup_ratio") <= 0.0 || col("dup_ratio") > 1.0).count() == 0)
    assert(out.count() > 0, "synthetic corpus must contain cross-doc spans")
    out.unpersist()
  }

  // ---- oracle-query smoke at sf0.001 (the driver checks sf0.01) ----

  test("q70/q72/q74 run and return rows at sf0.001") {
    assert(SparkEntry.queries("q70_pii_redact")(spark, sf()).count() > 0)
    assert(SparkEntry.queries("q72_funnel")(spark, sf()).count() == 3)
    assert(SparkEntry.queries("q74_zscore")(spark, sf()).count() > 0)
  }
}
