package graft.queries

import scala.collection.immutable.ListMap
import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{Lexicons, TextExprs, VectorExprs}
import graft.operators.{Dedup, GlobalRank, JoinOps, Profiler, Retrieval, Similarity, SurveyPipeline, TextAnalysis, TopKAgg}
import graft.multimodal.Multimodal
import graft.sources.Tables
import graft.queries.QueryHelpers._

/** Event-stream analytics: sessions, funnels, retention, cohorts,
  * engagement and incident diagnostics.
  *
  * Query/oracle pairs split out of the SparkEntry book (round 13);
  * aggregated by [[graft.SparkEntry]]. Conventions in QueryHelpers. */
private[graft] object EventsQueries extends QueryBook {

  /** Shared replay rig for the streaming-under-oracle queries (q302/q305/
    * q306/q307): reshard the events projection into 4 parquet files, stream
    * them back ONE FILE PER MICRO-BATCH (real cross-batch state), run the
    * caller's writeStream to `out`, and read the materialization back.
    * Prior run dirs are reaped first — executions never overlap (Bench's
    * warm-up pool runs each query once, timed passes are sequential,
    * Verify is a separate JVM). The streaming execution runs under
    * [[QueryHelpers.withStreamShuffle]]: at sf0.1 the dominant cost of a
    * 4-batch replay is not the data but 4 × default-width state-store and
    * shuffle tasks per stateful operator side, so the rig scopes
    * `spark.sql.shuffle.partitions` down for the drain (values are
    * partition-count invariant; a real deployment sizes the same knob to
    * its key cardinality, not to a 4-file replay). */
  private def streamReplay(s: SparkSession, dir: String, tag: String,
      timeOrdered: Boolean = false)(
      project: DataFrame => DataFrame)(
      run: (DataFrame, String, String) => org.apache.spark.sql.streaming.StreamingQuery)
      : DataFrame = {
    val root = new java.io.File(s"target/stream/$tag")
    Option(root.listFiles()).foreach(_.foreach { d =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(d)
    })
    val base = s"target/stream/$tag/${java.util.UUID.randomUUID()}"
    val src = s"$base/src"; val out = s"$base/out"
    val projected = project(t(s, dir, "events"))
    // timeOrdered: shard into contiguous TIME slices and replay them
    // oldest-first (ascending mtimes break FileStreamSource's tie), so the
    // event stream is in event-time order and a 0-delay watermark never
    // late-drops — the arrival discipline a watermarked APPEND aggregation
    // assumes. Hash-sharding (the default) interleaves the full time range
    // into every batch, which is fine for complete-mode/unwatermarked ops
    // (q302/q306) but makes everything after batch 1 late.
    (if (timeOrdered) projected.repartitionByRange(4, col("ts"))
     else projected.repartition(4, col("event_type")))
      .write.mode("overwrite").parquet(src)
    if (timeOrdered) {
      val parts = new java.io.File(src).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(1700000000000L + i * 60000L)
      }
    }
    QueryHelpers.withStreamShuffle(s) { scoped =>
      val stream = scoped.readStream
        .schema(scoped.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
      val q = run(stream, s"$base/ckpt", out)
      try { q.processAllAvailable() } finally q.stop()
    }
    s.read.parquet(out)
  }

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q35_sessionize" -> ((s, dir) => {
      // gap-based sessionization: one window pass (lag + running sum share
      // the same partitioning/sort, so Catalyst plans a single shuffle+sort)
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("_gap_us"))
        .withColumn("_new_sess",
          when(col("_gap_us").isNull || col("_gap_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_no", sum("_new_sess").over(wRun))
        .groupBy("user_id", "session_no")
        .agg(count(lit(1)).as("n_events"),
          min("ts").as("sess_start"), max("ts").as("sess_end"))
    }),

    "q72_funnel" -> ((s, dir) => {
      // ordered conversion funnel with a 12h per-stage window — each stage
      // is one groupBy(user) + equi-join back, no full-log window
      graft.operators.Funnel.funnel(t(s, dir, "events"), col("user_id"),
        col("ts"), col("event_type"), Seq("view", "click", "purchase"),
        withinSeconds = Some(12L * 3600))
    }),

    "q73_retention" -> ((s, dir) => {
      // weekly cohort retention triangle over the event log
      graft.operators.Funnel.retention(t(s, dir, "events"), col("user_id"), col("ts"))
    }),

    "q83_conversion_lag" -> ((s, dir) => {
      // time-to-convert distribution: first view → first subsequent
      // purchase per user, exact interpolated percentiles of the lag.
      // Composition of the funnel stage join and the q37 percentile shape.
      val ev = t(s, dir, "events")
      val v = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t_view"))
      val p = ev.where(col("event_type") === "purchase").as("e")
        .join(v, Seq("user_id"))
        .where(col("e.ts") > col("t_view"))
        .groupBy("user_id").agg(min(col("e.ts")).as("t_purch"), min("t_view").as("t_v"))
      p.select(((unix_micros(col("t_purch")) - unix_micros(col("t_v"))) / 60000000.0)
          .as("mins"))
        .agg(count(lit(1)).as("n_converted"),
          expr("percentile(mins, array(0.5D, 0.9D))").as("_p"))
        .select(col("n_converted"),
          round(element_at(col("_p"), 1), 4).as("p50_mins"),
          round(element_at(col("_p"), 2), 4).as("p90_mins"))
    }),

    "q84_latest_event" -> ((s, dir) => {
      // keep-latest-row-per-key as ONE hash aggregate: max(struct(ts, id,
      // payload)) compares lexicographically, so the combine is map-side
      // partial and the shuffle carries one candidate row per (key,
      // partition) — the upsert-compaction idiom. The window form
      // (row_number ORDER BY ts DESC = 1) sorts every group's full history
      // instead; at 100 TB that is a sort of the whole log.
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"), col("value")))
          .as("_last"))
        .select(col("user_id"),
          col("_last.ts").as("last_ts"),
          col("_last.event_id").as("last_event_id"),
          col("_last.event_type").as("last_type"),
          col("_last.value").as("last_value"))
    }),

    "q146_retention_sweep" -> ((s, dir) => {
      // Threshold SWEEP for the q133 quality filter: docs/chars retained
      // at every cutoff on a fixed grid (-1.0 … 1.0 step 0.1) — the
      // curve you read before committing a keep-threshold for a 100 TB
      // filter run. The naive form scans the corpus once PER THRESHOLD;
      // this is ONE classifier pass → a ≤22-row score-bin table →
      // suffix sums over the grid as a triangular bin×threshold join
      // (the prevCumByKey posture). All float boundaries are integer
      // ten-thousandths (w4), so no IEEE division can move a doc across
      // a cutoff between the engines.
      val posSources = (0 to 4).map(i => s"src$i")
      val docs = t(s, dir, "documents")
      val scored = graft.operators.TextAnalysis.hashNbClassifier(
        docs, col("doc_id"), col("text"), col("source").isin(posSources: _*))
      val lab = scored.join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
        .select(round(col("quality_w") * 10000).cast("long").as("w4"),
          col("n_chars"))
      // bin i holds w4 ∈ [i·1000 − 10000, (i+1)·1000 − 10000); below-grid
      // docs land in bin −1 so the t = −1.0 row keeps its exact meaning
      val bins = lab
        .select(when(col("w4") < -10000L, lit(-1L))
            .otherwise(least(expr("(w4 + 10000) DIV 1000"), lit(20L))).as("bin"),
          col("n_chars"))
        .groupBy("bin")
        .agg(count(lit(1)).as("_nd"), sum("n_chars").as("_nc"))
        .localCheckpoint(true) // ≤22 rows, read by the sweep AND the total
      val tot = bins.agg(sum("_nd").as("_td"), sum("_nc").as("_tc"))
      val grid = s.range(0, 21).select(col("id").as("ti"))
      grid.join(broadcast(bins), col("bin") >= col("ti"), "left")
        .groupBy("ti")
        .agg(coalesce(sum("_nd"), lit(0L)).as("docs_kept"),
          coalesce(sum("_nc"), lit(0L)).as("chars_kept"))
        .crossJoin(broadcast(tot))
        .select(
          ((col("ti") * 1000 - 10000) / lit(10000.0)).as("threshold"),
          col("docs_kept"), col("chars_kept"),
          round(col("docs_kept").cast("double") / col("_td"), 6).as("frac_docs"),
          round(col("chars_kept").cast("double") / col("_tc"), 6).as("frac_chars"))
    }),

    "q177_rate_anomaly" -> ((s, dir) => {
      // Hourly event-rate ANOMALY monitor: per event type, each hour's
      // count z-scored against its trailing 24h window (RANGE frame on
      // the integer hour key — PARTITIONED by type, scales with types ×
      // hours, never a global window). Variance comes from the exact
      // integer window sums (Σn, Σn²) — both engines evaluate the
      // IDENTICAL closed form, so no Welford-vs-two-pass float drift —
      // and an hour needs a ≥12-sample window before it can alarm.
      val hourly = t(s, dir, "events")
        .select(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .groupBy("event_type", "h").agg(count(lit(1)).as("n"))
        .withColumn("_hr", (unix_micros(col("h")) / 3600000000L).cast("long"))
      val w = Window.partitionBy("event_type").orderBy(col("_hr"))
        .rangeBetween(-24, -1)
      val stats = hourly
        .withColumn("_k", count(col("n")).over(w))
        .withColumn("_s1", sum(col("n")).over(w))
        .withColumn("_s2", sum(col("n") * col("n")).over(w))
      val mean = col("_s1").cast("double") / col("_k")
      val variance = (col("_s2").cast("double")
        - col("_s1").cast("double") * col("_s1") / col("_k")) / (col("_k") - 1)
      val z = when(col("_k") >= 12 && variance > 0,
        round((col("n") - mean) / sqrt(variance), 4))
      stats.select(col("event_type"), col("h"), col("n"),
          when(col("_k") >= 1, round(mean, 4)).as("mean_24h"),
          z.as("z"),
          coalesce(abs(z) > 3.0, lit(false)).as("anomaly"))
    }),

    "q179_burstiness" -> ((s, dir) => {
      // Token BURSTINESS (Church & Gale 1995): variance-to-mean ratio of
      // per-document counts for the top-20 corpus tokens — VMR ≈ 1 is
      // Poisson scatter (function words), VMR ≫ 1 is topical clumping.
      // The signal separates "frequent because everywhere" from
      // "frequent because a few docs repeat it" — which q148's raw
      // counts cannot. ALL moments from exact integer sums (Σc, Σc²
      // per token; zero-count docs enter through N, never as rows), so
      // both engines' doubles agree bit-for-bit. Top-20 rides
      // GlobalRank; the per-(tok, doc) aggregate is the only
      // corpus-keyed shuffle.
      val docs = t(s, dir, "documents")
      val nrow = docs.agg(count(lit(1)).as("_N"))
      val tokDoc = docs
        .select(col("doc_id"),
          explode(split(lower(TextExprs.cleanText(col("text"))), " ")).as("tok"))
        .where(col("tok") =!= "")
        .groupBy("tok", "doc_id").agg(count(lit(1)).as("c"))
      val totals = tokDoc.groupBy("tok")
        .agg(sum("c").as("total"), count(lit(1)).as("df"),
          sum(col("c") * col("c")).as("_s2"))
      val top = graft.operators.GlobalRank.withRowNumber(totals,
          Seq(col("total").desc, col("tok").asc), "_rn")
        .where(col("_rn") <= 20)
      val mean = col("total").cast("double") / col("_N")
      val variance = (col("_s2").cast("double")
        - col("total").cast("double") * col("total") / col("_N")) / (col("_N") - 1)
      top.crossJoin(broadcast(nrow))
        .select(col("tok"), col("total"), col("df"),
          round(variance / mean, 4).as("vmr"),
          (variance / mean > 1.5).as("bursty"))
    }),

    "q185_bot_profile" -> ((s, dir) => {
      // Behavioral BOT/automation profile per user — the abuse filter a
      // behavioral-data pipeline runs before events feed training: event
      // volume, action-type entropy (low = single-purpose automation),
      // and the coefficient of variation of inter-arrival gaps (near-zero
      // = timer-driven). One window pass for gaps (PARTITIONED by user —
      // scales with users), two slim aggregates; type entropy from exact
      // integer counts, gap moments from per-event doubles (each term
      // exact, 4-dp rounding absorbs association noise). Users need ≥5
      // events to be profiled.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("_gap",
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
            .cast("double") / 1e6)
      val gaps = ev.where(col("_gap").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("_k"), sum("_gap").as("_s1"),
          sum(col("_gap") * col("_gap")).as("_s2"))
      val types = ev.groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      val ent = types.groupBy("user_id")
        .agg(count(lit(1)).as("n_types"), sum("c").as("n_events"),
          sum(col("c").cast("double") * log(col("c").cast("double"))).as("_clnc"))
        .select(col("user_id"), col("n_types"), col("n_events"),
          round(log(col("n_events").cast("double"))
            - col("_clnc") / col("n_events"), 4).as("type_entropy"))
      val mean = col("_s1") / col("_k")
      val variance = (col("_s2") - col("_s1") * col("_s1") / col("_k")) / (col("_k") - 1)
      val cv = when(col("_k") >= 2 && mean > 0, round(sqrt(variance) / mean, 4))
      ent.join(gaps, "user_id")
        .where(col("n_events") >= 5)
        .select(col("user_id"), col("n_events"), col("n_types"),
          col("type_entropy"), cv.as("gap_cv"),
          (col("type_entropy") < 0.5 || coalesce(cv < 0.1, lit(false))).as("bot_like"))
    }),

    "q186_funnel" -> ((s, dir) => {
      // Ordered event funnel view → click → purchase: each step counts
      // users whose FIRST qualifying event strictly follows their entry
      // into the previous step (the sequential-conversion semantics, not
      // mere set intersection). Three per-user min-aggregates chained by
      // user_id-keyed joins — every shuffle is on user_id, no windows, no
      // driver loop; the 3-row summary assembles via broadcast crossJoins
      // of single-row counts.
      val ev = t(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
      val v = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c = ev.where(col("event_type") === "click")
        .join(v, "user_id").where(col("ts") > col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val p = ev.where(col("event_type") === "purchase")
        .join(c, "user_id").where(col("ts") > col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      val nv = v.agg(count(lit(1)).as("nv"))
      val nc = c.agg(count(lit(1)).as("nc"))
      val np = p.agg(count(lit(1)).as("np"))
      val one = nv.crossJoin(nc).crossJoin(np)
      one.select(lit("1_view").as("step"), col("nv").as("n_users"),
          lit(1.0).as("conv_from_prev"), lit(1.0).as("conv_from_top"))
        .unionAll(one.select(lit("2_click").as("step"), col("nc").as("n_users"),
          round(col("nc").cast("double") / col("nv"), 4).as("conv_from_prev"),
          round(col("nc").cast("double") / col("nv"), 4).as("conv_from_top")))
        .unionAll(one.select(lit("3_purchase").as("step"), col("np").as("n_users"),
          round(col("np").cast("double") / col("nc"), 4).as("conv_from_prev"),
          round(col("np").cast("double") / col("nv"), 4).as("conv_from_top")))
    }),

    "q187_cohort_retention" -> ((s, dir) => {
      // Weekly cohort retention triangle: cohort = Monday week of the
      // user's first event; a (cohort, offset) cell counts users with any
      // activity that week. Two user_id-keyed aggregates + one distinct —
      // no windows; the per-cell join to cohort size is on the tiny
      // cohort dimension (broadcast). Offsets are exact day-diffs / 7
      // between week starts, immune to engine week-numbering.
      val ev = t(s, dir, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      val firsts = ev.groupBy("user_id").agg(min("wk").as("cohort_wk"))
      val active = ev.join(firsts, "user_id")
        .select(col("user_id"), col("cohort_wk"),
          (datediff(col("wk"), col("cohort_wk")) / 7).cast("long").as("week_offset"))
        .distinct()
      val sizes = firsts.groupBy("cohort_wk").agg(count(lit(1)).as("cohort_size"))
      active.groupBy("cohort_wk", "week_offset")
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(sizes), "cohort_wk")
        .select(col("cohort_wk"), col("week_offset"), col("n_active"),
          col("cohort_size"),
          round(col("n_active").cast("double") / col("cohort_size"), 4)
            .as("retention"))
    }),

    "q188_event_concentration" -> ((s, dir) => {
      // Event-volume concentration audit (the Lorenz curve by user
      // decile): per-user event counts get a GLOBAL total-order decile
      // from GlobalRank.withNtile — one range exchange, no
      // single-partition window — then one 10-row aggregate; cumulative
      // share comes from a triangular self-join on the 10-row table
      // (q146's suffix-sum shape), never a second corpus pass. Reads off
      // whether 1% of users generate half the behavioral data before it
      // feeds training.
      val cnts = t(s, dir, "events").groupBy("user_id")
        .agg(count(lit(1)).as("cnt"))
      val dec = graft.operators.GlobalRank.withNtile(
        cnts, 10, Seq(col("cnt").asc, col("user_id").asc), "decile")
      val byDec = dec.groupBy("decile")
        .agg(count(lit(1)).as("n_users"), sum("cnt").as("n_events"))
      val tot = byDec.agg(sum("n_events").as("tot"))
      val cum = byDec.select(col("decile").as("d2"), col("n_events").as("e2"))
        .join(byDec.select(col("decile")), col("d2") <= col("decile"))
        .groupBy("decile").agg(sum("e2").as("cum_events"))
      byDec.join(cum, "decile").crossJoin(broadcast(tot))
        .select(col("decile"), col("n_users"), col("n_events"),
          round(col("n_events").cast("double") / col("tot"), 4).as("share"),
          round(col("cum_events").cast("double") / col("tot"), 4).as("cum_share"))
    }),

    "q191_post_incident" -> ((s, dir) => {
      // Post-incident contamination audit: per event, the user's most
      // recent PRIOR error timestamp rides one partitioned running-max
      // window (max of the error-only timestamp, rows unbounded-preceding
      // → 1-preceding — the conditional as-of lookup without a join);
      // events within 60 s of an error are flagged as reaction artifacts
      // a behavioral-training feed should drop. One window pass + one
      // slim per-type aggregate.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("_last_err",
          max(when(col("event_type") === "error", unix_micros(col("ts")))).over(w))
        .withColumn("_gap_s",
          (unix_micros(col("ts")) - col("_last_err")).cast("double") / 1e6)
      ev.where(col("event_type") =!= "error")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          count(col("_last_err")).as("n_after_error"),
          sum(when(col("_gap_s") <= 60.0, 1L).otherwise(0L)).as("n_within_60s"))
        .select(col("event_type"), col("n_events"), col("n_after_error"),
          col("n_within_60s"),
          round(col("n_within_60s").cast("double") / col("n_events"), 4)
            .as("contamination_rate"))
    }),

    "q194_daily_trend" -> ((s, dir) => {
      // Per-type daily-volume trend: closed-form OLS slope/intercept/R²
      // over a ZERO-FILLED day scaffold (a silent empty day must read as
      // 0, not a missing x) — q64's gap-fill shape feeding exact-integer
      // regression sums: every Σ is a long until the final division, so
      // no float boundary can move a statistic; the day axis lives in one
      // broadcast row, the only corpus-sized step is the (type, day)
      // count aggregate.
      val ev = t(s, dir, "events")
        .select(col("event_type"), col("ts").cast("date").as("day"))
      val daily = ev.groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("d0"), (datediff(col("d1"), col("d0")) + 1).cast("long").as("nd"))
      val scaffold = broadcast(bounds)
        .select(col("d0"), col("nd"),
          explode(sequence(lit(0L), col("nd") - 1)).as("x"))
        .select(col("nd"), col("x"), date_add(col("d0"), col("x").cast("int")).as("day"))
        .crossJoin(broadcast(ev.select("event_type").distinct()))
      val series = scaffold.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("nd"), col("x"),
          coalesce(col("c"), lit(0L)).as("y"))
      val sums = series.groupBy("event_type", "nd")
        .agg(sum("x").as("sx"), sum(col("x") * col("x")).as("sxx"),
          sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
      val covN = col("nd") * col("sxy") - col("sx") * col("sy")   // n·cov (long)
      val varXN = col("nd") * col("sxx") - col("sx") * col("sx")  // n·var x
      val varYN = col("nd") * col("syy") - col("sy") * col("sy")  // n·var y
      sums.select(col("event_type"), col("nd").as("n_days"),
          col("sy").as("n_events"),
          round(covN.cast("double") / varXN, 6).as("slope"),
          round((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double")
            / varXN, 6).as("intercept"),
          when(varYN > 0, round((covN * covN).cast("double")
            / (varXN * varYN).cast("double"), 6)).as("r2"))
    }),

    "q199_session_conversion" -> ((s, dir) => {
      // Session-level conversion by engagement depth: q35's gap
      // sessionization (lag + running sum share ONE partitioned
      // window pass) rolled up to sessions, then bucketed by event
      // count — does conversion rise with session length, the shape
      // every funnel owner asks for next. The bucket table is
      // session-cardinality-sized; no second corpus pass.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("_gap_us"))
        .withColumn("_new_sess",
          when(col("_gap_us").isNull || col("_gap_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_no", sum("_new_sess").over(wRun))
        .groupBy("user_id", "session_no")
        .agg(count(lit(1)).as("n_events"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"))
      val bucket = when(col("n_events") === 1, "1")
        .when(col("n_events") <= 4, "2-4")
        .when(col("n_events") <= 9, "5-9")
        .otherwise("10+")
      sess.groupBy(bucket.as("size_bucket"))
        .agg(count(lit(1)).as("n_sessions"),
          sum("converted").as("n_converted"))
        .select(col("size_bucket"), col("n_sessions"), col("n_converted"),
          round(col("n_converted").cast("double") / col("n_sessions"), 4)
            .as("conv_rate"))
    }),

    "q211_stickiness" -> ((s, dir) => {
      // DAU/MAU stickiness per month — the engagement ratio product
      // teams track: average daily-active over monthly-active. Two
      // distinct projections (user,day) and (user,month) — both
      // map-side-combining aggregates; every count is an integer so the
      // ratio is the only division.
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("ts").cast("date").as("day"),
          date_trunc("month", col("ts")).cast("date").as("month"))
      val dau = ev.select("user_id", "day", "month").distinct()
        .groupBy("month", "day").agg(count(lit(1)).as("dau"))
      val mau = ev.select("user_id", "month").distinct()
        .groupBy("month").agg(count(lit(1)).as("mau"))
      dau.groupBy("month")
        .agg(count(lit(1)).as("n_days"), sum("dau").as("_sdau"))
        .join(broadcast(mau), "month")
        .select(col("month"), col("n_days"),
          round(col("_sdau").cast("double") / col("n_days"), 4).as("avg_dau"),
          col("mau"),
          round(col("_sdau").cast("double") / (col("n_days") * col("mau")), 4)
            .as("stickiness"))
    }),

    "q236_engagement_revenue" -> ((s, dir) => {
      // Engagement-to-revenue linkage: users bucketed into event-count
      // deciles (GlobalRank ntile — range exchange, no global window),
      // LEFT-joined to their order revenue in exact cents so silent
      // users with zero orders stay in the curve (the monetization-
      // by-engagement read; an inner join would fabricate a correlation
      // by dropping exactly the flat part of the curve).
      val ev = t(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      val dec = graft.operators.GlobalRank.withNtile(ev, 10,
        Seq(col("n_events").asc, col("user_id").asc), "decile")
      val rev = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      dec.join(rev, col("user_id") === col("o_custkey"), "left")
        .select(col("decile"), col("n_events"),
          coalesce(col("cents"), lit(0L)).as("cents"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_users"), sum("n_events").as("n_events"),
          sum(when(col("cents") > 0, 1L).otherwise(0L)).as("n_buyers"),
          round(sum("cents").cast("double") / 100.0, 2).as("revenue"),
          round(sum("cents").cast("double") / count(lit(1)) / 100.0, 4)
            .as("revenue_per_user"))
    }),

    "q237_funnel_latency" -> ((s, dir) => {
      // Time-to-convert for the view→purchase funnel: first purchase
      // STRICTLY after the user's first view (q186's sequential
      // semantics), latency distribution via the Percentiles rank
      // dataflow — the conversion-window sizing read (how long to keep
      // retargeting state). Two keyed min-aggregates + one broadcast-
      // sized join; no corpus-sized shuffle beyond the event grain.
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("ts")).as("e"))
      val firstView = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("e").as("tv"))
      val firstBuy = ev.where(col("event_type") === "purchase").as("p")
        .join(broadcast(firstView).as("v"), col("p.user_id") === col("v.user_id"))
        .where(col("e") > col("tv"))
        .groupBy(col("p.user_id").as("user_id"))
        .agg(min("e").as("tp"), min("tv").as("tv0"))
      val lat = firstBuy
        .select(lit("all").as("g"), (col("tp") - col("tv0")).as("lat_s"))
      val pct = graft.operators.Percentiles.exactByGroup(
        lat, col("g"), col("lat_s"), Seq(0.5, 0.9), Seq("p50_s", "p90_s"))
      val agg = lat.agg(count(lit(1)).as("n_converted"),
        round(avg("lat_s"), 4).as("mean_s"))
      agg.crossJoin(broadcast(pct))
        .select(col("n_converted"), col("mean_s"),
          round(col("p50_s"), 4).as("p50_s"), round(col("p90_s"), 4).as("p90_s"))
    }),

    "q238_dwell_time" -> ((s, dir) => {
      // Dwell-time attribution per event type: the time a user spends
      // ON an event = gap to their next event, session-gated at 30 min
      // (open-ended tails drop out rather than fabricating dwell) — the
      // engagement-quality complement of q200's transition counts. One
      // partitioned lead window; exact p50/p90 via the rank dataflow.
      val w = Window.partitionBy("user_id").orderBy(col("e"), col("event_id"))
      val dwell = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("e"))
        .withColumn("gap", lead(col("e"), 1).over(w) - col("e"))
        .where(col("gap").isNotNull && col("gap") <= 1800)
      val stats = dwell.groupBy("event_type")
        .agg(count(lit(1)).as("n_dwells"), round(avg("gap"), 4).as("mean_s"))
      val pct = graft.operators.Percentiles.exactByGroup(
          dwell, col("event_type"), col("gap"),
          Seq(0.5, 0.9), Seq("p50_s", "p90_s"))
        .withColumnRenamed("group", "event_type")
      stats.join(broadcast(pct), "event_type")
        .select(col("event_type"), col("n_dwells"), col("mean_s"),
          round(col("p50_s"), 4).as("p50_s"), round(col("p90_s"), 4).as("p90_s"))
    }),

    "q242_rolling_active_users" -> ((s, dir) => {
      // Exact 7-day rolling distinct users (WAU ending each day) + DAU +
      // per-day stickiness. Sliding-window COUNT DISTINCT doesn't merge,
      // so the scalable exact form fans each (user, day) out to the ≤7
      // window END days it supports and de-dups — shuffle volume is
      // 7×|user-days| (the post-distinct grain, NOT the raw event count),
      // then two plain counting aggregates. Zero-filled day scaffold so
      // silent days read 0, not missing.
      val ud = t(s, dir, "events")
        .select(col("user_id"), col("ts").cast("date").as("day"))
        .distinct()
        .localCheckpoint() // feeds DAU, the window fan-out, and the bounds
      val scaffold = broadcast(
          ud.agg(min("day").as("d0"), max("day").as("d1")))
        .select(col("d0"), explode(
          sequence(lit(0), datediff(col("d1"), col("d0")))).as("x"))
        .select(date_add(col("d0"), col("x")).as("day"))
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = ud.select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("o"), col("day"))
        .select(col("user_id"), date_add(col("day"), col("o")).as("day"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("wau"))
      scaffold.join(dau, Seq("day"), "left").join(wau, Seq("day"), "left")
        .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
          coalesce(col("wau"), lit(0L)).as("wau"))
        .select(col("day"), col("dau"), col("wau"),
          when(col("wau") > 0,
            round(col("dau").cast("double") / col("wau"), 4)).as("stickiness"))
    }),

    "q251_growth_accounting" -> ((s, dir) => {
      // Daily growth accounting (the Social-Capital decomposition):
      // active = new + retained + resurrected, churned = yesterday's
      // active not seen today, quick ratio = (new+resurrected)/churned.
      // Days are epoch days (engine-neutral); everything flows from ONE
      // distinct (user, day) projection — the corpus-sized step — then
      // day-grain self-joins; all counts exact LONGs.
      val uw = t(s, dir, "events")
        .select(col("user_id"),
          expr("cast(datediff(cast(ts as date), date '1970-01-01') as bigint)")
            .as("dy"))
        .distinct()
        .localCheckpoint() // feeds first-day, self-join, and actives
      val firstDy = uw.groupBy("user_id").agg(min("dy").as("fdy"))
      val active = uw.groupBy("dy").agg(count(lit(1)).as("active"))
      val nw = firstDy.groupBy(col("fdy").as("dy")).agg(count(lit(1)).as("new_users"))
      val ret = uw.as("cur")
        .join(uw.select(col("user_id"), (col("dy") + 1).as("dy")).as("prv"),
          Seq("user_id", "dy"))
        .groupBy("dy").agg(count(lit(1)).as("retained"))
      val scaffold = broadcast(uw.agg(min("dy").as("d0"), max("dy").as("d1")))
        .select(explode(sequence(col("d0"), col("d1"))).as("dy"))
      scaffold
        .join(active, Seq("dy"), "left")
        .join(nw, Seq("dy"), "left")
        .join(ret, Seq("dy"), "left")
        .join(active.select((col("dy") + 1).as("dy"),
          col("active").as("prev_active")), Seq("dy"), "left")
        .select(col("dy"),
          coalesce(col("active"), lit(0L)).as("active"),
          coalesce(col("new_users"), lit(0L)).as("new_users"),
          coalesce(col("retained"), lit(0L)).as("retained"),
          (coalesce(col("active"), lit(0L)) - coalesce(col("new_users"), lit(0L))
            - coalesce(col("retained"), lit(0L))).as("resurrected"),
          (coalesce(col("prev_active"), lit(0L)) - coalesce(col("retained"), lit(0L)))
            .as("churned"))
        .select(date_add(to_date(lit("1970-01-01")), col("dy").cast("int")).as("day"),
          col("active"), col("new_users"), col("retained"), col("resurrected"),
          col("churned"),
          when(col("churned") > 0,
            round((col("new_users") + col("resurrected")).cast("double")
              / col("churned"), 4)).as("quick_ratio"))
    }),

    "q254_latency_histogram" -> ((s, dir) => {
      // HdrHistogram-style log₂ latency histogram of session-gated dwell
      // times: bucket = ⌊log₂ gap⌋ computed EXACTLY as the length of the
      // binary string (length(conv(gap, 10, 2)) − 1 — no float log at a
      // power-of-2 boundary can misbucket), bounds as exact powers of
      // two. The fixed-bucket histogram is the mergeable latency sketch:
      // per-partition partial counts combine losslessly, so the full
      // distribution costs one map-side-combining aggregate at any
      // scale.
      val w = Window.partitionBy("user_id").orderBy(col("e"), col("event_id"))
      val gaps = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("e"))
        .withColumn("gap", lead(col("e"), 1).over(w) - col("e"))
        .where(col("gap").isNotNull && col("gap") >= 1 && col("gap") <= 1800)
      val b = gaps.select(col("event_type"),
        (length(conv(col("gap").cast("string"), 10, 2)) - 1).cast("long").as("bucket"))
        .groupBy("event_type", "bucket").agg(count(lit(1)).as("n_gaps"))
      val tot = b.groupBy("event_type").agg(sum("n_gaps").as("n_type"))
      b.join(broadcast(tot), "event_type")
        .select(col("event_type"), col("bucket"),
          pow(lit(2.0), col("bucket").cast("double")).cast("long").as("lo_s"),
          (pow(lit(2.0), (col("bucket") + 1).cast("double")).cast("long") - 1)
            .as("hi_s"),
          col("n_gaps"),
          round(col("n_gaps").cast("double") / col("n_type"), 4).as("share"))
    }),

    "q256_cohort_ltv" -> ((s, dir) => {
      // Cohort LTV triangle: users cohorted by FIRST-event day, purchase
      // value (exact cents) accumulated by age-in-days since cohort —
      // cum_ltv(cohort, age) is the curve every payback / CAC decision
      // reads. One user-grain aggregate for cohorts, one (cohort, age)
      // aggregate for revenue, then a cohort-partitioned running sum
      // (ages are bounded by the stream span, so no partition outgrows a
      // task) and a broadcast size join; cents stay LONG into the final
      // two display divisions.
      val ev = t(s, dir, "events").select(col("user_id"),
        datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
          .cast("long").as("dy"),
        col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      val cohort = ev.groupBy("user_id").agg(min("dy").as("cd"))
      val sizes = cohort.groupBy("cd").agg(count(lit(1)).as("cohort_size"))
      val rev = ev.where(col("event_type") === "purchase")
        .join(cohort, "user_id")
        .groupBy(col("cd"), (col("dy") - col("cd")).as("age_days"))
        .agg(sum("cents").as("rc"))
      val w = Window.partitionBy("cd").orderBy("age_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev.withColumn("cum", sum("rc").over(w))
        .join(broadcast(sizes), "cd")
        .select(
          date_add(to_date(lit("1970-01-01")), col("cd").cast("int")).as("cohort_day"),
          col("cohort_size"), col("age_days"),
          round(col("rc").cast("double") / 100.0, 2).as("revenue"),
          // 4-dp LTV by integer FLOOR division — a round() of the double
          // quotient can land on a .00005 boundary and split the engines
          (expr("(cum * 100) div cohort_size").cast("double") / 10000.0)
            .as("cum_ltv_per_user"))
    }),

    "q279_attribution" -> ((s, dir) => {
      // Marketing-style revenue attribution over sessionized events:
      // each session's purchase value (exact cents) credited to its
      // FIRST-touch event type and to the LAST non-purchase type before
      // the first purchase ('direct' when the purchase opens the
      // session) — the two models whose disagreement quantifies how
      // much the channel story depends on the attribution choice. One
      // sessionize window pass (q35's lag + running sum, one shuffle),
      // bounded per-session windows, and a spec-checked invariant:
      // both models attribute the SAME total revenue.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"),
          round(col("value") * 100).cast("long").as("cents"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
            .as("_gap_us"))
        .withColumn("_new", when(col("_gap_us").isNull ||
          col("_gap_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_no", sum("_new").over(wRun))
      val wS = Window.partitionBy("user_id", "session_no")
        .orderBy("ts", "event_id")
      val rows = ev.withColumn("rn", row_number().over(wS).cast("long"))
        .select("user_id", "session_no", "rn", "event_type", "cents")
        .localCheckpoint() // first-purchase agg + both touch passes
      val sess = rows.groupBy("user_id", "session_no")
        .agg(sum(when(col("event_type") === "purchase", col("cents"))
            .otherwise(0L)).as("rev"),
          min(when(col("event_type") === "purchase", col("rn"))).as("fprn"),
          max(when(col("rn") === 1, col("event_type"))).as("first_type"))
        .where(col("rev") > 0)
        .localCheckpoint()
      val lastTouch = rows
        .join(sess.select(col("user_id"), col("session_no"), col("fprn")),
          Seq("user_id", "session_no"))
        .where(col("rn") < col("fprn") && col("event_type") =!= "purchase")
        .groupBy("user_id", "session_no")
        .agg(max(struct(col("rn"), col("event_type"))).as("_lt"))
        .select(col("user_id"), col("session_no"),
          col("_lt.event_type").as("last_type"))
      val attributed = sess
        .join(lastTouch, Seq("user_id", "session_no"), "left")
        .na.fill("direct", Seq("last_type"))
      val ft = attributed.groupBy(col("first_type").as("channel"))
        .agg(count(lit(1)).as("sessions_first"),
          sum("rev").as("rev_first"))
      val lt = attributed.groupBy(col("last_type").as("channel"))
        .agg(count(lit(1)).as("sessions_last"),
          sum("rev").as("rev_last"))
      ft.join(lt, Seq("channel"), "full_outer")
        .na.fill(0L, Seq("sessions_first", "rev_first",
          "sessions_last", "rev_last"))
        .select(col("channel"), col("sessions_first"),
          round(col("rev_first").cast("double") / 100.0, 2)
            .as("first_touch_revenue"),
          col("sessions_last"),
          round(col("rev_last").cast("double") / 100.0, 2)
            .as("last_touch_revenue"))
    }),

    "q283_peak_concurrency" -> ((s, dir) => {
      // Peak concurrent sessions per day by SWEEP-LINE interval
      // counting: each q35 session emits +1 at its start and −1 one
      // microsecond after its end; deltas collapse to the distinct-
      // timestamp grain, the concurrency level is ONE distributed
      // running sum over the timeline (GlobalRank — no single-partition
      // window), and the daily peak is a max over that level. The
      // capacity-planning number a naive per-minute GROUP BY gets
      // wrong (it samples, the sweep is exact).
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("_gap_us", col("us") - lag(col("us"), 1).over(w))
        .withColumn("_new", when(col("_gap_us").isNull ||
          col("_gap_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_no", sum("_new").over(wRun))
        .groupBy("user_id", "session_no")
        .agg(min("us").as("s_us"), max("us").as("e_us"))
        .localCheckpoint() // deltas + the per-day start census read it
      val deltas = sess.select(col("s_us").as("us"), lit(1L).as("d"))
        .unionAll(sess.select((col("e_us") + 1).as("us"), lit(-1L).as("d")))
        .groupBy("us").agg(sum("d").as("d"))
      val level = graft.operators.GlobalRank.withRunningSum(
        deltas, Seq(col("us").asc), col("d"), "conc")
      val peaks = level
        .select(expr("us div 86400000000").as("ed"), col("conc"))
        .groupBy("ed").agg(max("conc").as("peak_concurrency"))
      val started = sess
        .select(expr("s_us div 86400000000").as("ed"))
        .groupBy("ed").agg(count(lit(1)).as("sessions_started"))
      peaks.join(started, Seq("ed"), "full_outer")
        .na.fill(0L, Seq("peak_concurrency", "sessions_started"))
    }),

    "q293_segment_migration" -> ((s, dir) => {
      // Customer spend-quintile MIGRATION matrix between the order
      // stream's epoch halves — the CRM churn/upgrade view behind every
      // "segment health" dashboard. Each half ranks its customers into
      // quintiles via GlobalRank.withNtile (the range-exchange ntile —
      // identical semantics to ntile(5) OVER, no single-partition
      // window); customers absent from a half land in quintile 0, so
      // new/churned mass stays visible and the matrix provably tiles
      // the customer set. All-integer output with row shares at
      // display.
      val li = t(s, dir, "orders").select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("c"),
        datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
          .cast("long").as("ed"))
      val cut = broadcast(li.agg(min("ed").as("lo"), max("ed").as("hi"))
        .select(expr("(lo + hi) div 2").as("cut")))
      val pinned = li.crossJoin(cut).localCheckpoint()
      def quintiles(half: DataFrame): DataFrame =
        graft.operators.GlobalRank.withNtile(
          half.groupBy("o_custkey").agg(sum("c").as("v")),
          buckets = 5, Seq(col("v").asc, col("o_custkey").asc), "q")
          .select(col("o_custkey"), col("q").cast("long").as("q"))
      val q0 = quintiles(pinned.where(col("ed") <= col("cut")))
        .withColumnRenamed("q", "q_early")
      val q1 = quintiles(pinned.where(col("ed") > col("cut")))
        .withColumnRenamed("q", "q_late")
      val cellsM = q0.join(q1, Seq("o_custkey"), "full_outer")
        .na.fill(0L, Seq("q_early", "q_late"))
        .groupBy("q_early", "q_late").agg(count(lit(1)).as("n_customers"))
      cellsM.join(cellsM.groupBy("q_early").agg(sum("n_customers").as("_r")),
          Seq("q_early"))
        .select(col("q_early"), col("q_late"), col("n_customers"),
          round(col("n_customers").cast("double") / col("_r"), 4)
            .as("row_share"))
    }),

    "q349_stream_static_enrich" -> ((s, dir) => {
      // STREAM-STATIC enrichment under the oracle (VERDICT r16 #3 — the
      // one streaming shape that had only a spec): events replayed as a
      // 4-batch file stream are joined IN the streaming plan to a static
      // customer dimension (EventStreams.enrichWithDim — broadcast under
      // the threshold, stateless, no watermark: the static side is
      // bounded so the stream never buffers), the enriched rows append
      // per batch, and the read-back rolls up per (segment, event_type).
      // Stateless join ⇒ batch-membership-invariant, so the rollup must
      // equal the plain batch join — which is the twin verbatim. At
      // 100 TB this is the decorate-at-ingest posture: the dimension
      // ships to executors once, events never shuffle.
      val dim = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      streamReplay(s, dir, "q349") {
        _.select(col("event_id"), col("user_id"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"), col("ts"))
      } { (stream, ckpt, out) =>
        graft.streaming.EventStreams.enrichWithDim(stream, dim, "user_id")
          .select(col("event_id"), col("event_type"), col("cents"),
            col("c_mktsegment"))
          .writeStream
          .option("checkpointLocation", ckpt)
          .format("parquet").option("path", out)
          .start()
      }
        .groupBy(coalesce(col("c_mktsegment"), lit("(none)")).as("segment"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("cents").cast("double") / 100.0, 2).as("sum_value"))
    }),

    "q302_stream_window" -> ((s, dir) => {
      // Structured Streaming END-TO-END under the batch oracle: the events
      // table is re-sharded into 4 parquet files and replayed as a FILE
      // STREAM one file per micro-batch (a real multi-batch incremental
      // aggregation, not a single-trigger replay); tumbling 1-hour windows
      // aggregate across batches in the state store; complete-mode
      // foreachBatch overwrites the result parquet each trigger, so the
      // FINAL materialization equals the one-shot batch GROUP BY — the
      // batch-equivalence DuckDB twins with date_trunc. Values follow the
      // suite's cents discipline (exact LONGs through the streaming state,
      // display division at the end), so partial-agg order across
      // micro-batches cannot flip a bit.
      streamReplay(s, dir, "q302") {
        _.select(col("ts"), col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
      } { (stream, ckpt, out) =>
        stream
          .withWatermark("ts", "10 minutes")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
          .writeStream
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: Long) =>
              batch.write.mode("overwrite").parquet(out)
          }
          .start()
      }
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"),
          round(col("cents").cast("double") / 100.0, 2).as("sum_value"))
    }),

    "q305_stream_sessions" -> ((s, dir) => {
      // Session windows under the batch oracle, WITH watermark-eviction
      // semantics made explicit: gap-based session_window aggregation in
      // APPEND mode emits a session only once the event-time watermark
      // passes its end (last event + gap) — so after a bounded replay the
      // materialized set is exactly the sessions whose end the final
      // watermark has reached (end <= the corpus's max timestamp), and the
      // still-open tail sessions are withheld, which is what a production
      // job would hand the next trigger. The DuckDB twin sessionizes
      // identically (q35's lag/cumsum dataflow, 30-min gap) and applies the
      // same eviction predicate: last_ts + gap <= global max ts. Cents
      // discipline keeps
      // per-session sums exact across micro-batch state merges.
      streamReplay(s, dir, "q305", timeOrdered = true) {
        _.select(col("ts"), col("event_type"), col("user_id"),
          round(col("value") * 100).cast("long").as("cents"))
      } { (stream, ckpt, out) =>
        stream
          .withWatermark("ts", "0 seconds")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"), sum("cents").as("cents"))
          .writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: Long) =>
              batch.write.mode("append").parquet(out)
          }
          .start()
      }
        .select(col("user_id"),
          col("session_window.start").as("sess_start"),
          col("n_events"),
          round(col("cents").cast("double") / 100.0, 2).as("sess_value"))
    }),

    "q306_stream_state_totals" -> ((s, dir) => {
      // Arbitrary stateful processing under the batch oracle:
      // mapGroupsWithState running (count, cents) per event type across 4
      // micro-batches. Update-mode emissions land in an append sink with
      // their batch id; totals are CUMULATIVE, so the latest emission per
      // key IS the full total regardless of which batch last touched the
      // key — that final slice must equal the one-shot batch GROUP BY,
      // bit-for-bit (exact LONGs through the state store).
      val mat = streamReplay(s, dir, "q306") {
        _.select(col("event_type"),
          round(col("value") * 100).cast("long").as("cents"))
      } { (stream, ckpt, out) =>
        graft.streaming.EventStreams.runningCentTotals(stream)
          .writeStream
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             id: Long) =>
              batch.withColumn("batch_id", lit(id))
                .write.mode("append").parquet(out)
          }
          .start()
      }
      import org.apache.spark.sql.expressions.Window
      mat.withColumn("_rk", row_number().over(
          Window.partitionBy("event_type").orderBy(col("batch_id").desc)))
        .where(col("_rk") === 1)
        .select(col("event_type"), col("n"),
          round(col("cents").cast("double") / 100.0, 2).as("sum_value"))
    }),

    "q307_stream_stream_join" -> ((s, dir) => {
      // Stream-stream interval join under the batch oracle — the last
      // spec-only streaming surface brought under the gate. Errors and
      // purchases are two watermarked filters of the SAME replayed file
      // stream (a streaming self-join); the join condition bounds
      // event-time distance in both directions, so each side's state is
      // provably droppable once the watermark passes, and over a bounded
      // time-ordered replay every matched pair emits exactly once —
      // append materialization == the batch theta-join, which DuckDB
      // twins verbatim. Values pass through unaggregated (bit-identical
      // from the same parquet), no rounding needed.
      streamReplay(s, dir, "q307", timeOrdered = true) {
        _.select(col("ts"), col("event_type"), col("user_id"),
          col("event_id"), col("value"))
      } { (stream, ckpt, out) =>
        graft.streaming.EventStreams.errorPurchaseJoin(
            stream.where(col("event_type") === "error"),
            stream.where(col("event_type") === "purchase"))
          .writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: Long) =>
              batch.write.mode("append").parquet(out)
          }
          .start()
      }
        .select(col("error_id"), col("user_id"), col("error_ts"),
          col("purchase_ts"), col("purchase_value"))
    }),

    "q322_stream_closed_sessions" -> ((s, dir) => {
      // flatMapGroupsWithState sessionization under the batch oracle — the
      // last stateful-API variant without a CORRECTNESS row (q305 covers
      // session_window, q306 mapGroupsWithState). closedCentSessions is
      // the BATCH-EQUIVALENT emit-on-close shape: in-batch gaps split and
      // emit immediately, each user's final session emits when the
      // event-time timeout fires, so over the time-ordered replay the
      // materialization equals batch sessionization minus the tail
      // sessions the final watermark never reached (strict <, the
      // GroupState timeout contract) — which the DuckDB twin states as
      // last_ts + gap < max ts.
      streamReplay(s, dir, "q322", timeOrdered = true) {
        _.select(col("ts"), col("user_id"),
          round(col("value") * 100).cast("long").as("cents"))
      } { (stream, ckpt, out) =>
        graft.streaming.EventStreams.closedCentSessions(stream)
          .writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: Long) =>
              batch.write.mode("append").parquet(out)
          }
          .start()
      }
        .select(col("user_id"), col("n_events"),
          round(col("cents").cast("double") / 100.0, 2).as("sess_value"),
          col("first_ts_ms"), col("last_ts_ms"))
    }),

    "q314_purchase_interarrival" -> ((s, dir) => {
      // Repeat-purchase inter-arrival distribution, bucketed to hours —
      // the empirical replacement for an assumed-exponential arrival
      // model. Gaps are exact integer microsecond diffs from one
      // per-user window pass (q35's partitioning), floored to hours so
      // the output table is bounded (≤ the fixture's time span in hours)
      // and every value is engine-neutral integer arithmetic.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gaps = t(s, dir, "events")
        .where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("_gap_us",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .where(col("_gap_us").isNotNull)
        .select((col("_gap_us") / lit(3600000000L)).cast("long").as("gap_h"))
      val g = gaps.groupBy("gap_h").agg(count(lit(1)).as("n_gaps"))
      g.crossJoin(broadcast(g.agg(sum("n_gaps").as("_t"))))
        .select(col("gap_h"), col("n_gaps"),
          round(col("n_gaps").cast("double") / col("_t"), 4).as("share"))
    }),

    "q325_stream_dedup_ttl" -> ((s, dir) => {
      // dropDuplicatesWithinWatermark under the batch oracle — streaming
      // exact dedup with TTL'd state, the ingest-side twin of q26: a key
      // re-appearing AFTER its state expired is legitimately re-emitted
      // (state = first-seen event time + delay; the watermark, not an
      // operator timeout, evicts). The events table is replayed as 4
      // micro-batches sliced by event-time QUARTER, each slice
      // pre-compacted to one row per (user_id, event_type) at its min ts
      // — batch membership and the kept row are pure functions of the
      // corpus, and every slice row is ≥ the running watermark (delay > 0)
      // so the late-drop path never fires. Watermark arithmetic is
      // MILLISECOND-floored (Spark collects event-time stats in ms); the
      // DuckDB twin replays the calibrated state machine: cleanup runs at
      // END of batch (inclusive: expiry ≤ wm evicts), so back-to-back
      // file batches see the PREVIOUS batch's watermark — see q325Sql and
      // the Round14Spec boundary probes.
      val ev = Tables.table(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"),
          unix_micros(col("ts")).as("tus"))
      val mm = ev.agg(min("tus"), max("tus")).head
      val (tmin, tmax) = (mm.getLong(0), mm.getLong(1))
      val span = tmax - tmin
      val delayMs = span / 1000L / 8L
      val sl = ev.withColumn("b",
        expr(s"((tus - ${tmin}L) * 4) div ${span + 1}L"))
      val slices = (0 until 4).map(i => sl.where(col("b") === i)
        .groupBy("user_id", "event_type").agg(min("ts").as("ts")))
      QueryHelpers.streamReplaySlices(s, "q325", slices) { (stream, ckpt, out) =>
        stream
          .withWatermark("ts", s"$delayMs milliseconds")
          .dropDuplicatesWithinWatermark("user_id", "event_type")
          .writeStream
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: Long) =>
              batch.write.mode("append").parquet(out)
          }
          .start()
      }.select(col("user_id"), col("event_type"), col("ts"))
    }),
  )

  val oracleSql: ListMap[String, String] = ListMap(
      "q35_sessionize" ->
        """WITH o AS (SELECT user_id, event_id, ts,
          |    epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP))
          |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          |  FROM events),
          |s AS (SELECT user_id, event_id, ts,
          |    CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS new_sess
          |  FROM o),
          |c AS (SELECT user_id, ts,
          |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
          |  FROM s)
          |SELECT user_id, session_no, count(*) AS n_events,
          | min(ts) AS sess_start, max(ts) AS sess_end
          |FROM c GROUP BY user_id, session_no""".stripMargin,

      "q72_funnel" ->
        """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
          |   WHERE event_type = 'view' GROUP BY 1),
          |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
          |   JOIN s1 ON e.user_id = s1.user_id
          |   WHERE e.event_type = 'click' AND e.ts > s1.t
          |    AND e.ts <= s1.t + INTERVAL 12 HOUR GROUP BY 1),
          |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
          |   JOIN s2 ON e.user_id = s2.user_id
          |   WHERE e.event_type = 'purchase' AND e.ts > s2.t
          |    AND e.ts <= s2.t + INTERVAL 12 HOUR GROUP BY 1)
          |SELECT 'stage1_view' AS stage, count(*) AS n_users FROM s1
          |UNION ALL SELECT 'stage2_click', count(*) FROM s2
          |UNION ALL SELECT 'stage3_purchase', count(*) FROM s3""".stripMargin,

      "q73_retention" ->
        """WITH f AS (SELECT user_id,
          |   date_trunc('week', min(ts))::TIMESTAMP AS cohort_week
          |  FROM events GROUP BY 1),
          |a AS (SELECT DISTINCT user_id, date_trunc('week', ts)::TIMESTAMP AS w
          |  FROM events)
          |SELECT f.cohort_week AS cohort_week,
          | CAST(date_diff('day', f.cohort_week::DATE, a.w::DATE) // 7 AS BIGINT)
          |   AS week_offset,
          | count(DISTINCT a.user_id) AS n_users
          |FROM a JOIN f ON a.user_id = f.user_id GROUP BY 1, 2""".stripMargin,

      "q83_conversion_lag" ->
        """WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
          |   WHERE event_type = 'view' GROUP BY 1),
          |p AS (SELECT e.user_id, min(e.ts) AS t_purch, min(v.t_view) AS t_v
          |   FROM events e JOIN v ON e.user_id = v.user_id
          |   WHERE e.event_type = 'purchase' AND e.ts > v.t_view GROUP BY 1),
          |d AS (SELECT (epoch_us(t_purch::TIMESTAMP) - epoch_us(t_v::TIMESTAMP))
          |   / 60000000.0 AS mins FROM p)
          |SELECT count(*) AS n_converted,
          | round(quantile_cont(mins, 0.5), 4) AS p50_mins,
          | round(quantile_cont(mins, 0.9), 4) AS p90_mins
          |FROM d""".stripMargin,

      "q84_latest_event" ->
        """SELECT user_id, ts AS last_ts, event_id AS last_event_id,
          | event_type AS last_type, value AS last_value
          |FROM events
          |QUALIFY row_number() OVER (PARTITION BY user_id
          |  ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

      "q146_retention_sweep" ->
        s"""WITH q AS (
           |$nbQualitySql
           |),
           |l AS (SELECT CAST(round(q.quality_w * 10000) AS BIGINT) AS w4, d.n_chars
           |  FROM q JOIN documents d USING (doc_id)),
           |b AS (SELECT CASE WHEN w4 < -10000 THEN CAST(-1 AS BIGINT)
           |         ELSE least((w4 + 10000) // 1000, 20) END AS bin,
           |   CAST(count(*) AS BIGINT) AS nd, CAST(sum(n_chars) AS BIGINT) AS nc
           |  FROM l GROUP BY 1),
           |t AS (SELECT CAST(sum(nd) AS BIGINT) AS td, CAST(sum(nc) AS BIGINT) AS tc FROM b),
           |i AS (SELECT CAST(unnest(range(0, 21)) AS BIGINT) AS ti)
           |SELECT (ti * 1000 - 10000) / 10000.0 AS threshold,
           | CAST(coalesce(sum(b.nd), 0) AS BIGINT) AS docs_kept,
           | CAST(coalesce(sum(b.nc), 0) AS BIGINT) AS chars_kept,
           | round(CAST(coalesce(sum(b.nd), 0) AS DOUBLE) / t.td, 6) AS frac_docs,
           | round(CAST(coalesce(sum(b.nc), 0) AS DOUBLE) / t.tc, 6) AS frac_chars
           |FROM i LEFT JOIN b ON b.bin >= i.ti, t
           |GROUP BY ti, t.td, t.tc""".stripMargin,

      "q177_rate_anomaly" ->
        """WITH hourly AS (SELECT event_type, date_trunc('hour', ts::TIMESTAMP) AS h,
          |   CAST(count(*) AS BIGINT) AS n,
          |   epoch_us(date_trunc('hour', ts::TIMESTAMP)) // 3600000000 AS hr
          |  FROM events GROUP BY 1, 2),
          |w AS (SELECT event_type, h, n,
          |   count(n) OVER tw AS k, sum(n) OVER tw AS s1, sum(n * n) OVER tw AS s2
          |  FROM hourly
          |  WINDOW tw AS (PARTITION BY event_type ORDER BY hr
          |    RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)),
          |z AS (SELECT event_type, h, n, k,
          |   CAST(s1 AS DOUBLE) / k AS mean,
          |   CASE WHEN k >= 12 AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k)
          |          / (k - 1) > 0
          |        THEN round((n - CAST(s1 AS DOUBLE) / k) /
          |          sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1)), 4)
          |        END AS z
          |  FROM w)
          |SELECT event_type, h, n,
          | CASE WHEN k >= 1 THEN round(mean, 4) END AS mean_24h, z,
          | coalesce(abs(z) > 3.0, false) AS anomaly
          |FROM z""".stripMargin,

      "q179_burstiness" ->
        s"""WITH td AS (SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS c FROM
           |   (SELECT doc_id, unnest(string_split(lower(${cleanSql("text")}), ' ')) AS tok
           |    FROM documents)
           |  WHERE tok <> '' GROUP BY 1, 2),
           |tt AS (SELECT tok, CAST(sum(c) AS BIGINT) AS total,
           |   CAST(count(*) AS BIGINT) AS df, CAST(sum(c * c) AS BIGINT) AS s2
           |  FROM td GROUP BY tok),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
           |top AS (SELECT tok, total, df, s2,
           |   row_number() OVER (ORDER BY total DESC, tok ASC) AS rn
           |  FROM tt QUALIFY rn <= 20)
           |SELECT tok, total, df,
           | round(((CAST(s2 AS DOUBLE) - CAST(total AS DOUBLE) * total / n) / (n - 1))
           |   / (CAST(total AS DOUBLE) / n), 4) AS vmr,
           | ((CAST(s2 AS DOUBLE) - CAST(total AS DOUBLE) * total / n) / (n - 1))
           |   / (CAST(total AS DOUBLE) / n) > 1.5 AS bursty
           |FROM top, nn""".stripMargin,

      "q185_bot_profile" ->
        """WITH ev AS (SELECT user_id, event_type,
          |   (epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP))
          |     OVER (PARTITION BY user_id ORDER BY ts, event_id)) / 1e6 AS gap
          |  FROM events),
          |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS k,
          |   sum(gap) AS s1, sum(gap * gap) AS s2
          |  FROM ev WHERE gap IS NOT NULL GROUP BY user_id),
          |tc AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
          |  FROM ev GROUP BY 1, 2),
          |e AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_types,
          |   CAST(sum(c) AS BIGINT) AS n_events,
          |   sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clnc
          |  FROM tc GROUP BY user_id),
          |p AS (SELECT e.user_id, e.n_events, e.n_types,
          |   round(ln(CAST(e.n_events AS DOUBLE)) - e.clnc / e.n_events, 4)
          |     AS type_entropy,
          |   CASE WHEN g.k >= 2 AND g.s1 / g.k > 0
          |        THEN round(sqrt((g.s2 - g.s1 * g.s1 / g.k) / (g.k - 1))
          |          / (g.s1 / g.k), 4) END AS gap_cv
          |  FROM e JOIN g USING (user_id) WHERE e.n_events >= 5)
          |SELECT user_id, n_events, n_types, type_entropy, gap_cv,
          | (type_entropy < 0.5 OR coalesce(gap_cv < 0.1, false)) AS bot_like
          |FROM p""".stripMargin,

      "q186_funnel" ->
        """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
          |  WHERE event_type = 'view' GROUP BY user_id),
          |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
          |  JOIN v USING (user_id)
          |  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
          |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
          |  JOIN c USING (user_id)
          |  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id),
          |n AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS nv,
          |  (SELECT CAST(count(*) AS BIGINT) FROM c) AS nc,
          |  (SELECT CAST(count(*) AS BIGINT) FROM p) AS np)
          |SELECT '1_view' AS step, nv AS n_users, 1.0 AS conv_from_prev,
          |  1.0 AS conv_from_top FROM n
          |UNION ALL SELECT '2_click', nc,
          |  round(CAST(nc AS DOUBLE) / nv, 4), round(CAST(nc AS DOUBLE) / nv, 4)
          |FROM n
          |UNION ALL SELECT '3_purchase', np,
          |  round(CAST(np AS DOUBLE) / nc, 4), round(CAST(np AS DOUBLE) / nv, 4)
          |FROM n""".stripMargin,

      "q187_cohort_retention" ->
        """WITH ev AS (SELECT user_id,
          |   CAST(date_trunc('week', ts::TIMESTAMP) AS DATE) AS wk FROM events),
          |f AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id),
          |a AS (SELECT DISTINCT ev.user_id, f.cohort_wk,
          |   CAST(date_diff('day', f.cohort_wk, ev.wk) // 7 AS BIGINT)
          |     AS week_offset
          |  FROM ev JOIN f USING (user_id)),
          |s AS (SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_size
          |  FROM f GROUP BY cohort_wk)
          |SELECT a.cohort_wk, a.week_offset,
          | CAST(count(*) AS BIGINT) AS n_active, s.cohort_size,
          | round(CAST(count(*) AS DOUBLE) / s.cohort_size, 4) AS retention
          |FROM a JOIN s USING (cohort_wk)
          |GROUP BY a.cohort_wk, a.week_offset, s.cohort_size""".stripMargin,

      "q188_event_concentration" ->
        """WITH cnt AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
          |  FROM events GROUP BY user_id),
          |d AS (SELECT cnt, CAST(ntile(10) OVER (ORDER BY cnt, user_id) AS BIGINT)
          |   AS decile FROM cnt),
          |b AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
          |   CAST(sum(cnt) AS BIGINT) AS n_events FROM d GROUP BY decile),
          |t AS (SELECT CAST(sum(n_events) AS BIGINT) AS tot FROM b),
          |c AS (SELECT b1.decile, CAST(sum(b2.n_events) AS BIGINT) AS cum_events
          |  FROM b b1 JOIN b b2 ON b2.decile <= b1.decile GROUP BY b1.decile)
          |SELECT b.decile, b.n_users, b.n_events,
          | round(CAST(b.n_events AS DOUBLE) / t.tot, 4) AS share,
          | round(CAST(c.cum_events AS DOUBLE) / t.tot, 4) AS cum_share
          |FROM b JOIN c USING (decile) CROSS JOIN t""".stripMargin,

      "q191_post_incident" ->
        """WITH ev AS (SELECT user_id, event_type, event_id,
          |   epoch_us(ts::TIMESTAMP) AS us,
          |   max(CASE WHEN event_type = 'error' THEN epoch_us(ts::TIMESTAMP) END)
          |     OVER (PARTITION BY user_id ORDER BY ts, event_id
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          |     AS last_err
          |  FROM events)
          |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
          | CAST(count(last_err) AS BIGINT) AS n_after_error,
          | CAST(sum(CASE WHEN (us - last_err) / 1e6 <= 60.0 THEN 1 ELSE 0 END)
          |   AS BIGINT) AS n_within_60s,
          | round(CAST(sum(CASE WHEN (us - last_err) / 1e6 <= 60.0 THEN 1 ELSE 0
          |   END) AS DOUBLE) / count(*), 4) AS contamination_rate
          |FROM ev WHERE event_type <> 'error' GROUP BY event_type""".stripMargin,

      "q194_daily_trend" ->
        """WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events),
          |daily AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS c
          |  FROM ev GROUP BY 1, 2),
          |b AS (SELECT min(day) AS d0,
          |   CAST(date_diff('day', min(day), max(day)) + 1 AS BIGINT) AS nd
          |  FROM ev),
          |days AS (SELECT b.nd, CAST(x.x AS BIGINT) AS x,
          |   b.d0 + CAST(x.x AS INT) AS day
          |  FROM b, (SELECT unnest(range(0, (SELECT nd FROM b))) AS x) x),
          |sc AS (SELECT t.event_type, d.nd, d.x, d.day
          |  FROM days d CROSS JOIN (SELECT DISTINCT event_type FROM ev) t),
          |s AS (SELECT sc.event_type, sc.nd, sc.x,
          |   coalesce(daily.c, 0) AS y
          |  FROM sc LEFT JOIN daily
          |    ON daily.event_type = sc.event_type AND daily.day = sc.day),
          |agg AS (SELECT event_type, nd,
          |   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
          |   CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
          |   CAST(sum(y * y) AS BIGINT) AS syy
          |  FROM s GROUP BY 1, 2)
          |SELECT event_type, nd AS n_days, sy AS n_events,
          | round(CAST(nd * sxy - sx * sy AS DOUBLE) / (nd * sxx - sx * sx), 6)
          |   AS slope,
          | round(CAST(sy * sxx - sx * sxy AS DOUBLE) / (nd * sxx - sx * sx), 6)
          |   AS intercept,
          | CASE WHEN nd * syy - sy * sy > 0 THEN
          |   round(CAST((nd * sxy - sx * sy) * (nd * sxy - sx * sy) AS DOUBLE)
          |     / (CAST(nd * sxx - sx * sx AS DOUBLE) * (nd * syy - sy * sy)), 6)
          |   END AS r2
          |FROM agg""".stripMargin,

      "q199_session_conversion" ->
        """WITH o AS (SELECT user_id, event_id, ts, event_type,
          |   epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP))
          |     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          |  FROM events),
          |m AS (SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 1800000000
          |   THEN 1 ELSE 0 END AS new_sess FROM o),
          |sn AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
          |   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_no
          |  FROM m),
          |sess AS (SELECT user_id, session_no,
          |   CAST(count(*) AS BIGINT) AS n_events,
          |   CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          |     AS BIGINT) AS converted
          |  FROM sn GROUP BY 1, 2)
          |SELECT CASE WHEN n_events = 1 THEN '1'
          |  WHEN n_events <= 4 THEN '2-4'
          |  WHEN n_events <= 9 THEN '5-9' ELSE '10+' END AS size_bucket,
          | CAST(count(*) AS BIGINT) AS n_sessions,
          | CAST(sum(converted) AS BIGINT) AS n_converted,
          | round(CAST(sum(converted) AS DOUBLE) / count(*), 4) AS conv_rate
          |FROM sess GROUP BY 1""".stripMargin,

      "q211_stickiness" ->
        """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day,
          |   CAST(date_trunc('month', ts::TIMESTAMP) AS DATE) AS month
          |  FROM events),
          |dau AS (SELECT month, day, CAST(count(*) AS BIGINT) AS dau FROM
          |  (SELECT DISTINCT user_id, day, month FROM ev) GROUP BY 1, 2),
          |mau AS (SELECT month, CAST(count(*) AS BIGINT) AS mau FROM
          |  (SELECT DISTINCT user_id, month FROM ev) GROUP BY month),
          |dm AS (SELECT month, CAST(count(*) AS BIGINT) AS n_days,
          |   CAST(sum(dau) AS BIGINT) AS sdau FROM dau GROUP BY month)
          |SELECT dm.month, dm.n_days,
          | round(CAST(dm.sdau AS DOUBLE) / dm.n_days, 4) AS avg_dau, mau.mau,
          | round(CAST(dm.sdau AS DOUBLE) / (dm.n_days * mau.mau), 4)
          |   AS stickiness
          |FROM dm JOIN mau USING (month)""".stripMargin,

      "q236_engagement_revenue" ->
        """WITH ev AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
          |  FROM events GROUP BY user_id),
          |d AS (SELECT user_id, n_events,
          |   CAST(ntile(10) OVER (ORDER BY n_events ASC, user_id ASC)
          |     AS BIGINT) AS decile
          |  FROM ev),
          |rev AS (SELECT o_custkey,
          |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          |     AS cents
          |  FROM orders GROUP BY 1),
          |j AS (SELECT d.decile, d.n_events,
          |   coalesce(rev.cents, 0) AS cents
          |  FROM d LEFT JOIN rev ON rev.o_custkey = d.user_id)
          |SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
          | CAST(sum(n_events) AS BIGINT) AS n_events,
          | CAST(sum(CASE WHEN cents > 0 THEN 1 ELSE 0 END) AS BIGINT)
          |   AS n_buyers,
          | round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS revenue,
          | round(CAST(sum(cents) AS DOUBLE) / count(*) / 100.0, 4)
          |   AS revenue_per_user
          |FROM j GROUP BY decile""".stripMargin,

      "q237_funnel_latency" ->
        """WITH ev AS (SELECT user_id, event_type,
          |   CAST(floor(epoch(ts)) AS BIGINT) AS e FROM events),
          |v AS (SELECT user_id, min(e) AS tv FROM ev
          |  WHERE event_type = 'view' GROUP BY 1),
          |p AS (SELECT ev.user_id, min(ev.e) AS tp, min(v.tv) AS tv0
          |  FROM ev JOIN v ON v.user_id = ev.user_id AND ev.e > v.tv
          |  WHERE ev.event_type = 'purchase' GROUP BY 1),
          |l AS (SELECT tp - tv0 AS lat_s FROM p)
          |SELECT CAST(count(*) AS BIGINT) AS n_converted,
          | round(avg(lat_s), 4) AS mean_s,
          | round(quantile_cont(lat_s, 0.5), 4) AS p50_s,
          | round(quantile_cont(lat_s, 0.9), 4) AS p90_s
          |FROM l""".stripMargin,

      "q238_dwell_time" ->
        """WITH ev AS (SELECT user_id, event_id, event_type,
          |   CAST(floor(epoch(ts)) AS BIGINT) AS e FROM events),
          |g AS (SELECT event_type,
          |   lead(e, 1) OVER (PARTITION BY user_id ORDER BY e, event_id)
          |     - e AS gap
          |  FROM ev),
          |d AS (SELECT event_type, gap FROM g
          |  WHERE gap IS NOT NULL AND gap <= 1800)
          |SELECT event_type, CAST(count(*) AS BIGINT) AS n_dwells,
          | round(avg(gap), 4) AS mean_s,
          | round(quantile_cont(gap, 0.5), 4) AS p50_s,
          | round(quantile_cont(gap, 0.9), 4) AS p90_s
          |FROM d GROUP BY event_type""".stripMargin,

      "q242_rolling_active_users" ->
        """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
          |  FROM events),
          |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud),
          |s AS (SELECT b.d0 + CAST(x.x AS INT) AS day
          |  FROM b, (SELECT unnest(range(0,
          |    (SELECT date_diff('day', d0, d1) FROM b) + 1)) AS x) x),
          |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
          |  FROM ud GROUP BY day),
          |t AS (SELECT DISTINCT user_id, day + CAST(o.o AS INT) AS day
          |  FROM ud, (SELECT unnest(range(0, 7)) AS o) o),
          |wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau
          |  FROM t GROUP BY day)
          |SELECT s.day, coalesce(dau.dau, 0) AS dau,
          | coalesce(wau.wau, 0) AS wau,
          | CASE WHEN coalesce(wau.wau, 0) > 0 THEN
          |   round(CAST(coalesce(dau.dau, 0) AS DOUBLE) / wau.wau, 4) END
          |   AS stickiness
          |FROM s LEFT JOIN dau ON dau.day = s.day
          |LEFT JOIN wau ON wau.day = s.day""".stripMargin,

      "q251_growth_accounting" ->
        """WITH uw AS (SELECT DISTINCT user_id,
          |   CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          |     AS BIGINT) AS dy FROM events),
          |fw AS (SELECT user_id, min(dy) AS fdy FROM uw GROUP BY user_id),
          |act AS (SELECT dy, CAST(count(*) AS BIGINT) AS active
          |  FROM uw GROUP BY dy),
          |nw AS (SELECT fdy AS dy, CAST(count(*) AS BIGINT) AS new_users
          |  FROM fw GROUP BY fdy),
          |ret AS (SELECT cur.dy, CAST(count(*) AS BIGINT) AS retained
          |  FROM uw cur JOIN uw prv
          |   ON prv.user_id = cur.user_id AND prv.dy + 1 = cur.dy
          |  GROUP BY cur.dy),
          |b AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM uw),
          |s AS (SELECT CAST(x.x AS BIGINT) + b.d0 AS dy FROM b,
          |  (SELECT unnest(range(0, (SELECT d1 - d0 FROM b) + 1)) AS x) x),
          |j AS (SELECT s.dy,
          |   coalesce(act.active, 0) AS active,
          |   coalesce(nw.new_users, 0) AS new_users,
          |   coalesce(ret.retained, 0) AS retained,
          |   coalesce(act.active, 0) - coalesce(nw.new_users, 0)
          |     - coalesce(ret.retained, 0) AS resurrected,
          |   coalesce(pa.active, 0) - coalesce(ret.retained, 0) AS churned
          |  FROM s LEFT JOIN act ON act.dy = s.dy
          |  LEFT JOIN nw ON nw.dy = s.dy
          |  LEFT JOIN ret ON ret.dy = s.dy
          |  LEFT JOIN (SELECT dy + 1 AS dy, active FROM act) pa
          |    ON pa.dy = s.dy)
          |SELECT DATE '1970-01-01' + CAST(dy AS INT) AS day,
          | active, new_users, retained, resurrected, churned,
          | CASE WHEN churned > 0 THEN
          |   round(CAST(new_users + resurrected AS DOUBLE) / churned, 4) END
          |   AS quick_ratio
          |FROM j""".stripMargin,

      "q254_latency_histogram" ->
        """WITH ev AS (SELECT user_id, event_id, event_type,
          |   CAST(floor(epoch(ts)) AS BIGINT) AS e FROM events),
          |g AS (SELECT event_type,
          |   lead(e, 1) OVER (PARTITION BY user_id ORDER BY e, event_id)
          |     - e AS gap FROM ev),
          |d AS (SELECT event_type, gap FROM g
          |  WHERE gap IS NOT NULL AND gap >= 1 AND gap <= 1800),
          |b AS (SELECT event_type,
          |   CAST(len(bin(gap)) - 1 AS BIGINT) AS bucket,
          |   CAST(count(*) AS BIGINT) AS n_gaps
          |  FROM d GROUP BY 1, 2),
          |t AS (SELECT event_type, CAST(sum(n_gaps) AS BIGINT) AS n_type
          |  FROM b GROUP BY event_type)
          |SELECT b.event_type, b.bucket,
          | CAST(power(2, b.bucket) AS BIGINT) AS lo_s,
          | CAST(power(2, b.bucket + 1) AS BIGINT) - 1 AS hi_s,
          | b.n_gaps,
          | round(CAST(b.n_gaps AS DOUBLE) / t.n_type, 4) AS share
          |FROM b JOIN t ON b.event_type = t.event_type""".stripMargin,

      "q256_cohort_ltv" ->
        """WITH ev AS (SELECT user_id,
          |   CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          |     AS BIGINT) AS dy, event_type,
          |   CAST(round(value * 100) AS BIGINT) AS cents FROM events),
          |co AS (SELECT user_id, min(dy) AS cd FROM ev GROUP BY user_id),
          |sz AS (SELECT cd, CAST(count(*) AS BIGINT) AS cohort_size
          |  FROM co GROUP BY cd),
          |rev AS (SELECT co.cd, ev.dy - co.cd AS age_days,
          |   CAST(sum(ev.cents) AS BIGINT) AS rc
          |  FROM ev JOIN co ON ev.user_id = co.user_id
          |  WHERE ev.event_type = 'purchase' GROUP BY 1, 2),
          |cum AS (SELECT cd, age_days, rc,
          |   CAST(sum(rc) OVER (PARTITION BY cd ORDER BY age_days
          |     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM rev)
          |SELECT DATE '1970-01-01' + CAST(cum.cd AS INT) AS cohort_day,
          | sz.cohort_size, cum.age_days,
          | round(CAST(cum.rc AS DOUBLE) / 100.0, 2) AS revenue,
          | CAST((cum.cum * 100) // sz.cohort_size AS DOUBLE) / 10000.0
          |   AS cum_ltv_per_user
          |FROM cum JOIN sz ON sz.cd = cum.cd""".stripMargin,

      "q279_attribution" ->
        """WITH ev AS (SELECT user_id, event_id, ts, event_type,
          |   CAST(round(value * 100) AS BIGINT) AS cents,
          |   epoch_us(ts) - lag(epoch_us(ts)) OVER
          |     (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          |  FROM events),
          |sn AS (SELECT *, CAST(sum(CASE WHEN gap_us IS NULL
          |     OR gap_us > 1800 * 1000000 THEN 1 ELSE 0 END) OVER
          |    (PARTITION BY user_id ORDER BY ts, event_id
          |     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
          |  FROM ev),
          |rows_ AS (SELECT user_id, session_no,
          |   CAST(row_number() OVER (PARTITION BY user_id, session_no
          |     ORDER BY ts, event_id) AS BIGINT) AS rn,
          |   event_type, cents FROM sn),
          |sess AS (SELECT user_id, session_no,
          |   CAST(sum(CASE WHEN event_type = 'purchase' THEN cents
          |     ELSE 0 END) AS BIGINT) AS rev,
          |   min(CASE WHEN event_type = 'purchase' THEN rn END) AS fprn,
          |   max(CASE WHEN rn = 1 THEN event_type END) AS first_type
          |  FROM rows_ GROUP BY 1, 2 HAVING rev > 0),
          |lt AS (SELECT r.user_id, r.session_no,
          |   arg_max(r.event_type, r.rn) AS last_type
          |  FROM rows_ r JOIN sess s USING (user_id, session_no)
          |  WHERE r.rn < s.fprn AND r.event_type <> 'purchase'
          |  GROUP BY 1, 2),
          |att AS (SELECT sess.user_id, sess.session_no, sess.rev,
          |   sess.first_type, coalesce(lt.last_type, 'direct') AS last_type
          |  FROM sess LEFT JOIN lt USING (user_id, session_no)),
          |ft AS (SELECT first_type AS channel,
          |   CAST(count(*) AS BIGINT) AS sessions_first,
          |   CAST(sum(rev) AS BIGINT) AS rf FROM att GROUP BY 1),
          |l2 AS (SELECT last_type AS channel,
          |   CAST(count(*) AS BIGINT) AS sessions_last,
          |   CAST(sum(rev) AS BIGINT) AS rl FROM att GROUP BY 1)
          |SELECT coalesce(ft.channel, l2.channel) AS channel,
          | CAST(coalesce(ft.sessions_first, 0) AS BIGINT) AS sessions_first,
          | round(CAST(coalesce(ft.rf, 0) AS DOUBLE) / 100.0, 2)
          |   AS first_touch_revenue,
          | CAST(coalesce(l2.sessions_last, 0) AS BIGINT) AS sessions_last,
          | round(CAST(coalesce(l2.rl, 0) AS DOUBLE) / 100.0, 2)
          |   AS last_touch_revenue
          |FROM ft FULL OUTER JOIN l2 ON ft.channel = l2.channel"""
          .stripMargin,

      "q283_peak_concurrency" ->
        """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
          |   epoch_us(ts) - lag(epoch_us(ts)) OVER
          |     (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          |  FROM events),
          |sn AS (SELECT *, CAST(sum(CASE WHEN gap_us IS NULL
          |     OR gap_us > 1800 * 1000000 THEN 1 ELSE 0 END) OVER
          |    (PARTITION BY user_id ORDER BY us, event_id
          |     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
          |  FROM ev),
          |sess AS (SELECT user_id, session_no,
          |   CAST(min(us) AS BIGINT) AS s_us, CAST(max(us) AS BIGINT) AS e_us
          |  FROM sn GROUP BY 1, 2),
          |deltas AS (SELECT us, CAST(sum(d) AS BIGINT) AS d FROM (
          |   SELECT s_us AS us, 1 AS d FROM sess
          |   UNION ALL SELECT e_us + 1, -1 FROM sess) GROUP BY 1),
          |lvl AS (SELECT us, CAST(sum(d) OVER (ORDER BY us
          |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc FROM deltas),
          |pk AS (SELECT us // 86400000000 AS ed,
          |   CAST(max(conc) AS BIGINT) AS peak_concurrency
          |  FROM lvl GROUP BY 1),
          |st AS (SELECT s_us // 86400000000 AS ed,
          |   CAST(count(*) AS BIGINT) AS sessions_started
          |  FROM sess GROUP BY 1)
          |SELECT coalesce(pk.ed, st.ed) AS ed,
          | CAST(coalesce(pk.peak_concurrency, 0) AS BIGINT)
          |   AS peak_concurrency,
          | CAST(coalesce(st.sessions_started, 0) AS BIGINT)
          |   AS sessions_started
          |FROM pk FULL OUTER JOIN st ON pk.ed = st.ed""".stripMargin,

      "q293_segment_migration" ->
        """WITH li AS (SELECT o_custkey,
          |   CAST(round(o_totalprice * 100) AS BIGINT) AS c,
          |   CAST(date_diff('day', DATE '1970-01-01', o_orderdate)
          |     AS BIGINT) AS ed FROM orders),
          |b AS (SELECT (min(ed) + max(ed)) // 2 AS cut FROM li),
          |q0 AS (SELECT o_custkey, CAST(ntile(5) OVER (ORDER BY v, o_custkey)
          |   AS BIGINT) AS q_early FROM (
          |   SELECT o_custkey, CAST(sum(c) AS BIGINT) AS v FROM li, b
          |   WHERE ed <= b.cut GROUP BY 1)),
          |q1 AS (SELECT o_custkey, CAST(ntile(5) OVER (ORDER BY v, o_custkey)
          |   AS BIGINT) AS q_late FROM (
          |   SELECT o_custkey, CAST(sum(c) AS BIGINT) AS v FROM li, b
          |   WHERE ed > b.cut GROUP BY 1)),
          |cells AS (SELECT coalesce(q0.q_early, 0) AS q_early,
          |   coalesce(q1.q_late, 0) AS q_late,
          |   CAST(count(*) AS BIGINT) AS n_customers
          |  FROM q0 FULL OUTER JOIN q1 USING (o_custkey)
          |  GROUP BY 1, 2),
          |rows_ AS (SELECT q_early, CAST(sum(n_customers) AS BIGINT) AS r
          |  FROM cells GROUP BY 1)
          |SELECT c.q_early, c.q_late, c.n_customers,
          | round(CAST(c.n_customers AS DOUBLE) / r.r, 4) AS row_share
          |FROM cells c JOIN rows_ r ON c.q_early = r.q_early""".stripMargin,

      // stream-static join twin: a stateless broadcast join is batch-
      // membership-invariant, so the streamed rollup is the plain batch
      // join — cents discipline keeps the sum order-proof
      "q349_stream_static_enrich" ->
        """SELECT coalesce(c.c_mktsegment, '(none)') AS segment,
          | e.event_type, CAST(count(*) AS BIGINT) AS n_events,
          | round(CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS DOUBLE)
          |   / 100.0, 2) AS sum_value
          |FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
          |GROUP BY 1, 2""".stripMargin,

      "q302_stream_window" ->
        """SELECT date_trunc('hour', ts) AS win_start, event_type,
          | CAST(count(*) AS BIGINT) AS n,
          | round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
          |   / 100.0, 2) AS sum_value
          |FROM events
          |GROUP BY 1, 2""".stripMargin,

      // Spark session_window boundary semantics, mirrored exactly: an event
      // at ts >= prev + gap opens a NEW session (the window is end-
      // exclusive), and append mode materializes exactly the sessions whose
      // end (last event + gap) the final watermark (= max corpus ts, delay
      // 0) has passed.
      "q305_stream_sessions" ->
        """WITH o AS (SELECT user_id, event_id, ts,
          |    CAST(round(value * 100) AS BIGINT) AS cents,
          |    epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP))
          |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          |  FROM events),
          |s AS (SELECT user_id, ts, cents,
          |    CASE WHEN gap_us IS NULL OR gap_us >= 1800000000 THEN 1 ELSE 0 END AS new_sess
          |  FROM o),
          |c AS (SELECT user_id, ts, cents,
          |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
          |  FROM s),
          |g AS (SELECT user_id, session_no, min(ts) AS sess_start,
          |    max(ts) AS last_ts, CAST(count(*) AS BIGINT) AS n_events,
          |    CAST(sum(cents) AS BIGINT) AS cents
          |  FROM c GROUP BY 1, 2),
          |wm AS (SELECT max(ts) AS mx FROM events)
          |SELECT user_id, sess_start, n_events,
          | round(CAST(cents AS DOUBLE) / 100.0, 2) AS sess_value
          |FROM g, wm
          |WHERE last_ts + INTERVAL 30 MINUTE <= wm.mx""".stripMargin,

      // q305's sessionization CTE in epoch-ms form; eviction is STRICT
      // (GroupState event-time timeouts fire on watermark > timeoutTs,
      // unlike session_window's append emission at watermark >= end)
      "q322_stream_closed_sessions" ->
        """WITH o AS (SELECT user_id,
          |    CAST(round(value * 100) AS BIGINT) AS cents,
          |    epoch_ms(ts::TIMESTAMP) AS ms,
          |    epoch_ms(ts::TIMESTAMP) - lag(epoch_ms(ts::TIMESTAMP))
          |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
          |  FROM events),
          |s AS (SELECT user_id, ms, cents,
          |    CASE WHEN gap_ms IS NULL OR gap_ms >= 1800000 THEN 1 ELSE 0 END AS new_sess
          |  FROM o),
          |c AS (SELECT user_id, ms, cents,
          |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms
          |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
          |  FROM s),
          |g AS (SELECT user_id, session_no, min(ms) AS first_ts_ms,
          |    max(ms) AS last_ts_ms, CAST(count(*) AS BIGINT) AS n_events,
          |    CAST(sum(cents) AS BIGINT) AS cents
          |  FROM c GROUP BY 1, 2),
          |wm AS (SELECT max(epoch_ms(ts::TIMESTAMP)) AS mx FROM events)
          |SELECT user_id, n_events,
          | round(CAST(cents AS DOUBLE) / 100.0, 2) AS sess_value,
          | first_ts_ms, last_ts_ms
          |FROM g, wm
          |WHERE last_ts_ms + 1800000 < wm.mx""".stripMargin,

      "q306_stream_state_totals" ->
        """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
          | round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
          |   / 100.0, 2) AS sum_value
          |FROM events
          |GROUP BY 1""".stripMargin,

      "q307_stream_stream_join" ->
        """SELECT e.event_id AS error_id, e.user_id, e.ts AS error_ts,
          | p.ts AS purchase_ts, p.value AS purchase_value
          |FROM events e JOIN events p ON e.user_id = p.user_id
          |WHERE e.event_type = 'error' AND p.event_type = 'purchase'
          |  AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR""".stripMargin,

      "q314_purchase_interarrival" ->
        """WITH p AS (SELECT user_id, ts, event_id,
          |    epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP))
          |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          |  FROM events WHERE event_type = 'purchase'),
          |g AS (SELECT gap_us // 3600000000 AS gap_h,
          |   CAST(count(*) AS BIGINT) AS n_gaps
          |  FROM p WHERE gap_us IS NOT NULL GROUP BY 1),
          |t AS (SELECT CAST(sum(n_gaps) AS BIGINT) AS tt FROM g)
          |SELECT CAST(g.gap_h AS BIGINT) AS gap_h, g.n_gaps,
          | round(CAST(g.n_gaps AS DOUBLE) / t.tt, 4) AS share
          |FROM g, t""".stripMargin,

      "q325_stream_dedup_ttl" -> q325Sql,
  )

  /** q325 twin: the 4-batch dropDuplicatesWithinWatermark replay unrolled
    * as staged CTEs — one anchor-state stage per micro-batch. Anchor =
    * first-seen event time (MICROS — no TTL extension on duplicates,
    * probe-verified); wm_b = (max slice ts over batches < b)_ms − delay,
    * exactly Spark's ms-granular event-time stats. Calibrated semantics
    * (differential vs the real operator at sf0.01, 1444/1444 rows, plus
    * the Round14Spec boundary probes): state cleanup runs at the END of
    * each micro-batch with that batch's eviction watermark and removes
    * entries with expiry ≤ wm (INCLUSIVE), while arrivals are checked
    * BEFORE their own batch's cleanup — so in a back-to-back file replay
    * (no no-data batches interleave) the wm a batch-b arrival faces is
    * the PREVIOUS batch's: wmLag = 1. */
  private def q325Sql: String = q325SqlWith(wmLag = 1, cmpOp = ">=")

  /** Parameterized generator (calibration surface): `wmLag` = how many
    * batches the eviction watermark trails the arrival batch (0 = the
    * batch's own watermark, 1 = previous batch's — eviction running in
    * the prior commit), `cmpOp` = eviction comparator. The shipped
    * combination is pinned in [[q325Sql]] after differential calibration
    * against the real operator. Anchors stay in MICROS (state stores the
    * raw event time); only the WATERMARK is ms-floored (Spark collects
    * event-time stats in ms), hence the `* 1000` rescale in the test. */
  private def q325SqlWith(wmLag: Int, cmpOp: String): String = {
    val nB = 4
    def evict(b: Int) =
      s"(wm${b - wmLag} IS NOT NULL AND wm${b - wmLag} * 1000 $cmpOp a${b - 1} + delay * 1000)"
    val stages = (1 until nB).map { b =>
      s"""st$b AS (SELECT *,
         |   (o$b IS NOT NULL AND (a${b - 1} IS NULL OR ${evict(b)})) AS e$b,
         |   CASE WHEN o$b IS NULL THEN a${b - 1}
         |        WHEN a${b - 1} IS NULL OR ${evict(b)} THEN o$b
         |        ELSE a${b - 1} END AS a$b
         |  FROM st${b - 1})""".stripMargin
    }.mkString(",\n")
    val oCols = (0 until nB).map(b =>
      s"max(CASE WHEN b = $b THEN tus END) AS o$b").mkString(",\n   ")
    val wmCols = (1 - wmLag until nB).map(b =>
      if (b < 1) s"CAST(NULL AS BIGINT) AS wm$b"
      else s"(SELECT max(tms) FROM slm WHERE b < $b) - delay AS wm$b")
      .mkString(",\n   ")
    val emits = (0 until nB).map(b =>
      s"SELECT user_id, event_type, o$b AS tus FROM st${nB - 1} WHERE e$b")
      .mkString("\n UNION ALL ")
    s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
       |mm AS (SELECT min(tus) AS tmin, max(tus) AS tmax FROM ev),
       |sl AS (SELECT user_id, event_type,
       |    ((tus - tmin) * 4) // (tmax - tmin + 1) AS b, min(tus) AS tus
       |  FROM ev, mm GROUP BY 1, 2, 3),
       |slm AS (SELECT user_id, event_type, b, tus, tus // 1000 AS tms FROM sl),
       |dl AS (SELECT (tmax - tmin) // 1000 // 8 AS delay FROM mm),
       |pv AS (SELECT user_id, event_type,
       |   $oCols
       |  FROM slm GROUP BY 1, 2),
       |st0 AS (SELECT pv.*, delay,
       |   $wmCols,
       |   o0 AS a0, (o0 IS NOT NULL) AS e0
       |  FROM pv, dl),
       |$stages
       |SELECT user_id, event_type, make_timestamp(tus) AS ts FROM (
       | $emits)""".stripMargin
  }
}
