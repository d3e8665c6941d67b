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

/** Relational core: TPC-H-shaped scans/joins/aggregates/windows,
  * SQL-surface functions, and table-audit queries.
  *
  * Query/oracle pairs split out of the SparkEntry book (round 13);
  * aggregated by [[graft.SparkEntry]]. Conventions in QueryHelpers. */
private[graft] object RelationalQueries extends QueryBook {

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "q01_agg_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    "q02_filter_topn" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_quantity") >= 48 && col("l_discount") <= 0.02)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(100)
    }),

    "q03_join_geo" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_cust"),
          round(sum("c_acctbal"), 2).as("total_acctbal"),
          round(avg("c_acctbal"), 4).as("avg_acctbal"))
    }),

    "q04_join_revenue" -> ((s, dir) => {
      // Scale plan: pre-aggregate lineitem per order BEFORE the join — the
      // map-side partial agg shrinks the shuffled fact table to one row per
      // order, and n_orders becomes a plain count (each joined row is one
      // order), avoiding countDistinct's Expand duplication entirely.
      val li = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("_rev"),
          count(lit(1)).as("_n_items"))
      t(s, dir, "orders")
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          round(sum("_rev"), 2).as("revenue"),
          count(lit(1)).as("n_orders"),
          sum("_n_items").as("n_items"))
    }),

    "q05_semi_join" -> ((s, dir) => {
      val big = t(s, dir, "lineitem").where(col("l_quantity") >= 49)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === big("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    }),

    "q06_anti_join" -> ((s, dir) => {
      val o = t(s, dir, "orders").where(col("o_totalprice") > 300000)
      t(s, dir, "customer")
        .join(o, col("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    }),

    "q07_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    }),

    "q08_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
    }),

    "q16_cube" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("sum_price"))
    }),

    "q17_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 2).as("running_spend"))
    }),

    "q19_range_join" -> ((s, dir) => {
      // range join: purchases within 1h after each error, same user. The
      // equi-key (user_id) carries the shuffle; the range is a join filter.
      val ev = t(s, dir, "events")
      val err = ev.where(col("event_type") === "error")
        .select(col("event_id"), col("user_id").as("u"), col("ts").as("ets"))
      val pur = ev.where(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("pts"))
      err.join(pur,
          col("u") === col("pu") && col("pts") >= col("ets") &&
            col("pts") <= col("ets") + expr("INTERVAL 1 HOUR"), "left")
        .groupBy("event_id")
        .agg(count(col("pts")).as("n_purchases_1h"))
    }),

    "q09_pivot_status" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .na.fill(0, Seq("F", "O", "P"))
    }),

    "q10_set_intersect" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.where(col("c_acctbal") > 8000).select(col("c_nationkey").as("n")).distinct()
        .intersect(
          c.where(col("c_mktsegment") === "BUILDING").select(col("c_nationkey").as("n")).distinct())
    }),

    "q11_set_except" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.select(col("c_nationkey").as("n")).distinct()
        .except(
          c.where(col("c_acctbal") > 9900).select(col("c_nationkey").as("n")).distinct())
    }),

    "q12_date_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"))
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total_price"))
    }),

    "q13_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"), col("value"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(avg("value"), 4).as("avg_value"),
          sum("k").as("sum_k"),
          round(avg("k"), 4).as("avg_k"))
    }),

    "q14_window_hour" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    }),

    "q15_asof_join" -> ((s, dir) => {
      // as-of join composed from a single window pass: tag purchases, take
      // the running max purchase-ts per user — one shuffle, no self-join.
      val ev = t(s, dir, "events").where(col("event_type").isin("error", "purchase"))
      val w = Window.partitionBy("user_id").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("last_purchase_ts",
          max(when(col("event_type") === "purchase", col("ts"))).over(w))
        .where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts").as("error_ts"), col("last_purchase_ts"))
    }),

    "q32_media_meta" -> ((s, dir) => {
      Multimodal.decodeMeta(Multimodal.packFake(t(s, dir, "documents"))).toDF()
    }),

    "q36_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
    }),

    "q40_asof_tolerance" -> ((s, dir) => {
      // generalized as-of join operator (union + one window pass, no
      // self-join) with a 1h staleness bound on the matched payload
      val ev = t(s, dir, "events")
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.AsOfJoin.backward(errors, purchases, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", payload = Seq("value"),
          tolerance = Some(lit(3600L)))
        .select(col("event_id"), col("_asof_ts").as("purchase_ts"),
          round(col("_asof_value"), 2).as("purchase_value"))
    }),

    "q46_range_frame" -> ((s, dir) => {
      // RANGE frame over event-time seconds: trailing-1h mean per user
      val w = Window.partitionBy("user_id")
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600L * 1000000L, Window.currentRow)
      t(s, dir, "events").select(
        col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_trailing_1h"),
        round(avg("value").over(w), 4).as("avg_value_1h"))
    }),

    "q47_lead_lag_ntile" -> ((s, dir) => {
      // lag/lead ride the per-custkey window; the GLOBAL quartile goes
      // through GlobalRank (same ntile semantics, no single-partition
      // window — `ntile().over(Window.orderBy(..))` funnels every row to
      // one task, Spark's own WindowExec warning at any real scale)
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val base = t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        datediff(col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(w)).cast("long").as("days_since_prev"),
        datediff(lead(col("o_orderdate"), 1).over(w),
          col("o_orderdate")).cast("long").as("days_to_next"))
      GlobalRank.withNtile(base, 4,
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), "price_quartile")
        .select("o_custkey", "o_orderkey", "days_since_prev", "days_to_next",
          "price_quartile")
    }),

    "q48_array_agg" -> ((s, dir) => {
      // deterministic array aggregation: sorted distinct langs per source,
      // serialized (cross-engine array rendering differs; strings hash equal)
      t(s, dir, "documents").groupBy("source").agg(
        concat_ws("|", array_sort(collect_set(col("lang")))).as("langs"),
        count_distinct(col("lang")).as("n_langs"),
        count(lit(1)).as("n_docs"))
    }),

    "q45_topk_agg" -> ((s, dir) => {
      // custom bounded Aggregator: map-side top-k combine — shuffle carries
      // |Q|*k rows, not |Q|*|C| scores (same results as q30's window form)
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("id"), col("embedding").as("v"))
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      Similarity.bruteForceTopKAgg(queries, corpus, 5)
        .select(col("query_id"), col("corpus_id"),
          round(col("cos"), 6).as("cos"), col("rank").cast("long").as("rnk"))
    }),

    "q42_full_outer" -> ((s, dir) => {
      // FULL OUTER: per-nation customer stats vs supplier stats — either
      // side may be absent (coalesced key, null-safe aggregates)
      val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("ck"))
        .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("cust_bal"))
      val su = t(s, dir, "supplier").groupBy(col("s_nationkey").as("sk"))
        .agg(count(lit(1)).as("n_supp"), round(sum("s_acctbal"), 2).as("supp_bal"))
      c.join(su, col("ck") === col("sk"), "full_outer")
        .select(coalesce(col("ck"), col("sk")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"), col("cust_bal"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"), col("supp_bal"))
    }),

    "q43_edit_distance" -> ((s, dir) => {
      // character-level verify for blocked near-dup candidates: levenshtein
      // over cleaned text, same min-shingle blocking as q29
      // EXACT-DUPLICATE COLLAPSE before the DP (round 13, same move as
      // q198): levenshtein runs once per DISTINCT-TEXT candidate pair —
      // identical-text pairs are dist 0 by definition and expand through
      // slim equi-joins, so a duplicate-heavy corpus (copies² doc pairs)
      // costs only its distinct-text pair volume. Result set is the
      // pair-for-pair original. cache(), not localCheckpoint: the pin
      // carries the FULL text column (levenshtein reads it on both verify
      // sides) and columnar-compressed cache holds it 3.5x cheaper than
      // row-serialized checkpoint blocks (measured 0.6 vs 2.1 s).
      val m = t(s, dir, "documents")
        .select(col("doc_id").as("id"), TextExprs.cleanText(col("text")).as("cln"))
        .select(col("id"), col("cln"), split(col("cln"), " ").as("toks"))
        .select(col("id"), col("cln"), md5(col("cln")).as("tid"),
          array_min(Dedup.shinglesOfToks(col("toks"), 3)).as("blk"))
        .where(col("blk").isNotNull)
        .cache()
      // cached: both vx join branches read g — without the pin the distinct
      // (and the m scan under it) runs twice (measured 2×1.5 s at sf1)
      val g = m.select("blk", "tid", "cln").distinct().cache()
      val vx = g.select(col("blk"), col("tid").as("tid_a"), col("cln").as("cln_a"))
        .join(g.select(col("blk"), col("tid").as("tid_b"), col("cln").as("cln_b")),
          Seq("blk"))
        .where(col("tid_a") < col("tid_b"))
        // length-difference lower bound (|len(a)-len(b)| > k implies
        // edit_dist > k) + the banded threshold DP (O(n*k), returns -1
        // above the bound) — result set provably unchanged
        .where(abs(length(col("cln_a")) - length(col("cln_b"))) <= 40)
        .select(col("blk"), col("tid_a"), col("tid_b"),
          levenshtein(col("cln_a"), col("cln_b"), 40).as("edit_dist"))
        .where(col("edit_dist") >= 0)
      val cross = vx
        .join(m.select(col("blk"), col("tid").as("tid_a"), col("id").as("_ia")),
          Seq("blk", "tid_a"))
        .join(m.select(col("blk"), col("tid").as("tid_b"), col("id").as("_ib")),
          Seq("blk", "tid_b"))
        .select(least(col("_ia"), col("_ib")).as("id_a"),
          greatest(col("_ia"), col("_ib")).as("id_b"), col("edit_dist"))
      val same = m.as("x").join(m.as("y"),
          col("x.blk") === col("y.blk") && col("x.tid") === col("y.tid") &&
            col("x.id") < col("y.id"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
          lit(0).as("edit_dist"))
      cross.unionByName(same)
    }),

    "q18_bloom_join" -> ((s, dir) => {
      // bloom-filter join pruning: the big side is filtered by a bloom of
      // the selective side's keys BEFORE the shuffle; result identical to
      // the plain join (false positives are re-checked by the join itself)
      val hot = t(s, dir, "orders").where(col("o_totalprice") > 480000)
        .select("o_orderkey", "o_orderpriority")
      val pruned = JoinOps.bloomPrune(
        t(s, dir, "lineitem"), col("l_orderkey"), hot, "o_orderkey", fpp = 0.01)
      pruned.join(hot, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    }),

    "q49_global_ntile" -> ((s, dir) => {
      // exact global ntile WITHOUT the single-partition window collapse:
      // range-repartition + per-partition offsets (operators.GlobalRank)
      GlobalRank.withNtile(
          t(s, dir, "orders").select("o_orderkey", "o_totalprice"),
          buckets = 4,
          sortCols = Seq(col("o_totalprice").desc, col("o_orderkey").asc),
          out = "price_quartile")
        .select("o_orderkey", "price_quartile")
    }),

    "q55_col_profile" -> ((s, dir) => {
      Profiler.profile(t(s, dir, "orders"), ordersProfile)
    }),

    "q57_math_funcs" -> ((s, dir) => {
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_qty"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        round(exp(col("l_discount")), 6).as("exp_disc"),
        round(pow(col("l_quantity"), 2.0), 2).as("qty_sq"),
        round(abs(col("l_discount") - 0.05), 6).as("abs_disc_ctr"),
        floor(col("l_extendedprice") / 1000.0).cast("long").as("price_k"),
        ceil(col("l_quantity") / lit(7.0)).cast("long").as("qty_ceil7"),
        pmod(col("l_orderkey"), lit(97L)).cast("long").as("mod97"))
    }),

    "q58_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders").select(
        col("o_orderkey"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        dayofweek(col("o_orderdate")).cast("long").as("dow_sun1"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
        date_trunc("week", col("o_orderdate")).as("week_start"),
        last_day(col("o_orderdate")).cast("string").as("month_end"),
        add_months(col("o_orderdate"), 1).cast("string").as("plus_month"))
    }),

    "q59_salted_agg" -> ((s, dir) => {
      // explicit two-phase skew-safe aggregation — identical result to the
      // direct groupBy (which the oracle computes)
      JoinOps.saltedCount(t(s, dir, "lineitem"),
        Seq("l_returnflag", "l_linestatus"), nSalts = 16)
    }),

    "q60_time_range_join" -> ((s, dir) => {
      // range join WITHOUT any equi-key: interval bucketing replaces the
      // theta-join (each left row probes its own bucket + the next)
      val ev = t(s, dir, "events")
      val errs = ev.where(col("event_type") === "error")
        .select(col("event_id"), col("ts").as("ets"))
      val purch = ev.where(col("event_type") === "purchase")
        .select(col("ts").as("pts"))
      JoinOps.timeRangeJoin(errs, purch, "ets", "pts", windowUs = 3600L * 1000000L)
        .groupBy("event_id").agg(count(lit(1)).as("n_purchases_1h"))
    }),

    "q61_asof_forward" -> ((s, dir) => {
      // forward as-of: EARLIEST purchase at/after each error, ≤ 1h ahead
      val ev = t(s, dir, "events")
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      graft.operators.AsOfJoin.forward(errors, purchases, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", payload = Seq("value"),
          tolerance = Some(lit(3600L)))
        .select(col("event_id"), col("_asof_ts").as("next_purchase_ts"),
          round(col("_asof_value"), 2).as("next_purchase_value"))
    }),

    "q62_string_funcs" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("name_up"),
        substring(col("p_name"), 1, 12).as("name_12"),
        length(col("p_name")).cast("long").as("name_len"),
        lpad(col("p_brand"), 12, "#").as("brand_pad"),
        regexp_replace(col("p_type"), " ", "_").as("type_us"),
        reverse(col("p_brand")).as("brand_rev"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        element_at(split(col("p_type"), " "), 1).as("type_head"),
        instr(col("p_name"), "a").cast("long").as("a_pos"),
        expr("left(p_name, 5)").as("name_l5"),
        expr("right(p_name, 5)").as("name_r5"))
    }),

    "q63_rank_suite" -> ((s, dir) => {
      // dense_rank / percent_rank / cume_dist / first_value share ONE
      // window (single shuffle+sort); total order via the orderkey tiebreak
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders").select(
        col("o_orderpriority"), col("o_orderkey"),
        dense_rank().over(w).cast("long").as("drank"),
        round(percent_rank().over(w), 6).as("prank"),
        round(cume_dist().over(w), 6).as("cdist"),
        first(col("o_orderkey")).over(w).as("top_key"))
    }),

    "q64_gap_fill" -> ((s, dir) => {
      // time-series gap filling: per-type hourly scaffold (sequence over
      // the observed min..max hour) left-joined to the observed buckets,
      // zero-filled. The scaffold is |types|·|hours| rows — generated, not
      // shuffled from the fact table; at 100 TB the only big-data move is
      // the one groupBy of the facts.
      val hr = t(s, dir, "events").select(col("event_type"),
        date_trunc("hour", col("ts")).as("hr"), col("value"))
      val counts = hr.groupBy("event_type", "hr")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      val scaffold = hr.groupBy("event_type").agg(min("hr").as("h0"), max("hr").as("h1"))
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hr"))
      scaffold.join(counts, Seq("event_type", "hr"), "left")
        .select(col("event_type"), col("hr"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
    }),

    "q66_regexp" -> ((s, dir) => {
      // regexp scalar surface; patterns restricted to the RE2∩Java common
      // dialect so the DuckDB twin matches byte-for-byte
      t(s, dir, "documents").select(
        col("doc_id"),
        regexp_extract(col("text"), "\\b(s[a-z]+)\\b", 1).as("first_s_word"),
        size(regexp_extract_all(col("text"), lit("\\b(scan|sort|stream)\\b"), lit(1)))
          .cast("long").as("n_scan_like"),
        regexp_replace(substring(col("text"), 1, 40), "[aeiou]", "*").as("masked_head"))
    }),

    "q69_band_join" -> ((s, dir) => {
      // custom physical operator (plans.RangeJoin): orders priced into
      // OVERLAPPING price bands — no equi-key, so stock Spark would plan a
      // BroadcastNestedLoopJoin; BroadcastRangeJoinExec probes a sorted
      // broadcast band index by binary search instead
      val bands = s.range(0, 48).select(col("id").as("band_id"),
        (col("id") * 12500.0).as("lo"), (col("id") * 12500.0 + 25000.0).as("hi"))
      graft.plans.RangeJoinOps.rangeJoin(
          t(s, dir, "orders").select("o_orderkey", "o_totalprice"), bands,
          point = col("o_totalprice"), lo = col("lo"), hi = col("hi"))
        .groupBy("band_id")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
    }),

    "q68_cond_funcs" -> ((s, dir) => {
      // conditional/null scalar surface; operands are existing exact values
      // (no float arithmetic) so both engines bit-match
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        greatest(col("l_quantity"), lit(30.0)).as("qty_floor30"),
        least(col("l_extendedprice"), lit(10000.0)).as("price_cap10k"),
        coalesce(nullif(col("l_tax"), lit(0.0)), lit(-1.0)).as("tax_or_neg"),
        when(col("l_quantity") > 25, "H").when(col("l_quantity") > 10, "M")
          .otherwise("L").as("qty_band"))
    }),

    "q75_subqueries" -> ((s, dir) => {
      // the SQL surface: correlated scalar subquery + correlated EXISTS,
      // run through spark.sql — Catalyst decorrelates both into joins; the
      // oracle executes the IDENTICAL string (subquerySql), so the check is
      // pure ANSI-semantics parity
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(subquerySql)
    }),

    "q76_agg_suite" -> ((s, dir) => {
      // aggregate-function surface: conditional counts, boolean aggregates,
      // exact median, deterministic mode (ties -> lowest value).
      // Scale posture: the built-in median()/mode() aggregates are
      // TypedImperativeAggregate buffers — grouped by l_returnflag (3
      // groups), a 100 TB lineitem puts ~1/3 of the table in one task's
      // buffer. Median routes through the q91 rank dataflow
      // (Percentiles.exactByGroup) and mode through the two-pass exact
      // argmax (ExactMode); the plan carries no imperative aggregate
      // (PlanSpec-asserted: no ObjectHashAggregate / SortAggregate).
      val li = t(s, dir, "lineitem")
      val base = li.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        count_if(col("l_discount") > 0.05).as("n_disc"),
        bool_or(col("l_quantity") >= 49.0).as("any_q49"),
        bool_and(col("l_quantity") > 0.0).as("all_qpos"))
      val med = graft.operators.Percentiles.exactByGroup(li,
          col("l_returnflag"), col("l_extendedprice"), Seq(0.5), Seq("_med"))
        .select(col("group").as("l_returnflag"),
          round(col("_med"), 4).as("med_price"))
      val mode = graft.operators.ExactMode.byGroup(li,
          col("l_returnflag"), col("l_quantity"), "mode_qty")
        .withColumnRenamed("group", "l_returnflag")
      base.join(broadcast(med), "l_returnflag")
        .join(broadcast(mode), "l_returnflag")
        .select("l_returnflag", "n", "n_disc", "any_q49", "all_qpos",
          "med_price", "mode_qty")
    }),

    "q77_array_funcs" -> ((s, dir) => {
      // array scalar surface over the token arrays; every array-valued
      // result is sorted and serialized so the comparison is order-free
      // (DuckDB list_distinct does not preserve element order)
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), split(TextExprs.cleanText(col("text")), " ").as("toks"))
      toks.select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        concat_ws("|", slice(col("toks"), 1, 3)).as("first3"),
        concat_ws("|", array_sort(array_distinct(col("toks")))).as("uniq_sorted"),
        array_contains(col("toks"), "vector").as("has_vector"),
        array_position(col("toks"), "vector").cast("long").as("pos_vector"),
        array_max(col("toks")).as("max_tok"),
        aggregate(transform(col("toks"), t => length(t)), lit(0L),
          (acc, x) => acc + x).as("sum_tok_len"))
    }),

    "q108_source_overlap" -> ((s, dir) => {
      // operators.CorpusOverlap — see its scaladoc for the bounded
      // self-join scale argument; ScaleProbe's overlap mode stresses the
      // adversarial every-shingle-in-every-source case.
      graft.operators.CorpusOverlap.sourceOverlap(
        t(s, dir, "documents"), col("source"), col("text"), n = 5)
    }),

    "q111_product_quant" -> ((s, dir) => {
      // Product quantization (Jégou et al. 2011) — the 100 TB ANN
      // compression step beyond q109's SQ8: the 64-dim space splits into
      // 4 orthogonal 16-dim subspaces, each learns its own k=4 codebook
      // (operators.KMeansOp — broadcast centroid literals, one declarative
      // per-dimension-sum groupBy per iteration), and every vector is
      // stored as 4 sub-codes plus its total quantization error. The four
      // subspace passes share q78's bounded scale shape (driver state =
      // k×subdim centroids each); the code tables are one-row-per-id and
      // equi-join on vec_id — a co-partitioned shuffle join at scale.
      val e = t(s, dir, "embeddings")
      // the four subspace Lloyd chains are independent — fit them on
      // concurrent driver threads (Spark's scheduler is thread-safe; the
      // per-fit driver state is its own k×16 matrix), ~3x on wall time
      val subs = Await.result(Future.sequence((0 until 4).map { m => Future {
        graft.operators.KMeansOp.kmeans(
            e, col("vec_id"), slice(col("embedding"), m * 16 + 1, 16),
            k = 4, iters = 2)
          .select(col("id").as("vec_id"), col("cluster").as(s"code$m"),
            col("sq_dist").as(s"_e$m"))
      }}), Duration.Inf)
      subs.reduce(_.join(_, "vec_id"))
        .select(col("vec_id"), col("code0"), col("code1"), col("code2"), col("code3"),
          round(col("_e0") + col("_e1") + col("_e2") + col("_e3"), 4).as("pq_err"))
    }),

    "q136_quantile_calibrate" -> ((s, dir) => {
      // Cross-source quantile normalization — map each source's score
      // distribution onto the GLOBAL distribution (the calibration step
      // that makes one quality threshold comparable across domains: a
      // "good" web doc and a "good" code file sit at the same percentile
      // after mapping). ALL-INTEGER rank arithmetic: within-source rank r
      // of n maps to global rank 1 + ((r−1)(N−1)) DIV (n−1), so no float
      // boundary can move a doc (valid while n·N < 2^63 — ~3e9 docs; a
      // deeper corpus upgrades the product to DECIMAL(38,0), nothing else
      // changes). Scale shape: the within-source rank is a PARTITIONED
      // window (real keys, no single-partition stage); the global rank is
      // GlobalRank's range exchange; per-source sizes broadcast; the final
      // value lookup is an equi-join on the well-spread global rank.
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars"))
      val w = Window.partitionBy("source").orderBy(col("n_chars").asc, col("doc_id").asc)
      val r = d.withColumn("_r", row_number().over(w).cast("long"))
      val ns = d.groupBy("source").agg(count(lit(1)).as("_n"))
      val tot = d.agg(count(lit(1)).as("_nn"))
      val g = graft.operators.GlobalRank.withRowNumber(
          d.select(col("n_chars"), col("doc_id")),
          Seq(col("n_chars").asc, col("doc_id").asc), "_grank")
        .select(col("_grank").as("_gidx"), col("n_chars").as("cal_chars"))
      r.join(broadcast(ns), "source").crossJoin(broadcast(tot))
        .select(col("doc_id"), col("source"), col("n_chars"),
          when(col("_n") > 1,
              lit(1L) + expr("((_r - 1) * (_nn - 1)) DIV (_n - 1)"))
            .otherwise(lit(1L) + expr("(_nn - 1) DIV 2")).as("_gidx"))
        .join(g, "_gidx")
        .select(col("doc_id"), col("source"), col("n_chars"), col("cal_chars"))
    }),

    "q192_source_style" -> ((s, dir) => {
      // Stylistic similarity between sources: cosine over char-3-gram
      // count vectors. The explode collapses immediately into (source,
      // gram) counts (map-side combine; key space bounded by charset³,
      // NOT corpus size), the pairwise step is a gram-keyed equi-join of
      // the two count tables with src_a < src_b — never a crossJoin of
      // documents. Catches same-pipeline/same-template feeds whose
      // shingle overlap (q108) is zero.
      val grams = t(s, dir, "documents")
        .select(col("source"), lower(TextExprs.cleanText(col("text"))).as("t"))
        // length < 3 → zero grams; the filter also dodges sequence(1, 0),
        // which Spark evaluates as a DESCENDING [1, 0] rather than empty
        .where(length(col("t")) >= 3)
        // native char_grams (round 17): the transform/substring HOF ran
        // interpreted per element with an O(len²) substring re-walk
        .select(col("source"),
          explode(graft.plans.CharGramsExprs.charGrams(col("t"), 3)).as("gram"))
        .groupBy("source", "gram").agg(count(lit(1)).as("c"))
      val norms = grams.groupBy("source")
        .agg(sqrt(sum(col("c") * col("c")).cast("double")).as("nrm"))
      val a = grams.select(col("source").as("src_a"), col("gram"), col("c").as("ca"))
      val b = grams.select(col("source").as("src_b"), col("gram"), col("c").as("cb"))
      a.join(b, Seq("gram")).where(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(sum(col("ca") * col("cb")).cast("double").as("dot"),
          count(lit(1)).as("shared_grams"))
        .join(broadcast(norms.select(col("source").as("src_a"), col("nrm").as("na"))), "src_a")
        .join(broadcast(norms.select(col("source").as("src_b"), col("nrm").as("nb"))), "src_b")
        .select(col("src_a"), col("src_b"), col("shared_grams"),
          round(col("dot") / (col("na") * col("nb")), 6).as("cosine"))
    }),

    "q203_profit_rollup" -> ((s, dir) => {
      // TPC-H Q9-shaped 5-table profit rollup (no partsupp in the
      // fixture, so amount = extprice·(1−disc)): the multi-way join
      // planning exercise — the selective part filter broadcasts
      // (257/2000 rows), supplier and nation broadcast, and the ONLY
      // shuffle joins are lineitem⋈orders on orderkey. Map-side partial
      // agg shrinks the (nation, year) rollup before the final exchange.
      val red = broadcast(t(s, dir, "part")
        .where(col("p_name").like("%red%")).select(col("p_partkey")))
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("_amt"))
        .join(red, col("l_partkey") === col("p_partkey"))
      val sup = broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey")))
      val nat = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name")))
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("o_year"))
      li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        .agg(round(sum("_amt"), 2).as("sum_profit"),
          count(lit(1)).as("n_lineitems"))
    }),

    "q204_small_qty_revenue" -> ((s, dir) => {
      // TPC-H Q17-shaped correlated subquery, DECORRELATED: "revenue
      // lost to small orders" = lineitems under 20% of their part's
      // average quantity. The per-part average is a partial-agg shuffle
      // on partkey joined back to the fact — never a per-row subquery —
      // and the widget filter broadcast-prunes both sides first.
      // l_quantity is integer-valued, so sum(qty) is EXACT in any
      // summation order and the 0.2·avg threshold is bit-identical
      // cross-engine (one division, one multiply).
      val widgets = broadcast(t(s, dir, "part")
        .where(col("p_name").like("%widget%")).select(col("p_partkey")))
      val li = t(s, dir, "lineitem")
        .join(widgets, col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      val avgQ = li.groupBy("l_partkey")
        .agg((sum("l_quantity") / count(lit(1))).as("_aq"))
      li.join(avgQ, "l_partkey")
        .where(col("l_quantity") < lit(0.2) * col("_aq"))
        .agg(count(lit(1)).as("n_small"),
          round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
    }),

    "q205_rfm_segments" -> ((s, dir) => {
      // RFM segmentation: recency/frequency/monetary quintiles (1 =
      // best) from THREE GlobalRank.withNtile total orders — each a
      // range exchange over the users table, never a partition-less
      // ntile window. Monetary sums as EXACT integer cents
      // (round(value·100) per event) so the quintile sort key is
      // bit-identical cross-engine — a double sum's last-ulp wobble
      // could otherwise flip a boundary user's segment.
      val perUser = t(s, dir, "events")
        .groupBy("user_id")
        .agg(max(col("ts").cast("date")).as("_last"),
          count(lit(1)).as("freq"),
          sum(round(col("value") * 100).cast("long")).as("mon_cents"))
      val anchor = t(s, dir, "events")
        .agg(max(col("ts").cast("date")).as("_anchor"))
      val base = perUser.crossJoin(broadcast(anchor))
        .select(col("user_id"), datediff(col("_anchor"), col("_last"))
          .cast("long").as("rec_days"), col("freq"), col("mon_cents"))
      val G = graft.operators.GlobalRank
      val withR = G.withNtile(base, 5,
        Seq(col("rec_days").asc, col("user_id").asc), "r")
      val withF = G.withNtile(withR, 5,
        Seq(col("freq").desc, col("user_id").asc), "f")
      val withM = G.withNtile(withF, 5,
        Seq(col("mon_cents").desc, col("user_id").asc), "m")
      withM.groupBy("r", "f", "m")
        .agg(count(lit(1)).as("n_users"),
          round(sum("mon_cents").cast("double") / (lit(100.0) * count(lit(1))), 2)
            .as("avg_monetary"))
    }),

    "q206_order_backlog" -> ((s, dir) => {
      // Daily open-order backlog via the DIFFERENCE-ARRAY interval
      // trick: an order is open from o_orderdate until its last
      // shipment; instead of the day×order interval join (days · orders
      // rows), each order contributes two delta events (+1 at open, −1
      // the day after close) and the daily backlog is the prefix sum on
      // GlobalRank.withRunningSum — the scan volume is 2·|orders|
      // regardless of interval length, THE pattern for interval
      // aggregation at 100 TB.
      val close = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(max(col("l_shipdate").cast("date")).as("_close"))
      val spans = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("_open"))
        .join(close, col("o_orderkey") === col("l_orderkey"))
        // the synthetic fixture has ~20% spans whose last shipment
        // precedes the order date — clamp so every order is open for at
        // least its open day (an inverted span would corrupt the prefix)
        .select(col("_open"), greatest(col("_open"), col("_close")).as("_close"))
      val deltas = spans.select(col("_open").as("day"), lit(1L).as("d"))
        .unionAll(spans.select(date_add(col("_close"), 1).as("day"), lit(-1L).as("d")))
        .groupBy("day").agg(sum("d").as("delta"),
          sum(when(col("d") === 1L, 1L).otherwise(0L)).as("n_opened"),
          sum(when(col("d") === -1L, 1L).otherwise(0L)).as("n_closed"))
      graft.operators.GlobalRank.withRunningSum(
          deltas, Seq(col("day").asc), col("delta"), "open_orders")
        .select(col("day"), col("n_opened"), col("n_closed"), col("open_orders"))
    }),

    "q215_late_supplier" -> ((s, dir) => {
      // TPC-H Q21-shaped "who held up the order": among orders touched by
      // >= 2 suppliers where EXACTLY ONE supplier shipped late (> 60 days
      // after the order date), blame that supplier. The EXISTS / NOT
      // EXISTS pair is DECORRELATED into one (order, supplier)-grain
      // aggregate plus an order-grain rollup joined back — no per-row
      // subquery, no double self-semi/anti join over lineitem. The
      // lineitem⋈orders equi-join is the only corpus-sized shuffle;
      // supplier→nation is a broadcast hop.
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val ord = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
      val perOS = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL '60' DAY"),
          1L).otherwise(0L)).as("late"))
      val perO = perOS.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"), sum("late").as("n_late"))
      val sup = broadcast(t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")))
      val nat = broadcast(t(s, dir, "nation").select(col("n_nationkey"), col("n_name")))
      perOS.where(col("late") === 1)
        .join(perO.where(col("n_supp") >= 2 && col("n_late") === 1), "l_orderkey")
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(count(lit(1)).as("n_blame_orders"),
          countDistinct(col("l_suppkey")).as("n_suppliers_blamed"))
    }),

    "q216_custdist" -> ((s, dir) => {
      // TPC-H Q13-shaped customer-order-count distribution INCLUDING the
      // zero bucket — the left-join-then-count-child shape whose whole
      // point is that an inner join silently drops the most interesting
      // customers (the dormant ones). Orders are filtered to non-urgent
      // BEFORE the join (Q13's comment-pattern exclusion re-expressed on
      // priority); count(o_orderkey) counts the nullable right key so an
      // unmatched customer lands at 0, not dropped.
      val cust = t(s, dir, "customer").select(col("c_custkey"))
      val ord = t(s, dir, "orders")
        .where(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
    }),

    "q217_dormant_rich" -> ((s, dir) => {
      // TPC-H Q22-shaped dormant high-balance accounts: customers in a
      // fixed nation panel with an above-average balance and no order in
      // the trailing 180 days of the order history — the walked-away
      // value a win-back campaign targets. Two scalar subqueries (global
      // positive-balance average, global max order date) are tiny
      // aggregates broadcast via cross join; NOT EXISTS over recent
      // orders is a LEFT ANTI join on custkey against the date-filtered
      // orders projection. Balances live in exact integer cents and the
      // average test is cross-multiplied (cents·n > Σcents) so no float
      // boundary moves a customer between engines.
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          round(col("c_acctbal") * 100).cast("long").as("cents"))
      val thr = cust.where(col("cents") > 0)
        .agg(sum("cents").as("_sum"), count(lit(1)).as("_n"))
      val ord = t(s, dir, "orders").select(col("o_custkey"), col("o_orderdate"))
      val mx = ord.agg(max("o_orderdate").as("_mx"))
      val recent = ord.crossJoin(broadcast(mx))
        .where(col("o_orderdate") > col("_mx") - expr("INTERVAL '180' DAY"))
        .select(col("o_custkey"))
      cust.where(col("c_nationkey").isin(1, 3, 5, 7, 9))
        .crossJoin(broadcast(thr))
        .where(col("cents") * col("_n") > col("_sum"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"),
          round(sum("cents").cast("double") / 100.0, 2).as("total_balance"))
    }),

    "q220_table_stats" -> ((s, dir) => {
      // ANALYZE-style column statistics for lineitem — the cost-based
      // optimizer's input (NDV drives join-cardinality estimates, null
      // counts drive filter selectivity, min/max drive range pruning).
      // One tiny aggregate PER COLUMN unioned: each scans exactly its
      // own column (parquet column pruning makes the 11 scans read 11
      // columns' pages total, cheaper and wider-parallel than one scan
      // with 11 count-distincts expanding 11x). Numeric min/max as
      // rounded doubles; varchar columns report avg length instead;
      // the timestamp column reports epoch seconds.
      val li = t(s, dir, "lineitem")
      def statNum(c: String): DataFrame = li
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("ndv"),
          round(min(col(c)).cast("double"), 4).as("min_num"),
          round(max(col(c)).cast("double"), 4).as("max_num"),
          lit(null).cast("double").as("avg_len"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
          col("ndv"), col("min_num"), col("max_num"), col("avg_len"))
      def statStr(c: String): DataFrame = li
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("ndv"),
          lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"),
          round(avg(length(col(c))), 4).as("avg_len"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
          col("ndv"), col("min_num"), col("max_num"), col("avg_len"))
      def statTs(c: String): DataFrame = li
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("ndv"),
          round(min(unix_timestamp(col(c))).cast("double"), 4).as("min_num"),
          round(max(unix_timestamp(col(c))).cast("double"), 4).as("max_num"),
          lit(null).cast("double").as("avg_len"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
          col("ndv"), col("min_num"), col("max_num"), col("avg_len"))
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(statNum)
        .++(Seq("l_returnflag", "l_linestatus").map(statStr))
        .:+(statTs("l_shipdate"))
        .reduce(_ unionAll _)
    }),

    "q221_fk_integrity" -> ((s, dir) => {
      // Referential-integrity audit across every FK edge of the star
      // schema — the data-quality gate run before trusting joins to be
      // lossless (an inner join over an orphaned FK silently DROPS
      // facts; this query prices that risk edge by edge). Each edge is
      // one child-side key aggregate LEFT-joined to the broadcastable
      // parent key set: n_orphan_rows (child rows whose parent is
      // missing), plus parent-side coverage (share of parent keys
      // actually referenced — a low share flags dead dimension weight).
      def edge(name: String, child: DataFrame, ck: String,
          parent: DataFrame, pk: String): DataFrame = {
        val ch = child.groupBy(col(ck).as("_k")).agg(count(lit(1)).as("_c"))
        val par = parent.select(col(pk).cast("long").as("_p")).distinct()
        val j = ch.join(par, col("_k") === col("_p"), "full_outer")
        j.agg(
            sum(when(col("_k").isNotNull, col("_c")).otherwise(0L)).as("n_child_rows"),
            sum(when(col("_p").isNull, col("_c")).otherwise(0L)).as("n_orphan_rows"),
            sum(when(col("_p").isNull && col("_k").isNotNull, 1L).otherwise(0L)).as("n_orphan_keys"),
            sum(when(col("_p").isNotNull, 1L).otherwise(0L)).as("n_parent_keys"),
            sum(when(col("_p").isNotNull && col("_k").isNotNull, 1L).otherwise(0L)).as("n_parent_referenced"))
          .select(lit(name).as("fk_edge"), col("n_child_rows"), col("n_orphan_rows"),
            col("n_orphan_keys"), col("n_parent_keys"),
            round(col("n_parent_referenced").cast("double") / col("n_parent_keys"), 4)
              .as("parent_coverage"))
      }
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      Seq(
        edge("lineitem.l_orderkey->orders", li, "l_orderkey",
          ord, "o_orderkey"),
        edge("lineitem.l_partkey->part", li, "l_partkey",
          t(s, dir, "part"), "p_partkey"),
        edge("lineitem.l_suppkey->supplier", li, "l_suppkey",
          t(s, dir, "supplier"), "s_suppkey"),
        edge("orders.o_custkey->customer", ord, "o_custkey",
          t(s, dir, "customer"), "c_custkey"),
        edge("customer.c_nationkey->nation", t(s, dir, "customer"), "c_nationkey",
          t(s, dir, "nation"), "n_nationkey"))
        .reduce(_ unionAll _)
    }),

    "q225_revenue_drawdown" -> ((s, dir) => {
      // Demand-drawdown audit: daily order revenue against its running
      // historical peak — peak-to-date minus today, the standard
      // collapse/recovery diagnostic (how far below the best day ever
      // each period sits). The running maximum rides GlobalRank
      // .withRunningMax (range exchange + per-partition prefix max — the
      // same two-pass shape as the prefix sum, no single-partition
      // window, so the grain could be per-minute over years of a 100 TB
      // stream). Revenue in exact integer cents; per-year rollup reports
      // the worst drawdown and its depth share against the peak.
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val hw = graft.operators.GlobalRank.withRunningMax(
        daily, Seq(col("day").asc), col("cents"), "peak")
      hw.select(year(col("day")).as("yr"), col("cents"), col("peak"),
          (col("peak") - col("cents")).as("dd"))
        .groupBy("yr")
        .agg(count(lit(1)).as("n_days"),
          max("peak").as("peak_cents"),
          max("dd").as("max_drawdown_cents"))
        .select(col("yr"), col("n_days"), col("peak_cents"),
          col("max_drawdown_cents"),
          round(col("max_drawdown_cents").cast("double") / col("peak_cents"), 4)
            .as("max_drawdown_share"))
    }),

    "q226_join_estimate_audit" -> ((s, dir) => {
      // CBO join-cardinality audit: the EXACT join size Σₖ c_A(k)·c_B(k)
      // computed from two per-key count aggregates equi-joined key to
      // key — the join's cardinality WITHOUT materializing the join —
      // against the System-R independence estimate |A|·|B| / max(ndv_A,
      // ndv_B) every textbook optimizer (and Spark's CBO) plans with.
      // On clean FK edges the estimate is near-exact (ratio ≈ 1); on the
      // skewed m:n self-edge Cauchy–Schwarz forces Σc² ≥ n²/ndv, so the
      // ratio drops below 1 by exactly the key-skew factor — the
      // mis-estimate AQE exists to re-plan around.
      def edge(name: String, left: DataFrame, lk: String,
          right: DataFrame, rk: String): DataFrame = {
        val la = left.groupBy(col(lk).as("_k")).agg(count(lit(1)).as("_ca"))
        val ra = right.groupBy(col(rk).as("_j")).agg(count(lit(1)).as("_cb"))
        val actual = la.join(ra, col("_k") === col("_j"))
          .agg(sum(col("_ca") * col("_cb")).as("actual_rows"))
        val sa = la.agg(sum("_ca").as("n_left"), count(lit(1)).as("ndv_left"))
        val sb = ra.agg(sum("_cb").as("n_right"), count(lit(1)).as("ndv_right"))
        sa.crossJoin(sb).crossJoin(actual)
          .select(lit(name).as("join_edge"), col("n_left"), col("n_right"),
            col("ndv_left"), col("ndv_right"), col("actual_rows"),
            round(col("n_left").cast("double") * col("n_right") /
              greatest(col("ndv_left"), col("ndv_right")), 2).as("est_rows"),
            round(col("n_left").cast("double") * col("n_right") /
              greatest(col("ndv_left"), col("ndv_right")) / col("actual_rows"), 4)
              .as("est_over_actual"))
      }
      val li = t(s, dir, "lineitem")
      val ord = t(s, dir, "orders")
      val ev = t(s, dir, "events")
      Seq(
        edge("lineitem*orders.orderkey", li, "l_orderkey", ord, "o_orderkey"),
        edge("lineitem*part.partkey", li, "l_partkey",
          t(s, dir, "part"), "p_partkey"),
        edge("orders*customer.custkey", ord, "o_custkey",
          t(s, dir, "customer"), "c_custkey"),
        edge("events*events.user_id", ev, "user_id", ev, "user_id"))
        .reduce(_ unionAll _)
    }),

    "q228_reorder_gaps" -> ((s, dir) => {
      // Inter-purchase cadence per market segment: the days between a
      // customer's consecutive orders (lag over a PARTITIONED window —
      // keyed by custkey, so it scales; never a global window), rolled
      // up to exact p50/p90 via the Percentiles rank dataflow (no task
      // ever holds a segment's gaps). The replenishment-cycle read
      // behind inventory and win-back timing.
      val seg = broadcast(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")))
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val gaps = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
        .where(col("prev").isNotNull)
        .select(col("o_custkey"),
          datediff(col("o_orderdate").cast("date"), col("prev").cast("date"))
            .cast("long").as("gap_days"))
        .join(seg, col("o_custkey") === col("c_custkey"))
      val stats = gaps.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_gaps"),
          countDistinct(col("o_custkey")).as("n_repeat_customers"),
          round(avg("gap_days"), 4).as("mean_gap_days"))
      val pct = graft.operators.Percentiles.exactByGroup(
          gaps, col("c_mktsegment"), col("gap_days"),
          Seq(0.5, 0.9), Seq("p50_gap_days", "p90_gap_days"))
        .withColumnRenamed("group", "c_mktsegment")
      stats.join(broadcast(pct), "c_mktsegment")
        .select(col("c_mktsegment"), col("n_gaps"), col("n_repeat_customers"),
          col("mean_gap_days"),
          round(col("p50_gap_days"), 4).as("p50_gap_days"),
          round(col("p90_gap_days"), 4).as("p90_gap_days"))
    }),

    "q231_ivm_merge" -> ((s, dir) => {
      // Incremental view maintenance for distributive/algebraic
      // aggregates: the standing slice (orders before 2000-01-01) and
      // the delta batch (after) are aggregated SEPARATELY to mergeable
      // partials (n, Σx, Σx²), then merged by pure arithmetic — the
      // dataflow that maintains a 100 TB rollup by touching only the
      // delta (the standing partial would be a stored table; parity vs
      // the full-recompute oracle proves merge ≡ recompute). Variance
      // from the merged moments via the usual (nΣx² − (Σx)²)/n²;
      // dollars (not cents) keep Σx² inside long range under ANSI.
      val cut = "2000-01-01"
      val ord = t(s, dir, "orders")
        .select(col("o_orderpriority"),
          round(col("o_totalprice")).cast("long").as("x"),
          (col("o_orderdate") < lit(cut).cast("timestamp")).as("_standing"))
      def partial(df: DataFrame, tag: String): DataFrame = df
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("x").as("s"),
          sum(col("x") * col("x")).as("ss"))
        .withColumn("slice", lit(tag))
      val partials = partial(ord.where(col("_standing")), "standing")
        .unionAll(partial(ord.where(!col("_standing")), "delta"))
      val merged = partials.groupBy("o_orderpriority")
        .agg(sum("n").as("n_orders"), sum("s").as("_s"), sum("ss").as("_ss"),
          sum(when(col("slice") === "standing", col("n")).otherwise(0L))
            .as("n_standing"),
          sum(when(col("slice") === "delta", col("n")).otherwise(0L))
            .as("n_delta"))
      // mean/var from the EXACT merged longs, finished in doubles whose
      // op order the oracle mirrors token for token (n·Σx² and (Σx)²
      // would overflow long under ANSI at sf >= 0.1)
      merged.select(col("o_orderpriority"), col("n_orders"),
        col("n_standing"), col("n_delta"),
        round(col("_s").cast("double") / col("n_orders"), 4).as("mean_dollars"),
        round((col("_ss").cast("double") -
          col("_s").cast("double") * col("_s") / col("n_orders")) /
          col("n_orders"), 4).as("var_dollars"))
    }),

    "q232_skyline" -> ((s, dir) => {
      // 2-D Pareto frontier (skyline) of the part catalog — minimize
      // price, maximize size; a part is dominated iff some part is
      // strictly cheaper with at least its size, or same-priced and
      // strictly bigger. The classic O(n log n) sweep re-expressed as a
      // distributed prefix-max: collapse to price levels (groupBy max
      // size), rank levels by price (GlobalRank range exchange), running
      // max of size over the price order (withRunningMax), shift to
      // EXCLUSIVE via a rank self-join — then one broadcast hop back to
      // parts. No n² dominance join anywhere (operators.Skyline; the
      // ScaleProbe skyline mode measures sweep-vs-naive scaling).
      val parts = t(s, dir, "part")
        .select(col("p_partkey"), col("p_size"),
          round(col("p_retailprice") * 100).cast("long").as("cents"))
      graft.operators.Skyline.frontier2d(parts, col("cents"), col("p_size"))
        .select(col("p_partkey"),
          round(col("cents").cast("double") / 100.0, 2).as("price"),
          col("p_size"))
    }),

    "q243_order_reconciliation" -> ((s, dir) => {
      // Header-vs-detail reconciliation audit: recompute each order's
      // total from its lineitems (Σ round(extprice·(1−disc)·(1+tax)·100)
      // — exact cents per line, LONG sums) and reconcile against the
      // stored o_totalprice per order status: exact-match count, orders
      // with no lines at all (a LEFT join — an inner join would silently
      // pass them), and the mean/max absolute error. The migration /
      // replication validation shape: two key-grain aggregates and one
      // key join, no row ever leaves its grain.
      val calc = t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax")) * 100).cast("long").as("lc"))
        .groupBy("l_orderkey").agg(sum("lc").as("calc_cents"))
      val joined = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long").as("oc"))
        .join(calc, col("o_orderkey") === col("l_orderkey"), "left")
      val agg = joined.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("calc_cents").isNull, 1L).otherwise(0L)).as("n_no_lines"),
          sum(when(col("oc") === col("calc_cents"), 1L).otherwise(0L)).as("n_exact"),
          sum(when(col("calc_cents").isNotNull,
            abs(col("oc") - col("calc_cents"))).otherwise(0L)).as("sae"),
          max(when(col("calc_cents").isNotNull,
            abs(col("oc") - col("calc_cents")))).as("mxe"))
      agg.select(col("o_orderstatus"), col("n_orders"), col("n_no_lines"),
        col("n_exact"),
        when(col("n_orders") - col("n_no_lines") > 0,
          round(col("sae").cast("double")
            / (col("n_orders") - col("n_no_lines")) / 100.0, 4)).as("mean_abs_err"),
        round(col("mxe").cast("double") / 100.0, 2).as("max_abs_err"))
    }),

    "q252_market_share" -> ((s, dir) => {
      // TPC-H Q8-shaped market share, generalized to the full supplier-
      // nation breakdown: of the PROMO-part revenue sold into the ASIA
      // customer region, what share does EACH supplier nation carry per
      // year? Four dimension joins broadcast-pinned (part filter FIRST,
      // so the corpus stream shrinks before the one permissible shuffle
      // join lineitem⋈orders); revenue exact cents; share = nation cents
      // over a broadcast year total — integer until the final division.
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"),
        col("l_suppkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("cents"))
      val promo = broadcast(t(s, dir, "part")
        .where(col("p_type") === "PROMO").select(col("p_partkey")))
      val nat = t(s, dir, "nation")
      val asia = broadcast(t(s, dir, "customer").as("c")
        .join(nat.as("n"), col("c.c_nationkey") === col("n.n_nationkey"))
        .join(t(s, dir, "region").where(col("r_name") === "ASIA"),
          col("n.n_regionkey") === col("r_regionkey"))
        .select(col("c.c_custkey")))
      val ords = t(s, dir, "orders")
        .join(asia, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), year(col("o_orderdate")).cast("long").as("yr"))
      val supN = broadcast(t(s, dir, "supplier").as("s2")
        .join(nat.as("sn"), col("s2.s_nationkey") === col("sn.n_nationkey"))
        .select(col("s2.s_suppkey"), col("sn.n_name").as("supp_nation")))
      val rev = li.join(promo, col("l_partkey") === col("p_partkey"))
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(supN, col("l_suppkey") === col("s_suppkey"))
        .groupBy("yr", "supp_nation").agg(sum("cents").as("nc"))
      val tot = rev.groupBy("yr").agg(sum("nc").as("tc"))
      rev.join(broadcast(tot), "yr")
        .select(col("yr").as("year"), col("supp_nation"),
          round(col("nc").cast("double") / 100.0, 2).as("revenue"),
          round(col("nc").cast("double") / col("tc"), 6).as("mkt_share"))
    }),

    "q257_brand_movers" -> ((s, dir) => {
      // Which part brands MOVED between the stream's epoch halves? A
      // two-proportion z-test per brand on line share — the per-group
      // A/B screen run before any "brand X is growing" claim: counts
      // and totals are exact LONGs, p's and the z only divide at
      // display; |z| > 2.576 flags at α=0.01 (25 brands make a
      // multiple-comparisons correction the reader's job — the raw z is
      // the deliverable).
      val li = t(s, dir, "lineitem").select(col("l_partkey"),
        datediff(col("l_shipdate"), to_date(lit("1970-01-01")))
          .cast("long").as("ed"))
      val cut = broadcast(li.agg(min("ed").as("lo"), max("ed").as("hi"))
        .select(expr("(lo + hi) div 2").as("cut")))
      val brands = broadcast(t(s, dir, "part").select(col("p_partkey"), col("p_brand")))
      val perBrand = li.crossJoin(cut)
        .join(brands, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum(when(col("ed") <= col("cut"), 1L).otherwise(0L)).as("k1"),
          sum(when(col("ed") > col("cut"), 1L).otherwise(0L)).as("k2"))
      val tot = broadcast(perBrand.agg(sum("k1").as("n1"), sum("k2").as("n2")))
      val joined = perBrand.crossJoin(tot)
      val p1 = col("k1").cast("double") / col("n1")
      val p2 = col("k2").cast("double") / col("n2")
      val pp = (col("k1") + col("k2")).cast("double") / (col("n1") + col("n2"))
      val z = (p1 - p2) / sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n1") + lit(1.0) / col("n2")))
      joined.select(col("p_brand"), col("k1").as("n_early"), col("k2").as("n_late"),
        round(p1, 6).as("share_early"), round(p2, 6).as("share_late"),
        round(z, 4).as("z_score"), (abs(z) > 2.576).as("significant_01"))
    }),

    "q258_dead_stock" -> ((s, dir) => {
      // Dead-stock aging report: days since each part last shipped,
      // rolled into standard aging buckets (≤30/60/90/180/365/older,
      // plus never-sold via the LEFT join that an inner join would
      // silently hide) with part counts and catalog value share in
      // exact cents — the working-capital writedown input. Two key-
      // grain aggregates and one broadcast cutoff; nothing leaves the
      // part grain.
      val lastShip = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(max(datediff(col("l_shipdate"), to_date(lit("1970-01-01")))
          .cast("long")).as("last_ed"))
      val mx = broadcast(lastShip.agg(max("last_ed").as("mx")))
      val aged = t(s, dir, "part")
        .select(col("p_partkey"), round(col("p_retailprice") * 100).cast("long").as("pc"))
        .join(lastShip, col("p_partkey") === col("l_partkey"), "left")
        .crossJoin(mx)
        .select(col("pc"),
          when(col("last_ed").isNull, lit("never_sold"))
            .when(col("mx") - col("last_ed") <= 30, lit("0030_active"))
            .when(col("mx") - col("last_ed") <= 60, lit("0060_slowing"))
            .when(col("mx") - col("last_ed") <= 90, lit("0090_slow"))
            .when(col("mx") - col("last_ed") <= 180, lit("0180_stale"))
            .when(col("mx") - col("last_ed") <= 365, lit("0365_dormant"))
            .otherwise(lit("9999_dead")).as("age_bucket"))
      val agg = aged.groupBy("age_bucket")
        .agg(count(lit(1)).as("n_parts"), sum("pc").as("vc"))
      agg.crossJoin(broadcast(agg.agg(sum("n_parts").as("tp"), sum("vc").as("tv"))))
        .select(col("age_bucket"), col("n_parts"),
          round(col("vc").cast("double") / 100.0, 2).as("catalog_value"),
          round(col("n_parts").cast("double") / col("tp"), 4).as("part_share"),
          round(col("vc").cast("double") / col("tv"), 4).as("value_share"))
    }),

    "q259_min_cost_supplier" -> ((s, dir) => {
      // TPC-H Q2's correlated-MIN decorrelation over observed prices:
      // for every STANDARD part, the supplier with the lowest realized
      // unit price. The correlated `cost = (SELECT min(cost) WHERE
      // partkey = p.partkey)` becomes a (part, supplier)-grain
      // aggregate, a part-grain MIN re-aggregate of that SMALL table,
      // and an equality join back — the lineitem stream is scanned
      // once; the MIN never rescans it. Unit price stays an exact LONG
      // (cents·10⁴ div qty) through the comparison, and ties take the
      // lowest suppkey, so the winner is deterministic.
      val parts = broadcast(t(s, dir, "part")
        .where(col("p_type") === "STANDARD")
        .select(col("p_partkey"), col("p_name")))
      // (part, supplier)-grain table consumed by BOTH the part-grain MIN
      // and the join back — pinned so the stream is scanned exactly once
      val ps = t(s, dir, "lineitem")
        .join(parts, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"),
          sum(col("l_quantity").cast("long")).as("qty"))
        .select(col("l_partkey"), col("l_suppkey"),
          expr("(cents * 10000) div qty").as("unit_e4"))
        .localCheckpoint()
      val best = ps.groupBy(col("l_partkey").as("bk"))
        .agg(min("unit_e4").as("min_u"))
      val winner = ps
        .join(best, col("l_partkey") === col("bk") &&
          col("unit_e4") === col("min_u"))
        .groupBy(col("l_partkey"), col("min_u"))
        .agg(min("l_suppkey").as("s_suppkey"))
      val supp = broadcast(t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey").as("sk"), col("s_name"),
          col("n_name").as("supplier_nation")))
      winner
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(supp, col("s_suppkey") === col("sk"))
        .select(col("l_partkey").as("p_partkey"), col("p_name"),
          col("s_suppkey"), col("s_name"), col("supplier_nation"),
          // exact-LONG truncation to 4dp, then ONE shared double
          // division — round() at 4dp can land on a .xxxx5 tie and the
          // two engines break ties differently
          (expr("min_u div 100").cast("double") / 10000.0)
            .as("best_unit_price"))
    }),

    "q260_important_parts" -> ((s, dir) => {
      // TPC-H Q11's scalar-subquery decorrelation, made scale-free:
      // parts whose lifetime revenue exceeds 1.5× the MEAN part
      // revenue. The `HAVING sum(v) > (SELECT scalar)` is re-derived
      // from the part-grain aggregate itself — one corpus scan; the
      // threshold costs a re-agg of a |parts|-row table broadcast
      // back. Q11's FIXED share threshold would empty out as the
      // catalog grows (share ~ 1/|parts|); the mean-multiple keeps a
      // stable selective fraction at any scale. The compare is
      // all-integer (v·2 > avg_cents·3); doubles appear only at
      // display.
      val pv = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("v"))
        .localCheckpoint() // scalar + filter both read the pinned part grain
      val scalar = broadcast(pv
        .agg(sum("v").as("tot"), count(lit(1)).as("n"))
        .select(col("tot"), expr("(tot div n)").as("avg_c")))
      pv.crossJoin(scalar)
        .where(col("v") * 2 > col("avg_c") * 3)
        .select(col("l_partkey").as("p_partkey"),
          round(col("v").cast("double") / 100.0, 2).as("part_revenue"),
          round(col("v").cast("double") / col("tot"), 6).as("revenue_share"),
          round(col("v").cast("double") / col("avg_c"), 4).as("x_mean"))
    }),

    "q261_top_supplier" -> ((s, dir) => {
      // TPC-H Q15: the revenue view + `WHERE total = (SELECT
      // max(total) FROM view)` equality. The MAX re-aggregates the
      // |suppliers|-row view — never the stream — and joins back by
      // value, returning ALL tied winners (Q15's specified semantics)
      // instead of an arbitrary LIMIT 1. The window is the trailing 90
      // days anchored at the data's own max shipdate, so the query
      // runs at any fixture vintage. Exact cents end-to-end.
      val li = t(s, dir, "lineitem").select(col("l_suppkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("c"),
        datediff(col("l_shipdate"), to_date(lit("1970-01-01")))
          .cast("long").as("ed"))
      val mx = broadcast(li.agg(max("ed").as("mx")))
      // |suppliers|-row view pinned: the MAX and the equality join both
      // read it without a third pass over the stream (two stream scans
      // total — the anchor MAX is inherently a separate first pass)
      val rev = li.crossJoin(mx).where(col("ed") >= col("mx") - 89)
        .groupBy(col("l_suppkey")).agg(sum("c").as("revc"))
        .localCheckpoint()
      val top = broadcast(rev.agg(max("revc").as("best")))
      rev.crossJoin(top).where(col("revc") === col("best"))
        .join(broadcast(t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("revc").cast("double") / 100.0, 2).as("total_revenue"))
    }),

    "q262_large_orders" -> ((s, dir) => {
      // TPC-H Q18 large-volume orders: `o_orderkey IN (SELECT
      // l_orderkey … HAVING sum(qty) > 250)` decorrelated to an
      // order-grain aggregate that is its own semi-join — the HAVING
      // shrinks the key set BEFORE the orders/customer joins, so the
      // wide join only ever sees qualifying keys (~1% of orders).
      // Quantity sums are exact LONGs; the customer dim broadcasts.
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
        .where(col("total_qty") > 250)
      big.join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
    }),

    "q263_disjunctive_revenue" -> ((s, dir) => {
      // TPC-H Q19 disjunctive-predicate revenue: three OR'd (brand ×
      // size-range × qty-range) branches. The 100 TB lesson is the
      // hand-lifted CNF hull: the UNION of the branch bounds is
      // extracted from the OR and applied as plain conjuncts BEFORE
      // the join — the lineitem scan prunes to qty ∈ [1,45] and the
      // part scan to size ∈ [1,35] at the parquet reader
      // (PushedFilters), while the exact disjunction runs post-join on
      // the survivors only. Per-line discounted cents, exact sum.
      val part = broadcast(t(s, dir, "part")
        .where(col("p_size").between(1, 35))
        .select(col("p_partkey"), col("p_brand"), col("p_size")))
      val li = t(s, dir, "lineitem")
        .where(col("l_quantity").between(1, 45))
        .select(col("l_partkey"), col("l_quantity"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .cast("long").as("c"))
      li.join(part, col("l_partkey") === col("p_partkey"))
        .where(
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 20)) ||
          (col("p_brand") === "Brand#11" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 30)) ||
          (col("p_brand") === "Brand#21" && col("p_size").between(1, 35) &&
            col("l_quantity").between(25, 45)))
        .agg(count(lit(1)).as("n_lines"),
          round(sum("c").cast("double") / 100.0, 2).as("revenue"))
    }),

    "q264_return_risk" -> ((s, dir) => {
      // TPC-H Q10-shaped returned-revenue ranking: the 20 customers
      // with the most revenue lost to returns. The scale discipline is
      // in the ORDER of operations: aggregate to customer grain, take
      // the global top 20 THERE (TakeOrdered on the agg — never a full
      // sort), and only then enrich the 20 survivors against the
      // customer dim with the TINY side broadcast. Joining customer
      // before the cut would drag the full dim through the shuffle.
      // Exact cents; ties broken by custkey so the top-20 SET is
      // deterministic.
      val lost = t(s, dir, "lineitem")
        .where(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .cast("long").as("c"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey")).agg(sum("c").as("lostc"))
      val top20 = lost.orderBy(col("lostc").desc, col("o_custkey")).limit(20)
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(top20), col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name").as("nation"),
          col("c_acctbal"),
          round(col("lostc").cast("double") / 100.0, 2)
            .as("returned_revenue"))
    }),

    "q274_constraint_audit" -> ((s, dir) => {
      // Data-contract validation (the dbt-test / Deequ layer): one scan
      // per table, every rule a conditional count, results unioned into
      // a rule × violations ledger — the gate a 100 TB ingest runs
      // before promoting a snapshot. Rules: line numbers form a
      // contiguous 1..n per order (checked as max==count, no sort),
      // price/discount/tax domains, ship-after-order via the one
      // orders join, and enum domains. All-integer output.
      val li = t(s, dir, "lineitem")
      val lineChecks = li.select(
          when(col("l_quantity") <= 0, 1L).otherwise(0L).as("bad_qty"),
          when(col("l_extendedprice") <= 0, 1L).otherwise(0L).as("bad_price"),
          when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L)
            .otherwise(0L).as("bad_discount"),
          when(col("l_tax") < 0 || col("l_tax") > 0.08, 1L)
            .otherwise(0L).as("bad_tax"),
          when(!col("l_returnflag").isin("A", "N", "R"), 1L)
            .otherwise(0L).as("bad_returnflag"))
        .agg(count(lit(1)).as("n"), sum("bad_qty").as("v1"),
          sum("bad_price").as("v2"), sum("bad_discount").as("v3"),
          sum("bad_tax").as("v4"), sum("bad_returnflag").as("v5"))
      val contig = li.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("nl"), max("l_linenumber").as("mx"),
          min("l_linenumber").as("mn"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("mx") =!= col("nl") || col("mn") =!= 1, 1L)
            .otherwise(0L)).as("v"))
      val shipAfter = li.select(col("l_orderkey"), col("l_shipdate"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_shipdate") < col("o_orderdate"), 1L)
            .otherwise(0L)).as("v"))
      val sp = s
      import sp.implicits._
      def row(rule: String, scope: String, pair: (Long, Long)): DataFrame =
        Seq((rule, scope, pair._2, pair._1)).toDF(
          "rule", "scope", "violations", "n_checked")
      // bounded collects: three ONE-ROW aggregate results assembled into
      // the 7-row ledger — the corpus-facing work is entirely distributed
      val lc = lineChecks.collect().head
      val cg = contig.collect().head
      val sa = shipAfter.collect().head
      row("quantity_positive", "lineitem", (lc.getLong(0), lc.getLong(1)))
        .unionAll(row("extendedprice_positive", "lineitem",
          (lc.getLong(0), lc.getLong(2))))
        .unionAll(row("discount_in_[0,0.1]", "lineitem",
          (lc.getLong(0), lc.getLong(3))))
        .unionAll(row("tax_in_[0,0.08]", "lineitem",
          (lc.getLong(0), lc.getLong(4))))
        .unionAll(row("returnflag_domain", "lineitem",
          (lc.getLong(0), lc.getLong(5))))
        .unionAll(row("linenumbers_contiguous", "orders",
          (cg.getLong(0), cg.getLong(1))))
        .unionAll(row("ship_after_order", "lineitem",
          (sa.getLong(0), sa.getLong(1))))
        .withColumn("passed", col("violations") === 0L)
    }),

    "q281_binary_segmentation" -> ((s, dir) => {
      // Multi-changepoint detection by binary segmentation (depth 2):
      // the level-1 split maximizes the CUSUM deviation — cross-
      // multiplied to the exact LONG |n·cum_t − t·S| so no float mean
      // moves the argmax — then each half is re-segmented once. Day-
      // grain counts once; every window is bounded by |days| per
      // (type, segment) partition; ties take the earliest day. Extends
      // q195's single changepoint to the piecewise view monitoring
      // actually needs.
      val d = t(s, dir, "events")
        .select(col("event_type"),
          datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
            .cast("long").as("ed"))
        .groupBy("event_type", "ed").agg(count(lit(1)).as("x"))
      def splits(df: DataFrame, segCols: Seq[String]): DataFrame = {
        val part = Window.partitionBy(segCols.map(col): _*)
        val w = part.orderBy("ed")
        val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
        val ranked = df
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("cum", sum("x").over(wRun))
          .withColumn("nseg", count(lit(1)).over(part))
          .withColumn("sseg", sum("x").over(part))
          .where(col("rn") < col("nseg")) // interior candidates only
          .withColumn("dev", abs(col("nseg") * col("cum")
            - col("rn") * col("sseg")))
        val best = Window.partitionBy(segCols.map(col): _*)
          .orderBy(col("dev").desc, col("ed").asc)
        ranked.withColumn("_b", row_number().over(best))
          .where(col("_b") === 1)
          .select(segCols.map(col) :+ col("ed").as("split_ed") :+
            col("dev").as("dev_num") :+ col("nseg").as("seg_days"): _*)
      }
      val dPinned = d.localCheckpoint()
      val l1 = splits(dPinned, Seq("event_type")).localCheckpoint()
      val seg2 = dPinned
        .join(l1.select(col("event_type"), col("split_ed")), Seq("event_type"))
        .withColumn("seg", when(col("ed") <= col("split_ed"), lit("L"))
          .otherwise(lit("R")))
        .select("event_type", "seg", "ed", "x")
      val l2 = splits(seg2, Seq("event_type", "seg"))
      l1.select(col("event_type"), lit(1L).as("level"),
          lit("all").as("segment"), col("split_ed"), col("dev_num"),
          col("seg_days"))
        .unionAll(l2.where(col("seg_days") >= 2)
          .select(col("event_type"), lit(2L).as("level"),
            col("seg").as("segment"), col("split_ed"), col("dev_num"),
            col("seg_days")))
    }),

    "q297_priority_exists" -> ((s, dir) => {
      // TPC-H Q4-shaped order-priority check: per priority, how many
      // orders had AT LEAST ONE slow line (shipped > 60 days after the
      // order date — the fixture's proxy for Q4's commitdate breach)?
      // The correlated EXISTS becomes an order-grain MAX aggregate
      // that IS its own semi-join (exists = any line breaching); the
      // priority rollup then counts orders, never lines. Share at
      // display.
      val slow = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(max(when(datediff(col("l_shipdate"), col("o_orderdate")) > 60,
          1L).otherwise(0L)).as("has_slow"))
      slow.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), sum("has_slow").as("n_with_slow"))
        .select(col("o_orderpriority"), col("n_orders"), col("n_with_slow"),
          round(col("n_with_slow").cast("double") / col("n_orders"), 4)
            .as("slow_share"))
    }),

    "q298_promo_share" -> ((s, dir) => {
      // TPC-H Q14-shaped promo revenue share per month: both the PROMO
      // numerator and the total denominator are conditional sums in
      // ONE aggregate over the joined stream (Q14's lesson — never two
      // scans for a ratio); exact per-line discounted cents; the share
      // divides at display.
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .select(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
          (col("p_type") === "PROMO").as("is_promo"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .cast("long").as("c"))
      li.groupBy("month")
        .agg(sum(when(col("is_promo"), col("c")).otherwise(0L))
            .as("promo_cents"),
          sum("c").as("total_cents"))
        .select(col("month"),
          round(col("promo_cents").cast("double") / 100.0, 2)
            .as("promo_revenue"),
          round(col("total_cents").cast("double") / 100.0, 2)
            .as("total_revenue"),
          round(col("promo_cents") * 100.0 / col("total_cents"), 4)
            .as("promo_share_pct"))
    }),

    "q90_scd2" -> ((s, dir) => {
      // type-2 slowly-changing dimension from a change log: collapse each
      // user's event-type runs into validity intervals [valid_from,
      // valid_to) — run starts where the type differs from the previous
      // row (lag), interval ends at the next run's start (lead over the
      // compressed rows), NULL for the open current interval. One window
      // partitioning shared by both passes.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val marked = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("_prev", lag("event_type", 1).over(w))
        .where(col("_prev").isNull || col("_prev") =!= col("event_type"))
      val w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
      marked.select(col("user_id"), col("event_type"), col("ts").as("valid_from"),
        lead("ts", 1).over(w2).as("valid_to"))
    }),

    "q88_fuzzy_match" -> ((s, dir) => {
      // record-linkage shape: (brand, name-prefix)-blocked candidate pairs
      // verified by the native Jaro-Winkler expression (Spark ships only
      // levenshtein). Compound blocking bounds the pair space exactly like
      // the LSH dedups (standard linkage practice: the prefix block trades
      // a sliver of recall for a ~15x smaller pair space; Winkler scoring
      // itself privileges prefix-agreeing pairs). The filter compares the
      // 4-dp ROUNDED score so both engines cut identically; self-matches
      // (same name) excluded to keep it fuzzy.
      // DISTINCT-NAME COLLAPSE before the verify (round 13, the q43/q198
      // move): Jaro-Winkler runs once per distinct (brand, prefix) NAME
      // pair — duplicate catalog entries (reprints, the 10× replicated sf1
      // bench fixture) multiply doc pairs as copies² but add zero distinct
      // name pairs, and the jw < 1.0 cut means same-name pairs never even
      // need generating. Verified name pairs expand to key pairs through
      // two slim equi-joins; output is the pair-for-pair original.
      //
      // CORPUS-ADAPTIVE BLOCKING (round 16, the dbscanplanes "raise the
      // knob with n" contract applied to linkage): prefix length is a
      // closed-form step function of the DISTINCT-NAME count — ≤10k names
      // → 3 chars, ≤100k → 4, else 5 — so when the name universe grows
      // 10× the within-block distinct-pair space is re-cut instead of
      // growing ~100×. The oracle computes the SAME CASE from the same
      // count, so the two engines cannot drift at any SF (at the fixture
      // SFs the rule yields 3 — hashes unchanged). ScaleProbe mode
      // `linkage` demonstrates the contract on a 10× minted-name corpus.
      //
      // OUTPUT-STREAMING EXPANSION (round 16): on a duplicate-heavy corpus
      // the pair-for-pair OUTPUT is copies² by contract — the floor is
      // writing it, so nothing else may scale with it. vx (≤ distinct-
      // pair count) always broadcasts; the slim part projection
      // broadcasts only while ≤ 2M rows (driver-safe) and past that the
      // expansion falls back to a shuffled join on the block key — the
      // bucket-co-located posture, never a driver-OOM cliff. Inside the
      // broadcast regime the fan-out is generated in ONE whole-stage-
      // codegen stage: the 100× row mint never shuffles and never sorts.
      // Measured: sf1 10.45 s → ~1.1 s at the same 15.5M-row output
      // (BASELINE.md round 16).
      val pAll = t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_name"))
        .localCheckpoint() // ONE source scan; the count and all three
                           // expansion consumers read the checkpoint
      val sizes = pAll.agg(countDistinct("p_name").as("dn"),
        count(lit(1)).as("n")).head
      val (nNames, nParts) = (sizes.getLong(0), sizes.getLong(1))
      val pfxLen = QueryHelpers.linkagePfxLen(nNames)
      val p = pAll.withColumn("pfx", substring(col("p_name"), 1, pfxLen))
      // broadcast the slim part projection only while it is genuinely
      // broadcastable — past that the expansion falls back to a shuffled
      // join on the block key (the bucket-co-located posture at real
      // scale); the hint must not be a driver-OOM cliff at sf100
      val bcast: DataFrame => DataFrame =
        if (nParts <= 2000000L) broadcast else identity
      val g = p.select("p_brand", "pfx", "p_name").distinct()
      val vx = g.select(col("p_brand"), col("pfx"), col("p_name").as("na"))
        .join(g.select(col("p_brand"), col("pfx"), col("p_name").as("nb")),
          Seq("p_brand", "pfx"))
        .where(col("na") < col("nb"))
        .select(col("p_brand"), col("pfx"), col("na"), col("nb"),
          round(graft.plans.JaroWinkler.jaroWinkler(col("na"), col("nb")), 4)
            .as("jw"))
        .where(col("jw") >= 0.88 && col("jw") < 1.0)
      p.select(col("p_brand"), col("pfx"), col("p_name").as("na"),
          col("p_partkey").as("_ka"))
        .join(broadcast(vx), Seq("p_brand", "pfx", "na"))
        .join(bcast(p.select(col("p_brand"), col("pfx"),
          col("p_name").as("nb"), col("p_partkey").as("_kb"))),
          Seq("p_brand", "pfx", "nb"))
        .select(least(col("_ka"), col("_kb")).as("key_a"),
          greatest(col("_ka"), col("_kb")).as("key_b"), col("jw"))
    }),

    "q87_lateral" -> ((s, dir) => {
      // correlated LATERAL (ORDER BY + LIMIT inside): top-2 orders per
      // selected customer; the oracle runs the identical string
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(lateralSql)
    }),

    "q86_map_funcs" -> ((s, dir) => {
      // map-column surface: literal-map construction, keys/values, lookup,
      // map_filter, transform_values — results serialized deterministically
      // (map() literals preserve entry order) so the oracle is plain strings
      val m = map(lit("type"), col("event_type"),
        lit("uid"), col("user_id").cast("string"),
        lit("k"), get_json_object(col("props"), "$.k"))
      t(s, dir, "events").select(
        col("event_id"),
        concat_ws(",", map_keys(m)).as("keys"),
        element_at(m, "type").as("type_val"),
        size(m).cast("long").as("n_entries"),
        concat_ws("|", map_values(map_filter(m, (k, _) => k =!= "uid")))
          .as("non_uid_vals"),
        concat_ws("|", map_values(transform_values(m,
          (k, v) => when(k === "type", upper(v)).otherwise(v)))).as("vals_up"))
    }),

    "q308_inventory_turnover" -> ((s, dir) => {
      // Per-brand shipped-quantity turnover between shipdate epoch halves
      // (q256's integer midpoint cut): both half-sums are conditional
      // LONG aggregates in ONE scan-side pass; the ratio divides at
      // display, NULL when a brand shipped nothing early (no synthetic
      // infinities through the gate). The brand table broadcasts.
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("l_quantity").cast("long").as("qty"),
          datediff(col("l_shipdate").cast("date"),
            to_date(lit("1970-01-01"))).cast("long").as("ed"))
      val cut = li.agg(((min("ed") + max("ed")) / 2).cast("long").as("cut"))
      li.crossJoin(broadcast(cut))
        .groupBy("p_brand")
        .agg(sum(when(col("ed") <= col("cut"), col("qty")).otherwise(0L))
          .as("qty_early"),
          sum(when(col("ed") > col("cut"), col("qty")).otherwise(0L))
            .as("qty_late"))
        .select(col("p_brand"), col("qty_early"), col("qty_late"),
          when(col("qty_early") > 0,
            round(col("qty_late").cast("double") / col("qty_early"), 4))
            .as("turnover"))
    }),

    "q315_leadtime_by_nation" -> ((s, dir) => {
      // Order-to-ship lead time by SUPPLIER nation: integer day lags from
      // one lineitem⋈orders pass (the supplier→nation dim chain rides as
      // one broadcast); exact LONG day-sums divide only at display.
      val supN = broadcast(t(s, dir, "supplier").as("s")
        .join(t(s, dir, "nation").as("n"),
          col("s.s_nationkey") === col("n.n_nationkey"))
        .select(col("s.s_suppkey"), col("n.n_name").as("nation")))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_shipdate").cast("date").as("sd"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od")),
          col("l_orderkey") === col("o_orderkey"))
        .join(supN, col("l_suppkey") === col("s_suppkey"))
        .select(col("nation"), datediff(col("sd"), col("od")).cast("long").as("lag"))
        .groupBy("nation")
        .agg(count(lit(1)).as("n_lines"), sum("lag").as("_sl"),
          max("lag").as("max_lag_days"))
        .select(col("nation"), col("n_lines"),
          round(col("_sl").cast("double") / col("n_lines"), 4).as("avg_lag_days"),
          col("max_lag_days"))
    }),

    "q316_discount_bridge" -> ((s, dir) => {
      // Revenue bridge by discount band: integer discount percent buckets
      // into four labeled bands, exact per-line discounted cents, band
      // shares against the one-row broadcast total (the BM25 N/avgdl
      // pattern) — the waterfall a pricing review reads.
      val li = t(s, dir, "lineitem")
        .select(round(col("l_discount") * 100).cast("long").as("pct"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
            .cast("long").as("cents"))
        .withColumn("band",
          when(col("pct") <= 2, "00-02").when(col("pct") <= 5, "03-05")
            .when(col("pct") <= 8, "06-08").otherwise("09-10"))
      val byBand = li.groupBy("band")
        .agg(count(lit(1)).as("n_lines"), sum("cents").as("_c"))
      byBand.crossJoin(broadcast(byBand.agg(sum("_c").as("_t"))))
        .select(col("band"), col("n_lines"),
          round(col("_c").cast("double") / 100.0, 2).as("revenue"),
          round(col("_c").cast("double") / col("_t"), 4).as("share"))
    }),
  )

  val oracleSql: ListMap[String, String] = ListMap(
      "q308_inventory_turnover" ->
        """WITH li AS (SELECT p.p_brand, CAST(l.l_quantity AS BIGINT) AS qty,
          |   CAST(date_diff('day', DATE '1970-01-01', CAST(l.l_shipdate AS DATE))
          |     AS BIGINT) AS ed
          |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
          |b AS (SELECT (min(ed) + max(ed)) // 2 AS cut FROM li),
          |g AS (SELECT p_brand,
          |   CAST(sum(CASE WHEN ed <= b.cut THEN qty ELSE 0 END) AS BIGINT)
          |     AS qty_early,
          |   CAST(sum(CASE WHEN ed > b.cut THEN qty ELSE 0 END) AS BIGINT)
          |     AS qty_late
          |  FROM li, b GROUP BY 1)
          |SELECT p_brand, qty_early, qty_late,
          | CASE WHEN qty_early > 0
          |  THEN round(CAST(qty_late AS DOUBLE) / qty_early, 4) END AS turnover
          |FROM g""".stripMargin,

      "q315_leadtime_by_nation" ->
        """SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_lines,
          | round(CAST(sum(date_diff('day', CAST(o.o_orderdate AS DATE),
          |     CAST(l.l_shipdate AS DATE))) AS DOUBLE) / count(*), 4)
          |   AS avg_lag_days,
          | CAST(max(date_diff('day', CAST(o.o_orderdate AS DATE),
          |     CAST(l.l_shipdate AS DATE))) AS BIGINT) AS max_lag_days
          |FROM lineitem l
          |JOIN orders o ON l.l_orderkey = o.o_orderkey
          |JOIN supplier s ON l.l_suppkey = s.s_suppkey
          |JOIN nation n ON s.s_nationkey = n.n_nationkey
          |GROUP BY 1""".stripMargin,

      "q316_discount_bridge" ->
        """WITH li AS (SELECT
          |   CASE WHEN CAST(round(l_discount * 100) AS BIGINT) <= 2 THEN '00-02'
          |    WHEN CAST(round(l_discount * 100) AS BIGINT) <= 5 THEN '03-05'
          |    WHEN CAST(round(l_discount * 100) AS BIGINT) <= 8 THEN '06-08'
          |    ELSE '09-10' END AS band,
          |   CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
          |     AS cents FROM lineitem),
          |g AS (SELECT band, CAST(count(*) AS BIGINT) AS n_lines,
          |   CAST(sum(cents) AS BIGINT) AS c FROM li GROUP BY 1),
          |t AS (SELECT CAST(sum(c) AS BIGINT) AS tt FROM g)
          |SELECT g.band, g.n_lines,
          | round(CAST(g.c AS DOUBLE) / 100.0, 2) AS revenue,
          | round(CAST(g.c AS DOUBLE) / t.tt, 4) AS share
          |FROM g, t""".stripMargin,
      "q01_agg_pricing" ->
        """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
          | round(sum(l_extendedprice), 2) AS sum_base_price,
          | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
          | round(avg(l_quantity), 4) AS avg_qty, round(avg(l_discount), 4) AS avg_disc,
          | count(*) AS count_order
          |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
          |GROUP BY l_returnflag, l_linestatus""".stripMargin,

      "q02_filter_topn" ->
        """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
          |FROM lineitem WHERE l_quantity >= 48 AND l_discount <= 0.02
          |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC LIMIT 100""".stripMargin,

      "q03_join_geo" ->
        """SELECT r_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_acctbal,
          | round(avg(c_acctbal), 4) AS avg_acctbal
          |FROM customer JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name""".stripMargin,

      "q04_join_revenue" ->
        """SELECT o_orderpriority,
          | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
          | count(DISTINCT o_orderkey) AS n_orders, count(*) AS n_items
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY o_orderpriority""".stripMargin,

      "q05_semi_join" ->
        """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
          |WHERE EXISTS (SELECT 1 FROM lineitem
          |  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)""".stripMargin,

      "q06_anti_join" ->
        """SELECT c_custkey, c_name, c_acctbal FROM customer
          |WHERE NOT EXISTS (SELECT 1 FROM orders
          |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,

      "q07_window_topk" ->
        """SELECT o_custkey, o_orderkey, o_totalprice,
          | row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
          |FROM orders QUALIFY rnk <= 3""".stripMargin,

      "q08_rollup" ->
        """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
          |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

      "q16_cube" ->
        """SELECT l_returnflag, l_linestatus, count(*) AS n,
          | round(sum(l_extendedprice), 2) AS sum_price
          |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

      "q17_running_sum" ->
        """SELECT o_custkey, o_orderkey,
          | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
          |   ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2) AS running_spend
          |FROM orders""".stripMargin,

      "q19_range_join" ->
        """SELECT e.event_id AS event_id, count(p.ts) AS n_purchases_1h
          |FROM events e LEFT JOIN events p ON p.user_id = e.user_id
          |  AND p.event_type = 'purchase'
          |  AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR
          |WHERE e.event_type = 'error'
          |GROUP BY e.event_id""".stripMargin,

      "q09_pivot_status" ->
        """SELECT o_orderpriority,
          | count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
          | count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
          | count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
          |FROM orders GROUP BY o_orderpriority""".stripMargin,

      "q10_set_intersect" ->
        """SELECT DISTINCT c_nationkey AS n FROM customer WHERE c_acctbal > 8000
          |INTERSECT
          |SELECT DISTINCT c_nationkey AS n FROM customer WHERE c_mktsegment = 'BUILDING'""".stripMargin,

      "q11_set_except" ->
        """SELECT DISTINCT c_nationkey AS n FROM customer
          |EXCEPT
          |SELECT DISTINCT c_nationkey AS n FROM customer WHERE c_acctbal > 9900""".stripMargin,

      "q12_date_agg" ->
        """SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
          | CAST(extract(month FROM o_orderdate) AS BIGINT) AS o_month,
          | count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
          |FROM orders GROUP BY 1, 2""".stripMargin,

      "q13_json_extract" ->
        """SELECT event_type, count(*) AS n, round(avg(value), 4) AS avg_value,
          | CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
          | round(avg(CAST(props->>'$.k' AS BIGINT)), 4) AS avg_k
          |FROM events GROUP BY event_type""".stripMargin,

      "q14_window_hour" ->
        """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
          | round(sum(value), 2) AS sum_value
          |FROM events GROUP BY 1, 2""".stripMargin,

      "q15_asof_join" ->
        """SELECT e.event_id AS event_id, e.user_id AS user_id, e.ts AS error_ts,
          | (SELECT max(p.ts) FROM events p
          |  WHERE p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts <= e.ts) AS last_purchase_ts
          |FROM events e WHERE e.event_type = 'error'""".stripMargin,

      "q32_media_meta" ->
        """SELECT doc_id,
          | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
          | octet_length(encode(text)) AS n_bytes,
          | CAST(64 + octet_length(encode(text)) % 576 AS INT) AS width,
          | CAST(64 + (octet_length(encode(text)) * 31) % 576 AS INT) AS height,
          | CAST(1 + octet_length(encode(text)) % 120 AS INT) AS n_frames
          |FROM documents""".stripMargin,

      "q36_grouping_sets" ->
        """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
          |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,

      "q40_asof_tolerance" ->
        """WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
          |SELECT e.event_id,
          | (SELECT p.ts FROM events p
          |   WHERE p.event_type = 'purchase' AND p.user_id = e.user_id AND p.ts <= e.ts
          |    AND (epoch_us(e.ts::TIMESTAMP) // 1000000) - (epoch_us(p.ts::TIMESTAMP) // 1000000) <= 3600
          |   ORDER BY p.ts DESC LIMIT 1) AS purchase_ts,
          | round((SELECT p.value FROM events p
          |   WHERE p.event_type = 'purchase' AND p.user_id = e.user_id AND p.ts <= e.ts
          |    AND (epoch_us(e.ts::TIMESTAMP) // 1000000) - (epoch_us(p.ts::TIMESTAMP) // 1000000) <= 3600
          |   ORDER BY p.ts DESC LIMIT 1), 2) AS purchase_value
          |FROM e""".stripMargin,

      "q46_range_frame" ->
        """SELECT user_id, event_id,
          | count(*) OVER w AS n_trailing_1h,
          | round(avg(value) OVER w, 4) AS avg_value_1h
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP)
          |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,

      "q47_lead_lag_ntile" ->
        """SELECT o_custkey, o_orderkey,
          | CAST(datediff('day', lag(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS days_since_prev,
          | CAST(datediff('day', o_orderdate, lead(o_orderdate) OVER w) AS BIGINT) AS days_to_next,
          | CAST(ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS price_quartile
          |FROM orders
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,

      "q48_array_agg" ->
        """SELECT source,
          | array_to_string(list_sort(list(DISTINCT lang)), '|') AS langs,
          | count(DISTINCT lang) AS n_langs, count(*) AS n_docs
          |FROM documents GROUP BY source""".stripMargin,

      "q45_topk_agg" ->
        """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8),
          |c AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv FROM embeddings),
          |s AS (SELECT query_id, corpus_id,
          |   list_sum(list_transform(range(1, 65), i -> qv[i] * cv[i])) /
          |   (sqrt(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i]))) *
          |    sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])))) AS cos
          |  FROM q, c)
          |SELECT query_id, corpus_id, round(cos, 6) AS cos,
          | row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC) AS rnk
          |FROM s QUALIFY rnk <= 5""".stripMargin,

      "q42_full_outer" ->
        """WITH c AS (SELECT c_nationkey AS ck, count(*) AS n_cust,
          |    round(sum(c_acctbal), 2) AS cust_bal FROM customer GROUP BY 1),
          |s AS (SELECT s_nationkey AS sk, count(*) AS n_supp,
          |    round(sum(s_acctbal), 2) AS supp_bal FROM supplier GROUP BY 1)
          |SELECT coalesce(ck, sk) AS nationkey,
          | coalesce(n_cust, 0) AS n_cust, cust_bal,
          | coalesce(n_supp, 0) AS n_supp, supp_bal
          |FROM c FULL OUTER JOIN s ON ck = sk""".stripMargin,

      "q43_edit_distance" -> {
        val cln = cleanSql("text")
        s"""$shingleCte,
           |blk AS (SELECT doc_id, list_min(s) AS b FROM sh),
           |c1 AS (SELECT doc_id, $cln AS cln FROM documents),
           |pairs AS (SELECT a.doc_id AS id_a, b2.doc_id AS id_b
           |  FROM blk a JOIN blk b2 ON a.b = b2.b AND a.doc_id < b2.doc_id)
           |SELECT DISTINCT p.id_a, p.id_b,
           | CAST(levenshtein(x.cln, y.cln) AS INT) AS edit_dist
           |FROM pairs p JOIN c1 x ON x.doc_id = p.id_a JOIN c1 y ON y.doc_id = p.id_b
           |WHERE levenshtein(x.cln, y.cln) <= 40""".stripMargin
      },

      "q18_bloom_join" ->
        """SELECT o_orderpriority, count(*) AS n_items,
          | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |WHERE o_totalprice > 480000
          |GROUP BY o_orderpriority""".stripMargin,

      "q49_global_ntile" ->
        """SELECT o_orderkey,
          | CAST(ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS price_quartile
          |FROM orders""".stripMargin,

      "q55_col_profile" -> Profiler.oracleSql("orders", ordersProfile),

      "q57_math_funcs" ->
        """SELECT l_orderkey, l_linenumber,
          | round(sqrt(l_quantity), 6) AS sqrt_qty,
          | round(ln(l_extendedprice), 6) AS ln_price,
          | round(exp(l_discount), 6) AS exp_disc,
          | round(pow(l_quantity, 2.0), 2) AS qty_sq,
          | round(abs(l_discount - 0.05), 6) AS abs_disc_ctr,
          | CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
          | CAST(ceil(l_quantity / 7.0) AS BIGINT) AS qty_ceil7,
          | CAST(mod(l_orderkey, 97) AS BIGINT) AS mod97
          |FROM lineitem""".stripMargin,

      "q58_date_funcs" ->
        """SELECT o_orderkey,
          | CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
          | CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow_sun1,
          | CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
          | CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
          | date_trunc('week', o_orderdate) AS week_start,
          | CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
          | CAST(CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS VARCHAR) AS plus_month
          |FROM orders""".stripMargin,

      "q59_salted_agg" ->
        """SELECT l_returnflag, l_linestatus, count(*) AS n
          |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

      "q60_time_range_join" ->
        """SELECT e.event_id AS event_id, count(*) AS n_purchases_1h
          |FROM events e JOIN events p ON p.event_type = 'purchase'
          |  AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 1 HOUR
          |WHERE e.event_type = 'error'
          |GROUP BY e.event_id""".stripMargin,

      "q61_asof_forward" ->
        """WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
          |SELECT e.event_id,
          | (SELECT p.ts FROM events p
          |   WHERE p.event_type = 'purchase' AND p.user_id = e.user_id AND p.ts >= e.ts
          |    AND (epoch_us(p.ts::TIMESTAMP) // 1000000) - (epoch_us(e.ts::TIMESTAMP) // 1000000) <= 3600
          |   ORDER BY p.ts ASC LIMIT 1) AS next_purchase_ts,
          | round((SELECT p.value FROM events p
          |   WHERE p.event_type = 'purchase' AND p.user_id = e.user_id AND p.ts >= e.ts
          |    AND (epoch_us(p.ts::TIMESTAMP) // 1000000) - (epoch_us(e.ts::TIMESTAMP) // 1000000) <= 3600
          |   ORDER BY p.ts ASC LIMIT 1), 2) AS next_purchase_value
          |FROM e""".stripMargin,

      "q62_string_funcs" ->
        """SELECT p_partkey,
          | upper(p_name) AS name_up,
          | substring(p_name, 1, 12) AS name_12,
          | CAST(length(p_name) AS BIGINT) AS name_len,
          | lpad(p_brand, 12, '#') AS brand_pad,
          | regexp_replace(p_type, ' ', '_', 'g') AS type_us,
          | reverse(p_brand) AS brand_rev,
          | concat_ws('|', p_brand, p_type) AS brand_type,
          | split_part(p_type, ' ', 1) AS type_head,
          | CAST(instr(p_name, 'a') AS BIGINT) AS a_pos,
          | left(p_name, 5) AS name_l5,
          | right(p_name, 5) AS name_r5
          |FROM part""".stripMargin,

      "q63_rank_suite" ->
        """SELECT o_orderpriority, o_orderkey,
          | CAST(dense_rank() OVER w AS BIGINT) AS drank,
          | round(percent_rank() OVER w, 6) AS prank,
          | round(cume_dist() OVER w, 6) AS cdist,
          | first_value(o_orderkey) OVER w AS top_key
          |FROM orders
          |WINDOW w AS (PARTITION BY o_orderpriority
          |  ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin,

      "q64_gap_fill" ->
        """WITH h AS (SELECT event_type,
          |   date_trunc('hour', ts)::TIMESTAMP AS hr, value FROM events),
          |c AS (SELECT event_type, hr, count(*) AS n,
          |   round(sum(value), 2) AS sum_value FROM h GROUP BY 1, 2),
          |s AS (SELECT event_type,
          |   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
          |  FROM (SELECT event_type, min(hr) AS h0, max(hr) AS h1 FROM h GROUP BY 1))
          |SELECT s.event_type AS event_type, s.hr AS hr,
          | coalesce(c.n, 0) AS n, coalesce(c.sum_value, 0.0) AS sum_value
          |FROM s LEFT JOIN c ON s.event_type = c.event_type AND s.hr = c.hr""".stripMargin,

      "q66_regexp" ->
        """SELECT doc_id,
          | regexp_extract(text, '\b(s[a-z]+)\b', 1) AS first_s_word,
          | CAST(len(regexp_extract_all(text, '\b(scan|sort|stream)\b', 1)) AS BIGINT)
          |   AS n_scan_like,
          | regexp_replace(substring(text, 1, 40), '[aeiou]', '*', 'g') AS masked_head
          |FROM documents""".stripMargin,

      "q69_band_join" ->
        """SELECT band_id, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
          |FROM orders
          |JOIN (SELECT i AS band_id, i * 12500.0 AS lo, i * 12500.0 + 25000.0 AS hi
          |      FROM generate_series(0, 47) t(i)) b
          |  ON o_totalprice >= b.lo AND o_totalprice <= b.hi
          |GROUP BY band_id""".stripMargin,

      "q68_cond_funcs" ->
        """SELECT l_orderkey, l_linenumber,
          | greatest(l_quantity, 30.0) AS qty_floor30,
          | least(l_extendedprice, 10000.0) AS price_cap10k,
          | coalesce(nullif(l_tax, 0.0), -1.0) AS tax_or_neg,
          | CASE WHEN l_quantity > 25 THEN 'H' WHEN l_quantity > 10 THEN 'M'
          |   ELSE 'L' END AS qty_band
          |FROM lineitem""".stripMargin,

      "q75_subqueries" -> subquerySql,

      "q76_agg_suite" ->
        """WITH vc AS (SELECT l_returnflag, l_quantity, count(*) AS c
          |  FROM lineitem GROUP BY 1, 2),
          |md AS (SELECT l_returnflag, l_quantity AS mode_qty FROM vc
          |  QUALIFY row_number() OVER (PARTITION BY l_returnflag
          |    ORDER BY c DESC, l_quantity ASC) = 1)
          |SELECT l.l_returnflag AS l_returnflag, count(*) AS n,
          | CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_disc,
          | bool_or(l_quantity >= 49.0) AS any_q49,
          | bool_and(l_quantity > 0.0) AS all_qpos,
          | round(median(l_extendedprice), 4) AS med_price,
          | min(md.mode_qty) AS mode_qty
          |FROM lineitem l JOIN md ON l.l_returnflag = md.l_returnflag
          |GROUP BY 1""".stripMargin,

      "q77_array_funcs" ->
        s"""WITH d AS (SELECT doc_id,
           |   string_split(${cleanSql("text")}, ' ') AS toks FROM documents)
           |SELECT doc_id,
           | CAST(len(toks) AS BIGINT) AS n_toks,
           | array_to_string(toks[1:3], '|') AS first3,
           | array_to_string(list_sort(list_distinct(toks)), '|') AS uniq_sorted,
           | list_contains(toks, 'vector') AS has_vector,
           | CAST(coalesce(list_position(toks, 'vector'), 0) AS BIGINT) AS pos_vector,
           | list_max(toks) AS max_tok,
           | CAST(list_sum(list_transform(toks, t -> len(t))) AS BIGINT) AS sum_tok_len
           |FROM d""".stripMargin,

      "q108_source_overlap" ->
        s"""WITH t AS (SELECT source,
           |   string_split(${cleanSql("text")}, ' ') AS toks FROM documents),
           |nn AS (SELECT source, toks, len(toks) AS n FROM t WHERE len(toks) >= 5),
           |w AS (SELECT source, toks,
           |   unnest(generate_series(0, CAST(n - 5 AS BIGINT))) AS pos FROM nn),
           |sh AS (SELECT DISTINCT source, substring(md5(array_to_string(list_slice(toks,
           |   CAST(pos + 1 AS BIGINT), CAST(pos + 5 AS BIGINT)), ' ')), 1, 16) AS h FROM w),
           |ns AS (SELECT source, count(*) AS n_sh FROM sh GROUP BY 1),
           |ix AS (SELECT a.source AS src_a, b.source AS src_b,
           |   CAST(count(*) AS BIGINT) AS inter
           |  FROM sh a JOIN sh b USING (h) WHERE a.source < b.source GROUP BY 1, 2)
           |SELECT src_a, src_b, inter,
           | round(inter / CAST(na.n_sh + nb.n_sh - inter AS DOUBLE), 6) AS jaccard
           |FROM ix JOIN ns na ON na.source = src_a JOIN ns nb ON nb.source = src_b""".stripMargin,

      "q111_product_quant" -> {
        def sub(m: Int): String = "(" + graft.operators.KMeansOp.oracleSql(
          "embeddings", "vec_id",
          s"list_slice(embedding, ${m * 16 + 1}, ${m * 16 + 16})",
          k = 4, iters = 2, dim = 16) + s"\n) s$m"
        s"""SELECT s0.vec_id, s0.cluster AS code0, s1.cluster AS code1,
           | s2.cluster AS code2, s3.cluster AS code3,
           | round(s0.sq_dist + s1.sq_dist + s2.sq_dist + s3.sq_dist, 4) AS pq_err
           |FROM ${sub(0)} JOIN ${sub(1)} USING (vec_id)
           | JOIN ${sub(2)} USING (vec_id) JOIN ${sub(3)} USING (vec_id)""".stripMargin
      },

      "q136_quantile_calibrate" ->
        """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
          |r AS (SELECT doc_id, source, n_chars,
          |   CAST(row_number() OVER (PARTITION BY source
          |     ORDER BY n_chars ASC, doc_id ASC) AS BIGINT) AS r FROM d),
          |n AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY source),
          |t AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM d),
          |g AS (SELECT n_chars AS cal_chars,
          |   CAST(row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) AS BIGINT) AS grank
          |  FROM d),
          |i AS (SELECT r.doc_id, r.source, r.n_chars,
          |   CASE WHEN n.n > 1 THEN 1 + ((r.r - 1) * (t.nn - 1)) // (n.n - 1)
          |        ELSE 1 + (t.nn - 1) // 2 END AS gidx
          |  FROM r JOIN n USING (source), t)
          |SELECT i.doc_id, i.source, i.n_chars, g.cal_chars
          |FROM i JOIN g ON g.grank = i.gidx""".stripMargin,

      "q192_source_style" -> {
        val t = s"lower(${cleanSql("text")})"
        s"""WITH d AS (SELECT source, $t AS t FROM documents WHERE len($t) >= 3),
           |g AS (SELECT source, unnest(list_transform(range(1, len(t) - 1),
           |   i -> substr(t, CAST(i AS INT), 3))) AS gram FROM d),
           |c AS (SELECT source, gram, CAST(count(*) AS BIGINT) AS c
           |  FROM g GROUP BY 1, 2),
           |n AS (SELECT source, sqrt(CAST(sum(c * c) AS DOUBLE)) AS nrm
           |  FROM c GROUP BY source)
           |SELECT a.source AS src_a, b.source AS src_b,
           | CAST(count(*) AS BIGINT) AS shared_grams,
           | round(CAST(sum(a.c * b.c) AS DOUBLE) / (any_value(na.nrm) *
           |   any_value(nb.nrm)), 6) AS cosine
           |FROM c a JOIN c b ON a.gram = b.gram AND a.source < b.source
           |JOIN n na ON na.source = a.source JOIN n nb ON nb.source = b.source
           |GROUP BY a.source, b.source""".stripMargin
      },

      "q203_profit_rollup" ->
        """SELECT n.n_name AS nation,
          | CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS o_year,
          | round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS sum_profit,
          | CAST(count(*) AS BIGINT) AS n_lineitems
          |FROM lineitem l
          |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
          |JOIN supplier s ON s.s_suppkey = l.l_suppkey
          |JOIN nation n ON n.n_nationkey = s.s_nationkey
          |JOIN orders o ON o.o_orderkey = l.l_orderkey
          |GROUP BY 1, 2""".stripMargin,

      "q204_small_qty_revenue" ->
        """WITH li AS (SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
          |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          |  WHERE p.p_name LIKE '%widget%'),
          |aq AS (SELECT l_partkey, sum(l_quantity) / count(*) AS aq
          |  FROM li GROUP BY l_partkey)
          |SELECT CAST(count(*) AS BIGINT) AS n_small,
          | round(sum(li.l_extendedprice) / 7.0, 2) AS avg_yearly
          |FROM li JOIN aq USING (l_partkey)
          |WHERE li.l_quantity < 0.2 * aq.aq""".stripMargin,

      "q205_rfm_segments" ->
        """WITH u AS (SELECT user_id, max(CAST(ts AS DATE)) AS last_d,
          |   CAST(count(*) AS BIGINT) AS freq,
          |   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
          |     AS mon_cents
          |  FROM events GROUP BY user_id),
          |a AS (SELECT max(CAST(ts AS DATE)) AS anchor FROM events),
          |b AS (SELECT u.user_id,
          |   CAST(date_diff('day', u.last_d, a.anchor) AS BIGINT) AS rec_days,
          |   u.freq, u.mon_cents FROM u, a),
          |t AS (SELECT *,
          |   CAST(ntile(5) OVER (ORDER BY rec_days, user_id) AS BIGINT) AS r,
          |   CAST(ntile(5) OVER (ORDER BY freq DESC, user_id) AS BIGINT) AS f,
          |   CAST(ntile(5) OVER (ORDER BY mon_cents DESC, user_id) AS BIGINT)
          |     AS m
          |  FROM b)
          |SELECT r, f, m, CAST(count(*) AS BIGINT) AS n_users,
          | round(CAST(sum(mon_cents) AS DOUBLE) / (100.0 * count(*)), 2)
          |   AS avg_monetary
          |FROM t GROUP BY r, f, m""".stripMargin,

      "q206_order_backlog" ->
        """WITH cl AS (SELECT l_orderkey,
          |   max(CAST(l_shipdate AS DATE)) AS close_d
          |  FROM lineitem GROUP BY l_orderkey),
          |sp AS (SELECT CAST(o.o_orderdate AS DATE) AS open_d,
          |   greatest(CAST(o.o_orderdate AS DATE), cl.close_d) AS close_d
          |  FROM orders o JOIN cl ON cl.l_orderkey = o.o_orderkey),
          |ev AS (SELECT open_d AS day, 1 AS d FROM sp
          | UNION ALL SELECT close_d + 1, -1 FROM sp),
          |g AS (SELECT day, CAST(sum(d) AS BIGINT) AS delta,
          |   CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
          |     AS n_opened,
          |   CAST(sum(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT)
          |     AS n_closed
          |  FROM ev GROUP BY day)
          |SELECT day, n_opened, n_closed,
          | CAST(sum(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
          |   AS BIGINT) AS open_orders
          |FROM g""".stripMargin,

      "q215_late_supplier" ->
        """WITH pos AS (SELECT l.l_orderkey, l.l_suppkey,
          |   max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          |     THEN 1 ELSE 0 END) AS late
          |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          |  GROUP BY 1, 2),
          |po AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_supp,
          |   CAST(sum(late) AS BIGINT) AS n_late
          |  FROM pos GROUP BY 1)
          |SELECT n.n_name AS nation,
          | CAST(count(*) AS BIGINT) AS n_blame_orders,
          | CAST(count(DISTINCT pos.l_suppkey) AS BIGINT) AS n_suppliers_blamed
          |FROM pos JOIN po USING (l_orderkey)
          |JOIN supplier s ON s.s_suppkey = pos.l_suppkey
          |JOIN nation n ON n.n_nationkey = s.s_nationkey
          |WHERE pos.late = 1 AND po.n_supp >= 2 AND po.n_late = 1
          |GROUP BY n.n_name""".stripMargin,

      "q216_custdist" ->
        """WITH pc AS (SELECT c.c_custkey,
          |   CAST(count(o.o_orderkey) AS BIGINT) AS c_count
          |  FROM customer c LEFT JOIN (
          |    SELECT o_custkey, o_orderkey FROM orders
          |    WHERE o_orderpriority <> '1-URGENT') o
          |  ON c.c_custkey = o.o_custkey
          |  GROUP BY c.c_custkey)
          |SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
          |FROM pc GROUP BY c_count""".stripMargin,

      "q217_dormant_rich" ->
        """WITH c AS (SELECT c_custkey, c_nationkey,
          |   CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer),
          |t AS (SELECT CAST(sum(cents) AS BIGINT) AS s,
          |   CAST(count(*) AS BIGINT) AS n FROM c WHERE cents > 0),
          |mx AS (SELECT max(o_orderdate) AS m FROM orders)
          |SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
          | round(CAST(sum(c.cents) AS DOUBLE) / 100.0, 2) AS total_balance
          |FROM c, t, mx
          |WHERE c.c_nationkey IN (1, 3, 5, 7, 9) AND c.cents * t.n > t.s
          | AND NOT EXISTS (SELECT 1 FROM orders o
          |   WHERE o.o_custkey = c.c_custkey
          |     AND o.o_orderdate > mx.m - INTERVAL 180 DAY)
          |GROUP BY c.c_nationkey""".stripMargin,

      "q220_table_stats" -> {
        def num(c: String) =
          s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
             | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |   AS n_null,
             | CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
             | round(CAST(min($c) AS DOUBLE), 4) AS min_num,
             | round(CAST(max($c) AS DOUBLE), 4) AS max_num,
             | CAST(NULL AS DOUBLE) AS avg_len FROM lineitem"""
        def str(c: String) =
          s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
             | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |   AS n_null,
             | CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
             | CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
             | round(avg(length($c)), 4) AS avg_len FROM lineitem"""
        def ts(c: String) =
          s"""SELECT '$c' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
             | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |   AS n_null,
             | CAST(count(DISTINCT $c) AS BIGINT) AS ndv,
             | round(CAST(epoch(min($c)) AS DOUBLE), 4) AS min_num,
             | round(CAST(epoch(max($c)) AS DOUBLE), 4) AS max_num,
             | CAST(NULL AS DOUBLE) AS avg_len FROM lineitem"""
        (Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax").map(num)
          ++ Seq("l_returnflag", "l_linestatus").map(str)
          ++ Seq(ts("l_shipdate")))
          .map(q => q.stripMargin.replace('\n', ' '))
          .mkString(" UNION ALL ")
      },

      "q221_fk_integrity" -> {
        def edge(name: String, child: String, ck: String,
            parent: String, pk: String) =
          s"""SELECT '$name' AS fk_edge,
             | CAST(sum(CASE WHEN k IS NOT NULL THEN c ELSE 0 END) AS BIGINT)
             |   AS n_child_rows,
             | CAST(sum(CASE WHEN p IS NULL THEN c ELSE 0 END) AS BIGINT)
             |   AS n_orphan_rows,
             | CAST(sum(CASE WHEN p IS NULL AND k IS NOT NULL THEN 1 ELSE 0
             |   END) AS BIGINT) AS n_orphan_keys,
             | CAST(sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             |   AS n_parent_keys,
             | round(CAST(sum(CASE WHEN p IS NOT NULL AND k IS NOT NULL
             |     THEN 1 ELSE 0 END) AS DOUBLE) /
             |   sum(CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END), 4)
             |   AS parent_coverage
             |FROM (SELECT $ck AS k, CAST(count(*) AS BIGINT) AS c
             |      FROM $child GROUP BY $ck) ch
             |FULL OUTER JOIN (SELECT DISTINCT CAST($pk AS BIGINT) AS p
             |      FROM $parent) pa ON ch.k = pa.p"""
        Seq(
          edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey"),
          edge("lineitem.l_partkey->part", "lineitem", "l_partkey",
            "part", "p_partkey"),
          edge("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
            "supplier", "s_suppkey"),
          edge("orders.o_custkey->customer", "orders", "o_custkey",
            "customer", "c_custkey"),
          edge("customer.c_nationkey->nation", "customer", "c_nationkey",
            "nation", "n_nationkey"))
          .map(q => q.stripMargin.replace('\n', ' '))
          .mkString(" UNION ALL ")
      },

      "q225_revenue_drawdown" ->
        """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
          |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          |     AS cents
          |  FROM orders GROUP BY 1),
          |h AS (SELECT day, cents,
          |   max(cents) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS peak
          |  FROM d)
          |SELECT CAST(year(day) AS INT) AS yr, CAST(count(*) AS BIGINT)
          |   AS n_days,
          | CAST(max(peak) AS BIGINT) AS peak_cents,
          | CAST(max(peak - cents) AS BIGINT) AS max_drawdown_cents,
          | round(CAST(max(peak - cents) AS DOUBLE) / max(peak), 4)
          |   AS max_drawdown_share
          |FROM h GROUP BY 1""".stripMargin,

      "q226_join_estimate_audit" -> {
        def edge(name: String, left: String, lk: String,
            right: String, rk: String) =
          s"""SELECT '$name' AS join_edge,
             | CAST((SELECT count(*) FROM $left) AS BIGINT) AS n_left,
             | CAST((SELECT count(*) FROM $right) AS BIGINT) AS n_right,
             | CAST((SELECT count(DISTINCT $lk) FROM $left) AS BIGINT)
             |   AS ndv_left,
             | CAST((SELECT count(DISTINCT $rk) FROM $right) AS BIGINT)
             |   AS ndv_right,
             | CAST((SELECT sum(ca * cb) FROM
             |    (SELECT $lk AS k, CAST(count(*) AS BIGINT) AS ca
             |     FROM $left GROUP BY 1) la
             |    JOIN (SELECT $rk AS j, CAST(count(*) AS BIGINT) AS cb
             |     FROM $right GROUP BY 1) ra ON la.k = ra.j) AS BIGINT)
             |   AS actual_rows,
             | round(CAST((SELECT count(*) FROM $left) AS DOUBLE) *
             |    (SELECT count(*) FROM $right) /
             |    greatest((SELECT count(DISTINCT $lk) FROM $left),
             |      (SELECT count(DISTINCT $rk) FROM $right)), 2) AS est_rows,
             | round(CAST((SELECT count(*) FROM $left) AS DOUBLE) *
             |    (SELECT count(*) FROM $right) /
             |    greatest((SELECT count(DISTINCT $lk) FROM $left),
             |      (SELECT count(DISTINCT $rk) FROM $right)) /
             |    (SELECT sum(ca * cb) FROM
             |     (SELECT $lk AS k, CAST(count(*) AS BIGINT) AS ca
             |      FROM $left GROUP BY 1) la
             |     JOIN (SELECT $rk AS j, CAST(count(*) AS BIGINT) AS cb
             |      FROM $right GROUP BY 1) ra ON la.k = ra.j), 4)
             |   AS est_over_actual"""
        Seq(
          edge("lineitem*orders.orderkey", "lineitem", "l_orderkey",
            "orders", "o_orderkey"),
          edge("lineitem*part.partkey", "lineitem", "l_partkey",
            "part", "p_partkey"),
          edge("orders*customer.custkey", "orders", "o_custkey",
            "customer", "c_custkey"),
          edge("events*events.user_id", "events", "user_id",
            "events", "user_id"))
          .map(q => q.stripMargin.replace('\n', ' '))
          .mkString(" UNION ALL ")
      },

      "q228_reorder_gaps" ->
        """WITH g AS (SELECT o_custkey,
          |   date_diff('day',
          |     CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
          |       ORDER BY o_orderdate, o_orderkey) AS DATE),
          |     CAST(o_orderdate AS DATE)) AS gap_days
          |  FROM orders),
          |gs AS (SELECT c.c_mktsegment, g.o_custkey,
          |   CAST(g.gap_days AS BIGINT) AS gap_days
          |  FROM g JOIN customer c ON c.c_custkey = g.o_custkey
          |  WHERE g.gap_days IS NOT NULL)
          |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_gaps,
          | CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_repeat_customers,
          | round(avg(gap_days), 4) AS mean_gap_days,
          | round(quantile_cont(gap_days, 0.5), 4) AS p50_gap_days,
          | round(quantile_cont(gap_days, 0.9), 4) AS p90_gap_days
          |FROM gs GROUP BY c_mktsegment""".stripMargin,

      "q231_ivm_merge" ->
        """WITH o AS (SELECT o_orderpriority,
          |   CAST(round(o_totalprice) AS BIGINT) AS x,
          |   CASE WHEN o_orderdate < TIMESTAMP '2000-01-01' THEN 1 ELSE 0
          |     END AS st
          |  FROM orders),
          |a AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
          |   CAST(sum(x) AS BIGINT) AS s, CAST(sum(x * x) AS BIGINT) AS ss,
          |   CAST(sum(st) AS BIGINT) AS n_standing,
          |   CAST(sum(1 - st) AS BIGINT) AS n_delta
          |  FROM o GROUP BY o_orderpriority)
          |SELECT o_orderpriority, n AS n_orders, n_standing, n_delta,
          | round(CAST(s AS DOUBLE) / n, 4) AS mean_dollars,
          | round((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n, 4)
          |   AS var_dollars
          |FROM a""".stripMargin,

      "q232_skyline" ->
        """WITH p AS (SELECT p_partkey, p_size,
          |   CAST(round(p_retailprice * 100) AS BIGINT) AS cents FROM part),
          |lv AS (SELECT cents, max(p_size) AS lvl_max FROM p GROUP BY cents),
          |ex AS (SELECT cents, lvl_max,
          |   coalesce(max(lvl_max) OVER (ORDER BY cents
          |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          |     -2147483648) AS excl_max
          |  FROM lv)
          |SELECT p.p_partkey, round(CAST(p.cents AS DOUBLE) / 100.0, 2)
          |   AS price, p.p_size
          |FROM p JOIN ex ON p.cents = ex.cents
          |WHERE NOT (ex.excl_max >= p.p_size OR ex.lvl_max > p.p_size)"""
          .stripMargin,

      "q243_order_reconciliation" ->
        """WITH l AS (SELECT l_orderkey,
          |   CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
          |     * 100) AS BIGINT) AS lc FROM lineitem),
          |c AS (SELECT l_orderkey, CAST(sum(lc) AS BIGINT) AS calc_cents
          |  FROM l GROUP BY l_orderkey),
          |j AS (SELECT o.o_orderstatus,
          |   CAST(round(o.o_totalprice * 100) AS BIGINT) AS oc, c.calc_cents
          |  FROM orders o LEFT JOIN c ON o.o_orderkey = c.l_orderkey)
          |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
          | CAST(sum(CASE WHEN calc_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          |   AS n_no_lines,
          | CAST(sum(CASE WHEN oc = calc_cents THEN 1 ELSE 0 END) AS BIGINT)
          |   AS n_exact,
          | CASE WHEN count(*) - sum(CASE WHEN calc_cents IS NULL THEN 1
          |     ELSE 0 END) > 0 THEN
          |   round(CAST(sum(CASE WHEN calc_cents IS NOT NULL
          |       THEN abs(oc - calc_cents) ELSE 0 END) AS DOUBLE)
          |     / (count(*) - sum(CASE WHEN calc_cents IS NULL THEN 1 ELSE 0
          |       END)) / 100.0, 4) END AS mean_abs_err,
          | round(CAST(max(CASE WHEN calc_cents IS NOT NULL
          |     THEN abs(oc - calc_cents) END) AS DOUBLE) / 100.0, 2)
          |   AS max_abs_err
          |FROM j GROUP BY o_orderstatus""".stripMargin,

      "q252_market_share" ->
        """WITH li AS (SELECT l_orderkey, l_partkey, l_suppkey,
          |   CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
          |     AS cents FROM lineitem),
          |promo AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
          |asia AS (SELECT c.c_custkey FROM customer c
          |  JOIN nation n ON c.c_nationkey = n.n_nationkey
          |  JOIN region r ON n.n_regionkey = r.r_regionkey
          |  WHERE r.r_name = 'ASIA'),
          |ords AS (SELECT o.o_orderkey,
          |   CAST(year(o.o_orderdate) AS BIGINT) AS yr
          |  FROM orders o JOIN asia ON o.o_custkey = asia.c_custkey),
          |sn AS (SELECT s.s_suppkey, n.n_name AS supp_nation FROM supplier s
          |  JOIN nation n ON s.s_nationkey = n.n_nationkey),
          |rev AS (SELECT o.yr, sn.supp_nation,
          |   CAST(sum(li.cents) AS BIGINT) AS nc
          |  FROM li JOIN promo ON li.l_partkey = promo.p_partkey
          |  JOIN ords o ON li.l_orderkey = o.o_orderkey
          |  JOIN sn ON li.l_suppkey = sn.s_suppkey
          |  GROUP BY 1, 2),
          |tot AS (SELECT yr, CAST(sum(nc) AS BIGINT) AS tc FROM rev GROUP BY yr)
          |SELECT rev.yr AS year, rev.supp_nation,
          | round(CAST(rev.nc AS DOUBLE) / 100.0, 2) AS revenue,
          | round(CAST(rev.nc AS DOUBLE) / tot.tc, 6) AS mkt_share
          |FROM rev JOIN tot ON rev.yr = tot.yr""".stripMargin,

      "q257_brand_movers" ->
        """WITH li AS (SELECT l_partkey,
          |   CAST(date_diff('day', DATE '1970-01-01', l_shipdate) AS BIGINT)
          |     AS ed FROM lineitem),
          |b AS (SELECT (min(ed) + max(ed)) // 2 AS cut FROM li),
          |pb AS (SELECT p.p_brand,
          |   CAST(sum(CASE WHEN li.ed <= b.cut THEN 1 ELSE 0 END) AS BIGINT)
          |     AS k1,
          |   CAST(sum(CASE WHEN li.ed > b.cut THEN 1 ELSE 0 END) AS BIGINT)
          |     AS k2
          |  FROM li JOIN part p ON li.l_partkey = p.p_partkey, b
          |  GROUP BY p.p_brand),
          |t AS (SELECT CAST(sum(k1) AS BIGINT) AS n1,
          |   CAST(sum(k2) AS BIGINT) AS n2 FROM pb),
          |sc AS (SELECT pb.p_brand, pb.k1, pb.k2, t.n1, t.n2,
          |   CAST(pb.k1 AS DOUBLE) / t.n1 AS p1,
          |   CAST(pb.k2 AS DOUBLE) / t.n2 AS p2,
          |   CAST(pb.k1 + pb.k2 AS DOUBLE) / (t.n1 + t.n2) AS pp
          |  FROM pb, t)
          |SELECT p_brand, k1 AS n_early, k2 AS n_late,
          | round(p1, 6) AS share_early, round(p2, 6) AS share_late,
          | round((p1 - p2) / sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2)), 4)
          |   AS z_score,
          | (abs((p1 - p2) / sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2)))
          |   > 2.576) AS significant_01
          |FROM sc""".stripMargin,

      "q258_dead_stock" ->
        """WITH ls AS (SELECT l_partkey,
          |   CAST(max(date_diff('day', DATE '1970-01-01', l_shipdate))
          |     AS BIGINT) AS last_ed FROM lineitem GROUP BY l_partkey),
          |mx AS (SELECT max(last_ed) AS mx FROM ls),
          |aged AS (SELECT CAST(round(p.p_retailprice * 100) AS BIGINT) AS pc,
          |   CASE WHEN ls.last_ed IS NULL THEN 'never_sold'
          |    WHEN mx.mx - ls.last_ed <= 30 THEN '0030_active'
          |    WHEN mx.mx - ls.last_ed <= 60 THEN '0060_slowing'
          |    WHEN mx.mx - ls.last_ed <= 90 THEN '0090_slow'
          |    WHEN mx.mx - ls.last_ed <= 180 THEN '0180_stale'
          |    WHEN mx.mx - ls.last_ed <= 365 THEN '0365_dormant'
          |    ELSE '9999_dead' END AS age_bucket
          |  FROM part p LEFT JOIN ls ON p.p_partkey = ls.l_partkey, mx),
          |agg AS (SELECT age_bucket, CAST(count(*) AS BIGINT) AS n_parts,
          |   CAST(sum(pc) AS BIGINT) AS vc FROM aged GROUP BY age_bucket),
          |t AS (SELECT CAST(sum(n_parts) AS BIGINT) AS tp,
          |   CAST(sum(vc) AS BIGINT) AS tv FROM agg)
          |SELECT agg.age_bucket, agg.n_parts,
          | round(CAST(agg.vc AS DOUBLE) / 100.0, 2) AS catalog_value,
          | round(CAST(agg.n_parts AS DOUBLE) / t.tp, 4) AS part_share,
          | round(CAST(agg.vc AS DOUBLE) / t.tv, 4) AS value_share
          |FROM agg, t""".stripMargin,

      "q259_min_cost_supplier" ->
        """WITH parts AS (SELECT p_partkey, p_name FROM part
          |  WHERE p_type = 'STANDARD'),
          |ps AS (SELECT l_partkey, l_suppkey,
          |   (CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
          |      AS BIGINT) * 10000)
          |   // CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS unit_e4
          |  FROM lineitem JOIN parts ON l_partkey = p_partkey
          |  GROUP BY l_partkey, l_suppkey),
          |best AS (SELECT l_partkey AS bk, min(unit_e4) AS min_u
          |  FROM ps GROUP BY 1),
          |w AS (SELECT ps.l_partkey, best.min_u,
          |   min(ps.l_suppkey) AS s_suppkey
          |  FROM ps JOIN best ON ps.l_partkey = best.bk
          |   AND ps.unit_e4 = best.min_u
          |  GROUP BY 1, 2)
          |SELECT w.l_partkey AS p_partkey, parts.p_name, w.s_suppkey,
          | s.s_name, n.n_name AS supplier_nation,
          | CAST(w.min_u // 100 AS DOUBLE) / 10000.0 AS best_unit_price
          |FROM w JOIN parts ON w.l_partkey = parts.p_partkey
          | JOIN supplier s ON w.s_suppkey = s.s_suppkey
          | JOIN nation n ON s.s_nationkey = n.n_nationkey""".stripMargin,

      "q260_important_parts" ->
        """WITH pv AS (SELECT l_partkey,
          |   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
          |     AS BIGINT) AS v
          |  FROM lineitem GROUP BY 1),
          |sc AS (SELECT CAST(sum(v) AS BIGINT) AS tot,
          |   CAST(sum(v) AS BIGINT) // count(*) AS avg_c FROM pv)
          |SELECT pv.l_partkey AS p_partkey,
          | round(CAST(pv.v AS DOUBLE) / 100.0, 2) AS part_revenue,
          | round(CAST(pv.v AS DOUBLE) / sc.tot, 6) AS revenue_share,
          | round(CAST(pv.v AS DOUBLE) / sc.avg_c, 4) AS x_mean
          |FROM pv, sc WHERE pv.v * 2 > sc.avg_c * 3""".stripMargin,

      "q261_top_supplier" ->
        """WITH li AS (SELECT l_suppkey,
          |   CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
          |     AS c,
          |   CAST(date_diff('day', DATE '1970-01-01', l_shipdate) AS BIGINT)
          |     AS ed FROM lineitem),
          |mx AS (SELECT max(ed) AS mx FROM li),
          |rev AS (SELECT l_suppkey, CAST(sum(c) AS BIGINT) AS revc
          |  FROM li, mx WHERE li.ed >= mx.mx - 89 GROUP BY 1),
          |top AS (SELECT max(revc) AS best FROM rev)
          |SELECT s.s_suppkey, s.s_name,
          | round(CAST(rev.revc AS DOUBLE) / 100.0, 2) AS total_revenue
          |FROM rev, top
          | JOIN supplier s ON rev.l_suppkey = s.s_suppkey
          |WHERE rev.revc = top.best""".stripMargin,

      "q262_large_orders" ->
        """WITH big AS (SELECT l_orderkey,
          |   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
          |  FROM lineitem GROUP BY 1 HAVING total_qty > 250)
          |SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
          | o.o_totalprice, big.total_qty
          |FROM big JOIN orders o ON big.l_orderkey = o.o_orderkey
          | JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,

      "q263_disjunctive_revenue" ->
        """SELECT CAST(count(*) AS BIGINT) AS n_lines,
          | round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
          |     * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS revenue
          |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          |WHERE (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
          |    AND l.l_quantity BETWEEN 1 AND 20)
          |   OR (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 25
          |    AND l.l_quantity BETWEEN 10 AND 30)
          |   OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 35
          |    AND l.l_quantity BETWEEN 25 AND 45)""".stripMargin,

      "q264_return_risk" ->
        """WITH lost AS (SELECT o_custkey,
          |   CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
          |     AS BIGINT)) AS BIGINT) AS lostc
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |  WHERE l_returnflag = 'R' GROUP BY 1),
          |top AS (SELECT * FROM lost ORDER BY lostc DESC, o_custkey
          |  LIMIT 20)
          |SELECT c.c_custkey, c.c_name, n.n_name AS nation, c.c_acctbal,
          | round(CAST(t.lostc AS DOUBLE) / 100.0, 2) AS returned_revenue
          |FROM top t JOIN customer c ON t.o_custkey = c.c_custkey
          | JOIN nation n ON c.c_nationkey = n.n_nationkey""".stripMargin,

      "q274_constraint_audit" ->
        """WITH lc AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |   CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
          |     AS BIGINT) AS v1,
          |   CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
          |     AS BIGINT) AS v2,
          |   CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
          |     THEN 1 ELSE 0 END) AS BIGINT) AS v3,
          |   CAST(sum(CASE WHEN l_tax < 0 OR l_tax > 0.08
          |     THEN 1 ELSE 0 END) AS BIGINT) AS v4,
          |   CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R')
          |     THEN 1 ELSE 0 END) AS BIGINT) AS v5
          |  FROM lineitem),
          |cg AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |   CAST(sum(CASE WHEN mx <> nl OR mn <> 1 THEN 1 ELSE 0 END)
          |     AS BIGINT) AS v
          |  FROM (SELECT l_orderkey, count(*) AS nl,
          |     max(l_linenumber) AS mx, min(l_linenumber) AS mn
          |    FROM lineitem GROUP BY 1)),
          |sa AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |   CAST(sum(CASE WHEN l.l_shipdate < o.o_orderdate
          |     THEN 1 ELSE 0 END) AS BIGINT) AS v
          |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
          |SELECT rule, scope, violations, n_checked,
          | violations = 0 AS passed FROM (
          | SELECT 'quantity_positive' AS rule, 'lineitem' AS scope,
          |   v1 AS violations, n AS n_checked FROM lc
          | UNION ALL SELECT 'extendedprice_positive', 'lineitem', v2, n
          |   FROM lc
          | UNION ALL SELECT 'discount_in_[0,0.1]', 'lineitem', v3, n
          |   FROM lc
          | UNION ALL SELECT 'tax_in_[0,0.08]', 'lineitem', v4, n FROM lc
          | UNION ALL SELECT 'returnflag_domain', 'lineitem', v5, n FROM lc
          | UNION ALL SELECT 'linenumbers_contiguous', 'orders', v, n
          |   FROM cg
          | UNION ALL SELECT 'ship_after_order', 'lineitem', v, n
          |   FROM sa)""".stripMargin,

      "q281_binary_segmentation" ->
        """WITH d AS (SELECT event_type,
          |   CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          |     AS BIGINT) AS ed, CAST(count(*) AS BIGINT) AS x
          |  FROM events GROUP BY 1, 2),
          |r1 AS (SELECT event_type, ed, x,
          |   CAST(row_number() OVER (PARTITION BY event_type ORDER BY ed)
          |     AS BIGINT) AS rn,
          |   CAST(sum(x) OVER (PARTITION BY event_type ORDER BY ed
          |     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
          |   CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nseg,
          |   CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS sseg
          |  FROM d),
          |l1 AS (SELECT event_type, ed AS split_ed,
          |   abs(nseg * cum - rn * sseg) AS dev_num, nseg AS seg_days
          |  FROM r1 WHERE rn < nseg
          |  QUALIFY row_number() OVER (PARTITION BY event_type
          |    ORDER BY abs(nseg * cum - rn * sseg) DESC, ed ASC) = 1),
          |s2 AS (SELECT d.event_type,
          |   CASE WHEN d.ed <= l1.split_ed THEN 'L' ELSE 'R' END AS seg,
          |   d.ed, d.x
          |  FROM d JOIN l1 ON d.event_type = l1.event_type),
          |r2 AS (SELECT event_type, seg, ed, x,
          |   CAST(row_number() OVER (PARTITION BY event_type, seg
          |     ORDER BY ed) AS BIGINT) AS rn,
          |   CAST(sum(x) OVER (PARTITION BY event_type, seg ORDER BY ed
          |     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
          |   CAST(count(*) OVER (PARTITION BY event_type, seg) AS BIGINT)
          |     AS nseg,
          |   CAST(sum(x) OVER (PARTITION BY event_type, seg) AS BIGINT)
          |     AS sseg
          |  FROM s2),
          |l2 AS (SELECT event_type, seg, ed AS split_ed,
          |   abs(nseg * cum - rn * sseg) AS dev_num, nseg AS seg_days
          |  FROM r2 WHERE rn < nseg
          |  QUALIFY row_number() OVER (PARTITION BY event_type, seg
          |    ORDER BY abs(nseg * cum - rn * sseg) DESC, ed ASC) = 1)
          |SELECT event_type, CAST(1 AS BIGINT) AS level, 'all' AS segment,
          | split_ed, dev_num, seg_days FROM l1
          |UNION ALL
          |SELECT event_type, CAST(2 AS BIGINT), seg, split_ed, dev_num,
          | seg_days FROM l2 WHERE seg_days >= 2""".stripMargin,

      "q297_priority_exists" ->
        """WITH s AS (SELECT o.o_orderkey, o.o_orderpriority,
          |   CAST(max(CASE WHEN date_diff('day', o.o_orderdate,
          |      l.l_shipdate) > 60 THEN 1 ELSE 0 END) AS BIGINT)
          |     AS has_slow
          |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          |  GROUP BY 1, 2)
          |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
          | CAST(sum(has_slow) AS BIGINT) AS n_with_slow,
          | round(CAST(sum(has_slow) AS DOUBLE) / count(*), 4)
          |   AS slow_share
          |FROM s GROUP BY 1""".stripMargin,

      "q298_promo_share" ->
        """WITH li AS (SELECT strftime(l.l_shipdate, '%Y-%m') AS month,
          |   p.p_type = 'PROMO' AS is_promo,
          |   CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
          |     AS BIGINT) AS c
          |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
          |g AS (SELECT month,
          |   CAST(sum(CASE WHEN is_promo THEN c ELSE 0 END) AS BIGINT)
          |     AS promo_cents,
          |   CAST(sum(c) AS BIGINT) AS total_cents
          |  FROM li GROUP BY 1)
          |SELECT month,
          | round(CAST(promo_cents AS DOUBLE) / 100.0, 2) AS promo_revenue,
          | round(CAST(total_cents AS DOUBLE) / 100.0, 2) AS total_revenue,
          | round(promo_cents * 100.0 / total_cents, 4) AS promo_share_pct
          |FROM g""".stripMargin,

      "q90_scd2" ->
        """WITH marked AS (
          |  SELECT user_id, event_id, ts, event_type,
          |   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          |  FROM events),
          |runs AS (SELECT * FROM marked WHERE prev IS NULL OR prev <> event_type)
          |SELECT user_id, event_type, ts AS valid_from,
          | lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
          |FROM runs""".stripMargin,

      // the blocking prefix length replays the engine's corpus-adaptive
      // CASE from the same distinct-name count (round 16) — one rule,
      // two engines, no drift at any SF
      "q88_fuzzy_match" ->
        """WITH pl AS (SELECT CASE WHEN count(DISTINCT p_name) <= 10000 THEN 3
          |   WHEN count(DISTINCT p_name) <= 100000 THEN 4 ELSE 5 END AS n
          |  FROM part)
          |SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
          | round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS jw
          |FROM part a JOIN part b
          |  ON a.p_brand = b.p_brand
          |  AND substring(a.p_name, 1, (SELECT n FROM pl))
          |    = substring(b.p_name, 1, (SELECT n FROM pl))
          |  AND a.p_partkey < b.p_partkey
          |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.88
          |  AND round(jaro_winkler_similarity(a.p_name, b.p_name), 4) < 1.0""".stripMargin,

      "q87_lateral" -> lateralSql,

      "q86_map_funcs" ->
        """SELECT event_id,
          | 'type,uid,k' AS keys,
          | event_type AS type_val,
          | CAST(3 AS BIGINT) AS n_entries,
          | event_type || '|' || (props->>'$.k') AS non_uid_vals,
          | upper(event_type) || '|' || CAST(user_id AS VARCHAR) || '|'
          |   || (props->>'$.k') AS vals_up
          |FROM events""".stripMargin,
  )
}
