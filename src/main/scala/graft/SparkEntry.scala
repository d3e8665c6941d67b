package graft

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

/** Driver contract: one `queries` entry per implemented operator
  * (SURVEY.md §2 + §2.3 gap map + training-data extensions), each with a
  * DuckDB `oracleSql` twin where SQL-expressible.
  *
  * Oracle-parity conventions (the driver hash-compares after sorting columns
  * by name):
  *  - every computed column is aliased identically on both sides;
  *  - aggregated doubles are `round`ed (sum → 2dp, avg/ratio → 4dp,
  *    similarity → 6dp) so partial-aggregation order can't flip a bit;
  *  - integer-ish aggregates are pinned to BIGINT on both sides (DuckDB
  *    `sum(int)` returns HUGEINT, Spark returns long);
  *  - classifier/lexicon SQL is *generated from the same Scala constants*
  *    as the Spark expressions, so the two sides can't drift.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Exclusive prefix sum (`prev_cum`) of `value` over `key` order for a
    * KEY-CARDINALITY-sized table (language quotas: a handful of rows) —
    * as a triangular self-join instead of a partition-less window. Same
    * values as `sum(value) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING
    * AND -1)`, but declarative: no `WindowExec` single-partition stage
    * (and no its unbounded-data warning) anywhere in the plan. The L²
    * pair fan-out is bounded by the key cardinality squared — trivial for
    * any real language/source/phase dimension. */
  private def prevCumByKey(counts: DataFrame, key: String, value: String): DataFrame =
    counts.select(col(key), col(value)).as("a")
      .join(counts.select(col(key).as("_bk"), col(value).as("_bv")).as("b"),
        col("_bk") < col(key), "left")
      .groupBy(col(key))
      .agg(coalesce(sum(col("_bv")), lit(0L)).as("prev_cum"))

  /** The reference's shipped memo-cache fixture (q122). Overridable via
    * GRAFT_REF_CACHE so the query is runnable outside this machine layout;
    * the same resolved path feeds both the engine parse and the DuckDB
    * oracle's read_text, so the two sides cannot diverge. */
  private[graft] def refCachePath: String =
    sys.env.getOrElse("GRAFT_REF_CACHE", "/root/reference/.analysis_cache.json")

  // ----------------------------------------------------------------
  // Oracle SQL fragments generated from the shared constants
  // ----------------------------------------------------------------
  private val fillerList = Lexicons.FillerValues.map(v => s"'$v'").mkString(", ")

  /** DuckDB twin of TextExprs.cleanText (note the 'g' flags: DuckDB
    * regexp_replace is first-match-only by default, Spark replaces all). */
  private def cleanSql(e: String): String =
    s"trim(regexp_replace(regexp_replace(trim(coalesce($e, '')), '[\\x{10000}-\\x{10FFFF}]', '', 'g'), '\\s+', ' ', 'g'))"

  private def isFillerSql(e: String): String =
    s"lower(trim(coalesce($e, ''))) IN ($fillerList)"

  /** Benford first-digit shares log10(1 + 1/d), pinned to 10 dp — shared
    * by q230's Spark side and its generated DuckDB twin (the lexicon-twin
    * pattern: both engines compare against the SAME literals). */
  private[graft] val benfordShares: Seq[(Int, Double)] = (1 to 9).map(d =>
    d -> BigDecimal(math.log10(1 + 1.0 / d))
      .setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble)

  /** q239's truncated-EWMA kernel: weight for lag j (1 = yesterday) is
    * 7^(j−1)·8^(12−j) — the geometric (7/8)^(j−1) decay scaled by 8^11 so
    * every weight is an exact LONG and the whole baseline stays integer
    * until the final display division (the lexicon-twin pattern: the same
    * literals are injected into the DuckDB oracle as a VALUES list). */
  private[graft] val ewmaWeights: Seq[(Int, Long)] = (1 to 12).map { j =>
    def ipow(b: Long, e: Int): Long = (0 until e).foldLeft(1L)((a, _) => a * b)
    j -> ipow(7, j - 1) * ipow(8, 12 - j)
  }

  /** q291's SPRT constants, ×10⁹-pinned to exact LONGs (the q249 scaled-log
    * trick): per-success and per-failure log-likelihood-ratio increments for
    * H0 p=0.19 vs H1 p=0.21, and the Wald boundaries ±ln(19) for
    * α = β = 0.05. Shared with the generated DuckDB twin so both engines
    * accumulate identical integers. */
  private[graft] val sprtL1: Long =
    math.round(math.log(0.21 / 0.19) * 1e9)
  private[graft] val sprtL2: Long =
    math.round(math.log((1 - 0.21) / (1 - 0.19)) * 1e9)
  private[graft] val sprtBound: Long = math.round(math.log(19.0) * 1e9)

  /** q241's engine-neutral minhash permutation constants: 52-bit XOR mixers
    * derived from md5 so BOTH engines block with the same scheme (unlike
    * the production path's Murmur3 `MinHashExprs`, which DuckDB cannot
    * reproduce — this audit measures the SCHEME's blocking quality with a
    * portable twin). */
  private[graft] val blockPerms: Seq[(Int, Long)] = (0 until 32).map { p =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"graft-perm-$p".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    p -> java.lang.Long.parseLong(hex.take(13), 16)
  }

  /** q241's band geometries under audit: the same 32 permutations regrouped
    * as (bands × rows/band) — recall falls and precision rises with
    * rows/band; the audit prices that tradeoff on real data. */
  private[graft] val blockGeometries: Seq[(Int, Int)] =
    Seq((16, 2), (8, 4), (4, 8))

  /** q247's weekday labels for epoch-day mod 7 (1970-01-01 was a
    * Thursday) — shared with the generated DuckDB twin so neither engine
    * consults its own (mutually incompatible) dayofweek numbering. */
  private[graft] val dowLabels: Seq[String] = Seq(
    "Thu", "Fri", "Sat", "Sun", "Mon", "Tue", "Wed")

  /** DuckDB twin of TextExprs.tokenCount — empty tokens dropped, so the
    * whole suite shares ONE token-counting convention. */
  private def tokenCountSql(e: String): String =
    s"CAST(len(list_filter(string_split(lower(${cleanSql(e)}), ' '), t -> t <> '')) AS BIGINT)"

  /** DuckDB twin of Spark's `conv(substring(h, 1, 13), 16, 10)`: decode the
    * first 13 hex nibbles of column `h` positionally (the q28 strpos-on-hex
    * pattern). 13 nibbles = 52 bits, exactly representable as DOUBLE. */
  private val hexNum13: String = (1 to 13).map(i =>
    s"(strpos('0123456789abcdef', substring(h, $i, 1)) - 1) * ${1L << (4 * (13 - i))}")
    .mkString(" + ")

  private def sentimentSql(filler: String, low: String): String =
    s"CASE WHEN $filler THEN 'Neutral' " +
      s"WHEN regexp_matches($low, '${Lexicons.positiveAlt}') AND regexp_matches($low, '${Lexicons.negativeAlt}') THEN 'Mixed' " +
      s"WHEN regexp_matches($low, '${Lexicons.positiveAlt}') THEN 'Positive' " +
      s"WHEN regexp_matches($low, '${Lexicons.negativeAlt}') THEN 'Negative' " +
      s"ELSE 'Neutral' END"

  private def categorySql(filler: String, low: String): String =
    s"CASE WHEN $filler THEN 'No Feedback' " +
      Lexicons.categoryAlts.map { case (c, alt) =>
        s"WHEN regexp_matches($low, '$alt') THEN '$c' "
      }.mkString +
      "ELSE 'General' END"

  private def hitSql(e: String, pattern: String): String =
    s"len(regexp_extract_all(lower(coalesce($e, '')), '$pattern'))"

  /** Shared CTE prefix for shingle-based dedup oracles (3-gram shingles of
    * the cleaned text, distinct, docs with >= 3 tokens). */
  private def shingleCte: String =
    s"""WITH docs AS (SELECT doc_id, string_split(${cleanSql("text")}, ' ') AS toks FROM documents),
       |sh AS (SELECT doc_id,
       |         list_distinct(list_transform(range(1, len(toks) - 1),
       |           i -> array_to_string(toks[i:i+2], ' '))) AS s
       |       FROM docs WHERE len(toks) >= 3)""".stripMargin

  private def jaccardSql(a: String, b: String): String =
    s"len(list_intersect($a, $b)) * 1.0 / len(list_distinct(list_concat($a, $b)))"

  // ----------------------------------------------------------------
  // Queries
  // ----------------------------------------------------------------

  /** Flagship: the reference's summary dataflow (clean → classify → group →
    * pivot) over the documents corpus. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q22_summary_pivot")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(

    // ---- relational core (SURVEY.md §2.3 gap map, TPC-H-ish) ----

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

    // ---- survey pipeline operators over the documents corpus ----

    "q20_clean_filler" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextExprs.cleanText(col("text")).as("clean_text"),
        TextExprs.isFiller(col("text")).as("is_filler"))
    }),

    "q21_classify_demo" -> ((s, dir) => {
      TextExprs.withClassification(t(s, dir, "documents"), col("text"), "_cls")
        .select(col("doc_id"),
          col("_cls.sentiment").as("sentiment"),
          col("_cls.category").as("category"))
    }),

    "q22_summary_pivot" -> ((s, dir) => {
      TextExprs.withClassification(t(s, dir, "documents"), col("text"), "_cls")
        .select(col("source").as("Product"), col("lang").as("Question"),
          col("_cls.sentiment").as("Sentiment"))
        .groupBy("Product", "Question")
        .pivot("Sentiment", Lexicons.SentimentOrder)
        .count()
        .na.fill(0, Lexicons.SentimentOrder)
    }),

    "q23_explode_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(TextExprs.cleanText(col("text")), " ")).as("token"))
        .where(col("token") =!= "")
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
    }),

    "q33_survey_wide" -> ((s, dir) => {
      // flagship reference parity: survey-shaped frame → explode(products) →
      // staged classify → wide triplet columns (O5/O6/O8/O9/O10)
      val survey = t(s, dir, "documents").select(
        col("doc_id").cast("string").as("Email"),
        col("source").as("Name"),
        concat_ws(",", col("source"), col("lang")).as("Products"),
        col("text").as("Q Feedback"))
      SurveyPipeline.analyzeWide(survey, "retail", idCol = Some(col("Email")))
    }),

    // ---- text analysis (training-data extensions) ----

    "q24_lang_id" -> ((s, dir) => {
      TextExprs.withLangId(t(s, dir, "documents"), col("text"), "lang_pred")
        .select("doc_id", "lang", "lang_pred")
    }),

    "q25_text_profile" -> ((s, dir) => {
      // staged: projection 1 = one scan per feature, projection 2 = ratios
      val text = col("text")
      val base = t(s, dir, "documents").select(
        col("doc_id"),
        length(TextExprs.cleanText(text)).cast("int").as("n_chars"),
        TextExprs.tokenCountWs(text).as("n_tokens_ws"),
        TextExprs.tokenCountBpe(text).as("n_tokens_bpe"),
        TextExprs.punctCount(text).as("_np"),
        TextExprs.stopwordCount(text).as("_ns"))
      val nChars = col("n_chars"); val nTokens = col("n_tokens_ws")
      base.select(
        col("doc_id"), nChars, nTokens, col("n_tokens_bpe"),
        round(when(nTokens === 0, 0.0).otherwise(nChars.cast("double") / nTokens), 4).as("avg_token_len"),
        round(when(nChars === 0, 0.0).otherwise(col("_np").cast("double") / nChars), 4).as("punct_ratio"),
        round(when(nTokens === 0, 0.0).otherwise(col("_ns").cast("double") / nTokens), 4).as("stopword_ratio"),
        TextAnalysis.qualityScoreFromCounts(nChars, nTokens, col("_np")).as("quality"))
    }),

    // ---- dedup (training-data extensions) ----

    "q26_dedup_exact" -> ((s, dir) => {
      Dedup.exactGroups(t(s, dir, "documents"), col("doc_id"), col("text"))
    }),

    "q27_minhash_neardup" -> ((s, dir) => {
      Dedup.minhashNearDups(t(s, dir, "documents"), col("doc_id"), col("text"),
          shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.7)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    "q28_simhash_neardup" -> ((s, dir) => {
      // oracle-exact variant: md5-feature signatures + 8-band blocking is
      // EXACT for hamming <= 7 (pigeonhole), so the DuckDB brute-force
      // twin hash-matches the full pair set
      Dedup.simhashNearDupsExact(t(s, dir, "documents"), col("doc_id"), col("text"),
        maxHamming = 7, shingleLen = 3)
    }),

    "q29_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), col("doc_id"), col("text"),
          shingleLen = 3, threshold = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // ---- similarity search (training-data extensions) ----

    "q30_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("id"), col("embedding").as("v"))
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      Similarity.bruteForceTopK(queries, corpus, 5)
        .select(col("query_id"), col("corpus_id"),
          round(col("cos"), 6).as("cos"), col("rank").cast("long").as("rnk"))
    }),

    "q31_ivf_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("id"), col("embedding").as("v"))
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      Similarity.ivfTopK(queries, corpus, 5, nCells = 16, nProbe = 4)
        .select(col("query_id"), col("corpus_id"),
          round(col("cos"), 6).as("cos"), col("rank").cast("long").as("rnk"))
    }),

    // ---- multimodal plumbing (training-data extensions) ----

    "q32_media_meta" -> ((s, dir) => {
      Multimodal.decodeMeta(Multimodal.packFake(t(s, dir, "documents"))).toDF()
    }),

    // ---- round 2 additions ----

    "q34_embed_neardup" -> ((s, dir) => {
      // random-hyperplane LSH buckets (8 deterministic planes) + exact
      // cosine verify — the embedding-space analog of q27's minhash LSH
      Dedup.embeddingNearDups(t(s, dir, "embeddings"), col("vec_id"), col("embedding"),
          threshold = 0.35, nPlanes = 8, dim = 64)
        .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
    }),

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

    "q36_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
    }),

    "q37_percentile" -> ((s, dir) => {
      // exact interpolated percentiles (not the sketch — q39 has that).
      // ONE array-argument percentile aggregate: a single sorted buffer per
      // group serves all four cut points (four scalar aggregates would each
      // buffer + sort the group's values independently)
      t(s, dir, "orders").groupBy("o_orderpriority")
        .agg(expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.99D))").as("_p"))
        .select(col("o_orderpriority"),
          round(element_at(col("_p"), 1), 4).as("p25"),
          round(element_at(col("_p"), 2), 4).as("p50"),
          round(element_at(col("_p"), 3), 4).as("p75"),
          round(element_at(col("_p"), 4), 4).as("p99"))
    }),

    "q38_summary_unpivot" -> ((s, dir) => {
      // reference O11-O13 end-to-end: multi-question wide frame → unpivot
      // (melt *_Sentiment) → group-count → fixed-order pivot
      val survey = t(s, dir, "documents").select(
        col("doc_id").cast("string").as("Email"),
        col("source").as("Name"),
        concat_ws(",", col("source"), col("lang")).as("Products"),
        col("text").as("Q Feedback"),
        substring(col("text"), 1, 80).as("Q Short"))
      SurveyPipeline.buildSummary(
        SurveyPipeline.analyzeWide(survey, "retail", idCol = Some(col("Email"))))
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

    "q39_sketches" -> ((s, dir) => {
      // approximate sketches (HLL++ distinct, KLL-style quantile), made
      // oracle-checkable via engine-neutral VERDICT rows: each engine runs
      // ITS OWN sketch (Spark HLL++ here, DuckDB HLL in the twin) and
      // reports whether it lands within a band of ITS OWN exact answer. The
      // distinct-count band is 15% = 3x Spark's default HLL++ rsd (5%, one
      // sigma): at 1 sigma a near-threshold group could legally land inside
      // the band in one engine and outside in the other; at 3 sigma both
      // engines' estimates sit comfortably inside. The quantile band stays
      // 5%: percentile_approx at accuracy 10000 has ~1e-4 rank error. The
      // sketches never have to agree bit-for-bit — only the accuracy
      // verdict and the exact columns are compared, which is the portable
      // contract an approximate operator actually offers. The exact median
      // comes from the rank-dataflow percentile (no per-group buffering —
      // the buffering `percentile` aggregate was the slowest query in the
      // whole suite at sf0.1 and collapses entirely at 100 TB).
      // Three SEPARATE aggregations joined on the tiny group key: mixing a
      // DISTINCT aggregate with imperative sketch buffers in one groupBy
      // plans Expand + a sort-aggregate fallback (measured 4.2 s vs 1.1 s
      // summed for the split at sf0.1) — each piece alone stays a hash agg.
      val ev = t(s, dir, "events")
      val p50x = graft.operators.Percentiles
        .exactByGroup(ev, col("event_type"), col("value"), Seq(0.5), Seq("_p50x"))
        .withColumnRenamed("group", "event_type")
      val exactUsers = ev.groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("exact_users"))
      ev.groupBy("event_type").agg(
          approx_count_distinct(col("user_id")).as("_au"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("_p50a"),
          count(lit(1)).as("n"))
        .join(broadcast(exactUsers), "event_type") // one row per group
        .join(broadcast(p50x), "event_type")
        .select(col("event_type"), col("exact_users"),
          (abs(col("_au") - col("exact_users"))
            <= col("exact_users").cast("double") * 0.15).as("users_within_15pct"),
          (abs(col("_p50a") - col("_p50x"))
            <= abs(col("_p50x")) * 0.05).as("p50_within_5pct"),
          col("n"))
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

    "q44_curate" -> ((s, dir) => {
      // THE capstone composition: raw docs → profile → filter → exact dedup
      // → near-dup removal = curated training corpus (operators/Curate)
      graft.operators.Curate.curate(t(s, dir, "documents"), col("doc_id"), col("text"),
        minQuality = 0.5, langs = Seq("en"), nearDupThreshold = 0.7)
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
      val docs = t(s, dir, "documents")
        .select(col("doc_id").as("id"), TextExprs.cleanText(col("text")).as("cln"))
        .select(col("id"), col("cln"), split(col("cln"), " ").as("toks"))
        .select(col("id"), col("cln"),
          array_min(Dedup.shinglesOfToks(col("toks"), 3)).as("blk"))
        .where(col("blk").isNotNull)
        // cache(), not localCheckpoint: this pin carries the FULL text
        // column (levenshtein reads it on both verify sides), and
        // columnar-compressed cache holds it 3.5x cheaper than eager
        // row-serialized checkpoint blocks (measured 0.6 vs 2.1 s)
        .cache()
      val keys = docs.select(col("blk"), col("id"))
      val candidates = keys.as("l").join(keys.as("r"), Seq("blk"))
        .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
        .where(col("id_a") < col("id_b"))
        .distinct()
      candidates
        .join(docs.select(col("id").as("id_a"), col("cln").as("cln_a")), "id_a")
        .join(docs.select(col("id").as("id_b"), col("cln").as("cln_b")), "id_b")
        // length-difference lower bound (|len(a)-len(b)| > k implies
        // edit_dist > k) + the banded threshold DP (O(n*k), returns -1
        // above the bound) — result set provably unchanged
        .where(abs(length(col("cln_a")) - length(col("cln_b"))) <= 40)
        .select(col("id_a"), col("id_b"),
          levenshtein(col("cln_a"), col("cln_b"), 40).as("edit_dist"))
        .where(col("edit_dist") >= 0)
    }),

    "q41_frame_sample" -> ((s, dir) => {
      // multimodal frame-extraction shape: binary payload → executor-side
      // decode (stubbed deterministic codec) → per-frame explode
      Multimodal.sampleFrames(
        Multimodal.decodeMeta(Multimodal.packFake(t(s, dir, "documents"))), stride = 30)
    }),

    // ---- round 3 additions ----

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

    "q50_stats_agg" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qp"),
        round(covar_samp("l_quantity", "l_extendedprice"), 2).as("covar_qp"),
        round(covar_pop("l_quantity", "l_extendedprice"), 2).as("covar_pop_qp"),
        round(stddev_samp("l_extendedprice"), 2).as("sd_price"),
        round(var_samp("l_quantity"), 4).as("var_qty"),
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("intercept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"))
    }),

    "q51_tfidf" -> ((s, dir) => {
      Retrieval.tfidfTopK(t(s, dir, "documents"), col("doc_id"), col("text"), k = 3)
    }),

    "q52_bm25" -> ((s, dir) => {
      Retrieval.bm25(t(s, dir, "documents"), col("doc_id"), col("text"),
        terms = Seq("spark", "vector", "stream"))
    }),

    "q53_dedup_clusters" -> ((s, dir) => {
      // near-dup pairs → connected components → dedup clusters: the
      // post-pass that turns q27's pair list into keep/drop groups
      val pairs = Dedup.minhashNearDups(t(s, dir, "documents"), col("doc_id"), col("text"),
        shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.7)
      val cc = Dedup.connectedComponents(pairs.select("id_a", "id_b"))
      val sizes = cc.groupBy("component").agg(count(lit(1)).as("cluster_size"))
      cc.join(sizes, "component")
        .select(col("node").as("doc_id"), col("component").as("cluster_id"),
          col("cluster_size"))
    }),

    "q54_histogram" -> ((s, dir) => {
      // fixed-width histogram binning (floor arithmetic — engine-portable)
      t(s, dir, "orders")
        .select(floor(col("o_totalprice") / 25000.0).cast("long").as("bucket"),
          col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("sum_price"),
          round(min("o_totalprice"), 2).as("min_price"),
          round(max("o_totalprice"), 2).as("max_price"))
    }),

    "q55_col_profile" -> ((s, dir) => {
      Profiler.profile(t(s, dir, "orders"), ordersProfile)
    }),

    "q56_stratified_sample" -> ((s, dir) => {
      // deterministic stratified sampling: md5-keyed order within each
      // stratum = a reproducible pseudo-random draw, identical on any engine
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(md5(col("o_orderkey").cast("string")), col("o_orderkey"))
      t(s, dir, "orders").select(col("o_orderpriority"), col("o_orderkey"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 20)
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

    // ---- round 5 additions ----

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

    "q65_token_entropy" -> ((s, dir) => {
      // corpus vocabulary statistics per source: Shannon entropy of the
      // token distribution (H = ln N − Σ c·ln c / N — one pass over the
      // (source, token) counts) and type-token ratio
      val tok = t(s, dir, "documents")
        .select(col("source"), lower(TextExprs.cleanText(col("text"))).as("cln"))
        .select(col("source"), explode(split(col("cln"), " ")).as("token"))
        .where(col("token") =!= "")
      tok.groupBy("source", "token").agg(count(lit(1)).as("c"))
        .groupBy("source").agg(
          sum("c").as("n_tokens"),
          count(lit(1)).as("vocab"),
          round(log(sum("c")) - sum(col("c") * log(col("c"))) / sum("c"), 6).as("entropy"),
          round(count(lit(1)).cast("double") / sum("c"), 6).as("ttr"))
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

    "q67_winnow" -> ((s, dir) => {
      // winnowing (MOSS) fingerprints — sublinear near-dup signatures with
      // a guaranteed-match window; see Dedup.winnowFingerprints
      Dedup.winnowFingerprints(t(s, dir, "documents"), col("doc_id"), col("text"),
        gramLen = 3, window = 4)
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

    "q70_pii_redact" -> ((s, dir) => {
      // PII audit + redaction (operators.Privacy). The corpus is PII-free,
      // so deterministic synthetic PII is spliced in — built by the exact
      // same expression in the DuckDB twin, so the redaction rules (not the
      // synthesis) are what the hash compares.
      val withPii = t(s, dir, "documents").select(col("doc_id"),
        concat(substring(col("text"), 1, 60),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com or +1-555-01"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0"),
          lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
          lit(".7")).as("raw"))
      graft.operators.Privacy.redactAudit(withPii, col("doc_id"), col("raw"))
        .withColumnRenamed("id", "doc_id")
    }),

    "q71_decontaminate" -> ((s, dir) => {
      // benchmark decontamination: training docs sharing any 8-token gram
      // with the (broadcast) benchmark slice — operators.Decontaminate
      val docs = t(s, dir, "documents")
      graft.operators.Decontaminate.report(
          train = docs.where(col("doc_id") % 20 =!= 0),
          bench = docs.where(col("doc_id") % 20 === 0),
          id = col("doc_id"), text = col("text"), n = 8)
        .withColumnRenamed("id", "doc_id")
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

    "q74_zscore" -> ((s, dir) => {
      // two-pass outlier detection: per-type moments, broadcast back, flag
      // |z| > 2.5 — no window over the full log, scales as one agg + one map
      val ev = t(s, dir, "events")
      val stats = ev.groupBy("event_type")
        .agg(avg("value").as("_mu"), stddev_samp("value").as("_sd"))
      ev.join(broadcast(stats), "event_type")
        .where(abs((col("value") - col("_mu")) / col("_sd")) > 2.5)
        .select(col("event_id"), col("event_type"),
          round((col("value") - col("_mu")) / col("_sd"), 4).as("z"))
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

    "q78_kmeans" -> ((s, dir) => {
      // fixed-iteration Lloyd k-means over embeddings (semantic-clustering
      // curation pass); oracle generated for the same (k, iters) by
      // KMeansOp.oracleSql
      graft.operators.KMeansOp.kmeans(t(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), k = 4, iters = 2)
        .withColumnRenamed("id", "vec_id")
    }),

    "q79_quality_rules" -> ((s, dir) => {
      // Gopher-style hard keep/drop rule layer (oracle generated from the
      // same constants by TextAnalysis.gopherRulesOracleSql)
      TextAnalysis.gopherRules(t(s, dir, "documents"), col("doc_id"), col("text"))
        .withColumnRenamed("id", "doc_id")
    }),

    "q80_repetition" -> ((s, dir) => {
      // repetition profile: top-unigram / top-bigram frequency share — the
      // Gopher duplication-rule statistic for machine-generated-text spikes
      TextAnalysis.repetitionProfile(t(s, dir, "documents"), col("doc_id"), col("text"))
        .withColumnRenamed("id", "doc_id")
    }),

    "q81_mix_sample" -> ((s, dir) => {
      // deterministic dataset-mixing sampler: per-language acceptance rates
      // applied via an md5 hex draw compared against a hex threshold STRING
      // (lexicographic = numeric for fixed-width lowercase hex) — fully
      // engine-neutral, no float parsing, reproducible on any cluster
      val w = when(col("lang") === "en", lit("g")) // accept all
        .when(col("lang").isin("es", "fr"), lit("80000000"))
        .when(col("lang") === "de", lit("40000000"))
        .otherwise(lit("20000000"))
      t(s, dir, "documents")
        .where(substring(md5(col("doc_id").cast("string")), 1, 8) < w)
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    "q82_nfc_normalize" -> ((s, dir) => {
      // Unicode NFC normalization — native expression (plans.NfcNormalize,
      // also registered as the SQL function nfc_normalize). The corpus is
      // ASCII, so decomposed sequences are spliced in identically on both
      // engines; codepoint lengths expose the composition.
      // decomposed by construction: combining acute after "cafe",
      // combining cedilla after "prec" -- NFC composes both; the
      // eszett is untouched
      val raw = concat(substring(col("text"), 1, 20),
        lit(" cafe\u0301 prec\u0327o stra\u00dfe"))
      t(s, dir, "documents").select(
        col("doc_id"),
        graft.plans.NfcNormalize.nfc(raw).as("nfc"),
        length(raw).cast("long").as("len_raw"),
        length(graft.plans.NfcNormalize.nfc(raw)).cast("long").as("len_nfc"))
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

    "q93_seq_pack" -> ((s, dir) => {
      // sequence packing for pretraining exports: documents in a stable
      // global order are assigned to fixed-token-budget packs,
      // pack = floor(tokens_before_this_doc / budget) — the greedy
      // "sequence rolls over where the budget ran out" rule. The global
      // cumulative token count comes from GlobalRank.withRunningSum (range
      // exchange + per-partition value offsets), NOT a single-partition
      // `sum OVER (ORDER BY)` window — at 100 TB the prefix sum is the
      // whole job, and this dataflow keeps it partition-parallel.
      val budget = 2048.0
      val docs = t(s, dir, "documents").select(col("doc_id"),
        size(split(TextExprs.cleanText(col("text")), " ")).cast("long").as("n_toks"))
      graft.operators.GlobalRank
        .withRunningSum(docs, Seq(col("doc_id").asc), col("n_toks"), "cum_toks")
        .select(col("doc_id"), col("n_toks"), col("cum_toks"),
          floor((col("cum_toks") - col("n_toks")).cast("double") / budget)
            .cast("long").as("pack_id"))
    }),

    "q94_seq_pack_split" -> ((s, dir) => {
      // sequence packing, first-fit-WITH-splitting: every pack holds
      // EXACTLY `budget` tokens (except the trailing one) — a document
      // whose global token span [start, end) crosses pack boundaries is
      // split into one segment per pack it touches, the real pretraining
      // packer contract (q93 is the roll-over variant where docs stay
      // whole). On top of the same distributed prefix sum: each doc's
      // touched packs are start DIV B .. (end-1) DIV B — one sequence()
      // + explode, no second shuffle; segment arithmetic is pure
      // projection. Integer division throughout (DIV here, // in the
      // DuckDB twin) so the math is exact at any corpus size.
      val budget = 2048L
      val docs = t(s, dir, "documents").select(col("doc_id"),
        size(split(TextExprs.cleanText(col("text")), " ")).cast("long").as("n_toks"))
      val spans = graft.operators.GlobalRank
        .withRunningSum(docs, Seq(col("doc_id").asc), col("n_toks"), "cum_toks")
        .where(col("n_toks") > 0) // 0-token doc touches no pack (and would
                                  // make sequence() descend — see guard note)
        .select(col("doc_id"),
          (col("cum_toks") - col("n_toks")).as("_beg"), col("cum_toks").as("_end"))
        .withColumn("_first", expr(s"_beg DIV $budget"))
        .withColumn("_last", expr(s"(_end - 1) DIV $budget"))
      spans
        .select(col("doc_id"), col("_beg"), col("_end"), col("_first"),
          explode(sequence(col("_first"), col("_last"))).as("pack_id"))
        .select(col("doc_id"), col("pack_id"),
          (col("pack_id") - col("_first")).as("seg_idx"),
          (greatest(col("_beg"), col("pack_id") * budget) - col("_beg")).as("tok_offset"),
          (least(col("_end"), (col("pack_id") + 1) * budget)
            - greatest(col("_beg"), col("pack_id") * budget)).as("seg_toks"))
    }),

    "q95_chunk" -> ((s, dir) => {
      // RAG/embedding-export chunking: fixed-size token windows (64) with
      // stride overlap (48) — one row per (doc, chunk), the export unit an
      // embedding index or context-window packer consumes. Pure PER-DOC
      // computation: split → sequence-of-starts → explode → slice, no
      // shuffle anywhere; the whole operator is one codegen'd stage, so at
      // 100 TB it runs at scan speed and partitions stay wherever the
      // source put them. sequence(0, n-1, S) is safe: n = size(split) >= 1
      // (the 0-token descending-sequence trap cannot fire).
      val W = 64L; val S = 48L
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), split(TextExprs.cleanText(col("text")), " ").as("toks"))
        .withColumn("n", size(col("toks")).cast("long"))
      toks
        .select(col("doc_id"), col("toks"), col("n"),
          explode(sequence(lit(0L), col("n") - 1, lit(S))).as("tok_start"))
        .select(col("doc_id"),
          expr(s"tok_start DIV $S").as("chunk_idx"),
          col("tok_start"),
          least(lit(W), col("n") - col("tok_start")).as("chunk_toks"),
          concat_ws(" ", slice(col("toks"),
            (col("tok_start") + 1).cast("int"), lit(W.toInt))).as("chunk_text"))
    }),

    "q96_temperature_mix" -> ((s, dir) => {
      // Temperature-based dataset mixing (the multilingual-pretraining
      // sampler: per-language quota ∝ count^(1/T), T=2, which upsamples
      // tail languages relative to proportional sampling), with the
      // WHICH-docs choice made by an md5 draw so the selected set is
      // deterministic and engine-neutral. Every number is integer:
      // w = floor(sqrt(cnt)) is the same correctly-rounded IEEE sqrt in
      // any engine, quota = K*w DIV sum(w) is integer division — no
      // float-boundary can flip a doc in or out of the sample.
      // Scale shape: per-language rank comes from the GlobalRank range
      // exchange over (lang, draw, doc_id) — NOT a per-group window,
      // whose dominant language would concentrate in ONE task at 100 TB.
      // Each language's rank base is its predecessors' cumulative count
      // (counts is language-cardinality-sized; its window is driver-tiny),
      // and the lang→(base, quota) table is broadcast.
      val K = 200L
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          md5(col("doc_id").cast("string")).as("_draw"))
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
        .withColumn("w", floor(sqrt(col("cnt"))).cast("long"))
      val quota = counts
        .join(prevCumByKey(counts, "lang", "cnt"), "lang")
        .crossJoin(broadcast(counts.agg(sum("w").as("wsum"))))
        .withColumn("quota", expr(s"($K * w) DIV wsum"))
        .select("lang", "prev_cum", "quota")
      GlobalRank.withRowNumber(docs,
          Seq(col("lang").asc, col("_draw").asc, col("doc_id").asc), "_grn")
        .join(broadcast(quota), "lang")
        .withColumn("lrank", col("_grn") - col("prev_cum"))
        .where(col("lrank") <= col("quota"))
        .select(col("doc_id"), col("lang"), col("source"), col("lrank"))
    }),

    "q97_span_dedup" -> ((s, dir) => {
      // Exact duplicated-substring detection (Lee et al. 2022) — see
      // operators/SpanDedup.scala for the full design rationale (two
      // recompute passes, pushed-down semi-join, no persisted footprint;
      // PlanSpec-locked). ScaleProbe's span mode stress-verifies the
      // dataflow on a replicated corpus where EVERY window is duplicated.
      graft.operators.SpanDedup
        .perDocDupShare(t(s, dir, "documents"), col("doc_id"), col("text"), 30)
        .withColumnRenamed("id", "doc_id")
    }),

    "q98_canonical_pick" -> ((s, dir) => {
      // Canonical-representative selection per near-dup cluster: within
      // each q53 cluster keep the LONGEST copy (token count; tie → lowest
      // doc_id) — the curation refinement over an id-greedy drop, since
      // near-dup copies often differ by truncation and the longest is the
      // most complete. Deterministic two-pass argmax (per-cluster max
      // joined back, min id among ties) instead of max_by, whose tie
      // choice is arbitrary across runs/partitionings; the integer token
      // count keeps the oracle comparison float-free. The per-cluster
      // tables are cluster-cardinality-sized; both aggs are hash aggs.
      val clusters = queries("q53_dedup_clusters")(s, dir)
      val toks = t(s, dir, "documents").select(col("doc_id"),
        size(split(TextExprs.cleanText(col("text")), " ")).cast("long").as("n_toks"))
      val j = clusters.join(toks, "doc_id")
      val best = j.groupBy("cluster_id").agg(max("n_toks").as("canonical_toks"))
      j.join(best, "cluster_id")
        .where(col("n_toks") === col("canonical_toks"))
        .groupBy("cluster_id", "cluster_size", "canonical_toks")
        .agg(min("doc_id").as("canonical_id"))
        .select("cluster_id", "cluster_size", "canonical_id", "canonical_toks")
    }),

    "q99_pmi_cooccur" -> ((s, dir) => {
      // Pointwise mutual information over document-level token
      // co-occurrence — the collocation / phrase-mining primitive
      // (PMI(a,b) = ln(P(a,b) / (P(a)P(b))) with doc-level events).
      // Scale shape: the pair explosion is BOUNDED by restricting to the
      // top-K corpus tokens (K=20, deterministic df-desc/token-asc cutoff)
      // before pairing, so the pair stream is ≤ K²/2 rows per doc no
      // matter how large the corpus — the unrestricted form is O(L²) per
      // doc and unshippable. The top-K table is K rows → broadcast to
      // both the per-doc semi-filter and the final count joins; the only
      // full-corpus shuffles are the df hash-agg and the pair hash-agg
      // (both map-side combined). The self-join runs on doc_id with both
      // sides ≤ K rows per key. All counts integer; the single float op
      // (ln) happens once per surviving pair, rounded 6dp.
      val docToks = t(s, dir, "documents")
        .select(col("doc_id"),
          array_distinct(split(TextExprs.cleanText(col("text")), " ")).as("ts"))
      val nDocs = docToks.agg(count(lit(1)).as("n_docs"))
      val tok = docToks.select(col("doc_id"), explode(col("ts")).as("tok"))
      val topk = tok.groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok").asc).limit(20)
      val tf = tok.join(broadcast(topk.select("tok")), "tok")
      val pairs = tf.select(col("doc_id"), col("tok").as("tok_a"))
        .join(tf.select(col("doc_id"), col("tok").as("tok_b")), "doc_id")
        .where(col("tok_a") < col("tok_b"))
      pairs.groupBy("tok_a", "tok_b").agg(count(lit(1)).as("n_ab"))
        .where(col("n_ab") >= 5)
        .join(broadcast(topk.select(col("tok").as("tok_a"), col("n").as("n_a"))), "tok_a")
        .join(broadcast(topk.select(col("tok").as("tok_b"), col("n").as("n_b"))), "tok_b")
        .crossJoin(broadcast(nDocs))
        .select(col("tok_a"), col("tok_b"), col("n_ab"),
          round(log(col("n_ab").cast("double") * col("n_docs") /
            (col("n_a").cast("double") * col("n_b"))), 6).as("pmi"))
    }),

    "q100_strat_split" -> ((s, dir) => {
      // Deterministic stratified train/val/test split: within each
      // language, EXACTLY floor(0.8·n) docs go to train and floor(0.1·n)
      // to val (remainder test) — the split-manifest op every training
      // pipeline needs, with integer quotas (no float-boundary can move a
      // doc) and an md5 draw so membership is a pure function of doc_id,
      // stable across runs, engines, and partitionings. Scale shape is
      // q96's: the per-language rank comes from the GlobalRank range
      // exchange over (lang, draw, doc_id) — NOT a per-group window whose
      // dominant language would serialize through one task at 100 TB —
      // and the lang→(base, quotas) table is language-cardinality-sized,
      // broadcast.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          md5(col("doc_id").cast("string")).as("_draw"))
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
      val quota = counts
        .join(prevCumByKey(counts, "lang", "cnt"), "lang")
        .select(col("lang"), col("prev_cum"),
          expr("(cnt * 8) DIV 10").as("n_train"),
          expr("cnt DIV 10").as("n_val"))
      GlobalRank.withRowNumber(docs,
          Seq(col("lang").asc, col("_draw").asc, col("doc_id").asc), "_grn")
        .join(broadcast(quota), "lang")
        .withColumn("lrank", col("_grn") - col("prev_cum"))
        .select(col("doc_id"), col("lang"),
          when(col("lrank") <= col("n_train"), lit("train"))
            .when(col("lrank") <= col("n_train") + col("n_val"), lit("val"))
            .otherwise(lit("test")).as("split"))
    }),

    "q101_embed_outlier" -> ((s, dir) => {
      // Embedding-space outlier detection for curation: per-label centroid
      // (the label's mean vector), cosine of every member to its centroid,
      // and the 5 LEAST-cohesive members per label — the "probably
      // mislabeled / junk" review queue. Centroids come from one
      // posexplode + hash-agg (label×dim rows — tiny) and are rounded to
      // 6dp BEFORE the cosine so both engines score from identical
      // doubles (q78's convention); the label→centroid table is broadcast.
      // The bottom-k is the bounded TopKAgg on the negated score — the
      // shuffle carries labels×k rows, never a per-label window partition
      // (which would serialize a label's full membership through one task
      // at 100 TB). Ranking on the ROUNDED cosine keeps the tie-break
      // (vec_id asc) engine-neutral.
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("embedding"))
      val cent = emb.select(col("label"), posexplode(col("embedding")))
        .groupBy("label", "pos").agg(round(avg(col("col")), 6).as("cv"))
        .groupBy("label")
        .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("ps"))
        .select(col("label"), expr("transform(ps, x -> x.cv)").as("centroid"))
      val scored = emb.join(broadcast(cent), "label")
        .select(col("vec_id"), col("label"),
          round(VectorExprs.cosine(col("embedding"), col("centroid")), 6).as("cos_c"))
      TopKAgg.perKey(scored, col("label"), -col("cos_c"), col("vec_id"), 5)
        .select(col("_k").as("label"), col("id").as("vec_id"),
          round(-col("score"), 6).as("cos_c"), col("rank").cast("long").as("rnk"))
    }),

    "q102_zipf" -> ((s, dir) => {
      // Zipf-law fit over the corpus unigram distribution: slope/intercept
      // of ln(freq) on ln(rank) — the one-number corpus-health diagnostic
      // (natural text ≈ -1; synthetic/templated text diverges). The only
      // full-corpus work is the explode + hash-agg to type frequencies; the
      // rank runs on the vocab-sized table — but a 100 TB web corpus has
      // 10^8-10^9 types, so the rank is GlobalRank.withRowNumber (range
      // exchange + per-partition offsets), NOT a partition-less window that
      // would funnel the whole vocabulary through one task.
      // regr_slope/regr_intercept are the built-in one-pass moments aggs;
      // 6dp rounding absorbs merge-order float jitter on both engines.
      val freq = t(s, dir, "documents")
        .select(explode(split(TextExprs.cleanText(col("text")), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("freq"))
      GlobalRank.withRowNumber(freq,
          Seq(col("freq").desc, col("tok").asc), "rnk")
        .agg(
          round(expr("regr_slope(ln(freq), ln(rnk))"), 6).as("zipf_slope"),
          round(expr("regr_intercept(ln(freq), ln(rnk))"), 6).as("zipf_intercept"),
          count(lit(1)).as("n_types"),
          sum("freq").as("n_tokens"))
    }),

    "q103_semdedup" -> ((s, dir) => {
      // SemDeDup — operators.SemDeDup: the cell count SCALES with the
      // corpus (k = max(4, n/128); the round-9 verdict's one audited
      // scale-killer was the previous fixed k=4) and ONE Lloyd fit serves
      // assignment + dedup (no q78 re-fit, no second embeddings read for
      // the vector payload). At sf0.01 (500 vectors) k computes to exactly
      // 4, so the unrolled DuckDB Lloyd oracle keeps the same fixed
      // (k=4, iters=2) generation. Threshold 0.40 is tuned to this
      // synthetic table's similarity range (max pairwise cos ≈ 0.51);
      // production text dedup runs 0.95+.
      graft.operators.SemDeDup.semdedup(t(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), threshold = 0.40)
        .withColumnRenamed("id", "vec_id")
    }),

    "q104_shuffle_pack" -> ((s, dir) => {
      // Deterministic global training-order shuffle + packing: docs are
      // ordered by an md5 draw (a pure function of doc_id — the epoch
      // shuffle every training pipeline needs, reproducible across runs
      // and engines), then packed by fixed token-budget boundaries over
      // the running token sum IN THAT ORDER. Exercises the distributed
      // prefix sum under a non-identity total order: the range exchange
      // partitions by draw, so the shuffled order never funnels through a
      // single-partition window. Boundary rule is q94's arithmetic one
      // (pack = start DIV B), kept here without splitting.
      val B = 2048L
      val docs = t(s, dir, "documents").select(col("doc_id"),
        md5(col("doc_id").cast("string")).as("_draw"),
        size(split(TextExprs.cleanText(col("text")), " ")).cast("long").as("n_toks"))
      GlobalRank.withRunningSum(docs,
          Seq(col("_draw").asc, col("doc_id").asc), col("n_toks"), "cum_toks")
        .select(col("doc_id"), col("n_toks"), col("cum_toks"),
          expr(s"(cum_toks - n_toks) DIV $B").as("pack_id"))
    }),

    "q105_dsir" -> ((s, dir) => {
      // DSIR-style data selection (Xie et al. 2023, "Data Selection for
      // Language Models via Importance Resampling"): score every raw doc
      // by its log importance ratio under two bag-of-hashed-ngram unigram
      // models — the target distribution (here: the English slice) vs the
      // raw corpus. Features are HASHED into 256 buckets exactly as the
      // paper does (bucket = first md5 byte, engine-neutral as a 2-hex-char
      // string), so the model tables are CONSTANT-sized regardless of
      // corpus vocabulary: at 100 TB both models are still 256 rows and
      // the stream-model joins broadcast. Laplace-smoothed with the bucket
      // count as the literal; corpus totals ride one-row broadcast cross
      // joins (the BM25 N/avgdl pattern — no driver collect). The weight
      // is the per-token MEAN log ratio (bounded magnitude → stable 4dp
      // rounding); `+ 0.0` collapses IEEE -0.0 onto 0.0 identically in
      // both engines so near-zero weights hash-match.
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(split(lower(TextExprs.cleanText(col("text"))), " ")).as("tok"))
        .where(col("tok") =!= "")
        .select(col("doc_id"), col("lang"), substring(md5(col("tok")), 1, 2).as("b"))
      val raw = toks.groupBy("b").agg(count(lit(1)).as("cr"))
      val tgt = toks.where(col("lang") === "en").groupBy("b").agg(count(lit(1)).as("ct"))
      val nr = raw.agg(sum("cr").as("nr"))
      val nt = toks.where(col("lang") === "en").agg(count(lit(1)).as("nt"))
      toks.join(raw, "b").join(tgt, Seq("b"), "left")
        .crossJoin(broadcast(nr)).crossJoin(broadcast(nt))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          (round(avg(log((coalesce(col("ct"), lit(0L)) + 1.0) / (col("nt") + 256))
            - log((col("cr") + 1.0) / (col("nr") + 256))), 4) + 0.0).as("dsir_w"))
    }),

    "q106_bigram_lm" -> ((s, dir) => {
      // CCNet-style LM quality scoring upgraded from q89's unigram to a
      // bigram model with Laplace smoothing: per-doc cross-entropy of
      // P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) under the self-trained corpus
      // bigram model. The bigram stream is one codegen'd per-doc stage
      // (transform over sequence — no self-join on position); the model
      // tables are vocab- and bigram-type-sized and join UNHINTED exactly
      // like q89's (a web-scale bigram table exceeds any broadcast
      // threshold; AQE still broadcasts while it measures small). Only
      // the one-row vocabulary size rides a broadcast cross join.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), split(lower(TextExprs.cleanText(col("text"))), " ").as("toks"))
      val v = docs.select(explode(col("toks")).as("tok"))
        .where(col("tok") =!= "").agg(countDistinct("tok").as("v"))
      val bg = docs.where(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> named_struct('w1', toks[i-1], 'w2', toks[i]))")).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val m2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val m1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
      bg.join(m2, Seq("w1", "w2")).join(m1, Seq("w1"))
        .crossJoin(broadcast(v))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(-log((col("c12") + 1.0) / (col("c1") + col("v")))), 4).as("xent"),
          round(exp(avg(-log((col("c12") + 1.0) / (col("c1") + col("v"))))), 4).as("ppl"))
    }),

    "q107_weighted_sample" -> ((s, dir) => {
      // Deterministic weighted sampling WITHOUT replacement (Efraimidis &
      // Spirakis 2006): each doc draws u from its md5 (first 13 hex
      // digits / 16^13 — exactly representable, engine-neutral) and the
      // k docs with the largest u^(1/w) win, scored in log space as
      // ln(u)/w with w = n_chars (long docs proportionally likelier —
      // quality- or length-weighted corpus subsampling). Reproducible
      // across runs, engines, and partitionings; the 6dp-rounded key with
      // doc_id tie-break makes both engines cut the same 200. Scale
      // shape: orderBy+limit plans TakeOrderedAndProject — per-partition
      // top-k then a k-sized driver merge, never a global sort.
      val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10).cast("long")
          / lit(4503599627370496.0)).as("u"))
      d.select(col("doc_id"), col("n_chars"),
          round(log(greatest(col("u"), lit(2.220446049250313e-16))) / col("n_chars"), 6)
            .as("es_key"))
        .orderBy(col("es_key").desc, col("doc_id").asc)
        .limit(200)
    }),

    "q108_source_overlap" -> ((s, dir) => {
      // operators.CorpusOverlap — see its scaladoc for the bounded
      // self-join scale argument; ScaleProbe's overlap mode stresses the
      // adversarial every-shingle-in-every-source case.
      graft.operators.CorpusOverlap.sourceOverlap(
        t(s, dir, "documents"), col("source"), col("text"), n = 5)
    }),

    "q109_embed_quantize" -> ((s, dir) => {
      // Int8 scalar quantization of the embedding store — the memory lever
      // that makes a 100 TB ANN index fit RAM (4x smaller than float32,
      // per-dimension affine codes a la FAISS SQ8) — with its cost
      // measured: per-label reconstruction MSE and worst absolute error
      // after dequantization. Per-dimension min/max is a dim-sized (64-row)
      // aggregate joined back onto the exploded stream (never collected);
      // codes use floor(x + 0.5) — engine-neutral rounding, unlike
      // HALF_UP/HALF_EVEN round() divergence. MSE at 10dp is safe: values
      // are order-independent up to ~1e-22 absolute summation noise.
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
      val st = e.groupBy("pos").agg(min("x").as("lo"), max("x").as("hi"))
      e.join(st, "pos")
        .select(col("vec_id"), col("label"), col("x"),
          (col("lo") + floor((col("x") - col("lo")) / (col("hi") - col("lo")) * 255.0 + 0.5)
            / 255.0 * (col("hi") - col("lo"))).as("xr"))
        .groupBy("label")
        .agg(countDistinct("vec_id").as("n_vecs"),
          round(avg((col("x") - col("xr")) * (col("x") - col("xr"))), 10).as("mse"),
          round(max(abs(col("x") - col("xr"))), 8).as("max_err"))
    }),

    "q110_curriculum" -> ((s, dir) => {
      // Curriculum ordering (easy→hard scheduling a la Bengio 2009 /
      // competence-based curricula): per-doc difficulty = mean token
      // surprisal -ln(p(tok)) under the corpus unigram model, then four
      // equal-depth phases. The unigram table is vocab-sized, the corpus
      // total rides a one-row broadcast cross join, and the phase split is
      // GlobalRank.withNtile's range exchange over (difficulty, doc_id) —
      // never a single-partition ntile window, so the phase assignment
      // scales with partitions, not one task. 6dp rounding before the
      // ntile keeps the order identical in both engines.
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(TextExprs.cleanText(col("text"))), " ")).as("tok"))
        .where(col("tok") =!= "")
      val f = toks.groupBy("tok").agg(count(lit(1)).as("freq"))
      val n = toks.agg(count(lit(1)).as("total"))
      val diff = toks.join(f, "tok").crossJoin(broadcast(n))
        .groupBy("doc_id")
        .agg(round(avg(-log(col("freq") / col("total").cast("double"))), 6)
          .as("difficulty"))
      GlobalRank.withNtile(diff, 4,
          Seq(col("difficulty").asc, col("doc_id").asc), "phase")
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

    "q112_curation_funnel" -> ((s, dir) => {
      // The curation attrition funnel — per-stage surviving doc and token
      // counts for the standard filter chain (language → length → lexical
      // diversity → benchmark decontamination), the accounting every
      // dataset card reports. ONE pass computes every per-doc flag and ONE
      // hash aggregate folds all cumulative stages (conditional sums) —
      // never a re-scan per stage, so a 10-stage funnel over 100 TB still
      // costs one corpus read; the 1-row aggregate unstacks driver-side
      // for free. The contamination flag is operators.Decontaminate (q71's
      // operator: distinct 8-grams, benchmark gram set broadcast).
      val d = t(s, dir, "documents")
        .where(col("doc_id") % 20 =!= 0)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          split(lower(TextExprs.cleanText(col("text"))), " ").as("toks"))
      val all = t(s, dir, "documents")
      val contaminated = graft.operators.Decontaminate.report(
          train = all.where(col("doc_id") % 20 =!= 0),
          bench = all.where(col("doc_id") % 20 === 0),
          id = col("doc_id"), text = col("text"), n = 8)
        .select(col("id").as("doc_id"))
      val flags = d.join(contaminated.withColumn("_hit", lit(1)), Seq("doc_id"), "left")
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_toks"),
          (col("lang") === "en").as("f1"),
          (col("n_chars") >= 100).as("f2"),
          (size(array_distinct(col("toks"))) / size(col("toks")).cast("double") >= 0.3)
            .as("f3"),
          col("_hit").isNull.as("f4"))
      val one = flags.agg(
        count(lit(1)).as("d0"), sum("n_toks").as("t0"),
        sum(when(col("f1"), 1L).otherwise(0L)).as("d1"),
        sum(when(col("f1"), col("n_toks")).otherwise(0L)).as("t1"),
        sum(when(col("f1") && col("f2"), 1L).otherwise(0L)).as("d2"),
        sum(when(col("f1") && col("f2"), col("n_toks")).otherwise(0L)).as("t2"),
        sum(when(col("f1") && col("f2") && col("f3"), 1L).otherwise(0L)).as("d3"),
        sum(when(col("f1") && col("f2") && col("f3"), col("n_toks")).otherwise(0L)).as("t3"),
        sum(when(col("f1") && col("f2") && col("f3") && col("f4"), 1L).otherwise(0L)).as("d4"),
        sum(when(col("f1") && col("f2") && col("f3") && col("f4"), col("n_toks")).otherwise(0L)).as("t4"))
      one.select(expr(
        """stack(5,
          | 0L, 'all', d0, t0,
          | 1L, 'lang_en', d1, t1,
          | 2L, 'min_length', d2, t2,
          | 3L, 'lexical_diversity', d3, t3,
          | 4L, 'decontaminated', d4, t4) AS (stage, name, docs, tokens)""".stripMargin))
    }),

    "q114_pq_adc_search" -> ((s, dir) => {
      // PQ asymmetric distance computation (ADC, Jégou et al. 2011 §III) —
      // the search half of q111's compression: corpus vectors exist ONLY
      // as 4 sub-codes; each query scans codes with per-subspace
      // lookup-table distances ||q_m − c_{m,code}||², never touching raw
      // corpus floats. The LUT is MATERIALIZED as a k-entry array column
      // per subspace on the QUERY side (O(k·dim) once per query row —
      // this is the textbook ADC table build); every candidate row then
      // pays 4 O(1) `element_at` fetches. That shape stays one codegen'd
      // method at any codebook size — the previous k-deep CASE chain
      // duplicated the dot products across branches and would fall out of
      // whole-stage codegen at the k=256 codebooks real deployments run
      // (Round10Spec compiles the k=256 form with fallback disabled). At
      // 100 TB the scan reads 4 bytes of codes per vector instead of 256
      // bytes of floats. Top-5 per query via the per-query window (8 query
      // partitions — q30's shape).
      val e = t(s, dir, "embeddings")
      // independent subspace fits on concurrent driver threads (q111's note)
      val fits = Await.result(Future.sequence((0 until 4).map { m => Future {
        val (cents, base) = graft.operators.KMeansOp.fit(
          e, col("vec_id"), slice(col("embedding"), m * 16 + 1, 16), k = 4, iters = 2)
        val (cl, _) = graft.operators.KMeansOp.argmin(col("v"), cents)
        (cents, base.select(col("id").as("vec_id"), cl.cast("int").as(s"code$m")))
      }}), Duration.Inf)
      val codes = fits.map(_._2).reduce(_.join(_, "vec_id"))
      // ‖q‖² once per query row; the raw qv never crosses the join — the
      // broadcast side is (query_id, 4 luts, one scalar)
      val q = e.where(col("vec_id") < 8)
        .select(Seq(col("vec_id").as("query_id"),
          VectorExprs.dot(col("embedding").cast("array<double>"),
            col("embedding").cast("array<double>")).as("_q2")) ++
          (0 until 4).map { m =>
            graft.plans.AnnNative.adcLut(col("embedding").cast("array<double>"),
              fits(m)._1, m * 16).as(s"_lut$m")
          }: _*)
      val lutSum = (0 until 4).map(m =>
        element_at(col(s"_lut$m"), col(s"code$m") + 1)).reduce(_ + _)
      q.crossJoin(codes)
        .select(col("query_id"), col("vec_id").as("corpus_id"),
          round(col("_q2") + lutSum, 6).as("adc"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("query_id").orderBy(col("adc").asc, col("corpus_id").asc))
          .cast("long"))
        .where(col("rnk") <= 5)
    }),

    "q115_ivfpq_search" -> ((s, dir) => {
      // The composed 100 TB ANN index — IVFADC (Jégou et al. 2011 §IV,
      // the non-residual form): a coarse k-means quantizer routes each
      // query to its nProbe=2 nearest cells, and ADC over q111's PQ codes
      // scores ONLY vectors in probed cells — the scan touches nProbe/k of
      // the code table (cell-partitioned at scale) and reads 4 bytes of
      // codes per candidate. Composes the engine's own parts: KMeansOp.fit
      // for both quantizer levels, q114's LUT expression for ADC, the
      // per-query window for top-k. Approximation is BY CONSTRUCTION
      // identical in the oracle (same probed cells, same codes), so the
      // driver hash-checks the full approximate result.
      val e = t(s, dir, "embeddings")
      // all five quantizer fits (coarse + 4 subspace) are independent —
      // run them on concurrent driver threads; wall ≈ one fit
      val coarseF = Future(graft.operators.KMeansOp.fit(
        e, col("vec_id"), col("embedding"), k = 4, iters = 2))
      val fitsF = Future.sequence((0 until 4).map { m => Future {
        val (cents, base) = graft.operators.KMeansOp.fit(
          e, col("vec_id"), slice(col("embedding"), m * 16 + 1, 16), k = 4, iters = 2)
        val (cl, _) = graft.operators.KMeansOp.argmin(col("v"), cents)
        (cents, base.select(col("id").as("vec_id"), cl.cast("int").as(s"code$m")))
      }})
      val (coarse, base64) = Await.result(coarseF, Duration.Inf)
      val (cellCol, _) = graft.operators.KMeansOp.argmin(col("v"), coarse)
      val cells = base64.select(col("id").as("vec_id"), cellCol.cast("int").as("cell"))
      val fits = Await.result(fitsF, Duration.Inf)
      val codes = (fits.map(_._2) :+ cells).reduce(_.join(_, "vec_id"))
      val q = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").cast("array<double>").as("qv"))
      // probe table: the nProbe=2 coarse cells nearest each query, selected
      // INSIDE one native expression (plans.ArgTopMExpr: 6dp-rounded score
      // + lowest-cell tie-break — identical selection to the round + rank
      // window it replaces, so the oracle's window twin still matches).
      // At a production coarse quantizer (10k+ cells for 100 TB) the old
      // crossJoin(range(k)) + Window shape pushes k rows per query through
      // an exchange; this is O(k·dim) inside the scan projection.
      // ‖q‖² once per query row (pre-explode), qv dropped once the LUTs
      // exist — the probe join input is (query_id, cell, luts, scalar)
      val probed = q
        .select(col("query_id"), col("qv"),
          VectorExprs.dot(col("qv"), col("qv")).as("_q2"),
          explode(graft.plans.AnnNative.argTopM(col("qv"), coarse, 2)).as("cell"))
        .select(Seq(col("query_id"), col("_q2"), col("cell")) ++
          (0 until 4).map { m =>
            graft.plans.AnnNative.adcLut(col("qv"), fits(m)._1, m * 16).as(s"_lut$m")
          }: _*)
      val lutSum = (0 until 4).map(m =>
        element_at(col(s"_lut$m"), col(s"code$m") + 1)).reduce(_ + _)
      probed.join(codes, "cell")
        .select(col("query_id"), col("vec_id").as("corpus_id"),
          round(col("_q2") + lutSum, 6).as("adc"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("query_id").orderBy(col("adc").asc, col("corpus_id").asc))
          .cast("long"))
        .where(col("rnk") <= 5)
    }),

    "q118_mmr_rerank" -> ((s, dir) => {
      // MMR diversified reranking (Carbonell & Goldstein 1998) — the
      // second stage of the standard two-stage retrieval architecture:
      // the DISTRIBUTED pass scores the whole corpus and keeps top-20
      // (TakeOrderedAndProject, broadcast query vector); the greedy
      // λ·relevance − (1−λ)·max-sim-to-selected rerank then runs on the
      // BOUNDED 20-candidate pool driver-side (k² = 400 sims — the same
      // bounded-collect license as k-means centroids; reranking is O(k²)
      // by definition, the corpus scan is not). Every cosine is rounded
      // to 6dp BEFORE the greedy loop in both engines, so pick order is
      // engine-exact; the DuckDB twin unrolls the 5 greedy steps as CTEs.
      val lam = 0.7
      val emb = t(s, dir, "embeddings")
      val qv = emb.where(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>").as("qv"))
      val pool = emb.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
          round(VectorExprs.cosine(col("qv"), col("embedding")), 6).as("rel"))
        .orderBy(col("rel").desc, col("vec_id").asc).limit(20)
        .collect()
      val cand = pool.toSeq.map(r =>
        (r.getLong(0), r.getDouble(2), r.getSeq[Double](1)))
      val sp = s
      import sp.implicits._
      graft.operators.Mmr.rerank(cand, k = 5, lam = lam)
        .toDF("rnk", "vec_id", "mmr_score")
    }),

    "q117_triplet_mining" -> ((s, dir) => {
      // Hard-triplet mining for metric-learning / embedding fine-tuning
      // (FaceNet-style): for each anchor, the nearest SAME-label vector
      // (hardest positive is the FARTHEST same-label; here: nearest, the
      // in-batch positive convention) and the nearest DIFFERENT-label
      // vector (the hard negative), plus the triplet margin. One broadcast
      // of the anchor set against the corpus (q30's shape: the corpus
      // never shuffles for scoring), then per-anchor bounded picks via
      // the anchor-partitioned window; emits one training triplet per
      // anchor. At 100 TB the anchor batch is the small side by
      // construction — it is a training BATCH.
      val emb = t(s, dir, "embeddings")
      val anchors = emb.where(col("vec_id") < 16)
        .select(col("vec_id").as("anchor_id"), col("label").as("a_label"),
          col("embedding").as("av"),
          VectorExprs.normNative(col("embedding")).as("_an"))
      val corpus = emb.select(col("vec_id").as("cand_id"), col("label").as("c_label"),
        col("embedding").as("cv"),
        VectorExprs.normNative(col("embedding")).as("_cnn"))
      val scored = corpus.join(broadcast(anchors))
        .where(col("cand_id") =!= col("anchor_id"))
        .select(col("anchor_id"), col("cand_id"),
          (col("c_label") === col("a_label")).as("same"),
          // 6dp BEFORE the ranking window (repo convention, q101/q107):
          // both engines pick from identical rounded scores, so parity
          // never depends on either engine's float-sum association order;
          // norms hoisted per side — each corpus row scores against all
          // 16 anchors, so the per-pair loop is the cross term only
          round(VectorExprs.cosineHoisted(col("av"), col("cv"),
            col("_an"), col("_cnn")), 6).as("cos"))
      val w = Window.partitionBy("anchor_id", "same")
        .orderBy(col("cos").desc, col("cand_id").asc)
      val best = scored.withColumn("r", row_number().over(w)).where(col("r") === 1)
      val pos = best.where(col("same"))
        .select(col("anchor_id"), col("cand_id").as("pos_id"), col("cos").as("_cp"))
      val neg = best.where(!col("same"))
        .select(col("anchor_id"), col("cand_id").as("neg_id"), col("cos").as("_cn"))
      pos.join(neg, "anchor_id")
        .select(col("anchor_id"), col("pos_id"), col("neg_id"),
          round(col("_cp"), 6).as("cos_pos"), round(col("_cn"), 6).as("cos_neg"),
          round(col("_cp") - col("_cn"), 6).as("margin"))
    }),

    "q116_tokenizer_fertility" -> ((s, dir) => {
      // Tokenizer fertility accounting per language slice — the metric
      // that converts a mixture's BYTE budget into its TOKEN budget
      // (fertility varies by language/script, so equal bytes never means
      // equal tokens; the data card line every multilingual pretraining
      // mix reports). ONE scan: the per-doc counts are three codegen'd
      // byte-scan expressions (CleanText length, whitespace tokens, the
      // BPE-proxy regex count), and the per-language rollup is a
      // lang-cardinality-sized hash aggregate.
      val d = t(s, dir, "documents").select(col("lang"),
        length(TextExprs.cleanText(col("text"))).cast("long").as("nc"),
        TextExprs.tokenCountWs(col("text")).cast("long").as("nw"),
        TextExprs.tokenCountBpe(col("text")).cast("long").as("nb"))
      d.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum("nc").as("n_chars"), sum("nw").as("n_words"), sum("nb").as("n_bpe"),
        round(sum("nc") / sum("nb").cast("double"), 4).as("chars_per_bpe"),
        round(sum("nb") / sum("nw").cast("double"), 4).as("fertility"))
    }),

    "q113_incremental_dedup" -> ((s, dir) => {
      // the daily-ingest dedup: which docs of the "new crawl" slice
      // (doc_id % 10 == 0) near-duplicate the existing corpus — an A×B
      // banded LSH join (operators.Dedup.minhashNearDupsAgainst), never a
      // self-join over corpus ∪ batch; q27's parameters so the brute
      // exact-Jaccard twin stays the oracle
      val docs = t(s, dir, "documents")
      graft.operators.Dedup.minhashNearDupsAgainst(
          corpus = docs.where(col("doc_id") % 10 =!= 0),
          batch = docs.where(col("doc_id") % 10 === 0),
          id = col("doc_id"), text = col("text"),
          shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.7)
        .select(col("batch_id"), col("corpus_id"),
          round(col("jaccard"), 6).as("jaccard"))
    }),

    "q119_ivfpq_recall" -> ((s, dir) => {
      // Recall@5 of the IVFADC index (q115) against the exact L2 top-5 —
      // the one number every ANN deployment reports, and the natural
      // oracle-checkable composition of existing parts: both sides are
      // fully deterministic (fixed seeds, 6dp-rounded scores before every
      // rank window), so DuckDB replicates the approximate result exactly
      // and the driver hash-checks the recall itself, not just "rows>0".
      // Ground truth is exact L2 (the metric ADC approximates), not
      // cosine, so the number isolates quantization + probe loss. At
      // scale the exact side is the one-off offline evaluation scan every
      // deployment runs on a query sample; the approximate side touches
      // nProbe/k of the code table as in q115.
      val e = t(s, dir, "embeddings")
      val approx = queries("q115_ivfpq_search")(s, dir)
        .select(col("query_id"), col("corpus_id"))
      // the per-row norms ‖q‖²/‖c‖² are computed ONCE per side before the
      // cross join — only the cross term pays per-pair work
      val q = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").cast("array<double>").as("qv"))
        .withColumn("_q2", VectorExprs.dot(col("qv"), col("qv")))
      val c = e.select(col("vec_id").as("corpus_id"),
          col("embedding").cast("array<double>").as("cv"))
        .withColumn("_c2", VectorExprs.dot(col("cv"), col("cv")))
      val exact = q.crossJoin(c)
        .select(col("query_id"), col("corpus_id"),
          round(col("_q2") + col("_c2")
            - lit(2.0) * VectorExprs.dot(col("qv"), col("cv")), 6).as("d2"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("query_id").orderBy(col("d2").asc, col("corpus_id").asc)))
        .where(col("rnk") <= 5)
        .select(col("query_id"), col("corpus_id"))
      val hits = exact.join(approx, Seq("query_id", "corpus_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n"))
      q.select(col("query_id")).join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n"), lit(0L)).as("n_hits"),
          round(coalesce(col("n"), lit(0L)) / 5.0, 4).as("recall"))
    }),

    "q120_residual_pq" -> ((s, dir) => {
      // Residual-form IVFADC encoding (Jégou et al. 2011 §IV — the form
      // FAISS ships as IndexIVFPQ): PQ codebooks are fit on the RESIDUAL
      // r = v − c_cell (vector minus its coarse centroid), not on raw
      // vectors. Residuals concentrate near the origin with far less
      // spread than the raw space, so the same 4-subspace × k codebook
      // budget quantizes them with strictly lower error than q111's
      // non-residual codes (Round10Spec asserts the inequality on this
      // table). Scale shape: the coarse fit + 4 residual sub-fits are the
      // same bounded driver state as q115 (k×dim matrices), the residual
      // column derives in one pass from the cached base (no second scan),
      // and the code table stays one row per vector, equi-joined on id.
      val e = t(s, dir, "embeddings")
      val (coarse, base) = graft.operators.KMeansOp.fit(
        e, col("vec_id"), col("embedding"), k = 4, iters = 2)
      val (cellCol, _) = graft.operators.KMeansOp.argmin(col("v"), coarse)
      val res = base.select(col("id"), cellCol.cast("int").as("cell"), col("v"))
        .select(col("id"), col("cell"),
          graft.plans.AnnNative.subCentroid(col("v"), col("cell"), coarse).as("rv"))
      // 4 independent residual sub-fits on concurrent driver threads
      // (q111's pattern; wall ≈ one fit)
      val fits = Await.result(Future.sequence((0 until 4).map { m => Future {
        graft.operators.KMeansOp.kmeans(
            res, col("id"), slice(col("rv"), m * 16 + 1, 16), k = 4, iters = 2)
          .select(col("id"), col("cluster").as(s"code$m"),
            col("sq_dist").as(s"_e$m"))
      }}), Duration.Inf)
      val codes = fits.reduce(_.join(_, "id"))
      res.select(col("id"), col("cell").cast("long").as("cell"))
        .join(codes, "id")
        .select(col("id").as("vec_id"), col("cell"),
          col("code0"), col("code1"), col("code2"), col("code3"),
          round(col("_e0") + col("_e1") + col("_e2") + col("_e3"), 4).as("rpq_err"))
    }),

    "q121_curation_pipeline" -> ((s, dir) => {
      // The END-TO-END curation pipeline in ONE oracle-checked plan:
      // Gopher hard rules → benchmark decontamination → minhash near-dup
      // dedup → temperature-mixed sampling → fixed-budget packing. Every
      // stage is the engine's existing operator (q79/q71/q27/q96/q93
      // respectively) — the point of the query is that they COMPOSE in a
      // single dataflow without driver materialization between stages.
      // Scale notes: the decontamination gram set broadcasts (q71), the
      // near-dup candidate join is banded LSH with cached ids-only
      // signatures (q27; exact-Jaccard-oracle recall caveat documented at
      // Dedup.minhashNearDupsAgainst), and the ONLY cached intermediate is
      // the post-dedup manifest — a slim (id, lang, n_toks, draw) columnar
      // projection, exactly what a production pipeline checkpoints between
      // its filter and sampling phases; the mix/rank/pack stages then read
      // the manifest, not the corpus, so `documents` is scanned a bounded
      // number of times regardless of how many downstream stages follow
      // (PlanSpec pins the scan count).
      val all = t(s, dir, "documents")
      val train = all.where(col("doc_id") % 20 =!= 0)
      val gopherPass = TextAnalysis.gopherRules(train, col("doc_id"), col("text"))
        .where(col("passes")).select(col("id").as("doc_id"))
      val contaminated = graft.operators.Decontaminate.report(
          train = train, bench = all.where(col("doc_id") % 20 === 0),
          id = col("doc_id"), text = col("text"), n = 8)
        .select(col("id").as("doc_id"))
      // SLIM post-filter manifest — ids + mixing metadata, NO text: the
      // first eager pin, so gopher + decontamination run EXACTLY once per
      // execution and every downstream stage reads these blocks. (The r11
      // regression this fixes: the dedup operator's eager signature pin
      // sat on the composed text-bearing filter output, re-running the
      // whole filter pipeline at every build — the r10-binary same-host
      // A/B priced q121 at 1.5 s vs r11's 3.6 s; see BASELINE.md r12.)
      val cleanMeta = train
        .select(col("doc_id"), col("lang"),
          size(split(TextExprs.cleanText(col("text")), " ")).cast("long").as("n_toks"))
        .join(gopherPass, "doc_id")
        .join(contaminated.withColumn("_hit", lit(true)), Seq("doc_id"), "left")
        .where(col("_hit").isNull)
        .select(col("doc_id"), col("lang"), col("n_toks"))
        .localCheckpoint(true)
      // dedup re-reads text through a SECOND columnar scan semi-joined to
      // the kept ids — at 100 TB that is a pruned (doc_id, text) scan,
      // strictly cheaper than row-serializing the text column into
      // checkpoint blocks
      val cleanText = train.select(col("doc_id"), col("text"))
        .join(cleanMeta.select("doc_id"), "doc_id")
      val dropped = Dedup.minhashNearDups(cleanText, col("doc_id"), col("text"),
          shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.7)
        .select(col("id_b").as("doc_id")).distinct()
      val manifest = cleanMeta
        .select(col("doc_id"), col("lang"), col("n_toks"),
          md5(col("doc_id").cast("string")).as("_draw"))
        .join(dropped.withColumn("_d", lit(true)), Seq("doc_id"), "left")
        .where(col("_d").isNull)
        .select(col("doc_id"), col("lang"), col("n_toks"), col("_draw"))
        .localCheckpoint(true) // slim 4-col pin; counts + rank + pack read it
      // temperature mix (q96's integer-exact quota arithmetic, K=200)
      val K = 200L
      val counts = manifest.groupBy("lang").agg(count(lit(1)).as("cnt"))
        .withColumn("w", floor(sqrt(col("cnt"))).cast("long"))
      val quota = counts
        .join(prevCumByKey(counts, "lang", "cnt"), "lang")
        .crossJoin(broadcast(counts.agg(sum("w").as("wsum"))))
        .withColumn("quota", expr(s"($K * w) DIV wsum"))
        .select("lang", "prev_cum", "quota")
      val sampled = GlobalRank.withRowNumber(manifest,
          Seq(col("lang").asc, col("_draw").asc, col("doc_id").asc), "_grn")
        .join(broadcast(quota), "lang")
        .where(col("_grn") - col("prev_cum") <= col("quota"))
        .select(col("doc_id"), col("lang"), col("n_toks"), col("_draw"))
      // epoch-shuffle-ordered packing (q104's order, q93's boundary rule)
      GlobalRank.withRunningSum(sampled,
          Seq(col("_draw").asc, col("doc_id").asc), col("n_toks"), "cum_toks")
        .select(col("doc_id"), col("lang"), col("n_toks"), col("cum_toks"),
          expr("(cum_toks - n_toks) DIV 2048").as("pack_id"))
    }),

    "q122_cached_api_classify" -> ((s, dir) => {
      // The reference's API-classify dataflow under the driver's hash gate
      // (previously spec-only): CacheJoinClassifier probes the reference's
      // SHIPPED 278-entry memo cache (/root/reference/.analysis_cache.json,
      // read as DATA and parsed driver-side — fixture-sized, the bounded-
      // collect license) as a cache TABLE, with RemoteBatchClassifier as
      // the on-miss path behind a transport that THROWS: zero network by
      // construction. The run only hash-matches the oracle if the cache
      // join produces ZERO misses — any miss would take the retry ladder
      // to the (Neutral, No Feedback) degrade and change the output. At
      // 100 TB the cache is a parquet table and the same anti-join/union
      // dataflow degrades from broadcast to shuffled hash join (Classify
      // scaladoc); the fixture keeps the full dataflow, shrunk. The path
      // is a knob (GRAFT_REF_CACHE) and every entry's shape is validated
      // up front, so a missing checkout or a malformed entry is a clear
      // fixture error, not an AIOOBE from deep inside the parse.
      val cacheFile = new java.io.File(refCachePath)
      require(cacheFile.isFile,
        s"q122 fixture cache not found at $cacheFile — set GRAFT_REF_CACHE " +
          "to the reference's .analysis_cache.json")
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val rootNode = mapper.readTree(cacheFile)
      import scala.jdk.CollectionConverters._
      val entries = rootNode.properties().asScala.map { e =>
        val parts = e.getKey.split("\\Q|||\\E", 3)
        require(parts.length == 3,
          s"q122 cache key lacks the industry|||question|||answer shape: '${e.getKey}'")
        require(e.getValue.isArray && e.getValue.size() >= 2,
          s"q122 cache value for '${e.getKey}' is not a [sentiment, category] array")
        (parts(0), parts(1), parts(2),
          e.getValue.get(0).asText, e.getValue.get(1).asText)
      }.toSeq
      val sp = s
      import sp.implicits._
      val cache = entries.toDF("industry", "question", "answer", "sentiment", "category")
      val keys = cache.select("industry", "question", "answer")
      val noNetwork = new graft.operators.RemoteBatchClassifier(
        transport = (_, _, _) =>
          throw new java.io.IOException("no network in fixture mode"),
        maxAttempts = 1, sleeper = _ => ())
      new graft.operators.CacheJoinClassifier(cache, noNetwork).classify(keys)
    }),

    "q123_ann_index_query" -> ((s, dir) => {
      // Build-once / query-many IVFADC (operators.AnnIndex): quantizers +
      // codes are WRITTEN as a parquet artifact, then the query path loads
      // the centroid table (bounded driver state, broadcast above the
      // CentMatrix threshold) and serves top-5 from the stored codes —
      // ZERO Lloyd iterations and no corpus-embedding scan on the query
      // side (Round11Spec asserts the plan has no aggregate and no
      // embeddings read). The build runs the same deterministic fits as
      // q115, so the round trip reproduces q115's answers and the oracle
      // is q115's twin verbatim.
      val ixDir = s"target/ann_index/${new java.io.File(dir).getName}"
      graft.operators.AnnIndex.build(
        t(s, dir, "embeddings"), col("vec_id"), col("embedding"), ixDir)
      val q = t(s, dir, "embeddings").where(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").cast("array<double>").as("qv"))
      graft.operators.AnnIndex.query(s, ixDir, q, k = 5, nProbe = 2)
    }),

    "q124_incremental_semdedup" -> ((s, dir) => {
      // Incremental SemDeDup — the daily-ingest composition of q113's
      // batch-vs-corpus shape with q103's cell routing: cells are fit on
      // the CORPUS slice only, the batch is assigned to those standing
      // cells, and the cosine verify join is strictly batch×corpus within
      // a cell — corpus-internal pairs were adjudicated at their own
      // ingest and never re-enter the join (Round11Spec pins this), so
      // per-ingest cost is O(|batch|·cellSize) regardless of corpus age.
      // k follows the corpus (450 rows at sf0.01 → k=4), matching the
      // pinned oracle chain; threshold 0.40 is q103's, tuned to this
      // table's similarity range.
      val e = t(s, dir, "embeddings")
      graft.operators.SemDeDup.semdedupIncremental(
          corpus = e.where(col("vec_id") % 10 =!= 0),
          batch = e.where(col("vec_id") % 10 === 0),
          id = col("vec_id"), vec = col("embedding"), threshold = 0.40)
        .withColumnRenamed("id", "vec_id")
    }),

    "q125_shard_manifest" -> ((s, dir) => {
      // Balanced training-shard assignment: S fixed shards (one per
      // data-parallel loader group), documents dealt in SNAKE order over
      // the token-count-descending global rank — the folded LPT greedy
      // that bounds per-shard token imbalance by roughly one document
      // WITHOUT tracking bin loads (load-tracking greedy is inherently
      // sequential; snake dealing is a pure function of rank, so the
      // assignment is one projection over a distributed rank). The rank
      // is GlobalRank.withRowNumber (range exchange + partition offsets,
      // no single-partition window); output is the S-row shard manifest
      // a loader consumes, with `balance` = shard tokens / ideal share
      // proving the property in the result itself. The corpus total is
      // derived FROM the S-row manifest (broadcast cross join, the BM25
      // N/avgdl pattern) — never a second corpus scan+tokenize; the only
      // full-corpus work in the whole query is the rank's one range
      // exchange, whose shuffle files both downstream branches re-read.
      val S = 8L
      val docs = t(s, dir, "documents").select(col("doc_id"),
        size(split(TextExprs.cleanText(col("text")), " ")).cast("long").as("n_toks"))
      val ranked = graft.operators.GlobalRank.withRowNumber(docs,
        Seq(col("n_toks").desc, col("doc_id").asc), "rnk")
      val assigned = ranked.select(col("doc_id"), col("n_toks"),
        expr(s"IF(((rnk - 1) DIV $S) % 2 = 0, (rnk - 1) % $S, $S - 1 - ((rnk - 1) % $S))")
          .as("shard_id"))
      val manifest = assigned.groupBy("shard_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("shard_toks"),
          max("n_toks").as("max_doc_toks"))
      val total = manifest.agg(sum("shard_toks").as("all_toks"))
      manifest.crossJoin(broadcast(total))
        .select(col("shard_id"), col("n_docs"), col("shard_toks"),
          col("max_doc_toks"),
          round(col("shard_toks").cast("double") * S / col("all_toks"), 6)
            .as("balance"))
    }),

    "q126_snapshot_diff" -> ((s, dir) => {
      // Corpus snapshot diff — the incremental-processing primitive:
      // compare two dataset versions BY CONTENT HASH and emit the change
      // manifest (added / removed / changed) that incremental stages
      // (q113/q124 ingest dedup, q123 index upserts) consume instead of
      // reprocessing the corpus. Hashes are computed BEFORE the join, so
      // the one full-outer shuffle carries (id, 32-byte digest) — never
      // document payloads — and full-outer admits no broadcast side, so
      // the sort-merge-on-id plan here is exactly the 100 TB plan.
      // Snapshots are deterministic fixture slices: v1 lacks doc_id%7==3
      // (later "added"), v2 lacks doc_id%13==5 ("removed") and revises
      // text where doc_id%11==0 ("changed"); unchanged rows are filtered
      // out — a diff scales with the CHANGE volume, not the corpus.
      val d = t(s, dir, "documents")
      val v1 = d.where(col("doc_id") % 7 =!= 3)
        .select(col("doc_id"), md5(coalesce(col("text"), lit(""))).as("h1"))
      val v2 = d.where(col("doc_id") % 13 =!= 5)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 11 === 0,
              concat(coalesce(col("text"), lit("")), lit(" rev2")))
            .otherwise(coalesce(col("text"), lit("")))).as("h2"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("h1").isNull, lit("added"))
            .when(col("h2").isNull, lit("removed"))
            .when(col("h1") =!= col("h2"), lit("changed")).as("status"))
        .where(col("status").isNotNull)
    }),

    "q127_repeat_upsample" -> ((s, dir) => {
      // Per-source repeat-factor upsampling — the data-constrained-scaling
      // recipe (Muennighoff et al. 2023: repeat scarce sources for
      // multiple epochs when unique data runs out): each source's epoch
      // factor equalizes its token contribution to the LARGEST source,
      // capped at 4.0 epochs (repetition beyond ~4 stops helping). Every
      // doc emits floor(e) whole copies plus one more iff its md5 u-draw
      // (q107's 13-hex-nibble convention — exactly representable, engine-
      // neutral) lands below frac(e) — expected upsampled tokens hit the
      // target exactly and membership is a pure function of doc_id.
      // Scale: the factor table is |sources| rows (broadcast); the
      // explode is the only fan-out, bounded by cap × corpus; the token
      // recompute on the apply side is the q89 model/apply posture.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
        size(split(TextExprs.cleanText(col("text")), " ")).cast("long").as("n_toks"))
      val src = docs.groupBy("source").agg(sum("n_toks").as("src_toks"))
      val maxT = src.agg(max("src_toks").as("max_toks"))
      val eps = src.crossJoin(broadcast(maxT))
        .select(col("source"), least(lit(4.0),
          col("max_toks").cast("double") / greatest(col("src_toks"), lit(1L)))
          .as("epochs"))
      docs.join(broadcast(eps), "source")
        .select(col("doc_id"), col("source"),
          floor(col("epochs")).cast("long").as("_full"),
          (col("epochs") - floor(col("epochs"))).as("_frac"),
          (conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
            .cast("long") / lit(4503599627370496.0)).as("_u"))
        .select(col("doc_id"), col("source"),
          (col("_full") + when(col("_u") < col("_frac"), 1L).otherwise(0L))
            .as("n_copies"))
        .where(col("n_copies") > 0)
        .select(col("doc_id"), col("source"), col("n_copies"),
          explode(sequence(lit(0L), col("n_copies") - 1)).as("copy_idx"))
    }),

    "q128_export_pipeline" -> ((s, dir) => {
      // Export-side composition — what q121 is to curation, this is to
      // the training-run WRITER: one plan takes the corpus to the
      // (shard, per-shard order, pack) manifest a 1000-GPU loader
      // consumes. Stage 1: snake shard over the token-desc global rank
      // (q125's arithmetic). Stage 2: per-shard epoch order by md5 draw
      // (q104's deterministic shuffle) with per-shard token-budget packs
      // — realized as ONE global running sum ordered (shard, draw, id)
      // minus each shard's exclusive token prefix (prevCumByKey over the
      // S-row manifest), the q100 global-minus-prefix trick: per-shard
      // prefix sums out of a single range exchange, never a per-shard
      // window that would pull a whole shard through one task at 100 TB.
      val S = 8L; val B = 2048L
      val docs = t(s, dir, "documents").select(col("doc_id"),
        size(split(TextExprs.cleanText(col("text")), " ")).cast("long").as("n_toks"))
      val sharded = graft.operators.GlobalRank.withRowNumber(docs,
          Seq(col("n_toks").desc, col("doc_id").asc), "_rnk")
        .select(col("doc_id"), col("n_toks"),
          expr(s"IF(((_rnk - 1) DIV $S) % 2 = 0, (_rnk - 1) % $S, $S - 1 - ((_rnk - 1) % $S))")
            .as("shard_id"),
          md5(col("doc_id").cast("string")).as("_draw"))
      val shardToks = sharded.groupBy("shard_id").agg(sum("n_toks").as("stoks"))
      val prev = prevCumByKey(shardToks, "shard_id", "stoks")
      graft.operators.GlobalRank.withRunningSum(sharded,
          Seq(col("shard_id").asc, col("_draw").asc, col("doc_id").asc),
          col("n_toks"), "_gcum")
        .join(broadcast(prev), "shard_id")
        .select(col("doc_id"), col("shard_id"),
          (col("_gcum") - col("prev_cum")).as("cum_toks"),
          expr(s"(_gcum - prev_cum - n_toks) DIV $B").as("pack_id"))
    }),

    "q129_ann_index_upsert" -> ((s, dir) => {
      // Index upsert — q124's incremental contract applied to q123's
      // stored artifact: the index is BUILT on the standing corpus
      // (vec_id % 10 != 0), the ingest batch is APPENDED by encoding it
      // with the STORED quantizers (AnnIndex.append: one argmin pass,
      // zero Lloyd iterations, no refit — at 100 TB a refit per ingest
      // is the difference between an index and a batch job), and queries
      // immediately rank over old + new rows from the cell-partitioned
      // artifact. The oracle replays the slice-fit + assign-all chain,
      // so the hash gate proves the appended rows are encoded bit-
      // identically to a from-scratch encode under the same quantizers.
      val ixDir = s"target/ann_index_upsert/${new java.io.File(dir).getName}"
      val e = t(s, dir, "embeddings")
      graft.operators.AnnIndex.build(
        e.where(col("vec_id") % 10 =!= 0), col("vec_id"), col("embedding"), ixDir)
      graft.operators.AnnIndex.append(
        s, ixDir, e.where(col("vec_id") % 10 === 0), col("vec_id"), col("embedding"))
      // maintenance pass under the same hash gate: rewriting the multi-
      // fragment cells (build + append = 2 files each) must be invisible
      // to the query — compact ≡ append ≡ from-scratch
      graft.operators.AnnIndex.compact(s, ixDir, maxFragments = 1)
      val q = e.where(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"),
          col("embedding").cast("array<double>").as("qv"))
      graft.operators.AnnIndex.query(s, ixDir, q, k = 5, nProbe = 2)
    }),

    "q130_textrank" -> ((s, dir) => {
      // TextRank keyword ranking (Mihalcea & Tarau 2004): weighted
      // PageRank over the corpus word co-occurrence graph — the
      // unsupervised keyphrase primitive, and the engine's fixed-point
      // GRAPH dataflow (q53's connected components converge to a label;
      // this iterates a numeric rank to a damped stationary point).
      // Scale shape (operators.PageRank): the normalized edge table is
      // built ONCE (one corpus pass + map-combined hash-agg) and eagerly
      // localCheckpoint'ed — the CC lineage-truncation posture — so the
      // 5 unrolled iterations read shuffle-ready blocks (PlanSpec pins
      // ZERO source scans in the final plan); each iteration is join +
      // hash-agg on well-spread token keys — no windows, no driver
      // collect of corpus-sized state. The symmetric graph has no
      // dangling nodes, so damping mass is closed-form.
      val toks = t(s, dir, "documents")
        .select(split(lower(TextExprs.cleanText(col("text"))), " ").as("ts"))
      val edges = graft.operators.PageRank.adjacencyEdges(toks)
      graft.operators.PageRank.ranks(edges, iters = 5, damping = 0.85)
        .select(col("tok"), round(col("pr"), 6).as("pr"))
    }),

    "q131_pca_power" -> ((s, dir) => {
      // Top principal component of the embedding corpus — the whitening /
      // drift-axis primitive. ONE distributed pass (operators.GramAgg, a
      // fixed (d+1)²-double aggregation buffer with map-side partial
      // merge) reduces the corpus to the augmented second-moment matrix
      // [Σxxᵀ Σx; Σxᵀ n], so covariance needs no second scan and no
      // per-element row explosion; the d×d power iteration then runs
      // driver-side like a k-means centroid update — bounded by MODEL
      // dimension, independent of corpus size. λ is the final ‖C·v‖
      // eigenvalue estimate (same value on every row by construction).
      graft.operators.Pca.topComponent(
          t(s, dir, "embeddings"), col("embedding"), dim = 64, iters = 3)
        .select(col("dim_idx"), round(col("loading"), 6).as("loading"),
          round(col("lambda"), 6).as("lambda"))
    }),

    "q132_phrase_search" -> ((s, dir) => {
      // Exact phrase search over positional postings (the inverted-index
      // adjacency-anchor algorithm) with a bounded per-phrase top-k —
      // the retrieval-side complement of q52's BM25 bag-of-words scoring.
      // The phrase list is a shared Scala constant; the oracle SQL is
      // generated from the SAME constant so the two sides cannot drift.
      graft.operators.Retrieval.phraseSearch(
          t(s, dir, "documents"), col("doc_id"), col("text"),
          phraseQueries, k = 20)
        .select(col("phrase"), col("rank").as("rnk"), col("doc_id"), col("n_hits"))
    }),

    "q133_hash_classifier" -> ((s, dir) => {
      // Supervised hashed-feature NB quality filter (TextAnalysis
      // .hashNbClassifier): seed positives = sources src0–src4; 4096
      // md5-prefix buckets keep the model constant-sized at any corpus
      // scale (the fastText hashing trick), so the model join onto the
      // token stream broadcasts even at 100 TB.
      val posSources = (0 to 4).map(i => s"src$i")
      graft.operators.TextAnalysis.hashNbClassifier(
        t(s, dir, "documents"), col("doc_id"), col("text"),
        col("source").isin(posSources: _*))
    }),

    "q134_source_authority" -> ((s, dir) => {
      // Source-authority mixture weighting — PageRank over the INTER-
      // SOURCE shared-content graph (q108's overlap matrix as symmetric
      // edges, weight = shared distinct shingles): the CommonCrawl-style
      // domain-authority recipe for weighting feeds in a mixture —
      // sources whose content many other sources replicate rank higher.
      // Operator COMPOSITION: CorpusOverlap builds the bounded edge list
      // (corpus-sized work, |sources|²-bounded output), PageRank iterates
      // on the tiny graph, and the normalization to mixture weights is a
      // one-row broadcast cross join. All heavy lifting is q108's single
      // reused distinct-shingle exchange.
      // the edge list is bounded by C(|sources|, 2) — a property of the
      // source ENUM, not the corpus — so materialize it once to a local
      // relation (the k-means-centroid posture) instead of letting five
      // iteration subtrees re-reference the corpus-sized overlap pipeline
      val ov = graft.operators.CorpusOverlap.sourceOverlap(
        t(s, dir, "documents"), col("source"), col("text"), n = 5)
      val edgeRows = ov.select(col("src_a"), col("src_b"), col("inter")).collect()
      import s.implicits._
      val sym = edgeRows.toSeq.flatMap { r =>
        val (a, b, w) = (r.getString(0), r.getString(1), r.getLong(2))
        Seq((a, b, w), (b, a, w))
      }.toDF("u", "v", "w")
      val pr = graft.operators.PageRank.ranks(sym, iters = 5, damping = 0.85,
        materialize = false)
      val tot = pr.agg(sum("pr").as("_tot"))
      pr.crossJoin(broadcast(tot))
        .select(col("tok").as("source"), round(col("pr"), 6).as("authority"),
          round(col("pr") / col("_tot"), 6).as("mix_w"))
    }),

    "q135_margin_mining" -> ((s, dir) => {
      // Margin-based bitext mining (Artetxe & Schwenk 2019 — the LASER/
      // CCMatrix parallel-corpus recipe): score candidate (x, y) pairs by
      // cos(x,y) normalized by the MEAN of both sides' top-k neighborhood
      // similarities (ratio margin), then keep each x's best y above a
      // margin threshold — absolute-cosine thresholds are uncalibrated
      // across embedding regions; the margin is the fix. Sides simulate
      // two languages (vec_id parity). Neighborhood stats and the final
      // best-match cut are bounded TopKAgg heaps (k=4 and k=1 — Q·k rows
      // shuffle, never Q·C), ranking on 6-dp-ROUNDED scores so both
      // engines cut identically. Candidate generation is deterministic
      // 8-plane LSH blocking (q34's md5-derived hyperplane buckets —
      // DuckDB-replicable, so the twin scores the identical candidate
      // set): x meets y only inside its bucket, an EQUI-join on the
      // bucket key, so pair volume is Σ|bkt_x|·|bkt_y| ≈ |X||Y|/2^planes
      // — never the |X|×|Y| crossJoin. At 100 TB candidates come from
      // the q123 ANN index instead; the margin/mining dataflow is
      // candidate-agnostic and UNCHANGED.
      val planes = VectorExprs.deterministicPlanes(8, 64)
      val e = t(s, dir, "embeddings")
      // candidates = each x's forward top-4 (the paper mines within the
      // k-NN candidate set), so the margin/cut stage touches n·k rows and
      // the candidate-sized similarity stream is consumed exactly TWICE
      // (one bounded heap per direction); the forward heap's exchange
      // serves both its average and the candidate rows (ReuseExchange)
      val sims = graft.operators.Similarity.lshCandidatePairs(
          e.where(col("vec_id") % 2 === 0), col("vec_id"), col("embedding"),
          e.where(col("vec_id") % 2 === 1), col("vec_id"), col("embedding"),
          planes)
        .select(col("id_a").as("x_id"), col("id_b").as("y_id"), col("cos"))
      val fTop = TopKAgg.perKey(sims, col("x_id"), col("cos"), col("y_id"), 4)
      val fwd = fTop.groupBy("_k").agg(avg("score").as("fwd_avg"))
        .select(col("_k").as("x_id"), col("fwd_avg"))
      val bwd = TopKAgg.perKey(sims, col("y_id"), col("cos"), col("x_id"), 4)
        .groupBy("_k").agg(avg("score").as("bwd_avg"))
        .select(col("_k").as("y_id"), col("bwd_avg"))
      val margins = fTop
        .select(col("_k").as("x_id"), col("id").as("y_id"), col("score").as("cos"))
        .join(fwd, "x_id").join(bwd, "y_id")
        .select(col("x_id"), col("y_id"),
          round(col("cos") / ((col("fwd_avg") + col("bwd_avg")) / 2.0), 6).as("margin"))
      TopKAgg.perKey(margins, col("x_id"), col("margin"), col("y_id"), 1)
        .where(col("score") > 1.02)
        .select(col("_k").as("x_id"), col("id").as("y_id"), col("score").as("margin"))
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

    "q137_decayed_trend" -> ((s, dir) => {
      // Exponentially time-decayed activity ranking (half-life weighting
      // for "trending" detection): each event contributes
      // exp((ts − t_max)/τ) with τ = 7 days, so last week's events count
      // ~e times yesterday's don't — the standard freshness-weighted
      // count that a streaming leaderboard materializes. One scan, one
      // map-combined hash-agg; the corpus max timestamp rides a one-row
      // broadcast cross join (the BM25 N/avgdl pattern); recency_ratio =
      // decayed/n exposes which event types are ACCELERATING vs merely
      // large.
      val tau = 604800000000.0 // 7 days in microseconds
      val ev = t(s, dir, "events")
        .select(col("event_type"), unix_micros(col("ts")).as("_us"))
      val mx = ev.agg(max("_us").as("_mx"))
      ev.crossJoin(broadcast(mx))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          round(sum(exp((col("_us") - col("_mx")).cast("double") / lit(tau))), 4)
            .as("decayed"),
          round(sum(exp((col("_us") - col("_mx")).cast("double") / lit(tau)))
            / count(lit(1)), 6).as("recency_ratio"))
    }),

    "q138_novelty" -> ((s, dir) => {
      // Incremental novelty curve — per-doc share of distinct 3-gram
      // shingles FIRST seen in that doc (ingest order = doc_id): the
      // "how much new content does each increment add" diagnostic that
      // decides when a source is mined out (complements q108's pairwise
      // overlap and q113's incremental dedup). No sort, no window:
      // "first seen" is min(doc_id), not an ordered scan.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), split(TextExprs.cleanText(col("text")), " ").as("toks"))
        .where(size(col("toks")) >= 3)
      val u = docs.select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', slice(toks, i + 1, 3)))")))
        .as("h"))
      // both facts are AGGREGATES of the shingle stream — novel counts come
      // from rolling the first-occurrence table up by its min-doc (never
      // joining the corpus-sized stream back against it), so the only join
      // is doc-count-sized
      val counts = u.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      val novel = u.groupBy("h").agg(min("doc_id").as("_fd"))
        .groupBy(col("_fd").as("doc_id")).agg(count(lit(1)).as("n_novel"))
      counts.join(novel, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_shingles"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          round(coalesce(col("n_novel"), lit(0L)).cast("double") / col("n_shingles"), 6)
            .as("novel_share"))
    }),

    "q139_dup_attribution" -> ((s, dir) => {
      // Cross-source duplication ATTRIBUTION: roll q27's verified
      // near-dup pairs up to the source level — which feeds duplicate
      // into which (off-diagonal cells say "dedupe these two against
      // each other first"; the diagonal ranks internal duplication).
      // Complements q108 (shingle-set overlap ignores pair structure)
      // and q138 (novelty is temporal, this is pairwise). The rollup
      // input is the PAIR list — already a vanishing fraction of the
      // corpus — joined twice against the slim (id, source) projection;
      // cells are canonical (least, greatest) so the matrix is upper-
      // triangular regardless of id order.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
        shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.7)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("id_a"), col("source").as("_sa")), "id_a")
        .join(src.select(col("doc_id").as("id_b"), col("source").as("_sb")), "id_b")
        .groupBy(least(col("_sa"), col("_sb")).as("src_a"),
          greatest(col("_sa"), col("_sb")).as("src_b"))
        .agg(count(lit(1)).as("n_pairs"), round(avg("jaccard"), 6).as("avg_jaccard"))
    }),

    "q140_abtt_residual" -> ((s, dir) => {
      // All-but-the-top embedding postprocessing (Mu & Viswanath 2018):
      // remove the dominant principal component from every embedding —
      // the common-direction bias that inflates all cosines — and report
      // each vector's projection onto it plus the residual norm. USES
      // q131's operator: the component is fit by the one-pass Gram
      // reduction (model-dim-bounded driver state), then applied in a
      // single codegen'd pass with the component as a broadcast-style
      // literal array — fit-once/apply-everywhere, the q89 model/apply
      // posture for linear algebra.
      val e = t(s, dir, "embeddings")
      val u = graft.operators.Pca.topComponent(e, col("embedding"), dim = 64, iters = 3)
        .orderBy("dim_idx").collect().map(_.getDouble(1))
      val uLit = array(u.map(lit): _*)
      val proj = VectorExprs.dot(expr("transform(embedding, x -> cast(x AS double))"), uLit)
      e.select(col("vec_id"), proj.as("_p"),
          VectorExprs.dot(expr("transform(embedding, x -> cast(x AS double))"),
            expr("transform(embedding, x -> cast(x AS double))")).as("_n2"))
        .select(col("vec_id"), round(col("_p"), 6).as("proj"),
          round(sqrt(greatest(col("_n2") - col("_p") * col("_p"), lit(0.0))), 6)
            .as("residual_norm"))
    }),

    "q141_cdc_chunks" -> ((s, dir) => {
      // Content-defined chunking (the FastCDC/rsync recipe at token
      // granularity): a boundary falls AFTER any token whose md5 lands
      // in 1/8 of hash space, so boundaries are a pure function of LOCAL
      // content — an insertion shifts at most one chunk, which is what
      // makes chunk-hash dedup robust to edits (fixed-size blocks lose
      // every hash downstream of an edit). chunk_idx is a per-doc
      // partitioned-window prefix sum of boundary flags; the duplicate
      // index rolls chunk hashes up with the q55 two-level trick ((h,
      // doc) first, then h) so distinct-doc counts never plan Expand.
      graft.operators.CdcChunk.dupIndex(graft.operators.CdcChunk.chunks(
        t(s, dir, "documents"), col("doc_id"), col("text")))
    }),

    "q142_stupid_backoff" -> ((s, dir) => {
      // Stupid Backoff held-out scoring (Brants et al. 2007 — the
      // smoothing that wins at web scale precisely because it does NOT
      // normalize): S(w2|w1) = c(w1w2)/c(w1) when the bigram is in the
      // TRAIN slice, else 0.4·(c(w2)+1)/(N+V) (unigram backoff with an
      // epsilon floor for train-OOV types). Unlike q106 (Laplace,
      // self-trained), the model here is fit on doc_id % 5 ≠ 0 and
      // scores the HELD-OUT % 5 = 0 slice, so unseen bigrams genuinely
      // occur and backoff_rate measures them. Model tables are bigram-
      // type-sized and join UNHINTED (q89 posture); scalars ride one-row
      // broadcast cross joins.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), split(lower(TextExprs.cleanText(col("text"))), " ").as("toks"))
      def bigrams(d: DataFrame) = d.where(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> named_struct('w1', toks[i-1], 'w2', toks[i]))")).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val train = docs.where(col("doc_id") % 5 =!= 0)
      val uni = train.select(explode(col("toks")).as("tok")).where(col("tok") =!= "")
        .groupBy("tok").agg(count(lit(1)).as("c"))
      val scal = uni.agg(sum("c").as("n"), count(lit(1)).as("v"))
      val m2 = bigrams(train).groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      val m1 = bigrams(train).groupBy("w1").agg(count(lit(1)).as("c1"))
      val held = bigrams(docs.where(col("doc_id") % 5 === 0))
      val s12 = when(col("c12").isNotNull,
          col("c12").cast("double") / col("c1"))
        .otherwise(lit(0.4) * (coalesce(col("_c2"), lit(0L)) + 1.0) / (col("n") + col("v")))
      held
        .join(m2, Seq("w1", "w2"), "left")
        .join(m1.withColumnRenamed("w1", "w1"), Seq("w1"), "left")
        .join(uni.select(col("tok").as("w2"), col("c").as("_c2")), Seq("w2"), "left")
        .crossJoin(broadcast(scal))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(-log(s12)), 4).as("xent"),
          round(avg(when(col("c12").isNull, 1.0).otherwise(0.0)), 4).as("backoff_rate"))
    }),

    "q143_retrieve_rerank" -> ((s, dir) => {
      // The full two-stage retrieval stack in ONE query: SPARSE retrieve
      // (q52's BM25 over the token stream) → bounded top-20 pool on the
      // ROUNDED score → DENSE diversify (q118's greedy MMR over the
      // pool's embeddings, driver-side on the k² = 400 bounded sims).
      // This is the retrieve-then-rerank architecture every RAG/search
      // stack runs; both stages already exist as operators — this query
      // is their composition, and the corpus-sized work remains entirely
      // in the BM25 stage.
      val lam = 0.7
      val bm = Retrieval.bm25(t(s, dir, "documents"), col("doc_id"), col("text"),
        terms = Seq("spark", "vector", "stream"))
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id").as("doc_id"), col("embedding").cast("array<double>").as("v"))
      val pool = bm.join(emb, "doc_id")
        .orderBy(col("score").desc, col("doc_id").asc).limit(20)
        .collect()
      val cand = pool.toSeq.map(r =>
        (r.getLong(0), r.getDouble(1), r.getSeq[Double](2)))
      val sp = s
      import sp.implicits._
      graft.operators.Mmr.rerank(cand, k = 5, lam = lam)
        .toDF("rnk", "doc_id", "mmr_score")
    }),

    "q144_lang_confusion" -> ((s, dir) => {
      // Language-ID EVALUATION: confusion matrix of the stopword-scan
      // classifier (q24) against the fixture's gold labels, with
      // per-true-language share — the quality gate you run before
      // trusting a lang filter at 100 TB (a systematic es→fr confusion
      // silently reweights the training mixture). One scan + one
      // |langs|²-bounded hash-agg; per-lang totals broadcast.
      val pred = TextExprs.withLangId(t(s, dir, "documents"), col("text"), "lang_pred")
        .select(col("lang"), col("lang_pred"))
      val cells = pred.groupBy("lang", "lang_pred").agg(count(lit(1)).as("n"))
      val tot = cells.groupBy("lang").agg(sum("n").as("_t"))
      cells.join(broadcast(tot), "lang")
        .select(col("lang"), col("lang_pred"), col("n"),
          round(col("n").cast("double") / col("_t"), 6).as("share"),
          (col("lang") === col("lang_pred")).as("correct"))
    }),

    "q145_calibration" -> ((s, dir) => {
      // Reliability diagram for the q133 quality filter: rank-based
      // DECILES of the score distribution (all-integer bin arithmetic —
      // the q136 trick, so no float boundary moves a doc between bins)
      // vs the observed positive rate per bin. A well-calibrated filter
      // shows pos_rate rising monotonically with mean_w; a flat curve
      // means the scores carry no signal and any threshold is arbitrary
      // — THE check before picking a keep cutoff at 100 TB. The rank is
      // GlobalRank's range exchange (no global window); bin totals are a
      // 10-row aggregate.
      val posSources = (0 to 4).map(i => s"src$i")
      val docs = t(s, dir, "documents")
      val scored = graft.operators.TextAnalysis.hashNbClassifier(
        docs, col("doc_id"), col("text"), col("source").isin(posSources: _*))
      val lab = scored.join(docs.select(col("doc_id"), col("source")), "doc_id")
        .select(col("doc_id"), col("quality_w"),
          when(col("source").isin(posSources: _*), 1L).otherwise(0L).as("y"))
        .localCheckpoint(true) // slim per-doc manifest; rank + total read it
      val ranked = graft.operators.GlobalRank.withRowNumber(lab,
        Seq(col("quality_w").asc, col("doc_id").asc), "_rn")
      val tot = lab.agg(count(lit(1)).as("_n"))
      ranked.crossJoin(broadcast(tot))
        .select(expr("((_rn - 1) * 10) DIV _n").as("decile"),
          col("quality_w"), col("y"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          (round(avg("quality_w"), 4) + 0.0).as("mean_w"),
          round(avg(col("y").cast("double")), 4).as("pos_rate"))
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

    "q150_rater_agreement" -> ((s, dir) => {
      // Filter AGREEMENT: Cohen's κ between two independent quality
      // gates — the learned NB filter (q133 `keep`) and the rule-based
      // Gopher pass (q79 `passes`) — per language. Two curation filters
      // that agree only at chance level (κ ≈ 0) cannot both be trusted;
      // this is the cross-check a 100 TB pipeline runs before composing
      // them. Shape: both classifier passes are corpus scans; the κ
      // arithmetic runs on a |langs|-row contingency aggregate.
      val posSources = (0 to 4).map(i => s"src$i")
      val docs = t(s, dir, "documents")
      val nb = graft.operators.TextAnalysis.hashNbClassifier(
          docs, col("doc_id"), col("text"), col("source").isin(posSources: _*))
        .select(col("doc_id"), col("keep"))
      val rules = graft.operators.TextAnalysis.gopherRules(
          docs, col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("passes"))
      val cells = nb.join(rules, "doc_id")
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(when(col("keep") && col("passes"), 1L).otherwise(0L)).as("n11"),
          sum(when(col("keep") && !col("passes"), 1L).otherwise(0L)).as("n10"),
          sum(when(!col("keep") && col("passes"), 1L).otherwise(0L)).as("n01"),
          sum(when(!col("keep") && !col("passes"), 1L).otherwise(0L)).as("n00"))
      val po = (col("n11") + col("n00")).cast("double") / col("n")
      val pe = ((col("n11") + col("n10")) * (col("n11") + col("n01"))
          + (col("n01") + col("n00")) * (col("n10") + col("n00")))
        .cast("double") / (col("n") * col("n"))
      cells.select(col("lang"), col("n"), col("n11"), col("n10"),
        col("n01"), col("n00"),
        round(po, 6).as("po"), round(pe, 6).as("pe"),
        when(pe === 1.0, lit(1.0))
          .otherwise(round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
    }),

    "q147_knn_graph" -> ((s, dir) => {
      // Mutual k-NN GRAPH clustering over the embedding corpus: each
      // vector's top-4 cosine neighbors, an edge kept only when BOTH
      // endpoints pick each other (mutuality prunes hub noise — the
      // NN-descent/graph-clustering baseline), connected components
      // label the clusters, singletons keep their own id. Candidate
      // generation is deterministic 8-plane LSH BLOCKING (q34's
      // md5-derived hyperplane buckets — DuckDB-replicable, so the twin
      // ranks the identical candidate set): pairs meet only inside
      // their bucket, an EQUI-join on the bucket key, so the pair
      // volume is Σ|bucket|² ≈ n²/2^planes, never the n² crossJoin.
      // At 100 TB candidates come from the q123 IVF index instead and
      // the downstream — per-node bounded-heap top-k, n·k mutuality
      // self-join, CC — is UNCHANGED.
      val planes = VectorExprs.deterministicPlanes(8, 64)
      val e = t(s, dir, "embeddings")
      val sims = graft.operators.Similarity.lshCandidatePairs(
        e, col("vec_id"), col("embedding"),
        e, col("vec_id"), col("embedding"), planes)
      // bounded heap, NOT a window: partial aggregation reduces every map
      // partition to ≤4 rows per node before the shuffle, so the bucketed
      // score stream is never exchanged or sorted (TopKAgg tie-break = the
      // window's (cos DESC, id ASC)); the n·k result is checkpointed
      // eagerly because BOTH mutuality sides and CC read it — without the
      // pin the self-join re-evaluates the whole candidate pipeline
      val topk = graft.operators.TopKAgg
        .perKey(sims, col("id_a"), col("cos"), col("id_b"), 4)
        .select(col("_k").as("id_a"), col("id").as("id_b"))
        .localCheckpoint(true)
      val mutual = topk.join(
          topk.select(col("id_b").as("id_a"), col("id_a").as("id_b")),
          Seq("id_a", "id_b"))
        .where(col("id_a") < col("id_b"))
      val labels = graft.operators.Dedup.connectedComponents(mutual)
        .withColumnRenamed("node", "vec_id")
      val lab = e.select(col("vec_id")).join(labels, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("component"), col("vec_id")).as("cluster_id"))
      val sizes = lab.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      lab.join(sizes, "cluster_id")
        .select(col("vec_id"), col("cluster_id"), col("cluster_size"))
    }),

    "q148_cms_freq" -> ((s, dir) => {
      // COUNT-MIN SKETCH (Cormode & Muthukrishnan 2005): a 4×256
      // mergeable frequency sketch over the token stream, then the
      // estimate/exact error audit on the top-20 tokens. CMS is linear,
      // so the sketch is built from the PRE-AGGREGATED vocab table (one
      // corpus-keyed shuffle, map-side partials) instead of exploding
      // the raw stream 4× — identical arithmetic, quarter the shuffle.
      // The 1024-cell sketch is the whole reduced state: this is the
      // shape that merges across 1000 executors and across days. Top-20
      // selection rides GlobalRank (range exchange, deterministic
      // (cnt DESC, tok) order) — no single-partition sort at any vocab
      // size. Every estimate is ≥ truth (one-sided CMS error); the
      // audit checks the ε = e/w bound against N.
      val toks = t(s, dir, "documents")
        .select(explode(split(lower(TextExprs.cleanText(col("text"))), " ")).as("tok"))
        .where(col("tok") =!= "")
      val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      val rows4 = array((0 until 4).map(j => lit(j)): _*)
      def bkt(j: Column, tok: Column): Column =
        conv(substring(md5(concat(j.cast("string"), lit(":"), tok)), 1, 2), 16, 10)
          .cast("long")
      val cells = counts.select(col("cnt"), explode(rows4).as("j"), col("tok"))
        .select(col("j"), bkt(col("j"), col("tok")).as("bkt"), col("cnt"))
        .groupBy("j", "bkt").agg(sum("cnt").as("c"))
      val tot = counts.agg(sum("cnt").as("_n"))
      val top = graft.operators.GlobalRank.withRowNumber(counts,
          Seq(col("cnt").desc, col("tok").asc), "_rn")
        .where(col("_rn") <= 20)
        .select(col("tok"), col("cnt").as("true_cnt"))
      val est = top.select(col("tok"), col("true_cnt"), explode(rows4).as("j"))
        .select(col("tok"), col("true_cnt"), col("j"),
          bkt(col("j"), col("tok")).as("bkt"))
        .join(broadcast(cells), Seq("j", "bkt"))
        .groupBy("tok", "true_cnt").agg(min("c").as("cms_est"))
      est.crossJoin(broadcast(tot))
        .select(col("tok"), col("true_cnt"), col("cms_est"),
          (col("cms_est") - col("true_cnt")).as("overest"),
          ((col("cms_est") - col("true_cnt")).cast("double")
            <= exp(lit(1.0)) / 256.0 * col("_n")).as("within_bound"))
    }),

    "q149_boilerplate" -> ((s, dir) => {
      // Segment-level BOILERPLATE detection (the CCNet/RefinedWeb
      // paragraph-hash recipe, on fixed 3-token segments since the
      // fixture has no line structure): a segment whose hash recurs in
      // ≥2 documents and >5% of its source's documents is boilerplate
      // (nav bars, footers, licence blurbs). Shape: one corpus scan →
      // segment-hash stream → one (source, hash) aggregate → broadcast
      // per-source doc totals → |sources|-row summary. The doc-frequency
      // aggregate is the only corpus-sized shuffle; nothing rejoins the
      // text.
      val base = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          split(lower(TextExprs.cleanText(col("text"))), " ").as("toks"))
        .where(size(col("toks")) >= 1)
      val segs = base
        .select(col("doc_id"), col("source"),
          explode(transform(
            sequence(lit(0), ceil(size(col("toks")) / lit(3.0)).cast("int") - 1),
            i => concat_ws(" ", slice(col("toks"), i * 3 + 1, lit(3))))).as("seg"))
        .where(col("seg") =!= "")
        .select(col("doc_id"), col("source"),
          substring(md5(col("seg")), 1, 16).as("h"))
      val df = segs.groupBy("source", "h")
        .agg(count(lit(1)).as("occ"), countDistinct("doc_id").as("ndf"))
      val srcTot = base.groupBy("source").agg(count(lit(1)).as("sdocs"))
      df.join(broadcast(srcTot), "source")
        .select(col("source"), col("occ"),
          (col("ndf") >= 2 && col("ndf") * 20 > col("sdocs")).as("boiler"))
        .groupBy("source")
        .agg(sum("occ").as("n_seg_occ"),
          count(lit(1)).as("n_distinct_segs"),
          sum(when(col("boiler"), 1L).otherwise(0L)).as("n_boiler_segs"),
          sum(when(col("boiler"), col("occ")).otherwise(0L)).as("boiler_occ"))
        .withColumn("boiler_share",
          round(col("boiler_occ").cast("double") / col("n_seg_occ"), 6))
    }),

    "q151_bloom_decontaminate" -> ((s, dir) => {
      // TWO-STAGE decontamination: a 2^18-bit / 4-hash Bloom filter
      // over the benchmark's 5-gram shingles prefilters the train side,
      // then exact membership verifies only the candidates. Sizing
      // follows the ~20-bits/element rule the repo's ScaleProbe bloom
      // mode measured (2^14 saturated at 95% fill on the sf0.1 shingle
      // set and prefiltered NOTHING; 2^18 keeps fill in the selective
      // regime). At 100 TB the benchmark set is small and the bloom
      // rides along as a BROADCAST (here: its set-bit table, bounded by
      // 4·|bench| ≤ 2^18 rows) — the train shingle stream is filtered
      // scan-side and NEVER shuffled against the benchmark; the exact
      // join touches candidate shingles only.
      // All hashing is md5-derived (positions = hex5(md5(j:h)) mod 2^18)
      // so the DuckDB twin runs the identical bloom. One-sided by
      // construction: exact hits ⊆ bloom hits; `bloom_fp_only` marks
      // docs the bloom flagged that exact verify clears — the measured
      // FP cost of the prefilter.
      val docs = t(s, dir, "documents")
      val toks = docs.select(col("doc_id"),
        split(TextExprs.cleanText(col("text")), " ").as("toks"))
      val sh = toks.select(col("doc_id"),
          explode(graft.operators.Dedup.shinglesOfToks(col("toks"), 5)).as("g"))
        .select(col("doc_id"), substring(md5(col("g")), 1, 16).as("h"))
      // benchmark-sized; read by the bit table AND the exact verify
      val bench = sh.where(col("doc_id") % 20 === 0).select(col("h")).distinct()
        .localCheckpoint(true)
      val js = array((0 until 4).map(j => lit(j)): _*)
      def pos(j: Column, h: Column): Column =
        conv(substring(md5(concat(j.cast("string"), lit(":"), h)), 1, 5), 16, 10)
          .cast("long") % 262144
      val bits = bench.select(explode(js).as("j"), col("h"))
        .select(pos(col("j"), col("h")).as("pos")).distinct()
      val train = sh.where(col("doc_id") % 20 =!= 0)
        .select(col("doc_id"), col("h")).distinct()
      val hit = train.select(col("doc_id"), col("h"), explode(js).as("j"))
        .select(col("doc_id"), col("h"), pos(col("j"), col("h")).as("pos"))
        .join(broadcast(bits), "pos")
        .groupBy("doc_id", "h").agg(count(lit(1)).as("_k"))
        .where(col("_k") === 4)
        .localCheckpoint(true) // candidate-sized; bloom count + verify read it
      val nb = hit.groupBy("doc_id").agg(count(lit(1)).as("n_bloom_hits"))
      val ne = hit.select("doc_id", "h").join(bench, "h")
        .groupBy("doc_id").agg(count(lit(1)).as("n_exact_hits"))
      nb.join(ne, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_bloom_hits"),
          coalesce(col("n_exact_hits"), lit(0L)).as("n_exact_hits"),
          (coalesce(col("n_exact_hits"), lit(0L)) === 0L).as("bloom_fp_only"))
    }),

    "q152_dist_drift" -> ((s, dir) => {
      // Token-distribution DRIFT monitor: per-source KL divergence of an
      // incoming batch slice against the standing corpus (add-1
      // smoothing over each source's union vocabulary) — the ingest
      // gate that catches a source silently changing register/topic
      // before it skews the training mixture. One scan → one
      // (source, token) aggregate with both sides as conditional sums
      // (no second pass, no join of two token streams) → per-source
      // totals broadcast back onto the vocab-sized table.
      val docs = t(s, dir, "documents")
      val tk = docs.select(col("source"),
          (col("doc_id") % 10 === 0).as("is_batch"),
          explode(split(lower(TextExprs.cleanText(col("text"))), " ")).as("tok"))
        .where(col("tok") =!= "")
      val counts = tk.groupBy("source", "tok")
        .agg(sum(when(col("is_batch"), 1L).otherwise(0L)).as("cb"),
          sum(when(col("is_batch"), 0L).otherwise(1L)).as("cc"))
      val tot = counts.groupBy("source")
        .agg(sum("cb").as("nb"), sum("cc").as("nc"), count(lit(1)).as("v"))
      counts.join(broadcast(tot), "source")
        .select(col("source"), col("nb"), col("nc"), col("v"),
          ((col("cb") + 1).cast("double") / (col("nb") + col("v"))).as("p"),
          ((col("cc") + 1).cast("double") / (col("nc") + col("v"))).as("q"))
        .groupBy("source")
        .agg(max("v").as("vocab"),
          max("nb").as("n_batch_toks"), max("nc").as("n_corpus_toks"),
          round(sum(col("p") * log(col("p") / col("q"))), 6).as("kl"))
        .withColumn("drifted", col("kl") > 0.02)
    }),

    "q153_cluster_ari" -> ((s, dir) => {
      // Clustering AGREEMENT: adjusted Rand index + purity of the
      // deterministic 8-plane LSH partition (q34's buckets) against the
      // fixture's gold labels — the external-validity check you run on
      // any unsupervised partition (SemDeDup cells, IVF lists) before
      // trusting it to steer curation. Shape: one scan → (bucket, label)
      // contingency (≤ buckets×labels rows) → all pair-counting
      // arithmetic on the reduced table; C(x,2) sums stay in exact
      // integer form until the final double division.
      val planes = VectorExprs.deterministicPlanes(8, 64)
      val lb = t(s, dir, "embeddings").select(
        VectorExprs.hyperplaneBucket(col("embedding"), planes).as("bucket"),
        col("label").cast("long").as("label"))
      val cont = lb.groupBy("bucket", "label").agg(count(lit(1)).as("nij"))
      val byB = cont.groupBy("bucket")
        .agg(sum("nij").as("ai"), max("nij").as("mx"))
      val byL = cont.groupBy("label").agg(sum("nij").as("bj"))
      val s1 = cont.agg(sum(col("nij") * (col("nij") - 1)).as("_sij2"),
        sum("nij").as("_n"))
      val s2 = byB.agg(sum(col("ai") * (col("ai") - 1)).as("_sa2"),
        sum("mx").as("_pur"), count(lit(1)).as("_nb"))
      val s3 = byL.agg(sum(col("bj") * (col("bj") - 1)).as("_sb2"),
        count(lit(1)).as("_nl"))
      s1.crossJoin(s2).crossJoin(s3)
        .withColumn("_hij", col("_sij2") / lit(2.0))
        .withColumn("_ha", col("_sa2") / lit(2.0))
        .withColumn("_hb", col("_sb2") / lit(2.0))
        .withColumn("_cn2", expr("_n * (_n - 1) DIV 2"))
        .withColumn("_exp", col("_ha") * col("_hb") / col("_cn2"))
        .select(col("_n").as("n"), col("_nb").as("n_buckets"),
          col("_nl").as("n_labels"),
          round((col("_hij") - col("_exp"))
            / ((col("_ha") + col("_hb")) / 2.0 - col("_exp")), 6).as("ari"),
          round(col("_pur").cast("double") / col("_n"), 6).as("purity"))
    }),

    "q154_ranking_ndcg" -> ((s, dir) => {
      // Ranking EVALUATION: nDCG@20 of the q133 quality score against
      // the gold source labels — does the filter's ORDERING concentrate
      // the positives at the top (complement of q145's calibration,
      // which checks the probabilities)? The rank is GlobalRank's range
      // exchange; DCG reads 20 rows; the ideal DCG closed form comes
      // from a 20-row range, never a second corpus pass.
      val posSources = (0 to 4).map(i => s"src$i")
      val docs = t(s, dir, "documents")
      val scored = graft.operators.TextAnalysis.hashNbClassifier(
        docs, col("doc_id"), col("text"), col("source").isin(posSources: _*))
      val lab = scored.join(docs.select(col("doc_id"), col("source")), "doc_id")
        .select(col("doc_id"), col("quality_w"),
          when(col("source").isin(posSources: _*), 1L).otherwise(0L).as("y"))
        .localCheckpoint(true) // slim per-doc manifest; rank + n_pos read it
      val ranked = graft.operators.GlobalRank.withRowNumber(lab,
        Seq(col("quality_w").desc, col("doc_id").asc), "_rn")
      val dcg = ranked.where(col("_rn") <= 20)
        .agg(sum(col("y").cast("double") / log2(col("_rn") + 1)).as("_dcg"))
      val npos = lab.agg(sum("y").as("_np"))
      val idcg = s.range(1, 21).crossJoin(broadcast(npos))
        .where(col("id") <= least(col("_np"), lit(20L)))
        .agg(sum(lit(1.0) / log2(col("id") + 1)).as("_idcg"))
      dcg.crossJoin(broadcast(npos)).crossJoin(broadcast(idcg))
        .select(lit(20L).as("k"), col("_np").as("n_pos"),
          round(col("_dcg"), 6).as("dcg"),
          round(col("_idcg"), 6).as("idcg"),
          round(col("_dcg") / col("_idcg"), 6).as("ndcg"))
    }),

    "q155_minhash_estimate" -> ((s, dir) => {
      // MinHash ESTIMATOR AUDIT: 64-perm signature Jaccard estimates vs
      // exact set Jaccard, per candidate pair — the accuracy check
      // behind every LSH dedup threshold (q27's bands assume the
      // estimator concentrates; this measures it). Runs on a 10%
      // deterministic doc sample (the posture at 100 TB: audit a
      // sample, trust the bands on the corpus), so the shared-shingle
      // pair fan-out and the ×64 perm explode stay bounded. Exact side
      // = shared-count arithmetic c/(na+nb−c), never array intersects
      // of materialized lists.
      val docs = t(s, dir, "documents").where(col("doc_id") % 10 === 0)
      val toks = docs.select(col("doc_id"),
        split(TextExprs.cleanText(col("text")), " ").as("toks"))
      // the (doc, hash) sample is read by FOUR subtrees (sizes, both
      // shared-join sides, the signature build) — eager-checkpoint the
      // bounded sample once instead of four corpus scans
      val u = toks.select(col("doc_id"),
          explode(graft.operators.Dedup.shinglesOfToks(col("toks"), 3)).as("g"))
        .select(col("doc_id"), substring(md5(col("g")), 1, 16).as("h"))
        .distinct()
        .localCheckpoint(true)
      val sizes = u.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val shared = u.select(col("doc_id").as("id_a"), col("h"))
        .join(u.select(col("doc_id").as("id_b"), col("h")), "h")
        .where(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("c"))
      val cand = shared
        .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("na")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("nb")), "id_b")
        .select(col("id_a"), col("id_b"),
          (col("c").cast("double") / (col("na") + col("nb") - col("c"))).as("jac"))
        .where(col("jac") >= 0.2)
      val perms = array((0 until 64).map(p => lit(p)): _*)
      val sig = u.select(col("doc_id"), explode(perms).as("p"), col("h"))
        .select(col("doc_id"), col("p"),
          md5(concat(col("p").cast("string"), lit(":"), col("h"))).as("ph"))
        .groupBy("doc_id", "p").agg(min("ph").as("mh"))
      val est = cand
        .join(sig.select(col("doc_id").as("id_a"), col("p"), col("mh").as("ma")), "id_a")
        .join(sig.select(col("doc_id").as("id_b"), col("p"), col("mh").as("mb")),
          Seq("id_b", "p"))
        .groupBy("id_a", "id_b", "jac")
        .agg((sum(when(col("ma") === col("mb"), 1L).otherwise(0L))
          .cast("double") / 64.0).as("est"))
      est.select(col("id_a"), col("id_b"),
        round(col("jac"), 6).as("exact_jac"),
        round(col("est"), 6).as("est_jac"),
        round(abs(col("est") - col("jac")), 6).as("abs_err"))
    }),

    "q156_threshold_tune" -> ((s, dir) => {
      // Threshold AUTO-TUNE: q146's one-pass bin/suffix-sum sweep, now
      // against the gold labels — precision/recall/F1 at every cutoff
      // and the argmax row flagged. This is the decision step after
      // q145 (calibration) and q154 (ranking): pick the keep-threshold
      // BEFORE the 100 TB filter run, from one classifier pass and a
      // 21-row table. All boundary arithmetic is integer
      // ten-thousandths; TP/FP are suffix sums over the bins, FN comes
      // from the broadcast positive total.
      val posSources = (0 to 4).map(i => s"src$i")
      val docs = t(s, dir, "documents")
      val scored = graft.operators.TextAnalysis.hashNbClassifier(
        docs, col("doc_id"), col("text"), col("source").isin(posSources: _*))
      val lab = scored.join(docs.select(col("doc_id"), col("source")), "doc_id")
        .select(round(col("quality_w") * 10000).cast("long").as("w4"),
          when(col("source").isin(posSources: _*), 1L).otherwise(0L).as("y"))
      val bins = lab
        .select(when(col("w4") < -10000L, lit(-1L))
            .otherwise(least(expr("(w4 + 10000) DIV 1000"), lit(20L))).as("bin"),
          col("y"))
        .groupBy("bin")
        .agg(count(lit(1)).as("_nd"), sum("y").as("_np"))
        .localCheckpoint(true) // ≤22 rows, read by sweep, total AND argmax
      val tot = bins.agg(sum("_nd").as("_td"), sum("_np").as("_tp"))
      val grid = s.range(0, 21).select(col("id").as("ti"))
      val sweep = grid.join(broadcast(bins), col("bin") >= col("ti"), "left")
        .groupBy("ti")
        .agg(coalesce(sum("_nd"), lit(0L)).as("kept"),
          coalesce(sum("_np"), lit(0L)).as("tp"))
        .crossJoin(broadcast(tot))
        .select(col("ti"), col("kept"), col("tp"),
          (col("kept") - col("tp")).as("fp"),
          (col("_tp") - col("tp")).as("fn"), col("_tp"))
        .withColumn("precision",
          when(col("kept") === 0L, lit(0.0))
            .otherwise(col("tp").cast("double") / col("kept")))
        .withColumn("recall", col("tp").cast("double") / col("_tp"))
        .withColumn("f1",
          when(col("tp") === 0L, lit(0.0))
            .otherwise(lit(2.0) * col("precision") * col("recall")
              / (col("precision") + col("recall"))))
      val best = sweep.agg(max("f1").as("_bf"))
      sweep.crossJoin(broadcast(best))
        .select(((col("ti") * 1000 - 10000) / lit(10000.0)).as("threshold"),
          col("kept"), col("tp"), col("fp"), col("fn"),
          round(col("precision"), 6).as("prec"),
          round(col("recall"), 6).as("recall"),
          round(col("f1"), 6).as("f1"),
          (col("f1") === col("_bf")).as("is_best"))
    }),

    "q157_k_anonymity" -> ((s, dir) => {
      // k-ANONYMOUS release (k = 5) of per-(source, lang) corpus stats:
      // quasi-identifier groups smaller than k are SUPPRESSED into one
      // '*' bucket instead of being published — the privacy-release
      // counterpart to q70's PII redaction (a group of 2 docs with a
      // rare (source, lang) pair re-identifies even with the text
      // removed). Shape: one aggregate over the quasi-identifier, then
      // a group-count-sized split; the release decision never rescans
      // the corpus.
      val g = t(s, dir, "documents").groupBy("source", "lang")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("_sc"))
      val released = g.where(col("n") >= 5)
        .select(col("source"), col("lang"), col("n"),
          round(col("_sc") / col("n"), 2).as("avg_chars"))
      // the residual bucket must itself satisfy k-anonymity: if the
      // suppressed groups sum to fewer than k docs, publishing even the
      // '*' row would expose an equivalence class below k — withhold it
      val supp = g.where(col("n") < 5)
        .agg(coalesce(sum("n"), lit(0L)).as("n"),
          coalesce(sum("_sc"), lit(0L)).as("_sc"))
        .where(col("n") >= 5)
        .select(lit("*").as("source"), lit("*").as("lang"), col("n"),
          round(col("_sc") / col("n"), 2).as("avg_chars"))
      released.unionByName(supp)
    }),

    "q158_centroid_drift" -> ((s, dir) => {
      // Embedding-space DRIFT monitor (the vector counterpart of q152's
      // token KL): per-label cosine between the batch slice's centroid
      // and the standing corpus's — an embedding-model swap, a corrupted
      // encoder, or a semantic shift in a source shows up as centroid
      // rotation long before token stats move. ONE aggregate with 2×64
      // conditional per-dimension means (the q78 declarative-sums
      // pattern — no posexplode row inflation, no second scan); the
      // cosine runs on the |labels|-row result.
      val e = t(s, dir, "embeddings").select(
        col("label").cast("long").as("label"),
        (col("vec_id") % 8 === 0).as("b"), col("embedding").as("v"))
      val aggs = (1 to 64).flatMap(i => Seq(
        avg(when(col("b"), element_at(col("v"), i).cast("double"))).as(s"_a$i"),
        avg(when(!col("b"), element_at(col("v"), i).cast("double"))).as(s"_c$i")))
      val g = e.groupBy("label")
        .agg(count(when(col("b"), lit(1))).as("n_batch"),
          (count(when(!col("b"), lit(1))).as("n_corpus") +: aggs): _*)
      val ca = array((1 to 64).map(i => col(s"_a$i")): _*)
      val cc = array((1 to 64).map(i => col(s"_c$i")): _*)
      g.where(col("n_batch") > 0 && col("n_corpus") > 0)
        .select(col("label"), col("n_batch"), col("n_corpus"),
          round(VectorExprs.cosine(ca, cc), 6).as("centroid_cos"))
        .withColumn("drifted", col("centroid_cos") < 0.999)
    }),

    "q159_leakage_split" -> ((s, dir) => {
      // LEAKAGE-SAFE train/test split: after the deterministic 10% test
      // draw, any train document that is a NEAR-DUP of a test document
      // is QUARANTINED — the split-hygiene step that keeps eval numbers
      // honest (a verbatim-ish copy of a test doc in train is silent
      // contamination that q71's exact n-gram check misses once a few
      // tokens drift). Composition: the q27 banded LSH pair stream
      // (ids-only), symmetrized, semi-joined against the test side; the
      // corpus text is never rejoined after pair generation.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
          shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.7)
        .select("id_a", "id_b")
      val sym = pairs.union(
        pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      val quarantine = sym.where(col("id_a") % 10 === 7)
        .select(col("id_b").as("doc_id")).distinct()
        .withColumn("_q", lit(true))
      docs.select(col("doc_id")).join(quarantine, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 7, lit("test"))
            .when(col("_q"), lit("quarantined"))
            .otherwise(lit("train")).as("split"))
    }),

    "q160_mask_corruption" -> ((s, dir) => {
      // Self-supervised EXAMPLE GENERATION: BERT/T5-style token masking
      // with a DETERMINISTIC md5 position draw (≈ 15.6% of positions:
      // first hash byte < 0x28) — corrupted input + extraction targets
      // from one codegen'd pass, no RNG state, bit-reproducible across
      // re-runs and engines (the property a 100 TB example-builder needs
      // for resumable jobs and audit). One scan; everything is per-row
      // array arithmetic inside whole-stage codegen.
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          split(lower(TextExprs.cleanText(col("text"))), " ").as("toks"))
        .where(size(col("toks")) >= 1)
      def masked(i: Column): Column =
        substring(md5(concat(col("doc_id").cast("string"), lit(":"),
          i.cast("string"))), 1, 2) < "28"
      val gen = toks.select(col("doc_id"), size(col("toks")).as("n"),
        transform(sequence(lit(1), size(col("toks"))),
          i => when(masked(i), lit("<mask>"))
            .otherwise(element_at(col("toks"), i))).as("_corr"),
        filter(transform(sequence(lit(1), size(col("toks"))),
          i => when(masked(i), element_at(col("toks"), i))),
          x => x.isNotNull).as("_tgt"))
      gen.select(col("doc_id"), col("n").cast("long").as("n_tokens"),
        size(col("_tgt")).cast("long").as("n_masked"),
        concat_ws(" ", col("_corr")).as("corrupted"),
        concat_ws(" ", col("_tgt")).as("targets"),
        round(size(col("_tgt")).cast("double") / col("n"), 4).as("mask_rate"))
    }),

    "q161_vocab_coverage" -> ((s, dir) => {
      // Vocabulary COVERAGE curve (the tokenizer-design companion to
      // q116's fertility): corpus-token share covered by the top-2^k
      // types, read at every power-of-two vocab size — the curve that
      // decides a vocab budget before training a tokenizer. ONE
      // frequency aggregate, then GlobalRank's range-exchange rank AND
      // running sum over (cnt DESC, tok) — no partition-less window at
      // any vocabulary size; the power-of-two filter keeps the output
      // log-sized.
      val counts = t(s, dir, "documents")
        .select(explode(split(lower(TextExprs.cleanText(col("text"))), " ")).as("tok"))
        .where(col("tok") =!= "")
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val ord = Seq(col("cnt").desc, col("tok").asc)
      val ranked = graft.operators.GlobalRank.withRowNumber(counts, ord, "_rn")
      val summed = graft.operators.GlobalRank.withRunningSum(
        ranked, ord, col("cnt"), "_cum")
      val tot = counts.agg(sum("cnt").as("_t"), count(lit(1)).as("_v"))
      summed
        .where(expr("(_rn & (_rn - 1)) = 0")) // powers of two (and rank 1)
        .crossJoin(broadcast(tot))
        .select(col("_rn").as("vocab_size"), col("tok").as("boundary_tok"),
          col("_cum").as("covered_tokens"), col("_t").as("total_tokens"),
          round(col("_cum").cast("double") / col("_t"), 6).as("coverage"),
          col("_v").as("n_types"))
    }),

    "q162_quota_alloc" -> ((s, dir) => {
      // EXACT mixture quota allocation (largest-remainder / Hamilton
      // method): a 200-doc budget split across sources proportional to
      // their char mass — floor the ideal shares, then the sources with
      // the largest remainders absorb the deficit. The deterministic
      // integer-exact alternative to q81's acceptance sampling when a
      // mixture must hit its budget EXACTLY (and reproducibly) at any
      // scale. All corpus-sized work is one aggregate; the allocation
      // arithmetic runs on the |sources|-row table, ranking via a
      // triangular self-join (no partition-less window). Weights here
      // are τ=1 (∝ chars) so every float both engines compute is one
      // division of exact integers; a temperature reweight plugs into
      // the same dataflow.
      val stats = t(s, dir, "documents").groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
        .localCheckpoint(true) // |sources| rows; read by totals + ranking
      val tot = stats.agg(sum("chars").as("_tc"))
      val ideal = stats.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("chars"),
          (lit(200.0) * col("chars") / col("_tc")).as("_ideal"))
        .withColumn("_base", floor(col("_ideal")).cast("long"))
        .withColumn("_rem", col("_ideal") - col("_base"))
      val deficit = ideal.agg((lit(200L) - sum("_base")).as("_d"))
      // rank by (remainder DESC, source ASC) as a triangular count —
      // bounded by |sources|², no window
      val rnk = ideal.as("a").join(ideal.select(col("source").as("_bs"),
            col("_rem").as("_br")).as("b"),
          col("_br") > col("_rem") ||
            (col("_br") === col("_rem") && col("_bs") < col("source")), "left")
        .groupBy(col("source"), col("n_docs"), col("chars"),
          col("_ideal"), col("_base"))
        .agg((count(col("_bs")) + 1).as("_rnk"))
      rnk.crossJoin(broadcast(deficit))
        .select(col("source"), col("n_docs"), col("chars"),
          round(col("_ideal"), 6).as("ideal"),
          (col("_base") + when(col("_rnk") <= col("_d"), 1L).otherwise(0L))
            .as("quota"))
    }),

    "q163_length_winsorize" -> ((s, dir) => {
      // Length WINSORIZATION: clip each document's token budget at its
      // source's P90 — the outlier-length handling step before packing
      // (one 100×-median doc otherwise dominates its pack and skews
      // per-source token accounting). The cap comes from the rank-
      // dataflow exact percentile (Percentiles.exactByGroup — range
      // exchange + boundary-rank join, NO per-group buffering), then
      // broadcasts back onto the stream; floor() keeps the truncation
      // identical across engines (Spark's double→long cast truncates,
      // DuckDB's rounds).
      val toks = t(s, dir, "documents").select(col("doc_id"), col("source"),
        TextExprs.tokenCount(col("text")).as("n_tokens"))
      val caps = graft.operators.Percentiles.exactByGroup(
          toks, col("source"), col("n_tokens"), Seq(0.9), Seq("p90"))
        .select(col("group").as("source"), col("p90"))
      toks.join(broadcast(caps), "source")
        .select(col("doc_id"), col("source"), col("n_tokens"),
          round(col("p90"), 4).as("cap_p90"),
          floor(least(col("n_tokens").cast("double"), col("p90")))
            .cast("long").as("kept_tokens"),
          (col("n_tokens").cast("double") > col("p90")).as("truncated"))
    }),

    "q164_effective_tokens" -> ((s, dir) => {
      // EFFECTIVE dataset size under near-dup weighting: each doc's
      // tokens count as n/cluster_size, so a 5-copy near-dup family
      // contributes its content once across the corpus — the honest
      // per-source token accounting a mixture should be built on (raw
      // counts overpay sources that re-post the same content; Muennighoff
      // 2023's repeated-data discount starts from exactly this number).
      // Composition: q27's ids-only pair stream → CC → cluster sizes,
      // joined back onto a slim (doc, source, tokens) manifest;
      // singletons default to weight 1.
      val docs = t(s, dir, "documents")
      val ntok = docs.select(col("doc_id"), col("source"),
        TextExprs.tokenCount(col("text")).as("n_toks"))
      val pairs = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
          shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.7)
        .select("id_a", "id_b")
      val cc = Dedup.connectedComponents(pairs)
        .withColumnRenamed("node", "doc_id")
      val sizes = cc.groupBy("component").agg(count(lit(1)).as("_csz"))
      val weighted = ntok
        .join(cc, Seq("doc_id"), "left")
        .join(sizes, Seq("component"), "left")
        .select(col("source"), col("n_toks"),
          coalesce(col("_csz"), lit(1L)).as("csz"))
      weighted.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_toks").as("raw_tokens"),
          round(sum(col("n_toks").cast("double") / col("csz")), 4)
            .as("effective_tokens"))
        .withColumn("dup_discount",
          round(lit(1.0) - col("effective_tokens") / col("raw_tokens"), 6))
    }),

    "q165_hard_negatives" -> ((s, dir) => {
      // HARD-NEGATIVE mining for retrieval training (the lexical
      // counterpart of q117's embedding triplets): per query, the
      // top-scoring documents that do NOT satisfy the relevance proxy
      // (here: contain BOTH query terms) — exactly the near-miss
      // negatives a reranker/bi-encoder needs. BM25 arithmetic is q52's
      // (k1=1.2, b=0.75); queries are 2-term so every per-doc score is
      // one order-safe two-double sum; ranking is a per-query
      // PARTITIONED window over the scored stream. One tokenize pass;
      // the query-term table broadcasts.
      val sp = s
      import sp.implicits._
      val qt = Seq((1L, "spark"), (1L, "join"), (2L, "vector"),
        (2L, "stream"), (3L, "batch"), (3L, "window")).toDF("qid", "token")
      val tf = graft.operators.Retrieval.termFreqs(
        t(s, dir, "documents"), col("doc_id"), col("text"))
        .localCheckpoint(true) // read by doc lengths AND the score join
      val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
      val stats = dl.agg(count(lit(1)).cast("double").as("_nd"),
        avg("dl").as("_avgdl"))
      val matches = tf.join(broadcast(qt), "token")
      // (doc_id, token) is unique in tf, so a row count IS the doc freq
      val dfreq = tf.join(broadcast(qt.select("token").distinct()), "token")
        .groupBy("token").agg(count(lit(1)).as("dfreq"))
      val idf = log(lit(1.0) + (col("_nd") - col("dfreq") + 0.5)
        / (col("dfreq") + 0.5))
      val norm = col("tf") + lit(1.2) * (lit(0.25) + lit(0.75)
        * col("dl") / col("_avgdl"))
      val sc = matches
        .join(broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("_s", idf * col("tf") * 2.2 / norm)
        .groupBy("qid", "doc_id")
        .agg(sum("_s").as("_sum"), countDistinct("token").as("_nm"))
      val w = Window.partitionBy("qid")
        .orderBy(round(col("_sum"), 6).desc, col("doc_id").asc)
      sc.where(col("_nm") < 2)
        .select(col("qid"), col("doc_id"), round(col("_sum"), 6).as("score"),
          row_number().over(w).as("rnk"))
        .where(col("rnk") <= 5)
        .select(col("qid"), col("rnk").cast("long").as("rnk"),
          col("doc_id"), col("score"))
    }),

    "q166_lexical_richness" -> ((s, dir) => {
      // Per-source LEXICAL RICHNESS: type/token ratio and Herdan's C
      // (ln types / ln tokens — the length-robust variant; raw TTR
      // collapses as tokens grow, so cross-source comparisons need C).
      // Template-generated or spun content shows depressed richness at
      // normal repetition stats — a complementary signal to q80. Shape:
      // one scan → one (source, token) aggregate → |sources|-row
      // arithmetic; distinct-counting rides the grouped aggregate, not
      // a count(DISTINCT) expansion of the stream.
      val tk = t(s, dir, "documents")
        .select(col("source"),
          explode(split(lower(TextExprs.cleanText(col("text"))), " ")).as("tok"))
        .where(col("tok") =!= "")
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      tk.groupBy("source")
        .agg(count(lit(1)).as("n_types"), sum("c").as("n_tokens"),
          max("c").as("top_tok_freq"))
        .select(col("source"), col("n_types"), col("n_tokens"),
          round(col("n_types").cast("double") / col("n_tokens"), 6).as("ttr"),
          round(log(col("n_types").cast("double"))
            / log(col("n_tokens").cast("double")), 6).as("herdan_c"),
          round(col("top_tok_freq").cast("double") / col("n_tokens"), 6)
            .as("top_tok_share"))
    }),

    "q167_bootstrap_ci" -> ((s, dir) => {
      // Poisson-BOOTSTRAP uncertainty on the per-source quality rate:
      // 32 deterministic resampling replicas where each doc's replica
      // weight is Poisson(1)-distributed via an md5-derived uniform and
      // the inverse-CDF threshold chain (the distributed bootstrap of
      // Chamandy et al./Google — no shared RNG state, no resample
      // shuffle; a doc's weight in replica b is a pure function of
      // (b, doc_id), so the estimate is bit-reproducible and mergeable).
      // Reports the point rate, bootstrap mean/sd and the 95% normal
      // CI half-width — the error bar a curation dashboard should put
      // on every quality metric before anyone compares two sources.
      // Shape: one rules pass → slim (source, keep) manifest ×32
      // replica explode → two tiny aggregates.
      val docs = t(s, dir, "documents")
      val rules = graft.operators.TextAnalysis.gopherRules(
          docs, col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("passes"))
      val lab = rules.join(docs.select(col("doc_id"), col("source")), "doc_id")
        .select(col("doc_id"), col("source"),
          when(col("passes"), 1.0).otherwise(0.0).as("y"))
        .localCheckpoint(true) // slim manifest; point rate + replicas read it
      val reps = array((0 until 32).map(b => lit(b)): _*)
      // inverse CDF of Poisson(1) on u ∈ [0,1): cumulative thresholds
      val u = conv(substring(md5(concat(col("b").cast("string"), lit(":"),
        col("doc_id").cast("string"))), 1, 13), 16, 10)
        .cast("double") / lit(4503599627370496.0) // 16^13 = 2^52
      val w = when(u < 0.36787944117144233, 0.0)
        .when(u < 0.7357588823428847, 1.0)
        .when(u < 0.9196986029286058, 2.0)
        .when(u < 0.9810118431238462, 3.0)
        .when(u < 0.9963401531726563, 4.0)
        .when(u < 0.9994058151824183, 5.0)
        .when(u < 0.9999167588507119, 6.0)
        .otherwise(7.0)
      // a replica whose Poisson weights all draw 0 (realistic only for a
      // very small source) carries no estimate: guard the ratio EXPLICITLY
      // and surface how many replicas actually contributed — a CI built on
      // fewer replicas than requested should say so, not silently narrow
      val boot = lab.select(col("source"), col("doc_id"), col("y"),
          explode(reps).as("b"))
        .select(col("source"), col("b"), col("y"), w.as("w"))
        .groupBy("source", "b")
        .agg(when(sum("w") > 0, sum(col("w") * col("y")) / sum("w")).as("rate_b"))
      val ci = boot.groupBy("source")
        .agg(round(avg("rate_b"), 6).as("boot_mean"),
          round(stddev_samp(col("rate_b")), 6).as("boot_sd"),
          count(col("rate_b")).as("n_eff_replicas"))
      val point = lab.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), round(avg("y"), 6).as("pass_rate"))
      point.join(ci, "source")
        .select(col("source"), col("n_docs"), col("pass_rate"),
          col("boot_mean"), col("boot_sd"),
          round(col("boot_sd") * 1.96, 6).as("ci95_halfwidth"),
          col("n_eff_replicas"))
    }),

    "q168_dataset_card" -> ((s, dir) => {
      // Per-source DATASET CARD: the one-row-per-source release digest a
      // curated corpus ships with — volume (docs/tokens/chars), dominant
      // language and its share, rule-gate pass rate, and exact-dup share
      // — composed from slim per-source aggregates (every join is on the
      // 20-row source dimension; the corpus is scanned by each component
      // once). The packaging step after the q121-style pipeline: what a
      // consumer reads before mixing the source in.
      val docs = t(s, dir, "documents")
      val vol = docs.select(col("source"), col("n_chars"),
          TextExprs.tokenCount(col("text")).as("_nt"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("_nt").as("n_tokens"),
          round(avg("n_chars"), 2).as("avg_chars"))
      val langs = docs.groupBy("source", "lang").agg(count(lit(1)).as("_lc"))
      val topL = langs.groupBy("source").agg(max("_lc").as("_mx"))
      val dominant = langs.join(topL, "source")
        .where(col("_lc") === col("_mx"))
        .groupBy("source", "_mx").agg(min("lang").as("top_lang"))
      val rules = graft.operators.TextAnalysis.gopherRules(
          docs, col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("passes"))
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy("source")
        .agg(round(avg(when(col("passes"), 1.0).otherwise(0.0)), 6)
          .as("pass_rate"))
      val dups = docs.select(col("source"),
          md5(TextExprs.cleanText(col("text"))).as("_h"))
        .groupBy("source", "_h").agg(count(lit(1)).as("_hc"))
        .groupBy("source")
        .agg(round(sum(when(col("_hc") > 1, col("_hc")).otherwise(0L))
            .cast("double") / sum("_hc"), 6).as("exact_dup_share"))
      vol.join(dominant.select(col("source"), col("top_lang"), col("_mx")), "source")
        .join(rules, "source").join(dups, "source")
        .select(col("source"), col("n_docs"), col("n_tokens"), col("avg_chars"),
          col("top_lang"),
          round(col("_mx").cast("double") / col("n_docs"), 6).as("top_lang_share"),
          col("pass_rate"), col("exact_dup_share"))
    }),

    "q169_bpe_pairs" -> ((s, dir) => {
      // First BPE merge-step statistics (Sennrich et al. 2016): adjacent
      // CHARACTER-pair frequencies within tokens, top-20 — the merge a
      // byte-pair tokenizer trained on this corpus would perform first.
      // Counted over the PRE-AGGREGATED vocabulary (type × count — the
      // standard BPE trick: pair extraction costs O(|vocab| · token_len),
      // never O(corpus tokens); the only corpus-sized pass is the vocab
      // groupBy's map-combined shuffle). Top-20 rides GlobalRank's range
      // exchange — no single-partition sort at any pair-vocabulary size.
      val tc = t(s, dir, "documents")
        .select(explode(split(lower(TextExprs.cleanText(col("text"))), " ")).as("tok"))
        .where(col("tok") =!= "")
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
      val pairs = tc
        .where(length(col("tok")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(1), length(col("tok")) - 1),
          i => col("tok").substr(i, lit(2)))).as("pair"))
        .groupBy("pair").agg(sum("cnt").as("freq"))
      graft.operators.GlobalRank.withRowNumber(pairs,
          Seq(col("freq").desc, col("pair").asc), "rnk")
        .where(col("rnk") <= 20)
        .select(col("pair"), col("freq"), col("rnk"))
    }),

    "q170_pad_efficiency" -> ((s, dir) => {
      // Length-bucketed batching audit: rank docs by token count
      // (GlobalRank range exchange — no global window), cut into 8
      // equal-count buckets with ALL-INTEGER arithmetic
      // (bucket = (rank−1)·8 DIV n — no float boundary moves a doc), and
      // price the padding a fixed-shape batcher pays per bucket:
      // pad_frac = 1 − Σlen / (n_docs · max_len). THE measurement behind
      // length-bucketed batching: sorting sequences before batching
      // turns the global-max padding waste into the per-bucket number
      // this query reports. Shape: one scan → rank → 8-row aggregate.
      val ntok = t(s, dir, "documents").select(col("doc_id"),
        TextExprs.tokenCount(col("text")).as("n_toks"))
      val ranked = graft.operators.GlobalRank.withRowNumber(ntok,
        Seq(col("n_toks").asc, col("doc_id").asc), "_rn")
      val tot = ntok.agg(count(lit(1)).as("_n"))
      ranked.crossJoin(broadcast(tot))
        .select(col("n_toks"), expr("((_rn - 1) * 8) DIV _n").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), max("n_toks").as("max_len"),
          sum("n_toks").as("sum_toks"))
        .withColumn("pad_frac",
          when(col("max_len") > 0, round(lit(1.0)
            - col("sum_toks").cast("double") / (col("n_docs") * col("max_len")), 6))
          .otherwise(lit(0.0)))
    }),

    "q171_script_profile" -> ((s, dir) => {
      // Character-CLASS profile per source: shares of lower-alpha, digit,
      // space, and other codepoints over the cleaned lowered text — the
      // cheap script/charset monitor that catches a source flipping
      // register (a code dump entering a prose feed, mojibake, a
      // non-Latin script appearing in an en-labeled source) without any
      // language model. One scan; counts via length-difference after
      // class removal (Spark regexp_replace replaces ALL matches; the
      // twin passes the 'g' flag — the cleanSql posture).
      val c = lower(TextExprs.cleanText(col("text")))
      def cnt(re: String): Column =
        (length(c) - length(regexp_replace(c, re, ""))).cast("long")
      t(s, dir, "documents")
        .select(col("source"), length(c).cast("long").as("nc"),
          cnt("[a-z]").as("na"), cnt("[0-9]").as("nd"), cnt(" ").as("ns"))
        .groupBy("source")
        .agg(sum("nc").as("n_chars"), sum("na").as("_a"),
          sum("nd").as("_d"), sum("ns").as("_s"))
        .select(col("source"), col("n_chars"),
          round(col("_a").cast("double") / col("n_chars"), 6).as("alpha_share"),
          round(col("_d").cast("double") / col("n_chars"), 6).as("digit_share"),
          round(col("_s").cast("double") / col("n_chars"), 6).as("space_share"),
          round((col("n_chars") - col("_a") - col("_d") - col("_s"))
            .cast("double") / col("n_chars"), 6).as("other_share"))
    }),

    "q172_label_fusion" -> ((s, dir) => {
      // Rater FUSION (one-round Dawid–Skene flavor): three deterministic
      // binary raters — the q133 NB classifier, the q79 Gopher rule gate,
      // and a length rule — fused by accuracy-above-chance weighted vote:
      // majority vote → per-rater agreement with the majority → weights
      // w_r = acc_r − 0.5 → signed revote. The label-aggregation step a
      // pipeline runs when multiple cheap quality signals disagree and no
      // gold labels exist. ALL-RATIONAL weights (no log-odds): exact
      // integer sums / exact counts, so both engines compute bit-equal
      // scores. Shape: two classifier corpus passes → slim per-doc vote
      // manifest (checkpointed; accuracies AND revote read it) → 1-row
      // accuracy aggregate broadcast back.
      val posSources = (0 to 4).map(i => s"src$i")
      val docs = t(s, dir, "documents")
      val nb = graft.operators.TextAnalysis.hashNbClassifier(
          docs, col("doc_id"), col("text"), col("source").isin(posSources: _*))
        .select(col("doc_id"), col("keep").as("r1"))
      val gp = graft.operators.TextAnalysis.gopherRules(
          docs, col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("passes").as("r2"))
      val ln = docs.select(col("doc_id"), (col("n_chars") >= 200).as("r3"))
      val votes = nb.join(gp, "doc_id").join(ln, "doc_id")
        .select(col("doc_id"), col("r1"), col("r2"), col("r3"),
          ((col("r1").cast("int") + col("r2").cast("int")
            + col("r3").cast("int")) >= 2).as("maj"))
        .localCheckpoint(true)
      val acc = votes.agg(
        avg((col("r1") === col("maj")).cast("double")).as("a1"),
        avg((col("r2") === col("maj")).cast("double")).as("a2"),
        avg((col("r3") === col("maj")).cast("double")).as("a3"))
      def signed(v: Column, a: Column): Column =
        when(v, a - 0.5).otherwise(lit(0.5) - a)
      votes.crossJoin(broadcast(acc))
        .select(col("doc_id"), col("r1"), col("r2"), col("r3"), col("maj"),
          round(signed(col("r1"), col("a1")) + signed(col("r2"), col("a2"))
            + signed(col("r3"), col("a3")), 6).as("fused_score"))
        .select(col("doc_id"), col("r1"), col("r2"), col("r3"), col("maj"),
          col("fused_score"),
          when(col("fused_score") > 0, lit(true))
            .when(col("fused_score") < 0, lit(false))
            .otherwise(col("maj")).as("fused"))
    }),

    "q173_label_propagation" -> ((s, dir) => {
      // One-hop LABEL PROPAGATION over the near-dup graph: docs with
      // held-out labels (doc_id % 5 == 0 simulates the unlabeled pool)
      // inherit the MAJORITY lang of their labeled near-duplicates
      // (minhash-LSH pairs + exact verify, q27's operator) — the label-
      // transfer step that lets one labeling pass cover every copy of
      // the same content; ties break to the min label. Majority is the
      // q98 two-pass argmax (per-node max count joined back, min label
      // among ties) — no per-node window, no collect.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
          shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.7)
        .select("id_a", "id_b")
      val sym = pairs.union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      val labels = docs.where(col("doc_id") % 5 =!= 0)
        .select(col("doc_id").as("id_b"), col("lang"))
      val nbhd = sym.where(col("id_a") % 5 === 0).join(labels, "id_b")
      val cnts = nbhd.groupBy("id_a", "lang").agg(count(lit(1)).as("c"))
      val mx = cnts.groupBy("id_a")
        .agg(max("c").as("_mc"), sum("c").as("n_labeled_neighbors"))
      cnts.join(mx, "id_a").where(col("c") === col("_mc"))
        .groupBy("id_a", "n_labeled_neighbors")
        .agg(min("lang").as("pred_lang"))
        .select(col("id_a").as("doc_id"), col("pred_lang"),
          col("n_labeled_neighbors"))
    }),

    "q174_nprobe_sweep" -> ((s, dir) => {
      // IVF recall/cost TRADEOFF sweep: recall@5 per query at
      // nProbe ∈ {1, 2, 4} against the exact cosine top-5 — the tuning
      // curve every ANN deployment plots before fixing its probe budget
      // (q119 evaluates ONE config; this is the knob sweep). Both sides
      // are deterministic (q31's first-16-as-centroids fixture, same
      // tie-breaks), so DuckDB replicates each approximate result
      // exactly and the oracle hashes the recall numbers themselves.
      // The exact side is ONE brute-force scan shared by all three
      // configs; each probe run touches nProbe/16 of the corpus.
      val emb = t(s, dir, "embeddings")
      val qs = emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("id"), col("embedding").as("v"))
      val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
      val exact = Similarity.bruteForceTopK(qs, corpus, 5)
        .select(col("query_id"), col("corpus_id"))
        .localCheckpoint(true) // tiny 40-row truth set; 3 sweep arms read it
      Seq(1, 2, 4).map { np =>
        val approx = Similarity.ivfTopK(qs, corpus, 5, nCells = 16, nProbe = np)
          .select(col("query_id"), col("corpus_id"))
        val hits = exact.join(approx, Seq("query_id", "corpus_id"))
          .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
        qs.select(col("id").as("query_id")).join(hits, Seq("query_id"), "left")
          .select(lit(np.toLong).as("n_probe"), col("query_id"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            round(coalesce(col("n_hits"), lit(0L)) / 5.0, 4).as("recall"))
      }.reduce(_ union _)
    }),

    "q175_novelty_curve" -> ((s, dir) => {
      // Ingest-order NOVELTY curve — the diminishing-returns audit for
      // data collection: cut the doc stream into 10 deciles (GlobalRank
      // all-integer cut on doc_id order), and per decile report how many
      // of its distinct 3-gram shingles were never seen in an earlier
      // decile. A flattening curve says new data is re-covering old
      // content — the signal to rebalance sources before paying for more
      // crawl. Shape: rank pass + one shingle explode → (decile, gram)
      // distinct → gram-keyed min-decile → 10-row aggregate; the gram
      // stream shuffles once on the gram key, never per decile. Grams are
      // the native 64-bit shingleHashes fold (no per-gram string built or
      // shuffled); the twin counts md5-string grams — equal counts up to
      // 64-bit collisions, and the output carries only counts.
      val docs = t(s, dir, "documents")
      val ranked = graft.operators.GlobalRank.withRowNumber(
        docs.select(col("doc_id")), Seq(col("doc_id").asc), "_rn")
      val tot = docs.agg(count(lit(1)).as("_n"))
      val dec = ranked.crossJoin(broadcast(tot))
        .select(col("doc_id"), expr("((_rn - 1) * 10) DIV _n").as("decile"))
      val gd = docs.select(col("doc_id"),
          explode(graft.plans.MinHashExprs.shingleHashes(
            TextExprs.cleanText(col("text")), 3)).as("g"))
        .join(dec, "doc_id")
        .select(col("decile"), col("g")).distinct()
      val first = gd.groupBy("g").agg(min("decile").as("_fd"))
      gd.join(first, "g")
        .groupBy("decile")
        .agg(count(lit(1)).as("n_distinct_grams"),
          sum(when(col("_fd") === col("decile"), 1L).otherwise(0L)).as("n_novel"))
        .withColumn("novelty_share",
          round(col("n_novel").cast("double") / col("n_distinct_grams"), 6))
    }),

    "q176_lsh_tuning" -> ((s, dir) => {
      // Minhash banding S-CURVE audit: expected candidate recall of
      // alternative (bands × rows) configs over the TRUE near-dup pair
      // set — p(s) = 1 − (1 − s^r)^b evaluated at each verified pair's
      // exact Jaccard. The pre-flight tuning read a 100 TB dedup run does
      // before fixing its banding: the config's worst-pair recall tells
      // you which true pairs the candidate stage would gamble away.
      // Powers are REPEATED SQUARING on the 6-dp-rounded s (r and b are
      // powers of two here) — fixed multiplication trees, so both
      // engines' doubles are bit-identical; no libm pow anywhere.
      val pairs = Dedup.minhashNearDups(t(s, dir, "documents"),
          col("doc_id"), col("text"),
          shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.7)
        .select(round(col("jaccard"), 6).as("s"))
        .localCheckpoint(true) // pair-set sized; all 3 config arms read it
      def sq(c: Column): Column = c * c
      def powByTree(c: Column, e: Int): Column = e match {
        case 1 => c
        case n => sq(powByTree(c, n / 2)) // n ∈ {2,4,8,16,32}: exact halving
      }
      Seq((32, 1), (16, 2), (8, 4)).map { case (b, r) =>
        pairs.select(lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
          (lit(1.0) - powByTree(lit(1.0) - powByTree(col("s"), r), b)).as("_p"))
          .groupBy("bands", "rows_per_band")
          .agg(count(lit(1)).as("n_true_pairs"),
            round(avg("_p"), 6).as("expected_recall"),
            round(min("_p"), 6).as("worst_pair_recall"))
      }.reduce(_ union _)
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

    "q178_length_chisq" -> ((s, dir) => {
      // Per-source length-distribution χ² against the corpus: global
      // n_chars DECILES via the all-integer rank cut (q145's bin trick —
      // no float boundary moves a doc), observed per (source, bin) vs
      // expected n_src·bin_total/N, χ² with df=9 flagged at the 0.01
      // critical value. Complements q152 (token-distribution KL) with
      // the LENGTH axis — a source silently switching from tweets to
      // transcripts alarms here first. Shape: rank pass → (source, bin)
      // contingency (≤ sources×10 rows) → all arithmetic on the reduced
      // table with bin totals broadcast.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"), col("n_chars"))
      val ranked = graft.operators.GlobalRank.withRowNumber(docs,
        Seq(col("n_chars").asc, col("doc_id").asc), "_rn")
      val tot = docs.agg(count(lit(1)).as("_n"))
      val binned = ranked.crossJoin(broadcast(tot))
        .select(col("source"), expr("((_rn - 1) * 10) DIV _n").as("bin"), col("_n"))
      val cont = binned.groupBy("source", "bin")
        .agg(count(lit(1)).as("obs"), max("_n").as("_n"))
      val binTot = cont.groupBy("bin").agg(sum("obs").as("bin_total"))
      val srcTot = cont.groupBy("source").agg(sum("obs").as("n_docs"))
      cont.join(broadcast(binTot), "bin").join(broadcast(srcTot), "source")
        .select(col("source"), col("n_docs"),
          (col("obs") - col("n_docs") * col("bin_total").cast("double") / col("_n"))
            .as("_d"),
          (col("n_docs") * col("bin_total").cast("double") / col("_n")).as("_e"))
        .groupBy("source", "n_docs")
        .agg(round(sum(col("_d") * col("_d") / col("_e")), 4).as("chi2"))
        .withColumn("drifted", col("chi2") > 21.666) // χ²(9, 0.99)
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

    "q180_subsample_stability" -> ((s, dir) => {
      // SUBSAMPLE-STABILITY audit: how far the gopher-gate pass rate
      // measured on a 1% / 10% / 100% md5 subsample drifts from the full
      // rate — the "can I tune my filters on a sample?" pre-check a
      // 100 TB pipeline runs before iterating on a slice. Sampling is a
      // pure function of doc_id (md5-prefix threshold, the q81 posture),
      // so membership is reproducible and NESTED (1% ⊂ 10% ⊂ 100%).
      // One classifier pass; the slim (doc_id, passes, u) manifest is
      // checkpointed and the three arms are filtered aggregates of it.
      val docs = t(s, dir, "documents")
      val g = graft.operators.TextAnalysis.gopherRules(
          docs, col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("passes"))
        .withColumn("_u",
          conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long"))
        .localCheckpoint(true)
      val full = g.agg(avg(when(col("passes"), 1.0).otherwise(0.0)).as("_fr"))
      Seq(("01pct", 655L), ("10pct", 6553L), ("100pct", 65536L)).map {
        case (label, thr) =>
          g.where(col("_u") < thr)
            .agg(count(lit(1)).as("n_docs"),
              round(avg(when(col("passes"), 1.0).otherwise(0.0)), 6).as("pass_rate"))
            .select(lit(label).as("sample"), col("n_docs"), col("pass_rate"))
      }.reduce(_ union _)
        .crossJoin(broadcast(full))
        .select(col("sample"), col("n_docs"), col("pass_rate"),
          round(abs(col("pass_rate") - col("_fr")), 6).as("abs_dev"))
    }),

    "q181_cluster_profile" -> ((s, dir) => {
      // Near-dup CLUSTER-SIZE profile: the q53 components histogrammed
      // into size bands (2, 3-4, 5-8, 9+) with document share per band —
      // the one-page answer to "how duplicated is this corpus, and is it
      // a long tail of pairs or a few megaclusters?" (megaclusters mean
      // template content; the dedup keep-policy and the q164 token
      // discount both hinge on this shape). Integer CASE bands — no
      // float log2 — identical in the twin.
      val pairs = Dedup.minhashNearDups(t(s, dir, "documents"),
          col("doc_id"), col("text"),
          shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.7)
        .select("id_a", "id_b")
      val sizes = Dedup.connectedComponents(pairs)
        .groupBy("component").agg(count(lit(1)).as("csz"))
      val tot = t(s, dir, "documents").agg(count(lit(1)).as("_N"))
      val band = when(col("csz") === 2, "2").when(col("csz") <= 4, "3-4")
        .when(col("csz") <= 8, "5-8").otherwise("9+")
      sizes.select(band.as("size_band"), col("csz"))
        .groupBy("size_band")
        .agg(count(lit(1)).as("n_clusters"), sum("csz").as("n_docs"))
        .crossJoin(broadcast(tot))
        .select(col("size_band"), col("n_clusters"), col("n_docs"),
          round(col("n_docs").cast("double") / col("_N"), 6).as("corpus_share"))
    }),

    "q182_shared_prefix" -> ((s, dir) => {
      // Shared-OPENING template detector: docs whose first 10 tokens are
      // identical, grouped — the boilerplate-header signature (web pages
      // from one CMS, mailing-list footers-as-headers, scraped nav
      // chrome) that near-dup thresholds miss when the bodies diverge.
      // One scan → md5 of the 10-token prefix → hash groupBy; groups of
      // ≥2 report size, source spread, and the min doc id as the
      // canonical representative (q98's deterministic-pick rule).
      val docs = t(s, dir, "documents")
      val pref = docs.select(col("doc_id"), col("source"),
          split(TextExprs.cleanText(col("text")), " ").as("toks"))
        .where(size(col("toks")) >= 10)
        .select(col("doc_id"), col("source"),
          md5(concat_ws(" ", slice(col("toks"), 1, 10))).as("prefix_h"))
      pref.groupBy("prefix_h")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("source").as("n_sources"),
          min("doc_id").as("canonical_id"))
        .where(col("n_docs") >= 2)
    }),

    "q183_containment_direction" -> ((s, dir) => {
      // Containment DIRECTION of each verified near-dup pair: |A∩B|/|A|
      // vs |A∩B|/|B| over the 3-gram shingle sets — tells the keep
      // policy whether B is an extended edition of A (keep B), a
      // truncation (keep A), or a mutual-overlap sibling (q98's
      // longest-copy rule applies). Candidates are q27's LSH pair set;
      // the shingle sets join back per side exactly once (the operator's
      // verify posture), and the asymmetric ratios are one sorted-merge
      // pass per pair.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
          shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.7)
        .select("id_a", "id_b")
      val sh = docs.select(col("doc_id"),
        graft.plans.MinHashExprs.shingleHashes(
          TextExprs.cleanText(col("text")), 3).as("shh"))
      val withSets = pairs
        .join(sh.select(col("doc_id").as("id_a"), col("shh").as("_sa")), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("shh").as("_sb")), "id_b")
        .select(col("id_a"), col("id_b"),
          size(array_intersect(col("_sa"), col("_sb"))).cast("long").as("_i"),
          size(col("_sa")).cast("long").as("_na"),
          size(col("_sb")).cast("long").as("_nb"))
      val ca = round(col("_i").cast("double") / col("_na"), 6)
      val cb = round(col("_i").cast("double") / col("_nb"), 6)
      withSets.select(col("id_a"), col("id_b"),
        ca.as("cont_a_in_b"), cb.as("cont_b_in_a"),
        when(ca >= 0.95 && cb >= 0.95, "mutual")
          .when(ca >= 0.95, "a_in_b")
          .when(cb >= 0.95, "b_in_a")
          .otherwise("partial").as("relation"))
    }),

    "q184_ctx_overflow" -> ((s, dir) => {
      // Context-window OVERFLOW accounting per source: the share of docs
      // exceeding 512/2048/8192 tokens and the tokens a 2048 cap would
      // discard — the seq-len budget sheet consulted before fixing a
      // packing window (q93/q94's B) or paying for long-context
      // training. One scan, one aggregate; all-integer sums.
      val ntok = t(s, dir, "documents").select(col("source"),
        TextExprs.tokenCount(col("text")).as("n"))
      ntok.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n").as("n_tokens"),
          round(avg(when(col("n") > 512, 1.0).otherwise(0.0)), 6).as("share_over_512"),
          round(avg(when(col("n") > 2048, 1.0).otherwise(0.0)), 6).as("share_over_2048"),
          round(avg(when(col("n") > 8192, 1.0).otherwise(0.0)), 6).as("share_over_8192"),
          sum(greatest(col("n") - 2048, lit(0L))).as("tokens_lost_2048"))
        .withColumn("loss_share_2048",
          round(col("tokens_lost_2048").cast("double") / col("n_tokens"), 6))
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

    "q189_length_tail_index" -> ((s, dir) => {
      // Hill tail-index of the document-length distribution — the
      // capacity-planning number behind packing/shard sizing (how heavy
      // is the long-doc tail): alpha = 1 / mean(ln(x_i / x_(k+1))) over
      // the top-5% order statistics. Global order from GlobalRank (range
      // exchange, no single-partition window); k and the rank-(k+1)
      // threshold are single-row broadcasts, the tail mean is one slim
      // aggregate over k rows.
      val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      val ranked = graft.operators.GlobalRank.withRowNumber(
        d, Seq(col("n_chars").desc, col("doc_id").asc), "rk")
      val nk = d.agg(count(lit(1)).as("n"))
        .select(col("n"), (col("n") * 5 / 100).cast("long").as("k"))
      val thr = ranked.crossJoin(broadcast(nk))
        .where(col("rk") === col("k") + 1)
        .select(col("n_chars").as("x_k1"))
      ranked.crossJoin(broadcast(nk)).where(col("rk") <= col("k"))
        .crossJoin(broadcast(thr))
        .groupBy("n", "k", "x_k1")
        .agg(avg(log(col("n_chars").cast("double") / col("x_k1"))).as("_h"))
        .select(col("n").as("n_docs"), col("k"), col("x_k1"),
          round(col("_h"), 4).as("hill_h"),
          round(lit(1.0) / col("_h"), 4).as("tail_alpha"))
    }),

    "q190_embed_dispersion" -> ((s, dir) => {
      // Per-label embedding dispersion WITHOUT the n² pairs: for the
      // mean pairwise dot product, Σ_{i≠j} vᵢ·vⱼ = ‖Σv‖² − Σ‖vᵢ‖²
      // exactly — so one posexplode aggregate over (label, pos) keys
      // (|labels|·d keys, scales with dimensions not rows) replaces the
      // quadratic self-join. Sum-vector coordinates and Σ‖v‖² round at
      // 6 dp before the identity so both engines compute from identical
      // inputs. Low dispersion = a collapsed/duplicative label.
      val e = t(s, dir, "embeddings")
        .select(col("label").cast("long").as("label"), col("embedding"))
      val nsq = e.select(col("label"),
          aggregate(col("embedding"), lit(0.0d),
            (a, x) => a + x.cast("double") * x.cast("double")).as("sq"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), round(sum("sq"), 6).as("sum_sq"))
      val s2 = e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(round(sum(col("x").cast("double")), 6).as("sv"))
        .groupBy("label")
        .agg(round(sum(col("sv") * col("sv")), 6).as("s2"))
      nsq.join(s2, "label")
        .select(col("label"), col("n"),
          round(sqrt(col("s2")) / col("n"), 4).as("centroid_norm"),
          round((col("s2") - col("sum_sq")) / (col("n") * (col("n") - 1)), 4)
            .as("mean_pairwise_dot"))
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
        .select(col("source"), explode(expr(
          "transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))"))
          .as("gram"))
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

    "q193_dup_quality_interaction" -> ((s, dir) => {
      // Does duplication predict low quality? The 2×2 exact-dup ×
      // gopher-pass contingency in ONE row with the odds ratio — the
      // pre-check before spending a dedup pass on a corpus whose
      // duplicates would be dropped by the quality gate anyway. Exact-dup
      // membership via md5(clean text) group size (crisp, no LSH recall
      // caveat); both flags are corpus-keyed aggregates, the final fold
      // is a single conditional aggregate. "Duplicate" = shares its
      // 10-token opening prefix with another doc (q182's template
      // signal — the fixture carries no byte-identical copies, and the
      // template family is exactly the duplication a quality gate
      // interacts with); sub-10-token docs are definitionally unique.
      val docs = t(s, dir, "documents")
      val pass = graft.operators.TextAnalysis
        .gopherRules(docs, col("doc_id"), col("text"))
        .select(col("id").as("doc_id"), col("passes"))
      val sizes = docs
        .select(col("doc_id"),
          split(TextExprs.cleanText(col("text")), " ").as("toks"))
        .where(size(col("toks")) >= 10)
        .select(col("doc_id"),
          md5(concat_ws(" ", slice(col("toks"), 1, 10))).as("h"))
      val dup = sizes.groupBy("h").agg(count(lit(1)).as("gs"))
      val flagged = pass.join(
          sizes.join(dup, "h").select(col("doc_id"), (col("gs") > 1).as("_d")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("_d"), lit(false)).as("is_dup"),
          col("passes"))
      flagged.agg(
          sum(when(col("is_dup") && col("passes"), 1L).otherwise(0L)).as("n_dup_pass"),
          sum(when(col("is_dup") && !col("passes"), 1L).otherwise(0L)).as("n_dup_fail"),
          sum(when(!col("is_dup") && col("passes"), 1L).otherwise(0L)).as("n_uniq_pass"),
          sum(when(!col("is_dup") && !col("passes"), 1L).otherwise(0L)).as("n_uniq_fail"))
        .select(col("n_dup_pass"), col("n_dup_fail"), col("n_uniq_pass"),
          col("n_uniq_fail"),
          when(col("n_dup_pass") + col("n_dup_fail") > 0,
            round(col("n_dup_pass").cast("double") /
              (col("n_dup_pass") + col("n_dup_fail")), 4)).as("pass_rate_dup"),
          when(col("n_uniq_pass") + col("n_uniq_fail") > 0,
            round(col("n_uniq_pass").cast("double") /
              (col("n_uniq_pass") + col("n_uniq_fail")), 4)).as("pass_rate_uniq"),
          when(col("n_dup_fail") > 0 && col("n_uniq_pass") > 0,
            round((col("n_dup_pass") * col("n_uniq_fail")).cast("double") /
              (col("n_dup_fail") * col("n_uniq_pass")), 4)).as("odds_ratio"))
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

    "q195_changepoint" -> ((s, dir) => {
      // CUSUM changepoint over the daily event total: cusumᵢ =
      // Σ_{j≤i}(cⱼ − mean), peak day = argmax |cusum| — the level-shift
      // locator run before trusting any volume-weighted statistic. The
      // prefix sum rides GlobalRank.withRunningSum (range exchange, no
      // single-partition window) over the zero-filled scaffold, and the
      // peak test compares n·cusumᵢ = n·rtᵢ − i·total — ALL LONG
      // arithmetic, so the argmax is exact in both engines; the reported
      // cusum rounds only for display.
      val ev = t(s, dir, "events").select(col("ts").cast("date").as("day"))
      val daily = ev.groupBy("day").agg(count(lit(1)).as("c"))
      val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"),
          count(lit(1)).as("total"))
        .select(col("d0"), col("total"),
          (datediff(col("d1"), col("d0")) + 1).cast("long").as("nd"))
      val series = broadcast(bounds)
        .select(col("d0"), col("nd"), col("total"),
          explode(sequence(lit(1L), col("nd"))).as("i"))
        .select(col("nd"), col("total"), col("i"),
          date_add(col("d0"), (col("i") - 1).cast("int")).as("day"))
        .join(daily, Seq("day"), "left")
        .select(col("nd"), col("total"), col("i"), col("day"),
          coalesce(col("c"), lit(0L)).as("n_events"))
      val rt = graft.operators.GlobalRank.withRunningSum(
        series, Seq(col("day").asc), col("n_events"), "rt")
      val nc = col("nd") * col("rt") - col("i") * col("total")
      val scored = rt.select(col("day"), col("i"), col("n_events"),
        col("nd"), nc.as("ncusum"))
      val peak = scored.agg(max(abs(col("ncusum"))).as("peak"))
      scored.crossJoin(broadcast(peak))
        .select(col("day"), col("n_events"),
          round(col("ncusum").cast("double") / col("nd"), 4).as("cusum"),
          (abs(col("ncusum")) === col("peak")).as("is_peak"))
    }),

    "q196_embed_mrr" -> ((s, dir) => {
      // Embedding-quality MRR: for a 50-query deterministic probe, the
      // reciprocal rank of the FIRST same-label neighbor under full
      // cosine ranking (evaluation query — the probe set bounds the
      // candidate volume at 50×n, it is NOT an n² fold; the ranking
      // window partitions BY QUERY so no partition exceeds the corpus
      // row count). MRR near 1 = labels cluster tightly; hit@10 is the
      // deployable-recall companion.
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("label").as("qlab"),
          col("embedding").as("qv"))
      val c = emb.select(col("vec_id").as("corpus_id"),
        col("label").as("clab"), col("embedding").as("cv"))
      val scored = c.join(broadcast(q)).where(col("corpus_id") =!= col("query_id"))
        .select(col("query_id"), col("qlab"), col("corpus_id"), col("clab"),
          graft.functions.VectorExprs.cosine(col("qv"), col("cv")).as("cos"))
      val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id").asc)
      val first = scored.withColumn("_rnk", row_number().over(w))
        .where(col("qlab") === col("clab"))
        .groupBy("query_id", "qlab").agg(min("_rnk").as("first_rank"))
      first.groupBy(col("qlab").cast("long").as("label"))
        .agg(count(lit(1)).as("n_queries"),
          round(avg(lit(1.0) / col("first_rank")), 6).as("mrr"),
          round(avg(when(col("first_rank") <= 10, 1.0).otherwise(0.0)), 4)
            .as("hit_at_10"))
    }),

    "q197_neardup_assortativity" -> ((s, dir) => {
      // Degree assortativity of the verified near-dup graph: Pearson r
      // over symmetrized edge-endpoint degrees — positive means heavy
      // duplicators link to each other (template families), negative
      // means hubs absorbing singletons (one canonical + many variants);
      // the two regimes want different keep policies. Candidates are
      // q27's banded LSH (never all-pairs); degrees and every Σ are LONG
      // so the coefficient is exact in both engines.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
          shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.7)
        .select("id_a", "id_b")
      val deg = pairs.select(col("id_a").as("id"))
        .unionAll(pairs.select(col("id_b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val sym = pairs
        .join(deg.select(col("id").as("id_a"), col("deg").as("da")), "id_a")
        .join(deg.select(col("id").as("id_b"), col("deg").as("db")), "id_b")
        .select(col("da").as("x"), col("db").as("y"))
        .unionAll(pairs
          .join(deg.select(col("id").as("id_a"), col("deg").as("da")), "id_a")
          .join(deg.select(col("id").as("id_b"), col("deg").as("db")), "id_b")
          .select(col("db").as("x"), col("da").as("y")))
      val m = sym.agg(count(lit(1)).as("m"), sum("x").as("sx"),
        sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
      val nodes = deg.agg(count(lit(1)).as("n_nodes"), sum("deg").as("_sd"))
      val num = (col("m") * col("sxy") - col("sx") * col("sy")).cast("double")
      val den = sqrt((col("m") * col("sxx") - col("sx") * col("sx")).cast("double")) *
        sqrt((col("m") * col("syy") - col("sy") * col("sy")).cast("double"))
      m.crossJoin(broadcast(nodes))
        .select((col("m") / 2).cast("long").as("n_edges"), col("n_nodes"),
          round(col("_sd").cast("double") / col("n_nodes"), 4).as("mean_degree"),
          when(den > 0, round(num / den, 6)).as("assortativity"))
    }),

    "q198_editdist_neardup" -> ((s, dir) => {
      // Edit-distance verified near-dup pairs for SHORT documents —
      // character-level Levenshtein catches the small-edit duplicates
      // (typo fixes, number swaps) that token-shingle Jaccard scores low
      // on short texts. Candidates block on the md5 of the first 3
      // tokens (equi-join, never all-pairs); the O(len²) verify runs
      // only inside blocks and only on ≤512-char docs — the length cap
      // is what licenses Levenshtein at scale.
      val base = t(s, dir, "documents")
        .where(col("n_chars") <= 512)
        .select(col("doc_id"), TextExprs.cleanText(col("text")).as("t"))
        .select(col("doc_id"), col("t"), split(col("t"), " ").as("toks"))
        .where(size(col("toks")) >= 3)
        .select(col("doc_id"), col("t"),
          md5(concat_ws(" ", slice(col("toks"), 1, 3))).as("h"))
      val a = base.select(col("h"), col("doc_id").as("id_a"), col("t").as("ta"))
      val b = base.select(col("h"), col("doc_id").as("id_b"), col("t").as("tb"))
      val sim = lit(1.0) - levenshtein(col("ta"), col("tb")).cast("double") /
        greatest(length(col("ta")), length(col("tb")))
      a.join(b, Seq("h")).where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          levenshtein(col("ta"), col("tb")).cast("long").as("edit_dist"),
          round(sim, 4).as("sim"))
        .where(round(sim, 4) >= 0.8)
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

    "q200_event_transitions" -> ((s, dir) => {
      // First-order behavioral Markov matrix: session-gated (≤30 min
      // gap) next-event transition counts and row-normalized
      // probabilities — the background model that q185's bot profile and
      // any sequence-model pretraining both start from. One partitioned
      // window pass (lead shares q35's partitioning); the matrix is
      // |types|² rows, the normalizer a broadcast row-total join.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val trans = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("_next", lead("event_type", 1).over(w))
        .withColumn("_gap_us",
          lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
        .where(col("_next").isNotNull && col("_gap_us") <= 1800L * 1000000L)
        .groupBy(col("event_type").as("cur_type"), col("_next").as("next_type"))
        .agg(count(lit(1)).as("n_transitions"))
      val totals = trans.groupBy("cur_type")
        .agg(sum("n_transitions").as("_rt"))
      trans.join(broadcast(totals), "cur_type")
        .select(col("cur_type"), col("next_type"), col("n_transitions"),
          round(col("n_transitions").cast("double") / col("_rt"), 4).as("p"))
    }),

    "q201_crosssource_leakage" -> ((s, dir) => {
      // Near-dup LEAKAGE across source boundaries: every verified pair
      // labeled within/cross-source and rolled to the source-pair grid —
      // cross-source mass means the same upstream feed arrives twice
      // under different names, and per-source dedup would miss it. Pair
      // set is q27's banded LSH; the source lookup joins the slim
      // (doc_id, source) projection per side once.
      val docs = t(s, dir, "documents")
      val pairs = Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
          shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.7)
        .select("id_a", "id_b")
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(src.select(col("doc_id").as("id_a"), col("source").as("_sa")), "id_a")
        .join(src.select(col("doc_id").as("id_b"), col("source").as("_sb")), "id_b")
        .groupBy(least(col("_sa"), col("_sb")).as("src_lo"),
          greatest(col("_sa"), col("_sb")).as("src_hi"))
        .agg(count(lit(1)).as("n_pairs"))
        .select(col("src_lo"), col("src_hi"), col("n_pairs"),
          (col("src_lo") =!= col("src_hi")).as("is_cross"))
    }),

    "q202_mad_outliers" -> ((s, dir) => {
      // Robust outlier detection per event type: median/MAD instead of
      // mean/σ (one corrupted batch cannot drag its own threshold, the
      // failure mode of q177's z-score under contamination). Both
      // medians ride Percentiles' rank dataflow (range exchange — no
      // task holds a group, quantile_cont-exact), so med and MAD are
      // bit-identical across engines and the 3·1.4826·MAD fence
      // compares cleanly; the medians join back as a 5-row broadcast.
      val ev = t(s, dir, "events").select(col("event_type"), col("value"))
      val med = graft.operators.Percentiles.exactByGroup(
          ev, col("event_type"), col("value"), Seq(0.5), Seq("med"))
        .select(col("group").as("event_type"), col("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .select(col("event_type"), col("value"), col("med"),
          abs(col("value") - col("med")).as("adev"))
      val mad = graft.operators.Percentiles.exactByGroup(
          dev, col("event_type"), col("adev"), Seq(0.5), Seq("mad"))
        .select(col("group").as("event_type"), col("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(first("med"), 4).as("median"),
          round(first("mad"), 4).as("mad"),
          sum(when(col("adev") > lit(3.0) * lit(1.4826) * col("mad"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .select(col("event_type"), col("n"), col("median"), col("mad"),
          col("n_outliers"),
          round(col("n_outliers").cast("double") / col("n"), 4).as("outlier_rate"))
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

    "q207_token_weighted_length" -> ((s, dir) => {
      // Token-WEIGHTED doc-length percentiles per source: the length a
      // randomly drawn TOKEN lives in (a 10k-token doc counts 10k times,
      // not once) — the number packing actually cares about, since token
      // mass in long docs dominates the sequence budget even when long
      // docs are rare by count. Percentiles.weightedByGroup: one range
      // exchange + global weight prefix sum; the unweighted p50 rides
      // alongside for the count-vs-mass contrast.
      val d = t(s, dir, "documents")
        .select(col("source"), TextExprs.tokenCount(col("text")).as("n_toks"))
        .where(col("n_toks") > 0)
      val weighted = graft.operators.Percentiles.weightedByGroup(
          d, col("source"), col("n_toks"), col("n_toks"),
          Seq(0.5, 0.9), Seq("w_p50", "w_p90"))
        .select(col("group").as("source"),
          col("w_p50").cast("long").as("w_p50"),
          col("w_p90").cast("long").as("w_p90"))
      val plain = graft.operators.Percentiles.exactByGroup(
          d, col("source"), col("n_toks"), Seq(0.5), Seq("p50"))
        .select(col("group").as("source"), round(col("p50"), 4).as("p50"))
      plain.join(weighted, "source")
    }),

    "q208_distinct_ngrams" -> ((s, dir) => {
      // Generation-diversity audit: distinct-1/2/3 per source (share of
      // unique n-grams in the n-gram stream) — the standard NLG
      // repetition metric; a templated/looping source scores low where
      // q166's TTR only sees unigrams. One explode per n collapses
      // immediately into (source, n, gram) counts (map-side combine),
      // distinct+total fall out of the SAME aggregate — no second pass.
      val toks = t(s, dir, "documents")
        .select(col("source"),
          split(TextExprs.cleanText(col("text")), " ").as("toks"))
        .select(col("source"),
          expr("filter(toks, t -> t != '')").as("toks"))
      def grams(n: Int) = toks.where(size(col("toks")) >= n)
        .select(col("source"), lit(n.toLong).as("n"), explode(expr(
          s"transform(sequence(1, size(toks) - ${n - 1}), " +
            s"i -> concat_ws(' ', slice(toks, i, $n)))")).as("gram"))
      (1 to 3).map(grams).reduce(_ unionAll _)
        .groupBy("source", "n", "gram").agg(count(lit(1)).as("c"))
        .groupBy("source", "n")
        .agg(sum("c").as("total_ngrams"), count(lit(1)).as("distinct_ngrams"))
        .select(col("source"), col("n"), col("total_ngrams"),
          col("distinct_ngrams"),
          round(col("distinct_ngrams").cast("double") / col("total_ngrams"), 4)
            .as("distinct_ratio"))
    }),

    "q209_session_basket_lift" -> ((s, dir) => {
      // Association lift between event types CO-PRESENT in a session
      // (order-free, unlike q200's adjacent transitions): lift > 1 means
      // the pair travels together across sessions. Sessions from q35's
      // one-window pass; the distinct (session, type) projection is the
      // only corpus-sized shuffle — pair/single supports and the lift
      // arithmetic run on session-cardinality tables.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val st = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("_gap_us"))
        .withColumn("_new_sess",
          when(col("_gap_us").isNull || col("_gap_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_no", sum("_new_sess").over(wRun))
        .select(col("user_id"), col("session_no"), col("event_type"))
        .distinct()
      val nSess = st.select("user_id", "session_no").distinct()
        .agg(count(lit(1)).as("n_sessions"))
      val singles = st.groupBy("event_type").agg(count(lit(1)).as("n_with"))
      val pairs = st.as("a").join(st.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.session_no") === col("b.session_no") &&
            col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_both"))
      pairs
        .join(broadcast(singles.select(col("event_type").as("type_a"),
          col("n_with").as("_na"))), "type_a")
        .join(broadcast(singles.select(col("event_type").as("type_b"),
          col("n_with").as("_nb"))), "type_b")
        .crossJoin(broadcast(nSess))
        .select(col("type_a"), col("type_b"), col("n_both"),
          round((col("n_both") * col("n_sessions")).cast("double") /
            (col("_na") * col("_nb")), 4).as("lift"))
    }),

    "q210_pareto_revenue" -> ((s, dir) => {
      // Pareto concentration, inverse form: how many customers carry 80%
      // of revenue (q188 answers shares at fixed deciles; this answers
      // the count at a fixed share). Revenue in EXACT integer cents; the
      // answer is a COUNT over the running sum — a customer belongs to
      // the top-80 set iff the mass BEFORE it is under the target, so no
      // rank column and no argmin: one range-exchange prefix sum and a
      // conditional aggregate.
      val rev = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val summed = graft.operators.GlobalRank.withRunningSum(
        rev, Seq(col("cents").desc, col("o_custkey").asc), col("cents"), "cum")
      val tot = summed.agg(max("cum").as("_total"), count(lit(1)).as("n_customers"))
      summed.crossJoin(broadcast(tot))
        .select(col("n_customers"), col("_total"),
          ((col("cum") - col("cents")) * 5 < col("_total") * 4).as("_in80"))
        .groupBy("n_customers")
        .agg(sum(when(col("_in80"), 1L).otherwise(0L)).as("n_top80"))
        .select(col("n_customers"), col("n_top80"),
          round(col("n_top80").cast("double") / col("n_customers"), 4)
            .as("share_of_customers"))
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

    "q212_volume_correlation" -> ((s, dir) => {
      // Which event types move TOGETHER day to day: Pearson r between
      // every pair of zero-filled daily volume series (q194's scaffold,
      // q197's all-integer moment sums — exact cross-engine). High r =
      // shared upstream driver; a negative pair flags substitution. The
      // day self-join carries |types|² rows per day, never user rows.
      val ev = t(s, dir, "events")
        .select(col("event_type"), col("ts").cast("date").as("day"))
      val daily = ev.groupBy("event_type", "day").agg(count(lit(1)).as("c"))
      val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("d0"), (datediff(col("d1"), col("d0")) + 1).cast("long").as("nd"))
      val scaffold = broadcast(bounds)
        .select(col("nd"), explode(sequence(lit(0L), col("nd") - 1)).as("x"),
          col("d0"))
        .select(col("nd"), date_add(col("d0"), col("x").cast("int")).as("day"))
        .crossJoin(broadcast(ev.select("event_type").distinct()))
      val series = scaffold.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("nd"), col("day"),
          coalesce(col("c"), lit(0L)).as("y"))
      val joined = series.as("a").join(series.as("b"),
          col("a.day") === col("b.day") &&
            col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
          col("a.nd").as("nd"), col("a.y").as("x"), col("b.y").as("y"))
      val sums = joined.groupBy("type_a", "type_b", "nd")
        .agg(sum("x").as("sx"), sum("y").as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
      val num = (col("nd") * col("sxy") - col("sx") * col("sy")).cast("double")
      val den = sqrt((col("nd") * col("sxx") - col("sx") * col("sx")).cast("double")) *
        sqrt((col("nd") * col("syy") - col("sy") * col("sy")).cast("double"))
      sums.select(col("type_a"), col("type_b"), col("nd").as("n_days"),
        when(den > 0, round(num / den, 6)).as("pearson_r"))
    }),

    "q214_supplier_hhi" -> ((s, dir) => {
      // Supplier-concentration HHI per nation (Σ shareᵢ² — the antitrust
      // metric, here the supply-chain-risk read): revenue in exact
      // integer cents per supplier, HHI as Σc²/(Σc)² so the only
      // doubles are the two final folds. One lineitem aggregate on
      // suppkey; supplier→nation is a broadcast dimension hop.
      val rev = t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
      val sup = broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey")))
      val nat = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name")))
      rev.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum("cents").as("_tot"),
          sum(col("cents").cast("double") * col("cents").cast("double")).as("_sq"))
        .select(col("nation"), col("n_suppliers"),
          round(col("_tot").cast("double") / 100.0, 2).as("revenue"),
          round(col("_sq") / (col("_tot").cast("double") * col("_tot").cast("double")), 6)
            .as("hhi"))
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

    "q218_shuffle_skew" -> ((s, dir) => {
      // Pre-shuffle skew audit for a planned join/aggregation key:
      // simulate the 32-way hash partitioning of lineitem on l_orderkey
      // (md5-derived bucket — engine-neutral, so the oracle shares the
      // assignment: 2 hex nibbles = 256 values, 256 % 32 = 0, uniform)
      // and report each bucket's load factor and its heaviest single
      // key. This is the input to every salting / AQE-skew decision:
      // load_factor ≈ 1 everywhere means the key is safe; a hot bucket
      // DOMINATED by one key (max_key_rows ≈ n_rows) means salt THAT
      // key, not repartition harder. Two map-side-combining aggregates —
      // (bucket, key) then bucket — nothing corpus-sized shuffles twice.
      val rows = t(s, dir, "lineitem").select(col("l_orderkey"))
        .withColumn("bucket",
          conv(substring(md5(col("l_orderkey").cast("string")), 1, 2), 16, 10)
            .cast("long") % 32)
      val perKey = rows.groupBy("bucket", "l_orderkey").agg(count(lit(1)).as("c"))
      val perB = perKey.groupBy("bucket")
        .agg(count(lit(1)).as("n_keys"), sum("c").as("n_rows"),
          max("c").as("max_key_rows"))
      val tot = perB.agg(sum("n_rows").as("_tot"))
      perB.crossJoin(broadcast(tot))
        .select(col("bucket"), col("n_keys"), col("n_rows"), col("max_key_rows"),
          round(col("n_rows").cast("double") * 32 / col("_tot"), 4).as("load_factor"))
    }),

    "q219_packing_audit" -> ((s, dir) => {
      // GPT-style concat-and-split packing audit: documents concatenated
      // in ingest (doc_id) order and cut into 2048-token contexts; a doc
      // whose token span straddles a cut gets SPLIT — its head and tail
      // train with truncated attention. Context membership is a pure
      // function of the GLOBAL token prefix sum (GlobalRank.withRunningSum
      // — range exchange, no single-partition window): first_ctx =
      // ⌊(cum − n)/C⌋, last_ctx = ⌊(cum − 1)/C⌋, split iff they differ.
      // Per-source rollup shows which feeds lose the most attention
      // continuity (long docs straddle more); all arithmetic integer.
      val C = 2048L
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextExprs.tokenCount(col("text")).as("n_tok"))
      val summed = graft.operators.GlobalRank.withRunningSum(
        docs, Seq(col("doc_id").asc), col("n_tok"), "cum")
      summed
        .select(col("source"), col("n_tok"),
          (col("n_tok") > 0 &&
            floor((col("cum") - 1) / C) > floor((col("cum") - col("n_tok")) / C))
            .as("_split"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
          sum(when(col("_split"), 1L).otherwise(0L)).as("n_split"))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("n_split"),
          round(col("n_split").cast("double") / col("n_docs"), 4).as("split_share"))
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

    "q222_table_fingerprint" -> ((s, dir) => {
      // Order-independent table fingerprints — the replication/migration
      // validation primitive: two copies of a table match iff their
      // fingerprints match, computed WITHOUT moving either copy (one
      // map-side-combining aggregate per table, a constant-width result
      // to compare across clusters). Row hash = first 8 hex nibbles of
      // md5 over a canonical '|'-joined string form (money in exact
      // cents, dates as ISO strings); the fingerprint is the SUM of the
      // 32-bit row hashes — commutative, so partitioning and row order
      // can't move it, and mergeable across shards/partial loads.
      def fp(name: String, rows: DataFrame, canonical: Column): DataFrame =
        rows.agg(count(lit(1)).as("n_rows"),
            sum(conv(substring(md5(canonical), 1, 8), 16, 10).cast("long"))
              .as("fingerprint"))
          .select(lit(name).as("table_name"), col("n_rows"), col("fingerprint"))
      val ord = fp("orders", t(s, dir, "orders"),
        concat_ws("|", col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          round(col("o_totalprice") * 100).cast("long"),
          col("o_orderdate").cast("date").cast("string"), col("o_orderpriority")))
      val cust = fp("customer", t(s, dir, "customer"),
        concat_ws("|", col("c_custkey"), col("c_name"), col("c_nationkey"),
          round(col("c_acctbal") * 100).cast("long"), col("c_mktsegment")))
      val sup = fp("supplier", t(s, dir, "supplier"),
        concat_ws("|", col("s_suppkey"), col("s_name"), col("s_nationkey"),
          round(col("s_acctbal") * 100).cast("long")))
      ord.unionAll(cust).unionAll(sup)
    }),

    "q223_triangle_census" -> ((s, dir) => {
      // Triangle census of the part co-purchase graph — the clustering
      // structure behind "bought together" analysis, computed the
      // node-iterator way (Suri & Vassilvitskii 2011, "Counting triangles
      // and the curse of the last reducer"): edges canonicalized u < v,
      // wedges formed by ONE equi-join on the shared endpoint, closed by
      // an equi-join back onto the edge list — never an all-pairs
      // product. Support >= 2 (parts co-ordered at least twice)
      // sparsifies the edge set first, the standard mining cut that also
      // bounds wedge fan-out at scale. Global clustering coefficient =
      // 3·triangles / wedges, every term an exact integer.
      val edges = graft.operators.CoPurchase.edges(t(s, dir, "lineitem"))
        .select(col("p1").as("u"), col("p2").as("v"))
        .localCheckpoint() // degree census + both wedge sides + the closer
      val deg = edges.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val base = deg.agg(count(lit(1)).as("n_nodes"),
        (sum(col("d") * (col("d") - 1)) / 2).cast("long").as("n_wedges"))
      val ne = edges.agg(count(lit(1)).as("n_edges"))
      val tri = edges.as("e1").join(edges.as("e2"), col("e1.v") === col("e2.u"))
        .select(col("e1.u").as("x"), col("e2.v").as("z"))
        .join(edges.as("e3"), col("x") === col("e3.u") && col("z") === col("e3.v"))
        .agg(count(lit(1)).as("n_triangles"))
      base.crossJoin(ne).crossJoin(tri)
        .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
          round(col("n_triangles") * 3.0 / col("n_wedges"), 6).as("global_cc"))
    }),

    "q224_median_of_means" -> ((s, dir) => {
      // Median-of-means robust mean of event values: 16 deterministic
      // buckets (first hex nibble of md5(event_id) — engine-neutral, no
      // RNG state), per-bucket means pinned to 6 dp so partial-sum order
      // can't flip a bit, then the median of the 16 bucket means — the
      // classic distributed robust-mean construction with sub-Gaussian
      // deviation under heavy tails (each bucket is a shared-nothing
      // partial aggregate; only 16 doubles cross the wire). Reported
      // beside the plain mean: a large gap flags tail contamination.
      val ev = t(s, dir, "events")
        .select(col("value"),
          substring(md5(col("event_id").cast("string")), 1, 1).as("b"))
      val bm = ev.groupBy("b").agg(round(avg("value"), 6).as("m"))
      val mom = bm.agg(count(lit(1)).as("n_buckets"),
        round(expr("percentile(m, 0.5)"), 4).as("mom_mean"))
      val plain = ev.agg(count(lit(1)).as("n_events"),
        round(avg("value"), 4).as("plain_mean"))
      plain.crossJoin(mom)
        .select(col("n_events"), col("n_buckets"), col("plain_mean"),
          col("mom_mean"))
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

    "q227_cuped" -> ((s, dir) => {
      // CUPED variance reduction (Deng et al. 2013, "Improving the
      // sensitivity of online controlled experiments") — THE experiment-
      // platform primitive: adjust each user's post-period metric by the
      // pooled regression on their PRE-period covariate, shrinking metric
      // variance without touching the mean. Deterministic md5 arm split;
      // pre/post cut at the integer epoch midpoint of the stream. Every
      // moment is an exact integer sum per arm (one user-grain aggregate
      // then a 2-row arm rollup), and the adjusted variance uses the
      // CLOSED FORM var(Y−θX) = varY − 2θcov + θ²varX — no second pass
      // over users. θ is pooled across arms (the standard, unbiased
      // choice) via a broadcast one-row cross join.
      val ev = t(s, dir, "events")
        .select(col("user_id"), unix_timestamp(col("ts")).as("e"))
      val mid = ev.agg(floor((min("e") + max("e")) / 2).cast("long").as("_mid"))
      val perUser = ev.crossJoin(broadcast(mid))
        .groupBy("user_id")
        .agg(sum(when(col("e") < col("_mid"), 1L).otherwise(0L)).as("x"),
          sum(when(col("e") >= col("_mid"), 1L).otherwise(0L)).as("y"))
        .withColumn("arm",
          when(substring(md5(col("user_id").cast("string")), 1, 1)
            .isin("0", "1", "2", "3", "4", "5", "6", "7"), "A").otherwise("B"))
      val arms = perUser.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
      val pooled = arms.agg(sum("n").as("pn"), sum("sx").as("psx"),
          sum("sy").as("psy"), sum("sxy").as("psxy"), sum("sxx").as("psxx"))
        .select(((col("pn") * col("psxy") - col("psx") * col("psy")).cast("double") /
          (col("pn") * col("psxx") - col("psx") * col("psx")).cast("double"))
          .as("theta"))
      val nD = col("n").cast("double")
      val varY = (col("n") * col("syy") - col("sy") * col("sy")).cast("double") / (nD * nD)
      val covXY = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") / (nD * nD)
      val varX = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") / (nD * nD)
      val varAdj = varY - lit(2) * col("theta") * covXY + col("theta") * col("theta") * varX
      arms.crossJoin(broadcast(pooled))
        .select(col("arm"), col("n").as("n_users"),
          round(col("sy").cast("double") / nD, 4).as("mean_post"),
          round(varY, 4).as("var_post"),
          round(varAdj, 4).as("var_cuped"),
          round(lit(1) - varAdj / varY, 4).as("var_reduction"),
          round(col("theta"), 6).as("theta"))
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

    "q229_path_trigrams" -> ((s, dir) => {
      // Order-sensitive 3-step behavioral paths: consecutive event-type
      // triples within a session (both inter-step gaps <= 30 min) —
      // one partitioned window with two leads, completing the n-gram
      // ladder over the event stream (q200 = adjacent transitions,
      // q209 = order-free co-presence). Output is bounded by |types|³;
      // share normalizes over observed triples.
      val w = Window.partitionBy("user_id").orderBy(col("e"), col("event_id"))
      val tri = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("e"))
        .withColumn("t2", lead(col("event_type"), 1).over(w))
        .withColumn("e2", lead(col("e"), 1).over(w))
        .withColumn("t3", lead(col("event_type"), 2).over(w))
        .withColumn("e3", lead(col("e"), 2).over(w))
        .where(col("t3").isNotNull &&
          col("e2") - col("e") <= 1800 && col("e3") - col("e2") <= 1800)
        .groupBy(col("event_type").as("step1"), col("t2").as("step2"),
          col("t3").as("step3"))
        .agg(count(lit(1)).as("n"))
      val tot = tri.agg(sum("n").as("_tot"))
      tri.crossJoin(broadcast(tot))
        .select(col("step1"), col("step2"), col("step3"), col("n"),
          round(col("n").cast("double") / col("_tot"), 4).as("share"))
    }),

    "q230_benford" -> ((s, dir) => {
      // Benford first-digit audit of order totals — the forensic-
      // accounting screen for fabricated or systematically-capped
      // amounts: observed leading-digit shares vs log10(1 + 1/d), with
      // the χ² distance. The expected shares are SCALA CONSTANTS
      // injected into both engines (the lexicon-twin pattern), so the
      // two sides cannot drift; digit extraction is string-first on
      // exact integer cents. One corpus aggregate; everything after is
      // 9 rows.
      import s.implicits._
      val expected = broadcast(SparkEntry.benfordShares.toSeq
        .toDF("digit", "benford_share"))
      val digits = t(s, dir, "orders")
        .select(substring(round(col("o_totalprice") * 100).cast("long")
          .cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_orders"))
      val tot = digits.agg(sum("n_orders").as("_tot"))
      val joined = digits.join(expected, "digit").crossJoin(broadcast(tot))
      val exp = col("_tot") * col("benford_share")
      val chi2 = joined
        .agg(sum((col("n_orders") - exp) * (col("n_orders") - exp) / exp)
          .as("_chi2"))
      joined.crossJoin(broadcast(chi2))
        .select(col("digit"), col("n_orders"),
          round(col("n_orders").cast("double") / col("_tot"), 4).as("obs_share"),
          col("benford_share"),
          round(col("_chi2"), 4).as("chi2_total"))
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

    "q233_weighted_sample" -> ((s, dir) => {
      // Weighted sampling without replacement, Efraimidis–Spirakis 2006:
      // each doc draws u from md5 (13 nibbles / 2⁵², deterministic and
      // engine-neutral) and ranks by ln(u)/w — the top-k under that key
      // IS an exact weight-proportional sample without replacement, in
      // one pass with no sequential state (the mixture-construction
      // sampler: length-weighted here, quality-weighted in production).
      // Keys pinned to 12 dp (libm drift is ~1e-16 relative, far below)
      // with doc_id tie-break; top-64 via the GlobalRank range exchange,
      // never a driver-side sort.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .where(col("n_chars") > 0)
        .withColumn("u",
          (conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
            .cast("double") + lit(0.5)) / lit(4503599627370496.0))
        .withColumn("key", round(log(col("u")) / col("n_chars"), 12))
      graft.operators.GlobalRank.withRowNumber(
          docs, Seq(col("key").desc, col("doc_id").asc), "rank")
        .where(col("rank") <= 64)
        .select(col("rank"), col("doc_id"), col("source"), col("n_chars"))
    }),

    "q234_phrase_search" -> ((s, dir) => {
      // Positional phrase search — the inverted-index primitive BM25
      // (q52/q132) can't express: "A B" matches only where the terms are
      // ADJACENT. The engine side builds positional postings (token,
      // doc, pos) once and answers each phrase with an equi-join of the
      // two term posting lists on (doc, pos+1) — the indexed path that
      // at 100 TB reads two posting lists, never the corpus text. The
      // oracle proves the same result by per-doc bigram scanning.
      val posts = t(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(split(lower(TextExprs.cleanText(col("text"))), " ")))
        .toDF("doc_id", "pos", "tok")
      val phrases = Seq("fast table", "table table", "spark window")
      phrases.map { ph =>
        val Array(a, b) = ph.split(" ")
        posts.where(col("tok") === a).as("pa")
          .join(posts.where(col("tok") === b).as("pb"),
            col("pa.doc_id") === col("pb.doc_id") &&
              col("pb.pos") === col("pa.pos") + 1)
          .agg(countDistinct(col("pa.doc_id")).as("n_docs"),
            count(lit(1)).as("n_occurrences"))
          .select(lit(ph).as("phrase"), col("n_docs"), col("n_occurrences"))
      }.reduce(_ unionAll _)
    }),

    "q235_price_dispersion" -> ((s, dir) => {
      // Cross-supplier price dispersion per part — the arbitrage /
      // procurement-leakage audit: per-supplier mean unit price (exact
      // integer unit cents per row, so the mean is a deterministic
      // long-sum division), then the per-part spread between the
      // cheapest and dearest supplier. Top-20 by relative spread rides
      // the GlobalRank range exchange with partkey tie-break — no
      // global window, no driver sort.
      val unit = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          round(col("l_extendedprice") * 100 / col("l_quantity"))
            .cast("long").as("uc"))
      val perSupp = unit.groupBy("l_partkey", "l_suppkey")
        .agg((sum("uc").cast("double") / count(lit(1))).as("mean_uc"))
      val perPart = perSupp.groupBy("l_partkey")
        .agg(count(lit(1)).as("n_suppliers"),
          min("mean_uc").as("_lo"), max("mean_uc").as("_hi"))
        .where(col("n_suppliers") >= 2)
        .select(col("l_partkey"), col("n_suppliers"),
          round(col("_lo") / 100.0, 2).as("min_unit_price"),
          round(col("_hi") / 100.0, 2).as("max_unit_price"),
          ((col("_hi") - col("_lo")) / col("_lo")).as("_rel"))
      graft.operators.GlobalRank.withRowNumber(perPart,
          Seq(col("_rel").desc, col("l_partkey").asc), "rank")
        .where(col("rank") <= 20)
        .select(col("rank"), col("l_partkey"), col("n_suppliers"),
          col("min_unit_price"), col("max_unit_price"),
          round(col("_rel"), 4).as("rel_spread"))
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

    "q239_ewma_anomaly" -> ((s, dir) => {
      // Volume-spike monitor: each day's event total vs a truncated
      // exponentially-weighted baseline of the 12 PRIOR days (exclusive —
      // today must not vote on its own baseline). The (7/8)-decay kernel
      // is pre-scaled to exact LONG weights ([[ewmaWeights]]) so numerator,
      // denominator, and the spike test (y·Σw > 2·Σwy, cross-multiplied)
      // are all integer-exact in both engines; doubles appear only in the
      // two display columns. The lag join explodes the DAILY table (≤ a
      // few thousand rows after the one corpus-sized aggregate) × 12 —
      // scale-independent of the event count.
      val ev = t(s, dir, "events").select(col("ts").cast("date").as("day"))
      val daily = ev.groupBy("day").agg(count(lit(1)).as("c"))
      val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
        .select(col("d0"), (datediff(col("d1"), col("d0")) + 1).cast("long").as("nd"))
      val series = broadcast(bounds)
        .select(col("d0"), explode(sequence(lit(1L), col("nd"))).as("i"))
        .select(col("i"), date_add(col("d0"), (col("i") - 1).cast("int")).as("day"))
        .join(daily, Seq("day"), "left")
        .select(col("i"), col("day"), coalesce(col("c"), lit(0L)).as("n_events"))
      val weights = s.createDataFrame(ewmaWeights.map { case (j, w) => (j.toLong, w) })
        .toDF("j", "w")
      val prior = series.select(col("i").as("pi"), col("n_events").as("py"))
        .crossJoin(broadcast(weights))
        .select((col("pi") + col("j")).as("i"), col("w"),
          (col("w") * col("py")).as("wy"))
      val base = prior.groupBy("i")
        .agg(sum("w").as("denom"), sum("wy").as("numer"))
      series.join(base, Seq("i"))
        .select(col("day"), col("n_events"),
          round(col("numer").cast("double") / col("denom"), 4).as("ewma"),
          when(col("numer") > 0,
            round((col("n_events") * col("denom")).cast("double") / col("numer"), 4))
            .as("ratio"),
          (col("n_events") * col("denom") > col("numer") * 2).as("is_spike"))
    }),

    "q240_heaps_law" -> ((s, dir) => {
      // Heaps'-law SHINGLE-vocabulary growth: V(n) = #distinct token
      // 3-grams whose FIRST occurrence lies in the first n docs — the
      // curve that sizes the distinct-shingle table every minhash/dedup
      // index materializes (the fixture's raw token vocabulary is a
      // closed 31-word set, so growth is only measurable at the shingle
      // grain — exactly the grain the index stores). One corpus explode,
      // a min-per-gram aggregate (map-side combining), per-rank
      // increments, and TWO GlobalRank.withRunningSum prefix sums (range
      // exchange, no single-partition window); 20 checkpoints sampled
      // from the running curve, then the Heaps β (V ≈ K·Nᵝ) as a
      // closed-form log-log OLS over the 20 points. Checkpoints are
      // all-integer; only the fit is float, with 9-dp-pinned logs so
      // both engines regress identical inputs.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          filter(split(lower(TextExprs.cleanText(col("text"))), " "),
            tk => tk =!= "").as("toks"))
        .select(col("doc_id"),
          when(size(col("toks")) >= 3, // sequence(1, 0) descends — guard
            expr("transform(sequence(1, size(toks) - 2), i -> concat_ws(' '," +
              " element_at(toks, i), element_at(toks, i + 1)," +
              " element_at(toks, i + 2)))"))
            .otherwise(typedLit(Seq.empty[String])).as("grams"))
      val ranked = graft.operators.GlobalRank.withRowNumber(
          docs, Seq(col("doc_id").asc), "rk")
        .select(col("rk"), col("grams"), size(col("grams")).cast("long").as("ng"))
        .localCheckpoint() // feeds the explode AND the per-rank gram counts
      val first = ranked.select(col("rk"), explode(col("grams")).as("g"))
        .groupBy("g").agg(min("rk").as("frk"))
      val vIncr = first.groupBy("frk").agg(count(lit(1)).as("v_incr"))
      val perRank = ranked.select(col("rk"), col("ng"))
        .join(vIncr, col("rk") === col("frk"), "left")
        .select(col("rk"), col("ng"), coalesce(col("v_incr"), lit(0L)).as("v_incr"))
      val run = graft.operators.GlobalRank.withRunningSum(
        graft.operators.GlobalRank.withRunningSum(
          perRank, Seq(col("rk").asc), col("ng"), "n_grams"),
        Seq(col("rk").asc), col("v_incr"), "vocab")
      val cuts = broadcast(ranked.agg(max("rk").as("nd")))
        .select(explode(sequence(lit(1L), lit(20L))).as("checkpoint"), col("nd"))
        .select(col("checkpoint"), expr("(checkpoint * nd) div 20").as("cut"))
      val cp = run.join(broadcast(cuts), col("rk") === col("cut"))
        .select(col("checkpoint"), col("rk").as("n_docs"),
          col("n_grams"), col("vocab"))
      val fit = cp.where(col("n_grams") > 0 && col("vocab") > 0)
        .select(round(log(col("n_grams").cast("double")), 9).as("x"),
          round(log(col("vocab").cast("double")), 9).as("y"))
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      val beta = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      cp.crossJoin(broadcast(fit))
        .select(col("checkpoint"), col("n_docs"), col("n_grams"), col("vocab"),
          round(beta, 6).as("heaps_beta"),
          round(exp((col("sy") - beta * col("sx")) / col("n")), 6).as("heaps_k"))
    }),

    "q241_blocking_quality" -> ((s, dir) => {
      // Entity-resolution blocking audit: reduction ratio + pairs
      // completeness + precision of minhash banding at THREE geometries
      // ([[blockGeometries]]: 16×2, 8×4, 4×8 over one shared 32-perm
      // signature) vs exact char-3-gram Jaccard ≥ 0.7 ground truth — the
      // tuning table that decides which banding is safe at scale (and the
      // MEASURED answer to q159's probabilistic-recall caveat: 16×2's
      // completeness is the recall that caveat bounds). The scheme under
      // audit is an engine-neutral md5+XOR minhash ([[blockPerms]]
      // injected into both engines), because the verdict must be
      // computable by the oracle; the production Murmur3 path (q27)
      // shares the banding geometry. Ground truth is the q192-style
      // gram-keyed equi-join (bounded by shared-gram pairs, never an
      // unconditional n²), with the Jaccard threshold cross-multiplied to
      // stay all-integer: shared·10 ≥ 7·(|a|+|b|−shared). Ground truth
      // for pairs completeness is INHERENTLY quadratic, so — as every
      // production ER audit does — it runs on a fixed deterministic
      // slice (doc_id < 500): the audit's cost is constant in corpus
      // scale, and blocking quality is a property of scheme × data
      // distribution, which the slice samples.
      val docs = t(s, dir, "documents")
        .where(col("doc_id") < 500)
        .select(col("doc_id"), lower(TextExprs.cleanText(col("text"))).as("tx"))
        .where(length(col("tx")) >= 3)
      val sh = docs.select(col("doc_id"),
          explode(expr("transform(sequence(1, length(tx) - 2), i -> substring(tx, i, 3))")).as("g"))
        .distinct()
        .localCheckpoint() // feeds signatures, sizes, and the gram join
      val hv = sh.select(col("doc_id"),
        conv(substring(md5(col("g")), 1, 13), 16, 10).cast("long").as("hv"))
      val perms = s.createDataFrame(blockPerms.map { case (p, c) => (p.toLong, c) })
        .toDF("p", "c")
      val sig = hv.crossJoin(broadcast(perms))
        .groupBy("doc_id", "p")
        .agg(min(col("hv").bitwiseXOR(col("c"))).as("v"))
        .localCheckpoint() // the 32-perm signature feeds all 3 geometries
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val truth = sh.as("a")
        .join(sh.as("b"),
          col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("shared"))
        .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sa")), "id_a")
        .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sb")), "id_b")
        .where(col("shared") * 10 >= (col("sa") + col("sb") - col("shared")) * 7)
        .select("id_a", "id_b")
        .localCheckpoint() // counted AND intersected per geometry
      val perGeom = blockGeometries.map { case (nb, r) =>
        // band signature = the r per-band minhashes in perm order, as a
        // canonical string (array_sort on (p, v) structs orders by p; the
        // DuckDB twin is string_agg ORDER BY p)
        val bands = sig.groupBy(col("doc_id"), expr(s"p div $r").as("band"))
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("p"), col("v")))),
            x => x("v").cast("string")), ",").as("sg"))
        val cand = bands.as("a").join(bands.as("b"), Seq("band", "sg"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .where(col("id_a") < col("id_b"))
          .distinct()
          .localCheckpoint() // counted AND intersected with truth
        cand.agg(count(lit(1)).as("n_candidates"))
          .crossJoin(truth.join(cand, Seq("id_a", "id_b"), "left_semi")
            .agg(count(lit(1)).as("n_found")))
          .select(lit(nb).as("n_bands"), lit(r).as("rows_per_band"),
            col("n_candidates"), col("n_found"))
      }.reduce(_ unionAll _)
      val base = sizes.agg(count(lit(1)).as("n_docs"))
        .crossJoin(truth.agg(count(lit(1)).as("n_true_pairs")))
        .select(col("n_docs"),
          expr("(n_docs * (n_docs - 1)) div 2").as("n_all_pairs"),
          col("n_true_pairs"))
      perGeom.crossJoin(broadcast(base))
        .select(col("n_bands"), col("rows_per_band"), col("n_docs"),
          col("n_all_pairs"), col("n_true_pairs"), col("n_candidates"),
          col("n_found"),
          round(lit(1.0) - col("n_candidates").cast("double") / col("n_all_pairs"), 6)
            .as("reduction_ratio"),
          when(col("n_true_pairs") > 0,
            round(col("n_found").cast("double") / col("n_true_pairs"), 6))
            .as("pairs_completeness"),
          when(col("n_candidates") > 0,
            round(col("n_found").cast("double") / col("n_candidates"), 6))
            .as("cand_precision"))
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

    "q244_ks_drift" -> ((s, dir) => {
      // Exact two-sample Kolmogorov–Smirnov drift test: did the order-
      // value DISTRIBUTION shift between the stream's two epoch halves?
      // D = max |F₁−F₂| evaluated at every distinct value via two
      // GlobalRank.withRunningSum prefix passes over the per-value arm
      // counts (one range exchange each, no single-partition window); the
      // ECDF gap is cross-multiplied to the all-LONG |r₁·n₂ − r₂·n₁| so
      // the argmax is exact in both engines — doubles appear only in the
      // display D and the α=0.05 critical line (c(0.05)=1.358, the
      // standard asymptotic constant, identical literal in both engines).
      val o = t(s, dir, "orders").select(
        datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).cast("long").as("ed"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val cut = broadcast(o.agg(min("ed").as("lo"), max("ed").as("hi"))
        .select(expr("(lo + hi) div 2").as("cut")))
      val perVal = o.crossJoin(cut)
        .select(col("cents"), when(col("ed") <= col("cut"), 1L).otherwise(0L).as("a"))
        .groupBy("cents")
        .agg(sum("a").as("ca"), (count(lit(1)) - sum("a")).as("cb"))
      val tot = broadcast(perVal.agg(sum("ca").as("na"), sum("cb").as("nb")))
      val run = graft.operators.GlobalRank.withRunningSum(
        graft.operators.GlobalRank.withRunningSum(
          perVal, Seq(col("cents").asc), col("ca"), "ra"),
        Seq(col("cents").asc), col("cb"), "rb")
      val scored = run.crossJoin(tot)
        .select(col("cents"), col("na"), col("nb"),
          abs(col("ra") * col("nb") - col("rb") * col("na")).as("diff"))
      val dStat = col("mx").cast("double") / (col("na") * col("nb")).cast("double")
      val dCrit = lit(1.358) *
        sqrt((col("na") + col("nb")).cast("double") / (col("na") * col("nb")).cast("double"))
      scored.crossJoin(broadcast(scored.agg(max("diff").as("mx"))))
        .where(col("diff") === col("mx"))
        .groupBy("na", "nb", "mx").agg(min("cents").as("at_cents"))
        .select(col("na").as("n_early"), col("nb").as("n_late"),
          round(dStat, 6).as("d_stat"),
          round(col("at_cents").cast("double") / 100.0, 2).as("at_price"),
          round(dCrit, 6).as("d_crit_05"),
          (dStat > dCrit).as("drifted"))
    }),

    "q245_gini_segment" -> ((s, dir) => {
      // Exact Gini coefficient of customer revenue per market segment —
      // the revenue-concentration number behind every "whale" narrative:
      // G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) over revenue sorted ascending
      // within the segment. Revenue is exact integer cents, the rank is
      // a segment-partitioned window (groups are bounded — the q228
      // posture, not a global order), and ties are rank-order-invariant
      // because equal x contributes x·Σi regardless of permutation; both
      // engines divide the same two LONGs once.
      val rev = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val seg = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
        .join(rev, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_mktsegment"), coalesce(col("cents"), lit(0L)).as("cents"),
          col("c_custkey"))
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("cents").asc, col("c_custkey").asc)
      seg.withColumn("i", row_number().over(w).cast("long"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"), sum("cents").as("sx"),
          sum(col("i") * col("cents")).as("six"))
        .select(col("c_mktsegment"), col("n_customers"),
          round(col("sx").cast("double") / 100.0, 2).as("revenue"),
          round((lit(2) * col("six") - (col("n_customers") + 1) * col("sx"))
              .cast("double")
            / (col("n_customers") * col("sx")).cast("double"), 6).as("gini"))
    }),

    "q246_mann_whitney" -> ((s, dir) => {
      // Mann–Whitney U rank-sum test with tie correction: do URGENT
      // orders draw from the same value distribution as the rest? Ranks
      // come from one exclusive prefix sum over the per-value arm counts
      // (GlobalRank.withRunningSum — values, never rows, cross the
      // second exchange); midranks are kept DOUBLED (2·mid = 2·prefix +
      // t + 1) so the rank sum and 2·U₁ stay exact LONGs, and the tie
      // term Σ(t³−t) for the variance is integer too. Only the final
      // z-score divides — mirrored op order, 6 dp.
      val o = t(s, dir, "orders").select(
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("a"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val perVal = o.groupBy("cents")
        .agg(sum("a").as("ca"), (count(lit(1)) - sum("a")).as("cb"))
        .select(col("cents"), col("ca"), col("cb"), (col("ca") + col("cb")).as("t"))
      val run = graft.operators.GlobalRank.withRunningSum(
          perVal, Seq(col("cents").asc), col("t"), "rt")
        .select(col("ca"), col("cb"), col("t"),
          // doubled midrank of the tie group ending at rt: 2·excl + t + 1
          (lit(2) * (col("rt") - col("t")) + col("t") + 1).as("mid2"))
      val agg = run.agg(sum("ca").as("n1"), sum("cb").as("n2"),
        sum(col("ca") * col("mid2")).as("r1x2"),
        sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
      val n1d = col("n1").cast("double")
      val n2d = col("n2").cast("double")
      val nd = (col("n1") + col("n2")).cast("double")
      // 2U₁ = 2R₁ − n₁(n₁+1); z = (U₁ − n₁n₂/2) / σ with the tie-corrected
      // σ² = (n₁n₂/12)·((n+1) − Σ(t³−t)/(n(n−1)))
      val u1x2 = col("r1x2") - col("n1") * (col("n1") + 1)
      val sigma = sqrt(n1d * n2d / 12.0 *
        (nd + 1.0 - col("ties").cast("double") / (nd * (nd - 1.0))))
      val z = (u1x2.cast("double") / 2.0 - n1d * n2d / 2.0) / sigma
      agg.select(col("n1").as("n_urgent"), col("n2").as("n_other"),
        u1x2.as("u1_x2"),
        round(z, 6).as("z_score"),
        (abs(z) > 1.96).as("significant_05"))
    }),

    "q247_dow_seasonality" -> ((s, dir) => {
      // Day-of-week seasonality index per event type: share of the
      // type's volume landing on each weekday vs the uniform 1/7 — the
      // staffing/cadence read and the pre-check before any day-grain
      // trend claim (q194) is trusted. Weekday = epoch-day mod 7
      // (engine-neutral integer arithmetic — Spark and DuckDB disagree
      // on dayofweek numbering), labels injected from one Scala map; the
      // index is cross-multiplied integer counts until the final
      // display division.
      val labels = typedLit(dowLabels)
      val ev = t(s, dir, "events").select(col("event_type"),
        pmod(datediff(col("ts").cast("date"), to_date(lit("1970-01-01"))), lit(7))
          .cast("long").as("dw"))
      val cnt = ev.groupBy("event_type", "dw").agg(count(lit(1)).as("c"))
      val tot = cnt.groupBy("event_type").agg(sum("c").as("n_type"))
      cnt.join(broadcast(tot), "event_type")
        .select(col("event_type"), col("dw"),
          element_at(labels, col("dw").cast("int") + 1).as("weekday"),
          col("c").as("n_events"),
          round((col("c") * 7).cast("double") / col("n_type"), 4)
            .as("seasonality_index"))
    }),

    "q248_zonemap_audit" -> ((s, dir) => {
      // Zone-map / data-layout effectiveness audit: for the canonical
      // "last 30 days" predicate on l_shipdate, how many simulated
      // 32-file zone maps (per-file min/max) can be SKIPPED under (a)
      // arrival order (files keyed by md5 of the order key — q218's
      // bucketing) vs (b) shipdate-sorted layout (GlobalRank ntile)?
      // This is THE number that justifies sort/Z-order at 100 TB: the
      // same scan prunes ~0% of arrival files and ~29/32 of sorted
      // ones. All counts integer; the skip test (file max < predicate
      // low bound) is exact day arithmetic.
      val li = t(s, dir, "lineitem").select(
        datediff(col("l_shipdate"), to_date(lit("1970-01-01"))).cast("long").as("ed"),
        col("l_orderkey"), col("l_linenumber"))
      val cutoff = broadcast(li.agg((max("ed") - 29).as("lo")))
      val arrival = li.select(col("ed"),
        (conv(substring(md5(col("l_orderkey").cast("string")), 1, 2), 16, 10)
          .cast("long") % 32).as("bucket"))
      val sorted = graft.operators.GlobalRank.withNtile(li, 32,
          Seq(col("ed").asc, col("l_orderkey").asc, col("l_linenumber").asc),
          "bucket")
        .select(col("ed"), col("bucket"))
      def audit(df: DataFrame, layout: String): DataFrame =
        df.groupBy("bucket")
          .agg(max("ed").as("mx"), count(lit(1)).as("rows"))
          .crossJoin(cutoff)
          .agg(count(lit(1)).as("n_files"),
            sum(when(col("mx") < col("lo"), 1L).otherwise(0L)).as("files_skipped"),
            sum("rows").as("rows_total"),
            sum(when(col("mx") < col("lo"), col("rows")).otherwise(0L))
              .as("rows_skipped"))
          .select(lit(layout).as("layout"), col("n_files"), col("files_skipped"),
            col("rows_total"), col("rows_skipped"),
            round(col("rows_skipped").cast("double") / col("rows_total"), 4)
              .as("skip_fraction"))
      audit(arrival, "arrival").unionAll(audit(sorted, "shipdate_sorted"))
    }),

    "q249_km_survival" -> ((s, dir) => {
      // Kaplan–Meier survival curve of SESSION duration (q35's 30-min
      // sessionization), right-censored at the observation edge: a
      // session whose last event falls within 30 min of stream end may
      // still be open, so it contributes risk, not an event — dropping
      // it instead would bias the curve short (the classic truncation
      // mistake). Risk sets come from ONE exclusive prefix sum over
      // per-duration counts (GlobalRank — durations, not sessions,
      // cross the second exchange); the running product Π(1−dᵢ/nᵢ)
      // rides the SAME prefix-sum machinery as a sum of logs scaled to
      // exact LONGs (×1e9), so both engines accumulate identical
      // integers and exp() only at display. A terminal d=n group would
      // be ln(0): pinned to the shared −1e11 sentinel (S rounds to 0 at
      // 6 dp) in both engines.
      val w = Window.partitionBy("user_id").orderBy("e", "event_id")
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("e"))
      val endT = broadcast(ev.agg(max("e").as("end_e")))
      val sess = ev
        .withColumn("_new", when(lag("e", 1).over(w).isNull ||
          col("e") - lag("e", 1).over(w) > 1800, 1L).otherwise(0L))
        .withColumn("sid", sum("_new").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid").agg(min("e").as("fst"), max("e").as("lst"))
        .crossJoin(endT)
        .select(expr("(lst - fst) div 60").as("dur"),
          when(col("end_e") - col("lst") >= 1800, 1L).otherwise(0L).as("ended"))
      val perDur = sess.groupBy("dur")
        .agg(sum("ended").as("d"), (count(lit(1)) - sum("ended")).as("c"))
      val tot = broadcast(perDur.agg(sum(col("d") + col("c")).as("n_sessions")))
      val run = graft.operators.GlobalRank.withRunningSum(
          perDur, Seq(col("dur").asc), col("d") + col("c"), "rt")
        .crossJoin(tot)
        .select(col("dur"), col("d"), col("c"),
          (col("n_sessions") - (col("rt") - col("d") - col("c"))).as("n_risk"))
      val term = run.select(col("dur"), col("d"), col("c"), col("n_risk"),
        when(col("d") < col("n_risk"),
          round(log(lit(1.0) - col("d").cast("double") / col("n_risk")) * 1e9))
          .otherwise(lit(-1.0e11)).cast("long").as("lns"))
      graft.operators.GlobalRank.withRunningSum(
          term, Seq(col("dur").asc), col("lns"), "lsum")
        .select(col("dur").as("duration_min"), col("n_risk").as("n_at_risk"),
          col("d").as("n_ended"), col("c").as("n_censored"),
          round(exp(col("lsum").cast("double") / 1e9), 6).as("survival"))
    }),

    "q250_markov_stationary" -> ((s, dir) => {
      // Steady-state attention share of the behavioral Markov chain:
      // damped power iteration (PageRank.ranks — the q130 fixed-point
      // dataflow with its checkpoint-once contribution table) over
      // q200's session-gated transition graph, normalized to a
      // distribution and set against each type's RAW traffic share —
      // where users SETTLE vs where they merely pass through. The graph
      // is |types|² rows; five unrolled join+agg rounds touch only that.
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val edges = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("_next", lead("event_type", 1).over(w))
        .withColumn("_gap_us",
          lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
        .where(col("_next").isNotNull && col("_gap_us") <= 1800L * 1000000L)
        .groupBy(col("event_type").as("u"), col("_next").as("v"))
        .agg(count(lit(1)).as("w"))
        .localCheckpoint() // |types|² rows; 5 rounds must not rescan events
      val pr = graft.operators.PageRank.ranks(edges, iters = 5,
        materialize = false)
      val mass = pr.agg(sum("pr").as("_mass"))
      val raw = t(s, dir, "events").groupBy(col("event_type").as("tok"))
        .agg(count(lit(1)).as("n_events"))
      val rawTot = broadcast(raw.agg(sum("n_events").as("_tot")))
      pr.crossJoin(broadcast(mass)).join(raw, "tok").crossJoin(rawTot)
        .select(col("tok").as("event_type"), col("n_events"),
          round(col("pr"), 6).as("pagerank"),
          round(col("pr") / col("_mass"), 6).as("steady_share"),
          round(col("n_events").cast("double") / col("_tot"), 6).as("raw_share"))
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

    "q253_nation_flows" -> ((s, dir) => {
      // TPC-H Q7-shaped trade-flow matrix, generalized to ALL nation
      // pairs: revenue shipped from each supplier nation to each
      // (different) customer nation per year — the cross-border flow
      // table Q7 samples two cells of. Dims broadcast, lineitem⋈orders
      // the one shuffle join, exact cents; output bounded by
      // |nations|²·years.
      val nat = t(s, dir, "nation")
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("cents"))
      val custN = broadcast(t(s, dir, "customer").as("c")
        .join(nat.as("cn"), col("c.c_nationkey") === col("cn.n_nationkey"))
        .select(col("c.c_custkey"), col("cn.n_name").as("cust_nation")))
      val ords = t(s, dir, "orders")
        .join(custN, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("cust_nation"),
          year(col("o_orderdate")).cast("long").as("yr"))
      val supN = broadcast(t(s, dir, "supplier").as("s2")
        .join(nat.as("sn"), col("s2.s_nationkey") === col("sn.n_nationkey"))
        .select(col("s2.s_suppkey"), col("sn.n_name").as("supp_nation")))
      li.join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(supN, col("l_suppkey") === col("s_suppkey"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "yr")
        .agg(count(lit(1)).as("n_lines"), sum("cents").as("cents"))
        .select(col("supp_nation"), col("cust_nation"), col("yr").as("year"),
          col("n_lines"), round(col("cents").cast("double") / 100.0, 2).as("revenue"))
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

    "q255_psi_drift" -> ((s, dir) => {
      // Population Stability Index between the order-value distributions
      // of the stream's two epoch halves — the credit-risk industry's
      // drift gate (PSI < 0.1 stable, > 0.25 retrain), complementing
      // q244's KS: PSI weights ALL bins, KS only the worst point. Bins
      // are the REFERENCE half's deciles, found as exact cents cut
      // points from one prefix sum over per-value counts (rank·10 ≥
      // i·n₁, all integer — no interpolated percentile); both halves'
      // bin counts are +1-smoothed so an empty comparison bin stays
      // finite, and only the per-bin ln at display is float.
      val o = t(s, dir, "orders").select(
        datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).cast("long").as("ed"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val cut = broadcast(o.agg(min("ed").as("lo"), max("ed").as("hi"))
        .select(expr("(lo + hi) div 2").as("cut")))
      val armed = o.crossJoin(cut)
        .select(col("cents"), when(col("ed") <= col("cut"), 1L).otherwise(0L).as("a"))
      val perVal = armed.groupBy("cents")
        .agg(sum("a").as("ca"), (count(lit(1)) - sum("a")).as("cb"))
        .localCheckpoint() // feeds the decile scan AND the bin assignment
      val n1 = broadcast(perVal.agg(sum("ca").as("n1"), sum("cb").as("n2")))
      val run = graft.operators.GlobalRank.withRunningSum(
        perVal, Seq(col("cents").asc), col("ca"), "ra")
      // decile cut points of the reference half: smallest cents with
      // 10·rank >= i·n1, i = 1..9
      val cuts = run.crossJoin(n1)
        .crossJoin(broadcast(s.range(1, 10).select(col("id").as("i"))))
        .where(col("ra") * 10 >= col("i") * col("n1"))
        .groupBy("i").agg(min("cents").as("cutv"))
      val binned = perVal.crossJoin(broadcast(cuts))
        .groupBy("cents", "ca", "cb")
        .agg(sum(when(col("cents") >= col("cutv"), 1L).otherwise(0L)).as("bin"))
        .groupBy("bin").agg(sum("ca").as("ra"), sum("cb").as("rb"))
        .crossJoin(n1)
      val pa = (col("ra") + 1).cast("double") / (col("n1") + 10).cast("double")
      val pb = (col("rb") + 1).cast("double") / (col("n2") + 10).cast("double")
      val contrib = (pb - pa) * log(pb / pa)
      val rows = binned.select(col("bin"), col("ra").as("n_ref"),
        col("rb").as("n_cmp"), round(pa, 6).as("p_ref"), round(pb, 6).as("p_cmp"),
        round(contrib, 6).as("psi_contrib"))
      rows.crossJoin(broadcast(
          binned.agg(sum(contrib).as("_psi"))))
        .select(col("bin"), col("n_ref"), col("n_cmp"), col("p_ref"),
          col("p_cmp"), col("psi_contrib"), round(col("_psi"), 6).as("psi_total"))
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

    "q265_kneser_ney" -> ((s, dir) => {
      // Interpolated Kneser-Ney bigram smoothing (Kneser & Ney 1995;
      // Chen & Goodman 1998) — the LM-quality upgrade over q106's
      // Laplace: P(w2|w1) = max(c−D,0)/c(w1) + λ(w1)·N1+(•w2)/B with
      // D=0.75. The KN insight is that EVERY model table here is a
      // re-aggregate of the one bigram-TYPE table (continuation counts
      // N1+(w1•), N1+(•w2), the type total B) — the corpus shuffles
      // once to bigram grain and never again; the type table is pinned
      // so its four consumers share one computation.
      val docs = t(s, dir, "documents")
        .select(split(lower(TextExprs.cleanText(col("text"))), " ").as("toks"))
      val bg = docs.where(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(toks) - 1), " +
            "i -> named_struct('w1', toks[i-1], 'w2', toks[i]))")).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
        .where(col("w1") =!= "" && col("w2") =!= "")
      val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val ctx = bc.groupBy("w1")
        .agg(sum("c").as("cw1"), count(lit(1)).as("n1_fwd"))
      val cont = bc.groupBy("w2").agg(count(lit(1)).as("n1_rev"))
      val btypes = broadcast(bc.agg(count(lit(1)).as("btypes")))
      bc.join(ctx, Seq("w1")).join(cont, Seq("w2")).crossJoin(btypes)
        .select(col("w1"), col("w2"), col("c"), col("cw1"),
          col("n1_fwd"), col("n1_rev"),
          round((col("c").cast("double") - 0.75) / col("cw1") +
            (lit(0.75) * col("n1_fwd") / col("cw1")) *
            (col("n1_rev").cast("double") / col("btypes")), 6).as("p_kn"))
    }),

    "q266_l_diversity" -> ((s, dir) => {
      // l-diversity audit (Machanavajjhala 2007) — the release gate
      // q157's k-anonymity misses: a group can be large yet expose its
      // members if the SENSITIVE value barely varies inside it. Quasi-
      // identifier = (segment, nation, $1k-acctbal bucket); sensitive =
      // order priority. Two-level aggregate (QI×sens counts, then QI) —
      // distinct-l and the modal-value count fall out of plain counts,
      // no countDistinct Expand. All-integer output, hash-exact.
      val qi = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_mktsegment").as("segment"),
          col("n_name").as("nation"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"))
      val per = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority").as("sens"))
        .join(qi, col("o_custkey") === col("c_custkey"))
        .groupBy("segment", "nation", "bal_bucket", "sens")
        .agg(count(lit(1)).as("cnt"))
      per.groupBy("segment", "nation", "bal_bucket")
        .agg(sum("cnt").as("n_orders"), count(lit(1)).as("l_distinct"),
          max("cnt").as("top_sens_n"))
        .withColumn("diverse_ok", col("l_distinct") >= 3)
    }),

    "q267_kcore" -> ((s, dir) => {
      // k-core decomposition (k=3) of the part co-purchase graph —
      // the standard community-mining prefilter (Seidman 1983): peel
      // nodes of degree < k until a fixpoint. Edges = part pairs
      // sharing ≥ 2 orders (pair fan-out bounded by C(items/order, 2)).
      // The peel iterates DRIVER-side over distributed degree
      // aggregates + semi-joins on the shrinking alive set, each round
      // localCheckpoint-pinned so round n+1 never replays rounds 1..n
      // — the star-contraction discipline; O(peel-depth) rounds, each
      // one shuffle of the surviving edge list. The oracle mirrors it
      // as a bounded recursive CTE (extra rounds are no-ops after
      // convergence).
      val edges = graft.operators.CoPurchase.edges(t(s, dir, "lineitem"))
      graft.operators.KCore.core(edges, k = 3)
        .select(col("node").as("p_partkey"), col("deg").as("core_degree"))
    }),

    "q268_overdispersion" -> ((s, dir) => {
      // Poisson overdispersion screen per event type: the variance-to-
      // mean ratio of DAILY volumes (VMR ≈ 1 under a Poisson arrival
      // model; ≫ 1 means bursty/campaign-driven traffic whose "average
      // day" is a fiction). Day-grain counts, then one moment aggregate
      // per type — S1, S2 exact LONGs; mean/variance/VMR and the
      // (days−1)·VMR dispersion statistic divide only at display.
      val d = t(s, dir, "events")
        .select(col("event_type"),
          datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
            .cast("long").as("ed"))
        .groupBy("event_type", "ed").agg(count(lit(1)).as("n"))
      d.groupBy("event_type")
        .agg(count(lit(1)).as("days"), sum("n").as("s1"),
          sum(col("n") * col("n")).as("s2"))
        .select(col("event_type"), col("days"), col("s1"), col("s2"),
          round(col("s1").cast("double") / col("days"), 4).as("daily_mean"),
          round((col("s2") - col("s1").cast("double") * col("s1") / col("days"))
            / (col("days") - 1), 4).as("daily_var"),
          round(((col("s2") - col("s1").cast("double") * col("s1") / col("days"))
            / (col("days") - 1)) / (col("s1").cast("double") / col("days")), 4)
            .as("vmr"))
    }),

    "q269_mase_backtest" -> ((s, dir) => {
      // Forecast-skill backtest per event type: seasonal-naive (value 7
      // days ago) scored against the naive (yesterday) scale — MASE =
      // MAE₇/MAE₁ (Hyndman & Koehler 2006). Day-grain counts once,
      // then two equi-joins at lag 1 and lag 7 — never a window over
      // the raw stream; absolute errors sum as exact LONGs, the two
      // MAEs and their ratio divide at display. MASE < 1 = weekly
      // seasonality carries real signal for that type.
      val d = t(s, dir, "events")
        .select(col("event_type"),
          datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
            .cast("long").as("ed"))
        .groupBy("event_type", "ed").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val l1 = d.as("a").join(
          d.select(col("event_type"), (col("ed") + 1).as("ed"),
            col("n").as("n1")).as("b"), Seq("event_type", "ed"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("days_1"),
          sum(abs(col("n") - col("n1"))).as("abs_err_1"))
      val l7 = d.as("a").join(
          d.select(col("event_type"), (col("ed") + 7).as("ed"),
            col("n").as("n7")).as("b"), Seq("event_type", "ed"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("days_7"),
          sum(abs(col("n") - col("n7"))).as("abs_err_7"))
      l1.join(l7, Seq("event_type"))
        .select(col("event_type"), col("days_1"), col("days_7"),
          col("abs_err_1"), col("abs_err_7"),
          round(col("abs_err_1").cast("double") / col("days_1"), 4).as("mae_naive"),
          round(col("abs_err_7").cast("double") / col("days_7"), 4).as("mae_seasonal"),
          round((col("abs_err_7").cast("double") / col("days_7"))
            / (col("abs_err_1").cast("double") / col("days_1")), 4).as("mase"))
    }),

    "q270_t_closeness" -> ((s, dir) => {
      // t-closeness audit (Li 2007) over q266's quasi-identifier groups:
      // a group can be l-diverse yet still leak if its sensitive
      // DISTRIBUTION diverges from the table's. For the ordinal
      // priority scale the distance is the Earth-Mover's Distance =
      // mean |F_g − F_global| over the ordered values — computed as
      // exact LONG cross-products |cum_g·N − Cum·n_g| on a DENSIFIED
      // QI×sens scaffold (a missing value still shifts the CDF gap);
      // the global CDF rides prevCumByKey (no partition-less window),
      // the per-group one a bounded ≤|sens| window. One division at
      // display.
      val qi = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_mktsegment").as("segment"),
          col("n_name").as("nation"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"))
      val per = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority").as("sens"))
        .join(qi, col("o_custkey") === col("c_custkey"))
        .groupBy("segment", "nation", "bal_bucket", "sens")
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // feeds groups, the global CDF, and the scaffold
      val groups = per.groupBy("segment", "nation", "bal_bucket")
        .agg(sum("cnt").as("n_g"))
      val gsens = per.groupBy("sens").agg(sum("cnt").as("gcnt"))
      val gcum = gsens.join(prevCumByKey(gsens, "sens", "gcnt"), Seq("sens"))
        .select(col("sens"), (col("prev_cum") + col("gcnt")).as("gcum"))
      val scalars = broadcast(gsens
        .agg(sum("gcnt").as("nn"), count(lit(1)).as("k")))
      val dense = groups.crossJoin(broadcast(gcum))
        .join(per, Seq("segment", "nation", "bal_bucket", "sens"), "left")
        .na.fill(0L, Seq("cnt"))
      val wcum = Window.partitionBy("segment", "nation", "bal_bucket")
        .orderBy("sens").rowsBetween(Window.unboundedPreceding, 0)
      dense
        .withColumn("cum_g", sum("cnt").over(wcum))
        .crossJoin(scalars)
        .groupBy(col("segment"), col("nation"), col("bal_bucket"),
          col("n_g"), col("nn"), col("k"))
        .agg(sum(abs(col("cum_g") * col("nn") - col("gcum") * col("n_g")))
          .as("emd_num"))
        .select(col("segment"), col("nation"), col("bal_bucket"),
          col("n_g").as("n_orders"),
          round(col("emd_num").cast("double")
            / (col("n_g") * col("nn") * (col("k") - 1)), 6).as("t_emd"))
        .withColumn("tclose_ok", col("t_emd") <= 0.2)
    }),

    "q271_clustering_coeff" -> ((s, dir) => {
      // Local clustering coefficient over the q267 co-purchase graph:
      // cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — the per-node
      // transitivity behind q223's global triangle census. Triangles
      // come from the node-iterator wedge join (ab ⋈ bc ⋈ ac on the
      // ordered edge list — each triangle counted once, attributed to
      // all three corners); degrees from one edge-list aggregate. The
      // edge list is pinned: four consumers, one materialization.
      val e = graft.operators.CoPurchase.edges(t(s, dir, "lineitem"))
        .localCheckpoint()
      val deg = e.select(col("p1").as("node"))
        .unionAll(e.select(col("p2").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val tri = graft.operators.CoPurchase.triangles(e)
      val triPerNode = tri.select(col("x").as("node"))
        .unionAll(tri.select(col("y").as("node")))
        .unionAll(tri.select(col("z").as("node")))
        .groupBy("node").agg(count(lit(1)).as("tri"))
      deg.join(triPerNode, Seq("node"), "left")
        .na.fill(0L, Seq("tri"))
        .select(col("node").as("p_partkey"), col("deg"), col("tri"),
          when(col("deg") >= 2,
            round(col("tri") * 2.0 / (col("deg") * (col("deg") - 1)), 6))
            .otherwise(0.0).as("clustering_coeff"))
    }),

    "q272_brier_decomposition" -> ((s, dir) => {
      // Murphy decomposition of the Brier score for the q133 quality
      // filter: BS = REL − RES + UNC, exact because the decomposition
      // runs at the UNIQUE-forecast grain (≤ 10⁴+1 values — the
      // log-odds weight mapped to a probability by a fixed linear
      // clamp, kept in integer ten-thousandths). BS itself is computed
      // from three exact LONG moments (Σn·f², Σs·f, Σy) — no float sum
      // over the corpus at all; REL/RES are bounded-table doubles.
      // Tells you WHY a score filters badly: miscalibration (REL) vs
      // no discrimination (RES ≈ 0).
      val posSources = (0 to 4).map(i => s"src$i")
      val docs = t(s, dir, "documents")
      val scored = graft.operators.TextAnalysis.hashNbClassifier(
        docs, col("doc_id"), col("text"), col("source").isin(posSources: _*))
      val lab = scored.join(docs.select(col("doc_id"), col("source")), "doc_id")
        .select(
          least(greatest(
            expr("(CAST(round(quality_w * 10000) AS BIGINT) + 10000) div 2"),
            lit(0L)), lit(10000L)).as("fu"),
          when(col("source").isin(posSources: _*), 1L).otherwise(0L).as("y"))
      val fg = lab.groupBy("fu")
        .agg(count(lit(1)).as("n_k"), sum("y").as("s_k"))
        .localCheckpoint() // unique-forecast grain: moments + both re-aggs
      val tot = broadcast(fg.agg(sum("n_k").as("nn"), sum("s_k").as("ss"),
        sum(col("n_k") * col("fu") * col("fu")).as("m2"),
        sum(col("s_k") * col("fu")).as("m1")))
      fg.crossJoin(tot)
        .groupBy(col("nn"), col("ss"), col("m2"), col("m1"))
        .agg(
          sum(col("n_k") *
            pow(col("fu") / 10000.0 - col("s_k").cast("double") / col("n_k"), 2))
            .as("rel_sum"),
          sum(col("n_k") *
            pow(col("s_k").cast("double") / col("n_k")
              - col("ss").cast("double") / col("nn"), 2)).as("res_sum"))
        .withColumn("reliability", round(col("rel_sum") / col("nn"), 6))
        .withColumn("resolution", round(col("res_sum") / col("nn"), 6))
        .select(col("nn").as("n_docs"),
          round(col("ss").cast("double") / col("nn"), 4).as("pos_rate"),
          round((col("m2") - col("m1") * 20000L
            + col("ss") * 100000000L).cast("double")
            / (col("nn").cast("double") * 100000000L), 6).as("brier"),
          col("reliability"), col("resolution"),
          round((col("ss").cast("double") / col("nn"))
            * (lit(1.0) - col("ss").cast("double") / col("nn")), 6)
            .as("uncertainty"))
    }),

    "q273_rrf_fusion" -> ((s, dir) => {
      // Hybrid-search fusion: Reciprocal Rank Fusion (Cormack 2009) of
      // the sparse BM25 list and the dense cosine list — ranks, not
      // scores, so the incompatible scales never need calibration.
      // Both lists are bounded top-50 pools cut on ROUNDED scores with
      // doc_id tie-breaks (TakeOrderedAndProject — deterministic sets,
      // never a global sort); ranks come from the 50²-bounded
      // triangular self-join (zero-window posture), the fused score is
      // a two-term sum, and absent-from-list is an explicit rank 0.
      val kPool = 50
      def rank(df: DataFrame, score: String, name: String): DataFrame =
        df.as("a").join(df.select(col("doc_id").as("_bid"),
            col(score).as("_bs")).as("b"),
            col("_bs") > col(score) ||
            (col("_bs") === col(score) && col("_bid") < col("doc_id")), "left")
          .groupBy(col("doc_id"))
          .agg((count(col("_bid")) + 1L).as(name))
      val lex = Retrieval.bm25(t(s, dir, "documents"), col("doc_id"),
          col("text"), terms = Seq("spark", "vector", "stream"))
        .orderBy(col("score").desc, col("doc_id").asc).limit(kPool)
        .localCheckpoint()
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id").as("doc_id"),
          col("embedding").cast("array<double>").as("v"))
      val probe = broadcast(emb.where(col("doc_id") === 0)
        .select(col("v").as("q")))
      val dense = emb.crossJoin(probe)
        .select(col("doc_id"),
          round(VectorExprs.cosine(col("v"), col("q")), 6).as("cos"))
        .orderBy(col("cos").desc, col("doc_id").asc).limit(kPool)
        .localCheckpoint()
      rank(lex, "score", "lex_rank")
        .join(rank(dense, "cos", "dense_rank"), Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
          coalesce(col("dense_rank"), lit(0L)).as("dense_rank"),
          round(
            when(col("lex_rank").isNotNull, lit(1.0) / (col("lex_rank") + 60))
              .otherwise(0.0) +
            when(col("dense_rank").isNotNull, lit(1.0) / (col("dense_rank") + 60))
              .otherwise(0.0), 6).as("rrf_score"))
        .orderBy(col("rrf_score").desc, col("doc_id").asc).limit(20)
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

    "q275_median_ci" -> ((s, dir) => {
      // Distribution-free 95% CI for the MEDIAN daily volume per event
      // type, from binomial order statistics (rank l = ⌊(n−1.96√n)/2⌋,
      // u = ⌈1+(n+1.96√n)/2⌉ — no normality assumption on the values,
      // only on the rank of the median). Day-grain counts once; ranks
      // via a bounded per-type window (≤ |days| rows per partition);
      // the three order statistics fall out of one conditional
      // aggregate. The honest summary for a bursty series where a bare
      // median invites overconfidence.
      val d = t(s, dir, "events")
        .select(col("event_type"),
          datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
            .cast("long").as("ed"))
        .groupBy("event_type", "ed").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy(col("n").asc, col("ed").asc)
      val ranked = d.withColumn("rn", row_number().over(w).cast("long"))
        .localCheckpoint() // rank pass feeds the cuts and the pick
      val cuts = ranked.groupBy("event_type").agg(count(lit(1)).as("days"))
        .select(col("event_type"), col("days"),
          greatest(floor((col("days") - lit(1.96) * sqrt(col("days"))) / 2)
            .cast("long"), lit(1L)).as("rank_lo"),
          least(ceil(lit(1.0) +
            (col("days") + lit(1.96) * sqrt(col("days"))) / 2).cast("long"),
            col("days")).as("rank_hi"),
          ceil(col("days").cast("double") / 2).cast("long").as("rank_med"))
      ranked.join(broadcast(cuts), "event_type")
        .groupBy(col("event_type"), col("days"),
          col("rank_lo"), col("rank_hi"))
        .agg(max(when(col("rn") === col("rank_med"), col("n")))
            .as("median_daily"),
          max(when(col("rn") === col("rank_lo"), col("n"))).as("ci_lo"),
          max(when(col("rn") === col("rank_hi"), col("n"))).as("ci_hi"))
    }),

    "q276_edge_embeddedness" -> ((s, dir) => {
      // Edge embeddedness over the co-purchase graph: common-neighbor
      // count per EDGE (each triangle credits its three edges — the
      // q271 wedge join re-keyed to edges), rolled into a distribution
      // with the LOCAL-BRIDGE share (embeddedness 0 = Granovetter weak
      // ties; at 100 TB these are the cross-community links a
      // partitioner must not cut). Edge list pinned, one wedge join,
      // |distinct embeddedness| output rows.
      val e = graft.operators.CoPurchase.edges(t(s, dir, "lineitem"))
        .localCheckpoint()
      val tri = graft.operators.CoPurchase.triangles(e)
      // each triangle (x<y<z) credits edges (x,y), (y,z), (x,z)
      val perEdge = tri.select(col("x").as("p1"), col("y").as("p2"))
        .unionAll(tri.select(col("y").as("p1"), col("z").as("p2")))
        .unionAll(tri.select(col("x").as("p1"), col("z").as("p2")))
        .groupBy("p1", "p2").agg(count(lit(1)).as("emb"))
      val dist = e.join(perEdge, Seq("p1", "p2"), "left")
        .na.fill(0L, Seq("emb"))
        .groupBy("emb").agg(count(lit(1)).as("n_edges"))
      dist.crossJoin(broadcast(dist.agg(sum("n_edges").as("te"))))
        .select(col("emb").as("embeddedness"), col("n_edges"),
          round(col("n_edges").cast("double") / col("te"), 6)
            .as("edge_share"),
          (col("emb") === 0L).as("is_local_bridge"))
    }),

    "q277_seasonal_decompose" -> ((s, dir) => {
      // Classical additive decomposition of the daily event series:
      // trend = 7-day centered moving sum (kept as an exact LONG at ×7
      // scale — the division to a mean happens only at display),
      // seasonal = per-weekday mean of the ×7 detrended series
      // (uncentered), residual = the rest. Day-grain counts once; the
      // centered window is a ±3-day self-join of the tiny day table
      // gated on ALL 7 neighbors present (edge days drop out, never
      // fabricate a half-window trend); weekday labels ride q247's
      // shared epoch-day-mod-7 list. The monitoring view that separates
      // "weekends are slow" from "something broke".
      val dd = t(s, dir, "events")
        .select(datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
          .cast("long").as("ed"))
        .groupBy("ed").agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // both self-join sides + the DOW agg read it
      val trend = dd.as("a")
        .join(dd.select(col("ed").as("_bed"), col("cnt").as("_bc")).as("b"),
          col("_bed") >= col("ed") - 3 && col("_bed") <= col("ed") + 3)
        .groupBy(col("ed"), col("cnt"))
        .agg(count(lit(1)).as("_nw"), sum("_bc").as("trend7"))
        .where(col("_nw") === 7)
        .localCheckpoint() // the DOW means and the per-day output share it
      val dowLbl = dowLabels.zipWithIndex
        .map { case (l, i) => (i.toLong, l) }
      val sp = s
      import sp.implicits._
      val lbl = broadcast(dowLbl.toDF("dow_i", "dow"))
      val seas = trend
        .select((col("ed") % 7).as("dow_i"),
          (col("cnt") * 7 - col("trend7")).as("detr7"))
        .groupBy("dow_i")
        .agg(sum("detr7").as("s_num"), count(lit(1)).as("s_den"))
      trend.select((col("ed") % 7).as("dow_i"), col("ed"), col("cnt"),
          col("trend7"))
        .join(broadcast(seas), Seq("dow_i"))
        .join(lbl, Seq("dow_i"))
        .select(col("ed"), col("dow"), col("cnt"),
          round(col("trend7").cast("double") / 7.0, 4).as("trend"),
          round(col("s_num").cast("double") / (col("s_den") * 7), 4)
            .as("seasonal"),
          round(col("cnt").cast("double") - col("trend7").cast("double") / 7.0
            - col("s_num").cast("double") / (col("s_den") * 7), 4)
            .as("residual"))
    }),

    "q278_fightin_words" -> ((s, dir) => {
      // "Fightin' words" (Monroe, Colaresi & Quinn 2008): per-source
      // DISTINCTIVE vocabulary via log-odds ratios with an informative
      // Dirichlet prior — the corpus-vs-rest comparison TF-IDF gets
      // wrong for common-but-skewed tokens. All counts are exact LONG
      // re-aggregates of the ONE (source, token) table; the prior
      // α_w = α0·y_w/N shrinks rare-token noise; z = δ/√var with the
      // variance from the standard 1/(y+α) approximation. Top-10 per
      // source on the ROUNDED z (4dp) with token tie-break — a bounded
      // per-source window over the vocab.
      val st = t(s, dir, "documents")
        .select(col("source"),
          explode(split(lower(TextExprs.cleanText(col("text"))), " "))
            .as("token"))
        .where(col("token") =!= "")
        .groupBy("source", "token").agg(count(lit(1)).as("y_sw"))
        .localCheckpoint() // token totals, source totals, N all re-agg it
      val yw = st.groupBy("token").agg(sum("y_sw").as("y_w"))
      val ns = st.groupBy("source").agg(sum("y_sw").as("n_s"))
      val tot = broadcast(st.agg(sum("y_sw").as("nn")))
      val a0 = 1000.0
      val scored = st.join(yw, Seq("token")).join(broadcast(ns), Seq("source"))
        .crossJoin(tot)
        .withColumn("a_w", lit(a0) * col("y_w") / col("nn"))
        .withColumn("delta",
          log((col("y_sw") + col("a_w")) /
            (col("n_s") + lit(a0) - col("y_sw") - col("a_w"))) -
          log((col("y_w") - col("y_sw") + col("a_w")) /
            (col("nn") - col("n_s") + lit(a0)
              - (col("y_w") - col("y_sw")) - col("a_w"))))
        .withColumn("z", round(col("delta") /
          sqrt(lit(1.0) / (col("y_sw") + col("a_w")) +
            lit(1.0) / (col("y_w") - col("y_sw") + col("a_w"))), 4))
      val w = Window.partitionBy("source")
        .orderBy(col("z").desc, col("token").asc)
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 10)
        .select(col("source"), col("rnk"), col("token"), col("y_sw"),
          col("z"))
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

    "q280_discount_elasticity" -> ((s, dir) => {
      // Per-brand discount→quantity response: OLS slope and Pearson r
      // of quantity on discount points, all six moments exact LONGs
      // from ONE scan-side aggregate (x = discount in integer percent,
      // y = integer quantity; at extreme per-brand row counts the n·Σxy
      // cross-products want DECIMAL(38) or mean-centered streaming
      // moments — at any per-group n below ~10⁹ the LONG forms are
      // exact). The merchandising question behind every promo budget:
      // which brands actually move when discounted?
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          round(col("l_discount") * 100).cast("long").as("x"),
          col("l_quantity").cast("long").as("y"))
      li.groupBy("p_brand")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("p_brand"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
              * (col("n") * col("syy") - col("sy") * col("sy"))), 4).as("r"))
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

    "q282_bfs_hops" -> ((s, dir) => {
      // Hop-distance census by unrolled BFS (4 rounds) from the
      // highest-degree hub of the co-purchase graph — the landmark-
      // distance sketch behind graph-diameter estimates at scale: each
      // round ONE join of the frontier against the pinned edge list +
      // an anti-join on the visited set (ids only). Emits how much of
      // the graph each hop ring reaches; 'unreached' rounds up the
      // census so the rings provably tile the node set.
      val e = graft.operators.CoPurchase.edges(t(s, dir, "lineitem"))
        .localCheckpoint()
      val und = e.select(col("p1").as("u"), col("p2").as("v"))
        .unionAll(e.select(col("p2").as("u"), col("p1").as("v")))
        .localCheckpoint()
      val hub = und.groupBy("u").agg(count(lit(1)).as("deg"))
        .orderBy(col("deg").desc, col("u").asc).limit(1)
        .select(col("u").as("node"), lit(0L).as("hop"))
      var visited = hub.localCheckpoint()
      var frontier = visited
      for (h <- 1L to 4L) {
        val next = frontier.join(und, col("node") === col("u"))
          .select(col("v").as("node")).distinct()
          .join(visited.select(col("node").as("_vn")),
            col("node") === col("_vn"), "left_anti")
          .select(col("node"), lit(h).as("hop"))
          .localCheckpoint()
        // visited is a union of already-pinned rings — no re-checkpoint
        visited = visited.unionAll(next)
        frontier = next
      }
      val ringed = visited.groupBy("hop").agg(count(lit(1)).as("n_nodes"))
      val allNodes = und.select(col("u").as("node")).distinct()
      val unreached = allNodes
        .join(visited.select(col("node").as("_vn")),
          col("node") === col("_vn"), "left_anti")
        .agg(count(lit(1)).as("n_nodes"))
        .select(lit(-1L).as("hop"), col("n_nodes"))
      ringed.unionAll(unreached.where(col("n_nodes") > 0))
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

    "q284_eb_shrinkage" -> ((s, dir) => {
      // Empirical-Bayes shrinkage of per-brand return rates (beta-
      // binomial, method-of-moments prior): small brands get pulled
      // toward the pooled mean in proportion to their evidence — the
      // ranking discipline that stops a 3-line brand with one return
      // from topping the "worst quality" report. Counts are exact
      // LONGs; the prior moments are 10/12dp-pinned before the
      // posterior so both engines shrink from identical (α, β).
      val br = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("k"))
        .localCheckpoint() // prior moments re-agg the bounded brand table
      val prior = broadcast(br
        .select(col("n"), col("k"),
          (col("k").cast("double") / col("n")).as("r"))
        .agg(count(lit(1)).as("b"), sum("r").as("sr"),
          sum(col("r") * col("r")).as("srr"))
        .select(round(col("sr") / col("b"), 10).as("m"),
          round((col("srr") - col("sr") * col("sr") / col("b"))
            / (col("b") - 1), 12).as("v")))
      br.crossJoin(prior)
        .withColumn("ab", col("m") * (lit(1.0) - col("m")) / col("v") - 1.0)
        .select(col("p_brand"), col("n"), col("k"),
          round(col("k").cast("double") / col("n"), 6).as("raw_rate"),
          round((col("k") + col("m") * col("ab"))
            / (col("n") + col("ab")), 6).as("shrunk_rate"))
    }),

    "q285_oov_drift" -> ((s, dir) => {
      // Frozen-vocabulary OOV drift: build the top-512 vocabulary on
      // the corpus's FIRST half (by doc_id — the standing snapshot),
      // then measure each source's out-of-vocabulary token rate on
      // BOTH halves; the in-sample rate is the baseline that makes the
      // second-half rate interpretable. The tokenizer-freeze question
      // every multi-epoch ingest faces: is new data drifting out of
      // the vocab the model was built on? Vocab cut on exact counts
      // with token tie-break (TakeOrdered); OOV flags via one left
      // join against the broadcast vocab.
      val docs = t(s, dir, "documents")
      val mx = broadcast(docs.agg(max("doc_id").as("mxid")))
      val tk = docs.crossJoin(mx)
        .select(when(col("doc_id") * 2 <= col("mxid"), lit("A"))
            .otherwise(lit("B")).as("epoch"),
          col("source"),
          explode(split(lower(TextExprs.cleanText(col("text"))), " "))
            .as("token"))
        .where(col("token") =!= "")
        .localCheckpoint() // vocab build + both epoch rates read it
      val vocab = broadcast(tk.where(col("epoch") === "A")
        .groupBy("token").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("token").asc).limit(512)
        .select(col("token").as("_vt")))
      val flagged = tk.join(vocab, col("token") === col("_vt"), "left")
        .select(col("epoch"), col("source"),
          when(col("_vt").isNull, 1L).otherwise(0L).as("oov"))
      val rates = flagged.groupBy("source", "epoch")
        .agg(count(lit(1)).as("toks"), sum("oov").as("oovs"))
      val a = rates.where(col("epoch") === "A")
        .select(col("source"), col("toks").as("tokens_a"),
          col("oovs").as("oov_a"))
      val b = rates.where(col("epoch") === "B")
        .select(col("source"), col("toks").as("tokens_b"),
          col("oovs").as("oov_b"))
      a.join(b, Seq("source"))
        .select(col("source"), col("tokens_a"), col("oov_a"),
          col("tokens_b"), col("oov_b"),
          round(col("oov_a").cast("double") / col("tokens_a"), 6)
            .as("oov_rate_a"),
          round(col("oov_b").cast("double") / col("tokens_b"), 6)
            .as("oov_rate_b"),
          round(col("oov_b").cast("double") / col("tokens_b")
            - col("oov_a").cast("double") / col("tokens_a"), 6)
            .as("oov_drift"))
    }),

    "q286_link_prediction" -> ((s, dir) => {
      // Common-neighbor link prediction over the co-purchase graph
      // (Liben-Nowell & Kleinberg 2003): candidate pairs are EXACTLY
      // the distance-2 wedge endpoints (never all-pairs), scored by
      // neighborhood Jaccard cn/(deg_u + deg_v − cn), existing edges
      // anti-joined away, top-20 on the rounded score via TakeOrdered.
      // The "customers also bought" candidate generator, stated as a
      // plan: one wedge join + one anti-join + two degree lookups.
      val e = graft.operators.CoPurchase.edges(t(s, dir, "lineitem"))
        .localCheckpoint()
      val und = e.select(col("p1").as("u"), col("p2").as("v"))
        .unionAll(e.select(col("p2").as("u"), col("p1").as("v")))
      val deg = und.groupBy("u").agg(count(lit(1)).as("deg"))
      val wedges = und.as("a").join(und.as("b"),
          col("a.v") === col("b.u") && col("a.u") < col("b.v"))
        .groupBy(col("a.u").as("p1"), col("b.v").as("p2"))
        .agg(count(lit(1)).as("cn"))
      val cand = wedges.join(e, Seq("p1", "p2"), "left_anti")
      cand
        .join(deg.select(col("u").as("p1"), col("deg").as("d1")), Seq("p1"))
        .join(deg.select(col("u").as("p2"), col("deg").as("d2")), Seq("p2"))
        .select(col("p1"), col("p2"), col("cn"),
          round(col("cn").cast("double")
            / (col("d1") + col("d2") - col("cn")), 6).as("jaccard"))
        .orderBy(col("jaccard").desc, col("p1").asc, col("p2").asc)
        .limit(20)
    }),

    "q287_simpson_audit" -> ((s, dir) => {
      // Simpson's-paradox screen on the q280 discount→quantity fit:
      // for each brand, the GLOBAL OLS slope vs the per-customer-
      // segment slopes — a sign flip between the aggregate and the
      // (majority of) strata is the reversal that invalidates the
      // naive "discounts work/don't work" read. All moments exact
      // LONGs at (brand, segment) grain; the global fit re-aggregates
      // the SAME moment table (moments are additive), so the stream is
      // scanned once.
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        // customer joins UNHINTED: a real customer dim exceeds any
        // broadcast threshold; AQE still broadcasts while it measures small
        .join(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("segment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("p_brand"), col("segment"),
          round(col("l_discount") * 100).cast("long").as("x"),
          col("l_quantity").cast("long").as("y"))
      val seg = li.groupBy("p_brand", "segment")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .localCheckpoint() // the global fit re-aggs these additive moments
      def slope(n: Column, sx: Column, sy: Column, sxy: Column,
          sxx: Column): Column =
        (n * sxy - sx * sy).cast("double") / (n * sxx - sx * sx)
      val segFit = seg.select(col("p_brand"),
        when(slope(col("n"), col("sx"), col("sy"), col("sxy"),
          col("sxx")) > 0, 1L).otherwise(0L).as("pos"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_segments"), sum("pos").as("n_seg_positive"))
      val glob = seg.groupBy("p_brand")
        .agg(sum("n").as("n"), sum("sx").as("sx"), sum("sy").as("sy"),
          sum("sxy").as("sxy"), sum("sxx").as("sxx"))
        .select(col("p_brand"),
          round(slope(col("n"), col("sx"), col("sy"), col("sxy"),
            col("sxx")), 6).as("global_slope"))
      glob.join(segFit, Seq("p_brand"))
        .select(col("p_brand"), col("global_slope"), col("n_segments"),
          col("n_seg_positive"),
          ((col("global_slope") > 0 &&
            col("n_seg_positive") * 2 < col("n_segments")) ||
           (col("global_slope") < 0 &&
            col("n_seg_positive") * 2 > col("n_segments")))
            .as("simpson_flag"))
    }),

    "q288_markov_order_test" -> ((s, dir) => {
      // Memorylessness test for the q200/q250 first-order Markov view:
      // in the 3-way table of session-gated (prev, cur, next) triples,
      // test prev ⟂ next | cur — expected cell count E =
      // T(prev,cur,·)·T(·,cur,next)/T(·,cur,·), χ² per middle state
      // over observed cells. A large χ² says the chain remembers more
      // than one step and the first-order transition matrix is a
      // fiction. ALL margins re-aggregate the one pinned trigram
      // table; doubles appear only in the (O−E)²/E display sum over
      // ≤|types|² bounded cells.
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val tri = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("event_type"))
        .withColumn("prev", lag("event_type", 2).over(w))
        .withColumn("cur", lag("event_type", 1).over(w))
        .withColumn("g1", col("us") - lag(col("us"), 1).over(w))
        .withColumn("g2", lag(col("us"), 1).over(w) - lag(col("us"), 2).over(w))
        .where(col("prev").isNotNull && col("g1") <= 1800L * 1000000L &&
          col("g2") <= 1800L * 1000000L)
        .groupBy(col("prev"), col("cur"), col("event_type").as("next"))
        .agg(count(lit(1)).as("o"))
        .localCheckpoint() // three margins + the cell pass read it
      val mPC = tri.groupBy("prev", "cur").agg(sum("o").as("t_pc"))
      val mCN = tri.groupBy("cur", "next").agg(sum("o").as("t_cn"))
      val mC = tri.groupBy("cur").agg(sum("o").as("t_c"))
      tri.join(mPC, Seq("prev", "cur")).join(mCN, Seq("cur", "next"))
        .join(broadcast(mC), Seq("cur"))
        .select(col("cur"), col("o"),
          ((col("t_pc") * col("t_cn")).cast("double") / col("t_c"))
            .as("e"))
        .groupBy("cur")
        .agg(count(lit(1)).as("n_cells"), sum("o").as("n_trigrams"),
          round(sum(pow(col("o") -
            (col("e")), 2) / col("e")), 4).as("chi_sq"))
    }),

    "q289_direct_adjustment" -> ((s, dir) => {
      // Observational effect estimation by direct adjustment (stratified
      // standardization): the naive discounted-vs-not quantity gap vs
      // the stratum-weighted gap within (brand, segment) cells that
      // have BOTH arms — the difference IS the confounding the naive
      // read silently absorbs. One stream scan to exact per-(stratum,
      // arm) LONG sums; everything downstream re-aggregates that
      // bounded cell table. The causal-inference sanity check behind
      // any "discounts increase volume by X" claim.
      val cells = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("segment")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("p_brand"), col("segment"),
          (col("l_discount") > 0).as("treated"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sq"))
        .localCheckpoint() // naive + strata + weights all re-agg it
      val naive = cells.groupBy("treated")
        .agg(sum("n").as("n"), sum("sq").as("sq"))
      val nT = naive.where(col("treated"))
        .select(col("n").as("n_treated"), col("sq").as("sq_t"))
      val nC = naive.where(!col("treated"))
        .select(col("n").as("n_control"), col("sq").as("sq_c"))
      val strata = cells.groupBy("p_brand", "segment")
        .agg(count(lit(1)).as("arms"),
          sum("n").as("n_s"),
          sum(when(col("treated"), col("sq"))).as("sq_ts"),
          sum(when(col("treated"), col("n"))).as("n_ts"),
          sum(when(!col("treated"), col("sq"))).as("sq_cs"),
          sum(when(!col("treated"), col("n"))).as("n_cs"))
        .where(col("arms") === 2)
      val adj = strata
        .select(col("n_s"),
          (col("n_s") * (col("sq_ts").cast("double") / col("n_ts")
            - col("sq_cs").cast("double") / col("n_cs"))).as("wdiff"))
        .agg(count(lit(1)).as("n_strata_used"), sum("n_s").as("w_tot"),
          sum("wdiff").as("wd"))
      adj.crossJoin(broadcast(nT)).crossJoin(broadcast(nC))
        .select(col("n_strata_used"), col("n_treated"), col("n_control"),
          round(col("sq_t").cast("double") / col("n_treated")
            - col("sq_c").cast("double") / col("n_control"), 4)
            .as("naive_effect"),
          round(col("wd") / col("w_tot"), 4).as("adjusted_effect"),
          round((col("sq_t").cast("double") / col("n_treated")
            - col("sq_c").cast("double") / col("n_control"))
            - col("wd") / col("w_tot"), 4).as("confounding_bias"))
    }),

    "q290_mix_independence" -> ((s, dir) => {
      // χ² independence test on the source × language contingency
      // table — the mix-stability check run before treating "source"
      // and "language" as independent axes in a sampling plan. O and
      // both margins are exact LONGs from one corpus scan; E =
      // row·col/N and the per-source χ² contribution divide only at
      // display, over the |sources|×|langs| bounded cell table.
      val o = t(s, dir, "documents")
        .groupBy("source", "lang").agg(count(lit(1)).as("o"))
        .localCheckpoint() // margins + the cell pass read it
      val rowm = o.groupBy("source").agg(sum("o").as("r"))
      val colm = o.groupBy("lang").agg(sum("o").as("c"))
      val tot = broadcast(o.agg(sum("o").as("nn")))
      o.join(rowm, Seq("source")).join(broadcast(colm), Seq("lang"))
        .crossJoin(tot)
        .select(col("source"), col("o"), col("r"),
          ((col("r") * col("c")).cast("double") / col("nn")).as("e"))
        .groupBy(col("source"), col("r").as("n_docs"))
        .agg(count(lit(1)).as("n_langs"),
          round(sum(pow(col("o") - col("e"), 2) / col("e")), 4)
            .as("chi_sq_contrib"))
        .select(col("source"), col("n_docs"), col("n_langs"),
          col("chi_sq_contrib"))
    }),

    "q291_sprt_replay" -> ((s, dir) => {
      // Sequential probability ratio test replay (Wald 1945) on the
      // daily purchase rate: when would a sequential monitor have
      // stopped? The log-likelihood ratio accumulates as an EXACT LONG
      // (per-success/per-failure increments and the ±ln 19 boundaries
      // are ×10⁹-pinned shared constants — the q249 scaled-log trick),
      // so the crossing day is bit-determined, not float-lucky. Day
      // grain once; the cumulative rides a bounded triangular self-join
      // (prevCumByKey posture), zero partition-less windows.
      val d = t(s, dir, "events")
        .select(datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
            .cast("long").as("ed"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("k"))
        .groupBy("ed")
        .agg(count(lit(1)).as("n"), sum("k").as("k"))
        .withColumn("llr_day",
          col("k") * sprtL1 + (col("n") - col("k")) * sprtL2)
        .localCheckpoint() // the triangular cum + the final join share it
      val cum = d.join(prevCumByKey(
          d.select(col("ed"), col("llr_day")), "ed", "llr_day"), Seq("ed"))
        .withColumn("cum_llr", col("prev_cum") + col("llr_day"))
      cum.select(col("ed"), col("n"), col("k"),
        round(col("cum_llr").cast("double") / 1e9, 6).as("llr"),
        when(col("cum_llr") >= sprtBound, lit("accept_h1"))
          .when(col("cum_llr") <= -sprtBound, lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"))
    }),

    "q292_price_index" -> ((s, dir) => {
      // Laspeyres / Paasche / Fisher price indices between the stream's
      // shipdate halves — the index-number layer over q257's epoch
      // split: per-part unit values (exact LONG cents and quantities)
      // for both epochs, index sums over the parts traded in BOTH (the
      // matched basket), Fisher as the geometric mean. The part-grain
      // table is bounded, so the double index sums round safely at
      // display; everything upstream is integer.
      val li = t(s, dir, "lineitem").select(col("l_partkey"),
        round(col("l_extendedprice") * 100).cast("long").as("c"),
        col("l_quantity").cast("long").as("q"),
        datediff(col("l_shipdate"), to_date(lit("1970-01-01")))
          .cast("long").as("ed"))
      val cut = broadcast(li.agg(min("ed").as("lo"), max("ed").as("hi"))
        .select(expr("(lo + hi) div 2").as("cut")))
      val pp = li.crossJoin(cut)
        .groupBy("l_partkey")
        .agg(sum(when(col("ed") <= col("cut"), col("c"))).as("v0"),
          sum(when(col("ed") <= col("cut"), col("q"))).as("q0"),
          sum(when(col("ed") > col("cut"), col("c"))).as("v1"),
          sum(when(col("ed") > col("cut"), col("q"))).as("q1"))
        .where(col("q0") > 0 && col("q1") > 0)
      // p_e = v_e/q_e; Laspeyres = Σ p1·q0 / Σ p0·q0, Paasche with q1
      pp.select(
          (col("v1").cast("double") / col("q1") * col("q0")).as("p1q0"),
          col("v0").cast("double").as("p0q0"), // v0 = p0·q0 exactly
          col("v1").cast("double").as("p1q1"), // v1 = p1·q1 exactly
          (col("v0").cast("double") / col("q0") * col("q1")).as("p0q1"))
        .agg(count(lit(1)).as("n_parts_both"),
          sum("p1q0").as("l_num"), sum("p0q0").as("l_den"),
          sum("p1q1").as("p_num"), sum("p0q1").as("p_den"))
        .select(col("n_parts_both"),
          round(col("l_num") / col("l_den"), 4).as("laspeyres"),
          round(col("p_num") / col("p_den"), 4).as("paasche"),
          round(sqrt((col("l_num") / col("l_den"))
            * (col("p_num") / col("p_den"))), 4).as("fisher"))
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

    "q294_experiment_sizing" -> ((s, dir) => {
      // Prospective A/B sizing from observed data: per event type, the
      // minimum detectable effect on the ENGAGED-user rate (≥ 15
      // events of the type — every user touches every type in this
      // stream, so bare reach saturates at 1.0) at α=0.05 / 80% power
      // if the CURRENT user base were split in two — the "is this
      // experiment even worth running" number. Counts are exact LONGs
      // from one (user, type) aggregate; z constants are shared
      // literals; only the final MDE formula is a double. MDE above
      // the effect you hope for ⇒ the test cannot conclude.
      val users = t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_ev"))
        .localCheckpoint() // reach per type + the user total share it
      val totU = broadcast(users.select(col("user_id")).distinct()
        .agg(count(lit(1)).as("n_users")))
      users.where(col("n_ev") >= 15)
        .groupBy("event_type").agg(count(lit(1)).as("n_reached"))
        .crossJoin(totU)
        .select(col("event_type"), col("n_reached"), col("n_users"),
          round(col("n_reached").cast("double") / col("n_users"), 6)
            .as("reach_rate"),
          // (z_{0.975} + z_{0.8}) · sqrt(2·p(1−p)/(n/2))
          round(lit(1.959964 + 0.841621) *
            sqrt(lit(2.0) * (col("n_reached").cast("double") / col("n_users"))
              * (lit(1.0) - col("n_reached").cast("double") / col("n_users"))
              / (col("n_users").cast("double") / 2)), 6).as("mde_abs"))
    }),

    "q295_dose_response" -> ((s, dir) => {
      // Return-rate dose-response curve over discount points with
      // WILSON score intervals (Brown, Cai & DasGupta 2001 — the
      // interval that stays sane at extreme rates and small cells,
      // unlike the Wald ±z√(p(1−p)/n) taught everywhere): one exact
      // integer aggregate to the 11-point discount grid, the interval
      // formula the only doubles. The pricing question behind q280's
      // slope: WHERE on the discount scale does the response move?
      val g = t(s, dir, "lineitem")
        .groupBy(round(col("l_discount") * 100).cast("long").as("discount_pct"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("k"))
      val z2 = 1.959964 * 1.959964
      val p = col("k").cast("double") / col("n")
      val center = (p + lit(z2) / (col("n") * 2)) /
        (lit(1.0) + lit(z2) / col("n"))
      val half = (lit(1.959964) *
        sqrt(p * (lit(1.0) - p) / col("n")
          + lit(z2) / (col("n").cast("double") * col("n") * 4))) /
        (lit(1.0) + lit(z2) / col("n"))
      g.select(col("discount_pct"), col("n"), col("k"),
        round(p, 6).as("return_rate"),
        round(center - half, 6).as("wilson_lo"),
        round(center + half, 6).as("wilson_hi"))
    }),

    "q296_split_half" -> ((s, dir) => {
      // Split-half reliability of the per-source quality ranking:
      // Spearman ρ between the per-source mean q133 scores computed on
      // two md5-parity doc halves (doc_id mod anything small IS the
      // source in this fixture — the md5 draw is the engine-neutral
      // randomizer the suite already uses for sampling) — if the
      // ranking does not replicate against ITSELF, no threshold
      // derived from it deserves trust. Score sums are ×10⁴-pinned
      // LONGs per half; ranks come from two bounded |sources|-row
      // sorts; ρ = 1 − 6Σd²/(n(n²−1)) is exact integers until the
      // display division.
      val posSources = (0 to 4).map(i => s"src$i")
      val docs = t(s, dir, "documents")
      val scored = graft.operators.TextAnalysis.hashNbClassifier(
        docs, col("doc_id"), col("text"), col("source").isin(posSources: _*))
      val halves = scored
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"),
          (conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
            .cast("long") % 2 === 0).as("even"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("quality_w") * 10000).cast("long")).as("w4"))
        .localCheckpoint() // both half rankings read it
      def ranked(even: Boolean, out: String): DataFrame = {
        val h = halves.where(col("even") === even)
          .select(col("source"),
            expr("(w4 * 1000000) div n").as("mean_e4"))
        val rk = h.as("a").join(h.select(col("source").as("_bs"),
            col("mean_e4").as("_bm")).as("b"),
            col("_bm") > col("mean_e4") ||
            (col("_bm") === col("mean_e4") && col("_bs") < col("source")),
            "left")
          .groupBy(col("source")).agg((count(col("_bs")) + 1L).as(out))
        rk
      }
      val joined = ranked(even = true, "rank_even")
        .join(ranked(even = false, "rank_odd"), Seq("source"))
      val d2 = joined
        .agg(count(lit(1)).as("n_sources"),
          sum((col("rank_even") - col("rank_odd")) *
            (col("rank_even") - col("rank_odd"))).as("sum_d2"))
      joined.select(col("source"), col("rank_even"), col("rank_odd"))
        .crossJoin(broadcast(d2))
        .select(col("source"), col("rank_even"), col("rank_odd"),
          col("n_sources"), col("sum_d2"),
          round(lit(1.0) - col("sum_d2") * 6.0 /
            (col("n_sources") * (col("n_sources") * col("n_sources") - 1)), 6)
            .as("spearman_rho"))
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

    "q299_forecast_revenue" -> ((s, dir) => {
      // TPC-H Q6-shaped forecast-revenue delta: the revenue increase
      // from ELIMINATING discounts in a band (qty < 24, discount
      // 0.05–0.07, a one-year shipdate window anchored at the data's
      // max) = Σ extendedprice·discount over the filtered lines — one
      // scan whose predicates all reach the parquet reader, exact
      // cents via per-line rounding.
      val li = t(s, dir, "lineitem")
        .select(col("l_shipdate"), col("l_quantity"), col("l_discount"),
          round(col("l_extendedprice") * col("l_discount") * 100)
            .cast("long").as("dc"),
          datediff(col("l_shipdate"), to_date(lit("1970-01-01")))
            .cast("long").as("ed"))
      val mx = broadcast(li.agg(max("ed").as("mx")))
      li.crossJoin(mx)
        .where(col("ed") > col("mx") - 365 &&
          col("l_quantity") < 24 &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07)
        .agg(count(lit(1)).as("n_lines"),
          round(sum("dc").cast("double") / 100.0, 2).as("forecast_delta"))
    }),

    "q92_heavy_hitters_grouped" -> ((s, dir) => {
      // per-language frequent tokens: the MG-summary Aggregator riding an
      // ordinary groupBy (map-side partial merge), exact pass on the
      // broadcast candidate union
      val toks = t(s, dir, "documents")
        .select(col("lang"),
          explode(split(lower(TextExprs.cleanText(col("text"))), " ")).as("item"))
        .where(col("item") =!= "")
      graft.operators.HeavyHitters.topFrequentByGroup(
          toks, col("lang"), col("item"), k = 40)
        .withColumnRenamed("grp", "lang")
    }),

    "q91_scalable_percentile" -> ((s, dir) => {
      // the 100 TB path for q37's exact percentiles: rank-based dataflow
      // (operators.Percentiles) instead of Spark's percentile aggregate,
      // whose buffer holds an entire group's values on one task
      graft.operators.Percentiles.exactByGroup(t(s, dir, "orders"),
          col("o_orderpriority"), col("o_totalprice"),
          Seq(0.25, 0.5, 0.75, 0.99), Seq("p25", "p50", "p75", "p99"))
        .select(col("group").as("o_orderpriority"),
          round(col("p25"), 4).as("p25"), round(col("p50"), 4).as("p50"),
          round(col("p75"), 4).as("p75"), round(col("p99"), 4).as("p99"))
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

    "q89_perplexity" -> ((s, dir) => {
      // perplexity-style quality filter (CCNet-ish, self-trained): score
      // each doc by its cross-entropy under the corpus unigram model.
      // Two-pass dataflow: token counts (vocab-sized), then score by
      // joining the model back onto the token stream. The model join is
      // deliberately NOT hinted: a web-scale corpus vocabulary (1e8+
      // types) exceeds any broadcast threshold, and a shuffled hash join
      // on `tok` is well-spread; AQE still converts it to broadcast at
      // runtime when the model measures small. Only the one-row corpus
      // total rides a broadcast cross join (BM25's N/avgdl pattern).
      val toks = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(lower(TextExprs.cleanText(col("text"))), " ")).as("tok"))
        .where(col("tok") =!= "")
      val model = toks.groupBy("tok").agg(count(lit(1)).as("c"))
      val total = model.agg(sum("c").as("n"))
      toks.join(model, "tok")
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          round(avg(-log(col("c") / col("n"))), 4).as("xent"),
          round(exp(avg(-log(col("c") / col("n")))), 4).as("ppl"))
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
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_brand"), col("p_name"))
      val pairs = p.as("a").join(p.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          substring(col("a.p_name"), 1, 3) === substring(col("b.p_name"), 1, 3) &&
          col("a.p_partkey") < col("b.p_partkey"))
      pairs.select(col("a.p_partkey").as("key_a"), col("b.p_partkey").as("key_b"),
          round(graft.plans.JaroWinkler.jaroWinkler(col("a.p_name"), col("b.p_name")), 4)
            .as("jw"))
        .where(col("jw") >= 0.88 && col("jw") < 1.0)
    }),

    "q87_lateral" -> ((s, dir) => {
      // correlated LATERAL (ORDER BY + LIMIT inside): top-2 orders per
      // selected customer; the oracle runs the identical string
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql(lateralSql)
    }),

    "q85_heavy_hitters" -> ((s, dir) => {
      // exact frequent items via the two-pass Misra-Gries dataflow
      // (operators.HeavyHitters): a bounded mergeable summary finds the
      // candidate superset without shuffling the long tail; pass 2 exact-
      // counts only the candidates. Deterministic -> oracle = naive HAVING.
      val toks = t(s, dir, "documents")
        .select(explode(split(lower(TextExprs.cleanText(col("text"))), " ")).as("item"))
        .where(col("item") =!= "")
      graft.operators.HeavyHitters.topFrequent(toks, col("item"), k = 50)
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
  )

  /** DuckDB twin of TextAnalysis.hashNbClassifier over documents with the
    * q133 seed (sources src0–src4) — (doc_id, n_toks, quality_w, keep);
    * shared by q133 (raw scores) and q145 (calibration deciles). */
  private lazy val nbQualitySql: String =
    s"""WITH tok0 AS (SELECT doc_id, source,
       |   unnest(string_split(lower(${cleanSql("text")}), ' ')) AS tok FROM documents),
       |tk AS (SELECT doc_id,
       |   CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 1 ELSE 0 END AS y,
       |   substring(md5(tok), 1, 3) AS b
       |  FROM tok0 WHERE tok <> ''),
       |c AS (SELECT b, CAST(sum(y) AS BIGINT) AS cpos,
       |   CAST(sum(1 - y) AS BIGINT) AS cneg FROM tk GROUP BY b),
       |tt AS (SELECT CAST(sum(cpos) AS BIGINT) AS tpos,
       |   CAST(sum(cneg) AS BIGINT) AS tneg, CAST(count(*) AS BIGINT) AS nb FROM c),
       |m AS (SELECT b, ln((cpos + 1.0) / (tpos + nb)) - ln((cneg + 1.0) / (tneg + nb)) AS w
       |  FROM c, tt)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
       | round(avg(w), 4) + 0.0 AS quality_w,
       | (round(avg(w), 4) + 0.0) > 0.0 AS keep
       |FROM tk JOIN m USING (b) GROUP BY doc_id""".stripMargin

  /** DuckDB twin of TextExprs.withLangId over documents — (doc_id, lang,
    * lang_pred); shared by q24 (raw predictions) and q144 (confusion
    * matrix). Generated from the SAME Lexicons stopword constants as the
    * Spark expressions. */
  private lazy val langPredSql: String = {
    val en = hitSql("text", Lexicons.wordAlternation(Lexicons.StopwordsEn))
    val es = hitSql("text", Lexicons.wordAlternation(Lexicons.StopwordsEs))
    val de = hitSql("text", Lexicons.wordAlternation(Lexicons.StopwordsDe))
    val fr = hitSql("text", Lexicons.wordAlternation(Lexicons.StopwordsFr))
    val cjk = hitSql("text", "[\\x{4e00}-\\x{9fff}]")
    s"""WITH h AS (SELECT doc_id, lang, $en AS s_en, $es AS s_es, $de AS s_de, $fr AS s_fr,
       |  $cjk AS s_cjk, greatest($en, $es, $de, $fr) AS s_best FROM documents)
       |SELECT doc_id, lang,
       | CASE WHEN s_cjk > 0 THEN 'zh' WHEN s_best = 0 THEN 'und'
       |  WHEN s_en = s_best THEN 'en' WHEN s_es = s_best THEN 'es'
       |  WHEN s_de = s_best THEN 'de' ELSE 'fr' END AS lang_pred
       |FROM h""".stripMargin
  }

  /** Augmented-Gram PCA CTEs (q131/q140): one 65×65 second-moment pass,
    * then 3 power iterations mirrored CTE-for-loop against Pca
    * .topComponent's driver-side math (v0 = 1/sqrt(64) = 0.125 exactly;
    * λ = final ‖C·v‖). Leaves `v3(i, v)` (the unit component, 0-based
    * dim index) and `n3(l)` (λ) in scope. */
  private def pcaCtes: String = {
    val gram =
      """WITH aug AS (SELECT list_concat(embedding::DOUBLE[], [CAST(1.0 AS DOUBLE)]) AS xa
        |  FROM embeddings),
        |pe AS (SELECT unnest(flatten(list_transform(xa, x -> list_transform(xa, y -> x * y)))) AS p,
        |              unnest(range(1, 4226)) AS idx FROM aug),
        |g AS (SELECT CAST((idx - 1) // 65 AS BIGINT) AS i, CAST((idx - 1) % 65 AS BIGINT) AS j,
        |             sum(p) AS g FROM pe GROUP BY 1, 2),
        |nn AS (SELECT g AS n FROM g WHERE i = 64 AND j = 64),
        |mu AS (SELECT i, g / n AS mu FROM g, nn WHERE j = 64 AND i < 64),
        |c AS (SELECT g.i, g.j, g.g / nn.n - ma.mu * mb.mu AS c
        |      FROM g, nn, mu ma, mu mb
        |      WHERE g.i < 64 AND g.j < 64 AND ma.i = g.i AND mb.i = g.j),
        |v0 AS (SELECT i, CAST(0.125 AS DOUBLE) AS v FROM mu)""".stripMargin
    val iters = (1 to 3).map { k =>
      s""",
         |w$k AS (SELECT c.i, sum(c.c * v.v) AS w FROM c JOIN v${k - 1} v ON v.i = c.j GROUP BY c.i),
         |n$k AS (SELECT sqrt(sum(w * w)) AS l FROM w$k),
         |v$k AS (SELECT i, w / l AS v FROM w$k, n$k)""".stripMargin
    }.mkString
    gram + iters
  }

  /** Unrolled PageRank iteration CTEs (q130/q134): expects CTEs `ed(u,v,w)`
    * and `ow(u, outw)` plus `p0(tok, pr)` in scope; emits p1..p`iters`.
    * Damping constants written as (1.0 - 0.85)/0.85 so BOTH engines derive
    * them by the same IEEE subtraction (PageRank.ranks uses
    * lit(1.0 - damping)). */
  private def prIterCtes(iters: Int): String = (1 to iters).map { k =>
    s""",
       |p$k AS (SELECT o.u AS tok, (1.0 - 0.85) + 0.85 * coalesce(s.acc, 0.0) AS pr
       |  FROM ow o LEFT JOIN (
       |    SELECT e.v AS tok2, sum(e.w / o2.outw * p.pr) AS acc
       |    FROM ed e JOIN ow o2 ON e.u = o2.u JOIN p${k - 1} p ON e.u = p.tok
       |    GROUP BY e.v) s ON s.tok2 = o.u)""".stripMargin
  }.mkString

  /** q132: phrase queries — shared by the Spark operator call and the
    * generated DuckDB oracle. Mixed 2- and 3-token phrases; a phrase with
    * zero corpus occurrences simply contributes no rows (both sides). */
  private val phraseQueries: Seq[String] =
    Seq("hash join", "table scan", "merge sort", "fast key order")

  /** q87: correlated LATERAL subquery with ORDER BY + LIMIT — top-2 orders
    * per high-balance customer. The identical string runs on both engines
    * (Spark decorrelates the lateral limit into a partitioned rank). */
  private val lateralSql: String =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      | LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |          WHERE o_custkey = c.c_custkey
      |          ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) t
      |WHERE c.c_acctbal > 9000""".stripMargin

  /** q75: the exact string runs on BOTH engines (Spark via spark.sql, the
    * oracle via DuckDB) — ANSI subquery semantics parity by construction. */
  private val subquerySql: String =
    """SELECT o.o_orderkey, o.o_totalprice, o.o_orderpriority
      |FROM orders o
      |WHERE o.o_totalprice > 1.8 * (SELECT avg(o2.o_totalprice) FROM orders o2
      |                              WHERE o2.o_orderpriority = o.o_orderpriority)
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.09)""".stripMargin

  /** Column specs for the q55 profiler — shared by the Spark side and the
    * generated DuckDB twin (Profiler.oracleSql). */
  private val ordersProfile: Seq[(String, Profiler.Kind)] = Seq(
    "o_orderkey" -> Profiler.Num, "o_custkey" -> Profiler.Num,
    "o_totalprice" -> Profiler.Num, "o_orderdate" -> Profiler.Ts,
    "o_orderstatus" -> Profiler.Str, "o_orderpriority" -> Profiler.Str)

  def oracleSql: Map[String, String] = {
    val low = "low"; val cln = "cln"
    val classifiedCte =
      s"""WITH c1 AS (SELECT *, ${cleanSql("text")} AS $cln FROM documents),
         |c2 AS (SELECT *, lower($cln) AS $low FROM c1)""".stripMargin

    // q115's full twin, factored out so q119 (recall@k) can embed the
    // IDENTICAL approximate result as a derived table
    val q115Oracle: String = {
      def asg(m: Int): String = "(" + graft.operators.KMeansOp.oracleSql(
        "embeddings", "vec_id",
        s"list_slice(embedding, ${m * 16 + 1}, ${m * 16 + 16})",
        k = 4, iters = 2, dim = 16) + s"\n) a$m"
      def cb(m: Int): String = "(" + graft.operators.KMeansOp.oracleCentroidsSql(
        "embeddings", "vec_id",
        s"list_slice(embedding, ${m * 16 + 1}, ${m * 16 + 16})",
        k = 4, iters = 2, dim = 16) + s"\n) cb$m"
      val asgFull = "(" + graft.operators.KMeansOp.oracleSql(
        "embeddings", "vec_id", "embedding", k = 4, iters = 2, dim = 64) + "\n) ac"
      val cbFull = "(" + graft.operators.KMeansOp.oracleCentroidsSql(
        "embeddings", "vec_id", "embedding", k = 4, iters = 2, dim = 64) + "\n) cc"
      val cd = "round(list_inner_product(cc.c, cc.c) - 2 * list_inner_product(q.qv, cc.c), 6)"
      val lut = (0 until 4).map { m =>
        s"""(list_inner_product(cb$m.c, cb$m.c)
           |  - 2 * list_inner_product(list_slice(p.qv, ${m * 16 + 1}, ${m * 16 + 16}), cb$m.c))""".stripMargin
      }.mkString(" + ")
      s"""WITH q AS (SELECT vec_id AS query_id,
         |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
         |  FROM embeddings WHERE vec_id < 8),
         |probed AS (SELECT query_id, qv, cell FROM (
         |  SELECT q.query_id, q.qv, cc.cid AS cell,
         |   row_number() OVER (PARTITION BY q.query_id
         |     ORDER BY $cd ASC, cc.cid ASC) AS crnk
         |  FROM q CROSS JOIN $cbFull) WHERE crnk <= 2)
         |SELECT query_id, corpus_id, adc,
         | CAST(row_number() OVER (PARTITION BY query_id
         |   ORDER BY adc ASC, corpus_id ASC) AS BIGINT) AS rnk
         |FROM (
         |  SELECT p.query_id, ac.vec_id AS corpus_id,
         |   round(list_inner_product(p.qv, p.qv) + $lut, 6) AS adc
         |  FROM probed p
         |   JOIN $asgFull ON ac.cluster = p.cell
         |   JOIN ${asg(0)} ON a0.vec_id = ac.vec_id
         |   JOIN ${asg(1)} ON a1.vec_id = ac.vec_id
         |   JOIN ${asg(2)} ON a2.vec_id = ac.vec_id
         |   JOIN ${asg(3)} ON a3.vec_id = ac.vec_id
         |   JOIN ${cb(0)} ON cb0.cid = a0.cluster
         |   JOIN ${cb(1)} ON cb1.cid = a1.cluster
         |   JOIN ${cb(2)} ON cb2.cid = a2.cluster
         |   JOIN ${cb(3)} ON cb3.cid = a3.cluster)
         |QUALIFY rnk <= 5""".stripMargin
    }

    ListMap(
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

      "q20_clean_filler" ->
        s"""SELECT doc_id, ${cleanSql("text")} AS clean_text,
           | ${isFillerSql("text")} AS is_filler
           |FROM documents""".stripMargin,

      "q21_classify_demo" ->
        s"""$classifiedCte
           |SELECT doc_id,
           | ${sentimentSql(isFillerSql(cln), low)} AS sentiment,
           | ${categorySql(isFillerSql(cln), low)} AS category
           |FROM c2""".stripMargin,

      "q22_summary_pivot" ->
        s"""$classifiedCte,
           |cls AS (SELECT source, lang,
           |  ${sentimentSql(isFillerSql(cln), low)} AS sentiment FROM c2)
           |SELECT source AS "Product", lang AS "Question",
           | count(*) FILTER (WHERE sentiment = 'Positive') AS "Positive",
           | count(*) FILTER (WHERE sentiment = 'Neutral') AS "Neutral",
           | count(*) FILTER (WHERE sentiment = 'Negative') AS "Negative",
           | count(*) FILTER (WHERE sentiment = 'Mixed') AS "Mixed"
           |FROM cls GROUP BY source, lang""".stripMargin,

      "q23_explode_tokens" ->
        s"""SELECT token, count(*) AS n FROM (
           |  SELECT unnest(string_split(${cleanSql("text")}, ' ')) AS token FROM documents)
           |WHERE token <> '' GROUP BY token""".stripMargin,

      "q33_survey_wide" ->
        s"""$classifiedCte
           |SELECT CAST(doc_id AS VARCHAR) AS "ResponseID",
           | trim(unnest(string_split(source || ',' || lang, ','))) AS "Product",
           | $cln AS "Q_Feedback_Answer",
           | ${sentimentSql(isFillerSql(cln), low)} AS "Q_Feedback_Sentiment",
           | ${categorySql(isFillerSql(cln), low)} AS "Q_Feedback_Category"
           |FROM c2""".stripMargin,

      "q24_lang_id" -> langPredSql,

      "q144_lang_confusion" ->
        s"""WITH p AS (
           |$langPredSql
           |),
           |c AS (SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2),
           |t AS (SELECT lang, CAST(sum(n) AS BIGINT) AS t FROM c GROUP BY 1)
           |SELECT c.lang, c.lang_pred, c.n,
           | round(CAST(c.n AS DOUBLE) / t.t, 6) AS share,
           | (c.lang = c.lang_pred) AS correct
           |FROM c JOIN t USING (lang)""".stripMargin,

      "q25_text_profile" -> {
        val nTok = s"CASE WHEN $cln = '' THEN 0 ELSE len(string_split($cln, ' ')) END"
        val nPunct = hitSql("text", "[\\.,;:!\\?]")
        val nStop = hitSql("text", Lexicons.wordAlternation(Lexicons.StopwordsEn))
        // quality mirrors TextAnalysis.qualityScore: mean of clamped
        // length/token/punctuation components
        val quality = "round((least(nc / 200.0, 1.0) + least(nt / 50.0, 1.0) + " +
          "greatest(0.0, 1.0 - (CASE WHEN nc = 0 THEN 0.0 ELSE CAST(np AS DOUBLE) / nc END) * 5.0)) / 3.0, 4)"
        s"""WITH c1 AS (SELECT *, ${cleanSql("text")} AS $cln FROM documents),
           |f AS (SELECT doc_id, text, length($cln) AS nc, $nTok AS nt,
           |  $nPunct AS np, $nStop AS ns FROM c1)
           |SELECT doc_id, CAST(nc AS INT) AS n_chars, CAST(nt AS INT) AS n_tokens_ws,
           | CAST(len(regexp_extract_all(coalesce(text, ''), '${TextExprs.BpeTokenRegex}')) AS INT) AS n_tokens_bpe,
           | round(CASE WHEN nt = 0 THEN 0.0 ELSE CAST(nc AS DOUBLE) / nt END, 4) AS avg_token_len,
           | round(CASE WHEN nc = 0 THEN 0.0 ELSE CAST(np AS DOUBLE) / nc END, 4) AS punct_ratio,
           | round(CASE WHEN nt = 0 THEN 0.0 ELSE CAST(ns AS DOUBLE) / nt END, 4) AS stopword_ratio,
           | $quality AS quality
           |FROM f""".stripMargin
      },

      "q26_dedup_exact" ->
        s"""SELECT md5(${cleanSql("text")}) AS content_hash, min(doc_id) AS keep_id,
           | count(*) AS n_copies
           |FROM documents GROUP BY 1""".stripMargin,

      // all-pairs exact twin of the banded-LSH engine path — recall caveat
      // documented at q159's oracle entry (≈2e-5 per at-threshold pair)
      "q27_minhash_neardup" ->
        s"""$shingleCte,
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    ${jaccardSql("a.s", "b.s")} AS j
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
           |SELECT id_a, id_b, round(j, 6) AS jaccard FROM pairs WHERE j >= 0.7""".stripMargin,

      // Brute-force twin of the md5-feature SimHash: recompute the 64
      // signature bits relationally (per-doc votes over the distinct
      // shingles' md5 bits), then all-pairs Hamming — 500 docs at sf0.01,
      // so the quadratic scan is the oracle's price, not the engine's.
      "q28_simhash_neardup" ->
        s"""$shingleCte,
           |hs AS (SELECT doc_id, list_transform(s, x -> substr(md5(x), 1, 16)) AS hs FROM sh),
           |hb AS (SELECT doc_id, unnest(hs) AS h FROM hs),
           |votes AS (SELECT doc_id, b,
           |    sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, CAST(b // 4 AS INT) + 1, 1)) - 1)
           |          >> CAST(3 - b % 4 AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
           |  FROM hb CROSS JOIN range(0, 64) t(b) GROUP BY doc_id, b),
           |sigs AS (SELECT doc_id, list(CASE WHEN v > 0 THEN 1 ELSE 0 END ORDER BY b) AS bits
           |  FROM votes GROUP BY doc_id),
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    CAST(list_sum(list_transform(range(1, 65),
           |      i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
           |  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id)
           |SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 7""".stripMargin,

      "q29_ngram_jaccard" ->
        s"""$shingleCte,
           |blk AS (SELECT doc_id, s, list_min(s) AS b FROM sh),
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    ${jaccardSql("a.s", "b.s")} AS j
           |  FROM blk a JOIN blk b ON a.b = b.b AND a.doc_id < b.doc_id)
           |SELECT DISTINCT id_a, id_b, round(j, 6) AS jaccard FROM pairs WHERE j >= 0.5""".stripMargin,

      "q31_ivf_topk" ->
        """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v
          |  FROM e ORDER BY vec_id LIMIT 16),
          |dots AS (SELECT e.vec_id, e.v, c.cid,
          |    list_sum(list_transform(range(1,65), i -> e.v[i] * c.v[i])) AS dot
          |  FROM e CROSS JOIN cent c),
          |assign AS (SELECT vec_id, v, cid FROM (
          |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid DESC) AS rn
          |    FROM dots) WHERE rn = 1),
          |qprobe AS (SELECT vec_id AS query_id, v AS qv, cid FROM (
          |    SELECT d.*, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid DESC) AS rn
          |    FROM dots d WHERE d.vec_id < 8) WHERE rn <= 4),
          |scored AS (SELECT q.query_id, a.vec_id AS corpus_id,
          |    list_sum(list_transform(range(1,65), i -> q.qv[i] * a.v[i])) /
          |    (sqrt(list_sum(list_transform(range(1,65), i -> q.qv[i] * q.qv[i]))) *
          |     sqrt(list_sum(list_transform(range(1,65), i -> a.v[i] * a.v[i])))) AS cos
          |  FROM qprobe q JOIN assign a ON a.cid = q.cid)
          |SELECT query_id, corpus_id, round(cos, 6) AS cos,
          | row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, corpus_id ASC) AS rnk
          |FROM scored QUALIFY rnk <= 5""".stripMargin,

      "q30_cosine_topk" ->
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

      "q34_embed_neardup" -> {
        // bucket assignment replicated with the SAME plane constants the
        // Spark side uses (VectorExprs.deterministicPlanes) — generated, so
        // the two engines cannot drift
        val planes = graft.functions.VectorExprs.deterministicPlanes(8, 64)
        def planeDot(v: String, p: Seq[Double]): String =
          s"list_sum(list_transform(range(1,65), j -> $v[j] * list_extract(${p.mkString("[", ", ", "]")}, j)))"
        val bucket = planes.zipWithIndex.map { case (p, i) =>
          s"(CASE WHEN ${planeDot("v", p)} >= 0 THEN ${1 << i} ELSE 0 END)"
        }.mkString("\n   + ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |b AS (SELECT vec_id, v, $bucket AS bucket FROM e),
           |p AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b,
           |   list_sum(list_transform(range(1,65), i -> x.v[i] * y.v[i])) /
           |   (sqrt(list_sum(list_transform(range(1,65), i -> x.v[i] * x.v[i]))) *
           |    sqrt(list_sum(list_transform(range(1,65), i -> y.v[i] * y.v[i])))) AS cos
           |  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
           |SELECT id_a, id_b, round(cos, 6) AS cos FROM p WHERE cos >= 0.35""".stripMargin
      },

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

      "q36_grouping_sets" ->
        """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
          |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,

      "q37_percentile" ->
        """SELECT o_orderpriority,
          | round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
          | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
          | round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
          | round(quantile_cont(o_totalprice, 0.99), 4) AS p99
          |FROM orders GROUP BY o_orderpriority""".stripMargin,

      // Verdict-row oracle: DuckDB runs ITS OWN sketches (HLL,
      // approx_quantile's t-digest) against its own exact answers and
      // reports the same within-5% booleans — sketch values themselves are
      // engine-specific and never compared.
      "q39_sketches" ->
        """SELECT event_type,
          | CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
          | abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
          |   <= count(DISTINCT user_id) * 0.15 AS users_within_15pct,
          | abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
          |   <= abs(quantile_cont(value, 0.5)) * 0.05 AS p50_within_5pct,
          | count(*) AS n
          |FROM events GROUP BY event_type""".stripMargin,

      "q38_summary_unpivot" -> {
        val cln1 = cleanSql("text"); val cln2 = cleanSql("substring(text, 1, 80)")
        s"""WITH c1 AS (SELECT source, lang, $cln1 AS cln1, $cln2 AS cln2 FROM documents),
           |c2 AS (SELECT *, lower(cln1) AS low1, lower(cln2) AS low2 FROM c1),
           |w AS (
           |  SELECT trim(unnest(string_split(source || ',' || lang, ','))) AS "Product",
           |   'Q_Feedback' AS "Question",
           |   ${sentimentSql(isFillerSql("cln1"), "low1")} AS sent
           |  FROM c2
           |  UNION ALL
           |  SELECT trim(unnest(string_split(source || ',' || lang, ','))) AS "Product",
           |   'Q_Short' AS "Question",
           |   ${sentimentSql(isFillerSql("cln2"), "low2")} AS sent
           |  FROM c2)
           |SELECT "Product", "Question",
           | count(*) FILTER (WHERE sent = 'Positive') AS "Positive",
           | count(*) FILTER (WHERE sent = 'Neutral') AS "Neutral",
           | count(*) FILTER (WHERE sent = 'Negative') AS "Negative",
           | count(*) FILTER (WHERE sent = 'Mixed') AS "Mixed"
           |FROM w GROUP BY 1, 2""".stripMargin
      },

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

      "q44_curate" -> {
        val en = hitSql("cln", Lexicons.wordAlternation(Lexicons.StopwordsEn))
        val es = hitSql("cln", Lexicons.wordAlternation(Lexicons.StopwordsEs))
        val de = hitSql("cln", Lexicons.wordAlternation(Lexicons.StopwordsDe))
        val fr = hitSql("cln", Lexicons.wordAlternation(Lexicons.StopwordsFr))
        val cjk = hitSql("cln", "[\\x{4e00}-\\x{9fff}]")
        s"""WITH c1 AS (SELECT doc_id, ${cleanSql("text")} AS cln FROM documents),
           |h AS (SELECT doc_id, cln,
           |   $en AS s_en, $es AS s_es, $de AS s_de, $fr AS s_fr, $cjk AS s_cjk,
           |   greatest($en, $es, $de, $fr) AS s_best,
           |   length(cln) AS nc,
           |   CASE WHEN cln = '' THEN 0 ELSE len(string_split(cln, ' ')) END AS nt,
           |   ${hitSql("cln", "[\\.,;:!\\?]")} AS np
           |  FROM c1),
           |p AS (SELECT doc_id, cln,
           |   CASE WHEN s_cjk > 0 THEN 'zh' WHEN s_best = 0 THEN 'und'
           |    WHEN s_en = s_best THEN 'en' WHEN s_es = s_best THEN 'es'
           |    WHEN s_de = s_best THEN 'de' ELSE 'fr' END AS lang_pred,
           |   round((least(nc / 200.0, 1.0) + least(nt / 50.0, 1.0) +
           |     greatest(0.0, 1.0 - (CASE WHEN nc = 0 THEN 0.0
           |       ELSE CAST(np AS DOUBLE) / nc END) * 5.0)) / 3.0, 4) AS quality
           |  FROM h),
           |f AS (SELECT * FROM p WHERE lang_pred IN ('en') AND quality >= 0.5),
           |ex AS (SELECT min(doc_id) AS doc_id FROM f GROUP BY md5(cln)),
           |s1 AS (SELECT f.* FROM f JOIN ex USING (doc_id)),
           |toks AS (SELECT doc_id, string_split(cln, ' ') AS t FROM s1),
           |shc AS (SELECT doc_id,
           |    list_distinct(list_transform(range(1, len(t) - 1),
           |      i -> array_to_string(t[i:i+2], ' '))) AS s
           |  FROM toks WHERE len(t) >= 3),
           |losers AS (SELECT DISTINCT b.doc_id
           |  FROM shc a JOIN shc b ON a.doc_id < b.doc_id
           |  WHERE ${jaccardSql("a.s", "b.s")} >= 0.7)
           |SELECT doc_id, cln AS clean_text, lang_pred, round(quality, 4) AS quality
           |FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin
      },

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

      "q41_frame_sample" ->
        """WITH f AS (SELECT doc_id,
          |    CAST(1 + octet_length(encode(text)) % 120 AS INT) AS n_frames
          |  FROM documents WHERE doc_id % 3 = 2)
          |SELECT doc_id, n_frames, CAST(unnest(range(0, n_frames, 30)) AS INT) AS frame_idx
          |FROM f""".stripMargin,

      "q32_media_meta" ->
        """SELECT doc_id,
          | CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
          | octet_length(encode(text)) AS n_bytes,
          | CAST(64 + octet_length(encode(text)) % 576 AS INT) AS width,
          | CAST(64 + (octet_length(encode(text)) * 31) % 576 AS INT) AS height,
          | CAST(1 + octet_length(encode(text)) % 120 AS INT) AS n_frames
          |FROM documents""".stripMargin,

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

      "q50_stats_agg" ->
        """SELECT l_returnflag, count(*) AS n,
          | round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
          | round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
          | round(covar_pop(l_quantity, l_extendedprice), 2) AS covar_pop_qp,
          | round(stddev_samp(l_extendedprice), 2) AS sd_price,
          | round(var_samp(l_quantity), 4) AS var_qty,
          | round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
          | round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
          | round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
          |FROM lineitem GROUP BY l_returnflag""".stripMargin,

      "q51_tfidf" ->
        s"""WITH tok AS (SELECT doc_id,
           |   unnest(string_split(lower(${cleanSql("text")}), ' ')) AS token FROM documents),
           |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
           |  WHERE token <> '' GROUP BY doc_id, token),
           |n AS (SELECT count(*) AS n FROM documents),
           |dfq AS (SELECT token, count(*) AS dfreq FROM tf GROUP BY token),
           |sc AS (SELECT tf.doc_id, tf.token,
           |   round(tf.tf * ln((n.n + 1.0) / (dfq.dfreq + 1.0)), 4) AS score
           |  FROM tf JOIN dfq USING (token) CROSS JOIN n)
           |SELECT doc_id, token, score,
           | row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rnk
           |FROM sc QUALIFY rnk <= 3""".stripMargin,

      "q52_bm25" ->
        s"""WITH tok AS (SELECT doc_id,
           |   unnest(string_split(lower(${cleanSql("text")}), ' ')) AS token FROM documents),
           |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
           |  WHERE token <> '' GROUP BY doc_id, token),
           |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
           |st AS (SELECT count(*) AS nd, avg(dl) AS avgdl FROM dl),
           |sc AS (SELECT tf.doc_id,
           |   ln(1.0 + (st.nd - dfq.dfreq + 0.5) / (dfq.dfreq + 0.5))
           |     * tf.tf * (1.2 + 1.0)
           |     / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS s
           |  FROM tf
           |  JOIN (SELECT token, count(*) AS dfreq FROM tf GROUP BY token) dfq USING (token)
           |  JOIN dl USING (doc_id) CROSS JOIN st
           |  WHERE tf.token IN ('spark', 'vector', 'stream'))
           |SELECT doc_id, round(sum(s), 4) AS score FROM sc GROUP BY doc_id""".stripMargin,

      "q53_dedup_clusters" -> {
        s"""WITH RECURSIVE ${shingleCte.stripPrefix("WITH ")},
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE ${jaccardSql("a.s", "b.s")} >= 0.7),
           |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs
           |  UNION SELECT id_a, id_a FROM pairs
           |  UNION SELECT id_b, id_b FROM pairs),
           |reach AS (SELECT src, dst FROM e
           |  UNION SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
           |comp AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src)
           |SELECT c.doc_id, c.cluster_id, s.cluster_size
           |FROM comp c JOIN (SELECT cluster_id, count(*) AS cluster_size
           |  FROM comp GROUP BY cluster_id) s USING (cluster_id)""".stripMargin
      },

      "q54_histogram" ->
        """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
          | count(*) AS n, round(sum(o_totalprice), 2) AS sum_price,
          | round(min(o_totalprice), 2) AS min_price,
          | round(max(o_totalprice), 2) AS max_price
          |FROM orders GROUP BY 1""".stripMargin,

      "q55_col_profile" -> Profiler.oracleSql("orders", ordersProfile),

      "q56_stratified_sample" ->
        """SELECT o_orderpriority, o_orderkey,
          | row_number() OVER (PARTITION BY o_orderpriority
          |   ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
          |FROM orders QUALIFY rn <= 20""".stripMargin,

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

      "q65_token_entropy" ->
        s"""WITH tok AS (SELECT source,
           |   unnest(string_split(lower(${cleanSql("text")}), ' ')) AS token FROM documents),
           |tc AS (SELECT source, token, count(*) AS c FROM tok
           |  WHERE token <> '' GROUP BY 1, 2)
           |SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens, count(*) AS vocab,
           | round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy,
           | round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS ttr
           |FROM tc GROUP BY source""".stripMargin,

      "q66_regexp" ->
        """SELECT doc_id,
          | regexp_extract(text, '\b(s[a-z]+)\b', 1) AS first_s_word,
          | CAST(len(regexp_extract_all(text, '\b(scan|sort|stream)\b', 1)) AS BIGINT)
          |   AS n_scan_like,
          | regexp_replace(substring(text, 1, 40), '[aeiou]', '*', 'g') AS masked_head
          |FROM documents""".stripMargin,

      "q67_winnow" ->
        s"""WITH c AS (SELECT doc_id,
           |   string_split(lower(${cleanSql("text")}), ' ') AS toks FROM documents),
           |g AS (SELECT doc_id, CASE WHEN len(toks) - 2 < 1 THEN CAST([] AS VARCHAR[])
           |   ELSE [substr(md5(array_to_string(toks[i:i+2], ' ')), 1, 16)
           |         FOR i IN generate_series(1, len(toks) - 2)] END AS gh FROM c),
           |f AS (SELECT doc_id, CASE WHEN len(gh) = 0 THEN CAST([] AS VARCHAR[])
           |   WHEN len(gh) - 3 < 1 THEN [list_min(gh)]
           |   ELSE [list_min(gh[j:j+3]) FOR j IN generate_series(1, len(gh) - 3)]
           |  END AS fps FROM g)
           |SELECT doc_id, unnest(list_distinct(fps)) AS fingerprint FROM f""".stripMargin,

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

      "q70_pii_redact" -> {
        val emailRe = graft.operators.Privacy.EmailRe
        val phoneRe = graft.operators.Privacy.PhoneRe
        val ipRe = graft.operators.Privacy.Ipv4Re
        s"""WITH p AS (SELECT doc_id,
           |  substring(text, 1, 60) || ' contact user' || CAST(doc_id AS VARCHAR)
           |   || '@mail.example.com or +1-555-01'
           |   || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
           |   || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS raw
           | FROM documents)
           |SELECT doc_id,
           | regexp_replace(regexp_replace(regexp_replace(raw,
           |   '$emailRe', '<EMAIL>', 'g'),
           |   '$ipRe', '<IP>', 'g'),
           |   '$phoneRe', '<PHONE>', 'g') AS redacted,
           | CAST(len(regexp_extract_all(raw, '$emailRe')) AS BIGINT) AS n_emails,
           | CAST(len(regexp_extract_all(raw, '$phoneRe')) AS BIGINT) AS n_phones,
           | CAST(len(regexp_extract_all(raw, '$ipRe')) AS BIGINT) AS n_ips
           |FROM p""".stripMargin
      },

      "q71_decontaminate" ->
        s"""WITH toks AS (SELECT doc_id,
           |   string_split(lower(${cleanSql("text")}), ' ') AS toks FROM documents),
           |grams AS (SELECT doc_id, unnest(list_distinct(list_transform(
           |   range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' ')))) AS gram
           |  FROM toks WHERE len(toks) >= 8),
           |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0)
           |SELECT t.doc_id AS doc_id, count(DISTINCT t.gram) AS n_hit_grams
           |FROM grams t JOIN bench USING (gram)
           |WHERE t.doc_id % 20 <> 0 GROUP BY 1""".stripMargin,

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

      "q74_zscore" ->
        """WITH s AS (SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
          |  FROM events GROUP BY 1)
          |SELECT event_id, e.event_type AS event_type,
          | round((e.value - mu) / sd, 4) AS z
          |FROM events e JOIN s USING (event_type)
          |WHERE abs((e.value - mu) / sd) > 2.5""".stripMargin,

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

      "q78_kmeans" -> graft.operators.KMeansOp.oracleSql(
        "embeddings", "vec_id", "embedding", k = 4, iters = 2, dim = 64),

      "q79_quality_rules" -> TextAnalysis.gopherRulesOracleSql(
        "documents", "doc_id", s"string_split(lower(${cleanSql("text")}), ' ')"),

      "q80_repetition" ->
        s"""WITH d AS (SELECT doc_id,
           |   string_split(lower(${cleanSql("text")}), ' ') AS toks FROM documents),
           |d2 AS (SELECT * FROM d WHERE len(toks) >= 2),
           |uni AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS f FROM (
           |   SELECT doc_id, g, count(*) AS c FROM (
           |     SELECT doc_id, unnest(toks) AS g FROM d2) GROUP BY 1, 2
           |  ) GROUP BY doc_id),
           |bi AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS f FROM (
           |   SELECT doc_id, g, count(*) AS c FROM (
           |     SELECT doc_id, unnest(list_transform(range(1, len(toks)),
           |       i -> array_to_string(toks[i:i+1], ' '))) AS g FROM d2) GROUP BY 1, 2
           |  ) GROUP BY doc_id)
           |SELECT uni.doc_id AS doc_id, round(uni.f, 6) AS top_uni_frac,
           | round(bi.f, 6) AS top_bi_frac, bi.f > 0.08 AS repetitive
           |FROM uni JOIN bi ON uni.doc_id = bi.doc_id""".stripMargin,

      "q81_mix_sample" ->
        """SELECT doc_id, lang, source FROM documents
          |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
          | CASE WHEN lang = 'en' THEN 'g'
          |      WHEN lang IN ('es', 'fr') THEN '80000000'
          |      WHEN lang = 'de' THEN '40000000'
          |      ELSE '20000000' END""".stripMargin,

      "q87_lateral" -> lateralSql,

      "q93_seq_pack" ->
        s"""WITH d AS (SELECT doc_id,
           |   CAST(len(string_split(${cleanSql("text")}, ' ')) AS BIGINT) AS n_toks
           |  FROM documents),
           |c AS (SELECT doc_id, n_toks,
           |   sum(n_toks) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_toks
           |  FROM d)
           |SELECT doc_id, n_toks, CAST(cum_toks AS BIGINT) AS cum_toks,
           | CAST(floor((cum_toks - n_toks) / 2048.0) AS BIGINT) AS pack_id
           |FROM c""".stripMargin,

      "q94_seq_pack_split" ->
        s"""WITH d AS (SELECT doc_id,
           |   CAST(len(string_split(${cleanSql("text")}, ' ')) AS BIGINT) AS n_toks
           |  FROM documents),
           |c AS (SELECT doc_id, n_toks,
           |   CAST(sum(n_toks) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           |  FROM d),
           |s AS (SELECT doc_id, cum - n_toks AS beg, cum AS fin,
           |   (cum - n_toks) // 2048 AS first_pack, (cum - 1) // 2048 AS last_pack
           |  FROM c WHERE n_toks > 0),
           |e AS (SELECT doc_id, beg, fin, first_pack,
           |   unnest(generate_series(first_pack, last_pack)) AS pack_id FROM s)
           |SELECT doc_id, CAST(pack_id AS BIGINT) AS pack_id,
           | CAST(pack_id - first_pack AS BIGINT) AS seg_idx,
           | CAST(greatest(beg, pack_id * 2048) - beg AS BIGINT) AS tok_offset,
           | CAST(least(fin, (pack_id + 1) * 2048)
           |   - greatest(beg, pack_id * 2048) AS BIGINT) AS seg_toks
           |FROM e""".stripMargin,

      "q95_chunk" ->
        s"""WITH d AS (SELECT doc_id,
           |   string_split(${cleanSql("text")}, ' ') AS toks FROM documents),
           |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM d),
           |s AS (SELECT doc_id, toks, n,
           |   unnest(generate_series(0, n - 1, 48)) AS tok_start FROM n)
           |SELECT doc_id, CAST(tok_start // 48 AS BIGINT) AS chunk_idx,
           | CAST(tok_start AS BIGINT) AS tok_start,
           | CAST(least(64, n - tok_start) AS BIGINT) AS chunk_toks,
           | array_to_string(list_slice(toks, tok_start + 1,
           |   least(tok_start + 64, n)), ' ') AS chunk_text
           |FROM s""".stripMargin,

      "q96_temperature_mix" ->
        """WITH d AS (SELECT doc_id, lang, source,
          |   md5(CAST(doc_id AS VARCHAR)) AS draw FROM documents),
          |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
          |   CAST(floor(sqrt(count(*))) AS BIGINT) AS w FROM d GROUP BY lang),
          |q AS (SELECT lang,
          |   CAST((200 * w) // (SELECT sum(w) FROM c) AS BIGINT) AS quota,
          |   CAST(coalesce(sum(cnt) OVER (ORDER BY lang
          |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          |     AS BIGINT) AS prev_cum
          |  FROM c),
          |r AS (SELECT doc_id, lang, source, row_number()
          |   OVER (PARTITION BY lang ORDER BY draw, doc_id) AS lrank FROM d)
          |SELECT r.doc_id, r.lang, r.source, CAST(r.lrank AS BIGINT) AS lrank
          |FROM r JOIN q USING (lang) WHERE r.lrank <= q.quota""".stripMargin,

      "q98_canonical_pick" -> {
        s"""WITH RECURSIVE ${shingleCte.stripPrefix("WITH ")},
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE ${jaccardSql("a.s", "b.s")} >= 0.7),
           |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs
           |  UNION SELECT id_a, id_a FROM pairs
           |  UNION SELECT id_b, id_b FROM pairs),
           |reach AS (SELECT src, dst FROM e
           |  UNION SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
           |comp AS (SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src),
           |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
           |  FROM comp GROUP BY cluster_id),
           |tq AS (SELECT doc_id,
           |  CAST(len(string_split(${cleanSql("text")}, ' ')) AS BIGINT) AS n_toks
           |  FROM documents),
           |j AS (SELECT c.doc_id, c.cluster_id, sz.cluster_size, tq.n_toks
           |  FROM comp c JOIN sz USING (cluster_id) JOIN tq USING (doc_id)),
           |m AS (SELECT cluster_id, max(n_toks) AS canonical_toks FROM j GROUP BY 1)
           |SELECT j.cluster_id, j.cluster_size, min(j.doc_id) AS canonical_id,
           | m.canonical_toks
           |FROM j JOIN m ON j.cluster_id = m.cluster_id
           |  AND j.n_toks = m.canonical_toks
           |GROUP BY j.cluster_id, j.cluster_size, m.canonical_toks""".stripMargin
      },

      "q99_pmi_cooccur" ->
        s"""WITH docs AS (SELECT doc_id,
           |   list_distinct(string_split(${cleanSql("text")}, ' ')) AS ts FROM documents),
           |tok AS (SELECT doc_id, unnest(ts) AS tok FROM docs),
           |dfc AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY tok),
           |topk AS (SELECT tok, n FROM dfc ORDER BY n DESC, tok ASC LIMIT 20),
           |tf AS (SELECT t.doc_id, t.tok FROM tok t JOIN topk USING (tok)),
           |pc AS (SELECT a.tok AS tok_a, b.tok AS tok_b,
           |   CAST(count(*) AS BIGINT) AS n_ab
           |  FROM tf a JOIN tf b ON a.doc_id = b.doc_id AND a.tok < b.tok
           |  GROUP BY 1, 2 HAVING count(*) >= 5),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM docs)
           |SELECT tok_a, tok_b, n_ab,
           | round(ln(n_ab * 1.0 * n_docs / (ka.n * 1.0 * kb.n)), 6) AS pmi
           |FROM pc JOIN topk ka ON pc.tok_a = ka.tok
           | JOIN topk kb ON pc.tok_b = kb.tok CROSS JOIN nn""".stripMargin,

      "q100_strat_split" ->
        """WITH d AS (SELECT doc_id, lang,
          |   md5(CAST(doc_id AS VARCHAR)) AS draw FROM documents),
          |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY lang),
          |r AS (SELECT doc_id, lang, row_number()
          |   OVER (PARTITION BY lang ORDER BY draw, doc_id) AS lrank FROM d)
          |SELECT r.doc_id, r.lang,
          | CASE WHEN r.lrank <= (c.cnt * 8) // 10 THEN 'train'
          |      WHEN r.lrank <= (c.cnt * 8) // 10 + c.cnt // 10 THEN 'val'
          |      ELSE 'test' END AS split
          |FROM r JOIN c USING (lang)""".stripMargin,

      "q101_embed_outlier" ->
        """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
          |   embedding::DOUBLE[] AS v FROM embeddings),
          |u AS (SELECT label, unnest(v) AS x,
          |   generate_subscripts(v, 1) AS pos FROM e),
          |c AS (SELECT label, pos, round(avg(x), 6) AS cv FROM u GROUP BY 1, 2),
          |cent AS (SELECT label, list(cv ORDER BY pos) AS centroid FROM c GROUP BY label),
          |s AS (SELECT e.vec_id, e.label,
          |   round(list_sum(list_transform(range(1, 65), i -> v[i] * centroid[i])) /
          |    (sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i]))) *
          |     sqrt(list_sum(list_transform(range(1, 65), i -> centroid[i] * centroid[i])))), 6) AS cos_c
          |  FROM e JOIN cent USING (label))
          |SELECT label, vec_id, cos_c,
          | CAST(row_number() OVER (PARTITION BY label
          |   ORDER BY cos_c ASC, vec_id ASC) AS BIGINT) AS rnk
          |FROM s QUALIFY rnk <= 5""".stripMargin,

      "q103_semdedup" ->
        s"""WITH asg AS (SELECT vec_id, cluster FROM (
           |${graft.operators.KMeansOp.oracleSql("embeddings", "vec_id", "embedding", k = 4, iters = 2, dim = 64)}
           |)),
           |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |j AS (SELECT b.vec_id AS vec_id,
           |   round(list_inner_product(ea.v, eb.v) /
           |    (sqrt(list_inner_product(ea.v, ea.v)) *
           |     sqrt(list_inner_product(eb.v, eb.v))), 6) AS cos
           |  FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
           |  JOIN ev ea ON ea.vec_id = a.vec_id
           |  JOIN ev eb ON eb.vec_id = b.vec_id),
           |drp AS (SELECT DISTINCT vec_id FROM j WHERE cos >= 0.40)
           |SELECT asg.vec_id, asg.cluster, (drp.vec_id IS NULL) AS keep
           |FROM asg LEFT JOIN drp ON asg.vec_id = drp.vec_id""".stripMargin,

      "q104_shuffle_pack" ->
        s"""WITH d AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS draw,
           |   CAST(len(string_split(${cleanSql("text")}, ' ')) AS BIGINT) AS n_toks
           |  FROM documents),
           |r AS (SELECT doc_id, n_toks, sum(n_toks) OVER (ORDER BY draw, doc_id
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_toks FROM d)
           |SELECT doc_id, n_toks, CAST(cum_toks AS BIGINT) AS cum_toks,
           | CAST((cum_toks - n_toks) // 2048 AS BIGINT) AS pack_id FROM r""".stripMargin,

      "q105_dsir" ->
        s"""WITH toks AS (SELECT doc_id, lang,
           |   unnest(string_split(lower(${cleanSql("text")}), ' ')) AS tok FROM documents),
           |t2 AS (SELECT doc_id, lang, substring(md5(tok), 1, 2) AS b
           |  FROM toks WHERE tok <> ''),
           |raw AS (SELECT b, count(*) AS cr FROM t2 GROUP BY 1),
           |tgt AS (SELECT b, count(*) AS ct FROM t2 WHERE lang = 'en' GROUP BY 1),
           |nr AS (SELECT CAST(sum(cr) AS BIGINT) AS nr FROM raw),
           |nt AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM t2 WHERE lang = 'en')
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
           | round(avg(ln((coalesce(ct, 0) + 1.0) / (nt + 256))
           |        - ln((cr + 1.0) / (nr + 256))), 4) + 0.0 AS dsir_w
           |FROM t2 JOIN raw USING (b) LEFT JOIN tgt USING (b)
           | CROSS JOIN nr CROSS JOIN nt
           |GROUP BY doc_id""".stripMargin,

      "q106_bigram_lm" ->
        s"""WITH d AS (SELECT doc_id,
           |   string_split(lower(${cleanSql("text")}), ' ') AS toks FROM documents),
           |nn AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) >= 2),
           |bg AS (SELECT doc_id, toks[CAST(pos AS BIGINT)] AS w1,
           |   toks[CAST(pos + 1 AS BIGINT)] AS w2
           |  FROM (SELECT doc_id, toks,
           |   unnest(generate_series(1, CAST(n - 1 AS BIGINT))) AS pos FROM nn)),
           |m2 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
           |m1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
           |v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM (
           |   SELECT unnest(string_split(lower(${cleanSql("text")}), ' ')) AS tok
           |   FROM documents) WHERE tok <> '')
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           | round(avg(-ln((c12 + 1.0) / (c1 + v))), 4) AS xent,
           | round(exp(avg(-ln((c12 + 1.0) / (c1 + v)))), 4) AS ppl
           |FROM bg JOIN m2 USING (w1, w2) JOIN m1 USING (w1) CROSS JOIN v
           |GROUP BY doc_id""".stripMargin,

      "q107_weighted_sample" ->
        s"""WITH d AS (SELECT doc_id, n_chars,
           |   md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
           |u AS (SELECT doc_id, n_chars,
           |   CAST($hexNum13 AS DOUBLE) / 4503599627370496.0 AS u FROM d)
           |SELECT doc_id, n_chars,
           | round(ln(greatest(u, 2.220446049250313e-16)) / n_chars, 6) AS es_key
           |FROM u ORDER BY es_key DESC, doc_id LIMIT 200""".stripMargin,

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

      "q109_embed_quantize" ->
        """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
          |   embedding::DOUBLE[] AS v FROM embeddings),
          |u AS (SELECT vec_id, label, unnest(v) AS x,
          |   generate_subscripts(v, 1) AS pos FROM e),
          |st AS (SELECT pos, min(x) AS lo, max(x) AS hi FROM u GROUP BY 1),
          |dq AS (SELECT vec_id, label, x,
          |   lo + floor((x - lo) / (hi - lo) * 255.0 + 0.5) / 255.0 * (hi - lo) AS xr
          |  FROM u JOIN st USING (pos))
          |SELECT label, CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
          | round(avg((x - xr) * (x - xr)), 10) AS mse,
          | round(max(abs(x - xr)), 8) AS max_err
          |FROM dq GROUP BY label""".stripMargin,

      "q114_pq_adc_search" -> {
        def asg(m: Int): String = "(" + graft.operators.KMeansOp.oracleSql(
          "embeddings", "vec_id",
          s"list_slice(embedding, ${m * 16 + 1}, ${m * 16 + 16})",
          k = 4, iters = 2, dim = 16) + s"\n) a$m"
        def cb(m: Int): String = "(" + graft.operators.KMeansOp.oracleCentroidsSql(
          "embeddings", "vec_id",
          s"list_slice(embedding, ${m * 16 + 1}, ${m * 16 + 16})",
          k = 4, iters = 2, dim = 16) + s"\n) cb$m"
        val lut = (0 until 4).map { m =>
          s"""(list_inner_product(cb$m.c, cb$m.c)
             |  - 2 * list_inner_product(list_slice(q.qv, ${m * 16 + 1}, ${m * 16 + 16}), cb$m.c))""".stripMargin
        }.mkString(" + ")
        s"""WITH q AS (SELECT vec_id AS query_id,
           |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
           |  FROM embeddings WHERE vec_id < 8)
           |SELECT query_id, corpus_id, adc,
           | CAST(row_number() OVER (PARTITION BY query_id
           |   ORDER BY adc ASC, corpus_id ASC) AS BIGINT) AS rnk
           |FROM (
           |  SELECT q.query_id, a0.vec_id AS corpus_id,
           |   round(list_inner_product(q.qv, q.qv) + $lut, 6) AS adc
           |  FROM q CROSS JOIN ${asg(0)}
           |   JOIN ${asg(1)} ON a1.vec_id = a0.vec_id
           |   JOIN ${asg(2)} ON a2.vec_id = a0.vec_id
           |   JOIN ${asg(3)} ON a3.vec_id = a0.vec_id
           |   JOIN ${cb(0)} ON cb0.cid = a0.cluster
           |   JOIN ${cb(1)} ON cb1.cid = a1.cluster
           |   JOIN ${cb(2)} ON cb2.cid = a2.cluster
           |   JOIN ${cb(3)} ON cb3.cid = a3.cluster)
           |QUALIFY rnk <= 5""".stripMargin
      },

      "q115_ivfpq_search" -> q115Oracle,

      // q123 is q115's build+query round trip through the stored artifact —
      // same deterministic fits, so the SAME oracle must hash-match
      "q123_ann_index_query" -> q115Oracle,

      "q124_incremental_semdedup" -> {
        // Lloyd chain pinned on the CORPUS slice (k=4 matches the engine's
        // cellCount(450, 128) at sf0.01 — Round11Spec guards the boundary)
        val corpusCb = graft.operators.KMeansOp.oracleCentroidsSql(
          "(SELECT * FROM embeddings WHERE vec_id % 10 <> 0) corp_src",
          "vec_id", "embedding", k = 4, iters = 2, dim = 64)
        s"""WITH cb AS (SELECT cid, c FROM (
           |$corpusCb
           |)),
           |corp AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
           |  FROM embeddings WHERE vec_id % 10 <> 0),
           |bat AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
           |  FROM embeddings WHERE vec_id % 10 = 0),
           |asgC AS (SELECT corp.id, cb.cid FROM corp CROSS JOIN cb
           |  QUALIFY row_number() OVER (PARTITION BY corp.id
           |    ORDER BY list_inner_product(cb.c, cb.c)
           |      - 2 * list_inner_product(corp.v, cb.c), cb.cid) = 1),
           |asgB AS (SELECT bat.id, cb.cid FROM bat CROSS JOIN cb
           |  QUALIFY row_number() OVER (PARTITION BY bat.id
           |    ORDER BY list_inner_product(cb.c, cb.c)
           |      - 2 * list_inner_product(bat.v, cb.c), cb.cid) = 1),
           |dup AS (SELECT b.id, CAST(count(*) AS BIGINT) AS n
           |  FROM asgB b JOIN bat ON bat.id = b.id
           |  JOIN asgC c ON c.cid = b.cid
           |  JOIN corp ON corp.id = c.id
           |  WHERE round(list_inner_product(bat.v, corp.v) /
           |    (sqrt(list_inner_product(bat.v, bat.v)) *
           |     sqrt(list_inner_product(corp.v, corp.v))), 6) >= 0.40
           |  GROUP BY b.id)
           |SELECT bat.id AS vec_id, coalesce(dup.n, 0) AS n_dups,
           | coalesce(dup.n, 0) = 0 AS keep
           |FROM bat LEFT JOIN dup ON dup.id = bat.id""".stripMargin
      },

      "q129_ann_index_upsert" -> {
        // quantizers fit on the STANDING corpus slice only; ALL vectors
        // (standing + appended batch) assigned/encoded under them — the
        // hash gate proves AnnIndex.append's encode is bit-identical to
        // a from-scratch encode with the same stored quantizers
        val slice = "(SELECT * FROM embeddings WHERE vec_id % 10 <> 0) ix_src"
        def cbs(m: Int): String = "(" + graft.operators.KMeansOp.oracleCentroidsSql(
          slice, "vec_id", s"list_slice(embedding, ${m * 16 + 1}, ${m * 16 + 16})",
          k = 4, iters = 2, dim = 16) + s"\n)"
        val cbf = "(" + graft.operators.KMeansOp.oracleCentroidsSql(
          slice, "vec_id", "embedding", k = 4, iters = 2, dim = 64) + "\n)"
        val lut = (0 until 4).map { m =>
          s"""(list_inner_product(cm$m.c, cm$m.c)
             |  - 2 * list_inner_product(list_slice(p.qv, ${m * 16 + 1}, ${m * 16 + 16}), cm$m.c))""".stripMargin
        }.mkString(" + ")
        val codeCtes = (0 until 4).map { m =>
          s"""code$m AS (SELECT av.vec_id, cs$m.cid AS code FROM av CROSS JOIN cs$m
             |  QUALIFY row_number() OVER (PARTITION BY av.vec_id
             |    ORDER BY list_inner_product(cs$m.c, cs$m.c)
             |      - 2 * list_inner_product(list_slice(av.v, ${m * 16 + 1}, ${m * 16 + 16}), cs$m.c),
             |      cs$m.cid) = 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH av AS (SELECT vec_id,
           |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
           |cf AS (SELECT cid, c FROM $cbf),
           |${(0 until 4).map(m => s"cs$m AS (SELECT cid, c FROM ${cbs(m)})").mkString(",\n")},
           |cells AS (SELECT av.vec_id, cf.cid AS cell FROM av CROSS JOIN cf
           |  QUALIFY row_number() OVER (PARTITION BY av.vec_id
           |    ORDER BY list_inner_product(cf.c, cf.c)
           |      - 2 * list_inner_product(av.v, cf.c), cf.cid) = 1),
           |$codeCtes,
           |q AS (SELECT vec_id AS query_id, v AS qv FROM av WHERE vec_id < 8),
           |probed AS (SELECT query_id, qv, cell FROM (
           |  SELECT q.query_id, q.qv, cf.cid AS cell,
           |   row_number() OVER (PARTITION BY q.query_id
           |     ORDER BY round(list_inner_product(cf.c, cf.c)
           |       - 2 * list_inner_product(q.qv, cf.c), 6) ASC, cf.cid ASC) AS crnk
           |  FROM q CROSS JOIN cf) WHERE crnk <= 2)
           |SELECT query_id, corpus_id, adc,
           | CAST(row_number() OVER (PARTITION BY query_id
           |   ORDER BY adc ASC, corpus_id ASC) AS BIGINT) AS rnk
           |FROM (
           |  SELECT p.query_id, cells.vec_id AS corpus_id,
           |   round(list_inner_product(p.qv, p.qv) + $lut, 6) AS adc
           |  FROM probed p
           |   JOIN cells ON cells.cell = p.cell
           |   JOIN code0 ON code0.vec_id = cells.vec_id
           |   JOIN code1 ON code1.vec_id = cells.vec_id
           |   JOIN code2 ON code2.vec_id = cells.vec_id
           |   JOIN code3 ON code3.vec_id = cells.vec_id
           |   JOIN cs0 cm0 ON cm0.cid = code0.code
           |   JOIN cs1 cm1 ON cm1.cid = code1.code
           |   JOIN cs2 cm2 ON cm2.cid = code2.code
           |   JOIN cs3 cm3 ON cm3.cid = code3.code)
           |QUALIFY rnk <= 5""".stripMargin
      },

      "q125_shard_manifest" ->
        s"""WITH d AS (SELECT doc_id,
           |   CAST(len(string_split(${cleanSql("text")}, ' ')) AS BIGINT) AS n_toks
           |  FROM documents),
           |r AS (SELECT doc_id, n_toks,
           |   row_number() OVER (ORDER BY n_toks DESC, doc_id ASC) - 1 AS rnk0
           |  FROM d),
           |a AS (SELECT doc_id, n_toks,
           |   CAST(CASE WHEN (rnk0 // 8) % 2 = 0 THEN rnk0 % 8
           |        ELSE 7 - rnk0 % 8 END AS BIGINT) AS shard_id
           |  FROM r),
           |tot AS (SELECT CAST(sum(n_toks) AS BIGINT) AS all_toks FROM d)
           |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
           | CAST(sum(n_toks) AS BIGINT) AS shard_toks,
           | CAST(max(n_toks) AS BIGINT) AS max_doc_toks,
           | round(CAST(sum(n_toks) AS DOUBLE) * 8 / all_toks, 6) AS balance
           |FROM a, tot GROUP BY shard_id, all_toks""".stripMargin,

      "q127_repeat_upsample" ->
        s"""WITH d AS (SELECT doc_id, source,
           |   CAST(len(string_split(${cleanSql("text")}, ' ')) AS BIGINT) AS n_toks,
           |   md5(CAST(doc_id AS VARCHAR)) AS h
           |  FROM documents),
           |s AS (SELECT source, CAST(sum(n_toks) AS BIGINT) AS src_toks
           |  FROM d GROUP BY source),
           |m AS (SELECT CAST(max(src_toks) AS BIGINT) AS max_toks FROM s),
           |e AS (SELECT source, least(CAST(4.0 AS DOUBLE),
           |   CAST(max_toks AS DOUBLE) / greatest(src_toks, 1)) AS epochs
           |  FROM s, m),
           |j AS (SELECT d.doc_id, d.source,
           |   CAST(floor(epochs) AS BIGINT) AS fullc,
           |   epochs - floor(epochs) AS frac,
           |   CAST($hexNum13 AS DOUBLE) / 4503599627370496.0 AS u
           |  FROM d JOIN e USING (source)),
           |n AS (SELECT doc_id, source,
           |   fullc + CASE WHEN u < frac THEN 1 ELSE 0 END AS n_copies FROM j)
           |SELECT doc_id, source, CAST(n_copies AS BIGINT) AS n_copies,
           | CAST(unnest(generate_series(0, n_copies - 1)) AS BIGINT) AS copy_idx
           |FROM n WHERE n_copies > 0""".stripMargin,

      "q128_export_pipeline" ->
        s"""WITH d AS (SELECT doc_id,
           |   CAST(len(string_split(${cleanSql("text")}, ' ')) AS BIGINT) AS n_toks
           |  FROM documents),
           |r AS (SELECT doc_id, n_toks,
           |   row_number() OVER (ORDER BY n_toks DESC, doc_id ASC) - 1 AS rnk0
           |  FROM d),
           |a AS (SELECT doc_id, n_toks,
           |   CAST(CASE WHEN (rnk0 // 8) % 2 = 0 THEN rnk0 % 8
           |        ELSE 7 - rnk0 % 8 END AS BIGINT) AS shard_id,
           |   md5(CAST(doc_id AS VARCHAR)) AS dr
           |  FROM r),
           |c AS (SELECT doc_id, shard_id, n_toks,
           |   CAST(sum(n_toks) OVER (PARTITION BY shard_id
           |     ORDER BY dr, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks
           |  FROM a)
           |SELECT doc_id, shard_id, cum_toks,
           | CAST((cum_toks - n_toks) // 2048 AS BIGINT) AS pack_id
           |FROM c""".stripMargin,

      "q126_snapshot_diff" ->
        s"""WITH v1 AS (SELECT doc_id, md5(coalesce(text, '')) AS h1
           |  FROM documents WHERE doc_id % 7 <> 3),
           |v2 AS (SELECT doc_id,
           |   md5(CASE WHEN doc_id % 11 = 0 THEN coalesce(text, '') || ' rev2'
           |       ELSE coalesce(text, '') END) AS h2
           |  FROM documents WHERE doc_id % 13 <> 5),
           |j AS (SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id, h1, h2
           |  FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
           |SELECT doc_id,
           | CASE WHEN h1 IS NULL THEN 'added'
           |      WHEN h2 IS NULL THEN 'removed'
           |      ELSE 'changed' END AS status
           |FROM j WHERE h1 IS NULL OR h2 IS NULL OR h1 <> h2""".stripMargin,

      "q130_textrank" -> {
        val base =
          s"""WITH tk AS (SELECT string_split(lower(${cleanSql("text")}), ' ') AS ts FROM documents),
             |a0 AS (SELECT unnest(ts[:len(ts)-1]) AS u, unnest(ts[2:]) AS v
             |  FROM tk WHERE len(ts) >= 2),
             |ad AS (SELECT u, v FROM a0 WHERE u <> '' AND v <> '' AND u <> v),
             |ed AS (SELECT u, v, CAST(count(*) AS BIGINT) AS w FROM
             |   (SELECT u, v FROM ad UNION ALL SELECT v AS u, u AS v FROM ad)
             |  GROUP BY u, v),
             |ow AS (SELECT u, CAST(sum(w) AS BIGINT) AS outw FROM ed GROUP BY u),
             |p0 AS (SELECT u AS tok, CAST(1.0 AS DOUBLE) AS pr FROM ow)""".stripMargin
        base + prIterCtes(5) + "\nSELECT tok, round(pr, 6) AS pr FROM p5"
      },

      "q131_pca_power" -> (pcaCtes +
        "\nSELECT v.i AS dim_idx, round(v.v, 6) AS loading, round(n3.l, 6) AS lambda FROM v3 v, n3"),

      "q140_abtt_residual" -> (pcaCtes +
        """,
          |ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |pe2 AS (SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM ev),
          |px AS (SELECT vec_id, sum(x * u.v) AS p, sum(x * x) AS n2
          |  FROM pe2 JOIN v3 u ON u.i = pe2.i - 1 GROUP BY vec_id)
          |SELECT vec_id, round(p, 6) AS proj,
          | round(sqrt(greatest(n2 - p * p, 0.0)), 6) AS residual_norm
          |FROM px""".stripMargin),

      "q132_phrase_search" -> {
        val qvals = phraseQueries.flatMap { p =>
          val ts = p.split(" ")
          ts.zipWithIndex.map { case (tok, i) => s"('$p', '$tok', $i, ${ts.length})" }
        }.mkString(", ")
        s"""WITH tk AS (SELECT doc_id, string_split(lower(${cleanSql("text")}), ' ') AS ts FROM documents),
           |po0 AS (SELECT doc_id, unnest(ts) AS token, unnest(range(0, len(ts))) AS pos FROM tk),
           |po AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, token FROM po0 WHERE token <> ''),
           |qt(phrase, token, qpos, plen) AS (SELECT * FROM (VALUES $qvals)),
           |an AS (SELECT phrase, plen, doc_id, po.pos - qpos AS anchor, count(*) AS nt
           |  FROM po JOIN qt USING (token) GROUP BY 1, 2, 3, 4),
           |hits AS (SELECT phrase, doc_id, CAST(count(*) AS BIGINT) AS n_hits
           |  FROM an WHERE nt = plen GROUP BY 1, 2)
           |SELECT phrase, CAST(row_number() OVER (PARTITION BY phrase
           |   ORDER BY n_hits DESC, doc_id ASC) AS BIGINT) AS rnk,
           | doc_id, n_hits
           |FROM hits QUALIFY rnk <= 20""".stripMargin
      },

      "q133_hash_classifier" -> nbQualitySql,

      "q145_calibration" ->
        s"""WITH q AS (
           |$nbQualitySql
           |),
           |l AS (SELECT q.doc_id, q.quality_w,
           |   CASE WHEN d.source IN ('src0','src1','src2','src3','src4')
           |        THEN 1 ELSE 0 END AS y
           |  FROM q JOIN documents d USING (doc_id)),
           |r AS (SELECT doc_id, quality_w, y,
           |   CAST(row_number() OVER (ORDER BY quality_w ASC, doc_id ASC) AS BIGINT) AS rn
           |  FROM l),
           |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM l)
           |SELECT CAST(((rn - 1) * 10) // n AS BIGINT) AS decile,
           | CAST(count(*) AS BIGINT) AS n_docs,
           | round(avg(quality_w), 4) + 0.0 AS mean_w,
           | round(avg(CAST(y AS DOUBLE)), 4) AS pos_rate
           |FROM r, t GROUP BY 1""".stripMargin,

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

      "q150_rater_agreement" -> {
        val gopher = TextAnalysis.gopherRulesOracleSql(
          "documents", "doc_id", s"string_split(lower(${cleanSql("text")}), ' ')")
        s"""WITH q AS (
           |$nbQualitySql
           |),
           |g AS (
           |$gopher
           |),
           |j AS (SELECT d.lang, q.keep, g.passes
           |  FROM q JOIN g USING (doc_id) JOIN documents d USING (doc_id)),
           |c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
           |   CAST(sum(CASE WHEN keep AND passes THEN 1 ELSE 0 END) AS BIGINT) AS n11,
           |   CAST(sum(CASE WHEN keep AND NOT passes THEN 1 ELSE 0 END) AS BIGINT) AS n10,
           |   CAST(sum(CASE WHEN NOT keep AND passes THEN 1 ELSE 0 END) AS BIGINT) AS n01,
           |   CAST(sum(CASE WHEN NOT keep AND NOT passes THEN 1 ELSE 0 END) AS BIGINT) AS n00
           |  FROM j GROUP BY lang)
           |SELECT lang, n, n11, n10, n01, n00,
           | round(CAST(n11 + n00 AS DOUBLE) / n, 6) AS po,
           | round(CAST((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS DOUBLE)
           |   / (n * n), 6) AS pe,
           | CASE WHEN CAST((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS DOUBLE)
           |       / (n * n) = 1.0 THEN 1.0
           |  ELSE round((CAST(n11 + n00 AS DOUBLE) / n
           |    - CAST((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS DOUBLE)
           |      / (n * n))
           |   / (1.0 - CAST((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS DOUBLE)
           |      / (n * n)), 6) END AS kappa
           |FROM c""".stripMargin
      },

      "q147_knn_graph" -> {
        // LSH-bucket candidate blocking replicated with the SAME plane
        // constants the Spark side uses (q34/q153 twin pattern)
        val planes = graft.functions.VectorExprs.deterministicPlanes(8, 64)
        def planeDot(v: String, p: Seq[Double]): String =
          s"list_sum(list_transform(range(1,65), j -> $v[j] * list_extract(${p.mkString("[", ", ", "]")}, j)))"
        val bucket = planes.zipWithIndex.map { case (p, i) =>
          s"(CASE WHEN ${planeDot("v", p)} >= 0 THEN ${1 << i} ELSE 0 END)"
        }.mkString("\n   + ")
        def nrm(v: String): String =
          s"sqrt(list_sum(list_transform(range(1, 65), i -> $v[i] * $v[i])))"
        s"""WITH RECURSIVE c AS (SELECT vec_id, v, CAST($bucket AS BIGINT) AS bkt
           |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)),
           |s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |   round(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i])) /
           |    (${nrm("a.v")} * ${nrm("b.v")}), 6) AS cos
           |  FROM c a JOIN c b ON a.bkt = b.bkt AND a.vec_id <> b.vec_id),
           |t AS (SELECT id_a, id_b,
           |   row_number() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b ASC) AS rn
           |  FROM s QUALIFY rn <= 4),
           |m AS (SELECT t1.id_a, t1.id_b FROM t t1
           |  JOIN t t2 ON t1.id_a = t2.id_b AND t1.id_b = t2.id_a
           |  WHERE t1.id_a < t1.id_b),
           |e AS (SELECT id_a AS src, id_b AS dst FROM m
           |  UNION SELECT id_b, id_a FROM m
           |  UNION SELECT id_a, id_a FROM m
           |  UNION SELECT id_b, id_b FROM m),
           |reach AS (SELECT src, dst FROM e
           |  UNION SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
           |comp AS (SELECT src AS vec_id, min(dst) AS cluster_id FROM reach GROUP BY src),
           |lab AS (SELECT a.vec_id, coalesce(p.cluster_id, a.vec_id) AS cluster_id
           |  FROM (SELECT vec_id FROM embeddings) a LEFT JOIN comp p USING (vec_id))
           |SELECT l.vec_id, l.cluster_id, z.cluster_size
           |FROM lab l JOIN (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
           |  FROM lab GROUP BY cluster_id) z USING (cluster_id)""".stripMargin
      },

      "q148_cms_freq" -> {
        // 2-nibble positional hex decode (the hexNum13 pattern at width 2)
        def bkt2(h: String): String =
          s"((strpos('0123456789abcdef', substring($h, 1, 1)) - 1) * 16" +
            s" + (strpos('0123456789abcdef', substring($h, 2, 1)) - 1))"
        val hq = "md5(CAST(j AS VARCHAR) || ':' || tok)"
        s"""WITH tok0 AS (SELECT unnest(string_split(lower(${cleanSql("text")}), ' ')) AS tok
           |  FROM documents),
           |tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
           |  FROM tok0 WHERE tok <> '' GROUP BY tok),
           |nn AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM tc),
           |js AS (SELECT CAST(unnest(range(0, 4)) AS BIGINT) AS j),
           |cells AS (SELECT j, CAST(${bkt2(hq)} AS BIGINT) AS bkt,
           |   CAST(sum(cnt) AS BIGINT) AS c
           |  FROM tc, js GROUP BY 1, 2),
           |top AS (SELECT tok, cnt,
           |   row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rn
           |  FROM tc QUALIFY rn <= 20),
           |qt AS (SELECT tok, cnt AS true_cnt, j, CAST(${bkt2(hq)} AS BIGINT) AS bkt
           |  FROM top, js),
           |est AS (SELECT qt.tok, qt.true_cnt, min(c.c) AS cms_est
           |  FROM qt JOIN cells c USING (j, bkt) GROUP BY 1, 2)
           |SELECT tok, true_cnt, CAST(cms_est AS BIGINT) AS cms_est,
           | CAST(cms_est - true_cnt AS BIGINT) AS overest,
           | CAST(cms_est - true_cnt AS DOUBLE) <= exp(1.0) / 256 * nn.n AS within_bound
           |FROM est, nn""".stripMargin
      },

      "q149_boilerplate" ->
        s"""WITH d AS (SELECT doc_id, source,
           |   string_split(lower(${cleanSql("text")}), ' ') AS toks FROM documents),
           |w AS (SELECT doc_id, source, toks,
           |   unnest(generate_series(0, CAST(ceil(len(toks) / 3.0) - 1 AS BIGINT))) AS i
           |  FROM d WHERE len(toks) >= 1),
           |sg AS (SELECT doc_id, source,
           |   array_to_string(list_slice(toks, CAST(i * 3 + 1 AS BIGINT),
           |     CAST(i * 3 + 3 AS BIGINT)), ' ') AS seg FROM w),
           |sh AS (SELECT doc_id, source, substring(md5(seg), 1, 16) AS h
           |  FROM sg WHERE seg <> ''),
           |c AS (SELECT source, h, CAST(count(*) AS BIGINT) AS occ,
           |   CAST(count(DISTINCT doc_id) AS BIGINT) AS ndf FROM sh GROUP BY 1, 2),
           |st AS (SELECT source, CAST(count(*) AS BIGINT) AS sdocs FROM d
           |  WHERE len(toks) >= 1 GROUP BY source),
           |f AS (SELECT c.source, c.occ,
           |   (c.ndf >= 2 AND c.ndf * 20 > st.sdocs) AS boiler
           |  FROM c JOIN st USING (source))
           |SELECT source, CAST(sum(occ) AS BIGINT) AS n_seg_occ,
           | CAST(count(*) AS BIGINT) AS n_distinct_segs,
           | CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler_segs,
           | CAST(sum(CASE WHEN boiler THEN occ ELSE 0 END) AS BIGINT) AS boiler_occ,
           | round(CAST(sum(CASE WHEN boiler THEN occ ELSE 0 END) AS DOUBLE)
           |   / sum(occ), 6) AS boiler_share
           |FROM f GROUP BY source""".stripMargin,

      "q151_bloom_decontaminate" -> {
        // 5-nibble positional hex decode (hexNum13 pattern at width 5) —
        // 20 hash bits feed the 2^18-bit filter (probed ~20-bits/element)
        def hex5(x: String): String = (1 to 5).map(i =>
          s"(strpos('0123456789abcdef', substring($x, $i, 1)) - 1) * ${1 << (4 * (5 - i))}")
          .mkString("(", " + ", ")")
        val ph = hex5("md5(CAST(j AS VARCHAR) || ':' || h)")
        s"""WITH docs0 AS (SELECT doc_id, string_split(${cleanSql("text")}, ' ') AS toks
           |  FROM documents),
           |d5 AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 3),
           |   i -> array_to_string(toks[i:i+4], ' '))) AS s
           |  FROM docs0 WHERE len(toks) >= 5),
           |u AS (SELECT doc_id, substring(md5(unnest(s)), 1, 16) AS h FROM d5),
           |b AS (SELECT DISTINCT h FROM u WHERE doc_id % 20 = 0),
           |js AS (SELECT CAST(unnest(range(0, 4)) AS BIGINT) AS j),
           |bits AS (SELECT DISTINCT CAST($ph % 262144 AS BIGINT) AS pos FROM b, js),
           |tr AS (SELECT DISTINCT doc_id, h FROM u WHERE doc_id % 20 <> 0),
           |hp AS (SELECT doc_id, h, j, CAST($ph % 262144 AS BIGINT) AS pos FROM tr, js),
           |hit AS (SELECT doc_id, h FROM hp JOIN bits USING (pos)
           |  GROUP BY doc_id, h HAVING count(*) = 4),
           |nb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bloom_hits
           |  FROM hit GROUP BY doc_id),
           |ne AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_exact_hits
           |  FROM hit JOIN b USING (h) GROUP BY doc_id)
           |SELECT nb.doc_id, nb.n_bloom_hits,
           | CAST(coalesce(ne.n_exact_hits, 0) AS BIGINT) AS n_exact_hits,
           | coalesce(ne.n_exact_hits, 0) = 0 AS bloom_fp_only
           |FROM nb LEFT JOIN ne USING (doc_id)""".stripMargin
      },

      "q152_dist_drift" ->
        s"""WITH tk AS (SELECT source, (doc_id % 10 = 0) AS is_batch,
           |   unnest(string_split(lower(${cleanSql("text")}), ' ')) AS tok FROM documents),
           |c AS (SELECT source, tok,
           |   CAST(sum(CASE WHEN is_batch THEN 1 ELSE 0 END) AS BIGINT) AS cb,
           |   CAST(sum(CASE WHEN is_batch THEN 0 ELSE 1 END) AS BIGINT) AS cc
           |  FROM tk WHERE tok <> '' GROUP BY 1, 2),
           |t AS (SELECT source, CAST(sum(cb) AS BIGINT) AS nb,
           |   CAST(sum(cc) AS BIGINT) AS nc, CAST(count(*) AS BIGINT) AS v
           |  FROM c GROUP BY source),
           |p AS (SELECT c.source, t.nb, t.nc, t.v,
           |   CAST(cb + 1 AS DOUBLE) / (nb + v) AS p,
           |   CAST(cc + 1 AS DOUBLE) / (nc + v) AS q
           |  FROM c JOIN t USING (source))
           |SELECT source, max(v) AS vocab, max(nb) AS n_batch_toks,
           | max(nc) AS n_corpus_toks,
           | round(sum(p * ln(p / q)), 6) AS kl,
           | round(sum(p * ln(p / q)), 6) > 0.02 AS drifted
           |FROM p GROUP BY source""".stripMargin,

      "q153_cluster_ari" -> {
        // plane-bucket twin generated from the SAME constants (q34 pattern)
        val planes = graft.functions.VectorExprs.deterministicPlanes(8, 64)
        def planeDot(v: String, p: Seq[Double]): String =
          s"list_sum(list_transform(range(1,65), j -> $v[j] * list_extract(${p.mkString("[", ", ", "]")}, j)))"
        val bucket = planes.zipWithIndex.map { case (p, i) =>
          s"(CASE WHEN ${planeDot("v", p)} >= 0 THEN ${1 << i} ELSE 0 END)"
        }.mkString("\n   + ")
        s"""WITH e AS (SELECT embedding::DOUBLE[] AS v, CAST(label AS BIGINT) AS label
           |  FROM embeddings),
           |lb AS (SELECT CAST($bucket AS BIGINT) AS bucket, label FROM e),
           |cont AS (SELECT bucket, label, CAST(count(*) AS BIGINT) AS nij
           |  FROM lb GROUP BY 1, 2),
           |byb AS (SELECT bucket, CAST(sum(nij) AS BIGINT) AS ai,
           |   CAST(max(nij) AS BIGINT) AS mx FROM cont GROUP BY bucket),
           |byl AS (SELECT label, CAST(sum(nij) AS BIGINT) AS bj FROM cont GROUP BY label),
           |s1 AS (SELECT CAST(sum(nij * (nij - 1)) AS BIGINT) AS sij2,
           |   CAST(sum(nij) AS BIGINT) AS n FROM cont),
           |s2 AS (SELECT CAST(sum(ai * (ai - 1)) AS BIGINT) AS sa2,
           |   CAST(sum(mx) AS BIGINT) AS pur, CAST(count(*) AS BIGINT) AS nb FROM byb),
           |s3 AS (SELECT CAST(sum(bj * (bj - 1)) AS BIGINT) AS sb2,
           |   CAST(count(*) AS BIGINT) AS nl FROM byl),
           |x AS (SELECT n, nb, nl, sij2 / 2.0 AS hij, sa2 / 2.0 AS ha, sb2 / 2.0 AS hb,
           |   n * (n - 1) // 2 AS cn2, pur FROM s1, s2, s3),
           |y AS (SELECT n, nb, nl, hij, ha, hb, pur, ha * hb / cn2 AS ex FROM x)
           |SELECT n, nb AS n_buckets, nl AS n_labels,
           | round((hij - ex) / ((ha + hb) / 2.0 - ex), 6) AS ari,
           | round(CAST(pur AS DOUBLE) / n, 6) AS purity
           |FROM y""".stripMargin
      },

      "q154_ranking_ndcg" ->
        s"""WITH q AS (
           |$nbQualitySql
           |),
           |l AS (SELECT q.doc_id, q.quality_w,
           |   CASE WHEN d.source IN ('src0','src1','src2','src3','src4')
           |        THEN 1 ELSE 0 END AS y
           |  FROM q JOIN documents d USING (doc_id)),
           |r AS (SELECT doc_id, quality_w, y,
           |   CAST(row_number() OVER (ORDER BY quality_w DESC, doc_id ASC) AS BIGINT) AS rn
           |  FROM l),
           |np AS (SELECT CAST(sum(y) AS BIGINT) AS n_pos FROM l),
           |d AS (SELECT sum(CAST(y AS DOUBLE) / log2(rn + 1)) AS dcg FROM r WHERE rn <= 20),
           |i AS (SELECT sum(1.0 / log2(g + 1)) AS idcg
           |  FROM (SELECT CAST(unnest(range(1, 21)) AS BIGINT) AS g), np
           |  WHERE g <= least(np.n_pos, 20))
           |SELECT CAST(20 AS BIGINT) AS k, np.n_pos,
           | round(d.dcg, 6) AS dcg, round(i.idcg, 6) AS idcg,
           | round(d.dcg / i.idcg, 6) AS ndcg
           |FROM d, i, np""".stripMargin,

      "q155_minhash_estimate" ->
        s"""WITH d AS (SELECT doc_id, string_split(${cleanSql("text")}, ' ') AS toks
           |  FROM documents WHERE doc_id % 10 = 0),
           |s3 AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
           |   i -> array_to_string(toks[i:i+2], ' '))) AS s
           |  FROM d WHERE len(toks) >= 3),
           |u AS (SELECT DISTINCT doc_id, substring(md5(unnest(s)), 1, 16) AS h FROM s3),
           |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM u GROUP BY doc_id),
           |sh2 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |   CAST(count(*) AS BIGINT) AS c
           |  FROM u a JOIN u b USING (h) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
           |cand AS (SELECT id_a, id_b,
           |   CAST(c AS DOUBLE) / (za.sz + zb.sz - c) AS jac
           |  FROM sh2 JOIN sz za ON za.doc_id = sh2.id_a
           |  JOIN sz zb ON zb.doc_id = sh2.id_b
           |  WHERE CAST(c AS DOUBLE) / (za.sz + zb.sz - c) >= 0.2),
           |ps AS (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS p),
           |sig AS (SELECT doc_id, p, min(md5(CAST(p AS VARCHAR) || ':' || h)) AS mh
           |  FROM u, ps GROUP BY doc_id, p),
           |e AS (SELECT c.id_a, c.id_b, c.jac,
           |   CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS DOUBLE) / 64.0 AS est
           |  FROM cand c JOIN sig sa ON sa.doc_id = c.id_a
           |  JOIN sig sb ON sb.doc_id = c.id_b AND sb.p = sa.p
           |  GROUP BY 1, 2, 3)
           |SELECT id_a, id_b, round(jac, 6) AS exact_jac, round(est, 6) AS est_jac,
           | round(abs(est - jac), 6) AS abs_err FROM e""".stripMargin,

      "q156_threshold_tune" ->
        s"""WITH q AS (
           |$nbQualitySql
           |),
           |l AS (SELECT CAST(round(q.quality_w * 10000) AS BIGINT) AS w4,
           |   CASE WHEN d.source IN ('src0','src1','src2','src3','src4')
           |        THEN 1 ELSE 0 END AS y
           |  FROM q JOIN documents d USING (doc_id)),
           |b AS (SELECT CASE WHEN w4 < -10000 THEN CAST(-1 AS BIGINT)
           |         ELSE least((w4 + 10000) // 1000, 20) END AS bin,
           |   CAST(count(*) AS BIGINT) AS nd, CAST(sum(y) AS BIGINT) AS np
           |  FROM l GROUP BY 1),
           |t AS (SELECT CAST(sum(nd) AS BIGINT) AS td,
           |   CAST(sum(np) AS BIGINT) AS tpos FROM b),
           |i AS (SELECT CAST(unnest(range(0, 21)) AS BIGINT) AS ti),
           |sw AS (SELECT ti, CAST(coalesce(sum(b.nd), 0) AS BIGINT) AS kept,
           |   CAST(coalesce(sum(b.np), 0) AS BIGINT) AS tp
           |  FROM i LEFT JOIN b ON b.bin >= i.ti GROUP BY ti),
           |m AS (SELECT sw.ti, sw.kept, sw.tp, sw.kept - sw.tp AS fp,
           |   t.tpos - sw.tp AS fn,
           |   CASE WHEN sw.kept = 0 THEN 0.0
           |        ELSE CAST(sw.tp AS DOUBLE) / sw.kept END AS prec0,
           |   CAST(sw.tp AS DOUBLE) / t.tpos AS rec0
           |  FROM sw, t),
           |f AS (SELECT *, CASE WHEN tp = 0 THEN 0.0
           |   ELSE 2.0 * prec0 * rec0 / (prec0 + rec0) END AS f10 FROM m),
           |bf AS (SELECT max(f10) AS bf FROM f)
           |SELECT (ti * 1000 - 10000) / 10000.0 AS threshold, kept, tp, fp, fn,
           | round(prec0, 6) AS prec, round(rec0, 6) AS recall,
           | round(f10, 6) AS f1, f10 = bf.bf AS is_best
           |FROM f, bf""".stripMargin,

      "q157_k_anonymity" ->
        """WITH g AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS n,
          |   CAST(sum(n_chars) AS BIGINT) AS sc FROM documents GROUP BY 1, 2)
          |SELECT source, lang, n, round(sc / n, 2) AS avg_chars FROM g WHERE n >= 5
          |UNION ALL
          |SELECT '*' AS source, '*' AS lang, CAST(sum(n) AS BIGINT) AS n,
          | round(sum(sc) / sum(n), 2) AS avg_chars
          |FROM g WHERE n < 5 HAVING CAST(sum(n) AS BIGINT) >= 5""".stripMargin,

      "q168_dataset_card" -> {
        val gopher = TextAnalysis.gopherRulesOracleSql(
          "documents", "doc_id", s"string_split(lower(${cleanSql("text")}), ' ')")
        s"""WITH vol AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |   CAST(sum(${tokenCountSql("text")}) AS BIGINT) AS n_tokens,
           |   round(avg(n_chars), 2) AS avg_chars
           |  FROM documents GROUP BY source),
           |lg AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS lc
           |  FROM documents GROUP BY 1, 2),
           |tl AS (SELECT source, CAST(max(lc) AS BIGINT) AS mx FROM lg GROUP BY source),
           |dom AS (SELECT lg.source, tl.mx, min(lg.lang) AS top_lang
           |  FROM lg JOIN tl ON lg.source = tl.source AND lg.lc = tl.mx
           |  GROUP BY 1, 2),
           |g AS (
           |$gopher
           |),
           |pr AS (SELECT d.source,
           |   round(avg(CASE WHEN g.passes THEN 1.0 ELSE 0.0 END), 6) AS pass_rate
           |  FROM g JOIN documents d USING (doc_id) GROUP BY d.source),
           |dh AS (SELECT source, md5(${cleanSql("text")}) AS h,
           |   CAST(count(*) AS BIGINT) AS hc FROM documents GROUP BY 1, 2),
           |dup AS (SELECT source,
           |   round(CAST(sum(CASE WHEN hc > 1 THEN hc ELSE 0 END) AS DOUBLE)
           |     / sum(hc), 6) AS exact_dup_share
           |  FROM dh GROUP BY source)
           |SELECT vol.source, vol.n_docs, vol.n_tokens, vol.avg_chars,
           | dom.top_lang, round(CAST(dom.mx AS DOUBLE) / vol.n_docs, 6)
           |   AS top_lang_share,
           | pr.pass_rate, dup.exact_dup_share
           |FROM vol JOIN dom USING (source) JOIN pr USING (source)
           |JOIN dup USING (source)""".stripMargin
      },

      "q169_bpe_pairs" ->
        s"""WITH tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
           |  FROM (SELECT unnest(string_split(lower(${cleanSql("text")}), ' ')) AS tok
           |    FROM documents)
           |  WHERE tok <> '' GROUP BY tok),
           |w AS (SELECT cnt, tok,
           |   unnest(generate_series(1, len(tok) - 1)) AS i
           |  FROM tc WHERE len(tok) >= 2),
           |f AS (SELECT substring(tok, CAST(i AS INT), 2) AS pair,
           |   CAST(sum(cnt) AS BIGINT) AS freq FROM w GROUP BY 1)
           |SELECT pair, freq,
           | CAST(row_number() OVER (ORDER BY freq DESC, pair ASC) AS BIGINT) AS rnk
           |FROM f QUALIFY rnk <= 20""".stripMargin,

      "q170_pad_efficiency" ->
        s"""WITH d AS (SELECT doc_id, ${tokenCountSql("text")} AS n_toks FROM documents),
           |r AS (SELECT doc_id, n_toks,
           |   CAST(row_number() OVER (ORDER BY n_toks ASC, doc_id ASC) AS BIGINT) AS rn
           |  FROM d),
           |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
           |b AS (SELECT n_toks, (rn - 1) * 8 // n AS bucket FROM r, t)
           |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
           | CAST(max(n_toks) AS BIGINT) AS max_len,
           | CAST(sum(n_toks) AS BIGINT) AS sum_toks,
           | CASE WHEN max(n_toks) > 0
           |      THEN round(1.0 - CAST(sum(n_toks) AS DOUBLE)
           |        / (count(*) * max(n_toks)), 6)
           |      ELSE 0.0 END AS pad_frac
           |FROM b GROUP BY bucket""".stripMargin,

      "q171_script_profile" -> {
        def cnt(re: String): String =
          s"len(c) - len(regexp_replace(c, '$re', '', 'g'))"
        s"""WITH d AS (SELECT source, lower(${cleanSql("text")}) AS c FROM documents),
           |k AS (SELECT source, CAST(len(c) AS BIGINT) AS nc,
           |   CAST(${cnt("[a-z]")} AS BIGINT) AS na,
           |   CAST(${cnt("[0-9]")} AS BIGINT) AS nd,
           |   CAST(${cnt(" ")} AS BIGINT) AS ns FROM d)
           |SELECT source, CAST(sum(nc) AS BIGINT) AS n_chars,
           | round(CAST(sum(na) AS DOUBLE) / sum(nc), 6) AS alpha_share,
           | round(CAST(sum(nd) AS DOUBLE) / sum(nc), 6) AS digit_share,
           | round(CAST(sum(ns) AS DOUBLE) / sum(nc), 6) AS space_share,
           | round(CAST(sum(nc) - sum(na) - sum(nd) - sum(ns) AS DOUBLE)
           |   / sum(nc), 6) AS other_share
           |FROM k GROUP BY source""".stripMargin
      },

      "q172_label_fusion" -> {
        val gopher = TextAnalysis.gopherRulesOracleSql(
          "documents", "doc_id", s"string_split(lower(${cleanSql("text")}), ' ')")
        s"""WITH q AS (
           |$nbQualitySql
           |),
           |g AS (
           |$gopher
           |),
           |v AS (SELECT d.doc_id, q.keep AS r1, g.passes AS r2,
           |   d.n_chars >= 200 AS r3,
           |   (CAST(q.keep AS INT) + CAST(g.passes AS INT)
           |     + CASE WHEN d.n_chars >= 200 THEN 1 ELSE 0 END) >= 2 AS maj
           |  FROM documents d JOIN q USING (doc_id) JOIN g USING (doc_id)),
           |a AS (SELECT avg(CAST(r1 = maj AS DOUBLE)) AS a1,
           |   avg(CAST(r2 = maj AS DOUBLE)) AS a2,
           |   avg(CAST(r3 = maj AS DOUBLE)) AS a3 FROM v),
           |s AS (SELECT doc_id, r1, r2, r3, maj,
           |   round((CASE WHEN r1 THEN a1 - 0.5 ELSE 0.5 - a1 END)
           |     + (CASE WHEN r2 THEN a2 - 0.5 ELSE 0.5 - a2 END)
           |     + (CASE WHEN r3 THEN a3 - 0.5 ELSE 0.5 - a3 END), 6) AS fused_score
           |  FROM v, a)
           |SELECT doc_id, r1, r2, r3, maj, fused_score,
           | CASE WHEN fused_score > 0 THEN true
           |      WHEN fused_score < 0 THEN false
           |      ELSE maj END AS fused
           |FROM s""".stripMargin
      },

      // all-pairs exact twin of the banded-LSH engine path — recall caveat
      // documented at q159's oracle entry
      "q173_label_propagation" ->
        s"""$shingleCte,
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE ${jaccardSql("a.s", "b.s")} >= 0.7),
           |sym AS (SELECT id_a, id_b FROM pairs
           |  UNION ALL SELECT id_b, id_a FROM pairs),
           |nb AS (SELECT s.id_a, d.lang FROM sym s
           |  JOIN documents d ON d.doc_id = s.id_b AND d.doc_id % 5 <> 0
           |  WHERE s.id_a % 5 = 0),
           |c AS (SELECT id_a, lang, CAST(count(*) AS BIGINT) AS c
           |  FROM nb GROUP BY 1, 2),
           |m AS (SELECT id_a, CAST(max(c) AS BIGINT) AS mc,
           |   CAST(sum(c) AS BIGINT) AS n_lab FROM c GROUP BY id_a)
           |SELECT c.id_a AS doc_id, min(c.lang) AS pred_lang,
           | m.n_lab AS n_labeled_neighbors
           |FROM c JOIN m ON c.id_a = m.id_a AND c.c = m.mc
           |GROUP BY 1, 3""".stripMargin,

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

      "q214_supplier_hhi" ->
        """WITH rev AS (SELECT l_suppkey,
          |   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
          |     AS cents
          |  FROM lineitem GROUP BY l_suppkey)
          |SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS n_suppliers,
          | round(CAST(sum(rev.cents) AS DOUBLE) / 100.0, 2) AS revenue,
          | round(sum(CAST(rev.cents AS DOUBLE) * rev.cents) /
          |   (CAST(sum(rev.cents) AS DOUBLE) * sum(rev.cents)), 6) AS hhi
          |FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
          |JOIN nation n ON n.n_nationkey = s.s_nationkey
          |GROUP BY n.n_name""".stripMargin,

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

      "q219_packing_audit" ->
        s"""WITH d AS (SELECT doc_id, source, ${tokenCountSql("text")} AS n_tok
           |  FROM documents),
           |c AS (SELECT source, n_tok,
           |   sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
           |     AS cum FROM d),
           |f AS (SELECT source, n_tok,
           |   CASE WHEN n_tok > 0 AND floor((cum - 1) / 2048.0) >
           |     floor((cum - n_tok) / 2048.0) THEN 1 ELSE 0 END AS split
           |  FROM c)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           | CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           | CAST(sum(split) AS BIGINT) AS n_split,
           | round(CAST(sum(split) AS DOUBLE) / count(*), 4) AS split_share
           |FROM f GROUP BY source""".stripMargin,

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

      "q222_table_fingerprint" -> {
        def hex8(h: String): String = (1 to 8).map(i =>
          s"CAST(strpos('0123456789abcdef', substring($h, $i, 1)) - 1 AS BIGINT) * ${1L << (4 * (8 - i))}")
          .mkString(" + ")
        def fp(name: String, table: String, canonical: String) =
          s"""SELECT '$name' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
             | CAST(sum(${hex8(s"md5($canonical)")}) AS BIGINT) AS fingerprint
             |FROM $table"""
        Seq(
          fp("orders", "orders",
            """concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
              | CAST(round(o_totalprice * 100) AS BIGINT),
              | CAST(CAST(o_orderdate AS DATE) AS VARCHAR), o_orderpriority)"""
              .stripMargin.replace('\n', ' ')),
          fp("customer", "customer",
            """concat_ws('|', c_custkey, c_name, c_nationkey,
              | CAST(round(c_acctbal * 100) AS BIGINT), c_mktsegment)"""
              .stripMargin.replace('\n', ' ')),
          fp("supplier", "supplier",
            """concat_ws('|', s_suppkey, s_name, s_nationkey,
              | CAST(round(s_acctbal * 100) AS BIGINT))"""
              .stripMargin.replace('\n', ' ')))
          .map(q => q.stripMargin.replace('\n', ' '))
          .mkString(" UNION ALL ")
      },

      "q223_triangle_census" ->
        """WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          |p AS (SELECT a.l_partkey AS u, b.l_partkey AS v,
          |   CAST(count(*) AS BIGINT) AS w
          |  FROM it a JOIN it b ON a.l_orderkey = b.l_orderkey
          |    AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2),
          |e AS (SELECT u, v FROM p WHERE w >= 2),
          |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
          |   SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
          |  GROUP BY node),
          |base AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
          |   CAST(sum(d * (d - 1)) / 2 AS BIGINT) AS n_wedges FROM deg),
          |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
          |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
          |  FROM e e1 JOIN e e2 ON e1.v = e2.u
          |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
          |SELECT base.n_nodes, ne.n_edges, base.n_wedges, tri.n_triangles,
          | round(tri.n_triangles * 3.0 / base.n_wedges, 6) AS global_cc
          |FROM base, ne, tri""".stripMargin,

      "q224_median_of_means" ->
        """WITH ev AS (SELECT value,
          |   substring(md5(CAST(event_id AS VARCHAR)), 1, 1) AS b
          |  FROM events),
          |bm AS (SELECT b, round(avg(value), 6) AS m FROM ev GROUP BY b),
          |mom AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets,
          |   round(quantile_cont(m, 0.5), 4) AS mom_mean FROM bm),
          |pl AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
          |   round(avg(value), 4) AS plain_mean FROM ev)
          |SELECT pl.n_events, mom.n_buckets, pl.plain_mean, mom.mom_mean
          |FROM pl, mom""".stripMargin,

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

      "q227_cuped" ->
        """WITH ev AS (SELECT user_id,
          |   CAST(floor(epoch(ts)) AS BIGINT) AS e FROM events),
          |b AS (SELECT CAST(floor((min(e) + max(e)) / 2) AS BIGINT) AS mid
          |  FROM ev),
          |pu AS (SELECT user_id,
          |   CAST(sum(CASE WHEN e < b.mid THEN 1 ELSE 0 END) AS BIGINT) AS x,
          |   CAST(sum(CASE WHEN e >= b.mid THEN 1 ELSE 0 END) AS BIGINT) AS y,
          |   CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) IN
          |     ('0','1','2','3','4','5','6','7') THEN 'A' ELSE 'B' END AS arm
          |  FROM ev, b GROUP BY user_id),
          |arms AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
          |   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |   CAST(sum(x * y) AS BIGINT) AS sxy,
          |   CAST(sum(x * x) AS BIGINT) AS sxx,
          |   CAST(sum(y * y) AS BIGINT) AS syy
          |  FROM pu GROUP BY arm),
          |pool AS (SELECT CAST((sum(n) * sum(sxy) - sum(sx) * sum(sy))
          |     AS DOUBLE) /
          |   CAST(sum(n) * sum(sxx) - sum(sx) * sum(sx) AS DOUBLE) AS theta
          |  FROM arms),
          |t AS (SELECT arm, n, sy,
          |   CAST(n * syy - sy * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n)
          |     AS var_y,
          |   CAST(n * sxy - sx * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n)
          |     AS cov_xy,
          |   CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * n)
          |     AS var_x
          |  FROM arms)
          |SELECT arm, n AS n_users,
          | round(CAST(sy AS DOUBLE) / n, 4) AS mean_post,
          | round(var_y, 4) AS var_post,
          | round(var_y - 2 * p.theta * cov_xy
          |   + p.theta * p.theta * var_x, 4) AS var_cuped,
          | round(1 - (var_y - 2 * p.theta * cov_xy
          |   + p.theta * p.theta * var_x) / var_y, 4) AS var_reduction,
          | round(p.theta, 6) AS theta
          |FROM t, pool p""".stripMargin,

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

      "q229_path_trigrams" ->
        """WITH ev AS (SELECT user_id, event_id, event_type,
          |   CAST(floor(epoch(ts)) AS BIGINT) AS e FROM events),
          |w AS (SELECT event_type AS step1,
          |   lead(event_type, 1) OVER win AS step2,
          |   lead(e, 1) OVER win AS e2,
          |   lead(event_type, 2) OVER win AS step3,
          |   lead(e, 2) OVER win AS e3, e
          |  FROM ev WINDOW win AS (PARTITION BY user_id
          |    ORDER BY e, event_id)),
          |tri AS (SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n
          |  FROM w WHERE step3 IS NOT NULL
          |    AND e2 - e <= 1800 AND e3 - e2 <= 1800
          |  GROUP BY 1, 2, 3),
          |tt AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM tri)
          |SELECT step1, step2, step3, n,
          | round(CAST(n AS DOUBLE) / tt.tot, 4) AS share
          |FROM tri, tt""".stripMargin,

      "q230_benford" -> {
        val caseExpr = benfordShares.map { case (d, p) =>
          s"WHEN $d THEN $p" }.mkString("CASE digit ", " ", " END")
        s"""WITH d AS (SELECT CAST(substring(CAST(CAST(round(o_totalprice
           |     * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
           |  FROM orders),
           |dg AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_orders
           |  FROM d GROUP BY digit),
           |be AS (SELECT digit, n_orders, $caseExpr AS benford_share
           |  FROM dg),
           |tt AS (SELECT CAST(sum(n_orders) AS BIGINT) AS tot FROM be),
           |ch AS (SELECT sum((n_orders - tt.tot * benford_share) *
           |    (n_orders - tt.tot * benford_share) /
           |    (tt.tot * benford_share)) AS chi2
           |  FROM be, tt)
           |SELECT be.digit, be.n_orders,
           | round(CAST(be.n_orders AS DOUBLE) / tt.tot, 4) AS obs_share,
           | be.benford_share,
           | round(ch.chi2, 4) AS chi2_total
           |FROM be, tt, ch""".stripMargin
      },

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

      "q233_weighted_sample" ->
        s"""WITH d AS (SELECT doc_id, source, n_chars,
           |   md5(CAST(doc_id AS VARCHAR)) AS h
           |  FROM documents WHERE n_chars > 0),
           |k AS (SELECT doc_id, source, n_chars,
           |   round(ln((($hexNum13) + 0.5) / 4503599627370496.0)
           |     / n_chars, 12) AS key
           |  FROM d),
           |r AS (SELECT doc_id, source, n_chars,
           |   CAST(row_number() OVER (ORDER BY key DESC, doc_id ASC)
           |     AS BIGINT) AS rank
           |  FROM k)
           |SELECT rank, doc_id, source, n_chars FROM r
           |WHERE rank <= 64""".stripMargin,

      "q234_phrase_search" -> {
        def one(ph: String): String = {
          val Array(a, b) = ph.split(" ")
          s"""SELECT '$ph' AS phrase,
             | CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |   AS n_docs,
             | CAST(sum(n) AS BIGINT) AS n_occurrences
             |FROM (SELECT doc_id,
             |   len(list_filter(range(1, len(toks)),
             |     i -> toks[i] = '$a' AND toks[i + 1] = '$b')) AS n
             |  FROM (SELECT doc_id,
             |     string_split(lower(${cleanSql("text")}), ' ') AS toks
             |    FROM documents) d) m"""
        }
        Seq("fast table", "table table", "spark window").map(one)
          .map(q => q.stripMargin.replace('\n', ' '))
          .mkString(" UNION ALL ")
      },

      "q235_price_dispersion" ->
        """WITH u AS (SELECT l_partkey, l_suppkey,
          |   CAST(round(l_extendedprice * 100 / l_quantity) AS BIGINT)
          |     AS uc
          |  FROM lineitem),
          |ps AS (SELECT l_partkey, l_suppkey,
          |   CAST(sum(uc) AS DOUBLE) / count(*) AS mean_uc
          |  FROM u GROUP BY 1, 2),
          |pp AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_suppliers,
          |   min(mean_uc) AS lo, max(mean_uc) AS hi
          |  FROM ps GROUP BY 1 HAVING count(*) >= 2),
          |r AS (SELECT l_partkey, n_suppliers,
          |   round(lo / 100.0, 2) AS min_unit_price,
          |   round(hi / 100.0, 2) AS max_unit_price,
          |   (hi - lo) / lo AS rel,
          |   CAST(row_number() OVER (ORDER BY (hi - lo) / lo DESC,
          |     l_partkey ASC) AS BIGINT) AS rank
          |  FROM pp)
          |SELECT rank, l_partkey, n_suppliers, min_unit_price,
          | max_unit_price, round(rel, 4) AS rel_spread
          |FROM r WHERE rank <= 20""".stripMargin,

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

      "q239_ewma_anomaly" -> {
        val vals = ewmaWeights.map { case (j, w) => s"($j, $w)" }.mkString(", ")
        s"""WITH ev AS (SELECT CAST(ts AS DATE) AS day FROM events),
           |daily AS (SELECT day, CAST(count(*) AS BIGINT) AS c
           |  FROM ev GROUP BY day),
           |b AS (SELECT min(day) AS d0,
           |   CAST(date_diff('day', min(day), max(day)) + 1 AS BIGINT) AS nd
           |  FROM ev),
           |s AS (SELECT CAST(i.i AS BIGINT) AS i, b.d0 + CAST(i.i - 1 AS INT) AS day
           |  FROM b, (SELECT unnest(range(1, (SELECT nd FROM b) + 1)) AS i) i),
           |f AS (SELECT s.i, s.day, coalesce(daily.c, 0) AS n_events
           |  FROM s LEFT JOIN daily USING (day)),
           |w(j, wt) AS (VALUES $vals),
           |p AS (SELECT f.i + w.j AS i, CAST(w.wt AS BIGINT) AS wt,
           |   CAST(w.wt AS BIGINT) * f.n_events AS wy FROM f, w),
           |base AS (SELECT i, CAST(sum(wt) AS BIGINT) AS denom,
           |   CAST(sum(wy) AS BIGINT) AS numer FROM p GROUP BY i)
           |SELECT f.day, f.n_events,
           | round(CAST(numer AS DOUBLE) / denom, 4) AS ewma,
           | CASE WHEN numer > 0 THEN
           |   round(CAST(f.n_events * denom AS DOUBLE) / numer, 4) END AS ratio,
           | (f.n_events * denom > numer * 2) AS is_spike
           |FROM f JOIN base USING (i)""".stripMargin
      },

      "q240_heaps_law" ->
        s"""WITH d0 AS (SELECT doc_id,
           |   list_filter(string_split(lower(${cleanSql("text")}), ' '),
           |     t -> t <> '') AS toks FROM documents),
           |d AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN
           |   list_transform(range(1, len(toks) - 1),
           |     i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)]
           |       || ' ' || toks[CAST(i + 2 AS INT)])
           |  ELSE [] END AS grams FROM d0),
           |r AS (SELECT CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rk,
           |   grams, CAST(len(grams) AS BIGINT) AS ng FROM d),
           |e AS (SELECT rk, unnest(grams) AS g FROM r),
           |fst AS (SELECT g, min(rk) AS frk FROM e GROUP BY g),
           |vi AS (SELECT frk, CAST(count(*) AS BIGINT) AS v_incr
           |  FROM fst GROUP BY frk),
           |pr AS (SELECT r.rk, r.ng, coalesce(vi.v_incr, 0) AS v_incr
           |  FROM r LEFT JOIN vi ON vi.frk = r.rk),
           |run AS (SELECT rk,
           |   CAST(sum(ng) OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING)
           |     AS BIGINT) AS n_grams,
           |   CAST(sum(v_incr) OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING)
           |     AS BIGINT) AS vocab FROM pr),
           |cuts AS (SELECT CAST(i.i AS BIGINT) AS checkpoint,
           |   (CAST(i.i AS BIGINT) * (SELECT max(rk) FROM r)) // 20 AS cut
           |  FROM (SELECT unnest(range(1, 21)) AS i) i),
           |cp AS (SELECT c.checkpoint, run.rk AS n_docs, run.n_grams, run.vocab
           |  FROM run JOIN cuts c ON run.rk = c.cut),
           |l AS (SELECT round(ln(CAST(n_grams AS DOUBLE)), 9) AS x,
           |   round(ln(CAST(vocab AS DOUBLE)), 9) AS y
           |  FROM cp WHERE n_grams > 0 AND vocab > 0),
           |fit AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
           |   sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy FROM l)
           |SELECT cp.checkpoint, cp.n_docs, cp.n_grams, cp.vocab,
           | round((fit.n * fit.sxy - fit.sx * fit.sy)
           |   / (fit.n * fit.sxx - fit.sx * fit.sx), 6) AS heaps_beta,
           | round(exp((fit.sy - ((fit.n * fit.sxy - fit.sx * fit.sy)
           |     / (fit.n * fit.sxx - fit.sx * fit.sx)) * fit.sx) / fit.n), 6)
           |   AS heaps_k
           |FROM cp, fit""".stripMargin,

      "q241_blocking_quality" -> {
        val vals = blockPerms.map { case (p, c) => s"($p, $c)" }.mkString(", ")
        val geomCtes = blockGeometries.map { case (_, r) =>
          s"""bands_$r AS (SELECT doc_id, p // $r AS band,
             |   string_agg(CAST(v AS VARCHAR), ',' ORDER BY p) AS sg
             |  FROM sig GROUP BY 1, 2),
             |cand_$r AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM bands_$r a JOIN bands_$r b ON a.band = b.band
             |   AND a.sg = b.sg AND a.doc_id < b.doc_id)""".stripMargin
        }.mkString(",\n")
        val geomRows = blockGeometries.map { case (nb, r) =>
          s"""SELECT $nb AS n_bands, $r AS rows_per_band,
             |  (SELECT CAST(count(*) AS BIGINT) FROM cand_$r) AS n_candidates,
             |  (SELECT CAST(count(*) AS BIGINT) FROM tr t JOIN cand_$r c
             |    ON t.id_a = c.id_a AND t.id_b = c.id_b) AS n_found""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH d AS (SELECT doc_id, lower(${cleanSql("text")}) AS tx
           |  FROM documents
           |  WHERE doc_id < 500 AND len(lower(${cleanSql("text")})) >= 3),
           |sh AS (SELECT DISTINCT doc_id, g FROM (
           |  SELECT doc_id, unnest(list_transform(range(1, len(tx) - 1),
           |    i -> substr(tx, CAST(i AS INT), 3))) AS g FROM d)),
           |hs AS (SELECT doc_id, md5(g) AS h FROM sh),
           |hv AS (SELECT doc_id, CAST($hexNum13 AS BIGINT) AS hv FROM hs),
           |perms(p, c) AS (VALUES $vals),
           |sig AS (SELECT doc_id, CAST(p AS BIGINT) AS p,
           |   min(xor(hv, CAST(c AS BIGINT))) AS v
           |  FROM hv, perms GROUP BY 1, 2),
           |$geomCtes,
           |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
           |  FROM sh GROUP BY doc_id),
           |tr AS (SELECT i.id_a, i.id_b
           |  FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |     CAST(count(*) AS BIGINT) AS shared
           |    FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
           |    GROUP BY 1, 2) i
           |  JOIN sz sa ON sa.doc_id = i.id_a
           |  JOIN sz sb ON sb.doc_id = i.id_b
           |  WHERE i.shared * 10 >= (sa.sz + sb.sz - i.shared) * 7),
           |base AS (SELECT
           |  (SELECT CAST(count(*) AS BIGINT) FROM sz) AS n_docs,
           |  (SELECT CAST(count(*) AS BIGINT) FROM tr) AS n_true_pairs),
           |geoms AS ($geomRows)
           |SELECT g.n_bands, g.rows_per_band, base.n_docs,
           | (base.n_docs * (base.n_docs - 1)) // 2 AS n_all_pairs,
           | base.n_true_pairs, g.n_candidates, g.n_found,
           | round(1.0 - CAST(g.n_candidates AS DOUBLE)
           |   / ((base.n_docs * (base.n_docs - 1)) // 2), 6) AS reduction_ratio,
           | CASE WHEN base.n_true_pairs > 0 THEN
           |   round(CAST(g.n_found AS DOUBLE) / base.n_true_pairs, 6) END
           |   AS pairs_completeness,
           | CASE WHEN g.n_candidates > 0 THEN
           |   round(CAST(g.n_found AS DOUBLE) / g.n_candidates, 6) END
           |   AS cand_precision
           |FROM geoms g, base""".stripMargin
      },

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

      "q244_ks_drift" ->
        """WITH o AS (SELECT
          |   CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
          |     AS ed,
          |   CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
          |b AS (SELECT (min(ed) + max(ed)) // 2 AS cut FROM o),
          |pv AS (SELECT cents,
          |   CAST(sum(CASE WHEN ed <= b.cut THEN 1 ELSE 0 END) AS BIGINT) AS ca,
          |   CAST(count(*) - sum(CASE WHEN ed <= b.cut THEN 1 ELSE 0 END)
          |     AS BIGINT) AS cb
          |  FROM o, b GROUP BY cents),
          |t AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
          |   CAST(sum(cb) AS BIGINT) AS nb FROM pv),
          |r AS (SELECT cents,
          |   CAST(sum(ca) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
          |     AS BIGINT) AS ra,
          |   CAST(sum(cb) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
          |     AS BIGINT) AS rb FROM pv),
          |sc AS (SELECT cents, t.na, t.nb,
          |   abs(ra * t.nb - rb * t.na) AS diff FROM r, t),
          |p AS (SELECT max(diff) AS mx FROM sc),
          |g AS (SELECT sc.na, sc.nb, p.mx, min(sc.cents) AS at_cents
          |  FROM sc, p WHERE sc.diff = p.mx GROUP BY 1, 2, 3)
          |SELECT na AS n_early, nb AS n_late,
          | round(CAST(mx AS DOUBLE) / CAST(na * nb AS DOUBLE), 6) AS d_stat,
          | round(CAST(at_cents AS DOUBLE) / 100.0, 2) AS at_price,
          | round(1.358 * sqrt(CAST(na + nb AS DOUBLE)
          |   / CAST(na * nb AS DOUBLE)), 6) AS d_crit_05,
          | (CAST(mx AS DOUBLE) / CAST(na * nb AS DOUBLE) >
          |  1.358 * sqrt(CAST(na + nb AS DOUBLE) / CAST(na * nb AS DOUBLE)))
          |   AS drifted
          |FROM g""".stripMargin,

      "q245_gini_segment" ->
        """WITH rev AS (SELECT o_custkey,
          |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          |     AS cents FROM orders GROUP BY o_custkey),
          |seg AS (SELECT c.c_mktsegment, coalesce(rev.cents, 0) AS cents,
          |   c.c_custkey
          |  FROM customer c LEFT JOIN rev ON c.c_custkey = rev.o_custkey),
          |rk AS (SELECT c_mktsegment, cents,
          |   CAST(row_number() OVER (PARTITION BY c_mktsegment
          |     ORDER BY cents, c_custkey) AS BIGINT) AS i FROM seg),
          |a AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
          |   CAST(sum(cents) AS BIGINT) AS sx,
          |   CAST(sum(i * cents) AS BIGINT) AS six
          |  FROM rk GROUP BY c_mktsegment)
          |SELECT c_mktsegment, n_customers,
          | round(CAST(sx AS DOUBLE) / 100.0, 2) AS revenue,
          | round(CAST(2 * six - (n_customers + 1) * sx AS DOUBLE)
          |   / CAST(n_customers * sx AS DOUBLE), 6) AS gini
          |FROM a""".stripMargin,

      "q246_mann_whitney" ->
        """WITH o AS (SELECT
          |   CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS a,
          |   CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
          |pv AS (SELECT cents, CAST(sum(a) AS BIGINT) AS ca,
          |   CAST(count(*) - sum(a) AS BIGINT) AS cb,
          |   CAST(count(*) AS BIGINT) AS t
          |  FROM o GROUP BY cents),
          |r AS (SELECT ca, cb, t,
          |   2 * (CAST(sum(t) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
          |     AS BIGINT) - t) + t + 1 AS mid2 FROM pv),
          |agg AS (SELECT CAST(sum(ca) AS BIGINT) AS n1,
          |   CAST(sum(cb) AS BIGINT) AS n2,
          |   CAST(sum(ca * mid2) AS BIGINT) AS r1x2,
          |   CAST(sum(t * t * t - t) AS BIGINT) AS ties FROM r)
          |SELECT n1 AS n_urgent, n2 AS n_other,
          | r1x2 - n1 * (n1 + 1) AS u1_x2,
          | round((CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0
          |     - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
          |   / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
          |     * (CAST(n1 + n2 AS DOUBLE) + 1.0 - CAST(ties AS DOUBLE)
          |       / (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1.0)))),
          |   6) AS z_score,
          | (abs((CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0
          |     - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
          |   / sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
          |     * (CAST(n1 + n2 AS DOUBLE) + 1.0 - CAST(ties AS DOUBLE)
          |       / (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1.0)))))
          |   > 1.96) AS significant_05
          |FROM agg""".stripMargin,

      "q247_dow_seasonality" -> {
        val labelCase = dowLabels.zipWithIndex
          .map { case (l, i) => s"WHEN $i THEN '$l'" }.mkString(" ")
        s"""WITH ev AS (SELECT event_type,
           |   CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
           |     AS BIGINT) % 7 AS dw FROM events),
           |c AS (SELECT event_type, dw, CAST(count(*) AS BIGINT) AS c
           |  FROM ev GROUP BY 1, 2),
           |t AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_type
           |  FROM c GROUP BY event_type)
           |SELECT c.event_type, c.dw, CASE c.dw $labelCase END AS weekday,
           | c.c AS n_events,
           | round(CAST(c.c * 7 AS DOUBLE) / t.n_type, 4) AS seasonality_index
           |FROM c JOIN t ON c.event_type = t.event_type""".stripMargin
      },

      "q248_zonemap_audit" ->
        """WITH li AS (SELECT
          |   CAST(date_diff('day', DATE '1970-01-01', l_shipdate) AS BIGINT)
          |     AS ed, l_orderkey, l_linenumber FROM lineitem),
          |co AS (SELECT max(ed) - 29 AS lo FROM li),
          |arr AS (SELECT ed,
          |   ((strpos('0123456789abcdef',
          |       substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 1)) - 1) * 16
          |    + (strpos('0123456789abcdef',
          |       substring(md5(CAST(l_orderkey AS VARCHAR)), 2, 1)) - 1)) % 32
          |     AS bucket FROM li),
          |srt AS (SELECT ed, CAST(ntile(32) OVER (ORDER BY ed, l_orderkey,
          |   l_linenumber) AS BIGINT) AS bucket FROM li),
          |fa AS (SELECT bucket, max(ed) AS mx, CAST(count(*) AS BIGINT) AS rows_
          |  FROM arr GROUP BY bucket),
          |fs AS (SELECT bucket, max(ed) AS mx, CAST(count(*) AS BIGINT) AS rows_
          |  FROM srt GROUP BY bucket),
          |aa AS (SELECT 'arrival' AS layout, CAST(count(*) AS BIGINT) AS n_files,
          |   CAST(sum(CASE WHEN mx < co.lo THEN 1 ELSE 0 END) AS BIGINT)
          |     AS files_skipped,
          |   CAST(sum(rows_) AS BIGINT) AS rows_total,
          |   CAST(sum(CASE WHEN mx < co.lo THEN rows_ ELSE 0 END) AS BIGINT)
          |     AS rows_skipped
          |  FROM fa, co),
          |ss AS (SELECT 'shipdate_sorted' AS layout,
          |   CAST(count(*) AS BIGINT) AS n_files,
          |   CAST(sum(CASE WHEN mx < co.lo THEN 1 ELSE 0 END) AS BIGINT)
          |     AS files_skipped,
          |   CAST(sum(rows_) AS BIGINT) AS rows_total,
          |   CAST(sum(CASE WHEN mx < co.lo THEN rows_ ELSE 0 END) AS BIGINT)
          |     AS rows_skipped
          |  FROM fs, co)
          |SELECT layout, n_files, files_skipped, rows_total, rows_skipped,
          | round(CAST(rows_skipped AS DOUBLE) / rows_total, 4) AS skip_fraction
          |FROM (SELECT * FROM aa UNION ALL SELECT * FROM ss)""".stripMargin,

      "q249_km_survival" ->
        """WITH ev AS (SELECT user_id, event_id,
          |   CAST(floor(epoch(ts)) AS BIGINT) AS e FROM events),
          |et AS (SELECT max(e) AS end_e FROM ev),
          |g AS (SELECT user_id, event_id, e,
          |   CASE WHEN lag(e) OVER w IS NULL OR e - lag(e) OVER w > 1800
          |     THEN 1 ELSE 0 END AS new_s
          |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY e, event_id)),
          |sg AS (SELECT user_id, e,
          |   CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY e, event_id
          |     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM g),
          |sx AS (SELECT (max(e) - min(e)) // 60 AS dur,
          |   CASE WHEN (SELECT end_e FROM et) - max(e) >= 1800
          |     THEN 1 ELSE 0 END AS ended
          |  FROM sg GROUP BY user_id, sid),
          |pd AS (SELECT dur, CAST(sum(ended) AS BIGINT) AS d,
          |   CAST(count(*) - sum(ended) AS BIGINT) AS c
          |  FROM sx GROUP BY dur),
          |n AS (SELECT CAST(sum(d + c) AS BIGINT) AS n_sessions FROM pd),
          |r AS (SELECT dur, d, c,
          |   n.n_sessions - (CAST(sum(d + c) OVER (ORDER BY dur
          |     ROWS UNBOUNDED PRECEDING) AS BIGINT) - d - c) AS n_risk
          |  FROM pd, n),
          |tm AS (SELECT dur, d, c, n_risk,
          |   CASE WHEN d < n_risk THEN CAST(round(
          |     ln(1.0 - CAST(d AS DOUBLE) / n_risk) * 1e9) AS BIGINT)
          |    ELSE CAST(-1e11 AS BIGINT) END AS lns FROM r),
          |ls AS (SELECT dur, d, c, n_risk,
          |   CAST(sum(lns) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)
          |     AS BIGINT) AS lsum FROM tm)
          |SELECT dur AS duration_min, n_risk AS n_at_risk, d AS n_ended,
          | c AS n_censored, round(exp(CAST(lsum AS DOUBLE) / 1e9), 6)
          |   AS survival
          |FROM ls""".stripMargin,

      "q250_markov_stationary" -> (
        """WITH o AS (SELECT user_id, event_type, ts, event_id,
          |   lead(event_type) OVER w AS nxt,
          |   lead(epoch_us(ts::TIMESTAMP)) OVER w
          |     - epoch_us(ts::TIMESTAMP) AS gap_us
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |ed AS (SELECT event_type AS u, nxt AS v,
          |   CAST(count(*) AS BIGINT) AS w
          |  FROM o WHERE nxt IS NOT NULL AND gap_us <= 1800000000
          |  GROUP BY 1, 2),
          |ow AS (SELECT u, CAST(sum(w) AS BIGINT) AS outw FROM ed GROUP BY u),
          |p0 AS (SELECT u AS tok, 1.0 AS pr FROM ow)""".stripMargin +
        prIterCtes(5) +
        """,
          |m AS (SELECT sum(pr) AS mass FROM p5),
          |raw AS (SELECT event_type AS tok, CAST(count(*) AS BIGINT)
          |   AS n_events FROM events GROUP BY 1),
          |rt AS (SELECT CAST(sum(n_events) AS BIGINT) AS tot FROM raw)
          |SELECT p5.tok AS event_type, raw.n_events,
          | round(p5.pr, 6) AS pagerank,
          | round(p5.pr / m.mass, 6) AS steady_share,
          | round(CAST(raw.n_events AS DOUBLE) / rt.tot, 6) AS raw_share
          |FROM p5 JOIN raw ON raw.tok = p5.tok, m, rt""".stripMargin),

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

      "q253_nation_flows" ->
        """WITH li AS (SELECT l_orderkey, l_suppkey,
          |   CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
          |     AS cents FROM lineitem),
          |cn AS (SELECT c.c_custkey, n.n_name AS cust_nation FROM customer c
          |  JOIN nation n ON c.c_nationkey = n.n_nationkey),
          |ords AS (SELECT o.o_orderkey, cn.cust_nation,
          |   CAST(year(o.o_orderdate) AS BIGINT) AS yr
          |  FROM orders o JOIN cn ON o.o_custkey = cn.c_custkey),
          |sn AS (SELECT s.s_suppkey, n.n_name AS supp_nation FROM supplier s
          |  JOIN nation n ON s.s_nationkey = n.n_nationkey)
          |SELECT sn.supp_nation, o.cust_nation, o.yr AS year,
          | CAST(count(*) AS BIGINT) AS n_lines,
          | round(CAST(sum(li.cents) AS DOUBLE) / 100.0, 2) AS revenue
          |FROM li JOIN ords o ON li.l_orderkey = o.o_orderkey
          |JOIN sn ON li.l_suppkey = sn.s_suppkey
          |WHERE sn.supp_nation <> o.cust_nation
          |GROUP BY 1, 2, 3""".stripMargin,

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

      "q255_psi_drift" ->
        """WITH o AS (SELECT
          |   CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
          |     AS ed,
          |   CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
          |b AS (SELECT (min(ed) + max(ed)) // 2 AS cut FROM o),
          |pv AS (SELECT cents,
          |   CAST(sum(CASE WHEN ed <= b.cut THEN 1 ELSE 0 END) AS BIGINT) AS ca,
          |   CAST(count(*) - sum(CASE WHEN ed <= b.cut THEN 1 ELSE 0 END)
          |     AS BIGINT) AS cb
          |  FROM o, b GROUP BY cents),
          |n AS (SELECT CAST(sum(ca) AS BIGINT) AS n1,
          |   CAST(sum(cb) AS BIGINT) AS n2 FROM pv),
          |r AS (SELECT cents,
          |   CAST(sum(ca) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
          |     AS BIGINT) AS ra FROM pv),
          |cuts AS (SELECT i.i, min(r.cents) AS cutv
          |  FROM r, n, (SELECT unnest(range(1, 10)) AS i) i
          |  WHERE r.ra * 10 >= CAST(i.i AS BIGINT) * n.n1 GROUP BY i.i),
          |bv AS (SELECT pv.cents, pv.ca, pv.cb,
          |   CAST(sum(CASE WHEN pv.cents >= cuts.cutv THEN 1 ELSE 0 END)
          |     AS BIGINT) AS bin
          |  FROM pv, cuts GROUP BY 1, 2, 3),
          |bn AS (SELECT bin, CAST(sum(ca) AS BIGINT) AS ra,
          |   CAST(sum(cb) AS BIGINT) AS rb FROM bv GROUP BY bin),
          |sc AS (SELECT bin, ra, rb,
          |   CAST(ra + 1 AS DOUBLE) / CAST(n.n1 + 10 AS DOUBLE) AS pa,
          |   CAST(rb + 1 AS DOUBLE) / CAST(n.n2 + 10 AS DOUBLE) AS pb
          |  FROM bn, n),
          |tp AS (SELECT sum((pb - pa) * ln(pb / pa)) AS psi FROM sc)
          |SELECT sc.bin, sc.ra AS n_ref, sc.rb AS n_cmp,
          | round(sc.pa, 6) AS p_ref, round(sc.pb, 6) AS p_cmp,
          | round((sc.pb - sc.pa) * ln(sc.pb / sc.pa), 6) AS psi_contrib,
          | round(tp.psi, 6) AS psi_total
          |FROM sc, tp""".stripMargin,

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

      "q265_kneser_ney" ->
        s"""WITH toks AS (SELECT string_split(lower(${cleanSql("text")}), ' ')
          |   AS ts FROM documents),
          |bgs AS (SELECT unnest(list_transform(range(1, len(ts)),
          |   i -> ts[i] || ' ' || ts[i + 1])) AS b
          |  FROM toks WHERE len(ts) >= 2),
          |pairs AS (SELECT string_split(b, ' ')[1] AS w1,
          |   string_split(b, ' ')[2] AS w2 FROM bgs),
          |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM pairs
          |  WHERE w1 <> '' AND w2 <> '' GROUP BY 1, 2),
          |ctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw1,
          |   CAST(count(*) AS BIGINT) AS n1_fwd FROM bc GROUP BY 1),
          |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1_rev
          |  FROM bc GROUP BY 1),
          |bt AS (SELECT CAST(count(*) AS BIGINT) AS btypes FROM bc)
          |SELECT bc.w1, bc.w2, bc.c, ctx.cw1, ctx.n1_fwd, cont.n1_rev,
          | round((CAST(bc.c AS DOUBLE) - 0.75) / ctx.cw1 +
          |   (0.75 * ctx.n1_fwd / ctx.cw1) *
          |   (CAST(cont.n1_rev AS DOUBLE) / bt.btypes), 6) AS p_kn
          |FROM bc JOIN ctx ON bc.w1 = ctx.w1
          | JOIN cont ON bc.w2 = cont.w2, bt""".stripMargin,

      "q266_l_diversity" ->
        """WITH qi AS (SELECT c.c_custkey, c.c_mktsegment AS segment,
          |   n.n_name AS nation,
          |   CAST(floor(c.c_acctbal / 1000) AS BIGINT) AS bal_bucket
          |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
          |per AS (SELECT qi.segment, qi.nation, qi.bal_bucket,
          |   o.o_orderpriority AS sens, CAST(count(*) AS BIGINT) AS cnt
          |  FROM orders o JOIN qi ON o.o_custkey = qi.c_custkey
          |  GROUP BY 1, 2, 3, 4)
          |SELECT segment, nation, bal_bucket,
          | CAST(sum(cnt) AS BIGINT) AS n_orders,
          | CAST(count(*) AS BIGINT) AS l_distinct,
          | CAST(max(cnt) AS BIGINT) AS top_sens_n,
          | count(*) >= 3 AS diverse_ok
          |FROM per GROUP BY 1, 2, 3""".stripMargin,

      "q267_kcore" ->
        """WITH RECURSIVE pp AS (SELECT DISTINCT l_orderkey, l_partkey
          |  FROM lineitem),
          |e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
          |  FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
          |   AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |peel(iter, node) AS (
          |  SELECT 0, p1 FROM e UNION SELECT 0, p2 FROM e
          |  UNION ALL
          |  SELECT a.iter + 1, a.node FROM peel a
          |  WHERE a.iter < 24 AND (SELECT count(*) FROM e
          |     WHERE (e.p1 = a.node AND e.p2 IN
          |        (SELECT b.node FROM peel b WHERE b.iter = a.iter))
          |        OR (e.p2 = a.node AND e.p1 IN
          |        (SELECT b.node FROM peel b WHERE b.iter = a.iter))) >= 3),
          |core AS (SELECT node FROM peel WHERE iter = 24)
          |SELECT c.node AS p_partkey,
          | CAST((SELECT count(*) FROM e
          |   WHERE (e.p1 = c.node AND e.p2 IN (SELECT node FROM core))
          |      OR (e.p2 = c.node AND e.p1 IN (SELECT node FROM core)))
          |   AS BIGINT) AS core_degree
          |FROM core c""".stripMargin,

      "q268_overdispersion" ->
        """WITH d AS (SELECT event_type,
          |   CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          |     AS BIGINT) AS ed, CAST(count(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2),
          |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS days,
          |   CAST(sum(n) AS BIGINT) AS s1, CAST(sum(n * n) AS BIGINT) AS s2
          |  FROM d GROUP BY 1)
          |SELECT event_type, days, s1, s2,
          | round(CAST(s1 AS DOUBLE) / days, 4) AS daily_mean,
          | round((s2 - CAST(s1 AS DOUBLE) * s1 / days) / (days - 1), 4)
          |   AS daily_var,
          | round(((s2 - CAST(s1 AS DOUBLE) * s1 / days) / (days - 1))
          |   / (CAST(s1 AS DOUBLE) / days), 4) AS vmr
          |FROM m""".stripMargin,

      "q269_mase_backtest" ->
        """WITH d AS (SELECT event_type,
          |   CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          |     AS BIGINT) AS ed, CAST(count(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2),
          |l1 AS (SELECT a.event_type, CAST(count(*) AS BIGINT) AS days_1,
          |   CAST(sum(abs(a.n - b.n)) AS BIGINT) AS abs_err_1
          |  FROM d a JOIN d b ON a.event_type = b.event_type
          |   AND b.ed = a.ed - 1 GROUP BY 1),
          |l7 AS (SELECT a.event_type, CAST(count(*) AS BIGINT) AS days_7,
          |   CAST(sum(abs(a.n - b.n)) AS BIGINT) AS abs_err_7
          |  FROM d a JOIN d b ON a.event_type = b.event_type
          |   AND b.ed = a.ed - 7 GROUP BY 1)
          |SELECT l1.event_type, l1.days_1, l7.days_7, l1.abs_err_1,
          | l7.abs_err_7,
          | round(CAST(l1.abs_err_1 AS DOUBLE) / l1.days_1, 4) AS mae_naive,
          | round(CAST(l7.abs_err_7 AS DOUBLE) / l7.days_7, 4) AS mae_seasonal,
          | round((CAST(l7.abs_err_7 AS DOUBLE) / l7.days_7)
          |   / (CAST(l1.abs_err_1 AS DOUBLE) / l1.days_1), 4) AS mase
          |FROM l1 JOIN l7 ON l1.event_type = l7.event_type""".stripMargin,

      "q270_t_closeness" ->
        """WITH qi AS (SELECT c.c_custkey, c.c_mktsegment AS segment,
          |   n.n_name AS nation,
          |   CAST(floor(c.c_acctbal / 1000) AS BIGINT) AS bal_bucket
          |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey),
          |per AS (SELECT qi.segment, qi.nation, qi.bal_bucket,
          |   o.o_orderpriority AS sens, CAST(count(*) AS BIGINT) AS cnt
          |  FROM orders o JOIN qi ON o.o_custkey = qi.c_custkey
          |  GROUP BY 1, 2, 3, 4),
          |grp AS (SELECT segment, nation, bal_bucket,
          |   CAST(sum(cnt) AS BIGINT) AS n_g FROM per GROUP BY 1, 2, 3),
          |gs AS (SELECT sens, CAST(sum(cnt) AS BIGINT) AS gcnt
          |  FROM per GROUP BY 1),
          |gc AS (SELECT sens, CAST(sum(gcnt) OVER (ORDER BY sens
          |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS gcum FROM gs),
          |sc AS (SELECT CAST(sum(gcnt) AS BIGINT) AS nn,
          |   CAST(count(*) AS BIGINT) AS k FROM gs),
          |dense AS (SELECT grp.segment, grp.nation, grp.bal_bucket,
          |   grp.n_g, gc.sens, gc.gcum, coalesce(per.cnt, 0) AS cnt
          |  FROM grp CROSS JOIN gc
          |  LEFT JOIN per ON per.segment = grp.segment
          |   AND per.nation = grp.nation AND per.bal_bucket = grp.bal_bucket
          |   AND per.sens = gc.sens),
          |cum AS (SELECT segment, nation, bal_bucket, n_g, gcum,
          |   CAST(sum(cnt) OVER (PARTITION BY segment, nation, bal_bucket
          |     ORDER BY sens ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_g
          |  FROM dense)
          |SELECT segment, nation, bal_bucket, n_g AS n_orders,
          | round(CAST(sum(abs(cum_g * sc.nn - gcum * n_g)) AS DOUBLE)
          |   / (n_g * sc.nn * (sc.k - 1)), 6) AS t_emd,
          | round(CAST(sum(abs(cum_g * sc.nn - gcum * n_g)) AS DOUBLE)
          |   / (n_g * sc.nn * (sc.k - 1)), 6) <= 0.2 AS tclose_ok
          |FROM cum, sc GROUP BY 1, 2, 3, 4, sc.nn, sc.k""".stripMargin,

      "q271_clustering_coeff" ->
        """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          |e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
          |  FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
          |   AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
          |   SELECT p1 AS node FROM e UNION ALL SELECT p2 FROM e)
          |  GROUP BY 1),
          |tri AS (SELECT ab.p1 AS x, ab.p2 AS y, bc.p2 AS z
          |  FROM e ab JOIN e bc ON ab.p2 = bc.p1
          |   JOIN e ac ON ac.p1 = ab.p1 AND ac.p2 = bc.p2),
          |tpn AS (SELECT node, CAST(count(*) AS BIGINT) AS tri FROM (
          |   SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
          |   UNION ALL SELECT z FROM tri) GROUP BY 1)
          |SELECT deg.node AS p_partkey, deg.deg,
          | CAST(coalesce(tpn.tri, 0) AS BIGINT) AS tri,
          | CASE WHEN deg.deg >= 2 THEN
          |   round(coalesce(tpn.tri, 0) * 2.0 / (deg.deg * (deg.deg - 1)), 6)
          |  ELSE 0.0 END AS clustering_coeff
          |FROM deg LEFT JOIN tpn ON deg.node = tpn.node""".stripMargin,

      "q272_brier_decomposition" ->
        s"""WITH q AS (
           |$nbQualitySql
           |),
           |l AS (SELECT least(greatest(
           |    (CAST(round(q.quality_w * 10000) AS BIGINT) + 10000) // 2,
           |    0), 10000) AS fu,
           |   CASE WHEN d.source IN ('src0','src1','src2','src3','src4')
           |        THEN 1 ELSE 0 END AS y
           |  FROM q JOIN documents d USING (doc_id)),
           |fg AS (SELECT fu, CAST(count(*) AS BIGINT) AS n_k,
           |   CAST(sum(y) AS BIGINT) AS s_k FROM l GROUP BY 1),
           |tot AS (SELECT CAST(sum(n_k) AS BIGINT) AS nn,
           |   CAST(sum(s_k) AS BIGINT) AS ss,
           |   CAST(sum(n_k * fu * fu) AS BIGINT) AS m2,
           |   CAST(sum(s_k * fu) AS BIGINT) AS m1 FROM fg),
           |parts AS (SELECT tot.nn, tot.ss, tot.m2, tot.m1,
           |   sum(fg.n_k * pow(fg.fu / 10000.0
           |     - CAST(fg.s_k AS DOUBLE) / fg.n_k, 2)) AS rel_sum,
           |   sum(fg.n_k * pow(CAST(fg.s_k AS DOUBLE) / fg.n_k
           |     - CAST(tot.ss AS DOUBLE) / tot.nn, 2)) AS res_sum
           |  FROM fg, tot GROUP BY 1, 2, 3, 4)
           |SELECT nn AS n_docs,
           | round(CAST(ss AS DOUBLE) / nn, 4) AS pos_rate,
           | round(CAST(m2 - m1 * 20000 + ss * 100000000 AS DOUBLE)
           |   / (CAST(nn AS DOUBLE) * 100000000), 6) AS brier,
           | round(rel_sum / nn, 6) AS reliability,
           | round(res_sum / nn, 6) AS resolution,
           | round((CAST(ss AS DOUBLE) / nn)
           |   * (1.0 - CAST(ss AS DOUBLE) / nn), 6) AS uncertainty
           |FROM parts""".stripMargin,

      "q273_rrf_fusion" ->
        s"""WITH tok AS (SELECT doc_id,
           |   unnest(string_split(lower(${cleanSql("text")}), ' ')) AS token
           |  FROM documents),
           |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
           |  WHERE token <> '' GROUP BY doc_id, token),
           |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
           |  FROM tf GROUP BY doc_id),
           |st AS (SELECT count(*) AS nd, avg(dl) AS avgdl FROM dl),
           |bsc AS (SELECT tf.doc_id,
           |   ln(1.0 + (st.nd - dfq.dfreq + 0.5) / (dfq.dfreq + 0.5))
           |     * tf.tf * (1.2 + 1.0)
           |     / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS s
           |  FROM tf
           |  JOIN (SELECT token, count(*) AS dfreq FROM tf GROUP BY token)
           |   dfq USING (token)
           |  JOIN dl USING (doc_id) CROSS JOIN st
           |  WHERE tf.token IN ('spark', 'vector', 'stream')),
           |bm AS (SELECT doc_id, round(sum(s), 4) AS rel FROM bsc
           |  GROUP BY doc_id),
           |lex AS (SELECT doc_id,
           |   CAST(row_number() OVER (ORDER BY rel DESC, doc_id)
           |     AS BIGINT) AS lex_rank
           |  FROM bm ORDER BY rel DESC, doc_id LIMIT 50),
           |pr AS (SELECT embedding::DOUBLE[] AS q FROM embeddings
           |  WHERE vec_id = 0),
           |cs AS (SELECT e.vec_id AS doc_id,
           |   round(list_sum(list_transform(range(1, 65),
           |      i -> e.embedding[i] * pr.q[i])) /
           |    (sqrt(list_sum(list_transform(range(1, 65),
           |      i -> e.embedding[i] * e.embedding[i]))) *
           |     sqrt(list_sum(list_transform(range(1, 65),
           |      i -> pr.q[i] * pr.q[i])))), 6) AS cos
           |  FROM embeddings e, pr),
           |den AS (SELECT doc_id,
           |   CAST(row_number() OVER (ORDER BY cos DESC, doc_id)
           |     AS BIGINT) AS dense_rank
           |  FROM cs ORDER BY cos DESC, doc_id LIMIT 50),
           |fused AS (SELECT coalesce(lex.doc_id, den.doc_id) AS doc_id,
           |   coalesce(lex.lex_rank, 0) AS lex_rank,
           |   coalesce(den.dense_rank, 0) AS dense_rank,
           |   round((CASE WHEN lex.lex_rank IS NOT NULL
           |      THEN 1.0 / (lex.lex_rank + 60) ELSE 0.0 END) +
           |     (CASE WHEN den.dense_rank IS NOT NULL
           |      THEN 1.0 / (den.dense_rank + 60) ELSE 0.0 END), 6)
           |     AS rrf_score
           |  FROM lex FULL OUTER JOIN den ON lex.doc_id = den.doc_id)
           |SELECT doc_id, lex_rank, dense_rank, rrf_score FROM fused
           |ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin,

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

      "q275_median_ci" ->
        """WITH d AS (SELECT event_type,
          |   CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
          |     AS BIGINT) AS ed, CAST(count(*) AS BIGINT) AS n
          |  FROM events GROUP BY 1, 2),
          |r AS (SELECT event_type, n,
          |   CAST(row_number() OVER (PARTITION BY event_type
          |     ORDER BY n ASC, ed ASC) AS BIGINT) AS rn FROM d),
          |c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS days,
          |   greatest(CAST(floor((count(*) - 1.96 * sqrt(count(*))) / 2)
          |     AS BIGINT), 1) AS rank_lo,
          |   least(CAST(ceil(1.0 + (count(*) + 1.96 * sqrt(count(*))) / 2)
          |     AS BIGINT), CAST(count(*) AS BIGINT)) AS rank_hi,
          |   CAST(ceil(count(*) / 2.0) AS BIGINT) AS rank_med
          |  FROM d GROUP BY 1)
          |SELECT r.event_type, c.days, c.rank_lo, c.rank_hi,
          | CAST(max(CASE WHEN r.rn = c.rank_med THEN r.n END) AS BIGINT)
          |   AS median_daily,
          | CAST(max(CASE WHEN r.rn = c.rank_lo THEN r.n END) AS BIGINT)
          |   AS ci_lo,
          | CAST(max(CASE WHEN r.rn = c.rank_hi THEN r.n END) AS BIGINT)
          |   AS ci_hi
          |FROM r JOIN c ON r.event_type = c.event_type
          |GROUP BY 1, 2, 3, 4""".stripMargin,

      "q276_edge_embeddedness" ->
        """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          |e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
          |  FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
          |   AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |tri AS (SELECT ab.p1 AS x, ab.p2 AS y, bc.p2 AS z
          |  FROM e ab JOIN e bc ON ab.p2 = bc.p1
          |   JOIN e ac ON ac.p1 = ab.p1 AND ac.p2 = bc.p2),
          |pe AS (SELECT p1, p2, CAST(count(*) AS BIGINT) AS emb FROM (
          |   SELECT x AS p1, y AS p2 FROM tri
          |   UNION ALL SELECT y, z FROM tri
          |   UNION ALL SELECT x, z FROM tri) GROUP BY 1, 2),
          |dist AS (SELECT coalesce(pe.emb, 0) AS emb,
          |   CAST(count(*) AS BIGINT) AS n_edges
          |  FROM e LEFT JOIN pe ON e.p1 = pe.p1 AND e.p2 = pe.p2
          |  GROUP BY 1),
          |t AS (SELECT CAST(sum(n_edges) AS BIGINT) AS te FROM dist)
          |SELECT dist.emb AS embeddedness, dist.n_edges,
          | round(CAST(dist.n_edges AS DOUBLE) / t.te, 6) AS edge_share,
          | dist.emb = 0 AS is_local_bridge
          |FROM dist, t""".stripMargin,

      "q277_seasonal_decompose" -> {
        val dowCase = "CASE CAST(ed % 7 AS BIGINT) " + dowLabels.zipWithIndex
          .map { case (l, i) => s"WHEN $i THEN '$l' " }.mkString + "END"
        s"""WITH dd AS (SELECT
           |   CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
           |     AS BIGINT) AS ed, CAST(count(*) AS BIGINT) AS cnt
           |  FROM events GROUP BY 1),
           |trend AS (SELECT a.ed, a.cnt,
           |   CAST(sum(b.cnt) AS BIGINT) AS trend7
           |  FROM dd a JOIN dd b ON b.ed BETWEEN a.ed - 3 AND a.ed + 3
           |  GROUP BY 1, 2 HAVING count(*) = 7),
           |seas AS (SELECT CAST(ed % 7 AS BIGINT) AS dow_i,
           |   CAST(sum(cnt * 7 - trend7) AS BIGINT) AS s_num,
           |   CAST(count(*) AS BIGINT) AS s_den
           |  FROM trend GROUP BY 1)
           |SELECT t.ed, $dowCase AS dow, t.cnt,
           | round(CAST(t.trend7 AS DOUBLE) / 7.0, 4) AS trend,
           | round(CAST(s.s_num AS DOUBLE) / (s.s_den * 7), 4) AS seasonal,
           | round(CAST(t.cnt AS DOUBLE) - CAST(t.trend7 AS DOUBLE) / 7.0
           |   - CAST(s.s_num AS DOUBLE) / (s.s_den * 7), 4) AS residual
           |FROM trend t JOIN seas s ON CAST(t.ed % 7 AS BIGINT) = s.dow_i"""
          .stripMargin
      },

      "q278_fightin_words" ->
        s"""WITH st AS (SELECT source, token,
           |   CAST(count(*) AS BIGINT) AS y_sw FROM (
           |   SELECT source,
           |    unnest(string_split(lower(${cleanSql("text")}), ' ')) AS token
           |   FROM documents) WHERE token <> '' GROUP BY 1, 2),
           |yw AS (SELECT token, CAST(sum(y_sw) AS BIGINT) AS y_w
           |  FROM st GROUP BY 1),
           |ns AS (SELECT source, CAST(sum(y_sw) AS BIGINT) AS n_s
           |  FROM st GROUP BY 1),
           |tot AS (SELECT CAST(sum(y_sw) AS BIGINT) AS nn FROM st),
           |sc AS (SELECT st.source, st.token, st.y_sw,
           |   1000.0 * yw.y_w / tot.nn AS a_w,
           |   yw.y_w, ns.n_s, tot.nn
           |  FROM st JOIN yw USING (token) JOIN ns USING (source), tot),
           |z AS (SELECT source, token, y_sw,
           |   round((ln((y_sw + a_w) / (n_s + 1000.0 - y_sw - a_w))
           |     - ln((y_w - y_sw + a_w)
           |        / (nn - n_s + 1000.0 - (y_w - y_sw) - a_w)))
           |    / sqrt(1.0 / (y_sw + a_w) + 1.0 / (y_w - y_sw + a_w)), 4)
           |    AS z FROM sc)
           |SELECT source, CAST(row_number() OVER (PARTITION BY source
           |   ORDER BY z DESC, token ASC) AS BIGINT) AS rnk,
           | token, y_sw, z FROM z
           |QUALIFY rnk <= 10""".stripMargin,

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

      "q280_discount_elasticity" ->
        """WITH li AS (SELECT p.p_brand,
          |   CAST(round(l.l_discount * 100) AS BIGINT) AS x,
          |   CAST(l.l_quantity AS BIGINT) AS y
          |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
          |m AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
          |   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |   CAST(sum(x * y) AS BIGINT) AS sxy,
          |   CAST(sum(x * x) AS BIGINT) AS sxx,
          |   CAST(sum(y * y) AS BIGINT) AS syy
          |  FROM li GROUP BY 1)
          |SELECT p_brand, n,
          | round(CAST(n * sxy - sx * sy AS DOUBLE)
          |   / (n * sxx - sx * sx), 6) AS slope,
          | round(CAST(n * sxy - sx * sy AS DOUBLE)
          |   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
          |     * (n * syy - sy * sy)), 4) AS r
          |FROM m""".stripMargin,

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

      "q282_bfs_hops" ->
        """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          |e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
          |  FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
          |   AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |und AS (SELECT p1 AS u, p2 AS v FROM e
          |  UNION ALL SELECT p2, p1 FROM e),
          |hub AS (SELECT u AS node FROM und GROUP BY u
          |  ORDER BY count(*) DESC, u ASC LIMIT 1),
          |h0 AS (SELECT node FROM hub),
          |h1 AS (SELECT DISTINCT und.v AS node FROM und
          |  JOIN h0 ON und.u = h0.node
          |  WHERE und.v NOT IN (SELECT node FROM h0)),
          |h2 AS (SELECT DISTINCT und.v AS node FROM und
          |  JOIN h1 ON und.u = h1.node
          |  WHERE und.v NOT IN (SELECT node FROM h0)
          |   AND und.v NOT IN (SELECT node FROM h1)),
          |h3 AS (SELECT DISTINCT und.v AS node FROM und
          |  JOIN h2 ON und.u = h2.node
          |  WHERE und.v NOT IN (SELECT node FROM h0)
          |   AND und.v NOT IN (SELECT node FROM h1)
          |   AND und.v NOT IN (SELECT node FROM h2)),
          |h4 AS (SELECT DISTINCT und.v AS node FROM und
          |  JOIN h3 ON und.u = h3.node
          |  WHERE und.v NOT IN (SELECT node FROM h0)
          |   AND und.v NOT IN (SELECT node FROM h1)
          |   AND und.v NOT IN (SELECT node FROM h2)
          |   AND und.v NOT IN (SELECT node FROM h3)),
          |rings AS (
          | SELECT CAST(0 AS BIGINT) AS hop, CAST(count(*) AS BIGINT)
          |   AS n_nodes FROM h0
          | UNION ALL SELECT 1, CAST(count(*) AS BIGINT) FROM h1
          | UNION ALL SELECT 2, CAST(count(*) AS BIGINT) FROM h2
          | UNION ALL SELECT 3, CAST(count(*) AS BIGINT) FROM h3
          | UNION ALL SELECT 4, CAST(count(*) AS BIGINT) FROM h4),
          |unreach AS (SELECT CAST(-1 AS BIGINT) AS hop,
          |   CAST(count(*) AS BIGINT) AS n_nodes
          |  FROM (SELECT DISTINCT u AS node FROM und) an
          |  WHERE an.node NOT IN (SELECT node FROM h0)
          |   AND an.node NOT IN (SELECT node FROM h1)
          |   AND an.node NOT IN (SELECT node FROM h2)
          |   AND an.node NOT IN (SELECT node FROM h3)
          |   AND an.node NOT IN (SELECT node FROM h4))
          |SELECT hop, n_nodes FROM rings WHERE n_nodes > 0
          |UNION ALL SELECT hop, n_nodes FROM unreach WHERE n_nodes > 0"""
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

      "q284_eb_shrinkage" ->
        """WITH br AS (SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n,
          |   CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
          |     AS BIGINT) AS k
          |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          |  GROUP BY 1),
          |pr AS (SELECT round(sr / b, 10) AS m,
          |   round((srr - sr * sr / b) / (b - 1), 12) AS v FROM (
          |   SELECT count(*) AS b, sum(CAST(k AS DOUBLE) / n) AS sr,
          |    sum((CAST(k AS DOUBLE) / n) * (CAST(k AS DOUBLE) / n)) AS srr
          |   FROM br))
          |SELECT br.p_brand, br.n, br.k,
          | round(CAST(br.k AS DOUBLE) / br.n, 6) AS raw_rate,
          | round((br.k + pr.m * (pr.m * (1.0 - pr.m) / pr.v - 1.0))
          |   / (br.n + (pr.m * (1.0 - pr.m) / pr.v - 1.0)), 6)
          |   AS shrunk_rate
          |FROM br, pr""".stripMargin,

      "q285_oov_drift" ->
        s"""WITH mx AS (SELECT max(doc_id) AS mxid FROM documents),
           |tk AS (SELECT CASE WHEN d.doc_id * 2 <= mx.mxid THEN 'A'
           |    ELSE 'B' END AS epoch, d.source, t.token
           |  FROM (SELECT doc_id, source,
           |     unnest(string_split(lower(${cleanSql("text")}), ' '))
           |       AS token FROM documents) t
           |  JOIN documents d USING (doc_id), mx
           |  WHERE t.token <> ''),
           |vocab AS (SELECT token FROM (
           |   SELECT token, count(*) AS c FROM tk WHERE epoch = 'A'
           |   GROUP BY 1) ORDER BY c DESC, token ASC LIMIT 512),
           |rates AS (SELECT source, epoch,
           |   CAST(count(*) AS BIGINT) AS toks,
           |   CAST(sum(CASE WHEN tk.token IN (SELECT token FROM vocab)
           |     THEN 0 ELSE 1 END) AS BIGINT) AS oovs
           |  FROM tk GROUP BY 1, 2)
           |SELECT a.source, a.toks AS tokens_a, a.oovs AS oov_a,
           | b.toks AS tokens_b, b.oovs AS oov_b,
           | round(CAST(a.oovs AS DOUBLE) / a.toks, 6) AS oov_rate_a,
           | round(CAST(b.oovs AS DOUBLE) / b.toks, 6) AS oov_rate_b,
           | round(CAST(b.oovs AS DOUBLE) / b.toks
           |   - CAST(a.oovs AS DOUBLE) / a.toks, 6) AS oov_drift
           |FROM (SELECT * FROM rates WHERE epoch = 'A') a
           | JOIN (SELECT * FROM rates WHERE epoch = 'B') b
           | USING (source)""".stripMargin,

      "q286_link_prediction" ->
        """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
          |e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
          |  FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey
          |   AND a.l_partkey < b.l_partkey
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |und AS (SELECT p1 AS u, p2 AS v FROM e
          |  UNION ALL SELECT p2, p1 FROM e),
          |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg
          |  FROM und GROUP BY 1),
          |wedges AS (SELECT a.u AS p1, b.v AS p2,
          |   CAST(count(*) AS BIGINT) AS cn
          |  FROM und a JOIN und b ON a.v = b.u AND a.u < b.v
          |  GROUP BY 1, 2),
          |cand AS (SELECT w.* FROM wedges w
          |  LEFT JOIN e ON w.p1 = e.p1 AND w.p2 = e.p2
          |  WHERE e.p1 IS NULL)
          |SELECT c.p1, c.p2, c.cn,
          | round(CAST(c.cn AS DOUBLE) / (d1.deg + d2.deg - c.cn), 6)
          |   AS jaccard
          |FROM cand c JOIN deg d1 ON c.p1 = d1.u
          | JOIN deg d2 ON c.p2 = d2.u
          |ORDER BY jaccard DESC, c.p1 ASC, c.p2 ASC LIMIT 20""".stripMargin,

      "q287_simpson_audit" ->
        """WITH li AS (SELECT p.p_brand, c.c_mktsegment AS segment,
          |   CAST(round(l.l_discount * 100) AS BIGINT) AS x,
          |   CAST(l.l_quantity AS BIGINT) AS y
          |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          |   JOIN orders o ON l.l_orderkey = o.o_orderkey
          |   JOIN customer c ON o.o_custkey = c.c_custkey),
          |seg AS (SELECT p_brand, segment, CAST(count(*) AS BIGINT) AS n,
          |   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |   CAST(sum(x * y) AS BIGINT) AS sxy,
          |   CAST(sum(x * x) AS BIGINT) AS sxx
          |  FROM li GROUP BY 1, 2),
          |sf AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_segments,
          |   CAST(sum(CASE WHEN CAST(n * sxy - sx * sy AS DOUBLE)
          |      / (n * sxx - sx * sx) > 0 THEN 1 ELSE 0 END) AS BIGINT)
          |     AS n_seg_positive
          |  FROM seg GROUP BY 1),
          |gl AS (SELECT p_brand,
          |   round(CAST(sum(n) * sum(sxy) - sum(sx) * sum(sy) AS DOUBLE)
          |     / (sum(n) * sum(sxx) - sum(sx) * sum(sx)), 6)
          |     AS global_slope
          |  FROM seg GROUP BY 1)
          |SELECT gl.p_brand, gl.global_slope, sf.n_segments,
          | sf.n_seg_positive,
          | ((gl.global_slope > 0 AND sf.n_seg_positive * 2 < sf.n_segments)
          |  OR (gl.global_slope < 0
          |   AND sf.n_seg_positive * 2 > sf.n_segments)) AS simpson_flag
          |FROM gl JOIN sf ON gl.p_brand = sf.p_brand""".stripMargin,

      "q288_markov_order_test" ->
        """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us,
          |   event_type,
          |   lag(event_type, 2) OVER w AS prev,
          |   lag(event_type, 1) OVER w AS cur,
          |   epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS g1,
          |   lag(epoch_us(ts), 1) OVER w - lag(epoch_us(ts), 2) OVER w
          |     AS g2
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts),
          |   event_id)),
          |tri AS (SELECT prev, cur, event_type AS next,
          |   CAST(count(*) AS BIGINT) AS o
          |  FROM ev WHERE prev IS NOT NULL AND g1 <= 1800 * 1000000
          |   AND g2 <= 1800 * 1000000
          |  GROUP BY 1, 2, 3),
          |mpc AS (SELECT prev, cur, CAST(sum(o) AS BIGINT) AS t_pc
          |  FROM tri GROUP BY 1, 2),
          |mcn AS (SELECT cur, next, CAST(sum(o) AS BIGINT) AS t_cn
          |  FROM tri GROUP BY 1, 2),
          |mc AS (SELECT cur, CAST(sum(o) AS BIGINT) AS t_c
          |  FROM tri GROUP BY 1)
          |SELECT tri.cur, CAST(count(*) AS BIGINT) AS n_cells,
          | CAST(sum(tri.o) AS BIGINT) AS n_trigrams,
          | round(sum(pow(tri.o - CAST(mpc.t_pc * mcn.t_cn AS DOUBLE)
          |    / mc.t_c, 2)
          |   / (CAST(mpc.t_pc * mcn.t_cn AS DOUBLE) / mc.t_c)), 4)
          |   AS chi_sq
          |FROM tri JOIN mpc ON tri.prev = mpc.prev AND tri.cur = mpc.cur
          | JOIN mcn ON tri.cur = mcn.cur AND tri.next = mcn.next
          | JOIN mc ON tri.cur = mc.cur
          |GROUP BY 1""".stripMargin,

      "q289_direct_adjustment" ->
        """WITH cells AS (SELECT p.p_brand, c.c_mktsegment AS segment,
          |   l.l_discount > 0 AS treated, CAST(count(*) AS BIGINT) AS n,
          |   CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sq
          |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          |   JOIN orders o ON l.l_orderkey = o.o_orderkey
          |   JOIN customer c ON o.o_custkey = c.c_custkey
          |  GROUP BY 1, 2, 3),
          |nt AS (SELECT CAST(sum(n) AS BIGINT) AS n_treated,
          |   CAST(sum(sq) AS BIGINT) AS sq_t FROM cells WHERE treated),
          |nc AS (SELECT CAST(sum(n) AS BIGINT) AS n_control,
          |   CAST(sum(sq) AS BIGINT) AS sq_c FROM cells WHERE NOT treated),
          |st AS (SELECT p_brand, segment, CAST(count(*) AS BIGINT) AS arms,
          |   CAST(sum(n) AS BIGINT) AS n_s,
          |   CAST(sum(CASE WHEN treated THEN sq END) AS BIGINT) AS sq_ts,
          |   CAST(sum(CASE WHEN treated THEN n END) AS BIGINT) AS n_ts,
          |   CAST(sum(CASE WHEN NOT treated THEN sq END) AS BIGINT)
          |     AS sq_cs,
          |   CAST(sum(CASE WHEN NOT treated THEN n END) AS BIGINT) AS n_cs
          |  FROM cells GROUP BY 1, 2 HAVING count(*) = 2),
          |adj AS (SELECT CAST(count(*) AS BIGINT) AS n_strata_used,
          |   CAST(sum(n_s) AS BIGINT) AS w_tot,
          |   sum(n_s * (CAST(sq_ts AS DOUBLE) / n_ts
          |     - CAST(sq_cs AS DOUBLE) / n_cs)) AS wd FROM st)
          |SELECT adj.n_strata_used, nt.n_treated, nc.n_control,
          | round(CAST(nt.sq_t AS DOUBLE) / nt.n_treated
          |   - CAST(nc.sq_c AS DOUBLE) / nc.n_control, 4) AS naive_effect,
          | round(adj.wd / adj.w_tot, 4) AS adjusted_effect,
          | round((CAST(nt.sq_t AS DOUBLE) / nt.n_treated
          |   - CAST(nc.sq_c AS DOUBLE) / nc.n_control)
          |   - adj.wd / adj.w_tot, 4) AS confounding_bias
          |FROM adj, nt, nc""".stripMargin,

      "q290_mix_independence" ->
        """WITH o AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS o
          |  FROM documents GROUP BY 1, 2),
          |rm AS (SELECT source, CAST(sum(o) AS BIGINT) AS r
          |  FROM o GROUP BY 1),
          |cm AS (SELECT lang, CAST(sum(o) AS BIGINT) AS c
          |  FROM o GROUP BY 1),
          |t AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM o)
          |SELECT o.source, rm.r AS n_docs,
          | CAST(count(*) AS BIGINT) AS n_langs,
          | round(sum(pow(o.o - CAST(rm.r * cm.c AS DOUBLE) / t.nn, 2)
          |   / (CAST(rm.r * cm.c AS DOUBLE) / t.nn)), 4) AS chi_sq_contrib
          |FROM o JOIN rm USING (source) JOIN cm USING (lang), t
          |GROUP BY 1, 2""".stripMargin,

      "q291_sprt_replay" ->
        s"""WITH d AS (SELECT
           |   CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
           |     AS BIGINT) AS ed, CAST(count(*) AS BIGINT) AS n,
           |   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           |     AS BIGINT) AS k
           |  FROM events GROUP BY 1),
           |l AS (SELECT ed, n, k,
           |   k * CAST($sprtL1 AS BIGINT)
           |    + (n - k) * CAST($sprtL2 AS BIGINT) AS llr_day FROM d),
           |c AS (SELECT ed, n, k,
           |   CAST(sum(llr_day) OVER (ORDER BY ed ROWS UNBOUNDED PRECEDING)
           |     AS BIGINT) AS cum_llr FROM l)
           |SELECT ed, n, k, round(CAST(cum_llr AS DOUBLE) / 1e9, 6) AS llr,
           | CASE WHEN cum_llr >= $sprtBound THEN 'accept_h1'
           |  WHEN cum_llr <= -$sprtBound THEN 'accept_h0'
           |  ELSE 'continue' END AS decision
           |FROM c""".stripMargin,

      "q292_price_index" ->
        """WITH li AS (SELECT l_partkey,
          |   CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
          |   CAST(l_quantity AS BIGINT) AS q,
          |   CAST(date_diff('day', DATE '1970-01-01', l_shipdate)
          |     AS BIGINT) AS ed FROM lineitem),
          |b AS (SELECT (min(ed) + max(ed)) // 2 AS cut FROM li),
          |pp AS (SELECT l_partkey,
          |   CAST(sum(CASE WHEN ed <= b.cut THEN c END) AS BIGINT) AS v0,
          |   CAST(sum(CASE WHEN ed <= b.cut THEN q END) AS BIGINT) AS q0,
          |   CAST(sum(CASE WHEN ed > b.cut THEN c END) AS BIGINT) AS v1,
          |   CAST(sum(CASE WHEN ed > b.cut THEN q END) AS BIGINT) AS q1
          |  FROM li, b GROUP BY 1
          |  HAVING q0 > 0 AND q1 > 0),
          |s AS (SELECT CAST(count(*) AS BIGINT) AS n_parts_both,
          |   sum(CAST(v1 AS DOUBLE) / q1 * q0) AS l_num,
          |   sum(CAST(v0 AS DOUBLE)) AS l_den,
          |   sum(CAST(v1 AS DOUBLE)) AS p_num,
          |   sum(CAST(v0 AS DOUBLE) / q0 * q1) AS p_den FROM pp)
          |SELECT n_parts_both, round(l_num / l_den, 4) AS laspeyres,
          | round(p_num / p_den, 4) AS paasche,
          | round(sqrt((l_num / l_den) * (p_num / p_den)), 4) AS fisher
          |FROM s""".stripMargin,

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

      "q294_experiment_sizing" ->
        """WITH u AS (SELECT user_id, event_type,
          |   CAST(count(*) AS BIGINT) AS n_ev FROM events GROUP BY 1, 2),
          |t AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
          |  FROM u),
          |r AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_reached
          |  FROM u WHERE n_ev >= 15 GROUP BY 1)
          |SELECT r.event_type, r.n_reached, t.n_users,
          | round(CAST(r.n_reached AS DOUBLE) / t.n_users, 6) AS reach_rate,
          | round((1.959964 + 0.841621) *
          |   sqrt(2.0 * (CAST(r.n_reached AS DOUBLE) / t.n_users)
          |    * (1.0 - CAST(r.n_reached AS DOUBLE) / t.n_users)
          |    / (CAST(t.n_users AS DOUBLE) / 2)), 6) AS mde_abs
          |FROM r, t""".stripMargin,

      "q295_dose_response" ->
        """WITH g AS (SELECT CAST(round(l_discount * 100) AS BIGINT)
          |   AS discount_pct, CAST(count(*) AS BIGINT) AS n,
          |   CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
          |     AS BIGINT) AS k
          |  FROM lineitem GROUP BY 1),
          |w AS (SELECT discount_pct, n, k,
          |   CAST(k AS DOUBLE) / n AS p,
          |   1.959964 * 1.959964 AS z2 FROM g)
          |SELECT discount_pct, n, k, round(p, 6) AS return_rate,
          | round((p + z2 / (n * 2)) / (1.0 + z2 / n)
          |  - (1.959964 * sqrt(p * (1.0 - p) / n
          |     + z2 / (CAST(n AS DOUBLE) * n * 4))) / (1.0 + z2 / n), 6)
          |   AS wilson_lo,
          | round((p + z2 / (n * 2)) / (1.0 + z2 / n)
          |  + (1.959964 * sqrt(p * (1.0 - p) / n
          |     + z2 / (CAST(n AS DOUBLE) * n * 4))) / (1.0 + z2 / n), 6)
          |   AS wilson_hi
          |FROM w""".stripMargin,

      "q296_split_half" ->
        s"""WITH q AS (
           |$nbQualitySql
           |),
           |hx AS (SELECT d.source, md5(CAST(d.doc_id AS VARCHAR)) AS h,
           |   q.quality_w
           |  FROM q JOIN documents d USING (doc_id)),
           |h AS (SELECT source,
           |   (CAST($hexNum13 AS BIGINT) % 2 = 0) AS even,
           |   CAST(count(*) AS BIGINT) AS n,
           |   CAST(sum(CAST(round(quality_w * 10000) AS BIGINT))
           |     AS BIGINT) AS w4
           |  FROM hx GROUP BY 1, 2),
           |m AS (SELECT source, even, (w4 * 1000000) // n AS mean_e4
           |  FROM h),
           |re AS (SELECT source, CAST(rank() OVER (ORDER BY mean_e4 DESC,
           |   source ASC) AS BIGINT) AS rank_even FROM m WHERE even),
           |ro AS (SELECT source, CAST(rank() OVER (ORDER BY mean_e4 DESC,
           |   source ASC) AS BIGINT) AS rank_odd FROM m WHERE NOT even),
           |j AS (SELECT re.source, re.rank_even, ro.rank_odd
           |  FROM re JOIN ro USING (source)),
           |d2 AS (SELECT CAST(count(*) AS BIGINT) AS n_sources,
           |   CAST(sum((rank_even - rank_odd) * (rank_even - rank_odd))
           |     AS BIGINT) AS sum_d2 FROM j)
           |SELECT j.source, j.rank_even, j.rank_odd, d2.n_sources,
           | d2.sum_d2,
           | round(1.0 - d2.sum_d2 * 6.0
           |   / (d2.n_sources * (d2.n_sources * d2.n_sources - 1)), 6)
           |   AS spearman_rho
           |FROM j, d2""".stripMargin,

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

      "q299_forecast_revenue" ->
        """WITH li AS (SELECT l_quantity, l_discount,
          |   CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)
          |     AS dc,
          |   CAST(date_diff('day', DATE '1970-01-01', l_shipdate)
          |     AS BIGINT) AS ed FROM lineitem),
          |mx AS (SELECT max(ed) AS mx FROM li)
          |SELECT CAST(count(*) AS BIGINT) AS n_lines,
          | round(CAST(sum(dc) AS DOUBLE) / 100.0, 2) AS forecast_delta
          |FROM li, mx
          |WHERE li.ed > mx.mx - 365 AND li.l_quantity < 24
          | AND li.l_discount >= 0.05 AND li.l_discount <= 0.07"""
          .stripMargin,

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

      "q218_shuffle_skew" ->
        """WITH r AS (SELECT l_orderkey,
          |   ((strpos('0123456789abcdef',
          |       substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 1)) - 1) * 16
          |    + (strpos('0123456789abcdef',
          |       substring(md5(CAST(l_orderkey AS VARCHAR)), 2, 1)) - 1)) % 32
          |     AS bucket
          |  FROM lineitem),
          |pk AS (SELECT bucket, l_orderkey, CAST(count(*) AS BIGINT) AS c
          |  FROM r GROUP BY 1, 2),
          |pb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_keys,
          |   CAST(sum(c) AS BIGINT) AS n_rows,
          |   CAST(max(c) AS BIGINT) AS max_key_rows
          |  FROM pk GROUP BY bucket),
          |tt AS (SELECT CAST(sum(n_rows) AS BIGINT) AS tot FROM pb)
          |SELECT pb.bucket, pb.n_keys, pb.n_rows, pb.max_key_rows,
          | round(CAST(pb.n_rows AS DOUBLE) * 32 / tt.tot, 4) AS load_factor
          |FROM pb, tt""".stripMargin,

      "q210_pareto_revenue" ->
        """WITH rev AS (SELECT o_custkey,
          |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          |     AS cents
          |  FROM orders GROUP BY o_custkey),
          |c AS (SELECT cents, sum(cents) OVER (ORDER BY cents DESC, o_custkey
          |   ROWS UNBOUNDED PRECEDING) AS cum FROM rev),
          |t AS (SELECT CAST(max(cum) AS BIGINT) AS total,
          |   CAST(count(*) AS BIGINT) AS n_customers FROM c)
          |SELECT t.n_customers,
          | CAST(sum(CASE WHEN (c.cum - c.cents) * 5 < t.total * 4
          |   THEN 1 ELSE 0 END) AS BIGINT) AS n_top80,
          | round(CAST(sum(CASE WHEN (c.cum - c.cents) * 5 < t.total * 4
          |   THEN 1 ELSE 0 END) AS DOUBLE) / t.n_customers, 4)
          |   AS share_of_customers
          |FROM c, t GROUP BY t.n_customers""".stripMargin,

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

      "q212_volume_correlation" ->
        """WITH ev AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events),
          |daily AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS c
          |  FROM ev GROUP BY 1, 2),
          |b AS (SELECT min(day) AS d0,
          |   CAST(date_diff('day', min(day), max(day)) + 1 AS BIGINT) AS nd
          |  FROM ev),
          |days AS (SELECT b.nd, b.d0 + CAST(x.x AS INT) AS day
          |  FROM b, (SELECT unnest(range(0, (SELECT nd FROM b))) AS x) x),
          |sc AS (SELECT t.event_type, d.nd, d.day
          |  FROM days d CROSS JOIN (SELECT DISTINCT event_type FROM ev) t),
          |s AS (SELECT sc.event_type, sc.nd, sc.day, coalesce(daily.c, 0) AS y
          |  FROM sc LEFT JOIN daily
          |    ON daily.event_type = sc.event_type AND daily.day = sc.day),
          |j AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
          |   a.nd, a.y AS x, b.y AS y
          |  FROM s a JOIN s b ON a.day = b.day AND a.event_type < b.event_type),
          |agg AS (SELECT type_a, type_b, nd,
          |   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
          |   CAST(sum(x * y) AS BIGINT) AS sxy,
          |   CAST(sum(x * x) AS BIGINT) AS sxx,
          |   CAST(sum(y * y) AS BIGINT) AS syy
          |  FROM j GROUP BY 1, 2, 3)
          |SELECT type_a, type_b, nd AS n_days,
          | CASE WHEN sqrt(CAST(nd * sxx - sx * sx AS DOUBLE)) *
          |        sqrt(CAST(nd * syy - sy * sy AS DOUBLE)) > 0
          |      THEN round(CAST(nd * sxy - sx * sy AS DOUBLE) /
          |        (sqrt(CAST(nd * sxx - sx * sx AS DOUBLE)) *
          |         sqrt(CAST(nd * syy - sy * sy AS DOUBLE))), 6) END
          |   AS pearson_r
          |FROM agg""".stripMargin,

      "q208_distinct_ngrams" ->
        s"""WITH d AS (SELECT source,
           |   list_filter(string_split(${cleanSql("text")}, ' '),
           |     t -> t <> '') AS toks FROM documents),
           |g AS (
           | SELECT source, 1 AS n, unnest(toks) AS gram FROM d
           |  WHERE len(toks) >= 1
           | UNION ALL
           | SELECT source, 2, unnest(list_transform(range(1, len(toks)),
           |   i -> array_to_string(toks[i:i+1], ' ')))
           |  FROM d WHERE len(toks) >= 2
           | UNION ALL
           | SELECT source, 3, unnest(list_transform(range(1, len(toks) - 1),
           |   i -> array_to_string(toks[i:i+2], ' ')))
           |  FROM d WHERE len(toks) >= 3)
           |SELECT source, CAST(n AS BIGINT) AS n,
           | CAST(count(*) AS BIGINT) AS total_ngrams,
           | CAST(count(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
           | round(CAST(count(DISTINCT gram) AS DOUBLE) / count(*), 4)
           |   AS distinct_ratio
           |FROM g GROUP BY source, n""".stripMargin,

      "q209_session_basket_lift" ->
        """WITH o AS (SELECT user_id, event_id, ts, event_type,
          |   epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP))
          |     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          |  FROM events),
          |sn AS (SELECT *, sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
          |   THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
          |   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_no
          |  FROM o),
          |st AS (SELECT DISTINCT user_id, session_no, event_type FROM sn),
          |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM
          |  (SELECT DISTINCT user_id, session_no FROM st)),
          |si AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_with
          |  FROM st GROUP BY event_type),
          |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
          |   CAST(count(*) AS BIGINT) AS n_both
          |  FROM st a JOIN st b ON a.user_id = b.user_id
          |    AND a.session_no = b.session_no AND a.event_type < b.event_type
          |  GROUP BY 1, 2)
          |SELECT pr.type_a, pr.type_b, pr.n_both,
          | round(CAST(pr.n_both * ns.n_sessions AS DOUBLE) /
          |   (sa.n_with * sb.n_with), 4) AS lift
          |FROM pr JOIN si sa ON sa.event_type = pr.type_a
          |JOIN si sb ON sb.event_type = pr.type_b
          |CROSS JOIN ns""".stripMargin,

      "q207_token_weighted_length" ->
        s"""WITH d AS (SELECT source, ${tokenCountSql("text")} AS n
           |  FROM documents),
           |d2 AS (SELECT source, CAST(n AS BIGINT) AS n FROM d WHERE n > 0),
           |c AS (SELECT source, n,
           |   sum(n) OVER (PARTITION BY source ORDER BY n
           |     ROWS UNBOUNDED PRECEDING) AS cw
           |  FROM d2),
           |w AS (SELECT source, CAST(sum(n) AS BIGINT) AS W FROM d2
           |  GROUP BY source),
           |p50 AS (SELECT c.source, min(c.n) AS w_p50 FROM c JOIN w USING (source)
           |  WHERE c.cw >= ceil(0.5 * w.W) AND c.cw - c.n < ceil(0.5 * w.W)
           |  GROUP BY c.source),
           |p90 AS (SELECT c.source, min(c.n) AS w_p90 FROM c JOIN w USING (source)
           |  WHERE c.cw >= ceil(0.9 * w.W) AND c.cw - c.n < ceil(0.9 * w.W)
           |  GROUP BY c.source),
           |q AS (SELECT source, round(quantile_cont(n, 0.5), 4) AS p50
           |  FROM d2 GROUP BY source)
           |SELECT q.source, q.p50, p50.w_p50, p90.w_p90
           |FROM q JOIN p50 USING (source) JOIN p90 USING (source)""".stripMargin,

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

      "q202_mad_outliers" ->
        """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
          |  FROM events GROUP BY event_type),
          |dev AS (SELECT e.event_type, e.value, med.med,
          |   abs(e.value - med.med) AS adev
          |  FROM events e JOIN med USING (event_type)),
          |mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
          |  FROM dev GROUP BY event_type)
          |SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n,
          | round(any_value(dev.med), 4) AS median,
          | round(any_value(mad.mad), 4) AS mad,
          | CAST(sum(CASE WHEN dev.adev > 3.0 * 1.4826 * mad.mad
          |   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
          | round(CAST(sum(CASE WHEN dev.adev > 3.0 * 1.4826 * mad.mad
          |   THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS outlier_rate
          |FROM dev JOIN mad USING (event_type)
          |GROUP BY dev.event_type""".stripMargin,

      "q200_event_transitions" ->
        """WITH o AS (SELECT user_id, event_type, ts, event_id,
          |   lead(event_type) OVER w AS nxt,
          |   lead(epoch_us(ts::TIMESTAMP)) OVER w
          |     - epoch_us(ts::TIMESTAMP) AS gap_us
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
          |tr AS (SELECT event_type AS cur_type, nxt AS next_type,
          |   CAST(count(*) AS BIGINT) AS n_transitions
          |  FROM o WHERE nxt IS NOT NULL AND gap_us <= 1800000000
          |  GROUP BY 1, 2),
          |tot AS (SELECT cur_type, CAST(sum(n_transitions) AS BIGINT) AS rt
          |  FROM tr GROUP BY cur_type)
          |SELECT tr.cur_type, tr.next_type, tr.n_transitions,
          | round(CAST(tr.n_transitions AS DOUBLE) / tot.rt, 4) AS p
          |FROM tr JOIN tot USING (cur_type)""".stripMargin,

      // all-pairs exact candidate twin of the banded-LSH engine path —
      // recall caveat documented at q159's oracle entry
      "q201_crosssource_leakage" ->
        s"""$shingleCte,
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE ${jaccardSql("a.s", "b.s")} >= 0.7),
           |lab AS (SELECT least(da.source, db.source) AS src_lo,
           |   greatest(da.source, db.source) AS src_hi
           |  FROM pairs JOIN documents da ON da.doc_id = pairs.id_a
           |  JOIN documents db ON db.doc_id = pairs.id_b)
           |SELECT src_lo, src_hi, CAST(count(*) AS BIGINT) AS n_pairs,
           | (src_lo <> src_hi) AS is_cross
           |FROM lab GROUP BY src_lo, src_hi""".stripMargin,

      "q198_editdist_neardup" ->
        s"""WITH d AS (SELECT doc_id, ${cleanSql("text")} AS t FROM documents
           |  WHERE n_chars <= 512),
           |tk AS (SELECT doc_id, t, string_split(t, ' ') AS toks FROM d),
           |b AS (SELECT doc_id, t, md5(array_to_string(toks[1:3], ' ')) AS h
           |  FROM tk WHERE len(toks) >= 3),
           |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |   CAST(levenshtein(a.t, b.t) AS BIGINT) AS edit_dist,
           |   round(1.0 - CAST(levenshtein(a.t, b.t) AS DOUBLE) /
           |     greatest(len(a.t), len(b.t)), 4) AS sim
           |  FROM b a JOIN b b ON a.h = b.h AND a.doc_id < b.doc_id)
           |SELECT id_a, id_b, edit_dist, sim FROM p WHERE sim >= 0.8""".stripMargin,

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

      "q196_embed_mrr" ->
        """WITH q AS (SELECT vec_id AS query_id, CAST(label AS BIGINT) AS qlab,
          |   embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 50),
          |c AS (SELECT vec_id AS corpus_id, CAST(label AS BIGINT) AS clab,
          |   embedding::DOUBLE[] AS cv FROM embeddings),
          |s AS (SELECT query_id, qlab, corpus_id, clab,
          |   list_sum(list_transform(range(1, 65), i -> qv[i] * cv[i])) /
          |   (sqrt(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i]))) *
          |    sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i]))))
          |     AS cos
          |  FROM q, c WHERE corpus_id <> query_id),
          |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
          |   ORDER BY cos DESC, corpus_id ASC) AS rnk FROM s),
          |f AS (SELECT query_id, qlab, CAST(min(rnk) AS BIGINT) AS first_rank
          |  FROM r WHERE qlab = clab GROUP BY 1, 2)
          |SELECT qlab AS label, CAST(count(*) AS BIGINT) AS n_queries,
          | round(avg(1.0 / first_rank), 6) AS mrr,
          | round(avg(CASE WHEN first_rank <= 10 THEN 1.0 ELSE 0.0 END), 4)
          |   AS hit_at_10
          |FROM f GROUP BY qlab""".stripMargin,

      // all-pairs exact candidate twin of the banded-LSH engine path —
      // recall caveat documented at q159's oracle entry
      "q197_neardup_assortativity" ->
        s"""$shingleCte,
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE ${jaccardSql("a.s", "b.s")} >= 0.7),
           |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
           |   SELECT id_a AS id FROM pairs
           |   UNION ALL SELECT id_b FROM pairs) GROUP BY id),
           |sym AS (SELECT da.deg AS x, db.deg AS y FROM pairs
           |   JOIN deg da ON da.id = pairs.id_a JOIN deg db ON db.id = pairs.id_b
           | UNION ALL
           | SELECT db.deg, da.deg FROM pairs
           |   JOIN deg da ON da.id = pairs.id_a JOIN deg db ON db.id = pairs.id_b),
           |m AS (SELECT CAST(count(*) AS BIGINT) AS m,
           |   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           |   CAST(sum(x * y) AS BIGINT) AS sxy,
           |   CAST(sum(x * x) AS BIGINT) AS sxx,
           |   CAST(sum(y * y) AS BIGINT) AS syy FROM sym),
           |n AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
           |   CAST(sum(deg) AS BIGINT) AS sd FROM deg)
           |SELECT m.m // 2 AS n_edges, n.n_nodes,
           | round(CAST(n.sd AS DOUBLE) / n.n_nodes, 4) AS mean_degree,
           | CASE WHEN sqrt(CAST(m.m * m.sxx - m.sx * m.sx AS DOUBLE)) *
           |        sqrt(CAST(m.m * m.syy - m.sy * m.sy AS DOUBLE)) > 0
           |      THEN round(CAST(m.m * m.sxy - m.sx * m.sy AS DOUBLE) /
           |        (sqrt(CAST(m.m * m.sxx - m.sx * m.sx AS DOUBLE)) *
           |         sqrt(CAST(m.m * m.syy - m.sy * m.sy AS DOUBLE))), 6) END
           |   AS assortativity
           |FROM m, n""".stripMargin,

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

      "q195_changepoint" ->
        """WITH ev AS (SELECT CAST(ts AS DATE) AS day FROM events),
          |daily AS (SELECT day, CAST(count(*) AS BIGINT) AS c
          |  FROM ev GROUP BY day),
          |b AS (SELECT min(day) AS d0, CAST(count(*) AS BIGINT) AS total,
          |   CAST(date_diff('day', min(day), max(day)) + 1 AS BIGINT) AS nd
          |  FROM ev),
          |s AS (SELECT b.nd, b.total, CAST(i.i AS BIGINT) AS i,
          |   b.d0 + CAST(i.i - 1 AS INT) AS day
          |  FROM b, (SELECT unnest(range(1, (SELECT nd FROM b) + 1)) AS i) i),
          |f AS (SELECT s.nd, s.total, s.i, s.day, coalesce(daily.c, 0)
          |   AS n_events FROM s LEFT JOIN daily USING (day)),
          |r AS (SELECT *, CAST(sum(n_events) OVER (ORDER BY day
          |   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rt FROM f),
          |n AS (SELECT day, n_events, nd, nd * rt - i * total AS ncusum FROM r),
          |p AS (SELECT max(abs(ncusum)) AS peak FROM n)
          |SELECT n.day, n.n_events,
          | round(CAST(n.ncusum AS DOUBLE) / n.nd, 4) AS cusum,
          | (abs(n.ncusum) = p.peak) AS is_peak
          |FROM n, p""".stripMargin,

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

      "q193_dup_quality_interaction" -> {
        val gopher = TextAnalysis.gopherRulesOracleSql(
          "documents", "doc_id", s"string_split(lower(${cleanSql("text")}), ' ')")
        s"""WITH g AS (
           |$gopher
           |),
           |tk AS (SELECT doc_id, string_split(${cleanSql("text")}, ' ') AS toks
           |  FROM documents),
           |h AS (SELECT doc_id, md5(array_to_string(toks[1:10], ' ')) AS h
           |  FROM tk WHERE len(toks) >= 10),
           |d AS (SELECT h.doc_id, (count(*) OVER (PARTITION BY h.h)) > 1 AS is_dup
           |  FROM h),
           |j AS (SELECT coalesce(d.is_dup, false) AS is_dup, g.passes
           |  FROM g LEFT JOIN d USING (doc_id)),
           |c AS (SELECT
           |  CAST(sum(CASE WHEN is_dup AND passes THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_dup_pass,
           |  CAST(sum(CASE WHEN is_dup AND NOT passes THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_dup_fail,
           |  CAST(sum(CASE WHEN NOT is_dup AND passes THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_uniq_pass,
           |  CAST(sum(CASE WHEN NOT is_dup AND NOT passes THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_uniq_fail
           | FROM j)
           |SELECT n_dup_pass, n_dup_fail, n_uniq_pass, n_uniq_fail,
           | CASE WHEN n_dup_pass + n_dup_fail > 0 THEN
           |   round(CAST(n_dup_pass AS DOUBLE) / (n_dup_pass + n_dup_fail), 4)
           |   END AS pass_rate_dup,
           | CASE WHEN n_uniq_pass + n_uniq_fail > 0 THEN
           |   round(CAST(n_uniq_pass AS DOUBLE) / (n_uniq_pass + n_uniq_fail), 4)
           |   END AS pass_rate_uniq,
           | CASE WHEN n_dup_fail > 0 AND n_uniq_pass > 0
           |      THEN round(CAST(n_dup_pass * n_uniq_fail AS DOUBLE) /
           |        (n_dup_fail * n_uniq_pass), 4) END AS odds_ratio
           |FROM c""".stripMargin
      },

      "q189_length_tail_index" ->
        """WITH r AS (SELECT doc_id, n_chars,
          |   row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
          |  FROM documents),
          |nk AS (SELECT CAST(count(*) AS BIGINT) AS n,
          |   CAST(count(*) * 5 // 100 AS BIGINT) AS k FROM documents),
          |thr AS (SELECT n_chars AS x_k1 FROM r, nk WHERE r.rk = nk.k + 1)
          |SELECT nk.n AS n_docs, nk.k, thr.x_k1,
          | round(avg(ln(CAST(r.n_chars AS DOUBLE) / thr.x_k1)), 4) AS hill_h,
          | round(1.0 / avg(ln(CAST(r.n_chars AS DOUBLE) / thr.x_k1)), 4)
          |   AS tail_alpha
          |FROM r, nk, thr WHERE r.rk <= nk.k
          |GROUP BY nk.n, nk.k, thr.x_k1""".stripMargin,

      "q190_embed_dispersion" ->
        """WITH e AS (SELECT CAST(label AS BIGINT) AS label,
          |   embedding::DOUBLE[] AS v FROM embeddings),
          |u AS (SELECT label, unnest(v) AS x,
          |   generate_subscripts(v, 1) AS pos FROM e),
          |sv AS (SELECT label, pos, round(sum(x), 6) AS sv FROM u GROUP BY 1, 2),
          |s2 AS (SELECT label, round(sum(sv * sv), 6) AS s2 FROM sv GROUP BY label),
          |nq AS (SELECT label, CAST(count(*) AS BIGINT) AS n,
          |   round(sum(list_sum(list_transform(v, x -> x * x))), 6) AS sum_sq
          |  FROM e GROUP BY label)
          |SELECT label, n, round(sqrt(s2) / n, 4) AS centroid_norm,
          | round((s2 - sum_sq) / (n * (n - 1)), 4) AS mean_pairwise_dot
          |FROM s2 JOIN nq USING (label)""".stripMargin,

      "q182_shared_prefix" ->
        s"""WITH d AS (SELECT doc_id, source,
           |   string_split(${cleanSql("text")}, ' ') AS toks FROM documents),
           |p AS (SELECT doc_id, source,
           |   md5(array_to_string(toks[1:10], ' ')) AS prefix_h
           |  FROM d WHERE len(toks) >= 10)
           |SELECT prefix_h, CAST(count(*) AS BIGINT) AS n_docs,
           | CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           | CAST(min(doc_id) AS BIGINT) AS canonical_id
           |FROM p GROUP BY prefix_h HAVING count(*) >= 2""".stripMargin,

      // all-pairs exact candidate twin of the banded-LSH engine path —
      // recall caveat documented at q159's oracle entry; intersection
      // counts from string shingles equal the engine's 64-bit-hash counts
      // under the minhash collision license
      "q183_containment_direction" ->
        s"""$shingleCte,
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |   len(list_intersect(a.s, b.s)) AS i,
           |   len(a.s) AS na, len(b.s) AS nb
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE ${jaccardSql("a.s", "b.s")} >= 0.7)
           |SELECT id_a, id_b,
           | round(CAST(i AS DOUBLE) / na, 6) AS cont_a_in_b,
           | round(CAST(i AS DOUBLE) / nb, 6) AS cont_b_in_a,
           | CASE WHEN round(CAST(i AS DOUBLE) / na, 6) >= 0.95
           |        AND round(CAST(i AS DOUBLE) / nb, 6) >= 0.95 THEN 'mutual'
           |      WHEN round(CAST(i AS DOUBLE) / na, 6) >= 0.95 THEN 'a_in_b'
           |      WHEN round(CAST(i AS DOUBLE) / nb, 6) >= 0.95 THEN 'b_in_a'
           |      ELSE 'partial' END AS relation
           |FROM pairs""".stripMargin,

      "q184_ctx_overflow" ->
        s"""WITH d AS (SELECT source, ${tokenCountSql("text")} AS n FROM documents)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           | CAST(sum(n) AS BIGINT) AS n_tokens,
           | round(avg(CASE WHEN n > 512 THEN 1.0 ELSE 0.0 END), 6) AS share_over_512,
           | round(avg(CASE WHEN n > 2048 THEN 1.0 ELSE 0.0 END), 6) AS share_over_2048,
           | round(avg(CASE WHEN n > 8192 THEN 1.0 ELSE 0.0 END), 6) AS share_over_8192,
           | CAST(sum(greatest(n - 2048, 0)) AS BIGINT) AS tokens_lost_2048,
           | round(CAST(sum(greatest(n - 2048, 0)) AS DOUBLE) / sum(n), 6)
           |   AS loss_share_2048
           |FROM d GROUP BY source""".stripMargin,

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

      "q180_subsample_stability" -> {
        val gopher = TextAnalysis.gopherRulesOracleSql(
          "documents", "doc_id", s"string_split(lower(${cleanSql("text")}), ' ')")
        // 4-nibble positional hex decode of md5(doc_id) (hexNum13 at width 4)
        val hx = "md5(CAST(doc_id AS VARCHAR))"
        val u = (1 to 4).map(i =>
          s"(strpos('0123456789abcdef', substring($hx, $i, 1)) - 1) * ${1 << (4 * (4 - i))}")
          .mkString("(", " + ", ")")
        val arms = Seq(("01pct", 655L), ("10pct", 6553L), ("100pct", 65536L)).map {
          case (label, thr) =>
            s"""SELECT '$label' AS sample, CAST(count(*) AS BIGINT) AS n_docs,
               | round(avg(CASE WHEN passes THEN 1.0 ELSE 0.0 END), 6) AS pass_rate
               |FROM m WHERE u < $thr""".stripMargin
        }.mkString("(", ")\nUNION ALL (", ")")
        s"""WITH g AS (
           |$gopher
           |),
           |m AS (SELECT doc_id, passes, CAST($u AS BIGINT) AS u FROM g),
           |f AS (SELECT avg(CASE WHEN passes THEN 1.0 ELSE 0.0 END) AS fr FROM m),
           |arms AS (
           |$arms
           |)
           |SELECT sample, n_docs, pass_rate, round(abs(pass_rate - f.fr), 6) AS abs_dev
           |FROM arms, f""".stripMargin
      },

      // all-pairs exact twin of the banded-LSH engine path — recall caveat
      // documented at q159's oracle entry
      "q181_cluster_profile" ->
        s"""WITH RECURSIVE ${shingleCte.stripPrefix("WITH ")},
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE ${jaccardSql("a.s", "b.s")} >= 0.7),
           |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs
           |  UNION SELECT id_a, id_a FROM pairs
           |  UNION SELECT id_b, id_b FROM pairs),
           |reach AS (SELECT src, dst FROM e
           |  UNION SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
           |comp AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src),
           |cs AS (SELECT component, CAST(count(*) AS BIGINT) AS csz
           |  FROM comp GROUP BY component),
           |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
           |b AS (SELECT CASE WHEN csz = 2 THEN '2' WHEN csz <= 4 THEN '3-4'
           |   WHEN csz <= 8 THEN '5-8' ELSE '9+' END AS size_band, csz FROM cs)
           |SELECT size_band, CAST(count(*) AS BIGINT) AS n_clusters,
           | CAST(sum(csz) AS BIGINT) AS n_docs,
           | round(CAST(sum(csz) AS DOUBLE) / nn.n, 6) AS corpus_share
           |FROM b, nn GROUP BY size_band, nn.n""".stripMargin,

      "q174_nprobe_sweep" -> {
        def cosSql(a: String, b: String): String =
          s"list_sum(list_transform(range(1,65), i -> $a[i] * $b[i])) / " +
          s"(sqrt(list_sum(list_transform(range(1,65), i -> $a[i] * $a[i]))) * " +
          s"sqrt(list_sum(list_transform(range(1,65), i -> $b[i] * $b[i]))))"
        val arms = Seq(1, 2, 4).map { np =>
          s"""SELECT $np AS n_probe, q.vec_id AS query_id,
             | CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
             | round(coalesce(h.n_hits, 0) / 5.0, 4) AS recall
             |FROM (SELECT vec_id FROM e WHERE vec_id < 8) q LEFT JOIN (
             |  SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_hits FROM (
             |    SELECT s.query_id, s.corpus_id FROM (
             |      SELECT p.query_id, a.vec_id AS corpus_id,
             |        row_number() OVER (PARTITION BY p.query_id
             |          ORDER BY ${cosSql("p.qv", "a.v")} DESC, a.vec_id ASC) AS rnk
             |      FROM (SELECT vec_id AS query_id, v AS qv, cid FROM (
             |         SELECT d.*, row_number() OVER (PARTITION BY vec_id
             |           ORDER BY dot DESC, cid DESC) AS rn
             |         FROM dots d WHERE d.vec_id < 8) WHERE rn <= $np) p
             |      JOIN assign a ON a.cid = p.cid) s
             |    WHERE s.rnk <= 5) t
             |  JOIN exact x ON x.query_id = t.query_id AND x.corpus_id = t.corpus_id
             |  GROUP BY t.query_id) h ON h.query_id = q.vec_id""".stripMargin
        }.mkString("\n", "\nUNION ALL\n", "")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v
           |  FROM e ORDER BY vec_id LIMIT 16),
           |dots AS (SELECT e.vec_id, e.v, c.cid,
           |    list_sum(list_transform(range(1,65), i -> e.v[i] * c.v[i])) AS dot
           |  FROM e CROSS JOIN cent c),
           |assign AS (SELECT vec_id, v, cid FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid DESC) AS rn
           |    FROM dots) WHERE rn = 1),
           |exact AS (SELECT query_id, corpus_id FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
           |      row_number() OVER (PARTITION BY q.vec_id
           |        ORDER BY ${cosSql("q.v", "c.v")} DESC, c.vec_id ASC) AS rn
           |    FROM (SELECT * FROM e WHERE vec_id < 8) q CROSS JOIN e c)
           |  WHERE rn <= 5)
           |$arms""".stripMargin
      },

      "q175_novelty_curve" ->
        s"""$shingleCte,
           |r AS (SELECT doc_id,
           |   CAST(row_number() OVER (ORDER BY doc_id ASC) AS BIGINT) AS rn
           |  FROM documents),
           |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
           |dec AS (SELECT doc_id, (rn - 1) * 10 // n AS decile FROM r, t),
           |gd AS (SELECT DISTINCT dec.decile, u.g FROM
           |   (SELECT doc_id, unnest(s) AS g FROM sh) u JOIN dec USING (doc_id)),
           |f AS (SELECT g, CAST(min(decile) AS BIGINT) AS fd FROM gd GROUP BY g)
           |SELECT decile, CAST(count(*) AS BIGINT) AS n_distinct_grams,
           | CAST(sum(CASE WHEN f.fd = gd.decile THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           | round(CAST(sum(CASE WHEN f.fd = gd.decile THEN 1 ELSE 0 END) AS DOUBLE)
           |   / count(*), 6) AS novelty_share
           |FROM gd JOIN f USING (g) GROUP BY decile""".stripMargin,

      "q176_lsh_tuning" -> {
        // powers by REPEATED SQUARING mirrored from the Spark side — the
        // same fixed multiplication tree, never libm pow
        def powTree(x: String, e: Int): String =
          if (e == 1) x else { val h = powTree(x, e / 2); s"(($h) * ($h))" }
        val arms = Seq((32, 1), (16, 2), (8, 4)).map { case (b, r) =>
          val p = s"1.0 - ${powTree(s"(1.0 - ${powTree("s", r)})", b)}"
          s"""SELECT CAST($b AS BIGINT) AS bands, CAST($r AS BIGINT) AS rows_per_band,
             | CAST(count(*) AS BIGINT) AS n_true_pairs,
             | round(avg($p), 6) AS expected_recall,
             | round(min($p), 6) AS worst_pair_recall
             |FROM ps""".stripMargin
        }.mkString("\n", "\nUNION ALL\n", "")
        s"""WITH RECURSIVE ${shingleCte.stripPrefix("WITH ")},
           |ps AS (SELECT round(${jaccardSql("a.s", "b.s")}, 6) AS s
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE ${jaccardSql("a.s", "b.s")} >= 0.7)
           |$arms""".stripMargin
      },

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

      "q178_length_chisq" ->
        """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
          |r AS (SELECT source,
          |   CAST(row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) AS BIGINT) AS rn
          |  FROM d),
          |t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
          |b AS (SELECT source, (rn - 1) * 10 // n AS bin, n FROM r, t),
          |cont AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS obs,
          |   CAST(max(n) AS BIGINT) AS n FROM b GROUP BY 1, 2),
          |bt AS (SELECT bin, CAST(sum(obs) AS BIGINT) AS bin_total FROM cont GROUP BY bin),
          |st AS (SELECT source, CAST(sum(obs) AS BIGINT) AS n_docs FROM cont GROUP BY source),
          |e AS (SELECT cont.source, st.n_docs,
          |   obs - st.n_docs * CAST(bt.bin_total AS DOUBLE) / cont.n AS d,
          |   st.n_docs * CAST(bt.bin_total AS DOUBLE) / cont.n AS e
          |  FROM cont JOIN bt USING (bin) JOIN st USING (source))
          |SELECT source, n_docs, round(sum(d * d / e), 4) AS chi2,
          | round(sum(d * d / e), 4) > 21.666 AS drifted
          |FROM e GROUP BY 1, 2""".stripMargin,

      "q167_bootstrap_ci" -> {
        val gopher = TextAnalysis.gopherRulesOracleSql(
          "documents", "doc_id", s"string_split(lower(${cleanSql("text")}), ' ')")
        // 13-nibble positional hex decode of the replica hash (hexNum13
        // pattern on an inline expression)
        val hx = "md5(CAST(b AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))"
        val dec = (1 to 13).map(i =>
          s"(strpos('0123456789abcdef', substring($hx, $i, 1)) - 1) * ${1L << (4 * (13 - i))}")
          .mkString("(", " + ", ")")
        s"""WITH g AS (
           |$gopher
           |),
           |l AS (SELECT g.doc_id, d.source,
           |   CASE WHEN g.passes THEN 1.0 ELSE 0.0 END AS y
           |  FROM g JOIN documents d USING (doc_id)),
           |bs AS (SELECT CAST(unnest(range(0, 32)) AS BIGINT) AS b),
           |e AS (SELECT l.source, bs.b, l.y,
           |   CAST($dec AS DOUBLE) / 4503599627370496.0 AS u
           |  FROM l, bs),
           |wgt AS (SELECT source, b, y,
           |   CASE WHEN u < 0.36787944117144233 THEN 0.0
           |        WHEN u < 0.7357588823428847 THEN 1.0
           |        WHEN u < 0.9196986029286058 THEN 2.0
           |        WHEN u < 0.9810118431238462 THEN 3.0
           |        WHEN u < 0.9963401531726563 THEN 4.0
           |        WHEN u < 0.9994058151824183 THEN 5.0
           |        WHEN u < 0.9999167588507119 THEN 6.0
           |        ELSE 7.0 END AS w
           |  FROM e),
           |boot AS (SELECT source, b,
           |   CASE WHEN sum(w) > 0 THEN sum(w * y) / sum(w) END AS rate_b
           |  FROM wgt GROUP BY source, b),
           |ci AS (SELECT source, round(avg(rate_b), 6) AS boot_mean,
           |   round(stddev_samp(rate_b), 6) AS boot_sd,
           |   CAST(count(rate_b) AS BIGINT) AS n_eff_replicas
           |  FROM boot GROUP BY source),
           |pt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |   round(avg(y), 6) AS pass_rate FROM l GROUP BY source)
           |SELECT pt.source, pt.n_docs, pt.pass_rate, ci.boot_mean, ci.boot_sd,
           | round(ci.boot_sd * 1.96, 6) AS ci95_halfwidth, ci.n_eff_replicas
           |FROM pt JOIN ci USING (source)""".stripMargin
      },

      "q166_lexical_richness" ->
        s"""WITH tk AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
           |  FROM (SELECT source,
           |     unnest(string_split(lower(${cleanSql("text")}), ' ')) AS tok
           |    FROM documents)
           |  WHERE tok <> '' GROUP BY source, tok)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_types,
           | CAST(sum(c) AS BIGINT) AS n_tokens,
           | round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS ttr,
           | round(ln(CAST(count(*) AS DOUBLE)) / ln(CAST(sum(c) AS DOUBLE)), 6)
           |   AS herdan_c,
           | round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_tok_share
           |FROM tk GROUP BY source""".stripMargin,

      "q165_hard_negatives" ->
        s"""WITH tok AS (SELECT doc_id,
           |   unnest(string_split(lower(${cleanSql("text")}), ' ')) AS token FROM documents),
           |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
           |  WHERE token <> '' GROUP BY doc_id, token),
           |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
           |st AS (SELECT count(*) AS nd, avg(dl) AS avgdl FROM dl),
           |qt(qid, token) AS (VALUES (1, 'spark'), (1, 'join'), (2, 'vector'),
           |   (2, 'stream'), (3, 'batch'), (3, 'window')),
           |dfq AS (SELECT token, count(*) AS dfreq FROM tf
           |  WHERE token IN (SELECT token FROM qt) GROUP BY token),
           |sc AS (SELECT qt.qid, tf.doc_id,
           |   sum(ln(1.0 + (st.nd - dfq.dfreq + 0.5) / (dfq.dfreq + 0.5))
           |     * tf.tf * 2.2
           |     / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))) AS s,
           |   count(DISTINCT tf.token) AS nm
           |  FROM tf JOIN qt USING (token) JOIN dfq USING (token)
           |  JOIN dl USING (doc_id) CROSS JOIN st
           |  GROUP BY 1, 2),
           |h AS (SELECT qid, doc_id, round(s, 6) AS score,
           |   CAST(row_number() OVER (PARTITION BY qid
           |     ORDER BY round(s, 6) DESC, doc_id ASC) AS BIGINT) AS rnk
           |  FROM sc WHERE nm < 2)
           |SELECT CAST(qid AS BIGINT) AS qid, rnk, doc_id, score
           |FROM h WHERE rnk <= 5""".stripMargin,

      // all-pairs exact twin of a banded-LSH engine path — see the recall
      // caveat at q159's oracle entry (misses a band collision with
      // ≈2e-5 probability per exactly-at-threshold pair)
      "q164_effective_tokens" ->
        s"""WITH RECURSIVE ${shingleCte.stripPrefix("WITH ")},
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE ${jaccardSql("a.s", "b.s")} >= 0.7),
           |e AS (SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs
           |  UNION SELECT id_a, id_a FROM pairs
           |  UNION SELECT id_b, id_b FROM pairs),
           |reach AS (SELECT src, dst FROM e
           |  UNION SELECT r.src, e2.dst FROM reach r JOIN e e2 ON r.dst = e2.src),
           |comp AS (SELECT src AS doc_id, min(dst) AS component FROM reach GROUP BY src),
           |csz AS (SELECT component, CAST(count(*) AS BIGINT) AS csz
           |  FROM comp GROUP BY component),
           |nt AS (SELECT doc_id, source,
           |   ${tokenCountSql("text")} AS n_toks
           |  FROM documents),
           |w AS (SELECT nt.source, nt.n_toks, coalesce(csz.csz, 1) AS csz
           |  FROM nt LEFT JOIN comp USING (doc_id) LEFT JOIN csz USING (component))
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           | CAST(sum(n_toks) AS BIGINT) AS raw_tokens,
           | round(sum(CAST(n_toks AS DOUBLE) / csz), 4) AS effective_tokens,
           | round(1.0 - round(sum(CAST(n_toks AS DOUBLE) / csz), 4)
           |   / sum(n_toks), 6) AS dup_discount
           |FROM w GROUP BY source""".stripMargin,

      "q163_length_winsorize" ->
        s"""WITH d AS (SELECT doc_id, source,
           |   ${tokenCountSql("text")} AS n_tokens
           |  FROM documents),
           |c AS (SELECT source, quantile_cont(n_tokens, 0.9) AS p90
           |  FROM d GROUP BY source)
           |SELECT doc_id, d.source, n_tokens, round(p90, 4) AS cap_p90,
           | CAST(floor(least(CAST(n_tokens AS DOUBLE), p90)) AS BIGINT) AS kept_tokens,
           | CAST(n_tokens AS DOUBLE) > p90 AS truncated
           |FROM d JOIN c USING (source)""".stripMargin,

      "q162_quota_alloc" ->
        """WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          |   CAST(sum(n_chars) AS BIGINT) AS chars FROM documents GROUP BY source),
          |t AS (SELECT CAST(sum(chars) AS BIGINT) AS tc FROM s),
          |i AS (SELECT source, n_docs, chars, 200.0 * chars / t.tc AS ideal,
          |   CAST(floor(200.0 * chars / t.tc) AS BIGINT) AS base,
          |   200.0 * chars / t.tc - floor(200.0 * chars / t.tc) AS rem
          |  FROM s, t),
          |d AS (SELECT 200 - CAST(sum(base) AS BIGINT) AS d FROM i),
          |r AS (SELECT a.source, a.n_docs, a.chars, a.ideal, a.base,
          |   CAST(1 + count(b.source) AS BIGINT) AS rnk
          |  FROM i a LEFT JOIN i b
          |    ON b.rem > a.rem OR (b.rem = a.rem AND b.source < a.source)
          |  GROUP BY 1, 2, 3, 4, 5)
          |SELECT source, n_docs, chars, round(ideal, 6) AS ideal,
          | base + CASE WHEN rnk <= d.d THEN 1 ELSE 0 END AS quota
          |FROM r, d""".stripMargin,

      "q161_vocab_coverage" ->
        s"""WITH tok0 AS (SELECT unnest(string_split(lower(${cleanSql("text")}), ' ')) AS tok
           |  FROM documents),
           |tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
           |  FROM tok0 WHERE tok <> '' GROUP BY tok),
           |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS tt,
           |   CAST(count(*) AS BIGINT) AS v FROM tc),
           |r AS (SELECT tok, cnt,
           |   CAST(row_number() OVER (ORDER BY cnt DESC, tok ASC) AS BIGINT) AS rn,
           |   CAST(sum(cnt) OVER (ORDER BY cnt DESC, tok ASC
           |     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           |  FROM tc)
           |SELECT rn AS vocab_size, tok AS boundary_tok, cum AS covered_tokens,
           | t.tt AS total_tokens, round(CAST(cum AS DOUBLE) / t.tt, 6) AS coverage,
           | t.v AS n_types
           |FROM r, t WHERE (rn & (rn - 1)) = 0""".stripMargin,

      "q160_mask_corruption" ->
        s"""WITH d AS (SELECT doc_id,
           |   string_split(lower(${cleanSql("text")}), ' ') AS toks FROM documents),
           |g AS (SELECT doc_id, len(toks) AS n,
           |   list_transform(range(1, len(toks) + 1),
           |     i -> CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
           |            CAST(i AS VARCHAR)), 1, 2) < '28'
           |          THEN '<mask>' ELSE toks[i] END) AS corr,
           |   list_filter(list_transform(range(1, len(toks) + 1),
           |     i -> CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
           |            CAST(i AS VARCHAR)), 1, 2) < '28'
           |          THEN toks[i] END), x -> x IS NOT NULL) AS tgt
           |  FROM d WHERE len(toks) >= 1)
           |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           | CAST(len(tgt) AS BIGINT) AS n_masked,
           | array_to_string(corr, ' ') AS corrupted,
           | coalesce(array_to_string(tgt, ' '), '') AS targets,
           | round(CAST(len(tgt) AS DOUBLE) / n, 4) AS mask_rate
           |FROM g""".stripMargin,

      // RECALL CAVEAT (shared by q27/q164): the engine generates pairs via
      // 16-band × 2-row minhash LSH + exact-Jaccard verify, while this twin
      // enumerates ALL pairs exactly (the band hash is Spark Murmur3 —
      // not DuckDB-replicable). A true pair AT the 0.7 threshold collides
      // in no band with prob (1 − 0.7²)^16 ≈ 2e-5, so parity could flake
      // on a fixture whose near-threshold pair count is ~5 orders larger
      // than today's (sf0.01: 37 true pairs, all well above threshold).
      // Precision needs no caveat: every emitted pair is exact-verified.
      "q159_leakage_split" ->
        s"""$shingleCte,
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
           |  WHERE ${jaccardSql("a.s", "b.s")} >= 0.7),
           |sym AS (SELECT id_a, id_b FROM pairs
           |  UNION ALL SELECT id_b, id_a FROM pairs),
           |q AS (SELECT DISTINCT id_b AS doc_id FROM sym WHERE id_a % 10 = 7)
           |SELECT d.doc_id,
           | CASE WHEN d.doc_id % 10 = 7 THEN 'test'
           |      WHEN q.doc_id IS NOT NULL THEN 'quarantined'
           |      ELSE 'train' END AS split
           |FROM documents d LEFT JOIN q USING (doc_id)""".stripMargin,

      "q158_centroid_drift" ->
        """WITH e AS (SELECT CAST(label AS BIGINT) AS label, (vec_id % 8 = 0) AS b,
          |   embedding::DOUBLE[] AS v FROM embeddings),
          |pe AS (SELECT label, b, unnest(v) AS x,
          |   unnest(range(1, 65)) AS i FROM e),
          |m AS (SELECT label, i, avg(CASE WHEN b THEN x END) AS a,
          |   avg(CASE WHEN NOT b THEN x END) AS c FROM pe GROUP BY 1, 2),
          |n AS (SELECT label,
          |   CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_batch,
          |   CAST(sum(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_corpus
          |  FROM e GROUP BY label),
          |s AS (SELECT label, sum(a * c) AS sab, sum(a * a) AS saa,
          |   sum(c * c) AS scc FROM m GROUP BY label)
          |SELECT s.label, n.n_batch, n.n_corpus,
          | round(sab / (sqrt(saa) * sqrt(scc)), 6) AS centroid_cos,
          | round(sab / (sqrt(saa) * sqrt(scc)), 6) < 0.999 AS drifted
          |FROM s JOIN n USING (label)
          |WHERE n.n_batch > 0 AND n.n_corpus > 0""".stripMargin,

      "q134_source_authority" -> {
        val base =
          s"""WITH t AS (SELECT source,
             |   string_split(${cleanSql("text")}, ' ') AS toks FROM documents),
             |nn AS (SELECT source, toks, len(toks) AS n FROM t WHERE len(toks) >= 5),
             |wi AS (SELECT source, toks,
             |   unnest(generate_series(0, CAST(n - 5 AS BIGINT))) AS pos FROM nn),
             |sh AS (SELECT DISTINCT source, substring(md5(array_to_string(list_slice(toks,
             |   CAST(pos + 1 AS BIGINT), CAST(pos + 5 AS BIGINT)), ' ')), 1, 16) AS h FROM wi),
             |ix AS (SELECT a.source AS src_a, b.source AS src_b,
             |   CAST(count(*) AS BIGINT) AS inter
             |  FROM sh a JOIN sh b USING (h) WHERE a.source < b.source GROUP BY 1, 2),
             |ed AS (SELECT src_a AS u, src_b AS v, inter AS w FROM ix
             |   UNION ALL SELECT src_b AS u, src_a AS v, inter AS w FROM ix),
             |ow AS (SELECT u, CAST(sum(w) AS BIGINT) AS outw FROM ed GROUP BY u),
             |p0 AS (SELECT u AS tok, CAST(1.0 AS DOUBLE) AS pr FROM ow)""".stripMargin
        base + prIterCtes(5) +
          """,
            |tt AS (SELECT sum(pr) AS tot FROM p5)
            |SELECT tok AS source, round(pr, 6) AS authority,
            | round(pr / tot, 6) AS mix_w
            |FROM p5, tt""".stripMargin
      },

      "q135_margin_mining" -> {
        // LSH-bucket candidate blocking with the SAME plane constants the
        // Spark side uses (q34/q147/q153 twin pattern)
        val planes = graft.functions.VectorExprs.deterministicPlanes(8, 64)
        def planeDot(v: String, p: Seq[Double]): String =
          s"list_sum(list_transform(range(1,65), j -> $v[j] * list_extract(${p.mkString("[", ", ", "]")}, j)))"
        val bucket = planes.zipWithIndex.map { case (p, i) =>
          s"(CASE WHEN ${planeDot("v", p)} >= 0 THEN ${1 << i} ELSE 0 END)"
        }.mkString("\n   + ")
        s"""WITH e AS (SELECT vec_id, v, CAST($bucket AS BIGINT) AS bkt
          |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)),
          |x AS (SELECT vec_id AS x_id, v AS xv, bkt FROM e WHERE vec_id % 2 = 0),
          |y AS (SELECT vec_id AS y_id, v AS yv, bkt FROM e WHERE vec_id % 2 = 1),
          |s AS (SELECT x_id, y_id,
          |   round(list_sum(list_transform(range(1, 65), i -> xv[i] * yv[i])) /
          |   (sqrt(list_sum(list_transform(range(1, 65), i -> xv[i] * xv[i]))) *
          |    sqrt(list_sum(list_transform(range(1, 65), i -> yv[i] * yv[i])))), 6) AS cos
          |  FROM x JOIN y USING (bkt)),
          |f0 AS (SELECT x_id, y_id, cos, row_number() OVER (PARTITION BY x_id
          |     ORDER BY cos DESC, y_id ASC) AS rnf FROM s),
          |f AS (SELECT x_id, avg(cos) AS fwd_avg FROM f0
          |  WHERE rnf <= 4 GROUP BY x_id),
          |b AS (SELECT y_id, avg(cos) AS bwd_avg FROM (
          |   SELECT y_id, cos, row_number() OVER (PARTITION BY y_id
          |     ORDER BY cos DESC, x_id ASC) AS rn FROM s)
          |  WHERE rn <= 4 GROUP BY y_id),
          |m AS (SELECT f0.x_id, f0.y_id,
          |   round(cos / ((fwd_avg + bwd_avg) / 2.0), 6) AS margin
          |  FROM f0 JOIN f USING (x_id) JOIN b USING (y_id)
          |  WHERE rnf <= 4)
          |SELECT x_id, y_id, margin FROM (
          |  SELECT x_id, y_id, margin,
          |   row_number() OVER (PARTITION BY x_id ORDER BY margin DESC, y_id ASC) AS rn
          |  FROM m)
          |WHERE rn = 1 AND margin > 1.02""".stripMargin
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

      "q137_decayed_trend" ->
        """WITH e AS (SELECT event_type, epoch_us(ts::TIMESTAMP) AS us FROM events),
          |m AS (SELECT max(us) AS mx FROM e)
          |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
          | round(sum(exp((us - mx) / 604800000000.0)), 4) AS decayed,
          | round(sum(exp((us - mx) / 604800000000.0)) / count(*), 6) AS recency_ratio
          |FROM e, m GROUP BY event_type""".stripMargin,

      "q138_novelty" ->
        s"""$shingleCte,
           |u AS (SELECT doc_id, unnest(s) AS h FROM sh),
           |f AS (SELECT h, min(doc_id) AS fd FROM u GROUP BY h)
           |SELECT u.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
           | CAST(sum(CASE WHEN f.fd = u.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           | round(CAST(sum(CASE WHEN f.fd = u.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
           |   / count(*), 6) AS novel_share
           |FROM u JOIN f USING (h) GROUP BY u.doc_id""".stripMargin,

      "q139_dup_attribution" ->
        s"""$shingleCte,
           |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    ${jaccardSql("a.s", "b.s")} AS j
           |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
           |kept AS (SELECT id_a, id_b, j FROM pairs WHERE j >= 0.7)
           |SELECT least(da.source, db.source) AS src_a,
           | greatest(da.source, db.source) AS src_b,
           | CAST(count(*) AS BIGINT) AS n_pairs,
           | round(avg(j), 6) AS avg_jaccard
           |FROM kept
           |JOIN documents da ON da.doc_id = kept.id_a
           |JOIN documents db ON db.doc_id = kept.id_b
           |GROUP BY 1, 2""".stripMargin,

      "q141_cdc_chunks" -> {
        val hex4 = (1 to 4).map(i =>
          s"(strpos('0123456789abcdef', substring(md5(tok), $i, 1)) - 1) * ${1L << (4 * (4 - i))}")
          .mkString(" + ")
        s"""WITH tk0 AS (SELECT doc_id, unnest(ts) AS tok, unnest(range(0, len(ts))) AS pos
           |  FROM (SELECT doc_id, string_split(lower(${cleanSql("text")}), ' ') AS ts FROM documents)),
           |tk AS (SELECT doc_id, pos, tok,
           |   CASE WHEN CAST($hex4 AS BIGINT) % 8 = 0 THEN 1 ELSE 0 END AS bnd
           |  FROM tk0 WHERE tok <> ''),
           |cx AS (SELECT doc_id, pos, tok,
           |   coalesce(sum(bnd) OVER (PARTITION BY doc_id ORDER BY pos
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx FROM tk),
           |ch AS (SELECT doc_id, chunk_idx, CAST(count(*) AS BIGINT) AS n_toks,
           |   md5(string_agg(tok, ' ' ORDER BY pos)) AS h FROM cx GROUP BY 1, 2),
           |pd AS (SELECT h, doc_id, CAST(count(*) AS BIGINT) AS c,
           |   CAST(max(n_toks) AS BIGINT) AS nt FROM ch GROUP BY 1, 2)
           |SELECT h AS chunk_h, CAST(max(nt) AS BIGINT) AS n_toks,
           | CAST(sum(c) AS BIGINT) AS n_occurrences,
           | CAST(count(*) AS BIGINT) AS n_docs
           |FROM pd GROUP BY h HAVING sum(c) > 1""".stripMargin
      },

      "q142_stupid_backoff" ->
        s"""WITH d AS (SELECT doc_id, string_split(lower(${cleanSql("text")}), ' ') AS ts FROM documents),
           |un AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
           |   SELECT unnest(ts) AS tok FROM d WHERE doc_id % 5 <> 0)
           |  WHERE tok <> '' GROUP BY tok),
           |sc AS (SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM un),
           |bg AS (SELECT doc_id, unnest(ts[:len(ts)-1]) AS w1, unnest(ts[2:]) AS w2
           |  FROM d WHERE len(ts) >= 2),
           |m2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg
           |  WHERE doc_id % 5 <> 0 GROUP BY 1, 2),
           |m1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg
           |  WHERE doc_id % 5 <> 0 GROUP BY 1),
           |hb AS (SELECT doc_id, w1, w2 FROM bg WHERE doc_id % 5 = 0),
           |j AS (SELECT hb.doc_id,
           |   CASE WHEN m2.c12 IS NOT NULL THEN CAST(m2.c12 AS DOUBLE) / m1.c1
           |        ELSE 0.4 * (coalesce(u2.c, 0) + 1.0) / (sc.n + sc.v) END AS s,
           |   CASE WHEN m2.c12 IS NULL THEN 1.0 ELSE 0.0 END AS bo
           |  FROM hb LEFT JOIN m2 USING (w1, w2) LEFT JOIN m1 USING (w1)
           |  LEFT JOIN un u2 ON u2.tok = hb.w2, sc)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           | round(avg(-ln(s)), 4) AS xent, round(avg(bo), 4) AS backoff_rate
           |FROM j GROUP BY doc_id""".stripMargin,

      "q143_retrieve_rerank" -> {
        val lam = 0.7
        def cosSql(a: String, b: String): String =
          s"""round(list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i])) /
             | (sqrt(list_sum(list_transform(range(1, 65), i -> $a[i] * $a[i]))) *
             |  sqrt(list_sum(list_transform(range(1, 65), i -> $b[i] * $b[i])))), 6)""".stripMargin
        val sb = new StringBuilder
        sb ++= s"""WITH tok AS (SELECT doc_id,
                  |   unnest(string_split(lower(${cleanSql("text")}), ' ')) AS token FROM documents),
                  |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
                  |  WHERE token <> '' GROUP BY doc_id, token),
                  |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
                  |st AS (SELECT count(*) AS nd, avg(dl) AS avgdl FROM dl),
                  |bsc AS (SELECT tf.doc_id,
                  |   ln(1.0 + (st.nd - dfq.dfreq + 0.5) / (dfq.dfreq + 0.5))
                  |     * tf.tf * (1.2 + 1.0)
                  |     / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS s
                  |  FROM tf
                  |  JOIN (SELECT token, count(*) AS dfreq FROM tf GROUP BY token) dfq USING (token)
                  |  JOIN dl USING (doc_id) CROSS JOIN st
                  |  WHERE tf.token IN ('spark', 'vector', 'stream')),
                  |bm AS (SELECT doc_id, round(sum(s), 4) AS rel FROM bsc GROUP BY doc_id),
                  |cand AS (SELECT bm.doc_id, bm.rel, e.embedding::DOUBLE[] AS v
                  |  FROM bm JOIN embeddings e ON e.vec_id = bm.doc_id
                  |  ORDER BY rel DESC, doc_id LIMIT 20),
                  |sims AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  |   ${cosSql("a.v", "b.v")} AS sim
                  |  FROM cand a JOIN cand b ON a.doc_id <> b.doc_id),
                  |s1 AS (SELECT doc_id, rel AS score FROM cand
                  |  ORDER BY rel DESC, doc_id LIMIT 1),
                  |sel1 AS (SELECT doc_id FROM s1),
                  |""".stripMargin
        for (i <- 2 to 5) {
          sb ++= s"""m$i AS (SELECT c.doc_id, $lam * c.rel - ${1 - lam} * max(p.sim) AS score
                    |  FROM cand c JOIN sims p ON p.id_a = c.doc_id
                    |  WHERE p.id_b IN (SELECT doc_id FROM sel${i - 1})
                    |   AND c.doc_id NOT IN (SELECT doc_id FROM sel${i - 1})
                    |  GROUP BY c.doc_id, c.rel),
                    |s$i AS (SELECT doc_id, score FROM m$i
                    |  ORDER BY score DESC, doc_id LIMIT 1),
                    |sel$i AS (SELECT doc_id FROM sel${i - 1} UNION ALL SELECT doc_id FROM s$i),
                    |""".stripMargin
        }
        sb ++= "_t AS (SELECT 1)\n"
        sb ++= (1 to 5).map(i =>
          s"SELECT CAST($i AS BIGINT) AS rnk, doc_id, round(score, 6) AS mmr_score FROM s$i")
          .mkString("", "\nUNION ALL ", "")
        sb.toString
      },

      "q119_ivfpq_recall" ->
        s"""WITH approx AS (
           |$q115Oracle
           |),
           |qq AS (SELECT vec_id AS query_id,
           |   embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 8),
           |cx AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cv FROM embeddings),
           |exact AS (SELECT query_id, corpus_id FROM (
           |   SELECT query_id, corpus_id,
           |    round(list_inner_product(qv, qv) + list_inner_product(cv, cv)
           |     - 2 * list_inner_product(qv, cv), 6) AS d2
           |   FROM qq CROSS JOIN cx)
           |  QUALIFY row_number() OVER (PARTITION BY query_id
           |    ORDER BY d2 ASC, corpus_id ASC) <= 5),
           |hits AS (SELECT e.query_id, count(*) AS n FROM exact e
           |  JOIN approx a ON a.query_id = e.query_id AND a.corpus_id = e.corpus_id
           |  GROUP BY 1)
           |SELECT qq.query_id, CAST(coalesce(n, 0) AS BIGINT) AS n_hits,
           | round(coalesce(n, 0) / 5.0, 4) AS recall
           |FROM qq LEFT JOIN hits USING (query_id)""".stripMargin,

      "q120_residual_pq" -> {
        val asgFull = "(" + graft.operators.KMeansOp.oracleSql(
          "embeddings", "vec_id", "embedding", k = 4, iters = 2, dim = 64) + "\n) ac"
        val cbFull = "(" + graft.operators.KMeansOp.oracleCentroidsSql(
          "embeddings", "vec_id", "embedding", k = 4, iters = 2, dim = 64) + "\n) cc"
        // the residual table: v − its coarse centroid (centroids 6dp-rounded
        // by the Lloyd chain on BOTH engines, subtraction exact)
        val resTable =
          s"""(SELECT ev.vec_id, ac.cluster AS cell,
             |  list_transform(range(1, 65), i -> ev.v[i] - cc.c[i]) AS rv
             | FROM (SELECT vec_id,
             |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |   FROM embeddings) ev
             | JOIN $asgFull ON ac.vec_id = ev.vec_id
             | JOIN $cbFull ON cc.cid = ac.cluster)""".stripMargin
        def sub(m: Int): String = "(" + graft.operators.KMeansOp.oracleSql(
          s"$resTable rt$m", "vec_id",
          s"list_slice(rv, ${m * 16 + 1}, ${m * 16 + 16})",
          k = 4, iters = 2, dim = 16) + s"\n) r$m"
        s"""SELECT r0.vec_id, rc.cell, r0.cluster AS code0, r1.cluster AS code1,
           | r2.cluster AS code2, r3.cluster AS code3,
           | round(r0.sq_dist + r1.sq_dist + r2.sq_dist + r3.sq_dist, 4) AS rpq_err
           |FROM ${sub(0)} JOIN ${sub(1)} USING (vec_id)
           | JOIN ${sub(2)} USING (vec_id) JOIN ${sub(3)} USING (vec_id)
           | JOIN (SELECT ac.vec_id, CAST(ac.cluster AS BIGINT) AS cell
           |   FROM $asgFull) rc USING (vec_id)""".stripMargin
      },

      "q118_mmr_rerank" -> {
        val lam = 0.7
        def cosSql(a: String, b: String): String =
          s"""round(list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i])) /
             | (sqrt(list_sum(list_transform(range(1, 65), i -> $a[i] * $a[i]))) *
             |  sqrt(list_sum(list_transform(range(1, 65), i -> $b[i] * $b[i])))), 6)""".stripMargin
        val sb = new StringBuilder
        sb ++= s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
                  |cand AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                  |   ${cosSql("qv", "(embedding::DOUBLE[])")} AS rel
                  |  FROM embeddings CROSS JOIN q WHERE vec_id <> 0
                  |  ORDER BY rel DESC, vec_id LIMIT 20),
                  |sims AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                  |   ${cosSql("a.v", "b.v")} AS sim
                  |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
                  |s1 AS (SELECT vec_id, rel AS score FROM cand
                  |  ORDER BY rel DESC, vec_id LIMIT 1),
                  |sel1 AS (SELECT vec_id FROM s1),
                  |""".stripMargin
        for (i <- 2 to 5) {
          // the (1 - lam) literal is interpolated from the SAME Scala double
          // the engine-side greedy uses, so the coefficients are bit-equal
          sb ++= s"""m$i AS (SELECT c.vec_id, $lam * c.rel - ${1 - lam} * max(p.sim) AS score
                    |  FROM cand c JOIN sims p ON p.id_a = c.vec_id
                    |  WHERE p.id_b IN (SELECT vec_id FROM sel${i - 1})
                    |   AND c.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
                    |  GROUP BY c.vec_id, c.rel),
                    |s$i AS (SELECT vec_id, score FROM m$i
                    |  ORDER BY score DESC, vec_id LIMIT 1),
                    |sel$i AS (SELECT vec_id FROM sel${i - 1} UNION ALL SELECT vec_id FROM s$i),
                    |""".stripMargin
        }
        sb ++= "_t AS (SELECT 1)\n" // close the WITH list (sel5 is unreferenced)
        sb ++= (1 to 5).map(i =>
          s"SELECT CAST($i AS BIGINT) AS rnk, vec_id, round(score, 6) AS mmr_score FROM s$i")
          .mkString("", "\nUNION ALL ", "")
        sb.toString
      },

      "q117_triplet_mining" ->
        """WITH a AS (SELECT vec_id AS anchor_id, label AS a_label,
          |   embedding::DOUBLE[] AS av FROM embeddings WHERE vec_id < 16),
          |c AS (SELECT vec_id AS cand_id, label AS c_label,
          |   embedding::DOUBLE[] AS cv FROM embeddings),
          |s AS (SELECT anchor_id, cand_id, (c_label = a_label) AS same,
          |   round(list_sum(list_transform(range(1, 65), i -> av[i] * cv[i])) /
          |   (sqrt(list_sum(list_transform(range(1, 65), i -> av[i] * av[i]))) *
          |    sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])))), 6) AS cos
          |  FROM a, c WHERE cand_id <> anchor_id),
          |best AS (SELECT anchor_id, cand_id, same, cos FROM s
          |  QUALIFY row_number() OVER (PARTITION BY anchor_id, same
          |    ORDER BY cos DESC, cand_id ASC) = 1),
          |p AS (SELECT anchor_id, cand_id AS pos_id, cos AS cp FROM best WHERE same),
          |n AS (SELECT anchor_id, cand_id AS neg_id, cos AS cn FROM best WHERE NOT same)
          |SELECT anchor_id, pos_id, neg_id, round(cp, 6) AS cos_pos,
          | round(cn, 6) AS cos_neg, round(cp - cn, 6) AS margin
          |FROM p JOIN n USING (anchor_id)""".stripMargin,

      "q116_tokenizer_fertility" -> {
        val c = cleanSql("text")
        s"""WITH f AS (SELECT lang, length($c) AS nc,
           |  CASE WHEN $c = '' THEN 0 ELSE len(string_split($c, ' ')) END AS nw,
           |  len(regexp_extract_all(coalesce(text, ''), '${TextExprs.BpeTokenRegex}')) AS nb
           | FROM documents)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           | CAST(sum(nc) AS BIGINT) AS n_chars, CAST(sum(nw) AS BIGINT) AS n_words,
           | CAST(sum(nb) AS BIGINT) AS n_bpe,
           | round(sum(nc) / CAST(sum(nb) AS DOUBLE), 4) AS chars_per_bpe,
           | round(sum(nb) / CAST(sum(nw) AS DOUBLE), 4) AS fertility
           |FROM f GROUP BY lang""".stripMargin
      },

      "q113_incremental_dedup" ->
        s"""$shingleCte,
           |pairs AS (SELECT b.doc_id AS batch_id, a.doc_id AS corpus_id,
           |    ${jaccardSql("b.s", "a.s")} AS j
           |  FROM sh b JOIN sh a ON b.doc_id % 10 = 0 AND a.doc_id % 10 <> 0)
           |SELECT batch_id, corpus_id, round(j, 6) AS jaccard
           |FROM pairs WHERE j >= 0.7""".stripMargin,

      "q110_curriculum" ->
        s"""WITH t AS (SELECT doc_id,
           |   unnest(string_split(lower(${cleanSql("text")}), ' ')) AS tok FROM documents),
           |t2 AS (SELECT doc_id, tok FROM t WHERE tok <> ''),
           |f AS (SELECT tok, count(*) AS freq FROM t2 GROUP BY 1),
           |n AS (SELECT count(*) AS total FROM t2),
           |d AS (SELECT doc_id, round(avg(-ln(freq / CAST(total AS DOUBLE))), 6) AS difficulty
           |  FROM t2 JOIN f USING (tok) CROSS JOIN n GROUP BY doc_id)
           |SELECT doc_id, difficulty,
           | CAST(ntile(4) OVER (ORDER BY difficulty, doc_id) AS BIGINT) AS phase
           |FROM d""".stripMargin,

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

      "q112_curation_funnel" ->
        s"""WITH d AS (SELECT doc_id, lang, n_chars,
           |   string_split(lower(${cleanSql("text")}), ' ') AS toks FROM documents
           |  WHERE doc_id % 20 <> 0),
           |grams AS (SELECT doc_id, unnest(list_distinct(list_transform(
           |   range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' ')))) AS gram
           |  FROM d WHERE len(toks) >= 8),
           |bgrams AS (SELECT DISTINCT unnest(list_distinct(list_transform(
           |   range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' ')))) AS gram
           |  FROM (SELECT string_split(lower(${cleanSql("text")}), ' ') AS toks
           |        FROM documents WHERE doc_id % 20 = 0) WHERE len(toks) >= 8),
           |hit AS (SELECT DISTINCT g.doc_id FROM grams g JOIN bgrams USING (gram)),
           |fl AS (SELECT d.doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
           |   (lang = 'en') AS f1, (n_chars >= 100) AS f2,
           |   (len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) >= 0.3) AS f3,
           |   (hit.doc_id IS NULL) AS f4
           |  FROM d LEFT JOIN hit ON d.doc_id = hit.doc_id),
           |one AS (SELECT CAST(count(*) AS BIGINT) AS d0, CAST(sum(n_toks) AS BIGINT) AS t0,
           |   CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
           |   CAST(sum(CASE WHEN f1 THEN n_toks ELSE 0 END) AS BIGINT) AS t1,
           |   CAST(sum(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
           |   CAST(sum(CASE WHEN f1 AND f2 THEN n_toks ELSE 0 END) AS BIGINT) AS t2,
           |   CAST(sum(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
           |   CAST(sum(CASE WHEN f1 AND f2 AND f3 THEN n_toks ELSE 0 END) AS BIGINT) AS t3,
           |   CAST(sum(CASE WHEN f1 AND f2 AND f3 AND f4 THEN 1 ELSE 0 END) AS BIGINT) AS d4,
           |   CAST(sum(CASE WHEN f1 AND f2 AND f3 AND f4 THEN n_toks ELSE 0 END) AS BIGINT) AS t4
           |  FROM fl)
           |SELECT CAST(0 AS BIGINT) AS stage, 'all' AS name, d0 AS docs, t0 AS tokens FROM one
           |UNION ALL SELECT 1, 'lang_en', d1, t1 FROM one
           |UNION ALL SELECT 2, 'min_length', d2, t2 FROM one
           |UNION ALL SELECT 3, 'lexical_diversity', d3, t3 FROM one
           |UNION ALL SELECT 4, 'decontaminated', d4, t4 FROM one""".stripMargin,

      "q102_zipf" ->
        s"""WITH tok AS (SELECT unnest(string_split(${cleanSql("text")}, ' ')) AS tok
           |  FROM documents),
           |f AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY tok),
           |r AS (SELECT freq, CAST(row_number()
           |   OVER (ORDER BY freq DESC, tok ASC) AS BIGINT) AS rnk FROM f)
           |SELECT round(regr_slope(ln(freq), ln(rnk)), 6) AS zipf_slope,
           | round(regr_intercept(ln(freq), ln(rnk)), 6) AS zipf_intercept,
           | CAST(count(*) AS BIGINT) AS n_types,
           | CAST(sum(freq) AS BIGINT) AS n_tokens
           |FROM r""".stripMargin,

      "q97_span_dedup" ->
        s"""WITH t AS (SELECT doc_id,
           |   string_split(${cleanSql("text")}, ' ') AS toks FROM documents),
           |nn AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 30),
           |w AS (SELECT doc_id, n, toks,
           |   unnest(generate_series(0, CAST(n - 30 AS BIGINT))) AS pos FROM nn),
           |h AS (SELECT doc_id, n, md5(array_to_string(list_slice(toks,
           |   CAST(pos + 1 AS BIGINT), CAST(pos + 30 AS BIGINT)), ' ')) AS h FROM w),
           |d AS (SELECT h FROM h GROUP BY h HAVING count(DISTINCT doc_id) >= 2)
           |SELECT doc_id, CAST(n - 29 AS BIGINT) AS n_windows,
           | CAST(count(*) AS BIGINT) AS dup_windows,
           | round(count(*) / CAST(n - 29 AS DOUBLE), 4) AS dup_ratio
           |FROM h JOIN d USING (h)
           |GROUP BY doc_id, n""".stripMargin,

      "q121_curation_pipeline" -> {
        val gopher = "(" + graft.operators.TextAnalysis.gopherRulesOracleSql(
          "(SELECT * FROM documents WHERE doc_id % 20 <> 0) tr",
          "doc_id", s"string_split(lower(${cleanSql("text")}), ' ')") + "\n) gf"
        s"""WITH tok8 AS (SELECT doc_id,
           |   string_split(lower(${cleanSql("text")}), ' ') AS toks FROM documents),
           |grams AS (SELECT doc_id, unnest(list_distinct(list_transform(
           |   range(1, len(toks) - 6), i -> array_to_string(toks[i:i+7], ' ')))) AS gram
           |  FROM tok8 WHERE len(toks) >= 8),
           |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0),
           |hit AS (SELECT DISTINCT g.doc_id FROM grams g JOIN bench USING (gram)
           |  WHERE g.doc_id % 20 <> 0),
           |clean AS (SELECT d.doc_id, d.lang,
           |   CAST(len(string_split(${cleanSql("text")}, ' ')) AS BIGINT) AS n_toks,
           |   ${cleanSql("text")} AS ctext
           |  FROM documents d
           |  JOIN $gopher ON gf.doc_id = d.doc_id AND gf.passes
           |  LEFT JOIN hit ON hit.doc_id = d.doc_id
           |  WHERE d.doc_id % 20 <> 0 AND hit.doc_id IS NULL),
           |csh AS (SELECT doc_id, list_distinct(list_transform(
           |    range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))) AS s
           |  FROM (SELECT doc_id, string_split(ctext, ' ') AS toks FROM clean)
           |  WHERE len(toks) >= 3),
           |dropped AS (SELECT DISTINCT b.doc_id FROM csh a JOIN csh b
           |  ON a.doc_id < b.doc_id
           |  WHERE ${jaccardSql("a.s", "b.s")} >= 0.7),
           |manifest AS (SELECT c.doc_id, c.lang, c.n_toks,
           |   md5(CAST(c.doc_id AS VARCHAR)) AS draw
           |  FROM clean c LEFT JOIN dropped dr ON dr.doc_id = c.doc_id
           |  WHERE dr.doc_id IS NULL),
           |mc AS (SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
           |   CAST(floor(sqrt(count(*))) AS BIGINT) AS w FROM manifest GROUP BY lang),
           |mq AS (SELECT lang,
           |   CAST((200 * w) // (SELECT sum(w) FROM mc) AS BIGINT) AS quota,
           |   CAST(coalesce(sum(cnt) OVER (ORDER BY lang
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |     AS BIGINT) AS prev_cum
           |  FROM mc),
           |samp AS (SELECT m.doc_id, m.lang, m.n_toks, m.draw FROM
           |  (SELECT *, row_number() OVER (PARTITION BY lang
           |     ORDER BY draw, doc_id) AS lrank FROM manifest) m
           |  JOIN mq USING (lang) WHERE m.lrank <= mq.quota)
           |SELECT doc_id, lang, n_toks, CAST(cum AS BIGINT) AS cum_toks,
           | CAST((cum - n_toks) // 2048 AS BIGINT) AS pack_id
           |FROM (SELECT *, sum(n_toks) OVER (ORDER BY draw, doc_id
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM samp)""".stripMargin
      },

      // the same JSON fixture parsed in SQL: JSON object -> MAP entries;
      // the key splits on the reference's '|||' delimiter (answer keeps
      // any further delimiters via the rejoin)
      "q122_cached_api_classify" ->
        s"""WITH raw AS (SELECT content
          |  FROM read_text('$refCachePath')),
          |kv AS (SELECT unnest(map_entries(
          |   content::JSON::MAP(VARCHAR, VARCHAR[]))) AS e FROM raw)
          |SELECT string_split(e.key, '|||')[1] AS industry,
          | string_split(e.key, '|||')[2] AS question,
          | array_to_string(string_split(e.key, '|||')[3:], '|||') AS answer,
          | e.value[1] AS sentiment, e.value[2] AS category
          |FROM kv""".stripMargin,

      "q92_heavy_hitters_grouped" ->
        s"""WITH toks AS (SELECT lang,
           |   unnest(string_split(lower(${cleanSql("text")}), ' ')) AS item
           |  FROM documents),
           |t2 AS (SELECT lang, item FROM toks WHERE item <> ''),
           |sz AS (SELECT lang, count(*) AS n FROM t2 GROUP BY 1)
           |SELECT t2.lang AS lang, item, count(*) AS cnt
           |FROM t2 JOIN sz ON t2.lang = sz.lang
           |GROUP BY 1, 2, sz.n
           |HAVING count(*) * 40 > sz.n""".stripMargin,

      "q91_scalable_percentile" ->
        """SELECT o_orderpriority,
          | round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
          | round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
          | round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
          | round(quantile_cont(o_totalprice, 0.99), 4) AS p99
          |FROM orders GROUP BY o_orderpriority""".stripMargin,

      "q90_scd2" ->
        """WITH marked AS (
          |  SELECT user_id, event_id, ts, event_type,
          |   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          |  FROM events),
          |runs AS (SELECT * FROM marked WHERE prev IS NULL OR prev <> event_type)
          |SELECT user_id, event_type, ts AS valid_from,
          | lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
          |FROM runs""".stripMargin,

      "q89_perplexity" ->
        s"""WITH toks AS (SELECT doc_id,
           |   unnest(string_split(lower(${cleanSql("text")}), ' ')) AS tok
           |  FROM documents),
           |t2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
           |m AS (SELECT tok, count(*) AS c FROM t2 GROUP BY 1),
           |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM m)
           |SELECT t2.doc_id AS doc_id, count(*) AS n_toks,
           | round(avg(-ln(m.c / n.n)), 4) AS xent,
           | round(exp(avg(-ln(m.c / n.n))), 4) AS ppl
           |FROM t2 JOIN m USING (tok) CROSS JOIN n
           |GROUP BY 1""".stripMargin,

      "q88_fuzzy_match" ->
        """SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
          | round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS jw
          |FROM part a JOIN part b
          |  ON a.p_brand = b.p_brand
          |  AND substring(a.p_name, 1, 3) = substring(b.p_name, 1, 3)
          |  AND a.p_partkey < b.p_partkey
          |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.88
          |  AND round(jaro_winkler_similarity(a.p_name, b.p_name), 4) < 1.0""".stripMargin,

      "q85_heavy_hitters" ->
        s"""WITH toks AS (SELECT unnest(string_split(lower(${cleanSql("text")}), ' '))
           |   AS item FROM documents),
           |t2 AS (SELECT item FROM toks WHERE item <> '')
           |SELECT item, count(*) AS cnt FROM t2 GROUP BY 1
           |HAVING count(*) * 50 > (SELECT count(*) FROM t2)""".stripMargin,

      "q86_map_funcs" ->
        """SELECT event_id,
          | 'type,uid,k' AS keys,
          | event_type AS type_val,
          | CAST(3 AS BIGINT) AS n_entries,
          | event_type || '|' || (props->>'$.k') AS non_uid_vals,
          | upper(event_type) || '|' || CAST(user_id AS VARCHAR) || '|'
          |   || (props->>'$.k') AS vals_up
          |FROM events""".stripMargin,

      "q84_latest_event" ->
        """SELECT user_id, ts AS last_ts, event_id AS last_event_id,
          | event_type AS last_type, value AS last_value
          |FROM events
          |QUALIFY row_number() OVER (PARTITION BY user_id
          |  ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

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

      "q82_nfc_normalize" ->
        """WITH p AS (SELECT doc_id,
          |  substring(text, 1, 20) || ' cafe' || chr(769) || ' prec' || chr(807)
          |   || 'o stra' || chr(223) || 'e' AS raw
          | FROM documents)
          |SELECT doc_id, nfc_normalize(raw) AS nfc,
          | CAST(length(raw) AS BIGINT) AS len_raw,
          | CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc
          |FROM p""".stripMargin,
    )
  }
}
