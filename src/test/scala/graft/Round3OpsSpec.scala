package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, GlobalRank, JoinOps, Profiler, Retrieval}
import graft.sources.Tables

/** Round-3 operators: global ranking without single-partition windows,
  * retrieval scoring, dedup clustering, bloom join pruning, profiling. */
class Round3OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- GlobalRank ----

  test("GlobalRank.withRowNumber matches the window row_number under a total order") {
    val orders = Tables.table(spark, sf(), "orders").select("o_orderkey", "o_totalprice")
    val viaOp = GlobalRank.withRowNumber(orders,
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), "rn")
    val viaWindow = orders.withColumn("rn",
      row_number().over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)).cast("long"))
    assert(viaOp.except(viaWindow).count() == 0 && viaWindow.except(viaOp).count() == 0)
  }

  test("GlobalRank.withNtile matches SQL ntile incl. the uneven-remainder split") {
    // 10 rows into 4 buckets: sizes 3,3,2,2 — exercises the remainder path
    val df = (1 to 10).toDF("x")
    val viaOp = GlobalRank.withNtile(df, 4, Seq(col("x").asc), "t")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val viaWindow = df.withColumn("t", ntile(4).over(Window.orderBy("x")).cast("long"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(viaOp == viaWindow)
  }

  test("GlobalRank.withRunningSum matches the global window prefix sum") {
    val orders = Tables.table(spark, sf(), "orders").select("o_orderkey", "o_custkey")
    val viaOp = GlobalRank.withRunningSum(orders,
      Seq(col("o_orderkey").asc), col("o_custkey"), "cum")
    val viaWindow = orders.withColumn("cum",
      sum(col("o_custkey")).over(
        Window.orderBy(col("o_orderkey").asc).rowsBetween(Window.unboundedPreceding, 0)))
    assert(viaOp.except(viaWindow).count() == 0 && viaWindow.except(viaOp).count() == 0)
  }

  test("q93 packing: packs respect the token budget (overflow doc rolls the pack)") {
    val packed = SparkEntry.queries("q93_seq_pack")(spark, sf())
    // within a pack, tokens BEFORE each doc stay under the budget — a pack
    // only exceeds 2048 by its final (overflowing) document
    val bad = packed
      .withColumn("before", col("cum_toks") - col("n_toks"))
      .groupBy("pack_id")
      .agg(min("before").as("start"), max("before").as("last_before"))
      .where(col("last_before") - col("start") >= 2048)
    assert(bad.count() == 0)
    assert(packed.select("pack_id").distinct().count() > 1)
  }

  test("q94 packing with splitting: packs fill EXACTLY to budget; segments reassemble docs") {
    val segs = SparkEntry.queries("q94_seq_pack_split")(spark, sf()).cache()
    val totals = segs.groupBy("pack_id").agg(sum("seg_toks").as("t")).collect()
    val lastPack = totals.map(_.getLong(0)).max
    assert(totals.forall(_.getLong(1) <= 2048L), "no pack may exceed the budget")
    assert(totals.filter(_.getLong(0) != lastPack).forall(_.getLong(1) == 2048L),
      "every non-trailing pack is filled exactly (that is what splitting buys)")
    // each doc's segments cover it: contiguous offsets, sum == token count
    val docs = spark.read.parquet(sf() + "/documents.parquet").select(col("doc_id"),
      size(split(graft.functions.TextExprs.cleanText(col("text")), " "))
        .cast("long").as("n_toks"))
    val bad = segs.groupBy("doc_id")
      .agg(sum("seg_toks").as("covered"), min("tok_offset").as("off0"),
        count(lit(1)).as("nseg"), max(col("seg_idx")).as("maxseg"))
      .join(docs, "doc_id")
      .where(col("covered") =!= col("n_toks") || col("off0") =!= 0L
        || col("maxseg") =!= col("nseg") - 1)
    assert(bad.count() == 0, "segments must exactly tile each document")
    segs.unpersist()
  }

  test("q95 chunking: stride-64/48 windows tile every doc; plan has zero exchanges") {
    val chunks = SparkEntry.queries("q95_chunk")(spark, sf()).cache()
    val docs = spark.read.parquet(sf() + "/documents.parquet").select(col("doc_id"),
      size(split(graft.functions.TextExprs.cleanText(col("text")), " "))
        .cast("long").as("n_toks"))
    // every chunk: start a multiple of 48, len = min(64, n - start); per
    // doc: first start 0, last chunk reaches exactly n
    val bad = chunks.join(docs, "doc_id")
      .where(col("tok_start") % 48 =!= 0
        || col("chunk_toks") =!= least(lit(64L), col("n_toks") - col("tok_start")))
    assert(bad.count() == 0)
    val perDoc = chunks.groupBy("doc_id")
      .agg(min("tok_start").as("first"),
        max(col("tok_start") + col("chunk_toks")).as("reach"),
        count(lit(1)).as("nchunks"))
      .join(docs, "doc_id")
    assert(perDoc.where(col("first") =!= 0 || col("reach") =!= col("n_toks")).count() == 0,
      "chunks must start at 0 and reach exactly the doc's last token")
    // the operator is per-doc narrow work: no shuffle may appear
    val p = SparkEntry.queries("q95_chunk")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking must plan zero exchanges:\n${p.take(600)}")
    chunks.unpersist()
  }

  test("q96 temperature mix: sqrt-weighted quotas, draw-minimal selection, contiguous ranks") {
    val out = SparkEntry.queries("q96_temperature_mix")(spark, sf()).cache()
    val docs = Tables.table(spark, sf(), "documents")
      .select(col("doc_id"), col("lang"), md5(col("doc_id").cast("string")).as("draw"))
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // recompute the quota contract independently: w = floor(sqrt(cnt)),
    // quota = 200*w DIV sum(w) — pure integer arithmetic
    val w = counts.map { case (l, c) => l -> math.floor(math.sqrt(c.toDouble)).toLong }
    val wsum = w.values.sum
    val quota = w.map { case (l, x) => l -> 200L * x / wsum }
    val got = out.groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == quota.filter(_._2 > 0L), s"per-language take must equal the quota: $got vs $quota")
    // the take is the quota SMALLEST md5 draws per language: every selected
    // draw sorts strictly below every unselected draw of the same language
    val selMax = out.join(docs, Seq("doc_id", "lang")).groupBy("lang").agg(max("draw").as("mx"))
    val unselMin = docs.join(out.select("doc_id"), Seq("doc_id"), "left_anti")
      .groupBy("lang").agg(min("draw").as("mn"))
    assert(selMax.join(unselMin, "lang").where(col("mx") >= col("mn")).count() == 0,
      "selection must be the per-language md5-minimal prefix")
    // temperature property: the dominant language's acceptance rate sits
    // strictly below the rarest language's (integer cross-multiplication)
    val (big, bigC) = counts.maxBy(_._2)
    val (small, smallC) = counts.minBy(_._2)
    assert(quota(big) * smallC < quota(small) * bigC,
      s"T=2 must downsample '$big' relative to '$small'")
    // lrank is contiguous 1..take within each language
    assert(out.groupBy("lang")
      .agg(min("lrank").as("lo"), max("lrank").as("hi"), count(lit(1)).as("n"))
      .where(col("lo") =!= 1L || col("hi") =!= col("n")).count() == 0,
      "lrank must be the contiguous per-language prefix 1..quota")
    out.unpersist()
  }

  test("GlobalRank.withNtile with fewer rows than buckets gives one row per leading bucket") {
    val out = GlobalRank.withNtile((1 to 3).toDF("x"), 5, Seq(col("x").asc), "t")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 1L, 2 -> 2L, 3 -> 3L))
  }

  test("GlobalRank leaves no persisted RDD footprint after the action") {
    // the rank/prefix-sum dataflows deliberately do NOT persist the sorted
    // stream (shuffle-stage reuse pins the partitioning) — consecutive rank
    // queries in a long-lived session must not stack persisted footprints
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val orders = Tables.table(spark, sf(), "orders").select("o_orderkey", "o_totalprice")
    GlobalRank.withRowNumber(orders,
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), "rn").count()
    GlobalRank.withRunningSum(orders,
      Seq(col("o_orderkey").asc), col("o_totalprice"), "cum").count()
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.isEmpty, s"GlobalRank persisted RDDs it never released: $added")
  }

  test("GlobalRank plans no Window operator") {
    val orders = Tables.table(spark, sf(), "orders").select("o_orderkey", "o_totalprice")
    val plan = GlobalRank.withNtile(orders, 4,
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window in:\n$plan")
  }

  // ---- connected components ----

  test("connectedComponents labels a chain and a separate pair correctly") {
    // chain 1-2-3-4 (diameter 3) + pair 10-11 + triangle 20-21-22
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  // ---- bloom pruning ----

  test("bloomPrune keeps every true match: pruned join == plain join") {
    val hot = Tables.table(spark, sf(), "orders")
      .where(col("o_totalprice") > 300000).select("o_orderkey")
    val li = Tables.table(spark, sf(), "lineitem")
    val pruned = JoinOps.bloomPrune(li, col("l_orderkey"), hot, "o_orderkey")
      .join(hot, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber")
    val plain = li.join(hot, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber")
    assert(pruned.except(plain).count() == 0 && plain.except(pruned).count() == 0)
    assert(pruned.count() == plain.count())
  }

  // ---- retrieval ----

  test("tfidfTopK scores: rare terms outrank common ones; k bounds per-doc rows") {
    val docs = Seq((1L, "apple banana banana"), (2L, "apple cherry"),
      (3L, "apple date")).toDF("id", "txt")
    val out = Retrieval.tfidfTopK(docs, col("id"), col("txt"), 2)
    val byDoc = out.collect().groupBy(_.getLong(0))
    assert(byDoc.values.forall(_.length <= 2))
    // doc 1: banana (tf=2, df=1) must beat apple (tf=1, df=3)
    val d1 = byDoc(1L).sortBy(_.getLong(3)).map(_.getString(1)).toSeq
    assert(d1 == Seq("banana", "apple"))
    // idf of apple = ln(4/4) = 0 → apple scores exactly 0 everywhere
    val appleScores = out.where(col("token") === "apple").select("score")
      .collect().map(_.getDouble(0)).toSet
    assert(appleScores == Set(0.0))
  }

  test("bm25: more query-term mass scores higher; non-matching docs absent") {
    val docs = Seq((1L, "spark spark spark fast"), (2L, "spark slow"),
      (3L, "nothing here")).toDF("id", "txt")
    val out = Retrieval.bm25(docs, col("id"), col("txt"), Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) > out(2L))
  }

  // ---- profiler ----

  test("Profiler counts nulls/distincts and min/max per kind") {
    val df = Seq((Some(1L), Some("b")), (Some(1L), None), (None, Some("a")))
      .toDF("k", "s")
    val rows = Profiler.profile(df, Seq("k" -> Profiler.Num, "s" -> Profiler.Str))
      .collect().map(r => r.getString(0) -> r).toMap
    val k = rows("k"); val s = rows("s")
    assert(k.getLong(1) == 1L && k.getLong(2) == 1L) // one null, one distinct
    assert(k.getDouble(3) == 1.0 && k.getDouble(4) == 1.0)
    assert(k.isNullAt(5) && k.isNullAt(6))           // no string stats for Num
    assert(s.getLong(1) == 1L && s.getLong(2) == 2L)
    assert(s.isNullAt(3) && s.isNullAt(4))
    assert(s.getString(5) == "a" && s.getString(6) == "b")
  }

  // ---- cluster query end-to-end invariants ----

  test("q53 clusters are consistent with q27 pairs: every pair lands in one cluster") {
    val pairs = SparkEntry.queries("q27_minhash_neardup")(spark, sf())
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = SparkEntry.queries("q53_dedup_clusters")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // every cluster id is the minimum member id
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
    }
  }

  // ---- round-9 curation queries: analytic invariants ----

  test("q105 DSIR: English docs score higher than non-English on average") {
    // the target model IS the English slice, so importance weights must
    // separate the slices — the operator's whole point
    val docs = Tables.table(spark, sf(), "documents").select("doc_id", "lang")
    val w = SparkEntry.queries("q105_dsir")(spark, sf()).join(docs, "doc_id")
    val Array(other, en) = w
      .groupBy(col("lang") === "en").agg(avg("dsir_w").as("m"))
      .orderBy(col("lang") === "en").collect().map(_.getDouble(1))
    assert(en > other, s"mean weight en=$en must exceed non-en=$other")
  }

  test("q107 weighted sample: exactly k rows, keys non-positive and descending") {
    val rows = SparkEntry.queries("q107_weighted_sample")(spark, sf()).collect()
    assert(rows.length == 200)
    val keys = rows.map(_.getDouble(2))
    assert(keys.forall(_ <= 0.0), "ln(u)/w with u in (0,1] must be <= 0")
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b }, "must arrive sorted")
  }

  test("q108 source overlap: jaccard in (0,1], pairs ordered, symmetric-free") {
    val rows = SparkEntry.queries("q108_source_overlap")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pairs must be ordered src_a < src_b")
      val j = r.getDouble(3)
      assert(j > 0.0 && j <= 1.0, s"jaccard $j out of range")
    }
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == rows.length)
  }

  test("q110 curriculum: four balanced phases, difficulty non-decreasing across them") {
    val rows = SparkEntry.queries("q110_curriculum")(spark, sf()).collect()
    val byPhase = rows.groupBy(_.getLong(2))
    assert(byPhase.keySet == Set(1L, 2L, 3L, 4L))
    val sizes = byPhase.view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"ntile sizes must differ by <= 1: $sizes")
    val maxByPhase = (1L to 4L).map(p => byPhase(p).map(_.getDouble(1)).max)
    val minByPhase = (1L to 4L).map(p => byPhase(p).map(_.getDouble(1)).min)
    (0 until 3).foreach { i =>
      assert(maxByPhase(i) <= minByPhase(i + 1),
        s"phase ${i + 1} must be uniformly easier than phase ${i + 2}")
    }
  }

  test("q111 PQ: codes in [0,4), error strictly positive, one row per vector") {
    val rows = SparkEntry.queries("q111_product_quant")(spark, sf()).collect()
    val n = Tables.table(spark, sf(), "embeddings").count()
    assert(rows.length == n)
    rows.foreach { r =>
      (1 to 4).foreach { c =>
        val code = r.getLong(c)
        assert(code >= 0 && code < 4, s"code $code out of codebook range")
      }
      assert(r.getDouble(5) >= 0.0)
    }
  }

  test("q112 funnel: doc and token counts are monotonically non-increasing") {
    val rows = SparkEntry.queries("q112_curation_funnel")(spark, sf())
      .orderBy("stage").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("all", "lang_en", "min_length", "lexical_diversity", "decontaminated"))
    val docs = rows.map(_.getLong(2)); val toks = rows.map(_.getLong(3))
    docs.zip(docs.tail).foreach { case (a, b) => assert(a >= b, "docs must shrink") }
    toks.zip(toks.tail).foreach { case (a, b) => assert(a >= b, "tokens must shrink") }
    assert(docs.head > docs.last, "the funnel must actually filter something")
  }

  test("q114 PQ ADC search: 5 hits per query, each query's own vector ranks first") {
    val rows = SparkEntry.queries("q114_pq_adc_search")(spark, sf()).collect()
    assert(rows.length == 8 * 5)
    rows.filter(_.getLong(3) == 1L).foreach { r =>
      assert(r.getLong(0) == r.getLong(1),
        s"query ${r.getLong(0)}'s nearest ADC code must be its own (got ${r.getLong(1)})")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 2.0,
        s"self-ADC must be the (small) quantization error, got ${r.getDouble(2)}")
    }
  }

  test("q115 IVFPQ: candidates come only from probed cells; top-1 matches full-ADC") {
    // a query's own cell is by definition its nearest, so its own vector is
    // always a candidate and must win; and within the probed subset the
    // ADC ordering must agree with q114's full-scan ADC
    val ivf = SparkEntry.queries("q115_ivfpq_search")(spark, sf()).collect()
    assert(ivf.length == 8 * 5)
    val full = SparkEntry.queries("q114_pq_adc_search")(spark, sf())
      .where(col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ivf.filter(_.getLong(3) == 1L).foreach { r =>
      assert(r.getLong(1) == full(r.getLong(0)),
        s"IVFPQ top-1 for query ${r.getLong(0)} must match the full ADC scan")
    }
  }

  test("q116 fertility: totals conserve the corpus; ratios consistent with sums") {
    val rows = SparkEntry.queries("q116_tokenizer_fertility")(spark, sf()).collect()
    val docs = Tables.table(spark, sf(), "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count(), "per-lang doc counts must conserve")
    rows.foreach { r =>
      val (nc, nw, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nb >= nw, s"BPE-proxy tokens can only split words further: $r")
      assert(math.abs(r.getDouble(5) - nc.toDouble / nb) < 1e-4, s"chars_per_bpe: $r")
      assert(math.abs(r.getDouble(6) - nb.toDouble / nw) < 1e-4, s"fertility: $r")
      assert(r.getDouble(6) >= 1.0, s"fertility is >= 1 by construction: $r")
    }
  }

  test("q117 triplets: one per anchor, positive shares the label, negative does not") {
    val labels = Tables.table(spark, sf(), "embeddings")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val rows = SparkEntry.queries("q117_triplet_mining")(spark, sf()).collect()
    assert(rows.length == 16)
    assert(rows.map(_.getLong(0)).distinct.length == 16)
    rows.foreach { r =>
      val (a, p, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(p != a && n != a)
      assert(labels(p) == labels(a), s"positive must share the anchor label: $r")
      assert(labels(n) != labels(a), s"negative must differ in label: $r")
      // margin may be negative (a hard negative closer than the positive is
      // exactly what mining surfaces) but must be consistent with the cosines
      assert(math.abs(r.getDouble(5) - (r.getDouble(3) - r.getDouble(4))) < 2e-6, s"margin: $r")
    }
  }

  test("q109 quantization: error bounded by half an int8 step per dimension") {
    // affine SQ8: |x - dequant(quant(x))| <= (hi - lo) / (2 * 255) for the
    // widest dimension — the bound that makes int8 codes usable for ANN
    val e = Tables.table(spark, sf(), "embeddings")
      .select(posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "x")))
    val maxSpan = e.groupBy("pos").agg((max("x") - min("x")).as("span"))
      .agg(max("span")).collect()(0).getDouble(0)
    val rows = SparkEntry.queries("q109_embed_quantize")(spark, sf()).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val maxErr = r.getDouble(3)
      assert(maxErr <= maxSpan / 510.0 + 1e-9,
        s"max_err $maxErr exceeds the SQ8 bound ${maxSpan / 510.0}")
    }
  }
}
