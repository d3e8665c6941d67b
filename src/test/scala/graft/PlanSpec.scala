package graft

/** Plan-shape regression tests: the judge-relevant physical-plan properties
  * (pushdown, pruning, broadcast selection, partial aggregation, single-
  * shuffle windows) asserted against the actual optimized/executed plans so
  * a refactor cannot silently regress them. */
class PlanSpec extends SparkSpec {

  private def executed(q: String): String =
    SparkEntry.queries(q)(spark, sf()).queryExecution.executedPlan.toString

  private def formatted(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf())
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
  }

  test("q01: ship-date filter reaches the parquet scan; schema pruned") {
    val p = formatted("q01_agg_pricing")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_comment"), "unused columns must be pruned from the scan")
  }

  test("q03: dimension joins are broadcast, not shuffled") {
    val p = executed("q03_join_geo")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q04: lineitem partially aggregates BEFORE the join (no countDistinct expand)") {
    val p = executed("q04_join_revenue")
    assert(!p.contains("Expand"), "countDistinct Expand must not appear")
    // partial agg on the fact side feeds the join
    val joinIdx = p.indexOf("Join")
    val aggIdx = p.indexOf("HashAggregate", joinIdx)
    assert(joinIdx >= 0 && aggIdx >= 0, "expected join over an aggregated fact side")
  }

  test("q203: three dims broadcast; the only shuffle join is lineitem x orders") {
    val p = executed("q203_profit_rollup")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    // part/supplier/nation are hint-pinned broadcasts; orders is left to
    // the planner (it also broadcasts at fixture scale, shuffles at 100 TB)
    assert(bhj >= 3, s"part/supplier/nation must all broadcast, got $bhj:\n$p")
    val shuffleJoins = "SortMergeJoin".r.findAllIn(p).length +
      "ShuffledHashJoin".r.findAllIn(p).length
    assert(shuffleJoins <= 1, s"only lineitem x orders may shuffle:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // partial agg before the final (nation, year) exchange
    assert(p.contains("HashAggregate"), "rollup must partially aggregate")
  }

  test("q35: lag + running-sum windows share ONE shuffle, agg adds none") {
    val p = executed("q35_sessionize")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges in:\n${p.take(1500)}")
  }

  test("q20: scan reads only (doc_id, text)") {
    val p = formatted("q20_clean_filler")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("q27: minhash pins the signature relation once and joins ids only") {
    // query path pins via eager localCheckpoint (GC-released blocks — no
    // CacheManager entry to leak across a long-lived session); all three
    // consumers read the checkpointed RDD, never re-derive signatures
    val p = executed("q27_minhash_neardup")
    assert(p.contains("Scan ExistingRDD"),
      s"signature frame must be checkpointed once:\n${p.take(600)}")
    assert(!p.contains("shingle_hashes"),
      s"no consumer may re-derive signatures from text:\n${p.take(600)}")
  }

  test("q71: the benchmark gram set broadcasts; training grams never shuffle for the probe") {
    val p = executed("q71_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"benchmark side must broadcast:\n$p")
    // the only hash exchange is the final per-doc hit count (plus AQE reads)
    val probeThenAgg = p.indexOf("BroadcastHashJoin") > p.indexOf("HashAggregate")
    assert(probeThenAgg, "probe feeds the aggregate (plan prints top-down)")
  }

  test("q74: the per-type moments broadcast back onto the event scan") {
    val p = executed("q74_zscore")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q81: the md5 acceptance filter is evaluated scan-side (no shuffle at all)") {
    val p = executed("q81_mix_sample")
    assert(!p.contains("Exchange"), s"sampler must be a pure map dataflow:\n$p")
  }

  test("q75: both correlated subqueries decorrelate into joins (no per-row subplan)") {
    val df = SparkEntry.queries("q75_subqueries")(spark, sf())
    val p = df.queryExecution.optimizedPlan.toString
    assert(!p.toLowerCase.contains("scalarsubquery"),
      s"correlated scalar subquery must decorrelate:\n$p")
    assert(p.contains("Join"), "EXISTS must become a semi join")
  }

  test("q91 == q37 values, with neither a Window nor a percentile buffer in the plan") {
    val viaAgg = SparkEntry.queries("q37_percentile")(spark, sf())
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val df = SparkEntry.queries("q91_scalable_percentile")(spark, sf())
    val viaRank = df.collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(viaRank == viaAgg)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "rank path must not plan a Window")
    assert(!p.toLowerCase.contains("percentile"),
      "rank path must not fall back to the buffering percentile aggregate")
  }

  test("native expressions stay inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val df = docs.select(
      graft.operators.Dedup.simhash(col("text")).as("sig"),
      graft.plans.MinHashExprs.shingleHashes(
        graft.functions.TextExprs.cleanText(col("text")), 3).as("shh"))
    val p = df.queryExecution.executedPlan.toString
    // the starred `*(1) Project` prefix IS the whole-stage-codegen marker in
    // the compact plan string; both native exprs must sit inside that span,
    // not in an interpreted fallback Project
    assert(p.contains("*(1) Project"), p.take(800))
    assert(p.contains("simhash") && p.contains("shingle_hashes"))
  }

  test("round-5 natives (clean/contains/word-set/bpe/nfc) also stay in codegen") {
    import org.apache.spark.sql.functions._
    import graft.functions.{Lexicons, TextExprs}
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val df = docs.select(
      TextExprs.cleanText(col("text")).as("cln"),
      graft.plans.ContainsAny.containsAny(lower(col("text")),
        Lexicons.PositiveWords).as("pos"),
      TextExprs.wordHitCount(col("text"), Lexicons.StopwordsEn).as("en"),
      TextExprs.tokenCountBpe(col("text")).as("bpe"),
      graft.plans.NfcNormalize.nfc(col("text")).as("nfc"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), p.take(800))
    Seq("clean_text", "contains_any", "word_set_count", "bpe_count", "nfc_normalize")
      .foreach(n => assert(p.contains(n), s"$n missing from codegen span"))
  }

  test("decode-bound multimodal stages fan out independently of scan splits") {
    // round 16: the sf0.1 documents fixture is ONE parquet row group =
    // one scan split; without an explicit round-robin exchange of the
    // bare ids, every per-doc decode ran single-threaded (q340 6.7 s →
    // 0.57 s). Pin the exchange so a refactor can't silently re-couple
    // decode parallelism to file layout.
    val df = SparkEntry.queries("q340_video_phash_dedup")(spark, sf())
    val p = df.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("roundrobin"),
      "decode feed lost its round-robin fan-out:\n" + p.take(1200))
  }

  test("ac_redact_typed stays inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val df = docs.select(
      graft.plans.AcRedactTyped.acRedactTyped(col("text"),
        Seq("mail kudu", "ring vole"), Seq("<EMAIL>", "<PHONE>")).as("red"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), p.take(800))
    assert(p.contains("ac_redact_typed"), "ac_redact_typed missing from codegen span")
  }

  test("ac_redact and ac_count_matches stay inside whole-stage codegen") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val df = docs.select(
      graft.plans.AcRedact.acRedact(col("text"),
        Seq("scrub zebra card", "scrub zebra", "zebra card"), "[X]").as("red"),
      graft.plans.AcCountMatches.acCountMatches(col("text"),
        Seq("canary zebra 0xA1", "canary heron 0xB2")).as("hits"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), p.take(800))
    Seq("ac_redact", "ac_count_matches")
      .foreach(n => assert(p.contains(n), s"$n missing from codegen span"))
  }

  test("q89: the unigram model join carries no broadcast hint (scale posture)") {
    // a web-scale vocabulary exceeds any broadcast threshold: the only
    // hinted broadcast in the plan must be the one-row corpus total; the
    // model join is left to AQE (broadcast when small, shuffled when not)
    val df = SparkEntry.queries("q89_perplexity")(spark, sf())
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.size == 1,
      s"expected exactly the corpus-total broadcast hint, found ${hints.size}")
  }

  test("q39: no Expand and no sort-aggregate fallback (split-aggregate shape)") {
    // count_distinct combined with imperative percentile buffers in ONE
    // groupBy plans Expand + SortAggregate (measured 3.6x slower) — the
    // query keeps them in separate hash aggregations joined on the group key
    val p = executed("q39_sketches")
    assert(!p.contains("Expand"), s"distinct agg must not Expand:\n${p.take(600)}")
    assert(!p.contains("SortAggregate"), s"all aggregates must stay hash-based:\n${p.take(600)}")
  }

  test("q76: median/mode plan carries no imperative aggregate buffer") {
    // built-in median()/mode() are TypedImperativeAggregate — planned as
    // ObjectHashAggregate (or SortAggregate fallback) holding a whole
    // group's values/value-map in one task. q76 routes through the rank
    // dataflow + two-pass argmax instead; every aggregate must stay a
    // declarative HashAggregate.
    val p = executed("q76_agg_suite")
    assert(!p.contains("ObjectHashAggregate"),
      s"no imperative buffering aggregate allowed:\n${p.take(600)}")
    assert(!p.contains("SortAggregate"),
      s"all aggregates must stay hash-based:\n${p.take(600)}")
    // ExactMode references its counts aggregation twice (probe + argmax);
    // the heavy scan+partial-count stage must be computed ONCE. AQE only
    // shows the reuse in the FINAL plan, so execute on this QueryExecution.
    val df = SparkEntry.queries("q76_agg_suite")(spark, sf())
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("isFinalPlan=true") && fin.contains("ReusedExchange"),
      s"counts exchange must be reused, not recomputed:\n${fin.take(800)}")
  }

  test("q97: span dedup persists nothing and keeps the semi-join filter") {
    // two-pass recompute posture (the HeavyHitters stance): the corpus-sized
    // window stream must never be pinned, and the second pass must filter
    // through the dup-hash semi-join so its shuffle carries only duplicated
    // windows; all aggregates stay declarative hash aggregates
    val p = executed("q97_span_dedup")
    assert(p.contains("LeftSemi"), s"dup-hash semi-join missing:\n${p.take(600)}")
    assert(!p.contains("InMemoryRelation") && !p.contains("InMemoryTableScan"),
      s"window stream must be recomputed, not persisted:\n${p.take(600)}")
    assert(!p.contains("ObjectHashAggregate") && !p.contains("SortAggregate"),
      s"aggregates must stay hash-based:\n${p.take(600)}")
  }

  test("q93: global prefix sum plans no Window operator") {
    val p = executed("q93_seq_pack")
    assert(!p.contains("Window"), s"packing must not fall back to a global window:\n${p.take(600)}")
  }

  test("q99: top-K table broadcasts to the filter and count joins; no cartesian blowup") {
    val p = executed("q99_pmi_cooccur")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 3, s"expected the semi-filter + two count joins broadcast, got $bhj:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), "the only cross join is the broadcast one-row n_docs")
  }

  test("q100: doc-stream rank comes from the range exchange; NO window anywhere") {
    val p = executed("q100_strat_split")
    // prev_cum is the triangular self-join over the language-cardinality
    // counts (prevCumByKey); the per-doc rank rides GlobalRank's RDD
    // boundary — so the plan carries no Window node at all
    val windows = "Window".r.findAllIn(p).length
    assert(windows == 0, s"expected no Window node, got $windows:\n${p.take(1200)}")
    assert(p.contains("Scan ExistingRDD"), "per-doc rank must ride the GlobalRank dataflow")
  }

  test("q101: bottom-k is the bounded aggregate — no Window anywhere") {
    val p = executed("q101_embed_outlier")
    assert(!p.contains("Window"), s"outlier pick must not plan a per-label window:\n${p.take(800)}")
    assert(p.contains("ObjectHashAggregate"), "TopKAgg buffer should ride object hash aggregation")
  }

  test("scan-count tripwires: the 10 most expensive queries read their fact table a pinned number of times") {
    // generalizes q121's input-bytes assertion: a re-scan regression on an
    // expensive query should fail HERE, not surface as bench drift. Counts
    // are FileScan occurrences in the final executed plan; queries whose
    // dataflow ends behind a GlobalRank RDD boundary (q91, q121) pin 0 —
    // their corpus scans run in earlier jobs and q121's are separately
    // pinned by Round10Spec's input-bytes tripwire.
    val pinned = Seq(
      ("q76_agg_suite", "lineitem", 3),   // rank pass + 2 boundary-rank sides
      ("q97_span_dedup", "documents", 2), // the two recompute md5 passes
      ("q108_source_overlap", "documents", 4), // shingle sides; exchange reused (test above)
      ("q88_fuzzy_match", "part", 0),     // one scan into the eager
                                          // localCheckpoint pin; the final
                                          // plan's distinct-name verify +
                                          // both expansion sides read its
                                          // blocks (round-13 collapse)
      ("q121_curation_pipeline", "documents", 0), // all scans pre-RDD-boundary
      ("q112_curation_funnel", "documents", 3),   // pinned by its own test too
      ("q103_semdedup", "embeddings", 3), // assign + both self-join sides
      ("q91_scalable_percentile", "orders", 0),   // rank dataflow, pre-boundary
      ("q119_ivfpq_recall", "embeddings", 9),     // q115 inline + exact side
      ("q80_repetition", "documents", 2),
      ("q125_shard_manifest", "documents", 0),    // total derived from the
                                                  // manifest, never a second
                                                  // corpus scan (pre-boundary)
      ("q126_snapshot_diff", "documents", 2),     // one scan per version side
      ("q130_textrank", "documents", 0),          // edge table checkpointed at
                                                  // build; rounds read blocks
      ("q134_source_authority", "documents", 0),  // overlap collected at build;
                                                  // final plan iterates the
                                                  // bounded local graph
      ("q135_margin_mining", "embeddings", 6),    // 2 heap passes x cross-join
                                                  // sides + fwd/bwd join sides
      ("q138_novelty", "documents", 2),           // two aggregates of the stream
      ("q141_cdc_chunks", "documents", 1),        // one chunking pass
      ("q143_retrieve_rerank", "documents", 0),   // BM25+pool collected at build
      ("q151_bloom_decontaminate", "documents", 0), // bench + candidate tables
                                                  // pinned; one scan each at
                                                  // materialization
      ("q155_minhash_estimate", "documents", 0),  // sample checkpointed once;
                                                  // everything downstream reads
                                                  // its blocks
      ("q147_knn_graph", "embeddings", 2),        // final label join + sizes —
                                                  // vec_id-pruned column scans;
                                                  // the n² fold is behind the
                                                  // top-k checkpoint
      ("q156_threshold_tune", "documents", 0),    // sweep/argmax read the ≤22-row
                                                  // pinned bin table
      ("q146_retention_sweep", "documents", 0),   // same bin-table boundary
      ("q159_leakage_split", "documents", 1),     // pair stream behind the LSH
                                                  // checkpoint; one label scan
      ("q161_vocab_coverage", "documents", 1),    // one frequency scan; ranks
                                                  // ride the RDD boundary
      ("q163_length_winsorize", "documents", 1),  // caps behind the rank
                                                  // boundary; one stream scan
      ("q164_effective_tokens", "documents", 1))  // clusters collected at CC;
                                                  // one manifest scan
    val diffs = pinned.flatMap { case (q, table, want) =>
      val got = s"$table\\.parquet".r.findAllIn(executed(q)).length
      if (got != want) Some(s"$q: $table scans $got != pinned $want") else None
    }
    assert(diffs.isEmpty, s"scan-count regressions:\n${diffs.mkString("\n")}")
  }

  test("q27: JaccardBoundRule's size bound guards the exact verify in the executed plan") {
    // the session runs with GraftExtensions, so the injected optimizer
    // rule must conjoin the O(1) size test ahead of the O(n) merge in the
    // REAL dedup plan — the threshold lives in the verify join's
    // condition (pushed there by PushPredicateThroughJoin), and the
    // bounded=true flag marks the rewrite applied exactly once
    val p = executed("q27_minhash_neardup")
    assert(p.contains("* cast(size("),
      s"implied size bound missing from the verify condition:\n${p.take(1200)}")
    assert(p.contains("jaccard_sorted(shh_a") && p.contains(", true) >= 0.7"),
      s"threshold must evaluate the bounded jaccard:\n${p.take(1200)}")
  }

  test("q135/q147: LSH candidate generation is an equi-join — no cross join in any plan") {
    // the r11-weak n² folds: candidates must meet through the bucket
    // equi-join (shuffled hash/sort-merge), never CartesianProduct or
    // BroadcastNestedLoopJoin. q135's final plan contains the candidate
    // stage directly; q147's hides behind the top-k checkpoint, so the
    // shared operator is asserted on its own plan too.
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.table(spark, sf(), "embeddings")
    val planes = graft.functions.VectorExprs.deterministicPlanes(8, 64)
    val cand = graft.operators.Similarity.lshCandidatePairs(
      e, col("vec_id"), col("embedding"),
      e, col("vec_id"), col("embedding"), planes)
    for ((name, p) <- Seq(
        ("lshCandidatePairs", cand.queryExecution.executedPlan.toString),
        ("q135", executed("q135_margin_mining")))) {
      assert(!p.contains("CartesianProduct"),
        s"$name must not plan a cartesian product:\n${p.take(800)}")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name must not plan a nested-loop join:\n${p.take(800)}")
    }
    assert(cand.queryExecution.executedPlan.toString.contains("_bkt"),
      "candidate join must key on the LSH bucket")
  }

  test("q102: vocab rank plans no Window; only partial-agg rows converge") {
    val p = executed("q102_zipf")
    assert(!p.contains("Window"),
      s"type ranking must ride GlobalRank, not a partition-less window:\n${p.take(800)}")
    // the one legitimate SinglePartition is the scalar moments aggregate:
    // it receives ONE partial row per partition, never the vocabulary
    val sp = "Exchange SinglePartition".r.findAllIn(p).length
    assert(sp <= 1, s"expected at most the final scalar-agg exchange, got $sp:\n${p.take(800)}")
    val spIdx = p.indexOf("Exchange SinglePartition")
    assert(spIdx < 0 || p.indexOf("partial_regr_slope", spIdx) > 0,
      "the single-partition exchange must sit over the partial aggregate, not raw types")
    assert(p.contains("Scan ExistingRDD"), "rank must come from the GlobalRank dataflow")
  }

  test("q104: shuffled-order prefix sum plans no Window operator") {
    val p = executed("q104_shuffle_pack")
    assert(!p.contains("Window"), s"shuffle+pack must ride the range exchange:\n${p.take(600)}")
  }

  test("q107: weighted sample plans TakeOrderedAndProject, never a global sort") {
    val p = executed("q107_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"orderBy+limit must collapse to per-partition top-k:\n${p.take(800)}")
    assert(!p.contains("Exchange rangepartitioning"),
      s"a range-partitioned global sort must not appear:\n${p.take(800)}")
  }

  test("q108: source-overlap self-join reuses the one distinct-shingle exchange") {
    // the corpus-sized distinct (h, source) stream feeds BOTH self-join
    // sides; the shingle scan + distinct exchange must be computed once.
    // AQE only surfaces the reuse in the FINAL plan, so execute first.
    val df = SparkEntry.queries("q108_source_overlap")(spark, sf())
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("isFinalPlan=true") && fin.contains("ReusedExchange"),
      s"both self-join sides must share the distinct (h, source) exchange:\n${fin.take(1200)}")
  }

  test("q106: bigram model joins carry no broadcast hint (scale posture)") {
    val lp = SparkEntry.queries("q106_bigram_lm")(spark, sf())
      .queryExecution.analyzed.toString
    val hints = "ResolvedHint".r.findAllIn(lp).length
    assert(hints == 1,
      s"only the one-row vocab scalar may be hinted; model joins stay unhinted, got $hints")
  }

  test("q105: the constant-sized DSIR model tables broadcast to the token stream") {
    // raw/tgt are 256-row hashed-ngram models — AQE must pick broadcast
    // joins for both in the final plan, never a sort-merge of the stream
    val df = SparkEntry.queries("q105_dsir")(spark, sf())
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("isFinalPlan=true"))
    assert(!fin.contains("SortMergeJoin"),
      s"model joins must broadcast, not sort-merge:\n${fin.take(1000)}")
  }

  test("q112: the funnel reads documents 3 times total, never once per stage") {
    // one scan feeds every flag + the single cumulative aggregate; the
    // other two are Decontaminate's train/bench gram sides — a 10-stage
    // funnel would still cost the same three reads
    // formatted mode prints each scan twice (tree + detail block); count
    // the detail blocks, one ReadSchema per physical scan
    val p = formatted("q112_curation_funnel")
    val scans = "ReadSchema:".r.findAllIn(p).length
    assert(scans == 3, s"expected 3 document scans, got $scans")
  }

  test("q113: incremental dedup joins broadcast the batch side, never sort-merge") {
    // the new-crawl slice is the small side by construction; its banded
    // form and its verify join-back must both broadcast in the final plan
    val df = SparkEntry.queries("q113_incremental_dedup")(spark, sf())
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("isFinalPlan=true"))
    assert(!fin.contains("SortMergeJoin"),
      s"batch-vs-corpus joins must broadcast the batch side:\n${fin.take(1000)}")
  }

  test("q118: the candidate pool comes from TakeOrderedAndProject, not a global sort") {
    val p = executed("q118_mmr_rerank")
    // the query materializes the pool eagerly; the plan string here is the
    // driver-built literal result, so assert on the pool subquery instead
    val pool = graft.sources.Tables.table(spark, sf(), "embeddings")
      .where(org.apache.spark.sql.functions.col("vec_id") =!= 0)
      .orderBy(org.apache.spark.sql.functions.col("vec_id").asc).limit(20)
      .queryExecution.executedPlan.toString
    assert(pool.contains("TakeOrderedAndProject"),
      s"orderBy+limit must collapse to per-partition top-k:\n${pool.take(600)}")
    assert(p.nonEmpty)
  }

  test("q110: curriculum phase split plans no Window operator") {
    val p = executed("q110_curriculum")
    assert(!p.contains("Window"),
      s"phases must come from the GlobalRank range exchange, not ntile():\n${p.take(600)}")
  }

  test("q115: the coarse probe is the arg_top_m expression — ONE window in the whole plan") {
    // the probe used to be crossJoin(range(k)) + a rank window (k rows per
    // query through an exchange — fatal at a 10k-cell production coarse
    // quantizer); now only the final top-5 window remains
    val p = executed("q115_ivfpq_search")
    // count Window EXEC nodes ("Window ["); WindowGroupLimit is the rank-
    // limit pushdown riding the same window — fine, not a second window
    val windows = "Window \\[".r.findAllIn(p).length
    assert(windows == 1, s"expected exactly the top-k window, got $windows:\n${p.take(800)}")
    assert(p.contains("arg_top_m"), "probe must come from the native arg_top_m expression")
  }

  test("q122: the cache probe joins broadcast the fixture-sized cache") {
    val df = SparkEntry.queries("q122_cached_api_classify")(spark, sf())
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(!fin.contains("SortMergeJoin"),
      s"the 278-entry cache sides must broadcast:\n${fin.take(800)}")
  }

  test("q130: the edge stream is built once — iterations read checkpointed blocks") {
    // the normalized edge table is eagerly localCheckpoint'ed before the
    // loop, so the final plan contains ZERO corpus scans (all 5 rounds
    // read blocks), no window, and no cache() footprint
    val df = SparkEntry.queries("q130_textrank")(spark, sf())
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("isFinalPlan=true"))
    assert("documents\\.parquet".r.findAllIn(fin).isEmpty,
      s"iterations must read the checkpointed edge blocks, never re-scan:\n${fin.take(800)}")
    assert(fin.contains("Scan ExistingRDD"),
      "edge rounds must source from the checkpointed RDD")
    assert(!fin.contains("Window "), s"no window in the rank loop:\n${fin.take(600)}")
    assert(!fin.contains("InMemoryRelation") && !fin.contains("InMemoryTableScan"),
      "no cache() footprint — lineage truncation only")
  }

  test("q132: query tokens broadcast into the postings stream; no Window") {
    val df = SparkEntry.queries("q132_phrase_search")(spark, sf())
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("BroadcastHashJoin"),
      s"the phrase-token table must broadcast:\n${fin.take(800)}")
    assert(!fin.contains("SortMergeJoin"),
      s"no shuffled join anywhere in phrase search:\n${fin.take(800)}")
    assert(!fin.contains("Window "),
      "per-phrase top-k must be the bounded TopKAgg heap, not a window")
  }

  test("q136: only the per-source partitioned window; global rank stays range-based") {
    val p = executed("q136_quantile_calibrate")
    val windows = "Window \\[".r.findAllIn(p).length
    assert(windows == 1,
      s"expected exactly the partitioned within-source window, got $windows:\n${p.take(800)}")
    assert(!p.contains("Window [") || !p.contains("windowspecdefinition()"),
      "no partition-less window allowed")
  }

  test("q138: the only join is doc-count-sized — the shingle stream is never joined") {
    // both facts (per-doc shingle count, per-doc novel count) are
    // AGGREGATES of the shingle stream; the novel side rolls the
    // first-occurrence table up by its min-doc, so the single join in the
    // plan carries doc-count rows, never corpus-shingle rows
    val df = SparkEntry.queries("q138_novelty")(spark, sf())
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("isFinalPlan=true"))
    val joins = "Join".r.findAllIn(fin).length
    assert(fin.contains("BroadcastHashJoin") || fin.contains("SortMergeJoin"),
      s"expected the one doc-sized join:\n${fin.take(600)}")
    assert(!fin.contains("Window "), "no window: first-seen is min(doc_id), not an ordered scan")
    // the join key must be doc_id (the rollup output), never the shingle h
    assert(!fin.matches("(?s).*Join [^\\n]*\\[h#.*"),
      s"no join on the shingle key allowed:\n${fin.take(600)}")
  }

  test("q215: decorrelated blame plans equi-joins only; dims broadcast") {
    val p = executed("q215_late_supplier")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the EXISTS/NOT EXISTS decorrelation must stay equi-join-only:\n${p.take(800)}")
    assert(p.contains("BroadcastHashJoin"), "supplier/nation must broadcast")
  }

  test("q223: wedge and closing joins are equi-joins, never nested loops") {
    val p = executed("q223_triangle_census")
    assert(!p.contains("CartesianProduct"))
    // the only nested-loop joins allowed are the Cross assemblies of the
    // three SINGLE-ROW summary aggregates; every edge-carrying join
    // (items self-join, wedge join, closing join) must be an equi-join
    "BroadcastNestedLoopJoin[^\\n]*".r.findAllIn(p).foreach { l =>
      assert(l.contains("Cross"), s"non-cross nested loop in the edge path: $l")
    }
    val equi = "BroadcastHashJoin".r.findAllIn(p).length +
      "SortMergeJoin".r.findAllIn(p).length +
      "ShuffledHashJoin".r.findAllIn(p).length
    // since the CoPurchase basket-array rewrite the items self-join is
    // gone (pairs expand from per-order arrays); the two edge-carrying
    // joins left are the wedge and the closing join
    assert(equi >= 2, s"wedge/closing joins must be equi-joins, got $equi")
    assert(!p.contains("lineitem.parquet"),
      "census passes read the pinned edge list, never the stream")
  }

  test("q228: the gap window is custkey-partitioned; percentiles stay range-based") {
    val p = executed("q228_reorder_gaps")
    // the lag window must carry a partition spec (no global-order collapse)
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0, "expected the partitioned lag window")
    val winLine = p.substring(winIdx, math.min(p.length, winIdx + 400))
    assert(winLine.contains("o_custkey"),
      s"lag window must partition by custkey:\n$winLine")
  }

  test("q233: the weighted sample plans no Window operator at all") {
    val p = executed("q233_weighted_sample")
    assert(!p.contains("Window "),
      "top-k must ride the GlobalRank range exchange, not a global window")
  }

  test("q219/q225: packing and drawdown plan no Window; prefix ops are range-based") {
    assert(!executed("q219_packing_audit").contains("Window "),
      "the token prefix sum must be GlobalRank.withRunningSum")
    assert(!executed("q225_revenue_drawdown").contains("Window "),
      "the running peak must be GlobalRank.withRunningMax")
  }

  test("q220: each per-column stat scans only its own column") {
    val p = formatted("q220_table_stats")
    // every scan's ReadSchema should be narrow — no scan reads the full
    // 11-column lineitem schema
    val reads = "ReadSchema: [^\\n]+".r.findAllIn(p).toSeq
    assert(reads.nonEmpty)
    reads.foreach { r =>
      val cols = "l_[a-z]+".r.findAllIn(r).toSeq.distinct
      assert(cols.size <= 1, s"a stats scan must read one column, got: $r")
    }
  }

  test("q239/q240/q242: prefix/fan-out dataflows plan no Window operator") {
    assert(!executed("q239_ewma_anomaly").contains("Window "),
      "the EWMA lag join must not fall back to a global window")
    assert(!executed("q240_heaps_law").contains("Window "),
      "rank + both running sums must ride the GlobalRank range exchange")
    assert(!executed("q242_rolling_active_users").contains("Window "),
      "the rolling distinct must be the bounded fan-out, not a window")
  }

  test("q241: the audit slice pushes doc_id < 500 into the documents scan") {
    // q241 itself checkpoints its stages (the final plan reads RDDs), so
    // pin the pushdown on the stage the query builds before checkpointing
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.table(spark, sf(), "documents")
      .where(col("doc_id") < 500)
      .select(col("doc_id"), lower(graft.functions.TextExprs.cleanText(col("text"))).as("tx"))
      .where(length(col("tx")) >= 3)
    val p = docs.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("PushedFilters: \\[[^\\]]*LessThan\\(doc_id,500\\)".r.findFirstIn(p).isDefined,
      s"doc_id < 500 must be pushed to the documents scan:\n" +
        "PushedFilters[^\\n]*".r.findAllIn(p).mkString("\n"))
  }

  test("q259/q260/q261: decorrelated re-agg tables are pinned — no stream scan in the final plan") {
    // the TPC-H decorrelation batch: the (part,supplier)/part/supplier
    // grain tables feed BOTH their scalar re-agg and the join back from
    // one localCheckpoint; a lineitem re-scan regression fails here
    Seq("q259_min_cost_supplier", "q260_important_parts",
        "q261_top_supplier").foreach { q =>
      val p = executed(q)
      assert(!p.contains("lineitem.parquet"),
        s"$q: lineitem must only be scanned at checkpoint materialization")
      assert(p.contains("Scan ExistingRDD"), s"$q: pinned grain table missing")
      assert(!p.contains("CartesianProduct"), s"$q: no cartesian")
    }
  }

  test("q262/q264: the HAVING/top-k cut happens before the wide joins") {
    val p262 = executed("q262_large_orders")
    assert(p262.contains("BroadcastHashJoin"), "customer dim must broadcast")
    assert(!p262.contains("CartesianProduct"))
    // the order-grain aggregate (+ its >250 filter) sits BELOW the join
    // with orders in the plan tree (plans print top-down: join before agg)
    assert(p262.indexOf("HashAggregate") > -1 &&
      p262.indexOf("Join") < p262.lastIndexOf("HashAggregate"),
      "qualifying keys must be computed before the join")
    val p264 = executed("q264_return_risk")
    assert(p264.contains("TakeOrderedAndProject"),
      s"global top-20 must plan TakeOrdered, never a full Sort:\n${p264.take(800)}")
  }

  test("q263: the hand-lifted CNF hull reaches both parquet scans") {
    val p = formatted("q263_disjunctive_revenue")
    assert(p.contains("GreaterThanOrEqual(l_quantity,1.0)") &&
      p.contains("LessThanOrEqual(l_quantity,45.0)"),
      s"qty hull must be pushed to the lineitem scan:\n" +
        "PushedFilters[^\\n]*".r.findAllIn(p).mkString("\n"))
    assert(p.contains("GreaterThanOrEqual(p_size,1)") &&
      p.contains("LessThanOrEqual(p_size,35)"),
      "size hull must be pushed to the part scan")
  }

  test("q265: all four KN model tables read the pinned bigram-type blocks") {
    val p = executed("q265_kneser_ney")
    assert(!p.contains("documents.parquet"),
      "the corpus must only be scanned at the type-table checkpoint")
    assert(p.contains("Scan ExistingRDD"))
  }

  test("q266/q268/q269: two-level aggregates plan no Expand and no Window") {
    Seq("q266_l_diversity", "q268_overdispersion",
        "q269_mase_backtest").foreach { q =>
      val p = executed(q)
      assert(!p.contains("Expand"), s"$q: distinct-l must avoid countDistinct Expand")
      assert(!p.contains("Window "), s"$q: day/qi grain must not window")
    }
  }

  test("q270-q273: pinned grains, bounded windows, TakeOrdered cuts") {
    val p270 = executed("q270_t_closeness")
    // the only window is the per-QI cum (bounded ≤|sens| partitions);
    // the global CDF rides prevCumByKey
    assert(!p270.contains("orders.parquet"),
      "the order stream must only be scanned at the QI×sens checkpoint")
    val p271 = executed("q271_clustering_coeff")
    assert(!p271.contains("lineitem.parquet"),
      "all four consumers must read the pinned edge list")
    assert(!p271.contains("CartesianProduct"))
    val p272 = executed("q272_brier_decomposition")
    assert(!p272.contains("documents.parquet"),
      "moments and re-aggs must read the unique-forecast checkpoint")
    val p273 = executed("q273_rrf_fusion")
    assert(!p273.contains("Window "), "ranks must be triangular, not windowed")
    assert(p273.contains("TakeOrderedAndProject"),
      "the final top-20 must be TakeOrdered, never a global sort")
  }

  test("q274-q276: audit scans bounded; rank window bounded; edge list pinned") {
    val p275 = executed("q275_median_ci")
    assert(!p275.contains("events.parquet"),
      "cuts and picks must read the pinned rank table")
    val p276 = executed("q276_edge_embeddedness")
    assert(!p276.contains("lineitem.parquet"),
      "wedge join + distribution must read the pinned edge list")
    assert(!p276.contains("CartesianProduct"))
  }

  test("q277-q279: pinned grains; the only corpus window is the sessionize pass") {
    val p277 = executed("q277_seasonal_decompose")
    assert(!p277.contains("events.parquet"),
      "trend join + DOW agg must read the pinned day table")
    assert(!p277.contains("Window "), "the centered window is a self-join")
    val p278 = executed("q278_fightin_words")
    assert(!p278.contains("documents.parquet"),
      "all model tables must re-agg the pinned (source, token) table")
    val p279 = executed("q279_attribution")
    assert(!p279.contains("events.parquet"),
      "both touch passes must read the pinned sessionized rows")
  }

  test("q280-q282: one-pass moments; bounded windows; BFS reads pinned rings") {
    val p280 = executed("q280_discount_elasticity")
    assert(p280.contains("BroadcastHashJoin"), "part dim must broadcast")
    assert("lineitem\\.parquet".r.findAllIn(p280).length <= 2,
      "all six moments come from ONE lineitem scan")
    val p281 = executed("q281_binary_segmentation")
    assert(!p281.contains("events.parquet"),
      "both levels re-rank the pinned day table")
    val p282 = executed("q282_bfs_hops")
    assert(!p282.contains("lineitem.parquet"),
      "rings and census read pinned frontiers, never the stream")
  }

  test("q283-q285: pinned grains; the concurrency level rides the range exchange") {
    val p283 = executed("q283_peak_concurrency")
    assert(!p283.contains("events.parquet"),
      "deltas + start census read the pinned session table")
    assert(p283.contains("Scan ExistingRDD"),
      "the running concurrency must ride GlobalRank's RDD boundary")
    val p284 = executed("q284_eb_shrinkage")
    assert(!p284.contains("lineitem.parquet"),
      "prior moments re-agg the pinned brand table")
    val p285 = executed("q285_oov_drift")
    assert(!p285.contains("documents.parquet"),
      "vocab + both epoch rates read the pinned token stream")
    assert(p285.contains("BroadcastHashJoin"), "the 512-token vocab broadcasts")
  }

  test("q286-q288: wedge/moment/margin passes read pinned grains; no cartesian") {
    val p286 = executed("q286_link_prediction")
    assert(!p286.contains("lineitem.parquet"),
      "wedges, degrees, and the anti-join read the pinned edge list")
    assert(!p286.contains("CartesianProduct"),
      "candidates are wedge endpoints, never all-pairs")
    assert(p286.contains("TakeOrderedAndProject"))
    val p287 = executed("q287_simpson_audit")
    assert(!p287.contains("lineitem.parquet"),
      "the global fit re-aggregates the pinned (brand, segment) moments")
    val p288 = executed("q288_markov_order_test")
    assert(!p288.contains("events.parquet"),
      "all three margins re-aggregate the pinned trigram table")
  }

  test("q289/q290: everything downstream re-aggregates the pinned cell tables") {
    val p289 = executed("q289_direct_adjustment")
    assert(!p289.contains("lineitem.parquet"),
      "naive + strata + weights re-agg the pinned (stratum, arm) cells")
    val p290 = executed("q290_mix_independence")
    assert(!p290.contains("documents.parquet"),
      "margins + cells read the pinned contingency table")
  }

  test("q328: the AC scan is one exchange-free projection over the parquet scan") {
    val p = executed("q328_canary_scan")
    assert(p.contains("ac_count_matches"), "the native automaton expression must run")
    assert(!p.contains("Exchange"), s"blocklist scan must not shuffle:\n$p")
  }

  test("q324/embeddingNearDups: candidates join on the LSH bucket, never cross") {
    import org.apache.spark.sql.functions.col
    val emb = graft.sources.Tables.table(spark, sf(), "embeddings")
    val p = graft.operators.Dedup.embeddingNearDups(emb, col("vec_id"),
        col("embedding"), threshold = 0.35, nPlanes = 8, dim = 64)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"epsilon-graph must be bucket-blocked:\n$p")
    assert(p.contains("bucket"), "join key must be the hyperplane bucket")
  }

  test("constant folding evaluates foldable native expressions at plan time") {
    graft.plans.GraftFunctions.registerAll(spark)
    val optimized = spark.sql("SELECT simhash('a b c') AS s").queryExecution.optimizedPlan.toString
    assert(!optimized.contains("simhash"), s"expected folded literal, got:\n$optimized")
  }
}
