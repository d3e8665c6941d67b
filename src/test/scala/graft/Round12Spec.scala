package graft

/** Round-12 units: the factored MMR greedy (shared by q118/q143) and the
  * pluggable multimodal codec seam. */
class Round12Spec extends SparkSpec {

  private def v(xs: Double*): Seq[Double] = xs.toSeq

  test("mmr: first pick is max relevance, tie broken on lowest id") {
    val pool = Seq(
      (3L, 0.9, v(1, 0, 0)),
      (1L, 0.9, v(0, 1, 0)),
      (2L, 0.5, v(0, 0, 1)))
    val out = Mmrt(pool, 1)
    assert(out.map(_._2) == Seq(1L))
  }

  test("mmr: near-duplicate of the first pick is penalized below a diverse item") {
    // id 2 is relevance-second but almost collinear with id 1; id 3 is
    // orthogonal. λ=0.5: score(2) = .5·.89 − .5·cos≈1 < score(3) = .5·.6
    val pool = Seq(
      (1L, 0.90, v(1.0, 0.0, 0.0)),
      (2L, 0.89, v(0.999, 0.01, 0.0)),
      (3L, 0.60, v(0.0, 1.0, 0.0)))
    val out = graft.operators.Mmr.rerank(pool, k = 2, lam = 0.5)
    assert(out.map(_._2) == Seq(1L, 3L), s"got $out")
  }

  test("mmr: k beyond pool size returns every candidate exactly once, ranks contiguous") {
    val pool = Seq((1L, 0.3, v(1, 0)), (2L, 0.2, v(0, 1)), (3L, 0.1, v(1, 1)))
    val out = Mmrt(pool, 10)
    assert(out.map(_._2).sorted == Seq(1L, 2L, 3L))
    assert(out.map(_._1) == Seq(1L, 2L, 3L))
  }

  test("mmr: matches an independent naive recompute on a 12-candidate pool") {
    // deterministic pseudo-pool (no RNG — md5-free arithmetic mix)
    val pool = (1 to 12).map { i =>
      val vec = (0 until 4).map(d => math.sin(i * 7 + d * 3) + 0.1 * d)
      (i.toLong, math.abs(math.cos(i * 5)) / 1.3, vec)
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      r6(d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
    }
    val lam = 0.7
    var picked = Vector.empty[(Long, Double)]
    while (picked.length < 5) {
      val best = pool.filterNot(c => picked.exists(_._1 == c._1)).map { c =>
        val s = if (picked.isEmpty) c._2
          else lam * c._2 - (1 - lam) *
            picked.map(p => cos(c._3, pool.find(_._1 == p._1).get._3)).max
        (c._1, s)
      }.minBy { case (id, s) => (-s, id) }
      picked :+= best
    }
    val want = picked.zipWithIndex.map { case ((id, s), i) => ((i + 1).toLong, id, r6(s)) }
    assert(graft.operators.Mmr.rerank(pool, 5, lam) == want)
  }

  private def Mmrt(pool: Seq[(Long, Double, Seq[Double])], k: Int) =
    graft.operators.Mmr.rerank(pool, k, lam = 0.7)

  test("ann index compact: fragments collapse to one per cell, query results identical") {
    import org.apache.spark.sql.functions._
    import graft.operators.AnnIndex
    val dir = "target/ann_index_compact_spec"
    val e = graft.sources.Tables.table(spark, sf(), "embeddings")
    AnnIndex.build(e.where(col("vec_id") % 3 === 0), col("vec_id"), col("embedding"), dir)
    // two ingest batches → up to 3 fragments per touched cell
    AnnIndex.append(spark, dir, e.where(col("vec_id") % 3 === 1),
      col("vec_id"), col("embedding"))
    AnnIndex.append(spark, dir, e.where(col("vec_id") % 3 === 2),
      col("vec_id"), col("embedding"))
    val q = e.where(col("vec_id") < 6)
      .select(col("vec_id").as("query_id"), col("embedding").cast("array<double>").as("qv"))
    def results() = AnnIndex.query(spark, dir, q, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val before = results()
    def fragCounts(): Map[Int, Int] = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/codes"))
        .filter(d => d.isDirectory && d.getPath.getName.startsWith("cell="))
        .map(d => d.getPath.getName.stripPrefix("cell=").toInt ->
          fs.listStatus(d.getPath).count(_.getPath.getName.endsWith(".parquet")))
        .toMap
    }
    val overfull = fragCounts().filter(_._2 > 1).keySet
    assert(overfull.nonEmpty, "appends must have fragmented at least one cell")
    val compacted = AnnIndex.compact(spark, dir, maxFragments = 1)
    assert(compacted.toSet == overfull, "exactly the over-threshold cells rewrite")
    assert(fragCounts().values.forall(_ == 1), "every cell is one fragment after compact")
    assert(results() == before, "compaction must be invisible to queries")
    // idempotent: nothing left over the threshold
    assert(AnnIndex.compact(spark, dir, maxFragments = 1).isEmpty)
  }

  test("q169: top pair matches a driver recompute; frequencies weighted by token count") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q169_bpe_pairs")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 20 && rows.map(_._3).sorted.toSeq == (1L to 20L))
    val toks = graft.sources.Tables.table(spark, sf(), "documents")
      .select(explode(split(lower(graft.functions.TextExprs.cleanText(col("text"))), " "))
        .as("tok"))
      .where(col("tok") =!= "").collect().map(_.getString(0))
    val freq = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    toks.foreach { t =>
      (0 until t.length - 1).foreach(i => freq(t.substring(i, i + 2)) += 1L) }
    val want = freq.toSeq.sortBy { case (p, f) => (-f, p) }.take(20)
    assert(rows.sortBy(_._3).map(r => (r._1, r._2)).toSeq == want,
      s"top-20 pairs diverge from driver recompute")
  }

  test("q170: buckets partition the corpus; pad_frac bounded and consistent") {
    val rows = SparkEntry.queries("q170_pad_efficiency")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val total = graft.sources.Tables.table(spark, sf(), "documents").count()
    assert(rows.map(_._2).sum == total, "buckets must partition every doc")
    assert(rows.map(_._1).toSet.subsetOf((0L to 7L).toSet))
    rows.foreach { case (b, n, mx, sm, pf) =>
      assert(sm <= n * mx, s"bucket $b: sum exceeds n*max")
      assert(pf >= 0.0 && pf < 1.0, s"bucket $b: pad_frac $pf out of range")
      if (mx > 0)
        assert(math.abs(pf - (1.0 - sm.toDouble / (n * mx))) < 1e-6)
    }
    // buckets ordered by length: max_len non-decreasing with bucket id
    val byB = rows.sortBy(_._1)
    byB.zip(byB.tail).foreach { case (lo, hi) =>
      assert(lo._3 <= hi._3, "bucketing must be monotone in length") }
  }

  test("q171: the four class shares partition every source's characters") {
    val rows = SparkEntry.queries("q171_script_profile")(spark, sf()).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val shares = Seq(2, 3, 4, 5).map(r.getDouble)
      shares.foreach(s => assert(s >= 0.0 && s <= 1.0))
      assert(math.abs(shares.sum - 1.0) < 5e-6,
        s"${r.getString(0)}: shares sum to ${shares.sum}")
    }
  }

  test("q172: unanimous votes fuse to the unanimous label; scores are symmetric") {
    val rows = SparkEntry.queries("q172_label_fusion")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getDouble(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, r1, r2, r3, maj, score, fused) =>
      assert(maj == (Seq(r1, r2, r3).count(identity) >= 2), s"majority wrong for $id")
      if (r1 == r2 && r2 == r3) {
        assert(fused == r1, s"unanimous vote must win for $id")
      }
      if (score > 0) assert(fused, s"positive score must fuse true for $id")
      if (score < 0) assert(!fused, s"negative score must fuse false for $id")
    }
    // mirrored vote patterns score symmetrically: score(v) = -score(!v)
    val byPattern = rows.groupBy(r => (r._2, r._3, r._4)).map {
      case (k, v) => k -> v.head._6 }
    byPattern.foreach { case ((a, b, c), s) =>
      byPattern.get((!a, !b, !c)).foreach(neg =>
        assert(math.abs(s + neg) < 1e-9, s"pattern ($a,$b,$c) not antisymmetric")) }
  }

  test("q173: predictions cover only held-out docs; majority verified against pairs") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q173_label_propagation")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    rows.foreach { case (id, _, n) =>
      assert(id % 5 == 0, s"$id is not a held-out doc")
      assert(n >= 1, s"$id predicted with no labeled neighbors")
    }
    // independent majority recompute from the operator's own pair stream
    val docs = graft.sources.Tables.table(spark, sf(), "documents")
    val pairs = graft.operators.Dedup.minhashNearDups(docs, col("doc_id"), col("text"),
        shingleLen = 3, numBands = 16, rowsPerBand = 2, threshold = 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val lang = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nbrs = (pairs ++ pairs.map(p => (p._2, p._1)))
      .filter { case (u, l) => u % 5 == 0 && l % 5 != 0 }
      .groupBy(_._1).map { case (u, es) => u -> es.map(e => lang(e._2)) }
    assert(rows.map(_._1).toSet == nbrs.keySet)
    rows.foreach { case (id, pred, n) =>
      val votes = nbrs(id)
      assert(n == votes.length)
      val best = votes.groupBy(identity).toSeq
        .map { case (l, v) => (l, v.length) }
        .sortBy { case (l, c) => (-c, l) }.head._1
      assert(pred == best, s"$id: pred $pred != majority $best")
    }
  }

  test("q174: recall is per-query monotone in nProbe and hits q31's config at 4") {
    val rows = SparkEntry.queries("q174_nprobe_sweep")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 24, "3 configs x 8 queries")
    rows.groupBy(_._2).foreach { case (qid, arms) =>
      val byNp = arms.sortBy(_._1).map(_._3)
      // more probed cells can only displace a true hit with another true
      // hit (a displacer outranks a global-top-5 member, so it is one)
      assert(byNp.zip(byNp.tail).forall { case (a, b) => a <= b },
        s"query $qid: hits not monotone in nProbe: ${byNp.mkString(",")}")
    }
    rows.foreach { case (_, _, h, rec) =>
      assert(h >= 0 && h <= 5 && math.abs(rec - h / 5.0) < 1e-9) }
  }

  test("q175: novel counts tile the distinct gram universe; decile 0 is all-novel") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q175_novelty_curve")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val universe = graft.sources.Tables.table(spark, sf(), "documents")
      .select(explode(graft.operators.Dedup.shingles(col("text"), 3)).as("g"))
      .distinct().count()
    assert(rows.map(_._3).sum == universe,
      "every distinct gram must be novel in exactly one decile")
    val d0 = rows.find(_._1 == 0L).get
    assert(d0._2 == d0._3 && d0._4 == 1.0, "decile 0 has no history — all novel")
    rows.foreach { case (_, u, nvl, share) =>
      assert(nvl <= u && share >= 0.0 && share <= 1.0) }
  }

  test("q176: the S-curve orders configs correctly over the true pair set") {
    val rows = SparkEntry.queries("q176_lsh_tuning")(spark, sf()).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(rows.keySet == Set((32L, 1L), (16L, 2L), (8L, 4L)))
    val n = rows.values.map(_._1).toSet
    assert(n.size == 1 && n.head > 0, "all configs score the same pair set")
    // (1-s)^2 <= 1-s^2 pointwise => recall monotone across these configs
    for (f <- Seq((x: (Long, Double, Double)) => x._2, (x: (Long, Double, Double)) => x._3)) {
      assert(f(rows((32L, 1L))) >= f(rows((16L, 2L))) - 1e-9)
      assert(f(rows((16L, 2L))) >= f(rows((8L, 4L))) - 1e-9)
    }
    rows.values.foreach { case (_, er, wr) =>
      assert(er >= 0 && er <= 1 && wr >= 0 && wr <= 1 && wr <= er + 1e-9) }
  }

  test("q177: z matches a driver recompute; anomalies imply |z| > 3") {
    val rows = SparkEntry.queries("q177_rate_anomaly")(spark, sf()).collect()
    assert(rows.nonEmpty)
    // independent recompute over the collected hourly series
    val series = rows.map(r => (r.getString(0),
      r.getTimestamp(1).getTime / 3600000L, r.getLong(2))).toArray
    val byType = series.groupBy(_._1).map { case (t, v) =>
      t -> v.map(x => x._2 -> x._3).toMap }
    rows.foreach { r =>
      val (t, hr, n) = (r.getString(0), r.getTimestamp(1).getTime / 3600000L, r.getLong(2))
      val win = (hr - 24 to hr - 1).flatMap(h => byType(t).get(h))
      val anomaly = r.getBoolean(5)
      if (win.size >= 12) {
        val k = win.size.toDouble
        val s1 = win.sum.toDouble; val s2 = win.map(x => x * x).sum.toDouble
        val variance = (s2 - s1 * s1 / k) / (k - 1)
        if (variance > 0) {
          val z = BigDecimal((n - s1 / k) / math.sqrt(variance))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(math.abs(r.getDouble(4) - z) < 1e-9, s"$t@$hr: z ${r.getDouble(4)} != $z")
          assert(anomaly == (math.abs(z) > 3.0))
        } else assert(r.isNullAt(4) && !anomaly)
      } else assert(r.isNullAt(4) && !anomaly)
    }
  }

  test("q178: chi2 non-negative; per-source doc counts tile the corpus") {
    val rows = SparkEntry.queries("q178_length_chisq")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val total = graft.sources.Tables.table(spark, sf(), "documents").count()
    assert(rows.map(_._2).sum == total)
    rows.foreach { case (src, _, chi2, drifted) =>
      assert(chi2 >= 0.0, s"$src: chi2 $chi2")
      assert(drifted == (chi2 > 21.666))
    }
  }

  test("q179: VMR of the top token matches a driver recompute from raw counts") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q179_burstiness")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.length == 20)
    rows.foreach { case (_, total, df, vmr, bursty) =>
      assert(df <= total && vmr > 0 && bursty == (vmr > 1.5)) }
    val docs = graft.sources.Tables.table(spark, sf(), "documents")
    val n = docs.count().toDouble
    val topTok = rows.maxBy(_._2)._1
    val counts = docs.select(explode(split(lower(
        graft.functions.TextExprs.cleanText(col("text"))), " ")).as("tok"), col("doc_id"))
      .where(col("tok") === topTok)
      .groupBy("doc_id").count().collect().map(_.getLong(1))
    val s1 = counts.sum.toDouble; val s2 = counts.map(c => c * c).sum.toDouble
    val want = BigDecimal(((s2 - s1 * s1 / n) / (n - 1)) / (s1 / n))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(rows.find(_._1 == topTok).get._4 - want) < 1e-9)
  }

  test("q180: samples nest, the 100% arm has zero deviation") {
    val rows = SparkEntry.queries("q180_subsample_stability")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._2)
    assert(rows.map(_._1).toSeq == Seq("01pct", "10pct", "100pct"),
      "md5-threshold samples must nest by size")
    val full = rows.last
    assert(full._4 == 0.0, "the full sample cannot deviate from itself")
    assert(full._2 == graft.sources.Tables.table(spark, sf(), "documents").count())
    rows.foreach { case (_, n, pr, dev) =>
      assert(n > 0 && pr >= 0 && pr <= 1 && dev >= 0) }
  }

  test("q181: bands partition the non-singleton clusters; shares consistent") {
    val rows = SparkEntry.queries("q181_cluster_profile")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val n = graft.sources.Tables.table(spark, sf(), "documents").count()
    rows.foreach { case (band, nc, nd, share) =>
      val (lo, hi) = band match {
        case "2" => (2L, 2L); case "3-4" => (3L, 4L)
        case "5-8" => (5L, 8L); case "9+" => (9L, Long.MaxValue)
      }
      assert(nd >= nc * lo, s"$band: $nd docs < $nc clusters x $lo")
      if (hi < Long.MaxValue) assert(nd <= nc * hi, s"$band: $nd docs > $nc x $hi")
      assert(math.abs(share - nd.toDouble / n) < 1e-6)
    }
  }

  test("q182: groups are real prefix matches; canonical is the min member") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q182_shared_prefix")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, ns, _) => assert(n >= 2 && ns >= 1 && ns <= n) }
    // recompute groups from raw prefixes
    val docs = graft.sources.Tables.table(spark, sf(), "documents")
    val prefixes = docs.select(col("doc_id"),
        split(graft.functions.TextExprs.cleanText(col("text")), " ").as("t"))
      .where(size(col("t")) >= 10)
      .select(col("doc_id"), concat_ws(" ", slice(col("t"), 1, 10)).as("p"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val groups = prefixes.groupBy(_._2).filter(_._2.length >= 2)
    assert(rows.length == groups.size)
    assert(rows.map(_._4).toSet == groups.values.map(_.map(_._1).min).toSet)
  }

  test("q183: containment ratios bounded by jaccard identity; relation consistent") {
    val rows = SparkEntry.queries("q183_containment_direction")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getString(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, ca, cb, rel) =>
      assert(a < b)
      assert(ca > 0 && ca <= 1.0 + 1e-9 && cb > 0 && cb <= 1.0 + 1e-9)
      val want =
        if (ca >= 0.95 && cb >= 0.95) "mutual"
        else if (ca >= 0.95) "a_in_b"
        else if (cb >= 0.95) "b_in_a" else "partial"
      assert(rel == want, s"($a,$b): $rel != $want")
      // pairs come from the >= 0.7-jaccard verify: j = i/(na+nb-i) and
      // max(ca, cb) >= j always
      assert(math.max(ca, cb) >= 0.7 - 1e-6)
    }
  }

  test("q184: overflow shares ordered; token loss consistent with a driver recompute") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q184_ctx_overflow")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6), r.getDouble(7)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, nt, s512, s2048, s8192, lost, ls) =>
      assert(s512 >= s2048 && s2048 >= s8192, "overflow shares must be monotone in cap")
      assert(lost >= 0 && (nt == 0 || math.abs(ls - lost.toDouble / nt) < 1e-6))
    }
    val src0 = rows.find(_._1 == "src0").get
    val lens = graft.sources.Tables.table(spark, sf(), "documents")
      .where(col("source") === "src0")
      .select(graft.functions.TextExprs.tokenCount(col("text")))
      .collect().map(_.getLong(0))
    assert(src0._2 == lens.length && src0._3 == lens.sum)
    assert(src0._7 == lens.map(n => math.max(0L, n - 2048L)).sum)
  }

  test("q185: entropy and gap CV match a driver recompute for the busiest user") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q185_bot_profile")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, nt, h, cv, bot) =>
      assert(n >= 5 && nt >= 1 && h >= -1e-9 && h <= math.log(nt.toDouble) + 1e-9)
      assert(bot == (h < 0.5 || cv.exists(_ < 0.1)))
    }
    val top = rows.maxBy(_._2)
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .where(col("user_id") === top._1)
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val n = ev.length.toDouble
    val clnc = ev.groupBy(_._1).values.map(_.length.toDouble)
      .map(c => c * math.log(c)).sum
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(top._4 - r4(math.log(n) - clnc / n)) < 1e-9, "entropy recompute")
    val gaps = ev.sortBy(e => (e._2, e._3)).map(_._2).sliding(2)
      .map { case Array(a, b) => (b - a).toDouble / 1e6 }.toArray
    val k = gaps.length.toDouble
    val s1 = gaps.sum; val s2 = gaps.map(g => g * g).sum
    val cvWant = r4(math.sqrt((s2 - s1 * s1 / k) / (k - 1)) / (s1 / k))
    assert(math.abs(top._5.get - cvWant) < 1e-3, s"gap cv ${top._5.get} vs $cvWant")
  }

  test("q186: funnel step counts are monotone and conversions recompute") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q186_funnel")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("1_view", "2_click", "3_purchase"))
    val Seq(v, c, p) = rows.toSeq
    assert(v._2 >= c._2 && c._2 >= p._2, "funnel must narrow")
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(c._3 == r4(c._2.toDouble / v._2) && p._3 == r4(p._2.toDouble / c._2))
    assert(p._4 == r4(p._2.toDouble / v._2), "top conversion")
    // sequential semantics: step-2 users are a subset of users with BOTH a
    // view and a later click (driver recompute on the raw table)
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), col("event_type"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val nClick = ev.groupBy(_._1).count { case (_, es) =>
      val vs = es.filter(_._2 == "view").map(_._3)
      vs.nonEmpty && es.exists(e => e._2 == "click" && e._3 > vs.min)
    }
    assert(c._2 == nClick, s"click-step recompute: ${c._2} vs $nClick")
  }

  test("q187: cohort retention anchors at offset 0 and cells stay in [0,1]") {
    val rows = SparkEntry.queries("q187_cohort_retention")(spark, sf()).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, off, act, size, ret) =>
      assert(off >= 0 && act >= 1 && act <= size)
      assert(ret >= 0.0 && ret <= 1.0)
    }
    // offset 0 is every cohort member's first-activity week: retention = 1
    val zero = rows.filter(_._2 == 0L)
    assert(zero.nonEmpty && zero.forall(r => r._3 == r._4 && r._5 == 1.0))
    // cohort sizes sum to the distinct-user count
    val users = graft.sources.Tables.table(spark, sf(), "events")
      .select("user_id").distinct().count()
    assert(zero.map(_._4).sum == users, "cohorts partition the users")
  }

  test("q188: Lorenz deciles tile the users; cum_share is monotone to 1.0") {
    val rows = SparkEntry.queries("q188_event_concentration")(spark, sf())
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val events = graft.sources.Tables.table(spark, sf(), "events").count()
    val users = graft.sources.Tables.table(spark, sf(), "events")
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum == users && rows.map(_._3).sum == events)
    // ntile over an ascending sort: decile mean volumes are non-decreasing
    val means = rows.map(r => r._3.toDouble / r._2)
    assert(means.sliding(2).forall { case Array(a, b) => b >= a - 1e-9 })
    assert(rows.last._5 == 1.0, "cumulative share ends at 1")
    val cums = rows.map(_._5)
    assert(cums.sliding(2).forall { case Array(a, b) => b >= a })
  }

  test("q189: Hill estimator matches a driver recompute on the sorted tail") {
    val row = SparkEntry.queries("q189_length_tail_index")(spark, sf()).collect()
    assert(row.length == 1)
    val (n, k, xk1, h, a) = (row(0).getLong(0), row(0).getLong(1),
      row(0).getLong(2), row(0).getDouble(3), row(0).getDouble(4))
    val lens = graft.sources.Tables.table(spark, sf(), "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, nc) => (-nc, id) }.map(_._2)
    assert(n == lens.length && k == n * 5 / 100 && xk1 == lens(k.toInt))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hWant = lens.take(k.toInt).map(x => math.log(x.toDouble / xk1)).sum / k
    assert(math.abs(h - r4(hWant)) < 1e-9 && a == r4(1.0 / hWant))
    assert(h > 0 && a > 0, "top-k lengths strictly exceed the threshold region")
  }

  test("q190: dispersion identity matches the explicit pairwise mean for one label") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q190_embed_dispersion")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 10 && rows.forall(_._2 > 1))
    rows.foreach { case (_, _, cn, mpd) =>
      assert(cn >= 0 && mpd >= -1.0 - 1e-9 && mpd <= 1.0 + 1e-9)
    }
    val lab = rows.minBy(_._1)._1
    val vecs = graft.sources.Tables.table(spark, sf(), "embeddings")
      .where(col("label") === lab).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length
    val pair = (for (i <- vecs.indices; j <- vecs.indices if i != j)
      yield vecs(i).zip(vecs(j)).map { case (a, b) => a * b }.sum).sum /
      (n.toDouble * (n - 1))
    val got = rows.find(_._1 == lab).get._4
    assert(math.abs(got - pair) < 1e-3, s"identity vs pairwise: $got vs $pair")
  }

  test("q191: contamination counts recompute from a driver as-of scan") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q191_post_incident")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.length == 4 && !rows.exists(_._1 == "error"))
    rows.foreach { case (_, n, after, w60, rate) =>
      assert(w60 <= after && after <= n && rate >= 0.0 && rate <= 1.0)
    }
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime * 1000, r.getLong(3)))
    val byUser = ev.groupBy(_._1).values
    var after = 0L; var w60 = 0L
    byUser.foreach { es =>
      var lastErr = Long.MinValue
      es.sortBy(e => (e._3, e._4)).foreach { e =>
        if (e._2 == "click") {
          if (lastErr != Long.MinValue) {
            after += 1
            if ((e._3 - lastErr).toDouble / 1e6 <= 60.0) w60 += 1
          }
        }
        if (e._2 == "error") lastErr = e._3
      }
    }
    val click = rows.find(_._1 == "click").get
    assert(click._3 == after && click._4 == w60,
      s"click recompute: ${(click._3, click._4)} vs ${(after, w60)}")
  }

  test("q192: full source-pair matrix; cosine recomputes for one pair") {
    val rows = SparkEntry.queries("q192_source_style")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val srcs = rows.flatMap(r => Seq(r._1, r._2)).distinct.length
    assert(rows.length == srcs * (srcs - 1) / 2, "one row per unordered pair")
    rows.foreach { case (a, b, sh, cos) =>
      assert(a < b && sh > 0 && cos > 0.0 && cos <= 1.0 + 1e-9)
    }
    val (sa, sb) = (rows.head._1, rows.head._2)
    def gramCounts(src: String): Map[String, Long] =
      graft.sources.Tables.table(spark, sf(), "documents")
        .where(org.apache.spark.sql.functions.col("source") === src)
        .select(org.apache.spark.sql.functions.lower(
          graft.functions.TextExprs.cleanText(
            org.apache.spark.sql.functions.col("text"))))
        .collect().map(_.getString(0)).filter(_.length >= 3)
        .flatMap(t => t.sliding(3))
        .groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
    val (ca, cb) = (gramCounts(sa), gramCounts(sb))
    val dot = ca.keySet.intersect(cb.keySet).toSeq
      .map(g => ca(g).toDouble * cb(g)).sum
    val want = dot / (math.sqrt(ca.values.map(c => c.toDouble * c).sum) *
      math.sqrt(cb.values.map(c => c.toDouble * c).sum))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = rows.find(r => r._1 == sa && r._2 == sb).get
    assert(got._3 == ca.keySet.intersect(cb.keySet).size.toLong)
    assert(math.abs(got._4 - r6(want)) < 1e-9, s"cosine ${got._4} vs $want")
  }

  test("q193: 2x2 cells tile the corpus and the odds ratio recomputes") {
    val row = SparkEntry.queries("q193_dup_quality_interaction")(spark, sf())
      .collect()
    assert(row.length == 1)
    val r = row(0)
    val (dp, df_, up, uf) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val total = graft.sources.Tables.table(spark, sf(), "documents").count()
    assert(dp + df_ + up + uf == total, "cells tile the corpus")
    assert(dp + df_ > 0, "the fixture carries template duplicates")
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == r4(dp.toDouble / (dp + df_)))
    assert(r.getDouble(5) == r4(up.toDouble / (up + uf)))
    if (!r.isNullAt(6))
      assert(r.getDouble(6) == r4(dp.toDouble * uf / (df_.toDouble * up)))
  }

  test("q194: OLS statistics recompute from the zero-filled daily series") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q194_daily_trend")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    assert(rows.length == 5)
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("event_type"), col("ts").cast("date").as("day"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val d0 = ev.map(_._2).min
    val nd = java.time.temporal.ChronoUnit.DAYS.between(d0, ev.map(_._2).max) + 1
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (tpe, n, tot, slope, icept, r2) =>
      assert(n == nd)
      val counts = ev.filter(_._1 == tpe).groupBy(_._2).map { case (d, xs) =>
        java.time.temporal.ChronoUnit.DAYS.between(d0, d) -> xs.length.toLong
      }
      val ys = (0L until nd).map(x => (x, counts.getOrElse(x, 0L)))
      assert(tot == ys.map(_._2).sum)
      val (sx, sxx) = (ys.map(_._1).sum, ys.map(x => x._1 * x._1).sum)
      val (sy, sxy) = (ys.map(_._2).sum, ys.map(x => x._1 * x._2).sum)
      val syy = ys.map(x => x._2 * x._2).sum
      val varXN = nd * sxx - sx * sx
      assert(slope == r6((nd * sxy - sx * sy).toDouble / varXN))
      assert(icept == r6((sy * sxx - sx * sxy).toDouble / varXN))
      val varYN = nd * syy - sy * sy
      if (varYN > 0) {
        val cn = nd * sxy - sx * sy
        assert(r2.get == r6(cn.toDouble * cn / (varXN.toDouble * varYN)))
        assert(r2.get >= 0 && r2.get <= 1.0 + 1e-9)
      } else assert(r2.isEmpty)
    }
  }

  test("q195: exactly one peak family; cusum ends at zero and recomputes") {
    val rows = SparkEntry.queries("q195_changepoint")(spark, sf()).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
      .sortBy(_._1)
    assert(rows.length >= 2, "at least two days of events")
    assert(rows.exists(_._4), "a peak day is flagged")
    // cusum telescopes to zero on the last day (sum of deviations)
    assert(math.abs(rows.last._3) < 1e-9, s"final cusum ${rows.last._3}")
    // driver recompute of the integer-scaled cusum and the peak set
    val nd = rows.length.toLong
    val total = rows.map(_._2).sum
    var rt = 0L
    val ncs = rows.zipWithIndex.map { case ((_, c, _, _), idx) =>
      rt += c; nd * rt - (idx + 1) * total
    }
    val peak = ncs.map(math.abs).max
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.zip(ncs).foreach { case ((_, _, cusum, isPeak), nc) =>
      assert(cusum == r4(nc.toDouble / nd))
      assert(isPeak == (math.abs(nc) == peak))
    }
  }

  test("q196: MRR recomputes from an explicit ranking for one query") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q196_embed_mrr")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._2).sum == 50, "every probe query is scored once")
    rows.foreach { case (_, n, mrr, hit) =>
      assert(n >= 1 && mrr > 0.0 && mrr <= 1.0 && hit >= 0.0 && hit <= 1.0)
    }
    // explicit first-rank for query 0
    val all = graft.sources.Tables.table(spark, sf(), "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](0 max 2).map(_.toDouble).toArray))
    val q0 = all.find(_._1 == 0L).get
    val ranked = all.filter(_._1 != 0L).map { c =>
      val dot = q0._3.zip(c._3).map { case (a, b) => a * b }.sum
      val cos = dot / (math.sqrt(q0._3.map(x => x * x).sum) *
        math.sqrt(c._3.map(x => x * x).sum))
      (c._1, c._2, cos)
    }.sortBy(r => (-r._3, r._1))
    val firstRank = ranked.indexWhere(_._2 == q0._2) + 1
    assert(firstRank >= 1, "some same-label neighbor exists")
    // the label-row MRR aggregates query 0's reciprocal rank; spot-check
    // via a direct engine-side recompute of the same query's first_rank
    val engineFirst = {
      val emb = graft.sources.Tables.table(spark, sf(), "embeddings")
      val q = emb.where(col("vec_id") === 0L)
        .select(col("label").as("qlab"), col("embedding").as("qv"))
      val c = emb.where(col("vec_id") =!= 0L)
        .select(col("vec_id").as("cid"), col("label").as("clab"), col("embedding").as("cv"))
      c.crossJoin(q).select(col("cid"), col("qlab"), col("clab"),
          graft.functions.VectorExprs.cosine(col("qv"), col("cv")).as("cos"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
        .sortBy(r => (-r._4, r._1)).indexWhere(r => r._2 == r._3) + 1
    }
    assert(engineFirst == firstRank, s"rank parity: $engineFirst vs $firstRank")
  }

  test("q197: assortativity is a valid correlation; degrees recompute") {
    val row = SparkEntry.queries("q197_neardup_assortativity")(spark, sf())
      .collect()
    assert(row.length == 1)
    val r = row(0)
    val (e, n, md) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(e >= 1 && n >= 2, "the fixture has near-dup pairs")
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(md == r4(2.0 * e / n), "handshake identity 2|E|/|V|")
    if (!r.isNullAt(3)) {
      val a = r.getDouble(3)
      assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9)
    }
  }

  test("q198: every reported pair's edit distance recomputes exactly") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q198_editdist_neardup")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty, "the fixture has short-text near-dups")
    val texts = graft.sources.Tables.table(spark, sf(), "documents")
      .where(col("n_chars") <= 512)
      .select(col("doc_id"), graft.functions.TextExprs.cleanText(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val t = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      d(a.length)
    }
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (ia, ib, ed, sim) =>
      assert(ia < ib)
      val (ta, tb) = (texts(ia), texts(ib))
      val want = lev(ta, tb)
      assert(ed == want, s"lev($ia,$ib): $ed vs $want")
      assert(sim == r4(1.0 - want.toDouble / math.max(ta.length, tb.length)))
      assert(sim >= 0.8)
      // the blocked candidates share their 3-token opening
      assert(ta.split(" ").take(3).toSeq == tb.split(" ").take(3).toSeq)
    }
  }

  test("q199: session buckets tile q35's sessions; conversion recomputes") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q199_session_conversion")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (_, n, c, rate) =>
      assert(c <= n && rate == r4(c.toDouble / n))
    }
    val q35 = SparkEntry.queries("q35_sessionize")(spark, sf())
    assert(rows.map(_._2).sum == q35.count(),
      "bucket counts tile the q35 session set")
    // conversion recount straight from raw events per q35 session bounds
    val purchasers = graft.sources.Tables.table(spark, sf(), "events")
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    val sessions = q35.collect().map(r => (r.getLong(0),
      r.getTimestamp(3), r.getTimestamp(4)))
    val conv = sessions.count { case (u, a, b) =>
      purchasers.exists(p => p._1 == u && !p._2.before(a) && !p._2.after(b))
    }
    assert(rows.map(_._3).sum == conv, "total conversions match raw recount")
  }

  test("q200: transition rows normalize per cur_type; counts recompute") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q200_event_transitions")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 25)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val tot = g.map(_._3).sum
      def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      g.foreach(r => assert(r._4 == r4(r._3.toDouble / tot)))
    }
    // driver recount of one cell from the raw stream
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime * 1000, r.getLong(3)))
    val want: Long = ev.groupBy(_._1).values.map { es =>
      es.sortBy(e => (e._3, e._4)).toSeq.sliding(2).count {
        case Seq(a, b) => a._2 == "view" && b._2 == "click" &&
          b._3 - a._3 <= 1800L * 1000000L
        case _ => false
      }.toLong
    }.sum
    val got = rows.find(r => r._1 == "view" && r._2 == "click").map(_._3).getOrElse(0L)
    assert(got == want, s"view->click recount: $got vs $want")
  }

  test("q201: pair mass matches q27's pair count; labels are ordered") {
    val rows = SparkEntry.queries("q201_crosssource_leakage")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (lo, hi, n, cross) =>
      assert(lo <= hi && n >= 1 && cross == (lo != hi))
    }
    val totalPairs = SparkEntry.queries("q27_minhash_neardup")(spark, sf()).count()
    assert(rows.map(_._3).sum == totalPairs,
      "source-pair grid tiles the verified pair set")
  }

  test("q202: median/MAD and the outlier fence recompute from raw values") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q202_mad_outliers")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.length == 5)
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def q50(xs: Array[Double]): Double = {
      val s = xs.sorted; val h = (s.length - 1) * 0.5
      val lo = s(h.toInt)
      if (h == h.toInt) lo else lo + (h - h.toInt) * (s(h.toInt + 1) - lo)
    }
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (tpe, n, med4, mad4, nOut, rate) =>
      val vs = ev.filter(_._1 == tpe).map(_._2)
      assert(n == vs.length)
      val med = q50(vs)
      val mad = q50(vs.map(v => math.abs(v - med)))
      assert(med4 == r4(med) && mad4 == r4(mad))
      val want = vs.count(v => math.abs(v - med) > 3.0 * 1.4826 * mad)
      assert(nOut == want && rate == r4(want.toDouble / n))
    }
  }

  test("q204: decorrelated threshold matches a per-part driver recompute") {
    import org.apache.spark.sql.functions.col
    val row = SparkEntry.queries("q204_small_qty_revenue")(spark, sf()).collect()
    assert(row.length == 1)
    val (n, rev) = (row(0).getLong(0), row(0).getDouble(1))
    val widget = graft.sources.Tables.table(spark, sf(), "part")
      .where(col("p_name").like("%widget%"))
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val li = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .filter(r => widget(r._1))
    val byPart = li.groupBy(_._1)
    val small = byPart.values.flatMap { xs =>
      val aq = xs.map(_._2).sum / xs.length
      xs.filter(_._2 < 0.2 * aq)
    }.toSeq
    def r2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(n == small.length, s"n_small $n vs ${small.length}")
    assert(rev == r2(small.map(_._3).sum / 7.0))
  }

  test("q205: segments tile the users; quintiles are balanced per axis") {
    val rows = SparkEntry.queries("q205_rfm_segments")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val users = graft.sources.Tables.table(spark, sf(), "events")
      .select("user_id").distinct().count()
    assert(rows.map(_._4).sum == users, "segment counts tile the users")
    rows.foreach { case (r, f, m, n, avg) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
      assert(n >= 1 && avg > 0)
    }
    // each axis's quintiles are ntile-balanced (sizes differ by <= 1)
    Seq[((Long, Long, Long, Long, Double)) => Long](_._1, _._2, _._3)
      .foreach { ax =>
        val sizes = rows.groupBy(ax).map { case (_, g) => g.map(_._4).sum }
        assert(sizes.max - sizes.min <= 1, s"ntile balance violated: $sizes")
      }
  }

  test("q206: backlog never negative, ends at zero, and one day recomputes") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q206_order_backlog")(spark, sf()).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getLong(3)))
      .sortBy(_._1)
    assert(rows.length > 100)
    rows.foreach(r => assert(r._4 >= 0, s"negative backlog at ${r._1}"))
    assert(rows.last._4 == 0, "all spans closed by the final delta day")
    assert(rows.map(r => r._2 - r._3).sum == 0, "opens balance closes")
    // recompute the backlog for the median day by interval counting
    val mid = rows(rows.length / 2)._1
    val close = graft.sources.Tables.table(spark, sf(), "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(org.apache.spark.sql.functions.max(col("l_shipdate").cast("date")).as("c"))
    val spans = graft.sources.Tables.table(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o"))
      .join(close, col("o_orderkey") === col("l_orderkey"))
      .select("o", "c").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate))
      .map { case (o, c) => (o, if (c.isBefore(o)) o else c) }
    val want = spans.count { case (o, c) => !o.isAfter(mid) && !c.isBefore(mid) }
    assert(rows(rows.length / 2)._4 == want, s"backlog at $mid: $want")
  }

  test("weightedByGroup: hand-computed weighted quantiles on a tiny frame") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // group a: values 1(w1) 2(w1) 10(w8) → W=10; t(p50)=5 → 10; t(p10)=1 → 1
    // group b: values 5(w2) 7(w3)       → W=5;  t(p50)=3 → 7;  t(p10)=1 → 5
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 10.0, 8L),
      ("b", 5.0, 2L), ("b", 7.0, 3L)).toDF("g", "v", "w")
    val out = graft.operators.Percentiles.weightedByGroup(
        df, col("g"), col("v"), col("w"), Seq(0.1, 0.5), Seq("p10", "p50"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("a") == ((1.0, 10.0)))
    assert(out("b") == ((5.0, 7.0)))
  }

  test("q207: weighted median recomputes; token mass shifts it right") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q207_token_weighted_length")(spark, sf())
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 20)
    rows.foreach { case (_, p50, w50, w90) =>
      assert(w90 >= w50, "weighted p90 >= weighted p50")
      assert(w50 >= math.floor(p50).toLong,
        "token weighting cannot move the median left (w = v)")
    }
    val src = rows.head._1
    val lens = graft.sources.Tables.table(spark, sf(), "documents")
      .where(col("source") === src)
      .select(graft.functions.TextExprs.tokenCount(col("text")))
      .collect().map(_.getLong(0)).filter(_ > 0).sorted
    val bigW = lens.map(BigInt(_)).sum
    def wq(p: Double): Long = {
      val t = (BigDecimal(p) * BigDecimal(bigW)).setScale(0, BigDecimal.RoundingMode.CEILING).toBigInt
      var c = BigInt(0)
      lens.find { n => c += n; c >= t }.get
    }
    val got = rows.find(_._1 == src).get
    assert(got._3 == wq(0.5) && got._4 == wq(0.9),
      s"driver weighted quantiles: ${(got._3, got._4)} vs ${(wq(0.5), wq(0.9))}")
  }

  test("q208: distinct-n recomputes for one source; ratios fall with n mass") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q208_distinct_ngrams")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.length == 60, "20 sources x 3 n")
    rows.foreach { case (_, n, tot, dist, ratio) =>
      assert(n >= 1 && n <= 3 && dist <= tot && ratio > 0 && ratio <= 1.0)
    }
    val src = rows.head._1
    val toks = graft.sources.Tables.table(spark, sf(), "documents")
      .where(col("source") === src)
      .select(graft.functions.TextExprs.cleanText(col("text")))
      .collect().map(_.getString(0).split(" ").filter(_.nonEmpty).toSeq)
    (1 to 3).foreach { n =>
      val grams = toks.filter(_.length >= n)
        .flatMap(_.sliding(n).map(_.mkString(" ")))
      val got = rows.find(r => r._1 == src && r._2 == n).get
      assert(got._3 == grams.length && got._4 == grams.distinct.length,
        s"n=$n recompute for $src")
    }
  }

  test("q209: lift arithmetic recomputes from q35-consistent session sets") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q209_session_basket_lift")(spark, sf())
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 10, "all C(5,2) unordered type pairs co-occur")
    rows.foreach { case (a, b, n, lift) => assert(a < b && n >= 1 && lift > 0) }
    // recompute one pair's lift from the raw stream with the same gap rule
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000, r.getLong(2), r.getString(3)))
    val sessions = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      var sid = 0L
      var prev = Long.MinValue
      sorted.map { e =>
        if (prev == Long.MinValue || e._2 - prev > 1800L * 1000000L) sid += 1
        prev = e._2
        ((e._1, sid), e._4)
      }
    }.toSeq.groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }
    val nS = sessions.size.toLong
    val nA = sessions.count(_("view")).toLong
    val nB = sessions.count(_("purchase")).toLong
    val nAB = sessions.count(s => s("view") && s("purchase")).toLong
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = rows.find(r => r._1 == "purchase" && r._2 == "view").get
    assert(got._3 == nAB && got._4 == r4(nAB.toDouble * nS / (nA * nB)),
      s"purchase/view lift: ${got} vs ($nAB, ${nAB.toDouble * nS / (nA * nB)})")
  }

  test("q210: the 80% cut recomputes from sorted customer revenue") {
    import org.apache.spark.sql.functions.col
    val row = SparkEntry.queries("q210_pareto_revenue")(spark, sf()).collect()
    assert(row.length == 1)
    val (nc, top, share) = (row(0).getLong(0), row(0).getLong(1), row(0).getDouble(2))
    val rev = graft.sources.Tables.table(spark, sf(), "orders")
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).sum) }.toSeq
      .sortBy { case (k, c) => (-c, k) }
    assert(nc == rev.length)
    val total = rev.map(_._2).sum
    var cum = 0L
    val want = rev.count { case (_, c) => val before = cum; cum += c; before * 5 < total * 4 }
    assert(top == want, s"top80 count: $top vs $want")
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(share == r4(want.toDouble / nc))
    assert(share < 0.9, "the cut is a strict subset at any real skew")
  }

  test("q211: stickiness recomputes; DAU can never exceed MAU") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q211_stickiness")(spark, sf()).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nDays, avgDau, mau, st) =>
      assert(avgDau <= mau + 1e-9 && st > 0 && st <= 1.0 + 1e-9 && nDays >= 1)
    }
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), col("ts").cast("date")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val m0 = rows.head._1
    val inMonth = ev.filter(e => e._2.getYear == m0.getYear && e._2.getMonth == m0.getMonth)
    val mau = inMonth.map(_._1).distinct.length.toLong
    val dauSum = inMonth.distinct.groupBy(_._2).map(_._2.map(_._1).distinct.length).sum
    val nDays = inMonth.map(_._2).distinct.length.toLong
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = rows.find(_._1 == m0).get
    assert(got._2 == nDays && got._4 == mau)
    assert(got._5 == r4(dauSum.toDouble / (nDays * mau)))
  }

  test("q212: pearson matches q194-consistent series; |r| bounded") {
    val rows = SparkEntry.queries("q212_volume_correlation")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.length == 10, "all C(5,2) type pairs")
    rows.foreach { case (a, b, nd, r) =>
      assert(a < b && nd >= 2)
      r.foreach(v => assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9))
    }
    // recompute one pair from raw daily counts (zero-filled)
    import org.apache.spark.sql.functions.col
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("event_type"), col("ts").cast("date")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate))
    val d0 = ev.map(_._2).min
    val nd = java.time.temporal.ChronoUnit.DAYS.between(d0, ev.map(_._2).max) + 1
    def series(t: String): IndexedSeq[Long] = {
      val m = ev.filter(_._1 == t).groupBy(_._2).map { case (d, xs) =>
        java.time.temporal.ChronoUnit.DAYS.between(d0, d) -> xs.length.toLong
      }
      (0L until nd).map(m.getOrElse(_, 0L))
    }
    val (xs, ys) = (series("click"), series("view"))
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum; val syy = ys.map(a => a * a).sum
    val num = (nd * sxy - sx * sy).toDouble
    val den = math.sqrt((nd * sxx - sx * sx).toDouble) *
      math.sqrt((nd * syy - sy * sy).toDouble)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = rows.find(r => r._1 == "click" && r._2 == "view").get
    assert(got._4.contains(r6(num / den)), s"click/view r: ${got._4}")
  }

  test("q214: HHI recomputes for one nation and respects the 1/n floor") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q214_supplier_hhi")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.length >= 10, "every supplier-bearing nation reports")
    rows.foreach { case (_, n, rev, hhi) =>
      assert(rev > 0 && hhi > 0 && hhi <= 1.0 + 1e-9)
      assert(hhi >= 1.0 / n - 1e-9, "HHI is minimized by equal shares")
    }
    val nation = rows.head._1
    val sup = graft.sources.Tables.table(spark, sf(), "supplier")
      .join(graft.sources.Tables.table(spark, sf(), "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .where(col("n_name") === nation)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val cents = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_suppkey"), col("l_extendedprice")).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .filter(r => sup(r._1))
      .groupBy(_._1).map(_._2.map(_._2).sum).toSeq
    val tot = cents.sum.toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = rows.find(_._1 == nation).get
    assert(got._2 == cents.length)
    assert(got._4 == r6(cents.map(c => c.toDouble * c).sum / (tot * tot)),
      s"HHI recompute for $nation")
  }

  test("multimodal: a custom MediaCodec drops into decode and feature stages") {
    import graft.multimodal._
    import org.apache.spark.sql.functions._
    object FixedCodec extends MediaCodec {
      override def decodeMeta(id: Long, bytes: Array[Byte], kind: String) =
        MediaMeta(id, kind, bytes.length.toLong, 7, 9, 3)
      override def encodeFeature(id: Long, bytes: Array[Byte], kind: String, dim: Int) = {
        val v = new Array[Float](dim); v(0) = 1f; MediaFeature(id, kind, v)
      }
    }
    val media = Multimodal.packFake(
      graft.sources.Tables.table(spark, sf(), "documents").limit(12))
    val meta = Multimodal.decodeMeta(media, FixedCodec).collect()
    assert(meta.nonEmpty && meta.forall(m => m.width == 7 && m.height == 9 && m.n_frames == 3))
    val feats = Multimodal.featureExtract(media, dim = 4, codec = FixedCodec).collect()
    assert(feats.nonEmpty && feats.forall(f => f.embedding.toSeq == Seq(1f, 0f, 0f, 0f)))
    // the default codec is the deterministic stub — q32/q41's oracle-pinned
    // behavior: spot-check one row against a direct StubCodec call
    val row = media.select(col("doc_id"), col("payload"), col("kind"))
      .orderBy("doc_id").limit(1).collect().head
    val direct = StubCodec.decodeMeta(row.getLong(0),
      row.getAs[Array[Byte]](1), row.getString(2))
    val viaOp = Multimodal.decodeMeta(media)
      .where(col("doc_id") === row.getLong(0)).collect().head
    assert(viaOp == direct)
  }

  test("withRunningMax: matches a driver prefix-max scan, nulls pass through") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Seq((1L, Some(5L)), (2L, None), (3L, Some(3L)), (4L, Some(9L)),
      (5L, None), (6L, Some(9L)), (7L, Some(1L)))
    val df = rows.toDF("id", "v")
    val got = graft.operators.GlobalRank.withRunningMax(
        df, Seq(col("id").asc), col("v"), "rmax", numPartitions = Some(3))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    var acc: Option[Long] = None
    val want = rows.map { case (id, v) =>
      acc = (acc.toSeq ++ v.toSeq).reduceOption((a: Long, b: Long) => math.max(a, b))
      (id, acc)
    }
    assert(got.toSeq == want, s"got ${got.toSeq}")
  }

  test("withRunningMax: all-null prefix stays null across partition boundaries") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1L to 20L).map(i => (i, if (i > 15) Some(i) else None)).toDF("id", "v")
    val got = graft.operators.GlobalRank.withRunningMax(
        df, Seq(col("id").asc), col("v"), "rmax", numPartitions = Some(5))
      .orderBy("id").collect()
    got.foreach { r =>
      val id = r.getLong(0)
      if (id <= 15) assert(r.isNullAt(2), s"id $id should carry null")
      else assert(r.getLong(2) == id, s"id $id running max")
    }
  }

  test("q215: blamed orders recompute — exactly one late supplier among >= 2") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q215_late_supplier")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, orders, supps) =>
      assert(supps <= orders, "a supplier is blamed at most once per order")
    }
    // independent driver recompute of the total blame count
    import org.apache.spark.sql.functions.unix_timestamp
    val li = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        unix_timestamp(col("l_shipdate")).as("e")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ord = graft.sources.Tables.table(spark, sf(), "orders")
      .select(col("o_orderkey"), unix_timestamp(col("o_orderdate")).as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val cut = 60L * 24 * 3600
    val perOS = li.groupBy(r => (r._1, r._2)).map { case ((o, s), ls) =>
      (o, s, ls.exists(l => l._3 > ord(o) + cut))
    }.toSeq
    val perO = perOS.groupBy(_._1).map { case (o, ss) =>
      o -> ((ss.size, ss.count(_._3)))
    }
    val blame = perOS.filter(_._3).count { case (o, _, _) =>
      val (nSupp, nLate) = perO(o); nSupp >= 2 && nLate == 1
    }
    assert(rows.map(_._2).sum == blame, s"total blame orders = $blame")
  }

  test("q216: distribution covers every customer and the zero bucket exists") {
    val rows = SparkEntry.queries("q216_custdist")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nCust = graft.sources.Tables.table(spark, sf(), "customer").count()
    assert(rows.map(_._2).sum == nCust, "buckets tile the customer set")
    // the shape's point: dormant customers are NOT dropped
    val nWith = graft.sources.Tables.table(spark, sf(), "orders")
      .where(org.apache.spark.sql.functions.col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey").distinct().count()
    val zero = rows.find(_._1 == 0L).map(_._2).getOrElse(0L)
    assert(zero == nCust - nWith, "zero bucket = customers minus matched")
  }

  test("q217: every reported customer is rich and recently dormant") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q217_dormant_rich")(spark, sf()).collect()
    val cust = graft.sources.Tables.table(spark, sf(), "customer").collect()
      .map(r => (r.getLong(0), r.getInt(2), math.round(r.getDouble(3) * 100)))
    val pos = cust.map(_._3).filter(_ > 0)
    val (s0, n0) = (pos.sum, pos.length.toLong)
    val ords = graft.sources.Tables.table(spark, sf(), "orders")
      .select(col("o_custkey"), unix_timestamp(col("o_orderdate")).as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cutoff = ords.map(_._2).max - 180L * 24 * 3600
    val recent = ords.filter(_._2 > cutoff).map(_._1).toSet
    val want = cust.filter { case (k, nat, c) =>
      Seq(1, 3, 5, 7, 9).contains(nat) && c * n0 > s0 && !recent(k)
    }
    val wantByNat = want.groupBy(_._2).map { case (nat, cs) =>
      (nat, (cs.length.toLong, cs.map(_._3).sum)) }
    assert(rows.map(_.getLong(1)).sum == want.length.toLong, "customer total")
    rows.foreach { r =>
      val (n, cents) = wantByNat(r.getInt(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(2) - cents / 100.0) < 0.005)
    }
  }

  test("q218: buckets tile lineitem; load factors average to 1") {
    val rows = SparkEntry.queries("q218_shuffle_skew")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val n = graft.sources.Tables.table(spark, sf(), "lineitem").count()
    assert(rows.map(_._3).sum == n, "bucket rows tile the table")
    assert(rows.forall(r => r._4 <= r._3), "heaviest key bounded by bucket rows")
    assert(rows.forall(r => r._2 <= r._3), "keys never exceed rows")
    val mean = rows.map(_._5).sum / rows.length
    assert(math.abs(mean - 1.0) < 0.05, s"load factors center on 1, got $mean")
    assert(rows.map(_._1).distinct.length == rows.length, "buckets distinct")
  }

  test("q219: split docs recompute from a driver prefix sum in doc_id order") {
    val rows = SparkEntry.queries("q219_packing_audit")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = graft.sources.Tables.table(spark, sf(), "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"),
        graft.functions.TextExprs.tokenCount(
          org.apache.spark.sql.functions.col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    var cum = 0L
    val split = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val total = scala.collection.mutable.Map.empty[String, (Long, Long)].withDefaultValue((0L, 0L))
    docs.foreach { case (_, src, n) =>
      val first = (cum) / 2048; cum += n
      val last = (cum - 1) / 2048
      if (n > 0 && last > first) split(src) += 1
      val (d, t0) = total(src); total(src) = (d + 1, t0 + n)
    }
    rows.foreach { case (src, nd, nt, ns) =>
      assert((nd, nt) == total(src), s"docs/tokens for $src")
      assert(ns == split(src), s"split count for $src")
    }
    assert(rows.map(_._4).sum > 0, "the fixture produces at least one straddle")
  }

  test("q220: stats recompute for a numeric, a string, and the date column") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q220_table_stats")(spark, sf()).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 11, "one row per lineitem column")
    val li = graft.sources.Tables.table(spark, sf(), "lineitem")
    val n = li.count()
    assert(rows.values.forall(_.getLong(1) == n))
    val qty = li.select("l_quantity").collect().map(_.getDouble(0))
    val r = rows("l_quantity")
    assert(r.getLong(3) == qty.distinct.length.toLong, "NDV l_quantity")
    assert(r.getDouble(4) == qty.min && r.getDouble(5) == qty.max)
    val rf = rows("l_returnflag")
    val flags = li.select("l_returnflag").collect().map(_.getString(0))
    assert(rf.getLong(3) == flags.distinct.length.toLong)
    assert(math.abs(rf.getDouble(6) - flags.map(_.length).sum.toDouble / n) < 1e-4)
    val sd = rows("l_shipdate")
    val eps = li.select(unix_timestamp(col("l_shipdate"))).collect().map(_.getLong(0))
    assert(sd.getDouble(4) == eps.min.toDouble && sd.getDouble(5) == eps.max.toDouble)
  }

  test("q221: the fixture is referentially intact and coverage is sane") {
    val rows = SparkEntry.queries("q221_fk_integrity")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.length == 5)
    rows.foreach { case (edge, child, orphanR, orphanK, parents, cov) =>
      assert(child > 0, edge)
      assert(orphanR == 0 && orphanK == 0, s"$edge must be intact in the fixture")
      assert(cov > 0 && cov <= 1.0, edge)
      assert(parents > 0, edge)
    }
    val li = graft.sources.Tables.table(spark, sf(), "lineitem").count()
    assert(rows.filter(_._1.startsWith("lineitem")).forall(_._2 == li))
    // nation: 25 parents, every one referenced by some customer at sf0.001?
    val natRow = rows.find(_._1.contains("c_nationkey")).get
    assert(natRow._5 == 25L)
  }

  test("q222: fingerprint is order-independent and flips on a 1-cent change") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q222_table_fingerprint")(spark, sf()).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set("orders", "customer", "supplier"))
    // independent recompute of the supplier fingerprint, rows reversed —
    // same sum (commutativity is the operator's point)
    val sup = graft.sources.Tables.table(spark, sf(), "supplier").collect()
      .map(r => s"${r.getLong(0)}|${r.getString(1)}|${r.getInt(2)}|${math.round(r.getDouble(3) * 100)}")
      .reverse
    val md = java.security.MessageDigest.getInstance("MD5")
    def h8(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    assert(sup.map(h8).sum == got("supplier")._2, "supplier fingerprint recompute")
    assert(sup.length.toLong == got("supplier")._1)
    // sensitivity: one cent on one row moves the fingerprint
    val tweaked = sup.updated(0, {
      val parts = sup(0).split('|'); parts(3) = (parts(3).toLong + 1).toString
      parts.mkString("|")
    })
    assert(tweaked.map(h8).sum != got("supplier")._2)
  }

  test("q223: triangle count recomputes from a driver edge scan") {
    import org.apache.spark.sql.functions.col
    val r = SparkEntry.queries("q223_triangle_census")(spark, sf()).collect().head
    val (nodes, nEdges, wedges, tris, cc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    val items = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val byOrder = items.groupBy(_._1).values
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byOrder.foreach { its =>
      val ps = its.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        pairCounts((ps(i), ps(j))) = pairCounts.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val edges = pairCounts.filter(_._2 >= 2).keys.toSet
    assert(nEdges == edges.size.toLong, "edge count")
    val adj = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    assert(nodes == adj.size.toLong)
    val wantW = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    assert(wedges == wantW, "wedges from degree sequence")
    val wantT = edges.toSeq.map { case (u, v) =>
      (adj(u) & adj(v)).count(z => u < z && v < z)
    }.sum.toLong
    assert(tris == wantT, s"triangles: got $tris want $wantT")
    assert(math.abs(cc - 3.0 * tris / wedges) < 1e-6)
  }

  test("q224: median-of-means recomputes; buckets cover the stream") {
    val r = SparkEntry.queries("q224_median_of_means")(spark, sf()).collect().head
    assert(r.getLong(1) == 16L, "all 16 hex nibbles occupied")
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select("event_id", "value").collect()
      .map(x => (x.getLong(0), x.getDouble(1)))
    assert(r.getLong(0) == ev.length.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
    def nib(id: Long): String =
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 1)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val means = ev.groupBy(e => nib(e._1)).values
      .map(vs => r6(vs.map(_._2).sum / vs.size)).toSeq.sorted
    val mid = means.length / 2
    val median = if (means.length % 2 == 1) means(mid)
      else (means(mid - 1) + means(mid)) / 2
    assert(r.getDouble(3) == r4(median), "median of bucket means")
  }

  test("q225: drawdown is non-negative, peaks are monotone across years") {
    val rows = SparkEntry.queries("q225_revenue_drawdown")(spark, sf()).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, nd, peak, dd, share) =>
      assert(nd > 0 && peak > 0 && dd >= 0 && dd <= peak)
      assert(math.abs(share - dd.toDouble / peak) < 1e-4)
    }
    // running peak never decreases year over year
    rows.map(_._3).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a, "yearly peak_cents must be monotone")
      case _ =>
    }
    // driver recompute of one year's max drawdown
    val daily = graft.sources.Tables.table(spark, sf(), "orders")
      .select(org.apache.spark.sql.functions.col("o_orderdate").cast("date").as("d"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("o_totalprice") * 100).cast("long").as("c"))
      .groupBy("d").agg(org.apache.spark.sql.functions.sum("c").as("cents"))
      .collect().map(r => (r.get(0).toString, r.getLong(1))).sortBy(_._1)
    var peak = 0L
    val byYear = scala.collection.mutable.Map.empty[Int, Long]
    daily.foreach { case (day, c) =>
      peak = math.max(peak, c)
      val yr = day.substring(0, 4).toInt
      byYear(yr) = math.max(byYear.getOrElse(yr, 0L), peak - c)
    }
    rows.foreach { case (yr, _, _, dd, _) =>
      assert(dd == byYear(yr), s"max drawdown recompute for $yr")
    }
  }

  test("q226: FK edges estimate near 1; the skewed self-join under-estimates") {
    val rows = SparkEntry.queries("q226_join_estimate_audit")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7))).toSeq
    assert(rows.length == 4)
    val byName = rows.map(r => r._1 -> r).toMap
    // FK edge: every lineitem row matches exactly one order, so the join
    // size equals |lineitem| and the independence estimate is exact
    val fk = byName("lineitem*orders.orderkey")
    assert(fk._6 == fk._2, "FK join size = child rows")
    assert(math.abs(fk._8 - 1.0) < 0.05, s"FK estimate ratio ${fk._8}")
    // self m:n edge: Cauchy-Schwarz makes sum(c^2) >= n^2/ndv, so the
    // independence estimate cannot exceed the actual
    val self = byName("events*events.user_id")
    assert(self._8 <= 1.0 + 1e-9, s"self-join ratio ${self._8}")
    assert(self._6 >= self._2.toDouble * self._2 / self._4 - 1, "Cauchy-Schwarz floor")
    // actual recompute for the self edge
    val users = graft.sources.Tables.table(spark, sf(), "events")
      .select("user_id").collect().map(_.getLong(0))
    val want = users.groupBy(identity).values.map(v => v.size.toLong * v.size).sum
    assert(self._6 == want, "self-join actual recompute")
  }

  test("q227: CUPED arithmetic recomputes from raw per-user counts") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q227_cuped")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.map(_._1).sorted.toSeq == Seq("A", "B"))
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), unix_timestamp(col("ts")).as("e")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val md = java.security.MessageDigest.getInstance("MD5")
    def arm(u: Long): String = {
      val nib = md.digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.charAt(0)
      if ("01234567".contains(nib)) "A" else "B"
    }
    val perUser = ev.groupBy(_._1).map { case (u, es) =>
      (arm(u), es.count(_._2 < mid).toLong, es.count(_._2 >= mid).toLong)
    }.toSeq
    assert(rows.map(_._2).sum == perUser.length.toLong, "users tile the arms")
    // pooled theta from integer moments
    val (pn, psx, psy, psxy, psxx) = (perUser.length.toLong,
      perUser.map(_._2).sum, perUser.map(_._3).sum,
      perUser.map(p => p._2 * p._3).sum, perUser.map(p => p._2 * p._2).sum)
    val theta = (pn * psxy - psx * psy).toDouble / (pn * psxx - psx * psx)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (a, n, meanY, varY, varAdj, redu, th) =>
      assert(th == r6(theta), "pooled theta")
      val arm0 = perUser.filter(_._1 == a)
      assert(n == arm0.length.toLong)
      val (sy, syy) = (arm0.map(_._3).sum, arm0.map(p => p._3 * p._3).sum)
      assert(math.abs(meanY - sy.toDouble / n) < 1e-3)
      val vY = (n * syy - sy * sy).toDouble / (n.toDouble * n)
      assert(math.abs(varY - vY) < 1e-3)
      // variance identity: var_cuped = varY - 2θcov + θ²varX >= varY·(1-ρ²)
      assert(varAdj >= 0)
      assert(math.abs(redu - (1 - varAdj / varY)) < 1e-3)
    }
  }

  test("q228: gaps recompute per customer; p50 <= p90; segments partition gaps") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q228_reorder_gaps")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nGaps, nCust, mean, p50, p90) =>
      assert(nCust <= nGaps && nCust > 0)
      assert(p50 <= p90 && mean > 0)
    }
    val ords = graft.sources.Tables.table(spark, sf(), "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("d")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString))
    val nGapsWant = ords.groupBy(_._1).values.map(os => math.max(0, os.size - 1)).sum
    assert(rows.map(_._2).sum == nGapsWant.toLong, "gaps = orders minus customers-with-orders")
    // one customer's gap sequence recomputed
    val cust = ords.groupBy(_._1).filter(_._2.size >= 3).keys.min
    val days = ords.filter(_._1 == cust).sortBy(o => (o._3, o._2))
      .map(o => java.time.LocalDate.parse(o._3).toEpochDay).toSeq
    val gaps = days.sliding(2).map { case Seq(a, b) => b - a }.toSeq
    assert(gaps.forall(_ >= 0L))
  }

  test("q229: trigram counts recompute for one user; shares sum to 1") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q229_path_trigrams")(spark, sf()).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 0.01, "shares sum to ~1")
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("e")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val want = scala.collection.mutable.Map.empty[(String, String, String), Long]
      .withDefaultValue(0L)
    ev.groupBy(_._1).values.foreach { es =>
      val s = es.sortBy(x => (x._4, x._2)).toSeq
      s.sliding(3).foreach {
        case Seq(a, b, c) if b._4 - a._4 <= 1800 && c._4 - b._4 <= 1800 =>
          val k = (a._3, b._3, c._3)
          want(k) = want(k) + 1
        case _ =>
      }
    }
    assert(rows.map(r => r._1 -> r._2).toMap == want.toMap, "full trigram recompute")
  }

  test("q230: digit shares recompute; benford shares are the pinned constants") {
    val rows = SparkEntry.queries("q230_benford")(spark, sf()).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).sorted.toSeq == (1 to 9).toSeq, "all nine digits appear")
    val exp = SparkEntry.benfordShares.toMap
    rows.foreach { case (d, _, obs, ben, chi2) =>
      assert(ben == exp(d), s"pinned Benford share for digit $d")
      assert(obs >= 0 && obs <= 1 && chi2 >= 0)
    }
    assert(math.abs(rows.map(_._3).sum - 1.0) < 0.01)
    assert(rows.map(_._5).distinct.length == 1, "chi2 repeated identically")
    // leading digits recomputed from raw prices
    val want = graft.sources.Tables.table(spark, sf(), "orders")
      .select("o_totalprice").collect()
      .map(r => math.round(r.getDouble(0) * 100).toString.charAt(0).asDigit)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    rows.foreach { case (d, n, _, _, _) => assert(n == want(d), s"digit $d count") }
  }

  test("q231: merged partials equal a direct full recompute per priority") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q231_ivm_merge")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, st, dl, _, v) =>
      assert(st + dl == n, "slices partition each group")
      assert(v >= 0)
    }
    val raw = graft.sources.Tables.table(spark, sf(), "orders")
      .select(col("o_orderpriority"), round(col("o_totalprice")).cast("long").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byP = raw.groupBy(_._1)
    rows.foreach { case (p, n, _, _, mean, v) =>
      val xs = byP(p).map(_._2)
      assert(n == xs.length.toLong)
      val s0 = xs.sum
      def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(mean == r4(s0.toDouble / n), s"mean for $p")
      val ss = xs.map(x => x * x).sum
      assert(v == r4((ss.toDouble - s0.toDouble * s0 / n) / n), s"var for $p")
    }
  }

  test("q232: frontier matches a brute-force dominance scan and is an antichain") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q232_skyline")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    val parts = graft.sources.Tables.table(spark, sf(), "part")
      .select(col("p_partkey"), col("p_size"),
        round(col("p_retailprice") * 100).cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def dominated(p: (Long, Int, Long)): Boolean = parts.exists { q =>
      q._1 != p._1 && q._3 <= p._3 && q._2 >= p._2 &&
        (q._3 < p._3 || q._2 > p._2)
    }
    val want = parts.filterNot(dominated)
      .map(p => (p._1, p._3.toDouble / 100.0, p._2)).toSet
    assert(got.map(_._1) == want.map(_._1), s"frontier ids: got ${got.size} want ${want.size}")
    // antichain: no frontier point dominates another
    val f = got.toSeq
    for (a <- f; b <- f if a != b)
      assert(!(a._2 <= b._2 && a._3 >= b._3 && (a._2 < b._2 || a._3 > b._3)),
        s"$a dominates $b inside the frontier")
  }

  test("q233: the top-64 reproduces an independent E-S draw; sample skews long") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q233_weighted_sample")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.length == 64 && got.map(_._1).sorted.toSeq == (1L to 64L))
    val docs = graft.sources.Tables.table(spark, sf(), "documents")
      .select(col("doc_id"), col("n_chars")).where(col("n_chars") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 13)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4503599627370496.0
      BigDecimal(math.log(u) / w)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = docs.map { case (id, w) => (id, key(id, w)) }
      .sortBy { case (id, k) => (-k, id) }.take(64).map(_._1).toSeq
    assert(got.sortBy(_._1).map(_._2).toSeq == want, "exact E-S top-64")
    // weight-proportional: the sample over-represents long docs
    val sampleMean = got.map(_._3).sum.toDouble / got.length
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    assert(sampleMean > corpusMean,
      s"length-weighted sample mean $sampleMean vs corpus $corpusMean")
  }

  test("q234: postings-join phrase counts equal a driver bigram scan") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q234_phrase_search")(spark, sf()).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set("fast table", "table table", "spark window"))
    val texts = graft.sources.Tables.table(spark, sf(), "documents")
      .select(graft.functions.TextExprs.cleanText(col("text")).as("t"))
      .collect().map(_.getString(0).toLowerCase.split(" ").toSeq)
    got.foreach { case (ph, (nDocs, nOcc)) =>
      val Array(a, b) = ph.split(" ")
      val perDoc = texts.map(toks =>
        toks.sliding(2).count { case Seq(x, y) => x == a && y == b; case _ => false })
      assert(nOcc == perDoc.sum.toLong, s"occurrences for '$ph'")
      assert(nDocs == perDoc.count(_ > 0).toLong, s"docs for '$ph'")
      assert(nOcc >= nDocs && nDocs > 0, s"'$ph' must occur in the fixture")
    }
  }

  test("q235: the top spread part recomputes; ranks dense and ordered") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q235_price_dispersion")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 20)
    assert(rows.map(_._1).sorted.toSeq == (1L to 20L))
    val bySpread = rows.sortBy(_._1).map(_._6).toSeq
    bySpread.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b, "rel_spread non-increasing in rank")
      case _ =>
    }
    // recompute the winner from raw lineitem
    val top = rows.minBy(_._1)
    val unit = graft.sources.Tables.table(spark, sf(), "lineitem")
      .where(col("l_partkey") === top._2)
      .select(col("l_suppkey"),
        round(col("l_extendedprice") * 100 / col("l_quantity")).cast("long").as("uc"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val means = unit.groupBy(_._1).values
      .map(vs => vs.map(_._2).sum.toDouble / vs.size).toSeq
    assert(top._3 == means.length.toLong)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top._6 == r4((means.max - means.min) / means.min), "winner spread")
  }

  test("q236: deciles tile users; zero-order users are retained") {
    val rows = SparkEntry.queries("q236_engagement_revenue")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val nUsers = graft.sources.Tables.table(spark, sf(), "events")
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum == nUsers, "deciles tile the user base")
    assert(rows.map(_._1).sorted.toSeq == (1L to 10L))
    rows.foreach { case (_, n, _, buyers, rev, rpu) =>
      assert(buyers <= n)
      assert(rev >= 0 && rpu >= 0)
    }
    // ntile balance: sizes differ by at most 1
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1, s"ntile balance: $sizes")
  }

  test("q237: latency recomputes from a driver funnel scan") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("q237_funnel_latency")(spark, sf()).collect().head
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("e"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val lat = ev.groupBy(_._1).values.flatMap { es =>
      val views = es.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val tv = views.min
        val buys = es.filter(x => x._2 == "purchase" && x._3 > tv).map(_._3)
        if (buys.isEmpty) None else Some(buys.min - tv)
      }
    }.toSeq.sorted
    assert(r.getLong(0) == lat.length.toLong, "converted-user count")
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(1) == r4(lat.sum.toDouble / lat.length), "mean latency")
    // exact interpolated median recompute
    val p = 1.0 + 0.5 * (lat.length - 1)
    val (loIx, hiIx) = (math.floor(p).toInt - 1, math.ceil(p).toInt - 1)
    val med = lat(loIx) + (p - math.floor(p)) * (lat(hiIx) - lat(loIx))
    assert(r.getDouble(2) == r4(med), "p50 recompute")
  }

  test("q238: dwell stats recompute for every event type") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q238_dwell_time")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("e"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3)))
    val dwells = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(x => (x._4, x._2)).toSeq
      s.sliding(2).flatMap {
        case Seq(a, b) if b._4 - a._4 <= 1800 => Some((a._3, b._4 - a._4))
        case _ => None
      }
    }.toSeq
    val want = dwells.groupBy(_._1).map { case (t, vs) =>
      t -> ((vs.length.toLong, vs.map(_._2).sum.toDouble / vs.length)) }
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows.map(_._1).toSet == want.keySet)
    rows.foreach { case (t, n, mean) =>
      assert(n == want(t)._1, s"dwell count for $t")
      assert(mean == r4(want(t)._2), s"mean dwell for $t")
    }
  }

  test("Skyline.frontier2d: hand frame with duplicates and shared levels") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // (id, price, size): 1 dominates nothing-cheaper; 2 duplicated; 5
    // dominated same-price; 6 dominated cross-level; 7 cheapest-smallest
    val rows = Seq(
      (1L, 10L, 5), (2L, 20L, 8), (3L, 20L, 8), (4L, 30L, 9),
      (5L, 20L, 7), (6L, 25L, 6), (7L, 5L, 1))
    val df = rows.toDF("id", "price", "size")
    val got = graft.operators.Skyline.frontier2d(df, col("price"), col("size"))
      .select("id").collect().map(_.getLong(0)).toSet
    // 7: nothing cheaper. 1: cheaper rows max size 1 < 5. 2,3: duplicates
    // both kept (20,8); 5 beaten by same-price 8; 6 beaten by (20,8);
    // 4: strictly bigger than everything cheaper -> kept.
    assert(got == Set(1L, 2L, 3L, 4L, 7L), s"got $got")
  }

  private def cleanLower(s: String): String =
    s.trim.replaceAll("[\\x{10000}-\\x{10FFFF}]", "")
      .replaceAll("\\s+", " ").trim.toLowerCase

  test("q239: EWMA baseline and spike flag recomputed driver-side for every day") {
    import org.apache.spark.sql.functions.col
    val out = SparkEntry.queries("q239_ewma_anomaly")(spark, sf()).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getDouble(2),
        r.getBoolean(4)))
    assert(out.nonEmpty)
    val days = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("ts").cast("date")).collect().map(_.getDate(0).toLocalDate)
    val counts = days.groupBy(identity).map { case (d, xs) => d -> xs.length.toLong }
    val d0 = days.min(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    val w = SparkEntry.ewmaWeights.toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { case (day, n, ewma, spike) =>
      val i = day.toEpochDay - d0.toEpochDay + 1
      val terms = (1 to 12).filter(j => i - j >= 1).map { j =>
        val y = counts.getOrElse(day.minusDays(j), 0L)
        (w(j), w(j) * y)
      }
      val denom = terms.map(_._1).sum
      val numer = terms.map(_._2).sum
      assert(n == counts.getOrElse(day, 0L), s"count for $day")
      assert(ewma == r4(numer.toDouble / denom), s"ewma for $day")
      assert(spike == (n * denom > numer * 2), s"spike flag for $day")
    }
    // day 1 has no prior window and must be absent
    assert(!out.exists(_._1 == d0))
  }

  test("q240: curve monotone, final checkpoint = corpus totals, fit recomputed") {
    val rows = SparkEntry.queries("q240_heaps_law")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1)
    assert(rows.length == 20)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4, "running curve monotone")
    }
    // corpus totals recomputed driver-side at the gram grain
    val docs = graft.sources.Tables.table(spark, sf(), "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        cleanLower(r.getString(1)).split(" ").filter(_.nonEmpty))
    val grams = docs.map { case (id, ts) =>
      id -> (if (ts.length < 3) Seq.empty[String]
             else (0 to ts.length - 3).map(i => s"${ts(i)} ${ts(i + 1)} ${ts(i + 2)}"))
    }
    val last = rows.last
    assert(last._2 == docs.length.toLong, "checkpoint 20 covers every doc")
    assert(last._3 == grams.map(_._2.size.toLong).sum, "total gram instances")
    assert(last._4 == grams.flatMap(_._2).distinct.length.toLong, "distinct grams")
    // Heaps fit recomputed with the same 9-dp log pinning
    def rn(x: Double, n: Int) = BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pts = rows.filter(r => r._3 > 0 && r._4 > 0)
      .map(r => (rn(math.log(r._3.toDouble), 9), rn(math.log(r._4.toDouble), 9)))
    val n = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(rows.forall(r => math.abs(r._5 - rn(beta, 6)) < 2e-6), s"beta ${rows.head._5} vs $beta")
    assert(rows.forall(r => math.abs(r._6 - rn(math.exp((sy - beta * sx) / n), 6)) < 2e-6))
  }

  test("q241: full driver recompute of truth, candidates, and found per geometry") {
    val got = SparkEntry.queries("q241_blocking_quality")(spark, sf()).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got.keySet == SparkEntry.blockGeometries.toSet)
    val docs = graft.sources.Tables.table(spark, sf(), "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> cleanLower(r.getString(1)))
      .filter(d => d._1 < 500 && d._2.length >= 3) // the audit's fixed slice
    val shingles: Map[Long, Set[String]] = docs.map { case (id, tx) =>
      id -> (0 to tx.length - 3).map(i => tx.substring(i, i + 3)).toSet
    }.toMap
    val ids = shingles.keys.toSeq.sorted
    val truth = (for {
      ai <- ids.indices; bi <- (ai + 1) until ids.length
      (a, b) = (ids(ai), ids(bi))
      inter = (shingles(a) & shingles(b)).size
      if inter * 10 >= (shingles(a).size + shingles(b).size - inter) * 7
    } yield (a, b)).toSet
    def h(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(13), 16)
    }
    val sig: Map[Long, IndexedSeq[Long]] = shingles.map { case (id, ss) =>
      val hs = ss.toSeq.map(h)
      id -> SparkEntry.blockPerms.map { case (_, c) => hs.map(_ ^ c).min }.toIndexedSeq
    }
    SparkEntry.blockGeometries.foreach { case (nb, r) =>
      val cand = (0 until nb).flatMap { band =>
        ids.groupBy(id => sig(id).slice(band * r, band * r + r))
          .values.flatMap(g => for {
            ai <- g.indices; bi <- (ai + 1) until g.length
          } yield (g(ai), g(bi)))
      }.toSet
      val found = (truth & cand).size.toLong
      val (nd, nap, ntr, nc, nf) = got((nb, r))
      assert(nd == ids.length.toLong, s"n_docs at ${nb}x$r")
      assert(nap == ids.length.toLong * (ids.length - 1) / 2, s"all pairs at ${nb}x$r")
      assert(ntr == truth.size.toLong, s"truth at ${nb}x$r")
      assert(nc == cand.size.toLong, s"candidates at ${nb}x$r")
      assert(nf == found, s"found at ${nb}x$r")
    }
  }

  test("q242: WAU covers DAU; busiest day's WAU recomputed from raw events") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q242_rolling_active_users")(spark, sf()).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (d, dau, wau) => assert(wau >= dau, s"WAU >= DAU on $d") }
    val ud = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), col("ts").cast("date")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate)).distinct
    val busiest = rows.maxBy(_._2)._1
    val wantDau = ud.count(_._2 == busiest).toLong
    val wantWau = ud.filter { case (_, d) =>
      !d.isAfter(busiest) && !d.isBefore(busiest.minusDays(6))
    }.map(_._1).distinct.length.toLong
    val row = rows.find(_._1 == busiest).get
    assert(row._2 == wantDau && row._3 == wantWau, s"busiest-day recompute $row")
    // scaffold is dense: one row per day between min and max
    val span = rows.map(_._1.toEpochDay)
    assert(rows.length == (span.max - span.min + 1).toInt, "zero-filled scaffold")
  }

  test("q243: every status group recomputed from raw orders and lineitem") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("q243_order_reconciliation")(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) Double.NaN else r.getDouble(4), r.getDouble(5)))
      .toMap
    val calc = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .collect()
      .map(r => r.getLong(0) ->
        math.round(r.getDouble(1) * (1.0 - r.getDouble(2)) * (1.0 + r.getDouble(3)) * 100))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val orders = graft.sources.Tables.table(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getString(1), math.round(r.getDouble(2) * 100)))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    orders.groupBy(_._2).foreach { case (st, os) =>
      val withLines = os.flatMap(o => calc.get(o._1).map(c => math.abs(o._3 - c)))
      val (n, nnl, nex, mae, mxe) = got(st)
      assert(n == os.length.toLong, s"n_orders $st")
      assert(nnl == (os.length - withLines.length).toLong, s"n_no_lines $st")
      assert(nex == os.count(o => calc.get(o._1).contains(o._3)).toLong, s"n_exact $st")
      assert(mae == r4(withLines.sum.toDouble / withLines.length / 100.0), s"mean err $st")
      assert(mxe == BigDecimal(withLines.max.toDouble / 100.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, s"max err $st")
    }
  }

  private def ordersCentsEpoch() = {
    import org.apache.spark.sql.functions.{col, to_date, lit, datediff}
    graft.sources.Tables.table(spark, sf(), "orders")
      .select(datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).cast("long"),
        col("o_totalprice"), col("o_orderpriority"))
      .collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100), r.getString(2)))
  }

  test("q244: KS statistic and argmax recomputed from a driver-side double ECDF") {
    val row = SparkEntry.queries("q244_ks_drift")(spark, sf()).collect().head
    val (n1, n2, d, at) = (row.getLong(0), row.getLong(1), row.getDouble(2),
      row.getDouble(3))
    val os = ordersCentsEpoch()
    val cut = (os.map(_._1).min + os.map(_._1).max) / 2
    val early = os.filter(_._1 <= cut).map(_._2).sorted
    val late = os.filter(_._1 > cut).map(_._2).sorted
    assert(n1 == early.length.toLong && n2 == late.length.toLong)
    val values = (early ++ late).distinct.sorted
    var best = 0L; var bestAt = Long.MaxValue
    values.foreach { v =>
      val diff = math.abs(early.count(_ <= v).toLong * n2 - late.count(_ <= v).toLong * n1)
      if (diff > best) { best = diff; bestAt = v }
      else if (diff == best && v < bestAt) bestAt = v
    }
    def r(x: Double, s: Int) = BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(d == r(best.toDouble / (n1 * n2).toDouble, 6), s"D: $d")
    assert(at == r(bestAt.toDouble / 100.0, 2), s"argmax value: $at vs $bestAt")
  }

  test("q245: Gini recomputed for every segment; bounds hold") {
    import org.apache.spark.sql.functions.col
    val got = SparkEntry.queries("q245_gini_segment")(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val rev = graft.sources.Tables.table(spark, sf(), "orders")
      .select(col("o_custkey"), col("o_totalprice")).collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 100))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val cust = graft.sources.Tables.table(spark, sf(), "customer")
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    cust.groupBy(_._2).foreach { case (seg, cs) =>
      val xs = cs.map(c => rev.getOrElse(c._1, 0L)).sorted
      val n = xs.length.toLong
      val sx = xs.sum
      val six = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val want = r6((2 * six - (n + 1) * sx).toDouble / (n * sx).toDouble)
      val (gn, gg) = got(seg)
      assert(gn == n, s"n for $seg")
      assert(gg == want, s"gini for $seg: $gg vs $want")
      assert(gg >= 0.0 && gg < 1.0, s"gini in range for $seg")
    }
  }

  test("q246: U statistic and tie-corrected z recomputed from raw midranks") {
    val row = SparkEntry.queries("q246_mann_whitney")(spark, sf()).collect().head
    val (n1, n2, u1x2, z) = (row.getLong(0), row.getLong(1), row.getLong(2),
      row.getDouble(3))
    val os = ordersCentsEpoch()
    val urgent = os.filter(_._3 == "1-URGENT").map(_._2)
    val other = os.filterNot(_._3 == "1-URGENT").map(_._2)
    assert(n1 == urgent.length.toLong && n2 == other.length.toLong)
    val pooled = (urgent.map((_, 1)) ++ other.map((_, 0))).sortBy(_._1)
    // doubled midranks per tie group
    var idx = 0; var r1x2 = 0L; var ties = 0L
    while (idx < pooled.length) {
      var j = idx
      while (j < pooled.length && pooled(j)._1 == pooled(idx)._1) j += 1
      val t = (j - idx).toLong
      val mid2 = (idx + 1).toLong + j.toLong // first rank + last rank
      r1x2 += pooled.slice(idx, j).count(_._2 == 1).toLong * mid2
      ties += t * t * t - t
      idx = j
    }
    assert(u1x2 == r1x2 - n1 * (n1 + 1), s"2*U1: $u1x2")
    val nd = (n1 + n2).toDouble
    val sigma = math.sqrt(n1.toDouble * n2.toDouble / 12.0 *
      (nd + 1.0 - ties.toDouble / (nd * (nd - 1.0))))
    val wantZ = (u1x2.toDouble / 2.0 - n1.toDouble * n2.toDouble / 2.0) / sigma
    assert(math.abs(z - wantZ) < 1e-5, s"z: $z vs $wantZ")
  }

  test("q247: per-type seasonality indexes average to 1 and counts tile the stream") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q247_dow_seasonality")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    val total = graft.sources.Tables.table(spark, sf(), "events").count()
    assert(rows.map(_._4).sum == total, "dow counts tile every event")
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      assert(rs.map(_._2).distinct.length == rs.length, s"one row per dow for $tpe")
      val n = rs.map(_._4).sum
      // sum of c*7/n over present dows = 7 when all 7 weekdays appear
      if (rs.length == 7)
        assert(math.abs(rs.map(_._5).sum - 7.0) < 0.01, s"index mass for $tpe")
      rs.foreach { case (_, dw, label, _, _) =>
        assert(label == SparkEntry.dowLabels(dw.toInt), s"label for dow $dw")
      }
    }
  }

  test("q248: both layouts' zone maps recomputed driver-side; sorted skips more") {
    import org.apache.spark.sql.functions.{col, to_date, lit, datediff}
    val got = SparkEntry.queries("q248_zonemap_audit")(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val rows = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(datediff(col("l_shipdate"), to_date(lit("1970-01-01"))).cast("long"),
        col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val lo = rows.map(_._1).max - 29
    def md5b(k: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(k.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(2), 16) % 32
    }
    def audit(buckets: Map[Long, Array[(Long, Long, Int)]]): (Long, Long, Long, Long) = {
      val skipped = buckets.values.filter(_.map(_._1).max < lo)
      (buckets.size.toLong, skipped.size.toLong,
        rows.length.toLong, skipped.map(_.length.toLong).sum)
    }
    assert(got("arrival") == audit(rows.groupBy(r => md5b(r._2))), "arrival layout")
    // ntile: first rem tiles take base+1 rows over the total order
    val sorted = rows.sortBy(r => (r._1, r._2, r._3))
    val n = sorted.length; val base = n / 32; val rem = n % 32
    val tiled = sorted.zipWithIndex.map { case (r, i) =>
      val tile = if (i < rem * (base + 1)) i / (base + 1) else rem + (i - rem * (base + 1)) / base
      (tile.toLong + 1, r)
    }
    assert(got("shipdate_sorted") ==
      audit(tiled.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }),
      "sorted layout")
    assert(got("shipdate_sorted")._4 > got("arrival")._4, "sorting must win")
  }

  test("q249: KM curve recomputed from a driver-side sessionization") {
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    val got = SparkEntry.queries("q249_km_survival")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    // survival non-increasing, risk sets non-increasing
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._5 <= a._5 + 1e-12 && b._2 < a._2, "monotone curve and risk")
    }
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val endE = ev.map(_._3).max
    val sessions = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._3, e._2))
      val out = scala.collection.mutable.ArrayBuffer[Array[Long]]()
      s.foreach { e =>
        if (out.nonEmpty && e._3 - out.last.last <= 1800) out.last(1) = e._3
        else out += Array(e._3, e._3)
        // keep last updated via mutation above; Array(first, last)
      }
      out.map(a => ((a(1) - a(0)) / 60, if (endE - a(1) >= 1800) 1L else 0L))
    }.toSeq
    val perDur = sessions.groupBy(_._1).map { case (d, xs) =>
      (d, xs.count(_._2 == 1L).toLong, xs.count(_._2 == 0L).toLong)
    }.toSeq.sortBy(_._1)
    val nTot = sessions.length.toLong
    var seen = 0L; var lsum = 0L
    def rn(x: Double, s: Int) = BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = perDur.map { case (dur, d, c) =>
      val risk = nTot - seen
      seen += d + c
      lsum += (if (d < risk) math.round(math.log(1.0 - d.toDouble / risk) * 1e9)
               else -100000000000L)
      (dur, risk, d, c, rn(math.exp(lsum.toDouble / 1e9), 6))
    }
    assert(got.toSeq == want, s"KM recompute:\n got=${got.toSeq.take(5)}\nwant=${want.take(5)}")
  }

  test("q250: rank mass conserved; shares sum to 1; 5-round driver replay agrees") {
    val rows = SparkEntry.queries("q250_markov_stationary")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "steady shares sum to 1")
    assert(math.abs(rows.map(_._3).sum - rows.length) < 5e-6,
      "rank mass = |V| (each displayed rank is 6-dp rounded)")
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4, "raw shares sum to 1")
    // driver replay of the damped iteration from the q200 transition matrix
    import org.apache.spark.sql.functions.col
    val tm = SparkEntry.queries("q200_event_transitions")(spark, sf())
      .select(col("cur_type"), col("next_type"), col("n_transitions"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val outw = tm.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val nodes = outw.keys.toSeq.sorted
    var pr = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to 5) {
      val acc = tm.groupBy(_._2).map { case (v, es) =>
        v -> es.collect { case (u, _, w) if pr.contains(u) =>
          w.toDouble / outw(u) * pr(u) }.sum
      }
      pr = nodes.map(n => n -> (0.15 + 0.85 * acc.getOrElse(n, 0.0))).toMap
    }
    rows.foreach { case (tpe, _, rank, _, _) =>
      assert(math.abs(rank - pr(tpe)) < 1e-5, s"replay for $tpe: $rank vs ${pr(tpe)}")
    }
  }

  test("q251: decomposition identities hold; one day recomputed from raw activity") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q251_growth_accounting")(spark, sf()).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1.toEpochDay)
    rows.foreach { case (d, active, nw, ret, res, _) =>
      assert(active == nw + ret + res, s"decomposition on $d")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._6 == a._2 - b._4, s"churn(${b._1}) = active(prev) - retained")
    }
    val ud = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), col("ts").cast("date")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate)).distinct
    val firstDay = ud.groupBy(_._1).map { case (u, ds) =>
      u -> ds.map(_._2.toEpochDay).min }
    val mid = rows(rows.length / 2)._1
    val today = ud.filter(_._2 == mid).map(_._1).toSet
    val yesterday = ud.filter(_._2 == mid.minusDays(1)).map(_._1).toSet
    val nw = today.count(u => firstDay(u) == mid.toEpochDay).toLong
    val ret = (today & yesterday).size.toLong
    val row = rows.find(_._1 == mid).get
    assert(row._2 == today.size.toLong && row._3 == nw && row._4 == ret &&
      row._5 == today.size - nw - ret && row._6 == (yesterday -- today).size.toLong,
      s"mid-day recompute on $mid: $row")
  }

  private def dimMaps() = {
    import org.apache.spark.sql.functions.col
    def nl(r: org.apache.spark.sql.Row, i: Int): Long =
      r.getAs[Number](i).longValue
    val nat = graft.sources.Tables.table(spark, sf(), "nation")
      .select("n_nationkey", "n_name", "n_regionkey").collect()
      .map(r => nl(r, 0) -> (r.getString(1), nl(r, 2))).toMap
    val reg = graft.sources.Tables.table(spark, sf(), "region")
      .select("r_regionkey", "r_name").collect()
      .map(r => nl(r, 0) -> r.getString(1)).toMap
    val cust = graft.sources.Tables.table(spark, sf(), "customer")
      .select("c_custkey", "c_nationkey").collect()
      .map(r => nl(r, 0) -> nl(r, 1)).toMap
    val supp = graft.sources.Tables.table(spark, sf(), "supplier")
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => nl(r, 0) -> nl(r, 1)).toMap
    val ords = graft.sources.Tables.table(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        org.apache.spark.sql.functions.year(col("o_orderdate"))).collect()
      .map(r => nl(r, 0) -> (nl(r, 1), nl(r, 2))).toMap
    (nat, reg, cust, supp, ords)
  }

  test("q252: per-year shares sum to 1; one year fully recomputed driver-side") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q252_market_share")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (y, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-4, s"shares sum to 1 in $y")
    }
    val (nat, reg, cust, supp, ords) = dimMaps()
    val promo = graft.sources.Tables.table(spark, sf(), "part")
      .select("p_partkey", "p_type").collect()
      .filter(_.getString(1) == "PROMO").map(_.getLong(0)).toSet
    val li = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.round(r.getDouble(3) * (1.0 - r.getDouble(4)) * 100)))
    val want = li.filter(l => promo(l._2))
      .flatMap { l =>
        val (ck, yr) = ords(l._1)
        val custReg = reg(nat(cust(ck))._2)
        if (custReg == "ASIA") Some(((yr, nat(supp(l._3))._1), l._4)) else None
      }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val yr = want.keys.map(_._1).min
    rows.filter(_._1 == yr).foreach { case (_, sn, rev, _) =>
      val cents = want((yr, sn))
      assert(rev == BigDecimal(cents.toDouble / 100.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$yr/$sn revenue")
    }
    assert(rows.count(_._1 == yr) == want.keys.count(_._1 == yr), s"cells in $yr")
  }

  test("q253: flow matrix mass equals all cross-nation line revenue; one cell exact") {
    val rows = SparkEntry.queries("q253_nation_flows")(spark, sf()).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)), (r.getLong(3), r.getDouble(4))))
    val (nat, _, cust, supp, ords) = dimMaps()
    val li = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * (1.0 - r.getDouble(3)) * 100)))
    val cells = li.flatMap { l =>
      val (ck, yr) = ords(l._1)
      val cn = nat(cust(ck))._1; val sn = nat(supp(l._2))._1
      if (cn != sn) Some(((sn, cn, yr), l._3)) else None
    }
    val want = cells.groupBy(_._1).map { case (k, v) =>
      k -> (v.length.toLong, v.map(_._2).sum) }
    assert(rows.length == want.size, "cell count")
    assert(rows.map(_._2._1).sum == cells.length.toLong, "total line mass")
    val probe = want.keys.minBy(k => (k._1, k._2, k._3))
    val (gn, gr) = rows.toMap.apply(probe)
    assert(gn == want(probe)._1 && gr == BigDecimal(want(probe)._2.toDouble / 100.0)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, s"cell $probe")
  }

  test("q254: log2 buckets recomputed; bounds are exact powers of two") {
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    val rows = SparkEntry.queries("q254_latency_histogram")(spark, sf()).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
    rows.foreach { case ((_, b), (lo, hi, _)) =>
      assert(lo == (1L << b) && hi == (1L << (b + 1)) - 1, s"bounds for bucket $b")
    }
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val want = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._4, e._2))
      s.zip(s.drop(1)).map { case (a, b) => (a._3, b._4 - a._4) }
    }.filter(g => g._2 >= 1 && g._2 <= 1800)
      .map { case (tpe, gap) => (tpe, 63L - java.lang.Long.numberOfLeadingZeros(gap)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(rows.map { case (k, v) => k -> v._3 }.toMap == want, "bucket counts")
  }

  test("q255: reference bins are near-even deciles; PSI recomputed driver-side") {
    val rows = SparkEntry.queries("q255_psi_drift")(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5), r.getDouble(6)))
      .sortBy(_._1)
    assert(rows.length == 10 && rows.map(_._1).toSeq == (0L to 9L))
    val os = ordersCentsEpoch()
    val cut = (os.map(_._1).min + os.map(_._1).max) / 2
    val ref = os.filter(_._1 <= cut).map(_._2)
    val cmp = os.filter(_._1 > cut).map(_._2)
    assert(rows.map(_._2).sum == ref.length.toLong && rows.map(_._3).sum == cmp.length.toLong)
    // decile cuts: smallest value with 10*rank >= i*n1 over the sorted reference
    val sortedRef = ref.sorted
    val cuts = (1 to 9).map { i =>
      // smallest value whose 1-based rank satisfies 10*rank >= i*n1
      sortedRef((0 until ref.length)
        .find(j => 10L * (j + 1) >= i.toLong * ref.length).get)
    }
    def bin(v: Long) = cuts.count(v >= _).toLong
    val wantRef = ref.groupBy(bin).map { case (b, v) => b -> v.length.toLong }
    val wantCmp = cmp.groupBy(bin).map { case (b, v) => b -> v.length.toLong }
    rows.foreach { case (b, nr, nc, _, _) =>
      assert(nr == wantRef.getOrElse(b, 0L) && nc == wantCmp.getOrElse(b, 0L),
        s"bin $b counts")
    }
    val n1 = ref.length.toLong; val n2 = cmp.length.toLong
    val psi = rows.map { case (b, nr, nc, _, _) =>
      val pa = (nr + 1).toDouble / (n1 + 10); val pb = (nc + 1).toDouble / (n2 + 10)
      (pb - pa) * math.log(pb / pa)
    }.sum
    assert(math.abs(rows.head._5 - psi) < 1e-5, s"psi total ${rows.head._5} vs $psi")
  }

  test("q256: LTV curve monotone per cohort; largest cohort recomputed driver-side") {
    import org.apache.spark.sql.functions.{col, unix_timestamp}
    val rows = SparkEntry.queries("q256_cohort_ltv")(spark, sf()).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (cd, rs) =>
      val sorted = rs.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._5 >= a._5, s"LTV monotone in cohort $cd")
        case _ =>
      }
    }
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), col("ts").cast("date"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getString(2), math.round(r.getDouble(3) * 100)))
    val cohortOf = ev.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).min }
    val big = rows.groupBy(_._1).maxBy(_._2.head._2)._1
    val cd = big.toEpochDay
    val purch = ev.filter(e => e._3 == "purchase" && cohortOf(e._1) == cd)
      .groupBy(e => e._2 - cd).map { case (a, es) => a -> es.map(_._4).sum }
    val size = cohortOf.values.count(_ == cd).toLong
    var cum = 0L
    def r(x: Double, s: Int) = BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    purch.toSeq.sortBy(_._1).foreach { case (age, cents) =>
      cum += cents
      val row = rows.find(x => x._1 == big && x._3 == age).get
      assert(row._2 == size && row._4 == r(cents.toDouble / 100.0, 2) &&
        row._5 == (cum * 100 / size).toDouble / 10000.0, s"cohort $big age $age")
    }
    assert(rows.count(_._1 == big) == purch.size, "one row per purchase age")
  }

  test("q257: every brand's two-proportion z recomputed driver-side") {
    import org.apache.spark.sql.functions.{col, to_date, lit, datediff}
    val rows = SparkEntry.queries("q257_brand_movers")(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(5),
        r.getBoolean(6))).toMap
    val brandOf = graft.sources.Tables.table(spark, sf(), "part")
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_partkey"),
        datediff(col("l_shipdate"), to_date(lit("1970-01-01"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cut = (li.map(_._2).min + li.map(_._2).max) / 2
    val per = li.groupBy(l => brandOf(l._1)).map { case (b, ls) =>
      b -> (ls.count(_._2 <= cut).toLong, ls.count(_._2 > cut).toLong) }
    val n1 = per.values.map(_._1).sum; val n2 = per.values.map(_._2).sum
    per.foreach { case (b, (k1, k2)) =>
      val (g1, g2, gz, gs) = rows(b)
      assert(g1 == k1 && g2 == k2, s"counts for $b")
      val p1 = k1.toDouble / n1; val p2 = k2.toDouble / n2
      val pp = (k1 + k2).toDouble / (n1 + n2)
      val z = (p1 - p2) / math.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2))
      assert(math.abs(gz - z) < 1e-3 && gs == (math.abs(z) > 2.576), s"z for $b")
    }
  }

  test("q258: aging buckets tile the catalog and match a driver recompute") {
    import org.apache.spark.sql.functions.{col, to_date, lit, datediff}
    val rows = SparkEntry.queries("q258_dead_stock")(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val lastOf = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_partkey"),
        datediff(col("l_shipdate"), to_date(lit("1970-01-01"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
    val mx = lastOf.values.max
    val parts = graft.sources.Tables.table(spark, sf(), "part")
      .select("p_partkey", "p_retailprice").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
    def bucket(pk: Long): String = lastOf.get(pk) match {
      case None => "never_sold"
      case Some(le) =>
        val age = mx - le
        if (age <= 30) "0030_active" else if (age <= 60) "0060_slowing"
        else if (age <= 90) "0090_slow" else if (age <= 180) "0180_stale"
        else if (age <= 365) "0365_dormant" else "9999_dead"
    }
    val want = parts.groupBy(p => bucket(p._1)).map { case (b, ps) =>
      b -> (ps.length.toLong, ps.map(_._2).sum) }
    assert(rows.keySet == want.keySet, "bucket set")
    assert(rows.values.map(_._1).sum == parts.length.toLong, "buckets tile parts")
    want.foreach { case (b, (n, cents)) =>
      assert(rows(b)._1 == n, s"n_parts in $b")
      assert(rows(b)._2 == BigDecimal(cents.toDouble / 100.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, s"value in $b")
    }
  }

  /** (partkey, suppkey, cents, qty) rows of the lineitem fixture, collected
    * once for the q259-q264 driver recomputes. */
  private lazy val liRows: Array[(Long, Long, Long, Long, Long, String)] = {
    import org.apache.spark.sql.functions.{col, to_date, lit, datediff, round}
    graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long"),
        col("l_quantity").cast("long"),
        datediff(col("l_shipdate"), to_date(lit("1970-01-01"))).cast("long"),
        col("l_returnflag"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getString(6)))
  }

  test("q259: every STANDARD part's min-unit-price winner recomputed driver-side") {
    val rows = SparkEntry.queries("q259_min_cost_supplier")(spark, sf())
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(5))).toMap
    val std = graft.sources.Tables.table(spark, sf(), "part")
      .where("p_type = 'STANDARD'").select("p_partkey").collect()
      .map(_.getLong(0)).toSet
    val byPair = liRows.filter(l => std(l._1))
      .groupBy(l => (l._1, l._2))
      .map { case ((pk, sk), ls) =>
        (pk, sk, ls.map(_._3).sum * 10000L / ls.map(_._4).sum) }
    val want = byPair.groupBy(_._1).map { case (pk, ps) =>
      val minU = ps.map(_._3).min
      pk -> (ps.filter(_._3 == minU).map(_._2).min,
        (minU / 100).toDouble / 10000.0)
    }
    assert(rows.keySet == want.keySet, "winner part set")
    want.foreach { case (pk, w) => assert(rows(pk) == w, s"part $pk") }
  }

  test("q260: the 1.5x-mean revenue threshold recomputed driver-side") {
    val rows = SparkEntry.queries("q260_important_parts")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pv = liRows.groupBy(_._1).map { case (pk, ls) => pk -> ls.map(_._3).sum }
    val avg = pv.values.sum / pv.size
    val want = pv.filter { case (_, v) => v * 2 > avg * 3 }
    assert(rows.keySet == want.keySet, "important-part set")
    want.foreach { case (pk, v) =>
      assert(rows(pk) == BigDecimal(v.toDouble / 100.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, s"part $pk") }
    assert(rows.nonEmpty, "threshold keeps a nonempty selective set")
  }

  test("q261: the trailing-90-day max-revenue supplier recomputed driver-side") {
    val rows = SparkEntry.queries("q261_top_supplier")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val mx = liRows.map(_._5).max
    import org.apache.spark.sql.functions.{col, to_date, lit, datediff, round}
    val disc = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_suppkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long"),
        datediff(col("l_shipdate"), to_date(lit("1970-01-01"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val revd = disc.filter(_._3 >= mx - 89)
      .groupBy(_._1).map { case (sk, ls) => sk -> ls.map(_._2).sum }
    val best = revd.values.max
    val want = revd.filter(_._2 == best)
    assert(rows.keySet == want.keySet, "tied-winner set")
    want.foreach { case (sk, c) =>
      assert(rows(sk) == BigDecimal(c.toDouble / 100.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, s"supplier $sk") }
  }

  test("q262: large-order key set and quantity sums recomputed driver-side") {
    val rows = SparkEntry.queries("q262_large_orders")(spark, sf())
      .collect().map { r =>
        (r.getLong(2), (r.getLong(0), r.getLong(5))) }.toMap
    import org.apache.spark.sql.functions.col
    val li = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_orderkey"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = li.groupBy(_._1).map { case (ok, ls) => ok -> ls.map(_._2).sum }
      .filter(_._2 > 250)
    val custOf = graft.sources.Tables.table(spark, sf(), "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == want.keySet, "large-order key set")
    want.foreach { case (ok, q) =>
      assert(rows(ok) == ((custOf(ok), q)), s"order $ok") }
    assert(rows.nonEmpty)
  }

  test("q263: disjunction count and revenue recomputed driver-side; hull is a superset") {
    val row = SparkEntry.queries("q263_disjunctive_revenue")(spark, sf())
      .collect().head
    import org.apache.spark.sql.functions.{col, lit, round}
    val partOf = graft.sources.Tables.table(spark, sf(), "part")
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val li = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("long"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def branch(b: String, s1: Int, s2: Int, q1: Long, q2: Long)
              (pk: Long, q: Long): Boolean = {
      val (pb, ps) = partOf(pk)
      pb == b && ps >= s1 && ps <= s2 && q >= q1 && q <= q2
    }
    val in = li.filter { case (pk, q, _) =>
      branch("Brand#3", 1, 15, 1, 20)(pk, q) ||
      branch("Brand#11", 1, 25, 10, 30)(pk, q) ||
      branch("Brand#21", 1, 35, 25, 45)(pk, q) }
    assert(row.getLong(0) == in.length.toLong, "n_lines")
    assert(row.getDouble(1) == BigDecimal(in.map(_._3).sum.toDouble / 100.0)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, "revenue")
    // the hand-lifted hull never excludes a qualifying line
    assert(in.forall { case (pk, q, _) =>
      q >= 1 && q <= 45 && partOf(pk)._2 >= 1 && partOf(pk)._2 <= 35 },
      "CNF hull is a superset of the disjunction")
  }

  test("q264: the top-20 returned-revenue set recomputed driver-side") {
    val rows = SparkEntry.queries("q264_return_risk")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(rows.size == 20, "exactly 20 survivors")
    import org.apache.spark.sql.functions.{col, lit, round}
    val custOf = graft.sources.Tables.table(spark, sf(), "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lost = graft.sources.Tables.table(spark, sf(), "lineitem")
      .where("l_returnflag = 'R'")
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long"))
      .collect().map(r => (custOf(r.getLong(0)), r.getLong(1)))
      .groupBy(_._1).map { case (ck, ls) => ck -> ls.map(_._2).sum }
    val want = lost.toSeq.sortBy { case (ck, c) => (-c, ck) }.take(20)
    assert(rows.keySet == want.map(_._1).toSet, "top-20 set")
    want.foreach { case (ck, c) =>
      assert(rows(ck) == BigDecimal(c.toDouble / 100.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, s"cust $ck") }
  }

  test("kcore: a triangle with pendant tails peels to exactly the triangle at k=2") {
    import spark.implicits._
    // triangle 1-2-3 plus tails 3-4-5 and a 4-branch: tails peel over
    // MULTIPLE rounds (5 first, then 4), so the fixpoint loop is exercised
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("p1", "p2")
    val core = graft.operators.KCore.core(edges, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"got $core")
    // k=3 on the same graph: nothing survives
    assert(graft.operators.KCore.core(edges, k = 3).count() == 0L)
  }

  test("q267: the k=3 core matches an independent driver-side peel") {
    val rows = SparkEntry.queries("q267_kcore")(spark, sf())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    import org.apache.spark.sql.functions.col
    val pp = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairCnt = pp.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (e, es) => e -> es.size }
    val edges = pairCnt.filter(_._2 >= 2).keys.toSeq
    var alive = edges.flatMap(e => Seq(e._1, e._2)).toSet
    var changed = true
    while (changed) {
      val deg = edges.filter(e => alive(e._1) && alive(e._2))
        .flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (n, ns) => n -> ns.size }
      val next = alive.filter(n => deg.getOrElse(n, 0) >= 3)
      changed = next.size != alive.size
      alive = next
    }
    val deg = edges.filter(e => alive(e._1) && alive(e._2))
      .flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, ns) => n -> ns.size.toLong }
    assert(rows.keySet == alive, "core node set")
    deg.foreach { case (n, d) => assert(rows(n) == d, s"core degree of $n") }
  }

  test("q265: KN probabilities per context sum to <= 1 and match a driver recompute") {
    val rows = SparkEntry.queries("q265_kneser_ney")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
      .toMap
    import org.apache.spark.sql.functions.{col, lower, split}
    val toks = graft.sources.Tables.table(spark, sf(), "documents")
      .select(split(lower(graft.functions.TextExprs.cleanText(col("text"))), " "))
      .collect().map(_.getSeq[String](0))
    val pairs = toks.filter(_.length >= 2).flatMap(ts =>
      ts.sliding(2).map(p => (p(0), p(1))))
      .filter(p => p._1.nonEmpty && p._2.nonEmpty)
    val bc = pairs.groupBy(identity).map { case (p, ps) => p -> ps.size.toLong }
    val cw1 = bc.toSeq.groupBy(_._1._1).map { case (w, es) =>
      w -> (es.map(_._2).sum, es.size.toLong) }
    val n1r = bc.toSeq.groupBy(_._1._2).map { case (w, es) => w -> es.size.toLong }
    val b = bc.size.toLong
    assert(rows.keySet == bc.keySet, "bigram type set")
    bc.foreach { case (p @ (w1, w2), c) =>
      val (g_c, g_cw1, g_n1f, g_n1r, g_pkn) = rows(p)
      assert(g_c == c && g_cw1 == cw1(w1)._1 && g_n1f == cw1(w1)._2 &&
        g_n1r == n1r(w2), s"counts for $p")
      val pkn = (c.toDouble - 0.75) / cw1(w1)._1 +
        (0.75 * cw1(w1)._2 / cw1(w1)._1) * (n1r(w2).toDouble / b)
      assert(math.abs(g_pkn - pkn) < 1e-6, s"pkn for $p")
    }
    // per-context total probability over SEEN continuations stays <= 1
    // (the held-out mass is exactly what the discount D reserves); each
    // row's display value is HALF_UP-rounded at 6dp, so allow the
    // worst-case +0.5e-6 per continuation
    rows.toSeq.groupBy(_._1._1).foreach { case (w1, es) =>
      val tot = es.map(_._2._5).sum
      assert(tot <= 1.0 + 5e-7 * es.size, s"context $w1 mass $tot")
    }
  }

  test("q266: distinct-l, modal count, and the l>=3 flag recomputed driver-side") {
    val rows = SparkEntry.queries("q266_l_diversity")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))).toMap
    import org.apache.spark.sql.functions.col
    val nationOf = graft.sources.Tables.table(spark, sf(), "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val qi = graft.sources.Tables.table(spark, sf(), "customer")
      .select("c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal")
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        nationOf(r.getAs[Number](2).longValue),
        math.floor(r.getDouble(3) / 1000).toLong)))
      .toMap
    val sens = graft.sources.Tables.table(spark, sf(), "orders")
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (qi(r.getLong(0)), r.getString(1)))
    val want = sens.groupBy(_._1).map { case (g, os) =>
      val bySens = os.groupBy(_._2).map(_._2.size.toLong)
      g -> (os.size.toLong, bySens.size.toLong, bySens.max)
    }
    assert(rows.keySet == want.keySet, "QI group set")
    want.foreach { case (g, (n, l, top)) =>
      assert(rows(g) == ((n, l, top, l >= 3)), s"group $g") }
    assert(want.values.exists(_._2 < 3) || want.size > 1,
      "audit output is non-degenerate")
  }

  test("q268/q269: moments and backtest errors recomputed from day-grain counts") {
    import org.apache.spark.sql.functions.{col, to_date, lit, datediff}
    val dg = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("event_type"),
        datediff(col("ts").cast("date"), to_date(lit("1970-01-01"))).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val byType = dg.groupBy(_._1._1)
    val od = SparkEntry.queries("q268_overdispersion")(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(6))).toMap
    byType.foreach { case (et, ds) =>
      val ns = ds.values.toSeq
      val (days, s1, s2) = (ns.size.toLong, ns.sum, ns.map(n => n * n).sum)
      val (gd, g1, g2, gv) = od(et)
      assert(gd == days && g1 == s1 && g2 == s2, s"moments for $et")
      val mean = s1.toDouble / days
      val vr = (s2 - s1.toDouble * s1 / days) / (days - 1)
      assert(math.abs(gv - vr / mean) < 1e-3, s"vmr for $et")
    }
    val mase = SparkEntry.queries("q269_mase_backtest")(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    byType.foreach { case (et, ds) =>
      val n = ds.map { case ((_, ed), c) => ed -> c }
      def err(lag: Long) = n.toSeq.flatMap { case (ed, c) =>
        n.get(ed - lag).map(p => math.abs(c - p)) }
      val (e1, e7) = (err(1), err(7))
      assert(mase(et) == ((e1.size.toLong, e7.size.toLong, e1.sum, e7.sum)),
        s"errors for $et")
    }
  }

  test("q270: every group's EMD recomputed from raw CDFs; bounded to [0,1]") {
    val rows = SparkEntry.queries("q270_t_closeness")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getDouble(4), r.getBoolean(5))).toMap
    import org.apache.spark.sql.functions.col
    val nationOf = graft.sources.Tables.table(spark, sf(), "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val qi = graft.sources.Tables.table(spark, sf(), "customer")
      .select("c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal")
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        nationOf(r.getAs[Number](2).longValue),
        math.floor(r.getDouble(3) / 1000).toLong))).toMap
    val obs = graft.sources.Tables.table(spark, sf(), "orders")
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (qi(r.getLong(0)), r.getString(1)))
    val sensVals = obs.map(_._2).distinct.sorted
    val k = sensVals.length
    val nTot = obs.length.toLong
    val gCum = sensVals.map(v => obs.count(_._2 <= v).toLong)
    obs.groupBy(_._1).foreach { case (g, os) =>
      val nG = os.length.toLong
      val cumG = sensVals.map(v => os.count(_._2 <= v).toLong)
      val num = cumG.zip(gCum).map { case (cg, cG) =>
        math.abs(cg * nTot - cG * nG) }.sum
      val emd = num.toDouble / (nG * nTot * (k - 1))
      val (gn, ge, gok) = rows(g)
      assert(gn == nG, s"n for $g")
      assert(math.abs(ge - emd) < 1e-6, s"emd for $g: $ge vs $emd")
      assert(gok == (ge <= 0.2), s"flag for $g")
      assert(ge >= 0.0 && ge < 1.0, s"emd bounds for $g")
    }
    assert(rows.size == obs.groupBy(_._1).size)
  }

  test("q271: per-node triangles and coefficients recomputed driver-side") {
    val rows = SparkEntry.queries("q271_clustering_coeff")(spark, sf())
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    import org.apache.spark.sql.functions.col
    val pp = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pp.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (n, ns) => n -> ns.map(_._2).toSet }
    assert(rows.keySet == adj.keySet, "node set")
    adj.foreach { case (n, nbrs) =>
      val deg = nbrs.size.toLong
      val tri = nbrs.toSeq.combinations(2)
        .count(p => adj(p(0)).contains(p(1))).toLong
      val (gd, gt, gc) = rows(n)
      assert(gd == deg && gt == tri, s"deg/tri for $n")
      val cc = if (deg >= 2) 2.0 * tri / (deg * (deg - 1)) else 0.0
      assert(math.abs(gc - cc) < 1e-6, s"cc for $n")
    }
  }

  test("q272: the Murphy identity BS = REL - RES + UNC holds exactly at unique-forecast grain") {
    val r = SparkEntry.queries("q272_brier_decomposition")(spark, sf())
      .collect().head
    val (brier, rel, res, unc) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    // each term is independently 6dp-rounded, so the identity holds to
    // the rounding budget
    assert(math.abs(brier - (rel - res + unc)) < 3e-6,
      s"identity: $brier vs ${rel - res + unc}")
    assert(brier >= 0 && rel >= 0 && res >= 0 && unc >= 0 && unc <= 0.25)
    assert(r.getLong(0) > 0)
  }

  test("q273: RRF fusion recomputed from independently-ranked lists") {
    val rows = SparkEntry.queries("q273_rrf_fusion")(spark, sf()).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows.size == 20)
    import org.apache.spark.sql.functions.col
    // lex list: BM25 via the operator (already differentially tested by
    // q52), ranked driver-side on the rounded score
    val bm = graft.operators.Retrieval.bm25(
        graft.sources.Tables.table(spark, sf(), "documents"),
        col("doc_id"), col("text"), terms = Seq("spark", "vector", "stream"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val lexRank = bm.sortBy { case (id, sc) => (-sc, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val emb = graft.sources.Tables.table(spark, sf(), "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>)")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val q = emb.find(_._1 == 0L).get._2
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val denseRank = emb.map { case (id, v) => (id, r6(cos(v, q))) }
      .sortBy { case (id, c) => (-c, id) }.take(50)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val fused = (lexRank.keySet ++ denseRank.keySet).toSeq.map { id =>
      val rr = lexRank.get(id).map(r => 1.0 / (r + 60)).getOrElse(0.0) +
        denseRank.get(id).map(r => 1.0 / (r + 60)).getOrElse(0.0)
      (id, r6(rr))
    }.sortBy { case (id, s) => (-s, id) }.take(20)
    assert(rows.keySet == fused.map(_._1).toSet, "fused top-20 set")
    fused.foreach { case (id, s) =>
      val (gl, gd, gs) = rows(id)
      assert(gs == s, s"rrf for $id")
      assert(gl == lexRank.getOrElse(id, 0L), s"lex rank for $id")
      assert(gd == denseRank.getOrElse(id, 0L), s"dense rank for $id")
    }
  }

  test("q274: every contract rule recomputed from raw rows") {
    val rows = SparkEntry.queries("q274_constraint_audit")(spark, sf())
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(rows.size == 7, "seven rules in the ledger")
    import org.apache.spark.sql.functions.{col, to_date, lit, datediff}
    val li = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"),
        datediff(col("l_shipdate"), to_date(lit("1970-01-01")))
          .cast("long").as("ship_ed")).collect()
    val n = li.length.toLong
    def viol(p: org.apache.spark.sql.Row => Boolean) = li.count(p).toLong
    assert(rows("quantity_positive") ==
      ((viol(_.getDouble(2) <= 0), n, viol(_.getDouble(2) <= 0) == 0L)))
    assert(rows("extendedprice_positive")._1 == viol(_.getDouble(3) <= 0))
    assert(rows("discount_in_[0,0.1]")._1 ==
      viol(r => r.getDouble(4) < 0 || r.getDouble(4) > 0.1))
    assert(rows("tax_in_[0,0.08]")._1 ==
      viol(r => r.getDouble(5) < 0 || r.getDouble(5) > 0.08))
    assert(rows("returnflag_domain")._1 ==
      viol(r => !Set("A", "N", "R").contains(r.getString(6))))
    val byOrder = li.groupBy(_.getLong(0))
    val badContig = byOrder.count { case (_, ls) =>
      val nums = ls.map(_.getAs[Number](1).longValue)
      nums.max != ls.length.toLong || nums.min != 1L }.toLong
    assert(rows("linenumbers_contiguous") ==
      ((badContig, byOrder.size.toLong, badContig == 0L)))
    val odate = graft.sources.Tables.table(spark, sf(), "orders")
      .select(col("o_orderkey"),
        datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
          .cast("long").as("oed")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val badShip = li.count(r => r.getLong(7) < odate(r.getLong(0))).toLong
    assert(rows("ship_after_order") == ((badShip, n, badShip == 0L)))
  }

  test("q275: order-statistic CI recomputed; bounds bracket the median") {
    val rows = SparkEntry.queries("q275_median_ci")(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    import org.apache.spark.sql.functions.{col, to_date, lit, datediff}
    val dg = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("event_type"),
        datediff(col("ts").cast("date"), to_date(lit("1970-01-01"))).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    dg.groupBy(_._1._1).foreach { case (et, ds) =>
      val sorted = ds.toSeq.map { case ((_, ed), c) => (c, ed) }.sorted
      val n = sorted.length
      val lo = math.max(math.floor((n - 1.96 * math.sqrt(n)) / 2).toLong, 1L)
      val hi = math.min(math.ceil(1.0 + (n + 1.96 * math.sqrt(n)) / 2).toLong,
        n.toLong)
      val med = math.ceil(n / 2.0).toLong
      val (gd, gl, gh, gm, gcl, gch) = rows(et)
      assert(gd == n.toLong && gl == lo && gh == hi, s"ranks for $et")
      assert(gm == sorted((med - 1).toInt)._1, s"median for $et")
      assert(gcl == sorted((lo - 1).toInt)._1 &&
        gch == sorted((hi - 1).toInt)._1, s"CI values for $et")
      assert(gcl <= gm && gm <= gch, s"bracket for $et")
    }
  }

  test("q276: embeddedness distribution recomputed; buckets tile the edge list") {
    val rows = SparkEntry.queries("q276_edge_embeddedness")(spark, sf())
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(3))).toMap
    import org.apache.spark.sql.functions.col
    val pp = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pp.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val emb = edges.toSeq.map { case (u, v) =>
      (adj(u) intersect adj(v)).size.toLong }
    val want = emb.groupBy(identity).map { case (e, es) => e -> es.size.toLong }
    assert(rows.keySet == want.keySet, "embeddedness bucket set")
    want.foreach { case (e, c) =>
      assert(rows(e) == ((c, e == 0L)), s"bucket $e") }
    assert(rows.values.map(_._1).sum == edges.size.toLong, "buckets tile edges")
  }

  test("q277: trend/seasonal/residual recomputed; components re-add to the series") {
    val rows = SparkEntry.queries("q277_seasonal_decompose")(spark, sf())
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    import org.apache.spark.sql.functions.{col, to_date, lit, datediff}
    val dd = graft.sources.Tables.table(spark, sf(), "events")
      .select(datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
        .cast("long"))
      .collect().map(_.getLong(0))
      .groupBy(identity).map { case (d, ds) => d -> ds.size.toLong }
    val trend = dd.flatMap { case (d, c) =>
      val win = (-3L to 3L).flatMap(o => dd.get(d + o))
      if (win.size == 7) Some(d -> (c, win.sum)) else None
    }
    val seas = trend.toSeq.groupBy(_._1 % 7).map { case (dow, ds) =>
      dow -> (ds.map { case (_, (c, t7)) => c * 7 - t7 }.sum, ds.size.toLong) }
    assert(rows.keySet == trend.keySet, "trended day set")
    trend.foreach { case (d, (c, t7)) =>
      val (_, gc, gt, gs, gr) = rows(d)
      val (num, den) = seas(d % 7)
      assert(gc == c, s"cnt at $d")
      assert(math.abs(gt - t7 / 7.0) < 1e-4, s"trend at $d")
      assert(math.abs(gs - num.toDouble / (den * 7)) < 1e-4, s"seasonal at $d")
      assert(math.abs((gt + gs + gr) - c) < 2e-4,
        s"components must re-add to the series at $d")
    }
  }

  test("q278: log-odds z recomputed for one source; top-10 selection correct") {
    val rows = SparkEntry.queries("q278_fightin_words")(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getDouble(4)))
    import org.apache.spark.sql.functions.{col, lower, split, explode}
    val toks = graft.sources.Tables.table(spark, sf(), "documents")
      .select(col("source"),
        explode(split(lower(graft.functions.TextExprs.cleanText(col("text"))),
          " ")).as("t"))
      .where(col("t") =!= "").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val ysw = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val yw = toks.groupBy(_._2).map { case (t, v) => t -> v.size.toLong }
    val ns = toks.groupBy(_._1).map { case (s0, v) => s0 -> v.size.toLong }
    val nn = toks.length.toLong
    def r4(x: Double) = BigDecimal(x).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val src = rows.head._1._1
    val zAll = yw.keys.toSeq.flatMap { t =>
      val y = ysw.getOrElse((src, t), 0L)
      if (y == 0) None else {
        val aw = 1000.0 * yw(t) / nn
        val d = math.log((y + aw) / (ns(src) + 1000.0 - y - aw)) -
          math.log((yw(t) - y + aw) / (nn - ns(src) + 1000.0 - (yw(t) - y) - aw))
        Some((t, y, r4(d / math.sqrt(1.0 / (y + aw) + 1.0 / (yw(t) - y + aw)))))
      }
    }
    val want = zAll.sortBy { case (t, _, z) => (-z, t) }.take(10)
    val got = rows.filter(_._1._1 == src).sortBy(_._1._2).map(_._2)
    assert(got.length == 10)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"$g vs $w") }
  }

  test("q279: both attribution models conserve total revenue; recompute agrees") {
    val rows = SparkEntry.queries("q279_attribution")(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4))).toMap
    val rf = rows.values.map(v => math.round(v._2 * 100)).sum
    val rl = rows.values.map(v => math.round(v._4 * 100)).sum
    assert(rf == rl, s"first-touch total $rf != last-touch total $rl")
    assert(rows.values.map(_._1).sum == rows.values.map(_._3).sum,
      "session counts conserved")
    // independent driver recompute of the whole attribution
    import org.apache.spark.sql.functions.{col, round, unix_micros}
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    val ftRe = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val ltRe = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    ev.groupBy(_._1).foreach { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      var sess = List.newBuilder[Vector[(Long, Long, Long, String, Long)]]
      var cur = Vector.empty[(Long, Long, Long, String, Long)]
      var prev = Long.MinValue
      sorted.foreach { e =>
        if (cur.nonEmpty && e._3 - prev <= 1800L * 1000000L) cur :+= e
        else { if (cur.nonEmpty) sess += cur; cur = Vector(e) }
        prev = e._3
      }
      if (cur.nonEmpty) sess += cur
      sess.result().foreach { ses =>
        val rev = ses.filter(_._4 == "purchase").map(_._5).sum
        if (rev > 0) {
          ftRe(ses.head._4) += rev
          val fp = ses.indexWhere(_._4 == "purchase")
          val before = ses.take(fp).filter(_._4 != "purchase")
          ltRe(if (before.isEmpty) "direct" else before.last._4) += rev
        }
      }
    }
    ftRe.foreach { case (ch, c) =>
      assert(math.round(rows(ch)._2 * 100) == c, s"first-touch $ch") }
    ltRe.foreach { case (ch, c) =>
      assert(math.round(rows(ch)._4 * 100) == c, s"last-touch $ch") }
  }

  test("q280: every brand's OLS slope and r recomputed from exact moments") {
    val rows = SparkEntry.queries("q280_discount_elasticity")(spark, sf())
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    import org.apache.spark.sql.functions.{col, round}
    val brandOf = graft.sources.Tables.table(spark, sf(), "part")
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_partkey"), round(col("l_discount") * 100).cast("long"),
        col("l_quantity").cast("long"))
      .collect().map(r => (brandOf(r.getLong(0)), r.getLong(1), r.getLong(2)))
    li.groupBy(_._1).foreach { case (b, ls) =>
      val n = ls.length.toLong
      val (sx, sy) = (ls.map(_._2).sum, ls.map(_._3).sum)
      val sxy = ls.map(l => l._2 * l._3).sum
      val sxx = ls.map(l => l._2 * l._2).sum
      val syy = ls.map(l => l._3 * l._3).sum
      val (gn, gs, gr) = rows(b)
      assert(gn == n, s"n for $b")
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)
      val r = (n * sxy - sx * sy).toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy))
      assert(math.abs(gs - slope) < 1e-6 && math.abs(gr - r) < 1e-4,
        s"fit for $b")
    }
  }

  test("q281: both segmentation levels recomputed; splits are interior") {
    val rows = SparkEntry.queries("q281_binary_segmentation")(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    import org.apache.spark.sql.functions.{col, to_date, lit, datediff}
    val dg = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("event_type"),
        datediff(col("ts").cast("date"), to_date(lit("1970-01-01"))).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    def bestSplit(xs: Seq[(Long, Long)]): (Long, Long) = {
      // xs sorted by day; returns (split day, |n·cum − t·S|)
      val n = xs.length.toLong
      val s0 = xs.map(_._2).sum
      var cum = 0L
      xs.dropRight(1).zipWithIndex.map { case ((ed, x), i) =>
        cum += x
        (ed, math.abs(n * cum - (i + 1) * s0))
      }.maxBy { case (ed, d) => (d, -ed) }
    }
    dg.groupBy(_._1._1).foreach { case (et, ds) =>
      val xs = ds.toSeq.map { case ((_, ed), x) => (ed, x) }.sortBy(_._1)
      val (t1, d1) = bestSplit(xs)
      assert(rows((et, 1L, "all")) == ((t1, d1, xs.length.toLong)), s"l1 $et")
      val (left, right) = xs.partition(_._1 <= t1)
      Seq(("L", left), ("R", right)).foreach { case (seg, part) =>
        if (part.length >= 2) {
          val (t2, d2) = bestSplit(part)
          assert(rows((et, 2L, seg)) == ((t2, d2, part.length.toLong)),
            s"l2 $et $seg")
          assert(t2 < part.map(_._1).max, s"interior split $et $seg")
        }
      }
    }
  }

  test("q282: BFS rings recomputed; rings + unreached tile the node set") {
    val rows = SparkEntry.queries("q282_bfs_hops")(spark, sf()).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    import org.apache.spark.sql.functions.col
    val pp = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pp.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val hub = adj.toSeq.map { case (n, ns) => (n, ns.size) }
      .maxBy { case (n, d) => (d, -n) }._1
    var visited = Set(hub)
    var frontier = Set(hub)
    val want = collection.mutable.Map(0L -> 1L)
    (1L to 4L).foreach { h =>
      val next = frontier.flatMap(adj(_)) -- visited
      if (next.nonEmpty) want(h) = next.size.toLong
      visited ++= next
      frontier = next
    }
    val unreached = adj.keySet.size - visited.size
    if (unreached > 0) want(-1L) = unreached.toLong
    assert(rows == want.toMap, s"got $rows want $want")
    assert(rows.values.sum == adj.keySet.size.toLong, "rings tile the nodes")
  }

  test("q283: sweep-line peaks recomputed from a full interval replay") {
    val rows = SparkEntry.queries("q283_peak_concurrency")(spark, sf())
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val out = collection.mutable.ArrayBuffer[(Long, Long)]()
      var (s0, e0) = (sorted.head._3, sorted.head._3)
      sorted.drop(1).foreach { e =>
        if (e._3 - e0 <= 1800L * 1000000L) e0 = e._3
        else { out += ((s0, e0)); s0 = e._3; e0 = e._3 }
      }
      out += ((s0, e0)); out
    }.toSeq
    val deltas = (sessions.map(s => (s._1, 1L)) ++
      sessions.map(s => (s._2 + 1, -1L)))
      .groupBy(_._1).map { case (us, ds) => us -> ds.map(_._2).sum }
      .toSeq.sortBy(_._1)
    var conc = 0L
    val peak = collection.mutable.Map[Long, Long]()
    deltas.foreach { case (us, d) =>
      conc += d
      val ed = us / 86400000000L
      peak(ed) = math.max(peak.getOrElse(ed, Long.MinValue), conc)
    }
    val started = sessions.groupBy(_._1 / 86400000000L)
      .map { case (ed, ss) => ed -> ss.size.toLong }
    assert(rows.keySet == (peak.keySet ++ started.keySet), "day set")
    rows.foreach { case (ed, (pk, st)) =>
      assert(pk == peak.getOrElse(ed, 0L), s"peak at $ed")
      assert(st == started.getOrElse(ed, 0L), s"starts at $ed")
    }
  }

  test("q284: shrinkage pulls toward the pooled mean, hardest for small brands") {
    val rows = SparkEntry.queries("q284_eb_shrinkage")(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val rates = rows.map(_._2._3)
    val m = rates.sum / rates.length
    rows.foreach { case (b, (n, k, raw, shrunk)) =>
      assert(math.abs(raw - k.toDouble / n) < 1e-6, s"raw for $b")
      // the posterior lies strictly between the raw rate and the pooled
      // mean (within display rounding)
      assert((shrunk - raw) * (m - raw) >= -1e-6,
        s"$b must shrink toward the mean: raw=$raw shrunk=$shrunk m=$m")
      assert(math.abs(shrunk - raw) <= math.abs(m - raw) + 1e-6,
        s"$b must not overshoot the mean")
    }
  }

  test("q285: OOV rates recomputed against an independently-built vocab") {
    val rows = SparkEntry.queries("q285_oov_drift")(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    import org.apache.spark.sql.functions.{col, lower, split, explode}
    val docs = graft.sources.Tables.table(spark, sf(), "documents")
      .select(col("doc_id"), col("source"),
        explode(split(lower(graft.functions.TextExprs.cleanText(col("text"))),
          " ")).as("t"))
      .where(col("t") =!= "").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val mxid = docs.map(_._1).max
    val (ea, eb) = docs.partition(_._1 * 2 <= mxid)
    val vocab = ea.groupBy(_._3).map { case (t, ts) => (t, ts.size) }
      .toSeq.sortBy { case (t, c) => (-c, t) }.take(512).map(_._1).toSet
    def agg(part: Array[(Long, String, String)]) =
      part.groupBy(_._2).map { case (src, ts) =>
        src -> (ts.length.toLong, ts.count(x => !vocab(x._3)).toLong) }
    val (wa, wb) = (agg(ea), agg(eb))
    rows.foreach { case (src, (ta, oa, tb, ob)) =>
      assert(wa(src) == ((ta, oa)), s"epoch A for $src")
      assert(wb(src) == ((tb, ob)), s"epoch B for $src")
    }
    assert(rows.keySet == (wa.keySet intersect wb.keySet))
  }

  /** Shared driver-side co-purchase graph (edges w>=2) for q286's replay. */
  private lazy val coPurchaseAdj: Map[Long, Set[Long]] = {
    import org.apache.spark.sql.functions.col
    val pp = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = pp.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSet
    edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
  }

  test("q286: top-20 predicted links recomputed; no candidate is an existing edge") {
    val rows = SparkEntry.queries("q286_link_prediction")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3)))
    assert(rows.length == 20)
    val adj = coPurchaseAdj
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val cand = (for {
      // .toSeq on the inner generators: a Set-typed flatMap would dedupe
      // the (u, v) wedge tuples and collapse every cn to 1
      (u, nu) <- adj.toSeq; w <- nu.toSeq; v <- adj(w).toSeq
      if u < v && !nu.contains(v)
    } yield (u, v)).groupBy(identity).map { case ((u, v), ws) =>
      val cn = ws.size.toLong
      (u, v) -> (cn, r6(cn.toDouble / (adj(u).size + adj(v).size - cn)))
    }
    val want = cand.toSeq
      .sortBy { case ((u, v), (_, j)) => (-j, u, v) }.take(20)
    assert(rows.map(_._1).toSet == want.map(_._1).toSet, "top-20 pair set")
    rows.foreach { case (p, got) =>
      assert(got == cand(p), s"score for $p")
      assert(!adj(p._1).contains(p._2), s"$p must not be an existing edge")
    }
  }

  test("q287: global slope equals the moment-sum fit; flags recomputed") {
    val rows = SparkEntry.queries("q287_simpson_audit")(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toMap
    import org.apache.spark.sql.functions.{col, round}
    val brandOf = graft.sources.Tables.table(spark, sf(), "part")
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val custOf = graft.sources.Tables.table(spark, sf(), "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val segOf = graft.sources.Tables.table(spark, sf(), "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val li = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_partkey"), col("l_orderkey"),
        round(col("l_discount") * 100).cast("long"),
        col("l_quantity").cast("long"))
      .collect().map(r => (brandOf(r.getLong(0)),
        segOf(custOf(r.getLong(1))), r.getLong(2), r.getLong(3)))
    def slope(ls: Seq[(Long, Long)]): Double = {
      val n = ls.length.toLong
      val (sx, sy) = (ls.map(_._1).sum, ls.map(_._2).sum)
      val sxy = ls.map(l => l._1 * l._2).sum
      val sxx = ls.map(l => l._1 * l._1).sum
      (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)
    }
    li.groupBy(_._1).foreach { case (b, ls) =>
      val g = slope(ls.map(l => (l._3, l._4)))
      val segs = ls.groupBy(_._2).values
        .map(ss => slope(ss.map(l => (l._3, l._4)))).toSeq
      val (gg, gn, gp, gf) = rows(b)
      assert(math.abs(gg - g) < 1e-5, s"global slope for $b")
      assert(gn == segs.length.toLong, s"segment count for $b")
      assert(gp == segs.count(_ > 0).toLong, s"positive segments for $b")
      val wantFlag = (g > 0 && 2 * segs.count(_ > 0) < segs.length) ||
        (g < 0 && 2 * segs.count(_ > 0) > segs.length)
      assert(gf == wantFlag, s"simpson flag for $b")
    }
  }

  test("q288: per-state chi-square recomputed from the trigram table") {
    val rows = SparkEntry.queries("q288_markov_order_test")(spark, sf())
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val tris = ev.groupBy(_._1).values.flatMap { es =>
      val s0 = es.sortBy(e => (e._3, e._2))
      s0.sliding(3).filter(_.size == 3).flatMap { w =>
        val gap1 = w(2)._3 - w(1)._3; val gap2 = w(1)._3 - w(0)._3
        if (gap1 <= 1800000000L && gap2 <= 1800000000L)
          Some((w(0)._4, w(1)._4, w(2)._4)) else None
      }
    }.toSeq
    val o = tris.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val tpc = o.groupBy(t => (t._1._1, t._1._2)).map { case (k, v) =>
      k -> v.values.sum }
    val tcn = o.groupBy(t => (t._1._2, t._1._3)).map { case (k, v) =>
      k -> v.values.sum }
    val tc = o.groupBy(_._1._2).map { case (k, v) => k -> v.values.sum }
    o.groupBy(_._1._2).foreach { case (cur, cells) =>
      val chi = cells.map { case ((p, c, n), obs) =>
        val e = tpc((p, c)).toDouble * tcn((c, n)) / tc(c)
        (obs - e) * (obs - e) / e
      }.sum
      val (gcells, gtri, gchi) = rows(cur)
      assert(gcells == cells.size.toLong && gtri == cells.values.sum,
        s"margins for $cur")
      assert(math.abs(gchi - chi) < 1e-3, s"chi for $cur")
    }
  }

  test("q289: naive and adjusted effects recomputed from raw strata") {
    val r = SparkEntry.queries("q289_direct_adjustment")(spark, sf())
      .collect().head
    import org.apache.spark.sql.functions.col
    val brandOf = graft.sources.Tables.table(spark, sf(), "part")
      .select("p_partkey", "p_brand").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    val custOf = graft.sources.Tables.table(spark, sf(), "orders")
      .select("o_orderkey", "o_custkey").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val segOf = graft.sources.Tables.table(spark, sf(), "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    val li = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_partkey"), col("l_orderkey"), col("l_discount"),
        col("l_quantity").cast("long"))
      .collect().map(x => ((brandOf(x.getLong(0)),
        segOf(custOf(x.getLong(1)))), x.getDouble(2) > 0, x.getLong(3)))
    val t0 = li.filter(_._2); val c0 = li.filterNot(_._2)
    val naive = t0.map(_._3).sum.toDouble / t0.length -
      c0.map(_._3).sum.toDouble / c0.length
    val strata = li.groupBy(_._1).filter { case (_, ls) =>
      ls.exists(_._2) && ls.exists(!_._2) }
    val wTot = strata.values.map(_.length.toLong).sum
    val wd = strata.values.map { ls =>
      val (ts, cs) = ls.partition(_._2)
      ls.length.toLong * (ts.map(_._3).sum.toDouble / ts.length -
        cs.map(_._3).sum.toDouble / cs.length)
    }.sum
    assert(r.getLong(0) == strata.size.toLong, "strata used")
    assert(r.getLong(1) == t0.length.toLong && r.getLong(2) == c0.length.toLong)
    assert(math.abs(r.getDouble(3) - naive) < 1e-3, "naive effect")
    assert(math.abs(r.getDouble(4) - wd / wTot) < 1e-3, "adjusted effect")
    assert(math.abs(r.getDouble(5) - (naive - wd / wTot)) < 1e-3, "bias")
  }

  test("q290: per-source chi-square contributions recomputed; margins exact") {
    val rows = SparkEntry.queries("q290_mix_independence")(spark, sf())
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val o = graft.sources.Tables.table(spark, sf(), "documents")
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rm = o.groupBy(_._1._1).map { case (s0, v) => s0 -> v.values.sum }
    val cm = o.groupBy(_._1._2).map { case (l, v) => l -> v.values.sum }
    val nn = o.values.sum
    rm.foreach { case (src, r0) =>
      val cells = o.filter(_._1._1 == src)
      val chi = cells.map { case ((_, l), obs) =>
        val e = r0.toDouble * cm(l) / nn
        (obs - e) * (obs - e) / e
      }.sum
      val (gn, gl, gchi) = rows(src)
      assert(gn == r0 && gl == cells.size.toLong, s"margins for $src")
      assert(math.abs(gchi - chi) < 1e-3, s"chi for $src")
    }
    assert(rows.keySet == rm.keySet)
  }

  test("q291: the exact-LONG LLR replay and decisions recomputed") {
    val rows = SparkEntry.queries("q291_sprt_replay")(spark, sf()).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4))).toMap
    import org.apache.spark.sql.functions.{col, to_date, lit, datediff}
    val ev = graft.sources.Tables.table(spark, sf(), "events")
      .select(datediff(col("ts").cast("date"), to_date(lit("1970-01-01")))
        .cast("long"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDay = ev.groupBy(_._1).map { case (ed, es) =>
      ed -> (es.length.toLong, es.count(_._2 == "purchase").toLong) }
    var cum = 0L
    byDay.toSeq.sortBy(_._1).foreach { case (ed, (n, k)) =>
      cum += k * SparkEntry.sprtL1 + (n - k) * SparkEntry.sprtL2
      val (gn, gk, gllr, gdec) = rows(ed)
      assert(gn == n && gk == k, s"day counts at $ed")
      assert(math.abs(gllr - cum.toDouble / 1e9) < 1e-6, s"llr at $ed")
      val want = if (cum >= SparkEntry.sprtBound) "accept_h1"
        else if (cum <= -SparkEntry.sprtBound) "accept_h0" else "continue"
      assert(gdec == want, s"decision at $ed")
    }
    assert(rows.size == byDay.size)
  }

  test("q292: Fisher sits between Laspeyres and Paasche; indices recomputed") {
    val r = SparkEntry.queries("q292_price_index")(spark, sf())
      .collect().head
    val (np, l, p, f) = (r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3))
    assert(f >= math.min(l, p) - 1e-4 && f <= math.max(l, p) + 1e-4,
      "Fisher is the geometric mean")
    assert(math.abs(f - math.sqrt(l * p)) < 1e-3)
    import org.apache.spark.sql.functions.{col, to_date, lit, datediff, round}
    val li = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_partkey"),
        round(col("l_extendedprice") * 100).cast("long"),
        col("l_quantity").cast("long"),
        datediff(col("l_shipdate"), to_date(lit("1970-01-01"))).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3)))
    val cut = (li.map(_._4).min + li.map(_._4).max) / 2
    val pp = li.groupBy(_._1).flatMap { case (_, ls) =>
      val (a, b) = ls.partition(_._4 <= cut)
      if (a.nonEmpty && b.nonEmpty)
        Some((a.map(_._2).sum, a.map(_._3).sum,
          b.map(_._2).sum, b.map(_._3).sum))
      else None
    }.toSeq
    assert(np == pp.length.toLong, "matched basket size")
    val lNum = pp.map { case (_, q0, v1, q1) => v1.toDouble / q1 * q0 }.sum
    val lDen = pp.map(_._1.toDouble).sum
    val pNum = pp.map(_._3.toDouble).sum
    val pDen = pp.map { case (v0, q0, _, q1) => v0.toDouble / q0 * q1 }.sum
    assert(math.abs(l - lNum / lDen) < 1e-3, "laspeyres")
    assert(math.abs(p - pNum / pDen) < 1e-3, "paasche")
  }

  test("q293: the migration matrix tiles every customer once; quintiles recomputed") {
    val rows = SparkEntry.queries("q293_segment_migration")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    import org.apache.spark.sql.functions.{col, to_date, lit, datediff, round}
    val os = graft.sources.Tables.table(spark, sf(), "orders")
      .select(col("o_custkey"), round(col("o_totalprice") * 100).cast("long"),
        datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cut = (os.map(_._3).min + os.map(_._3).max) / 2
    def quint(half: Seq[(Long, Long)]): Map[Long, Long] = {
      val byCust = half.groupBy(_._1).map { case (ck, ls) =>
        (ck, ls.map(_._2).sum) }.toSeq.sortBy { case (ck, v) => (v, ck) }
      val n = byCust.length
      byCust.zipWithIndex.map { case ((ck, _), i) =>
        // ntile(5): first n%5 buckets get one extra row
        val base = n / 5; val extra = n % 5
        val q = if (i < (base + 1) * extra) i / (base + 1)
          else extra + (i - (base + 1) * extra) / base
        ck -> (q + 1L)
      }.toMap
    }
    val q0 = quint(os.filter(_._3 <= cut).map(o => (o._1, o._2)))
    val q1 = quint(os.filter(_._3 > cut).map(o => (o._1, o._2)))
    val want = (q0.keySet ++ q1.keySet).toSeq
      .map(ck => (q0.getOrElse(ck, 0L), q1.getOrElse(ck, 0L)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(rows.keySet == want.keySet, "cell set")
    want.foreach { case (cell, n) => assert(rows(cell)._1 == n, s"cell $cell") }
    assert(rows.values.map(_._1).sum == (q0.keySet ++ q1.keySet).size.toLong,
      "matrix tiles the customer set")
  }

  test("q294: engaged reach and MDE recomputed; MDE shrinks with reach toward 0.5") {
    val rows = SparkEntry.queries("q294_experiment_sizing")(spark, sf())
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(4))).toMap
    import org.apache.spark.sql.functions.col
    val pc = graft.sources.Tables.table(spark, sf(), "events")
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val nUsers = pc.keySet.map(_._1).size.toLong
    pc.keySet.map(_._2).foreach { et =>
      val reached = pc.count { case ((_, t), n) => t == et && n >= 15 }.toLong
      val (gr, gn, gm) = rows(et)
      assert(gr == reached && gn == nUsers, s"reach for $et")
      val p = reached.toDouble / nUsers
      val mde = (1.959964 + 0.841621) *
        math.sqrt(2 * p * (1 - p) / (nUsers / 2.0))
      assert(math.abs(gm - mde) < 1e-5, s"mde for $et")
    }
  }

  test("q295: Wilson intervals recomputed; they bracket the rate and stay in [0,1]") {
    val rows = SparkEntry.queries("q295_dose_response")(spark, sf()).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    import org.apache.spark.sql.functions.{col, round}
    val li = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(round(col("l_discount") * 100).cast("long"), col("l_returnflag"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = li.groupBy(_._1).map { case (d, ls) =>
      d -> (ls.length.toLong, ls.count(_._2 == "R").toLong) }
    assert(rows.keySet == want.keySet, "discount grid")
    val z = 1.959964; val z2 = z * z
    want.foreach { case (d, (n, k)) =>
      val (gn, gk, gr, glo, ghi) = rows(d)
      assert(gn == n && gk == k, s"counts at $d")
      val p = k.toDouble / n
      val center = (p + z2 / (n * 2)) / (1.0 + z2 / n)
      val half = z * math.sqrt(p * (1 - p) / n + z2 / (n.toDouble * n * 4)) /
        (1.0 + z2 / n)
      assert(math.abs(glo - (center - half)) < 1e-5, s"lo at $d")
      assert(math.abs(ghi - (center + half)) < 1e-5, s"hi at $d")
      assert(glo >= 0 && ghi <= 1 && glo <= gr && gr <= ghi,
        s"bracket at $d")
    }
  }

  test("q296: both half rankings and rho recomputed; rho in [-1, 1]") {
    val rows = SparkEntry.queries("q296_split_half")(spark, sf()).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty, "every source must appear in both halves")
    val n = rows.head._2._3
    assert(rows.forall(_._2._3 == n))
    val sumD2 = rows.map { case (_, (re, ro, _, _, _)) =>
      (re - ro) * (re - ro) }.sum
    assert(rows.head._2._4 == sumD2, "sum d^2 from the emitted ranks")
    val rho = 1.0 - 6.0 * sumD2 / (n * (n * n - 1.0))
    assert(math.abs(rows.head._2._5 - rho) < 1e-5, "rho formula")
    assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9)
    // ranks are permutations of 1..n in each half
    assert(rows.map(_._2._1).sorted.toSeq == (1L to n).toList, "even ranks")
    assert(rows.map(_._2._2).sorted.toSeq == (1L to n).toList, "odd ranks")
  }

  test("q297-q299: the closing TPC-H shapes recomputed from raw rows") {
    import org.apache.spark.sql.functions.{col, to_date, lit, datediff, round}
    // q297: EXISTS-per-order slow-line flags
    val od = graft.sources.Tables.table(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).cast("long"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    val li = graft.sources.Tables.table(spark, sf(), "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_discount"),
        round(col("l_extendedprice") * col("l_discount") * 100).cast("long"),
        datediff(col("l_shipdate"), to_date(lit("1970-01-01"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    val slowByPrio = li.groupBy(_._1).toSeq.map { case (ok, ls) =>
      val (prio, oed) = od(ok)
      (prio, ls.exists(_._5 - oed > 60))
    }.groupBy(_._1).map { case (p, os) =>
      p -> (os.size.toLong, os.count(_._2).toLong) }
    val r297 = SparkEntry.queries("q297_priority_exists")(spark, sf())
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    slowByPrio.foreach { case (p, w) => assert(r297(p) == w, s"priority $p") }
    // q299: band-filtered discount revenue
    val mx = li.map(_._5).max
    val band = li.filter(l => l._5 > mx - 365 && l._2 < 24 &&
      l._3 >= 0.05 && l._3 <= 0.07)
    val r299 = SparkEntry.queries("q299_forecast_revenue")(spark, sf())
      .collect().head
    assert(r299.getLong(0) == band.length.toLong, "q299 line count")
    assert(r299.getDouble(1) == BigDecimal(band.map(_._4).sum.toDouble / 100)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, "q299 delta")
    // q298: promo share sums to the same total as the unconditional sum
    val r298 = SparkEntry.queries("q298_promo_share")(spark, sf()).collect()
    assert(r298.forall(r => r.getDouble(1) <= r.getDouble(2) + 1e-9),
      "promo revenue never exceeds the month total")
    assert(r298.nonEmpty)
  }
}
