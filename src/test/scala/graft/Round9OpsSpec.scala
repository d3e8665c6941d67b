package graft

import org.apache.spark.sql.functions._

/** Round-9 curation operators: canonical pick per dedup cluster, PMI
  * collocations, stratified split manifest, embedding outlier queue. */
class Round9OpsSpec extends SparkSpec {

  test("q98 canonical pick: one row per cluster; canonical is a member with max tokens, min id among ties") {
    val clusters = SparkEntry.queries("q53_dedup_clusters")(spark, sf()).cache()
    val picks = SparkEntry.queries("q98_canonical_pick")(spark, sf()).cache()
    assert(picks.count() == picks.select("cluster_id").distinct().count())
    assert(picks.count() == clusters.select("cluster_id").distinct().count())
    // canonical_id is a member of its cluster
    val nonMember = picks.join(clusters,
      picks("canonical_id") === clusters("doc_id") &&
        picks("cluster_id") === clusters("cluster_id"), "left_anti")
    assert(nonMember.count() == 0)
    // no member of the cluster has more tokens than the canonical pick,
    // and no lower-id member shares the max token count
    val toks = graft.sources.Tables.table(spark, sf(), "documents")
      .select(col("doc_id"),
        size(split(graft.functions.TextExprs.cleanText(col("text")), " "))
          .cast("long").as("n_toks"))
    val members = clusters.join(toks, "doc_id")
      .join(picks.select(col("cluster_id"), col("canonical_id"), col("canonical_toks")),
        "cluster_id")
    assert(members.where(col("n_toks") > col("canonical_toks")).count() == 0)
    assert(members.where(col("n_toks") === col("canonical_toks") &&
      col("doc_id") < col("canonical_id")).count() == 0)
    clusters.unpersist(); picks.unpersist()
  }

  test("q99 PMI: pairs ordered, counts consistent with an independent recompute") {
    val out = SparkEntry.queries("q99_pmi_cooccur")(spark, sf()).cache()
    assert(out.where(col("tok_a") >= col("tok_b")).count() == 0)
    assert(out.where(col("n_ab") < 5).count() == 0)
    // recompute one pair's doc-level co-occurrence count directly
    val row = out.orderBy(col("n_ab").desc, col("tok_a"), col("tok_b")).head()
    val (a, b) = (row.getString(0), row.getString(1))
    val docs = graft.sources.Tables.table(spark, sf(), "documents")
      .select(array_distinct(split(graft.functions.TextExprs.cleanText(col("text")), " ")).as("ts"))
    val direct = docs.where(array_contains(col("ts"), a) && array_contains(col("ts"), b)).count()
    assert(direct == row.getLong(2), s"pair ($a,$b): pmi path ${row.getLong(2)} vs direct $direct")
    // PMI value matches ln(n_ab * N / (n_a * n_b)) recomputed from scratch
    val n = docs.count().toDouble
    val na = docs.where(array_contains(col("ts"), a)).count().toDouble
    val nb = docs.where(array_contains(col("ts"), b)).count().toDouble
    val expected = BigDecimal(math.log(direct * n / (na * nb)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getDouble(3) - expected) < 1e-9)
    out.unpersist()
  }

  test("q100 split: exact per-language 80/10/10 integer quotas, total partition of the corpus") {
    val out = SparkEntry.queries("q100_strat_split")(spark, sf()).cache()
    val docs = graft.sources.Tables.table(spark, sf(), "documents")
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    val got = out.groupBy("lang").pivot("split", Seq("train", "val", "test")).count()
      .na.fill(0L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val want = docs.groupBy("lang").count().collect().map { r =>
      val n = r.getLong(1)
      r.getString(0) -> ((n * 8) / 10, n / 10, n - (n * 8) / 10 - n / 10)
    }.toMap
    assert(got == want, s"quota mismatch: got $got want $want")
    out.unpersist()
  }

  test("q100 split assignment is a pure function of doc_id (stable across partitionings)") {
    val a = SparkEntry.queries("q100_strat_split")(spark, sf())
    val b = SparkEntry.queries("q100_strat_split")(spark, sf()).repartition(7)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("q103 semdedup: total partition; every drop has a kept-or-dropped lower-id witness; keeps have none") {
    val out = SparkEntry.queries("q103_semdedup")(spark, sf()).cache()
    val emb = graft.sources.Tables.table(spark, sf(), "embeddings")
    assert(out.count() == emb.count())
    assert(out.where(!col("keep")).count() > 0, "threshold should exercise the drop path")
    // recompute the witness relation independently: within-cluster pairs
    // above the rounded-cosine threshold
    val v = out.select(col("vec_id"), col("cluster"), col("keep"))
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
    val witnesses = v.as("a").join(v.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.vec_id") < col("b.vec_id"))
      .where(round(graft.functions.VectorExprs.cosine(
        col("a.embedding"), col("b.embedding")), 6) >= 0.40)
      .select(col("b.vec_id").as("vec_id")).distinct().withColumn("_w", lit(true))
    val flagged = out.join(witnesses, Seq("vec_id"), "left")
    assert(flagged.where(col("keep") === col("_w").isNotNull).count() == 0,
      "keep must be exactly the absence of a lower-id witness")
    out.unpersist()
  }

  test("q102 zipf: one row; type/token counts exact; slope negative (freq falls with rank)") {
    val row = SparkEntry.queries("q102_zipf")(spark, sf()).head()
    val tok = graft.sources.Tables.table(spark, sf(), "documents")
      .select(explode(split(graft.functions.TextExprs.cleanText(col("text")), " ")).as("tok"))
    assert(row.getLong(2) == tok.select("tok").distinct().count())
    assert(row.getLong(3) == tok.count())
    assert(row.getDouble(0) < 0.0, s"zipf slope should be negative, got ${row.getDouble(0)}")
  }

  test("q101 outliers: 5 per label, ranked ascending by cosine, genuinely the least cohesive") {
    val out = SparkEntry.queries("q101_embed_outlier")(spark, sf()).cache()
    val perLabel = out.groupBy("label").agg(count(lit(1)).as("c"),
      max("rnk").as("mx"), min("rnk").as("mn")).collect()
    assert(perLabel.forall(r => r.getLong(1) == 5 && r.getLong(2) == 5 && r.getLong(3) == 1))
    // rank order is ascending in cos_c within each label
    val inversions = out.as("x").join(out.as("y"),
      col("x.label") === col("y.label") && col("x.rnk") < col("y.rnk") &&
        col("x.cos_c") > col("y.cos_c"))
    assert(inversions.count() == 0)
    // nothing outside the listing scores below the per-label worst listed
    val emb = graft.sources.Tables.table(spark, sf(), "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"), col("embedding"))
    val cent = emb.select(col("label"), posexplode(col("embedding")))
      .groupBy("label", "pos").agg(round(avg(col("col")), 6).as("cv"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("ps"))
      .select(col("label"), expr("transform(ps, x -> x.cv)").as("centroid"))
    val scored = emb.join(cent, "label")
      .select(col("label"), col("vec_id"),
        round(graft.functions.VectorExprs.cosine(col("embedding"), col("centroid")), 6).as("cos"))
    val cut = out.groupBy("label").agg(max("cos_c").as("cut"))
    val missed = scored.join(cut, "label")
      .join(out.select(col("label"), col("vec_id")), Seq("label", "vec_id"), "left_anti")
      .where(col("cos") < col("cut"))
    assert(missed.count() == 0)
    out.unpersist()
  }
}
