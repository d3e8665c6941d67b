package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorExprs

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast nested-loop join of the
  * (small) query set against the corpus, scored with the higher-order-
  * function cosine. Correct, embarrassingly parallel, O(|Q|·|C|).
  *
  * Scale path: IVF (inverted-file) — assign every corpus vector to its
  * nearest centroid once (linear scan over ~hundreds of centroids, all
  * codegen'd expressions), then probe only the nProbe nearest cells per
  * query. At 100 TB the corpus scan is partitioned by cell, so a query
  * touches |corpus| * nProbe / nCells rows instead of all of them.
  */
object Similarity {

  /** Brute-force cosine top-k: every query against every corpus vector.
    * Queries are broadcast (they are the small side by construction).
    * Deterministic tie-break on corpus id. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    // norms hoisted to once-per-row below the join; the O(|Q|·|C|) inner
    // loop pays only the cross-term pass (bit-identical to cosine())
    val q = queries.select(col("id").as("query_id"), col("v").as("qv"),
      VectorExprs.normNative(col("v")).as("_qn"))
    val c = corpus.select(col("id").as("corpus_id"), col("v").as("cv"),
      VectorExprs.normNative(col("v")).as("_cn"))
    val scored = c.join(broadcast(q))
      .select(col("query_id"), col("corpus_id"),
        VectorExprs.cosineHoisted(col("qv"), col("cv"), col("_qn"), col("_cn")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Brute-force cosine top-k via the bounded [[TopKAgg]] aggregator:
    * identical results to [[bruteForceTopK]], but the per-query state never
    * exceeds k entries and partial aggregation combines map-side — at 100 TB
    * the shuffle carries |Q|·k rows instead of |Q|·|C| scores. */
  def bruteForceTopKAgg(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("v").as("qv"),
      VectorExprs.normNative(col("v")).as("_qn"))
    val c = corpus.select(col("id").as("corpus_id"), col("v").as("cv"),
      VectorExprs.normNative(col("v")).as("_cn"))
    val scored = c.join(broadcast(q))
      .select(col("query_id"), col("corpus_id"),
        VectorExprs.cosineHoisted(col("qv"), col("cv"), col("_qn"), col("_cn")).as("cos"))
    TopKAgg.perKey(scored, col("query_id"), col("cos"), col("corpus_id"), k)
      .select(col("_k").as("query_id"), col("id").as("corpus_id"),
        col("score").as("cos"), col("rank"))
  }

  /** Deterministic centroid selection: every (nRows/nCells)-th corpus vector
    * by id order — a stand-in for k-means that keeps the whole operator
    * reproducible (no iterative fitting in the hot path; swap in real
    * centroids when available). Returned collected: centroids are by design
    * small enough to broadcast as literals. */
  def sampleCentroids(corpus: DataFrame, nCells: Int): Seq[(Int, Seq[Double])] = {
    val ordered = corpus.select(col("id"), col("v")).orderBy("id").limit(nCells)
    ordered.collect().zipWithIndex.map { case (r, i) =>
      i -> r.getSeq[Float](1).map(_.toDouble).toSeq
    }.toSeq
  }

  /** Index side of IVF: nearest-centroid cell id per corpus vector —
    * argmax over centroid dot products (vectors ~unit norm; dot ≈ cosine)
    * as ONE native expression (`argmax_dot`), the centroid matrix riding
    * the generated code as data. The unrolled
    * `array_max(array(struct(dot, cid)))` form it replaces generates
    * O(nCells·dim) code and dies at Janino's 64 KB method limit near the
    * cell counts a 100 TB index runs; tie-break (highest cid, as struct
    * max picks) is preserved, so results are bit-identical. Assumes
    * centroids are handed over in cid order 0..n-1 (sampleCentroids'
    * contract). */
  def assignCells(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column = {
    require(centroids.zipWithIndex.forall { case ((cid, _), i) => cid == i },
      "assignCells expects centroids keyed 0..n-1 in order")
    graft.plans.AnnNative.argMaxDot(vec, centroids.map(_._2.toArray))
  }

  /** IVF top-k: probe the nProbe nearest cells for each query. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val centroids = sampleCentroids(corpus, nCells)
    // wrapped once: broadcasts past the CentMatrix threshold (a 100 TB
    // coarse quantizer runs 10⁴⁺ cells), and assignment + probe share it
    val cm = graft.plans.AnnNative.matrix(corpus.sparkSession,
      centroids.map(_._2.toArray))
    val indexed = corpus.select(col("id").as("corpus_id"), col("v").as("cv"),
        VectorExprs.normNative(col("v")).as("_cn"))
      .withColumn("cell", graft.plans.AnnNative.argMaxDot(col("cv"), cm))
    // per query: the nProbe closest cells, ordered (raw dot desc, cid desc)
    // inside one native expression — same selection as the unrolled
    // slice(reverse(array_sort(array(struct(dot, cid)))), 1, nProbe)
    val q = queries.select(col("id").as("query_id"), col("v").as("qv"),
        VectorExprs.normNative(col("v")).as("_qn"))
      .withColumn("cell", explode(
        graft.plans.AnnNative.topMByDot(col("qv"), cm, nProbe)))
    val scored = indexed.join(broadcast(q), Seq("cell"))
      .select(col("query_id"), col("corpus_id"),
        VectorExprs.cosineHoisted(col("qv"), col("cv"), col("_qn"), col("_cn")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic hyperplane-LSH candidate pairs: score `left` × `right`
    * only where both land in the SAME sign-bit bucket — an EQUI-join on
    * the packed bucket key, so the pair volume is Σ|bkt_l|·|bkt_r| ≈
    * |L|·|R| / 2^planes and the plan is a shuffled hash/sort-merge join
    * that scales with data, never a CartesianProduct. Norms are hoisted
    * once per input row (the [[VectorExprs.cosineHoisted]] posture), and
    * the bucket is md5-plane-deterministic, so a DuckDB twin can replicate
    * the exact candidate set (q34/q153's generated-SQL pattern).
    *
    * Returns (id_a, id_b, cos) with cos rounded to 6 dp; self-pairs
    * (id_a = id_b) are dropped. Candidate recall is governed by the plane
    * count: fewer planes → bigger buckets → higher recall and cost. */
  def lshCandidatePairs(left: DataFrame, leftId: Column, leftVec: Column,
                        right: DataFrame, rightId: Column, rightVec: Column,
                        planes: Seq[Seq[Double]]): DataFrame = {
    def side(df: DataFrame, id: Column, v: Column, out: String) =
      df.select(id.as(s"id_$out"), v.as(s"v$out"),
        VectorExprs.normNative(v).as(s"_n$out"),
        VectorExprs.hyperplaneBucket(v, planes).as("_bkt"))
    val a = side(left, leftId, leftVec, "a")
    val b = side(right, rightId, rightVec, "b")
    a.join(b, Seq("_bkt")).where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(VectorExprs.cosineHoisted(col("va"), col("vb"),
          col("_na"), col("_nb")), 6).as("cos"))
  }
}
