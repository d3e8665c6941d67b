package graft.operators

/** Maximal-Marginal-Relevance greedy rerank (Carbonell & Goldstein 1998):
  * picks k items maximizing λ·relevance − (1−λ)·max-cosine-to-already-picked.
  *
  * Runs DRIVER-SIDE over a BOUNDED candidate pool — reranking is O(k·|pool|)
  * with |pool|² cosines by definition, and the pool is the top-≤20 output of
  * a distributed retrieval stage (the k-means-centroid bounded-collect
  * license). The corpus-sized work stays in the retrieval stage; this greedy
  * never sees it. Every cosine and every running score is rounded to 6 dp
  * BEFORE comparison, so the pick order is engine-exact and a DuckDB twin
  * can unroll the greedy steps as CTEs (q118/q143's oracle posture).
  */
object Mmr {

  def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** 6-dp-rounded cosine — one fused pass, same association order as the
    * engine-side [[graft.functions.VectorExprs.cosine]]. */
  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    r6(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Greedy MMR over `pool` = (id, relevance, vector) rows (relevance
    * already 6-dp-rounded by the retrieval stage). Ties break on id
    * ascending. Returns (rank 1..k, id, 6-dp mmr score). */
  def rerank(pool: Seq[(Long, Double, Seq[Double])], k: Int, lam: Double)
      : Seq[(Long, Long, Double)] = {
    val byId = pool.map(c => c._1 -> c._3).toMap
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    while (picked.length < k && picked.length < pool.length) {
      val chosen = pool.filterNot(c => picked.exists(_._1 == c._1)).map { c =>
        val score =
          if (picked.isEmpty) c._2
          else lam * c._2 - (1 - lam) * picked.map(p => cos(c._3, byId(p._1))).max
        (c._1, score)
      }.minBy { case (id, sc) => (-sc, id) }
      picked += chosen
    }
    picked.zipWithIndex.map { case ((id, sc), i) => ((i + 1).toLong, id, r6(sc)) }.toSeq
  }
}
