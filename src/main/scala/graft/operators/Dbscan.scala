package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DBSCAN (Ester et al., KDD 1996) over an embedding column, re-expressed
  * as bounded Spark dataflows — the density-based complement to the
  * centroid family (q78 k-means, q103 SemDeDup): it finds arbitrarily
  * shaped dense regions and, unlike k-means, it NAMES the leftovers
  * (noise), which is exactly the triage a curation pipeline wants — keep
  * dense semantic clusters for dedup/balancing, route noise to review.
  *
  * Spark-first realization (no all-pairs anywhere):
  *  1. ε-neighborhood graph = the SAME hyperplane-LSH bucketed candidate
  *     join as [[Dedup.embeddingNearDups]] (q34): one deterministic
  *     bucket per vector, candidates only within a bucket, exact cosine
  *     verify. Recall caveat is q34's, documented there — the oracle
  *     twin recomputes the SAME buckets from the same plane constants,
  *     so both engines see the identical graph.
  *  2. Core test = one hash agg over the symmetrized pair list
  *     (deg(x) + 1 ≥ minPts, the +1 counting x itself per the paper).
  *  3. Clusters = connected components over CORE–CORE edges only
  *     ([[Dedup.connectedComponents]]: driver union-find under a
  *     `driverMaxEdges` guard with a star-contraction distributed
  *     fallback). Label = min core id reachable — deterministic.
  *  4. Border points (non-core with ≥ 1 core neighbor) attach to the
  *     MIN cluster label among their core neighbors — the paper leaves
  *     this tie arbitrary (first-visited wins); min pins it so the
  *     result is a pure function of the corpus, twinnable in SQL.
  *
  * At 100 TB: the bucket join shuffles (bucket, id, vec) once; degree
  * and border assignment are single hash aggs on ids-only relations;
  * the CC input is the core–core subgraph, which density thresholds keep
  * far smaller than the candidate graph. Nothing is quadratic in the
  * corpus — the one quadratic risk (a mega-bucket) is the q34/q176
  * plane-count knob, already ScaleProbe-audited there.
  */
object Dbscan {

  /** Returns one row per input id: (vec_id, role, cluster_id) with
    * role ∈ {core, border, noise} and cluster_id = −1 for noise. */
  def cluster(df: DataFrame, id: Column, vec: Column, eps: Double,
      minPts: Int, nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val ids = df.select(id.cast("long").as("vec_id"))
    // Slim pin: (id_a, id_b) only — three consumers (degree, core-core
    // edge filter, border attach) re-read it; the vectors never leave
    // the candidate join above.
    val pairs = Dedup.embeddingNearDups(df, id, vec, threshold = eps,
        nPlanes = nPlanes, dim = dim)
      .select(col("id_a").cast("long").as("id_a"),
        col("id_b").cast("long").as("id_b"))
      .localCheckpoint()
    val sym = pairs.union(pairs.select(col("id_b"), col("id_a")))
      .toDF("id", "nbr")
    val core = sym.groupBy("id").agg(count(lit(1)).as("deg"))
      .where(col("deg") + lit(1) >= minPts)
      .select("id")
    val coreEdges = pairs
      .join(core.select(col("id").as("id_a")), "id_a")
      .join(core.select(col("id").as("id_b")), "id_b")
      .select("id_a", "id_b")
    val comp = Dedup.connectedComponents(coreEdges)
    // Isolated cores (no core neighbor) never enter the edge list: they
    // are their own singleton cluster — coalesce to self.
    val coreClusters = core
      .join(comp, core("id") === comp("node"), "left")
      .select(core("id"),
        coalesce(col("component").cast("long"), core("id")).as("cluster_id"))
    val border = sym
      .join(coreClusters.select(col("id").as("nbr"), col("cluster_id")), "nbr")
      .join(core, Seq("id"), "left_anti")
      .groupBy("id")
      .agg(min("cluster_id").as("cluster_id"))
    val labeled = coreClusters
      .select(col("id"), lit("core").as("role"), col("cluster_id"))
      .union(border.select(col("id"), lit("border").as("role"),
        col("cluster_id")))
    ids.join(labeled, ids("vec_id") === labeled("id"), "left")
      .select(col("vec_id"),
        coalesce(col("role"), lit("noise")).as("role"),
        coalesce(col("cluster_id"), lit(-1L)).as("cluster_id"))
  }
}
