package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (Seidman 1983): repeatedly peel nodes of degree < k
  * until a fixpoint. The standard community-mining prefilter — the k-core is
  * the maximal subgraph where every node keeps at least k neighbors.
  *
  * Scale shape: the peel loops DRIVER-side over distributed degree
  * aggregates and semi-joins on the shrinking alive set; each round is one
  * shuffle of the surviving edge list, localCheckpoint-pinned so round n+1
  * never replays rounds 1..n (the star-contraction discipline from
  * [[Dedup]]'s connected components). Peel depth is bounded by the graph's
  * degeneracy ordering length — small in practice; each round strictly
  * shrinks the node set or terminates.
  */
object KCore {

  private def degrees(e: DataFrame): DataFrame =
    e.select(col("p1").as("node"))
      .unionAll(e.select(col("p2").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

  /** Nodes of the k-core of the undirected graph `edges` (columns `p1`,
    * `p2`, one row per edge, no duplicates/self-loops expected), with each
    * node's degree WITHIN the core. Returns columns (node, deg). */
  def core(edges: DataFrame, k: Int): DataFrame = {
    var e = edges.select("p1", "p2").localCheckpoint()
    var removed = 1L
    while (removed > 0) {
      val deg = degrees(e).localCheckpoint()
      // one action per round: count the casualties directly
      removed = deg.where(col("deg") < k).count()
      if (removed > 0) {
        val alive = deg.where(col("deg") >= k).select("node")
        val e1 = e.join(alive.withColumnRenamed("node", "p1"), Seq("p1"))
          .join(alive.withColumnRenamed("node", "p2"), Seq("p2"))
        // unrolled SECOND peel inside the same materialization (round 17):
        // the k-core is the unique fixpoint of peeling in ANY schedule, so
        // batching two peels per checkpoint halves the driver round trips
        // (each round previously cost a deg pin + count + edge pin; the
        // second peel here rides the same job). A no-op second peel (no
        // casualties in e1) filters with an all-alive set — harmless.
        val deg2 = degrees(e1)
        val alive2 = deg2.where(col("deg") >= k).select("node")
        e = e1.join(alive2.withColumnRenamed("node", "p1"), Seq("p1"))
          .join(alive2.withColumnRenamed("node", "p2"), Seq("p2"))
          .localCheckpoint()
      }
    }
    degrees(e)
  }
}
