package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The part co-purchase graph shared by the graph-analytics family
  * (q267 k-core, q271 clustering coefficient, q276 embeddedness, q282 BFS):
  * an undirected edge (p1 < p2) per part pair sharing at least `minOrders`
  * orders.
  *
  * Scale shape: the pair fan-out is bounded by C(items-per-order, 2) per
  * order (never all-parts²); the distinct projection collapses repeat lines
  * before the self-join; the HAVING filter runs map-side-combinable. The
  * caller decides whether to pin the result (every current consumer does —
  * the edge list feeds 2-4 downstream passes).
  */
object CoPurchase {

  /** Edge list (p1, p2) of the co-purchase graph over `lineitem`.
    *
    * Pair generation collapses to order grain FIRST (one shuffle, basket
    * arrays bounded by items-per-order) and expands C(k,2) ordered pairs
    * with array lambdas — the alternative pp⋈pp self-join costs a join for
    * the same two exchanges. The lambdas are interpreted, but they run on
    * ≤items-per-order arrays once per ORDER, not per pair. */
  def edges(lineitem: DataFrame, minOrders: Int = 2): DataFrame = {
    val baskets = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .where(size(col("ps")) >= 2)
    baskets
      // native ordered_pairs (round 17): the nested transform/slice HOF
      // ran interpreted per element, allocating a slice per pair row
      .select(explode(graft.plans.WordGramsExprs.orderedPairs(col("ps"))).as("e"))
      .groupBy(col("e.p1").as("p1"), col("e.p2").as("p2"))
      .agg(count(lit(1)).as("w")).where(col("w") >= minOrders)
      .select("p1", "p2")
  }

  /** Triangle enumeration (x < y < z, one row per triangle) by the
    * node-iterator wedge join over an ordered edge list `e` (columns p1 <
    * p2). Callers pin `e` first — the join reads it three times. */
  def triangles(e: DataFrame): DataFrame =
    e.as("ab")
      .join(e.as("bc"), col("ab.p2") === col("bc.p1"))
      .join(e.as("ac"), col("ac.p1") === col("ab.p1") &&
        col("ac.p2") === col("bc.p2"))
      .select(col("ab.p1").as("x"), col("ab.p2").as("y"),
        col("bc.p2").as("z"))
}
