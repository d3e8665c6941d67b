package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank as pure declarative dataflow — the fixed-point graph
  * primitive behind TextRank keyword ranking (Mihalcea & Tarau 2004),
  * CommonCrawl-style domain authority weighting, and citation scoring.
  *
  * Scale shape (the part that survives 100 TB):
  *  - The rank update is `join(edges, ranks on u) → groupBy(v) → sum` — a
  *    shuffle on the edge key per iteration, which IS PageRank's inherent
  *    cost; nothing is collected to the driver and no window appears.
  *  - Iterations are UNROLLED into one plan over the SAME `edges` /
  *    `outw` DataFrame objects, so every iteration's scan lands on an
  *    identical exchange subtree and Spark's ReuseExchangeAndSubquery
  *    rewires them to ONE shuffle materialization (asserted in PlanSpec)
  *    — the edge list is built once and re-read from shuffle files, the
  *    lineage-safe alternative to `persist()` leaking executor memory
  *    across queries.
  *  - Per-node out-weight is pre-aggregated once and joined in, so the
  *    normalized contribution `w/outw · pr(u)` is a projection, not a
  *    correlated lookup.
  *  - A symmetric graph (TextRank's case — see [[textRank]]) has no
  *    dangling nodes, so the damping constant absorbs all teleport mass
  *    and no dangling-mass driver collect is needed.
  */
object PageRank {

  /** Iterated ranks over a weighted edge list `(u, v, w)`. Every node with
    * at least one outgoing edge is ranked; pr₀ = 1 and
    * pr(v) = (1−d) + d·Σ_{u→v} w(u,v)/outw(u) · pr(u), the undamped-sum
    * form TextRank uses (ranks sum to |V|, not 1 — rescaling is a
    * projection if needed).
    *
    * With `materialize` (the default) the normalized contribution table
    * `(u, v, w/outw)` is built ONCE and eagerly `localCheckpoint`ed — the
    * per-round lineage-truncation posture star-contraction CC already
    * uses — so the `iters` unrolled rounds read shuffle-ready blocks
    * instead of re-deriving the corpus-sized edge stream. (Pure lazy
    * unrolling cannot deliver this: Catalyst prunes different column
    * sets into each iteration's reference, the canonical subtrees
    * diverge, and ReuseExchange stops applying — measured as 32 source
    * scans in q130's final plan before this.) Pass `materialize = false`
    * when the edge list is already a local relation (q134's
    * enum-bounded graph). */
  def ranks(edges: DataFrame, iters: Int = 5, damping: Double = 0.85,
      materialize: Boolean = true): DataFrame = {
    val ed = edges.select(col("u"), col("v"), col("w"))
    val outw = ed.groupBy("u").agg(sum("w").as("outw"))
    val edn0 = ed.join(outw, "u")
      .select(col("u"), col("v"), (col("w") / col("outw")).as("_frac"))
    val edn = if (materialize) edn0.localCheckpoint() else edn0
    val vocab = edn.select(col("u").as("tok")).distinct()
    var pr = vocab.select(col("tok"), lit(1.0).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = edn
        .join(pr.withColumnRenamed("tok", "u"), "u")
        .groupBy(col("v").as("tok"))
        .agg(sum(col("_frac") * col("pr")).as("_acc"))
      pr = vocab.join(contrib, Seq("tok"), "left")
        .select(col("tok"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("_acc"), lit(0.0))).as("pr"))
    }
    pr
  }

  /** Symmetric adjacent-token co-occurrence edges from a token-array
    * column `ts`: one edge per adjacent slot (both directions), weight =
    * corpus-wide count. The token stream is CANONICALIZED to unordered
    * (least, greatest) pairs before the hash-agg, so the corpus-sized
    * aggregation input is half of the mirror-then-aggregate form; the
    * symmetric mirror happens on the aggregated vocab²-bounded table.
    * One pass, no shuffle until the pair hash-agg (map-side combined);
    * self-loops and empty tokens dropped. */
  def adjacencyEdges(toks: DataFrame): DataFrame = {
    val adj = toks
      .where(size(col("ts")) >= 2)
      // native adjacent_pairs (round 17): the transform HOF ran
      // interpreted per slot
      .select(explode(graft.plans.WordGramsExprs.adjacentPairs(col("ts"))).as("e"))
      .select(least(col("e.u"), col("e.v")).as("u"), greatest(col("e.u"), col("e.v")).as("v"))
      .where(col("u") =!= "" && col("v") =!= "" && col("u") =!= col("v"))
    val canon = adj.groupBy("u", "v").agg(count(lit(1)).as("w"))
    canon.union(canon.select(col("v").as("u"), col("u").as("v"), col("w")))
  }
}
