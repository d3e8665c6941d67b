package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact frequent-items ("heavy hitters") at scale: the two-pass
  * Misra-Gries dataflow.
  *
  * The naive `groupBy(item).count()` shuffles one group per DISTINCT item —
  * at 100 TB of tokens/URLs/entities that is a shuffle keyed on an unbounded
  * domain, most of which is irrelevant long tail. Instead:
  *
  *  - **Pass 1 (candidates):** a bounded Misra-Gries summary per partition,
  *    merged by a custom typed `Aggregator` into ONE global summary row.
  *    MG summaries are mergeable (Agarwal et al., "Mergeability of
  *    Summaries"): add counts, then subtract the (capacity+1)-th largest
  *    count and drop non-positives. With capacity ≥ k, every item whose true
  *    frequency exceeds N/k is GUARANTEED to survive — the summary is a
  *    candidate superset, only its counts are approximate.
  *  - **Pass 2 (exact):** filter the stream to the ≤capacity candidates
  *    (a broadcast membership test — no shuffle of the long tail), one
  *    small groupBy for exact counts, keep `count · k > N`.
  *
  * The result — items with frequency > N/k and their EXACT counts — is
  * deterministic regardless of partitioning or merge order, hence
  * DuckDB-oracle-checkable against the naive GROUP BY + HAVING.
  */
class MisraGriesAgg(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity >= 1)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] = {
    val cur = b.getOrElse(item, 0L)
    if (cur > 0L || b.size < capacity) b.updated(item, cur + 1L)
    else {
      // decrement-all step: every counter pays one; zeros drop out
      b.flatMap { case (k, v) => if (v > 1L) Some(k -> (v - 1L)) else None }
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    if (sum.size <= capacity) sum
    else {
      val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
      sum.flatMap { case (k, v) => if (v > cut) Some(k -> (v - cut)) else None }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b
  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}

object HeavyHitters {

  /** Candidate superset via one MG-summary aggregation (≤ capacity items). */
  def candidates(items: DataFrame, item: Column, capacity: Int): Seq[String] = {
    val fn = udaf(new MisraGriesAgg(capacity), ExpressionEncoder[String]())
    items.select(fn(item.cast("string")).as("mg"))
      .head().getMap[String, Long](0).keys.toSeq
  }

  /** Exactly the items with frequency > N/k, with exact counts.
    * `capacity` trades summary size for tail-pressure headroom; ≥ k
    * preserves the guarantee, 2k is comfortable.
    *
    * Cache posture: the item stream is deliberately RECOMPUTED per pass,
    * not cached — it is one cheap pruned projection of the source, and at
    * 100 TB caching it (even DISK_ONLY) writes the whole corpus to local
    * disk for exactly two extra scans. Recomputation also leaves no
    * persisted footprint behind the operator. (Candidate supersets may
    * differ between recomputations under different partitionings; any
    * superset yields the same exact final answer.) */
  def topFrequent(df: DataFrame, item: Column, k: Int,
      capacityFactor: Int = 2): DataFrame = {
    val items = df.select(item.cast("string").as("item"))
    val n = items.count()
    val cand = candidates(items, col("item"), capacityFactor * k)
    items.where(col("item").isin(cand: _*))
      .groupBy("item")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * k > n)
  }

  /** Per-group frequent items: one MG summary PER GROUP KEY (the typed
    * Aggregator rides an ordinary groupBy — partial summaries merge
    * map-side), then the same broadcast-candidates exact pass. Returns
    * (group, item, cnt) for items with frequency > n_group/k. The candidate
    * union across groups is ≤ |groups|·capacity — still sketch-sized. */
  def topFrequentByGroup(df: DataFrame, group: Column, item: Column, k: Int,
      capacityFactor: Int = 2): DataFrame = {
    // same recompute posture as topFrequent: the projection is cheaper
    // than persisting the full item stream at scale
    val items = df.select(group.cast("string").as("grp"),
      item.cast("string").as("item"))
    val fn = udaf(new MisraGriesAgg(capacityFactor * k), ExpressionEncoder[String]())
    val cand = items.groupBy("grp").agg(fn(col("item")).as("mg"))
      .select(col("grp"), explode(map_keys(col("mg"))).as("item"))
    val sizes = items.groupBy("grp").agg(count(lit(1)).as("_n"))
    items.join(broadcast(cand), Seq("grp", "item"))
      .groupBy("grp", "item")
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(sizes), "grp")
      .where(col("cnt") * k > col("_n"))
      .select(col("grp"), col("item"), col("cnt"))
  }
}
