package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles WITHOUT the per-group buffer.
  *
  * Spark's exact `percentile` is a `TypedImperativeAggregate`: it holds
  * every value of a group in one aggregation buffer. With few groups and
  * 100 TB of rows that buffer is billions of doubles on one task — the
  * same collapse as a global window, just hidden inside an aggregate
  * (q37 is fine at bench scale; this operator is the scale path).
  *
  * Rank-based dataflow instead — the distributed-sort shape:
  *
  *  1. global row number under the total order (group, value, tiebreak)
  *     via [[GlobalRank]] (range exchange + per-partition offsets; no
  *     single-partition stage);
  *  2. per-group counts (tiny) → per-group rank = global rank − offset of
  *     the group's first row;
  *  3. each requested percentile p maps to ranks ⌊1+p(n−1)⌋ and
  *     ⌈1+p(n−1)⌉ (SQL linear interpolation); the tiny (group, p, lo, hi,
  *     frac) table joins BROADCAST against the ranked rows — only the ≤
  *     2·|groups|·|ps| boundary rows survive the filter;
  *  4. one small aggregate interpolates v_lo + frac·(v_hi − v_lo).
  *
  * Rows stream through exactly one range exchange; no task ever holds a
  * group. Matches `percentile(v, array(ps))` / DuckDB `quantile_cont`
  * bit-for-bit (same linear-interpolation definition).
  */
object Percentiles {

  /** Returns one row per group: (groupCol, p_1, ..., p_k) with column
    * names from `outNames`. */
  def exactByGroup(df: DataFrame, group: Column, value: Column,
      ps: Seq[Double], outNames: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.size == outNames.size)
    val vals = df.select(group.as("_g"), value.cast("double").as("_v"))
      .where(col("_v").isNotNull)
    val ranked = GlobalRank.withRowNumber(vals,
      Seq(col("_g").asc, col("_v").asc), "_grn")

    // per-group size and starting offset in the global order (groups are
    // contiguous under the (group, value) sort)
    val counts = ranked.groupBy("_g")
      .agg(count(lit(1)).as("_n"), min("_grn").as("_first"))

    // target boundary ranks per (group, percentile) — tiny, broadcast.
    // The group column is re-aliased (_tg): targets derives from `ranked`,
    // so keeping the same name would make the join a detected ambiguous
    // self-reference.
    val targets = ps.zip(outNames).map { case (p, name) =>
      counts.select(col("_g").as("_tg"), lit(name).as("_p"),
        (col("_first") - 1 + floor(lit(1.0) + lit(p) * (col("_n") - 1))).as("_lo"),
        (col("_first") - 1 + ceil(lit(1.0) + lit(p) * (col("_n") - 1))).as("_hi"),
        (lit(1.0) + lit(p) * (col("_n") - 1)
          - floor(lit(1.0) + lit(p) * (col("_n") - 1))).as("_frac"))
    }.reduce(_ unionAll _)

    val boundary = ranked.join(broadcast(targets),
      col("_g") === col("_tg") &&
        (col("_grn") === col("_lo") || col("_grn") === col("_hi")))
      .select(col("_g").as("g"), col("_p"), col("_grn"),
        col("_lo"), col("_hi"), col("_frac"), col("_v"))

    val perP = boundary.groupBy("g", "_p").agg(
      (min(when(col("_grn") === col("_lo"), col("_v")))
        + max(col("_frac")) *
        (min(when(col("_grn") === col("_hi"), col("_v")))
          - min(when(col("_grn") === col("_lo"), col("_v"))))).as("_val"))

    perP.groupBy("g").pivot("_p", outNames).agg(first("_val"))
      .withColumnRenamed("g", "group")
  }

  /** Exact WEIGHTED per-group quantiles (inverted-CDF definition): the
    * smallest value v whose cumulative weight reaches ⌈p·W⌉, with LONG
    * weights so the target rank is integer-exact — "the value experienced
    * by a unit of weight drawn at random" (e.g. doc-length percentiles by
    * token mass, where a long tail doc counts by its tokens, not once).
    *
    * Same dataflow posture as [[exactByGroup]]: ONE range exchange under
    * the total order (group, value, weight) carrying a global weight
    * prefix sum ([[GlobalRank.withRunningSum]]); per-group offsets are a
    * groups-sized aggregate; each (group, p) target selects exactly the
    * row whose weight interval [cum−w, cum) contains the target, via a
    * broadcast join — no task ever holds a group.
    */
  def weightedByGroup(df: DataFrame, group: Column, value: Column,
      weight: Column, ps: Seq[Double], outNames: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.size == outNames.size)
    require(ps.forall(p => p > 0 && p <= 1), "weighted quantile needs 0 < p <= 1")
    val vals = df.select(group.as("_g"), value.cast("double").as("_v"),
        weight.cast("long").as("_w"))
      .where(col("_v").isNotNull && col("_w") > 0)
    val summed = GlobalRank.withRunningSum(vals,
      Seq(col("_g").asc, col("_v").asc, col("_w").asc), col("_w"), "_cw")
    val counts = summed.groupBy("_g")
      .agg(min(col("_cw") - col("_w")).as("_off"),
        (max(col("_cw")) - min(col("_cw") - col("_w"))).as("_W"))
    val targets = ps.zip(outNames).map { case (p, name) =>
      counts.select(col("_g").as("_tg"), lit(name).as("_p"),
        (col("_off") + ceil(lit(p) * col("_W")).cast("long")).as("_t"))
    }.reduce(_ unionAll _)
    val hits = summed.join(broadcast(targets),
      col("_g") === col("_tg") &&
        col("_cw") >= col("_t") && (col("_cw") - col("_w")) < col("_t"))
      .select(col("_g").as("g"), col("_p"), col("_v"))
    hits.groupBy("g").pivot("_p", outNames).agg(first("_v"))
      .withColumnRenamed("g", "group")
  }
}
