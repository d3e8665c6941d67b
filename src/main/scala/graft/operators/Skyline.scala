package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the rows not dominated by any other row
  * under (minimize one dimension, maximize the other) — dominated meaning
  * some row is at least as good on both axes and strictly better on one.
  *
  * The classic single-node answer is an O(n log n) sort-and-sweep; the
  * naive distributed answer is an n² dominance anti-join (a nested-loop
  * non-equi join — a non-starter at 100 TB). This operator re-expresses
  * the sweep as a distributed prefix-max:
  *
  *  1. collapse to LEVELS of the minimized axis (groupBy max of the
  *     maximized axis) — bounded by the distinct values of that axis;
  *  2. rank levels by the minimized axis ([[GlobalRank.withRowNumber]] —
  *     range exchange, no single-partition window);
  *  3. running max of the level maxima over that order
  *     ([[GlobalRank.withRunningMax]]);
  *  4. shift to the EXCLUSIVE prefix max via a rank self-join (rank →
  *     rank−1) — "best maximized value among strictly better minimized
  *     values";
  *  5. one broadcast hop back to the full rows: dominated iff the
  *     exclusive prefix max reaches its maximize value, or its own level
  *     holds a strictly larger one.
  *
  * Duplicate (min, max) pairs are all kept (neither strictly beats the
  * other) — the frontier is an antichain, not a distinct set. Rows flow
  * through one aggregate, one range exchange and one broadcast join; the
  * full dataset is never self-joined.
  */
object Skyline {

  /** Filters `df` to its 2-D Pareto frontier. `minimize` and `maximize`
    * must cast losslessly to long (use scaled integers for money). All
    * original columns pass through. */
  def frontier2d(df: DataFrame, minimize: Column, maximize: Column): DataFrame = {
    val in = df
      .withColumn("_sky_min", minimize.cast("long"))
      .withColumn("_sky_max", maximize.cast("long"))
    val levels = in.groupBy("_sky_min").agg(max("_sky_max").as("_lvl_max"))
    val ranked = GlobalRank.withRowNumber(levels, Seq(col("_sky_min").asc), "_rn")
    val incl = GlobalRank.withRunningMax(
      ranked, Seq(col("_rn").asc), col("_lvl_max"), "_incl")
    val excl = incl.as("cur").join(
        incl.select((col("_rn") + 1).as("_rn_next"), col("_incl").as("_excl"))
          .as("prev"),
        col("cur._rn") === col("_rn_next"), "left")
      .select(col("cur._sky_min").as("_lv"), col("cur._lvl_max").as("_lvl"),
        coalesce(col("_excl"), lit(Int.MinValue.toLong)).as("_excl"))
    in.join(broadcast(excl), col("_sky_min") === col("_lv"))
      .where(!(col("_excl") >= col("_sky_max") || col("_lvl") > col("_sky_max")))
      .drop("_sky_min", "_sky_max", "_lv", "_lvl", "_excl")
  }
}
