package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact deterministic per-group mode WITHOUT the per-group buffer.
  *
  * Spark's built-in `mode(v, deterministic)` is a `TypedImperativeAggregate`:
  * it holds a value→count map for the whole group in one task's aggregation
  * buffer. With few groups (q76 groups lineitem by `l_returnflag` — 3 groups)
  * a 100 TB table puts ~⅓ of its distinct values in a single buffer.
  *
  * The scale shape is ordinary hash aggregations plus one tiny join:
  *
  *  1. `groupBy(group, value).count()` — state is one counter per DISTINCT
  *     (group, value) pair, partial-aggregated map-side and spread across
  *     the shuffle by the pair key, never concentrated per group;
  *  2. `groupBy(group).max(count)` — a |groups|-row relation;
  *  3. join (2) back onto (1), keep the max-count rows, and tie-break with
  *     `min(value)` — matching `mode(v, true)` and the SQL
  *     `row_number() OVER (ORDER BY c DESC, v ASC) = 1` twin bit-for-bit.
  *
  * Every aggregate is a declarative `HashAggregate` (PlanSpec-asserted for
  * q76). An argmin via `min_by(v, struct(-c, v))` was considered and
  * rejected: struct-typed aggregation buffers are immutable in UnsafeRow,
  * so Spark plans it as a SortAggregate. The duplicated `counts` subtree in
  * steps 1–3 is collapsed by Catalyst's exchange reuse (one scan + one
  * shuffle, the second occurrence reads the same exchange — asserted on
  * the FINAL adaptive plan in PlanSpec, since AQE only materializes the
  * reuse at execution). A Misra-Gries
  * candidate pass (see [[HeavyHitters]]) was also considered and rejected:
  * MG only guarantees the mode survives when its frequency exceeds
  * N/(capacity+1), which the mode of a long-tailed column need not satisfy.
  */
object ExactMode {

  /** Returns one row per group: (`group`, `out`). Nulls in `value` are
    * ignored (matching the built-in aggregate). */
  def byGroup(df: DataFrame, group: Column, value: Column,
      out: String = "mode"): DataFrame = {
    val counts = df.select(group.as("_g"), value.as("_v"))
      .where(col("_v").isNotNull)
      .groupBy("_g", "_v")
      .agg(count(lit(1)).as("_c"))
    val top = counts.groupBy("_g").agg(max(col("_c")).as("_cmax"))
    counts.join(broadcast(top), "_g")
      .where(col("_c") === col("_cmax"))
      .groupBy("_g")
      .agg(min(col("_v")).as(out))
      .withColumnRenamed("_g", "group")
  }
}
