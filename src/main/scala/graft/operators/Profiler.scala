package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality column profiler: one long-format row per column with null
  * count, distinct count, and type-appropriate min/max. The first pass any
  * 100 TB ingest runs — schema sanity before heavier curation.
  *
  * Shape: one two-level aggregate per column, UNION ALL'd into a single
  * plan. Level 1 groups by the column value — so the distinct count is a
  * plain `count(*)` over groups and min/max reduce over GROUP KEYS, not raw
  * rows; level 2 folds the groups to one stats row. Compared with the
  * one-scan multi-`count_distinct` form this avoids Catalyst's Expand
  * (which replicates every row once per distinct aggregate — a
  * (1+|cols|)× row blowup carrying the widest string columns through the
  * shuffle); each union branch instead scans exactly one column
  * (column-pruned parquet) and shuffles pre-aggregated groups. Branches
  * are independent stages and run concurrently. Distinct counts are exact
  * (for quick profiles at extreme cardinality swap in
  * `approx_count_distinct` — q39 covers that sketch).
  *
  * The DuckDB twin is GENERATED from the same column specs
  * ([[Profiler.oracleSql]]) so engine and oracle cannot drift.
  */
object Profiler {

  sealed trait Kind
  case object Num extends Kind // numeric: min/max as 4-dp doubles
  case object Ts extends Kind  // timestamp: min/max as epoch-micros doubles
  case object Str extends Kind // string: lexicographic min/max

  def profile(df: DataFrame, cols: Seq[(String, Kind)]): DataFrame = {
    require(cols.nonEmpty)
    val branches = cols.map { case (c, kind) =>
      val key = col(c)
      val numView = kind match {
        // parquet NTZ timestamps: cast to LTZ first (session TZ is pinned
        // UTC, so the cast is identity) — unix_micros rejects NTZ input
        case Ts => Some(unix_micros(key.cast("timestamp")).cast("double"))
        case Num => Some(key.cast("double"))
        case Str => None
      }
      df.groupBy(key.as("_k")).agg(count(lit(1)).as("_cnt"))
        .agg(
          coalesce(sum(when(col("_k").isNull, col("_cnt"))), lit(0L)).as("n_null"),
          count(when(col("_k").isNotNull, lit(1))).as("n_distinct"),
          numView.map(_ => round(min(kindView(kind, col("_k"))), 4))
            .getOrElse(lit(null).cast("double")).as("min_num"),
          numView.map(_ => round(max(kindView(kind, col("_k"))), 4))
            .getOrElse(lit(null).cast("double")).as("max_num"),
          (if (kind == Str) min(col("_k")) else lit(null).cast("string")).as("min_str"),
          (if (kind == Str) max(col("_k")) else lit(null).cast("string")).as("max_str"))
        .select(lit(c).as("column_name"), col("n_null"), col("n_distinct"),
          col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    }
    branches.reduce(_ union _)
  }

  /** numeric view of a group key under the column's kind */
  private def kindView(kind: Kind, c: Column) = kind match {
    case Ts => unix_micros(c.cast("timestamp")).cast("double")
    case _ => c.cast("double")
  }

  /** DuckDB twin: one SELECT per column, UNION ALL'd. */
  def oracleSql(table: String, cols: Seq[(String, Kind)]): String =
    cols.map { case (c, kind) =>
      val (minN, maxN) = kind match {
        case Num => (s"round(min(CAST($c AS DOUBLE)), 4)", s"round(max(CAST($c AS DOUBLE)), 4)")
        case Ts => (s"round(min(CAST(epoch_us($c::TIMESTAMP) AS DOUBLE)), 4)",
          s"round(max(CAST(epoch_us($c::TIMESTAMP) AS DOUBLE)), 4)")
        case Str => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
      }
      val (minS, maxS) =
        if (kind == Str) (s"min($c)", s"max($c)")
        else ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      s"""SELECT '$c' AS column_name,
         | CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         | count(DISTINCT $c) AS n_distinct,
         | $minN AS min_num, $maxN AS max_num,
         | $minS AS min_str, $maxS AS max_str
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")
}
