package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality column profiler: one long-format row per column with null
  * count, distinct count, and type-appropriate min/max. The first pass any
  * 100 TB ingest runs — schema sanity before heavier curation.
  *
  * Shape: a SINGLE global aggregate computes every column's stats in one
  * scan (partial+final hash agg; no per-column jobs, no driver loops), then
  * the one-row result unpivots to long format with `stack`. Distinct counts
  * are exact (`count_distinct` plans Expand; for quick profiles at extreme
  * cardinality swap in `approx_count_distinct` — q39 covers that sketch).
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
    val aggs = cols.flatMap { case (c, kind) =>
      val numView = kind match {
        // parquet NTZ timestamps: cast to LTZ first (session TZ is pinned
        // UTC, so the cast is identity) — unix_micros rejects NTZ input
        case Ts => Some(unix_micros(col(c).cast("timestamp")).cast("double"))
        case Num => Some(col(c).cast("double"))
        case Str => None
      }
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
        count_distinct(col(c)).as(s"${c}__nd"),
        numView.map(v => round(min(v), 4)).getOrElse(lit(null).cast("double")).as(s"${c}__minn"),
        numView.map(v => round(max(v), 4)).getOrElse(lit(null).cast("double")).as(s"${c}__maxn"),
        (if (kind == Str) min(col(c)) else lit(null).cast("string")).as(s"${c}__mins"),
        (if (kind == Str) max(col(c)) else lit(null).cast("string")).as(s"${c}__maxs"))
    }
    val stackArgs = cols.map { case (c, _) =>
      s"'$c', ${c}__nn, ${c}__nd, ${c}__minn, ${c}__maxn, ${c}__mins, ${c}__maxs"
    }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_null, n_distinct, min_num, max_num, min_str, max_str)"))
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
