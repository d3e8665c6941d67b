package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract: one `queries` entry per implemented operator
  * (SURVEY.md §2 + §2.3 gap map + training-data extensions), each with a
  * DuckDB `oracleSql` twin where SQL-expressible.
  *
  * The query book itself lives in per-family files under [[graft.queries]]
  * (relational / survey / text / dedup / ANN / retrieval / graph / curation /
  * events / stats), each exposing the same `queries` + `oracleSql` pair this
  * object concatenates; shared twin-SQL generators and engine-neutral
  * constants are in [[graft.queries.QueryHelpers]].
  *
  * Oracle-parity conventions (the driver hash-compares after sorting columns
  * by name):
  *  - every computed column is aliased identically on both sides;
  *  - aggregated doubles are `round`ed (sum → 2dp, avg/ratio → 4dp,
  *    similarity → 6dp) so partial-aggregation order can't flip a bit;
  *  - integer-ish aggregates are pinned to BIGINT on both sides (DuckDB
  *    `sum(int)` returns HUGEINT, Spark returns long);
  *  - classifier/lexicon SQL is *generated from the same Scala constants*
  *    as the Spark expressions, so the two sides can't drift.
  */
object SparkEntry {

  /** Flagship: the reference's summary dataflow (clean → classify → group →
    * pivot) over the documents corpus. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q22_summary_pivot")(spark, "/root/testdata/sf0.001")

  private def books = Seq(
    RelationalQueries, SurveyQueries, TextQueries, DedupQueries, AnnQueries,
    RetrievalQueries, GraphQueries, CurationQueries, EventsQueries,
    StatsQueries, MultimodalQueries)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    books.map(_.queries).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    books.map(_.oracleSql).reduce(_ ++ _)

  // Engine-neutral constants re-exported for the specs that pin them.
  private[graft] def refCachePath = QueryHelpers.refCachePath
  private[graft] def benfordShares = QueryHelpers.benfordShares
  private[graft] def ewmaWeights = QueryHelpers.ewmaWeights
  private[graft] def sprtL1 = QueryHelpers.sprtL1
  private[graft] def sprtL2 = QueryHelpers.sprtL2
  private[graft] def sprtBound = QueryHelpers.sprtBound
  private[graft] def blockPerms = QueryHelpers.blockPerms
  private[graft] def blockGeometries = QueryHelpers.blockGeometries
  private[graft] def dowLabels = QueryHelpers.dowLabels
}
