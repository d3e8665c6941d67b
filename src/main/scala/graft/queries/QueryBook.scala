package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One per-family query book: named DataFrame builders plus their DuckDB
  * oracle twins, concatenated by [[graft.SparkEntry]] into the driver's
  * verification contract. ListMap keeps suite order stable for Bench. */
private[graft] trait QueryBook {
  def queries: ListMap[String, (SparkSession, String) => DataFrame]
  def oracleSql: ListMap[String, String]
}
