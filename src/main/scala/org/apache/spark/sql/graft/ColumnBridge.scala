package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst Expressions.
  *
  * Spark 4 made Column ↔ Expression conversion private[sql]
  * (ExpressionUtils in columnNodeSupport.scala); a library that registers
  * custom Catalyst expressions still needs it, hence this one-file shim in
  * the org.apache.spark.sql namespace. No Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Materialize a DataFrame from a (possibly hand-rewritten) logical plan —
    * the test hook for optimizer rules applied outside a session's
    * extension list. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wrap an RDD of InternalRows as a DataFrame WITHOUT the external-Row
    * round trip (round-17 optimization): `spark.createDataFrame(rdd,
    * schema)` re-encodes every field of every row through the Row →
    * Catalyst converters, and the matching `df.rdd` read side boxes every
    * field the other way. The two-pass GlobalRank operators live entirely
    * at the InternalRow grain; this exposes the private[sql]
    * internalCreateDataFrame they need to come back into SQL. */
  def internalCreateDataFrame(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Register an expression-backed SQL function into a LIVE session's
    * function registry (sessionState is private[sql], hence here). The
    * session-creation path is graft.plans.GraftExtensions via
    * SparkSessionExtensions.injectFunction. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
