package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences,
  Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.ColumnBridge

/** Whole-operator Catalyst extension: a broadcast POINT-IN-INTERVAL join.
  *
  * `left` (big, streamed) joins `right` (small, broadcast) on
  * `lo <= point <= hi` with NO equality key. Spark's planner has no join
  * operator for a pure range predicate — it falls back to
  * BroadcastNestedLoopJoin, which evaluates the predicate against every
  * (row, interval) pair: O(|left|·|right|). This operator sorts the
  * broadcast intervals by `lo` once and probes each left row by binary
  * search, bounded by the widest interval span:
  * O(|left|·(log |right| + hits)) — the standard banded range-join plan
  * (cf. Databricks' range-join optimization, DuckDB's IEJoin).
  *
  * The full custom-operator ladder (SURVEY.md §2.3(c)): logical node
  * ([[RangeJoinPlan]]) → strategy ([[RangeJoinStrategy]], installable via
  * `spark.experimental.extraStrategies` or an extensions hook) → physical
  * operator ([[BroadcastRangeJoinExec]]). Bounds are cast to double at the
  * API boundary ([[RangeJoinOps.rangeJoin]]) — for timestamps pass
  * `unix_micros(ts)`.
  *
  * Scale shape: the interval side must fit on the driver/broadcast (true
  * for band tables, calendars, rate cards — the canonical uses); the big
  * side never shuffles at all. Skew-free by construction: every task
  * probes the same broadcast index.
  */
case class RangeJoinPlan(left: LogicalPlan, right: LogicalPlan,
    point: Expression, lo: Expression, hi: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[RangeJoinPlan]] as [[BroadcastRangeJoinExec]]. */
object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinPlan(l, r, p, lo, hi) =>
      BroadcastRangeJoinExec(planLater(l), planLater(r), p, lo, hi) :: Nil
    case _ => Nil
  }
}

case class BroadcastRangeJoinExec(left: SparkPlan, right: SparkPlan,
    point: Expression, lo: Expression, hi: Expression) extends BinaryExecNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    // Build side: collect + sort by lo (same driver-collect shape Spark's
    // own broadcast joins use for the small side).
    val loB = BindReferences.bindReference(lo, right.output)
    val hiB = BindReferences.bindReference(hi, right.output)
    val intervals = right.executeCollect().flatMap { r =>
      (loB.eval(r), hiB.eval(r)) match {
        case (l: java.lang.Double, h: java.lang.Double) if l <= h =>
          Some((l.doubleValue, h.doubleValue, r))
        case _ => None // null or inverted interval joins nothing
      }
    }.sortBy(_._1)
    val los = intervals.map(_._1)
    val his = intervals.map(_._2)
    val rows = intervals.map(_._3)
    val maxSpan = if (intervals.isEmpty) 0.0 else intervals.map(t => t._2 - t._1).max
    val bc = sparkContext.broadcast((los, his, rows, maxSpan))
    val leftOut = left.output
    val allOut = output
    val pointExpr = point
    left.execute().mapPartitions { iter =>
      val (blos, bhis, brows, span) = bc.value
      val pB = BindReferences.bindReference(pointExpr, leftOut)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(allOut, allOut)
      iter.flatMap { lrow =>
        val pv = pB.eval(lrow)
        if (pv == null || blos.length == 0) Iterator.empty
        else {
          val p = pv.asInstanceOf[Double]
          // candidates have lo in [p - maxSpan, p]: binary-search the left
          // edge, scan forward while lo <= p, test hi
          var i = lowerBound(blos, p - span)
          val out = Seq.newBuilder[InternalRow]
          while (i < blos.length && blos(i) <= p) {
            if (bhis(i) >= p) out += proj(joined(lrow, brows(i))).copy()
            i += 1
          }
          out.result().iterator
        }
      }
    }
  }

  /** smallest index with arr(i) >= target (arr.length if none) */
  private def lowerBound(arr: Array[Double], target: Double): Int = {
    var lo = 0; var hi = arr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) >= target) hi = mid else lo = mid + 1
    }
    lo
  }
}

/** Public API + strategy installation. */
object RangeJoinOps {

  /** Install the strategy into a live session (idempotent). Sessions built
    * with [[GraftExtensions]] get it via the extensions hook instead. */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(RangeJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RangeJoinStrategy
  }

  /** Inner point-in-interval join: one output row per (left row, containing
    * interval). `point` comes from `left`; `lo`/`hi` from `right`; all three
    * are cast to double. `right` must be broadcast-small.
    *
    * The bound expressions are materialized as hidden projected columns on
    * each side first — that routes them through the analyzer (Spark 4's
    * Column nodes resolve lazily), so the custom node only ever carries
    * resolved AttributeReferences. */
  def rangeJoin(left: DataFrame, right: DataFrame,
      point: Column, lo: Column, hi: Column): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val l2 = left.withColumn("__rj_point", point.cast("double"))
    val r2 = right.withColumn("__rj_lo", lo.cast("double"))
      .withColumn("__rj_hi", hi.cast("double"))
    def attr(df: DataFrame, name: String): Attribute =
      df.queryExecution.analyzed.output.find(_.name == name).get
    ColumnBridge.ofRows(spark, RangeJoinPlan(
        l2.queryExecution.analyzed, r2.queryExecution.analyzed,
        attr(l2, "__rj_point"), attr(r2, "__rj_lo"), attr(r2, "__rj_hi")))
      .drop("__rj_point", "__rj_lo", "__rj_hi")
  }
}
