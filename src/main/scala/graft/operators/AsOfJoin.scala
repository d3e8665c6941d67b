package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generalized as-of join (the time-series "most recent match" join the
  * reference's gap map calls for — SURVEY.md §2.3), composed WITHOUT a
  * self-join: both sides are tagged and unioned, one window pass per key
  * carries the latest (or next) right-side payload onto each left row.
  *
  * Scale shape: exactly one shuffle (the window partitioning on the key),
  * no join explosion on hot keys, state bounded by the window frame. The
  * q15 oracle checks the same composition on events; this operator
  * generalizes it to arbitrary payloads, direction, and tolerance.
  */
object AsOfJoin {

  /** For each left row: attach the latest right-side payload with
    * `right.ts <= left.ts` (backward; inclusive), same `by` key. Right
    * payload columns come back as nullable `_asof_<col>`; no match → null.
    *
    * @param tolerance max age (left.ts - right.ts) as a Column interval/
    *                  duration in the ts column's units; None = unbounded.
    */
  def backward(left: DataFrame, right: DataFrame, by: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    asof(left, right, by, leftTs, rightTs, payload, tolerance, forward = false)

  /** Mirror image: earliest right payload with `right.ts >= left.ts`. */
  def forward(left: DataFrame, right: DataFrame, by: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tolerance: Option[Column] = None): DataFrame =
    asof(left, right, by, leftTs, rightTs, payload, tolerance, forward = true)

  private def asof(left: DataFrame, right: DataFrame, by: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      tolerance: Option[Column], forward: Boolean): DataFrame = {
    require(by.nonEmpty, "as-of join needs at least one equality key")
    // right rows reduced to (key, ts, payload-struct); the payload keeps the
    // right ts so the tolerance test can run after the window pass
    val rv = struct((col("_asof_ts") +: payload.map(col)): _*)
    val rightTagged = right
      .select((by.map(col) :+ col(rightTs).as("_asof_ts") :+ lit(1).as("_side")) ++ payload.map(col): _*)
      .withColumn("_rv", rv)
      .select((by.map(col) :+ col("_asof_ts").as("_ts") :+ col("_side") :+ col("_rv")): _*)
    val leftTagged = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(0))
      .withColumn("_rv", lit(null).cast(rightTagged.schema("_rv").dataType))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)

    // Inclusive semantics need the right row to enter the frame before the
    // left row at an equal timestamp: backward sorts right (side=1) first
    // via _side desc; forward sorts it first in the reversed scan the same
    // way, so the ordering flips to (ts desc, side desc).
    val ord =
      if (forward) Seq(col("_ts").desc, col("_side").desc)
      else Seq(col("_ts").asc, col("_side").desc)
    val w = Window.partitionBy(by.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_match", last(when(col("_side") === 1, col("_rv")), ignoreNulls = true).over(w))
      .where(col("_side") === 0)

    val withinTol = tolerance match {
      case None => matched
      case Some(tol) =>
        val age =
          if (forward) col("_match").getField("_asof_ts").cast("long") - col("_ts").cast("long")
          else col("_ts").cast("long") - col("_match").getField("_asof_ts").cast("long")
        matched.withColumn("_match", when(age <= tol, col("_match")))
    }
    val out = payload.foldLeft(withinTol) { (d, c) =>
      d.withColumn(s"_asof_$c", col("_match").getField(c))
    }.withColumn("_asof_ts", col("_match").getField("_asof_ts"))
    out.drop("_ts", "_side", "_rv", "_match")
  }
}
