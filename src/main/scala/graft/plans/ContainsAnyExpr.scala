package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `contains_any(text, patterns)` — true iff any of the literal patterns is
  * a substring of the input. Exactly `rlike("p1|p2|...")` for patterns with
  * no regex metacharacters (the classifier lexicons assert that), but runs
  * as byte-level `UTF8String.contains` probes instead of the backtracking
  * `java.util.regex` engine — the classifier path (2 sentiment + 6 category
  * lexicons per answer column) is the hottest scan in the survey dataflow,
  * and at 100 TB the regex engine IS the job's CPU bill.
  *
  * Native codegen'd expression: the pattern array is a per-plan reference
  * object (zero per-row allocation); the probe loop runs over raw UTF-8
  * bytes without decoding.
  */
object ContainsAnyImpl {
  def containsAny(u: UTF8String, pats: Array[UTF8String]): Boolean = {
    var i = 0
    while (i < pats.length) {
      if (u.contains(pats(i))) return true
      i += 1
    }
    false
  }
}

case class ContainsAny(child: Expression, patterns: Seq[String]) extends UnaryExpression {
  require(patterns.nonEmpty, "contains_any needs at least one pattern")

  @transient private lazy val pats: Array[UTF8String] =
    patterns.map(UTF8String.fromString).toArray

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"contains_any requires string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    ContainsAnyImpl.containsAny(v.asInstanceOf[UTF8String], pats)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patsRef = ctx.addReferenceObj("pats", pats,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ContainsAnyImpl.containsAny($c, $patsRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): ContainsAny =
    copy(child = newChild)
  override def prettyName: String = "contains_any"
}

object ContainsAny {
  import org.apache.spark.sql.graft.ColumnBridge
  def containsAny(c: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(ContainsAny(ColumnBridge.expression(c), patterns))
}
