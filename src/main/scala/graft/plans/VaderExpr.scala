package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Vader

/** `vader_compound(text)` as a native codegen'd expression.
  *
  * The lexicon rides the expression as a plan REFERENCE OBJECT
  * (`ctx.addReferenceObj`): serialized once per plan to each executor —
  * the same distribution cost as a broadcast dimension table — and the
  * generated code calls the static scorer with it, so scoring stays inside
  * whole-stage codegen with zero per-row allocation beyond tokenization.
  */
case class VaderCompound(child: Expression, lexicon: Vader.Lexicon)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vader_compound requires string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    Vader.compound(v.asInstanceOf[UTF8String].toString, lexicon)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lexRef = ctx.addReferenceObj("vaderLexicon", lexicon,
      classOf[Vader.Lexicon].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Vader.compound($c.toString(), $lexRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): VaderCompound =
    copy(child = newChild)
  override def prettyName: String = "vader_compound"
}

object VaderCompound {
  import org.apache.spark.sql.graft.ColumnBridge
  def compound(c: Column, lex: Vader.Lexicon): Column =
    ColumnBridge.column(VaderCompound(ColumnBridge.expression(c), lex))
}
