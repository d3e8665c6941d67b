package graft.plans

import java.text.Normalizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * Text corpora arrive with mixed composed/decomposed forms ("café" as
  * 5 codepoints with a combining acute vs 4 composed ones); exact dedup,
  * shingle hashing, and token statistics all diverge on byte-different
  * but canonically-equal strings, so normalization is the first scan of
  * any text-curation dataflow. Spark has no built-in for it (the usual
  * recourse is a Scala UDF — boxed, opaque to codegen); this is the
  * `Expression` form: one static call per row inside whole-stage codegen.
  *
  * The fast path matters at scale: `Normalizer.isNormalized` is a cheap
  * scan (quick-check properties), and real corpora are overwhelmingly
  * already NFC — the expression then returns the input UTF8String with
  * zero allocation.
  */
object NfcNormalizeImpl {
  def nfc(u: UTF8String): UTF8String = {
    val s = u.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) u
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}

case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    NfcNormalizeImpl.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NfcNormalizeImpl.nfc($c);")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  import org.apache.spark.sql.graft.ColumnBridge
  def nfc(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
