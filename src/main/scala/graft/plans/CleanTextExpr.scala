package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's `clean_text` (survey_analysis.py:76-81) as ONE native
  * byte-level scan: strip → remove astral codepoints (emoji) → collapse
  * `\s+` to a single space → strip. Replaces two `regexp_replace` passes
  * (each a full regex-engine traversal plus an intermediate string) on the
  * single most-executed expression in the engine — every text operator
  * cleans first.
  *
  * Byte-level correctness on UTF-8: the Java-regex `\s` class is exactly
  * {space, \t, \n, \x0B, \f, \r} — all single-byte ASCII; astral codepoints
  * are exactly the 4-byte sequences (lead byte ≥ 0xF0); every other
  * multi-byte sequence passes through untouched. So the scan never needs to
  * decode.
  *
  * Fast path: an already-clean string (no astral lead byte, no whitespace
  * byte other than interior single spaces) is returned as-is — zero
  * allocation, which is the common case on a pre-cleaned 100 TB corpus.
  */
object CleanTextImpl {

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D

  @inline private def isAstralLead(b: Byte): Boolean = (b & 0xFF) >= 0xF0

  def clean(u: UTF8String): UTF8String = {
    val bytes = u.getBytes
    val n = bytes.length
    // fast path: scan for anything that would change the string
    var i = 0
    var dirty = n > 0 && (bytes(0) == 0x20 || bytes(n - 1) == 0x20)
    while (!dirty && i < n) {
      val b = bytes(i)
      if (isAstralLead(b)) dirty = true
      else if (isWs(b) && (b != 0x20 || (i + 1 < n && isWs(bytes(i + 1))))) dirty = true
      else i += 1
    }
    if (!dirty) return u
    val out = new Array[Byte](n)
    var o = 0
    var pendingSpace = false
    i = 0
    while (i < n) {
      val b = bytes(i)
      if (isAstralLead(b)) {
        i += 4 // astral codepoint: skip the whole 4-byte sequence
      } else if (isWs(b)) {
        pendingSpace = true
        i += 1
      } else {
        if (pendingSpace && o > 0) { out(o) = 0x20; o += 1 }
        pendingSpace = false
        out(o) = b; o += 1
        i += 1
      }
    }
    UTF8String.fromBytes(out, 0, o)
  }
}

case class CleanText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"clean_text requires string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    CleanTextImpl.clean(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CleanTextImpl.clean($c);")
  override protected def withNewChildInternal(newChild: Expression): CleanText =
    copy(child = newChild)
  override def prettyName: String = "clean_text"
}

object CleanText {
  import org.apache.spark.sql.graft.ColumnBridge
  def clean(c: Column): Column =
    ColumnBridge.column(CleanText(ColumnBridge.expression(c)))
}
