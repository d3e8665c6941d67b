package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE-ish token count — the match count of the regex
  * `[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]` (letter runs, single digits, single
  * other marks; the engine's cheap proxy for subword token cost) as one
  * native byte scan. Per the regex semantics on the decoded string:
  * a maximal ASCII-letter run counts 1, each ASCII digit counts 1, ASCII
  * whitespace counts 0 (`\s` is ASCII-only in the default Java dialect),
  * every other CODEPOINT counts 1 — byte-level that is +1 per non-ASCII
  * lead byte, skipping continuation bytes. Token counting runs on every
  * document the profiler touches; this removes its last regex traversal.
  */
object BpeCountImpl {
  def count(u: UTF8String): Int = {
    val bytes = u.getBytes
    val n = bytes.length
    var cnt = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
        cnt += 1
        i += 1
        while (i < n && {
          val c = bytes(i); (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
        }) i += 1
      } else if (b >= 0) { // other ASCII
        if (!(b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D))
          cnt += 1 // digit or mark, one each
        i += 1
      } else { // multi-byte UTF-8: one count per lead byte
        if ((b & 0xC0) != 0x80) cnt += 1
        i += 1
      }
    }
    cnt
  }
}

case class BpeCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_count requires string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    BpeCountImpl.count(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.BpeCountImpl.count($c);")
  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
  override def prettyName: String = "bpe_count"
}

object BpeCount {
  import org.apache.spark.sql.graft.ColumnBridge
  def bpeCount(c: Column): Column =
    ColumnBridge.column(BpeCount(ColumnBridge.expression(c)))
}
