package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_grams(text, n)` — every length-`n` CHARACTER window of the input,
  * in order, duplicates kept: exactly
  * `transform(sequence(1, length(t) - n + 1), i -> substring(t, i, n))`
  * but as ONE whole-stage-codegen call per row (round-17 optimization;
  * the [[MinHashExprs]] lesson: composed higher-order functions are
  * interpreted per ELEMENT, and SQL `substring` on a UTF8String re-walks
  * the bytes from position 0 every call — O(len²) per document).
  *
  * Character semantics match SQL substring (codepoint windows, not byte
  * windows): one forward pass records each codepoint's byte offset, then
  * every gram is a zero-copy byte slice. Inputs shorter than `n` chars →
  * empty array.
  */
object CharGramsImpl {
  def grams(u: UTF8String, n: Int): ArrayData = {
    val bytes = u.getBytes
    val len = bytes.length
    // forward pass: byte offset of each codepoint start (+ end sentinel)
    val offs = new Array[Int](len + 1)
    var nChars = 0
    var i = 0
    while (i < len) {
      offs(nChars) = i
      val b = bytes(i) & 0xff
      i += (if (b < 0x80) 1 else if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4)
      nChars += 1
    }
    offs(nChars) = len
    if (nChars < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nChars - n + 1)
    var w = 0
    while (w <= nChars - n) {
      out(w) = UTF8String.fromBytes(bytes, offs(w), offs(w + n) - offs(w))
      w += 1
    }
    new GenericArrayData(out)
  }
}

case class CharGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram length must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_grams requires string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    CharGramsImpl.grams(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CharGramsImpl.grams($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
  override def prettyName: String = "char_grams"
}

object CharGramsExprs {
  import org.apache.spark.sql.graft.ColumnBridge
  def charGrams(c: Column, n: Int): Column =
    ColumnBridge.column(CharGrams(ColumnBridge.expression(c), n))
}
