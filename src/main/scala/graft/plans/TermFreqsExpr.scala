package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `term_freq_pairs(cleanedText)` — the sparse-retrieval tokenize kernel
  * (round-17 optimization): one call per row turns single-space-separated
  * cleaned text into the SORTED distinct (token, tf, dl, first) pairs that
  * BM25 scoring and the [[graft.operators.LexIndex]] postings layout
  * consume.
  *
  * Why native and not composed HOFs (the [[MinHashExprs]] lesson, guide
  * §"eliminate non-codegen expressions in the hot path"): the equivalent
  * `transform(filter(sequence(...)), …)` run-length tree is interpreted
  * per element with nested lambdas, and the previous
  * `explode → groupBy(doc_id, token)` paid a corpus exchange just to
  * count within rows. This expression participates in whole-stage codegen
  * as one static call per row: split on the single 0x20 separators
  * cleanText guarantees (multi-byte UTF-8 never contains 0x20, so byte
  * spans are codepoint-safe), binary-sort the token spans, run-length
  * count — O(n log n) per document, zero exchanges, no boxing beyond the
  * result rows.
  *
  * Per-element fields: `token` (sorted ascending, binary order), `tf`
  * (occurrences in this document), `dl` (total token count of the
  * document — the same value on every element, so doc-grain facts never
  * need a second tokenize), `first` (true on exactly the first element:
  * doc-grain facts are a filter, never an exchange). Empty/blank text →
  * empty array.
  */
object TermFreqsImpl {
  def pairs(u: UTF8String): ArrayData = {
    val bytes = u.getBytes
    val n = bytes.length
    // collect token spans (skip empty spans for robustness even though
    // cleaned text never produces them)
    var nToks = 0
    var i = 0
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      if (i < n) { nToks += 1; while (i < n && bytes(i) != ' ') i += 1 }
    }
    if (nToks == 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](nToks)
    var t = 0; i = 0
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      if (i < n) {
        val st = i
        while (i < n && bytes(i) != ' ') i += 1
        toks(t) = UTF8String.fromBytes(bytes, st, i - st)
        t += 1
      }
    }
    java.util.Arrays.sort(toks.asInstanceOf[Array[AnyRef]])
    val dl = nToks.toLong
    val out = new java.util.ArrayList[InternalRow](nToks)
    var runStart = 0
    i = 1
    while (i <= nToks) {
      if (i == nToks || toks(i) != toks(runStart)) {
        out.add(new GenericInternalRow(Array[Any](
          toks(runStart), (i - runStart).toLong, dl, runStart == 0)))
        runStart = i
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class TermFreqPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("dl", LongType, nullable = false),
    StructField("first", BooleanType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"term_freq_pairs requires string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    TermFreqsImpl.pairs(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TermFreqsImpl.pairs($c);")
  override protected def withNewChildInternal(newChild: Expression): TermFreqPairs =
    copy(child = newChild)
  override def prettyName: String = "term_freq_pairs"
}

object TermFreqsExprs {
  import org.apache.spark.sql.graft.ColumnBridge
  def termFreqPairs(c: Column): Column =
    ColumnBridge.column(TermFreqPairs(ColumnBridge.expression(c)))
}
