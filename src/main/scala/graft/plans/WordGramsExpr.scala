package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_grams(cleanedText, n)` — every n-token window of single-space
  * cleaned text as ONE string each, in order, duplicates kept: exactly
  * `transform(sequence(1, size(toks) - n + 1), i -> concat_ws(' ',
  * slice(toks, i, n)))` over the split tokens, but as one
  * whole-stage-codegen call per row (round-17 optimization — the
  * [[MinHashExprs]] lesson). Because the text is single-space separated
  * (cleanText's contract), each gram IS the contiguous char span from
  * token i's start to token (i+n-1)'s end — a zero-copy byte slice, no
  * per-gram concatenation. Fewer than n tokens → empty array.
  */
object WordGramsImpl {
  def grams(u: UTF8String, n: Int): ArrayData = {
    val bytes = u.getBytes
    val len = bytes.length
    var nToks = 0
    var i = 0
    while (i < len) {
      while (i < len && bytes(i) == ' ') i += 1
      if (i < len) { nToks += 1; while (i < len && bytes(i) != ' ') i += 1 }
    }
    if (nToks < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nToks)
    val ends = new Array[Int](nToks)
    var t = 0; i = 0
    while (i < len) {
      while (i < len && bytes(i) == ' ') i += 1
      if (i < len) {
        starts(t) = i
        while (i < len && bytes(i) != ' ') i += 1
        ends(t) = i; t += 1
      }
    }
    val out = new Array[Any](nToks - n + 1)
    var w = 0
    while (w <= nToks - n) {
      out(w) = UTF8String.fromBytes(bytes, starts(w), ends(w + n - 1) - starts(w))
      w += 1
    }
    new GenericArrayData(out)
  }
}

case class WordGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram length must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_grams requires string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    WordGramsImpl.grams(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordGramsImpl.grams($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): WordGrams =
    copy(child = newChild)
  override def prettyName: String = "word_grams"
}

/** `ordered_pairs(xs)` — all index-ordered pairs (xs(i), xs(j)), i < j, of
  * a long array, as structs (p1, p2): exactly
  * `flatten(transform(xs, (x, i) -> transform(slice(xs, i + 2, …), y ->
  * struct(x, y))))` but one codegen call per row — the co-purchase pair
  * explosion ran that nested-HOF form interpreted, allocating slices per
  * element (round 17). C(k, 2) output structs per row by construction.
  */
object OrderedPairsImpl {
  def pairs(xs: ArrayData): ArrayData = {
    val a = xs.toLongArray()
    val k = a.length
    if (k < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](k * (k - 1) / 2)
    var w = 0
    var i = 0
    while (i < k - 1) {
      var j = i + 1
      while (j < k) {
        out(w) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](a(i), a(j)))
        w += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class OrderedPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("p1", LongType, nullable = false),
    StructField("p2", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ordered_pairs requires array<long> input, got $other")
  }
  override def nullSafeEval(v: Any): Any =
    OrderedPairsImpl.pairs(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.OrderedPairsImpl.pairs($c);")
  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
  override def prettyName: String = "ordered_pairs"
}

/** `token_grams(toks, n, distinct)` — the n-token windows of a token
  * ARRAY, space-joined, as one codegen call per row: exactly
  * `transform(sequence(0, size(toks) - n), i -> concat_ws(' ',
  * slice(toks, i + 1, n)))`, optionally wrapped in `array_distinct`
  * (FIRST-OCCURRENCE order, matching array_distinct). The array-input
  * sibling of [[WordGrams]] for callers that already staged a token
  * attribute (round 17 — the interpreted transform/slice/concat_ws HOF
  * was the per-row cost of every shingle producer). */
object TokenGramsImpl {
  private val Sep = UTF8String.fromString(" ")
  def grams(xs: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val k = xs.numElements()
    if (k < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](k)
    var i = 0
    while (i < k) { toks(i) = xs.getUTF8String(i); i += 1 }
    val nWin = k - n + 1
    if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String](nWin * 2)
      var w = 0
      while (w < nWin) {
        seen.add(UTF8String.concatWs(Sep, java.util.Arrays.copyOfRange(toks, w, w + n): _*))
        w += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
    } else {
      val out = new Array[Any](nWin)
      var w = 0
      while (w < nWin) {
        out(w) = UTF8String.concatWs(Sep, java.util.Arrays.copyOfRange(toks, w, w + n): _*)
        w += 1
      }
      new GenericArrayData(out)
    }
  }
}

case class TokenGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, "gram length must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_grams requires array<string> input, got $other")
  }
  override def nullSafeEval(v: Any): Any =
    TokenGramsImpl.grams(v.asInstanceOf[ArrayData], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TokenGramsImpl.grams($c, $n, $distinct);")
  override protected def withNewChildInternal(newChild: Expression): TokenGrams =
    copy(child = newChild)
  override def prettyName: String = "token_grams"
}

/** `adjacent_pairs(ts)` — the (ts(i), ts(i+1)) bigram structs of a string
  * array, in order: exactly `transform(sequence(1, size(ts) - 1), i ->
  * struct(ts[i-1], ts[i]))` as one codegen call per row (round 17 — the
  * PageRank adjacency / PMI / Kneser-Ney bigram producers all ran that
  * HOF interpreted). Field names (u, v); callers re-alias. */
object AdjacentPairsImpl {
  def pairs(xs: ArrayData): ArrayData = {
    val k = xs.numElements()
    if (k < 2) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](k)
    var i = 0
    while (i < k) { toks(i) = xs.getUTF8String(i); i += 1 }
    val out = new Array[Any](k - 1)
    i = 0
    while (i < k - 1) {
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](toks(i), toks(i + 1)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class AdjacentPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("u", StringType, nullable = false),
    StructField("v", StringType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"adjacent_pairs requires array<string> input, got $other")
  }
  override def nullSafeEval(v: Any): Any =
    AdjacentPairsImpl.pairs(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.AdjacentPairsImpl.pairs($c);")
  override protected def withNewChildInternal(newChild: Expression): AdjacentPairs =
    copy(child = newChild)
  override def prettyName: String = "adjacent_pairs"
}

object WordGramsExprs {
  import org.apache.spark.sql.graft.ColumnBridge
  def wordGrams(c: Column, n: Int): Column =
    ColumnBridge.column(WordGrams(ColumnBridge.expression(c), n))
  def orderedPairs(c: Column): Column =
    ColumnBridge.column(OrderedPairs(ColumnBridge.expression(c)))
  def tokenGrams(c: Column, n: Int, distinct: Boolean): Column =
    ColumnBridge.column(TokenGrams(ColumnBridge.expression(c), n, distinct))
  def adjacentPairs(c: Column): Column =
    ColumnBridge.column(AdjacentPairs(ColumnBridge.expression(c)))
}
