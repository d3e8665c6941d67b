package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_set_count(text, words)` — how many maximal `\w`-runs of the input
  * are members of the (lowercase ASCII) word set. Exactly the Java-regex
  * `\b(w1|w2|...)\b` hit count for plain-word patterns: `\w` is
  * [A-Za-z0-9_], all single-byte, so a maximal word-char byte run IS a
  * `\b`-delimited token, and at most one alternative can match a given run
  * (two bounded words matching at one position would have to be equal).
  *
  * This is the language-ID / stopword-ratio kernel: the profile runs five
  * of these per document, previously five full regex traversals. The scan
  * is byte-level (multi-byte UTF-8 sequences are all non-word bytes, so
  * they simply break tokens — identical to `\b` semantics on the decoded
  * string) and probes the ≤ dozens-sized lexicons by length-first linear
  * compare, no per-row allocation.
  */
object WordSetCountImpl {

  @inline private def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  def count(u: UTF8String, words: Array[Array[Byte]]): Int = {
    val bytes = u.getBytes
    val n = bytes.length
    var cnt = 0
    var i = 0
    while (i < n) {
      if (isWord(bytes(i))) {
        var j = i + 1
        while (j < n && isWord(bytes(j))) j += 1
        val len = j - i
        var w = 0
        var matched = false
        while (!matched && w < words.length) {
          val cand = words(w)
          if (cand.length == len) {
            var p = 0
            while (p < len && cand(p) == bytes(i + p)) p += 1
            matched = p == len
          }
          w += 1
        }
        if (matched) cnt += 1
        i = j
      } else i += 1
    }
    cnt
  }
}

case class WordSetCount(child: Expression, words: Seq[String]) extends UnaryExpression {
  require(words.nonEmpty, "word_set_count needs at least one word")

  @transient private lazy val wordBytes: Array[Array[Byte]] =
    words.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_set_count requires string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    WordSetCountImpl.count(v.asInstanceOf[UTF8String], wordBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("words", wordBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordSetCountImpl.count($c, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): WordSetCount =
    copy(child = newChild)
  override def prettyName: String = "word_set_count"
}

/** `char_set_count(text, chars)` — occurrences of any of the ASCII chars.
  * The punctuation-density kernel (`[\.,;:!\?]` hit count) without the
  * regex engine; byte-exact because the class is all-ASCII. */
case class CharSetCount(child: Expression, chars: String) extends UnaryExpression {
  require(chars.nonEmpty && chars.forall(_ < 128), "char set must be ASCII")

  @transient private lazy val member: Array[Boolean] = {
    val m = new Array[Boolean](128)
    chars.foreach(c => m(c.toInt) = true)
    m
  }

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_set_count requires string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    CharSetCountImpl.count(v.asInstanceOf[UTF8String], member)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("members", member, "boolean[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CharSetCountImpl.count($c, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): CharSetCount =
    copy(child = newChild)
  override def prettyName: String = "char_set_count"
}

object CharSetCountImpl {
  def count(u: UTF8String, member: Array[Boolean]): Int = {
    val bytes = u.getBytes
    var cnt = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0 && member(b)) cnt += 1
      i += 1
    }
    cnt
  }
}

object WordSetCount {
  import org.apache.spark.sql.graft.ColumnBridge
  def wordSetCount(c: Column, words: Seq[String]): Column =
    ColumnBridge.column(WordSetCount(ColumnBridge.expression(c), words))
  def charSetCount(c: Column, chars: String): Column =
    ColumnBridge.column(CharSetCount(ColumnBridge.expression(c), chars))
}
