package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen'd expression — the fuzzy
  * string-matching kernel (record linkage, name/entity dedup) that Spark
  * lacks (it ships only levenshtein). Standard Winkler variant, matching
  * DuckDB's `jaro_winkler_similarity` (verified empirically): match window
  * `max(|a|,|b|)/2 - 1`, half-transposition count, prefix boost `l·0.1·
  * (1-jaro)` with `l ≤ 4`, applied only when `jaro > 0.7`; either side
  * empty → 0.
  *
  * Character-level on UTF-16 code units — identical to codepoint-level for
  * BMP text; supplementary-plane input would count surrogate pairs as two
  * units (document corpora are cleaned of astral chars upstream).
  */
object JaroWinklerImpl {

  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    // ≤ 64-char strings (virtually all linkage keys) track the match sets
    // in two Long bitmasks — zero allocation on the 10⁶-pairs/task hot path
    if (la <= 64 && lb <= 64) jwSmall(a, b, la, lb)
    else jwLarge(a, b, la, lb)
  }

  private def finishScore(a: String, b: String, la: Int, lb: Int,
      m: Int, t: Int): Double = {
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val maxL = math.min(4, math.min(la, lb))
      while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }

  private def jwSmall(a: String, b: String, la: Int, lb: Int): Double = {
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    var aMask = 0L
    var bMask = 0L
    var m = 0
    var i = 0
    while (i < la) {
      val from = math.max(0, i - window)
      val until = math.min(lb, i + window + 1)
      var j = from
      var found = false
      while (!found && j < until) {
        if ((bMask & (1L << j)) == 0L && a.charAt(i) == b.charAt(j)) {
          aMask |= 1L << i; bMask |= 1L << j; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if ((aMask & (1L << i)) != 0L) {
        while ((bMask & (1L << k)) == 0L) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    finishScore(a, b, la, lb, m, t)
  }

  private def jwLarge(a: String, b: String, la: Int, lb: Int): Double = {
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val from = math.max(0, i - window)
      val until = math.min(lb, i + window + 1)
      var j = from
      var found = false
      while (!found && j < until) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    finishScore(a, b, la, lb, m, t)
  }
}

case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (string, string), got (${left.dataType}, ${right.dataType})")
  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.plans.JaroWinklerImpl.jaroWinkler($l, $r);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinkler = copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {
  import org.apache.spark.sql.graft.ColumnBridge
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
