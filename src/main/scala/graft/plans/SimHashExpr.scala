package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash document signature.
  *
  * Per whitespace token: a stable 64-bit hash; per bit position the +1/-1
  * votes are summed; the sign of each position forms the signature bit. Two
  * documents with small Hamming distance between signatures share most
  * token content — the classic near-dup sketch (Charikar '02), used here for
  * corpus dedup at scale.
  *
  * Implemented as a native Catalyst expression WITH codegen (not a UDF, not
  * CodegenFallback): the generated code is a single static call, so the
  * expression participates in whole-stage codegen and never boxes the input.
  */
object SimHashImpl {
  /** FNV-1a 64-bit — stable across JVMs/platforms, no dependency. */
  @inline def fnv64(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    // final avalanche (splitmix64) — FNV alone is weak in high bits
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  def simhash64(u: UTF8String): Long = {
    val s = u.toString
    val counts = new Array[Int](64)
    val n = s.length
    var i = 0
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && s.charAt(i) != ' ') i += 1
      if (i > start) {
        val h = fnv64(s, start, i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

case class SimHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash requires string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    SimHashImpl.simhash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHashImpl.simhash64($c);")
  override protected def withNewChildInternal(newChild: Expression): SimHash = copy(newChild)
  override def prettyName: String = "simhash"
}

object SimHash {
  import org.apache.spark.sql.graft.ColumnBridge
  def simhash(c: Column): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(c)))
}
