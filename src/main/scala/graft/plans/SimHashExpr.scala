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

  def simhash64(u: UTF8String): Long = simhash64(u, 1)

  /** SimHash with word `n`-gram features. Unigram features degenerate on
    * corpora with a shared vocabulary (most docs share most tokens → the
    * bit votes correlate → band blocking produces quadratic candidates —
    * measured 511k candidate pairs from 5k docs at sf0.1); shingle features
    * are document-specific, so the signature bits decorrelate and buckets
    * stay small. Expects cleaned text (single-space separated), under which
    * each feature is a contiguous char window — zero allocation per feature. */
  def simhash64(u: UTF8String, n: Int): Long = {
    val s = u.toString
    val len = s.length
    val counts = new Array[Int](64)
    // token offsets
    var nToks = 0
    var i = 0
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      if (i < len) { nToks += 1; while (i < len && s.charAt(i) != ' ') i += 1 }
    }
    val starts = new Array[Int](nToks)
    val ends = new Array[Int](nToks)
    var t = 0; i = 0
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      if (i < len) {
        starts(t) = i
        while (i < len && s.charAt(i) != ' ') i += 1
        ends(t) = i; t += 1
      }
    }
    var w = 0
    val nWin = nToks - n + 1
    while (w < nWin) {
      val h = fnv64(s, starts(w), ends(w + n - 1))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      w += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** ENGINE-NEUTRAL SimHash: features are the DISTINCT word `n`-gram
    * shingles of the cleaned text, feature hash = first 64 bits of
    * md5(shingle UTF-8) read big-endian (i.e. the first 16 hex chars of the
    * canonical md5 string), signature bit `63 - b` set iff the +1/-1 votes
    * at md5-bit `b` (b = 0 is the most significant bit of the first hex
    * char) sum positive. Every ingredient — md5, distinct shingle sets,
    * big-endian bit order — is reproducible in any SQL engine, so a DuckDB
    * brute-force twin recomputes the signature bit-for-bit and the operator
    * is hash-matchable by the correctness oracle (unlike the FNV fast path
    * above, whose mixer is this library's own).
    *
    * ~2-3x the cost of the FNV path (one MessageDigest update per distinct
    * shingle, thread-local digest, zero allocation beyond the shingle
    * strings) — still linear, still inside whole-stage codegen. */
  def simhashMd5(u: UTF8String, n: Int): Long = {
    val s = u.toString
    val len = s.length
    val counts = new Array[Int](64)
    var nToks = 0
    var i = 0
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      if (i < len) { nToks += 1; while (i < len && s.charAt(i) != ' ') i += 1 }
    }
    val starts = new Array[Int](nToks)
    val ends = new Array[Int](nToks)
    var t = 0; i = 0
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      if (i < len) {
        starts(t) = i
        while (i < len && s.charAt(i) != ' ') i += 1
        ends(t) = i; t += 1
      }
    }
    val md = md5Local.get()
    val seen = new java.util.HashSet[String]()
    var w = 0
    val nWin = nToks - n + 1
    while (w < nWin) {
      val sh = s.substring(starts(w), ends(w + n - 1))
      if (seen.add(sh)) {
        md.reset()
        val d = md.digest(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (d(j) & 0xFFL); j += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> (63 - b)) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      w += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << (63 - b))
      b += 1
    }
    sig
  }
}

case class SimHash(child: Expression, n: Int = 1) extends UnaryExpression {
  require(n >= 1, "feature n-gram length must be >= 1")
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash requires string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    SimHashImpl.simhash64(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHashImpl.simhash64($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): SimHash = copy(child = newChild)
  override def prettyName: String = "simhash"
}

/** Engine-neutral md5-feature SimHash (see SimHashImpl.simhashMd5). */
case class SimHashMd5(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "feature n-gram length must be >= 1")
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash_md5 requires string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    SimHashImpl.simhashMd5(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHashImpl.simhashMd5($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 = copy(child = newChild)
  override def prettyName: String = "simhash_md5"
}

object SimHash {
  import org.apache.spark.sql.graft.ColumnBridge
  def simhash(c: Column): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(c)))
  /** SimHash over word n-gram shingle features (near-dup blocking form). */
  def simhashShingled(c: Column, n: Int): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(c), n))
  /** Oracle-reproducible md5-feature SimHash over DISTINCT n-gram shingles. */
  def simhashMd5Shingled(c: Column, n: Int): Column =
    ColumnBridge.column(SimHashMd5(ColumnBridge.expression(c), n))
}
