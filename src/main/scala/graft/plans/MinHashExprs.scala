package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd expressions for shingle/MinHash sketching.
  *
  * Why native and not composed HOFs: a `transform(sequence(...), i =>
  * concat_ws(slice(toks, ...)))` tree re-evaluates every non-attribute
  * subtree in the lambda body once PER ELEMENT, and higher-order functions
  * are interpreted (no codegen) — measured ~50-100x slower than this
  * single-call form on the documents corpus. These expressions participate
  * in whole-stage codegen as one static call per row, hash each shingle
  * exactly once, and never box.
  *
  * Reference semantics (near-dup curation for training corpora, SURVEY.md
  * §2.3 north-star scope): word n-gram shingles of the cleaned text
  * (single-space separated, so each shingle is a contiguous char window);
  * Jaccard over the distinct-shingle sets; MinHash signature = per
  * permutation p, min over shingles of a 64-bit mix keyed by p.
  */
object MinHashImpl {
  /** splitmix64 finalizer — the avalanche used for both shingle hashing and
    * per-permutation mixing. */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z ^= (z >>> 30); z *= 0xbf58476d1ce4e5b9L
    z ^= (z >>> 27); z *= 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Sorted distinct 64-bit hashes of the word n-gram shingles of `u`.
    * `u` must be cleaned text (single spaces, no leading/trailing space) —
    * then every shingle is the char span from token i's start to token
    * (i+n-1)'s end, so hashing needs no substring allocation. */
  def shingleHashes(u: UTF8String, n: Int): ArrayData = {
    val s = u.toString
    val len = s.length
    // token start/end offsets
    var nToks = 0
    var i = 0
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      if (i < len) { nToks += 1; while (i < len && s.charAt(i) != ' ') i += 1 }
    }
    if (nToks < n) return new GenericArrayData(Array.empty[Long])
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
    val nWin = nToks - n + 1
    val out = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      out(w) = SimHashImpl.fnv64(s, starts(w), ends(w + n - 1))
      w += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted array
    var m = 1
    i = 1
    while (i < nWin) {
      if (out(i) != out(m - 1)) { out(m) = out(i); m += 1 }
      i += 1
    }
    new GenericArrayData(if (m == nWin) out else java.util.Arrays.copyOf(out, m))
  }

  /** MinHash signature over pre-computed shingle hashes: sig(p) = min over h
    * of mix64(h ^ seed(p)), seed(p) = mix64(p+1) — each p an independent
    * permutation. Empty input → all Long.MaxValue (matches "no shingles"). */
  def minhashSig(hashes: ArrayData, numPerm: Int): ArrayData = {
    val hs = hashes.toLongArray()
    val sig = new Array[Long](numPerm)
    var p = 0
    while (p < numPerm) {
      val seed = mix64(p + 1L)
      var best = Long.MaxValue
      var i = 0
      while (i < hs.length) {
        val v = mix64(hs(i) ^ seed)
        if (v < best) best = v
        i += 1
      }
      sig(p) = best
      p += 1
    }
    new GenericArrayData(sig)
  }

  /** Exact Jaccard of two sorted distinct long arrays (linear merge). */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val x = a.toLongArray(); val y = b.toLongArray()
    if (x.length == 0 && y.length == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { inter += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    inter.toDouble / (x.length + y.length - inter)
  }
}

case class JaccardSorted(left: Expression, right: Expression, bounded: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"jaccard_sorted requires two array<long> inputs, got $other")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    MinHashImpl.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.MinHashImpl.jaccardSorted($a, $b);")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaccard_sorted"
}

case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle length must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"shingle_hashes requires string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    MinHashImpl.shingleHashes(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MinHashImpl.shingleHashes($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes = copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

case class MinHashSignature(child: Expression, numPerm: Int) extends UnaryExpression {
  require(numPerm >= 1, "numPerm must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"minhash_signature requires array<long> input, got $other")
  }
  override def nullSafeEval(v: Any): Any =
    MinHashImpl.minhashSig(v.asInstanceOf[ArrayData], numPerm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MinHashImpl.minhashSig($c, $numPerm);")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature = copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

object MinHashExprs {
  import org.apache.spark.sql.graft.ColumnBridge
  def shingleHashes(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), n))
  def minhashSignature(c: Column, numPerm: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(c), numPerm))
  def jaccardSorted(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSorted(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
