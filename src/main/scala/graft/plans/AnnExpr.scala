package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd ADC lookup-table builder (PQ search, Jégou et al. 2011
  * §III): for one subspace, emit the k-entry array
  * `lut[j] = |c_j|² − 2 · q_sub · c_j` from the query vector.
  *
  * The codebook rides the expression as a REFERENCE OBJECT
  * (`ctx.addReferenceObj`), i.e. data — not unrolled literal code. The
  * k=4 oracle queries originally unrolled the table as array/CASE
  * expressions over per-coordinate literals; that generated O(k·subdim)
  * code and blew Janino's 64 KB method limit near the k=256 codebooks
  * every real PQ deployment runs (observed: "Code grows beyond 64 KB" at
  * 4×256×16 literals). This form generates ONE static call regardless of
  * codebook size and stays inside whole-stage codegen (Round10Spec
  * compiles it at k=256 and reads the bytecode stats).
  *
  * Bit-exactness contract with the DuckDB oracle: |c_j|² is the same
  * Scala left-to-right fold the literal form embedded, and the dot is the
  * same strictly sequential double accumulation as [[VectorNativeImpl.dot]]
  * — so values are bit-identical to
  * `lit(|c|²) − 2·vec_dot(slice(qv), array(c literals))` and to DuckDB's
  * `list_inner_product(c, c) − 2 · list_inner_product(q_sub, c)`.
  */
object AnnNativeImpl {
  /** Nearest-centroid assignment: returns (bestIdx, bestScore) with
    * score_j = |c_j|² − 2·v·c_j and strict-< tracking, so the FIRST index
    * holding the minimum wins — the same tie-break as the expression fold
    * it replaces, and per-entry arithmetic bit-identical to the unrolled
    * `lit(|c|²) − 2·vec_dot(v, c)` form (sequential double accumulation,
    * Scala-side |c|² fold). */
  def argminScore(v: ArrayData, cents: Array[Array[Double]],
      cnorms: Array[Double], isFloat: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    var bestIdx = 0
    var best = 0.0
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(if (isFloat) v.numElements() else v.numElements(), c.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val q = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += q * c(i)
        i += 1
      }
      val score = cnorms(j) - 2.0 * s
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
      val c = cents(j)
      var s = 0.0
      var i = 0
      while (i < c.length) {
        val q = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += q * c(i)
        i += 1
      }
      val score = java.math.BigDecimal.valueOf(cnorms(j) - 2.0 * s)
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
      val c = cents(j)
      var s = 0.0
      var i = 0
      while (i < c.length) {
        val q = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += q * c(i)
        i += 1
      }
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
      val c = cents(j)
      var s = 0.0
      var i = 0
      while (i < c.length) {
        val q = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += q * c(i)
        i += 1
      }
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

  /** Sign-bit hyperplane LSH bucket: bit i set iff v · plane_i ≥ 0 —
    * replicating the unrolled `when(dot ≥ 0, 1<<i).otherwise(0)` sum
    * bit-for-bit (same sequential dots, same ≥ 0 cut, same bit weights). */
  def hyperplaneBucket(v: ArrayData, planes: Array[Array[Double]],
      isFloat: Boolean): Int = {
    var bucket = 0
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      val n = math.min(v.numElements(), p.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val q = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += q * p(i)
        i += 1
      }
      if (s >= 0.0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  /** Residual vector v − c_idx for a pre-assigned centroid index — the
    * corpus-side residual-PQ encode (q120) as one native call instead of a
    * `zip_with` higher-order function (HOFs are interpreted; the encode is
    * a full-corpus pass at 100 TB). */
  def subCentroid(v: ArrayData, idx: Int, cents: Array[Array[Double]],
      isFloat: Boolean): ArrayData = {
    val c = cents(idx)
    val out = new Array[Double](c.length)
    var i = 0
    while (i < c.length) {
      val q = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = q - c(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  def adcLut(qv: ArrayData, cents: Array[Array[Double]], cnorms: Array[Double],
      offset: Int, isFloat: Boolean): ArrayData = {
    val out = new Array[Double](cents.length)
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var s = 0.0
      var i = 0
      while (i < c.length) {
        val q = if (isFloat) qv.getFloat(offset + i).toDouble else qv.getDouble(offset + i)
        s += q * c(i)
        i += 1
      }
      out(j) = cnorms(j) - 2.0 * s
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class AdcLutExpr(child: Expression, cents: Array[Array[Double]], offset: Int)
    extends UnaryExpression {
  // the same Scala fold the unrolled-literal form used for lit(|c|²)
  private lazy val cnorms: Array[Double] = cents.map(_.map(x => x * x).sum)
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float|double>, got $other")
  }
  override def nullSafeEval(a: Any): Any =
    AnnNativeImpl.adcLut(a.asInstanceOf[ArrayData], cents, cnorms, offset, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("adcCents", cents, "double[][]")
    val cnormsRef = ctx.addReferenceObj("adcCnorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, q =>
      s"${ev.value} = graft.plans.AnnNativeImpl.adcLut($q, $centsRef, $cnormsRef, $offset, $isFloat);")
  }
  override protected def withNewChildInternal(newChild: Expression): AdcLutExpr =
    copy(child = newChild)
  override def prettyName: String = "adc_lut"
}

/** Nearest-centroid (index, score) as ONE native pass over the centroid
  * table — the k-means assignment hot loop. The flat `array_min` +
  * `array_position` expression form already beat the nested-CASE fold, but
  * a CreateArray of k score expressions still generates O(k) call sites and
  * breaks Janino's 64 KB method limit near k=500 (observed in the semdedup
  * scale probe, where k scales with the corpus). Here the centroid matrix
  * is a reference object and the generated code is one static call at any
  * k. */
case class ArgMinScoreExpr(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {
  private lazy val cnorms: Array[Double] = cents.map(_.map(x => x * x).sum)
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("idx", org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("score", DoubleType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float|double>, got $other")
  }
  override def nullSafeEval(a: Any): Any =
    AnnNativeImpl.argminScore(a.asInstanceOf[ArrayData], cents, cnorms, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("amCents", cents, "double[][]")
    val cnormsRef = ctx.addReferenceObj("amCnorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.AnnNativeImpl.argminScore($v, $centsRef, $cnormsRef, $isFloat);")
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
case class ArgTopMExpr(child: Expression, cents: Array[Array[Double]], m: Int)
    extends UnaryExpression {
  private lazy val cnorms: Array[Double] = cents.map(_.map(x => x * x).sum)
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float|double>, got $other")
  }
  override def nullSafeEval(a: Any): Any =
    AnnNativeImpl.argTopM(a.asInstanceOf[ArrayData], cents, cnorms, m, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("atmCents", cents, "double[][]")
    val cnormsRef = ctx.addReferenceObj("atmCnorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.AnnNativeImpl.argTopM($v, $centsRef, $cnormsRef, $m, $isFloat);")
  }
  override protected def withNewChildInternal(newChild: Expression): ArgTopMExpr =
    copy(child = newChild)
  override def prettyName: String = "arg_top_m"
}

/** `array_max(array(struct(dot, cid)))` as one native call — code size
  * constant in cell count (the unrolled struct-array form is O(k·dim) code,
  * the 64 KB failure shape at production cell counts). Tie-break preserved:
  * highest index wins, as lexicographic struct max does. */
case class ArgMaxDotExpr(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float|double>, got $other")
  }
  override def nullSafeEval(a: Any): Any =
    AnnNativeImpl.argMaxDot(a.asInstanceOf[ArrayData], cents, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("amdCents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.AnnNativeImpl.argMaxDot($v, $centsRef, $isFloat);")
  }
  override protected def withNewChildInternal(newChild: Expression): ArgMaxDotExpr =
    copy(child = newChild)
  override def prettyName: String = "argmax_dot"
}

/** `slice(reverse(array_sort(array(struct(dot, cid)))), 1, m).cid` as one
  * native call — (raw dot DESC, index DESC) ordering preserved. */
case class TopMDotExpr(child: Expression, cents: Array[Array[Double]], m: Int)
    extends UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float|double>, got $other")
  }
  override def nullSafeEval(a: Any): Any =
    AnnNativeImpl.topMByDot(a.asInstanceOf[ArrayData], cents, m, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("tmdCents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.AnnNativeImpl.topMByDot($v, $centsRef, $m, $isFloat);")
  }
  override protected def withNewChildInternal(newChild: Expression): TopMDotExpr =
    copy(child = newChild)
  override def prettyName: String = "top_m_dot"
}

/** Sign-bit hyperplane LSH bucket (random-projection LSH for cosine,
  * Charikar 2002) — the plane matrix as data; the unrolled when-chain form
  * is O(planes·dim) generated code, the familiar 64 KB failure at the
  * 32–64-bit signatures production LSH runs. Bit-for-bit equal to the
  * expression form (PropertySpec differential at 64 planes). */
case class HyperplaneBucketExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float|double>, got $other")
  }
  override def nullSafeEval(a: Any): Any =
    AnnNativeImpl.hyperplaneBucket(a.asInstanceOf[ArrayData], planes, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("hpPlanes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.AnnNativeImpl.hyperplaneBucket($v, $planesRef, $isFloat);")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketExpr =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_bucket"
}

/** Residual v − c_idx (corpus-side residual-PQ encode) — native replacement
  * for `zip_with(v, element_at(<array-of-array literals>, idx+1), _ − _)`:
  * the HOF pair is interpreted per row and the literal gather is O(k·dim)
  * generated code. */
case class SubCentroidExpr(left: Expression, right: Expression,
    cents: Array[Array[Double]]) extends BinaryExpression {
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
      b.asInstanceOf[Int], cents, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("scCents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, (v, i) =>
      s"${ev.value} = graft.plans.AnnNativeImpl.subCentroid($v, $i, $centsRef, $isFloat);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SubCentroidExpr =
    copy(left = l, right = r)
  override def prettyName: String = "sub_centroid"
}

object AnnNative {
  import org.apache.spark.sql.graft.ColumnBridge
  /** k-entry ADC table for the subspace starting at 0-based `offset` with
    * width = each centroid's length. */
  def adcLut(qv: Column, cents: Seq[Array[Double]], offset: Int): Column =
    ColumnBridge.column(AdcLutExpr(ColumnBridge.expression(qv), cents.toArray, offset))

  /** (nearest centroid index, its |c|²−2·v·c score) columns from one
    * native pass; the shared struct is CSE'd inside whole-stage codegen. */
  def argminScore(v: Column, cents: Seq[Array[Double]]): (Column, Column) = {
    val st = ColumnBridge.column(ArgMinScoreExpr(ColumnBridge.expression(v), cents.toArray))
    (st.getField("idx"), st.getField("score"))
  }

  /** The m nearest centroid indices, ordered by (6dp-rounded score, index)
    * — the IVF coarse probe in one expression. */
  def argTopM(v: Column, cents: Seq[Array[Double]], m: Int): Column =
    ColumnBridge.column(ArgTopMExpr(ColumnBridge.expression(v), cents.toArray, m))

  /** Highest-dot cell id (ties → highest index, matching struct-max). */
  def argMaxDot(v: Column, cents: Seq[Array[Double]]): Column =
    ColumnBridge.column(ArgMaxDotExpr(ColumnBridge.expression(v), cents.toArray))

  /** m cell ids by (raw dot desc, index desc) — the cosine-IVF probe. */
  def topMByDot(v: Column, cents: Seq[Array[Double]], m: Int): Column =
    ColumnBridge.column(TopMDotExpr(ColumnBridge.expression(v), cents.toArray, m))

  /** v − centroid[idx] as array<double>. */
  def subCentroid(v: Column, idx: Column, cents: Seq[Array[Double]]): Column =
    ColumnBridge.column(SubCentroidExpr(
      ColumnBridge.expression(v), ColumnBridge.expression(idx), cents.toArray))

  /** Sign-bit LSH bucket id over the given hyperplanes. */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(HyperplaneBucketExpr(
      ColumnBridge.expression(v), planes.map(_.toArray).toArray))
}
