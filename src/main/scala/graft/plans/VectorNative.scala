package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd vector math over embedding columns (array<float> or
  * array<double>).
  *
  * The composed `aggregate(zip_with(...))` higher-order-function form is
  * interpreted (HOFs have no codegen) and allocates two boxed arrays per
  * row; these expressions are a single static call inside whole-stage
  * codegen. Accumulation is strictly sequential left-to-right in double —
  * the same order as the HOF fold and as DuckDB's list_sum — so results are
  * bit-identical to the oracle's.
  */
object VectorNativeImpl {
  private def toDoubles(a: ArrayData, isFloat: Boolean): Array[Double] =
    if (isFloat) {
      val f = a.toFloatArray(); val d = new Array[Double](f.length)
      var i = 0; while (i < f.length) { d(i) = f(i).toDouble; i += 1 }; d
    } else a.toDoubleArray()

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val x = toDoubles(a, aFloat); val y = toDoubles(b, bFloat)
    val n = math.min(x.length, y.length)
    var s = 0.0; var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val x = toDoubles(a, aFloat); val y = toDoubles(b, bFloat)
    val n = math.min(x.length, y.length)
    var sxy = 0.0; var sxx = 0.0; var syy = 0.0; var i = 0
    // three separate sequential folds — matches dot(a,b) / (norm(a)*norm(b))
    while (i < n) { sxy += x(i) * y(i); i += 1 }
    i = 0; while (i < x.length) { sxx += x(i) * x(i); i += 1 }
    i = 0; while (i < y.length) { syy += y(i) * y(i); i += 1 }
    val na = math.sqrt(sxx); val nb = math.sqrt(syy)
    if (na == 0.0 || nb == 0.0) 0.0 else sxy / (na * nb)
  }
}

abstract class VectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires two array<float|double> inputs, got $other")
  }
}

case class DotProduct(left: Expression, right: Expression) extends VectorBinary {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorNativeImpl.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemIsFloat(left), elemIsFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.VectorNativeImpl.dot($a, $b, ${elemIsFloat(left)}, ${elemIsFloat(right)});")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

case class CosineSim(left: Expression, right: Expression) extends VectorBinary {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorNativeImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemIsFloat(left), elemIsFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.VectorNativeImpl.cosine($a, $b, ${elemIsFloat(left)}, ${elemIsFloat(right)});")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "vec_cosine"
}

object VectorNative {
  import org.apache.spark.sql.graft.ColumnBridge
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
