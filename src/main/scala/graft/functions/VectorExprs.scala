package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType embedding columns, as Catalyst higher-order
  * functions (`zip_with`/`aggregate`) — codegen-adjacent, no UDF, no
  * serialization of the array to the JVM heap per row.
  *
  * All arithmetic is forced to DOUBLE up front: the source columns are
  * float32 and mixed-precision accumulation would both lose accuracy and
  * break parity with external engines.
  */
object VectorExprs {

  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Dot product — native codegen'd expression (graft.plans.VectorNative);
    * strictly sequential double accumulation, bit-identical to the
    * `aggregate(zip_with(...))` fold it replaces. */
  def dot(a: Column, b: Column): Column = graft.plans.VectorNative.dot(a, b)

  def norm(a: Column): Column =
    sqrt(aggregate(toDouble(a), lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity; 0.0 when either vector has zero norm. Native
    * codegen'd single-call expression. */
  def cosine(a: Column, b: Column): Column = graft.plans.VectorNative.cosine(a, b)

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Sign-bit bucket for random-hyperplane LSH: for each plane (a fixed
    * deterministic matrix), emit bit = dot(v, plane) >= 0; pack bits into an
    * int bucket id. Planes are broadcast as literals (tiny). */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeArr = array(p.map(lit): _*)
      when(dot(v, planeArr) >= 0.0, lit(1 << i)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Deterministic pseudo-random unit-ish hyperplanes (fixed seed — stable
    * across runs/partitions, required for LSH join correctness). */
  def deterministicPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }
}
