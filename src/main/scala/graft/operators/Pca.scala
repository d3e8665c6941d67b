package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** Streaming Gram-matrix accumulator: one pass over the corpus reduces
  * n×d vectors to the d'×d' second-moment matrix (d' = d+1 with the
  * augmentation trick below) — the classic map-reduce linear-algebra
  * reduction behind distributed PCA/whitening. The buffer is a fixed
  * d'² double array, so PARTIAL aggregation reduces every map partition
  * to ONE buffer before the shuffle; no per-element row explosion ever
  * exists (the naive posexplode-pair form streams n·d'² rows through the
  * aggregate — 4 orders of magnitude more traffic at d=64). */
class GramAgg(dp: Int) extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  override def zero: Array[Double] = new Array[Double](dp * dp)
  override def reduce(buf: Array[Double], x: Seq[Double]): Array[Double] = {
    val xs = x.toArray
    require(xs.length == dp, s"gram: expected $dp-dim augmented vector, got ${xs.length}")
    var i = 0
    while (i < dp) {
      val xi = xs(i); val off = i * dp
      var j = 0
      while (j < dp) { buf(off + j) += xi * xs(j); j += 1 }
      i += 1
    }
    buf
  }
  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }
  override def finish(buf: Array[Double]): Seq[Double] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

/** Principal-component extraction for embedding columns — the whitening /
  * outlier-axis primitive (SemDeDup-style pipelines run it before cosine
  * dedup; embedding QA monitors drift along the top axis).
  *
  * Dataflow: ONE distributed pass ([[GramAgg]]) over the AUGMENTED vector
  * x' = [x, 1] yields, in a single (d+1)² buffer, the raw second-moment
  * matrix Σxxᵀ (top-left d×d block), the per-dimension sums Σx (last
  * column) and the row count n (corner) — so mean-centering needs no
  * second scan: Cov = Σxxᵀ/n − μμᵀ. The covariance is model-dimension
  * sized (d² doubles, independent of corpus size), so the power iteration
  * runs on the driver exactly like k-means centroid updates — bounded
  * state, never a per-row collect. */
object Pca {

  /** Top principal component of `vec` by `iters` power-iteration steps on
    * the one-pass covariance. Deterministic: v₀ = 1/√d uniformly, each
    * step is w = C·v (row-major dot), v = w/‖w‖. Returns one row per
    * dimension: (dim_idx, loading, lambda) with λ = final ‖C·v‖ (the
    * eigenvalue estimate). */
  def topComponent(df: DataFrame, vec: Column, dim: Int, iters: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val dp = dim + 1
    val gramFn = udaf(new GramAgg(dp), ExpressionEncoder[Seq[Double]]())
    val aug = df.select(
      concat(VectorExprs.toDouble(vec), array(lit(1.0))).as("xa"))
    val g = aug.agg(gramFn(col("xa")).as("g")).head().getSeq[Double](0).toArray
    val n = g(dp * dp - 1)
    require(n > 0, "pca: empty input")
    val mu = Array.tabulate(dim)(i => g(i * dp + dim) / n)
    val cov = Array.tabulate(dim, dim)((i, j) => g(i * dp + j) / n - mu(i) * mu(j))
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim) { i =>
        var acc = 0.0; var j = 0
        while (j < dim) { acc += cov(i)(j) * v(j); j += 1 }
        acc
      }
      lambda = math.sqrt(w.map(x => x * x).sum)
      require(lambda > 0, "pca: zero covariance — degenerate input")
      v = w.map(_ / lambda)
    }
    spark.createDataset(v.toIndexedSeq.zipWithIndex.map { case (x, i) => (i.toLong, x, lambda) })
      .toDF("dim_idx", "loading", "lambda")
  }
}
