package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders for the ANN / product-quantization family (q111/q114/
  * q115/q120): shapes chosen to stay inside ONE whole-stage-codegen method
  * at realistic codebook sizes.
  *
  * The asymmetric-distance lookup table (ADC, Jégou et al. 2011 §III) is a
  * k-entry ARRAY column built once per query row — O(k·subdim) on the tiny
  * query side — and each candidate row pays one O(1) `element_at` per
  * subspace. A k-deep nested CASE chain computes the same values but
  * duplicates every dot product across branches; near k = 256 (the codebook
  * size every real PQ deployment runs) that generated method blows the JVM
  * 64 KB bytecode limit and the scan falls back to interpreted evaluation.
  * Round10Spec compiles the k=256 array form with codegen fallback disabled
  * to pin the property.
  */
object AnnExprs {

  /** Per-query ADC lookup table for ONE subspace: entry j holds
    * |c_j|² − 2·q_sub·c_j (add the row-constant |q|² once across subspaces
    * to recover the true squared distance). `offset` is the 0-based start
    * of the subspace inside the full query vector; the subspace width is
    * each centroid's length. Native expression — the codebook is a
    * reference OBJECT in the generated code, so code size is constant in k
    * (an unrolled per-literal form compiles ~O(k·subdim) code and breaks
    * Janino's 64 KB method limit at k=256). */
  def adcLut(qv: Column, centroids: Seq[Array[Double]], offset: Int): Column =
    graft.plans.AnnNative.adcLut(qv, centroids, offset)

}
