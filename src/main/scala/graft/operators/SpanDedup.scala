package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextExprs

/** Exact duplicated-substring detection — the Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better") dataflow
  * re-expressed declaratively: every L-token window of every document is
  * content-hashed; a span is DUPLICATED when its hash occurs in >= 2
  * distinct documents; each affected document reports its duplicated-window
  * share — the signal a curation pipeline uses to trim or drop cross-doc
  * boilerplate (licenses, headers, templated text).
  *
  * Design notes for 100 TB:
  *  - md5-of-content (not a polynomial rolling hash) keeps the DuckDB twin
  *    engine-neutral; a Rabin-Karp rolling hash would only remove the O(L)
  *    per-window re-hash constant, not change the dataflow.
  *  - TWO passes over the window stream, recomputed from the columnar scan
  *    each time rather than persisted (the HeavyHitters posture — a
  *    corpus-sized window table is the one thing this operator must never
  *    pin): pass 1 shuffles window hashes once to find the >= 2-distinct-doc
  *    spans; pass 2's semi-join is pushed BELOW the per-doc aggregate by
  *    Catalyst (PushDownLeftSemiAntiJoin), so after AQE broadcasts (or
  *    shuffles) the dup-hash set, the only pass-2 shuffle carries DUPLICATED
  *    windows — rare in a real corpus. PlanSpec locks the posture (no
  *    persist, LeftSemi kept, hash aggregates only).
  *  - Per-doc self-repetition is a different signal (q80); nd >= 2 distinct
  *    docs keeps this operator strictly cross-document.
  *
  * Output: (id, n_windows, dup_windows, dup_ratio) for every document with
  * at least one cross-doc duplicated window. Documents shorter than L
  * tokens contain no L-token span and are excluded by construction.
  */
object SpanDedup {

  def perDocDupShare(docs: DataFrame, id: Column, text: Column, L: Int): DataFrame = {
    require(L >= 2, s"span length must be >= 2 tokens, got $L")
    val wins = docs
      .select(id.as("_sd_id"), split(TextExprs.cleanText(text), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .where(col("n") >= L)
      .select(col("_sd_id"), col("n"),
        explode(sequence(lit(0), col("n") - L)).as("pos"), col("toks"))
      .select(col("_sd_id"), col("n"),
        md5(concat_ws(" ", slice(col("toks"), col("pos") + 1, lit(L)))).as("h"))
    val dup = wins.groupBy("h")
      .agg(countDistinct("_sd_id").as("nd")).where(col("nd") >= 2)
    wins.join(dup.select("h"), Seq("h"), "left_semi")
      .groupBy("_sd_id", "n")
      .agg(count(lit(1)).as("dup_windows"))
      .select(col("_sd_id").as("id"),
        (col("n") - (L - 1)).cast("long").as("n_windows"),
        col("dup_windows"),
        round(col("dup_windows") / (col("n") - (L - 1)).cast("double"), 4)
          .as("dup_ratio"))
  }
}
