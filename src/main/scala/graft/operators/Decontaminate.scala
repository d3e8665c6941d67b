package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextExprs

/** Benchmark decontamination: flag training documents that share long
  * token n-grams with an evaluation/benchmark set (the GPT-3-style 8-13
  * gram overlap test applied before a corpus ships to training).
  *
  * Dataflow: distinct n-grams per side → equi-join on the gram → count
  * distinct hits per training doc. The benchmark side is tiny relative to
  * a 100 TB corpus, so its gram set BROADCASTs and the training grams
  * never shuffle for the probe; the only exchange is the final per-doc
  * hit count. Gram extraction is the same staged attribute-column pattern
  * as the dedup operators (HOF lambdas only over attributes).
  */
object Decontaminate {

  /** Distinct lowercase word n-grams per document: (id, gram). */
  def docGrams(df: DataFrame, id: Column, text: Column, n: Int): DataFrame = {
    val toks = df.select(id.as("id"),
      split(lower(TextExprs.cleanText(text)), " ").as("toks"))
    toks.select(col("id"), explode(Dedup.shinglesOfToks(col("toks"), n)).as("gram"))
  }

  /** Distinct 64-bit n-gram shingle hashes per document: (id, gram_h) —
    * the native single-pass extraction (plans.MinHashExprs, q27's hot
    * path). No ~50-char gram string is ever materialized or shuffled;
    * the probe joins on longs. Per-doc distinct by construction. */
  def docGramHashes(df: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    df.select(id.as("id"), explode(graft.plans.MinHashExprs.shingleHashes(
      lower(TextExprs.cleanText(text)), n)).as("gram_h"))

  /** Contamination report: for every training doc sharing at least one
    * n-gram with any benchmark doc, (id, n_hit_grams) = how many DISTINCT
    * grams of that doc appear anywhere in the benchmark set.
    *
    * Probes 64-bit gram HASHES, not gram strings (same equivalence
    * license as the minhash family: distinct-hash counts equal
    * distinct-gram counts up to 64-bit collisions, ~1e-19 per in-doc
    * pair — the string form is [[docGrams]] if a caller needs it). The
    * hashes are per-doc distinct already, so the per-doc hit count is a
    * plain count — no distinct aggregate, no Expand. */
  def report(train: DataFrame, bench: DataFrame, id: Column, text: Column,
      n: Int = 8): DataFrame = {
    val benchGrams = broadcast(docGramHashes(bench, id, text, n)
      .select("gram_h").distinct())
    docGramHashes(train, id, text, n)
      .join(benchGrams, "gram_h")
      .groupBy("id")
      .agg(count(lit(1)).as("n_hit_grams"))
  }
}
