package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextExprs

/** Corpus-profiling operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. All pure expression
  * pipelines — one pass over the text column, fully codegen'd, no shuffle
  * until the caller aggregates. */
object TextAnalysis {

  /** Per-document profile, staged: projection 1 runs each text scan ONCE
    * into attribute columns; projection 2 derives the ratios/scores from the
    * attributes. (A single flat projection re-embeds the cleanText/regex
    * trees per feature and the generated method outgrows the JIT.) */
  def profile(df: DataFrame, id: Column, text: Column): DataFrame = {
    import graft.functions.Lexicons
    val base = df.select(
      id.as("id"),
      length(TextExprs.cleanText(text)).as("n_chars"),
      TextExprs.tokenCountWs(text).as("n_tokens_ws"),
      TextExprs.tokenCountBpe(text).as("n_tokens_bpe"),
      TextExprs.punctCount(text).as("_np"),
      TextExprs.stopwordCount(text).as("_ns"),
      TextExprs.hitCount(text, Lexicons.wordAlternation(Lexicons.StopwordsEs)).as("_es"),
      TextExprs.hitCount(text, Lexicons.wordAlternation(Lexicons.StopwordsDe)).as("_de"),
      TextExprs.hitCount(text, Lexicons.wordAlternation(Lexicons.StopwordsFr)).as("_fr"),
      TextExprs.hitCount(text, "[\\x{4e00}-\\x{9fff}]").as("_cjk"),
      TextExprs.fingerprintMd5(text).as("fingerprint"))
    val nChars = col("n_chars"); val nTokens = col("n_tokens_ws")
    base.select(
      col("id"), nChars, nTokens, col("n_tokens_bpe"),
      round(when(nTokens === 0, 0.0).otherwise(nChars.cast("double") / nTokens), 4).as("avg_token_len"),
      round(when(nChars === 0, 0.0).otherwise(col("_np").cast("double") / nChars), 4).as("punct_ratio"),
      round(when(nTokens === 0, 0.0).otherwise(col("_ns").cast("double") / nTokens), 4).as("stopword_ratio"),
      // _ns doubles as the en stopword hit count for the language decision
      TextExprs.langIdFromHits(col("_ns"), col("_es"), col("_de"), col("_fr"), col("_cjk")).as("lang_pred"),
      col("fingerprint"))
  }

  /** Composite quality score in [0,1] over pre-computed scan attributes
    * (nChars, nTokens, nPunct): the standard pretraining filters (reasonable
    * length, not punctuation-soup). Each component clamps to [0,1]; the
    * score is their mean. */
  def qualityScoreFromCounts(nChars: Column, nTokens: Column, nPunct: Column): Column = {
    val nc = nChars.cast("double")
    val lenScore = least(nc / 200.0, lit(1.0))
    val tokScore = least(nTokens.cast("double") / 50.0, lit(1.0))
    val punctRatio = when(nc === 0.0, 0.0).otherwise(nPunct.cast("double") / nc)
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio * 5.0)
    round((lenScore + tokScore + punctScore) / 3.0, 4)
  }

  /** Single-Column quality score (re-scans text per component — use
    * [[qualityScoreFromCounts]] behind a projection on the hot path). */
  def qualityScore(text: Column): Column =
    qualityScoreFromCounts(
      length(TextExprs.cleanText(text)),
      TextExprs.tokenCountWs(text),
      TextExprs.punctCount(text))
}
