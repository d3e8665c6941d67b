package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextExprs

/** Corpus-profiling operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. All pure expression
  * pipelines — one pass over the text column, fully codegen'd, no shuffle
  * until the caller aggregates. */
object TextAnalysis {

  /** Per-document profile: one projection with every text feature. */
  def profile(df: DataFrame, id: Column, text: Column): DataFrame = {
    val t = TextExprs.cleanText(text)
    val nChars = length(t)
    val nTokens = TextExprs.tokenCountWs(text)
    val nPunct = TextExprs.punctCount(text)
    val nStop = TextExprs.stopwordCount(text)
    df.select(
      id.as("id"),
      nChars.as("n_chars"),
      nTokens.as("n_tokens_ws"),
      TextExprs.tokenCountBpe(text).as("n_tokens_bpe"),
      round(when(nTokens === 0, 0.0).otherwise(nChars.cast("double") / nTokens), 4).as("avg_token_len"),
      round(when(nChars === 0, 0.0).otherwise(nPunct.cast("double") / nChars), 4).as("punct_ratio"),
      round(when(nTokens === 0, 0.0).otherwise(nStop.cast("double") / nTokens), 4).as("stopword_ratio"),
      TextExprs.langId(text).as("lang_pred"),
      TextExprs.fingerprintMd5(text).as("fingerprint"))
  }

  /** Composite quality score in [0,1]: the standard pretraining filters
    * (reasonable length, not punctuation-soup, some stopword signal). Each
    * component clamps to [0,1]; the score is their mean. */
  def qualityScore(text: Column): Column = {
    val t = TextExprs.cleanText(text)
    val nChars = length(t).cast("double")
    val nTokens = TextExprs.tokenCountWs(text).cast("double")
    val lenScore = least(nChars / 200.0, lit(1.0))
    val tokScore = least(nTokens / 50.0, lit(1.0))
    val punctRatio = when(nChars === 0, 0.0)
      .otherwise(TextExprs.punctCount(text).cast("double") / nChars)
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio * 5.0)
    round((lenScore + tokScore + punctScore) / 3.0, 4)
  }
}
