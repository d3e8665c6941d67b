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

  /** Mini stopword list for the boolean rule layer — single source of truth
    * for the Spark expressions AND the generated DuckDB twin. */
  val RuleStopwords: Seq[String] = Seq("the", "a", "of", "to", "and", "is", "in", "it")

  /** Gopher-style boolean quality rules (Rae et al. '21 §A1.1, simplified):
    * token-count bounds, mean-word-length bounds, alphabetic-word fraction,
    * stopword presence — each reported, plus the conjunction `passes`.
    * Unlike [[qualityScoreFromCounts]] (a soft score), this is the hard
    * keep/drop rule layer a pretraining filter runs first. One scan; the
    * token array is staged to an attribute before any lambda touches it. */
  def gopherRules(df: DataFrame, id: Column, text: Column): DataFrame = {
    val base = df.select(id.as("id"),
      split(lower(TextExprs.cleanText(text)), " ").as("toks"))
    val n = size(col("toks"))
    val meanLen = aggregate(transform(col("toks"), t => length(t)), lit(0L),
      (acc, x) => acc + x).cast("double") / n
    val alphaFrac = size(filter(col("toks"), t => t.rlike("[a-z]"))).cast("double") / n
    val stopHits = size(filter(col("toks"), t => t.isin(RuleStopwords: _*)))
    base.select(
      col("id"),
      n.cast("long").as("n_tokens"),
      round(meanLen, 4).as("mean_tok_len"),
      round(alphaFrac, 4).as("alpha_frac"),
      stopHits.cast("long").as("stop_hits"),
      (n.between(10, 5000) && meanLen.between(2.0, 12.0) &&
        alphaFrac > 0.8 && stopHits >= 2).as("passes"))
  }

  /** DuckDB twin of [[gopherRules]], generated from the same constants.
    * `toksSql` must produce the same lowercase token list as the Spark side
    * (i.e. string_split of the lowered cleaned text). */
  def gopherRulesOracleSql(table: String, idCol: String, toksSql: String): String = {
    val stopList = RuleStopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH d AS (SELECT $idCol, $toksSql AS toks FROM $table)
       |SELECT $idCol,
       | CAST(len(toks) AS BIGINT) AS n_tokens,
       | round(CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / len(toks), 4)
       |   AS mean_tok_len,
       | round(CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
       |   / len(toks), 4) AS alpha_frac,
       | CAST(len(list_filter(toks, t -> t IN ($stopList))) AS BIGINT) AS stop_hits,
       | (len(toks) BETWEEN 10 AND 5000
       |   AND CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / len(toks)
       |     BETWEEN 2.0 AND 12.0
       |   AND CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
       |     / len(toks) > 0.8
       |   AND len(list_filter(toks, t -> t IN ($stopList))) >= 2) AS passes
       |FROM d""".stripMargin
  }

  /** Repetition profile (the Gopher duplication rules' core statistic):
    * the frequency share of the most-common unigram and bigram per doc.
    * Highly repetitive machine-generated text spikes both. Shape: explode →
    * two-level aggregate — the shuffle carries (doc, gram) counts, never
    * gram text through a join. Docs need ≥ 2 tokens (one full bigram). */
  def repetitionProfile(df: DataFrame, id: Column, text: Column,
      repThreshold: Double = 0.08): DataFrame = {
    val base = df.select(id.as("id"),
        split(lower(TextExprs.cleanText(text)), " ").as("toks"))
      .where(size(col("toks")) >= 2)
    def topShare(grams: Column, out: String): DataFrame =
      base.select(col("id"), explode(grams).as("g"))
        .groupBy("id", "g").agg(count(lit(1)).as("c"))
        .groupBy("id").agg((max("c").cast("double") / sum("c")).as(out))
    // ordered (non-distinct) bigrams — frequency needs every occurrence;
    // native token_grams (round 17): one codegen call, no interpreted HOF
    val bigrams = graft.plans.WordGramsExprs.tokenGrams(
      col("toks"), 2, distinct = false)
    topShare(col("toks"), "_uni").join(topShare(bigrams, "_bi"), "id")
      .select(col("id"),
        round(col("_uni"), 6).as("top_uni_frac"),
        round(col("_bi"), 6).as("top_bi_frac"),
        (col("_bi") > repThreshold).as("repetitive"))
  }

  /** Hashed-feature naive-Bayes quality classifier — the fastText/CCNet
    * "quality filter" pattern: learn per-feature log-odds from a LABELED
    * seed (isPos marks seed-positive rows), score every document by its
    * mean token log-odds, keep where the score is positive.
    *
    * Tokens are HASHED to `16^hashChars` buckets (md5-prefix string, the
    * q105 DSIR convention — engine-neutral, no numeric decode), so the
    * model is CONSTANT-sized regardless of corpus vocabulary: at 100 TB
    * the class-count table is still ≤4096 rows and the model join onto
    * the token stream broadcasts — contrast q89's unhinted vocab-sized
    * model join. Class counts are add-one smoothed over the observed
    * bucket count; totals ride a broadcast cross join (the BM25 N/avgdl
    * pattern, no driver collect). Distinct from q105 DSIR: DSIR weighs
    * raw data against an unlabeled target DISTRIBUTION; this is the
    * supervised two-class decision boundary.
    *
    * Output: (doc_id, n_toks, quality_w, keep); quality_w is the 4-dp
    * rounded mean log-odds (`+ 0.0` collapses IEEE −0.0 for cross-engine
    * hashing), keep = quality_w > 0 on the ROUNDED value so both engines
    * cut identically. */
  def hashNbClassifier(df: DataFrame, id: Column, text: Column, isPos: Column,
      hashChars: Int = 3): DataFrame = {
    val toks = df
      .select(id.as("doc_id"), when(isPos, 1L).otherwise(0L).as("y"),
        explode(split(lower(TextExprs.cleanText(text)), " ")).as("tok"))
      .where(col("tok") =!= "")
      .select(col("doc_id"), col("y"), substring(md5(col("tok")), 1, hashChars).as("b"))
    // ≤ 16^hashChars rows; eager-checkpoint so the MODEL build costs one
    // corpus pass total (tot + model both read these blocks) and the
    // whole classifier is exactly two corpus scans: learn, then score.
    // Without the pin every downstream reference to the model re-derives
    // it from its own corpus scan (the q146/q156 sweep compositions
    // measured 8-16 scans).
    val counts = toks.groupBy("b")
      .agg(sum("y").as("cpos"), sum(lit(1L) - col("y")).as("cneg"))
      .localCheckpoint(true)
    val tot = counts.agg(sum("cpos").as("tpos"), sum("cneg").as("tneg"),
      count(lit(1)).as("nb"))
    val model = counts.crossJoin(broadcast(tot))
      .select(col("b"),
        (log((col("cpos") + 1.0) / (col("tpos") + col("nb")))
          - log((col("cneg") + 1.0) / (col("tneg") + col("nb")))).as("w"))
    toks.join(broadcast(model), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_toks"),
        (round(avg("w"), 4) + 0.0).as("quality_w"))
      .select(col("doc_id"), col("n_toks"), col("quality_w"),
        (col("quality_w") > 0.0).as("keep"))
  }

  /** ROUGE-1 (unigram multiset overlap) between blocked candidate pairs —
    * the reference-vs-candidate eval metric a synthetic-data/distillation
    * pipeline scores generations with, run corpus-scale: precision =
    * overlap/|candidate|, recall = overlap/|reference| (reference = the
    * LOWER doc id of the pair, pinned so the unordered pair has one
    * deterministic orientation), overlap = Σ_tok min(count_a, count_b).
    *
    * Scale shape: candidate pairs BLOCK on the md5 of the first 3 tokens
    * (q198's discipline — never all-pairs); the per-token min-overlap is
    * a (block, token) equi-join between per-doc token-count tables, so
    * the widest shuffle key is (block, token) and every agg is map-side
    * combinable. Lengths and overlaps stay LONG; the three ratios are
    * the only float ops, rounded 6dp at the edge. */
  def rouge1Pairs(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val base = docs
      .select(id.as("doc_id"), split(TextExprs.cleanText(text), " ").as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), col("toks"),
        md5(concat_ws(" ", slice(col("toks"), 1, 3))).as("h"))
    val tc = base
      .select(col("doc_id"), col("h"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "h", "tok").agg(count(lit(1)).as("cnt"))
    val len = tc.groupBy("doc_id", "h").agg(sum("cnt").as("len"))
    val pairs = len.select(col("h"), col("doc_id").as("id_a"), col("len").as("len_a"))
      .join(len.select(col("h"), col("doc_id").as("id_b"), col("len").as("len_b")),
        Seq("h"))
      .where(col("id_a") < col("id_b"))
    val ov = tc.select(col("h"), col("tok"), col("doc_id").as("id_a"), col("cnt").as("ca"))
      .join(tc.select(col("h"), col("tok"), col("doc_id").as("id_b"), col("cnt").as("cb")),
        Seq("h", "tok"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum(least(col("ca"), col("cb"))).as("overlap"))
    val p = col("overlap").cast("double") / col("len_b")
    val r = col("overlap").cast("double") / col("len_a")
    pairs.join(ov, Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"), col("overlap"),
        round(p, 6).as("rouge1_p"), round(r, 6).as("rouge1_r"),
        round(lit(2.0) * p * r / (p + r), 6).as("rouge1_f1"))
  }
}
