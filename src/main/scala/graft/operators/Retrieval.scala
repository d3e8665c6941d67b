package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextExprs

/** Corpus retrieval scoring — TF-IDF term weighting and BM25 ranking — as
  * pure dataflow over the (doc, token, tf) long format. These are the
  * text-side analogs of the embedding similarity operators (q30/q31): the
  * sparse-retrieval half of a training-data curation / search stack.
  *
  * Scale shape: everything is groupBy/join on well-spread keys. The document
  * frequency table is |vocab| rows — tiny next to the corpus — so Catalyst
  * broadcasts it into the per-token join; the per-doc aggregates shuffle on
  * doc_id. Corpus-level scalars (N, avgdl) are single-ROW aggregates folded
  * back in as a broadcast cross join — they stay inside the DAG (one job,
  * no blocking driver-side collect between scans).
  */
object Retrieval {

  /** The cleaned, lowercased, whitespace-split, empty-dropped token array —
    * THE tokenization every sparse-retrieval operator shares (one code
    * path, so LexIndex build/append/bm25 can never drift). */
  def tokens(text: Column): Column =
    filter(split(lower(TextExprs.cleanText(text)), " "), t => t =!= "")

  /** The row-local (token, tf, dl, first) pair array of a document's
    * cleaned text — one native whole-stage-codegen call per row
    * ([[graft.plans.TermFreqsExprs.termFreqPairs]]); every token of a
    * document lives in its row, so term frequency is a ROW-LOCAL
    * aggregate, not a corpus shuffle (round-17 optimization; guide §2.4
    * "remove shuffles outright": the previous explode → groupBy(doc_id,
    * token) exchanged the whole exploded token stream just to count
    * within rows). */
  def tfPairs(text: Column): Column =
    graft.plans.TermFreqsExprs.termFreqPairs(lower(TextExprs.cleanText(text)))

  /** (doc_id, token, tf, dl, is_first): per-document term frequencies
    * PLUS the document length, all computed row-locally (no exchange
    * anywhere). `is_first` marks exactly ONE row per document, so
    * doc-grain facts (doc list, n_docs, Σdl) are a FILTER over this
    * table, never a re-scan or an exchange. Token-less docs contribute
    * no rows (the previous groupBy semantics). The denormalized-dl long
    * format [[LexIndex]] persists. */
  def termFreqsWithDl(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc_id"), explode(tfPairs(text)).as("p"))
      .select(col("doc_id"), col("p.token").as("token"), col("p.tf").as("tf"),
        col("p.dl").as("dl"), col("p.first").as("is_first"))

  /** (doc_id, token, tf): term frequencies of the cleaned, lowercased,
    * whitespace-split text. Empty tokens dropped; docs with no tokens
    * contribute no rows. Row-local — see [[termFreqsWithDl]]. */
  def termFreqs(df: DataFrame, id: Column, text: Column): DataFrame =
    termFreqsWithDl(df, id, text).select("doc_id", "token", "tf")

  /** Top-k TF-IDF terms per document.
    *
    * score = tf · ln((N + 1) / (df + 1))  (smoothed idf; never negative-∞)
    *
    * Ranking happens on the 4-dp-ROUNDED score (ties broken by token) so the
    * ordering is reproducible across engines — two different (tf, df) pairs
    * can land within a double ulp of each other, and an unrounded
    * cross-engine comparison would make the top-k boundary flap. */
  def tfidfTopK(df: DataFrame, id: Column, text: Column, k: Int): DataFrame = {
    // eager lineage truncation, not cache(): the tokenize pass runs once
    // and downstream consumers read blocks, but the blocks release on GC
    // (ContextCleaner) instead of pinning the CacheManager until an
    // unpersist nobody is positioned to call — the PageRank/CC posture
    val tf = termFreqs(df, id, text).localCheckpoint()
    val nd = df.agg(count(lit(1)).cast("double").as("_nd"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("dfreq"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("token").asc)
    tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(nd))
      .withColumn("score",
        round(col("tf") * log((col("_nd") + 1.0) / (col("dfreq") + 1.0)), 4))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("doc_id"), col("token"), col("score"), col("rnk"))
  }

  /** Positional phrase search: exact multi-token phrase occurrence counts
    * with per-phrase top-k, via the positional-postings adjacency trick —
    * each phrase token at offset `qpos` matching a doc position `pos`
    * votes for anchor `pos − qpos`; an anchor collecting all `plen` votes
    * is one exact occurrence. This is how a positional inverted index
    * answers phrase queries without ever re-reading text.
    *
    * Scale shape: the query-token table (Σ phrase lengths rows) broadcasts
    * into the postings stream, so only positions whose TOKEN matches some
    * phrase token survive to the anchor shuffle — the corpus long tail
    * never leaves the scan stage. The anchor and hit aggregates are
    * map-side combined, and the final cut is the bounded [[TopKAgg]] heap
    * (at most k rows per phrase reach the driver-facing result), never a
    * global sort. */
  def phraseSearch(df: DataFrame, id: Column, text: Column,
      phrases: Seq[String], k: Int): DataFrame = {
    require(phrases.nonEmpty, "phraseSearch needs at least one phrase")
    val spark = df.sparkSession
    import spark.implicits._
    val postings = df
      .select(id.as("doc_id"), lower(TextExprs.cleanText(text)).as("_cln"))
      .select(col("doc_id"), posexplode(split(col("_cln"), " ")))
      .where(col("col") =!= "")
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("token"))
    val qtoks = phrases.flatMap { p =>
      val ts = p.split(" ")
      ts.zipWithIndex.map { case (tok, i) => (p, tok, i.toLong, ts.length.toLong) }
    }.toDF("phrase", "token", "qpos", "plen")
    val anchors = postings.join(broadcast(qtoks), "token")
      .groupBy(col("phrase"), col("plen"), col("doc_id"),
        (col("pos") - col("qpos")).as("_anchor"))
      .agg(count(lit(1)).as("_nt"))
      .where(col("_nt") === col("plen"))
    val hits = anchors.groupBy("phrase", "doc_id").agg(count(lit(1)).as("n_hits"))
    TopKAgg.perKey(hits, col("phrase"), col("n_hits").cast("double"), col("doc_id"), k)
      .select(col("_k").as("phrase"), col("rank").cast("long").as("rank"),
        col("id").as("doc_id"), col("score").cast("long").as("n_hits"))
  }

  /** BM25 relevance of every matching document for a bag-of-words query.
    *
    * score(d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1 · (1 − b + b·|d|/avgdl))
    * idf(t)   = ln(1 + (N − df + 0.5) / (df + 0.5))
    *
    * |d| = total token count of the doc (Σ tf), avgdl its corpus mean.
    * Emits (doc_id, score) for docs containing ≥ 1 query term, score rounded
    * to 4 dp. No top-k cut here: a rank column over float scores is exactly
    * the cross-engine trap tfidfTopK rounds away, and the match set is
    * already |docs containing a term|, not the corpus. */
  def bm25(df: DataFrame, id: Column, text: Column, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // Row-local rewrite (round 17, guide §2.3/§2.4): tf of the query
    // terms and dl are both per-ROW facts of the native tfPairs kernel,
    // so the corpus never shuffles at all — no (doc_id, token) exchange,
    // no doc-length exchange, no tf ⋈ dl join, no corpus-sized
    // checkpoint. Two scans of the pruned (id, text) columns replace
    // them: corpus scalars (dl read off the first pair, no explode) and
    // the matched-pairs pass; the only exchange left is the final
    // per-doc aggregate over MATCHED rows. Identical integers →
    // identical 4-dp scores.
    val matched = termFreqsWithDl(df, id, text)
      .where(col("token").isin(terms: _*))
    val docLen = df
      .select(try_element_at(tfPairs(text), lit(1))("dl").as("dl"))
      .where(col("dl").isNotNull)
    val stats = docLen.agg(count(lit(1)).cast("double").as("_nd"), avg("dl").as("_avgdl"))
    val dfreq = matched.groupBy("token").agg(count(lit(1)).as("dfreq"))
    val idf = log(lit(1.0) + (col("_nd") - col("dfreq") + 0.5) / (col("dfreq") + 0.5))
    val norm = col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("_avgdl"))
    matched
      .join(broadcast(dfreq), "token")
      .crossJoin(broadcast(stats))
      .withColumn("_s", idf * col("tf") * (k1 + 1.0) / norm)
      .groupBy("doc_id")
      .agg(round(sum("_s"), 4).as("score"))
  }
}
