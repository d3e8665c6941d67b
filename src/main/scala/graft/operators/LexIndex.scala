package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persist-and-reuse LEXICAL (BM25 inverted) index — the [[AnnIndex]]
  * build-once/query-many discipline applied to sparse retrieval (VERDICT
  * r15 gap #1: `Retrieval.bm25` re-derives df/avgdl from the corpus on
  * every call; a production pipeline queries the same corpus thousands of
  * times). Reference behavior spec: the scoring formula and tokenization
  * are exactly `Retrieval.bm25`'s, so a build+query round trip reproduces
  * q52's answers and the oracle hash gate carries over verbatim (q344).
  *
  * Artifact layout under `dir` (all parquet):
  *  - `postings` — one row per (token, doc) posting: (token, doc_id, tf,
  *    dl), PARTITIONED BY `tok_bucket` = pmod(xxhash64(token), nBuckets).
  *    The document length is DENORMALIZED into the posting (classic
  *    inverted-index design: Robertson's dl lives next to tf) so the
  *    query path never touches a corpus-sized side table.
  *  - `dict` — (token, dfreq): vocabulary-sized; the query filters it to
  *    its terms and broadcasts the survivors.
  *  - `stats` — ONE row (n_docs, dl_sum, n_buckets): the corpus scalars
  *    as EXACT integer totals (avgdl derives at query time), so
  *    [[append]] merges them additively with zero floating-point drift —
  *    plus the bucket count, PERSISTED so query/append always hash with
  *    the build's modulus (a mismatched caller parameter would silently
  *    prune away live postings; reading it from the artifact removes the
  *    footgun).
  *
  * Query-path scale shape (the PlanSpec-pinned contract): the ONLY scan is
  * `postings`, partition-pruned to the query terms' buckets (nProbe/k of
  * the artifact at a production bucket count) with the token equality
  * pushed to parquet; `dict` and `stats` arrive filtered-then-broadcast;
  * the single shuffle is the final per-doc aggregate over MATCHED postings
  * only. Zero scans of the documents table, zero corpus-wide aggregates,
  * zero Lloyd-style refits — build cost is paid once, queries pay
  * O(matched postings).
  */
object LexIndex {

  /** One tokenize pass over `df`: (tf with localCheckpoint, per-doc dl).
    * Shared by [[build]] and [[append]] — the q346 contract is
    * build(A)+append(B) ≡ build(A∪B) bit-for-bit, so there must be
    * exactly ONE tokenization/bucketing code path. */
  private def tokenized(df: DataFrame, id: Column, text: Column)
      : (DataFrame, DataFrame) = {
    val tf = Retrieval.termFreqs(df, id, text).localCheckpoint()
    (tf, tf.groupBy("doc_id").agg(sum("tf").as("dl")))
  }

  /** Write (tf ⋈ dl) as bucket-partitioned postings under `dir`. */
  private def writePostings(tf: DataFrame, dl: DataFrame, dir: String,
      mode: String, nBuckets: Int): Unit =
    tf.join(dl, "doc_id")
      .withColumn("tok_bucket", pmod(xxhash64(col("token")), lit(nBuckets)))
      .select("tok_bucket", "token", "doc_id", "tf", "dl")
      .write.partitionBy("tok_bucket").mode(mode).parquet(s"$dir/postings")

  /** The artifact's persisted bucket modulus (stats row, column 3). */
  private def storedBuckets(spark: SparkSession, dir: String): Int =
    spark.read.parquet(s"$dir/stats").head().getAs[Int]("n_buckets")

  /** Tokenize `df` exactly as `Retrieval.bm25` does and write the
    * `postings`/`dict`/`stats` artifact under `dir`. */
  def build(df: DataFrame, id: Column, text: Column, dir: String,
      nBuckets: Int = 16): Unit = {
    val (tf, dl) = tokenized(df, id, text)
    writePostings(tf, dl, dir, "overwrite", nBuckets)
    tf.groupBy("token").agg(count(lit(1)).as("dfreq"))
      .write.mode("overwrite").parquet(s"$dir/dict")
    // stats as EXACT INTEGER totals (doc count, Σdl): avgdl is derived at
    // query time as one double division — so an appended index recombines
    // bit-identically with a from-scratch build (a stored floating avgdl
    // would re-round on every merge; integer sums cannot drift)
    dl.agg(count(lit(1)).as("n_docs"), coalesce(sum("dl"), lit(0L)).as("dl_sum"))
      .withColumn("n_buckets", lit(nBuckets))
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Append a NEW document batch to an existing index — the ingest path
    * (q129's incremental contract applied to the lexical artifact): the
    * batch is tokenized once, its postings land as new files in the
    * bucket-partitioned layout (hashed with the ARTIFACT's stored bucket
    * count), and the corpus statistics are UPDATED EXACTLY because every
    * BM25 statistic is additive — dfreq and doc counts add, and avgdl
    * recombines from the two integer totals. Unlike the ANN index (frozen
    * quantizers, appends encoded against standing centroids), a lexical
    * index's stats shift with every ingest; this append keeps them exact,
    * so build(A)+append(B) ≡ build(A∪B) and the q346 oracle can hash-gate
    * the upsert against the full-corpus twin. Cost: one pass over the
    * BATCH plus a vocab-sized dict rewrite — the standing postings are
    * never read or rewritten. */
  def append(spark: SparkSession, dir: String, batch: DataFrame, id: Column,
      text: Column): Unit = {
    val oldStats = spark.read.parquet(s"$dir/stats").head()
    val (oldN, oldSum, nBuckets) = (oldStats.getAs[Long]("n_docs"),
      oldStats.getAs[Long]("dl_sum"), oldStats.getAs[Int]("n_buckets"))
    val (tf, dl) = tokenized(batch, id, text)
    writePostings(tf, dl, dir, "append", nBuckets)
    // dict: additive dfreq merge (vocab-sized on both sides)
    val merged = spark.read.parquet(s"$dir/dict")
      .unionByName(tf.groupBy("token").agg(count(lit(1)).as("dfreq")))
      .groupBy("token").agg(sum("dfreq").as("dfreq"))
      .localCheckpoint() // sever lineage from the file being overwritten
    merged.write.mode("overwrite").parquet(s"$dir/dict")
    // stats: exact integer addition — no floating recombination anywhere
    val newStats = dl.agg(count(lit(1)).as("n"),
      coalesce(sum("dl"), lit(0L)).as("s")).head()
    import spark.implicits._
    Seq((oldN + newStats.getLong(0), oldSum + newStats.getLong(1), nBuckets))
      .toDF("n_docs", "dl_sum", "n_buckets")
      .write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Compact the bucket-partitioned postings: every `tok_bucket` whose
    * parquet fragment count exceeds `maxFragments` is rewritten into ONE
    * fragment — content-identical, dict/stats untouched, clean buckets
    * keep their files. The maintenance pass of the [[append]] ingest loop
    * (AnnIndex.compact's contract on the lexical artifact): each append
    * lands one file per bucket, and after enough batches the query path
    * pays a small-file open per fragment instead of a streaming scan.
    * Crash-safe swap: the live bucket is renamed ASIDE (`.old`), the
    * compacted copy renamed in, then the old dir deleted — at every
    * instant at least one complete copy of the bucket exists under a
    * name a restarted compact will find and finish from (a delete-then-
    * rename window would lose the bucket silently: an absent partition is
    * not an error to the query path). Returns the bucket ids rewritten. */
  def compact(spark: SparkSession, dir: String, maxFragments: Int = 4): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val postings = new Path(s"$dir/postings")
    // finish an interrupted prior swap: a `.old` dir with no live dir
    // means the crash hit between rename-aside and rename-in
    fs.listStatus(postings)
      .filter(d => d.isDirectory && d.getPath.getName.endsWith(".old"))
      .foreach { d =>
        val live = new Path(postings, d.getPath.getName.stripSuffix(".old"))
        if (!fs.exists(live)) fs.rename(d.getPath, live)
        else fs.delete(d.getPath, true)
      }
    def fragments(p: Path): Int =
      fs.listStatus(p).count(f => f.getPath.getName.endsWith(".parquet"))
    val over = fs.listStatus(postings)
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("tok_bucket="))
      .filter(d => fragments(d.getPath) > maxFragments)
      .map(_.getPath.getName.stripPrefix("tok_bucket=").toLong).toSeq.sorted
    if (over.nonEmpty) {
      val tmp = new Path(s"$dir/postings_compacting")
      fs.delete(tmp, true)
      // hash-repartition on the partition column: every row of a bucket
      // lands in one task, so each rewritten bucket is exactly one fragment
      spark.read.parquet(s"$dir/postings")
        .where(col("tok_bucket").isin(over.map(java.lang.Long.valueOf): _*))
        .repartition(col("tok_bucket"))
        .write.partitionBy("tok_bucket").mode("overwrite").parquet(tmp.toString)
      over.foreach { b =>
        val live = new Path(postings, s"tok_bucket=$b")
        val aside = new Path(postings, s"tok_bucket=$b.old")
        fs.rename(live, aside)
        fs.rename(new Path(tmp, s"tok_bucket=$b"), live)
        fs.delete(aside, true)
      }
      fs.delete(tmp, true)
    }
    over
  }

  /** BM25 top scores for a bag-of-words query, answered ENTIRELY from the
    * stored artifact: (doc_id, score), score rounded to 4 dp — the
    * `Retrieval.bm25` contract, zero corpus scans. The bucket modulus
    * comes from the artifact itself, never from the caller. */
  def query(spark: SparkSession, dir: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "LexIndex.query needs at least one query term")
    import spark.implicits._
    val nBuckets = storedBuckets(spark, dir)
    // the terms' buckets via the engine's own hash (driver-tiny: |terms|
    // rows through the same xxhash64 the build used — the two sides
    // cannot disagree on the bucket function)
    val buckets = terms.toDF("token")
      .select(pmod(xxhash64(col("token")), lit(nBuckets)).as("b"))
      .distinct().as[Long].collect().toSeq
    val postings = spark.read.parquet(s"$dir/postings")
      .where(col("tok_bucket").isin(buckets: _*) &&
        col("token").isin(terms: _*))
    val dict = spark.read.parquet(s"$dir/dict")
      .where(col("token").isin(terms: _*))
    val stats = spark.read.parquet(s"$dir/stats")
      .select(col("n_docs").cast("double").as("n_docs"),
        (col("dl_sum").cast("double") / col("n_docs")).as("avgdl"))
    val idf = log(lit(1.0) + (col("n_docs") - col("dfreq") + 0.5) / (col("dfreq") + 0.5))
    val norm = col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))
    postings
      .join(broadcast(dict), "token")
      .crossJoin(broadcast(stats))
      .withColumn("_s", idf * col("tf") * (k1 + 1.0) / norm)
      .groupBy("doc_id")
      .agg(round(sum("_s"), 4).as("score"))
  }
}
