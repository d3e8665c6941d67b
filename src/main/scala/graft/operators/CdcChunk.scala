package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextExprs

/** Content-defined chunking (the FastCDC/rsync recipe at token
  * granularity): a chunk boundary falls AFTER any token whose md5 lands in
  * `1/modulus` of hash space, so boundaries are a pure function of LOCAL
  * content — an insertion shifts at most one chunk, which is what makes
  * chunk-hash dedup robust to edits (fixed-size blocks lose every hash
  * downstream of an edit).
  *
  * Scale shape: the boundary flag is one codegen'd expression over the
  * token stream; chunk_idx is a PER-DOC partitioned-window prefix sum
  * (real partition keys — documents — never a global window); chunk hashes
  * aggregate with a buffer bounded by the expected chunk length
  * (`modulus` tokens). The duplicate index rolls hashes up with the q55
  * two-level trick ((h, doc) first, then h) so distinct-doc counting never
  * plans Expand.
  */
object CdcChunk {

  /** (doc_id, chunk_idx, n_toks, h): content-defined chunks of the
    * cleaned, lowercased token stream; h = md5 of the space-joined chunk
    * tokens. */
  def chunks(df: DataFrame, id: Column, text: Column, modulus: Int = 8): DataFrame = {
    val toks = df
      .select(id.as("doc_id"), posexplode(split(lower(TextExprs.cleanText(text)), " ")))
      .where(col("col") =!= "")
      .select(col("doc_id"), col("pos"), col("col").as("tok"),
        when(conv(substring(md5(col("col")), 1, 4), 16, 10).cast("long") % modulus === 0, 1L)
          .otherwise(0L).as("_bnd"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.withColumn("chunk_idx", coalesce(sum("_bnd").over(w), lit(0L)))
      .groupBy("doc_id", "chunk_idx")
      .agg(count(lit(1)).as("n_toks"),
        md5(concat_ws(" ", expr(
          "transform(array_sort(collect_list(named_struct('pos', pos, 'tok', tok))), x -> x.tok)")))
          .as("h"))
  }

  /** Cross-doc duplicate-chunk index over [[chunks]] output:
    * (chunk_h, n_toks, n_occurrences, n_docs) for chunks occurring more
    * than once. */
  def dupIndex(ch: DataFrame): DataFrame = {
    val perDoc = ch.groupBy("h", "doc_id")
      .agg(count(lit(1)).as("_c"), max("n_toks").as("_nt"))
    perDoc.groupBy("h")
      .agg(max("_nt").as("n_toks"), sum("_c").as("n_occurrences"),
        count(lit(1)).as("n_docs"))
      .where(col("n_occurrences") > 1)
      .select(col("h").as("chunk_h"), col("n_toks"), col("n_occurrences"), col("n_docs"))
  }
}
