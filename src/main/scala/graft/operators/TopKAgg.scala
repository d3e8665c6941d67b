package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One scored candidate for the top-k buffer. */
case class ScoredId(score: Double, id: Long)

/** Bounded top-k typed Aggregator: the buffer never exceeds k entries, so
  * PARTIAL aggregation reduces every map partition to at most k rows per
  * key before the shuffle — the scale-correct alternative to materializing
  * every (query, candidate) score and window-sorting the lot. Tie-break
  * matches the window form: score desc, id asc. */
class TopKAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  private def ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))
  override def zero: Seq[ScoredId] = Vector.empty
  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
    if (buf.size < k) (buf :+ x).sorted(ord)
    else if (ord.lt(x, buf.last)) (buf.init :+ x).sorted(ord)
    else buf
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    (a ++ b).sorted(ord).take(k)
  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf
  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}

object TopKAgg {
  /** top_k(score, id) as an untyped aggregate (the product encoder flattens
    * ScoredId into two input parameters). */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k), ExpressionEncoder[ScoredId]())
    (score: Column, id: Column) => fn(score, id)
  }

  /** Per-key top-k: groupBy(key).agg(bounded heap) → exploded back to rows
    * (key, id, score, rank). */
  def perKey(df: DataFrame, key: Column, score: Column, id: Column, k: Int): DataFrame = {
    val agg = topK(k)
    df.select(key.as("_k"), score.as("_score"), id.as("_id"))
      .groupBy("_k")
      .agg(agg(col("_score"), col("_id")).as("_top"))
      .select(col("_k"), posexplode(col("_top")))
      .select(col("_k"), (col("pos") + 1).as("rank"),
        col("col.score").as("score"), col("col.id").as("id"))
  }
}
