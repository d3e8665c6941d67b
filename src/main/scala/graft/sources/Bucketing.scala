package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed managed tables: pre-shuffled, co-located layout so repeated
  * joins/aggregations on the bucket key run with NO exchange. This is the
  * single biggest recurring-shuffle eliminator for a 100 TB star schema —
  * bucket the fact and dimension tables on the join key once at write time
  * and every downstream join is exchange-free (and with sortBy, sort-free).
  */
object Bucketing {

  /** Write as a bucketed+sorted parquet managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
      .saveAsTable(table)

  /** True if the executed plan of `df` contains a shuffle exchange —
    * the assertion hook for co-located-join tests. */
  def hasShuffleExchange(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("Exchange hashpartitioning") || plan.contains("Exchange rangepartitioning")
  }
}
