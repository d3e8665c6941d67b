package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed managed tables: pre-shuffled, co-located layout so repeated
  * joins/aggregations on the bucket key run with NO exchange. This is the
  * single biggest recurring-shuffle eliminator for a 100 TB star schema —
  * bucket the fact and dimension tables on the join key once at write time
  * and every downstream join is exchange-free (and with sortBy, sort-free).
  */
object Bucketing {

  /** Write as a bucketed+sorted parquet managed table. Drops any existing
    * table AND its leftover warehouse location first — with the in-memory
    * catalog a previous process's directory survives while the catalog
    * entry does not, and saveAsTable refuses the orphaned location. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
      .saveAsTable(table)
  }

  /** True if the executed plan of `df` contains a shuffle exchange —
    * the assertion hook for co-located-join tests. */
  def hasShuffleExchange(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains("Exchange hashpartitioning") || plan.contains("Exchange rangepartitioning")
  }
}
