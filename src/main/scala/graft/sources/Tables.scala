package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loaders for the driver's TPC-H-ish parquet layout
  * (sfDir/name.parquet — see TESTDATA.md). Plain parquet scans: predicate
  * pushdown / column pruning come from Catalyst. */
object Tables {
  val All: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts normalization — the fixture generator has shipped this column
    * as parquet TIMESTAMP(NANOS) in some refreshes and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) in others, so the reader dispatches on the
    * surfaced Spark type instead of assuming one physical layout:
    *  - NANOS (legacy conf surfaces it as LongType nanos): integer `div`
    *    1000 (not `/`: epoch-nanos exceeds the 2^53 exact-double range; the
    *    data is µs-precision so ns→µs truncation is lossless) then
    *    timestamp_micros.
    *  - MICROS without UTC adjustment (Spark reads TIMESTAMP_NTZ): cast to
    *    session-local TimestampType — the session is pinned to UTC
    *    everywhere (builder configs), so the wall-clock micros are
    *    preserved bit-for-bit and downstream unix_micros/window arithmetic
    *    matches the DuckDB oracle, which also reads the column naively. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.functions.{col, expr}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
