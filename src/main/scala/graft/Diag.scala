package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch diagnostic: isolate slow stages. */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String, reps: Int = 2)(df: => DataFrame): Unit = (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[diag] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // q28 candidate blowup analysis
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sigs = docs.select(col("doc_id").as("id"), graft.operators.Dedup.simhash(col("text")).as("sig"))
    val bandSlices = (0 until 4).map(b =>
      shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL)))
    val banded = sigs.select(col("id"), col("sig"), posexplode(array(bandSlices: _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_val"))
    val l = banded.select(col("band"), col("band_val"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("band_val"), col("id").as("id_b"), col("sig").as("sig_b"))
    val joined = l.join(r, Seq("band", "band_val")).where(col("id_a") < col("id_b"))
    println("[diag] q28 raw candidate rows = " + joined.count())
    println("[diag] q28 distinct pairs = " + joined.select("id_a", "id_b").distinct().count())
    // top bucket sizes
    banded.groupBy("band", "band_val").count().orderBy(desc("count")).show(10)
    // row-group / partition diagnostics
    for (t <- Seq("documents", "events", "lineitem"))
      println(s"[diag] $t partitions = " +
        spark.read.parquet(s"$sfDir/$t.parquet").rdd.getNumPartitions)
    spark.stop()
  }
}
