package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev micro-profiler for the LexIndex lifecycle stages (round 17: where
  * do the q344/q346 seconds go after the manifest-commit redesign?). */
object LexProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def timed[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[prof] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    graft.operators.LexIndex.build(docs, col("doc_id"), col("text"), "target/prof_lex_w")
    (1 to 2).foreach { i =>
      timed(s"build full $i")(graft.operators.LexIndex.build(
        docs, col("doc_id"), col("text"), s"target/prof_lex$i"))
      timed(s"query $i")(graft.operators.LexIndex.query(spark, s"target/prof_lex$i",
        Seq("spark", "vector", "stream")).collect())
      timed(s"build 90pct $i")(graft.operators.LexIndex.build(
        docs.where(col("doc_id") % 10 =!= 0), col("doc_id"), col("text"), s"target/prof_lexu$i"))
      timed(s"append $i")(graft.operators.LexIndex.append(spark, s"target/prof_lexu$i",
        docs.where(col("doc_id") % 10 === 0), col("doc_id"), col("text")))
      timed(s"compact $i")(graft.operators.LexIndex.compact(spark, s"target/prof_lexu$i", 1))
      timed(s"query2 $i")(graft.operators.LexIndex.query(spark, s"target/prof_lexu$i",
        Seq("spark", "vector", "stream")).collect())
    }
    spark.stop()
  }
}
