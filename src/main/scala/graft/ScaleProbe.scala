package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: near-dup dedup on a synthetically replicated corpus — the
  * scale-stress datapoint for BASELINE.md. Each source doc is copied `rep`
  * times (fresh ids); odd copies get a perturbing suffix token so they are
  * NEAR-dups (jaccard just under 1), not byte dups. Every source doc thus
  * induces a dense near-dup cluster — the worst case for candidate-pair
  * volume — and the probe reports docs/pairs/clusters plus wall-clock for
  * signature+LSH+verify and for connected components.
  *
  * Usage: runMain graft.ScaleProbe [sfDir] [rep]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rep = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val big = docs.crossJoin(spark.range(rep).select(col("id").as("_r")))
      .select((col("doc_id") * rep + col("_r")).as("doc_id"),
        when(col("_r") % 2 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" zq"), col("_r").cast("string"))).as("text"))
      .repartition(64).cache()
    val nDocs = big.count()
    println(s"[probe] corpus: $nDocs docs (rep=$rep)")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      a
    }

    val pairs = graft.operators.Dedup.minhashNearDups(
      big, col("doc_id"), col("text"), shingleLen = 3,
      numBands = 16, rowsPerBand = 2, threshold = 0.7).cache()
    val nPairs = timed("minhash LSH + verify")(pairs.count())
    println(s"[probe] near-dup pairs: $nPairs")

    val cc = graft.operators.Dedup.connectedComponents(pairs.select("id_a", "id_b"))
    val nClusters = timed("connected components")(
      cc.select("component").distinct().count())
    println(s"[probe] clusters: $nClusters")
    spark.stop()
  }
}
