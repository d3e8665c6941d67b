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
    def timeIt[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[diag] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      a
    }
    import graft.plans.MinHashExprs
    import graft.functions.TextExprs
    val docsRaw = graft.sources.Tables.table(spark, sfDir, "documents")
    // --- q53 stage breakdown: minhash(16x2) pairs -> CC ---
    val docs = docsRaw.select(col("doc_id").as("id"), TextExprs.cleanText(col("text")).as("cln"))
      .select(col("id"), MinHashExprs.shingleHashes(col("cln"), 3).as("shh"))
      .where(size(col("shh")) > 0)
      .withColumn("sig", MinHashExprs.minhashSignature(col("shh"), 32))
      .cache()
    timeIt("sig_materialize")(println("[diag] docs = " + docs.count()))
    val bandHashes = (0 until 16).map(b => hash(slice(col("sig"), b * 2 + 1, 2)))
    val banded = docs.select(col("id"), posexplode(array(bandHashes: _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
    val rawCand = banded.as("l").join(banded.as("r"), Seq("band", "band_hash"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .where(col("id_a") < col("id_b"))
    timeIt("raw_candidates")(println("[diag] raw cand = " + rawCand.count()))
    val cand = rawCand.distinct().cache()
    timeIt("distinct_candidates")(println("[diag] distinct cand = " + cand.count()))
    val pairs = cand
      .join(docs.select(col("id").as("id_a"), col("shh").as("shh_a")), "id_a")
      .join(docs.select(col("id").as("id_b"), col("shh").as("shh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        MinHashExprs.jaccardSorted(col("shh_a"), col("shh_b")).as("jaccard"))
      .where(col("jaccard") >= 0.7)
      .cache()
    timeIt("verify")(println("[diag] pairs = " + pairs.count()))
    val cc = timeIt("cc_total")(
      graft.operators.Dedup.connectedComponents(pairs.select("id_a", "id_b")))
    timeIt("cc_final_materialize")(println("[diag] nodes = " + cc.count()))
    spark.stop()
  }
}
