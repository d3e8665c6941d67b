package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 rig decomposition (guide §1): the streaming-under-oracle
  * family pays a per-query replay-rig floor. This probe splits ONE rig
  * query's wall into its phases — slice prep (writes + guards), the
  * streaming drain itself, and the readback — by re-running the q310
  * shape with timers around each phase, so the optimization targets the
  * phase that actually costs. Usage: runMain graft.RigProf [sfDir]
  */
object RigProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-rigprof")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[rig] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 3).foreach { rep =>
      println(s"=== rep $rep")
      val docs = graft.sources.Tables.table(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val slices = (0 until 4).map(b =>
        docs.where(pmod(col("doc_id"), lit(4)) === b))
      // mirror streamReplaySlices phase by phase
      val base = s"target/rigprof/${java.util.UUID.randomUUID()}"
      val src = new java.io.File(s"$base/src"); src.mkdirs()
      val out = s"$base/out"
      phase("slice-writes") {
        slices.zipWithIndex.foreach { case (df, i) =>
          val tmp = s"$base/tmp$i"
          df.coalesce(1).write.parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(_.getName.startsWith("part-")).get
          require(spark.read.parquet(tmp).count() > 0L)
          val dst = new java.io.File(src, f"b$i%02d.parquet")
          java.nio.file.Files.move(part.toPath, dst.toPath)
          dst.setLastModified(1700000000000L + i * 60000L)
        }
      }
      phase("drain") {
        QueryHelpersAccess.withStreamShuffle(spark) { scoped =>
          scoped.conf.set("spark.sql.streaming.numRecentProgressUpdates", "36")
          val stream = scoped.readStream
            .schema(scoped.read.parquet(src.getPath).schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(src.getPath)
          // the q310 drain shape: dropDuplicates on doc_id with a ledger
          val q = stream.writeStream
            .option("checkpointLocation", s"$base/ckpt")
            .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
              b.agg(count(lit(1)).as("n")).withColumn("batch_id", lit(id))
                .write.mode("append").parquet(out)
            }
            .start()
          try q.processAllAvailable() finally q.stop()
        }
      }
      phase("readback") {
        spark.read.parquet(out).write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}

/** Test-access shim: QueryHelpers.withStreamShuffle is private[graft]. */
private object QueryHelpersAccess {
  def withStreamShuffle[T](s: SparkSession)(f: SparkSession => T): T =
    graft.queries.QueryHelpers.withStreamShuffle(s)(f)
}
