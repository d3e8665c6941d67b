package graft

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Diagnostic for the q309 in-suite regression, step 2 (round 15): the
  * bisect pinned the tax to the NUMBER of streaming-replay executions
  * that ran earlier in the session (1 neighbor → 0.92 s, 4 → ~1.4 s,
  * 9 → ~4.7 s), surviving StateStore.stop(). This probe runs the
  * streaming family N times, then splits a q309 run into planning vs
  * execution and reports GC time and driver-thread counts, to identify
  * WHAT the leftover is (listener-bus/status-store bloat, GC pressure,
  * thread-pool creep). Usage: runMain graft.StreamTaxProbe [reps]
  *
  * RESOLUTION: this probe could NOT reproduce the tax sequentially —
  * which was the decisive clue. The mechanism was Bench's CONCURRENT
  * warm-up pool racing `withStreamShuffle`'s global set/restore and
  * stranding `spark.sql.shuffle.partitions=2` for the whole timed suite
  * (see QueryHelpers.withStreamShuffle and BASELINE.md round 15). The
  * probe stays as the template for the next suite-position-dependent
  * number: per-phase timing + GC + thread histograms, and the
  * SPARK_GRAFT_TAX_POOL env to replicate the pool (which also exposed
  * that StateStore.stop() mid-pool breaks in-flight streaming commits).
  */
object StreamTaxProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-streamtax")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def threads: Int = Thread.activeCount()
    def heapMb: Long = {
      val r = Runtime.getRuntime
      (r.totalMemory() - r.freeMemory()) / (1 << 20)
    }

    def q309(label: String): Unit = {
      (1 to 3).foreach { i =>
        val g0 = gcMs
        val t0 = System.nanoTime()
        val df = SparkEntry.queries("q309_sla_order_stats")(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis + optimization
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"[tax] $label run$i: build=${(t1 - t0) / 1e9}%.2f " +
          f"plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f " +
          f"gc=${gcMs - g0}ms threads=$threads heap=${heapMb}MB")
      }
    }

    def threadHistogram(): Unit = {
      val all = Thread.getAllStackTraces.keySet.asScala.toSeq
        .map(_.getName.replaceAll("[0-9]+", "#"))
        .groupBy(identity).view.mapValues(_.size).toSeq
        .sortBy(-_._2).take(12)
      println(s"[tax] threads: ${all.map { case (n, c) => s"$n=$c" }.mkString(" ")}")
    }

    val streamNames = Seq("q302_stream_window", "q305", "q306", "q307",
      "q310", "q322", "q323", "q325")
      .flatMap(p => SparkEntry.queries.keys.find(_.startsWith(p)))
    // warm-up q309 (codegen/JIT) before any streaming runs
    q309("baseline")
    if (sys.env.contains("SPARK_GRAFT_TAX_POOL")) {
      // reproduce Bench's pass 0: the 8-thread CONCURRENT warm-up pool
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      (streamNames :+ "q309_sla_order_stats").foreach { n =>
        pool.submit(new Runnable {
          def run(): Unit =
            try SparkEntry.queries(n)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            catch { case e: Throwable =>
              println(s"[tax] pool $n failed: ${e.getMessage}")
            }
        })
      }
      pool.shutdown()
      pool.awaitTermination(30, java.util.concurrent.TimeUnit.MINUTES)
      q309("afterPool")
      threadHistogram()
    }
    (1 to reps).foreach { r =>
      streamNames.foreach { n =>
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      q309(s"after${r}x${streamNames.size}stream")
      threadHistogram()
    }
    spark.stop()
  }
}
