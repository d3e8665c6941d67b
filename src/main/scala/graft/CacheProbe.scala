package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the r14 q309/q28 in-suite bench regression (VERDICT r14
  * "What's wrong" #1-2): isolated runs are ~0.9 s / ~1.4 s, in-suite ~3.9 s /
  * ~1.8 s with the query code unchanged since r13. Hypothesis: the suite's
  * accumulated `CacheManager` registry — Bench never clears the cache, so by
  * the timed passes hundreds of cached plans are registered and EVERY plan
  * compile calls `useCachedData`, which canonicalizes and compares each plan
  * subtree against every registry entry (O(entries x plan nodes) per query).
  * Queries with a `.cache()` + several consumers (q309) or wide multi-branch
  * plans (q28) pay the most.
  *
  * This main measures exactly that: time a target query with an EMPTY cache
  * registry, then with N dummy cached relations registered, same session.
  * Usage: runMain graft.CacheProbe [nDummies] [queryName...]
  *
  * RESOLUTION: hypothesis REFUTED — 300 registered entries changed q309 by
  * 0.82× (noise) and q28 by 0.99×. The real mechanism was the concurrent
  * warm-up pool racing the streaming rigs' global shuffle-width
  * set/restore; see QueryHelpers.withStreamShuffle and BASELINE.md round
  * 15. Kept as the template for pricing CacheManager-registry effects.
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val nDummies = args.headOption.map(_.toInt).getOrElse(300)
    val targets =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q309_sla_order_stats", "q28_simhash_neardup")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-cache-probe")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    targets.foreach { name =>
      spark.catalog.clearCache()
      run(name) // warm-up: codegen + JIT + footers, like Bench pass 0
      spark.catalog.clearCache()
      val cold = (1 to 3).map(_ => run(name)).min
      // register nDummies distinct cached relations (distinct literal ->
      // distinct canonicalized plans, like 300 different suite queries)
      (1 to nDummies).foreach { i =>
        spark.range(2).withColumn("tag", lit(i)).cache().count()
      }
      val loaded = (1 to 3).map(_ => run(name)).min
      println(f"[cacheprobe] $name: emptyRegistry=$cold%.2f s, " +
        f"${nDummies}Entries=$loaded%.2f s, ratio=${loaded / cold}%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
