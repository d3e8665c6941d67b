package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Round-17 optimization profiler (guide §1: measure first): for each
  * query, one untimed warm-up then `reps` timed noop-sink runs, while a
  * listener counts the STRUCTURAL overhead the wall numbers hide at
  * sf0.1 — Spark jobs launched, stages run, tasks run, and executor task
  * time — so structural outliers (driver round trips, serial tiny jobs,
  * shuffle stages that exist only for layout) are visible in one table.
  * Usage: runMain graft.OptProf <sfDir> [reps] [q...]
  */
object OptProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(2)
    val rest = args.drop(if (args.length > 1 && scala.util.Try(args(1).toInt).isSuccess) 2 else 1)
    val names = if (rest.nonEmpty) rest.toSeq else SparkEntry.queries.keys.toSeq
    val builder = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-optprof")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false")
    // ad-hoc conf experiments: SPARK_GRAFT_CONF="k=v;k2=v2" (guide §1.2:
    // configuration is step 3 — measure it like everything else)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) taskMs.addAndGet(t.taskMetrics.executorRunTime)
      }
    })
    def run(n: String): Unit =
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
    println("query\twall_s\tjobs\tstages\ttasks\ttask_s")
    names.foreach { n =>
      try {
        run(n) // warm-up: Janino/JIT/footers, untimed
        val walls = (1 to reps).map { _ =>
          // settle the listener bus so counts attribute to this rep
          Thread.sleep(150)
          jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
          val t0 = System.nanoTime()
          run(n)
          (System.nanoTime() - t0) / 1e9
        }
        Thread.sleep(150)
        println(f"$n\t${walls.min}%.3f\t${jobs.get}\t${stages.get}\t${tasks.get}\t${taskMs.get / 1000.0}%.1f")
      } catch {
        case e: Throwable => println(s"$n\tFAILED\t${e.getMessage}")
      }
    }
    spark.stop()
  }
}
