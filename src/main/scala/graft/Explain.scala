package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: time + explain named SparkEntry queries.
  * Usage: runMain graft.Explain <sfDir> <q1,q2,...|all> [--explain] [--reps N]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names: Seq[String] =
      if (args(1) == "all") SparkEntry.queries.keys.toSeq else args(1).split(",").toSeq
    val doExplain = args.contains("--explain")
    val reps = args.indexOf("--reps") match {
      case -1 => 1; case i => args(i + 1).toInt
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val doScans = args.contains("--scans")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (doExplain) fn(spark, sfDir).explain("formatted")
      if (doScans) {
        // per-table FileScan census of the FINAL adaptive plan — re-scan
        // regressions (e.g. column pruning silently defeating exchange
        // reuse across unrolled iterations) show up here as outliers
        try {
          val df = fn(spark, sfDir)
          df.collect()
          val fin = df.queryExecution.executedPlan.toString
          val counts = "(\\w+)\\.parquet".r.findAllMatchIn(fin)
            .map(_.group(1)).toSeq.groupBy(identity).view.mapValues(_.size)
            .toSeq.sortBy(-_._2)
          println(s"[scans] $name ${counts.map { case (t, n) => s"$t=$n" }.mkString(" ")}")
        } catch { case e: Throwable => println(s"[scans] $name ERR ${e.getMessage}") }
      }
      if (!doScans) (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[time] $name rep$r ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
