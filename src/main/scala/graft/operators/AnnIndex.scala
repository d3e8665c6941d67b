package graft.operators

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** Persist-and-reuse IVFADC index (Jégou et al. 2011 §IV): a real 100 TB
  * ANN deployment fits its quantizers ONCE, writes the artifact, and serves
  * every query from the stored index — it never re-runs Lloyd per query
  * batch (which is what the inline q114/q115 fixtures do for
  * oracle-determinism). This operator splits the lifecycle:
  *
  *  - [[build]] fits the coarse quantizer + per-subspace PQ codebooks
  *    (KMeansOp.fit, concurrent driver threads — q115's shape), encodes
  *    the corpus, and writes TWO parquet tables under `dir`:
  *      `centroids` (kind, cid, c)  — k×dim rows per quantizer, driver-tiny
  *      `codes`     (vec_id, cell, code0..code{nSub-1}) — one row per
  *                   corpus vector, the 100 TB-side artifact (nSub bytes of
  *                   payload per vector; partition/bucket by `cell` at
  *                   scale so a probe reads only its cells)
  *  - [[query]] loads `centroids` (bounded collect: quantizer matrices are
  *    driver-state by design), wraps them in [[graft.plans.CentMatrix]]
  *    (broadcast above the size threshold), and runs the probe dataflow
  *    against `codes` — ZERO Lloyd iterations, zero aggregates in the
  *    plan (Round11Spec asserts this), and the corpus embeddings table is
  *    never touched.
  *
  * Built from the same deterministic fits as q115, a build+query round
  * trip reproduces q115's answers exactly — q123 puts that under the
  * oracle hash gate.
  */
object AnnIndex {

  /** Index geometry; defaults mirror the q115 oracle fixture. */
  case class Params(nSub: Int = 4, subDim: Int = 16, kCoarse: Int = 4,
      kCode: Int = 4, iters: Int = 2)

  /** Fit quantizers on `e`, encode it, write `dir/centroids` + `dir/codes`. */
  def build(e: DataFrame, id: Column, vec: Column, dir: String,
      p: Params = Params()): Unit = {
    val spark = e.sparkSession
    val coarseF = Future(KMeansOp.fit(e, id, vec, k = p.kCoarse, iters = p.iters))
    val fitsF = Future.sequence((0 until p.nSub).map { m => Future {
      KMeansOp.fit(
        e, id, slice(vec, m * p.subDim + 1, p.subDim), k = p.kCode, iters = p.iters)._1
    }})
    val (coarse, base) = Await.result(coarseF, Duration.Inf)
    val fits = Await.result(fitsF, Duration.Inf)

    val centRows =
      coarse.zipWithIndex.map { case (c, i) => Row("coarse", i, c.toSeq) } ++
      fits.zipWithIndex.flatMap { case (cents, m) =>
        cents.zipWithIndex.map { case (c, i) => Row(s"sub$m", i, c.toSeq) } }
    val centSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("kind", org.apache.spark.sql.types.StringType, false),
      org.apache.spark.sql.types.StructField("cid", org.apache.spark.sql.types.IntegerType, false),
      org.apache.spark.sql.types.StructField("c",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, false), false)))
    // centroids and codes are independent outputs of the completed fits —
    // write them concurrently (round 17, guide §2.6)
    val centW = Future(
      spark.createDataFrame(spark.sparkContext.parallelize(centRows.toSeq, 1), centSchema)
        .write.mode("overwrite").parquet(s"$dir/centroids"))

    // cell-partitioned layout: each coarse cell is its own directory, so
    // the query path's probe join can DYNAMICALLY PRUNE to the probed
    // cells — at a production k the probe reads nProbe/k of the artifact
    // from storage instead of scanning every code file.
    //
    // Encode in ONE row-local pass (round 17, guide §2.4): cell and every
    // code_m are argmins of the SAME row's vector against driver-held
    // centroid matrices — [[append]] always encoded this way; build
    // previously joined five per-fit projections on vec_id (four corpus
    // joins whose only product was column concatenation). Bit-identical:
    // slice(toDouble(vec)) ≡ toDouble(slice(vec)) element-wise and the
    // argmin arithmetic is the same native expression.
    val (cellCol, _) = KMeansOp.argmin(col("v"),
      graft.plans.AnnNative.matrix(spark, coarse))
    val encoded = (0 until p.nSub).foldLeft(
        base.select(col("id").as("vec_id"), col("v"))
          .withColumn("cell", cellCol.cast("int"))) { (d, m) =>
      val (cl, _) = KMeansOp.argmin(
        slice(col("v"), m * p.subDim + 1, p.subDim),
        graft.plans.AnnNative.matrix(spark, fits(m)))
      d.withColumn(s"code$m", cl.cast("int"))
    }
    encoded
      .select(col("vec_id") +: (0 until p.nSub).map(m => col(s"code$m")) :+ col("cell"): _*)
      .write.partitionBy("cell").mode("overwrite").parquet(s"$dir/codes")
    Await.result(centW, Duration.Inf)
  }

  /** Append a NEW batch to an existing index using the STANDING
    * quantizers — the ingest path: assign + encode with the stored
    * centroids (ZERO Lloyd iterations; the batch never triggers a refit)
    * and append the encoded rows to the cell-partitioned codes artifact.
    * This is q124's incremental contract applied to the stored index:
    * per-ingest cost is one argmin pass over the batch, independent of
    * corpus history; queries immediately see old + new rows. */
  def append(spark: SparkSession, dir: String, batch: DataFrame, id: Column,
      vec: Column, p: Params = Params()): Unit = {
    val stored = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def centsOf(kind: String): Seq[Array[Double]] =
      stored.filter(_._1 == kind).sortBy(_._2).map(_._3).toSeq
    val base = batch.select(id.as("vec_id"), VectorExprs.toDouble(vec).as("v"))
    val (cellCol, _) = KMeansOp.argmin(col("v"),
      graft.plans.AnnNative.matrix(spark, centsOf("coarse")))
    val encoded = (0 until p.nSub).foldLeft(
        base.withColumn("cell", cellCol.cast("int"))) { (d, m) =>
      val (cl, _) = KMeansOp.argmin(
        slice(col("v"), m * p.subDim + 1, p.subDim),
        graft.plans.AnnNative.matrix(spark, centsOf(s"sub$m")))
      d.withColumn(s"code$m", cl.cast("int"))
    }
    encoded
      .select(col("vec_id") +: (0 until p.nSub).map(m => col(s"code$m")) :+ col("cell"): _*)
      .write.partitionBy("cell").mode("append").parquet(s"$dir/codes")
  }

  /** Compact the cell-partitioned codes artifact: every cell whose parquet
    * fragment count exceeds `maxFragments` is rewritten into ONE fragment —
    * content-identical, zero refit, untouched cells keep their files. The
    * maintenance pass of the [[append]] ingest loop: each append lands one
    * file per written cell, and after enough batches the probe path pays a
    * small-file open per fragment instead of a streaming scan. Rewrites go
    * to a temp dir first and swap in via rename, so a concurrent reader
    * never observes a half-written cell; per-cell work is bounded by that
    * cell's rows and the directory listing by the coarse k — never the
    * corpus. Returns the compacted cell ids. */
  def compact(spark: SparkSession, dir: String, maxFragments: Int = 4): Seq[Int] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val codes = new Path(s"$dir/codes")
    def fragments(p: Path): Int =
      fs.listStatus(p).count(f => f.getPath.getName.endsWith(".parquet"))
    val over = fs.listStatus(codes)
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("cell="))
      .filter(d => fragments(d.getPath) > maxFragments)
      .map(_.getPath.getName.stripPrefix("cell=").toInt).toSeq.sorted
    if (over.nonEmpty) {
      val tmp = new Path(s"$dir/codes_compacting")
      fs.delete(tmp, true)
      // hash-repartition on the partition column: every row of a cell
      // lands in one task, so each rewritten cell is exactly one fragment
      spark.read.parquet(s"$dir/codes")
        .where(col("cell").isin(over.map(Integer.valueOf): _*))
        .repartition(col("cell"))
        .write.partitionBy("cell").mode("overwrite").parquet(tmp.toString)
      over.foreach { c =>
        val live = new Path(codes, s"cell=$c")
        fs.delete(live, true)
        fs.rename(new Path(tmp, s"cell=$c"), live)
      }
      fs.delete(tmp, true)
    }
    over
  }

  /** Load the stored quantizers and serve `queries` (query_id, qv) —
    * top-k by ADC over the nProbe probed cells. No fit, no corpus scan. */
  def query(spark: SparkSession, dir: String, queries: DataFrame, k: Int,
      nProbe: Int, p: Params = Params()): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stored = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def matOf(kind: String): graft.plans.CentMatrix =
      graft.plans.AnnNative.matrix(spark,
        stored.filter(_._1 == kind).sortBy(_._2).map(_._3).toSeq)
    val coarse = matOf("coarse")
    val subs = (0 until p.nSub).map(m => matOf(s"sub$m"))
    require(coarse.numRows == p.kCoarse,
      s"index at $dir has ${coarse.numRows} coarse cells, params say ${p.kCoarse}")
    val codes = spark.read.parquet(s"$dir/codes")
    // ‖q‖² is constant per query — computed ONCE on the query row, before
    // the probe explode, never per candidate; and the probe side sheds the
    // raw qv once the LUTs are built, so the (broadcast) join input is
    // (query_id, cell, nSub luts, one scalar), not dim-wide vectors.
    val probed = queries
      .select(col("query_id"), col("qv"),
        VectorExprs.dot(col("qv"), col("qv")).as("_q2"),
        explode(graft.plans.AnnNative.argTopM(col("qv"), coarse, nProbe)).as("cell"))
      .select(Seq(col("query_id"), col("_q2"), col("cell")) ++
        (0 until p.nSub).map { m =>
          graft.plans.AnnNative.adcLut(col("qv"), subs(m), m * p.subDim).as(s"_lut$m")
        }: _*)
    val lutSum = (0 until p.nSub).map(m =>
      element_at(col(s"_lut$m"), col(s"code$m") + 1)).reduce(_ + _)
    // the CODES table is the 100 TB side — it must STREAM while the
    // (queries × nProbe)-row probe set broadcasts; without the hint AQE
    // broadcasts whichever measures smaller, which at fixture scale is
    // the codes table (the wrong-at-scale shape). With the probe side
    // broadcast, the join key IS the artifact's partition column, so
    // dynamic partition pruning drops every unprobed cell directory from
    // the scan (Round11Spec asserts the pruning subquery in the plan).
    codes.join(broadcast(probed), "cell")
      .select(col("query_id"), col("vec_id").as("corpus_id"),
        round(col("_q2") + lutSum, 6).as("adc"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc").asc, col("corpus_id").asc))
        .cast("long"))
      .where(col("rnk") <= k)
  }
}
