package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{AviCodec, AviGen, DctHash, ImageGen, ImageResize}
import graft.operators.UnigramLm
import graft.plans.{AcAutomaton, AcRedact}
import org.apache.spark.unsafe.types.UTF8String

/** Round-15 operator semantics: the AVI video codec (container parse,
  * frame decode, orientation), Aho–Corasick leftmost-longest redaction,
  * unigram-LM training (DP-vs-enumeration equivalence), and the DCT
  * perceptual hash (resize exactness, brightness invariance). */
class Round15Spec extends SparkSpec {

  // ---------------- AVI codec ----------------

  test("AviCodec.decodeMeta reads avih header fields and the byte-size closed form holds") {
    val avi = AviGen.rampAvi(24, 20, 1, 2, 5, 4, 7)
    val m = AviCodec.decodeMeta(42L, avi, "video")
    assert((m.width, m.height, m.n_frames) === ((24, 20, 4)))
    assert(m.n_bytes === avi.length.toLong)
    assert(m.n_bytes === AviGen.aviBytes(24, 20, 4))
  }

  test("AviCodec.frameStats matches the generation lattice and pins bottom-up orientation") {
    val (w, h, dx, dy, c, nF, step) = (16, 16, 2, 1, 9, 5, 7)
    val avi = AviGen.rampAvi(w, h, dx, dy, c, nF, step)
    val (n, ns, sum, p00) = AviCodec.frameStats(7L, avi, 2)
    assert(n === nF)
    assert(ns === 3) // frames 0, 2, 4
    val expected = (for {
      f <- 0 until nF if f % 2 == 0
      x <- 0 until w; y <- 0 until h
    } yield (dx * x + dy * y + step * f + c).toLong).sum
    assert(sum === expected)
    // top-left of frame 0 is c — a flipped (top-down) reader would report
    // dy*(h-1)+c here instead
    assert(p00 === c.toLong)
    assert(p00 !== (dy * (h - 1) + c).toLong)
  }

  test("AviCodec handles non-multiple-of-4 rows (stride padding) and sampleEvery=1") {
    // w=6 -> 18-byte rows pad to stride 20; exercises the general path
    val avi = AviGen.rampAvi(6, 4, 1, 1, 0, 2, 3)
    val (n, ns, sum, _) = AviCodec.frameStats(1L, avi, 1)
    assert((n, ns) === ((2, 2)))
    val expected = (for { f <- 0 until 2; x <- 0 until 6; y <- 0 until 4 }
      yield (x + y + 3 * f).toLong).sum
    assert(sum === expected)
  }

  test("AviCodec.encodeFeature is an L2-normalized all-frame luminance histogram") {
    val avi = AviGen.rampAvi(16, 16, 1, 1, 0, 3, 7)
    val f = AviCodec.encodeFeature(3L, avi, "video", 16)
    val norm = math.sqrt(f.embedding.map(v => v.toDouble * v).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("AviCodec rejects non-RIFF payloads loudly") {
    val ex = intercept[IllegalArgumentException] {
      AviCodec.decodeMeta(9L, Array.fill[Byte](64)(0x2a), "video")
    }
    assert(ex.getMessage.contains("not a RIFF/AVI"))
  }

  // ---------------- Aho–Corasick redaction ----------------

  private def redact(text: String, pats: Seq[String], mask: String = "[X]"): String =
    AcAutomaton(pats.map(_.getBytes("UTF-8")).toArray)
      .redact(UTF8String.fromString(text), mask.getBytes("UTF-8")).toString

  test("AcRedact picks the longest pattern at the leftmost start") {
    val pats = Seq("scrub zebra card", "scrub zebra", "zebra card")
    assert(redact("a scrub zebra card b", pats) === "a [X] b")
    assert(redact("a scrub zebra late b", pats) === "a [X] late b")
    assert(redact("a zebra card b", pats) === "a [X] b")
  }

  test("AcRedact leftmost wins over longer-but-later; scan resumes after the match") {
    // "xa" starts first; the overlapping "ab" must NOT also fire
    assert(redact("xabz", Seq("ab", "xa")) === "[X]bz")
    // non-overlapping greedy: second occurrence after the first match ends
    assert(redact("ababab", Seq("abab")) === "[X]ab")
  }

  test("AcRedact: a mask containing a pattern cannot cascade") {
    assert(redact("see ab here", Seq("ab"), mask = "ab!") === "see ab! here")
  }

  test("AcRedact returns the input unchanged (and same content) when nothing matches") {
    assert(redact("nothing here", Seq("zebra")) === "nothing here")
  }

  test("AcRedact is byte-exact around multi-byte UTF-8 neighbours") {
    assert(redact("héllo zebra wörld", Seq("zebra")) === "héllo [X] wörld")
  }

  test("AcRedact expression survives serialization (executor shipping)") {
    val ac = AcAutomaton(Array("ab".getBytes("UTF-8"), "bc".getBytes("UTF-8")))
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos); oos.writeObject(ac); oos.close()
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val ac2 = in.readObject().asInstanceOf[AcAutomaton]
    assert(ac2.redact(UTF8String.fromString("xabc"), "_".getBytes).toString === "x_c")
    assert(ac2.countDistinct(UTF8String.fromString("ab bc")) === 2)
  }

  test("AcRedact runs inside a Spark plan (codegen path)") {
    val sp = spark
    import sp.implicits._
    val out = Seq("a zebra b", "clean").toDF("t")
      .select(AcRedact.acRedact(col("t"), Seq("zebra"), "[X]").as("r"))
      .as[String].collect().toSeq
    assert(out === Seq("a [X] b", "clean"))
  }

  // ---------------- Unigram LM ----------------

  private def enumerateBest(word: String, cost: Map[String, Long]): Option[(Long, Int)] = {
    val n = word.length
    val masks = 0 until (1 << (n - 1))
    val valid = masks.flatMap { m =>
      val cuts = 0 +: (1 until n).filter(i => ((m >> (i - 1)) & 1) == 1) :+ n
      val pieces = cuts.sliding(2).map(c => word.substring(c(0), c(1))).toSeq
      if (pieces.forall(cost.contains)) Some((pieces.map(cost).sum, m)) else None
    }
    if (valid.isEmpty) None else Some(valid.min)
  }

  test("UnigramLm.viterbi equals brute-force (cost, mask) enumeration") {
    val cost = Map("a" -> 50L, "b" -> 60L, "c" -> 70L, "ab" -> 80L,
      "bc" -> 80L, "abc" -> 200L, "ca" -> 10L, "abca" -> 90L)
    for (w <- Seq("abc", "abca", "abcabc", "cabcab", "aaaa", "cacaca", "bbb")) {
      val dp = UnigramLm.viterbi(w, cost, 4).map(r => (r._1, r._2))
      assert(dp === enumerateBest(w, cost), s"word $w")
    }
  }

  test("UnigramLm.viterbi mask tie-break is deterministic on equal costs") {
    // "ab"+"c" and "a"+"bc" tie at 100: masks 2 and 1 -> pick mask 1
    val cost = Map("a" -> 40L, "b" -> 99L, "c" -> 60L, "ab" -> 40L, "bc" -> 60L)
    val r = UnigramLm.viterbi("abc", cost, 4).get
    assert((r._1, r._2, r._3) === ((100L, 1, List("a", "bc"))))
  }

  test("UnigramLm.viterbi returns None on unknown characters; segmentWords falls back per-char") {
    val sp = spark
    import sp.implicits._
    val cost = Map("a" -> 1L)
    assert(UnigramLm.viterbi("ax", cost, 4).isEmpty)
    val out = UnigramLm.segmentWords(
      Seq(("aa", 3L), ("ax", 2L)).toDF("word", "freq"), cost, 4)
      .orderBy("word").as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("aa", 3L, 2L), ("ax", 2L, 2L)))
  }

  test("UnigramLm.train keeps all single chars, drops unused multi-char pieces") {
    val sp = spark
    import sp.implicits._
    val vocab = Seq(("abab", 10L), ("ab", 5L)).toDF("word", "freq")
    val out = UnigramLm.train(vocab, maxPieceLen = 3, topSubs = 10, rounds = 2)
    val pieces = out.map(_._1).toSet
    assert(Set("a", "b").subsetOf(pieces))
    // "ab" dominates: Viterbi segments both words into "ab" pieces, so
    // counts concentrate there and singles floor at 1
    val byPiece = out.map(p => p._1 -> p._2).toMap
    assert(byPiece("ab") === 25L) // 2*10 + 5
    assert(byPiece("a") === 1L && byPiece("b") === 1L)
  }

  // ---------------- DCT pHash ----------------

  test("DctHash: an image and its area-resized variant hash identically") {
    for (id <- Seq(0L, 5L, 11L)) {
      val p = 4 << (id % 4).toInt
      val ph = ((id / 4) % 2).toInt
      val c = ((id % 5) * 8).toInt
      val a = ImageGen.checkerPng(64, 64, p, ph, 16 + c, 112)
      val b = ImageGen.grayPng(32, 32, ImageResize.areaResize(id, a, 32, 32))
      assert(DctHash.hashBits(id, a) === DctHash.hashBits(id, b), s"id $id")
    }
  }

  test("DctHash is exactly brightness-invariant on the checker lattice") {
    val h0 = DctHash.hashBits(0L, ImageGen.checkerPng(64, 64, 8, 0, 16, 112))
    val h1 = DctHash.hashBits(0L, ImageGen.checkerPng(64, 64, 8, 0, 48, 112))
    assert(h0 === h1)
  }

  test("DctHash separates checker periods (content classes)") {
    val h4 = DctHash.hashBits(0L, ImageGen.checkerPng(64, 64, 4, 0, 16, 112))
    val h32 = DctHash.hashBits(0L, ImageGen.checkerPng(64, 64, 32, 0, 16, 112))
    assert(h4 !== h32)
    assert(h4.length === 64 && h4.forall(ch => ch == '0' || ch == '1'))
  }

  test("DctHash basis row sums: odd rows exactly zero (shift-invariance witness)") {
    for (u <- 1 until 8 by 2)
      assert(DctHash.basis(u).sum === 0L, s"row $u")
  }

  // ---------------- video pHash (q340 machinery) ----------------

  test("checkerAvi frames decode to the generation lattice via the sampled-raster hook") {
    val avi = AviGen.checkerAvi(16, 16, 4, 1, 20, 100, 3)
    var seen = List.empty[Int]
    AviCodec.foreachSampledFrameRaster(7L, avi, 2) { (f, w, h, r) =>
      seen ::= f
      assert((w, h) === ((16, 16)))
      for (x <- 0 until 16; y <- 0 until 16)
        assert(r(y * 16 + x) === (20 + 100 * ((x / 4 + y / 4 + 1 + f) % 2)).toLong,
          s"frame $f pixel ($x,$y)")
    }
    assert(seen.reverse === List(0, 2))
  }

  test("video frame hash: a 64x64 frame and its half-resolution variant hash identically") {
    // 2x2 area-average of a period-p checker == the period-p/2 checker
    for ((p, ph, b0) <- Seq((4, 0, 16), (8, 1, 48), (32, 1, 24))) {
      val a = AviGen.checkerAvi(64, 64, p, ph, b0, 112, 2)
      val b = AviGen.checkerAvi(32, 32, p / 2, ph, b0, 112, 2)
      def hashes(avi: Array[Byte]) = {
        val out = scala.collection.mutable.ArrayBuffer[String]()
        AviCodec.foreachSampledFrameRaster(1L, avi, 1) { (_, w, h, r) =>
          out += DctHash.hashOfRaster(1L, r, w, h)
        }
        out.toSeq
      }
      assert(hashes(a) === hashes(b), s"class ($p,$ph,$b0)")
    }
  }

  test("hashOfRaster 32-divisibility guard fails loudly") {
    val ex = intercept[IllegalArgumentException] {
      DctHash.hashOfRaster(5L, new Array[Long](48 * 48), 48, 48)
    }
    assert(ex.getMessage.contains("divisible by 32"))
  }
}
