package graft.queries

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.{AudioGen, AudioIoCodec, AviCodec, AviGen, ImageGen, ImageIoCodec, Multimodal}
import graft.queries.QueryHelpers._

/** Multimodal decode on REAL media bytes: deterministic grayscale PNGs
  * (q300/q301) and 16-bit PCM WAVs (q319/q320) are synthesized per
  * document, decoded by the pure-JVM codecs ([[ImageIoCodec]] /
  * [[AudioIoCodec]] — header-only metadata, full-payload features), and
  * the decode results are hash-checked against DuckDB computing the SAME
  * values from the generation arithmetic (PNG and PCM are lossless, so
  * decoded payloads == generated payloads — the lexicon-twin pattern
  * applied to pixels and samples).
  *
  * The earlier q32/q41 keep the StubCodec path (video has no pure-JVM
  * decoder); these queries prove the SEAM carries real codecs unchanged. */
private[graft] object MultimodalQueries extends QueryBook {

  /** The slim per-doc id feed for the decode-bound stages, FANNED OUT
    * before the decode. The fixture's documents table is one small
    * parquet file = one row group = ONE scan split, so a mapPartitions
    * decode that inherits scan parallelism runs single-threaded no matter
    * how many cores exist (found round 16: q340 6.7 s at sf0.1 vs 3.4 s
    * at 10× the data, whose ScaleUp output has many files). Decode cost
    * here is per-ROW, not per-byte — a round-robin repartition of bare
    * ids (a shuffle of longs) buys full-width decode under ANY source
    * layout. The 100 TB posture is the same: payload-decode parallelism
    * must never be an accident of file splits. */
  private def docIds(s: SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Long] = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id"))
      .repartition(s.sparkContext.defaultParallelism)
      .as[Long]
  }

  val queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(

    "q300_imageio_roundtrip" -> ((s, dir) => {
      // PNG encode → javax.imageio decode round trip, per document:
      // dimensions come from the HEADER-ONLY metadata pass and the
      // luminance sum from the full pixel decode; both must equal the
      // closed forms DuckDB derives from doc_id. Generation and pixel
      // decode share one executor-side pass (no payload shuffle — at
      // 100 TB the bytes never leave the partition that decoded them);
      // only the slim (doc_id, lum) manifest joins the metadata.
      import s.implicits._
      val media = docIds(s, dir)
        .mapPartitions(_.map { id =>
          val w = (32 + id % 97).toInt
          val h = (32 + (id * 31) % 97).toInt
          val png = ImageGen.gradientPng(w, h)
          (id, png, "image", ImageIoCodec.luminanceSum(id, png))
        }).toDF("doc_id", "payload", "kind", "lum")
        .localCheckpoint() // one generation+decode pass feeds both sides
      val meta = Multimodal.decodeMeta(
        media.select("doc_id", "payload", "kind"), ImageIoCodec).toDF()
      meta.join(media.select("doc_id", "lum"), Seq("doc_id"))
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"),
          col("lum").as("pixel_sum"),
          (col("n_bytes") > 57L).as("png_valid")) // 57 B = minimal PNG
    }),

    "q301_imageio_histogram" -> ((s, dir) => {
      // Full-pixel feature extraction through the codec seam: the
      // 16-bucket luminance histogram of each decoded PNG, reported as
      // its modal bucket (argmax, ties to the lowest index — argmax is
      // invariant under the feature's L2 normalization). DuckDB
      // recomputes the histogram from the generation lattice
      // (x + y over w×h), so a single mis-decoded pixel flips the gate.
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val w = (32 + id % 97).toInt
          val h = (32 + (id * 31) % 97).toInt
          val png = ImageGen.gradientPng(w, h)
          val emb = ImageIoCodec.encodeFeature(id, png, "image", 16).embedding
          var best = 0
          var i = 1
          while (i < emb.length) { if (emb(i) > emb(best)) best = i; i += 1 }
          (id, best.toLong, (w.toLong * h) )
        }).toDF("doc_id", "modal_bucket", "n_pixels")
    }),

    "q319_audio_meta" -> ((s, dir) => {
      // WAV encode → javax.sound header decode, per document — the audio
      // twin of q300 (the last offline-closable modality made real, r14).
      // Metadata comes from the HEADER-ONLY pass (AudioSystem.
      // getAudioFileFormat never reads sample data — at 100 TB a metadata
      // sweep reads RIFF headers, not payloads); every field must equal
      // the closed forms DuckDB derives from doc_id. Generation and decode
      // share one executor-side pass: payload bytes never leave the
      // partition that built them, only the slim metadata rows move.
      import s.implicits._
      val media = docIds(s, dir)
        .mapPartitions(_.map { id => (id, AudioGen.pcmWav(id), "audio") })
        .toDF("doc_id", "payload", "kind")
      Multimodal.decodeMeta(media, AudioIoCodec).toDF()
        .select(col("doc_id"),
          col("width").cast("long").as("sample_rate_hz"),
          col("height").cast("long").as("channels"),
          col("n_frames").cast("long").as("n_frames"),
          col("n_bytes"),
          (col("n_bytes") > 44L).as("wav_valid")) // 44 B = canonical header
    }),

    "q320_audio_features" -> ((s, dir) => {
      // Full-PCM feature extraction through the codec seam — the audio
      // twin of q301: 16-bucket amplitude histogram of each decoded WAV,
      // reported as its modal bucket (argmax, ties to the lowest index —
      // invariant under the feature's L2 normalization) plus the exact
      // integer peak |amplitude|. PCM is lossless, so DuckDB recomputes
      // both from the generation arithmetic; one mis-decoded sample (or a
      // byte-order slip) flips the gate.
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val wav = AudioGen.pcmWav(id)
          val emb = AudioIoCodec.encodeFeature(id, wav, "audio", 16).embedding
          var best = 0
          var i = 1
          while (i < emb.length) { if (emb(i) > emb(best)) best = i; i += 1 }
          val n = (256 + id % 777) * (1 + id % 2)
          (id, best.toLong, AudioIoCodec.peakAbs(id, wav), n)
        }).toDF("doc_id", "modal_bucket", "peak_abs", "n_samples")
    }),

    "q333_audio_windowed" -> ((s, dir) => {
      // Windowed audio energy with frame sampling — the audio analog of
      // q332: decode the WAV, split interleaved samples into 64-sample
      // windows, sample every 2nd window, reduce to four integer scalars.
      // The twin replays the same modular sample formula with the same
      // window grouping; the ragged final window is part of the contract.
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val wav = AudioGen.pcmWav(id)
          val (nw, ns, tot, mx) =
            AudioIoCodec.windowedAbsStats(id, wav, window = 64, every = 2)
          (id, nw, ns, tot, mx)
        }).toDF("doc_id", "n_windows", "n_sampled", "sampled_abs_sum",
          "peak_window_sum")
    }),

    "q331_image_resize" -> ((s, dir) => {
      // Area-average resize through the real decode path — the brief's
      // resize step made integer-exact (multimodal.ImageResize): 32×32
      // ramps decode and floor-average into 8×8; the twin recomputes
      // every output pixel from the generation lattice with the same
      // floor division, so a single mis-pooled pixel flips the gate.
      // Only three scalars per image leave the partition.
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val dx = (1 + id % 2).toInt
          val dy = (1 + (id / 2) % 2).toInt
          val c = ((id % 5) * 8).toInt
          val png = ImageGen.rampPng(32, 32, dx, dy, c)
          val r = graft.multimodal.ImageResize.areaResize(id, png, 8, 8)
          (id, r(0), r(63), r.sum)
        }).toDF("doc_id", "r00", "r77", "r_sum")
    }),

    "q332_gif_frame_sample" -> ((s, dir) => {
      // Frame sampling over REAL multi-frame media — the video-shaped
      // operation the StubCodec could only fake, on the one multi-frame
      // container pure JVM decodes losslessly (animated GIF,
      // multimodal.GifCodec): count frames from the container, decode
      // every 2nd frame, sum sampled luminance. Payloads never shuffle;
      // the twin predicts each sampled frame's sum from the lattice.
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val dx = (1 + id % 2).toInt
          val dy = (1 + (id / 2) % 2).toInt
          val c = ((id % 4) * 8).toInt
          val nF = (3 + id % 4).toInt
          val gif = ImageGen.animatedRampGif(16, 16, dx, dy, c, nF, 7)
          val (n, ns, sum) = graft.multimodal.GifCodec.frameStats(id, gif, 2)
          (id, n.toLong, ns.toLong, sum)
        }).toDF("doc_id", "n_frames", "n_sampled", "sampled_sum")
    }),

    "q334_avi_meta" -> ((s, dir) => {
      // AVI header decode — REAL video through the codec seam, retiring the
      // last StubCodec modality: deterministic uncompressed BI_RGB AVIs are
      // synthesized per document (multimodal.AviGen; RIFF, the q319 WAV
      // container discipline) and metadata comes from the HEADER-ONLY avih
      // parse (AviCodec.decodeMeta walks chunk headers and never enters the
      // movi payload list — at 100 TB a metadata sweep reads a few hundred
      // bytes per payload). Every field, including the exact container byte
      // size, must equal the closed forms DuckDB derives from doc_id.
      import s.implicits._
      val media = docIds(s, dir)
        .mapPartitions(_.map { id =>
          val w = (16 + (id % 3) * 4).toInt
          val h = (16 + (id / 3) % 3 * 4).toInt
          val nF = (3 + id % 4).toInt
          (id, AviGen.rampAvi(w, h, 1, 1, 0, nF, 7), "video")
        }).toDF("doc_id", "payload", "kind")
      Multimodal.decodeMeta(media, AviCodec).toDF()
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames").cast("long").as("n_frames"),
          col("n_bytes"),
          (col("n_bytes") > 224L).as("avi_valid")) // 224 B = headers alone
    }),

    "q335_avi_frame_sample" -> ((s, dir) => {
      // Frame sampling over REAL video — the q332 GIF shape on the AVI
      // container (multimodal.AviCodec.frameStats): count frames from the
      // movi list, decode every 2nd BI_RGB frame (skipped frames are never
      // touched), reduce to four integer scalars. p00 (frame-0 top-left
      // luminance) pins the bottom-up DIB row-order decode: a flipped
      // reader reports dy·(h−1)+c instead of c and the oracle catches it.
      // Payloads never shuffle; the twin predicts each sampled frame's sum
      // from the generation lattice (BI_RGB is lossless).
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val dx = (1 + id % 2).toInt
          val dy = (1 + (id / 2) % 2).toInt
          val c = ((id % 5) * 8).toInt
          val nF = (3 + id % 4).toInt
          val avi = AviGen.rampAvi(16, 16, dx, dy, c, nF, 7)
          val (n, ns, sum, p00) = AviCodec.frameStats(id, avi, 2)
          (id, n.toLong, ns.toLong, sum, p00)
        }).toDF("doc_id", "n_frames", "n_sampled", "sampled_sum", "p00")
    }),

    "q329_image_neardup_hamming" -> ((s, dir) => {
      // Perceptual NEAR-dup pairs over aHash — the Hamming complement of
      // q330's exact grouping: distinct hashes band into 8×8-bit slices
      // for the candidate join (q28's pigeonhole discipline — EXACT for
      // hamming ≤ 7: any closer pair shares a zero-diff band), candidates
      // verify with a codegen'd two-half conv/xor/bit_count, and pairs
      // report at the GROUP grain (representative min ids + the image-
      // pair count n_a·n_b), so the pair volume is distinct-hash-bounded,
      // never image². Every fifth image carries a one-pixel spike whose
      // +40 at the origin flips exactly the borderline block bits —
      // near-miss hashes exist by construction, and the twin recomputes
      // them from the same lattice.
      import s.implicits._
      val hashes = docIds(s, dir)
        .mapPartitions(_.map { id =>
          val dx = (1 + id % 3).toInt
          val dy = (1 + (id / 3) % 3).toInt
          val c = ((id % 7) * 10).toInt
          val spike = if (id % 5 == 0) 40 else 0
          val png = ImageGen.rampPng(16, 16, dx, dy, c, spike)
          (id, graft.multimodal.ImagePHash.aHashBits(id, png))
        }).toDF("doc_id", "h")
      val groups = hashes.groupBy("h")
        .agg(count(lit(1)).as("n"), min("doc_id").as("gid"))
        .localCheckpoint() // consumers: band explode + two size joins
      val bands = groups.select(col("gid"), col("h"), explode(expr(
          "transform(sequence(0, 7), b -> struct(b AS b, " +
            "substring(h, b * 8 + 1, 8) AS bv))")).as("s"))
        .select(col("gid"), col("h"), col("s.b").as("b"), col("s.bv").as("bv"))
      def half(hc: String, off: Int) =
        s"CAST(conv(substring($hc, $off, 32), 2, 10) AS BIGINT)"
      val cand = bands.as("x").join(bands.as("y"), Seq("b", "bv"))
        .where(col("x.gid") < col("y.gid"))
        .select(col("x.h").as("ha"), col("x.gid").as("gid_a"),
          col("y.h").as("hb"), col("y.gid").as("gid_b"))
        .distinct()
      cand
        .withColumn("hamming", expr(
          s"bit_count(${half("ha", 1)} ^ ${half("hb", 1)}) + " +
            s"bit_count(${half("ha", 33)} ^ ${half("hb", 33)})").cast("long"))
        .where(col("hamming") <= 7)
        .join(groups.select(col("h").as("ha"), col("n").as("n_a")), "ha")
        .join(groups.select(col("h").as("hb"), col("n").as("n_b")), "hb")
        .select(col("gid_a"), col("gid_b"), col("hamming"),
          (col("n_a") * col("n_b")).as("n_image_pairs"))
    }),

    "q339_dct_phash_neardup" -> ((s, dir) => {
      // DCT pHash near-dup ACROSS RESIZED VARIANTS — the resize-robust
      // complement to q330's aHash (multimodal.DctHash): every document
      // contributes its 64×64 checkerboard (period+phase = content,
      // base = brightness) AND the 32×32 area-resized variant rendered
      // back to PNG, both hashed through the real decode path. pHash
      // canonicalizes scale first, so variant pairs land in ONE hash
      // group; brightness shifts move DC and median together (bits
      // unchanged — exact on this lattice). Banding: 16×4-bit slices,
      // pigeonhole-exact for hamming ≤ 15; pair volume is distinct-hash-
      // bounded (q329's discipline), never image². The twin recomputes
      // the hash at the content-class grain from the SAME integer DCT
      // basis literals (generated VALUES — the oracle never evaluates a
      // cosine).
      import s.implicits._
      val hashes = docIds(s, dir)
        .mapPartitions(_.flatMap { id =>
          val p = 4 << (id % 4).toInt
          val ph = ((id / 4) % 2).toInt
          val c = ((id % 5) * 8).toInt
          val a = ImageGen.checkerPng(64, 64, p, ph, 16 + c, 112)
          val rv = graft.multimodal.ImageResize.areaResize(id, a, 32, 32)
          val b = ImageGen.grayPng(32, 32, rv)
          Iterator((id * 2, graft.multimodal.DctHash.hashBits(id, a)),
            (id * 2 + 1, graft.multimodal.DctHash.hashBits(id, b)))
        }).toDF("vid", "h")
      val groups = hashes.groupBy("h")
        .agg(count(lit(1)).as("n"), min("vid").as("gid"))
        .localCheckpoint() // consumers: band explode + two size joins
      val bands = groups.select(col("gid"), col("h"), explode(expr(
          "transform(sequence(0, 15), b -> struct(b AS b, " +
            "substring(h, b * 4 + 1, 4) AS bv))")).as("s"))
        .select(col("gid"), col("h"), col("s.b").as("b"), col("s.bv").as("bv"))
      def half(hc: String, off: Int) =
        s"CAST(conv(substring($hc, $off, 32), 2, 10) AS BIGINT)"
      val cand = bands.as("x").join(bands.as("y"), Seq("b", "bv"))
        .where(col("x.gid") < col("y.gid"))
        .select(col("x.h").as("ha"), col("x.gid").as("gid_a"),
          col("y.h").as("hb"), col("y.gid").as("gid_b"))
        .distinct()
      cand
        .withColumn("hamming", expr(
          s"bit_count(${half("ha", 1)} ^ ${half("hb", 1)}) + " +
            s"bit_count(${half("ha", 33)} ^ ${half("hb", 33)})").cast("long"))
        .where(col("hamming") <= 15)
        .join(groups.select(col("h").as("ha"), col("n").as("n_a")), "ha")
        .join(groups.select(col("h").as("hb"), col("n").as("n_b")), "hb")
        .select(col("gid_a"), col("gid_b"), col("hamming"),
          (col("n_a") * col("n_b")).as("n_image_pairs"))
    }),

    "q340_video_phash_dedup" -> ((s, dir) => {
      // VIDEO near-dup dedup via sampled-frame perceptual hashes — the
      // composition the multimodal family exists for: every document
      // contributes a 64×64 phase-animated checker AVI AND its
      // half-resolution 32×32 variant (for even period ≥ 4, the 2×2
      // area-average of a period-p checker IS the period-p/2 checker —
      // closed-form resize, frame for frame), each decoded frame-by-frame
      // through the real RIFF/DIB path (AviCodec.foreachSampledFrameRaster)
      // and hashed with the scale-canonicalizing DCT pHash; the video
      // signature is the '-'-joined per-frame hash sequence. Variant
      // videos land in their original's group BY CONSTRUCTION of the
      // canonicalization — the q339 resize-robustness, lifted to video.
      // Payloads never shuffle; only the signature string moves. The twin
      // recomputes per-frame hashes at the (period, phase, base) FRAME-
      // CLASS grain and string_aggs the per-doc phase walk.
      import s.implicits._
      val sigs = docIds(s, dir)
        .mapPartitions(_.flatMap { id =>
          val p = 4 << (id % 4).toInt
          val ph0 = ((id / 4) % 2).toInt
          val b0 = (16 + (id % 5) * 8).toInt
          val nF = (2 + id % 3).toInt
          def sig(bytes: Array[Byte]): String = {
            val sb = new java.lang.StringBuilder
            AviCodec.foreachSampledFrameRaster(id, bytes, 1) { (_, w, h, r) =>
              if (sb.length > 0) sb.append('-')
              sb.append(graft.multimodal.DctHash.hashOfRaster(id, r, w, h))
            }
            sb.toString
          }
          Iterator(
            (id * 2, sig(AviGen.checkerAvi(64, 64, p, ph0, b0, 112, nF))),
            (id * 2 + 1, sig(AviGen.checkerAvi(32, 32, p / 2, ph0, b0, 112, nF))))
        }).toDF("vid", "sig")
      sigs.groupBy("sig")
        .agg(count(lit(1)).as("n_videos"), min("vid").as("min_vid"))
        .withColumn("n_frames_hashed",
          size(split(col("sig"), "-", -1)).cast("long"))
    }),

    "q343_crossmodal_dedup" -> ((s, dir) => {
      // CROSS-MODAL near-dup ADJUDICATION (VERDICT r15 gap #2): the dedup
      // decision an interleaved corpus needs — text near-dup evidence and
      // media near-dup evidence JOINED at the doc grain and rolled to the
      // conflict matrix. Text side: q198's machinery (blocked, distinct-
      // text-collapsed, edit-distance-verified pairs) marks the docs that
      // participate in ≥1 near-dup pair. Media side: q330's machinery —
      // each doc's PNG decoded through the real path, aHash group size > 1
      // marks a media dup. The matrix cells are the curation actions:
      // text+media (true duplicate — drop), text_only (same text, new
      // image — keep the media), media_only (same media, rewritten
      // caption — keep the text), unique. The corpus is INTERLEAVED the
      // way a crawl is — THREE modalities: the doc_id % 23 residue
      // carries an IMAGE (real-decode aHash, q330's machinery; the
      // dx, dy ∈ 1..5 lattice spreads carriers over ~19 ratio classes so
      // media singletons and groups both exist), the disjoint % 31
      // residue carries a VIDEO (real RIFF/DIB frame decode → per-frame
      // DCT pHash signature, q340's machinery), and the rest are
      // text-only rows (media_dup = false by definition). Media keys are
      // modality-prefixed so an image hash can never collide with a
      // video signature. Both sides are bucketed (text: 3-token-prefix
      // blocks; media: hash/signature groups) — no all-pairs anywhere,
      // and only flags and hash strings shuffle; payloads decode and die
      // executor-side.
      import s.implicits._
      val docs = t(s, dir, "documents")
      val pairs = graft.operators.Dedup.editDistNearDups(
        docs.where(col("n_chars") <= 512), col("doc_id"), col("text"),
        simThreshold = 0.8)
      val tdup = pairs.select(col("id_a").as("doc_id"))
        .unionAll(pairs.select(col("id_b").as("doc_id")))
        .distinct().withColumn("_t", lit(true))
      val img = docs.where(pmod(col("doc_id"), lit(23)) === 0)
        .select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism).as[Long]
        .mapPartitions(_.map { id =>
          val dx = (1 + id % 5).toInt
          val dy = (1 + (id / 5) % 5).toInt
          val c = ((id % 7) * 10).toInt
          (id, "i:" + graft.multimodal.ImagePHash.aHashBits(id,
            ImageGen.rampPng(16, 16, dx, dy, c)))
        }).toDF("doc_id", "mkey")
      val vid = docs.where(pmod(col("doc_id"), lit(31)) === 0 &&
          pmod(col("doc_id"), lit(23)) =!= 0)
        .select(col("doc_id")) // fan out like docIds: decode is per-row
        .repartition(s.sparkContext.defaultParallelism).as[Long]
        .mapPartitions(_.map { id =>
          val p = 4 << (id % 4).toInt
          val ph0 = ((id / 4) % 2).toInt
          val b0 = (16 + (id % 5) * 8).toInt
          val nF = (2 + id % 3).toInt
          val sb = new java.lang.StringBuilder("v:")
          AviCodec.foreachSampledFrameRaster(id,
            AviGen.checkerAvi(64, 64, p, ph0, b0, 112, nF), 1) { (_, w, h, r) =>
            if (sb.length > 2) sb.append('-')
            sb.append(graft.multimodal.DctHash.hashOfRaster(id, r, w, h))
          }
          (id, sb.toString)
        }).toDF("doc_id", "mkey")
      val media = img.unionAll(vid)
      val msize = media.groupBy("mkey").agg(count(lit(1)).as("_mn"))
      docs.select(col("doc_id"))
        .join(media.join(msize, "mkey"), Seq("doc_id"), "left")
        .join(tdup, Seq("doc_id"), "left")
        .select(col("mkey"),
          coalesce(col("_t"), lit(false)).as("_td"),
          coalesce(col("_mn") > 1, lit(false)).as("_md"))
        .select(col("mkey"),
          when(col("_td") && col("_md"), "text+media")
            .when(col("_td"), "text_only")
            .when(col("_md"), "media_only")
            .otherwise("unique").as("dup_class"))
        .groupBy("dup_class")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct("mkey").as("n_media_groups"))
    }),

    "q330_image_ahash_dedup" -> ((s, dir) => {
      // Perceptual-hash image dedup through the REAL decode path — the
      // multimodal family's missing dedup primitive (multimodal.
      // ImagePHash): 16×16 ramp PNGs with direction (dx, dy) as content
      // and c as a uniform brightness shift; aHash groups by direction
      // RATIO only (the block-vs-global-mean comparison is invariant to
      // both brightness shift and contrast scale — re-encode/levels
      // near-dups collapse, structural changes split). Hash is computed
      // from DECODED pixels executor-side (payload never shuffles; only
      // the 64-char hash moves); DuckDB recomputes it from the
      // generation lattice, so one mis-decoded pixel flips the gate.
      // n_brightness pins the invariance: every group must span all 7
      // brightness levels.
      import s.implicits._
      docIds(s, dir)
        .mapPartitions(_.map { id =>
          val dx = (1 + id % 3).toInt
          val dy = (1 + (id / 3) % 3).toInt
          val c = ((id % 7) * 10).toInt
          val png = ImageGen.rampPng(16, 16, dx, dy, c)
          (id, graft.multimodal.ImagePHash.aHashBits(id, png), id % 7)
        }).toDF("doc_id", "ahash_bits", "bright")
        .groupBy("ahash_bits")
        .agg(count(lit(1)).as("n_images"), min("doc_id").as("min_id"),
          countDistinct("bright").as("n_brightness"))
    }),
  )

  val oracleSql: ListMap[String, String] = ListMap(

    "q300_imageio_roundtrip" ->
      """WITH d AS (SELECT doc_id,
        |   32 + doc_id % 97 AS w, 32 + (doc_id * 31) % 97 AS h
        |  FROM documents)
        |SELECT doc_id, w AS width, h AS height,
        | CAST(1 AS BIGINT) AS n_frames,
        | h * (w * (w - 1) // 2) + w * (h * (h - 1) // 2) AS pixel_sum,
        | TRUE AS png_valid
        |FROM d""".stripMargin,

    "q301_imageio_histogram" ->
      """WITH d AS (SELECT doc_id,
        |   32 + doc_id % 97 AS w, 32 + (doc_id * 31) % 97 AS h
        |  FROM documents),
        |px AS (SELECT d.doc_id, (x.range + y.range) // 16 AS b,
        |   d.w * d.h AS np
        |  FROM d JOIN range(128) x ON x.range < d.w
        |   JOIN range(128) y ON y.range < d.h),
        |c AS (SELECT doc_id, b, np, count(*) AS n FROM px GROUP BY 1, 2, 3)
        |SELECT doc_id, CAST(b AS BIGINT) AS modal_bucket,
        | CAST(np AS BIGINT) AS n_pixels
        |FROM c
        |QUALIFY row_number() OVER (PARTITION BY doc_id
        |  ORDER BY n DESC, b ASC) = 1""".stripMargin,

    // closed forms of AudioGen.pcmWav: frames/channels/rate are direct
    // functions of doc_id; n_bytes = 44-byte canonical RIFF header + PCM
    "q319_audio_meta" ->
      """SELECT doc_id,
        | CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sample_rate_hz,
        | CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        | CAST(256 + doc_id % 777 AS BIGINT) AS n_frames,
        | CAST(44 + (256 + doc_id % 777) * (1 + doc_id % 2) * 2 AS BIGINT)
        |   AS n_bytes,
        | TRUE AS wav_valid
        |FROM documents""".stripMargin,

    // the generation arithmetic re-run sample-by-sample (AudioGen.sampleAt:
    // ((i*31153 + id*40503) % 65536) - 32768), bucketed to 16 amplitude
    // bins of width 4096 — PCM is lossless, so the decoded histogram must
    // match this exactly
    "q320_audio_features" ->
      """WITH d AS (SELECT doc_id,
        |   (256 + doc_id % 777) * (1 + doc_id % 2) AS n FROM documents),
        |sm AS (SELECT d.doc_id, d.n,
        |   ((i.range * 31153 + d.doc_id * 40503) % 65536) - 32768 AS amp
        |  FROM d JOIN range(2066) i ON i.range < d.n),
        |b AS (SELECT doc_id, n, (amp + 32768) // 4096 AS bkt,
        |   abs(amp) AS aa FROM sm),
        |c AS (SELECT doc_id, n, bkt, count(*) AS cnt FROM b GROUP BY 1, 2, 3),
        |p AS (SELECT doc_id, max(aa) AS peak FROM b GROUP BY 1)
        |SELECT c.doc_id, CAST(bkt AS BIGINT) AS modal_bucket,
        | CAST(peak AS BIGINT) AS peak_abs, CAST(n AS BIGINT) AS n_samples
        |FROM c JOIN p USING (doc_id)
        |QUALIFY row_number() OVER (PARTITION BY c.doc_id
        |  ORDER BY cnt DESC, bkt ASC) = 1""".stripMargin,

      // same modular sample formula, same 64-sample window grouping,
      // same every-2nd sampling; all operands non-negative so % agrees
      "q333_audio_windowed" ->
        """WITH ids AS (SELECT doc_id,
          |   CAST((256 + doc_id % 777) * (1 + doc_id % 2) AS BIGINT) AS n
          |  FROM documents),
          |sm AS (SELECT doc_id, i.range AS i,
          |   abs(((i.range * 31153 + doc_id * 40503) % 65536) - 32768) AS a
          |  FROM ids, range(2064) i WHERE i.range < n),
          |wd AS (SELECT doc_id, i // 64 AS w, sum(a) AS ws
          |  FROM sm GROUP BY 1, 2),
          |sw AS (SELECT doc_id, CAST(sum(ws) AS BIGINT) AS tot,
          |   CAST(count(*) AS BIGINT) AS ns, CAST(max(ws) AS BIGINT) AS mx
          |  FROM wd WHERE w % 2 = 0 GROUP BY 1)
          |SELECT i.doc_id, CAST((i.n + 63) // 64 AS BIGINT) AS n_windows,
          | sw.ns AS n_sampled, sw.tot AS sampled_abs_sum,
          | sw.mx AS peak_window_sum
          |FROM ids i JOIN sw ON i.doc_id = sw.doc_id""".stripMargin,

      // every resized pixel recomputed from the lattice with the SAME
      // floor division (bsum // 16) the decoder-side pooling applies
      "q331_image_resize" ->
        """WITH ids AS (SELECT doc_id, CAST(1 + doc_id % 2 AS BIGINT) AS dx,
          |   CAST(1 + (doc_id // 2) % 2 AS BIGINT) AS dy,
          |   CAST((doc_id % 5) * 8 AS BIGINT) AS c FROM documents),
          |blk AS (SELECT doc_id, px.range // 4 AS bi, py.range // 4 AS bj,
          |   sum(dx * px.range + dy * py.range + c) AS bsum
          |  FROM ids, range(32) px, range(32) py GROUP BY 1, 2, 3),
          |rp AS (SELECT doc_id, bi, bj, bsum // 16 AS v FROM blk)
          |SELECT doc_id,
          | CAST(max(CASE WHEN bi = 0 AND bj = 0 THEN v END) AS BIGINT) AS r00,
          | CAST(max(CASE WHEN bi = 7 AND bj = 7 THEN v END) AS BIGINT) AS r77,
          | CAST(sum(v) AS BIGINT) AS r_sum
          |FROM rp GROUP BY doc_id""".stripMargin,

      // per-sampled-frame sums predicted from the lattice (GIF palette is
      // exact for <= 256 distinct values, so decode == generation)
      "q332_gif_frame_sample" ->
        """WITH ids AS (SELECT doc_id, CAST(1 + doc_id % 2 AS BIGINT) AS dx,
          |   CAST(1 + (doc_id // 2) % 2 AS BIGINT) AS dy,
          |   CAST((doc_id % 4) * 8 AS BIGINT) AS c,
          |   CAST(3 + doc_id % 4 AS BIGINT) AS nf FROM documents),
          |fs AS (SELECT i.doc_id, f.range AS f,
          |   sum(i.dx * px.range + i.dy * py.range + 7 * f.range + i.c) AS s
          |  FROM ids i, range(6) f, range(16) px, range(16) py
          |  WHERE f.range < i.nf AND f.range % 2 = 0
          |  GROUP BY 1, 2)
          |SELECT i.doc_id, i.nf AS n_frames,
          | CAST(count(fs.f) AS BIGINT) AS n_sampled,
          | CAST(sum(fs.s) AS BIGINT) AS sampled_sum
          |FROM ids i JOIN fs ON i.doc_id = fs.doc_id
          |GROUP BY 1, 2""".stripMargin,

      // closed forms of AviGen.rampAvi's fixed RIFF layout: 224 header
      // bytes + nf frames of (8 B chunk header + 3·w·h DIB payload — the
      // stride is exactly 3w because w is a multiple of 4 here)
      "q334_avi_meta" ->
        """SELECT doc_id,
          | CAST(16 + (doc_id % 3) * 4 AS BIGINT) AS width,
          | CAST(16 + ((doc_id // 3) % 3) * 4 AS BIGINT) AS height,
          | CAST(3 + doc_id % 4 AS BIGINT) AS n_frames,
          | CAST(224 + (3 + doc_id % 4) *
          |   (8 + 3 * (16 + (doc_id % 3) * 4) * (16 + ((doc_id // 3) % 3) * 4))
          |   AS BIGINT) AS n_bytes,
          | TRUE AS avi_valid
          |FROM documents""".stripMargin,

      // per-sampled-frame sums predicted from the lattice (BI_RGB DIB is
      // lossless; R=G=B=v so BT.601 luma recovers v exactly); p00 = c pins
      // the bottom-up row-order decode
      "q335_avi_frame_sample" ->
        """WITH ids AS (SELECT doc_id, CAST(1 + doc_id % 2 AS BIGINT) AS dx,
          |   CAST(1 + (doc_id // 2) % 2 AS BIGINT) AS dy,
          |   CAST((doc_id % 5) * 8 AS BIGINT) AS c,
          |   CAST(3 + doc_id % 4 AS BIGINT) AS nf FROM documents),
          |fs AS (SELECT i.doc_id, f.range AS f,
          |   sum(i.dx * px.range + i.dy * py.range + 7 * f.range + i.c) AS s
          |  FROM ids i, range(6) f, range(16) px, range(16) py
          |  WHERE f.range < i.nf AND f.range % 2 = 0
          |  GROUP BY 1, 2)
          |SELECT i.doc_id, i.nf AS n_frames,
          | CAST(count(fs.f) AS BIGINT) AS n_sampled,
          | CAST(sum(fs.s) AS BIGINT) AS sampled_sum,
          | CAST(max(i.c) AS BIGINT) AS p00
          |FROM ids i JOIN fs ON i.doc_id = fs.doc_id
          |GROUP BY 1, 2""".stripMargin,

      // spiked-lattice hashes, all-pairs Hamming at the distinct-hash
      // grain (the oracle's license — the engine bands); hamming via a
      // per-position sum, a different method than the engine's
      // conv/xor/bit_count but the same integer
      "q329_image_neardup_hamming" ->
        """WITH ids AS (SELECT doc_id, CAST(1 + doc_id % 3 AS BIGINT) AS dx,
          |   CAST(1 + (doc_id // 3) % 3 AS BIGINT) AS dy,
          |   CAST((doc_id % 7) * 10 AS BIGINT) AS c,
          |   CAST(CASE WHEN doc_id % 5 = 0 THEN 40 ELSE 0 END AS BIGINT) AS sp
          |  FROM documents),
          |blk AS (SELECT doc_id, (py.range // 2) * 8 + (px.range // 2) AS b,
          |   sum(dx * px.range + dy * py.range + c
          |     + CASE WHEN px.range = 0 AND py.range = 0 THEN sp ELSE 0 END) AS bsum
          |  FROM ids, range(16) px, range(16) py GROUP BY 1, 2),
          |tot AS (SELECT doc_id, sum(bsum) AS tsum FROM blk GROUP BY 1),
          |bits AS (SELECT blk.doc_id, blk.b,
          |   CASE WHEN blk.bsum * 256 > tot.tsum * 4 THEN '1' ELSE '0' END AS v
          |  FROM blk JOIN tot ON blk.doc_id = tot.doc_id),
          |hs AS (SELECT doc_id, string_agg(v, '' ORDER BY b) AS h
          |  FROM bits GROUP BY doc_id),
          |g AS (SELECT h, CAST(count(*) AS BIGINT) AS n, min(doc_id) AS gid
          |  FROM hs GROUP BY h),
          |p AS (SELECT a.gid AS gid_a, b.gid AS gid_b,
          |   a.n * b.n AS n_image_pairs,
          |   list_sum(list_transform(range(1, 65), i ->
          |     CASE WHEN substr(a.h, CAST(i AS INT), 1)
          |       <> substr(b.h, CAST(i AS INT), 1) THEN 1 ELSE 0 END)) AS hm
          |  FROM g a JOIN g b ON a.gid < b.gid)
          |SELECT gid_a, gid_b, CAST(hm AS BIGINT) AS hamming,
          | CAST(n_image_pairs AS BIGINT) AS n_image_pairs
          |FROM p WHERE hm <= 7""".stripMargin,

      // the integer DCT hash recomputed at the CONTENT-CLASS grain (hash
      // depends only on (p, ph, c) — both variants of a doc canonicalize
      // to the same 32×32 raster): lattice → floor-average → separable
      // DCT against the generated basis literals → median-pair threshold
      // → bits; then the q329-style distinct-hash all-pairs Hamming
      "q339_dct_phash_neardup" ->
        s"""WITH ids AS (SELECT doc_id,
           |   CAST(4 << (doc_id % 4) AS BIGINT) AS p,
           |   CAST((doc_id // 4) % 2 AS BIGINT) AS ph,
           |   CAST((doc_id % 5) * 8 AS BIGINT) AS c FROM documents),
           |cls AS (SELECT DISTINCT p, ph, c FROM ids),
           |dctb(u, x, cv) AS (VALUES ${graft.multimodal.DctHash.basisSqlValues}),
           |pxr AS (SELECT p, ph, c, rx.range // 2 AS bi, ry.range // 2 AS bj,
           |   CAST(sum(16 + c + 112 * ((rx.range // p + ry.range // p + ph) % 2)) // 4
           |     AS BIGINT) AS val
           |  FROM cls, range(64) rx, range(64) ry GROUP BY 1, 2, 3, 4, 5),
           |t1 AS (SELECT p, ph, c, d.u, bj, sum(d.cv * val) AS tv
           |  FROM pxr JOIN dctb d ON d.x = bi GROUP BY 1, 2, 3, 4, 5),
           |dd AS (SELECT p, ph, c, t1.u, d2.u AS v, sum(d2.cv * tv) AS dv
           |  FROM t1 JOIN dctb d2 ON d2.x = bj GROUP BY 1, 2, 3, 4, 5),
           |med AS (SELECT p, ph, c, sum(dv) AS m FROM (
           |    SELECT p, ph, c, dv, row_number() OVER (PARTITION BY p, ph, c
           |      ORDER BY dv) AS rn FROM dd)
           |  WHERE rn IN (32, 33) GROUP BY 1, 2, 3),
           |bits AS (SELECT dd.p, dd.ph, dd.c, dd.u * 8 + dd.v AS b,
           |   CASE WHEN 2 * dd.dv > med.m THEN '1' ELSE '0' END AS bit
           |  FROM dd JOIN med ON dd.p = med.p AND dd.ph = med.ph
           |    AND dd.c = med.c),
           |hs AS (SELECT p, ph, c, string_agg(bit, '' ORDER BY b) AS h
           |  FROM bits GROUP BY 1, 2, 3),
           |vids AS (SELECT i.doc_id * 2 + v.range AS vid, h.h
           |  FROM ids i JOIN hs h ON h.p = i.p AND h.ph = i.ph AND h.c = i.c,
           |   range(2) v),
           |g AS (SELECT h, CAST(count(*) AS BIGINT) AS n, min(vid) AS gid
           |  FROM vids GROUP BY h),
           |pp AS (SELECT a.gid AS gid_a, b.gid AS gid_b,
           |   a.n * b.n AS n_image_pairs,
           |   list_sum(list_transform(range(1, 65), i ->
           |     CASE WHEN substr(a.h, CAST(i AS INT), 1)
           |       <> substr(b.h, CAST(i AS INT), 1) THEN 1 ELSE 0 END)) AS hm
           |  FROM g a JOIN g b ON a.gid < b.gid)
           |SELECT gid_a, gid_b, CAST(hm AS BIGINT) AS hamming,
           | CAST(n_image_pairs AS BIGINT) AS n_image_pairs
           |FROM pp WHERE hm <= 15""".stripMargin,

      // per-frame hashes recomputed at the (period, phase, base) frame-
      // class grain on the 32×32 closed-form-resized lattice (uniform
      // 2×2 blocks ⇒ the area-average is exact, no floor loss), then the
      // per-doc phase walk string_agg'd; both variants share the sig
      "q340_video_phash_dedup" ->
        s"""WITH ids AS (SELECT doc_id,
           |   CAST(4 << (doc_id % 4) AS BIGINT) AS p,
           |   CAST((doc_id // 4) % 2 AS BIGINT) AS ph0,
           |   CAST(16 + (doc_id % 5) * 8 AS BIGINT) AS b0,
           |   CAST(2 + doc_id % 3 AS BIGINT) AS nf FROM documents),
           |fcls AS (SELECT DISTINCT p, ph.range AS ph, b0
           |  FROM (SELECT DISTINCT p, b0 FROM ids), range(2) ph),
           |dctb(u, x, cv) AS (VALUES ${graft.multimodal.DctHash.basisSqlValues}),
           |pxr AS (SELECT p, ph, b0, rx.range AS bi, ry.range AS bj,
           |   b0 + 112 * ((rx.range // (p // 2) + ry.range // (p // 2) + ph) % 2)
           |     AS val
           |  FROM fcls, range(32) rx, range(32) ry),
           |t1 AS (SELECT p, ph, b0, d.u, bj, sum(d.cv * val) AS tv
           |  FROM pxr JOIN dctb d ON d.x = bi GROUP BY 1, 2, 3, 4, 5),
           |dd AS (SELECT p, ph, b0, t1.u, d2.u AS v, sum(d2.cv * tv) AS dv
           |  FROM t1 JOIN dctb d2 ON d2.x = bj GROUP BY 1, 2, 3, 4, 5),
           |med AS (SELECT p, ph, b0, sum(dv) AS m FROM (
           |    SELECT p, ph, b0, dv, row_number() OVER (PARTITION BY p, ph, b0
           |      ORDER BY dv) AS rn FROM dd)
           |  WHERE rn IN (32, 33) GROUP BY 1, 2, 3),
           |bits AS (SELECT dd.p, dd.ph, dd.b0, dd.u * 8 + dd.v AS b,
           |   CASE WHEN 2 * dd.dv > med.m THEN '1' ELSE '0' END AS bit
           |  FROM dd JOIN med ON dd.p = med.p AND dd.ph = med.ph
           |    AND dd.b0 = med.b0),
           |hs AS (SELECT p, ph, b0, string_agg(bit, '' ORDER BY b) AS h
           |  FROM bits GROUP BY 1, 2, 3),
           |docsig AS (SELECT i.doc_id,
           |   string_agg(hs.h, '-' ORDER BY f.range) AS sig,
           |   CAST(i.nf AS BIGINT) AS nf
           |  FROM ids i JOIN range(4) f ON f.range < i.nf
           |   JOIN hs ON hs.p = i.p AND hs.ph = (i.ph0 + f.range) % 2
           |    AND hs.b0 = i.b0
           |  GROUP BY i.doc_id, i.nf),
           |vids AS (SELECT d.doc_id * 2 + v.range AS vid, d.sig, d.nf
           |  FROM docsig d, range(2) v)
           |SELECT sig, CAST(count(*) AS BIGINT) AS n_videos,
           | min(vid) AS min_vid, CAST(max(nf) AS BIGINT) AS n_frames_hashed
           |FROM vids GROUP BY sig""".stripMargin,

      // the aHash recomputed from the generation lattice: block b =
      // (y//2)·8 + (x//2), bit = blockSum·256 > totalSum·4 (strict, ties
      // → 0) — the SAME cross-multiplied integer comparison the decoder
      // side runs on real pixels
      "q330_image_ahash_dedup" ->
        """WITH ids AS (SELECT doc_id, CAST(1 + doc_id % 3 AS BIGINT) AS dx,
          |   CAST(1 + (doc_id // 3) % 3 AS BIGINT) AS dy,
          |   CAST((doc_id % 7) * 10 AS BIGINT) AS c FROM documents),
          |tot AS (SELECT doc_id, sum(dx * x.range + dy * y.range + c) AS tsum
          |  FROM ids, range(16) x, range(16) y GROUP BY doc_id),
          |blk AS (SELECT doc_id, (py.range // 2) * 8 + (px.range // 2) AS b,
          |   sum(dx * px.range + dy * py.range + c) AS bsum
          |  FROM ids, range(16) px, range(16) py GROUP BY 1, 2),
          |bits AS (SELECT blk.doc_id, blk.b,
          |   CASE WHEN blk.bsum * 256 > tot.tsum * 4 THEN '1' ELSE '0' END AS v
          |  FROM blk JOIN tot ON blk.doc_id = tot.doc_id),
          |hs AS (SELECT doc_id, string_agg(v, '' ORDER BY b) AS ahash_bits
          |  FROM bits GROUP BY doc_id)
          |SELECT h.ahash_bits, CAST(count(*) AS BIGINT) AS n_images,
          | min(h.doc_id) AS min_id,
          | CAST(count(DISTINCT i.doc_id % 7) AS BIGINT) AS n_brightness
          |FROM hs h JOIN ids i ON h.doc_id = i.doc_id GROUP BY 1""".stripMargin,

      // three existing twins composed: q198's verified-pair chain marks
      // text-dup docs, q330's closed-form aHash marks image carriers,
      // q340's frame-class DCT signature marks video carriers (modality-
      // prefixed keys), one doc-grain join rolls the conflict matrix
      "q343_crossmodal_dedup" ->
        s"""WITH dd AS (SELECT doc_id, ${cleanSql("text")} AS t FROM documents
          |  WHERE n_chars <= 512),
          |tk AS (SELECT doc_id, t, string_split(t, ' ') AS toks FROM dd),
          |bk AS (SELECT doc_id, t, md5(array_to_string(toks[1:3], ' ')) AS h
          |  FROM tk WHERE len(toks) >= 3),
          |pp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          |  FROM bk a JOIN bk b ON a.h = b.h AND a.doc_id < b.doc_id
          |  WHERE round(1.0 - CAST(levenshtein(a.t, b.t) AS DOUBLE) /
          |    greatest(len(a.t), len(b.t)), 4) >= 0.8),
          |td AS (SELECT DISTINCT doc_id FROM
          |  (SELECT id_a AS doc_id FROM pp UNION ALL SELECT id_b FROM pp)),
          |ids AS (SELECT doc_id, CAST(1 + doc_id % 5 AS BIGINT) AS dx,
          |   CAST(1 + (doc_id // 5) % 5 AS BIGINT) AS dy,
          |   CAST((doc_id % 7) * 10 AS BIGINT) AS c FROM documents
          |  WHERE doc_id % 23 = 0),
          |tot AS (SELECT doc_id, sum(dx * x.range + dy * y.range + c) AS tsum
          |  FROM ids, range(16) x, range(16) y GROUP BY doc_id),
          |blk AS (SELECT doc_id, (py.range // 2) * 8 + (px.range // 2) AS b,
          |   sum(dx * px.range + dy * py.range + c) AS bsum
          |  FROM ids, range(16) px, range(16) py GROUP BY 1, 2),
          |bits AS (SELECT blk.doc_id, blk.b,
          |   CASE WHEN blk.bsum * 256 > tot.tsum * 4 THEN '1' ELSE '0' END AS v
          |  FROM blk JOIN tot ON blk.doc_id = tot.doc_id),
          |hs AS (SELECT doc_id, string_agg(v, '' ORDER BY b) AS ahash_bits
          |  FROM bits GROUP BY doc_id),
          |vparm AS (SELECT doc_id,
          |   CAST(4 << (doc_id % 4) AS BIGINT) AS p,
          |   CAST((doc_id // 4) % 2 AS BIGINT) AS ph0,
          |   CAST(16 + (doc_id % 5) * 8 AS BIGINT) AS b0,
          |   CAST(2 + doc_id % 3 AS BIGINT) AS nf FROM documents
          |  WHERE doc_id % 31 = 0 AND doc_id % 23 <> 0),
          |vfc AS (SELECT DISTINCT p, ph.range AS ph, b0
          |  FROM (SELECT DISTINCT p, b0 FROM vparm), range(2) ph),
          |dctb(u, x, cv) AS (VALUES ${graft.multimodal.DctHash.basisSqlValues}),
          |vpx AS (SELECT p, ph, b0, rx.range AS bi, ry.range AS bj,
          |   b0 + 112 * ((rx.range // (p // 2) + ry.range // (p // 2) + ph) % 2)
          |     AS val
          |  FROM vfc, range(32) rx, range(32) ry),
          |vt1 AS (SELECT p, ph, b0, d.u, bj, sum(d.cv * val) AS tv
          |  FROM vpx JOIN dctb d ON d.x = bi GROUP BY 1, 2, 3, 4, 5),
          |vdd AS (SELECT p, ph, b0, vt1.u, d2.u AS v, sum(d2.cv * tv) AS dv
          |  FROM vt1 JOIN dctb d2 ON d2.x = bj GROUP BY 1, 2, 3, 4, 5),
          |vmed AS (SELECT p, ph, b0, sum(dv) AS m FROM (
          |    SELECT p, ph, b0, dv, row_number() OVER (PARTITION BY p, ph, b0
          |      ORDER BY dv) AS rn FROM vdd)
          |  WHERE rn IN (32, 33) GROUP BY 1, 2, 3),
          |vbits AS (SELECT vdd.p, vdd.ph, vdd.b0, vdd.u * 8 + vdd.v AS b,
          |   CASE WHEN 2 * vdd.dv > vmed.m THEN '1' ELSE '0' END AS bit
          |  FROM vdd JOIN vmed ON vdd.p = vmed.p AND vdd.ph = vmed.ph
          |    AND vdd.b0 = vmed.b0),
          |vhs AS (SELECT p, ph, b0, string_agg(bit, '' ORDER BY b) AS h
          |  FROM vbits GROUP BY 1, 2, 3),
          |vsig AS (SELECT i.doc_id,
          |   'v:' || string_agg(vhs.h, '-' ORDER BY f.range) AS mkey
          |  FROM vparm i JOIN range(4) f ON f.range < i.nf
          |   JOIN vhs ON vhs.p = i.p AND vhs.ph = (i.ph0 + f.range) % 2
          |    AND vhs.b0 = i.b0
          |  GROUP BY i.doc_id),
          |media AS (SELECT doc_id, 'i:' || ahash_bits AS mkey FROM hs
          |  UNION ALL SELECT doc_id, mkey FROM vsig),
          |msz AS (SELECT mkey, count(*) AS mn FROM media GROUP BY 1),
          |lab AS (SELECT d.doc_id, h.mkey,
          |   (t.doc_id IS NOT NULL) AS tdup,
          |   coalesce(m.mn > 1, FALSE) AS mdup
          |  FROM documents d
          |  LEFT JOIN media h ON h.doc_id = d.doc_id
          |  LEFT JOIN msz m ON m.mkey = h.mkey
          |  LEFT JOIN td t ON d.doc_id = t.doc_id)
          |SELECT CASE WHEN tdup AND mdup THEN 'text+media'
          |  WHEN tdup THEN 'text_only'
          |  WHEN mdup THEN 'media_only' ELSE 'unique' END AS dup_class,
          | CAST(count(*) AS BIGINT) AS n_docs,
          | CAST(count(DISTINCT mkey) AS BIGINT) AS n_media_groups
          |FROM lab GROUP BY 1""".stripMargin,
  )
}
