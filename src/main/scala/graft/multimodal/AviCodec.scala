package graft.multimodal

import java.io.ByteArrayOutputStream

/** Real pure-JVM VIDEO codec behind the [[MediaCodec]] seam — retires the
  * last [[StubCodec]] modality. Container: AVI, which is RIFF — the exact
  * container discipline [[AudioIoCodec]]'s WAV already exercises (fourCC
  * chunks, little-endian u32 sizes, even-byte padding). Frames: BI_RGB
  * uncompressed DIB (`biCompression = 0`, 24-bit bottom-up BGR rows padded
  * to 4 bytes) — losslessly decodable with zero native dependencies, so
  * decoded pixels equal generated pixels bit-for-bit and DuckDB predicts
  * every decode result from the generation lattice (the q300/q319 license,
  * applied to video).
  *
  * Scale posture mirrors the other real codecs:
  *  - `decodeMeta` is HEADER-ONLY — it walks RIFF chunk headers to the
  *    `avih` MainAVIHeader (width, height, total frames) and never enters
  *    the `movi` payload list: a metadata sweep over 100 TB of video reads
  *    a few hundred bytes per payload, not the payload;
  *  - `frameStats` / `encodeFeature` stream the `movi` list chunk-by-chunk
  *    and decode only every k-th `00db` frame — per-payload, executor-side;
  *    pixel data never leaves the partition, only the reduced scalars move.
  * [[MediaMeta]] mapping for video: `width`/`height` = frame dimensions,
  * `n_frames` = `dwTotalFrames` from the header.
  *
  * Non-video kinds chain to [[AudioIoCodec]] (which chains audio→image), so
  * passing THIS codec to the Multimodal plumbing gives the full real-codec
  * stack: video + audio + image, no stub left on any modality.
  *
  * Reference scope: the reference pipeline (survey_analysis.py) has no
  * media path; this implements the brief's multimodal-column requirement
  * (decode / feature-extract / frame-sample over opaque binary columns).
  */
object AviCodec extends MediaCodec {

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Read the chunk size at `off + 4` and validate it against the
    * enclosing container: a size ≥ 2^31 truncates to a negative Int
    * (isz = -8 makes `in += 8 + isz + (isz & 1)` advance by ZERO — an
    * infinite executor loop on a corrupt/adversarial payload, ADVICE
    * r15), and any size past `limit` overruns the container. Both throw
    * IllegalArgumentException like every other malformed-payload path, so
    * the walkers always strictly advance. */
  private def chunkSize(id: Long, b: Array[Byte], off: Int, limit: Int): Int = {
    val sz = u32(b, off + 4) // unsigned: 0..2^32-1 as Long
    // hot path kept tiny (JIT-inlinable into the chunk walkers): the
    // message-building throw lives in a separate cold method
    if (sz > (limit - off - 8).toLong) badChunk(id, b, off, limit, sz)
    sz.toInt // ≤ limit ≤ Int.MaxValue: exact, non-negative
  }

  private def badChunk(id: Long, b: Array[Byte], off: Int, limit: Int,
      sz: Long): Nothing =
    throw new IllegalArgumentException(
      s"payload $id: chunk '${fourCC(b, off)}' at $off declares $sz B, " +
        s"only ${limit - off - 8} remain in its container")

  /** Width, height, totalFrames from the `avih` header — header-only: the
    * walk stops the moment `avih` is found, before any `movi` bytes. */
  private def parseAvih(id: Long, b: Array[Byte]): (Int, Int, Int) = {
    require(b.length >= 12 && fourCC(b, 0) == "RIFF" && fourCC(b, 8) == "AVI ",
      s"payload $id: not a RIFF/AVI byte stream")
    // top level: LIST hdrl is required first by the AVI spec, but walk
    // defensively; inside hdrl, avih is the first chunk.
    var off = 12
    while (off + 8 <= b.length) {
      val cc = fourCC(b, off)
      val sz = chunkSize(id, b, off, b.length)
      if (cc == "LIST" && sz >= 4 && fourCC(b, off + 8) == "hdrl") {
        var in = off + 12
        val end = off + 8 + sz
        while (in + 8 <= end) {
          val icc = fourCC(b, in)
          val isz = chunkSize(id, b, in, end)
          if (icc == "avih") {
            require(isz >= 40, s"payload $id: truncated avih header ($isz B)")
            // MainAVIHeader: dwTotalFrames @16, dwWidth @32, dwHeight @36
            val frames = u32(b, in + 8 + 16).toInt
            val w = u32(b, in + 8 + 32).toInt
            val h = u32(b, in + 8 + 36).toInt
            return (w, h, frames)
          }
          in += 8 + isz + (isz & 1)
        }
        throw new IllegalArgumentException(s"payload $id: hdrl has no avih")
      }
      off += 8 + sz + (sz & 1)
    }
    throw new IllegalArgumentException(s"payload $id: no hdrl LIST found")
  }

  /** Visit each `00db`/`00dc` frame chunk's (offset, size) in stream order
    * without copying frame bytes. */
  private def foreachFrameChunk(id: Long, b: Array[Byte])(f: (Int, Int, Int) => Unit): Unit = {
    var off = 12
    var idx = 0
    while (off + 8 <= b.length) {
      val cc = fourCC(b, off)
      val sz = chunkSize(id, b, off, b.length)
      if (cc == "LIST" && sz >= 4 && fourCC(b, off + 8) == "movi") {
        var in = off + 12
        val end = off + 8 + sz
        while (in + 8 <= end) {
          val icc = fourCC(b, in)
          val isz = chunkSize(id, b, in, end)
          if (icc == "00db" || icc == "00dc") { f(idx, in + 8, isz); idx += 1 }
          in += 8 + isz + (isz & 1)
        }
        return
      }
      off += 8 + sz + (sz & 1)
    }
    throw new IllegalArgumentException(s"payload $id: no movi LIST found")
  }

  /** Per-pixel BT.601 luminance visit over one BI_RGB bottom-up frame.
    * Row y=0 is the TOP image row = the LAST stored row (DIB bottom-up);
    * samples are B, G, R in byte order. */
  private def foreachLum(b: Array[Byte], foff: Int, w: Int, h: Int)(f: (Int, Int, Int) => Unit): Unit = {
    val stride = ((w * 3 + 3) / 4) * 4
    var y = 0
    while (y < h) {
      val row = foff + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        val bb = b(row + x * 3) & 0xff
        val gg = b(row + x * 3 + 1) & 0xff
        val rr = b(row + x * 3 + 2) & 0xff
        f(x, y, (rr * 299 + gg * 587 + bb * 114) / 1000)
        x += 1
      }
      y += 1
    }
  }

  override def decodeMeta(id: Long, bytes: Array[Byte], kind: String): MediaMeta =
    if (kind != "video") AudioIoCodec.decodeMeta(id, bytes, kind)
    else {
      val (w, h, frames) = parseAvih(id, bytes)
      MediaMeta(id, kind, bytes.length.toLong, w, h, frames)
    }

  override def encodeFeature(id: Long, bytes: Array[Byte], kind: String, dim: Int): MediaFeature =
    if (kind != "video") AudioIoCodec.encodeFeature(id, bytes, kind, dim)
    else {
      // luminance histogram over ALL frames, L2-normalized — same bucket +
      // normalize shape as the image/audio codecs, so downstream
      // similarity/dedup consume all three modalities identically
      val (w, h, _) = parseAvih(id, bytes)
      val acc = new Array[Float](dim)
      foreachFrameChunk(id, bytes) { (_, foff, _) =>
        foreachLum(bytes, foff, w, h) { (_, _, v) => acc(v * dim / 256) += 1f }
      }
      var norm = 0.0
      var j = 0
      while (j < dim) { norm += acc(j).toDouble * acc(j); j += 1 }
      val n = math.sqrt(norm)
      if (n > 0) { j = 0; while (j < dim) { acc(j) = (acc(j) / n).toFloat; j += 1 } }
      MediaFeature(id, kind, acc)
    }

  /** Visit every `sampleEvery`-th frame's LUMINANCE RASTER (row-major,
    * length w·h) — the per-frame decode hook the video perceptual-hash
    * family builds on (q340): skipped frames are never touched, one
    * raster buffer is reused across frames, and only the per-frame
    * reductions the caller computes leave the partition. */
  def foreachSampledFrameRaster(id: Long, bytes: Array[Byte], sampleEvery: Int)(
      f: (Int, Int, Int, Array[Long]) => Unit): Unit = {
    require(sampleEvery >= 1, "sampleEvery must be >= 1")
    val (w, h, _) = parseAvih(id, bytes)
    val stride = ((w * 3 + 3) / 4) * 4
    val buf = new Array[Long](w * h)
    foreachFrameChunk(id, bytes) { (idx, foff, fsz) =>
      if (idx % sampleEvery == 0) {
        require(fsz >= stride * h, s"payload $id: frame $idx truncated ($fsz B)")
        foreachLum(bytes, foff, w, h) { (x, y, v) => buf(y * w + x) = v }
        f(idx, w, h, buf)
      }
    }
  }

  /** Frame sampling over real video — the q332 GIF shape on the AVI
    * container: decode frames 0, k, 2k, …, reduce to
    * (n_frames, n_sampled, sampled luminance sum, frame-0 top-left
    * luminance). `p00` pins the bottom-up row-order decode: a flipped
    * reader reports pixel (0, h−1) instead and the oracle catches it.
    * One streaming pass over the container; skipped frames are never
    * touched; only the four scalars leave the partition. */
  def frameStats(id: Long, bytes: Array[Byte], sampleEvery: Int): (Int, Int, Long, Long) = {
    require(sampleEvery >= 1, "sampleEvery must be >= 1")
    val (w, h, _) = parseAvih(id, bytes)
    val stride = ((w * 3 + 3) / 4) * 4
    var n = 0
    var sampled = 0
    var sum = 0L
    var p00 = 0L
    foreachFrameChunk(id, bytes) { (idx, foff, fsz) =>
      n += 1
      if (idx % sampleEvery == 0) {
        require(fsz >= stride * h, s"payload $id: frame $idx truncated ($fsz B)")
        sampled += 1
        foreachLum(bytes, foff, w, h) { (x, y, v) =>
          sum += v
          if (idx == 0 && x == 0 && y == 0) p00 = v
        }
      }
    }
    (n, sampled, sum, p00)
  }
}

/** Deterministic synthetic AVI source for the oracle-checked video queries
  * and specs — the [[ImageGen]]/[[AudioGen]] pattern for the video modality:
  * BI_RGB DIB frames are lossless, so decoded pixels equal generated pixels
  * and DuckDB predicts decode results from the SAME integer lattice. */
object AviGen {

  private def le32(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
    o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }
  private def le16(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def cc(o: ByteArrayOutputStream, s: String): Unit =
    o.write(s.getBytes("US-ASCII"))

  /** Byte size of `rampAvi(w, h, …, nFrames, …)` output — the closed form
    * the q334 oracle checks `n_bytes` against (also documents the writer's
    * fixed layout): 12 RIFF + 8+192 hdrl + 8+4 movi + nF·(8 + stride·h). */
  def aviBytes(w: Int, h: Int, nFrames: Int): Long = {
    val stride = ((w * 3 + 3) / 4) * 4
    12L + 200L + 12L + nFrames.toLong * (8L + stride.toLong * h)
  }

  /** w×h, nFrames-frame uncompressed AVI with CHECKERBOARD frames whose
    * phase advances by one per frame: pixel(x, y, f) = base + amp·((x/p +
    * y/p + ph0 + f) mod 2), R=G=B (BT.601 luma recovers the value
    * exactly). The q340 family: the checker period is the per-frame
    * perceptual content (strong distinct harmonics for the DCT hash);
    * for even p ≥ 4 a 2×2 area-average of a period-p checker is EXACTLY
    * the period-p/2 checker at half resolution (blocks never straddle a
    * period boundary: 2bi+1 is odd, multiples of p ≥ 4 are even), so a
    * half-resolution variant video is the closed-form resize of the
    * original, frame for frame. */
  def checkerAvi(w: Int, h: Int, period: Int, ph0: Int, base: Int, amp: Int,
      nFrames: Int): Array[Byte] =
    buildAvi(w, h, nFrames) { (x, y, f) =>
      base + amp * ((x / period + y / period + ph0 + f) % 2)
    }

  /** w×h, nFrames-frame uncompressed AVI with grayscale ramp frames:
    * pixel(x, y, f) = dx·x + dy·y + frameStep·f + c, written as R=G=B=v
    * (so BT.601 luma recovers v EXACTLY: (299+587+114)/1000 = 1). Callers
    * keep v ≤ 255. Layout: RIFF(AVI ) → LIST hdrl [avih 56, LIST strl
    * [strh 56 'vids'/'DIB ', strf 40 BITMAPINFOHEADER]] → LIST movi
    * ['00db' frames, bottom-up BGR, 4-byte-padded rows]. No idx1 (optional
    * per spec; the reader streams). */
  def rampAvi(w: Int, h: Int, dx: Int, dy: Int, c: Int, nFrames: Int,
      frameStep: Int): Array[Byte] =
    buildAvi(w, h, nFrames)((x, y, f) => dx * x + dy * y + frameStep * f + c)

  /** Shared writer: w×h, nFrames-frame BI_RGB AVI with pixel(x, y, f) =
    * `pix(x, y, f)` written as R=G=B. Callers keep values in 0..255. */
  private def buildAvi(w: Int, h: Int, nFrames: Int)(
      pix: (Int, Int, Int) => Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val frameBytes = stride * h
    val out = new ByteArrayOutputStream(aviBytes(w, h, nFrames).toInt)

    // ---- hdrl content (192 B = 4 'hdrl' + 64 avih + 124 strl) ----
    val hdrl = new ByteArrayOutputStream(192)
    cc(hdrl, "hdrl")
    cc(hdrl, "avih"); le32(hdrl, 56)
    le32(hdrl, 100000)          // dwMicroSecPerFrame (10 fps)
    le32(hdrl, frameBytes * 10) // dwMaxBytesPerSec
    le32(hdrl, 0)               // dwPaddingGranularity
    le32(hdrl, 0x10)            // dwFlags: AVIF_HASINDEX off, WASCAPTUREFILE-ish
    le32(hdrl, nFrames)         // dwTotalFrames
    le32(hdrl, 0)               // dwInitialFrames
    le32(hdrl, 1)               // dwStreams
    le32(hdrl, frameBytes)      // dwSuggestedBufferSize
    le32(hdrl, w); le32(hdrl, h)
    (0 until 4).foreach(_ => le32(hdrl, 0)) // dwReserved[4]
    // LIST strl (116 B content = 4 + 64 strh + 48 strf)
    cc(hdrl, "LIST"); le32(hdrl, 116); cc(hdrl, "strl")
    cc(hdrl, "strh"); le32(hdrl, 56)
    cc(hdrl, "vids"); cc(hdrl, "DIB ")
    le32(hdrl, 0)               // dwFlags
    le16(hdrl, 0); le16(hdrl, 0) // wPriority, wLanguage
    le32(hdrl, 0)               // dwInitialFrames
    le32(hdrl, 1); le32(hdrl, 10) // dwScale / dwRate = 10 fps
    le32(hdrl, 0)               // dwStart
    le32(hdrl, nFrames)         // dwLength
    le32(hdrl, frameBytes)      // dwSuggestedBufferSize
    le32(hdrl, -1)              // dwQuality (default)
    le32(hdrl, 0)               // dwSampleSize
    le16(hdrl, 0); le16(hdrl, 0); le16(hdrl, w); le16(hdrl, h) // rcFrame
    cc(hdrl, "strf"); le32(hdrl, 40)
    le32(hdrl, 40)              // biSize
    le32(hdrl, w); le32(hdrl, h) // biWidth, biHeight (positive = bottom-up)
    le16(hdrl, 1); le16(hdrl, 24) // biPlanes, biBitCount
    le32(hdrl, 0)               // biCompression = BI_RGB
    le32(hdrl, frameBytes)      // biSizeImage
    le32(hdrl, 0); le32(hdrl, 0) // biXPelsPerMeter, biYPelsPerMeter
    le32(hdrl, 0); le32(hdrl, 0) // biClrUsed, biClrImportant
    val hdrlBytes = hdrl.toByteArray
    assert(hdrlBytes.length == 192, s"hdrl layout drifted: ${hdrlBytes.length}")

    // ---- movi content ----
    val moviSize = 4 + nFrames * (8 + frameBytes)
    val riffSize = 4 + (8 + hdrlBytes.length) + (8 + moviSize)

    cc(out, "RIFF"); le32(out, riffSize); cc(out, "AVI ")
    cc(out, "LIST"); le32(out, hdrlBytes.length); out.write(hdrlBytes)
    cc(out, "LIST"); le32(out, moviSize); cc(out, "movi")
    var f = 0
    while (f < nFrames) {
      cc(out, "00db"); le32(out, frameBytes)
      var y = h - 1 // bottom-up: last image row stored first
      while (y >= 0) {
        var x = 0
        var written = 0
        while (x < w) {
          val v = pix(x, y, f)
          out.write(v); out.write(v); out.write(v) // B, G, R — equal
          written += 3
          x += 1
        }
        while (written < stride) { out.write(0); written += 1 }
        y -= 1
      }
      f += 1
    }
    out.toByteArray
  }
}
