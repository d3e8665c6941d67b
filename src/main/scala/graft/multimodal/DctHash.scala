package graft.multimodal

/** DCT perceptual hash (pHash) — the resize-robust complement to
  * [[ImagePHash]]'s aHash (VERDICT r14 next-round #6): aHash pools the
  * raster at ITS OWN resolution, so two scales of one image pool
  * different blocks and may disagree; pHash canonicalizes scale FIRST
  * (area-average to a fixed 32×32), takes the 2-D DCT-II, and keeps the
  * 8×8 low-frequency corner thresholded against its median. An image and
  * its area-resized variant canonicalize to the SAME 32×32 raster, so
  * their hashes are bit-identical; a uniform brightness shift moves only
  * the DC term and the median together, leaving every bit unchanged
  * (verified exact on the q339 lattice family).
  *
  * All-integer end to end — the cross-engine-exactness license:
  *  - the DCT basis is the PINNED integer matrix round(10⁴·cos(π(2x+1)u
  *    / 64)), a shared constant both engines read (the DuckDB twin gets
  *    it as a generated VALUES literal — the lexicon-twin pattern, so
  *    the oracle never evaluates a cosine);
  *  - pixels come from [[ImageResize.areaResize]] (floor-exact);
  *  - coefficients are long sums (|d| ≤ 32²·10⁴·255 ≈ 2.6e13 ≪ 2⁶³);
  *  - the threshold is the exact median pair: bit = 2·d > m₃₂ + m₃₃
  *    (strict, ties → 0), no division anywhere.
  *
  * At 100 TB: hashing is embarrassingly parallel beside the decode (the
  * payload never leaves its partition; only the 64-char hash shuffles),
  * and near-dup search rides q329's banded-Hamming discipline — here 16
  * bands × 4 bits, pigeonhole-exact for Hamming ≤ 15. */
object DctHash {

  val Scale = 10000L

  /** Integer DCT-II basis: basis(u)(x) = round(10⁴ cos(π(2x+1)u/64)),
    * u ∈ 0..7 (kept frequencies), x ∈ 0..31 (spatial). */
  val basis: Array[Array[Long]] = Array.tabulate(8, 32) { (u, x) =>
    math.round(Scale.toDouble * math.cos(math.Pi * (2 * x + 1) * u / 64.0))
  }

  /** The basis as DuckDB VALUES rows `(u, x, cv)` — generated from the
    * SAME constant the engine multiplies with, so the twin cannot drift. */
  def basisSqlValues: String =
    (for (u <- 0 until 8; x <- 0 until 32)
      yield s"($u, $x, ${basis(u)(x)})").mkString(", ")

  /** 64-bit DCT hash of a decodable image payload, as a '0'/'1' string in
    * bit order b = u·8 + v (row-major over the kept frequency corner).
    * Dims must be multiples of 32 (the areaResize divisibility license);
    * 32×32 inputs canonicalize as the identity. */
  def hashBits(id: Long, bytes: Array[Byte]): String =
    hashOfRaster(id, ImageResize.areaResize(id, bytes, 32, 32), 32, 32)

  /** Hash an already-decoded luminance raster (row-major, length w·h) —
    * the per-frame entry point for video (q340): sampled AVI frames
    * arrive as rasters from [[AviCodec.foreachSampledFrameRaster]], no
    * PNG round trip. Dims must be multiples of 32; the canonicalizing
    * area-average happens here, floor-exact. */
  def hashOfRaster(id: Long, raster: Array[Long], w: Int, h: Int): String = {
    val p: Array[Long] =
      if (w == 32 && h == 32) raster
      else {
        require(w % 32 == 0 && h % 32 == 0,
          s"payload $id: DCT hash needs dims divisible by 32, got ${w}x$h")
        val (bw, bh) = (w / 32, h / 32)
        val sums = new Array[Long](1024)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sums((y / bh) * 32 + (x / bw)) += raster(y * w + x)
            x += 1
          }
          y += 1
        }
        val area = bw.toLong * bh
        var i = 0
        while (i < 1024) { sums(i) /= area; i += 1 }
        sums
      }
    // separable DCT: t(u)(y) = Σ_x basis(u)(x)·p(y)(x); d(u)(v) = Σ_y basis(v)(y)·t(u)(y)
    val t = Array.ofDim[Long](8, 32)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 32) {
        var s = 0L
        var x = 0
        while (x < 32) { s += basis(u)(x) * p(y * 32 + x); x += 1 }
        t(u)(y) = s
        y += 1
      }
      u += 1
    }
    val flat = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var y = 0
        while (y < 32) { s += basis(v)(y) * t(u)(y); y += 1 }
        flat(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    val srt = flat.clone(); java.util.Arrays.sort(srt)
    val m = srt(31) + srt(32) // median pair — threshold without division
    val sb = new java.lang.StringBuilder(64)
    var b = 0
    while (b < 64) { sb.append(if (2 * flat(b) > m) '1' else '0'); b += 1 }
    sb.toString
  }
}
