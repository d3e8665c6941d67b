package graft

import graft.multimodal.{AudioGen, AudioIoCodec, Multimodal}

/** The real pure-JVM audio codec behind the MediaCodec seam — the audio
  * twin of ImageIoCodecSpec: closed-form round trips on deterministic PCM
  * WAVs (AudioGen), header-only metadata, lossless sample decode, and the
  * kind-dispatch chain (audio real, image chains to ImageIoCodec, video
  * stays stubbed). */
class AudioIoCodecSpec extends SparkSpec {

  test("decodeMeta reads WAV rate/channels/frames from the header, n_bytes = 44 + PCM") {
    for (id <- Seq(0L, 1L, 2L, 3L, 5L, 776L, 777L)) {
      val wav = AudioGen.pcmWav(id)
      val m = AudioIoCodec.decodeMeta(id, wav, "audio")
      assert(m.width === (8000 + (id % 4) * 4000).toInt, s"rate for id=$id")
      assert(m.height === (1 + id % 2).toInt, s"channels for id=$id")
      assert(m.n_frames === (256 + id % 777).toInt, s"frames for id=$id")
      // the JDK WAVE writer emits the canonical 44-byte RIFF/fmt/data header
      assert(m.n_bytes === 44L + (256 + id % 777) * (1 + id % 2) * 2,
        s"n_bytes for id=$id (header not canonical 44 B?)")
    }
  }

  test("PCM decode is lossless: peakAbs and histogram match the generation arithmetic") {
    for (id <- Seq(0L, 1L, 4L, 9L)) {
      val wav = AudioGen.pcmWav(id)
      val n = ((256 + id % 777) * (1 + id % 2)).toInt
      val samples = (0 until n).map(i => AudioGen.sampleAt(id, i.toLong))
      assert(AudioIoCodec.peakAbs(id, wav) === samples.map(v => math.abs(v.toLong)).max)
      val emb = AudioIoCodec.encodeFeature(id, wav, "audio", 16).embedding
      val counts = new Array[Long](16)
      samples.foreach(v => counts(((v + 32768) * 16) >>> 16) += 1)
      val norm = math.sqrt(counts.map(c => c.toDouble * c).sum)
      (0 until 16).foreach { b =>
        assert(math.abs(emb(b) - counts(b) / norm) < 1e-6, s"bucket $b of id=$id")
      }
    }
  }

  test("decodeMeta rejects a non-audio byte stream loudly") {
    intercept[Exception] {
      AudioIoCodec.decodeMeta(5L, "not audio at all".getBytes("UTF-8"), "audio")
    }
  }

  test("kind dispatch: image chains to ImageIoCodec, video to the stub") {
    val png = graft.multimodal.ImageGen.gradientPng(8, 4)
    val im = AudioIoCodec.decodeMeta(1L, png, "image")
    assert(im.width === 8 && im.height === 4)
    val vid = AudioIoCodec.decodeMeta(1L, Array.fill[Byte](100)(7), "video")
    assert(vid === graft.multimodal.StubCodec.decodeMeta(1L, Array.fill[Byte](100)(7), "video"))
  }

  test("Multimodal.decodeMeta carries the audio codec through the seam unchanged") {
    val sp = spark
    import sp.implicits._
    val media = Seq(10L, 11L).toDF("doc_id").as[Long]
      .mapPartitions(_.map(id => (id, AudioGen.pcmWav(id), "audio")))
      .toDF("doc_id", "payload", "kind")
    val out = Multimodal.decodeMeta(media, AudioIoCodec).collect()
      .map(m => m.doc_id -> m).toMap
    assert(out(10L).height === 1 && out(11L).height === 2)
    assert(out(10L).n_frames === 266 && out(11L).n_frames === 267)
  }
}
