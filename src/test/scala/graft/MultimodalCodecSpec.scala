package graft

import graft.ext.multimodal.{MediaCodecs, MediaMeta, MediaRecord, Multimodal}

/** Real-codec multimodal tests: the image path decodes actual BMP/PNG
  * bytes with `javax.imageio`, the audio path actual RIFF/WAVE with
  * `javax.sound.sampled`. Expected values are computed from the pure
  * pixel/sample formulas INDEPENDENTLY of the codec round-trip, so a
  * pass proves encode → JDK decode preserved every pixel/sample. */
class MultimodalCodecSpec extends SparkSpec {
  import spark.implicits._

  private def expectedImage(id: Long): (Int, Int, Long, Long, Long) = {
    val w = MediaCodecs.imgWidth(id); val h = MediaCodecs.imgHeight(id)
    var (sr, sg, sb) = (0L, 0L, 0L)
    (0L until w.toLong * h).foreach { i =>
      sr += MediaCodecs.pixelR(id, i)
      sg += MediaCodecs.pixelG(id, i)
      sb += MediaCodecs.pixelB(id, i)
    }
    (w, h, sr, sg, sb)
  }

  test("image decode: BMP and PNG blobs round-trip pixel-exactly through ImageIO") {
    // even ids → BMP, odd → PNG: both container formats through one path
    Seq(0L, 1L, 6L, 13L, 97L, 100L).foreach { id =>
      val bytes = MediaCodecs.encodeImage(id)
      val st = MediaCodecs.decodeImage(bytes)
      val (w, h, sr, sg, sb) = expectedImage(id)
      assert((st.width, st.height, st.sumR, st.sumG, st.sumB) == (w, h, sr, sg, sb),
        s"id=$id fmt=${MediaCodecs.imgFormat(id)}")
    }
    // the two formats genuinely differ at the byte level
    assert(!java.util.Arrays.equals(
      MediaCodecs.encodeImage(2L).take(4), MediaCodecs.encodeImage(3L).take(4)))
  }

  test("image decode sniffs the container from bytes, not metadata") {
    val rec = MediaRecord(4L, MediaCodecs.encodeImage(4L),
      MediaMeta("image", "jpeg" /* lies */, 0, 0, 0L))
    val row = Multimodal.decodeImages(Seq(rec).toDS()).collect().head
    val (w, h, sr, _, _) = expectedImage(4L)
    assert(row.width == w && row.height == h && row.sum_r == sr)
  }

  test("image decode rejects an undecodable blob") {
    val junk = Array.fill[Byte](64)(0x5A)
    val e = intercept[Exception](MediaCodecs.decodeImage(junk))
    assert(e.getMessage.contains("undecodable"))
  }

  test("audio decode: WAV blobs round-trip sample-exactly through javax.sound") {
    Seq(0L, 1L, 7L, 49L, 128L).foreach { id =>
      val st = MediaCodecs.decodeWav(MediaCodecs.encodeWav(id))
      val n = MediaCodecs.audioFrames(id)
      val samples = (0L until n.toLong).map(MediaCodecs.sampleAt(id, _))
      assert(st.nFrames == n && st.sampleRateHz == 8000)
      assert(st.sumSamples == samples.map(_.toLong).sum)
      assert(st.minSample == samples.min && st.maxSample == samples.max)
    }
  }

  private def expectedVideo(id: Long): (Int, Int, Int, Long, Long, Long) = {
    val n = MediaCodecs.vidFrames(id)
    val w = MediaCodecs.vidWidth(id); val h = MediaCodecs.vidHeight(id)
    var (sr, sg, sb) = (0L, 0L, 0L)
    (0L until n.toLong).foreach { f =>
      (0L until w.toLong * h).foreach { i =>
        sr += MediaCodecs.vidPixelR(id, f, i)
        sg += MediaCodecs.vidPixelG(id, f, i)
        sb += MediaCodecs.vidPixelB(id, f, i)
      }
    }
    (n, w, h, sr, sg, sb)
  }

  test("video decode: AVI containers round-trip frame- and pixel-exactly") {
    Seq(0L, 1L, 5L, 13L, 44L, 101L).foreach { id =>
      val bytes = MediaCodecs.encodeAvi(id)
      // it really is a RIFF/AVI container
      assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF")
      assert(new String(bytes, 8, 4, "US-ASCII") == "AVI ")
      val st = MediaCodecs.decodeAvi(bytes)
      val (n, w, h, sr, sg, sb) = expectedVideo(id)
      assert((st.nFrames, st.width, st.height, st.sumR, st.sumG, st.sumB) ==
        (n.toLong, w, h, sr, sg, sb), s"id=$id")
    }
  }

  test("video decode walks the container structure, not a fixed layout") {
    // frames must come out of the movi LIST specifically: a truncated
    // container (movi dropped) has headers but no frames — loud failure
    val bytes = MediaCodecs.encodeAvi(7L)
    def fourccAt(p: Int) = new String(bytes, p, 4, "US-ASCII")
    def u32At(p: Int) =
      (bytes(p) & 0xFFL) | ((bytes(p + 1) & 0xFFL) << 8) |
        ((bytes(p + 2) & 0xFFL) << 16) | ((bytes(p + 3) & 0xFFL) << 24)
    // find the movi LIST at top level and cut the container before it
    var pos = 12
    var moviStart = -1
    while (moviStart < 0 && pos + 8 <= bytes.length) {
      if (fourccAt(pos) == "LIST" && fourccAt(pos + 8) == "movi") moviStart = pos
      else pos = pos + 8 + u32At(pos + 4).toInt + (u32At(pos + 4).toInt & 1)
    }
    assert(moviStart > 12, "no movi LIST found at top level")
    val headersOnly = bytes.take(moviStart)
    // patch the RIFF size down so the truncation is structurally valid
    val sz = headersOnly.length - 8
    headersOnly(4) = (sz & 0xFF).toByte
    headersOnly(5) = ((sz >> 8) & 0xFF).toByte
    headersOnly(6) = ((sz >> 16) & 0xFF).toByte
    headersOnly(7) = ((sz >> 24) & 0xFF).toByte
    val e = intercept[Exception](MediaCodecs.decodeAvi(headersOnly))
    assert(e.getMessage.contains("no video frames"))
    // and junk is rejected as not-an-AVI
    val junk = Array.fill[Byte](64)(0x5A)
    val e2 = intercept[Exception](MediaCodecs.decodeAvi(junk))
    assert(e2.getMessage.contains("not a RIFF/AVI"))
  }

  test("video decode cross-checks the avih header against decoded frames") {
    val bytes = MediaCodecs.encodeAvi(9L)
    // corrupt dwTotalFrames inside the avih payload: hdrl LIST starts
    // at 12; avih chunk at 12+8+4; payload at +8; dwTotalFrames at +16
    val avihPayload = 12 + 8 + 4 + 8
    assert(new String(bytes, 12 + 8 + 4, 4, "US-ASCII") == "avih")
    bytes(avihPayload + 16) = 99.toByte
    val e = intercept[Exception](MediaCodecs.decodeAvi(bytes))
    assert(e.getMessage.contains("declares"))
  }

  test("decode stages distribute: partition-preserving, no shuffle") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents").limit(40)
    val corpus = Multimodal.imageCorpus(spark, docs).repartition(5)
    val decoded = Multimodal.decodeImages(corpus)
    assert(decoded.rdd.getNumPartitions == 5)
    val rows = decoded.collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val (w, h, sr, sg, sb) = expectedImage(r.id)
      assert((r.width, r.height, r.sum_r, r.sum_g, r.sum_b) == (w, h, sr, sg, sb))
    }
    val audio = Multimodal.decodeAudio(
      Multimodal.audioCorpus(spark, docs).repartition(5))
    assert(audio.rdd.getNumPartitions == 5)
    assert(audio.collect().length == 40)
    val video = Multimodal.decodeVideos(
      Multimodal.videoCorpus(spark, docs).repartition(5))
    assert(video.rdd.getNumPartitions == 5)
    val vrows = video.collect()
    assert(vrows.length == 40)
    vrows.foreach { r =>
      val (n, w, h, sr, sg, sb) = expectedVideo(r.id)
      assert((r.n_frames, r.width, r.height, r.sum_r, r.sum_g, r.sum_b) ==
        (n.toLong, w, h, sr, sg, sb))
    }
  }
}
