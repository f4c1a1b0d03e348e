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
  }
}
