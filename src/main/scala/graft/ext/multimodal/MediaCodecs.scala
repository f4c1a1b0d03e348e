package graft.ext.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL media codecs over the JDK's own decoders — no stub.
  *
  * Images go through `javax.imageio` (`java.desktop` module: PNG, BMP,
  * JPEG, GIF read/write, fully headless); audio goes through
  * `javax.sound.sampled` (WAV/AIFF/AU PCM). Only video has no JDK
  * codec, so the video path remains the deterministic byte-level
  * stand-in in [[Multimodal.DecoderStub]].
  *
  * Determinism contract (what makes these oracle-checkable): the
  * synthetic corpus pixels/samples are a pure integer formula of
  * `(doc_id, index)`, the encodings are lossless (BMP/PNG 24-bit RGB,
  * 16-bit PCM WAV), and the decode stats are exact integer sums — so a
  * DuckDB oracle replays the stats from the formula alone, and a match
  * proves the bytes really round-tripped through encode → JDK decode.
  */
object MediaCodecs {

  // ImageIO defaults to a disk-backed stream cache per call; these are
  // tiny in-memory blobs, so keep everything on-heap. Headless is set
  // defensively — ByteArray{In,Out}putStream codecs never touch a
  // display, but AWT class-init consults the flag.
  System.setProperty("java.awt.headless", "true")
  ImageIO.setUseCache(false)

  // ------------------------------------------------------------- images

  /** Deterministic synthetic image geometry/pixels for `doc_id`.
    * Kept as small pure functions so the DuckDB oracle can inline the
    * identical arithmetic (all BIGINT, all operands non-negative so
    * `%` agrees across engines). */
  def imgWidth(docId: Long): Int = (4 + docId % 13).toInt // 4..16
  def imgHeight(docId: Long): Int = (4 + docId % 7).toInt // 4..10
  def imgFormat(docId: Long): String = if (docId % 2 == 0) "bmp" else "png"
  def pixelR(docId: Long, i: Long): Int = ((docId * 7 + 11 * i) % 256).toInt
  def pixelG(docId: Long, i: Long): Int = ((docId * 13 + 5 * i) % 256).toInt
  def pixelB(docId: Long, i: Long): Int = ((docId * 29 + 3 * i) % 256).toInt

  /** Encode the synthetic image for `docId` as real BMP or PNG bytes
    * (the stand-in for binary ingest — at 100 TB these arrive from the
    * lake; here they must be generated so the oracle knows the truth). */
  def encodeImage(docId: Long): Array[Byte] = {
    val w = imgWidth(docId); val h = imgHeight(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y.toLong * w + x
        img.setRGB(x, y,
          (pixelR(docId, i) << 16) | (pixelG(docId, i) << 8) | pixelB(docId, i))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, imgFormat(docId), out),
      s"no ${imgFormat(docId)} writer in this JVM")
    out.toByteArray
  }

  /** Decoded-image statistics — everything here comes from pixels that
    * [[ImageIO.read]] actually parsed out of the blob. */
  final case class ImageStats(
      width: Int, height: Int, sumR: Long, sumG: Long, sumB: Long)

  /** REAL decode: parse the blob with the JDK image codecs and reduce
    * the pixel grid to exact integer channel sums. Format is sniffed
    * from the bytes by ImageIO (magic numbers), not trusted metadata. */
  def decodeImage(media: Array[Byte]): ImageStats = {
    val img = ImageIO.read(new ByteArrayInputStream(media))
    require(img != null, "undecodable image blob")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
        x += 1
      }
      y += 1
    }
    ImageStats(img.getWidth, img.getHeight, sr, sg, sb)
  }

  // -------------------------------------------------------------- audio

  val SampleRate = 8000f

  /** Synthetic 16-bit PCM sample formula (signed, full range). */
  def audioFrames(docId: Long): Int = (16 + docId % 50).toInt // 16..65
  def sampleAt(docId: Long, k: Long): Int =
    (((docId * 11 + k * 17) % 65536) - 32768).toInt

  /** Encode the synthetic samples as a real RIFF/WAVE container
    * (16-bit mono little-endian PCM) via `javax.sound.sampled`. */
  def encodeWav(docId: Long): Array[Byte] = {
    val n = audioFrames(docId)
    val pcm = new Array[Byte](2 * n)
    var k = 0
    while (k < n) {
      val s = sampleAt(docId, k)
      pcm(2 * k) = (s & 0xFF).toByte
      pcm(2 * k + 1) = ((s >> 8) & 0xFF).toByte
      k += 1
    }
    val fmt = new AudioFormat(SampleRate, 16, 1, true, false)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  final case class AudioStats(
      nFrames: Long, sampleRateHz: Int, sumSamples: Long,
      minSample: Int, maxSample: Int)

  /** REAL decode: parse the WAV container with the JDK sound stack
    * (header walk, format negotiation) and reduce the PCM frames to
    * exact integer stats. */
  def decodeWav(media: Array[Byte]): AudioStats = {
    val ain = AudioSystem.getAudioInputStream(new ByteArrayInputStream(media))
    try {
      val fmt = ain.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"unexpected decoded format: $fmt")
      val bytes = ain.readAllBytes()
      val n = bytes.length / 2
      // zero-frame stream: pin min/max to 0 instead of leaking the
      // fold's Int.MaxValue/MinValue sentinels into the stats
      if (n == 0) return AudioStats(0L, fmt.getSampleRate.toInt, 0L, 0, 0)
      var (sum, min, max) = (0L, Int.MaxValue, Int.MinValue)
      var k = 0
      while (k < n) {
        // decoded stream preserves the source's little-endian layout
        val s =
          if (fmt.isBigEndian) (bytes(2 * k) << 8) | (bytes(2 * k + 1) & 0xFF)
          else (bytes(2 * k + 1) << 8) | (bytes(2 * k) & 0xFF)
        sum += s; if (s < min) min = s; if (s > max) max = s
        k += 1
      }
      AudioStats(n.toLong, fmt.getSampleRate.toInt, sum, min, max)
    } finally ain.close()
  }
}
