package graft.ext.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL media codecs over the JDK's own decoders — no stub.
  *
  * Images go through `javax.imageio` (`java.desktop` module: PNG, BMP,
  * JPEG, GIF read/write, fully headless); audio goes through
  * `javax.sound.sampled` (WAV/AIFF/AU PCM); video is a real RIFF/AVI
  * container ([[encodeAvi]]/[[decodeAvi]] — the JDK ships no video
  * codec, so the container walk is implemented here: LIST/chunk
  * traversal, `avih` header parse, `movi` frame iteration, `idx1`
  * index) with each frame a complete lossless PNG decoded by the same
  * `javax.imageio` path the still images use (the MPNG — "motion
  * PNG" — layout: full image files in `00dc` chunks, the MJPEG
  * container shape with a lossless per-frame codec so the
  * formula-replay oracle stays exact; MJPEG itself would make the
  * pixel sums JPEG-quantization-dependent and unreplayable).
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

  // ------------------------------------------ perceptual-hash corpus

  /** Planted near-dup image corpus for the perceptual-hash miner.
    *
    * Every 4 consecutive doc_ids form one FAMILY sharing a base
    * grayscale image (seeded from `doc_id / 4`); members differ by a
    * small brightness offset (`doc_id % 4`, saturating at 255 — the
    * "same picture re-exported slightly brighter" case) plus sparse
    * per-doc pixel noise (~1 in [[PhashNoiseMod]] cells gets +128 mod
    * 256 — the re-encode-artifact stand-in that gives family pairs a
    * genuine small-but-nonzero hamming distance instead of collapsing
    * to exact hash equality). Pair mass is therefore LINEAR in the
    * corpus (≤ 6 pairs per family) at every scale, unlike a corpus
    * keyed on raw (doc_id, i) formulas whose structural collisions
    * grow pair mass quadratically (measured: 2.1 M pairs at 80 k docs
    * before this design).
    *
    * The base-pixel mixer interleaves modular multiplies (mod
    * [[PhashP]], products < 2⁴⁷ — safe in BIGINT on both engines)
    * with xor-shifts: a pure multiply-mod LCG leaves piecewise-linear
    * structure across seeds (measured: 137 k accidental cross-family
    * hamming-≤3 pairs at 40 k docs; with the xor rounds: ZERO).
    * Geometry is ≥ 16×16 so all 72 dHash grid samples hit DISTINCT
    * cells — at the old 4..16-px widths adjacent grid columns
    * collapse onto the same pixel and force constant hash bits. */
  val PhashP = 1073741789L // PolyHash.P — largest prime below 2^30
  val PhashNoiseMod = 257L
  def phashSeed(docId: Long): Long = (docId / 4 % PhashP) * 48271 % PhashP
  def phashWidth(m1: Long): Int = (16 + m1 % 17).toInt // 16..32
  def phashHeight(m1: Long): Int = (16 + m1 % 13).toInt // 16..28
  def phashBase(m1: Long, cell: Long): Int = {
    var x = (m1 + cell * 104729L) % PhashP
    x = x * 69621L % PhashP
    x ^= x >> 10
    x = x * 48271L % PhashP
    x ^= x >> 15
    (x % 256L).toInt
  }
  def phashGray(docId: Long, m1: Long, cell: Long): Int = {
    val g = math.min(255, phashBase(m1, cell) + (docId % 4L).toInt)
    if (((docId % PhashP) * 65537L + cell * 8191L) % PhashP % PhashNoiseMod == 0L)
      (g + 128) % 256
    else g
  }

  /** Encode the planted-family grayscale image for `docId` as real
    * BMP (even ids) or PNG (odd) bytes — r = g = b = gray, so the
    * integer luma `(299r + 587g + 114b) / 1000` recovers the gray
    * value EXACTLY and the oracle replays [[phashGray]] alone. */
  def encodePhashImage(docId: Long): Array[Byte] = {
    val m1 = phashSeed(docId)
    val w = phashWidth(m1); val h = phashHeight(m1)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = phashGray(docId, m1, y.toLong * w + x)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, imgFormat(docId), out),
      s"no ${imgFormat(docId)} writer in this JVM")
    out.toByteArray
  }

  /** 64-bit difference hash (dHash) from DECODED pixels: nearest-
    * neighbor-sample an 8-row × 9-column grid of integer-luma grays
    * (`sy = r·H/8`, `sx = c·W/9` — exact integer downsampling, so the
    * oracle replays it without any resampling library; W ≥ 9, H ≥ 8
    * keeps the samples distinct) and set bit `r·8+c` when the left
    * gray is strictly darker than its right neighbor. Brightness
    * shifts preserve every comparison (the perceptual property the
    * hash exists for); localized pixel noise flips only the few bits
    * whose sampled cells it touches. Bit 63 (r=7, c=7) is always 0 —
    * a 63-comparison hash, because the DuckDB oracle cannot shift
    * into the BIGINT sign bit (the same reason the token SimHash
    * keeps bits 60-63 clear); hamming distances are unaffected.
    * Format is sniffed from the bytes by ImageIO, not trusted
    * metadata — same contract as [[decodeImage]]. */
  def dhash64(media: Array[Byte]): Long = {
    val img = ImageIO.read(new ByteArrayInputStream(media))
    require(img != null, "undecodable image blob")
    val w = img.getWidth; val h = img.getHeight
    require(w >= 9 && h >= 8,
      s"dhash64 needs >= 9x8 pixels for distinct grid samples, got ${w}x$h")
    def grayAt(sy: Int, sx: Int): Int = {
      val rgb = img.getRGB(sx, sy)
      (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
        114 * (rgb & 0xFF)) / 1000
    }
    var bits = 0L
    var r = 0
    while (r < 8) {
      val sy = r * h / 8
      var c = 0
      var prev = grayAt(sy, 0)
      while (c < 8) {
        val next = grayAt(sy, (c + 1) * w / 9)
        if (prev < next && r * 8 + c < 63) bits |= 1L << (r * 8 + c)
        prev = next
        c += 1
      }
      r += 1
    }
    bits
  }

  // -------------------------------------------------------------- audio

  val SampleRate = 8000f

  /** The JDK's WAVE codec providers, resolved ONCE per JVM.
    *
    * `AudioSystem.getAudioInputStream`/`AudioSystem.write` re-run a
    * provider lookup on EVERY call behind a process-global lock
    * (`JDK13Services` is synchronized) — measured on the first
    * `multimodal_audio_fp_pairs` rung: 32 decode tasks serialized onto
    * ~one core (load 1.19 during a full 475 k-clip wave; thread dumps
    * parked in `getAudioFileReaders`/`getAudioFileWriters`). The SPI
    * instances themselves are stateless and thread-safe, so resolve
    * the WAVE reader/writer once and call them directly; fall back to
    * the `AudioSystem` path only if service loading finds none (a
    * foreign JDK), keeping behavior identical. */
  private lazy val wavReader: Option[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    // minimal hand-built RIFF/WAVE probe (44-byte header + one 16-bit
    // sample) to pick the reader that actually parses WAVE
    val bb = java.nio.ByteBuffer.allocate(46)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(38)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(16000)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(2); bb.putShort(0)
    val probe = bb.array()
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala.find { r =>
        try { r.getAudioFileFormat(new ByteArrayInputStream(probe)); true }
        catch { case _: Exception => false }
      }
  }
  private lazy val wavWriter: Option[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    // probe with a REAL one-sample PCM_SIGNED stream, not just
    // isFileTypeSupported(WAVE): the JDK also ships WaveFloatFileWriter,
    // which claims WAVE but throws on integer PCM — a provider order
    // that lists it first would otherwise break every encode while the
    // wavSpiResolved pin stays green
    def pcmProbe(w: javax.sound.sampled.spi.AudioFileWriter): Boolean =
      try {
        val fmt = new AudioFormat(SampleRate, 16, 1, true, false)
        val ais = new AudioInputStream(
          new ByteArrayInputStream(Array[Byte](0, 0)), fmt, 1L)
        w.write(ais, AudioFileFormat.Type.WAVE, new ByteArrayOutputStream())
        true
      } catch { case _: Exception => false }
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala
      .find(w => w.isFileTypeSupported(AudioFileFormat.Type.WAVE) && pcmProbe(w))
  }
  /** Test pin: the once-per-JVM WAVE SPI fast path must be active on
    * this JDK — silently falling back to the lock-serialized
    * `AudioSystem` path would reintroduce the measured bottleneck. */
  def wavSpiResolved: Boolean = wavReader.isDefined && wavWriter.isDefined

  private def readWavStream(media: Array[Byte]): AudioInputStream =
    wavReader match {
      case Some(r) => r.getAudioInputStream(new ByteArrayInputStream(media))
      case None => AudioSystem.getAudioInputStream(new ByteArrayInputStream(media))
    }
  private def writeWavStream(ais: AudioInputStream, out: ByteArrayOutputStream): Unit =
    wavWriter match {
      case Some(w) => w.write(ais, AudioFileFormat.Type.WAVE, out)
      case None => AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    }

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
    writeWavStream(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong), out)
    out.toByteArray
  }

  final case class AudioStats(
      nFrames: Long, sampleRateHz: Int, sumSamples: Long,
      minSample: Int, maxSample: Int)

  /** REAL decode: parse the WAV container with the JDK sound stack
    * (header walk, format negotiation) and reduce the PCM frames to
    * exact integer stats. */
  def decodeWav(media: Array[Byte]): AudioStats = {
    val ain = readWavStream(media)
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

  // ------------------------------------ audio-fingerprint corpus + hash

  /** Planted near-dup AUDIO corpus for the fingerprint miner — the
    * waveform analogue of [[encodePhashImage]]'s families: every 4
    * consecutive doc_ids share a base waveform (seeded from
    * `doc_id / 4`); members differ by an integer GAIN (`doc_id % 4`
    * eighths above unity — the "same clip re-exported louder" case)
    * plus sparse additive sample noise (~1 in [[AfpNoiseMod]]). Base
    * samples are NON-NEGATIVE MULTIPLES OF 8 in [0, 20000], so a
    * member's `base/8*gain` is exact integer arithmetic: frame-energy
    * ORDER is preserved under gain exactly (the invariance [[afp64]]
    * exists for) and the max sample 20000/8*11+4096 = 31596 stays
    * inside signed 16-bit. The mixer interleaves modular multiplies
    * (mod [[PhashP]]) with xor-shifts — same rationale as the image
    * corpus (a pure LCG leaves cross-family linear structure). */
  val AfpNoiseMod = 193L
  val AfpFrames = 64
  def afpSeed(docId: Long): Long = (docId / 4 % PhashP) * 69621 % PhashP
  def afpSamplesPerFrame(m1: Long): Int = (24 + m1 % 17).toInt // 24..40
  def afpBase(m1: Long, k: Long): Int = {
    var x = (m1 + k * 92821L) % PhashP
    x = x * 48271L % PhashP
    x ^= x >> 11
    x = x * 69621L % PhashP
    x ^= x >> 13
    ((x % 2501L) * 8L).toInt // 0, 8, ..., 20000
  }
  def afpSample(docId: Long, m1: Long, k: Long): Int = {
    val s = afpBase(m1, k) / 8 * (8L + docId % 4L)
    if (((docId % PhashP) * 104729L + k * 65537L) % PhashP % AfpNoiseMod == 0L)
      (s + 4096L).toInt
    else s.toInt
  }

  /** Encode the planted-family clip for `docId` as a real RIFF/WAVE
    * container (16-bit mono PCM — the [[encodeWav]] path). Length is
    * exactly [[AfpFrames]] × samples-per-frame, so the fingerprint's
    * frames tile the clip with no partial tail. */
  def encodeAfpWav(docId: Long): Array[Byte] = {
    val m1 = afpSeed(docId)
    val n = AfpFrames * afpSamplesPerFrame(m1)
    val pcm = new Array[Byte](2 * n)
    var k = 0
    while (k < n) {
      val s = afpSample(docId, m1, k.toLong)
      pcm(2 * k) = (s & 0xFF).toByte
      pcm(2 * k + 1) = ((s >> 8) & 0xFF).toByte
      k += 1
    }
    val fmt = new AudioFormat(SampleRate, 16, 1, true, false)
    val out = new ByteArrayOutputStream()
    writeWavStream(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong), out)
    out.toByteArray
  }

  /** 64-bit audio fingerprint from DECODED PCM: split the clip into
    * [[AfpFrames]] equal frames (any partial tail is dropped —
    * deterministic for foreign clips; the planted corpus tiles
    * exactly), reduce each frame to its absolute-amplitude energy,
    * and set bit `f` when frame `f` is strictly quieter than frame
    * `f+1` — the delta-sign signature (dHash's comparison idea in
    * time). A uniform gain rescales every energy by the same positive
    * factor and preserves every comparison (the perceptual property);
    * localized noise flips only the bits whose frames it touches.
    * Bit 63 is always 0 (63 comparisons — the BIGINT-sign-free
    * convention shared with [[dhash64]] and the token SimHash), so
    * the DuckDB oracle replays it without shifting into the sign
    * bit. The container is parsed by the JDK sound stack, not
    * trusted metadata — same contract as [[decodeWav]]. */
  def afp64(media: Array[Byte]): Long = {
    val ain = readWavStream(media)
    val (bytes, bigEndian) =
      try {
        val fmt = ain.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"unexpected decoded format: $fmt")
        (ain.readAllBytes(), fmt.isBigEndian)
      } finally ain.close()
    val n = bytes.length / 2
    require(n >= AfpFrames,
      s"afp64 needs >= $AfpFrames PCM frames for distinct energies, got $n")
    val spf = n / AfpFrames
    val e = new Array[Long](AfpFrames)
    var f = 0
    while (f < AfpFrames) {
      var i = f * spf
      val end = i + spf
      var s = 0L
      while (i < end) {
        val x =
          if (bigEndian) (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xFF)
          else (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)
        s += math.abs(x.toLong)
        i += 1
      }
      e(f) = s
      f += 1
    }
    var bits = 0L
    var b = 0
    while (b < 63) {
      if (e(b) < e(b + 1)) bits |= 1L << b
      b += 1
    }
    bits
  }

  // -------------------------------------------------------------- video

  /** Deterministic synthetic video geometry/pixels for `doc_id` — the
    * (doc, frame, pixel) analogue of the image formula, with per-frame
    * drift terms so consecutive frames differ (a decode that returned
    * frame 0 N times would fail the oracle). All BIGINT-safe,
    * non-negative operands. */
  def vidFrames(docId: Long): Int = (2 + docId % 5).toInt // 2..6
  def vidWidth(docId: Long): Int = (4 + docId % 9).toInt // 4..12
  def vidHeight(docId: Long): Int = (4 + docId % 5).toInt // 4..8
  val VidFps = 10
  def vidPixelR(docId: Long, f: Long, i: Long): Int =
    ((docId * 7 + f * 19 + 11 * i) % 256).toInt
  def vidPixelG(docId: Long, f: Long, i: Long): Int =
    ((docId * 13 + f * 23 + 5 * i) % 256).toInt
  def vidPixelB(docId: Long, f: Long, i: Long): Int =
    ((docId * 29 + f * 31 + 3 * i) % 256).toInt

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def fcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("US-ASCII")
  }
  /** RIFF chunk: fourcc + LE32 size + payload + word-align pad. */
  private def riffChunk(id: String, payload: Array[Byte]): Array[Byte] =
    fcc(id) ++ le32(payload.length.toLong) ++ payload ++
      (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
  private def riffList(kind: String, payload: Array[Byte]): Array[Byte] =
    riffChunk("LIST", fcc(kind) ++ payload)

  /** Encode the synthetic video for `docId` as a REAL RIFF/AVI
    * container: `LIST hdrl` (`avih` main header + `LIST strl` with
    * `strh`/`strf` stream headers), `LIST movi` with one `00dc` chunk
    * per frame (each a complete lossless PNG — the MPNG layout), and
    * a standard `idx1` index. Every structural field is filled
    * honestly (frame count, dims, rate, sizes, keyframe flags), so
    * any AVI-aware reader can walk the file. */
  def encodeAvi(docId: Long): Array[Byte] = {
    val n = vidFrames(docId); val w = vidWidth(docId); val h = vidHeight(docId)
    val frames: IndexedSeq[Array[Byte]] = (0 until n).map { f =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = y.toLong * w + x
          img.setRGB(x, y,
            (vidPixelR(docId, f, i) << 16) |
              (vidPixelG(docId, f, i) << 8) | vidPixelB(docId, f, i))
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      require(ImageIO.write(img, "png", out), "no png writer in this JVM")
      out.toByteArray
    }
    val maxFrame = frames.map(_.length).max
    val avih =
      le32(1000000L / VidFps) ++ // dwMicroSecPerFrame
        le32(maxFrame.toLong * VidFps) ++ // dwMaxBytesPerSec
        le32(0) ++ // dwPaddingGranularity
        le32(0x10) ++ // dwFlags: AVIF_HASINDEX
        le32(n.toLong) ++ // dwTotalFrames
        le32(0) ++ // dwInitialFrames
        le32(1) ++ // dwStreams
        le32(maxFrame.toLong) ++ // dwSuggestedBufferSize
        le32(w.toLong) ++ le32(h.toLong) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0) // dwReserved[4]
    val strh =
      fcc("vids") ++ fcc("MPNG") ++
        le32(0) ++ // dwFlags
        le16(0) ++ le16(0) ++ // wPriority, wLanguage
        le32(0) ++ // dwInitialFrames
        le32(1) ++ le32(VidFps.toLong) ++ // dwScale / dwRate = fps
        le32(0) ++ // dwStart
        le32(n.toLong) ++ // dwLength (frames)
        le32(maxFrame.toLong) ++ // dwSuggestedBufferSize
        le32(0xFFFFFFFFL) ++ // dwQuality (default)
        le32(0) ++ // dwSampleSize (0: one sample per chunk)
        le16(0) ++ le16(0) ++ le16(w) ++ le16(h) // rcFrame
    val strf = // BITMAPINFOHEADER
      le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++
        le16(1) ++ le16(24) ++ // biPlanes, biBitCount
        fcc("MPNG") ++ // biCompression
        le32(w.toLong * h * 3) ++ // biSizeImage
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = riffList("hdrl",
      riffChunk("avih", avih) ++
        riffList("strl", riffChunk("strh", strh) ++ riffChunk("strf", strf)))
    val moviBody = frames.map(fb => riffChunk("00dc", fb))
    val movi = riffList("movi", moviBody.toArray.flatten)
    // idx1 offsets are relative to the 'movi' fourcc position; the
    // first chunk header starts 4 bytes after it
    val offsets = moviBody.scanLeft(4L)((off, c) => off + c.length).init
    val idx1 = riffChunk("idx1",
      offsets.zip(frames).flatMap { case (off, fb) =>
        fcc("00dc") ++ le32(0x10) /* AVIIF_KEYFRAME */ ++
          le32(off) ++ le32(fb.length.toLong)
      }.toArray)
    val riffBody = fcc("AVI ") ++ hdrl ++ movi ++ idx1
    fcc("RIFF") ++ le32(riffBody.length.toLong) ++ riffBody
  }

  final case class VideoStats(
      nFrames: Long, width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long)

  /** REAL decode: walk the RIFF/AVI container structure (chunk
    * traversal with word-aligned sizes, nested LISTs, `avih` main
    * header, `movi` frame chunks) and decode every `00dc` frame with
    * `javax.imageio`, reducing the pixel grids to exact integer
    * channel sums. Dimensions come from the DECODED frames, not the
    * headers; the `avih` declared frame count is cross-checked
    * against the frames actually found (container-integrity check —
    * a walk that missed or double-counted chunks fails loudly). */
  def decodeAvi(media: Array[Byte]): VideoStats = {
    def fourccAt(p: Int): String =
      new String(media, p, 4, "US-ASCII")
    def u32At(p: Int): Long =
      (media(p) & 0xFFL) | ((media(p + 1) & 0xFFL) << 8) |
        ((media(p + 2) & 0xFFL) << 16) | ((media(p + 3) & 0xFFL) << 24)
    require(media.length >= 12 && fourccAt(0) == "RIFF" && fourccAt(8) == "AVI ",
      "not a RIFF/AVI blob")
    val riffEnd = math.min(media.length.toLong, 8L + u32At(4)).toInt
    var declaredFrames = -1L
    var nFrames = 0L
    var (w, h) = (-1, -1)
    var (sr, sg, sb) = (0L, 0L, 0L)
    def walk(from: Int, to: Int, inHdrl: Boolean, inMovi: Boolean): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val id = fourccAt(pos)
        val size = u32At(pos + 4).toInt
        val body = pos + 8
        require(body + size <= to, s"chunk '$id' overruns its parent list")
        if (id == "LIST") {
          val kind = fourccAt(body)
          walk(body + 4, body + size,
            inHdrl = kind == "hdrl", inMovi = kind == "movi")
        } else if (inHdrl && id == "avih") {
          declaredFrames = u32At(body + 16) // dwTotalFrames
        } else if (inMovi && id == "00dc") {
          val img = ImageIO.read(
            new ByteArrayInputStream(media, body, size))
          require(img != null, s"undecodable frame at offset $body")
          require(w < 0 || (img.getWidth == w && img.getHeight == h),
            "inconsistent frame dimensions")
          w = img.getWidth; h = img.getHeight
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
              x += 1
            }
            y += 1
          }
          nFrames += 1
        }
        pos = body + size + (size & 1) // word-aligned
      }
    }
    walk(12, riffEnd, inHdrl = false, inMovi = false)
    require(nFrames > 0, "no video frames found in movi list")
    require(declaredFrames == nFrames,
      s"avih declares $declaredFrames frames, movi holds $nFrames")
    VideoStats(nFrames, w, h, sr, sg, sb)
  }
}
