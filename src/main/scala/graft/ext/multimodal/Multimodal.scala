package graft.ext.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata travelling with every media blob. */
case class MediaMeta(
    mediaType: String,   // "image" | "audio" | "video"
    format: String,      // container/codec tag, e.g. "png", "wav"
    width: Int,
    height: Int,
    durationMs: Long)

/** One multimodal record: the payload is an opaque binary column —
  * the engine never interprets it except inside the decode stubs. */
case class MediaRecord(id: Long, media: Array[Byte], meta: MediaMeta)

/** Decoded-feature row produced by the (stubbed) decoder. */
case class MediaFeatures(
    id: Long,
    mediaType: String,
    nBytes: Long,
    features: Array[Float])

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The Spark-side plumbing is real and tested: schemas, encoders,
  * partition-preserving `mapPartitions` stages (the Scala analogue of
  * `mapInPandas` batch UDFs), and batch shapes. Decoding is REAL for
  * all three modalities: images (BMP/PNG via `javax.imageio` —
  * [[MediaCodecs.decodeImage]]), audio (RIFF/WAVE PCM via
  * `javax.sound.sampled` — [[MediaCodecs.decodeWav]]), and video
  * (RIFF/AVI container walk with lossless PNG frames decoded by
  * `javax.imageio` — [[MediaCodecs.decodeAvi]]; the container
  * traversal is implemented in-repo because the JDK ships no video
  * codec, while per-frame pixel decode rides the same JDK image path
  * the stills use).
  *
  * Scale posture: decode is a per-partition map with no shuffle;
  * binary payloads stay columnar in parquet; feature extraction emits
  * fixed-width `array<float>` ready for [[graft.ext.similarity.CosineKNN]].
  */
object Multimodal {

  /** Deterministic BYTE-LEVEL stages for the mixed-type plumbing
    * queries ([[syntheticCorpus]] payloads are text bytes, not real
    * containers — those queries exercise schema/partitioning/batch
    * shape, and their oracles replay these byte formulas exactly).
    * Real per-modality decode lives in [[MediaCodecs]]
    * (`decodeImage`/`decodeWav`/`decodeAvi` — all three modalities);
    * the byte-histogram here doubles as the media-type-agnostic
    * fallback featurizer for corpora where payload formats are
    * heterogeneous or unknown. */
  object DecoderStub {
    /** "Decode + feature-extract": 16-bin byte histogram, L1-normalized. */
    def extractFeatures(media: Array[Byte]): Array[Float] = {
      val bins = new Array[Float](16)
      media.foreach(b => bins((b & 0xFF) / 16) += 1f)
      val total = math.max(1f, media.length.toFloat)
      bins.map(_ / total)
    }
    /** "Resize": proportional byte truncation standing in for pixel scaling. */
    def resize(media: Array[Byte], scalePercent: Int): Array[Byte] =
      media.take(math.max(1, media.length * scalePercent / 100))
    /** "Frame sample": every k-th byte standing in for every k-th frame. */
    def sampleFrames(media: Array[Byte], everyK: Int): Array[Byte] =
      media.zipWithIndex.collect { case (b, i) if i % everyK == 0 => b }
  }

  /** Synthesize a deterministic media corpus from the documents table
    * (texts become payload bytes) — the test/bench stand-in for a real
    * binary ingest. */
  def syntheticCorpus(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    // no spread here (r15): the payload is a cheap byte copy and the
    // consumers (meta/stages/knn) are sub-second — the exchange
    // measured as a net loss (0.35 → 0.52 s multimodal_meta), unlike
    // the real-codec corpora below
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val mediaType = Seq("image", "audio", "video")((id % 3).toInt)
      MediaRecord(id, bytes,
        MediaMeta(mediaType, if (mediaType == "image") "png" else "wav",
          width = bytes.length min 1024, height = 256,
          durationMs = bytes.length.toLong * 10))
    }
  }

  /** Synthesize a corpus of REAL image blobs (BMP for even doc ids,
    * PNG for odd — two genuinely different container formats through
    * one decode path). Pixels follow [[MediaCodecs]]' pure integer
    * formula of (doc_id, pixel index) so a SQL oracle can replay the
    * decoded stats without any image library. */
  def imageCorpus(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    // spread first (r15; the phashCorpus rule — encode + the fused
    // downstream decode otherwise run on a single scan task)
    docs.select(col("doc_id")).repartition(par).as[Long].map { id =>
      val bytes = MediaCodecs.encodeImage(id)
      MediaRecord(id, bytes,
        MediaMeta("image", MediaCodecs.imgFormat(id),
          MediaCodecs.imgWidth(id), MediaCodecs.imgHeight(id), 0L))
    }
  }

  /** One decoded image per record. */
  case class ImageDecodeRow(
      id: Long, format: String, width: Int, height: Int,
      n_px: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL image decode as a partition-preserving batch map: every
    * output value is computed from pixels `javax.imageio` parsed out
    * of the binary column (dimensions included — metadata is not
    * consulted). */
  def decodeImages(records: Dataset[MediaRecord]): Dataset[ImageDecodeRow] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map { r =>
      val st = MediaCodecs.decodeImage(r.media)
      ImageDecodeRow(r.id, r.meta.format, st.width, st.height,
        st.width.toLong * st.height, st.sumR, st.sumG, st.sumB)
    })
  }

  /** Synthesize a corpus of REAL RIFF/WAVE blobs (16-bit mono PCM),
    * samples from [[MediaCodecs]]' pure formula of (doc_id, frame). */
  def audioCorpus(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    // no spread (r15): PCM encode/decode is cheap enough that the
    // exchange measured as a net loss (0.34 → 0.42 s) — see
    // syntheticCorpus
    docs.select(col("doc_id")).as[Long].map { id =>
      val bytes = MediaCodecs.encodeWav(id)
      MediaRecord(id, bytes,
        MediaMeta("audio", "wav", 0, 0,
          MediaCodecs.audioFrames(id).toLong * 1000 / MediaCodecs.SampleRate.toLong))
    }
  }

  /** One decoded audio clip per record. */
  case class AudioDecodeRow(
      id: Long, n_frames: Long, sample_rate_hz: Int,
      sum_samples: Long, min_sample: Int, max_sample: Int)

  /** REAL audio decode: `javax.sound.sampled` walks the RIFF header,
    * negotiates the PCM format, and streams the frames. */
  def decodeAudio(records: Dataset[MediaRecord]): Dataset[AudioDecodeRow] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map { r =>
      val st = MediaCodecs.decodeWav(r.media)
      AudioDecodeRow(r.id, st.nFrames, st.sampleRateHz,
        st.sumSamples, st.minSample, st.maxSample)
    })
  }

  /** Synthesize a corpus of REAL RIFF/AVI blobs (lossless PNG frames
    * in `00dc` chunks — the MPNG layout), frame pixels from
    * [[MediaCodecs]]' pure formula of (doc_id, frame, pixel index) so
    * a SQL oracle can replay the decoded stats without any codec. */
  def videoCorpus(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    // spread first (r15; the phashCorpus rule)
    docs.select(col("doc_id")).repartition(par).as[Long].map { id =>
      val bytes = MediaCodecs.encodeAvi(id)
      MediaRecord(id, bytes,
        MediaMeta("video", "avi",
          MediaCodecs.vidWidth(id), MediaCodecs.vidHeight(id),
          MediaCodecs.vidFrames(id).toLong * 1000 / MediaCodecs.VidFps))
    }
  }

  /** One decoded video per record. */
  case class VideoDecodeRow(
      id: Long, n_frames: Long, width: Int, height: Int,
      n_px: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL video decode as a partition-preserving batch map: the AVI
    * container is walked chunk-by-chunk and every frame's pixels come
    * out of `javax.imageio` ([[MediaCodecs.decodeAvi]]); dimensions
    * and frame counts are taken from what was actually decoded, with
    * the header cross-checked against it. */
  def decodeVideos(records: Dataset[MediaRecord]): Dataset[VideoDecodeRow] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map { r =>
      val st = MediaCodecs.decodeAvi(r.media)
      VideoDecodeRow(r.id, st.nFrames, st.width, st.height,
        st.nFrames * st.width * st.height, st.sumR, st.sumG, st.sumB)
    })
  }

  /** Synthesize the planted-near-dup image corpus for the perceptual
    * hash miner (see [[MediaCodecs.encodePhashImage]]: 4-doc families
    * sharing a base image, brightness-offset + sparse-noise members;
    * BMP for even ids, PNG for odd). The docs frame is spread first —
    * encode is the heavy per-row work and a single-file scan would
    * otherwise run it on one task (the
    * [[graft.ext.dedup.NearDup.withSimhash]] rationale). */
  def phashCorpus(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    docs.select(col("doc_id")).repartition(par).as[Long].map { id =>
      val bytes = MediaCodecs.encodePhashImage(id)
      val m1 = MediaCodecs.phashSeed(id)
      MediaRecord(id, bytes,
        MediaMeta("image", MediaCodecs.imgFormat(id),
          MediaCodecs.phashWidth(m1), MediaCodecs.phashHeight(m1), 0L))
    }
  }

  /** REAL perceptual hashing as a partition-preserving batch map:
    * every signature comes from pixels ImageIO parsed out of the
    * binary column ([[MediaCodecs.dhash64]]). Output is the (doc,
    * sim) shape [[graft.ext.dedup.NearDup]]'s hamming miner consumes. */
  def dhashImages(records: Dataset[MediaRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map(r => (r.id, MediaCodecs.dhash64(r.media))))
      .toDF("doc", "sim")
  }

  /** Synthesize the planted-near-dup AUDIO corpus for the fingerprint
    * miner (see [[MediaCodecs.encodeAfpWav]]: 4-doc families sharing a
    * base waveform, gain-shifted + sparse-noise members; real
    * RIFF/WAVE blobs). Spread first, like [[phashCorpus]] — encode is
    * the heavy per-row work. */
  def afpCorpus(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    docs.select(col("doc_id")).repartition(par).as[Long].map { id =>
      val m1 = MediaCodecs.afpSeed(id)
      val n = MediaCodecs.AfpFrames * MediaCodecs.afpSamplesPerFrame(m1)
      MediaRecord(id, MediaCodecs.encodeAfpWav(id),
        MediaMeta("audio", "wav", 0, 0,
          n.toLong * 1000 / MediaCodecs.SampleRate.toLong))
    }
  }

  /** REAL audio fingerprinting as a partition-preserving batch map:
    * every signature comes from PCM the JDK sound stack parsed out of
    * the binary column ([[MediaCodecs.afp64]]). Output is the (doc,
    * sim) shape [[graft.ext.dedup.NearDup]]'s hamming miner consumes. */
  def afpHashes(records: Dataset[MediaRecord]): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map(r => (r.id, MediaCodecs.afp64(r.media))))
      .toDF("doc", "sim")
  }

  /** Feature extraction as a partition-preserving batch map — the
    * `mapInPandas` analogue: one decoder init per partition, rows
    * streamed through it. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition decoder init would go here (codec handles etc.)
      it.map(r => MediaFeatures(
        r.id, r.meta.mediaType, r.media.length.toLong,
        DecoderStub.extractFeatures(r.media)))
    }
  }

  /** Resize stage (binary → binary, metadata updated consistently). */
  def resize(records: Dataset[MediaRecord], scalePercent: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map { r =>
      val resized = DecoderStub.resize(r.media, scalePercent)
      r.copy(media = resized,
        meta = r.meta.copy(width = resized.length min 1024))
    })
  }

  /** Frame sampling for video-typed rows; others pass through. */
  def sampleFrames(records: Dataset[MediaRecord], everyK: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map { r =>
      if (r.meta.mediaType != "video") r
      else r.copy(media = DecoderStub.sampleFrames(r.media, everyK))
    })
  }
}
