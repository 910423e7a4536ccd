package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * executor-side batches.
  *
  * Two decoders behind one [[MediaDecoder]] contract:
  *  - [[ImageIoDecoder]] — a REAL image decoder on the JDK's
  *    `javax.imageio` (PNG/BMP/JPEG/GIF, zero external deps): dimensions +
  *    a normalized grayscale histogram feature vector. Spec-gated on real
  *    in-test-generated images (no DuckDB oracle can decode PNG).
  *  - [[StubImageDecoder]] — a deterministic stand-in kept for the driver
  *    fixtures, whose `binary` payloads are synthesized text bytes (not
  *    images) and whose features must be DuckDB-reproducible for the
  *    `multimodal_features` oracle.
  * Everything Spark-side — schema, batched mapPartitions signature,
  * partitioning, feature shapes — is shared by both; the batch-iterator
  * shape matches what a vectorized (Arrow/pandas-style) UDF would see.
  *
  * Audio: [[WavPcmDecoder]] is a REAL decoder on the JDK's
  * `javax.sound.sampled` (WAV/AIFF/AU PCM ship in java.desktop — no
  * external codecs): sample rate / channels / frame count + an RMS energy
  * envelope feature vector. Video codecs are NOT in the JDK and stay a
  * stub behind the same batched contract ([[sampleFrames]]).
  */
object Multimodal {

  /** One media row in: opaque payload + source id. */
  final case class MediaIn(media_id: Long, bytes: Array[Byte])

  /** Decoded features out: typed metadata + dense feature vector. */
  final case class MediaFeatures(
      media_id: Long, byte_len: Long,
      width: Int, height: Int, features: Array[Float])

  /** Batched decode contract: one call per executor-side batch, mirroring a
    * vectorized UDF's batch shape (bytes in, features out, order kept). */
  trait MediaDecoder extends Serializable {
    def batchSize: Int
    def decodeBatch(batch: Seq[MediaIn]): Seq[MediaFeatures]
  }

  /** STUB decoder — deterministic stand-in for a real image codec.
    * Dimensions derive from byte length only (so the DuckDB oracle can
    * mirror them); features are a fixed-size byte-histogram sketch. */
  final case class StubImageDecoder(batchSize: Int = 64, nFeatures: Int = 32)
      extends MediaDecoder {
    def decodeBatch(batch: Seq[MediaIn]): Seq[MediaFeatures] = batch.map { m =>
      val len = m.bytes.length
      // ??? real codec goes here; deterministic fake below
      val width = 64 + (len % 64)
      val height = 64 + ((len / 64) % 64)
      val feats = new Array[Float](nFeatures)
      var i = 0
      while (i < len) { feats(java.lang.Math.floorMod(m.bytes(i), nFeatures)) += 1f; i += 1 }
      if (len > 0) { var j = 0; while (j < nFeatures) { feats(j) /= len; j += 1 } }
      MediaFeatures(m.media_id, len.toLong, width, height, feats)
    }
  }

  /** REAL image decoder on the JDK's ImageIO (PNG/BMP/JPEG/GIF — no
    * external codecs needed). Features: normalized grayscale histogram
    * over `nFeatures` buckets (integer Rec.601 luma, deterministic for the
    * lossless formats). Undecodable payloads yield a defined sentinel row
    * (width = height = −1, zero features) so a pipeline can filter rather
    * than crash on a corrupt blob — the contract a 100 TB media sweep
    * needs. Per-pixel getRGB is fine for feature extraction; a production
    * resize/transcode path would go straight at the raster. */
  final case class ImageIoDecoder(batchSize: Int = 64, nFeatures: Int = 32)
      extends MediaDecoder {
    def decodeBatch(batch: Seq[MediaIn]): Seq[MediaFeatures] = batch.map { m =>
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.bytes))
        // NonFatal, not just IOException: plugin readers throw unchecked
        // exceptions (IllegalArgument/ArrayIndexOutOfBounds/…) on
        // malformed-but-recognized payloads — those must become the
        // sentinel row too, not a task failure
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null)
        MediaFeatures(m.media_id, m.bytes.length.toLong, -1, -1, new Array[Float](nFeatures))
      else {
        val w = img.getWidth; val h = img.getHeight
        val feats = new Array[Float](nFeatures)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            val gray = (r * 299 + g * 587 + b * 114) / 1000
            feats(gray * nFeatures / 256) += 1f
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        var j = 0
        while (j < nFeatures) { feats(j) /= n; j += 1 }
        MediaFeatures(m.media_id, m.bytes.length.toLong, w, h, feats)
      }
    }
  }

  /** Executor-parallel batched decode: mapPartitions grouped to the
    * decoder's batch size — the Scala analog of mapInPandas plumbing. */
  def decode(media: Dataset[MediaIn], decoder: MediaDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(decoder.batchSize).flatMap(decoder.decodeBatch))
  }

  /** Decoded audio features: typed metadata + RMS energy envelope. */
  final case class AudioFeatures(
      media_id: Long, byte_len: Long,
      sample_rate: Int, channels: Int, n_frames: Long,
      features: Array[Float])

  /** Batched audio decode contract (same shape as [[MediaDecoder]]). */
  trait AudioDecoder extends Serializable {
    def batchSize: Int
    def decodeBatch(batch: Seq[MediaIn]): Seq[AudioFeatures]
  }

  /** REAL audio decoder on the JDK's `javax.sound.sampled` (WAV/AIFF/AU,
    * PCM signed/unsigned 8/16-bit — the formats java.desktop decodes with
    * zero external deps). Features: the RMS energy envelope over
    * `nWindows` equal time slices of the channel-averaged signal — the
    * first-pass audio quality/VAD signal (silence ≈ 0, clipping ≈ 1).
    * Undecodable or unsupported payloads yield the sentinel row
    * (sample_rate = channels = −1, zero features), same
    * filter-don't-crash contract as [[ImageIoDecoder]]. */
  final case class WavPcmDecoder(batchSize: Int = 64, nWindows: Int = 16)
      extends AudioDecoder {
    def decodeBatch(batch: Seq[MediaIn]): Seq[AudioFeatures] = batch.map { m =>
      val sentinel = AudioFeatures(m.media_id, m.bytes.length.toLong,
        -1, -1, 0L, new Array[Float](nWindows))
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(m.bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (in == null) sentinel
      else try {
        val f = in.getFormat
        val enc = f.getEncoding
        val bits = f.getSampleSizeInBits
        val ok = (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED) &&
          (bits == 8 || bits == 16)
        if (!ok) sentinel
        else {
          val bytes = in.readAllBytes()
          val ch = f.getChannels
          val bytesPerSample = bits / 8
          val frameBytes = ch * bytesPerSample
          val nFrames = bytes.length / frameBytes
          // channel-averaged normalized samples in [-1, 1]
          val mono = new Array[Double](nFrames)
          var i = 0
          while (i < nFrames) {
            var c = 0; var acc = 0.0
            while (c < ch) {
              val off = i * frameBytes + c * bytesPerSample
              val s =
                if (bits == 16) {
                  val raw = if (f.isBigEndian) (bytes(off) << 8) | (bytes(off + 1) & 0xff)
                            else (bytes(off + 1) << 8) | (bytes(off) & 0xff)
                  // unsigned 16-bit centers at 0x8000 (mid-scale silence) —
                  // decoding it as signed would turn silence into full-scale
                  if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
                    raw.toShort / 32768.0
                  else ((raw & 0xffff) - 32768) / 32768.0
                } else { // 8-bit
                  if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
                    bytes(off) / 128.0
                  else ((bytes(off) & 0xff) - 128) / 128.0
                }
              acc += s; c += 1
            }
            mono(i) = acc / ch; i += 1
          }
          // RMS per equal-width window
          val feats = new Array[Float](nWindows)
          if (nFrames > 0) {
            var w = 0
            while (w < nWindows) {
              val lo = (w.toLong * nFrames / nWindows).toInt
              val hi = ((w + 1).toLong * nFrames / nWindows).toInt
              var s = 0.0; var j = lo
              while (j < hi) { s += mono(j) * mono(j); j += 1 }
              feats(w) = if (hi > lo) math.sqrt(s / (hi - lo)).toFloat else 0f
              w += 1
            }
          }
          AudioFeatures(m.media_id, m.bytes.length.toLong,
            f.getSampleRate.toInt, ch, nFrames.toLong, feats)
        }
      } catch { case scala.util.control.NonFatal(_) => sentinel }
      finally in.close()
    }
  }

  /** Executor-parallel batched audio decode (same plumbing as [[decode]]). */
  def decodeAudio(media: Dataset[MediaIn], decoder: AudioDecoder): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(decoder.batchSize).flatMap(decoder.decodeBatch))
  }

  /** "Frame sampling" for video-like payloads: every `stride`-th slice of
    * `frameLen` bytes becomes a frame row (stub for real frame extraction;
    * the explode-to-frames relational shape is the real contract). */
  def sampleFrames(media: Dataset[MediaIn], frameLen: Int, stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.bytes.grouped(frameLen).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (frame, idx) => (m.media_id, idx, frame) }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Fixture media from documents: utf-8 text bytes as the opaque payload
    * (deterministic; real corpora would read image/audio files). */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaIn] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("media_id"), encode(col("text"), "utf-8").as("bytes"))
      .as[MediaIn]
  }
}
