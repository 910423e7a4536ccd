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
  * envelope feature vector.
  *
  * Video: [[GifVideoDecoder]] is a REAL multi-frame decoder on ImageIO's
  * GIF plugin (animated GIF is the one video-like container the JDK
  * decodes with zero external deps): frames are composited onto the
  * logical screen at their declared offsets and reduced to a mean-luma
  * motion envelope; [[extractVideoFrames]] is the decoded analog of the
  * byte-slicing [[sampleFrames]] shape. [[Gif.encodeAnimatedGif]] closes
  * the encode→decode loop so fixtures round-trip deterministically.
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
        // memory-cache stream: the InputStream overload wraps a FILE-cache
        // stream internally (temp-file I/O per payload)
        try javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(m.bytes)): javax.imageio.stream.ImageInputStream)
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

  /** Decoded video features: container metadata + mean-luma motion
    * envelope over `nWindows` equal slices of the composited frame
    * sequence. */
  final case class VideoFeatures(
      media_id: Long, byte_len: Long,
      width: Int, height: Int, n_frames: Int,
      features: Array[Float])

  /** Batched video decode contract (same shape as [[MediaDecoder]]). */
  trait VideoDecoder extends Serializable {
    def batchSize: Int
    def decodeBatch(batch: Seq[MediaIn]): Seq[VideoFeatures]
  }

  /** REAL video decoder on ImageIO's GIF plugin — animated GIF (and any
    * other multi-frame container ImageIO claims) decoded frame by frame,
    * each frame composited onto the logical screen at its declared offset
    * ("do not dispose" approximation: deterministic, and exact for
    * full-frame sequences). Features: mean integer-Rec.601 luma of the
    * composited canvas per window of `nWindows` equal frame-sequence
    * slices — the first-pass brightness/motion envelope a video quality
    * sweep needs. Undecodable payloads yield the sentinel row
    * (width = height = n_frames = −1, zero features), same
    * filter-don't-crash contract as the image/audio decoders. */
  final case class GifVideoDecoder(batchSize: Int = 16, nWindows: Int = 16)
      extends VideoDecoder {
    def decodeBatch(batch: Seq[MediaIn]): Seq[VideoFeatures] = batch.map { m =>
      val sentinel = VideoFeatures(m.media_id, m.bytes.length.toLong,
        -1, -1, -1, new Array[Float](nWindows))
      try {
        val lumas = scala.collection.mutable.ArrayBuffer.empty[Double]
        Gif.foreachCompositedFrame(m.bytes) { (_, canvas) =>
          lumas += Gif.meanLuma(canvas)
        } match {
          case None => sentinel
          case Some((w, h, n)) =>
            val feats = new Array[Float](nWindows)
            var win = 0
            while (win < nWindows) {
              val lo = win * n / nWindows; val hi = (win + 1) * n / nWindows
              var s = 0.0; var j = lo
              while (j < hi) { s += lumas(j); j += 1 }
              feats(win) = if (hi > lo) (s / (hi - lo)).toFloat else 0f
              win += 1
            }
            VideoFeatures(m.media_id, m.bytes.length.toLong, w, h, n, feats)
        }
      } catch { case scala.util.control.NonFatal(_) => sentinel }
    }
  }

  /** Executor-parallel batched video decode (same plumbing as [[decode]]). */
  def decodeVideo(media: Dataset[MediaIn], decoder: VideoDecoder): Dataset[VideoFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(decoder.batchSize).flatMap(decoder.decodeBatch))
  }

  /** REAL frame extraction: every `stride`-th composited frame of an
    * ImageIO-decodable payload becomes a row with its dimensions and mean
    * luma — the decoded analog of the byte-slicing [[sampleFrames]]
    * contract. Undecodable payloads yield one sentinel row
    * (frame_idx = −1) so a corpus sweep filters instead of crashing. */
  def extractVideoFrames(media: Dataset[MediaIn], stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int, Int, Double)]
      val meta =
        try Gif.foreachCompositedFrame(m.bytes) { (i, canvas) =>
          if (i % stride == 0)
            rows += ((m.media_id, i, canvas.getWidth, canvas.getHeight,
              Gif.meanLuma(canvas)))
        } catch { case scala.util.control.NonFatal(_) => None }
      if (meta.isEmpty) Seq((m.media_id, -1, -1, -1, 0.0)) else rows.toSeq
    }.toDF("media_id", "frame_idx", "width", "height", "mean_luma")
  }

  /** Deterministic animated-GIF fixtures from documents: a doc_id-keyed
    * solid-gray frame sequence whose container metadata (width, height,
    * frame count) is a pure function of doc_id — so the DuckDB oracle can
    * gate the REAL encode→decode round-trip ([[Gif.encodeAnimatedGif]] →
    * [[GifVideoDecoder]]) without itself decoding GIF. */
  def videoFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaIn] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
      // codec work must parallelize by ROWS, not input splits (the fixture
      // table is one row-group — its scan is a single task otherwise)
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      // ONE writer per partition: the ImageIO service-registry lookup and
      // writer construction are per-use costs worth amortizing across a
      // partition's thousands of tiny encodes (the writer is reusable —
      // setOutput resets its state; not shared across threads)
      .mapPartitions { ids =>
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        ids.map { id =>
          val w = (8 + id % 16).toInt
          val h = (8 + (id / 16) % 16).toInt
          val n = (2 + id % 3).toInt
          val frames = (0 until n).map { f =>
            val v = ((id * 37 + f * 97) % 256).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = img.createGraphics()
            g.setColor(new java.awt.Color(v, v, v)); g.fillRect(0, 0, w, h); g.dispose()
            img
          }
          MediaIn(id, Gif.encodeAnimatedGif(frames, writer))
        }
      }
  }

  /** "Frame sampling" for video-like payloads: every `stride`-th slice of
    * `frameLen` bytes becomes a frame row (the relational explode-to-
    * frames shape over raw bytes; [[extractVideoFrames]] is the decoded
    * counterpart). */
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

/** Pure-JDK GIF codec helpers: multi-frame decode with logical-screen
  * compositing, and an animated-GIF sequence encoder — both on ImageIO's
  * built-in GIF plugin (no external codecs). */
object Gif {
  import java.awt.image.BufferedImage
  import javax.imageio.{IIOImage, ImageIO, ImageReader}
  import javax.imageio.metadata.IIOMetadataNode
  import scala.util.control.NonFatal

  /** Decode an ImageIO-readable payload frame by frame, compositing each
    * frame onto the logical canvas at its declared offset ("do not
    * dispose" approximation), visiting the canvas after each composite.
    * Returns (width, height, frameCount); None when no installed reader
    * claims the payload. Decode errors propagate — callers own the
    * sentinel policy. */
  def foreachCompositedFrame(bytes: Array[Byte])(
      visit: (Int, BufferedImage) => Unit): Option[(Int, Int, Int)] = {
    // explicit memory-cache stream: ImageIO.createImageInputStream defaults
    // to a FILE-cache stream (temp-file I/O per payload) — a corpus decode
    // sweep must stay in memory
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      reader.setInput(iis) // seekForwardOnly=false: getNumImages may search
      try {
        val isGif = reader.getFormatName.equalsIgnoreCase("gif")
        val n = reader.getNumImages(true)
        if (n <= 0) return None
        // GIF frames can be sub-rectangles of the logical screen; other
        // (single-frame) formats fall back to frame-0 dimensions
        val (w, h) =
          if (isGif) logicalScreen(reader).getOrElse((reader.getWidth(0), reader.getHeight(0)))
          else (reader.getWidth(0), reader.getHeight(0))
        val canvas = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g = canvas.createGraphics()
        try {
          var i = 0
          while (i < n) {
            val frame = reader.read(i)
            val (x, y) = if (isGif) frameOffset(reader, i) else (0, 0)
            g.drawImage(frame, x, y, null)
            visit(i, canvas)
            i += 1
          }
        } finally g.dispose()
        Some((w, h, n))
      } finally reader.dispose()
    } finally iis.close()
  }

  private def logicalScreen(reader: ImageReader): Option[(Int, Int)] =
    try {
      val tree = reader.getStreamMetadata.getAsTree("javax_imageio_gif_stream_1.0")
        .asInstanceOf[IIOMetadataNode]
      child(tree, "LogicalScreenDescriptor").map(d =>
        (d.getAttribute("logicalScreenWidth").toInt,
          d.getAttribute("logicalScreenHeight").toInt))
    } catch { case NonFatal(_) => None }

  private def frameOffset(reader: ImageReader, i: Int): (Int, Int) =
    try {
      val tree = reader.getImageMetadata(i).getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[IIOMetadataNode]
      child(tree, "ImageDescriptor").map(d =>
        (d.getAttribute("imageLeftPosition").toInt,
          d.getAttribute("imageTopPosition").toInt)).getOrElse((0, 0))
    } catch { case NonFatal(_) => (0, 0) }

  private def child(n: IIOMetadataNode, name: String): Option[IIOMetadataNode] = {
    val kids = n.getChildNodes
    (0 until kids.getLength).map(kids.item).collectFirst {
      case e: IIOMetadataNode if e.getNodeName == name => e
    }
  }

  /** Mean integer-Rec.601 luma over the image (same per-pixel arithmetic
    * as [[Multimodal.ImageIoDecoder]], so solid gray v → exactly v). */
  def meanLuma(img: BufferedImage): Double = {
    val w = img.getWidth; val h = img.getHeight
    var s = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        s += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        x += 1
      }
      y += 1
    }
    s.toDouble / (w.toLong * h)
  }

  /** Encode frames as an animated GIF (full frames at origin) with the
    * JDK's GIF sequence writer. */
  def encodeAnimatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try encodeAnimatedGif(frames, writer) finally writer.dispose()
  }

  /** [[encodeAnimatedGif]] with a caller-owned writer — amortizes the
    * registry lookup + writer construction across a partition of encodes
    * (setOutput resets writer state between uses; single-threaded use
    * only). Memory-cache output stream: the default file-cache stream
    * costs temp-file I/O per payload. */
  def encodeAnimatedGif(frames: Seq[BufferedImage],
                        writer: javax.imageio.ImageWriter): Array[Byte] = {
    require(frames.nonEmpty, "animated GIF needs at least one frame")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f => writer.writeToSequence(new IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally ios.close()
    bos.toByteArray
  }
}
