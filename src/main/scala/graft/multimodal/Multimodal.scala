package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * executor-side batches.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB ([[StubImageDecoder]]); everything
  * Spark-side — schema, batched mapPartitions signature, partitioning,
  * feature shapes — is real and tested. A production decoder implements
  * [[MediaDecoder.decodeBatch]] with the actual codec; the batch-iterator
  * shape matches what a vectorized (Arrow/pandas-style) UDF would see.
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

  /** Executor-parallel batched decode: mapPartitions grouped to the
    * decoder's batch size — the Scala analog of mapInPandas plumbing. */
  def decode(media: Dataset[MediaIn], decoder: MediaDecoder): Dataset[MediaFeatures] = {
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
