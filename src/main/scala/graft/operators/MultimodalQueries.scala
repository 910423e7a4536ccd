package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal pipeline as a gate-checked query: binary payloads decoded in
  * executor batches; metadata derives only from byte length so DuckDB can
  * oracle the full output except the feature vector (whose shape is
  * asserted via n_features). */
object MultimodalQueries {

  def multimodalFeatures(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.decode(
        Multimodal.mediaFromDocuments(spark, sfDir),
        Multimodal.StubImageDecoder())
      .toDF()
      .select(
        col("media_id"),
        col("byte_len"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        size(col("features")).cast("long").as("n_features"))
      .orderBy("media_id")

  /** REAL video round-trip as an oracle-gated query: doc_id-keyed
    * animated GIFs are encoded then decoded executor-side
    * ([[Multimodal.Gif.encodeAnimatedGif]] → [[Multimodal.GifVideoDecoder]]);
    * the container metadata the decoder must recover (width, height,
    * frame count) is a pure function of doc_id, which DuckDB reproduces
    * without decoding GIF. A wrong decode (bad logical-screen read, frame
    * miscount) breaks the hash. */
  def videoFeatures(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.decodeVideo(
        Multimodal.videoFromDocuments(spark, sfDir),
        Multimodal.GifVideoDecoder())
      .toDF()
      .select(
        col("media_id"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"),
        size(col("features")).cast("long").as("n_features"))
      .orderBy("media_id")

  /** PIXEL-exact video gate: strided frame extraction over the doc_id-keyed
    * GIF fixtures. Each fixture frame is solid gray v = (doc_id·37+f·97)%256
    * and integer-Rec.601 luma of (v,v,v) is exactly v, GIF palettes are
    * lossless, and compositing full frames replaces the canvas — so the
    * DECODED mean luma equals a pure doc_id/frame formula DuckDB computes
    * without a GIF decoder. A wrong pixel anywhere breaks the hash. */
  def videoFrames(spark: SparkSession, sfDir: String): DataFrame =
    Multimodal.extractVideoFrames(
        Multimodal.videoFromDocuments(spark, sfDir), stride = 2)
      .select(
        col("media_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("mean_luma"))
      .orderBy("media_id", "frame_idx")

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> ((s, d) => multimodalFeatures(s, d)),
    "video_features" -> ((s, d) => videoFeatures(s, d)),
    "video_frames" -> ((s, d) => videoFrames(s, d)),
  )

  def oracles: Map[String, String] = Map(
    "multimodal_features" ->
      """SELECT doc_id AS media_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  CAST(64 + (octet_length(encode(text)) % 64) AS BIGINT) AS width,
        |  CAST(64 + ((octet_length(encode(text)) // 64) % 64) AS BIGINT) AS height,
        |  CAST(32 AS BIGINT) AS n_features
        |FROM documents ORDER BY media_id""".stripMargin,
    "video_features" ->
      """SELECT doc_id AS media_id,
        |  CAST(8 + doc_id % 16 AS BIGINT) AS width,
        |  CAST(8 + (doc_id // 16) % 16 AS BIGINT) AS height,
        |  CAST(2 + doc_id % 3 AS BIGINT) AS n_frames,
        |  CAST(16 AS BIGINT) AS n_features
        |FROM documents ORDER BY media_id""".stripMargin,
    // DuckDB v1.0 range() takes no lateral column params — enumerate the
    // strided frames directly: n_frames = 2 + doc_id % 3 ∈ {2,3,4}, so
    // stride-2 keeps f = 0 always and f = 2 iff n_frames > 2
    "video_frames" ->
      """SELECT doc_id AS media_id,
        |  CAST(f AS BIGINT) AS frame_idx,
        |  CAST(8 + doc_id % 16 AS BIGINT) AS width,
        |  CAST(8 + (doc_id // 16) % 16 AS BIGINT) AS height,
        |  CAST((doc_id * 37 + f * 97) % 256 AS DOUBLE) AS mean_luma
        |FROM (
        |  SELECT doc_id, 0 AS f FROM documents
        |  UNION ALL
        |  SELECT doc_id, 2 AS f FROM documents WHERE doc_id % 3 >= 1
        |)
        |ORDER BY media_id, frame_idx""".stripMargin,
  )
}
