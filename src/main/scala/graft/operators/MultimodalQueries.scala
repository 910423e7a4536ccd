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

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_features" -> ((s, d) => multimodalFeatures(s, d)),
    "video_features" -> ((s, d) => videoFeatures(s, d)),
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
  )
}
