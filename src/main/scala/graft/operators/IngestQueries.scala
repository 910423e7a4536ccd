package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.embed.HashingSentenceEmbedder
import graft.sources.{DocumentStore, TableConfig}

/** End-to-end ingest dataflows as verifiable queries (SURVEY.md §3.1-3.4,
  * §7.3 `ingest_roundtrip`): each run embeds the fixture documents, writes
  * through a sink into a fresh temp table, reads back and aggregates — so
  * the correctness gate covers the write paths, not just reads. Oracles
  * check the preserved-cardinality/shape contract against the source table.
  */
object IngestQueries {

  val EmbedDim = 384 // reference default (README.md:38)

  private def freshDir(prefix: String): String =
    graft.util.TempDirs.create(prefix).resolve("table").toString

  /** pg_insert-analog round-trip: embed → validated batched append → read
    * back → (row count, embedding dim). */
  def ingestRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val embedded = HashingSentenceEmbedder(EmbedDim)
      .embedFrame(Tables.documents(spark, sfDir).select("text"))
    val cfg = TableConfig(freshDir("graft_insert"))
    DocumentStore.insert(embedded, cfg)
    DocumentStore.read(cfg)
      .agg(
        count(lit(1)).as("n_rows"),
        max(size(col("embedding"))).cast("long").as("dim"))
  }

  /** pg_copy-analog round-trip through the staged bulk path. */
  def copyRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val embedded = HashingSentenceEmbedder(EmbedDim)
      .embedFrame(Tables.documents(spark, sfDir).select("text"))
    val cfg = TableConfig(freshDir("graft_copy"))
    DocumentStore.copy(Left(embedded), cfg)
    DocumentStore.read(cfg)
      .agg(
        count(lit(1)).as("n_rows"),
        max(size(col("embedding"))).cast("long").as("dim"))
  }

  /** §3.4 embed→parquet pipeline: null-filter → embed → date-partitioned
    * append → read back (the notebook cells 5/11 dataflow + moto test). */
  def embedPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val out = freshDir("graft_pipeline")
    val embedded = HashingSentenceEmbedder(EmbedDim)
      .embedFrame(Tables.documents(spark, sfDir)
        .filter(col("text").isNotNull)
        .select("doc_id", "text"))
      // pinned date: the oracle asserts n_dates = 1, which must hold even if
      // the write straddles midnight UTC (current_date would be re-evaluated
      // on a retry/re-run of the query)
      .withColumn("generation_date", lit("2026-01-01"))
    DocumentStore.saveToParquetPartitioned(embedded, out)
    spark.read.parquet(out)
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("generation_date")).as("n_dates"),
        max(size(col("embedding"))).cast("long").as("dim"))
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ingest_roundtrip" -> ((s, d) => ingestRoundtrip(s, d)),
    "copy_roundtrip" -> ((s, d) => copyRoundtrip(s, d)),
    "embed_pipeline" -> ((s, d) => embedPipeline(s, d)),
  )

  def oracles: Map[String, String] = Map(
    "ingest_roundtrip" ->
      s"SELECT COUNT(*) AS n_rows, CAST($EmbedDim AS BIGINT) AS dim FROM documents",
    "copy_roundtrip" ->
      s"SELECT COUNT(*) AS n_rows, CAST($EmbedDim AS BIGINT) AS dim FROM documents",
    "embed_pipeline" ->
      s"""SELECT COUNT(*) AS n_rows, CAST(1 AS BIGINT) AS n_dates,
         |  CAST($EmbedDim AS BIGINT) AS dim
         |FROM documents WHERE text IS NOT NULL""".stripMargin,
  )
}
