package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{CorpusDiagnostics, Dedup, IndexQueries, IngestQueries, MultimodalQueries, ReferenceQueries, SimilarityQueries, StarSchemaQueries, TemporalJoins, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * T1: cosine top-k similarity search (SURVEY.md §2.5). */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.knnTopK(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.1.8 extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.all ++ StarSchemaQueries.all ++ TextAnalysis.all ++
      Dedup.all ++ SimilarityQueries.all ++ IngestQueries.all ++ IndexQueries.all ++
      MultimodalQueries.all ++ TemporalJoins.all ++ CorpusDiagnostics.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracles ++ StarSchemaQueries.oracles ++ TextAnalysis.oracles ++
      Dedup.oracles ++ SimilarityQueries.oracles ++ IngestQueries.oracles ++ IndexQueries.oracles ++
      MultimodalQueries.oracles ++ TemporalJoins.oracles ++ CorpusDiagnostics.oracles
}
