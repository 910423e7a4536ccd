package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.embed.HashingSentenceEmbedder
import graft.operators.StarSchemaQueries
import graft.sources.{DocumentStore, TableConfig}

class StreamingSpec extends SparkSpec {

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("d").toString

  test("micro-batch file-source ingest: embed + append with latency metrics (ST1/ST2)") {
    val src = tmp("stream_src")
    val docs = graft.Tables.documents(spark, Sf0001).select("doc_id", "text")
    docs.write.parquet(src)
    val cfg = TableConfig(tmp("stream_table"))
    val (query, metrics) = StreamingIngest.startIngest(
      spark, src, docs.schema, HashingSentenceEmbedder(64), cfg)
    query.awaitTermination(120000)
    val table = DocumentStore.read(cfg)(spark)
    assert(table.count() === 500L)
    assert(table.select(max(size(col("embedding")))).head().getInt(0) === 64)
    assert(metrics.latencies.nonEmpty && metrics.avgLatency > 0.0)
  }

  test("streaming appends accumulate across new files (two micro-batch rounds)") {
    val src = tmp("stream_src2")
    val docs = graft.Tables.documents(spark, Sf0001).select("doc_id", "text").limit(10)
    docs.write.mode("append").parquet(src)
    val cfg = TableConfig(tmp("stream_table2"))
    val (q1, _) = StreamingIngest.startIngest(
      spark, src, docs.schema, HashingSentenceEmbedder(16), cfg)
    q1.awaitTermination(120000)
    assert(DocumentStore.read(cfg)(spark).count() === 10L)
    // new files arrive; AvailableNow restart picks up only the delta
    docs.write.mode("append").parquet(src)
    val (q2, _) = StreamingIngest.startIngest(
      spark, src, docs.schema, HashingSentenceEmbedder(16), cfg)
    q2.awaitTermination(120000)
    assert(DocumentStore.read(cfg)(spark).count() === 20L)
  }

  test("streaming hourly rollup matches the batch aggregation (parity)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the streaming file source requires a DIRECTORY of files
    val srcDir = tmp("events_stream")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf0001/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/events.parquet"))
    val schema = spark.read.parquet(s"$Sf0001/events.parquet").schema
    val q = StreamingIngest.startHourlyRollup(spark, srcDir, schema, "rollup_test")
    q.awaitTermination(120000)
    val stream = spark.sql("SELECT event_type, hour, n FROM rollup_test")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = StarSchemaQueries.eventsHourly(spark, Sf0001)
      .select("event_type", "hour", "n")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(stream === batch, "stream result must equal the batch rollup")
  }
}
