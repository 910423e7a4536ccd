package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.embed.Embedder
import graft.sources.{DocumentStore, TableConfig}

/** Streaming ingest — Structured Streaming analog of the reference's
  * "real-time" simulation (notebook cells 6-9, SURVEY.md §2.9): the
  * notebook itself frames `pg_copy` as the micro-batch path "for Spark
  * Streaming …with batch intervals" (cell 6); here that becomes a file
  * source → embed → `foreachBatch` append, with per-batch latency
  * measurement mirroring ST1/ST2 (cell 9's wrong-variable latency print is
  * a bug we deliberately do not replicate — SURVEY.md §2.9).
  *
  * At scale this is the engine's continuous-ingest story: micro-batches
  * append parquet files partition-parallel. Delivery is AT-LEAST-ONCE: the
  * checkpoint log makes the source side exactly-once, but a crash between
  * the parquet append and the checkpoint commit replays the batch and
  * duplicates its rows (foreachBatch sinks are not idempotent by default).
  * Exactly-once requires an idempotent sink — e.g. keying files by batchId
  * or post-hoc dedup on a content fingerprint (`Dedup.dedupExact`); the
  * reference's own per-batch-commit pg_insert has the same replay window.
  */
object StreamingIngest {

  /** Per-batch ingest latencies (seconds), most recent run. */
  final class Metrics {
    private val q = new ConcurrentLinkedQueue[Double]()
    def record(secs: Double): Unit = q.add(secs)
    def latencies: List[Double] = q.asScala.toList
    def avgLatency: Double = { val l = latencies; if (l.isEmpty) 0.0 else l.sum / l.size }
  }

  /** Start a micro-batch embed→append stream from parquet files appearing
    * under `srcDir` into the document table at `config.tablePath`. */
  def startIngest(spark: SparkSession, srcDir: String, schema: StructType,
                  embedder: Embedder, config: TableConfig,
                  trigger: Trigger = Trigger.AvailableNow()): (StreamingQuery, Metrics) = {
    val metrics = new Metrics
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val query = stream.writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"${config.tablePath}_checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val t0 = System.nanoTime()
        if (!batch.isEmpty) {
          val embedded = embedder.embedFrame(
            batch.filter(col("text").isNotNull).select("text"))
          DocumentStore.insert(embedded, config)
        }
        metrics.record((System.nanoTime() - t0) / 1e9)
      }
      .start()
    (query, metrics)
  }

  /** Streaming similarity serving: a stream of query vectors is resolved
    * against the IVF index per micro-batch with the distributed batch probe
    * — the engine's nearest-serving story (true online ANN needs a
    * specialized serving engine per the project north star; micro-batch
    * probe latency is the Spark-native point on that curve). Results land
    * in `resultPath` keyed by (batch_id, qid, rank). */
  def startKnnServing(spark: SparkSession, querySrcDir: String, schema: StructType,
                      indexPath: String, resultPath: String, k: Int, nprobe: Int,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val queries = spark.readStream.schema(schema).parquet(querySrcDir)
    queries.writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"${resultPath}_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.index.IvfIndex
            .probeMany(spark, indexPath, batch, "qid", "qv", k, nprobe)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(resultPath)
        }
        ()
      }
      .start()
  }

  /** Streaming windowed rollup over events (watermark + event-time window)
    * into a memory sink — the stream form of StarSchemaQueries.eventsHourly;
    * batch/stream parity is asserted in StreamingSpec. */
  def startHourlyRollup(spark: SparkSession, srcDir: String, schema: StructType,
                        queryName: String): StreamingQuery = {
    val events = spark.readStream.schema(schema).parquet(srcDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"), col("n"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
