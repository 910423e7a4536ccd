package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
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
        // ONE scan decides emptiness and routing: a backlog burst can hand
        // one micro-batch more queries than the serving form's driver-side
        // probe-pair budget — fail over to the fully distributed twin
        // instead of failing the stream (a poison batch would replay
        // forever under the checkpoint)
        val ivf = graft.index.IvfIndex
        val n = batch.count()
        if (n > 0) {
          // the count above IS the routing decision — call the unguarded
          // serving form so the batch isn't re-scanned by a redundant
          // limit-count job per micro-batch
          val resolved =
            if (n <= ivf.MaxServingBatch)
              ivf.probeManyUnguarded(spark, indexPath, batch, "qid", "qv", k, nprobe)
            else ivf.searchMany(spark, indexPath, batch, "qid", "qv", k, nprobe)
          resolved
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(resultPath)
        }
        ()
      }
      .start()
  }

  /** NSW-backed serving: same contract as [[startKnnServing]] but resolved
    * through the sharded graph ([[graft.index.NswIndex.searchMany]]) — the
    * high-recall serving point when shard graphs stay memory-resident;
    * pick IVF serving when probes must stay selective over cold data. */
  def startNswServing(spark: SparkSession, querySrcDir: String, schema: StructType,
                      indexPath: String, resultPath: String, k: Int,
                      ef: Int = graft.index.NswIndex.EfSearch,
                      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val queries = spark.readStream.schema(schema).parquet(querySrcDir)
    queries.writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"${resultPath}_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the NSW form has no distributed twin (its whole design is
        // broadcasting the small side), so an oversize backlog batch is
        // CHUNKED by qid hash instead — each chunk stays inside the
        // serving bound and the stream never sees a poison batch that
        // would replay forever under the checkpoint
        val n = batch.count()
        if (n > 0) {
          val bound = graft.index.IvfIndex.MaxServingBatch
          // halve the target chunk size so hash imbalance cannot push a
          // chunk past the bound
          val chunks = math.max(1L, (n + bound / 2 - 1) / (bound / 2)).toInt
          (0 until chunks).foreach { c =>
            val part =
              if (chunks == 1) batch
              else batch.filter(pmod(xxhash64(col("qid")), lit(chunks)) === c)
            // UNGUARDED: the loop above already bounds each chunk's
            // expected size (and re-counting would re-scan the batch per
            // chunk); a hash-skewed chunk past the bound must collect —
            // chunk size is expected-bounded — not throw, or the failed
            // batch would replay forever under the checkpoint: exactly
            // the poison-batch failure the chunking exists to prevent
            graft.index.NswIndex
              .searchManyUnguarded(spark, indexPath, part, "qid", "qv", k, ef)
              .withColumn("batch_id", lit(batchId))
              .write.mode("append").parquet(resultPath)
          }
        }
        ()
      }
      .start()
  }

  /** Lexical serving — the BM25 member of the serving trio
    * ([[startKnnServing]] / [[startNswServing]]): a stream of (qid, query
    * text) rows resolves per micro-batch through
    * [[graft.index.Bm25Index.topKMany]] — one bucket-pruned postings read
    * per batch shared by every query in it, per-query top-k out of
    * bounded heaps. Results land in `resultPath` keyed by
    * (batch_id, qid, rank). */
  def startBm25Serving(spark: SparkSession, querySrcDir: String, schema: StructType,
                       indexPath: String, resultPath: String, k: Int,
                       k1: Double, b: Double,
                       trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val queries = spark.readStream.schema(schema).parquet(querySrcDir)
    queries.writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"${resultPath}_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.index.Bm25Index
            .topKMany(spark, indexPath, batch, "qid", "qtext", k, k1, b)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(resultPath)
        }
        ()
      }
      .start()
  }

  /** Continuous ANN index maintenance: new vector rows appended to the
    * ivfflat lists per micro-batch. [[graft.index.IvfIndex.append]] assigns
    * to the EXISTING centroids — exactly pgvector's index-on-INSERT
    * behavior (never re-clusters; periodic full rebuilds re-balance, as in
    * Postgres) — and keeps the covering-radius sidecar sound, so the
    * filtered probe's termination bound survives streaming appends.
    * Delivery caveat is [[startIngest]]'s: a replayed batch duplicates its
    * rows (ANN results stay correct — duplicates score identically — but a
    * rebuild is the cleanup). */
  def startIvfMaintenance(spark: SparkSession, srcDir: String, schema: StructType,
                          indexPath: String,
                          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    startIvfMaintenance(spark, srcDir, schema, indexPath, trigger,
      rebalanceEvery = 0, skewThreshold = 2.0, maxFilesPerTrigger = None)

  /** [[startIvfMaintenance]] with periodic skew repair: appends assign to
    * FROZEN centroids, so a drifting input distribution degrades probe
    * pruning monotonically ([[graft.index.IvfIndex.rebalance]]); with
    * `rebalanceEvery` = n > 0, every n-th micro-batch checks
    * [[graft.index.IvfIndex.listSkew]] and re-clusters past
    * `skewThreshold`. Safe here BY CONSTRUCTION: foreachBatch serializes
    * batches, so the rebuild never races an append — exactly the
    * single-maintenance-writer contract rebalance documents. */
  def startIvfMaintenance(spark: SparkSession, srcDir: String, schema: StructType,
                          indexPath: String, trigger: Trigger,
                          rebalanceEvery: Int, skewThreshold: Double,
                          maxFilesPerTrigger: Option[Int]): StreamingQuery = {
    // maxFilesPerTrigger bounds each micro-batch's append size — at high
    // ingest volume one AvailableNow batch over the whole backlog would
    // defer the first skew check until the entire history was appended
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(srcDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"${indexPath}_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.index.IvfIndex.append(batch, indexPath)
          if (rebalanceEvery > 0 && (batchId + 1) % rebalanceEvery == 0) {
            graft.index.IvfIndex.rebalance(batch.sparkSession, indexPath,
              skewThreshold = skewThreshold)
          }
        }
        ()
      }
      .start()
  }

  /** Continuous lexical index maintenance: new documents appended to the
    * BM25 posting-list sidecar per micro-batch
    * ([[graft.index.Bm25Index.append]] — post-append scores equal a full
    * rebuild). Same at-least-once caveat as [[startIvfMaintenance]]. */
  def startBm25Maintenance(spark: SparkSession, srcDir: String, schema: StructType,
                           indexPath: String,
                           trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"${indexPath}_checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) graft.index.Bm25Index.append(batch, indexPath)
        ()
      }
      .start()

  /** Continuous graph-index maintenance — pgvector's hnsw-on-INSERT analog
    * (hnsw, unlike ivfflat, extends its graph incrementally for every
    * inserted row): each micro-batch greedy-inserts its vectors into the
    * existing sharded graph ([[graft.index.NswIndex.append]] — per-shard
    * topology extension, atomic `graph` swap), so streamed vectors are
    * searchable after their batch commits with no rebuild. The swap bumps
    * the graph fingerprint, so the transparent rewrite's plan-time probe
    * memo re-reads the fresh generation (the rebalance-invalidation
    * contract, spec-pinned). Same at-least-once caveat as [[startIngest]];
    * duplicate vec_ids from a replayed batch violate append's id contract,
    * so exactly-once sources (file streams, as here) are the intended
    * input. Single-maintenance-writer, serialized by foreachBatch. */
  def startNswMaintenance(spark: SparkSession, srcDir: String, schema: StructType,
                          indexPath: String,
                          trigger: Trigger = Trigger.AvailableNow(),
                          maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(srcDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"${indexPath}_checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) graft.index.NswIndex.append(batch.sparkSession, indexPath, batch)
        ()
      }
      .start()
  }

  /** The open (not-yet-emitted) session a user's state holds. */
  final case class OpenSession(start: Long, last: Long, n: Long)

  /** A session closed either by a later event beyond the gap or by the
    * event-time timeout (watermark passed last + gap). */
  final case class ClosedSession(user_id: Long, session_start: Long,
                                 n_events: Long, duration_s: Long)

  private def sessionizeGroup(userId: Long,
      it: Iterator[(Long, Long, java.sql.Timestamp, Long)],
      state: GroupState[OpenSession], gap: Long): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      // watermark passed last + gap with no new events: the session closed
      val s = state.get
      state.remove()
      Iterator.single(ClosedSession(userId, s.start, s.n, s.last - s.start))
    } else {
      // Interval-merge the open state session with the batch's events in
      // one sorted walk — the same gap rule the batch form applies, so
      // out-of-order stragglers group among THEMSELVES too (two late
      // events within one gap form one session, not two singletons).
      val items: Seq[OpenSession] =
        (state.getOption.toSeq ++
          it.map(e => OpenSession(e._4, e._4, 1))).sortBy(s => (s.start, s.last))
      var merged = List.empty[OpenSession] // head = latest by start
      items.foreach { s =>
        merged = merged match {
          case h :: t if s.start - h.last <= gap =>
            OpenSession(h.start, math.max(h.last, s.last), h.n + s.n) :: t
          case acc => s :: acc
        }
      }
      val open = merged.head
      val closed = merged.tail.reverse
      state.update(open)
      // the timeout must sit strictly past the watermark — a session whose
      // last+gap is already behind it (late data) times out "immediately"
      // at watermark+1 instead of crashing the query
      state.setTimeoutTimestamp(
        math.max((open.last + gap + 1) * 1000L, state.getCurrentWatermarkMs() + 1))
      closed.iterator.map(s => ClosedSession(userId, s.start, s.n, s.last - s.start))
    }
  }

  /** Streaming gap-window sessionization — the stateful-streaming form of
    * `StarSchemaQueries.eventsSessions`, built on
    * `flatMapGroupsWithState` + event-time timeout (the Spark-native
    * custom-state operator; batch gap windows can't stream because a
    * session's end is only known once the watermark passes it).
    *
    * Per user the state holds the single open session; a new event either
    * extends it, closes it (gap exceeded → session emitted downstream), or
    * lands as an out-of-order straggler. When the watermark passes
    * `last + gap` without new events, the timeout fires and the session is
    * emitted and cleared — so state size is O(|active users|), not
    * O(|events|). `watermarkDelay` must exceed the gap, or timeouts would
    * fire while in-gap events may still legally arrive. Closed sessions
    * append to `resultPath` (file sink, exactly-once via checkpoint).
    * Batch/stream parity is asserted in StreamingSpec. */
  /** `ts` normalized to TIMESTAMP — the shared fixture-schema duality
    * lives in [[graft.Tables.tsAsTimestamp]]; this is just the streaming
    * sources' entry to it. */
  private def tsAsTimestamp(schema: StructType) = graft.Tables.tsAsTimestamp(schema)

  def startSessionize(spark: SparkSession, srcDir: String, schema: StructType,
                      resultPath: String,
                      gapSeconds: Long = graft.operators.StarSchemaQueries.SessionGapSeconds,
                      watermarkDelay: String = "1 hour"): StreamingQuery = {
    import spark.implicits._
    val events = spark.readStream.schema(schema).parquet(srcDir)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        tsAsTimestamp(schema).as("ts"))
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_seconds(col("ts")).as("sec"))
      .as[(Long, Long, java.sql.Timestamp, Long)]
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, it: Iterator[(Long, Long, java.sql.Timestamp, Long)],
         st: GroupState[OpenSession]) => sessionizeGroup(uid, it, st, gapSeconds))
      .toDF()
      .writeStream
      .format("parquet")
      .option("path", resultPath)
      .option("checkpointLocation", s"${resultPath}_checkpoint")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming exact-dedup stage — the continuous form of
    * `Dedup.dedupExact`'s fingerprint dedup, for the ingest path: each doc
    * is keyed by the md5 of its whitespace-normalized lowercase text and
    * `dropDuplicatesWithinWatermark` keeps only the first arrival per
    * fingerprint. State is bounded: a fingerprint is held only until the
    * watermark passes its event time (O(recent keys), not O(corpus)) — so
    * duplicates spaced farther apart than `watermarkDelay` pass through,
    * and the periodic BATCH dedup pass (`Dedup.dedupClean`) is the
    * compaction that catches them. That split (streaming near-dup window +
    * batch full-corpus pass) is the honest 100 TB shape: unbounded
    * streaming state on corpus fingerprints cannot fit an executor.
    * Deduped docs append to `resultPath` (file sink, exactly-once via
    * checkpoint). */
  def startDedupIngest(spark: SparkSession, srcDir: String, schema: StructType,
                       resultPath: String,
                       watermarkDelay: String = "10 minutes"): StreamingQuery = {
    spark.readStream.schema(schema).parquet(srcDir)
      .withColumn("fp", md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")
      .writeStream
      .format("parquet")
      .option("path", resultPath)
      .option("checkpointLocation", s"${resultPath}_checkpoint")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming NEAR-dup gate — the continuous form of the MinHash-LSH
    * pipeline (`Dedup.dedupClean`'s candidate stage), one rung up from
    * [[startDedupIngest]]'s exact fingerprints: each micro-batch computes
    * the SAME 64-perm/16-band LSH band signatures the batch pipeline uses
    * ([[graft.operators.Dedup.bandsOf]] — one shared definition) and drops
    * a doc when any band bucket collides with (a) the on-disk band store
    * of previously accepted docs or (b) a lower-id doc in the same batch.
    * Survivors append to the result sink and their bands to the store.
    *
    * State lives in the PARQUET STORE, not executor memory — unlike the
    * watermark-bounded fingerprint state of [[startDedupIngest]], the band
    * store scales as an on-disk relation (O(16 rows/doc), an index-class
    * sidecar; at 100 TB it is bucketed by band_sig hash so the collision
    * probe prunes like any posting join). The gate is the LSH candidate
    * test WITHOUT the exact-Jaccard verification — collisions drop
    * immediately (false-positive rate = the banding s-curve's, ~p⁶⁴ᐟ¹⁶ at
    * low similarity), and the in-batch rule keeps local collision-graph
    * minima rather than running full connected components; the periodic
    * BATCH pass (`Dedup.dedupClean`) is the exact compaction, the same
    * split documented on [[startDedupIngest]]. Replay of a failed batch
    * can re-append (at-least-once, see object scaladoc); re-appended
    * band rows only repeat collisions already recorded, so the gate's
    * decisions stay stable under replay. */
  def startMinhashDedup(spark: SparkSession, srcDir: String, schema: StructType,
                        storePath: String, resultPath: String,
                        maxFilesPerTrigger: Int = 1): StreamingQuery = {
    prepareBandStore(spark, storePath)
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        gateBatch(batch, storePath)(
          _.write.mode("append").parquet(resultPath))
      }
      .option("checkpointLocation", s"${resultPath}_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  private val BandStoreSchema: StructType = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField}
    StructType(Seq(
      StructField("doc_id", LongType), StructField("band", IntegerType),
      StructField("band_sig", StringType)))
  }

  /** Pre-create the band store so the first micro-batch's schema'd read
    * sees an empty relation instead of a missing-path failure — through
    * the Hadoop FS API (the store is an on-disk relation that lives on
    * HDFS/S3 at scale; java.nio only reaches local paths). */
  private def prepareBandStore(spark: SparkSession, storePath: String): Unit = {
    val storeDir = new org.apache.hadoop.fs.Path(storePath)
    storeDir.getFileSystem(spark.sessionState.newHadoopConf()).mkdirs(storeDir)
  }

  /** One micro-batch through the LSH band gate (the shared core of
    * [[startMinhashDedup]] and [[startCurationPipeline]]): compute the
    * batch's band signatures, drop docs colliding with the store or a
    * lower-id batchmate, hand the KEPT rows to `sink` (called exactly
    * once, while the collision relations stay persisted — a sink may
    * trigger several actions over them), then append the survivors'
    * bands to the store. */
  /** The gate's PLAN core — the drop set of a batch's band rows against a
    * band-store relation (doc_ids colliding with the store via the
    * (band, band_sig) left-semi probe, or with a lower-id batchmate via
    * the self-semi-join). ONE definition shared by [[gateBatch]] and the
    * plan gallery's `curation_gate_batch` entry, so the documented plan
    * can never drift from the executed one. */
  private[graft] def gateDropSet(bands: DataFrame, store: DataFrame): DataFrame = {
    val dupOfStored = bands
      .join(store, Seq("band", "band_sig"), "left_semi")
      .select("doc_id").distinct()
    val dupInBatch = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_sig") === col("y.band_sig") &&
          col("x.doc_id") > col("y.doc_id"), "left_semi")
      .select("doc_id").distinct()
    dupOfStored.union(dupInBatch).distinct()
  }

  /** Schema'd read of a band store directory — shared with the gallery. */
  private[graft] def bandStoreRel(spark: SparkSession, storePath: String): DataFrame =
    spark.read.schema(BandStoreSchema).parquet(storePath)

  private def gateBatch(batch: DataFrame, storePath: String)
                       (sink: DataFrame => Unit): Unit = {
    val sp = batch.sparkSession
    val bands = graft.operators.Dedup.bandsOf(
      graft.operators.Dedup.hashedShingleRelOf(batch)).persist()
    try {
      val store = bandStoreRel(sp, storePath)
      // persist: drop feeds BOTH sink writes, and recomputing it
      // would re-probe the full band store (corpus-scale) per action
      val drop = gateDropSet(bands, store).persist()
      try {
        sink(batch.join(drop, Seq("doc_id"), "left_anti"))
        bands.join(drop, Seq("doc_id"), "left_anti")
          .select("doc_id", "band", "band_sig")
          .write.mode("append").parquet(storePath)
      } finally drop.unpersist()
    } finally bands.unpersist()
  }

  /** End-to-end streaming CURATION pipeline — the operational story told
    * on ONE stream instead of per piece: every micro-batch chains
    *
    *  1. GATE: the MinHash-LSH near-dup gate ([[gateBatch]] — the same
    *     band definitions as the batch pipeline, state in the on-disk
    *     band store);
    *  2. APPEND: survivors land in the curated corpus dataset at
    *     `corpusPath` (partition-parallel parquet append);
    *  3. MAINTENANCE: the BM25 posting-list index extends incrementally
    *     ([[graft.index.Bm25Index.append]] — post-append scores equal a
    *     full rebuild, spec-pinned; the FIRST non-empty batch builds the
    *     index from the corpus so bootstrap needs no separate job);
    *  4. SERVING: the standing query table at `queriesPath`
    *     ((qid, qtext) parquet) resolves against the just-maintained
    *     index ([[graft.index.Bm25Index.topKMany]] — one bucket-pruned
    *     postings read per batch), results keyed by (batch_id, qid,
    *     rank) at `resultPath`.
    *
    * foreachBatch serializes the four stages per batch AND across
    * batches — exactly the single-maintenance-writer contract the index
    * appends document. Delivery is [[startIngest]]'s at-least-once: a
    * replayed batch re-appends corpus rows (band-store decisions stay
    * stable under replay, see [[startMinhashDedup]]); the periodic batch
    * dedup pass is the compaction. End-state parity with the batch
    * pipeline (gate decisions ≡ batch band pipeline; maintained index ≡
    * index rebuilt from the gated corpus, bit-exact scores) is pinned in
    * StreamingPipelineSpec. */
  def startCurationPipeline(spark: SparkSession, srcDir: String,
                            schema: StructType, storePath: String,
                            corpusPath: String, indexPath: String,
                            queriesPath: String, resultPath: String,
                            k: Int, k1: Double, b: Double,
                            maxFilesPerTrigger: Int = 1): StreamingQuery =
    startCurationPipeline(spark, srcDir, schema, storePath, corpusPath,
      indexPath, queriesPath, resultPath, k, k1, b, maxFilesPerTrigger,
      vecArm = None)

  /** The embedding/ANN arm of [[startCurationPipeline]]: production
    * curation also EMBEDS every gated document and maintains the vector
    * index on the same stream, so the full overload chains three more
    * stages after BM25 serving —
    *
    *  5. EMBED: `embedder` maps the kept docs to vectors (batched
    *     column expression / mapPartitions — the [[graft.embed.Embedder]]
    *     contract) and the (vec_id, embedding) rows append to the
    *     embedded-corpus dataset at `vecPath`;
    *  6. ANN MAINTENANCE: the ivfflat index at `ivfPath` extends
    *     incrementally ([[graft.index.IvfIndex.append]] — frozen
    *     centroids, exactly pgvector's index-on-INSERT; the FIRST
    *     non-empty batch builds it from the embedded corpus, so
    *     bootstrap needs no separate job);
    *  7. ANN SERVING: the standing vector-query table at `queriesPath`
    *     ((qid, qv) parquet) resolves against the just-maintained index
    *     per batch — count-routed between the serving probe and the
    *     distributed [[graft.index.IvfIndex.searchMany]] exactly like
    *     [[startKnnServing]] — keyed by (batch_id, qid, rank) at
    *     `resultPath`.
    *
    * End-state parity (StreamingPipelineSpec): the maintained index's
    * PROBE-ALL answers are bit-identical to an index rebuilt from the
    * gated corpus — probe-all is exact over the indexed rows for ANY
    * centroid history, so frozen-centroid drift cannot leak into exact
    * answers; only pruned-probe recall drifts, which is what
    * [[graft.index.IvfIndex.rebalance]] repairs. */
  final case class VecArm(embedder: Embedder, vecPath: String,
                          ivfPath: String, queriesPath: String,
                          resultPath: String, k: Int, nprobe: Int, lists: Int)

  def startCurationPipeline(spark: SparkSession, srcDir: String,
                            schema: StructType, storePath: String,
                            corpusPath: String, indexPath: String,
                            queriesPath: String, resultPath: String,
                            k: Int, k1: Double, b: Double,
                            maxFilesPerTrigger: Int,
                            vecArm: Option[VecArm]): StreamingQuery = {
    prepareBandStore(spark, storePath)
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) gateBatch(batch, storePath) { kept =>
          val sp = batch.sparkSession
          kept.write.mode("append").parquet(corpusPath)
          val stats = new org.apache.hadoop.fs.Path(s"$indexPath/stats")
          val bootstrapped =
            stats.getFileSystem(sp.sessionState.newHadoopConf()).exists(stats)
          if (bootstrapped) graft.index.Bm25Index.append(kept, indexPath)
          else graft.index.Bm25Index.build(sp.read.parquet(corpusPath), indexPath)
          graft.index.Bm25Index
            .topKMany(sp, indexPath, sp.read.parquet(queriesPath),
              "qid", "qtext", k, k1, b)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(resultPath)
          vecArm.foreach { arm =>
            // 5. EMBED the gated docs; the embedded corpus is an on-disk
            // relation like the band store (at 100 TB: the vector column
            // of the curated dataset). PERSISTED: emb feeds both the
            // corpus write and the index append — without it the
            // embedder (the expensive stage this arm exists for) and the
            // gate's band-store probe would re-execute per consumer.
            // Delivery caveat (same as startIvfMaintenance): a batch
            // replayed AFTER these appends but BEFORE the band-store
            // append re-embeds and double-indexes its rows — duplicates
            // score identically in probes, the periodic rebuild
            // ([[graft.index.IvfIndex.rebalance]] / a fresh build over
            // vecPath after batch dedup) is the cleanup.
            val emb = arm.embedder
              .embedFrame(kept.filter(col("text").isNotNull))
              .select(col("doc_id").cast("long").as("vec_id"), col("embedding"))
              .persist()
            try {
              // poison-batch guard: a gated batch whose kept docs ALL
              // lack text embeds to ZERO rows — IvfIndex.build would run
              // KMeans over an empty/zero-row vecPath and throw, and
              // under the checkpoint the failed batch replays forever
              // (exactly the failure the startNswServing chunking comment
              // warns about). Skip index maintenance for such a batch and
              // defer bootstrap to the first batch that actually embeds.
              if (emb.limit(1).count() > 0) {
                emb.write.mode("append").parquet(arm.vecPath)
                // 6. MAINTAIN the ivfflat index (bootstrap on first batch)
                val ivfMeta = new org.apache.hadoop.fs.Path(s"${arm.ivfPath}/meta")
                val ivfUp = ivfMeta.getFileSystem(
                  sp.sessionState.newHadoopConf()).exists(ivfMeta)
                if (ivfUp) graft.index.IvfIndex.append(emb, arm.ivfPath)
                else graft.index.IvfIndex.build(
                  sp.read.parquet(arm.vecPath), arm.ivfPath, lists = arm.lists)
              }
            } finally emb.unpersist()
            // 7. SERVE the standing vector queries against the index as
            // of this batch — same count-routing as startKnnServing.
            // Guarded on the index actually existing: bootstrap may have
            // been deferred by the empty-embedding guard above.
            val ivf = graft.index.IvfIndex
            val ivfMetaNow = new org.apache.hadoop.fs.Path(s"${arm.ivfPath}/meta")
            val queries = sp.read.parquet(arm.queriesPath)
            val n = if (ivfMetaNow.getFileSystem(
                sp.sessionState.newHadoopConf()).exists(ivfMetaNow))
              queries.count() else 0L
            if (n > 0) {
              val resolved =
                if (n <= ivf.MaxServingBatch)
                  ivf.probeManyUnguarded(sp, arm.ivfPath, queries,
                    "qid", "qv", arm.k, arm.nprobe)
                else ivf.searchMany(sp, arm.ivfPath, queries,
                  "qid", "qv", arm.k, arm.nprobe)
              resolved
                .withColumn("batch_id", lit(batchId))
                .write.mode("append").parquet(arm.resultPath)
            }
          }
        }
      }
      .option("checkpointLocation", s"${resultPath}_checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Event-time tumbling-window rollup over the events feed — the stream
    * form of StarSchemaQueries.eventsHourly, run the way a production
    * stream would be: APPEND output, so a window row is emitted exactly
    * once, when the watermark passes its end, and rows arriving later than
    * `watermarkDelay` behind the observed max event time are DROPPED from
    * already-finalized windows (bounded state — the watermark is what lets
    * per-type hourly state stay finite on an unbounded feed). The batch
    * parity and the late-drop behavior are pinned in StreamingSpec.
    *
    * `maxFilesPerTrigger` controls micro-batch granularity (the watermark
    * only advances BETWEEN micro-batches); `ts` adapts to both fixture
    * schemas like [[graft.Tables.events]]. Note append mode emits nothing
    * for windows the final watermark has not passed — replayers close the
    * tail with a sentinel row or accept the open tail missing. */
  /** Stream-stream interval join — the live form of
    * [[graft.operators.StarSchemaQueries.eventsIntervalJoin]]: clicks and
    * purchases are read as TWO event streams (each with its own
    * watermark), inner-joined on user_id under the bounded time-range
    * condition `purchase_ts ∈ [click_ts, click_ts + interval]`. Inner-join
    * matches emit as soon as both rows have arrived (no watermark
    * holdback); the watermarks exist for the other half of the contract —
    * STATE CLEANUP and late-row drop: Spark derives from the range
    * condition that a click can stop waiting once the watermark passes
    * `click_ts + interval` and a purchase once it passes `purchase_ts`, so
    * per-side state is bounded by rate × (delay + interval), never the
    * stream's history; rows arriving later than `watermarkDelay` behind
    * the slower stream's max event time are dropped before the join (both
    * pinned in StreamingSpec, including the one-trigger watermark
    * propagation lag).
    *
    * Batch parity: identical pair set and integer-µs `gap_us` arithmetic
    * to the oracle-gated batch twin. */
  def startIntervalJoin(spark: SparkSession, srcDir: String, schema: StructType,
                        resultPath: String,
                        intervalSeconds: Long =
                          graft.operators.StarSchemaQueries.IntervalJoinSeconds,
                        watermarkDelay: String = "30 minutes",
                        maxFilesPerTrigger: Int = 1): StreamingQuery = {
    def side(tpe: String, p: String) =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
        .filter(col("event_type") === tpe)
        .select(col("user_id").cast("long").as(s"${p}_user"),
          col("event_id").cast("long").as(s"${p}_id"),
          tsAsTimestamp(schema).as(s"${p}_ts"))
        .withWatermark(s"${p}_ts", watermarkDelay)
    side("click", "click")
      .join(side("purchase", "purchase"),
        col("click_user") === col("purchase_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") +
            expr(s"INTERVAL $intervalSeconds SECONDS"))
      .select(col("click_user").as("user_id"), col("click_id"),
        col("purchase_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("gap_us"))
      .writeStream
      .format("parquet")
      .option("path", resultPath)
      .option("checkpointLocation", s"${resultPath}_checkpoint")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  def startHourlyRollup(spark: SparkSession, srcDir: String, schema: StructType,
                        resultPath: String, watermarkDelay: String = "30 minutes",
                        maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val raw = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(srcDir)
    raw.withColumn("ts", tsAsTimestamp(schema))
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"), col("n"))
      .writeStream
      .format("parquet")
      .option("path", resultPath)
      .option("checkpointLocation", s"${resultPath}_checkpoint")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
