package graft

import org.apache.spark.sql.functions._

import graft.functions.{cosine_distance, hash_embed}

/** Scale smoke: the fixture tables are small, so synthesize a 1M-row × 64-dim
  * corpus with the engine's own embedder and prove the core access paths
  * hold their plan shape and finish at interactive latency on local[4].
  * This is the "would it survive 100×" canary the fixtures can't provide. */
class ScaleSmokeSpec extends SparkSpec {

  /** Wall-clock guard: hard-asserted only under SPARK_GRAFT_TIME_ASSERTS
    * (the bench-main env-gate pattern) — on a loaded/slower box an
    * absolute bound fails spuriously and masks real regressions in noise;
    * unset, an exceeded bound is reported as info and the CORRECTNESS
    * asserts still gate the test. */
  private def timeGuard(cond: => Boolean, what: => String): Unit =
    if (sys.env.contains("SPARK_GRAFT_TIME_ASSERTS")) assert(cond, what)
    else if (!cond) info(s"TIME BOUND EXCEEDED (informational): $what")

  private val N = 1000000L

  private lazy val corpus = {
    val df = spark.range(N).select(
      col("id").as("vec_id"),
      hash_embed(concat(lit("synthetic document number "), col("id").cast("string")), 64)
        .as("embedding"))
    df.persist()
  }

  test("exact top-k over 1M vectors stays a TakeOrderedAndProject and returns fast") {
    val q = graft.functions.vector_lit(
      graft.functions.HashEmbed.embedToFloats("synthetic document number 12345", 64))
    val topk = corpus
      .select(col("vec_id"), cosine_distance(col("embedding"), q).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(10)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$plan")
    val t0 = System.nanoTime()
    val rows = topk.collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // at 1M texts into 64 dims many docs share the exact feature pattern, so
    // the nearest is a dist≈0 tie (id-break), not necessarily doc 12345
    assert(rows.head.getDouble(1) < 1e-9)
    assert(rows.forall(_.getDouble(1) <= rows.last.getDouble(1)))
    info(f"1M-vector exact top-10: $secs%.2f s")
    timeGuard(secs < 120.0, s"unreasonably slow: $secs s")
  }

  test("two-phase batch knn holds at 1M base × 100 queries with no global window") {
    import graft.functions.top_k_by_distance
    val k = 10
    val qs = corpus.filter(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val batch = corpus.crossJoin(broadcast(qs))
      .select(col("qid"), col("vec_id"),
        cosine_distance(col("embedding"), col("qv")).as("dist"))
      .groupBy("qid")
      .agg(top_k_by_distance(col("dist"), col("vec_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "s")))
    val plan = batch.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"two-phase top-k must not use a window:\n$plan")
    val t0 = System.nanoTime()
    val n = batch.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n === 100L * k)
    info(f"1M×100 batch knn: $secs%.2f s")
    timeGuard(secs < 300.0, s"unreasonably slow: $secs s")
  }

  test("sharded NSW build + search hold at 200k vectors; recall vs exact holds") {
    // DISTINCT pseudo-random vectors: the hash-embed corpus above collapses
    // to ~128 distinct patterns (ideal for dedup tests, degenerate for a
    // graph index — identical vectors form disconnected cliques)
    val n = 200000L
    val sub = spark.range(n).select(
      col("id").as("vec_id"),
      hashNoise(col("id"), 64).as("embedding"))
      .persist()
    val dir = graft.util.TempDirs.create("graft_nsw_scale").resolve("idx").toString
    val t0 = System.nanoTime()
    val (rows, _) = graft.index.NswIndex.build(sub, dir, shards = 16)
    val buildSecs = (System.nanoTime() - t0) / 1e9
    assert(rows === n)
    info(f"NSW build 200k×16 shards: $buildSecs%.1f s")
    val q = sub.filter(col("vec_id") === 12345L)
      .head().getAs[collection.Seq[Float]]("embedding").toArray
    val exact = sub
      .select(col("vec_id"), cosine_distance(col("embedding"),
        graft.functions.vector_lit(q)).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val t1 = System.nanoTime()
    val got = graft.index.NswIndex.search(spark, dir, q, 10).collect()
    val searchSecs = (System.nanoTime() - t1) / 1e9
    assert(got.length === 10)
    val recall = got.map(_.getLong(0)).toSet.intersect(exact).size / 10.0
    info(f"NSW search over 200k: $searchSecs%.2f s, recall@10 $recall%.1f")
    assert(got.head.getLong(0) === 12345L && got.head.getDouble(1) < 1e-12,
      "querying an indexed vector must find it first")
    assert(recall >= 0.5, s"NSW 200k recall@10 was $recall")
    timeGuard(buildSecs < 300.0 && searchSecs < 60.0,
      s"build $buildSecs s / search $searchSecs s")
    sub.unpersist()
  }

  test("IVFPQ holds at 100k vectors: build, pruned probe, reranked recall") {
    val n = 100000L
    val sub = spark.range(n).select(
      col("id").as("vec_id"),
      hashNoise(col("id"), 64).as("embedding"))
      .persist()
    val dir = graft.util.TempDirs.create("graft_ivfpq_scale").resolve("idx").toString
    val lists = 32
    val t0 = System.nanoTime()
    val rows = graft.index.IvfPqIndex.build(sub, dir, lists = lists)
    val buildSecs = (System.nanoTime() - t0) / 1e9
    assert(rows === n)
    info(f"IVFPQ build 100k×$lists lists: $buildSecs%.1f s")
    val q = sub.filter(col("vec_id") === 12345L)
      .head().getAs[collection.Seq[Float]]("embedding").toArray
    val t1 = System.nanoTime()
    val got = graft.index.IvfPqIndex.probeRerank(spark, dir, sub, q, k = 10,
      nprobe = 4, overfetch = 4).collect()
    val probeSecs = (System.nanoTime() - t1) / 1e9
    info(f"IVFPQ probe+rerank over 100k (nprobe 4/$lists): $probeSecs%.2f s")
    assert(got.head.getLong(0) === 12345L && got.head.getDouble(1) < 1e-12,
      "querying an indexed vector must find it first through its own list")
    timeGuard(buildSecs < 420.0 && probeSecs < 60.0,
      s"build $buildSecs s / probe $probeSecs s")
    sub.unpersist()
  }

  test("sparse inverted index holds at 200k vectors / 3.2M postings; exact vs brute force") {
    import graft.functions.{sparse_cosine_distance, sparse_vectorize}
    // lexical-shaped corpus: 200k vectors over 1000 dims, 16 nnz each
    val n = 200000L
    val dim = 1000
    val sub = spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        when(pmod(xxhash64(concat(col("id"), lit("_"), d)), lit(dim / 16)) === 0,
          (pmod(xxhash64(concat(lit("v"), col("id"), d)), lit(9)) + 1).cast("float") * 0.1f)
          .otherwise(lit(0.0f))).as("embedding"))
      .select(col("vec_id"), sparse_vectorize(col("embedding"), 0.0).as("sv"))
      .persist()
    val dir = graft.util.TempDirs.create("graft_sparse_scale").resolve("idx").toString
    val t0 = System.nanoTime()
    graft.index.SparseIndex.build(sub, dir)
    val buildSecs = (System.nanoTime() - t0) / 1e9
    info(f"sparse index build 200k: $buildSecs%.1f s")
    val q = sub.filter(col("vec_id") === 12345L).select("sv.indices", "sv.values").head()
    val (qi, qv) = (q.getAs[collection.Seq[Int]](0).toArray,
      q.getAs[collection.Seq[Float]](1).toArray)
    val t1 = System.nanoTime()
    val got = graft.index.SparseIndex.knn(spark, dir, qi, qv, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val knnSecs = (System.nanoTime() - t1) / 1e9
    val seed = sub.filter(col("vec_id") === 12345L).select(col("sv").as("qv"))
    val exact = sub.crossJoin(broadcast(seed))
      .select(col("vec_id"), sparse_cosine_distance(col("sv"), col("qv")).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    info(f"sparse knn over 200k: $knnSecs%.2f s")
    assert(got === exact, "indexed sparse kNN must equal brute force exactly")
    assert(got.head._1 === 12345L)
    timeGuard(buildSecs < 300.0 && knnSecs < 60.0,
      s"build $buildSecs s / knn $knnSecs s")
    sub.unpersist()
  }

  test("filtered IVF kNN holds at 100k vectors: exact under a 1% predicate") {
    val n = 100000L
    val sub = spark.range(n).select(
      col("id").as("vec_id"),
      hashNoise(col("id"), 64).as("embedding"))
      .persist()
    val dir = graft.util.TempDirs.create("graft_fknn_scale").resolve("idx").toString
    val t0 = System.nanoTime()
    graft.index.IvfIndex.build(sub, dir, lists = 32)
    val buildSecs = (System.nanoTime() - t0) / 1e9
    info(f"IVF build 100k×32: $buildSecs%.1f s")
    val q = sub.filter(col("vec_id") === 12345L)
      .head().getAs[collection.Seq[Float]]("embedding").toArray
    val pred = col("vec_id") % 100 === 0 // 1% survive
    val t1 = System.nanoTime()
    val (df, probed) = graft.index.IvfIndex.filteredKnnStats(
      spark, dir, q, 10, pred, initProbes = 4)
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val secs = (System.nanoTime() - t1) / 1e9
    val exact = sub.filter(pred)
      .select(col("vec_id"), cosine_distance(col("embedding"),
        graft.functions.vector_lit(q)).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    info(f"filtered kNN over 100k (1%% filter): $secs%.2f s, probed $probed/32 lists")
    assert(got === exact, "filtered probe must stay exact at scale")
    assert(got.length === 10)
    timeGuard(buildSecs < 420.0 && secs < 90.0,
      s"build $buildSecs s / run $secs s")
    sub.unpersist()
  }

  test("adaptive filtered backfill holds at 100k vectors: sampled-trained index, k-guarantee, occupancy sizing") {
    val n = 100000L
    val sub = spark.range(n).select(
      col("id").as("vec_id"),
      hashNoise(col("id"), 64).as("embedding"))
      .persist()
    // the DEFAULT production sizing path: occupancy lists + the 8192-row
    // training cap genuinely ENGAGED (n >> cap) — not a spec override
    val lists = graft.operators.IndexQueries.listsFor(n)
    assert(lists === (n / graft.operators.IndexQueries.TargetOccupancy).toInt)
    val dir = graft.util.TempDirs
      .create("graft_adaptive_scale").resolve("idx").toString
    val t0 = System.nanoTime()
    graft.index.IvfIndex.build(sub, dir, lists = lists)
    val buildSecs = (System.nanoTime() - t0) / 1e9
    info(f"sampled-trained IVF build 100k×$lists%d lists: $buildSecs%.1f s")
    // one file per list: the layout contract that keeps probe reads
    // listing-bounded instead of (partitions·lists)-file-bounded
    val nFiles = graft.util.FsOps.countParquetFiles(
      spark.sessionState.newHadoopConf(),
      new org.apache.hadoop.fs.Path(s"$dir/lists"))
    assert(nFiles <= lists, s"expected ≤ $lists list files, got $nFiles")
    // corpus-sized filtered backfill: 1k queries, 1% predicate — the
    // fixed-probe pass starves most queries; adaptive must satisfy all
    val pred = col("vec_id") % 100 === 0
    val queries = sub.filter(col("vec_id") < 1000)
      .select(col("vec_id").as("qid"), col("embedding"))
    val t1 = System.nanoTime()
    val res = graft.index.IvfIndex.searchManyAdaptive(spark, dir, queries,
      "qid", "embedding", k = 5, initProbes = 4, predicate = Some(pred))
      .collect()
    val secs = (System.nanoTime() - t1) / 1e9
    info(f"adaptive filtered backfill 1k queries over 100k: $secs%.1f s")
    val byQid = res.groupBy(_.getAs[Long]("qid"))
    assert(byQid.size === 1000, "every query must be answered")
    assert(byQid.values.forall(_.length == 5),
      "1000 surviving rows ≥ k — the k-guarantee must hold for every query")
    assert(res.forall(_.getAs[Long]("vec_id") % 100 == 0),
      "a non-qualifying row leaked past the predicate")
    timeGuard(buildSecs < 420.0 && secs < 180.0,
      s"build $buildSecs s / run $secs s")
    sub.unpersist()
  }

  test("as-of join holds at 1M events: one shuffle, no join node") {
    // 1M events over 10k users: each user's timeline ~100 rows; the as-of
    // union+window shuffles ONCE on user_id regardless of row count
    val n = 1000000L
    val ev = spark.range(n).select(
      col("id").as("event_id"),
      pmod(col("id") * 2654435761L, lit(10000L)).as("user_id"),
      (col("id") * 1000L).as("ts_us"),
      pmod(col("id"), lit(5)).as("kind"),
      (col("id") % 97L).cast("double").as("value"))
    val left = ev.filter(col("kind") < 4).select("event_id", "user_id", "ts_us")
    val right = ev.filter(col("kind") === 4)
      .select(col("user_id"), col("ts_us"), col("value"), col("event_id"))
    val joined = graft.operators.TemporalJoins.asOfJoin(
      left, right, "user_id", "ts_us", Seq("value"), "event_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must stay join-free:\n$plan")
    val t0 = System.nanoTime()
    val cnt = joined.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(cnt === left.count())
    info(f"1M-event as-of join: $secs%.2f s")
    timeGuard(secs < 120.0, s"ran $secs s")
  }

  test("banded range join holds at 1M events with an equi-join plan") {
    val n = 1000000L
    val W = 1000000L // 1s window over a dense synthetic timeline
    val ev = spark.range(n).select(
      col("id").as("event_id"),
      pmod(col("id") * 2654435761L, lit(10000L)).as("user_id"),
      (col("id") * 37L).as("ts_us"))
    val l = ev.filter(col("event_id") % 100 === 0)
      .withColumn("band", explode(array(
        expr(s"ts_us div ${W}L"), expr(s"ts_us div ${W}L") + 1L)))
    val r = ev.select(col("user_id").as("ru"), col("ts_us").as("rt"),
      expr(s"ts_us div ${W}L").as("band"))
    val joined = l.join(r,
        l("user_id") === r("ru") && l("band") === r("band") &&
          col("rt") > col("ts_us") && col("rt") <= col("ts_us") + W, "left")
      .groupBy("event_id").agg(count(col("rt")).as("n_follow"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
    val t0 = System.nanoTime()
    val cnt = joined.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(cnt === 10000L)
    info(f"1M-event banded range join: $secs%.2f s")
    timeGuard(secs < 120.0, s"ran $secs s")
  }

  test("BQ candidate stage holds at 1M vectors (compute parity; the win is scan bytes)") {
    import graft.functions.{bq_hamming, bq_pack, vector_lit}
    val q = graft.functions.HashEmbed.embedToFloats("synthetic document number 12345", 64)
    // precomputed signature sidecar (the 100 TB layout: 8 B/row vs 256 B)
    val sigs = corpus.select(col("vec_id"), bq_pack(col("embedding")).as("sig")).persist()
    sigs.count() // materialize outside the timed window
    val qsig = java.lang.Long.valueOf({
      var w = 0L; q.indices.foreach(i => if (q(i) >= 0f) w |= 1L << (i & 63)); w
    })
    val cand = sigs
      .select(col("vec_id"), bq_hamming(col("sig"), typedLit(Array(qsig.longValue))).as("h"))
      .orderBy(col("h"), col("vec_id")).limit(50)
    val t0 = System.nanoTime()
    val candRows = cand.collect()
    val bqSecs = (System.nanoTime() - t0) / 1e9
    assert(candRows.length === 50 && candRows.head.getLong(1) === 0L,
      "an exact-signature match exists (hash_embed collides at 1M×64)")
    val exact = corpus.select(col("vec_id"),
        cosine_distance(col("embedding"), vector_lit(q)).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(50)
    val t1 = System.nanoTime()
    exact.collect()
    val floatSecs = (System.nanoTime() - t1) / 1e9
    info(f"1M-vector candidate stage: BQ $bqSecs%.2f s vs float $floatSecs%.2f s")
    // On a memory-persisted corpus both stages are overhead-bound, so this
    // asserts parity only: the real BQ lever is 8 B vs 256 B per row READ
    // FROM STORAGE (32×), which a cached 1M fixture cannot exhibit.
    timeGuard(bqSecs < floatSecs * 1.5, s"BQ stage ($bqSecs s) should not lose to float ($floatSecs s)")
    sigs.unpersist()
  }

  test("star connected components hold at 100k nodes / 150k edges") {
    // deterministic pseudo-random graph: ~150k edges over 100k nodes →
    // a few giant components + many small ones; both CC variants must
    // agree and the star variant must stay in its O(log n) superstep
    // budget (min-label would too here — the star win is adversarial
    // diameters, pinned in DedupSpec; this smoke is about volume)
    val nNodes = 100000L
    val pairs = spark.range(150000).select(
      (col("id") * 2654435761L % nNodes).as("a"),
      ((col("id") * 40503L + 7L) % nNodes).as("b"))
      .filter(col("a") =!= col("b"))
    val t0 = System.nanoTime()
    val labels = graft.operators.Dedup.connectedComponentsStar(pairs)
    val byComponent = labels.groupBy(col("lab")).count()
    val nComponents = byComponent.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(nComponents > 0)
    // every label must be a member of its own component (root present)
    val roots = labels.filter(col("node") === col("lab")).count()
    assert(roots === nComponents, "each component's min id labels itself")
    info(f"100k-node star CC: $secs%.2f s, $nComponents components")
    timeGuard(secs < 180.0, s"ran $secs s")
  }

  test("full dedup pipeline (minhash → star CC → clean) holds at 1M docs with skewed duplicates") {
    import graft.operators.Dedup
    // Skewed duplicate mass, the shape web corpora actually have:
    //  - ids 0-499: ONE 500-member clique of IDENTICAL docs (the hot-bucket
    //    skew case — LSH banding expands it to C(500,2) = 124,750 pairs)
    //  - ids 1000-100,999: 20k clusters of 5 NEAR-dup members (8 shared
    //    cluster tokens + 1 member token → shingle Jaccard 6/8 = 0.75,
    //    above the 0.5 verify threshold but below exact-dup; LSH edge
    //    retention at 0.75 is ~99.8%, so clusters stay whole)
    //  - everything else: unique docs (id-salted tokens, zero overlap)
    val c = ((col("id") - 1000) / 5).cast("long")
    val docs = spark.range(N).select(col("id").as("doc_id"),
      when(col("id") < 500, lit("mega dup block alpha beta gamma"))
        .when(col("id") >= 1000 && col("id") < 101000, concat_ws(" ",
          concat(lit("c"), c, lit("a")), concat(lit("c"), c, lit("b")),
          concat(lit("c"), c, lit("cc")), concat(lit("c"), c, lit("d")),
          concat(lit("c"), c, lit("e")), concat(lit("c"), c, lit("f")),
          concat(lit("c"), c, lit("g")), concat(lit("c"), c, lit("h")),
          concat(lit("m"), col("id"))))
        .otherwise(concat_ws(" ",
          concat(lit("u"), col("id"), lit("a")), concat(lit("u"), col("id"), lit("b")),
          concat(lit("u"), col("id"), lit("cc")), concat(lit("u"), col("id"), lit("d")),
          concat(lit("u"), col("id"), lit("e")), concat(lit("u"), col("id"), lit("f"))))
        .as("text"))
    val t0 = System.nanoTime()
    val pairs = Dedup.minhashPairs(Dedup.hashedShingleRelOf(docs))
      .select("a", "b").localCheckpoint()
    val nPairs = pairs.count()
    // realistic pair counts force the DISTRIBUTED star-CC path: the
    // driver-side union-find shortcut must decline above its edge bound
    assert(nPairs > Dedup.SmallGraphEdges,
      s"smoke must exercise the distributed CC path: $nPairs pairs")
    val labels = Dedup.connectedComponentsStar(pairs)
    val clusterDrops = labels.filter(col("node") =!= col("lab"))
      .select(col("lab").as("a"), col("node").as("b"))
    val nClean = Dedup.dropNearDuplicates(docs, clusterDrops).count()
    val secs = (System.nanoTime() - t0) / 1e9
    // full connectivity leaves exactly 1M − 499 − 80,000 = 919,501; LSH
    // banding at J = 0.75 fragments a small deterministic tail of the 20k
    // cliques (members whose own-token lanes dominate several bands lose
    // their edges together — measured ~170, i.e. 0.2% of the drop mass).
    // Never below the exact floor; a wider drift means the pipeline broke.
    assert(nClean >= 919501L && nClean <= 920000L,
      s"cleaned cardinality out of range: $nClean")
    info(f"1M-doc full dedup chain: $secs%.2f s, $nPairs pairs, $nClean survivors")
    timeGuard(secs < 240.0, s"unreasonably slow: $secs s")
  }

  test("streaming MinHash near-dup gate soaks at 200k docs across two micro-batch rounds") {
    import graft.streaming.StreamingIngest
    // Cross-batch + in-batch duplicate mass at soak scale, all IDENTICAL
    // texts (Jaccard 1.0 → every band collides → drops are deterministic):
    //  batch 1: ids 0..99,999 unique           → all 100k accepted
    //  batch 2: ids 100,000..109,999 copy (id − 100,000)  → cross-batch drop
    //           ids 110,000..114,999 unique "pair base"    → accepted
    //           ids 115,000..119,999 copy (id − 5,000)     → in-batch drop
    //           ids 120,000..199,999 unique                → accepted
    def uniq(idCol: org.apache.spark.sql.Column) = concat_ws(" ",
      concat(lit("u"), idCol, lit("a")), concat(lit("u"), idCol, lit("b")),
      concat(lit("u"), idCol, lit("cc")), concat(lit("u"), idCol, lit("d")),
      concat(lit("u"), idCol, lit("e")), concat(lit("u"), idCol, lit("f")))
    val batch1 = spark.range(100000L)
      .select(col("id").as("doc_id"), uniq(col("id")).as("text"))
    val batch2 = spark.range(100000L, 200000L).select(col("id").as("doc_id"),
      when(col("id") < 110000L, uniq(col("id") - 100000L))
        .when(col("id") >= 115000L && col("id") < 120000L, uniq(col("id") - 5000L))
        .otherwise(uniq(col("id"))).as("text"))
    val tmp = graft.util.TempDirs.create("mh_soak")
    val src = tmp.resolve("src").toString
    val store = tmp.resolve("store").toString
    val out = tmp.resolve("out").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))
    val t0 = System.nanoTime()
    batch1.coalesce(4).write.mode("append").parquet(src)
    val q1 = StreamingIngest.startMinhashDedup(
      spark, src, batch1.schema, store, out, maxFilesPerTrigger = 4)
    q1.awaitTermination(300000)
    assert(spark.read.parquet(out).count() === 100000L)
    batch2.coalesce(4).write.mode("append").parquet(src)
    val q2 = StreamingIngest.startMinhashDedup(
      spark, src, batch2.schema, store, out, maxFilesPerTrigger = 4)
    q2.awaitTermination(300000)
    val secs = (System.nanoTime() - t0) / 1e9
    val kept = spark.read.parquet(out)
    assert(kept.count() === 185000L, s"got ${kept.count()}")
    // every cross-batch copy and every higher-id in-batch copy dropped
    assert(kept.filter(col("doc_id") >= 100000L && col("doc_id") < 110000L).count() === 0L)
    assert(kept.filter(col("doc_id") >= 115000L && col("doc_id") < 120000L).count() === 0L)
    // the store holds exactly the survivors' 16 band rows each
    assert(spark.read.parquet(store).count() === 185000L * 16L)
    info(f"200k-doc streaming near-dup gate: $secs%.2f s")
    timeGuard(secs < 240.0, s"unreasonably slow: $secs s")
  }

  test("full curation pipeline with the ANN arm soaks at 1M docs: gate → BM25 → embed → IVF → serve") {
    import graft.streaming.StreamingIngest
    import graft.index.IvfIndex
    // 1M docs over two 500k micro-batch rounds, identical-copy duplicate
    // mass so gate drops are deterministic (Jaccard 1.0 → every band
    // collides). uniq is applied to the SOURCE id, so a copy band must
    // reference ids whose own text is uniq(id) — i.e. ids in a uniq band:
    //  batch 1: ids 0..499,999 unique                          → all kept
    //  batch 2: ids 500,000..524,999 copy (id − 500,000)       → cross-batch drop
    //           ids 525,000..899,999 unique                    → kept
    //           ids 900,000..924,999 copy (id − 25,000),       → in-batch drop
    //             sources 875,000..899,999 keep (lower id wins)
    //           ids 925,000..999,999 unique                    → kept
    // end-state: 1M − 50k = 950k curated docs, minus a tiny LSH
    // false-positive tail (unique docs whose 16 band signatures collide —
    // measured ~50 at 1M, the same banded-LSH property the 1M dedup-chain
    // test bounds).
    def uniq(idCol: org.apache.spark.sql.Column) = concat_ws(" ",
      concat(lit("w"), idCol, lit("a")), concat(lit("w"), idCol, lit("b")),
      concat(lit("w"), idCol, lit("cc")), concat(lit("w"), idCol, lit("d")),
      concat(lit("w"), idCol, lit("e")), concat(lit("w"), idCol, lit("f")))
    val batch1 = spark.range(500000L)
      .select(col("id").as("doc_id"), uniq(col("id")).as("text"))
    val batch2 = spark.range(500000L, 1000000L).select(col("id").as("doc_id"),
      when(col("id") < 525000L, uniq(col("id") - 500000L))
        .when(col("id") >= 900000L && col("id") < 925000L, uniq(col("id") - 25000L))
        .otherwise(uniq(col("id"))).as("text"))
    val tmp = graft.util.TempDirs.create("cur_soak")
    val srcDir = tmp.resolve("src").toString
    val store = tmp.resolve("store").toString
    val corpusP = tmp.resolve("corpus").toString
    val index = tmp.resolve("bm25").toString
    val queriesPath = tmp.resolve("q").toString
    val results = tmp.resolve("res").toString
    val vecPath = tmp.resolve("vec").toString
    val ivfPath = tmp.resolve("ivf").toString
    val vqPath = tmp.resolve("vq").toString
    val vres = tmp.resolve("vres").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val embedder = graft.embed.HashingSentenceEmbedder(dim = 32)
    // standing queries: doc 42's own vocabulary (BM25) and its own
    // embedding (ANN) — it must stay the rank-1 hit in every round
    import spark.implicits._
    Seq((10L, "w42a w42b w42cc")).toDF("qid", "qtext")
      .coalesce(1).write.parquet(queriesPath)
    batch1.filter(col("doc_id") === 42L)
      .select(lit(100L).as("qid"), embedder.embedColumn(col("text")).as("qv"))
      .coalesce(1).write.parquet(vqPath)
    val schema = batch1.schema
    val arm = StreamingIngest.VecArm(embedder, vecPath, ivfPath, vqPath, vres,
      k = 5, nprobe = 4, lists = 64)
    def run(): Unit = {
      val q = StreamingIngest.startCurationPipeline(spark, srcDir, schema,
        store, corpusP, index, queriesPath, results, k = 5, k1 = 1.2, b = 0.75,
        maxFilesPerTrigger = 8, vecArm = Some(arm))
      q.awaitTermination(600000)
    }
    val t0 = System.nanoTime()
    batch1.coalesce(8).write.mode("append").parquet(srcDir)
    run()
    batch2.coalesce(8).write.mode("append").parquet(srcDir)
    run()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"1M-doc curation pipeline (gate+BM25+embed+IVF+serve): $secs%.2f s")

    // 1. gate end-state: every copy dropped (deterministic — Jaccard 1.0
    //    collides in every band), everything else curated minus the
    //    bounded false-positive tail — and the embedded corpus + IVF
    //    lists cover exactly the keep set
    val nKept = spark.read.parquet(corpusP).count()
    assert(nKept >= 949500L && nKept <= 950000L, s"curated $nKept")
    assert(spark.read.parquet(vecPath).count() === nKept)
    assert(spark.read.parquet(s"$ivfPath/lists").count() === nKept)
    val leaked = spark.read.parquet(corpusP)
      .filter((col("doc_id") >= 500000L && col("doc_id") < 525000L) ||
        (col("doc_id") >= 900000L && col("doc_id") < 925000L))
      .count()
    assert(leaked === 0L, s"$leaked duplicates leaked past the gate at soak scale")

    // 2. maintained IVF ≡ rebuild from the embedded corpus: probe-all is
    //    exact over the indexed rows for ANY centroid history, so the
    //    answers must be bit-identical
    val rebuilt = tmp.resolve("ivf_rebuilt").toString
    IvfIndex.build(spark.read.parquet(vecPath), rebuilt, lists = 64)
    val qv = spark.read.parquet(vqPath)
      .head().getAs[collection.Seq[Float]]("qv").toArray
    def probeAll(idx: String) = {
      val nLists = spark.read.parquet(s"$idx/centroids").count().toInt
      IvfIndex.probe(spark, idx, qv, 5, nprobe = nLists)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    assert(probeAll(ivfPath) === probeAll(rebuilt),
      "maintained IVF probe-all must equal a fresh rebuild after the 1M soak")

    // 3. serving ran each round; doc 42 is the rank-1 ANN hit (dist ~0)
    //    and the rank-1 BM25 hit in BOTH rounds
    val vr = spark.read.parquet(vres)
      .select("batch_id", "qid", "rank", "vec_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val vRounds = vr.map(_._1).distinct
    assert(vRounds.length === 2, s"expected 2 ANN serving rounds, got ${vRounds.toSeq}")
    vRounds.foreach { bid =>
      val r1 = vr.filter(t => t._1 == bid && t._3 == 1L)
      assert(r1.length === 1 && r1.head._4 === 42L && r1.head._5 < 1e-12,
        s"round $bid: doc 42 must be the rank-1 ANN hit")
    }
    val br = spark.read.parquet(results)
      .select("batch_id", "qid", "rank", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val bRounds = br.map(_._1).distinct
    assert(bRounds.length === 2, s"expected 2 BM25 serving rounds, got ${bRounds.toSeq}")
    bRounds.foreach { bid =>
      val r1 = br.filter(t => t._1 == bid && t._3 == 1L)
      assert(r1.length === 1 && r1.head._4 === 42L,
        s"round $bid: doc 42 must be the rank-1 BM25 hit")
    }
    timeGuard(secs < 900.0, s"soak unreasonably slow: $secs s")
  }

  test("distributed dedup primitives hold at 1M rows (fingerprint group)") {
    val texts = spark.range(N).select(
      concat(lit("doc "), (col("id") % 500000).cast("string")).as("text"))
    val dupGroups = texts
      .groupBy(md5(col("text")).as("fp")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
    val t0 = System.nanoTime()
    val n = dupGroups.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n === 500000L) // every text appears exactly twice
    info(f"1M-row exact-dedup group: $secs%.2f s")
    timeGuard(secs < 120.0, s"ran $secs s")
  }

  test("streaming IVF maintenance soaks at 1M vectors: skew-triggered rebalance, probe-all exact") {
    import graft.index.IvfIndex
    import graft.streaming.StreamingIngest
    import org.apache.spark.sql.streaming.Trigger
    // Drifting-ingest at soak scale: the index is built on a 10k uniform
    // sample, then the stream delivers 1M vectors from a DIFFERENT (tight
    // directional blob) distribution across 4 micro-batches. Frozen
    // centroids pile the blob into one list (the control proves it); the
    // every-2nd-batch skew check must fire a mid-stream re-cluster and
    // leave occupancy bounded — with probe-all still exactly brute force.
    val dim = 64
    val initial = spark.range(2000000L, 2010000L).select(
      col("id").as("vec_id"), hashNoise(col("id"), dim).as("embedding"))
    val base = hashNoise(lit(9999999L), dim)
    val blob = spark.range(1000000L).select(
      col("id").as("vec_id"),
      zip_with(base, hashNoise(col("id"), dim),
        (b, n) => (b + lit(0.15f) * n).cast("float")).as("embedding"))
    val tmp = graft.util.TempDirs.create("ivf_soak")
    val src = tmp.resolve("src").toString
    // 4 source files → with maxFilesPerTrigger=1, 4 micro-batches
    blob.repartitionByRange(4, col("vec_id")).write.parquet(src)
    val path = tmp.resolve("index").toString
    val ctlPath = tmp.resolve("ctl").toString
    IvfIndex.build(initial, path, lists = 32)
    IvfIndex.build(initial, ctlPath, lists = 32)
    val schema = spark.read.parquet(src).schema
    // control: same stream, no rebalance — the frozen-centroid baseline
    val qc = StreamingIngest.startIvfMaintenance(spark, src, schema, ctlPath,
      Trigger.AvailableNow(), rebalanceEvery = 0, skewThreshold = 3.0,
      maxFilesPerTrigger = Some(2))
    qc.awaitTermination(600000)
    val t0 = System.nanoTime()
    val q = StreamingIngest.startIvfMaintenance(spark, src, schema, path,
      Trigger.AvailableNow(), rebalanceEvery = 2, skewThreshold = 3.0,
      maxFilesPerTrigger = Some(1))
    q.awaitTermination(600000)
    val secs = (System.nanoTime() - t0) / 1e9
    val ctl = IvfIndex.listSkew(spark, ctlPath).head
    val stat = IvfIndex.listSkew(spark, path).head
    val (skew, ctlSkew) = (stat.getAs[Double]("skew"), ctl.getAs[Double]("skew"))
    info(f"1M soak: $secs%.1f s, skew rebalanced=$skew%.2f vs frozen=$ctlSkew%.2f")
    assert(stat.getAs[Long]("n_rows") === 1010000L, "every streamed row must land")
    assert(ctl.getAs[Long]("n_rows") === 1010000L)
    assert(ctlSkew > 3.0, s"the drift fixture must actually skew the frozen control ($ctlSkew)")
    assert(skew < ctlSkew / 2, s"rebalance must beat frozen centroids ($skew vs $ctlSkew)")
    assert(skew < 8.0, s"post-rebalance occupancy must stay bounded ($skew)")
    // the rebuilt, re-appended index still answers probe-all EXACTLY
    val qvec = blob.filter(col("vec_id") === 12345L)
      .head().getAs[collection.Seq[Float]]("embedding").toArray
    val probeAll = IvfIndex.probe(spark, path, qvec, k = 10, nprobe = 32)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = spark.read.parquet(s"$path/lists")
      .select(col("vec_id"), cosine_distance(col("embedding"),
        graft.functions.vector_lit(qvec)).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probeAll === exact, "probe-all must equal brute force after the soak")
    timeGuard(secs < 420.0, s"soak unreasonably slow: $secs s")
  }

  test("heavy-hitters sketch+verify holds at 1M docs / 4M tokens; equals exact") {
    // zipf-ish: two universal tokens, 100 mid-frequency (10k each — above
    // the N/capacity bar so the guarded sketch path is the one exercised),
    // 50k rare. Per-partition MG summaries stay ≤ capacity entries.
    val docs = spark.range(N).select(
      col("id").as("doc_id"),
      concat(lit("alpha beta u"), (col("id") % 100).cast("string"),
        lit(" t"), (col("id") % 50000).cast("string")).as("text"),
      lit("s").as("source"),
      lit(30L).as("n_chars"))
    val dir = graft.util.TempDirs.create("graft_hh_scale").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val expected = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(graft.operators.CorpusDiagnostics.HeavyK)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val t0 = System.nanoTime()
    val got = graft.operators.CorpusDiagnostics.heavyHitters(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got === expected)
    assert(got.take(2).map(_._2) === Seq(N, N), "universal tokens lead")
    assert(got.last._2 === N / 100, "mid-band fills the tail")
    info(f"1M-doc heavy hitters (sketch+verify): $secs%.2f s")
    timeGuard(secs < 120.0, s"ran $secs s")
  }
}
