package graft.operators

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  test("dedup_keep_best keeps the longest member, min doc_id on length ties") {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("graft_keepbest").toString
    val dupText = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val rows = Seq(
      // cluster {0,1,2}: identical text (jaccard 1), lengths favor doc 1
      (0L, dupText, "en", "a", 100L),
      (1L, dupText, "en", "a", 500L),
      (2L, dupText, "en", "a", 200L),
      // cluster {3,4}: identical (DISJOINT) text, equal length → min doc_id
      (3L, "one two three four five six seven eight nine ten " * 3, "en", "a", 300L),
      (4L, "one two three four five six seven eight nine ten " * 3, "en", "a", 300L),
      // singleton: never appears (unclustered docs aren't dropped)
      (5L, "totally different words entirely unrelated content here now", "en", "a", 999L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.dedupKeepBest(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet === Set(0L, 3L), "one row per cluster, keyed by component-min rep")
    assert(out(0L) === ((1L, 500L, 3L)), "longest member kept")
    assert(out(3L) === ((3L, 300L, 2L)), "tie broken by min doc_id")
  }

  test("dedup_exact audit shape and invariants") {
    val r = Dedup.dedupExact(spark, Sf0001).head()
    val (rows, distinct, dupGroups) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(rows === 500L)
    assert(distinct <= rows && distinct > 0)
    assert(dupGroups >= 0 && dupGroups <= distinct)
  }

  test("dedup_ngram finds planted near-dups, jaccard in (0,1]") {
    val rows = Dedup.dedupNgram(spark, Sf0001).collect()
    assert(rows.nonEmpty, "fixtures plant near-dup documents")
    assert(rows.forall(r => r.getDouble(2) >= Dedup.NgramThreshold && r.getDouble(2) <= 1.0))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("dedup_embedding pairs are symmetric-free and above threshold") {
    val rows = Dedup.dedupEmbedding(spark, Sf0001).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getDouble(2) >= Dedup.EmbeddingThreshold))
  }

  test("dedup_embedding equals the exact all-pairs join; no CartesianProduct") {
    import org.apache.spark.sql.functions._
    // exact reference: the all-pairs cross join the operator used to be
    val e = graft.Tables.embeddings(spark, Sf0001)
    val exact = e.select(col("vec_id").as("a"), col("embedding").as("v1"))
      .crossJoin(e.select(col("vec_id").as("b"), col("embedding").as("v2")))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        graft.functions.cosine_similarity(col("v1"), col("v2")).as("sim"))
      .filter(col("sim") >= Dedup.EmbeddingThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val bucketed = Dedup.dedupEmbedding(spark, Sf0001)
    val got = bucketed.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === exact, "IVF-bucketed candidates must reproduce the exact pair set bit-for-bit")
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"no all-pairs cartesian may remain in the plan:\n$plan")
  }

  test("embeddingCandidates prunes hard on a clustered corpus at SemDeDup-style thresholds") {
    import org.apache.spark.sql.functions._
    import graft.functions.hash_embed
    // 20 tight clusters × 10 members: member = normalize(base + 0.15·noise)
    val nClusters = 20; val perCluster = 10; val n = nClusters * perCluster
    val raw = spark.range(n).select(
      col("id").as("vec_id"),
      hash_embed(concat(lit("cl"), (col("id") % nClusters).cast("string")), 64).as("base"),
      hash_embed(concat(lit("nz"), col("id").cast("string")), 64).as("noise"))
    val mixed = raw.select(col("vec_id"),
      zip_with(col("base"), col("noise"), (b, nz) => b + nz * lit(0.15f)).as("mix"))
    val emb = mixed.select(col("vec_id"),
      transform(col("mix"), x =>
        (x / sqrt(aggregate(col("mix"), lit(0.0d), (acc, v) => acc + v * v))).cast("float"))
        .as("embedding"))
      .persist()
    val dir = graft.util.TempDirs.create("graft_dedup_prune").resolve("idx").toString
    graft.index.IvfIndex.build(emb, dir, lists = nClusters)
    val members = spark.read.parquet(s"$dir/lists").select("vec_id", "embedding", "list_id")
    val cents = spark.read.parquet(s"$dir/centroids")
    val threshold = 0.9
    val cand = Dedup.embeddingCandidates(members, cents, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // completeness: every true >= 0.9 pair is a candidate
    val truePairs = emb.select(col("vec_id").as("a"), col("embedding").as("v1"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("v2")))
      .filter(col("a") < col("b"))
      .filter(graft.functions.cosine_similarity(col("v1"), col("v2")) >= threshold)
      .select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.nonEmpty, "clusters must plant >=0.9 pairs")
    assert(truePairs.subsetOf(cand), s"missed: ${truePairs -- cand}")
    // pruning: candidates ≪ all pairs
    val allPairs = n.toLong * (n - 1) / 2
    assert(cand.size < allPairs / 4,
      s"expected hard pruning on clustered data: ${cand.size} of $allPairs pairs")
    emb.unpersist()
  }

  test("dedup_embedding_ivf: exact-verified subset with >=0.9 recall on a clustered corpus") {
    import org.apache.spark.sql.functions._
    import graft.functions.hash_embed
    // the pruning spec's clustered geometry, written out as a corpus dir
    // so both forms run through the public sfDir entry (indexFor caches)
    val nClusters = 20; val perCluster = 10; val n = nClusters * perCluster
    val raw = spark.range(n).select(
      col("id").as("vec_id"),
      hash_embed(concat(lit("cl"), (col("id") % nClusters).cast("string")), 64).as("base"),
      hash_embed(concat(lit("nz"), col("id").cast("string")), 64).as("noise"))
    val mixed = raw.select(col("vec_id"),
      zip_with(col("base"), col("noise"), (b, nz) => b + nz * lit(0.15f)).as("mix"))
    val dir = graft.util.TempDirs.create("graft_dedup_ivf").toString
    mixed.select(col("vec_id"),
        transform(col("mix"), x =>
          (x / sqrt(aggregate(col("mix"), lit(0.0d), (acc, v) => acc + v * v))).cast("float"))
          .as("embedding"),
        (col("vec_id") % nClusters).cast("int").as("label"))
      .write.parquet(s"$dir/embeddings.parquet")
    val exact = Dedup.dedupEmbedding(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "clusters must plant true near-dup pairs")
    val ivf = Dedup.dedupEmbeddingIvf(spark, dir)
    val rows = ivf.collect()
    assert(rows.forall(r => r.getDouble(2) >= Dedup.EmbeddingThreshold),
      "every emitted pair must be exact-verified (precision 1)")
    val ap = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ap.subsetOf(exact), "ivf pairs must be a subset of the exact pair set")
    val recall = exact.intersect(ap).size.toDouble / exact.size
    assert(recall >= 0.9, s"pair recall on the clustered corpus was $recall")
    val plan = ivf.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"scale twin must plan equi-joins:\n$plan")
  }

  test("dedup_embedding_knn: degree-bounded edges — precision 1, O(n*k) " +
      "output, drop set identical to the full-pairs twin (fixture + clustered)") {
    import org.apache.spark.sql.functions._
    import graft.functions.hash_embed
    // same clustered geometry as the recall spec above, fresh dir so the
    // index cache keys don't collide
    val nClusters = 20; val perCluster = 10; val n = nClusters * perCluster
    val raw = spark.range(n).select(
      col("id").as("vec_id"),
      hash_embed(concat(lit("cl"), (col("id") % nClusters).cast("string")), 64).as("base"),
      hash_embed(concat(lit("nz"), col("id").cast("string")), 64).as("noise"))
    val mixed = raw.select(col("vec_id"),
      zip_with(col("base"), col("noise"), (b, nz) => b + nz * lit(0.15f)).as("mix"))
    val dir = graft.util.TempDirs.create("graft_dedup_knn").toString
    mixed.select(col("vec_id"),
        transform(col("mix"), x =>
          (x / sqrt(aggregate(col("mix"), lit(0.0d), (acc, v) => acc + v * v))).cast("float"))
          .as("embedding"),
        (col("vec_id") % nClusters).cast("int").as("label"))
      .write.parquet(s"$dir/embeddings.parquet")
    for (d <- Seq(dir, Sf0001)) {
      val full = Dedup.dedupEmbeddingIvf(spark, d).collect()
      val knn = Dedup.dedupEmbeddingIvfKnn(spark, d)
      val rows = knn.collect()
      // precision 1: same exact verification, same threshold
      assert(rows.forall(r => r.getDouble(2) >= Dedup.EmbeddingThreshold))
      val knnPairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      val fullPairs = full.map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(knnPairs.subsetOf(fullPairs),
        s"knn edges must be a subset of the full pair set at $d")
      // degree bound: at most n*(2k+1) undirected edges — k per node from
      // its own heap, up to k more where it was kept by neighbors, plus
      // one min-smaller-neighbor drop-rule edge per node
      val nVec = graft.Tables.embeddings(spark, d).count()
      assert(rows.length <= nVec * (2L * Dedup.EmbeddingKnnDegree + 1L))
      // THE cleaning contract: identical dropNearDuplicates drop set —
      // same distinct-b relation means bit-identical cleaned corpora
      val dropFull = fullPairs.map(_._2)
      val dropKnn = knnPairs.map(_._2)
      assert(dropKnn === dropFull,
        s"drop sets diverged at $d: missing=${dropFull -- dropKnn} " +
          s"extra=${dropKnn -- dropFull}")
    }
  }

  test("dedup_embedding_knn: drop-set parity holds when a node's full heap " +
      "is larger-id neighbors (r15 advice divergence scenario)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Unit vectors in the (dim0, dim1) plane at hand-picked angles, k=1.
    // Node 4's only heap slot goes to 5 (sim .99 > sim(1,4) .50), and
    // node 1's goes to 2 (.94) — so no HEAP edge has 4 as the larger
    // endpoint, yet the full-pairs twin emits (1,4) and drops 4. The
    // min-smaller-neighbor edge must restore the drop. Every other pair
    // sits below the 0.45 threshold: fillers are ±one-hot on axes 2..7
    // (sim 0 to the plane, 0/−1 to each other) and pad the corpus so the
    // 16-list IVF build is well-posed.
    def v(deg: Double) = Array.tabulate(8) {
      case 0 => math.cos(math.toRadians(deg)).toFloat
      case 1 => math.sin(math.toRadians(deg)).toFloat
      case _ => 0f
    }
    val fillers = (0 until 12).map { i =>
      val vec = Array.fill(8)(0f)
      vec(2 + i / 2) = if (i % 2 == 0) 1f else -1f
      (100L + i, vec, 2)
    }
    val dir = graft.util.TempDirs.create("graft_dedup_knn_adv").toString
    (Seq((1L, v(0.0), 0), (2L, v(-20.0), 0), (4L, v(60.0), 1), (5L, v(68.0), 1))
      ++ fillers)
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val full = Dedup.dedupEmbeddingIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === Set((1L, 2L), (1L, 4L), (4L, 5L)),
      s"corpus must plant exactly the divergence geometry, got $full")
    val knn = Dedup.dedupEmbeddingIvfKnn(spark, dir, k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(knn.subsetOf(full))
    assert(knn.map(_._2) === full.map(_._2),
      s"drop sets diverged: full=${full.map(_._2)} knn=${knn.map(_._2)}")
    // the restoring edge itself: (1,4) must be kept even though neither
    // endpoint's k=1 heap retains it
    assert(knn.contains((1L, 4L)), s"min-smaller drop-rule edge missing: $knn")
  }

  test("capped and uncapped ngram pair sources agree on the drop set (dedup_clean contract)") {
    val uncapped = Dedup.dedupNgram(spark, Sf0001)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.dedupNgramCapped(spark, Sf0001)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // dedupClean runs the capped source while its oracle mirrors the exact
    // uncapped pipeline — valid only while the cap loses no >=threshold pair
    assert(capped === uncapped,
      s"cap binds at threshold: missing=${uncapped -- capped} extra=${capped -- uncapped}")
  }

  test("dedup_minhash: precision 1.0 vs exact jaccard, high recall on strong dups") {
    val exact = Dedup.dedupNgram(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.dedupMinhash(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // precision: every LSH-verified pair is a true >=0.5 pair
    lsh.foreach { case (pair, j) =>
      assert(exact.contains(pair) && j >= Dedup.MinhashVerifyThreshold, s"false positive $pair")
    }
    // recall: strong duplicates (j >= 0.8) must all be found
    val strong = exact.filter(_._2 >= 0.8).keySet
    val missed = strong -- lsh.keySet
    assert(missed.isEmpty, s"LSH missed strong dups: $missed")
  }

  test("dropNearDuplicates removes pair 'b' sides and exact dups, keeps the rest") {
    val docs = graft.Tables.documents(spark, Sf0001)
    val pairs = Dedup.dedupNgram(spark, Sf0001)
    val cleaned = Dedup.dropNearDuplicates(docs, pairs)
    val dropped = pairs.select("b").distinct().collect().map(_.getLong(0)).toSet
    val keptIds = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.intersect(dropped).isEmpty, "no near-dup 'b' may survive")
    assert(cleaned.count() === docs.count() - dropped.size,
      "fixture texts are exact-unique, so only near-dups are removed")
    // every surviving pair representative ('a' side) is retained
    val reps = pairs.select("a").distinct().collect().map(_.getLong(0)).toSet -- dropped
    assert(reps.subsetOf(keptIds))
  }

  test("dedup_simhash: deterministic, bounded hamming, finds strong dups") {
    val r1 = Dedup.dedupSimhash(spark, Sf0001).collect()
    val r2 = Dedup.dedupSimhash(spark, Sf0001).collect()
    assert(r1.map(_.toSeq).toSeq === r2.map(_.toSeq).toSeq, "must be deterministic")
    assert(r1.forall(_.getLong(2) <= Dedup.SimhashMaxHamming))
  }

  test("connectedComponents: multi-cluster graph converges to component minima") {
    import spark.implicits._
    // components: {1,2,3,4} (path), {10,11} (edge), {20,21,22} (triangle)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a", "b")
    val labels = Dedup.connectedComponents(pairs, smallGraphThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(labels === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents: a long chain still converges (diameter supersteps)") {
    import spark.implicits._
    // 0-1-2-...-12: diameter 12, worst case for min propagation
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup
      .connectedComponents(pairs, maxIter = 30, smallGraphThreshold = 0)
      .as[(Long, Long)].collect()
    assert(labels.forall(_._2 === 0L) && labels.length === 13)
  }

  test("connectedComponentsStar: equals min-label propagation on varied graphs") {
    import spark.implicits._
    val graphs = Seq(
      // mixed components (path + edge + triangle)
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L)),
      // deterministic pseudo-random graph over 40 nodes
      (0 until 60).map { i =>
        val a = (i * 2654435761L) % 40; val b = (i * 40503L + 7) % 40
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct)
    graphs.foreach { g =>
      val pairs = g.toDF("a", "b")
      val plain = Dedup.connectedComponents(pairs, smallGraphThreshold = 0)
        .as[(Long, Long)].collect().toMap
      val star = Dedup.connectedComponentsStar(pairs, smallGraphThreshold = 0)
        .as[(Long, Long)].collect().toMap
      assert(star === plain)
      // the adaptive driver-side union-find shortcut must agree with both
      val driver = Dedup.connectedComponentsStar(pairs).as[(Long, Long)].collect().toMap
      assert(driver === plain)
    }
  }

  test("connectedComponentsStar: a 200-node path converges within the O(log n) budget") {
    import spark.implicits._
    // diameter 200 — min-label propagation would need ~200 supersteps; the
    // star algorithm's path-halving must land far under its default 25
    val pairs = (0L until 200L).map(i => (i, i + 1)).toDF("a", "b")
    val labels = Dedup.connectedComponentsStar(pairs, smallGraphThreshold = 0)
      .as[(Long, Long)].collect()
    assert(labels.length === 201 && labels.forall(_._2 === 0L))
  }

  test("contamination: test-split rows only, counts positive and bounded") {
    val out = Dedup.contamination(spark, Sf0001).collect()
    assert(out.nonEmpty, "word-soup fixtures must leak some 5-grams across splits")
    out.foreach { r =>
      assert(r.getLong(1) >= 1L, "each reported doc shares with ≥1 train doc")
      assert(r.getLong(2) >= 1L, "each reported doc leaks ≥1 distinct shingle")
    }
    // every reported doc really is in the test split
    import org.apache.spark.sql.functions.col
    val testIds = graft.Tables.documents(spark, Sf0001)
      .select(col("doc_id"), TextAnalysis.splitCol(col("doc_id")).as("split"))
      .filter(col("split") === "test")
      .collect().map(_.getLong(0)).toSet
    assert(out.forall(r => testIds.contains(r.getLong(0))))
  }

  test("dedup_spans finds a cross-doc pasted passage and merges its windows into one span") {
    import spark.implicits._
    val dir = graft.util.TempDirs.create("graft_spans").toString
    // prefixes/suffixes abut the shared passage with DIFFERENT characters on
    // each side, so no boundary-crossing window matches across docs and the
    // merged span is exactly the shared region
    val shared = "the quick brown fox jumps over the lazy sleeping dog today ok"  // 62 chars
    val doc0 = "aardvark bison camel dromedary egret flamingoX" + shared +
      "Penguin quail rhea stork tapir urial vole wombat"
    val doc1 = "heron ibis jackal kudu lemur marmot narwhalQ" + shared +
      "Xerus yak zebra addax bongo colobus dikdik eland"
    // internal repetition: a 45-char block repeated with a spacer
    val block = "uno dos tres cuatro cinco seis siete ocho nue"                  // 45 chars
    val doc2 = block + " SPACERWORDS " + block
    val doc3 = "completely unique sentence with no duplicated forty char window anywhere at all"
    val doc4 = "short text"                                                      // < window
    val rows = Seq(doc0, doc1, doc2, doc3, doc4).zipWithIndex
      .map { case (t, id) => (id.toLong, t, "en", "a", t.length.toLong) }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.dedupSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet === Set(0L, 1L, 2L), "unique and sub-window docs report nothing")
    // the shared region yields one merged span of exactly its length
    assert(out(0L)._1 === 1L)
    assert(out(0L)._2 === shared.length.toLong)
    val frac1 = BigDecimal(shared.length.toDouble / doc1.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) === ((1L, shared.length.toLong, frac1)))
    // the internal repeat flags both occurrences as separate spans
    assert(out(2L)._1 === 2L)
    assert(out(2L)._2 === 2L * block.length)
  }

  test("dedup_spans coverage fraction is bounded and spans never exceed the doc") {
    val rows = Dedup.dedupSpans(spark, Sf0001).collect()
    assert(rows.nonEmpty, "fixtures plant near/exact-dup documents")
    rows.foreach { r =>
      assert(r.getLong(1) >= 1L)
      assert(r.getLong(2) >= Dedup.SpanWindow.toLong)
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("dedup_clusters: reps are cluster minima; sizes count members") {
    val out = Dedup.dedupClusters(spark, Sf0001).collect()
    assert(out.nonEmpty)
    val byRep = out.groupBy(_.getLong(1))
    byRep.foreach { case (rep, rows) =>
      assert(rows.map(_.getLong(0)).min === rep) // rep is the min member id
      assert(rows.forall(_.getLong(2) === rows.length)) // size consistent
    }
  }

  test("bandsOf declarative min lanes ≡ the minhash_signature aggregate, bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the band relation drives EVERY minhash gate (batch + streaming), so
    // the declarative-lane rewrite must reproduce the aggregate exactly
    val docs = (1 to 50).map { i =>
      (i.toLong, (1 to 40).map(t => s"tok${(i * 7 + t * 13) % 97}").mkString(" "))
    }.toDF("doc_id", "text")
    val sh = Dedup.hashedShingleRelOf(docs)
    val viaLanes = Dedup.bandsOf(sh)
      .select("doc_id", "band", "band_sig")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val viaAggregate = {
      val hashed = sh.select(col("doc_id"), pmod(col("h"), lit(2038074743L)).as("h"))
      hashed.groupBy("doc_id")
        .agg(graft.functions.minhash_signature(col("h"), 64, 2038074743L).as("sig"))
        .select(col("doc_id"), explode(sequence(lit(0), lit(15))).as("band"), col("sig"))
        .select(col("doc_id"), col("band"),
          concat_ws(",", slice(col("sig"), col("band") * 4 + 1, lit(4))
            .cast("array<string>")).as("band_sig"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    }
    assert(viaLanes === viaAggregate)
  }

  test("pairCounts: wide-id struct path is row-identical to the packed fast path") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // posting lists with repeated co-occurrence so counts exceed 1
    val postings = Seq(
      Array(1L, 5L, 9L), Array(5L, 1L), Array(9L, 5L, 1L, 7L), Array(7L))
      .toDF("ids")
    def collected(wide: Boolean) =
      Dedup.pairCounts(postings, wide)
        .orderBy("a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val packed = collected(wide = false)
    assert(packed === collected(wide = true),
      "the two pair-key representations must produce identical counts")
    assert(packed.contains((1L, 5L, 3L))) // co-occur in all three lists
    // ids past 2^31 (replica strides, snowflake ids, >2B-doc corpora):
    // the packed path throws by contract, the struct path serves
    val wideIds = Seq(Array(3000000000L, 1L, 3000000007L)).toDF("ids")
    intercept[org.apache.spark.SparkException] {
      Dedup.pairCounts(wideIds, wide = false).collect()
    }
    val got = Dedup.pairCounts(wideIds, wide = true)
      .orderBy("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 3000000000L, 1L), (1L, 3000000007L, 1L),
      (3000000000L, 3000000007L, 1L)))
    // ... and the dispatcher routes such a corpus to the struct path
    assert(Dedup.idsWide(Seq((3000000000L, "t")).toDF("doc_id", "text")))
    assert(!Dedup.idsWide(Seq((7L, "t")).toDF("doc_id", "text")))
  }

  test("pairCounts: skew-safe (a,b)-keyed sized exchange is row-identical " +
      "to the a-keyed one") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a "mega-doc" (id 1) that co-occurs everywhere — the length-skew
    // regime the (a,b) keying exists for: every pair keyed on a=1 would
    // land in one a-keyed partition
    val postings = Seq(
      Array(3000000000L, 1L, 9L), Array(1L, 5L), Array(9L, 5L, 1L, 7L),
      Array(1L, 7L), Array(1L, 3000000000L))
      .toDF("ids")
    def collected(skewSafe: Boolean) =
      Dedup.pairCounts(postings, wide = true, Some(5), skewSafe)
        .orderBy("a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(collected(skewSafe = true) === collected(skewSafe = false),
      "skew-safe keying must change only the partitioning, never the counts")
  }
}
