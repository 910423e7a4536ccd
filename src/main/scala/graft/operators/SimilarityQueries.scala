package graft.operators

import java.math.{BigDecimal => JBD}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{OracleSql => O, Tables}
import graft.functions.cosine_distance

/** Batch similarity-search operators beyond the reference's single-query
  * top-k: many query vectors resolved in one distributed pass — the shape a
  * training-data pipeline actually runs (dedup candidate lookup, retrieval
  * eval). Brute-force exact is the baseline; the IVF index (graft.index)
  * is the approximate scale path.
  */
object SimilarityQueries {

  val BatchQueries = 5
  val BatchK = 3
  val SqK = 10

  /** Exact top-k neighbors for each of the first [[BatchQueries]] vectors in
    * one pass: broadcast the query side, then TWO-PHASE top-k — map-side
    * size-k heaps per (query × partition) via
    * [[graft.functions.top_k_by_distance]], merged per query. The shuffle
    * carries ≤ k·|partitions| rows per query instead of funnelling all
    * |base|×|queries| scored rows into |queries| window reducers (the shape
    * that dies at scale). */
  def knnBatch(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val qs = base.filter(col("vec_id") < BatchQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    base.crossJoin(broadcast(qs))
      .select(col("qid"), col("vec_id"),
        cosine_distance(col("embedding"), col("qv")).as("dist"))
      .groupBy("qid")
      .agg(graft.functions.top_k_by_distance(col("dist"), col("vec_id"), BatchK).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("s.vec_id").as("vec_id"), col("s.dist").as("dist"))
      .orderBy("qid", "rank")
  }

  /** Per-label centroid components: element-wise mean of each label's
    * vectors, exploded to (label, dim, value) rows — the class-prototype
    * computation (retrieval eval, cluster drift monitoring). posexplode +
    * partial hash agg; shuffle carries |labels|·dim rows. Cross-engine sum
    * order differs → rounded to 6dp on both sides. */
  def labelCentroids(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim").cast("long").as("dim"))
      .agg(round(avg(col("x").cast("double")), 6).as("centroid_val"))
      .orderBy("label", "dim")

  /** The 100 TB path for [[labelCentroids]]: pgvector's `AVG(vector)`
    * aggregate ([[graft.functions.vector_avg]]) accumulates ONE double[]
    * per (label × partition) instead of exploding every row dim× before
    * the partial agg — the map side does array adds, the shuffle carries
    * |labels|·|partitions| arrays, and the dim-explosion happens only on
    * the |labels| result rows for output. Same rounded values as the
    * explode form (equality pinned in SimilarityQueriesSpec); shares
    * [[labelCentroids]]'s oracle SQL. */
  def labelCentroidsFast(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .groupBy("label")
      .agg(graft.functions.vector_avg(col("embedding")).as("v"))
      .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
      .select(col("label"), col("dim").cast("long").as("dim"),
        round(col("x"), 6).as("centroid_val"))
      .orderBy("label", "dim")

  /** Cluster count for [[kmeansAssign]] — topic-granularity knob. */
  val KmeansK = 8

  /** K-means topic clustering over the embedding corpus (Lloyd, 2
    * unrolled iterations) — the semantic-curation pass a training-data
    * pipeline runs for cluster-balanced sampling and SemDeDup-style
    * pruning. Deterministic throughout: seeds are the [[KmeansK]]
    * lowest-vec_id vectors, assignment ties break to the lowest cluster
    * id, and the one centroid update is ORDER-FREE: per (cluster, dim)
    * the mean is an exact DECIMAL(28,9) sum of 9dp-quantized components
    * (the [[embeddingCovariance]] recipe — no float accumulation-order
    * dependence, unlike a raw vector_avg whose partial-merge order could
    * flip a 6dp rounding boundary and cascade into different discrete
    * assignments), one double division, round 6dp, cast float — so the
    * second assignment's distances are again the bit-exact
    * [[cosine_distance]]. A cluster that captures no vectors in round one
    * simply drops out of round two (documented Lloyd behavior).
    *
    * Scale shape: each assignment is a MAP — the centroid table collapses
    * to ONE broadcast row holding an array of (cid, vector) structs, and
    * the per-row argmin is `array_min` over a transform (struct ordering
    * = distance then cid), so no corpus-sized shuffle or window exists in
    * either pass; the centroid update is a dim-explode into a K·d-group
    * hash agg with map-side combine (the label_centroids shape). */
  def kmeansAssign(spark: SparkSession, sfDir: String): DataFrame =
    kmeansCore(spark, sfDir)
      .select(col("vec_id"), col("cluster"), round(col("d"), 6).as("dist"))
      .orderBy("vec_id")

  /** Shared 2-round Lloyd pipeline: (vec_id, cluster, d) without the
    * presentation rounding/sort — [[kmeansAssign]], [[clusterSample]] and
    * [[prototypePrune]] build on it (mirrored by the shared oracle CTE
    * block).
    *
    * Known residual hazard, accepted: the centroid update's
    * `round(decimal_sum / n, 6)` CAN land exactly on a 6dp midpoint
    * (decimal/int quotients reach midpoints — see
    * [[TextAnalysis.stupidBackoffScore]]), where Spark's BigDecimal
    * shortest-string rounding and DuckDB's scaled-multiply rounding may
    * disagree by one 6dp step and flip a downstream assignment. The round
    * here is STRUCTURAL (it quantizes the centroid that seeds round two,
    * and changing the recipe would change every kmeans-family hash), the
    * fixtures are fixed and pass on both engines, and the one-hot
    * convergence spec pins semantics — so this stays, documented. */
  private def kmeansCore(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    // K seed rows → cid 0..K-1 in vec_id order (window over K rows post-limit)
    val init = e.orderBy("vec_id").limit(KmeansK)
      .select((row_number().over(Window.orderBy("vec_id")) - 1).cast("long").as("cid"),
        col("embedding").as("cvec"))

    // per-row argmin over the broadcast centroid array: struct (d, cid)
    // sorts by distance first, lowest cid on exact ties
    def assign(cents: DataFrame): DataFrame = {
      val centArr = cents.agg(collect_list(struct(col("cid"), col("cvec"))).as("cs"))
      e.crossJoin(broadcast(centArr))
        .select(col("vec_id"), col("embedding"),
          array_min(transform(col("cs"), s => struct(
            cosine_distance(col("embedding"), s.getField("cvec")).as("d"),
            s.getField("cid").as("cid")))).as("m"))
        .select(col("vec_id"), col("embedding"),
          col("m.cid").as("cluster"), col("m.d").as("d"))
    }

    val c1 = assign(init)
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy("cluster", "dim")
      .agg(sum(round(col("x").cast("double"), 9).cast("decimal(28,9)")).as("s"),
        count(lit(1)).as("n"))
      .select(col("cluster"), col("dim"),
        round(col("s").cast("double") / col("n").cast("double"), 6).cast("float").as("v"))
      .groupBy("cluster")
      .agg(array_sort(collect_list(struct(col("dim"), col("v")))).as("sv"))
      .select(col("cluster").as("cid"),
        transform(col("sv"), s => s.getField("v")).as("cvec"))
    assign(c1).select(col("vec_id"), col("cluster"), col("d"))
  }

  /** Per-cluster sample size for [[clusterSample]]. */
  val ClusterSampleN = 50

  /** Cluster-balanced sampling — the curation pass that follows topic
    * clustering: keep up to [[ClusterSampleN]] documents per k-means
    * cluster, chosen by deterministic salted hash (reproducible, unbiased
    * within cluster), so over-represented topics stop dominating the
    * training mix.
    *
    * Scale shape: NOT a per-cluster row_number window (that funnels each
    * cluster — corpus/K rows — through one reducer); the pick is the
    * bounded-heap [[graft.functions.top_k_by_distance]] aggregate over the
    * hash (map-side N-heaps per cluster × partition, N-row merges), so the
    * shuffle carries ≤ N·|partitions| rows per cluster. */
  def clusterSample(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.top_k_by_distance
    kmeansCore(spark, sfDir)
      .select(col("cluster"), col("vec_id"),
        // 60-bit hash folded below 2^53 so the heap's double ordering is
        // exact; ties (rare) break on vec_id in both engines
        graft.functions.salted_bucket(col("vec_id"), "cs", 1000000000000L)
          .cast("double").as("hd"))
      .groupBy("cluster")
      .agg(top_k_by_distance(col("hd"), col("vec_id"), ClusterSampleN).as("top"))
      .select(col("cluster"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("cluster"), (col("pos") + 1).cast("long").as("rnk"),
        col("s.vec_id").as("vec_id"))
      .orderBy("cluster", "rnk")
  }

  /** Per-cluster keep budget for [[prototypePrune]]. */
  val PrunePerCluster = 50

  /** Prototypicality pruning (Sorscher et al. 2022, "Beyond neural scaling
    * laws", public): within each k-means cluster keep the
    * [[PrunePerCluster]] examples FARTHEST from their centroid — the
    * hard/informative tail — and drop the prototypical near-centroid mass
    * the model learns for free. The abundant-data pruning metric that
    * paper shows beats random keeps.
    *
    * Scale shape: rides [[kmeansCore]] (broadcast centroids, map-only
    * assignment); the per-cluster pick is the bounded-heap
    * [[graft.functions.top_k_by_distance]] aggregate over NEGATED distance
    * (max-heap by min-heap), never a per-cluster row_number window — the
    * shuffle carries ≤ N·|partitions| rows per cluster.
    *
    * Exactness: distances round 6dp BEFORE the heap (the heap key and the
    * oracle's ORDER BY see identical doubles; negation is exact), ties
    * break on vec_id ascending in both engines. */
  def prototypePrune(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.top_k_by_distance
    kmeansCore(spark, sfDir)
      .select(col("cluster"), col("vec_id"),
        (-round(col("d"), 6)).as("negd"))
      .groupBy("cluster")
      .agg(top_k_by_distance(col("negd"), col("vec_id"), PrunePerCluster).as("top"))
      .select(col("cluster"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("cluster"), (col("pos") + 1).cast("long").as("rnk"),
        col("s.vec_id").as("vec_id"),
        // -(-d) round-trips exactly; +0.0 folds the d=0 row's IEEE -0.0
        (-col("s.dist") + lit(0.0)).as("dist"))
      .orderBy("cluster", "rnk")
  }

  /** Outlier z-score threshold for [[embeddingOutliers]]. */
  val OutlierZ = 2.0

  /** Embedding outlier detection — the mislabeled/garbage-vector sweep a
    * training pipeline runs before contrastive fine-tuning: distance of
    * each vector to ITS label's centroid, z-scored within the label, rows
    * with z ≥ [[OutlierZ]] reported worst-first.
    *
    * Scale shape: one vector_avg agg (|labels| arrays), centroids
    * broadcast back, one scan for distances, one |labels|-row stats agg,
    * second broadcast join — no windows, no self-joins.
    *
    * Cross-engine exactness (the round-then-derive recipe): centroid
    * components round to 6dp THEN cast float (both engines RNE) — from
    * there every distance is the bit-exact [[cosine_distance]]; per-label
    * mean/std round to 6dp (absorbing agg-order ulps, as in
    * [[labelCentroids]]); z is then one subtraction + division over
    * already-identical doubles. */
  def embeddingOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val cent = e.groupBy("label")
      .agg(graft.functions.vector_avg(col("embedding")).as("c"))
      .select(col("label"),
        transform(col("c"), x => round(x, 6).cast("float")).as("centroid"))
    val d = e.join(broadcast(cent), "label")
      .select(col("vec_id"), col("label"),
        round(cosine_distance(col("embedding"), col("centroid")), 6).as("dist"))
    val stats = d.groupBy("label").agg(
      round(avg(col("dist")), 6).as("mean_d"),
      round(stddev_samp(col("dist")), 6).as("std_d"))
      // a zero-spread label has no outliers BY DEFINITION — and its z
      // division would raise under ANSI mode (DuckDB would emit ±inf).
      // The isnan guard is NOT redundant: a single-member label has
      // stddev_samp = NaN, and Spark's non-IEEE ordering makes
      // NaN > 0.0 TRUE — without it the label survives and emits a
      // spurious z=NaN "worst outlier" (DuckDB's NULL stddev drops it)
      .filter(col("std_d") > 0.0 && !isnan(col("std_d")))
    d.join(broadcast(stats), "label")
      .select(col("vec_id"), col("label"), col("dist"),
        round((col("dist") - col("mean_d")) / col("std_d"), 4).as("z"))
      .filter(col("z") >= OutlierZ)
      .orderBy(col("z").desc, col("vec_id"))
  }

  /** Histogram of all pairwise cosine similarities in 0.1-wide buckets —
    * the corpus-redundancy diagnostic. Bucket ids floor bit-exact doubles,
    * so cross-engine counts match exactly. */
  def simHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val e1 = Tables.embeddings(spark, sfDir).select(col("vec_id").as("a"), col("embedding").as("v1"))
    val e2 = Tables.embeddings(spark, sfDir).select(col("vec_id").as("b"), col("embedding").as("v2"))
    e1.crossJoin(e2).filter(col("a") < col("b"))
      .select(floor(graft.functions.cosine_similarity(col("v1"), col("v2")) * 10).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** Linear-time mean pairwise cosine — the 100 TB path for
    * [[graft.operators.ReferenceQueries.avgPairwiseSim]]'s O(n²) self-join.
    *
    * Identity: with uᵢ = vᵢ/‖vᵢ‖, Σᵢ≠ⱼ uᵢ·uⱼ = ‖Σᵢuᵢ‖² − Σᵢ‖uᵢ‖², so
    * mean pairwise cosine = (‖Σu‖² − n) / (n(n−1)) — one scan, no join.
    * Elementwise Σu via posexplode + groupBy(dim): partial hash-agg makes
    * the shuffle |partitions|·dim rows, independent of n. Exact up to
    * float-sum order (rounded 6dp, like the crossJoin form); equality with
    * the O(n²) query is pinned in SimilarityQueriesSpec. */
  def avgPairwiseSimFast(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    // ‖v‖² as inner_product(v,v): same sequential left-to-right double
    // accumulation as the aggregate() HOF form, but codegen'd
    val normSq = graft.functions.inner_product(col("embedding"), col("embedding"))
    // norm is projected ONCE per row before the explode — inlining sqrt(normSq)
    // into a transform() lambda would re-run the full norm pass per ELEMENT
    // (d× the work, interpreted: measured 2.7 s vs 0.3 s at sf0.1)
    val sums = e
      .select(col("embedding"), sqrt(normSq).as("nrm"))
      .select(posexplode(col("embedding")).as(Seq("dim", "x")), col("nrm"))
      .select(col("dim"), (col("x").cast("double") / col("nrm")).as("ux"))
      .groupBy("dim").agg(sum(col("ux")).as("sd"))
    val ss = sums.agg(sum(col("sd") * col("sd")).as("ss"))
    val n = e.agg(count(lit(1)).cast("double").as("n"))
    ss.crossJoin(n)
      .select(round((col("ss") - col("n")) / (col("n") * (col("n") - 1.0d)), 6)
        .as("avg_sim"))
  }

  /** Pair-sampling modulus for [[simHistogramSampled]]: keep vec_ids whose
    * md5-derived hash ≡ 0 (mod this), so ~1/16 of pairs are scored. */
  val HistSampleMod = 4

  /** Sampled pairwise-similarity histogram — the scale path for
    * [[simHistogram]]'s all-pairs join. A deterministic md5-derived row
    * sample (≈ n/[[HistSampleMod]] rows) is self-joined, so the pair count
    * drops by HistSampleMod² while each bucket's SHARE estimates the full
    * histogram's share (unbiased; ±ε pinned vs the exact histogram in
    * SimilarityQueriesSpec). md5-derived (not Spark-only xxhash64) so the
    * DuckDB oracle reproduces the sample bit-for-bit. */
  def simHistogramSampled(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.md5_long
    val s = Tables.embeddings(spark, sfDir)
      .filter(md5_long(col("vec_id").cast("string")) % HistSampleMod === 0)
    val s1 = s.select(col("vec_id").as("a"), col("embedding").as("v1"))
    val s2 = s.select(col("vec_id").as("b"), col("embedding").as("v2"))
    s1.crossJoin(broadcast(s2)).filter(col("a") < col("b"))
      .select(floor(graft.functions.cosine_similarity(col("v1"), col("v2")) * 10).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** SQ8-quantized top-k: 4× smaller vectors scanned, approximate ranking
    * relative to EXACT cosine — but fully deterministic, so the whole
    * quantize→distance→top-k pipeline is oracle-checked bit-exact
    * ([[graft.OracleSql.sqCosDist]]); recall vs exact is additionally
    * pinned in SimilarityQueriesSpec. */
  def sqKnnTopK(spark: SparkSession, sfDir: String, k: Int = SqK): DataFrame = {
    import graft.functions.{sq_quantize, sq_cosine_distance}
    val e = Tables.embeddings(spark, sfDir)
    val quantized = e.select(col("vec_id"), sq_quantize(col("embedding")).as("sq"))
    val seed = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    quantized.crossJoin(broadcast(seed))
      .select(col("vec_id"),
        sq_cosine_distance(col("sq.codes"), col("sq.scale"), col("qv")).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }

  val RangeRadius = 0.8 // ~30 of 500 fixture vectors in range — selective but non-trivial
  val PerLabelK = 3

  /** Vector range search — pgvector's `WHERE embedding <=> q < r` shape
    * (the radius-query dual of top-k): every vector within cosine distance
    * [[RangeRadius]] of the seed. Embarrassingly parallel: one scan, one
    * codegen'd distance + filter per row, no shuffle until the
    * oracle-determinism sort. The selective-index path for tight radii is
    * the IVF triangle-inequality expansion [[Dedup.embeddingCandidates]]
    * already uses: probe only lists with θ(q, c) ≤ rad(c) + acos(1−r). */
  def rangeSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val seed = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    e.crossJoin(broadcast(seed))
      .select(col("vec_id"), cosine_distance(col("embedding"), col("qv")).as("dist"))
      .filter(col("dist") < RangeRadius)
      .orderBy("dist", "vec_id")
  }

  /** Top-[[PerLabelK]] nearest neighbors of the seed WITHIN each label —
    * grouped top-k (per-category retrieval, stratified eval sets). Uses the
    * same bounded-heap aggregate as [[knnBatch]]: map-side k-heaps per
    * (label × partition), merged per label — the shuffle carries
    * ≤ k·|partitions| rows per label, never the scored relation, and no
    * label's reducer sees more than |partitions|·k rows regardless of how
    * skewed the label distribution is. */
  def knnPerLabel(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val seed = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    e.crossJoin(broadcast(seed))
      .select(col("label"), col("vec_id"),
        cosine_distance(col("embedding"), col("qv")).as("dist"))
      .groupBy("label")
      .agg(graft.functions.top_k_by_distance(col("dist"), col("vec_id"), PerLabelK).as("top"))
      .select(col("label"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("label"), (col("pos") + 1).cast("long").as("rank"),
        col("s.vec_id").as("vec_id"), col("s.dist").as("dist"))
      .orderBy("label", "rank")
  }

  // a DOUBLE threshold: the Spark compare is double(|x|) > eps and the
  // DuckDB literal is double — a float32 eps (0.1f ≠ 0.1d) would flip
  // elements that sit exactly on the float boundary
  val SparseEps = 0.1
  val SparseK = 10

  /** Sparse-vector top-k — the pgvector 0.7 `sparsevec <=> sparsevec`
    * query shape ([[graft.functions.sparse_vectorize]] at |x| >
    * [[SparseEps]] keeps ~40% of the fixture dims; real sparsevec corpora
    * are lexical TF vectors at <1% density). The distance merge-walks the
    * index arrays — O(nnz) per pair, which is the entire point at 10k+
    * dims — and is bit-equal to dense cosine on the zero-masked vectors,
    * so the oracle recomputes it as a CASE-masked dense distance. `nnz`
    * reports each hit's sparsity. */
  def sparseKnnTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{sparse_cosine_distance, sparse_vectorize}
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), sparse_vectorize(col("embedding"), SparseEps).as("sv"))
    val seed = e.filter(col("vec_id") === 0).select(col("sv").as("qv"))
    e.crossJoin(broadcast(seed))
      .select(col("vec_id"),
        sparse_cosine_distance(col("sv"), col("qv")).as("dist"),
        size(col("sv.indices")).cast("long").as("nnz"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(SparseK)
  }

  /** [[sparseKnnTopK]]'s metric siblings in one query — pgvector 0.8's
    * full sparsevec operator family beyond cosine: rank by
    * `sparsevec <-> sparsevec` (L2, [[graft.functions.sparse_l2_distance]])
    * with the `<+>` taxicab distance alongside. Both merge-walk O(nnz) per
    * pair and are bit-equal to the dense distances on the zero-masked
    * vectors (skipped both-zero positions contribute IEEE +0.0
    * identities), so the oracle recomputes them as CASE-masked dense
    * distances. */
  def sparseL2TopK(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{sparse_l1_distance, sparse_l2_distance, sparse_vectorize}
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), sparse_vectorize(col("embedding"), SparseEps).as("sv"))
    val seed = e.filter(col("vec_id") === 0).select(col("sv").as("qv"))
    e.crossJoin(broadcast(seed))
      .select(col("vec_id"),
        sparse_l2_distance(col("sv"), col("qv")).as("dist"),
        sparse_l1_distance(col("sv"), col("qv")).as("l1"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(SparseK)
  }

  // sfDir → (embeddings fingerprint, sidecar path): mtime staleness like
  // the BM25 cache — a changed corpus rebuilds instead of serving stale
  // postings (and a catalog-restored registration is checked the same way)
  private val sparseIdxCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, String)]()

  private def embeddingsMtime(spark: SparkSession, sfDir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$sfDir/embeddings.parquet")
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .getFileStatus(p).getModificationTime
  }

  /** [[graft.index.SparseIndex]] over the fixture sparsevecs, built once
    * per (session, sfDir) like the IVF caches, rebuilt on corpus mtime
    * change. Superseded index dirs are tombstoned per corpus and reclaimed
    * after a grace window ([[graft.util.StaleSidecars]], same policy as
    * the BM25 cache) — neither leaked for the JVM's life nor deleted
    * under a racing query. */
  def sparseIndexFor(spark: SparkSession, sfDir: String): String = {
    val fp = embeddingsMtime(spark, sfDir)
    sparseIdxCache.compute(sfDir, (_, old) =>
      if (old != null && old._1 == fp) old
      else {
        if (old != null)
          graft.util.StaleSidecars.supersede(
            spark.sessionState.newHadoopConf(), s"sparse:$sfDir", old._2)
        import graft.functions.sparse_vectorize
        val path = graft.util.TempDirs
          .create("graft_sparse").resolve("index").toString
        graft.index.SparseIndex.build(
          Tables.embeddings(spark, sfDir)
            .select(col("vec_id"), sparse_vectorize(col("embedding"), SparseEps).as("sv")),
          path)
        (fp, path)
      })._2
  }

  /** (sfDir, corpus fingerprint, sidecar path) rows — catalog export for
    * [[graft.plans.Graft.saveCatalog]]. */
  def sparseRegistrations: Seq[(String, Long, String)] = {
    import scala.jdk.CollectionConverters._
    sparseIdxCache.asScala.toSeq.map { case (d, (fp, p)) => (d, fp, p) }
  }

  /** Re-wire a cataloged sparse index ([[graft.plans.Graft.loadCatalog]]);
    * live registrations win, staleness honored via the fingerprint. */
  def restoreSparseRegistration(sfDir: String, fingerprint: Long, path: String): Unit =
    sparseIdxCache.putIfAbsent(sfDir, (fingerprint, path))

  /** Test hook: simulate a fresh session (registrations are in-memory). */
  private[graft] def clearSparseRegistrations(): Unit = sparseIdxCache.clear()

  /** [[sparseKnnTopK]] answered through the inverted index — EXACT (the
    * per-candidate fold reproduces the merge-walk bit-for-bit and
    * non-candidates flow through the same distance formula with dot = 0),
    * so it shares sparse_knn_topk's hash oracle verbatim. The scan this
    * avoids: brute force touches every row; this touches Σ df(q dims)
    * posting rows + the narrow norms sidecar. */
  def sparseKnnIndexed(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.sparse_vectorize
    val idx = sparseIndexFor(spark, sfDir)
    val q = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .select(sparse_vectorize(col("embedding"), SparseEps).as("sv"))
      .select("sv.indices", "sv.values").head()
    graft.index.SparseIndex.knn(spark, idx,
      q.getAs[collection.Seq[Int]](0).toArray,
      q.getAs[collection.Seq[Float]](1).toArray, SparseK)
  }

  val HalfK = 10

  /** halfvec top-k — pgvector `halfvec <=> halfvec LIMIT k`: vectors
    * stored as binary16 (2× less scan bandwidth than float32, the same
    * lever as SQ8's 4×), distance computed without re-materializing float
    * arrays. Deterministic AND fully DuckDB-oracled: binary16 RNE is
    * expressible exactly in SQL ([[graft.OracleSql.halfRne]] — power-of-two
    * quantization makes the scaled value exact in double, so banker's
    * rounding is CASE arithmetic), and the distance accumulates the same
    * rounded doubles in the same order. Recall vs float32 additionally
    * pinned in HalfVecSpec. */
  def halfKnnTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{half_cosine_distance, half_pack}
    val e = Tables.embeddings(spark, sfDir)
    // at 100 TB the packed column is a written sidecar, like the SQ codes
    val packed = e.select(col("vec_id"), half_pack(col("embedding")).as("hv"))
    val seed = packed.filter(col("vec_id") === 0).select(col("hv").as("qv"))
    packed.crossJoin(broadcast(seed))
      .select(col("vec_id"), half_cosine_distance(col("hv"), col("qv")).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(HalfK)
  }

  /** pgvector's remaining halfvec operator family (`<->` `<#>` `<+>` on
    * halfvec, pgvector 0.7+) in one ranked scan — compose-don't-rebuild:
    * [[graft.functions.half_unpack]] widens binary16 EXACTLY to float32,
    * so the standard codegen'd distance kernels ARE the halfvec kernels
    * (bit-equal to dedicated half-loops by construction; the cosine twin
    * [[halfKnnTopK]] keeps its fused kernel as the bandwidth-optimal
    * form). Ranked by L2 with id tie-break → TakeOrderedAndProject. */
  def halfDistancesTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{half_pack, half_unpack, inner_product, l1_distance, l2_distance}
    val e = Tables.embeddings(spark, sfDir)
    val packed = e.select(col("vec_id"), half_pack(col("embedding")).as("hv"))
    val seed = packed.filter(col("vec_id") === 0).select(col("hv").as("qv"))
    packed.crossJoin(broadcast(seed))
      .select(col("vec_id"),
        l2_distance(half_unpack(col("hv")), half_unpack(col("qv"))).as("l2"),
        inner_product(half_unpack(col("hv")), half_unpack(col("qv"))).as("ip"),
        l1_distance(half_unpack(col("hv")), half_unpack(col("qv"))).as("l1"))
      .orderBy(col("l2"), col("vec_id"))
      .limit(HalfK)
  }

  val BqCandidates = 50
  val BqK = 10

  /** Binary-quantized top-k: 1-bit sign quantization → Hamming candidate
    * stage → exact-cosine rerank of the top-[[BqCandidates]]. The
    * multi-stage shape every production vector store runs (BQ prefilter +
    * float rerank): the candidate scan touches 48 B/row of packed sign
    * bits (32× less bandwidth than float32) and ranks with XOR+popcount;
    * only [[BqCandidates]] rows ever see float math, fetched by an
    * equi-join against the base table (broadcast: the candidate side is k
    * rows). Both stages compile to TakeOrderedAndProject — no global sort.
    *
    * Fully deterministic (hamming ties broken by vec_id, then cosine ties
    * by vec_id), so the whole pipeline is oracle-checked bit-exact: the
    * oracle counts sign mismatches directly over the float arrays —
    * definitionally equal to XOR+popcount over [[graft.functions.bq_pack]]
    * words. Recall vs exact cosine is additionally pinned in
    * SimilarityQueriesSpec. */
  def bqKnnTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{bq_hamming, bq_pack}
    val e = Tables.embeddings(spark, sfDir)
    // At 100 TB the packed signatures are a precomputed sidecar (like the
    // SQ/PQ codes); packing inline keeps the query self-contained here.
    val sigs = e.select(col("vec_id"), bq_pack(col("embedding")).as("sig"))
    val seed = e.filter(col("vec_id") === 0)
      .select(bq_pack(col("embedding")).as("qsig"), col("embedding").as("qv"))
    val cand = sigs.crossJoin(broadcast(seed))
      .select(col("vec_id"), col("qv"), bq_hamming(col("sig"), col("qsig")).as("hamming"))
      .orderBy(col("hamming"), col("vec_id"))
      .limit(BqCandidates)
    cand.join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("vec_id"), col("hamming"),
        cosine_distance(col("embedding"), col("qv")).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(BqK)
  }

  /** Bit-opclass top-k THROUGH the SQL surface — pgvector's
    * `ORDER BY binary_quantize(v) <%> binary_quantize(q)` shape: Jaccard
    * distance over packed sign bits (`jaccard_distance`, [[graft.functions.BqJaccard]]),
    * Hamming alongside (`<~>`), both registered SQL functions exercised via
    * spark.sql like [[ReferenceQueries.vectorNorms]].
    *
    * Scale shape: signature packing is a codegen'd map (at 100 TB the
    * packed sidecar is precomputed); the 1-row query side broadcasts; the
    * rank is TakeOrderedAndProject over d/64-word popcounts — 32× less
    * bandwidth than float scans, the same candidate-stage economics as
    * [[bqKnnTopK]]. Exactness: integer bit counts, one IEEE division. */
  def bqKnnJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.registerAll(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("graft_bqj_embeddings")
    spark.sql(
      s"""WITH s AS (
         |  SELECT vec_id, binary_quantize(embedding) AS sig
         |  FROM graft_bqj_embeddings),
         |q AS (SELECT sig AS qsig FROM s WHERE vec_id = 0)
         |SELECT s.vec_id,
         |  jaccard_distance(s.sig, q.qsig) AS jaccard,
         |  hamming_distance(s.sig, q.qsig) AS hamming
         |FROM s, q
         |ORDER BY jaccard, vec_id
         |LIMIT $BqK""".stripMargin)
  }

  /** Adaptive-retrieval prefix length — dims 1..[[MrlPrefix]] rank the
    * candidate stage (Matryoshka-style truncation: MRL-trained embeddings
    * front-load information, so a short prefix preserves coarse order). */
  val MrlPrefix = 16
  /** Candidate pool the prefix stage hands to the full-vector rerank —
    * 10× the final k: the fixture embeddings are NOT Matryoshka-trained
    * (no front-loading), making them the adversarial case for prefix
    * ranking; MRL-trained embeddings reach the same recall with far less
    * over-fetch. */
  val MrlCandidates = 100

  /** Adaptive retrieval over truncated embeddings — the pgvector
    * `subvector` recipe (pgvector 0.8 docs: index `subvector(v, 1, k)`,
    * rank candidates by prefix distance, rerank with the full vector;
    * Kusupati et al. 2022's Matryoshka funnel): stage 1 ranks cosine over
    * the [[MrlPrefix]]-dim prefix — 4× less bandwidth than full vectors at
    * d=64, the same candidate-stage economics as [[bqKnnTopK]] one rung up
    * the precision ladder — stage 2 reranks only [[MrlCandidates]] ids
    * with exact full-vector cosine via a broadcast fetch join.
    *
    * Scale shape: TakeOrderedAndProject at both stages; at 100 TB the
    * prefix column is a precomputed sidecar (or the leading bytes of the
    * row — truncation IS the layout win). Both stages deterministic
    * (id tie-breaks), so the two-stage pipeline is oracle-exact. */
  def mrlKnnTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.subvector
    val e = Tables.embeddings(spark, sfDir)
    val pref = e.select(col("vec_id"),
      subvector(col("embedding"), 1, MrlPrefix).as("pv"))
    val seed = e.filter(col("vec_id") === 0)
      .select(subvector(col("embedding"), 1, MrlPrefix).as("qp"),
        col("embedding").as("qv"))
    val cand = pref.crossJoin(broadcast(seed))
      .select(col("vec_id"), col("qv"),
        cosine_distance(col("pv"), col("qp")).as("pdist"))
      .orderBy(col("pdist"), col("vec_id"))
      .limit(MrlCandidates)
    cand.join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("vec_id"), col("pdist"),
        cosine_distance(col("embedding"), col("qv")).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(BqK)
  }

  /** Clustering-quality evaluation over the Lloyd assignment — purity
    * per cluster against the embeddings' ground-truth labels: the
    * standard external metric (majority-label fraction) a curation
    * pipeline reports when validating topic clusters before
    * cluster-balanced sampling/pruning. Composes the SHARED 2-round
    * [[kmeansCore]] (same oracle CTE block), so the metric grades
    * exactly the assignment the other cluster queries use.
    *
    * Scale shape: one (cluster × label) hash agg over the assignment
    * (≤ K·|labels| groups); the majority pick is a row_number window
    * over those bounded COUNT rows (n DESC, label ASC tie-break), never
    * the corpus; one division. Oracle-exact: integer counts, one double
    * divide. */
  def clusterPurity(spark: SparkSession, sfDir: String): DataFrame = {
    val labeled = kmeansCore(spark, sfDir)
      .join(Tables.embeddings(spark, sfDir).select(col("vec_id"), col("label")), "vec_id")
    val cl = labeled.groupBy("cluster", "label").agg(count(lit(1)).as("n"))
    // the majority pick is a window over (cluster × label) COUNTS —
    // ≤ K·|labels| rows, bounded regardless of corpus size
    val w = Window.partitionBy("cluster").orderBy(col("n").desc, col("label").asc)
    val sizes = cl.groupBy("cluster").agg(sum(col("n")).as("cluster_size"))
    cl.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .join(sizes, "cluster")
      .select(col("cluster"), col("label").cast("long").as("majority_label"),
        col("cluster_size"),
        (col("n").cast("double") / col("cluster_size").cast("double")).as("purity"))
      .orderBy("cluster")
  }

  /** Neighbors per node in the kNN graph queries. */
  val KnnGraphK = 3
  /** Floor on the lists each vector probes in [[knnGraphIvf]]. */
  val KnnGraphProbes = 4

  /** Probe count for a corpus whose index has `nLists` lists: the
    * [[KnnGraphProbes]] floor through every fixture and mid-scale point,
    * then growing ∝ √lists (the faiss nprobe-∝-√nlist practice). A FIXED
    * probe count cannot hold recall under corpus-proportional list counts:
    * each natural cluster spans ~lists/clusters sub-lists, so constant
    * probes cover a shrinking fraction of every cluster as the corpus
    * grows — measured recall@3 0.990 at 300× (9,375 lists, probes 4) →
    * 0.875 at 1000× (31,250 lists), bench_sf100 r14, after the symmetric
    * co-probe had already bought one doubling. √-growth keeps candidate
    * volume (probes·n·occupancy) at ~n^1.25 — probes ∝ lists would be the
    * n² this family exists to avoid. Calibration: divisor 22 keeps every
    * point ≤ 300× at the measured probes-4 plans (√9375/22 = 4.4 → 4) and
    * doubles the 1000× point (√31250/22 = 8.0 → 8); the 65,536-list cap
    * lands at 12. */
  def probesFor(nLists: Long): Int =
    math.max(KnnGraphProbes,
      math.round(math.sqrt(math.max(1L, nLists).toDouble) / 22.0).toInt)

  /** Exact embedding kNN graph — top-[[KnnGraphK]] neighbors for EVERY
    * vector: the curation primitive under SemDeDup, kNN-LM data
    * selection and graph-based cluster pruning. This is the documented
    * O(n²)-compute parity form (the third member of the
    * avg_pairwise_sim / sim_histogram family, same contract: exact,
    * oracle-gated, with a bucketed scale twin — [[knnGraphIvf]]): the
    * distance matrix is inherent to an EXACT graph, but the SHUFFLE
    * stays bounded — per-partition k-heaps mean ≤ k·|partitions| rows
    * per node move, never the n² scored pairs (the knn_batch two-phase
    * shape with the whole corpus as the query side). */
  def knnGraph(spark: SparkSession, sfDir: String): DataFrame =
    knnGraphEdges(spark, sfDir).orderBy("vec_id", "rank")

  /** [[knnGraph]] without the output-determinism sort — the edge source
    * for [[semanticClusters]]: a global orderBy is two passes over its
    * input (range-sample + sort), and the mutual-kNN self-join +
    * checkpointing CC tail neither read nor keep the order (same
    * rationale as Dedup.dedupMinhashPairs). */
  private def knnGraphEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val b = e.select(col("vec_id").as("nbr"), col("embedding").as("bv"))
    e.crossJoin(b).filter(col("vec_id") =!= col("nbr"))
      .select(col("vec_id"), col("nbr"),
        cosine_distance(col("embedding"), col("bv")).as("dist"))
      .groupBy("vec_id")
      .agg(graft.functions.top_k_by_distance(col("dist"), col("nbr"), KnnGraphK).as("top"))
      .select(col("vec_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("rank"),
        col("s.vec_id").as("nbr"), col("s.dist").as("dist"))
  }

  /** IVF-bucketed kNN graph — [[knnGraph]]'s scale path (the production
    * build for corpora where n² distances are off the table): every
    * vector is assigned to its [[KnnGraphProbes]] nearest IVF lists
    * (map-only against broadcast centroids), candidates are the vectors
    * sharing a list — ONE distributed equi-join on list_id, no driver
    * collect of anything corpus-sized (deliberately NOT
    * [[graft.index.IvfIndex.probeMany]], whose per-batch driver-side
    * probe-pair collect is right for query batches and wrong for a
    * corpus-sized self-graph) — then the same bounded-heap top-k.
    * Candidate volume is Σ_l |l|·(probes assigned to l): linear in n at
    * the constant-occupancy list sizing; hot lists are AQE skew-join
    * territory — demonstrated, not asserted: SkewJoinSpec builds a
    * one-dominant-cluster corpus and pins BOTH that OptimizeSkewedJoin
    * splits the hot list_id partition and that the split plan's rows are
    * bit-identical to the plain plan's.
    * Approximate (a true neighbor outside every probed list is missed)
    * → rows-only gate, recall vs the exact graph spec-pinned.
    *
    * `probes` is the recall knob (default [[KnnGraphProbes]]): each
    * +1 widens every node's candidate pool by one more list — recall
    * rises with probes while cost stays Σ_l |l|·(probes assigned to l).
    * On CLUSTERED embeddings (where real corpora live) true neighbors
    * share the home list and the default already lands ≥0.8 recall@k
    * (spec-pinned on a clustered fixture); the un-clustered hash fixture
    * is the adversarial floor (0.5 gate). */
  def knnGraphIvf(spark: SparkSession, sfDir: String,
                  probes: Int = 0): DataFrame =
    knnGraphIvfEdges(spark, sfDir, probes).orderBy("vec_id", "rank")

  /** [[knnGraphIvf]] without the output-determinism sort — the edge source
    * for [[semanticClustersIvf]] (see [[knnGraphEdges]]). */
  private def knnGraphIvfEdges(spark: SparkSession, sfDir: String,
                               probes: Int = 0): DataFrame = {
    import graft.functions.top_k_by_distance
    val idx = IndexQueries.indexFor(spark, sfDir)
    val cents = spark.read.parquet(s"$idx/centroids").select("list_id", "centroid")
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    // probes ≤ 0 → list-count-scaled default (see probesFor): fixture and
    // mid-scale corpora keep the KnnGraphProbes floor, large-list indexes
    // grow ∝ √lists so recall doesn't decay with the corpus
    val nProbes = if (probes > 0) probes
      else probesFor(IndexQueries.listCount(spark, idx).toLong)
    // the shared assignment stage (one definition across the IVF scale
    // paths — IvfIndex.searchMany, this graph, dedup_embedding_ivf)
    val assigned = graft.index.IvfIndex.assignProbes(
      e, cents, "vec_id", "embedding", nProbes, metric = "cosine")
    // Candidate-join width scales with the candidate volume (probes ·
    // occupancy · n, known from the index sidecar), like every pair-stream
    // exchange in the engine (graft.util.Exchanges): through
    // Dedup.WideBranchFactor× the session floor the plan is untouched —
    // fixtures keep AQE auto-broadcast of the tiny lists side and
    // skew-join splitting (SkewJoinSpec pins it; an explicit-repartition
    // origin would disable both), and near the floor the AQE plan's saved
    // exchange outweighs the width (the hysteresis rationale measured on
    // dedup_embedding_ivf at 300×, r14). Well past the floor the width
    // bounds the per-task candidate stream AND lifts the stage's
    // parallelism cap off the session constant — on a real cluster a
    // 32-wide exchange is a 32-way parallelism ceiling however many
    // executors exist.
    val n = IndexQueries.vecCount(spark, sfDir)
    val nLists = math.max(1L, IndexQueries.listCount(spark, idx).toLong)
    val cands = nProbes.toLong * n * ((n + nLists - 1) / nLists)
    val sessionParts = spark.sessionState.conf.numShufflePartitions
    val w = graft.util.Exchanges.widthFor(
      cands, sessionParts, graft.operators.Dedup.CandidateRowsPerPartition)
    val lists = spark.read.parquet(s"$idx/lists")
    val (homeSide, assignedSide) =
      if (w <= graft.operators.Dedup.WideBranchFactor * sessionParts)
        (lists, assigned)
      else (lists.hint("shuffle_hash"), assigned.repartition(w, col("list_id")))
    homeSide
      .join(assignedSide, Seq("list_id"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        cosine_distance(col("embedding"), col("qv")).as("dist"))
      // SYMMETRIC co-probe: every scored (prober, member) pair feeds BOTH
      // endpoints' heaps — the pair (x, y) surfaces if x probes y's home
      // list OR y probes x's, doubling effective coverage for free (the
      // join is computed once; the explode pipelines inside the same
      // stage, and cosine commutes elementwise so the flipped row's dist
      // is bit-equal — no second scoring). One-directional coverage is
      // what decayed at 1000× data: list count grows with n at constant
      // occupancy, so a FIXED probe count covers a shrinking fraction of
      // each natural cluster's sub-lists (recall@3 0.990 at 300× → 0.708
      // at 1000×, bench_sf100.json r14). A pair missed in one direction
      // is usually caught in the other (independent-ish quantization
      // error at the two endpoints). Duplicates — both directions firing
      // — are absorbed by the id-distinct heap (TopKBuffer), which no
      // pre-aggregation distinct could do across partial buffers.
      .select(explode(array(
          struct(col("qid").as("q"), col("vec_id").as("v")),
          struct(col("vec_id").as("q"), col("qid").as("v")))).as("e2"),
        col("dist"))
      .select(col("e2.q").as("qid"), col("e2.v").as("vec_id"), col("dist"))
      .groupBy("qid")
      .agg(top_k_by_distance(col("dist"), col("vec_id"), KnnGraphK).as("top"))
      .select(col("qid").as("vec_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("rank"),
        col("s.vec_id").as("nbr"), col("s.dist").as("dist"))
  }

  /** Semantic clusters over the MUTUAL-kNN graph — compose, don't
    * rebuild: [[knnGraph]]'s edges, kept only where the relation is
    * mutual (a ∈ top-k(b) AND b ∈ top-k(a) — the standard symmetric
    * filter that kills hub-node chaining), fed into the SAME star
    * connected-components kernel the dedup family runs
    * ([[graft.operators.Dedup.connectedComponentsStar]]). The SemDeDup
    * shape: each returned row is a node in a semantic duplicate/topic
    * cluster (singletons — nodes with no mutual edge — are absent by
    * construction, mirroring the dedup cluster queries).
    *
    * Scale shape: the edge stage is [[knnGraph]]'s (k-bounded shuffles;
    * the scale twin [[semanticClustersIvf]] swaps in [[knnGraphIvf]]'s
    * candidate join); the mutual filter is a self-equi-join of the n·k
    * edge relation; CC is the adaptive driver/distributed star kernel.
    * Exactness: edges are deterministic (heap tie-breaks), CC labels are
    * order-free minima → oracle-exact against the recursive-CTE
    * closure. */
  def semanticClusters(spark: SparkSession, sfDir: String): DataFrame =
    mutualKnnClusters(knnGraphEdges(spark, sfDir))

  /** [[semanticClusters]]' scale path — the SAME mutual filter + star CC
    * over [[knnGraphIvf]]'s bucketed edge stage, so the full SemDeDup
    * pipeline (assign → candidate equi-join → bounded-heap kNN → mutual
    * filter → CC) plans ZERO cartesians and survives corpora where n²
    * distances are off the table. Approximate exactly where the edge
    * stage is (a missed true neighbor can split or drop an edge) →
    * rows-only gate; pair-level label agreement vs the exact form is
    * spec-pinned on the clustered fixture, and PlanGuardSpec sweeps the
    * plan (this query is deliberately NOT on the cartesian allowlist). */
  def semanticClustersIvf(spark: SparkSession, sfDir: String): DataFrame =
    mutualKnnClusters(knnGraphIvfEdges(spark, sfDir))

  /** Shared mutual-kNN → star-CC tail of the semantic-cluster pair:
    * takes any (vec_id, nbr) kNN edge relation, keeps mutual edges
    * (a ∈ top-k(b) AND b ∈ top-k(a)), labels components, and sizes the
    * clusters. The mutual filter is ONE count aggregate over the
    * canonicalized n·k edge relation (see below — the flipped-key
    * self-join it replaced executed the edge pipeline twice). */
  private def mutualKnnClusters(knnEdges: DataFrame): DataFrame = {
    // Mutuality WITHOUT the flipped-key self-join: each directed edge
    // (src, dst) is unique (the per-node heap is id-distinct and
    // self-edges are filtered), so a pair is mutual iff its canonical
    // (min, max) form appears exactly TWICE — one count agg on the n·k
    // edge relation. The former self-join keyed its two branches on
    // (src, dst) vs (dst, src): different hash partitionings, so
    // ReuseExchange could not fire and the WHOLE edge pipeline executed
    // twice (for semantic_clusters that is the n² distance scan, twice) —
    // measured r16 at sf0.1: 2.18 → 1.38 s (guide §2.4).
    val mutual = knnEdges.select(
        least(col("vec_id"), col("nbr")).as("a"),
        greatest(col("vec_id"), col("nbr")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n2"))
      .filter(col("n2") === 2)
      .select("a", "b")
    val labels = graft.operators.Dedup.connectedComponentsStar(mutual)
    val sizes = labels.groupBy("lab").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "lab")
      .select(col("node").as("vec_id"), col("lab").as("cluster_rep"),
        col("cluster_size"))
      .orderBy("vec_id")
  }

  /** Candidate pool the MMR greedy pass diversifies over. */
  val MmrCandidates = 20
  /** Results [[mmrRerank]] returns. */
  val MmrK = 10
  /** Relevance↔diversity trade-off (λ=1 is pure relevance). */
  val MmrLambda = 0.5

  /** Maximal Marginal Relevance rerank — Carbonell & Goldstein 1998: greedy
    * diversity selection over a relevance-ranked candidate pool, picking at
    * each step argmax λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s). The RAG-serving
    * and curation shape (diverse context windows, diverse few-shot pools)
    * that a plain top-k can't express because each pick depends on the set
    * chosen so far.
    *
    * Scale split: the DISTRIBUTED work is the candidate stage (exact cosine
    * top-[[MmrCandidates]], TakeOrderedAndProject over the corpus) and the
    * candidate×candidate sim matrix (computed IN SPARK with the same
    * codegen'd [[graft.functions.cosine_similarity]] the relevance stage
    * used, so the greedy pass sees identical doubles). The greedy selection
    * itself is inherently sequential (pick i depends on picks 1..i−1) and
    * runs driver-side over the collected C×C matrix — C² doubles, MODEL-
    * sized (the repo's bounded-collect contract: centroids/codebooks class,
    * never corpus-sized). Deterministic (max-mmr ties break on vec_id), so
    * the whole operator is oracle-exact against an unrolled k-step CTE
    * chain (the [[TextAnalysis.bpeLearn]] generated-chain pattern). */
  def mmrRerank(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.cosine_similarity
    val e = Tables.embeddings(spark, sfDir)
    val seed = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val cand = e.crossJoin(broadcast(seed))
      .select(col("vec_id"), col("embedding"),
        cosine_similarity(col("embedding"), col("qv")).as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(MmrCandidates)
      .persist() // two consumers (rel rows + pair matrix); C rows, model-sized
    try {
      val rels = cand.select(col("vec_id"), col("rel")).collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      val b = cand.select(col("vec_id").as("ib"), col("embedding").as("b_emb"))
      val sims = cand.crossJoin(b)
        .select(col("vec_id").as("ia"), col("ib"),
          cosine_similarity(col("embedding"), col("b_emb")).as("sim"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      // greedy: same double ops as the oracle chain (λ·rel − (1−λ)·max sim)
      val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Double)]
      val remaining = scala.collection.mutable.SortedMap(rels: _*)
      for (step <- 1 to math.min(MmrK, rels.length)) {
        val best = remaining.map { case (id, rel) =>
          val pen = if (selected.isEmpty) 0.0
            else selected.iterator.map(s => sims((id, s._2))).max
          (id, rel, MmrLambda * rel - (1.0 - MmrLambda) * pen)
        }.minBy { case (id, _, m) => (-m, id) } // max mmr, ties to low id
        selected += ((step.toLong, best._1, best._2, best._3))
        remaining -= best._1
      }
      import spark.implicits._
      selected.toSeq.toDF("mmr_rank", "vec_id", "relevance", "mmr_score")
        .orderBy("mmr_rank")
    } finally cand.unpersist()
  }

  /** Fixture embedding dimensionality (TESTDATA.md) — documentation only:
    * the covariance/PCA family learns d from the data at runtime
    * ([[graft.functions.CovMomentSums]]), so the reference's default 384
    * dims (README.md:38) work unchanged. */
  val CovDims = 64

  /** Upper-triangle covariance matrix of the embedding columns — the
    * single-pass statistic feeding PCA/whitening (decorrelate before
    * quantization — the OPQ rotation's cousin — or reduce dims before ANN).
    * cov(i,j) = (Σxᵢxⱼ − ΣxᵢΣxⱼ/n)/n over 9dp-quantized terms: each
    * float32 product is EXACT in double (24+24 mantissa bits < 53), the
    * 9dp round is deterministic (a dyadic rational can never tie at a
    * decimal midpoint), and the DECIMAL(28,9) sums are exact integer
    * arithmetic — so the oracle matches bit-for-bit with no
    * accumulation-order dependence, unlike a raw double Σ.
    *
    * Scale shape: ONE pass; per row the d(d+1)/2 products accumulate into
    * a single typed map-side buffer ([[graft.functions.CovMomentSums]]) —
    * the shuffle carries ONE buffer per partition regardless of corpus
    * size OR dimensionality. CPU is O(d²/2) per row, inherent to
    * covariance. */
  /** ONE-pass moment collection: the single-buffer
    * [[graft.functions.CovMomentSums]] aggregate carries the d(d+1)/2
    * DECIMAL product sums sᵢⱼ, the d first-moment sums sᵢ and the row count
    * n in ONE map-side buffer per partition — no per-term rows at all, so
    * the pass costs the same shuffle (one buffer/partition) at d=64 and at
    * the reference's default d=384, where the former posexplode emitted
    * ~74k rows per input row. d is learned from the data; a ragged corpus
    * (mixed dims) fails loud inside the aggregate. The collect is one
    * struct row — model-sized, bounded by dimensionality, never by corpus
    * size (the centroid-sidecar pattern).
    * Returns (sij upper-triangle row-major, si, n). */
  private[operators] def collectMoments(
      spark: SparkSession, sfDir: String): (Array[JBD], Array[JBD], Long) =
    collectMomentsOf(Tables.embeddings(spark, sfDir))

  private[operators] def collectMomentsOf(
      embeddings: DataFrame): (Array[JBD], Array[JBD], Long) = {
    val spark = embeddings.sparkSession
    val shuffleParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val row = embeddings
      // per-row work is O(d²) BigDecimal terms — parallelism must come from
      // rows, not input splits (a single parquet file is one split)
      .repartition(shuffleParts)
      .agg(graft.functions.cov_moment_sums(col("embedding")).as("m"))
      .select(col("m.sums"), col("m.n"))
      .head()
    val all = row.getSeq[JBD](0).toArray
    val n = row.getLong(1)
    // |sums| = d(d+1)/2 + d → invert for d
    val d = ((math.sqrt(9.0 + 8.0 * all.length) - 3.0) / 2.0).round.toInt
    val t = d * (d + 1) / 2
    require(t + d == all.length,
      s"collectMoments: malformed moment layout (${all.length} slots)")
    (all.take(t), all.drop(t), n)
  }

  /** Driver-side covariance matrix from the collected moments, mirroring
    * the oracle arithmetic bit for bit: decimal sums → double (exact
    * BigDecimal.doubleValue, same as Spark's decimal→double cast), one
    * deterministic double expression per cell, HALF_UP 6dp round
    * (doubles can never tie at a decimal midpoint), and + 0.0 folding IEEE
    * −0.0 — DuckDB and Spark disagree on the sign bit otherwise. O(d²)
    * driver work, like the Jacobi eigensolve that consumes it. */
  private[operators] def covFromMoments(
      sij: Array[JBD], si: Array[JBD], n: Long): Array[Array[Double]] = {
    val d = si.length
    val nd = n.toDouble
    val c = Array.ofDim[Double](d, d)
    var pos = 0
    var i = 0
    while (i < d) {
      var j = i
      val siD = si(i).doubleValue
      while (j < d) {
        val raw = (sij(pos).doubleValue - siD * si(j).doubleValue / nd) / nd
        val v = JBD.valueOf(raw).setScale(6, java.math.RoundingMode.HALF_UP)
          .doubleValue + 0.0
        c(i)(j) = v
        c(j)(i) = v
        pos += 1
        j += 1
      }
      i += 1
    }
    c
  }

  def embeddingCovariance(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (sij, si, n) = collectMoments(spark, sfDir)
    val d = si.length
    val c = covFromMoments(sij, si, n)
    val rows = for { i <- 0 until d; j <- i until d }
      yield (i.toLong, j.toLong, c(i)(j))
    spark.createDataFrame(rows).toDF("i", "j", "cov").orderBy("i", "j")
  }

  /** Power-iteration rounds for [[pcaProject]] — unrolled, like the Lloyd
    * rounds in [[kmeansAssign]], so the oracle can state each round as a
    * CTE. */
  val PcaIters = 2

  /** First-principal-component projection — the spectral pass of embedding
    * curation (PCA-based quality/domain separation; also the whitening
    * precursor): the dominant eigenvector of the exact covariance via
    * [[PcaIters]] unrolled power-iteration rounds, then every embedding
    * projected onto it. Emits (vec_id, pc1 score, eigenvalue estimate).
    *
    * Scale shape: the covariance relation is d²-sized (one aggregate
    * buffer, d learned from the data) — bounded, collected to the driver
    * like the centroid sidecars, where the two matvec+normalize rounds run
    * in exact decimal; the resulting d-float eigenvector returns as a
    * LITERAL, so the projection is one shuffle-free codegen'd map over the
    * corpus. The only corpus-sized work is covariance's single pass.
    *
    * Cross-engine exactness (the kmeans round-then-derive recipe, mirrored
    * step for step in the oracle's CTE chain): covariance entries are
    * 6dp-rounded doubles (order-free by the DECIMAL recipe); each matvec
    * sums 9dp-rounded products as exact BigDecimal (the SQL side:
    * DECIMAL(28,9)); the norm is one IEEE sqrt; each normalized component
    * rounds 6dp then casts float32 — from there the projection is the
    * bit-pinned [[graft.functions.inner_product]] fragment. Doubles can
    * never tie at a decimal midpoint, so HALF_UP vs engine-native rounding
    * cannot diverge. Sign is pinned by the fixed all-ones start vector. */
  def pcaProject(spark: SparkSession, sfDir: String): DataFrame = {
    import java.math.RoundingMode
    def round9(x: Double): JBD = JBD.valueOf(x).setScale(9, RoundingMode.HALF_UP)
    def round6(x: Double): Double =
      JBD.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue
    // ONE corpus pass: the single-buffer moment aggregation (one struct-row
    // collect), covariance derived driver-side — bit-identical to the
    // embedding_covariance relation (covFromMoments mirrors the oracle).
    val (sijM, siM, nM) = collectMoments(spark, sfDir)
    val d = siM.length
    val c = covFromMoments(sijM, siM, nM)
    var v = Array.fill(d)(1.0f)
    var eig = 0.0
    for (_ <- 0 until PcaIters) {
      val w = Array.tabulate(d) { i =>
        var s = JBD.ZERO
        var j = 0
        while (j < d) { s = s.add(round9(c(i)(j) * v(j).toDouble)); j += 1 }
        s.doubleValue
      }
      var nsq = JBD.ZERO
      w.foreach(x => nsq = nsq.add(round9(x * x)))
      val nrm = math.sqrt(nsq.doubleValue)
      require(nrm > 0.0, "pcaProject: zero covariance matrix")
      eig = round6(nrm)
      v = w.map(x => round6(x / nrm).toFloat)
    }
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        round(graft.functions.inner_product(col("embedding"),
          graft.functions.vector_lit(v)), 6).as("pc1"),
        lit(eig).as("eigenvalue"))
      .orderBy("vec_id")
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embedding_covariance" -> ((s, d) => embeddingCovariance(s, d)),
    "pca_project" -> ((s, d) => pcaProject(s, d)),
    "bq_knn_topk" -> ((s, d) => bqKnnTopK(s, d)),
    "bq_knn_jaccard" -> ((s, d) => bqKnnJaccard(s, d)),
    "mrl_knn_topk" -> ((s, d) => mrlKnnTopK(s, d)),
    "mmr_rerank" -> ((s, d) => mmrRerank(s, d)),
    "knn_graph" -> ((s, d) => knnGraph(s, d)),
    "knn_graph_ivf" -> ((s, d) => knnGraphIvf(s, d)),
    "semantic_clusters" -> ((s, d) => semanticClusters(s, d)),
    "semantic_clusters_ivf" -> ((s, d) => semanticClustersIvf(s, d)),
    "range_search" -> ((s, d) => rangeSearch(s, d)),
    "knn_per_label" -> ((s, d) => knnPerLabel(s, d)),
    "knn_batch" -> ((s, d) => knnBatch(s, d)),
    "label_centroids" -> ((s, d) => labelCentroids(s, d)),
    "label_centroids_fast" -> ((s, d) => labelCentroidsFast(s, d)),
    "sim_histogram" -> ((s, d) => simHistogram(s, d)),
    "sim_histogram_sampled" -> ((s, d) => simHistogramSampled(s, d)),
    "avg_pairwise_sim_fast" -> ((s, d) => avgPairwiseSimFast(s, d)),
    "sq_knn_topk" -> ((s, d) => sqKnnTopK(s, d)),
    "sparse_knn_topk" -> ((s, d) => sparseKnnTopK(s, d)),
    "sparse_l2_topk" -> ((s, d) => sparseL2TopK(s, d)),
    "sparse_knn_indexed" -> ((s, d) => sparseKnnIndexed(s, d)),
    "halfvec_knn" -> ((s, d) => halfKnnTopK(s, d)),
    "halfvec_l2_topk" -> ((s, d) => halfDistancesTopK(s, d)),
    "embedding_outliers" -> ((s, d) => embeddingOutliers(s, d)),
    "kmeans_assign" -> ((s, d) => kmeansAssign(s, d)),
    "cluster_purity" -> ((s, d) => clusterPurity(s, d)),
    "prototype_prune" -> ((s, d) => prototypePrune(s, d)),
    "cluster_sample" -> ((s, d) => clusterSample(s, d)),
  )

  private lazy val sparseKnnOracleSql =
    s"""WITH sp AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CASE WHEN abs(CAST(x AS DOUBLE)) > CAST($SparseEps AS DOUBLE)
       |           THEN x ELSE CAST(0.0 AS FLOAT) END) AS sv,
       |    CAST(len(list_filter(embedding,
       |      x -> abs(CAST(x AS DOUBLE)) > CAST($SparseEps AS DOUBLE))) AS BIGINT) AS nnz
       |  FROM embeddings),
       |q AS (SELECT sv AS qv FROM sp WHERE vec_id = 0)
       |SELECT sp.vec_id, ${O.cosDist("sp.sv", "q.qv")} AS dist, sp.nnz
       |FROM sp, q
       |ORDER BY dist, vec_id
       |LIMIT $SparseK""".stripMargin

  /** Shared Lloyd CTE block for the kmeans oracle pair — ends at
    * a2(vec_id, cluster, d), the [[kmeansCore]] twin. */
  private lazy val kmeansCoreSql: String =
    s"""WITH init AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cvec
       |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT $KmeansK)),
       |a1 AS (
       |  SELECT vec_id, cid AS cluster FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${O.cosDist("e.embedding", "c.cvec")}, c.cid) AS rn
       |    FROM embeddings e CROSS JOIN init c)
       |  WHERE rn = 1),
       |ex AS (
       |  SELECT a1.cluster, generate_subscripts(e.embedding, 1) AS i,
       |    unnest(e.embedding) AS x
       |  FROM a1 JOIN embeddings e USING (vec_id)),
       |cent AS (
       |  SELECT cluster AS cid, list(v ORDER BY i) AS cvec FROM (
       |    SELECT cluster, i,
       |      CAST(round(CAST(SUM(CAST(ROUND(CAST(x AS DOUBLE), 9) AS DECIMAL(28,9))) AS DOUBLE)
       |        / COUNT(*), 6) AS FLOAT) AS v
       |    FROM ex GROUP BY cluster, i)
       |  GROUP BY cluster),
       |a2 AS (
       |  SELECT vec_id, cluster, d FROM (
       |    SELECT e.vec_id, c.cid AS cluster,
       |      ${O.cosDist("e.embedding", "c.cvec")} AS d,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${O.cosDist("e.embedding", "c.cvec")}, c.cid) AS rn
       |    FROM embeddings e CROSS JOIN cent c)
       |  WHERE rn = 1)""".stripMargin

  /** Exact-decimal covariance CTE block ending in covu(i, j, cov) — shared
    * by the embedding_covariance and pca_project oracles so the two stay
    * bit-identical (see embeddingCovariance scaladoc for the recipe). */
  private val covCte: String =
    """x AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings),
      |sums AS (
      |  SELECT i, SUM(CAST(ROUND(x, 9) AS DECIMAL(28,9))) AS s, COUNT(*) AS n
      |  FROM x GROUP BY i),
      |prods AS (
      |  SELECT a.i AS i, b.i AS j, SUM(CAST(ROUND(a.x * b.x, 9) AS DECIMAL(28,9))) AS sij
      |  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY 1, 2),
      |covu AS (
      |  SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
      |    ROUND((CAST(p.sij AS DOUBLE)
      |      - CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE) / CAST(sa.n AS DOUBLE))
      |      / CAST(sa.n AS DOUBLE), 6) + 0.0 AS cov
      |  FROM prods p
      |  JOIN sums sa ON p.i = sa.i
      |  JOIN sums sb ON p.j = sb.i)""".stripMargin

  def oracles: Map[String, String] = Map(
    // exact-decimal covariance: see embeddingCovariance scaladoc — float32
    // products are exact doubles, 9dp rounds can never tie, DECIMAL sums
    // are order-free, final arithmetic is single deterministic double ops
    "embedding_covariance" ->
      s"""WITH $covCte
         |SELECT i, j, cov FROM covu ORDER BY i, j""".stripMargin,
    // mirrors pcaProject's driver-side decimal arithmetic CTE for CTE:
    // upper-triangle covariance mirrored to the full matrix, two
    // matvec+normalize rounds (9dp-rounded products in DECIMAL sums, IEEE
    // sqrt, 6dp-round + float cast), then the bit-pinned dot projection
    "pca_project" ->
      s"""WITH $covCte,
         |cov AS (SELECT i, j, cov FROM covu
         |        UNION ALL SELECT j AS i, i AS j, cov FROM covu WHERE i < j),
         |w1 AS (SELECT i,
         |    CAST(SUM(CAST(ROUND(cov * 1.0, 9) AS DECIMAL(28,9))) AS DOUBLE) AS w
         |  FROM cov GROUP BY i),
         |n1 AS (SELECT sqrt(CAST(SUM(CAST(ROUND(w * w, 9) AS DECIMAL(28,9)))
         |    AS DOUBLE)) AS nrm FROM w1),
         |v1 AS (SELECT i, CAST(round(w / nrm, 6) AS FLOAT) AS v FROM w1, n1),
         |w2 AS (SELECT c.i AS i,
         |    CAST(SUM(CAST(ROUND(c.cov * CAST(v1.v AS DOUBLE), 9) AS DECIMAL(28,9)))
         |      AS DOUBLE) AS w
         |  FROM cov c JOIN v1 ON c.j = v1.i GROUP BY c.i),
         |n2 AS (SELECT sqrt(CAST(SUM(CAST(ROUND(w * w, 9) AS DECIMAL(28,9)))
         |    AS DOUBLE)) AS nrm FROM w2),
         |v2 AS (SELECT i, CAST(round(w / nrm, 6) AS FLOAT) AS v FROM w2, n2),
         |varr AS (SELECT list(v ORDER BY i) AS va FROM v2)
         |SELECT e.vec_id, round(${O.dot("e.embedding", "va")}, 6) AS pc1,
         |  (SELECT round(nrm, 6) FROM n2) AS eigenvalue
         |FROM embeddings e, varr ORDER BY vec_id""".stripMargin,
    // round-then-derive: 6dp-rounded float centroids → bit-exact distances
    // → 6dp-rounded per-label stats → exact z arithmetic
    "embedding_outliers" ->
      s"""WITH ex AS (
         |  SELECT label, unnest(embedding) AS x,
         |         generate_subscripts(embedding, 1) AS i
         |  FROM embeddings),
         |cent AS (
         |  SELECT label, i, CAST(round(avg(CAST(x AS DOUBLE)), 6) AS FLOAT) AS cv
         |  FROM ex GROUP BY label, i),
         |centarr AS (SELECT label, list(cv ORDER BY i) AS centroid FROM cent GROUP BY label),
         |d AS (
         |  SELECT e.vec_id, e.label,
         |    round(${O.cosDist("e.embedding", "c.centroid")}, 6) AS dist
         |  FROM embeddings e JOIN centarr c ON e.label = c.label),
         |stats AS (
         |  SELECT label, round(avg(dist), 6) AS mean_d,
         |    round(stddev_samp(dist), 6) AS std_d
         |  FROM d GROUP BY label
         |  HAVING round(stddev_samp(dist), 6) > 0)
         |SELECT d.vec_id, d.label, d.dist,
         |  round((d.dist - s.mean_d) / s.std_d, 4) AS z
         |FROM d JOIN stats s USING (label)
         |WHERE round((d.dist - s.mean_d) / s.std_d, 4) >= $OutlierZ
         |ORDER BY z DESC, d.vec_id""".stripMargin,
    "halfvec_knn" ->
      s"""WITH h AS (SELECT vec_id, ${O.halfList("embedding")} AS hv FROM embeddings),
         |q AS (SELECT hv AS qv FROM h WHERE vec_id = 0)
         |SELECT h.vec_id, ${O.cosDist("h.hv", "q.qv")} AS dist
         |FROM h, q
         |ORDER BY dist, h.vec_id
         |LIMIT $HalfK""".stripMargin,
    "halfvec_l2_topk" ->
      s"""WITH h AS (SELECT vec_id, ${O.halfList("embedding")} AS hv FROM embeddings),
         |q AS (SELECT hv AS qv FROM h WHERE vec_id = 0)
         |SELECT h.vec_id,
         |  ${O.l2Dist("h.hv", "q.qv")} AS l2,
         |  ${O.innerProduct("h.hv", "q.qv")} AS ip,
         |  list_sum(list_transform(list_zip(h.hv, q.qv),
         |    s -> abs(CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)))) AS l1
         |FROM h, q
         |ORDER BY l2, h.vec_id
         |LIMIT $HalfK""".stripMargin,
    "range_search" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, ${O.cosDist("e.embedding", "q.qv")} AS dist
         |FROM embeddings e, q
         |WHERE ${O.cosDist("e.embedding", "q.qv")} < $RangeRadius
         |ORDER BY dist, vec_id""".stripMargin,
    "knn_per_label" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |scored AS (
         |  SELECT e.label, e.vec_id, ${O.cosDist("e.embedding", "q.qv")} AS dist,
         |    row_number() OVER (PARTITION BY e.label
         |                       ORDER BY ${O.cosDist("e.embedding", "q.qv")}, e.vec_id) AS rank
         |  FROM embeddings e, q)
         |SELECT label, rank, vec_id, dist FROM scored
         |WHERE rank <= $PerLabelK
         |ORDER BY label, rank""".stripMargin,
    "bq_knn_topk" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |h AS (
         |  SELECT e.vec_id, q.qv,
         |    CAST(len(list_filter(list_zip(e.embedding, q.qv),
         |      s -> (s[1] >= 0) != (s[2] >= 0))) AS BIGINT) AS hamming
         |  FROM embeddings e, q),
         |cand AS (SELECT * FROM h ORDER BY hamming, vec_id LIMIT $BqCandidates)
         |SELECT c.vec_id, c.hamming, ${O.cosDist("e.embedding", "c.qv")} AS dist
         |FROM cand c JOIN embeddings e ON c.vec_id = e.vec_id
         |ORDER BY dist, c.vec_id
         |LIMIT $BqK""".stripMargin,
    // prefix slice is DuckDB 1-based-inclusive v[1:16]; both stages keep
    // the engine tie-breaks (pdist/dist then vec_id)
    "mrl_knn_topk" ->
      s"""WITH q AS (
         |  SELECT embedding[1:$MrlPrefix] AS qp, embedding AS qv
         |  FROM embeddings WHERE vec_id = 0),
         |cand AS (
         |  SELECT e.vec_id, q.qv,
         |    ${O.cosDist(s"e.embedding[1:$MrlPrefix]", "q.qp")} AS pdist
         |  FROM embeddings e, q
         |  ORDER BY pdist, e.vec_id
         |  LIMIT $MrlCandidates)
         |SELECT c.vec_id, c.pdist, ${O.cosDist("e.embedding", "c.qv")} AS dist
         |FROM cand c JOIN embeddings e ON c.vec_id = e.vec_id
         |ORDER BY dist, c.vec_id
         |LIMIT $BqK""".stripMargin,
    // knn_graph_ivf and semantic_clusters_ivf are deliberately ABSENT
    // here: they are the approximate scale twins (rows-only gates);
    // knn_graph / semantic_clusters below are their exact oracles
    "knn_graph" ->
      s"""WITH p AS (
         |  SELECT a.vec_id AS src, b.vec_id AS dst,
         |    ${O.cosDist("a.embedding", "b.embedding")} AS dist
         |  FROM embeddings a, embeddings b
         |  WHERE a.vec_id <> b.vec_id),
         |r AS (SELECT src, dst, dist,
         |    row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rank
         |  FROM p)
         |SELECT src AS vec_id, CAST(rank AS BIGINT) AS rank, dst AS nbr, dist
         |FROM r WHERE rank <= $KnnGraphK
         |ORDER BY vec_id, rank""".stripMargin,
    // mutual-kNN edges → the dedup family's recursive-CTE closure shape
    "semantic_clusters" ->
      s"""WITH RECURSIVE p AS (
         |  SELECT a.vec_id AS src, b.vec_id AS dst,
         |    ${O.cosDist("a.embedding", "b.embedding")} AS dist
         |  FROM embeddings a, embeddings b
         |  WHERE a.vec_id <> b.vec_id),
         |r0 AS (SELECT src, dst,
         |    row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rank
         |  FROM p),
         |knn AS (SELECT src, dst FROM r0 WHERE rank <= $KnnGraphK),
         |mutual AS (
         |  SELECT k1.src AS a, k1.dst AS b FROM knn k1
         |  JOIN knn k2 ON k1.src = k2.dst AND k1.dst = k2.src
         |  WHERE k1.src < k1.dst),
         |und AS (SELECT a AS x, b AS y FROM mutual UNION SELECT b, a FROM mutual),
         |r(x, y) AS (
         |  SELECT x, y FROM und
         |  UNION
         |  SELECT r.x, u.y FROM r JOIN und u ON r.y = u.x),
         |rep AS (SELECT x AS vec_id, least(min(y), x) AS cluster_rep FROM r GROUP BY x),
         |sizes AS (SELECT cluster_rep, count(*) AS cluster_size FROM rep GROUP BY 1)
         |SELECT vec_id, rep.cluster_rep, sizes.cluster_size
         |FROM rep JOIN sizes ON rep.cluster_rep = sizes.cluster_rep
         |ORDER BY vec_id""".stripMargin,
    // greedy MMR unrolled as a generated k-step MATERIALIZED chain (the
    // bpe_learn pattern): each step_i picks argmax λ·rel − (1−λ)·max-sim-
    // to-selected with the same double ops and vec_id tie-break the driver
    // greedy runs; MATERIALIZED stops DuckDB re-inlining sel_{i-1} per
    // consumer (it feeds the NOT IN, the penalty subquery and the union)
    "mmr_rerank" -> {
      val lam = MmrLambda
      val oneMinusLam = 1.0 - MmrLambda
      val chain = (2 to MmrK).map { i =>
        s""",
           |step$i AS MATERIALIZED (
           |  SELECT c.vec_id, c.rel,
           |    $lam * c.rel - $oneMinusLam * (
           |      SELECT max(p.sim) FROM pairs p
           |      JOIN sel${i - 1} s ON p.ib = s.vec_id
           |      WHERE p.ia = c.vec_id) AS mmr
           |  FROM cand c
           |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${i - 1})
           |  ORDER BY mmr DESC, c.vec_id LIMIT 1),
           |sel$i AS MATERIALIZED (
           |  SELECT * FROM sel${i - 1}
           |  UNION ALL SELECT CAST($i AS BIGINT) AS mmr_rank, vec_id, rel, mmr
           |  FROM step$i)""".stripMargin
      }.mkString
      s"""WITH q AS MATERIALIZED (
         |  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |cand AS MATERIALIZED (
         |  SELECT e.vec_id, e.embedding, ${O.cosSim("e.embedding", "q.qv")} AS rel
         |  FROM embeddings e, q
         |  ORDER BY rel DESC, e.vec_id
         |  LIMIT $MmrCandidates),
         |pairs AS MATERIALIZED (
         |  SELECT a.vec_id AS ia, b.vec_id AS ib,
         |    ${O.cosSim("a.embedding", "b.embedding")} AS sim
         |  FROM cand a, cand b),
         |sel1 AS MATERIALIZED (
         |  SELECT CAST(1 AS BIGINT) AS mmr_rank, vec_id, rel,
         |    $lam * rel - $oneMinusLam * 0.0 AS mmr
         |  FROM cand ORDER BY rel DESC, vec_id LIMIT 1)$chain
         |SELECT mmr_rank, vec_id, rel AS relevance, mmr AS mmr_score
         |FROM sel$MmrK ORDER BY mmr_rank""".stripMargin
    },
    // sign-bit set algebra over the float arrays mirrors bq_pack exactly
    // (bit i set iff v[i] >= 0, padding zero on both sides); the counts
    // are exact integers and the one division is engine-identical
    "bq_knn_jaccard" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |j AS (
         |  SELECT e.vec_id,
         |    len(list_filter(list_zip(e.embedding, q.qv),
         |      s -> (s[1] >= 0) AND (s[2] >= 0))) AS inter,
         |    len(list_filter(list_zip(e.embedding, q.qv),
         |      s -> (s[1] >= 0) OR (s[2] >= 0))) AS unn,
         |    CAST(len(list_filter(list_zip(e.embedding, q.qv),
         |      s -> (s[1] >= 0) != (s[2] >= 0))) AS BIGINT) AS hamming
         |  FROM embeddings e, q)
         |SELECT vec_id,
         |  CASE WHEN unn = 0 THEN 0.0
         |       ELSE 1.0 - CAST(inter AS DOUBLE) / CAST(unn AS DOUBLE)
         |  END AS jaccard,
         |  hamming
         |FROM j
         |ORDER BY jaccard, vec_id
         |LIMIT $BqK""".stripMargin,
    "knn_batch" ->
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < $BatchQueries),
         |scored AS (
         |  SELECT q.qid, e.vec_id, ${O.cosDist("e.embedding", "q.qv")} AS dist,
         |    row_number() OVER (PARTITION BY q.qid
         |                       ORDER BY ${O.cosDist("e.embedding", "q.qv")}, e.vec_id) AS rank
         |  FROM embeddings e, q)
         |SELECT qid, rank, vec_id, dist FROM scored
         |WHERE rank <= $BatchK
         |ORDER BY qid, rank""".stripMargin,
    "label_centroids_fast" ->
      """WITH ex AS (
        |  SELECT label, unnest(embedding) AS x,
        |         generate_subscripts(embedding, 1) AS i
        |  FROM embeddings)
        |SELECT label, CAST(i - 1 AS BIGINT) AS dim,
        |  round(avg(CAST(x AS DOUBLE)), 6) AS centroid_val
        |FROM ex GROUP BY label, i
        |ORDER BY label, dim""".stripMargin,
    "label_centroids" ->
      """WITH ex AS (
        |  SELECT label, unnest(embedding) AS x,
        |         generate_subscripts(embedding, 1) AS i
        |  FROM embeddings)
        |SELECT label, CAST(i - 1 AS BIGINT) AS dim,
        |  round(avg(CAST(x AS DOUBLE)), 6) AS centroid_val
        |FROM ex GROUP BY label, i
        |ORDER BY label, dim""".stripMargin,
    // same two unrolled Lloyd rounds: distances are the exact cosDist
    // fragment, the centroid update is an ORDER-FREE exact DECIMAL sum of
    // 9dp-quantized components (the embedding_covariance recipe) → one
    // double division → round 6dp → float; argmin ties break to lowest cid
    "kmeans_assign" ->
      s"""$kmeansCoreSql
         |SELECT vec_id, cluster, round(d, 6) AS dist FROM a2
         |ORDER BY vec_id""".stripMargin,
    // same Lloyd CTE block; the majority pick windows over the bounded
    // (cluster × label) count rows with the same (n DESC, label) order
    "cluster_purity" ->
      s"""$kmeansCoreSql,
         |lab AS (
         |  SELECT a2.cluster, e.label, count(*) AS n
         |  FROM a2 JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
         |sz AS (SELECT cluster, CAST(sum(n) AS BIGINT) AS cluster_size
         |  FROM lab GROUP BY 1),
         |pick AS (SELECT cluster, label, n,
         |    row_number() OVER (PARTITION BY cluster ORDER BY n DESC, label ASC) AS rk
         |  FROM lab)
         |SELECT p.cluster, CAST(p.label AS BIGINT) AS majority_label,
         |  sz.cluster_size,
         |  CAST(p.n AS DOUBLE) / CAST(sz.cluster_size AS DOUBLE) AS purity
         |FROM pick p JOIN sz USING (cluster)
         |WHERE p.rk = 1
         |ORDER BY p.cluster""".stripMargin,
    // same Lloyd CTE block; farthest-from-centroid keep mirrors the
    // negated-distance bounded heap as a row_number over (dist DESC, id)
    "prototype_prune" ->
      s"""$kmeansCoreSql,
         |r AS (
         |  SELECT cluster, vec_id, round(d, 6) AS dist,
         |    row_number() OVER (PARTITION BY cluster
         |      ORDER BY round(d, 6) DESC, vec_id) AS rn
         |  FROM a2)
         |SELECT cluster, CAST(rn AS BIGINT) AS rnk, vec_id, dist + 0.0 AS dist
         |FROM r WHERE rn <= $PrunePerCluster
         |ORDER BY cluster, rnk""".stripMargin,
    // same Lloyd CTE block; the per-cluster pick mirrors the bounded-heap
    // aggregate's (hash ASC, vec_id ASC) order as a row_number
    "cluster_sample" ->
      s"""$kmeansCoreSql,
         |r AS (
         |  SELECT cluster, vec_id,
         |    row_number() OVER (PARTITION BY cluster
         |      ORDER BY ${O.saltedBucket("vec_id", "cs", 1000000000000L)},
         |        vec_id) AS rn
         |  FROM a2)
         |SELECT cluster, CAST(rn AS BIGINT) AS rnk, vec_id
         |FROM r WHERE rn <= $ClusterSampleN
         |ORDER BY cluster, rnk""".stripMargin,
    "sim_histogram" ->
      s"""SELECT CAST(floor(${O.cosSim("e1.embedding", "e2.embedding")} * 10) AS BIGINT) AS bucket,
         |  COUNT(*) AS n
         |FROM embeddings e1, embeddings e2
         |WHERE e1.vec_id < e2.vec_id
         |GROUP BY 1
         |ORDER BY bucket""".stripMargin,
    "avg_pairwise_sim_fast" ->
      s"""WITH u AS (
         |  SELECT list_transform(embedding,
         |    x -> CAST(x AS DOUBLE) / sqrt(${O.normSq("embedding")})) AS u
         |  FROM embeddings),
         |ex AS (
         |  SELECT unnest(u) AS ux, generate_subscripts(u, 1) AS dim FROM u),
         |s AS (SELECT dim, sum(ux) AS sd FROM ex GROUP BY dim),
         |agg AS (SELECT sum(sd * sd) AS ss FROM s),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM embeddings)
         |SELECT round((agg.ss - n.n) / (n.n * (n.n - 1.0)), 6) AS avg_sim
         |FROM agg, n""".stripMargin,
    "sim_histogram_sampled" ->
      s"""WITH s AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  WHERE ${O.md5Long("CAST(vec_id AS VARCHAR)")} % $HistSampleMod = 0)
         |SELECT CAST(floor(${O.cosSim("e1.embedding", "e2.embedding")} * 10) AS BIGINT) AS bucket,
         |  COUNT(*) AS n
         |FROM s e1, s e2
         |WHERE e1.vec_id < e2.vec_id
         |GROUP BY 1
         |ORDER BY bucket""".stripMargin,
    "sparse_knn_topk" -> sparseKnnOracleSql,
    // CASE-masked dense recompute like sparseKnnOracleSql; the l2/l1
    // fragments are the l2_topk / l1_topk recipes over the masked arrays
    "sparse_l2_topk" ->
      s"""WITH sp AS (
         |  SELECT vec_id,
         |    list_transform(embedding,
         |      x -> CASE WHEN abs(CAST(x AS DOUBLE)) > CAST($SparseEps AS DOUBLE)
         |           THEN x ELSE CAST(0.0 AS FLOAT) END) AS sv
         |  FROM embeddings),
         |q AS (SELECT sv AS qv FROM sp WHERE vec_id = 0)
         |SELECT sp.vec_id, ${O.l2Dist("sp.sv", "q.qv")} AS dist,
         |  list_sum(list_transform(list_zip(sp.sv, q.qv),
         |    s -> abs(CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)))) AS l1
         |FROM sp, q
         |ORDER BY dist, vec_id
         |LIMIT $SparseK""".stripMargin,
    // the indexed path is EXACT (see sparseKnnIndexed) → same oracle
    "sparse_knn_indexed" -> sparseKnnOracleSql,
    "sq_knn_topk" ->
      s"""WITH sc AS (
         |  SELECT vec_id, embedding,
         |    CAST(list_max(list_transform(embedding, x -> abs(x))) AS FLOAT) AS scale
         |  FROM embeddings),
         |sq AS (
         |  SELECT vec_id, scale,
         |    CASE WHEN scale = 0
         |      THEN list_transform(embedding, x -> 0::TINYINT)
         |      ELSE list_transform(embedding,
         |        x -> CAST(round(CAST(x AS DOUBLE) / scale * 127) AS TINYINT))
         |    END AS codes
         |  FROM sc),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, ${O.sqCosDist("codes", "scale", "qv")} AS dist
         |FROM sq, q
         |ORDER BY dist, vec_id
         |LIMIT $SqK""".stripMargin,
  )
}
