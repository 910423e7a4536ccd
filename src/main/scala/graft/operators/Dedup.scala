package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{OracleSql => O, Tables}
import graft.functions.{cosine_similarity, withSqlConf}
import graft.functions.TextFunctions._

/** Deduplication operators over `documents` / `embeddings` — the core
  * pre-training-data pipeline pass (builder brief).
  *
  * Scale design (the part that matters at 100 TB):
  *  - exact dedup = hash aggregation on a fingerprint, one shuffle on the
  *    group key;
  *  - n-gram Jaccard = inverted-index posting lists over the 60-bit
  *    md5-hashed shingle space (shuffle 8-byte longs, not shingle strings;
  *    a corpus-wide collision merges two shingles with p ≈ n²/2⁶¹ —
  *    negligible, and mirrored bit-for-bit by the oracle). Hot shingles
  *    are the skew risk; production caps document frequency per shingle
  *    (dropping a stop-shingle cannot create false pairs above threshold —
  *    it only reduces candidate generation for ubiquitous n-grams);
  *  - MinHash LSH = the scale path: 64 permutations banded 16×4, candidate
  *    pairs only where a band matches, then exact-Jaccard verification of
  *    candidates — linear-ish work instead of all-pairs;
  *  - SimHash = 64-bit signature; candidate pairs via 4×16-bit chunk
  *    equality (pigeonhole: complete for hamming ≤ 3), verified by exact
  *    hamming — again no all-pairs compare;
  *  - embedding near-dup keeps the reference's exact cosine semantics
  *    (oracle-checkable); its scale path is the IVF index probe.
  *
  * Every dedup query has a bit-exact DuckDB oracle: the signature families
  * (minhash/simhash) hash tokens with [[graft.functions.md5_long]] — a
  * 60-bit md5-derived hash both engines reproduce exactly — so the full
  * banding + verification pipelines are written out in oracle SQL too.
  */
object Dedup {

  val NgramThreshold = 0.1
  val MinhashVerifyThreshold = 0.5
  val EmbeddingThreshold = 0.45
  val SimhashMaxHamming = 3

  /** (doc_id, h) exploded 3-gram shingle relation with each shingle
    * replaced by its 60-bit md5-derived hash
    * ([[graft.functions.md5_long]]) — the Jaccard pipelines group and
    * join on 8-byte longs instead of ~25-byte shingle strings (less shuffle
    * volume, cheaper hash-agg keys; measured ~20% off the ngram family at
    * sf0.1). Collisions would merge two shingles corpus-WIDE (p ≈ n²/2⁶¹ —
    * negligible, and the oracle hashes identically so both engines see the
    * same space bit-for-bit). */
  private def hashedShingleRel(spark: SparkSession, sfDir: String): DataFrame =
    hashedShingleRelOf(Tables.documents(spark, sfDir))

  /** [[hashedShingleRel]] over an arbitrary (doc_id, text) frame — the
    * ONE implementation of the shingle-hash contract the oracles depend
    * on, also the entry the scale smokes drive with synthetic corpora. */
  private[graft] def hashedShingleRelOf(docs: DataFrame): DataFrame =
    // pre-explode fan-out: each doc row becomes O(tokens) hashed shingles
    // (see Tables.rowParallel for why parallelism must come from rows)
    Tables.rowParallel(docs)
      .select(col("doc_id"), explode(shingles3(tokens(col("text")))).as("shingle"))
      .select(col("doc_id"), graft.functions.md5_long(col("shingle")).as("h"))

  /** Unpack `(a << 32) | b` pair keys from [[graft.functions.sorted_pair_keys]]. */
  private def unpackPairCounts(packed: DataFrame): DataFrame =
    packed.select(shiftright(col("pk"), 32).as("a"),
      col("pk").bitwiseAND(lit(4294967295L)).as("b"), col("c"))

  /** Does the corpus use doc ids outside [0, 2³¹)? Decides the pair-key
    * representation below. One column-pruned scan of the id column — at
    * any scale this is footer-stat-cheap next to the pair expansion it
    * guards. Nulls count as wide (the packed path would throw on them
    * anyway). */
  private[graft] def idsWide(docs: DataFrame): Boolean = {
    val r = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    r.isNullAt(0) || r.getLong(0) < 0L || r.getLong(1) >= (1L << 31)
  }

  /** Per-pair co-occurrence counts over posting lists (`ids` array<long>
    * column): explode each list into its (a < b) pairs, count per pair.
    * REPRESENTATION DISPATCH on the id range: ids in [0, 2³¹) pack each
    * pair into one 8-byte bigint ([[graft.functions.sorted_pair_keys]]) —
    * the groupBy on the packed key is the pipeline's measured wall, so
    * halving the key width pays; wider id spaces (replica strides,
    * snowflake-style ids, corpora past 2³¹ documents — the regime the
    * 300× scale bench runs in) take [[graft.functions.sorted_pairs]]'s
    * 16-byte struct form. Same pair multiset, same counts, same schema
    * out; DedupSpec pins row-identity of the two paths. (A densified
    * packed alternative for the wide regime — zipWithIndex ids into
    * [0, n), run the narrow path — measured EQUAL to the struct form at
    * 300× data, 27-31 s vs 26-34 s interleaved, AbPairStages: the explode
    * is ~1 s either way and the count cost is the shuffle + near-unique
    * hash aggregate, which key width does not move. Not adopted.)
    *
    * `numParts`: explicit width for the pair-count exchange, computed by
    * callers that know the exact pair volume (dedupNgramCapped counts it
    * on the materialized postings). The aggregate is the engine's
    * widest-relation hash agg and its per-partition footprint is the
    * measured spill driver — 56 GB / 1.6-2× wall at 32 partitions vs
    * zero spill at ~16× wider (300× data, AbPairStages) — so its width
    * must scale with the pair count, not sit at the session constant. */
  private[graft] def pairCounts(postings: DataFrame, wide: Boolean,
                                numParts: Option[Int] = None,
                                skewSafe: Boolean = false): DataFrame =
    if (!wide)
      unpackPairCounts(postings
        .select(explode(graft.functions.sorted_pair_keys(col("ids"))).as("pk"))
        .groupBy("pk").agg(count(lit(1)).as("c")))
    else {
      val pairs = postings
        .select(explode(graft.functions.sorted_pairs(col("ids"))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
      // co-partition BEFORE counting: pair keys are near-unique (dup pairs
      // repeat ~|shared shingles| times, random collisions once), so the
      // default map-side partial aggregate gets ~zero reduction while its
      // per-task hash map spans the task's whole pair slice — measured
      // 66 GB of spill at 300× data. Behind an explicit hash exchange the
      // partial+final pair both run post-shuffle over right-sized
      // partitions (bounded keys per task), same shuffle volume (nothing
      // was combining anyway), no corpus-sized hash map. The packed
      // (narrow-id) branch above keeps map-side combine: its 8-byte keys
      // spill-cap at fixture scale where combine is free.
      //
      // The sized exchange keys on `a` ALONE: HashPartitioning(a) is a
      // subset of the (a, b) grouping keys, so it satisfies the
      // aggregate's clustered distribution (every (a, b) group lives in
      // one partition) AND the consumer's next join key (dedupNgramCapped
      // joins per-doc sizes on a) — ONE exchange of the corpus-scale pair
      // stream serves both, where keying on (a, b) forced the sa join to
      // re-shuffle the full counted stream (measured: two extra ~17 GB
      // exchanges of a 1.12B-row stream at 1000× data, bench_sf100 r14).
      // Skew bound: pairs keyed on doc a number ≤ sz_a · (MaxShingleDf − 1)
      // — MaxShingleDf caps the per-SHINGLE document frequency, but sz_a
      // (a's surviving shingle count) tracks DOCUMENT LENGTH and is
      // unbounded, so one pathologically long document can concentrate its
      // whole pair set on a single a-keyed partition (and the explicit
      // repartition origin disables AQE skew splitting). Callers that can
      // bound max(sz) pass `skewSafe = true` when that bound overruns
      // [[PairAggRowsPerPartition]]: the exchange then keys on (a, b) —
      // near-unique, skew-immune — and the a-keyed join downstream takes a
      // planner exchange (AQE-managed, skew-splittable) instead of reusing
      // this one. The re-shuffle is the price of correctness only in the
      // pathological-length regime; the common path keeps the one-exchange
      // shape.
      val parted = numParts match {
        case Some(n) if skewSafe => pairs.repartition(n, col("a"), col("b"))
        case Some(n) => pairs.repartition(n, col("a"))
        case None => pairs.repartition(col("a"), col("b"))
      }
      parted.groupBy("a", "b").agg(count(lit(1)).as("c"))
    }

  /** Exchange width for [[pairCounts]] from the EXACT pair count:
    * ~[[PairAggRowsPerPartition]] pair rows per post-shuffle partition
    * (≈ 50-80 MB of 24-byte unsafe rows — comfortably inside task
    * execution memory with the aggregate's ~40 B/entry map on top),
    * never below the session parallelism, capped at 8192 like every
    * wide start in this engine. */
  private[graft] val PairAggRowsPerPartition = 2L * 1000 * 1000
  private[graft] def pairAggPartitions(nPairs: Long, sessionParts: Int): Int =
    graft.util.Exchanges.widthFor(nPairs, sessionParts, PairAggRowsPerPartition)


  /** All candidate pairs sharing ≥1 shingle, with exact Jaccard over the
    * hashed shingle space. Inverted-index formulation: group the hashed
    * shingle relation ONCE into posting lists and expand pairs with the
    * codegen'd sorted_pair_keys expression — half the shuffle volume of the
    * equivalent self-join, and the per-pair count (the measured wall: 1.1M
    * near-unique groups at sf0.1) groups on one packed 8-byte key. */
  private def jaccardPairs(spark: SparkSession, sfDir: String): DataFrame = {
    // recompute-per-consumer, not localCheckpoint — see minhashPairs
    val sh = hashedShingleRel(spark, sfDir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val common = pairCounts(
      sh.groupBy("h").agg(collect_list(col("doc_id")).as("ids")),
      idsWide(Tables.documents(spark, sfDir)))
    common
      .join(sizes.as("sa"), col("a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("b") === col("sb.doc_id"))
      .select(col("a"), col("b"),
        (col("c").cast("double") / (col("sa.sz") + col("sb.sz") - col("c"))).as("jaccard"))
  }

  /** Exact duplicate audit: total rows, distinct normalized texts, dup groups. */
  def dedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    val fp = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
    Tables.documents(spark, sfDir)
      .select(fp.as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("cnt"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_distinct_text"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup_groups"))
  }

  /** Exact n-gram (3-shingle) Jaccard near-dup pairs above threshold. */
  def dedupNgram(spark: SparkSession, sfDir: String): DataFrame =
    jaccardPairs(spark, sfDir)
      .filter(col("jaccard") >= NgramThreshold)
      .orderBy("a", "b")

  /** The production-scale variant: drop "stop-shingles" whose document
    * frequency exceeds [[MaxShingleDf]] BEFORE the pair join — hot shingles
    * are quadratic candidate generators with no dedup signal. Jaccard is
    * then computed over the capped shingle space (sizes and intersections
    * both filtered — a consistent, well-defined similarity), which the
    * oracle mirrors exactly.
    *
    * LIFECYCLE: the posting build is a SINGLE-LIVE localCheckpoint
    * ([[graft.util.CheckpointOps.trackSingleLive]]) — re-invoking this
    * operator (or [[dedupClean]], which composes it) on the same `sfDir`
    * frees the previous invocation's checkpoint blocks, so a frame
    * returned by an EARLIER call must not be executed after a newer call
    * completes (missing-block failure: the lineage was truncated). Hold
    * one live result per input, or set
    * `spark.graft.singleLiveCheckpoints=false` to manage blocks yourself.
    *
    * Honest caveat measured at sf0.1: the fixtures have max df = 25, so the
    * cap removes almost nothing and costs about the same as the uncapped
    * form (~1.7 s both, round 3). The technique pays only when real
    * web-corpus skew exists (boilerplate shingles with df in the
    * millions). */
  val MaxShingleDf = 20
  def dedupNgramCapped(spark: SparkSession, sfDir: String): DataFrame = {
    val big = corpusIsBig(spark, sfDir)
    // ONE posting-list pass serves the df-cap, the per-doc sizes over the
    // capped space, and the pair expansion. Both consumers (sizes, pairs)
    // branch off `postings`, and Spark has no plan-level CSE across join
    // branches — localCheckpoint materializes the posting build once
    // instead of re-tokenizing + re-grouping the corpus per branch.
    //
    // The build runs SCOPED to Spark's default ObjectHashAggregate
    // fallback threshold: collect_list over a corpus-sized near-unique
    // key space is exactly the giant-buffer aggregate the default 128 is
    // sized for — under the engine's raised session threshold each task
    // holds ~10⁶ live list buffers before falling back anyway (measured
    // at 300× data: 242 s GC-bound vs the immediate sort fallback's
    // streamed merge, ProfileNgramScale). The localCheckpoint is EAGER,
    // so the override provably covers this job only (single-session
    // sequential execution, like any GUC-scoped statement).
    // single-live checkpoint: a re-invocation (bench reps, notebook
    // re-runs) frees the previous postings blocks instead of stacking
    // corpus-sized dead copies in the block manager
    //
    // Shape note (r15, three alternatives measured at 1000× and NOT
    // adopted): the pipeline's residual spill is volume-proportional
    // shuffle-writer buffer recycling, not a plan defect — the pair
    // EXCHANGE alone (no aggregate) reproduces the full 52 GB
    // (ProfileNgramScale r15 decomposition), and reshaping the postings
    // build moved spill between stages without beating this shape's wall
    // clock: an explicit pre-aggregate h-exchange (final-only agg, no
    // partial) cut postings-stage spill 4× but ran ~40% slower end-to-end
    // (row-handling of 260M raw instance rows exchanged instead of 27M
    // compacted list-rows), and a widened pre-explode doc fan-out
    // (bounding the partial agg's per-task sort slices) measured time
    // parity with MORE total spill in bench context. The exact operator's
    // scale ceiling is candidate volume itself (99.98% of pair groups are
    // c=1 pairs that die at the threshold, knowable only after the
    // exchange; prefix/length filtering prunes ~nothing at t=0.1) — the
    // family's scale path remains dedup_minhash (zero spill at 1000×).
    val sessionParts = spark.sessionState.conf.numShufflePartitions
    val postings = graft.util.CheckpointOps.trackSingleLive(
      s"dedup_ngram_postings:$sfDir",
      withSqlConf(spark,
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "128",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum" ->
          graft.functions.InitialShufflePartitionsFor(sessionParts).toString) {
        hashedShingleRel(spark, sfDir)
          .groupBy("h").agg(collect_list(col("doc_id")).as("ids"))
          .filter(size(col("ids")) <= MaxShingleDf)
          .localCheckpoint()
      })
    val sizes = postings.select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // exact pair volume off the materialized postings (one sub-second
    // column scan) sizes EVERY pair-stream exchange below — the pair-count
    // aggregate (wide ids only: the narrow packed path keeps map-side
    // combine and doesn't take numParts) and, past the broadcast tier, the
    // sizes joins; fixture scale keeps the session width
    val wide = idsWide(Tables.documents(spark, sfDir))
    val nPairs: Option[Long] =
      if (!big) None
      else {
        val sz = size(col("ids")).cast("long")
        Some(postings
          .agg(sum(sz * (sz - lit(1L)) / lit(2L)).cast("long")).head().getLong(0))
      }
    // Length-skew gate for the sized a-keyed exchange: pairs keyed on one
    // doc ≤ maxSz·(MaxShingleDf−1) (see pairCounts). maxSz tracks DOCUMENT
    // LENGTH, which no df cap bounds — a boilerplate mega-document would
    // concentrate its whole pair set on one a-keyed partition. Detection
    // is footer-stat-cheap: per-doc shingle count ≤ n_chars/2 (3-gram
    // shingles ≤ tokens, tokens ≤ chars/2 even for single-char tokens),
    // so max(n_chars)/2 over-estimates maxSz — the safe direction, since
    // skewSafe trades one re-exchange for skew immunity. Engages only
    // past ~200k-char documents; fixture and replica-corpus plans are
    // untouched.
    val skewSafe = big && wide && {
      // getAs[Number]: external corpora may store n_chars as INT — a raw
      // getLong would ClassCastException exactly (and only) in the
      // at-scale path this gate protects (r15 advice)
      val m = Tables.documents(spark, sfDir).agg(max(col("n_chars"))).head()
      !m.isNullAt(0) &&
        (m.getAs[Number](0).longValue() / 2L) * (MaxShingleDf - 1L) >
          PairAggRowsPerPartition
    }
    val pairParts = if (wide) nPairs.map(pairAggPartitions(_, sessionParts)) else None
    val common = pairCounts(postings, wide, pairParts, skewSafe)
    def jaccardOf(joined: DataFrame): DataFrame = joined
      .select(col("a"), col("b"),
        (col("c").cast("double") / (col("sa.sz") + col("sb.sz") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= NgramThreshold)
      .orderBy("a", "b")
    // The sizes joins are TIERED on corpus size: `sizes` is one 16-byte
    // row per doc, so up to [[SizesBroadcastMaxDocs]] documents it
    // broadcasts — the corpus-sized pair relation then streams through
    // both joins with NO exchange at all (at 300× data the forced
    // shuffle_hash alternative moved the 336M-row pair relation through
    // two more full shuffles, ~10 GB). Past the tier — doc counts where a
    // per-executor hash of all docs stops being sane — shuffle_hash keeps
    // the joins sort-free, and the pair stream is NEVER re-exchanged:
    // pairCounts already partitioned it by `a` (one sized exchange
    // serving its aggregate AND the sa join), the sa join streams in
    // place, and an EXACT prefilter — c ≤ sb ⟹ |a ∪ b| ≥ sa ⟹
    // jaccard ≤ c/sa, so jaccard ≥ t needs c ≥ t·sa — cuts the stream to
    // near-candidates before the b-keyed join, which therefore exchanges
    // a survivor-sized relation, not the corpus-scale pair stream. (The
    // first sized shape re-shuffled the full counted stream twice more —
    // two extra ~17 GB exchanges at 1000× data with map-side sorter
    // spill to match, bench_sf100.json r14.) Plain sort-merge is never
    // the right shape here.
    if (!big || docCount(spark, sfDir) <= SizesBroadcastMaxDocs)
      jaccardOf(common
        .join(broadcast(sizes.as("sa")), col("a") === col("sa.doc_id"))
        .join(broadcast(sizes.as("sb")), col("b") === col("sb.doc_id")))
    else {
      val w = pairAggPartitions(nPairs.get, sessionParts)
      // wide ids: common is already HashPartitioning(a, w) from
      // pairCounts' sized exchange (under skewSafe it is (a, b)-keyed
      // instead, and the join below gets a fresh planner exchange —
      // AQE-managed, skew-splittable, the point of the gate); narrow ids
      // past the tier: the packed path kept map-side combine, so
      // co-locate on a here
      val streamA = if (wide) common else common.repartition(w, col("a"))
      val afterA = streamA
        .join(sizes.as("sa").hint("shuffle_hash"), col("a") === col("sa.doc_id"))
        // ε keeps double rounding from dropping an exact-boundary pair;
        // false keeps are re-filtered exactly by jaccardOf
        .filter(col("c").cast("double") >=
          lit(NgramThreshold) * col("sa.sz").cast("double") - lit(1e-9))
      jaccardOf(afterA
        .join(sizes.as("sb").hint("shuffle_hash"), col("b") === col("sb.doc_id")))
    }
  }

  /** Embedding cosine near-dup pairs — EXACT answer WITHOUT the all-pairs
    * cross join, via IVF-bucketed candidates with a triangle-inequality
    * completeness guarantee.
    *
    * Let θ(·,·) be angular distance (a metric on the unit sphere — cosine
    * similarity itself violates the triangle inequality, angles don't),
    * θ_t = acos(threshold), c(x) = x's assigned centroid,
    * rad(x) = θ(x, c(x)). Each vector x expands to every list l with
    * θ(x, c_l) ≤ rad(x) + θ_t; candidates pair the EXPANDED side with the
    * PRIMARY members of each list. Completeness: for any pair with
    * θ(x,y) ≤ θ_t, w.l.o.g. rad(y) ≤ rad(x); then
    * θ(x, c(y)) ≤ θ(x,y) + θ(y, c(y)) ≤ θ_t + rad(y) ≤ rad(x) + θ_t,
    * so c(y) is in x's expanded set and the pair surfaces through list
    * c(y). Candidates are then verified with the exact cosine — identical
    * answers to the cross join, for ANY list assignment.
    *
    * Scale shape: expansion is a broadcast of |lists| centroids (linear
    * scan, no CartesianProduct node); candidates flow through a list_id
    * equi-join. Pruning power tracks how clusterable the corpus is versus
    * θ_t: tight clusters + high thresholds (SemDeDup-style 0.9+ near-dup
    * sweeps ⇒ θ_t ≈ 26°) probe few lists; the fixtures' near-uniform
    * vectors at threshold 0.45 (θ_t ≈ 63°) expand wide — the bound
    * degrades gracefully to candidate-join instead of failing. Pruning
    * engagement is pinned in DedupSpec on a clustered fixture. */
  def dedupEmbedding(spark: SparkSession, sfDir: String): DataFrame =
    dedupEmbeddingPairs(spark, sfDir).orderBy("a", "b")

  /** [[dedupEmbedding]] without the output-determinism sort — the pair
    * source for [[dedupClusters]]/[[dedupClustersStar]], whose CC entry
    * checkpoints the pairs eagerly (same rationale as
    * [[dedupMinhashPairs]]: the sort's range-sample pass would re-execute
    * the whole candidate+verify pipeline for an ordering CC ignores). */
  private def dedupEmbeddingPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val idx = IndexQueries.indexFor(spark, sfDir)
    val cents = spark.read.parquet(s"$idx/centroids").select("list_id", "centroid")
    val members = spark.read.parquet(s"$idx/lists").select("vec_id", "embedding", "list_id")
    val candIds = embeddingCandidates(members, cents, EmbeddingThreshold)
    candIds
      .join(e.select(col("vec_id").as("a"), col("embedding").as("v1")), "a")
      .join(e.select(col("vec_id").as("b"), col("embedding").as("v2")), "b")
      .select(col("a"), col("b"), cosine_similarity(col("v1"), col("v2")).as("sim"))
      .filter(col("sim") >= EmbeddingThreshold)
  }

  /** Candidate (a < b) id pairs that provably contain every pair with
    * cosine ≥ `threshold` (see [[dedupEmbedding]]). `members` is an IVF
    * lists dataset (vec_id, embedding, list_id); `cents` its centroid
    * sidecar. Exposed for the pruning-engagement spec. */
  def embeddingCandidates(members: DataFrame, cents: DataFrame,
                          threshold: Double): DataFrame = {
    val thetaT = math.acos(threshold)
    // θ safely: clamp cosine into [-1,1] (float noise past ±1 → acos NaN,
    // which would silently drop a member from its own expansion)
    def theta(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      acos(least(greatest(cosine_similarity(a, b), lit(-1.0)), lit(1.0)))
    val rad = members.join(broadcast(cents), "list_id")
      .select(col("vec_id"), col("embedding"),
        theta(col("embedding"), col("centroid")).as("rad"))
    val expanded = rad
      .crossJoin(broadcast(cents.select(col("list_id"), col("centroid").as("xc"))))
      .filter(theta(col("embedding"), col("xc")) <= col("rad") + lit(thetaT))
      .select(col("vec_id").as("x"), col("list_id"))
    expanded
      .join(members.select(col("vec_id").as("y"), col("list_id")), Seq("list_id"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct()
  }

  /** Lists each vector co-probes in [[dedupEmbeddingIvf]]. */
  val EmbeddingIvfProbes = 4

  /** Approximate SCALE twin of [[dedupEmbedding]] — same exact-cosine
    * verification stage, but candidates come from IVF CO-PROBING (each
    * vector joins its [[EmbeddingIvfProbes]] nearest lists — the
    * knn_graph_ivf recipe) instead of the triangle-inequality expansion.
    * The exact form's completeness bound is DATA-DEPENDENT: on an
    * un-clusterable corpus at moderate thresholds it degrades to the
    * documented full candidate join — measured 80× cost at a 10×
    * scale-up of the near-uniform fixture (bench_sf1.json), i.e. the
    * n² this family exists to avoid. Here candidates pair each vector's
    * PROBED lists with those lists' home members (exactly knn_graph_ivf's
    * candidate rule), so the volume is explicitly probe-bounded —
    * probes·n²/lists pairs, ~probes·n^1.5 at the √n list sizing — at the
    * price of missing pairs where neither member probes the other's home
    * list: approximate → rows-only gate, recall vs the exact form
    * spec-pinned on the clustered fixture (where near-dup structure
    * actually lives; DedupSpec). Precision stays 1 by construction —
    * every emitted pair is exact-verified against the same threshold. */
  def dedupEmbeddingIvf(spark: SparkSession, sfDir: String,
                        probes: Int = EmbeddingIvfProbes): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val idx = IndexQueries.indexFor(spark, sfDir)
    val cents = spark.read.parquet(s"$idx/centroids").select("list_id", "centroid")
    // the shared assignment stage (IvfIndex.assignProbes — one definition
    // across the IVF scale paths); qv rides along so the verify stage
    // scores IN the join — no candidate-sized distinct before scoring and
    // no re-join against the embeddings table (the first cut distinct'd
    // the raw pair ids then joined e twice: three candidate-volume
    // shuffles, measured 2.7 GB / 448× at 100× data)
    val assigned = graft.index.IvfIndex.assignProbes(
      e, cents, "vec_id", "embedding", probes, metric = "cosine")
    val home = spark.read.parquet(s"$idx/lists")
      .select(col("vec_id").as("m"), col("embedding").as("mv"), col("list_id"))
    // a pair survives threshold-first scoring at most twice (x probing
    // y's home list and y probing x's — elementwise product commutes, so
    // both directions score BIT-EQUAL sim) → distinct on the thresholded
    // survivors is exact and survivor-sized, not candidate-sized
    def scoredOf(asg: DataFrame, hm: DataFrame): DataFrame = asg
      .join(hm, Seq("list_id"))
      .filter(col("qid") =!= col("m"))
      .select(least(col("qid"), col("m")).as("a"),
        greatest(col("qid"), col("m")).as("b"),
        cosine_similarity(col("qv"), col("mv")).as("sim"))
      .filter(col("sim") >= EmbeddingThreshold)
    // The candidate stream's exchanges scale with the CANDIDATE volume
    // (probes · occupancy · n — known exactly from the index sidecar), not
    // the session width: at 1000× data the constant-width plan put ~16M
    // survivor rows into every post-shuffle partition and the candidate
    // join + distinct sort-spilled 177 GB (bench_sf100.json r14). Through
    // [[WideBranchFactor]]× the session floor the plan is untouched —
    // fixture scale keeps AQE's auto-broadcast of the tiny home side and
    // its skew-join splitting (SkewJoinSpec pins the latter; an explicit
    // repartition origin would disable both), and near the floor the AQE
    // plan WINS: the sized branch pays two extra full exchanges of the
    // assigned/candidate stream, measured +8 s at 300× data where the
    // computed width (39) barely cleared the session width (r14).
    val n = IndexQueries.vecCount(spark, sfDir)
    val nLists = math.max(1L, IndexQueries.listCount(spark, idx).toLong)
    val occupancy = (n + nLists - 1) / nLists
    val cands = probes.toLong * n * occupancy
    val sessionParts = spark.sessionState.conf.numShufflePartitions
    val w = graft.util.Exchanges.widthFor(cands, sessionParts, CandidateRowsPerPartition)
    if (w <= WideBranchFactor * sessionParts)
      scoredOf(assigned, home).distinct().orderBy("a", "b")
    else {
      // distinct's aggregate reuses the (a, b) partitioning (a subset of
      // its grouping keys); the global sort gets the same explicit width
      // via range partitioning — identical output order to orderBy
      scoredOf(assigned.repartition(w, col("list_id")), home.hint("shuffle_hash"))
        .repartition(w, col("a"), col("b"))
        .distinct()
        .repartitionByRange(w, col("a"), col("b"))
        .sortWithinPartitions("a", "b")
    }
  }

  /** Per-node degree bound of [[dedupEmbeddingIvfKnn]]: each node keeps
    * its 8 most-similar above-threshold neighbors. Near-dup graphs are
    * clumps, and for CLEANING (connectivity → one representative per
    * cluster) a clump stays connected through far fewer than all-pairs
    * edges; 8 leaves slack over the fixtures' observed max useful degree
    * while bounding output at 2·n·k rows on ANY corpus. */
  val EmbeddingKnnDegree = 8

  /** Degree-bounded twin of [[dedupEmbeddingIvf]] — the 100 TB default for
    * CLEANING. The full-pairs form emits Θ(n²/bases) rows on
    * duplicate-heavy corpora (693M pairs / 187× time ratio at 1000× data,
    * bench_sf100 r14: every replica of a boilerplate base is a true
    * near-dup of every other, so ALL-pairs output is the scale wall even
    * with every join right). Cleaning doesn't need all pairs — it needs
    * CONNECTIVITY (the CC/representative pipeline) plus the drop rule, and
    * a per-node k-nearest-above-threshold edge set preserves both: every
    * node with an above-threshold neighbor keeps ≥1 edge, mega-clusters
    * stay connected through their mutual-kNN backbone, and output is
    * O(n·k) by construction.
    *
    * Same candidate generation as [[dedupEmbeddingIvf]] (co-probe join,
    * exact cosine, same threshold — precision stays 1); each scored pair
    * feeds BOTH endpoints' bounded heaps (the knnGraphIvf symmetric
    * explode — cosine commutes so the flipped row is free), each endpoint
    * keeps its k best by (sim DESC, id ASC) via the id-distinct
    * [[graft.functions.top_k_by_distance]] heap, and kept directed edges
    * canonicalize to (a < b) with a survivor-sized distinct. The
    * candidate-sized distinct of the full-pairs form — the other half of
    * its 1000× cost — is GONE: the heap aggregate is the only wide stage,
    * with map-side partial combine and k-bounded buffers.
    *
    * DROP-RULE COMPLETENESS (the r15 advice gap): a k-bounded heap alone
    * does NOT preserve [[dropNearDuplicates]] in general — that rule drops
    * a doc iff some kept edge has it as the larger endpoint, and a node
    * whose k best neighbors all have LARGER ids, and which no smaller
    * node's heap retained, would keep only (node, larger) edges and
    * survive where the full-pairs twin drops it (reachable exactly in
    * mega-clusters, the regime this operator targets). The same heap
    * aggregate therefore also folds each node's MINIMUM smaller
    * above-threshold neighbor (a min over a (nbr, sim) struct — free
    * map-side combine, no extra wide stage) and emits that one extra edge
    * per dropped-eligible node, restoring EXACT drop-set parity with the
    * full-pairs twin over their shared co-probe candidate set on ANY
    * corpus; the output bound becomes n·(2k+1) — still O(n·k).
    *
    * DedupSpec pins (1) the [[dropNearDuplicates]] drop set identical to
    * the full-pairs twin on the fixtures, a clustered corpus, AND an
    * adversarial corpus built to trigger the heap-only divergence, and
    * (2) the O(n·k) output bound. */
  def dedupEmbeddingIvfKnn(spark: SparkSession, sfDir: String,
                           probes: Int = EmbeddingIvfProbes,
                           k: Int = EmbeddingKnnDegree): DataFrame = {
    import graft.functions.top_k_by_distance
    val e = Tables.embeddings(spark, sfDir)
    val idx = IndexQueries.indexFor(spark, sfDir)
    val cents = spark.read.parquet(s"$idx/centroids").select("list_id", "centroid")
    val assigned = graft.index.IvfIndex.assignProbes(
      e, cents, "vec_id", "embedding", probes, metric = "cosine")
    val home = spark.read.parquet(s"$idx/lists")
      .select(col("vec_id").as("m"), col("embedding").as("mv"), col("list_id"))
    // exchange sizing: same candidate-volume rule + hysteresis as the
    // full-pairs twin (the candidate stream is identical; only what
    // happens after scoring differs)
    val n = IndexQueries.vecCount(spark, sfDir)
    val nLists = math.max(1L, IndexQueries.listCount(spark, idx).toLong)
    val cands = probes.toLong * n * ((n + nLists - 1) / nLists)
    val sessionParts = spark.sessionState.conf.numShufflePartitions
    val w = graft.util.Exchanges.widthFor(cands, sessionParts, CandidateRowsPerPartition)
    val (asgSide, homeSide) =
      if (w <= WideBranchFactor * sessionParts) (assigned, home)
      else (assigned.repartition(w, col("list_id")), home.hint("shuffle_hash"))
    val kept = asgSide
      .join(homeSide, Seq("list_id"))
      .filter(col("qid") =!= col("m"))
      .select(col("qid"), col("m"),
        cosine_similarity(col("qv"), col("mv")).as("sim"))
      .filter(col("sim") >= EmbeddingThreshold)
      // symmetric: the survivor (x, y) enters both x's and y's heaps —
      // sim commutes bit-exactly, no second scoring; heap key −sim ranks
      // (sim DESC, id ASC), duplicates absorbed by the id-distinct heap
      .select(explode(array(
          struct(col("qid").as("node"), col("m").as("nbr")),
          struct(col("m").as("node"), col("qid").as("nbr")))).as("p"),
        col("sim"))
      .select(col("p.node").as("node"), col("p.nbr").as("nbr"), col("sim"))
      .groupBy("node")
      .agg(top_k_by_distance(-col("sim"), col("nbr"), k).as("top"),
        // min smaller above-threshold neighbor, carried with its sim:
        // struct min orders by nbr first, so this is the smallest-id
        // smaller neighbor — the one edge the drop rule needs (scaladoc)
        min(when(col("nbr") < col("node"),
          struct(col("nbr"), col("sim")))).as("ms"))
      // append the drop-rule edge to the heap array in the SAME projection
      // (a second subtree over the aggregate would re-run the final agg);
      // the when() without otherwise yields a null element for nodes with
      // no smaller neighbor, which array_compact removes
      .select(col("node"), explode(array_compact(concat(col("top"),
        array(when(col("ms").isNotNull,
          struct(col("ms.nbr").as("vec_id"),
            (-col("ms.sim")).as("dist"))))))).as("s"))
      .select(least(col("node"), col("s.vec_id")).as("a"),
        greatest(col("node"), col("s.vec_id")).as("b"),
        (-col("s.dist")).as("sim"))
    // ≤ n·(2k+1) rows here — the distinct and global sort are O(n·k),
    // never candidate- or pair-squared-sized
    kept.distinct().orderBy("a", "b")
  }

  /** Rows per post-shuffle partition for the IVF co-probe candidate
    * exchanges ([[dedupEmbeddingIvf]],
    * [[graft.operators.SimilarityQueries.knnGraphIvf]]): candidate rows
    * are narrow (two ids + a double), and the stage's working set is the
    * partial hash structure over them — 4M rows ≈ 100-200 MB with
    * aggregate overhead, inside task execution memory at 32 concurrent
    * tasks on the bench box and comfortable on a real executor. */
  private[graft] val CandidateRowsPerPartition = 4L * 1000 * 1000

  /** Hysteresis on the co-probe sized-exchange branch: the explicit-width
    * plan replaces AQE's (auto-broadcast, skew-split, coalesce) and adds
    * full exchanges of the candidate stream, which only pays for itself
    * once the computed width is a MULTIPLE of the session floor — at
    * width ≈ floor the session plan measured 8 s faster at 300× data
    * while at 4× the floor the sized plan is the one that avoids 177 GB
    * of spill (bench_sf100/30, r14). */
  private[graft] val WideBranchFactor = 2

  // ---- MinHash LSH ---------------------------------------------------------

  val NumPerms = 64
  val BandRows = 4 // → 16 bands; s-curve threshold (1/16)^(1/4) = 0.5
  private val MinhashPrime = 2038074743L

  /** MinHash-LSH near-dup pairs: banded signature match → candidates →
    * exact-Jaccard verification (≥ [[MinhashVerifyThreshold]]).
    * Permutation i: hᵢ(x) = ((i·2654435761 | 1)·x + i·40503 + 7) mod P.
    * The 64-lane signature folds in ONE aggregation pass
    * ([[graft.functions.MinhashSignature]]) — the naive form explodes every
    * shingle into 64 rows (64× shuffle amplification). */
  def dedupMinhash(spark: SparkSession, sfDir: String): DataFrame =
    dedupMinhashPairs(spark, sfDir).orderBy("a", "b")

  /** [[dedupMinhash]] WITHOUT the output-determinism sort — the pair
    * source for the composed cluster/cleaning queries. A global orderBy is
    * TWO passes over its input (a range-partitioning sample pass + the
    * sort), and the CC entry's eager localCheckpoint materializes it, so
    * a sorted source re-executes the whole LSH pipeline once per
    * composition for an ordering no consumer reads (CC labels, drop sets
    * and aggregations are all order-free; every composed query applies
    * its own final ORDER BY). Measured r16 at sf0.1: dedup_keep_best
    * 4.2 → 2.6 s wall with the sort gone (guide §2.4 — an orderBy used
    * only for output determinism is a removable exchange). */
  private def dedupMinhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    minhashPairs(hashedShingleRel(spark, sfDir), corpusIsBig(spark, sfDir),
      nDocs = Some(docCount(spark, sfDir)))

  /** Corpus-size gate for the LSH pipeline's join-strategy hints: below
    * this documents.parquet size (~50× the sf0.1 fixture) the band/verify
    * relations are small enough that Spark's own selection — AQE runtime
    * auto-broadcast of the tiny candidate side — beats a forced
    * shuffle-hash join (an unconditional hint BLOCKS auto-broadcast: hints
    * outrank size-based selection in JoinSelection, so the r12 blanket
    * hint shuffled the whole shingle relation at fixture scale where a
    * broadcast of a few hundred candidate pairs was free). Past the gate
    * the broadcast is impossible anyway and shuffle_hash-over-sort-merge
    * is the measured −23% at 300× data. One FileSystem metadata call —
    * footer-stat-cheap next to the pipeline it steers. */
  private[graft] val ShuffleHashMinDocBytes: Long = 32L << 20

  /** Upper corpus-size tier for BROADCASTING the per-doc `sizes` relation
    * in the Jaccard pipelines: 4M docs ≈ a 64 MB one-long-per-doc hashed
    * relation per executor, well inside sane broadcast budgets. Past it,
    * every-doc broadcast is the thing that stops scaling, and the joins
    * fall back to shuffle_hash. Gated on the DOC COUNT — the relation
    * being broadcast is one row per doc, so rows, not file bytes, size
    * the hashed relation (a corpus of many short documents would blow a
    * bytes-proxied tier; ADVICE r13). The count is footer-cheap on
    * parquet (no columns read) and cached per path. */
  private[graft] val SizesBroadcastMaxDocs: Long = 4L * 1000 * 1000

  private def docBytes(spark: SparkSession, sfDir: String): Long =
    graft.CatalogOps.relationSize(spark, s"$sfDir/documents.parquet")

  private val docCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def docCount(spark: SparkSession, sfDir: String): Long =
    docCountCache.computeIfAbsent(s"$sfDir/documents.parquet",
      p => Long.box(spark.read.parquet(p).count()))

  private def corpusIsBig(spark: SparkSession, sfDir: String): Boolean =
    docBytes(spark, sfDir) >= ShuffleHashMinDocBytes

  /** LSH band rows `(doc_id, band, band_sig)` of a hashed-shingle relation
    * — the banding stage shared by [[minhashPairs]] and the streaming
    * near-dup gate ([[graft.streaming.StreamingIngest.startMinhashDedup]]),
    * ONE definition so the stream collides against exactly the batch
    * pipeline's buckets (a drifted copy would silently change the gate's
    * recall with no test failing). */
  private[graft] def bandsOf(sh: DataFrame): DataFrame = {
    val hashed = sh.select(col("doc_id"), pmod(col("h"), lit(MinhashPrime)).as("h"))
    // [[graft.functions.minhash_signature]]'s 64 lanes as 64 DECLARATIVE
    // min() aggregates — bit-identical values (same per-lane affine hash,
    // P² < 2⁶³ so the products never overflow, min is order-free), but the
    // aggregate becomes a codegen'd HashAggregate over a flat 64-long
    // buffer: map-side partials pipeline into the shuffle and the plan is
    // insensitive to the ObjectHashAggregate fallback threshold, which a
    // TypedImperativeAggregate here is hostage to in BOTH directions
    // (default 128: corpus-sized SORT fallback; raised: a giant object
    // hash map — measured 1.3× slower than the sort at 300× scale). The
    // SQL-facing minhash_signature function keeps the single-buffer form.
    val lanes = (0 until NumPerms).map { i =>
      val a = ((i.toLong * 2654435761L) | 1L) % MinhashPrime
      val b = i.toLong * 40503L + 7L
      min(pmod(col("h") * lit(a) + lit(b), lit(MinhashPrime))).as(s"_m$i")
    }
    val sig = hashed.groupBy("doc_id").agg(lanes.head, lanes.tail: _*)
      .select(col("doc_id"),
        array((0 until NumPerms).map(i => col(s"_m$i")): _*).as("sig"))
    sig
      .select(col("doc_id"), explode(sequence(lit(0), lit(NumPerms / BandRows - 1))).as("band"), col("sig"))
      .select(col("doc_id"), col("band"),
        concat_ws(",", slice(col("sig"), col("band") * BandRows + 1, lit(BandRows))
          .cast("array<string>")).as("band_sig"))
  }

  /** The MinHash-LSH pipeline over an arbitrary hashed-shingle relation
    * ((doc_id, h) rows, [[hashedShingleRelOf]]) — shared by the fixture
    * query and the 1M-doc scale smoke. */
  /** Rows per post-shuffle partition for the band self-join's sized
    * exchange: the shuffled-hash BUILD side holds its partition's band
    * rows in a per-task hash map (~100 B/row with map overhead → ~100 MB
    * at 1M), and per-task execution memory on a 32-way local box is
    * ~445 MB. At the session width a 1000× corpus put 2.5M build rows
    * (80M bands / 32) into every task — right at the acquisition edge,
    * and measured to tip into SparkOutOfMemoryError ("not enough memory
    * to build hash map") under today's ambient memory (r15). */
  private[graft] val BandRowsPerPartition = 1L * 1000 * 1000

  private[graft] def minhashPairs(sh: DataFrame, big: Boolean = true,
                                  nDocs: Option[Long] = None): DataFrame = {
    // join-strategy hints only at scale (see ShuffleHashMinDocBytes); the
    // 1M-doc smoke and any caller that doesn't know its size default to
    // the scale plan — this engine is scale-first
    def hinted(df: DataFrame): DataFrame = if (big) df.hint("shuffle_hash") else df
    // NOTE: sh feeds four consumers (signatures, sizes, both verification
    // sides) with no plan-level CSE. Recompute-per-consumer is kept over
    // localCheckpoint deliberately: measured at sf0.1 and the 1M-doc
    // smoke the two are within run noise — the codegen'd
    // tokenize+shingle+md5 pass pipelines into each consumer's first
    // shuffle, while a checkpoint adds an eager barrier + block I/O that
    // cancels the saved recomputation (unlike dedupNgramCapped's posting
    // build, which is itself a shuffle and DOES pay to materialize).
    val bands = bandsOf(sh)
    // shuffle_hash over sort-merge for the band self-join and the
    // candidate-restricted verify joins — AT SCALE ONLY (`hinted`; below
    // ShuffleHashMinDocBytes the hint is omitted so AQE's runtime
    // auto-broadcast of the tiny candidate side keeps the fixture plan
    // shuffle-free): neither side benefits from
    // sorted output, the build sides are partition-bounded (bands:
    // n·16/partitions rows; cand: the LSH survivor pairs — tiny next to
    // the shingle relation it probes), and skipping both sort passes
    // measured −23% on the whole pair pipeline at 300× scale (JoinAb
    // probe, two interleaved reps each). Sort-merge's only edge here —
    // graceful degradation when a partition outgrows memory — is the
    // shuffle-partition sizing contract every operator in this engine
    // already documents.
    // The band self-join's exchange width scales with the KNOWN band-row
    // count (16 rows per doc) like every big-relation exchange in this
    // engine (Exchanges.widthFor): at the session width the build-side
    // hash map is bands/width rows PER TASK, which stops fitting task
    // execution memory at corpus scale (see BandRowsPerPartition). Same
    // hysteresis as the co-probe family: through WideBranchFactor× the
    // session floor the plan is untouched (fixtures and the 300× point
    // keep AQE's choices — r14 measured the explicit plan's extra
    // exchanges as pure overhead near the floor). Both sides co-partition
    // on the equi-keys (one reused exchange — self-join), so the sized
    // branch adds no third exchange.
    val sessionParts = sh.sparkSession.sessionState.conf.numShufflePartitions
    val bandW = nDocs.map(n => graft.util.Exchanges.widthFor(
      n * (NumPerms / BandRows), sessionParts, BandRowsPerPartition))
    val (bandX, bandY) = bandW match {
      case Some(w) if big && w > WideBranchFactor * sessionParts =>
        (bands.repartition(w, col("band"), col("band_sig")),
          bands.repartition(w, col("band"), col("band_sig")).hint("shuffle_hash"))
      case _ => (bands, hinted(bands))
    }
    val cand = bandX.as("x").join(bandY.as("y"),
        col("x.band") === col("y.band") && col("x.band_sig") === col("y.band_sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    // Verify ONLY candidates (the LSH point): per-pair shingle intersection
    // via two candidate-restricted joins — never the all-pairs self-join.
    // Joins flow over the 8-byte hashed shingles, not the strings.
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val commons = hinted(cand)
      .join(sh.as("cx"), col("a") === col("cx.doc_id"))
      .join(sh.as("cy"),
        col("b") === col("cy.doc_id") && col("cx.h") === col("cy.h"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
    commons
      .join(sizes.as("sa"), col("a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("b") === col("sb.doc_id"))
      .select(col("a"), col("b"),
        (col("c").cast("double") / (col("sa.sz") + col("sb.sz") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= MinhashVerifyThreshold)
    // UNSORTED by design (see dedupMinhashPairs): the public query adds
    // its ORDER BY; composed consumers (CC, drop sets) are order-free and
    // must not pay the sort's second pipeline execution under an eager
    // checkpoint.
  }

  // ---- SimHash -------------------------------------------------------------

  /** SimHash near-dup pairs: 64-bit signature over distinct-token hashes
    * (single-pass [[graft.functions.SimhashSignature]] aggregate),
    * candidates via 4×16-bit chunk equality (complete for hamming ≤ 3),
    * verified by exact hamming distance. */
  def dedupSimhash(spark: SparkSession, sfDir: String): DataFrame = {
    val tokh = Tables.documents(spark, sfDir)
      .transform(Tables.rowParallel) // row-parallel fan-out (see Tables.rowParallel)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("token"))
      .select(col("doc_id"), graft.functions.md5_long(col("token")).as("h"))
    val sig = tokh.groupBy("doc_id")
      .agg(graft.functions.simhash64(col("h")).as("sig"))
    val chunks = sig.select(col("doc_id"), col("sig"),
      explode(sequence(lit(0), lit(3))).as("k"))
      .select(col("doc_id"), col("sig"), col("k"),
        expr("shiftright(sig, CAST(k * 16 AS INT)) & 65535").as("chunk"))
    val cand = chunks.as("x").join(chunks.as("y"),
        col("x.k") === col("y.k") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.sig").as("siga"), col("y.sig").as("sigb"))
      .distinct()
    cand
      .select(col("a"), col("b"), expr("bit_count(siga ^ sigb)").cast("long").as("hamming"))
      .filter(col("hamming") <= SimhashMaxHamming)
      .orderBy("a", "b")
  }

  /** Corpus cleaning (the operator a pipeline actually runs): drop exact
    * duplicates by normalized fingerprint (keep min doc_id), then drop the
    * larger id of every near-dup pair. Greedy per-pair removal — at 100 TB
    * the pair list is small relative to the corpus, broadcastable, and the
    * result is deterministic. */
  def dropNearDuplicates(docs: DataFrame, nearDupPairs: DataFrame): DataFrame = {
    val fp = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fp").orderBy("doc_id")
    val exactDeduped = docs
      .withColumn("fp", fp)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("fp", "_rn")
    val toDrop = nearDupPairs.select(col("b").as("doc_id")).distinct()
    exactDeduped.join(broadcast(toDrop), Seq("doc_id"), "left_anti")
  }

  /** Cleaned-corpus cardinality through the full dedup stack (exact dedup +
    * near-dup pair removal).
    *
    * Pair source: [[dedupNgramCapped]] — the df-capped inverted index is
    * the 100 TB default (an uncapped posting list on a stop-shingle like
    * "in the of" expands O(df²) pairs; the cap bounds every posting list).
    * The cap can only LOSE candidate pairs whose shared shingles are all
    * ubiquitous — such pairs sit far below [[NgramThreshold]], so the drop
    * set is unchanged in practice; DedupSpec pins capped ≡ uncapped drop
    * sets on the fixtures, and the oracle below intentionally keeps the
    * exact uncapped pipeline so any future divergence fails the gate
    * instead of hiding.
    *
    * LIFECYCLE: composes [[dedupNgramCapped]] and inherits its single-live
    * checkpoint contract — a frame returned by an earlier invocation on
    * the same `sfDir` is not re-executable after a newer invocation of
    * either operator completes (opt out via
    * `spark.graft.singleLiveCheckpoints=false`). */
  def dedupClean(spark: SparkSession, sfDir: String): DataFrame = {
    val cleaned = dropNearDuplicates(
      Tables.documents(spark, sfDir),
      dedupNgramCapped(spark, sfDir))
    cleaned.agg(count(lit(1)).as("n_clean"))
  }

  /** Distributed connected components over an (a, b) pair relation by
    * min-label propagation — the missing step between PAIR detection and
    * corpus cleaning: near-duplication is transitive in practice (A≈B≈C),
    * so production dedup keeps one representative per CLUSTER, not per
    * pair. Each superstep joins labels to the undirected edge list, takes
    * the min over (own label, neighbor labels), and stops at fixpoint;
    * labels converge to the component-minimum id in ≤ diameter steps.
    *
    * Scale shape: one equi-join + one hash agg per superstep (the Pregel
    * pattern on DataFrames); `localCheckpoint` every superstep truncates
    * the exponentially-growing lineage. Superstep count is the GRAPH
    * DIAMETER of the near-dup clusters — tiny for dedup graphs (clusters
    * are dense clumps, not paths); the large-star/small-star variant
    * bounds it at log n for adversarial chains. Throws if `maxIter`
    * supersteps do not converge rather than returning wrong labels. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 30,
                          smallGraphThreshold: Long = SmallGraphEdges): DataFrame =
    smallGraphPrep(pairs, smallGraphThreshold) match {
      case Some(edges) => smallGraphLabels(edges, smallGraphThreshold)
        .getOrElse(connectedComponentsDistributed(edges, maxIter))
      case None => connectedComponentsDistributed(pairs, maxIter)
    }

  private def connectedComponentsDistributed(
      pairs: DataFrame, maxIter: Int): DataFrame = {
    val edges = pairs.select(col("a").as("x"), col("b").as("y"))
      .union(pairs.select(col("b").as("x"), col("a").as("y")))
      .localCheckpoint()
    var labels = edges.select(col("x").as("node")).distinct()
      .select(col("node"), col("node").as("lab"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("node").as("y"), col("lab").as("ylab")), "y")
        .groupBy(col("x").as("node")).agg(min(col("ylab")).as("nlab"))
        .localCheckpoint()
      // convergence test BEFORE building the next label set: the final
      // superstep then costs one small join instead of a full materialize
      converged = nbrMin.join(labels, "node")
        .filter(col("nlab") < col("lab")).isEmpty
      if (!converged) {
        labels = labels
          .join(nbrMin, Seq("node"), "left")
          .select(col("node"), least(col("lab"), coalesce(col("nlab"), col("lab"))).as("lab"))
          .localCheckpoint()
        iter += 1
      }
    }
    require(converged, s"connectedComponents did not converge in $maxIter supersteps")
    labels
  }

  /** Alternating large-star/small-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond") — the scale path
    * for adversarial graph shapes where [[connectedComponents]]'s
    * min-label propagation needs O(diameter) supersteps: star operations
    * halve long paths each round, converging in O(log n) supersteps on ANY
    * graph.
    *
    *  - large-star(u): ∀v ∈ N(u) with v > u, emit (v, m) where
    *    m = min(N(u) ∪ {u}) — strictly-larger neighbors re-attach to the
    *    locally-smallest node;
    *  - small-star(u): over canonical (a > b) edges grouped by the larger
    *    endpoint, re-attach all smaller neighbors (and u itself) to m.
    *
    * At fixpoint the edge set is a star forest rooted at each component's
    * minimum id. Each half-step is one hash agg (the per-node min) + one
    * equi-join — no neighborhood materialization; `localCheckpoint`
    * truncates lineage per superstep. Equality with min-label propagation
    * is pinned in DedupSpec, including a path graph where label
    * propagation's superstep count would explode. */
  /** Adaptive small-graph shortcut shared by both CC variants: dedup pair
    * graphs are usually TINY relative to the corpus (pairs ≪ rows), and a
    * distributed superstep costs a fixed ~0.2 s of scheduling regardless
    * of volume. Below the threshold, collect the edges and run union-find
    * driver-side — the SAME component-minimum labels, none of the
    * superstep latency. Returns None above the threshold (callers fall
    * through to the distributed supersteps, which the 100k-node scale
    * smoke exercises). */

  /** Shared entry guard for the small-graph shortcut: checks the schema
    * precondition, then eagerly `localCheckpoint`s the pair edges ONCE so
    * the threshold count, the driver-side collect, and (above threshold)
    * the distributed fallback all read materialized blocks instead of each
    * re-executing the upstream pair-generation pipeline (the MinHash
    * join). Returns None when the shortcut machinery doesn't apply at all
    * (caller runs distributed on the raw pairs). */
  private def smallGraphPrep(pairs: DataFrame, threshold: Long)
      : Option[DataFrame] = {
    val longTyped = Seq("a", "b").forall(c =>
      pairs.schema.fieldNames.contains(c) &&
        pairs.schema(c).dataType == org.apache.spark.sql.types.LongType)
    if (threshold <= 0 || !longTyped) None
    else Some(pairs.select(col("a"), col("b")).localCheckpoint())
  }

  private def smallGraphLabels(pairs: DataFrame, threshold: Long)
      : Option[DataFrame] = {
    if (pairs.limit((threshold + 1).toInt).count() > threshold)
      None
    else {
      val es = pairs.select(col("a"), col("b")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val parent = collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        // endpoints register even for self-pairs, matching the distributed
        // variants' node sets (isolated nodes label themselves)
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        // union by MIN root so the final label is the component minimum
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val rows = parent.keys.toSeq.sorted.map(n => (n, find(n)))
      val spark = pairs.sparkSession
      import spark.implicits._
      Some(rows.toDF("node", "lab"))
    }
  }

  /** Edge count below which CC graphs solve driver-side. */
  val SmallGraphEdges = 100000L

  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 25,
                              smallGraphThreshold: Long = SmallGraphEdges): DataFrame =
    smallGraphPrep(pairs, smallGraphThreshold) match {
      case Some(edges) => smallGraphLabels(edges, smallGraphThreshold)
        .getOrElse(connectedComponentsStarDistributed(edges, maxIter))
      case None => connectedComponentsStarDistributed(pairs, maxIter)
    }

  private def connectedComponentsStarDistributed(
      pairs: DataFrame, maxIter: Int): DataFrame = {
    // canonical (a > b) edges, self-loops dropped
    var edges = pairs
      .select(greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    val nodes = pairs.select(col("a").as("node"))
      .union(pairs.select(col("b").as("node"))).distinct()
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // large-star over the bidirected view
      val bi = edges.select(col("a").as("u"), col("b").as("v"))
        .union(edges.select(col("b").as("u"), col("a").as("v")))
      val mL = bi.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val afterLarge = bi.join(mL, "u").filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .distinct()
      // small-star over canonical edges (every edge now has a > b ≥ m)
      val mS = afterLarge.groupBy("a").agg(min(col("b")).as("m"))
      val next = afterLarge.join(mS, "a")
        .select(col("b").as("a2"), col("m").as("b2"))
        .filter(col("a2") =!= col("b2"))
        .select(col("a2").as("a"), col("b2").as("b"))
        .union(mS.select(col("a"), col("m").as("b")))
        .distinct()
        .localCheckpoint()
      // both sides are distinct sets: |next| = |edges| plus next ⊆ edges
      // ⟹ equality — one count pair + one anti-join instead of two full
      // set-differences per superstep
      converged = next.count() == edges.count() &&
        next.join(edges, Seq("a", "b"), "left_anti").isEmpty
      edges = next
      iter += 1
    }
    require(converged, s"connectedComponentsStar did not converge in $maxIter supersteps")
    nodes.join(edges.select(col("a").as("node"), col("b").as("lab")), Seq("node"), "left")
      .groupBy("node").agg(min(coalesce(col("lab"), col("node"))).as("lab"))
  }

  /** [[dedupClusters]] through the [[connectedComponentsStar]] scale path —
    * same answer (both converge to component-minimum labels; the oracle is
    * identical), different superstep bound: O(log n) vs O(diameter). */
  def dedupClustersStar(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = dedupEmbeddingPairs(spark, sfDir).select("a", "b")
    val labels = connectedComponentsStar(pairs)
    val sizes = labels.groupBy(col("lab")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "lab")
      .select(col("node").as("vec_id"), col("lab").as("cluster_rep"), col("cluster_size"))
      .orderBy("vec_id")
  }

  // ---- Benchmark contamination --------------------------------------------

  val ContamNgram = 5

  /** Train/test contamination audit — the held-out-integrity check every
    * training pipeline needs: for each test-split document (split
    * assignment = [[TextAnalysis.splitCol]], the same salted-hash buckets
    * as `corpus_splits`), how many train-split documents share at least
    * one [[ContamNgram]]-gram, and how many distinct shingles leak.
    * Real pipelines run this with 8–13-grams against benchmark suites;
    * the machinery is identical.
    *
    * Scale shape: an inverted-index equi-join on 8-byte hashed shingles —
    * test-side postings are a tiny fraction of the corpus (the split is
    * 10%, benchmarks are smaller still), so the join probes, never
    * all-pairs. Hot boilerplate shingles amplify the join the same way
    * they amplify [[dedupNgram]]; the production escape hatch is the same
    * [[MaxShingleDf]] df-cap (kept off here so the oracle stays the exact
    * uncapped semantics). */
  def contamination(spark: SparkSession, sfDir: String): DataFrame = {
    // one tokenize+shingle pass serves both split sides (no plan-level CSE
    // across the self-join — localCheckpoint materializes it once)
    val sh = Tables.documents(spark, sfDir)
      .transform(Tables.rowParallel) // row-parallel fan-out (see Tables.rowParallel)
      .select(col("doc_id"),
        explode(graft.functions.shingles(tokens(col("text")), ContamNgram)).as("s"))
      .select(col("doc_id"), graft.functions.md5_long(col("s")).as("h"),
        TextAnalysis.splitCol(col("doc_id")).as("split"))
      .localCheckpoint()
    val train = sh.filter(col("split") === "train").select(col("h"), col("doc_id").as("train_id"))
    val test = sh.filter(col("split") === "test").select(col("h"), col("doc_id").as("test_id"))
    test.join(train, "h")
      .groupBy("test_id")
      .agg(countDistinct(col("train_id")).as("n_train_docs"),
        countDistinct(col("h")).as("n_shared_shingles"))
      .orderBy("test_id")
  }

  /** The full production dedup pass in ONE query: exact-fingerprint dedup
    * + MinHash-LSH verified pairs → star connected components → keep each
    * cluster's minimum-id representative → surviving-corpus cardinality.
    * This is the composition a 100 TB pipeline actually ships —
    * LSH-bounded candidate generation (never all-pairs), transitive
    * cluster semantics (A≈B≈C drops two docs, not a greedy pair walk),
    * O(log n)-superstep clustering. Oracle: the whole pipeline re-expressed
    * in DuckDB, MinHash banding included, closed with a recursive CTE. */
  def dedupCleanClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = dedupMinhashPairs(spark, sfDir).select("a", "b")
    val labels = connectedComponentsStar(pairs)
    // (rep, member) pairs: dropNearDuplicates removes the b side, so every
    // non-representative member of each cluster is dropped
    val clusterDrops = labels.filter(col("node") =!= col("lab"))
      .select(col("lab").as("a"), col("node").as("b"))
    dropNearDuplicates(Tables.documents(spark, sfDir), clusterDrops)
      .agg(count(lit(1)).as("n_clean"))
  }

  /** Keep-BEST cluster cleaning — [[dedupCleanClusters]] keeps each
    * cluster's minimum-id member; real pipelines keep the highest-quality
    * one (here: longest text, the classic keep-longest-duplicate rule,
    * with min-doc_id tie-break). One row per MinHash cluster: its
    * component representative, the kept member, its length, cluster size.
    * Deterministic argmax via `max_by` over a (n_chars, −doc_id) struct —
    * a bare max_by is nondeterministic on ties. */
  def dedupKeepBest(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = dedupMinhashPairs(spark, sfDir).select("a", "b")
    val labels = connectedComponentsStar(pairs)
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("n_chars"))
    labels.join(docs, labels("node") === docs("doc_id"))
      .groupBy(col("lab").as("cluster_rep"))
      .agg(
        max_by(col("node"), struct(col("n_chars"), -col("node"))).as("kept_doc"),
        max(col("n_chars")).as("kept_chars"),
        count(lit(1)).as("cluster_size"))
      .orderBy("cluster_rep")
  }

  /** Semantic near-dup clusters (SemDeDup-style): connected components of
    * the [[dedupEmbedding]] pair graph, one row per clustered doc with its
    * cluster representative (component-min id) and cluster size. The
    * cleaning rule "keep the representative" then drops n−1 docs per
    * cluster — transitive, unlike per-pair greedy drops. */
  def dedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = dedupEmbeddingPairs(spark, sfDir).select("a", "b")
    val labels = connectedComponents(pairs)
    val sizes = labels.groupBy(col("lab")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "lab")
      .select(col("node").as("vec_id"), col("lab").as("cluster_rep"), col("cluster_size"))
      .orderBy("vec_id")
  }

  /** Width of the exact-substring dedup window, in characters. ~8 tokens of
    * the fixture vocabulary — long enough that chance collisions are
    * essentially impossible, short enough to catch partial overlap the
    * document-level signatures miss. */
  val SpanWindow = 40

  /** Exact-substring span dedup (the ExactSubstr pass of "Deduplicating
    * Training Data Makes Language Models Better", Lee et al. 2022, public):
    * document-level MinHash misses a long verbatim passage pasted into an
    * otherwise-novel document; this operator finds it exactly. Every
    * stride-1 [[SpanWindow]]-char window is hashed (60-bit md5, shared with
    * the Jaccard family); a window is duplicated when its hash occurs at ≥2
    * positions corpus-wide (across documents OR repeated within one);
    * overlapping duplicated windows merge into maximal spans per document.
    * Emits per-doc span count, duplicated char count and coverage fraction.
    *
    * Scale shape: window generation is a per-row explode (O(len) rows/doc,
    * 8-byte hash keys) over a row-repartitioned input (parallelism from
    * rows, not input splits); duplicate detection is a count window over h —
    * ONE pass over the hashed windows, one shuffle, groups bounded by a
    * window's corpus-wide occurrence count (the same skew profile as any
    * groupBy h, AQE-handled); span merging is a window partitioned by
    * doc_id — frames bounded by document LENGTH, never corpus size. No
    * global funnel anywhere. The oracle re-runs the identical pipeline in
    * SQL (same hash, same island arithmetic) — bit-exact.
    */
  def dedupSpans(spark: SparkSession, sfDir: String): DataFrame =
    dedupSpansOf(Tables.documents(spark, sfDir))

  /** [[dedupSpans]] over an arbitrary (doc_id, text, n_chars) frame. */
  private[graft] def dedupSpansOf(docs: DataFrame): DataFrame = {
    val shuffleParts = docs.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val wins = docs
      .filter(col("n_chars") >= SpanWindow)
      // pre-explode fan-out: each doc row becomes O(len) hashed windows, so
      // parallelism must come from ROWS, not input splits — a corpus chunk
      // that arrives as one split would otherwise md5 on one core
      .repartition(shuffleParts)
      .select(col("doc_id"), col("n_chars"),
        explode(sequence(lit(0L), col("n_chars") - lit(SpanWindow.toLong))).as("start"),
        col("text"))
      .select(col("doc_id"), col("n_chars"), col("start"),
        graft.functions.md5_long(
          col("text").substr(col("start") + lit(1), lit(SpanWindow))).as("h"))
    // duplicate detection as a count-over-hash window: ONE pass over the
    // hashed windows and one shuffle on h — the groupBy+join formulation
    // recomputes the md5 scan for each consumer
    val flagged = wins
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("cnt") >= 2)
      .select(col("doc_id"), col("n_chars"), col("start"),
        (col("start") + lit(SpanWindow.toLong)).as("end"))
    // classic island merge: a window starts a new span iff it begins past
    // every previous window's end (starts are unique per doc, so the
    // running SUM default frame is unambiguous)
    val byDoc = Window.partitionBy("doc_id").orderBy("start")
    val prevMaxEnd = max(col("end"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = flagged
      .withColumn("brk", when(col("start") > coalesce(prevMaxEnd, lit(-1L)), 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("n_chars"), col("island"))
      .agg(min("start").as("s"), max("end").as("e"))
    spans.groupBy(col("doc_id"), col("n_chars"))
      .agg(count(lit(1)).as("n_spans"), sum(col("e") - col("s")).as("dup_chars"))
      .select(col("doc_id"), col("n_spans"), col("dup_chars"),
        round(col("dup_chars").cast("double") / col("n_chars").cast("double"), 6)
          .as("dup_frac"))
      .orderBy("doc_id")
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_spans" -> ((s, d) => dedupSpans(s, d)),
    "dedup_clusters" -> ((s, d) => dedupClusters(s, d)),
    "dedup_clusters_star" -> ((s, d) => dedupClustersStar(s, d)),
    "dedup_clean_clusters" -> ((s, d) => dedupCleanClusters(s, d)),
    "dedup_keep_best" -> ((s, d) => dedupKeepBest(s, d)),
    "contamination" -> ((s, d) => contamination(s, d)),
    "dedup_clean" -> ((s, d) => dedupClean(s, d)),
    "dedup_exact" -> ((s, d) => dedupExact(s, d)),
    "dedup_ngram" -> ((s, d) => dedupNgram(s, d)),
    "dedup_ngram_capped" -> ((s, d) => dedupNgramCapped(s, d)),
    "dedup_embedding" -> ((s, d) => dedupEmbedding(s, d)),
    "dedup_embedding_ivf" -> ((s, d) => dedupEmbeddingIvf(s, d)),
    "dedup_embedding_knn" -> ((s, d) => dedupEmbeddingIvfKnn(s, d)),
    "dedup_minhash" -> ((s, d) => dedupMinhash(s, d)),
    "dedup_simhash" -> ((s, d) => dedupSimhash(s, d)),
  )

  /** Every dedup query is oracle-checked, including the signature families:
    * the MinHash banding and SimHash chunking pipelines are fully
    * re-expressed in DuckDB SQL over the shared md5-derived 60-bit hash
    * ([[graft.OracleSql.md5Long]]), same permutation constants, same
    * band/chunk layout, same verification arithmetic. */
  /** MinHash pipeline CTE chain (tokenize → shingle → hash → 64-perm
    * signatures → 16×4 bands → candidates → shared-shingle counts) —
    * shared by the `dedup_minhash` oracle and the `dedup_clean_clusters`
    * closure so both gates exercise the identical pipeline SQL. */
  private val minhashCtes: String =
    s"""tok AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
       |sh0 AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN generate_series(1, len(t)-2)]
       |  )) AS shingle FROM tok),
       |sh AS (SELECT doc_id, ${O.md5Long("shingle")} AS h FROM sh0),
       |hashed AS (
       |  SELECT doc_id, h % $MinhashPrime AS h FROM sh),
       |perms AS (
       |  SELECT i, ((i * 2654435761) | 1) % $MinhashPrime AS pa, i * 40503 + 7 AS pb
       |  FROM generate_series(0, ${NumPerms - 1}) t(i)),
       |sig AS (
       |  SELECT doc_id, i, min((pa * h + pb) % $MinhashPrime) AS s
       |  FROM hashed CROSS JOIN perms GROUP BY 1, 2),
       |bands AS (
       |  SELECT doc_id, i // $BandRows AS band,
       |         string_agg(CAST(s AS VARCHAR), ',' ORDER BY i) AS band_sig
       |  FROM sig GROUP BY 1, 2),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.band_sig = y.band_sig AND x.doc_id < y.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |commons AS (
       |  SELECT a, b, count(*) AS c
       |  FROM cand
       |  JOIN sh cx ON a = cx.doc_id
       |  JOIN sh cy ON b = cy.doc_id AND cx.h = cy.h
       |  GROUP BY 1, 2)""".stripMargin

  /** Shared by `dedup_clusters` and `dedup_clusters_star`: both algorithms
    * converge to the same component-minimum labels, so one oracle gates
    * both (any divergence between the two Spark paths fails one of them). */
  private val clustersOracle: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT e1.vec_id AS a, e2.vec_id AS b
       |  FROM embeddings e1, embeddings e2
       |  WHERE e1.vec_id < e2.vec_id
       |    AND ${O.cosSim("e1.embedding", "e2.embedding")} >= $EmbeddingThreshold),
       |und AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
       |r(x, y) AS (
       |  SELECT x, y FROM und
       |  UNION
       |  SELECT r.x, u.y FROM r JOIN und u ON r.y = u.x),
       |rep AS (SELECT x AS vec_id, least(min(y), x) AS cluster_rep FROM r GROUP BY x),
       |sizes AS (SELECT cluster_rep, count(*) AS cluster_size FROM rep GROUP BY 1)
       |SELECT vec_id, rep.cluster_rep, sizes.cluster_size
       |FROM rep JOIN sizes ON rep.cluster_rep = sizes.cluster_rep
       |ORDER BY vec_id""".stripMargin

  def oracles: Map[String, String] = Map(
    "dedup_spans" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, n_chars FROM documents WHERE n_chars >= $SpanWindow),
         |wo AS (
         |  SELECT doc_id, n_chars, text,
         |    CAST(unnest(generate_series(0, n_chars - $SpanWindow)) AS BIGINT) AS start
         |  FROM d),
         |w AS (
         |  SELECT doc_id, n_chars, start,
         |    ${O.md5Long(s"substring(text, CAST(start + 1 AS INTEGER), $SpanWindow)")} AS h
         |  FROM wo),
         |dup AS (SELECT h FROM w GROUP BY h HAVING count(*) >= 2),
         |f AS (
         |  SELECT w.doc_id, w.n_chars, w.start, w.start + $SpanWindow AS e
         |  FROM w JOIN dup USING (h)),
         |brk AS (
         |  SELECT doc_id, n_chars, start, e,
         |    CASE WHEN start > COALESCE(MAX(e) OVER (PARTITION BY doc_id ORDER BY start
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS b
         |  FROM f),
         |isl AS (
         |  SELECT doc_id, n_chars, start, e,
         |    SUM(b) OVER (PARTITION BY doc_id ORDER BY start) AS island FROM brk),
         |spans AS (
         |  SELECT doc_id, n_chars, island, MIN(start) AS s, MAX(e) AS e2
         |  FROM isl GROUP BY doc_id, n_chars, island)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(SUM(e2 - s) AS BIGINT) AS dup_chars,
         |  ROUND(CAST(SUM(e2 - s) AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS dup_frac
         |FROM spans GROUP BY doc_id, n_chars
         |ORDER BY doc_id""".stripMargin,
    "dedup_clusters_star" -> clustersOracle,
    "contamination" ->
      s"""WITH tok AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
         |sh0 AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]
         |     FOR i IN generate_series(1, len(t)-4)]
         |  )) AS shingle FROM tok),
         |sh AS (
         |  SELECT doc_id, ${O.md5Long("shingle")} AS h,
         |    ${graft.operators.TextAnalysis.splitSql("doc_id")} AS split
         |  FROM sh0),
         |tr AS (SELECT h, doc_id AS train_id FROM sh WHERE split = 'train'),
         |te AS (SELECT h, doc_id AS test_id FROM sh WHERE split = 'test')
         |SELECT test_id, count(DISTINCT train_id) AS n_train_docs,
         |       count(DISTINCT h) AS n_shared_shingles
         |FROM te JOIN tr USING (h)
         |GROUP BY 1 ORDER BY test_id""".stripMargin,
    "dedup_clusters" -> clustersOracle,
    "dedup_minhash" ->
      s"""WITH $minhashCtes
         |SELECT a, b, CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
         |FROM commons
         |JOIN sizes sa ON a = sa.doc_id
         |JOIN sizes sb ON b = sb.doc_id
         |WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= $MinhashVerifyThreshold
         |ORDER BY a, b""".stripMargin,
    "dedup_clean_clusters" ->
      s"""WITH RECURSIVE $minhashCtes,
         |mp AS (
         |  SELECT a, b FROM commons
         |  JOIN sizes sa ON a = sa.doc_id
         |  JOIN sizes sb ON b = sb.doc_id
         |  WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= $MinhashVerifyThreshold),
         |und AS (SELECT a AS x, b AS y FROM mp UNION SELECT b, a FROM mp),
         |r(x, y) AS (
         |  SELECT x, y FROM und
         |  UNION
         |  SELECT r.x, u.y FROM r JOIN und u ON r.y = u.x),
         |rep AS (SELECT x AS doc_id, least(min(y), x) AS rep FROM r GROUP BY x),
         |drops AS (SELECT doc_id FROM rep WHERE rep != doc_id),
         |fpd AS (
         |  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
         |  FROM documents),
         |keep1 AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rn FROM fpd)
         |  WHERE rn = 1)
         |SELECT COUNT(*) AS n_clean FROM keep1
         |WHERE doc_id NOT IN (SELECT doc_id FROM drops)""".stripMargin,
    "dedup_keep_best" ->
      s"""WITH RECURSIVE $minhashCtes,
         |mp AS (
         |  SELECT a, b FROM commons
         |  JOIN sizes sa ON a = sa.doc_id
         |  JOIN sizes sb ON b = sb.doc_id
         |  WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= $MinhashVerifyThreshold),
         |und AS (SELECT a AS x, b AS y FROM mp UNION SELECT b, a FROM mp),
         |r(x, y) AS (
         |  SELECT x, y FROM und
         |  UNION
         |  SELECT r.x, u.y FROM r JOIN und u ON r.y = u.x),
         |rep AS (SELECT x AS doc_id, least(min(y), x) AS cluster_rep FROM r GROUP BY x),
         |members AS (
         |  SELECT rep.cluster_rep, rep.doc_id, d.n_chars
         |  FROM rep JOIN documents d USING (doc_id)),
         |best AS (
         |  SELECT cluster_rep, doc_id AS kept_doc, n_chars AS kept_chars,
         |    row_number() OVER (PARTITION BY cluster_rep
         |                       ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM members),
         |cl_sizes AS (
         |  SELECT cluster_rep, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM members GROUP BY cluster_rep)
         |SELECT b.cluster_rep, b.kept_doc, b.kept_chars, s.cluster_size
         |FROM best b JOIN cl_sizes s USING (cluster_rep)
         |WHERE rn = 1 ORDER BY cluster_rep""".stripMargin,
    "dedup_simhash" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS token
         |  FROM documents),
         |tokh AS (SELECT doc_id, ${O.md5Long("token")} AS h FROM tok),
         |bits AS (
         |  SELECT doc_id, i, SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS d
         |  FROM tokh CROSS JOIN generate_series(0, 59) t(i) GROUP BY 1, 2),
         |sig0 AS (
         |  SELECT doc_id,
         |         CAST(SUM(CASE WHEN d >= 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS sig
         |  FROM bits GROUP BY 1),
         |chunks AS (
         |  SELECT doc_id, sig, k, (sig >> (k * 16)) & 65535 AS chunk
         |  FROM sig0 CROSS JOIN generate_series(0, 3) t(k)),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.sig AS siga, y.sig AS sigb
         |  FROM chunks x JOIN chunks y
         |    ON x.k = y.k AND x.chunk = y.chunk AND x.doc_id < y.doc_id)
         |SELECT a, b, CAST(bit_count(xor(siga, sigb)) AS BIGINT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(siga, sigb)) <= $SimhashMaxHamming
         |ORDER BY a, b""".stripMargin,
    "dedup_clean" ->
      s"""WITH fp AS (
         |  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f
         |  FROM documents),
         |keep1 AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rn FROM fp)
         |  WHERE rn = 1),
         |tok AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
         |sh0 AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN generate_series(1, len(t)-2)]
         |  )) AS shingle FROM tok),
         |sh AS (SELECT doc_id, ${O.md5Long("shingle")} AS shingle FROM sh0),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |common AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
         |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2),
         |drops AS (
         |  SELECT DISTINCT b FROM common
         |  JOIN sizes sa ON a = sa.doc_id
         |  JOIN sizes sb ON b = sb.doc_id
         |  WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= $NgramThreshold)
         |SELECT COUNT(*) AS n_clean FROM keep1
         |WHERE doc_id NOT IN (SELECT b FROM drops)""".stripMargin,
    "dedup_exact" ->
      """WITH g AS (
        |  SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp, count(*) AS cnt
        |  FROM documents GROUP BY 1)
        |SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |       COUNT(*) AS n_distinct_text,
        |       CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups
        |FROM g""".stripMargin,
    "dedup_ngram_capped" ->
      s"""WITH tok AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
         |sh0 AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN generate_series(1, len(t)-2)]
         |  )) AS shingle FROM tok),
         |shh AS (SELECT doc_id, ${O.md5Long("shingle")} AS shingle FROM sh0),
         |rare AS (SELECT shingle FROM shh GROUP BY shingle HAVING count(*) <= $MaxShingleDf),
         |sh AS (SELECT shh.doc_id, shh.shingle FROM shh JOIN rare ON shh.shingle = rare.shingle),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |common AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
         |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2)
         |SELECT a, b, CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
         |FROM common
         |JOIN sizes sa ON a = sa.doc_id
         |JOIN sizes sb ON b = sb.doc_id
         |WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= $NgramThreshold
         |ORDER BY a, b""".stripMargin,
    "dedup_ngram" ->
      s"""WITH tok AS (
         |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
         |sh0 AS (
         |  SELECT doc_id, unnest(list_distinct(
         |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN generate_series(1, len(t)-2)]
         |  )) AS shingle FROM tok),
         |sh AS (SELECT doc_id, ${O.md5Long("shingle")} AS shingle FROM sh0),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |common AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
         |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2)
         |SELECT a, b, CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) AS jaccard
         |FROM common
         |JOIN sizes sa ON a = sa.doc_id
         |JOIN sizes sb ON b = sb.doc_id
         |WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= $NgramThreshold
         |ORDER BY a, b""".stripMargin,
    // dedup_embedding_ivf and dedup_embedding_knn are deliberately
    // ABSENT: they are the approximate co-probe scale twins (rows-only
    // gate; recall / drop-set parity spec-pinned in DedupSpec);
    // dedup_embedding below is their exact oracle anchor
    "dedup_embedding" ->
      s"""SELECT e1.vec_id AS a, e2.vec_id AS b,
         |  ${O.cosSim("e1.embedding", "e2.embedding")} AS sim
         |FROM embeddings e1, embeddings e2
         |WHERE e1.vec_id < e2.vec_id
         |  AND ${O.cosSim("e1.embedding", "e2.embedding")} >= $EmbeddingThreshold
         |ORDER BY a, b""".stripMargin,
  )
}
