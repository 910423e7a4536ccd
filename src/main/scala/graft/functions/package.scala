package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.FloatType

/** Column-level API for the engine's vector operators, mirroring the pgvector
  * operator family the reference uses (/root/reference/README.md:9;
  * SURVEY.md §2.10). Also registers the functions for `spark.sql(...)` use —
  * the analog of `CREATE EXTENSION vector` bootstrap
  * (/root/reference/demo/aws_rds_demo.py:53).
  */
package object functions {

  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  /** pgvector `a <=> b` (cosine distance). */
  def cosine_distance(a: Column, b: Column): Column = col(CosineDistance(expr(a), expr(b)))

  /** The reference's `1 - (a <=> b) AS similarity` projection. */
  def cosine_similarity(a: Column, b: Column): Column = col(CosineSimilarity(expr(a), expr(b)))

  /** pgvector `a <-> b` (Euclidean distance). */
  def l2_distance(a: Column, b: Column): Column = col(L2Distance(expr(a), expr(b)))

  /** pgvector 0.7 `a <+> b` (taxicab / L1 distance). */
  def l1_distance(a: Column, b: Column): Column = col(L1Distance(expr(a), expr(b)))

  /** Positive inner product; pgvector `a <#> b` = `-inner_product(a, b)`. */
  def inner_product(a: Column, b: Column): Column = col(InnerProduct(expr(a), expr(b)))

  /** pgvector elementwise `a + b` on vectors. */
  def vector_add(a: Column, b: Column): Column =
    F.zip_with(a, b, (x, y) => (x + y).cast(FloatType))

  /** pgvector elementwise `a - b` on vectors. */
  def vector_sub(a: Column, b: Column): Column =
    F.zip_with(a, b, (x, y) => (x - y).cast(FloatType))

  /** pgvector elementwise `a * b` on vectors. */
  def vector_mul(a: Column, b: Column): Column =
    F.zip_with(a, b, (x, y) => (x * y).cast(FloatType))

  /** pgvector `vector_norm(v)` (Euclidean norm, double) — single-pass
    * codegen'd [[VectorNorm]], SQL-registered by [[registerAll]]. */
  def vector_norm(v: Column): Column = col(VectorNorm(expr(v)))

  /** pgvector `l2_normalize(v)`: v/‖v‖ as float (zero vector passes
    * through unchanged, matching pgvector's error-free behavior on norm 0
    * for halfvec/sparsevec and avoiding NaN codes downstream). Codegen'd
    * [[L2Normalize]], SQL-registered by [[registerAll]]. */
  def l2_normalize(v: Column): Column = col(L2Normalize(expr(v)))

  /** pgvector `a <#> b` (negative inner product, ascending = max-IP). */
  def neg_inner_product(a: Column, b: Column): Column = -inner_product(a, b)

  /** Parse a pgvector text literal `'[0.1,0.2,...]'` into array<float> —
    * the `'[...]'::vector` cast at /root/reference/demo/aws_rds_demo.py:68. */
  def parse_vector(s: Column): Column =
    F.transform(
      F.split(F.regexp_replace(F.trim(s), "^\\[|\\]$", ""), ",\\s*"),
      x => x.cast(FloatType))

  /** Render array<float> as the pgvector literal text `[x1,x2,...]` —
    * `','.join(map(str, emb))` at /root/reference/demo/aws_rds_demo.py:68. */
  def vector_literal(v: Column): Column =
    F.concat(F.lit("["), F.concat_ws(",", F.transform(v, _.cast("string"))), F.lit("]"))

  /** `vector_dims(v)` (/root/reference/demo/README.md:96). */
  def vector_dims(v: Column): Column = F.size(v)

  /** pgvector 0.8 `subvector(v, start, count)` — 1-based, like the SQL
    * standard substring. Spark's codegen'd `slice` IS this operator
    * (compose-don't-rebuild); deviation: out-of-range slices clamp to the
    * available elements instead of raising, matching `slice`/DuckDB list
    * slicing (pgvector raises — documented contract difference). */
  def subvector(v: Column, start: Int, count: Int): Column =
    F.slice(v, start, count)

  /** pgvector `a || b` vector concatenation (codegen'd `concat`). */
  def vector_concat(a: Column, b: Column): Column = F.concat(a, b)

  /** Enforce pgvector's `VECTOR(n)` fixed-dimension typing at ingest:
    * errors on mismatch like pgvector, passes the value through otherwise. */
  def validate_vector(v: Column, dim: Int): Column =
    F.when(F.size(v) === dim, v)
      .otherwise(F.raise_error(F.concat(
        F.lit(s"vector dimension mismatch: expected $dim, got "), F.size(v).cast("string"))))

  /** Constant `Array[Float]` query vector as a Column literal. */
  def vector_lit(v: Array[Float]): Column = F.typedLit(v)

  /** Distinct n-gram shingles of a token array (codegen'd; dedup unit). */
  def shingles(tokens: Column, n: Int): Column = col(Shingles(expr(tokens), n))

  /** Deterministic feature-hashing sentence embedding (offline default for
    * the reference's EmbeddingGenerator; mean-pool + L2-normalize). */
  def hash_embed(text: Column, dim: Int = 384): Column = col(HashEmbed(expr(text), dim))

  /** SQ8 quantization: array<float> → struct(scale, codes array<tinyint>),
    * value ≈ code·scale/127, codegen'd in one pass ([[SqQuantize]] — the
    * HOF form re-walked an interpreted lambda per element). An all-zero
    * vector has scale 0 and emits zero codes (x/0 would yield NaN, which
    * ANSI-mode cast to tinyint rejects); [[SqCosineDistance]] defines its
    * distance as 1.0. */
  def sq_quantize(v: Column): Column = col(SqQuantize(expr(v)))

  /** Cosine distance between SQ8 codes (+scale) and a float query vector. */
  def sq_cosine_distance(codes: Column, scale: Column, q: Column): Column =
    col(SqCosineDistance(expr(codes), expr(scale), expr(q)))

  /** 1-bit binary quantization: array<float> → array<bigint> sign-bit words
    * (bit set ⇔ element ≥ 0); 32× smaller than float32. */
  def bq_pack(v: Column): Column = col(BqPack(expr(v)))

  /** Hamming distance between two [[bq_pack]] signatures (XOR+popcount). */
  def bq_hamming(a: Column, b: Column): Column = col(BqHamming(expr(a), expr(b)))

  /** Jaccard distance between two [[bq_pack]] signatures — pgvector's
    * `jaccard_distance` / `<%>` bit operator ([[BqJaccard]]). */
  def bq_jaccard(a: Column, b: Column): Column = col(BqJaccard(expr(a), expr(b)))

  /** All (a < b) pairs of a bigint array — posting-list pair expansion. */
  def sorted_pairs(ids: Column): Column = col(SortedPairs(expr(ids)))

  /** [[sorted_pairs]] packed as `(a << 32) | b` bigints (ids must fit
    * [0, 2³¹)) — 8-byte group keys for the per-pair count. */
  def sorted_pair_keys(ids: Column): Column = col(SortedPairKeys(expr(ids)))

  /** Deterministic 60-bit string hash both engines reproduce bit-for-bit:
    * the top 15 hex digits of md5, parsed as an unsigned integer (< 2⁶⁰, so
    * it fits a signed long in ANSI mode). DuckDB twin:
    * `CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)` — this is what
    * makes MinHash/SimHash signatures oracle-checkable, where xxhash64 has
    * no DuckDB equivalent ([[graft.OracleSql.md5Long]]). Codegen'd digest →
    * long directly ([[Md5Long]]); equality with the composed
    * conv(substring(md5)) form is pinned in VectorPropertiesSpec. */
  def md5_long(s: Column): Column = col(Md5Long(expr(s)))

  /** Deterministic salted hash bucket: `md5_long("<id>:<salt>") mod m` —
    * the ONE reproducible-sampling primitive behind corpus splits/mixes/
    * sampling, packing shards and cluster picks. Keep byte-identical with
    * its oracle twin [[graft.OracleSql.saltedBucket]]: salt string, VARCHAR
    * cast and modulus must match or the oracle gate silently diverges. */
  def salted_bucket(id: Column, salt: String, mod: Long): Column =
    F.pmod(md5_long(F.concat(id.cast("string"), F.lit(":" + salt))), F.lit(mod))

  /** Upper-triangle outer-product terms of a float vector (row-major, i ≤ j)
    * — the codegen'd per-row covariance contribution ([[TriProducts]]). */
  def tri_products(v: Column): Column = col(TriProducts(expr(v)))

  /** [[tri_products]] with the d raw components (as double) appended after
    * the d(d+1)/2 products — one explode feeds both covariance product sums
    * and per-dim first-moment sums in a single corpus pass. */
  def tri_products_moments(v: Column): Column =
    col(TriProducts(expr(v), withMoments = true))

  /** Single-buffer exact covariance moments: struct(sums, n) where sums is
    * the d(d+1)/2 upper-triangle DECIMAL product sums followed by the d
    * first-moment sums — no per-term rows, d learned from the data
    * ([[CovMomentSums]]). */
  def cov_moment_sums(v: Column): Column =
    col(CovMomentSums(expr(v)).toAggregateExpression())

  /** Single-pass MinHash signature aggregate (input: pmod'ed hash ∈ [0,P)). */
  def minhash_signature(h: Column, numPerms: Int, prime: Long): Column =
    col(MinhashSignature(expr(h), numPerms, prime).toAggregateExpression())

  /** Single-pass 64-bit SimHash aggregate over token hashes. */
  def simhash64(h: Column): Column =
    col(SimhashSignature(expr(h)).toAggregateExpression())

  /** pgvector 0.7 `halfvec` analog: array<float> → binary16 BINARY
    * (round-to-nearest-even, 2 bytes/element — 2× less scan bandwidth). */
  def half_pack(v: Column): Column = col(HalfPack(expr(v)))

  /** halfvec BINARY → array<float>, exact widening. */
  def half_unpack(b: Column): Column = col(HalfUnpack(expr(b)))

  /** pgvector `halfvec <=> halfvec` (cosine distance, unpacks on the fly). */
  def half_cosine_distance(a: Column, b: Column): Column =
    col(HalfCosineDistance(expr(a), expr(b)))

  /** pgvector 0.7 `sparsevec` analog: dense array<float> → sparse struct
    * (dim, ascending indices, non-zero values), keeping |x| > eps. */
  def sparse_vectorize(v: Column, eps: Double): Column = col(SparseVectorize(expr(v), eps))

  /** sparsevec → dense array<float> (zeros at absent indices). */
  def sparse_to_dense(s: Column): Column = col(SparseToDense(expr(s)))

  /** Inner product over two sparsevecs (merge-walk, O(nnz)). */
  def sparse_inner_product(a: Column, b: Column): Column =
    col(SparseInnerProduct(expr(a), expr(b)))

  /** pgvector `sparsevec <-> sparsevec` — bit-equal to [[l2_distance]] on
    * the zero-filled dense forms ([[SparseL2Distance]]). */
  def sparse_l2_distance(a: Column, b: Column): Column =
    col(SparseL2Distance(expr(a), expr(b)))

  /** pgvector `sparsevec <+> sparsevec` — bit-equal to [[l1_distance]] on
    * the zero-filled dense forms ([[SparseL1Distance]]). */
  def sparse_l1_distance(a: Column, b: Column): Column =
    col(SparseL1Distance(expr(a), expr(b)))

  /** pgvector `sparsevec <=> sparsevec` — bit-equal to [[cosine_distance]]
    * on the zero-filled dense forms. */
  def sparse_cosine_distance(a: Column, b: Column): Column =
    col(SparseCosineDistance(expr(a), expr(b)))

  /** pgvector `SUM(vector)`: element-wise sum aggregate, one double[] buffer
    * per (group × partition) — no dim× explode before the shuffle
    * ([[VectorSumAvg]]). Returns array<double>; NULL on empty groups. */
  def vector_sum(v: Column): Column =
    col(VectorSumAvg(expr(v), returnAvg = false).toAggregateExpression())

  /** pgvector `AVG(vector)`: element-wise mean aggregate ([[VectorSumAvg]]). */
  def vector_avg(v: Column): Column =
    col(VectorSumAvg(expr(v), returnAvg = true).toAggregateExpression())

  /** Bounded per-group top-k by (dist ASC, id ASC): map-side k-heaps, k-way
    * heap merge — the two-phase replacement for a per-group row_number
    * window ([[TopKByDistance]]). Returns a sorted array<struct<vec_id,
    * dist>>; posexplode for ranks. */
  def top_k_by_distance(dist: Column, id: Column, k: Int): Column =
    col(TopKByDistance(expr(dist), expr(id), k).toAggregateExpression())

  // weak identity set of SessionStates already registered — keying on an
  // identity-hash STRING could collide across sessions in a long-lived JVM
  // and silently skip registration
  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[AnyRef, java.lang.Boolean]()))

  /** Spark's ObjectHashAggregate abandons hash aggregation for a full
    * SORT of the input once a task sees this many distinct group keys
    * (spark.sql.objectHashAggregate.sortBased.fallbackThreshold, default
    * 128 — sized for giant buffers like collect_list). Every bounded-heap
    * aggregate in this engine ([[top_k_by_distance]] and friends) keeps
    * ≤ k entries per key (~hundreds of bytes), so the default turns the
    * corpus-sized co-probe stages into corpus-sized SORTS: measured at
    * 300× scale, knn_graph_ivf spent 88 s spilling 79 GB under the
    * default and 14 s with zero spill at this threshold. 2²⁰ keys ×
    * ~300 B ≈ 300 MB per task ceiling keeps the guard meaningful for
    * genuinely huge buffers. */
  val ObjectHashFallbackKeys: Int = 1 << 20

  /** Wide-start shuffle sizing for the STATEMENT-scoped big-aggregate
    * paths (the dedup family's posting/signature builds): shuffles start
    * at this many partitions and AQE coalescing merges small stages back
    * to the advisory size, so per-task sort/aggregate volume stays
    * bounded as the corpus grows. A CONSTANT shuffle-partition count is
    * the documented scale-killer shape the r12 sf30 artifact measured
    * (~90 GB of per-partition sort spill at 32 partitions), and the
    * pair-count aggregate re-measured it after the r13 fixes: 56 GB of
    * hash-agg spill and 1.6-2× the wall at 32-wide starts vs zero spill
    * at 16×-wide (AbPairStages, 300× data).
    *
    * Scoped per statement, NOT session-wide: r13 set this as a session
    * default and the r14 A/B (AbInitParts, 300×) measured the tax on
    * queries whose shuffles are small enough to never need it — the
    * co-probe ANN family ran 12-40% slower under session-wide 16× starts
    * (knn_graph_ivf 29.7 s vs 17.1 s) with identical results and zero
    * spill either way. The operators that need width know their own
    * input sizes; they scope it with [[withSqlConf]] around their eager
    * builds or pass explicit partition counts computed from measured
    * row counts (see Dedup.pairCounts). */
  def InitialShufflePartitionsFor(parts: Int): Int = math.min(parts * 16, 8192)

  /** Run `body` with session-conf overrides applied, restoring the prior
    * values (or unsetting) afterwards — the engine's statement-scoped GUC
    * analog. Only meaningful when `body` EXECUTES a job (an eager
    * localCheckpoint / write / collect): Spark reads SQLConf at execution,
    * not DataFrame-build, time. Scoping is per-session, so concurrent
    * queries in the same session observe the override for `body`'s
    * duration — the same caveat as any session GUC. */
  def withSqlConf[T](spark: SparkSession, kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Apply the session default the engine's bounded-buffer aggregates
    * assume ([[ObjectHashFallbackKeys]]). Leaves any value the user
    * explicitly set alone. Called from [[registerAll]] — the
    * extension-bootstrap analog of pgvector setting its GUCs at CREATE
    * EXTENSION — and from the engine's own mains. Session-wide by design
    * (documented in docs/QUICKSTART.md with both opt-outs).
    *
    * The r13 session-wide `initialPartitionNum` raise is GONE: wide
    * shuffle starts are now scoped to the operators that need them
    * ([[InitialShufflePartitionsFor]] explains the measured reason). */
  def tuneSession(spark: SparkSession): Unit = {
    if (sys.env.contains("SPARK_GRAFT_NO_TUNE")) return // A/B escape hatch
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    if (spark.conf.getOption(key).forall(_ == "128"))
      spark.conf.set(key, ObjectHashFallbackKeys.toString)
  }

  /** Idempotently register the vector functions in `spark`'s session
    * function registry so `spark.sql("... cosine_distance(a,b) ...")` works. */
  def registerAll(spark: SparkSession): Unit = {
    if (registered.add(spark.sessionState)) {
      tuneSession(spark)
      val r = spark.sessionState.functionRegistry
      r.createOrReplaceTempFunction("cosine_distance", es => CosineDistance(es(0), es(1)), "scala_udf")
      r.createOrReplaceTempFunction("cosine_similarity", es => CosineSimilarity(es(0), es(1)), "scala_udf")
      r.createOrReplaceTempFunction("l2_distance", es => L2Distance(es(0), es(1)), "scala_udf")
      r.createOrReplaceTempFunction("l1_distance", es => L1Distance(es(0), es(1)), "scala_udf")
      r.createOrReplaceTempFunction("inner_product", es => InnerProduct(es(0), es(1)), "scala_udf")
      r.createOrReplaceTempFunction("shingles",
        es => Shingles(es(0), es(1).eval().asInstanceOf[Int]), "scala_udf")
      r.createOrReplaceTempFunction("hash_embed",
        es => HashEmbed(es(0), es(1).eval().asInstanceOf[Int]), "scala_udf")
      r.createOrReplaceTempFunction("subvector",
        es => org.apache.spark.sql.catalyst.expressions.Slice(es(0), es(1), es(2)),
        "scala_udf")
      r.createOrReplaceTempFunction("vector_concat",
        es => org.apache.spark.sql.catalyst.expressions.Concat(es), "scala_udf")
      // pgvector 0.8 function-surface completion (VERDICT r6 item 7)
      r.createOrReplaceTempFunction("vector_norm", es => VectorNorm(es(0)), "scala_udf")
      r.createOrReplaceTempFunction("l2_normalize", es => L2Normalize(es(0)), "scala_udf")
      // pgvector binary_quantize returns bit(n); ours packs the same sign
      // bits into array<bigint> words (documented representation deviation)
      r.createOrReplaceTempFunction("binary_quantize", es => BqPack(es(0)), "scala_udf")
      // pgvector's bit-opclass distances (`<~>` / `<%>`), over binary_quantize
      // signatures rather than bit(n) — same representation deviation as above
      r.createOrReplaceTempFunction("hamming_distance", es => BqHamming(es(0), es(1)), "scala_udf")
      r.createOrReplaceTempFunction("jaccard_distance", es => BqJaccard(es(0), es(1)), "scala_udf")
    }
  }
}
