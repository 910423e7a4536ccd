package graft

/** Builders for the DuckDB-oracle SQL fragments that must be BIT-EXACT with
  * the engine's Catalyst vector expressions (graft.functions.*).
  *
  * Why not DuckDB's builtin `list_cosine_similarity`: it accumulates in
  * float32/SIMD order and differs from clean double accumulation by ~1e-8,
  * which breaks the driver's hash compare. Instead the oracle recomputes each
  * distance with `list_zip`/`list_transform`/`list_sum` over DOUBLEs —
  * DuckDB folds `list_sum` over doubles sequentially, exactly matching the
  * expressions' sequential loops (verified bit-equal during development).
  */
object OracleSql {

  /** Σ aᵢ·bᵢ in sequential double accumulation. */
  def dot(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)))"

  /** Σ aᵢ² in sequential double accumulation. */
  def normSq(a: String): String =
    s"list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

  /** cosine_similarity — matches [[graft.functions.CosineSimilarity]]. */
  def cosSim(a: String, b: String): String =
    s"(${dot(a, b)} / (sqrt(${normSq(a)}) * sqrt(${normSq(b)})))"

  /** cosine_distance — matches [[graft.functions.CosineDistance]]:
    * the literal `1.0 - sim` double op, same rounding step. */
  def cosDist(a: String, b: String): String =
    s"(1.0 - ${cosSim(a, b)})"

  /** l2_distance — matches [[graft.functions.L2Distance]]. */
  def l2Dist(a: String, b: String): String =
    s"sqrt(list_sum(list_transform(list_zip($a, $b), " +
      "s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)) * (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)))))"

  /** inner_product — matches [[graft.functions.InnerProduct]]. */
  def innerProduct(a: String, b: String): String = dot(a, b)

  /** Exact SUM of a double column that both engines reproduce bit-for-bit:
    * per-row cast to DECIMAL(18,2) → exact integer-scaled sum (no float
    * accumulation-order dependence) → cast back to DOUBLE. Use for money /
    * quantity columns whose values carry ≤2 decimal digits. */
  def sumExact(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"

  /** Exact AVG built from the exact decimal sum divided by a bigint count in
    * double — one deterministic division on both engines. */
  def avgExact(expr: String): String =
    s"(CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))"

  /** Deterministic 60-bit string hash — DuckDB twin of
    * [[graft.functions.md5_long]]: top 15 hex digits of md5 parsed as an
    * unsigned integer (DuckDB parses '0x…' string casts; verified equal to
    * Spark's `conv(substring(md5(x),1,15),16,10)` bit-for-bit). */
  def md5Long(expr: String): String =
    s"CAST(('0x' || substring(md5($expr), 1, 15)) AS BIGINT)"

  /** DuckDB twin of [[graft.functions.salted_bucket]] — the deterministic
    * salted hash bucket behind splits/mixes/sampling/shards/picks. The two
    * halves must stay byte-identical (salt, cast, modulus). */
  def saltedBucket(expr: String, salt: String, mod: Long): String =
    s"${md5Long(s"(CAST($expr AS VARCHAR) || ':$salt')")} % $mod"

  /** binary16 round-to-nearest-even quantization of a float expression —
    * the DuckDB twin of [[graft.functions.HalfFloat.toHalf]], EXACT (no bit
    * intrinsics needed): for a power-of-two quantum q, `x/q` is exact in
    * double (float32 has 24 mantissa bits, q only shifts the exponent), so
    * banker's rounding reduces to integer CASE arithmetic on the scaled
    * value. q = 2^(floor(log2|x|)−10) in half's normal range, 2⁻²⁴ for
    * half-subnormals; mantissa-overflow carries (1023.5+ → 1024) land on
    * the next exact binary16 value by construction. Validated against the
    * all-patterns Scala round-trip in HalfVecSpec and numpy float16 on 71k
    * samples during development. Overflow to ±inf (|x| > 65504) is NOT
    * modeled — fixture embeddings are ~[-1, 1]. */
  def halfRne(x: String): String = {
    val ax = s"abs(CAST($x AS DOUBLE))"
    def rneTimes(q: String): String = {
      val v = s"($ax / $q)"
      s"((CASE WHEN $v - floor($v) = 0.5 THEN " +
        s"(CASE WHEN CAST(floor($v) AS BIGINT) % 2 = 0 THEN floor($v) ELSE floor($v) + 1 END) " +
        s"WHEN $v - floor($v) < 0.5 THEN floor($v) ELSE floor($v) + 1 END) * $q)"
    }
    val e = s"floor(log2($ax))"
    s"(CASE WHEN $x = 0.0 OR NOT isfinite($x) THEN CAST($x AS DOUBLE) " +
      s"ELSE (CASE WHEN $x < 0 THEN -1.0 ELSE 1.0 END) * " +
      s"(CASE WHEN $e - 10 < -24 THEN ${rneTimes("power(2.0, -24)")} " +
      s"ELSE ${rneTimes(s"power(2.0, $e - 10)")} END) END)"
  }

  /** A float list quantized to binary16 values, as doubles. */
  def halfList(v: String): String =
    s"list_transform($v, h16 -> ${halfRne("h16")})"

  /** SQ8 cosine distance — matches [[graft.functions.SqCosineDistance]]:
    * dequantization factor f = scale/127 applied per element inside the
    * same sequential double accumulation the expression runs. `codes`,
    * `scale`, `q` are SQL fragments for array<tinyint>, float, array<float>. */
  def sqCosDist(codes: String, scale: String, q: String): String = {
    val f = s"(CAST($scale AS DOUBLE) / 127.0)"
    val dot = s"list_sum(list_transform(list_zip($codes, $q), " +
      s"s -> (CAST(s[1] AS DOUBLE) * $f) * CAST(s[2] AS DOUBLE)))"
    val na = s"list_sum(list_transform($codes, " +
      s"c -> (CAST(c AS DOUBLE) * $f) * (CAST(c AS DOUBLE) * $f)))"
    val nb = s"list_sum(list_transform($q, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))"
    s"(CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 1.0 " +
      s"ELSE 1.0 - $dot / (sqrt($na) * sqrt($nb)) END)"
  }
}
