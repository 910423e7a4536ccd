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
