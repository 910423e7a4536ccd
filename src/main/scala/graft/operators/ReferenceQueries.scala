package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{OracleSql => O, Tables}
import graft.functions.{cosine_distance, inner_product, l1_distance, l2_distance}

/** The reference's query surface (SURVEY.md §2.2-2.5), re-expressed as
  * declarative DataFrame plans over the fixture tables. The reference's
  * `documents(id, text, embedding)` entity is reconstructed as
  * `documents ⋈ embeddings ON doc_id = vec_id` (FIXTURES.md §2).
  *
  * Scale notes (the 100 TB stance):
  *  - every scan is a parquet columnar scan with pushed filters/pruned
  *    columns (no full-row materialization);
  *  - single-row "seed" sides are broadcast, never shuffled
  *    (BroadcastNestedLoopJoin with a 1-row build side);
  *  - all top-k queries compile to `TakeOrderedAndProject` — per-partition
  *    bounded heaps + driver merge of k rows, not a global sort;
  *  - `avg_pairwise_sim` is the reference's own O(n²) query (J2); kept
  *    semantically identical, with the broadcast side bounded.
  */
object ReferenceQueries {

  /** Seed pattern used by the CTE-seeded search (reference parameterizes it;
    * demo uses '%machine learning%' — similarity_search_demo.py:75-77). */
  val SeedPattern = "%vector window%"

  /** T1 flagship: cosine top-k against the vec_id=0 query vector.
    * Ref: ORDER BY embedding <=> 'q'::vector LIMIT k
    * (/root/reference/demo/aws_rds_similarity_search_demo.py:170-180). */
  def knnTopK(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val seed = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    e.crossJoin(broadcast(seed))
      .select(
        col("vec_id"), col("label"),
        (lit(1.0) - cosine_distance(col("embedding"), col("qv"))).as("similarity"),
        cosine_distance(col("embedding"), col("qv")).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
      .drop("dist")
  }

  /** J1: CTE-seeded search — seed looked up by ILIKE, all docs scored against
    * it, seed-pattern matches excluded, top-5 by similarity.
    * Ref: /root/reference/demo/similarity_search_demo.py:83-96. */
  def knnCteSeed(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .join(Tables.embeddings(spark, sfDir),
        col("doc_id") === col("vec_id"), "inner")
    // Reference uses bare LIMIT 1 (nondeterministic); we pin min doc_id
    // (SURVEY.md §7.2 determinism note).
    val seed = docs.filter(col("text").ilike(SeedPattern))
      .orderBy(col("doc_id")).limit(1)
      .select(col("embedding").as("qv"))
    docs.crossJoin(broadcast(seed))
      .filter(!col("text").ilike(SeedPattern))
      .select(
        col("doc_id"),
        (lit(1.0) - cosine_distance(col("embedding"), col("qv"))).as("similarity"))
      .orderBy(col("similarity").desc, col("doc_id"))
      .limit(k)
  }

  /** P3: self-similarity sanity — `1 - (embedding <=> embedding)` ≈ 1.0
    * (/root/reference/demo/similarity_search_demo.py:136-143). */
  def selfSim(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(
        col("vec_id"),
        (lit(1.0) - cosine_distance(col("embedding"), col("embedding"))).as("self_sim"))
      .orderBy(col("vec_id"))

  /** J2+A2: global mean pairwise similarity over all ordered pairs.
    * Ref: /root/reference/demo/similarity_search_demo.py:125-130.
    * Cross-engine float-sum order differs, so the value is rounded to 6dp on
    * both sides (SURVEY.md §7.2). */
  def avgPairwiseSim(spark: SparkSession, sfDir: String): DataFrame = {
    val e1 = Tables.embeddings(spark, sfDir).select(
      col("vec_id").as("id1"), col("embedding").as("v1"))
    val e2 = Tables.embeddings(spark, sfDir).select(
      col("vec_id").as("id2"), col("embedding").as("v2"))
    e1.crossJoin(e2)
      .filter(col("id1") =!= col("id2"))
      .agg(round(avg(lit(1.0) - cosine_distance(col("v1"), col("v2"))), 6).as("avg_sim"))
  }

  /** A1: COUNT(*) (/root/reference/demo/similarity_search_demo.py:49). */
  def countDocs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).agg(count(lit(1)).as("n"))

  /** T2: full listing in key order (/root/reference/demo/similarity_search_demo.py:58). */
  def listDocs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")

  /** T3: ORDER BY id DESC LIMIT 5 (/root/reference/demo/README.md:96). */
  def recentDocs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select("doc_id", "text")
      .orderBy(col("doc_id").desc)
      .limit(5)

  /** P4+T4: ILIKE filter (/root/reference/demo/similarity_search_demo.py:75-77). */
  def ilikeFilter(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(col("text").ilike("%merge slow%"))
      .select("doc_id", "n_chars")
      .orderBy("doc_id")

  /** P10: vector_dims (/root/reference/demo/README.md:96). */
  def vectorDims(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      // cast to long: DuckDB len() yields BIGINT and the driver compares schemas
      .select(col("vec_id"), graft.functions.vector_dims(col("embedding")).cast("long").as("dim"))
      .orderBy("vec_id")

  /** L2 (pgvector `<->`) top-k — §2.10 operator-family completion. */
  def l2TopK(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val seed = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    e.crossJoin(broadcast(seed))
      .select(col("vec_id"), l2_distance(col("embedding"), col("qv")).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }

  /** L1/taxicab (pgvector 0.7 `<+>`) top-k — completes the distance
    * operator family. */
  def l1TopK(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val seed = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    e.crossJoin(broadcast(seed))
      .select(col("vec_id"), l1_distance(col("embedding"), col("qv")).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }

  /** Max-inner-product (pgvector `<#>`) top-k — §2.10. */
  def ipTopK(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    val seed = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    e.crossJoin(broadcast(seed))
      .select(
        col("vec_id"),
        inner_product(col("embedding"), col("qv")).as("ip"),
        (-inner_product(col("embedding"), col("qv"))).as("neg_ip"))
      .orderBy(col("neg_ip"), col("vec_id"))
      .limit(k)
      .drop("neg_ip")
  }

  /** P9 vector literal parity: `'[...]'::vector` text round-trip
    * (/root/reference/demo/aws_rds_demo.py:68). Float32→string→float32 is
    * exact in Spark (shortest round-trip repr), so mismatches must be 0. */
  def vectorParseRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{parse_vector, vector_literal}
    Tables.embeddings(spark, sfDir)
      .select((parse_vector(vector_literal(col("embedding"))) === col("embedding"))
        .as("same"))
      .agg(
        sum(when(col("same"), 0L).otherwise(1L)).as("n_mismatch"),
        count(lit(1)).as("n_rows"))
  }

  /** pgvector 0.8 `subvector` / `||` function family over the embeddings
    * table: a 4-wide mid slice, a concat of head+tail slices, the concat'd
    * dimension, and an out-of-range slice (clamps — documented deviation
    * from pgvector's raise; DuckDB clamps identically).
    *
    * Output is posexploded to scalar rows `(vec_id, part, dim, x)` — the
    * driver's checker sorts columns with pandas and cannot hash raw
    * `array<float>` cells, so contract queries must emit scalar-typed
    * columns only. Values stay raw float32 (no arithmetic), so the oracle
    * compare is bit-exact. */
  def vectorSlice(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.{subvector, vector_concat, vector_dims}
    val sliced = Tables.embeddings(spark, sfDir)
      .select(
        col("vec_id"),
        subvector(col("embedding"), 3, 4).as("sub"),
        vector_concat(
          subvector(col("embedding"), 1, 2),
          subvector(col("embedding"), 63, 2)).as("head_tail"),
        vector_dims(vector_concat(col("embedding"), col("embedding")))
          .cast("long").as("cat_dims"),
        subvector(col("embedding"), 63, 10).as("clamped"))
    val parts = Seq("sub", "head_tail", "clamped").map { p =>
      sliced
        .select(col("vec_id"), lit(p).as("part"),
          posexplode(col(p)).as(Seq("dim", "x")))
        .select(col("vec_id"), col("part"),
          col("dim").cast("long").as("dim"), col("x"))
    }
    val catRow = sliced.select(
      col("vec_id"), lit("cat_dims").as("part"), lit(0L).as("dim"),
      col("cat_dims").cast("float").as("x"))
    (parts :+ catRow).reduce(_ unionAll _).orderBy("vec_id", "part", "dim")
  }

  /** pgvector 0.8 SQL-function surface — `vector_norm`, `l2_normalize`,
    * `binary_quantize` — exercised through the SESSION REGISTRY (the query
    * goes through `spark.sql`, not the Column API, so it proves the
    * functions are SQL-callable as [[graft.functions.registerAll]]
    * promises). Per vector: the Euclidean norm, the norm after
    * normalization (≈1; exact double recompute, oracle replays the same
    * one-rounding float division), and the sign-bit population count of
    * the binary quantization (scalar-typed so the driver can hash it).
    *
    * Scale shape: map-only projection over the scan — no shuffle. */
  def vectorNorms(spark: SparkSession, sfDir: String): DataFrame = {
    graft.functions.registerAll(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("graft_norm_embeddings")
    spark.sql(
      """SELECT vec_id,
        |  vector_norm(embedding) AS norm,
        |  vector_norm(l2_normalize(embedding)) AS unit_norm,
        |  aggregate(binary_quantize(embedding), 0L, (acc, w) -> acc + bit_count(w)) AS n_pos
        |FROM graft_norm_embeddings ORDER BY vec_id""".stripMargin)
  }

  /** Oracle SQL (DuckDB dialect) for every query above; fragments built by
    * [[graft.OracleSql]] are bit-exact with the Catalyst expressions. */
  def oracles: Map[String, String] = {
    val simTo0 = O.cosSim("e.embedding", "q.qv")
    val distTo0 = O.cosDist("e.embedding", "q.qv")
    Map(
      "knn_topk" ->
        s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
           |SELECT e.vec_id, e.label, 1.0 - $distTo0 AS similarity
           |FROM embeddings e, q
           |ORDER BY $distTo0, e.vec_id
           |LIMIT 10""".stripMargin,
      "knn_cte_seed" ->
        s"""WITH docs AS (
           |  SELECT d.doc_id, d.text, e.embedding
           |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
           |), q AS (
           |  SELECT embedding AS qv FROM docs
           |  WHERE text ILIKE '$SeedPattern' ORDER BY doc_id LIMIT 1
           |)
           |SELECT docs.doc_id, 1.0 - ${O.cosDist("docs.embedding", "q.qv")} AS similarity
           |FROM docs, q
           |WHERE docs.text NOT ILIKE '$SeedPattern'
           |ORDER BY similarity DESC, docs.doc_id
           |LIMIT 5""".stripMargin,
      "self_sim" ->
        s"""SELECT vec_id, 1.0 - ${O.cosDist("embedding", "embedding")} AS self_sim
           |FROM embeddings ORDER BY vec_id""".stripMargin,
      "avg_pairwise_sim" ->
        s"""SELECT round(avg(1.0 - ${O.cosDist("e1.embedding", "e2.embedding")}), 6) AS avg_sim
           |FROM embeddings e1, embeddings e2
           |WHERE e1.vec_id != e2.vec_id""".stripMargin,
      "count_docs" -> "SELECT count(*) AS n FROM documents",
      "list_docs" ->
        "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",
      "recent_docs" ->
        "SELECT doc_id, text FROM documents ORDER BY doc_id DESC LIMIT 5",
      "ilike_filter" ->
        "SELECT doc_id, n_chars FROM documents WHERE text ILIKE '%merge slow%' ORDER BY doc_id",
      "vector_dims" ->
        "SELECT vec_id, len(embedding) AS dim FROM embeddings ORDER BY vec_id",
      // norm in sequential double accumulation (bit-exact with VectorNorm);
      // unit_norm replays L2Normalize's one float rounding per element
      "vector_norms" ->
        s"""WITH n AS (
           |  SELECT vec_id, embedding, sqrt(${O.normSq("embedding")}) AS norm
           |  FROM embeddings),
           |u AS (
           |  SELECT vec_id, norm, embedding,
           |    CASE WHEN norm = 0 THEN embedding
           |         ELSE list_transform(embedding,
           |                x -> CAST(CAST(x AS DOUBLE) / norm AS FLOAT)) END AS uv
           |  FROM n)
           |SELECT vec_id, norm,
           |  sqrt(${O.normSq("uv")}) AS unit_norm,
           |  CAST(len(list_filter(embedding, x -> x >= 0)) AS BIGINT) AS n_pos
           |FROM u ORDER BY vec_id""".stripMargin,
      "l2_topk" ->
        s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
           |SELECT e.vec_id, ${O.l2Dist("e.embedding", "q.qv")} AS dist
           |FROM embeddings e, q
           |ORDER BY dist, e.vec_id
           |LIMIT 10""".stripMargin,
      "l1_topk" ->
        s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
           |SELECT e.vec_id,
           |  list_sum(list_transform(list_zip(e.embedding, q.qv),
           |    s -> abs(CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)))) AS dist
           |FROM embeddings e, q
           |ORDER BY dist, e.vec_id
           |LIMIT 10""".stripMargin,
      "ip_topk" ->
        s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
           |SELECT e.vec_id, ${O.innerProduct("e.embedding", "q.qv")} AS ip
           |FROM embeddings e, q
           |ORDER BY -${O.innerProduct("e.embedding", "q.qv")}, e.vec_id
           |LIMIT 10""".stripMargin,
      "vector_parse_roundtrip" ->
        "SELECT CAST(0 AS BIGINT) AS n_mismatch, COUNT(*) AS n_rows FROM embeddings",
      // DuckDB list slicing is 1-based inclusive: v[3:6] = slice(v, 3, 4).
      // Posexploded to scalar rows (multiple unnests in one SELECT zip);
      // range(a,b) is half-open so dim is 0-based like Spark's posexplode.
      "vector_slice" ->
        """WITH s AS (
          |  SELECT vec_id,
          |    embedding[3:6] AS sub,
          |    embedding[1:2] || embedding[63:64] AS head_tail,
          |    CAST(len(embedding || embedding) AS BIGINT) AS cat_dims,
          |    embedding[63:72] AS clamped
          |  FROM embeddings
          |)
          |SELECT vec_id, 'sub' AS part,
          |  CAST(unnest(range(len(sub))) AS BIGINT) AS dim, unnest(sub) AS x
          |FROM s
          |UNION ALL
          |SELECT vec_id, 'head_tail' AS part,
          |  CAST(unnest(range(len(head_tail))) AS BIGINT) AS dim,
          |  unnest(head_tail) AS x
          |FROM s
          |UNION ALL
          |SELECT vec_id, 'clamped' AS part,
          |  CAST(unnest(range(len(clamped))) AS BIGINT) AS dim,
          |  unnest(clamped) AS x
          |FROM s
          |UNION ALL
          |SELECT vec_id, 'cat_dims' AS part, CAST(0 AS BIGINT) AS dim,
          |  CAST(cat_dims AS FLOAT) AS x
          |FROM s
          |ORDER BY vec_id, part, dim""".stripMargin,
    )
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_topk" -> ((s, d) => knnTopK(s, d)),
    "knn_cte_seed" -> ((s, d) => knnCteSeed(s, d)),
    "self_sim" -> ((s, d) => selfSim(s, d)),
    "avg_pairwise_sim" -> ((s, d) => avgPairwiseSim(s, d)),
    "count_docs" -> ((s, d) => countDocs(s, d)),
    "list_docs" -> ((s, d) => listDocs(s, d)),
    "recent_docs" -> ((s, d) => recentDocs(s, d)),
    "ilike_filter" -> ((s, d) => ilikeFilter(s, d)),
    "vector_dims" -> ((s, d) => vectorDims(s, d)),
    "vector_norms" -> ((s, d) => vectorNorms(s, d)),
    "l2_topk" -> ((s, d) => l2TopK(s, d)),
    "l1_topk" -> ((s, d) => l1TopK(s, d)),
    "ip_topk" -> ((s, d) => ipTopK(s, d)),
    "vector_parse_roundtrip" -> ((s, d) => vectorParseRoundtrip(s, d)),
    "vector_slice" -> ((s, d) => vectorSlice(s, d)),
  )
}
