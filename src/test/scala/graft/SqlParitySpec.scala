package graft

import org.apache.spark.sql.DataFrame

import graft.functions.registerAll

/** The "switch from the reference" contract made literal: the reference's
  * own SQL (README.md:233-241, 292-304; demo scripts), re-spelled only
  * where pgvector syntax has no Spark parse (`a <=> b` →
  * `cosine_distance(a, b)`, `'[…]'::vector` → the registered functions),
  * runs through `spark.sql` against temp views and returns exactly what
  * the DataFrame operators return. ILIKE, CTE + cross join, and the
  * `1 - (a <=> b) AS similarity` projection are all exercised as SQL text.
  */
class SqlParitySpec extends SparkSpec {

  private def same(sql: DataFrame, df: DataFrame): Unit = {
    val a = sql.collect().map(_.toSeq)
    val b = df.collect().map(_.toSeq)
    assert(a.length === b.length, s"row counts: ${a.length} vs ${b.length}")
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  private lazy val views: Unit = {
    registerAll(spark)
    Tables.documents(spark, Sf0001).createOrReplaceTempView("documents")
    Tables.embeddings(spark, Sf0001).createOrReplaceTempView("embeddings")
  }

  test("flagship kNN as SQL (reference README.md:233-241 shape)") {
    views
    same(
      spark.sql(
        """SELECT d.vec_id, d.label,
          |       1 - cosine_distance(d.embedding, qe.embedding) AS similarity
          |FROM embeddings d,
          |     (SELECT embedding FROM embeddings WHERE vec_id = 0) qe
          |ORDER BY cosine_distance(d.embedding, qe.embedding), d.vec_id
          |LIMIT 10""".stripMargin),
      operators.ReferenceQueries.knnTopK(spark, Sf0001, 10))
  }

  test("ILIKE filter as SQL (similarity_search_demo.py:75-77 shape)") {
    views
    same(
      spark.sql(
        """SELECT doc_id, n_chars FROM documents
          |WHERE text ILIKE '%merge slow%'
          |ORDER BY doc_id""".stripMargin),
      operators.ReferenceQueries.ilikeFilter(spark, Sf0001))
  }

  test("CTE seed + cross join kNN as SQL (similarity_search_demo.py:83-96 shape)") {
    views
    same(
      spark.sql(
        s"""WITH joined AS (
           |  SELECT d.doc_id, d.text, e.embedding
           |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
           |),
           |qe AS (
           |  SELECT embedding FROM joined
           |  WHERE text ILIKE '${operators.ReferenceQueries.SeedPattern}'
           |  ORDER BY doc_id LIMIT 1
           |)
           |SELECT j.doc_id,
           |       1 - cosine_distance(j.embedding, qe.embedding) AS similarity
           |FROM joined j CROSS JOIN qe
           |WHERE j.text NOT ILIKE '${operators.ReferenceQueries.SeedPattern}'
           |ORDER BY similarity DESC, j.doc_id
           |LIMIT 5""".stripMargin),
      operators.ReferenceQueries.knnCteSeed(spark, Sf0001))
  }

  test("SQL-registered distance functions agree on known values") {
    views
    val row = spark.sql(
      """SELECT cosine_distance(array(1.0f, 0.0f), array(0.0f, 1.0f)) AS c,
        |       l2_distance(array(0.0f, 3.0f), array(4.0f, 0.0f)) AS l,
        |       inner_product(array(1.0f, 2.0f), array(3.0f, 4.0f)) AS ip""".stripMargin)
      .head()
    assert(row.getDouble(0) === 1.0)
    assert(row.getDouble(1) === 5.0)
    assert(row.getDouble(2) === 11.0)
  }

  test("SQL-registered pgvector 0.8 functions: vector_norm, l2_normalize, binary_quantize") {
    views
    val row = spark.sql(
      """SELECT vector_norm(array(3.0f, 4.0f)) AS n,
        |       l2_normalize(array(3.0f, 4.0f)) AS u,
        |       l2_normalize(array(0.0f, 0.0f)) AS z,
        |       binary_quantize(array(1.0f, -2.0f, 0.0f, -0.5f)) AS b""".stripMargin)
      .head()
    assert(row.getDouble(0) === 5.0)
    assert(row.getSeq[Float](1) === Seq(0.6f, 0.8f))
    assert(row.getSeq[Float](2) === Seq(0.0f, 0.0f)) // norm-0 passthrough
    // sign bits: elements 0 (1.0) and 2 (0.0 >= 0) set → word 0b101 = 5
    assert(row.getSeq[Long](3) === Seq(5L))
  }

  test("vector_norms contract query runs through the SQL registry and is self-consistent") {
    val df = operators.ReferenceQueries.vectorNorms(spark, Sf0001).collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      assert(r.getDouble(1) > 0.0) // fixture embeddings are non-zero
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-6) // unit after normalize
      val nPos = r.getLong(3)
      assert(nPos >= 0 && nPos <= 64)
    }
  }

  test("L2 top-k as SQL (pgvector `<->` shape)") {
    views
    same(
      spark.sql(
        """SELECT e.vec_id, l2_distance(e.embedding, qe.embedding) AS dist
          |FROM embeddings e,
          |     (SELECT embedding FROM embeddings WHERE vec_id = 0) qe
          |ORDER BY dist, e.vec_id
          |LIMIT 10""".stripMargin),
      operators.ReferenceQueries.l2TopK(spark, Sf0001)
        .toDF("vec_id", "dist"))
  }

  test("inner-product top-k as SQL (pgvector `<#>` shape: ORDER BY negative ip)") {
    views
    same(
      spark.sql(
        """SELECT e.vec_id, inner_product(e.embedding, qe.embedding) AS ip
          |FROM embeddings e,
          |     (SELECT embedding FROM embeddings WHERE vec_id = 0) qe
          |ORDER BY -inner_product(e.embedding, qe.embedding), e.vec_id
          |LIMIT 10""".stripMargin),
      operators.ReferenceQueries.ipTopK(spark, Sf0001))
  }

  test("range search as SQL (pgvector `WHERE a <=> q < r` shape)") {
    views
    same(
      spark.sql(
        s"""SELECT e.vec_id, cosine_distance(e.embedding, qe.embedding) AS dist
           |FROM embeddings e,
           |     (SELECT embedding FROM embeddings WHERE vec_id = 0) qe
           |WHERE cosine_distance(e.embedding, qe.embedding) < ${
          operators.SimilarityQueries.RangeRadius}
           |ORDER BY dist, e.vec_id""".stripMargin),
      operators.SimilarityQueries.rangeSearch(spark, Sf0001))
  }

  test("batch kNN as SQL — the per-row LATERAL top-k join pgvector users write") {
    views
    import operators.SimilarityQueries.{BatchK, BatchQueries}
    same(
      spark.sql(
        s"""SELECT qid,
           |       CAST(row_number() OVER (PARTITION BY qid
           |                               ORDER BY dist, vec_id) AS BIGINT) AS rank,
           |       vec_id, dist
           |FROM (
           |  SELECT q.qid, r.vec_id, r.dist
           |  FROM (SELECT vec_id AS qid, embedding AS qv FROM embeddings
           |        WHERE vec_id < $BatchQueries) q,
           |  LATERAL (SELECT vec_id,
           |                  cosine_distance(embedding, q.qv) AS dist
           |           FROM embeddings
           |           ORDER BY dist, vec_id LIMIT $BatchK) r)
           |ORDER BY qid, rank""".stripMargin),
      operators.SimilarityQueries.knnBatch(spark, Sf0001))
  }
}

/** The rewrite-sensitive half of the SQL-parity contract: statements whose
  * RESULT depends on the pgvector DDL + session-knob machinery (CREATE
  * INDEX, SET ivfflat.probes / ivfflat.iterative_scan / hnsw.ef_search,
  * DROP INDEX), each spelled as the near-verbatim SQL a reference user
  * types and asserted equal to its DataFrame/exact twin. Complements
  * [[graft.plans.GraftSqlDdlSpec]] (which drives the same lifecycle but
  * asserts mostly through the DataFrame API): here the QUERY TEXT is the
  * unit under test. Runs in its own extension session — parsers bind at
  * session construction. */
class SqlRewriteParitySpec extends SparkSpec {

  private val tablePath = s"$Sf0001/embeddings.parquet"

  private def withExtensionSession(f: org.apache.spark.sql.SparkSession => Unit): Unit = {
    val prev = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(e => new plans.GraftExtensions()(e))
      .getOrCreate()
    try f(s2)
    finally {
      plans.AnnIndexRegistry.unregister(tablePath)
      org.apache.spark.sql.SparkSession.setDefaultSession(prev)
      org.apache.spark.sql.SparkSession.setActiveSession(prev)
    }
  }

  /** The seed vector, spelled as the SQL literal the rewrite recognizes. */
  private def qLit(s2: org.apache.spark.sql.SparkSession): String = {
    val q = s2.read.parquet(tablePath)
      .filter(org.apache.spark.sql.functions.col("vec_id") === 0)
      .head().getAs[collection.Seq[Float]]("embedding")
    s"CAST(array(${q.mkString(",")}) AS ARRAY<FLOAT>)"
  }

  /** Driver-side exact cosine top-k over the raw parquet (any DataFrame
    * orderBy-limit in the extension session would itself be rewritten). */
  private def exactTopK(s2: org.apache.spark.sql.SparkSession, k: Int,
                        pred: Long => Boolean = _ => true): Seq[Long] = {
    val rows = s2.read.parquet(tablePath)
      .select("vec_id", "embedding").collect()
    val q = rows.find(_.getLong(0) == 0L).get
      .getAs[collection.Seq[Float]](1).toArray
    def cosDist(a: collection.Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < q.length) {
        val x = a(i).toDouble; val y = q(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.filter(r => pred(r.getLong(0)))
      .map(r => (r.getLong(0), cosDist(r.getAs[collection.Seq[Float]](1))))
      .sortBy { case (id, d) => (d, id) }.take(k).map(_._1).toSeq
  }

  test("SET ivfflat.probes as SQL: probe-all through the DDL index equals exact") {
    withExtensionSession { s2 =>
      graft.functions.registerAll(s2)
      s2.read.parquet(tablePath).createOrReplaceTempView("par_items")
      val knnSql =
        s"""SELECT vec_id FROM par_items
           |ORDER BY cosine_distance(embedding, ${qLit(s2)}), vec_id
           |LIMIT 10""".stripMargin
      val exact = exactTopK(s2, 10)
      s2.sql("CREATE INDEX par_probes_idx ON par_items USING ivfflat " +
        s"(embedding vector_cosine_ops) WITH (lists = ${operators.IndexQueries.Lists})")
      try {
        val rewritten = s2.sql(knnSql)
        assert(rewritten.queryExecution.executedPlan.toString.contains("list_id"),
          "the SQL-spelled kNN must rewrite onto the index")
        // default probes=1: the seed's own list is probed → self at rank 1
        assert(rewritten.collect().head.getLong(0) === 0L)
        s2.sql(s"SET ivfflat.probes = ${operators.IndexQueries.Lists}")
        assert(s2.sql(knnSql).collect().map(_.getLong(0)).toSeq === exact,
          "SET ivfflat.probes = lists through SQL must equal exact")
      } finally {
        s2.sql("RESET ivfflat.probes")
        s2.sql("DROP INDEX par_probes_idx")
      }
      assert(s2.sql(knnSql).collect().map(_.getLong(0)).toSeq === exact,
        "after DROP INDEX the SQL statement must serve the exact scan")
    }
  }

  test("filtered kNN as SQL through ivfflat.iterative_scan (pgvector 0.8 headline)") {
    withExtensionSession { s2 =>
      graft.functions.registerAll(s2)
      s2.read.parquet(tablePath).createOrReplaceTempView("par_fitems")
      // label = 7 keeps ~1/16 of the fixture: selective enough that probe
      // expansion must fire to honor k
      val labelOf = s2.read.parquet(tablePath).select("vec_id", "label")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val filteredSql =
        s"""SELECT vec_id FROM par_fitems
           |WHERE label = 7
           |ORDER BY cosine_distance(embedding, ${qLit(s2)}), vec_id
           |LIMIT 10""".stripMargin
      val exact = exactTopK(s2, 10, id => labelOf(id) == 7)
      s2.sql("CREATE INDEX par_filter_idx ON par_fitems USING ivfflat " +
        s"(embedding vector_cosine_ops) WITH (lists = ${operators.IndexQueries.Lists})")
      try {
        val got = s2.sql(filteredSql)
        assert(got.queryExecution.executedPlan.toString.contains("list_id"),
          "the filtered SQL kNN must route through the index")
        // default iterative_scan (relaxed_order analog) expands probes
        // until k rows SURVIVE the predicate — k rows, predicate honored,
        // APPROXIMATE like pgvector's iterative scans (the exact-answer
        // variant is the IvfIndex.filteredKnn API, oracle-pinned in
        // CORRECTNESS as filtered_knn)
        val kept = got.collect().map(_.getLong(0)).toSeq
        val label7 = labelOf.filter(_._2 == 7).keySet
        assert(kept.length === 10,
          "iterative scan must expand probes until the filtered k is honored")
        assert(kept.toSet.subsetOf(label7))
        val recall = kept.toSet.intersect(exact.toSet).size / 10.0
        info(f"filtered SQL kNN recall@10 at default probes: $recall%.1f")
        // deterministic 0.4 on this fixture: expansion stops the moment k
        // label-7 rows survive (~4 of 16 lists probed) — the gate pins
        // "approximate but not broken", the exactness contract is the
        // probes=lists assert below
        assert(recall >= 0.3, s"recall@10 through the iterative scan was $recall")
        // probe-all via the session knob → every list scanned → the SQL
        // statement's answer is the exact filtered top-k
        s2.sql(s"SET ivfflat.probes = ${operators.IndexQueries.Lists}")
        assert(s2.sql(filteredSql).collect().map(_.getLong(0)).toSeq === exact,
          "probes = lists through SQL must equal exact filtered top-k")
        s2.sql("RESET ivfflat.probes")
        // pgvector's knobs parse and bind: off caps expansion at the
        // initial probes (may return < k rows — approximate, like pgvector
        // pre-0.8); max_probes bounds the expansion ceiling
        s2.sql("SET ivfflat.iterative_scan = off")
        val offRows = s2.sql(filteredSql).collect().map(_.getLong(0)).toSeq
        assert(offRows.length <= 10)
        assert(offRows.toSet.subsetOf(label7),
          "iterative_scan=off must still honor the predicate")
        s2.sql("SET ivfflat.iterative_scan = relaxed_order")
        s2.sql("SET ivfflat.max_probes = 1")
        val capped = s2.sql(filteredSql).collect().map(_.getLong(0)).toSeq
        assert(capped.toSet.subsetOf(label7),
          "max_probes-capped scan must still honor the predicate")
      } finally {
        s2.sql("RESET ivfflat.probes")
        s2.sql("RESET ivfflat.iterative_scan")
        s2.sql("RESET ivfflat.max_probes")
        s2.sql("DROP INDEX par_filter_idx")
      }
    }
  }

  test("hnsw DDL round-trip as SQL: ef_search-steered statement equals exact, DROP restores") {
    withExtensionSession { s2 =>
      graft.functions.registerAll(s2)
      s2.read.parquet(tablePath).createOrReplaceTempView("par_hitems")
      val knnSql =
        s"""SELECT vec_id FROM par_hitems
           |ORDER BY cosine_distance(embedding, ${qLit(s2)}), vec_id
           |LIMIT 10""".stripMargin
      val exact = exactTopK(s2, 10)
      s2.sql("CREATE INDEX par_hnsw_idx ON par_hitems USING hnsw " +
        "(embedding vector_cosine_ops) WITH (m = 16, ef_construction = 64, shards = 2)")
      try {
        val plan = s2.sql(knnSql).queryExecution.optimizedPlan.toString
        assert(plan.contains(" IN (") || plan.contains("INSET"),
          s"the SQL kNN must carry the graph candidate-id filter:\n$plan")
        // corpus-wide beam → the graph answer is exact, through SQL text
        s2.sql("SET hnsw.ef_search = 500")
        assert(s2.sql(knnSql).collect().map(_.getLong(0)).toSeq === exact,
          "SET hnsw.ef_search = corpus through SQL must equal exact")
      } finally {
        s2.conf.unset("hnsw.ef_search")
        s2.sql("DROP INDEX par_hnsw_idx")
      }
      val after = s2.sql(knnSql)
      val planAfter = after.queryExecution.optimizedPlan.toString
      assert(!planAfter.contains(" IN (") && !planAfter.contains("INSET"),
        s"DROP INDEX must restore the exact scan:\n$planAfter")
      assert(after.collect().map(_.getLong(0)).toSeq === exact)
    }
  }
}
