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
}
