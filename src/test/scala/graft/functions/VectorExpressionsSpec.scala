package graft.functions

import org.apache.spark.sql.functions.{col, typedLit}

import graft.SparkSpec

/** Hand-checkable values use the reference's own dim-3 fixtures
  * (/root/reference/tests/test_pg.py:55, 76-81; FIXTURES.md §1.1/§3). */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val a = Array(0.1f, 0.2f, 0.3f)
  private val b = Array(0.5f, 0.6f, 0.7f)
  private val c = Array(0.8f, 0.9f, 1.0f)

  private def one(colExpr: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(colExpr.as("v")).head().getDouble(0)

  private def refCos(x: Array[Float], y: Array[Float]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    for (i <- x.indices) {
      dot += x(i).toDouble * y(i); nx += x(i).toDouble * x(i); ny += y(i).toDouble * y(i)
    }
    1.0 - dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  test("cosine_distance matches hand computation on dim-3 fixtures") {
    assert(one(cosine_distance(typedLit(a), typedLit(b))) === refCos(a, b))
    assert(one(cosine_distance(typedLit(b), typedLit(c))) === refCos(b, c))
  }

  test("cosine_similarity + cosine_distance = 1 exactly (same fl ops)") {
    val s = one(cosine_similarity(typedLit(a), typedLit(b)))
    val d = one(cosine_distance(typedLit(a), typedLit(b)))
    assert(d === 1.0 - s)
  }

  test("l2_distance and inner_product on known values") {
    assert(math.abs(one(l2_distance(typedLit(a), typedLit(b))) - math.sqrt(0.48)) < 1e-7)
    assert(math.abs(one(inner_product(typedLit(a), typedLit(b))) - 0.38) < 1e-7)
    assert(one(neg_inner_product(typedLit(a), typedLit(b))) ===
      -one(inner_product(typedLit(a), typedLit(b))))
  }

  test("dimension mismatch errors like pgvector") {
    val ex = intercept[Exception] {
      Seq(1).toDF("x")
        .select(cosine_distance(typedLit(a), typedLit(Array(1.0f, 2.0f))))
        .head()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("dimension mismatch")))
  }

  test("null input yields null, not error") {
    val df = Seq((Some(a), None: Option[Array[Float]])).toDF("a", "b")
    assert(df.select(cosine_distance(col("a"), col("b"))).head().isNullAt(0))
  }

  test("works over real fixture column (interpreted + codegen paths agree)") {
    val e = Tables_embeddings()
    val viaExpr = e.select(cosine_distance(col("embedding"), col("embedding")).as("d"))
      .agg(org.apache.spark.sql.functions.max("d")).head().getDouble(0)
    assert(viaExpr < 1e-12) // self-distance ≈ 0
  }

  private def Tables_embeddings() = graft.Tables.embeddings(spark, Sf0001)

  test("SQL registration: cosine_distance usable from spark.sql") {
    registerAll(spark)
    Tables_embeddings().createOrReplaceTempView("emb_sql_test")
    val r = spark.sql(
      "SELECT cosine_distance(embedding, embedding) AS d FROM emb_sql_test LIMIT 1").head()
    assert(r.getDouble(0) < 1e-12)
  }

  test("parse_vector round-trips vector_literal") {
    val df = Seq(1).toDF("x").select(
      parse_vector(vector_literal(typedLit(a))).as("v"))
    assert(df.head().getSeq[Float](0).toArray === a)
  }

  test("validate_vector passes on match and errors on mismatch") {
    val ok = Seq(Tuple1(a)).toDF("v").select(validate_vector(col("v"), 3))
    assert(ok.head().getSeq[Float](0).length === 3)
    intercept[Exception] {
      Seq(Tuple1(a)).toDF("v").select(validate_vector(col("v"), 384)).head()
    }
  }

  test("l1_distance: known values, symmetry, triangle inequality, SQL registration") {
    import graft.functions.l1_distance
    val a = Array(1.0f, -2.0f, 3.0f)
    val b = Array(4.0f, 0.0f, -1.0f)
    assert(one(l1_distance(typedLit(a), typedLit(b))) === 9.0)
    assert(one(l1_distance(typedLit(b), typedLit(a))) === 9.0)
    assert(one(l1_distance(typedLit(a), typedLit(a))) === 0.0)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val x = Array.fill(8)(rnd.nextFloat() * 10f - 5f)
      val y = Array.fill(8)(rnd.nextFloat() * 10f - 5f)
      val z = Array.fill(8)(rnd.nextFloat() * 10f - 5f)
      val xy = one(l1_distance(typedLit(x), typedLit(y)))
      val yz = one(l1_distance(typedLit(y), typedLit(z)))
      val xz = one(l1_distance(typedLit(x), typedLit(z)))
      assert(xz <= xy + yz + 1e-9, "L1 is a metric")
    }
    graft.functions.registerAll(spark)
    assert(spark.sql(
      "SELECT l1_distance(array(1.0f,-2.0f,3.0f), array(4.0f,0.0f,-1.0f))")
      .head().getDouble(0) === 9.0)
  }

  test("vector arithmetic: add/sub/mul elementwise; norm; l2_normalize") {
    import graft.functions.{vector_add, vector_mul, vector_norm, vector_sub, l2_normalize}
    import org.apache.spark.sql.Row
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val r = df.select(
      vector_add(col("a"), col("b")).as("s"),
      vector_sub(col("a"), col("b")).as("d"),
      vector_mul(col("a"), col("b")).as("m"),
      vector_norm(col("b")).as("n"),
      l2_normalize(col("b")).as("u")).head()
    assert(r.getAs[collection.Seq[Float]]("s") === Seq(4.0f, 6.0f))
    assert(r.getAs[collection.Seq[Float]]("d") === Seq(-2.0f, -2.0f))
    assert(r.getAs[collection.Seq[Float]]("m") === Seq(3.0f, 8.0f))
    assert(r.getAs[Double]("n") === 5.0)
    val u = r.getAs[collection.Seq[Float]]("u")
    assert(math.abs(u(0) - 0.6f) < 1e-6 && math.abs(u(1) - 0.8f) < 1e-6)
    // zero vector: norm 0, normalize is identity (no NaNs)
    val z = Seq(Tuple1(Array(0.0f, 0.0f))).toDF("v")
      .select(vector_norm(col("v")).as("n"), l2_normalize(col("v")).as("u")).head()
    assert(z.getAs[Double]("n") === 0.0)
    assert(z.getAs[collection.Seq[Float]]("u") === Seq(0.0f, 0.0f))
  }

  test("subvector is 1-based with count; clamps; vector_concat appends; SQL names registered") {
    val v = Array(1.0f, 2.0f, 3.0f, 4.0f, 5.0f)
    val r = Seq(Tuple1(v)).toDF("v").select(
      subvector(col("v"), 2, 3).as("mid"),
      subvector(col("v"), 4, 10).as("clamped"),
      vector_concat(subvector(col("v"), 1, 1), subvector(col("v"), 5, 1)).as("cat"))
      .head()
    assert(r.getAs[collection.Seq[Float]]("mid") === Seq(2.0f, 3.0f, 4.0f))
    assert(r.getAs[collection.Seq[Float]]("clamped") === Seq(4.0f, 5.0f))
    assert(r.getAs[collection.Seq[Float]]("cat") === Seq(1.0f, 5.0f))
    // pgvector's SQL spelling through the registered names
    graft.functions.registerAll(spark)
    val sql = spark.sql(
      "SELECT vector_concat(subvector(array(1.0F, 2.0F, 3.0F), 1, 2), " +
        "array(9.0F)) AS c").head()
    assert(sql.getAs[collection.Seq[Float]]("c") === Seq(1.0f, 2.0f, 9.0f))
  }

  // ScalaCheck-style properties (SURVEY.md §5): symmetry, range, dist(x,x)≈0.
  // Evaluated driver-side against the same interpreted `compute` path used by
  // eval; the codegen path is covered by the fixture-column tests above.
  test("property: cosine distance symmetric, in [0,2], self ≈ 0 (100 random vectors)") {
    val rnd = new scala.util.Random(42)
    val dims = Seq(3, 8, 64)
    for (_ <- 1 to 100) {
      val d = dims(rnd.nextInt(dims.length))
      val x = Array.fill(d)(rnd.nextFloat() * 20f - 10f)
      val y = Array.fill(d)(rnd.nextFloat() * 20f - 10f)
      val d1 = one(cosine_distance(typedLit(x), typedLit(y)))
      val d2 = one(cosine_distance(typedLit(y), typedLit(x)))
      assert(d1 === d2)
      assert(d1 >= -1e-9 && d1 <= 2.0 + 1e-9)
      assert(one(cosine_distance(typedLit(x), typedLit(x))) < 1e-9)
    }
  }
}
