package graft.operators

import java.math.{BigDecimal => JBD}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{cov_moment_sums, tri_products_moments, CovMomentsBuffer}

/** The single-buffer moment aggregate must agree BIT-FOR-BIT with the
  * posexplode(tri_products_moments) + groupBy(pos) decimal-sum formulation
  * it replaces — that formulation is what the DuckDB covariance oracle was
  * pinned against, so exact decimal equality here is what keeps
  * embedding_covariance / pca_project hash-green. */
class CovMomentsAggregateSpec extends SparkSpec {

  /** The pre-r12 explode formulation, verbatim. */
  private def explodeMoments(df: org.apache.spark.sql.DataFrame, d: Int)
      : (Array[JBD], Array[JBD], Long) = {
    val t = d * (d + 1) / 2
    val rows = df
      .select(posexplode(tri_products_moments(col("embedding"))).as(Seq("pos", "p")))
      .groupBy("pos")
      .agg(sum(round(col("p"), 9).cast("decimal(28,9)")).as("s"),
        count(lit(1)).as("n"))
      .collect()
    assert(rows.length == t + d)
    val sij = new Array[JBD](t)
    val si = new Array[JBD](d)
    var n = -1L
    rows.foreach { r =>
      val pos = r.getInt(0)
      if (pos < t) sij(pos) = r.getDecimal(1) else si(pos - t) = r.getDecimal(1)
      n = r.getLong(2)
    }
    (sij, si, n)
  }

  test("cov_moment_sums is decimal-exact vs the explode formulation (fixture)") {
    val emb = graft.Tables.embeddings(spark, Sf0001)
    val (sijN, siN, nN) = SimilarityQueries.collectMomentsOf(emb)
    val d = siN.length
    assert(d === 64, "fixture dims")
    val (sijO, siO, nO) = explodeMoments(emb, d)
    assert(nN === nO)
    (0 until sijN.length).foreach { i =>
      assert(sijN(i).compareTo(sijO(i)) == 0, s"sij($i): ${sijN(i)} vs ${sijO(i)}")
    }
    (0 until d).foreach { i =>
      assert(siN(i).compareTo(siO(i)) == 0, s"si($i): ${siN(i)} vs ${siO(i)}")
    }
  }

  test("covariance at the reference default d=384 (no fixture-dim binding)") {
    // 120 synthetic rows at the reference's default sentence-transformer
    // width — the config the hard-coded CovDims=64 used to abort on
    val d = 384
    import spark.implicits._
    val df = spark.range(120).select(col("id"), hashNoise(col("id"), d).as("embedding"))
    val (sij, si, n) = SimilarityQueries.collectMomentsOf(df)
    assert(si.length === d)
    assert(n === 120L)
    val cov = SimilarityQueries.covFromMoments(sij, si, n)
    // independent plain-double two-pass reference on the driver
    val vecs = df.collect().map(_.getAs[collection.Seq[Float]]("embedding")
      .map(_.toDouble).toArray)
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / vecs.length)
    for ((i, j) <- Seq((0, 0), (0, 383), (17, 200), (383, 383))) {
      val ref = vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / vecs.length
      assert(math.abs(cov(i)(j) - ref) < 1e-5, s"cov($i,$j): ${cov(i)(j)} vs $ref")
    }
  }

  test("term9 fast path: provably-identical-or-fallback across boundary grids") {
    val buf = new CovMomentsBuffer
    def check(p: Double): Boolean = {
      val f = buf.term9FastOr(p)
      if (f != CovMomentsBuffer.NoFast) {
        val slow = buf.term9(p)
        assert(slow !== null, s"fast path fired on a NULL term: $p")
        assert(java.math.BigInteger.valueOf(f) === slow,
          s"fast path diverged at p=$p: fast=$f slow=$slow")
        true
      } else false
    }
    // adversarial grid: exact decimal halves (HALF_UP's away-from-zero tie
    // must never take the fast path wrong), their ±1-ulp neighbors, tiny
    // magnitudes, negatives, the classic shortest-string values, and the
    // >2^20 band where the 9-decimal round-trip through double stops being
    // faithful (must fall back or agree)
    val halves = (-2000 to 2000).map(k => k * 0.5e-9) ++
      Seq(1.5e-9, 2.5e-9, -1.5e-9, 0.5, 1.5, -2.5, 12345.0000000005)
    val neighbors = halves.flatMap(h => Seq(math.nextUp(h), math.nextDown(h)))
    val classics = Seq(0.1, 0.3, 0.7, -0.1, 1.0 / 3.0, math.Pi, -math.E,
      1e-30, -1e-30, 4.9e-324, 0.0, -0.0)
    val big = Seq(1048575.9, 1048576.0, 2e6, 1e9, 1e15, -3e7)
    (halves ++ neighbors ++ classics ++ big).foreach(check)
    assert(!check(Double.NaN) && !check(Double.PositiveInfinity) &&
      !check(Double.NegativeInfinity), "non-finite terms must fall back")
    // deterministic pseudo-random sweep in the embedding regime, plus the
    // coverage claim: the fast path actually fires there (the speedup is
    // real, not a fallback in disguise)
    val rnd = new scala.util.Random(20260815L)
    val hits = (1 to 200000).count { _ =>
      val x = (rnd.nextFloat() - 0.5f) * 20.0f
      val y = (rnd.nextFloat() - 0.5f) * 20.0f
      check(x.toDouble * y.toDouble)
    }
    assert(hits > 199000, s"fast path fired only $hits/200000 in the embedding regime")
  }

  test("buffer: long fast path escalates to BigInteger exactly on overflow") {
    // 4e9 · 1.0 slots would overflow scale-9 longs (2⁶³/10⁹ ≈ 9.2e9) — use
    // few huge terms instead: 1e30f² = 1e60 products, unscaled 1e69
    val big = new CovMomentsBuffer
    big.addRow(Array(1e30f, 0.0f))
    big.addRow(Array(1e30f, 0.0f))
    val totals = big.totals
    // product slot (0,0): 2 · round((1e30f)², 9) — (1e30f)² ≈ 1.0000000200408775e60
    val p = 1e30f.toDouble * 1e30f.toDouble
    val one = JBD.valueOf(JBD.valueOf(p).setScale(9, java.math.RoundingMode.HALF_UP)
      .doubleValue).setScale(9, java.math.RoundingMode.HALF_UP).unscaledValue()
    assert(totals(0) === one.add(one))
    // long-boundary crossing: accumulate 9.2e18-unscaled slots via merges
    val nearMax = new CovMomentsBuffer
    (1 to 3).foreach(_ => nearMax.addRow(Array(2e9f))) // (2e9)² = 4e18, ×3 overflows
    val expect = {
      val q = 2e9f.toDouble * 2e9f.toDouble
      val u = JBD.valueOf(JBD.valueOf(q).setScale(9, java.math.RoundingMode.HALF_UP)
        .doubleValue).setScale(9, java.math.RoundingMode.HALF_UP).unscaledValue()
      u.multiply(java.math.BigInteger.valueOf(3))
    }
    assert(nearMax.totals(0) === expect)
    assert(expect.bitLength > 63, "the test actually crossed the long boundary")
  }

  test("buffer: serialize/deserialize round-trips, merge is exact") {
    val a = new CovMomentsBuffer
    val b = new CovMomentsBuffer
    a.addRow(Array(1.25f, -3.5f, 2e9f))
    a.addRow(Array(0.5f, 1e30f, -0.125f))
    b.addRow(Array(-7.0f, 2.5f, 1e30f))
    val ser = CovMomentsBuffer.fromBytes(a.toBytes)
    assert(ser.totals.zip(a.totals).forall { case (x, y) => x == y })
    assert(ser.rows === a.rows && ser.dims === a.dims)
    val merged = CovMomentsBuffer.fromBytes(a.toBytes)
    merged.mergeFrom(b)
    val all = new CovMomentsBuffer
    all.addRow(Array(1.25f, -3.5f, 2e9f))
    all.addRow(Array(0.5f, 1e30f, -0.125f))
    all.addRow(Array(-7.0f, 2.5f, 1e30f))
    assert(merged.totals.zip(all.totals).forall { case (x, y) => x == y })
    assert(merged.rows === 3L)
  }

  test("ragged dims fail loud") {
    import spark.implicits._
    val mixed = Seq(Array(1.0f), Array(1.0f, 2.0f)).toDF("embedding")
    val err = intercept[Exception] {
      mixed.agg(cov_moment_sums(col("embedding"))).collect()
    }
    assert(err.getMessage != null)
  }

  test("pca_project at d=384: planted direction still found") {
    val d = 384
    import spark.implicits._
    val rows = (0 until 60).map { i =>
      val v = Array.tabulate(d)(j =>
        if (j == 7) (if (i % 2 == 0) 10.0f else -10.0f)
        else ((i * 31 + j * 17) % 13 - 6) / 100.0f)
      (i.toLong, v)
    }
    val dir = graft.util.TempDirs.create("graft_pca384").toString
    rows.toDF("vec_id", "embedding").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SimilarityQueries.pcaProject(spark, dir).collect()
    val byId = out.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val even = (0 until 60 by 2).map(i => byId(i.toLong))
    val odd = (1 until 60 by 2).map(i => byId(i.toLong))
    assert(even.forall(x => math.signum(x) == math.signum(even.head)))
    assert(odd.forall(x => math.signum(x) == math.signum(odd.head)))
    assert(math.signum(even.head) == -math.signum(odd.head))
    assert(math.abs(even.head - odd.head) > 15.0)
  }
}
