package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property suite over the driver-side compute kernels (the same
  * code the expressions' interpreted eval path runs) — SURVEY.md §5's
  * property list at generator scale, without a Spark job per case. */
class VectorPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop, name: String): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: $r")
  }

  private val vecGen: Gen[Array[Float]] = for {
    n <- Gen.choose(1, 128)
    v <- Gen.containerOfN[Array, Float](n, Gen.choose(-100f, 100f))
    if v.exists(x => math.abs(x) > 1e-3)
  } yield v

  private def cosDist(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
    }
    1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("tri_products: row-major upper triangle, exact float products, length d(d+1)/2") {
    val p = Prop.forAll(vecGen) { v =>
      val out = TriProducts.build(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(v)).toDoubleArray()
      val d = v.length
      var ok = out.length == d * (d + 1) / 2
      var idx = 0
      for (i <- 0 until d; j <- i until d) {
        // float products are exact in double — require bit equality
        ok = ok && out(idx) == v(i).toDouble * v(j).toDouble
        idx += 1
      }
      ok
    }
    check(p, "tri_products")
  }

  test("jacobi eigen: reconstructs a hand-built symmetric matrix") {
    // A = Q diag(5, 2, -1) Qᵀ for a known rotation Q
    val q = Array(
      Array(math.sqrt(0.5), -math.sqrt(0.5), 0.0),
      Array(math.sqrt(0.5), math.sqrt(0.5), 0.0),
      Array(0.0, 0.0, 1.0))
    val lam = Array(5.0, 2.0, -1.0)
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => q(i)(k) * lam(k) * q(j)(k)).sum)
    val (vals, vecs) = graft.util.JacobiEigen.decompose(a)
    assert(vals.zip(Seq(5.0, 2.0, -1.0)).forall { case (x, y) => math.abs(x - y) < 1e-10 })
    for (k <- 0 until 3) {
      // eigenvector matches ±column k of Q (sign-normalized by the solver)
      val qk = Array.tabulate(3)(i => q(i)(k))
      val dot = math.abs(qk.zip(vecs(k)).map { case (x, y) => x * y }.sum)
      assert(math.abs(dot - 1.0) < 1e-10, s"eigvec $k: ${vecs(k).toSeq}")
    }
  }

  test("cosine distance: symmetry, range [0,2], self-distance ~ 0") {
    check(Prop.forAll(vecGen, vecGen) { (x, y) =>
      val n = math.min(x.length, y.length)
      val (a, b) = (x.take(n), y.take(n))
      (!a.exists(v => math.abs(v) > 1e-3) || !b.exists(v => math.abs(v) > 1e-3)) || {
        val d = cosDist(a, b)
        cosDist(a, b) == cosDist(b, a) &&
          d >= -1e-9 && d <= 2.0 + 1e-9 &&
          math.abs(cosDist(a, a)) < 1e-9
      }
    }, "cosine")
  }

  test("cosine distance is scale-invariant in either argument") {
    val scaleGen = Gen.choose(0.01f, 100f)
    check(Prop.forAll(vecGen, scaleGen) { (x, s) =>
      val scaled = x.map(_ * s)
      math.abs(cosDist(x, scaled)) < 1e-6
    }, "scale-invariance")
  }

  test("hash embedding: deterministic, unit norm, dim-exact, token-order sensitive") {
    val textGen = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)).map(_.mkString(" "))
    check(Prop.forAll(textGen, Gen.choose(4, 256)) { (t, dim) =>
      val v1 = HashEmbed.embedToFloats(t, dim)
      val v2 = HashEmbed.embedToFloats(t, dim)
      val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
      // signed feature hashing can cancel exactly → zero vector is legal
      val normOk = math.abs(norm - 1.0) < 1e-4 || norm == 0.0
      v1.toSeq == v2.toSeq && v1.length == dim && normOk
    }, "hash-embed")
  }

  test("shingle count: |distinct 3-shingles| <= max(0, n-2)") {
    val tokGen = Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "ee"))
    check(Prop.forAll(tokGen) { toks =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.unsafe.types.UTF8String
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t): AnyRef).toArray)
      val out = Shingles.build(arr, 3)
      out.numElements() <= math.max(0, toks.length - 2)
    }, "shingles")
  }
}
