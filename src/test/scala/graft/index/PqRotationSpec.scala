package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** OPQ-style rotation: orthogonality of the generated basis, cosine
  * preservation, and the recall win it exists for — a corpus whose energy
  * concentrates in one subspace (the unrotated codebooks then quantize
  * noise in 15 of 16 subspaces). */
class PqRotationSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = graft.util.TempDirs.create(p).resolve("d").toString

  test("rotationMatrix is orthonormal; rotation preserves dot products") {
    val dim = 32
    val r = PqIndex.rotationMatrix(dim, seed = 7L)
    // R · Rᵀ = I
    for (i <- 0 until dim; j <- 0 until dim) {
      val d = (0 until dim).map(k => r(i)(k) * r(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-10, s"RRᵀ[$i][$j] = $d")
    }
    val rnd = new scala.util.Random(3)
    val a = Array.fill(dim)(rnd.nextGaussian())
    val b = Array.fill(dim)(rnd.nextGaussian())
    val ra = PqIndex.applyRotation(r, a)
    val rb = PqIndex.applyRotation(r, b)
    def dot(x: Array[Double], y: Array[Double]) = x.zip(y).map { case (p, q) => p * q }.sum
    assert(math.abs(dot(ra, rb) - dot(a, b)) < 1e-9)
  }

  /** Energy-concentrated corpus: signal lives in dims [0, 4), the rest is
    * small noise — every unrotated subspace except the first quantizes
    * near-zeros. 64 dims, m=16 → 4-dim subspaces. */
  private lazy val concentrated = {
    val dim = 64
    spark.range(2000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        when(d < 4,
          (pmod(xxhash64(concat(col("id"), lit("_s"), d)), lit(2001)) - 1000) / 100.0)
          .otherwise(
            (pmod(xxhash64(concat(col("id"), lit("_n"), d)), lit(2001)) - 1000) / 100000.0)
          .cast("float")).as("embedding"))
      .persist()
  }

  private def recallAt10(indexPath: String): Double = {
    import graft.functions.{cosine_distance, vector_lit}
    val qs = concentrated.filter(col("vec_id") < 5).collect()
      .map(r => (r.getLong(0), r.getAs[collection.Seq[Float]](1).toArray))
    qs.map { case (_, q) =>
      val exact = concentrated
        .select(col("vec_id"), cosine_distance(col("embedding"), vector_lit(q)).as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
      val got = PqIndex.search(spark, indexPath, q, 10)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(got).size / 10.0
    }.sum / qs.length
  }

  test("rotation recovers recall on an energy-concentrated corpus") {
    val plain = tmp("pq_plain"); val rotated = tmp("pq_rot")
    PqIndex.build(concentrated, plain, m = 16, codes = 32)
    PqIndex.build(concentrated, rotated, m = 16, codes = 32, rotate = true)
    val rPlain = recallAt10(plain)
    val rRot = recallAt10(rotated)
    info(f"recall@10: unrotated $rPlain%.2f, rotated $rRot%.2f")
    assert(rRot >= rPlain,
      s"rotation must not lose recall on concentrated energy: $rRot < $rPlain")
    assert(rRot >= 0.5, s"rotated recall too low: $rRot")
  }

  test("non-rotated rebuild over a rotated index clears the stale sidecar") {
    val p = tmp("pq_stale")
    PqIndex.build(concentrated, p, m = 16, codes = 32, rotate = true)
    assert(new java.io.File(s"$p/rotation").exists())
    PqIndex.build(concentrated, p, m = 16, codes = 32)
    assert(!new java.io.File(s"$p/rotation").exists(),
      "stale rotation sidecar would silently rotate queries against unrotated codes")
  }

  test("IVF-PQ rotated build: probe stays pruned and matches plain recall or better") {
    val plain = tmp("ivfpq_plain"); val rotated = tmp("ivfpq_rot")
    IvfPqIndex.build(concentrated, plain, lists = 8, m = 16, codes = 32)
    IvfPqIndex.build(concentrated, rotated, lists = 8, m = 16, codes = 32, rotate = true)
    import graft.functions.{cosine_distance, vector_lit}
    val qs = concentrated.filter(col("vec_id") < 5).collect()
      .map(r => (r.getLong(0), r.getAs[collection.Seq[Float]](1).toArray))
    def recall(path: String): Double = qs.map { case (_, q) =>
      val exact = concentrated
        .select(col("vec_id"), cosine_distance(col("embedding"), vector_lit(q)).as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
      val got = IvfPqIndex.probeRerank(spark, path, concentrated, q, 10,
        overfetch = 4, nprobe = 8)
        .collect().map(_.getLong(0)).toSet
      exact.intersect(got).size / 10.0
    }.sum / qs.length
    val rPlain = recall(plain); val rRot = recall(rotated)
    info(f"IVFPQ rerank recall@10: unrotated $rPlain%.2f, rotated $rRot%.2f")
    assert(rRot >= rPlain - 0.05,
      s"rotation must not materially lose reranked recall: $rRot vs $rPlain")
  }
}
