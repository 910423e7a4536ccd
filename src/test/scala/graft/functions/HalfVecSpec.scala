package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{ReferenceQueries, SimilarityQueries}

class HalfVecSpec extends SparkSpec {
  import spark.implicits._

  test("exhaustive: every binary16 pattern round-trips fromHalf→toHalf") {
    var h = 0
    var checked = 0
    while (h <= 0xffff) {
      val s = h.toShort
      val f = HalfFloat.fromHalf(s)
      if (!java.lang.Float.isNaN(f)) {
        assert(HalfFloat.toHalf(f) === s,
          f"bits 0x$h%04x → $f → 0x${HalfFloat.toHalf(f) & 0xffff}%04x")
        checked += 1
      } else {
        // NaNs canonicalize but must stay NaN
        assert((HalfFloat.toHalf(f) & 0x7c00) === 0x7c00)
        assert((HalfFloat.toHalf(f) & 0x3ff) !== 0)
      }
      h += 1
    }
    assert(checked === 65536 - 2 * 1023, "all non-NaN patterns exact")
  }

  test("toHalf rounds to nearest even within half-precision error bounds") {
    val rnd = new scala.util.Random(42)
    (1 to 20000).foreach { _ =>
      val f = (rnd.nextFloat() - 0.5f) * 4.0f
      val back = HalfFloat.fromHalf(HalfFloat.toHalf(f))
      // normal range: relative error ≤ 2^-11
      if (math.abs(f) > 6.1e-5f) {
        assert(math.abs(back - f) <= math.abs(f) * (1.0f / 2048) + 1e-12f,
          s"$f → $back")
      }
    }
    // known values
    assert(HalfFloat.fromHalf(HalfFloat.toHalf(1.0f)) === 1.0f)
    assert(HalfFloat.fromHalf(HalfFloat.toHalf(-2.5f)) === -2.5f)
    assert(HalfFloat.fromHalf(HalfFloat.toHalf(65504.0f)) === 65504.0f) // half max
    assert(HalfFloat.toHalf(1e6f) === HalfFloat.toHalf(Float.PositiveInfinity))
    assert(HalfFloat.fromHalf(HalfFloat.toHalf(1e-10f)) === 0.0f) // underflow
  }

  test("half_pack/half_unpack column round-trip; distance equals dense on unpacked") {
    val e = graft.Tables.embeddings(spark, Sf0001)
    val packed = e.select(col("vec_id"), half_pack(col("embedding")).as("hv"))
    val q = packed.filter(col("vec_id") === 0).select(col("hv").as("qv"))
    val rows = packed.crossJoin(broadcast(q))
      .select(
        half_cosine_distance(col("hv"), col("qv")).as("half_dist"),
        cosine_distance(half_unpack(col("hv")), half_unpack(col("qv"))).as("dense_dist"),
        (length(col("hv")) * 2).as("packed_bits"))
      .collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0))
        === java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
    // 2 bytes per element: 64-dim → 128-byte packed vector
    val len = packed.select(length(col("hv"))).head().getInt(0)
    assert(len === 128)
  }

  test("halfvec_knn: self rank 1, recall@10 vs exact float32 is high") {
    val exact = ReferenceQueries.knnTopK(spark, Sf0001, 10)
      .collect().map(_.getLong(0)).toSet
    val rows = SimilarityQueries.halfKnnTopK(spark, Sf0001).collect()
    assert(rows.head.getLong(0) === 0L)
    assert(math.abs(rows.head.getDouble(1)) < 1e-12)
    val recall = rows.map(_.getLong(0)).toSet.intersect(exact).size / 10.0
    assert(recall >= 0.9, s"half-precision recall@10 was $recall")
  }
}
