package graft.util

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("salted join is row-identical to the plain equi-join (incl. skewed keys)") {
    val li = graft.Tables.lineitem(spark, Sf0001).select("l_orderkey", "l_quantity")
    val ord = graft.Tables.orders(spark, Sf0001).select(
      col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(ord, Seq("l_orderkey"))
      .agg(count(lit(1)), sum("l_quantity"), sum("o_totalprice")).head()
    val salted = Skew.saltedEquiJoin(li, ord, "l_orderkey", salt = 8)
      .agg(count(lit(1)), sum("l_quantity"), sum("o_totalprice")).head()
    assert(salted.getLong(0) === plain.getLong(0))
    assert(math.abs(salted.getDouble(1) - plain.getDouble(1)) < 1e-6)
    assert(math.abs(salted.getDouble(2) - plain.getDouble(2)) < 1e-6)
  }

  test("left join preserves unmatched big-side rows under salting") {
    import spark.implicits._
    val big = Seq((1, "a"), (1, "b"), (2, "c"), (99, "zz")).toDF("k", "v")
    val small = Seq((1, "x"), (2, "y")).toDF("k", "w")
    val out = Skew.saltedEquiJoin(big, small, "k", salt = 4, joinType = "left")
    assert(out.count() === 4)
    assert(out.filter(col("k") === 99 && col("w").isNull).count() === 1)
  }

  test("keySkewProfile surfaces heavy hitters in order") {
    import spark.implicits._
    val df = (Seq.fill(50)(7) ++ Seq.fill(10)(3) ++ (100 to 120)).toDF("k")
    val prof = Skew.keySkewProfile(df, "k", 2).collect()
    assert(prof(0).getInt(0) === 7 && prof(0).getLong(1) === 50L)
    assert(prof(1).getInt(0) === 3 && prof(1).getLong(1) === 10L)
  }
}
