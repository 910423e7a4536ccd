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

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true)") {
    // one hot key owning ~90% of a 400k-row side: the shape where a static
    // plan funnels the key into one straggler task and AQE's skew-join
    // splits it. Thresholds lowered so local data sizes qualify.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val big = spark.range(400000).select(
        when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
        concat(lit("payload-"), col("id")).as("v"))
      val right = spark.range(5000).select(col("id").as("k"), col("id").as("w"))
      val joined = big.join(right, "k")
      // execute THIS DataFrame's plan (count() would build a separate
      // QueryExecution and leave this one unadapted)
      val n = joined.queryExecution.toRdd.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the skewed join for runtime splitting:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("keySkewProfile surfaces heavy hitters in order") {
    import spark.implicits._
    val df = (Seq.fill(50)(7) ++ Seq.fill(10)(3) ++ (100 to 120)).toDF("k")
    val prof = Skew.keySkewProfile(df, "k", 2).collect()
    assert(prof(0).getInt(0) === 7 && prof(0).getLong(1) === 50L)
    assert(prof(1).getInt(0) === 3 && prof(1).getLong(1) === 10L)
  }
}
