package graft.operators

import graft.SparkSpec

class StarSchemaQueriesSpec extends SparkSpec {

  test("event_type_pagerank replays the 2-iteration rank arithmetic on a hand graph") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // user 1: v c v c → edges v→c:2, c→v:1; user 2: v p → v→p:1
    val dir = graft.util.TempDirs.create("graft_pr").toString
    Seq((1L, 1L, "v"), (2L, 1L, "c"), (3L, 1L, "v"), (4L, 1L, "c"),
      (5L, 2L, "v"), (6L, 2L, "p"))
      .toDF("event_id", "user_id", "event_type")
      .withColumn("ts", col("event_id") * 1000000000L) // nanos long
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StarSchemaQueries.eventTypePagerank(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // driver replay with the operator's exact arithmetic
    val edges = Seq(("v", "c", 2L), ("c", "v", 1L), ("v", "p", 1L))
    val outw = Map("v" -> 3.0, "c" -> 1.0)
    val n = 3.0
    def round9(x: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(x).setScale(9, java.math.RoundingMode.HALF_UP)
    def step(p: Map[String, Double]): Map[String, Double] = {
      val s = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.foldLeft(java.math.BigDecimal.ZERO) { case (acc, (src, _, w)) =>
          acc.add(round9(p(src) * w / outw(src)))
        }.doubleValue
      }
      p.keys.map(k => k ->
        ((1.0 - StarSchemaQueries.PrDamping) / n +
          StarSchemaQueries.PrDamping * s.getOrElse(k, 0.0))).toMap
    }
    val p0 = Map("v" -> 1.0 / n, "c" -> 1.0 / n, "p" -> 1.0 / n)
    val expected = step(step(p0))
    assert(got === expected)
    // flow concentrates where links point: c (fed twice per v-loop)
    // outranks p (single dangling hop)
    assert(got("c") > got("p"))
  }

  test("events_hourly_anomaly: flagged hours deviate ≥ z from their type's own mean") {
    import org.apache.spark.sql.functions._
    val rows = StarSchemaQueries.eventsHourlyAnomaly(spark, Sf0001).collect()
    assert(rows.nonEmpty, "fixture should contain hourly volume spikes")
    assert(rows.forall(r => math.abs(r.getAs[Double]("z")) >= StarSchemaQueries.AnomalyZ))
    // direction sanity against independently computed DENSE-span means:
    // total events / span hours, derived straight from the raw table
    val means = graft.Tables.events(spark, Sf0001)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type").agg(
        (sum(col("n")).cast("double") /
          ((unix_timestamp(max(col("h"))) - unix_timestamp(min(col("h")))) / 3600L + 1L))
          .as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val above = r.getAs[Long]("n").toDouble > means(r.getAs[String]("event_type"))
      assert((r.getAs[Double]("z") > 0) === above,
        s"z sign must match deviation direction: $r")
    }
  }

  test("events_daily_ma: warm-up frames average what exists; steady frames average 7 days") {
    import org.apache.spark.sql.functions._
    val rows = StarSchemaQueries.eventsDailyMa(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[String]("day"))
      // hand-roll the rolling mean per type and compare
      sorted.zipWithIndex.foreach { case (r, i) =>
        val frame = sorted.slice(math.max(0, i - 6), i + 1).map(_.getAs[Long]("n"))
        val expect = frame.sum.toDouble / frame.length
        assert(r.getAs[Double]("ma7") === expect, s"row $r expected $expect")
      }
    }
  }

  test("q1_agg: 6 flag/status groups with exact decimal sums") {
    val rows = StarSchemaQueries.q1Agg(spark, Sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    assert(rows.forall(_.getAs[Long]("count_order") > 0))
    // exact-decimal invariant: sum_qty is a whole number scaled at .00
    assert(rows.forall(r => (r.getAs[Double]("sum_qty") * 100) % 1 == 0.0))
  }

  test("q3/q5/top_customers join queries return bounded deterministic results") {
    val q3 = StarSchemaQueries.q3TopOrders(spark, Sf0001).collect()
    assert(q3.length <= 10)
    val q5 = StarSchemaQueries.q5NationRevenue(spark, Sf0001).collect()
    assert(q5.nonEmpty && q5.length <= 25)
    val tc = StarSchemaQueries.topCustomers(spark, Sf0001).collect()
    assert(tc.length === 10)
    val spends = tc.map(_.getAs[Double]("spend"))
    assert(spends.zip(spends.tail).forall { case (a, b) => a >= b })
  }

  test("events window caps at 3 rows per user, ordered") {
    val rows = StarSchemaQueries.eventsTopPerUser(spark, Sf0001).collect()
    val perUser = rows.groupBy(_.getAs[Long]("user_id"))
    assert(perUser.values.forall(_.length <= 3))
    assert(rows.forall(_.getAs[Long]("rn") <= 3))
  }

  test("hourly/props/brand rollups + semi/anti joins run") {
    assert(StarSchemaQueries.eventsHourly(spark, Sf0001).count() > 0)
    val props = StarSchemaQueries.eventsPropsAgg(spark, Sf0001).collect()
    assert(props.length === 5) // 5 event types
    assert(props.forall(!_.isNullAt(1))) // JSON k extracted everywhere
    assert(StarSchemaQueries.partsByBrand(spark, Sf0001).count() > 0)
    val anti = StarSchemaQueries.customersNoOrders(spark, Sf0001).count()
    val semi = StarSchemaQueries.ordersSemiHighValue(spark, Sf0001).count()
    assert(anti >= 0 && semi >= 0)
  }

  test("fact-dim joins broadcast the dimension side (scale audit)") {
    val plan = StarSchemaQueries.q5NationRevenue(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast dim joins:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("approx_percentile tracks the exact per-group percentiles within 2%") {
    import org.apache.spark.sql.functions._
    // the billion-row path for events_value_quantiles: a bounded-memory
    // mergeable sketch per group instead of percentile()'s exact
    // per-group value buffer (no DuckDB twin → error-bound gate)
    val exact = StarSchemaQueries.eventsValueQuantiles(spark, Sf001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val approx = graft.Tables.events(spark, Sf001)
      .groupBy("event_type")
      .agg(expr("approx_percentile(value, array(0.5D, 0.9D, 0.99D), 10000)").as("q"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[collection.Seq[Double]]("q")).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, (p50, p90, p99)) =>
      val a = approx(k)
      // exact percentile() interpolates; the sketch returns an observed
      // sample — sparse tails legitimately differ more than the body
      Seq((p50, a(0), 0.02), (p90, a(1), 0.02), (p99, a(2), 0.05)).foreach {
        case (e, g, tol) =>
          assert(math.abs(g - e) / math.max(math.abs(e), 1e-9) <= tol,
            s"$k: exact $e vs approx $g (tol $tol)")
      }
    }
  }

  test("events_quartile_stats_approx tracks the exact quartile rollup within 5%") {
    val exact = StarSchemaQueries.eventsQuartileStats(spark, Sf001).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val approxDf = StarSchemaQueries.eventsQuartileStatsApprox(spark, Sf001)
    // scale-shape audit: the approx path must have NO window/sort funnel
    val plan = approxDf.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec") && !plan.contains("Window"),
      s"approx quartiles must not materialize a total order:\n$plan")
    val approx = approxDf.collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(approx.keySet === exact.keySet, "all (event_type, quartile) groups present")
    exact.foreach { case (k, (n, lo, hi)) =>
      val (an, alo, ahi) = approx(k)
      // sketch cut points shift a few boundary rows between quartiles
      assert(math.abs(an - n).toDouble / n <= 0.05,
        s"$k: exact n=$n vs approx n=$an")
      // boundary values move by at most the cut-point error
      assert(math.abs(alo - lo) / math.max(math.abs(lo), 1e-9) <= 0.05, s"$k lo: $lo vs $alo")
      assert(math.abs(ahi - hi) / math.max(math.abs(hi), 1e-9) <= 0.05, s"$k hi: $hi vs $ahi")
    }
  }

  test("events_distinct_users_approx (HLL++) tracks the exact twin within 5%") {
    val exact = StarSchemaQueries.eventsDistinctUsers(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // the 100 TB path: a fixed-size mergeable sketch per group instead of
    // the exact distinct's expand+two-phase agg (no oracle — HLL++ has no
    // DuckDB twin; this error-bound gate is its correctness contract)
    val approx = StarSchemaQueries.eventsDistinctUsersApprox(spark, Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, (n, nEvents)) =>
      val (a, aEvents) = approx(k)
      assert(aEvents === nEvents, "row counts are exact either way")
      // rsd=2% sketch: gate at 5% (≥2 sigma)
      assert(math.abs(a - n).toDouble / n <= 0.05, s"$k: exact $n vs approx $a")
    }
  }
}
