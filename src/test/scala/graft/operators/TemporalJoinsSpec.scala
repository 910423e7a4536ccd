package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin picks the latest right row at-or-before each left ts, per key") {
    val left = Seq(
      (1L, 10L, 100L), (1L, 20L, 101L), (1L, 35L, 102L),
      (2L, 5L, 200L), (3L, 50L, 300L))
      .toDF("k", "t", "lid")
    val right = Seq(
      (1L, 10L, 1.0, 900L), (1L, 30L, 2.0, 901L),
      (2L, 6L, 9.0, 902L)) // after left's only row for k=2
      .toDF("k", "t", "v", "rid")
    val out = TemporalJoins.asOfJoin(left, right, "k", "t", Seq("v"), "rid")
      .orderBy("lid")
      .select("lid", "asof_v").as[(Long, Option[Double])].collect()
    assert(out === Array(
      100L -> Some(1.0),  // t=10 matches right t=10 (inclusive)
      101L -> Some(1.0),  // t=20: latest right is t=10
      102L -> Some(2.0),  // t=35: latest right is t=30
      200L -> None,       // right row is later
      300L -> None))      // no right rows for key
  }

  test("asOfJoin resolves same-ts right duplicates to the largest tie id") {
    val left = Seq((1L, 10L, 1L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 5.0, 900L), (1L, 10L, 7.0, 901L)).toDF("k", "t", "v", "rid")
    val out = TemporalJoins.asOfJoin(left, right, "k", "t", Seq("v"), "rid")
      .select("asof_v").as[Double].collect()
    assert(out === Array(7.0))
  }

  test("as-of query plan contains NO join node (union + window shape)") {
    val plan = TemporalJoins.eventsAsOfJoin(spark, Sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected join-free plan, got:\n$plan")
    assert(plan.contains("Window"))
  }

  test("range-count joins hash-partitioned on (user, band) — never nested-loop") {
    val df = TemporalJoins.eventsRangeCount(spark, Sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banded range join must stay an equi-join, got:\n$plan")
    // brute-force reference on the same data
    val ev = graft.Tables.eventsUs(spark, Sf001)
    val l = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id").as("lu"), col("ts_us").as("lt"))
    val brute = l.join(ev.select(col("user_id").as("ru"), col("ts_us").as("rt")),
        col("lu") === col("ru") &&
          col("rt") > col("lt") && col("rt") <= col("lt") + TemporalJoins.RangeWindowUs,
        "left")
      .groupBy("event_id").agg(count(col("rt")).as("n_follow"))
    val got = df.select("event_id", "n_follow").as[(Long, Long)].collect().toMap
    val want = brute.as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("tfidf top terms: ranks 1..k per doc, scores non-increasing") {
    val out = TextAnalysis.tfidfTopTerms(spark, Sf001)
      .select("doc_id", "rank", "tfidf").as[(Long, Long, Double)].collect()
    val byDoc = out.groupBy(_._1)
    assert(byDoc.forall { case (_, rows) =>
      rows.map(_._2).sorted.sameElements(1L to rows.length) &&
        rows.sortBy(_._2).map(_._3).sliding(2).forall {
          case Array(a, b) => a >= b
          case _ => true
        }
    })
  }
}
