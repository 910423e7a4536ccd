package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The session-tuning surface added for the scale fixes: statement-scoped
  * conf overrides ([[withSqlConf]]), the AQE initial-partition default
  * ([[tuneSession]]), and the single-live checkpoint registry
  * ([[graft.util.CheckpointOps]]). */
class SessionTuningSpec extends SparkSpec {

  test("withSqlConf applies for the body and restores prior values") {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val before = spark.conf.get(key) // tuneSession already raised it
    val seen = withSqlConf(spark, key -> "128") { spark.conf.get(key) }
    assert(seen === "128")
    assert(spark.conf.get(key) === before)
  }

  test("withSqlConf restores on exception and unsets keys that were unset") {
    val key = "spark.sql.graft.test.ephemeral"
    assert(spark.conf.getOption(key).isEmpty)
    intercept[RuntimeException] {
      withSqlConf(spark, key -> "x") { throw new RuntimeException("boom") }
    }
    assert(spark.conf.getOption(key).isEmpty, "unset key must be unset again")
  }

  test("tuneSession leaves the AQE initial partition count to its statement scopes") {
    // the r13 session-wide raise measurably taxed small-shuffle scale
    // queries (AbInitParts: co-probe family 12-40% slower at 300x data),
    // so the wide start is now scoped inside the operators that need it
    // (dedupNgramCapped's postings build) — the session must NOT carry it
    val key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    assert(spark.conf.getOption(key).isEmpty,
      "tuneSession must not set a session-wide initialPartitionNum")
    tuneSession(spark)
    assert(spark.conf.getOption(key).isEmpty, "re-tune must not add it")
    assert(InitialShufflePartitionsFor(1000) === 8192, "cap applies")
    assert(InitialShufflePartitionsFor(32) === 512, "16x width")
  }

  test("pairAggPartitions scales with the exact pair count") {
    import graft.operators.Dedup
    assert(Dedup.pairAggPartitions(0L, 32) === 32, "floor at session width")
    assert(Dedup.pairAggPartitions(336L * 1000 * 1000, 32) === 168,
      "~2M pair rows per partition")
    assert(Dedup.pairAggPartitions(Long.MaxValue / 4, 32) === 8192, "cap")
  }

  test("CheckpointOps.trackSingleLive frees the previous checkpoint's blocks") {
    import graft.util.CheckpointOps
    def ck() = spark.range(1000).toDF("id").localCheckpoint()
    def rddOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.head
    val first = CheckpointOps.trackSingleLive("spec:ck", ck())
    val firstRdd = rddOf(first)
    assert(first.count() === 1000L)
    assert(firstRdd.getStorageLevel.useMemory || firstRdd.getStorageLevel.useDisk)
    val second = CheckpointOps.trackSingleLive("spec:ck", ck())
    assert(second.count() === 1000L)
    // the first frame's blocks are scheduled for removal (non-blocking
    // unpersist -> storage level reset is immediate on the RDD handle)
    assert(firstRdd.getStorageLevel ===
      org.apache.spark.storage.StorageLevel.NONE)
    // re-registering the SAME frame must not free it
    val again = CheckpointOps.trackSingleLive("spec:ck", second)
    assert(rddOf(again).getStorageLevel !==
      org.apache.spark.storage.StorageLevel.NONE)
    assert(again.count() === 1000L)
  }

  test("trackSingleLive honors the singleLiveCheckpoints=false opt-out") {
    import graft.util.CheckpointOps
    def ck() = spark.range(1000).toDF("id").localCheckpoint()
    def rddOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.head
    val first = CheckpointOps.trackSingleLive("spec:optout", ck())
    val firstRdd = rddOf(first)
    assert(first.count() === 1000L)
    spark.conf.set("spark.graft.singleLiveCheckpoints", "false")
    try {
      val second = CheckpointOps.trackSingleLive("spec:optout", ck())
      assert(second.count() === 1000L)
      // opt-out: the earlier frame's blocks stay resident (caller-owned)
      assert(firstRdd.getStorageLevel !==
        org.apache.spark.storage.StorageLevel.NONE)
      assert(first.count() === 1000L, "stale frame still executable")
    } finally spark.conf.unset("spark.graft.singleLiveCheckpoints")
  }

  test("dedupNgramCapped re-invocation keeps exactly one live postings checkpoint") {
    import graft.operators.Dedup
    val r1 = Dedup.dedupNgramCapped(spark, Sf0001)
    val n1 = r1.count()
    val r2 = Dedup.dedupNgramCapped(spark, Sf0001)
    assert(r2.count() === n1, "same corpus, same pairs")
    // scoped threshold restored after the eager postings build
    assert(spark.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold") ===
      ObjectHashFallbackKeys.toString)
  }
}
