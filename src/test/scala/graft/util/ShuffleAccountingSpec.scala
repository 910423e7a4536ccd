package graft.util

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bench mains' shuffle-byte evidence is only as good as the counter:
  * pin that a shuffling plan registers bytes, a map-only plan registers
  * none, and consecutive snapshots isolate per-query deltas. */
class ShuffleAccountingSpec extends SparkSpec {

  test("snapshot deltas isolate shuffled bytes per query") {
    val acc = new ShuffleAccounting(spark.sparkContext)
    val base = acc.snapshot()

    // scan → filter → count: the only exchange is count()'s own
    // partial-count collection — one tiny row per partition, metadata
    // bytes, not data bytes (this is why 0.00-MB bench rows are real)
    spark.range(100000).filter(col("id") % 7 === 0).count()
    val afterMapOnly = acc.snapshot()
    val mapOnlyDelta = afterMapOnly - base
    assert(mapOnlyDelta < 4096L,
      s"a map-only plan must register only per-partition count metadata, got $mapOnlyDelta bytes")

    // groupBy forces a keyed exchange: data-sized bytes must land, and a
    // second identical run must land in ITS OWN delta, not bleed backwards
    spark.range(100000).groupBy(col("id") % 1000).count().count()
    val afterAgg = acc.snapshot()
    val d1 = afterAgg - afterMapOnly
    assert(d1 > mapOnlyDelta * 4,
      s"a groupBy plan must shuffle data-sized bytes, got $d1 (scan baseline $mapOnlyDelta)")

    spark.range(100000).groupBy(col("id") % 1000).count().count()
    val d2 = acc.snapshot() - afterAgg
    assert(d2 > 0L)
    // same plan, same data → same bytes (the drift-immunity claim);
    // partial-aggregation row batching is deterministic on a fixed corpus
    assert(d2 === d1, s"identical plans shuffled $d1 vs $d2 bytes")
  }
}
