package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = graft.util.TempDirs.create(p).resolve("d").toString

  test("streaming dedup keeps one doc per fingerprint within the watermark window") {
    val srcDir = tmp("dedup_src")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val out = tmp("dedup_out")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    // 6 docs, 3 distinct normalized texts (case/whitespace variants collide)
    val docs = Seq(
      (1L, "alpha beta gamma", at(0)),
      (2L, "  Alpha   beta GAMMA ", at(10)),  // dup of 1 after normalization
      (3L, "delta epsilon", at(20)),
      (4L, "delta epsilon", at(30)),           // dup of 3
      (5L, "unique text here", at(40)),
      (6L, "ALPHA BETA GAMMA", at(50)))        // dup of 1
      .toDF("doc_id", "text", "ts")
    docs.write.mode("append").parquet(srcDir)
    val q = StreamingIngest.startDedupIngest(spark, srcDir, docs.schema, out)
    q.awaitTermination(120000)
    val kept = spark.read.parquet(out)
    assert(kept.count() === 3L)
    // one representative per normalized-fingerprint group
    val fps = kept.select(
      md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("fp"))
      .distinct().count()
    assert(fps === 3L)
  }

  test("streaming near-dup gate: LSH collisions drop vs store and within batch") {
    val srcDir = tmp("mh_src")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val store = tmp("mh_store")
    val out = tmp("mh_out")
    val textA = (1 to 30).map(i => s"alpha$i").mkString(" ")
    // one token changed → shingle sets overlap 27/30: near-dup of A
    val textA2 = ((1 to 29).map(i => s"alpha$i") :+ "CHANGED").mkString(" ")
    val textB = (1 to 30).map(i => s"beta$i").mkString(" ")
    val textC = (1 to 30).map(i => s"gamma$i").mkString(" ")
    // ground truth: the BATCH band pipeline collides A with A2 (shared
    // definition — if this fails the fixture, pick a closer variant)
    val gt = graft.operators.Dedup.bandsOf(
      graft.operators.Dedup.hashedShingleRelOf(
        Seq((1L, textA), (3L, textA2)).toDF("doc_id", "text")))
    val gtCollide = gt.as("x").join(gt.as("y"),
      col("x.band") === col("y.band") && col("x.band_sig") === col("y.band_sig") &&
        col("x.doc_id") < col("y.doc_id")).count()
    assert(gtCollide > 0L, "fixture must LSH-collide A with its variant")
    // batch 1: two distinct docs accepted
    Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q1 = StreamingIngest.startMinhashDedup(
      spark, srcDir, Seq((1L, "")).toDF("doc_id", "text").schema, store, out)
    q1.awaitTermination(120000)
    assert(spark.read.parquet(out).count() === 2L)
    // batch 2: a near-dup of stored A drops; a fresh doc passes
    Seq((3L, textA2), (4L, textC)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = StreamingIngest.startMinhashDedup(
      spark, srcDir, Seq((1L, "")).toDF("doc_id", "text").schema, store, out)
    q2.awaitTermination(120000)
    val kept = spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(1L, 2L, 4L), s"got ${kept.mkString(",")}")
  }

  test("streaming near-dup gate: in-batch collision keeps the lowest doc_id") {
    val srcDir = tmp("mh_src2")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val store = tmp("mh_store2")
    val out = tmp("mh_out2")
    val textA = (1 to 30).map(i => s"delta$i").mkString(" ")
    val textA2 = ((1 to 29).map(i => s"delta$i") :+ "X").mkString(" ")
    Seq((7L, textA2), (5L, textA)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q = StreamingIngest.startMinhashDedup(
      spark, srcDir, Seq((1L, "")).toDF("doc_id", "text").schema, store, out)
    q.awaitTermination(120000)
    val kept = spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0))
    assert(kept.toSeq === Seq(5L), s"got ${kept.mkString(",")}")
    // the store carries only the survivor's bands
    val storeIds = spark.read.parquet(store).select("doc_id").distinct()
      .collect().map(_.getLong(0))
    assert(storeIds.toSeq === Seq(5L))
  }

  test("streaming dedup dedups across micro-batch restarts via checkpoint state") {
    val srcDir = tmp("dedup_src2")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val out = tmp("dedup_out2")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    val batch1 = Seq((1L, "first doc", at(0)), (2L, "second doc", at(5)))
      .toDF("doc_id", "text", "ts")
    batch1.write.mode("append").parquet(srcDir)
    val q1 = StreamingIngest.startDedupIngest(spark, srcDir, batch1.schema, out)
    q1.awaitTermination(120000)
    // second run: a replayed duplicate (within watermark of checkpointed
    // state) plus one genuinely new doc
    val batch2 = Seq((3L, "FIRST   DOC", at(8)), (4L, "third doc", at(9)))
      .toDF("doc_id", "text", "ts")
    batch2.write.mode("append").parquet(srcDir)
    val q2 = StreamingIngest.startDedupIngest(spark, srcDir, batch2.schema, out)
    q2.awaitTermination(120000)
    val kept = spark.read.parquet(out)
    assert(kept.count() === 3L, s"got: ${kept.collect().mkString(",")}")
    assert(kept.filter(col("doc_id") === 3L).count() === 0L)
  }
}
