package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).resolve("d").toString

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
