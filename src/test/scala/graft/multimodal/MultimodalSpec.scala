package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("batched decode preserves cardinality, order-free identity by id, shapes") {
    val media = mediaFromDocuments(spark, Sf0001)
    val out = decode(media, StubImageDecoder(batchSize = 7)).collect()
    assert(out.length === 500)
    assert(out.forall(_.features.length === 32))
    assert(out.forall(f => f.width >= 64 && f.width < 128))
    // histogram features are a probability distribution over byte buckets
    assert(out.forall(f => math.abs(f.features.sum - 1.0f) < 1e-3))
  }

  test("decode batch shape: odd batch sizes and single-row partitions work") {
    val tiny = Seq(MediaIn(1L, "abc".getBytes), MediaIn(2L, Array.empty[Byte])).toDS()
    val out = decode(tiny.repartition(2), StubImageDecoder(batchSize = 1)).collect()
      .sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq === Seq(1L, 2L))
    assert(out(1).byte_len === 0L && out(1).features.forall(_ == 0f))
  }

  test("frame sampling explodes payloads into strided frame rows") {
    val media = Seq(MediaIn(1L, (0 until 100).map(_.toByte).toArray)).toDS()
    val frames = sampleFrames(media, frameLen = 10, stride = 2).collect()
    assert(frames.length === 5) // 10 frames, every 2nd
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2, 4, 6, 8))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").length === 10))
  }
}
