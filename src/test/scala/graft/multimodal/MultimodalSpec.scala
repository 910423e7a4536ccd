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

  test("ImageIoDecoder decodes real PNG/BMP images distributed; sentinel on corrupt bytes") {
    import java.awt.image.BufferedImage
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    def bmp(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos); bos.toByteArray
    }
    val media = Seq(
      MediaIn(1L, png(32, 16, 0x000000)), // black PNG
      MediaIn(2L, png(8, 8, 0xff0000)),   // red PNG
      MediaIn(3L, bmp(5, 7, 0xffffff)),   // white BMP
      MediaIn(4L, "not an image at all".getBytes)).toDS()
    val out = decode(media.repartition(2), ImageIoDecoder(batchSize = 2))
      .collect().sortBy(_.media_id)
    assert(out(0).width === 32 && out(0).height === 16)
    assert(out(0).features(0) === 1.0f, "solid black → all pixels in gray bucket 0")
    assert(out(1).width === 8 && out(1).height === 8)
    // red: integer luma 299*255/1000 = 76 → bucket 76*32/256 = 9
    assert(out(1).features(9) === 1.0f, s"red luma bucket: ${out(1).features.toSeq}")
    assert(out(2).width === 5 && out(2).height === 7)
    assert(out(2).features(31) === 1.0f, "white → top gray bucket")
    assert(out(3).width === -1 && out(3).height === -1 &&
      out(3).features.forall(_ == 0f), "corrupt payload → sentinel row, not a crash")
    // deterministic across runs
    val again = decode(media.repartition(2), ImageIoDecoder(batchSize = 2))
      .collect().sortBy(_.media_id)
    assert(again.map(_.features.toSeq).toSeq === out.map(_.features.toSeq).toSeq)
  }

  test("frame sampling explodes payloads into strided frame rows") {
    val media = Seq(MediaIn(1L, (0 until 100).map(_.toByte).toArray)).toDS()
    val frames = sampleFrames(media, frameLen = 10, stride = 2).collect()
    assert(frames.length === 5) // 10 frames, every 2nd
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2, 4, 6, 8))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").length === 10))
  }
}
