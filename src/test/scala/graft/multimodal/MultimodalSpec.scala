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

  private def solidFrame(w: Int, h: Int, v: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(v, v, v)); g.fillRect(0, 0, w, h); g.dispose()
    img
  }

  test("GifVideoDecoder decodes real animated GIFs distributed; sentinel on corrupt bytes") {
    val gif3 = Gif.encodeAnimatedGif(
      Seq(solidFrame(16, 8, 0), solidFrame(16, 8, 128), solidFrame(16, 8, 255)))
    val media = Seq(
      MediaIn(1L, gif3),
      MediaIn(2L, "definitely not a video".getBytes),
      MediaIn(3L, gif3.take(20))).toDS() // truncated header → decode error
    val out = decodeVideo(media.repartition(2), GifVideoDecoder(batchSize = 1, nWindows = 3))
      .collect().sortBy(_.media_id)
    assert(out(0).width === 16 && out(0).height === 8 && out(0).n_frames === 3)
    // solid gray v composites to mean luma exactly v; nWindows = n_frames
    // makes the envelope the per-frame luma sequence
    assert(out(0).features.toSeq === Seq(0f, 128f, 255f),
      s"luma envelope: ${out(0).features.toSeq}")
    assert(out(1).width === -1 && out(1).n_frames === -1 &&
      out(1).features.forall(_ == 0f), "unclaimed payload → sentinel row")
    assert(out(2).width === -1 && out(2).n_frames === -1,
      "truncated payload → sentinel row, not a task failure")
    // deterministic across runs
    val again = decodeVideo(media.repartition(2), GifVideoDecoder(batchSize = 1, nWindows = 3))
      .collect().sortBy(_.media_id)
    assert(again.map(_.features.toSeq).toSeq === out.map(_.features.toSeq).toSeq)
  }

  test("extractVideoFrames: strided decoded frames with per-frame luma; sentinel row on corrupt") {
    val gif4 = Gif.encodeAnimatedGif(
      Seq(solidFrame(5, 7, 10), solidFrame(5, 7, 20), solidFrame(5, 7, 30), solidFrame(5, 7, 40)))
    val frames = extractVideoFrames(
      Seq(MediaIn(1L, gif4), MediaIn(2L, "junk".getBytes)).toDS(), stride = 2)
      .collect().sortBy(r => (r.getLong(0), r.getInt(1)))
    assert(frames.map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((1L, 0), (1L, 2), (2L, -1)))
    assert(frames.take(2).forall(r =>
      r.getAs[Int]("width") === 5 && r.getAs[Int]("height") === 7))
    assert(frames.take(2).map(_.getAs[Double]("mean_luma")).toSeq === Seq(10.0, 30.0))
  }

  test("videoFromDocuments round-trip: decoded metadata matches the doc_id formulas") {
    val out = decodeVideo(videoFromDocuments(spark, Sf0001), GifVideoDecoder())
      .collect().sortBy(_.media_id)
    assert(out.length === 500)
    assert(out.forall(f => f.width === (8 + f.media_id % 16).toInt &&
      f.height === (8 + (f.media_id / 16) % 16).toInt &&
      f.n_frames === (2 + f.media_id % 3).toInt),
      "every GIF container must decode back to its doc_id-derived shape")
  }

  test("frame sampling explodes payloads into strided frame rows") {
    val media = Seq(MediaIn(1L, (0 until 100).map(_.toByte).toArray)).toDS()
    val frames = sampleFrames(media, frameLen = 10, stride = 2).collect()
    assert(frames.length === 5) // 10 frames, every 2nd
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2, 4, 6, 8))
    assert(frames.forall(_.getAs[Array[Byte]]("frame_bytes").length === 10))
  }
}
