package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.SparkSpec
import graft.multimodal.Multimodal.{AudioFeatures, MediaIn, WavPcmDecoder}

/** The REAL audio path: WAVs synthesized in-test (the JDK writes them too),
  * decoded through the batched Spark plumbing. */
class WavPcmDecoderSpec extends SparkSpec {
  import spark.implicits._

  /** 16-bit little-endian PCM WAV from per-frame per-channel samples in [-1,1]. */
  private def wav16(sampleRate: Float, samples: Array[Array[Double]]): Array[Byte] = {
    val channels = samples.head.length
    val pcm = new Array[Byte](samples.length * channels * 2)
    for (i <- samples.indices; c <- 0 until channels) {
      val v = math.max(-1.0, math.min(1.0, samples(i)(c)))
      val s = math.round(v * 32767).toShort
      val off = (i * channels + c) * 2
      pcm(off) = (s & 0xff).toByte
      pcm(off + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sampleRate, 16, channels, true, false)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  private def sine(n: Int, freq: Double, rate: Double, amp: Double): Array[Double] =
    Array.tabulate(n)(i => amp * math.sin(2 * math.Pi * freq * i / rate))

  test("mono sine: metadata exact, every window's RMS ≈ amp/√2") {
    val n = 8000
    val bytes = wav16(8000f, sine(n, 440.0, 8000.0, 0.5).map(Array(_)))
    val Seq(f) = WavPcmDecoder(nWindows = 8).decodeBatch(Seq(MediaIn(1L, bytes)))
    assert(f.sample_rate === 8000 && f.channels === 1 && f.n_frames === n.toLong)
    val want = 0.5 / math.sqrt(2.0)
    f.features.foreach(r => assert(math.abs(r - want) < 0.01, s"window RMS $r vs $want"))
  }

  test("silence → zero envelope; half-silent signal localizes energy") {
    val n = 4000
    val half = sine(n / 2, 200.0, 8000.0, 0.8) ++ Array.fill(n / 2)(0.0)
    val Seq(f) = WavPcmDecoder(nWindows = 4)
      .decodeBatch(Seq(MediaIn(1L, wav16(8000f, half.map(Array(_))))))
    assert(f.features(0) > 0.5 && f.features(1) > 0.5)
    assert(f.features(2) < 0.01 && f.features(3) < 0.01,
      s"silent half must have ~0 energy: ${f.features.toSeq}")
  }

  test("stereo channels average before RMS (anti-phase cancels)") {
    val s = sine(2000, 300.0, 8000.0, 0.6)
    val anti = s.map(v => Array(v, -v))
    val Seq(f) = WavPcmDecoder(nWindows = 4)
      .decodeBatch(Seq(MediaIn(1L, wav16(8000f, anti))))
    assert(f.channels === 2)
    // L and R cancel in the mono mix (up to 1-lsb quantization)
    f.features.foreach(r => assert(r < 1e-3, s"anti-phase stereo RMS $r"))
  }

  test("corrupt / non-audio payloads yield the sentinel row, not a crash") {
    val rows = WavPcmDecoder().decodeBatch(Seq(
      MediaIn(1L, Array[Byte](1, 2, 3, 4)),
      MediaIn(2L, "not a wav at all".getBytes),
      MediaIn(3L, Array.emptyByteArray)))
    rows.foreach { f =>
      assert(f.sample_rate === -1 && f.channels === -1 && f.n_frames === 0L)
      assert(f.features.forall(_ == 0f))
    }
  }

  test("batched decode runs distributed through mapPartitions") {
    val docs = (0L until 20L).map { i =>
      MediaIn(i, wav16(8000f, sine(1000, 100.0 + i, 8000.0, 0.3).map(Array(_))))
    }
    val ds = spark.createDataset(docs).repartition(4)
    val out: Seq[AudioFeatures] =
      Multimodal.decodeAudio(ds, WavPcmDecoder(batchSize = 3)).collect().toSeq
    assert(out.length === 20)
    assert(out.map(_.media_id).toSet === (0L until 20L).toSet)
    assert(out.forall(f => f.sample_rate === 8000 && f.n_frames === 1000L))
    // windows cover partial low-frequency periods → per-window RMS varies;
    // the peak window must still carry real (non-silent, non-clipped) energy
    assert(out.forall(f => f.features.max > 0.1 && f.features.max < 0.35))
  }
}
