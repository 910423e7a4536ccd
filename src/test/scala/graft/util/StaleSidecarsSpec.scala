package graft.util

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

class StaleSidecarsSpec extends AnyFunSuite {

  private val conf = new Configuration()
  private def tempDir(): String =
    graft.util.TempDirs.create("graft_stale_sidecar").toString

  test("tombstones are reclaimed per key only after the grace window") {
    val key = s"test:${java.util.UUID.randomUUID()}"
    val gen0 = tempDir(); val gen1 = tempDir()
    val t0 = 1000000L
    StaleSidecars.supersede(conf, key, gen0, t0)
    // a back-to-back rebuild within the grace window must NOT delete gen0
    // (racing queries may still scan it)
    StaleSidecars.supersede(conf, key, gen1, t0 + 1000)
    assert(Files.exists(java.nio.file.Paths.get(gen0)),
      "within-grace tombstone must survive the next supersede")
    assert(StaleSidecars.pendingFor(key).toSet === Set(gen0, gen1))
    // past the grace window, the next supersede reclaims both old gens
    val gen2 = tempDir()
    StaleSidecars.supersede(conf, key, gen2, t0 + StaleSidecars.GraceMs + 2000)
    assert(!Files.exists(java.nio.file.Paths.get(gen0)),
      "expired tombstone must be reclaimed")
    assert(!Files.exists(java.nio.file.Paths.get(gen1)))
    assert(StaleSidecars.pendingFor(key) === Seq(gen2))
  }

  test("keys are isolated: another key's supersede never reclaims this key's tombstones") {
    val keyA = s"a:${java.util.UUID.randomUUID()}"
    val keyB = s"b:${java.util.UUID.randomUUID()}"
    val a0 = tempDir()
    val t0 = 1000000L
    StaleSidecars.supersede(conf, keyA, a0, t0)
    // B rebuilds far past A's grace — must not touch A's pending sidecar
    StaleSidecars.supersede(conf, keyB, tempDir(), t0 + 10 * StaleSidecars.GraceMs)
    assert(Files.exists(java.nio.file.Paths.get(a0)),
      "cross-key reclamation is the shared-queue bug this type exists to prevent")
    assert(StaleSidecars.pendingFor(keyA) === Seq(a0))
  }
}
