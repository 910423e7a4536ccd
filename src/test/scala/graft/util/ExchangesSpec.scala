package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Width sizing for input-scaled exchanges: floor at the session width
  * (fixture plans untouched), ceil-divide by the per-partition target,
  * cap at the engine-wide 8192. */
class ExchangesSpec extends AnyFunSuite {

  test("floors at the session width for small inputs") {
    assert(Exchanges.widthFor(0L, 32, 2000000L) === 32)
    assert(Exchanges.widthFor(1000000L, 32, 2000000L) === 32)
    assert(Exchanges.widthFor(64000000L, 32, 2000000L) === 32)
  }

  test("ceil-divides past the floor") {
    assert(Exchanges.widthFor(66000000L, 32, 2000000L) === 33)
    assert(Exchanges.widthFor(1100000000L, 32, 2000000L) === 550)
    // 1000x embedding candidates: 4 probes x 2M vectors x 64 occupancy
    assert(Exchanges.widthFor(4L * 2000000 * 64, 32, 4000000L) === 128)
  }

  test("caps at 8192 and rejects a non-positive target") {
    assert(Exchanges.widthFor(Long.MaxValue / 4, 32, 2000000L) === 8192)
    intercept[IllegalArgumentException](Exchanges.widthFor(10L, 32, 0L))
  }
}
