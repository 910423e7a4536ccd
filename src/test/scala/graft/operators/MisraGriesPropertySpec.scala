package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property check for the Misra-Gries kernel behind heavy_hitters: on
  * random skewed streams and capacities, (a) the summary never exceeds its
  * capacity, and (b) every token whose true count clears the n/capacity
  * bar survives — the superset guarantee the exact-recount pass builds on.
  * Driver-side only: the distributed wrapper is gated by the oracle row
  * and the 1M-doc scale smoke. */
class MisraGriesPropertySpec extends AnyFunSuite {

  // small alphabets + zipf-ish repetition force evictions
  private val streamGen: Gen[List[String]] = for {
    n <- Gen.choose(0, 400)
    s <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.const("hot"),
      4 -> Gen.oneOf("warm1", "warm2"),
      3 -> Gen.choose(0, 30).map(i => s"mid$i"),
      2 -> Gen.choose(0, 5000).map(i => s"rare$i")))
  } yield s

  test("MG summary: bounded size, and counts above n/capacity always survive") {
    val prop = Prop.forAll(streamGen, Gen.choose(2, 12)) { (stream, capacity) =>
      val (cands, n) = CorpusDiagnostics.mgSummarize(stream.iterator, capacity)
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
      val mustSurvive = exact.filter { case (_, c) => c > n.toDouble / capacity }
        .keys.toSet
      n == stream.length.toLong &&
        cands.size <= capacity &&
        cands.distinct.size == cands.size &&
        mustSurvive.subsetOf(cands.toSet)
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.toString)
  }
}
