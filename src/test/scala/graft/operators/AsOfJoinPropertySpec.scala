package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Property check: the union+window as-of join agrees with the obvious
  * per-row reference semantics (latest right at-or-before, key-equal,
  * largest tie id among same-ts rights) on random small datasets —
  * exercising tie, null-match and multi-key cases the fixtures cannot. */
class AsOfJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  // small domains force collisions: few keys, coarse timestamps
  private val rowGen = for {
    k <- Gen.choose(0L, 2L)
    t <- Gen.choose(0L, 9L)
  } yield (k, t)

  private def reference(left: Seq[(Long, Long, Long)],
                        right: Seq[(Long, Long, Double, Long)]): Map[Long, Option[Double]] =
    left.map { case (k, t, lid) =>
      val candidates = right.filter(r => r._1 == k && r._2 <= t)
      val v = if (candidates.isEmpty) None
      else {
        val maxTs = candidates.map(_._2).max
        Some(candidates.filter(_._2 == maxTs).maxBy(_._4)._3) // largest tie id wins
      }
      lid -> v
    }.toMap

  test("asOfJoin ≡ per-row reference semantics on random keyed timelines") {
    val prop = Prop.forAll(
      Gen.listOfN(8, rowGen), Gen.listOfN(8, rowGen)) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, 100L + i) }
      val right = rs.zipWithIndex.map { case ((k, t), i) => (k, t, (k * 100 + t).toDouble, 900L + i) }
      val lDf = left.toDF("k", "t", "lid")
      val rDf = right.toDF("k", "t", "v", "rid")
      val got = TemporalJoins.asOfJoin(lDf, rDf, "k", "t", Seq("v"), "rid")
        .select("lid", "asof_v").as[(Long, Option[Double])].collect().toMap
      got == reference(left, right)
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.toString)
  }
}
