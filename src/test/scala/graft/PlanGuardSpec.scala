package graft

/** Sweeping plan guard: NO query in the driver contract may compile to a
  * CartesianProduct — the one plan node that cannot survive a 100× scale-up
  * — except the two documented reference-parity forms whose scale paths
  * exist separately (`avg_pairwise_sim_fast`, `sim_histogram_sampled`).
  * Runs on sf0.001 so the sweep stays cheap; plan shape is data-independent
  * for these queries (static thresholds, no AQE cardinality switches on
  * the nodes asserted here).
  *
  * BroadcastNestedLoopJoin is deliberately NOT banned: every occurrence in
  * the surface is a 1-row seed/count broadcast (crossJoin(broadcast(agg)))
  * — constant work per row at any scale.
  */
class PlanGuardSpec extends SparkSpec {

  /** Reference-parity O(n²) queries (SURVEY §7.1.8): kept as the oracle
    * twins of their linear/sampled scale paths. */
  private val cartesianParityAllowed = Set("avg_pairwise_sim", "sim_histogram")

  test("no query plans a CartesianProduct (except documented parity forms)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (cartesianParityAllowed(name)) None
      else {
        val plan = fn(spark, Sf0001).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    }
    assert(offenders.isEmpty, s"CartesianProduct found in: ${offenders.mkString(", ")}")
  }
}
