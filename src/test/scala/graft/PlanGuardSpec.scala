package graft

/** Sweeping plan guard: NO query in the driver contract may compile to a
  * CartesianProduct — the one plan node that cannot survive a 100× scale-up
  * — except the documented O(n²) parity forms (`avg_pairwise_sim`,
  * `sim_histogram`, `knn_graph`, and `semantic_clusters`, which composes
  * knn_graph's exact edge stage) whose scale paths exist separately
  * (`avg_pairwise_sim_fast`, `sim_histogram_sampled`, `knn_graph_ivf`,
  * `semantic_clusters_ivf` — the scale twins plan equi-joins, never a
  * cartesian, and are swept like any other query).
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
  // semantic_clusters is listed even though the small-graph CC shortcut
  // usually materializes its knn_graph edge stage before the inspected
  // plan exists: on a fixture whose mutual-edge count exceeds the
  // driver threshold the distributed CC path KEEPS the cartesian in the
  // plan, and the guard must not start failing a query that is O(n²) by
  // documented design
  private val cartesianParityAllowed =
    Set("avg_pairwise_sim", "sim_histogram", "knn_graph", "semantic_clusters")

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

  test("column pruning reaches the parquet scan (a 3-column rollup must not read 16)") {
    val scans = fileScans(graft.operators.StarSchemaQueries.topSuppliers(spark, Sf0001)
      .queryExecution.executedPlan).map(_.requiredSchema.fieldNames.toSeq)
    val lineitemScan = scans.find(_.contains("l_suppkey"))
    assert(lineitemScan.isDefined, "expected a lineitem scan")
    assert(lineitemScan.get.toSet === Set("l_suppkey", "l_extendedprice", "l_discount"),
      s"lineitem scan reads ${lineitemScan.get} — pruning regressed")
    val docScans = fileScans(graft.operators.TextAnalysis.qualitySignals(spark, Sf0001)
      .queryExecution.executedPlan).map(_.requiredSchema.fieldNames.toSeq)
    assert(docScans.nonEmpty && docScans.forall(_.toSet.subsetOf(Set("doc_id", "text"))),
      s"documents scan reads $docScans — pruning regressed")
  }

  test("seed-row filters push down to the parquet scan") {
    val plan = graft.operators.SimilarityQueries.sqKnnTopK(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(vec_id,0"),
      s"vec_id=0 seed filter must reach PushedFilters:\n$plan")
  }
}
