package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted-graph link analysis with the adaptive driver/distributed split
  * the connected-components family already uses ([[Dedup]]): a graph whose
  * edge list fits comfortably on the driver (≤ [[DriverMaxEdges]]) iterates
  * in exact local arithmetic with zero shuffles; anything larger runs the
  * same recurrence as distributed iterate-joins — rank × edge equi-join,
  * decimal contribution sum per destination — whose per-iteration cost is
  * one shuffle on the edge key. Both paths implement the SAME numeric
  * contract, so they agree bit-for-bit (spec-pinned):
  *
  *  - per-edge contribution `rank(src) · w / wout(src)` in double,
  *    rounded HALF_UP to 9dp into DECIMAL(28,9) — decimal sums are
  *    order-free, so distributed partial aggregation cannot diverge from
  *    the driver's sequential BigDecimal fold;
  *  - new rank `(1−d)/n + d·s` in double on identical operands;
  *  - dangling mass dropped (the simple PageRank variant — documented in
  *    [[StarSchemaQueries.eventTypePagerank]] and its oracle).
  *
  * Ref: Brin & Page 1998 (damping 0.85); the reference surface has no
  * graph operator — this is the 100 TB scale path the builder brief asks
  * for (a user→user interaction graph does not fit a driver edge list).
  */
object GraphOps {

  /** Edge-count ceiling for the driver-local path. */
  val DriverMaxEdges = 100000L

  /** PageRank over `edges(src, dst, w)` for the node set `nodes(node)`.
    * Picks the driver kernel when the edge list is sidecar-sized, the
    * iterate-join kernel above [[DriverMaxEdges]]; `forceDistributed`
    * exists so specs can pin cross-kernel equality on one fixture.
    *
    * Output contract, identical across kernels (spec-pinned):
    * `(node STRING, pagerank DOUBLE)` — node ids are canonicalized to
    * string so the schema cannot silently change the day a growing graph
    * crosses the size threshold; edges whose `src` is not in `nodes`
    * (stale/filtered snapshots) are DROPPED by both kernels. */
  def pageRank(nodes: DataFrame, edges: DataFrame, iterations: Int,
               damping: Double, driverMaxEdges: Long = DriverMaxEdges,
               forceDistributed: Boolean = false): DataFrame = {
    // persist across dispatch-count + kernel consumption: the caller's
    // node/edge relations are typically corpus-sized distinct/aggregation
    // results that must not recompute once for count() and again per
    // collect()/iteration (nodes is read 3x in a 2-iteration distributed
    // run: count plus one left join per iteration)
    val nodesS = nodes.select(col("node").cast("string").as("node")).persist()
    val edgesS = edges.select(col("src").cast("string").as("src"),
      col("dst").cast("string").as("dst"), col("w").cast("long").as("w"))
    try {
      if (forceDistributed) {
        // no dispatch count, no edge persist: the distributed kernel
        // consumes the edge relation exactly ONCE (its windowed wout pass
        // — see distributedPageRank), so the former persist+count here was
        // a full extra pass over a corpus-sized relation purely to decide
        // a dispatch the caller already forced (r16, guide §1.2/§2.4)
        distributedPageRank(nodesS, edgesS, iterations, damping)
      } else {
        val edgesP = edgesS.persist()
        try {
          if (edgesP.count() <= driverMaxEdges) {
            val e = edgesP.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
            val n = nodesS.collect().map(_.getString(0)).sorted
            val spark = nodes.sparkSession
            import spark.implicits._
            driverPageRank(n, e, iterations, damping).toSeq.toDF("node", "pagerank")
          } else distributedPageRank(nodesS, edgesP, iterations, damping)
          // (the distributed kernel materializes the returned generation
          // inside its loop, so releasing the persists below cannot
          // trigger a recompute of the returned rank relation)
        } finally edgesP.unpersist()
      }
    } finally nodesS.unpersist()
  }

  /** Exact local kernel — ≤ [[DriverMaxEdges]] edges (index-metadata
    * scale). One BigDecimal fold per destination per iteration. Edges
    * with an unknown src are dropped, matching the distributed kernel's
    * inner rank join (a throw here would make the two kernels diverge on
    * stale snapshots). */
  private[operators] def driverPageRank(
      nodes: Array[String], allEdges: Array[(String, String, Long)],
      iterations: Int, damping: Double): Seq[(String, Double)] = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val known = nodes.toSet
    val edges = allEdges.filter(e => known(e._1))
    val nN = nodes.length.toDouble
    val wout = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum.toDouble }
    def round9(x: Double): JBD = JBD.valueOf(x).setScale(9, RoundingMode.HALF_UP)
    def step(p: Map[String, Double]): Map[String, Double] = {
      val s = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.foldLeft(JBD.ZERO) { case (acc, (src, _, ew)) =>
          acc.add(round9(p(src) * ew / wout(src)))
        }.doubleValue
      }
      nodes.map(v => v -> ((1.0 - damping) / nN +
        damping * s.getOrElse(v, 0.0))).toMap
    }
    val p0 = nodes.map(_ -> 1.0 / nN).toMap
    val pk = (1 to iterations).foldLeft(p0)((p, _) => step(p))
    nodes.map(v => (v, pk(v))).toSeq
  }

  /** Supersteps per materialization in [[distributedPageRank]]: the
    * recurrence composes LAZILY and only persists+counts every this-many
    * iterations (and at the last one) — a fixed-iteration recurrence needs
    * no per-superstep convergence read, so eagerly materializing every
    * generation paid one full job + AQE replan per superstep for nothing
    * but lineage hygiene, which a bounded plan depth provides just as well
    * (the 2-iteration contract queries now run as ONE job). */
  private[operators] val MaterializeEvery = 4

  /** Iterate-join kernel: per iteration ONE equi-join of the rank relation
    * to the (out-degree-annotated) edge relation on `src` and one decimal
    * hash agg on `dst` — both shuffles scale with |edges|, never |edges|²;
    * generations materialize every [[MaterializeEvery]] supersteps (plan
    * depth stays bounded; the returned generation is always cached). The
    * out-degree annotation is ONE window over the iteration join's own
    * `src` key — the former groupBy + self-join computed the edge relation
    * through two exchanges and a join where one shuffle serves both
    * (guide §2.4), and the cached relation comes out hash-partitioned on
    * `src`, which every iteration's join then reuses exchange-free. */
  private[operators] def distributedPageRank(
      nodes: DataFrame, edges: DataFrame,
      iterations: Int, damping: Double): DataFrame = {
    val nN = nodes.count().toDouble
    val srcW = org.apache.spark.sql.expressions.Window.partitionBy("src")
    val ew = edges
      .select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .withColumn("wout", sum(col("w")).over(srcW).cast("double"))
      .persist() // static across iterations
    ew.count()
    var ranks = nodes.select(col("node"), lit(1.0 / nN).as("rank"))
    val live = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      for (i <- 1 to iterations) {
        val contrib = ew
          .join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst"),
            // the driver kernel's exact op order: (rank · w) / wout,
            // HALF_UP 9dp → order-free decimal partial sums
            round(col("rank") * col("w").cast("double") / col("wout"), 9)
              .cast("decimal(28,9)").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("s"))
        ranks = nodes
          .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            (lit((1.0 - damping) / nN) + lit(damping) *
              coalesce(col("s").cast("double"), lit(0.0))).as("rank"))
        if (i % MaterializeEvery == 0 || i == iterations) {
          val gen = ranks.persist()
          gen.count() // materialize before dropping the previous generation
          live.foreach(_.unpersist())
          live.clear()
          live += gen
          ranks = gen
        }
      }
      // the returned (final, always-materialized) generation stays cached
      // for the caller; once the caller drops the frame, ContextCleaner
      // reclaims the blocks (the standard fate of a returned persisted
      // relation)
      ranks.withColumnRenamed("rank", "pagerank")
    } catch {
      case t: Throwable => live.foreach(_.unpersist()); throw t
    } finally ew.unpersist()
  }
}
