package graft.index

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The two-level (coarse-quantizer) probe assignment that
  * [[IvfIndex.assignProbes]] escalates to past
  * [[IvfIndex.HierarchicalAssignLists]] lists — the fix for the measured
  * 100× scale wall (bench_sf10.json: the flat n·lists assignment crossJoin
  * was ~36 s of knn_graph_ivf's 112× ratio at 200k×3125 lists).
  *
  * Pinned here: (1) the dispatch — large-list assignment IS the
  * hierarchical form, and the probe-all / adaptive escape hatch
  * (probes·4 ≥ lists) stays flat/exact; (2) end-to-end recall through
  * searchMany on a clustered corpus at the engaging list count;
  * (3) home-list self-coverage (the property knn_graph_ivf's candidate
  * rule rides on); (4) determinism of the driver-side Lloyd. */
class HierarchicalAssignSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 16
  private val Clusters = 40
  private val N = 3200L
  private val Lists = 640 // ≥ HierarchicalAssignLists → hierarchical engages

  /** 40 well-separated clusters: center = 4.0 on (label mod Dim) plus the
    * shared hashNoise jitter — the clusteredDir recipe at a list count
    * that engages the hierarchical path. */
  private lazy val fixture: (org.apache.spark.sql.DataFrame, String) = {
    val center = transform(sequence(lit(0), lit(Dim - 1)), d =>
      when(pmod(d, lit(Clusters)) === pmod(col("label"), lit(Dim)),
        lit(4.0)).otherwise(lit(0.0)))
    val emb = zip_with(center, hashNoise(col("vec_id"), Dim),
      (ct, nz) => (ct + nz).cast("float"))
    val e = spark.range(N)
      .select(col("id").as("vec_id"), (col("id") % Clusters).cast("int").as("label"))
      .select(col("vec_id"), col("label"), emb.as("embedding"))
    val path = graft.util.TempDirs.create("graft_hier")
      .resolve("index").toString
    IvfIndex.build(e, path, lists = Lists)
    (e, path)
  }

  private def cents = {
    val (_, path) = fixture
    spark.read.parquet(s"$path/centroids").select("list_id", "centroid")
  }

  private def collectAssign(df: org.apache.spark.sql.DataFrame): Set[(Long, Int)] =
    df.select("qid", "list_id").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet

  test("dispatch: large-list assignProbes IS the hierarchical form; " +
      "probe-all territory stays flat") {
    val (e, _) = fixture
    import graft.functions.cosine_distance
    val dispatched = collectAssign(IvfIndex.assignProbes(
      e, cents, "vec_id", "embedding", 4))
    val hier = collectAssign(IvfIndex.assignProbesHierarchical(
      e, cents, "vec_id", "embedding", 4))
    assert(dispatched === hier, "dispatch at 640 lists must be hierarchical")
    // the exactness escape hatch: probes·4 ≥ lists routes flat, so
    // searchMany(nprobe = lists) keeps its exact probe-all contract
    val wide = collectAssign(IvfIndex.assignProbes(
      e.limit(64), cents, "vec_id", "embedding", Lists / 4))
    val wideFlat = collectAssign(IvfIndex.assignProbesFlat(
      e.limit(64), cents, "vec_id", "embedding", Lists / 4, cosine_distance(_, _)))
    assert(wide === wideFlat, "probes*4 >= lists must take the flat path")
    // well-formed: exactly `probes` rows per qid at this list count
    val perQid = hier.groupBy(_._1).view.mapValues(_.size)
    assert(perQid.values.forall(_ == 4))
    assert(perQid.size === N)
  }

  test("hierarchical assignment is deterministic across invocations") {
    val (e, _) = fixture
    import graft.functions.cosine_distance
    def run() = collectAssign(IvfIndex.assignProbesHierarchical(
      e, cents, "vec_id", "embedding", 4))
    assert(run() === run())
  }

  test("home-list coverage and end-to-end recall hold at the engaging " +
      "list count on a clustered corpus") {
    val (e, path) = fixture
    import graft.functions.cosine_distance
    // self-coverage: each indexed vector's build-assigned home list must
    // be in its own probe set nearly always — the property the
    // knn_graph_ivf candidate rule (co-probed lists) rides on
    val home = spark.read.parquet(s"$path/lists")
      .select(col("vec_id").cast("long").as("qid"), col("list_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val probeSets = collectAssign(IvfIndex.assignProbes(
        e, cents, "vec_id", "embedding", 4))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val covered = home.count { case (qid, lid) =>
      probeSets.getOrElse(qid, Set.empty).contains(lid)
    }
    assert(covered.toDouble / home.size >= 0.9,
      s"home-list coverage was ${covered.toDouble / home.size}")

    // end-to-end on a deterministic 200-query sample: the hierarchy
    // approximates the ASSIGNMENT, not the probe budget — so the gate is
    // relative (hierarchical within 0.05 of flat-assignment recall at the
    // same nprobe) plus an absolute floor at a probe budget sized to the
    // cluster span
    val qids = e.select("vec_id")
      .filter(pmod(xxhash64(col("vec_id")), lit(16L)) === 0L)
      .limit(200).as[Long].collect().toIndexedSeq
    val q = e.filter(col("vec_id").isin(qids: _*))
    def resultSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.filter(col("qid") =!= col("vec_id"))
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // flat-assignment twin of searchMany's body, same k/nprobe — the
    // recall baseline the hierarchical assignment is graded against
    def flatSearch(nprobe: Int): Map[Long, Set[Long]] = {
      import graft.functions.{cosine_distance, top_k_by_distance}
      val assigned = IvfIndex.assignProbesFlat(
        q, cents, "vec_id", "embedding", nprobe, cosine_distance(_, _))
      resultSets(spark.read.parquet(s"$path/lists")
        .join(assigned, Seq("list_id"))
        .select(col("qid"), col("vec_id"),
          cosine_distance(col("embedding"), col("qv")).as("dist"))
        .groupBy("qid")
        .agg(top_k_by_distance(col("dist"), col("vec_id"), 5).as("top"))
        .select(col("qid"), explode(col("top.vec_id")).as("vec_id")))
    }
    val exact = resultSets(e.crossJoin(broadcast(
        q.select(col("vec_id").as("qid"), col("embedding").as("qv"))))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cand"),
        graft.functions.cosine_distance(col("embedding"), col("qv")).as("d"))
      .groupBy("qid")
      .agg(graft.functions.top_k_by_distance(col("d"), col("cand"), 4).as("top"))
      .select(col("qid"), explode(col("top.vec_id")).as("vec_id")))
    def recallOf(res: Map[Long, Set[Long]]): Double =
      exact.map { case (qid, t) =>
        res.getOrElse(qid, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / exact.size
    def hierSearch(nprobe: Int): Map[Long, Set[Long]] =
      resultSets(IvfIndex.searchMany(spark, path, q, "vec_id", "embedding",
        k = 5, nprobe = nprobe))
    val (hier4, flat4) = (recallOf(hierSearch(4)), recallOf(flatSearch(4)))
    assert(hier4 >= flat4 - 0.05,
      s"hierarchical recall $hier4 fell >0.05 below flat $flat4 at nprobe=4")
    // 16 probed lists ≈ the ~80-member cluster span at occupancy 5: the
    // absolute production-grade floor (16·4=64 < 640 → still hierarchical)
    val hier16 = recallOf(hierSearch(16))
    assert(hier16 >= 0.9, s"hierarchical searchMany recall@4 was $hier16 at nprobe=16")
  }

  test("budget-scaled descent: a probe budget past the fixed-descent " +
      "coverage band still gets its full probe count") {
    val (e, _) = fixture
    import graft.functions.cosine_distance
    // probes=100 at 640 lists / 72 groups sits in the band a FIXED
    // 8-group descent coverage-capped (~8·640/72 ≈ 71 reachable lists):
    // the budget-scaled descent (24 groups here) must deliver the full
    // budget so the adaptive retry never burns a no-progress round.
    // Gate stays under the flat dispatch (100·4 < 640 → hierarchical).
    val q = e.limit(64)
    val assigned = IvfIndex.assignProbesHierarchical(
      q, cents, "vec_id", "embedding", 100)
    val perQid = assigned.groupBy("qid").agg(countDistinct("list_id").as("n"))
      .select("n").as[Long].collect()
    assert(perQid.length === 64)
    val full = perQid.count(_ == 100L)
    assert(full >= 61, // ≥95%: occupancy variance may starve a straggler
      s"only $full/64 queries got the full 100-list budget: " +
        s"min=${perQid.min} (fixed-descent band regression)")
  }

  test("map-form assignment is invariant to the query frame's " +
      "partitioning (per-row, no cross-partition state)") {
    val (e, _) = fixture
    import graft.functions.cosine_distance
    val q = e.limit(128)
    def run(frame: org.apache.spark.sql.DataFrame) =
      collectAssign(IvfIndex.assignProbesHierarchical(
        frame, cents, "vec_id", "embedding", 4))
    // the single-map design (broadcast coarse structure, deterministic
    // UDF) must produce IDENTICAL rows however the input is partitioned —
    // the invariant that replaced the broadcast-vs-shuffled-join parity
    // pin when the member join was removed
    assert(run(q.repartition(7)) === run(q.coalesce(1)),
      "assignment rows must not depend on input partitioning")
  }

  test("ip opclass at the engaging list count: MIPS-aware coarse ranking " +
      "holds recall near the flat assignment") {
    import graft.functions.{neg_inner_product, top_k_by_distance}
    // same clustered geometry, but cluster MAGNITUDE varies 1×–5× with the
    // label: under inner product the best lists are the large-norm ones,
    // exactly what a plain ⟨q, group-mean⟩ ranking misses
    val center = transform(sequence(lit(0), lit(Dim - 1)), d =>
      when(pmod(d, lit(Clusters)) === pmod(col("label"), lit(Dim)),
        lit(4.0) * (lit(1.0) + pmod(col("label"), lit(5)))).otherwise(lit(0.0)))
    val emb = zip_with(center, hashNoise(col("vec_id"), Dim),
      (ct, nz) => (ct + nz).cast("float"))
    val e = spark.range(N)
      .select(col("id").as("vec_id"), (col("id") % Clusters).cast("int").as("label"))
      .select(col("vec_id"), col("label"), emb.as("embedding"))
    val path = graft.util.TempDirs.create("graft_hier_ip")
      .resolve("index").toString
    IvfIndex.build(e, path, lists = Lists, metric = "ip")
    val ipCents = spark.read.parquet(s"$path/centroids").select("list_id", "centroid")
    val q = e.filter(pmod(xxhash64(col("vec_id")), lit(16L)) === 0L).limit(200)
    def topOf(assigned: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      spark.read.parquet(s"$path/lists")
        .join(assigned, Seq("list_id"))
        .filter(col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"),
          neg_inner_product(col("embedding"), col("qv")).as("d"))
        .groupBy("qid")
        .agg(top_k_by_distance(col("d"), col("vec_id"), 5).as("top"))
        .select(col("qid"), explode(col("top.vec_id")).as("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val flat = topOf(IvfIndex.assignProbesFlat(
      q, ipCents, "vec_id", "embedding", 16, neg_inner_product(_, _)))
    val hier = topOf(IvfIndex.assignProbesHierarchical(
      q, ipCents, "vec_id", "embedding", 16, metric = "ip"))
    val agree = flat.map { case (qid, f) =>
      hier.getOrElse(qid, Set.empty).intersect(f).size.toDouble / f.size
    }.sum / flat.size
    assert(agree >= 0.9,
      s"ip hierarchical assignment agreement with flat was $agree at nprobe=16")
  }

  test("lloydCoarse: partitions every point, deterministic, survives " +
      "an emptied group") {
    val pts = Array.tabulate(600)(i =>
      Array.tabulate(8)(j => ((i % 13) * 17 + j * 3).toFloat / 7f))
    val (c1, a1) = IvfIndex.lloydCoarse(pts, 24)
    val (c2, a2) = IvfIndex.lloydCoarse(pts, 24)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
    assert(a1.toSeq === a2.toSeq)
    assert(a1.length === pts.length)
    assert(a1.forall(g => g >= 0 && g < 24))
    // 13 distinct point values < 24 groups: some groups MUST be empty and
    // the emptied-group branch (keep previous center) must not blow up
    assert(a1.distinct.length <= 13)
    // groups requested past the point count clamp to n
    val (c3, a3) = IvfIndex.lloydCoarse(pts.take(5), 24)
    assert(c3.length === 5 && a3.length === 5)
  }
}
