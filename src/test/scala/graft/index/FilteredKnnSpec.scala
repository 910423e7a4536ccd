package graft.index

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{cosine_distance, vector_lit}
import graft.operators.IndexQueries

/** Iterative/filtered ANN scans — pgvector 0.8.1's headline feature
  * (/root/reference/README.md:9): a predicate must not starve `ORDER BY
  * dist LIMIT k` below k rows. IVF side is EXACT (covering-radius
  * termination bound); NSW side is post-filter with adaptive ef. */
class FilteredKnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val indexPath = IndexQueries.indexFor(spark, Sf0001)
  private val tablePath = s"$Sf0001/embeddings.parquet"

  private def queryVec: Array[Float] =
    graft.Tables.embeddings(spark, Sf0001).filter(col("vec_id") === 0)
      .head().getAs[collection.Seq[Float]]("embedding").toArray

  /** Brute-force filtered exact top-k (the DuckDB-oracle twin, in-engine). */
  private def exactFiltered(pred: org.apache.spark.sql.Column, k: Int) =
    spark.read.parquet(tablePath)
      .filter(pred)
      .select(col("vec_id"),
        cosine_distance(col("embedding"), vector_lit(queryVec)).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("filtered kNN equals exact filtered top-k and returns k rows (label filter)") {
    val pred = col("label") === 7
    val got = IvfIndex.filteredKnn(spark, indexPath, queryVec, 10, pred)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.length === 10, "selective filter must still return k rows")
    assert(got === exactFiltered(pred, 10), "filtered probe must be EXACT")
  }

  test("harshly selective filter (2% of rows): expansion reaches all matches, exact") {
    // 10 of 500 rows survive — a fixed nprobe=4/16 probe cannot see them all
    val pred = col("vec_id") % 50 === 0
    val (df, probed) = IvfIndex.filteredKnnStats(
      spark, indexPath, queryVec, 10, pred, initProbes = 1)
    val got = df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === exactFiltered(pred, 10))
    assert(got.length === 10)
    assert(probed > 1, "a 2% filter must force expansion past the initial probe")
  }

  test("predicate with fewer than k survivors returns them all and terminates") {
    val pred = col("vec_id") < 3
    val got = IvfIndex.filteredKnn(spark, indexPath, queryVec, 10, pred)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(0L, 1L, 2L))
  }

  test("always-false predicate returns empty, no infinite loop") {
    assert(IvfIndex.filteredKnn(spark, indexPath, queryVec, 10, lit(false))
      .collect().isEmpty)
  }

  test("l2 opclass: filtered probe exact under its metric") {
    import graft.functions.l2_distance
    val l2Path = IndexQueries.l2IndexFor(spark, Sf0001)
    val pred = col("label") === 3
    val exact = spark.read.parquet(tablePath)
      .filter(pred)
      .select(col("vec_id"),
        l2_distance(col("embedding"), vector_lit(queryVec)).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = IvfIndex.filteredKnn(spark, l2Path, queryVec, 10, pred)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === exact)
  }

  test("ip opclass: no IP bound exists — degrades to full expansion, still exact") {
    import graft.functions.neg_inner_product
    val ipPath = IndexQueries.ipIndexFor(spark, Sf0001)
    val pred = col("label") === 3
    val exact = spark.read.parquet(tablePath)
      .filter(pred)
      .select(col("vec_id"),
        neg_inner_product(col("embedding"), vector_lit(queryVec)).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val (df, probed) = IvfIndex.filteredKnnStats(spark, ipPath, queryVec, 10, pred)
    assert(df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === exact)
    assert(probed === IndexQueries.Lists, "ip must probe every list (no bound)")
  }

  test("legacy sidecar without radius column: no early stop, still exact") {
    val legacy = graft.util.TempDirs
      .create("graft_legacy_idx").resolve("idx").toString
    spark.read.parquet(s"$indexPath/centroids").drop("radius")
      .coalesce(1).write.parquet(s"$legacy/centroids")
    // lists + meta reused via copy
    spark.read.parquet(s"$indexPath/lists").drop("bucket")
      .write.partitionBy("list_id").parquet(s"$legacy/lists")
    spark.read.parquet(s"$indexPath/meta").coalesce(1).write.parquet(s"$legacy/meta")
    val pred = col("label") === 7
    val (df, probed) = IvfIndex.filteredKnnStats(spark, legacy, queryVec, 10, pred)
    assert(df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      === exactFiltered(pred, 10))
    assert(probed === IndexQueries.Lists,
      "without radii the bound must never fire early")
  }

  test("append onto a LEGACY sidecar: unknown radii stay unknown (no early stop, exact)") {
    // the killer case: a radius-less index that receives appends must not
    // fabricate radius 0.0 for its existing members — the bound would then
    // "prove" far-from-centroid members can't win and drop true neighbors
    val legacy = graft.util.TempDirs
      .create("graft_legacy_app").resolve("idx").toString
    spark.read.parquet(s"$indexPath/centroids").drop("radius")
      .coalesce(1).write.parquet(s"$legacy/centroids")
    spark.read.parquet(s"$indexPath/lists").drop("bucket")
      .write.partitionBy("list_id").parquet(s"$legacy/lists")
    spark.read.parquet(s"$indexPath/meta").coalesce(1).write.parquet(s"$legacy/meta")
    val extra = spark.read.parquet(tablePath).filter(col("vec_id") < 5)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding"), col("label"))
    IvfIndex.append(extra, legacy)
    val pred = col("label") === 7
    val (df, probed) = IvfIndex.filteredKnnStats(spark, legacy, queryVec, 10, pred)
    val exact = spark.read.parquet(s"$legacy/lists")
      .filter(pred)
      .select(col("vec_id"),
        cosine_distance(col("embedding"), vector_lit(queryVec)).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === exact)
    assert(probed === IndexQueries.Lists,
      "post-append legacy radii are UNKNOWN — the bound must never fire")
  }

  test("clustered data: early termination engages (probes < lists)") {
    // 400 vectors in 8 tight clusters; query sits inside cluster 0 — after
    // probing cluster-0's lists the radius bound proves the rest can't win
    val dim = 16
    val base = (0 until 8).map(c =>
      Array.tabulate(dim)(d => if (d == c * 2) 1.0f else 0.0f))
    val rows = (0L until 400L).map { i =>
      val c = (i % 8).toInt
      val v = base(c).clone()
      v(dim - 1) = (i % 7).toFloat / 1000f // tiny within-cluster jitter
      (i, v, (i % 3).toInt)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val path = graft.util.TempDirs
      .create("graft_clustered_idx").resolve("idx").toString
    IvfIndex.build(df, path, lists = 8)
    val q = base(0).clone(); q(dim - 1) = 0.0005f
    val (res, probed) = IvfIndex.filteredKnnStats(
      spark, path, q, 5, col("label") === 1, initProbes = 2)
    val exact = df.filter(col("label") === 1)
      .select(col("vec_id"),
        cosine_distance(col("embedding"), vector_lit(q)).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(res.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === exact)
    assert(probed < 8, s"bound should terminate before all lists (probed=$probed)")
  }

  test("filtered searchMany at probe-all ≡ per-query filteredKnn over the whole corpus") {
    // the distributed filtered-backfill form: EVERY corpus vector as a
    // query, predicate pushed into the lists scan; at nprobe = full list
    // count it must answer exactly what the per-query exact form does
    val pred = col("label") === 7
    val k = 5
    val queries = graft.Tables.embeddings(spark, Sf0001)
      .select(col("vec_id").as("qid"), col("embedding"))
    val got = IvfIndex.searchMany(spark, indexPath, queries,
        "qid", "embedding", k, nprobe = IndexQueries.Lists, predicate = Some(pred))
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("dist")))
      .groupBy(_._1)
    // spot-check a spread of qids against the exact per-query form (the
    // full sweep would run 500 driver-side iterative searches)
    Seq(0L, 7L, 123L, 250L, 499L).foreach { qid =>
      val qv = graft.Tables.embeddings(spark, Sf0001)
        .filter(col("vec_id") === qid)
        .head().getAs[collection.Seq[Float]]("embedding").toArray
      val exact = IvfIndex.filteredKnn(spark, indexPath, qv, k, pred)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val batch = got(qid).sortBy(_._2).map(t => (t._3, t._4)).toSeq
      assert(batch === exact, s"qid $qid: filtered searchMany must match filteredKnn")
    }
    // every query answered, every row satisfies the predicate
    assert(got.size === 500, "every corpus query must be answered")
    val labels = spark.read.parquet(tablePath)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.values.flatten.forall(t => labels(t._3) == 7),
      "a non-qualifying row leaked past the pushed predicate")
  }

  test("searchManyAdaptive: starved queries expand to exact; short answers are true answers") {
    val pred = col("vec_id") % 50 === 0 // 10 of 500 survive
    val k = 5
    val queries = graft.Tables.embeddings(spark, Sf0001)
      .filter(col("vec_id") < 40)
      .select(col("vec_id").as("qid"), col("embedding"))
    // the fixed-probe pass must actually starve someone at initProbes=1,
    // or this test demonstrates nothing
    val fixed = IvfIndex.searchMany(spark, indexPath, queries,
        "qid", "embedding", k, nprobe = 1, predicate = Some(pred))
      .collect().groupBy(_.getAs[Long]("qid"))
    assert(queries.count() === 40L)
    assert((0L until 40L).exists(q => fixed.getOrElse(q, Array.empty).length < k),
      "fixture must starve at least one query at nprobe=1")
    val adaptive = IvfIndex.searchManyAdaptive(spark, indexPath, queries,
        "qid", "embedding", k, initProbes = 1, predicate = Some(pred))
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("dist")))
      .groupBy(_._1)
    // the relaxed_order contract: EVERY query reaches k rows (10
    // survivors ≥ k) and every returned row satisfies the predicate
    assert(adaptive.size === 40 && adaptive.values.forall(_.length == k),
      "the k-row guarantee is the operator's whole point")
    assert(adaptive.values.flatten.forall(_._3 % 50 == 0),
      "a non-qualifying row leaked past the predicate")
    // initProbes = full list count degrades to exact probe-all: ≡ the
    // per-query exact iterative form, bit-for-bit
    val exactBatch = IvfIndex.searchManyAdaptive(spark, indexPath, queries,
        "qid", "embedding", k, initProbes = IndexQueries.Lists,
        predicate = Some(pred))
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("dist")))
      .groupBy(_._1)
    Seq(0L, 7L, 25L, 39L).foreach { qid =>
      val qv = graft.Tables.embeddings(spark, Sf0001)
        .filter(col("vec_id") === qid)
        .head().getAs[collection.Seq[Float]]("embedding").toArray
      val exact = IvfIndex.filteredKnn(spark, indexPath, qv, k, pred)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val batch = exactBatch(qid).toSeq.sortBy(_._2).map(t => (t._3, t._4))
      assert(batch === exact, s"qid $qid: full-coverage adaptive must equal filteredKnn")
    }
    // k beyond the surviving population: expansion runs to full coverage
    // and the short answer is the TRUE answer — all 10 survivors
    val short = IvfIndex.searchManyAdaptive(spark, indexPath,
        queries.filter(col("qid") < 3), "qid", "embedding",
        k = 20, initProbes = 1, predicate = Some(pred))
      .collect().groupBy(_.getAs[Long]("qid"))
    assert(short.size === 3 && short.values.forall(_.length == 10),
      "with 10 survivors and k=20, every query must return exactly the 10")
  }

  test("NSW filtered search: selective filter still returns k rows; recall holds") {
    val nswPath = IndexQueries.nswIndexFor(spark, Sf0001)
    val attrs = spark.read.parquet(tablePath)
    val pred = col("vec_id") % 50 === 0 // 10 of 500 survive
    val got = NswIndex.searchFiltered(spark, nswPath, queryVec, 10, attrs, pred)
      .collect().map(_.getLong(0)).toSeq
    assert(got.length === 10, "adaptive ef must expand until k survivors")
    // 10 survivors of 500 and the cap forces full exploration on the small
    // fixture, so recall here is exact containment
    val exact = exactFiltered(pred, 10).map(_._1)
    val recall = got.toSet.intersect(exact.toSet).size / 10.0
    assert(recall >= 0.8, s"filtered NSW recall@10 was $recall")
  }

  test("IVF-PQ filtered probe: selective filter returns k rows; recall holds") {
    val pqPath = IndexQueries.ivfPqIndexFor(spark, Sf0001)
    val base = spark.read.parquet(tablePath)
    val pred = col("vec_id") % 50 === 0 // 10 of 500 survive
    val got = IvfPqIndex.probeRerankFiltered(
      spark, pqPath, base, queryVec, 10, pred, nprobe = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got.length === 10, "expansion must reach k surviving rows")
    val exact = exactFiltered(pred, 10).map(_._1)
    val recall = got.toSet.intersect(exact.toSet).size / 10.0
    assert(recall >= 0.8, s"filtered IVF-PQ recall@10 was $recall")
  }

  test("IVF-PQ filtered probe: fewer than k survivors returns them all (terminal exact)") {
    val pqPath = IndexQueries.ivfPqIndexFor(spark, Sf0001)
    val base = spark.read.parquet(tablePath)
    val got = IvfPqIndex.probeRerankFiltered(
      spark, pqPath, base, queryVec, 10, col("vec_id") < 3)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(0L, 1L, 2L))
  }

  test("NSW filtered search: fewer than k survivors returns them all") {
    val nswPath = IndexQueries.nswIndexFor(spark, Sf0001)
    val attrs = spark.read.parquet(tablePath)
    val got = NswIndex.searchFiltered(
      spark, nswPath, queryVec, 10, attrs, col("vec_id") < 3)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(0L, 1L, 2L))
  }
}
