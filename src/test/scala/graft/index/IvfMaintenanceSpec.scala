package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.IndexQueries

class IvfMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("append assigns new vectors to existing centroids; probe finds them") {
    // fresh index copy so we don't mutate the cached shared one
    val path = graft.util.TempDirs.create("ivf_maint").resolve("index").toString
    IvfIndex.build(graft.Tables.embeddings(spark, Sf0001), path, lists = 8)
    val before = spark.read.parquet(s"$path/lists").count()

    // new vectors cloned from existing ones with fresh ids → their nearest
    // list is exactly their source's list, and a probe must find them
    val newRows = graft.Tables.embeddings(spark, Sf0001)
      .filter(col("vec_id") < 3)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"), col("label"))
    val appended = IvfIndex.append(newRows, path)
    assert(appended === 3L)
    assert(spark.read.parquet(s"$path/lists").count() === before + 3)

    val q = graft.Tables.embeddings(spark, Sf0001).filter(col("vec_id") === 1)
      .head().getAs[collection.Seq[Float]]("embedding").toArray
    val top = IvfIndex.probe(spark, path, q, k = 2, nprobe = 1)
      .collect().map(_.getLong(0)).toSet
    // duplicate vector (id 100001) shares list AND distance with vec 1
    assert(top === Set(1L, 100001L))
  }

  test("compact merges append fragments; rows, probes and sidecars unchanged") {
    val path = graft.util.TempDirs.create("ivf_compact").resolve("index").toString
    val e = graft.Tables.embeddings(spark, Sf0001)
    IvfIndex.build(e.filter(col("vec_id") < 200), path, lists = 4)
    // five appends → file fragments in every touched list partition
    for (lo <- 200L until 500L by 60L)
      IvfIndex.append(
        e.filter(col("vec_id") >= lo && col("vec_id") < lo + 60L), path)
    val q = e.filter(col("vec_id") === 0)
      .head().getAs[collection.Seq[Float]]("embedding").toArray
    val before = IvfIndex.probe(spark, path, q, 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val cents = spark.read.parquet(s"$path/centroids")
      .orderBy("list_id").collect().map(_.toSeq)
    val (nBefore, nAfter) = IvfIndex.compact(spark, path)
    assert(nAfter < nBefore, s"compaction must shrink file count ($nBefore → $nAfter)")
    assert(spark.read.parquet(s"$path/lists").count() === 500L)
    assert(IvfIndex.probe(spark, path, q, 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === before,
      "probe results must be identical after compaction")
    assert(spark.read.parquet(s"$path/centroids")
      .orderBy("list_id").collect().map(_.toSeq) === cents,
      "compaction must not touch the centroid/radius sidecar")
  }

  test("rebalance: skew-triggered rebuild rebalances lists; probe-all stays exact") {
    import graft.functions.{cosine_distance, vector_lit}
    val path = graft.util.TempDirs.create("ivf_rebal").resolve("index").toString
    val e = graft.Tables.embeddings(spark, Sf0001)
    // build on a 100-row subset: its 8 centroids model only that sample
    IvfIndex.build(e.filter(col("vec_id") < 100), path, lists = 8)
    // heavy append stream: a tight jittered blob around vec 0 — the
    // drifting-ingest shape. Frozen centroids pile it into ONE list.
    val base = e.filter(col("vec_id") === 0)
      .head().getAs[collection.Seq[Float]]("embedding").toArray
    val rnd = new scala.util.Random(7)
    val blob = (0 until 300).map { i =>
      (1000L + i, base.map(x => x + 0.15f * rnd.nextGaussian().toFloat).toSeq, 999)
    }.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    IvfIndex.append(blob, path)
    val skewBefore = IvfIndex.listSkew(spark, path).head.getAs[Double]("skew")

    // below-threshold: no-op (appends stay cheap, no surprise rebuilds)
    assert(!IvfIndex.rebalance(spark, path, skewThreshold = skewBefore + 1.0))
    assert(IvfIndex.listSkew(spark, path).head.getAs[Double]("skew") === skewBefore)

    // above-threshold: full re-cluster over every stored row
    assert(IvfIndex.rebalance(spark, path, skewThreshold = 1.0))
    val statAfter = IvfIndex.listSkew(spark, path).head
    val skewAfter = statAfter.getAs[Double]("skew")
    info(f"list skew: before=$skewBefore%.3f after=$skewAfter%.3f")
    assert(statAfter.getAs[Long]("n_rows") === 400L, "rebuild must keep every row")
    assert(statAfter.getAs[Int]("n_lists") === 8)
    assert(skewAfter < skewBefore, "re-clustering must reduce list skew")
    // gross-imbalance guard only: the exact ratio shifts with KMeans init
    // order (k-means|| samples per input partition, so the lists-dataset
    // layout feeds it rows in a layout-dependent order) — the rebalance
    // CONTRACT is the skewAfter < skewBefore assert above
    assert(statAfter.getAs[Long]("max_list").toDouble /
      math.max(statAfter.getAs[Long]("min_list"), 1L) <= 12.0,
      "max/min list-size ratio must stay bounded after rebalance")

    // exactness: probe-all over the rebuilt index ≡ brute force
    val q = e.filter(col("vec_id") === 7)
      .head().getAs[collection.Seq[Float]]("embedding").toArray
    val probeAll = IvfIndex.probe(spark, path, q, k = 10, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = spark.read.parquet(s"$path/lists")
      .select(col("vec_id"), cosine_distance(col("embedding"), vector_lit(q)).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probeAll === exact)
    // radii sidecar regenerated for the new generation (filteredKnn bound)
    val cents = spark.read.parquet(s"$path/centroids")
    assert(cents.columns.contains("radius"))
    assert(cents.count() === 8L)
  }

  test("streaming maintenance with periodic rebalance keeps list skew bounded") {
    import graft.functions.{cosine_distance, vector_lit}
    import graft.streaming.StreamingIngest
    val path = graft.util.TempDirs.create("ivf_srebal").resolve("index").toString
    val e = graft.Tables.embeddings(spark, Sf0001)
    IvfIndex.build(e.filter(col("vec_id") < 100), path, lists = 8)
    // the drifting-ingest stream: a tight jittered blob the frozen
    // centroids would pile into one list (the rebalance spec's shape)
    val base = e.filter(col("vec_id") === 0)
      .head().getAs[collection.Seq[Float]]("embedding").toArray
    val rnd = new scala.util.Random(11)
    val blob = (0 until 300).map { i =>
      (2000L + i, base.map(x => x + 0.15f * rnd.nextGaussian().toFloat).toSeq, 999)
    }.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val src = graft.util.TempDirs.create("ivf_srebal_src").resolve("d").toString
    blob.coalesce(1).write.parquet(src)
    // control: the same stream into a second index WITHOUT rebalance
    val ctlPath = graft.util.TempDirs.create("ivf_srebal_ctl").resolve("index").toString
    IvfIndex.build(e.filter(col("vec_id") < 100), ctlPath, lists = 8)
    val qc = StreamingIngest.startIvfMaintenance(spark, src,
      spark.read.parquet(src).schema, ctlPath,
      org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      rebalanceEvery = 0, skewThreshold = 1.5, maxFilesPerTrigger = None)
    qc.awaitTermination(120000)
    val q = StreamingIngest.startIvfMaintenance(spark, src,
      spark.read.parquet(src).schema, path,
      org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      rebalanceEvery = 1, skewThreshold = 1.5, maxFilesPerTrigger = None)
    q.awaitTermination(120000)
    val ctlSkew = IvfIndex.listSkew(spark, ctlPath).head.getAs[Double]("skew")
    val stat = IvfIndex.listSkew(spark, path).head
    val skew = stat.getAs[Double]("skew")
    info(f"post-stream list skew: rebalanced=$skew%.3f vs control=$ctlSkew%.3f")
    assert(stat.getAs[Long]("n_rows") === 400L)
    assert(skew < ctlSkew,
      s"periodic rebalance must beat the frozen-centroid control ($skew vs $ctlSkew)")
    // the rebuilt index still answers exactly at probe-all
    val qv = e.filter(col("vec_id") === 7)
      .head().getAs[collection.Seq[Float]]("embedding").toArray
    val probeAll = IvfIndex.probe(spark, path, qv, k = 10, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = spark.read.parquet(s"$path/lists")
      .select(col("vec_id"), cosine_distance(col("embedding"), vector_lit(qv)).as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probeAll === exact)
  }

  test("streaming knn serving resolves query batches against the index") {
    import graft.streaming.StreamingIngest
    val indexPath = IndexQueries.indexFor(spark, Sf0001)
    val src = graft.util.TempDirs.create("knn_src").resolve("q").toString
    val out = graft.util.TempDirs.create("knn_out").resolve("r").toString
    val queries = graft.Tables.embeddings(spark, Sf0001)
      .filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    queries.write.parquet(src)
    val q = StreamingIngest.startKnnServing(
      spark, src, queries.schema, indexPath, out, k = 3, nprobe = IndexQueries.Lists)
    q.awaitTermination(120000)
    val results = spark.read.parquet(out)
    assert(results.select("qid").distinct().count() === 4)
    // rank 1 with nprobe=lists is exact → the query vector itself
    val rank1 = results.filter(col("rank") === 1)
      .select("qid", "vec_id").collect()
    assert(rank1.forall(r => r.getLong(0) === r.getLong(1)))
  }
}
