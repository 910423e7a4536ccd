package graft.index

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.IndexQueries

class IvfMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("append assigns new vectors to existing centroids; probe finds them") {
    // fresh index copy so we don't mutate the cached shared one
    val path = Files.createTempDirectory("ivf_maint").resolve("index").toString
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
    val path = Files.createTempDirectory("ivf_compact").resolve("index").toString
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

  test("streaming knn serving resolves query batches against the index") {
    import graft.streaming.StreamingIngest
    val indexPath = IndexQueries.indexFor(spark, Sf0001)
    val src = Files.createTempDirectory("knn_src").resolve("q").toString
    val out = Files.createTempDirectory("knn_out").resolve("r").toString
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
