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
