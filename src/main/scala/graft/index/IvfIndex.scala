package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.Normalizer
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.cosine_distance
import graft.util.Timing.timeIt

/** IVFFLAT-analog batch vector index (the reference's
  * `CREATE INDEX ... USING ivfflat (embedding vector_cosine_ops) WITH
  * (lists = 100)` — /root/reference/README.md:185,
  * demo/aws_rds_similarity_search_demo.py:135-139), built as a Spark batch
  * job per the BASELINE.json north star ("batch index creation fits Spark").
  *
  * Build: L2-normalize (cosine ≡ Euclidean on the unit sphere) → KMeans
  * (k = lists, FIXED seed for reproducible verify runs, SURVEY.md §7.2) →
  * assign each vector its nearest-centroid `list_id` → write the index
  * dataset **Hive-partitioned by list_id** + a tiny centroid sidecar.
  *
  * Probe: rank centroids by cosine distance to the query → read ONLY the
  * `nprobe` nearest list partitions (directory-level partition pruning — at
  * 100 TB a probe touches nprobe/lists of the data) → exact cosine top-k
  * within them. `nprobe = lists` degrades to exact search (tested).
  */
object IvfIndex {

  val DefaultLists = 100 // pgvector demo default (README.md:185)
  val Seed = 42L

  /** Build the index dataset at `indexPath`. The lists dataset keeps ALL
    * source columns (so an index scan can substitute for a table scan in
    * the transparent ANN rewrite) plus `list_id`. Returns (rows, lists).
    *
    * ONE metric end to end: KMeans runs with `distanceMeasure=cosine`, so
    * build-time assignment ranks lists exactly like append/probe do
    * (cosine against the centroid — scale-invariant, so the L2-NORMALIZED
    * centroids written to the sidecar rank identically). A mixed scheme
    * (Euclidean assignment at build, cosine at probe) mis-assigns boundary
    * vectors and silently costs recall — pgvector's ivfflat keys the whole
    * index to one opclass metric for the same reason. */
  def build(embeddings: DataFrame, indexPath: String,
            idCol: String = "vec_id", vecCol: String = "embedding",
            lists: Int = DefaultLists): (Long, Int) = timeIt("ivf_build") {
    val spark = embeddings.sparkSession
    val srcCols = embeddings.columns.toSeq
    // cosine is undefined for zero-norm vectors (Spark's cosine KMeans
    // asserts on them): route them to list 0 unconditionally — cosine
    // distance to anything is NaN, so NO list is more correct and probes
    // rank them last either way; everything else flows through KMeans
    val normSq = graft.functions.inner_product(col(vecCol), col(vecCol))
    val withNorm = embeddings.withColumn("_nsq", normSq)
    val zeros = withNorm.filter(col("_nsq") === 0.0)
      .select(srcCols.map(col): _*).withColumn("list_id", lit(0))
    val feats = withNorm.filter(col("_nsq") > 0.0)
      .withColumn("fv", array_to_vector(col(vecCol).cast("array<double>")))
    val normed = new Normalizer().setInputCol("fv").setOutputCol("nfv").setP(2.0)
      .transform(feats)
    val model = new KMeans()
      .setK(lists).setSeed(Seed).setDistanceMeasure("cosine")
      .setFeaturesCol("nfv").setPredictionCol("list_id")
      .fit(normed)
    val assigned = model.transform(normed)
      .select((srcCols :+ "list_id").map(col): _*)
      .unionByName(zeros)
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(s"$indexPath/lists")
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      val arr = c.toArray
      val norm = math.sqrt(arr.map(x => x * x).sum)
      // a zero centroid can only arise from a degenerate/empty cluster —
      // keep it zero rather than writing NaNs into the sidecar
      (i, if (norm == 0.0) arr.map(_.toFloat) else arr.map(x => (x / norm).toFloat))
    }
    spark.createDataFrame(centroids.toIndexedSeq).toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/centroids")
    // metadata-only count of what was just written — NOT assigned.count(),
    // which would re-run normalization + KMeans assignment over the corpus
    (spark.read.parquet(s"$indexPath/lists").count(), lists)
  }

  /** Incremental maintenance — the batch analog of pgvector's ivfflat
    * index update on INSERT (SURVEY.md §4.2): assign NEW vectors to the
    * EXISTING centroids (no re-clustering — exactly ivfflat's behavior,
    * which never moves centroids after build) and append them to their
    * list partitions. Periodic full rebuilds re-balance, as in Postgres.
    * Returns the number of vectors appended. */
  def append(newRows: DataFrame, indexPath: String,
             idCol: String = "vec_id", vecCol: String = "embedding"): Long =
    timeIt("ivf_append") {
      val spark = newRows.sparkSession
      val cents = spark.read.parquet(s"$indexPath/centroids")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(idCol).orderBy(col("cdist"), col("list_id"))
      val srcCols = newRows.columns.toSeq
      val assigned = newRows
        .crossJoin(broadcast(cents))
        .withColumn("cdist", cosine_distance(col(vecCol), col("centroid")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") === 1)
        .select((srcCols :+ "list_id").map(col): _*)
        .persist() // single execution across write + count
      try {
        assigned.write.mode("append").partitionBy("list_id")
          .parquet(s"$indexPath/lists")
        assigned.count()
      } finally assigned.unpersist()
    }

  /** Top-k cosine probe of `nprobe` lists for one query vector. */
  def probe(spark: SparkSession, indexPath: String, query: Array[Float],
            k: Int, nprobe: Int): DataFrame = {
    // index metadata lookup: |lists| rows, driver-side by design
    val centroids = spark.read.parquet(s"$indexPath/centroids")
      .select(col("list_id"),
        cosine_distance(col("centroid"), typedLit(query)).as("cdist"))
      .orderBy(col("cdist"), col("list_id"))
      .limit(nprobe)
      .collect().map(_.getInt(0))
    spark.read.parquet(s"$indexPath/lists")
      .filter(col("list_id").isin(centroids.toIndexedSeq: _*)) // partition pruning
      .select(col("vec_id"),
        cosine_distance(col("embedding"), typedLit(query)).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }

  /** Batch probe: many queries in one distributed pass.
    *
    * Scale shape, stage by stage:
    *  1. centroid ranking per query = broadcast cents × queries, per-query
    *     nprobe-heap ([[graft.functions.top_k_by_distance]]) — no window;
    *  2. the distinct probed list_ids are collected (≤ |lists| ints —
    *     index METADATA, not data) and applied as an explicit `isin`
    *     partition filter on the lists dataset, so the scan provably reads
    *     only the probed directories instead of relying on DPP to fire
    *     for a broadcast join against a file source;
    *  3. per-query top-k again as map-side k-heaps — the shuffle carries
    *     ≤ k·|partitions| rows per query, never the full scored set. */
  def probeMany(spark: SparkSession, indexPath: String, queries: DataFrame,
                qidCol: String, qvecCol: String, k: Int, nprobe: Int): DataFrame = {
    import graft.functions.top_k_by_distance
    val cents = spark.read.parquet(s"$indexPath/centroids")
    val probed = queries
      .select(col(qidCol).cast("long").as("qid"), col(qvecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .select(col("qid"), col("qv"),
        col("list_id").cast("long").as("list_id"),
        cosine_distance(col("centroid"), col("qv")).as("cdist"))
      .groupBy("qid")
      .agg(first(col("qv")).as("qv"),
        top_k_by_distance(col("cdist"), col("list_id"), nprobe).as("top"))
      .select(col("qid"), col("qv"), explode(col("top.vec_id")).as("lid"))
      .select(col("qid"), col("qv"), col("lid").cast("int").as("list_id"))
    // ONE driver-side action computes the centroid ranking (|queries|×nprobe
    // (qid, list_id) pairs — index metadata); the join side is then rebuilt
    // from the collected pairs + the original queries frame, so the ranking
    // stage is never evaluated a second time inside the broadcast join
    import spark.implicits._
    val pairs = probed.select(col("qid"), col("list_id")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val listIds = pairs.map(_._2).distinct.toIndexedSeq
    val probeSide = pairs.toIndexedSeq.toDF("qid", "list_id")
      .join(queries.select(col(qidCol).cast("long").as("qid"),
        col(qvecCol).as("qv")), "qid")
    spark.read.parquet(s"$indexPath/lists")
      .filter(col("list_id").isin(listIds: _*)) // directory-level pruning
      .join(broadcast(probeSide), Seq("list_id"))
      .select(col("qid"), col("vec_id"),
        cosine_distance(col("embedding"), col("qv")).as("dist"))
      .groupBy("qid")
      .agg(top_k_by_distance(col("dist"), col("vec_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rank"),
        col("s.vec_id").as("vec_id"), col("s.dist").as("dist"))
  }
}
