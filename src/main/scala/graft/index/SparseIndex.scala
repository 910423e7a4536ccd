package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Timing.timeIt

/** Inverted-index kNN over sparsevec columns — the scale path for
  * [[graft.operators.SimilarityQueries.sparseKnnTopK]]'s brute-force scan,
  * and the layout every lexical/learned-sparse engine (Lucene, SPLADE
  * serving) uses: posting lists per DIMENSION, so a query touches only the
  * rows sharing at least one non-zero dim with it.
  *
  * Layout at `indexPath/`:
  *  - `postings/` — (dim, vec_id, value), Hive-partitioned on
  *    `bucket = pmod(dim, Buckets)`: a query prunes to ≤ |q.nnz| buckets
  *    and pushes the dim filter into parquet.
  *  - `norms/` — (vec_id, normsq, nnz): normsq accumulated over the values
  *    array IN ASCENDING INDEX ORDER (via the dense [[graft.functions
  *    .inner_product]] over the packed values — the same visit sequence as
  *    [[graft.functions.SparseCosineDistance]]'s merge-walk).
  *
  * EXACT, not approximate: candidates (rows sharing ≥1 dim) get the true
  * distance — the per-candidate dot folds (dim, product) pairs in ascending
  * dim order, reproducing the merge-walk's accumulation bit-for-bit — and
  * every non-candidate's distance is definitionally `1 − 0/(‖x‖·‖q‖)`
  * (exactly 1.0 for non-degenerate rows, NaN for zero vectors — emerging
  * from the same formula, not special-cased). So `sparse_knn_indexed`
  * shares `sparse_knn_topk`'s hash oracle verbatim.
  *
  * Scale shape: the postings read is proportional to Σ df(q's dims), not
  * the corpus; the dot agg carries ≤ |q.nnz| rows per candidate; the
  * non-candidate pad is an anti-join over the NARROW norms sidecar (3
  * columns), needed only because exact top-k must admit distance-1.0 rows
  * when candidates run short — real serving with k ≪ |candidates| prunes
  * it with a cheap count. */
object SparseIndex {

  val Buckets = 32

  /** Build postings + norms from a frame with a sparsevec struct column. */
  def build(df: DataFrame, indexPath: String,
            idCol: String = "vec_id", svCol: String = "sv"): Unit =
    timeIt("sparse_index_build") {
      df.select(col(idCol).cast("long").as("vec_id"),
          explode(arrays_zip(col(s"$svCol.indices"), col(s"$svCol.values"))).as("p"))
        .select(col("vec_id"), col("p.indices").as("dim"), col("p.values").as("value"))
        .withColumn("bucket", pmod(col("dim"), lit(Buckets)))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$indexPath/postings")
      df.select(col(idCol).cast("long").as("vec_id"),
          graft.functions.inner_product(
            col(s"$svCol.values"), col(s"$svCol.values")).as("normsq"),
          size(col(s"$svCol.indices")).cast("long").as("nnz"))
        .write.mode("overwrite").parquet(s"$indexPath/norms")
    }

  /** Exact top-k cosine for one sparse query (parallel `indices`/`values`
    * arrays), through the posting lists. Output: (vec_id, dist, nnz). */
  def knn(spark: SparkSession, indexPath: String,
          qIndices: Array[Int], qValues: Array[Float], k: Int): DataFrame = {
    import spark.implicits._
    // ‖q‖² in ascending index order — the merge-walk's own sequence
    var qn = 0.0
    qValues.foreach { v => qn += v.toDouble * v.toDouble }
    val qSqrt = math.sqrt(qn)
    val qPairs = qIndices.zip(qValues).toSeq.toDF("dim", "qval")
    val buckets = qIndices.map(d => math.floorMod(d, Buckets)).distinct.toIndexedSeq
    val dims = qIndices.toIndexedSeq
    val cand = spark.read.parquet(s"$indexPath/postings")
      .filter(col("bucket").isin(buckets: _*) && col("dim").isin(dims: _*))
      .join(broadcast(qPairs), "dim")
      .select(col("vec_id"), col("dim"),
        // row value × query value, each widened first — the merge-walk's
        // per-shared-dim product (bit-exact; multiply is order-free)
        (col("value").cast("double") * col("qval").cast("double")).as("prod"))
      .groupBy("vec_id")
      // fold products in ascending dim order = the merge-walk's dot sequence
      .agg(aggregate(
        sort_array(collect_list(struct(col("dim"), col("prod")))),
        lit(0.0), (acc, p) => acc + p.getField("prod")).as("dot"))
    val norms = spark.read.parquet(s"$indexPath/norms")
    def distExpr(dot: Column): Column =
      lit(1.0) - dot / (sqrt(col("normsq")) * lit(qSqrt))
    val scored = cand.join(norms, "vec_id")
      .select(col("vec_id"), distExpr(col("dot")).as("dist"), col("nnz"))
    // rows sharing no dim with q: dot = 0 through the SAME formula (1.0 for
    // non-degenerate rows; NaN for zero vectors — identical to brute force)
    val rest = norms.join(cand.select("vec_id"), Seq("vec_id"), "left_anti")
      .select(col("vec_id"), distExpr(lit(0.0)).as("dist"), col("nnz"))
    scored.unionByName(rest)
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }
}
