package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{OracleSql => O, Tables}
import graft.functions.cosine_distance

/** Batch similarity-search operators beyond the reference's single-query
  * top-k: many query vectors resolved in one distributed pass — the shape a
  * training-data pipeline actually runs (dedup candidate lookup, retrieval
  * eval). Brute-force exact is the baseline; the IVF index (graft.index)
  * is the approximate scale path.
  */
object SimilarityQueries {

  val BatchQueries = 5
  val BatchK = 3

  /** Exact top-k neighbors for each of the first [[BatchQueries]] vectors in
    * one pass: broadcast the query side, rank with a window partitioned by
    * query id — shuffle is bounded by |queries|·|base|, and at scale the
    * per-query rank is a map-side heap over the broadcast queries. */
  def knnBatch(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val qs = base.filter(col("vec_id") < BatchQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val w = Window.partitionBy("qid").orderBy(col("dist"), col("vec_id"))
    base.crossJoin(broadcast(qs))
      .select(col("qid"), col("vec_id"),
        cosine_distance(col("embedding"), col("qv")).as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= BatchK)
      .select(col("qid"), col("rank"), col("vec_id"), col("dist"))
      .orderBy("qid", "rank")
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_batch" -> ((s, d) => knnBatch(s, d)),
  )

  def oracles: Map[String, String] = Map(
    "knn_batch" ->
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < $BatchQueries),
         |scored AS (
         |  SELECT q.qid, e.vec_id, ${O.cosDist("e.embedding", "q.qv")} AS dist,
         |    row_number() OVER (PARTITION BY q.qid
         |                       ORDER BY ${O.cosDist("e.embedding", "q.qv")}, e.vec_id) AS rank
         |  FROM embeddings e, q)
         |SELECT qid, rank, vec_id, dist FROM scored
         |WHERE rank <= $BatchK
         |ORDER BY qid, rank""".stripMargin,
  )
}
