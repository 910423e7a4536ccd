package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Timing.timeIt

/** Product quantization — the compression lever past SQ8: split each
  * d-dim vector into `m` subspaces of d/m dims, learn a per-subspace
  * KMeans codebook, and store each vector as `m` byte codes. At d=384
  * float32 (the reference's embedding width, SURVEY.md §1.1) and m=16,
  * 1536 B become 16 B — a 96× smaller scan; top-k over codes is the
  * classic ADC (asymmetric distance computation): the query precomputes a
  * (m × codes) lookup table once, then every row costs m table lookups
  * and adds instead of d multiplies.
  *
  * Cosine on codes: vectors are L2-normalized before encoding (cosine ≡
  * dot on the unit sphere); ADC reconstructs dot(q, x̂) = Σₛ dot(qₛ, cₛ)
  * and norm ‖x̂‖² = Σₛ ‖cₛ‖² from two per-subspace LUTs, giving
  * 1 − dot/(‖q‖·‖x̂‖) — the standard PQ-cosine approximation (exact for
  * the reconstruction x̂, approximate for x).
  *
  * Scale shape: training is m independent KMeans fits (each a distributed
  * pass; at 100 TB train on a sample — codebooks need ~100k rows, not the
  * corpus). Encoding and scoring are narrow per-row maps over a broadcast
  * codebook/LUT — shuffle-free; top-k is TakeOrderedAndProject. Like
  * `ivf_knn`/`hnsw_knn`, answers depend on KMeans assignments → recall-
  * gated in PqIndexSpec rather than DuckDB-oracled; the build's
  * exactly-once cardinality contract IS oracle-checked (`pq_build`).
  */
object PqIndex {

  /** Subspace count (d must be divisible by m). Finer subspaces (4-dim at
    * the fixtures' d=64) cost bytes but recover recall on unclusterable
    * corpora; production tunes m per corpus. */
  val DefaultM = 16
  /** Codebook size per subspace (≤ 256 so a code fits one byte). */
  val DefaultCodes = 64
  val Seed = 42L

  final case class Encoded(vec_id: Long, codes: Array[Byte])

  private def l2normalize(v: Array[Float]): Array[Double] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    v.map(_.toDouble * inv)
  }

  /** Train per-subspace codebooks and encode the corpus at `indexPath`:
    * `codebook` (sub, code, centroid array<double>) + `codes`
    * (vec_id, codes array<byte>). Returns encoded row count. */
  def build(embeddings: DataFrame, indexPath: String,
            m: Int = DefaultM, codes: Int = DefaultCodes,
            idCol: String = "vec_id", vecCol: String = "embedding"): Long =
    timeIt("pq_build") {
      val spark = embeddings.sparkSession
      import spark.implicits._
      val dim = embeddings.select(size(col(vecCol))).head().getInt(0)
      require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
      val subDim = dim / m
      // unit-normalize once (cosine ≡ dot on the sphere), then slice
      val normSq = aggregate(col(vecCol), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double"))
      val unit = embeddings.select(col(idCol).cast("long").as("vec_id"),
        transform(col(vecCol), x => x.cast("double") / sqrt(normSq)).as("u"))
        .persist()
      val codebook = (0 until m).flatMap { s =>
        val sliced = unit.select(
          array_to_vector(slice(col("u"), s * subDim + 1, subDim)).as("fv"))
        val model = new KMeans()
          .setK(codes).setSeed(Seed + s)
          .setFeaturesCol("fv").setPredictionCol("c")
          .fit(sliced)
        model.clusterCenters.zipWithIndex.map { case (c, i) => (s, i, c.toArray) }
      }
      codebook.toDF("sub", "code", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/codebook")
      // encode: nearest sub-centroid per subspace (L2; lowest code on ties)
      val cb: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
        codebook.filter(_._1 == s).sortBy(_._2).map(_._3).toArray
      }
      val bc = spark.sparkContext.broadcast(cb)
      unit.as[(Long, Array[Double])]
        .map { case (id, u) =>
          val out = new Array[Byte](m)
          var s = 0
          while (s < m) {
            val cents = bc.value(s)
            var best = 0; var bestD = Double.MaxValue
            var c = 0
            while (c < cents.length) {
              var d = 0.0; var j = 0
              while (j < subDim) {
                val diff = u(s * subDim + j) - cents(c)(j); d += diff * diff; j += 1
              }
              if (d < bestD) { bestD = d; best = c }
              c += 1
            }
            out(s) = best.toByte
            s += 1
          }
          Encoded(id, out)
        }
        .toDF()
        .write.mode("overwrite").parquet(s"$indexPath/codes")
      unit.unpersist()
      spark.read.parquet(s"$indexPath/codes").count()
    }

  /** ADC top-k: precompute dot/norm LUTs for `q` from the codebook
    * (driver-side, m×codes doubles — index METADATA), then score every
    * code row with m lookups and take the global top-k. */
  def search(spark: SparkSession, indexPath: String, q: Array[Float],
             k: Int): DataFrame = {
    import spark.implicits._
    val cbRows = spark.read.parquet(s"$indexPath/codebook")
      .select("sub", "code", "centroid")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getAs[collection.Seq[Double]](2).toArray))
    val m = cbRows.iterator.map(_._1).max + 1
    val codes = cbRows.iterator.map(_._2).max + 1
    val subDim = cbRows.head._3.length
    val qu = l2normalize(q)
    require(qu.length == m * subDim, s"query dim ${qu.length} != ${m * subDim}")
    val dotLut = Array.ofDim[Double](m, codes)
    val nrmLut = Array.ofDim[Double](m, codes)
    cbRows.foreach { case (s, c, cent) =>
      var dot = 0.0; var nn = 0.0; var j = 0
      while (j < subDim) {
        dot += qu(s * subDim + j) * cent(j); nn += cent(j) * cent(j); j += 1
      }
      dotLut(s)(c) = dot; nrmLut(s)(c) = nn
    }
    val bcDot = spark.sparkContext.broadcast(dotLut)
    val bcNrm = spark.sparkContext.broadcast(nrmLut)
    spark.read.parquet(s"$indexPath/codes").as[Encoded]
      .map { e =>
        var dot = 0.0; var nn = 0.0; var s = 0
        while (s < e.codes.length) {
          val c = e.codes(s) & 0xff
          dot += bcDot.value(s)(c); nn += bcNrm.value(s)(c); s += 1
        }
        val dist = if (nn == 0.0) 1.0 else 1.0 - dot / math.sqrt(nn)
        (e.vec_id, dist)
      }
      .toDF("vec_id", "dist")
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }

  /** ADC + exact re-rank — the production PQ shape: retrieve
    * `overfetch·k` candidates by ADC over the compressed codes, then
    * re-rank ONLY those with the exact cosine against the full vectors
    * (candidate ids pushed into the base scan as an `isin` filter). Recall
    * approaches exact while the full-precision read is overfetch·k rows,
    * not the corpus. */
  def searchRerank(spark: SparkSession, indexPath: String, base: DataFrame,
                   q: Array[Float], k: Int, overfetch: Int = 4,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.{cosine_distance, vector_lit}
    val candIds = search(spark, indexPath, q, k * overfetch)
      .select("vec_id").collect().map(_.getLong(0)).toIndexedSeq
    base.filter(col(idCol).isin(candIds: _*))
      .select(col(idCol).cast("long").as("vec_id"),
        cosine_distance(col(vecCol), vector_lit(q)).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }
}
