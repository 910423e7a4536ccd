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

  /** Deterministic random orthogonal matrix (seeded Gaussian + modified
    * Gram-Schmidt) — the OPQ-style rotation: subspace quantization wastes
    * codebooks when the corpus' energy concentrates in a few dimensions
    * (one subspace carries all variance, the rest encode noise); rotating
    * by a random orthonormal basis spreads variance evenly across
    * subspaces, the standard cheap stand-in for learned OPQ (and exact for
    * cosine: an orthogonal map preserves dot products and norms, so
    * distances in rotated space EQUAL distances in the original). */
  private[index] def rotationMatrix(dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    val r = Array.fill(dim, dim)(rnd.nextGaussian())
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < i) { // subtract projections onto previous rows
        var d = 0.0; var k0 = 0
        while (k0 < dim) { d += r(i)(k0) * r(j)(k0); k0 += 1 }
        var k1 = 0
        while (k1 < dim) { r(i)(k1) -= d * r(j)(k1); k1 += 1 }
        j += 1
      }
      var n = 0.0; var k2 = 0
      while (k2 < dim) { n += r(i)(k2) * r(i)(k2); k2 += 1 }
      val inv = 1.0 / math.sqrt(n)
      var k3 = 0
      while (k3 < dim) { r(i)(k3) *= inv; k3 += 1 }
      i += 1
    }
    r
  }

  private[index] def applyRotation(rot: Array[Array[Double]], u: Array[Double]): Array[Double] = {
    val out = new Array[Double](u.length)
    var i = 0
    while (i < rot.length) {
      val row = rot(i); var d = 0.0; var j = 0
      while (j < row.length) { d += row(j) * u(j); j += 1 }
      out(i) = d
      i += 1
    }
    out
  }

  /** Load the rotation sidecar if this index was built with `rotate=true`. */
  private[index] def loadRotation(spark: SparkSession, indexPath: String): Option[Array[Array[Double]]] = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/rotation")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read.parquet(p.toString)
      .orderBy("i").collect()
      .map(_.getAs[collection.Seq[Double]]("row").toArray))
  }

  /** Train per-subspace codebooks and encode the corpus at `indexPath`:
    * `codebook` (sub, code, centroid array<double>) + `codes`
    * (vec_id, codes array<byte>). Returns encoded row count. */
  def build(embeddings: DataFrame, indexPath: String,
            m: Int = DefaultM, codes: Int = DefaultCodes,
            idCol: String = "vec_id", vecCol: String = "embedding",
            rotate: Boolean = false): Long =
    timeIt("pq_build") {
      val spark = embeddings.sparkSession
      import spark.implicits._
      val dim = embeddings.select(size(col(vecCol))).head().getInt(0)
      require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
      val subDim = dim / m
      // unit-normalize once (cosine ≡ dot on the sphere), then slice.
      // The norm is projected per ROW before the transform — inlining the
      // aggregate() HOF into the lambda re-runs it per element (O(d²))
      val normSq = graft.functions.inner_product(col(vecCol), col(vecCol))
      val unit0 = embeddings
        .select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("_v"),
          sqrt(normSq).as("_nrm"))
        .select(col("vec_id"),
          transform(col("_v"), x => x.cast("double") / col("_nrm")).as("u"))
        .persist()
      // OPQ-style rotation (see rotationMatrix): codebooks train and codes
      // encode in the ROTATED space; queries rotate at search time. A
      // stale sidecar from a previous in-place build must not survive a
      // non-rotated rebuild.
      val rotPath = new org.apache.hadoop.fs.Path(s"$indexPath/rotation")
      val fs = rotPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(rotPath)) fs.delete(rotPath, true)
      val unit = if (!rotate) unit0 else {
        val rot = rotationMatrix(dim, Seed)
        rot.zipWithIndex.map { case (row, i) => (i, row.toSeq) }.toSeq
          .toDF("i", "row")
          .coalesce(1).write.mode("overwrite").parquet(rotPath.toString)
        val bcR = spark.sparkContext.broadcast(rot)
        unit0.as[(Long, Array[Double])]
          .map { case (id, u) => (id, applyRotation(bcR.value, u)) }
          .toDF("vec_id", "u")
          .persist()
      }
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
      unit.unpersist(); unit0.unpersist()
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
    val qu0 = l2normalize(q)
    // rotated index → rotate the query into the same space (orthogonal, so
    // cosine distances are unchanged)
    val qu = loadRotation(spark, indexPath).map(applyRotation(_, qu0)).getOrElse(qu0)
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

  /** EXACT twin of [[searchRerank]]: the candidate pool is the ENTIRE code
    * set, so the exact re-rank over it IS the exact top-k — which makes
    * this form oracle-checkable (brute-force cosine in SQL), giving the
    * driver hash-level evidence that the ADC machinery ranks the right
    * ids. Still exercises the full PQ read path: every candidate id flows
    * out of the codes dataset through the ADC ranking before the re-rank.
    * The candidate frame here is CORPUS-SIZED, so it joins the base table
    * by a plain shuffled left_semi (an `isin` literal chain or a broadcast
    * would both be corpus-sized driver/executor memory); AQE is free to
    * downgrade to broadcast only if the runtime size allows. A
    * verification query: production probes stay overfetch-bounded
    * ([[searchRerank]]). */
  def searchRerankAll(spark: SparkSession, indexPath: String, base: DataFrame,
                      q: Array[Float], k: Int,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.{cosine_distance, vector_lit}
    val nCodes = spark.read.parquet(s"$indexPath/codes").count()
    val pool = math.min(nCodes, Int.MaxValue.toLong).toInt
    val cands = search(spark, indexPath, q, pool)
      .select(col("vec_id").as("_cand_id"))
    base.join(cands, col(idCol).cast("long") === col("_cand_id"), "left_semi")
      .select(col(idCol).cast("long").as("vec_id"),
        cosine_distance(col(vecCol), vector_lit(q)).as("dist"))
      .orderBy(col("dist"), col("vec_id"))
      .limit(k)
  }
}
