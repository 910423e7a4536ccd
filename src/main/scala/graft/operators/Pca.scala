package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.JacobiEigen

/** Driver-resident PCA model over an embedding column: per-dim means, the
  * eigenvalues (descending) and unit eigenvectors of the covariance matrix
  * from [[SimilarityQueries.embeddingCovariance]]. Model size is O(d²)
  * doubles — a 64-dim model is 32 KB; it ships to executors as literals
  * inside the projection expressions. */
case class PcaModel(
    means: Array[Double],
    eigenvalues: Array[Double],
    components: Array[Array[Double]]) {
  def dims: Int = means.length
}

/** PCA / whitening over the embeddings table — the decorrelation pass a
  * training-data pipeline runs before quantization (the same rotation
  * family as the OPQ transform in [[graft.index.IvfPqIndex]]) or to cut
  * dimensions ahead of ANN indexing.
  *
  * Scale split: the COVARIANCE is the distributed part (single pass,
  * map-side combined — see embeddingCovariance), and it is oracle-gated
  * bit-exact. The d×d eigensolve is driver-side by design
  * ([[graft.util.JacobiEigen]] — microseconds at d=64, O(d³) work that no
  * cluster should ever see). Projection/whitening are pure per-row
  * codegen'd arithmetic — embarrassingly parallel, no shuffle, no UDF. */
object Pca {

  /** Fit a PCA model in ONE corpus pass: the fused covariance+moments
    * aggregation ([[SimilarityQueries.collectMoments]] — a d(d+1)/2 + d row
    * collect, model-sized, bounded by dimensionality, never by corpus
    * size), means derived driver-side from the exact first-moment decimal
    * sums (order-free, unlike a raw double avg), then a driver-side Jacobi
    * eigensolve. */
  def fit(spark: SparkSession, sfDir: String): PcaModel = {
    val (sij, si, n) = SimilarityQueries.collectMoments(spark, sfDir)
    val cov = SimilarityQueries.covFromMoments(sij, si, n)
    val means = si.map(_.doubleValue / n.toDouble)
    val (vals, vecs) = JacobiEigen.decompose(cov)
    PcaModel(means, vals, vecs)
  }

  /** Σ_d (x_d − μ_d)·v_d as one codegen'd arithmetic expression — no UDF,
    * stays inside whole-stage codegen. */
  private def projectExpr(x: Column, model: PcaModel, comp: Array[Double]): Column =
    (0 until model.dims).map { di =>
      (element_at(x, di + 1).cast("double") - lit(model.means(di))) * lit(comp(di))
    }.reduce(_ + _)

  /** Append `pc`: the k leading principal components of `vecCol`. */
  def project(df: DataFrame, model: PcaModel, k: Int, vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && k <= model.dims, s"k must be in [1, ${model.dims}]")
    df.withColumn("pc",
      array(model.components.take(k).map(c => projectExpr(col(vecCol), model, c)): _*))
  }

  /** Floor added to each eigenvalue before the whitening division, so
    * near-null directions don't explode to huge coordinates. */
  val WhitenEps = 1e-9

  /** Append `white`: the k leading components scaled to unit variance
    * (x − μ)ᵀV diag(1/√(λ+ε)) — the ZCA-lite transform quantizers want. */
  def whiten(df: DataFrame, model: PcaModel, k: Int, vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && k <= model.dims, s"k must be in [1, ${model.dims}]")
    df.withColumn("white",
      array(model.components.take(k).zipWithIndex.map { case (c, ci) =>
        projectExpr(col(vecCol), model, c) /
          lit(math.sqrt(model.eigenvalues(ci).max(0.0) + WhitenEps))
      }: _*))
  }
}
