package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed façade for the reference's core entity (SURVEY.md §1.2):
  * `documents(id, text, embedding VECTOR(dim))` reconstructed from the
  * fixture tables (doc_id = vec_id, FIXTURES.md §2). */
final case class Document(id: Long, text: String, embedding: Array[Float])

object Document {
  def dataset(spark: SparkSession, sfDir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .join(Tables.embeddings(spark, sfDir), col("doc_id") === col("vec_id"))
      .select(col("doc_id").as("id"), col("text"), col("embedding"))
      .as[Document]
  }
}

/** Catalog/size introspection — the engine-side analog of the reference's
  * `pg_size_pretty(pg_total_relation_size(...))` and `pg_extension` checks
  * (/root/reference/demo/aws_rds_similarity_search_demo.py:84, 213-216;
  * SURVEY.md §2.2 P11 — not SQL-semantics, so no DuckDB oracle). */
object CatalogOps {

  /** Total on-disk bytes of a table path (pg_total_relation_size analog). */
  def relationSize(spark: SparkSession, tablePath: String): Long = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  /** pg_size_pretty analog. */
  def prettySize(bytes: Long): String = {
    val units = Seq("bytes", "kB", "MB", "GB", "TB")
    var v = bytes.toDouble
    var u = 0
    while (v >= 1024 && u < units.size - 1) { v /= 1024; u += 1 }
    if (u == 0) s"${bytes} bytes" else f"$v%.1f ${units(u)}"
  }

  /** `SELECT extname FROM pg_extension` analog: the vector capability is
    * "installed" when the functions are registered in the session. */
  def installedExtensions(spark: SparkSession): Seq[String] = {
    val fns = Seq("cosine_distance", "cosine_similarity", "l2_distance", "inner_product")
    if (fns.forall(f => spark.catalog.functionExists(f))) Seq("vector") else Seq.empty
  }
}
