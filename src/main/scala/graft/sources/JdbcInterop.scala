package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** JDBC interop — the bridge for users who still need rows in a REAL
  * Postgres/pgvector instance (SURVEY.md §7.1.9 stretch; the reference's
  * `DBConfigRDS` with IAM auth, /root/reference/src/pgvector_db/utils.py:51-79).
  *
  * The engine's own tables are parquet; this sink exists for migration
  * parity only. `tokenProvider` is the IAM hook (M8): called at write time
  * to mint a short-lived password (the reference's
  * `generate_db_auth_token`), kept out of engine scope otherwise.
  * Vectors are serialized to pgvector text literals (`'[x,y,…]'`) so a
  * `::vector` cast on the Postgres side restores them — the reference's own
  * interchange format (demo/aws_rds_demo.py:68).
  *
  * No Postgres exists in this build environment, so the write path is
  * exercised only up to options/plan construction in tests.
  */
final case class JdbcConfig(
    host: String,
    port: Int = 5432,
    database: String = "postgres",
    user: String = "postgres",
    schema: String = "public",
    table: String = "documents",
    sslRequired: Boolean = false,
    batchSize: Int = 1000,
    tokenProvider: Option[() => String] = None,
    password: Option[String] = None) {

  def url: String = {
    val ssl = if (sslRequired) "?sslmode=require" else ""
    s"jdbc:postgresql://$host:$port/$database$ssl"
  }

  def resolvePassword(): String =
    tokenProvider.map(_.apply()).orElse(password).getOrElse(
      throw new IllegalArgumentException("no password or IAM token provider configured"))

  def writerOptions: Map[String, String] = Map(
    "url" -> url,
    "dbtable" -> s"$schema.$table",
    "user" -> user,
    "batchsize" -> batchSize.toString,
    "driver" -> "org.postgresql.Driver")
}

object JdbcInterop {

  /** Render the frame in the reference's (text, embedding-literal) shape. */
  def toPgRows(df: DataFrame): DataFrame = {
    require(DocumentStore.RequiredColumns.forall(df.columns.contains),
      s"frame must contain ${DocumentStore.RequiredColumns}")
    df.select(col("text"), graft.functions.vector_literal(col("embedding")).as("embedding"))
  }

  /** Append into Postgres over JDBC (connects — requires a live server). */
  def write(df: DataFrame, cfg: JdbcConfig): Unit =
    toPgRows(df).write
      .format("jdbc")
      .options(cfg.writerOptions + ("password" -> cfg.resolvePassword()))
      .mode(SaveMode.Append)
      .save()
}
