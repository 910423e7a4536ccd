package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Timing.timeIt

/** Table configs — Spark-native analogs of the reference's `DBConfigLocal` /
  * `DBConfigRDS` (/root/reference/src/pgvector_db/utils.py:38-79). A "table"
  * is a parquet directory; credentials/IAM concerns are connection-level and
  * out of engine scope (SURVEY.md §2.8 M8). */
final case class TableConfig(
    tablePath: String,
    batchSize: Int = 1000) // reference default, pg_insert.py:23

/** Ingest sinks — the reference's two write paths re-expressed on Spark's
  * parquet commit protocol (SURVEY.md §3.1-3.2):
  *
  *  - [[DocumentStore.insert]] ≈ `pg_insert` (batched INSERT): validates the
  *    {text, embedding} contract, assigns SERIAL-like ids, appends. The
  *    reference commits per batch (earlier batches survive a failure);
  *    Spark's job commit is all-or-nothing — strictly stronger, documented
  *    deviation. `batchSize` maps to maxRecordsPerFile (file granularity =
  *    the batch granularity analog).
  *  - [[DocumentStore.copy]] ≈ `pg_copy` (binary COPY): accepts a frame OR a
  *    parquet path (pg_copy.py:39-49 input dispatch), infers schema from
  *    the source, stages to a temp dir, then publishes atomically into the
  *    table (the CREATE TEMP TABLE → INSERT INTO … SELECT text, embedding
  *    staging contract, pg_copy.py:55-91, including its hard-coded
  *    two-column projection).
  *
  * Error contract: the reference swallows DatabaseError (pg_insert.py:78-80);
  * this engine deliberately raises (Spark idiom; SURVEY.md §7.2 M9).
  *
  * At scale: appends are executor-parallel file writes, no driver data path;
  * id assignment uses monotonically_increasing_id (unique, not gap-free —
  * exactly SERIAL's contract).
  */
object DocumentStore {

  val RequiredColumns = Seq("text", "embedding")

  private def validate(df: DataFrame): Unit = {
    val missing = RequiredColumns.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"DataFrame must contain columns $RequiredColumns; missing: $missing " +
        "(contract from pg_insert.py:26-28)")
  }

  /** Batched-INSERT analog. Returns the row count written. The input is
    * persisted around count+write so an expensive upstream (e.g. the embed
    * pipeline) executes once, not once per action. */
  def insert(df: DataFrame, config: TableConfig): Long = timeIt("insert") {
    validate(df)
    val materialized = df.persist()
    try {
      val n = materialized.count()
      materialized.select(col("text"), col("embedding"))
        .withColumn("id", monotonically_increasing_id())
        .write
        .option("maxRecordsPerFile", config.batchSize.toLong)
        .mode(SaveMode.Append)
        .parquet(config.tablePath)
      n
    } finally materialized.unpersist()
  }

  /** Bulk-COPY analog: frame or parquet path in, staged atomic append. */
  def copy(data: Either[DataFrame, String], config: TableConfig)
          (implicit spark: SparkSession): Long = timeIt("copy") {
    val src: DataFrame = data match {
      case Left(df) => df
      case Right(path) => spark.read.parquet(path) // schema inferred from file
    }
    validate(src)
    // Stage (temp table analog), then publish with the reference's
    // hard-coded (text, embedding) projection.
    val staging = s"${config.tablePath}_staging_${UUID.randomUUID().toString.take(8)}"
    src.write.mode(SaveMode.Overwrite).parquet(staging)
    val staged = spark.read.parquet(staging)
    val n = staged.count()
    staged.select(col("text"), col("embedding"))
      .withColumn("id", monotonically_increasing_id())
      .write.mode(SaveMode.Append).parquet(config.tablePath)
    val fs = new Path(staging).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true)
    n
  }

  /** Read the table back (schema-on-read; ≈ SELECT * FROM documents). */
  def read(config: TableConfig)(implicit spark: SparkSession): DataFrame =
    spark.read.parquet(config.tablePath)

  /** Source-format flexibility beyond the reference's parquet/pandas inputs:
    * load a document corpus from parquet, orc, json (lines), or csv
    * (header) — the same validated frame feeds any sink above. */
  def readCorpus(path: String, format: String = "parquet")
                (implicit spark: SparkSession): DataFrame = format match {
    case "parquet" => spark.read.parquet(path)
    case "orc" => spark.read.orc(path)
    case "json" => spark.read.json(path)
    case "csv" => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    case other => throw new IllegalArgumentException(
      s"unsupported corpus format: $other (parquet|orc|json|csv)")
  }

  /** Small-file compaction — the maintenance pass every micro-batch-append
    * table needs (each streaming batch / `insert` call lands its own files;
    * thousands of KB-files make every later scan seek-bound and blow up
    * driver file-listing). Rewrites the table into
    * ⌈bytes / targetFileBytes⌉ files via the same stage-then-publish
    * pattern as [[copy]]: write compacted output to a staging dir, swap it
    * in with two renames, delete the old data last — readers never observe
    * a half-written table, and a crash leaves either the old or the new
    * table plus at most an orphaned staging dir. Returns (files before,
    * files after). */
  def compact(tablePath: String, targetFileBytes: Long = 128L * 1024 * 1024)
             (implicit spark: SparkSession): (Int, Int) = timeIt("compact") {
    import graft.util.FsOps
    val conf = spark.sparkContext.hadoopConfiguration
    val table = new Path(tablePath)
    val fs = table.getFileSystem(conf)
    val dataFiles = fs.listStatus(table)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val nBefore = dataFiles.length
    val totalBytes = dataFiles.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    FsOps.swapDir(conf, table) { (live, staging) =>
      spark.read.parquet(live)
        .repartition(nFiles)
        .write.mode(SaveMode.Overwrite).parquet(staging)
    }
    (nBefore, FsOps.countParquetFiles(conf, table))
  }

  /** `save_to_parquet` local analog (generate_embeddings.py:142-146). */
  def saveToParquet(df: DataFrame, path: String): Unit = timeIt("save_to_parquet") {
    df.write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** S3-dataset analog (generate_embeddings.py:132-141): Hive-partitioned by
    * generation_date, append mode — two appends on different dates yield two
    * partitions, both readable (the moto round-trip contract). */
  def saveToParquetPartitioned(df: DataFrame, path: String,
                               dateCol: String = "generation_date"): Unit =
    timeIt("save_to_parquet_partitioned") {
      val withDate =
        if (df.columns.contains(dateCol)) df
        else df.withColumn(dateCol, date_format(current_date(), "yyyy-MM-dd"))
      withDate.write
        .mode(SaveMode.Append)
        .partitionBy(dateCol)
        .parquet(path)
    }
}
