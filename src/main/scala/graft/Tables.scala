package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  * A "table" in this engine is a parquet path — the Spark-native analog of
  * the reference's Postgres tables (SURVEY.md §1.2). Scans are columnar and
  * vectorized; filters/projections placed on these frames push down to the
  * parquet reader (verified via `.explain("formatted")` → PushedFilters).
  */
object Tables {
  /** Round-robin repartition to the session's shuffle parallelism, placed
    * immediately BEFORE a heavy fan-out stage (an explode or per-row codec
    * that multiplies work ≥100×). Parallelism must come from ROWS there,
    * not input splits: a single-row-group parquet file (the fixture shape;
    * also common for small dimension/staging tables at scale) scans as ONE
    * task no matter the split config, so the fan-out CPU would all land on
    * one core. A cheap exchange of small source rows ahead of the heavy
    * stage is the correct shape at 100 TB too. */
  private[graft] def rowParallel[T](ds: org.apache.spark.sql.Dataset[T]): org.apache.spark.sql.Dataset[T] =
    ds.repartition(ds.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
  /** The ONE implementation of the events `ts` schema duality, shared by
    * the batch loaders below and the streaming sources
    * ([[graft.streaming.StreamingIngest]]): fixtures have shipped `ts` as
    * parquet TIMESTAMP(NANOS) (Spark's vectorized reader rejects it --
    * read nanos as long under `spark.sql.legacy.parquet.nanosAsLong=true`,
    * truncate to micros) and as a plain micros timestamp (NTZ or TZ --
    * cast; wall-clock identity under the UTC session, matching DuckDB's
    * naive read). Returns a TIMESTAMP-typed column for the given source
    * schema. Queries must not emit sub-microsecond values. */
  private[graft] def tsAsTimestamp(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast(org.apache.spark.sql.types.TimestampType)
    }
  }

  /** Read events.parquet, translating the raw "Illegal Parquet type"
    * schema-inference failure on a TIMESTAMP(NANOS) fixture into the
    * actionable message (the flag must be set at SESSION construction --
    * a loader must not mutate conf as a side effect, so it can only
    * instruct). */
  private def readEvents(spark: SparkSession, sfDir: String): DataFrame =
    try spark.read.parquet(s"$sfDir/events.parquet")
    catch {
      case e: Exception if String.valueOf(e.getMessage).contains("NANOS") =>
        throw new IllegalStateException(
          "events.parquet carries TIMESTAMP(NANOS): set " +
            "spark.sql.legacy.parquet.nanosAsLong=true at session construction",
          e)
    }

  /** events with `ts` normalized to TIMESTAMP -- see [[tsAsTimestamp]]. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = readEvents(spark, sfDir)
    raw.withColumn("ts", tsAsTimestamp(raw.schema))
  }
  /** events with `ts` as a MICROSECOND epoch long -- for operators whose
    * semantics compare timestamps between rows (as-of / range joins): long
    * comparisons are exact and the DuckDB oracle mirrors them with
    * `epoch_us(ts)`. Adapts to both fixture schemas like [[events]]. */
  def eventsUs(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.unix_micros
    val raw = readEvents(spark, sfDir)
    raw.withColumn("ts_us", unix_micros(tsAsTimestamp(raw.schema))).drop("ts")
  }
  def lineitem(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/lineitem.parquet")
  def orders(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/orders.parquet")
  def customer(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/customer.parquet")
  def part(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/part.parquet")
  def supplier(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/supplier.parquet")
  def nation(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/nation.parquet")
  def region(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/region.parquet")
}
