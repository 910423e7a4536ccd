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
  /** events.ts has shipped in two fixture schemas: parquet TIMESTAMP(NANOS)
    * (Spark's vectorized reader rejects it — read nanos as long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, then truncate to micros)
    * and plain TIMESTAMP_NTZ micros (read directly). This loader adapts to
    * whichever the directory holds and always returns `ts` as TIMESTAMP
    * (UTC session — the NTZ→TZ cast is wall-clock identity there, matching
    * DuckDB's naive read). Queries must not emit sub-µs values.
    *
    * A loader must not mutate session conf as a side effect, so the nanos
    * path only verifies the flag Verify/Bench/SparkSpec already set. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) fixture read as nanos-long
        require(
          spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
          "events requires spark.sql.legacy.parquet.nanosAsLong=true at session construction")
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => // micros timestamp fixture (NTZ or TZ)
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  /** events with `ts` as a MICROSECOND epoch long — for operators whose
    * semantics compare timestamps between rows (as-of / range joins): long
    * comparisons are exact and the DuckDB oracle mirrors them with
    * `epoch_us(ts)`. Adapts to both fixture schemas like [[events]]. */
  def eventsUs(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        require(
          spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
          "eventsUs requires spark.sql.legacy.parquet.nanosAsLong=true at session construction")
        raw.withColumn("ts_us", expr("ts div 1000L")).drop("ts")
      case _ =>
        raw.withColumn("ts_us", unix_micros(col("ts").cast(TimestampType))).drop("ts")
    }
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
