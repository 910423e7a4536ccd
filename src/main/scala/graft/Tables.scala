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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; read nanos as long and truncate to a micros timestamp (UTC
    * session). DuckDB keeps full ns — queries must not emit raw `ts`, only
    * values truncated to ≥1s granularity (e.g. date_trunc), which agree.
    *
    * REQUIRES `spark.sql.legacy.parquet.nanosAsLong=true` on the session
    * (set at build time by Verify/Bench/Demo/SparkSpec) — a loader must not
    * mutate session conf as a side effect, so it only verifies. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events requires spark.sql.legacy.parquet.nanosAsLong=true at session construction")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  /** events with `ts` as a MICROSECOND epoch long — for operators whose
    * semantics compare timestamps between rows (as-of / range joins): long
    * comparisons are exact and the DuckDB oracle mirrors them with
    * `epoch_us(ts)` (µs is the finest granularity DuckDB 1.0 keeps when
    * reading TIMESTAMP_NS parquet — it truncates, hence `div 1000` here).
    * Same nanosAsLong session requirement. */
  def eventsUs(spark: SparkSession, sfDir: String): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "eventsUs requires spark.sql.legacy.parquet.nanosAsLong=true at session construction")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts_us", org.apache.spark.sql.functions.expr("ts div 1000L"))
      .drop("ts")
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
