package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Temporal join operators Spark lacks natively — as-of join and banded
  * range join — expressed with shapes that hold at 100 TB (builder brief:
  * "when the reference has an operator Spark lacks (as-of join, range
  * join...)"). Both run over the raw nanosecond event timestamps
  * (microsecond epoch longs from [[graft.Tables.eventsUs]]): long
  * comparisons are exact cross-engine, and the DuckDB oracle mirrors them
  * with `epoch_us(ts)` (DuckDB 1.0 truncates TIMESTAMP_NS parquet to µs on
  * read, so µs is the finest cross-engine-exact granularity; DuckDB's
  * native ASOF JOIN is the oracle for the as-of query).
  *
  * Scale shapes:
  *  - as-of join = union + one window over (key, ts): ONE shuffle on the
  *    key, no join node at all — each left row picks up the most recent
  *    right row by a running `last(ignoreNulls)` . The naive formulation
  *    (θ-join on ts ranges, or per-left-row subquery) is quadratic per key.
  *  - range join = bucketize time into window-width bands and equi-join on
  *    (key, band): each left row expands to exactly 2 bands, each right row
  *    to 1, so the join is hash-partitioned and linear in matches — never a
  *    BroadcastNestedLoopJoin. Exact bounds applied as a residual filter.
  */
object TemporalJoins {

  /** Generic as-of join: for each `left` row, the latest `right` row with
    * `right.tsCol <= left.tsCol` and equal `keyCol` (DuckDB/kdb ASOF
    * semantics, inclusive). `rightVals` are carried over (null when no
    * right row precedes). Ties on (key, ts) between right rows resolve to
    * the `tieCol`-largest — deterministic for any input. */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               rightVals: Seq[String], tieCol: String): DataFrame = {
    val lCols = left.columns
    // side 0 = right, 1 = left: at equal ts the right row sorts FIRST so the
    // running last() sees it (inclusive <=); tieCol orders same-ts rights
    val l = left.withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast("long"))
    val r0 = right.select(
      (col(keyCol) +: col(tsCol) +: rightVals.map(c => col(c).as(s"_r_$c"))) :+
        col(tieCol).cast("long").as("_tie"): _*)
      .withColumn("_side", lit(0))
    val unioned = l.unionByName(r0, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val enriched = rightVals.foldLeft(unioned) { case (df, c) =>
      df.withColumn(s"_asof_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    enriched.filter(col("_side") === 1)
      .select(lCols.map(col) ++ rightVals.map(c => col(s"_asof_$c").as(s"asof_$c")): _*)
  }

  val RangeWindowUs: Long = 300L * 1000 * 1000 // 5 minutes

  /** As-of enrich: every click event annotated with the same user's most
    * recent prior-or-simultaneous purchase (ts + value; null before the
    * first purchase). Oracle: DuckDB native ASOF LEFT JOIN. */
  def eventsAsOfJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.eventsUs(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts_us")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("ts_us").as("purchase_ts_us"),
        col("value").as("purchase_value"), col("event_id"))
    asOfJoin(clicks, purchases, "user_id", "ts_us",
      Seq("purchase_ts_us", "purchase_value"), "event_id")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_purchase_ts_us").as("purchase_ts_us"),
        col("asof_purchase_value").as("purchase_value"))
      .orderBy("event_id")
  }

  /** Banded range join: for every error event, how many same-user events
    * (any type) land strictly inside the following [[RangeWindowUs]] window
    * `(ts, ts + W]`. Each error expands to its own band and the next; each
    * candidate event carries one band — the non-equi bound is a residual
    * filter on a plain (user_id, band) hash equi-join. */
  def eventsRangeCount(spark: SparkSession, sfDir: String): DataFrame = {
    val W = RangeWindowUs
    val ev = Tables.eventsUs(spark, sfDir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts_us"))
      .withColumn("band", explode(array(
        expr(s"ts_us div ${W}L"), expr(s"ts_us div ${W}L") + 1L)))
    val candidates = ev.select(
      col("user_id").as("r_user"), col("ts_us").as("r_ts"),
      expr(s"ts_us div ${W}L").as("band"))
    errors
      .join(candidates,
        errors("user_id") === candidates("r_user") &&
          errors("band") === candidates("band") &&
          col("r_ts") > col("ts_us") && col("r_ts") <= col("ts_us") + W,
        "left")
      .groupBy("event_id", "user_id", "ts_us")
      .agg(count(col("r_ts")).as("n_follow"))
      .orderBy("event_id")
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_asof_join" -> ((s, d) => eventsAsOfJoin(s, d)),
    "events_range_count" -> ((s, d) => eventsRangeCount(s, d)),
  )

  def oracles: Map[String, String] = Map(
    "events_asof_join" ->
      """WITH l AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        |  WHERE event_type = 'click'),
        |r AS (
        |  SELECT user_id, epoch_us(ts) AS r_ts, value FROM events
        |  WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, l.ts_us,
        |  r.r_ts AS purchase_ts_us, r.value AS purchase_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts_us >= r.r_ts
        |ORDER BY l.event_id""".stripMargin,
    "events_range_count" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events),
         |l AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'error')
         |SELECT l.event_id, l.user_id, l.ts_us, count(r.ts_us) AS n_follow
         |FROM l LEFT JOIN e r
         |  ON r.user_id = l.user_id
         | AND r.ts_us > l.ts_us AND r.ts_us <= l.ts_us + ${RangeWindowUs}
         |GROUP BY 1, 2, 3
         |ORDER BY l.event_id""".stripMargin,
  )
}
