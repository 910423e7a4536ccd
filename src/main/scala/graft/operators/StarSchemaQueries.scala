package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Extension surface beyond the reference (SURVEY.md §7.1.8): classic
  * OLAP equi-join / aggregation / window queries over the TESTDATA star
  * schema — the workloads a user of the reference's Postgres tables would
  * also run, expressed Spark-first.
  *
  * Scale design:
  *  - dimension tables (region/nation/customer/part) are `broadcast()` —
  *    no shuffle of the fact table for dim joins at any scale;
  *  - aggregations are partial (map-side) + final hash aggregates —
  *    Catalyst's default — so shuffle volume is |groups|, not |rows|;
  *  - top-k always via orderBy+limit → TakeOrderedAndProject (bounded heap
  *    per partition, k-row driver merge), never a global sort;
  *  - window functions shuffle once on the partition key (user_id), the
  *    natural key distribution at 100 TB.
  *
  * Oracle exactness: every float aggregate goes through
  * `CAST(x AS DECIMAL(18,2))` per row → exact integer-scaled SUM → single
  * `CAST(... AS DOUBLE)` (and one double division for AVG), which both
  * Spark and DuckDB reproduce bit-for-bit regardless of row order. No
  * double can sit exactly on a half-ulp boundary of a scale≥2 decimal
  * (midpoints require a factor-5 denominator, impossible in binary), so
  * the per-row cast is also collision-free.
  */
object StarSchemaQueries {

  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact revenue sum: Σ price·(1−discount) in decimal, cast to double. */
  private def revenue: Column =
    sum(dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))).cast("double")

  private val revenueSql =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

  /** TPC-H Q1-style pricing summary over lineitem. */
  def q1Agg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1999-12-31 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        revenue.as("sum_disc_price"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q6-style forecasting revenue: pure scan + conjunctive filter +
    * one global aggregate — every predicate (date range, discount band,
    * quantity cap) reaches PushedFilters, so at 100 TB the scan skips row
    * groups on min/max stats before any row is materialized. The per-row
    * price×discount product rounds through DECIMAL(18,4) (doubles with ≤2
    * decimals each ⇒ the product carries ≤4), making the sum
    * order-independent and bit-exact cross-engine. */
  def q6ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .filter(
        col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        sum((col("l_extendedprice") * col("l_discount")).cast(DecimalType(18, 4)))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  /** TPC-H Q10-style returned-item report: top-20 customers by revenue
    * lost to returns in one quarter. Fact-to-fact (lineitem×orders) joins
    * shuffle on the order key with both sides pre-filtered (returnflag,
    * date quarter — both pushed down); customer joins on the shuffled key;
    * the 25-row nation dim broadcasts; final top-20 is
    * TakeOrderedAndProject. */
  def q10ReturnedCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = Tables.orders(spark, sfDir)
      .filter(
        col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
      .select("o_orderkey", "o_custkey")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, sfDir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Full-outer join breadth: per-nation customer vs supplier account
    * balance. Both sides pre-aggregate to ≤|nations| rows BEFORE the join
    * (aggregate-then-join: the join moves 25 rows, not 150k), the nation
    * dim broadcasts, and FULL OUTER + coalesce covers nations with only
    * one side present. */
  def nationBalance(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(sum(dec2(col("c_acctbal"))).cast("double").as("cust_bal"),
        count(lit(1)).as("n_cust"))
    val supp = Tables.supplier(spark, sfDir)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(sum(dec2(col("s_acctbal"))).cast("double").as("supp_bal"),
        count(lit(1)).as("n_supp"))
    cust.join(supp, Seq("nationkey"), "full_outer")
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("cust_bal"), lit(0.0d)).as("cust_bal"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        coalesce(col("supp_bal"), lit(0.0d)).as("supp_bal"))
      .orderBy("n_name")
  }

  /** Inter-event gap profiling via `lead`: for each user the time to their
    * next event, rolled up per event type (engagement cadence). The window
    * partitions on user_id — bounded per-user groups, the same safe shape
    * as sessionization — and the rollup is one partial+final agg. µs epoch
    * longs keep the arithmetic integer-exact cross-engine. */
  def eventsGaps(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    Tables.eventsUs(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts_us"))
      .withColumn("gap_us", lead(col("ts_us"), 1).over(w) - col("ts_us"))
      .filter(col("gap_us").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        // integer division on both engines (double-divide + cast would
        // truncate in Spark but round in DuckDB)
        expr("sum(gap_us) div count(*)").as("mean_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
      .orderBy("event_type")
  }

  /** TPC-H Q3-style: top-10 open orders by revenue for one segment. */
  def q3TopOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-06-30 00:00:00")))
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1998-06-30 00:00:00")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(revenue.as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: revenue by nation within one region. */
  def q5NationRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val reg = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(spark, sfDir)
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = Tables.customer(spark, sfDir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey", "n_name")
    Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("n_name")
      .agg(revenue.as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Top-10 customers by total order spend. */
  def topCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val spend = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(
        sum(dec2(col("o_totalprice"))).cast("double").as("spend"),
        count(lit(1)).as("n_orders"))
    spend.join(broadcast(Tables.customer(spark, sfDir)),
        col("o_custkey") === col("c_custkey"))
      .select("c_custkey", "c_name", "spend", "n_orders")
      .orderBy(col("spend").desc, col("c_custkey"))
      .limit(10)
  }

  /** Window: top-3 events per user by value (row_number over user_id). */
  def eventsTopPerUser(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("user_id", "rn", "event_id", "event_type", "value")
      .orderBy("user_id", "rn")
  }

  /** Hourly event rollup (batch form of the streaming windowed agg). */
  def eventsHourly(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(
        col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast("double").as("sum_value"))
      .orderBy("event_type", "hour")

  /** Rolling frame width (days) for [[eventsDailyMa]]. */
  val MaDays = 7

  /** 7-day rolling average of daily volume per event type — the smoothing
    * pass dashboards and alerting baselines run over the daily rollup
    * (the ROWS-frame rolling shape; [[eventsHourlyAnomaly]] is its
    * global-moments cousin). The day axis is DENSIFIED over each type's
    * [first, last] span, so interior zero-volume days pull the average
    * down and post-gap frames never average weeks-old rows as adjacent;
    * partial leading frames average what exists, the standard warm-up
    * semantics both engines share.
    *
    * Scale shape: the corpus collapses in the daily hash agg first; the
    * rolling window then runs over (type × day) CELLS — partitions
    * bounded by the time span, never event volume (chunk by month if a
    * deployment's day count ever outgrows a partition). Exactness: the
    * frame sum is ≤ [[MaDays]] exact integer counts; ma7 is ONE double
    * division written identically in both engines (never AVG, whose
    * internal accumulation order is engine-private). */
  def eventsDailyMa(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    // densify each type's own [first, last] day span: an interior
    // zero-volume day must PULL THE AVERAGE DOWN and a post-gap frame
    // must not average rows from weeks earlier as if adjacent
    val span = daily.groupBy("event_type").agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val grid = span.select(col("event_type"),
      explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("d"))
    val dense = grid.join(daily, Seq("event_type", "d"), "left").na.fill(0L, Seq("n"))
    val w = Window.partitionBy("event_type").orderBy("d")
      .rowsBetween(-(MaDays - 1), Window.currentRow)
    dense
      .select(col("event_type"), date_format(col("d"), "yyyy-MM-dd").as("day"), col("n"),
        (sum(col("n")).over(w).cast("double") / count(col("n")).over(w)).as("ma7"))
      .orderBy("event_type", "day")
  }

  /** |z| threshold for [[eventsHourlyAnomaly]]. */
  val AnomalyZ = 2.0

  /** Hourly volume anomalies per event type — the rate-spike/outage
    * monitor every event pipeline runs over its rollup: z-score each
    * (type, hour) count against that type's own hourly mean/σ — computed
    * over the DENSE hour grid of the type's [first, last] span, so total
    * outages appear as zero cells instead of vanishing from both the
    * output and the baseline — and keep |z| ≥ [[AnomalyZ]].
    *
    * Scale shape: the corpus collapses in the [[eventsHourly]]-style hash
    * agg (type × hour cells); moments are a second |cells|-sized agg;
    * the z computation is a broadcast-sized join back onto cells. No
    * windows. Exactness: integer counts (sums of counts and squares exact
    * in double), then a FIXED chain of IEEE ops — mean and m2 divisions,
    * one subtraction, a ≤0 clamp, sqrt, one division — mirrored stage for
    * stage in the oracle CTEs so both engines reuse the same intermediate
    * values; σ=0 degenerates to z=0 via the same CASE both sides. */
  def eventsHourlyAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val observed = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    // densify each type's own [first, last] hour span: a TOTAL outage
    // produces no cell in the raw agg, making the most anomalous hours
    // structurally invisible and biasing the baseline mean upward —
    // silent hours must appear as zero cells (a type is not penalized
    // for hours before its launch or after its retirement)
    val span = observed.groupBy("event_type").agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val grid = span.select(col("event_type"),
      explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    val hourly = grid.join(observed, Seq("event_type", "h"), "left")
      .na.fill(0L, Seq("n"))
      .select(col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"), col("n"))
    val s1 = hourly.groupBy("event_type")
      .agg((sum(col("n")).cast("double") / count(lit(1))).as("m"),
        (sum(col("n") * col("n")).cast("double") / count(lit(1))).as("m2"))
    val s2 = s1.select(col("event_type"), col("m"), (col("m2") - col("m") * col("m")).as("v"))
    val s3 = s2.select(col("event_type"), col("m"),
      sqrt(when(col("v") > 0.0, col("v")).otherwise(0.0)).as("sd"))
    hourly.join(broadcast(s3), "event_type")
      .select(col("event_type"), col("hour"), col("n"),
        when(col("sd") === 0.0, 0.0)
          .otherwise((col("n").cast("double") - col("m")) / col("sd")).as("z"))
      .filter(abs(col("z")) >= AnomalyZ)
      .orderBy("event_type", "hour")
  }

  /** Sessionization: split each user's event stream at >30-min inactivity
    * gaps (lag + running sum of session starts — the standard two-window
    * formulation), then per-session rollup. All arithmetic on INTEGER epoch
    * seconds so the ns-precision DuckDB timestamps and Spark's µs agree
    * exactly. One shuffle on user_id; at scale this is the batch form of
    * the streaming state operator. */
  val SessionGapSeconds = 1800L
  def eventsSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("sec"), col("event_id"))
    val secs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_seconds(col("ts")).as("sec"))
    val sessions = secs
      .withColumn("prev", lag(col("sec"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev").isNull || col("sec") - col("prev") > SessionGapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
    sessions.groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("sec")) - min(col("sec"))).as("duration_s"))
      .orderBy("user_id", "session_id")
  }

  /** Exact distinct users per event type — the cardinality rollup behind
    * any engagement dashboard. Spark plans COUNT(DISTINCT) as a two-phase
    * expand/partial-agg (distinct on (event_type, user_id) map-side, then
    * count) — no reducer ever holds a full user set. At 100 TB the
    * approximate path is `approx_count_distinct` (HyperLogLog++, fixed
    * ~kB sketch per group, mergeable across partitions); its ≤2% relative
    * error vs this exact query is pinned in StarSchemaSpec — the sketch
    * itself has no DuckDB twin, so the exact form carries the oracle. */
  def eventsDistinctUsers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** HyperLogLog++ twin of [[eventsDistinctUsers]] — the cardinality
    * sketch every 100 TB pipeline reaches for when exact countDistinct's
    * per-group hash set stops fitting: Spark's codegen'd
    * `approx_count_distinct` (HLL++, Heule et al. 2013) keeps a
    * CONSTANT-size sketch per (group × partition) and merges sketches at
    * the shuffle, so memory is O(groups · sketch), independent of
    * cardinality. rsd=2% (vs Spark's 0.05 default — tighter error for 6×
    * the sketch; halving rsd quadruples sketch size).
    * Approximate by construction → no DuckDB oracle (rows-only gate);
    * tolerance vs the exact twin is spec-pinned. */
  def eventsDistinctUsersApprox(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("n_users_approx"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** Semi-structured: JSON props extraction + rollup. */
  def eventsPropsAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Catalog-style rollup over part. */
  def partsByBrand(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_parts"),
        (sum(dec2(col("p_retailprice"))).cast("double") / count(lit(1))).as("avg_price"))
      .orderBy("p_brand")

  /** Anti join: customers that never ordered. */
  def customersNoOrders(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Semi join: orders containing at least one high-value line item. */
  def ordersSemiHighValue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir).filter(col("l_extendedprice") > 90000.0),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_orderstatus")
      .orderBy("o_orderkey")

  /** ROLLUP pricing summary — hierarchical subtotals (flag, flag+status,
    * grand total) in ONE pass: Spark expands grouping sets inside the same
    * partial+final hash aggregate, so the shuffle carries Σ|grouping-set
    * groups| rows, not one job per level. Rollup NULL markers are projected
    * to 'ALL' (fact columns are non-null here) so both engines emit
    * identical label rows; sums are decimal-exact like q1. */
  def lineitemRollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        revenue.as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("sum_disc_price"), col("count_order"))
      .orderBy("returnflag", "linestatus")

  /** CUBE over (event_type, weekday): all four grouping-set combinations
    * (type×day, type, day, grand total) in ONE partial+final aggregate —
    * Spark expands the grouping sets map-side, so the cube costs one
    * shuffle of |types|·|days| + |types| + |days| + 1 groups, not four
    * scans. Weekday from integer epoch-µs division (µs is the finest
    * cross-engine-exact granularity; date_format would work too but the
    * integer form is immune to locale/timezone drift). */
  def eventsCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.eventsUs(spark, sfDir)
      .select(col("event_type"), expr("(ts_us div 86400000000L) % 7").as("weekday"),
        col("value"))
      .cube("event_type", "weekday")
      .agg(count(lit(1)).as("n"), sum(dec2(col("value"))).cast("double").as("sum_value"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("event_type"),
        coalesce(col("weekday").cast("string"), lit("ALL")).as("weekday"),
        col("n"), col("sum_value"))
      .orderBy("event_type", "weekday")

  /** Daily × event-type PIVOT of event counts — the wide-format activity
    * matrix (dashboards, feature tables). Explicit pivot values keep the
    * plan static (no driver-side distinct scan) and the whole pivot is one
    * partial+final aggregate over |days| groups. */
  val PivotEventTypes = Seq("click", "error", "purchase", "signup", "view")
  def eventsPivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .groupBy("day").pivot("event_type", PivotEventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, PivotEventTypes)
      .orderBy("day")

  /** Exact per-type value quantiles (p50/p90/p99) — the latency/value
    * distribution summary. Spark's exact `percentile` sorts within each
    * group: per-group memory is the scale bound, right for bounded groups
    * (5 types); unbounded cardinalities switch to approx_percentile
    * (t-digest) at the cost of the oracle. Both engines interpolate at
    * index p·(n−1); results rounded 6dp to absorb last-ulp interpolation
    * differences. */
  def eventsValueQuantiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(expr("percentile(value, array(0.5D, 0.9D, 0.99D))").as("q"))
      .select(col("event_type"),
        round(col("q").getItem(0), 6).as("p50"),
        round(col("q").getItem(1), 6).as("p90"),
        round(col("q").getItem(2), 6).as("p99"))
      .orderBy("event_type")

  /** Ranking-window breadth: per-event-type value quartiles via `ntile(4)`
    * (deterministic total order: value, then event_id) with each
    * quartile's row count, value bounds and top `percent_rank` — the
    * distribution-profiling rollup (alerting thresholds, A/B cut points).
    * percent_rank = (rank−1)/(n−1) is one exact integer division per row,
    * identical cross-engine.
    *
    * Scale note: exact ntile needs a total sort per event_type — a
    * per-group reducer funnel that is fine for |group| in the millions
    * but wrong at billions; the approximate path at that scale is
    * [[eventsValueQuantiles]]'s percentile cut points (or t-digest), which
    * never materializes a global order. */
  def eventsQuartileStats(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    Tables.events(spark, sfDir)
      .select(col("event_type"), col("value"),
        ntile(4).over(w).as("quartile"), percent_rank().over(w).as("pr"))
      .groupBy(col("event_type"), col("quartile").cast("long").as("quartile"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("lo"),
        max(col("value")).as("hi"), max(col("pr")).as("max_pr"))
      .orderBy("event_type", "quartile")
  }

  /** The billion-row path [[eventsQuartileStats]]'s scale note promises:
    * approximate quartile CUT POINTS per event_type (one-pass
    * approx_percentile sketch, no total order ever materialized), broadcast
    * back, each row bucketed by comparison — two scans, zero sorts, zero
    * windows. Same (event_type, quartile, n, lo, hi) shape minus the
    * inherently total-order max_pr column. Approximate by construction →
    * rows-gated, with a tolerance spec against the exact form
    * (StarSchemaQueriesSpec). */
  def eventsQuartileStatsApprox(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val cuts = ev.groupBy("event_type")
      .agg(expr("approx_percentile(value, array(0.25D, 0.5D, 0.75D), 10000)").as("c"))
    ev.join(broadcast(cuts), "event_type")
      .select(col("event_type"),
        when(col("value") <= col("c").getItem(0), 1L)
          .when(col("value") <= col("c").getItem(1), 2L)
          .when(col("value") <= col("c").getItem(2), 3L)
          .otherwise(4L).as("quartile"),
        col("value"))
      .groupBy("event_type", "quartile")
      .agg(count(lit(1)).as("n"), min(col("value")).as("lo"),
        max(col("value")).as("hi"))
      .orderBy("event_type", "quartile")
  }

  /** Ordered 3-step funnel (signup → first click after it → first purchase
    * after that) counted per user — the conversion query every event
    * pipeline runs. Each stage is one equi-join on user_id plus a min-agg:
    * shuffle keys stay user_id throughout, no window over the full event
    * stream, no self-θ-join. Timestamps are µs epoch longs (exact). */
  def eventsFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.eventsUs(spark, sfDir)
    def firstAfter(eventType: String, prev: DataFrame, prevTs: String, outTs: String) =
      ev.filter(col("event_type") === eventType)
        .join(prev, "user_id")
        .filter(col("ts_us") > col(prevTs))
        .groupBy("user_id").agg(min(col("ts_us")).as(outTs))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts_us")).as("t1"))
    val click = firstAfter("click", signup, "t1", "t2")
    val purchase = firstAfter("purchase", click, "t2", "t3")
    signup.agg(count(lit(1)).as("n_signup")).crossJoin(
      click.agg(count(lit(1)).as("n_click_after")).crossJoin(
        purchase.agg(count(lit(1)).as("n_purchase_after"))))
  }

  /** Weekly cohort retention: users bucketed by days-since-their-first-
    * event, distinct-counted per week offset. All time math on integer
    * epoch DAYS derived from the µs longs (`ts div 86400e6`) — no
    * cross-engine date-function drift possible. Two shuffles (first-day
    * per user, distinct per week) — both on natural keys. */
  def userRetention(spark: SparkSession, sfDir: String): DataFrame = {
    val day = expr("ts_us div 86400000000L")
    val activity = Tables.eventsUs(spark, sfDir)
      .select(col("user_id"), day.as("day")).distinct()
    val cohort = activity.groupBy("user_id").agg(min(col("day")).as("day0"))
    activity.join(cohort, "user_id")
      .select(col("user_id"), expr("(day - day0) div 7").as("week_offset"))
      .distinct()
      .groupBy("week_offset").agg(count(lit(1)).as("n_users"))
      .orderBy("week_offset")
  }

  /** Top-10 suppliers by shipped revenue with their nation — the last
    * unexercised fixture table. Fact scans 3 of 11 lineitem columns; both
    * dimension sides broadcast; top-k is TakeOrderedAndProject. */
  def topSuppliers(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select("l_suppkey", "l_extendedprice", "l_discount")
      .join(broadcast(Tables.supplier(spark, sfDir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, sfDir)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("s_suppkey"), col("s_name"), col("n_name"))
      .agg(revenue.as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("s_suppkey"))
      .limit(10)

  /** PageRank damping factor (Brin & Page 1998 — the published 0.85). */
  val PrDamping = 0.85

  /** PageRank over the event-type transition graph — link analysis on
    * behavioral data (which states concentrate user flow): consecutive
    * events per user (arrival order = event_id, which both engines agree
    * on bit-for-bit, unlike the ns-vs-µs `ts`) define weighted src→dst
    * edges between event types; two unrolled PageRank iterations run on
    * that |types|-node graph. Dangling mass is dropped (the simple
    * variant), documented and mirrored in the oracle.
    *
    * Scale shape: the corpus-sized work is ONE lag window over per-user
    * groups (bounded, the events_sessions shape) collapsing into a
    * |types|²-edge relation, plus one cheap column-distinct for the node
    * set. Iteration runs through [[GraphOps.pageRank]]'s adaptive split:
    * a type graph is sidecar-sized, so the two PR iterations run in exact
    * driver decimal; a graph past [[GraphOps.DriverMaxEdges]] (user→user
    * edges) takes the distributed iterate-join kernel with the identical
    * numeric contract (cross-kernel equality spec-pinned in
    * GraphOpsSpec).
    *
    * Exactness: edge weights are exact counts; per-edge contributions
    * round 9dp into exact BigDecimal sums (order-free, DECIMAL(28,9) in
    * the oracle); each new rank is then two deterministic double ops on
    * identical operands, left unrounded (rounding could diverge at
    * reachable midpoints — see [[TextAnalysis.stupidBackoffScore]]). The
    * (1−d) difference is an explicit DOUBLE subtraction on BOTH engines:
    * DuckDB constant-folds bare `(1.0 - 0.85)` in DECIMAL (exactly 0.15,
    * ≠ the IEEE double 0.15000000000000002), so the oracle casts the
    * operands to DOUBLE first. */
  def eventTypePagerank(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val edges = ev
      .select(col("event_type").as("dst"),
        lag(col("event_type"), 1).over(w).as("src"))
      .filter(col("src").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val nodes = ev.select(col("event_type").as("node")).distinct()
    GraphOps.pageRank(nodes, edges, iterations = 2, damping = PrDamping)
      .select(col("node").as("event_type"), col("pagerank"))
      .orderBy("event_type")
  }

  /** PageRank over the user→user handoff graph — the distributed-kernel
    * contract query: consecutive users on the same (event_type, hour)
    * stream (ordered by ts with event_id tie-break — a total order both
    * engines agree on) define weighted src→dst edges; two PageRank
    * iterations rank the users. This is the graph that does NOT fit a
    * driver edge list at scale, so the query FORCES the iterate-join
    * kernel ([[GraphOps.distributedPageRank]]) — the driver kernel is its
    * bit-equal twin (cross-kernel equality spec-pinned on this very query
    * in GraphOpsSpec).
    *
    * Scale shape: the corpus-sized work is ONE lag window whose partitions
    * are (event_type × hour) — partition COUNT grows with the time span
    * and per-partition size with the event rate (sub-bucket to minutes if
    * a stream runs hot), never a whole-table funnel — collapsing into a
    * user²-bounded (in practice corpus-sized) edge relation; each PR
    * iteration is one rank⋈edges equi-join shuffle plus one decimal hash
    * agg ([[GraphOps]] scaladoc). Numeric contract identical to
    * [[eventTypePagerank]]; dangling mass dropped, mirrored in the
    * oracle. */
  def userPagerank(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
    val w = Window.partitionBy(col("event_type"), date_trunc("hour", col("ts")))
      .orderBy(col("ts"), col("event_id"))
    val edges = ev
      .select(col("user_id").as("dst"), lag(col("user_id"), 1).over(w).as("src"))
      .filter(col("src").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    val nodes = ev.select(col("user_id").as("node")).distinct()
    GraphOps.pageRank(nodes, edges, iterations = 2, damping = PrDamping,
      forceDistributed = true)
      .select(col("node").cast("long").as("user_id"), col("pagerank"))
      .orderBy("user_id")
  }

  /** Attribution window for [[eventsIntervalJoin]] (4 hours — wide enough
    * that the sparse fixture produces a checkable pair set). */
  val IntervalJoinSeconds = 14400L

  /** Bounded-interval attribution join: every purchase within
    * [[IntervalJoinSeconds]] AFTER a same-user click — the classic
    * click→purchase attribution shape, and the batch twin of the
    * stream-stream interval join
    * ([[graft.streaming.StreamingIngest.startIntervalJoin]], parity
    * spec-pinned in StreamingSpec).
    *
    * Scale shape: ONE equi-join shuffle on user_id with the time-range
    * predicate evaluated inside the join (never a cross join); output is
    * bounded by the per-user click×purchase fanout within the window. Hot
    * users are AQE skew-join territory (the per-key volume is bounded by
    * rate × window, unlike the Zipf-unbounded LM join that warranted
    * explicit salting). Exactness: pure integer microsecond arithmetic,
    * identical cross-engine. */
  def eventsIntervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("click_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("purchase_us"))
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_us") >= col("click_us") &&
        col("purchase_us") <= col("click_us") + lit(IntervalJoinSeconds * 1000000L))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (col("purchase_us") - col("click_us")).as("gap_us"))
      .orderBy("click_id", "purchase_id")
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "event_type_pagerank" -> ((s, d) => eventTypePagerank(s, d)),
    "user_pagerank" -> ((s, d) => userPagerank(s, d)),
    "events_interval_join" -> ((s, d) => eventsIntervalJoin(s, d)),
    "top_suppliers" -> ((s, d) => topSuppliers(s, d)),
    "events_distinct_users" -> ((s, d) => eventsDistinctUsers(s, d)),
    "events_quartile_stats" -> ((s, d) => eventsQuartileStats(s, d)),
    // approximate by construction (percentile sketch) → rows-only gate,
    // tolerance-pinned against the exact form in StarSchemaQueriesSpec
    "events_quartile_stats_approx" -> ((s, d) => eventsQuartileStatsApprox(s, d)),
    // approximate by construction (HLL++ sketch) → rows-only gate,
    // tolerance-pinned against the exact form in StarSchemaQueriesSpec
    "events_distinct_users_approx" -> ((s, d) => eventsDistinctUsersApprox(s, d)),
    "events_cube" -> ((s, d) => eventsCube(s, d)),
    "q6_forecast_revenue" -> ((s, d) => q6ForecastRevenue(s, d)),
    "q10_returned_customers" -> ((s, d) => q10ReturnedCustomers(s, d)),
    "nation_balance" -> ((s, d) => nationBalance(s, d)),
    "events_gaps" -> ((s, d) => eventsGaps(s, d)),
    "events_funnel" -> ((s, d) => eventsFunnel(s, d)),
    "user_retention" -> ((s, d) => userRetention(s, d)),
    "lineitem_rollup" -> ((s, d) => lineitemRollup(s, d)),
    "events_pivot" -> ((s, d) => eventsPivot(s, d)),
    "events_value_quantiles" -> ((s, d) => eventsValueQuantiles(s, d)),
    "q1_agg" -> ((s, d) => q1Agg(s, d)),
    "q3_top_orders" -> ((s, d) => q3TopOrders(s, d)),
    "q5_nation_revenue" -> ((s, d) => q5NationRevenue(s, d)),
    "top_customers" -> ((s, d) => topCustomers(s, d)),
    "events_top_per_user" -> ((s, d) => eventsTopPerUser(s, d)),
    "events_sessions" -> ((s, d) => eventsSessions(s, d)),
    "events_hourly" -> ((s, d) => eventsHourly(s, d)),
    "events_hourly_anomaly" -> ((s, d) => eventsHourlyAnomaly(s, d)),
    "events_daily_ma" -> ((s, d) => eventsDailyMa(s, d)),
    "events_props_agg" -> ((s, d) => eventsPropsAgg(s, d)),
    "parts_by_brand" -> ((s, d) => partsByBrand(s, d)),
    "customers_no_orders" -> ((s, d) => customersNoOrders(s, d)),
    "orders_semi_high_value" -> ((s, d) => ordersSemiHighValue(s, d)),
  )

  /** One unrolled PageRank iteration as a CTE pair — shared by the
    * event_type_pagerank and user_pagerank oracles so both mirror
    * [[GraphOps]]'s numeric contract from the same text: per-edge
    * contributions 9dp-rounded into DECIMAL(28,9) order-free sums, rank
    * arithmetic op for op — with (1−d) computed as an explicit DOUBLE
    * subtraction, since DuckDB folds bare `(1.0 - 0.85)` in exact DECIMAL,
    * 2 ulp away from the JVM's double. Expects CTEs `e(src, dst, w)`,
    * `outw(src, wout)` and `n(n)` in scope. */
  private def prStep(prev: String, contribName: String, outName: String): String =
    s"""$contribName AS (
       |  SELECT e.dst AS node,
       |    CAST(SUM(CAST(ROUND(p.pr * e.w / o.wout, 9) AS DECIMAL(28,9)))
       |      AS DOUBLE) AS s
       |  FROM e JOIN $prev p ON e.src = p.node JOIN outw o ON e.src = o.src
       |  GROUP BY 1),
       |$outName AS (
       |  SELECT p.node,
       |    (CAST(1.0 AS DOUBLE) - CAST($PrDamping AS DOUBLE)) / n.n
       |      + $PrDamping * COALESCE(c.s, 0.0) AS pr
       |  FROM $prev p LEFT JOIN $contribName c ON p.node = c.node, n)"""
      .stripMargin

  def oracles: Map[String, String] = Map(
    // transitions in event_id arrival order (engine-identical, unlike ns
    // ts); numeric recipe in prStep's scaladoc
    "event_type_pagerank" -> {
      def step(prev: String, contribName: String, outName: String): String =
        prStep(prev, contribName, outName)
      s"""WITH ev AS (SELECT user_id, event_id, event_type FROM events),
         |e AS (
         |  SELECT src, dst, count(*) AS w FROM (
         |    SELECT event_type AS dst,
         |      lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS src
         |    FROM ev)
         |  WHERE src IS NOT NULL GROUP BY 1, 2),
         |outw AS (SELECT src, CAST(sum(w) AS DOUBLE) AS wout FROM e GROUP BY 1),
         |n AS (SELECT CAST(count(DISTINCT event_type) AS DOUBLE) AS n FROM ev),
         |p0 AS (SELECT event_type AS node, 1.0 / n.n AS pr
         |  FROM (SELECT DISTINCT event_type FROM ev), n),
         |${step("p0", "c1", "p1")},
         |${step("p1", "c2", "p2")}
         |SELECT node AS event_type, pr AS pagerank FROM p2
         |ORDER BY event_type""".stripMargin
    },
    // user→user handoff edges: consecutive users on the same
    // (event_type, hour) stream, (ts, event_id) total order; same
    // prStep numeric recipe as event_type_pagerank
    "user_pagerank" ->
      s"""WITH ev AS (SELECT user_id, event_id, event_type, ts FROM events),
         |e AS (
         |  SELECT src, dst, count(*) AS w FROM (
         |    SELECT user_id AS dst,
         |      lag(user_id) OVER (
         |        PARTITION BY event_type, date_trunc('hour', ts)
         |        ORDER BY epoch_us(ts), event_id) AS src
         |    FROM ev)
         |  WHERE src IS NOT NULL GROUP BY 1, 2),
         |outw AS (SELECT src, CAST(sum(w) AS DOUBLE) AS wout FROM e GROUP BY 1),
         |n AS (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS n FROM ev),
         |p0 AS (SELECT user_id AS node, 1.0 / n.n AS pr
         |  FROM (SELECT DISTINCT user_id FROM ev), n),
         |${prStep("p0", "c1", "p1")},
         |${prStep("p1", "c2", "p2")}
         |SELECT node AS user_id, pr AS pagerank FROM p2
         |ORDER BY user_id""".stripMargin,
    "events_distinct_users" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "events_interval_join" ->
      s"""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
         |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
         |FROM events c JOIN events p ON c.user_id = p.user_id
         |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
         |  AND epoch_us(p.ts) >= epoch_us(c.ts)
         |  AND epoch_us(p.ts) <= epoch_us(c.ts) + ${IntervalJoinSeconds * 1000000L}
         |ORDER BY click_id, purchase_id""".stripMargin,
    "nation_balance" ->
      """WITH cust AS (
        |  SELECT c_nationkey AS nationkey,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS cust_bal,
        |    COUNT(*) AS n_cust
        |  FROM customer GROUP BY 1),
        |supp AS (
        |  SELECT s_nationkey AS nationkey,
        |    CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS supp_bal,
        |    COUNT(*) AS n_supp
        |  FROM supplier GROUP BY 1)
        |SELECT n_name,
        |  COALESCE(n_cust, 0) AS n_cust, COALESCE(cust_bal, 0.0) AS cust_bal,
        |  COALESCE(n_supp, 0) AS n_supp, COALESCE(supp_bal, 0.0) AS supp_bal
        |FROM cust FULL OUTER JOIN supp USING (nationkey)
        |JOIN nation ON nationkey = n_nationkey
        |ORDER BY n_name""".stripMargin,
    "events_gaps" ->
      """WITH g AS (
        |  SELECT event_type,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |      - epoch_us(ts) AS gap_us
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n_gaps,
        |  CAST(SUM(gap_us) // COUNT(*) AS BIGINT) AS mean_gap_us,
        |  MAX(gap_us) AS max_gap_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q10_returned_customers" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  $revenueSql AS revenue, COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,
    "events_cube" ->
      """WITH b AS (
        |  SELECT event_type, (epoch_us(ts) // 86400000000) % 7 AS weekday, value
        |  FROM events)
        |SELECT
        |  COALESCE(event_type, 'ALL') AS event_type,
        |  COALESCE(CAST(weekday AS VARCHAR), 'ALL') AS weekday,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM b
        |GROUP BY CUBE (event_type, weekday)
        |ORDER BY event_type, weekday""".stripMargin,
    "events_quartile_stats" ->
      """WITH r AS (
        |  SELECT event_type, value,
        |    ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS quartile,
        |    percent_rank() OVER (PARTITION BY event_type ORDER BY value, event_id) AS pr
        |  FROM events)
        |SELECT event_type, CAST(quartile AS BIGINT) AS quartile, COUNT(*) AS n,
        |  min(value) AS lo, max(value) AS hi, max(pr) AS max_pr
        |FROM r GROUP BY 1, 2
        |ORDER BY event_type, quartile""".stripMargin,
    "top_suppliers" ->
      s"""SELECT s_suppkey, s_name, n_name,
         |  $revenueSql AS revenue, COUNT(*) AS n_items
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, s_suppkey
         |LIMIT 10""".stripMargin,
    "events_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(ts_us) AS t2 FROM e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE event_type = 'click' AND ts_us > t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(ts_us) AS t3 FROM e
        |       JOIN s2 ON e.user_id = s2.user_id
        |       WHERE event_type = 'purchase' AND ts_us > t2 GROUP BY 1)
        |SELECT (SELECT count(*) FROM s1) AS n_signup,
        |       (SELECT count(*) FROM s2) AS n_click_after,
        |       (SELECT count(*) FROM s3) AS n_purchase_after""".stripMargin,
    "user_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        |c AS (SELECT user_id, min(day) AS day0 FROM a GROUP BY 1),
        |w AS (SELECT DISTINCT a.user_id, (a.day - c.day0) // 7 AS week_offset
        |      FROM a JOIN c ON a.user_id = c.user_id)
        |SELECT week_offset, count(*) AS n_users FROM w
        |GROUP BY 1 ORDER BY week_offset""".stripMargin,
    "lineitem_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         |  coalesce(l_linestatus, 'ALL') AS linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  $revenueSql AS sum_disc_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin,
    "events_pivot" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS day,
         |${PivotEventTypes.map(t =>
             s"  COUNT(*) FILTER (event_type = '$t') AS \"$t\"").mkString(",\n")}
         |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "events_value_quantiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.9), 6) AS p90,
        |  round(quantile_cont(value, 0.99), 6) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         |  $revenueSql AS sum_disc_price,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
         |  $revenueSql AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-06-30 00:00:00'
         |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      s"""SELECT n_name, $revenueSql AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,
    "top_customers" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
        |  COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY spend DESC, c_custkey
        |LIMIT 10""".stripMargin,
    "events_top_per_user" ->
      """SELECT user_id, rn, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events
        |) WHERE rn <= 3
        |ORDER BY user_id, rn""".stripMargin,
    "events_sessions" ->
      s"""WITH secs AS (
         |  SELECT user_id, event_id,
         |    CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
         |flagged AS (
         |  SELECT user_id, event_id, sec,
         |    CASE WHEN lag(sec) OVER w IS NULL
         |           OR sec - lag(sec) OVER w > $SessionGapSeconds
         |         THEN 1 ELSE 0 END AS new_session
         |  FROM secs
         |  WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
         |sessions AS (
         |  SELECT user_id, sec,
         |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS BIGINT)
         |      AS session_id
         |  FROM flagged)
         |SELECT user_id, session_id, COUNT(*) AS n_events,
         |  CAST(MAX(sec) - MIN(sec) AS BIGINT) AS duration_s
         |FROM sessions
         |GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,
    "events_hourly" ->
      """SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY event_type, hour""".stripMargin,
    // moments staged in the SAME op chain as the Spark select pipeline
    // (m and m2 divisions, one subtraction, clamp, sqrt, one division)
    "events_hourly_anomaly" ->
      s"""WITH h0 AS (
         |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |sp AS (SELECT event_type, min(h) AS a, max(h) AS b FROM h0 GROUP BY 1),
         |g AS (SELECT event_type, unnest(generate_series(a, b, INTERVAL 1 HOUR)) AS h
         |  FROM sp),
         |h AS (
         |  SELECT g.event_type, strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour,
         |    COALESCE(h0.n, 0) AS n
         |  FROM g LEFT JOIN h0 ON g.event_type = h0.event_type AND g.h = h0.h),
         |s1 AS (SELECT event_type,
         |    CAST(sum(n) AS DOUBLE) / count(*) AS m,
         |    CAST(sum(n * n) AS DOUBLE) / count(*) AS m2
         |  FROM h GROUP BY 1),
         |s2 AS (SELECT event_type, m, m2 - m * m AS v FROM s1),
         |s3 AS (SELECT event_type, m,
         |    sqrt(CASE WHEN v > 0.0 THEN v ELSE 0.0 END) AS sd FROM s2),
         |z AS (SELECT h.event_type, h.hour, h.n,
         |    CASE WHEN s3.sd = 0.0 THEN 0.0
         |         ELSE (CAST(h.n AS DOUBLE) - s3.m) / s3.sd END AS z
         |  FROM h JOIN s3 USING (event_type))
         |SELECT event_type, hour, n, z FROM z WHERE abs(z) >= $AnomalyZ
         |ORDER BY event_type, hour""".stripMargin,
    "events_daily_ma" ->
      s"""WITH d0 AS (
         |  SELECT event_type, date_trunc('day', ts) AS d, count(*) AS n
         |  FROM events GROUP BY 1, 2),
         |sp AS (SELECT event_type, min(d) AS a, max(d) AS b FROM d0 GROUP BY 1),
         |g AS (SELECT event_type, unnest(generate_series(a, b, INTERVAL 1 DAY)) AS d
         |  FROM sp),
         |d AS (
         |  SELECT g.event_type, g.d, COALESCE(d0.n, 0) AS n
         |  FROM g LEFT JOIN d0 ON g.event_type = d0.event_type AND g.d = d0.d)
         |SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n,
         |  CAST(sum(n) OVER w AS DOUBLE) / count(n) OVER w AS ma7
         |FROM d
         |WINDOW w AS (PARTITION BY event_type ORDER BY d
         |  ROWS BETWEEN ${MaDays - 1} PRECEDING AND CURRENT ROW)
         |ORDER BY event_type, day""".stripMargin,
    "events_props_agg" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "parts_by_brand" ->
      """SELECT p_brand, COUNT(*) AS n_parts,
        |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        |FROM part
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "customers_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin,
    "orders_semi_high_value" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_extendedprice > 90000.0)
        |ORDER BY o_orderkey""".stripMargin,
  )
}
