package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** Aggregation operators — SURVEY §2.4 (A1–A8).
  *
  * All declarative `groupBy/agg` → Catalyst plans a partial (map-side)
  * HashAggregate, a shuffle on the grouping keys, and a final
  * HashAggregate — the map-side combine is what keeps this linear at
  * 100 TB (shuffle volume = #groups × #partitions, not #rows).
  */
object Aggs {

  /** A1 — grouped hash aggregate: TPC-H Q1-style pricing summary over
    * lineitem. The flagship query (SparkEntry.entry). */
  def a1PricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        Det.dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_extendedprice")).as("avg_price"),
        Det.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  import Det.{sql => d}
  val a1Oracle: String =
    "SELECT l_returnflag, l_linestatus, " +
      s"${d.dsum("l_quantity")} AS sum_qty, " +
      s"${d.dsum("l_extendedprice")} AS sum_base_price, " +
      s"${d.dsum("l_extendedprice*(1.0-l_discount)")} AS sum_disc_price, " +
      s"${d.dsum6("l_extendedprice*(1.0-l_discount)*(1.0+l_tax)")} AS sum_charge, " +
      s"${d.davg("l_quantity")} AS avg_qty, " +
      s"${d.davg("l_extendedprice")} AS avg_price, " +
      s"${d.davg("l_discount")} AS avg_disc, " +
      "COUNT(*) AS count_order " +
      "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
      "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"

  /** A2 — global (ungrouped) aggregate: one-row totals over lineitem. */
  def a2Global(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).agg(
      Det.dsum(col("l_quantity")).as("total_qty"),
      Det.dsum(col("l_extendedprice")).as("total_price"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_extendedprice")).as("max_price"),
      count(lit(1)).as("n_rows"))

  /** A3 — COUNT(DISTINCT): exact distinct users per event type (Catalyst
    * plans the two-phase expand; only distinct keys cross the wire). */
  def a3CountDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.eventsUs(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** A4 raw — approximate distinct (HLL++) next to the exact count (the
    * spec bounds the error on this form). */
  def a4ApproxDistinctRaw(spark: SparkSession, sfDir: String): DataFrame =
    Tables.eventsUs(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy(col("event_type"))

  /** A4 contract — derived-claim form: DuckDB's HLL is a different
    * sketch, so the compared columns are the exact count (which DuckDB
    * reproduces) and the claim that HLL++ lands within 15% relative
    * error (default rsd 5%, 3σ; measured ≤ 6.7% across SFs). */
  def a4ApproxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    a4ApproxDistinctRaw(spark, sfDir)
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) / col("exact_users")
          <= 0.15).as("within_bound"))
      .orderBy(col("event_type"))

  /** A5 — ROLLUP with grouping-null coalescing: revenue by
    * (year, priority), (year), and grand total. */
  def a5Rollup(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .withColumn("y", year(col("o_orderdate")).cast("long"))
      .rollup(col("y"), col("o_orderpriority"))
      .agg(Det.dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
      .select(coalesce(col("y"), lit(-1L)).as("year_c"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("prio_c"),
        col("revenue"), col("n_orders"))
      .orderBy(col("year_c"), col("prio_c"))

  /** A5b — CUBE: all four grouping combinations of (year, status). */
  def a5bCube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .withColumn("y", year(col("o_orderdate")).cast("long"))
      .cube(col("y"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        Det.dsum(col("o_totalprice")).as("revenue"))
      .select(coalesce(col("y"), lit(-1L)).as("year_c"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status_c"),
        col("n_orders"), col("revenue"))
      .orderBy(col("year_c"), col("status_c"))

  /** A10 — pivot: event counts per user spread across one column per
    * event type (fixed pivot domain keeps the schema static — the only
    * scalable form; dynamic pivot would need a driver-side distinct). */
  def a10Pivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.eventsUs(spark, sfDir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))

  /** A6 — HAVING: post-aggregation filter on customer spend. */
  def a6Having(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(Det.dsum(col("o_totalprice")).as("spend"),
        count(lit(1)).as("n_orders"))
      .filter(col("spend") > 2000000.0)
      .orderBy(col("o_custkey"))

  /** A7 — collect_set with forced ordering (collect order is
    * nondeterministic — SURVEY §7.3#6, so always sort_array). The list is
    * emitted joined to a string: the driver's compare sorts rows by every
    * column and raw array cells are unhashable there (round-1 failure). */
  def a7CollectSorted(spark: SparkSession, sfDir: String): DataFrame =
    Tables.eventsUs(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(array_join(sort_array(collect_set(col("event_type"))), "|").as("types"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  /** A8 — custom typed UDAF: order-independent weighted mean of event
    * value, weighted by a deterministic per-user weight. */
  def a8WeightedMean(spark: SparkSession, sfDir: String): DataFrame = {
    val wmean = udaf(graft.functions.WeightedMean)
    Tables.eventsUs(spark, sfDir)
      .withColumn("w", pmod(col("user_id"), lit(10L)) + 1L)
      .groupBy(col("event_type"))
      .agg(wmean(col("value"), col("w")).as("wmean_value"),
        sum(col("w")).as("total_w"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_pricing_summary" -> (a1PricingSummary _),
    "a2_global" -> (a2Global _),
    "a3_count_distinct" -> (a3CountDistinct _),
    "a4_approx_distinct" -> (a4ApproxDistinct _),
    "a5_rollup" -> (a5Rollup _),
    "a5b_cube" -> (a5bCube _),
    "a10_pivot" -> (a10Pivot _),
    "a6_having" -> (a6Having _),
    "a7_collect_sorted" -> (a7CollectSorted _),
    "a8_weighted_mean" -> (a8WeightedMean _))

  val oracles: Map[String, String] = Map(
    "a1_pricing_summary" -> a1Oracle,
    "a2_global" ->
      (s"SELECT ${d.dsum("l_quantity")} AS total_qty, " +
       s"${d.dsum("l_extendedprice")} AS total_price, " +
       "MIN(l_quantity) AS min_qty, MAX(l_extendedprice) AS max_price, " +
       "COUNT(*) AS n_rows FROM lineitem"),
    "a3_count_distinct" ->
      ("SELECT event_type, COUNT(DISTINCT user_id) AS n_users, " +
       "COUNT(*) AS n_events FROM events GROUP BY event_type ORDER BY event_type"),
    // derived-claim oracle: exact count + a spec-bound boolean the Spark
    // side computes against its own exact aggregate (see a4 scaladoc)
    "a4_approx_distinct" ->
      ("SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, " +
       "TRUE AS within_bound FROM events GROUP BY event_type " +
       "ORDER BY event_type"),
    "a5_rollup" ->
      (s"SELECT COALESCE(y, -1) AS year_c, COALESCE(p, 'ALL') AS prio_c, " +
       s"${d.dsum("o_totalprice")} AS revenue, COUNT(*) AS n_orders FROM " +
       "(SELECT CAST(year(o_orderdate) AS BIGINT) AS y, o_orderpriority AS p, " +
       "o_totalprice FROM orders) t GROUP BY ROLLUP(y, p) " +
       "ORDER BY year_c, prio_c"),
    "a5b_cube" ->
      (s"SELECT COALESCE(y, -1) AS year_c, COALESCE(s, 'ALL') AS status_c, " +
       s"COUNT(*) AS n_orders, ${d.dsum("o_totalprice")} AS revenue FROM " +
       "(SELECT CAST(year(o_orderdate) AS BIGINT) AS y, o_orderstatus AS s, " +
       "o_totalprice FROM orders) t GROUP BY CUBE(y, s) " +
       "ORDER BY year_c, status_c"),
    "a10_pivot" ->
      ("SELECT user_id, " +
       "COUNT(*) FILTER (event_type = 'click') AS click, " +
       "COUNT(*) FILTER (event_type = 'error') AS error, " +
       "COUNT(*) FILTER (event_type = 'purchase') AS purchase, " +
       "COUNT(*) FILTER (event_type = 'signup') AS signup, " +
       "COUNT(*) FILTER (event_type = 'view') AS view " +
       "FROM events GROUP BY user_id ORDER BY user_id"),
    "a6_having" ->
      (s"SELECT o_custkey, ${d.dsum("o_totalprice")} AS spend, " +
       "COUNT(*) AS n_orders FROM orders GROUP BY o_custkey " +
       s"HAVING ${d.dsum("o_totalprice")} > 2000000.0 ORDER BY o_custkey"),
    "a7_collect_sorted" ->
      ("SELECT user_id, array_to_string(list_sort(list(DISTINCT event_type)), '|') AS types, " +
       "COUNT(*) AS n_events FROM events GROUP BY user_id ORDER BY user_id"),
    "a8_weighted_mean" ->
      ("SELECT event_type, " +
       "CAST(SUM(CAST(value*w AS DECIMAL(18,4))) AS DOUBLE)/" +
       "CAST(SUM(w) AS BIGINT) AS wmean_value, " +
       "CAST(SUM(w) AS BIGINT) AS total_w FROM " +
       "(SELECT event_type, value, user_id % 10 + 1 AS w FROM events) t " +
       "GROUP BY event_type ORDER BY event_type"))
}
