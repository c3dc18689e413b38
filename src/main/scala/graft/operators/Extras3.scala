package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Det, Tables}

/** Round-2 surface widening: string aggregation, unpivot, explicit
  * grouping sets, distribution window functions, embedding centroids,
  * latest-record-per-key compaction, and a hyperplane-LSH ANN variant.
  *
  * All scale-safe: each is a single grouped aggregation / window over a
  * pre-partitioned key, no driver-side loops, no collects.
  */
object Extras3 {

  /** X15 — latest-record-per-key compaction (CDC/snapshot dedup): each
    * user's most recent event via max_by over a composite (ts, event_id)
    * order — one grouped agg, no window sort of the full table. */
  def x15LatestByKey(spark: SparkSession, sfDir: String): DataFrame =
    Tables.eventsUs(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(
        max_by(col("event_type"), struct(col("ts"), col("event_id"))).as("last_type"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("last_value"),
        max(col("ts")).as("last_ts_us"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  /** X25 — SCD Type-2 dimension build (warehouse CDC pattern): collapse
    * each user's event stream into validity ranges — one row per run of
    * equal event_type, carrying [valid_from, valid_to) in epoch-µs and
    * the run's event count; the open current run gets valid_to = -1.
    * Change points come from lag, versions from a running sum, ranges
    * from a grouped agg, and the close-out timestamp from lead — all
    * three window passes share one user_id partitioning, so the plan
    * carries a single shuffle keyed by the dimension's natural key
    * (exactly how the build shards on a 1000-executor cluster). */
  def x25Scd2(spark: SparkSession, sfDir: String): DataFrame = {
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val prev = lag(col("event_type"), 1).over(byTime)
    val versioned = Tables.eventsUs(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("chg",
        when(prev.isNull || prev =!= col("event_type"), 1L).otherwise(0L))
      .withColumn("version", sum(col("chg")).over(byTime))
    val byVersion = Window.partitionBy(col("user_id")).orderBy(col("version"))
    versioned
      .groupBy(col("user_id"), col("version"), col("event_type"))
      .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
      .withColumn("valid_to",
        coalesce(lead(col("valid_from"), 1).over(byVersion), lit(-1L)))
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from"), col("valid_to"), col("n_events"))
      .orderBy(col("user_id"), col("version"))
  }

  /** X30 — CDC MERGE-apply (the MERGE INTO semantics, composed from
    * relational primitives because plain parquet has no row-level ops):
    * a deterministic change feed (deletes for key%10=0, +100 balance
    * updates for key%10∈{1,2}, inserts at key+100000 for key%10=3) is
    * applied to the customer snapshot via one full outer join on the
    * key — matched+D drops the row, matched+U rewrites it, unmatched
    * inserts flow through, everything else keeps the snapshot row.
    * One shuffle on the merge key at any scale; the op column records
    * which arm fired so the oracle checks the routing, not just the
    * final values. */
  def x30ApplyCdc(spark: SparkSession, sfDir: String): DataFrame = {
    val snap = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"))
    val changes = Tables.customer(spark, sfDir).select(
      when(col("c_custkey") % 10 === 3, col("c_custkey") + 100000L)
        .otherwise(col("c_custkey")).as("ckey"),
      when(col("c_custkey") % 10 === 0, lit("D"))
        .when(col("c_custkey") % 10 === 1 || col("c_custkey") % 10 === 2,
          lit("U"))
        .when(col("c_custkey") % 10 === 3, lit("I"))
        .otherwise(lit(null)).as("op"),
      (col("c_acctbal") + 100.0).as("new_bal"))
      .filter(col("op").isNotNull)
    snap.join(changes, snap("key") === changes("ckey"), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "D")
      .select(coalesce(col("key"), col("ckey")).as("key"),
        when(col("op") === "U" || col("op") === "I", col("new_bal"))
          .otherwise(col("bal")).as("bal"),
        coalesce(col("op"), lit("K")).as("applied"))
      .orderBy(col("key"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x15_latest_by_key" -> (x15LatestByKey _),
    "x25_scd2" -> (x25Scd2 _),
    "x30_apply_cdc" -> (x30ApplyCdc _))

  import Det.{sql => d}
  val oracles: Map[String, String] = Map(
    // DuckDB 1.0's arg_max has no composite-key overload, so the oracle
    // re-expresses max_by as a window top-1 with the same tie-break
    "x15_latest_by_key" ->
      ("SELECT user_id, event_type AS last_type, value AS last_value, " +
       "t AS last_ts_us, n_events FROM " +
       "(SELECT user_id, event_type, value, epoch_us(ts) AS t, " +
       "row_number() OVER (PARTITION BY user_id " +
       "ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn, " +
       "COUNT(*) OVER (PARTITION BY user_id) AS n_events FROM events) s " +
       "WHERE rn = 1 ORDER BY user_id"),
    "x30_apply_cdc" ->
      ("WITH snap AS (SELECT c_custkey AS key, c_acctbal AS bal FROM customer), " +
       "chg AS (SELECT CASE WHEN c_custkey % 10 = 3 THEN c_custkey + 100000 " +
       "ELSE c_custkey END AS ckey, " +
       "CASE WHEN c_custkey % 10 = 0 THEN 'D' " +
       "WHEN c_custkey % 10 IN (1, 2) THEN 'U' " +
       "WHEN c_custkey % 10 = 3 THEN 'I' END AS op, " +
       "c_acctbal + 100.0 AS new_bal FROM customer " +
       "WHERE c_custkey % 10 IN (0, 1, 2, 3)) " +
       "SELECT COALESCE(key, ckey) AS key, " +
       "CASE WHEN op IN ('U', 'I') THEN new_bal ELSE bal END AS bal, " +
       "COALESCE(op, 'K') AS applied " +
       "FROM snap FULL OUTER JOIN chg ON key = ckey " +
       "WHERE COALESCE(op, '') <> 'D' ORDER BY key"),
    "x25_scd2" ->
      ("WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_id, event_type " +
       "FROM events), " +
       "c AS (SELECT *, CASE WHEN LAG(event_type) OVER w IS NULL " +
       "OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg " +
       "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
       "v AS (SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version FROM c), " +
       "r AS (SELECT user_id, CAST(version AS BIGINT) AS version, event_type, " +
       "MIN(ts) AS valid_from, COUNT(*) AS n_events " +
       "FROM v GROUP BY user_id, version, event_type) " +
       "SELECT user_id, version, event_type, valid_from, " +
       "COALESCE(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version), -1) " +
       "AS valid_to, n_events FROM r ORDER BY user_id, version"))
}
