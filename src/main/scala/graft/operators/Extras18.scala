package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-9 eighth wave — time-coverage data-ops and the physical-layout
  * SQL surface: calendar-gap audit (the freshness/completeness check
  * every ingestion SLA dashboard runs), per-user activity streaks (the
  * gaps-and-islands pattern behind every engagement "longest streak"
  * metric), and the DISTRIBUTE BY / SORT BY clauses (Spark's
  * partition-layout SQL surface, exercised value-neutrally).
  */
object Extras18 {

  // ---------------------------------------------------------------- x164

  /** X164 — calendar-gap audit of the order stream: every run of
    * missing days (gap start, gap end, length) plus the TOTAL row
    * (observed days, expected span, missing count) — the completeness
    * check a freshness SLA fires on, where "no data for 3 days" is
    * the incident and a table of gaps is the evidence.
    *
    * Scale shape: the corpus reduces to the observed-day domain in one
    * grouped pass; gaps are found by pairing each observed day with
    * the NEXT observed day — spelled as a min-over-theta-join on the
    * day-domain frame (the x138 prefix discipline; no global window) —
    * and keeping pairs more than one day apart. All-integer output. */
  def x164GapAudit(spark: SparkSession, sfDir: String): DataFrame =
    graft.api.Analytics.gapAudit(
      Tables.orders(spark, sfDir).select(
        expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
          .as("day")),
      "day")

  // ---------------------------------------------------------------- x165

  /** X165 — longest activity streaks: for each user, runs of
    * CONSECUTIVE active days via the gaps-and-islands trick (island
    * id = day − row_number within user), then the top-20 streaks by
    * (length desc, user, start day) — the "7-day streak" engagement
    * mechanic, computed exactly.
    *
    * Scale shape: one pass to the distinct (user, day) frame, one
    * user-partitioned window (keyed on user_id — data-parallel across
    * users, never a global sort), one grouped count over islands.
    * All-integer output. */
  def x165Streaks(spark: SparkSession, sfDir: String): DataFrame =
    graft.api.Analytics.streaks(
      Tables.eventsUs(spark, sfDir)
        .select(expr("ts div 86400000000").as("day"), col("user_id")),
      "user_id", "day")
      .withColumnRenamed("k", "user_id")
      .orderBy(col("streak").desc, col("user_id"), col("start_day"))
      .limit(20)

  // --------------------------------------------------------------- sql49

  /** SQL49 — DISTRIBUTE BY / SORT BY, Spark's physical-layout SQL
    * surface: per-nation balance aggregates distributed on the
    * nation key and sorted WITHIN partitions, then deterministically
    * re-ordered by the outer query — the clauses must be value-neutral
    * (they steer the shuffle, not the result), which is exactly what
    * the dialect-free oracle checks. */
  def sql49DistributeSort(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.customer(spark, sfDir).createOrReplaceTempView("v18_customer")
    spark.sql(
      """SELECT c_nationkey, n_customers, balance FROM (
        |  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |      AS balance
        |  FROM v18_customer GROUP BY c_nationkey
        |  DISTRIBUTE BY c_nationkey SORT BY balance DESC)
        |ORDER BY c_nationkey""".stripMargin)
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x164_gap_audit" -> (x164GapAudit _),
    "x165_streaks" -> (x165Streaks _),
    "sql49_distribute_sort" -> (sql49DistributeSort _))

  private val GapSql: String =
    "WITH days AS MATERIALIZED (SELECT " +
    "epoch_us(o_orderdate) // 86400000000 AS day FROM orders GROUP BY 1), " +
    "nxt AS (SELECT a.day, MIN(b.day) AS next_day FROM days a " +
    "LEFT JOIN days b ON b.day > a.day GROUP BY 1), " +
    "gaps AS (SELECT CAST(day + 1 AS BIGINT) AS gap_start, " +
    "CAST(next_day - 1 AS BIGINT) AS gap_end, " +
    "CAST(next_day - day - 1 AS BIGINT) AS gap_len FROM nxt " +
    "WHERE next_day > day + 1), " +
    "st AS (SELECT CAST(-1 AS BIGINT) AS gap_start, " +
    "CAST(-1 AS BIGINT) AS gap_end, " +
    "CAST(MAX(day) - MIN(day) + 1 - COUNT(*) AS BIGINT) AS gap_len " +
    "FROM days) " +
    "SELECT * FROM (SELECT * FROM gaps UNION ALL SELECT * FROM st) u " +
    "ORDER BY gap_start"

  private val StreaksSql: String =
    "WITH du AS MATERIALIZED (SELECT DISTINCT " +
    "epoch_us(ts) // 86400000000 AS day, user_id FROM events), " +
    "isl AS (SELECT user_id, day, " +
    "day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS g " +
    "FROM du), " +
    "runs AS (SELECT user_id, MIN(day) AS start_day, " +
    "CAST(COUNT(*) AS BIGINT) AS streak FROM isl GROUP BY user_id, g) " +
    "SELECT user_id, CAST(start_day AS BIGINT) AS start_day, streak " +
    "FROM runs ORDER BY streak DESC, user_id, start_day LIMIT 20"

  private val DistributeSortSql: String =
    "SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers, " +
    "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS balance " +
    "FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"

  val oracles: Map[String, String] = Map(
    "x164_gap_audit" -> GapSql,
    "x165_streaks" -> StreaksSql,
    "sql49_distribute_sort" -> DistributeSortSql)
}
