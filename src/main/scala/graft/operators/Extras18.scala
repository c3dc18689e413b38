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
    "sql49_distribute_sort" -> (sql49DistributeSort _))

  private val DistributeSortSql: String =
    "SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers, " +
    "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS balance " +
    "FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"

  val oracles: Map[String, String] = Map(
    "sql49_distribute_sort" -> DistributeSortSql)
}
